#!/usr/bin/env python3
"""Visualization CLI (reference ``tools/visualization.py`` entry)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svit_tpu.config import assert_and_infer_cfg, load_config, parse_args
from svit_tpu.utils.env import apply_jax_platform_env


def main():
    apply_jax_platform_env()
    cfg = assert_and_infer_cfg(load_config(parse_args()))
    from svit_tpu.visualization.run import visualize

    visualize(cfg)


if __name__ == "__main__":
    main()
