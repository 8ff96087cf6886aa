#!/usr/bin/env python3
"""Multi-view test CLI (reference ``tools/test_net.py`` entry)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svit_tpu.config import assert_and_infer_cfg, load_config, parse_args
from svit_tpu.parallel.dist import init_distributed
from svit_tpu.utils.env import apply_jax_platform_env


def main():
    apply_jax_platform_env()
    cfg = assert_and_infer_cfg(load_config(parse_args()))
    init_distributed(cfg)
    from svit_tpu.engine.test import test

    test(cfg)


if __name__ == "__main__":
    main()
