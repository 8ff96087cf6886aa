#!/usr/bin/env python3
"""Umbrella CLI (reference ``tools/run_net.py``).

Runs train, then test, then visualization, then demo based on
``TRAIN.ENABLE`` / ``TEST.ENABLE`` / ``TENSORBOARD.*`` / ``DEMO.ENABLE`` —
the same flag contract as the reference:

    python tools/run_net.py --cfg configs/ssv2.yaml KEY VALUE ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svit_tpu.config import assert_and_infer_cfg, load_config, parse_args
from svit_tpu.parallel.dist import init_distributed
from svit_tpu.utils.env import apply_jax_platform_env


def main():
    apply_jax_platform_env()
    args = parse_args()
    cfg = load_config(args)
    cfg = assert_and_infer_cfg(cfg)
    init_distributed(cfg)

    if cfg.TRAIN.ENABLE:
        from svit_tpu.engine.train import train

        train(cfg)

    if cfg.TEST.ENABLE:
        from svit_tpu.engine.test import test

        test(cfg)

    if cfg.TENSORBOARD.ENABLE and (
        cfg.TENSORBOARD.MODEL_VIS.ENABLE or cfg.TENSORBOARD.WRONG_PRED_VIS.ENABLE
    ):
        from svit_tpu.visualization.run import visualize

        visualize(cfg)

    if cfg.DEMO.ENABLE:
        from svit_tpu.visualization.demo import demo

        demo(cfg)


if __name__ == "__main__":
    main()
