#!/usr/bin/env python3
"""Batched inference server CLI.

    python tools/serve.py --cfg configs/ssv2.yaml \
        TEST.CHECKPOINT_FILE_PATH ckpt.pyth

Serves POST /predict (base64 JPEG frames -> top-k classes + HAOG boxes) and
GET /healthz on port 8080 (override with SERVE_PORT env var).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svit_tpu.config import assert_and_infer_cfg, load_config, parse_args
from svit_tpu.utils.env import apply_jax_platform_env


def main():
    apply_jax_platform_env()
    cfg = assert_and_infer_cfg(load_config(parse_args()))
    from svit_tpu.serving.server import serve

    serve(
        cfg,
        port=int(os.environ.get("SERVE_PORT", "8080")),
        max_batch=int(os.environ.get("SERVE_MAX_BATCH", "8")),
        window_ms=float(os.environ.get("SERVE_WINDOW_MS", "10")),
    )


if __name__ == "__main__":
    main()
