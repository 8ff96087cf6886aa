#!/usr/bin/env python3
"""Ablation profiler: forward-pass cost structure on the real TPU.

Times jitted variants of the SViT-B/16 forward (chained iterations so the
tunnel latency is amortized; see bench.py) to locate where the milliseconds
live. Variants toggle one suspect at a time:

  full           current production path (pallas attention + fused FFN)
  no_pallas      pure-XLA attention/FFN
  maxpool        q/kv pooling mode=max (removes depthwise convs + per-head LN)
  prefix:K       only the first K transformer blocks (per-stage cost curve)

Usage: python tools/profile_model.py [--batch 16] [--iters 10]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build(cfg_edit=None, **build_kw):
    from svit_tpu.config import assert_and_infer_cfg, get_cfg
    from svit_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs", "ssv2.yaml"))
    if cfg_edit:
        cfg_edit(cfg)
    assert_and_infer_cfg(cfg)
    return build_model(cfg, **build_kw) + (cfg,)


def time_forward(model, cfg, batch, iters, tag):
    import jax
    import jax.numpy as jnp
    import numpy as np

    S, T = cfg.DATA.TEST_CROP_SIZE, cfg.DATA.NUM_FRAMES
    x = jnp.asarray(np.random.RandomState(0).randn(batch, T, S, S, 3).astype(np.float32))
    abstract = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x[:1], deterministic=True)
    )
    params = jax.tree.map(
        lambda a: jnp.asarray(
            np.random.RandomState(1).standard_normal(a.shape) * 0.02, a.dtype
        ),
        abstract,
    )
    fwd = jax.jit(lambda p, x, s: model.apply(p, x + s * 0, deterministic=True)[0])
    s = jnp.float32(0)
    for _ in range(3):
        s = fwd(params, x, s).mean()
    _ = float(s)
    t0 = time.perf_counter()
    s = jnp.float32(0)
    for _ in range(iters):
        s = fwd(params, x, s).mean()
    _ = float(s)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{tag:24s} {dt:8.2f} ms/fwd   {batch / dt * 1000:8.1f} clips/s", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--variants", default="full,no_pallas,maxpool,prefix")
    args = ap.parse_args()
    variants = args.variants.split(",")

    if "full" in variants:
        model, _, cfg = build()
        time_forward(model, cfg, args.batch, args.iters, "full")
    if "no_pallas" in variants:
        model, _, cfg = build(use_pallas=False)
        time_forward(model, cfg, args.batch, args.iters, "no_pallas")
    if "maxpool" in variants:
        def edit(cfg):
            cfg.MVIT.MODE = "max"
        model, _, cfg = build(edit)
        time_forward(model, cfg, args.batch, args.iters, "maxpool")
    if "prefix" in variants:
        for k in (1, 2, 3, 8, 14, 16):
            def edit(cfg, k=k):
                cfg.MVIT.DEPTH = k
                cfg.MVIT.DIM_MUL = [m for m in cfg.MVIT.DIM_MUL if m[0] < k]
                cfg.MVIT.HEAD_MUL = [m for m in cfg.MVIT.HEAD_MUL if m[0] < k]
                cfg.MVIT.POOL_Q_STRIDE = [
                    m for m in cfg.MVIT.POOL_Q_STRIDE if m[0] < k
                ]
            model, _, cfg = build(edit)
            time_forward(model, cfg, args.batch, args.iters, f"prefix:{k}")


if __name__ == "__main__":
    main()
