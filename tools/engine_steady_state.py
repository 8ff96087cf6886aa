#!/usr/bin/env python3
"""Engine steady-state train-loop rate at production shapes (round-5 ask #3).

The bench (``bench.py::measure_tpu_train``) chains bare ``step_jit`` calls;
the PRODUCTION loop (``engine/train.py::train_epoch``) adds batch staging,
meters, the LOG_PERIOD-batched metric fetch, and the preemption poll.  This
tool measures the REAL ``train_epoch`` — the same function the CLI runs — at
the bench's production shapes (16f x 224, video 8 + image 8 + consistency,
bf16 + Pallas), so the engine's steady-state step time can be compared
directly with the bench's ``train_step_ms``.

Host data production is excluded by design: batches are pre-staged numpy
(the container has ONE CPU core — real JPEG decode at these shapes would
measure this machine's data pipeline, not the engine; on a production TPU
host the loader workers own that budget).  ``put_batch`` / H2D transfer IS
included (it is part of every engine step).

Writes ``docs/ENGINE_STEADY_r05.json``:
  {"engine_step_ms": ..., "steps": N, "bench_train_step_ms": <from env or
   null>, "overhead_vs_bench_pct": ...}

Usage:  python tools/engine_steady_state.py [--steps N]
"""

import argparse
import json
import os
import sys
import time
from types import SimpleNamespace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRAIN_BATCH_VIDEO = 8
TRAIN_BATCH_IMAGE = 8


class _StagedLoader:
    """Pre-staged numpy batches with the production loader's iterator API."""

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)

    def iter_batches(self, start=0):
        n = len(self.batches)
        for i in range(start, n):
            yield self.batches[i]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument(
        "--preput", action="store_true",
        help="stage the batches on device ONCE (H2D excluded — the bench's "
        "condition; the axon tunnel's ~MB/s H2D is not representative of a "
        "production host's DMA)",
    )
    args = ap.parse_args()

    import jax
    import numpy as np

    from svit_tpu.config import assert_and_infer_cfg, get_cfg
    from svit_tpu.engine import meters as meters_lib
    from svit_tpu.engine import steps
    from svit_tpu.engine.train import train_epoch
    from svit_tpu.models import build_model
    from svit_tpu.models.losses import get_loss_func
    from svit_tpu.models.optimizer import construct_optimizer
    from svit_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs", "ssv2.yaml"))
    assert_and_infer_cfg(cfg)
    cfg.LOG_PERIOD = int(os.environ.get("SVIT_ENGINE_LOG_PERIOD", "10"))

    model, arch = build_model(cfg)
    loss_obj = get_loss_func(cfg)
    tx, _ = construct_optimizer(cfg, steps_per_epoch=1000)
    S, T = cfg.DATA.TRAIN_CROP_SIZE, cfg.DATA.NUM_FRAMES

    rs = np.random.RandomState(0)
    n_batches = args.warmup + args.steps
    video_batches = []
    image_batches = []
    for i in range(2):  # two distinct batches, cycled (realistic H2D bytes)
        video_batches.append({
            "clips": rs.randn(TRAIN_BATCH_VIDEO, T, S, S, 3).astype(np.float32),
            "labels": rs.randint(0, cfg.MODEL.NUM_CLASSES, TRAIN_BATCH_VIDEO),
            "weight": np.ones(TRAIN_BATCH_VIDEO, np.float32),
        })
        image_batches.append({
            "frames": rs.randn(TRAIN_BATCH_IMAGE, 1, S, S, 3).astype(np.float32),
            "haog_bboxes": (rs.rand(TRAIN_BATCH_IMAGE, 1, cfg.SVIT.O, 4) * 0.5
                            + 0.1).astype(np.float32),
            "contact_state": rs.randint(-1, 5, (TRAIN_BATCH_IMAGE, 2)),
            "weight": np.ones(TRAIN_BATCH_IMAGE, np.float32),
        })
    loader = _StagedLoader([video_batches[i % 2] for i in range(n_batches)])
    image_loader = _StagedLoader(
        [image_batches[i % 2] for i in range(n_batches)]
    )

    pixel_dtype = None
    if cfg.TRAIN.MIXED_PRECISION:
        import jax.numpy as jnp

        pixel_dtype = jnp.bfloat16

    def put_batch(batch):
        if pixel_dtype is not None:
            batch = {
                k: v.astype(pixel_dtype)
                if getattr(v, "dtype", None) == np.float32
                and k in ("clips", "frames")
                else v
                for k, v in batch.items()
            }
        return jax.device_put(batch)

    if args.preput:
        # Loaders keep yielding the NUMPY batches (train_epoch's host-side
        # weight accounting must stay host math, as in production); put_batch
        # swaps in the pre-staged device twin.  A device-array "weight"
        # would turn train_epoch's int(weight.sum()) into a per-step
        # blocking device sync — the first version of this tool measured
        # exactly that artifact.
        import itertools

        video_dev = itertools.cycle([put_batch(b) for b in video_batches])
        image_dev = itertools.cycle([put_batch(b) for b in image_batches])
        def put_batch(b):  # noqa: F811
            return next(video_dev) if "clips" in b else next(image_dev)

    packed, metric_names = steps.make_packed_train_step(
        model, loss_obj, tx,
        video_weight=7 / 8, image_weight=1 / 8,
        with_image=True, with_consistency=True,
    )
    step_jit = jax.jit(packed, donate_argnums=(0,))

    # Host-built params (bench pattern: avoids the slow tunneled init).
    import jax.numpy as jnp

    x1 = jnp.zeros((1, T, S, S, 3), jnp.float32)
    abstract = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, x1, deterministic=True
        )
    )
    params = jax.tree.map(
        lambda a: jnp.asarray(
            np.random.RandomState(1).standard_normal(a.shape) * 0.02,
            dtype=a.dtype,
        ),
        abstract,
    )["params"]
    state = steps.create_train_state(params, tx)

    trainer = SimpleNamespace(
        train_loader=_StagedLoader(loader.batches[: args.warmup]),
        image_loader=_StagedLoader(image_loader.batches[: args.warmup]),
        put_batch=put_batch,
        step_jit=step_jit,
        metric_names=metric_names,
        steps_per_epoch=n_batches,
        arch=arch,
    )
    rng = jax.random.PRNGKey(0)
    meter = meters_lib.TrainMeter(n_batches, cfg)

    print(f"warmup ({args.warmup} steps, includes compile)...", file=sys.stderr)
    state, _ = train_epoch(cfg, trainer, state, meter, 0, rng)

    trainer.train_loader = _StagedLoader(loader.batches[: args.steps])
    trainer.image_loader = _StagedLoader(image_loader.batches[: args.steps])
    meter = meters_lib.TrainMeter(args.steps, cfg)
    print(f"measuring {args.steps} steps through train_epoch...",
          file=sys.stderr)
    t0 = time.perf_counter()
    state, _ = train_epoch(cfg, trainer, state, meter, 1, rng)
    # train_epoch's trailing flush_pending() syncs on the last step's
    # metrics, so the wall window provably covers all compute.
    dt = time.perf_counter() - t0

    engine_ms = dt / args.steps * 1000
    bench_ms = os.environ.get("SVIT_BENCH_TRAIN_STEP_MS")
    bench_ms = float(bench_ms) if bench_ms else None
    out = {
        "engine_step_ms": round(engine_ms, 1),
        "steps": args.steps,
        "video_clips_per_sec_chip": round(TRAIN_BATCH_VIDEO / (dt / args.steps), 2),
        "log_period": cfg.LOG_PERIOD,
        "bench_train_step_ms": bench_ms,
        "overhead_vs_bench_pct": (
            round((engine_ms / bench_ms - 1) * 100, 2) if bench_ms else None
        ),
        "h2d_excluded": bool(args.preput),
        "note": (
            "real train_epoch at production shapes; host data production "
            "excluded (pre-staged batches); "
            + ("H2D excluded (--preput): the bench's condition"
               if args.preput else
               "H2D included — through the axon tunnel (~MB/s), NOT "
               "representative of a production host's DMA")
        ),
    }
    print(json.dumps(out))
    suffix = "_preput" if args.preput else ""
    path = os.path.join(REPO, "docs", f"ENGINE_STEADY_r05{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
