#!/usr/bin/env python3
"""Device-level trace of the model forward: per-fusion time breakdown.

Captures a jax.profiler trace of N forward iterations on the attached TPU and
prints device ops aggregated by name, heaviest first. This is the ground truth
for the perf work (tools/profile_model.py gives only whole-jit wall times).

Usage: python tools/trace_forward.py [--batch 16] [--iters 5] [--train]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default="/tmp/svit_trace")
    ap.add_argument("--train", action="store_true",
                    help="trace the fused train step (bench.py shapes) "
                         "instead of the forward")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from svit_tpu.config import assert_and_infer_cfg, get_cfg
    from svit_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs", "ssv2.yaml"))
    assert_and_infer_cfg(cfg)
    model, _ = build_model(cfg)

    S, T = cfg.DATA.TEST_CROP_SIZE, cfg.DATA.NUM_FRAMES
    x = jnp.asarray(
        np.random.RandomState(0).randn(args.batch, T, S, S, 3).astype(np.float32)
    )
    abstract = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x[:1], deterministic=True)
    )
    params = jax.tree.map(
        lambda a: jnp.asarray(
            np.random.RandomState(1).standard_normal(a.shape) * 0.02, a.dtype
        ),
        abstract,
    )
    if args.train:
        # the bench.py train step: video CE + image HAOG + consistency,
        # donated state — iterations chain through the state naturally
        from svit_tpu.engine import steps
        from svit_tpu.models.losses import get_loss_func
        from svit_tpu.models.optimizer import construct_optimizer

        loss_obj = get_loss_func(cfg)
        tx, _ = construct_optimizer(cfg, steps_per_epoch=1000)
        Bv = Bi = max(args.batch // 2, 1)
        rs = np.random.RandomState(0)
        video = {
            "clips": jnp.asarray(rs.randn(Bv, T, S, S, 3), jnp.float32),
            "labels": jnp.asarray(rs.randint(0, 174, Bv)),
            "weight": jnp.ones((Bv,), jnp.float32),
        }
        image = {
            "frames": jnp.asarray(rs.randn(Bi, 1, S, S, 3), jnp.float32),
            "haog_bboxes": jnp.asarray(
                rs.rand(Bi, 1, cfg.SVIT.O, 4) * 0.5 + 0.1, jnp.float32
            ),
            "contact_state": jnp.asarray(rs.randint(-1, 5, (Bi, 2))),
            "weight": jnp.ones((Bi,), jnp.float32),
        }
        state = steps.create_train_state(params["params"], tx)
        step_fn = jax.jit(
            steps.make_train_step(
                model, loss_obj, tx, video_weight=7 / 8, image_weight=1 / 8,
                with_image=True, with_consistency=True,
            ),
            donate_argnums=(0,),
        )
        rng = jax.random.PRNGKey(1)
        state, m = step_fn(state, video, image, rng)
        _ = float(m["loss"])

        os.system(f"rm -rf {args.out}")
        jax.profiler.start_trace(args.out)
        for i in range(args.iters):
            state, m = step_fn(state, video, image, jax.random.fold_in(rng, i))
        _ = float(m["loss"])
        jax.profiler.stop_trace()
    else:
        fwd = jax.jit(
            lambda p, x, s: model.apply(p, x + s * 0, deterministic=True)[0]
        )
        s = jnp.float32(0)
        for _ in range(3):
            s = fwd(params, x, s).mean()
        _ = float(s)

        os.system(f"rm -rf {args.out}")
        jax.profiler.start_trace(args.out)
        s = jnp.float32(0)
        for _ in range(args.iters):
            s = fwd(params, x, s).mean()
        _ = float(s)
        jax.profiler.stop_trace()

    path = sorted(glob.glob(f"{args.out}/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(path) as f:
        t = json.load(f)
    evs = t.get("traceEvents", [])
    dev_pids = {
        e["pid"]
        for e in evs
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    agg = Counter()
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            agg[e.get("name", "?")] += e.get("dur", 0)
    total = sum(v for k, v in agg.items() if not k.startswith("jit_"))
    print(f"device total (non-jit rows): {total / args.iters / 1000:.2f} ms/iter")
    for name, us in agg.most_common(args.top):
        print(f"{us / args.iters / 1000:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
