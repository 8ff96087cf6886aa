#!/usr/bin/env python3
"""Benchmark: SViT-B/16 (ssv2.yaml) on the attached TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

- ``value``: inference clips/sec/chip (bf16 forward, batch 16).
- ``train_clips_per_sec``: video clips/sec/chip through the FUSED train step
  (fwd + bwd + AdamW for the joint video+image objective incl. the
  frame-clip consistency forward) — the north-star training metric
  (BASELINE.json configs[4]).
- ``mfu_fwd`` / ``mfu_train``: model FLOP utilization against the v5e bf16
  peak (197 TFLOP/s), with FLOPs from the analytic model
  (``svit_tpu/utils/flops.py`` — XLA's cost analysis cannot see inside the
  Pallas custom calls and undercounts ~3x; its number is kept as
  ``mfu_*_xla_excl_pallas`` fields, valid only for the pure-XLA ablation).
- Baseline = the PyTorch reference model forward on this host's CPU,
  batch-matched and averaged over iterations (cached in
  ``.bench_baseline.json``; delete the file to re-measure).  NOTE: this is a
  CPU smoke comparison only — the ≥5x north-star target is against GPU-class
  hardware; ``value`` (clips/s/chip) and the MFU fields are the numbers that
  matter.
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")
# Tracked artifact holding the latest REAL hardware gate report.  Tests that
# exercise run_gate_subprocess with mocked child output MUST monkeypatch this
# to a tmp path — a round-4 advisor finding caught the unit test clobbering
# the genuine hardware record at this path.
GATE_ARTIFACT = os.path.join(REPO, "docs", "KERNEL_GATE_latest.json")
BATCH = 16
ITERS = 20
TRAIN_BATCH_VIDEO = 8
TRAIN_BATCH_IMAGE = 8
TRAIN_ITERS = 10
V5E_BF16_PEAK = 197e12


def _flops_of(compiled) -> float:
    """XLA-reported FLOPs for one execution (0.0 if unavailable)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _build():
    from svit_tpu.config import assert_and_infer_cfg, get_cfg
    from svit_tpu.models import build_model
    from svit_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs", "ssv2.yaml"))
    assert_and_infer_cfg(cfg)
    model, arch = build_model(cfg)  # bf16 compute per the shipped recipe
    return cfg, model, arch


def _host_params(model, x):
    import jax
    import jax.numpy as jnp
    import numpy as np

    # Host-built params (zeros don't change FLOPs; avoids a 3-min init compile
    # through the TPU tunnel).
    abstract = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, x[:1], deterministic=True
        )
    )
    return jax.tree.map(
        lambda a: jnp.asarray(
            np.random.RandomState(1).standard_normal(a.shape) * 0.02,
            dtype=a.dtype,
        ),
        abstract,
    )


def measure_tpu_forward(cfg, model, params):
    import jax
    import jax.numpy as jnp
    import numpy as np

    S, T = cfg.DATA.TEST_CROP_SIZE, cfg.DATA.NUM_FRAMES
    # bf16 inputs when the model computes in bf16: numerically identical to
    # the model's internal cast, halves host->device bytes, and kills a
    # ~1.2 ms on-device convert+relayout of the [B,T,224,224,3] clip.
    in_dt = jnp.bfloat16 if cfg.TRAIN.MIXED_PRECISION else jnp.float32
    x = jnp.asarray(
        np.random.RandomState(0).randn(BATCH, T, S, S, 3), in_dt
    )

    # NOTE: on the tunneled TPU platform ``block_until_ready`` does not force
    # execution; chain each iteration on the previous output and fetch a
    # scalar at the end so the measured window provably covers all compute.
    from svit_tpu.utils.flops import forward_flops

    fwd = jax.jit(
        # the chain scalar must not promote bf16 inputs back to f32
        lambda p, x, s: model.apply(
            p, x + (s * 0).astype(x.dtype), deterministic=True
        )[0]
    )
    flops = forward_flops(model.arch, BATCH, cfg.DATA.NUM_FRAMES)
    flops_xla = _flops_of(fwd.lower(params, x, jnp.float32(0)).compile())
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
    mfu = (flops / dt) / V5E_BF16_PEAK if flops else None
    mfu_xla = (flops_xla / dt) / V5E_BF16_PEAK if flops_xla else None

    # p50 per-clip latency at batch 1 (each iter fetched -> true latency);
    # 2 warmups + 11 samples: the tunnel adds multi-ms jitter and 5 samples
    # bounced the reported p50 between 33 and 41 ms across runs
    x1 = x[:1]
    for _ in range(2):
        _ = float(fwd(params, x1, jnp.float32(0)).mean())
    lat_times = []
    for _ in range(11):
        t0 = time.perf_counter()
        _ = float(fwd(params, x1, jnp.float32(0)).mean())
        lat_times.append(time.perf_counter() - t0)
    lat_ms = sorted(t * 1000 for t in lat_times)
    p50 = {
        "p50_ms": lat_ms[len(lat_ms) // 2],
        # tunnel jitter bounced 5-sample p50s between 33 and 41 ms across
        # runs (commit 3c660cf); the spread makes that visible in the JSON
        "min_ms": lat_ms[0],
        "max_ms": lat_ms[-1],
        "n": len(lat_ms),
    }
    return clips_per_sec, p50, mfu, mfu_xla


def measure_tpu_train(cfg, model, params):
    """Fused video+image train step (fwd+bwd+AdamW, consistency forward)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from svit_tpu.engine import steps
    from svit_tpu.models.losses import get_loss_func
    from svit_tpu.models.optimizer import construct_optimizer

    loss_obj = get_loss_func(cfg)
    tx, _ = construct_optimizer(cfg, steps_per_epoch=1000)
    S, T = cfg.DATA.TRAIN_CROP_SIZE, cfg.DATA.NUM_FRAMES
    rs = np.random.RandomState(0)
    video = {
        "clips": jnp.asarray(
            rs.randn(TRAIN_BATCH_VIDEO, T, S, S, 3), jnp.float32
        ),
        "labels": jnp.asarray(rs.randint(0, 174, TRAIN_BATCH_VIDEO)),
        "weight": jnp.ones((TRAIN_BATCH_VIDEO,), jnp.float32),
    }
    image = {
        "frames": jnp.asarray(
            rs.randn(TRAIN_BATCH_IMAGE, 1, S, S, 3), jnp.float32
        ),
        "haog_bboxes": jnp.asarray(
            rs.rand(TRAIN_BATCH_IMAGE, 1, cfg.SVIT.O, 4) * 0.5 + 0.1,
            jnp.float32,
        ),
        "contact_state": jnp.asarray(
            rs.randint(-1, 5, (TRAIN_BATCH_IMAGE, 2))
        ),
        "weight": jnp.ones((TRAIN_BATCH_IMAGE,), jnp.float32),
    }
    state = steps.create_train_state(params["params"], tx)
    # donate the state (as the train engine does) — without donation each
    # step leaves a ~500MB undead state and HBM allocation thrash triples
    # the step time
    step_fn = jax.jit(
        steps.make_train_step(
            model, loss_obj, tx,
            video_weight=7 / 8, image_weight=1 / 8,
            with_image=True, with_consistency=True,
        ),
        donate_argnums=(0,),
    )
    from svit_tpu.utils.flops import train_step_flops

    flops = train_step_flops(
        model.arch, TRAIN_BATCH_VIDEO, TRAIN_BATCH_IMAGE,
        with_consistency=True,
    )
    flops_xla = _flops_of(
        step_fn.lower(state, video, image, jax.random.PRNGKey(1)).compile()
    )
    rng = jax.random.PRNGKey(1)
    state, m = step_fn(state, video, image, rng)  # compile + warm
    _ = float(m["loss"])
    t0 = time.perf_counter()
    # constant rng operand: the step folds in state.step itself (engine
    # semantics).  A per-iter host-side fold_in is a separate tiny dispatch
    # through the TPU tunnel that stalls the pipeline ~11 ms/step.
    for i in range(TRAIN_ITERS):
        state, m = step_fn(state, video, image, rng)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / TRAIN_ITERS
    mfu = (flops / dt) / V5E_BF16_PEAK if flops else None
    mfu_xla = (flops_xla / dt) / V5E_BF16_PEAK if flops_xla else None
    return TRAIN_BATCH_VIDEO / dt, dt * 1000, mfu, mfu_xla


# Torch-CPU forward measured on this host (r1-r3, stable at ~0.09): the
# live re-measurement takes ~6 min at batch 16 and must never be allowed to
# delay the primary metric on a fresh clone.  Set SVIT_BENCH_MEASURE_BASELINE=1
# to re-measure (result is then cached in .bench_baseline.json).
RECORDED_CPU_CLIPS_PER_SEC = 0.0908


def measure_torch_cpu_baseline():
    """Reference model forward on CPU — batch-matched, averaged (cached).

    Returns ``(clips_per_sec, source)`` where ``source`` records the
    provenance of the number ("cached" | "recorded-r1r3" | "measured" |
    "estimate-after-failure") so the emitted ``vs_baseline`` ratio is
    self-describing.
    """
    if os.path.isfile(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
            if cached.get("batch") == BATCH:
                return cached["cpu_clips_per_sec"], "cached"
    if os.environ.get("SVIT_BENCH_MEASURE_BASELINE", "0") != "1":
        return RECORDED_CPU_CLIPS_PER_SEC, "recorded-r1r3"
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
        x = torch.zeros(BATCH, 3, 16, 224, 224)
        with torch.no_grad():
            m([x], {})  # warm-up
            iters = 2
            t0 = time.perf_counter()
            for _ in range(iters):
                m([x], {})
            dt = (time.perf_counter() - t0) / iters
        result, source = BATCH / dt, "measured"
    except Exception as e:
        print(f"baseline measurement failed ({e}); using recorded value",
              file=sys.stderr)
        result, source = 0.5, "estimate-after-failure"
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"cpu_clips_per_sec": result, "batch": BATCH}, f)
    return result, source


def run_gate_subprocess(timeout_s: float):
    """On-hardware kernel numerics gate, STRICTLY time-boxed.

    Runs ``tools/check_kernels_hw.py`` (fwd + bwd + train-mode) in a child
    process with a hard timeout so a hung Mosaic compile can never eat the
    driver's budget — round 3's bench died exactly that way (rc=124 before
    the first JSON byte).  The full report lands in
    ``docs/KERNEL_GATE_latest.json``; the bench JSON carries the verdict.
    """
    script = os.path.join(REPO, "tools", "check_kernels_hw.py")
    try:
        proc = subprocess.run(
            [sys.executable, script],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        print(f"bench: kernel gate timed out after {timeout_s:.0f}s",
              file=sys.stderr, flush=True)
        return {"ok": "timeout"}
    except Exception as e:
        print(f"bench: kernel gate failed to launch: {e}", file=sys.stderr)
        return {"ok": "error"}
    brace = proc.stdout.find("{")
    if brace >= 0:
        try:
            report = json.loads(proc.stdout[brace:])
        except json.JSONDecodeError:
            report = None
        if report is not None:
            try:
                with open(GATE_ARTIFACT, "w") as f:
                    json.dump(report, f, indent=1)
            except OSError:
                pass
            return report
    print(f"bench: kernel gate produced no report (rc={proc.returncode}): "
          f"{proc.stderr[-400:]}", file=sys.stderr, flush=True)
    return {"ok": "error"}


_RESULT = {}


def _emit(out=None):
    """Print the current result JSON line (the driver parses the LAST one)."""
    print(json.dumps(out or _RESULT), flush=True)


def _on_term(signum, frame):
    # the driver's `timeout` sends SIGTERM: flush whatever we measured so the
    # round always has a perf record, then exit cleanly
    if _RESULT.get("value"):
        _RESULT.setdefault("note", "terminated before completion")
        _emit()
    # conventional signal exit code: the partial JSON is flushed above, but
    # rc-based harnesses must still see that the run was terminated
    os._exit(128 + 15)


def main():
    signal.signal(signal.SIGTERM, _on_term)
    cfg, model, arch = _build()
    import jax.numpy as jnp
    import numpy as np

    S, T = cfg.DATA.TEST_CROP_SIZE, cfg.DATA.NUM_FRAMES
    x = jnp.asarray(np.zeros((1, T, S, S, 3), np.float32))
    params = _host_params(model, x)

    # 1) PRIMARY metric first — nothing may run before it.
    print("bench: forward...", file=sys.stderr, flush=True)
    clips_per_sec, p50, mfu_fwd, mfu_fwd_xla = measure_tpu_forward(
        cfg, model, params
    )
    baseline, baseline_source = measure_torch_cpu_baseline()
    _RESULT.update({
        "metric": "clips/sec/chip (16f x 224 SViT-B, bf16 fwd, "
        f"batch {BATCH}; p50 latency {p50['p50_ms']:.1f} ms/clip @ bs1)",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        # CPU smoke comparison only — see module docstring.
        "vs_baseline": round(clips_per_sec / baseline, 2),
        "baseline_source": baseline_source,
        "p50_ms_bs1": round(p50["p50_ms"], 2),
        "p50_spread_bs1": {
            k: round(v, 2) if isinstance(v, float) else v
            for k, v in p50.items() if k != "p50_ms"
        },
    })
    if mfu_fwd:
        _RESULT["mfu_fwd"] = round(mfu_fwd, 4)
    if mfu_fwd_xla:
        # XLA cost analysis cannot see FLOPs inside Pallas custom calls —
        # on the Pallas path this is a gross undercount, kept only for the
        # pure-XLA ablation.  The field name says so.
        _RESULT["mfu_fwd_xla_excl_pallas"] = round(mfu_fwd_xla, 4)
    _emit()  # perf record secured; everything below only enriches it

    # 2) Train step.
    print(f"bench: forward {clips_per_sec:.1f} clips/s; train step...",
          file=sys.stderr, flush=True)
    try:
        train_cps, train_ms, mfu_train, mfu_train_xla = measure_tpu_train(
            cfg, model, params
        )
    except Exception as e:  # train bench must never hide the primary metric
        print(f"train-step bench failed: {e}", file=sys.stderr)
        train_cps = train_ms = mfu_train = mfu_train_xla = None
    if train_cps:
        _RESULT["train_clips_per_sec_chip"] = round(train_cps, 2)
        _RESULT["train_step_ms"] = round(train_ms, 1)
        if mfu_train:
            _RESULT["mfu_train"] = round(mfu_train, 4)
        if mfu_train_xla:
            _RESULT["mfu_train_xla_excl_pallas"] = round(mfu_train_xla, 4)
    _emit()

    # 3) Kernel numerics gate, time-boxed (a wrong-answer kernel must be
    # visible next to any "fast" number — but may never suppress it).
    if os.environ.get("SVIT_BENCH_SKIP_GATE", "0") != "1":
        print("bench: kernel gate...", file=sys.stderr, flush=True)
        budget = float(os.environ.get("SVIT_BENCH_GATE_TIMEOUT_S", "900"))
        gate = run_gate_subprocess(budget)
        _RESULT["kernels_match_hw"] = gate.get("ok")
        bwd = gate.get("bwd.grads_global")
        if bwd:
            _RESULT["kernel_gate_bwd_err"] = bwd.get("err_pallas_vs_f32")
        train_gate = gate.get("train.grads_global")
        if train_gate:
            _RESULT["kernel_gate_train_err"] = train_gate.get(
                "err_pallas_vs_f32"
            )
            _RESULT["kernel_gate_train_ok"] = train_gate.get("ok")
    _emit()


if __name__ == "__main__":
    main()
