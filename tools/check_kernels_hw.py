#!/usr/bin/env python3
"""On-hardware numerics gate for the compiled Mosaic (Pallas) kernels.

Every Pallas unit test runs in CPU interpret mode; this tool is the check
that the *compiled* kernels — the actual production code path — compute the
right thing on the real TPU (the reference's analogue: its eval loop runs
on its real device, ``/root/reference/tools/train_net.py:616-617``).

It runs the full-size ssv2 SViT-B forward AND backward on the attached chip
in three variants sharing one fixed-seed parameter set:

  prod  : use_pallas=True,  bf16 compute  (production path, Mosaic kernels)
  xla16 : use_pallas=False, bf16 compute  (pure XLA, same dtype policy)
  f32   : use_pallas=False, f32           (ground truth)

and applies a self-calibrating bound: the production path's deviation from
f32 ground truth must be comparable to XLA-bf16's own deviation —

    err(prod vs f32) <= TOL_RATIO * err(xla16 vs f32) + TOL_ABS

per compared output (raw logits, HAOG boxes, contact) and per gradient
pytree (global relative L2).  bf16 rounding affects both bf16 variants
equally, so a kernel miscompile shows up as err(prod) >> err(xla16) without
any hand-tuned absolute tolerance for "acceptable bf16 drift".

``--selftest`` re-runs the forward gate with SVIT_PALLAS_FAULT=1 (a
deliberate output perturbation in ``pallas_attention.pooled_attention``)
and asserts the gate FAILS — proving sensitivity.

bench.py invokes :func:`run_gate` and reports ``kernels_match_hw``.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Gate batch: small to bound compile time, but FULL model shape (16 x 224)
# because tile-size / layout bugs are shape-dependent.
BATCH = 2
TOL_RATIO = 3.0
TOL_ABS = 2e-3  # floor for outputs where xla16 happens to round luckily


def _rel_err(a, b):
    import numpy as np

    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    denom = max(float(np.linalg.norm(b)), 1e-12)
    return float(np.linalg.norm(a - b)) / denom


def _build_variants(cfg):
    import jax.numpy as jnp

    from svit_tpu.models import build_model

    prod, arch = build_model(cfg, dtype=jnp.bfloat16, use_pallas=True)
    xla16, _ = build_model(cfg, dtype=jnp.bfloat16, use_pallas=False)
    f32, _ = build_model(cfg, dtype=jnp.float32, use_pallas=False)
    return prod, xla16, f32, arch


def _fixed_params(model, x):
    import jax
    import jax.numpy as jnp
    import numpy as np

    abstract = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, x[:1], deterministic=True
        )
    )
    rs = np.random.RandomState(7)
    return jax.tree.map(
        lambda a: jnp.asarray(
            rs.standard_normal(a.shape) * 0.02, dtype=a.dtype
        ),
        abstract,
    )


def _forward_outputs(model, params, x):
    import jax

    # The head consumes only the extras stream (cls + object tokens); the
    # grid stream reaches it solely through later blocks' K/V, so a
    # grid-side kernel fault is heavily attenuated in the head outputs.
    # Capture the LAST block's grid output as a direct probe — it
    # accumulates the entire grid residual stream.
    last_block = f"blocks_{len(model.arch.blocks) - 1}"

    def fwd(p, x):
        (_, extra), state = model.apply(
            p, x, deterministic=True,
            capture_intermediates=lambda mdl, name: (
                name == "__call__" and getattr(mdl, "name", None) == last_block
            ),
            mutable=["intermediates"],
        )
        (block_out,) = state["intermediates"][last_block]["__call__"]
        (grid, _extras), thw = block_out
        # W-carry: the Pallas path's grid may ride wider than the true
        # token width (junk columns by contract) — compare the true region
        if grid.shape[3] > thw[2]:
            grid = grid[:, :, :, : thw[2]]
        return {
            "raw_logits": extra["raw_logits"],
            "pred_bboxes": extra["pred_bboxes"],
            "pred_contact": extra["pred_contact_state"],
            "grid_final": grid,
        }

    return jax.jit(fwd)(params, x)


def _grads(model, loss_obj, params, video, filter_grad: str = "taps"):
    import jax

    from svit_tpu.ops import pooling

    def loss_fn(p):
        logits, extra = model.apply(p, video["clips"], deterministic=True)
        raw = extra.get("raw_logits", logits)
        vdict = loss_obj.video_losses(
            raw, video["labels"], extra, None, video.get("weight")
        )
        return loss_obj.weighted_sum(vdict)

    # The ground-truth variant traces with XLA's native filter-grad so the
    # production taps implementation is checked against an INDEPENDENT one
    # (a consistent-but-wrong taps result would otherwise self-confirm).
    prev = pooling.FILTER_GRAD_IMPL
    pooling.FILTER_GRAD_IMPL = filter_grad
    try:
        return jax.jit(jax.grad(loss_fn))(params)
    finally:
        pooling.FILTER_GRAD_IMPL = prev


def _grads_train(model, loss_obj, params, video, rng):
    """TRAIN-mode grads: deterministic=False with active drop-path, so the
    masked fused residual tail (fused_ffn_residual_masked) and its VJP run.
    All variants draw identical per-sample masks: the fused and unfused
    paths call make_rng("dropout") the same number of times in the same
    order (asserted on CPU by test_model_droppath_train_fused_matches_unfused).
    """
    import jax

    def loss_fn(p):
        logits, extra = model.apply(
            p, video["clips"], deterministic=False, rngs={"dropout": rng}
        )
        raw = extra.get("raw_logits", logits)
        vdict = loss_obj.video_losses(
            raw, video["labels"], extra, None, video.get("weight")
        )
        return loss_obj.weighted_sum(vdict)

    return jax.jit(jax.grad(loss_fn))(params)


def _train_mode_gate(report, verbose=False):
    """Small-size train-mode gradient gate (the masked-kernel code path is
    shape-independent; small shapes bound the tunnel compile time)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from svit_tpu.config import assert_and_infer_cfg, get_cfg
    from svit_tpu.models.losses import get_loss_func

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs", "ssv2.yaml"))
    cfg.DATA.TRAIN_CROP_SIZE = cfg.DATA.TEST_CROP_SIZE = 56
    cfg.DATA.NUM_FRAMES = 4
    cfg.MVIT.DEPTH = 3
    cfg.MVIT.DIM_MUL = [[1, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0]]
    cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1], [1, 1, 2, 2], [2, 1, 1, 1]]
    cfg.MVIT.DROPPATH_RATE = 0.4
    assert_and_infer_cfg(cfg)

    prod, xla16, f32, _ = _build_variants(cfg)
    S, T = cfg.DATA.TEST_CROP_SIZE, cfg.DATA.NUM_FRAMES
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(4, T, S, S, 3).astype(np.float32))
    params = _fixed_params(f32, x)
    loss_obj = get_loss_func(cfg)
    video = {
        "clips": x,
        "labels": jnp.asarray(rs.randint(0, 174, 4)),
        "weight": jnp.ones((4,), jnp.float32),
    }
    rng = jax.random.PRNGKey(11)
    flat = {}
    for name, model in (("prod", prod), ("xla16", xla16), ("f32", f32)):
        g = jax.device_get(_grads_train(model, loss_obj, params, video, rng))
        flat[name] = np.concatenate([
            np.asarray(l, np.float64).ravel()
            for l in jax.tree_util.tree_leaves(g)
        ])
        if verbose:
            print(f"train grads[{name}] done", file=sys.stderr)
    return _gate_one(
        "train.grads_global", flat["prod"], flat["xla16"], flat["f32"], report
    )


def _gate_one(name, prod_val, xla16_val, f32_val, report):
    e_prod = _rel_err(prod_val, f32_val)
    e_xla = _rel_err(xla16_val, f32_val)
    ok = e_prod <= TOL_RATIO * e_xla + TOL_ABS
    report[name] = {
        "err_pallas_vs_f32": round(e_prod, 6),
        "err_xla_bf16_vs_f32": round(e_xla, 6),
        "ok": ok,
    }
    return ok


def run_gate(
    check_bwd: bool = True, verbose: bool = False, small: bool = False
) -> dict:
    """Run the gate on the default backend. Returns the report dict with an
    overall ``ok`` field (does not raise on mismatch).

    ``small`` shrinks crop/frames/depth for a fast smoke run (CI / CPU);
    the real gate runs at full 16 x 224 where tile choices are exercised.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from svit_tpu.config import assert_and_infer_cfg, get_cfg
    from svit_tpu.models.losses import get_loss_func
    from svit_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs", "ssv2.yaml"))
    if small:
        cfg.DATA.TRAIN_CROP_SIZE = cfg.DATA.TEST_CROP_SIZE = 56
        cfg.DATA.NUM_FRAMES = 4
        cfg.MVIT.DEPTH = 3
        # depth-indexed schedule lists must be trimmed to the new depth
        cfg.MVIT.DIM_MUL = [[1, 2.0]]
        cfg.MVIT.HEAD_MUL = [[1, 2.0]]
        cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1], [1, 1, 2, 2], [2, 1, 1, 1]]
    assert_and_infer_cfg(cfg)

    prod, xla16, f32, arch = _build_variants(cfg)
    S, T = cfg.DATA.TEST_CROP_SIZE, cfg.DATA.NUM_FRAMES
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(BATCH, T, S, S, 3).astype(np.float32))
    params = _fixed_params(f32, x)

    report = {"backend": jax.default_backend(), "batch": BATCH}
    ok = True

    outs = {}
    for name, model in (("prod", prod), ("xla16", xla16), ("f32", f32)):
        outs[name] = jax.device_get(_forward_outputs(model, params, x))
        if verbose:
            print(f"forward[{name}] done", file=sys.stderr)
    for key in outs["f32"]:
        ok &= _gate_one(
            f"fwd.{key}", outs["prod"][key], outs["xla16"][key],
            outs["f32"][key], report,
        )

    if check_bwd:
        loss_obj = get_loss_func(cfg)
        video = {
            "clips": x,
            "labels": jnp.asarray(rs.randint(0, 174, BATCH)),
            "weight": jnp.ones((BATCH,), jnp.float32),
        }
        grads = {}
        for name, model, fg in (
            ("prod", prod, "taps"),
            ("xla16", xla16, "taps"),
            ("f32", f32, "native"),
        ):
            grads[name] = jax.device_get(
                _grads(model, loss_obj, params, video, filter_grad=fg)
            )
            if verbose:
                print(f"grads[{name}] done", file=sys.stderr)

        flat = {
            name: jax.tree_util.tree_leaves(g) for name, g in grads.items()
        }

        def _cat(leaves):
            return np.concatenate(
                [np.asarray(l, np.float64).ravel() for l in leaves]
            )

        ok &= _gate_one(
            "bwd.grads_global",
            _cat(flat["prod"]), _cat(flat["xla16"]), _cat(flat["f32"]),
            report,
        )
        # worst single leaf by EXCESS over xla16's own bf16 error (a tiny-norm
        # leaf where both bf16 variants drift equally is noise, not a bug)
        paths = jax.tree_util.tree_leaves_with_path(grads["f32"])
        worst = (0.0, None, 0.0, 0.0, 0.0)
        for i, (path, ref_leaf) in enumerate(paths):
            e_p = _rel_err(flat["prod"][i], ref_leaf)
            e_x = _rel_err(flat["xla16"][i], ref_leaf)
            excess = e_p - e_x
            if excess > worst[0]:
                worst = (
                    excess, jax.tree_util.keystr(path), e_p, e_x,
                    float(np.linalg.norm(
                        np.asarray(ref_leaf, np.float64).ravel()
                    )),
                )
        report["bwd.worst_leaf"] = {
            "excess": round(worst[0], 6),
            "path": worst[1],
            "err_pallas": round(worst[2], 6),
            "err_xla_bf16": round(worst[3], 6),
            # rel-err is vs this norm: a huge rel-err on a ~0-norm leaf
            # (e.g. a dead bias) is bf16 noise, not a kernel bug
            "f32_grad_norm": round(worst[4], 8),
        }
        ok &= _train_mode_gate(report, verbose=verbose)

    report["ok"] = bool(ok)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-bwd", action="store_true")
    ap.add_argument("--small", action="store_true")
    ap.add_argument(
        "--selftest", action="store_true",
        help="re-run the fwd gate with fault injection; exit 0 iff it trips",
    )
    args = ap.parse_args()

    if args.selftest:
        os.environ["SVIT_PALLAS_FAULT"] = "1"
        report = run_gate(check_bwd=False, verbose=True, small=args.small)
        print(json.dumps(report, indent=1))
        if report["ok"]:
            print("SELFTEST FAILED: gate did not trip on injected fault",
                  file=sys.stderr)
            sys.exit(1)
        print("selftest ok: gate trips on injected fault", file=sys.stderr)
        sys.exit(0)

    report = run_gate(
        check_bwd=not args.no_bwd, verbose=True, small=args.small
    )
    print(json.dumps(report, indent=1))
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
