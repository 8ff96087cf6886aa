"""Epilogue-fusion ops: out-proj folded into the attention kernel and the
residual tail folded into the FFN kernel.

Reference behavior being matched:
- out-projection after attention: reference ``slowfast/models/attention.py``
  (``self.proj(x)`` after the pooled attention, with the residual-pooling
  ``x += q`` immediately before it, attention.py:455-459).
- the block residual tail: ``x = x + drop_path(attn); x = x + drop_path(mlp)``
  (reference attention.py block forward).  With drop-path inactive the fused
  kernel computes the identical chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svit_tpu.ops import pallas_attention as pa
from svit_tpu.ops import pallas_ffn as pf


def _attn_inputs(B=2, Nq=40, Nk=24, C=32, heads=4, k_shape=(3, 4, 2)):
    rng = np.random.RandomState(7)
    R = sum(k_shape) + 1
    q = jnp.asarray(rng.randn(B, Nq, C), jnp.float32)
    kv = jnp.asarray(rng.randn(B, Nk, 2 * C), jnp.float32)
    bias = jnp.asarray(rng.randn(B, heads, Nq, R) * 0.1, jnp.float32)
    bias = bias.at[..., -1].set(1.0)
    n_k_pad = 128
    scatter = jnp.asarray(
        pa._scatter_matrix(k_shape, Nk, n_k_pad, 0), jnp.float32
    )
    wp = jnp.asarray(rng.randn(C, C) * 0.05, jnp.float32)
    bp = jnp.asarray(rng.randn(C) * 0.05, jnp.float32)
    return q, kv, bias, scatter, wp, bp


@pytest.mark.parametrize("q_residual", [False, True])
def test_fused_attention_proj_matches_reference(q_residual):
    q, kv, bias, scatter, wp, bp = _attn_inputs()
    scale = 0.25
    heads = 4
    Nk = kv.shape[1]

    def ref(q, kv, bias, wp, bp):
        att = pa._reference_attention(q, kv, bias, scatter[:, :Nk], scale, heads)
        if q_residual:
            att = att + q
        return att @ wp + bp

    out = pa.fused_attention_proj(
        q, kv, bias, scatter, wp, bp, scale, heads, q_residual
    )
    r = ref(q, kv, bias, wp, bp)
    assert float(jnp.abs(out - r).max() / jnp.abs(r).max()) < 1e-5


@pytest.mark.parametrize("q_residual", [False, True])
def test_fused_attention_proj_gradients(q_residual):
    q, kv, bias, scatter, wp, bp = _attn_inputs()
    scale = 0.25
    heads = 4
    Nk = kv.shape[1]

    def loss_fused(q, kv, bias, wp, bp):
        o = pa.fused_attention_proj(
            q, kv, bias, scatter, wp, bp, scale, heads, q_residual
        )
        return (o ** 2).sum()

    def loss_ref(q, kv, bias, wp, bp):
        att = pa._reference_attention(q, kv, bias, scatter[:, :Nk], scale, heads)
        if q_residual:
            att = att + q
        return ((att @ wp + bp) ** 2).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, kv, bias, wp, bp)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, kv, bias, wp, bp)
    for a, b, name in zip(gf, gr, ("q", "kv", "bias", "wp", "bp")):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 1e-5, f"grad {name} rel err {rel}"


def test_ffn_residual_matches_reference():
    rng = np.random.RandomState(3)
    B, N, C, H = 2, 48, 32, 64
    xr = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    a = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    ls = jnp.asarray(1 + 0.1 * rng.randn(C), jnp.float32)
    lb = jnp.asarray(0.1 * rng.randn(C), jnp.float32)
    w1 = jnp.asarray(0.1 * rng.randn(C, H), jnp.float32)
    b1 = jnp.asarray(0.1 * rng.randn(H), jnp.float32)
    w2 = jnp.asarray(0.1 * rng.randn(H, C), jnp.float32)
    b2 = jnp.asarray(0.1 * rng.randn(C), jnp.float32)
    args = (xr, a, ls, lb, w1, b1, w2, b2)

    o1 = pf.fused_ffn_residual(*args)
    o2 = pf.ffn_residual_reference(*args)
    assert float(jnp.abs(o1 - o2).max() / jnp.abs(o2).max()) < 1e-5

    gf = jax.grad(lambda *t: (pf.fused_ffn_residual(*t) ** 2).sum(),
                  argnums=tuple(range(8)))(*args)
    gr = jax.grad(lambda *t: (pf.ffn_residual_reference(*t) ** 2).sum(),
                  argnums=tuple(range(8)))(*args)
    for i, (x1, x2) in enumerate(zip(gf, gr)):
        rel = float(jnp.abs(x1 - x2).max() / (jnp.abs(x2).max() + 1e-9))
        assert rel < 1e-5, f"ffn grad {i} rel err {rel}"


def test_ffn_residual_equals_unfused_chain():
    """The fold must be bit-compatible with the ops it replaces:
    x = xr + a; out = x + fused_ffn(x)."""
    rng = np.random.RandomState(5)
    B, N, C, H = 1, 24, 16, 32
    xr = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    a = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    ls = jnp.ones((C,), jnp.float32)
    lb = jnp.zeros((C,), jnp.float32)
    w1 = jnp.asarray(0.1 * rng.randn(C, H), jnp.float32)
    b1 = jnp.zeros((H,), jnp.float32)
    w2 = jnp.asarray(0.1 * rng.randn(H, C), jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)
    x = xr + a
    unfused = x + pf.fused_ffn(x, ls, lb, w1, b1, w2, b2)
    fused = pf.fused_ffn_residual(xr, a, ls, lb, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               rtol=1e-6, atol=1e-6)


def test_fused_ln_qkv_matches_reference():
    rng = np.random.RandomState(11)
    B, N, C, O = 2, 40, 32, 24
    x = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    ls = jnp.asarray(1 + 0.1 * rng.randn(C), jnp.float32)
    lb = jnp.asarray(0.1 * rng.randn(C), jnp.float32)
    wq = jnp.asarray(0.1 * rng.randn(C, O), jnp.float32)
    bq = jnp.asarray(0.1 * rng.randn(O), jnp.float32)
    wkv = jnp.asarray(0.1 * rng.randn(C, 2 * O), jnp.float32)
    bkv = jnp.asarray(0.1 * rng.randn(2 * O), jnp.float32)
    args = (x, ls, lb, wq, bq, wkv, bkv)

    q1, kv1 = pf.fused_ln_qkv(*args)
    q2, kv2 = pf.ln_qkv_reference(*args)
    assert float(jnp.abs(q1 - q2).max() / jnp.abs(q2).max()) < 1e-5
    assert float(jnp.abs(kv1 - kv2).max() / jnp.abs(kv2).max()) < 1e-5

    def lf(*t):
        q, kv = pf.fused_ln_qkv(*t)
        return (q ** 2).sum() + (kv ** 3).sum()

    def lr(*t):
        q, kv = pf.ln_qkv_reference(*t)
        return (q ** 2).sum() + (kv ** 3).sum()

    gf = jax.grad(lf, argnums=tuple(range(7)))(*args)
    gr = jax.grad(lr, argnums=tuple(range(7)))(*args)
    for i, (a, b) in enumerate(zip(gf, gr)):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 1e-5, f"ln_qkv grad {i} rel err {rel}"


def _res_args(dtype=jnp.float32, B=3, N=48, C=32, H=64, seed=13):
    rng = np.random.RandomState(seed)
    xr = jnp.asarray(rng.randn(B, N, C), dtype)
    a = jnp.asarray(rng.randn(B, N, C), dtype)
    ls = jnp.asarray(1 + 0.1 * rng.randn(C), jnp.float32)
    lb = jnp.asarray(0.1 * rng.randn(C), jnp.float32)
    w1 = jnp.asarray(0.1 * rng.randn(C, H), dtype)
    b1 = jnp.asarray(0.1 * rng.randn(H), jnp.float32)
    w2 = jnp.asarray(0.1 * rng.randn(H, C), dtype)
    b2 = jnp.asarray(0.1 * rng.randn(C), jnp.float32)
    ma = jnp.asarray([1.0, 0.0, 1.0][:B], jnp.float32)
    my = jnp.asarray([1.0, 1.0, 0.0][:B], jnp.float32)
    return (xr, a, ls, lb, w1, b1, w2, b2, ma, my)


def test_ffn_residual_masked_matches_reference():
    keep = 0.7
    args = _res_args()
    o1 = pf.fused_ffn_residual_masked(keep, *args)
    o2 = pf.ffn_residual_masked_reference(keep, *args)
    assert float(jnp.abs(o1 - o2).max() / jnp.abs(o2).max()) < 1e-5

    gf = jax.grad(lambda *t: (pf.fused_ffn_residual_masked(keep, *t) ** 2).sum(),
                  argnums=tuple(range(8)))(*args)
    gr = jax.grad(lambda *t: (pf.ffn_residual_masked_reference(keep, *t) ** 2).sum(),
                  argnums=tuple(range(8)))(*args)
    for i, (x1, x2) in enumerate(zip(gf, gr)):
        rel = float(jnp.abs(x1 - x2).max() / (jnp.abs(x2).max() + 1e-9))
        assert rel < 1e-5, f"masked ffn grad {i} rel err {rel}"


def test_ffn_residual_masked_drop_semantics():
    """mask=0 drops the branch per sample: a-mask kills the attention
    residual, y-mask kills the MLP branch (out == x for that sample)."""
    keep = 0.5
    xr, a, ls, lb, w1, b1, w2, b2, ma, my = _res_args(B=3)
    out = pf.fused_ffn_residual_masked(keep, xr, a, ls, lb, w1, b1, w2, b2,
                                       ma, my)
    # sample 1: ma=0 -> x == xr; sample 2: my=0 -> out == x
    x1 = xr[1]
    exp1 = x1 + pf.ffn_reference(x1[None], ls, lb, w1, b1, w2, b2)[0] / keep
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(exp1),
                               rtol=1e-5, atol=1e-5)
    x2 = xr[2] + a[2] / keep
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(x2),
                               rtol=1e-6, atol=1e-6)


def test_ffn_residual_masked_all_keep_equals_unmasked():
    """keep=1 with all-ones masks must equal the unmasked kernel exactly."""
    xr, a, ls, lb, w1, b1, w2, b2, _, _ = _res_args(B=2)
    ones = jnp.ones((2,), jnp.float32)
    o1 = pf.fused_ffn_residual_masked(1.0, xr, a, ls, lb, w1, b1, w2, b2,
                                      ones, ones)
    o2 = pf.fused_ffn_residual(xr, a, ls, lb, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-6, atol=1e-6)


def test_model_droppath_train_fused_matches_unfused():
    """Full tiny model in TRAIN mode with active drop-path: the pallas
    path (masked fused residual tail, interpret) must match the XLA path
    under the same dropout rng — mask draws are order-compatible."""
    import sys
    sys.path.insert(0, "tests") if "tests" not in sys.path else None
    from test_pallas_attention import _make_cfg
    from svit_tpu.models import build_model

    cfg = _make_cfg()
    cfg.MVIT.DROPPATH_RATE = 0.5
    m_x, _ = build_model(cfg, use_pallas=False)
    m_p, _ = build_model(cfg, use_pallas=True)
    x = jnp.asarray(
        np.random.RandomState(1).randn(4, 4, 32, 32, 3).astype(np.float32)
    )
    params = m_x.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    rngs = {"dropout": jax.random.PRNGKey(42)}
    lx, _ = m_x.apply(params, x, deterministic=False, rngs=rngs)
    lp, _ = m_p.apply(params, x, deterministic=False, rngs=rngs)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lp), atol=5e-4)


def test_pick_q_tile_proj_budget():
    """The resident [C, C] projection must shrink the q tile when tight."""
    base = pa._pick_q_tile(1024, 25088, 1664, live_f32_rows=2, c=96, heads=1)
    with_proj = pa._pick_q_tile(1024, 25088, 1664, live_f32_rows=2, c=96,
                                heads=1, io_rows=3, proj=True)
    assert with_proj <= base
    # the modeled VMEM use stays under budget for the production shapes
    # (down to the 128-row floor)
    for (nq, nk, c, h) in [(25088, 1664, 96, 1), (6272, 1664, 192, 2),
                           (1568, 1664, 384, 4), (392, 512, 768, 8)]:
        t = pa._pick_q_tile(1024, nq, nk, live_f32_rows=2, c=c, heads=h,
                            io_rows=3, proj=True)
        fixed = 2 * nk * 2 * c * 2 + 2 * c * c * 2
        per_row = 4 * 2 * nk + 3 * 2 * c * 2 + 2 * h * 128 * 2 + 8 * c
        assert t <= 128 or fixed + t * per_row <= pa._VMEM_BUDGET * 1.01


@pytest.mark.parametrize("has_cls", [True, False])
def test_extras_residual_pooling_cls_correction(has_cls):
    """Advisor r4 low finding: the fused extras launch adds the q residual
    to EVERY row and subtracts proj(q_cls) post-hoc for the cls row
    (models/attention.py); pin the fused extras output against the
    non-Pallas branch with residual_pooling=True at the module level."""
    import numpy as np

    from svit_tpu.models.attention import MultiScaleAttention

    kw = dict(
        dim=32, dim_out=32, num_heads=2, input_size=(2, 4, 4),
        kernel_q=(), kernel_kv=(3, 3, 3), stride_q=(), stride_kv=(1, 2, 2),
        mode="conv", has_cls=has_cls, rel_pos_spatial=True,
        rel_pos_temporal=True, residual_pooling=True, dtype=jnp.float32,
    )
    m_x = MultiScaleAttention(use_pallas=False, **kw)
    m_p = MultiScaleAttention(use_pallas=True, **kw)
    B, E = 2, (1 + 6 if has_cls else 6)
    rs = np.random.RandomState(0)
    grid = jnp.asarray(rs.randn(B, 2, 4, 4, 32), jnp.float32) * 0.5
    extras = jnp.asarray(rs.randn(B, E, 32), jnp.float32) * 0.5
    thw = (2, 4, 4)
    params = m_x.init(
        {"params": jax.random.PRNGKey(0)}, (grid, extras), thw
    )
    (gx, ex), _ = m_x.apply(params, (grid, extras), thw)
    (gp, ep), _ = m_p.apply(params, (grid, extras), thw)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(ex), atol=2e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=2e-5,
                               rtol=1e-4)
