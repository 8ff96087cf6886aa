"""Fused attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svit_tpu.ops import pallas_attention as pa


def _inputs(B=2, Nq=300, kshape=(2, 4, 4), d=32, n_obj=8, seed=0, heads=1):
    """q [B, N, heads*d]; kv lane-fused [B, Nk, 2*heads*d]; bias [B, heads, Nq, R]."""
    rng = np.random.RandomState(seed)
    sp = 1
    C = heads * d
    Nk = sp + int(np.prod(kshape)) + n_obj
    q = jnp.asarray(rng.randn(B, Nq, C).astype(np.float32) * 0.2)
    kv = jnp.asarray(rng.randn(B, Nk, 2 * C).astype(np.float32) * 0.2)
    R = sum(kshape) + 1
    bias = rng.randn(B, heads, Nq, R).astype(np.float32) * 0.2
    bias[..., -1] = 1.0
    scatter = jnp.asarray(
        pa._scatter_matrix(kshape, Nk, pa._round_up(Nk, 128), sp)
    )
    return q, kv, jnp.asarray(bias), scatter


def test_kernel_matches_reference():
    q, kv, bias, scatter = _inputs()
    ref = pa._reference_attention(q, kv, bias, scatter)
    out = pa.pooled_attention(q, kv, bias, scatter, q_tile=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_kernel_unaligned_nq():
    q, kv, bias, scatter = _inputs(Nq=131)
    ref = pa._reference_attention(q, kv, bias, scatter)
    out = pa.pooled_attention(q, kv, bias, scatter, q_tile=128)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_custom_vjp_gradient():
    q, kv, bias, scatter = _inputs(Nq=128)

    def loss_fused(q, kv, bias):
        return (pa.fused_attention(q, kv, bias, scatter) ** 2).sum()

    def loss_ref(q, kv, bias):
        return (pa._reference_attention(q, kv, bias, scatter) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, kv, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kv, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_custom_vjp_gradient_unaligned():
    q, kv, bias, scatter = _inputs(Nq=200)

    def loss_fused(q, kv, bias):
        return (pa.fused_attention(q, kv, bias, scatter) ** 2).sum()

    def loss_ref(q, kv, bias):
        return (pa._reference_attention(q, kv, bias, scatter) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, kv, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kv, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_kernel_scale_in_kernel():
    """In-kernel q scaling == pre-scaled q, for fwd and the custom VJP."""
    q, kv, bias, scatter = _inputs(Nq=200)
    scale = 0.125
    ref = pa._reference_attention(q * scale, kv, bias, scatter)
    out = pa.pooled_attention(q, kv, bias, scatter, scale=scale, q_tile=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def loss_fused(q, kv, bias):
        return (pa.fused_attention(q, kv, bias, scatter, scale) ** 2).sum()

    def loss_ref(q, kv, bias):
        return (
            pa._reference_attention(q * scale, kv, bias, scatter) ** 2
        ).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, kv, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kv, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_bias_builder_uses_compute_dtype():
    """build_bias_inputs_grid emits bias/scatter in the query dtype (bf16 in
    production halves the HBM traffic of the largest per-block buffers)."""
    B, heads, hd = 1, 2, 16
    q_shape, k_shape = (2, 4, 4), (2, 4, 4)
    n_k = 1 + 32 + 4
    for dt in (jnp.float32, jnp.bfloat16):
        qg = jnp.zeros((B, 2, 4, 4, heads * hd), dt)
        rp_h = jnp.zeros((7, hd), jnp.float32)
        rp_t = jnp.zeros((3, hd), jnp.float32)
        bias, scatter = pa.build_bias_inputs_grid(
            qg, heads, q_shape, k_shape, n_k,
            rel_pos_h=rp_h, rel_pos_w=rp_h, rel_pos_t=rp_t,
        )
        assert bias.dtype == dt and scatter.dtype == dt


def test_scatter_matrix_structure():
    kshape = (2, 3, 3)
    sp = 1
    Nk = sp + 18 + 4
    M = pa._scatter_matrix(kshape, Nk, pa._round_up(Nk, 128), sp)
    # each patch column gets exactly one 1 from each of the t/h/w groups
    k_l = 18
    cols = M[:-1, sp : sp + k_l]
    assert (cols.sum(axis=0) == 3).all()
    # cls and object columns get no bias
    assert (M[:-1, :sp] == 0).all()
    assert (M[:-1, sp + k_l : Nk] == 0).all()
    # padding columns are masked to -inf via the mask channel
    assert (M[-1, Nk:] == pa.NEG_INF).all()
    assert (M[-1, :Nk] == 0).all()


def test_model_pallas_path_matches_xla():
    """Full tiny model: use_pallas (interpret) vs XLA path."""
    from svit_tpu.models import build_model

    cfg = _make_cfg()
    m_x, arch = build_model(cfg, use_pallas=False)
    m_p, _ = build_model(cfg, use_pallas=True)
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 4, 32, 32, 3).astype(np.float32)
    )
    params = m_x.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    lx, ex = m_x.apply(params, x, deterministic=True)
    lp, ep = m_p.apply(params, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lp), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(ex["pred_bboxes"]), np.asarray(ep["pred_bboxes"]), atol=5e-4
    )


def _make_cfg():
    from svit_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SViT"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = cfg.DATA.TEST_CROP_SIZE = 32
    cfg.MVIT.DEPTH = 2
    cfg.MVIT.EMBED_DIM = 32
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1], [1, 1, 2, 2]]
    cfg.MVIT.DIM_MUL = [[1, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0]]
    cfg.MVIT.REL_POS_SPATIAL = True
    cfg.MVIT.REL_POS_TEMPORAL = True
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.DROPPATH_RATE = 0.0
    cfg.TRAIN.MIXED_PRECISION = False
    return cfg


def test_pick_q_tile_vmem_budget():
    """Tiles shrink for fat key axes so live f32 buffers fit scoped VMEM."""
    from svit_tpu.ops.pallas_attention import _VMEM_BUDGET, _pick_q_tile

    # stem: short keys -> full tile
    assert _pick_q_tile(1024, 25153, 512, live_f32_rows=2) == 1024
    # KV-heavy block backward: tile must shrink
    t = _pick_q_tile(1024, 6337, 1664, live_f32_rows=4)
    assert t < 1024
    assert 4 * 4 * t * 1664 <= _VMEM_BUDGET
    # tiny query axis rounds down to its own size
    assert _pick_q_tile(1024, 300, 512, live_f32_rows=2) == 512


def test_fused_ffn_matches_reference():
    from svit_tpu.ops import pallas_ffn as pf

    rng = np.random.RandomState(0)
    B, N, C, H = 2, 300, 64, 256
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32) * 0.3)
    ls = jnp.asarray(1 + rng.randn(C).astype(np.float32) * 0.1)
    lb = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.randn(C, H).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(H, C).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.05)

    ref = pf._ffn_reference(x, ls, lb, w1, b1, w2, b2)
    out = pf.fused_ffn(x, ls, lb, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def loss_f(x, ls, w1):
        return (pf.fused_ffn(x, ls, lb, w1, b1, w2, b2) ** 2).sum()

    def loss_r(x, ls, w1):
        return (pf._ffn_reference(x, ls, lb, w1, b1, w2, b2) ** 2).sum()

    g1 = jax.grad(loss_f, argnums=(0, 1, 2))(x, ls, w1)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(x, ls, w1)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_fused_ln_dense_matches_reference():
    """fused_ln_dense is kept for future block-fusion work (wiring it at the
    norm1->qkv boundary measured perf-neutral: XLA already fuses LN into the
    matmul prologue there)."""
    from svit_tpu.ops import pallas_ffn as pf

    rng = np.random.RandomState(1)
    B, N, C, O = 2, 200, 64, 192
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32) * 0.3)
    ls = jnp.asarray(1 + rng.randn(C).astype(np.float32) * 0.1)
    lb = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(C, O).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(O).astype(np.float32) * 0.05)
    ref = pf._ln_dense_reference(x, ls, lb, w, b)
    out = pf.fused_ln_dense(x, ls, lb, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    g1 = jax.grad(lambda x: (pf.fused_ln_dense(x, ls, lb, w, b) ** 2).sum())(x)
    g2 = jax.grad(lambda x: (pf._ln_dense_reference(x, ls, lb, w, b) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-3)


def test_kernel_multihead_matches_reference():
    """In-kernel head loop (lane slices) == per-head XLA reference."""
    q, kv, bias, scatter = _inputs(Nq=256, heads=2, d=32)
    ref = pa._reference_attention(q, kv, bias, scatter, heads=2)
    out = pa.pooled_attention(q, kv, bias, scatter, heads=2, q_tile=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_custom_vjp_gradient_multihead():
    q, kv, bias, scatter = _inputs(Nq=200, heads=2, d=32)
    scale = 0.17

    def loss_fused(q, kv, bias):
        return (pa.fused_attention(q, kv, bias, scatter, scale, 2) ** 2).sum()

    def loss_ref(q, kv, bias):
        return (
            pa._reference_attention(q, kv, bias, scatter, scale, 2) ** 2
        ).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, kv, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kv, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_bwd_head_split_matches(monkeypatch):
    """The VMEM head-split backward (fat-C tail blocks) == unsplit grads."""
    q, kv, bias, scatter = _inputs(Nq=128, heads=2, d=32)
    do = jnp.ones((q.shape[0], q.shape[1], q.shape[2]), q.dtype)
    ref = pa.pooled_attention_bwd(q, kv, bias, scatter, do, heads=2)
    monkeypatch.setattr(pa, "BWD_SPLIT_BYTES", 0)
    out = pa.pooled_attention_bwd(q, kv, bias, scatter, do, heads=2)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
