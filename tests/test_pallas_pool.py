"""Fused pool+LN kernel: forward/gradient parity (CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svit_tpu.ops import pallas_pool as pp

KERNEL = (3, 3, 3)
HD = 8  # small head_dim keeps interpret-mode shapes tiny


def _np_ref(x, kw, ls, lb, stride, hd):
    B, T, H, W, C = x.shape
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    acc = np.zeros((B, T, H, W, C), np.float32)
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                acc += (
                    xp[:, dt : dt + T, dh : dh + H, dw : dw + W].astype(np.float32)
                    * kw[dt, dh, dw, 0]
                )
    acc = acc[:, :: stride[0], :: stride[1], :: stride[2]]
    aa = acc.reshape(*acc.shape[:-1], C // hd, hd)
    mean = aa.mean(-1, keepdims=True)
    var = ((aa - mean) ** 2).mean(-1, keepdims=True)
    return (((aa - mean) / np.sqrt(var + 1e-6)) * ls + lb).reshape(acc.shape)


def _inputs(B, T, H, W, C, seed=0):
    rs = np.random.RandomState(seed)
    x = rs.randn(B, T, H, W, C).astype(np.float32)
    kw = (rs.randn(3, 3, 3, 1, C) * 0.1).astype(np.float32)
    ls = (rs.randn(HD) * 0.1 + 1).astype(np.float32)
    lb = (rs.randn(HD) * 0.1).astype(np.float32)
    return x, kw, ls, lb


@pytest.mark.parametrize(
    "shape,stride",
    [
        ((2, 4, 8, 8, 16), (1, 1, 1)),
        ((2, 4, 8, 8, 16), (1, 2, 2)),
        ((1, 4, 16, 16, 8), (1, 4, 4)),
        ((1, 1, 8, 8, 8), (1, 2, 2)),     # image branch T=1
        ((1, 4, 10, 10, 8), (1, 1, 1)),   # W not a multiple of 8
    ],
)
def test_forward_matches_numpy(shape, stride):
    x, kw, ls, lb = _inputs(*shape)
    out = pp.fused_pool_ln(
        jnp.asarray(x), jnp.asarray(kw), jnp.asarray(ls), jnp.asarray(lb),
        KERNEL, stride, HD,
    )
    ref = _np_ref(x, kw, ls, lb, stride, HD)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("stride", [(1, 1, 1), (1, 2, 2)])
def test_gradients_match_reference_ad(stride):
    x, kw, ls, lb = _inputs(1, 2, 8, 8, 16)
    args = tuple(jnp.asarray(a) for a in (x, kw, ls, lb))
    tshape = jax.eval_shape(
        lambda: pp.pool_ln_reference(*args, KERNEL, stride, HD)
    ).shape
    tgt = jnp.asarray(np.random.RandomState(1).randn(*tshape), jnp.float32)

    def loss(fn):
        return lambda *a: (fn(*a, KERNEL, stride, HD) * tgt).sum()

    gf = jax.grad(loss(pp.fused_pool_ln), argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(loss(pp.pool_ln_reference), argnums=(0, 1, 2, 3))(*args)
    for name, a, b in zip(("dx", "dk", "dls", "dlb"), gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
            err_msg=f"gradient {name} diverges",
        )


def test_strided_equals_stride1_subsample():
    x, kw, ls, lb = _inputs(1, 4, 8, 8, 16)
    args = tuple(jnp.asarray(a) for a in (x, kw, ls, lb))
    full = pp.fused_pool_ln(*args, KERNEL, (1, 1, 1), HD)
    sub = pp.fused_pool_ln(*args, KERNEL, (1, 2, 2), HD)
    np.testing.assert_allclose(
        np.asarray(full)[:, :, ::2, ::2], np.asarray(sub), atol=1e-5
    )


def test_gradients_bf16_inputs_tolerance():
    """ADVICE r2: the VJP recompute applies LN to the bf16-rounded conv
    output while the fused forward normalizes the f32 accumulator, so with
    bf16 inputs the gradients are for a slightly different function.  This
    pins the accepted tolerance (O(bf16 eps) relative); the on-hardware gate
    (tools/check_kernels_hw.py) additionally verifies the same bound holds
    for the compiled kernels on the real chip."""
    x, kw, ls, lb = _inputs(1, 2, 8, 8, 16)
    args16 = (
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(kw),
        jnp.asarray(ls), jnp.asarray(lb),
    )
    args32 = tuple(jnp.asarray(a) for a in (x, kw, ls, lb))
    stride = (1, 2, 2)
    tshape = jax.eval_shape(
        lambda: pp.pool_ln_reference(*args32, KERNEL, stride, HD)
    ).shape
    tgt = jnp.asarray(np.random.RandomState(1).randn(*tshape), jnp.float32)

    def loss(fn, a):
        return lambda *g: (fn(*g, KERNEL, stride, HD).astype(jnp.float32) * tgt).sum()

    gf = jax.grad(loss(pp.fused_pool_ln, args16), argnums=(1, 2, 3))(*args16)
    gr = jax.grad(loss(pp.pool_ln_reference, args32), argnums=(1, 2, 3))(*args32)
    for name, a, b in zip(("dk", "dls", "dlb"), gf, gr):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
        assert rel < 2e-2, f"bf16-input gradient {name} rel err {rel}"


def test_bare_conv_fallback_without_element(monkeypatch):
    """ADVICE r2: with pl.Element unavailable both the fused forward AND the
    bare-conv recompute path must work (the recompute used to hit an
    assert)."""
    monkeypatch.setattr(pp, "_Element", None)
    x, kw, ls, lb = _inputs(1, 2, 8, 8, 16)
    args = tuple(jnp.asarray(a) for a in (x, kw, ls, lb))
    stride = (1, 2, 2)
    out = pp.fused_pool_ln(*args, KERNEL, stride, HD)
    ref = _np_ref(x, kw, ls, lb, stride, HD)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)
    # gradient path (recomputes through the bare conv)
    g = jax.grad(
        lambda *a: (pp.fused_pool_ln(*a, KERNEL, stride, HD) ** 2).sum(),
        argnums=(0, 1),
    )(*args)
    assert all(bool(jnp.isfinite(t).all()) for t in g)


def test_fused_pool_max_matches_reduce_window():
    """The Pallas residual-skip max pool (fused_pool_max) must be exactly
    lax.reduce_window's MaxPool3d (reference attention.py pool_skip):
    values AND tie-routed gradients (the VJP recomputes through the XLA
    reference)."""
    from svit_tpu.ops import pooling

    rs = np.random.RandomState(0)
    for C in (96, 256):  # non-lane-aligned (XLA parity path) and aligned
        x = jnp.asarray(rs.randn(2, 4, 12, 12, C), jnp.float32)
        k, s = (1, 3, 3), (1, 2, 2)
        a = pp.fused_pool_max(x, k, s)
        b = pooling.max_pool3d(x, k, s)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        ga = jax.grad(lambda x: (pp.fused_pool_max(x, k, s) ** 2).sum())(x)
        gb = jax.grad(lambda x: (pooling.max_pool3d(x, k, s) ** 2).sum())(x)
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


def test_fused_pool_max_unsupported_shapes_fall_back():
    """Temporal stride / uneven spatial strides route to reduce_window."""
    from svit_tpu.ops import pooling

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 4, 8, 8, 16), jnp.float32)
    for k, s in (((3, 3, 3), (2, 2, 2)), ((1, 3, 3), (1, 2, 1))):
        a = pp.fused_pool_max(x, k, s)
        b = pooling.max_pool3d(x, k, s)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_strided_pool_lane_aligned_parity_path():
    """C % 128 == 0 takes the in-kernel VMEM parity regroup; C % 128 != 0
    keeps the XLA parity reshape.  Both must match the reference exactly
    (the regroup is a pure relayout)."""
    rs = np.random.RandomState(2)
    for C, hd in ((128, 32), (96, 24)):
        x = rs.randn(2, 4, 16, 16, C).astype(np.float32)
        kw = (rs.randn(*KERNEL, 1, C) * 0.1).astype(np.float32)
        ls = rs.randn(hd).astype(np.float32)
        lb = rs.randn(hd).astype(np.float32)
        args = tuple(jnp.asarray(a) for a in (x, kw, ls, lb))
        stride = (1, 2, 2)
        out = pp.fused_pool_ln(*args, KERNEL, stride, hd)
        ref = pp.pool_ln_reference(*args, KERNEL, stride, hd)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-5
        )
