"""W8-carry contracts: 8-aligned-width tensors with junk columns.

The round-5 layout lever (docs/ROADMAP.md): the patch grid rides with its W
axis right-padded to a multiple of 8 so flat<->rank-5 reshapes are bitcasts.
These tests pin the op-level contracts on CPU (kernels in interpret mode):

- pool conv/max: carried input (junk columns GARBAGE, not zero) produces the
  exact-path values on the true region, zeros on junk output columns, and
  exact-path gradients (zero gradient into junk input columns);
- attention: junk key columns (declared via ``k_w_phys``) receive zero
  weight through the scatter mask channel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svit_tpu.ops import pallas_attention as pa
from svit_tpu.ops import pallas_pool as pp


def _pad_garbage(x, W8):
    """Right-pad W to W8 with NONZERO garbage — masking must not rely on
    zero-filled junk."""
    B, T, H, W, C = x.shape
    junk = np.full((B, T, H, W8 - W, C), 7.25, x.dtype)
    return jnp.asarray(np.concatenate([np.asarray(x), junk], axis=3))


def _rand(shape, seed=0, dtype=np.float32):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), dtype)


@pytest.mark.parametrize(
    "W,C,stride",
    [
        (7, 128, (1, 1, 1)),
        (7, 128, (1, 2, 2)),
        (14, 96, (1, 2, 2)),   # C % 128 != 0: XLA parity-reshape path
        (28, 128, (1, 2, 2)),
        (13, 128, (1, 1, 1)),
    ],
)
def test_fused_pool_ln_carried_matches_exact(W, C, stride):
    head_dim = 32
    kernel = (3, 3, 3)
    B, T, H = 2, 3, W
    x = _rand((B, T, H, W, C), seed=1) * 0.5
    kw = _rand(kernel + (1, C), seed=2) * 0.2
    ls = jnp.asarray(np.random.RandomState(3).rand(head_dim), jnp.float32)
    lb = _rand((head_dim,), seed=4) * 0.1

    exact = pp.fused_pool_ln(x, kw, ls, lb, kernel, stride, head_dim)
    Wo = exact.shape[3]
    Wc = pp._carry_width(Wo)  # keep_pad emits this (== Wo when the junk
    #                           ratio exceeds the carry threshold)

    xp = _pad_garbage(x, pp._pad8(W))
    carried = pp.fused_pool_ln(
        xp, kw, ls, lb, kernel, stride, head_dim, W, True
    )
    assert carried.shape[3] == Wc
    np.testing.assert_allclose(
        np.asarray(carried[:, :, :, :Wo]), np.asarray(exact),
        atol=1e-5, rtol=1e-5,
    )
    if Wc != Wo:
        assert np.all(np.asarray(carried[:, :, :, Wo:]) == 0.0)


@pytest.mark.parametrize(
    "W,C,stride",
    [
        (7, 128, (1, 2, 2)),
        (14, 64, (1, 1, 1)),
        # Wp=32 at stride 4: the dk kernel's Wq must cover the carried
        # (wider) input — this class traced a negative pad before the fix
        (28, 128, (1, 4, 4)),
    ],
)
def test_fused_pool_ln_carried_grads(W, C, stride):
    head_dim = 32
    kernel = (3, 3, 3)
    B, T, H = 1, 2, W
    x = _rand((B, T, H, W, C), seed=1) * 0.5
    kw = _rand(kernel + (1, C), seed=2) * 0.2
    ls = jnp.asarray(np.random.RandomState(3).rand(head_dim), jnp.float32)
    lb = _rand((head_dim,), seed=4) * 0.1
    W8 = pp._pad8(W)
    xp = _pad_garbage(x, W8)

    def f_exact(x_, kw_, ls_, lb_):
        out = pp.fused_pool_ln(x_, kw_, ls_, lb_, kernel, stride, head_dim)
        return jnp.sum(jnp.sin(out))

    def f_carried(xp_, kw_, ls_, lb_):
        out = pp.fused_pool_ln(
            xp_, kw_, ls_, lb_, kernel, stride, head_dim, W, True
        )
        Wo = pp._out_size(W, kernel[2], stride[2])
        return jnp.sum(jnp.sin(out[:, :, :, :Wo]))

    ge = jax.grad(f_exact, argnums=(0, 1, 2, 3))(x, kw, ls, lb)
    gc = jax.grad(f_carried, argnums=(0, 1, 2, 3))(xp, kw, ls, lb)
    np.testing.assert_allclose(
        np.asarray(gc[0][:, :, :, :W]), np.asarray(ge[0]), atol=1e-5, rtol=1e-4
    )
    # junk input columns receive ZERO gradient
    assert np.all(np.asarray(gc[0][:, :, :, W:]) == 0.0)
    for a, b in zip(gc[1:], ge[1:]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


@pytest.mark.parametrize("W", [7, 14, 28])
def test_fused_pool_max_carried(W):
    C = 128
    kernel, stride = (1, 3, 3), (1, 2, 2)
    B, T, H = 2, 2, W
    x = _rand((B, T, H, W, C), seed=5)
    exact = pp.fused_pool_max(x, kernel, stride)
    Wo = exact.shape[3]
    Wc = pp._carry_width(Wo)
    xp = _pad_garbage(x, pp._pad8(W))
    # garbage junk is LARGE positive: max masking must still exclude it
    xp = xp.at[:, :, :, W:].set(1e9)
    carried = pp.fused_pool_max(xp, kernel, stride, w_true=W, keep_pad=True)
    assert carried.shape[3] == Wc
    np.testing.assert_allclose(
        np.asarray(carried[:, :, :, :Wo]), np.asarray(exact), atol=0, rtol=0
    )
    if Wc != Wo:
        assert np.all(np.asarray(carried[:, :, :, Wo:]) == 0.0)

    def f(x_):
        out = pp.fused_pool_max(x_, kernel, stride, w_true=W, keep_pad=True)
        return jnp.sum(jnp.sin(out[:, :, :, :Wo]))

    gx = jax.grad(f)(xp)
    ge = jax.grad(
        lambda x_: jnp.sum(jnp.sin(pp.fused_pool_max(x_, kernel, stride)))
    )(x)
    np.testing.assert_allclose(
        np.asarray(gx[:, :, :, :W]), np.asarray(ge), atol=1e-6, rtol=1e-6
    )
    assert np.all(np.asarray(gx[:, :, :, W:]) == 0.0)


def test_scatter_matrix_padded_keys():
    k_shape = (2, 3, 7)
    kwp = 8
    k_l8 = 2 * 3 * kwp
    n_k = k_l8 + 5  # + extras
    n_k_pad = pa._round_up(n_k, 128)
    M = pa._scatter_matrix(k_shape, n_k, n_k_pad, 0, kwp)
    R = 2 + 3 + 7 + 1
    assert M.shape == (R, n_k_pad)
    for g in range(k_l8):
        t, h, w = g // (3 * kwp), (g // kwp) % 3, g % kwp
        if w < 7:  # real column: one-hots at (t, h, w), mask channel 0
            assert M[t, g] == 1.0 and M[2 + h, g] == 1.0
            assert M[2 + 3 + w, g] == 1.0
            assert M[R - 1, g] == 0.0
        else:      # junk column: no one-hots, -inf mask
            assert np.all(M[: R - 1, g] == 0.0)
            assert M[R - 1, g] == pa.NEG_INF
    # extras columns: zero bias, no mask
    assert np.all(M[:, k_l8:n_k] == 0.0)
    # padding columns: -inf mask
    assert np.all(M[R - 1, n_k:] == pa.NEG_INF)


def test_attention_padded_keys_match_exact():
    """reference_attention with a W8-carried key grid (junk kv columns
    garbage) equals the exact-key computation for every real query."""
    B, heads, hd = 2, 2, 32
    C = heads * hd
    k_t, k_h, k_w = 2, 3, 7
    kwp = 8
    k_l, k_l8 = k_t * k_h * k_w, k_t * k_h * kwp
    E = 5
    Nq = 16

    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, Nq, C), jnp.float32)
    kv_grid = rs.randn(B, k_t, k_h, k_w, 2 * C).astype(np.float32)
    kv_extras = rs.randn(B, E, 2 * C).astype(np.float32)

    # exact: flatten true grid
    kv_exact = jnp.asarray(
        np.concatenate([kv_grid.reshape(B, k_l, 2 * C), kv_extras], axis=1)
    )
    # carried: pad W with garbage, flatten
    pad = np.full((B, k_t, k_h, kwp - k_w, 2 * C), 3.5, np.float32)
    kv_pad = jnp.asarray(np.concatenate(
        [np.concatenate([kv_grid, pad], axis=3).reshape(B, k_l8, 2 * C),
         kv_extras], axis=1,
    ))

    rngs = np.random.RandomState(1)
    rp_h = jnp.asarray(rngs.randn(2 * 4 - 1, hd), jnp.float32) * 0.1
    rp_w = jnp.asarray(rngs.randn(2 * 7 - 1, hd), jnp.float32) * 0.1
    rp_t = jnp.asarray(rngs.randn(2 * 2 - 1, hd), jnp.float32) * 0.1

    q_grid = q.reshape(B, 2, 2, 4, C)  # true q grid (2,2,4)
    b_exact, s_exact = pa.build_bias_inputs_grid(
        q_grid, heads, (2, 2, 4), (k_t, k_h, k_w), k_l + E,
        rel_pos_h=rp_h, rel_pos_w=rp_w, rel_pos_t=rp_t,
    )
    b_pad, s_pad = pa.build_bias_inputs_grid(
        q_grid, heads, (2, 2, 4), (k_t, k_h, k_w), k_l8 + E,
        rel_pos_h=rp_h, rel_pos_w=rp_w, rel_pos_t=rp_t, k_w_phys=kwp,
    )
    out_exact = pa.reference_attention(
        q, kv_exact, b_exact, s_exact[:, : k_l + E], scale=0.2, heads=heads
    )
    out_pad = pa.reference_attention(
        q, kv_pad, b_pad, s_pad[:, : k_l8 + E], scale=0.2, heads=heads
    )
    np.testing.assert_allclose(
        np.asarray(out_pad), np.asarray(out_exact), atol=2e-5, rtol=1e-5
    )
    # the fused kernel (interpret mode) agrees too
    out_kern = pa.fused_attention(
        q, kv_pad, b_pad, s_pad, scale=0.2, heads=heads
    )
    np.testing.assert_allclose(
        np.asarray(out_kern), np.asarray(out_exact), atol=2e-5, rtol=1e-5
    )


def test_attention_padded_keys_grads():
    """Gradients through the fused kernel with padded keys: junk kv columns
    get ZERO gradient; real grads match the exact computation."""
    B, heads, hd = 1, 2, 32
    C = heads * hd
    k_t, k_h, k_w, kwp = 1, 2, 7, 8
    k_l, k_l8 = k_t * k_h * k_w, k_t * k_h * kwp
    Nq = 8

    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, Nq, C), jnp.float32)
    kv_grid = rs.randn(B, k_t, k_h, k_w, 2 * C).astype(np.float32)
    kv_exact = jnp.asarray(kv_grid.reshape(B, k_l, 2 * C))
    pad = np.full((B, k_t, k_h, kwp - k_w, 2 * C), 3.5, np.float32)
    kv_pad = jnp.asarray(
        np.concatenate([kv_grid, pad], axis=3).reshape(B, k_l8, 2 * C)
    )

    def mk_bias(n_k, kw_phys):
        bias = jnp.zeros((B, heads, Nq, k_t + k_h + k_w + 1), jnp.float32)
        bias = bias.at[..., -1].set(1.0)
        scat = jnp.asarray(pa._scatter_matrix(
            (k_t, k_h, k_w), n_k, pa._round_up(n_k, 128), 0, kw_phys
        ))
        return bias, scat

    be, se = mk_bias(k_l, None)
    bp, sp_ = mk_bias(k_l8, kwp)

    def f(kv, bias, scat):
        out = pa.fused_attention(q, kv, bias, scat, scale=0.2, heads=heads)
        return jnp.sum(jnp.sin(out))

    ge = jax.grad(f, argnums=0)(kv_exact, be, se)
    gp = jax.grad(f, argnums=0)(kv_pad, bp, sp_)
    gp5 = np.asarray(gp).reshape(B, k_t, k_h, kwp, 2 * C)
    np.testing.assert_allclose(
        gp5[:, :, :, :k_w].reshape(B, k_l, 2 * C), np.asarray(ge),
        atol=1e-5, rtol=1e-4,
    )
    assert np.all(gp5[:, :, :, k_w:] == 0.0)


def _carry_cfg():
    from svit_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SViT"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = cfg.DATA.TEST_CROP_SIZE = 56
    cfg.MVIT.DEPTH = 3
    cfg.MVIT.EMBED_DIM = 32
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 4, 4]
    cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1], [1, 1, 2, 2], [2, 1, 2, 2]]
    cfg.MVIT.DIM_MUL = [[1, 2.0], [2, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0], [2, 2.0]]
    cfg.MVIT.REL_POS_SPATIAL = True
    cfg.MVIT.REL_POS_TEMPORAL = True
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.DROPPATH_RATE = 0.0
    cfg.TRAIN.MIXED_PRECISION = False
    return cfg


def test_model_carry_forward_and_grads_match_xla():
    """Full model A/B at widths that are 8-unaligned at EVERY stage
    (stem W=14 -> 7 -> 4): the W8-carried Pallas path (interpret) must match
    the exact-width XLA path in outputs AND parameter gradients."""
    from svit_tpu.models import build_model

    cfg = _carry_cfg()
    m_x, _ = build_model(cfg, use_pallas=False)
    m_p, _ = build_model(cfg, use_pallas=True)
    x = jnp.asarray(
        np.random.RandomState(3).randn(2, 4, 56, 56, 3).astype(np.float32) * 0.5
    )
    params = m_x.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    lx, ex = m_x.apply(params, x, deterministic=True)
    lp, ep = m_p.apply(params, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lp), atol=5e-4)
    for key in ("obj_desc", "pred_bboxes", "pred_contact_state"):
        np.testing.assert_allclose(
            np.asarray(ex[key]), np.asarray(ep[key]), atol=5e-4, err_msg=key
        )

    def loss(m):
        def f(p):
            lg, extra = m.apply(p, x, deterministic=True)
            return (
                jnp.sum(jnp.sin(extra["raw_logits"]))
                + jnp.sum(jnp.cos(extra["obj_desc"]))
            )
        return f

    gx = jax.grad(loss(m_x))(params)
    gp = jax.grad(loss(m_p))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_p = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(gp)}
    for k, vx in flat_x:
        vp = flat_p[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(vx), np.asarray(vp), atol=2e-3, rtol=2e-3,
            err_msg=jax.tree_util.keystr(k),
        )
