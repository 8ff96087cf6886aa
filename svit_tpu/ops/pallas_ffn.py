"""Fused LayerNorm + MLP kernel (Pallas/TPU).

Collapses the transformer block's ``norm2 -> fc1 -> gelu -> fc2`` chain into
one kernel: the LN statistics, the [N, hidden] intermediate and the GELU
never touch HBM, and four XLA ops per block become one.  Weights live in
VMEM for the whole grid; the token axis is tiled under a VMEM budget.

Numerics match the unfused path: LN and GELU (exact, erf-based) in f32,
matmuls in the compute dtype with f32 accumulation.

Forward kernel only — the custom VJP recomputes through an XLA-identical
reference (standard recompute; no intermediates are stored).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 13 * 1024 * 1024
_EPS = 1e-6


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_n_tile(n: int, c: int, h: int, bytes_weights: int,
                 extra_row_bytes: int = 0) -> int:
    # live f32 rows: x tile (c), normalized (c), hidden (h), plus the out tile
    per_row = 4 * (3 * c + h) + extra_row_bytes
    budget = _VMEM_BUDGET - bytes_weights
    max_tile = min(1024, max(256, budget // per_row // 8 * 8))
    # prefer a tile that divides the token count evenly (no padding rows)
    best = 0
    for t in range(8, min(n, max_tile) + 1, 8):
        if n % t == 0:
            best = t
    if best >= 256 or (best > 0 and best >= n // 8):
        return best
    return min(max_tile // 256 * 256 or 256, _round_up(n, 256))


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (|err| <= 1.5e-7).

    Mosaic has no erf/erfc lowering; this keeps the kernel's exact-GELU
    numerics ~7 orders of magnitude below the bf16 resolution of the
    surrounding matmuls.
    """
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _ffn_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + _EPS)
    xn = xn * ls_ref[0] + lb_ref[0]

    h = jnp.dot(
        xn.astype(w1_ref.dtype), w1_ref[...],
        preferred_element_type=jnp.float32,
    ) + b1_ref[0]
    # exact GELU via erf (approximated in-kernel; see _erf)
    h = 0.5 * h * (1.0 + _erf(h * np.float32(1.0 / np.sqrt(2.0))))
    y = jnp.dot(
        h.astype(w2_ref.dtype), w2_ref[...],
        preferred_element_type=jnp.float32,
    ) + b2_ref[0]
    o_ref[0] = y.astype(o_ref.dtype)


def _ffn_forward(x, ln_scale, ln_bias, w1, b1, w2, b2,
                 interpret: Optional[bool] = None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, N, C = x.shape
    H = w1.shape[1]

    n_tile = _pick_n_tile(N, C, H, (w1.size + w2.size) * w1.dtype.itemsize)
    N_pad = _round_up(N, n_tile)
    if N_pad != N:
        x = jnp.pad(x, ((0, 0), (0, N_pad - N), (0, 0)))

    ls = ln_scale.reshape(1, C)
    lb = ln_bias.reshape(1, C)
    b1r = b1.reshape(1, H)
    b2r = b2.reshape(1, w2.shape[1])

    out = pl.pallas_call(
        _ffn_kernel,
        out_shape=jax.ShapeDtypeStruct((B, N_pad, w2.shape[1]), x.dtype),
        grid=(B, N_pad // n_tile),
        in_specs=[
            pl.BlockSpec((1, n_tile, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((C, H), lambda b, i: (0, 0)),
            pl.BlockSpec((1, H), lambda b, i: (0, 0)),
            pl.BlockSpec((H, w2.shape[1]), lambda b, i: (0, 0)),
            pl.BlockSpec((1, w2.shape[1]), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, n_tile, w2.shape[1]), lambda b, i: (b, i, 0)
        ),
        interpret=interpret,
    )(x, ls, lb, w1, b1r, w2, b2r)
    return out[:, :N]


def _ffn_reference(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """XLA formulation with identical numerics (VJP recompute + fallback).

    Matmuls via mm.dense2d (rank-2): a rank-3 dot becomes a 1x1 conv whose
    batch-minor layout forces relayout copies around the Pallas calls.
    """
    from svit_tpu.ops import mm

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + _EPS) * ln_scale + ln_bias
    h = mm.dense2d(
        xn.astype(w1.dtype), w1, preferred_element_type=jnp.float32
    ) + b1
    h = jax.nn.gelu(h, approximate=False)
    y = mm.dense2d(
        h.astype(w2.dtype), w2, preferred_element_type=jnp.float32
    ) + b2
    return y.astype(x.dtype)


ffn_reference = _ffn_reference


# ---------------------------------------------------------------------------
# Fused LayerNorm + single Dense (the norm1 -> qkv projection)
# ---------------------------------------------------------------------------

def _ln_dense_kernel(x_ref, ls_ref, lb_ref, w_ref, b_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + _EPS)
    xn = xn * ls_ref[0] + lb_ref[0]
    y = jnp.dot(
        xn.astype(w_ref.dtype), w_ref[...], preferred_element_type=jnp.float32
    ) + b_ref[0]
    o_ref[0] = y.astype(o_ref.dtype)


def _ln_dense_forward(x, ln_scale, ln_bias, w, b,
                      interpret: Optional[bool] = None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, N, C = x.shape
    O = w.shape[1]
    n_tile = _pick_n_tile(N, C, O, w.size * w.dtype.itemsize)
    N_pad = _round_up(N, n_tile)
    if N_pad != N:
        x = jnp.pad(x, ((0, 0), (0, N_pad - N), (0, 0)))
    out = pl.pallas_call(
        _ln_dense_kernel,
        out_shape=jax.ShapeDtypeStruct((B, N_pad, O), x.dtype),
        grid=(B, N_pad // n_tile),
        in_specs=[
            pl.BlockSpec((1, n_tile, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((C, O), lambda b, i: (0, 0)),
            pl.BlockSpec((1, O), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_tile, O), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(x, ln_scale.reshape(1, C), ln_bias.reshape(1, C), w, b.reshape(1, O))
    return out[:, :N]


def _ln_dense_reference(x, ln_scale, ln_bias, w, b):
    from svit_tpu.ops import mm

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + _EPS) * ln_scale + ln_bias
    y = mm.dense2d(
        xn.astype(w.dtype), w, preferred_element_type=jnp.float32
    ) + b
    return y.astype(x.dtype)


def _ln_qkv_kernel(x_ref, ls_ref, lb_ref, wq_ref, bq_ref, wkv_ref, bkv_ref,
                   q_ref, kv_ref):
    x = x_ref[0].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + _EPS)
    xn = (xn * ls_ref[0] + lb_ref[0]).astype(wq_ref.dtype)
    q_ref[0] = (jnp.dot(
        xn, wq_ref[...], preferred_element_type=jnp.float32
    ) + bq_ref[0]).astype(q_ref.dtype)
    kv_ref[0] = (jnp.dot(
        xn, wkv_ref[...], preferred_element_type=jnp.float32
    ) + bkv_ref[0]).astype(kv_ref.dtype)


def _ln_qkv_forward(x, ln_scale, ln_bias, wq, bq, wkv, bkv,
                    interpret: Optional[bool] = None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, N, C = x.shape
    O = wq.shape[1]
    n_tile = _pick_n_tile(
        N, C, 3 * O, (wq.size + wkv.size) * wq.dtype.itemsize
    )
    N_pad = _round_up(N, n_tile)
    if N_pad != N:
        x = jnp.pad(x, ((0, 0), (0, N_pad - N), (0, 0)))
    q, kv = pl.pallas_call(
        _ln_qkv_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, N_pad, O), x.dtype),
            jax.ShapeDtypeStruct((B, N_pad, 2 * O), x.dtype),
        ],
        grid=(B, N_pad // n_tile),
        in_specs=[
            pl.BlockSpec((1, n_tile, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((C, O), lambda b, i: (0, 0)),
            pl.BlockSpec((1, O), lambda b, i: (0, 0)),
            pl.BlockSpec((C, 2 * O), lambda b, i: (0, 0)),
            pl.BlockSpec((1, 2 * O), lambda b, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n_tile, O), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n_tile, 2 * O), lambda b, i: (b, i, 0)),
        ],
        interpret=interpret,
    )(x, ln_scale.reshape(1, C), ln_bias.reshape(1, C),
      wq, bq.reshape(1, O), wkv, bkv.reshape(1, 2 * O))
    return q[:, :N], kv[:, :N]


def _ln_qkv_reference(x, ln_scale, ln_bias, wq, bq, wkv, bkv):
    # ONE shared LN feeding both projections (not two _ln_dense_reference
    # calls): this is also the VJP recompute, where a duplicated LN would
    # materialize xn twice and run the LN backward twice in training
    from svit_tpu.ops import mm

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + _EPS) * ln_scale + ln_bias
    xq = xn.astype(wq.dtype)
    q = (
        mm.dense2d(xq, wq, preferred_element_type=jnp.float32) + bq
    ).astype(x.dtype)
    kv = (
        mm.dense2d(xq, wkv, preferred_element_type=jnp.float32) + bkv
    ).astype(x.dtype)
    return q, kv


ln_qkv_reference = _ln_qkv_reference


@jax.custom_vjp
def fused_ln_qkv(x, ln_scale, ln_bias, wq, bq, wkv, bkv):
    """norm1 + the q and k|v projections in ONE kernel: the raw stream is
    read once (instead of twice) and the LN statistics are computed once.
    The k|v projection keeps its lane-fused [C, 2C] weight slice, so k and v
    stay one tensor through the pool and into the attention kernel."""
    return _ln_qkv_forward(x, ln_scale, ln_bias, wq, bq, wkv, bkv)


def _lnqkv_fwd(x, ln_scale, ln_bias, wq, bq, wkv, bkv):
    return (
        _ln_qkv_forward(x, ln_scale, ln_bias, wq, bq, wkv, bkv),
        (x, ln_scale, ln_bias, wq, bq, wkv, bkv),
    )


def _lnqkv_bwd(res, g):
    _, vjp = jax.vjp(_ln_qkv_reference, *res)
    return vjp(g)


fused_ln_qkv.defvjp(_lnqkv_fwd, _lnqkv_bwd)


@jax.custom_vjp
def fused_ln_dense(x, ln_scale, ln_bias, w, b):
    return _ln_dense_forward(x, ln_scale, ln_bias, w, b)


def _lnd_fwd(x, ln_scale, ln_bias, w, b):
    return _ln_dense_forward(x, ln_scale, ln_bias, w, b), (x, ln_scale, ln_bias, w, b)


def _lnd_bwd(res, g):
    _, vjp = jax.vjp(_ln_dense_reference, *res)
    return vjp(g)


fused_ln_dense.defvjp(_lnd_fwd, _lnd_bwd)


def _ffn_res_kernel(xr_ref, a_ref, ls_ref, lb_ref, w1_ref, b1_ref,
                    w2_ref, b2_ref, *refs, keep: float = 1.0):
    # the block's residual stream, computed entirely in VMEM:
    #   x = x_res + a;  out = x + mlp(ln(x))
    # adds run in the IO dtype — bit-identical to the unfused XLA adds.
    # With a mask ref present (refs = (m_ref, o_ref); m_ref is a [2, B] f32
    # array in SMEM — per-sample scalars can't be a VMEM block, Mosaic
    # requires (8,128)-tileable lanes) the two per-sample drop-path scalings
    # run in VMEM too, in the exact op order of the unfused path
    # (``branch / keep * mask`` in the IO dtype), so training numerics match
    # _drop_path_pair bit-for-bit: the 0/1 mask scalar is exact in any dtype.
    if len(refs) == 2:
        m_ref, o_ref = refs
        b = pl.program_id(0)
        ma = m_ref[0, b].astype(xr_ref.dtype)
        my = m_ref[1, b].astype(xr_ref.dtype)
        # python-float keep stays weakly typed: ops run in the IO dtype
        xs = xr_ref[0] + a_ref[0] / keep * ma
    else:
        (o_ref,) = refs
        my = None
        xs = xr_ref[0] + a_ref[0]
    x = xs.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + _EPS)
    xn = xn * ls_ref[0] + lb_ref[0]
    h = jnp.dot(
        xn.astype(w1_ref.dtype), w1_ref[...],
        preferred_element_type=jnp.float32,
    ) + b1_ref[0]
    h = 0.5 * h * (1.0 + _erf(h * np.float32(1.0 / np.sqrt(2.0))))
    y = jnp.dot(
        h.astype(w2_ref.dtype), w2_ref[...],
        preferred_element_type=jnp.float32,
    ) + b2_ref[0]
    if my is not None:
        o_ref[0] = xs + y.astype(o_ref.dtype) / keep * my
    else:
        o_ref[0] = xs + y.astype(o_ref.dtype)


def _ffn_res_forward(x_res, a, ln_scale, ln_bias, w1, b1, w2, b2,
                     ma=None, my=None, keep: float = 1.0,
                     interpret: Optional[bool] = None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, N, C = x_res.shape
    H = w1.shape[1]
    n_tile = _pick_n_tile(
        N, C, H, (w1.size + w2.size) * w1.dtype.itemsize,
        extra_row_bytes=2 * C * x_res.dtype.itemsize + 4 * C,
    )
    N_pad = _round_up(N, n_tile)
    if N_pad != N:
        x_res = jnp.pad(x_res, ((0, 0), (0, N_pad - N), (0, 0)))
        a = jnp.pad(a, ((0, 0), (0, N_pad - N), (0, 0)))
    in_specs = [
        pl.BlockSpec((1, n_tile, C), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, n_tile, C), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, C), lambda b, i: (0, 0)),
        pl.BlockSpec((1, C), lambda b, i: (0, 0)),
        pl.BlockSpec((C, H), lambda b, i: (0, 0)),
        pl.BlockSpec((1, H), lambda b, i: (0, 0)),
        pl.BlockSpec((H, w2.shape[1]), lambda b, i: (0, 0)),
        pl.BlockSpec((1, w2.shape[1]), lambda b, i: (0, 0)),
    ]
    operands = [
        x_res, a, ln_scale.reshape(1, C), ln_bias.reshape(1, C),
        w1, b1.reshape(1, H), w2, b2.reshape(1, w2.shape[1]),
    ]
    if ma is not None:
        # per-sample drop-path masks (0/1) ride in SMEM as one [2, B] f32
        # array — scalar memory is the lowerable home for per-batch-row
        # scalars (a VMEM block would need (8,128)-aligned lanes)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(
            jnp.stack([ma, my]).reshape(2, B).astype(jnp.float32)
        )
    out = pl.pallas_call(
        functools.partial(_ffn_res_kernel, keep=keep),
        out_shape=jax.ShapeDtypeStruct((B, N_pad, w2.shape[1]), x_res.dtype),
        grid=(B, N_pad // n_tile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, n_tile, w2.shape[1]), lambda b, i: (b, i, 0)
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :N]


def _ffn_res_reference(x_res, a, ln_scale, ln_bias, w1, b1, w2, b2):
    x = x_res + a
    return x + _ffn_reference(x, ln_scale, ln_bias, w1, b1, w2, b2)


ffn_residual_reference = _ffn_res_reference


@jax.custom_vjp
def fused_ffn_residual(x_res, a, ln_scale, ln_bias, w1, b1, w2, b2):
    """The transformer block's whole residual tail in one kernel:
    ``x = x_res + a; out = x + mlp(ln2(x))``.

    Unfused, the two residual adds and the MLP move the stream through HBM
    five extra times per block (write+read of ``x``, write+read of the MLP
    output, plus the adds' second operands); fused, the stream goes straight
    from the attention kernel's output into this kernel.  Only usable when
    no dropout/drop-path separates the adds from the MLP (eval, or training
    recipes with both rates 0 — the caller gates this).
    """
    return _ffn_res_forward(x_res, a, ln_scale, ln_bias, w1, b1, w2, b2)


def _res_fwd(x_res, a, ln_scale, ln_bias, w1, b1, w2, b2):
    return (
        _ffn_res_forward(x_res, a, ln_scale, ln_bias, w1, b1, w2, b2),
        (x_res, a, ln_scale, ln_bias, w1, b1, w2, b2),
    )


def _res_bwd(res, g):
    _, vjp = jax.vjp(_ffn_res_reference, *res)
    return vjp(g)


fused_ffn_residual.defvjp(_res_fwd, _res_bwd)


def _ffn_res_reference_masked(keep, x_res, a, ln_scale, ln_bias,
                              w1, b1, w2, b2, ma, my):
    """XLA twin of the masked kernel — the exact op order of the unfused
    training path (``branch / keep * mask`` in the IO dtype, see
    models/attention.py _drop_path_pair)."""
    B = x_res.shape[0]
    ma3 = ma.reshape(B, 1, 1).astype(x_res.dtype)
    my3 = my.reshape(B, 1, 1).astype(x_res.dtype)
    x = x_res + a / keep * ma3
    y = _ffn_reference(x, ln_scale, ln_bias, w1, b1, w2, b2)
    return x + y / keep * my3


ffn_residual_masked_reference = _ffn_res_reference_masked


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_ffn_residual_masked(keep, x_res, a, ln_scale, ln_bias,
                              w1, b1, w2, b2, ma, my):
    """``fused_ffn_residual`` with the block's two per-sample drop-path
    scalings fused in: ``x = x_res + a/keep*ma; out = x + mlp(ln2(x))/keep*my``
    (``ma``/``my`` are 0/1 keep masks of shape [B]).  This lets the TRAINING
    step keep the single-kernel residual tail — the reference recipe runs
    stochastic depth up to 0.4 (configs/ssv2.yaml MVIT.DROPPATH_RATE), which
    previously forced the unfused path on every drop-path block."""
    return _ffn_res_forward(x_res, a, ln_scale, ln_bias, w1, b1, w2, b2,
                            ma=ma, my=my, keep=keep)


def _resm_fwd(keep, x_res, a, ln_scale, ln_bias, w1, b1, w2, b2, ma, my):
    return (
        _ffn_res_forward(x_res, a, ln_scale, ln_bias, w1, b1, w2, b2,
                         ma=ma, my=my, keep=keep),
        (x_res, a, ln_scale, ln_bias, w1, b1, w2, b2, ma, my),
    )


def _resm_bwd(keep, res, g):
    _, vjp = jax.vjp(
        lambda *args: _ffn_res_reference_masked(keep, *args), *res
    )
    return vjp(g)


fused_ffn_residual_masked.defvjp(_resm_fwd, _resm_bwd)


@jax.custom_vjp
def fused_ffn(x, ln_scale, ln_bias, w1, b1, w2, b2):
    return _ffn_forward(x, ln_scale, ln_bias, w1, b1, w2, b2)


def _fwd(x, ln_scale, ln_bias, w1, b1, w2, b2):
    return (
        _ffn_forward(x, ln_scale, ln_bias, w1, b1, w2, b2),
        (x, ln_scale, ln_bias, w1, b1, w2, b2),
    )


def _bwd(res, g):
    _, vjp = jax.vjp(_ffn_reference, *res)
    return vjp(g)


fused_ffn.defvjp(_fwd, _bwd)
