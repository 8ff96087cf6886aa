"""Fused pooled-attention kernel (Pallas/TPU).

The SViT attention after KV pooling has a short key axis (Nk <= ~1.6k for
the SSv2 recipe) and a long query axis (up to 25k tokens at the stem).  The
XLA path materializes the f32 ``[B, h, Nq, Nk]`` logits in HBM several times
(QK write, bias add, softmax passes) — the dominant cost of the whole model.

This kernel keeps everything in VMEM per q-tile:

    logits = (q_tile @ K^T) + bias_tile @ M      (MXU, f32 accum)
    out    = softmax(logits) @ V                 (one pass, no HBM attn)

where the decomposed rel-pos bias enters through a tiny matmul trick: the
per-query bias components over (kT | kH | kW | mask) are stacked into
``bias_src [BH, Nq, R]`` and scattered across the key axis by a constant
one-hot matrix ``M [R, Nk_pad]`` built on the host (padding columns get
-inf through the mask channel, so padded keys never receive weight).

``fused_attention`` wires a custom VJP: the backward kernel recomputes the
tile's softmax (flash-style — no [Nq, Nk] residuals are ever stored), writes
dq/dbias per tile, and accumulates dK/dV in VMEM across the sequential
q-tile grid axis.  ``_reference_attention`` is the semantically-identical
XLA fallback used by tests and non-TPU backends.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as _pltpu
except ImportError:  # pragma: no cover
    _pltpu = None

# Mosaic's default scoped-vmem limit is 16 MB; the attention blocks are
# tile-budgeted to fit it, but marginal shapes (e.g. the 65-row extras
# launch against block-14's [1664, 1536] resident kv) can land a few MB
# over.  v5e has 128 MB of VMEM — raise the cap rather than shrink tiles.
_COMPILER_PARAMS = None
if _pltpu is not None and hasattr(_pltpu, "CompilerParams"):
    _COMPILER_PARAMS = _pltpu.CompilerParams(
        vmem_limit_bytes=64 * 1024 * 1024
    )


def _cp_kwargs(interpret: bool):
    if interpret or _COMPILER_PARAMS is None:
        return {}
    return {"compiler_params": _COMPILER_PARAMS}

NEG_INF = -1e30


def _fault_injected() -> bool:
    """Deliberate-fault knob for the on-hardware numerics gate
    (``tools/check_kernels_hw.py --selftest``): with SVIT_PALLAS_FAULT=1 the
    kernel output is perturbed at trace time so the gate MUST trip — proving
    it detects a miscompiled/misbehaving kernel rather than vacuously passing."""
    return os.environ.get("SVIT_PALLAS_FAULT", "0") == "1"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Stay well under the 16MB scoped limit: the budget model below tracks the
# big buffers (logits rows, fused kv block, io rows, bias) but Mosaic also
# materializes per-head lane-slice temporaries and softmax intermediates the
# model can't see (measured ~1.35x the modeled bytes at multi-head shapes).
_VMEM_BUDGET = 10 * 1024 * 1024


@functools.lru_cache(maxsize=None)
def _best_divisor_tile(n: int, max_tile: int) -> int:
    """Largest multiple-of-8 divisor of ``n`` that is <= max_tile (0 if none).

    Tiles that divide the token count evenly avoid padding the query axis
    entirely — the SViT grids (25088, 6272, 1568, 392 tokens) all admit large
    8-aligned divisors (896/784/392), whereas naive 256-multiple round-up
    wastes up to 25% of the kernel's work on padding rows.
    """
    best = 0
    for t in range(8, min(n, max_tile) + 1, 8):
        if n % t == 0:
            best = t
    return best


def _pick_q_tile(q_tile: int, n_q: int, n_k_pad: int, live_f32_rows: int,
                 c: int = 0, heads: int = 1, io_rows: int = 2,
                 kv_f32_acc: bool = False, proj: bool = False) -> int:
    """Pick the q-tile: prefer an even divisor of Nq; fit the VMEM budget.

    ``live_f32_rows`` = number of concurrently-live [tile, Nk_pad] f32
    buffers (2 for forward logits+probs, 4 for backward logits/p/dp/ds).
    ``c`` = channel width of the q blocks (heads * head_dim; the fused kv
    block is 2c wide); ``io_rows`` = number of [tile, c] operand/result
    blocks (q+out fwd; q+do+dq bwd); ``heads`` sizes the double-buffered
    [heads, tile, R->128-lane] bias block; ``kv_f32_acc`` adds the
    backward's persistent [Nk_pad, 2c] f32 dkv accumulator.
    """
    fixed = 2 * n_k_pad * 2 * c * 2                # fused kv block, x2 buffers
    if kv_f32_acc:
        # the dkv accumulator is also double-buffered (its block index
        # varies along the batch grid axis)
        fixed += 2 * n_k_pad * 2 * c * 4
    if proj:
        fixed += 2 * c * c * 2                     # resident [C, C] out-proj
    per_row = (
        4 * live_f32_rows * n_k_pad
        + io_rows * 2 * c * 2
        + 2 * heads * 128 * 2                      # bias block (R lane-padded)
        + (8 * c if proj else 0)                   # f32 att + proj-out temps
    )
    budget_tile = max(_VMEM_BUDGET - fixed, 1 << 20) // per_row
    # the 256-row floor trades modeled-budget overshoot for fewer grid
    # steps; with a resident projection the fixed cost is higher, so
    # respect the budget down to 128 rows instead
    max_tile = min(q_tile, max(128 if proj else 256, budget_tile // 8 * 8))
    best = _best_divisor_tile(n_q, max_tile)
    if best >= 256 or (best > 0 and best >= n_q // 8):
        return best
    if proj and best > 0 and max_tile < 256:
        return best                  # honor the budget over step count
    return min(max_tile // 256 * 256 or 256, _round_up(n_q, 256))


@functools.lru_cache(maxsize=None)
def _scatter_matrix(
    k_shape: Tuple[int, int, int], n_k: int, n_k_pad: int, sp: int,
    k_w_phys: Optional[int] = None,
) -> np.ndarray:
    """[R, Nk_pad] one-hot map; R = kT + kH + kW + 1 (mask channel).

    ``k_w_phys`` (W8-carry): the key grid arrives with its W axis padded to
    a multiple of 8 — flat key index g maps to (t, h, w) with w in
    [0, k_w_phys), and columns whose w >= true k_w are junk: they get NO
    rel-pos one-hots and -inf through the mask channel, so padded keys
    never receive attention weight.
    """
    k_t, k_h, k_w = k_shape
    kwp = k_w_phys or k_w
    R = k_t + k_h + k_w + 1
    M = np.zeros((R, n_k_pad), np.float32)
    k_l = k_t * k_h * kwp
    grid = np.arange(k_l)
    w = grid % kwp
    real = w < k_w
    cols = sp + grid[real]
    M[(grid // (k_h * kwp))[real], cols] = 1.0
    M[k_t + ((grid // kwp) % k_h)[real], cols] = 1.0
    M[k_t + k_h + w[real], cols] = 1.0
    # mask channel: -inf on junk patch columns and on padding columns
    # (bias_src channel fixed at 1)
    M[R - 1, sp + grid[~real]] = NEG_INF
    M[R - 1, n_k:] = NEG_INF
    return M


def _attn_kernel(q_ref, kv_ref, bias_ref, m_ref, *refs,
                 heads: int = 1, scale=None, q_residual: bool = False):
    """One q-tile, ALL heads: q [1, Tq, C], kv [1, Nk, 2C] (keys in lanes
    [0, C), values in [C, 2C)), bias [1, heads, Tq, R], m [R, Nk];
    C = heads * head_dim.

    Heads are looped IN-KERNEL over lane slices of the channel axis instead
    of a head-major [B*h, N, hd] batch layout: the head-major layout cost a
    full HBM transpose of q and of the output per block (~10 ms/fwd) and,
    with head_dim=96, padded every kernel operand's lane dim 96->128 (33%
    wasted HBM bandwidth).  K and V arrive as ONE fused tensor — they are
    produced by one matmul and pooled by one channel-local pool pass, so no
    k|v split is ever materialized in HBM.

    ``scale`` (the 1/sqrt(hd) query scale) is applied to the q tile in VMEM
    in the input dtype — numerically identical to scaling q in XLA
    beforehand, but without materializing a scaled copy of q in HBM.

    With a ``wp_ref`` present (``refs`` = (wp_ref, o_ref) instead of
    (o_ref,)), the attention-output projection runs in the epilogue on the
    VMEM tile — and with ``q_residual`` the reference's residual-pooling add
    (attention.py:455-459, ``out += q``) happens first, straight from the
    already-resident unscaled q tile.  Neither the attention output nor the
    ``out+q`` sum ever exists in HBM (they were a full write + two reads of
    the stream per block).  Rounding matches the unfused path bit-for-bit:
    head outputs round to the IO dtype, the residual add runs in the IO
    dtype, and the projection accumulates f32 like an XLA bf16 matmul."""
    if len(refs) == 3:
        wp_ref, bp_ref, o_ref = refs
    elif len(refs) == 2:
        wp_ref, o_ref = refs
        bp_ref = None
    else:
        wp_ref = bp_ref = None
        (o_ref,) = refs
    Tq, C = q_ref.shape[1], q_ref.shape[2]
    Nk = kv_ref.shape[1]
    hd = C // heads
    outs = []
    for hh in range(heads):
        q = jax.lax.slice(q_ref[0], (0, hh * hd), (Tq, (hh + 1) * hd))
        if scale is not None:
            q = q * jnp.asarray(scale, q.dtype)
        k = jax.lax.slice(kv_ref[0], (0, hh * hd), (Nk, (hh + 1) * hd))
        logits = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits += jnp.dot(
            bias_ref[0, hh], m_ref[...], preferred_element_type=jnp.float32
        )
        mx = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mx)
        s = jnp.sum(p, axis=-1, keepdims=True)
        v = jax.lax.slice(
            kv_ref[0], (0, C + hh * hd), (Nk, C + (hh + 1) * hd)
        )
        out = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        outs.append((out / s).astype(o_ref.dtype))
    att = outs[0] if heads == 1 else jnp.concatenate(outs, axis=-1)
    if wp_ref is None:
        o_ref[0] = att
        return
    if q_residual:
        att = att + q_ref[0]
    o = jnp.dot(
        att, wp_ref[...], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)
    if bp_ref is not None:
        # the projection bias in the epilogue too (an XLA `og + bp` was a
        # full read+write of the stream per block); IO-dtype add, rounding
        # identical to the unfused path.  keepdim (1, C) read — 1-D row
        # extraction from VMEM is a Mosaic compile trap.
        o = o + bp_ref[...]
    o_ref[0] = o


def pooled_attention(
    q: jax.Array,          # [B, Nq, C] (unscaled; see ``scale``)
    kv: jax.Array,         # [B, Nk, 2C] (keys | values on the lane axis)
    bias_src: jax.Array,   # [B, heads, Nq, R] (last channel == 1.0)
    scatter: jax.Array,    # [R, Nk_pad] (same dtype as bias_src)
    *,
    heads: int = 1,
    scale: Optional[float] = None,
    q_tile: int = 1024,
    wp: Optional[jax.Array] = None,   # [C, C] out-proj folded into epilogue
    bp: Optional[jax.Array] = None,   # [C] out-proj bias (requires wp)
    q_residual: bool = False,         # add unscaled q before the projection
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert wp is not None or bp is None, "bp (out-proj bias) requires wp"
    B, Nq, C = q.shape
    Nk = kv.shape[1]
    Nk_pad = scatter.shape[1]
    R = bias_src.shape[3]
    # adapt the tile: large tiles amortize grid overhead (1024 measured 4x
    # faster than 512 at the stem shapes) but live [tile, Nk_pad] f32
    # buffers must stay inside scoped VMEM
    q_tile = _pick_q_tile(
        q_tile, Nq, Nk_pad, live_f32_rows=2, c=C, heads=heads,
        io_rows=2 if wp is None else 3, proj=wp is not None,
    )

    Nq_pad = _round_up(Nq, q_tile)
    if Nq_pad != Nq:
        q = jnp.pad(q, ((0, 0), (0, Nq_pad - Nq), (0, 0)))
        bias_src = jnp.pad(
            bias_src, ((0, 0), (0, 0), (0, Nq_pad - Nq), (0, 0))
        )
    if Nk_pad != Nk:
        kv = jnp.pad(kv, ((0, 0), (0, Nk_pad - Nk), (0, 0)))

    grid = (B, Nq_pad // q_tile)
    in_specs = [
        pl.BlockSpec((1, q_tile, C), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Nk_pad, 2 * C), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, heads, q_tile, R), lambda b, i: (b, 0, i, 0)),
        pl.BlockSpec((R, Nk_pad), lambda b, i: (0, 0)),
    ]
    operands = [q, kv, bias_src, scatter]
    if wp is not None:
        in_specs.append(pl.BlockSpec((C, C), lambda b, i: (0, 0)))
        operands.append(wp.astype(q.dtype))
        if bp is not None:
            in_specs.append(pl.BlockSpec((1, C), lambda b, i: (0, 0)))
            operands.append(bp.reshape(1, C).astype(q.dtype))
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, heads=heads, scale=scale, q_residual=q_residual
        ),
        out_shape=jax.ShapeDtypeStruct((B, Nq_pad, C), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, q_tile, C), lambda b, i: (b, i, 0)),
        interpret=interpret,
        **_cp_kwargs(interpret),
    )(*operands)
    if _fault_injected():
        # emulate a lane-offset miscompile (shifted channel reads) — an
        # additive constant would be erased by the downstream LayerNorms
        out = jnp.roll(out, 1, axis=-1)
    return out[:, :Nq]


def _attn_bwd_kernel(
    q_ref, kv_ref, bias_ref, m_ref, do_ref,
    dq_ref, dkv_ref, dbias_ref, *, heads: int = 1, scale=None,
):
    """Backward for one q-tile, all heads in-kernel (lane slices — see
    ``_attn_kernel``); dkv accumulates across the (sequential) q-tile grid
    axis via a constant output index map.

    S = qK^T + bias@M; P = softmax(S); O = PV
    dV += P^T dO
    dS = P * (dO V^T - rowsum(dO * O))
    dq = dS K ; dK += dS^T q ; dbias = dS M^T
    """
    i = pl.program_id(1)
    Tq, C = q_ref.shape[1], q_ref.shape[2]
    Nk = kv_ref.shape[1]
    hd = C // heads

    dqs, dks, dvs = [], [], []
    for hh in range(heads):
        q = jax.lax.slice(q_ref[0], (0, hh * hd), (Tq, (hh + 1) * hd))
        if scale is not None:
            # the scaled q enters the logits; dq picks up the same factor
            q = q * jnp.asarray(scale, q.dtype)
        k = jax.lax.slice(kv_ref[0], (0, hh * hd), (Nk, (hh + 1) * hd))
        v = jax.lax.slice(
            kv_ref[0], (0, C + hh * hd), (Nk, C + (hh + 1) * hd)
        )
        do = jax.lax.slice(
            do_ref[0], (0, hh * hd), (Tq, (hh + 1) * hd)
        )
        do32 = do.astype(jnp.float32)

        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits += jnp.dot(
            bias_ref[0, hh], m_ref[...], preferred_element_type=jnp.float32
        )
        mx = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mx)
        s = jnp.sum(p, axis=-1, keepdims=True)
        p = p / s  # [Tq, Nk] f32

        # dP = dO V^T ; delta = rowsum(dO * O) = rowsum(dP * P)
        dp = jax.lax.dot_general(
            do32, v.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta)  # [Tq, Nk] f32

        dq = jnp.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32)
        if scale is not None:
            dq = dq * jnp.float32(scale)
        dqs.append(dq.astype(dq_ref.dtype))
        dbias_ref[0, hh] = jax.lax.dot_general(
            ds, m_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dbias_ref.dtype)

        dks.append(jax.lax.dot_general(
            ds.astype(q.dtype), q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dkv_ref.dtype))
        dvs.append(jax.lax.dot_general(
            p.astype(do.dtype), do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dkv_ref.dtype))

    dq_ref[0] = dqs[0] if heads == 1 else jnp.concatenate(dqs, axis=-1)
    dkv_tile = jnp.concatenate(dks + dvs, axis=-1)  # [Nk, 2C], k | v lanes

    @pl.when(i == 0)
    def _():
        dkv_ref[0] = jnp.zeros_like(dkv_ref[0])

    dkv_ref[0] += dkv_tile


def pooled_attention_bwd(
    q, kv, bias_src, scatter, do, *, heads: int = 1,
    scale: Optional[float] = None,
    q_tile: int = 1024, interpret: Optional[bool] = None,
):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Nq, C = q.shape
    Nk = kv.shape[1]
    Nk_pad = scatter.shape[1]
    R = bias_src.shape[3]

    # The [Nk_pad, 2C] kv block and its f32 dkv accumulator are resident for
    # the whole pass AND double-buffered (their block index varies along the
    # batch grid axis): 2*(2C*Nk*2B) + 2*(2C*Nk*4B) = 12 bytes per kv
    # element.  At C>=384 with Nk~1.7k that alone overflows scoped VMEM.
    # Split the head axis recursively at the XLA level — the operands there
    # are pooled/tiny, so the lane slices cost microseconds, and each half
    # runs the normal kernel.
    resident = Nk_pad * 2 * C * 12
    if resident > BWD_SPLIT_BYTES and heads % 2 == 0:
        h2, c2 = heads // 2, C // 2

        def grp(t, lo):
            return jax.lax.slice_in_dim(t, lo, lo + c2, axis=2)

        halves = []
        for g in range(2):
            qg = grp(q, g * c2)
            dog = grp(do, g * c2)
            kvg = jnp.concatenate(
                [grp(kv, g * c2), grp(kv, C + g * c2)], axis=-1
            )
            bg = bias_src[:, g * h2:(g + 1) * h2]
            halves.append(pooled_attention_bwd(
                qg, kvg, bg, scatter, dog, heads=h2, scale=scale,
                q_tile=q_tile, interpret=interpret,
            ))
        (dq1, dkv1, db1), (dq2, dkv2, db2) = halves
        dq = jnp.concatenate([dq1, dq2], axis=-1)
        dkv = jnp.concatenate(
            [dkv1[..., :c2], dkv2[..., :c2],
             dkv1[..., c2:], dkv2[..., c2:]], axis=-1,
        )
        dbias = jnp.concatenate([db1, db2], axis=1)
        return dq, dkv, dbias
    q_tile = _pick_q_tile(
        q_tile, Nq, Nk_pad, live_f32_rows=4, c=C, heads=heads, io_rows=3,
        kv_f32_acc=True,
    )

    Nq_pad = _round_up(Nq, q_tile)
    if Nq_pad != Nq:
        q = jnp.pad(q, ((0, 0), (0, Nq_pad - Nq), (0, 0)))
        bias_src = jnp.pad(
            bias_src, ((0, 0), (0, 0), (0, Nq_pad - Nq), (0, 0))
        )
        do = jnp.pad(do, ((0, 0), (0, Nq_pad - Nq), (0, 0)))
    if Nk_pad != Nk:
        kv = jnp.pad(kv, ((0, 0), (0, Nk_pad - Nk), (0, 0)))

    grid = (B, Nq_pad // q_tile)
    dq, dkv, dbias = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, heads=heads, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((B, Nq_pad, C), q.dtype),
            jax.ShapeDtypeStruct((B, Nk_pad, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((B, heads, Nq_pad, R), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Nk_pad, 2 * C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, heads, q_tile, R), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((R, Nk_pad), lambda b, i: (0, 0)),
            pl.BlockSpec((1, q_tile, C), lambda b, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, q_tile, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Nk_pad, 2 * C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, heads, q_tile, R), lambda b, i: (b, 0, i, 0)),
        ),
        interpret=interpret,
        **_cp_kwargs(interpret),
    )(q, kv, bias_src, scatter, do)
    return (
        dq[:, :Nq],
        dkv[:, :Nk].astype(kv.dtype),
        dbias[:, :, :Nq].astype(bias_src.dtype),
    )


def _reference_attention(q, kv, bias_src, scatter, scale=None, heads=1):
    """XLA formulation with identical semantics (used for VJP recompute and
    as the non-TPU fallback).  q [B, N, heads*hd]; kv [B, Nk, 2*heads*hd]
    (keys | values on the lane axis); bias [B, heads, Nq, R]."""
    C = q.shape[-1]
    k = jax.lax.slice_in_dim(kv, 0, C, axis=2)
    v = jax.lax.slice_in_dim(kv, C, 2 * C, axis=2)
    if heads > 1:
        B, Nq, C = q.shape
        Nk = k.shape[1]
        hd = C // heads
        qh, kh, vh = (
            t.reshape(t.shape[0], t.shape[1], heads, hd).transpose(0, 2, 1, 3)
            for t in (q, k, v)
        )
        if scale is not None:
            qh = qh * jnp.asarray(scale, qh.dtype)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        )
        logits = logits + jnp.einsum(
            "bhqr,rk->bhqk", bias_src.astype(jnp.float32),
            scatter[:, :Nk].astype(jnp.float32),
        )
        p = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(vh.dtype), vh,
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)
        return out.transpose(0, 2, 1, 3).reshape(B, Nq, C)
    bias_src = bias_src[:, 0] if bias_src.ndim == 4 else bias_src
    if scale is not None:
        q = q * jnp.asarray(scale, q.dtype)
    logits = jnp.einsum(
        "bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits + jnp.einsum(
        "bqr,rk->bqk", bias_src, scatter[:, : k.shape[1]],
        preferred_element_type=jnp.float32,
    )
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bqk,bkd->bqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


reference_attention = _reference_attention


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(q, kv, bias_src, scatter, scale=None, heads=1):
    return pooled_attention(
        q, kv, bias_src, scatter, scale=scale, heads=heads
    )


def _fwd(q, kv, bias_src, scatter, scale, heads):
    return (
        pooled_attention(
            q, kv, bias_src, scatter, scale=scale, heads=heads
        ),
        (q, kv, bias_src, scatter),
    )


# Backward implementation switch (VERDICT item: keep the Pallas bwd kernel
# only if it beats XLA recompute by >=10% at the production train shapes;
# profiling tools flip this to ablate).
BWD_PALLAS = True

# Resident-buffer threshold above which the backward splits the head axis
# (module-level so tests can force the split path at small shapes).
BWD_SPLIT_BYTES = 12 * 1024 * 1024


def _bwd(scale, heads, res, g):
    q, kv, bias_src, scatter = res
    if BWD_PALLAS:
        dq, dkv, dbias = pooled_attention_bwd(
            q, kv, bias_src, scatter, g, scale=scale, heads=heads
        )
        return dq, dkv, dbias, None
    _, vjp = jax.vjp(
        lambda qq, kk, bb: _reference_attention(
            qq, kk, bb, scatter[:, : kv.shape[1]], scale, heads
        ),
        q, kv, bias_src,
    )
    dq, dkv, dbias = vjp(g)
    return dq, dkv, dbias, None


fused_attention.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_attention_proj(q, kv, bias_src, scatter, wp, bp,
                         scale=None, heads=1, q_residual=False):
    """Attention with the out-projection (and optionally the reference's
    residual-pooling ``out += q``, attention.py:455-459) folded into the
    kernel epilogue.

    The un-differentiated primal (eval/serving/bench forwards) never
    materializes the attention output or the ``out+q`` sum in HBM — at the
    stem that is three full passes over the [B, Nq, C] stream per block.
    Under AD the fwd/bwd pair below runs the unfolded kernel + an XLA
    projection instead: the projection VJP needs its input as a residual
    anyway, so folding would only move that HBM write into the backward.
    Both paths round identically (head outputs -> IO dtype, IO-dtype add,
    f32-accumulated projection)."""
    return pooled_attention(
        q, kv, bias_src, scatter, scale=scale, heads=heads,
        wp=wp, bp=bp, q_residual=q_residual,
    )


def _proj_base(q, kv, bias_src, scatter, scale, heads, q_residual):
    att = pooled_attention(
        q, kv, bias_src, scatter, scale=scale, heads=heads
    )
    return att + q if q_residual else att


def _fwd_proj(q, kv, bias_src, scatter, wp, bp, scale, heads, q_residual):
    base = _proj_base(q, kv, bias_src, scatter, scale, heads, q_residual)
    out = jax.lax.dot_general(
        base, wp.astype(base.dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(base.dtype) + bp.astype(base.dtype)
    return out, (q, kv, bias_src, scatter, wp, bp, base)


def _bwd_proj(scale, heads, q_residual, res, g):
    q, kv, bias_src, scatter, wp, bp, base = res
    dbp = jnp.sum(
        g.astype(jnp.float32), axis=(0, 1)
    ).astype(bp.dtype)
    dwp = jnp.einsum(
        "bnc,bnd->cd", base, g, preferred_element_type=jnp.float32
    ).astype(wp.dtype)
    dbase = jax.lax.dot_general(
        g, wp.astype(g.dtype),
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(g.dtype)
    if BWD_PALLAS:
        dq, dkv, dbias = pooled_attention_bwd(
            q, kv, bias_src, scatter, dbase, scale=scale, heads=heads
        )
    else:
        _, vjp = jax.vjp(
            lambda qq, kk, bb: _reference_attention(
                qq, kk, bb, scatter[:, : kv.shape[1]], scale, heads
            ),
            q, kv, bias_src,
        )
        dq, dkv, dbias = vjp(dbase)
    if q_residual:
        dq = dq + dbase.astype(dq.dtype)
    return dq, dkv, dbias, None, dwp, dbp


fused_attention_proj.defvjp(_fwd_proj, _bwd_proj)


# ---------------------------------------------------------------------------
# Bias-source construction (shared by kernel and fallback)
# ---------------------------------------------------------------------------

def build_bias_inputs_grid(
    q_grid: jax.Array,            # [B, Tq, Hq, Wq, h*hd] (unscaled, pooled+normed)
    num_heads: int,
    q_shape: Tuple[int, int, int],
    k_shape: Tuple[int, int, int],
    n_k: int,                     # total key count: k_l patches + extras
    *,
    rel_pos_h: Optional[jax.Array],
    rel_pos_w: Optional[jax.Array],
    rel_pos_t: Optional[jax.Array],
    k_w_phys: Optional[int] = None,
):
    """Assemble (bias_src [B, h, q_l, R], scatter [R, Nk_pad]) for the
    grid-native key layout ``[patch tokens | extras]`` (patches at offset 0).

    Never slices/pads the query axis: the rel-pos einsums consume the patch
    grid directly and every grid query row carries a bias; extras key columns
    (>= k_l) receive zero bias and padding columns (>= n_k) get -inf through
    the scatter mask channel.

    W8-carry: ``q_shape``/``k_shape`` are the TRUE token grids (they drive
    the rel-pos tables and ratio scaling); ``q_grid`` may arrive with its W
    axis 8-padded (junk query rows get zero rel-pos bias — their outputs are
    junk by contract) and ``k_w_phys`` declares the padded key-grid width so
    junk key columns get -inf through the scatter's mask channel.

    Everything runs in ``q_grid``'s dtype (bf16 in production): the bias terms
    are O(1) additive logit offsets, so bf16 rounding (~0.4% rel) is far below
    the bf16 q@k logit noise, while the f32 path doubled the HBM traffic of
    the largest per-block intermediates (measured ~6 ms/fwd in concat+einsum
    time at batch 16).  f32 models (the golden tests) keep an f32 bias path.
    """
    from svit_tpu.ops import rel_pos as rp

    B, Tq, Hq, Wq, C = q_grid.shape
    hd = C // num_heads
    k_t, k_h, k_w = k_shape
    q_l = Tq * Hq * Wq
    n_k_pad = _round_up(n_k, 128)
    dt = q_grid.dtype

    # [B, t, p, w, h, c]: head axis split off the channel axis (free reshape).
    rq = q_grid.reshape(B, Tq, Hq, Wq, num_heads, hd)
    terms = []
    if rel_pos_t is not None:
        Rt = rp.rel_table(rel_pos_t, q_shape[0], k_t).astype(dt)
        terms.append(jnp.einsum(
            "btpwhc,tuc->bhtpwu", rq, Rt, preferred_element_type=jnp.float32,
        ).astype(dt))
    else:
        terms.append(jnp.zeros((B, num_heads, Tq, Hq, Wq, k_t), dt))
    if rel_pos_h is not None:
        Rh = rp.rel_table(rel_pos_h, q_shape[1], k_h).astype(dt)
        Rw = rp.rel_table(rel_pos_w, q_shape[2], k_w).astype(dt)
        if Wq > q_shape[2]:
            # carried q grid: junk query rows take the (arbitrary) zero
            # rel-pos row — their outputs are junk by contract
            Rw = jnp.pad(Rw, ((0, Wq - q_shape[2]), (0, 0), (0, 0)))
        terms.append(jnp.einsum(
            "btpwhc,pkc->bhtpwk", rq, Rh, preferred_element_type=jnp.float32,
        ).astype(dt))
        terms.append(jnp.einsum(
            "btpwhc,wkc->bhtpwk", rq, Rw, preferred_element_type=jnp.float32,
        ).astype(dt))
    else:
        terms.append(jnp.zeros((B, num_heads, Tq, Hq, Wq, k_h), dt))
        terms.append(jnp.zeros((B, num_heads, Tq, Hq, Wq, k_w), dt))

    flat = [t.reshape(B, num_heads, q_l, t.shape[-1]) for t in terms]
    ones = jnp.ones((B, num_heads, q_l, 1), dt)
    bias_src = jnp.concatenate(flat + [ones], axis=-1)
    scatter = jnp.asarray(
        _scatter_matrix(tuple(k_shape), n_k, n_k_pad, 0, k_w_phys), dt
    )
    return bias_src, scatter
