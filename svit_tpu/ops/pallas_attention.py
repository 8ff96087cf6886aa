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

NEG_INF = -1e30


def _fault_injected() -> bool:
    """Deliberate-fault knob for the on-hardware numerics gate
    (``tools/check_kernels_hw.py --selftest``): with SVIT_PALLAS_FAULT=1 the
    kernel output is perturbed at trace time so the gate MUST trip — proving
    it detects a miscompiled/misbehaving kernel rather than vacuously passing."""
    return os.environ.get("SVIT_PALLAS_FAULT", "0") == "1"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under the 16MB scoped limit


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


def _pick_q_tile(q_tile: int, n_q: int, n_k_pad: int, live_f32_rows: int) -> int:
    """Pick the q-tile: prefer an even divisor of Nq; fit the VMEM budget.

    ``live_f32_rows`` = number of concurrently-live [tile, Nk_pad] f32
    buffers (2 for forward logits+probs, 4 for backward logits/p/dp/ds).
    """
    budget_tile = _VMEM_BUDGET // (4 * live_f32_rows * n_k_pad)
    max_tile = min(q_tile, max(256, budget_tile // 8 * 8))
    best = _best_divisor_tile(n_q, max_tile)
    if best >= 256 or (best > 0 and best >= n_q // 8):
        return best
    return min(max_tile // 256 * 256 or 256, _round_up(n_q, 256))


@functools.lru_cache(maxsize=None)
def _scatter_matrix(
    k_shape: Tuple[int, int, int], n_k: int, n_k_pad: int, sp: int
) -> np.ndarray:
    """[R, Nk_pad] one-hot map; R = kT + kH + kW + 1 (mask channel)."""
    k_t, k_h, k_w = k_shape
    R = k_t + k_h + k_w + 1
    M = np.zeros((R, n_k_pad), np.float32)
    k_l = k_t * k_h * k_w
    grid = np.arange(k_l)
    cols = sp + grid
    M[grid // (k_h * k_w), cols] = 1.0
    M[k_t + (grid // k_w) % k_h, cols] = 1.0
    M[k_t + k_h + grid % k_w, cols] = 1.0
    # mask channel: -inf on padding columns (bias_src channel fixed at 1)
    M[R - 1, n_k:] = NEG_INF
    return M


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, m_ref, o_ref, *, scale=None):
    """One q-tile: q [1, Tq, d], k/v [1, Nk, d], bias [1, Tq, R], m [R, Nk].

    ``scale`` (the 1/sqrt(hd) query scale) is applied to the q tile in VMEM in
    the input dtype — numerically identical to scaling q in XLA beforehand,
    but without materializing a scaled copy of q in HBM."""
    q = q_ref[0]
    if scale is not None:
        q = q * jnp.asarray(scale, q.dtype)
    k = k_ref[0]
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits += jnp.dot(
        bias_ref[0], m_ref[...], preferred_element_type=jnp.float32
    )
    mx = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - mx)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )
    o_ref[0] = (out / s).astype(o_ref.dtype)


def pooled_attention(
    q: jax.Array,          # [BH, Nq, d] (unscaled; see ``scale``)
    k: jax.Array,          # [BH, Nk, d]
    v: jax.Array,          # [BH, Nk, d]
    bias_src: jax.Array,   # [BH, Nq, R] (last channel == 1.0)
    scatter: jax.Array,    # [R, Nk_pad] (same dtype as bias_src)
    *,
    scale: Optional[float] = None,
    q_tile: int = 1024,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    BH, Nq, d = q.shape
    Nk = k.shape[1]
    Nk_pad = scatter.shape[1]
    R = bias_src.shape[2]
    # adapt the tile: large tiles amortize grid overhead (1024 measured 4x
    # faster than 512 at the stem shapes) but live [tile, Nk_pad] f32
    # buffers must stay inside scoped VMEM
    q_tile = _pick_q_tile(q_tile, Nq, Nk_pad, live_f32_rows=2)

    Nq_pad = _round_up(Nq, q_tile)
    if Nq_pad != Nq:
        q = jnp.pad(q, ((0, 0), (0, Nq_pad - Nq), (0, 0)))
        bias_src = jnp.pad(bias_src, ((0, 0), (0, Nq_pad - Nq), (0, 0)))
    if Nk_pad != Nk:
        k = jnp.pad(k, ((0, 0), (0, Nk_pad - Nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Nk_pad - Nk), (0, 0)))

    grid = (BH, Nq_pad // q_tile)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((BH, Nq_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Nk_pad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Nk_pad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, q_tile, R), lambda b, i: (b, i, 0)),
            pl.BlockSpec((R, Nk_pad), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_tile, d), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(q, k, v, bias_src, scatter)
    if _fault_injected():
        # emulate a lane-offset miscompile (shifted channel reads) — an
        # additive constant would be erased by the downstream LayerNorms
        out = jnp.roll(out, 1, axis=-1)
    return out[:, :Nq]


def _attn_bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, m_ref, do_ref,
    dq_ref, dk_ref, dv_ref, dbias_ref, *, scale=None,
):
    """Backward for one q-tile; dk/dv accumulate across the (sequential)
    q-tile grid axis via a constant output index map.

    S = qK^T + bias@M; P = softmax(S); O = PV
    dV += P^T dO
    dS = P * (dO V^T - rowsum(dO * O))
    dq = dS K ; dK += dS^T q ; dbias = dS M^T
    """
    i = pl.program_id(1)

    q = q_ref[0]
    if scale is not None:
        # the scaled q is what enters the logits; dq picks up the same factor
        q = q * jnp.asarray(scale, q.dtype)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits += jnp.dot(bias_ref[0], m_ref[...], preferred_element_type=jnp.float32)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - mx)
    s = jnp.sum(p, axis=-1, keepdims=True)
    p = p / s  # [Tq, Nk] f32

    # dP = dO V^T ; delta = rowsum(dO * O) = rowsum(dP * P)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta)  # [Tq, Nk] f32

    dq = jnp.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32)
    if scale is not None:
        dq = dq * jnp.float32(scale)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dbias_ref[0] = jax.lax.dot_general(
        ds, m_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dbias_ref.dtype)

    dk_tile = jax.lax.dot_general(
        ds.astype(q.dtype), q,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_tile = jax.lax.dot_general(
        p.astype(do_ref.dtype), do_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_tile.astype(dk_ref.dtype)
    dv_ref[0] += dv_tile.astype(dv_ref.dtype)


def pooled_attention_bwd(
    q, k, v, bias_src, scatter, do, *, scale: Optional[float] = None,
    q_tile: int = 1024, interpret: Optional[bool] = None,
):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    BH, Nq, d = q.shape
    Nk = k.shape[1]
    Nk_pad = scatter.shape[1]
    R = bias_src.shape[2]
    q_tile = _pick_q_tile(q_tile, Nq, Nk_pad, live_f32_rows=4)

    Nq_pad = _round_up(Nq, q_tile)
    if Nq_pad != Nq:
        q = jnp.pad(q, ((0, 0), (0, Nq_pad - Nq), (0, 0)))
        bias_src = jnp.pad(bias_src, ((0, 0), (0, Nq_pad - Nq), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, Nq_pad - Nq), (0, 0)))
    if Nk_pad != Nk:
        k = jnp.pad(k, ((0, 0), (0, Nk_pad - Nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Nk_pad - Nk), (0, 0)))

    grid = (BH, Nq_pad // q_tile)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((BH, Nq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((BH, Nk_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((BH, Nk_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((BH, Nq_pad, R), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Nk_pad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Nk_pad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, q_tile, R), lambda b, i: (b, i, 0)),
            pl.BlockSpec((R, Nk_pad), lambda b, i: (0, 0)),
            pl.BlockSpec((1, q_tile, d), lambda b, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, q_tile, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Nk_pad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Nk_pad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, q_tile, R), lambda b, i: (b, i, 0)),
        ),
        interpret=interpret,
    )(q, k, v, bias_src, scatter, do)
    return (
        dq[:, :Nq],
        dk[:, :Nk].astype(k.dtype),
        dv[:, :Nk].astype(v.dtype),
        dbias[:, :Nq].astype(bias_src.dtype),
    )


def _reference_attention(q, k, v, bias_src, scatter, scale=None):
    """XLA formulation with identical semantics (used for VJP recompute and
    as the non-TPU fallback)."""
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_attention(q, k, v, bias_src, scatter, scale=None):
    return pooled_attention(q, k, v, bias_src, scatter, scale=scale)


def _fwd(q, k, v, bias_src, scatter, scale):
    return (
        pooled_attention(q, k, v, bias_src, scatter, scale=scale),
        (q, k, v, bias_src, scatter),
    )


# Backward implementation switch (VERDICT item: keep the Pallas bwd kernel
# only if it beats XLA recompute by >=10% at the production train shapes;
# profiling tools flip this to ablate).
BWD_PALLAS = True


def _bwd(scale, res, g):
    q, k, v, bias_src, scatter = res
    if BWD_PALLAS:
        dq, dk, dv, dbias = pooled_attention_bwd(
            q, k, v, bias_src, scatter, g, scale=scale
        )
        return dq, dk, dv, dbias, None
    _, vjp = jax.vjp(
        lambda qq, kk, vv, bb: _reference_attention(
            qq, kk, vv, bb, scatter[:, : k.shape[1]], scale
        ),
        q, k, v, bias_src,
    )
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias, None


fused_attention.defvjp(_fwd, _bwd)


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
):
    """Assemble (bias_src [B*h, q_l, R], scatter [R, Nk_pad]) for the
    grid-native key layout ``[patch tokens | extras]`` (patches at offset 0).

    Never slices/pads the query axis: the rel-pos einsums consume the patch
    grid directly and every grid query row carries a bias; extras key columns
    (>= k_l) receive zero bias and padding columns (>= n_k) get -inf through
    the scatter mask channel.

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
        terms.append(jnp.einsum(
            "btpwhc,pkc->bhtpwk", rq, Rh, preferred_element_type=jnp.float32,
        ).astype(dt))
        terms.append(jnp.einsum(
            "btpwhc,wkc->bhtpwk", rq, Rw, preferred_element_type=jnp.float32,
        ).astype(dt))
    else:
        terms.append(jnp.zeros((B, num_heads, Tq, Hq, Wq, k_h), dt))
        terms.append(jnp.zeros((B, num_heads, Tq, Hq, Wq, k_w), dt))

    flat = [t.reshape(B * num_heads, q_l, t.shape[-1]) for t in terms]
    ones = jnp.ones((B * num_heads, q_l, 1), dt)
    bias_src = jnp.concatenate(flat + [ones], axis=-1)
    scatter = jnp.asarray(_scatter_matrix(tuple(k_shape), n_k, n_k_pad, 0), dt)
    return bias_src, scatter
