"""Decomposed relative positional bias for pooled attention.

Reimplements the index math of reference ``slowfast/models/attention.py:68-183``
(``get_rel_pos`` / ``cal_rel_pos_spatial`` / ``cal_rel_pos_temporal``) in a
form XLA fuses well: the relative-distance index tables are computed statically
in numpy at trace time (q/k shapes are static under jit), the bias terms are
three small einsums against q, and the add into the patch x patch sub-block of
the attention matrix is a reshape + broadcast that XLA fuses into the softmax
input without materializing an extra [Nq, Nk] tensor.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def resize_rel_pos(rel_pos: jax.Array, d: int) -> jax.Array:
    """Linearly resample a [L, C] rel-pos table to length d.

    Matches torch ``F.interpolate(mode='linear')`` exactly: half-pixel
    sampling (align_corners=False), NO antialiasing on downsampling —
    ``jax.image.resize`` antialiases, so the gather weights are built
    statically here instead (reference ``attention.py:68-81``).
    """
    ori = rel_pos.shape[0]
    if ori == d:
        return rel_pos
    scale = ori / d
    src = (np.arange(d) + 0.5) * scale - 0.5
    lo = np.clip(np.floor(src), 0, ori - 1).astype(np.int64)
    hi = np.clip(lo + 1, 0, ori - 1)
    w_hi = np.clip(src - lo, 0.0, 1.0).astype(np.float32)
    return (
        rel_pos[lo] * (1.0 - w_hi[:, None]) + rel_pos[hi] * w_hi[:, None]
    )


def _dist_idx(q_n: int, k_n: int) -> np.ndarray:
    """Static relative-distance index table with MViT ratio scaling.

    Reference ``attention.py:100-113``: when q and k grids differ, indices are
    scaled so the table spans the larger grid.
    """
    q_ratio = max(k_n / q_n, 1.0)
    k_ratio = max(q_n / k_n, 1.0)
    dist = (
        np.arange(q_n)[:, None] * q_ratio - np.arange(k_n)[None, :] * k_ratio
    )
    dist += (k_n - 1) * k_ratio
    return dist.astype(np.int64)


def rel_table(rel_pos: jax.Array, q_n: int, k_n: int) -> jax.Array:
    """Resized + distance-indexed rel-pos table: [q_n, k_n, head_dim]."""
    d = 2 * max(q_n, k_n) - 1
    return resize_rel_pos(rel_pos, d)[_dist_idx(q_n, k_n)]


def spatial_bias_terms(
    r_q: jax.Array,
    q_shape: Tuple[int, int, int],
    k_shape: Tuple[int, int, int],
    rel_pos_h: jax.Array,
    rel_pos_w: jax.Array,
):
    """Content-dependent decomposed spatial bias.

    r_q: [B, heads, qT, qH, qW, head_dim] (patch-block queries).
    Returns (rel_h [B,h,qT,qH,qW,kH], rel_w [B,h,qT,qH,qW,kW]).
    """
    _, q_h, q_w = q_shape
    _, k_h, k_w = k_shape
    dh = 2 * max(q_h, k_h) - 1
    dw = 2 * max(q_w, k_w) - 1

    Rh = resize_rel_pos(rel_pos_h, dh)[_dist_idx(q_h, k_h)]  # [qH, kH, C]
    Rw = resize_rel_pos(rel_pos_w, dw)[_dist_idx(q_w, k_w)]  # [qW, kW, C]

    rel_h = jnp.einsum(
        "bythwc,hkc->bythwk", r_q, Rh.astype(r_q.dtype),
        preferred_element_type=jnp.float32,
    )
    rel_w = jnp.einsum(
        "bythwc,wkc->bythwk", r_q, Rw.astype(r_q.dtype),
        preferred_element_type=jnp.float32,
    )
    return rel_h, rel_w


def temporal_bias_term(
    r_q: jax.Array,
    q_shape: Tuple[int, int, int],
    k_shape: Tuple[int, int, int],
    rel_pos_t: jax.Array,
):
    """Temporal bias: [B, heads, qT, qH, qW, kT]."""
    q_t = q_shape[0]
    k_t = k_shape[0]
    dt = 2 * max(q_t, k_t) - 1
    Rt = resize_rel_pos(rel_pos_t, dt)[_dist_idx(q_t, k_t)]  # [qT, kT, C]
    return jnp.einsum(
        "bythwc,tuc->bythwu", r_q, Rt.astype(r_q.dtype),
        preferred_element_type=jnp.float32,
    )


import functools


@functools.lru_cache(maxsize=None)
def _k_axis_indices(k_shape: Tuple[int, int, int], n_k: int, sp: int):
    """Static per-k-token (kt, kh, kw) index vectors over the full token axis.

    Non-patch positions (cls, objects) point at a sentinel index holding a
    zero bias entry.
    """
    k_t, k_h, k_w = k_shape
    k_l = k_t * k_h * k_w
    kt = np.full(n_k, k_t, np.int32)   # sentinel = appended zero slot
    kh = np.full(n_k, k_h, np.int32)
    kw = np.full(n_k, k_w, np.int32)
    grid = np.arange(k_l)
    kt[sp : sp + k_l] = grid // (k_h * k_w)
    kh[sp : sp + k_l] = (grid // k_w) % k_h
    kw[sp : sp + k_l] = grid % k_w
    return kt, kh, kw


def add_rel_pos_bias(
    attn: jax.Array,
    q: jax.Array,
    q_shape: Tuple[int, int, int],
    k_shape: Tuple[int, int, int],
    *,
    has_cls: bool,
    rel_pos_h: jax.Array = None,
    rel_pos_w: jax.Array = None,
    rel_pos_t: jax.Array = None,
) -> jax.Array:
    """Add decomposed rel-pos bias into the patch x patch block of attn.

    attn: [B, heads, Nq, Nk] logits; q: [B, heads, Nq, head_dim].
    Token layout: [cls? | qT*qH*qW patches | objects] on both axes.

    Implementation note (perf-critical): bias terms are tiny
    (``[B, h, Nq, kH]``-shaped); they are broadcast-added onto a minor-axis
    reshaped view of the patch columns and stitched with ONE concat along the
    k axis.  Earlier variants (8-d block stitching with q+k concats; full-size
    k-axis gathers) each cost more than the whole rest of the forward pass in
    HBM traffic — this form lowers to a single fused write of the attn
    tensor.
    """
    if rel_pos_h is None and rel_pos_t is None:
        return attn

    sp = 1 if has_cls else 0
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    q_l = q_t * q_h * q_w
    k_l = k_t * k_h * k_w
    B, heads, Nq, _ = q.shape

    r_q = q[:, :, sp : sp + q_l].reshape(B, heads, q_t, q_h, q_w, -1)

    def pad_q(term):
        # zero bias rows for cls/object queries
        return jnp.pad(term, ((0, 0), (0, 0), (sp, Nq - sp - q_l), (0, 0)))

    patch = attn[..., sp : sp + k_l].reshape(B, heads, Nq, k_t, k_h, k_w)
    if rel_pos_h is not None:
        rel_h, rel_w = spatial_bias_terms(
            r_q, q_shape, k_shape, rel_pos_h, rel_pos_w
        )
        rel_h = pad_q(rel_h.reshape(B, heads, q_l, k_h))
        rel_w = pad_q(rel_w.reshape(B, heads, q_l, k_w))
        patch = (
            patch
            + rel_h[:, :, :, None, :, None]
            + rel_w[:, :, :, None, None, :]
        )
    if rel_pos_t is not None:
        rel_t = temporal_bias_term(r_q, q_shape, k_shape, rel_pos_t)
        rel_t = pad_q(rel_t.reshape(B, heads, q_l, k_t))
        patch = patch + rel_t[:, :, :, :, None, None]

    patch = patch.reshape(B, heads, Nq, k_l)
    parts = []
    if sp:
        parts.append(attn[..., :sp])
    parts.append(patch)
    if attn.shape[3] > sp + k_l:
        parts.append(attn[..., sp + k_l :])
    return jnp.concatenate(parts, axis=-1)
