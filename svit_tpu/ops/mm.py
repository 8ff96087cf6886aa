"""Rank-2 matmul helpers.

XLA-TPU rewrites dots with extra free dimensions (e.g. ``[B, L, C] @ [C, D]``)
into 1x1 convolutions with the batch axis relabeled as a spatial dim
(``dim_labels=0bf_io0->0bf`` in the compiled HLO).  Convolutions prefer
batch-minor layouts like ``{2,0,1}``, and layout assignment then propagates
them through the residual stream — but Pallas custom calls are pinned to
default layouts, so every kernel boundary grows a physical relayout ``copy``
(measured: ~8 ms of a 77 ms batch-16 SViT-B forward).

A rank-2 ``[M, K] @ [K, N]`` dot has no spare dimension to relabel: it stays
a plain MXU GEMM in the default layout.  These helpers flatten the leading
dims around the dot; the reshapes are bitcasts under default row-major
layouts.  Numerics are identical to the rank-3 form (same contraction, same
accumulation dtype rules).
"""

from __future__ import annotations

import jax.numpy as jnp


def dense2d(x, w, b=None, preferred_element_type=None):
    """``x @ w (+ b)`` with the leading dims of ``x`` flattened around a
    rank-2 dot.  ``x``: [..., K]; ``w``: [K, N]; ``b``: [N] or [1, N]."""
    lead = x.shape[:-1]
    y = jnp.dot(
        x.reshape(-1, x.shape[-1]), w,
        preferred_element_type=preferred_element_type,
    )
    if b is not None:
        y = y + b.reshape(1, -1).astype(y.dtype)
    return y.reshape(lead + (w.shape[-1],))
