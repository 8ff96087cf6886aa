"""Accuracy metrics (reference ``slowfast/utils/metrics.py``)."""

from __future__ import annotations

from typing import Iterable, List

import jax.numpy as jnp
import numpy as np


def topks_correct(preds, labels, ks: Iterable[int]) -> List:
    """Number of top-k correct predictions per k (reference metrics.py:9-50).

    preds: [B, C] scores; labels: [B] ints.  Handles the 0-class edge case.
    """
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    if preds.shape[-1] == 0:
        return [np.zeros(()) for _ in ks]
    max_k = min(max(ks), preds.shape[-1])
    # top-k indices per row, sorted by score descending
    topk_idx = np.argsort(-preds, axis=-1)[:, :max_k]
    correct = topk_idx == labels[:, None]
    return [correct[:, : min(k, max_k)].sum() for k in ks]


def topk_accuracies(preds, labels, ks):
    num = len(np.asarray(labels))
    return [float(c) / num * 100.0 for c in topks_correct(preds, labels, ks)]


def topk_errors(preds, labels, ks):
    num = len(np.asarray(labels))
    return [(1.0 - float(c) / num) * 100.0 for c in topks_correct(preds, labels, ks)]


def multitask_topks_correct(preds: dict, labels: dict, ks=(1,)):
    """Joint verb+noun top-k (reference metrics.py:78-118): a sample counts as
    correct at k iff every task is correct within its own top-k."""
    task_names = list(preds.keys())
    all_correct = None
    for name in task_names:
        p = np.asarray(preds[name])
        l = np.asarray(labels[name])
        max_k = max(ks)
        topk_idx = np.argsort(-p, axis=-1)[:, :max_k]
        corr = topk_idx == l[:, None]  # [B, max_k]
        cum = np.cumsum(corr, axis=1) > 0  # correct within top-k
        all_correct = cum if all_correct is None else (all_correct & cum)
    return [all_correct[:, k - 1].sum() for k in ks]


def jit_topk_correct(preds: jnp.ndarray, labels: jnp.ndarray, ks=(1, 5)):
    """Device-side top-k correct counts for use inside jitted eval steps."""
    import jax

    out = []
    for k in ks:
        kk = min(k, preds.shape[-1])
        _, idx = jax.lax.top_k(preds, kk)
        out.append(jnp.sum(idx == labels[:, None]))
    return out
