"""Box utilities in JAX (reference ``slowfast/utils/box_ops.py``).

All functions are jit-safe: no data-dependent shapes, degenerate boxes handled
by masked arithmetic instead of the reference's Python asserts.  The HAOG
matching (2 hands x 2 objects) is a fixed-size 2-permutation comparison — the
reference's SciPy Hungarian solver is unnecessary at this size
(``box_ops.py:166-181`` already special-cases it to two orderings).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def box_cxcywh_to_xyxy(b):
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b):
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_xywh_to_xyxy(b):
    x, y, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def box_area(b):
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def paired_giou(boxes1, boxes2, eps: float = 1e-7):
    """Elementwise generalized IoU for paired boxes [..., 4] in xyxy.

    Equivalent to ``diag(generalized_box_iou(b1, b2))`` in the reference
    (``losses.py:86-89``) without materializing the NxM matrix.  Safe on
    degenerate (zero) boxes: denominators are clamped.
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)

    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / jnp.maximum(union, eps)

    lt_enc = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_enc = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_enc = jnp.clip(rb_enc - lt_enc, 0)
    area_enc = wh_enc[..., 0] * wh_enc[..., 1]
    return iou - (area_enc - union) / jnp.maximum(area_enc, eps)


def pairwise_giou(boxes1, boxes2, eps: float = 1e-7):
    """Full [N, M] GIoU matrix in xyxy (reference ``generalized_box_iou``)."""
    return paired_giou(boxes1[:, None, :], boxes2[None, :, :], eps)


def zero_empty_boxes(boxes, mode: str = "cxcywh", eps: float = 0.05):
    """Zero out boxes whose width or height <= eps (reference :116-130)."""
    if mode == "xyxy":
        wh = boxes[..., 2:4] - boxes[..., 0:2]
    elif mode == "cxcywh":
        wh = boxes[..., 2:4]
    else:
        raise NotImplementedError(mode)
    empty = jnp.any(wh <= eps, axis=-1, keepdims=True)
    return jnp.where(empty, 0.0, boxes)


# ---------------------------------------------------------------------------
# HAOG matching — pure numpy (host-side, inside the data pipeline)
# ---------------------------------------------------------------------------

HIGH_COST = 1e8
CONTACT_THRESHOLD = 0.1


def match_haog(haog: np.ndarray):
    """Order (hand1, hand2, obj1, obj2) by center distance; derive contact state.

    Reference ``box_ops.py:140-194``.  ``haog``: [4, 4] boxes (2 hands then 2
    objects).  NOTE: faithfully to the reference, centers are taken from the
    first two coordinates of the boxes *as passed* (the reference computes a
    cxcywh conversion then discards it, ``box_ops.py:166``).
    Returns (reordered haog [4,4], contact_state [2] in {-1, 0, 3}).
    """
    # float32 throughout: the reference computes in torch f32, where
    # ``1e8 + small`` rounds back to 1e8 — so orderings involving a missing
    # box always tie and never swap.  float64 would change that behavior.
    haog = np.asarray(haog, dtype=np.float32)
    centers = haog[:, :2]
    diff = centers[:2, None, :] - centers[None, 2:, :]
    cost = np.sqrt(np.sum(diff * diff, axis=-1, dtype=np.float32))
    obj_is_zero = np.all(haog[2:] == 0, axis=-1)
    hand_is_zero = np.all(haog[:2] == 0, axis=-1)
    cost[:, obj_is_zero] = HIGH_COST
    cost[:, hand_is_zero] = HIGH_COST

    ord1 = np.float32(cost[0, 0] + cost[1, 1])
    ord2 = np.float32(cost[0, 1] + cost[1, 0])
    if ord2 < ord1:
        h1, h2, o1, o2 = haog[0], haog[2], haog[1], haog[3]
        haog = np.stack([h1, h2, o2, o1], axis=0)
        dists = (cost[0, 1], cost[1, 0])
    else:
        dists = (cost[0, 0], cost[1, 1])

    def _state(d):
        if d == HIGH_COST:
            return -1
        return 3 if d < CONTACT_THRESHOLD else 0

    contact = np.array([_state(d) for d in dists], dtype=np.int64)
    return haog.astype(np.float32), contact
