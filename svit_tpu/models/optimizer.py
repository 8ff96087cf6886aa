"""Optimizer construction with optax (reference ``slowfast/models/optimizer.py``).

Reproduces the reference's parameter grouping semantics
(``optimizer.py:30-62``): params that are 1-D or named ``bias`` get zero
weight decay when ``SOLVER.ZERO_WD_1D_PARAM`` (LayerNorm scales/biases, all
biases); everything else gets ``SOLVER.WEIGHT_DECAY``.  Gradient clipping
(value or global L2 norm) happens before the Adam update, as in the reference
train loop (train_net.py:139-147).  bf16 training keeps f32 master weights and
needs no GradScaler.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax

from svit_tpu.utils import lr_policy


def wd_mask(params, zero_wd_1d: bool):
    """True where weight decay applies."""

    def keep(path, p):
        if not zero_wd_1d:
            return True
        last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if last == "bias" or last == "scale":
            return False
        return p.ndim > 1

    return jax.tree_util.tree_map_with_path(keep, params)


def lr_schedule_fn(cfg, steps_per_epoch: int) -> Callable[[int], float]:
    """Per-step LR: the reference evaluates its policy at epoch+iter/len."""

    def schedule(step):
        # Host-side float math; optax calls this with a traced step under jit,
        # so express it with jax-compatible ops via interpolation table.
        return step  # replaced below

    # Build a dense per-step table once (cheap: MAX_EPOCH * steps_per_epoch
    # float evals) and interpolate — keeps arbitrary policies jit-safe.
    import numpy as np
    import jax.numpy as jnp

    total = int(cfg.SOLVER.MAX_EPOCH * steps_per_epoch) + 2
    table = np.array(
        [
            lr_policy.get_lr_at_epoch(cfg, s / steps_per_epoch)
            for s in range(total)
        ],
        dtype=np.float32,
    )
    table_j = jnp.asarray(table)

    def schedule(step):  # noqa: F811
        idx = jnp.clip(step, 0, total - 1).astype(jnp.int32)
        return table_j[idx]

    return schedule


def construct_optimizer(cfg, steps_per_epoch: int):
    """Return (optax transform, schedule fn)."""
    schedule = lr_schedule_fn(cfg, steps_per_epoch)
    sol = cfg.SOLVER

    clip = []
    if sol.CLIP_GRAD_VAL:
        clip.append(
            optax.clip(sol.CLIP_GRAD_VAL)
        )
    elif sol.CLIP_GRAD_L2NORM:
        clip.append(optax.clip_by_global_norm(sol.CLIP_GRAD_L2NORM))

    method = sol.OPTIMIZING_METHOD
    mask_fn = lambda params: wd_mask(params, sol.ZERO_WD_1D_PARAM)  # noqa: E731
    if method == "adamw":
        opt = optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=sol.WEIGHT_DECAY,
            mask=mask_fn,
        )
    elif method == "adam":
        opt = optax.adam(learning_rate=schedule, b1=0.9, b2=0.999)
    elif method == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(sol.WEIGHT_DECAY, mask=mask_fn),
            optax.sgd(
                learning_rate=schedule,
                momentum=sol.MOMENTUM,
                nesterov=sol.NESTEROV,
            ),
        )
    else:
        raise NotImplementedError(f"Does not support {method} optimizer")

    return optax.chain(*clip, opt), schedule
