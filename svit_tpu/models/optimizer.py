"""Optimizer construction with optax (reference ``slowfast/models/optimizer.py``).

Reproduces the reference's parameter grouping semantics
(``optimizer.py:30-62``): a param lands in the zero-weight-decay group when

* its name is in ``model.no_weight_decay()`` (``video_model_builder.py:
  267-289``, gated on ``MVIT.ZERO_DECAY_POS_CLS``), or
* it is 1-D or named ``bias`` and ``SOLVER.ZERO_WD_1D_PARAM`` is set
  (LayerNorm scales/biases, all biases);

everything else gets ``SOLVER.WEIGHT_DECAY``.  Name-matching subtlety
reproduced faithfully (and pinned by ``tests/test_optimizer_golden.py``
against the reference's actual ``param_groups``): the reference checks the
FULL dotted name from ``named_parameters()`` against the BARE names the model
returns, so only parameters registered at the model root match —
``cls_token``, ``object_queries``, ``pos_embed_temporal`` (and the abs
pos-embeds when enabled).  The block-nested ``rel_pos_h/w/t`` appear in the
list but their dotted names (``blocks.N.attn.rel_pos_h``) never equal a bare
name, so the reference DECAYS them; we match that behavior exactly.

Gradient clipping (value or global L2 norm) happens before the Adam update,
as in the reference train loop (train_net.py:139-147).  bf16 training keeps
f32 master weights and needs no GradScaler.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import optax

from svit_tpu.utils import lr_policy


def no_weight_decay_names(cfg) -> list:
    """The reference's ``SViT.no_weight_decay()`` name list.

    Mirrors ``video_model_builder.py:267-289`` exactly, including its quirk:
    with ``USE_ABS_POS`` and non-separable pos-embed the reference appends the
    *list* ``["pos_embed"]`` into ``names`` (``names.append(["pos_embed"])``),
    which can never equal a string parameter name — so that branch
    contributes nothing and we faithfully add nothing.
    """
    names: list = []
    if not cfg.MVIT.ZERO_DECAY_POS_CLS:
        return names
    if cfg.MVIT.USE_ABS_POS and cfg.MVIT.SEP_POS_EMBED:
        names += ["pos_embed_spatial", "pos_embed_class"]
    if cfg.MVIT.REL_POS_SPATIAL:
        names += ["rel_pos_h", "rel_pos_w", "rel_pos_hw"]
    if cfg.MVIT.REL_POS_TEMPORAL:
        names += ["rel_pos_t"]
    if cfg.MVIT.CLS_EMBED_ON:
        names += ["cls_token"]
    names += ["object_queries", "pos_embed_temporal"]
    return names


def wd_mask(params, zero_wd_1d: bool, skip_names: Sequence[str] = ()):
    """True where weight decay applies.

    ``skip_names`` carries the reference's ``no_weight_decay()`` bare-name
    list; per the reference's ``name in skip`` over dotted
    ``named_parameters()`` names, only model-root parameters can match — a
    nested flax path (depth > 1) corresponds to a dotted torch name and is
    therefore never skipped by name.
    """
    skip = frozenset(skip_names)

    def keep(path, p):
        last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if len(path) == 1 and last in skip:
            return False
        if not zero_wd_1d:
            return True
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
    skip_names = tuple(no_weight_decay_names(cfg))
    mask_fn = lambda params: wd_mask(  # noqa: E731
        params, sol.ZERO_WD_1D_PARAM, skip_names
    )
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
