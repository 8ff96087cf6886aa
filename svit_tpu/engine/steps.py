"""jit-compiled train/eval step functions.

The reference's heterogeneous MPMD (7 video GPUs + 1 image GPU,
``slowfast/datasets/loader.py:186-241``, ``losses.py:119-122``) becomes ONE
jitted step computing both branches and weighting them by the rank ratio:
DDP averages gradients over ranks, so

    g_ref = (n_vid * grad(L_video) + n_img * grad(L_image)) / n_ranks

which is exactly ``grad(w_v * L_video + w_i * L_image)`` with
``w = n / n_ranks``.  All the reference's ``safety_loss`` / ``sum(p)*0``
DDP-bucket hacks vanish — under jit, unused branches simply contribute zero
gradient.

The frame-clip consistency forward (reference ``train_net.py:105-110``) is a
second apply on the clip reshaped to single frames under ``stop_gradient``,
inside the same compiled graph.

Batches carry a per-sample ``weight`` so global batch sizes that don't divide
the mesh (the shipped 63+63 recipe on 8 chips) are padded without changing
any loss value.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


def create_train_state(params, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )


def make_train_step(
    model,
    loss_obj,
    tx,
    video_weight: float,
    image_weight: float,
    with_image: bool,
    with_consistency: bool,
    device_aug_cfg=None,
):
    """Build the fused video+image train step.

    video_batch: {clips [B,T,H,W,3], labels [B], weight [B]}
    image_batch: {frames [B,1,H,W,3], haog_bboxes [B,1,O,4],
                  contact_state [B,2], weight [B]} (may be None)

    With ``device_aug_cfg`` (a DeviceAugConfig), video clips arrive as raw
    uint8 and the augmentation pipeline runs inside this compiled step.
    """

    def loss_fn(params, video_batch, image_batch, rng):
        metrics = {}
        rngs = {"dropout": rng}
        total = 0.0

        frames_extra = None
        if with_consistency:
            clips = video_batch["clips"]
            B, T = clips.shape[0], clips.shape[1]
            frames = clips.reshape(B * T, 1, *clips.shape[2:])
            _, frames_extra = model.apply(
                {"params": params},
                frames,
                deterministic=False,
                rngs={"dropout": jax.random.fold_in(rng, 1)},
            )
            frames_extra = jax.tree.map(jax.lax.stop_gradient, frames_extra)
            frames_extra = {
                "obj_desc": frames_extra["obj_desc"].reshape(
                    B, T, -1, frames_extra["obj_desc"].shape[-1]
                )
            }

        logits, extra = model.apply(
            {"params": params},
            video_batch["clips"],
            deterministic=False,
            rngs=rngs,
        )
        vdict = loss_obj.video_losses(
            logits,
            video_batch["labels"],
            extra,
            frames_extra,
            video_batch.get("weight"),
        )
        total = total + video_weight * loss_obj.weighted_sum(vdict)
        metrics.update(vdict)

        if with_image and image_batch is not None:
            _, iextra = model.apply(
                {"params": params},
                image_batch["frames"],
                deterministic=False,
                rngs={"dropout": jax.random.fold_in(rng, 2)},
            )
            idict = loss_obj.image_losses(
                iextra,
                {
                    "haog_bboxes": image_batch["haog_bboxes"],
                    "contact_state": image_batch["contact_state"],
                },
                image_batch.get("weight"),
            )
            total = total + image_weight * loss_obj.weighted_sum(idict)
            metrics.update(idict)

        metrics["loss"] = total
        return total, metrics

    def train_step(state: TrainState, video_batch, image_batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        if device_aug_cfg is not None:
            from svit_tpu.data.device_aug import (
                device_augment,
                device_augment_image,
            )

            clips = device_augment(
                video_batch["clips"], jax.random.fold_in(rng, 7), device_aug_cfg
            )
            video_batch = dict(video_batch, clips=clips)
            if image_batch is not None:
                # Box-aware image-branch augmentation: frames arrive uint8
                # with pixel-coordinate boxes; the paired affine transform
                # yields normalized cxcywh HAOG targets.
                frames, haog = device_augment_image(
                    image_batch["frames"],
                    image_batch["haog_bboxes"],
                    jax.random.fold_in(rng, 8),
                    device_aug_cfg,
                )
                image_batch = dict(
                    image_batch, frames=frames, haog_bboxes=haog
                )
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, video_batch, image_batch, rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        return new_state, metrics

    return train_step


def make_packed_train_step(*args, **kwargs):
    """``make_train_step`` with the metrics dict packed into ONE f32 vector.

    The engine loop defers metric fetches to LOG_PERIOD boundaries; fetching
    K dicts of ~13 separate scalar buffers costs ~K*13 tiny device->host
    transfers (each a tunnel/PCIe round trip), while the packed form is one
    stack dispatch + one contiguous transfer per flush.  Returns
    ``(step_fn, metric_names)`` — ``metric_names`` is a list filled in at
    trace time (stable across retraces; read it after the first call).
    """
    base = make_train_step(*args, **kwargs)
    names: list = []

    def packed(state, video_batch, image_batch, rng):
        s, m = base(state, video_batch, image_batch, rng)
        ks = sorted(m)
        if not names:
            names.extend(ks)
        return s, jnp.stack([m[k].astype(jnp.float32) for k in ks])

    return packed, names


def make_eval_step(model, num_classes, loss_obj=None,
                   with_consistency: bool = False):
    """Eval: logits (softmax'd — eval head act) + weighted top-1/5 counts.

    ``num_classes`` is an int, or the arch's multitask tuple
    ``(("verb", nv), ("noun", nn), ...)`` — then ``batch["labels"]`` is a
    dict of per-task label arrays and the step reports per-task weighted
    top-1/5 counts plus the JOINT counts (a sample is jointly correct at k
    iff every task is correct within its own top-k — the reference's
    EPIC-Kitchens "action" protocol, ``tools/train_net.py:249-315`` /
    ``utils/metrics.py:78-118``, pinned by
    ``tests/test_multitask.py::test_multitask_topk_joint_correctness``).
    The joint counts ride in the primary top1/top5 slots.

    With ``loss_obj`` the step also reports the full val loss dict the
    reference logs (``eval_extra_metrics``, ``slowfast/utils/meters.py:
    869-883``): at eval the reference loss always takes the video branch
    (``is_vid()`` is true when not training, ``losses.py:124``), i.e.
    ``loss_ce`` + the consistency losses (with a frames forward,
    ``train_net.py:243-248``) + the lambda-weighted ``loss`` total.
    """
    multitask = not isinstance(num_classes, int)

    def _nll(raw, labels, n, w):
        # log_softmax on pre-activation logits is the numerically stable
        # form (log(softmax(x)) prints inf for a confident-wrong bf16
        # prediction).
        safe = jnp.clip(labels, 0, max(n - 1, 0))
        logp = jax.nn.log_softmax(raw.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
        return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)

    def eval_step(params, batch):
        logits, extra = model.apply(
            {"params": params}, batch["clips"], deterministic=True
        )
        labels = batch["labels"]
        w = batch.get("weight")
        if w is None:
            first = logits[num_classes[0][0]] if multitask else logits
            w = jnp.ones(first.shape[0], jnp.float32)
        if multitask:
            raw = extra.get("raw_logits", logits)
            joint1 = joint5 = None
            per_task = {}
            val_loss = 0.0
            for name, n in num_classes:
                k5 = min(5, n)
                _, top5 = jax.lax.top_k(logits[name], k5)
                corr = top5 == labels[name][:, None]
                cum = jnp.cumsum(corr, axis=1) > 0  # correct within top-k
                c1b, c5b = cum[:, 0], cum[:, -1]
                per_task[name] = ((c1b * w).sum(), (c5b * w).sum())
                joint1 = c1b if joint1 is None else joint1 & c1b
                joint5 = c5b if joint5 is None else joint5 & c5b
                val_loss = val_loss + _nll(raw[name], labels[name], n, w)
            out = {
                "logits": logits,
                "top1_correct": (joint1 * w).sum(),
                "top5_correct": (joint5 * w).sum(),
                "count": w.sum(),
                "loss_ce": val_loss,
            }
            for name, (c1, c5) in per_task.items():
                out[f"{name}_top1_correct"] = c1
                out[f"{name}_top5_correct"] = c5
            if loss_obj is not None:
                out["loss"] = loss_obj.weighted_sum({"loss_ce": val_loss})
            return out

        k1 = min(1, num_classes)
        k5 = min(5, num_classes)
        _, top5 = jax.lax.top_k(logits, k5)
        correct = top5 == labels[:, None]
        c1 = (correct[:, :k1].any(axis=1) * w).sum()
        c5 = (correct.any(axis=1) * w).sum()
        # eval-mode loss (reference re-runs the loss fn at val,
        # meters.py:869-883)
        val_loss = _nll(extra.get("raw_logits", logits), labels,
                        num_classes, w)
        out = {
            "logits": logits,
            "top1_correct": c1,
            "top5_correct": c5,
            "count": w.sum(),
            "loss_ce": val_loss,
        }
        if loss_obj is not None:
            vdict = {"loss_ce": val_loss}
            if with_consistency:
                clips = batch["clips"]
                B, T = clips.shape[0], clips.shape[1]
                frames = clips.reshape(B * T, 1, *clips.shape[2:])
                _, frames_extra = model.apply(
                    {"params": params}, frames, deterministic=True
                )
                key = f"video_image_desc_{loss_obj.consistency_kind}_loss"
                from svit_tpu.models.losses import consistency_loss

                vdict[key] = consistency_loss(
                    extra["obj_desc"],
                    frames_extra["obj_desc"].reshape(
                        B, T, -1, frames_extra["obj_desc"].shape[-1]
                    ),
                    loss_obj.consistency_kind,
                )
            vdict["loss"] = loss_obj.weighted_sum(
                {k: v for k, v in vdict.items() if k != "loss"}
            )
            out.update(vdict)
        return out

    return eval_step


def make_image_eval_step(model, loss_obj):
    """Image-branch val: HAOG losses on the image val split.

    TPU-native extension: the reference never runs an image val loop (its
    eval loss is video-branch-only, ``losses.py:124``), but the HAOG heads
    are trained parameters — validating them catches image-branch
    regressions the video CE can't see.
    """

    def image_eval_step(params, batch):
        _, iextra = model.apply(
            {"params": params}, batch["frames"], deterministic=True
        )
        w = batch.get("weight")
        idict = loss_obj.image_losses(
            iextra,
            {
                "haog_bboxes": batch["haog_bboxes"],
                "contact_state": batch["contact_state"],
            },
            w,
        )
        idict["loss"] = loss_obj.weighted_sum(idict)
        if w is None:
            w = jnp.ones(batch["frames"].shape[0], jnp.float32)
        idict["count"] = w.sum()
        return idict

    return image_eval_step


def make_test_step(model):
    """Multi-view test: per-clip softmax scores for host-side ensembling."""

    def test_step(params, batch):
        logits, _ = model.apply(
            {"params": params}, batch["clips"], deterministic=True
        )
        return logits

    return test_step


def check_nan(metrics: Dict[str, Any], extra_msg: str = ""):
    """Host-side NaN guard (reference ``misc.check_nan_losses``)."""
    loss = float(metrics["loss"])
    if not jnp.isfinite(loss):
        raise RuntimeError(f"ERROR: Got NaN losses: {metrics} {extra_msg}")
