"""Training engine (reference ``tools/train_net.py``).

One process per host drives the whole chip mesh: the fused video+image train
step is jit-compiled once, batches stream from the host loaders and are
sharded over the ``data`` mesh axis, gradients reduce over ICI inside the
compiled step.  The reference's per-GPU process spawn, DDP wrap, GradScaler
and gloo-pickle metric gathers have no TPU counterpart — bf16 needs no loss
scaling, and metrics come back as device scalars.
"""

from __future__ import annotations

import math
import pprint
import time

import jax
import jax.numpy as jnp
import numpy as np

from svit_tpu.config.defaults import num_image_ranks, num_video_ranks
from svit_tpu.data import construct_loader, shuffle_dataset
from svit_tpu.engine import meters as meters_lib
from svit_tpu.engine import steps
from svit_tpu.models import build_model, losses
from svit_tpu.models.optimizer import construct_optimizer
from svit_tpu.parallel import mesh as meshlib
from svit_tpu.utils import checkpoint as cu
from svit_tpu.utils import logging
from svit_tpu.utils.lr_policy import get_lr_at_epoch

logger = logging.get_logger(__name__)


def train(cfg):
    """Full training loop with eval + checkpointing."""
    np.random.seed(cfg.RNG_SEED)
    logging.setup_logging(cfg.OUTPUT_DIR)
    logger.info("Train with config:")
    logger.info(pprint.pformat(cfg.to_dict()))

    mesh = meshlib.build_mesh(cfg)
    mesh_data = mesh.shape["data"]

    model, arch = build_model(cfg)
    loss_obj = losses.get_loss_func(cfg)

    train_loader, image_loader = construct_loader(cfg, "train", mesh_data)
    val_loader = construct_loader(cfg, "val", mesh_data)
    steps_per_epoch = len(train_loader)

    tx, schedule = construct_optimizer(cfg, steps_per_epoch)

    with_image = image_loader is not None
    w_i = num_image_ranks(cfg) / max(cfg.NUM_GPUS, 1) if with_image else 0.0
    w_v = 1.0 - w_i
    with_consistency = bool(
        cfg.TRAIN.FORWARD_VIDEO_FRAMES and cfg.SVIT.CONSISTENCY_LOSS
    )

    S, T = cfg.DATA.TRAIN_CROP_SIZE, cfg.DATA.NUM_FRAMES
    x0 = jnp.zeros((1, T, S, S, 3), jnp.float32)

    with mesh:
        abstract = jax.eval_shape(
            lambda: model.init(
                {"params": jax.random.PRNGKey(cfg.RNG_SEED)}, x0, deterministic=True
            )
        )
        shardings = meshlib.param_sharding(mesh, abstract["params"])
        params = jax.jit(
            lambda: model.init(
                {"params": jax.random.PRNGKey(cfg.RNG_SEED)}, x0, deterministic=True
            )["params"],
            out_shardings=shardings,
        )()
        state = steps.create_train_state(params, tx)

        # -- checkpoint / warm start ----------------------------------------
        start_epoch = 0
        last = cu.get_last_checkpoint(cfg.OUTPUT_DIR) if cfg.TRAIN.AUTO_RESUME else None
        if last:
            restored, epoch = cu.load_train_state(last, state)
            state = steps.TrainState(
                step=jnp.asarray(restored["step"], jnp.int32),
                params=jax.device_put(restored["params"], shardings),
                opt_state=restored["opt_state"],
            )
            start_epoch = epoch + 1
            logger.info("Auto-resumed from %s (epoch %d)", last, epoch)
        elif cfg.TRAIN.CHECKPOINT_FILE_PATH:
            loaded = cu.load_params_any(cfg.TRAIN.CHECKPOINT_FILE_PATH)
            merged = cu.shape_filtered_merge(
                jax.device_get(state.params), loaded["params"]
            )
            state = state.replace(params=jax.device_put(merged, shardings))
            if not cfg.TRAIN.CHECKPOINT_EPOCH_RESET:
                start_epoch = 0  # reference reads epoch from torch ckpt; reset default
            logger.info(
                "Warm-started from %s", cfg.TRAIN.CHECKPOINT_FILE_PATH
            )

        train_step = steps.make_train_step(
            model, loss_obj, tx,
            video_weight=w_v, image_weight=w_i,
            with_image=with_image, with_consistency=with_consistency,
        )
        step_jit = jax.jit(train_step, donate_argnums=(0,))
        eval_step = steps.make_eval_step(
            model,
            arch.num_classes if isinstance(arch.num_classes, int) else 0,
        )
        eval_jit = jax.jit(eval_step)

        data_sh = meshlib.data_sharding(mesh)
        rng = jax.random.PRNGKey(cfg.RNG_SEED)

        train_meter = meters_lib.TrainMeter(steps_per_epoch, cfg)
        val_meter = meters_lib.ValMeter(len(val_loader), cfg)
        epoch_timer = meters_lib.EpochTimer()

        for cur_epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
            shuffle_dataset((train_loader, image_loader), cur_epoch)
            epoch_timer.epoch_tic()
            train_epoch(
                cfg, step_jit, state_box := [state], train_loader, image_loader,
                train_meter, cur_epoch, data_sh, rng, steps_per_epoch,
            )
            state = state_box[0]
            epoch_timer.epoch_toc()
            logger.info(
                "Epoch %d took %.2fs (avg %.2fs)",
                cur_epoch, epoch_timer.last_epoch_time(), epoch_timer.avg_epoch_time(),
            )

            if cu.is_checkpoint_epoch(cfg, cur_epoch):
                cu.save_checkpoint(cfg.OUTPUT_DIR, state, cur_epoch, cfg)
            if (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0 or (
                cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH
            ):
                eval_epoch(
                    cfg, eval_jit, state, val_loader, val_meter, cur_epoch, data_sh
                )
    return state


def train_epoch(
    cfg, step_jit, state_box, train_loader, image_loader, train_meter,
    cur_epoch, data_sh, rng, steps_per_epoch,
):
    state = state_box[0]
    image_iter = iter(image_loader) if image_loader is not None else None
    train_meter.iter_tic()
    for cur_iter, video_batch in enumerate(train_loader):
        image_batch = None
        if image_iter is not None:
            try:
                image_batch = next(image_iter)
            except StopIteration:
                image_iter = iter(image_loader)
                image_batch = next(image_iter)
            image_batch = {
                k: image_batch[k]
                for k in ("frames", "haog_bboxes", "contact_state", "weight")
            }
        vb = {k: video_batch[k] for k in ("clips", "labels", "weight")}
        vb = jax.device_put(vb, data_sh)
        if image_batch is not None:
            image_batch = jax.device_put(image_batch, data_sh)
        train_meter.data_toc()

        state, metrics = step_jit(state, vb, image_batch, rng)
        metrics = jax.device_get(metrics)
        steps.check_nan(metrics)

        lr = get_lr_at_epoch(cfg, cur_epoch + cur_iter / steps_per_epoch)
        train_meter.update_stats(
            lr, int(video_batch["weight"].sum()), {k: float(v) for k, v in metrics.items()}
        )
        train_meter.iter_toc()
        train_meter.log_iter_stats(cur_epoch, cur_iter)
        train_meter.iter_tic()
    train_meter.log_epoch_stats(cur_epoch)
    train_meter.reset()
    state_box[0] = state


def eval_epoch(cfg, eval_jit, state, val_loader, val_meter, cur_epoch, data_sh):
    for cur_iter, batch in enumerate(val_loader):
        vb = {k: batch[k] for k in ("clips", "labels", "weight")}
        vb = jax.device_put(vb, data_sh)
        val_meter.iter_tic()
        params = state.params if hasattr(state, "params") else state
        out = eval_jit(params, vb)
        out = jax.device_get(out)
        val_meter.update_stats(
            out["top1_correct"], out["top5_correct"], out["count"]
        )
        val_meter.iter_toc()
        val_meter.log_iter_stats(cur_epoch, cur_iter)
    stats = val_meter.log_epoch_stats(cur_epoch)
    val_meter.reset()
    return stats
