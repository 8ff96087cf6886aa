"""Offline model visualization (reference ``tools/visualization.py``):
weights/activations/Grad-CAM to TensorBoard + wrong-prediction gallery,
gated by ``TENSORBOARD.MODEL_VIS`` / ``TENSORBOARD.WRONG_PRED_VIS``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from svit_tpu.data import construct_loader
from svit_tpu.models import build_model
from svit_tpu.parallel import mesh as meshlib
from svit_tpu.utils import checkpoint as cu
from svit_tpu.utils import logging
from svit_tpu.visualization.tensorboard_vis import TensorboardWriter

logger = logging.get_logger(__name__)


def run_visualization(cfg, model, params, loader, writer):
    vis_cfg = cfg.TENSORBOARD.MODEL_VIS
    n_devices = max(cfg.NUM_GPUS, 1)

    if vis_cfg.MODEL_WEIGHTS:
        writer.plot_weights_and_activations(params, tag="weights/")

    gradcam = None
    if vis_cfg.GRAD_CAM.ENABLE:
        from svit_tpu.models import SViT
        from svit_tpu.visualization.gradcam import GradCAM

        cam_model = SViT(arch=model.arch, dtype=model.dtype, capture_gradcam=True)
        layer = (
            vis_cfg.GRAD_CAM.LAYER_LIST[0]
            if vis_cfg.GRAD_CAM.LAYER_LIST
            else None
        )
        gradcam = GradCAM(
            cam_model, params, target_layer=layer,
            data_mean=cfg.DATA.MEAN, data_std=cfg.DATA.STD,
            colormap=vis_cfg.GRAD_CAM.COLORMAP,
        )

    global_idx = -1
    for cur_iter, batch in enumerate(loader):
        clips = jnp.asarray(batch["clips"])
        labels = batch["labels"]
        if gradcam is not None:
            videos, preds = gradcam(
                clips,
                jnp.asarray(labels) if vis_cfg.GRAD_CAM.USE_TRUE_LABEL else None,
            )
            if vis_cfg.INPUT_VIDEO:
                global_idx += 1
                writer.add_video(videos, tag="Input/GradCAM", global_step=global_idx)
        if vis_cfg.ACTIVATIONS:
            _, state = model.apply(
                {"params": params["params"] if "params" in params else params},
                clips,
                deterministic=True,
                capture_intermediates=True,
                mutable=["intermediates"],
            )
            writer.plot_weights_and_activations(
                state["intermediates"], tag=f"activations/iter{cur_iter}/"
            )
        if cur_iter >= 2:  # bounded visualization pass
            break


class WrongPredictionVis:
    """Gallery of misclassified clips (reference ``prediction_vis.py:16``)."""

    def __init__(self, cfg, writer):
        self.cfg = cfg
        self.writer = writer
        self.tag = cfg.TENSORBOARD.WRONG_PRED_VIS.TAG
        self.num_vis = 0

    def visualize_vid(self, video, preds, labels, batch_idx):
        pred_ids = np.asarray(preds).argmax(-1)
        labels = np.asarray(labels)
        wrong = np.nonzero(pred_ids != labels)[0]
        for i in wrong[:4]:
            frames = np.asarray(video[i : i + 1])
            frames = np.clip(
                frames * np.asarray(self.cfg.DATA.STD) + np.asarray(self.cfg.DATA.MEAN),
                0, 1,
            )
            self.writer.add_video(
                (frames * 255).astype(np.uint8),
                tag=f"{self.tag}/label_{int(labels[i])}_pred_{int(pred_ids[i])}",
                global_step=self.num_vis,
            )
            self.num_vis += 1


def visualize(cfg):
    logging.setup_logging(cfg.OUTPUT_DIR)
    mesh = meshlib.build_mesh(cfg)
    model, arch = build_model(cfg)
    loader = construct_loader(cfg, "test", mesh.shape["data"])

    S, T = cfg.DATA.TEST_CROP_SIZE, cfg.DATA.NUM_FRAMES
    x0 = jnp.zeros((1, T, S, S, 3), jnp.float32)
    with mesh:
        abstract = jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0)}, x0, deterministic=True)
        )
        ckpt = cu.load_test_checkpoint_path(cfg)
        if ckpt:
            params = cu.load_params_any(ckpt, abstract["params"])
        else:
            params = model.init(
                {"params": jax.random.PRNGKey(0)}, x0, deterministic=True
            )

        writer = TensorboardWriter(cfg)
        if cfg.TENSORBOARD.MODEL_VIS.ENABLE:
            run_visualization(cfg, model, params, loader, writer)
        if cfg.TENSORBOARD.WRONG_PRED_VIS.ENABLE:
            wrong_vis = WrongPredictionVis(cfg, writer)
            for batch_idx, batch in enumerate(loader):
                logits, _ = model.apply(
                    {"params": params["params"] if "params" in params else params},
                    jnp.asarray(batch["clips"]),
                    deterministic=True,
                )
                wrong_vis.visualize_vid(
                    batch["clips"], np.asarray(logits), batch["labels"], batch_idx
                )
                if batch_idx >= 4:
                    break
        writer.close()
