"""Grad-CAM for SViT (reference ``slowfast/visualization/gradcam_utils.py``).

The torch version registers forward/backward hooks on a named layer
(``gradcam_utils.py:12-178``).  The JAX formulation: the model exposes
zero-valued flax *perturbation* points after every block
(``SViT(capture_gradcam=True)``); activations come from
``capture_intermediates`` and gradients from ``jax.grad`` w.r.t. the
perturbations — then the per-token weights * activations map is upsampled
over the input frames.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import matplotlib


def _colormap(name: str):
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt.get_cmap(name)


class GradCAM:
    def __init__(
        self,
        model,          # SViT module constructed with capture_gradcam=True
        params,
        target_layer: str = None,   # e.g. "blocks_15_out"; default = last block
        data_mean=(0.45, 0.45, 0.45),
        data_std=(0.225, 0.225, 0.225),
        colormap: str = "viridis",
    ):
        assert model.capture_gradcam, "build the model with capture_gradcam=True"
        self.model = model
        self.params = params
        self.target_layer = target_layer or f"blocks_{model.arch.depth - 1}_out"
        self.data_mean = np.asarray(data_mean, np.float32)
        self.data_std = np.asarray(data_std, np.float32)
        self.colormap = _colormap(colormap)

        # zero perturbations: shapes discovered by a forward trace
        self._zero_pert = None

    def _ensure_pert(self, x):
        if self._zero_pert is not None:
            return
        variables = self.model.init(
            {"params": jax.random.PRNGKey(0)}, x, deterministic=True
        )
        self._zero_pert = jax.tree.map(
            jnp.zeros_like, variables.get("perturbations", {})
        )

    def localization_map(
        self, clips: jax.Array, labels: Optional[jax.Array] = None
    ) -> Tuple[np.ndarray, jax.Array]:
        """clips: [B, T, H, W, C] normalized. Returns (map [B,T,H,W] in [0,1],
        preds)."""
        self._ensure_pert(clips)

        def score_fn(pert):
            logits, _ = self.model.apply(
                {"params": self.params["params"] if "params" in self.params else self.params,
                 "perturbations": pert},
                clips,
                deterministic=True,
            )
            if labels is None:
                s = logits.max(axis=-1)
            else:
                s = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
            return s.sum(), logits

        (_, logits), grads = jax.value_and_grad(score_fn, has_aux=True)(
            self._zero_pert
        )

        # activations of the target layer
        _, state = self.model.apply(
            {"params": self.params["params"] if "params" in self.params else self.params},
            clips,
            deterministic=True,
            capture_intermediates=lambda mdl, name: True,
            mutable=["intermediates"],
        )
        acts = _find_intermediate(state["intermediates"], self.target_layer)
        grad = grads[self.target_layer]

        B, t_in = clips.shape[0], clips.shape[1]
        arch = self.model.arch
        # the perturb point carries the patch-grid stream [B, T', H', W', C] —
        # already cls/object-free; final grid after q-strides
        thw = _final_thw(arch, t_in)
        patch_acts = acts.reshape(B, -1, acts.shape[-1])
        patch_grad = grad.reshape(B, -1, grad.shape[-1])

        weights = patch_grad.mean(axis=1, keepdims=True)      # GAP over tokens
        cam = (weights * patch_acts).sum(axis=-1)             # [B, THW]
        cam = jax.nn.relu(cam).reshape(B, *thw)
        cam = np.asarray(cam, np.float32)
        # upsample to input resolution (per frame, nearest-in-time)
        maps = _resize_cam(cam, t_in, clips.shape[2], clips.shape[3])
        mn = maps.min(axis=(1, 2, 3), keepdims=True)
        mx = maps.max(axis=(1, 2, 3), keepdims=True)
        maps = (maps - mn) / np.maximum(mx - mn, 1e-8)
        return maps, logits

    def __call__(self, clips, labels=None, alpha: float = 0.5):
        """Returns overlaid uint8 videos [B, T, H, W, 3] + preds."""
        maps, preds = self.localization_map(clips, labels)
        frames = np.asarray(clips) * self.data_std + self.data_mean
        frames = np.clip(frames, 0, 1)
        heat = self.colormap(maps)[..., :3]
        out = alpha * heat + (1 - alpha) * frames
        return (out * 255).astype(np.uint8), preds


def _final_thw(arch, t_in: int) -> Tuple[int, int, int]:
    thw = [t_in if t_in == 1 else arch.patch_dims[0],
           arch.patch_dims[1], arch.patch_dims[2]]
    for spec in arch.blocks:
        if spec.stride_q:
            thw = [s // st for s, st in zip(thw, spec.stride_q)]
    return tuple(thw)


def _resize_cam(cam: np.ndarray, t: int, h: int, w: int) -> np.ndarray:
    from svit_tpu.data.transform import bilinear_resize

    B, cT, cH, cW = cam.shape
    t_idx = np.clip(
        np.round(np.linspace(0, cT - 1, t)).astype(int), 0, cT - 1
    )
    out = np.empty((B, t, h, w), np.float32)
    for b in range(B):
        frames = cam[b][t_idx][..., None]          # [t, cH, cW, 1]
        out[b] = bilinear_resize(frames, h, w)[..., 0]
    return out


def _find_intermediate(tree, name: str):
    """Find the block-output activation matching a perturb-point name.

    flax intermediates are keyed by module path (``blocks_15/__call__``) and
    hold the block's return value ``((grid, extras), thw)``; the perturb input
    equals the grid stream [B, T, H, W, C].
    """
    block = name.replace("_out", "")
    hits = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])
        elif isinstance(node, (tuple, list)):
            for v in node:
                walk(v, path)
        else:
            # exact block-output match: .../<block>/__call__ (not submodules)
            if (
                len(path) >= 2
                and path[-1] == "__call__"
                and path[-2] == block
                and hasattr(node, "ndim")
                and node.ndim == 5
            ):
                hits.append(node)

    walk(tree, [])
    if not hits:
        raise KeyError(f"intermediate for {name} not found")
    return hits[0]
