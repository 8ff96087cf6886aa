"""PyTorch ``.pyth`` checkpoint -> JAX pytree converter.

Lossless conversion of reference-released SViT checkpoints
(reference ``slowfast/utils/checkpoint.py`` save format: a dict with
``model_state`` holding the torch ``state_dict``).  Handles:

- linear weights: ``[out, in]`` -> ``[in, out]`` transpose;
- Conv3d patch stem: ``[out, in, kT, kH, kW]`` -> ``[kT, kH, kW, in, out]``;
- depthwise pooling convs: ``[C, 1, kT, kH, kW]`` -> ``[kT, kH, kW, 1, C]``;
- LayerNorm weight/bias -> scale/bias;
- fused-qkv vs separate q/k/v (the reference also emits split keys when
  loading into separate-QKV models, checkpoint.py:511-548);
- 2D->3D patch-kernel inflation for timm-style image pretrains
  (reference ``models/utils.py:87-193``, ``checkpoint.py:159-195``).

Only torch.load and numpy are used here — torch never touches the compute
path, it is a host-side conversion tool.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def load_torch_state(
    path: str, clear_patterns=(), replace_patterns=()
) -> Dict[str, np.ndarray]:
    """Read a ``.pyth`` checkpoint into {name: np.ndarray}.

    ``clear_patterns`` strips prefixes/substrings from names and
    ``replace_patterns`` rewrites (old, new) pairs — the reference's
    ``TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN`` / ``_REPLACE_NAME_PATTERN``
    (checkpoint.py:323-352).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("model_state", blob.get("state_dict", blob))
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        for pat in clear_patterns:
            k = k.replace(pat, "")
        for old, new in replace_patterns:
            k = k.replace(old, new)
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _set(tree: dict, path: list, value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def flip_input_channels(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reverse the patch-stem's input-channel axis (BGR <-> RGB), in torch
    layout [out, in, (kT,) kH, kW].

    The reference's data pipeline feeds cv2-decoded frames and never swaps
    the channel order (``slowfast/datasets/utils.py:20-48`` cv2.imdecode ->
    BGR straight into normalize), so released checkpoints expect BGR input.
    svit_tpu's pipeline is RGB-native; flipping the stem kernel's in-channel
    axis makes ``conv(rgb, flipped_w) == conv(bgr, w)`` exactly.  Valid
    whenever DATA.MEAN/STD are channel-uniform (they are in every shipped
    recipe: 0.45/0.225), since normalization then commutes with the flip.
    """
    out = dict(state)
    w = out["patch_embed.proj.weight"]
    out["patch_embed.proj.weight"] = np.ascontiguousarray(w[:, ::-1])
    return out


def torch_to_flax(state: Dict[str, np.ndarray], separate_qkv: bool = False) -> dict:
    """Map a torch SViT state_dict onto the svit_tpu flax param tree."""
    params: dict = {}
    consumed = set()

    def take(name):
        consumed.add(name)
        return state[name]

    def linear(torch_prefix, flax_path):
        w = take(f"{torch_prefix}.weight")
        _set(params, flax_path + ["kernel"], np.ascontiguousarray(w.T))
        if f"{torch_prefix}.bias" in state:
            _set(params, flax_path + ["bias"], take(f"{torch_prefix}.bias"))

    def layernorm(torch_prefix, flax_path):
        _set(params, flax_path + ["scale"], take(f"{torch_prefix}.weight"))
        _set(params, flax_path + ["bias"], take(f"{torch_prefix}.bias"))

    # Stem: Conv3d OIDHW -> DHWIO.
    w = take("patch_embed.proj.weight")
    if w.ndim == 4:  # 2D image pretrain: inflate over T (models/utils.py:87-103)
        raise ValueError(
            "2D patch kernel found; inflate with inflate_patch_kernel() first"
        )
    _set(
        params,
        ["patch_embed", "proj", "kernel"],
        np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0)),
    )
    _set(params, ["patch_embed", "proj", "bias"], take("patch_embed.proj.bias"))

    for name in ("cls_token", "pos_embed_temporal", "object_queries"):
        if name in state:
            _set(params, [name], take(name))
    for name in ("pos_embed_spatial", "pos_embed_class", "pos_embed"):
        if name in state:
            _set(params, [name], take(name))

    # Blocks.
    block_ids = sorted(
        {
            int(m.group(1))
            for k in state
            if (m := re.match(r"blocks\.(\d+)\.", k))
        }
    )
    for i in block_ids:
        tp = f"blocks.{i}"
        fp = [f"blocks_{i}"]
        layernorm(f"{tp}.norm1", fp + ["norm1"])
        layernorm(f"{tp}.norm2", fp + ["norm2"])
        if f"{tp}.attn.qkv.weight" in state and not separate_qkv:
            linear(f"{tp}.attn.qkv", fp + ["attn", "qkv"])
        elif separate_qkv and f"{tp}.attn.q.weight" in state:
            for n in ("q", "k", "v"):
                linear(f"{tp}.attn.{n}", fp + ["attn", n])
        elif separate_qkv and f"{tp}.attn.qkv.weight" in state:
            # Split fused qkv (reference checkpoint.py:582-594).
            w3 = take(f"{tp}.attn.qkv.weight")
            b3 = take(f"{tp}.attn.qkv.bias") if f"{tp}.attn.qkv.bias" in state else None
            d = w3.shape[0] // 3
            for j, n in enumerate(("q", "k", "v")):
                _set(params, fp + ["attn", n, "kernel"],
                     np.ascontiguousarray(w3[j * d:(j + 1) * d].T))
                if b3 is not None:
                    _set(params, fp + ["attn", n, "bias"], b3[j * d:(j + 1) * d])
        linear(f"{tp}.attn.proj", fp + ["attn", "proj"])
        for path_name in ("q", "k", "v"):
            pk = f"{tp}.attn.pool_{path_name}.weight"
            if pk in state:
                w = take(pk)  # [C, 1, kT, kH, kW]
                _set(
                    params,
                    fp + ["attn", f"pool_{path_name}", "pool_kernel"],
                    np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0)),
                )
            nk = f"{tp}.attn.norm_{path_name}.weight"
            if nk in state:
                layernorm(
                    f"{tp}.attn.norm_{path_name}",
                    fp + ["attn", f"pool_{path_name}", "norm"],
                )
        for rp in ("rel_pos_h", "rel_pos_w", "rel_pos_t"):
            if f"{tp}.attn.{rp}" in state:
                _set(params, fp + ["attn", rp], take(f"{tp}.attn.{rp}"))
        linear(f"{tp}.mlp.fc1", fp + ["mlp", "fc1"])
        linear(f"{tp}.mlp.fc2", fp + ["mlp", "fc2"])
        if f"{tp}.proj.weight" in state:
            linear(f"{tp}.proj", fp + ["proj"])

    layernorm("norm", ["norm"])

    # Head.
    if "head.projection.weight" in state:
        linear("head.projection", ["head", "projection"])
    for k in list(state):
        m = re.match(r"head\.projection\.([^.]+)\.weight", k)
        if m:  # multitask ModuleDict
            linear(f"head.projection.{m.group(1)}", ["head", f"projection_{m.group(1)}"])
    linear("head.boxes_mlp.0", ["head", "boxes_mlp"])
    linear("head.boxes_bce_mlp", ["head", "boxes_bce_mlp"])
    linear("head.contact_mlp", ["head", "contact_mlp"])

    leftover = sorted(set(state) - consumed)
    if leftover:
        import logging

        logging.getLogger("svit_tpu").warning(
            "converter: %d unconsumed torch keys (e.g. %s)",
            len(leftover),
            leftover[:5],
        )
    return {"params": params}


def inflate_patch_kernel(w2d: np.ndarray, t: int) -> np.ndarray:
    """Inflate a 2D patch kernel [out, in, kH, kW] over time (divide by t),
    reference ``checkpoint.py:159-195`` / ``models/utils.py:100-118``."""
    w = np.repeat(w2d[:, :, None, :, :], t, axis=2) / float(t)
    return w


def _resize_nearest(x: np.ndarray, size: int, axis: int) -> np.ndarray:
    """torch F.interpolate(mode='nearest') along one axis."""
    src = x.shape[axis]
    if src == size:
        return x
    idx = np.floor(np.arange(size) * src / size).astype(np.int64)
    return np.take(x, idx, axis=axis)


def load_timm_pretrained(
    path: str,
    num_patches: int,
    patch_kernel_t: int,
    patch_kernel_hw,
    num_classes: int,
) -> Dict[str, np.ndarray]:
    """timm-style image pretrain -> SViT state-dict (reference
    ``models/utils.py:87-193``, triggered by ``MODEL.LOAD_IN_PRETRAIN``).

    Rules: drop the classifier on class-count mismatch, nearest-resize the
    positional embedding to the new patch count, split ``pos_embed`` into
    ``pos_embed_class`` + ``pos_embed_spatial``, inflate the 2D patch kernel
    over time by repetition (the reference *expands* without dividing here,
    unlike the checkpoint-inflation path).
    """
    state = load_torch_state(path)

    cls_name = "head" if "head.weight" in state else "head.projection"
    w = state.get(f"{cls_name}.weight")
    if w is not None and w.shape[0] != num_classes:
        state.pop(f"{cls_name}.weight", None)
        state.pop(f"{cls_name}.bias", None)

    if "pos_embed" in state:
        pos = state["pos_embed"]  # [1, 1+P, C]
        if num_patches + 1 != pos.shape[1]:
            cls_pos = pos[:, :1]
            other = _resize_nearest(pos[:, 1:], num_patches, axis=1)
            pos = np.concatenate([cls_pos, other], axis=1)
        state["pos_embed_class"] = pos[:, :1]
        state["pos_embed_spatial"] = pos[:, 1:]
        del state["pos_embed"]

    w = state.get("patch_embed.proj.weight")
    if w is not None and w.ndim == 4:  # [out, in, kH, kW]
        w = _resize_nearest(w, patch_kernel_hw[0], axis=2)
        w = _resize_nearest(w, patch_kernel_hw[1], axis=3)
        w = np.repeat(w[:, :, None], patch_kernel_t, axis=2)
        state["patch_embed.proj.weight"] = w
    return state


def flax_to_torch(params: dict) -> Dict[str, np.ndarray]:
    """Inverse mapping (for checkpoint export back to the reference format)."""
    state: Dict[str, np.ndarray] = {}
    p = params.get("params", params)

    def put_linear(flax_node, torch_prefix):
        state[f"{torch_prefix}.weight"] = np.ascontiguousarray(
            np.asarray(flax_node["kernel"]).T
        )
        if "bias" in flax_node:
            state[f"{torch_prefix}.bias"] = np.asarray(flax_node["bias"])

    def put_ln(flax_node, torch_prefix):
        state[f"{torch_prefix}.weight"] = np.asarray(flax_node["scale"])
        state[f"{torch_prefix}.bias"] = np.asarray(flax_node["bias"])

    state["patch_embed.proj.weight"] = np.ascontiguousarray(
        np.asarray(p["patch_embed"]["proj"]["kernel"]).transpose(4, 3, 0, 1, 2)
    )
    state["patch_embed.proj.bias"] = np.asarray(p["patch_embed"]["proj"]["bias"])
    for name in ("cls_token", "pos_embed_temporal", "object_queries",
                 "pos_embed_spatial", "pos_embed_class", "pos_embed"):
        if name in p:
            state[name] = np.asarray(p[name])

    for key in sorted(k for k in p if k.startswith("blocks_")):
        i = int(key.split("_")[1])
        b = p[key]
        tp = f"blocks.{i}"
        put_ln(b["norm1"], f"{tp}.norm1")
        put_ln(b["norm2"], f"{tp}.norm2")
        a = b["attn"]
        for n in ("qkv", "q", "k", "v", "proj"):
            if n in a:
                put_linear(a[n], f"{tp}.attn.{n}")
        for n in ("q", "k", "v"):
            if f"pool_{n}" in a:
                pool = a[f"pool_{n}"]
                state[f"{tp}.attn.pool_{n}.weight"] = np.ascontiguousarray(
                    np.asarray(pool["pool_kernel"]).transpose(4, 3, 0, 1, 2)
                )
                if "norm" in pool:
                    put_ln(pool["norm"], f"{tp}.attn.norm_{n}")
        for rp in ("rel_pos_h", "rel_pos_w", "rel_pos_t"):
            if rp in a:
                state[f"{tp}.attn.{rp}"] = np.asarray(a[rp])
        put_linear(b["mlp"]["fc1"], f"{tp}.mlp.fc1")
        put_linear(b["mlp"]["fc2"], f"{tp}.mlp.fc2")
        if "proj" in b:
            put_linear(b["proj"], f"{tp}.proj")

    put_ln(p["norm"], "norm")
    h = p["head"]
    if "projection" in h:
        put_linear(h["projection"], "head.projection")
    for k in h:
        if k.startswith("projection_"):
            put_linear(h[k], f"head.projection.{k[len('projection_'):]}")
    put_linear(h["boxes_mlp"], "head.boxes_mlp.0")
    put_linear(h["boxes_bce_mlp"], "head.boxes_bce_mlp")
    put_linear(h["contact_mlp"], "head.contact_mlp")
    return state
