"""SViT: MViTv2 video trunk + per-frame object tokens + HAOG head.

TPU-native rebuild of reference ``slowfast/models/video_model_builder.py``
(class ``SViT``, ``SViTHead``).  Capability notes:

- Token layout: ``[cls | T_lat*H*W patch tokens | T_in*O object tokens]`` where
  ``T_lat`` is the latent frame count after the patch stride and ``T_in`` the
  *input* frame count — object tokens are per input frame
  (reference ``video_model_builder.py:354-363``: ``Tx`` from the raw clip).
- Videos get a learned temporal pos-embed added to object tokens; single-frame
  (image) inputs get zeros (reference ``:356-359``).
- The block schedule (dim/head multipliers, Q/KV pool strides incl. adaptive
  KV-stride propagation) follows reference ``:133-179`` exactly, computed
  statically in ``SViTArch.from_cfg``.
- The head splits ``[cls | obj]``, projects the cls token to logits and the
  object tokens to HAOG predictions (reference ``:507-551``).  The reference's
  ``safety_loss`` / ``sum(p)*0`` idioms are DDP-bucketing artifacts with no
  semantic content and are intentionally absent.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from svit_tpu.models.attention import MultiScaleBlock
from svit_tpu.models.common import LayerNorm
from svit_tpu.models.stem import PatchEmbed

Triple = Tuple[int, int, int]


def round_width(width, multiplier, min_width=1, divisor=1):
    """MViT channel rounding (reference ``models/utils.py:16-29``)."""
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    dim: int
    dim_out: int
    num_heads: int
    input_size: Triple
    kernel_q: Tuple[int, ...]
    kernel_kv: Tuple[int, ...]
    stride_q: Tuple[int, ...]
    stride_kv: Tuple[int, ...]
    drop_path: float


@dataclasses.dataclass(frozen=True)
class SViTArch:
    """Static architecture derived from a config (hashable, jit-friendly)."""

    num_frames: int              # input frames (16)
    crop_size: int
    in_channels: int
    embed_dim: int
    depth: int
    num_obj_per_frame: int       # SVIT.O
    num_classes: Union[int, Tuple[Tuple[str, int], ...]]
    patch_kernel: Triple
    patch_stride: Triple
    patch_padding: Triple
    patch_dims: Triple           # latent (T, H, W)
    blocks: Tuple[BlockSpec, ...]
    final_dim: int
    mlp_ratio: float
    qkv_bias: bool
    mode: str
    cls_embed_on: bool
    use_abs_pos: bool
    sep_pos_embed: bool
    rel_pos_spatial: bool
    rel_pos_temporal: bool
    rel_pos_zero_init: bool
    residual_pooling: bool
    dim_mul_in_att: bool
    separate_qkv: bool
    norm_stem: bool
    drop_rate: float             # MVIT.DROPOUT_RATE
    head_dropout_rate: float     # MODEL.DROPOUT_RATE
    head_act: str
    forward_video_frames: bool
    remat: bool = False

    @classmethod
    def from_cfg(cls, cfg) -> "SViTArch":
        spatial = cfg.DATA.TRAIN_CROP_SIZE
        assert cfg.DATA.TRAIN_CROP_SIZE == cfg.DATA.TEST_CROP_SIZE
        temporal = cfg.DATA.NUM_FRAMES
        depth = cfg.MVIT.DEPTH
        embed_dim = cfg.MVIT.EMBED_DIM
        num_heads = cfg.MVIT.NUM_HEADS

        patch_stride = tuple(cfg.MVIT.PATCH_STRIDE)
        patch_dims = tuple(
            d // s
            for d, s in zip((temporal, spatial, spatial), patch_stride)
        )

        dim_mul = np.ones(depth + 1)
        head_mul = np.ones(depth + 1)
        for i, m in cfg.MVIT.DIM_MUL:
            dim_mul[i] = m
        for i, m in cfg.MVIT.HEAD_MUL:
            head_mul[i] = m

        pool_q = [()] * depth
        pool_kv = [()] * depth
        stride_q = [()] * depth
        stride_kv = [()] * depth
        for entry in cfg.MVIT.POOL_Q_STRIDE:
            i = entry[0]
            stride_q[i] = tuple(entry[1:])
            if cfg.MVIT.POOL_KVQ_KERNEL is not None:
                pool_q[i] = tuple(cfg.MVIT.POOL_KVQ_KERNEL)
            else:
                pool_q[i] = tuple(s + 1 if s > 1 else s for s in entry[1:])

        # Adaptive KV stride: start from POOL_KV_STRIDE_ADAPTIVE and divide by
        # each block's q stride as resolution shrinks (reference :156-165).
        pool_kv_stride = cfg.MVIT.POOL_KV_STRIDE
        if cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE is not None:
            _stride_kv = list(cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE)
            pool_kv_stride = []
            for i in range(depth):
                if len(stride_q[i]) > 0:
                    _stride_kv = [
                        max(_stride_kv[d] // stride_q[i][d], 1)
                        for d in range(len(_stride_kv))
                    ]
                pool_kv_stride.append([i] + _stride_kv)
        if pool_kv_stride:
            for entry in pool_kv_stride:
                i = entry[0]
                stride_kv[i] = tuple(entry[1:])
                if cfg.MVIT.POOL_KVQ_KERNEL is not None:
                    pool_kv[i] = tuple(cfg.MVIT.POOL_KVQ_KERNEL)
                else:
                    pool_kv[i] = tuple(
                        s + 1 if s > 1 else s for s in entry[1:]
                    )

        dpr = np.linspace(0, cfg.MVIT.DROPPATH_RATE, depth)

        blocks = []
        input_size = list(patch_dims)
        dim = embed_dim
        for i in range(depth):
            num_heads = round_width(num_heads, head_mul[i])
            if cfg.MVIT.DIM_MUL_IN_ATT:
                dim_out = round_width(
                    dim, dim_mul[i], divisor=round_width(num_heads, head_mul[i])
                )
            else:
                dim_out = round_width(
                    dim,
                    dim_mul[i + 1],
                    divisor=round_width(num_heads, head_mul[i + 1]),
                )
            blocks.append(
                BlockSpec(
                    dim=dim,
                    dim_out=dim_out,
                    num_heads=num_heads,
                    input_size=tuple(input_size),
                    kernel_q=pool_q[i],
                    kernel_kv=pool_kv[i],
                    stride_q=stride_q[i],
                    stride_kv=stride_kv[i],
                    drop_path=float(dpr[i]),
                )
            )
            if len(stride_q[i]) > 0:
                input_size = [
                    size // s for size, s in zip(input_size, stride_q[i])
                ]
            dim = dim_out

        num_classes = cfg.MODEL.NUM_CLASSES
        if cfg.TRAIN.DATASET == "epickitchens":
            num_classes = (("verb", 97), ("noun", 300))

        return cls(
            num_frames=temporal,
            crop_size=spatial,
            in_channels=cfg.DATA.INPUT_CHANNEL_NUM[0],
            embed_dim=embed_dim,
            depth=depth,
            num_obj_per_frame=cfg.SVIT.O,
            num_classes=num_classes,
            patch_kernel=tuple(cfg.MVIT.PATCH_KERNEL),
            patch_stride=patch_stride,
            patch_padding=tuple(cfg.MVIT.PATCH_PADDING),
            patch_dims=patch_dims,
            blocks=tuple(blocks),
            final_dim=dim,
            mlp_ratio=cfg.MVIT.MLP_RATIO,
            qkv_bias=cfg.MVIT.QKV_BIAS,
            mode=cfg.MVIT.MODE,
            cls_embed_on=cfg.MVIT.CLS_EMBED_ON,
            use_abs_pos=cfg.MVIT.USE_ABS_POS,
            sep_pos_embed=cfg.MVIT.SEP_POS_EMBED,
            rel_pos_spatial=cfg.MVIT.REL_POS_SPATIAL,
            rel_pos_temporal=cfg.MVIT.REL_POS_TEMPORAL,
            rel_pos_zero_init=cfg.MVIT.REL_POS_ZERO_INIT,
            residual_pooling=cfg.MVIT.RESIDUAL_POOLING,
            dim_mul_in_att=cfg.MVIT.DIM_MUL_IN_ATT,
            separate_qkv=cfg.MVIT.SEPARATE_QKV,
            norm_stem=cfg.MVIT.NORM_STEM,
            drop_rate=cfg.MVIT.DROPOUT_RATE,
            head_dropout_rate=cfg.MODEL.DROPOUT_RATE,
            head_act=cfg.MODEL.HEAD_ACT,
            forward_video_frames=cfg.TRAIN.FORWARD_VIDEO_FRAMES,
            remat=cfg.TPU.REMAT,
        )


class SViTHead(nn.Module):
    """Classification + HAOG head over [cls | object] tokens."""

    arch: SViTArch
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_in: int, deterministic: bool = True):
        arch = self.arch
        extra_preds = {}
        if arch.head_dropout_rate > 0.0:
            x = nn.Dropout(arch.head_dropout_rate)(x, deterministic=deterministic)
        B = x.shape[0]
        cls_tok, xobj = x[:, 0], x[:, 1:]
        obj_desc = xobj.reshape(B, t_in, -1, xobj.shape[-1])
        extra_preds["obj_desc"] = obj_desc

        # Classification projection(s).
        nc = arch.num_classes
        if isinstance(nc, tuple):  # multitask (e.g. EPIC-Kitchens verb/noun)
            logits = {}
            raw = {}
            for name, n in nc:
                out = nn.Dense(n, dtype=self.dtype, name=f"projection_{name}")(cls_tok)
                raw[name] = out
                if deterministic:
                    out = _head_act(out, arch.head_act)
                logits[name] = out
            extra_preds.update(logits)
            # per-task pre-activation logits for stable eval losses (same
            # rationale as the single-task raw_logits below)
            extra_preds["raw_logits"] = raw
        elif nc == 0:
            logits = jnp.zeros(cls_tok.shape[:-1] + (0,), dtype=cls_tok.dtype)
        else:
            logits = nn.Dense(nc, dtype=self.dtype, name="projection")(cls_tok)
            # Pre-activation logits for numerically stable eval losses
            # (log_softmax on logits instead of log(softmax(logits))).
            extra_preds["raw_logits"] = logits
            if deterministic:
                logits = _head_act(logits, arch.head_act)

        # HAOG predictions over object tokens (reference :534-546).
        boxes = nn.sigmoid(
            nn.Dense(4, dtype=self.dtype, name="boxes_mlp")(obj_desc)
        )
        boxes_bce = nn.Dense(1, dtype=self.dtype, name="boxes_bce_mlp")(obj_desc)
        contact = nn.Dense(5, dtype=self.dtype, name="contact_mlp")(
            obj_desc[:, :, :2]
        )
        if deterministic:
            boxes_bce = nn.sigmoid(boxes_bce)
            contact = nn.softmax(contact, axis=-1)

        extra_preds["pred_bboxes"] = jnp.concatenate([boxes_bce, boxes], axis=-1)
        extra_preds["pred_contact_state"] = contact
        return logits, extra_preds


def _head_act(x, act: str):
    if act == "softmax":
        return nn.softmax(x, axis=-1)
    if act == "sigmoid":
        return nn.sigmoid(x)
    raise NotImplementedError(f"head activation {act}")


class SViT(nn.Module):
    """Full SViT model.  Input: channels-last clip [B, T, H, W, C].

    ``T == 1`` is the image (single-frame) path; ``T > 1`` the video path.
    Returns ``(logits, extra_preds)``.
    """

    arch: SViTArch
    dtype: jnp.dtype = jnp.float32
    # Route attention through the fused Pallas kernel (TPU backends only).
    use_pallas: bool = False
    # Adds zero-valued flax 'perturbations' after each block so Grad-CAM can
    # read d(score)/d(activation) (see svit_tpu/visualization/gradcam.py).
    capture_gradcam: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        arch = self.arch
        B, t_in = x.shape[0], x.shape[1]
        is_video = t_in > 1

        x = x.astype(self.dtype)
        # NOTE (round-5 measurement): carrying the STEM to a 16-aligned
        # width (pixel-padding 224 -> 256 so the patch conv emits 64-wide)
        # was tried and REGRESSED the forward 210 -> 195 clips/s — the +14%
        # junk compute on the token-heaviest stage outweighs any reshape
        # savings there; in the full graph XLA does not pay gather-speed
        # relayouts for the 56-wide stem stream the way an isolated reshape
        # microbenchmark does.  The W-carry therefore starts at the first
        # strided pool output (ops/pallas_pool._carry_width).
        grid, (t_lat, H, W) = PatchEmbed(
            dim_out=arch.embed_dim,
            kernel=arch.patch_kernel,
            stride=arch.patch_stride,
            padding=arch.patch_padding,
            dtype=self.dtype,
            name="patch_embed",
        )(x)

        # Temporal pos-embed exists regardless of USE_ABS_POS — the object
        # tokens always consume it (reference :120-122).
        pos_embed_temporal = self.param(
            "pos_embed_temporal",
            nn.initializers.truncated_normal(0.02),
            (1, arch.num_frames, arch.embed_dim),
            jnp.float32,
        )

        cls_tok = None
        if arch.cls_embed_on:
            cls_token = self.param(
                "cls_token",
                nn.initializers.truncated_normal(0.02),
                (1, 1, arch.embed_dim),
                jnp.float32,
            )
            cls_tok = jnp.broadcast_to(
                cls_token, (B, 1, arch.embed_dim)
            ).astype(grid.dtype)

        if arch.use_abs_pos:
            if not arch.sep_pos_embed:
                raise NotImplementedError(
                    "Non-separable abs pos-embed is dead code in the reference "
                    "(video_model_builder.py:351 asserts False)."
                )
            pos_embed_spatial = self.param(
                "pos_embed_spatial",
                nn.initializers.truncated_normal(0.02),
                (1, arch.patch_dims[1] * arch.patch_dims[2], arch.embed_dim),
                jnp.float32,
            )
            pos = pos_embed_spatial.reshape(
                1, 1, arch.patch_dims[1], arch.patch_dims[2], arch.embed_dim
            )
            if is_video:
                pos = pos + pos_embed_temporal[:, :t_lat, None, None, :]
            grid = grid + pos.astype(grid.dtype)
            if arch.cls_embed_on:
                pos_embed_class = self.param(
                    "pos_embed_class",
                    nn.initializers.truncated_normal(0.02),
                    (1, 1, arch.embed_dim),
                    jnp.float32,
                )
                cls_tok = cls_tok + pos_embed_class.astype(cls_tok.dtype)

        # Object tokens: O per *input* frame (reference :354-363).
        object_queries = self.param(
            "object_queries",
            nn.initializers.truncated_normal(0.02),
            (1, arch.num_obj_per_frame, arch.embed_dim),
            jnp.float32,
        )
        x_obj = jnp.broadcast_to(
            object_queries[:, None],
            (B, t_in, arch.num_obj_per_frame, arch.embed_dim),
        )
        if is_video:
            x_obj = x_obj + pos_embed_temporal[:, :t_in, None, :]
        x_obj = x_obj.reshape(B, t_in * arch.num_obj_per_frame, arch.embed_dim)
        num_obj = x_obj.shape[1]

        # Extras stream: [cls? | O*T object tokens] — tiny next to the grid.
        if arch.cls_embed_on:
            extras = jnp.concatenate([cls_tok, x_obj.astype(grid.dtype)], axis=1)
        else:
            extras = x_obj.astype(grid.dtype)

        if arch.drop_rate > 0.0:
            stem_drop = nn.Dropout(arch.drop_rate)
            grid = stem_drop(grid, deterministic=deterministic)
            extras = stem_drop(extras, deterministic=deterministic)
        if arch.norm_stem:
            norm_stem = LayerNorm(dtype=self.dtype, name="norm_stem")
            grid = norm_stem(grid)
            extras = norm_stem(extras)

        thw = (t_lat, H, W)
        streams = (grid, extras)
        for i, spec in enumerate(arch.blocks):
            block_cls = MultiScaleBlock
            if arch.remat:
                block_cls = nn.remat(
                    MultiScaleBlock, static_argnums=(1, 2), prevent_cse=False
                )
            streams, thw = block_cls(
                dim=spec.dim,
                dim_out=spec.dim_out,
                num_heads=spec.num_heads,
                input_size=spec.input_size,
                mlp_ratio=arch.mlp_ratio,
                qkv_bias=arch.qkv_bias,
                drop_rate=arch.drop_rate,
                drop_path=spec.drop_path,
                kernel_q=spec.kernel_q,
                kernel_kv=spec.kernel_kv,
                stride_q=spec.stride_q,
                stride_kv=spec.stride_kv,
                mode=arch.mode,
                has_cls=arch.cls_embed_on,
                rel_pos_spatial=arch.rel_pos_spatial,
                rel_pos_temporal=arch.rel_pos_temporal,
                rel_pos_zero_init=arch.rel_pos_zero_init,
                residual_pooling=arch.residual_pooling,
                dim_mul_in_att=arch.dim_mul_in_att,
                separate_qkv=arch.separate_qkv,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(streams, thw, deterministic)
            if self.capture_gradcam:
                g, e = streams
                streams = (self.perturb(f"blocks_{i}_out", g), e)

        grid, extras = streams
        norm = LayerNorm(dtype=self.dtype, name="norm")
        if arch.cls_embed_on:
            # LN is per-token: norming only [cls | obj] equals slicing the
            # normed full sequence (reference :375-384) — the final patch-grid
            # norm feeds nothing and is skipped.
            head_in = norm(extras)
        else:
            if grid.shape[3] > thw[2]:
                # W8-carried grid: junk columns must not enter the mean
                grid = grid[:, :, :, : thw[2]]
            gN = norm(grid)
            cls_tok = gN.reshape(B, -1, gN.shape[-1]).mean(axis=1, keepdims=True)
            head_in = jnp.concatenate([cls_tok, norm(extras)], axis=1)

        return SViTHead(arch=arch, dtype=self.dtype, name="head")(
            head_in, t_in, deterministic=deterministic
        )
