"""Device-side batched training augmentation (jittable, opt-in).

TPU-first alternative to the host PIL pipeline: the whole augmentation for a
batch of clips runs inside jit on device —

1. a per-clip geometric plan (inception crop + flip + shear + translate +
   rotate) composed into ONE 2D affine matrix, applied by a single bilinear
   resample pass to all frames of the clip;
2. a photometric plan (brightness / contrast / saturation / solarize-add)
   with per-op apply probabilities, replayed identically across the clip's
   frames (the per-clip-replay semantics of the host RandAugment);
3. normalization and per-frame random erasing (pixel-noise fill).

This trades the host pipeline's exact PIL op set for a policy with the same
structure and magnitudes that executes at memory bandwidth on the
accelerator; enable with ``TPU.DEVICE_AUG`` (default off — the host path
remains the parity reference).  Host then ships raw uint8 frames (4x less
host->device traffic than f32).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class DeviceAugConfig(NamedTuple):
    out_size: int = 224
    scale_min: float = 0.08
    scale_max: float = 1.0
    ratio_min: float = 0.75
    ratio_max: float = 4.0 / 3.0
    hflip_prob: float = 0.0          # ssv2: RANDOM_FLIP false
    magnitude: float = 7.0           # RandAugment m
    magnitude_std: float = 0.5
    op_prob: float = 0.5
    re_prob: float = 0.25            # random erasing
    mean: Tuple[float, float, float] = (0.45, 0.45, 0.45)
    std: Tuple[float, float, float] = (0.225, 0.225, 0.225)


def _affine_matrix(key, H, W, cfg: DeviceAugConfig):
    """Compose crop+flip+shear+translate+rotate into one output->input 2x3."""
    ks = jax.random.split(key, 8)
    S = cfg.out_size

    # inception-style crop box
    area = H * W * jax.random.uniform(ks[0], (), minval=cfg.scale_min, maxval=cfg.scale_max)
    log_ratio = jax.random.uniform(
        ks[1], (), minval=jnp.log(cfg.ratio_min), maxval=jnp.log(cfg.ratio_max)
    )
    aspect = jnp.exp(log_ratio)
    w = jnp.sqrt(area * aspect)
    h = jnp.sqrt(area / aspect)
    w = jnp.clip(w, 8.0, W)
    h = jnp.clip(h, 8.0, H)
    x0 = jax.random.uniform(ks[2], (), minval=0.0, maxval=1.0) * (W - w)
    y0 = jax.random.uniform(ks[3], (), minval=0.0, maxval=1.0) * (H - h)

    # base: output (x,y) -> input crop box
    sx = w / S
    sy = h / S

    # random geometric RandAugment terms (prob-gated, sign-symmetric)
    def draw(k, scale):
        kk = jax.random.split(k, 3)
        mag = cfg.magnitude + cfg.magnitude_std * jax.random.normal(kk[0], ())
        mag = jnp.clip(mag, 0.0, 10.0) / 10.0
        v = mag * scale * jnp.where(jax.random.uniform(kk[1], ()) > 0.5, 1.0, -1.0)
        return jnp.where(jax.random.uniform(kk[2], ()) <= cfg.op_prob, v, 0.0)

    shear_x = draw(ks[4], 0.3)
    shear_y = draw(ks[5], 0.3)
    rot = draw(ks[6], 30.0) * jnp.pi / 180.0

    flip = jax.random.uniform(ks[7], ()) < cfg.hflip_prob

    c, s = jnp.cos(rot), jnp.sin(rot)
    # rotation+shear around the output center, then scale into the crop box.
    # Matrix maps CENTERED continuous output coords -> input continuous
    # coords relative to the crop center (half-pixel convention applied in
    # the warp itself).
    m00 = c + shear_x * s
    m01 = shear_x * c - s
    m10 = s + shear_y * c
    m11 = c - shear_y * s
    sign = jnp.where(flip, -1.0, 1.0)

    a = sx * m00 * sign
    b = sx * m01
    d = sy * m10 * sign
    e = sy * m11
    tx = x0 + w / 2.0   # crop-box center (continuous coords)
    ty = y0 + h / 2.0
    return jnp.stack([a, b, tx, d, e, ty])


def _warp_clip(frames, M, out_size):
    """Bilinear resample all frames of one clip through one affine.

    frames: [T, H, W, C] float; M: [6]."""
    T, H, W, C = frames.shape
    S = out_size
    # half-pixel convention: pixel centers at i+0.5, output centered at S/2
    ys = jnp.arange(S, dtype=jnp.float32) + 0.5 - S / 2.0
    xs = jnp.arange(S, dtype=jnp.float32) + 0.5 - S / 2.0
    gx = M[0] * xs[None, :] + M[1] * ys[:, None] + M[2] - 0.5
    gy = M[3] * xs[None, :] + M[4] * ys[:, None] + M[5] - 0.5

    x0 = jnp.clip(jnp.floor(gx), 0, W - 1)
    y0 = jnp.clip(jnp.floor(gy), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = jnp.clip(gx - x0, 0.0, 1.0)
    wy = jnp.clip(gy - y0, 0.0, 1.0)
    x0i, x1i, y0i, y1i = (v.astype(jnp.int32) for v in (x0, x1, y0, y1))

    def gather(f):  # [H, W, C] -> [S, S, C]
        p00 = f[y0i, x0i]
        p01 = f[y0i, x1i]
        p10 = f[y1i, x0i]
        p11 = f[y1i, x1i]
        top = p00 * (1 - wx)[..., None] + p01 * wx[..., None]
        bot = p10 * (1 - wx)[..., None] + p11 * wx[..., None]
        return top * (1 - wy)[..., None] + bot * wy[..., None]

    return jax.vmap(gather)(frames)


def _photometric(key, clip, cfg: DeviceAugConfig):
    """Brightness/contrast/saturation/solarize-add, prob-gated per clip.

    clip: [T, S, S, C] in [0, 1]."""
    ks = jax.random.split(key, 8)

    def factor(k):
        kk = jax.random.split(k, 3)
        mag = jnp.clip(
            cfg.magnitude + cfg.magnitude_std * jax.random.normal(kk[0], ()),
            0.0, 10.0,
        ) / 10.0
        f = 1.0 + mag * 0.9 * jnp.where(jax.random.uniform(kk[1], ()) > 0.5, 1.0, -1.0)
        return jnp.where(jax.random.uniform(kk[2], ()) <= cfg.op_prob, f, 1.0)

    # brightness: x * f
    clip = clip * factor(ks[0])
    # contrast: blend with mean luminance
    f = factor(ks[1])
    lum = clip.mean(axis=(-1, -2, -3), keepdims=True)
    clip = lum + (clip - lum) * f
    # saturation: blend with per-pixel gray
    f = factor(ks[2])
    gray = clip.mean(axis=-1, keepdims=True)
    clip = gray + (clip - gray) * f
    # solarize-add: add to dark pixels
    amt = jnp.clip(
        cfg.magnitude + cfg.magnitude_std * jax.random.normal(ks[3], ()), 0, 10
    ) / 10.0 * (110.0 / 255.0)
    apply = jax.random.uniform(ks[4], ()) <= cfg.op_prob
    clip = jnp.where(apply & (clip < 0.5), jnp.minimum(clip + amt, 1.0), clip)
    return jnp.clip(clip, 0.0, 1.0)


def _erase(key, clip, cfg: DeviceAugConfig):
    """Per-frame pixel-mode random erasing via a static-shape mask."""
    T, S, _, C = clip.shape

    def one(k, frame):
        ks = jax.random.split(k, 6)
        do = jax.random.uniform(ks[0], ()) < cfg.re_prob
        area = jax.random.uniform(ks[1], (), minval=0.02, maxval=1 / 3) * S * S
        log_aspect = jax.random.uniform(
            ks[2], (), minval=jnp.log(0.3), maxval=jnp.log(1 / 0.3)
        )
        aspect = jnp.exp(log_aspect)
        h = jnp.clip(jnp.sqrt(area * aspect), 1, S - 1)
        w = jnp.clip(jnp.sqrt(area / aspect), 1, S - 1)
        top = jax.random.uniform(ks[3], ()) * (S - h)
        left = jax.random.uniform(ks[4], ()) * (S - w)
        yy = jnp.arange(S, dtype=jnp.float32)[:, None]
        xx = jnp.arange(S, dtype=jnp.float32)[None, :]
        mask = (
            (yy >= top) & (yy < top + h) & (xx >= left) & (xx < left + w)
        )[..., None]
        noise = jax.random.normal(ks[5], frame.shape, frame.dtype)
        return jnp.where(do & mask, noise, frame)

    return jax.vmap(one)(jax.random.split(key, T), clip)


@functools.partial(jax.jit, static_argnums=(2,))
def device_augment(clips_u8, key, cfg: DeviceAugConfig):
    """clips_u8: [B, T, H, W, C] uint8 -> augmented normalized f32 [B, T, S, S, C]."""
    B, T, H, W, C = clips_u8.shape
    keys = jax.random.split(key, B * 3).reshape(B, 3, 2)

    def one(clip_u8, ks):
        clip = clip_u8.astype(jnp.float32) / 255.0
        M = _affine_matrix(ks[0], H, W, cfg)
        clip = _warp_clip(clip, M, cfg.out_size)
        clip = _photometric(ks[1], clip, cfg)
        mean = jnp.asarray(cfg.mean, jnp.float32)
        std = jnp.asarray(cfg.std, jnp.float32)
        clip = (clip - mean) / std
        return _erase(ks[2], clip, cfg)

    return jax.vmap(one)(clips_u8, keys)


def config_from_cfg(cfg) -> DeviceAugConfig:
    scl = cfg.DATA.TRAIN_JITTER_SCALES_RELATIVE or [0.08, 1.0]
    asp = cfg.DATA.TRAIN_JITTER_ASPECT_RELATIVE or [0.75, 4.0 / 3.0]
    # parse magnitude from the AA string
    mag, mstd = 9.0, 0.5
    for part in cfg.AUG.AA_TYPE.split("-")[1:]:
        if part.startswith("mstd"):
            mstd = float(part[4:])
        elif part.startswith("m") and part[1:].replace(".", "").isdigit():
            mag = float(part[1:])
    return DeviceAugConfig(
        out_size=cfg.DATA.TRAIN_CROP_SIZE,
        scale_min=scl[0], scale_max=scl[1],
        ratio_min=asp[0], ratio_max=asp[1],
        hflip_prob=0.5 if cfg.DATA.RANDOM_FLIP else 0.0,
        magnitude=mag, magnitude_std=mstd,
        re_prob=cfg.AUG.RE_PROB,
        mean=tuple(cfg.DATA.MEAN), std=tuple(cfg.DATA.STD),
    )


# ---------------------------------------------------------------------------
# Image-branch (HAOG) augmentation: the same affine plan applied to the frame
# AND its box annotations (the host analogue is the box-aware RandAugment,
# reference ``slowfast/datasets/ssv2_MF/autoaugment.py:449-507``).  Contact
# states are matched on host from the pre-augmentation boxes (reference
# ``ssv2_frames.py`` calls match_haog before augmenting) and pass through.
# ---------------------------------------------------------------------------


def _transform_boxes(M, boxes, out_size):
    """Map xyxy boxes (input-pixel coords) through the INVERSE of the warp
    affine into output coords; envelope of the 4 corners, clipped to [0, S].

    M is the output->input matrix from :func:`_affine_matrix` over CENTERED
    output coordinates; boxes live in continuous input pixel coordinates.
    """
    a, b, tx, d, e, ty = (M[i] for i in range(6))
    det = a * e - b * d
    ia, ib = e / det, -b / det
    ic, ie = -d / det, a / det
    half = out_size / 2.0

    corners = jnp.stack(
        [
            boxes[..., jnp.array([0, 1])],
            boxes[..., jnp.array([2, 1])],
            boxes[..., jnp.array([0, 3])],
            boxes[..., jnp.array([2, 3])],
        ],
        axis=-2,
    )                                   # [..., 4corners, 2] (x, y)
    gx = corners[..., 0] - tx
    gy = corners[..., 1] - ty
    xo = ia * gx + ib * gy + half
    yo = ic * gx + ie * gy + half
    x1 = jnp.clip(jnp.min(xo, axis=-1), 0.0, out_size)
    y1 = jnp.clip(jnp.min(yo, axis=-1), 0.0, out_size)
    x2 = jnp.clip(jnp.max(xo, axis=-1), 0.0, out_size)
    y2 = jnp.clip(jnp.max(yo, axis=-1), 0.0, out_size)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def _boxes_to_haog(boxes_xyxy, out_size, was_zero):
    """Normalize to [0,1] cxcywh and zero degenerate/originally-empty boxes
    (host analogue: renormalize -> cxcywh -> zero_empty_boxes)."""
    bn = boxes_xyxy / out_size
    x1, y1, x2, y2 = (bn[..., i] for i in range(4))
    cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
    w, h = x2 - x1, y2 - y1
    cxcywh = jnp.stack([cx, cy, w, h], axis=-1)
    degenerate = (w <= 0.0) | (h <= 0.0) | was_zero
    return jnp.where(degenerate[..., None], 0.0, cxcywh)


@functools.partial(jax.jit, static_argnums=(3,))
def device_augment_image(frames_u8, boxes_xyxy, key, cfg: DeviceAugConfig):
    """Image-branch augmentation with paired box transform.

    frames_u8: [B, 1, H, W, C] uint8; boxes_xyxy: [B, 1, O, 4] in input
    pixel coords (all-zero rows = missing boxes).  Returns
    (frames f32 [B, 1, S, S, C] normalized, haog cxcywh [B, 1, O, 4]).
    """
    B, T, H, W, C = frames_u8.shape
    keys = jax.random.split(key, B * 3).reshape(B, 3, 2)

    def one(frame_u8, bx, ks):
        img = frame_u8.astype(jnp.float32) / 255.0
        M = _affine_matrix(ks[0], H, W, cfg)
        img = _warp_clip(img, M, cfg.out_size)
        img = _photometric(ks[1], img, cfg)
        mean = jnp.asarray(cfg.mean, jnp.float32)
        std = jnp.asarray(cfg.std, jnp.float32)
        img = (img - mean) / std
        was_zero = jnp.all(bx == 0.0, axis=-1)
        haog = _boxes_to_haog(
            _transform_boxes(M, bx, cfg.out_size), cfg.out_size, was_zero
        )
        # erasing last — does not move boxes (host order: erase after crops)
        img = _erase(ks[2], img, cfg)
        return img, haog

    return jax.vmap(one)(frames_u8, boxes_xyxy, keys)
