"""Device-side augmentation tests (jit on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svit_tpu.data.device_aug import (
    DeviceAugConfig,
    config_from_cfg,
    device_augment,
)


def _clips(B=2, T=3, H=60, W=80, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randint(0, 255, (B, T, H, W, 3), dtype=np.uint8))


def test_shapes_and_finite():
    cfg = DeviceAugConfig(out_size=32)
    out = device_augment(_clips(), jax.random.PRNGKey(0), cfg)
    assert out.shape == (2, 3, 32, 32, 3)
    assert out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())


def test_deterministic_given_key():
    cfg = DeviceAugConfig(out_size=32)
    a = device_augment(_clips(), jax.random.PRNGKey(7), cfg)
    b = device_augment(_clips(), jax.random.PRNGKey(7), cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = device_augment(_clips(), jax.random.PRNGKey(8), cfg)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_no_aug_identity_crop():
    """With all op probabilities 0, full scale, and no erasing, the result is
    the normalized full-frame resize."""
    from svit_tpu.data.transform import bilinear_resize, tensor_normalize

    cfg = DeviceAugConfig(
        out_size=32, scale_min=1.0, scale_max=1.0, ratio_min=1.0,
        ratio_max=1.0, hflip_prob=0.0, op_prob=0.0, re_prob=0.0,
    )
    clips = _clips(B=1, T=2, H=64, W=64)
    out = np.asarray(device_augment(clips, jax.random.PRNGKey(0), cfg))

    ref = tensor_normalize(
        bilinear_resize(np.asarray(clips[0], np.float32), 32, 32),
        (0.45,) * 3, (0.225,) * 3,
    )
    # half-pixel vs corner sampling conventions differ slightly at edges;
    # interior must agree closely
    np.testing.assert_allclose(out[0][:, 2:-2, 2:-2], ref[:, 2:-2, 2:-2], atol=0.25)


def test_same_geometry_across_frames():
    """The geometric plan replays across the clip: augmenting identical
    frames gives identical outputs per frame."""
    base = _clips(B=1, T=1)[0, 0]
    clip = jnp.stack([base] * 4)[None]
    cfg = DeviceAugConfig(out_size=32, re_prob=0.0)
    out = np.asarray(device_augment(clip, jax.random.PRNGKey(3), cfg))[0]
    for t in range(1, 4):
        np.testing.assert_array_equal(out[0], out[t])


def test_config_from_cfg():
    from svit_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file("configs/ssv2.yaml")
    dc = config_from_cfg(cfg)
    assert dc.out_size == 224
    assert dc.magnitude == 7.0
    assert dc.magnitude_std == 0.5
    assert dc.hflip_prob == 0.0   # RANDOM_FLIP false in ssv2.yaml
    assert dc.scale_min == 0.08
    assert dc.re_prob == 0.25


# ---------------------------------------------------------------------------
# Image-branch (box-aware) augmentation
# ---------------------------------------------------------------------------


def _ident_cfg(S=32):
    return DeviceAugConfig(
        out_size=S, scale_min=1.0, scale_max=1.0, ratio_min=1.0,
        ratio_max=1.0, hflip_prob=0.0, op_prob=0.0, re_prob=0.0,
    )


def test_image_boxes_identity_scale():
    """With a pure full-frame crop, boxes scale exactly by S/H (square input)."""
    from svit_tpu.data.device_aug import device_augment_image

    H = W = 64
    S = 32
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (1, 1, H, W, 3), dtype=np.uint8))
    boxes = jnp.asarray([[[[8.0, 16.0, 40.0, 48.0],
                           [0.0, 0.0, 0.0, 0.0],       # missing box
                           [4.0, 4.0, 60.0, 60.0],
                           [20.0, 8.0, 28.0, 56.0]]]], jnp.float32)
    out, haog = device_augment_image(
        frames, boxes, jax.random.PRNGKey(0), _ident_cfg(S)
    )
    assert out.shape == (1, 1, S, S, 3)
    got = np.asarray(haog)[0, 0]
    # expected: normalized cxcywh of boxes / W
    bn = np.asarray(boxes)[0, 0] / W
    exp = np.stack([
        (bn[:, 0] + bn[:, 2]) / 2, (bn[:, 1] + bn[:, 3]) / 2,
        bn[:, 2] - bn[:, 0], bn[:, 3] - bn[:, 1],
    ], axis=-1)
    exp[1] = 0.0  # missing box stays zero
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_image_boxes_follow_flip():
    """A forced horizontal flip mirrors box x-coordinates."""
    from svit_tpu.data.device_aug import device_augment_image

    H = W = 64
    S = 64
    cfg = DeviceAugConfig(
        out_size=S, scale_min=1.0, scale_max=1.0, ratio_min=1.0,
        ratio_max=1.0, hflip_prob=1.0, op_prob=0.0, re_prob=0.0,
    )
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (1, 1, H, W, 3), dtype=np.uint8))
    boxes = jnp.asarray([[[[8.0, 16.0, 24.0, 48.0]] * 4]], jnp.float32)
    _, haog = device_augment_image(frames, boxes, jax.random.PRNGKey(0), cfg)
    got = np.asarray(haog)[0, 0, 0]
    # flipped cx = 1 - cx; cy, w, h unchanged
    np.testing.assert_allclose(got[0], 1.0 - (8 + 24) / 2 / W, atol=1e-5)
    np.testing.assert_allclose(got[1], (16 + 48) / 2 / H, atol=1e-5)
    np.testing.assert_allclose(got[2], 16 / W, atol=1e-5)
    np.testing.assert_allclose(got[3], 32 / H, atol=1e-5)


def test_image_boxes_degenerate_after_crop_zeroed():
    """A box entirely outside the crop collapses to the clipped edge and must
    be zeroed (host analogue: zero_empty_boxes after renormalize)."""
    from svit_tpu.data.device_aug import _affine_matrix  # noqa: F401
    from svit_tpu.data.device_aug import device_augment_image

    H = W = 64
    # crop the center quarter: scale 0.25 area with ratio 1 -> 32x32 box; force
    # its position via a fixed key sweep and just assert the invariant that
    # any produced haog row is either all-zero or has positive w/h.
    cfg = DeviceAugConfig(
        out_size=32, scale_min=0.25, scale_max=0.25, ratio_min=1.0,
        ratio_max=1.0, hflip_prob=0.0, op_prob=0.0, re_prob=0.0,
    )
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (4, 1, H, W, 3), dtype=np.uint8))
    boxes = jnp.asarray(
        np.tile(np.array([[1.0, 1.0, 3.0, 3.0]], np.float32), (4, 1, 4, 1))[:, None]
    )
    _, haog = device_augment_image(frames, boxes, jax.random.PRNGKey(3), cfg)
    h = np.asarray(haog).reshape(-1, 4)
    zero = np.all(h == 0, axis=-1)
    assert np.all(zero | ((h[:, 2] > 0) & (h[:, 3] > 0)))
