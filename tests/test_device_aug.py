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
