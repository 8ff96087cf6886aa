"""Numerical parity of pooling primitives against torch semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from svit_tpu.ops import pooling

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("stride", [(1, 1, 1), (1, 2, 2), (2, 2, 2)])
def test_depthwise_conv_matches_torch(stride):
    rng = np.random.RandomState(0)
    B, T, H, W, C = 2, 4, 8, 8, 6
    x = rng.randn(B, T, H, W, C).astype(np.float32)
    k = rng.randn(C, 1, 3, 3, 3).astype(np.float32)  # torch [C,1,kT,kH,kW]

    conv = torch.nn.Conv3d(C, C, 3, stride=stride, padding=1, groups=C, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(k))
        ref = conv(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    ref = ref.numpy().transpose(0, 2, 3, 4, 1)

    kern = jnp.asarray(k.transpose(2, 3, 4, 1, 0))  # -> [kT,kH,kW,1,C]
    out = pooling.depthwise_conv3d(jnp.asarray(x), kern, stride)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kernel,stride", [((1, 3, 3), (1, 2, 2)), ((3, 3, 3), (1, 1, 1))])
def test_maxpool_matches_torch(kernel, stride):
    rng = np.random.RandomState(1)
    B, T, H, W, C = 2, 4, 9, 9, 5
    x = rng.randn(B, T, H, W, C).astype(np.float32)
    pad = tuple(k // 2 for k in kernel)
    mp = torch.nn.MaxPool3d(kernel, stride, pad, ceil_mode=False)
    ref = mp(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy().transpose(0, 2, 3, 4, 1)
    out = pooling.max_pool3d(jnp.asarray(x), kernel, stride)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("stride", [(1, 1, 1), (1, 2, 2)])
def test_object_multiplier_equals_reference_broadcast_trick(stride):
    """The per-channel multiplier must equal the reference's expand->conv->mean
    on a constant token (reference attention.py:45-54)."""
    rng = np.random.RandomState(2)
    C = 8
    k = rng.randn(C, 1, 3, 3, 3).astype(np.float32)
    token = rng.randn(1, C).astype(np.float32)

    conv = torch.nn.Conv3d(C, C, 3, stride=stride, padding=1, groups=C, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(k))
        # reference trick: broadcast token over the kernel window, conv, mean.
        obj = (
            torch.from_numpy(token)
            .reshape(1, 1, 1, 1, C)
            .expand(1, 3, 3, 3, C)
            .permute(0, 4, 1, 2, 3)
            .contiguous()
        )
        ref = conv(obj).mean([-1, -2, -3]).numpy()[0]

    kern = jnp.asarray(k.transpose(2, 3, 4, 1, 0))
    mult = pooling.conv_obj_multiplier(kern, stride)
    got = token[0] * np.asarray(mult)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_attention_pool_token_layout():
    """cls passes through, patches pooled, objects scaled (conv) / kept (max)."""
    rng = np.random.RandomState(3)
    B, C, O = 2, 4, 6
    thw = (2, 4, 4)
    L = 1 + np.prod(thw) + O
    x = rng.randn(B, int(L), C).astype(np.float32)

    out, new_thw = pooling.attention_pool(
        jnp.asarray(x), thw, mode="max", kernel=(1, 3, 3), stride=(1, 2, 2),
        num_obj=O, has_cls=True,
    )
    assert new_thw == (2, 2, 2)
    assert out.shape == (B, 1 + 8 + O, C)
    np.testing.assert_allclose(np.asarray(out[:, 0]), x[:, 0], atol=0)  # cls untouched
    np.testing.assert_allclose(np.asarray(out[:, -O:]), x[:, -O:], atol=0)  # objs untouched
