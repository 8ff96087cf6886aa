"""Loss-function parity vs the reference implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from svit_tpu.models import losses as jl


def test_boxes_loss_matches_reference(torch_reference):
    import torch
    from slowfast.models.losses import boxes_loss_

    rng = np.random.RandomState(0)
    B, T, O = 3, 1, 4
    pred = rng.randn(B, T, O, 5).astype(np.float32)
    pred[..., 1:] = 1 / (1 + np.exp(-pred[..., 1:]))  # sigmoid'd cxcywh
    tar = rng.rand(B, T, O, 4).astype(np.float32) * 0.5 + 0.1
    tar[0, 0, 2] = 0  # absent box
    tar[1, 0, 0] = 0

    tl1, tbce, tgiou = boxes_loss_(torch.from_numpy(pred), torch.from_numpy(tar))
    l1, bce, giou = jl.boxes_loss(jnp.asarray(pred), jnp.asarray(tar))

    np.testing.assert_allclose(float(l1), float(tl1), rtol=1e-5)
    np.testing.assert_allclose(float(bce), float(tbce), rtol=1e-5)
    np.testing.assert_allclose(float(giou), float(tgiou), rtol=1e-5)


def test_boxes_loss_weighted_equals_unpadded(torch_reference):
    """Padding with zero-weight samples must not change any loss value."""
    rng = np.random.RandomState(1)
    B, T, O = 3, 1, 4
    pred = rng.randn(B, T, O, 5).astype(np.float32)
    tar = rng.rand(B, T, O, 4).astype(np.float32) * 0.5 + 0.1

    base = jl.boxes_loss(jnp.asarray(pred), jnp.asarray(tar))
    pad_pred = np.concatenate([pred, np.zeros((2, T, O, 5), np.float32)])
    pad_tar = np.concatenate([tar, np.zeros((2, T, O, 4), np.float32)])
    w = np.array([1, 1, 1, 0, 0], np.float32)
    padded = jl.boxes_loss(jnp.asarray(pad_pred), jnp.asarray(pad_tar), jnp.asarray(w))
    for a, b in zip(base, padded):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_contact_state_loss_matches_reference(torch_reference):
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    B = 4
    pred = rng.randn(B, 1, 2, 5).astype(np.float32)
    tar = np.array([[0, 3], [-1, 0], [3, 3], [-1, -1]], np.int64)

    tp = torch.from_numpy(pred).flatten(0, 2)
    tt = torch.from_numpy(tar).flatten()
    mask = tt >= 0
    expected = F.cross_entropy(tp[mask], tt[mask]).item()

    got = float(jl.contact_state_loss(jnp.asarray(pred), jnp.asarray(tar)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_cross_entropy_matches_torch(torch_reference):
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    logits = rng.randn(6, 10).astype(np.float32)
    labels = rng.randint(0, 10, 6)
    expected = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels)).item()
    got = float(jl.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_soft_target_ce_matches_reference(torch_reference):
    import torch
    from slowfast.models.losses import SoftTargetCrossEntropy

    rng = np.random.RandomState(4)
    logits = rng.randn(5, 7).astype(np.float32)
    target = rng.rand(5, 7).astype(np.float32)
    target /= target.sum(-1, keepdims=True)
    expected = SoftTargetCrossEntropy()(
        torch.from_numpy(logits), torch.from_numpy(target)
    ).item()
    got = float(jl.soft_target_cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_lambdas_dict_matches_reference(torch_reference):
    from slowfast.utils.misc import get_lambdas_dict as ref_lambdas
    from svit_tpu.config import get_cfg
    from tests.conftest import REFERENCE

    import os

    _, ref_defaults = torch_reference
    rcfg = ref_defaults.get_cfg()
    rcfg.merge_from_file(os.path.join(REFERENCE, "configs", "ssv2.yaml"))
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs", "ssv2.yaml"))

    assert jl.get_lambdas_dict(cfg) == ref_lambdas(rcfg)


def test_lr_policy_matches_reference(torch_reference):
    import os

    from slowfast.utils import lr_policy as ref_lr
    from svit_tpu.config import get_cfg
    from svit_tpu.utils import lr_policy as my_lr
    from tests.conftest import REFERENCE

    _, ref_defaults = torch_reference
    rcfg = ref_defaults.get_cfg()
    rcfg.merge_from_file(os.path.join(REFERENCE, "configs", "ssv2.yaml"))
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs", "ssv2.yaml")
    )

    for epoch in [0.0, 0.5, 1.0, 10.3, 25.0, 49.9]:
        ref = ref_lr.get_lr_at_epoch(rcfg, epoch)["lr"]
        got = my_lr.get_lr_at_epoch(cfg, epoch)
        np.testing.assert_allclose(got, ref, rtol=1e-9, err_msg=f"epoch {epoch}")


def test_match_haog_matches_reference(torch_reference):
    import torch
    from slowfast.utils import box_ops as ref_box_ops

    from svit_tpu.ops import box_ops as my_box_ops

    rng = np.random.RandomState(5)
    for trial in range(20):
        haog = rng.rand(4, 4).astype(np.float32)
        haog[:, 2:] += haog[:, :2]  # valid xyxy
        if trial % 3 == 0:
            haog[2] = 0  # missing object
        if trial % 5 == 0:
            haog[0] = 0  # missing hand
        ref_h, ref_c = ref_box_ops.match_haog(torch.from_numpy(haog.copy()))
        my_h, my_c = my_box_ops.match_haog(haog.copy())
        np.testing.assert_allclose(my_h, ref_h.numpy(), rtol=1e-6)
        np.testing.assert_array_equal(my_c, ref_c.numpy())
