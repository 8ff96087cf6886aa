"""Multitask (EPIC-Kitchens style verb/noun) head + metrics."""

import numpy as np

import jax
import jax.numpy as jnp

from svit_tpu.config import get_cfg
from svit_tpu.engine.metrics import multitask_topks_correct
from svit_tpu.models import build_model


def test_multitask_head_outputs():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SViT"
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.TRAIN.DATASET = "epickitchens"  # triggers verb/noun heads
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = cfg.DATA.TEST_CROP_SIZE = 32
    cfg.MVIT.DEPTH = 2
    cfg.MVIT.EMBED_DIM = 32
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1], [1, 1, 2, 2]]
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.REL_POS_SPATIAL = True
    cfg.MVIT.REL_POS_TEMPORAL = True
    cfg.MVIT.DROPPATH_RATE = 0.0
    cfg.TRAIN.MIXED_PRECISION = False

    model, arch = build_model(cfg)
    assert arch.num_classes == (("verb", 97), ("noun", 300))
    x = jnp.zeros((2, 4, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    logits, extra = model.apply(params, x, deterministic=True)
    assert isinstance(logits, dict)
    assert logits["verb"].shape == (2, 97)
    assert logits["noun"].shape == (2, 300)
    # eval softmax applied per task
    np.testing.assert_allclose(np.asarray(logits["verb"]).sum(-1), 1.0, rtol=1e-3)
    # multitask logits are mirrored into extra_preds (reference :527)
    assert "verb" in extra and "noun" in extra


def test_multitask_topk_joint_correctness(torch_reference):
    from slowfast.utils.metrics import multitask_topks_correct as ref_fn

    import torch

    rng = np.random.RandomState(0)
    preds = {
        "verb": rng.rand(6, 10).astype(np.float32),
        "noun": rng.rand(6, 20).astype(np.float32),
    }
    labels = {
        "verb": rng.randint(0, 10, 6),
        "noun": rng.randint(0, 20, 6),
    }
    ref = ref_fn(
        (torch.from_numpy(preds["verb"]), torch.from_numpy(preds["noun"])),
        (torch.from_numpy(labels["verb"]), torch.from_numpy(labels["noun"])),
        (1, 5),
    )
    got = multitask_topks_correct(preds, labels, (1, 5))
    for g, r in zip(got, ref):
        assert int(g) == int(r)
