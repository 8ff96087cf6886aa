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


def _small_multitask_cfg():
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
    return cfg


def test_multitask_eval_epoch_end_to_end():
    """2-task head through the REAL val loop: jitted eval step -> eval_epoch
    -> ValMeter, with padding weights, checked against the golden-tested
    reference joint protocol (multitask_topks_correct)."""
    from types import SimpleNamespace

    from svit_tpu.engine import steps
    from svit_tpu.engine.metrics import topks_correct
    from svit_tpu.engine.meters import ValMeter
    from svit_tpu.engine.train import eval_epoch

    cfg = _small_multitask_cfg()
    model, arch = build_model(cfg)
    x0 = jnp.zeros((1, 4, 32, 32, 3))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, x0, deterministic=True
    )["params"]

    rng = np.random.RandomState(7)
    B = 4
    batches = []
    for i in range(2):
        w = np.ones(B, np.float32)
        if i == 1:
            w[-1] = 0.0  # mesh-padding row must not count
        batches.append({
            "clips": rng.randn(B, 4, 32, 32, 3).astype(np.float32) * 0.3,
            "labels": {
                "verb": rng.randint(0, 97, B),
                "noun": rng.randint(0, 300, B),
            },
            "weight": w,
        })

    eval_jit = jax.jit(steps.make_eval_step(model, arch.num_classes))
    trainer = SimpleNamespace(
        val_loader=batches,
        put_batch=lambda b: jax.tree.map(jnp.asarray, b),
        eval_jit=eval_jit,
        image_eval_jit=None,
    )
    val_meter = ValMeter(len(batches), cfg)
    stats = eval_epoch(cfg, trainer, params, val_meter, cur_epoch=0)

    # Independent protocol check: reference joint/per-task counts over the
    # non-padded rows, from the model's own logits.
    apply = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, deterministic=True)[0])
    exp = {"verb": [0, 0], "noun": [0, 0], "action": [0, 0], "n": 0}
    for b in batches:
        logits = jax.device_get(apply(params, jnp.asarray(b["clips"])))
        keep = b["weight"] > 0
        preds = {k: np.asarray(v)[keep] for k, v in logits.items()}
        labels = {k: v[keep] for k, v in b["labels"].items()}
        for task in ("verb", "noun"):
            c1, c5 = topks_correct(preds[task], labels[task], (1, 5))
            exp[task][0] += int(c1)
            exp[task][1] += int(c5)
        j1, j5 = multitask_topks_correct(preds, labels, (1, 5))
        exp["action"][0] += int(j1)
        exp["action"][1] += int(j5)
        exp["n"] += int(keep.sum())

    n = exp["n"]
    assert n == 7  # one padded row dropped
    for task in ("verb", "noun", "action"):
        np.testing.assert_allclose(
            stats[f"{task}_top1_acc"], exp[task][0] / n * 100, rtol=1e-6)
        np.testing.assert_allclose(
            stats[f"{task}_top5_acc"], exp[task][1] / n * 100, rtol=1e-6)
    # primary err slots carry the joint metric
    np.testing.assert_allclose(
        stats["top1_err"], 100 - stats["action_top1_acc"], rtol=1e-6)
    np.testing.assert_allclose(
        stats["top5_err"], 100 - stats["action_top5_acc"], rtol=1e-6)
