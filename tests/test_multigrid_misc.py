"""Multigrid schedule, AVA AP, timm inflation, mixup tests."""

import numpy as np
import pytest

from svit_tpu.config import get_cfg


def test_long_cycle_schedule_matches_reference(torch_reference):
    from slowfast.utils.multigrid import MultigridSchedule as RefSchedule

    from svit_tpu.engine.multigrid import MultigridSchedule

    def base_cfg(get):
        cfg = get()
        cfg.MULTIGRID.LONG_CYCLE = True
        # the reference's fine-tuning-phase indexing (multigrid.py:196
        # all_shapes[-1][2]) only works with the short cycle on
        cfg.MULTIGRID.SHORT_CYCLE = True
        cfg.SOLVER.STEPS = [0, 20, 40, 60]
        cfg.SOLVER.LRS = [1.0, 0.1, 0.01]
        cfg.SOLVER.MAX_EPOCH = 70
        cfg.SOLVER.GAMMA = 0.1
        cfg.TRAIN.BATCH_SIZE = 64
        cfg.DATA.NUM_FRAMES = 16
        cfg.DATA.TRAIN_CROP_SIZE = 224
        return cfg

    _, ref_defaults = torch_reference
    ref_cfg = base_cfg(ref_defaults.get_cfg)
    my_cfg = base_cfg(get_cfg)

    ref = RefSchedule()
    ref_cfg = ref.init_multigrid(ref_cfg)
    mine = MultigridSchedule()
    my_cfg = mine.init_multigrid(my_cfg)

    assert [tuple(s[1]) for s in ref.schedule] == [tuple(s[1]) for s in mine.schedule]
    assert [s[2] for s in ref.schedule] == [s[2] for s in mine.schedule]
    assert ref_cfg.SOLVER.STEPS == my_cfg.SOLVER.STEPS
    assert ref_cfg.SOLVER.LRS == my_cfg.SOLVER.LRS
    assert ref_cfg.SOLVER.MAX_EPOCH == my_cfg.SOLVER.MAX_EPOCH

    # shape transitions agree across all epochs
    from slowfast.utils.multigrid import get_current_long_cycle_shape as ref_shape

    from svit_tpu.engine.multigrid import get_current_long_cycle_shape as my_shape

    for e in range(my_cfg.SOLVER.MAX_EPOCH):
        assert tuple(ref_shape(ref.schedule, e)) == tuple(my_shape(mine.schedule, e))


def test_ava_ap_perfect_and_miss():
    from svit_tpu.engine.ava_eval import evaluate_detections

    gt = {"v,0001": {1: [(np.array([0, 0, 10, 10.0]), None)]}}
    det_perfect = {"v,0001": {1: [(np.array([0, 0, 10, 10.0]), 0.9)]}}
    out = evaluate_detections(gt, det_perfect)
    assert out["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(1.0)

    det_miss = {"v,0001": {1: [(np.array([20, 20, 30, 30.0]), 0.9)]}}
    out = evaluate_detections(gt, det_miss)
    assert out["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(0.0)


def test_ava_ap_ranking():
    from svit_tpu.engine.ava_eval import evaluate_detections

    gt = {
        "v,0001": {1: [(np.array([0, 0, 10, 10.0]), None)]},
        "v,0002": {1: [(np.array([0, 0, 10, 10.0]), None)]},
    }
    # one hit (high score), one false positive (low score) -> AP 1.0*recall 0.5
    det = {
        "v,0001": {1: [(np.array([0, 0, 10, 10.0]), 0.9)]},
        "v,0002": {1: [(np.array([50, 50, 60, 60.0]), 0.1)]},
    }
    out = evaluate_detections(gt, det)
    assert out["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(0.5)


def test_timm_inflation(tmp_path):
    import torch

    from svit_tpu.utils.converter import load_timm_pretrained

    state = {
        "pos_embed": torch.randn(1, 197, 96),
        "patch_embed.proj.weight": torch.randn(96, 3, 16, 16),
        "patch_embed.proj.bias": torch.randn(96),
        "head.weight": torch.randn(1000, 96),
        "head.bias": torch.randn(1000),
    }
    path = tmp_path / "timm.pth"
    torch.save(state, str(path))
    out = load_timm_pretrained(
        str(path), num_patches=3136, patch_kernel_t=3, patch_kernel_hw=(7, 7),
        num_classes=174,
    )
    assert "head.weight" not in out  # class mismatch drops classifier
    assert out["pos_embed_spatial"].shape == (1, 3136, 96)
    assert out["pos_embed_class"].shape == (1, 1, 96)
    assert out["patch_embed.proj.weight"].shape == (96, 3, 3, 7, 7)
    # temporal repetition (not averaged)
    np.testing.assert_array_equal(
        out["patch_embed.proj.weight"][:, :, 0],
        out["patch_embed.proj.weight"][:, :, 1],
    )


def test_mixup_soft_targets():
    from svit_tpu.data.mixup import MixUp

    rng = np.random.default_rng(0)
    mix = MixUp(mixup_alpha=0.8, cutmix_alpha=0.0, label_smoothing=0.1,
                num_classes=10, rng=rng)
    clips = rng.normal(size=(4, 2, 8, 8, 3)).astype(np.float32)
    labels = np.array([0, 1, 2, 3])
    mixed, targets = mix(clips, labels)
    assert mixed.shape == clips.shape
    assert targets.shape == (4, 10)
    np.testing.assert_allclose(targets.sum(-1), 1.0, rtol=1e-5)
