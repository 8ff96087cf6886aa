"""End-to-end learning sanity: overfit a trivially-learnable task.

Marked slow (~4 min on CPU): run with ``-m slow``.
"""

import glob
import logging as _logging

import numpy as np
import pytest
from PIL import Image

from tests.fixtures import make_ssv2_fixture
from tests.test_train_engine import _tiny_cfg

COLORS = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]


@pytest.mark.slow
def test_overfit_video_classification(tmp_path):
    root = str(tmp_path / "data")
    out = str(tmp_path / "out")
    vids = make_ssv2_fixture(root, num_videos=4, num_classes=4)
    for i, v in enumerate(vids):
        for f in glob.glob(f"{root}/frames/{v}/*.jpg"):
            Image.new("RGB", (64, 80), COLORS[i % 4]).save(f)

    cfg = _tiny_cfg(root, out)
    cfg.MODEL.NUM_CLASSES = 5
    cfg.SOLVER.MAX_EPOCH = 30
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.SOLVER.COSINE_END_LR = 1e-4
    cfg.TRAIN.EVAL_PERIOD = 1000
    cfg.TRAIN.CHECKPOINT_PERIOD = 1000
    cfg.AUG.ENABLE = False
    cfg.IMAGE_TRAIN.GPU_IDS = []
    cfg.DATA.TRAIN_JITTER_SCALES = [32, 32]
    cfg.DATA.TRAIN_JITTER_SCALES_RELATIVE = []
    cfg.DATA.TRAIN_JITTER_ASPECT_RELATIVE = []
    cfg.LOG_PERIOD = 1000

    from svit_tpu.engine import meters
    from svit_tpu.engine.train import train

    _logging.getLogger("svit_tpu").setLevel(_logging.ERROR)
    losses_seen = []
    orig = meters.TrainMeter.update_stats

    def patched(self, lr, mb, dloss):
        losses_seen.append(dloss["loss_ce"])
        return orig(self, lr, mb, dloss)

    meters.TrainMeter.update_stats = patched
    try:
        train(cfg)
    finally:
        meters.TrainMeter.update_stats = orig

    assert losses_seen[0] > 1.0
    assert losses_seen[-1] < 0.1, f"did not learn: {losses_seen[-1]}"
