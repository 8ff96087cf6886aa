"""Device-aug training path: raw uint8 loader -> on-device aug in the step."""

import numpy as np
import pytest

from tests.fixtures import make_ssv2_fixture
from tests.test_train_engine import _tiny_cfg


def test_raw_mode_dataset_and_train_step(tmp_path):
    import jax

    root = str(tmp_path / "ssv2")
    make_ssv2_fixture(root)
    cfg = _tiny_cfg(root, str(tmp_path / "out"))
    cfg.TPU.DEVICE_AUG = True
    cfg.TPU.RAW_SIZE = 48
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.TRAIN.EVAL_PERIOD = 1000
    cfg.TRAIN.CHECKPOINT_PERIOD = 1000

    from svit_tpu.data import build_dataset

    ds = build_dataset("ssv2", cfg, "train")
    frames, label, index, meta = ds[0]
    assert frames.dtype == np.uint8
    assert frames.shape == (4, 48, 48, 3)

    # full epoch through the engine: uint8 batches -> device aug -> losses
    from svit_tpu.engine.train import train

    state = train(cfg)
    assert int(state.step) == 2


def test_raw_mode_val_unaffected(tmp_path):
    """Eval/test stay on the deterministic host path (parity anchor)."""
    root = str(tmp_path / "ssv2")
    make_ssv2_fixture(root)
    cfg = _tiny_cfg(root, str(tmp_path / "out"))
    cfg.TPU.DEVICE_AUG = True

    from svit_tpu.data import build_dataset

    ds = build_dataset("ssv2", cfg, "val")
    frames, _, _, _ = ds[0]
    assert frames.dtype == np.float32
    assert frames.shape == (4, 32, 32, 3)
