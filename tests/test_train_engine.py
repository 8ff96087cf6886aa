"""End-to-end train/test engine runs on the virtual CPU mesh + fixture data."""

import glob
import os

import numpy as np
import pytest

from svit_tpu.config import assert_and_infer_cfg, get_cfg
from tests.fixtures import make_ssv2_fixture


def _tiny_cfg(root, out_dir):
    cfg = get_cfg()
    cfg.SSV2.DATA_ROOT = root
    cfg.SSV2.SPLIT = "standard"
    cfg.TRAIN.DATASET = "ssv2"
    cfg.TEST.DATASET = "ssv2"
    cfg.MODEL.MODEL_NAME = "SViT"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.LOSS_FUNC = "video_image_loss"
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 44]
    cfg.DATA.RANDOM_FLIP = False
    cfg.AUG.ENABLE = False
    cfg.MVIT.DEPTH = 2
    cfg.MVIT.EMBED_DIM = 32
    cfg.MVIT.NUM_HEADS = 1
    cfg.MVIT.PATCH_KERNEL = [3, 7, 7]
    cfg.MVIT.PATCH_STRIDE = [2, 4, 4]
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    cfg.MVIT.POOL_Q_STRIDE = [[0, 1, 1, 1], [1, 1, 2, 2]]
    cfg.MVIT.DIM_MUL = [[1, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0]]
    cfg.MVIT.REL_POS_SPATIAL = True
    cfg.MVIT.REL_POS_TEMPORAL = True
    cfg.MVIT.RESIDUAL_POOLING = True
    cfg.MVIT.DIM_MUL_IN_ATT = True
    cfg.MVIT.USE_ABS_POS = False
    cfg.MVIT.DROPPATH_RATE = 0.0
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.EVAL_PERIOD = 1
    cfg.TRAIN.CHECKPOINT_PERIOD = 1
    cfg.TRAIN.MIXED_PRECISION = False
    cfg.TRAIN.FORWARD_VIDEO_FRAMES = False
    cfg.IMAGE_TRAIN.BATCH_SIZE = 2
    cfg.IMAGE_TRAIN.GPU_IDS = [1]
    cfg.NUM_GPUS = 2
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.COSINE_END_LR = 1e-6
    cfg.SOLVER.OPTIMIZING_METHOD = "adamw"
    cfg.SOLVER.CLIP_GRAD_L2NORM = 1.0
    cfg.SOLVER.ZERO_WD_1D_PARAM = True
    cfg.DATA_LOADER.NUM_WORKERS = 0
    cfg.LOG_PERIOD = 1
    cfg.OUTPUT_DIR = out_dir
    cfg.TPU.MESH_DATA = 2
    cfg.TPU.MESH_MODEL = 1
    cfg.TEST.BATCH_SIZE = 4
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 3
    return assert_and_infer_cfg(cfg)


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("ssv2")
    make_ssv2_fixture(str(root))
    out = tmp_path_factory.mktemp("out")
    return str(root), str(out)


def test_train_one_epoch_and_resume(tiny_env):
    root, out = tiny_env
    cfg = _tiny_cfg(root, out)

    from svit_tpu.engine.train import train

    state = train(cfg)
    assert int(state.step) == 2  # 4 videos / batch 2
    ckpts = glob.glob(os.path.join(out, "checkpoints", "checkpoint_epoch_*"))
    assert len(ckpts) == 1

    # resume: second epoch starts from saved state
    cfg2 = _tiny_cfg(root, out)
    cfg2.SOLVER.MAX_EPOCH = 2
    state2 = train(cfg2)
    assert int(state2.step) == 4


def test_multiview_test_engine(tiny_env):
    root, out = tiny_env
    cfg = _tiny_cfg(root, os.path.join(out, "test_out"))

    from svit_tpu.engine.test import test as run_test

    stats = run_test(cfg)
    assert "top1_acc" in stats
    assert 0.0 <= float(stats["top1_acc"]) <= 100.0


def test_midepoch_preemption_resumes_at_step(tiny_env, tmp_path, monkeypatch):
    """SIGTERM mid-epoch saves a step-granular checkpoint; resume loses 0 steps."""
    root, _ = tiny_env
    out = str(tmp_path / "preempt_out")
    cfg = _tiny_cfg(root, out)
    cfg.SOLVER.MAX_EPOCH = 2

    class FakeGuard:
        """fired becomes True at the 5th poll: epoch0 top, e0 it0, e0 it1,
        epoch1 top, e1 it0 -> preempt after the 1st step of epoch 1."""

        def __init__(self):
            self.checks = 0

        @property
        def fired(self):
            self.checks += 1
            return self.checks > 4

        def restore(self):
            pass

    import svit_tpu.engine.train as train_mod

    monkeypatch.setattr(train_mod, "_PreemptionGuard", FakeGuard)
    state = train_mod.train(cfg)
    assert int(state.step) == 3  # 2 steps of epoch 0 + 1 step of epoch 1
    ckpts = sorted(glob.glob(os.path.join(out, "checkpoints", "checkpoint_epoch_*")))
    assert ckpts and ckpts[-1].endswith("checkpoint_epoch_00001_step_00000001"), ckpts

    # resume WITHOUT the fake guard: finishes epoch 1 exactly (one more step)
    monkeypatch.undo()
    cfg2 = _tiny_cfg(root, out)
    cfg2.SOLVER.MAX_EPOCH = 2
    state2 = train_mod.train(cfg2)
    assert int(state2.step) == 4  # zero steps lost, zero steps repeated


def test_val_loss_keys_match_train(tiny_env):
    """Val logs carry the same loss keys as train (VERDICT r2 item 7):
    video CE + consistency via the eval step, HAOG losses via the
    image-branch val pass (reference eval_extra_metrics, meters.py:869-883;
    the image val loop is a documented extension — losses.py:124 makes the
    reference's val loss video-branch-only)."""
    import jax

    root, out = tiny_env
    cfg = _tiny_cfg(root, os.path.join(out, "valkeys_out"))
    cfg.TRAIN.FORWARD_VIDEO_FRAMES = True
    cfg.SVIT.CONSISTENCY_LOSS = "l1"

    from svit_tpu.engine import meters as meters_lib
    from svit_tpu.engine.train import Trainer, eval_epoch
    from svit_tpu.parallel import mesh as meshlib

    mesh = meshlib.build_mesh(cfg)
    with mesh:
        trainer = Trainer(cfg, mesh)
        state = trainer.fresh_state()

        # one train step -> the train-side loss keys
        vb = next(iter(trainer.train_loader))
        vb = {k: vb[k] for k in ("clips", "labels", "weight")}
        ib = next(iter(trainer.image_loader))
        ib = {
            k: ib[k]
            for k in ("frames", "haog_bboxes", "contact_state", "weight")
        }
        _, vec = trainer.step_jit(state, vb, ib, jax.random.PRNGKey(0))
        metrics = dict(zip(trainer.metric_names, jax.device_get(vec).tolist()))
        train_loss_keys = {
            k for k in metrics if "loss" in k or k == "loss_contact_state"
        }

        assert trainer.image_eval_jit is not None
        val_meter = meters_lib.ValMeter(len(trainer.val_loader), cfg)
        state2 = trainer.fresh_state()
        stats = eval_epoch(cfg, trainer, state2, val_meter, 0)

    missing = train_loss_keys - set(stats)
    assert not missing, f"val stats missing train loss keys: {missing}"
