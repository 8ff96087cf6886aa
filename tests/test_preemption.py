"""Preemption handling: SIGTERM during training checkpoints and exits; a
re-launch auto-resumes.  Runs the real CLI in a subprocess."""

import glob
import os
import signal
import subprocess
import sys
import time

import pytest

from tests.fixtures import make_ssv2_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG_TMPL = """
MODEL: {{MODEL_NAME: SViT, NUM_CLASSES: 5, LOSS_FUNC: video_image_loss, DROPOUT_RATE: 0.0}}
SSV2: {{DATA_ROOT: {root}, SPLIT: standard}}
TRAIN: {{DATASET: ssv2, BATCH_SIZE: 2, EVAL_PERIOD: 1000, CHECKPOINT_PERIOD: 1000,
  MIXED_PRECISION: false, FORWARD_VIDEO_FRAMES: false}}
TEST: {{ENABLE: false, DATASET: ssv2, BATCH_SIZE: 4}}
DATA: {{NUM_FRAMES: 4, TRAIN_CROP_SIZE: 32, TEST_CROP_SIZE: 32,
  TRAIN_JITTER_SCALES: [36, 44], RANDOM_FLIP: false}}
AUG: {{ENABLE: false}}
MVIT: {{DEPTH: 2, EMBED_DIM: 32, NUM_HEADS: 1, PATCH_KERNEL: "(3, 7, 7)",
  PATCH_STRIDE: "(2, 4, 4)", PATCH_PADDING: "(1, 3, 3)", POOL_KVQ_KERNEL: [3, 3, 3],
  POOL_KV_STRIDE_ADAPTIVE: [1, 2, 2], POOL_Q_STRIDE: [[0, 1, 1, 1], [1, 1, 2, 2]],
  DIM_MUL: [[1, 2.0]], HEAD_MUL: [[1, 2.0]], REL_POS_SPATIAL: true,
  REL_POS_TEMPORAL: true, USE_ABS_POS: false, DROPPATH_RATE: 0.0}}
IMAGE_TRAIN: {{BATCH_SIZE: 2, GPU_IDS: [1]}}
NUM_GPUS: 2
SOLVER: {{MAX_EPOCH: 50, BASE_LR: 1e-4, COSINE_END_LR: 1e-6,
  OPTIMIZING_METHOD: adamw, CLIP_GRAD_L2NORM: 1.0, ZERO_WD_1D_PARAM: true}}
DATA_LOADER: {{NUM_WORKERS: 0}}
LOG_PERIOD: 1
OUTPUT_DIR: {out}
TPU: {{MESH_DATA: 2}}
"""


@pytest.mark.slow
def test_sigterm_checkpoints_and_resume(tmp_path):
    root = str(tmp_path / "ssv2")
    out = str(tmp_path / "out")
    make_ssv2_fixture(root)
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(CFG_TMPL.format(root=root, out=out))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "run_net.py"),
         "--cfg", str(cfg_path)],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # wait until a couple of epochs logged, then preempt
    deadline = time.time() + 420
    seen_epochs = 0
    lines = []
    for line in proc.stdout:
        lines.append(line)
        if "train_epoch" in line:
            seen_epochs += 1
        if seen_epochs >= 2:
            proc.send_signal(signal.SIGTERM)
            break
        if time.time() > deadline:
            proc.kill()
            pytest.fail("training never reached 2 epochs:\n" + "".join(lines[-20:]))
    proc.communicate(timeout=300)
    assert proc.returncode == 0

    ckpts = glob.glob(os.path.join(out, "checkpoints", "checkpoint_epoch_*"))
    assert ckpts, "SIGTERM did not produce a checkpoint"

    # resume for one more epoch
    from svit_tpu.config import assert_and_infer_cfg, load_config, parse_args

    args = parse_args(["--cfg", str(cfg_path), "SOLVER.MAX_EPOCH", "4"])
    cfg = assert_and_infer_cfg(load_config(args))

    from svit_tpu.engine.train import train

    state = train(cfg)
    # resumed past the preemption point: step count covers 4 epochs x 2 steps
    assert int(state.step) == 8
