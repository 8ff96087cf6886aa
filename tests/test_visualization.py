"""Demo + Grad-CAM + TensorBoard smoke tests on the tiny arch."""

import glob
import os

import numpy as np
import pytest

from tests.fixtures import make_ssv2_fixture
from tests.test_train_engine import _tiny_cfg


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("ssv2")
    make_ssv2_fixture(str(root))
    out = tmp_path_factory.mktemp("out")
    return str(root), str(out)


def test_demo_on_frame_dir(env):
    root, out = env
    cfg = _tiny_cfg(root, out)
    cfg.DEMO.ENABLE = True
    cfg.DEMO.INPUT_VIDEO = os.path.join(root, "frames", "100")
    cfg.DEMO.OUTPUT_FILE = os.path.join(out, "demo_frames")
    cfg.DATA.SAMPLING_RATE = 2

    from svit_tpu.visualization.demo import demo

    n_clips = demo(cfg)
    assert n_clips >= 1
    outs = glob.glob(os.path.join(out, "demo_frames", "*.jpg"))
    assert len(outs) >= cfg.DATA.NUM_FRAMES * cfg.DATA.SAMPLING_RATE


def test_gradcam_produces_maps(env):
    import jax
    import jax.numpy as jnp

    root, out = env
    cfg = _tiny_cfg(root, out)

    from svit_tpu.models import SViT, build_model
    from svit_tpu.visualization.gradcam import GradCAM

    model, arch = build_model(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 32, 32, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)

    cam_model = SViT(arch=arch, dtype=model.dtype, capture_gradcam=True)
    cam = GradCAM(cam_model, params, data_mean=cfg.DATA.MEAN, data_std=cfg.DATA.STD)
    maps, preds = cam.localization_map(x)
    assert maps.shape == (1, 4, 32, 32)
    assert maps.min() >= 0.0 and maps.max() <= 1.0
    videos, _ = cam(x)
    assert videos.shape == (1, 4, 32, 32, 3)
    assert videos.dtype == np.uint8


def test_tensorboard_writer(env, tmp_path):
    root, out = env
    cfg = _tiny_cfg(root, str(tmp_path))
    cfg.TENSORBOARD.CONFUSION_MATRIX.ENABLE = True

    from svit_tpu.visualization.tensorboard_vis import TensorboardWriter

    w = TensorboardWriter(cfg)
    w.add_scalars({"train/loss": 1.0, "train/lr": 0.1}, global_step=0)
    preds = np.eye(5)[np.array([0, 1, 2, 3, 4])]
    w.add_confusion_matrix(preds, np.array([0, 1, 2, 2, 4]), num_classes=5)
    w.add_video(np.zeros((1, 2, 8, 8, 3), np.uint8))
    w.close()
    events = glob.glob(os.path.join(str(tmp_path), "runs-*", "events.*"))
    assert events


def test_demo_on_real_video_file(env, tmp_path):
    """DEMO.INPUT_VIDEO pointing at an actual encoded container, decoded
    through the native libav shim (the reference's PyAV demo path)."""
    from svit_tpu.native import video as nv

    if not nv.available():
        pytest.skip("native libav shim unavailable")
    root, out = env
    src = str(tmp_path / "demo.mp4")
    assert nv.encode_gray_ramp(src, 64, 48, 40, 30)

    cfg = _tiny_cfg(root, out)
    cfg.DEMO.ENABLE = True
    cfg.DEMO.INPUT_VIDEO = src
    cfg.DEMO.OUTPUT_FILE = os.path.join(out, "demo_video")
    cfg.DATA.SAMPLING_RATE = 2

    from svit_tpu.visualization.demo import demo

    n_clips = demo(cfg)
    assert n_clips >= 1
    outs = glob.glob(os.path.join(out, "demo_video", "*.jpg"))
    assert len(outs) >= cfg.DATA.NUM_FRAMES
