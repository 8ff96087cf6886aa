"""End-to-end data pipeline tests on the synthetic mini-SSv2 fixture."""

import numpy as np
import pytest

from svit_tpu.config import get_cfg
from tests.fixtures import make_doh_fixture, make_ssv2_fixture


@pytest.fixture(scope="module")
def ssv2_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ssv2")
    make_ssv2_fixture(str(root))
    return str(root)


@pytest.fixture(scope="module")
def doh_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("doh")
    make_doh_fixture(str(root))
    return str(root)


def _cfg(ssv2_root, **over):
    cfg = get_cfg()
    cfg.SSV2.DATA_ROOT = ssv2_root
    cfg.SSV2.SPLIT = "standard"
    cfg.TRAIN.DATASET = "ssv2"
    cfg.TEST.DATASET = "ssv2"
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 44]
    cfg.DATA.TRAIN_JITTER_SCALES_RELATIVE = [0.3, 1.0]
    cfg.DATA.TRAIN_JITTER_ASPECT_RELATIVE = [0.75, 1.3333]
    cfg.DATA.RANDOM_FLIP = False
    cfg.AUG.ENABLE = True
    cfg.AUG.AA_TYPE = "rand-m7-n4-mstd0.5-inc1"
    cfg.MODEL.NUM_CLASSES = 5
    for k, v in over.items():
        node = cfg
        keys = k.split(".")
        for p in keys[:-1]:
            node = node[p]
        node[keys[-1]] = v
    return cfg


def test_ssv2_train_item(ssv2_root):
    from svit_tpu.data import build_dataset

    ds = build_dataset("ssv2", _cfg(ssv2_root), "train")
    frames, label, index, meta = ds[0]
    assert frames.shape == (4, 32, 32, 3)
    assert frames.dtype == np.float32
    assert 0 <= label < 5
    assert meta == {}


def test_ssv2_test_replication(ssv2_root):
    from svit_tpu.data import build_dataset

    cfg = _cfg(ssv2_root)
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 3
    ds = build_dataset("ssv2", cfg, "test")
    assert len(ds) == 4 * 6  # videos x views x crops
    f0, l0, _, _ = ds[0]
    assert f0.shape == (4, 32, 32, 3)


def test_ssv2_val_deterministic_frames(ssv2_root):
    """val/test use segment midpoints — same item twice gives same temporal
    sampling."""
    from svit_tpu.data import build_dataset

    cfg = _cfg(ssv2_root, **{"AUG.ENABLE": False})
    ds = build_dataset("ssv2", cfg, "val")
    # deterministic frame paths (midpoint sampling)
    rng = np.random.default_rng(0)
    p1 = ds._frames_list(0, rng)
    p2 = ds._frames_list(0, rng)
    assert p1 == p2


def test_ssv2_frames_item(ssv2_root):
    from svit_tpu.data import build_dataset

    ds = build_dataset("ssv2_frames", _cfg(ssv2_root), "train")
    frames, label, index, meta = ds[0]
    assert frames.shape == (1, 32, 32, 3)
    assert label == -1
    boxes = meta["haog_bboxes"]
    assert boxes.shape == (1, 4, 4)
    assert boxes.min() >= 0.0 and boxes.max() <= 1.0
    cs = meta["contact_state"]
    assert cs.shape == (2,)
    assert set(np.unique(cs)).issubset({-1, 0, 3})
    # cxcywh: zero or valid extent
    wh = boxes[0, :, 2:]
    assert np.all((wh == 0) | (wh > 0.0))


def test_doh_frames_item(ssv2_root, doh_root):
    from svit_tpu.data import build_dataset

    cfg = _cfg(ssv2_root)
    cfg.DOH.DATA_ROOT = doh_root
    ds = build_dataset("doh_frames", cfg, "train")
    frames, label, index, meta = ds[0]
    assert frames.shape == (1, 32, 32, 3)
    assert meta["haog_bboxes"].shape == (1, 4, 4)
    assert meta["contact_state"].shape == (2,)
    assert meta["label_idx"] in range(12)


def test_multi_images_concat(ssv2_root, doh_root):
    from svit_tpu.data import build_dataset

    cfg = _cfg(ssv2_root)
    cfg.DOH.DATA_ROOT = doh_root
    cfg.IMAGE_TRAIN.DATASETS = ["ssv2_frames", "doh_frames"]
    ds = build_dataset("multi_images", cfg, "train")
    base = len(ds) // 100
    assert base == 4 + 6
    f, l, i, m = ds[base - 1]   # last doh item
    assert f.shape == (1, 32, 32, 3)
    f2, _, _, _ = ds[base]      # wraps to first item
    assert f2.shape == (1, 32, 32, 3)


def test_loader_padding_and_batching(ssv2_root):
    from svit_tpu.data import build_dataset
    from svit_tpu.data.loader import Loader, collate_video

    ds = build_dataset("ssv2", _cfg(ssv2_root), "train")
    loader = Loader(
        ds, 3, shuffle=True, drop_last=False, num_workers=0,
        collate_fn=collate_video, pad_to=4,
    )
    batches = list(loader)
    assert len(batches) == 2  # 4 videos, batch 3 -> 2 batches
    for b in batches:
        assert b["clips"].shape == (4, 4, 32, 32, 3)
        assert b["weight"].shape == (4,)
    assert batches[0]["weight"].sum() == 3
    assert batches[1]["weight"].sum() == 1


def test_loader_epoch_shuffle_differs(ssv2_root):
    from svit_tpu.data import build_dataset
    from svit_tpu.data.loader import Loader, collate_video

    ds = build_dataset("ssv2", _cfg(ssv2_root, **{"AUG.ENABLE": False}), "val")
    loader = Loader(
        ds, 4, shuffle=True, drop_last=False, num_workers=0,
        collate_fn=collate_video,
    )
    loader.set_epoch(0)
    i0 = next(iter(loader))["index"].tolist()
    loader.set_epoch(1)
    i1 = next(iter(loader))["index"].tolist()
    assert sorted(i0) == sorted(i1)
    assert i0 != i1


def test_construct_loader_train_pair(ssv2_root):
    from svit_tpu.data import construct_loader

    cfg = _cfg(ssv2_root)
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.IMAGE_TRAIN.BATCH_SIZE = 2
    cfg.IMAGE_TRAIN.GPU_IDS = [0]
    cfg.NUM_GPUS = 1
    cfg.DATA_LOADER.NUM_WORKERS = 0
    video_loader, image_loader = construct_loader(cfg, "train", mesh_data=2)
    vb = next(iter(video_loader))
    ib = next(iter(image_loader))
    assert vb["clips"].shape[0] == 2
    assert ib["frames"].shape == (2, 1, 32, 32, 3)
    assert ib["haog_bboxes"].shape == (2, 1, 4, 4)
    assert ib["contact_state"].shape == (2, 2)
