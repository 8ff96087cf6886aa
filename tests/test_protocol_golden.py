"""End-to-end multi-view test-protocol golden vs the PyTorch reference.

Round-1 gap (VERDICT #6): golden forward parity and per-transform goldens
were necessary but nothing pinned the WHOLE §3.2 chain.  These tests run the
reference's ``Ssv2`` dataset (mode=test, via refshim) and its ``TestMeter``
against svit_tpu's on one synthetic fixture and assert:

- identical frame selections (segment-midpoint sampling -> file paths),
- identical crop placements / pixel values (3-crop protocol, to fp tolerance;
  the reference is BGR, ours RGB — compared via channel reversal),
- identical ensembled video_preds and top-1/top-5 given the same per-clip
  scores.

Reference: ``slowfast/datasets/ssv2.py:212-288``, ``utils/meters.py:237-398``.
"""

import json
import os

import numpy as np
import pytest

from tests.fixtures import make_ssv2_fixture


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ssv2_protocol")
    make_ssv2_fixture(str(root), num_videos=4, num_frames=12, size=(80, 64))
    return str(root)


@pytest.fixture()
def sandbox_cwd(tmp_path, monkeypatch):
    """Both implementations read ``data/ssv2/empty_bbox_*.json`` relative to
    CWD (reference ``ssv2.py:138``); give them empty skip lists."""
    d = tmp_path / "data" / "ssv2"
    d.mkdir(parents=True)
    for split in ("train", "val"):
        (d / f"empty_bbox_{split}.json").write_text("[]")
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _pair_cfgs(torch_reference, fixture_root):
    from tests.conftest import small_cfg_pairs

    ref_cfg, cfg = small_cfg_pairs(
        torch_reference,
        **{
            "SSV2.DATA_ROOT": fixture_root,
            "DATA.TEST_CROP_SIZE": 48,
            "TEST.NUM_ENSEMBLE_VIEWS": 1,
            "TEST.NUM_SPATIAL_CROPS": 3,
        },
    )
    return ref_cfg, cfg


def test_dataset_protocol_matches_reference(
    torch_reference, fixture_root, sandbox_cwd
):
    from slowfast.datasets.ssv2 import Ssv2 as RefSsv2

    from svit_tpu.data.ssv2 import Ssv2

    ref_cfg, cfg = _pair_cfgs(torch_reference, fixture_root)
    ref_ds = RefSsv2(ref_cfg, "test")
    ds = Ssv2(cfg, "test")

    assert len(ds) == len(ref_ds) == 4 * 3

    rng = np.random.default_rng(0)
    for idx in range(len(ds)):
        # identical video replication order + labels
        assert ds._video_names[idx] == ref_ds._video_names[idx]
        assert ds._labels[idx] == int(ref_ds._labels[idx])
        assert (
            ds._spatial_temporal_idx[idx] == ref_ds._spatial_temporal_idx[idx]
        )
        # identical deterministic frame selection -> file paths
        ours = ds._frames_list(idx, rng)
        theirs = ref_ds.get_frames_list(idx)
        assert ours == theirs, f"frame lists differ at clip {idx}"

    for idx in range(len(ds)):
        frames, label, index, _ = ds[idx]
        ref_frames, ref_label, ref_index, _ = ref_ds[idx]
        ref_np = ref_frames[0].numpy()  # [C, T, H, W] BGR
        # ours: [T, H, W, C] RGB -> [C, T, H, W] BGR
        ours_np = frames.transpose(3, 0, 1, 2)[::-1]
        assert label == int(ref_label) and index == int(ref_index)
        np.testing.assert_allclose(
            ours_np, ref_np, rtol=0, atol=1e-4,
            err_msg=f"pixel mismatch at clip {idx}",
        )


def test_testmeter_ensemble_matches_reference(torch_reference):
    import torch
    from slowfast.utils.meters import TestMeter as RefTestMeter

    from svit_tpu.engine.meters import TestMeter

    num_videos, num_clips, num_cls = 5, 3, 7
    rng = np.random.RandomState(0)
    labels = rng.randint(0, num_cls, num_videos)

    for method in ("sum", "max"):
        ref_meter = RefTestMeter(
            num_videos, num_clips, num_cls, 10, ensemble_method=method
        )
        meter = TestMeter(num_videos, num_clips, num_cls, 10, method)
        # deliver clips out of order and in uneven batches
        order = rng.permutation(num_videos * num_clips)
        preds = rng.rand(num_videos * num_clips, num_cls).astype(np.float32)
        for start in range(0, len(order), 4):
            ids = order[start : start + 4]
            p = preds[ids]
            l = labels[ids // num_clips]
            meter.update_stats(p, l, ids)
            ref_meter.update_stats(
                torch.from_numpy(p), torch.from_numpy(l), torch.from_numpy(ids)
            )
        np.testing.assert_allclose(
            meter.video_preds, ref_meter.video_preds.numpy(), rtol=1e-6
        )
        stats = meter.finalize_metrics()
        ref_meter.finalize_metrics()
        assert stats["top1_acc"] == ref_meter.stats["top1_acc"]
        assert stats["top5_acc"] == ref_meter.stats["top5_acc"]


def test_bgr_checkpoint_conversion_exact(torch_reference):
    """The reference pipeline feeds cv2-BGR frames (never converted,
    ``slowfast/datasets/utils.py:20-48``); svit_tpu is RGB-native.
    ``flip_input_channels`` on the torch state must make our model on RGB
    input match the reference on the SAME frames in BGR order exactly."""
    import torch
    import jax.numpy as jnp

    from tests.test_golden_model import _build_pair
    from svit_tpu.models import build_model
    from svit_tpu.utils import converter

    ref_model, model, _, cfg = _build_pair(torch_reference)
    state = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = converter.torch_to_flax(
        converter.flip_input_channels(state),
        separate_qkv=cfg.MVIT.SEPARATE_QKV,
    )

    rng = np.random.RandomState(3)
    x_rgb = rng.randn(2, 4, 56, 56, 3).astype(np.float32) * 0.5
    x_bgr = x_rgb[..., ::-1]

    with torch.no_grad():
        tx = torch.from_numpy(
            np.ascontiguousarray(x_bgr.transpose(0, 4, 1, 2, 3))
        )  # [B, C, T, H, W]
        ref_logits, _ = ref_model([tx], {})

    logits, _ = model.apply(params, jnp.asarray(x_rgb), deterministic=True)
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), atol=2e-4, rtol=1e-3
    )
