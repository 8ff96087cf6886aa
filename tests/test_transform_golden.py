"""Data-transform parity vs torch / the reference's decode helpers."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("shape_out", [(30, 41), (64, 64), (100, 80)])
def test_bilinear_resize_matches_torch(shape_out):
    from svit_tpu.data.transform import bilinear_resize

    rng = np.random.RandomState(0)
    x = rng.rand(2, 48, 56, 3).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        size=shape_out, mode="bilinear", align_corners=False,
    ).numpy().transpose(0, 2, 3, 1)
    out = bilinear_resize(x, *shape_out)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_short_side_scale_matches_reference_math():
    from svit_tpu.data.transform import short_side_scale

    x = np.zeros((1, 100, 60, 3), np.float32)
    out, _ = short_side_scale(x, 30)
    # width < height: new_w = 30, new_h = floor(100/60*30) = 50
    assert out.shape == (1, 50, 30, 3)
    boxes = np.array([[10.0, 20.0, 30.0, 40.0]])
    _, b = short_side_scale(x, 30, boxes)
    np.testing.assert_allclose(b, boxes * 0.5)


def test_uniform_crop_positions():
    from svit_tpu.data.transform import uniform_crop

    x = np.arange(1 * 10 * 20 * 1, dtype=np.float32).reshape(1, 10, 20, 1)
    # landscape: 0/1/2 = left/center/right
    left, _ = uniform_crop(x, 10, 0)
    center, _ = uniform_crop(x, 10, 1)
    right, _ = uniform_crop(x, 10, 2)
    np.testing.assert_array_equal(left, x[:, :, :10])
    np.testing.assert_array_equal(center, x[:, :, 5:15])
    np.testing.assert_array_equal(right, x[:, :, 10:])


def test_temporal_sampling_matches_reference(torch_reference):
    from slowfast.datasets import decoder as ref_decoder

    from svit_tpu.data import decoder

    frames = np.arange(50 * 2 * 2 * 3, dtype=np.uint8).reshape(50, 2, 2, 3)
    ref = ref_decoder.temporal_sampling(
        torch.from_numpy(frames.copy()), 3.0, 42.0, 8
    ).numpy()
    out = decoder.temporal_sampling(frames, 3.0, 42.0, 8)
    np.testing.assert_array_equal(out, ref)


def test_get_start_end_idx_matches_reference(torch_reference):
    from slowfast.datasets import decoder as ref_decoder

    from svit_tpu.data import decoder

    for clip_idx in (0, 3, 9):
        for use_offset in (False, True):
            ref = ref_decoder.get_start_end_idx(
                300.0, 64.0, clip_idx, 10, use_offset=use_offset
            )
            got = decoder.get_start_end_idx(
                300.0, 64.0, clip_idx, 10, use_offset=use_offset
            )
            np.testing.assert_allclose(got, tuple(ref), err_msg=str((clip_idx, use_offset)))


def test_segment_sampling_midpoints_match_reference_formula():
    from svit_tpu.data.utils import sample_seq_frames

    rng = np.random.default_rng(0)
    # val/test midpoints (reference ssv2.py:212-232)
    for video_length in (12, 16, 37, 100):
        seq = sample_seq_frames(video_length, 8, "val", rng)
        seg = (video_length - 1) / 8
        expect = [
            (int(np.round(seg * i)) + int(np.round(seg * (i + 1)))) // 2
            for i in range(8)
        ]
        assert seq == expect


def test_random_resized_crop_boxes_stay_in_bounds():
    from svit_tpu.data.transform import random_resized_crop

    rng = np.random.default_rng(0)
    x = np.zeros((2, 60, 80, 3), np.float32)
    boxes = np.array([[5.0, 5.0, 70.0, 50.0], [0.0, 0.0, 80.0, 60.0]])
    out, b = random_resized_crop(
        x, 32, 32, rng, scale=(0.3, 1.0), ratio=(0.75, 1.333), boxes=boxes
    )
    assert out.shape == (2, 32, 32, 3)
    assert (b >= 0).all() and (b <= 32).all()
