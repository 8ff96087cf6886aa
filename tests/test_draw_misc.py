"""Drawing utils + model-stats tests."""

import numpy as np


def test_draw_haog_boxes():
    from svit_tpu.visualization.draw import draw_clip_haog, draw_haog_boxes

    frame = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array(
        [[0.5, 0.5, 0.4, 0.4], [0.2, 0.2, 0.2, 0.2], [0, 0, 0, 0], [0.8, 0.8, 0.1, 0.1]],
        np.float32,
    )
    scores = np.array([0.9, 0.3, 0.9, 0.9])
    out = draw_haog_boxes(frame, boxes, scores, score_thresh=0.5)
    assert out.shape == frame.shape
    assert out.sum() > 0  # something was drawn
    # low-score box (idx 1) region untouched
    clip = draw_clip_haog(
        np.zeros((2, 64, 64, 3), np.uint8),
        np.concatenate([scores.reshape(1, 4, 1).repeat(2, 0),
                        boxes[None].repeat(2, 0)], axis=-1),
    )
    assert len(clip) == 2


def test_params_count_and_nan_guard():
    import pytest

    from svit_tpu.utils.misc import check_nan_losses, params_count

    params = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(5)}}
    assert params_count(params) == 11
    check_nan_losses(1.0)
    with pytest.raises(RuntimeError):
        check_nan_losses(float("nan"))
