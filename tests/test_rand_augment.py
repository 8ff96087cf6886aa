"""RandAugment policy semantics tests."""

import numpy as np
from PIL import Image

from svit_tpu.data.rand_augment import RandAugment, rand_augment_transform


def _frames(n=3, seed=0):
    rng = np.random.RandomState(seed)
    return [
        Image.fromarray(rng.randint(0, 255, (40, 48, 3), dtype=np.uint8))
        for _ in range(n)
    ]


def test_config_string_parsing():
    ra = rand_augment_transform("rand-m7-n4-mstd0.5-inc1")
    assert ra.magnitude == 7
    assert ra.num_layers == 4
    assert ra.magnitude_std == 0.5
    assert "PosterizeIncreasing" in ra.transforms
    ra2 = rand_augment_transform("rand-m9-n2")
    assert ra2.magnitude == 9 and ra2.num_layers == 2
    assert "Posterize" in ra2.transforms


def test_same_plan_applied_to_all_frames():
    """The sampled ops replay identically across a clip (the reference's
    _make_det_and_get_state_dict design): augmenting a clip of identical
    frames must keep them identical."""
    base = _frames(1)[0]
    clip = [base.copy() for _ in range(4)]
    ra = rand_augment_transform(
        "rand-m9-n4-mstd0.5-inc1", rng=np.random.default_rng(3)
    )
    out = ra(clip)
    arrs = [np.asarray(f) for f in out]
    for a in arrs[1:]:
        np.testing.assert_array_equal(arrs[0], a)


def test_rng_determinism():
    f1 = ra_out(seed=5)
    f2 = ra_out(seed=5)
    np.testing.assert_array_equal(f1, f2)
    f3 = ra_out(seed=6)
    assert not np.array_equal(f1, f3)  # different seed -> different aug


def ra_out(seed):
    ra = rand_augment_transform(
        "rand-m9-n4-mstd0.5-inc1", rng=np.random.default_rng(seed)
    )
    return np.asarray(ra(_frames(1))[0])


def test_box_affine_consistency_translate():
    """A translated box must follow the translated pixels exactly."""
    img = Image.new("RGB", (64, 64), (0, 0, 0))
    # white square at [16, 32) x [16, 32)
    arr = np.array(img)
    arr[16:32, 16:32] = 255
    img = Image.fromarray(arr)
    boxes = np.array([[[16.0, 16.0, 32.0, 32.0]]])  # [T=1, O=1, 4] xyxy

    ra = RandAugment("rand-m5-n1", with_boxes=True, rng=np.random.default_rng(0))
    # force a known plan: translate x by +0.25 of width (16 px)
    ra._sample_plan = lambda: [("TranslateXRel", True, 0.25)]
    frames, out_boxes = ra([img], boxes=boxes)
    out = np.asarray(frames[0])

    # pixels moved LEFT or RIGHT consistently with the box
    b = out_boxes[0, 0]
    ys, xs = np.nonzero(out.sum(-1) > 700)
    assert len(xs) > 0
    np.testing.assert_allclose(
        [xs.min(), xs.max() + 1], [b[0], b[2]], atol=1.5
    )
    np.testing.assert_allclose(
        [ys.min(), ys.max() + 1], [b[1], b[3]], atol=1.5
    )


def test_box_zero_stays_zero():
    img = _frames(1)[0]
    boxes = np.zeros((1, 4, 4), np.float32)
    ra = RandAugment("rand-m9-n3-inc1", with_boxes=True, rng=np.random.default_rng(1))
    _, out_boxes = ra([img], boxes=boxes)
    np.testing.assert_array_equal(out_boxes, 0)
