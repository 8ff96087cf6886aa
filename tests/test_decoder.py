"""Gate-level tests for the encoded-video decode path (no PyAV needed).

Round-1 gap: ``svit_tpu/data/decoder.py`` had never executed because PyAV is
absent in this environment.  ``pyav_decode`` takes the container as an
argument, so fake containers exercise the seek-window math, pts filtering,
frame ordering, fps normalization, and the decode-all fallback; ``decode``
is driven through a stub ``av`` module.
"""

import math
import sys
import types

import numpy as np
import pytest

from svit_tpu.data import decoder


class FakeFrame:
    def __init__(self, pts, idx):
        self.pts = pts
        self._arr = np.full((4, 4, 3), idx % 255, np.uint8)

    def to_rgb(self):
        return self

    def to_ndarray(self):
        return self._arr


class FakeStream:
    def __init__(self, n_frames, fps, duration):
        self.average_rate = fps
        self.frames = n_frames
        self.duration = duration


class FakeContainer:
    """Container with one video stream; pts = frame_index * timebase.

    ``seek`` emulates keyframe seeking by starting decode at the nearest
    earlier multiple of ``keyframe_every`` frames.
    """

    def __init__(self, n_frames, fps=30, timebase=100, keyframe_every=4,
                 known_length=True):
        duration = n_frames * timebase if known_length else None
        self.streams = types.SimpleNamespace(
            video=[FakeStream(n_frames if known_length else 0, fps, duration)]
        )
        self._timebase = timebase
        self._n = n_frames
        self._start = 0
        self._kf = keyframe_every
        self.closed = False
        self.seeks = []

    def seek(self, offset, any_frame=False, backward=True, stream=None):
        self.seeks.append(offset)
        frame_idx = offset // self._timebase
        self._start = (frame_idx // self._kf) * self._kf

    def decode(self, stream):
        for i in range(self._start, self._n):
            yield FakeFrame(i * self._timebase, i)

    def close(self):
        self.closed = True


def _frame_ids(video):
    return [int(video[t, 0, 0, 0]) for t in range(video.shape[0])]


def test_pyav_decode_window_and_order():
    c = FakeContainer(n_frames=64, fps=30)
    video, fps, decode_all = decoder.pyav_decode(
        c, sampling_rate=2, num_frames=8, clip_idx=0, num_clips=2,
    )
    assert fps == 30 and not decode_all and c.closed
    # clip_size = 2*8/30*30 = 16 frames; clip 0 of 2 -> start 0
    start, end = decoder.get_start_end_idx(64, 16, 0, 2)
    ids = _frame_ids(video)
    assert ids[0] >= 0 and ids[-1] <= math.ceil(end)
    assert ids == sorted(ids)
    # the pts window [start, end] must be fully covered
    assert set(range(int(start), int(end) + 1)) <= set(ids)


def test_pyav_decode_seeks_before_window():
    c = FakeContainer(n_frames=64, fps=30)
    decoder.pyav_decode(
        c, sampling_rate=2, num_frames=8, clip_idx=1, num_clips=2,
    )
    # clip 1 of 2 starts mid-video: the decoder must seek, not scan from 0
    assert c.seeks and c.seeks[0] > 0


def test_pyav_decode_fps_normalization():
    # At 60 fps the same (sampling_rate, num_frames) spans twice the frames.
    ids30 = _frame_ids(decoder.pyav_decode(
        FakeContainer(256, fps=30), 2, 8, clip_idx=0, num_clips=1,
    )[0])
    ids60 = _frame_ids(decoder.pyav_decode(
        FakeContainer(256, fps=60), 2, 8, clip_idx=0, num_clips=1,
    )[0])
    span30 = max(ids30) - min(ids30)
    span60 = max(ids60) - min(ids60)
    assert span60 >= 2 * span30 - 2


def test_pyav_decode_unknown_length_decodes_all():
    c = FakeContainer(n_frames=20, known_length=True)
    c.streams.video[0].duration = None
    video, _, decode_all = decoder.pyav_decode(
        c, sampling_rate=2, num_frames=8, clip_idx=0, num_clips=1,
    )
    assert decode_all and video.shape[0] == 20 and not c.seeks


def _stub_av(container):
    mod = types.ModuleType("av")
    mod.open = lambda path: container
    return mod


def test_decode_end_to_end_with_stub_av(monkeypatch):
    monkeypatch.setattr("svit_tpu.native.video.available", lambda: False)
    monkeypatch.setitem(sys.modules, "av", _stub_av(FakeContainer(64)))
    out = decoder.decode("x.mp4", sampling_rate=2, num_frames=8, clip_idx=0,
                         num_clips=2)
    assert out is not None and out.shape == (8, 4, 4, 3)
    assert out.dtype == np.uint8
    ids = _frame_ids(out)
    assert ids == sorted(ids)


def test_decode_torchvision_flag_uses_host_path(monkeypatch):
    monkeypatch.setattr("svit_tpu.native.video.available", lambda: False)
    monkeypatch.setitem(sys.modules, "av", _stub_av(FakeContainer(64)))
    out = decoder.decode("x.mp4", 2, 8, clip_idx=0, num_clips=2,
                         backend="torchvision")
    assert out is not None and out.shape[0] == 8


def test_decode_failure_returns_none(monkeypatch):
    monkeypatch.setattr("svit_tpu.native.video.available", lambda: False)
    mod = types.ModuleType("av")

    def boom(path):
        raise RuntimeError("corrupt container")

    mod.open = boom
    monkeypatch.setitem(sys.modules, "av", mod)
    assert decoder.decode("x.mp4", 2, 8) is None


def test_decode_unknown_backend_returns_none():
    assert decoder.decode("x.mp4", 2, 8, backend="nvdec") is None


def test_temporal_sampling_uniform_and_clipped():
    frames = np.arange(10)[:, None, None, None].repeat(2, 1)
    out = decoder.temporal_sampling(frames, 0, 9, 4)
    np.testing.assert_array_equal(out[:, 0, 0, 0], [0, 3, 6, 9])
    out = decoder.temporal_sampling(frames, -5, 20, 3)
    np.testing.assert_array_equal(out[:, 0, 0, 0], [0, 7, 9])


def test_get_start_end_idx_modes():
    # test mode: uniform placement
    s0, e0 = decoder.get_start_end_idx(100, 20, 0, 4)
    s3, e3 = decoder.get_start_end_idx(100, 20, 3, 4)
    assert s0 == 0 and s3 == 60 and e0 == 19
    # use_offset centers a single clip
    s, e = decoder.get_start_end_idx(100, 20, 0, 1, use_offset=True)
    assert s == 40
    # train mode: random within the slack, reproducible by rng
    rng = np.random.default_rng(0)
    s1, _ = decoder.get_start_end_idx(100, 20, -1, 0, rng=rng)
    assert 0 <= s1 <= 80


# ---- real encoded containers through the native libav shim ----------------
# video_decode.cc also exports a test encoder (mpeg4, gray frames with luma
# 16 + 3*i), so these decode REAL containers: seek, pts filtering, drain,
# RGB conversion, and the full decode() window logic run on actual codec
# output rather than the fakes above.

_native_video = pytest.importorskip("svit_tpu.native.video")
needs_native = pytest.mark.skipif(
    not _native_video.available(), reason="native libav shim unavailable"
)


def _ramp_video(tmp_path, n=60, fps=30, w=64, h=48):
    path = str(tmp_path / "ramp.mp4")
    assert _native_video.encode_gray_ramp(path, w, h, n, fps)
    return path


def _mean_to_index(frame):
    # encoder luma = 16 + 3*i; BT.601 limited->full: rgb = (y-16)*255/219
    return round(float(frame.mean()) * 219 / 255 / 3)


@needs_native
def test_native_probe_and_full_decode(tmp_path):
    path = _ramp_video(tmp_path, n=60)
    fps, nb, dur = _native_video.probe(path)
    assert nb == 60 and dur is not None and 29 <= fps <= 31
    video, pts = _native_video.decode_window(path)
    assert video.shape == (60, 48, 64, 3) and video.dtype == np.uint8
    assert list(pts) == sorted(pts)
    idx = [_mean_to_index(f) for f in video]
    assert idx == list(range(60))


@needs_native
def test_native_decode_window_selects_pts_range(tmp_path):
    path = _ramp_video(tmp_path, n=60)
    _, nb, dur = _native_video.probe(path)
    timebase = dur / nb
    video, pts = _native_video.decode_window(
        path, int(20 * timebase), int(29 * timebase)
    )
    idx = [_mean_to_index(f) for f in video]
    # the pts window maps back to source frames 20..29; the container's
    # stream duration excludes the last frame's span (duration = (n-1) *
    # frame_step), so the derived timebase under-counts and the window's
    # last frame may quantize one short — the PyAV reference math behaves
    # identically (decoder.py pyav_decode `timebase = duration /
    # frames_length`)
    assert idx[0] == 20 and idx[-1] in (28, 29) and idx == sorted(idx)


@needs_native
def test_decode_end_to_end_real_container(tmp_path):
    path = _ramp_video(tmp_path, n=60, fps=30)
    out = decoder.decode(path, sampling_rate=2, num_frames=8, clip_idx=0,
                         num_clips=2, target_fps=30)
    assert out is not None and out.shape == (8, 48, 64, 3)
    ids = [_mean_to_index(f) for f in out]
    # clip 0 of 2: window starts at frame 0, spans ~16 source frames
    assert ids == sorted(ids) and ids[0] <= 2 and 12 <= ids[-1] <= 18


@needs_native
def test_decode_real_container_clip_windows_differ(tmp_path):
    path = _ramp_video(tmp_path, n=60, fps=30)
    first = decoder.decode(path, 2, 8, clip_idx=0, num_clips=3)
    last = decoder.decode(path, 2, 8, clip_idx=2, num_clips=3)
    assert first is not None and last is not None
    # later uniform clip windows sample strictly later source frames
    assert _mean_to_index(last[0]) > _mean_to_index(first[0])
    assert _mean_to_index(last[-1]) > _mean_to_index(first[-1])


@needs_native
def test_decode_real_container_train_mode_rng(tmp_path):
    path = _ramp_video(tmp_path, n=60, fps=30)
    a = decoder.decode(path, 2, 8, clip_idx=-1,
                       rng=np.random.default_rng(7))
    b = decoder.decode(path, 2, 8, clip_idx=-1,
                       rng=np.random.default_rng(7))
    assert a is not None and np.array_equal(a, b)


@needs_native
def test_native_decode_corrupt_file_returns_none(tmp_path):
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"not a container")
    assert decoder.decode(str(bad), 2, 8) is None


@needs_native
def test_kinetics_dataset_end_to_end_real_containers(tmp_path):
    """The full Kinetics path — csv construction, retry loop, native
    container decode, temporal sampling, spatial transform — over real
    mpeg4 files (previously only fake containers ever reached decode)."""
    from svit_tpu.config import assert_and_infer_cfg, get_cfg
    from svit_tpu.data.build import build_dataset

    vids = []
    for i in range(2):
        p = str(tmp_path / f"v{i}.mp4")
        assert _native_video.encode_gray_ramp(p, 64, 48, 60, 30)
        vids.append(p)
    csv = tmp_path / "train.csv"
    csv.write_text("\n".join(f"{p} {i}" for i, p in enumerate(vids)) + "\n")

    cfg = get_cfg()
    cfg.TRAIN.DATASET = "Kinetics"
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
    cfg.DATA.PATH_PREFIX = ""
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 40]
    cfg.AUG.ENABLE = False
    assert_and_infer_cfg(cfg)

    ds = build_dataset("Kinetics", cfg, "train")
    assert len(ds) == 2
    frames, label, index, extra = ds[0]
    assert frames.shape == (8, 32, 32, 3)
    assert label == 0 and index == 0
    # normalized float frames from a real decoded gray ramp
    assert np.isfinite(np.asarray(frames)).all()
