"""Inference demo (reference ``tools/demo_net.py`` + the
``slowfast/visualization/{predictor,async_predictor,demo_loader,
video_visualizer}.py`` stack).

TPU adaptation: cv2/Detectron2 are out of scope (the reference's detection
head import is broken anyway, ``video_model_builder.py:473``); input is a
video file (PyAV, when installed) or a directory of frames; drawing is
PIL-based.  A background thread overlaps host decode with device inference —
the TPU analogue of the reference's async predictor worker pools.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, List

import numpy as np
from PIL import Image, ImageDraw

import jax
import jax.numpy as jnp

from svit_tpu.data import transform
from svit_tpu.models import build_model
from svit_tpu.utils import checkpoint as cu
from svit_tpu.utils import logging

logger = logging.get_logger(__name__)


def load_labels(path: str) -> List[str]:
    import json

    if not path:
        return []
    with open(path) as f:
        data = json.load(f)
    if isinstance(data, dict):
        out = [None] * len(data)
        for name, idx in data.items():
            out[int(idx)] = name
        return out
    return list(data)


def _webcam_source(cfg, src_info=None) -> Iterator[np.ndarray]:
    """Stream RGB frames from camera DEMO.WEBCAM (reference
    ``demo_loader.py:28-47`` uses cv2.VideoCapture; here the native V4L2
    ioctl shim captures directly from /dev/video<N>).  Streams until the
    device stalls or ``SVIT_DEMO_MAX_FRAMES`` frames (0 = unbounded; the
    reference's analogue of quitting the cv2 window)."""
    index = cfg.DEMO.WEBCAM
    limit = int(os.environ.get("SVIT_DEMO_MAX_FRAMES", "0"))
    cap = None
    try:
        # reference-parity path when OpenCV can open the device.  A broad
        # guard on purpose: a cv2 that imports but cannot capture (headless
        # builds, test stubs) must fall back to the native V4L2 shim, like
        # the reference tolerates absent capture backends
        # (slowfast/visualization/demo_loader.py:17-60).
        import cv2

        cap = cv2.VideoCapture(index)
        if not cap.isOpened():
            cap.release()
            cap = None
        else:
            # reference VideoManager sets the requested capture size
            if cfg.DEMO.DISPLAY_WIDTH > 0 and cfg.DEMO.DISPLAY_HEIGHT > 0:
                cap.set(cv2.CAP_PROP_FRAME_WIDTH, cfg.DEMO.DISPLAY_WIDTH)
                cap.set(cv2.CAP_PROP_FRAME_HEIGHT, cfg.DEMO.DISPLAY_HEIGHT)
            if src_info is not None:
                fps = float(cap.get(cv2.CAP_PROP_FPS) or 0)
                if fps > 0:
                    src_info["fps"] = fps
    except Exception:
        cap = None
    if cap is not None:
        n = 0
        try:
            while limit <= 0 or n < limit:
                ok, frame = cap.read()
                if not ok:
                    return
                yield frame[..., ::-1]  # BGR -> RGB
                n += 1
        finally:
            cap.release()
        return
    from svit_tpu.native import camera as ncam

    with ncam.CameraSource(
        index, cfg.DEMO.DISPLAY_WIDTH, cfg.DEMO.DISPLAY_HEIGHT
    ) as cam:
        n = 0
        for frame in cam:
            yield frame
            n += 1
            if limit > 0 and n >= limit:
                return


def frame_source(cfg, src_info=None) -> Iterator[np.ndarray]:
    """Yield RGB uint8 frames from DEMO.INPUT_VIDEO (file or frame dir) or,
    when it is unset and DEMO.WEBCAM >= 0, from the live camera.

    ``src_info``, when a dict, receives ``fps`` once the source's frame
    rate is known (reference ``demo_loader.py``: OUTPUT_FPS == -1 means
    "write at the capture rate")."""
    src = cfg.DEMO.INPUT_VIDEO
    if not src and cfg.DEMO.WEBCAM >= 0:
        yield from _webcam_source(cfg, src_info)
        return
    assert src, "set DEMO.INPUT_VIDEO (file / frame dir) or DEMO.WEBCAM"
    if os.path.isdir(src):
        names = sorted(
            n for n in os.listdir(src) if n.lower().endswith((".jpg", ".png", ".jpeg"))
        )
        for n in names:
            with Image.open(os.path.join(src, n)) as im:
                yield np.asarray(im.convert("RGB"))
        return
    from svit_tpu.native import video as nv

    if nv.available():
        if src_info is not None:
            meta = nv.probe(src)
            if meta and meta[0] > 0:
                src_info["fps"] = meta[0]
        res = nv.decode_window(src)  # native libav shim (PyAV absent here)
        assert res is not None, f"failed to decode {src}"
        frames, _pts = res
        yield from frames
        return
    import av

    with av.open(src) as container:
        stream = container.streams.video[0]
        if src_info is not None and stream.average_rate:
            src_info["fps"] = float(stream.average_rate)
        for frame in container.decode(video=0):
            yield frame.to_rgb().to_ndarray()


class VideoVisualizer:
    """Top-k prediction overlay (PIL) — reference ``video_visualizer.py:45``."""

    def __init__(self, class_names: List[str], top_k: int = 3,
                 thres: float = 0.7, lower_thres: float = 0.3,
                 common_class_names=None, mode: str = "thres"):
        self.class_names = class_names
        self.top_k = top_k
        self.thres = thres
        self.lower_thres = lower_thres
        self.common = set(common_class_names or [])
        self.mode = mode

    def draw_clip(self, frames: List[np.ndarray], preds: np.ndarray):
        order = np.argsort(-preds)[: self.top_k]
        lines = []
        for idx in order:
            score = float(preds[idx])
            name = (
                self.class_names[idx]
                if idx < len(self.class_names)
                else f"class {idx}"
            )
            if self.mode == "thres":
                thres = self.lower_thres if name in self.common else self.thres
                if score < thres:
                    continue
            lines.append(f"{name}: {score:.2f}")
        out = []
        for f in frames:
            img = Image.fromarray(f)
            draw = ImageDraw.Draw(img)
            y = 4
            for line in lines:
                bbox = draw.textbbox((4, y), line)
                draw.rectangle(bbox, fill=(0, 0, 0))
                draw.text((4, y), line, fill=(255, 255, 255))
                y = bbox[3] + 2
            out.append(np.asarray(img))
        return out


class Predictor:
    """Sliding-clip model runner (reference ``predictor.py:20-116``)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.model, self.arch = build_model(cfg)
        S, T = cfg.DATA.TEST_CROP_SIZE, cfg.DATA.NUM_FRAMES
        x0 = jnp.zeros((1, T, S, S, 3), jnp.float32)
        abstract = jax.eval_shape(
            lambda: self.model.init(
                {"params": jax.random.PRNGKey(0)}, x0, deterministic=True
            )
        )
        ckpt = cu.load_test_checkpoint_path(cfg)
        if ckpt:
            tree = cu.load_params_any(ckpt, abstract["params"])
            self.params = tree["params"]
        else:
            self.params = self.model.init(
                {"params": jax.random.PRNGKey(0)}, x0, deterministic=True
            )["params"]
        def _run(params, x):
            logits, extra = self.model.apply(
                {"params": params}, x, deterministic=True
            )
            return logits, extra["pred_bboxes"]

        self._fwd = jax.jit(_run)

    def __call__(self, frames: List[np.ndarray]) -> np.ndarray:
        cfg = self.cfg
        arr = np.stack(frames).astype(np.float32)
        arr = transform.tensor_normalize(arr, cfg.DATA.MEAN, cfg.DATA.STD)
        arr, _ = transform.short_side_scale(arr, cfg.DATA.TEST_CROP_SIZE)
        arr, _ = transform.uniform_crop(arr, cfg.DATA.TEST_CROP_SIZE, 1)
        # temporal subsample to NUM_FRAMES
        idx = np.linspace(0, arr.shape[0] - 1, cfg.DATA.NUM_FRAMES).astype(int)
        clip = jnp.asarray(arr[idx][None])
        preds, pred_bboxes = self._fwd(self.params, clip)
        return np.asarray(preds)[0], np.asarray(pred_bboxes)[0]


def demo(cfg):
    logging.setup_logging(cfg.OUTPUT_DIR)
    predictor = Predictor(cfg)
    class_names = load_labels(cfg.DEMO.LABEL_FILE_PATH)
    vis = VideoVisualizer(
        class_names,
        top_k=cfg.TENSORBOARD.MODEL_VIS.TOPK_PREDS,
        thres=cfg.DEMO.COMMON_CLASS_THRES,
        lower_thres=cfg.DEMO.UNCOMMON_CLASS_THRES,
        common_class_names=cfg.DEMO.COMMON_CLASS_NAMES,
        mode=cfg.DEMO.VIS_MODE,
    )

    seq_len = cfg.DATA.NUM_FRAMES * cfg.DATA.SAMPLING_RATE
    buffer: List[np.ndarray] = []
    out_frames: "queue.Queue" = queue.Queue()
    writer_done = threading.Event()
    src_info: dict = {}

    out_dir = cfg.DEMO.OUTPUT_FILE or os.path.join(cfg.OUTPUT_DIR, "demo_out")
    video_exts = (".mp4", ".avi", ".mkv", ".mov", ".webm")
    as_video = out_dir.lower().endswith(video_exts)

    # Pick the video encoder IN THE MAIN THREAD, before the writer starts:
    # a writer thread dying on import would leave writer_done unset and the
    # demo blocked.  cv2 is probed for a callable VideoWriter (a stub that
    # imports but raises must not be selected); the first-party libav
    # encoder (native/video.py VideoEncoder) is the no-OpenCV home.
    encoder_backend = None
    if as_video:
        try:
            import cv2

            if callable(getattr(cv2, "VideoWriter", None)) and callable(
                getattr(cv2, "VideoWriter_fourcc", None)
            ):
                cv2.VideoWriter_fourcc(*"mp4v")  # stub detector: must work
                encoder_backend = "cv2"
        except Exception:
            pass
        if encoder_backend is None:
            from svit_tpu.native import video as nv

            if nv.encoder_available():
                encoder_backend = "native"
            else:
                logger.warning(
                    "no video encoder available (cv2 absent, native shim "
                    "unbuildable); writing frames to %s instead", out_dir
                )
                as_video = False

    def _output_fps() -> float:
        # reference demo_loader: OUTPUT_FPS == -1 -> write at the source rate
        if cfg.DEMO.OUTPUT_FPS > 0:
            return float(cfg.DEMO.OUTPUT_FPS)
        return float(src_info.get("fps") or 30)

    def writer_thread():
        try:
            if as_video:
                # Reference ``demo_loader.py`` VideoManager semantics:
                # OUTPUT_FILE is an encoded video at DEMO.OUTPUT_FPS.
                writer = None
                close = None
                while True:
                    item = out_frames.get()
                    if item is None:
                        break
                    if writer is None:
                        h, w = item.shape[:2]
                        fps = _output_fps()
                        if encoder_backend == "cv2":
                            import cv2

                            vw = cv2.VideoWriter(
                                out_dir, cv2.VideoWriter_fourcc(*"mp4v"),
                                fps, (w, h),
                            )
                            writer = lambda f: vw.write(f[..., ::-1])
                            close = vw.release
                        else:
                            from svit_tpu.native import video as nv

                            enc = nv.VideoEncoder(out_dir, w, h, fps)
                            writer = enc.write
                            close = enc.close
                    writer(item)
                if close is not None:
                    close()
                return
            os.makedirs(out_dir, exist_ok=True)
            i = 0
            while True:
                item = out_frames.get()
                if item is None:
                    break
                Image.fromarray(item).save(
                    os.path.join(out_dir, f"{i:06d}.jpg")
                )
                i += 1
        except Exception:
            logger.exception("demo writer failed; dropping remaining frames")
        finally:
            writer_done.set()

    t = threading.Thread(target=writer_thread, daemon=True)
    t.start()

    n_clips = 0
    for frame in frame_source(cfg, src_info):
        buffer.append(frame)
        if len(buffer) == seq_len:
            preds, pred_bboxes = predictor(buffer)
            # overlay HAOG object boxes (nearest model frame per input frame)
            from svit_tpu.visualization.draw import draw_haog_boxes

            T = pred_bboxes.shape[0]
            drawn = []
            for fi, f in enumerate(buffer):
                t = min(T - 1, fi * T // len(buffer))
                drawn.append(
                    draw_haog_boxes(
                        f, pred_bboxes[t, :, 1:], pred_bboxes[t, :, 0]
                    )
                )
            for f in vis.draw_clip(drawn, preds):
                out_frames.put(f)
            n_clips += 1
            keep = seq_len // 2 if cfg.DEMO.BUFFER_SIZE == 0 else cfg.DEMO.BUFFER_SIZE
            buffer = buffer[-keep:]
    out_frames.put(None)
    writer_done.wait(timeout=60)
    logger.info("Demo done: %d clips -> %s", n_clips, out_dir)
    return n_clips
