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


def _webcam_source(cfg) -> Iterator[np.ndarray]:
    """Stream RGB frames from camera DEMO.WEBCAM (reference
    ``demo_loader.py:28-47`` uses cv2.VideoCapture; here the native V4L2
    ioctl shim captures directly from /dev/video<N>).  Streams until the
    device stalls or ``SVIT_DEMO_MAX_FRAMES`` frames (0 = unbounded; the
    reference's analogue of quitting the cv2 window)."""
    index = cfg.DEMO.WEBCAM
    limit = int(os.environ.get("SVIT_DEMO_MAX_FRAMES", "0"))
    cap = None
    try:
        import cv2  # reference-parity path when OpenCV can open the device

        cap = cv2.VideoCapture(index)
        if not cap.isOpened():
            cap.release()
            cap = None
    except ImportError:
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


def frame_source(cfg) -> Iterator[np.ndarray]:
    """Yield RGB uint8 frames from DEMO.INPUT_VIDEO (file or frame dir) or,
    when it is unset and DEMO.WEBCAM >= 0, from the live camera."""
    src = cfg.DEMO.INPUT_VIDEO
    if not src and cfg.DEMO.WEBCAM >= 0:
        yield from _webcam_source(cfg)
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
        res = nv.decode_window(src)  # native libav shim (PyAV absent here)
        assert res is not None, f"failed to decode {src}"
        frames, _pts = res
        yield from frames
        return
    import av

    with av.open(src) as container:
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

    out_dir = cfg.DEMO.OUTPUT_FILE or os.path.join(cfg.OUTPUT_DIR, "demo_out")
    video_exts = (".mp4", ".avi", ".mkv", ".mov", ".webm")
    as_video = out_dir.lower().endswith(video_exts)

    def writer_thread():
        if as_video:
            # Reference ``demo_loader.py`` VideoManager: OUTPUT_FILE is an
            # encoded video via cv2.VideoWriter at DEMO.OUTPUT_FPS.
            import cv2

            fps = cfg.DEMO.OUTPUT_FPS if cfg.DEMO.OUTPUT_FPS > 0 else 30
            writer = None
            while True:
                item = out_frames.get()
                if item is None:
                    break
                if writer is None:
                    h, w = item.shape[:2]
                    writer = cv2.VideoWriter(
                        out_dir, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
                    )
                writer.write(item[..., ::-1])  # RGB -> BGR
            if writer is not None:
                writer.release()
            writer_done.set()
            return
        os.makedirs(out_dir, exist_ok=True)
        i = 0
        while True:
            item = out_frames.get()
            if item is None:
                break
            Image.fromarray(item).save(os.path.join(out_dir, f"{i:06d}.jpg"))
            i += 1
        writer_done.set()

    t = threading.Thread(target=writer_thread, daemon=True)
    t.start()

    n_clips = 0
    for frame in frame_source(cfg):
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
