"""cv2 shim for importing the reference: PIL-backed decode (BGR semantics,
matching cv2), everything else unimplemented."""

import io

import numpy as np

IMREAD_COLOR = 1
COLOR_BGR2RGB = 4
INTER_LINEAR = 1
INTER_NEAREST = 0


def imdecode(buf, flags=IMREAD_COLOR):
    """cv2 semantics: returns uint8 [H, W, C] in BGR order, or None."""
    from PIL import Image

    try:
        with Image.open(io.BytesIO(np.asarray(buf, np.uint8).tobytes())) as im:
            rgb = np.asarray(im.convert("RGB"))
    except Exception:
        return None
    return np.ascontiguousarray(rgb[:, :, ::-1])


def imread(path, flags=IMREAD_COLOR):
    try:
        with open(path, "rb") as f:
            return imdecode(np.frombuffer(f.read(), np.uint8), flags)
    except OSError:
        return None


def cvtColor(img, code):
    if code == COLOR_BGR2RGB:
        return np.ascontiguousarray(img[:, :, ::-1])
    raise NotImplementedError(code)


def __getattr__(k):
    def f(*a, **kw):
        raise NotImplementedError(k)

    return f
