"""Serving stack test: real HTTP server, concurrent requests, batching."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from tests.fixtures import make_ssv2_fixture
from tests.test_train_engine import _tiny_cfg


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from http.server import ThreadingHTTPServer

    from svit_tpu.serving.server import BatchedPredictor, make_handler

    root = tmp_path_factory.mktemp("ssv2")
    make_ssv2_fixture(str(root))
    cfg = _tiny_cfg(str(root), str(tmp_path_factory.mktemp("out")))
    predictor = BatchedPredictor(cfg, max_batch=4, window_ms=30)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(predictor))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    predictor.stop()


def _post_clip(url, n_frames=8, seed=0):
    rng = np.random.RandomState(seed)
    frames = []
    for _ in range(n_frames):
        img = Image.fromarray(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        frames.append(base64.b64encode(buf.getvalue()).decode())
    req = urllib.request.Request(
        url + "/predict",
        data=json.dumps({"frames": frames}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as resp:
        data = json.loads(resp.read())
    assert data["status"] == "ok"


def test_predict_single(server):
    out = _post_clip(server)
    assert len(out["top_k"]) == 5
    assert 0.0 <= out["top_k"][0]["score"] <= 1.0
    boxes = np.asarray(out["pred_bboxes"])
    assert boxes.shape == (4, 4, 5)  # T=4 frames, O=4, (score+cxcywh)


def test_predict_concurrent_batching(server):
    results = [None] * 4
    errors = []

    def call(i):
        try:
            results[i] = _post_clip(server, seed=i)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert all(r is not None for r in results)
    # different inputs -> generally different scores
    s0 = results[0]["top_k"][0]["score"]
    assert isinstance(s0, float)


def test_predict_bad_payload(server):
    req = urllib.request.Request(
        server + "/predict",
        data=json.dumps({"frames": []}).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
        assert "error" in json.loads(e.read())
    assert raised
