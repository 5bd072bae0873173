"""Cross-request classify micro-batching + backpressure (serve/batcher.py).

r5 (VERDICT r4 item 4b): concurrently-arriving /classify requests must
coalesce into one bucketed device batch behind the accelerator lock, and
a full bounded queue must answer 503 instead of queueing unbounded.
"""

import base64
import concurrent.futures
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from fmcw_radar_processing_tpu.serve.batcher import (
    ClassifyBatcher,
    QueueFullError,
)


class _FakeClassifier:
    """Deterministic per-image 'prediction' + recorded batch sizes."""

    classes = ("a", "b")

    def __init__(self, delay_s: float = 0.0):
        self.delay_s = delay_s
        self.batch_sizes: list[int] = []
        self._mu = threading.Lock()

    def classify(self, images):
        with self._mu:
            self.batch_sizes.append(len(images))
        if self.delay_s:
            time.sleep(self.delay_s)
        # Identity fingerprint so each request can check it got ITS rows.
        return [{"label": "a", "score": float(img[0, 0, 0])}
                for img in np.asarray(images)]


def _img(v, shape=(4, 4, 3)):
    return np.full(shape, v, np.float32)


def test_single_request_passthrough():
    clf = _FakeClassifier()
    b = ClassifyBatcher(clf)
    try:
        out = b.classify(np.stack([_img(0.25), _img(0.5)]))
        assert [r["score"] for r in out] == [0.25, 0.5]
        assert clf.batch_sizes == [2]
    finally:
        b.stop()


def test_concurrent_requests_coalesce():
    # A slow forward makes its duration the batching window: requests
    # arriving while batch 1 runs must coalesce into batch 2.
    clf = _FakeClassifier(delay_s=0.15)
    b = ClassifyBatcher(clf)
    try:
        vals = [i / 16.0 for i in range(8)]
        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            futs = [ex.submit(b.classify, _img(v)) for v in vals]
            results = [f.result(timeout=30) for f in futs]
        # Every request got exactly its own image's result.
        for v, out in zip(vals, results):
            assert len(out) == 1 and out[0]["score"] == pytest.approx(v)
        # Fewer forwards than requests ⇒ at least one multi-image batch.
        assert len(clf.batch_sizes) < 8
        assert max(clf.batch_sizes) > 1
        assert sum(clf.batch_sizes) == 8
        assert b.stats["max_batch"] == max(clf.batch_sizes)
    finally:
        b.stop()


def test_queue_full_raises():
    clf = _FakeClassifier(delay_s=0.3)
    b = ClassifyBatcher(clf, max_queue_images=2)
    try:
        first = b.submit(_img(0.1))  # dispatches immediately
        time.sleep(0.05)  # let the dispatcher pick it up
        b.submit(np.stack([_img(0.2), _img(0.3)]))  # fills the queue
        with pytest.raises(QueueFullError):
            b.submit(_img(0.4))
        assert b.stats["rejected"] == 1
        assert first.result(timeout=10)[0]["score"] == pytest.approx(0.1)
    finally:
        b.stop()


def test_oversized_request_admitted_when_idle():
    """A single request larger than the queue bound must be served (the
    classifier chunks internally) — only a NON-empty queue rejects."""
    clf = _FakeClassifier()
    b = ClassifyBatcher(clf, max_queue_images=2)
    try:
        out = b.classify(np.stack([_img(i / 8.0) for i in range(5)]),
                         timeout=30)
        assert [r["score"] for r in out] == pytest.approx(
            [i / 8.0 for i in range(5)])
    finally:
        b.stop()


def test_error_propagates_per_request():
    class Boom(_FakeClassifier):
        def classify(self, images):
            raise RuntimeError("device on fire")

    b = ClassifyBatcher(Boom())
    try:
        with pytest.raises(RuntimeError, match="on fire"):
            b.classify(_img(0.5), timeout=10)
    finally:
        b.stop()


# --------------------------- HTTP integration ---------------------------


def _post(url, data, ctype="application/json", timeout=60):
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": ctype}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _png_bytes(img):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((np.asarray(img) * 255).astype(np.uint8)).save(
        buf, format="PNG")
    return buf.getvalue()


@pytest.fixture
def slow_service(tmp_path):
    """HTTP service over a slow fake classifier with a tiny queue bound."""
    from fmcw_radar_processing_tpu.serve.handler import HandlerConfig
    from fmcw_radar_processing_tpu.serve.http_service import RadarHttpService

    class SlowClassifier(_FakeClassifier):
        input_shape = (8, 8, 3)

        def decode_image_bytes(self, data):
            import io

            from PIL import Image

            with Image.open(io.BytesIO(data)) as im:
                im = im.convert("RGB").resize((8, 8), Image.BILINEAR)
                return np.asarray(im, np.float32) / 255.0

    clf = SlowClassifier(delay_s=0.25)
    hc = HandlerConfig(fdata="radar_data", workdir=str(tmp_path),
                       storage_spec=f"local:{tmp_path / 'blob'}")
    with RadarHttpService(hc, port=0, classifier=clf,
                          classify_queue_images=2) as srv:
        yield srv, clf


def test_http_queue_depth_backpressure(slow_service):
    """Under a 12-way burst with queue bound 2, some requests must get
    503 (backpressure) while the served ones coalesce into batches."""
    srv, clf = slow_service
    png = _png_bytes(np.full((8, 8, 3), 0.5))
    with concurrent.futures.ThreadPoolExecutor(12) as ex:
        futs = [ex.submit(_post, srv.url + "classify", png, "image/png")
                for _ in range(12)]
        codes = [f.result()[0] for f in futs]
    assert codes.count(200) >= 1
    assert codes.count(503) >= 1
    assert codes.count(200) + codes.count(503) == 12
    # healthz reports the batching stats.
    with urllib.request.urlopen(srv.url + "healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["classify_batching"]["batches"] >= 1
    assert health["classify_batching"]["rejected"] >= 1
    assert health["classify_batching"]["batched_images"] == codes.count(200)
