"""Classifier inference: artifact round-trip, batching, /classify endpoint.

The reference serves its trained model as "AI classification through API
calls" (reference README.md:20); these tests hold the rebuilt inference
path to that contract: train → export artifact → load in a fresh service
→ identical predictions over HTTP.
"""

import base64
import io
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from fmcw_radar_processing_tpu.models.infer import (
    SpectrogramClassifier,
    export_classifier,
)
from fmcw_radar_processing_tpu.models.train import TrainConfig, Trainer
from fmcw_radar_processing_tpu.models.vgg import SmallCNN

SHAPE = (16, 16, 3)
CLASSES = ("calf", "human")


def _png_bytes(img01: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((img01 * 255).astype(np.uint8)).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    """A briefly-trained SmallCNN exported as an inference artifact."""
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (16, *SHAPE)).astype(np.float32)
    y = (np.arange(16) % 2).astype(np.float32)
    trainer = Trainer(
        SmallCNN(), TrainConfig(epochs=1, batch_size=8, augment=False),
        input_shape=SHAPE,
    )
    trainer.fit(x, y)
    path = tmp_path_factory.mktemp("clf") / "artifact"
    export_classifier(str(path), "small", trainer.state.params, SHAPE, CLASSES)
    return str(path), trainer, x


def test_artifact_roundtrip_matches_trainer(artifact):
    path, trainer, x = artifact
    clf = SpectrogramClassifier.load(path)
    assert clf.classes == CLASSES and clf.input_shape == SHAPE
    probs = clf.predict_proba(x)
    _, _, ref = trainer.evaluate(x, np.zeros(len(x), np.float32))
    np.testing.assert_allclose(probs, ref, rtol=1e-5, atol=1e-6)


def test_classify_labels_and_threshold(artifact):
    path, _, x = artifact
    clf = SpectrogramClassifier.load(path)
    results = clf.classify(x)
    probs = clf.predict_proba(x)
    for r, p in zip(results, probs):
        assert r["label"] == CLASSES[int(p > 0.5)]
        assert 0.5 <= r["probability"] <= 1.0  # prob of the chosen class
        assert abs(r["score"] - p) < 1e-6


def test_bucketed_batching_consistency(artifact):
    """Any request size gives the same per-image result (pad + chunk)."""
    path, _, x = artifact
    clf = SpectrogramClassifier.load(path)
    one = np.concatenate([clf.predict_proba(x[i:i + 1]) for i in range(7)])
    batch = clf.predict_proba(x[:7])  # pads 7 → bucket 8
    # bf16 conv reductions may re-associate across batch sizes: loose tol.
    np.testing.assert_allclose(one, batch, rtol=5e-4, atol=5e-4)
    big = np.tile(x, (9, 1, 1, 1))  # 144 images → chunks of 64
    probs = clf.predict_proba(big)
    np.testing.assert_allclose(probs[:16], probs[64:80], rtol=1e-5, atol=1e-6)


def test_shape_mismatch_rejected(artifact):
    path, _, _ = artifact
    clf = SpectrogramClassifier.load(path)
    with pytest.raises(ValueError, match="expected images of shape"):
        clf.predict_proba(np.zeros((1, 8, 8, 3), np.float32))


def test_load_missing_artifact(tmp_path):
    with pytest.raises(FileNotFoundError, match="not a classifier artifact"):
        SpectrogramClassifier.load(str(tmp_path / "nope"))


def test_decode_image_bytes_resizes(artifact):
    path, _, _ = artifact
    clf = SpectrogramClassifier.load(path)
    img = np.random.default_rng(1).uniform(0, 1, (40, 52, 3))
    arr = clf.decode_image_bytes(_png_bytes(img))
    assert arr.shape == SHAPE and 0.0 <= arr.min() and arr.max() <= 1.0


# --------------------------- HTTP /classify ---------------------------


def _post(url, data, ctype="application/json", timeout=60):
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": ctype}, method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture
def http_service(artifact, tmp_path):
    from fmcw_radar_processing_tpu.serve.handler import HandlerConfig
    from fmcw_radar_processing_tpu.serve.http_service import RadarHttpService

    path, _, _ = artifact
    hc = HandlerConfig(fdata="radar_data", workdir=str(tmp_path),
                       storage_spec=f"local:{tmp_path / 'blob'}")
    with RadarHttpService(hc, port=0, classifier_artifact=path) as srv:
        yield srv


def test_classify_endpoint_raw_png(http_service, artifact):
    _, _, x = artifact
    st, res = _post(http_service.url + "classify", _png_bytes(x[0]),
                    ctype="image/png")
    assert st == 200 and res["status"] == "success"
    assert res["classes"] == list(CLASSES)
    (pred,) = res["predictions"]
    assert pred["label"] in CLASSES and 0.0 <= pred["score"] <= 1.0


def test_classify_endpoint_json_batch(http_service, artifact):
    path, _, x = artifact
    blobs = [_png_bytes(x[i]) for i in range(3)]
    body = json.dumps({
        "images_b64": [base64.b64encode(b).decode() for b in blobs]
    }).encode()
    st, res = _post(http_service.url + "classify", body)
    assert st == 200 and len(res["predictions"]) == 3
    # HTTP path agrees with direct classification
    clf = SpectrogramClassifier.load(path)
    direct = clf.classify_bytes(blobs)
    for a, b in zip(res["predictions"], direct):
        assert a["label"] == b["label"]
        assert abs(a["score"] - b["score"]) < 1e-5


def test_classify_endpoint_bad_requests(http_service):
    st, res = _post(http_service.url + "classify", b"{not json")
    assert st == 400 and res["status"] == "error"
    st, res = _post(http_service.url + "classify", json.dumps({}).encode())
    assert st == 400
    st, res = _post(http_service.url + "classify",
                    json.dumps({"image_b64": base64.b64encode(b"junk").decode()}).encode())
    assert st == 400 and "classification failed" in res["message"]


def test_classify_endpoint_absent_without_artifact(tmp_path):
    from fmcw_radar_processing_tpu.serve.handler import HandlerConfig
    from fmcw_radar_processing_tpu.serve.http_service import RadarHttpService

    hc = HandlerConfig(fdata="radar_data", workdir=str(tmp_path),
                       storage_spec=f"local:{tmp_path / 'blob'}")
    with RadarHttpService(hc, port=0) as srv:
        st, res = _post(srv.url + "classify", b"{}")
        assert st == 503 and "no classifier loaded" in res["message"]
