"""HTTP service: the MPS-endpoint contract over a real socket."""

import json
import os
import urllib.error
import urllib.request

import pytest

from fmcw_radar_processing_tpu.config import RadarConfig, default_device_config
from fmcw_radar_processing_tpu.io.raw_format import write_recording
from fmcw_radar_processing_tpu.io.synth import SyntheticTarget, synthesize_recording
from fmcw_radar_processing_tpu.serve.handler import HandlerConfig
from fmcw_radar_processing_tpu.serve.http_service import RadarHttpService


def _post(url, body, timeout=120):
    req = urllib.request.Request(
        url, data=body if isinstance(body, bytes) else json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _get(url, timeout=10):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, json.loads(r.read())


@pytest.fixture
def service(tmp_path):
    """Service over local 'blob' storage holding a small synthetic recording."""
    cfg = RadarConfig.create(default_device_config())
    rec = synthesize_recording(
        cfg, 12, (SyntheticTarget(range_m=6.0, doppler_bin_offset=2),), seed=0
    )
    blob = tmp_path / "blob"
    blob.mkdir()
    write_recording(str(blob / "radar_data"), rec)
    work = tmp_path / "work"
    work.mkdir()
    hc = HandlerConfig(fdata="radar_data", workdir=str(work),
                       storage_spec=f"local:{blob}")
    with RadarHttpService(hc, port=0) as srv:
        yield srv, blob


def test_process_request_contract(service):
    srv, blob = service
    st, res = _post(srv.url + "process", {"processAnimalActivity": "no"})
    assert st == 200 and res["status"] == "success"
    names = [s["step"] for s in res["steps"]]
    assert names == ["Read Files", "Radar Processing", "Upload JSON"]
    assert all(s["status"] == "success" for s in res["steps"])
    # artifacts were uploaded back to the storage root
    uploaded = os.listdir(blob)
    assert "spectrogram_data.json" in uploaded
    assert "radar_data_range_speed_data.json" in uploaded

    st, health = _get(srv.url + "healthz")
    assert st == 200 and health["requests"] == 1 and health["errors"] == 0


def test_service_reuses_compiled_pipeline(service):
    srv, _ = service
    _post(srv.url + "process", {})
    _post(srv.url + "process", {})
    st, health = _get(srv.url + "healthz")
    assert health["requests"] >= 2
    assert len(srv.service._pipelines) == 1  # one shape bucket, one compile


def test_bad_requests(service):
    srv, _ = service
    # malformed JSON body
    try:
        st, res = _post(srv.url + "process", b"{not json")
    except urllib.error.HTTPError as e:
        st, res = e.code, json.loads(e.read())
    assert st == 400 and res["status"] == "error"
    # non-object body
    try:
        st, res = _post(srv.url + "process", b"[1,2]")
    except urllib.error.HTTPError as e:
        st, res = e.code, json.loads(e.read())
    assert st == 400
    # wrong route
    try:
        st, _ = _post(srv.url + "nope", {})
    except urllib.error.HTTPError as e:
        st = e.code
    assert st == 404


def test_concurrent_requests(service):
    """≥4 concurrent POSTs: every request succeeds, the shared jit cache
    serves all threads (one compile), counters are exact under the
    ThreadingHTTPServer's thread-per-request model."""
    import concurrent.futures

    srv, _ = service
    _post(srv.url + "process", {})  # warm the compile cache

    def one(i):
        return _post(srv.url + "process",
                     {"processAnimalActivity": "no"})

    n = 6
    with concurrent.futures.ThreadPoolExecutor(max_workers=n) as ex:
        results = list(ex.map(one, range(n)))
    assert all(st == 200 and res["status"] == "success"
               for st, res in results)
    assert len(srv.service._pipelines) == 1  # shared compiled pipeline
    _, health = _get(srv.url + "healthz")
    assert health["requests"] == n + 1  # exact — no lost counter updates
    assert health["errors"] == 0


def test_processing_error_reported_in_steps(tmp_path):
    """Missing recording → error status with the failing step recorded."""
    hc = HandlerConfig(fdata="missing", workdir=str(tmp_path),
                       storage_spec=f"local:{tmp_path / 'empty-blob'}")
    with RadarHttpService(hc, port=0) as srv:
        st, res = _post(srv.url + "process", {})
        assert st == 200  # MPS contract: outcome in the status field
        assert res["status"] == "error"
        assert res["steps"][-1]["status"] == "error"
        _, health = _get(srv.url + "healthz")
        assert health["errors"] == 1
