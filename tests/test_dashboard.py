"""Dashboard server: manifest classification, routes, traversal guard."""

import json
import os
import urllib.request

import pytest

from fmcw_radar_processing_tpu.serve.dashboard import (
    DashboardServer,
    build_manifest,
)


@pytest.fixture
def payload_dir(tmp_path):
    files = {
        "spectrogram_data.json": {"time": [0.1], "frequency": [1.0],
                                  "intensity": [[-3.0]]},
        "rec_range_fft_data.json": {"time_axis": [0.0],
                                    "array_bin_range": [0.0],
                                    "range_tx1rx1_max_abs": [[1.0]],
                                    "filename": "rec"},
        "rec_range_speed_data.json": {"time_axis": [0.0], "range": [[1.5]],
                                      "speed": [[0.0]], "filename": "rec"},
        "rec_fft_data.json": {"range_bins": [0], "magnitude": [2.0],
                              "frame_index": 1, "filename": "rec"},
        "rec_spectrogram_batch_1.json": {"time": [], "frequency": [],
                                         "intensity": []},
    }
    for name, payload in files.items():
        (tmp_path / name).write_text(json.dumps(payload))
    (tmp_path / "spectrogram.png").write_bytes(b"\x89PNG\r\n\x1a\nfake")
    return str(tmp_path)


def test_manifest_classification(payload_dir):
    man = build_manifest(payload_dir)
    assert man["name"] == "rec"
    assert man["spectrogram"] == "spectrogram_data.json"
    assert man["range_fft"] == "rec_range_fft_data.json"
    assert man["range_speed"] == "rec_range_speed_data.json"
    assert man["fft_snapshot"] == "rec_fft_data.json"
    assert man["png"] == "spectrogram.png"
    assert man["batches"] == ["rec_spectrogram_batch_1.json"]


def test_manifest_empty_dir(tmp_path):
    man = build_manifest(str(tmp_path))
    assert man["spectrogram"] is None and man["batches"] == []
    man = build_manifest(str(tmp_path / "missing"))  # nonexistent dir: no raise
    assert man["range_fft"] is None


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.status, r.read(), r.headers.get("Content-Type", "")


def test_http_routes(payload_dir):
    with DashboardServer(payload_dir, port=0) as srv:
        st, body, ct = _get(srv.url)
        assert st == 200 and b"FMCW Radar Monitoring" in body
        assert "text/html" in ct

        st, body, ct = _get(srv.url + "api/manifest")
        assert st == 200 and json.loads(body)["name"] == "rec"

        st, body, ct = _get(srv.url + "data/rec_fft_data.json")
        assert st == 200 and json.loads(body)["frame_index"] == 1
        assert ct == "application/json"

        st, body, ct = _get(srv.url + "data/spectrogram.png")
        assert st == 200 and body.startswith(b"\x89PNG") and ct == "image/png"


def test_http_missing_and_traversal(payload_dir, tmp_path):
    secret = tmp_path.parent / "secret.txt"
    secret.write_text("private")
    with DashboardServer(payload_dir, port=0) as srv:
        for path in ("data/nope.json", "bogus", "data/../secret.txt",
                     "data/..%2fsecret.txt"):
            try:
                st, _, _ = _get(srv.url + path)
            except urllib.error.HTTPError as e:
                st = e.code
            assert st == 404, path
