"""AzureBlobStorage over a stdlib HTTP stub (VERDICT r2 item 6).

Exercises the previously-untested Azure path end-to-end against an
in-process ``http.server``: GET download, PUT upload with the BlockBlob
headers + SAS query string the reference's uploaders send
(read_data_from_blob_storage.m:12-27, send_json_string_to_blob_storage.m:
18-27, send_picture_to_blob_storage.m:39-74), the Azure-error-body decode
on failure, and ``_retry``'s backoff-then-succeed behavior from the serving
handler.
"""

from __future__ import annotations

import http.server
import threading
import urllib.parse

import pytest

from fmcw_radar_processing_tpu.io.storage import AzureBlobStorage


class _BlobStub(http.server.BaseHTTPRequestHandler):
    """Minimal Azure-Blob-shaped store: /container/name?sas GET/PUT."""

    store: dict[str, bytes] = {}
    requests: list[dict] = []
    fail_next: list[int] = []  # HTTP codes to return before succeeding

    def _record(self):
        parsed = urllib.parse.urlparse(self.path)
        rec = {
            "method": self.command,
            "path": parsed.path,
            "query": parsed.query,
            "headers": {k.lower(): v for k, v in self.headers.items()},
        }
        type(self).requests.append(rec)
        return rec

    def do_GET(self):
        rec = self._record()
        if type(self).fail_next:
            self.send_error(type(self).fail_next.pop(0))
            return
        body = type(self).store.get(rec["path"])
        if body is None:
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_PUT(self):
        rec = self._record()
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        if type(self).fail_next:
            code = type(self).fail_next.pop(0)
            # Azure-style XML error body (what the reference decodes,
            # send_picture_to_blob_storage.m:61-74).
            err = b"<Error><Code>ServerBusy</Code></Error>"
            self.send_response(code)
            self.send_header("Content-Length", str(len(err)))
            self.end_headers()
            self.wfile.write(err)
            return
        if "sig=" not in rec["query"]:
            self.send_error(403)  # SAS required for writes
            return
        type(self).store[rec["path"]] = body
        self.send_response(201)  # Azure returns 201 Created
        self.end_headers()

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture
def stub():
    _BlobStub.store = {}
    _BlobStub.requests = []
    _BlobStub.fail_next = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _BlobStub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, _BlobStub
    srv.shutdown()


def _make(srv, **kw):
    kw.setdefault("sas_token", "sv=2024&sig=test")
    return AzureBlobStorage(
        account="fypblobstorage", container="fyp-data",
        endpoint=f"http://127.0.0.1:{srv.server_address[1]}",
        timeout=5.0, **kw,
    )


def test_put_sends_blockblob_headers_and_sas(stub, tmp_path):
    srv, S = stub
    az = _make(srv)
    p = tmp_path / "radar_data_range_fft_data.json"
    p.write_text('{"a": 1}')
    az.put(str(p), p.name, "application/json")

    assert S.store["/fyp-data/radar_data_range_fft_data.json"] == b'{"a": 1}'
    req = S.requests[-1]
    assert req["method"] == "PUT"
    assert req["query"] == "sv=2024&sig=test"
    assert req["headers"]["x-ms-blob-type"] == "BlockBlob"
    assert req["headers"]["content-type"] == "application/json"
    assert req["headers"]["content-length"] == "8"


def test_put_png_content_type(stub, tmp_path):
    srv, S = stub
    az = _make(srv)
    p = tmp_path / "spectrogram.png"
    p.write_bytes(b"\x89PNG\r\n\x1a\n000")
    az.put(str(p), p.name, "image/png")
    assert S.requests[-1]["headers"]["content-type"] == "image/png"
    assert S.store["/fyp-data/spectrogram.png"].startswith(b"\x89PNG")


def test_get_roundtrip(stub, tmp_path):
    srv, S = stub
    S.store["/fyp-data/radar_data.xml"] = b"<Device/>"
    az = _make(srv)
    dest = tmp_path / "radar_data.xml"
    az.get("radar_data.xml", str(dest))
    assert dest.read_bytes() == b"<Device/>"
    assert S.requests[-1]["query"] == "sv=2024&sig=test"


def test_put_error_decodes_azure_body(stub, tmp_path):
    srv, S = stub
    S.fail_next = [503, 503, 503, 503, 503]  # never succeed
    az = _make(srv)
    p = tmp_path / "x.json"
    p.write_text("{}")
    with pytest.raises(RuntimeError, match="HTTP 503.*ServerBusy"):
        az.put(str(p), "x.json", "application/json")


def test_missing_sas_rejected_like_azure(stub, tmp_path):
    srv, S = stub
    az = _make(srv, sas_token="")
    p = tmp_path / "x.json"
    p.write_text("{}")
    with pytest.raises(RuntimeError, match="HTTP 403"):
        az.put(str(p), "x.json", "application/json")


def test_handler_retry_recovers_from_5xx(stub, tmp_path):
    """_retry + AzureBlobStorage: two 503s then success (the serving
    handler's backoff loop, serve/handler.py)."""
    from fmcw_radar_processing_tpu.serve.handler import _retry

    srv, S = stub
    S.fail_next = [503, 503]
    az = _make(srv)
    p = tmp_path / "y.json"
    p.write_text('{"ok": true}')
    _retry(lambda: az.put(str(p), "y.json", "application/json"),
           retries=3, backoff=0.01)
    assert S.store["/fyp-data/y.json"] == b'{"ok": true}'
    puts = [r for r in S.requests if r["method"] == "PUT"]
    assert len(puts) == 3  # 2 failures + 1 success


def test_get_retry_then_success(stub, tmp_path):
    from fmcw_radar_processing_tpu.serve.handler import _retry

    srv, S = stub
    S.store["/fyp-data/radar_data.raw.bin"] = b"\x00" * 64
    S.fail_next = [500]
    az = _make(srv)
    dest = tmp_path / "radar_data.raw.bin"
    _retry(lambda: az.get("radar_data.raw.bin", str(dest)),
           retries=3, backoff=0.01)
    assert dest.read_bytes() == b"\x00" * 64


def test_default_endpoint_is_public_azure():
    az = AzureBlobStorage(account="acct", container="c", sas_token="sig=s")
    assert az._url("b.json") == (
        "https://acct.blob.core.windows.net/c/b.json?sig=s"
    )
