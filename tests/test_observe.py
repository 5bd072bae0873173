"""Observability: stage timers, event log, pipeline integration."""

import io
import json
import time

import numpy as np

from fmcw_radar_processing_tpu.pipeline.recording import RadarPipeline
from fmcw_radar_processing_tpu.utils.observe import (
    NullTimer,
    StageTimer,
    log_event,
)

from .conftest import make_recording


def test_stage_timer_records_and_reports():
    t = StageTimer()
    with t.stage("a", items=100):
        time.sleep(0.01)
    with t.stage("b"):
        pass
    with t.stage("a", items=50):  # accumulates
        time.sleep(0.01)
    rep = t.report()
    assert set(rep) == {"a", "b"}
    assert rep["a"]["items"] == 150
    assert rep["a"]["seconds"] >= 0.02
    assert rep["a"]["items_per_s"] > 0
    assert abs(sum(r["share"] for r in rep.values()) - 1.0) < 0.01
    text = t.pretty()
    assert "a" in text and "total" in text


def test_stage_timer_syncs_device_values():
    import jax.numpy as jnp

    t = StageTimer()
    with t.stage("compute"):
        x = t.observe(jnp.arange(8) * 2)
    assert t.records["compute"].seconds > 0
    np.testing.assert_array_equal(np.asarray(x), np.arange(8) * 2)


def test_null_timer_is_transparent():
    t = NullTimer()
    with t.stage("x", items=5):
        v = t.observe(42)
    assert v == 42 and t.records == {}


def test_log_event_json_line():
    buf = io.StringIO()
    rec = log_event("upload", stream=buf, name="a.json", ok=True)
    line = json.loads(buf.getvalue())
    assert line["event"] == "upload" and line["name"] == "a.json"
    assert line["ok"] is True and rec["event"] == "upload"


def test_pipeline_with_timer(cfg, rng):
    frames, calib = make_recording(cfg, num_frames=8, rng=rng)
    t = StageTimer()
    pipe = RadarPipeline(cfg)
    out = pipe.process_recording(np.swapaxes(frames, -1, -2), calib, timer=t)
    assert {"frame_chain", "stft", "payload_build"} <= set(t.records)
    assert t.records["frame_chain"].items == 8
    assert out.waterfall.shape[1] == 8
