"""Raw container round-trip, synthetic ground truth, storage backends."""

import numpy as np
import pytest

from fmcw_radar_processing_tpu.config import (
    default_device_config,
    device_config_from_xml,
)
from fmcw_radar_processing_tpu.config.loaders import device_config_to_xml
from fmcw_radar_processing_tpu.io.raw_format import (
    RawRecording,
    read_raw_bin,
    read_recording,
    write_raw_bin,
    write_recording,
)
from fmcw_radar_processing_tpu.io.storage import LocalStorage, get_storage
from fmcw_radar_processing_tpu.io.synth import SyntheticTarget, synthesize_recording
from fmcw_radar_processing_tpu.pipeline.recording import RadarPipeline


def test_xml_roundtrip():
    dev = default_device_config()
    xml = device_config_to_xml(dev)
    assert device_config_from_xml(xml) == dev


def test_raw_bin_roundtrip(cfg, tmp_path, rng):
    rec = synthesize_recording(cfg, 6, (SyntheticTarget(range_m=7.5),), seed=3)
    path = str(tmp_path / "r.raw.bin")
    write_raw_bin(path, rec)
    back = read_raw_bin(path)
    np.testing.assert_array_equal(back.frames, rec.frames)
    np.testing.assert_array_equal(back.calib, rec.calib)


def test_recording_pair_roundtrip(cfg, tmp_path):
    rec = synthesize_recording(cfg, 4, (SyntheticTarget(range_m=10.0),))
    base = str(tmp_path / "radar_data")
    write_recording(base, rec)
    back = read_recording(base)
    assert back.device == cfg.device
    np.testing.assert_array_equal(back.frames, rec.frames)


def test_shape_mismatch_rejected(cfg, tmp_path):
    import dataclasses

    rec = synthesize_recording(cfg, 2, ())
    bad_dev = dataclasses.replace(cfg.device, num_samples_per_chirp=32)
    rec.device = bad_dev
    base = str(tmp_path / "radar_data")
    with pytest.raises(ValueError, match="disagrees"):
        write_recording(base, rec)
        read_recording(base)


def test_synthetic_ground_truth_detected(cfg):
    """The chain must recover exactly the synthesized range bin and speed."""
    tgt = SyntheticTarget(range_m=7.5, doppler_bin_offset=3, amplitude=4.0)
    rec = synthesize_recording(cfg, 8, (tgt,), seed=1)
    pipe = RadarPipeline(cfg)
    out = pipe.process_recording(rec.rx1(), rec.calib_vector(0, cfg.nts))
    assert out.detected.all()
    expect_bin = tgt.range_bin(cfg)
    np.testing.assert_allclose(
        out.target_range[0], expect_bin * cfg.derived.dist_per_bin, rtol=1e-6
    )
    np.testing.assert_allclose(
        out.target_speed[0], tgt.reported_speed(cfg), rtol=1e-5
    )


def test_synthetic_presence_mask(cfg):
    present = np.array([True, True, False, True, False, True])
    rec = synthesize_recording(
        cfg, 6, (SyntheticTarget(range_m=7.5),), target_present=present, seed=2
    )
    pipe = RadarPipeline(cfg)
    out = pipe.process_recording(rec.rx1(), rec.calib_vector(0, cfg.nts))
    np.testing.assert_array_equal(out.detected, present)


def test_calibration_vector_decimation(cfg):
    rec = synthesize_recording(cfg, 1, (), n_cal_factor=4)
    v = rec.calib_vector(0, cfg.nts)
    assert v.shape == (cfg.nts,)
    np.testing.assert_allclose(v.real, rec.calib[0, 0, ::4], rtol=1e-6)


def test_local_storage_roundtrip(tmp_path):
    store = LocalStorage(str(tmp_path / "blobs"))
    src = tmp_path / "x.json"
    src.write_text('{"a": 1}')
    store.put(str(src), "x.json", "application/json")
    dest = tmp_path / "y.json"
    store.get("x.json", str(dest))
    assert dest.read_text() == '{"a": 1}'
    with pytest.raises(FileNotFoundError):
        store.get("missing.json", str(dest))


def test_get_storage_spec(tmp_path):
    s = get_storage(f"local:{tmp_path}/b")
    assert isinstance(s, LocalStorage)
    with pytest.raises(ValueError):
        get_storage("ftp://nope")
