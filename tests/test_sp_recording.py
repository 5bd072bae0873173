"""Sharded long-signal recording export vs the single-device pipeline.

The integrated sp path (parallel/sp_recording.py) — dp chain → global
packing → halo-exchange ShardedStft → sharded rescale → host-0 payload —
must reproduce RadarPipeline.process_recording numerically on the virtual
8-device CPU mesh.
"""

import dataclasses

import numpy as np

import jax

from fmcw_radar_processing_tpu.config import AlgorithmConfig, RadarConfig
from fmcw_radar_processing_tpu.io.synth import (
    SyntheticTarget,
    synthesize_recording,
)
from fmcw_radar_processing_tpu.parallel.mesh import make_mesh
from fmcw_radar_processing_tpu.parallel.sp_recording import (
    ShardedRecordingPipeline,
)
from fmcw_radar_processing_tpu.pipeline.recording import RadarPipeline


def _cfg(base):
    return RadarConfig.create(
        base.device, AlgorithmConfig(stft_nfft=256)
    )


def test_sharded_recording_matches_single_device(cfg):
    cfg = _cfg(cfg)
    n = 4
    mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
    f = 8 * n
    rec = synthesize_recording(
        cfg, f,
        (SyntheticTarget(range_m=7.5, doppler_bin_offset=3,
                         md_phase_rad=1.0, md_rate_hz=40.0),),
        seed=3,
    )
    raw = rec.rx1_pair()
    calib = rec.calib_pair(0, cfg.nts)

    sp = ShardedRecordingPipeline(cfg, mesh)
    got = sp.process(raw, calib)
    want = RadarPipeline(cfg).process_recording(raw, calib)

    np.testing.assert_array_equal(got["detected"], want.detected)
    np.testing.assert_allclose(got["waterfall"], want.waterfall,
                               rtol=3e-4, atol=0.05)
    np.testing.assert_allclose(np.nan_to_num(got["range"]),
                               np.nan_to_num(want.target_range), rtol=1e-5)
    np.testing.assert_allclose(np.nan_to_num(got["speed"]),
                               np.nan_to_num(want.target_speed),
                               rtol=1e-4, atol=1e-6)
    assert (got["spectrogram_intensity"].shape
            == want.spectrogram_intensity.shape)
    # dB maps: tight where displayable (sharded pmax/fusion order differs).
    m = want.spectrogram_intensity > -120
    np.testing.assert_allclose(
        got["spectrogram_intensity"][m], want.spectrogram_intensity[m],
        atol=2e-3,
    )
    assert len(got["payload"]["time"]) == len(want.spectrogram_times)
    assert len(got["payload"]["intensity"]) == 1024


def test_sharded_recording_no_detections(cfg):
    """count < window: no spectrogram columns, payload still well-formed."""
    cfg = _cfg(cfg)
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    rng = np.random.default_rng(0)
    f = 4
    raw = (0.001 * rng.standard_normal((f, cfg.pn, cfg.nts, 2))
           ).astype(np.float32)
    calib = np.zeros((cfg.nts, 2), np.float32)
    sp = ShardedRecordingPipeline(cfg, mesh)
    got = sp.process(raw, calib)
    assert not got["detected"].any()
    assert got["spectrogram_intensity"].shape[1] == 0
    assert len(got["payload"]["time"]) == 0


def test_requires_fixed_nfft(cfg):
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    import pytest

    with pytest.raises(ValueError, match="stft_nfft"):
        ShardedRecordingPipeline(
            RadarConfig.create(cfg.device, AlgorithmConfig()), mesh
        )
