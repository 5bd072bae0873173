"""Full chain with Pallas impl vs XLA impl (interpret mode on CPU)."""

import numpy as np

from fmcw_radar_processing_tpu.pipeline.recording import RadarPipeline

from .test_pipeline import _mixed_recording, _tpu_layout


def test_pallas_pipeline_matches_xla(cfg, rng):
    frames, calib = _mixed_recording(cfg, rng, f=12)
    xla = RadarPipeline(cfg, impl="xla").process_recording(
        _tpu_layout(frames), calib
    )
    pal = RadarPipeline(cfg, impl="pallas").process_recording(
        _tpu_layout(frames), calib
    )
    np.testing.assert_array_equal(pal.detected, xla.detected)
    np.testing.assert_allclose(pal.waterfall, xla.waterfall, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(pal.target_range, xla.target_range, rtol=1e-6)
    np.testing.assert_allclose(pal.target_speed, xla.target_speed,
                               rtol=1e-6, atol=1e-7)
    assert pal.spectrogram_intensity.shape == xla.spectrogram_intensity.shape
    np.testing.assert_allclose(
        pal.spectrogram_intensity, xla.spectrogram_intensity, atol=2e-2
    )
