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


def test_profile_only_pallas_pipeline_matches_xla(cfg, rng):
    frames, calib = _mixed_recording(cfg, rng, f=12)
    xla = RadarPipeline(cfg, impl="xla").process_recording(
        _tpu_layout(frames), calib
    )
    pp = RadarPipeline(cfg, impl="pallas_profile").process_recording(
        _tpu_layout(frames), calib
    )
    np.testing.assert_array_equal(pp.detected, xla.detected)
    # The packed kernel contracts re+im in ONE 2·NTS-length dot (vs the xla
    # impl's four separate NTS-length dots) — same math, different f32
    # summation order, so magnitudes agree to ~1e-6 relative only.
    np.testing.assert_allclose(pp.waterfall, xla.waterfall, rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(pp.target_range, xla.target_range, rtol=1e-6)
    np.testing.assert_allclose(pp.target_speed, xla.target_speed,
                               rtol=1e-6, atol=1e-7)


def test_profile_only_pallas_high_matches_f32(cfg, rng):
    """pallas_profile_high (bf16x3, 3 MXU passes): detections/ranges
    identical; waterfall within the ~2^-18 relative split error — far
    tighter than the bf16 variants' ~2^-8 quantization."""
    frames, calib = _mixed_recording(cfg, rng, f=12)
    f32 = RadarPipeline(cfg, impl="fused").process_recording(
        _tpu_layout(frames), calib
    )
    hi = RadarPipeline(cfg, impl="pallas_profile_high").process_recording(
        _tpu_layout(frames), calib
    )
    np.testing.assert_array_equal(hi.detected, f32.detected)
    np.testing.assert_allclose(hi.target_range, f32.target_range, rtol=1e-6)
    np.testing.assert_allclose(hi.target_speed, f32.target_speed,
                               rtol=1e-5, atol=1e-6)
    err = np.linalg.norm(hi.waterfall - f32.waterfall) / max(
        np.linalg.norm(f32.waterfall), 1e-30
    )
    assert -20 * np.log10(max(err, 1e-30)) > 80.0


def test_profile_only_pallas_bf16_detections_match_f32(cfg, rng):
    """pallas_profile_bf16: detections/ranges identical, waterfall within
    bf16 input-quantization error; payload-side values (speed via f32
    rf_at_bins) exact vs the f32 pipeline."""
    frames, calib = _mixed_recording(cfg, rng, f=12)
    f32 = RadarPipeline(cfg, impl="fused").process_recording(
        _tpu_layout(frames), calib
    )
    b16 = RadarPipeline(cfg, impl="pallas_profile_bf16").process_recording(
        _tpu_layout(frames), calib
    )
    np.testing.assert_array_equal(b16.detected, f32.detected)
    np.testing.assert_allclose(b16.target_range, f32.target_range, rtol=1e-6)
    np.testing.assert_allclose(b16.target_speed, f32.target_speed,
                               rtol=1e-5, atol=1e-6)
    err = np.linalg.norm(b16.waterfall - f32.waterfall) / max(
        np.linalg.norm(f32.waterfall), 1e-30
    )
    assert -20 * np.log10(max(err, 1e-30)) > 30.0


def test_bf16_pipeline_detections_match_f32(cfg, rng):
    """fused_bf16: detections and measurements identical on well-separated
    targets; waterfall within bf16 quantization error."""
    frames, calib = _mixed_recording(cfg, rng, f=12)
    f32 = RadarPipeline(cfg, impl="fused").process_recording(
        _tpu_layout(frames), calib
    )
    b16 = RadarPipeline(cfg, impl="fused_bf16").process_recording(
        _tpu_layout(frames), calib
    )
    np.testing.assert_array_equal(b16.detected, f32.detected)
    np.testing.assert_allclose(b16.target_range, f32.target_range, rtol=1e-6)
    err = np.linalg.norm(b16.waterfall - f32.waterfall) / max(
        np.linalg.norm(f32.waterfall), 1e-30
    )
    assert -20 * np.log10(max(err, 1e-30)) > 30.0
