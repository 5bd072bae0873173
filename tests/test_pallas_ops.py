"""Pallas kernels vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fmcw_radar_processing_tpu.dsp.detection import search_peaks
from fmcw_radar_processing_tpu.dsp.fast_time import FastTimeOperator, range_profile
from fmcw_radar_processing_tpu.ops.detect_pallas import search_peaks_pallas
from fmcw_radar_processing_tpu.ops.fast_time_pallas import fast_time_pallas
from fmcw_radar_processing_tpu.utils.cplx import to_pair

from .conftest import make_recording


def _pair_inputs(cfg, rng, f=10):
    frames, calib = make_recording(cfg, num_frames=f, rng=rng)
    raw = to_pair(np.swapaxes(frames, -1, -2))
    return jnp.asarray(raw), jnp.asarray(to_pair(calib))


def test_fast_time_kernel_matches_xla(cfg, rng):
    raw, calib = _pair_inputs(cfg, rng)
    op = FastTimeOperator.create(cfg)
    want_rf = np.asarray(op(raw, calib))
    want_prof = np.asarray(range_profile(op(raw, calib)))
    got_rf, got_prof = fast_time_pallas(raw, calib, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(got_rf), want_rf, rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(got_prof), want_prof,
                               rtol=1e-5, atol=1e-2)


def test_fast_time_kernel_non_divisible_frames(cfg, rng):
    """Frame counts that don't divide the group size must pad correctly."""
    raw, calib = _pair_inputs(cfg, rng, f=9)  # group = 8 for PN=16
    op = FastTimeOperator.create(cfg)
    want = np.asarray(range_profile(op(raw, calib)))
    _, got = fast_time_pallas(raw, calib, cfg, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-2)


def test_profile_only_kernel_matches_xla(cfg, rng):
    """fast_time_profile_pallas: same profile, no rf output at all."""
    from fmcw_radar_processing_tpu.ops.fast_time_pallas import (
        fast_time_profile_pallas,
    )

    raw, calib = _pair_inputs(cfg, rng, f=9)  # non-divisible group too
    op = FastTimeOperator.create(cfg)
    want = np.asarray(range_profile(op(raw, calib)))
    got = fast_time_profile_pallas(raw, calib, cfg, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-2)
    # Larger group (weight-reuse variant) must agree too.
    got32 = fast_time_profile_pallas(raw, calib, cfg, interpret=True, group=32)
    np.testing.assert_allclose(np.asarray(got32), want, rtol=1e-5, atol=1e-2)


def test_packed_bf16_profile_close_to_f32(cfg, rng):
    """bfloat16 MXU inputs: f32-accumulated profile within quantization SNR."""
    from fmcw_radar_processing_tpu.dsp.fast_time import PackedFastTime

    raw, calib = _pair_inputs(cfg, rng, f=8)
    f32 = np.asarray(PackedFastTime.create(cfg).profile(raw, calib))
    b16 = np.asarray(
        PackedFastTime.create(cfg, jnp.bfloat16).profile(raw, calib)
    )
    assert b16.dtype == np.float32  # accumulation/output stays f32
    err = np.linalg.norm(b16 - f32) / np.linalg.norm(f32)
    # err must be NONZERO: zero error means XLA's excess-precision folding
    # elided the bf16 downcast and the operands silently stayed f32 (no
    # quantization AND no MXU-rate benefit) — the optimization_barrier in
    # PackedFastTime._matmul exists precisely to prevent that.
    assert err > 1e-7, "bf16 cast was folded away — operands stayed f32"
    snr_db = -20 * np.log10(err)
    assert snr_db > 30.0, f"bf16 profile SNR too low: {snr_db:.1f} dB"


def test_detect_kernel_matches_xla(cfg, rng):
    raw, calib = _pair_inputs(cfg, rng, f=12)
    op = FastTimeOperator.create(cfg)
    prof = range_profile(op(raw, calib))
    want = search_peaks(prof, cfg)
    got = search_peaks_pallas(prof, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(want.idx))
    np.testing.assert_allclose(np.asarray(got.magnitude),
                               np.asarray(want.magnitude), rtol=1e-6)


def test_detect_kernel_multi_target(rng):
    import dataclasses

    from fmcw_radar_processing_tpu.config import (
        AlgorithmConfig,
        RadarConfig,
        default_device_config,
    )

    cfg = RadarConfig.create(default_device_config(),
                             AlgorithmConfig(max_num_targets=3))
    profile = np.zeros((4, cfg.range_fft_size), np.float32)
    profile[0, 30] = 500.0
    profile[0, 60] = 900.0
    profile[0, 100] = 700.0
    profile[1, 44] = 300.0
    want = search_peaks(jnp.asarray(profile), cfg)
    got = search_peaks_pallas(jnp.asarray(profile), cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    np.testing.assert_array_equal(
        np.asarray(got.idx)[np.asarray(got.valid)],
        np.asarray(want.idx)[np.asarray(want.valid)],
    )
