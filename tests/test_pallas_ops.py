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
