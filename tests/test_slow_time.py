"""Slow-time (Doppler) operator + peak extraction vs oracle."""

import jax.numpy as jnp
import numpy as np

from fmcw_radar_processing_tpu.dsp.detection import search_peaks
from fmcw_radar_processing_tpu.dsp.fast_time import FastTimeOperator, range_profile
from fmcw_radar_processing_tpu.dsp.slow_time import (
    SlowTimeOperator,
    doppler_peaks,
    measurements,
)
from fmcw_radar_processing_tpu.utils.cplx import from_pair, to_pair

from .conftest import make_recording
from .oracle import (
    doppler_extract_oracle,
    fast_time_oracle,
    integrate_profile_oracle,
    search_peak_oracle,
    slow_time_oracle,
)


def _moving_target_frames(cfg, rng, range_bin=60, doppler_bin_offset=3, amp=5.0,
                          noise_amp=0.02):
    """One frame containing a target with a chirp-to-chirp phase ramp
    corresponding to fftshifted Doppler bin zero_bin + doppler_bin_offset."""
    nts, pn, k, d = cfg.nts, cfg.pn, cfg.range_fft_size, cfg.doppler_fft_size
    n = np.arange(nts)[:, None]
    p = np.arange(pn)[None, :]
    # Unshifted Doppler bin that lands at zero_bin+offset after fftshift:
    unshifted = (cfg.zero_doppler_bin + doppler_bin_offset + d // 2) % d
    tone = amp * np.exp(
        1j * 2 * np.pi * (range_bin * n / k + unshifted * p / d)
    )
    noise = noise_amp * (rng.standard_normal((nts, pn))
                         + 1j * rng.standard_normal((nts, pn)))
    frames = (tone + noise)[None].astype(np.complex64)
    calib = np.zeros(nts, np.complex64)
    return frames, calib


def test_full_map_matches_oracle_at_detected_bins(cfg, rng):
    frames, calib = make_recording(cfg, num_frames=4, rng=rng)
    ft = FastTimeOperator.create(cfg)
    st = SlowTimeOperator.create(cfg)
    rf = ft(jnp.asarray(to_pair(np.swapaxes(frames, -1, -2))),
            jnp.asarray(to_pair(calib)))
    rd = from_pair(st(rf))  # (F, K, D)
    for fr in range(frames.shape[0]):
        orf = fast_time_oracle(frames[fr], calib, cfg)
        oidx, _ = search_peak_oracle(integrate_profile_oracle(orf), cfg)
        ord_map = slow_time_oracle(orf, oidx, cfg)
        for i in oidx:
            np.testing.assert_allclose(rd[fr, i, :], ord_map[i, :],
                                       rtol=3e-4, atol=0.5)


def test_doppler_peak_and_speed_match_oracle(cfg, rng):
    frames, calib = _moving_target_frames(cfg, rng, doppler_bin_offset=3)
    ft = FastTimeOperator.create(cfg)
    st = SlowTimeOperator.create(cfg)
    rf = ft(jnp.asarray(to_pair(np.swapaxes(frames, -1, -2))),
            jnp.asarray(to_pair(calib)))
    det = search_peaks(range_profile(rf), cfg)
    rd = st(rf)
    pk = doppler_peaks(rd, det, cfg)

    orf = fast_time_oracle(frames[0], calib, cfg)
    oidx, _ = search_peak_oracle(integrate_profile_oracle(orf), cfg)
    assert len(oidx) == 1
    odj, osp = doppler_extract_oracle(slow_time_oracle(orf, oidx, cfg), oidx, cfg)
    assert int(np.asarray(pk.doppler_idx)[0, 0]) == odj[0]
    np.testing.assert_allclose(np.asarray(pk.speed)[0, 0], osp[0], rtol=1e-5)
    # The injected offset must be recovered.
    assert int(np.asarray(pk.doppler_idx)[0, 0]) == cfg.zero_doppler_bin + 3


def test_zero_doppler_rejection(cfg, rng):
    """A static target (no chirp-to-chirp phase ramp) must be assigned the
    zero-velocity bin → speed 0 (radar_processing.m:234-238).

    Noise must be tiny here: slow-time mean removal annihilates the static
    tone, so any residual noise above Doppler_threshold would (faithfully to
    the reference) be picked as a moving target."""
    frames, calib = _moving_target_frames(cfg, rng, doppler_bin_offset=0,
                                          noise_amp=1e-5)
    ft = FastTimeOperator.create(cfg)
    st = SlowTimeOperator.create(cfg)
    rf = ft(jnp.asarray(to_pair(np.swapaxes(frames, -1, -2))),
            jnp.asarray(to_pair(calib)))
    det = search_peaks(range_profile(rf), cfg)
    pk = doppler_peaks(st(rf), det, cfg)
    assert int(np.asarray(pk.doppler_idx)[0, 0]) == cfg.zero_doppler_bin
    assert float(np.asarray(pk.speed)[0, 0]) == 0.0


def test_measurements_nan_for_missing(cfg, rng):
    """Frames without detections carry NaN (radar_processing.m:525-527)."""
    nts, pn = cfg.nts, cfg.pn
    frames = 1e-4 * (rng.standard_normal((2, nts, pn))
                     + 1j * rng.standard_normal((2, nts, pn))).astype(np.complex64)
    calib = np.zeros(nts, np.complex64)
    ft = FastTimeOperator.create(cfg)
    st = SlowTimeOperator.create(cfg)
    rf = ft(jnp.asarray(to_pair(np.swapaxes(frames, -1, -2))),
            jnp.asarray(to_pair(calib)))
    det = search_peaks(range_profile(rf), cfg)
    pk = doppler_peaks(st(rf), det, cfg)
    m = measurements(det, pk, cfg)
    assert m.strength.shape == (cfg.algorithm.max_num_targets, 2)
    assert bool(np.isnan(np.asarray(m.strength)).all())
    assert bool(np.isnan(np.asarray(m.range)).all())
    assert bool(np.isnan(np.asarray(m.speed)).all())


def test_speed_sign_convention(cfg):
    """Doppler bins above the zero bin map to negative speed (the −fD_per_bin
    factor at radar_processing.m:154,250)."""
    axis = cfg.derived.speed_axis(cfg.doppler_fft_size)
    zb = cfg.zero_doppler_bin
    assert axis[zb] == 0.0
    assert axis[zb + 1] < 0.0 < axis[zb - 1]
