"""Peak-search detection vs oracle + semantic edge cases."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from fmcw_radar_processing_tpu.config import AlgorithmConfig, RadarConfig, default_device_config
from fmcw_radar_processing_tpu.dsp.detection import search_peaks

from .oracle import search_peak_oracle


def _random_profiles(cfg, rng, n=32):
    k = cfg.range_fft_size
    profiles = rng.uniform(0, 150, (n, k))
    # Inject clear peaks into half the profiles at random gated bins.
    for i in range(0, n, 2):
        b = rng.integers(10, 120)
        profiles[i, b] = rng.uniform(250, 2000)
    return profiles.astype(np.float32)


def test_matches_oracle_random(cfg, rng):
    profiles = _random_profiles(cfg, rng)
    det = search_peaks(jnp.asarray(profiles), cfg)
    idx = np.asarray(det.idx)
    mag = np.asarray(det.magnitude)
    valid = np.asarray(det.valid)
    for i in range(profiles.shape[0]):
        oidx, omag = search_peak_oracle(profiles[i].astype(np.float64), cfg)
        nv = int(valid[i].sum())
        assert nv == len(oidx)
        np.testing.assert_array_equal(idx[i, :nv], oidx)
        np.testing.assert_allclose(mag[i, :nv], omag, rtol=1e-6)


def test_multi_target_strongest_first(rng):
    cfg = RadarConfig.create(
        default_device_config(), AlgorithmConfig(max_num_targets=3)
    )
    profile = np.zeros(cfg.range_fft_size, np.float32)
    profile[30] = 500.0
    profile[60] = 900.0
    profile[100] = 700.0
    det = search_peaks(jnp.asarray(profile), cfg)
    np.testing.assert_array_equal(np.asarray(det.idx), [60, 100, 30])
    assert bool(np.all(np.asarray(det.valid)))


def test_distance_gate_excludes_near_and_far(cfg):
    # dist_per_bin = 0.1875 m ⇒ gate [0.9, 25] m ⇒ bins 5..133 (0-based).
    profile = np.zeros(cfg.range_fft_size, np.float32)
    profile[3] = 1e4   # 0.5625 m — too near
    profile[200] = 1e4  # 37.5 m — too far
    det = search_peaks(jnp.asarray(profile), cfg)
    assert not bool(np.asarray(det.valid).any())


def test_threshold(cfg):
    profile = np.zeros(cfg.range_fft_size, np.float32)
    profile[50] = 199.9  # below range_threshold = 200
    assert not bool(np.asarray(search_peaks(jnp.asarray(profile), cfg).valid).any())
    profile[50] = 200.1
    det = search_peaks(jnp.asarray(profile), cfg)
    assert bool(np.asarray(det.valid).all())
    assert int(np.asarray(det.idx)[0]) == 50


def test_non_local_max_rejected(cfg):
    """A gated above-threshold bin on the shoulder of a peak is not a peak."""
    profile = np.zeros(cfg.range_fft_size, np.float32)
    profile[50] = 1000.0
    profile[51] = 800.0  # shoulder: above threshold but not a local max
    det = search_peaks(jnp.asarray(profile), cfg)
    valid = np.asarray(det.valid)
    assert int(valid.sum()) == 1
    assert int(np.asarray(det.idx)[0]) == 50


def test_batched_leading_dims(cfg, rng):
    profiles = _random_profiles(cfg, rng, n=12).reshape(3, 4, -1)
    det = search_peaks(jnp.asarray(profiles), cfg)
    assert det.idx.shape == (3, 4, cfg.algorithm.max_num_targets)
