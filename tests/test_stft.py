"""STFT framed-matmul operator vs MATLAB-semantics oracle and scipy."""

import numpy as np
import jax.numpy as jnp
import scipy.signal as sps

from fmcw_radar_processing_tpu.config.radar import next_pow2
from fmcw_radar_processing_tpu.dsp.stft import (
    StftOperator,
    log_frequency_rescale,
    psd_db,
    stft_frame_count,
)
from fmcw_radar_processing_tpu.dsp.windows import kaiser

from .oracle import log_rescale_oracle, psd_db_oracle, spectrogram_oracle


def _signal(rng, n=300):
    t = np.arange(n)
    return (2.0 + np.sin(2 * np.pi * 0.05 * t) + 0.3 * rng.standard_normal(n)
            ).astype(np.float32)


def test_psd_matches_oracle(rng):
    fs = 1 / 800e-6
    x = _signal(rng)
    nfft = next_pow2(len(x))
    op = StftOperator.create(window_length=20, beta=3.0, nfft=nfft, fs=fs, hop=1)
    res = op(jnp.asarray(x))
    of, ot, op_psd = spectrogram_oracle(x.astype(np.float64), fs, nfft=nfft)
    np.testing.assert_allclose(np.asarray(res.power), op_psd, rtol=2e-3, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.freqs), of, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.times), ot, rtol=1e-6)


def test_psd_matches_scipy_spectrogram(rng):
    """Cross-check the oracle itself against scipy's PSD-mode spectrogram."""
    fs = 100.0
    x = _signal(rng, n=256).astype(np.float64)
    nfft = 512
    win = kaiser(20, 3.0)
    of, ot, op_psd = spectrogram_oracle(x, fs, nfft=nfft)
    sf, st, sp = sps.spectrogram(
        x, fs=fs, window=win, noverlap=19, nperseg=20, nfft=nfft,
        detrend=False, scaling="density", mode="psd",
    )
    np.testing.assert_allclose(op_psd, sp, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(of, sf)


def test_valid_len_masking(rng):
    fs = 50.0
    x = _signal(rng, n=200)
    op = StftOperator.create(window_length=20, beta=3.0, nfft=256, fs=fs, hop=1)
    full = op(jnp.asarray(x))
    # Same signal zero-padded into a larger capacity buffer + valid_len.
    cap = np.zeros(320, np.float32)
    cap[:200] = x
    masked = op(jnp.asarray(cap), valid_len=jnp.asarray(200))
    t_valid = stft_frame_count(200, 20, 1)
    assert int(np.asarray(masked.frame_valid).sum()) == t_valid
    np.testing.assert_allclose(
        np.asarray(masked.power)[:, :t_valid], np.asarray(full.power),
        rtol=1e-4, atol=1e-9,
    )
    assert float(np.abs(np.asarray(masked.power)[:, t_valid:]).max()) == 0.0


def test_db_normalization(rng):
    fs = 100.0
    x = _signal(rng, n=128)
    op = StftOperator.create(window_length=20, beta=3.0, nfft=128, fs=fs, hop=1)
    res = op(jnp.asarray(x))
    got = np.asarray(psd_db(res))
    want = psd_db_oracle(np.asarray(res.power, np.float64))
    assert float(got.max()) == 0.0  # global max normalizes to 0 dB
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_log_rescale_matches_oracle(rng):
    fs = 100.0
    x = _signal(rng, n=128)
    op = StftOperator.create(window_length=20, beta=3.0, nfft=128, fs=fs, hop=1)
    res = op(jnp.asarray(x))
    db = np.asarray(psd_db(res), np.float64)
    freqs = np.asarray(res.freqs, np.float64)
    log_bins, interp = log_frequency_rescale(res.freqs, psd_db(res), 1024)
    olog, ointerp = log_rescale_oracle(freqs, db, 1024)
    np.testing.assert_allclose(np.asarray(log_bins), olog, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(interp), ointerp, rtol=1e-4, atol=1e-3)


def test_generalized_hop(rng):
    """Non-reference hop (production mode) against the oracle."""
    fs = 100.0
    x = _signal(rng, n=300)
    op = StftOperator.create(window_length=20, beta=3.0, nfft=64, fs=fs, hop=5)
    res = op(jnp.asarray(x))
    of, ot, opsd = spectrogram_oracle(x.astype(np.float64), fs, hop=5, nfft=64)
    assert res.power.shape[-1] == opsd.shape[-1]
    np.testing.assert_allclose(np.asarray(res.power), opsd, rtol=2e-3, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.times), ot, rtol=1e-6)
