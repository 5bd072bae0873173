"""Fused Pallas spectrogram (ops/stft_pallas.py) vs the XLA composition.

The kernel pair must reproduce StftOperator + psd_db +
log_frequency_rescale exactly (up to matmul pass ordering) including the
fixed-capacity masking and the global-max dB normalization.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fmcw_radar_processing_tpu.dsp.stft import (
    DB_FLOOR,
    StftOperator,
    log_frequency_rescale,
    psd_db,
)
from fmcw_radar_processing_tpu.ops.stft_pallas import spectrogram_pallas


def _ref(op, sig, count):
    res = op(sig, valid_len=jnp.asarray(count))
    db = psd_db(res)
    _, intensity = log_frequency_rescale(res.freqs, db, 1024)
    return np.asarray(res.power), np.asarray(db), np.asarray(intensity)


@pytest.mark.parametrize("l,count", [(4096, 4096), (4096, 1000), (700, 650)])
def test_matches_xla_composition(l, count):
    rng = np.random.default_rng(5)
    sig_np = np.zeros(l, np.float32)
    sig_np[:count] = np.abs(
        rng.standard_normal(count) + 0.5 * np.sin(np.arange(count) * 0.3)
    ).astype(np.float32)
    sig = jnp.asarray(sig_np)
    op = StftOperator.create(window_length=20, beta=3.0, nfft=256,
                             fs=1000.0, hop=1)
    # Oracle-grade comparisons run the HIGHEST phase-1 variant; the
    # production default ("high", bf16x3 phase 1) is held to the
    # display-band criterion further down.
    p, db, intensity = spectrogram_pallas(sig, jnp.asarray(count), op,
                                          tile=512,
                                          psd_precision="highest")
    p_ref, db_ref, int_ref = _ref(op, sig, count)

    dbd_, intd_ = spectrogram_pallas(sig, jnp.asarray(count), op,
                                     tile=512, psd_precision="high")[1:]
    # bf16x3 phase 1: absolute ~2^-18·Σ|op||fr| PSD noise — µdB where
    # displayable, unbounded only in deep nulls (it rides the dB log).
    md = db_ref > -40
    np.testing.assert_allclose(np.asarray(dbd_)[md], db_ref[md], atol=2e-3)
    np.testing.assert_allclose(np.asarray(intd_)[int_ref > -40],
                               int_ref[int_ref > -40], atol=4e-3)
    # The recompute formulation (opt-in; measured SLOWER on the v5e — see
    # spectrogram_pallas docstring): psd slot is None, db/intensity must
    # be BIT-identical to the HIGHEST materializing path (same dot, same
    # operands).
    p2, db2, int2 = spectrogram_pallas(sig, jnp.asarray(count), op,
                                       tile=512, recompute=True)
    assert p2 is None
    np.testing.assert_array_equal(np.asarray(db2), np.asarray(db))
    np.testing.assert_array_equal(np.asarray(int2), np.asarray(intensity))

    assert p.shape == p_ref.shape
    # √(scale·dbl) folding computes (c·s)² instead of c²·(s²) — identical
    # math, different rounding: tiny absolute wiggle at spectral nulls.
    np.testing.assert_allclose(np.asarray(p), p_ref, rtol=1e-4, atol=1e-10)
    # dB: tight where displayable; sub-display bins admit the folding's
    # rounding wiggle at spectral nulls; floor matches exactly.
    m = db_ref > -120
    np.testing.assert_allclose(np.asarray(db)[m], db_ref[m], atol=1e-3)
    deep = (db_ref <= -120) & (db_ref > -500)
    np.testing.assert_allclose(np.asarray(db)[deep], db_ref[deep], atol=0.2)
    np.testing.assert_array_equal(np.asarray(db) == DB_FLOOR,
                                  db_ref == DB_FLOOR)
    mi = int_ref > -120
    np.testing.assert_allclose(np.asarray(intensity)[mi], int_ref[mi],
                               atol=2e-3)
    deep_i = (int_ref <= -120) & (int_ref > -500)
    np.testing.assert_allclose(np.asarray(intensity)[deep_i],
                               int_ref[deep_i], atol=0.2)

    # Invalid columns: zero PSD, floored dB; intensity is the floor column
    # through the interpolation (−1000 · row-sums ≈ 1), same as the XLA
    # path — compare against it, not against the exact constant.
    ncols = count - 20 + 1
    assert np.all(np.asarray(p)[:, ncols:] == 0.0)
    assert np.all(np.asarray(db)[:, ncols:] == DB_FLOOR)
    np.testing.assert_allclose(np.asarray(intensity)[:, ncols:],
                               int_ref[:, ncols:], atol=0.2)


@pytest.mark.parametrize("nfft,l,count", [(2048, 1400, 1400),
                                          (1024, 1536, 1200)])
def test_tiled_matches_xla_composition(nfft, l, count):
    """Bin-blocked kernel pair (nfft > 512 — the lifted VMEM gate)."""
    rng = np.random.default_rng(11)
    sig_np = np.zeros(l, np.float32)
    sig_np[:count] = np.abs(
        rng.standard_normal(count) + 0.5 * np.sin(np.arange(count) * 0.17)
    ).astype(np.float32)
    sig = jnp.asarray(sig_np)
    op = StftOperator.create(window_length=20, beta=3.0, nfft=nfft,
                             fs=1000.0, hop=1)
    p, db, intensity = spectrogram_pallas(sig, jnp.asarray(count), op,
                                          tile=512, tile2=256)
    p_ref, db_ref, int_ref = _ref(op, sig, count)

    assert p.shape == p_ref.shape
    np.testing.assert_allclose(np.asarray(p), p_ref, rtol=1e-4, atol=1e-10)
    m = db_ref > -120
    np.testing.assert_allclose(np.asarray(db)[m], db_ref[m], atol=1e-3)
    np.testing.assert_array_equal(np.asarray(db) == DB_FLOOR,
                                  db_ref == DB_FLOOR)
    mi = int_ref > -120
    np.testing.assert_allclose(np.asarray(intensity)[mi], int_ref[mi],
                               atol=2e-3)
    ncols = count - 20 + 1
    assert np.all(np.asarray(p)[:, ncols:] == 0.0)
    assert np.all(np.asarray(db)[:, ncols:] == DB_FLOOR)
    np.testing.assert_allclose(np.asarray(intensity)[:, ncols:],
                               int_ref[:, ncols:], atol=0.2)


def test_tiled_forced_small_nfft_matches_untiled():
    """tiled=True at production nfft must equal the untiled kernels."""
    rng = np.random.default_rng(3)
    sig = jnp.asarray(np.abs(rng.standard_normal(900)).astype(np.float32))
    op = StftOperator.create(window_length=20, beta=3.0, nfft=256,
                             fs=1000.0, hop=1)
    a = spectrogram_pallas(sig, jnp.asarray(900), op, tile=512, tile2=256,
                           tiled=False, psd_precision="highest")
    b = spectrogram_pallas(sig, jnp.asarray(900), op, tile=512, tile2=256,
                           tiled=True)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                               atol=1e-4)
    # Intensity: untiled peels Nyquist exactly (f32 rank-1), tiled runs it
    # through the bf16x3 contraction — both HIGH-equivalent (≤ 2^-21 rel).
    np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[2]),
                               atol=2e-3)


def test_rejects_bad_args():
    op = StftOperator.create(window_length=20, beta=3.0, nfft=256,
                             fs=1000.0, hop=2)
    with pytest.raises(ValueError, match="hop"):
        spectrogram_pallas(jnp.zeros(100), jnp.asarray(100), op)
    op1 = StftOperator.create(window_length=20, beta=3.0, nfft=256,
                              fs=1000.0, hop=1)
    with pytest.raises(ValueError, match="shorter"):
        spectrogram_pallas(jnp.zeros(10), jnp.asarray(10), op1)


def test_rejects_conflicting_tiled_args():
    """Explicit recompute/psd_precision must ERROR on the tiled path, not
    be silently ignored (ADVICE r4)."""
    sig = jnp.ones(600, jnp.float32)
    op_small = StftOperator.create(window_length=20, beta=3.0, nfft=256,
                                   fs=1000.0, hop=1)
    op_big = StftOperator.create(window_length=20, beta=3.0, nfft=2048,
                                 fs=1000.0, hop=1)
    # Auto-selected tiled path (nfft 2048):
    with pytest.raises(ValueError, match="recompute"):
        spectrogram_pallas(sig, jnp.asarray(600), op_big, recompute=True)
    with pytest.raises(ValueError, match="HIGHEST"):
        spectrogram_pallas(sig, jnp.asarray(600), op_big,
                           psd_precision="high")
    # Explicitly-forced tiled path at small nfft:
    with pytest.raises(ValueError, match="HIGHEST"):
        spectrogram_pallas(sig, jnp.asarray(600), op_small, tiled=True,
                           psd_precision="high")
    # Recompute is HIGHEST-only too:
    with pytest.raises(ValueError, match="recompute"):
        spectrogram_pallas(sig, jnp.asarray(600), op_small, recompute=True,
                           psd_precision="high")
    with pytest.raises(ValueError, match="psd_precision"):
        spectrogram_pallas(sig, jnp.asarray(600), op_small,
                           psd_precision="default")


def test_resolves_tiled_helper():
    from fmcw_radar_processing_tpu.ops.stft_pallas import resolves_tiled

    op_small = StftOperator.create(window_length=20, beta=3.0, nfft=256,
                                   fs=1000.0, hop=1)
    op_big = StftOperator.create(window_length=20, beta=3.0, nfft=2048,
                                 fs=1000.0, hop=1)
    assert not resolves_tiled(op_small)
    assert resolves_tiled(op_big)
    assert resolves_tiled(op_small, tiled=True)
    assert not resolves_tiled(op_big, tiled=False)


def test_bf16_psd_store():
    """psd_store_dtype=bfloat16 halves the inter-phase PSD round-trip;
    display-band dB within ~0.05 of the f32-store run, psd returned
    bf16, tiled/recompute conflicts raise."""
    rng = np.random.default_rng(9)
    sig = jnp.asarray(np.abs(
        rng.standard_normal(1200) + 0.4 * np.sin(np.arange(1200) * 0.21)
    ).astype(np.float32))
    op = StftOperator.create(window_length=20, beta=3.0, nfft=256,
                             fs=1000.0, hop=1)
    p32, db32, i32 = spectrogram_pallas(sig, jnp.asarray(1200), op,
                                        tile=512)
    pb, dbb, ib = spectrogram_pallas(sig, jnp.asarray(1200), op, tile=512,
                                     psd_store_dtype=jnp.bfloat16)
    assert np.asarray(pb).dtype == jnp.bfloat16
    m = np.asarray(db32) > -40
    np.testing.assert_allclose(np.asarray(dbb)[m], np.asarray(db32)[m],
                               atol=0.05)
    mi = np.asarray(i32) > -40
    np.testing.assert_allclose(np.asarray(ib)[mi], np.asarray(i32)[mi],
                               atol=0.05)
    with pytest.raises(ValueError, match="untiled"):
        spectrogram_pallas(sig, jnp.asarray(1200), op, tiled=True,
                           psd_store_dtype=jnp.bfloat16)
    with pytest.raises(ValueError, match="untiled"):
        spectrogram_pallas(sig, jnp.asarray(1200), op, recompute=True,
                           psd_store_dtype=jnp.bfloat16)


@pytest.mark.parametrize("variant", ["untiled", "tiled", "recompute"])
def test_int8_intensity_emission(variant):
    """int8 kernel-epilogue emission: decoded dB within half a
    quantization step (≈0.083 dB) of the f32 intensity for in-range
    values, clamped outside INT8_DB_RANGE."""
    from fmcw_radar_processing_tpu.dsp.stft import (
        INT8_DB_RANGE,
        decode_db_int8,
        int8_db_step,
    )

    rng = np.random.default_rng(7)
    sig = jnp.asarray(np.abs(
        rng.standard_normal(800) + 0.5 * np.sin(np.arange(800) * 0.3)
    ).astype(np.float32))
    nfft = 1024 if variant == "tiled" else 256
    op = StftOperator.create(window_length=20, beta=3.0, nfft=nfft,
                             fs=1000.0, hop=1)
    kw = dict(tile=512, tile2=256)
    if variant == "recompute":
        kw["recompute"] = True
    _, db, int_f32 = spectrogram_pallas(sig, jnp.asarray(800), op, **kw)
    _, _, int_i8 = spectrogram_pallas(sig, jnp.asarray(800), op,
                                      intensity_dtype=jnp.int8, **kw)
    assert np.asarray(int_i8).dtype == np.int8
    dec = decode_db_int8(int_i8)
    f32 = np.asarray(int_f32)
    lo, hi = INT8_DB_RANGE
    inside = (f32 > lo + 0.1) & (f32 < hi - 0.1)
    assert inside.sum() > 100
    # + 2e-3 margin: f32 round-boundary fuzz (kernel acc and host decode
    # both in f32; values at exactly half a step can land either side).
    np.testing.assert_allclose(dec[inside], f32[inside],
                               atol=int8_db_step() / 2 + 2e-3)
    below = f32 < lo - 0.5
    assert np.all(dec[below] == np.float32(lo))
