"""Streaming multi-channel pipeline: window-splitting invariance + mesh run.

The streaming processor must be seamless: splitting a recording into
windows (with the W−1-sample carry) yields exactly the same STFT columns
as processing it in one window — the temporal analog of the spatial halo
tests in test_parallel.py.
"""

import numpy as np
import pytest

from fmcw_radar_processing_tpu.dsp.windows import kaiser
from fmcw_radar_processing_tpu.parallel.mesh import make_mesh
from fmcw_radar_processing_tpu.pipeline.streaming import StreamingProcessor
from fmcw_radar_processing_tpu.utils.cplx import to_pair

from .conftest import make_recording


def _channel_raw(cfg, rng, frames=8, **kw):
    frames_c, calib = make_recording(cfg, num_frames=frames, rng=rng, **kw)
    raw = to_pair(np.swapaxes(frames_c, -1, -2))  # [F, PN, NTS, 2]
    return raw, to_pair(calib)


def test_window_split_invariance(cfg, rng):
    raw, cal = _channel_raw(cfg, rng, frames=8)
    raw, cal = raw[None], cal[None]

    full = StreamingProcessor(cfg, channels=1, window_frames=8)
    r_full = full.process_window(raw, cal)
    n_full = int(r_full.col_count[0])
    assert n_full > 0

    split = StreamingProcessor(cfg, channels=1, window_frames=4)
    r1 = split.process_window(raw[:, :4], cal)
    r2 = split.process_window(raw[:, 4:], cal)
    n1, n2 = int(r1.col_count[0]), int(r2.col_count[0])
    assert n1 + n2 == n_full

    got = np.concatenate(
        [np.asarray(r1.psd[0])[:, :n1], np.asarray(r2.psd[0])[:, :n2]], axis=1
    )
    want = np.asarray(r_full.psd[0])[:, :n_full]
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-10)

    # Per-frame outputs of window 2 match the tail of the full run.
    np.testing.assert_allclose(
        np.asarray(r2.waterfall[0]), np.asarray(r_full.waterfall[0])[4:],
        rtol=1e-6,
    )


def test_columns_match_numpy_stft(cfg, rng):
    """Independent check: PSD columns equal a direct NumPy framed rfft."""
    raw, cal = _channel_raw(cfg, rng, frames=6)
    sp = StreamingProcessor(cfg, channels=1, window_frames=6)
    r = sp.process_window(raw[None], cal[None])
    n = int(r.col_count[0])

    # Reconstruct the packed slow-time magnitude stream on host.
    from fmcw_radar_processing_tpu.pipeline.frame_chain import (
        make_frame_chain,
        pack_slow_time,
    )
    from fmcw_radar_processing_tpu.utils.cplx import from_pair

    out = make_frame_chain(cfg)(raw, cal)
    sig, count = pack_slow_time(out.strongest_chirps, out.detected, cfg.pn)
    stream = np.abs(from_pair(sig))[: int(count)]
    wl = cfg.algorithm.stft_window_length
    assert n == max(len(stream) - wl + 1, 0)

    w = np.asarray(kaiser(wl, cfg.algorithm.stft_kaiser_beta), np.float64)
    nfft = sp.nfft
    fs = 1.0 / cfg.derived.prt
    scale = 1.0 / (fs * np.sum(w**2))
    dbl = np.full(nfft // 2 + 1, 2.0)
    dbl[0] = dbl[-1] = 1.0
    want = np.stack(
        [
            dbl * scale * np.abs(np.fft.rfft(stream[t : t + wl] * w, nfft)) ** 2
            for t in range(n)
        ],
        axis=1,
    )
    np.testing.assert_allclose(np.asarray(r.psd[0])[:, :n], want,
                               rtol=1e-2, atol=1e-10)


def test_short_window_carry(cfg, rng):
    """Windows shorter than the STFT window still accumulate seamlessly."""
    raw, cal = _channel_raw(cfg, rng, frames=4)
    raw, cal = raw[None], cal[None]

    full = StreamingProcessor(cfg, channels=1, window_frames=4)
    r_full = full.process_window(raw, cal)
    n_full = int(r_full.col_count[0])

    split = StreamingProcessor(cfg, channels=1, window_frames=1)
    cols, ns = [], []
    for f in range(4):
        rf = split.process_window(raw[:, f : f + 1], cal)
        k = int(rf.col_count[0])
        ns.append(k)
        if k:
            cols.append(np.asarray(rf.psd[0])[:, :k])
    assert sum(ns) == n_full
    got = np.concatenate(cols, axis=1)
    np.testing.assert_allclose(
        got, np.asarray(r_full.psd[0])[:, :n_full], rtol=1e-2, atol=1e-10
    )


def test_multichannel_mesh(cfg, rng):
    """8 channels sharded over the 8-device data axis == per-channel runs."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    raws, cals = [], []
    for _ in range(8):
        raw, cal = _channel_raw(cfg, rng, frames=3)
        raws.append(raw)
        cals.append(cal)
    raw8, cal8 = np.stack(raws), np.stack(cals)

    mesh = make_mesh(data=8, model=1)
    sp = StreamingProcessor(cfg, channels=8, window_frames=3, mesh=mesh)
    r = sp.process_window(raw8, cal8)

    solo = StreamingProcessor(cfg, channels=1, window_frames=3)
    for c in (0, 5):
        solo.reset()
        rs = solo.process_window(raw8[c : c + 1], cal8[c : c + 1])
        assert int(r.col_count[c]) == int(rs.col_count[0])
        np.testing.assert_allclose(
            np.asarray(r.psd[c]), np.asarray(rs.psd[0]), rtol=1e-2, atol=1e-10
        )


def test_db_modes_and_two_pass_parity(cfg, rng):
    """dB normalization modes (VERDICT r1 item 8).

    two-pass over streamed windows must EXACTLY recover the reference's
    global-max semantics (== offline psd_db of the full run); running_max
    equals two-pass from the window where the global max first appears;
    per_window diverges from global by exactly 20·log10(gmax/wmax).
    """
    import jax.numpy as jnp

    from fmcw_radar_processing_tpu.dsp.stft import psd_db, StftOperator
    from fmcw_radar_processing_tpu.pipeline.frame_chain import (
        make_frame_chain,
        pack_slow_time,
    )
    from fmcw_radar_processing_tpu.pipeline.streaming import (
        StreamingProcessor,
        normalize_two_pass,
    )
    from fmcw_radar_processing_tpu.utils.cplx import pair_abs

    # Quiet first window, loud second: the global max only appears in
    # window 2, so per_window's window-1 normalization visibly diverges
    # from the reference's global max while running_max converges by
    # window 2 (it has then seen the global max).
    raw_a, cal = _channel_raw(cfg, rng, frames=4, amplitude=3.0)
    raw_b, _ = _channel_raw(cfg, rng, frames=4, amplitude=6.0)
    raw = np.concatenate([raw_a, raw_b])[None]
    cal = cal[None]

    win, cols, psds = [], [], []
    for mode in ("per_window", "running_max"):
        sp = StreamingProcessor(cfg, channels=1, window_frames=4, db_mode=mode)
        r1 = sp.process_window(raw[:, :4], cal)
        r2 = sp.process_window(raw[:, 4:], cal)
        win.append((r1, r2))
    (pw1, pw2), (rm1, rm2) = win

    # Linear PSDs identical across modes (normalization is downstream).
    np.testing.assert_array_equal(np.asarray(pw2.psd), np.asarray(rm2.psd))

    two = normalize_two_pass(
        [pw1.psd, pw2.psd], [pw1.col_count, pw2.col_count]
    )

    # Offline reference: whole recording, global-max psd_db.
    chain = make_frame_chain(cfg)
    out = chain(raw[0], cal[0])
    sig, count = pack_slow_time(out.strongest_chirps, out.detected, cfg.pn)
    op = StftOperator.create(
        window_length=cfg.algorithm.stft_window_length,
        beta=cfg.algorithm.stft_kaiser_beta, nfft=256,
        fs=1.0 / cfg.derived.prt, hop=1,
    )
    res = op(pair_abs(sig), valid_len=count)
    want_db = np.asarray(psd_db(res))
    n1, n2 = int(pw1.col_count[0]), int(pw2.col_count[0])
    got_db = np.concatenate([two[0][0][:, :n1], two[1][0][:, :n2]], axis=1)
    # Compare where the signal is displayable (> -100 dB): at near-zero
    # powers the log amplifies f32 summation-order noise between the
    # streamed and offline paths into meaningless dB deltas.
    disp = want_db[:, : n1 + n2] > -100.0
    np.testing.assert_allclose(got_db[disp], want_db[:, : n1 + n2][disp],
                               rtol=1e-4, atol=0.05)

    # running_max window 2 == two-pass window 2 (global max was in window 1).
    np.testing.assert_allclose(
        np.asarray(rm2.psd_db[0])[:, :n2], two[1][0][:, :n2],
        rtol=1e-5, atol=1e-3,
    )

    # per_window window 1 diverges from global by exactly the max ratio.
    gmax = max(float(np.max(np.asarray(pw1.psd))),
               float(np.max(np.asarray(pw2.psd))))
    wmax1 = float(np.max(np.asarray(pw1.psd)))
    offset = 20.0 * np.log10(gmax / wmax1)
    assert offset > 1.0  # the divergence is real and measured
    valid = two[0][0][:, :n1] > -900
    np.testing.assert_allclose(
        np.asarray(pw1.psd_db[0])[:, :n1][valid] - offset,
        two[0][0][:, :n1][valid],
        rtol=1e-4, atol=2e-2,
    )


def test_two_pass_masks_invalid_columns(cfg, rng):
    """ADVICE r2: normalize_two_pass must not trust producers to zero
    invalid columns — garbage past col_count is excluded from the global
    max and floored in the output."""
    from fmcw_radar_processing_tpu.dsp.stft import DB_FLOOR
    from fmcw_radar_processing_tpu.pipeline.streaming import normalize_two_pass

    c, nb, lcap = 2, 5, 8
    cc = np.array([3, 6])
    psd = np.abs(rng.standard_normal((c, nb, lcap))).astype("f4")
    clean = psd * (np.arange(lcap)[None, None, :] < cc[:, None, None])
    dirty = clean.copy()
    dirty[:, :, -1] = 1e9  # garbage in an invalid column on both channels

    want = normalize_two_pass([clean], [cc])[0]
    got = normalize_two_pass([dirty], [cc])[0]
    np.testing.assert_array_equal(got, want)
    assert np.all(got[0][:, 3:] == DB_FLOOR)  # invalid columns floored
