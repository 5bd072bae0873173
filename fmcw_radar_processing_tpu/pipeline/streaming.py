"""Streaming multi-sensor pipeline: C radar channels, windowed frames.

The reference is a batch ETL job over one recording from one sensor
(SURVEY §0); production deployments run fleets of radars continuously.
This module processes windows of frames from C channels at once:

  * the per-frame chain is vmapped over the channel axis and sharded over
    the mesh's ``data`` axis — 8 channels on an 8-device slice is the
    BASELINE.json "streaming multi-sensor" configuration;
  * the slow-time/STFT state is *streaming*: each channel carries the last
    window_length−1 packed slow-time samples across window boundaries, so
    spectrogram columns are seamless across windows (the temporal analog of
    the spatial halo exchange in parallel/sharded_stft.py);
  * dB normalization (radar_processing.m:282-283 normalizes by the
    whole-recording max — which a streaming system cannot see) comes in
    three modes: ``per_window`` (causal, each window by its own max),
    ``running_max`` (causal, by the max seen so far — converges to the
    reference's global max once the loudest event has passed), and the
    offline :func:`normalize_two_pass` helper that exactly recovers the
    reference's global-max semantics from collected window PSDs. The
    divergence between modes is quantified in tests/test_streaming.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fmcw_radar_processing_tpu.config import RadarConfig
from fmcw_radar_processing_tpu.dsp.stft import DB_FLOOR, StftOperator
from fmcw_radar_processing_tpu.parallel.mesh import DATA_AXIS
from fmcw_radar_processing_tpu.pipeline.frame_chain import (
    make_frame_chain,
    pack_slow_time,
)
from fmcw_radar_processing_tpu.utils.cplx import pair_abs


class StreamingWindowResult(NamedTuple):
    """Per-window outputs, leading axis = channel."""

    waterfall: jax.Array  # [C, F, K]
    range: jax.Array  # [C, T, F] NaN-filled
    speed: jax.Array  # [C, T, F]
    strength: jax.Array  # [C, T, F]
    detected: jax.Array  # [C, F]
    psd: jax.Array  # [C, nb, Lcap] linear PSD, zero past col_count
    psd_db: jax.Array  # [C, nb, Lcap] dB per db_mode (floor past col_count)
    norm_power: jax.Array  # [C] the power each channel was normalized by
    col_count: jax.Array  # [C] valid STFT columns this window
    carry: jax.Array  # [C, W-1] next window's carry (opaque state)


@dataclasses.dataclass
class StreamingProcessor:
    """Stateful multi-channel streaming processor.

    window_frames: frames per processing window per channel.
    """

    cfg: RadarConfig
    channels: int
    window_frames: int
    mesh: Mesh | None = None
    nfft: int = 256
    # dB normalization mode: 'per_window' normalizes each window by its own
    # max power; 'running_max' by the max power seen so far on the channel
    # (carried across windows; converges to the reference's global max,
    # radar_processing.m:282, once the loudest event has passed).
    db_mode: str = "per_window"

    def __post_init__(self):
        if self.db_mode not in ("per_window", "running_max"):
            raise ValueError(f"unknown db_mode {self.db_mode!r}")
        cfg = self.cfg
        a = cfg.algorithm
        self._wl = a.stft_window_length
        chain = make_frame_chain(cfg)
        stft = StftOperator.create(
            window_length=self._wl,
            beta=a.stft_kaiser_beta,
            nfft=self.nfft,
            fs=1.0 / cfg.derived.prt,
            hop=1,
            precision=a.matmul_precision,
        )
        pn = cfg.pn
        wl = self._wl
        running = self.db_mode == "running_max"

        def one_channel(raw, calib, carry, carry_len, max_power):
            out = chain(raw, calib)
            sig, count = pack_slow_time(out.strongest_chirps, out.detected, pn)
            mag = pair_abs(sig)  # [F·PN], valid in [0, count)
            # Invariant: carry holds the previous window's last carry_len
            # stream samples RIGHT-aligned in a [W−1] zero-padded buffer, so
            # ext's valid stream is contiguous at [W−1−carry_len, W−1+count).
            ext = jnp.concatenate([carry, mag])  # [W-1 + F·PN]
            total = carry_len + count
            # Left-align the stream at 0: the operator's valid_len masking is
            # prefix-based. Wrapped tail is all zeros (carry pad + mag pad)
            # and is masked anyway.
            aligned = jnp.roll(ext, carry_len - (wl - 1))
            res = stft(aligned, valid_len=total)
            n_cols = jnp.maximum(total - wl + 1, 0)
            # dB normalization: valid columns carry power > 0; invalid are
            # zeroed by the operator, so the window max IS the valid max.
            wmax = jnp.max(res.power)
            new_max = jnp.maximum(max_power, wmax)
            norm = new_max if running else wmax
            safe = jnp.where(norm > 0, norm, 1.0)
            db = jnp.where(
                res.power > 0,
                jnp.maximum(
                    20.0 * jnp.log10(jnp.maximum(res.power, 1e-45) / safe),
                    DB_FLOOR,
                ),
                DB_FLOOR,
            )
            # Next carry: last min(total, W−1) stream samples, right-aligned
            # (prepend W−1 zeros so short streams keep the zero pad in front).
            y = jnp.concatenate([jnp.zeros(wl - 1, ext.dtype), aligned])
            nxt = jax.lax.dynamic_slice(y, (total,), (wl - 1,))
            carry_valid = jnp.minimum(total, wl - 1)
            return (
                out.waterfall, out.range, out.speed, out.strength,
                out.detected, res.power, db, norm, n_cols, nxt, carry_valid,
                new_max,
            )

        vm = jax.vmap(one_channel)

        if self.mesh is not None:
            c_shard = NamedSharding(self.mesh, P(DATA_AXIS))
            # raw arrives as flat pair-rows [C, F, PN, 2·NTS]
            # (process_window normalizes the pair layout before dispatch).
            raw_sh = NamedSharding(self.mesh, P(DATA_AXIS, None, None, None))
            cal_sh = NamedSharding(self.mesh, P(DATA_AXIS, None, None))
            carry_sh = NamedSharding(self.mesh, P(DATA_AXIS, None))
            self._step = jax.jit(
                vm,
                in_shardings=(raw_sh, cal_sh, carry_sh, c_shard, c_shard),
            )
        else:
            self._step = jax.jit(vm)

        self.reset()

    def reset(self):
        self._carry = jnp.zeros((self.channels, self._wl - 1), jnp.float32)
        self._carry_len = jnp.zeros((self.channels,), jnp.int32)
        self._max_power = jnp.zeros((self.channels,), jnp.float32)

    def process_window(
        self, raw: np.ndarray, calib: np.ndarray
    ) -> StreamingWindowResult:
        """Process one window.

        raw: [C, F, PN, 2·NTS] flat pair-rows (preferred — see
        PackedFastTime._flat_rows for why the flat layout matters across
        the jit boundary) or [C, F, PN, NTS, 2]; calib: [C, NTS, 2].
        """
        if raw.ndim == 5:
            raw = (raw.reshape(*raw.shape[:3], -1)
                   if isinstance(raw, np.ndarray)
                   else jnp.reshape(raw, (*raw.shape[:3], -1)))
        (wf, rng, spd, stg, det, psd, db, norm, n_cols, carry, carry_len,
         max_power) = self._step(
            jnp.asarray(raw), jnp.asarray(calib), self._carry,
            self._carry_len, self._max_power,
        )
        self._carry = carry
        self._carry_len = carry_len
        self._max_power = max_power
        return StreamingWindowResult(
            waterfall=wf, range=rng, speed=spd, strength=stg, detected=det,
            psd=psd, psd_db=db, norm_power=norm, col_count=n_cols,
            carry=carry,
        )


def normalize_two_pass(
    window_psds: list[np.ndarray], col_counts: list[np.ndarray]
) -> list[np.ndarray]:
    """Offline two-pass dB normalization over collected streaming windows.

    EXACTLY the reference's global-max semantics (radar_processing.m:282-283
    with the :547-552 G>0 guard): pass 1 finds the global max power over
    every valid column of every window (per channel), pass 2 renders each
    window's dB against it. Feed it the ``psd``/``col_count`` fields of the
    StreamingWindowResults; returns per-window [C, nb, Lcap] dB arrays that
    match an offline whole-recording run bit-for-bit over valid columns.

    Columns at index >= col_count are masked out of the max and floored in
    the output — correctness does not rely on the operator having zeroed
    them (it does today, but the mask makes this function robust to any
    producer).
    """

    def valid_mask(p: np.ndarray, cc) -> np.ndarray:
        cols = np.arange(p.shape[-1])
        return cols[None, None, :] < np.asarray(cc)[:, None, None]

    gmax = None
    for p, cc in zip(window_psds, col_counts):
        p = np.asarray(p)
        w = np.max(np.where(valid_mask(p, cc), p, 0.0), axis=(-2, -1))  # [C]
        gmax = w if gmax is None else np.maximum(gmax, w)
    safe = np.where(gmax > 0, gmax, 1.0).astype(np.float64)[:, None, None]
    out = []
    for p, cc in zip(window_psds, col_counts):
        # float64: 1e-45 underflows to 0 in float32 and trips log10(0).
        p = np.asarray(p, np.float64)
        db = np.where(
            (p > 0) & valid_mask(p, cc),
            np.maximum(20.0 * np.log10(np.maximum(p, 1e-300) / safe), DB_FLOOR),
            DB_FLOOR,
        )
        out.append(db.astype(np.float32))
    return out
