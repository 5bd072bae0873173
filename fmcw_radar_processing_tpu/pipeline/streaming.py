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
  * per-window PSD is normalized per window (a causal stand-in for the
    reference's whole-recording max, radar_processing.m:282 — a streaming
    system cannot see the future global max).
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
from fmcw_radar_processing_tpu.dsp.stft import StftOperator
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

    def __post_init__(self):
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
        )
        pn = cfg.pn
        wl = self._wl

        def one_channel(raw, calib, carry, carry_len):
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
            # Next carry: last min(total, W−1) stream samples, right-aligned
            # (prepend W−1 zeros so short streams keep the zero pad in front).
            y = jnp.concatenate([jnp.zeros(wl - 1, ext.dtype), aligned])
            nxt = jax.lax.dynamic_slice(y, (total,), (wl - 1,))
            carry_valid = jnp.minimum(total, wl - 1)
            return (
                out.waterfall, out.range, out.speed, out.strength,
                out.detected, res.power, n_cols, nxt, carry_valid,
            )

        vm = jax.vmap(one_channel)

        if self.mesh is not None:
            c_shard = NamedSharding(self.mesh, P(DATA_AXIS))
            raw_sh = NamedSharding(self.mesh, P(DATA_AXIS, None, None, None, None))
            cal_sh = NamedSharding(self.mesh, P(DATA_AXIS, None, None))
            carry_sh = NamedSharding(self.mesh, P(DATA_AXIS, None))
            self._step = jax.jit(
                vm, in_shardings=(raw_sh, cal_sh, carry_sh, c_shard)
            )
        else:
            self._step = jax.jit(vm)

        self._carry = jnp.zeros((self.channels, self._wl - 1), jnp.float32)
        self._carry_len = jnp.zeros((self.channels,), jnp.int32)

    def reset(self):
        self._carry = jnp.zeros((self.channels, self._wl - 1), jnp.float32)
        self._carry_len = jnp.zeros((self.channels,), jnp.int32)

    def process_window(
        self, raw: np.ndarray, calib: np.ndarray
    ) -> StreamingWindowResult:
        """Process one window.

        raw: [C, F, PN, NTS, 2] float32; calib: [C, NTS, 2] float32.
        """
        (wf, rng, spd, stg, det, psd, n_cols, carry, carry_len) = self._step(
            jnp.asarray(raw), jnp.asarray(calib), self._carry, self._carry_len
        )
        self._carry = carry
        self._carry_len = carry_len
        return StreamingWindowResult(
            waterfall=wf, range=rng, speed=spd, strength=stg, detected=det,
            psd=psd, col_count=n_cols, carry=carry,
        )
