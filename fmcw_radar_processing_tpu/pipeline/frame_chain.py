"""The per-frame processing chain, batched over a whole recording.

The reference iterates frames serially (radar_processing.m:197-261). Here
the chain is one traced function over the full [F, PN, NTS] recording —
every stage is batched, so XLA sees two large matmuls (range DFT, Doppler
DFT) plus fused elementwise/reduction epilogues, and the MXU stays busy for
the entire recording instead of dispatching per frame.

Variable-length state (the concatenated slow-time signal,
radar_processing.m:255-260) is handled with the fixed-capacity idiom:
chirp rows of detected frames are scatter-packed into a [F·PN] buffer with
a valid count — no dynamic shapes, no host round-trips inside the graph.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fmcw_radar_processing_tpu.config import RadarConfig
from fmcw_radar_processing_tpu.dsp.detection import DetectionResult, search_peaks
from fmcw_radar_processing_tpu.dsp.fast_time import (
    FastTimeOperator,
    PackedFastTime,
    range_profile,
)
from fmcw_radar_processing_tpu.dsp.slow_time import (
    DopplerPeaks,
    SlowTimeOperator,
    doppler_at_bins,
    doppler_peaks_at,
    measurements,
)
from fmcw_radar_processing_tpu.utils.cplx import pair_matmul


class FrameChainOutputs(NamedTuple):
    """Per-frame chain results for a recording of F frames."""

    waterfall: jax.Array  # [F, K] float32 — abs-max over chirps (:265)
    detection: DetectionResult  # idx/magnitude/valid, each [F, T]
    doppler: DopplerPeaks  # doppler_idx/speed, each [F, T]
    strength: jax.Array  # [T, F] float32, NaN-filled
    range: jax.Array  # [T, F] float32, NaN-filled
    speed: jax.Array  # [T, F] float32, NaN-filled
    strongest_chirps: jax.Array  # [F, PN, 2] float32 pair — range FFT rows
    # at the strongest target's bin (radar_processing.m:258-259); garbage
    # where detected is False
    detected: jax.Array  # [F] bool
    range_fft: jax.Array | None  # [F, PN, K, 2] float32 pair, if requested


def resolve_impl(impl: str) -> str:
    """'auto' → the measured-fastest acceptable impl for the backend.

    On TPU that is 'pallas_profile_high' (r4 matrix: 3.66M vs
    pallas_profile's 3.35M frames/s; the profile kernel is MXU-pass-bound
    so bf16x3's 3 passes halve its stage time at ~2^-18 relative —
    waterfall 110 dB vs the f64 oracle, detections/ranges exact,
    spectrogram unchanged). 'pallas_profile' remains the exact-f32
    choice; 'pallas_profile_bf16' the measured-fastest (55 dB waterfall,
    opt-in). Elsewhere 'fused' (the Pallas interpreter would crawl on
    CPU).
    """
    if impl != "auto":
        return impl
    return ("pallas_profile_high"
            if jax.default_backend() in ("tpu", "axon") else "fused")


def make_frame_chain(
    cfg: RadarConfig, return_range_fft: bool = False, impl: str = "auto"
):
    """Build the jitted recording chain for a fixed config.

    Returns fn(raw [F, PN, NTS, 2], calib [NTS, 2]) -> FrameChainOutputs.
    F is a trace-time constant (one compile per recording length bucket).

    impl:
      'auto'   (default) resolve_impl: pallas_profile on TPU, fused
               elsewhere.
      'fused'  (default) packed single-matmul fast-time with the profile
               reduction fused into the matmul epilogue; the [F, PN, K, 2]
               range-FFT tensor is never written to HBM — chirp rows at the
               T detected bins are recomputed with a gathered-weight matmul
               (dsp/fast_time.py PackedFastTime).
      'xla'    einsum formulation, full range-FFT materialized.
      'fused_bf16'  fused with bfloat16 MXU inputs (f32 accumulate) — 2×
               MXU rate and half the weight/input HBM traffic; accuracy
               delta recorded by bench.py's SNR column.
      'pallas' hand-fused VMEM kernels (ops/) for fast-time + peak search.
      'pallas_profile'  profile-only Pallas fast-time kernel (the range-FFT
               cube never reaches HBM) + XLA peak search.
      'pallas_profile_high'  same kernel at bf16x3 (3 MXU passes,
               ~2^-18 relative — ops/fast_time_pallas._profile_kernel_b3)
               instead of HIGHEST's 6: the kernel is pass-bound, not
               traffic-bound (ROOFLINE_r04), so this halves its time.
      'pallas_profile_bf16'  same kernel with in-register bf16 MXU operands
               (f32 accumulate, f32 HBM traffic) — 2× MXU rate on the
               dominant matmul; payload-side rf_at_bins stays f32.
    Outputs are identical across impls (tests/test_pallas_chain.py); the
    bf16 variants are identical up to input quantization (~40 dB SNR).
    """
    impl = resolve_impl(impl)
    if impl not in ("fused", "xla", "pallas", "pallas_profile",
                    "pallas_profile_high", "pallas_profile_bf16",
                    "fused_bf16"):
        raise ValueError(f"unknown impl {impl!r}")
    ft = FastTimeOperator.create(cfg)
    pft = PackedFastTime.create(
        cfg, jnp.bfloat16 if impl == "fused_bf16" else jnp.float32
    )
    st = SlowTimeOperator.create(cfg)

    @jax.jit
    def chain(raw: jax.Array, calib: jax.Array) -> FrameChainOutputs:
        rf = None
        if impl == "pallas":
            from fmcw_radar_processing_tpu.ops.detect_pallas import (
                search_peaks_pallas,
            )
            from fmcw_radar_processing_tpu.ops.fast_time_pallas import (
                fast_time_pallas,
            )

            rf, profile = fast_time_pallas(raw, calib, cfg)
            det = search_peaks_pallas(profile, cfg)
        elif (impl in ("pallas_profile", "pallas_profile_high",
                       "pallas_profile_bf16")
              and not return_range_fft):
            from fmcw_radar_processing_tpu.ops.fast_time_pallas import (
                fast_time_profile_pallas,
            )

            profile = fast_time_profile_pallas(
                raw, calib, cfg,
                compute_dtype=(jnp.bfloat16 if impl == "pallas_profile_bf16"
                               else jnp.float32),
                precision=("high" if impl == "pallas_profile_high"
                           else None),
            )
            det = search_peaks(profile, cfg)
        elif impl in ("fused", "fused_bf16") and not return_range_fft:
            profile = pft.profile(raw, calib)  # [F, K], rf never in HBM
            det = search_peaks(profile, cfg)  # [F, T]
        else:
            rf = (ft(raw, calib) if impl == "xla"
                  else pft.rf(raw, calib))  # [F, PN, K, 2]
            profile = range_profile(rf)  # [F, K]
            det = search_peaks(profile, cfg)  # [F, T]
        # Doppler only at detected bins (radar_processing.m:216-219): T ≪ K,
        # so the full [F, K, D] map is never materialized.
        if rf is None:
            # Recompute the detected bins' chirp rows: [F, PN, T, 2].
            rf_rows = pft.rf_at_bins(raw, calib, det.idx)
            rows = jnp.swapaxes(rf_rows, -3, -2)  # [F, T, PN, 2]
            rd_rows = pair_matmul(
                rows, jnp.asarray(st.m_re), jnp.asarray(st.m_im),
                "...tp,dp->...td",
            )  # [F, T, D, 2]
            strongest = rf_rows[:, :, 0, :]  # [F, PN, 2]
        else:
            rd_rows = doppler_at_bins(st, rf, det.idx)  # [F, T, D, 2]
            # Chirp row at the strongest detected bin, per frame (:258-259).
            strongest = jnp.take_along_axis(
                rf, det.idx[:, 0][:, None, None, None], axis=-2
            )[..., 0, :]  # [F, PN, 2]
        dop = doppler_peaks_at(rd_rows, cfg)
        meas = measurements(det, dop, cfg)
        return FrameChainOutputs(
            waterfall=profile,
            detection=det,
            doppler=dop,
            strength=meas.strength,
            range=meas.range,
            speed=meas.speed,
            strongest_chirps=strongest,
            detected=det.valid[:, 0],
            range_fft=rf if return_range_fft else None,
        )

    return chain


@functools.partial(jax.jit, static_argnames=("pn",))
def pack_slow_time(
    strongest_chirps: jax.Array, detected: jax.Array, pn: int
) -> tuple[jax.Array, jax.Array]:
    """Concatenate chirp rows of detected frames (radar_processing.m:255-260)
    into a fixed-capacity buffer.

    Frames with no detection are skipped — the slow-time axis "skips" those
    periods by design (:519-522). Packing is a stable partition: sort the F
    frames by (not detected) with original order preserved, gather whole
    chirp rows, zero everything past the valid prefix. A row-scatter
    formulation is semantically identical but ~40 ms slower on a v5e for a
    65k-frame recording — TPU scatters with F·PN item indices serialize,
    while a 65k-key sort plus a contiguous [F, PN, 2] row gather stays
    vectorized (measured: the scatter was 2/3 of the whole chain's chip
    time).

    Returns (signal [F·PN, 2] float32 pair, valid_count scalar int32).
    """
    f = strongest_chirps.shape[0]
    perm = jnp.argsort(jnp.where(detected, 0, 1).astype(jnp.int32),
                       stable=True)  # detected frames first, in order
    gathered = jnp.take(strongest_chirps.astype(jnp.float32), perm, axis=0)
    n_det = jnp.sum(detected.astype(jnp.int32))
    keep = jnp.arange(f, dtype=jnp.int32) < n_det
    out = jnp.where(keep[:, None, None], gathered, 0.0)
    return out.reshape(f * pn, 2), n_det * pn
