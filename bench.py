"""Benchmark: IQ frames/sec/chip on the full radar chain.

Default mode prints ONE JSON line {"metric", "value", "unit",
"vs_baseline"} — the headline batched-replay throughput vs the
reference-semantics serial NumPy oracle on CPU (the stand-in for the
reference's MATLAB loop; the reference publishes no throughput numbers,
BASELINE.md).

``--matrix`` runs the full benchmark matrix over BASELINE.json's five
configs plus a literal-fidelity STFT line, with an (impl × MXU-precision ×
export-path × artifact-dtype) variant grid on the batched-replay config,
and per-row estimated FLOPs, TFLOP/s, MFU, an analytic bytes/frame model
with achieved GB/s against the chip's HBM peak, and output SNR vs the
MATLAB-semantics f64 oracle. Every row is steady-state on-device timing
with returned artifacts barrier-materialized (see _make_full). Results go
to BENCH_MATRIX.json and printed JSON lines.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


# Peak MXU throughput by device kind (dense, per chip). MFU is reported
# against the bf16 peak for every row — f32 matmuls cannot exceed it, so
# the figure is conservative and comparable across dtypes.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e bf16 peak (public spec, ~197 TFLOP/s)
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
}

# Peak HBM bandwidth per chip (public specs). The chain is bandwidth-bound
# (MFU of a few percent but most of HBM consumed), so the roofline that
# matters is bytes/s, not FLOP/s.
PEAK_HBM_GBPS = {
    "TPU v5 lite": 819.0,  # v5e: 16 GB HBM2 @ ~819 GB/s
    "TPU v4": 1228.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1638.0,
}


def _chip_peak(table) -> float | None:
    import jax

    kind = jax.devices()[0].device_kind
    for name, peak in table.items():
        if kind.startswith(name):
            return peak
    return None


def chip_peak_flops() -> float | None:
    return _chip_peak(PEAK_FLOPS)


def chip_peak_hbm_gbps() -> float | None:
    return _chip_peak(PEAK_HBM_GBPS)


# ---------------------------------------------------------------------------
# FLOPs model (per frame) — analytic, from the operator shapes.
# ---------------------------------------------------------------------------

def chain_flops_per_frame(cfg, stft_nfft: int, with_rescale: bool = True) -> float:
    """FLOPs of the production chain per frame (f32 ops counted as
    2·M·N·K per matmul; elementwise/reduction epilogues are negligible).

    The rescale term follows cfg.algorithm.rescale_method: the dense
    contraction is 2·1024·nb per STFT column (65% of the chain — the r2
    formulation); the gather form is a 3-op lerp per output element."""
    pn, nts, k = cfg.pn, cfg.nts, cfg.range_fft_size
    d = cfg.doppler_fft_size
    t = cfg.algorithm.max_num_targets
    nb = stft_nfft // 2 + 1
    wl = cfg.algorithm.stft_window_length
    fast_time = 2.0 * pn * (2 * nts) * (2 * k)  # packed DFT matmul
    rf_rows = 2.0 * pn * (2 * nts) * (2 * t)  # detected-bin recompute
    doppler = 2.0 * t * (2 * pn) * (2 * d)
    stft = pn * 2 * (2.0 * nb * wl)  # PN new columns/frame, re+im matmuls
    if not with_rescale:
        rescale = 0.0
    elif getattr(cfg.algorithm, "rescale_method", "gather") == "matmul":
        rescale = pn * (2.0 * cfg.algorithm.max_freq_bins * nb)
    else:
        rescale = pn * (3.0 * cfg.algorithm.max_freq_bins)  # lerp
    return fast_time + rf_rows + doppler + stft + rescale


def chain_bytes_per_frame(cfg, stft_nfft: int, with_rescale: bool = True,
                          intensity_bytes: int = 4) -> float:
    """Analytic HBM bytes/frame of the fused full chain (f32 = 4 B).

    Minimal-traffic model under XLA fusion: each matmul result is written
    once and read once by its (fused-elementwise) consumer; elementwise
    chains do not round-trip. Terms, per frame (PN slow-time samples):

      raw          read twice — profile matmul + rf_at_bins recompute
      waterfall    [K] write + fingerprint read
      frame matrix [W, PN] write + one read each by the re/im STFT matmuls
      s_re, s_im   [nb, PN] written by the two matmuls, read by the fused
                   PSD epilogue
      psd→dB       [nb, PN] one write (PSD/dB elementwise chain fuses),
                   one read each by the global-max pass and the rescale
      intensity    [1024, PN] written once (``intensity_bytes`` per
                   element — 4 f32, 2 bf16); its consumer is the host DMA,
                   not another compute pass

    Small terms (detection outputs, packed rows, argsort keys, the [F·PN]
    magnitude signal) are included where ≥ 64 B/frame, dropped otherwise.
    The model is deliberately *minimal*: achieved-GB/s computed against it
    is a lower bound on true traffic, so hbm_pct is conservative.
    """
    pn, nts, k = cfg.pn, cfg.nts, cfg.range_fft_size
    nb = stft_nfft // 2 + 1
    wl = cfg.algorithm.stft_window_length
    raw = 2 * (pn * 2 * nts * 4)
    waterfall = 2 * (k * 4)
    pack = 4 * (pn * 2 * 4)  # strongest rows w+r, packed gather w+r
    sig = 2 * (pn * 4)  # |slow-time| magnitude write + framing read
    from fmcw_radar_processing_tpu.dsp.stft import resolve_stft_impl

    if resolve_stft_impl(cfg.algorithm.stft_impl, 1,
                         stft_nfft) == "pallas":
        # Fused export (ops/stft_pallas.py): frame matrix and complex
        # parts stay in VMEM; PSD w + r (across the two phases) + dB w.
        # (The recompute formulation that also drops the PSD round-trip is
        # a measured NEGATIVE result on the v5e — see spectrogram_pallas.)
        frames_mat = 0
        s_parts = 0
        psd = 3 * (nb * pn * 4)
    else:
        frames_mat = 3 * (wl * pn * 4)
        s_parts = 4 * (nb * pn * 4)
        psd = 3 * (nb * pn * 4)
    rescale = (cfg.algorithm.max_freq_bins * pn * intensity_bytes
               if with_rescale else 0)
    return float(raw + waterfall + pack + sig + frames_mat + s_parts + psd
                 + rescale)


# ---------------------------------------------------------------------------
# Timed pipelines. All use the scalar-fingerprint D2H sync: on tunneled TPU
# runtimes block_until_ready can return before remote execution finishes and
# bulk D2H bandwidth is not part of the kernel-time metric.
# ---------------------------------------------------------------------------

def _make_full(cfg, impl: str, nfft: int):
    import jax
    import jax.numpy as jnp

    from fmcw_radar_processing_tpu.dsp.stft import (
        StftOperator,
        log_frequency_rescale,
        psd_db,
    )
    from fmcw_radar_processing_tpu.pipeline.frame_chain import (
        make_frame_chain,
        pack_slow_time,
    )
    from fmcw_radar_processing_tpu.utils.cplx import pair_abs

    chain = make_frame_chain(cfg, impl=impl)
    op = StftOperator.create(
        window_length=cfg.algorithm.stft_window_length,
        beta=cfg.algorithm.stft_kaiser_beta,
        nfft=nfft,
        fs=1.0 / cfg.derived.prt,
        hop=cfg.algorithm.stft_hop or 1,
        precision=cfg.algorithm.matmul_precision,
    )

    from fmcw_radar_processing_tpu.dsp.stft import resolve_stft_impl

    stft_impl = resolve_stft_impl(cfg.algorithm.stft_impl, op.hop, op.nfft)

    @jax.jit
    def full(raw_d, calib_d):
        out = chain(raw_d, calib_d)
        sig, count = pack_slow_time(out.strongest_chirps, out.detected, cfg.pn)
        int_dtype = {"bfloat16": jnp.bfloat16, "int8": jnp.int8}.get(
            cfg.algorithm.intensity_dtype, jnp.float32)
        if stft_impl == "pallas":
            from fmcw_radar_processing_tpu.ops.stft_pallas import (
                resolves_tiled,
                spectrogram_pallas,
            )

            # Plumbed config knob (ADVICE r4): benches time exactly what
            # the pipeline would run for this config — the fidelity
            # config's "highest" phase 1 vs production's bf16x3 "high".
            # The tiled (large-nfft) path is HIGHEST-only.
            psd_prec = cfg.algorithm.stft_psd_precision
            psd_store = (jnp.bfloat16
                         if cfg.algorithm.stft_psd_store == "bfloat16"
                         else jnp.float32)
            db_store = (jnp.bfloat16
                        if cfg.algorithm.stft_db_store == "bfloat16"
                        else jnp.float32)
            if resolves_tiled(op):
                psd_prec = "highest"
                psd_store = jnp.float32
                db_store = jnp.float32
            _, db, intensity = spectrogram_pallas(
                pair_abs(sig), count, op, cfg.algorithm.max_freq_bins,
                intensity_dtype=int_dtype, psd_precision=psd_prec,
                psd_store_dtype=psd_store, db_store_dtype=db_store,
            )
        else:
            res = op(pair_abs(sig), valid_len=count)
            db = psd_db(res)
            _, intensity = log_frequency_rescale(
                res.freqs, db, cfg.algorithm.max_freq_bins,
                precision=cfg.algorithm.rescale_precision,
                method=cfg.algorithm.rescale_method,
            )
            if int_dtype == jnp.bfloat16:
                intensity = intensity.astype(jnp.bfloat16)
            elif int_dtype == jnp.int8:
                from fmcw_radar_processing_tpu.dsp.stft import (
                    quantize_db_int8,
                )

                intensity = quantize_db_int8(intensity)
        # HONEST-MATERIALIZATION fingerprint (r3 fix): the barrier forces
        # the [1024, F·PN] intensity and the waterfall — the artifacts
        # production returns — to be fully WRITTEN to HBM before the
        # fingerprint. Without it XLA fuses jnp.sum into the rescale
        # matmul's epilogue and the chain's largest tensor never exists
        # (measured: the rescale stage then ran BELOW its own output-write
        # traffic bound, i.e. r2's recorded 3.11M frames/s was flattered
        # ~1.4× relative to the production path, which returns the array —
        # honestly re-measured at 2.2M). The fingerprint reads only a
        # strided sample: the barrier's operands cannot be dead-code
        # eliminated, so the full write happens, and production's consumer
        # of the artifact is the host DMA, not another compute pass —
        # re-reading all of it here would bill bench-only traffic.
        intensity, waterfall = jax.lax.optimization_barrier(
            (intensity, out.waterfall)
        )
        # r4 probe fix: the r3 probe was intensity[::31, ::63] — a strided
        # slice that XLA lowers to a [34, 16644]-index GATHER costing
        # 6.6 ms/iteration, 22% of the measured device time at 65536
        # frames (ROOFLINE_r04.json fusion.99). The barrier above is what
        # guarantees full materialization; the probe only needs a data
        # dependence on it, so read one contiguous lane-aligned block
        # (~10 µs) instead. Every r3 row paid the gather equally, so r3
        # comparisons stand; absolute throughput was understated ~22%.
        probe = intensity[:, :128].astype(jnp.float32)
        return (
            jnp.sum(waterfall)
            + jnp.sum(jnp.where(jnp.isfinite(out.range), out.range, 0.0))
            + jnp.sum(jnp.where(jnp.isfinite(out.speed), out.speed, 0.0))
            + jnp.sum(jnp.where(jnp.isfinite(probe), probe, 0.0))
        )

    return full


def _scalar(out):
    """Pull the fingerprint scalar (last element if fn returns a tuple)."""
    return float(out[-1] if isinstance(out, tuple) else out)


def _intensity_bytes(cfg) -> int:
    """Per-element store size of the [1024, T] intensity artifact."""
    return {"bfloat16": 2, "int8": 1}.get(cfg.algorithm.intensity_dtype, 4)


def _latency_stats(scalar_fn, args, inners=(4096, 16384), runs: int = 5) -> dict:
    """Calibrated steady-state latency distribution for tiny programs.

    The r3 single-number subtraction ((T(inner) − T(1)) / (inner − 1) at one
    inner count) was noise-dominated for sub-µs programs: the ~24 ms
    tunneled-dispatch constant jitters by ±ms between calls, and at
    inner=256 that jitter is ±4 µs/iter — a 10× spread across runs. Fix:
    sweep inner ∈ {4k, 16k} so the on-device signal (inner·latency) is ≫
    dispatch jitter, take the dispatch floor as min T(1) over ``runs``
    repeats, and report the median/p95 of the per-run estimates
    (T_run(inner) − floor) / (inner − 1) pooled across the sweep."""
    import numpy as np

    ests: list[float] = []
    per_inner: dict[int, float] = {}
    for inner in inners:
        r1 = _repeat_jit(scalar_fn, 1)
        rn = _repeat_jit(scalar_fn, inner)
        _scalar(r1(*args))
        _scalar(rn(*args))
        t1s, tns = [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            _scalar(r1(*args))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _scalar(rn(*args))
            tns.append(time.perf_counter() - t0)
        floor = min(t1s)
        vals = [(tn - floor) / (inner - 1) for tn in tns if tn > floor]
        if vals:
            per_inner[inner] = float(np.median(vals))
            ests.extend(vals)
    if not ests:
        # Every repeated run landed at/below the dispatch floor (can happen
        # on CPU smoke runs where the whole program is sub-noise): fall
        # back to the inclusive rate rather than taking a median of an
        # empty array and recording NaN rows (ADVICE r4).
        inner = max(inners)
        rn = _repeat_jit(scalar_fn, inner)
        _scalar(rn(*args))
        t0 = time.perf_counter()
        _scalar(rn(*args))
        ests = [(time.perf_counter() - t0) / inner]
        per_inner[inner] = ests[0]
    arr = np.asarray(sorted(ests))
    return {
        "chip_latency_us": round(float(np.median(arr)) * 1e6, 3),
        "chip_latency_p95_us": round(float(np.percentile(arr, 95)) * 1e6, 3),
        "latency_samples": len(ests),
        "latency_per_inner_us": {
            str(k): round(v * 1e6, 3) for k, v in per_inner.items()
        },
    }


def _time_call(fn, args, iters: int = 5) -> float:
    """Min wall time of one fn(*args) call with a scalar D2H sync —
    latency including one host→device dispatch (~24 ms through the
    tunneled runtime; the single-frame configs exist to record exactly
    that end-to-end latency)."""
    _scalar(fn(*args))  # warmup/compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _scalar(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _repeat_jit(scalar_fn, n: int):
    """Wrap a scalar-returning traced fn so it runs n times inside ONE
    dispatched program. The optimization_barrier threads the accumulator
    through every iteration's *inputs*, so XLA can neither hoist the body
    out of the fori_loop nor CSE the iterations."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(*args):
        def body(_, acc):
            chained = jax.lax.optimization_barrier((acc,) + args)
            return chained[0] + scalar_fn(*chained[1:])
        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    return run


def _time_steady(scalar_fn, args, inner: int = 8, iters: int = 3) -> float:
    """Steady-state per-iteration device time via on-device repetition:
    (time(2·inner runs) − time(inner runs)) / inner — TWO LARGE endpoints.

    The tunneled runtime charges a fixed ~24 ms host↔device round trip
    per dispatch, which would swamp a per-iteration measurement;
    repeating the workload inside one program and differencing two
    repeat counts cancels the constant. The r4 form differenced against
    a SINGLE run — its small endpoint is mostly dispatch constant, and
    at small workloads (config 3's 4096 frames ≈ 0.7 ms/iter) ±2 ms of
    endpoint jitter swung the estimate up to 2× (one median-of-3 read
    8.2M frames/s = 880 GB/s implied, above the HBM roof). With both
    endpoints ≫ the dispatch time the constant cancels robustly — the
    streaming bench learned this in r4; this applies it everywhere."""
    ra = _repeat_jit(scalar_fn, inner)
    rb = _repeat_jit(scalar_fn, 2 * inner)
    _scalar(ra(*args))
    _scalar(rb(*args))
    ba = bb = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _scalar(ra(*args))
        ba = min(ba, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _scalar(rb(*args))
        bb = min(bb, time.perf_counter() - t0)
    dt = (bb - ba) / inner
    if dt <= 0:  # timing noise swamped the difference (tiny workloads on
        dt = bb / (2 * inner)  # CPU smoke): fall back to the inclusive rate
    return dt


def _bench_streaming_steady(sp, raw_c, calib_c, inner: int = 8,
                            iters: int = 3) -> float:
    """Steady-state seconds per streaming window.

    Chains ``inner`` windows inside ONE dispatched program, threading the
    carry/running-max state exactly as deployment does, and differences
    against a 1-window program to remove the dispatch constant. The
    optimization_barrier re-derives the (constant) raw input from the
    loop-carried accumulator each iteration so XLA cannot hoist the frame
    chain out of the loop."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def make(n):
        @jax.jit
        def run(raw, calib, carry, clen, mp):
            def body(_, st):
                carry, clen, mp, acc = st
                acc, raw_b, calib_b = lax.optimization_barrier(
                    (acc, raw, calib)
                )
                outs = sp._step(raw_b, calib_b, carry, clen, mp)
                wf, psd = outs[0], outs[5]
                acc = acc + jnp.sum(psd[..., -1]) + jnp.sum(wf[..., -1, :])
                return (outs[9], outs[10], outs[11], acc)

            st0 = (carry, clen, mp, jnp.float32(0.0))
            return lax.fori_loop(0, n, body, st0)[3]

        return run

    # Difference between TWO large inner counts (inner vs 2·inner), both
    # min-of-iters: the r4 single-window subtraction (T(inner) − T(1))
    # glitched when T(1) caught a slow tunnel moment — one matrix row
    # recorded a physically impossible 47.8M frames/s (≈ 2 TB/s implied
    # HBM traffic). With both endpoints ≫ dispatch time the constant
    # cancels and neither endpoint's jitter dominates the difference.
    args = (raw_c, calib_c, sp._carry, sp._carry_len, sp._max_power)
    ra, rb = make(inner), make(2 * inner)
    float(ra(*args))
    float(rb(*args))
    ba = bb = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(ra(*args))
        ba = min(ba, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(rb(*args))
        bb = min(bb, time.perf_counter() - t0)
    dt = (bb - ba) / inner
    if dt <= 0:
        dt = bb / (2 * inner)
    return dt


def bench_tpu(cfg, raw, calib, iters: int = 3, impl: str = "auto",
              nfft: int = 256, inner: int | None = None) -> float:
    import jax.numpy as jnp

    full = _make_full(cfg, impl, nfft)
    # Flat pair-rows across the jit boundary: free host view, avoids the
    # ~8 ms in-graph relayout of a [.., NTS, 2] device parameter (see
    # PackedFastTime._flat_rows).
    import numpy as np

    raw = np.asarray(raw).reshape(raw.shape[0], cfg.pn, -1)
    if inner is None:
        # Keep the smaller endpoint's on-device time ≫ the ~2 ms dispatch
        # jitter: ~8 iterations at 65k frames (13 ms/iter), more at small
        # workloads.
        inner = 8 if raw.shape[0] >= 32768 else 32
    dt = _time_steady(full, (jnp.asarray(raw), jnp.asarray(calib)),
                      inner=inner, iters=iters)
    return raw.shape[0] / dt


def bench_cpu_oracle(cfg, raw_matlab, calib, nfft: int,
                     iters: int = 2) -> float:
    """Serial reference-semantics chain on CPU (frames/sec, best of
    ``iters`` — the shared bench host is noisy and a one-shot baseline
    made vs_baseline swing ~2× between runs)."""
    from tests.oracle import (
        log_rescale_oracle,
        process_recording_oracle,
        psd_db_oracle,
        spectrogram_oracle,
    )

    f = raw_matlab.shape[0]
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        res = process_recording_oracle(raw_matlab, calib, cfg)
        iq = abs(res.slow_time_signal)
        if len(iq) >= cfg.algorithm.stft_window_length:
            freqs, times, p = spectrogram_oracle(
                iq, 1.0 / cfg.derived.prt, nfft=nfft
            )
            db = psd_db_oracle(p)
            log_rescale_oracle(freqs, db)
        best = min(best, time.perf_counter() - t0)
    return f / best


# ---------------------------------------------------------------------------
# SNR vs the MATLAB-semantics oracle.
# ---------------------------------------------------------------------------

def _snr_db(got, want) -> float:
    import numpy as np

    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    err = np.linalg.norm(got - want)
    ref = np.linalg.norm(want)
    if err == 0.0:
        return float("inf")
    return float(-20.0 * np.log10(err / max(ref, 1e-300)))


def snr_vs_oracle(cfg, rec, impl: str, nfft: int, f: int = 256) -> dict:
    """Chain+spectrogram SNR against tests/oracle.py on an f-frame subset."""
    import dataclasses

    import numpy as np

    from fmcw_radar_processing_tpu.pipeline.recording import RadarPipeline
    from tests.oracle import (
        log_rescale_oracle,
        process_recording_oracle,
        psd_db_oracle,
        spectrogram_oracle,
    )

    raw = rec.rx1_pair()[:f]
    calib = rec.calib_pair(0, cfg.nts)
    cfg_nfft = dataclasses.replace(
        cfg, algorithm=dataclasses.replace(cfg.algorithm, stft_nfft=nfft)
    )
    pipe = RadarPipeline(cfg_nfft, impl=impl)
    out = pipe.process_recording(raw, calib)

    raw_matlab = np.swapaxes(rec.rx1()[:f], -1, -2)
    res = process_recording_oracle(raw_matlab, rec.calib_vector(0, cfg.nts), cfg)
    iq = np.abs(res.slow_time_signal)
    freqs, _, p = spectrogram_oracle(iq, 1.0 / cfg.derived.prt, nfft=nfft)
    db = psd_db_oracle(p)
    _, want_intensity = log_rescale_oracle(freqs, db)

    t = min(out.spectrogram_intensity.shape[1], want_intensity.shape[1])
    floor = -1000.0  # dsp/stft.DB_FLOOR stands in for the oracle's -inf
    got_i = np.asarray(out.spectrogram_intensity, np.float64)[:, :t]
    want_i = np.asarray(want_intensity, np.float64)[:, :t]
    # Display-band error: max |err| over bins the reference actually
    # RENDERS — oracle dB within the PNG's clim [−40, 0]
    # (radar_processing.m:340). This is the promotion criterion for lossy
    # artifact dtypes: ≤ 0.15 dB here is invisible at the display clim.
    band = want_i >= -40.0
    display_err = (float(np.abs(got_i - want_i)[band].max())
                   if band.any() else 0.0)
    return {
        "waterfall_snr_db": round(
            _snr_db(out.waterfall, res.waterfall), 1
        ),
        "spectrogram_snr_db": round(
            _snr_db(
                np.maximum(got_i, floor), np.maximum(want_i, floor)
            ),
            1,
        ),
        "display_band_err_db": round(display_err, 4),
        "range_exact": bool(
            np.array_equal(
                np.nan_to_num(out.target_range), np.nan_to_num(res.range)
            )
        ),
    }


# ---------------------------------------------------------------------------
# Matrix
# ---------------------------------------------------------------------------

def run_matrix(quick: bool = False) -> list[dict]:
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fmcw_radar_processing_tpu.config import (
        AlgorithmConfig,
        RadarConfig,
        default_device_config,
    )
    from fmcw_radar_processing_tpu.config.radar import next_pow2
    from fmcw_radar_processing_tpu.io.synth import (
        SyntheticTarget,
        synthesize_recording,
    )

    nfft = 256
    # Base grid config pins intensity_dtype f32 so rows stay comparable
    # across rounds regardless of the production default; bf16 intensity
    # appears as its own explicit variant rows.
    cfg = RadarConfig.create(
        default_device_config(),
        AlgorithmConfig(stft_nfft=nfft, intensity_dtype="float32"),
    )
    peak = chip_peak_flops()
    backend = jax.devices()[0].device_kind
    targets = (
        SyntheticTarget(range_m=7.5, doppler_bin_offset=3,
                        md_phase_rad=1.0, md_rate_hz=40.0),
        SyntheticTarget(range_m=16.9, doppler_bin_offset=-2, amplitude=2.5),
    )
    f_big = 4096 if quick else 65536
    rec = synthesize_recording(cfg, f_big, targets, seed=0)
    raw_all = rec.rx1_pair()
    calib = rec.calib_pair(0, cfg.nts)
    rows: list[dict] = []
    fpf = chain_flops_per_frame(cfg, nfft)
    bpf = chain_bytes_per_frame(cfg, nfft)
    hbm_peak = chip_peak_hbm_gbps()

    def add(config, impl, fps, flops_per_frame, extra=None,
            bytes_per_frame=None):
        tf = fps * flops_per_frame
        row = {
            "config": config,
            "impl": impl,
            "frames_per_s": round(fps, 1),
            "est_mflop_per_frame": round(flops_per_frame / 1e6, 3),
            "tflops": round(tf / 1e12, 3),
            "mfu_pct": round(100 * tf / peak, 3) if peak else None,
        }
        if bytes_per_frame is not None:
            gbps = fps * bytes_per_frame / 1e9
            row["est_kb_per_frame"] = round(bytes_per_frame / 1024, 1)
            row["achieved_gbps"] = round(gbps, 1)
            row["hbm_pct"] = (round(100 * gbps / hbm_peak, 1)
                              if hbm_peak else None)
            if hbm_peak and gbps > hbm_peak:
                row["bandwidth_note"] = (
                    "implied GB/s above the HBM roof — physically "
                    "impossible; estimator overshoot at this program "
                    "size (see the ROOFLINE entry for the device-trace "
                    "rate)")
        row.update(extra or {})
        rows.append(row)
        print(json.dumps(row), flush=True)

    def robust(label, fn):
        """Run one matrix section with retries (transient tunneled-backend
        errors must not kill a long run); record the failure and move on."""
        err = None
        for attempt in range(3):
            try:
                return fn()
            except Exception as e:
                err = repr(e)[:200]
                print(json.dumps({"config": label, "attempt": attempt,
                                  "error": err}), flush=True)
                time.sleep(15)
        rows.append({"config": label, "error": err})
        return None

    # -- BASELINE config 1: single synthetic IQ frame, fast-time + magnitude
    # Two numbers: chip latency (steady-state, on-device repeat — what a
    # locally-dispatched deployment sees) and e2e latency including one
    # tunneled host↔device dispatch (what THIS harness sees per call).
    from fmcw_radar_processing_tpu.dsp.fast_time import PackedFastTime

    pft = PackedFastTime.create(cfg)

    @jax.jit
    def single_ft(raw_d, calib_d):
        return jnp.sum(pft.profile(raw_d, calib_d))

    one = jnp.asarray(raw_all[:1])

    def config1():
        dt_e2e = _time_call(single_ft, (one, jnp.asarray(calib)))
        stats = _latency_stats(single_ft, (one, jnp.asarray(calib)))
        dt = stats["chip_latency_us"] * 1e-6
        stats["e2e_latency_us"] = round(dt_e2e * 1e6, 1)
        add("1_single_frame_fast_time", "fused", 1.0 / dt,
            2.0 * cfg.pn * 2 * cfg.nts * 2 * cfg.range_fft_size, stats)

    robust("1_single_frame_fast_time", config1)

    # -- BASELINE config 2: full single-frame chain -> range-speed
    from fmcw_radar_processing_tpu.pipeline.frame_chain import make_frame_chain

    chain1 = make_frame_chain(cfg)

    @jax.jit
    def single_full(raw_d, calib_d):
        out = chain1(raw_d, calib_d)
        return (jnp.sum(out.waterfall)
                + jnp.sum(jnp.nan_to_num(out.range))
                + jnp.sum(jnp.nan_to_num(out.speed)))

    def config2():
        dt_e2e = _time_call(single_full, (one, jnp.asarray(calib)))
        stats = _latency_stats(single_full, (one, jnp.asarray(calib)),
                               inners=(1024, 4096))
        dt = stats["chip_latency_us"] * 1e-6
        stats["e2e_latency_us"] = round(dt_e2e * 1e6, 1)
        add("2_single_frame_full_chain", "fused", 1.0 / dt,
            chain_flops_per_frame(cfg, nfft, with_rescale=False), stats)

    robust("2_single_frame_full_chain", config2)

    # -- BASELINE config 3: multi-frame STFT spectrogram. MEDIAN of 3
    # trials: at 4096 frames the per-iteration device time (~0.7 ms) is
    # small against the ~24 ms tunneled dispatch jitter, and a single
    # difference estimate can swing 5x either way (one r5 sample read
    # 1.07M where the profiler's device trace says 5.6M).
    f_mid = min(4096, f_big)

    def config3():
        import statistics

        fps3 = statistics.median(
            bench_tpu(cfg, raw_all[:f_mid], calib, nfft=nfft)
            for _ in range(3))
        add("3_multi_frame_stft", "fused", fps3, fpf,
            {"frames": f_mid, "trials": 3}, bytes_per_frame=bpf)

    robust("3_multi_frame_stft", config3)

    # -- BASELINE config 4: batched recording replay x (impl, precision) +
    # SNR. The grid records the fidelity/speed frontier: f32 impls at MXU
    # precision highest (true f32, the production default) vs high (3-pass)
    # vs default (1 bf16 pass — what every f32 matmul silently got before
    # r3), plus the explicit-bf16 variants.
    variants = (
        {"impl": "xla", "stft_impl": "xla"},
        # XLA-export baseline: chain matmuls "highest" (free), rescale
        # matmul "high" (3-pass, ≤5e-4 dB).
        {"impl": "fused", "stft_impl": "xla"},
        # r2-equivalent: every matmul at 1 bf16 pass (the 36 dB-SNR mode).
        {"impl": "fused", "stft_impl": "xla", "matmul_precision": "default",
         "rescale_precision": "default"},
        {"impl": "fused", "stft_impl": "xla",
         "rescale_precision": "default"},
        {"impl": "fused", "stft_impl": "xla",
         "rescale_precision": "highest"},
        {"impl": "fused", "stft_impl": "xla",
         "rescale_method": "gather"},  # recorded loser
        # Fused Pallas spectrogram export (stft_impl auto→pallas on TPU).
        # Pallas-export rows pass stft_psd_precision "high" explicitly —
        # the r4 grid ran the bf16x3 phase-1 kernel as the function
        # default; since the ADVICE-r4 plumbing the function default is
        # the safe "highest", so these rows pin the measured r4 condition
        # (production's setting) to stay round-comparable.
        {"impl": "fused", "stft_psd_precision": "high"},
        # Production default: Pallas profile chain + Pallas export.
        {"impl": "pallas_profile", "stft_psd_precision": "high"},
        {"impl": "pallas_profile", "intensity_dtype": "bfloat16",
         "stft_psd_precision": "high"},
        {"impl": "fused_bf16", "stft_impl": "xla",
         "matmul_precision": "default"},
        {"impl": "pallas", "stft_impl": "xla"},
        {"impl": "pallas_profile", "stft_impl": "xla"},
        {"impl": "pallas_profile_bf16", "stft_impl": "xla",
         "matmul_precision": "default"},
        # --- r4 decoupled-knob rows (VERDICT r3 item 1): the r3 grid ran
        # every bf16-INPUT impl with matmul_precision "default" everywhere,
        # so the chain-side bf16 lever's own SNR cost was conflated with
        # the 36 dB all-default STFT/rescale quantization. These isolate it:
        # bf16 fast-time compute × highest-precision STFT + high rescale
        # (the production export settings).
        {"impl": "fused_bf16", "stft_impl": "xla"},
        {"impl": "pallas_profile_bf16", "stft_impl": "xla"},
        # bf16 chain × fused Pallas export (f32 / bf16 intensity): the
        # candidate max-throughput production configs.
        {"impl": "pallas_profile_bf16", "stft_psd_precision": "high"},
        {"impl": "pallas_profile_bf16", "intensity_dtype": "bfloat16",
         "stft_psd_precision": "high"},
        # bf16x3 3-pass chain kernel (HIGH-equivalent ~2^-18): the ROOFLINE
        # found the HIGHEST profile kernel MXU-pass-bound, so 3 passes
        # halve its stage time at display-invisible cost — candidate
        # production defaults.
        {"impl": "pallas_profile_high", "stft_psd_precision": "high"},
        {"impl": "pallas_profile_high", "intensity_dtype": "bfloat16",
         "stft_psd_precision": "high"},
        # r5 promoted production default: + bf16 dB-map store (intensity
        # error unchanged — the interpolation consumes the f32 value,
        # only the host-consumed dB export quantizes; measured +3%).
        {"impl": "pallas_profile_high", "intensity_dtype": "bfloat16",
         "stft_psd_precision": "high", "stft_db_store": "bfloat16"},
        # r5 opt-in, TRIED AND DEMOTED from production: + bf16 PSD
        # inter-phase store (~+2% more) — its display-band error rides
        # the whole map through the gmax normalization, measured
        # 0.141–0.155 dB across workloads, straddling the 0.15 criterion.
        {"impl": "pallas_profile_high", "intensity_dtype": "bfloat16",
         "stft_psd_precision": "high", "stft_psd_store": "bfloat16",
         "stft_db_store": "bfloat16"},
        # r5 (VERDICT r4 item 5): int8 affine intensity emission in the
        # phase-2 epilogue — the export kernel is output-bandwidth-bound
        # (ROOFLINE_r04: 5.55 of 13.39 ms/iter), so quartering its
        # dominant store is the one remaining write-narrowing lever. The
        # row's display_band_err_db vs the f64 oracle decides promotion
        # (criterion ≤ 0.15 dB; quantization alone is ≤ 0.083 dB).
        {"impl": "pallas_profile_high", "intensity_dtype": "int8",
         "stft_psd_precision": "high"},
    )
    for v in variants:
        v = dict(v)
        impl = v.pop("impl")
        cfg_v = dataclasses.replace(
            cfg, algorithm=dataclasses.replace(cfg.algorithm, **v)
        )
        fps = robust(f"4_batched_replay/{impl}", lambda: bench_tpu(
            cfg_v, raw_all, calib, impl=impl, nfft=nfft))
        if fps is None:
            continue
        extra = {"frames": f_big,
                 "precision": cfg_v.algorithm.matmul_precision}
        extra.update(v)
        try:
            extra.update(snr_vs_oracle(cfg_v, rec, impl, nfft))
        except Exception as e:  # oracle comparison must never kill the bench
            extra["snr_error"] = repr(e)
        add("4_batched_replay", impl, fps,
            chain_flops_per_frame(cfg_v, nfft), extra,
            bytes_per_frame=chain_bytes_per_frame(
                cfg_v, nfft, intensity_bytes=_intensity_bytes(cfg_v)))

    # -- BASELINE config 5: streaming 8-channel, steady-state: windows
    # chained on-device through the carry (the deployed shape — a resident
    # stream processor fed from device buffers, no per-window dispatch).
    from fmcw_radar_processing_tpu.pipeline.streaming import StreamingProcessor

    c, wf = 8, 256
    sp = StreamingProcessor(cfg, channels=c, window_frames=wf, nfft=nfft)
    raw_c = jax.device_put(
        np.broadcast_to(raw_all[:wf], (c, wf, cfg.pn, cfg.nts, 2))
        .reshape(c, wf, cfg.pn, -1).copy()  # flat pair-rows
    )
    calib_c = jax.device_put(np.broadcast_to(calib, (c, cfg.nts, 2)).copy())

    def config5():
        # MEDIAN of 3 outer trials: this sub-ms steady-state program shows
        # ±40% trial spread through the tunneled runtime; min-of-trials
        # compounds the difference estimator's selection bias (a best-of-3
        # r4 row recorded an impossible 47.8M — see
        # _bench_streaming_steady's estimator note).
        import statistics

        dt_win = statistics.median(
            _bench_streaming_steady(sp, raw_c, calib_c) for _ in range(3)
        )
        add("5_streaming_8ch", "fused", c * wf / dt_win, fpf,
            {"channels": c, "window_frames": wf, "trials": 3,
             "window_latency_us": round(dt_win * 1e6, 1)},
            bytes_per_frame=chain_bytes_per_frame(cfg, nfft,
                                                  with_rescale=False))

    robust("5_streaming_8ch", config5)

    # -- Fidelity mode: literal reference STFT (hop 1, nfft = 2^nextpow2(L))
    f_fid = 1024 if not quick else 256
    l_fid = f_fid * cfg.pn
    nfft_fid = next_pow2(l_fid)
    cfg_fid = RadarConfig.create(default_device_config(), AlgorithmConfig())

    def config6():
        fps_fid = bench_tpu(cfg_fid, raw_all[:f_fid], calib, nfft=nfft_fid)
        fps_prod = bench_tpu(cfg, raw_all[:f_fid], calib, nfft=nfft)
        add("6_fidelity_stft_nextpow2", "fused", fps_fid,
            chain_flops_per_frame(cfg_fid, nfft_fid),
            {"frames": f_fid, "nfft": nfft_fid,
             "fidelity_cost_x": round(fps_prod / fps_fid, 2)},
            bytes_per_frame=chain_bytes_per_frame(cfg_fid, nfft_fid))

    robust("6_fidelity_stft_nextpow2", config6)

    # -- Activity ('yes') batch mode (VERDICT r4 item 6): one of the two
    # production entry modes of the reference (radar_processing.m:440-607).
    # End-to-end HOST wall time of process_activity — the chain runs once
    # over the whole recording, then per-batch packing + STFT + payload
    # build for the first max_plots(4) qualifying batches (the reference's
    # early-stop, :597-599), including the per-batch D2H syncs and JSON
    # assembly a deployment pays. Median of 3 runs.
    def config7():
        import statistics

        from fmcw_radar_processing_tpu.pipeline.recording import RadarPipeline

        cfg_a = RadarConfig.create(default_device_config(),
                                   AlgorithmConfig.production())
        pipe = RadarPipeline(cfg_a)
        # Input pre-staged on device, like every other matrix row: a
        # first measurement passed HOST arrays and recorded 52 s — all of
        # it the 536 MB raw H2D through the TUNNELED runtime (~25 MB/s),
        # which production (local PCIe) pays in ~50 ms and which no other
        # row includes either. What this row measures is the activity
        # mode's own cost: one chain dispatch + per-batch pack/sync/STFT/
        # D2H/payload for the first max_plots qualifying batches.
        raw_dev = jax.device_put(
            np.asarray(raw_all).reshape(f_big, cfg.pn, -1))
        calib_dev = jax.device_put(np.asarray(calib))
        outs = pipe.process_activity(raw_dev, calib_dev)  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            pipe.process_activity(raw_dev, calib_dev)
            ts.append(time.perf_counter() - t0)
        dt = statistics.median(ts)
        add("7_activity_batch_mode", "production", f_big / dt,
            chain_flops_per_frame(cfg_a, nfft, with_rescale=False),
            {"frames": f_big, "batch_size": cfg_a.algorithm.batch_size,
             "max_plots": cfg_a.algorithm.max_plots,
             "batches_emitted": len(outs), "trials": 3,
             "wall_s_median": round(dt, 3),
             "wall_s_spread": [round(min(ts), 3), round(max(ts), 3)],
             "note": "host wall time end-to-end (device-resident input) "
                     "incl. per-batch D2H syncs + payload JSON assembly "
                     "— the 'yes' mode is host-orchestrated"})

    robust("7_activity_batch_mode", config7)

    meta = {
        "device_kind": backend,
        "peak_flops_assumed": peak,
        "peak_hbm_gbps_assumed": hbm_peak,
        "methodology": "steady-state on-device repetition for every row "
                       "(configs 1/2 also record e2e latency incl. one "
                       "tunneled dispatch); artifacts (intensity, "
                       "waterfall) are barrier-materialized so the timed "
                       "program writes what production returns; bytes "
                       "model documented at chain_bytes_per_frame",
        "note": "MFU against bf16 peak for all rows (f32 rows cannot exceed "
                "it; conservative and cross-dtype comparable)",
    }
    return [{"meta": meta}] + rows


def _xla_cost(compiled) -> tuple[float, float]:
    """(bytes accessed, flops) from XLA's compiler cost analysis."""
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return (float(ca.get("bytes accessed", 0.0)),
            float(ca.get("flops", 0.0)))


def _trace_top_fusions(rep, args, dispatches: int, n_iter: int,
                       run=None) -> tuple[list, float]:
    """jax.profiler device trace of ``rep(*args)`` × dispatches →
    (top-fusion list with per-iteration µs + HLO identification,
    device µs/iteration). ``run`` overrides how one dispatch is driven."""
    import collections
    import gzip
    import os
    import re
    import tempfile

    import jax

    drive = run or (lambda: _scalar(rep(*args)))
    drive()  # compile + warm OUTSIDE the trace window
    tdir = tempfile.mkdtemp(prefix="fmcw_roofline_trace_")
    jax.profiler.start_trace(tdir)
    for _ in range(dispatches):
        drive()
    jax.profiler.stop_trace()

    trace_path = None
    for root, _, files in os.walk(tdir):
        for fn in files:
            if fn.endswith("trace.json.gz"):
                trace_path = os.path.join(root, fn)
    ops = collections.Counter()
    device_total_us = 0.0
    if trace_path:
        data = json.loads(gzip.open(trace_path).read())
        events = data.get("traceEvents", [])
        pids = {e["pid"]: e["args"]["name"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        tids = {(e["pid"], e["tid"]): e["args"].get("name") for e in events
                if e.get("ph") == "M" and e.get("name") == "thread_name"}
        for e in events:
            if e.get("ph") != "X" or "TPU" not in str(pids.get(e["pid"], "")):
                continue
            lane = tids.get((e["pid"], e["tid"]), "")
            if lane == "XLA Ops":
                ops[e["name"]] += e.get("dur", 0.0)
            elif lane == "XLA Modules":
                device_total_us += e.get("dur", 0.0)

    # Attach HLO definition snippets so "fusion.N" is identifiable.
    hlo_lines = {}
    if rep is not None:
        hlo = rep.lower(*args).compile().as_text()
        for line in hlo.splitlines():
            s = line.strip()
            if s.startswith("%") and " = " in s:
                hlo_lines[s[1:].split(" ", 1)[0]] = s
            elif s.startswith("ROOT ") and " = " in s:
                hlo_lines[s[5:].split(" ", 1)[0]] = s
    top = []
    # Share against the MODULE device time (containers like the repeat
    # loop's `while` wrap their children in the ops lane and would
    # double-count against an ops-lane sum).
    total_us = device_total_us or sum(ops.values()) or 1.0
    for name, us in ops.most_common(14):
        line = hlo_lines.get(name, "")
        m = re.search(r'op_name="([^"]*)"', line)
        shape = line.split(" = ", 1)[1].split(" ", 1)[0] if " = " in line else ""
        top.append({
            "op": name,
            "us_per_iteration": round(us / n_iter, 2),
            "share_pct": round(100 * us / total_us, 1),
            "shape": shape[:100],
            "op_name": (m.group(1) if m else "")[:160],
            "is_container": name.startswith("while"),
        })
    return top, (device_total_us / n_iter if device_total_us else 0.0)


def _roofline_entry(cfg, full, args, frames: int, nfft: int,
                    label: str) -> dict:
    """One measured roofline entry for a full-chain program."""
    import numpy as np  # noqa: F401

    xla_bytes, xla_flops = _xla_cost(full.lower(*args).compile())
    dt = _time_steady(full, args)
    fps = frames / dt
    inner, dispatches = 8, 3
    rep = _repeat_jit(full, inner)
    top, dev_us = _trace_top_fusions(rep, args, dispatches,
                                     inner * dispatches)
    model_bpf = chain_bytes_per_frame(
        cfg, nfft, intensity_bytes=_intensity_bytes(cfg))
    xla_bpf = xla_bytes / frames
    hbm_peak = chip_peak_hbm_gbps()
    peak = chip_peak_flops()
    # The profiler's module device time bounds the rate for small
    # programs: the (T(n)−T(1))/(n−1) wall estimator carries the tunnel
    # dispatch constant in both endpoints and OVERSHOOTS when the
    # per-iteration device time is ≪ the ~25 ms dispatch jitter. Only
    # substitute DOWNWARD (fps_dev < fps): a trace that dropped module
    # events would inflate fps_dev, and recording an inflated reading as
    # "authoritative" is the 47.8M-incident failure mode (ADVICE r5).
    fps_dev = frames / (dev_us * 1e-6) if dev_us else None
    entry_fps = fps_dev if (fps_dev and fps_dev < fps
                            and (fps - fps_dev) / fps_dev > 0.1) else fps
    out_extra = {}
    if fps_dev and entry_fps is fps_dev:
        out_extra["fps_note"] = (
            "frames_per_s taken from the profiler's module device time "
            "(a lower, conservative bound); the wall difference estimator "
            f"read {round(fps, 1)} — its dispatch-constant jitter "
            "dominates at this program size")
    if hbm_peak and entry_fps * xla_bpf / 1e9 > hbm_peak:
        out_extra["bandwidth_note"] = (
            "implied GB/s from the XLA cost-analysis bytes exceeds the "
            "HBM roof — physically impossible as HBM traffic, so the "
            "cost-analysis byte count overcounts cache/VMEM-served "
            "re-reads (per-grid-step weight blocks, multi-consumer "
            "operands) at this program size; measured_gbps_model (the "
            "minimal-traffic lower-bound model) is the defensible HBM "
            "figure")
    fps = entry_fps
    return {
        "config": label,
        "frames": frames,
        "frames_per_s": round(fps, 1),
        **({"frames_per_s_wall_estimator": round(frames / dt, 1)}
           if fps_dev and fps is fps_dev else {}),
        **out_extra,
        "model_bytes_per_frame": round(model_bpf, 1),
        "xla_bytes_per_frame": round(xla_bpf, 1),
        "xla_vs_model_ratio": round(xla_bpf / model_bpf, 3),
        "xla_flops_per_frame": round(xla_flops / frames, 1),
        "measured_gbps_xla": round(fps * xla_bpf / 1e9, 1),
        "measured_gbps_model": round(fps * model_bpf / 1e9, 1),
        "hbm_peak_gbps": hbm_peak,
        "hbm_pct_xla": (round(100 * fps * xla_bpf / 1e9 / hbm_peak, 1)
                        if hbm_peak else None),
        "mfu_pct_xla": (round(100 * fps * xla_flops / frames / peak, 2)
                        if peak else None),
        "device_us_per_iteration": round(dev_us, 1) if dev_us else None,
        "wall_us_per_iteration": round(dt * 1e6, 1),
        "top_fusions": top,
    }


def run_roofline(quick: bool = False) -> dict:
    """MEASURED roofline of the BASELINE configs (VERDICT r3 item 2 +
    r4 item 7 — configs 3/5 alongside the production config 4).

    Complements the analytic ``chain_bytes_per_frame`` lower-bound model
    with two measurements of the exact production programs:

      * XLA's own compiler cost analysis (``Compiled.cost_analysis()``) —
        the per-op operand+output bytes the compiled HLO actually touches,
        summed over the module. This is the compiler's HBM-traffic
        accounting of the real fusion structure, not a hand model.
      * a ``jax.profiler`` device trace of the repeated program — the
        per-fusion device-time breakdown ("XLA Ops" lane), i.e. where the
        chip time measurably goes, with each hot fusion's HLO definition
        attached for identification.

    Writes ROOFLINE_r05.json and returns the artifact dict.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fmcw_radar_processing_tpu.config import (
        AlgorithmConfig,
        RadarConfig,
        default_device_config,
    )
    from fmcw_radar_processing_tpu.io.synth import (
        SyntheticTarget,
        synthesize_recording,
    )

    nfft = 256
    cfg = RadarConfig.create(default_device_config(),
                             AlgorithmConfig.production())
    f_big = 4096 if quick else 65536
    rec = synthesize_recording(
        cfg, f_big,
        (SyntheticTarget(range_m=7.5, doppler_bin_offset=3,
                         md_phase_rad=1.0, md_rate_hz=40.0),
         SyntheticTarget(range_m=16.9, doppler_bin_offset=-2,
                         amplitude=2.5)),
        seed=0,
    )
    raw = np.asarray(rec.rx1_pair()).reshape(f_big, cfg.pn, -1)
    calib = rec.calib_pair(0, cfg.nts)
    full = _make_full(cfg, "auto", nfft)

    entries = {}
    # --- config 4: production batched replay (the r4 entry) ---
    entries["4_batched_replay"] = _roofline_entry(
        cfg, full, (jnp.asarray(raw), jnp.asarray(calib)), f_big, nfft,
        "4_batched_replay production default")

    # --- config 3: multi-frame STFT at the BASELINE's 4096 frames ---
    f_mid = min(4096, f_big)
    entries["3_multi_frame_stft"] = _roofline_entry(
        cfg, full, (jnp.asarray(raw[:f_mid]), jnp.asarray(calib)), f_mid,
        nfft, "3_multi_frame_stft production profile")

    # --- config 5: streaming 8-channel steady state ---
    from fmcw_radar_processing_tpu.pipeline.streaming import (
        StreamingProcessor,
    )

    c, wf = 8, 256
    sp = StreamingProcessor(cfg, channels=c, window_frames=wf, nfft=nfft)
    raw_c = jax.device_put(
        np.broadcast_to(raw[:wf].reshape(wf, cfg.pn, -1),
                        (c, wf, cfg.pn, 2 * cfg.nts)).copy())
    calib_c = jax.device_put(np.broadcast_to(calib, (c, cfg.nts, 2)).copy())
    step = jax.jit(sp._step)
    sargs = (raw_c, calib_c, sp._carry, sp._carry_len, sp._max_power)
    sbytes, sflops = _xla_cost(step.lower(*sargs).compile())
    import statistics

    stream_trials = 5
    dt_win = statistics.median(
        _bench_streaming_steady(sp, raw_c, calib_c)
        for _ in range(stream_trials)
    )
    frames_win = c * wf
    fps5 = frames_win / dt_win
    model_bpf5 = chain_bytes_per_frame(cfg, nfft, with_rescale=False)
    hbm_peak = chip_peak_hbm_gbps()
    peak = chip_peak_flops()
    extra5 = {}
    if hbm_peak and fps5 * sbytes / frames_win / 1e9 > hbm_peak:
        extra5["bandwidth_note"] = (
            "implied GB/s from the XLA cost-analysis bytes exceeds the "
            "HBM roof — the _step cost analysis overcounts cache-served "
            "re-reads and multi-consumer operands at this window size; "
            "measured_gbps_model (minimal-traffic lower bound) is the "
            "defensible HBM figure")
    entries["5_streaming_8ch"] = {
        **extra5,
        "config": "5_streaming_8ch steady state",
        "channels": c, "window_frames": wf,
        "frames_per_s": round(fps5, 1),
        "window_latency_us": round(dt_win * 1e6, 1),
        "model_bytes_per_frame": round(model_bpf5, 1),
        "xla_bytes_per_frame": round(sbytes / frames_win, 1),
        "xla_vs_model_ratio": round(sbytes / frames_win / model_bpf5, 3),
        "xla_flops_per_frame": round(sflops / frames_win, 1),
        "measured_gbps_xla": round(fps5 * sbytes / frames_win / 1e9, 1),
        "measured_gbps_model": round(fps5 * model_bpf5 / 1e9, 1),
        "hbm_peak_gbps": hbm_peak,
        "hbm_pct_xla": (round(100 * fps5 * sbytes / frames_win / 1e9
                              / hbm_peak, 1) if hbm_peak else None),
        "mfu_pct_xla": (round(100 * fps5 * sflops / frames_win / peak, 2)
                        if peak else None),
        "note": ("bytes/flops from the single-window _step program's XLA "
                 "cost analysis; throughput from the two-large-endpoint "
                 "carry-threaded difference estimator (median of "
                 f"{stream_trials})"),
    }

    artifact = {
        "device_kind": jax.devices()[0].device_kind,
        "configs": entries,
        "methodology": (
            "xla_bytes = Compiled.cost_analysis()['bytes accessed'] of the "
            "single-iteration program (compiler accounting of per-op "
            "operand+output traffic; for Pallas custom calls XLA reports "
            "the kernel's DECLARED CostEstimate, which this repo computes "
            "from the real block shapes and store dtypes); top_fusions "
            "from a jax.profiler device trace of the 8x-repeated program "
            "over 3 dispatches (XLA Ops lane, per-fusion device "
            "microseconds — fully measured); throughput via the matrix's "
            "steady-state on-device repetition"
        ),
    }
    with open("ROOFLINE_r05.json", "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))
    return artifact


def main_matrix(quick: bool) -> int:
    rows = run_matrix(quick=quick)
    with open("BENCH_MATRIX.json", "w") as f:
        json.dump(rows, f, indent=2)
    print(f"wrote BENCH_MATRIX.json ({len(rows) - 1} rows)")
    return 0


def main():
    import numpy as np

    from fmcw_radar_processing_tpu.config import (
        AlgorithmConfig,
        RadarConfig,
        default_device_config,
    )
    from fmcw_radar_processing_tpu.io.synth import (
        SyntheticTarget,
        synthesize_recording,
    )

    nfft = 256
    # The promoted production profile (see AlgorithmConfig.production for
    # the recorded criterion): pallas_profile_high chain via impl 'auto'
    # + fused export with kernel-emitted bf16 intensity.
    alg = AlgorithmConfig.production()
    cfg = RadarConfig.create(default_device_config(), alg)

    # 65536 frames ≈ 2.7 h of radar time at 150 ms/frame — a production-size
    # recording; large enough that the fixed per-dispatch host↔device latency
    # (~25 ms through the tunneled runtime) stops dominating the metric.
    frames_tpu = 65536
    rec = synthesize_recording(
        cfg,
        frames_tpu,
        (
            SyntheticTarget(range_m=7.5, doppler_bin_offset=3,
                            md_phase_rad=1.0, md_rate_hz=40.0),
            SyntheticTarget(range_m=16.9, doppler_bin_offset=-2, amplitude=2.5),
        ),
        seed=0,
    )
    raw = rec.rx1_pair()  # [F, PN, NTS, 2]
    calib = rec.calib_pair(0, cfg.nts)

    fps_tpu = bench_tpu(cfg, raw, calib, nfft=nfft)

    # CPU oracle on a subset, extrapolated linearly (the oracle is a serial
    # per-frame loop; its cost is linear in frames).
    f_cpu = 256
    raw_matlab = np.swapaxes(rec.rx1()[:f_cpu], -1, -2)  # (F, NTS, PN)
    fps_cpu = bench_cpu_oracle(cfg, raw_matlab, rec.calib_vector(0, cfg.nts), nfft)

    print(
        json.dumps(
            {
                "metric": "IQ frames/sec/chip (range-FFT+Doppler+STFT chain)",
                "value": round(fps_tpu, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps_tpu / fps_cpu, 2),
            }
        )
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--matrix", action="store_true",
                    help="run the full benchmark matrix -> BENCH_MATRIX.json")
    ap.add_argument("--roofline", action="store_true",
                    help="measured roofline of configs 3/4/5 (XLA bytes + "
                         "profiler trace) -> ROOFLINE_r05.json")
    ap.add_argument("--quick", action="store_true",
                    help="smaller sizes (CI smoke)")
    args = ap.parse_args()
    if args.roofline:
        run_roofline(args.quick)
        sys.exit(0)
    sys.exit(main_matrix(args.quick) if args.matrix else main())
