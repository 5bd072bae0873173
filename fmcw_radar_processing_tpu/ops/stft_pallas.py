"""Pallas TPU kernels: fused STFT → PSD → dB → log-frequency rescale.

The XLA spectrogram path (dsp/stft.py) materializes, per STFT column:
the [W, T] sliding frame matrix (w+r), the stacked [2nb, T] matmul result
(w+r), the [nb, T] PSD→dB map (w + 2r), and the [1024, T] intensity
(w) — at hop 1 that is the second-largest traffic block of the whole
chain (radar_processing.m:270-299). These kernels collapse it to the
information minimum:

  phase 1  ``_psd_kernel``  — frame-matrix tile (XLA's im2col; small, and
     Mosaic's compiler crashes on the in-kernel lane-shifted concat) →
     one MXU matmul against the magnitude-folded DFT operator → one-sided
     PSD written ONCE, plus a per-tile max (for the reference's
     global-max dB normalization, radar_processing.m:282).  The [2nb, T]
     complex matmul parts never exist in HBM.  The PSD scaling and
     one-sided doubling are folded into the operator rows as
     √(scale·dbl_k) — (c·s_re)² + (c·s_im)² = c²·(s_re²+s_im²) — so the
     epilogue is a pure square-add.
  phase 2  ``_db_rescale_kernel`` — PSD tile → dB (20·log10(p/gmax),
     G>0 guard, −1000 floor) in VMEM → dense log-grid interpolation as an
     explicit 3-dot bf16x3 split (HIGH-equivalent; Mosaic has no HIGH
     dot) → dB map + intensity, each written once.

Between the phases a single tiny XLA reduction turns the per-tile maxes
into the global max — the one cross-column dependency of the dB
normalization.

Numerics match dsp/stft.py's operators: phase-1's matmul runs at HIGHEST
(true f32) precision; phase-2's interpolation at HIGH (≤ 2^-21 relative,
i.e. ≤ 5e-4 dB even at the −1000 dB floor).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fmcw_radar_processing_tpu.dsp.stft import (
    DB_FLOOR,
    INT8_DB_RANGE,
    StftOperator,
    _log_interp_matrix,
)

LN10_INV_20 = float(20.0 / np.log(10.0))


def resolves_tiled(op: StftOperator, tiled: bool | None = None) -> bool:
    """Whether ``spectrogram_pallas`` will take the bin-blocked (tiled)
    kernel pair for this operator — the HIGHEST-only path, so callers that
    plumb a lossy ``psd_precision``/``recompute`` knob (pipeline, bench)
    consult this to downgrade instead of tripping the explicit-conflict
    ValueError."""
    if tiled is not None:
        return tiled
    return -(-op.num_bins // 8) * 8 > 512


def _emit_intensity(int_ref, acc):
    """Write the interpolated intensity tile in the output dtype.

    int8: affine dB quantization over INT8_DB_RANGE in the kernel epilogue
    (step ≈ 0.165 dB ⇒ ≤ 0.083 dB round-to-nearest error in-range — inside
    the ≤ 0.15 dB display-band criterion; out-of-range clamps touch only
    sub-display bins). Quartering the chain's largest store matters because
    the phase-2 kernel is output-bandwidth-bound (ROOFLINE_r04: 5.55 ms of
    13.39 ms/iter). Other dtypes: plain cast (bf16 emission measured +25%
    over casting the f32 artifact afterwards)."""
    if int_ref.dtype == jnp.int8:
        lo, hi = INT8_DB_RANGE
        q = jnp.clip(jnp.round((acc - jnp.float32(lo))
                               * jnp.float32(255.0 / (hi - lo))), 0.0, 255.0)
        int_ref[:] = (q - 128.0).astype(jnp.int8)
    else:
        int_ref[:] = acc.astype(int_ref.dtype)


def _folded_operator(op: StftOperator, align: int = 8) -> np.ndarray:
    """[2·nb_pad, W] stacked re/im DFT operator with √(scale·dbl) folded
    into each row pair, zero-padded so nb_pad is a multiple of ``align``.

    align 8 (sublane granularity) for the untiled kernels — the PSD/dB
    stores then carry only 7-row padding instead of the r3 128-alignment's
    127 rows, which at nfft 256 wasted ~2× the [nb, T] write+read traffic
    (the phase-2 CONTRACTION never needed it: since the Nyquist peel its K
    is k_main = nb−1, a power of two). align 128 for the tiled kernels,
    whose kb=128 bin blocks must divide nb_pad."""
    nb = op.num_bins
    dbl = np.full(nb, 2.0, np.float32)
    dbl[0] = 1.0
    if op.nfft % 2 == 0:
        dbl[-1] = 1.0
    c = np.sqrt(op.scale * dbl).astype(np.float32)[:, None]
    nb_pad = -(-nb // align) * align
    a2 = np.zeros((2 * nb_pad, op.window_length), np.float32)
    a2[:nb] = op.a_re * c
    a2[nb_pad : nb_pad + nb] = op.a_im * c
    return a2


def _psd_kernel(fr_ref, op_ref, nv_ref, p_ref, tmax_ref, *,
                tile: int, nb_pad: int):
    i = pl.program_id(0)
    # frames [W, tile] arrive from XLA's im2col (20 cheap strided slices;
    # Mosaic's compiler rejects/crashes on the in-kernel lane-shifted
    # concat, and the frame matrix is a minor traffic term — the point of
    # this kernel is that the [2nb, T] complex matmul parts never reach
    # HBM).
    s2 = jnp.dot(op_ref[:], fr_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)  # [2·nb_pad, tile]
    p = s2[:nb_pad] ** 2 + s2[nb_pad:] ** 2  # scaling folded into op rows
    # Zero columns past the valid count (fixed-capacity masking).
    col = i * tile + jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    p = jnp.where(col < nv_ref[0], p, 0.0)
    # bf16 PSD store option: the [nb_pad, T] PSD round-trip between the
    # phases is pure inter-kernel traffic on a bandwidth-bound chain;
    # bf16 halves it at ~2^-9 relative ⇒ ≤ 20·log10(1+2^-9) ≈ 0.017 dB
    # through the dB map. tmax is the max of the QUANTIZED values — the
    # same numbers phase 2 will read — so stored_p/gmax ≤ 1 holds and the
    # global max still maps to exactly 0 dB (a pre-cast f32 max could sit
    # below an up-rounded stored bin and push the dB map slightly
    # positive; ADVICE r5).
    pq = p.astype(p_ref.dtype)
    p_ref[:] = pq
    # Whole tmax array is SMEM-mapped every step; write this tile's slot.
    tmax_ref[i] = jnp.max(pq.astype(jnp.float32))


def _psd_kernel_b3(fr_ref, ophi_ref, oplo_ref, nv_ref, p_ref, tmax_ref, *,
                   tile: int, nb_pad: int):
    """Phase 1 at bf16x3 (3 MXU passes, ~2^-18 relative) instead of
    HIGHEST's 6. The PSD perturbation shifts the dB map by ≤ ~1e-5 dB in
    the display band (p and gmax move together; deep nulls absorb the
    absolute noise) — measured display-band err vs the f64 oracle is
    recorded in BENCH_MATRIX. The K=20 dot is pass-bound like the
    fast-time kernel (ROOFLINE_r04), so this halves phase 1's dot time."""
    i = pl.program_id(0)
    fr = fr_ref[:]
    fr_hi = fr.astype(jnp.bfloat16).astype(jnp.float32)
    fr_lo = fr - fr_hi
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
    ophi = ophi_ref[:]
    s2 = d(ophi, fr_hi) + d(ophi, fr_lo) + d(oplo_ref[:], fr_hi)
    p = s2[:nb_pad] ** 2 + s2[nb_pad:] ** 2
    col = i * tile + jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    p = jnp.where(col < nv_ref[0], p, 0.0)
    pq = p.astype(p_ref.dtype)  # see _psd_kernel's bf16-store note
    p_ref[:] = pq
    tmax_ref[i] = jnp.max(pq.astype(jnp.float32))


def _tmax_kernel(fr_ref, op_ref, nv_ref, tmax_ref, *, tile: int,
                 nb_pad: int):
    """Phase 1 of the recompute formulation: per-tile PSD max ONLY.

    The PSD itself is recomputed by phase 2 from the same frame tile
    (recompute-over-materialize): the [nb_pad, T] PSD round-trip was
    1.14 GB of the export stage's traffic per 65k-frame replay while the
    DFT matmul that regenerates it is cheap MXU work on a chain measured
    bandwidth-bound (ROOFLINE_r04). Only the 4-byte-per-tile max — the one
    cross-column dependency of the dB normalization — leaves the kernel.
    """
    i = pl.program_id(0)
    s2 = jnp.dot(op_ref[:], fr_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    p = s2[:nb_pad] ** 2 + s2[nb_pad:] ** 2
    col = i * tile + jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    p = jnp.where(col < nv_ref[0], p, 0.0)
    tmax_ref[i] = jnp.max(p)


def _db_rescale_recompute_kernel(fr_ref, gmax_ref, nv_ref, op_ref, whi_ref,
                                 wlo_ref, wnyq_ref, db_ref, int_ref, *,
                                 k_main: int, nb_pad: int, tile2: int):
    """Phase 2 of the recompute formulation: frames → PSD (recomputed,
    bit-identical to phase 1's — same dot, same operands) → dB →
    bf16x3 interpolation. Reads the [W, tile2] frame tile instead of the
    [nb_pad, tile2] PSD tile (20 vs 136 rows) and phase 1 never writes
    the PSD at all."""
    i = pl.program_id(0)
    s2 = jnp.dot(op_ref[:], fr_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    p = s2[:nb_pad] ** 2 + s2[nb_pad:] ** 2
    col = i * tile2 + jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    p = jnp.where(col < nv_ref[0], p, 0.0)
    g = gmax_ref[0]
    safe = jnp.where(g > 0, g, 1.0)
    db = jnp.where(
        p > 0,
        jnp.maximum(
            jnp.float32(LN10_INV_20)
            * jnp.log(jnp.maximum(p, 1e-45) / safe),
            jnp.float32(DB_FLOOR),
        ),
        jnp.float32(DB_FLOOR),
    )
    db_ref[:] = db
    dbm = db[:k_main]
    db_hi = dbm.astype(jnp.bfloat16).astype(jnp.float32)
    db_lo = dbm - db_hi
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
    acc = (d(whi_ref[:], db_hi) + d(whi_ref[:], db_lo)
           + d(wlo_ref[:], db_hi)
           + wnyq_ref[:] * db[k_main : k_main + 1, :])
    _emit_intensity(int_ref, acc)


def _psd_kernel_tiled(fr_ref, are_ref, aim_ref, nv_ref, p_ref, tmax_ref, *,
                      tile: int, n_kb: int):
    """Bin-blocked phase 1 (large nfft): grid (time tile i, bin block k).

    The folded operator's re/im planes arrive as separate [kb, W] blocks,
    so no weight plane ever needs to be VMEM-resident whole — this is what
    lifts the untiled kernel's nfft ≤ 512 VMEM gate (the [2·nb_pad, W]
    operator block grows linearly with nfft). The frame tile is re-read per
    bin block (W·tile·4·n_kb bytes — small against the PSD write)."""
    i = pl.program_id(0)
    k = pl.program_id(1)
    fr = fr_ref[:]
    s_re = jnp.dot(are_ref[:], fr, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    s_im = jnp.dot(aim_ref[:], fr, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    p = s_re**2 + s_im**2  # [kb, tile]; scaling folded into operator rows
    col = i * tile + jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    p = jnp.where(col < nv_ref[0], p, 0.0)
    p_ref[:] = p
    tmax_ref[i * n_kb + k] = jnp.max(p)


def _db_rescale_kernel_tiled(p_ref, gmax_ref, whi_ref, wlo_ref,
                             db_ref, int_ref, acc_ref, *, n_kb: int):
    """Bin-blocked phase 2: K-loop accumulation over bin blocks.

    Grid is (time tile i, bin block k) with k innermost; the [num_bins, kb]
    weight blocks stream through VMEM instead of the whole [1024, nb]
    halves, and the interpolation accumulates into an f32 VMEM scratch
    emitted (with the dtype cast) on the last bin block. The Nyquist column
    rides the bf16x3 contraction here (zero-padded weights keep the lane-
    aligned K) instead of the untiled kernel's exact f32 rank-1 peel — both
    are ≤ 2^-21 relative, i.e. HIGH-equivalent."""
    k = pl.program_id(1)
    p = p_ref[:]  # [kb, tile2]
    g = gmax_ref[0]
    safe = jnp.where(g > 0, g, 1.0)
    db = jnp.where(
        p > 0,
        jnp.maximum(
            jnp.float32(LN10_INV_20)
            * jnp.log(jnp.maximum(p, 1e-45) / safe),
            jnp.float32(DB_FLOOR),
        ),
        jnp.float32(DB_FLOOR),
    )
    db_ref[:] = db
    db_hi = db.astype(jnp.bfloat16).astype(jnp.float32)
    db_lo = db - db_hi
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
    part = d(whi_ref[:], db_hi) + d(whi_ref[:], db_lo) + d(wlo_ref[:], db_hi)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = part

    @pl.when(k > 0)
    def _accum():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(k == n_kb - 1)
    def _emit():
        _emit_intensity(int_ref, acc_ref[:])


def _db_rescale_kernel(p_ref, gmax_ref, whi_ref, wlo_ref, wnyq_ref,
                       db_ref, int_ref, *, k_main: int):
    # f32 no-op cast, or the bf16-PSD-store option's widening load.
    p = p_ref[:].astype(jnp.float32)  # [nb_pad, tile]
    g = gmax_ref[0]
    safe = jnp.where(g > 0, g, 1.0)
    db = jnp.where(
        p > 0,
        jnp.maximum(
            jnp.float32(LN10_INV_20)
            * jnp.log(jnp.maximum(p, 1e-45) / safe),
            jnp.float32(DB_FLOOR),
        ),
        jnp.float32(DB_FLOOR),
    )
    # bf16 dB store option: the dB map is written once and consumed by
    # the host (PNG/payloads); bf16 quantization is ≤ 0.125 dB at the
    # clim edge (|−40| has ulp 0.25) — below one 8-bit color step of the
    # reference PNG's 40 dB range — and DB_FLOOR (−1000) is exactly
    # bf16-representable, so floor equality survives. Interpolation below
    # keeps consuming the f32 value.
    db_ref[:] = db.astype(db_ref.dtype)
    # 3-pass bf16x3 interpolation (Mosaic has no HIGH-precision dot):
    # W = W_hi + W_lo split on the host (W_hi exactly bf16-representable,
    # so DEFAULT's operand quantization is lossless on it); db split here.
    # dot(W_lo, db_lo) ~ 2^-42 relative — dropped, exactly like HIGH.
    # The contraction runs over the first k_main = nb−1 bins (a power of
    # two — lane-aligned K, half the MXU passes of nb); the Nyquist bin's
    # column is added as an exact rank-1 VPU outer product in f32.
    dbm = db[:k_main]
    db_hi = dbm.astype(jnp.bfloat16).astype(jnp.float32)
    db_lo = dbm - db_hi
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
    acc = (d(whi_ref[:], db_hi) + d(whi_ref[:], db_lo)
           + d(wlo_ref[:], db_hi)
           + wnyq_ref[:] * db[k_main : k_main + 1, :])
    _emit_intensity(int_ref, acc)


def spectrogram_pallas(
    sig: jax.Array, valid_len: jax.Array, op: StftOperator,
    num_bins: int = 1024, tile: int = 2048, tile2: int | None = None,
    intensity_dtype=jnp.float32, interpret: bool | None = None,
    tiled: bool | None = None, recompute: bool = False,
    psd_precision: str | None = None, psd_store_dtype=jnp.float32,
    db_store_dtype=jnp.float32,
):
    """Full spectrogram export from a packed |slow-time| signal.

    sig: [L] float32 magnitude signal (zeros past ``valid_len``);
    valid_len: scalar int32 count of valid samples.
    Returns (psd [nb, T], db [nb, T], intensity [num_bins, T]) with
    T = L − W + 1 columns; columns ≥ valid_len − W + 1 are zero (psd) /
    DB_FLOOR (db) / ≈DB_FLOOR (intensity: the floor column through the
    interpolation, row sums ≈ 1 — identical to the XLA path), matching
    dsp/stft.py's operator + psd_db + log_frequency_rescale composition
    up to matmul pass ordering and the folded-scaling rounding.

    hop is fixed at 1 (the reference's setting — the only hop where this
    fusion matters; other hops go through the XLA operator).

    tiled: None (default) picks the bin-blocked kernel pair when
    nb_pad > 512 — the untiled kernels' whole-operator/whole-weight VMEM
    residency overflows the 16 MB scoped limit past nfft 512 (measured
    compile OOM at nfft 2048), while the tiled pair streams [kb, ·] blocks
    and runs any nfft, including the reference's literal
    2^nextpow2(L) fidelity mode (radar_processing.m:273).

    recompute: True selects the RECOMPUTE formulation (untiled path
    only) — phase 1 emits only per-tile maxes and phase 2 regenerates the
    PSD from the frame tile (bit-identical dot), so the [nb_pad, T] PSD
    never exists in HBM and the psd return slot is None. MEASURED NEGATIVE
    RESULT on the v5e, hence not the default: the saved 1.14 GB round-trip
    (~1.4 ms) is outweighed by re-doing the K=20 DFT dot, whose MXU
    K-padding makes it ~1.7 ms at HIGHEST — headline 4.12M vs 4.50M
    frames/s. Kept (with its bit-parity test) for chips where the
    MXU-rate/HBM balance differs.

    psd_precision: phase-1 DFT dot passes — "highest" (the default; true
    f32, 6 passes — oracle-grade PSD) or "high" (bf16x3 = 3 MXU passes,
    ~2^-18 relative on the PSD; the dB shift is ≤ µdB in the display band
    since p and gmax move together — the AlgorithmConfig.production()
    setting, measured +8%). Untiled materializing path only: the tiled
    and recompute formulations run phase 1 at HIGHEST, and explicitly
    requesting "high" on them raises ValueError rather than silently
    ignoring the argument (callers that plumb a config knob should
    consult :func:`resolves_tiled` and downgrade). The config-level knob
    is ``AlgorithmConfig.stft_psd_precision`` — the bare fidelity config
    stays "highest" so reference-literal serve paths never inherit the
    lossy kernel.

    psd_store_dtype: dtype of the materialized [nb_pad, T] PSD (the
    inter-phase round-trip — pure traffic on a bandwidth-bound chain).
    bfloat16 halves it at ~2^-9 relative, ≤ ~0.017 dB through the dB map
    (p and gmax quantize together); the psd return value is then bf16.
    Untiled materializing path only; config knob
    ``AlgorithmConfig.stft_psd_store``.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if op.hop != 1:
        raise ValueError("spectrogram_pallas supports hop=1 only")
    wl = op.window_length
    nb = op.num_bins
    # Storage alignment: 8-row sublane multiples (16 when the PSD is
    # stored bf16 — 2-byte dtypes tile at (16, 128)). The r3 kernels
    # padded to 128 ("the contraction runs over this axis") — but since
    # the Nyquist peel the phase-2 contraction K is k_main = nb−1 (a power
    # of two), so only sublane granularity is required of the STORES, and
    # the 128-pad was writing 256 PSD/dB rows where 129 are real: measured
    # ~2 GB of pure padding traffic per 65536-frame replay at nfft 256.
    # The tiled path keeps 128 (its kb-blocks must divide nb_pad).
    store_bf16 = jnp.dtype(psd_store_dtype) == jnp.dtype(jnp.bfloat16)
    db_bf16 = jnp.dtype(db_store_dtype) == jnp.dtype(jnp.bfloat16)
    align = 16 if (store_bf16 or db_bf16) else 8
    nb_pad = -(-nb // align) * align
    l = sig.shape[0]
    t = l - wl + 1
    if t <= 0:
        raise ValueError(f"signal shorter than one window ({l} < {wl})")
    n_tiles = -(-t // tile)
    t_pad = n_tiles * tile
    # XLA-side im2col, padded to the tile grid: [W, t_pad].
    sig_pad = jnp.zeros(t_pad + wl - 1, sig.dtype).at[:l].set(sig)
    frames = op.frame_signal(sig_pad)  # [W, t_pad]
    nv = (jnp.asarray(valid_len, jnp.int32) - wl + 1).reshape(1)
    if psd_precision not in (None, "high", "highest"):
        raise ValueError(f"psd_precision must be 'high' or 'highest', "
                         f"got {psd_precision!r}")
    if tiled is None:
        tiled = nb_pad > 512
    if tile2 is None:
        # Adaptive phase-2 tile: 1024 halves the grid-step count and
        # measured −8.7% on the export stage (8.24 → 7.52 ms per 1M
        # columns at the production dtypes) — but its double-buffered
        # blocks only fit the 16 MB scoped-VMEM limit when the per-column
        # output stores are narrow (all-f32 measured a compile-time OOM
        # at 17.96 MB). Rule: 1024 when p-read + db-write + intensity-
        # write ≤ 8 B per element (e.g. f32 PSD + bf16 dB + bf16/int8
        # intensity — the production profile), else the safe 512. The
        # bin-blocked tiled path keeps 512 (its f32 scratch accumulator
        # is [num_bins, tile2] and nfft-independent VMEM is its point).
        out_b = (jnp.dtype(intensity_dtype).itemsize
                 + jnp.dtype(db_store_dtype).itemsize
                 + jnp.dtype(psd_store_dtype).itemsize)
        tile2 = 1024 if (not tiled and out_b <= 8
                         and tile % 1024 == 0) else 512
    if tile % tile2:
        # Phase 2's grid is t_pad // tile2; a non-divisor tile2 would leave
        # trailing columns unwritten (uninitialized memory) silently.
        raise ValueError(f"tile ({tile}) must be a multiple of tile2 ({tile2})")
    if (store_bf16 or db_bf16) and (tiled or recompute):
        raise ValueError(
            "psd_store_dtype/db_store_dtype=bfloat16 apply to the untiled "
            "materializing path only (the tiled path streams f32 bin "
            "blocks; recompute never stores the PSD)")
    if tiled:
        # The bin-blocked path is HIGHEST-only and always materializes the
        # PSD; silently ignoring an explicit conflicting request would hand
        # callers behavior contradicting their arguments (ADVICE r4).
        if recompute:
            raise ValueError(
                "recompute=True is the untiled formulation; the tiled "
                "(large-nfft) path always materializes the PSD — drop "
                "recompute or pass tiled=False with a smaller nfft")
        if psd_precision == "high":
            raise ValueError(
                "psd_precision='high' applies to the untiled materializing "
                "path only; the tiled path runs phase 1 at HIGHEST (use "
                "resolves_tiled() to downgrade a plumbed knob)")
        return _spectrogram_tiled(
            frames, nv, op, nb, -(-nb // 128) * 128, num_bins, tile, tile2,
            n_tiles, t_pad, t, intensity_dtype, interpret,
        )
    a2 = jnp.asarray(_folded_operator(op, align=align))  # [2·nb_pad, W]
    if recompute:
        if psd_precision == "high":
            raise ValueError(
                "psd_precision='high' is not available with recompute=True "
                "(both phases re-run the DFT dot at HIGHEST for bit-parity)")
        return _spectrogram_recompute(
            frames, nv, a2, op, nb, nb_pad, num_bins, tile, tile2,
            n_tiles, t_pad, t, intensity_dtype, interpret,
        )

    if psd_precision == "high":
        a2_np = _folded_operator(op, align=align)
        a2_hi = a2_np.astype(jnp.bfloat16).astype(np.float32)
        a2_lo = (a2_np - a2_hi).astype(np.float32)
        op_spec = pl.BlockSpec((2 * nb_pad, wl), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
        p_pad, tmax = pl.pallas_call(
            functools.partial(_psd_kernel_b3, tile=tile, nb_pad=nb_pad),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((wl, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                op_spec,
                op_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((nb_pad, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_tiles,), lambda i: (0,),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nb_pad, t_pad), psd_store_dtype),
                jax.ShapeDtypeStruct((n_tiles,), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=3 * 2 * t_pad * 2 * nb_pad * wl,
                bytes_accessed=(4 * wl * t_pad
                                + jnp.dtype(psd_store_dtype).itemsize
                                * nb_pad * t_pad),
                transcendentals=0,
            ),
            interpret=interpret,
        )(frames, jnp.asarray(a2_hi), jnp.asarray(a2_lo), nv)
        return _phase2_untiled(p_pad, tmax, op, nb, nb_pad, num_bins,
                               tile2, t_pad, t, intensity_dtype, interpret,
                               db_store_dtype)
    p_pad, tmax = pl.pallas_call(
        functools.partial(_psd_kernel, tile=tile, nb_pad=nb_pad),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((wl, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * nb_pad, wl), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb_pad, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb_pad, t_pad), psd_store_dtype),
            jax.ShapeDtypeStruct((n_tiles,), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * 2 * nb_pad * wl,
            # frames block is (wl, tile) per grid step — 4·wl·t_pad, like
            # the bf16x3 variant (a 4·t_pad typo here understated HIGHEST
            # rows' phase-1 traffic ~12% in the roofline; ADVICE r5).
            bytes_accessed=(4 * wl * t_pad
                            + jnp.dtype(psd_store_dtype).itemsize
                            * nb_pad * t_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(frames, a2, nv)
    return _phase2_untiled(p_pad, tmax, op, nb, nb_pad, num_bins,
                           tile2, t_pad, t, intensity_dtype, interpret,
                           db_store_dtype)


def _phase2_untiled(p_pad, tmax, op: StftOperator, nb: int, nb_pad: int,
                    num_bins: int, tile2: int, t_pad: int, t: int,
                    intensity_dtype, interpret: bool,
                    db_store_dtype=jnp.float32):
    """Shared untiled phase 2: PSD tiles → dB + interpolated intensity."""
    gmax = jnp.max(tmax)  # the one cross-tile dependency (global-max dB)

    # Nyquist peel: contract over the first k_main = nb−1 bins (power-of-
    # two K — for nfft 256 that's K=128 instead of an MXU-padded 256, half
    # the passes) and add the Nyquist column as a rank-1 f32 correction.
    k_main = nb - 1
    w_full = _log_interp_matrix(nb, num_bins)
    w = np.ascontiguousarray(w_full[:, :k_main]).astype(np.float32)
    w_nyq = np.ascontiguousarray(w_full[:, nb - 1 : nb]).astype(np.float32)
    w_hi = w.astype(jnp.bfloat16).astype(np.float32)  # bf16-exact part
    w_lo = (w - w_hi).astype(np.float32)
    # Phase 2 uses a smaller tile: its double-buffered blocks (p in, db
    # out, [1024, tile] intensity out, two weight halves) must fit the
    # 16 MB scoped-VMEM limit (tile 2048 measured 21 MB -> compile OOM).
    n_tiles2 = t_pad // tile2
    db_pad, intensity = pl.pallas_call(
        functools.partial(_db_rescale_kernel, k_main=k_main),
        grid=(n_tiles2,),
        in_specs=[
            pl.BlockSpec((nb_pad, tile2), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((num_bins, k_main), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_bins, k_main), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_bins, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb_pad, tile2), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_bins, tile2), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb_pad, t_pad), db_store_dtype),
            # bf16 emission happens in the kernel epilogue: casting the
            # f32 artifact afterwards would re-read and re-write the
            # chain's largest tensor (measured -25% end to end).
            jax.ShapeDtypeStruct((num_bins, t_pad), intensity_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * num_bins * k_main,
            # Real store dtypes: p read and db write at their own
            # itemsizes (2 when the bf16 store options are on), intensity
            # write in its own itemsize (2 for bf16, 1 for int8). XLA's
            # cost analysis reports a custom call's declared estimate, so
            # this is what bench.py --roofline sums for the kernel's
            # traffic.
            bytes_accessed=((jnp.dtype(db_store_dtype).itemsize
                             + p_pad.dtype.itemsize) * nb_pad * t_pad
                            + jnp.dtype(intensity_dtype).itemsize
                            * num_bins * t_pad),
            transcendentals=nb_pad * t_pad,  # log
        ),
        interpret=interpret,
    )(p_pad, gmax.reshape(1), jnp.asarray(w_hi), jnp.asarray(w_lo),
      jnp.asarray(w_nyq))

    return (p_pad[:nb, :t], db_pad[:nb, :t], intensity[:, :t])


def _spectrogram_recompute(
    frames, nv, a2, op: StftOperator, nb: int, nb_pad: int, num_bins: int,
    tile: int, tile2: int, n_tiles: int, t_pad: int, t: int,
    intensity_dtype, interpret: bool,
):
    """Recompute formulation (see spectrogram_pallas recompute=True)."""
    wl = op.window_length
    tmax = pl.pallas_call(
        functools.partial(_tmax_kernel, tile=tile, nb_pad=nb_pad),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((wl, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * nb_pad, wl), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((n_tiles,), lambda i: (0,),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles,), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * 2 * nb_pad * wl,
            bytes_accessed=4 * (wl * t_pad + n_tiles),
            transcendentals=0,
        ),
        interpret=interpret,
    )(frames, a2, nv)

    gmax = jnp.max(tmax)

    k_main = nb - 1
    w_full = _log_interp_matrix(nb, num_bins)
    w = np.ascontiguousarray(w_full[:, :k_main]).astype(np.float32)
    w_nyq = np.ascontiguousarray(w_full[:, nb - 1 : nb]).astype(np.float32)
    w_hi = w.astype(jnp.bfloat16).astype(np.float32)
    w_lo = (w - w_hi).astype(np.float32)
    n_tiles2 = t_pad // tile2
    db_pad, intensity = pl.pallas_call(
        functools.partial(_db_rescale_recompute_kernel, k_main=k_main,
                          nb_pad=nb_pad, tile2=tile2),
        grid=(n_tiles2,),
        in_specs=[
            pl.BlockSpec((wl, tile2), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2 * nb_pad, wl), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_bins, k_main), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_bins, k_main), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_bins, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb_pad, tile2), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_bins, tile2), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb_pad, t_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_bins, t_pad), intensity_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * (2 * nb_pad * wl + num_bins * k_main),
            bytes_accessed=(4 * (wl * t_pad + nb_pad * t_pad)
                            + jnp.dtype(intensity_dtype).itemsize
                            * num_bins * t_pad),
            transcendentals=nb_pad * t_pad,
        ),
        interpret=interpret,
    )(frames, gmax.reshape(1), nv, a2, jnp.asarray(w_hi),
      jnp.asarray(w_lo), jnp.asarray(w_nyq))

    return (None, db_pad[:nb, :t], intensity[:, :t])


def _spectrogram_tiled(
    frames, nv, op: StftOperator, nb: int, nb_pad: int, num_bins: int,
    tile: int, tile2: int, n_tiles: int, t_pad: int, t: int,
    intensity_dtype, interpret: bool, kb: int = 128,
):
    """Bin-blocked kernel pair for large nfft (see spectrogram_pallas).

    VMEM per phase-2 step at (kb=128, tile2=512): two [1024, 128] weight
    halves (0.5 MB each, double-buffered), [128, 512] p/db blocks, the
    [1024, 512] intensity block plus its f32 scratch accumulator — ~10 MB,
    independent of nfft. Weight blocks are re-streamed once per time tile
    (2·num_bins·nb_pad·4 bytes each — for the fidelity mode's nfft 16384
    that is ~68 MB per tile, ≪ 1 ms of HBM per 2048 columns)."""
    wl = op.window_length
    n_kb = nb_pad // kb  # nb_pad is a 128-multiple, kb = 128 ⇒ exact
    a2 = _folded_operator(op, align=128)  # [2·nb_pad, W] host constant
    a_re, a_im = jnp.asarray(a2[:nb_pad]), jnp.asarray(a2[nb_pad:])

    p_pad, tmax = pl.pallas_call(
        functools.partial(_psd_kernel_tiled, tile=tile, n_kb=n_kb),
        grid=(n_tiles, n_kb),
        in_specs=[
            pl.BlockSpec((wl, tile), lambda i, k: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, wl), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, wl), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((kb, tile), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles * n_kb,), lambda i, k: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb_pad, t_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * n_kb,), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * 2 * nb_pad * wl,
            bytes_accessed=4 * (n_kb * wl * t_pad + nb_pad * t_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(frames, a_re, a_im, nv)

    gmax = jnp.max(tmax)

    # Zero-padded weights [num_bins, nb_pad]: columns ≥ nb are zero, so the
    # pad rows' DB_FLOOR contributes exactly 0 to the contraction.
    w_full = _log_interp_matrix(nb, num_bins)
    w_pad = np.zeros((num_bins, nb_pad), np.float32)
    w_pad[:, :nb] = w_full
    w_hi = w_pad.astype(jnp.bfloat16).astype(np.float32)
    w_lo = (w_pad - w_hi).astype(np.float32)

    n_tiles2 = t_pad // tile2
    db_pad, intensity = pl.pallas_call(
        functools.partial(_db_rescale_kernel_tiled, n_kb=n_kb),
        grid=(n_tiles2, n_kb),
        in_specs=[
            pl.BlockSpec((kb, tile2), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((num_bins, kb), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_bins, kb), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((kb, tile2), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_bins, tile2), lambda i, k: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb_pad, t_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_bins, t_pad), intensity_dtype),
        ],
        scratch_shapes=[pltpu.VMEM((num_bins, tile2), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * num_bins * nb_pad,
            bytes_accessed=(4 * (2 * nb_pad * t_pad
                                 + n_tiles2 * 2 * num_bins * nb_pad)
                            + jnp.dtype(intensity_dtype).itemsize
                            * num_bins * t_pad),
            transcendentals=nb_pad * t_pad,
        ),
        interpret=interpret,
    )(p_pad, gmax.reshape(1), jnp.asarray(w_hi), jnp.asarray(w_lo))

    return (p_pad[:nb, :t], db_pad[:nb, :t], intensity[:, :t])
