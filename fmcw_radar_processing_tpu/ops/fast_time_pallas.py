"""Pallas TPU kernel: fused fast-time range DFT + non-coherent integration.

One kernel instance processes a group of frames and performs, entirely in
VMEM:

    1. the affine complex range DFT  Y = M·x − off  as four real MXU
       matmuls (radar_processing.m:201-207 collapsed, see dsp/fast_time.py);
    2. the magnitude map |Y|;
    3. the per-frame non-coherent integration max over chirps
       (radar_processing.m:210) — the detection profile.

Fusing (2)+(3) into the matmul kernel is the point: the XLA path writes the
[F, PN, K, 2] FFT cube to HBM and reads it back for the profile reduction;
here the magnitudes never leave VMEM, saving a full HBM round-trip of the
largest intermediate on the bandwidth-bound side of the chain.

Group size is chosen so each matmul tile is (G·PN ≥ 128) × NTS × K —
MXU-shaped. All operands are float32 (pair convention, utils/cplx.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fmcw_radar_processing_tpu.config import RadarConfig
from fmcw_radar_processing_tpu.dsp.fast_time import build_fast_time_matrix


def _kernel(xr_ref, xi_ref, mr_ref, mi_ref, offr_ref, offi_ref,
            yr_ref, yi_ref, prof_ref, *, group: int, pn: int):
    xr = xr_ref[:]  # [G·PN, NTS]
    xi = xi_ref[:]
    mr = mr_ref[:]  # [NTS, K]
    mi = mi_ref[:]
    # HIGHEST = true f32 MXU passes; DEFAULT would quantize operands to
    # bf16 (see _profile_kernel's precision note and dsp/fast_time.py).
    hi = jax.lax.Precision.HIGHEST
    yr = (
        jnp.dot(xr, mr, preferred_element_type=jnp.float32, precision=hi)
        - jnp.dot(xi, mi, preferred_element_type=jnp.float32, precision=hi)
        - offr_ref[:]
    )
    yi = (
        jnp.dot(xr, mi, preferred_element_type=jnp.float32, precision=hi)
        + jnp.dot(xi, mr, preferred_element_type=jnp.float32, precision=hi)
        - offi_ref[:]
    )
    yr_ref[:] = yr
    yi_ref[:] = yi
    mag = jnp.sqrt(yr * yr + yi * yi)  # [G·PN, K], stays in VMEM
    k = mag.shape[-1]
    prof_ref[:] = jnp.max(mag.reshape(group, pn, k), axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fast_time_pallas(
    raw: jax.Array, calib: jax.Array, cfg: RadarConfig,
    interpret: bool | None = None,
):
    """Fused fast-time stage.

    raw: [F, PN, NTS, 2] or flat [F, PN, 2·NTS] float32;
    calib: [NTS, 2] float32.
    Returns (range_fft [F, PN, K, 2], profile [F, K]).
    interpret: None = auto (interpreter off TPU, compiled on TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if raw.shape[-1] == 2 * cfg.nts:
        raw = raw.reshape(*raw.shape[:-1], cfg.nts, 2)
    f, pn, nts, _ = raw.shape
    k = cfg.range_fft_size
    m = build_fast_time_matrix(cfg)
    mr = jnp.asarray(m.real.T.copy(), jnp.float32)  # [NTS, K]
    mi = jnp.asarray(m.imag.T.copy(), jnp.float32)
    # offset = M @ calib (pair arithmetic), computed once per call.
    cr, ci = calib[..., 0], calib[..., 1]
    offr = (cr @ mr - ci @ mi)[None, :]  # [1, K]
    offi = (cr @ mi + ci @ mr)[None, :]

    # Group frames so each tile has ≥128 matmul rows.
    group = max(1, -(-128 // pn))
    f_pad = -(-f // group) * group
    xr = raw[..., 0].reshape(f * pn, nts)
    xi = raw[..., 1].reshape(f * pn, nts)
    if f_pad != f:
        pad = ((0, (f_pad - f) * pn), (0, 0))
        xr = jnp.pad(xr, pad)
        xi = jnp.pad(xi, pad)

    rows = group * pn
    grid = (f_pad // group,)
    row_spec = pl.BlockSpec((rows, nts), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((nts, k), lambda i: (0, 0), memory_space=pltpu.VMEM)
    off_spec = pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_row_spec = pl.BlockSpec((rows, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    prof_spec = pl.BlockSpec((group, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

    yr, yi, prof = pl.pallas_call(
        functools.partial(_kernel, group=group, pn=pn),
        grid=grid,
        in_specs=[row_spec, row_spec, w_spec, w_spec, off_spec, off_spec],
        out_specs=[out_row_spec, out_row_spec, prof_spec],
        out_shape=[
            jax.ShapeDtypeStruct((f_pad * pn, k), jnp.float32),
            jax.ShapeDtypeStruct((f_pad * pn, k), jnp.float32),
            jax.ShapeDtypeStruct((f_pad, k), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * f_pad * pn * nts * k,
            bytes_accessed=4 * (2 * f_pad * pn * (nts + k) + f_pad * k),
            transcendentals=f_pad * pn * k,  # sqrt
        ),
        interpret=interpret,
    )(xr, xi, mr, mi, offr, offi)

    rf = jnp.stack([yr[: f * pn], yi[: f * pn]], axis=-1).reshape(f, pn, k, 2)
    return rf, prof[:f]


def _profile_kernel(x_ref, w_ref, off_ref, prof_ref, *, group: int, pn: int,
                    k: int, precision):
    """Packed DFT + magnitude + chirp-max; only the [G, K] profile leaves
    VMEM — the range-FFT values live and die in VMEM/registers."""
    x = x_ref[:]  # [G·PN, 2·NTS] interleaved (re, im) pairs
    w = w_ref[:]  # [2·NTS, 2·K] — columns [:K] produce re, [K:] produce im
    # Precision, not dtype, selects the MXU mode: an explicit
    # astype(bfloat16) feeding an f32-accumulating dot is constant-folded
    # away by Mosaic exactly like XLA's excess-precision folding (measured:
    # bit-identical output to f32, i.e. no quantization and no speedup).
    # lax.Precision.DEFAULT = bf16 multiply passes (what XLA uses for every
    # f32 matmul by default — measured 55 dB vs f64 for this operator);
    # HIGHEST = full f32 multiply (measured 140 dB).
    y = jnp.dot(x, w, preferred_element_type=jnp.float32,
                precision=precision) - off_ref[:]
    yr = y[:, :k]
    yi = y[:, k:]
    mag = jnp.sqrt(yr * yr + yi * yi)
    prof_ref[:] = jnp.max(mag.reshape(group, pn, k), axis=1)


def _profile_kernel_b3(x_ref, whi_ref, wlo_ref, off_ref, prof_ref, *,
                       group: int, pn: int, k: int):
    """HIGH-equivalent profile kernel: explicit bf16x3 3-dot split (Mosaic
    has no Precision.HIGH dot — same construction as stft_pallas's
    phase-2 interpolation). w_hi is exactly bf16-representable (split on
    the host), x splits here; the dropped x_lo·w_lo term is ~2^-18
    relative. 3 MXU passes instead of HIGHEST's 6 on the chain's dominant
    matmul — measured pass-bound, not traffic-bound (ROOFLINE_r04)."""
    x = x_ref[:]
    x_hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    x_lo = x - x_hi
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
    whi = whi_ref[:]
    y = (d(x_hi, whi) + d(x_lo, whi) + d(x_hi, wlo_ref[:])) - off_ref[:]
    yr = y[:, :k]
    yi = y[:, k:]
    mag = jnp.sqrt(yr * yr + yi * yi)
    prof_ref[:] = jnp.max(mag.reshape(group, pn, k), axis=1)


def _packed_blocked_weight(m) -> np.ndarray:
    """[2·NTS, 2·K] real weight with re|im BLOCK columns (cols [:K] give the
    real part, [K:] the imaginary part), for interleaved-pair input rows.

    Differs from PackedFastTime.w (interleaved output columns) so the
    kernel epilogue can slice contiguous lane ranges instead of stride-2
    lanes — a free relayout at weight-build time vs a vector shuffle per
    tile at run time.
    """
    k, nts = m.shape
    w = np.zeros((2 * nts, 2 * k), np.float32)
    w[0::2, :k] = m.real.T
    w[1::2, :k] = -m.imag.T
    w[0::2, k:] = m.imag.T
    w[1::2, k:] = m.real.T
    return w


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "interpret", "group", "compute_dtype",
                     "precision"),
)
def fast_time_profile_pallas(
    raw: jax.Array, calib: jax.Array, cfg: RadarConfig,
    interpret: bool | None = None, group: int | None = None,
    compute_dtype=jnp.float32, precision: str | None = None,
):
    """Profile-ONLY fused fast-time stage (VERDICT r1 item 4).

    Emits only the integrated range profile [F, K]; the range-FFT cube is
    never written to HBM, making the kernel's HBM traffic F·PN·NTS·2 reads
    + F·K writes — the information-theoretic minimum for this reduction
    (radar_processing.m:201-210 collapsed to one pass). This matters
    because XLA's otherwise-excellent fusion cannot sink a reduction into
    a matmul: the fused XLA path (PackedFastTime.profile) still round-trips
    the [F·PN, 2K] product through HBM (~4 GB for a 65k-frame recording,
    measured ~6 ms of the stage's 8.8 ms on a v5e). Detected bins' chirp
    rows are recomputed downstream via PackedFastTime.rf_at_bins
    (recompute-over-materialize).

    Input should arrive as FLAT pair-rows [F, PN, 2·NTS]: the packed weight
    (_packed_blocked_weight) absorbs the complex 2×2 block structure, so no
    deinterleave pass is needed — but a [F, PN, NTS, 2] *parameter* carries
    a device tiling keyed to the size-2 minor axis, and the in-graph
    reshape to matmul rows is then a real relayout (~8 ms measured at 65k
    frames, 8× the kernel itself). Reshape on the host (free view) and pass
    flat; the pair layout is still accepted for compatibility.

    raw: [F, PN, 2·NTS] (preferred) or [F, PN, NTS, 2] float32;
    calib: [NTS, 2] float32 → [F, K].
    group: frames per kernel instance (None = 1024 matmul rows' worth;
    larger groups amortize weight reloads and grid overhead).
    compute_dtype selects the MXU precision class (see _profile_kernel):
    jnp.float32 → lax.Precision.HIGHEST (genuinely exact, unlike the
    DEFAULT-precision XLA paths); jnp.bfloat16 → lax.Precision.DEFAULT
    (bf16 multiply passes, f32 accumulate — the same accuracy class as
    every default XLA f32 matmul in this codebase). ``precision``
    overrides: "highest" (6 passes) / "high" (explicit bf16x3, 3 passes,
    ~2^-18 relative — _profile_kernel_b3) / "default" (1 pass). Accuracy
    cost is recorded by bench.py's SNR columns, not guessed.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if precision is None:
        precision = ("highest" if compute_dtype == jnp.float32
                     else "default")
    mxu_prec = (jax.lax.Precision.HIGHEST if precision == "highest"
                else jax.lax.Precision.DEFAULT)
    f, pn = raw.shape[0], raw.shape[1]
    nts = cfg.nts
    k = cfg.range_fft_size
    m = build_fast_time_matrix(cfg)
    w_np = _packed_blocked_weight(m)  # [2·NTS, 2·K] host constant
    w = jnp.asarray(w_np)
    off = calib.astype(jnp.float32).reshape(1, 2 * nts) @ w  # [1, 2K], f32

    if group is None:
        group = max(1, 1024 // pn)
    f_pad = -(-f // group) * group
    x = raw.astype(jnp.float32).reshape(f * pn, 2 * nts)
    if f_pad != f:
        x = jnp.pad(x, ((0, (f_pad - f) * pn), (0, 0)))

    rows = group * pn
    grid = (f_pad // group,)
    row_spec = pl.BlockSpec((rows, 2 * nts), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((2 * nts, 2 * k), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    off_spec = pl.BlockSpec((1, 2 * k), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec((group, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_pad, k), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * f_pad * pn * (2 * nts) * (2 * k),
            bytes_accessed=4 * (2 * f_pad * pn * nts + f_pad * k),
            transcendentals=f_pad * pn * k,  # sqrt
        ),
        interpret=interpret,
    )
    if precision == "high":
        w_hi = w_np.astype(jnp.bfloat16).astype(np.float32)
        w_lo = (w_np - w_hi).astype(np.float32)
        prof = pl.pallas_call(
            functools.partial(_profile_kernel_b3, group=group, pn=pn, k=k),
            in_specs=[row_spec, w_spec, w_spec, off_spec],
            **common,
        )(x, jnp.asarray(w_hi), jnp.asarray(w_lo), off)
    else:
        prof = pl.pallas_call(
            functools.partial(_profile_kernel, group=group, pn=pn, k=k,
                              precision=mxu_prec),
            in_specs=[row_spec, w_spec, off_spec],
            **common,
        )(x, w, off)
    return prof[:f]
