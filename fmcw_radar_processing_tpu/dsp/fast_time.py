"""Fast-time (range) processing as a single fused MXU matmul.

The reference's fast-time chain (radar_processing.m:201-207) is, per chirp
column x ∈ C^NTS:

    1. calibration subtract + IF scale:   y = (x − calib) · IF_scale      (:203)
    2. per-chirp DC removal:              y ← y − mean(y)                 (:204)
    3. range window:                      y ← y ⊙ 2·blackman(NTS)         (:205)
    4. zero-padded range FFT:             Y = FFT_K(y),  K = 256          (:205)

Every step is linear (or affine) in x, so the whole chain collapses to

    Y = M x − M·(calib·IF_scale),
    M = F_K[:, :NTS] · diag(w) · (I − 11ᵀ/NTS) · IF_scale

one K×NTS complex matrix applied to every chirp of every frame. On TPU this
is the idiomatic formulation: a zero-padded 256-point FFT of a 64-sample
chirp *is* a 256×64 matrix multiply, and batching it over
(frames · chirps) columns turns the reference's serial per-frame loop
(radar_processing.m:197) into one large MXU matmul with perfect weight
reuse — no FFT butterflies, no scalar loops, no per-frame dispatch.

Complex values use the pair convention (utils/cplx.py — trailing [re, im]
axis): the graph contains only real float32 ops. The operator matrix is
built once per configuration on the host in float64 and becomes a
compile-time constant under jit.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fmcw_radar_processing_tpu.config import RadarConfig
from fmcw_radar_processing_tpu.dsp.windows import blackman
from fmcw_radar_processing_tpu.utils.cplx import pair_abs, pair_matmul


def dft_matrix(k: int, n: int) -> np.ndarray:
    """First ``n`` columns of the K-point DFT matrix (zero-padding operator)."""
    kk = np.arange(k)[:, None]
    nn = np.arange(n)[None, :]
    return np.exp(-2j * np.pi * kk * nn / k)


def build_fast_time_matrix(cfg: RadarConfig) -> np.ndarray:
    """M = F_K[:, :NTS] · diag(2·blackman) · (I − 11ᵀ/NTS) · IF_scale."""
    nts = cfg.nts
    k = cfg.range_fft_size
    w = 2.0 * blackman(nts)
    demean = np.eye(nts) - np.full((nts, nts), 1.0 / nts)
    m = dft_matrix(k, nts) @ np.diag(w) @ demean * cfg.derived.if_scale
    return m.astype(np.complex128)


@dataclasses.dataclass(frozen=True)
class FastTimeOperator:
    """Precomputed fused fast-time operator for a fixed RadarConfig.

    Matrices are host NumPy — trace-time constants baked into the HLO.
    Call with raw chirps laid out as [..., PN, NTS, 2] (chirps along the
    third-to-last axis, ADC samples next, [re, im] pair last — contraction
    axis innermost of the data axes). Returns range FFT [..., PN, K, 2].
    """

    m_re: np.ndarray  # (K, NTS) float32
    m_im: np.ndarray  # (K, NTS) float32

    @classmethod
    def create(cls, cfg: RadarConfig) -> "FastTimeOperator":
        m = build_fast_time_matrix(cfg)
        return cls(m_re=m.real.astype(np.float32), m_im=m.imag.astype(np.float32))

    def offset(self, calib: jax.Array) -> jax.Array:
        """M @ calib (the affine part). calib: [NTS, 2] pair → [K, 2]."""
        return pair_matmul(
            calib, jnp.asarray(self.m_re), jnp.asarray(self.m_im), "n,kn->k"
        )

    def __call__(self, raw: jax.Array, calib: jax.Array) -> jax.Array:
        """Apply the fused chain.

        raw:   [..., PN, NTS, 2] float32 ADC sample pairs (rx1 of tx1,
               matching matrix_raw_data(:,:,1) at radar_processing.m:202).
        calib: [NTS, 2] calibration pair (radar_processing.m:174).
        returns range_fft [..., PN, K, 2] float32.
        """
        y = pair_matmul(
            raw.astype(jnp.float32),
            jnp.asarray(self.m_re),
            jnp.asarray(self.m_im),
            "...pn,kn->...pk",
        )
        return y - self.offset(calib.astype(jnp.float32))


def range_profile(range_fft: jax.Array) -> jax.Array:
    """Non-coherent integration across chirps (radar_processing.m:210).

    MATLAB's ``abs(max(X, [], 2))`` on a complex array picks, per range bin,
    the chirp whose FFT value has the largest magnitude, then takes its
    magnitude — which equals the max of magnitudes.

    range_fft: [..., PN, K, 2] → profile [..., K] float32.
    """
    return jnp.max(pair_abs(range_fft), axis=-2)
