"""Pallas TPU kernel: vectorized peak search (the f_search_peak stage).

Per frame, entirely in VMEM on the VPU:

    1. local-maximum test against shifted neighbors;
    2. distance-gate + threshold eligibility (dsp/detection.py semantics);
    3. iterative top-T extraction: T rounds of (max, argmax, mask-out) —
       for the reference's T = max_num_targets = 1 this is a single masked
       max/argmax, cheaper than a general sort-based top-k.

Grid over frame tiles; the profile row (K = 256 lanes) maps exactly onto
two VPU lane groups.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fmcw_radar_processing_tpu.config import RadarConfig
from fmcw_radar_processing_tpu.dsp.detection import DetectionResult


def _kernel(prof_ref, gate_ref, idx_ref, mag_ref, *, num_targets: int,
            threshold: float):
    p = prof_ref[:]  # [Ft, K]
    ft, k = p.shape
    neg = jnp.float32(-jnp.inf)
    left = jnp.concatenate([jnp.full((ft, 1), neg), p[:, :-1]], axis=1)
    right = jnp.concatenate([p[:, 1:], jnp.full((ft, 1), neg)], axis=1)
    eligible = (
        (p >= left) & (p >= right) & (gate_ref[:] > 0)
        & (p > jnp.float32(threshold))
    )
    masked = jnp.where(eligible, p, neg)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ft, k), 1)
    for t in range(num_targets):
        best = jnp.max(masked, axis=1, keepdims=True)  # [Ft, 1]
        is_best = masked == best
        # Lowest bin wins ties (matches top_k's stable ordering).
        best_idx = jnp.min(jnp.where(is_best, cols, k), axis=1, keepdims=True)
        mag_ref[:, t : t + 1] = best
        idx_ref[:, t : t + 1] = jnp.where(best_idx < k, best_idx, 0)
        if t + 1 < num_targets:
            masked = jnp.where(cols == best_idx, neg, masked)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def search_peaks_pallas(
    profile: jax.Array, cfg: RadarConfig, interpret: bool | None = None
) -> DetectionResult:
    """Pallas peak search. profile: [F, K] float32 → DetectionResult [F, T].

    interpret: None = auto (interpreter off TPU, compiled on TPU).
    """
    from fmcw_radar_processing_tpu.dsp.detection import gate_mask

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    f, k = profile.shape
    t = cfg.algorithm.max_num_targets
    tile = 8
    f_pad = -(-f // tile) * tile
    prof = jnp.pad(profile, ((0, f_pad - f), (0, 0))) if f_pad != f else profile
    gate = jnp.broadcast_to(
        gate_mask(cfg).astype(jnp.float32)[None, :], (tile, k)
    )

    # Output lanes must be 128-aligned; round T up and slice back.
    t_pad = max(t, 128)
    idx, mag = pl.pallas_call(
        functools.partial(
            _kernel, num_targets=t, threshold=cfg.algorithm.range_threshold
        ),
        grid=(f_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, t_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, t_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f_pad, t_pad), jnp.int32),
            jax.ShapeDtypeStruct((f_pad, t_pad), jnp.float32),
        ],
        interpret=interpret,
    )(prof, gate)
    idx = idx[:f, :t]
    mag = mag[:f, :t]
    valid = jnp.isfinite(mag)
    return DetectionResult(
        idx=idx, magnitude=jnp.where(valid, mag, 0.0), valid=valid
    )
