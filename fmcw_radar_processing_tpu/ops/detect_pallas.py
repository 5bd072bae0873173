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
    # Outputs are [T_pad, Ft] — frames on the 128-lane axis, targets on
    # sublanes — so T only pads to the 8-sublane minimum instead of 128
    # lanes (the r1 kernel wrote 128 lanes per frame for T=1: 128× write
    # amplification).
    for t in range(num_targets):
        best = jnp.max(masked, axis=1, keepdims=True)  # [Ft, 1]
        is_best = masked == best
        # Lowest bin wins ties (matches top_k's stable ordering).
        best_idx = jnp.min(jnp.where(is_best, cols, k), axis=1, keepdims=True)
        mag_ref[t : t + 1, :] = best.reshape(1, ft)
        idx_ref[t : t + 1, :] = jnp.where(best_idx < k, best_idx, 0).reshape(1, ft)
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
    # Frames ride the 128-lane axis of the OUTPUTS, so the frame tile is
    # 128; targets pad only to the 8-sublane f32 minimum.
    tile = 128
    f_pad = -(-f // tile) * tile
    prof = jnp.pad(profile, ((0, f_pad - f), (0, 0))) if f_pad != f else profile
    gate = jnp.broadcast_to(
        gate_mask(cfg).astype(jnp.float32)[None, :], (tile, k)
    )

    t_pad = -(-t // 8) * 8
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
            pl.BlockSpec((t_pad, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_pad, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, f_pad), jnp.int32),
            jax.ShapeDtypeStruct((t_pad, f_pad), jnp.float32),
        ],
        interpret=interpret,
    )(prof, gate)
    idx = idx[:t, :f].T
    mag = mag[:t, :f].T
    valid = jnp.isfinite(mag)
    return DetectionResult(
        idx=idx, magnitude=jnp.where(valid, mag, 0.0), valid=valid
    )
