"""Device-mesh construction.

The reference has no in-process parallelism at all (SURVEY §2.3) — its
serial per-frame loop (radar_processing.m:197) and single-shot STFT are the
workloads being scaled here. Mesh axes:

  * ``data``  — frames (the per-frame chain is embarrassingly parallel) and
    the slow-time/STFT time axis (context parallelism via halo exchange).
  * ``model`` — reserved for sharding the range-bin / frequency axes of
    very large configs, and for the classifier's tensor parallelism.

Collectives ride ICI within a slice; XLA inserts them from sharding
annotations (the scaling-book recipe: pick a mesh, annotate, let XLA
partition, profile).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int | None = None, model: int = 1, devices=None
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
