"""Data-parallel frame chain: frames sharded across the mesh.

The per-frame chain (fast-time matmul → detect → Doppler matmul → measure)
has no cross-frame coupling, so sharding the leading frame axis over the
``data`` mesh axis parallelizes it with zero communication — the DFT
operator matrices are tiny and get replicated to every device. Only the
slow-time packing (a global cumsum over the detected mask) and payload
assembly need cross-device data; XLA inserts the scan collectives from the
sharding annotations.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fmcw_radar_processing_tpu.config import RadarConfig
from fmcw_radar_processing_tpu.parallel.mesh import DATA_AXIS
from fmcw_radar_processing_tpu.pipeline.frame_chain import make_frame_chain


def make_sharded_frame_chain(cfg: RadarConfig, mesh: Mesh):
    """Jitted chain with frames sharded over the ``data`` axis.

    Returns fn(raw [F, PN, NTS, 2], calib [NTS, 2]) -> FrameChainOutputs
    with all per-frame outputs sharded over frames. F must divide by the
    data-axis size (pad recordings to a multiple; the pipeline's bucketing
    already rounds recording lengths).
    """
    chain = make_frame_chain(cfg)
    raw_sharding = NamedSharding(mesh, P(DATA_AXIS, None, None, None))
    replicated = NamedSharding(mesh, P())

    def sharded(raw, calib):
        raw = jax.lax.with_sharding_constraint(raw, raw_sharding)
        return chain(raw, calib)

    return jax.jit(
        sharded,
        in_shardings=(raw_sharding, replicated),
    )
