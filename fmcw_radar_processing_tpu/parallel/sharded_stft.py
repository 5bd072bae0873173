"""Context-parallel STFT: overlap-save with one-hop halo exchange.

The reference's STFT is a single serial ``spectrogram`` call over the whole
concatenated slow-time signal (radar_processing.m:276) — the project's
long-sequence object (SURVEY §5.7). Here the time axis is sharded over the
``data`` mesh axis: each device holds a contiguous chunk of samples and
computes the STFT columns that *start* inside its chunk. A column starting
in the last window_length−1 samples of a chunk reads into the next chunk,
so each device fetches those ``window_length−1`` boundary samples from its
right neighbor with a single `jax.lax.ppermute` — the overlap-save halo.
Communication per device per call is W−1 = 19 samples, independent of
signal length: the collective cost is negligible against the matmul, so
scaling is essentially linear in devices.

The dB normalization needs the global PSD max; that is one `lax.pmax` over
the mesh axis (radar_processing.m:282-283's max(P(:)) made distributed).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fmcw_radar_processing_tpu.dsp.stft import StftOperator
from fmcw_radar_processing_tpu.parallel.mesh import DATA_AXIS


@dataclasses.dataclass(frozen=True)
class ShardedStft:
    """Sharded wrapper over a StftOperator (hop 1).

    Call with the packed slow-time magnitude signal [L] (L divisible by the
    data-axis size) and its valid length; returns
    (power [nb, L] sharded over columns, psd_db [nb, L], col_valid [L]).
    Column t of the output corresponds to the window starting at sample t;
    globally the last W−1 columns (and any past valid_len) are masked — the
    same fixed-capacity convention as the single-device operator.
    """

    op: StftOperator
    mesh: Mesh
    # --- measurement instrumentation (bench_scaling sp decomposition) ---
    # Disabling any of these produces WRONG results at shard boundaries /
    # in the dB normalization — they exist so the scaling bench can
    # attribute the N=2 efficiency loss stage by stage (VERDICT r4 item 2),
    # not for production use.
    exchange_halo: bool = True  # False: zeros instead of the ppermute halo
    global_db_max: bool = True  # False: per-shard max instead of the pmax
    compute_db: bool = True  # False: skip the log epilogue (db slot = power)

    def __call__(self, signal: jax.Array, valid_len: jax.Array):
        op = self.op
        w = op.window_length
        mesh = self.mesh
        n = mesh.shape[DATA_AXIS]
        axis_names = tuple(mesh.axis_names)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P()),
            out_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS), P(DATA_AXIS)),
        )
        def run(x_local, vlen):
            chunk = x_local.shape[0]
            # Halo: first W−1 samples of the right neighbor, shifted left.
            # The perm wraps circularly, so device n−1 receives device 0's
            # HEAD samples — wrong data for its trailing columns, which is
            # harmless because those columns are globally invalid (the last
            # W−1 window starts of the signal) and masked below.
            if self.exchange_halo:
                # At n == 1 the (identity) ppermute still executes and its
                # result is discarded below — the N=1 baseline pays the
                # same collective dispatch as the sharded runs.
                halo = jax.lax.ppermute(
                    x_local[: w - 1],
                    axis_name=DATA_AXIS,
                    perm=[(i, (i - 1) % n) for i in range(n)]
                    if n > 1 else [(0, 0)],
                )
            else:
                halo = jnp.zeros(w - 1, x_local.dtype)
            if n > 1 and self.exchange_halo:
                ext = jnp.concatenate([x_local, halo])
            else:
                ext = jnp.concatenate([x_local, jnp.zeros(w - 1, x_local.dtype)])
            res = op(ext)  # columns 0..chunk-1 start in this chunk
            local_p = res.power[:, :chunk]
            # Global column validity: col_global = my_id·chunk + t must
            # satisfy col_global + W ≤ valid_len.
            my = jax.lax.axis_index(DATA_AXIS)
            col_global = my * chunk + jnp.arange(chunk)
            valid = col_global + w <= vlen
            local_p = jnp.where(valid[None, :], local_p, 0.0)
            # Global max for dB normalization (:282-283).
            if self.global_db_max:
                g = jax.lax.pmax(jnp.max(local_p), axis_name=axis_names)
            else:
                g = jnp.max(local_p)
            if not self.compute_db:
                # Keep a data dependence on g (through a barrier, so the
                # 0·g cannot be folded away) — the max/pmax stage must not
                # be DCE'd: this variant isolates the log epilogue only.
                g_b = jax.lax.optimization_barrier(g)
                return local_p, local_p + 0.0 * g_b, valid
            safe_g = jnp.where(g > 0, g, 1.0)
            from fmcw_radar_processing_tpu.dsp.stft import DB_FLOOR

            db = jnp.where(
                local_p > 0,
                jnp.maximum(
                    20.0 * jnp.log10(jnp.maximum(local_p, 1e-45) / safe_g),
                    DB_FLOOR,
                ),
                DB_FLOOR,
            )
            return local_p, db, valid

        return run(signal, jnp.asarray(valid_len))

    @property
    def freqs(self) -> jax.Array:
        return jnp.arange(self.op.num_bins, dtype=jnp.float32) * (
            self.op.fs / self.op.nfft
        )

    def times(self, total_len: int) -> jax.Array:
        return (
            jnp.arange(total_len, dtype=jnp.float32) + self.op.window_length / 2.0
        ) / jnp.float32(self.op.fs)
