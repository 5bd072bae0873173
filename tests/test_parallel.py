"""Sharded paths vs single-device ground truth on an 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from fmcw_radar_processing_tpu.dsp.stft import StftOperator, psd_db
from fmcw_radar_processing_tpu.parallel.mesh import DATA_AXIS, make_mesh
from fmcw_radar_processing_tpu.parallel.sharded_chain import make_sharded_frame_chain
from fmcw_radar_processing_tpu.parallel.sharded_stft import ShardedStft
from fmcw_radar_processing_tpu.pipeline.frame_chain import make_frame_chain

from fmcw_radar_processing_tpu.utils.cplx import to_pair

from .conftest import make_recording


def test_mesh_has_eight_devices():
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == 8


def test_sharded_chain_matches_unsharded(cfg, rng):
    frames, calib = make_recording(cfg, num_frames=16, rng=rng)
    raw = to_pair(np.swapaxes(frames, -1, -2))
    calib = to_pair(calib)
    mesh = make_mesh()
    sharded = make_sharded_frame_chain(cfg, mesh)
    plain = make_frame_chain(cfg)
    a = sharded(jnp.asarray(raw), jnp.asarray(calib))
    b = plain(jnp.asarray(raw), jnp.asarray(calib))
    np.testing.assert_allclose(np.asarray(a.waterfall), np.asarray(b.waterfall),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.detected), np.asarray(b.detected))
    np.testing.assert_allclose(np.asarray(a.range), np.asarray(b.range),
                               rtol=1e-6)
    # Verify the output really is sharded over frames.
    shard_devs = {s.device for s in a.waterfall.addressable_shards}
    assert len(shard_devs) == 8


def test_sharded_stft_matches_unsharded(rng):
    mesh = make_mesh()
    fs = 1000.0
    l = 512  # divisible by 8
    x = (1.0 + np.sin(2 * np.pi * 40.0 * np.arange(l) / fs)
         + 0.1 * rng.standard_normal(l)).astype(np.float32)
    valid = 430
    x[valid:] = 0.0
    op = StftOperator.create(window_length=20, beta=3.0, nfft=256, fs=fs, hop=1)
    sh = ShardedStft(op=op, mesh=mesh)
    p_sh, db_sh, col_valid = sh(jnp.asarray(x), valid)

    ref = op(jnp.asarray(x), valid_len=jnp.asarray(valid))
    ref_db = psd_db(ref)
    n_cols = valid - 20 + 1
    assert int(np.asarray(col_valid).sum()) == n_cols
    np.testing.assert_allclose(
        np.asarray(p_sh)[:, :n_cols], np.asarray(ref.power)[:, :n_cols],
        rtol=2e-4, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(db_sh)[:, :n_cols], np.asarray(ref_db)[:, :n_cols],
        rtol=1e-4, atol=2e-3,
    )
    assert float(np.asarray(p_sh)[:, n_cols:].max()) == 0.0


def test_sharded_stft_halo_crosses_boundary(rng):
    """A sharp impulse adjacent to a shard boundary must appear identically
    in columns computed on the neighboring device (halo correctness)."""
    mesh = make_mesh()
    l = 256  # chunk = 32 per device
    x = np.zeros(l, np.float32)
    x[33] = 1.0  # just right of the 0/1 boundary at 32
    op = StftOperator.create(window_length=20, beta=3.0, nfft=64, fs=100.0, hop=1)
    sh = ShardedStft(op=op, mesh=mesh)
    p_sh, _, _ = sh(jnp.asarray(x), l)
    ref = op(jnp.asarray(x), valid_len=jnp.asarray(l))
    n_cols = l - 19
    # Columns 14..33 (starting on device 0) all cover sample 33.
    np.testing.assert_allclose(
        np.asarray(p_sh)[:, :n_cols], np.asarray(ref.power), rtol=2e-4, atol=1e-10
    )
