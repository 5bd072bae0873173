"""Tensor-parallel (range-bin-sharded) chain vs single-device ground truth."""

import numpy as np
import jax.numpy as jnp

from fmcw_radar_processing_tpu.parallel.mesh import make_mesh
from fmcw_radar_processing_tpu.parallel.tp_chain import make_tp_frame_chain
from fmcw_radar_processing_tpu.pipeline.frame_chain import make_frame_chain
from fmcw_radar_processing_tpu.utils.cplx import to_pair

from .conftest import make_recording


def _compare(cfg, mesh, num_frames, rng):
    frames, calib = make_recording(cfg, num_frames=num_frames, rng=rng)
    raw = to_pair(np.swapaxes(frames, -1, -2))
    calib = to_pair(calib)
    tp = make_tp_frame_chain(cfg, mesh)
    plain = make_frame_chain(cfg)
    a = tp(jnp.asarray(raw), jnp.asarray(calib))
    b = plain(jnp.asarray(raw), jnp.asarray(calib))
    # Different per-shard matmul shapes change f32 accumulation order.
    np.testing.assert_allclose(
        np.asarray(a.waterfall), np.asarray(b.waterfall), rtol=5e-4
    )
    np.testing.assert_array_equal(
        np.asarray(a.detection.idx), np.asarray(b.detection.idx)
    )
    np.testing.assert_array_equal(np.asarray(a.detected), np.asarray(b.detected))
    np.testing.assert_allclose(np.asarray(a.range), np.asarray(b.range), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.speed), np.asarray(b.speed), rtol=1e-5,
                               atol=1e-6)
    # strongest_chirps is defined only where a detection exists.
    det = np.asarray(b.detected)
    np.testing.assert_allclose(
        np.asarray(a.strongest_chirps)[det],
        np.asarray(b.strongest_chirps)[det],
        rtol=1e-4, atol=1e-4,
    )
    return a


def test_tp_chain_matches_unsharded_2x4(cfg, rng):
    """data=2 × model=4: range bins sharded 4-way, frames 2-way."""
    mesh = make_mesh(data=2, model=4)
    a = _compare(cfg, mesh, num_frames=16, rng=rng)
    # Outputs must actually live on all 8 devices.
    assert len({s.device for s in a.waterfall.addressable_shards}) == 8


def test_tp_chain_matches_unsharded_pure_tp(cfg, rng):
    """data=1 × model=8: pure tensor parallelism."""
    mesh = make_mesh(data=1, model=8)
    _compare(cfg, mesh, num_frames=4, rng=rng)


def test_tp_chain_noise_only_frames_match(cfg, rng):
    """Target-free (noise-only) frames: TP detection agrees with the
    single-device chain bin-for-bin (noise peaks included)."""
    mesh = make_mesh(data=2, model=4)
    frames, calib = make_recording(
        cfg, num_frames=8, rng=rng, target_bins=(), amplitude=0.0
    )
    raw = to_pair(np.swapaxes(frames, -1, -2))
    tp = make_tp_frame_chain(cfg, mesh)
    plain = make_frame_chain(cfg)
    a = tp(jnp.asarray(raw), jnp.asarray(to_pair(calib)))
    b = plain(jnp.asarray(raw), jnp.asarray(to_pair(calib)))
    np.testing.assert_array_equal(np.asarray(a.detected), np.asarray(b.detected))
    np.testing.assert_array_equal(
        np.asarray(a.detection.idx), np.asarray(b.detection.idx)
    )
