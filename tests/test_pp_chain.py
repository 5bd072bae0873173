"""Pipeline-parallel chain vs single-device ground truth (8-device mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fmcw_radar_processing_tpu.parallel.mesh import make_mesh
from fmcw_radar_processing_tpu.parallel.pp_chain import (
    make_pp_frame_chain,
    make_pp_mesh,
)
from fmcw_radar_processing_tpu.pipeline.frame_chain import make_frame_chain
from fmcw_radar_processing_tpu.utils.cplx import to_pair

from .conftest import make_recording


def _inputs(cfg, rng, num_frames, **kw):
    frames, calib = make_recording(cfg, num_frames=num_frames, rng=rng, **kw)
    return (jnp.asarray(to_pair(np.swapaxes(frames, -1, -2))),
            jnp.asarray(to_pair(calib)))


def _assert_matches(a, b):
    np.testing.assert_allclose(np.asarray(a.waterfall), np.asarray(b.waterfall),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.detected), np.asarray(b.detected))
    np.testing.assert_array_equal(np.asarray(a.detection.idx),
                                  np.asarray(b.detection.idx))
    np.testing.assert_allclose(np.asarray(a.range), np.asarray(b.range),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.speed), np.asarray(b.speed),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.strength), np.asarray(b.strength),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a.strongest_chirps),
                               np.asarray(b.strongest_chirps), rtol=1e-5,
                               atol=1e-6)


def test_pp_chain_matches_unsharded(cfg, rng):
    """4×2 (data × stage) mesh, 2 microbatches per data shard."""
    raw, calib = _inputs(cfg, rng, num_frames=16)
    mesh = make_pp_mesh(8)
    pp = make_pp_frame_chain(cfg, mesh, num_microbatches=2)
    plain = make_frame_chain(cfg, impl="xla")
    _assert_matches(pp(raw, calib), plain(raw, calib))


def test_pp_chain_pure_pipeline(cfg, rng):
    """data=1: all parallelism is inter-stage; deeper microbatching."""
    raw, calib = _inputs(cfg, rng, num_frames=12)
    mesh = make_pp_mesh(2)
    pp = make_pp_frame_chain(cfg, mesh, num_microbatches=4)
    plain = make_frame_chain(cfg, impl="xla")
    _assert_matches(pp(raw, calib), plain(raw, calib))


def test_pp_chain_nan_for_undetected(cfg, rng):
    """NaN-filled measurement slots survive the psum replication."""
    raw, calib = _inputs(cfg, rng, num_frames=8, target_bins=(), amplitude=0.0)
    mesh = make_pp_mesh(2)
    pp = make_pp_frame_chain(cfg, mesh, num_microbatches=2)
    out = pp(raw, calib)
    plain_out = make_frame_chain(cfg, impl="xla")(raw, calib)
    np.testing.assert_array_equal(np.asarray(out.detected),
                                  np.asarray(plain_out.detected))
    mask = ~np.asarray(out.detection.valid).T  # [T, F]
    if mask.any():
        assert np.isnan(np.asarray(out.range)[mask]).all()


def test_pp_mesh_validation():
    with pytest.raises(ValueError, match="multiple of 2"):
        make_pp_mesh(3)


def test_pp_chain_rejects_bad_mesh(cfg):
    mesh = make_mesh()  # (data, model) — no stage axis
    with pytest.raises(ValueError, match="stage"):
        make_pp_frame_chain(cfg, mesh)
