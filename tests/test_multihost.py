"""Multi-host orchestration on the virtual 8-device mesh (single process)."""

import numpy as np
import pytest

import jax

from fmcw_radar_processing_tpu.parallel.multihost import (
    distribute_frames,
    gather_to_all,
    global_mesh,
    initialize,
    on_host0,
)
from fmcw_radar_processing_tpu.parallel.sharded_chain import (
    make_sharded_frame_chain,
)
from fmcw_radar_processing_tpu.pipeline.frame_chain import make_frame_chain
from fmcw_radar_processing_tpu.utils.cplx import to_pair

from .conftest import make_recording


def test_initialize_single_process_noop():
    assert initialize() == 0


def test_global_mesh_shape():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    m = global_mesh(model=2)
    assert m.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        global_mesh(model=3)


def test_distribute_process_gather_roundtrip(cfg, rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    frames, calib = make_recording(cfg, num_frames=16, rng=rng)
    raw = to_pair(np.swapaxes(frames, -1, -2))
    cal = to_pair(calib)

    mesh = global_mesh()
    raw_g = distribute_frames(raw, mesh)
    assert raw_g.sharding.spec[0] == "data"

    sharded = make_sharded_frame_chain(cfg, mesh)
    out_sharded = sharded(raw_g, jax.numpy.asarray(cal))
    got = gather_to_all({
        "waterfall": out_sharded.waterfall,
        "range": out_sharded.range,
        "detected": out_sharded.detected,
    })

    want = make_frame_chain(cfg)(raw, cal)
    np.testing.assert_allclose(got["waterfall"], np.asarray(want.waterfall),
                               rtol=1e-5)
    np.testing.assert_array_equal(got["detected"], np.asarray(want.detected))
    np.testing.assert_allclose(got["range"], np.asarray(want.range), rtol=1e-6)


def test_on_host0_runs_and_returns():
    calls = []
    result = on_host0(lambda x: calls.append(x) or "done", 42)
    assert result == "done" and calls == [42]
