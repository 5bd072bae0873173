"""Worker process for the true multi-process jax.distributed test.

Launched by tests/test_multihost_multiproc.py as
``python tests/_multihost_worker.py <coordinator> <nproc> <pid> <outdir>``.
Each worker owns 4 virtual CPU devices; together they form the 8-device
global mesh, exercising the REAL multi-process branches of
parallel/multihost.py (jax.distributed.initialize,
host_local_array_to_global_array, process_allgather, the host-0 barrier)
that single-process tests cannot reach (VERDICT r1 item 5).
"""

import os
import sys

# 4 virtual devices per process — must be set before jax initializes.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

# The deployment image pins the TPU backend via sitecustomize; force CPU
# through live config (env vars are too late), same as tests/conftest.py.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    coord, nproc, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )

    from fmcw_radar_processing_tpu.parallel import multihost as mh

    idx = mh.initialize(coordinator_address=coord, num_processes=nproc,
                        process_id=pid)
    assert idx == pid, (idx, pid)
    assert jax.process_count() == nproc
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * nproc

    from fmcw_radar_processing_tpu.config import (
        RadarConfig,
        default_device_config,
    )
    from fmcw_radar_processing_tpu.io.synth import (
        SyntheticTarget,
        synthesize_recording,
    )
    from fmcw_radar_processing_tpu.parallel.sharded_chain import (
        make_sharded_frame_chain,
    )

    cfg = RadarConfig.create(default_device_config())
    f = 32
    # Deterministic: every process synthesizes the same recording and takes
    # its own contiguous frame chunk — the per-host ingest pattern.
    rec = synthesize_recording(
        cfg, f,
        (SyntheticTarget(range_m=7.5, doppler_bin_offset=3),
         SyntheticTarget(range_m=16.9, doppler_bin_offset=-2, amplitude=2.5)),
        seed=5,
    )
    raw = rec.rx1_pair()
    calib = rec.calib_pair(0, cfg.nts)
    chunk = f // nproc
    local = raw[pid * chunk : (pid + 1) * chunk]

    mesh = mh.global_mesh()
    assert mesh.devices.size == 4 * nproc
    raw_g = mh.distribute_frames(local, mesh)  # global-array branch
    assert raw_g.shape[0] == f, raw_g.shape  # global shape spans all hosts

    chain = make_sharded_frame_chain(cfg, mesh)
    out = chain(raw_g, jax.numpy.asarray(calib))
    got = mh.gather_to_all({  # process_allgather branch
        "waterfall": out.waterfall,
        "range": out.range,
        "speed": out.speed,
        "detected": out.detected,
    })
    np.savez(os.path.join(outdir, f"proc{pid}.npz"), **got)

    # host-0 branch + cross-process barrier: only process 0 writes.
    mh.on_host0(
        lambda: open(os.path.join(outdir, "host0_artifact"), "w").write("ok")
    )
    # After the barrier EVERY process must see host 0's artifact.
    assert os.path.exists(os.path.join(outdir, "host0_artifact"))
    print(f"worker {pid} ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
