"""Weak-scaling benchmark of the dp-sharded frame chain.

BASELINE.md's north star asks for ≥80% scaling efficiency at N=2 hosts.
Real multi-chip hardware is unavailable in this deployment, so this
measures the sharded-compile path the way CI does: an N-device virtual
CPU mesh (`xla_force_host_platform_device_count`), weak scaling (frames
per device held constant), efficiency = throughput(N) / (N·throughput(1)).

CPU-mesh numbers are *indicative* (host cores are shared, unlike TPU
chips); the point is that the dp chain has zero cross-frame communication
(parallel/sharded_chain.py) so nothing in the program scales worse than
the hardware does.

Prints one JSON line per mesh size:
  {"devices": N, "frames_per_s": ..., "efficiency_vs_1": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# One compute thread per virtual device: otherwise the N=1 run already
# saturates every host core through XLA's shared intra-op pool and weak
# scaling is confounded (measured: 0.56 "efficiency" at N=2 with the pool
# on, 0.80 with it off on a 2-core host — the true hardware ceiling).
if "xla_cpu_multi_thread_eigen" not in flags:
    flags += " --xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from fmcw_radar_processing_tpu.config import (  # noqa: E402
    RadarConfig,
    default_device_config,
)
from fmcw_radar_processing_tpu.io.synth import (  # noqa: E402
    SyntheticTarget,
    synthesize_recording,
)
from fmcw_radar_processing_tpu.parallel.mesh import make_mesh  # noqa: E402
from fmcw_radar_processing_tpu.parallel.sharded_chain import (  # noqa: E402
    make_sharded_frame_chain,
)


def throughput(n_devices: int, frames_per_device: int, iters: int = 3) -> float:
    cfg = RadarConfig.create(default_device_config())
    f = n_devices * frames_per_device
    rec = synthesize_recording(
        cfg, f, (SyntheticTarget(range_m=7.5, doppler_bin_offset=3),), seed=0
    )
    mesh = make_mesh(data=n_devices, model=1, devices=jax.devices()[:n_devices])
    chain = make_sharded_frame_chain(cfg, mesh)
    raw = jnp.asarray(rec.rx1_pair())
    calib = jnp.asarray(rec.calib_pair(0, cfg.nts))
    out = chain(raw, calib)
    out.waterfall.block_until_ready()  # compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = chain(raw, calib)
        out.waterfall.block_until_ready()
        times.append(time.perf_counter() - t0)
    return f / min(times)


def main() -> int:
    frames_per_device = int(os.environ.get("BENCH_FRAMES_PER_DEVICE", "2048"))
    if os.environ.get("BENCH_ONE_SIZE"):
        n = int(os.environ["BENCH_ONE_SIZE"])
        print(json.dumps({"devices": n,
                          "frames_per_s": round(throughput(n, frames_per_device), 1)}))
        return 0

    # Mesh sizes beyond the physical core count oversubscribe the host and
    # measure the OS scheduler, not the program — cap there by default.
    cap = int(os.environ.get("BENCH_MAX_DEVICES", str(os.cpu_count() or 1)))
    sizes = [n for n in (1, 2, 4, 8) if n <= min(len(jax.devices()), cap)]

    # Each mesh size runs in its own subprocess pinned (taskset) to exactly N
    # cores: XLA's CPU backend parallelizes fused loops across the whole host
    # pool regardless of mesh size, so an unpinned N=1 baseline silently uses
    # every core and weak scaling reads as noise. Pinning makes the baseline
    # a true 1-core number and efficiency = fps(N) / (N · fps(1)) meaningful.
    import shutil
    import subprocess

    have_taskset = shutil.which("taskset") is not None
    base = None
    for n in sizes:
        cmd = (["taskset", "-c", ",".join(str(c) for c in range(n))]
               if have_taskset else []) + [sys.executable, os.path.abspath(__file__)]
        env = dict(os.environ, BENCH_ONE_SIZE=str(n),
                   BENCH_FRAMES_PER_DEVICE=str(frames_per_device))
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             check=True).stdout.strip().splitlines()[-1]
        fps = json.loads(out)["frames_per_s"]
        if base is None:
            base = fps
        print(
            json.dumps(
                {
                    "devices": n,
                    "frames_per_s": fps,
                    "efficiency_vs_1": round(fps / (n * base), 3),
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
