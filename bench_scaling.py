"""Weak-scaling benchmark of the sharded parallelism portfolio.

BASELINE.md's north star asks for ≥80% scaling efficiency at N=2 hosts.
Real multi-chip hardware is unavailable in this deployment, so scaling is
measured on the host CPU in complementary ways:

  * ``multiproc_dp`` (the multi-HOST dp analog, the headline number): N
    independent single-device processes, each pinned to its own core,
    process frames concurrently after a synchronized start barrier.
    This is exactly the shape of multi-host data parallelism for this
    chain — separate processes, zero cross-host communication
    (parallel/sharded_chain.py shards frames; nothing crosses shards).
  * ``inproc_mesh_dp`` (the single-host multi-CHIP analog): one process,
    an N-device virtual CPU mesh, pinned to N cores with XLA's shared
    intra-op pool disabled (one compute thread per device). The virtual
    devices share one PJRT CPU client, which serializes parts of
    multi-device execution that real TPU chips run truly concurrently,
    so this mode UNDERSTATES hardware scaling; recorded as the
    pessimistic bound.
  * ``sp_*``: the halo-exchange ShardedStft, three ways — an in-process
    virtual-mesh length sweep (is the efficiency loss a fixed dispatch
    cost or per-sample?), a stage decomposition (full vs no-halo vs
    local-max vs no-dB variants, attributing the N=2 loss), and a TRUE
    2-process ``jax.distributed`` run with real cross-process collectives
    (Gloo) — the closest analog of 2 chips over ICI this host can
    express (VERDICT r4 item 2).

Estimator discipline (VERDICT r4 item 3 — the r4 artifact recorded a
physically impossible 1.17 "efficiency" from single-run N=1 noise):

  * every timed point is the MEDIAN of ≥5 repeats, with min/max spread
    recorded alongside;
  * the N=1 baselines are the median of 3 independent trials
    (subprocess-level, where the mode is subprocess-based);
  * CPU-affinity pinning via taskset where available;
  * a sanity rule: weak-scaling efficiency > 1.02 is flagged as
    baseline noise (``noise_flag``) and a clamped value recorded — it is
    never presented as a headline number.

CPU-mesh numbers are *indicative* (host cores are shared, unlike TPU
chips); the point is that the dp chain has zero cross-frame communication
so nothing in the program scales worse than the hardware does.

Run: python bench_scaling.py            # prints one JSON line per row
     python bench_scaling.py --record   # also writes SCALING_r05.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# One compute thread per virtual device: otherwise the N=1 run already
# saturates every host core through XLA's shared intra-op pool and weak
# scaling is confounded (measured: N=2 SLOWER than N=1 with the pool on;
# see module docstring).
if "xla_cpu_multi_thread_eigen" not in flags:
    flags += " --xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

SP_SAMPLES_PER_DEVICE = 262144


def _sp_dist_main() -> int:
    """Subprocess body for the 2-process jax.distributed sp mode.

    Each process owns ONE CPU device and its shard of the signal; the
    shard_map's ppermute halo and pmax run as REAL cross-process
    collectives (Gloo). Must run before the module-level 8-device flags
    matter — the env is fully overridden by the parent."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    coord = os.environ["BENCH_SP_COORD"]
    nproc = int(os.environ["BENCH_SP_NPROC"])
    pid = int(os.environ["BENCH_SP_PID"])
    spd = int(os.environ.get("BENCH_SP_SPD", str(SP_SAMPLES_PER_DEVICE)))
    start_at = float(os.environ.get("BENCH_START_AT", "0"))
    jax.distributed.initialize(coord, nproc, pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fmcw_radar_processing_tpu.dsp.stft import StftOperator
    from fmcw_radar_processing_tpu.parallel.mesh import make_mesh
    from fmcw_radar_processing_tpu.parallel.sharded_stft import ShardedStft

    devs = jax.devices()
    assert len(devs) == nproc, devs
    mesh = make_mesh(data=nproc, model=1, devices=devs)
    op = StftOperator.create(window_length=20, beta=3.0, nfft=256,
                             fs=6400.0, hop=1)
    st = ShardedStft(op=op, mesh=mesh)
    l = nproc * spd
    rng = np.random.default_rng(0)
    full = np.abs(rng.standard_normal(l)).astype(np.float32)
    sharding = NamedSharding(mesh, P("data"))
    sig = jax.make_array_from_callback((l,), sharding,
                                       lambda idx: full[idx])
    fn = jax.jit(lambda s: st(s, l)[1])
    fn(sig).block_until_ready()  # compile BEFORE the barrier
    if start_at:
        while time.time() < start_at:
            time.sleep(0.01)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn(sig).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"pid": pid, "median_s": statistics.median(ts),
                      "min_s": min(ts), "max_s": max(ts), "samples": l}))
    return 0


if os.environ.get("BENCH_SP_COORD") and __name__ == "__main__":
    sys.exit(_sp_dist_main())

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


def _recording(cfg, f: int):
    rec = synthesize_recording(
        cfg, f, (SyntheticTarget(range_m=7.5, doppler_bin_offset=3),), seed=0
    )
    return (jnp.asarray(rec.rx1_pair()),
            jnp.asarray(rec.calib_pair(0, cfg.nts)))


def _timed(run, iters: int = 5) -> dict:
    """Median + spread of run() wall seconds (already compiled)."""
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return {"median_s": statistics.median(ts), "min_s": min(ts),
            "max_s": max(ts), "iters": iters}


def _spread_fields(t: dict, items: float) -> dict:
    """Throughput row fields from a _timed dict (median + spread)."""
    return {
        "per_s": round(items / t["median_s"], 1),
        "per_s_max": round(items / t["min_s"], 1),
        "per_s_min": round(items / t["max_s"], 1),
        "timing_iters": t["iters"],
    }


def _efficiency(per_s: float, n: int, base_per_s: float) -> dict:
    """Weak-scaling efficiency with the >1.0 sanity rule (VERDICT r4)."""
    e = per_s / (n * base_per_s)
    out = {"efficiency_vs_1": round(e, 3)}
    if e > 1.02:
        out["noise_flag"] = ("efficiency > 1.0 is physically impossible "
                             "for weak scaling — a baseline artifact "
                             "(N=1 noise, or unequal per-device host "
                             "resources between baseline and N=2 runs)")
        out["efficiency_clamped"] = 1.0
    return out


def throughput(n_devices: int, frames_per_device: int, iters: int = 5,
               kind: str = "dp") -> dict:
    """Timed chain stats on an n-device mesh (median + spread)."""
    cfg = RadarConfig.create(default_device_config())
    f = n_devices * frames_per_device
    raw, calib = _recording(cfg, f)
    if kind == "dp":
        mesh = make_mesh(data=n_devices, model=1,
                         devices=jax.devices()[:n_devices])
        chain = make_sharded_frame_chain(cfg, mesh)
    elif kind == "tp":
        from fmcw_radar_processing_tpu.parallel.tp_chain import (
            make_tp_frame_chain,
        )

        mesh = make_mesh(data=1, model=n_devices,
                         devices=jax.devices()[:n_devices])
        chain = make_tp_frame_chain(cfg, mesh)
    elif kind == "pp":
        from fmcw_radar_processing_tpu.parallel.pp_chain import (
            make_pp_frame_chain,
            make_pp_mesh,
        )

        mesh = make_pp_mesh(n_devices)
        chain = make_pp_frame_chain(cfg, mesh, num_microbatches=4)
    else:
        raise ValueError(kind)
    chain(raw, calib).waterfall.block_until_ready()  # compile

    def run():
        chain(raw, calib).waterfall.block_until_ready()

    return _spread_fields(_timed(run, iters), f)


def _sharded_stft(n: int, spd: int, **knobs):
    from fmcw_radar_processing_tpu.dsp.stft import StftOperator
    from fmcw_radar_processing_tpu.parallel.sharded_stft import ShardedStft

    mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
    op = StftOperator.create(window_length=20, beta=3.0, nfft=256,
                             fs=6400.0, hop=1)
    st = ShardedStft(op=op, mesh=mesh, **knobs)
    l = n * spd
    rng = np.random.default_rng(0)
    sig = jnp.asarray(np.abs(rng.standard_normal(l)).astype(np.float32))
    fn = jax.jit(lambda s: st(s, l)[1])
    fn(sig).block_until_ready()
    return fn, sig, l


def sp_stats(n: int, samples_per_device: int = SP_SAMPLES_PER_DEVICE,
             iters: int = 5, **knobs) -> dict:
    """STFT columns/s stats of the halo-exchange ShardedStft (hop 1,
    nfft 256) on an n-device virtual mesh — weak scaling, fixed samples
    per device. ``knobs`` select the decomposition variants."""
    fn, sig, l = _sharded_stft(n, samples_per_device, **knobs)

    def run():
        fn(sig).block_until_ready()

    return _spread_fields(_timed(run, iters), l)


def _one_size_main() -> int:
    """Subprocess body: one timed dp run, optionally barrier-synced."""
    n = int(os.environ["BENCH_ONE_SIZE"])
    fpd = int(os.environ.get("BENCH_FRAMES_PER_DEVICE", "2048"))
    start_at = float(os.environ.get("BENCH_START_AT", "0"))
    cfg = RadarConfig.create(default_device_config())
    f = n * fpd
    raw, calib = _recording(cfg, f)
    mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
    chain = make_sharded_frame_chain(cfg, mesh)
    chain(raw, calib).waterfall.block_until_ready()  # compile BEFORE barrier
    if start_at:
        while time.time() < start_at:
            time.sleep(0.01)

    def run():
        chain(raw, calib).waterfall.block_until_ready()

    t = _timed(run)
    print(json.dumps({"devices": n,
                      "frames_per_s": round(f / t["median_s"], 1),
                      "frames_per_s_min": round(f / t["max_s"], 1),
                      "frames_per_s_max": round(f / t["min_s"], 1)}))
    return 0


def _pinned_cmd(cores: list[int]) -> list[str]:
    import shutil

    if shutil.which("taskset"):
        return ["taskset", "-c", ",".join(str(c) for c in cores)]
    return []


def _run_sub(env_extra: dict, cores: list[int]):
    import subprocess

    cmd = _pinned_cmd(cores) + [sys.executable, os.path.abspath(__file__)]
    env = dict(os.environ, **{k: str(v) for k, v in env_extra.items()})
    return subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True)


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_flags(ndev: int) -> str:
    return (f"--xla_force_host_platform_device_count={ndev} "
            "--xla_cpu_multi_thread_eigen=false "
            "intra_op_parallelism_threads=1")


def _multiproc_dp_point(n: int, fpd: int, ncores: int) -> float:
    """One barrier-synced N-process dp measurement → combined frames/s."""
    start_at = time.time() + (10 if n > 1 else 0)
    procs = [
        _run_sub(
            {"BENCH_ONE_SIZE": 1, "BENCH_FRAMES_PER_DEVICE": fpd,
             "BENCH_START_AT": start_at, "XLA_FLAGS": _worker_flags(1)},
            [i % ncores],
        )
        for i in range(n)
    ]
    fps = 0.0
    for p in procs:
        out, _ = p.communicate()
        if p.returncode:
            raise RuntimeError(f"worker failed: {out}")
        fps += json.loads(out.strip().splitlines()[-1])["frames_per_s"]
    return fps


def _sp_distributed_point(nproc: int, spd: int, ncores: int) -> dict:
    """One jax.distributed sp run (real Gloo collectives) → cols/s."""
    coord = f"127.0.0.1:{_free_port()}"
    # Barrier only means something with >1 process to synchronize; the
    # N=1 baseline (3 trials) would otherwise sleep 30 s for nothing.
    start_at = time.time() + (10 if nproc > 1 else 0)
    procs = [
        _run_sub(
            {"BENCH_SP_COORD": coord, "BENCH_SP_NPROC": nproc,
             "BENCH_SP_PID": pid, "BENCH_SP_SPD": spd,
             "BENCH_START_AT": start_at, "XLA_FLAGS": _worker_flags(1)},
            [pid % ncores],
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        if p.returncode:
            raise RuntimeError(f"sp-dist worker failed: {out}")
        outs.append(json.loads(out.strip().splitlines()[-1]))
    # Collectives sync the processes; the slower process's median bounds
    # the real rate.
    med = max(o["median_s"] for o in outs)
    l = outs[0]["samples"]
    return {"per_s": round(l / med, 1),
            "per_s_min": round(l / max(o["max_s"] for o in outs), 1),
            "per_s_max": round(l / min(o["min_s"] for o in outs), 1)}


def main() -> int:
    if os.environ.get("BENCH_ONE_SIZE"):
        return _one_size_main()
    if os.environ.get("BENCH_SP_PIN1"):
        # Subprocess body: the FAIR sp N=1 baseline — pinned to ONE core,
        # like each process of the N=2 modes. Unpinned, the single-device
        # run borrows the idle second core for XLA CPU runtime threads
        # (measured 834k vs 480k cols/s pinned on the 2-core host) and the
        # inflated denominator masquerades as an sp scaling loss.
        spd = int(os.environ.get("BENCH_SP_SPD", str(SP_SAMPLES_PER_DEVICE)))
        print(json.dumps(sp_stats(1, spd, iters=7)))
        return 0

    record = "--record" in sys.argv
    fpd = int(os.environ.get("BENCH_FRAMES_PER_DEVICE", "2048"))
    ncores = os.cpu_count() or 1
    cap = int(os.environ.get("BENCH_MAX_DEVICES", str(ncores)))
    sizes = [n for n in (1, 2, 4, 8) if n <= min(len(jax.devices()), cap)]
    baseline_trials = 3
    rows: list[dict] = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    # --- mode 1: multiproc dp (multi-host analog, headline) ---
    # N pinned single-device processes, barrier-synced start. The N=1
    # baseline is the median of ``baseline_trials`` independent runs —
    # the r4 artifact's impossible 1.17 efficiency came from a single
    # noisy N=1 run on this shared host.
    base = statistics.median(
        _multiproc_dp_point(1, fpd, ncores) for _ in range(baseline_trials)
    )
    emit({"mode": "multiproc_dp", "devices": 1,
          "frames_per_s": round(base, 1),
          "baseline_trials": baseline_trials})
    for n in sizes[1:]:
        fps = _multiproc_dp_point(n, fpd, ncores)
        emit({"mode": "multiproc_dp", "devices": n,
              "frames_per_s": round(fps, 1),
              **_efficiency(fps, n, base)})

    # --- mode 2: inproc virtual mesh (single-host multi-chip analog,
    # pessimistic bound — shared PJRT client serializes; see docstring) ---
    def inproc_point(n):
        p = _run_sub({"BENCH_ONE_SIZE": n, "BENCH_FRAMES_PER_DEVICE": fpd},
                     list(range(min(n, ncores))))
        out, _ = p.communicate()
        if p.returncode:
            raise RuntimeError(f"worker failed: {out}")
        return json.loads(out.strip().splitlines()[-1])

    base_rows = [inproc_point(1) for _ in range(baseline_trials)]
    base = statistics.median(r["frames_per_s"] for r in base_rows)
    emit({"mode": "inproc_mesh_dp", "devices": 1,
          "frames_per_s": round(base, 1),
          "baseline_trials": baseline_trials})
    for n in sizes[1:]:
        r = inproc_point(n)
        emit({"mode": "inproc_mesh_dp", "devices": n,
              "frames_per_s": r["frames_per_s"],
              "frames_per_s_min": r.get("frames_per_s_min"),
              "frames_per_s_max": r.get("frames_per_s_max"),
              **_efficiency(r["frames_per_s"], n, base)})

    # --- tp and pp at N=2: indicative timed runs (correctness lives in
    # tests/test_tp_chain.py, test_pp_chain.py) ---
    if len(sizes) >= 2:
        for kind in ("tp", "pp"):
            t = throughput(2, fpd, kind=kind)
            emit({"mode": f"{kind}_n2", "devices": 2,
                  "frames_per_s": t["per_s"],
                  "frames_per_s_min": t["per_s_min"],
                  "frames_per_s_max": t["per_s_max"]})

    # --- sp: halo-exchange ShardedStft (VERDICT r4 item 2). Units are
    # STFT columns/s (the sp axis is slow-time samples, not frames). ---
    if len(sizes) >= 2:
        # (a) length sweep: fixed dispatch overhead amortizes with L; a
        # per-sample serialization does not.
        for spd in (65536, 262144, 1048576):
            b = sp_stats(1, spd)
            s2 = sp_stats(2, spd)
            emit({"mode": "sp_sweep", "devices": 2,
                  "samples_per_device": spd,
                  "stft_cols_per_s_n1": b["per_s"],
                  "stft_cols_per_s": s2["per_s"],
                  "stft_cols_per_s_min": s2["per_s_min"],
                  "stft_cols_per_s_max": s2["per_s_max"],
                  **_efficiency(s2["per_s"], 2, b["per_s"])})
        # (b) stage decomposition at the default length: each variant
        # switches OFF one stage of the full program; the per-variant
        # efficiency attributes where the N=2 loss comes from.
        variants = (
            ("full", {}),
            ("no_halo", {"exchange_halo": False}),
            ("local_max", {"global_db_max": False}),
            ("no_db", {"compute_db": False}),
            ("local_only", {"exchange_halo": False, "global_db_max": False}),
        )
        decomp = {}
        for name, knobs in variants:
            b = sp_stats(1, **knobs)
            s2 = sp_stats(2, **knobs)
            eff = _efficiency(s2["per_s"], 2, b["per_s"])
            decomp[name] = {
                "n1_cols_per_s": b["per_s"], "n2_cols_per_s": s2["per_s"],
                "n1_s": round(SP_SAMPLES_PER_DEVICE / b["per_s"], 4),
                "n2_s": round(2 * SP_SAMPLES_PER_DEVICE / s2["per_s"], 4),
                **eff,
            }
        emit({"mode": "sp_decomposition",
              "samples_per_device": SP_SAMPLES_PER_DEVICE,
              "variants": decomp})
        # (c) the canonical sp rows (kept for cross-round comparability).
        b = sp_stats(1)
        s2 = sp_stats(2)
        emit({"mode": "sp_n1", "devices": 1,
              "stft_cols_per_s": b["per_s"],
              "stft_cols_per_s_min": b["per_s_min"],
              "stft_cols_per_s_max": b["per_s_max"]})
        emit({"mode": "sp_n2", "devices": 2,
              "stft_cols_per_s": s2["per_s"],
              "stft_cols_per_s_min": s2["per_s_min"],
              "stft_cols_per_s_max": s2["per_s_max"],
              **_efficiency(s2["per_s"], 2, b["per_s"])})
        # (c2) the FAIR baseline: sp N=1 pinned to one core (the same
        # budget each N=2 process gets). The unpinned baseline above
        # borrows the idle second core for XLA runtime threads — THIS is
        # where the r4 "0.75 efficiency" went, not the halo (the no_halo/
        # local_only variants match full within noise) and not the
        # collectives (the 2-process Gloo mode below scales at ~1.0).
        p = _run_sub({"BENCH_SP_PIN1": 1,
                      "BENCH_SP_SPD": SP_SAMPLES_PER_DEVICE,
                      "XLA_FLAGS": _worker_flags(1)}, [0])
        out, _ = p.communicate(timeout=600)
        if p.returncode:
            raise RuntimeError(f"pinned sp worker failed: {out}")
        pinned = json.loads(out.strip().splitlines()[-1])
        emit({"mode": "sp_n1_pinned_1core", "devices": 1,
              "stft_cols_per_s": pinned["per_s"],
              "stft_cols_per_s_min": pinned["per_s_min"],
              "stft_cols_per_s_max": pinned["per_s_max"],
              "note": "fair per-core baseline: one pinned core, like each "
                      "process of the N=2 modes"})
        emit({"mode": "sp_n2_vs_pinned_baseline", "devices": 2,
              "stft_cols_per_s": s2["per_s"],
              **_efficiency(s2["per_s"], 2, pinned["per_s"])})
        # (d) TRUE 2-process jax.distributed sp with Gloo collectives —
        # the multi-host analog (each process its own PJRT client, like
        # dp's headline mode; no shared-client serialization).
        base_d = statistics.median(
            _sp_distributed_point(1, SP_SAMPLES_PER_DEVICE, ncores)["per_s"]
            for _ in range(baseline_trials)
        )
        emit({"mode": "sp_multiproc_dist", "devices": 1,
              "stft_cols_per_s": round(base_d, 1),
              "baseline_trials": baseline_trials})
        d2 = _sp_distributed_point(2, SP_SAMPLES_PER_DEVICE, ncores)
        emit({"mode": "sp_multiproc_dist", "devices": 2,
              "stft_cols_per_s": d2["per_s"],
              "stft_cols_per_s_min": d2["per_s_min"],
              "stft_cols_per_s_max": d2["per_s_max"],
              **_efficiency(d2["per_s"], 2, base_d)})

    if record:
        artifact = {
            "host_cores": ncores,
            "frames_per_device": fpd,
            "methodology": (
                "Every timed point is the median of >=5 repeats with "
                "min/max spread recorded; N=1 baselines are the median of "
                "3 independent trials; workers are taskset-pinned; weak-"
                "scaling efficiency > 1.02 is flagged as baseline noise "
                "and clamped, never recorded as a headline (VERDICT r4 "
                "item 3). multiproc_dp = N pinned single-device processes, "
                "barrier-synced (multi-host dp analog — zero cross-host "
                "communication); inproc_mesh_dp = N-device virtual CPU "
                "mesh in one process (single PJRT client — understates "
                "real multi-chip scaling); sp_sweep/sp_decomposition = "
                "virtual-mesh ShardedStft length sweep + stage attribution; "
                "sp_multiproc_dist = 2 jax.distributed processes with real "
                "Gloo ppermute/pmax collectives (the multi-host sp analog); "
                "sp_n1_pinned_1core = the FAIR per-core baseline (the "
                "unpinned N=1 run borrows the idle second core for XLA "
                "runtime threads, inflating the denominator — the r4 '0.75 "
                "sp efficiency' was this baseline artifact, as the "
                "decomposition shows: no_halo/local_only match full within "
                "noise, and the 2-process Gloo mode scales at ~1.0). "
                "CPU numbers are indicative; no multi-chip TPU exists in "
                "this deployment."
            ),
            "baseline_target": "≥0.80 efficiency at N=2 (BASELINE.md)",
            "rows": rows,
        }
        with open("SCALING_r05.json", "w") as f:
            json.dump(artifact, f, indent=2)
        print("wrote SCALING_r05.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
