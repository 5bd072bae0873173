"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharded code paths are
exercised on 8 virtual CPU devices (the standard JAX fake-mesh recipe).
Must run before jax initializes, hence env vars at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The deployment image pre-imports jax and pins the TPU backend via a
# sitecustomize hook before conftest runs, so the env vars above are too
# late for platform selection — override through the live config instead.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from fmcw_radar_processing_tpu.config import (  # noqa: E402
    AlgorithmConfig,
    RadarConfig,
    default_device_config,
)


@pytest.fixture
def cfg() -> RadarConfig:
    """Default reference-shaped config: NTS=64, PN=16, K=256, D=16."""
    return RadarConfig.create(default_device_config())


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(42)


def make_recording(
    cfg: RadarConfig,
    num_frames: int,
    rng: np.random.Generator,
    target_bins=(40, 90),
    amplitude: float = 3.0,
):
    """Random complex recording with injected beat-frequency targets.

    Returns (frames [F, NTS, PN] complex64, calib [NTS] complex64).
    Target at range bin b ⇒ beat frequency b·fs/K (0-based bins).
    """
    nts, pn, k = cfg.nts, cfg.pn, cfg.range_fft_size
    n = np.arange(nts)
    frames = 0.05 * (
        rng.standard_normal((num_frames, nts, pn))
        + 1j * rng.standard_normal((num_frames, nts, pn))
    )
    for b in target_bins:
        phase = rng.uniform(0, 2 * np.pi, (num_frames, 1, pn))
        tone = amplitude * np.exp(1j * (2 * np.pi * b * n[None, :, None] / k + phase))
        frames = frames + tone
    # Realistic ADC calibration: a smooth, near-DC curve. (A random calib
    # would itself inject a broadband above-threshold signal after the
    # (x − calib)·IF_scale step — faithful to the chain, but useless for
    # constructing detection-free frames in tests.)
    calib = (0.3 + 0.05 * np.cos(2 * np.pi * np.arange(nts) / nts)) * (1.0 + 0.5j)
    return frames.astype(np.complex64), calib.astype(np.complex64)

