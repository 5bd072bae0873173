"""JSON payload builders — byte-compatible with the reference's four schemas.

Schemas (SURVEY §2.1 "JSON writers"):
  1. spectrogram_data.json           (radar_processing.m:306-328; batch
     variant with start/end frame metadata :576-596)
  2. <name>_range_fft_data.json      (:355-377)
  3. <name>_range_speed_data.json    (:379-407)
  4. <name>_fft_data.json            (:409-436)

Builders are host-side NumPy: they run once per recording on final results,
outside the compiled graph.
"""

from __future__ import annotations

import numpy as np

from fmcw_radar_processing_tpu.config import RadarConfig


def spectrogram_payload(
    times: np.ndarray,
    log_freq_bins: np.ndarray,
    intensity: np.ndarray,
    *,
    batch: int | None = None,
    start_frame: int | None = None,
    end_frame: int | None = None,
    filename_base: str | None = None,
) -> dict:
    """spectrogram_data schema (:306-312); batch variant (:576-584).

    intensity: (freq_bins, T) dB matrix.
    """
    if batch is None:
        return {
            "time": np.asarray(times),
            "frequency": np.asarray(log_freq_bins),
            "intensity": np.asarray(intensity),
            "title": "All Frames - Log-Scaled Spectrogram",
            "xLabel": "Time (s)",
            "yLabel": "Frequency (Hz)",
        }
    return {
        "time": np.asarray(times),
        "frequency": np.asarray(log_freq_bins),
        "intensity": np.asarray(intensity),
        "title": f"Spectrogram - Batch {batch}",
        "xLabel": "Time (s) (relative to detected activity)",
        "yLabel": "Frequency (Hz)",
        "start_frame": start_frame,
        "end_frame": end_frame,
        "filename_base": filename_base,
    }


def range_fft_payload(
    waterfall: np.ndarray, cfg: RadarConfig, filename: str
) -> dict:
    """<name>_range_fft_data schema (:355-361).

    waterfall: (K, F) — abs-max-over-chirps range profile per frame.
    time axis: 0.15 s per frame (:355 hard-codes 0.15, which equals
    frame_time).
    """
    k, f = waterfall.shape
    return {
        "time_axis": np.arange(f) * cfg.algorithm.frame_time,
        "array_bin_range": np.asarray(cfg.derived.range_axis(k)),
        "range_tx1rx1_max_abs": np.asarray(waterfall),
        "filename": filename,
    }


def range_speed_payload(
    target_range: np.ndarray, target_speed: np.ndarray, cfg: RadarConfig,
    filename: str,
) -> dict:
    """<name>_range_speed_data schema (:386-389). NaN → null in JSON."""
    f = target_range.shape[-1]
    return {
        "time_axis": np.arange(f) * cfg.algorithm.frame_time,
        "range": np.asarray(target_range),
        "speed": np.asarray(target_speed),
        "filename": filename,
    }


def fft_snapshot_payload(
    waterfall: np.ndarray, cfg: RadarConfig, filename: str,
    frame_index: int = 100,
) -> dict:
    """<name>_fft_data schema (:418-422): single-frame range profile.

    The reference indexes the 3-D FFT cube with 2 subscripts
    (radar_processing.m:411), which via MATLAB linear indexing grabs chirp
    #100 overall instead of frame #100 (SURVEY Appendix A #2). We implement
    the documented *intent*: the chirp-integrated profile of frame
    ``frame_index`` (1-based, clamped to the recording length).
    """
    k, f = waterfall.shape
    fr = min(max(frame_index, 1), f)
    return {
        "range_bins": np.arange(k),
        "magnitude": np.asarray(waterfall[:, fr - 1]),
        "frame_index": fr,
        "filename": filename,
    }
