"""Native C++ IO runtime vs the NumPy reader."""

import numpy as np
import pytest

from fmcw_radar_processing_tpu.io.native_loader import (
    NativeRecordingReader,
    native_available,
)
from fmcw_radar_processing_tpu.io.raw_format import write_raw_bin
from fmcw_radar_processing_tpu.io.synth import SyntheticTarget, synthesize_recording

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for native IO"
)


@pytest.fixture
def recording(cfg, tmp_path):
    rec = synthesize_recording(
        cfg, 12, (SyntheticTarget(range_m=7.5, doppler_bin_offset=2),),
        seed=5, n_cal_factor=4,
    )
    path = str(tmp_path / "r.raw.bin")
    write_raw_bin(path, rec)
    return path, rec


def test_header(recording, cfg):
    path, rec = recording
    r = NativeRecordingReader(path)
    assert r.frame_count == 12
    assert r.num_rx == cfg.device.num_rx_antennas
    assert (r.pn, r.nts) == (cfg.pn, cfg.nts)
    assert r.is_complex


def test_frames_match_numpy_reader(recording, cfg):
    path, rec = recording
    r = NativeRecordingReader(path)
    got = r.read_frames(0, 12, rx=0)
    np.testing.assert_array_equal(got, rec.rx1_pair())
    # Windowed read + second antenna.
    got2 = r.read_frames(3, 4, rx=1)
    from fmcw_radar_processing_tpu.utils.cplx import to_pair

    np.testing.assert_array_equal(got2, to_pair(rec.frames[3:7, 1]))


def test_calib_vector_matches(recording, cfg):
    path, rec = recording
    r = NativeRecordingReader(path)
    got = r.calib_vector_pair(rx=0, nts=cfg.nts)
    np.testing.assert_allclose(got, rec.calib_pair(0, cfg.nts), rtol=1e-6)


def test_real_recording_zero_imag(cfg, tmp_path):
    rec = synthesize_recording(cfg, 3, (), seed=1)
    real_frames = rec.frames.real.astype(np.float32)
    from fmcw_radar_processing_tpu.io.raw_format import RawRecording

    path = str(tmp_path / "real.raw.bin")
    write_raw_bin(path, RawRecording(frames=real_frames, calib=rec.calib))
    r = NativeRecordingReader(path)
    assert not r.is_complex
    got = r.read_frames(0, 3, rx=0)
    np.testing.assert_array_equal(got[..., 0], real_frames[:, 0])
    assert np.all(got[..., 1] == 0.0)


def test_iter_batches(recording):
    path, rec = recording
    r = NativeRecordingReader(path)
    starts = []
    total = 0
    for start, batch in r.iter_batches(5):
        starts.append(start)
        total += batch.shape[0]
    assert starts == [0, 5, 10]
    assert total == 12


def test_out_of_range_rejected(recording):
    path, _ = recording
    r = NativeRecordingReader(path)
    with pytest.raises(IOError):
        r.read_frames(10, 5)
    with pytest.raises(IOError):
        r.read_frames(0, 1, rx=9)
