"""Windows vs scipy/NumPy ground truth (MATLAB toolbox semantics)."""

import numpy as np
import pytest
import scipy.signal.windows as sw

from fmcw_radar_processing_tpu.dsp.windows import blackman, chebwin, kaiser


@pytest.mark.parametrize("n", [4, 16, 20, 64, 127, 256])
def test_blackman_matches_numpy(n):
    np.testing.assert_allclose(blackman(n), np.blackman(n), atol=1e-12)


@pytest.mark.parametrize("n", [4, 16, 20, 64, 127, 256])
def test_blackman_matches_scipy_symmetric(n):
    np.testing.assert_allclose(blackman(n), sw.blackman(n, sym=True), atol=1e-12)


@pytest.mark.parametrize("n,beta", [(20, 3.0), (16, 5.0), (65, 8.6), (128, 14.0)])
def test_kaiser_matches_scipy(n, beta):
    np.testing.assert_allclose(kaiser(n, beta), sw.kaiser(n, beta, sym=True),
                               rtol=1e-10)


@pytest.mark.parametrize("n", [8, 15, 16, 32, 63, 64, 128])
def test_chebwin_matches_scipy(n):
    # MATLAB chebwin default sidelobe attenuation is 100 dB.
    np.testing.assert_allclose(chebwin(n), sw.chebwin(n, at=100, sym=True),
                               atol=1e-10)


@pytest.mark.parametrize("at", [60.0, 80.0, 120.0])
def test_chebwin_attenuation_param(at):
    np.testing.assert_allclose(chebwin(32, at), sw.chebwin(32, at=at, sym=True),
                               atol=1e-10)


def test_chebwin_peak_normalized():
    assert abs(chebwin(16).max() - 1.0) < 1e-12


def test_single_point_windows():
    assert blackman(1) == 1.0 and kaiser(1, 3.0) == 1.0 and chebwin(1) == 1.0
