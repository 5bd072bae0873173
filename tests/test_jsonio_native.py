"""Native JSON serializer: byte-compatibility with the CPython path."""

import json

import numpy as np
import pytest

from fmcw_radar_processing_tpu.utils import jsonio
from fmcw_radar_processing_tpu.utils.jsonio import (
    _get_native,
    _sanitize,
    dumps_matlab,
)

pytestmark = pytest.mark.skipif(
    _get_native() is None, reason="no C++ toolchain"
)


def _python_dumps(obj, pretty=True):
    prev = jsonio._native_lib
    jsonio._native_lib = False
    try:
        return json.dumps(_sanitize(obj), indent=2 if pretty else None)
    finally:
        jsonio._native_lib = prev


@pytest.mark.parametrize("pretty", [True, False])
def test_byte_identical_float_battery(pretty):
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.standard_normal(3000) * 10.0 ** rng.integers(-38, 38, 3000),
        rng.integers(-10**6, 10**6, 992).astype(np.float64),
        np.array([0.0, -0.0, 1e-45, 3.4e38, -1.1754944e-38,
                  1e16, 9.9e15, 1e15]),
    ]).astype(np.float32)
    vals[::97] = np.nan
    vals[::131] = np.inf
    obj = {"m": vals.reshape(100, 40), "v": vals[:800],
           "i": np.arange(7), "s": "name", "k": 3, "f": 0.25}
    assert dumps_matlab(obj, pretty) == _python_dumps(obj, pretty)


def test_byte_identical_f64_extremes():
    rng = np.random.default_rng(3)
    m = rng.standard_normal((30, 30)) * 10.0 ** rng.integers(-300, 300, (30, 30))
    assert dumps_matlab({"m": m}) == _python_dumps({"m": m})


def test_vector_flattening_rule():
    row = np.linspace(0, 1, 600, dtype=np.float32)[None, :]  # (1, 600)
    assert dumps_matlab({"r": row}) == _python_dumps({"r": row})
    col = row.T  # (600, 1)
    assert dumps_matlab({"c": col}) == _python_dumps({"c": col})


def test_small_arrays_and_fallbacks():
    # below the native threshold and nested dicts both take the Python path
    small = {"a": np.ones(3, np.float32), "nested": {"x": np.ones(600)}}
    assert dumps_matlab(small) == json.dumps(_sanitize(small), indent=2)


def test_empty_and_degenerate_shapes():
    objs = [
        {"e": np.zeros((0,), np.float32)},
        {"e": np.zeros((0, 5), np.float32)},
        {"e": np.zeros((5, 0), np.float32)},
        {"e": np.zeros((700,), np.float32)},
    ]
    for obj in objs:
        assert dumps_matlab(obj) == _python_dumps(obj), obj["e"].shape
