"""MATLAB-``jsonencode``-compatible JSON emission.

The dashboard consumes JSON produced by MATLAB's ``jsonencode(...,
'PrettyPrint', true)`` (radar_processing.m:315,364,392,425,590). The
encoding rules that matter for schema compatibility:

  * row and column vectors encode as flat arrays; true matrices encode as
    arrays of rows;
  * NaN/±Inf encode as ``null``;
  * scalars encode as numbers, strings as strings.

This module reproduces those rules for NumPy inputs.
"""

from __future__ import annotations

import json
import math
from typing import Any

import numpy as np


def _sanitize(value: Any) -> Any:
    if isinstance(value, dict):
        return {k: _sanitize(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_sanitize(v) for v in value]
    if isinstance(value, np.ndarray):
        arr = np.asarray(value)
        if arr.ndim == 2 and 1 in arr.shape:
            arr = arr.reshape(-1)  # MATLAB: vectors are flat arrays
        return _sanitize(arr.tolist())
    if isinstance(value, (np.floating, float)):
        f = float(value)
        return None if (math.isnan(f) or math.isinf(f)) else f
    if isinstance(value, (np.integer, int)):
        return int(value)
    if isinstance(value, (np.bool_, bool)):
        return bool(value)
    return value


def dumps_matlab(obj: dict, pretty: bool = True) -> str:
    return json.dumps(_sanitize(obj), indent=2 if pretty else None)


def write_json(path: str, obj: dict, pretty: bool = True) -> str:
    text = dumps_matlab(obj, pretty=pretty)
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)
    return path
