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


def _sanitize_array(arr: np.ndarray) -> list:
    """Vectorized ndarray → JSON-ready nested lists.

    Per-element Python checks on multi-million-cell spectrogram matrices
    were the pipeline's measured bottleneck (61% of wall in --profile);
    non-finite masking is done once in NumPy instead.
    """
    if arr.ndim == 2 and 1 in arr.shape:
        arr = arr.reshape(-1)  # MATLAB: vectors are flat arrays
    if arr.dtype.kind == "f":
        finite = np.isfinite(arr)
        if finite.all():
            return arr.tolist()
        out = arr.astype(object)
        out[~finite] = None
        return out.tolist()
    if arr.dtype.kind in "iub":
        return arr.tolist()
    return [_sanitize(v) for v in arr.tolist()]


def _sanitize(value: Any) -> Any:
    if isinstance(value, dict):
        return {k: _sanitize(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_sanitize(v) for v in value]
    if isinstance(value, np.ndarray):
        return _sanitize_array(value)
    if isinstance(value, (np.floating, float)):
        f = float(value)
        return None if (math.isnan(f) or math.isinf(f)) else f
    if isinstance(value, (np.integer, int)):
        return int(value)
    if isinstance(value, (np.bool_, bool)):
        return bool(value)
    return value


def dumps_matlab(obj: dict, pretty: bool = True) -> str:
    """pretty=True matches the reference's 'PrettyPrint' output layout.

    pretty=False is byte-smaller AND much faster: CPython only uses the C
    json encoder when indent is None, so compact mode skips the pure-Python
    iterencode path entirely. Parsers see identical data either way.
    """
    return json.dumps(_sanitize(obj), indent=2 if pretty else None)


def write_json(path: str, obj: dict, pretty: bool = True) -> str:
    text = dumps_matlab(obj, pretty=pretty)
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)
    return path
