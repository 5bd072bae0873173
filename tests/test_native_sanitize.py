"""Sanitizer harness for the native runtime (SURVEY §5.2).

Builds native/self_test.cpp + the two native libraries with
AddressSanitizer + UBSan and runs the binary: any out-of-bounds access,
leak, or UB in the C++ layer fails this test.
"""

import os
import shutil
import subprocess

import pytest

_NATIVE = os.path.join(os.path.dirname(__file__), "..", "native")

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def sanitized_binary(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("san") / "fmcw_self_test")
    srcs = [os.path.join(_NATIVE, f)
            for f in ("self_test.cpp", "fmcw_io.cpp", "fmcw_json.cpp")]
    subprocess.run(
        ["g++", "-O1", "-g", "-std=c++17",
         "-fsanitize=address,undefined", "-fno-omit-frame-pointer",
         *srcs, "-o", out],
        check=True, capture_output=True, text=True,
    )
    return out

def test_native_self_test_under_asan_ubsan(sanitized_binary, tmp_path):
    env = dict(os.environ,
               TMPDIR=str(tmp_path),
               ASAN_OPTIONS="detect_leaks=1:abort_on_error=0",
               UBSAN_OPTIONS="halt_on_error=1")
    res = subprocess.run([sanitized_binary], env=env,
                         capture_output=True, text=True, timeout=120)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "all checks passed" in res.stdout
    assert "ERROR" not in res.stderr  # no sanitizer reports
