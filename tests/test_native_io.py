"""Native C++ CSV parser vs the pure-Python fallback.

The ingest path (hlax/data/reader.py::_read_csv_matrix) uses
hlax/native/fastcsv.cpp through ctypes when the toolchain is available and
must produce bit-identical matrices to the Python fallback on every input
shape the reference emits (plain floats, blank fields, 'nan' fields, header
rows — read_functions.py:30-64).
"""

import numpy as np
import pytest

from hlax.native import io as nio


def _roundtrip(tmp_path, text, name="m.csv"):
    p = tmp_path / name
    p.write_text(text)
    fast = nio.read_csv_matrix(str(p))
    slow = nio._numpy_fallback(str(p))
    np.testing.assert_array_equal(np.isnan(fast), np.isnan(slow))
    np.testing.assert_array_equal(np.nan_to_num(fast), np.nan_to_num(slow))
    return fast


def test_native_builds_and_parses(tmp_path):
    if nio._load() is None:
        pytest.skip("native toolchain unavailable")
    m = _roundtrip(tmp_path, "1.5,2,3\n4,,6\n7,nan,9e2\n")
    assert m.shape == (3, 3)
    assert m[0, 0] == 1.5 and np.isnan(m[1, 1]) and np.isnan(m[2, 1])
    assert m[2, 2] == 900.0


def test_header_row_skipped(tmp_path):
    m = _roundtrip(tmp_path, "a,b,c\n1,2,3\n4,5,6\n")
    assert m.shape == (2, 3)
    assert m[0, 0] == 1.0


def test_large_random_matrix(tmp_path):
    rng = np.random.default_rng(0)
    ref = rng.standard_normal((200, 37))
    ref[rng.random(ref.shape) < 0.1] = np.nan
    text = "\n".join(",".join("" if np.isnan(v) else f"{v:.17g}" for v in row)
                     for row in ref)
    m = _roundtrip(tmp_path, text + "\n", "big.csv")
    assert m.shape == ref.shape
    np.testing.assert_array_equal(np.isnan(m), np.isnan(ref))
    np.testing.assert_allclose(np.nan_to_num(m), np.nan_to_num(ref))


def test_negative_and_exponent_formats(tmp_path):
    m = _roundtrip(tmp_path, "-1.25,+2.5,1e-3\n-1E+4,0.0,-0\n")
    np.testing.assert_allclose(
        m, [[-1.25, 2.5, 1e-3], [-1e4, 0.0, 0.0]])
