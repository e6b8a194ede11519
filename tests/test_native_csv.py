"""Native C++ CSV parser tests (fcsr_tpu/native/fast_csv.cpp): built via
g++ at first use, cross-checked against pandas."""

import numpy as np
import pytest

from fcsr_tpu.native import fast_csv_available, read_csv_float32

pytestmark = pytest.mark.skipif(not fast_csv_available(),
                                reason="g++ toolchain unavailable")


def _write_csv(path, arr, id_col=None, nan_at=None):
    import pandas as pd
    df = pd.DataFrame(np.asarray(arr, dtype=np.float64))
    if nan_at is not None:
        df.iloc[nan_at] = np.nan
    if id_col is not None:
        df.insert(0, id_col, range(len(df)))
    df.to_csv(path, index=False)


def test_matches_pandas(rng, tmp_path):
    arr = rng.random((13, 37)).astype(np.float32)
    p = tmp_path / "plain.csv"
    _write_csv(p, arr, nan_at=(2, 5))
    got = read_csv_float32(str(p), skip_first_col=False)
    want = arr.copy()
    want[2, 5] = 0.0
    assert got.shape == (13, 37)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_skips_id_column(rng, tmp_path):
    arr = rng.random((5, 8)).astype(np.float32)
    p = tmp_path / "with_id.csv"
    _write_csv(p, arr, id_col="ID")
    got = read_csv_float32(str(p), skip_first_col=True)
    assert got.shape == (5, 8)
    np.testing.assert_allclose(got, arr, atol=1e-6)


def test_io_layer_uses_native(rng, tmp_path):
    from fcsr_tpu.data.io import load_csv_vectors
    arr = rng.random((4, 10)).astype(np.float32)
    p = tmp_path / "vec.csv"
    _write_csv(p, arr, id_col="ID", nan_at=(1, 2))
    got = load_csv_vectors(str(p))
    want = arr.copy()
    want[1, 2] = 0.0
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_large_roundtrip_speed(rng, tmp_path):
    """Sanity: parses a realistically sized table (167 x 35778) correctly;
    also serves as a smoke perf check vs pandas."""
    import time
    import pandas as pd
    arr = rng.random((167, 1000)).astype(np.float32)
    p = tmp_path / "big.csv"
    _write_csv(p, arr)
    t0 = time.perf_counter()
    got = read_csv_float32(str(p), skip_first_col=False)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    want = pd.read_csv(p).to_numpy(dtype=np.float32)
    t_pandas = time.perf_counter() - t0
    np.testing.assert_allclose(got, want, atol=1e-6)
    # don't assert on timing (CI variance); just record shapes
    assert got.shape == (167, 1000)


def test_trailing_empty_and_nan_fields(tmp_path):
    """Empty/NaN fields -> 0, INCLUDING a trailing empty field: an
    unbounded strtod skips the newline as whitespace and silently pulls
    the next row's first value into this row (found by review,
    reproduced on the built library before the fix)."""
    p = tmp_path / "t.csv"
    p.write_text("a,b,c\n1,2,\n9,8,7\n,nan,5\n")
    got = read_csv_float32(str(p), skip_first_col=False)
    want = np.array([[1, 2, 0], [9, 8, 7], [0, 0, 5]], np.float32)
    np.testing.assert_array_equal(got, want)

    # and pandas (the documented fallback semantics) agrees
    import pandas as pd
    ref = np.nan_to_num(pd.read_csv(p).to_numpy(np.float32), nan=0.0)
    np.testing.assert_array_equal(ref, want)
