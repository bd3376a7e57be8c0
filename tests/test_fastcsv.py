"""Native CSV reader: pandas parity on every shipped dataset file + speed."""

import glob
import os
import time

import numpy as np
import pandas as pd
import pytest

from hippie_tpu.data import fastcsv

DATA = "/root/reference/datasets"


def _all_numeric_csvs():
    out = []
    for name in ("waveforms.csv", "isi_dist.csv"):
        out.extend(sorted(glob.glob(os.path.join(DATA, "*", name))))
    return out


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference datasets absent")
def test_parity_with_pandas_on_all_shipped_files():
    assert fastcsv.available(), "native parser failed to build"
    files = _all_numeric_csvs()
    assert files
    for path in files:
        ours = fastcsv.read_numeric_csv(path)
        ref = pd.read_csv(path).to_numpy(dtype=np.float32)
        assert ours.shape == ref.shape, path
        np.testing.assert_array_equal(
            np.nan_to_num(ours, nan=1e30), np.nan_to_num(ref, nan=1e30), err_msg=path
        )


def test_empty_and_unparsable_fields(tmp_path):
    p = tmp_path / "x.csv"
    p.write_text(",a,b\n0,1.5,\n1,abc,2.25\n")
    arr = fastcsv.read_numeric_csv(str(p))
    assert arr.shape == (2, 3)
    np.testing.assert_allclose(arr[0], [0, 1.5, np.nan])
    assert np.isnan(arr[1, 1]) and arr[1, 2] == 2.25


def test_crlf_and_trailing_newline(tmp_path):
    p = tmp_path / "x.csv"
    p.write_bytes(b"h1,h2\r\n1,2\r\n3,4\r\n\n")
    arr = fastcsv.read_numeric_csv(str(p))
    np.testing.assert_allclose(arr, [[1, 2], [3, 4]])


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference datasets absent")
def test_faster_than_pandas():
    path = os.path.join(DATA, "neonatal-mouse-brain-slice", "waveforms.csv")
    fastcsv.read_numeric_csv(path)  # warm (build + page cache)
    t0 = time.perf_counter()
    for _ in range(3):
        fastcsv.read_numeric_csv(path)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        pd.read_csv(path).to_numpy(dtype=np.float32)
    t_pandas = time.perf_counter() - t0
    assert t_native < t_pandas, (t_native, t_pandas)


def test_long_rows_are_not_silently_truncated(tmp_path):
    """A row with MORE fields than the first data line must not be truncated
    with a clean parse: pandas raises ParserError for these, so the native
    path flags err=4 and read_numeric_csv falls through to pandas (which
    raises loudly) instead of training on corrupt data."""
    p = tmp_path / "long.csv"
    p.write_text("h0,h1,h2\n1,2,3\n4,5,6,7\n8,9,10\n")
    with pytest.raises(Exception):  # pandas ParserError via the fallback
        fastcsv.read_numeric_csv(str(p))


def test_skip_header_false_in_both_paths(tmp_path):
    """skip_header=False must keep the first row as data in the native AND
    the pandas-fallback path (the fallback used to always consume a header)."""
    p = tmp_path / "nohdr.csv"
    p.write_text("1,2\n3,4\n")
    want = np.array([[1, 2], [3, 4]], np.float32)
    np.testing.assert_array_equal(fastcsv.read_numeric_csv(str(p), skip_header=False), want)
    saved_lib, saved_tried = fastcsv._lib, fastcsv._tried
    try:
        fastcsv._lib, fastcsv._tried = None, True  # force the pandas fallback
        np.testing.assert_array_equal(
            fastcsv.read_numeric_csv(str(p), skip_header=False), want)
    finally:
        fastcsv._lib, fastcsv._tried = saved_lib, saved_tried
