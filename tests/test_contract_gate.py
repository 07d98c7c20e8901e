"""The local contract gate must be at least as strict as the driver's
(VERDICT r3 item 3 / What's-wrong #4): the three r3 driver failures shipped
because tools/check_contract.py canonicalized floats to 9 significant digits
and str()'d list cells. These tests pin the strict behavior with the exact
failure shapes from CORRECTNESS_r03.json — no Spark session needed."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_contract import canon, compare_frames, rowset  # noqa: E402


def test_equal_frames_pass():
    a = pd.DataFrame({"k": ["a", "b"], "n": np.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"n": np.array([2, 1], dtype="int64"), "k": ["b", "a"]})
    assert compare_frames("q", a, b) is None


def test_int_vs_float_dtype_fails():
    # cdc_pipeline_group_stage r3: Spark int64 163 vs DuckDB HUGEINT->float64 163.0
    sp = pd.DataFrame({"uid_sum": np.array([163], dtype="int64")})
    du = pd.DataFrame({"uid_sum": np.array([163.0], dtype="float64")})
    err = compare_frames("q", sp, du)
    assert err is not None and "dtype mismatch" in err


def test_list_column_fails_not_crashes():
    # cdc_pipeline_expr_hof r3: raw array<string> column crashed the driver canon
    sp = pd.DataFrame({"caps3": [["A", "B"], ["C"]]})
    du = pd.DataFrame({"caps3": [["A", "B"], ["C"]]})
    err = compare_frames("q", sp, du)
    assert err is not None and "unhashable" in err


def test_float_exact_not_9_sig_digits():
    # differs only in the 12th significant digit — old gate's %.9g passed this
    x, y = 1.23456789012, 1.23456789013
    assert f"{x:.9g}" == f"{y:.9g}"  # the old gate's blind spot
    sp = pd.DataFrame({"v": np.array([x])})
    du = pd.DataFrame({"v": np.array([y])})
    err = compare_frames("q", sp, du)
    assert err is not None and "values differ" in err


def test_float_bitwise_canon():
    assert canon(1.5) == canon(np.float64(1.5))
    assert canon(float("nan")) == "nan"
    assert canon(None) == canon(pd.NaT)


def test_rowset_order_insensitive():
    df1 = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    df2 = pd.DataFrame({"a": [2, 1], "b": ["y", "x"]})
    assert rowset(df1) == rowset(df2)


def test_bool_vs_int_dtype_fails():
    sp = pd.DataFrame({"flag": np.array([True, False])})
    du = pd.DataFrame({"flag": np.array([1, 0], dtype="int64")})
    err = compare_frames("q", sp, du)
    assert err is not None and "dtype mismatch" in err


@pytest.mark.parametrize("bad", [[1, 2], (1, 2), {"k": 1}, np.array([1])])
def test_canon_rejects_containers(bad):
    with pytest.raises(TypeError):
        canon(bad)
