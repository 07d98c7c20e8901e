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


# ---------------------------------------------------------------------------
# Gate-cap rotation invariant (VERDICT r4 "what's wrong" #1): the driver
# verifies only the first _DRIVER_GATE_CAP queries() entries, so the
# rotation must guarantee no query's driver verdict ages silently. These
# tests run against the REAL registry and the REAL committed
# CORRECTNESS_r*.json artifacts — they fail the moment a rotated-out query
# was not green in the most recent driver run, which is exactly the gap
# the hand-maintained tail tuple allowed for two rounds.
# ---------------------------------------------------------------------------

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _registry():
    import __spark_entry__ as entry

    return entry, list(entry.queries())


def test_tail_only_most_recent_green():
    entry, names = _registry()
    last = entry._last_driver_green()
    assert last, "no CORRECTNESS_r*.json artifacts found"
    latest = max(last.values())
    tail = names[entry._DRIVER_GATE_CAP:]
    for n in tail:
        assert n not in entry._CHANGED_THIS_ROUND, (
            f"{n} changed this round but sits outside the driver gate cap"
        )
        assert last.get(n, 0) == latest, (
            f"{n} rotated out with last driver verdict r{last.get(n, 0)} "
            f"(most recent driver run is r{latest})"
        )


def test_head_is_stalest_first():
    entry, names = _registry()
    last = entry._last_driver_green()
    staleness = [
        0 if n in entry._CHANGED_THIS_ROUND else last.get(n, 0) for n in names
    ]
    assert staleness == sorted(staleness), "registry is not stalest-first"


def test_stale_set_fits_in_cap():
    # If this ever fails, a 50-entry head can no longer cover everything
    # stale/changed and the rotation strategy itself must be rethought —
    # fail loudly instead of silently aging a verdict by 2+ rounds.
    entry, names = _registry()
    last = entry._last_driver_green()
    latest = max(last.values())
    stale = [
        n for n in names
        if n in entry._CHANGED_THIS_ROUND or last.get(n, 0) < latest
    ]
    assert len(stale) <= entry._DRIVER_GATE_CAP, (
        f"{len(stale)} stale/changed queries exceed the {entry._DRIVER_GATE_CAP}-cap"
    )


def test_every_query_has_oracle_or_is_declared():
    entry, names = _registry()
    oracles = entry.oracle_sql()
    missing = [n for n in names if n not in oracles]
    assert missing == [], f"queries without an oracle_sql entry: {missing}"
