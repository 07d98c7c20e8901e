"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
set, and order-insensitive values.

Driver-strict since round 4 (VERDICT r3 item 3): both sides are materialized
as pandas frames; per-column dtype KIND must match (int vs float vs other —
the driver's value hash is dtype-sensitive, so DuckDB HUGEINT->float64 vs
Spark int64 is a FAIL here even when values are numerically equal); floats
compare by exact bit pattern (no 9-sig-digit rounding); and list/ndarray/dict
cells are rejected outright (the driver's canonicalizer crashes on them).

Usage: python tools/check_contract.py [sf_dir] [names...]
"""

from __future__ import annotations

import math
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from kafka_mongo_watcher_spark.session import spark_session  # noqa: E402

#: dtype.kind buckets that must match between the Spark and DuckDB frames.
#: 'i'/'u' collapse to int; bool stays distinct from int (Spark and DuckDB
#: both round-trip BOOLEAN as bool); datetimes collapse to 'M'.
_KIND = {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "datetime", "m": "timedelta"}


def _kind(dtype) -> str:
    return _KIND.get(getattr(dtype, "kind", "O"), "other")


def canon(v):
    """Exact canonical form: float by bit pattern, no rounding anywhere."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "nan"
        return struct.pack(">d", f).hex()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        raise TypeError(f"list-typed cell {type(v).__name__} — driver canon rejects these")
    if isinstance(v, np.generic):
        v = v.item()
    if v is pd.NaT or v != v:  # pandas NaT / NaN-likes in object columns
        return "\x00NULL"
    return str(v)


def rowset(df: pd.DataFrame):
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(canon(v) for v in row))
    out.sort()
    return out


def compare_frames(name: str, sp: pd.DataFrame, du: pd.DataFrame):
    """Return None if equal under driver-strict rules, else a failure string."""
    if sorted(sp.columns) != sorted(du.columns):
        return f"cols {sorted(sp.columns)} vs {sorted(du.columns)}"
    if len(sp) != len(du):
        return f"rows {len(sp)} vs {len(du)}"
    for c in sorted(sp.columns):
        ks, kd = _kind(sp[c].dtype), _kind(du[c].dtype)
        if ks != kd and "other" not in (ks, kd):
            return f"dtype mismatch on '{c}': spark {sp[c].dtype} ({ks}) vs duckdb {du[c].dtype} ({kd})"
    try:
        a, b = rowset(sp), rowset(du)
    except TypeError as e:
        return f"unhashable column: {e}"
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return f"values differ, e.g. {diff[:1]}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = spark_session(app_name="contract-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sp = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            # rows-only check, but still enforce hashable cells so the
            # driver's weaker gate cannot crash on this query either
            try:
                rowset(sp)
            except TypeError as e:
                failures.append((name, f"unhashable column: {e}"))
                print(f"FAIL {name}: {e}")
                continue
            print(f"ok?  {name}: rows={len(sp)} (no oracle — rows-only check)")
            continue
        try:
            du = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            continue
        err = compare_frames(name, sp, du)
        if err:
            failures.append((name, err))
            print(f"FAIL {name}: {err}")
        else:
            print(f"PASS {name}: rows={len(sp)}")
    print(f"\n{'ALL PASS' if not failures else f'{len(failures)} FAILURES'}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
