"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
set, and order-insensitive values. Usage: python tools/check_contract.py [sf_dir] [names...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from kafka_mongo_watcher_spark.session import spark_session  # noqa: E402


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


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
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"cols {sorted(scols)} vs {sorted(dcols)}"))
            print(f"FAIL {name}: column mismatch {sorted(scols)} vs {sorted(dcols)}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rows {len(srows)} vs {len(drows)}"))
            print(f"FAIL {name}: row count {len(srows)} vs {len(drows)}")
            continue
        a, b = rowset(scols, srows), rowset(dcols, drows)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ, e.g. {diff[:1]}"))
            print(f"FAIL {name}: value mismatch; first diffs: {diff}")
        else:
            print(f"PASS {name}: rows={len(srows)}")
    print(f"\n{'ALL PASS' if not failures else f'{len(failures)} FAILURES'}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
