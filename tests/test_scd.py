"""Type-2 SCD history + as-of join (operators/scd.py).

Reference consumers rebuild point-in-time state from the watcher's event
feed (/root/reference/internal/app/watcher.go emits every change); these
tests pin the Spark-side materialization: change-collapse semantics,
half-open validity intervals, as-of tie rules, and the one-shuffle/no-join
plan shape both operators promise for 100 TB inputs.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from kafka_mongo_watcher_spark.operators.scd import asof_join, scd2_history


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def stream(spark):
    rows = [
        # key 1: A A B B A -> 3 versions (change-collapse, reopen same value)
        (1, 10, 1, "A", 1.0),
        (1, 20, 2, "A", 2.0),
        (1, 30, 3, "B", 3.0),
        (1, 40, 4, "B", 4.0),
        (1, 50, 5, "A", 5.0),
        # key 2: single event -> one open version
        (2, 15, 6, "X", 9.0),
        # key 3: NULL NULL Y -> null run collapses, null-safe change detect
        (3, 10, 7, None, 1.0),
        (3, 20, 8, None, 1.0),
        (3, 30, 9, "Y", 1.0),
        # key 4: same-instant tie broken by eid: at t=10 eid 11 wins ordering
        (4, 10, 10, "P", 0.0),
        (4, 10, 11, "Q", 0.0),
        (4, 20, 12, "Q", 0.0),
    ]
    return spark.createDataFrame(rows, "k int, t int, eid int, a string, v double")


def test_scd2_change_collapse_and_intervals(stream):
    hist = scd2_history(
        stream, key_cols=["k"], order_col="t", attr_cols=["a"], tie_breakers=["eid"]
    )
    got = {
        (r["k"], r["version"]): r.asDict()
        for r in hist.collect()
    }
    # key 1: three versions with half-open [from, to) chaining
    assert got[(1, 1)]["a"] == "A" and got[(1, 1)]["valid_from"] == 10
    assert got[(1, 1)]["valid_to"] == 30 and got[(1, 1)]["n_events"] == 2
    assert got[(1, 2)]["a"] == "B" and got[(1, 2)]["valid_to"] == 50
    assert got[(1, 3)]["a"] == "A" and got[(1, 3)]["valid_to"] is None
    assert got[(1, 3)]["is_current"] is True and got[(1, 1)]["is_current"] is False
    # key 2: single open version
    assert got[(2, 1)]["is_current"] and got[(2, 1)]["n_events"] == 1
    # key 3: the NULL run is ONE version (null-safe compare), then Y
    assert got[(3, 1)]["a"] is None and got[(3, 1)]["n_events"] == 2
    assert got[(3, 2)]["a"] == "Y" and got[(3, 2)]["version"] == 2
    # key 4: tie at t=10 ordered by eid -> P then Q; Q run spans eid 11+12
    assert got[(4, 1)]["a"] == "P" and got[(4, 1)]["n_events"] == 1
    assert got[(4, 2)]["a"] == "Q" and got[(4, 2)]["n_events"] == 2
    # exactly one open version per key
    current = [k for (k, _), r in got.items() if r["is_current"]]
    assert sorted(current) == [1, 2, 3, 4]


def test_scd2_multi_attr_change_detection(stream):
    hist = scd2_history(
        stream,
        key_cols=["k"],
        order_col="t",
        attr_cols=["a", "v"],
        tie_breakers=["eid"],
    )
    k1 = sorted(
        (r["version"], r["a"], r["v"])
        for r in hist.filter(F.col("k") == 1).collect()
    )
    # v changes on every key-1 event, so nothing collapses: 5 versions
    assert len(k1) == 5
    # key 3: a stays NULL twice while v stays 1.0 -> still collapses
    k3 = hist.filter(F.col("k") == 3).count()
    assert k3 == 2


def test_scd2_plan_one_exchange_no_join(stream):
    hist = scd2_history(
        stream, key_cols=["k"], order_col="t", attr_cols=["a"], tie_breakers=["eid"]
    )
    plan = _plan(hist)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


@pytest.fixture(scope="module")
def asof_case(spark, stream):
    probes = spark.createDataFrame(
        [(1, 35, "p1"), (1, 5, "p2"), (1, 30, "p3"), (2, 100, "p4"), (9, 50, "p5")],
        "k int, pt int, tag string",
    )
    return probes, stream.select("k", "t", "eid", "a")


def test_asof_join_matches_and_left_semantics(asof_case):
    probes, build = asof_case
    out = asof_join(
        probes,
        build,
        key_cols=["k"],
        probe_time="pt",
        build_time="t",
        value_cols=["a", "eid"],
        build_tie="eid",
    )
    got = {r["tag"]: r.asDict() for r in out.collect()}
    assert len(got) == 5  # output rows == probe rows, always
    assert got["p1"]["matched_time"] == 30 and got["p1"]["matched_a"] == "B"
    # before any build row -> NULLs (left semantics)
    assert got["p2"]["matched_time"] is None and got["p2"]["matched_a"] is None
    # exact instant matches when allow_exact (default)
    assert got["p3"]["matched_time"] == 30 and got["p3"]["matched_eid"] == 3
    assert got["p4"]["matched_a"] == "X"
    # key absent from build entirely -> NULLs
    assert got["p5"]["matched_a"] is None


def test_asof_join_strict_excludes_same_instant(asof_case):
    probes, build = asof_case
    out = asof_join(
        probes,
        build,
        key_cols=["k"],
        probe_time="pt",
        build_time="t",
        value_cols=["a"],
        build_tie="eid",
        allow_exact=False,
    )
    got = {r["tag"]: r.asDict() for r in out.collect()}
    # p3 at t=30 must now see the t=20 row instead of the t=30 one
    assert got["p3"]["matched_time"] == 20 and got["p3"]["matched_a"] == "A"
    assert got["p1"]["matched_time"] == 30  # strictly-before unaffected


def test_asof_join_same_instant_tie_takes_max_tie(spark):
    build = spark.createDataFrame(
        [(4, 10, 10, "P"), (4, 10, 11, "Q")], "k int, t int, eid int, a string"
    )
    probes = spark.createDataFrame([(4, 10, "x")], "k int, pt int, tag string")
    out = asof_join(
        probes,
        build,
        key_cols=["k"],
        probe_time="pt",
        build_time="t",
        value_cols=["a", "eid"],
        build_tie="eid",
    ).collect()[0]
    assert out["matched_eid"] == 11 and out["matched_a"] == "Q"


def test_asof_join_plan_one_exchange_no_join(asof_case):
    probes, build = asof_case
    out = asof_join(
        probes,
        build,
        key_cols=["k"],
        probe_time="pt",
        build_time="t",
        value_cols=["a"],
        build_tie="eid",
    )
    plan = _plan(out)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_asof_join_brute_force_differential(spark):
    """Randomized differential: union-window result == per-probe brute force."""
    import random

    rng = random.Random(42)
    build_rows = [
        (k, rng.randrange(0, 100), i, f"v{i}")
        for i, k in enumerate(rng.choices(range(6), k=120))
    ]
    probe_rows = [
        (rng.randrange(0, 8), rng.randrange(0, 110), f"p{i}") for i in range(60)
    ]
    build = spark.createDataFrame(build_rows, "k int, t int, eid int, a string")
    probes = spark.createDataFrame(probe_rows, "k int, pt int, tag string")
    got = {
        r["tag"]: (r["matched_time"], r["matched_eid"])
        for r in asof_join(
            probes,
            build,
            key_cols=["k"],
            probe_time="pt",
            build_time="t",
            value_cols=["eid"],
            build_tie="eid",
        ).collect()
    }
    for k, pt, tag in probe_rows:
        cands = [(t, eid) for (bk, t, eid, _) in build_rows if bk == k and t <= pt]
        want = max(cands) if cands else (None, None)
        assert got[tag] == want, (tag, got[tag], want)
