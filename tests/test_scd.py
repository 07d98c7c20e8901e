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

from kafka_mongo_watcher_spark.operators.scd import (
    asof_join,
    scd2_apply,
    scd2_apply_full,
    scd2_history,
)


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


# ---------------------------------------------------------------------------
# deletes + incremental maintenance (scd2_apply)
# ---------------------------------------------------------------------------


def test_scd2_delete_closes_without_consuming_version(spark):
    rows = [
        # key 1: A, delete, delete(redelivered), B  -> v1 closed at 20, v2 open
        (1, 10, 1, "A", False),
        (1, 20, 2, None, True),
        (1, 25, 3, None, True),
        (1, 40, 4, "B", False),
        # key 2: delete-only stream -> nothing emitted
        (2, 10, 5, None, True),
        # key 3: A, delete -> one closed row, no current row
        (3, 10, 6, "A", False),
        (3, 30, 7, None, True),
    ]
    df = spark.createDataFrame(rows, "k int, t int, eid int, a string, del boolean")
    hist = scd2_history(
        df, key_cols=["k"], order_col="t", attr_cols=["a"],
        tie_breakers=["eid"], delete_col="del",
    )
    got = {(r["k"], r["version"]): r.asDict() for r in hist.collect()}
    assert set(got) == {(1, 1), (1, 2), (3, 1)}  # contiguous versions, no key 2
    assert got[(1, 1)]["valid_to"] == 20 and got[(1, 1)]["is_current"] is False
    assert got[(1, 2)]["a"] == "B" and got[(1, 2)]["is_current"] is True
    assert got[(1, 2)]["version"] == 2  # delete run consumed no version
    assert got[(3, 1)]["valid_to"] == 30 and got[(3, 1)]["is_current"] is False


def test_scd2_apply_matches_full_recompute_basic(spark):
    all_rows = [
        (1, 10, 1, "A"), (1, 20, 2, "A"), (1, 30, 3, "B"),
        (2, 15, 4, "X"),
        (1, 40, 5, "B"), (1, 50, 6, "C"),     # batch 2: extend + change
        (2, 45, 7, "X"),                       # batch 2: extend
        (3, 42, 8, "N"),                       # batch 2: brand-new key
    ]
    schema = "k int, t int, eid int, a string"
    full = spark.createDataFrame(all_rows, schema)
    b1 = spark.createDataFrame(all_rows[:4], schema)
    b2 = spark.createDataFrame(all_rows[4:], schema)
    kw = dict(key_cols=["k"], order_col="t", attr_cols=["a"], tie_breakers=["eid"])
    expect = {tuple(sorted(r.asDict().items())) for r in scd2_history(full, **kw).collect()}
    inc = scd2_apply_full(scd2_history(b1, **kw), b2, **kw)
    got = {tuple(sorted(r.asDict().items())) for r in inc.collect()}
    assert got == expect


def test_scd2_apply_delta_touches_only_affected_rows(spark):
    schema = "k int, t int, eid int, a string"
    b1 = spark.createDataFrame(
        [(1, 10, 1, "A"), (1, 20, 2, "B"), (2, 10, 3, "X"), (9, 5, 4, "Z")], schema
    )
    b2 = spark.createDataFrame([(1, 30, 5, "C")], schema)
    kw = dict(key_cols=["k"], order_col="t", attr_cols=["a"], tie_breakers=["eid"])
    delta = scd2_apply(scd2_history(b1, **kw), b2, **kw).collect()
    # key 2 / key 9 untouched; key 1 -> close v2, open v3
    assert {(r["k"], r["version"]) for r in delta} == {(1, 2), (1, 3)}
    d = {r["version"]: r.asDict() for r in delta}
    assert d[2]["valid_to"] == 30 and d[2]["is_current"] is False
    assert d[3]["a"] == "C" and d[3]["is_current"] is True and d[3]["n_events"] == 1


def test_scd2_apply_reopens_deleted_key_at_next_version(spark):
    schema = "k int, t int, eid int, a string, del boolean"
    b1 = spark.createDataFrame([(1, 10, 1, "A", False), (1, 20, 2, None, True)], schema)
    b2 = spark.createDataFrame([(1, 50, 3, "B", False)], schema)
    kw = dict(
        key_cols=["k"], order_col="t", attr_cols=["a"],
        tie_breakers=["eid"], delete_col="del",
    )
    hist1 = scd2_history(b1, **kw)
    delta = scd2_apply(hist1, b2, **kw).collect()
    assert {(r["k"], r["version"]) for r in delta} == {(1, 2)}  # v1 row untouched
    (row,) = delta
    assert row["a"] == "B" and row["valid_from"] == 50 and row["is_current"] is True


def test_scd2_apply_redelivered_delete_is_noop(spark):
    schema = "k int, t int, eid int, a string, del boolean"
    b1 = spark.createDataFrame([(1, 10, 1, "A", False), (1, 20, 2, None, True)], schema)
    b2 = spark.createDataFrame([(1, 30, 3, None, True)], schema)
    kw = dict(
        key_cols=["k"], order_col="t", attr_cols=["a"],
        tie_breakers=["eid"], delete_col="del",
    )
    assert scd2_apply(scd2_history(b1, **kw), b2, **kw).count() == 0


def test_scd2_apply_on_late_policies(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    schema = "k int, t int, eid int, a string"
    b1 = spark.createDataFrame([(1, 10, 1, "A"), (1, 20, 2, "B")], schema)
    late = spark.createDataFrame([(1, 15, 3, "C"), (1, 30, 4, "D")], schema)
    kw = dict(key_cols=["k"], order_col="t", attr_cols=["a"], tie_breakers=["eid"])
    hist = scd2_history(b1, **kw)
    with pytest.raises(SparkRuntimeException, match="not later than the stored resume point"):
        scd2_apply(hist, late, **kw).collect()
    got = {r["version"]: r.asDict() for r in
           scd2_apply(hist, late, on_late="drop", **kw).collect()}
    # t=15 dropped; t=30 opens v3 normally
    assert set(got) == {2, 3} and got[3]["a"] == "D"


def test_scd2_apply_convergence_property(spark):
    """Any batch cut of a random stream (with deletes) folds to the same
    table as one full recompute — versions, intervals, counts, everything.
    Mirrors the patch-stream convergence property test."""
    import random

    rng = random.Random(7)
    schema = "k int, t int, eid int, a string, del boolean"
    kw = dict(
        key_cols=["k"], order_col="t", attr_cols=["a"],
        tie_breakers=["eid"], delete_col="del",
    )
    for trial in range(3):
        rows = []
        for eid in range(120):
            k = rng.randrange(6)
            rows.append((k, eid * 3 + rng.randrange(3), eid,
                         rng.choice(["A", "B", "C", None]),
                         rng.random() < 0.15))
        rows.sort(key=lambda r: (r[1], r[2]))
        cuts = sorted(rng.sample(range(1, 119), rng.randrange(1, 4)))
        bounds = [0, *cuts, 120]
        batches = [rows[bounds[i]:bounds[i + 1]] for i in range(len(bounds) - 1)]
        table = scd2_history(spark.createDataFrame(batches[0], schema), **kw)
        for b in batches[1:]:
            if not b:
                continue
            table = scd2_apply_full(
                table, spark.createDataFrame(b, schema), on_late="drop", **kw
            )
        # Sequential oracle for which rows the drop policy admits: the
        # per-key resume point is the last kept LIVE event's t, or the
        # FIRST delete t while deleted (re-deliveries don't advance it);
        # the guard compares against the resume as of the batch start.
        resume: dict = {}
        kept = []
        for bi, b in enumerate(batches):
            start = dict(resume)
            for k, t, eid, a, dl in b:
                if bi > 0:
                    st = start.get(k)
                    if st is not None and t <= st[1]:
                        continue
                kept.append((k, t, eid, a, dl))
                cur = resume.get(k)
                if dl:
                    if cur is None or cur[0] == "live":
                        resume[k] = ("del", t)
                else:
                    resume[k] = ("live", t)
        expect = {
            tuple(sorted(r.asDict().items()))
            for r in scd2_history(spark.createDataFrame(kept, schema), **kw).collect()
        }
        got = {tuple(sorted(r.asDict().items())) for r in table.collect()}
        assert got == expect, f"trial {trial} diverged"


def test_scd2_apply_plan_no_smj_and_bounded_exchanges(spark):
    schema = "k int, t int, eid int, a string"
    b1 = spark.createDataFrame([(1, 10, 1, "A"), (2, 10, 2, "B")], schema)
    b2 = spark.createDataFrame([(1, 30, 3, "C")], schema)
    kw = dict(key_cols=["k"], order_col="t", attr_cols=["a"], tie_breakers=["eid"])
    delta = scd2_apply(scd2_history(b1, **kw), b2, **kw)
    plan = _plan(delta)
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # semi prune of the history
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 3
