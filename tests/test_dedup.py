"""LWW dedup: window/row_number semantics + salted two-phase equivalence."""

from pyspark.sql import functions as F

from kafka_mongo_watcher_spark.datagen import generate_events
from kafka_mongo_watcher_spark.operators.dedup import lww_dedup, lww_dedup_salted

COLS = "partition_id int, offset bigint, op string, repo string, path string, commit_seq bigint, v string"


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def test_lww_picks_max_commit_seq(spark):
    rows = [
        (0, 1, "insert", "r", "p", 10, "a"),
        (0, 2, "update", "r", "p", 12, "b"),
        (0, 3, "update", "r", "p", 11, "c"),  # out-of-order arrival, older seq
        (1, 1, "insert", "r2", "p", 5, "d"),
    ]
    got = {(r["repo"], r["v"]) for r in lww_dedup(_df(spark, rows)).collect()}
    assert got == {("r", "b"), ("r2", "d")}


def test_delete_beats_earlier_update_within_batch(spark):
    rows = [
        (0, 1, "update", "r", "p", 10, "a"),
        (0, 2, "delete", "r", "p", 11, None),
    ]
    got = lww_dedup(_df(spark, rows)).collect()
    assert len(got) == 1 and got[0]["op"] == "delete"


def test_offset_tiebreak(spark):
    rows = [
        (0, 1, "update", "r", "p", 10, "lo"),
        (0, 9, "update", "r", "p", 10, "hi"),
    ]
    got = lww_dedup(_df(spark, rows)).collect()
    assert got[0]["v"] == "hi"


def test_salted_equals_unsalted_on_skewed_data(spark):
    ev = generate_events(spark, 4000, skew_pct=60).filter(F.col("repo").isNotNull())
    a = {tuple(r) for r in lww_dedup(ev).select("repo", "path", "commit_seq", "commit").collect()}
    for n_salts in (1, 4, 16):
        b = {
            tuple(r)
            for r in lww_dedup_salted(ev, n_salts=n_salts)
            .select("repo", "path", "commit_seq", "commit")
            .collect()
        }
        assert a == b, f"salted(n={n_salts}) diverged"


def test_semijoin_equals_window_on_generated_log(spark):
    from kafka_mongo_watcher_spark.operators.dedup import lww_dedup_semijoin

    ev = generate_events(spark, 4000, skew_pct=60).filter(F.col("repo").isNotNull())
    a = {tuple(r) for r in lww_dedup(ev).select("repo", "path", "commit_seq", "commit").collect()}
    b = {
        tuple(r)
        for r in lww_dedup_semijoin(ev).select("repo", "path", "commit_seq", "commit").collect()
    }
    assert a == b


def test_semijoin_basic_cases(spark):
    from kafka_mongo_watcher_spark.operators.dedup import lww_dedup_semijoin

    rows = [
        (0, 1, "insert", "r", "p", 10, "a"),
        (0, 2, "update", "r", "p", 12, "b"),
        (0, 3, "update", "r", "p", 11, "c"),
        (0, 4, "delete", "r2", "p", 5, None),
        (1, 1, "insert", "r2", "p", 4, "d"),
    ]
    got = {(r["repo"], r["op"]) for r in lww_dedup_semijoin(_df(spark, rows)).collect()}
    assert got == {("r", "update"), ("r2", "delete")}


def test_semijoin_exact_within_batch_duplicate_collapses(spark):
    """ADVICE r1: an exact duplicate delivery inside one micro-batch (same
    key AND same ordering tuple) must still yield ONE winner per key — merge
    assumes |winners| = 1/key."""
    from kafka_mongo_watcher_spark.operators.dedup import lww_dedup_semijoin

    rows = [
        (0, 2, "update", "r", "p", 12, "b"),
        (0, 2, "update", "r", "p", 12, "b"),  # exact duplicate delivery
        (0, 1, "insert", "r", "p", 10, "a"),
    ]
    got = lww_dedup_semijoin(_df(spark, rows)).collect()
    assert len(got) == 1 and got[0]["v"] == "b"


def test_semijoin_keeps_null_key_rows_like_window_path(spark):
    """ADVICE r1: null-safe join semantics — rows with null key columns must
    survive the semijoin path exactly as they do in the window path
    (drop_malformed=False callers)."""
    from kafka_mongo_watcher_spark.operators.dedup import lww_dedup_semijoin

    rows = [
        (0, 1, "insert", None, "p", 10, "a"),
        (0, 2, "update", None, "p", 11, "b"),
        (0, 3, "insert", "r", None, 12, "c"),
        (0, 4, "insert", "r", "p", 13, "d"),
    ]
    df = _df(spark, rows)
    win = {(r["repo"], r["path"], r["v"]) for r in lww_dedup(df).collect()}
    semi = {(r["repo"], r["path"], r["v"]) for r in lww_dedup_semijoin(df).collect()}
    assert semi == win == {(None, "p", "b"), ("r", None, "c"), ("r", "p", "d")}


def test_semijoin_with_precomputed_partition_tuples(spark):
    """merge feeds the semijoin its persisted (partition_id, key, ordering)
    tuple set; the extra partition column must be collapsed out (summing
    copy counts) so results — including exact-duplicate collapsing and a
    tuple redelivered under two partition_ids — match the window path."""
    from kafka_mongo_watcher_spark.operators.dedup import (
        key_order_tuples,
        lww_dedup_semijoin,
    )

    rows = [
        (0, 2, "update", "r", "p", 12, "b"),
        (0, 2, "update", "r", "p", 12, "b"),  # within-partition duplicate
        (1, 2, "update", "r", "p", 12, "b"),  # cross-partition duplicate
        (0, 1, "insert", "r", "p", 10, "a"),
        (0, 3, "insert", "r2", "p", 4, "c"),
    ]
    df = _df(spark, rows)
    tuples = key_order_tuples(df, extra_cols=("partition_id",)).persist()
    try:
        got = lww_dedup_semijoin(df, tuples=tuples).collect()
    finally:
        tuples.unpersist()
    per_key = {}
    for r in got:
        per_key.setdefault((r["repo"], r["path"]), []).append(r["v"])
    assert per_key == {("r", "p"): ["b"], ("r2", "p"): ["c"]}


def test_key_order_tuples_counts_copies(spark):
    from kafka_mongo_watcher_spark.operators.dedup import key_order_tuples

    rows = [
        (0, 2, "update", "r", "p", 12, "b"),
        (0, 2, "update", "r", "p", 12, "b"),
        (0, 1, "insert", "r", "p", 10, "a"),
    ]
    t = {
        (r["repo"], r["path"], r["commit_seq"], r["offset"]): r["_cnt"]
        for r in key_order_tuples(_df(spark, rows)).collect()
    }
    assert t == {("r", "p", 12, 2): 2, ("r", "p", 10, 1): 1}
