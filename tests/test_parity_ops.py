"""Reference-parity micro-ops: F3 variable substitution, S5 start position,
S7 retry-with-backoff, F5 column drop, O4 debug tap."""

import pytest
from pyspark.sql import functions as F

from kafka_mongo_watcher_spark.functions.variables import replace_variables
from kafka_mongo_watcher_spark.operators.envelope import (
    debug_tap,
    drop_update_description,
)
from kafka_mongo_watcher_spark.sources.events import (
    events_from_position,
    start_position,
)
from kafka_mongo_watcher_spark.streaming.run import run_with_retries

# ---- F3: %currentTimestamp% (variables/replace.go + replace_test.go) -------

FIXED_NOW = 1623175200  # 2021-06-08T18:00:00Z — the reference test's clock


def test_replace_variables_golden_cases():
    clock = lambda: FIXED_NOW  # noqa: E731 — deterministic-time seam
    assert replace_variables("", now=clock) == ""
    assert (
        replace_variables(
            '[ { "$match": { "date": { "$gt": "%currentTimestamp%" } } } ]', now=clock
        )
        == '[ { "$match": { "date": { "$gt": "1623175200000" } } } ]'
    )
    multi = (
        '[ { "$match": { "date": { "$gt": "%currentTimestamp%" } } }, '
        '{ "$match": { "end": { "$lt": "%currentTimestamp%" } } } ]'
    )
    out = replace_variables(multi, now=clock)
    assert out.count("1623175200000") == 2 and "%currentTimestamp%" not in out
    untouched = '[ { "$match": { "date": { "$gt": "1623175200000" } } } ]'
    assert replace_variables(untouched, now=clock) == untouched


def test_replace_variables_second_resolution():
    # now().Unix()*1000 — fractional seconds truncated, ms units
    assert replace_variables("%currentTimestamp%", now=lambda: 12.9) == "12000"


# ---- S5: start position precedence (service/mongo.go:68-82) ----------------

def test_start_position_explicit_T_beats_delay():
    assert start_position(at=1000, delay_seconds=60, now=lambda: 5000) == 1000


def test_start_position_delay_resolves_against_clock():
    assert start_position(delay_seconds=60, now=lambda: 5000) == 4940


def test_start_position_zero_values_fall_through():
    # T=0 / delay=0 are "unset" in the reference's switch
    assert start_position(at=0, delay_seconds=0) is None
    assert start_position() is None


def test_events_from_position_filters_inclusive(spark):
    df = spark.range(10).select(F.col("id").alias("commit_seq"))
    got = {r["commit_seq"] for r in events_from_position(df, 7).collect()}
    assert got == {7, 8, 9}
    assert events_from_position(df, None).count() == 10


# ---- S7: retry-with-backoff (watch_producer.go:70-102) ---------------------

def test_run_with_retries_succeeds_after_failures():
    calls, sleeps = [], []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("cursor open failed")
        return "ok"

    out = run_with_retries(flaky, max_retries=5, retry_delay=2.5, sleep=sleeps.append)
    assert out == "ok" and len(calls) == 3 and sleeps == [2.5, 2.5]


def test_run_with_retries_exhausts_and_raises():
    calls = []

    def dead():
        calls.append(1)
        raise RuntimeError("down")

    with pytest.raises(RuntimeError, match="down"):
        run_with_retries(dead, max_retries=3, retry_delay=0, sleep=lambda _: None)
    assert len(calls) == 4  # initial + 3 retries, the reference's loop shape


def test_run_with_retries_notifies_each_attempt():
    seen = []

    def dead():
        raise ValueError("x")

    with pytest.raises(ValueError):
        run_with_retries(
            dead, max_retries=2, retry_delay=0,
            sleep=lambda _: None, on_retry=lambda a, e: seen.append(a),
        )
    assert seen == [1, 2]


# ---- F5 + O4 ---------------------------------------------------------------

def test_drop_update_description(spark):
    df = spark.createDataFrame(
        [("r", "p", "delta")], "repo string, path string, update_description string"
    )
    out = drop_update_description(df)
    assert "update_description" not in out.columns
    # missing column is a no-op, not an error
    assert drop_update_description(out).columns == out.columns


def test_debug_tap_logs_and_passes_through(spark):
    df = spark.createDataFrame([("r", i) for i in range(25)], "repo string, n int")
    lines = []
    out = debug_tap(df, n=5, log=lines.append, label="t")
    assert out is df  # unchanged pipeline
    assert len(lines) == 5 and all(line.startswith("[t] ") for line in lines)
