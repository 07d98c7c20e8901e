"""Structured Streaming apply: multi-epoch replay, checkpoint resume,
fencing under epoch replay (reference S4/S7/S8 resume semantics,
/root/reference/internal/mongo/watch_producer.go:43-104)."""

from kafka_mongo_watcher_spark.datagen import generate_events, write_event_log
from kafka_mongo_watcher_spark.oracle import oracle_rows
from kafka_mongo_watcher_spark.plans.lake import LakeTable
from kafka_mongo_watcher_spark.streaming.run import run_replay_stream

FINAL_COLS = ["repo", "path", "commit", "lang", "content_sha256"]


def _engine_state(table):
    return {tuple(r) for r in table.refresh().snapshot().select(*FINAL_COLS).collect()}


def test_streaming_replay_matches_oracle(spark, tmp_path):
    ev = generate_events(spark, 3000)
    rows = [r.asDict() for r in ev.collect()]
    write_event_log(ev, str(tmp_path / "log"), n_chunks=4)
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    stats = run_replay_stream(
        spark,
        log_dir=str(tmp_path / "log"),
        table_path=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    assert len([s for s in stats if not s.get("skipped")]) == 4  # one epoch per chunk file
    assert _engine_state(t) == oracle_rows(rows)


def test_resume_from_checkpoint(spark, tmp_path):
    """Stop after 2 committed epochs, restart with the same checkpoint:
    stream resumes after the token, final state equals the oracle, and no
    epoch is applied twice (FIXTURES.md §4.4)."""
    ev = generate_events(spark, 3000)
    rows = [r.asDict() for r in ev.collect()]
    write_event_log(ev, str(tmp_path / "log"), n_chunks=5)
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    kwargs = dict(
        log_dir=str(tmp_path / "log"),
        table_path=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    first = run_replay_stream(spark, stop_after_batches=2, **kwargs)
    committed_first = [s["epoch"] for s in first if not s.get("skipped")]
    assert len(committed_first) >= 2
    second = run_replay_stream(spark, **kwargs)
    committed_second = [s["epoch"] for s in second if not s.get("skipped")]
    # fencing + checkpoint: epochs never double-apply
    assert not (set(committed_first) & set(committed_second))
    assert _engine_state(t) == oracle_rows(rows)


def test_restart_after_completion_is_noop(spark, tmp_path):
    ev = generate_events(spark, 1000)
    write_event_log(ev, str(tmp_path / "log"), n_chunks=2)
    LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    kwargs = dict(
        log_dir=str(tmp_path / "log"),
        table_path=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    run_replay_stream(spark, **kwargs)
    t = LakeTable(spark, str(tmp_path / "t"))
    v = t.version
    stats = run_replay_stream(spark, **kwargs)  # drained log → no new epochs
    assert all(s.get("skipped") for s in stats)
    assert t.refresh().version == v


def test_message_stream_per_key_partition_ordering(spark, tmp_path):
    """Streaming message emission (K1 keyed produce as a lifecycle): same
    key lands in the same topic-partition every epoch, each (epoch,
    t_partition) file is sorted by (commit_seq, offset), and checkpoint
    replay never re-emits a committed epoch."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from kafka_mongo_watcher_spark.streaming.run import run_message_stream

    ev = generate_events(spark, 2500)
    write_event_log(ev, str(tmp_path / "log"), n_chunks=3)
    kwargs = dict(
        log_dir=str(tmp_path / "log"),
        out_dir=str(tmp_path / "msgs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_topic_partitions=4,
    )
    stats = run_message_stream(spark, **kwargs)
    assert [s["epoch"] for s in stats if not s.get("skipped")] == [0, 1, 2]

    msgs = spark.read.parquet(str(tmp_path / "msgs"))
    assert {"topic", "key", "value", "headers", "t_partition", "epoch"} <= set(msgs.columns)
    # key → exactly one t_partition across all epochs (Kafka hash contract)
    assert (
        msgs.groupBy("key")
        .agg(F.count_distinct("t_partition").alias("n"))
        .filter(F.col("n") > 1)
        .count()
        == 0
    )
    # total emission = all well-keyed events
    n_events = ev.filter(F.col("repo").isNotNull() & F.col("path").isNotNull()).count()
    assert msgs.count() == n_events

    # per-(epoch, t_partition) files are internally ordered
    for d in sorted(os.listdir(str(tmp_path / "msgs"))):
        if not d.startswith("epoch="):
            continue
        for p in sorted(os.listdir(str(tmp_path / "msgs" / d))):
            if not p.startswith("t_partition="):
                continue
            pdf = spark.read.parquet(str(tmp_path / "msgs" / d / p)).select(
                "commit_seq", "offset"
            ).toPandas()
            seqs = list(zip(pdf["commit_seq"], pdf["offset"]))
            assert seqs == sorted(seqs), (d, p)

    # fencing: wipe the checkpoint → epochs replay from 0 but committed
    # epoch dirs are skipped, nothing double-emitted
    shutil.rmtree(str(tmp_path / "ckpt"))
    stats2 = run_message_stream(spark, **kwargs)
    assert all(s.get("skipped") for s in stats2)
    assert spark.read.parquet(str(tmp_path / "msgs")).count() == n_events


def test_tumbling_window_stream_equals_batch(spark, tmp_path):
    """Event-time tumbling aggregation: the streaming plan over a drained
    file source equals the batch plan (complete mode), and append mode with
    a watermark emits only the windows the watermark closed — the bounded
    late-data semantics the north_star mandates."""
    import datetime as dt

    from pyspark.sql import functions as F

    from kafka_mongo_watcher_spark.streaming.windows import tumbling_event_counts

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=7 * i), ["a", "b"][i % 2])
        for i in range(40)
    ]
    src = str(tmp_path / "winsrc")
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    df.coalesce(2).write.parquet(src)

    batch = {
        (r["window_start"], r["event_type"]): r["events"]
        for r in tumbling_event_counts(
            spark.read.parquet(src), window="1 hour"
        ).collect()
    }
    assert sum(batch.values()) == 40 and len(batch) > 4

    stream = spark.readStream.schema(df.schema).parquet(src)
    agg = tumbling_event_counts(stream, window="1 hour", watermark="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start(checkpointLocation=str(tmp_path / "ck1"))
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["events"]
        for r in spark.sql("select * from win_complete").collect()
    }
    assert got == batch

    q2 = (
        agg.writeStream.format("memory")
        .queryName("win_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start(checkpointLocation=str(tmp_path / "ck2"))
    )
    q2.awaitTermination(120)
    emitted = {
        (r["window_start"], r["event_type"]): r["events"]
        for r in spark.sql("select * from win_append").collect()
    }
    # append emits only watermark-closed windows: a strict, correct subset
    assert emitted and set(emitted) < set(batch)
    assert all(batch[k] == v for k, v in emitted.items())
    # exactly the windows whose END the watermark passed: end <= max_ts - 30min
    max_ts = max(ts for _, ts, _ in rows)
    closed = {k for k in batch if k[0] + dt.timedelta(hours=1) <= max_ts - dt.timedelta(minutes=30)}
    assert set(emitted) == closed


def test_session_window_gap_boundary_and_stream_equals_batch(spark, tmp_path):
    """Gap-based sessionization (streaming/windows.py session_windows).

    1. Pins the merge boundary: an event exactly `gap` after the previous
       one MERGES (Spark session intervals are inclusive at the end
       instant); only a strictly larger gap opens a new session — the
       DuckDB oracle in __spark_entry__.py encodes exactly this (`> gap`).
    2. The streaming plan (complete mode, drained file source) equals the
       batch plan — same golden strategy as the tumbling-window test.
    """
    import datetime as dt

    from kafka_mongo_watcher_spark.streaming.windows import session_windows

    base = dt.datetime(2024, 1, 1)
    gap = dt.timedelta(minutes=30)
    rows = [
        # uid 1: second event exactly at gap -> ONE session of 2
        (1, base), (1, base + gap),
        # uid 2: second event 1s past gap -> TWO sessions
        (2, base), (2, base + gap + dt.timedelta(seconds=1)),
        # uid 3: a chain 10m apart -> ONE session of 3
        (3, base), (3, base + dt.timedelta(minutes=10)),
        (3, base + dt.timedelta(minutes=20)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in session_windows(df, gap="30 minutes").collect()
    }
    assert out[(1, base)] == (base + 2 * gap, 2)
    assert out[(2, base)] == (base + gap, 1)
    assert (2, base + gap + dt.timedelta(seconds=1)) in out
    assert out[(3, base)] == (base + dt.timedelta(minutes=20) + gap, 3)
    assert len(out) == 4

    src = str(tmp_path / "sessrc")
    df.coalesce(2).write.parquet(src)
    batch = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in session_windows(spark.read.parquet(src), gap="30 minutes").collect()
    }
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        session_windows(stream, gap="30 minutes", watermark="1 minute")
        .writeStream.format("memory")
        .queryName("sess_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start(checkpointLocation=str(tmp_path / "ck_sess"))
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in spark.sql("select * from sess_complete").collect()
    }
    assert got == batch


def test_dlq_quarantines_malformed_rows(spark, tmp_path):
    """Dead-letter sink (transformer.go:19-23 skip → auditable table):
    malformed events land in the DLQ with reasons, the merge sees only the
    valid side, and the final state still equals the oracle (the oracle
    drops malformed rows the same way the reference skips them)."""
    ev = generate_events(spark, 3000)  # ~1% malformed (null repo+path)
    rows = [r.asDict() for r in ev.collect()]
    write_event_log(ev, str(tmp_path / "log"), n_chunks=3)
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    run_replay_stream(
        spark,
        log_dir=str(tmp_path / "log"),
        table_path=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        dlq_dir=str(tmp_path / "dlq"),
    )
    dlq = spark.read.parquet(str(tmp_path / "dlq"))
    n_bad = sum(
        1 for r in rows
        if r["repo"] in (None, "") or r["path"] in (None, "")
    )
    assert n_bad > 0, "fixture must contain malformed rows"
    assert dlq.count() == n_bad
    reasons = {r.reject_reason for r in dlq.select("reject_reason").distinct().collect()}
    assert reasons == {"null_repo,null_path"}  # datagen nulls both together
    assert _engine_state(t) == oracle_rows(rows)
