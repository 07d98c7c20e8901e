"""Structured Streaming wrapper: tail the event log → MERGE per micro-batch.

This is the watch-mode lifecycle (SURVEY.md §3.1) re-expressed:
  readStream(event log)                    — S1 change-stream tail
  → transform_events (pandas-UDF pipeline) — F6/F7/F8/F9 Transformer stage
  → foreachBatch(apply)                    — K1 keyed produce ⇒ LWW MERGE
  → checkpointLocation                     — S4 resume tokens

Exactly-once: Spark replays an uncommitted epoch with identical data after a
crash; `LakeTable.merge` fences on (source_id, batch_id) and is itself an
idempotent LWW union, so re-delivery is a no-op — the Spark analog of the
reference's drain-before-close at-least-once producer upgraded to
exactly-once (/root/reference/internal/kafka/client.go:57-63).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from kafka_mongo_watcher_spark.operators.envelope import transform_events
from kafka_mongo_watcher_spark.plans.lake import LakeTable
from kafka_mongo_watcher_spark.sources.events import stream_event_log


def run_replay_stream(
    spark: SparkSession,
    *,
    log_dir: str,
    table_path: str,
    checkpoint_dir: str,
    source_id: str = "watch",
    max_files_per_trigger: int = 1,
    salted: bool = False,
    stop_after_batches: int | None = None,
    metrics_sink: list | None = None,
    handle_signals: bool = False,
) -> list:
    """Run the streaming apply until the log is drained (availableNow) or
    until `stop_after_batches` epochs committed (resume-test hook).
    Returns the per-batch merge stats (lineage + counts).

    `handle_signals=True` (CLI mode, main thread only) installs SIGINT/
    SIGTERM handlers that stop the query and return normally — the K5
    graceful-shutdown parity (/root/reference/cmd/watcher/main.go:41-51:
    signal → context cancel → producer drain → clean disconnect, exit 0).
    The Spark analog: query.stop() ends the stream; an epoch interrupted
    mid-merge is NOT in the manifest's applied map, so the next start
    replays it identically from the checkpoint (drain-before-close
    at-least-once, upgraded to exactly-once by batch-id fencing)."""
    stats: list = metrics_sink if metrics_sink is not None else []
    stop_requested = {"flag": False}

    def apply_batch(batch_df, epoch_id: int):
        table = LakeTable(spark, table_path)  # refresh snapshot pointer
        prepared = transform_events(batch_df, fingerprint=False)
        s = table.merge(
            prepared, source_id=source_id, batch_id=epoch_id, salted=salted
        )
        s["epoch"] = epoch_id
        stats.append(s)

    events = stream_event_log(spark, log_dir, max_files_per_trigger=max_files_per_trigger)
    q = (
        events.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    restore: dict = {}
    if handle_signals:
        import signal

        def _on_signal(signum, frame):  # noqa: ARG001
            stop_requested["flag"] = True
            try:
                q.stop()
            except Exception:  # noqa: BLE001 — already stopping/stopped
                pass

        for s in (signal.SIGINT, signal.SIGTERM):
            restore[s] = signal.signal(s, _on_signal)
    try:
        if stop_after_batches is None:
            try:
                q.awaitTermination()
            except Exception:
                # a signal-initiated stop can surface as a
                # StreamingQueryException from the interrupted epoch; that
                # epoch is uncommitted and will replay from the checkpoint
                if not stop_requested["flag"]:
                    raise
        else:
            import time

            while q.isActive:
                committed = len([s for s in stats if not s.get("skipped")])
                if committed >= stop_after_batches:
                    q.stop()
                    break
                time.sleep(0.05)
            q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()
        if restore:
            import signal

            for s, h in restore.items():
                signal.signal(s, h)
    return stats


def run_with_retries(
    fn,
    *,
    max_retries: int = 3,
    retry_delay: float = 1.0,
    sleep=None,
    on_retry=None,
):
    """S7 retry-with-backoff on stream open/run
    (/root/reference/internal/mongo/watch_producer.go:70-102: retry the
    cursor open up to maxRetries, sleeping retryDelay between attempts).

    `fn` is the stream runner (e.g. lambda: run_replay_stream(...)); a
    successful call's result is returned. After the final failed attempt the
    last error is re-raised (the reference logs-and-gives-up; a driver
    process exits non-zero either way). `sleep` is injectable for tests.
    Restart-from-checkpoint makes re-invoking `fn` safe: committed epochs
    are fenced, uncommitted ones replay identically (exactly-once).
    """
    import time as _time

    do_sleep = sleep if sleep is not None else _time.sleep
    attempt = 0
    while True:
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — any open/run failure retries
            if attempt >= max_retries:
                raise
            attempt += 1
            if on_retry is not None:
                on_retry(attempt, e)
            if retry_delay > 0:
                do_sleep(retry_delay)
