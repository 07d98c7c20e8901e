"""Event-time tumbling-window aggregation with watermarked late-data bounds.

The reference itself needs no event-time windows — a single change-stream
cursor is totally ordered, so "late data" cannot exist (SURVEY.md §2.6
"Streaming-only"). A distributed micro-batch ingest DOES see late and
out-of-order events, and the north_star mandates the Structured Streaming
treatment: watermarks + windowed aggregates. This module is that operator,
shared by both paths:

- **batch**: a plain `groupBy(window(ts), keys)` — Catalyst hash aggregate
  with map-side partial combine; the window bucket is a projection, so no
  extra shuffle beyond the aggregation's own.
- **streaming**: the same plan under `withWatermark` — Spark keeps per-window
  state only until `watermark` lags past the window end, bounding state for
  an unbounded stream (late events inside the bound still count; beyond it
  they are dropped, which is the documented trade).

One function builds both plans so tests can assert stream==batch equality
on a drained log — the same golden strategy the engine uses for the merge
path (oracle replay equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_windows(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = None,
    keys: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Gap-based sessionization: consecutive events of the same key belong
    to one session while each is within `gap` of the previous (boundary is
    inclusive — an event exactly `gap` after the last still merges, per
    Spark's session-window interval semantics, probed and pinned by
    tests/test_streaming.py). The training-data staple for turning raw
    event logs into per-user behavioural sessions.

    Catalyst-native `session_window`: a hash aggregate whose windows merge
    within each key partition — one shuffle on the keys, map-side partial
    merge, no Python and no self-join (the gaps-and-islands SQL this
    replaces needs a full sort window + running sum; the DuckDB oracle in
    __spark_entry__.py IS that formulation, checking the two agree).
    Under `watermark`, the same plan runs in Structured Streaming with
    state bounded to open sessions younger than the watermark.

    Output: *keys, session_start, session_end (last event + gap),
    n_events. session_end is the Spark convention — the instant the
    session would have expired."""
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *keys,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def tumbling_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str | None = None,
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Events per (tumbling window, *keys).

    `watermark` (e.g. "2 minutes") is required for append-mode streaming
    sinks — it is the late-data bound; leave None for batch use. Output
    columns: window_start, window_end, *keys, events.
    """
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window)
    return (
        df.groupBy(win.alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "events",
        )
    )
