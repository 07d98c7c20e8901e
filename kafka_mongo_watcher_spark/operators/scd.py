"""Type-2 SCD history + as-of (point-in-time) lookup over a CDC stream.

The reference watcher ships every change event downstream
(/root/reference/internal/app/watcher.go — one message per oplog event);
consumers that want "what did the record look like at time T" must
reconstruct validity intervals themselves. This module materializes that
view Spark-side, the way a warehouse consumer of the Kafka topic would:

``scd2_history``
    Collapses a per-key ordered event stream into type-2 slowly-changing-
    dimension rows: one row per *run* of consecutive events whose tracked
    attributes are all equal, carrying ``valid_from`` / ``valid_to`` /
    ``is_current``.  Consecutive duplicates merge (a re-delivered event
    that changes nothing does not open a new version) — the standard SCD2
    change-collapse.

``asof_join``
    Point-in-time enrichment: for each probe row, the most recent build
    row at-or-before (or strictly-before) the probe instant, per key.

Scale shape
-----------
Both operators are ONE hash shuffle on the key columns and ZERO joins:

* ``scd2_history`` = window(lag + running sum) -> hash-agg -> window(lead),
  all clustered on ``key_cols``; Catalyst reuses the single Exchange for
  every stage (HashPartitioning(key) satisfies the window's distribution
  AND the group-by's ClusteredDistribution(key, version)).  Plan-guarded
  in tests/test_scd.py: exactly one Exchange, no Join.
* ``asof_join`` deliberately avoids the range-join formulation
  (``p.t >= b.t`` range predicates explode to per-key cross products at
  100 TB).  Instead it unions probe and build rows and takes
  ``last(value, ignorenulls=True)`` over a single key-partitioned window
  ordered by (time, side) — the classic time-series as-of shape (Flint,
  Pandas merge_asof).  One shuffle, no Join node, output size == probe
  size regardless of build-side row count per key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    order_col: str,
    attr_cols: Sequence[str],
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """Materialize a type-2 SCD table from an ordered CDC event stream.

    Every key's events are ordered by ``(order_col, *tie_breakers)``; a new
    version opens at the first event and whenever ANY column in
    ``attr_cols`` differs (null-safe) from the previous event's value.
    Runs of no-op events collapse into the version they extend.

    Returns one row per (key, version) with columns::

        *key_cols, version (bigint, 1-based per key),
        valid_from (order_col type), valid_to (NULL on the open version),
        is_current (boolean), *attr_cols

    ``valid_to`` is the next version's ``valid_from`` — the half-open
    interval convention ``[valid_from, valid_to)`` used by warehouse SCD2
    so point-in-time predicates never double-match a boundary instant.
    """
    key_cols = list(key_cols)
    attr_cols = list(attr_cols)
    ordering = [F.col(order_col), *[F.col(t) for t in tie_breakers]]
    w = Window.partitionBy(*key_cols).orderBy(*ordering)

    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    opens = F.when(F.row_number().over(w) == 1, F.lit(1)).otherwise(
        changed.cast("int")
    )
    versioned = df.withColumn(
        "version",
        F.sum(opens).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )

    # All rows in one (key, version) group carry identical attr values by
    # construction; min_by on the ordering tuple makes the pick order-stable
    # anyway (and well-defined for all-NULL attr runs).
    ord_struct = F.struct(*ordering)
    grouped = versioned.groupBy(*key_cols, "version").agg(
        F.min(order_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
        *[F.min_by(F.col(a), ord_struct).alias(a) for a in attr_cols],
    )

    w2 = Window.partitionBy(*key_cols).orderBy("version")
    return (
        grouped.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            *key_cols,
            "version",
            "valid_from",
            "valid_to",
            "is_current",
            "n_events",
            *attr_cols,
        )
    )


def asof_join(
    probes: DataFrame,
    build: DataFrame,
    *,
    key_cols: Sequence[str],
    probe_time: str,
    build_time: str,
    value_cols: Sequence[str],
    build_tie: str | None = None,
    allow_exact: bool = True,
    matched_prefix: str = "matched_",
) -> DataFrame:
    """As-of join: enrich each probe row with the latest build row per key.

    For every probe row, picks the build row with the greatest
    ``build_time`` <= ``probe_time`` (strictly < when ``allow_exact`` is
    False) sharing the probe's ``key_cols``, and appends that row's
    ``value_cols`` (renamed ``{matched_prefix}{col}``) plus
    ``{matched_prefix}time``.  Probes with no qualifying build row keep
    NULLs — LEFT as-of semantics, matching DuckDB ``ASOF LEFT JOIN``.

    When several build rows share one (key, build_time) instant the row
    with the greatest ``build_tie`` wins; pass a unique column (offset,
    event id) whenever build times can collide, or pre-dedupe the build
    side.

    Implementation: union probes and build rows, one window per key ordered
    by (time, side, tie) with build rows sorting before (``allow_exact``)
    or after (strict) probes at equal instants, then
    ``last(values, ignorenulls=True)`` over the unbounded-preceding frame.
    No Join node, one Exchange, output rows == probe rows.
    """
    key_cols = list(key_cols)
    value_cols = list(value_cols)

    probe_payload = [
        c for c in probes.columns if c not in key_cols and c != probe_time
    ]
    vals = F.struct(
        F.col(build_time).alias("_bt"),
        *[F.col(c) for c in value_cols],
    )
    build_side = build.select(
        *key_cols,
        F.col(build_time).alias("_t"),
        F.lit(0 if allow_exact else 1).alias("_side"),
        (F.col(build_tie) if build_tie is not None else F.lit(0)).alias("_tie"),
        vals.alias("_vals"),
        *[F.lit(None).alias(c) for c in [probe_time, *probe_payload]],
    )
    probe_side = probes.select(
        *key_cols,
        F.col(probe_time).alias("_t"),
        F.lit(1 if allow_exact else 0).alias("_side"),
        F.lit(None).alias("_tie"),
        F.lit(None).alias("_vals"),
        F.col(probe_time),
        *probe_payload,
    )
    unioned = build_side.unionByName(probe_side, allowMissingColumns=False)

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(
            F.col("_t").asc(),
            F.col("_side").asc(),
            F.col("_tie").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_probe = F.lit(1 if allow_exact else 0)
    filled = unioned.withColumn(
        "_m", F.last("_vals", ignorenulls=True).over(w)
    ).filter(F.col("_side") == is_probe)

    return filled.select(
        *key_cols,
        probe_time,
        *probe_payload,
        F.col("_m._bt").alias(f"{matched_prefix}time"),
        *[F.col(f"_m.{c}").alias(f"{matched_prefix}{c}") for c in value_cols],
    )
