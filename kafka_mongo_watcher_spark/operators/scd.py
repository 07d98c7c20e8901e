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

``scd2_apply``
    Incremental maintenance: fold a NEW batch of strictly-later events
    into an existing SCD2 table, touching only the keys the batch
    mentions.  Returns the upsert delta keyed ``(key, version)`` — the
    batch-driven equivalent of a warehouse MERGE into the dimension.
    Invariant (property-tested): folding any batch cut of a stream
    through ``scd2_apply`` reproduces ``scd2_history`` of the full
    stream exactly.

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
* ``scd2_apply`` never scans or shuffles the full history: the batch's
  key set is broadcast into a left-semi prune of the history (zero
  history Exchange), a hash-agg picks each touched key's max-version
  seed row, and the seed∪batch union — O(batch) rows — runs the same
  one-Exchange window/agg chain.  Cost per micro-batch is O(batch +
  touched-key seed rows) regardless of dimension size.
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


def _prep_events(
    df: DataFrame,
    *,
    key_cols: list[str],
    order_col: str,
    attr_cols: list[str],
    tie_breakers: Sequence[str],
    delete_col: str | None,
) -> DataFrame:
    """Normalize an event frame for SCD2 folding: project down to key /
    order / ties / attrs plus a ``_del`` flag, with attr values forced to
    NULL on delete rows so re-delivered deletes always collapse into one
    run regardless of whatever stale payload the delete event carried."""
    if delete_col is None:
        is_del = F.lit(False)
    else:
        is_del = F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
    return df.select(
        *key_cols,
        F.col(order_col),
        *[F.col(t) for t in tie_breakers],
        *[F.when(is_del, F.lit(None)).otherwise(F.col(a)).alias(a) for a in attr_cols],
        is_del.alias("_del"),
    )


def scd2_history(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    order_col: str,
    attr_cols: Sequence[str],
    tie_breakers: Sequence[str] = (),
    delete_col: str | None = None,
) -> DataFrame:
    """Materialize a type-2 SCD table from an ordered CDC event stream.

    Every key's events are ordered by ``(order_col, *tie_breakers)``; a new
    version opens at the first event and whenever ANY column in
    ``attr_cols`` differs (null-safe) from the previous event's value.
    Runs of no-op events collapse into the version they extend.

    ``delete_col`` (optional) names a boolean column marking delete
    events: a delete closes the key's open version at the delete's
    ``order_col`` instant (the closed row's ``valid_to``) and leaves the
    key with NO current row; a later event re-opens the key at the NEXT
    version number.  Delete runs are not emitted and do not consume
    version numbers — per key the emitted versions are always contiguous
    1..V, which is what lets ``scd2_apply`` continue numbering from the
    stored max version without replaying the deletes.

    Returns one row per (key, version) with columns::

        *key_cols, version (bigint, 1-based per key),
        valid_from (order_col type), valid_to (NULL on the open version),
        is_current (boolean), n_events, last_seen (max order folded),
        *attr_cols

    ``valid_to`` is the next version's ``valid_from`` — the half-open
    interval convention ``[valid_from, valid_to)`` used by warehouse SCD2
    so point-in-time predicates never double-match a boundary instant.
    """
    key_cols = list(key_cols)
    attr_cols = list(attr_cols)
    ev = _prep_events(
        df,
        key_cols=key_cols,
        order_col=order_col,
        attr_cols=attr_cols,
        tie_breakers=tie_breakers,
        delete_col=delete_col,
    )
    ordering = [F.col(order_col), *[F.col(t) for t in tie_breakers]]
    w = Window.partitionBy(*key_cols).orderBy(*ordering)

    # _del participates in change detection as a pseudo-attribute, so a
    # delete closes the run and the first post-delete event opens a new
    # one.  `_run` numbers every run (delete runs included — they must
    # form their own group so their instant can close the predecessor via
    # lead); `version` advances only on LIVE run opens, keeping emitted
    # versions contiguous per key.
    versioned = _number_runs(ev, w, attr_cols, seeded=False)
    return _finish_runs(versioned, key_cols, order_col, attr_cols, ordering)


def _number_runs(ev: DataFrame, w, attr_cols: list[str], *, seeded: bool) -> DataFrame:
    """Add `_run` (every change opens) and `version` (live changes open)
    running counters over the per-key window `w`.  With ``seeded`` the
    first row per key is an existing-state seed (contributes no opens and
    carries the stored version base in `_ver`); without, the first row
    always opens."""
    changed = F.lit(False)
    for a in [*attr_cols, "_del"]:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    if seeded:
        first_opens = F.when(F.col("_seed") == 1, F.lit(0)).otherwise(F.lit(1))
    else:
        first_opens = F.lit(1)
    opens = F.when(F.row_number().over(w) == 1, first_opens).otherwise(
        changed.cast("int")
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = ev.withColumn("_run", F.sum(opens).over(wrun))
    live_opens = F.when(F.col("_del"), F.lit(0)).otherwise(opens)
    version = F.sum(live_opens).over(wrun)
    if seeded:
        wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        base = F.coalesce(F.max("_ver").over(wall), F.lit(0))
        version = version + base
    return out.withColumn("version", version.cast("long"))


def _finish_runs(
    versioned: DataFrame,
    key_cols: list[str],
    order_col: str,
    attr_cols: list[str],
    ordering,
    n_col=None,
    from_col=None,
    last_col=None,
) -> DataFrame:
    """Shared tail of the batch and incremental folds: collapse rows into
    (key, _run) groups, chain half-open intervals with lead over run
    order, and drop delete runs (AFTER lead, so a delete's instant still
    closes its predecessor's interval).  All stages share one
    HashPartitioning(key_cols) Exchange — the group-by's
    ClusteredDistribution(key, _run) and both windows are satisfied by
    it."""
    n_expr = n_col if n_col is not None else F.lit(1)
    from_expr = from_col if from_col is not None else F.col(order_col)
    last_expr = last_col if last_col is not None else F.col(order_col)
    ord_struct = F.struct(*ordering)
    grouped = versioned.groupBy(*key_cols, "_run").agg(
        F.min("version").alias("version"),
        F.min(from_expr).alias("valid_from"),
        F.max(last_expr).alias("last_seen"),
        F.sum(n_expr).alias("n_events"),
        F.max(F.col("_del").cast("int")).alias("_gdel"),
        *[F.min_by(F.col(a), ord_struct).alias(a) for a in attr_cols],
    )
    w2 = Window.partitionBy(*key_cols).orderBy("_run")
    return (
        grouped.withColumn("valid_to", F.lead("valid_from").over(w2))
        .filter(F.col("_gdel") == 0)
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            *key_cols,
            "version",
            "valid_from",
            "valid_to",
            "is_current",
            F.col("n_events").cast("long").alias("n_events"),
            "last_seen",
            *attr_cols,
        )
    )


def scd2_apply(
    history: DataFrame,
    batch: DataFrame,
    *,
    key_cols: Sequence[str],
    order_col: str,
    attr_cols: Sequence[str],
    tie_breakers: Sequence[str] = (),
    delete_col: str | None = None,
    on_late: str = "raise",
    seed_tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Incrementally fold a batch of NEW events into an existing SCD2
    table (a frame with ``scd2_history``'s output schema) and return the
    **upsert delta**: every (key, version) row the batch created or
    changed.  MERGE the delta into the dimension store keyed
    ``(*key_cols, version)`` — rows are never deleted, only upserted.

    ``seed_tie_cols``: extra columns ranking DUPLICATE (key, version) rows
    in ``history`` — needed when the caller hands in an UNRESOLVED
    merge-on-read union where a version's superseded copies are still
    present (plans/scd2_store.py MOR mode stamps `_sc`, the store commit):
    the seed pick becomes argmax(version, *seed_tie_cols), so the latest
    copy of the max version wins without a pre-resolution shuffle.  With a
    resolved history (unique versions) it changes nothing.

    Invariant (property-tested in tests/test_scd.py): for any split of an
    event stream into batches B1..Bn where each batch's events are
    strictly later (per key) than the previous ones,
    ``scd2_apply_full(...scd2_apply_full(scd2_history(B1), B2)..., Bn)``
    equals ``scd2_history(B1 ∪ ... ∪ Bn)`` exactly — versions included,
    which is why delete runs don't consume version numbers.

    ``on_late`` polices the strictly-later precondition per key against
    the stored resume point (``last_seen`` of the open version, or the
    close instant of a deleted key): ``"raise"`` (default) fails the job
    from inside the plan (F.assert_true — no extra Spark job at call
    time), ``"drop"`` silently discards late events.  Re-deliveries of
    delete events to an already-deleted key collapse into the stored
    state and do not advance the resume point.

    Scale shape: the history is pruned with a broadcast LEFT SEMI join on
    the batch's distinct keys (no history shuffle; with a bucketed store,
    feed ``history`` already bucket-pruned), a hash-agg picks each
    touched key's max-version seed row, and the seed∪batch union — O(batch)
    rows — runs the same single-Exchange window/agg chain as
    ``scd2_history``.  Plan-guarded: no sort-merge join, ≤3 small
    exchanges, output rows ≈ changed dimension rows.

    Composition caveat: the returned delta's lazy plan re-references
    ``history``.  Joining it back against ``history``-derived frames in a
    single query can trip Spark's self-join attribute de-duplication on
    deeply nested plans (observed: silently re-based versions).  When you
    need both the delta AND the updated history in one query, materialize
    the delta first (``localCheckpoint()`` / write-then-read) — that is
    exactly what ``scd2_apply_full`` does.
    """
    if on_late not in ("raise", "drop"):
        raise ValueError(f"on_late must be 'raise' or 'drop', got {on_late!r}")
    key_cols = list(key_cols)
    attr_cols = list(attr_cols)
    ties = list(tie_breakers)

    ev = _prep_events(
        batch,
        key_cols=key_cols,
        order_col=order_col,
        attr_cols=attr_cols,
        tie_breakers=ties,
        delete_col=delete_col,
    )
    touched = batch.select(*key_cols).distinct()
    pruned = history.join(F.broadcast(touched), key_cols, "left_semi")

    # One seed row per touched key: the stored max-version row.  An open
    # seed (is_current) is an extendable live run; a closed one means the
    # key is in deleted state — modeled as a _del run so any new event
    # opens version base+1 and re-deliveries of the delete collapse.
    rank = F.struct(F.col("version"), *[F.col(c) for c in seed_tie_cols])
    picked = F.max_by(
        F.struct("valid_from", "valid_to", "is_current", "n_events", "last_seen", *attr_cols),
        rank,
    )
    seeds = pruned.groupBy(*key_cols).agg(
        F.max("version").alias("_ver"), picked.alias("_s")
    )
    closed = ~F.col("_s.is_current")
    resume = F.when(closed, F.col("_s.valid_to")).otherwise(F.col("_s.last_seen"))
    seed_side = seeds.select(
        *key_cols,
        resume.alias(order_col),
        *[F.lit(None).cast(batch.schema[t].dataType).alias(t) for t in ties],
        *[
            F.when(closed, F.lit(None)).otherwise(F.col(f"_s.{a}")).alias(a)
            for a in attr_cols
        ],
        closed.alias("_del"),
        F.lit(1).alias("_seed"),
        F.col("_ver"),
        F.col("_s.n_events").cast("long").alias("_n"),
        F.col("_s.valid_from").alias("_from"),
        resume.alias("_last"),
    )
    batch_side = ev.select(
        *key_cols,
        order_col,
        *ties,
        *attr_cols,
        "_del",
        F.lit(0).alias("_seed"),
        F.lit(None).cast("long").alias("_ver"),
        F.lit(1).cast("long").alias("_n"),
        F.col(order_col).alias("_from"),
        F.col(order_col).alias("_last"),
    )
    unioned = seed_side.unionByName(batch_side)

    wall = Window.partitionBy(*key_cols)
    seed_last = F.max(F.when(F.col("_seed") == 1, F.col("_last"))).over(wall)
    flagged = unioned.withColumn(
        "_late",
        (F.col("_seed") == 0)
        & F.coalesce(F.col(order_col) <= seed_last, F.lit(False)),
    )
    if on_late == "raise":
        msg = F.concat(
            F.lit("scd2_apply: event at order "),
            F.col(order_col).cast("string"),
            F.lit(" is not later than the stored resume point"),
        )
        guarded = flagged.filter(F.assert_true(~F.col("_late"), msg).isNull())
    else:
        guarded = flagged.filter(~F.col("_late"))

    ordering = [F.col(order_col), *[F.col(t).asc_nulls_first() for t in ties]]
    w = Window.partitionBy(*key_cols).orderBy(F.col("_seed").desc(), *ordering)
    versioned = _number_runs(guarded, w, attr_cols, seeded=True)
    return _finish_runs(
        versioned,
        key_cols,
        order_col,
        attr_cols,
        [F.col(order_col), *[F.col(t) for t in ties]],
        n_col=F.col("_n"),
        from_col=F.col("_from"),
        last_col=F.col("_last"),
    )


def scd2_apply_full(
    history: DataFrame,
    batch: DataFrame,
    *,
    key_cols: Sequence[str],
    **kwargs,
) -> DataFrame:
    """Convenience wrapper: apply the batch and return the FULL new
    history frame (unchanged rows ∪ upsert delta).

    The delta is MATERIALIZED with ``localCheckpoint()`` (one eager job
    per call) before being referenced twice (anti-join + union).  This is
    deliberate, not an optimization: the delta's lazy plan re-references
    ``history``, and composing two copies of such a deeply self-referential
    plan in ONE query trips Spark's self-join attribute de-duplication —
    chained applies were observed to silently re-base version numbers
    (stale open rows + shifted duplicates) when the delta was left lazy,
    with the renamed/aliased join-key workarounds still wrong.  Truncating
    the lineage at the (small) delta is the sound fix.  At scale prefer
    MERGE-ing ``scd2_apply``'s delta into a keyed store — this wrapper is
    for tests, small dimensions, and chained verification."""
    key_cols = list(key_cols)
    delta = scd2_apply(history, batch, key_cols=key_cols, **kwargs).localCheckpoint()
    replaced = delta.select(*key_cols, "version")
    kept = history.join(F.broadcast(replaced), [*key_cols, "version"], "left_anti")
    return kept.unionByName(delta.select(*history.columns))


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
