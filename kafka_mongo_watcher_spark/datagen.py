"""Deterministic synthetic change-event log + base-table generator.

Mirrors the reference's fixture strategy (insert deterministic documents,
replay, assert golden state — /root/reference/cmd/watcher/main_test.go:107-136)
but fully distributed: every column is derived from `spark.range(n)` via
hash expressions, so the same (n, seed) always yields byte-identical data on
any cluster size, with no driver-side materialization — the generator itself
scales to 10^10 rows.

Event envelope (FIXTURES.md §2; analog of the reference ChangeEvent,
/root/reference/internal/mongo/event.go:17-28):
  partition_id  int     key-hash shard (Kafka-partition analog: per-key total order)
  offset        long    monotone gap-free per partition — the resume token
  op            string  insert | update | replace | delete
  repo, path    string  documentKey analog — the upsert key
  commit_seq    long    globally unique LWW ordering (clusterTime analog)
  commit        string  40-hex version id
  lang          string  null for commit_seq < evolution_seq (schema-evolution fixture)
  content_raw   string  un-normalized body (fullDocument analog); null for deletes

~1% malformed rows (null repo) mirror the reference dropping events with an
empty documentKey (internal/mongo/transformer.go:19-23).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

HOT_REPO = "org-0000/hot-repo"
LANGS = ["py", "go", "js", "md"]


def _h(seed: int, tag: str, *cols):
    """Deterministic 64-bit hash of (seed, tag, *cols)."""
    return F.xxhash64(F.lit(seed), F.lit(tag), *cols)


def _hmod(seed: int, tag: str, n: int, *cols):
    return F.pmod(_h(seed, tag, *cols), F.lit(n))


def generate_events(
    spark: SparkSession,
    n_events: int,
    *,
    seed: int = 42,
    n_partitions: int = 8,
    n_repos: int = 50,
    n_paths: int = 200,
    skew_pct: int = 50,
    evolution_frac: float = 0.3,
    malformed_per_mille: int = 10,
    gen_parallelism: int | None = None,
) -> DataFrame:
    """Deterministic change-event DataFrame of n_events rows.

    skew_pct: percentage of events hitting the single hot repo (salting
    fixture, FIXTURES.md §2). evolution_frac: fraction of the stream before
    which `lang` is null (schema-evolution marker EVOLUTION_SEQ).
    """
    evolution_seq = int(n_events * evolution_frac)
    base = spark.range(0, n_events, 1, gen_parallelism or max(8, n_events // 250_000))
    i = F.col("id")

    is_hot = _hmod(seed, "hot", 100, i) < F.lit(skew_pct)
    repo = F.when(is_hot, F.lit(HOT_REPO)).otherwise(
        F.format_string("org-%04d/repo-%04d", _hmod(seed, "org", 7, i).cast("int"),
                        _hmod(seed, "repo", n_repos, i).cast("int"))
    )
    path = F.format_string(
        "src/module_%02d/file_%03d.py",
        _hmod(seed, "mod", 12, i).cast("int"),
        _hmod(seed, "path", n_paths, i).cast("int"),
    )
    opsel = _hmod(seed, "op", 100, i)
    op = (
        F.when(opsel < 25, F.lit("insert"))
        .when(opsel < 85, F.lit("update"))
        .when(opsel < 95, F.lit("replace"))
        .otherwise(F.lit("delete"))
    )
    # Deterministic pseudo-source body, 2..31 repeated lines, with trailing
    # whitespace + CRLF noise so normalization is observable.
    line = F.format_string(
        "def fn_%s(x):  \r\n    return x * %d + %d   \n",
        F.substring(F.hex(_h(seed, "fn", i)), 1, 8),
        _hmod(seed, "mul", 97, i).cast("int"),
        _hmod(seed, "add", 1009, i).cast("int"),
    )
    n_rep = (_hmod(seed, "rep", 30, i) + F.lit(2)).cast("int")
    content_raw = F.concat(
        F.format_string("# %s:%s @%d\n", repo, path, i),
        F.repeat(line, n_rep),
    )
    malformed = _hmod(seed, "bad", 1000, i) < F.lit(malformed_per_mille)
    # partition by the key hash (Kafka hash(key)->partition analog,
    # /root/reference/internal/kafka/client.go:29-31) so each key's events
    # land in one partition in commit order.
    partition_id = F.pmod(F.xxhash64(repo, path), F.lit(n_partitions)).cast("int")

    ev = base.select(
        partition_id.alias("partition_id"),
        i.alias("commit_seq"),
        op.alias("op"),
        F.when(malformed, F.lit(None).cast("string")).otherwise(repo).alias("repo"),
        F.when(malformed, F.lit(None).cast("string")).otherwise(path).alias("path"),
        F.substring(F.sha2(F.concat_ws("|", repo, path, i.cast("string")), 256), 1, 40).alias("commit"),
        F.when(i >= F.lit(evolution_seq),
               F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                            (_hmod(seed, "lang", len(LANGS), i) + 1).cast("int"))
               ).alias("lang"),
        F.when(op == "delete", F.lit(None).cast("string")).otherwise(content_raw).alias("content_raw"),
    )
    # Gap-free monotone per-partition offset = the resume token
    # (/root/reference/internal/mongo/watch_producer.go:106-134).
    w = Window.partitionBy("partition_id").orderBy("commit_seq")
    ev = ev.withColumn("offset", F.row_number().over(w).cast("long"))
    # Re-layout by commit_seq range: the offset window leaves data hashed by
    # the 8 partition_ids — at most 8 lumpy output files no matter the scale,
    # which makes any downstream scan straggle on its biggest split (one
    # 47 s task gated the whole fused merge stage in the r2 scaling
    # diagnosis). Equal-range files also give commit_seq micro-batch filters
    # exact parquet row-group pruning.
    return ev.repartitionByRange(
        gen_parallelism or max(8, n_events // 250_000), F.col("commit_seq")
    )


def write_event_log(
    events: DataFrame,
    out_dir: str,
    *,
    n_chunks: int = 4,
    evolution_seq: int | None = None,
) -> list[str]:
    """Write the event log as n_chunks parquet sub-dirs in commit_seq order.

    Chunks wholly before evolution_seq are written WITHOUT the `lang` column
    (the column physically does not exist yet — true schema evolution, not
    just nulls). Files are written sequentially so a streaming file source
    picks them up in order. Returns chunk dirs in order.
    """
    bounds = events.agg(F.min("commit_seq"), F.max("commit_seq")).first()
    lo, hi = bounds[0], bounds[1]
    step = (hi - lo + 1 + n_chunks - 1) // n_chunks
    dirs = []
    for c in range(n_chunks):
        a, b = lo + c * step, min(lo + (c + 1) * step, hi + 1)
        chunk = events.filter((F.col("commit_seq") >= a) & (F.col("commit_seq") < b))
        if evolution_seq is not None and b <= evolution_seq:
            chunk = chunk.drop("lang")
        d = os.path.join(out_dir, f"chunk_{c:04d}")
        chunk.repartition(1).write.mode("overwrite").parquet(d)
        dirs.append(d)
    return dirs


def generate_base_table(spark: SparkSession, n_rows: int, *, seed: int = 7) -> DataFrame:
    """Deterministic snapshot table (repo, path, commit, lang, content) —
    the 'existing MongoDB collection' that replay mode scans
    (/root/reference/internal/mongo/replay_producer.go:17-67)."""
    ev = generate_events(
        spark, n_rows, seed=seed, skew_pct=0, evolution_frac=0.0, malformed_per_mille=0
    )
    return ev.filter(F.col("op") != "delete").select(
        "repo", "path", "commit", "lang", F.col("content_raw").alias("content")
    ).dropDuplicates(["repo", "path"])
