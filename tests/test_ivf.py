"""IVF (inverted-file) ANN: coarse-quantizer training, distributed
assignment, and probe search. The clustered fixture shows the actual IVF
contract — high recall while scanning only n_probe/n_list of the corpus —
which the isotropic driver table cannot (on random vectors recall ≈ probe
fraction for ANY partitioning scheme; see the contract query's docstring)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_mongo_watcher_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_topk,
    train_ivf_centroids,
)

DIM = 32
N_CLUSTERS = 16


@pytest.fixture(scope="module")
def clustered(spark):
    """400 unit vectors in 16 tight clusters (center + small noise), built
    with a fixed-seed RandomState so the fixture is bytes-stable."""
    rng = np.random.RandomState(42)
    centers = rng.randn(N_CLUSTERS, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(400):
        c = i % N_CLUSTERS
        v = centers[c] + 0.08 * rng.randn(DIM)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v], c))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).cache()


def test_centroid_training_deterministic_and_normalized(clustered):
    c1 = train_ivf_centroids(clustered, n_list=8, sample_size=256, seed=7)
    c2 = train_ivf_centroids(clustered, n_list=8, sample_size=256, seed=7)
    assert c1 == c2
    for row in c1:
        assert abs(sum(x * x for x in row) - 1.0) < 1e-9
    assert train_ivf_centroids(clustered, n_list=8, sample_size=256, seed=8) != c1


def test_training_sample_too_small_raises(clustered):
    with pytest.raises(ValueError, match="cannot seed"):
        train_ivf_centroids(clustered.limit(4), n_list=8, sample_size=256)


def test_assignment_matches_numpy_argmax(clustered):
    cent = train_ivf_centroids(clustered, n_list=N_CLUSTERS, sample_size=400)
    got = {
        r["vec_id"]: r["list_id"]
        for r in ivf_assign(clustered, cent).select("vec_id", "list_id").collect()
    }
    C = np.array(cent)
    for r in clustered.select("vec_id", "embedding").collect():
        v = np.array(r["embedding"], dtype=np.float64)
        assert got[r["vec_id"]] == int(np.argmax(C @ v))


def test_assignment_is_projection_no_shuffle(clustered):
    cent = train_ivf_centroids(clustered, n_list=8, sample_size=256)
    plan = (
        ivf_assign(clustered, cent)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for op in ("Exchange", "Join", "CartesianProduct"):
        assert op not in plan


def test_clustered_recall_with_small_probe_fraction(clustered):
    """The IVF payoff: ≥0.9 recall@10 probing 2 of 16 lists (12.5% of the
    corpus) on clusterable data."""
    qs = clustered.filter(F.col("vec_id") < 8)
    cs = clustered.filter(F.col("vec_id") >= 8)
    cent = train_ivf_centroids(cs, n_list=N_CLUSTERS, sample_size=392)
    ivf = ivf_topk(qs, cs, k=10, n_probe=2, centroids=cent).select("query_id", "cand_id")
    brute = brute_force_topk(qs, cs, k=10).select("query_id", "cand_id")
    hits = dict(
        ivf.join(brute, ["query_id", "cand_id"], "left_semi")
        .groupBy("query_id")
        .count()
        .collect()
    )
    recalls = [hits.get(q, 0) / 10 for q in range(8)]
    assert min(recalls) >= 0.9, recalls


def test_probe_join_is_hash_equijoin(clustered):
    qs = clustered.filter(F.col("vec_id") < 8)
    cs = clustered.filter(F.col("vec_id") >= 8)
    cent = train_ivf_centroids(cs, n_list=8, sample_size=256)
    plan = (
        ivf_topk(qs, cs, k=5, n_probe=2, centroids=cent)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_full_probe_equals_brute_force(clustered):
    """n_probe == n_list degenerates to exact search — same result set as
    brute force (the standard IVF sanity identity)."""
    qs = clustered.filter(F.col("vec_id") < 5)
    cs = clustered.filter(F.col("vec_id") >= 5)
    cent = train_ivf_centroids(cs, n_list=8, sample_size=395)
    ivf = ivf_topk(qs, cs, k=7, n_list=8, n_probe=8, centroids=cent)
    brute = brute_force_topk(qs, cs, k=7)
    assert sorted(map(tuple, ivf.select("query_id", "cand_id").collect())) == sorted(
        map(tuple, brute.select("query_id", "cand_id").collect())
    )


def test_contract_query_recall_flags_true(spark):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["ann_ivf_topk"](spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 3
    assert all(r["recall_ok"] for r in rows)
