"""LSH band planning (pure math, no Spark) and the composite Gopher-rule
corpus filter. The S-curve planner follows Leskovec/Rajaraman/Ullman (MMDS
§3.4.3) — public material; the filter composes functions/text.py signals
into one keep/drop decision (Rae et al. 2021 §A1.1 thresholds)."""

import pytest

from kafka_mongo_watcher_spark.functions.text import corpus_filter
from kafka_mongo_watcher_spark.operators.dedupe_docs import (
    lsh_plan,
    minhash_lsh_pairs,
)


# ---------- lsh_plan: driver-side math, zero Spark jobs -------------------


def test_lsh_plan_respects_hash_budget():
    for t in (0.3, 0.5, 0.7, 0.9):
        for n in (6, 16, 100, 128):
            p = lsh_plan(t, n)
            assert p["bands"] * p["rows"] <= n
            assert p["hashes_used"] == p["bands"] * p["rows"]


def test_lsh_plan_threshold_tracks_request():
    # (1/b)^(1/r) of the chosen split must be the closest achievable
    p = lsh_plan(0.8, 128)
    assert abs(p["est_threshold"] - 0.8) < 0.05
    # a high threshold wants more rows per band (sharper curve, higher t)
    lo, hi = lsh_plan(0.2, 128), lsh_plan(0.9, 128)
    assert hi["rows"] > lo["rows"]
    assert hi["bands"] < lo["bands"]


def test_lsh_plan_classic_mmds_point():
    # the MMDS worked example: 100 hashes, t ~= 0.5 sits near b=20, r=5
    # ((1/20)^(1/5) = 0.549); accept the enumerated optimum's neighborhood
    p = lsh_plan(0.55, 100)
    assert 4 <= p["rows"] <= 6
    assert abs(p["est_threshold"] - 0.55) < 0.03


def test_lsh_plan_error_masses_bounded():
    p = lsh_plan(0.7, 64)
    assert 0.0 <= p["false_positive_mass"] <= 1.0
    assert 0.0 <= p["false_negative_mass"] <= 1.0


def test_lsh_plan_rejects_bad_inputs():
    with pytest.raises(ValueError):
        lsh_plan(0.0, 10)
    with pytest.raises(ValueError):
        lsh_plan(1.0, 10)
    with pytest.raises(ValueError):
        lsh_plan(0.5, 0)


# ---------- multi-row bands + the composite filter (Spark) ----------------


def test_minhash_lsh_rows_per_band_subsets_single_row(spark):
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "the quick brown fox jumps over the lazy cat"),
        ("c", "completely different words entirely unrelated text here"),
        ("d", "the quick brown fox jumps over the lazy dog"),  # exact dup of a
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    loose = {
        (r.a_id, r.b_id)
        for r in minhash_lsh_pairs(df, k=6, min_agreement=6).collect()
    }
    sharp = {
        (r.a_id, r.b_id)
        for r in minhash_lsh_pairs(
            df, k=6, rows_per_band=2, min_agreement=6
        ).collect()
    }
    # 2-row bands require two adjacent hashes to agree: candidates can only
    # shrink, and identical docs (all hashes equal) always survive
    assert sharp <= loose
    assert ("a", "d") in sharp


def test_minhash_lsh_threshold_picks_plan(spark):
    df = spark.createDataFrame(
        [("a", "x y z w v u"), ("b", "x y z w v u")], ["doc_id", "text"]
    )
    out = minhash_lsh_pairs(df, k=6, threshold=0.9, min_agreement=6)
    assert {(r.a_id, r.b_id) for r in out.collect()} == {("a", "b")}


def test_minhash_lsh_rejects_overcommitted_bands(spark):
    df = spark.createDataFrame([("a", "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        minhash_lsh_pairs(df, k=6, bands=4, rows_per_band=2)


def test_corpus_filter_reasons(spark):
    stop_pad = "the a and of to in " * 5  # 30 stopword tokens
    rows = [
        # healthy: long enough, stopwords present, low punct, varied lines
        ("keep", stop_pad + "alpha beta gamma delta epsilon zeta"),
        ("short", "one two"),
        ("dup_lines", "\n".join([stop_pad] * 10)),
        ("no_stop", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        ("punct", stop_pad + "!!!???;;;###$$$%%%^^^&&&***(((" * 3),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.keep, r.drop_reasons) for r in corpus_filter(df).collect()}
    assert got["keep"] == (True, "")
    assert got["short"][0] is False and "too_short" in got["short"][1]
    assert got["dup_lines"][0] is False and "dup_lines" in got["dup_lines"][1]
    assert got["no_stop"][0] is False and "low_stopword" in got["no_stop"][1]
    assert got["punct"][0] is False and "high_punct" in got["punct"][1]


def test_corpus_filter_reason_order_is_fixed(spark):
    # one doc tripping several rules reports them in declaration order
    df = spark.createDataFrame([("x", "!!!")], ["doc_id", "text"])
    row = corpus_filter(df).collect()[0]
    assert row.keep is False
    reasons = row.drop_reasons.split(",")
    assert reasons == sorted(
        reasons,
        key=["too_short", "too_long", "dup_lines", "rep_bigrams",
             "low_stopword", "high_punct"].index,
    )


# ---------- sliding-window chunking ----------------------------------------


def test_chunk_documents_short_doc_single_chunk(spark):
    from kafka_mongo_watcher_spark.functions.text import chunk_documents

    df = spark.createDataFrame([("a", "one two three")], ["doc_id", "text"])
    rows = chunk_documents(df, chunk_tokens=8, overlap_tokens=2).collect()
    assert len(rows) == 1
    assert rows[0].chunk_id == 0
    assert rows[0].chunk_text == "one two three"
    assert rows[0].chunk_tokens == 3


def test_chunk_documents_overlap_and_tail(spark):
    from kafka_mongo_watcher_spark.functions.text import chunk_documents

    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([("a", " ".join(words))], ["doc_id", "text"])
    # chunk=4, overlap=2 -> stride 2 -> starts 0,2,4,6 (ceil((10-4)/2)+1 = 4)
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, overlap_tokens=2).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.chunk_text for r in rows] == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7", "w6 w7 w8 w9",
    ]
    # every consecutive pair shares exactly the 2-token overlap
    assert all(r.chunk_tokens == 4 for r in rows)


def test_chunk_documents_exact_multiple_no_empty_tail(spark):
    from kafka_mongo_watcher_spark.functions.text import chunk_documents

    words = [f"w{i}" for i in range(8)]
    df = spark.createDataFrame([("a", " ".join(words))], ["doc_id", "text"])
    # chunk=4, overlap=0 -> stride 4 -> exactly 2 chunks, no empty third
    rows = chunk_documents(df, chunk_tokens=4, overlap_tokens=0).collect()
    assert sorted(r.chunk_text for r in rows) == ["w0 w1 w2 w3", "w4 w5 w6 w7"]


def test_chunk_documents_rejects_bad_overlap(spark):
    from kafka_mongo_watcher_spark.functions.text import chunk_documents

    df = spark.createDataFrame([("a", "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)
