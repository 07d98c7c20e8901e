"""Custom aggregation-pipeline compiler (F1+F2+F3 unified surface).

Golden cases mirror the reference's pipeline tests:
  - watch_producer_test.go:149-199 / replay_producer_test.go:175 —
    `$match` on a nested document path prepended to the stream pipeline.
  - README.md:94 — `$match` + `$addFields` literal enrichment.
  - variables/replace_test.go — %currentTimestamp% substituted into the raw
    JSON before parsing (string-typed result, ms units at second resolution).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_mongo_watcher_spark.operators.pipeline import (
    apply_pipeline,
    compile_match,
    compile_pipeline,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(op="insert", repo="r1", path="a.py", n=1,
                fullDocument=Row(active=True, lang="py")),
            Row(op="update", repo="r1", path="b.py", n=5,
                fullDocument=Row(active=False, lang="py")),
            Row(op="delete", repo="r2", path="c.go", n=9,
                fullDocument=Row(active=True, lang="go")),
            Row(op="insert", repo="r2", path="d.go", n=None,
                fullDocument=Row(active=None, lang=None)),
        ]
    )


def test_match_nested_path_golden(docs):
    # watch_producer_test.go:166: [ { "$match": {"fullDocument.active": true} } ]
    out = apply_pipeline(docs, '[ { "$match": {"fullDocument.active": true} } ]')
    assert sorted(r.path for r in out.collect()) == ["a.py", "c.go"]


def test_readme_match_plus_addfields_golden(docs):
    # README.md:94 shape: $match then $addFields with a literal
    pipe = (
        '[ { "$match": { "fullDocument.active": true } },'
        '  { "$addFields": { "custom-field": "custom-value" } } ]'
    )
    out = apply_pipeline(docs, pipe)
    rows = out.collect()
    assert len(rows) == 2
    assert all(r["custom-field"] == "custom-value" for r in rows)


def test_current_timestamp_substituted_before_parse(docs):
    # replace_test.go: textual replacement inside the JSON string, so the
    # added field is a STRING of unix-ms at second resolution.
    pipe = '[ { "$addFields": { "stamp": "%currentTimestamp%" } } ]'
    out = apply_pipeline(docs, pipe, now=lambda: 1687392000.75)
    vals = {r.stamp for r in out.collect()}
    assert vals == {"1687392000000"}


def test_match_operators(docs):
    got = apply_pipeline(docs, '[{"$match": {"n": {"$gte": 5}}}]').count()
    assert got == 2
    got = apply_pipeline(docs, '[{"$match": {"n": {"$gt": 5, "$lt": 100}}}]').count()
    assert got == 1
    got = apply_pipeline(docs, '[{"$match": {"op": {"$in": ["insert", "update"]}}}]')
    assert got.count() == 3
    got = apply_pipeline(docs, '[{"$match": {"op": {"$nin": ["insert"]}}}]').count()
    assert got == 2
    got = apply_pipeline(docs, '[{"$match": {"n": {"$exists": false}}}]').count()
    assert got == 1
    got = apply_pipeline(docs, '[{"$match": {"path": {"$regex": "\\\\.go$"}}}]')
    assert got.count() == 2
    # negation is null-safe: {$ne: 5} matches the null-n row (Mongo $ne
    # matches documents where the field is missing)
    got = apply_pipeline(docs, '[{"$match": {"n": {"$ne": 5}}}]').count()
    assert got == 3
    got = apply_pipeline(docs, '[{"$match": {"n": {"$nin": [1, 5]}}}]').count()
    assert got == 2
    # ...but {$ne: null} does NOT match the null field
    got = apply_pipeline(docs, '[{"$match": {"n": {"$ne": null}}}]').count()
    assert got == 3
    # equality against JSON null matches the null field
    got = apply_pipeline(docs, '[{"$match": {"fullDocument.lang": null}}]').count()
    assert got == 1
    # $in containing null matches the null field
    got = apply_pipeline(docs, '[{"$match": {"n": {"$in": [5, null]}}}]').count()
    assert got == 2


def test_match_combinators(docs):
    got = apply_pipeline(
        docs, '[{"$match": {"$or": [{"op": "delete"}, {"n": {"$lt": 2}}]}}]'
    ).count()
    assert got == 2
    # $nor matches rows failing every clause — the null-n row fails both
    # (Mongo missing-field semantics), so it matches
    got = apply_pipeline(
        docs, '[{"$match": {"$nor": [{"op": "delete"}, {"n": {"$lt": 2}}]}}]'
    ).count()
    assert got == 2
    # $not is null-safe too: matches the null-n row of r2 but repo=r1 gates it
    got = apply_pipeline(
        docs,
        '[{"$match": {"$and": [{"repo": "r1"}, {"n": {"$not": {"$gt": 2}}}]}}]',
    ).count()
    assert got == 1
    got = apply_pipeline(docs, '[{"$match": {"n": {"$not": {"$gt": 2}}}}]').count()
    assert got == 2


def test_addfields_refs_nested_and_dotted_target(docs):
    pipe = (
        '[{"$addFields": {'
        '  "lang_copy": "$fullDocument.lang",'
        '  "meta": {"src": "kmw", "pair": ["$repo", "$path"]},'
        '  "fullDocument.flag": 7'
        '}}]'
    )
    out = apply_pipeline(docs, pipe)
    r = out.filter(F.col("path") == "a.py").collect()[0]
    assert r.lang_copy == "py"
    assert r.meta.src == "kmw" and list(r.meta.pair) == ["r1", "a.py"]
    assert r.fullDocument.flag == 7
    # $set is an alias
    out2 = apply_pipeline(docs, '[{"$set": {"x": 1}}]')
    assert "x" in out2.columns


def test_project_unset_limit(docs):
    out = apply_pipeline(docs, '[{"$project": {"repo": 1, "path": 1}}]')
    assert out.columns == ["repo", "path"]
    out = apply_pipeline(docs, '[{"$project": {"fullDocument": 0}}]')
    assert "fullDocument" not in out.columns
    out = apply_pipeline(docs, '[{"$unset": "fullDocument"}, {"$limit": 2}]')
    assert "fullDocument" not in out.columns and out.count() == 2
    with pytest.raises(ValueError, match="cannot mix"):
        apply_pipeline(docs, '[{"$project": {"repo": 1, "path": 0}}]')


def test_unknown_stage_and_operator_raise(docs):
    with pytest.raises(ValueError, match="unsupported pipeline stage"):
        compile_pipeline('[{"$redact": {}}]')
    with pytest.raises(ValueError, match="unsupported .match operator"):
        apply_pipeline(docs, '[{"$match": {"n": {"$mod": [2, 0]}}}]').count()
    with pytest.raises(ValueError, match="single-key"):
        compile_pipeline('[{"$match": {}, "$limit": 1}]')


def test_match_pushed_to_scan(spark, tmp_path, docs):
    """The compiled $match predicate must reach the parquet scan as a pushed
    filter — the Spark analog of Mongo evaluating the stage server-side."""
    p = str(tmp_path / "docs.parquet")
    docs.select("op", "repo", "path", "n").write.parquet(p)
    out = apply_pipeline(
        spark.read.parquet(p), '[{"$match": {"op": "insert", "n": {"$gte": 1}}}]'
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert ("EqualTo(op,insert)" in plan or "EqualNullSafe(op,insert)" in plan)
    assert "GreaterThanOrEqual(n,1)" in plan


def test_compile_match_empty_doc_is_true(docs):
    assert docs.filter(compile_match({})).count() == docs.count()


def test_group_stage(docs):
    # README.md:89-94: the user may inject $group stages
    out = apply_pipeline(
        docs,
        '[{"$group": {"_id": "$op", "n": {"$sum": 1}, "mx": {"$max": "$n"},'
        '             "langs": {"$addToSet": "$fullDocument.lang"}}},'
        ' {"$sort": {"_id": 1}}]',
    ).collect()
    got = {r["_id"]: (r["n"], r["mx"], sorted(x for x in r["langs"] if x)) for r in out}
    assert got == {
        "insert": (2, 1, ["py"]),
        "update": (1, 5, ["py"]),
        "delete": (1, 9, ["go"]),
    }


def test_group_composite_and_null_id(docs):
    out = apply_pipeline(
        docs,
        '[{"$group": {"_id": {"r": "$repo", "l": "$fullDocument.lang"},'
        '             "total": {"$sum": "$n"}}}]',
    ).collect()
    key = {(r["_id"]["r"], r["_id"]["l"]): r["total"] for r in out}
    assert key[("r1", "py")] == 6 and key[("r2", "go")] == 9
    glob = apply_pipeline(
        docs, '[{"$group": {"_id": null, "cnt": {"$count": {}}, "avg_n": {"$avg": "$n"}}}]'
    ).collect()
    assert len(glob) == 1 and glob[0]["_id"] is None and glob[0]["cnt"] == 4
    assert abs(glob[0]["avg_n"] - 5.0) < 1e-9


def test_sort_skip_limit_count(docs):
    out = apply_pipeline(
        docs, '[{"$sort": {"n": -1}}, {"$skip": 1}, {"$limit": 2}]'
    ).collect()
    assert [r["n"] for r in out] == [5, 1]
    cnt = apply_pipeline(docs, '[{"$match": {"repo": "r1"}}, {"$count": "total"}]')
    assert cnt.collect()[0]["total"] == 2
    with pytest.raises(ValueError, match="direction"):
        apply_pipeline(docs, '[{"$sort": {"n": 0}}]')
    with pytest.raises(ValueError, match="accumulator"):
        apply_pipeline(docs, '[{"$group": {"_id": null, "x": {"$accumulator": {}}}}]')


@pytest.fixture(scope="module")
def arr_docs(spark):
    # array-typed path + a doc with empty and null arrays (Mongo $unwind
    # golden semantics: default drops both, preserve keeps both)
    return spark.createDataFrame(
        [
            Row(k="a", tags=["x", "y"], sub=Row(u=1, v="p")),
            Row(k="b", tags=[], sub=Row(u=2, v="q")),
            Row(k="c", tags=None, sub=Row(u=3, v="r")),
        ]
    )


def test_unwind_default_drops_null_and_empty(arr_docs):
    out = apply_pipeline(arr_docs, '[ {"$unwind": "$tags"} ]')
    rows = sorted((r.k, r.tags) for r in out.collect())
    assert rows == [("a", "x"), ("a", "y")]


def test_unwind_preserve_and_index(arr_docs):
    pipe = (
        '[ {"$unwind": {"path": "$tags", "includeArrayIndex": "i",'
        '   "preserveNullAndEmptyArrays": true}} ]'
    )
    out = apply_pipeline(arr_docs, pipe)
    rows = sorted(
        ((r.k, r.tags, r.i) for r in out.collect()),
        key=lambda t: (t[0], t[2] if t[2] is not None else -1),
    )
    assert rows == [
        ("a", "x", 0), ("a", "y", 1), ("b", None, None), ("c", None, None),
    ]


def test_unwind_non_array_passthrough(docs):
    # Mongo treats a non-array value as its own one-element array; null
    # drops by default
    out = apply_pipeline(docs, '[ {"$unwind": "$n"} ]')
    assert sorted(r.n for r in out.collect()) == [1, 5, 9]


def test_lookup_gathers_matches_and_empty_array(spark, docs):
    dim = spark.createDataFrame(
        [Row(repo="r1", owner="alice"), Row(repo="r1", owner="ann"),
         Row(repo="r3", owner="bob")]
    )
    pipe = (
        '[ {"$lookup": {"from": "repos", "localField": "repo",'
        '   "foreignField": "repo", "as": "matches"}} ]'
    )
    out = apply_pipeline(docs, pipe, tables={"repos": dim})
    by_repo = {r.repo: r.matches for r in out.collect()}
    assert sorted(m.owner for m in by_repo["r1"]) == ["alice", "ann"]
    assert by_repo["r2"] == []  # Mongo: empty array, never null


def test_lookup_unknown_collection_raises(docs):
    with pytest.raises(ValueError, match="lookup from"):
        apply_pipeline(
            docs,
            '[ {"$lookup": {"from": "nope", "localField": "repo",'
            '   "foreignField": "x", "as": "m"}} ]',
        )


def test_replace_root_promotes_struct(arr_docs):
    out = apply_pipeline(arr_docs, '[ {"$replaceRoot": {"newRoot": "$sub"}} ]')
    assert sorted(out.columns) == ["u", "v"]
    assert sorted((r.u, r.v) for r in out.collect()) == [
        (1, "p"), (2, "q"), (3, "r")]
    out2 = apply_pipeline(arr_docs, '[ {"$replaceWith": "$sub"} ]')
    assert sorted(out2.columns) == ["u", "v"]
    with pytest.raises(ValueError, match="not a document"):
        apply_pipeline(arr_docs, '[ {"$replaceRoot": {"newRoot": "$k"}} ]')


def test_sort_by_count(docs):
    out = apply_pipeline(docs, '[ {"$sortByCount": "$repo"} ]')
    rows = [(r._id, r["count"]) for r in out.collect()]
    assert sorted(rows) == [("r1", 2), ("r2", 2)]
    assert out.columns == ["_id", "count"]


# ---- $bucket / $facet ------------------------------------------------------

def test_bucket_boundaries_and_default(docs):
    out = apply_pipeline(
        docs,
        '[{"$bucket": {"groupBy": "$n", "boundaries": [0, 5, 10],'
        ' "default": "other", "output": {"count": {"$sum": 1}, "max_n": {"$max": "$n"}}}}]',
    )
    got = {r["_id"]: (r["count"], r["max_n"]) for r in out.collect()}
    # n=1 -> [0,5); n=5,9 -> [5,10); n=None -> default
    assert got == {"0": (1, 1), "5": (2, 9), "other": (1, None)}


def test_bucket_numeric_ids_without_default(docs):
    out = apply_pipeline(
        docs.filter(F.col("n").isNotNull()),
        '[{"$bucket": {"groupBy": "$n", "boundaries": [0, 5, 10]}}]',
    )
    got = {r["_id"]: r["count"] for r in out.collect()}
    assert got == {0: 1, 5: 2}


def test_bucket_out_of_range_without_default_raises(spark, docs):
    import pyspark.errors

    out = apply_pipeline(
        docs,  # n=None falls outside every boundary
        '[{"$bucket": {"groupBy": "$n", "boundaries": [0, 5, 10]}}]',
    )
    with pytest.raises(Exception, match="out of boundaries"):
        out.collect()


def test_bucket_rejects_unsorted_boundaries(docs):
    with pytest.raises(ValueError, match="sorted"):
        apply_pipeline(docs, '[{"$bucket": {"groupBy": "$n", "boundaries": [5, 0]}}]')


def test_bucket_auto_equal_counts_and_boundaries(spark):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 1, 1, 2, 3, 4, 5, 5, 6, 7, 8, 9])],
        "id int, x double",
    )
    out = apply_pipeline(
        df,
        '[{"$bucketAuto": {"groupBy": "$x", "buckets": 4,'
        ' "output": {"count": {"$sum": 1}, "avg_x": {"$avg": "$x"}}}}]',
    )
    rows = out.collect()
    # 12 docs -> 4 buckets of exactly 3; ties (three 1.0s) stay together;
    # each _id.max is the NEXT bucket's min except the last (global max)
    assert [(r["_id"]["min"], r["_id"]["max"], r["count"]) for r in rows] == [
        (1.0, 2.0, 3), (2.0, 5.0, 3), (5.0, 7.0, 3), (7.0, 9.0, 3)
    ]


def test_bucket_auto_tie_group_never_splits(spark):
    # 9 copies of one value + 3 distinct: the tie block lands in ONE bucket
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([5] * 9 + [1, 2, 3])], "id int, x int"
    )
    out = apply_pipeline(df, '[{"$bucketAuto": {"groupBy": "$x", "buckets": 4}}]')
    got = {(r["_id"]["min"], r["_id"]["max"]): r["count"] for r in out.collect()}
    assert got[(5, 5)] == 9  # all ties together, in the last bucket
    assert sum(got.values()) == 12


def test_bucket_auto_fewer_distinct_than_buckets(spark):
    df = spark.createDataFrame([(i, i % 2) for i in range(10)], "id int, x int")
    out = apply_pipeline(df, '[{"$bucketAuto": {"groupBy": "$x", "buckets": 5}}]')
    got = [(r["_id"]["min"], r["_id"]["max"], r["count"]) for r in out.collect()]
    assert got == [(0, 1, 5), (1, 1, 5)]  # as many buckets as distinct values


def test_bucket_auto_rejects_granularity_and_bad_buckets(docs):
    with pytest.raises(ValueError, match="granularity"):
        apply_pipeline(
            docs,
            '[{"$bucketAuto": {"groupBy": "$n", "buckets": 2, "granularity": "R5"}}]',
        )
    with pytest.raises(ValueError, match="positive integer"):
        apply_pipeline(docs, '[{"$bucketAuto": {"groupBy": "$n", "buckets": 0}}]')


def test_facet_runs_subpipelines_over_same_input(docs):
    out = apply_pipeline(
        docs,
        '[{"$facet": {'
        '"by_op": [{"$sortByCount": "$op"}],'
        '"big_n": [{"$match": {"n": {"$gte": 5}}}, {"$project": {"repo": 1, "n": 1}},'
        '          {"$sort": {"n": -1}}],'
        '"total": [{"$count": "docs"}]}}]',
    )
    rows = out.collect()
    assert len(rows) == 1  # one output document, Mongo-style
    row = rows[0]
    assert {(r["_id"], r["count"]) for r in row["by_op"]} == {
        ("insert", 2), ("update", 1), ("delete", 1),
    }
    assert [(r["repo"], r["n"]) for r in row["big_n"]] == [("r2", 9), ("r1", 5)]
    assert row["total"][0]["docs"] == 4


def test_facet_rejects_non_pipeline_field(docs):
    with pytest.raises(ValueError, match="pipeline array"):
        apply_pipeline(docs, '[{"$facet": {"x": {"$match": {}}}}]')


# ---------- $setWindowFields ------------------------------------------------


def test_set_window_fields_running_and_rank(docs):
    out = apply_pipeline(
        docs,
        '[{"$setWindowFields": {"partitionBy": "$repo",'
        ' "sortBy": {"n": 1},'
        ' "output": {'
        '   "running": {"$sum": "$n", "window": {"documents": ["unbounded", "current"]}},'
        '   "rn": {"$documentNumber": {}},'
        '   "repo_total": {"$sum": "$n"},'
        '   "prev_n": {"$shift": {"output": "$n", "by": -1, "default": 0}}}}}]',
    ).select("repo", "path", "running", "rn", "repo_total", "prev_n")
    got = {r.path: (r.running, r.rn, r.repo_total, r.prev_n) for r in out.collect()}
    # r1: n=1 then 5; r2: n=None sorts first (asc), then 9
    assert got["a.py"] == (1, 1, 6, 0)
    assert got["b.py"] == (6, 2, 6, 1)
    assert got["d.go"] == (None, 1, 9, 0)
    assert got["c.go"] == (9, 2, 9, None)  # $shift default only for out-of-window


def test_set_window_fields_default_window_is_whole_partition(docs):
    # Mongo: no window doc => whole partition even when sortBy is present
    out = apply_pipeline(
        docs,
        '[{"$setWindowFields": {"partitionBy": "$repo", "sortBy": {"n": 1},'
        ' "output": {"mx": {"$max": "$n"}}}}]',
    )
    assert {(r.repo, r.mx) for r in out.select("repo", "mx").distinct().collect()} == {
        ("r1", 5), ("r2", 9)
    }


def test_set_window_fields_positional_requires_sortby(docs):
    with pytest.raises(ValueError, match="requires sortBy"):
        apply_pipeline(
            docs,
            '[{"$setWindowFields": {"partitionBy": "$repo",'
            ' "output": {"rn": {"$documentNumber": {}}}}}]',
        )


# ---------- $unionWith ------------------------------------------------------


def test_union_with_subpipeline_and_missing_columns(spark, docs):
    other = spark.createDataFrame(
        [Row(repo="r9", extra="x"), Row(repo="r10", extra="y")]
    )
    out = apply_pipeline(
        docs,
        '[{"$unionWith": {"coll": "other",'
        ' "pipeline": [{"$match": {"repo": "r9"}}]}}]',
        tables={"other": other},
    )
    assert out.count() == 5  # 4 docs + 1 filtered row from `other`
    row = out.filter(F.col("repo") == "r9").collect()[0]
    assert row.extra == "x" and row.op is None  # missing columns null-filled


def test_union_with_unknown_collection_raises(docs):
    with pytest.raises(ValueError, match="not supplied"):
        apply_pipeline(docs, '[{"$unionWith": "nope"}]')


# ---------- $densify / $fill -------------------------------------------------


def test_densify_fills_partition_gaps(spark):
    t = spark.createDataFrame(
        [Row(grp="a", slot=1, v=10), Row(grp="a", slot=4, v=40),
         Row(grp="b", slot=2, v=20)],
    )
    out = apply_pipeline(
        t,
        '[{"$densify": {"field": "slot", "partitionByFields": ["grp"],'
        ' "range": {"step": 1, "bounds": "partition"}}}]',
    )
    got = {(r.grp, r.slot): r.v for r in out.collect()}
    # a: grid 1..4 -> 2,3 added with null v; existing rows untouched
    assert got == {("a", 1): 10, ("a", 2): None, ("a", 3): None,
                   ("a", 4): 40, ("b", 2): 20}


def test_densify_explicit_bounds_exclusive_upper(spark):
    t = spark.createDataFrame([Row(grp="a", slot=5, v=1)])
    out = apply_pipeline(
        t,
        '[{"$densify": {"field": "slot", "partitionByFields": ["grp"],'
        ' "range": {"step": 2, "bounds": [1, 7]}}}]',
    )
    assert sorted(r.slot for r in out.collect()) == [1, 3, 5]  # 7 excluded


def test_fill_locf_and_constant(spark):
    t = spark.createDataFrame(
        [Row(grp="a", slot=1, v=10, w=None), Row(grp="a", slot=2, v=None, w=None),
         Row(grp="a", slot=3, v=None, w=5), Row(grp="b", slot=1, v=None, w=None)],
        "grp string, slot int, v int, w int",
    )
    out = apply_pipeline(
        t,
        '[{"$fill": {"partitionBy": "$grp", "sortBy": {"slot": 1},'
        ' "output": {"v": {"method": "locf"}, "w": {"value": 0}}}}]',
    )
    got = {(r.grp, r.slot): (r.v, r.w) for r in out.collect()}
    assert got[("a", 1)] == (10, 0)
    assert got[("a", 2)] == (10, 0)   # locf carries 10 forward
    assert got[("a", 3)] == (10, 5)   # existing w untouched
    assert got[("b", 1)] == (None, 0)  # no prior observation stays null


def test_densify_then_fill_composes(spark):
    t = spark.createDataFrame(
        [Row(grp="a", slot=1, v=10), Row(grp="a", slot=3, v=30)]
    )
    out = apply_pipeline(
        t,
        '[{"$densify": {"field": "slot", "partitionByFields": ["grp"],'
        ' "range": {"step": 1, "bounds": "partition"}}},'
        ' {"$fill": {"partitionBy": "$grp", "sortBy": {"slot": 1},'
        ' "output": {"v": {"method": "locf"}}}}]',
    )
    got = {r.slot: r.v for r in out.collect()}
    assert got == {1: 10, 2: 10, 3: 30}


# ---------- $merge (terminal write stage → LakeTable) ------------------------


def test_merge_stage_upserts_into_lake_table(spark, tmp_path):
    from kafka_mongo_watcher_spark.plans.lake import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    cols = ("partition_id int, offset bigint, op string, repo string, "
            "path string, commit string, lang string, content string, "
            "content_sha256 string, commit_seq bigint")
    batch = spark.createDataFrame(
        [(0, 1, "insert", "r", "p", "c1", "py", "body", "sha1", 1),
         (0, 2, "insert", "r", "skipme", "c2", "py", "body", "sha2", 2)],
        cols,
    )
    out = apply_pipeline(
        batch,
        '[{"$match": {"path": {"$ne": "skipme"}}},'
        ' {"$merge": {"into": "t", "on": ["repo", "path"],'
        '  "whenMatched": "replace", "whenNotMatched": "insert"}}]',
        tables={"t": t},
    )
    # stage returns the post-merge snapshot; the filtered row never lands
    assert {(r.repo, r.path) for r in out.select("repo", "path").collect()} == {("r", "p")}
    assert {(r.repo, r.path) for r in t.snapshot().select("repo", "path").collect()} == {("r", "p")}


def test_merge_stage_must_be_last_and_validated(spark, tmp_path, docs):
    from kafka_mongo_watcher_spark.plans.lake import LakeTable

    with pytest.raises(ValueError, match="last pipeline stage"):
        apply_pipeline(docs, '[{"$merge": "t"}, {"$limit": 1}]')
    with pytest.raises(ValueError, match="supplied via tables"):
        apply_pipeline(docs, '[{"$merge": "nope"}]')
    t = LakeTable.create(spark, str(tmp_path / "t2"), n_buckets=2)
    with pytest.raises(ValueError, match="table key"):
        apply_pipeline(docs, '[{"$merge": {"into": "t", "on": ["repo"]}}]',
                       tables={"t": t})
    with pytest.raises(ValueError, match="whenMatched"):
        apply_pipeline(
            docs,
            '[{"$merge": {"into": "t", "whenMatched": "pipeline"}}]',
            tables={"t": t},
        )
    with pytest.raises(ValueError, match="whenNotMatched"):
        apply_pipeline(
            docs,
            '[{"$merge": {"into": "t", "whenNotMatched": "drop"}}]',
            tables={"t": t},
        )


def _merge_batch(spark, rows):
    cols = ("partition_id int, offset bigint, op string, repo string, "
            "path string, commit string, lang string, content string, "
            "content_sha256 string, commit_seq bigint")
    return spark.createDataFrame(rows, cols)


def _mrow(path, seq, op="insert", lang="py", content="body"):
    return (0, seq, op, "r", path, f"c{seq}", lang, content, f"sha{seq}", seq)


def test_merge_stage_when_matched_modes(spark, tmp_path):
    from kafka_mongo_watcher_spark.plans.lake import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    apply_pipeline(_merge_batch(spark, [_mrow("p", 1), _mrow("q", 2)]),
                   '[{"$merge": "t"}]', tables={"t": t})

    # keepExisting: matched key p keeps its doc; new key n inserts
    apply_pipeline(
        _merge_batch(spark, [_mrow("p", 3, lang="rs"), _mrow("n", 4)]),
        '[{"$merge": {"into": "t", "whenMatched": "keepExisting"}}]',
        tables={"t": t},
    )
    got = {r.path: (r.lang, r.commit) for r in t.snapshot().collect()}
    assert got == {"p": ("py", "c1"), "q": ("py", "c2"), "n": ("py", "c4")}

    # discard: only matched keys apply; ghost never lands
    apply_pipeline(
        _merge_batch(spark, [_mrow("q", 5, op="update", lang="go"),
                             _mrow("ghost", 6)]),
        '[{"$merge": {"into": "t", "whenNotMatched": "discard"}}]',
        tables={"t": t},
    )
    got = {r.path: r.lang for r in t.snapshot().collect()}
    assert got == {"p": "py", "q": "go", "n": "py"}

    # fail modes
    with pytest.raises(ValueError, match="whenMatched='fail'"):
        apply_pipeline(
            _merge_batch(spark, [_mrow("p", 7)]),
            '[{"$merge": {"into": "t", "whenMatched": "fail"}}]',
            tables={"t": t},
        )
    with pytest.raises(ValueError, match="whenNotMatched='fail'"):
        apply_pipeline(
            _merge_batch(spark, [_mrow("ghost2", 8)]),
            '[{"$merge": {"into": "t", "whenNotMatched": "fail"}}]',
            tables={"t": t},
        )


def test_merge_stage_merge_mode_overlays_fields(spark, tmp_path):
    from kafka_mongo_watcher_spark.plans.lake import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    apply_pipeline(_merge_batch(spark, [_mrow("p", 1, content="keepme")]),
                   '[{"$merge": "t"}]', tables={"t": t})
    # pipeline output carries ONLY lang as payload: matched doc keeps its
    # content/commit/sha, new doc gets lang + nulls (Mongo whenMatched:merge)
    thin = spark.createDataFrame(
        [(0, 2, "insert", "r", "p", "rs", 2), (0, 3, "insert", "r", "n", "go", 3)],
        "partition_id int, offset bigint, op string, repo string, path string, "
        "lang string, commit_seq bigint",
    )
    apply_pipeline(thin, '[{"$merge": {"into": "t", "whenMatched": "merge"}}]',
                   tables={"t": t})
    got = {r.path: (r.lang, r.content, r.commit) for r in t.snapshot().collect()}
    assert got == {"p": ("rs", "keepme", "c1"), "n": ("go", None, None)}


# ---------- $sample ------------------------------------------------------------


def test_sample_deterministic_by_mode(docs):
    """{size, by}: sha256-ordered selection — same rows every run, stable
    under repartitioning."""
    out1 = apply_pipeline(docs, '[{"$sample": {"size": 2, "by": ["path"]}}]')
    out2 = apply_pipeline(
        docs.repartition(7), '[{"$sample": {"size": 2, "by": ["path"]}}]'
    )
    rows1 = sorted(r.path for r in out1.collect())
    rows2 = sorted(r.path for r in out2.collect())
    assert rows1 == rows2 and len(rows1) == 2
    # a different seed picks a (generally) different subset but still size N
    out3 = apply_pipeline(
        docs, '[{"$sample": {"size": 2, "by": ["path"], "seed": "z"}}]'
    )
    assert out3.count() == 2


def test_sample_random_mode_size_only(docs):
    out = apply_pipeline(docs, '[{"$sample": {"size": 3}}]')
    assert out.count() == 3
    assert apply_pipeline(docs, '[{"$sample": {"size": 99}}]').count() == 4


# ---------- $graphLookup -------------------------------------------------------


def _org_chart(spark):
    # employee hierarchy: ceo <- vp1, vp2; vp1 <- eng1, eng2; eng1 <- intern
    return spark.createDataFrame(
        [
            Row(name="ceo", reports_to=None),
            Row(name="vp1", reports_to="ceo"),
            Row(name="vp2", reports_to="ceo"),
            Row(name="eng1", reports_to="vp1"),
            Row(name="eng2", reports_to="vp1"),
            Row(name="intern", reports_to="eng1"),
        ]
    )


def test_graph_lookup_walks_ancestor_chain(spark):
    emp = _org_chart(spark)
    out = apply_pipeline(
        emp,
        '[{"$graphLookup": {"from": "emp", "startWith": "$reports_to",'
        ' "connectFromField": "reports_to", "connectToField": "name",'
        ' "as": "chain", "depthField": "d"}}]',
        tables={"emp": emp},
    ).collect()
    chains = {
        r.name: sorted((e.name, e.d) for e in r.chain) for r in out
    }
    assert chains["intern"] == [("ceo", 2), ("eng1", 0), ("vp1", 1)]
    assert chains["eng1"] == [("ceo", 1), ("vp1", 0)]
    assert chains["vp1"] == [("ceo", 0)]
    assert chains["ceo"] == []  # startWith null -> empty array, not null


def test_graph_lookup_max_depth_bounds_walk(spark):
    emp = _org_chart(spark)
    out = apply_pipeline(
        emp,
        '[{"$graphLookup": {"from": "emp", "startWith": "$reports_to",'
        ' "connectFromField": "reports_to", "connectToField": "name",'
        ' "as": "chain", "maxDepth": 0}}]',
        tables={"emp": emp},
    ).collect()
    chains = {r.name: sorted(e.name for e in r.chain) for r in out}
    assert chains["intern"] == ["eng1"]  # depth 0 = direct manager only
    assert chains["ceo"] == []


def test_graph_lookup_terminates_on_cycles(spark):
    g = spark.createDataFrame(
        [Row(node="a", nxt="b"), Row(node="b", nxt="c"), Row(node="c", nxt="a")]
    )
    start = spark.createDataFrame([Row(s="a")])
    out = apply_pipeline(
        start,
        '[{"$graphLookup": {"from": "g", "startWith": "$s",'
        ' "connectFromField": "nxt", "connectToField": "node",'
        ' "as": "reach"}}]',
        tables={"g": g},
    ).collect()
    assert sorted(e.node for e in out[0].reach) == ["a", "b", "c"]


def test_graph_lookup_default_cap_raises_without_max_depth(spark):
    # a 30-deep chain exceeds the 20-level engine cap
    chain = spark.createDataFrame(
        [Row(node=i, nxt=i + 1) for i in range(30)]
    )
    start = spark.createDataFrame([Row(s=0)])
    pipe = (
        '[{"$graphLookup": {"from": "g", "startWith": "$s",'
        ' "connectFromField": "nxt", "connectToField": "node",'
        ' "as": "reach"}}]'
    )
    with pytest.raises(ValueError, match="maxDepth"):
        apply_pipeline(start, pipe, tables={"g": chain})


# ---------- $out ---------------------------------------------------------------


def test_out_materializes_and_is_terminal(spark, docs, tmp_path):
    target = str(tmp_path / "outcoll")
    out = apply_pipeline(
        docs,
        '[{"$match": {"op": "insert"}}, {"$project": {"repo": 1, "path": 1}},'
        ' {"$out": "dst"}]',
        tables={"dst": target},
    )
    assert sorted(r.path for r in out.collect()) == ["a.py", "d.go"]
    assert sorted(
        r.path for r in spark.read.parquet(target).collect()
    ) == ["a.py", "d.go"]
    # $out replaces, not appends
    apply_pipeline(
        docs,
        '[{"$match": {"op": "delete"}}, {"$project": {"path": 1}}, {"$out": "dst"}]',
        tables={"dst": target},
    )
    assert [r.path for r in spark.read.parquet(target).collect()] == ["c.go"]
    with pytest.raises(ValueError, match="last"):
        apply_pipeline(docs, '[{"$out": "dst"}, {"$limit": 1}]', tables={"dst": target})


# ---------- aggregation expression language ------------------------------------


def _one(spark, expr_json, **cols):
    """Evaluate one $addFields expression over a single-row frame.
    None-valued columns get an int type (inference can't see through null)."""
    import datetime
    import json as _json

    if cols:
        types = {str: "string", int: "bigint", float: "double", bool: "boolean",
                 list: "array<bigint>", datetime.datetime: "timestamp"}
        ddl = ", ".join(
            f"{k} {types.get(type(v), 'int') if v is not None else 'int'}"
            for k, v in cols.items()
        )
        df = spark.createDataFrame([tuple(cols.values())], schema=ddl)
    else:
        df = spark.range(1)
    out = apply_pipeline(
        df, _json.dumps([{"$addFields": {"out": _json.loads(expr_json)}}])
    )
    return out.collect()[0]["out"]


def test_expr_arithmetic_goldens(spark):
    assert _one(spark, '{"$add": ["$a", "$b", 2]}', a=3, b=4) == 9
    assert _one(spark, '{"$subtract": ["$a", "$b"]}', a=3, b=4) == -1
    assert _one(spark, '{"$multiply": ["$a", "$b", -1]}', a=3, b=4) == -12
    assert _one(spark, '{"$divide": ["$a", "$b"]}', a=3, b=4) == 0.75
    assert _one(spark, '{"$mod": ["$a", "$b"]}', a=-7, b=4) == -3  # dividend sign
    assert _one(spark, '{"$abs": "$a"}', a=-5) == 5
    assert _one(spark, '{"$trunc": "$a"}', a=-2.7) == -2  # toward zero
    assert _one(spark, '{"$round": ["$a", 1]}', a=2.347) == 2.3
    assert _one(spark, '{"$pow": ["$a", 3]}', a=2) == 8
    # null propagates, like Mongo
    assert _one(spark, '{"$add": ["$a", 1]}', a=None) is None


def test_expr_string_goldens(spark):
    assert _one(spark, '{"$concat": ["$a", "-", "$b"]}', a="x", b="y") == "x-y"
    assert _one(spark, '{"$toUpper": "$a"}', a="aB") == "AB"
    assert _one(spark, '{"$strLenCP": "$a"}', a="héllo") == 5
    assert _one(spark, '{"$substrCP": ["$a", 1, 3]}', a="abcdef") == "bcd"
    assert _one(spark, '{"$split": ["$a", "."]}', a="a.b.c") == ["a", "b", "c"]
    assert _one(spark, '{"$trim": {"input": "$a"}}', a="  x ") == "x"
    assert (
        _one(spark, '{"$trim": {"input": "$a", "chars": "*"}}', a="**x**") == "x"
    )
    assert (
        _one(spark, '{"$replaceAll": {"input": "$a", "find": ".", "replacement": "_"}}',
             a="a.b.c") == "a_b_c"
    )
    assert _one(spark, '{"$toString": "$a"}', a=42) == "42"
    assert _one(spark, '{"$concat": ["$a", null]}', a="x") is None  # null propagates


def test_expr_comparison_bool_cond(spark):
    assert _one(spark, '{"$eq": ["$a", 3]}', a=3) is True
    assert _one(spark, '{"$ne": ["$a", null]}', a=1) is True
    assert _one(spark, '{"$cmp": ["$a", "$b"]}', a=2, b=9) == -1
    # Mongo truthiness: null is falsy inside $and / $cond / $expr
    assert _one(spark, '{"$and": ["$a", true]}', a=None) is False
    assert _one(spark, '{"$or": ["$a", false]}', a=None) is False
    assert _one(spark, '{"$not": "$a"}', a=None) is True
    assert (
        _one(spark, '{"$cond": {"if": "$a", "then": "T", "else": "F"}}', a=None)
        == "F"
    )
    assert _one(spark, '{"$cond": ["$a", "T", "F"]}', a=True) == "T"
    assert _one(spark, '{"$ifNull": ["$a", "$b", 7]}', a=None, b=None) == 7
    got = _one(
        spark,
        '{"$switch": {"branches": ['
        ' {"case": {"$gt": ["$a", 10]}, "then": "big"},'
        ' {"case": {"$gt": ["$a", 5]}, "then": "mid"}], "default": "small"}}',
        a=7,
    )
    assert got == "mid"


def test_expr_arrays_and_dates(spark):
    import datetime

    assert _one(spark, '{"$size": "$a"}', a=[1, 2, 3]) == 3
    assert _one(spark, '{"$arrayElemAt": ["$a", 0]}', a=[10, 20, 30]) == 10
    assert _one(spark, '{"$arrayElemAt": ["$a", -1]}', a=[10, 20, 30]) == 30
    assert _one(spark, '{"$slice": ["$a", 2]}', a=[1, 2, 3, 4]) == [1, 2]
    assert _one(spark, '{"$slice": ["$a", -2]}', a=[1, 2, 3, 4]) == [3, 4]
    assert _one(spark, '{"$slice": ["$a", 1, 2]}', a=[1, 2, 3, 4]) == [2, 3]
    assert _one(spark, '{"$in": [2, "$a"]}', a=[1, 2]) is True
    assert _one(spark, '{"$concatArrays": ["$a", [9]]}', a=[1]) == [1, 9]
    ts = datetime.datetime(2026, 8, 19, 14, 45, 9)
    assert _one(spark, '{"$year": "$t"}', t=ts) == 2026
    assert _one(spark, '{"$dayOfWeek": "$t"}', t=ts) == 4  # Wed; 1 = Sunday
    assert _one(spark, '{"$minute": "$t"}', t=ts) == 45


def test_expr_literal_escape_and_unknown_op(spark):
    assert _one(spark, '{"$literal": "$a"}', a="x") == "$a"
    with pytest.raises(ValueError, match="unsupported aggregation expression"):
        _one(spark, '{"$dateFromParts": {}}', a=1)


def test_expr_in_match_group_and_project(spark):
    df = spark.createDataFrame(
        [Row(k="a", x=1, y=10), Row(k="a", x=4, y=2), Row(k="b", x=5, y=5)]
    )
    # $expr predicate: x > y
    out = apply_pipeline(df, '[{"$match": {"$expr": {"$gt": ["$x", "$y"]}}}]')
    assert sorted((r.k, r.x) for r in out.collect()) == [("a", 4)]
    # expression inside a $group accumulator
    out = apply_pipeline(
        df,
        '[{"$group": {"_id": "$k", "s": {"$sum": {"$multiply": ["$x", "$y"]}}}}]',
    )
    assert {r._id: r.s for r in out.collect()} == {"a": 18, "b": 25}
    # computed $project field alongside an included one
    out = apply_pipeline(
        df, '[{"$project": {"k": 1, "z": {"$add": ["$x", "$y"]}}}]'
    )
    assert out.columns == ["k", "z"]
    assert sorted(r.z for r in out.collect()) == [6, 10, 11]


def test_window_fields_accumulator_accepts_expressions(spark):
    df = spark.createDataFrame(
        [Row(k="a", x=1, y=2), Row(k="a", x=3, y=4), Row(k="b", x=5, y=6)]
    )
    out = apply_pipeline(
        df,
        '[{"$setWindowFields": {"partitionBy": "$k", "sortBy": {"x": 1},'
        ' "output": {"s": {"$sum": {"$multiply": ["$x", "$y"]}}}}}]',
    )
    got = {(r.k, r.x): r.s for r in out.collect()}
    assert got == {("a", 1): 14, ("a", 3): 14, ("b", 5): 30}


def test_expr_let_binds_and_shadows(spark):
    # $let: bound var usable in the body, computed once per reference site
    got = _one(
        spark,
        '{"$let": {"vars": {"t": {"$add": ["$a", 1]}},'
        ' "in": {"$multiply": ["$$t", "$$t"]}}}',
        a=3,
    )
    assert got == 16
    # inner $let shadows the outer binding of the same name
    got = _one(
        spark,
        '{"$let": {"vars": {"t": 1}, "in":'
        ' {"$let": {"vars": {"t": 10}, "in": {"$add": ["$$t", "$a"]}}}}}',
        a=5,
    )
    assert got == 15
    # unbound variable is a compile-time error, not a runtime null
    with pytest.raises(ValueError, match="unbound variable"):
        _one(spark, '{"$add": ["$$nope", 1]}', a=1)


def test_expr_map_filter_reduce(spark):
    assert _one(
        spark,
        '{"$map": {"input": "$a", "as": "v", "in": {"$multiply": ["$$v", 2]}}}',
        a=[1, 2, 3],
    ) == [2, 4, 6]
    # default variable name is $$this
    assert _one(
        spark,
        '{"$map": {"input": "$a", "in": {"$add": ["$$this", 1]}}}',
        a=[1, 2],
    ) == [2, 3]
    assert _one(
        spark,
        '{"$filter": {"input": "$a", "cond": {"$gt": ["$$this", 1]}}}',
        a=[1, 2, 3],
    ) == [2, 3]
    # Mongo truthiness inside cond: null element is falsy, not an error
    bools = spark.createDataFrame(
        [([True, None, False, True],)], schema="a array<boolean>"
    )
    out = apply_pipeline(
        bools, '[{"$addFields": {"out": {"$filter": {"input": "$a", "cond": "$$this"}}}}]'
    )
    assert out.collect()[0]["out"] == [True, True]
    assert _one(
        spark,
        '{"$filter": {"input": "$a", "cond": {"$gt": ["$$this", 0]}, "limit": 2}}',
        a=[5, -1, 6, 7],
    ) == [5, 6]
    assert _one(
        spark,
        '{"$reduce": {"input": "$a", "initialValue": 0,'
        ' "in": {"$add": ["$$value", "$$this"]}}}',
        a=[1, 2, 3],
    ) == 6
    strs = spark.createDataFrame([(["x", "y", "z"],)], schema="a array<string>")
    out = apply_pipeline(
        strs,
        '[{"$addFields": {"out": {"$reduce": {"input": "$a", "initialValue": "",'
        ' "in": {"$concat": ["$$value", "$$this"]}}}}}]',
    )
    assert out.collect()[0]["out"] == "xyz"
    # nested HOFs: map over structs, reading a subfield of the lambda var
    df = spark.createDataFrame(
        [Row(a=[Row(n=1, s="p"), Row(n=4, s="q")])]
    )
    out = apply_pipeline(
        df,
        '[{"$addFields": {"out": {"$map": {"input": "$a", "as": "e",'
        ' "in": {"$multiply": ["$$e.n", 10]}}}}}]',
    )
    assert out.collect()[0]["out"] == [10, 40]


def test_expr_hofs_stay_jvm_side(spark):
    # the compiled plan must contain no Python evaluation node
    df = spark.createDataFrame([Row(a=[1, 2, 3])])
    out = apply_pipeline(
        df,
        '[{"$addFields": {"out": {"$reduce": {"input":'
        ' {"$filter": {"input": {"$map": {"input": "$a", "in":'
        ' {"$multiply": ["$$this", 2]}}}, "cond": {"$gt": ["$$this", 2]}}},'
        ' "initialValue": 0, "in": {"$add": ["$$value", "$$this"]}}}}}]',
    )
    assert out.collect()[0]["out"] == 10
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_expr_date_family(spark):
    import datetime

    ts = datetime.datetime(2026, 8, 19, 14, 45, 9)
    assert _one(spark, '{"$dateTrunc": {"date": "$t", "unit": "month"}}',
                t=ts) == datetime.datetime(2026, 8, 1)
    assert _one(spark, '{"$dateAdd": {"startDate": "$t", "unit": "day",'
                ' "amount": 3}}', t=ts) == datetime.datetime(2026, 8, 22, 14, 45, 9)
    # $dateDiff counts boundary crossings: 23:59 -> 00:01 is one day
    df = spark.createDataFrame(
        [Row(s=datetime.datetime(2026, 1, 1, 23, 59),
             e=datetime.datetime(2026, 1, 2, 0, 1))]
    )
    out = apply_pipeline(
        df,
        '[{"$addFields": {"d": {"$dateDiff": {"startDate": "$s",'
        ' "endDate": "$e", "unit": "day"}},'
        ' "h": {"$dateDiff": {"startDate": "$s", "endDate": "$e",'
        ' "unit": "hour"}}}}]',
    )
    row = out.collect()[0]
    assert row.d == 1 and row.h == 1
    assert _one(
        spark,
        '{"$dateToString": {"date": "$t", "format": "%Y-%m-%d %H:%M:%S"}}',
        t=ts,
    ) == "2026-08-19 14:45:09"
    # default format is the Mongo ISO form with millis
    assert _one(spark, '{"$dateToString": {"date": "$t"}}', t=ts) == (
        "2026-08-19T14:45:09.000Z"
    )
    assert _one(spark, '{"$toDate": "$a"}', a="2026-08-19 00:00:00") == (
        datetime.datetime(2026, 8, 19)
    )
    with pytest.raises(ValueError, match="unit must be one of"):
        _one(spark, '{"$dateTrunc": {"date": "$t", "unit": "week"}}', t=ts)
    with pytest.raises(ValueError, match="specifier"):
        _one(spark, '{"$dateToString": {"date": "$t", "format": "%q"}}', t=ts)


def test_group_stddev_median_accumulators(spark):
    df = spark.createDataFrame(
        [Row(k="a", x=2.0), Row(k="a", x=4.0), Row(k="a", x=6.0),
         Row(k="b", x=10.0)]
    )
    out = apply_pipeline(
        df,
        '[{"$group": {"_id": "$k", "sp": {"$stdDevPop": "$x"},'
        ' "ss": {"$stdDevSamp": "$x"}, "md": {"$median": "$x"}}}]',
    )
    got = {r._id: r for r in out.collect()}
    assert got["a"].sp == pytest.approx((8 / 3) ** 0.5)
    assert got["a"].ss == pytest.approx(2.0)
    assert got["a"].md == 4.0
    # single-element group: population stddev 0, sample stddev null (Mongo)
    assert got["b"].sp == 0.0 and got["b"].ss is None


def test_expr_set_and_array_ops(spark):
    assert _one(spark, '{"$reverseArray": "$a"}', a=[1, 2, 3]) == [3, 2, 1]
    assert _one(spark, '{"$indexOfArray": ["$a", 20]}', a=[10, 20, 30]) == 1
    assert _one(spark, '{"$indexOfArray": ["$a", 99]}', a=[10, 20, 30]) == -1
    assert _one(spark, '{"$range": [0, 5]}', a=1) == [0, 1, 2, 3, 4]
    assert _one(spark, '{"$range": [5, 0, -2]}', a=1) == [5, 3, 1]
    assert _one(spark, '{"$range": [0, 0]}', a=1) == []
    assert _one(spark, '{"$range": [3, 0]}', a=1) == []  # wrong-sign default step
    assert _one(spark, '{"$setUnion": ["$a", [2, 9]]}', a=[1, 2, 1]) == [1, 2, 9]
    assert _one(spark, '{"$setUnion": ["$a"]}', a=[3, 1, 3]) == [1, 3]  # dedups
    assert _one(spark, '{"$setIntersection": ["$a", [2, 3, 4]]}',
                a=[1, 2, 3]) == [2, 3]
    assert _one(spark, '{"$setDifference": ["$a", [2]]}', a=[1, 2, 3, 1]) == [1, 3]
    assert _one(spark, '{"$setIsSubset": [[1, 2], "$a"]}', a=[1, 2, 3]) is True
    assert _one(spark, '{"$setIsSubset": [[1, 9], "$a"]}', a=[1, 2, 3]) is False


def test_expr_regex_match(spark):
    assert _one(spark, '{"$regexMatch": {"input": "$a", "regex": "^src/.*\\\\.py$"}}',
                a="src/m.py") is True
    assert _one(spark, '{"$regexMatch": {"input": "$a", "regex": "^SRC"}}',
                a="src/m.py") is False
    assert _one(spark, '{"$regexMatch": {"input": "$a", "regex": "^SRC",'
                ' "options": "i"}}', a="src/m.py") is True
    with pytest.raises(ValueError, match="options"):
        _one(spark, '{"$regexMatch": {"input": "$a", "regex": "x", "options": "g"}}',
             a="x")
    with pytest.raises(ValueError, match="literal"):
        _one(spark, '{"$regexMatch": {"input": "$a", "regex": {"$concat": ["x"]}}}',
             a="x")
