"""Differential test for the `$match` compiler: 80 randomized predicate
documents evaluated two ways — compiled to Catalyst via `compile_match`, and
by a 30-line pure-Python evaluator of Mongo's documented semantics (missing
fields match negations, positive comparisons never match null, `$in` with
null matches null, `$nor` matches rows failing every clause).

All 80 predicates are checked in ONE Spark job: each compiles to a boolean
column over the same 48-row frame, collected once. Catching a three-valued-
logic slip (Spark null vs Mongo missing-field) is exactly what this is for.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from kafka_mongo_watcher_spark.operators.pipeline import compile_match

FIELDS = {"a": "int", "b": "str"}
INTS = [None, -3, 0, 1, 2, 5, 9]
STRS = [None, "", "x", "yy", "zzz"]


def _rows():
    rows = []
    rid = 0
    for a in INTS:
        for b in STRS:
            rows.append({"rid": rid, "a": a, "b": b})
            rid += 1
    # a fuzz handful with both nulls duplicated
    rows.append({"rid": rid, "a": None, "b": None})
    return rows


def _vals(field, rng):
    pool = INTS if FIELDS[field] == "int" else STRS
    return rng.choice([v for v in pool])


def _rand_field_cond(rng):
    field = rng.choice(list(FIELDS))
    kind = rng.choice(
        ["eq_implicit", "$eq", "$ne", "$gt", "$gte", "$lt", "$lte",
         "$in", "$nin", "$exists", "$not"]
    )
    if kind == "eq_implicit":
        return field, _vals(field, rng)
    if kind == "$exists":
        return field, {"$exists": rng.choice([True, False])}
    if kind in ("$in", "$nin"):
        n = rng.randint(0, 3)
        return field, {kind: [_vals(field, rng) for _ in range(n)]}
    if kind == "$not":
        op = rng.choice(["$eq", "$gt", "$lte", "$in"])
        v = [_vals(field, rng)] if op == "$in" else _vals(field, rng)
        return field, {"$not": {op: v}}
    v = _vals(field, rng)
    if kind in ("$gt", "$gte", "$lt", "$lte") and v is None:
        v = _vals(field, rng) or 0 if FIELDS[field] == "int" else "x"
    return field, {kind: v}


def _rand_match_doc(rng, depth=0):
    if depth < 1 and rng.random() < 0.35:
        comb = rng.choice(["$and", "$or", "$nor"])
        return {comb: [_rand_match_doc(rng, depth + 1) for _ in range(rng.randint(1, 3))]}
    doc = {}
    for _ in range(rng.randint(1, 2)):
        f, cond = _rand_field_cond(rng)
        doc[f] = cond
    return doc


# ---- pure-Python evaluator of Mongo $match semantics ------------------------


def _cmp_op(op, x, v):
    if op == "$eq":
        return x == v
    if op == "$ne":
        return x != v  # matches missing/null unless v is null
    if x is None or v is None:
        return False  # positive comparison never matches a missing field
    if op == "$gt":
        return x > v
    if op == "$gte":
        return x >= v
    if op == "$lt":
        return x < v
    if op == "$lte":
        return x <= v
    raise AssertionError(op)


def _eval_field(doc, field, spec):
    x = doc.get(field)
    if isinstance(spec, dict) and any(k.startswith("$") for k in spec):
        ok = True
        for op, v in spec.items():
            if op == "$not":
                sub = not _eval_field(doc, field, v)
            elif op == "$exists":
                sub = (x is not None) if v else (x is None)
            elif op == "$in":
                sub = x in v
            elif op == "$nin":
                sub = x not in v
            else:
                sub = _cmp_op(op, x, v)
            ok = ok and sub
        return ok
    return x == spec


def _eval_match(doc, mdoc):
    ok = True
    for key, spec in mdoc.items():
        if key == "$and":
            sub = all(_eval_match(doc, d) for d in spec)
        elif key == "$or":
            sub = any(_eval_match(doc, d) for d in spec)
        elif key == "$nor":
            sub = not any(_eval_match(doc, d) for d in spec)
        else:
            sub = _eval_field(doc, key, spec)
        ok = ok and sub
    return ok


def test_match_compiler_agrees_with_mongo_semantics_evaluator(spark):
    rng = random.Random(20260819)
    rows = _rows()
    df = spark.createDataFrame(rows, schema="rid int, a int, b string")
    specs = [_rand_match_doc(rng) for _ in range(80)]
    cols = [F.col("rid")] + [
        F.coalesce(compile_match(s), F.lit(False)).alias(f"m{i}")
        for i, s in enumerate(specs)
    ]
    got = {r["rid"]: r for r in df.select(*cols).collect()}
    for i, spec in enumerate(specs):
        for doc in rows:
            expect = _eval_match(doc, spec)
            actual = bool(got[doc["rid"]][f"m{i}"])
            assert actual == expect, (
                f"spec {i} {spec!r} on doc {doc!r}: catalyst={actual} "
                f"python={expect}"
            )
