"""Custom aggregation-pipeline compiler (F1 `$match` + F2 `$addFields` + F3
variables, as ONE surface).

The reference accepts a user-supplied JSON aggregation pipeline
(`MONGODB_CUSTOM_PIPELINE`, /root/reference/README.md:94, e.g.
`[ {"$match": {"fullDocument.is_active": true}},
   {"$addFields": {"custom-field": "custom-value"}} ]`), substitutes
`%currentTimestamp%` into the raw JSON *before* parsing
(/root/reference/internal/mongo/variables/replace.go:24-30), and hands the
parsed stages to the server (watch_producer_test.go:149-199,
replay_producer_test.go:175).

Spark-first re-expression: the pipeline compiles to a chain of Catalyst
projections/filters at PLAN BUILD time on the driver. `$match` predicates
are ordinary Column expressions, so Catalyst pushes them into the parquet
scan (PushedFilters) exactly as Mongo evaluates them server-side; `$unset` /
`$project` are declarative column pruning, so dropped fields are never read.
Nothing here runs per row in Python.

Supported stages (the reference's documented surface plus the adjacent
Mongo basics a pipeline user expects): `$match`, `$addFields` (alias
`$set`), `$unset`, `$project` (include-only or exclude-only, as in Mongo),
`$limit`. Unknown stages raise — a silently-dropped stage would diverge
from the reference, which forwards the stage to the server.

`$match` operators: implicit equality, `$eq $ne $gt $gte $lt $lte $in $nin
$exists $regex $not`, and top-level `$and $or $nor`. Values are literals
(Mongo `$match` semantics — field references need `$expr`, unsupported).
Null semantics follow Mongo's missing-field rules: positive comparisons
(`$gt`, `$regex`, `$in`, …) never match a null field, while the NEGATION
operators (`$ne $nin $not $nor`) DO match it (Mongo negations match
documents where the field is missing) — so each negation wraps its operand
null-safely instead of letting Spark's three-valued logic drop the row.

`$addFields` values: JSON literals, `"$path"` field references, and nested
documents (compiled to structs). Dotted *source* paths navigate structs
(`F.col("a.b")`); a dotted *target* updates a field inside an existing
struct column via `withField` (Mongo nests the same way). `%variables%` in
the raw JSON are substituted before parsing, matching the reference's
replace-then-parse order — a substituted value inside a JSON string stays a
string, byte-for-byte like replace.go.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_mongo_watcher_spark.functions.variables import replace_variables

def _in(c: Column, vals: list) -> Column:
    # Mongo: `$in` containing null matches a missing/null field.
    nonnull = [x for x in vals if x is not None]
    e = c.isin(*nonnull) if nonnull else F.lit(False)
    if any(x is None for x in vals):
        e = e | c.isNull()
    return F.coalesce(e, F.lit(False))


_CMP = {
    # eqNullSafe: equality against JSON null matches the null field (Mongo:
    # {f: null} matches docs where f is null or missing).
    "$eq": lambda c, v: c.eqNullSafe(F.lit(v)),
    # negation is null-safe: {$ne: 5} MATCHES a null field, {$ne: null} not.
    "$ne": lambda c, v: ~c.eqNullSafe(F.lit(v)),
    "$gt": lambda c, v: c > F.lit(v),
    "$gte": lambda c, v: c >= F.lit(v),
    "$lt": lambda c, v: c < F.lit(v),
    "$lte": lambda c, v: c <= F.lit(v),
    "$in": _in,
    "$nin": lambda c, v: ~_in(c, v),
    "$exists": lambda c, v: c.isNotNull() if v else c.isNull(),
    "$regex": lambda c, v: c.rlike(v),
}


def _field(path: str) -> Column:
    # Dotted paths navigate nested structs, like Mongo's document paths.
    return F.col(path)


def _compile_field_cond(path: str, spec) -> Column:
    if isinstance(spec, dict) and any(k.startswith("$") for k in spec):
        cond = None
        for op, val in spec.items():
            if op == "$not":
                # Mongo $not matches when the operand does NOT match,
                # including missing fields — null-safe negation.
                sub = ~F.coalesce(_compile_field_cond(path, val), F.lit(False))
            elif op in _CMP:
                sub = _CMP[op](_field(path), val)
            else:
                raise ValueError(f"unsupported $match operator {op!r} on {path!r}")
            cond = sub if cond is None else (cond & sub)
        return cond
    # implicit equality; null literal matches missing/null, as Mongo does
    return _CMP["$eq"](_field(path), spec)


def compile_match(doc: dict) -> Column:
    """One `$match` document → one Column predicate (AND of its entries)."""
    cond = None
    for key, spec in doc.items():
        if key in ("$and", "$or", "$nor"):
            subs = [compile_match(d) for d in spec]
            if key == "$and":
                sub = subs[0]
                for s in subs[1:]:
                    sub = sub & s
            else:
                sub = subs[0]
                for s in subs[1:]:
                    sub = sub | s
                if key == "$nor":
                    # matches documents that FAIL every clause, null included
                    sub = ~F.coalesce(sub, F.lit(False))
        elif key.startswith("$"):
            raise ValueError(f"unsupported $match combinator {key!r}")
        else:
            sub = _compile_field_cond(key, spec)
        cond = sub if cond is None else (cond & sub)
    return cond if cond is not None else F.lit(True)


def _compile_value(spec) -> Column:
    """An `$addFields` value expression → Column.

    `"$path"` is a field reference (Mongo expression semantics); any other
    scalar is a literal; a list is an array literal (refs allowed inside);
    a dict without $-operators is an embedded document → struct.
    """
    if isinstance(spec, str) and spec.startswith("$"):
        return _field(spec[1:])
    if isinstance(spec, list):
        return F.array(*[_compile_value(v) for v in spec])
    if isinstance(spec, dict):
        bad = [k for k in spec if k.startswith("$")]
        if bad:
            raise ValueError(f"unsupported $addFields operator(s) {bad!r}")
        return F.struct(*[_compile_value(v).alias(k) for k, v in spec.items()])
    return F.lit(spec)


def _add_field(df: DataFrame, target: str, col: Column) -> DataFrame:
    if "." not in target:
        return df.withColumn(target, col)
    root, rest = target.split(".", 1)
    if root not in df.columns:
        raise ValueError(
            f"$addFields dotted target {target!r}: no struct column {root!r}"
        )
    return df.withColumn(root, F.col(root).withField(rest, col))


def _stage_match(df: DataFrame, doc: dict) -> DataFrame:
    return df.filter(compile_match(doc))


def _stage_add_fields(df: DataFrame, doc: dict) -> DataFrame:
    for target, spec in doc.items():
        df = _add_field(df, target, _compile_value(spec))
    return df


def _stage_unset(df: DataFrame, spec) -> DataFrame:
    names = [spec] if isinstance(spec, str) else list(spec)
    return df.drop(*names)


def _stage_project(df: DataFrame, doc: dict) -> DataFrame:
    includes = [k for k, v in doc.items() if v in (1, True)]
    excludes = [k for k, v in doc.items() if v in (0, False)]
    if includes and excludes:
        raise ValueError("$project cannot mix inclusion and exclusion")
    if includes:
        return df.select(*includes)
    return df.drop(*excludes)


_STAGES = {
    "$match": _stage_match,
    "$addFields": _stage_add_fields,
    "$set": _stage_add_fields,
    "$unset": _stage_unset,
    "$project": _stage_project,
    "$limit": lambda df, n: df.limit(int(n)),
}


def compile_pipeline(
    pipeline_json: str, *, now: Callable[[], float] | None = None
) -> Callable[[DataFrame], DataFrame]:
    """JSON pipeline string → reusable DataFrame transform.

    Variable substitution happens HERE, on the raw JSON, before parsing —
    the reference's replace-then-parse order (service wiring passes the
    config string through variables.Replace before ParsePipeline). The
    returned closure is pure plan construction: applying it runs no job.
    """
    stages = json.loads(replace_variables(pipeline_json, now=now))
    if not isinstance(stages, list):
        raise ValueError("pipeline must be a JSON array of stages")
    compiled: list[tuple[Callable, object]] = []
    for i, stage in enumerate(stages):
        if not isinstance(stage, dict) or len(stage) != 1:
            raise ValueError(f"stage {i} must be a single-key document, got {stage!r}")
        (name, spec), = stage.items()
        if name not in _STAGES:
            raise ValueError(
                f"unsupported pipeline stage {name!r} (supported: {sorted(_STAGES)})"
            )
        compiled.append((_STAGES[name], spec))

    def _apply(df: DataFrame) -> DataFrame:
        for fn, spec in compiled:
            df = fn(df, spec)
        return df

    return _apply


def apply_pipeline(
    df: DataFrame, pipeline_json: str, *, now: Callable[[], float] | None = None
) -> DataFrame:
    """Parse + apply in one call (the common path)."""
    return compile_pipeline(pipeline_json, now=now)(df)
