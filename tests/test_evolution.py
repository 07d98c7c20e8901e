"""Schema evolution: `lang` column appears mid-stream (FIXTURES.md §4.6).
Pre-evolution chunks physically lack the column; the engine must evolve the
manifest schema (ADD COLUMN analog) and union-by-name — mirroring the
watcher passing unknown payload fields through untouched
(/root/reference/internal/mongo/event.go:31-33)."""

from pyspark.sql import functions as F

from kafka_mongo_watcher_spark.datagen import generate_events, write_event_log
from kafka_mongo_watcher_spark.operators.envelope import transform_events
from kafka_mongo_watcher_spark.oracle import oracle_rows
from kafka_mongo_watcher_spark.plans.lake import LakeTable
from kafka_mongo_watcher_spark.sources.events import read_event_log

FINAL_COLS = ["repo", "path", "commit", "lang", "content_sha256"]


def test_lang_column_added_mid_stream(spark, tmp_path):
    n = 3000
    evolution_seq = int(n * 0.5)
    ev = generate_events(spark, n, evolution_frac=0.5)
    rows = [r.asDict() for r in ev.collect()]
    dirs = write_event_log(ev, str(tmp_path / "log"), n_chunks=4, evolution_seq=evolution_seq)

    # table created WITHOUT lang — it must be learned from the stream
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        n_buckets=8,
        user_schema=[
            ("repo", "string"), ("path", "string"), ("commit", "string"),
            ("content", "string"), ("content_sha256", "string"),
        ],
    )
    saw_no_lang_chunk = False
    for i, d in enumerate(dirs):
        chunk = read_event_log(spark, d)
        if "lang" not in chunk.columns:
            saw_no_lang_chunk = True
            assert "lang" not in [n_ for n_, _ in t.manifest["user_schema"]]
        t.merge(transform_events(chunk), source_id="s", batch_id=i)
    assert saw_no_lang_chunk, "fixture must include a pre-evolution chunk"
    assert "lang" in [n_ for n_, _ in t.manifest["user_schema"]]

    got = {tuple(r) for r in t.snapshot().select(*FINAL_COLS).collect()}
    assert got == oracle_rows(rows)
    # keys last written pre-evolution have null lang; post-evolution non-null
    snap = t.snapshot()
    assert snap.filter(F.col("commit_seq") >= evolution_seq).filter(F.col("lang").isNull()).count() == 0
    pre = snap.filter(F.col("commit_seq") < evolution_seq)
    if pre.count():
        assert pre.filter(F.col("lang").isNotNull()).count() == 0
