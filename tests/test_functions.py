"""Unit tests for the vectorized transforms — golden-value strategy mirroring
the reference's byte-exact serialized-envelope asserts
(/root/reference/internal/mongo/transformer_test.go:44,52)."""

import hashlib

from pyspark.sql import functions as F

from kafka_mongo_watcher_spark.functions.content import (
    normalize_and_fingerprint,
    normalize_content_py,
    sha256_hex_py,
)

GOLDEN = [
    # (raw, normalized)
    ("def f(x):  \r\n    return x  \n", "def f(x):\n    return x\n"),
    ("a\rb\r\nc", "a\nb\nc\n"),
    ("", ""),
    ("x\n\n\n", "x\n"),
    ("café", "café\n"),  # NFC composition
    ("   ", "\n" if "   ".rstrip() else ""),  # whitespace-only line → empty
    # ASCII fast-path edges (JVM regexp chain must match python rstrip():
    # \v \f and FS/GS/RS/US are whitespace to str.rstrip)
    ("a\t\x0b\x0c\x1c\x1d\x1e\x1f \nb", "a\nb\n"),
    ("a \t\n \n\t\n", "a\n"),
    ("x\r", "x\n"),
    ("\n\n\n", ""),
    ("a\x00b", "a\x00b\n"),  # NUL is not whitespace, must survive
    ("mixed é ascii  \nend\r\n", "mixed é ascii\nend\n"),  # non-ASCII row -> UDF path
]


def test_normalize_golden():
    for raw, want in GOLDEN:
        assert normalize_content_py(raw) == want, raw


def test_normalize_idempotent():
    for raw, _ in GOLDEN:
        once = normalize_content_py(raw)
        assert normalize_content_py(once) == once


def test_sha256_py_golden():
    assert (
        sha256_hex_py("def f(x):\n    return x\n")
        == hashlib.sha256(b"def f(x):\n    return x\n").hexdigest()
    )
    assert sha256_hex_py(None) is None


def test_pandas_udf_matches_python_and_jvm_sha(spark):
    rows = [(r,) for r, _ in GOLDEN] + [(None,)]
    df = spark.createDataFrame(rows, "raw string")
    out = (
        df.withColumn("_nf", normalize_and_fingerprint(F.col("raw")))
        .select(
            "raw",
            F.col("_nf.content").alias("content"),
            F.col("_nf.content_sha256").alias("sha_udf"),
            F.sha2(F.col("_nf.content"), 256).alias("sha_jvm"),
        )
        .collect()
    )
    for r in out:
        assert r["content"] == normalize_content_py(r["raw"]), repr(r["raw"])
        assert r["sha_udf"] == sha256_hex_py(r["content"])
        if r["content"] is not None:
            assert r["sha_udf"] == r["sha_jvm"]  # pandas UDF == JVM sha2


def test_ascii_fast_path_fuzz_matches_python(spark):
    """Seeded fuzz over ASCII (incl. control chars): the Catalyst fast path
    must be byte-identical to normalize_content_py for every input."""
    import random

    rng = random.Random(20260817)
    alphabet = "ab \t\r\n\x0b\x0c\x1c\x1f~{}#"
    rows = [
        ("".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40))),)
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "raw string")
    out = (
        df.withColumn("_nf", normalize_and_fingerprint(F.col("raw")))
        .select("raw", "_nf.content", "_nf.content_sha256")
        .collect()
    )
    for r in out:
        assert r["content"] == normalize_content_py(r["raw"]), repr(r["raw"])
        assert r["content_sha256"] == sha256_hex_py(r["content"])
