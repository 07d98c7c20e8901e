"""Pure-Python XXH64 matching Spark's `xxhash64(...)` expression.

`LakeTable.lookup` needs the key's bucket — pmod(xxhash64(repo, path), B) —
*driver-side*, so a point read costs zero Spark jobs before the pruned scan
(VERDICT r1 §wrong 4: the old code ran a one-row Spark job per lookup).

Spark chains multi-argument xxhash64 as
    h = 42; for col in cols: h = XXH64(utf8_bytes(col), seed=h)
(org.apache.spark.sql.catalyst.expressions.XxHash64 over
 XXH64.hashUnsafeBytes), which for byte strings is the standard XXH64
algorithm (public spec, https://github.com/Cyan4973/xxHash). Equality with
the Spark expression is asserted in tests/test_lake_merge.py.
"""

from __future__ import annotations

_M = 0xFFFFFFFFFFFFFFFF
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    """Standard XXH64 of `data` with `seed`, as unsigned 64-bit."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64_strings(values: list[str], seed: int = 42) -> int:
    """Spark's xxhash64(col1, col2, ...) over string columns, as a SIGNED
    64-bit int (Spark LongType semantics)."""
    h = seed
    for v in values:
        h = xxh64(v.encode("utf-8"), h)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_pmod_bucket(values: list[str], n_buckets: int, seed: int = 42) -> int:
    """pmod(xxhash64(*values), n_buckets) exactly as Spark computes it."""
    return spark_xxhash64_strings(values, seed) % n_buckets


def spark_xxhash64_ints(values: list[int], seed: int = 42) -> int:
    """Spark's xxhash64(col1, col2, ...) over IntegerType columns, as a
    SIGNED 64-bit int.

    Spark's XXH64.hashInt specialization is exactly standard XXH64 of the
    value's 4 little-endian bytes (the <32-byte tail path), so the generic
    xxh64() applies. Equality with the Spark expression is asserted in
    tests/test_training_ops.py."""
    h = seed
    for v in values:
        h = xxh64((v & 0xFFFFFFFF).to_bytes(4, "little"), h)
    return h - (1 << 64) if h >= (1 << 63) else h
