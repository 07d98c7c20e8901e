"""Parquet-native Bloom-filter file skipping for point reads.

Scale rationale (100 TB): per-file key Bloom filters must be PAID FOR BY THE
WRITER — the merge job already has every row in memory, and parquet has a
native split-block Bloom filter (SBBF) the JVM writer emits per column chunk
when asked (`parquet.bloom.filter.enabled#<col>`), hashing at JVM speed with
zero extra read-back jobs, shuffles, or driver work at commit time. The
reader side then needs two small, spec-defined pieces this module provides
in pure Python (public parquet-format spec, no codec libs):

1. `bloom_locators(path)` — walk the parquet FOOTER thrift (TCompactProtocol,
   parquet-format.thrift FileMetaData) and return, per row group, each
   column's `bloom_filter_offset`/`bloom_filter_length`. Footer-only: no
   data pages are touched, same IO the existing `_footer_key_stats` already
   does at commit time.
2. `sbbf_probe_file(path, locators, col, value_bytes)` — range-read the SBBF
   bitset (one ~32-64 KB read per column chunk, cacheable) and probe it with
   XXH64(value, seed=0) exactly as parquet-format/BloomFilter.md specifies:
   block index from the upper 32 hash bits, one bit per 32-bit word from the
   eight salted lower-32 products.

`LakeTable._lookup_files` consults these to drop files whose Bloom filters
prove the key absent — after bucket pruning and min/max bounds, the
Iceberg-style third pruning level. False positives cost a redundant scan;
false negatives are impossible (every written value was hashed by the
writer), so pruning stays sound under MOR last-writer-wins.

Reference parity: etf1/kafka-mongo-watcher has no storage engine (produces
to Kafka, mongo/watcher.go:1); the lake read path is Spark-first design, so
these cites are to the public parquet-format spec instead.
"""

from __future__ import annotations

import os
import struct

from kafka_mongo_watcher_spark.functions.xxh import xxh64

_PAR1 = b"PAR1"

# TCompactProtocol wire types
_T_STOP = 0
_T_TRUE = 1
_T_FALSE = 2
_T_BYTE = 3
_T_I16 = 4
_T_I32 = 5
_T_I64 = 6
_T_DOUBLE = 7
_T_BINARY = 8
_T_LIST = 9
_T_SET = 10
_T_MAP = 11
_T_STRUCT = 12


class _Reader:
    """Minimal TCompactProtocol reader: just enough to walk structs, decode
    varints/zigzag/binary, and SKIP anything we don't care about."""

    __slots__ = ("b", "i")

    def __init__(self, b: bytes, i: int = 0) -> None:
        self.b = b
        self.i = i

    def varint(self) -> int:
        out = shift = 0
        while True:
            c = self.b[self.i]
            self.i += 1
            out |= (c & 0x7F) << shift
            if not c & 0x80:
                return out
            shift += 7

    def zigzag(self) -> int:
        n = self.varint()
        return (n >> 1) ^ -(n & 1)

    def binary(self) -> bytes:
        n = self.varint()
        out = self.b[self.i : self.i + n]
        self.i += n
        return out

    def field(self, last_fid: int) -> tuple[int, int]:
        """Next field header -> (field_id, wire_type); (0, STOP) at end."""
        byte = self.b[self.i]
        self.i += 1
        if byte == 0:
            return 0, _T_STOP
        t = byte & 0x0F
        delta = byte >> 4
        fid = last_fid + delta if delta else self.zigzag()
        return fid, t

    def list_header(self) -> tuple[int, int]:
        byte = self.b[self.i]
        self.i += 1
        n = byte >> 4
        if n == 15:
            n = self.varint()
        return n, byte & 0x0F

    def skip(self, t: int) -> None:
        if t in (_T_TRUE, _T_FALSE):
            return
        if t == _T_BYTE:
            self.i += 1
        elif t in (_T_I16, _T_I32, _T_I64):
            self.varint()
        elif t == _T_DOUBLE:
            self.i += 8
        elif t == _T_BINARY:
            n = self.varint()  # NOT `self.i += self.varint()`: augmented
            self.i += n        # assignment reads self.i BEFORE the call
        elif t in (_T_LIST, _T_SET):
            n, et = self.list_header()
            for _ in range(n):
                self.skip(et)
        elif t == _T_MAP:
            n = self.varint()
            if n:
                kv = self.b[self.i]
                self.i += 1
                for _ in range(n):
                    self.skip(kv >> 4)
                    self.skip(kv & 0x0F)
        elif t == _T_STRUCT:
            fid = 0
            while True:
                fid, ft = self.field(fid)
                if ft == _T_STOP:
                    return
                self.skip(ft)
        else:
            raise ValueError(f"unknown thrift compact type {t}")


def _walk_column_meta(r: _Reader) -> tuple[str | None, int | None, int | None]:
    """ColumnMetaData -> (dotted path_in_schema, bloom_offset, bloom_len)."""
    path = boff = blen = None
    fid = 0
    while True:
        fid, t = r.field(fid)
        if t == _T_STOP:
            return path, boff, blen
        if fid == 3 and t == _T_LIST:  # path_in_schema: list<string>
            n, et = r.list_header()
            parts = []
            for _ in range(n):
                parts.append(r.binary().decode() if et == _T_BINARY else r.skip(et))
            path = ".".join(p for p in parts if p is not None)
        elif fid == 14 and t == _T_I64:  # bloom_filter_offset
            boff = r.zigzag()
        elif fid == 15 and t == _T_I32:  # bloom_filter_length (incl. header)
            blen = r.zigzag()
        else:
            r.skip(t)


def _walk_column_chunk(r: _Reader):
    out = (None, None, None)
    fid = 0
    while True:
        fid, t = r.field(fid)
        if t == _T_STOP:
            return out
        if fid == 3 and t == _T_STRUCT:  # meta_data: ColumnMetaData
            out = _walk_column_meta(r)
        else:
            r.skip(t)


def bloom_locators(path: str) -> list[dict[str, list]]:
    """Per row group: {column_dotted_path: (bloom_offset, bloom_length)}
    for every column chunk that carries a Bloom filter. Footer-only IO.
    Returns [] when the file has no Bloom filters or the footer cannot be
    parsed (pruning then degrades to 'scan', never to a wrong answer)."""
    try:
        size = os.path.getsize(path)
        with open(path, "rb") as f:
            f.seek(size - 8)
            tail = f.read(8)
            if tail[4:] != _PAR1:
                return []
            flen = struct.unpack("<I", tail[:4])[0]
            f.seek(size - 8 - flen)
            footer = f.read(flen)
        r = _Reader(footer)
        groups: list[dict[str, tuple[int, int | None]]] = []
        fid = 0
        while True:  # FileMetaData
            fid, t = r.field(fid)
            if t == _T_STOP:
                break
            if fid == 4 and t == _T_LIST:  # row_groups: list<RowGroup>
                n, _et = r.list_header()
                for _ in range(n):
                    cols: dict[str, tuple[int, int | None]] = {}
                    gfid = 0
                    while True:  # RowGroup
                        gfid, gt = r.field(gfid)
                        if gt == _T_STOP:
                            break
                        if gfid == 1 and gt == _T_LIST:  # columns
                            cn, _cet = r.list_header()
                            for _ in range(cn):
                                cpath, boff, blen = _walk_column_chunk(r)
                                if cpath is not None and boff is not None:
                                    cols[cpath] = [boff, blen]  # JSON-stable
                        else:
                            r.skip(gt)
                    groups.append(cols)
            else:
                r.skip(t)
        return groups if any(groups) else []
    except Exception:
        return []


# parquet-format BloomFilter.md block-split Bloom filter constants
_SBBF_SALT = (
    0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
    0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
)


def _read_sbbf(path: str, offset: int, length: int | None) -> bytes | None:
    """Read one SBBF bitset: parse the BloomFilterHeader thrift at `offset`
    (numBytes + algorithm/hash/compression unions), validate it is an
    uncompressed XXH64 split-block filter, return the raw bitset bytes."""
    try:
        with open(path, "rb") as f:
            f.seek(offset)
            # header is tiny (<32 B); over-read then slice via numBytes
            head = f.read(64 if length is None else min(64, length))
            r = _Reader(head)
            num_bytes = algo = hsh = comp = None
            fid = 0
            while True:
                fid, t = r.field(fid)
                if t == _T_STOP:
                    break
                if fid == 1 and t == _T_I32:
                    num_bytes = r.zigzag()
                elif fid in (2, 3, 4) and t == _T_STRUCT:
                    # unions: the set member's field id is the variant tag
                    ufid = 0
                    ufid, ut = r.field(ufid)
                    if ut != _T_STOP:
                        r.skip(ut)
                        tag_end = r.field(ufid)  # expect STOP
                        if tag_end[1] != _T_STOP:
                            r.skip(tag_end[1])
                    if fid == 2:
                        algo = ufid
                    elif fid == 3:
                        hsh = ufid
                    else:
                        comp = ufid
                else:
                    r.skip(t)
            if num_bytes is None or num_bytes <= 0 or num_bytes % 32:
                return None
            if (algo, hsh, comp) != (1, 1, 1):  # SBBF / XXH64 / UNCOMPRESSED
                return None
            f.seek(offset + r.i)
            bitset = f.read(num_bytes)
        return bitset if len(bitset) == num_bytes else None
    except Exception:
        return None


def sbbf_probe(bitset: bytes, value: bytes) -> bool:
    """True when `value` MAY be present (parquet-format BloomFilter.md §
    split-block algorithm; hash = XXH64(plain-encoded value, seed=0), which
    for BYTE_ARRAY is the raw bytes)."""
    nblocks = len(bitset) // 32
    if nblocks == 0:
        return True
    h = xxh64(value, 0)
    block = ((h >> 32) * nblocks) >> 32
    words = struct.unpack_from("<8I", bitset, block * 32)
    lo = h & 0xFFFFFFFF
    for i in range(8):
        bit = ((lo * _SBBF_SALT[i]) & 0xFFFFFFFF) >> 27
        if not (words[i] >> bit) & 1:
            return False
    return True
