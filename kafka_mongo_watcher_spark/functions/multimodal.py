"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with a typed metadata struct.
The Spark-side schema, partitioning, and Arrow batch shape are real and
tested, and — since r3 — so is the decode for two containers this sandbox
can parse WITHOUT codec libraries:

- **BMP** (24-bpp uncompressed, BITMAPINFOHEADER): full byte-level parse —
  file/info headers validated against the payload length, pixel rows
  (bottom-up, 4-byte padded, BGR) decoded via numpy, body statistics
  (mean pixel value) computed from the actual pixels;
- **WAV** (RIFF/PCM 16-bit): fmt/data chunks parsed, duration derived from
  the sample count/rate, RMS computed from the actual samples;
- **PNG** (8-bit gray/RGB/LA/RGBA, non-interlaced): full pixel decode —
  chunk walk with CRC validation, stdlib-zlib inflate of the IDAT stream,
  per-scanline unfiltering (all five PNG filter types, spec §9) in numpy,
  body statistics from the actual pixels.

Two more containers get REAL metadata (the ffprobe analog) without pixel
decode: **JPEG** (SOF frame-header walk → width/height/channels; inverse
DCT needs a codec lib, so body_mean stays null) and **GIF** (logical screen
descriptor). Anything else (MP3/H264/...) falls back to
`_decode_bytes_stub`, a clearly-marked deterministic fake, so pipelines
over mixed corpora keep flowing — the reference's decode-error tolerance.
Swap the fallback for PIL/ffmpeg on a real cluster; every signature stays
the same.

All operators are `mapInPandas` iterators: one Arrow batch in, one out, so
decode cost amortizes across the batch and memory stays bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch`.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "media_type string, width int, height int, n_channels int, "
    "duration_ms int, codec string, body_mean double"
)

# BMP + WAV + PNG decode is REAL (byte-level container parse, stdlib zlib,
# numpy body math); JPEG/GIF metadata is real (header probe, no pixels);
# formats needing codec libraries still stub.
_DECODE_IS_STUB = False
DECODE_REAL_FORMATS = ("bmp", "wav", "png")
PROBE_REAL_FORMATS = ("jpeg", "gif")


# ---------------------------------------------------------------------------
# real codecs (public container formats: Windows BMP spec, RIFF/WAVE spec)
# ---------------------------------------------------------------------------

def encode_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Build a real 24-bpp bottom-up BMP (constant fill). Test/datagen
    helper: the bytes round-trip through _decode_bmp."""
    row_len = (width * 3 + 3) & ~3
    img_size = row_len * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    row = (bytes([rgb[2] % 256, rgb[1] % 256, rgb[0] % 256]) * width).ljust(row_len, b"\0")
    return header + row * height


def encode_wav(n_samples: int, sample_rate: int, amplitude: int) -> bytes:
    """Build a real RIFF/PCM-16 mono WAV: an alternating-sign square wave of
    constant |amplitude| (so RMS == amplitude exactly)."""
    samples = np.full(n_samples, amplitude, dtype=np.int16)
    samples[1::2] *= -1
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )


def _decode_bmp(p: bytes) -> dict:
    """Strict 24-bpp BMP parse: header fields validated against the payload
    (a text blob that merely starts with 'BM' fails validation and falls
    through to the stub)."""
    if len(p) < 54:
        raise ValueError("short bmp")
    magic, file_size, _, _, data_off = struct.unpack_from("<2sIHHI", p, 0)
    (hdr, width, height, planes, bpp, comp, img_size, *_rest) = struct.unpack_from(
        "<IiiHHII", p, 14
    )
    if magic != b"BM" or hdr < 40 or planes != 1 or comp != 0 or bpp != 24:
        raise ValueError("unsupported bmp")
    if width <= 0 or height == 0 or file_size != len(p):
        raise ValueError("corrupt bmp header")
    h = abs(height)
    row_len = (width * 3 + 3) & ~3
    if data_off + row_len * h > len(p):
        raise ValueError("truncated bmp body")
    rows = np.frombuffer(p, dtype=np.uint8, offset=data_off, count=row_len * h)
    px = rows.reshape(h, row_len)[:, : width * 3]  # strip row padding
    return {
        "media_type": "image",
        "width": width,
        "height": h,
        "n_channels": 3,
        "duration_ms": None,
        "codec": "bmp",
        "body_mean": float(px.mean()),
    }


def _decode_wav(p: bytes) -> dict:
    """RIFF/PCM WAV parse: walks chunks, requires PCM 16-bit, computes RMS
    over the actual samples."""
    if len(p) < 44 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise ValueError("not riff/wave")
    off, fmt, data = 12, None, None
    while off + 8 <= len(p):
        cid, sz = struct.unpack_from("<4sI", p, off)
        body = p[off + 8 : off + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        off += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16 or n_ch < 1 or rate <= 0:
        raise ValueError("unsupported wav encoding")
    samples = np.frombuffer(data, dtype="<i2")
    n_frames = len(samples) // n_ch
    return {
        "media_type": "audio",
        "width": None,
        "height": None,
        "n_channels": n_ch,
        "duration_ms": int(n_frames * 1000 // rate),
        "codec": "pcm_s16le",
        "body_mean": float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))),
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    body = typ + data
    return (
        struct.pack(">I", len(data))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Build a real 8-bit RGB PNG (constant fill, filter-0 scanlines, one
    zlib IDAT). Test/datagen helper; the decoder handles any writer."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = (bytes([0]) + bytes(rgb) * width) * height
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(p: bytes) -> dict:
    """Full PNG pixel decode with stdlib zlib + numpy scanline unfiltering
    (all five filter types, PNG spec §9). Supports the common web profile:
    8-bit depth, color types 0/2/4/6, non-interlaced. Chunk CRCs are
    validated, so a payload that merely starts with the signature falls
    through to the stub. Filter-0/Up rows are pure numpy; Sub/Average/Paeth
    rows carry a left-neighbor dependency and walk the scanline."""
    if p[:8] != _PNG_SIG:
        raise ValueError("not png")
    off, ihdr, idat = 8, None, []
    while off + 12 <= len(p):
        ln, typ = struct.unpack_from(">I4s", p, off)
        data = p[off + 8 : off + 8 + ln]
        if len(data) != ln or off + 12 + ln > len(p):
            raise ValueError("truncated png chunk")
        (crc,) = struct.unpack_from(">I", p, off + 8 + ln)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError("bad png crc")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        off += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if (
        w <= 0 or h <= 0 or depth != 8 or ctype not in _PNG_CHANNELS
        or comp != 0 or filt != 0 or interlace != 0
    ):
        raise ValueError("unsupported png variant")
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("bad png body size")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    img = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = int(arr[y, 0])
        line = arr[y, 1:].astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub
            cur = line
            for x in range(ch, stride):
                cur[x] = (cur[x] + cur[x - ch]) & 0xFF
        elif f == 3:  # Average
            cur = line
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + ((a + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError("bad png filter type")
        img[y] = cur.astype(np.uint8)
        prev = cur
    return {
        "media_type": "image",
        "width": int(w),
        "height": int(h),
        "n_channels": ch,
        "duration_ms": None,
        "codec": "png",
        "body_mean": float(img.mean()),
    }


_JPEG_SOF = frozenset(
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)


def _probe_jpeg(p: bytes) -> dict:
    """JPEG metadata probe — walk the marker stream to the SOF frame header
    (the ffprobe analog). Width/height/channels are decoded for REAL; pixel
    statistics need an inverse-DCT codec, so body_mean stays null."""
    if p[:3] != b"\xff\xd8\xff":
        raise ValueError("not jpeg")
    off = 2
    while off + 4 <= len(p):
        if p[off] != 0xFF:
            raise ValueError("bad jpeg marker stream")
        m = p[off + 1]
        if m == 0xFF:  # fill byte
            off += 1
            continue
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:  # standalone markers
            off += 2
            continue
        (ln,) = struct.unpack_from(">H", p, off + 2)
        if ln < 2:
            raise ValueError("bad jpeg segment length")
        if m in _JPEG_SOF:
            _prec, h, w, nc = struct.unpack_from(">BHHB", p, off + 4)
            if w <= 0 or h <= 0 or nc not in (1, 3, 4):
                raise ValueError("bad jpeg frame header")
            return {
                "media_type": "image",
                "width": int(w),
                "height": int(h),
                "n_channels": int(nc),
                "duration_ms": None,
                "codec": "jpeg",
                "body_mean": None,
            }
        if m == 0xDA:  # start of scan before any SOF: malformed
            break
        off += 2 + ln
    raise ValueError("no jpeg SOF marker")


def _probe_gif(p: bytes) -> dict:
    """GIF logical-screen-descriptor probe: real width/height, palette-based
    RGB (3 channels); pixels stay undecoded (LZW)."""
    if p[:6] not in (b"GIF87a", b"GIF89a") or len(p) < 13:
        raise ValueError("not gif")
    w, h = struct.unpack_from("<HH", p, 6)
    if w <= 0 or h <= 0:
        raise ValueError("bad gif dimensions")
    return {
        "media_type": "image",
        "width": int(w),
        "height": int(h),
        "n_channels": 3,
        "duration_ms": None,
        "codec": "gif",
        "body_mean": None,
    }


def _decode_bytes_stub(payload: bytes) -> dict:
    """STUB decode for formats whose codecs aren't in this container:
    deterministic pseudo-metadata from the payload bytes, so tests are
    reproducible and the Spark plumbing (schema, batching, null handling)
    is exercised for real. Swap for PIL/ffmpeg on a real cluster."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload: real decoder would raise codec error")
    h = hashlib.sha256(payload).digest()
    return {
        "media_type": ["image", "audio", "video"][h[0] % 3],
        "width": 64 + h[1] * 8,
        "height": 64 + h[2] * 8,
        "n_channels": 1 + h[3] % 4,
        "duration_ms": int.from_bytes(h[4:7], "big") % 600_000,
        "codec": ["raw", "jpegish", "wavish", "h264ish"][h[7] % 4],
        "body_mean": None,
    }


def _decode_bytes(payload: bytes) -> dict:
    """Magic-byte dispatch: real BMP/WAV/PNG parse + real JPEG/GIF metadata
    probe, stub for everything else. A payload that merely LOOKS like a
    container (e.g. text starting with 'BM', or a PNG signature with corrupt
    CRCs) fails strict validation and uses the stub."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload")
    dispatch = (
        (payload[:2] == b"BM", _decode_bmp),
        (payload[:4] == b"RIFF" and payload[8:12] == b"WAVE", _decode_wav),
        (payload[:8] == _PNG_SIG, _decode_png),
        (payload[:3] == b"\xff\xd8\xff", _probe_jpeg),
        (payload[:6] in (b"GIF87a", b"GIF89a"), _probe_gif),
    )
    for hit, fn in dispatch:
        if hit:
            try:
                return fn(payload)
            except ValueError:
                break
    return _decode_bytes_stub(payload)


def decode_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary payload → typed metadata struct (mapInPandas, Arrow-batched).

    Null/empty payloads yield a null struct instead of failing the batch —
    the reference's decode-error tolerance
    (/root/reference/internal/mongo/replay_producer.go:71-74)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", meta struct<{MEDIA_META_DDL}>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            for p in pdf[payload_col]:
                try:
                    metas.append(_decode_bytes(p))
                except (NotImplementedError, TypeError):
                    metas.append(None)
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def extract_features(df: DataFrame, payload_col: str = "payload", dim: int = 16) -> DataFrame:
    """binary → fixed-dim float feature vector (stubbed embedding model).

    Vectorized inside the Arrow batch via numpy; output column `features`
    array<float>. Deterministic: bytes → sha256 → unit-normalized floats."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", features array<float>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf[payload_col]:
                if p is None or len(p) == 0:
                    feats.append(None)
                    continue
                raw = hashlib.sha256(p).digest() + hashlib.sha256(b"1" + p).digest()
                v = np.frombuffer(raw[: dim * 4], dtype=np.uint32).astype(np.float64)
                v = (v / 2**32) - 0.5
                v /= np.linalg.norm(v) or 1.0
                feats.append(v.astype(np.float32).tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(df: DataFrame, payload_col: str = "payload", n_frames: int = 4) -> DataFrame:
    """video binary → n_frames evenly-spaced frame payloads (stub: byte
    slices standing in for decoded frames). Output `frames` array<binary>."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", frames array<binary>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = []
            for p in pdf[payload_col]:
                if p is None or len(p) < n_frames:
                    frames.append(None)
                    continue
                step = len(p) // n_frames
                frames.append([bytes(p[i * step : i * step + step]) for i in range(n_frames)])
            pdf = pdf.copy()
            pdf["frames"] = frames
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def synthesize_containers(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL container payload per row (mapInPandas), id mod 3
    picking the format, with every parameter a closed-form function of the
    id — so an external oracle (DuckDB SQL) can verify the DECODED values
    without parsing a single byte:

      i%3==0: BMP  w=4+i%13, h=3+i%9, fill rgb=(i, 3i+7, 5i+11) mod 256
              ⇒ body_mean = (r+g+b)/3
      i%3==1: WAV  n=50+i%100 samples @ 8000+(i%5)*1000 Hz, square wave of
              |amplitude| = 1000+i%2000 ⇒ body_mean (RMS) = amplitude
      i%3==2: PNG  w=5+i%11, h=4+i%7, fill rgb=(7i+1, 2i+3, 11i+5) mod 256
              ⇒ body_mean = (r+g+b)/3 (round-trips zlib + unfiltering)
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for v in pdf[id_col]:
                i = int(v)
                if i % 3 == 0:
                    payloads.append(
                        encode_bmp(
                            4 + i % 13, 3 + i % 9,
                            (i % 256, (3 * i + 7) % 256, (5 * i + 11) % 256),
                        )
                    )
                elif i % 3 == 1:
                    payloads.append(
                        encode_wav(50 + i % 100, 8000 + (i % 5) * 1000, 1000 + i % 2000)
                    )
                else:
                    payloads.append(
                        encode_png(
                            5 + i % 11, 4 + i % 7,
                            ((7 * i + 1) % 256, (2 * i + 3) % 256, (11 * i + 5) % 256),
                        )
                    )
            pdf = pdf.copy()
            pdf["payload"] = payloads
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def synthetic_media(spark, n_rows: int, *, seed: int = 11) -> DataFrame:
    """Deterministic binary-column fixture: payload = repeated sha512 bytes
    keyed by row id (distributed, no driver data)."""
    return (
        spark.range(0, n_rows, 1, max(4, n_rows // 100_000))
        .select(
            F.col("id").alias("media_id"),
            F.repeat(
                F.sha2(F.concat(F.lit(seed), F.col("id").cast("string")), 512),
                (F.pmod(F.xxhash64(F.lit(seed), F.col("id")), F.lit(20)) + 1).cast("int"),
            ).cast("binary").alias("payload"),
        )
    )
