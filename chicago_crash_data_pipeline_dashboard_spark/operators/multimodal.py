"""Multimodal column plumbing: opaque binary media + typed metadata.

Media (image/audio/video) travel as ``binary`` columns with a typed
metadata struct; decode / feature-extraction / frame-sample run as
Arrow-batched ``mapInPandas`` operators.

RAW container formats are decoded FOR REAL, in pure Python + numpy,
from their public byte layouts:

- **WAV** (RIFF PCM): fmt/data chunk walk → channels, sample rate,
  bit depth, duration; samples = int16 PCM from the data chunk;
- **BMP** (BITMAPINFOHEADER): width/height/bpp from the fixed-offset
  header; pixels = the raw pixel array at the header-declared offset;
- **PPM** (P6): ASCII header tokens (comment-aware) → width/height;
  pixels = the binary raster;
- **PNG** (8-bit gray/RGB/RGBA, non-interlaced): IHDR parse, IDAT
  zlib inflate (stdlib zlib — no external codec), all five scanline
  filters (None/Sub/Up/Average/Paeth) unfiltered; pixels = the
  reconstructed samples. Palette/16-bit/interlaced variants degrade
  to zero samples rather than guessing.

CODEC formats (jpeg/mp3/mp4 …) need decoder libraries absent from
this container — that path raises ``NotImplementedError`` inside the
executor, clearly marked. The default (``real_decode=False``) path
produces deterministic sha256 fake features with the same schema and
batching, so the distributed plumbing is exercised even for rows whose
format has no in-container decoder.

Scale notes: media bytes dominate row size — keep them OUT of shuffles
(derive features first, then drop/replace the binary column), size
``spark.sql.files.maxPartitionBytes`` down for media-heavy tables, and
never collect() a media column.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # bmp|ppm|wav|mp4…
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

_FEATURE_DIM = 16


# --------------------------------------------------------------------
# encoders (pure Python; used by fixtures and tests)
# --------------------------------------------------------------------


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER), rows padded to 4
    bytes, deterministic pixel values from ``seed``."""
    row_size = (3 * width + 3) // 4 * 4
    img_size = row_size * height
    header = b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
    header += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = bytearray()
    for y in range(height):
        for x in range(width):
            base = seed + 3 * (y * width + x)
            rows += bytes((base + c) % 256 for c in range(3))
        rows += b"\x00" * (row_size - 3 * width)
    return bytes(header) + bytes(rows)


def make_wav(
    n_frames: int, sample_rate: int = 8000, n_channels: int = 1, seed: int = 0
) -> bytes:
    """16-bit PCM RIFF/WAVE with deterministic samples from ``seed``."""
    data = bytearray()
    for t in range(n_frames):
        for ch in range(n_channels):
            data += struct.pack("<h", ((seed * 31 + t + 977 * ch) % 2048) - 1024)
    byte_rate = sample_rate * n_channels * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + bytes(data)


def make_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """Binary PPM (P6, maxval 255) with deterministic raster."""
    header = f"P6\n{width} {height}\n255\n".encode()
    return header + bytes((seed + j) % 256 for j in range(3 * width * height))


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (3 = palette: indices, not samples)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_filter_row(
    f: int, recon: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """ENCODER side of one scanline filter (used by make_png and the
    round-trip tests — exercising the decoder's five unfilter branches
    requires producing genuinely filtered bytes)."""
    cur = recon.astype(np.int16)
    left = np.zeros_like(cur)
    left[bpp:] = cur[:-bpp]
    up = prev.astype(np.int16)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if f == 0:
        out = cur
    elif f == 1:
        out = cur - left
    elif f == 2:
        out = cur - up
    elif f == 3:
        out = cur - (left + up) // 2
    elif f == 4:
        out = cur - _paeth(left, up, upleft)
    else:
        raise ValueError(f"bad PNG filter {f}")
    return (out % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def make_png(
    width: int,
    height: int,
    seed: int = 0,
    filters: list[int] | None = None,
    compress_level: int = -1,
) -> bytes:
    """8-bit RGB non-interlaced PNG with deterministic pixels from
    ``seed``; ``filters`` optionally picks each scanline's filter type
    (default all 0) so tests can drive every unfilter branch.

    ``compress_level=0`` emits stored (uncompressed) deflate blocks,
    making the byte size CLOSED-FORM for scanline data under 64 KiB:
    len = 68 + height·(3·width+1) — signature 8 + IHDR 25 +
    IDAT 12+(11+L) + IEND 12, with the zlib stream = 2-byte header +
    5-byte stored-block header + L raw bytes + 4-byte adler. The media
    fixture uses this so a SQL oracle can recompute total_bytes."""
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    if filters is not None and len(filters) != height:
        raise ValueError(f"filters must have one entry per row ({height}), got {len(filters)}")
    stride, bpp = 3 * width, 3
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        recon = np.array(
            [(seed + 3 * (y * width + x) + c) % 256 for x in range(width) for c in range(3)],
            dtype=np.uint8,
        )
        f = filters[y] if filters is not None else 0
        raw.append(f)
        raw += _png_filter_row(f, recon, prev, bpp).tobytes()
        prev = recon
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), compress_level))
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------
# header parsers (pure Python over public byte layouts)
# --------------------------------------------------------------------


def parse_bmp(b: bytes) -> dict | None:
    if len(b) < 54 or b[:2] != b"BM":
        return None
    width = int.from_bytes(b[18:22], "little", signed=True)
    height = abs(int.from_bytes(b[22:26], "little", signed=True))
    bpp = int.from_bytes(b[28:30], "little")
    return {
        "media_type": "image",
        "format": "bmp",
        "width": width,
        "height": height,
        "duration_ms": None,
        "n_channels": max(1, bpp // 8),
    }


def _png_chunks(b: bytes):
    """Yield (chunk_type, payload_offset, clamped_size) for each PNG
    chunk after the 8-byte signature. Declared lengths are
    corruption-controlled: sizes clamp to the bytes present."""
    pos = 8
    while pos + 8 <= len(b):
        size = int.from_bytes(b[pos : pos + 4], "big")
        typ = b[pos + 4 : pos + 8]
        yield typ, pos + 8, min(size, max(0, len(b) - pos - 8))
        pos += 12 + size  # len + type + payload + CRC


def parse_png(b: bytes) -> dict | None:
    if len(b) < 33 or b[:8] != _PNG_SIG or b[12:16] != b"IHDR":
        return None
    width = int.from_bytes(b[16:20], "big")
    height = int.from_bytes(b[20:24], "big")
    color_type = b[25]
    return {
        "media_type": "image",
        "format": "png",
        "width": width,
        "height": height,
        "duration_ms": None,
        "n_channels": _PNG_CHANNELS.get(color_type, 1),
    }


def _png_unfilter(
    raw: bytes, width: int, height: int, channels: int
) -> np.ndarray:
    """Reconstruct pixel samples from the inflated scanline stream
    (filter byte + filtered bytes per row). Sub and Paeth carry a
    serial left-dependency, so those rows reconstruct with a per-pixel
    loop; None/Up are vectorized. Truncated streams yield what fits."""
    stride, bpp = width * channels, channels
    rows = []
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for _y in range(height):
        if pos + 1 + stride > len(raw):
            break
        f = raw[pos]
        cur = np.frombuffer(raw, np.uint8, count=stride, offset=pos + 1).astype(np.int16)
        pos += 1 + stride
        if f == 0:
            recon = cur
        elif f == 2:
            recon = (cur + prev) % 256
        elif f in (1, 3, 4):
            up = prev.astype(np.int16)
            recon = np.zeros(stride, dtype=np.int16)
            for i in range(stride):
                a = recon[i - bpp] if i >= bpp else 0
                bb = up[i]
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + bb) // 2
                else:
                    c = up[i - bpp] if i >= bpp else 0
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                recon[i] = (cur[i] + pred) % 256
        else:  # unknown filter type: corrupt stream
            break
        prev = recon.astype(np.uint8)
        rows.append(prev)
    if not rows:
        return np.zeros(0)
    return np.concatenate(rows)


def _riff_chunks(b: bytes):
    """Yield (chunk_id, payload_offset, clamped_size) for each RIFF
    chunk after the 12-byte RIFF/WAVE header. The single walker both
    the metadata parser and the sample decoder share — chunk alignment
    and size clamping live in exactly one place."""
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        yield cid, pos + 8, min(size, len(b) - pos - 8)
        pos += 8 + size + (size % 2)  # RIFF chunks are word-aligned


def parse_wav(b: bytes) -> dict | None:
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    fmt, data_size = None, None
    for cid, off, size in _riff_chunks(b):
        if cid == b"fmt " and off + 16 <= len(b):
            n_channels = int.from_bytes(b[off + 2 : off + 4], "little")
            sample_rate = int.from_bytes(b[off + 4 : off + 8], "little")
            bits = int.from_bytes(b[off + 14 : off + 16], "little")
            fmt = (n_channels, sample_rate, bits)
        elif cid == b"data":
            data_size = size
    if fmt is None:
        return None
    n_channels, sample_rate, bits = fmt
    duration_ms = None
    # header fields are corruption-controlled: bits 1-7 is truthy but
    # bits // 8 == 0, so the frame-size product must be guarded as a
    # whole — a sub-byte bits_per_sample degrades to "unknown duration",
    # not a ZeroDivisionError in the executor task
    frame_bytes = n_channels * (bits // 8)
    if data_size and sample_rate and frame_bytes:
        n_frames = data_size // frame_bytes
        duration_ms = round(1000 * n_frames / sample_rate)
    return {
        "media_type": "audio",
        "format": "wav",
        "width": None,
        "height": None,
        "duration_ms": duration_ms,
        "n_channels": n_channels,
    }


def _ppm_header(b: bytes) -> tuple[list[int], int] | None:
    """(three header ints, raster offset) for a P6 PPM, or None."""
    if b[:2] != b"P6":
        return None
    vals: list[int] = []
    pos = 2
    while len(vals) < 3 and pos < len(b):
        c = b[pos : pos + 1]
        if c == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            try:
                vals.append(int(b[start:pos]))
            except ValueError:
                return None
    if len(vals) < 3 or pos >= len(b):
        return None
    return vals, pos + 1  # exactly one whitespace after maxval


def parse_ppm(b: bytes) -> dict | None:
    parsed = _ppm_header(b)
    if parsed is None:
        return None
    (width, height, _maxval), _off = parsed
    return {
        "media_type": "image",
        "format": "ppm",
        "width": width,
        "height": height,
        "duration_ms": None,
        "n_channels": 3,
    }


def parse_media_header(b: bytes | bytearray | None) -> dict | None:
    """Sniff + parse a raw media container header; None if unknown."""
    if not b:
        return None
    b = bytes(b)
    for parser in (parse_bmp, parse_wav, parse_ppm, parse_png):
        meta = parser(b)
        if meta is not None:
            return meta
    return None


def _decode_samples(b: bytes, fmt: str) -> np.ndarray:
    """Raw sample values scaled to [-1, 1]: pixel bytes (BMP pixel
    array / PPM raster) or int16 PCM frames (WAV data chunk)."""
    b = bytes(b)
    if fmt == "bmp":
        offset = int.from_bytes(b[10:14], "little")
        width = abs(int.from_bytes(b[18:22], "little", signed=True))
        height = abs(int.from_bytes(b[22:26], "little", signed=True))
        bpp = int.from_bytes(b[28:30], "little") or 24
        # header fields are attacker/corruption-controlled: an offset
        # past the payload or a sub-byte bpp must degrade to "no
        # samples", not crash the executor task (np.frombuffer raises
        # on a negative count)
        if offset >= len(b) or bpp < 8 or width <= 0 or height <= 0:
            return np.zeros(0)
        row_bytes = width * (bpp // 8)
        stride = (row_bytes + 3) // 4 * 4
        raw = np.frombuffer(b, dtype=np.uint8, offset=offset, count=min(stride * height, len(b) - offset))
        # strip the 4-byte row padding (and any trailing bytes): only
        # actual pixel samples feed the statistics
        if stride != row_bytes and height > 0 and raw.size >= stride * height:
            raw = raw.reshape(height, stride)[:, :row_bytes].ravel()
        return raw.astype(np.float64) / 127.5 - 1.0
    if fmt == "ppm":
        parsed = _ppm_header(b)
        assert parsed is not None
        _vals, off = parsed
        return np.frombuffer(b, dtype=np.uint8, offset=off).astype(np.float64) / 127.5 - 1.0
    if fmt == "png":
        import zlib

        width = int.from_bytes(b[16:20], "big")
        height = int.from_bytes(b[20:24], "big")
        bit_depth, color_type = b[24], b[25]
        channels = _PNG_CHANNELS.get(color_type)
        # palette/16-bit/interlaced are out of decode scope: degrade to
        # zero samples (metadata still parses), never guess pixels
        if channels is None or bit_depth != 8 or b[28] != 0 or width <= 0 or height <= 0:
            return np.zeros(0)
        idat = b"".join(
            b[off : off + size] for typ, off, size in _png_chunks(b) if typ == b"IDAT"
        )
        try:
            # bound the inflate by the scanline stream the header
            # promises: a zlib-bomb IDAT (1 MB inflating to GBs) must
            # cap at the usable byte count, not OOM the executor
            expected = height * (width * channels + 1)
            raw = zlib.decompressobj().decompress(idat, expected)
        except zlib.error:  # truncated/corrupt stream degrades cleanly
            return np.zeros(0)
        samples = _png_unfilter(raw, width, height, channels)
        return samples.astype(np.float64) / 127.5 - 1.0
    if fmt == "wav":
        for cid, off, size in _riff_chunks(b):
            if cid == b"data":
                # the declared chunk size is corruption-controlled:
                # clamp to the bytes actually present (np.frombuffer
                # raises when count overruns the buffer)
                if off >= len(b):
                    return np.zeros(0)
                avail = min(size, len(b) - off)
                return (
                    np.frombuffer(b, dtype="<i2", offset=off, count=avail // 2).astype(
                        np.float64
                    )
                    / 32768.0
                )
        return np.zeros(0)
    raise NotImplementedError(f"no raw-format decoder for {fmt!r}")


# --------------------------------------------------------------------
# feature extraction
# --------------------------------------------------------------------


def _fake_features(content: bytes, dim: int = _FEATURE_DIM) -> list[float]:
    """Deterministic stand-in used when no decode is requested:
    features derived from a sha256 of the bytes, scaled to [-1, 1].
    Stable across runs/partitions — exercises the full pipeline shape
    regardless of format."""
    if content is None:
        return [0.0] * dim
    h = hashlib.sha256(bytes(content)).digest()
    return [((h[i % len(h)] / 255.0) * 2.0 - 1.0) for i in range(dim)]


def _real_features(
    content: bytes, dim: int = _FEATURE_DIM, meta: dict | None = None
) -> list[float]:
    """REAL features from a raw-format payload: sample statistics of
    the decoded pixels/PCM (all in [-1, 1]), zero-padded to ``dim``.
    Codec formats have no in-container decoder → NotImplementedError.
    ``meta``: pass a pre-parsed header to skip the second sniff (the
    Arrow batch hot loop parses once and hands it down)."""
    if meta is None:
        meta = parse_media_header(content)
    if meta is None:
        # STUB boundary: real media decode of codec formats (jpeg/mp3/
        # mp4/...) requires decoder libraries not in this container.
        raise NotImplementedError(
            "real media decode of codec formats requires decoder libraries "
            "absent from this container (wav/bmp/ppm/png are decoded natively)"
        )
    s = _decode_samples(content, meta["format"])
    if s.size == 0:
        return [0.0] * dim
    stats = [
        float(s.mean()),
        float(s.std()),
        float(s.min()),
        float(s.max()),
        float(np.sqrt(np.mean(s * s))),
    ]
    return stats + [0.0] * (dim - len(stats))


def decode_and_featurize(
    df: DataFrame, real_decode: bool = False, on_undecodable: str = "raise"
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``real_decode=True`` decodes raw containers (wav/bmp/ppm) for real
    — header fields + sample-statistic features from the actual payload
    bytes. Codec formats (jpeg/mp4/…) have no in-container decoder:
    with ``on_undecodable='raise'`` (default) they raise
    NotImplementedError inside the executor; with
    ``on_undecodable='stub'`` they degrade to the deterministic sha256
    stand-in features — the behavior a 100 TB curation run wants (one
    stray jpeg must not kill the job). ``real_decode=False`` keeps the
    sha256 fake features for every byte blob.

    Every output row carries ``feature_source`` provenance —
    ``'decoded'`` (real sample statistics) or ``'stub'`` (sha256
    stand-in) — so downstream consumers can never mistake stub vectors
    for real ones.
    """
    if on_undecodable not in ("raise", "stub"):
        raise ValueError(f"on_undecodable must be 'raise' or 'stub', got {on_undecodable!r}")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), True),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
            T.StructField("feature_source", T.StringType(), False),
        ]
    )

    def featurize(b) -> tuple[list[float], str]:
        if not real_decode:
            return _fake_features(b), "stub"
        # parse ONCE per row (the header sniff walks the whole chunk
        # list); decodable rows hand the parsed meta straight down
        meta = parse_media_header(b)
        if meta is None and on_undecodable == "stub":
            return _fake_features(b), "stub"
        return _real_features(b, meta=meta), "decoded"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pairs = pdf["content"].map(featurize)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["meta"].map(
                        lambda m: (m or {}).get("media_type") if isinstance(m, dict) else None
                    ),
                    "n_bytes": pdf["content"]
                    .map(lambda b: 0 if b is None else len(b))
                    .astype("int64"),
                    "features": pairs.map(lambda p: p[0]),
                    "feature_source": pairs.map(lambda p: p[1]),
                }
            )

    return df.mapInPandas(batches, schema=out_schema)


def extract_media_meta(df: DataFrame) -> DataFrame:
    """REAL header-level metadata extraction: parse width / height /
    duration / channels straight from the binary column's bytes for
    raw containers; fall back to the row's provided ``meta`` struct
    for formats without an in-container parser (``meta_source`` tells
    which path produced each row). Arrow-batched, no shuffle; the
    binary column is dropped from the output so downstream aggs never
    move media bytes."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("media_type", T.StringType(), True),
            T.StructField("format", T.StringType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.LongType(), True),
            T.StructField("n_channels", T.IntegerType(), True),
            T.StructField("meta_source", T.StringType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                parsed = parse_media_header(content)
                if parsed is not None:
                    src = "header"
                elif isinstance(meta, dict):
                    parsed, src = meta, "provided"
                else:
                    parsed, src = {}, "none"
                recs.append(
                    (
                        mid,
                        0 if content is None else len(content),
                        parsed.get("media_type"),
                        parsed.get("format"),
                        parsed.get("width"),
                        parsed.get("height"),
                        parsed.get("duration_ms"),
                        parsed.get("n_channels"),
                        src,
                    )
                )
            out = pd.DataFrame(
                recs,
                columns=[
                    "media_id", "n_bytes", "media_type", "format", "width",
                    "height", "duration_ms", "n_channels", "meta_source",
                ],
            )
            for c, dt in (
                ("media_id", "int64"), ("n_bytes", "int64"), ("width", "Int32"),
                ("height", "Int32"), ("duration_ms", "Int64"), ("n_channels", "Int32"),
            ):
                out[c] = out[c].astype(dt)
            yield out

    return df.mapInPandas(batches, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (derived from metadata duration — no decode needed). The
    actual pixel extraction plugs into decode_and_featurize."""
    return (
        df.filter(F.col("meta.media_type") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms", "content", "meta")
    )


def make_media_fixture(spark, n: int = 64) -> DataFrame:
    """Deterministic REAL-format media fixture with CLOSED-FORM
    metadata: every size/duration is an integer function of the row
    index ``i``, so an oracle can recompute any aggregate without
    seeing the bytes. kind = i % 5:

    - 0 → **BMP** image, w=8+(i%5), h=6+(i%7),
      n_bytes = 54 + h·((3w+3)//4·4);
    - 1 → **WAV** audio, channels=1+(i%2), frames=800+40·(i%10) at
      8 kHz → duration_ms = 100+5·(i%10),
      n_bytes = 44 + frames·channels·2;
    - 2 → **PPM** image, w=4+(i%4), h=3+(i%6) (single-digit dims →
      11-byte header), n_bytes = 11 + 3wh;
    - 3 → synthetic **mp4 video** (no raw container format exists for
      video): opaque bytes n_bytes = 200+(i%7)·16, provided-meta
      duration_ms = 5000+100i — the unparseable-container case;
    - 4 → **PNG** image (stored-block deflate), w=5+(i%3), h=4+(i%6),
      n_bytes = 68 + h·(3w+1).
    """
    rows = []
    for i in range(n):
        kind = i % 5
        if kind == 0:
            w, h = 8 + (i % 5), 6 + (i % 7)
            blob = make_bmp(w, h, seed=i)
            meta = {"media_type": "image", "format": "bmp", "width": w, "height": h,
                    "duration_ms": None, "n_channels": 3}
        elif kind == 1:
            ch, frames = 1 + (i % 2), 800 + 40 * (i % 10)
            blob = make_wav(frames, sample_rate=8000, n_channels=ch, seed=i)
            meta = {"media_type": "audio", "format": "wav", "width": None, "height": None,
                    "duration_ms": 100 + 5 * (i % 10), "n_channels": ch}
        elif kind == 2:
            w, h = 4 + (i % 4), 3 + (i % 6)
            blob = make_ppm(w, h, seed=i)
            meta = {"media_type": "image", "format": "ppm", "width": w, "height": h,
                    "duration_ms": None, "n_channels": 3}
        elif kind == 3:
            blob = bytes((i + j) % 256 for j in range(200 + (i % 7) * 16))
            meta = {"media_type": "video", "format": "mp4", "width": 640, "height": 360,
                    "duration_ms": 5000 + 100 * i, "n_channels": None}
        else:
            w, h = 5 + (i % 3), 4 + (i % 6)
            blob = make_png(w, h, seed=i, compress_level=0)
            meta = {"media_type": "image", "format": "png", "width": w, "height": h,
                    "duration_ms": None, "n_channels": 3}
        rows.append((i, bytearray(blob), meta))
    # few, fat rows: don't spread them over local[32]'s default
    # parallelism — 8 partitions keeps task overhead < data
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA).coalesce(8)
