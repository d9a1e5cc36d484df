"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a metadata
struct, exactly how a 100 TB training-data lake stores them (parquet binary
+ sidecar fields).  The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested.  Header
METADATA extraction is also real: :func:`sniff_header` parses PNG/GIF/BMP/
WAV/JPEG containers byte-level (no codec libs), oracle-checked end-to-end
against :func:`_synth_blob`'s closed-form test vectors.  Only pixel/sample
DECODE is stubbed (``decode_stub`` emits deterministic fake features and
raises ``NotImplementedError`` for unknown media types) — that genuinely
needs image/audio libraries this container doesn't ship.

``gen_binary_meta`` is the SQL-oracle-checked part: byte length + md5 digest
+ first-byte probe over a binary rendering of ``documents.text`` (the
testdata has no real media column; the binary path is what matters).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from storage_crawler_spark.plans.dialect import Dialect

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature_norm", T.DoubleType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def decode_stub(content: bytes, media_type: str) -> dict:
    """Deterministic fake decode: derives 'dimensions' and a feature norm
    from the bytes.  A real deployment swaps this for PIL/libav decode —
    the Spark plumbing (batching, schema, partitioning) is unchanged."""
    if media_type not in ("image", "audio", "video", "text"):
        raise NotImplementedError(f"no codec for media_type={media_type!r}")
    if content is None:
        return {"n_bytes": None, "width": None, "height": None, "feature_norm": None}
    n = len(content)
    return {
        "n_bytes": n,
        "width": (n % 640) + 1,
        "height": ((n * 7) % 480) + 1,
        "feature_norm": round((sum(content[:64]) % 1000) / 1000.0, 6),
    }


def extract_features(media: DataFrame, batch_rows: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary media batches.

    Arrow moves the binary column in columnar batches; each batch decodes
    vectorized-ish in Python.  Partition sizing note: binary payloads are
    large — callers should repartition so ~(batch_rows × avg payload) fits
    executor memory; at 100 TB use maxPartitionBytes on the parquet scan.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, content, mtype in zip(pdf["doc_id"], pdf["content"], pdf["media_type"]):
                try:
                    feats = decode_stub(bytes(content) if content is not None else None, mtype)
                    err = None
                except NotImplementedError as exc:
                    feats = {"n_bytes": None, "width": None, "height": None, "feature_norm": None}
                    err = str(exc)
                out.append(
                    (doc_id, mtype, feats["n_bytes"], feats["width"], feats["height"], feats["feature_norm"], err)
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Render documents.text as a binary media column (the testdata carrier
    for the binary pipeline)."""
    return docs.select(
        F.col("doc_id"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("text").alias("media_type"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame_offset", T.LongType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def frame_sample(media: DataFrame, n_frames: int = 4, frame_len: int = 64) -> DataFrame:
    """UDTF-shaped frame sampling: 1 media row → up to ``n_frames`` rows.

    Stands in for video keyframe extraction: the payload is sliced at
    evenly-spaced offsets (a real deployment swaps the slicer for libav
    keyframe decode — batching, fan-out schema, and partitioning are what
    Spark sees either way).  Frame count is a pure function of payload
    length, so row counts are deterministic for the driver's checks.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if content is None:
                    continue
                blob = bytes(content)
                k = min(n_frames, max(len(blob) // frame_len, 1))
                for i in range(k):
                    off = (len(blob) * i) // k
                    rows.append((doc_id, i, off, blob[off : off + frame_len]))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(kernel, FRAME_SCHEMA)


def resize_stub(media: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Image-resize plumbing: binary in → binary out with target dims.

    The 'resize' here is a deterministic byte subsample (every k-th byte to
    hit the target payload size); a real deployment swaps in PIL/opencv —
    the Arrow round-trip of binary columns through mapInPandas is the part
    Spark cares about.  Raises ``NotImplementedError`` via decode_stub for
    media types without a codec.
    """
    target_bytes = max(target_w * target_h // 256, 16)

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content, mtype in zip(pdf["doc_id"], pdf["content"], pdf["media_type"]):
                if content is None:
                    rows.append((doc_id, mtype, target_w, target_h, None))
                    continue
                blob = bytes(content)
                step = max(len(blob) // target_bytes, 1)
                rows.append((doc_id, mtype, target_w, target_h, blob[::step][:target_bytes]))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return media.mapInPandas(kernel, out_schema)


# --------------------------------------------------------------------------
# Real header parsing (no codec libs needed): magic-byte sniff + dimension /
# audio-param extraction for PNG, GIF, BMP, WAV, JPEG.  This is the honest
# upgrade over decode_stub — actual byte-level metadata extraction; only
# pixel/sample DECODE stays stubbed (that genuinely needs codec libs).
# --------------------------------------------------------------------------

import struct as _struct

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_header(blob: bytes | None) -> dict:
    """Parse media container headers: {format, width, height, channels,
    sample_rate_hz}; fields are None when absent/unknown.  Pure byte
    parsing — works on any executor, no image/audio libraries."""
    none = {"format": None, "width": None, "height": None, "channels": None, "sample_rate_hz": None}
    if not blob:
        return none
    try:
        if blob[:8] == _PNG_MAGIC and len(blob) >= 24 and blob[12:16] == b"IHDR":
            w, h = _struct.unpack(">II", blob[16:24])
            return {**none, "format": "png", "width": w, "height": h}
        if blob[:6] in (b"GIF87a", b"GIF89a") and len(blob) >= 10:
            w, h = _struct.unpack("<HH", blob[6:10])
            return {**none, "format": "gif", "width": w, "height": h}
        if blob[:2] == b"BM" and len(blob) >= 26:
            w, h = _struct.unpack("<ii", blob[18:26])
            return {**none, "format": "bmp", "width": w, "height": abs(h)}
        if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
            # walk RIFF chunks to the fmt chunk (canonical or not)
            off = 12
            while off + 8 <= len(blob):
                cid, csize = blob[off : off + 4], _struct.unpack("<I", blob[off + 4 : off + 8])[0]
                if cid == b"fmt " and off + 16 <= len(blob):
                    ch, rate = _struct.unpack("<HI", blob[off + 10 : off + 16])
                    return {**none, "format": "wav", "channels": ch, "sample_rate_hz": rate}
                off += 8 + csize + (csize & 1)  # chunks are word-aligned
            return {**none, "format": "wav"}
        if blob[:2] == b"\xff\xd8":
            # walk JPEG segments to the first SOF0-SOF3 frame header
            off = 2
            while off + 4 <= len(blob) and blob[off] == 0xFF:
                marker, seglen = blob[off + 1], _struct.unpack(">H", blob[off + 2 : off + 4])[0]
                if 0xC0 <= marker <= 0xC3 and off + 9 <= len(blob):
                    h, w = _struct.unpack(">HH", blob[off + 5 : off + 9])
                    return {**none, "format": "jpeg", "width": w, "height": h}
                off += 2 + seglen
            return {**none, "format": "jpeg"}
    except (_struct.error, IndexError):
        return none
    return none


def _synth_blob(doc_id: int) -> bytes:
    """Deterministic minimal-but-valid media bytes for doc_id (the test
    vector generator for the header parser; cycles png/gif/bmp/wav/jpeg).
    Dimensions/params are closed-form in doc_id so an SQL oracle can verify
    the PARSE path end-to-end: synth bytes → sniff_header == formula."""
    kind = doc_id % 5
    w, h = doc_id % 640 + 1, (doc_id * 7) % 480 + 1
    if kind == 0:  # PNG: magic + IHDR (zeroed CRC) + IEND
        ihdr = _struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
        return (
            _PNG_MAGIC
            + _struct.pack(">I", 13) + b"IHDR" + ihdr + b"\0\0\0\0"
            + _struct.pack(">I", 0) + b"IEND" + b"\0\0\0\0"
        )
    if kind == 1:  # GIF89a logical screen descriptor + trailer
        return b"GIF89a" + _struct.pack("<HHBBB", w, h, 0, 0, 0) + b";"
    if kind == 2:  # BMP: 14-byte file header + BITMAPINFOHEADER
        info = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 2835, 2835, 0, 0)
        return b"BM" + _struct.pack("<IHHI", 54, 0, 0, 54) + info
    if kind == 3:  # WAV: RIFF/WAVE + canonical fmt chunk + empty data chunk
        ch, rate = doc_id % 2 + 1, 8000 + (doc_id % 3) * 4000
        fmt = _struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
        return (
            b"RIFF" + _struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + _struct.pack("<I", 16) + fmt
            + b"data" + _struct.pack("<I", 0)
        )
    # JPEG: SOI + SOF0 (3 components) + EOI
    sof = _struct.pack(">BHHB", 8, h, w, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    return b"\xff\xd8" + b"\xff\xc0" + _struct.pack(">H", 2 + len(sof)) + sof + b"\xff\xd9"


def synth_media(docs: DataFrame) -> DataFrame:
    """doc_id → deterministic media blobs (MEDIA_SCHEMA), the parser's
    oracle-checkable input."""
    kinds = ("png", "gif", "bmp", "wav", "jpeg")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "content": [_synth_blob(int(i)) for i in ids],
                    "media_type": [kinds[int(i) % 5] for i in ids],
                }
            )

    return docs.select("doc_id").mapInPandas(kernel, MEDIA_SCHEMA)


MEDIA_INFO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("channels", T.LongType(), True),
        T.StructField("sample_rate_hz", T.LongType(), True),
    ]
)


def media_info(media: DataFrame) -> DataFrame:
    """Header-parse a binary media column (real byte-level extraction via
    :func:`sniff_header`) — mapInPandas, Arrow-batched, schema-stable."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                info = sniff_header(bytes(content) if content is not None else None)
                rows.append(
                    (doc_id, info["format"], info["width"], info["height"],
                     info["channels"], info["sample_rate_hz"])
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_INFO_SCHEMA.fields])

    return media.mapInPandas(kernel, MEDIA_INFO_SCHEMA)


def gen_media_info_oracle(d: Dialect) -> str:
    """Closed-form oracle for synth→parse: what sniff_header MUST recover
    from _synth_blob(doc_id)'s bytes.  A parser or synthesizer bug breaks
    the hash match."""
    return """
SELECT doc_id,
  CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'bmp'
                  WHEN 3 THEN 'wav' ELSE 'jpeg' END AS format,
  CASE WHEN doc_id % 5 IN (0, 1, 2, 4) THEN CAST(doc_id % 640 + 1 AS BIGINT) END AS width,
  CASE WHEN doc_id % 5 IN (0, 1, 2, 4) THEN CAST((doc_id * 7) % 480 + 1 AS BIGINT) END AS height,
  CASE WHEN doc_id % 5 = 3 THEN CAST(doc_id % 2 + 1 AS BIGINT) END AS channels,
  CASE WHEN doc_id % 5 = 3 THEN CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) END AS sample_rate_hz
FROM documents
""".strip()


def gen_binary_meta(d: Dialect) -> str:
    """Oracle-checked binary metadata: byte length, md5 digest, first byte."""
    return f"""
SELECT
  doc_id,
  length(text) AS n_bytes,
  {d.md5_utf8("text")} AS digest,
  {d.ascii_safe("text")} AS first_byte
FROM documents
""".strip()


def features_oracle_sql() -> str:
    """DuckDB-ONLY oracle for :func:`extract_features` over the
    documents-as-media carrier: decode_stub's arithmetic is a pure
    function of the payload bytes (length, and the sum of the first 64
    byte values), so it is replicable relationally — byte values come
    from the hex rendering of the BLOB (DuckDB cannot slice BLOBs
    directly, but ``unhex``/``hex`` round-trips give positional byte
    access).  media_type is always 'text' on this carrier, so the codec
    error column is constantly NULL.  frame_sample/resize stay rows-only:
    their outputs are raw BINARY columns, and the driver comparator's
    treatment of Spark bytearray cells is unproven — pytest covers them
    byte-exactly instead."""
    byte_i = "CAST('0x' || substring(hx, 2 * i - 1, 2) AS INT)"
    return f"""
WITH m AS (
  SELECT doc_id, encode(text) AS content FROM documents
),
b AS (
  SELECT doc_id, octet_length(content) AS n, hex(content) AS hx FROM m
),
s AS (
  SELECT b.doc_id,
         coalesce(sum({byte_i}), 0) AS head_sum
  FROM b, unnest(generate_series(1, least(b.n, 64))) AS _i(i)
  WHERE b.n IS NOT NULL
  GROUP BY b.doc_id
)
SELECT b.doc_id, 'text' AS media_type,
       CAST(b.n AS BIGINT) AS n_bytes,
       CAST(CASE WHEN b.n IS NULL THEN NULL ELSE (b.n % 640) + 1 END AS INT) AS width,
       CAST(CASE WHEN b.n IS NULL THEN NULL ELSE ((b.n * 7) % 480) + 1 END AS INT) AS height,
       CASE WHEN b.n IS NULL THEN NULL
            ELSE round((coalesce(s.head_sum, 0) % 1000) / 1000.0, 6) END AS feature_norm,
       CAST(NULL AS VARCHAR) AS decode_error
FROM b LEFT JOIN s ON b.doc_id = s.doc_id
""".strip()


def frame_sample_oracle_sql(n_frames: int = 4, frame_len: int = 64) -> str:
    """DuckDB-ONLY oracle for the HEX-projected frame-sample entry: frame
    count k = min(n_frames, max(len // frame_len, 1)), offsets (len·i)//k,
    and each frame's bytes re-derived as a substring of the payload's hex
    rendering (2 hex chars per byte).  Lowercase hex on both engines —
    Spark's hex() is uppercase, DuckDB's lowercase, so the shared output
    contract is lower(hex(...))."""
    return f"""
WITH m AS (
  SELECT doc_id, encode(text) AS content FROM documents WHERE text IS NOT NULL
),
b AS (
  SELECT doc_id, octet_length(content) AS n, lower(hex(content)) AS hx FROM m
),
k AS (
  SELECT doc_id, n, hx,
         least({n_frames}, greatest(n // {frame_len}, 1)) AS nf
  FROM b
)
SELECT doc_id, CAST(i AS INT) AS frame_no,
       CAST((n * i) // nf AS BIGINT) AS frame_offset,
       substring(hx, 2 * ((n * i) // nf) + 1, 2 * {frame_len}) AS frame_hex,
       CAST(least({frame_len}, n - (n * i) // nf) AS INT) AS frame_len
FROM k, unnest(generate_series(0, nf - 1)) AS _i(i)
""".strip()


def resize_oracle_sql(target_w: int = 224, target_h: int = 224) -> str:
    """DuckDB-ONLY oracle for the HEX-projected resize entry: every
    ``step``-th byte (step = max(len // target_bytes, 1)) up to
    ``target_bytes`` bytes — blob[::step][:target_bytes] — reassembled as
    an ordered string_agg of hex byte pairs.  A zero-length payload has no
    selected positions (empty generate_series), but the kernel emits the
    EMPTY subsample, not NULL — hence the n-aware coalesce (found by the
    randomized battery's empty-text docs)."""
    target_bytes = max(target_w * target_h // 256, 16)
    return f"""
WITH m AS (
  SELECT doc_id, encode(text) AS content, 'text' AS media_type FROM documents
),
b AS (
  SELECT doc_id, media_type, octet_length(content) AS n, lower(hex(content)) AS hx
  FROM m
),
params AS (
  SELECT doc_id, media_type, n, hx,
         greatest(n // {target_bytes}, 1) AS step
  FROM b WHERE n IS NOT NULL
),
sel AS (
  SELECT doc_id,
         string_agg(substring(hx, 2 * (i * step) + 1, 2), '' ORDER BY i) AS content_hex,
         CAST(count(*) AS INT) AS n_out
  FROM params,
       unnest(generate_series(0, least({target_bytes}, (n + step - 1) // step) - 1)) AS _i(i)
  GROUP BY doc_id
)
SELECT b.doc_id, b.media_type,
       CAST({target_w} AS INT) AS width, CAST({target_h} AS INT) AS height,
       CASE WHEN b.n IS NULL THEN NULL ELSE coalesce(s.content_hex, '') END AS content_hex,
       CASE WHEN b.n IS NULL THEN CAST(NULL AS INT) ELSE coalesce(s.n_out, 0) END AS n_content_bytes
FROM b LEFT JOIN sel s ON b.doc_id = s.doc_id
""".strip()


def gen_byte_entropy(d: Dialect) -> str:
    """Per-payload byte-level Shannon entropy over the documents-as-media
    carrier — the compressibility probe a binary pipeline runs BEFORE
    spending codec time: near-8-bit entropy means already-compressed or
    encrypted content (skip recompression, flag for review), low entropy
    means text/padding.  Fully relational (no pandas UDF): positional
    byte access via the lower(hex(...)) rendering — the same round-trip
    idiom as the frame/resize oracles — so Spark and DuckDB run the
    identical query.

    100 TB shape: hex explode (map, ~2× the payload in transit) → two
    partial-combining aggregates keyed by doc_id.  Empty payloads emit
    NULL entropy via LEFT JOIN (mirrors text_char_entropy's contract,
    including its 0.0-minus-sum sign pin for single-byte payloads).
    """
    content = d.encode_utf8("text")
    byte_i = d.hex12_to_bigint("substr(hx, 2 * i - 1, 2)")
    lat = d.lateral_seq("1", "n", "i")
    p = "(CAST(c AS DOUBLE) / n)"
    return f"""
WITH m AS (
  SELECT doc_id, octet_length({content}) AS n, lower(hex({content})) AS hx
  FROM documents WHERE text IS NOT NULL
),
bytes_rel AS (
  SELECT doc_id, {byte_i} AS b
  FROM (SELECT doc_id, n, hx FROM m WHERE n >= 1) m1
  {lat}
),
bc AS (SELECT doc_id, b, count(*) AS c FROM bytes_rel GROUP BY doc_id, b),
e AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bytes,
         {d.trunc6(f"0.0 - sum({p} * ln({p}))")} AS byte_entropy
  FROM (SELECT doc_id, b, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM bc) t
  GROUP BY doc_id
)
SELECT m.doc_id, CAST(m.n AS BIGINT) AS payload_bytes,
       e.byte_entropy AS byte_entropy
FROM m LEFT JOIN e ON m.doc_id = e.doc_id
""".strip()


# Shared aggregate text for the dimension audit: the Spark side runs it over
# the media_info() mapInPandas relation, the oracle over the closed-form
# synth params — so a parser regression that corrupts widths/heights breaks
# the aggregate hash exactly like it breaks the row-level entry.
_DIM_AUDIT_AGG = """
SELECT format,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(min(width) AS BIGINT) AS min_width,
       CAST(max(width) AS BIGINT) AS max_width,
       CAST(min(height) AS BIGINT) AS min_height,
       CAST(max(height) AS BIGINT) AS max_height,
       CAST(sum(CASE WHEN width IS NOT NULL AND height IS NOT NULL
                      AND (width > 4 * height OR height > 4 * width)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme_aspect,
       CAST(sum(CASE WHEN width IS NULL AND channels IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_unparsed
FROM {rel}
GROUP BY format
ORDER BY format
""".strip()


def dimension_audit(info: DataFrame) -> DataFrame:
    """Per-format dimension audit over a :func:`media_info` relation: size
    bounds, extreme-aspect-ratio counts (>4:1 either way — the
    crop/letterbox review queue), and unparsed-container counts.  The
    go/no-go gate before spending codec time on a 100 TB media corpus:
    one partial-combining aggregate on the tiny format key."""
    info.createOrReplaceTempView("_scs_media_info")
    return info.sparkSession.sql(_DIM_AUDIT_AGG.format(rel="_scs_media_info"))


def gen_dimension_audit_oracle(d: Dialect) -> str:
    """Oracle: the identical aggregate over the closed-form synth params."""
    return f"WITH mi AS (\n{gen_media_info_oracle(d)}\n)\n" + _DIM_AUDIT_AGG.format(
        rel="mi"
    )


def gen_ahash(d: Dialect, n_bits: int = 48) -> str:
    """Average-hash (aHash) perceptual fingerprint over the binary media
    carrier: bit i is set iff payload byte i is >= the mean of the first
    ``n_bits`` bytes.  This is the cheapest perceptual-hash family member
    — on real decoded images the bytes would be the 8x8 downsampled
    luma plane (PIL/libav, stubbed in this container); on the text carrier
    the construction, batching and bit packing are identical, which is the
    part the engine owns.

    Exactness: the mean comparison is done as ``byte * count >= sum``
    (integer cross-multiplication — no float mean, no rounding divergence),
    and the packed hash is a sum of distinct powers of two (order-free,
    overflow-safe at 48 bits).  Positional byte access via the
    lower(hex()) round-trip idiom shared with the frame/resize oracles.

    100 TB shape: map-only per-payload arithmetic inside the scan stage
    (lateral over <= n_bits positions), one partial-combining aggregate
    keyed by doc_id."""
    content = d.encode_utf8("text")
    byte_i = d.hex12_to_bigint("substr(hx, 2 * i - 1, 2)")
    lat = d.lateral_seq("1", f"least(n, {n_bits})", "i")
    return f"""
WITH m AS (
  SELECT doc_id, octet_length({content}) AS n, lower(hex({content})) AS hx
  FROM documents WHERE text IS NOT NULL
),
bytes_rel AS (
  SELECT doc_id, i, {byte_i} AS b
  FROM (SELECT doc_id, n, hx FROM m WHERE n >= 1) m1
  {lat}
),
stats AS (
  SELECT doc_id, CAST(sum(b) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
  FROM bytes_rel GROUP BY doc_id
)
SELECT br.doc_id,
       st.c AS n_head_bytes,
       CAST(sum(CASE WHEN br.b * st.c >= st.s
                     THEN {d.shl('CAST(1 AS BIGINT)', 'i - 1')} ELSE 0 END) AS BIGINT) AS ahash
FROM bytes_rel br JOIN stats st ON br.doc_id = st.doc_id
GROUP BY br.doc_id, st.c
ORDER BY br.doc_id
""".strip()


def gen_ahash_pairs(
    d: Dialect, n_bits: int = 48, n_bands: int = 4, max_hamming: int = 3
) -> str:
    """Near-duplicate MEDIA candidates: pairs of payloads whose aHash
    fingerprints differ in <= ``max_hamming`` bits, found by LSH banding
    over the hash (split the 48 bits into ``n_bands`` 12-bit bands; a pair
    within Hamming distance n_bands-1 must agree on >= one full band —
    pairs that disagree in every band are unreachable, which is the
    standard recall trade documented here, not hidden).  The hamming
    distance itself is exact popcount(xor) on the survivors.

    100 TB shape: band-keyed equi-join only (same discipline as the
    simhash tier); DISTINCT collapses multi-band hits before the popcount;
    no cross join."""
    band_bits = n_bits // n_bands
    ah = gen_ahash(d, n_bits)
    band = d.shr("h.ahash", f"b * {band_bits}")
    ham = d.popcount(d.bxor("a_hash", "b_hash"))
    lat = d.lateral_seq("0", str(n_bands - 1), "b")
    return f"""
WITH hashes AS (
  {ah.replace(chr(10), chr(10) + '  ')}
),
banded AS (
  SELECT h.doc_id, h.ahash, b AS band_no,
         CAST(({band}) % {1 << band_bits} AS BIGINT) AS band_val
  FROM hashes h
  {lat}
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, x.ahash AS a_hash,
                  y.doc_id AS doc_b, y.ahash AS b_hash
  FROM banded x JOIN banded y
    ON x.band_no = y.band_no AND x.band_val = y.band_val
   AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, {ham} AS hamming
FROM cand
WHERE {ham} <= {max_hamming}
ORDER BY hamming, doc_a, doc_b
""".strip()


# ---------------------------------------------------------------------------
# audio plane: real PCM parse + integer frame features (round 9)
# ---------------------------------------------------------------------------

AUDIO_N_SAMPLES = 256
AUDIO_FRAME_LEN = 64

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_no", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("energy", T.LongType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("peak_abs", T.LongType(), True),
    ]
)


def _synth_pcm(doc_id: int, n: int = AUDIO_N_SAMPLES) -> list[int]:
    """Closed-form int16 sample stream: s_i = ((doc_id*31 + i*17) % 2048)
    - 1024 — bounded |s| <= 1024 so frame energies stay far inside BIGINT,
    and the formula is replicable in SQL (the oracle's whole basis)."""
    return [((doc_id * 31 + i * 17) % 2048) - 1024 for i in range(n)]


def synth_audio(docs: DataFrame) -> DataFrame:
    """doc_id → deterministic WAV blob (RIFF header + real little-endian
    int16 PCM payload from :func:`_synth_pcm`) — the audio analogue of
    :func:`synth_media`: the parse path gets REAL container bytes."""
    import struct

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                pcm = struct.pack(f"<{AUDIO_N_SAMPLES}h", *_synth_pcm(int(doc_id)))
                fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
                blob = (
                    b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
                    + b"fmt " + struct.pack("<I", 16) + fmt
                    + b"data" + struct.pack("<I", len(pcm)) + pcm
                )
                rows.append((doc_id, blob, "wav"))
            yield pd.DataFrame(rows, columns=["doc_id", "content", "media_type"])

    return docs.select("doc_id").mapInPandas(kernel, MEDIA_SCHEMA)


def audio_features(media: DataFrame, frame_len: int = AUDIO_FRAME_LEN) -> DataFrame:
    """Frame-level audio features from a WAV binary column: REAL byte-level
    decode (RIFF data-chunk scan + ``numpy.frombuffer`` int16) and exact
    INTEGER features per frame — energy (Σ s²), zero crossings (sign
    changes over the negative/non-negative partition), peak |s|.  Exact
    integers are the cross-engine contract: a float RMS would drift, the
    integer moments cannot.

    1 audio row → n_frames rows (the UDTF shape), Arrow-batched via
    ``mapInPandas``; at 100 TB this is the map-only feature pass a
    training pipeline runs ahead of filtering/packing, partitioned by
    whatever the lake already keys media on.
    """
    import struct

    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                # RIFF scan for the data chunk (same contract as sniff_header:
                # byte-level, no codec libs)
                if len(blob) < 44 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
                    continue
                pos, data = 12, None
                while pos + 8 <= len(blob):
                    cid, clen = blob[pos:pos + 4], struct.unpack("<I", blob[pos + 4:pos + 8])[0]
                    if cid == b"data":
                        data = blob[pos + 8:pos + 8 + clen]
                        break
                    pos += 8 + clen + (clen % 2)
                if not data:
                    continue
                s = np.frombuffer(data, dtype="<i2").astype(np.int64)
                for f0 in range(0, len(s) - len(s) % frame_len, frame_len):
                    fr = s[f0:f0 + frame_len]
                    neg = fr < 0
                    rows.append(
                        (
                            int(doc_id),
                            f0 // frame_len,
                            len(fr),
                            int((fr * fr).sum()),
                            int((neg[1:] != neg[:-1]).sum()),
                            int(np.abs(fr).max()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(kernel, AUDIO_FEATURE_SCHEMA)


def gen_audio_features_oracle(
    d: Dialect, n_samples: int = AUDIO_N_SAMPLES, frame_len: int = AUDIO_FRAME_LEN
) -> str:
    """Closed-form oracle for synth→parse→features: what
    :func:`audio_features` MUST recover from :func:`synth_audio`'s PCM —
    the sample formula re-derived relationally per (doc, frame, sample).
    A header-scan, byte-order, or framing bug breaks the hash match."""
    s = "(((doc_id * 31 + (frame_no * {fl} + i - 1) * 17) % 2048) - 1024)".format(
        fl=frame_len
    )
    sp = s.replace("i - 1", "i - 2")  # previous sample (i >= 2)
    n_frames = n_samples // frame_len
    lat_f = d.lateral_seq("0", str(n_frames - 1), "frame_no")
    lat_i = d.lateral_seq("1", str(frame_len), "i")
    return f"""
WITH fr AS (
  SELECT doc_id, frame_no, i, CAST({s} AS BIGINT) AS sv,
         CASE WHEN i >= 2 THEN CAST({sp} AS BIGINT) END AS pv
  FROM (SELECT doc_id FROM documents) t
  {lat_f}
  {lat_i}
)
SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(sv * sv) AS BIGINT) AS energy,
       CAST(sum(CASE WHEN pv IS NOT NULL AND ((pv < 0) <> (sv < 0)) THEN 1 ELSE 0 END)
            AS BIGINT) AS zero_crossings,
       CAST(max(abs(sv)) AS BIGINT) AS peak_abs
FROM fr
GROUP BY doc_id, frame_no
ORDER BY doc_id, frame_no
""".strip()


# ---------------------------------------------------------------------------
# pHash: integer fixed-point 8x8 DCT-II perceptual hash
# ---------------------------------------------------------------------------

# DCT-II basis, fixed-point: C(u, x) = round(4096 * cos(pi * (2x+1) * u / 16)).
# Precomputed HERE in Python (one libm call site at import, embedded as
# integer literals) so the SQL on both engines is pure integer arithmetic —
# no cos() near a boundary can diverge between Spark's and DuckDB's libm.
import math as _math

DCT_SCALE = 4096
_DCT_C = tuple(
    tuple(round(DCT_SCALE * _math.cos(_math.pi * (2 * x + 1) * u / 16)) for x in range(8))
    for u in range(8)
)


def gen_phash(d: Dialect) -> str:
    """pHash perceptual fingerprint: 2-D DCT-II over the 8x8 "luma plane"
    (the first 64 payload bytes of the binary media carrier, row-major —
    on real decoded images this plane is the 32x32→8x8 downsampled luma,
    stubbed in this container; the transform, median split and bit
    packing are the engine-owned part), then bit (u,v) is set iff the AC
    coefficient exceeds the per-image AC MEDIAN — the classic pHash
    construction, which unlike aHash's mean-of-bytes is invariant to
    contrast/brightness rescale, the transform catching structure the
    average cannot.

    Exactness: the DCT basis is FIXED-POINT INTEGER (scale 4096, values
    precomputed in Python and embedded as a constant array literal — zero
    float ops in either engine); coefficients are exact BIGINTs
    (|F| <= 255*4096^2*64 < 2^48); the AC median is the rank-32 value of
    the SORTED coefficient array (an integer order statistic, never an
    interpolated float); the packed hash is a sum of distinct powers of
    two over bit indices 0..62 (sign-safe).

    100 TB shape: the ENTIRE construction is map-side integer folds
    inside the scan stage — ZERO joins, ZERO shuffles, no per-doc window.
    (The first formulation exploded 4096 weighted terms per doc through
    two doc-keyed shuffles; the 10x probe priced that at 125 s for 49 k
    docs.)  The two expensive intermediates — the 64x64-term coefficient
    fold and the sorted-AC median — are BOUND ONCE PER ROW by exploding a
    single-element array (a Generate blocks Spark's projection collapse,
    which would otherwise re-substitute the whole fold into every
    consumer: measured as a minutes-long interpreted-mode stall on 486
    rows; DuckDB's optimizer needed no such help but runs the same text).
    """
    content = d.encode_utf8("text")
    # constant basis array: cb[u*8 + x + 1] = round(4096*cos(pi*(2x+1)u/16))
    carr = d.arr_bigint(v for row in _DCT_C for v in row)
    byte_i = d.hex12_to_bigint("substr(hx, 2 * i - 1, 2)")
    bytes_arr = d.transform(d.seq("1", "64"), "i", byte_i)
    # SEPARABLE 2-D DCT (F = C·P·Cᵀ): row pass then column pass — 2 x 512
    # integer multiplies per doc instead of the naive 262 144 (the naive
    # fold ran interpreted at ~4 ms/doc; separability is the classic
    # fix and the sums merely reassociate — integer adds, bit-identical).
    # g[k = u*8+y] = Σ_x P[8y+x] · C[u][x]   (row transform)
    # F[c = u*8+v] = Σ_y g[u*8+y] · C[v][y]  (column transform)
    # (Spark's element_at demands INT indexes while `div` yields BIGINT —
    # CAST every computed index; DuckDB is indifferent.)
    gterm = (
        f"{d.elem('barr', 'CAST((k % 8) * 8 + x + 1 AS INT)')} "
        f"* {d.elem('cb', 'CAST(' + d.idiv('k', '8') + ' * 8 + x + 1 AS INT)')}"
    )
    grow = d.transform(
        d.seq("0", "63"), "k", d.reduce_bigint(d.seq("0", "7"), f"acc + {gterm}")
    )
    fterm = (
        f"{d.elem('gr', 'CAST(' + d.idiv('c', '8') + ' * 8 + x + 1 AS INT)')} "
        f"* {d.elem('cb', 'CAST((c % 8) * 8 + x + 1 AS INT)')}"
    )
    coefs = d.transform(
        d.seq("0", "63"), "c", d.reduce_bigint(d.seq("0", "7"), f"acc + {fterm}")
    )
    # acm = the 63 AC values ++ [their rank-32 sorted value] — one bound array
    ac = d.aslice("coefs", "2", "63")
    acm = d.aconcat(ac, d.arr1(d.elem(d.asort(ac), "32")))
    med = d.elem("acm", "64")
    pack_step = (
        f"CASE WHEN {d.elem('acm', 'CAST(x AS INT)')} > {med} "
        f"THEN acc + {d.shl('CAST(1 AS BIGINT)', 'x - 1')} ELSE acc END"
    )
    nbits_step = (
        f"CASE WHEN {d.elem('acm', 'CAST(x AS INT)')} > {med} THEN acc + 1 ELSE acc END"
    )
    if d.name == "spark":
        # Generate (LATERAL VIEW explode of a 1-element array) is the
        # projection-collapse barrier binding each fold ONCE per row;
        # DuckDB rejects outer-column lambda capture under lateral unnest
        # and needs no barrier (MATERIALIZED CTEs pin it there instead)
        gx = f"""gx AS (
  SELECT doc_id, cb, gr
  FROM bx {d.lateral_explode(d.arr1(grow), "gr")}
)"""
        co = f"""co AS (
  SELECT doc_id, coefs
  FROM gx {d.lateral_explode(d.arr1(coefs), "coefs")}
)"""
        acr = f"""acr AS (
  SELECT doc_id, acm
  FROM co {d.lateral_explode(d.arr1(acm), "acm")}
)"""
    else:
        gx = f"gx AS MATERIALIZED (\n  SELECT doc_id, cb, {grow} AS gr FROM bx\n)"
        co = f"co AS MATERIALIZED (\n  SELECT doc_id, {coefs} AS coefs FROM gx\n)"
        acr = f"acr AS MATERIALIZED (\n  SELECT doc_id, {acm} AS acm FROM co\n)"
    return f"""
WITH m AS (
  SELECT doc_id, lower(hex({content})) AS hx
  FROM documents WHERE text IS NOT NULL AND octet_length({content}) >= 64
),
bx AS (
  SELECT doc_id, {bytes_arr} AS barr, {carr} AS cb FROM m
),
{gx},
{co},
{acr}
SELECT doc_id,
       CAST({d.reduce_bigint(d.seq("1", "63"), pack_step)} AS BIGINT) AS phash,
       CAST({d.reduce_bigint(d.seq("1", "63"), nbits_step)} AS BIGINT) AS n_bits_set
FROM acr
ORDER BY doc_id
""".strip()
