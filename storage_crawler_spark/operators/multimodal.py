"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a metadata
struct, exactly how a 100 TB training-data lake stores them (parquet binary
+ sidecar fields).  The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested; the
actual codec decode is STUBBED (this container has no image/audio libs):
``decode_stub`` emits deterministic fake features and raises
``NotImplementedError`` only if asked for a real codec.

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
