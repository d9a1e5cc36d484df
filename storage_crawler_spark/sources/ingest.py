"""Text-format ingestion (JSONL / CSV) with oracle-gated fidelity.

A training-data pipeline rarely receives clean parquet: the landing zone is
JSONL dumps and CSV exports.  This module provides schema-pinned readers
for the ``documents`` table in both formats, and the registry gates them
end-to-end: the Spark side converts parquet → format → DataFrame and
aggregates; the DuckDB oracle aggregates the ORIGINAL parquet — so the
checked equality proves the format round-trip is byte-faithful (the
aggregate includes a text-digest sum, not just counts).

Format pitfalls handled explicitly (each is a real-world silent-corruption
source at scale):

- CSV: ``text`` values may contain the delimiter, quotes, and newlines —
  ``multiLine`` + quote/escape options are pinned; header on; NULLs
  round-trip via the default empty-vs-missing convention with
  ``nullValue`` set to an out-of-band token (an empty string is a VALID
  text, so the usual ""-as-NULL default would corrupt it).
- JSONL: lossless for strings (unicode escapes); schema is explicitly
  pinned so a missing field is a NULL, not a dropped column; column order
  in the file is irrelevant.
- Both readers take an explicit schema — inference on a 100 TB landing
  zone is a full extra pass AND a correctness hazard (a first file of all
  NULLs types the column wrong).

The derived format files are written once per (sf_dir, format) into a
deterministic temp location and reused — the conversion is setup, not the
measured operator.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = (
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
)

# out-of-band NULL token: documents.text may legitimately be '' (empty
# string), so CSV must not use the default ""-as-NULL convention.  Printable
# on purpose — a NUL-byte sentinel does not survive the CSV writer stack.
_CSV_NULL = "__SCS_NULL_9f3a__"

# the CSV WRITER trims whitespace by default (ignoreLeading/TrailingWhiteSpace
# default TRUE on write), silently corrupting whitespace-only texts — both
# flags are pinned false on writer AND reader
_CSV_OPTS = {
    "header": True,
    "quote": '"',
    "escape": '"',
    "nullValue": _CSV_NULL,
    "ignoreLeadingWhiteSpace": False,
    "ignoreTrailingWhiteSpace": False,
}


def _derived_dir(sf_dir: str, fmt: str) -> str:
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(
        tempfile.gettempdir(), f"scs_ingest_{fmt}_{key}"
    )


def _ensure_derived(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    out = _derived_dir(sf_dir, fmt)
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        src = spark.read.parquet(f"{sf_dir}/documents.parquet")
        if fmt == "json":
            src.write.mode("overwrite").json(out)
        elif fmt == "csv":
            src.write.mode("overwrite").options(**_CSV_OPTS).csv(out)
        elif fmt == "orc":
            src.write.mode("overwrite").orc(out)
        else:
            raise ValueError(f"unknown ingest format: {fmt}")
    return out


def read_documents_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_derived(spark, sf_dir, "json")
    return spark.read.schema(DOCS_SCHEMA).json(path)


def read_documents_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_derived(spark, sf_dir, "csv")
    return (
        spark.read.schema(DOCS_SCHEMA)
        .options(multiLine=True, **_CSV_OPTS)
        .csv(path)
    )


def read_documents_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC ingestion (columnar alternative landing format; built into
    Spark — vectorized reader, predicate pushdown, zlib/zstd codecs).
    Binary-typed columnar formats have no quoting/NULL-convention pitfalls;
    the fidelity gate still proves the type mapping round-trips.  (Avro is
    the one landing format NOT covered: the spark-avro connector is not on
    this classpath.)"""
    path = _ensure_derived(spark, sf_dir, "orc")
    return spark.read.schema(DOCS_SCHEMA).orc(path)


def fidelity_fingerprint(docs: DataFrame) -> DataFrame:
    """Per-lang fidelity aggregate: row count, n_chars sum, and a
    text-digest sum (first 12 hex of md5 as a 48-bit int, summed) — equal
    digests across the format round-trip prove every text byte survived,
    which counts alone cannot."""
    digest = F.expr(
        "CASE WHEN text IS NULL THEN CAST(-1 AS BIGINT) "
        "ELSE CAST(conv(substr(md5(encode(text, 'utf-8')), 1, 12), 16, 10) AS BIGINT) END"
    )
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(digest).alias("text_digest_sum"),
        )
        .select("lang", "n_docs", "sum_chars", "text_digest_sum")
    )


# DuckDB oracle: the same fingerprint over the ORIGINAL parquet — equality
# through the format round-trip is the fidelity claim.
FIDELITY_ORACLE = """
SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars,
       CAST(sum(CASE WHEN text IS NULL THEN CAST(-1 AS BIGINT)
                     ELSE CAST('0x' || substr(md5(text), 1, 12) AS BIGINT) END) AS BIGINT) AS text_digest_sum
FROM documents
GROUP BY lang
""".strip()
