"""Streaming ingestion of the ``documents`` landing zone — the
LLM-pipeline twin of the events file stream (streaming/events.py): new
landing files arrive continuously, and dedup must happen ON THE WAY IN,
not in a nightly batch over the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storage_crawler_spark.sources.ingest import DOCS_SCHEMA


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over ``documents.parquet`` with the pinned landing
    schema (inference on a stream source is both an extra pass and a
    correctness hazard — same rule as the batch readers)."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def docs_stream_dedup(docs: DataFrame) -> DataFrame:
    """Streaming exact-dedup of the landing feed: one row per distinct
    text fingerprint, however many times (and in however many
    micro-batches) duplicates arrive.  WHICH physical row survives is
    arrival-order dependent, so only the deterministic part — the
    fingerprint key set — is emitted, and the batch oracle is a plain
    SELECT DISTINCT.

    State note: ``dropDuplicates`` keys state for the stream's lifetime,
    which is correct for the bounded AvailableNow runs the gate executes;
    a perpetual deployment bounds it by keying on (fp, landing day) with
    ``dropDuplicatesWithinWatermark`` over the file-arrival time, exactly
    as the events-plane dedup does (streaming/events.py:194-209).
    """
    return (
        docs.filter(F.col("text").isNotNull())
        .select(F.md5(F.encode(F.col("text"), "utf-8")).alias("fp"))
        .dropDuplicates(["fp"])
    )


def urls_stream_dedup(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Streaming URL-level dedup of the landing feed — the ingest-side
    twin of the batch ``ingest_url_dedup`` manifest, completing the
    C4/CCNet ingest path: canonicalize ON THE WAY IN and drop URL twins
    before any content tier pays for them.

    The canonicalizer is the SAME dialect generator the batch tier runs
    (operators/urls.gen_url_rel — the layered string algebra is a
    stateless projection, so it streams as-is via a SQL view over the
    streaming frame); ``dropDuplicates`` on the canonical URL keys the
    stateful dedup.  WHICH arrival survives is micro-batch-order
    dependent, so only the deterministic canonical-URL key set is emitted
    (the docs_stream_dedup convention); the batch oracle is SELECT
    DISTINCT curl over the same relation.

    100 TB posture: map-side string algebra per micro-batch + state keyed
    by curl; a perpetual deployment bounds state with
    ``dropDuplicatesWithinWatermark`` over the file-arrival time, exactly
    as the events-plane dedup does (streaming/events.py:194-209).
    """
    from storage_crawler_spark.operators.urls import gen_url_rel
    from storage_crawler_spark.plans.dialect import SPARK

    docs.createOrReplaceTempView("_docs_stream_urls")
    u = spark.sql(gen_url_rel(SPARK, docs_rel="_docs_stream_urls"))
    return u.select("curl").dropDuplicates(["curl"])
