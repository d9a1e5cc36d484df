"""Incremental crawl: a path stream → stat/enrich → epoch-committed lake.

The reference's dbproc loop buffers INSERTs and commits on a wall-clock
timer (group commit, storcrawl.py:382-391) while the status daemon appends
progress rows (storcrawl.py:491-528).  The Structured Streaming shape is
``foreachBatch``: each micro-batch is one atomic append (the epoch IS the
group commit), and each epoch writes its own status row — so the report
plane's rate queries run over a live incremental crawl's telemetry.

Source: a landing directory of text files, one filesystem path per line —
the pattern a producer (notification queue drainer, scheduled lister)
feeds at scale; Spark's file-stream source gives exactly-once per landed
file.  The stat/enrich stage reuses the batch crawl's Arrow kernels, so
incremental and full crawls cannot drift semantically.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from storage_crawler_spark.config import CrawlConfig
from storage_crawler_spark.crawl.walker import _entry_record
from storage_crawler_spark.functions.owners import owner_col
from storage_crawler_spark.functions.paths import extension_col, mode_bits_col
from storage_crawler_spark.schemas import ENTRY_SCHEMA


def read_path_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-stream of newline-delimited paths (one landed file = one unit
    of exactly-once processing)."""
    return (
        spark.readStream.format("text")
        .load(landing_dir)
        .select(F.encode(F.col("value"), "utf-8").alias("path"))
    )


def _stat_batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in ENTRY_SCHEMA.fields]
    for pdf in pdfs:
        recs = []
        for raw in pdf["path"]:
            p = bytes(raw)
            try:
                st = os.lstat(p)
                recs.append(
                    _entry_record(p, st, os.path.isdir(p) and not os.path.islink(p), os.path.islink(p), None)
                )
            except OSError as exc:
                recs.append(_entry_record(p, None, False, False, str(exc)))
        yield pd.DataFrame(recs, columns=cols)


def stat_enrich(paths: DataFrame, config: CrawlConfig, owners: dict[bytes, str] | None = None) -> DataFrame:
    """lstat + extension/owner/mode-bits enrichment (same kernels as the
    batch crawl — one code path for both modes)."""
    entries = paths.mapInPandas(_stat_batches, ENTRY_SCHEMA)
    return (
        entries.withColumn("extension", extension_col(F.col("path"), config.extension_length))
        .withColumn("owner", owner_col(paths.sparkSession, F.col("path"), owners or {}))
        .withColumn("st_mode", mode_bits_col(F.col("st_mode_int")))
        .withColumn("insert_time", F.current_timestamp())
        .withColumn("st_dev", F.col("st_dev").cast("string"))
    )


def incremental_crawl(
    spark: SparkSession,
    landing_dir: str,
    lake_root: str,
    tag: str = "incremental",
    config: CrawlConfig | None = None,
    owners: dict[bytes, str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the incremental crawl; returns the StreamingQuery.

    Each micro-batch appends to ``<lake>/storcrawl_<tag>/files`` and writes
    one normalized status row (epoch id, rows committed) to ``.../status``
    — the epoch is the group commit.  ``available_now=True`` drains what
    has landed and stops (cron-style incremental); False runs continuous.
    """
    cfg = config or CrawlConfig()
    tag_dir = os.path.join(lake_root, f"storcrawl_{tag}")
    files_dir = os.path.join(tag_dir, "files")
    status_dir = os.path.join(tag_dir, "status")
    checkpoint = os.path.join(tag_dir, "_checkpoint")

    enriched = stat_enrich(read_path_stream(spark, landing_dir), cfg, owners)

    def commit_epoch(batch: DataFrame, epoch_id: int) -> None:
        n = batch.count()
        batch.write.mode("append").parquet(files_dir)
        batch.sparkSession.createDataFrame(
            [(int(epoch_id), "file metadata inserts", float(n), "inserts")],
            "id BIGINT, status STRING, value DOUBLE, units STRING",
        ).withColumn("time", F.current_timestamp()).write.mode("append").parquet(status_dir)

    writer = (
        enriched.writeStream.foreachBatch(commit_epoch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
