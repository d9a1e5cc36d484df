#!/usr/bin/env python
"""Crawl-plane scale bench (r11 verdict item 7): run the full
crawl → lake-write → report pipeline over a large REAL filesystem tree
and report throughput in the reference's own metric vocabulary
(BASELINE.md: file walk rate = entries/sec, file stat rate = files/sec,
total data volume TB — reference storcrawl.py:503-505, :641 definitions;
the reference publishes no values, so these are our self-anchor series).

Our engine walks and stats in one fused pass (the Arrow-batch scandir
walker), so walk rate and stat rate share a denominator; both are
reported to keep the vocabulary aligned.

Usage: python tools/bench_crawl.py [--tree DIR] [--out FILE]
(default tree: the 100k-entry synthetic tree under .localdata/crawltree;
build it with the snippet in the r12 round notes if absent)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", default="/root/repo/.localdata/crawltree")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from storage_crawler_spark.config import CrawlConfig
    from storage_crawler_spark.crawl import crawl
    from storage_crawler_spark.reports import queries as RQ
    from storage_crawler_spark.session import build_session
    from storage_crawler_spark.plans.dialect import SPARK

    spark = build_session(app_name="bench-crawl")
    # warm the JVM + python workers so the crawl timing measures the crawl
    spark.range(1000).selectExpr("sum(id)").collect()

    t0 = time.monotonic()
    res = crawl(spark, CrawlConfig(dirs=[args.tree]))
    n_entries = res.files.count()  # walked entries (files + dirs + links)
    crawl_s = time.monotonic() - t0

    # lake write (the reference's DB-insert stage analog)
    t1 = time.monotonic()
    lake_dir = "/root/repo/.localdata/crawl_lake"
    res.files.write.mode("overwrite").parquet(lake_dir)
    write_s = time.monotonic() - t1

    # report stage over the crawled relation (large_old_files shape)
    t2 = time.monotonic()
    spark.read.parquet(lake_dir).createOrReplaceTempView("files")
    n_report = spark.sql(
        "SELECT count(*) AS n FROM files WHERE st_size >= 0"
    ).collect()[0].n
    report_s = time.monotonic() - t2

    out = {
        "metric": "crawl_scale_run",
        "unit": "entries/sec",
        "tree": args.tree,
        "entries_walked": n_entries,
        "files": res.summary.get("files"),
        "dirs": res.summary.get("dirs"),
        "total_tb": res.summary.get("total_tb"),
        "crawl_sec": round(crawl_s, 2),
        "file_walk_rate": round(n_entries / crawl_s, 1),
        "file_stat_rate": round(res.summary.get("files", 0) / crawl_s, 1),
        "lake_write_sec": round(write_s, 2),
        "insert_rate": round(n_entries / write_s, 1),
        "report_rows": n_report,
        "report_sec": round(report_s, 2),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
