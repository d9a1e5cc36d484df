#!/usr/bin/env python
"""Interleaved A/B: dedup_jaccard_pairs at HEAD vs its r12 formulation
(r13 verdict item 4 — settle whether r12's 1.70s quiet number was the
real anchor or a box outlier).

The builder (`_b_jaccard_pairs`) is byte-identical between r12 (45935ed)
and HEAD — the delta is the r13 display rework inside the SQL generators
(trunc6'd DOUBLE division -> exact integer floor-division scores).  So the
A/B extracts each checkout's SQL trio (prep / ranked / pairs) as TEXT via
a subprocess with that checkout on sys.path, then executes both trios in
ONE bench-configured session, interleaved A,B,B,A,... (alternating start
so neither form always pays a cache-adjacent slot), with the bench
protocol per rep: clearCache, build, count, limit(10).collect.

Usage: python tools/ab_jaccard_r12.py [--reps 6] [--r12 /tmp/r12repo]
Emits one JSON line {"metric": "ab_jaccard_r12", ...} and per-rep stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_EXTRACT = """
import json, sys
sys.path.insert(0, {root!r})
from storage_crawler_spark.operators import dedup
from storage_crawler_spark.plans.dialect import SPARK
print(json.dumps({{
    "prep": dedup.gen_jaccard_prep(SPARK, src="_documents_rep"),
    "ranked": dedup.gen_jaccard_ranked(SPARK, "_jaccard_prep", src="documents"),
    "pairs": dedup.gen_jaccard_pairs(SPARK, ranked_rel="_jaccard_ranked"),
}}))
"""


def _sql_trio(root: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _EXTRACT.format(root=root)],
        capture_output=True,
        text=True,
        check=True,
        cwd=root,
        env={**os.environ, "PYTHONPATH": root},
    )
    return json.loads(out.stdout)


def _run_once(spark, trio: dict) -> tuple[float, int]:
    spark.catalog.clearCache()
    t0 = time.time()
    n = spark.sparkContext.defaultParallelism
    spark.table("documents").repartition(n).createOrReplaceTempView("_documents_rep")
    spark.sql(trio["prep"]).createOrReplaceTempView("_jaccard_prep")
    ranked = spark.sql(trio["ranked"])
    from storage_crawler_spark.plans.registry import _persist_view

    _persist_view(ranked, "_jaccard_ranked")
    df = spark.sql(trio["pairs"])
    rows = df.count()
    _ = df.limit(10).collect()
    return time.time() - t0, rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--r12", default="/tmp/r12repo")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    head_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    trios = {"head": _sql_trio(head_root), "r12": _sql_trio(args.r12)}
    same = {k: trios["head"][k] == trios["r12"][k] for k in ("prep", "ranked", "pairs")}
    print(f"# sql identical per stage: {same}", file=sys.stderr)

    from storage_crawler_spark.session import build_session
    from storage_crawler_spark.plans.views import register_base_tables

    spark = build_session(
        app_name="ab-jaccard-r12",
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g")},
    )
    register_base_tables(spark, args.sf, ("documents",))
    spark.table("documents").count()  # parquet footers + JVM warm
    # one untimed warm pass of each form (codegen/Arrow warm)
    for k in ("head", "r12"):
        _run_once(spark, trios[k])

    times: dict[str, list[float]] = {"head": [], "r12": []}
    rows_seen: dict[str, int] = {}
    for rep in range(args.reps):
        order = ("head", "r12") if rep % 2 == 0 else ("r12", "head")
        for k in order:
            dt, rows = _run_once(spark, trios[k])
            times[k].append(round(dt, 3))
            rows_seen[k] = rows
            print(f"# rep {rep} {k}: {dt:.3f}s ({rows} rows)", file=sys.stderr)

    out = {
        "metric": "ab_jaccard_r12",
        "unit": "sec",
        "sf": args.sf,
        "reps": args.reps,
        "sql_identical": same,
        "rows": rows_seen,
        "head": {
            "times": times["head"],
            "min": min(times["head"]),
            "median": round(statistics.median(times["head"]), 3),
        },
        "r12": {
            "times": times["r12"],
            "min": min(times["r12"]),
            "median": round(statistics.median(times["r12"]), 3),
        },
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
