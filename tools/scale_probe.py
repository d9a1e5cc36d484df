#!/usr/bin/env python
"""10x scale probe: time registry entries at the base SF and at an
N-fold key-offset replica of the same tables, and report the wall ratio.

This is the perf-only companion of tools/check_oracle.py — the r11/r11c
probes of this kind caught real plan pathologies pre-ship (the pHash
explode-join, the sitemap projection collapse, the kNN-graph quadratic
candidate stage).  Replicas offset the table's primary key per copy so
key cardinality scales with the data (a replica with duplicate keys would
flatter any groupBy); value columns repeat, which is fine for a wall-time
probe (the driver's correctness gate runs on the real generators).

Usage:
  python tools/scale_probe.py --entries a,b,c [--sf DIR] [--factor 10]
                              [--out BENCH_rN_scaleprobe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# per-table BIGINT key columns offset per replica copy (copy i adds
# i * (max(key) + 1)); tables absent here are copied once, unreplicated
# (dimension tables — replicating them would break FK joins)
OFFSET_KEYS = {
    "embeddings": ("vec_id",),
    "documents": ("doc_id",),
    "events": ("event_id", "user_id"),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
}


def build_replica(sf_dir: str, out_dir: str, factor: int) -> None:
    con = duckdb.connect()
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        dst = f"{out_dir}/{t}.parquet"
        keys = OFFSET_KEYS.get(t)
        if not keys or factor <= 1:
            shutil.copyfile(src, dst)
            continue
        spans = {
            k: con.execute(
                f"SELECT coalesce(max({k}), 0) + 1 FROM read_parquet('{src}')"
            ).fetchone()[0]
            for k in keys
        }
        cols = list(
            con.execute(
                f"SELECT column_name FROM (DESCRIBE SELECT * FROM read_parquet('{src}'))"
            ).df()["column_name"]
        )
        parts = []
        for i in range(factor):
            sel = ", ".join(
                f"CAST({c} + {i * spans[c]} AS BIGINT) AS {c}" if c in spans else c
                for c in cols
            )
            parts.append(f"SELECT {sel} FROM read_parquet('{src}')")
        union = "\nUNION ALL\n".join(parts)
        con.execute(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")


def time_entry(spark, spec, sf_dir: str) -> tuple[float, int]:
    spark.catalog.clearCache()
    t0 = time.monotonic()
    df = spec.builder(spark, sf_dir)
    n = df.count()
    df.limit(5).collect()
    dt = time.monotonic() - t0
    return round(dt, 3), n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries", required=True)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default=None)
    ap.add_argument("--metric", default="scale_probe_10x_wall")
    ap.add_argument("--driver-mem", default="12g")
    args = ap.parse_args()
    entries = [e.strip() for e in args.entries.split(",") if e.strip()]

    from storage_crawler_spark.plans import registry
    from storage_crawler_spark.session import build_session

    # 12g heap: the 10x replica of the pair plane holds ~19M candidate
    # pairs in flight; the default 1g driver OOMed mid-probe (r13)
    spark = build_session(app_name="scale-probe",
                          extra_conf={"spark.driver.memory": args.driver_mem})
    specs = {n: registry.get_query(n) for n in entries}

    rep_dir = tempfile.mkdtemp(prefix="scaleprobe_")
    try:
        build_replica(args.sf, rep_dir, args.factor)
        base, big, ratio, rows = {}, {}, {}, {}
        for n, spec in specs.items():
            # warm pass at base SF (JVM/footers), then measured passes
            time_entry(spark, spec, args.sf)
            base[n], _ = time_entry(spark, spec, args.sf)
            big[n], rows[n] = time_entry(spark, spec, rep_dir)
            ratio[n] = round(big[n] / base[n], 2) if base[n] else None
            print(f"{n}: base {base[n]}s -> {args.factor}x {big[n]}s "
                  f"(ratio {ratio[n]}, {rows[n]} rows)", file=sys.stderr)
        out = {
            "metric": args.metric,
            "unit": "sec",
            "factor": args.factor,
            "sf_dir": args.sf,
            "baseline_sf": base,
            f"wall_{args.factor}x": big,
            "ratio": ratio,
        }
        line = json.dumps(out)
        print(line)
        if args.out:
            with open(args.out, "w") as f:
                f.write(line + "\n")
    finally:
        shutil.rmtree(rep_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
