#!/usr/bin/env python
"""Capture .explain("formatted") output for registry entries into
plans/r14/<name>_<suffix>.txt — the optimization round's plan evidence
(the judge checks plan claims against these files).

Usage: python tools/capture_plans.py --suffix before name1 name2 ...
       python tools/capture_plans.py --suffix before --headline --tier2

Builders run their prep jobs (persists/checkpoints/fits) as a side effect;
the EXPLAIN itself executes nothing further.  One session for all captures.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--tier2", action="store_true")
    args = ap.parse_args()

    from bench import TIER2_QUERIES
    from storage_crawler_spark.plans.registry import QUERIES, headline_queries
    from storage_crawler_spark.session import build_session
    from tools.audit_plans import plan_string

    names = list(args.names)
    if args.headline:
        names += [n for n in headline_queries() if n not in names]
    if args.tier2:
        names += [n for n in TIER2_QUERIES if n in QUERIES and n not in names]

    os.makedirs(args.out, exist_ok=True)
    spark = build_session(app_name="capture-plans")
    for name in names:
        spark.catalog.clearCache()
        try:
            df = QUERIES[name].builder(spark, args.sf_dir)
            plan = plan_string(spark, df)
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted'), sf_dir={args.sf_dir}\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
