#!/usr/bin/env python
"""Extended-seed parity fuzz wave (the r11c close-out discipline, now a
reusable tool): re-run the committed randomized batteries over FRESH
seeds — same fixture generators, same driver-faithful assert
(tests/parity_util.assert_parity: column names, row count, value hash) —
so seed-specific luck in the committed parametrizations cannot hide a
parity break.

Batteries driven (imported from the test modules — ONE source of truth):
  corpus        test_random_parity.QUERIES       over _random_corpus
  embeddings    test_random_parity.EMB_QUERIES   over _random_embeddings
  docs-registry test_random_parity.DOC_ENTRIES   over _random_corpus(80)
  events        test_random_events_parity.EVENT_ENTRIES over _random_events
  tpch          test_random_tpch_parity.RELATIONAL_ENTRIES over _random_tpch

Usage: python tools/fuzz_wave.py --seeds 113,229,331 [--out FUZZ_rN.txt]
Prints one line per (battery, seed) with check counts; exits non-zero on
any failure (failures print the entry name + seed for replay).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import traceback

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="113,229,331")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parity_util import assert_parity
    import test_random_parity as RP
    import test_random_events_parity as RE
    import test_random_tpch_parity as RT
    from storage_crawler_spark.plans import registry
    from storage_crawler_spark.plans.dialect import DUCK, SPARK
    from storage_crawler_spark.session import build_session

    # 8g driver heap: a multi-hundred-query wave accumulates UI/listener
    # state that OOMs the 1g local-mode default long before any single
    # plan does (the check_oracle lesson; an OOM in the appStatus listener
    # STOPS the SparkContext and cascades every later check to failure)
    spark = build_session(
        app_name="fuzz-wave", extra_conf={"spark.driver.memory": "8g"}
    )
    tmp = tempfile.mkdtemp(prefix="fuzzwave_")
    checks = failures = 0
    lines: list[str] = []

    def run(label, fn):
        nonlocal checks, failures
        try:
            fn()
            checks += 1
        except Exception:
            failures += 1
            print(f"FAIL {label}")
            traceback.print_exc(limit=4)

    for seed in seeds:
        # corpus battery
        pdf = pd.DataFrame(
            RP._random_corpus(seed),
            columns=["doc_id", "text", "lang", "source", "n_chars"],
        )
        cpath = f"{tmp}/documents_{seed}.parquet"
        pdf.to_parquet(cpath, index=False)
        spark.read.parquet(cpath).createOrReplaceTempView("documents")
        c0 = checks
        for name, gen in RP.QUERIES:
            run(f"corpus/{name}[seed={seed}]", lambda g=gen, n=name: assert_parity(
                spark.sql(g(SPARK)), g(DUCK), {"documents": cpath}, n))
        lines.append(f"corpus seed {seed}: {checks - c0} checks")

        # embeddings battery
        rows = RP._random_embeddings(seed)
        table = pa.table({
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [np.array(r[1], dtype=np.float32) if r[1] is not None else None
                 for r in rows], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        })
        epath = f"{tmp}/embeddings_{seed}.parquet"
        pq.write_table(table, epath)
        spark.read.parquet(epath).createOrReplaceTempView("embeddings")
        c0 = checks
        for name, gen in RP.EMB_QUERIES:
            run(f"emb/{name}[seed={seed}]", lambda g=gen, n=name: assert_parity(
                spark.sql(g(SPARK)), g(DUCK), {"embeddings": epath}, n))
        lines.append(f"embeddings seed {seed}: {checks - c0} checks")

        # docs-registry battery
        ddir = f"{tmp}/rdocs_{seed}"
        os.makedirs(ddir, exist_ok=True)
        pd.DataFrame(
            RP._random_corpus(seed, n_docs=80),
            columns=["doc_id", "text", "lang", "source", "n_chars"],
        ).to_parquet(f"{ddir}/documents.parquet", index=False)
        c0 = checks
        for entry in RP.DOC_ENTRIES:
            spec = registry.get_query(entry)
            run(f"docs/{entry}[seed={seed}]", lambda s=spec: assert_parity(
                s.builder(spark, ddir), s.oracle,
                {"documents": f"{ddir}/documents.parquet"}, s.name))
        lines.append(f"docs-registry seed {seed}: {checks - c0} checks")

        # events battery
        edir = f"{tmp}/revents_{seed}"
        os.makedirs(edir, exist_ok=True)
        RE._random_events(seed).to_parquet(f"{edir}/events.parquet", index=False)
        c0 = checks
        for entry in RE.EVENT_ENTRIES:
            spec = registry.get_query(entry)
            run(f"events/{entry}[seed={seed}]", lambda s=spec: assert_parity(
                s.builder(spark, edir), s.oracle,
                {"events": f"{edir}/events.parquet"}, s.name))
        lines.append(f"events seed {seed}: {checks - c0} checks")

        # tpch bootstrap battery
        tdir = f"{tmp}/rtpch_{seed}"
        os.makedirs(tdir, exist_ok=True)
        for name, tp in RT._random_tpch(seed).items():
            tp.to_parquet(f"{tdir}/{name}.parquet", index=False)
        c0 = checks
        for entry in RT.RELATIONAL_ENTRIES:
            spec = registry.get_query(entry)
            run(f"tpch/{entry}[seed={seed}]", lambda s=spec: assert_parity(
                s.builder(spark, tdir), s.oracle,
                {t: f"{tdir}/{t}.parquet" for t in RT.TABLES}, s.name))
        lines.append(f"tpch seed {seed}: {checks - c0} checks")
        spark.catalog.clearCache()

    summary = f"TOTAL: {checks} checks, {failures} failures over seeds {seeds}"
    print("\n".join(lines))
    print(summary)
    if args.out:
        with open(args.out, "a") as f:
            f.write("\n".join(lines) + "\n" + summary + "\n")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
