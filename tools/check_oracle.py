#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every registry query
on Spark AND its DuckDB oracle, compare row count, column names, and an
order-insensitive value hash.  Run before any commit that touches queries.

Usage: python tools/check_oracle.py [--sf DIR] [--only name1,name2] [-v]
"""

from __future__ import annotations

import argparse
import decimal
import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize(rows: list[tuple], cols: list[str]) -> list[str]:
    """Sort columns by name, render cells canonically, sort rows.

    Type-faithful on purpose (stricter than round 1's ``%.9g``): floats render
    at full precision via ``repr`` so ULP-level cross-engine drift fails HERE
    rather than only at the driver, and int-vs-float distinctions survive
    (DuckDB HUGEINT/DECIMAL aggregates must be CAST to BIGINT/DOUBLE in the
    oracle SQL or they will not match Spark's LONG/DOUBLE).

    ``decimal.Decimal`` cells are tagged ``Decimal:<value>`` so a DuckDB
    HUGEINT/DECIMAL leaking out of a subquery (e.g. a window ``sum`` fed
    into ``//``) fails here instead of only at the driver's type-faithful
    hash — round 4's text_pack_bins red row passed locally exactly because
    ``str(Decimal('3'))`` collides with ``str(3)``.
    """
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        cells = []
        for i in order:
            v = row[i]
            if isinstance(v, bool):
                cells.append(str(v))
            elif isinstance(v, float):
                cells.append(repr(v))  # full precision; 1.0 stays "1.0"
            elif isinstance(v, decimal.Decimal):
                cells.append(f"Decimal:{v}")  # never collides with int/float
            elif isinstance(v, (bytes, bytearray)):
                # Spark collect() hands BinaryType back as bytearray,
                # DuckDB/Arrow as bytes — same cell either way
                cells.append(bytes(v).hex())
            else:
                cells.append(str(v))  # int has no ".0"; Decimal keeps scale
        out.append("\x1f".join(cells))
    out.sort()
    return out


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    h = hashlib.sha256()
    for line in normalize(rows, cols):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


# --changed-since module → registry-tag map (r12, verdict item 8): an
# engine-path edit in a module can change entry BEHAVIOR without changing
# its oracle text, so tag-mapping complements the oracle fingerprint diff.
# Conservative by construction: shared infrastructure (dialect, registry,
# views, session, the crawl core) maps to "*" = full sweep, and any
# changed module NOT listed here also forces "*" rather than guessing.
_MODULE_TAGS: dict[str, set[str] | str] = {
    "operators/dedup.py": {"dedup"},
    "operators/simhash.py": {"dedup"},
    "operators/text.py": {"text", "tokenizer", "quality", "search",
                          "retrieval", "layout"},
    "operators/packing.py": {"layout", "text"},
    "operators/similarity.py": {"similarity", "embedding"},
    "operators/cluster.py": {"graph", "dedup", "similarity"},
    "operators/kmeans.py": {"similarity", "embedding", "graph", "dedup"},
    "operators/pq.py": {"similarity"},
    "operators/logreg.py": {"quality", "ml"},
    "operators/analytics.py": {"events", "analytics", "session", "forecast",
                               "stats"},
    "operators/sketches.py": {"sketch"},
    "operators/urls.py": {"ingest", "url"},
    "operators/pipeline.py": {"pipeline", "compliance", "privacy"},
    "operators/sampling.py": {"sampling"},
    "operators/multimodal.py": {"multimodal"},
    "operators/temporal.py": {"temporal", "join"},
    "operators/skew.py": {"skew"},
    "sources/lake.py": {"lake"},
    "sources/fsmeta.py": {"source", "crawl"},
    "sources/ingest.py": {"ingest", "source"},
    "sources/jdbc.py": {"source"},
    "reports/queries.py": {"report"},
    "reports/usage.py": {"usage", "report"},
    "reports/render.py": {"report"},
    "plans/tpch.py": {"tpch"},
}
_PREFIX_TAGS = {"streaming/": {"streaming"}, "crawl/": {"crawl", "source"}}


def changed_entries(ref: str, queries) -> list[str] | None:
    """Entries to re-sweep for the diff since ``ref``: tag matches of the
    changed modules ∪ entries whose ORACLE TEXT differs from the
    fingerprint file committed at ref.  Returns None for 'full sweep'
    (shared infrastructure changed, an unmapped module changed, or no
    fingerprint baseline exists at ref)."""
    import json
    import subprocess

    diff = subprocess.run(
        ["git", "diff", "--name-only", ref, "--", "storage_crawler_spark/"],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    tags: set[str] = set()
    for f in diff:
        rel = f.removeprefix("storage_crawler_spark/")
        if rel.endswith("__init__.py"):
            continue
        hit = _MODULE_TAGS.get(rel)
        if hit is None:
            hit = next(
                (t for p, t in _PREFIX_TAGS.items() if rel.startswith(p)), None
            )
        if hit is None:
            print(f"# changed-since: {f} is unmapped shared code -> full sweep")
            return None
        tags |= hit
    selected = {n for n, s in queries.items() if tags & set(s.tags)}
    # oracle-text fingerprints at ref (written by --write-fingerprints)
    fp = subprocess.run(
        ["git", "show", f"{ref}:tools/oracle_fingerprints.json"],
        capture_output=True, text=True,
    )
    if fp.returncode != 0:
        print("# changed-since: no fingerprint baseline at ref -> full sweep")
        return None
    old = json.loads(fp.stdout)
    for n, s in queries.items():
        cur = hashlib.sha256((s.oracle or "").encode()).hexdigest()[:16]
        if old.get(n) != cur:
            selected.add(n)
    print(f"# changed-since {ref}: {len(diff)} files -> {len(selected)} entries")
    return sorted(selected)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--changed-since", default=None, metavar="GITREF",
                    help="sweep only entries affected by the diff since "
                         "GITREF (module-tag map + oracle fingerprint diff; "
                         "falls back to a full sweep when shared code moved)")
    ap.add_argument("--write-fingerprints", action="store_true",
                    help="after a green sweep, save per-entry oracle-text "
                         "fingerprints to tools/oracle_fingerprints.json "
                         "(the --changed-since baseline)")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    from storage_crawler_spark.plans.registry import QUERIES
    from storage_crawler_spark.plans.views import BASE_TABLES
    from storage_crawler_spark.session import build_session

    # 8g driver heap (local-mode default is 1g: a 116-entry sweep at
    # sf0.1 OOMs on accumulated state long before any single plan does)
    spark = build_session(
        app_name="check-oracle", extra_conf={"spark.driver.memory": "8g"}
    )

    con = duckdb.connect()
    for t in BASE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    if args.only:
        names = args.only.split(",")
    elif args.changed_since:
        sel = changed_entries(args.changed_since, QUERIES)
        names = sel if sel is not None else list(QUERIES)
        if not names:
            print("0/0 queries match (no affected entries)")
            return 0
    else:
        names = list(QUERIES)
    failures = 0
    for name in names:
        spec = QUERIES[name]
        t0 = time.time()
        try:
            df = spec.builder(spark, args.sf)
            sp_cols = df.columns
            sp_rows = [tuple(r) for r in df.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        finally:
            # each entry pays its own persists (same hygiene as bench.py);
            # without this, ~100 entries of persisted relations accumulate
            # and the sf0.1 sweep OOMs the driver heap
            spark.catalog.clearCache()
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(sp_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            # Fetch via Arrow, not fetchall(): DuckDB's fetchall() flattens
            # HUGEINT to Python int (arbitrary precision), hiding the exact
            # type leak the driver's Arrow-based hash catches — r4's
            # text_pack_bins red row was invisible to fetchall().  Through
            # Arrow, HUGEINT arrives as decimal128(38,0) → decimal.Decimal.
            tbl = con.execute(spec.oracle).fetch_arrow_table()
            du_cols = tbl.column_names
            du_rows = [
                tuple(tbl.column(i)[r].as_py() for i in range(tbl.num_columns))
                for r in range(tbl.num_rows)
            ]
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = []
        if len(sp_rows) != len(du_rows):
            problems.append(f"rows {len(sp_rows)} vs {len(du_rows)}")
        if sorted(sp_cols) != sorted(du_cols):
            problems.append(f"cols {sorted(sp_cols)} vs {sorted(du_cols)}")
        if not problems:
            hs, hd = value_hash(sp_rows, sp_cols), value_hash(du_rows, du_cols)
            if hs != hd:
                problems.append(f"hash {hs} vs {hd}")
                if args.verbose:
                    ns, nd = normalize(sp_rows, sp_cols), normalize(du_rows, du_cols)
                    diff = [(a, b) for a, b in zip(ns, nd) if a != b][:5]
                    for a, b in diff:
                        print(f"    spark: {a}\n    duck : {b}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"ok   {name}: {len(sp_rows)} rows match ({time.time()-t0:.1f}s)")
    spark.stop()
    print(f"{len(names) - failures}/{len(names)} queries match")
    if args.write_fingerprints and not failures:
        import json

        out = {
            n: hashlib.sha256((s.oracle or "").encode()).hexdigest()[:16]
            for n, s in QUERIES.items()
        }
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "oracle_fingerprints.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=0, sort_keys=True)
        print(f"# wrote {len(out)} fingerprints to {path}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
