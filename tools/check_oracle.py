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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
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

    names = list(QUERIES) if not args.only else args.only.split(",")
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
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
