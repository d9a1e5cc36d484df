#!/usr/bin/env python
"""Deterministic sf1.0-scale fixture generator (r11 verdict item 2).

Synthesizes a `factor`-times-larger dataset from the sf0.1 tables with
FRESH sequential keys (0-based, matching the driver's conventions) and
attribute tuples SAMPLED from the base tables' empirical distributions —
not offset-key replicas, so key cardinality, FK fan-out, and group sizes
all scale like real data.  Every random choice is a MINSTD LCG of the row
index (exact integer arithmetic, no RNG state), so the output is
bit-reproducible and engine-independent.

Documents get a deterministic mutation on odd rows (a replica-tag suffix)
so the corpus carries BOTH exact duplicates and near-duplicates at scale
— the structure the dedup planes need to exercise.  Embedding vectors
repeat base vectors under fresh vec_ids (exact ANN ties are realistic
duplicates; all ANN rankings tie-break on vec_id).

Usage: python tools/gen_sf.py --out /root/sf1.0 [--base /root/testdata/sf0.1]
                              [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb

# MINSTD streams: lcg(i, c) = (48271 * i + c) % 2147483647 — small enough
# that 48271 * i never overflows BIGINT for any realistic row count
def _lcg(i: str, c: int) -> str:
    return f"((48271 * {i} + {c}) % 2147483647)"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    f = args.factor
    con = duckdb.connect()

    def base(t: str) -> str:
        return f"read_parquet('{args.base}/{t}.parquet')"

    def copy(t: str, sql: str) -> None:
        con.execute(f"COPY ({sql}) TO '{args.out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{args.out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows", file=sys.stderr)

    counts = {
        t: con.execute(f"SELECT count(*) FROM {base(t)}").fetchone()[0]
        for t in ("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings")
    }
    n_users = con.execute(
        f"SELECT count(DISTINCT user_id) FROM {base('events')}"
    ).fetchone()[0]

    # dimensions stay as-is (replicating them would break FK semantics)
    for t in ("region", "nation"):
        copy(t, f"SELECT * FROM {base(t)}")

    def sampled(t: str, key: str, n_new: int, select: str, extra_ctes: str = "") -> str:
        """idx 0..n_new-1 joined to a base row chosen by i % n_base; the
        SELECT list builds fresh keys + sampled/derived attributes."""
        n_base = counts[t]
        return f"""
WITH idx AS (SELECT unnest(generate_series(0, {n_new - 1})) AS i),
b0 AS (SELECT row_number() OVER (ORDER BY {key}) - 1 AS rn, * FROM {base(t)}){extra_ctes}
SELECT {select}
FROM idx JOIN b0 b ON b.rn = idx.i % {n_base}
ORDER BY idx.i
""".strip()

    nc = counts["customer"] * f
    copy("customer", sampled("customer", "c_custkey", nc, f"""
  CAST(idx.i AS BIGINT) AS c_custkey,
  'Customer#' || lpad(CAST(idx.i AS VARCHAR), 9, '0') AS c_name,
  CAST({_lcg('idx.i', 17)} % 25 AS INTEGER) AS c_nationkey,
  b.c_acctbal AS c_acctbal,
  b.c_mktsegment AS c_mktsegment"""))

    ns = counts["supplier"] * f
    copy("supplier", sampled("supplier", "s_suppkey", ns, f"""
  CAST(idx.i AS BIGINT) AS s_suppkey,
  'Supplier#' || lpad(CAST(idx.i AS VARCHAR), 9, '0') AS s_name,
  CAST({_lcg('idx.i', 29)} % 25 AS INTEGER) AS s_nationkey,
  b.s_acctbal AS s_acctbal"""))

    np_ = counts["part"] * f
    copy("part", sampled("part", "p_partkey", np_, f"""
  CAST(idx.i AS BIGINT) AS p_partkey,
  b.p_name AS p_name, b.p_brand AS p_brand, b.p_type AS p_type,
  b.p_size AS p_size, b.p_retailprice AS p_retailprice"""))

    no = counts["orders"] * f
    copy("orders", sampled("orders", "o_orderkey", no, f"""
  CAST(idx.i AS BIGINT) AS o_orderkey,
  CAST({_lcg('idx.i', 41)} % {nc} AS BIGINT) AS o_custkey,
  b.o_orderstatus AS o_orderstatus, b.o_totalprice AS o_totalprice,
  b.o_orderdate AS o_orderdate, b.o_orderpriority AS o_orderpriority"""))

    nl = counts["lineitem"] * f
    copy("lineitem", sampled("lineitem", "l_orderkey, l_linenumber", nl, f"""
  CAST({_lcg('idx.i', 53)} % {no} AS BIGINT) AS l_orderkey,
  CAST({_lcg('idx.i', 59)} % {np_} AS BIGINT) AS l_partkey,
  CAST({_lcg('idx.i', 67)} % {ns} AS BIGINT) AS l_suppkey,
  CAST(1 + idx.i % 7 AS INTEGER) AS l_linenumber,
  b.l_quantity AS l_quantity, b.l_extendedprice AS l_extendedprice,
  b.l_discount AS l_discount, b.l_tax AS l_tax,
  b.l_returnflag AS l_returnflag, b.l_linestatus AS l_linestatus,
  b.l_shipdate AS l_shipdate"""))

    # events: replicate with the per-user TEMPORAL structure preserved —
    # copy c offsets every user id by c·(max_user+1), so each replica
    # carries the base users' exact event sequences (funnels, sessions,
    # attribution windows stay realistic) while user cardinality scales
    # with the data.  Rows are emitted in ts order with event_id = row
    # number: the streaming twins read this table as a stream, and a
    # ts-scrambled file order would make their watermarks drop rows the
    # batch oracle keeps (measured: streaming_rate_anomaly diverged on a
    # ts-shuffled draft of this generator — a fixture artifact, not an
    # engine bug).
    n_base_ev = counts["events"]
    max_user = con.execute(
        f"SELECT max(user_id) + 1 FROM {base('events')}"
    ).fetchone()[0]
    copy("events", f"""
WITH idx AS (SELECT unnest(generate_series(0, {n_base_ev * f - 1})) AS i),
b0 AS (SELECT row_number() OVER (ORDER BY event_id) - 1 AS rn, * FROM {base('events')})
SELECT CAST(row_number() OVER (ORDER BY b.ts, idx.i) - 1 AS BIGINT) AS event_id,
       b.ts AS ts,
       CAST(b.user_id + (idx.i // {n_base_ev}) * {max_user} AS BIGINT) AS user_id,
       b.event_type AS event_type, b.value AS value, b.props AS props
FROM idx JOIN b0 b ON b.rn = idx.i % {n_base_ev}
ORDER BY b.ts, idx.i
""".strip())

    # documents: CORPUS-SHAPED scaling (r13, r12 verdict item 4).  The
    # old offset-replica form multiplied every base fingerprint's document
    # frequency by `factor`, pushing ALL shared winnow fingerprints past
    # the df_cap=50 boilerplate filter (dedup_winnow_pairs degenerated to
    # 0 pairs at sf1.0).  Instead, each replica GROUP g > 0 renames every
    # token with a group tag ('g<g>w' prefix) — a BIJECTIVE per-group
    # token renaming, so within-group duplicate/near-duplicate relations
    # (exact fingerprints, token-set jaccard, k-gram winnow sharing) are
    # EXACTLY the base corpus's, while cross-group docs share no tokens
    # and hence no fingerprints.  Result: f x the base's duplicate
    # clusters at the base's cluster-size distribution — duplicate RATIO
    # and per-fingerprint doc frequency held constant as N grows, which
    # is how real scraped corpora scale.  No extra mutation: the base
    # corpus already carries its own exact- AND near-duplicate structure,
    # and a row-index-keyed suffix (the old odd-row tag) would BREAK
    # within-group exact pairs (two copies of the same text got different
    # suffixes); the renaming is equality-preserving, so the base
    # structure replicates as-is, once per group.
    nd = counts["documents"] * f
    n_base_doc = counts["documents"]
    gtag = f"'g' || CAST(idx.i // {n_base_doc} AS VARCHAR) || 'w'"
    gtext = (
        f"CASE WHEN idx.i // {n_base_doc} = 0 THEN b.text "
        f"ELSE {gtag} || replace(b.text, ' ', ' ' || {gtag}) END"
    )
    copy("documents", sampled("documents", "doc_id", nd, f"""
  CAST(idx.i AS BIGINT) AS doc_id,
  {gtext} AS text,
  b.lang AS lang, b.source AS source,
  CAST(length({gtext}) AS BIGINT) AS n_chars"""))

    # embeddings: perturb ONE deterministic coordinate per replica row
    # (g * 3e-4, ~20 lattice quanta at KM_Q = 65536, 0.3% of coordinate
    # scale) so replica groups are near- but not exact-duplicates of the
    # base vectors.  The old exact repeats made the mutual-kNN graph
    # degenerate at sf1.0 (10 identical copies per vector form
    # near-cliques; sim_knn_link_predict had no non-adjacent pair with a
    # common neighbour left — 0 rows).  Group 0 keeps base vectors
    # bit-identical.
    nv = counts["embeddings"] * f
    n_base_v = counts["embeddings"]
    dim = con.execute(
        f"SELECT len(embedding) FROM {base('embeddings')} LIMIT 1"
    ).fetchone()[0]
    jcoord = f"(1 + {_lcg('idx.i', 97)} % {dim})"
    delta = f"(CAST(idx.i // {n_base_v} AS DOUBLE) * 0.0003)"
    copy("embeddings", sampled("embeddings", "vec_id", nv, f"""
  CAST(idx.i AS BIGINT) AS vec_id,
  CAST(list_transform(CAST(b.embedding AS DOUBLE[]),
       (x, j) -> CASE WHEN j = {jcoord} THEN x + {delta} ELSE x END)
       AS FLOAT[]) AS embedding,
  b.label AS label"""))

    print(f"wrote factor-{f} fixture set to {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
