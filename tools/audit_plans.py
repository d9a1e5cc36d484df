#!/usr/bin/env python
"""Physical-plan audit: for every registry query, extract the properties
that matter at 100 TB — columns read per scan, filters pushed to parquet,
join strategies, exchange (shuffle) count, whole-stage-codegen coverage —
and write PLANS.md.  Also asserts a few invariants (scan pruning on wide
tables, broadcast joins on dimension tables) so regressions fail loudly.

Usage: python tools/audit_plans.py [--sf DIR] [--check-only]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_string(spark, df, mode: str = "formatted") -> str:
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def summarize(plan: str) -> dict:
    scans = []
    for m in re.finditer(r"\(\d+\) Scan parquet\s*\S*\n(?:.*\n)*?(?=\(\d+\)|\Z)", plan):
        block = m.group(0)
        loc = re.search(r"Location:.*?\[(.*?)\]", block)
        pushed = re.search(r"PushedFilters: \[(.*?)\]", block)
        schema = re.search(r"ReadSchema: struct<(.*?)>", block)
        ncols = len(schema.group(1).split(",")) if schema and schema.group(1) else 0
        table = ""
        if loc:
            table = os.path.basename(loc.group(1)).replace(".parquet", "")
        scans.append(
            {
                "table": table,
                "n_cols": ncols,
                "pushed": pushed.group(1) if pushed else "",
            }
        )
    return {
        "scans": scans,
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj_joins": len(re.findall(r"SortMergeJoin", plan)),
        "shuffles": len(re.findall(r"\+- Exchange|^Exchange", plan, re.M))
        + len(re.findall(r":- Exchange", plan)),
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "top_k_fused": "TakeOrderedAndProject" in plan,
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "nested_loop": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "windows": len(re.findall(r"\(\d+\) Window\b", plan)),
    }


# tables wide enough that an unpruned scan is a red flag: full column count
WIDE_TABLES = {"lineitem": 11, "orders": 6, "documents": 6, "customer": 5}

# Queries allowed a BroadcastNestedLoopJoin: each cross-joins a constant
# 1-3-row relation (VALUES bucket-offset expansion, the single query-vector
# row, q22's scalar avg) — the build side is ≤3 rows, so the "nested loop"
# is a per-row emit of a few copies, not a quadratic join.  Everything else
# must hash-join.
NLJ_ALLOWED = {
    "dedup_jaccard_pairs",
    # wraps the jaccard pair generator unchanged — same constant-VALUES
    # bucket-offset expansion as dedup_jaccard_pairs
    "dedup_threshold_histogram",
    "dedup_embedding_cosine",
    "tpch_q22_acctbal_prospects",
    "sim_cosine_topk",
    # accuracy probes: compose the two allowlisted shapes above (the 1-row
    # query-vector cross join; the VALUES offset expansion) plus 1-row
    # scalar-subquery aggregates — every BNLJ build side is <= 1 row
    "sim_ivf_recall",
    "dedup_lsh_quality",
    # multi-probe trained IVF: probe-cluster selection is a pushed-down IN
    # filter; the only join is the broadcast single query row (1-row build)
    "sim_ivf_trained_topk",
    # corpus-model scorers: CROSS JOIN of the 1-row total-count aggregate
    # (the scalar normalizer) — 1-row build side
    "text_unigram_surprisal",
    "text_tfidf_topterms",
    # bigram LM: CROSS JOIN of the 1-row vocabulary-size aggregate — same
    # scalar-normalizer shape as the unigram scorer
    "text_bigram_nll",
    # RP-LSH: CROSS JOINs of the 1-row planes relation (array-of-arrays
    # reassembled by a global agg) and the 1-row query-vector row
    "sim_rp_lsh_topk",
    "sim_rp_lsh_recall",
    # split-hygiene KL: CROSS JOINs of 1-row aggregates (totals; the final
    # pivot row) and the 2-row constant-VALUES eval-split relation
    "split_vocab_divergence",
    # robots.txt filtering: the 4-row constant-VALUES rule set is the
    # build side of the prefix-match join (disjunctive domain condition
    # -> BNLJ by construction; per-probe fan-out <= |rules|)
    "ingest_robots_filter",
    # funnel readout: CROSS JOIN of three 1-row count aggregates over the
    # staged stage relations — 1-row build sides
    "events_funnel_steps",
    # corpus card: 1-row corpus aggregate × 9-row constant-VALUES metric
    # relation — the pivot that keeps the card to ONE corpus scan
    "corpus_card",
    # funnel: CROSS JOIN of the 1-row step-1 user count (the conversion-rate
    # denominator) — same scalar-normalizer shape as q22
    "events_funnel_conversion",
    # BM25: CROSS JOIN of the 1-row avgdl/N scalar aggregate
    "text_bm25_topk",
    # vocab curve: CROSS JOINs of the constant 4-row VALUES size relation
    # and the 1-row totals aggregate
    "text_vocab_coverage_curve",
    # Neyman allocation: CROSS JOIN of the 1-row weight-total scalar
    "sample_neyman_allocation",
    # diurnal profile: CROSS JOIN of the 1-row day-span scalar
    "events_hourly_profile",
    # perplexity tertiles: CROSS JOIN of the 1-row percentile-threshold
    # relation — scalar-normalizer shape (plus the bigram scorer's own
    # allowlisted scalars upstream)
    "text_perplexity_tertiles",
    # nearest-centroid assignment: CROSS JOIN of the label-cardinality
    # centroid dimension (bounded by distinct labels, broadcast at any
    # scale; the dim-keyed equi-join alternative is the WORSE shape)
    "embedding_centroid_confusion",
    # type affinity: CROSS JOIN of the 1-row distinct-user total (the lift
    # normalizer) — scalar shape; the pair join itself is an equi-join
    "events_type_affinity",
    # k-core: CROSS JOIN of the 1-row convergence flag (two scalar-subquery
    # edge counts compared) — scalar shape; peel rounds are windows, the
    # edge build is a bucket equi-join
    "sim_knn_kcore",
    # value trend: CROSS JOIN of the 1-row min-day scalar (the OLS x-offset)
    "events_value_trend",
    # shard balance: CROSS JOIN of the 1-row corpus-total scalar (the load
    # denominator)
    "pipeline_shard_balance",
    # hybrid RRF: the BM25 chain's 1-row avgdl scalar + the 1-row query
    # vector — both allowlisted shapes composed
    "sim_hybrid_rrf",
    # DD-sketch readout: the rank-containment join probes the constant
    # 3-row quantile-target VALUES relation (non-equi by construction —
    # cum-bound containment); build side is 3 rows, scan side is the
    # sketch-sized register table, never events
    "sketch_dd_quantiles",
    "streaming_dd_quantiles",
    # zone-map skipping audit: CROSS JOINs of the constant 4-row predicate
    # VALUES relation and the 1-row corpus-span scalar — both allowlisted
    # shapes; the stats side is n_files rows
    "lake_file_skipping",
    # Hamming ANN probe: CROSS JOIN of the 1-row packed-code query row —
    # the sim_cosine_topk shape; the exact_rank join is a k-row equi join
    "sim_hamming_topk",
    # Matryoshka audit: CROSS JOINs of the 1-row query-vector relation
    # (dim alignment + the per-prefix distance folds) — the sim_cosine_topk
    # shape; the overlap joins themselves are k-row equi hash joins
    "sim_matryoshka_audit",
    # graph-ANN two-hop probe: CROSS JOINs of the 1-row query-vector
    # relation (candidate rerank + audit-side exact top-k) — same shape;
    # hop expansion and exact_rank joins are equi hash joins
    "sim_graph_2hop_topk",
    # basket affinity: CROSS JOIN of the 1-row distinct-order total
    "tpch_basket_brands",
    # budget curve: CROSS JOIN of the 1-row decile-threshold relation
    "pipeline_quality_budget_curve",
    # bootstrap CI: CROSS JOIN of the 1-row point-estimate aggregate with
    # the 1-row folded-replica relation — both build sides exactly 1 row
    "sample_bootstrap_ci",
    # recall curve: the constant k-grid VALUES relation joins the ranked
    # lists on rnk <= k (non-equi by construction) — build side <= |ks|
    # rows, scan side <= kmax rows; plus the 1-row query-vector cross join
    "sim_ivf_recall_curve",
    # KMV overlap: the type-pair grid is a non-equi (a.type < b.type) join
    # of the <=|types|-row DISTINCT type relations, and the union-merge
    # threshold join is a range predicate (h <= tau) over k-row synopses —
    # every BNLJ side is bounded by types x k (~640 rows), never events
    "sketch_kmv_overlap",
    # priority sampling: CROSS JOINs of the 1-row threshold (tau), 1-row
    # estimate fold, and 1-row exact-total scalar against the (k+1)-row
    # ranked sample — every build side <= 1 row
    "sample_priority",
    # epoch plan: CROSS JOINs of the 1-row totals/lambda scalars against
    # the per-source and <=5-row cap-prefix relations — 1-row build sides
    "pipeline_epoch_plan",
    # sketch-swapped epoch plan (r12): same scalar cross joins as the
    # exact form; the HLL estimate side is one row per source (equi-join)
    "pipeline_epoch_plan_hll",
    # sketch-swapped column stats (r12): per-column branch = the 1-row
    # exact-count aggregate CROSS JOIN the 1-row HLL-estimate aggregate —
    # both build sides exactly 1 row, 11 branches
    "lake_column_stats_hll",
    # BPE encode/compression: CROSS JOINs of the 1-row merge-array
    # relations (epoch-1 and epoch-2 merge tables folded per word)
    "text_bpe_encode",
    "text_bpe_compression",
    # Kneser-Ney: CROSS JOIN of the 1-row bigram-type total (the
    # continuation-distribution normalizer) — same scalar shape as the
    # add-one bigram scorer
    "text_kn_bigram_nll",
    # BPE apply over the doc stream: same 1-row merge-array CROSS JOIN as
    # text_bpe_encode (the r9 ordered-agg merge tables fold to ONE row)
    "text_bpe_doc_tokens",
    # two-pass partitioned prefix sum (r9): the carry-in and next-bucket
    # theta joins run over the ≤33-row bucket-totals relation — bounded by
    # the BUCKET COUNT, not the data; the per-row windows stay partitioned
    "events_session_concurrency",
    # PMI: CROSS JOIN of the 1-row bigram-total scalar (the ln normalizer)
    "text_pmi_pairs",
    # Benford: CROSS JOIN of the 1-row positive-value total (the share
    # denominator) — scalar-normalizer shape
    "events_benford_audit",
    # Bloom semi-join: CROSS JOIN of the ONE-row filter array (this IS the
    # runtime-filter broadcast) plus 1-row scalar count subqueries
    "sketch_bloom_semijoin",
    # two-pass ntile (r9): the cross-bucket offset theta joins run over the
    # ≤65-row bucket-totals relations — bounded by the BUCKET COUNT; the
    # per-row windows are partitioned (same contract as session_concurrency)
    "lake_zorder_layout",
    # two-pass packing prefix sum (r9): same ≤33-row carry theta join
    "text_pack_bins",
    "text_pack_render",
    # DSIR: CROSS JOIN of the 1-row target/raw token-total aggregate (the
    # smoothing denominators) — same scalar-normalizer shape as the
    # unigram surprisal scorer
    "pipeline_dsir_weights",
}

# Queries that must not plan a Window operator (their aggregates are
# required to partial-combine map-side instead of shuffle+sort).
NO_WINDOW = {"owner_prefix_join"}


def audit(spark, name, spec, sf_dir) -> tuple[dict, list[str]]:
    df = spec.builder(spark, sf_dir)
    info = summarize(plan_string(spark, df))
    # AQE pre-execution plans omit codegen ids; the codegen mode reports
    # "Found N WholeStageCodegen subtrees" directly.
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan_string(spark, df, "codegen"))
    info["codegen_spans"] = int(m.group(1)) if m else 0
    problems = []
    for scan in info["scans"]:
        full = WIDE_TABLES.get(scan["table"])
        if full and scan["n_cols"] >= full:
            problems.append(
                f"{name}: scan of {scan['table']} reads all {scan['n_cols']} columns (no pruning)"
            )
    if info["cartesian"]:
        problems.append(f"{name}: CartesianProduct in plan (unbounded cross join)")
    if info["nested_loop"] and name not in NLJ_ALLOWED:
        problems.append(
            f"{name}: BroadcastNestedLoopJoin in plan (non-equi join outside the "
            "constant-VALUES allowlist)"
        )
    if name in NO_WINDOW and info["windows"]:
        problems.append(
            f"{name}: Window operator in plan (must use a map-side partial aggregate, "
            "not a shuffle+sort window)"
        )
    return info, problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()

    from storage_crawler_spark.plans.registry import QUERIES
    from storage_crawler_spark.session import build_session

    spark = build_session(app_name="audit_plans")
    # AQE re-plans at run time and hides codegen subtrees in pre-execution
    # explain output; audit the static plan (representative for invariants).
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    lines = [
        "# PLANS — physical-plan audit (auto-generated by tools/audit_plans.py)",
        "",
        f"Scale-factor dir: `{args.sf}`.  Per query: parquet scans (columns",
        "read + filters pushed to the scan), join strategies, shuffle count,",
        "whole-stage-codegen span count.  Invariant checked: scans of wide",
        "tables must be column-pruned.  Streaming/mapInPandas queries execute",
        "their plan at run time and are listed without static scan rows.",
        "",
        "| query | scans (table:cols, pushed) | bcast/smj joins | shuffles | codegen | top-k fused |",
        "|---|---|---|---|---|---|",
    ]
    all_problems: list[str] = []
    for name, spec in QUERIES.items():
        if name.startswith("streaming_"):
            continue  # streaming plans materialize at run, not via explain
        try:
            info, problems = audit(spark, name, spec, args.sf)
        except Exception as exc:  # pragma: no cover
            all_problems.append(f"{name}: audit failed: {exc}")
            continue
        all_problems.extend(problems)
        scans = "; ".join(
            f"{s['table']}:{s['n_cols']}" + (f" [{s['pushed'][:40]}…]" if len(s["pushed"]) > 40 else (f" [{s['pushed']}]" if s["pushed"] else ""))
            for s in info["scans"]
        ) or "—"
        lines.append(
            f"| {name} | {scans} | {info['broadcast_joins']}/{info['smj_joins']} | "
            f"{info['shuffles']} | {info['codegen_spans']} | {'✓' if info['top_k_fused'] else ''} |"
        )

    spark.stop()

    if all_problems:
        print("PLAN PROBLEMS:", file=sys.stderr)
        for p in all_problems:
            print(" -", p, file=sys.stderr)

    if not args.check_only:
        out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
        with open(out, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        print(f"wrote {out}")

    return 1 if all_problems else 0


if __name__ == "__main__":
    sys.exit(main())
