"""End-to-end training-corpus pipeline as ONE declarative plan.

The individual operators (quality filter, exact dedup, deterministic
split) are each oracle-gated; this module composes them the way a corpus
owner actually runs them —

    quality filter → exact-dedup keepers → train/val/test split → audit agg

— as a single dialect-generated query, so the whole pipeline is ONE
Catalyst plan (and ONE DuckDB oracle).  That is the point of a declarative
engine: no intermediate materialization, no orchestration glue; Catalyst
sees the full dataflow and can pushdown/prune/CSE across stage boundaries
that an imperative pipeline would freeze into files.

100 TB shape: the filter is a pure scan+project (column-pruned, no
shuffle); the dedup keeper selection is a min-over-fingerprint window (one
shuffle on the 16-byte md5 key, no join-back); the split is an inlined
map expression; the final audit aggregate partial-combines.  Total: two
shuffles end-to-end, both on keys with no skew by construction (md5
outputs), and zero joins.
"""

from __future__ import annotations

from storage_crawler_spark.operators.dedup import gen_span_windows
from storage_crawler_spark.operators.sampling import split_bucket_expr, split_case_expr
from storage_crawler_spark.operators.text import gen_quality_filter
from storage_crawler_spark.plans.dialect import Dialect


def gen_training_pipeline(
    d: Dialect,
    train_pct: int = 80,
    val_pct: int = 10,
) -> str:
    """Per-(split, lang) corpus audit after filter → dedup → split.

    Output: split, lang, n_docs, sum_tokens — the sanity table a pipeline
    owner checks before training (split proportions and language balance
    AFTER cleaning, which filtering and dedup both distort).

    Composition avoids every self-join: the quality filter carries
    text/lang through as passthrough columns (single scan), the exact-dedup
    keeper is a min-over-fingerprint window (one shuffle, no join-back),
    and the split is an inlined expression (map) — so the whole pipeline
    is scan → project/filter → window(fp) → project → agg: exactly two
    shuffles, both on md5-derived keys with no skew by construction.
    """
    fp = d.md5_utf8("text")
    split = split_case_expr(split_bucket_expr(d), train_pct, val_pct)
    return f"""
WITH qf AS (
{gen_quality_filter(d, passthrough=("text", "lang"))}
),
kept AS (
  SELECT doc_id, text, lang, n_tokens FROM qf WHERE keep = 1
),
surv AS (
  SELECT doc_id, lang, n_tokens
  FROM (
    SELECT doc_id, lang, n_tokens,
           min(doc_id) OVER (PARTITION BY {fp}) AS keeper_id
    FROM kept
  ) w
  WHERE doc_id = keeper_id
)
SELECT {split} AS split, lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM surv
GROUP BY {split}, lang
""".strip()


def gen_split_contamination(
    d: Dialect,
    width: int = 32,
    stride: int = 8,
    train_pct: int = 80,
    val_pct: int = 10,
) -> str:
    """Train→eval contamination report: exact token spans that occur in
    BOTH the train split and an eval split (val/test) — the benchmark-
    decontamination check every serious pipeline runs before training
    (an eval answer string sitting verbatim in train invalidates the
    eval).  Composes the sampled-window relation (substring-dedup tier)
    with the deterministic split expression.

    Output per contaminated span: occurrence counts in each split and the
    lowest eval doc id as the audit example.

    Shape: windows explode (map) joined to nothing — the split is an
    inlined expression on doc_id — then ONE aggregation to per-(span,
    split) counts and ONE conditional-aggregation pass to the cross-split
    verdict (deliberately not a per-split self-join: Spark inlines CTEs,
    and the single-pass pivot avoids recomputing the window relation).
    Two shuffles, both on span_key.
    """
    split = split_case_expr(split_bucket_expr(d), train_pct, val_pct)
    return f"""
WITH w AS (
{gen_span_windows(d, width, stride)}
),
per AS (
  SELECT span_key, {split} AS split, count(*) AS n, min(doc_id) AS example_doc
  FROM w
  GROUP BY span_key, {split}
)
SELECT span_key,
       CAST(sum(CASE WHEN split = 'train' THEN n ELSE 0 END) AS BIGINT) AS n_train,
       CAST(sum(CASE WHEN split = 'val' THEN n ELSE 0 END) AS BIGINT) AS n_val,
       CAST(sum(CASE WHEN split = 'test' THEN n ELSE 0 END) AS BIGINT) AS n_test,
       min(CASE WHEN split <> 'train' THEN example_doc END) AS example_eval_doc
FROM per
GROUP BY span_key
HAVING sum(CASE WHEN split = 'train' THEN n ELSE 0 END) > 0
   AND sum(CASE WHEN split <> 'train' THEN n ELSE 0 END) > 0
""".strip()
