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


def gen_ngram_contamination(
    d: Dialect,
    n: int = 5,
    train_pct: int = 80,
    val_pct: int = 10,
    threshold: str = "0.2",
    kd_rel: str | None = None,
) -> str:
    """Per-eval-document n-gram contamination: for every val/test document,
    the fraction of its DISTINCT token ``n``-grams that also occur anywhere
    in the train split — the GPT-3/PaLM-style decontamination unit (a token
    n-gram, not an exact span), reported per document so a flagged eval doc
    can be dropped or quarantined.  Complements gen_split_contamination,
    which reports per-SPAN counts; this reports the per-DOC verdict.

    Expressed as a semi-match LEFT JOIN on the n-gram key, NOT a
    max-over-window per key: at 100 TB a boilerplate n-gram puts 1e8 rows
    in one window partition and a window cannot be split, while AQE's
    skew-join splits hot join keys mechanically.  Shape: explode (map) →
    one distinct agg on (ngram, doc) → eval-side/train-side split by an
    inlined expression (no join back) → join on ngram → per-doc agg.

    The (ngram, doc, split) relation is referenced twice (eval rows, train
    keys); Spark inlines CTEs, so the Spark builder persists it once and
    passes ``kd_rel`` (registry ``_persist_view`` convention); the DuckDB
    oracle keeps the inline CTE.

    ``flagged`` compares exact doubles built from the same integers in both
    engines — no float-sum order dependence; ``contaminated_frac`` is
    floor-truncated per the repo float-parity convention.
    """
    from storage_crawler_spark.operators.text import gen_token_ngrams

    split = split_case_expr(split_bucket_expr(d), train_pct, val_pct)
    if kd_rel:
        with_clause = "WITH "
        kd = kd_rel
    else:
        kd = "kd"
        with_clause = f"""WITH g AS (
{gen_token_ngrams(d, n)}
),
kd AS (
  SELECT DISTINCT ngram, doc_id, {split} AS split FROM g
),
"""
    frac = "CAST(n_in_train AS DOUBLE) / n_grams"
    return f"""{with_clause}ev AS (
  SELECT ngram, doc_id, split FROM {kd} WHERE split <> 'train'
),
tr AS (
  SELECT DISTINCT ngram FROM {kd} WHERE split = 'train'
)
SELECT doc_id, split, n_grams, n_in_train,
       {d.trunc6(frac)} AS contaminated_frac,
       CASE WHEN {frac} >= {threshold} THEN 1 ELSE 0 END AS flagged
FROM (
  SELECT e.doc_id AS doc_id, e.split AS split,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN t.ngram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_in_train
  FROM ev e
  LEFT JOIN tr t ON e.ngram = t.ngram
  GROUP BY e.doc_id, e.split
) agg
""".strip()


def gen_domain_mixture(d: Dialect) -> str:
    """Domain-mixture weights report: per source (domain), document and
    token counts, the domain's token share of the corpus, and the
    temperature-sampled mixture weight w_i = sqrt(share_i) / Σ_j
    sqrt(share_j) (alpha = 0.5 — the mT5/XLM-R up-sampling rule that lifts
    small domains without letting the head domain dominate).  This is the
    table a corpus owner turns into per-domain sampling rates.

    100 TB shape: ONE aggregation over the corpus (partial-combining sum
    of per-doc token counts, shuffle on the low-cardinality source key —
    skew-free because the heavy lifting collapses map-side), then the
    global windows run on the per-DOMAIN relation: thousands of rows at
    most, so the unpartitioned OVER () is a driver-scale no-op, not a
    single-reducer bottleneck over docs.

    Float parity: shares are exact-integer ratios in double (identical in
    both engines); sqrt is IEEE-correctly-rounded (identical); only the
    Σ sqrt(share) fold is summation-order-dependent, and both outputs are
    floor-truncated at 6 decimals per the repo convention.  The BIGINT
    casts pin DuckDB's HUGEINT sum/window-sum back to int64.
    """
    ntoks = d.size(d.split("text"))
    return f"""
WITH per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN text IS NULL THEN 0 ELSE {ntoks} END) AS BIGINT) AS sum_tokens
  FROM documents
  GROUP BY source
),
shares AS (
  SELECT source, n_docs, sum_tokens,
         CAST(sum_tokens AS DOUBLE) / CAST(sum(sum_tokens) OVER () AS DOUBLE) AS share
  FROM per_src
)
SELECT source, n_docs, sum_tokens,
       {d.trunc6('share')} AS token_share,
       {d.trunc6('sqrt(share) / sum(sqrt(share)) OVER ()')} AS mix_weight
FROM shares
""".strip()
