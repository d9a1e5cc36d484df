"""Deterministic hash-based sampling / split assignment (SURVEY.md §2.9 —
LLM-data-pipeline extension; no reference analog).

Train/val/test assignment at 100 TB must be (a) a pure map over the scan —
no shuffle, no global sort, no RNG state — and (b) stable across reruns and
engines, so downstream stages can re-derive membership instead of storing
it.  Hashing the key and thresholding the bucket gives both: the split is a
deterministic function of doc_id alone, survives repartitioning, and pushes
down to a plain scan+project plan.  The same bucket column doubles as a
deterministic sampler (``WHERE bucket < frac * 10000``).
"""

from __future__ import annotations

from storage_crawler_spark.plans.dialect import Dialect

N_BUCKETS = 10_000


def split_bucket_expr(d: Dialect, id_col: str = "doc_id") -> str:
    """Deterministic bucket in [0, N_BUCKETS): first 48 bits of
    md5(id) mod 10000 — identical in both engines (same digest, same radix
    conversion).  The single source of truth for split hashing; composers
    (the end-to-end pipeline) inline this instead of joining the split
    relation back on doc_id."""
    h = d.hex12_to_bigint(f"substr({d.md5_utf8(f'CAST({id_col} AS STRING)')}, 1, 12)")
    return f"CAST({h} % {N_BUCKETS} AS BIGINT)"


def split_case_expr(bucket_sql: str, train_pct: int = 80, val_pct: int = 10) -> str:
    """train/val/test CASE over a bucket expression."""
    train_hi = train_pct * N_BUCKETS // 100
    val_hi = (train_pct + val_pct) * N_BUCKETS // 100
    return (
        f"CASE WHEN {bucket_sql} < {train_hi} THEN 'train' "
        f"WHEN {bucket_sql} < {val_hi} THEN 'val' ELSE 'test' END"
    )


def gen_split_assign(
    d: Dialect,
    train_pct: int = 80,
    val_pct: int = 10,
    src: str = "documents",
) -> str:
    """(doc_id, bucket, split) — md5-bucketed deterministic split.

    Built from :func:`split_bucket_expr` / :func:`split_case_expr`, so the
    oracle checks the actual assignment, not just counts."""
    return f"""
SELECT doc_id, bucket,
       {split_case_expr('bucket', train_pct, val_pct)} AS split
FROM (SELECT doc_id, {split_bucket_expr(d)} AS bucket FROM {src}) t
""".strip()


def gen_split_counts(d: Dialect, train_pct: int = 80, val_pct: int = 10) -> str:
    """Per-(lang, split) document counts — the stratification report a
    pipeline checks before training (and a groupBy proof the split is a
    plain map under aggregation)."""
    return f"""
SELECT lang, split, count(*) AS n_docs
FROM (
  SELECT s.doc_id, s.split, doc.lang
  FROM ({gen_split_assign(d, train_pct, val_pct)}) s
  JOIN documents doc ON doc.doc_id = s.doc_id
) t
GROUP BY lang, split
""".strip()


def gen_stratified_sample(d: Dialect, per_stratum: int = 40, src: str = "documents") -> str:
    """Deterministic fixed-size sample per stratum (lang): rank documents
    inside each lang by md5(doc_id) — a uniform-but-frozen shuffle — and
    keep the first ``per_stratum``.

    The "take N docs per language" op.  Unlike TABLESAMPLE/rand(), the
    selection is a pure function of the data (rerun- and engine-stable,
    join-backable).  One shuffle on the stratum key; the per-stratum sort
    is bounded by stratum size — for heavily skewed strata the same
    two-phase rank used by the jaccard tier applies, or a threshold
    pre-filter on the hash (keep ≈ 2·N/|stratum| quantile) ahead of the
    exact rank."""
    h = d.md5_utf8("CAST(doc_id AS STRING)")
    return f"""
SELECT doc_id, lang, pick_order
FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY {h}, doc_id) AS pick_order
  FROM {src}
) t
WHERE pick_order <= {per_stratum}
""".strip()
