"""Similarity search over the ``embeddings`` table (array<float> column).

- **brute-force cosine top-k** — the exactness baseline: broadcast the query
  vector, fold dot products in deterministic left-to-right order (identical
  in Spark and DuckDB — see plans/dialect.py), global top-k.  On a cluster
  Catalyst plans the ORDER BY+LIMIT as TakeOrderedAndProject: per-partition
  top-k then a tiny driver merge — no full sort, no shuffle of the corpus.
- **IVF-style bucketed ANN** — the scale path: coarse-quantize vectors into
  buckets by sign pattern of leading components (a stand-in for trained
  centroids, which would be a broadcast dimension), probe only the query's
  bucket + neighbors.  Generated for both engines so the oracle checks the
  bucketing math; recall-vs-speed tradeoff documented rather than hidden.
"""

from __future__ import annotations

from storage_crawler_spark.plans.dialect import Dialect


def _norm_cte(d: Dialect, with_bucket: bool = False) -> str:
    """Per-vector prep: double array + L2 norm (and optionally the sign
    bucket), computed ONCE per vector.  Downstream pair math is then a
    single dot product — without this, every pair pays three dot folds
    (dot, |a|², |b|²), tripling the hot-path cost."""
    ev = d.cast_double_arr("embedding")
    bkt = f", {_bucket(d, 'ev')} AS bkt" if with_bucket else ""
    # nrm > 0 guard: cosine is undefined for the zero vector, and a single
    # all-zero embedding (a failed-embedding row — realistic at scale) would
    # otherwise CRASH the whole query on Spark (ANSI DIVIDE_BY_ZERO throws)
    # while DuckDB silently yields NULL — found by the randomized parity
    # tests.  Dropping zero-norm vectors is the principled semantic and is
    # stated in one shared predicate so both engines agree.
    return f"""v0 AS (SELECT vec_id, label, {ev} AS ev FROM embeddings),
v AS (SELECT * FROM (
  SELECT vec_id, label, ev, sqrt({d.dot('ev', 'ev')}) AS nrm{bkt} FROM v0
) vn WHERE nrm > 0)"""


def gen_cosine_topk(d: Dialect, query_vec_id: int = 0, k: int = 10) -> str:
    """Exact cosine top-k against the embedding of ``query_vec_id``.

    ``sqrt(na)*sqrt(nb)`` is precomputed per side in the norm CTE — the
    expression tree per pair is one dot fold and two scalar multiplies, so
    the corpus scan stays map-only ahead of TakeOrderedAndProject."""
    cos = f"({d.dot('e.ev', 'q.ev')}) / (e.nrm * q.nrm)"
    return f"""
WITH {_norm_cte(d)},
q AS (SELECT ev, nrm FROM v WHERE vec_id = {query_vec_id})
SELECT e.vec_id, e.label, round({cos}, 4) AS cosine
FROM v e CROSS JOIN q
WHERE e.vec_id <> {query_vec_id}
ORDER BY {cos} DESC, e.vec_id
LIMIT {k}
""".strip()


def _bucket(d: Dialect, arr: str, nbits: int = 4) -> str:
    """Sign-pattern coarse quantizer over the first ``nbits`` components —
    2^nbits buckets.  (With trained centroids this becomes argmin over a
    broadcast centroid table; the plan shape is identical.)"""
    terms = " + ".join(
        f"(CASE WHEN {d.elem(arr, str(i + 1))} >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(nbits)
    )
    return f"({terms})"


def gen_ivf_topk(d: Dialect, query_vec_id: int = 0, k: int = 10) -> str:
    """IVF-bucketed ANN: probe only vectors in the query's sign bucket.
    Approximate by construction — recall < 1 is expected and measured by
    comparing to gen_cosine_topk, not hidden."""
    cos = f"({d.dot('e.ev', 'q.ev')}) / (e.nrm * q.nrm)"
    return f"""
WITH {_norm_cte(d, with_bucket=True)},
q AS (SELECT ev, nrm, bkt FROM v WHERE vec_id = {query_vec_id})
SELECT e.vec_id, e.label, round({cos}, 4) AS cosine
FROM v e CROSS JOIN q
WHERE e.vec_id <> {query_vec_id} AND e.bkt = q.bkt
ORDER BY {cos} DESC, e.vec_id
LIMIT {k}
""".strip()


def gen_embedding_near_dup(d: Dialect, threshold: float = 0.35, nbits: int = 4) -> str:
    """Embedding-cosine near-duplicate pairs (the dedup tier over vectors).

    Blocking: sign-pattern bucket over the leading components — two copies
    of the same underlying item land in the same bucket unless noise flips
    a leading sign, the standard random-hyperplane LSH recall tradeoff
    (more tables/bits at scale).  Within a bucket the pair join computes
    one dot per pair against precomputed norms; at 100 TB the bucket key
    is the shuffle key and no cross-bucket pair is ever materialized.

    The default threshold is tuned to the synthetic embeddings (near-
    random vectors, max pairwise cosine ≈ 0.51): real dedup corpora use
    0.9+; the plan shape is threshold-independent.
    """
    cos = f"({d.dot('a.ev', 'b.ev')}) / (a.nrm * b.nrm)"
    return f"""
WITH {_norm_cte(d, with_bucket=True)}
SELECT vec_a, vec_b, cosine FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         {d.trunc6(cos)} AS cosine
  FROM v a JOIN v b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
) p
WHERE cosine >= {threshold}
""".strip()


def gen_knn_join(d: Dialect, k: int = 5, nbits: int = 4) -> str:
    """Bucketed KNN self-join: top-``k`` neighbours for EVERY vector (the
    batch retrieval op a training pipeline runs corpus-wide, vs. the
    single-query top-k above).

    Candidates are bucket-mates only (sign-pattern LSH, same recall
    tradeoff as the near-dup tier — at 100 TB exact all-pairs KNN is
    quadratic and not an option, so the bucketed semantics ARE the
    operator, identically in engine and oracle).  Per query vector the
    top-k is a row_number window over its candidate list: Spark shuffles
    on qid once, ranks within partitions — bounded by bucket size, and
    partial top-k at scale via the bucket key.  Ties break by neighbour
    id for cross-engine determinism.
    """
    cos = f"({d.dot('a.ev', 'b.ev')}) / (a.nrm * b.nrm)"
    return f"""
WITH {_norm_cte(d, with_bucket=True)},
pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid, a.label AS q_label, b.label AS n_label,
         {d.trunc6(cos)} AS cosine
  FROM v a JOIN v b ON a.bkt = b.bkt AND a.vec_id <> b.vec_id
)
SELECT qid, nid, q_label, n_label, cosine, rank FROM (
  SELECT pairs.*, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
  FROM pairs
) r
WHERE rank <= {k}
""".strip()


def gen_ivf_recall(d: Dialect, query_vec_id: int = 0, k: int = 10) -> str:
    """Recall@k of the bucketed IVF tier against the exact top-k — the
    accuracy contract of the ANN path measured as a query, not asserted in
    prose.  One row: k, hits, recall.  Runs both formulations and
    intersects their id sets; at oracle scale this is cheap, and in
    production it is the periodic index-quality probe."""
    exact = gen_cosine_topk(d, query_vec_id, k)
    approx = gen_ivf_topk(d, query_vec_id, k)
    return f"""
SELECT {k} AS k, count(*) AS n_hits,
       {d.trunc6(f"CAST(count(*) AS DOUBLE) / {k}")} AS recall
FROM (
{exact}
) e
JOIN (
{approx}
) a ON e.vec_id = a.vec_id
""".strip()
