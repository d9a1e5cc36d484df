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


def _cosine(d: Dialect, a: str, b: str) -> str:
    av, bv = d.cast_double_arr(a), d.cast_double_arr(b)
    dot = d.dot(av, bv)
    na = d.dot(av, av)
    nb = d.dot(bv, bv)
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


def gen_cosine_topk(d: Dialect, query_vec_id: int = 0, k: int = 10) -> str:
    """Exact cosine top-k against the embedding of ``query_vec_id``."""
    cos = _cosine(d, "e.embedding", "q.qv")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id})
SELECT e.vec_id, e.label, round({cos}, 4) AS cosine
FROM embeddings e CROSS JOIN q
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
    cos = _cosine(d, "e.embedding", "q.qv")
    eb = _bucket(d, "e.embedding")
    qb = _bucket(d, "q.qv")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id})
SELECT e.vec_id, e.label, round({cos}, 4) AS cosine
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <> {query_vec_id} AND {eb} = {qb}
ORDER BY {cos} DESC, e.vec_id
LIMIT {k}
""".strip()
