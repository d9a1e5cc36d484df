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

from storage_crawler_spark.plans.dialect import Dialect, avg_lattice
from storage_crawler_spark.operators import check_model_state


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


def gen_embedding_stats(d: Dialect) -> str:
    """Per-label embedding-corpus audit: vector counts, dimension bounds,
    zero-norm (failed-embedding) counts, and L2-norm distribution — the
    sanity gate a 100 TB embedding store runs BEFORE building any index
    (a single wrong-dimension or all-zero batch silently poisons ANN
    recall; this surfaces both as first-class columns).

    One pruned scan + one partial-combining aggregation on ``label`` — the
    per-vector norm folds inside the scan stage (deterministic
    left-to-right order, see plans/dialect.py), so the shuffle carries
    only (label, scalar) rows.  All integer aggregates CAST to BIGINT:
    DuckDB's sum(int) is HUGEINT and its len() BIGINT vs Spark's INT —
    the exact Arrow decimal128-vs-int64 trap of driver round 4.
    mean_norm is an order-free lattice mean at p=9 (r14 determinism
    audit; bound: norms < 9e6); min/max are order-free by algebra.
    """
    ev = d.cast_double_arr("embedding")
    return f"""
WITH v0 AS (
  SELECT vec_id, label, {ev} AS ev FROM embeddings WHERE embedding IS NOT NULL
),
n AS (
  SELECT label, CAST({d.size('ev')} AS BIGINT) AS dims,
         sqrt({d.dot('ev', 'ev')}) AS nrm
  FROM v0
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(min(dims) AS BIGINT) AS min_dims,
       CAST(max(dims) AS BIGINT) AS max_dims,
       CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
       {d.trunc6('min(nrm)')} AS min_norm,
       {avg_lattice(d, 'nrm', 9)} AS mean_norm,
       {d.trunc6('max(nrm)')} AS max_norm
FROM n
GROUP BY label
ORDER BY label
""".strip()


def gen_int8_quant_audit(d: Dialect) -> str:
    """Symmetric per-vector int8 quantization audit: quantize each embedding
    to int8 with its own scale (max|x|/127, the faiss/SQ8 convention),
    reconstruct, and report the per-label reconstruction-error distribution
    plus the worst per-vector relative error.  This is the go/no-go gate
    before shipping a quantized 100 TB vector store — 4× smaller and
    memory-bandwidth-bound ANN only pays off if the recall-relevant error
    stays bounded.

    Engine parity: rounding is ``floor(x/scale + 0.5)`` (explicit
    round-half-up — Spark's round() and DuckDB's disagree at .5 ties), the
    per-vector squared error folds left-to-right (plans/dialect.py), and
    zero vectors short-circuit to error 0 (their scale would be 0).

    100 TB shape: everything per-vector happens inside the scan stage
    (map-only); the shuffle carries (label, scalar error) rows into one
    partial-combining aggregate.  No joins, no window.
    mean_sq_err is an order-free lattice mean at p=12 (r14 determinism
    audit — quantization errors sit near 1e-5, so the 1e-6 grid would
    zero them; bound: err2 < 9e3); max_sq_err/max_rel_err are order-free
    by algebra.
    """
    ev = d.cast_double_arr("embedding")
    absarr = d.transform("ev", "x", "abs(x)")
    # int8 code of one component: clamp(round_half_up(x / scale), -127, 127)
    q = "greatest(CAST(-127 AS DOUBLE), least(CAST(127 AS DOUBLE), floor(x / scale + 0.5)))"
    recon = d.transform("ev", "x", f"({q}) * scale")
    err2 = d.fold_double(d.zip_sub_sq("ev", "recon"))
    return f"""
WITH v0 AS (
  SELECT vec_id, label, {ev} AS ev FROM embeddings WHERE embedding IS NOT NULL
),
s AS (
  SELECT vec_id, label, ev, {d.amax(absarr)} / 127 AS scale FROM v0
),
r AS (
  SELECT vec_id, label, ev, scale,
         CASE WHEN scale = 0 THEN {d.transform('ev', 'x', 'CAST(0.0 AS DOUBLE)')}
              ELSE {recon} END AS recon
  FROM s
),
e AS (
  SELECT vec_id, label,
         CASE WHEN scale = 0 THEN CAST(0.0 AS DOUBLE) ELSE {err2} END AS err2,
         {d.dot('ev', 'ev')} AS nrm2
  FROM r
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       {avg_lattice(d, 'err2', 12)} AS mean_sq_err,
       {d.trunc6('max(err2)')} AS max_sq_err,
       {d.trunc6('max(CASE WHEN nrm2 = 0 THEN 0.0 ELSE err2 / nrm2 END)')} AS max_rel_err
FROM e
GROUP BY label
ORDER BY label
""".strip()


def gen_label_outliers(d: Dialect, per_label: int = 3) -> str:
    """Per-label centroid outliers: the ``per_label`` vectors farthest
    (Euclidean) from their label's mean vector — mislabeled rows, embedding
    failures, and adversarial inserts all surface here.  The quality-probe
    sibling of the trained-IVF path (kmeans.py): same centroid math, but
    expressed fully relationally so the oracle checks it.

    100 TB shape, in three bounded steps:
    1. dims — posexplode each vector to (vec_id, label, dim_i, x): pure
       lateral row expansion inside the scan stage, no shuffle;
    2. cent — per-(label, dim) means via ONE partial-combining aggregation
       (the shuffle carries labels × dims rows, i.e. tiny), reassembled
       into ordered centroid arrays with an ORDER-PINNED array agg
       (plans/dialect.py agg_arr_by — bare collect_list order is
       partition-nondeterministic and would scramble the centroid);
    3. dist — centroids are a labels-row dimension: Spark broadcasts the
       join, and each vector pays one deterministic fold for its distance;
       per-label top-k is a window over scalar rows.
    The distance fold order is identical in both engines (zip_sub_sq),
    so d2 agrees to the last bit given equal centroids; rank ties are
    pinned by vec_id.
    """
    ev = d.cast_double_arr("embedding")
    starts = d.lateral_seq("1", d.size("ev"), "di")
    return f"""
WITH v0 AS (
  SELECT vec_id, label, {ev} AS ev FROM embeddings
  WHERE embedding IS NOT NULL AND {d.size('embedding')} >= 1
),
dims AS (
  SELECT vec_id, label, di, {d.elem('ev', 'di')} AS x
  FROM v0
  {starts}
),
cent AS (
  SELECT label, {d.agg_arr_by('di', 'cx')} AS cev
  FROM (SELECT label, di, avg(x) AS cx FROM dims GROUP BY label, di) c
  GROUP BY label
),
dist AS (
  SELECT v.vec_id, v.label, {d.dist2('v.ev', 'c.cev')} AS d2
  FROM v0 v JOIN cent c ON v.label = c.label
)
SELECT label, vec_id, {d.trunc6('sqrt(d2)')} AS dist
FROM (
  SELECT label, vec_id, d2,
         row_number() OVER (PARTITION BY label ORDER BY d2 DESC, vec_id) AS rnk
  FROM dist
) r
WHERE rnk <= {per_label}
ORDER BY label, dist DESC, vec_id
""".strip()


def _rp_planes_cte(d: Dialect, n_planes: int, seed: str = "rp") -> str:
    """Deterministic random-hyperplane relation: component (j, i) of plane
    ``j`` is an md5-derived pseudo-uniform in [-1, 1] — the SAME doubles in
    Spark and DuckDB, so the whole LSH index is oracle-checkable (a seeded
    JVM/NumPy RNG never would be).  The hyperplane table is ``n_planes ×
    dim`` doubles built from a one-row dim probe: driver-free,
    literal-free, and at any scale a broadcast of a few KB.  Planes are
    reassembled with ORDER-PINNED array aggs (bare collect_list would
    scramble components) into ONE row holding array-of-arrays, so signing
    a vector is a map-only projection, not an 8-way join fanout."""
    concat = f"concat('{seed}', j, '_', i)"
    comp = f"(CAST({d.md5_key48(concat)} % 2001 AS DOUBLE) - 1000.0) / 1000.0"
    return f"""dm AS (SELECT max({d.size('ev')}) AS dim FROM v),
comp AS (
  SELECT j, i, {comp} AS c
  FROM dm
  {d.lateral_seq('1', str(n_planes), 'j')}
  {d.lateral_seq('1', 'dim', 'i')}
),
pl AS (SELECT j, {d.agg_arr_by('i', 'c')} AS parr FROM comp GROUP BY j),
p AS (SELECT {d.agg_arr_by('j', 'parr')} AS planes FROM pl)"""


def gen_rp_lsh_topk(
    d: Dialect, query_vec_id: int = 0, k: int = 10, n_planes: int = 8, radius: int = 1
) -> str:
    """Random-hyperplane (SimHash-for-vectors) LSH top-k: each vector's
    ``n_planes``-bit signature is the sign pattern of its dot products with
    deterministic md5-derived hyperplanes (Charikar 2002, public); the
    query probes its own bucket plus all buckets within Hamming distance
    ``radius`` (multi-probe), then ranks candidates by exact cosine.

    Unlike the leading-component sign buckets of :func:`gen_ivf_topk`,
    hyperplane signatures use EVERY component, so collision probability is
    monotone in true angle — the textbook recall contract (measured, not
    asserted, by :func:`gen_rp_lsh_recall`).

    100 TB shape: signing is map-only (one broadcast row of planes, one
    fold per plane inside codegen); the bucket filter is a bit_count over
    BIGINT XOR — candidates shrink ~``sum_{h<=radius} C(n_planes,h) /
    2^n_planes`` (~3.5% at 8 planes, radius 1), and the final exact rank
    fuses to TakeOrderedAndProject over survivors only."""
    bit = (
        f"CASE WHEN {d.dot('ev', d.elem('planes', 'j'))} > 0 "
        f"THEN CAST(power(2, j - 1) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    )
    bucket = d.reduce_bigint(
        d.transform(d.seq("1", str(n_planes)), "j", bit), "acc + x"
    )
    cos = f"({d.dot('e.ev', 'q.ev')}) / (e.nrm * q.nrm)"
    return f"""
WITH {_norm_cte(d)},
{_rp_planes_cte(d, n_planes)},
sig AS (
  SELECT vec_id, label, ev, nrm, {bucket} AS bucket
  FROM v CROSS JOIN p
),
q AS (SELECT ev, nrm, bucket FROM sig WHERE vec_id = {query_vec_id})
SELECT e.vec_id, e.label, round({cos}, 4) AS cosine
FROM sig e CROSS JOIN q
WHERE e.vec_id <> {query_vec_id}
  AND {d.popcount(d.bxor('e.bucket', 'q.bucket'))} <= {radius}
ORDER BY {cos} DESC, e.vec_id
LIMIT {k}
""".strip()


def gen_rp_lsh_recall(
    d: Dialect, query_vec_id: int = 0, k: int = 10, n_planes: int = 8, radius: int = 1
) -> str:
    """Recall@k of the hyperplane-LSH tier against the exact top-k — same
    measured-accuracy contract as :func:`gen_ivf_recall`, for the RP index."""
    exact = gen_cosine_topk(d, query_vec_id, k)
    approx = gen_rp_lsh_topk(d, query_vec_id, k, n_planes, radius)
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


def gen_hard_negatives(
    d: Dialect, k: int = 3, dup_threshold: float = 0.5, nbits: int = 4
) -> str:
    """Hard-negative mining for contrastive training: per query vector, the
    top-``k`` most similar OTHER-LABEL neighbours that are NOT
    near-duplicates (cosine < ``dup_threshold``) — close enough to be
    informative, provably not the same item and not the same class.  The
    standard batch-mining pass behind embedding-model fine-tuning
    (sentence-transformers style) expressed as a corpus-wide query.

    Same 100 TB shape as :func:`gen_knn_join` (sign-bucket LSH candidates,
    one dot per pair against precomputed norms, per-query row_number over
    bucket-bounded candidate lists); the two mining predicates — label
    mismatch and the near-dup ceiling — push into the pair join, so
    excluded pairs never reach the window.  Ties break by neighbour id.
    """
    cos = f"({d.dot('a.ev', 'b.ev')}) / (a.nrm * b.nrm)"
    return f"""
WITH {_norm_cte(d, with_bucket=True)},
pairs AS (
  SELECT a.vec_id AS qid, a.label AS q_label, b.vec_id AS nid, b.label AS n_label,
         {d.trunc6(cos)} AS cosine
  FROM v a JOIN v b
    ON a.bkt = b.bkt AND a.vec_id <> b.vec_id AND a.label <> b.label
)
SELECT qid, q_label, nid, n_label, cosine, rank FROM (
  SELECT pairs.*, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
  FROM pairs
  WHERE cosine < {dup_threshold}
) r
WHERE rank <= {k}
""".strip()


def gen_embedding_near_dup_incremental(
    d: Dialect, new_pred: str = "vec_id % 10 = 0", threshold: float = 0.35, nbits: int = 4
) -> str:
    """Incremental embedding near-dup pass: cosine near-dup pairs that
    involve at least one NEW vector (``new_pred``) — the vector-space twin
    of the minhash daily-increment probe.  The sign-bucket join probes the
    full bucketed index with only the new vectors, so per-batch work is
    O(|new| · bucket size), not O(|corpus|); old↔old pairs are never
    generated.  Result is EXACTLY the full pair set restricted to pairs
    touching a new vector — the oracle states it that way over the full
    pair join (independent formulation, not a restatement).

    ``least``/``greatest`` + DISTINCT canonicalize new↔new pairs that meet
    in both probe directions; the canonicalized ids re-join the prepped
    relation so the pair math itself stays identical to the full pass.
    """
    cos = f"({d.dot('a.ev', 'b.ev')}) / (a.nrm * b.nrm)"
    return f"""
WITH {_norm_cte(d, with_bucket=True)},
v_new AS (SELECT * FROM v WHERE {new_pred}),
cand AS (
  SELECT DISTINCT least(x.vec_id, y.vec_id) AS vec_a, greatest(x.vec_id, y.vec_id) AS vec_b
  FROM v_new x JOIN v y ON x.bkt = y.bkt AND x.vec_id <> y.vec_id
)
SELECT vec_a, vec_b, cosine FROM (
  SELECT c.vec_a, c.vec_b, {d.trunc6(cos)} AS cosine
  FROM cand c
  JOIN v a ON a.vec_id = c.vec_a
  JOIN v b ON b.vec_id = c.vec_b
) p
WHERE cosine >= {threshold}
""".strip()


def gen_label_cohesion(d: Dialect) -> str:
    """Exact intra-label MEAN PAIRWISE COSINE without generating a single
    pair: for unit-normalized vectors, sum_{i≠j} cos(v_i, v_j) =
    ‖Σv‖² − n, so per-label cohesion = (‖Σv‖² − n) / (n·(n−1)) — the
    embedding-quality/clusterability audit (do same-label vectors agree?)
    at O(n·dim) instead of O(n²): the identity IS the scale plan.

    Zero-norm vectors are excluded up front (they cannot normalize);
    singleton labels emit NULL cohesion (no pairs exist), not 0.

    100 TB shape: normalize in the scan (map), posexplode to
    (label, dim, component) for the per-dimension sum — partial-combining
    on a (labels × dims)-sized key space — then one tiny per-label fold.
    No joins, no pair materialization, nothing quadratic anywhere.

    Determinism (r14 audit, the seed-257 class): BOTH float sums in the
    chain — sum(c) over n vectors per (label, dim) and sum(sc²) over dims
    per label — merge partials in task-completion order on Spark, so the
    displayed cohesion could truncate differently per engine/run.  Fixed
    with a two-hop lattice: unit components (|c| <= 1) floor onto the
    1e-12 lattice into exact DECIMAL(38,0) sums; the per-dim MEAN
    component mc = sc/n (rebuilt with one cast + one division) is squared
    and floored onto the 1e-12 lattice again for the exact per-label
    DECIMAL sum.  Algebra: s2 = Σ sc² = n²·Σ mc², so cohesion =
    (s2 − n)/(n(n−1)) = (n·Σ mc² − 1)/(n − 1).  Lattice error <=
    ~3e-12·dims (≈3e-8 at 10k dims) — deterministic, and invisible next
    to the 1e-6 display grid.
    """
    ev = d.cast_double_arr("embedding")
    nrm = f"sqrt({d.dot('ev', 'ev')})"
    unit = d.transform("ev", "x", "x / nrm")
    lat = d.lateral_seq("1", d.size("uv"), "dim")
    comp = d.elem("uv", "dim")
    mc = "CAST(sci AS DOUBLE) / (CAST(n AS DOUBLE) * 1.0e12)"
    s2m = "CAST(floor((mc * mc) * 1.0e12) AS DECIMAL(38,0))"
    s_sum = "CAST(sum(mcsq) AS DOUBLE) / 1.0e12"
    cohesion = (
        "CASE WHEN n > 1 THEN (CAST(n AS DOUBLE) * s_mc2 - 1.0e0) / "
        "(CAST(n AS DOUBLE) - 1.0e0) ELSE NULL END"
    )
    return f"""
WITH v0 AS (
  SELECT label, ev, {nrm} AS nrm
  FROM (SELECT label, {ev} AS ev FROM embeddings WHERE embedding IS NOT NULL) e0
),
u AS (
  SELECT label, {unit} AS uv FROM v0 WHERE nrm > 0
),
comps AS (
  SELECT label, dim, {comp} AS c
  FROM u
  {lat}
),
sums AS (
  SELECT label, dim,
         CAST(sum(CAST(floor(c * 1.0e12) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sci
  FROM comps GROUP BY label, dim
),
mdims AS (
  SELECT label, n, {s2m} AS mcsq
  FROM (
    SELECT s0.label, n0.n, {mc} AS mc
    FROM sums s0
    JOIN (SELECT label, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY label) n0
      ON s0.label = n0.label
  ) s
),
agg AS (
  SELECT label, n, {s_sum} AS s_mc2
  FROM mdims
  GROUP BY label, n
)
SELECT label, CAST(n AS BIGINT) AS n_vecs,
       {d.trunc6(cohesion)} AS mean_pairwise_cos
FROM agg
ORDER BY label
""".strip()


def gen_centroid_confusion(d: Dialect) -> str:
    """Nearest-centroid classifier audit over the embedding store: assign
    every vector to the closest per-label mean vector and report the
    (actual × predicted) confusion matrix with within-actual shares — the
    vector-space sibling of the lang-ID confusion audit (operators/text.py
    gen_langid_confusion): embedding quality quantified as label
    separability, not eyeballed.

    100 TB shape: centroids via the posexplode/partial-agg/order-pinned
    reassembly of gen_label_outliers (labels × dims shuffle rows); the
    assignment is a CROSS JOIN against the labels-row centroid dimension —
    a broadcast of label-cardinality rows (the right scale shape; the
    dim-keyed join alternative would funnel vectors × labels × dims rows
    through dim-count keys).  Argmin ties break by label for cross-engine
    determinism; the share window runs on the tiny confusion relation with
    counts CAST before the division (HUGEINT trap).
    """
    ev = d.cast_double_arr("embedding")
    starts = d.lateral_seq("1", d.size("ev"), "di")
    share = d.trunc6(
        "CAST(n AS DOUBLE) / sum(CAST(n AS DOUBLE)) OVER (PARTITION BY actual_label)"
    )
    return f"""
WITH v0 AS (
  SELECT vec_id, label, {ev} AS ev FROM embeddings
  WHERE embedding IS NOT NULL AND {d.size('embedding')} >= 1
),
dims AS (
  SELECT vec_id, label, di, {d.elem('ev', 'di')} AS x
  FROM v0
  {starts}
),
cent AS (
  SELECT label, {d.agg_arr_by('di', 'cx')} AS cev
  FROM (SELECT label, di, avg(x) AS cx FROM dims GROUP BY label, di) c
  GROUP BY label
),
assign AS (
  SELECT vec_id, actual_label, pred_label FROM (
    SELECT v.vec_id, v.label AS actual_label, c.label AS pred_label,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {d.dist2('v.ev', 'c.cev')}, c.label) AS rn
    FROM v0 v CROSS JOIN cent c
  ) r WHERE rn = 1
),
conf AS (
  SELECT actual_label, pred_label, CAST(count(*) AS BIGINT) AS n
  FROM assign GROUP BY actual_label, pred_label
)
SELECT actual_label, pred_label, n, {share} AS share
FROM conf
ORDER BY actual_label, pred_label
""".strip()


def gen_embedding_exact_dups(d: Dialect) -> str:
    """Bitwise-exact duplicate vectors: GROUP BY the embedding array
    itself (array equality is elementwise float equality in both engines)
    — the cheap first tier of vector dedup, catching the retry/replay
    duplicates every large embedding store accumulates, before any
    LSH/cosine machinery runs.  One shuffle on the array key (hash of the
    vector bytes); only groups with >1 copy are emitted, keeper = min id.
    """
    return """
SELECT CAST(min(vec_id) AS BIGINT) AS keeper_vec_id,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(min(label) AS INT) AS min_label,
       CAST(max(label) AS INT) AS max_label
FROM embeddings
WHERE embedding IS NOT NULL
GROUP BY embedding
HAVING count(*) > 1
ORDER BY keeper_vec_id
""".strip()


def gen_hybrid_rrf(
    d: Dialect,
    query_terms: tuple[str, ...] = ("spark", "query", "merge"),
    query_vec_id: int = 0,
    k_each: int = 20,
    k: int = 15,
    rrf_k: int = 60,
) -> str:
    """Hybrid retrieval via reciprocal-rank fusion: the BM25 lexical
    ranking (operators/text.py chain, identical scoring by construction)
    and the exact-cosine vector ranking against ``query_vec_id``'s
    embedding, fused as sum of 1/(rrf_k + rank) over each list's top
    ``k_each`` — the standard two-tower retrieval merge (RRF needs no
    score normalization, which is what makes it cross-engine stable:
    only integer RANKS cross the fusion boundary, never raw scores).

    Engine parity: both rank lists order on (engine-stable score, id);
    the fused score is a pure function of small-integer ranks, so float
    drift cannot reorder the output.  100 TB shape: the lexical side
    scores only docs hitting the term IN-list; the VECTOR side is the
    RP-LSH multi-probe tier (md5-deterministic hyperplane signatures,
    Hamming-``radius`` bucket filter — identical SQL in both dialects, so
    the approximation is itself oracle-checked), NOT an exact global
    rank.  Each side's top-``k_each`` comes from ORDER BY + LIMIT
    (TakeOrderedAndProject — map-side partial top-k); rank NUMBERS are
    then read off a positional explode of ONE ordered ≤``k_each``-element
    array per side — no unpartitioned window anywhere in the plan.  Final
    fused top-k fuses into TakeOrderedAndProject.
    """
    from storage_crawler_spark.operators.text import bm25_scored_ctes

    n_planes, radius = 8, 1
    k1 = "(12 / 1.0e1)"
    b = "(75 / 1.0e2)"
    parts, scored = bm25_scored_ctes(d, query_terms, k1, b, None)
    cos = f"({d.dot('e.ev', 'q.ev')}) / (e.nrm * q.nrm)"

    def _rank_ctes(src: str, order: str, arr_name: str, out: str, rank_col: str) -> str:
        # ORDER BY + LIMIT bounds src to k_each rows; the ordered id array
        # then yields rank = 1-based position (lateral over the sequence),
        # replacing the former global row_number.
        key = f"struct({order})" if d.name == "spark" else order
        return (
            f"{arr_name} AS (SELECT {d.agg_arr_by(key, 'doc_id')} AS arr FROM {src}),\n"
            f"{out} AS (\n"
            f"  SELECT {d.elem('arr', 'i')} AS doc_id, CAST(i AS BIGINT) AS {rank_col}\n"
            f"  FROM (SELECT arr FROM {arr_name} WHERE {d.size('arr')} >= 1) a\n"
            f"  {d.lateral_seq('1', d.size('arr'), 'i')}\n)"
        )

    parts.append(
        f"bmt AS (\n  SELECT doc_id, bm25 FROM (\n  {scored}\n  ) sb\n"
        f"  ORDER BY bm25 DESC, doc_id LIMIT {k_each}\n)"
    )
    parts.append(_rank_ctes("bmt", "-bm25, doc_id", "bmarr", "bmr", "r_text"))
    parts.append(_norm_cte(d))
    parts.append(_rp_planes_cte(d, n_planes))
    bit = (
        f"CASE WHEN {d.dot('ev', d.elem('planes', 'j'))} > 0 "
        f"THEN CAST(power(2, j - 1) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    )
    bucket = d.reduce_bigint(d.transform(d.seq("1", str(n_planes)), "j", bit), "acc + x")
    parts.append(f"sig AS (SELECT vec_id, ev, nrm, {bucket} AS bucket FROM v CROSS JOIN p)")
    parts.append(f"q AS (SELECT ev, nrm, bucket FROM sig WHERE vec_id = {query_vec_id})")
    parts.append(
        f"vst AS (\n  SELECT e.vec_id AS doc_id, {cos} AS cosv\n"
        f"  FROM sig e CROSS JOIN q\n  WHERE e.vec_id <> {query_vec_id}\n"
        f"    AND {d.popcount(d.bxor('e.bucket', 'q.bucket'))} <= {radius}\n"
        f"  ORDER BY cosv DESC, doc_id LIMIT {k_each}\n)"
    )
    parts.append(_rank_ctes("vst", "-cosv, doc_id", "vsarr", "vsr", "r_vec"))
    rrf = (
        f"coalesce(1.0e0 / ({rrf_k} + bl.r_text), 0.0e0) + "
        f"coalesce(1.0e0 / ({rrf_k} + vl.r_vec), 0.0e0)"
    )
    ctes = ",\n".join(parts)
    return f"""WITH {ctes}
SELECT coalesce(bl.doc_id, vl.doc_id) AS doc_id,
       CAST(bl.r_text AS BIGINT) AS text_rank,
       CAST(vl.r_vec AS BIGINT) AS vec_rank,
       {d.trunc6(rrf)} AS rrf_score
FROM bmr bl
FULL JOIN vsr vl ON bl.doc_id = vl.doc_id
ORDER BY rrf_score DESC, doc_id
LIMIT {k}
""".strip()


def gen_dim_stats(d: Dialect) -> str:
    """Per-DIMENSION embedding-store audit: count, min/max/mean, second
    moment, and exact-zero counts for every coordinate — the dead-dimension
    / wrong-scale detector that the per-label audit (gen_embedding_stats)
    cannot see (a dimension stuck at 0 or 100× the others' scale poisons
    cosine and PCA alike, while every label-level stat stays plausible).

    100 TB shape: map-only lateral explode to (dim, x) with partial
    aggregation onto the tiny dim key (combiner shrinks each task's output
    to n_dims rows before the shuffle).  Mean/moment are order-free exact
    lattice means at p=9 (r14 determinism audit; bound: |x| < 9e6 for
    full lattice accuracy — real embedding components sit orders below);
    min/max of doubles are order-free by algebra; zero counts and n are
    exact BIGINTs.  Empty arrays are filtered before the
    sequence (Spark's sequence() counts DOWN on inverted bounds).
    """
    ev = d.cast_double_arr("embedding")
    lat = d.lateral_seq("1", d.size("ev"), "i")
    x = d.elem("ev", "i")
    return f"""
WITH v0 AS (
  SELECT {ev} AS ev FROM embeddings
  WHERE embedding IS NOT NULL AND {d.size(d.cast_double_arr('embedding'))} >= 1
),
dims AS (
  SELECT i AS dim, {x} AS x
  FROM v0
  {lat}
)
SELECT dim,
       CAST(count(*) AS BIGINT) AS n_vecs,
       {d.trunc6('min(x)')} AS min_x,
       {d.trunc6('max(x)')} AS max_x,
       {avg_lattice(d, 'x', 9)} AS mean_x,
       {avg_lattice(d, 'x * x', 9)} AS mean_x2,
       CAST(sum(CASE WHEN x = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
FROM dims
GROUP BY dim
ORDER BY dim
""".strip()


def gen_corr_audit(d: Dialect, top_k: int = 20, q: int = 65536) -> str:
    """Pairwise dimension-CORRELATION audit of the embedding store: the
    top-``top_k`` most-correlated coordinate pairs — redundant/entangled
    dimensions that per-dimension stats (gen_dim_stats) cannot see, and
    the first thing a PCA/whitening decision needs.  A |corr| near 1 means
    the store is paying storage and compute for a dimension that carries
    no new information.

    Determinism: coordinates are quantized to the 1/q integer lattice
    (floor — identical in both engines), so every moment (Sx, Sxx, Sxy) is
    an EXACT BIGINT whose cast-to-double and subsequent IEEE ops are
    reproducible — a raw double sum would drift by summation order across
    engines (the events_value_trend lattice discipline).  Bounds: |x| < 8
    keeps xq under 2^19, pair products under 2^38, sums exact up to ~2e7
    vectors; larger stores shrink q.

    100 TB shape: per-dim moments are a d-row aggregate; the cross moments
    explode docs x d(d-1)/2 pairs (the Gram matrix — irreducible) but
    partial-combine map-side onto the tiny (i, j) key space before any
    shuffle; the final top-k fuses to TakeOrderedAndProject.

    Constant (or constant-after-quantization) dimensions have zero
    variance; the denominator is wrapped in nullif(..., 0) so BOTH engines
    yield NULL there (Spark's non-ANSI divide nulls on 0, DuckDB would
    return inf/NaN), and NULL r rows are excluded before the top-k
    (r7 ADVICE)."""
    ev = d.cast_double_arr("embedding")
    lat_i = d.lateral_seq("1", d.size("ev"), "i")
    # outer index stops at d-1: sequence(i+1, d) must keep lo <= hi
    lat_i_cross = d.lateral_seq("1", f"{d.size('ev')} - 1", "i")
    lat_j = d.lateral_seq("i + 1", d.size("ev"), "j")
    xq = f"CAST(floor({d.elem('ev', 'i')} * {q}.0e0) AS BIGINT)"
    yq = f"CAST(floor({d.elem('ev', 'j')} * {q}.0e0) AS BIGINT)"
    xi = f"CAST(floor({d.elem('ev', 'i')} * {q}.0e0) AS BIGINT)"
    return f"""
WITH v0 AS (
  SELECT {ev} AS ev FROM embeddings
  WHERE embedding IS NOT NULL AND {d.size(d.cast_double_arr('embedding'))} >= 2
),
dim_m AS (
  SELECT i AS dim, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM (SELECT i, {xi} AS x FROM v0 {lat_i}) t
  GROUP BY i
),
cross_m AS (
  SELECT i AS dim_i, j AS dim_j, CAST(sum(x * y) AS BIGINT) AS sxy
  FROM (
    SELECT i, j, {xq} AS x, {yq} AS y
    FROM v0
    {lat_i_cross}
    {lat_j}
  ) t
  GROUP BY i, j
),
corr AS (
  SELECT c.dim_i, c.dim_j,
         (CAST(c.sxy AS DOUBLE) / a.n - (CAST(a.sx AS DOUBLE) / a.n) * (CAST(b.sx AS DOUBLE) / b.n))
         / nullif(sqrt((CAST(a.sxx AS DOUBLE) / a.n - (CAST(a.sx AS DOUBLE) / a.n) * (CAST(a.sx AS DOUBLE) / a.n))
              * (CAST(b.sxx AS DOUBLE) / b.n - (CAST(b.sx AS DOUBLE) / b.n) * (CAST(b.sx AS DOUBLE) / b.n))), 0.0e0)
         AS r
  FROM cross_m c
  JOIN dim_m a ON c.dim_i = a.dim
  JOIN dim_m b ON c.dim_j = b.dim
)
SELECT CAST(dim_i AS INT) AS dim_i, CAST(dim_j AS INT) AS dim_j,
       {d.trunc6('r')} AS corr, {d.trunc6('abs(r)')} AS abs_corr
FROM corr
WHERE r IS NOT NULL
ORDER BY abs(r) DESC, dim_i, dim_j
LIMIT {top_k}
""".strip()


# ---------------------------------------------------------------------------
# power-iteration PCA (top principal direction, integer lattice)
# ---------------------------------------------------------------------------

# Lattice constants shared by the Spark builder and the DuckDB oracle.
# Coordinates quantize to the 1/PCA_Q lattice (corr_audit discipline);
# the scatter matrix n*Sxy - Sx*Sy is re-scaled by PCA_CS to keep the
# matrix-vector products in BIGINT; eigenvector components live on the
# PCA_VS lattice with max-abs normalization each step.  Bounds (revised
# r12 after the sf1.0 tier caught the original analysis): for the store's
# unit-scaled embeddings (|x| <= 1) xq <= 2^16, so n*Sxy <= n^2*2^32
# needs n <= ~46k (guarded at 40k; shrink PCA_Q for bigger stores).  The
# iteration product w*VS = λ'*VS^2 is the WIDEST term (it overflowed at
# 20k rows, far before the scan-side bound) and runs in HUGEINT on the
# DuckDB oracle side / Python bigints on the engine side; the Spark SQL
# rendering of the unrolled chain keeps BIGINT and is parity-test-only.
PCA_Q = 65536
PCA_CS = 100_000_000
PCA_VS = 1_000_000
PCA_ITERS = 30


def _sgn_div(d: Dialect, x: str, m: str) -> str:
    """Truncating signed division via the non-negative idiv contract:
    sign(x) * (|x| div m) — identical in both engines regardless of their
    native negative-division rounding."""
    return (
        f"(CASE WHEN ({x}) >= 0 THEN {d.idiv(f'({x})', m)} "
        f"ELSE -({d.idiv(f'-({x})', m)}) END)"
    )


def pca_cte_base(d: Dialect) -> str:
    """Shared base CTEs for the PCA entry: integer-lattice first/second
    moments over every (i, j) dimension pair and the CS-rescaled scatter
    matrix ``cmat(i, j, c)`` (full symmetric d x d, BIGINT), plus the
    dimension universe and the matrix trace.

    ``cmat`` is referenced by every one of the k iterations; DuckDB must
    MATERIALIZE it (and its moment upstreams) or the d^2 x n explode
    re-runs per iteration — measured 12.5s -> ~1s at the sf0.01 gate.  The
    Spark engine path checkpoints cmat instead (pca_power_embeddings)."""
    mat = " MATERIALIZED" if d.name == "duck" else ""
    ev = d.cast_double_arr("embedding")
    lat_i = d.lateral_seq("1", d.size("ev"), "i")
    lat_j = d.lateral_seq("1", d.size("ev"), "j")
    xq = f"CAST(floor({d.elem('ev', 'i')} * {PCA_Q}.0e0) AS BIGINT)"
    yq = f"CAST(floor({d.elem('ev', 'j')} * {PCA_Q}.0e0) AS BIGINT)"
    scatter = "nn.n * m2.sxy - m1a.sx * m1b.sx"
    return f"""v0 AS{mat} (
  SELECT {ev} AS ev FROM embeddings
  WHERE embedding IS NOT NULL AND {d.size(d.cast_double_arr('embedding'))} >= 2
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v0),
m1 AS{mat} (
  SELECT i AS dim, CAST(sum(x) AS BIGINT) AS sx
  FROM (SELECT i, {xq} AS x FROM v0 {lat_i}) t
  GROUP BY i
),
m2 AS{mat} (
  SELECT i, j, CAST(sum(x * y) AS BIGINT) AS sxy
  FROM (
    SELECT i, j, {xq} AS x, {yq} AS y
    FROM v0
    {lat_i}
    {lat_j}
  ) t
  GROUP BY i, j
),
cmat AS{mat} (
  SELECT m2.i, m2.j,
         CAST({_sgn_div(d, scatter, str(PCA_CS))} AS BIGINT) AS c
  FROM m2
  JOIN m1 m1a ON m2.i = m1a.dim
  JOIN m1 m1b ON m2.j = m1b.dim
  CROSS JOIN nn
),
dims AS (SELECT dim FROM m1),
tr AS (SELECT CAST(sum(c) AS BIGINT) AS trace FROM cmat WHERE i = j)"""


def _pca_chain(d: Dialect, k: int = PCA_ITERS) -> str:
    """Unrolled power-iteration CTE chain ending in p{k} (dim, v) and
    mx{k} (the final normalizer scalar) — shared by the fit readout
    (gen_pca_power) and the projection (gen_pca_project)."""
    mat = " MATERIALIZED" if d.name == "duck" else ""
    parts = [pca_cte_base(d)]
    parts.append(f"p0 AS{mat} (SELECT dim, CAST({PCA_VS} AS BIGINT) AS v FROM dims)")
    for it in range(1, k + 1):
        prev = f"p{it - 1}"
        parts.append(
            f"""w{it} AS{mat} (
  SELECT cmat.i AS dim, CAST(sum(cmat.c * p.v) AS BIGINT) AS w
  FROM cmat JOIN {prev} p ON cmat.j = p.dim
  GROUP BY cmat.i
)"""
        )
        parts.append(
            f"""mx{it} AS (SELECT greatest(CAST(max(abs(w)) AS BIGINT), 1) AS m FROM w{it})"""
        )
        # w·VS is the chain's widest product (w ≈ λ'·VS, so this is
        # λ'·VS², past int64 once the rescaled eigenvalue tops ~9.2e6 —
        # the sf1.0 tier hit it at 20k rows, r12).  DuckDB widens to
        # HUGEINT (int128 — exact // division); the Spark RENDERING of
        # this chain keeps BIGINT and is test-only at small n (the Spark
        # ENGINE path is the Python-bigint loop, overflow-free).
        wv = f"CAST(w AS HUGEINT) * {PCA_VS}" if d.name == "duck" else f"w * {PCA_VS}"
        parts.append(
            f"""p{it} AS{mat} (
  SELECT dim, CAST({_sgn_div(d, wv, 'mx.m')} AS BIGINT) AS v
  FROM w{it} CROSS JOIN mx{it} mx
)"""
        )
    return ",\n".join(parts)


def gen_pca_power(d: Dialect, k: int = PCA_ITERS) -> str:
    """Top principal direction of the embedding store via ``k`` unrolled
    power-iteration steps on the integer-lattice scatter matrix — the
    whitening/compression decision readout that gen_corr_audit's pairwise
    correlations motivate: ONE direction that explains the largest
    variance share, plus that share.

    Determinism (the events_pagerank discipline): the scatter matrix is
    exact BIGINT (n*Sxy - Sx*Sy on the PCA_Q lattice, truncating-rescaled
    by PCA_CS), the iterate lives on the PCA_VS lattice with max-abs
    normalization (the max component is exactly +/-PCA_VS each step, so
    the eigenvalue falls out of the normalizer scalar), and every division
    is the sign-split truncating idiv — hash-exact across engines, where
    a float power iteration would drift by summation order.

    Output: one row per dimension with the loading (scaled BIGINT and
    trunc6 double) and the constant top-eigenvalue variance share
    ``top_eig_share`` = m / (VS * trace).

    DuckDB materializes each iteration CTE; the Spark engine path is
    :func:`pca_power_embeddings` (distributed python loop, per-step
    checkpoint).  This generator is the ORACLE formulation.

    100 TB shape (engine path): the moment pass is the only corpus scan —
    d^2-keyed partial-combining aggregates; each iteration then works on
    d- and d^2-row relations with one O(1) normalizer scalar on the
    driver.  The d x (d+1)/2 blowup of the moment explode is the same
    irreducible Gram cost gen_corr_audit pays.
    """
    chain = _pca_chain(d, k)
    share = d.trunc6(
        f"CAST(mx.m AS DOUBLE) / {PCA_VS}.0e0 / CAST(greatest(tr.trace, 1) AS DOUBLE)"
    )
    loading = d.trunc6(f"CAST(p.v AS DOUBLE) / {PCA_VS}.0e0")
    return f"""
WITH {chain}
SELECT CAST(p.dim AS INT) AS dim, p.v AS loading_scaled,
       {loading} AS loading, {share} AS top_eig_share
FROM p{k} p CROSS JOIN mx{k} mx CROSS JOIN tr
ORDER BY dim
""".strip()


def _pca_fit(spark, k: int = PCA_ITERS):
    """Shared fit loop for the PCA entries: one distributed moment pass
    builds the d^2 BIGINT scatter matrix — bounded MODEL STATE (d =
    embedding width) regardless of corpus size, the k-means-centroid
    contract — then the k power steps run on the driver in exact Python
    integers (arbitrary precision ⊇ BIGINT; // on non-negatives ==
    truncating div) instead of paying k tiny-job round-trips.  The
    oracle's unrolled relational chain is the shape this loop would take
    if d ever outgrew the driver.  Returns (v: dim->scaled loading, m:
    final normalizer, trace) or None on an empty store."""
    from storage_crawler_spark.plans.dialect import SPARK

    base = pca_cte_base(SPARK)
    rows = spark.sql(
        f"WITH {base} SELECT c.i, c.j, c.c, tr.trace, nn.n "
        f"FROM cmat c CROSS JOIN tr CROSS JOIN nn"
    ).collect()
    if not rows:
        return None
    # Runtime guard for the BIGINT-overflow precondition (see the
    # lattice-constant comment above PCA_Q).  TIGHTENED r12: the sf1.0
    # tier showed the binding surface is the scatter product n·Sxy ≤
    # n²·PCA_Q²·max|x|² — for unit-scaled embeddings (|x| ≤ 1, the store's
    # contract) that caps n at ~46k, NOT the 3e5 the r9 note claimed (that
    # figure ignored the square).  The iteration's w·VS product overflowed
    # even earlier (λ'·VS² at 20k rows) and is now HUGEINT on the oracle
    # side / Python-bigint here — the scan-side scatter is the remaining
    # int64 surface.  Fail loudly; bigger stores shrink PCA_Q.
    n_rows = int(rows[0][4])
    if n_rows > 40_000:
        raise ValueError(
            f"PCA lattice overflow precondition violated: {n_rows} embedding "
            f"rows > 40000 supported at PCA_Q={PCA_Q} for |x| <= 1; shrink "
            f"PCA_Q (scatter term n*sxy no longer fits BIGINT)"
        )
    trace = rows[0][3]
    VS = PCA_VS
    by_i: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        by_i.setdefault(int(r[0]), []).append((int(r[1]), int(r[2])))
    v = {i: VS for i in by_i}
    m = 1
    for _ in range(k):
        w = {i: sum(c * v[j] for j, c in cols) for i, cols in by_i.items()}
        m = max(max(abs(x) for x in w.values()), 1)
        v = {
            dim: (x * VS) // m if x >= 0 else -((-x * VS) // m)
            for dim, x in w.items()
        }
    return v, m, trace


def pca_power_embeddings(spark, k: int = PCA_ITERS):
    """Spark engine path for :func:`gen_pca_power`: one distributed moment
    pass builds the BIGINT scatter matrix (persisted), then ``k`` exact
    integer power-iteration steps over d/d^2-row relations, checkpointing
    each; driver state is the max-abs normalizer scalar per step (O(k)
    1-row collects, the k-means/PageRank contract)."""
    from pyspark.sql import functions as F

    from storage_crawler_spark.plans.dialect import SPARK

    fit = _pca_fit(spark, k)
    if fit is None:
        return spark.sql(
            "SELECT CAST(NULL AS INT) AS dim, CAST(NULL AS BIGINT) AS loading_scaled, "
            "CAST(NULL AS DOUBLE) AS loading, CAST(NULL AS DOUBLE) AS top_eig_share "
            "WHERE 1 = 0"
        )
    v, m, trace = fit
    VS = PCA_VS
    tr = max(int(trace or 0), 1)
    out = spark.createDataFrame(sorted(v.items()), "dim BIGINT, v BIGINT")
    out.createOrReplaceTempView("_pca_final")
    share = SPARK.trunc6(f"CAST({m} AS DOUBLE) / {VS}.0e0 / CAST({tr} AS DOUBLE)")
    loading = SPARK.trunc6(f"CAST(v AS DOUBLE) / {VS}.0e0")
    return spark.sql(
        f"""
SELECT CAST(dim AS INT) AS dim, v AS loading_scaled,
       {loading} AS loading, {share} AS top_eig_share
FROM _pca_final
ORDER BY dim
""".strip()
    )


def gen_pca_project(d: Dialect, k: int = PCA_ITERS) -> str:
    """APPLY step of the PCA entry: project every embedding onto the
    learned top principal direction and report per-label score
    statistics — does the dominant variance direction separate the
    labels?  (The readout that decides whether 1-D PCA compression keeps
    the label structure, closing fit -> apply the way text_bpe_encode
    closes it for the tokenizer.)

    Scores are EXACT BIGINTs: sum_j floor(x_j * Q) * v_j with the
    integer loading vector — per-vector products bounded by
    d * 2^19 * VS ~ 3.4e13 at d=64, far inside BIGINT — so per-label
    sum/min/max are exact and the normalized doubles divide exact
    integers by constants (no order-dependent float sums).

    Oracle formulation: the unrolled fit chain feeds a relational
    projection (explode -> equi-join on dim -> per-vector sum, all
    partial-combining).  The Spark engine path inlines the fitted vector
    as a literal array so projection is a pure map over the scan —
    see :func:`pca_project_embeddings`.
    """
    chain = _pca_chain(d, k)
    ev = d.cast_double_arr("embedding")
    lat_i = d.lateral_seq("1", d.size("ev"), "i")
    xq = f"CAST(floor({d.elem('ev', 'i')} * {PCA_Q}.0e0) AS BIGINT)"
    denom = f"({PCA_Q}.0e0 * {PCA_VS}.0e0)"
    return f"""
WITH {chain},
vlab AS (
  SELECT vec_id, label, {ev} AS ev FROM embeddings
  WHERE embedding IS NOT NULL AND {d.size(d.cast_double_arr('embedding'))} >= 2
),
comps AS (
  SELECT vec_id, label, i, {xq} AS xq FROM vlab {lat_i}
),
scores AS (
  SELECT c.vec_id, c.label, CAST(sum(c.xq * p.v) AS BIGINT) AS s
  FROM comps c JOIN p{k} p ON c.i = p.dim
  GROUP BY c.vec_id, c.label
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       {d.trunc6(f"CAST(sum(s) AS DOUBLE) / count(*) / {denom}")} AS mean_score,
       {d.trunc6(f"CAST(min(s) AS DOUBLE) / {denom}")} AS min_score,
       {d.trunc6(f"CAST(max(s) AS DOUBLE) / {denom}")} AS max_score
FROM scores
GROUP BY label
ORDER BY label
""".strip()


def pca_project_embeddings(spark, k: int = PCA_ITERS):
    """Spark engine path for :func:`gen_pca_project`: fit via the shared
    driver loop, then inline the d-element integer loading vector as a
    LITERAL SQL array so the projection is a single map-side fold inside
    the scan stage — no join, no explode; one partial-combining per-label
    aggregate is the only shuffle.  The apply pass never touches the
    scatter matrix again: exactly how a 100 TB store would score
    embeddings against a trained direction shipped with the job."""
    from storage_crawler_spark.plans.dialect import SPARK

    fit = _pca_fit(spark, k)
    if fit is None:
        return spark.sql(
            "SELECT CAST(NULL AS INT) AS label, CAST(NULL AS BIGINT) AS n_vecs, "
            "CAST(NULL AS DOUBLE) AS mean_score, CAST(NULL AS DOUBLE) AS min_score, "
            "CAST(NULL AS DOUBLE) AS max_score WHERE 1 = 0"
        )
    v, _, _ = fit
    varr = "array(" + ", ".join(f"CAST({v[i]} AS BIGINT)" for i in sorted(v)) + ")"
    d = SPARK
    ev = d.cast_double_arr("embedding")
    xq = f"CAST(floor({d.elem('ev', 'i')} * {PCA_Q}.0e0) AS BIGINT)"
    # fold bound = min(vector length, direction length): a ragged vector's
    # extra dims drop, matching the oracle's inner join on dim
    score = (
        f"aggregate(sequence(1, least({d.size('ev')}, {len(v)})), CAST(0 AS BIGINT), "
        f"(acc, i) -> acc + {xq} * element_at(vload, i))"
    )
    denom = f"({PCA_Q}.0e0 * {PCA_VS}.0e0)"
    return spark.sql(
        f"""
WITH vlab AS (
  SELECT label, {ev} AS ev, {varr} AS vload FROM embeddings
  WHERE embedding IS NOT NULL AND {d.size(d.cast_double_arr('embedding'))} >= 2
),
scores AS (
  SELECT label, CAST({score} AS BIGINT) AS s FROM vlab
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       {d.trunc6(f"CAST(sum(s) AS DOUBLE) / count(*) / {denom}")} AS mean_score,
       {d.trunc6(f"CAST(min(s) AS DOUBLE) / {denom}")} AS min_score,
       {d.trunc6(f"CAST(max(s) AS DOUBLE) / {denom}")} AS max_score
FROM scores
GROUP BY label
ORDER BY label
""".strip()
    )


def gen_crosslingual_dups(d: Dialect, threshold: float = 0.35) -> str:
    """Cross-lingual near-duplicate matrix: embedding near-dup pairs
    (cosine >= ``threshold``, sign-bucket candidates) joined back to the
    documents' languages, aggregated per unordered language pair — the
    translated-mirror detector (the same article crawled in two languages
    defeats every text-level dedup but sits adjacent in a multilingual
    embedding space; the diagonal cells are ordinary same-language dups
    for contrast).

    Engine parity: the pair mean cosine goes through the integer lattice
    (floor(cos*1e6) summed as exact BIGINTs, divided once at the end) —
    avg() over floats is partial-sum-order dependent in Spark and would
    drift.  100 TB shape: sign-bucket LSH bounds the pair join exactly as
    the dedup tier (no all-pairs); the lang lookup is two broadcastable
    equi-joins on doc id; the final matrix is a tiny aggregate.
    """
    cos = f"({d.dot('a.ev', 'b.ev')}) / (a.nrm * b.nrm)"
    avg6 = d.trunc6("CAST(sum(ci) AS DOUBLE) / count(*) / 1000000.0e0")
    return f"""
WITH {_norm_cte(d, with_bucket=True)},
pr AS (
  SELECT a.vec_id AS ai, b.vec_id AS bi,
         CAST(floor(({cos}) * 1000000) AS BIGINT) AS ci
  FROM v a JOIN v b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
  WHERE ({cos}) >= {threshold}
),
lp AS (
  SELECT LEAST(da.lang, db.lang) AS lang_a,
         GREATEST(da.lang, db.lang) AS lang_b,
         pr.ci
  FROM pr
  JOIN documents da ON pr.ai = da.doc_id
  JOIN documents db ON pr.bi = db.doc_id
  WHERE da.lang IS NOT NULL AND db.lang IS NOT NULL
)
SELECT lang_a, lang_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       {avg6} AS mean_cosine
FROM lp
GROUP BY lang_a, lang_b
ORDER BY lang_a, lang_b
""".strip()


# ---------------------------------------------------------------------------
# batched exact kNN via integer-lattice GEMM (Arrow/numpy hot path)
# ---------------------------------------------------------------------------

KNN_Q = 65536  # quantization lattice: xq = floor(x * 2^16), exact in int64


def _knn_lattice_sql(d: Dialect) -> str:
    """(vec_id, qarr BIGINT-array) lattice projection of the embedding
    store — the shared input of the GEMM builder and its SQL oracle."""
    ev = d.cast_double_arr("embedding")
    q = d.transform("ev", "x", f"CAST(floor(x * {KNN_Q}.0e0) AS BIGINT)")
    return (
        f"SELECT vec_id, {q} AS qarr FROM "
        f"(SELECT vec_id, {ev} AS ev FROM embeddings WHERE embedding IS NOT NULL) t"
    )


def gen_batch_knn_oracle(d: Dialect, query_ids: tuple[int, ...] = (0, 1, 2, 3), k: int = 5) -> str:
    """Oracle form of the batched kNN: per query id, the top-``k`` OTHER
    vectors by exact integer-lattice dot product (floor-quantized to the
    1/2^16 lattice; |x| < 8 keeps every product sum under 2^44 — exact in
    BIGINT and in the builder's int64 GEMM alike), ties on vec_id.  The
    per-query rank window partitions on qid (bounded |Q| partitions)."""
    ids = ", ".join(f"({i})" for i in query_ids)
    dot = d.reduce_bigint(d.zip_mul("e.qarr", "q.qarr"), "acc + CAST(x AS BIGINT)")
    return f"""
WITH base AS ({_knn_lattice_sql(d)}),
qrel AS (
  SELECT base.vec_id AS qid, base.qarr
  FROM base JOIN (VALUES {ids}) AS qv(qid) ON base.vec_id = qv.qid
),
dots AS (
  SELECT q.qid, e.vec_id, CAST({dot} AS BIGINT) AS dot
  FROM base e CROSS JOIN qrel q
  WHERE e.vec_id <> q.qid
)
SELECT qid, vec_id, dot, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT qid, vec_id, dot,
         row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id) AS rn
  FROM dots
) r
WHERE rn <= {k}
ORDER BY qid, rank
""".strip()


def batch_knn_gemm(spark, query_ids: tuple[int, ...] = (0, 1, 2, 3), k: int = 5):
    """Spark engine path: batched exact kNN as an Arrow-vectorized integer
    GEMM — the way brute-force similarity actually runs at scale (one
    BLAS-shaped matmul per Arrow batch against the broadcast query block,
    NOT one SQL fold per pair).

    Stages: (1) lattice-quantize in SQL (map-only); (2) collect the |Q|
    query rows — bounded MODEL state, the k-means-centroid contract;
    (3) ``mapInPandas``: per Arrow batch, an int64 ``numpy`` matmul
    (batch × dim) @ (dim × |Q|) — exact integer arithmetic, so the result
    is bit-identical to the oracle's per-pair folds regardless of
    summation order — followed by a per-batch top-``k`` per query
    (lexsort on (-dot, vec_id)), emitting ≤ |Q|·k candidate rows per
    batch; (4) a per-qid rank window over the ≤ |Q|·k·n_batches candidate
    relation picks the global top-``k`` (partitioned window, bounded
    input).  Total shuffle: the candidate relation only.

    Reference parity anchor: the reference engine has no vector tier at
    all; this is the beyond-reference similarity-search plane
    (SURVEY.md §2.9b) exercising the Arrow/pandas hot path.
    """
    import numpy as np

    from pyspark.sql import functions as F

    from storage_crawler_spark.plans.dialect import SPARK

    base = spark.sql(_knn_lattice_sql(SPARK))
    qrows = (
        base.filter(F.col("vec_id").isin(*[int(i) for i in query_ids]))
        .orderBy("vec_id")
        .collect()
    )
    if not qrows:
        return spark.createDataFrame([], "qid long, vec_id long, dot long, rank long")
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    qmat = np.array([list(r.qarr) for r in qrows], dtype=np.int64)  # |Q| x D

    def topk_per_batch(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            vids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(pdf["qarr"].tolist(), dtype=np.int64)  # n x D
            dots = mat @ qmat.T  # n x |Q| exact int64
            out_q, out_v, out_d = [], [], []
            for qi in range(len(qids)):
                col = dots[:, qi]
                mask = vids != qids[qi]  # never match a query to itself
                mv, mc = vids[mask], col[mask]
                if mv.size == 0:
                    continue
                take = min(k, mv.size)
                # ties on dot break by vec_id ASC — same order as the oracle
                idx = np.lexsort((mv, -mc))[:take]
                out_q.extend([qids[qi]] * take)
                out_v.extend(mv[idx])
                out_d.extend(mc[idx])
            yield pd.DataFrame({"qid": out_q, "vec_id": out_v, "dot": out_d})

    cand = base.mapInPandas(topk_per_batch, "qid long, vec_id long, dot long")
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "dot", F.col("rank").cast("long").alias("rank"))
        .orderBy("qid", "rank")
    )


MMR_Q = 1_000_000  # cosine lattice: floor(cos * Q) spans ~[-Q, Q], exact BIGINT


def _mmr_prep_ctes(d: Dialect, query_vec_id: int, pool_n: int) -> list[str]:
    """CTE parts for the MMR prep relations: ``pool`` (the top-``pool_n``
    cosine candidates with relevance on the floor(cos·MMR_Q) BIGINT
    lattice, plus ev/nrm for pair math) and ``pairs`` (all ordered
    candidate pairs with the lattice pairwise similarity — ≤ pool_n²
    rows).  Only the pool build touches the store: one map-only cosine
    scan into ORDER BY/LIMIT (TakeOrderedAndProject — partial top-k per
    partition, no window); pairs is a self-join of the ``pool_n``-row
    relation."""
    mat = " MATERIALIZED" if d.name == "duck" else ""
    cos_q = f"({d.dot('e.ev', 'q.ev')}) / (e.nrm * q.nrm)"
    cos_ab = f"({d.dot('a.ev', 'b.ev')}) / (a.nrm * b.nrm)"
    return [
        _norm_cte(d),
        f"q AS (SELECT ev, nrm FROM v WHERE vec_id = {query_vec_id})",
        f"""pool AS{mat} (
  SELECT e.vec_id, e.ev, e.nrm,
         CAST(floor(({cos_q}) * {MMR_Q}.0e0) AS BIGINT) AS relq
  FROM v e CROSS JOIN q
  WHERE e.vec_id <> {query_vec_id}
  ORDER BY {cos_q} DESC, e.vec_id LIMIT {pool_n}
)""",
        f"""pairs AS{mat} (
  SELECT a.vec_id AS ai, b.vec_id AS bi,
         CAST(floor(({cos_ab}) * {MMR_Q}.0e0) AS BIGINT) AS simq
  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
)""",
    ]


def _mmr_check(pool_n: int, k: int, lam_tenths: int) -> None:
    if not 0 <= lam_tenths <= 10:
        raise ValueError("lam_tenths must be in [0, 10]")
    if k < 1 or pool_n < k:
        raise ValueError("need 1 <= k <= pool_n")


def gen_mmr_rerank(
    d: Dialect,
    query_vec_id: int = 0,
    pool_n: int = 20,
    k: int = 8,
    lam_tenths: int = 7,
) -> str:
    """Maximal-Marginal-Relevance diversity re-rank (Carbonell & Goldstein
    1998): from the top-``pool_n`` cosine candidates of ``query_vec_id``,
    greedily pick ``k`` docs maximizing λ·rel(d) − (1−λ)·max_{s∈S} sim(d,s)
    — the de-duplicating retrieval stage a RAG / training-data sampler
    runs so the selected set isn't ``k`` near-copies of the best hit.

    Every selection compares on an exact BIGINT lattice — rel and
    pairwise sims quantized to floor(cos·MMR_Q), λ as ``lam_tenths``/10
    so the marginal is the exact integer lam·relq − (10−lam)·msq — ties
    broken by vec_id, so the pick sequence is engine-identical even
    where raw cosines tie to the last ulp.  Rank-1's marginal is the
    pure relevance term (empty selected set).  Short pools degrade
    gracefully: the output is min(k, |pool|) rows, ranks consecutive.

    This chain is the ORACLE formulation (kmeans_lattice_ctes
    discipline): the greedy recursion unrolls into k selection CTEs,
    each referencing the previous selected-set relation three times —
    DuckDB MATERIALIZED hints keep that linear, but Spark inlines CTEs,
    so the analyzed plan would grow 3^k-fold (observed: analysis-time
    OOM at k=8).  The Spark engine path is :func:`mmr_rerank`, which
    runs the SAME prep SQL and the SAME integer recursion over the
    collected ≤ pool_n-row model state.
    """
    _mmr_check(pool_n, k, lam_tenths)
    lam, mu = lam_tenths, 10 - lam_tenths
    mat = " MATERIALIZED" if d.name == "duck" else ""
    parts = _mmr_prep_ctes(d, query_vec_id, pool_n)
    parts.append(
        f"""s1 AS{mat} (
  SELECT vec_id, relq, CAST(1 AS BIGINT) AS rank,
         CAST({lam} * relq AS BIGINT) AS marg
  FROM pool ORDER BY relq DESC, vec_id LIMIT 1
)"""
    )
    for t in range(2, k + 1):
        p = t - 1
        parts.append(
            f"""c{t} AS (
  SELECT c.vec_id, c.relq, max(p.simq) AS msq
  FROM pool c
  JOIN pairs p ON p.ai = c.vec_id
  JOIN s{p} sl ON p.bi = sl.vec_id
  WHERE c.vec_id NOT IN (SELECT vec_id FROM s{p})
  GROUP BY c.vec_id, c.relq
)"""
        )
        parts.append(
            f"""pk{t} AS (
  SELECT vec_id, relq, CAST({t} AS BIGINT) AS rank,
         CAST({lam} * relq - {mu} * msq AS BIGINT) AS marg
  FROM c{t} ORDER BY {lam} * relq - {mu} * msq DESC, vec_id LIMIT 1
)"""
        )
        parts.append(
            f"""s{t} AS{mat} (
  SELECT vec_id, relq, rank, marg FROM s{p}
  UNION ALL
  SELECT vec_id, relq, rank, marg FROM pk{t}
)"""
        )
    ctes = ",\n".join(parts)
    rel = f"(CAST(relq AS DOUBLE) / {MMR_Q})"
    score = f"(CAST(marg AS DOUBLE) / ({MMR_Q}.0e0 * 10))"
    return f"""WITH {ctes}
SELECT rank, vec_id AS doc_id, {d.trunc6(rel)} AS relevance,
       {d.trunc6(score)} AS mmr_score
FROM s{k}
ORDER BY rank
""".strip()


def mmr_greedy(
    pool: list[tuple[int, int]],
    pairs: dict[tuple[int, int], int],
    k: int,
    lam_tenths: int,
) -> list[tuple[int, int, int, int]]:
    """The exact-integer greedy over collected (vec_id, relq) pool rows
    and {(ai, bi): simq} pair sims — the recursion the oracle chain
    unrolls, shared so the engine path and any test reference agree by
    construction.  Returns [(rank, vec_id, relq, marg)]."""
    lam, mu = lam_tenths, 10 - lam_tenths
    if not pool:
        return []
    first = max(pool, key=lambda r: (r[1], -r[0]))
    out = [(1, first[0], first[1], lam * first[1])]
    sel = {first[0]}
    for t in range(2, k + 1):
        best = None
        for vid, relq in pool:
            if vid in sel:
                continue
            msq = max(pairs[(vid, s)] for s in sel)
            marg = lam * relq - mu * msq
            key = (-marg, vid)
            if best is None or key < best[0]:
                best = (key, vid, relq, marg)
        if best is None:
            break
        out.append((t, best[1], best[2], best[3]))
        sel.add(best[1])
    return out


def mmr_rerank(
    spark,
    sf_dir: str,
    query_vec_id: int = 0,
    pool_n: int = 20,
    k: int = 8,
    lam_tenths: int = 7,
):
    """Engine path for the MMR re-rank: Spark executes the prep SQL (the
    cosine top-``pool_n`` scan and the pool self-join — everything that
    touches the embedding store), the driver collects the ≤ pool_n-row
    lattice relations (bounded MODEL state, kmeans_fit_lattice
    discipline — never corpus-scale), and :func:`mmr_greedy` runs the
    exact integer recursion.  Bit-identical to :func:`gen_mmr_rerank`'s
    unrolled chain because both consume the same lattice ints."""
    from storage_crawler_spark.plans import views as V
    from storage_crawler_spark.plans.dialect import SPARK as _SP

    _mmr_check(pool_n, k, lam_tenths)
    V.register_base_tables(spark, sf_dir, ("embeddings",))
    ctes = ",\n".join(_mmr_prep_ctes(_SP, query_vec_id, pool_n))
    prep = spark.sql(
        f"""WITH {ctes},
pr AS (SELECT ai, bi, simq FROM pairs)
SELECT p.vec_id, p.relq, pr.bi, pr.simq
FROM pool p LEFT JOIN pr ON pr.ai = p.vec_id"""
    ).collect()
    # bounded-model-state contract (r12): the pool prep is ≤ pool_n rows
    # plus the pool's pairwise sims — pool_n(pool_n+1) cells by the LIMIT
    # in the prep CTEs; assert it held (4-wide rows)
    check_model_state(4 * len(prep), "mmr_rerank (pool + pair sims)")
    if len(prep) > pool_n * (pool_n + 1):
        raise ValueError(
            f"mmr_rerank pool prep returned {len(prep)} rows for "
            f"pool_n={pool_n} — the prep LIMIT contract broke"
        )
    pool_rows = sorted({(r["vec_id"], r["relq"]) for r in prep})
    pair_sims = {
        (r["vec_id"], r["bi"]): r["simq"] for r in prep if r["bi"] is not None
    }
    picks = mmr_greedy(pool_rows, pair_sims, k, lam_tenths)
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("rank", T.LongType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("relevance", T.DoubleType()),
            T.StructField("mmr_score", T.DoubleType()),
        ]
    )
    import math

    def tr6(x: float) -> float:
        return math.floor(x * 1_000_000) / 1_000_000

    rows = [
        (rank, vid, tr6(relq / MMR_Q), tr6(marg / (MMR_Q * 10)))
        for rank, vid, relq, marg in picks
    ]
    return spark.createDataFrame(rows, schema)


MRL_Q = 1_000_000  # matryoshka prefix-distance lattice


def gen_mrl_lattice(d: Dialect) -> str:
    """(vec_id, qarr) floor(x*MRL_Q) BIGINT lattice projection of the
    embedding store — the shared input of every matryoshka ranking."""
    ev = "transform(embedding, x -> CAST(x AS DOUBLE))" if d.name == "spark" \
        else "CAST(embedding AS DOUBLE[])"
    qz = d.transform("ev", "x", f"CAST(floor(x * {MRL_Q}.0e0) AS BIGINT)")
    return (
        f"SELECT vec_id, {qz} AS qarr FROM "
        f"(SELECT vec_id, {ev} AS ev FROM embeddings "
        f" WHERE embedding IS NOT NULL AND {d.size(d.cast_double_arr('embedding'))} >= 1) t"
    )


def gen_matryoshka_audit(
    d: Dialect, query_vec_id: int = 0, k: int = 10,
    prefixes: tuple[int, ...] = (8, 16, 32),
    lat_rel: str | None = None,
) -> str:
    """Matryoshka-truncation quality audit (Kusupati et al. 2022: MRL
    embeddings are served at prefix dimensions to cut memory/latency):
    for each prefix length, the exact top-``k`` by PREFIX squared
    distance is compared against the full-dimension ranking — recall@k
    and top-1 agreement per prefix, the go/no-go table for choosing a
    serving dimension.

    Exact-integer discipline: distances fold on the floor(x·10⁶) BIGINT
    lattice with vec_id tie-breaks, so rankings are engine-identical; the
    single division (recall) is trunc6 on emission.  Vectors are aligned
    to the QUERY vector's dimension (scalar-subquery filter) so prefix
    slices never see ragged arrays.

    100 TB shape: one map-only lattice projection per ranking, each fused
    into TakeOrderedAndProject (k rows out); the per-prefix overlap joins
    touch k-row relations only.  The Spark builder passes a CHECKPOINTED
    ``lat_rel`` (PQ-path pattern) so the store is read once, not once per
    ranking; the inline form (the oracle) scans per ranking."""
    lat = gen_mrl_lattice(d)
    fold = lambda a, b: d.reduce_bigint(  # noqa: E731
        d.zip_sub_sq(a, b), "acc + CAST(x AS BIGINT)"
    )
    parts = [
        f"lat AS (SELECT * FROM {lat_rel})" if lat_rel else f"lat AS (\n{lat}\n)",
        f"q AS (SELECT qarr FROM lat WHERE vec_id = {query_vec_id})",
        # dimension alignment: only vectors with the query's dim rank
        f"v AS (SELECT l.vec_id, l.qarr FROM lat l CROSS JOIN q "
        f"WHERE l.vec_id <> {query_vec_id} AND {d.size('l.qarr')} = {d.size('q.qarr')})",
    ]
    rankings: list[tuple[str, str]] = []
    for p in prefixes:
        dist = fold(d.aslice("e.qarr", "1", str(p)), d.aslice("q.qarr", "1", str(p)))
        rankings.append((f"p{p}", str(p)))
        parts.append(
            f"""p{p} AS (
  SELECT vec_id, row_number() OVER (ORDER BY d2, vec_id) AS rn FROM (
    SELECT e.vec_id, {dist} AS d2
    FROM v e CROSS JOIN q
    ORDER BY d2, e.vec_id LIMIT {k}
  ) t
)"""
        )
    full = fold("e.qarr", "q.qarr")
    parts.append(
        f"""pfull AS (
  SELECT vec_id, row_number() OVER (ORDER BY d2, vec_id) AS rn FROM (
    SELECT e.vec_id, {full} AS d2
    FROM v e CROSS JOIN q
    ORDER BY d2, e.vec_id LIMIT {k}
  ) t
)"""
    )
    recall = d.trunc6(f"CAST(count(*) AS DOUBLE) / {k}.0e0")
    unions = "\nUNION ALL\n".join(
        f"""SELECT CAST({p} AS BIGINT) AS prefix_dim,
       CAST(count(*) AS BIGINT) AS overlap_k,
       {recall} AS recall_at_k,
       CAST(coalesce(max(CASE WHEN a.rn = 1 AND f.rn = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS top1_agree
FROM {rel} a JOIN pfull f ON a.vec_id = f.vec_id"""
        for rel, p in rankings
    )
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT * FROM (
{unions}
) audit
ORDER BY prefix_dim
""".strip()


def _sign_words(d: Dialect, arr: str = "ev") -> str:
    """Sign-bit packing of a double array into 32-bit words carried in
    BIGINTs — the binary-quantization code (1 bit/dim, 32x smaller than
    float32; Indyk & Motwani 1998 sign-random-projection family, here the
    identity-rotation variant: bit_i = (x_i > 0)).

    32 bits per word keeps every shift under the dialect ``shl`` contract
    (DuckDB raises on ``1 << 63``; a production kernel would use unsigned
    64-bit blocks — the plan shape is identical).  Zero components quantize
    to 0, matching the ±1 sign-vector convention used by the audit's
    sign-cosine (sign(0) = -1 contributes |0| = 0 either way).  Nested
    lambda: outer word index ``w`` captured inside the 32-bit fold — both
    engines support capture; fold order is fixed so words are identical
    bit patterns cross-engine.
    """
    dims = d.size(arr)
    hi = f"CAST({d.idiv(f'({dims} - 1)', '32')} AS INT)"
    step = (
        f"CASE WHEN w*32 + x < {dims} AND {d.elem(arr, 'w*32 + x + 1')} > 0 "
        f"THEN acc + {d.shl('CAST(1 AS BIGINT)', 'x')} ELSE acc END"
    )
    return d.transform(d.seq("0", hi), "w", d.reduce_bigint(d.seq("0", "31"), step))


def _words_hamming(d: Dialect, wa: str, wb: str) -> str:
    """Hamming distance between two equal-length packed-word arrays:
    per-word popcount(xor) folded to a BIGINT (index-zipped — the engines
    share no generic zip_with; the seq/elem form compiles to the same
    per-word loop)."""
    per = f"CAST({d.popcount(d.bxor(d.elem(wa, 'i'), d.elem(wb, 'i')))} AS BIGINT)"
    return d.reduce_bigint(d.transform(d.seq("1", d.size(wa)), "i", per), "acc + x")


def gen_binary_quant_audit(d: Dialect) -> str:
    """Per-label 1-bit (sign) quantization audit — the go/no-go gate before
    shipping a binary-code tier of a 100 TB vector store (32x smaller than
    float32, Hamming distance = SIMD popcount):

    - ``n_codes`` vs ``n_vecs``: code-collision rate.  Binary codes are
      lossy; distinct vectors collapsing onto one code is THE recall risk,
      surfaced per label rather than discovered in production.
    - ``mean_bit_density``: fraction of positive components.  Sign codes
      carry most information near density 0.5; a strongly biased embedding
      (all-positive ReLU outputs, say) makes Hamming nearly constant.
    - ``sign cosine`` = cos(x, sign(x)) = Σ|x_i| / (√dims · ‖x‖): how much
      of each vector's direction the 1-bit code retains (the binary
      analogue of int8's reconstruction error; ≈0.798 for Gaussian
      components by E|X|/√(E X²) = √(2/π)).

    Zero-norm (failed-embedding) rows are dropped by the shared ``nrm > 0``
    guard — cosine against them is undefined (the battery's all-zero row).

    100 TB shape: packing, popcount and the sign-cosine all fold inside the
    scan stage (map-only); the shuffle carries (label, code-string, scalars)
    into one aggregate — count(DISTINCT code) is the only expanding term
    and it is bounded by the corpus itself.  No joins.  The two means are
    order-free lattice means at p=12 (r14 determinism audit; both
    statistics live in [-1, 1]); min_sign_cos is order-free by algebra.
    """
    ev = d.cast_double_arr("embedding")
    sabs = d.fold_double(d.transform("ev", "x", "abs(x)"))
    popbits = d.reduce_bigint(
        d.transform("words", "u", f"CAST({d.popcount('u')} AS BIGINT)"), "acc + x"
    )
    code = d.ajoin(d.transform("words", "u", "CAST(u AS STRING)"), ",")
    return f"""
WITH v0 AS (
  SELECT vec_id, label, {ev} AS ev FROM embeddings WHERE embedding IS NOT NULL
),
v AS (
  SELECT vec_id, label, ev, sqrt({d.dot('ev', 'ev')}) AS nrm,
         CAST({d.size('ev')} AS BIGINT) AS dims
  FROM v0
),
p AS (
  SELECT vec_id, label, dims, nrm, {sabs} AS sum_abs, {_sign_words(d)} AS words
  FROM v WHERE nrm > 0
),
s AS (
  SELECT label, dims,
         CAST({popbits} AS DOUBLE) / dims AS bit_density,
         sum_abs / (sqrt(CAST(dims AS DOUBLE)) * nrm) AS sign_cos,
         {code} AS code
  FROM p
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(count(DISTINCT code) AS BIGINT) AS n_codes,
       {avg_lattice(d, 'bit_density', 12)} AS mean_bit_density,
       {avg_lattice(d, 'sign_cos', 12)} AS mean_sign_cos,
       {d.trunc6('min(sign_cos)')} AS min_sign_cos
FROM s
GROUP BY label
ORDER BY label
""".strip()


def gen_hamming_codes(d: Dialect) -> str:
    """The packed-code relation gen_hamming_topk serves from:
    (vec_id, label, ev, nrm, words) — one corpus pass pays the packing
    fold; every downstream ranking reads the codes.  This is the relation
    a production binary tier MATERIALIZES (the 32x-smaller code column);
    the Spark builder checkpoints it so the two rankings + the query row
    read it instead of re-deriving the fold per reference."""
    return f"""
WITH v0 AS (
  SELECT vec_id, label, {d.cast_double_arr('embedding')} AS ev
  FROM embeddings WHERE embedding IS NOT NULL
),
v1 AS (
  SELECT vec_id, label, ev, sqrt({d.dot('ev', 'ev')}) AS nrm FROM v0
)
SELECT vec_id, label, ev, nrm, {_sign_words(d)} AS words FROM v1 WHERE nrm > 0
""".strip()


def gen_hamming_topk(
    d: Dialect, query_vec_id: int = 0, k: int = 10, v_rel: str | None = None
) -> str:
    """Binary-code ANN serving probe: top-``k`` by Hamming distance between
    sign-bit packed codes (``_sign_words``), with the exact-cosine rerank
    column and ``exact_rank`` recall evidence inline (LEFT JOIN against the
    brute-force cosine top-k — misses surface as NULLs), completing the ANN
    plane's quantized-serving story beside IVF/PQ/RP-LSH.

    RP-LSH (gen_rp_lsh_topk) buckets by a FEW hyperplane bits to prune
    candidates; this is the other standard binary tier — keep ALL dims as
    bits, scan every code (popcount is memory-bandwidth speed), rerank the
    shortlist exactly.  At 100 TB the code column is 32x smaller than the
    vectors, the scan is map-only over packed BIGINTs ahead of
    TakeOrderedAndProject (per-partition top-k, tiny driver merge — no
    corpus shuffle), and only the k survivors touch float math.

    Ties: Hamming is integer-valued, so ties are common — (hamming, vec_id)
    ordering is deterministic in both engines; exact ranking uses the
    trunc6 cosine with the same vec_id break.
    """
    cos = d.trunc6(f"({d.dot('e.ev', 'q.ev')}) / (e.nrm * q.nrm)")
    v = v_rel or f"(\n{gen_hamming_codes(d)}\n)"
    return f"""
WITH v AS (SELECT vec_id, label, ev, nrm, words FROM {v} vv),
q AS (SELECT ev, nrm, words FROM v WHERE vec_id = {query_vec_id}),
cand AS (
  SELECT e.vec_id, e.label,
         {_words_hamming(d, 'e.words', 'q.words')} AS hamming,
         {cos} AS cosine
  FROM v e CROSS JOIN q
  WHERE e.vec_id <> {query_vec_id}
),
topk AS (
  SELECT vec_id, label, hamming, cosine FROM cand
  ORDER BY hamming, vec_id LIMIT {k}
),
exact AS (
  SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS exact_rank
  FROM (SELECT vec_id, cosine FROM cand ORDER BY cosine DESC, vec_id LIMIT {k}) t
)
SELECT t.vec_id, t.label, CAST(t.hamming AS INT) AS hamming, t.cosine,
       CAST(x.exact_rank AS INT) AS exact_rank
FROM topk t LEFT JOIN exact x ON t.vec_id = x.vec_id
ORDER BY t.hamming, t.vec_id
""".strip()


def gen_ivf_recall_curve(
    d: Dialect, query_vec_id: int = 0, ks: tuple = (1, 5, 10, 20)
) -> str:
    """Recall@k CURVE of the bucketed IVF tier against the exact ranking —
    the evaluation artifact every ANN system publishes (recall@1/5/10/...)
    and the generalization of gen_ivf_recall's single point: one row per
    k with the exact-list size, hit count, and recall, so the accuracy/
    candidate-budget tradeoff is a queryable relation rather than a
    number in prose.

    Ranking is EXACT and engine-identical: both lists rank on the
    floor(cos·10^6) BIGINT lattice with vec_id tie-breaks (the graph-ANN
    convention), never on rounded floats.  The denominator is the exact
    list's size at each k, so corpora smaller than max(k) degrade
    honestly instead of deflating recall.

    100 TB shape: ONE map-only scored scan feeds both ORDER BY+LIMIT
    branches (each fuses to TakeOrderedAndProject); all curve algebra
    runs on the two ≤max(k)-row ranked lists; the k-grid is a constant
    VALUES relation (allowlisted BNLJ, build ≤ |ks| rows)."""
    kmax = max(ks)
    grid = ", ".join(f"({k})" for k in sorted(ks))
    simq = (
        f"CAST(floor((({d.dot('e.ev', 'q.ev')}) / (e.nrm * q.nrm))"
        f" * 1000000.0e0) AS BIGINT)"
    )
    return f"""
WITH {_norm_cte(d, with_bucket=True)},
q AS (SELECT ev, nrm, bkt FROM v WHERE vec_id = {query_vec_id}),
scored AS (
  SELECT e.vec_id, {simq} AS simq,
         CASE WHEN e.bkt = q.bkt THEN 1 ELSE 0 END AS in_bucket
  FROM v e CROSS JOIN q
  WHERE e.vec_id <> {query_vec_id}
),
ex AS (
  SELECT vec_id, row_number() OVER (ORDER BY simq DESC, vec_id) AS rnk
  FROM (SELECT vec_id, simq FROM scored ORDER BY simq DESC, vec_id LIMIT {kmax}) t
),
iv AS (
  SELECT vec_id, row_number() OVER (ORDER BY simq DESC, vec_id) AS rnk
  FROM (
    SELECT vec_id, simq FROM scored WHERE in_bucket = 1
    ORDER BY simq DESC, vec_id LIMIT {kmax}
  ) t
)
SELECT g.k AS k,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(CASE WHEN i.rnk <= g.k THEN 1 END) AS BIGINT) AS n_hits,
       {d.trunc6('CAST(count(CASE WHEN i.rnk <= g.k THEN 1 END) AS DOUBLE) / count(*)')} AS recall
FROM (VALUES {grid}) AS g(k)
JOIN ex e ON e.rnk <= g.k
LEFT JOIN iv i ON i.vec_id = e.vec_id AND i.rnk <= g.k
GROUP BY g.k
ORDER BY g.k
""".strip()
