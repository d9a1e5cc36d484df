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


def gen_weighted_sample(d: Dialect, sample_size: int = 200, seed: str = "ws") -> str:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis 2006, public): each document draws a frozen
    md5-derived uniform u ∈ (0, 1] and competes with key ln(u)/w — the log
    of the classic u^(1/w) priority, same order, better conditioned — where
    w is the document's weight (length here; any positive quality column
    plugs in).  The global top-``sample_size`` by key IS an exact weighted
    sample: inclusion probability proportional to w, no replacement, no
    reservoir state.

    This is how a training pipeline samples a token-budgeted mixture
    ("take 10M docs, longer/higher-quality ones proportionally more
    often") reproducibly: u is a pure function of (seed, doc_id), so the
    sample is rerun-stable, engine-stable, and join-backable, unlike
    rand()/TABLESAMPLE.

    100 TB shape: map-only key computation (one md5 + one ln per row
    inside codegen), and the ORDER BY+LIMIT fuses to
    TakeOrderedAndProject — per-partition top-k then a driver merge of
    ``sample_size`` rows; no global sort, no shuffle of the corpus.
    Cross-engine note: ln differs from libm-to-JVM by ≤1 ulp, which could
    in principle flip a rank between keys closer than ~1e-15 — md5-spread
    keys make that measure-zero (the randomized battery sweeps it).
    """
    u = f"(CAST({d.md5_key48('doc_id', seed)} AS DOUBLE) + 1.0) / 281474976710656.0"
    return f"""
SELECT doc_id, lang, w, {d.trunc6('es_key')} AS sample_key
FROM (
  SELECT doc_id, lang, w, ln(u) / w AS es_key
  FROM (
    SELECT doc_id, lang,
           CAST(greatest(length(text), 1) AS DOUBLE) AS w,
           {u} AS u
    FROM documents
    WHERE text IS NOT NULL
  ) t0
) t1
ORDER BY es_key DESC, doc_id
LIMIT {sample_size}
""".strip()


def gen_shard_plan(d: Dialect, n_shards: int = 16, seed: str = "shard") -> str:
    """Deterministic training-shard layout: every document gets a frozen
    (shard_id, shard_pos) — shard by md5 bucket, position by md5 order
    within the shard — so the materialized corpus (one file per shard,
    sorted by shard_pos) is a reproducible global shuffle: same corpus in,
    bit-identical shard files out, on any cluster size.  This is the
    export step after filter/dedup/sample: training jobs stream shards
    sequentially and get a fixed, engine-independent example order
    (rand()-based shuffles can't promise any of this).

    100 TB shape: the md5 keys are map-only; one shuffle on shard_id and a
    per-shard sort — exactly the write pattern of
    ``df.repartition(n, shard_id).sortWithinPartitions(...)``, which is
    how the companion writer materializes it (one sorted file per shard,
    no global sort).  Per-shard rank uses the same two-phase escape hatch
    as every other big window in this repo if a shard outgrows one task.
    """
    key = d.md5_key48("doc_id", seed)
    return f"""
SELECT doc_id, shard_id,
       row_number() OVER (PARTITION BY shard_id ORDER BY shuffle_key, doc_id) AS shard_pos
FROM (
  SELECT doc_id, CAST({key} % {n_shards} AS INT) AS shard_id,
         {key} AS shuffle_key
  FROM documents
) t
""".strip()


def write_shards(df, path: str, n_shards: int = 16, seed: str = "shard"):
    """Materialize the :func:`gen_shard_plan` layout: one sorted parquet
    file per shard under ``path/shard_id=N/``.  ``df`` must carry
    ``doc_id``; all other columns ride along as the payload.

    ``repartition(n_shards, shard_id)`` routes every row of a shard to
    exactly ONE task (hash collisions merely co-locate two shards in one
    task — the writer's partitionBy still splits them into separate
    files), and ``sortWithinPartitions`` makes each file internally
    ordered by the frozen shuffle key: one shuffle + per-task sort, no
    global sort, bit-identical files on any cluster size.
    """
    from pyspark.sql import functions as F

    key = F.expr(
        f"CAST(conv(substr(md5(encode(concat('{seed}', doc_id), 'utf-8')), 1, 12), 16, 10) AS BIGINT)"
    )
    keyed = df.withColumn("__shuffle_key", key).withColumn(
        "shard_id", (F.col("__shuffle_key") % n_shards).cast("int")
    )
    (
        keyed.repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "__shuffle_key", "doc_id")
        .drop("__shuffle_key")
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .parquet(path)
    )


def gen_neyman_allocation(d: Dialect, budget: int = 1000) -> str:
    """Neyman-optimal stratified sample allocation: per language stratum,
    the sample count minimizing estimator variance for a fixed ``budget``
    — allocation_i ∝ N_i·σ_i (big AND internally-varied strata get more
    draws), the statistically-correct upgrade over the proportional split
    the fixed-size sampler uses.

    Engine exactness: per-stratum moments are exact integer Σlen and
    Σlen² (the rate-anomaly convention); σ via IEEE-correctly-rounded
    sqrt on identical doubles; allocations floored.  The ``sd = 0``
    degenerate stratum (all docs the same length) allocates 0 — callers
    sampling it anyway take 1 doc, which is also the statistically right
    answer (zero within-stratum variance).

    One partial-combining aggregate + a 1-row total broadcast.
    """
    sd = "sqrt((sum_sq - CAST(sum_len AS DOUBLE) * sum_len / n_docs) / n_docs)"
    return f"""
WITH m AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS sum_len,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS sum_sq
  FROM documents
  GROUP BY lang
),
w AS (SELECT lang, n_docs, {sd} AS sd, n_docs * ({sd}) AS wgt FROM m),
tot AS (SELECT sum(wgt) AS total_wgt FROM w)
SELECT w.lang AS lang, w.n_docs AS n_docs,
       {d.trunc6('w.sd')} AS stratum_sd,
       CAST(floor({budget} * w.wgt / t.total_wgt) AS BIGINT) AS alloc_n
FROM w CROSS JOIN tot t
ORDER BY lang
""".strip()


def gen_shard_balance(d: Dialect, n_shards: int = 16, seed: str = "shard") -> str:
    """Per-shard load audit of the :func:`gen_shard_plan` layout: docs and
    characters per shard plus each shard's load ratio vs the uniform ideal
    — the check that the frozen md5 sharding actually balanced the corpus
    (a skewed shard becomes the long-pole training-reader at scale).

    Uses the IDENTICAL md5 bucket expression as the plan (same seed), so
    it audits the real layout, not a restatement.  One partial-combining
    aggregate on shard_id (the n_shards-row relation), one 1-row total
    broadcast; the all-empty-corpus edge (total 0 chars) yields NULL
    ratios rather than a divide-by-zero (Spark ANSI would throw).  The
    load_ratio denominator is the CONFIGURED ``n_shards`` (the uniform
    ideal over the full layout), not the count of populated shards —
    empty shards on a tiny corpus correctly inflate the survivors'
    ratios above 1.
    """
    key = d.md5_key48("doc_id", seed)
    return f"""
WITH s AS (
  SELECT CAST({key} % {n_shards} AS INT) AS shard_id,
         CAST(coalesce(n_chars, 0) AS BIGINT) AS chars
  FROM documents
),
per AS (
  SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(chars) AS BIGINT) AS sum_chars
  FROM s GROUP BY shard_id
),
tot AS (
  SELECT CAST(sum(sum_chars) AS BIGINT) AS tot_chars,
         CAST({n_shards} AS BIGINT) AS n_shards
  FROM per
)
SELECT per.shard_id, per.n_docs, per.sum_chars,
       CASE WHEN tot.tot_chars = 0 THEN NULL
            ELSE {d.trunc6('CAST(per.sum_chars AS DOUBLE) * tot.n_shards / tot.tot_chars')}
       END AS load_ratio
FROM per CROSS JOIN tot
ORDER BY per.shard_id
""".strip()


def gen_bootstrap_ci(d: Dialect, n_reps: int = 32, seed: str = "boot") -> str:
    """Poisson-bootstrap uncertainty for the corpus mean document length:
    ``n_reps`` resample replicas, each re-weighting every document by a
    Poisson(1) draw, yielding a standard error and a min/max replica band
    around the point estimate — the production bootstrap (Poisson weights
    need no global resample index, so each replica is one weighted
    aggregate over the same scan; the canonical trick for resampling at
    100 TB where a true multinomial resample would need a global shuffle).

    Determinism: the Poisson draw is the inverse CDF applied to the frozen
    md5-uniform of (seed, replica, doc_id) — a pure function, identical in
    both engines, so the 'randomness' is rerun- and engine-stable.  The
    per-replica means are folded in replica order (agg_arr_by) so the
    float summation order is pinned; draws are capped at 6
    (P(X>6|lambda=1) < 1e-4).

    One lateral fan-out (x n_reps) feeding ONE partial-combining aggregate
    on the replica id, then a 1-row fold — no shuffle grows with the
    corpus.
    """
    lat = d.lateral_seq("0", str(n_reps - 1), "b")
    u_key = d.md5_key48(
        "concat(CAST(b AS STRING), '|', CAST(doc_id AS STRING))", seed
    )
    # 2^48 as a DOUBLE divisor; u is uniform on [0, 1)
    u = f"(CAST({u_key} AS DOUBLE) / 281474976710656.0e0)"
    pois = f"""(CASE
      WHEN {u} < 0.3678794411714423e0 THEN 0
      WHEN {u} < 0.7357588823428846e0 THEN 1
      WHEN {u} < 0.9196986029286058e0 THEN 2
      WHEN {u} < 0.9810118431238462e0 THEN 3
      WHEN {u} < 0.9963401531726563e0 THEN 4
      WHEN {u} < 0.9994058151824183e0 THEN 5
      ELSE 6 END)"""
    means_arr = d.agg_arr_by("b", "m")
    dev = d.fold_double(d.transform("means", "x", "(x - mbar) * (x - mbar)"))
    return f"""
WITH draws AS (
  SELECT b, CAST({pois} AS BIGINT) AS wgt, CAST(n_chars AS BIGINT) AS n_chars
  FROM documents
  {lat}
),
reps AS (
  SELECT b,
         CAST(sum(wgt * n_chars) AS DOUBLE) / CAST(nullif(sum(wgt), 0) AS DOUBLE) AS m
  FROM draws
  GROUP BY b
),
folded AS (
  SELECT {means_arr} AS means, CAST(count(*) AS BIGINT) AS nb
  FROM reps WHERE m IS NOT NULL
),
var_rel AS (
  SELECT means, nb,
         {d.fold_double('means')} / CAST(nullif(nb, 0) AS DOUBLE) AS mbar
  FROM folded
),
point AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CAST(n_chars AS BIGINT)) AS DOUBLE) / CAST(nullif(count(*), 0) AS DOUBLE) AS mean_chars
  FROM documents
)
SELECT p.n_docs,
       {d.trunc6('p.mean_chars')} AS mean_chars,
       CAST(v.nb AS BIGINT) AS n_replicas,
       {d.trunc6(f'sqrt(({dev}) / CAST(nullif(greatest(v.nb - 1, 0), 0) AS DOUBLE))')} AS boot_se,
       {d.trunc6(d.amin('v.means'))} AS rep_min,
       {d.trunc6(d.amax('v.means'))} AS rep_max
FROM point p CROSS JOIN var_rel v
""".strip()


def gen_dp_release(d: Dialect, eps: float = 1.0, seed: str = "dp") -> str:
    """Differentially-private RELEASE AUDIT of the per-source document
    counts: each count gets Laplace(sensitivity/eps) noise (sensitivity 1
    for a per-source count under add/remove-one adjacency), and the query
    emits the released value NEXT TO the exact count, the realized noise,
    and a flag for the 99th-percentile Laplace band — the
    privacy/utility readout a data-release pipeline signs off on.

    Determinism (the bootstrap-CI discipline): the Laplace draw is the
    inverse CDF applied to the frozen md5-uniform of (seed, source) — a
    pure function, so the 'noise' is rerun- and engine-stable and the
    whole release is oracle-gated.  A production release would rotate the
    seed per release epoch; the AUDIT columns (exact, noise) stay behind
    the trust boundary — only ``released`` ships.

    The inverse-CDF argument is clamped at 1e-12 (u can land exactly on
    the 2^-48 lattice edge where 1-2|u-1/2| = 0 and ln would be -inf).

    100 TB shape: one pruned scan, one partial-combining aggregate on
    source, map-side noise derivation — the privacy layer adds zero
    shuffles."""
    b = 1.0 / eps
    # coalesce the key input: concat('seed', NULL) is NULL in Spark but
    # DuckDB's concat SKIPS NULLs (hashing the bare seed) — the NULL-key
    # battery caught the divergence.  A NULL source draws the ''-keyed
    # noise, deterministically in both engines.
    u_key = d.md5_key48("coalesce(source, '')", seed)
    u = f"(CAST({u_key} AS DOUBLE) / 281474976710656.0e0)"
    mag = f"greatest(1e-12, 1.0e0 - 2.0e0 * abs({u} - 0.5e0))"
    sign = f"(CASE WHEN {u} >= 0.5e0 THEN 1.0e0 ELSE -1.0e0 END)"
    noise = f"(-{b}e0 * {sign} * ln({mag}))"
    bound_99 = f"{b}e0 * ln(100.0e0)"
    return f"""
WITH counts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS exact_n
  FROM documents GROUP BY source
)
SELECT source, exact_n,
       {d.trunc6(noise)} AS noise,
       {d.trunc6(f"CAST(exact_n AS DOUBLE) + {noise}")} AS released,
       {d.trunc6(f"abs({noise})")} AS abs_err,
       CAST(abs({noise}) <= {bound_99} AS INT) AS within_p99,
       {eps}e0 AS epsilon
FROM counts
ORDER BY source
""".strip()


def gen_priority_sample(d: Dialect, k: int = 64, seed: str = "prio") -> str:
    """Priority sampling for subset-sum ESTIMATION (Duffield, Lund &
    Thorup 2007, public): each document draws a frozen md5-uniform
    u ∈ (0, 1] and a priority q = w/u (w = doc length); the sample is the
    top-``k`` priorities, the threshold τ is the (k+1)-th, and every
    sampled item carries the Horvitz–Thompson-style estimator weight
    max(w, τ).  Unlike the Efraimidis–Spirakis sampler (which only picks
    items), this yields UNBIASED total/subset-sum estimates from k rows:
    E[Σ max(w, τ)] = Σ w, within-sample covariances are zero, and any
    subset's weight is estimable from its sampled members alone — the
    sketch a pipeline uses to answer "how many tokens does slice X hold"
    without rescanning 100 TB.  The AUDIT columns ship the realized
    estimate next to the exact corpus total.

    Determinism (the weighted_sample discipline): u is a pure function of
    (seed, doc_id); q = w/u and τ = min(q) are single exactly-rounded IEEE
    ops on identical inputs; ties break on doc_id.  The estimator fold is
    pinned in rank order (agg_arr_by), and the exact total sums BIGINT
    lengths — both order-free across engines.

    100 TB shape: map-only key/priority computation; ORDER BY+LIMIT (k+1)
    fuses to TakeOrderedAndProject (per-partition top-k, driver merge of
    k+1 rows — no global sort); the rank/τ/estimate algebra then runs on a
    (k+1)-row relation.  The exact-total audit is a second corpus scan by
    design (remove `tot` and the estimate stands alone); the unsaturated
    corpus (n ≤ k) degrades to τ = 0 and est_weight = w — the exact sum.
    """
    u = f"(CAST({d.md5_key48('doc_id', seed)} AS DOUBLE) + 1.0e0) / 281474976710656.0e0"
    est_fold = d.fold_double(d.agg_arr_by("rk", "est_w"))
    return f"""
WITH pri AS (
  SELECT doc_id, lang, w, w / u AS q
  FROM (
    SELECT doc_id, lang,
           CAST(greatest(length(text), 1) AS DOUBLE) AS w,
           {u} AS u
    FROM documents
    WHERE text IS NOT NULL
  ) t0
),
top1 AS (
  SELECT doc_id, lang, w, q FROM pri ORDER BY q DESC, doc_id LIMIT {k + 1}
),
ranked AS (
  SELECT doc_id, lang, w, q,
         row_number() OVER (ORDER BY q DESC, doc_id) AS rk
  FROM top1
),
thr AS (
  SELECT CASE WHEN count(*) > {k} THEN min(q) ELSE 0.0e0 END AS tau
  FROM top1
),
samp AS (
  SELECT r.doc_id, r.lang, r.w, r.q, r.rk,
         greatest(r.w, t.tau) AS est_w
  FROM ranked r CROSS JOIN thr t
  WHERE r.rk <= {k}
),
est AS (SELECT {est_fold} AS est_total FROM samp),
tot AS (SELECT CAST(sum(CAST(w AS BIGINT)) AS DOUBLE) AS exact_total FROM pri)
SELECT s.rk AS sample_rank,
       s.doc_id, s.lang,
       CAST(s.w AS BIGINT) AS w,
       {d.trunc6('s.q')} AS priority,
       {d.trunc6('s.est_w')} AS est_weight,
       {d.trunc6('e.est_total')} AS est_total,
       CAST(t.exact_total AS BIGINT) AS exact_total,
       {d.trunc6('(e.est_total - t.exact_total) / t.exact_total')} AS rel_err
FROM samp s CROSS JOIN est e CROSS JOIN tot t
ORDER BY sample_rank
""".strip()
