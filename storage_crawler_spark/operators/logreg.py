"""Distributed logistic-regression training over the quality-rule features
— the LEARNED counterpart of the fixed-weight quality classifier
(operators/text.py gen_quality_classifier): identical feature extraction,
but the weights are FIT by full-batch gradient descent where every step is
ONE partial-combining aggregate over the corpus.  This replicates how
production LLM-data quality classifiers are bootstrapped: weak labels from
a rule battery, a linear model trained to generalize them (fastText /
logistic tier), the learned scores then driving the keep/drop gate.

Scale posture (the same contract as operators/kmeans.py): the driver holds
only the (n_features+1)-float weight vector; each iteration is a map
(sigmoid of a literal-weight dot product — whole-stage codegen, no UDF)
plus one aggregate producing n_features+1 sums.  Nothing per-row ever
reaches the driver; iterations are O(1) driver memory at any corpus size.

Determinism: full-batch gradients (no sampling, no shuffling effects —
the per-feature sums are doubles, so partial-sum order can drift in the
last ulp; the convergence/agreement outputs are reported trunc6-ed and
the registry entry is rows-only, with pytest pinning loss monotonicity
and rule agreement instead of a value hash).

Like the k-means/PQ fits, the training loop is not SQL-expressible, so
the registry entry is rows-only (the honest non-SQL floor the SURVEY
documents); the FEATURE extraction and the final scoring pass are the
same Catalyst-only expressions the fixed-weight classifier uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# weak-supervision rule label: "keep" = mid-length doc with some stopword
# mass and lexical diversity — a Gopher-style conjunctive rule the linear
# model must approximate (deliberately not linearly separable: the
# two-sided length band bends the boundary).
_LABEL_SQL = (
    "CAST(CASE WHEN n_tokens >= 10 AND n_tokens <= 200 "
    "AND stop_ratio >= 0.05 AND distinct_ratio >= 0.3 "
    "THEN 1 ELSE 0 END AS INT)"
)

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, x1..x3, label): the classifier features plus the
    rule label, all Catalyst expressions over one documents scan."""
    from storage_crawler_spark.plans import views as V

    V.register_base_tables(spark, sf_dir, ("documents",))
    in_list = ", ".join(f"'{w}'" for w in _STOPWORDS)
    return spark.sql(
        f"""
SELECT doc_id, source, n_tokens,
       stop_ratio AS x1, distinct_ratio AS x2,
       CASE WHEN n_tokens > 100 THEN CAST(1.0 AS DOUBLE)
            ELSE n_tokens / CAST(100.0 AS DOUBLE) END AS x3,
       {_LABEL_SQL} AS label
FROM (
  SELECT doc_id, source,
         size(split(text, ' ')) AS n_tokens,
         CAST(size(filter(split(text, ' '), x -> x IN ({in_list}))) AS DOUBLE)
           / size(split(text, ' ')) AS stop_ratio,
         CAST(size(array_distinct(split(text, ' '))) AS DOUBLE)
           / size(split(text, ' ')) AS distinct_ratio
  FROM documents
  WHERE text IS NOT NULL
) f
""".strip()
    )


def _score_col(w: list[float]):
    """Literal-weight logit column: w0 + w1*x1 + w2*x2 + w3*x3 (pure
    Catalyst expression — re-rendered per iteration like the k-means
    centroid distance CASE)."""
    return (
        F.lit(w[0])
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
    )


def logreg_fit(
    feats: DataFrame, iters: int = 60, lr: float = 5.0
) -> list[float]:
    """Full-batch gradient descent; returns [w0, w1, w2, w3].

    Each step: p = sigmoid(logit) map-side, then ONE aggregate of the four
    gradient sums Σ(p−y)·x_i — a single shuffle-free reduce per iteration.
    ``feats`` should be persisted by the caller when iterating (every
    iteration re-scans it otherwise).
    """
    w = [0.0, 0.0, 0.0, 0.0]
    n = feats.count()
    if n == 0:
        return w
    for _ in range(iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_score_col(w)))
        err = p - F.col("label").cast("double")
        g = feats.agg(
            F.sum(err).alias("g0"),
            F.sum(err * F.col("x1")).alias("g1"),
            F.sum(err * F.col("x2")).alias("g2"),
            F.sum(err * F.col("x3")).alias("g3"),
        ).collect()[0]
        w = [w[i] - lr * float(g[i]) / n for i in range(4)]
    return w


def log_loss(feats: DataFrame, w: list[float]) -> float:
    """Mean logistic loss (the training objective; must not increase over
    a fit's iterations — pytest-pinned)."""
    z = _score_col(w)
    # numerically-stable softplus: max(z,0) - z*y + log1p(exp(-|z|))
    loss = (
        F.greatest(z, F.lit(0.0))
        - z * F.col("label").cast("double")
        + F.log1p(F.exp(-F.abs(z)))
    )
    row = feats.agg(F.avg(loss).alias("l")).collect()[0]
    return float(row.l)


# ---------------------------------------------------------------------------
# integer-lattice logistic regression: the oracle-gated fit (round 9)
# ---------------------------------------------------------------------------
#
# The float fit above stays the pragmatic loss-monotone path (pytest pins
# its properties); this lattice variant makes the WHOLE iterative quality
# fit oracle-checkable — the k-means/PCA/PageRank discipline applied to
# classifier training, removing the registry's last rows-only entry:
#
# - Features are exact-integer margin projections of the rule clauses on
#   the 1/LRL_XQ lattice, each rescaled by its natural width and clamped
#   to [-1, 1] (raw stop-ratio margins span only ±0.05, which leaves
#   full-batch GD predicting the majority class — measured 65% → 98.6%
#   agreement at sf0.01 from the rescale alone), plus the MIN of the
#   clause margins, which makes the conjunctive rule linearly separable.
# - The link is the HARD sigmoid clamp(1/2 + z/4, 0, 1) — piecewise
#   linear, so the probability lattice needs only integer multiply and
#   truncating division; exp() never executes (its last ulp differs
#   between JVM and libm — the gen_quality_classifier lesson).
# - Updates use the deterministic 1/t step decay (the subgradient-method
#   schedule); constant steps oscillate keep-all ↔ drop-all on this
#   near-separable data (measured).  Gradient sums pre-divide by n before
#   the step scaling, so no intermediate depends on corpus size beyond
#   the Σ eq·x sums themselves (|g| ≤ n·2^24 ⇒ safe to n ≈ 2^38 rows).
# - Same input ⇒ same weights, bit for bit, in BOTH engines: the oracle
#   unrolls the 12 steps as 1-row weight CTEs; the Spark engine path runs
#   the distributed loop (one partial-combining aggregate per step, six
#   BIGINTs of driver state) and applies the identical integer update.

LRL_XQ = 4096   # feature lattice scale (margins live in [-XQ, XQ])
LRL_WS = 4096   # weight lattice scale
LRL_PS = 4096   # probability lattice scale
LRL_ITERS = 12
LRL_LR = 10     # integer learning-rate numerator (step t divides by t)

_LRL_STOPS = "('" + "', '".join(_STOPWORDS) + "')"


def _lrl_sgn_div(d, x: str, m: str) -> str:
    from storage_crawler_spark.operators.similarity import _sgn_div

    return _sgn_div(d, x, m)


def _lrl_sgn_div_py(x: int, m: int) -> int:
    return -((-x) // m) if x < 0 else x // m


def _lrl_clamp(x: str) -> str:
    return f"greatest(CAST(-{LRL_XQ} AS BIGINT), least(CAST({LRL_XQ} AS BIGINT), {x}))"


def lrl_feature_sql(d) -> str:
    """(doc_id, source, m1, m2, mb, mm, y) — BIGINT lattice margins of the
    weak-label rule clauses over one documents scan.  m1 = 20·(stop_ratio
    − 0.05), m2 = 3·(distinct_ratio − 0.3), mb = the tighter of the two
    length-band margins ((n−10)/10 and (200−n)/50), each clamped to ±1 on
    the lattice; mm = least(m1, m2, mb) is the conjunction margin (y = 1
    ⟺ mm ≥ 0 exactly).  All divisions are truncating signed integer
    division of exact products — no float touches any feature."""
    toks = d.split("text")
    m1 = _lrl_clamp(_lrl_sgn_div(d, f"(20 * s - n) * {LRL_XQ}", "n"))
    m2 = _lrl_clamp(_lrl_sgn_div(d, f"(10 * dn - 3 * n) * 3 * {LRL_XQ}", "10 * n"))
    mb = _lrl_clamp(
        f"least({_lrl_sgn_div(d, f'(n - 10) * {LRL_XQ}', '10')}, "
        f"{_lrl_sgn_div(d, f'(200 - n) * {LRL_XQ}', '50')})"
    )
    return f"""
SELECT doc_id, source, m1, m2, mb, least(m1, least(m2, mb)) AS mm,
       CAST(CASE WHEN n >= 10 AND n <= 200 AND s * 20 >= n
                  AND dn * 10 >= 3 * n THEN 1 ELSE 0 END AS BIGINT) AS y
FROM (
  SELECT doc_id, source, {m1} AS m1, {m2} AS m2, {mb} AS mb, n, s, dn
  FROM (
    SELECT doc_id, source,
           CAST({d.size(toks)} AS BIGINT) AS n,
           CAST({d.size(d.afilter(toks, 'x', f'x IN {_LRL_STOPS}'))} AS BIGINT) AS s,
           CAST({d.size(d.adistinct(toks))} AS BIGINT) AS dn
    FROM documents
    WHERE text IS NOT NULL
  ) raw
) m
""".strip()


def _lrl_z(wb: str, w1: str, w2: str, w3: str, w4: str) -> str:
    """Scaled logit numerator: z = zn / (WS·XQ)."""
    return (
        f"({wb} * {LRL_XQ} + {w1} * m1 + {w2} * m2 + {w3} * mb + {w4} * mm)"
    )


def _lrl_pq(d, zn: str) -> str:
    """Hard-sigmoid probability on the PS lattice: clamp(PS/2 + zn·PS/(4S),
    0, PS) with S = WS·XQ — saturation handled by explicit CASE arms so
    the division never sees a saturated magnitude."""
    s4 = 4 * LRL_WS * LRL_XQ
    mid = f"{LRL_PS // 2} + {_lrl_sgn_div(d, f'{zn} * {LRL_PS}', str(s4))}"
    return (
        f"CASE WHEN {zn} <= {-2 * LRL_WS * LRL_XQ} THEN CAST(0 AS BIGINT) "
        f"WHEN {zn} >= {2 * LRL_WS * LRL_XQ} THEN CAST({LRL_PS} AS BIGINT) "
        f"ELSE CAST({mid} AS BIGINT) END"
    )


def logreg_lattice_ctes(d, iters: int = LRL_ITERS, lr: int = LRL_LR) -> tuple[str, str]:
    """Unrolled CTE chain of the lattice fit: returns (ctes, final weight
    relation ``wt{iters}`` with 1 row (wb, wa1..wa4)).  Each step is one
    aggregate over the feature relation CROSS JOINed with the previous
    1-row weight relation (a broadcast at any scale); the update divides
    the gradient by greatest(n, 1) first (empty-corpus guard — weights
    stay 0 and the report is empty rather than a divide-by-zero), then
    applies the lr/t decayed step on the weight lattice."""
    mat = " MATERIALIZED" if d.name == "duck" else ""
    parts = [f"f AS{mat} (\n{lrl_feature_sql(d)}\n)"]
    parts.append(
        "wt0 AS (SELECT CAST(0 AS BIGINT) AS wb, CAST(0 AS BIGINT) AS wa1, "
        "CAST(0 AS BIGINT) AS wa2, CAST(0 AS BIGINT) AS wa3, CAST(0 AS BIGINT) AS wa4)"
    )
    # r15: the per-step relations carry the DuckDB MATERIALIZED hint too —
    # wt{p} is referenced TWICE per step (the gradient aggregate and the
    # update), so the un-materialized chain re-inlined the entire prior
    # chain per reference: 2^iters plan growth, measured ~100 s of pure
    # DuckDB planning at ANY scale (even an empty corpus).  Materializing
    # the 1-row relations is execution-order only — values are untouched
    # (verified: identical rows and value hash at all gate SFs).
    for t in range(1, iters + 1):
        p = t - 1
        zn = _lrl_z("wb", "wa1", "wa2", "wa3", "wa4")
        parts.append(
            f"""gr{t} AS{mat} (
  SELECT greatest(count(*), 1) AS nn,
         CAST(coalesce(sum(eq), 0) AS BIGINT) AS g0,
         CAST(coalesce(sum(eq * m1), 0) AS BIGINT) AS g1,
         CAST(coalesce(sum(eq * m2), 0) AS BIGINT) AS g2,
         CAST(coalesce(sum(eq * mb), 0) AS BIGINT) AS g3,
         CAST(coalesce(sum(eq * mm), 0) AS BIGINT) AS g4
  FROM (
    SELECT ({_lrl_pq(d, f'({zn})')}) - y * {LRL_PS} AS eq, m1, m2, mb, mm
    FROM f CROSS JOIN wt{p}
  ) e
)"""
        )
        upd_b = _lrl_sgn_div(
            d, f"{lr} * {_lrl_sgn_div(d, 'g.g0', 'g.nn')} * {LRL_WS}",
            str(LRL_PS * t),
        )
        upds = [
            _lrl_sgn_div(
                d, f"{lr} * {_lrl_sgn_div(d, f'g.g{i}', 'g.nn')} * {LRL_WS}",
                str(LRL_PS * LRL_XQ * t),
            )
            for i in (1, 2, 3, 4)
        ]
        parts.append(
            f"""wt{t} AS{mat} (
  SELECT w.wb - {upd_b} AS wb,
         w.wa1 - {upds[0]} AS wa1,
         w.wa2 - {upds[1]} AS wa2,
         w.wa3 - {upds[2]} AS wa3,
         w.wa4 - {upds[3]} AS wa4
  FROM wt{p} w CROSS JOIN gr{t} g
)"""
        )
    return ",\n".join(parts), f"wt{iters}"


def gen_quality_learned_lattice(d, iters: int = LRL_ITERS, lr: int = LRL_LR) -> str:
    """Oracle-gated LEARNED quality report: per-source doc counts, learned
    vs rule keep counts, model↔rule agreement, the exact BIGINT logit sum,
    and the five fitted lattice weights (constant across rows — the fit
    artifact made visible).  The ENTIRE training loop is verified across
    engines, not just asserted."""
    ctes, wt = logreg_lattice_ctes(d, iters, lr)
    zn = _lrl_z("w.wb", "w.wa1", "w.wa2", "w.wa3", "w.wa4")
    return f"""
WITH {ctes}
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(k) AS BIGINT) AS n_keep_learned,
       CAST(sum(y) AS BIGINT) AS n_keep_rule,
       CAST(sum(CASE WHEN k = y THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
       CAST(sum(zn) AS BIGINT) AS sum_logit_q,
       max(wb) AS w_bias_q, max(wa1) AS w_stop_q, max(wa2) AS w_distinct_q,
       max(wa3) AS w_band_q, max(wa4) AS w_minmargin_q
FROM (
  SELECT f.source, f.y, ({zn}) AS zn,
         CASE WHEN ({zn}) >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS k,
         w.wb, w.wa1, w.wa2, w.wa3, w.wa4
  FROM f CROSS JOIN {wt} w
) sc
GROUP BY source
ORDER BY source
""".strip()


def logreg_fit_lattice(
    spark: SparkSession, sf_dir: str, iters: int = LRL_ITERS, lr: int = LRL_LR
):
    """Spark ENGINE path of the lattice fit: the distributed loop — per
    step, one partial-combining aggregate of five BIGINT gradient sums
    against literal integer weights (whole-stage codegen, no UDF), then
    the identical truncating-division update driver-side.  Driver state
    is six BIGINTs; bit-identical to :func:`logreg_lattice_ctes` by
    construction.  Returns (feats DataFrame — persisted, caller
    unpersists, — weights list [wb, w1..w4])."""
    from storage_crawler_spark.plans import views as V
    from storage_crawler_spark.plans.dialect import SPARK

    V.register_base_tables(spark, sf_dir, ("documents",))
    feats = spark.sql(lrl_feature_sql(SPARK)).persist()
    w = [0, 0, 0, 0, 0]
    for t in range(1, iters + 1):
        zn = _lrl_z(str(w[0]), str(w[1]), str(w[2]), str(w[3]), str(w[4]))
        eq = f"({_lrl_pq(SPARK, f'({zn})')}) - y * {LRL_PS}"
        row = feats.selectExpr(
            f"({eq}) AS eq", "m1", "m2", "mb", "mm"
        ).agg(
            F.greatest(F.count(F.lit(1)), F.lit(1)).alias("nn"),
            F.coalesce(F.sum("eq"), F.lit(0)).alias("g0"),
            F.coalesce(F.sum(F.col("eq") * F.col("m1")), F.lit(0)).alias("g1"),
            F.coalesce(F.sum(F.col("eq") * F.col("m2")), F.lit(0)).alias("g2"),
            F.coalesce(F.sum(F.col("eq") * F.col("mb")), F.lit(0)).alias("g3"),
            F.coalesce(F.sum(F.col("eq") * F.col("mm")), F.lit(0)).alias("g4"),
        ).collect()[0]
        nn = int(row.nn)
        g = [int(row.g0), int(row.g1), int(row.g2), int(row.g3), int(row.g4)]
        w[0] -= _lrl_sgn_div_py(lr * _lrl_sgn_div_py(g[0], nn) * LRL_WS, LRL_PS * t)
        for i in (1, 2, 3, 4):
            w[i] -= _lrl_sgn_div_py(
                lr * _lrl_sgn_div_py(g[i], nn) * LRL_WS, LRL_PS * LRL_XQ * t
            )
    return feats, w


def quality_learned_lattice_report(
    spark: SparkSession, sf_dir: str, iters: int = LRL_ITERS, lr: int = LRL_LR
) -> DataFrame:
    """Engine-path builder for the oracle-gated ``text_quality_learned``
    entry: distributed lattice fit, then one map + groupBy scoring pass
    with the fitted weights as literals (exact integer logit, fused
    partial agg) — the same flat relation the oracle chain produces."""
    feats, w = logreg_fit_lattice(spark, sf_dir, iters, lr)
    try:
        zn = _lrl_z(str(w[0]), str(w[1]), str(w[2]), str(w[3]), str(w[4]))
        out = (
            feats.selectExpr(
                "source",
                "y",
                f"({zn}) AS zn",
                f"CASE WHEN ({zn}) >= 0 THEN CAST(1 AS BIGINT) "
                f"ELSE CAST(0 AS BIGINT) END AS k",
            )
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("k").cast("long").alias("n_keep_learned"),
                F.sum("y").cast("long").alias("n_keep_rule"),
                F.sum((F.col("k") == F.col("y")).cast("long")).alias("n_agree"),
                F.sum("zn").cast("long").alias("sum_logit_q"),
                F.lit(w[0]).cast("long").alias("w_bias_q"),
                F.lit(w[1]).cast("long").alias("w_stop_q"),
                F.lit(w[2]).cast("long").alias("w_distinct_q"),
                F.lit(w[3]).cast("long").alias("w_band_q"),
                F.lit(w[4]).cast("long").alias("w_minmargin_q"),
            )
            .orderBy("source")
        )
        out = out.localCheckpoint()
    finally:
        feats.unpersist()
    return out


def quality_learned_report(
    spark: SparkSession, sf_dir: str, iters: int = 60
) -> DataFrame:
    """Per-source report of the LEARNED quality model: mean learned score,
    learned keep rate, rule keep rate, and model↔rule agreement — the
    drift check between the bootstrap rules and the model that replaces
    them.  Driver state: 4 floats."""
    feats = feature_frame(spark, sf_dir).persist()
    try:
        w = logreg_fit(feats, iters=iters)
        score = _score_col(w)
        keep = (score >= 0).cast("int")
        out = (
            feats.withColumn("learned_keep", keep)
            .withColumn("score", score)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.expr(
                    "CAST(floor(avg(score) * 1000000) AS DOUBLE) / 1000000"
                ).alias("mean_score"),
                F.sum("learned_keep").cast("long").alias("n_keep_learned"),
                F.sum("label").cast("long").alias("n_keep_rule"),
                F.sum(
                    (F.col("learned_keep") == F.col("label")).cast("long")
                ).alias("n_agree"),
            )
            .orderBy("source")
        )
        out = out.localCheckpoint()  # materialize before unpersisting feats
    finally:
        feats.unpersist()
    return out
