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
