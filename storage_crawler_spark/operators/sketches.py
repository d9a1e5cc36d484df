"""Sketch aggregations: the sublinear-memory path for 100 TB cardinalities.

Exact distinct counts and quantiles need state proportional to the key
space; at 100 TB those aggregations are the memory cliff.  Spark ships the
standard sketches as built-in JVM aggregates and this module exposes them
in the engine's vocabulary:

- HyperLogLog++ (``approx_count_distinct``): distinct users/paths per key
  at a configurable relative error, O(1) state per key;
- GK/percentile_approx: value quantiles without a global sort;
- count-min sketch: heavy-hitter frequency estimates, mergeable across
  partitions.

Estimates are not bit-stable across engines, so these register with the
driver as rows-only checks; accuracy (estimate vs exact within the
configured error) is pytest-asserted instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(df: DataFrame, key: str, col: str, rsd: float = 0.02) -> DataFrame:
    """Distinct ``col`` per ``key`` via HLL++ (relative std dev ``rsd``).
    Map-side partial sketches merge in the shuffle — the reducer sees one
    sketch per key, never the raw values."""
    return df.groupBy(key).agg(
        F.approx_count_distinct(col, rsd=rsd).alias(f"approx_distinct_{col}")
    )


def approx_quantiles_by(
    df: DataFrame, key: str, col: str, probs: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-key quantiles via the GK sketch (no global sort, bounded state)."""
    pa = F.percentile_approx(col, F.array(*[F.lit(p) for p in probs]), accuracy)
    out = df.groupBy(key).agg(pa.alias("qs"))
    cols = [F.col("qs")[i].alias(f"p{int(p * 100)}") for i, p in enumerate(probs)]
    return out.select(key, *cols)


def heavy_hitter_sketch(df: DataFrame, col: str, eps: float = 0.001, conf: float = 0.99) -> DataFrame:
    """Count-min sketch of ``col`` (binary, mergeable); the fixed seed keeps
    re-runs byte-identical."""
    return df.agg(F.count_min_sketch(F.col(col), F.lit(eps), F.lit(conf), F.lit(42)).alias("cms"))
