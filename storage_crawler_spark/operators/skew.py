"""Skew mitigation: salted aggregation and salted broadcast-path join.

AQE's skew-join splitting handles most runtime skew, but two patterns
still need explicit structure at 100 TB:

- **Heavy-hitter aggregation** (one key holding 10% of a table): a plain
  ``groupBy(key)`` sends every row of the hot key to one reducer.
  :func:`salted_agg` does partial aggregation on ``(key, salt)`` — the hot
  key fans out over N reducers — then combines the partials.  For
  algebraic aggregates (count/sum/min/max) the result is exactly the plain
  groupBy, which is how the oracle checks it.
- **Hot-key join** against a dimension too large to broadcast whole:
  :func:`salted_join` replicates each dimension row N ways (one per salt)
  and salts the fact side randomly-but-deterministically, so the hot key's
  rows spread over N partitions of the shuffle join.

Salting is deterministic (hash-derived, not random) so retries/speculative
tasks and oracle comparisons see identical results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, cols: list[str], n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salts) derived from the full row's
    disambiguating columns (NOT the group key — that would defeat the
    point: every row of a hot key must spread, so the salt comes from
    columns that vary within the key)."""
    return df.withColumn(salt_col, F.pmod(F.hash(*cols), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    spread_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: partial on (key, salt) → final on key.

    ``aggs`` maps output column → "fn(col)" where fn ∈ {count, sum, min,
    max} (algebraic — partials combine losslessly: counts re-sum, sums
    re-sum, min/max re-min/max).
    """
    salted = with_salt(df, spread_cols, n_salts)
    partial_exprs = []
    final_exprs = []
    for out, spec in aggs.items():
        fn, _, col = spec.partition("(")
        col = col.rstrip(")")
        fn = fn.strip().lower()
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1) if col in ("*", "") else F.col(col)).alias(out))
            final_exprs.append(F.sum(out).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(out))
            final_exprs.append(F.sum(out).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(out))
            final_exprs.append(F.min(out).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(out))
            final_exprs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted losslessly")
    partial = salted.groupBy(key, "_salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    spread_cols: list[str] | None = None,
) -> DataFrame:
    """Inner equi-join with the dimension replicated n_salts ways.

    The fact side gets a deterministic salt from ``spread_cols`` (default:
    all non-key columns); the dimension explodes over all salts, so the
    join key becomes (key, salt) and a hot fact key spreads over n_salts
    shuffle partitions.  Row multiplicity is unchanged: each fact row
    matches exactly the one dim replica carrying its salt.
    """
    spread = spread_cols or [c for c in fact.columns if c != key]
    f_salted = with_salt(fact, spread, n_salts)
    d_replicated = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = f_salted.join(d_replicated, on=[key, "_salt"], how="inner")
    return out.drop("_salt")
