"""Temporal joins Spark has no native operator for: as-of and range joins
(SURVEY.md §2.6 names both as first-class engine surface).

**As-of join** — for each left row, the latest right row with
``right_ts <= left_ts`` per key.  The naive formulation is an inequality
join (BroadcastNestedLoop, O(|L|·|R|) — unusable at scale) or a correlated
scalar subquery (what the DuckDB oracle runs).  The scalable Spark shape
implemented here is **union + running window**:

    tag each side → union on (key, ts, side) → one shuffle on key →
    running ``max(CASE WHEN right THEN ts END)`` over
    (PARTITION BY key ORDER BY ts, side ROWS UNBOUNDED PRECEDING..CURRENT)
    → keep left rows.

Right rows sort *before* left rows at equal ts (side 0 < 1), making the
match inclusive.  Cost: one shuffle + per-key sort — O(n log n) instead of
O(n²), and it inherits AQE skew splitting like any other window.

**Range join** — all pairs (a, b) on the same key with
``0 < b.ts − a.ts <= width``.  Spark plans a raw inequality join as a
nested loop; the scalable shape is **bucketed expansion**: bin ts by the
window width, expand the left side to buckets {blk, blk+1} (every
qualifying pair lands on exactly one equi-key), equi-join on (key, bucket),
then apply the exact inequality.  Identical technique to the length-bucket
blocking in operators/dedup.py — a shuffle on tight composite keys replaces
the quadratic scan.

Timestamps are epoch *seconds* (BIGINT) throughout: both engines floor to
the second via plans/dialect.py, so sub-second drift cannot flip a
comparison between Spark and the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from storage_crawler_spark.plans.dialect import Dialect


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, annotated with the greatest
    ``right_ts`` at-or-before its ``left_ts`` (NULL if none) and the count
    of right rows at-or-before it.

    One shuffle (on ``key``), one per-partition sort — no inequality join.
    A pathological single hot key serializes into one partition's sort, as
    any keyed window does; pre-salt the key and merge if that bites.

    NULL-key right rows are dropped (SQL-equality semantics: NULL never
    matches), so NULL-key left rows pass through unmatched rather than
    matching each other inside the NULL window partition.
    """
    lcols = [c for c in left.columns]
    right = right.filter(F.col(key).isNotNull())
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_payload"),
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_payload"].dataType).alias("_payload"),
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    right_ts_or_null = F.when(F.col("_side") == 0, F.col("_ts"))
    annotated = u.select(
        "_side",
        "_payload",
        F.max(right_ts_or_null).over(w).alias(f"{prefix}ts"),
        F.count(right_ts_or_null).over(w).alias(f"{prefix}n"),
    ).filter(F.col("_side") == 1)
    return annotated.select(
        *[F.col(f"_payload.{c}").alias(c) for c in lcols],
        f"{prefix}ts",
        f"{prefix}n",
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    width_s: int,
) -> DataFrame:
    """All (left, right) pairs on the same key with
    ``0 < right_ts − left_ts <= width_s``, as a bucketed equi-join.

    Left rows are expanded ×2 (buckets blk and blk+1); every qualifying
    pair meets on exactly one (key, bucket) composite — Catalyst plans a
    hash join, never a nested loop.  Column name collisions are the
    caller's to avoid (alias before calling).
    """
    blk = lambda c: F.floor(F.col(c) / F.lit(width_s)).cast("long")  # noqa: E731
    # Explicit aliases: left and right commonly share lineage (self-joins on
    # one events table), and plan-ambiguity resolution must not be left to
    # chance.
    l_exp = (
        left.withColumn("_blk0", blk(left_ts))
        .withColumn("_off", F.explode(F.array(F.lit(0), F.lit(1))))
        .withColumn("_jblk", F.col("_blk0") + F.col("_off"))
        .drop("_blk0", "_off")
        .alias("_rj_l")
    )
    r_b = right.withColumn("_rblk", blk(right_ts)).alias("_rj_r")
    delta = F.col(f"_rj_r.{right_ts}") - F.col(f"_rj_l.{left_ts}")
    cond = (
        (F.col("_rj_l._jblk") == F.col("_rj_r._rblk"))
        & (F.col(f"_rj_l.{key}") == F.col(f"_rj_r.{key}"))
        & (delta > 0)
        & (delta <= width_s)
    )
    joined = l_exp.join(r_b, on=cond, how="inner")
    return joined.drop(F.col(f"_rj_r.{key}")).drop("_jblk", "_rblk")


# --------------------------------------------------------------------------
# Oracle SQL (DuckDB runs the *naive* formulations — correlated subquery and
# raw inequality join — so the scalable plans are checked against an
# independently-derived answer, not a restatement of themselves).
# --------------------------------------------------------------------------


def gen_asof_oracle(d: Dialect, left_type: str = "click", right_type: str = "purchase") -> str:
    ea = d.epoch_s_events("a.ts")
    eb = d.epoch_s_events("b.ts")
    return f"""
SELECT a.event_id, a.user_id, {ea} AS left_ts_s,
  (SELECT max({eb}) FROM events b
   WHERE b.user_id = a.user_id AND b.event_type = '{right_type}' AND {eb} <= {ea}) AS asof_ts,
  (SELECT count(*) FROM events b
   WHERE b.user_id = a.user_id AND b.event_type = '{right_type}' AND {eb} <= {ea}) AS asof_n
FROM events a
WHERE a.event_type = '{left_type}'
""".strip()


def gen_range_oracle(d: Dialect, width_s: int = 3600, event_type: str | None = None) -> str:
    ea = d.epoch_s_events("a.ts")
    eb = d.epoch_s_events("b.ts")
    tfilter = f"AND a.event_type = '{event_type}' AND b.event_type = '{event_type}'" if event_type else ""
    return f"""
SELECT a.event_id AS ev_a, b.event_id AS ev_b, a.user_id, {eb} - {ea} AS delta_s
FROM events a
JOIN events b ON a.user_id = b.user_id {tfilter}
WHERE {eb} - {ea} > 0 AND {eb} - {ea} <= {width_s}
""".strip()


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    prefix: str = "next_",
) -> DataFrame:
    """Forward as-of join: every left row annotated with the SMALLEST
    ``right_ts`` at-or-after its ``left_ts`` (NULL if none) and the count
    of right rows at-or-after — the "next maintenance event after each
    error" direction the backward join cannot answer.

    Mirror image of :func:`asof_join`: left rows tag side 0 so a right
    row at the SAME instant sorts after them and lands in the
    CURRENT..FOLLOWING frame (inclusive match), and the running aggregate
    is a min/count over the following rows.  Same cost: one shuffle on
    the key, one per-partition sort.  NULL-key right rows are dropped
    (SQL-equality semantics), as in :func:`asof_join`.
    """
    lcols = [c for c in left.columns]
    right = right.filter(F.col(key).isNotNull())
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*lcols).alias("_payload"),
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_payload"].dataType).alias("_payload"),
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    right_ts_or_null = F.when(F.col("_side") == 1, F.col("_ts"))
    annotated = u.select(
        "_side",
        "_payload",
        F.min(right_ts_or_null).over(w).alias(f"{prefix}ts"),
        F.count(right_ts_or_null).over(w).alias(f"{prefix}n"),
    ).filter(F.col("_side") == 0)
    return annotated.select(
        *[F.col(f"_payload.{c}").alias(c) for c in lcols],
        f"{prefix}ts",
        f"{prefix}n",
    )


def gen_asof_forward_oracle(
    d: Dialect, left_type: str = "error", right_type: str = "signup"
) -> str:
    """Correlated-subquery oracle for the forward as-of join."""
    ea = d.epoch_s_events("a.ts")
    eb = d.epoch_s_events("b.ts")
    return f"""
SELECT a.event_id, a.user_id, {ea} AS left_ts_s,
  (SELECT min({eb}) FROM events b
   WHERE b.user_id = a.user_id AND b.event_type = '{right_type}' AND {eb} >= {ea}) AS next_ts,
  (SELECT count(*) FROM events b
   WHERE b.user_id = a.user_id AND b.event_type = '{right_type}' AND {eb} >= {ea}) AS next_n
FROM events a
WHERE a.event_type = '{left_type}'
""".strip()


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance_s: int,
    prefix: str = "asof_",
) -> DataFrame:
    """As-of join with a staleness bound (pandas ``merge_asof(tolerance=)``
    / kdb ``wj`` semantics): every left row annotated with the greatest
    ``right_ts`` in ``[left_ts - tolerance_s, left_ts]`` and the count of
    right rows in that window — matches older than the tolerance are NULL,
    not silently stale.

    Same union-tag shape as :func:`asof_join`, but the running window is a
    RANGE frame (``tolerance_s PRECEDING .. CURRENT ROW`` over the epoch-
    second order), so expiry needs no second pass: one shuffle on ``key``,
    one per-partition sort.  Equal-instant right rows are inside the frame
    by RANGE semantics (value-inclusive bounds), keeping the match
    inclusive like the unbounded variant.

    NULL join keys use SQL-equality semantics: ``Window.partitionBy``
    groups NULLs into one partition (which would let NULL-key left rows
    match NULL-key right rows), so NULL-key right rows are dropped and
    NULL-key left rows pass through unmatched — exactly what an equality
    join predicate produces.
    """
    lcols = [c for c in left.columns]
    right = right.filter(F.col(key).isNotNull())
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_payload"),
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_payload"].dataType).alias("_payload"),
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts")
        .rangeBetween(-int(tolerance_s), Window.currentRow)
    )
    right_ts_or_null = F.when(F.col("_side") == 0, F.col("_ts"))
    annotated = u.select(
        "_side",
        "_payload",
        F.max(right_ts_or_null).over(w).alias(f"{prefix}ts"),
        F.count(right_ts_or_null).over(w).alias(f"{prefix}n"),
    ).filter(F.col("_side") == 1)
    return annotated.select(
        *[F.col(f"_payload.{c}").alias(c) for c in lcols],
        f"{prefix}ts",
        f"{prefix}n",
    )


def gen_asof_tolerance_oracle(
    d: Dialect,
    tolerance_s: int,
    left_type: str = "click",
    right_type: str = "purchase",
) -> str:
    """Naive correlated-subquery formulation of the tolerance as-of —
    independently derived, so the RANGE-frame plan is checked against the
    predicate it claims to implement."""
    ea = d.epoch_s_events("a.ts")
    eb = d.epoch_s_events("b.ts")
    bounds = f"{eb} <= {ea} AND {eb} >= {ea} - {tolerance_s}"
    return f"""
SELECT a.event_id, a.user_id, {ea} AS left_ts_s,
  (SELECT max({eb}) FROM events b
   WHERE b.user_id = a.user_id AND b.event_type = '{right_type}' AND {bounds}) AS asof_ts,
  (SELECT count(*) FROM events b
   WHERE b.user_id = a.user_id AND b.event_type = '{right_type}' AND {bounds}) AS asof_n
FROM events a
WHERE a.event_type = '{left_type}'
""".strip()
