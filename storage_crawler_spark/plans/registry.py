"""Query registry: every operator the engine exposes, as (spark builder,
DuckDB oracle) pairs.

This is the driver contract's backing store (``__spark_entry__.queries()`` /
``oracle_sql()``) and the bench's headline-query source.  Three construction
styles, by what best fits each operator:

- **shared-dialect SQL** (TPC-H plane, views): one ANSI string both engines
  parse — zero drift by construction;
- **dialect-generated SQL** (text/dedup/similarity operators): one Python
  generator rendered per engine (plans/dialect.py);
- **DataFrame API + hand oracle** (report plane): the canonical engine
  implementation from reports/queries.py, with the DuckDB SQL mirroring it.

Float-parity rules applied throughout (the driver hashes values):
- money-ish SUMs go through DECIMAL(18,s) so summation order can't change
  the result; final cast to DOUBLE for a stable schema;
- AVGs are round(sum/count, 6); other float outputs round(·, 4..6);
- no raw timestamps in outputs — epoch seconds/days as BIGINT (session
  timezone independent).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storage_crawler_spark.operators import (
    analytics,
    cluster,
    dedup,
    multimodal,
    pipeline as pipeline_ops,
    sampling,
    similarity,
    text,
)
from storage_crawler_spark.plans.dialect import DUCK, SPARK, Dialect
from storage_crawler_spark.plans import views as V


@dataclass
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


def _persist_view(df: DataFrame, name: str) -> None:
    """Persist a relation and register it as a temp view — the pattern every
    builder with a multiply-referenced subplan uses (Spark inlines CTEs, so
    an un-persisted relation would recompute per reference)."""
    df.persist()
    df.createOrReplaceTempView(name)


def _sql_pair(gen: Callable[[Dialect], str], tables: tuple[str, ...]):
    """Builder+oracle from a dialect generator."""

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        V.register_base_tables(spark, sf_dir, tables)
        return spark.sql(gen(SPARK))

    return build, gen(DUCK)


def _shared_sql(sql: str, tables: tuple[str, ...]):
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        V.register_base_tables(spark, sf_dir, tables)
        return spark.sql(sql)

    return build, sql


# --------------------------------------------------------------------------
# TPC-H-style relational plane (shared-dialect SQL; money sums via DECIMAL)
# --------------------------------------------------------------------------

_DSUM2 = "CAST(sum(CAST({x} AS DECIMAL(18,2))) AS DOUBLE)"
_REV = "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)"

Q1_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {_DSUM2.format(x='l_quantity')} AS sum_qty,
  {_DSUM2.format(x='l_extendedprice')} AS sum_base_price,
  {_REV} AS sum_disc_price,
  CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)) * CAST(1 + l_tax AS DECIMAL(18,2)) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
  round({_DSUM2.format(x='l_quantity')} / count(*), 6) AS avg_qty,
  round({_DSUM2.format(x='l_extendedprice')} / count(*), 6) AS avg_price,
  round({_DSUM2.format(x='l_discount')} / count(*), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""".strip()

Q3_SQL = f"""
SELECT
  l.l_orderkey AS orderkey,
  {_REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')} AS revenue,
  CAST(o.o_orderdate AS DATE) AS orderdate,
  o.o_orderpriority AS orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND CAST(o.o_orderdate AS DATE) < DATE '1998-03-15'
  AND CAST(l.l_shipdate AS DATE) > DATE '1998-03-15'
GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
ORDER BY revenue DESC, orderkey
LIMIT 10
""".strip()

Q5_SQL = f"""
SELECT
  n.n_name AS nation,
  {_REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')} AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
""".strip()

Q6_SQL = """
SELECT
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  count(*) AS n_rows
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
""".strip()

TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t
WHERE rn <= 3
""".strip()

# Sliding-frame window: sum/count over an explicit ROWS frame.  The ratio is
# computed outside the frame from an exact DECIMAL sum — engines disagree on
# floating sliding-aggregate strategies (recompute vs add/remove), decimals
# don't care.
MOVING_AGG_SQL = """
SELECT event_id, event_type,
       (CAST(floor((CAST(win_sum AS DOUBLE) / win_n) * 1000000) AS DOUBLE) / 1000000) AS moving_avg,
       win_n
FROM (
  SELECT event_id, event_type,
         sum(CAST(value AS DECIMAL(18,2))) OVER w AS win_sum,
         count(value) OVER w AS win_n
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
) t
WHERE win_n > 0
""".strip()

# The full ranking-function family on one deterministic ordering: ties are
# REAL (o_orderstatus has few distinct values per priority), so rank vs
# dense_rank vs row_number genuinely diverge and percent_rank/cume_dist hit
# their tie semantics; the (o_orderpriority, o_orderkey) tiebreak pins
# row_number and ntile across engines.  Windows run on a pre-aggregated
# per-(priority, status) relation, so the sort is over dozens of rows.
RANK_FUNCTIONS_SQL = """
SELECT o_orderpriority, o_orderstatus, n_orders,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       row_number() OVER (PARTITION BY o_orderpriority
                          ORDER BY n_orders DESC, o_orderstatus) AS rn,
       ntile(3) OVER (PARTITION BY o_orderpriority
                      ORDER BY n_orders DESC, o_orderstatus) AS tile,
       (CAST(floor(percent_rank() OVER w * 1000000) AS DOUBLE) / 1000000) AS pct_rank,
       (CAST(floor(cume_dist() OVER w * 1000000) AS DOUBLE) / 1000000) AS cume
FROM (
  SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders
  FROM orders GROUP BY o_orderpriority, o_orderstatus
) t
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY n_orders DESC)
""".strip()

GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""".strip()

SETOPS_SQL = """
SELECT 'urgent_and_building' AS cohort, c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
) a
UNION ALL
SELECT 'building_never_urgent' AS cohort, c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
) b
""".strip()


def gen_event_deltas(d: Dialect) -> str:
    e = d.epoch_s_events("ts")
    return f"""
SELECT event_id, event_type, epoch_s,
       epoch_s - lag(epoch_s) OVER (PARTITION BY event_type ORDER BY event_id) AS delta_s
FROM (SELECT event_id, event_type, {e} AS epoch_s FROM events) t
""".strip()


def gen_rate_anomaly(
    d: Dialect, window_s: int = 3600, trail: int = 6, z_thresh: float = 2.0
) -> str:
    """Windowed rate-anomaly detector: per event_type, flag time windows
    whose event count deviates from the trailing ``trail``-window mean by
    ≥ ``z_thresh`` standard deviations — the monitoring query behind every
    "ingest rate spiked/died" alert.  The batch formulation here is the
    replay/backfill path; the same window-count relation is what the
    streaming tier emits (streaming_window_counts), so the detector runs
    unchanged over either.

    Trailing mean/std come from EXACT integer window sums (Σn, Σn², count
    over a ROWS frame) rather than avg/stddev_samp — the engines' sliding
    floating aggregates differ algorithmically (recompute vs add/remove,
    Welford vs sum-of-squares), but BIGINT sums are exact and the final
    few IEEE-rounded double ops are bit-identical, so even the z-threshold
    FILTER decisions agree across engines (same trick as MOVING_AGG_SQL's
    DECIMAL sums).  The effective std floors at 1.0 — the count-data noise
    floor: a spike after a PERFECTLY steady baseline has trailing variance
    0, and a raw z would either divide by zero or (with a var > 0 filter)
    silently drop the most obvious anomaly there is; the floor also stops
    sub-Poisson trails from amplifying 1-count jitter into alarms.  Gaps:
    empty windows produce no row, so the trailing frame spans the last
    ``trail`` OBSERVED windows — a total outage surfaces as the spike on
    resumption (documented, not hidden).

    100 TB shape: one partial-combining aggregate to the per-(type,
    window) relation — tiny — and the window functions run on THAT, so the
    per-type sort is over window counts, not events.  The frame is ROWS,
    not RANGE: O(1) state per step.
    """
    e = d.epoch_s_events("ts")
    ws = d.idiv("epoch_s", str(window_s))
    return f"""
WITH w AS (
  SELECT CAST({ws} AS BIGINT) * {window_s} AS window_start, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM (SELECT event_type, {e} AS epoch_s FROM events) t0
  GROUP BY window_start, event_type
),
s AS (
  SELECT window_start, event_type, n,
         CAST(sum(n) OVER tw AS DOUBLE) AS s1,
         CAST(sum(n * n) OVER tw AS DOUBLE) AS s2,
         CAST(count(n) OVER tw AS DOUBLE) AS m
  FROM w
  WINDOW tw AS (PARTITION BY event_type ORDER BY window_start
                ROWS BETWEEN {trail} PRECEDING AND 1 PRECEDING)
)
SELECT window_start, event_type, n AS n_events,
       {d.trunc6('mean_n')} AS trail_mean,
       {d.trunc6('sd_eff')} AS trail_std,
       {d.trunc6('(n - mean_n) / sd_eff')} AS z
FROM (
  SELECT window_start, event_type, n, mean_n,
         greatest(sqrt(var_n), 1.0) AS sd_eff
  FROM (
    SELECT window_start, event_type, n, s1 / m AS mean_n,
           (s2 - s1 * s1 / m) / (m - 1) AS var_n
    FROM s
    WHERE m >= 4
  ) t0
) t
WHERE abs(n - mean_n) >= {z_thresh} * sd_eff
ORDER BY event_type, window_start
""".strip()


def gen_rollup_daily(d: Dialect) -> str:
    e = d.epoch_s_events("ts")
    day = f"(({e}) // 86400)" if d.name == "duck" else f"(({e}) div 86400)"
    return f"""
SELECT event_type, day_num, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (SELECT event_type, {day} AS day_num, value FROM events) t
GROUP BY ROLLUP(event_type, day_num)
""".strip()


def gen_json_props(d: Dialect) -> str:
    k = f"CAST({d.json_str('props', '$.k')} AS BIGINT)"
    return f"""
SELECT event_type, count(*) AS n, min({k}) AS min_k, max({k}) AS max_k, CAST(sum({k}) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
""".strip()


def _anti_join_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no urgent order (every customer has SOME order in the
    synthetic data, so the plain no-orders anti-join is vacuously empty —
    the priority condition makes the check exercise real row elimination)."""
    V.register_base_tables(spark, sf_dir, ("customer", "orders"))
    cust = spark.table("customer")
    orders = spark.table("orders")
    cond = (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority == "1-URGENT")
    return cust.join(orders, cond, "left_anti").select("c_custkey", "c_name")


ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""".strip()

# --------------------------------------------------------------------------
# Dedup builders that materialize a shared intermediate once (Spark inlines
# CTEs, so multi-referenced relations recompute without an explicit persist;
# at 100 TB these would be checkpointed signature/prep tables).
# --------------------------------------------------------------------------


def _parquet_row_count(path: str) -> int:
    """Exact row count from parquet footers — a driver-side metadata read
    (no Spark job), for single files or directories of part files.  Used as
    a strategy gate, where a full count() job would cost a scan."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        return sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.read_metadata(path).num_rows


def _b_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    V.register_base_tables(spark, sf_dir, ("documents",))
    # Repartition the *input* before the tokenize/md5 prep runs: the source
    # may be a single parquet file (1 partition), and both the map-heavy prep
    # and the O(pairs) intersect work downstream inherit the cached
    # partitioning — without this the whole operator runs as one task no
    # matter how many cores exist.
    n = spark.sparkContext.defaultParallelism
    spark.table("documents").repartition(n).createOrReplaceTempView("_documents_rep")
    # One persisted relation: prep (tokenize+md5, the expensive map) with the
    # sorted-neighborhood rank joined on; the pair join references it twice
    # from cache.  Rank strategy by size: below the threshold, a narrow SQL
    # window over the pruned source (fewest stages — wins at bench scale);
    # above it, the two-phase range-partitioned rank (scalable_lang_rank) so
    # no single lang funnels through one sort task.  Both are bit-identical
    # (pytest-proven); the window formulation is always the oracle.  Size
    # comes from parquet footers (metadata only) — not a count() scan job.
    if _parquet_row_count(f"{sf_dir}/documents.parquet") < 1_000_000:
        spark.sql(dedup.gen_jaccard_prep(SPARK, src="_documents_rep")).createOrReplaceTempView(
            "_jaccard_prep"
        )
        ranked = spark.sql(dedup.gen_jaccard_ranked(SPARK, "_jaccard_prep", src="documents"))
    else:
        ranked = dedup.scalable_lang_rank(
            spark.sql(dedup.gen_jaccard_prep(SPARK, src="_documents_rep"))
        )
    _persist_view(ranked, "_jaccard_ranked")
    return spark.sql(dedup.gen_jaccard_pairs(SPARK, ranked_rel="_jaccard_ranked"))


def _b_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    V.register_base_tables(spark, sf_dir, ("documents",))
    n = spark.sparkContext.defaultParallelism
    spark.table("documents").repartition(n).createOrReplaceTempView("_documents_rep")
    sigs = spark.sql(dedup.gen_minhash_sigs(SPARK, src="_documents_rep"))
    _persist_view(sigs, "_minhash_sigs")
    return spark.sql(dedup.gen_minhash_pairs(SPARK, sigs_rel="_minhash_sigs"))


def _b_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    V.register_base_tables(spark, sf_dir, ("documents",))
    n = spark.sparkContext.defaultParallelism
    spark.table("documents").repartition(n).createOrReplaceTempView("_documents_rep")
    sigs = spark.sql(dedup.gen_minhash_sigs(SPARK, src="_documents_rep"))
    _persist_view(sigs, "_minhash_sigs_inc")
    return spark.sql(dedup.gen_minhash_pairs_incremental(SPARK, sigs_rel="_minhash_sigs_inc"))


# Independent oracle formulation: the FULL pair join, restricted to pairs
# touching a new doc — the incremental builder never generates old-old
# candidates, so equality here proves the restriction is exact.
_MINHASH_INC_ORACLE = (
    "SELECT doc_a, doc_b, est_jaccard FROM (\n"
    + dedup.gen_minhash_pairs(DUCK)
    + "\n) full_pairs WHERE doc_a % 10 = 0 OR doc_b % 10 = 0"
)


def _b_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minhash-LSH pairs → connected components → keeper per cluster."""
    V.register_base_tables(spark, sf_dir, ("documents",))
    n = spark.sparkContext.defaultParallelism
    spark.table("documents").repartition(n).createOrReplaceTempView("_documents_rep")
    sigs = spark.sql(dedup.gen_minhash_sigs(SPARK, src="_documents_rep"))
    _persist_view(sigs, "_minhash_sigs_cc")
    return cluster.build_minhash_clusters(spark, SPARK, sigs_rel="_minhash_sigs_cc")


def _b_cluster_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    V.register_base_tables(spark, sf_dir, ("documents",))
    n = spark.sparkContext.defaultParallelism
    spark.table("documents").repartition(n).createOrReplaceTempView("_documents_rep")
    sigs = spark.sql(dedup.gen_minhash_sigs(SPARK, src="_documents_rep"))
    _persist_view(sigs, "_minhash_sigs_ck")
    return cluster.build_minhash_cluster_keepers(spark, SPARK, sigs_rel="_minhash_sigs_ck")


# --------------------------------------------------------------------------
# Report plane (reference report.py queries over the derived files/status
# views) — DataFrame API builders, hand-written DuckDB oracles.
# --------------------------------------------------------------------------

_DUCK_EPOCH = "CAST(floor(epoch(time)) AS BIGINT)"


def _status_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """status view; ``time`` is already a canonical TIMESTAMP (events.ts is
    normalized schema-adaptively in views.register_base_tables)."""
    return V.status_view(spark, sf_dir)


def _files_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return V.files_view(spark, sf_dir)


def _b_status_full(spark, sf_dir):
    from storage_crawler_spark.reports.queries import status_full

    out = status_full(_status_df(spark, sf_dir))
    return out.select(F.col("time").cast("long").alias("time_s"), "status", "value", "units")


def _b_status_events(spark, sf_dir):
    from storage_crawler_spark.reports.queries import status_events

    out = status_events(_status_df(spark, sf_dir))
    return out.select(F.col("time").cast("long").alias("time_s"), "status", "value", "units")


def _b_status_averages(spark, sf_dir):
    from storage_crawler_spark.reports.queries import status_averages

    out = status_averages(_status_df(spark, sf_dir))
    return out.select("status", "units", F.round("avg", 6).alias("avg_value"))


def _b_status_brief(spark, sf_dir):
    from storage_crawler_spark.reports.queries import status_brief

    out = status_brief(_status_df(spark, sf_dir))
    return out.select(F.col("time").cast("long").alias("time_s"), "status", "value", "units")


def _b_first_thousand(spark, sf_dir):
    from storage_crawler_spark.reports.queries import first_thousand

    return first_thousand(_files_df(spark, sf_dir), deterministic=True)


def _b_large_old_files(spark, sf_dir):
    from storage_crawler_spark.reports.queries import large_old_files

    fv = _files_df(spark, sf_dir)
    canonical = fv.select(
        "id",
        F.timestamp_seconds(F.col("insert_epoch")).alias("insert_time"),
        F.encode("path", "utf-8").alias("path"),
        F.encode("extension", "utf-8").alias("extension"),
        "st_size",
        "st_uid",
        "st_gid",
        "st_atime",
        "st_mtime",
        "st_ctime",
        "owner",
    )
    return large_old_files(
        canonical,
        min_size=V.FILES_MIN_SIZE,
        min_delta=V.FILES_MIN_DELTA,
        as_of_epoch=V.FILES_AS_OF_EPOCH,
    )


LARGE_OLD_ORACLE = V.with_files_cte(
    f"""
SELECT insert_epoch, path, id, st_size, extension, st_uid, st_gid,
       st_atime, st_mtime, st_ctime, owner
FROM files
WHERE st_size >= {V.FILES_MIN_SIZE}
  AND (st_ctime + {V.FILES_MIN_DELTA} >= {V.FILES_AS_OF_EPOCH}
       OR st_mtime + {V.FILES_MIN_DELTA} >= {V.FILES_AS_OF_EPOCH})
""".strip()
)

_FILES_COLS = (
    "id",
    "insert_epoch",
    "path",
    "st_size",
    "st_mtime",
    "st_ctime",
    "st_atime",
    "st_uid",
    "st_gid",
    "owner",
    "extension",
)


def _b_schema_files(spark, sf_dir):
    fv = _files_df(spark, sf_dir)
    return spark.createDataFrame([(c,) for c in sorted(fv.columns)], "column_name string")


SCHEMA_FILES_ORACLE = (
    "SELECT * FROM (VALUES "
    + ", ".join(f"('{c}')" for c in sorted(_FILES_COLS))
    + ") t(column_name)"
)

# --------------------------------------------------------------------------
# Skew builders
# --------------------------------------------------------------------------


def _b_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_crawler_spark.operators.skew import salted_agg

    V.register_base_tables(spark, sf_dir, ("orders",))
    df = spark.table("orders").withColumn(
        "price_dec", F.col("o_totalprice").cast("decimal(18,2)")
    )
    out = salted_agg(
        df,
        key="o_orderstatus",
        aggs={
            "n_orders": "count(*)",
            "sum_price": "sum(price_dec)",
            "max_price": "max(o_totalprice)",
            "min_key": "min(o_orderkey)",
        },
        spread_cols=["o_orderkey"],
        n_salts=16,
    )
    return out.select(
        "o_orderstatus",
        "n_orders",
        F.col("sum_price").cast("double").alias("sum_price"),
        "max_price",
        "min_key",
    )


SALTED_AGG_ORACLE = """
SELECT o_orderstatus, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       max(o_totalprice) AS max_price, min(o_orderkey) AS min_key
FROM orders GROUP BY o_orderstatus
""".strip()


# --------------------------------------------------------------------------
# Streaming builders (events file stream, run to completion)
# --------------------------------------------------------------------------

_WINDOW_S = 300
_SESSION_GAP_S = 30


def _b_streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_crawler_spark.streaming import read_events_stream, run_to_completion, windowed_counts

    return run_to_completion(windowed_counts(read_events_stream(spark, sf_dir), _WINDOW_S))


def _b_streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_crawler_spark.streaming import read_events_stream, run_to_completion, session_counts

    return run_to_completion(session_counts(read_events_stream(spark, sf_dir), _SESSION_GAP_S))


def _b_streaming_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_crawler_spark.streaming import per_key_deltas, read_events_stream, run_to_completion

    return run_to_completion(per_key_deltas(read_events_stream(spark, sf_dir)), output_mode="update")


def _b_streaming_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_crawler_spark.streaming import (
        rate_anomaly_stream,
        read_events_stream,
        run_to_completion,
    )

    return run_to_completion(
        rate_anomaly_stream(read_events_stream(spark, sf_dir)), output_mode="update"
    )


def _b_streaming_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_crawler_spark.streaming import attribution_join, read_events_stream, run_to_completion

    return run_to_completion(
        attribution_join(read_events_stream(spark, sf_dir), _WINDOW_S), output_mode="append"
    )


def _b_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_crawler_spark.streaming import read_events_stream, run_to_completion, stream_dedup

    return run_to_completion(stream_dedup(read_events_stream(spark, sf_dir)), output_mode="append")


_USER_GAP_S = 120


def _b_streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_crawler_spark.streaming import read_events_stream, run_to_completion, user_sessions

    return run_to_completion(user_sessions(read_events_stream(spark, sf_dir), _USER_GAP_S))


_DUCK_EPOCH_EVENTS = "CAST(floor(epoch(ts)) AS BIGINT)"

STREAMING_WINDOW_ORACLE = f"""
SELECT (epoch_s // {_WINDOW_S}) * {_WINDOW_S} AS window_start, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (SELECT {_DUCK_EPOCH_EVENTS} AS epoch_s, event_type, value FROM events) t
GROUP BY 1, 2
""".strip()

# Session windows merge events with inter-arrival <= gap (verified: exactly
# gap apart DOES merge), so islands break on delta > gap; session end is
# last event + gap.
STREAMING_ATTRIBUTION_ORACLE = f"""
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       {_DUCK_EPOCH_EVENTS.replace('ts', 'c.ts')} AS click_s,
       {_DUCK_EPOCH_EVENTS.replace('ts', 'p.ts')} AS purchase_s,
       round(p.value, 4) AS purchase_value
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND {_DUCK_EPOCH_EVENTS.replace('ts', 'p.ts')} >= {_DUCK_EPOCH_EVENTS.replace('ts', 'c.ts')}
 AND {_DUCK_EPOCH_EVENTS.replace('ts', 'p.ts')} <= {_DUCK_EPOCH_EVENTS.replace('ts', 'c.ts')} + {_WINDOW_S}
""".strip()

# The event_id tiebreak in BOTH windows below is load-bearing: with only
# ORDER BY epoch_s, rows sharing a timestamp are visited in nondeterministic
# order by the ROWS-frame island sum, and a tied row can land in the
# PREVIOUS island while its twin starts the new one (found by the randomized
# events parity tests — Spark's session_window is order-insensitive and
# never splits a tie).  A total order makes the brk=1 row lead its tie
# group, so all tied rows share an island.
STREAMING_USER_SESSIONS_ORACLE = f"""
WITH e AS (SELECT event_id, user_id, event_type, {_DUCK_EPOCH_EVENTS} AS epoch_s FROM events),
l AS (
  SELECT event_id, user_id, event_type, epoch_s,
         CASE WHEN epoch_s - lag(epoch_s) OVER (PARTITION BY user_id ORDER BY epoch_s, event_id)
                   > 120 THEN 1 ELSE 0 END AS brk
  FROM e
),
i AS (
  SELECT user_id, event_type, epoch_s,
         sum(brk) OVER (PARTITION BY user_id ORDER BY epoch_s, event_id
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM l
)
SELECT user_id, min(epoch_s) AS session_start, max(epoch_s) + 120 AS session_end,
       count(*) AS n_events,
       max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
FROM i
GROUP BY user_id, island
""".strip()

STREAMING_SESSION_ORACLE = f"""
WITH e AS (SELECT event_id, event_type, {_DUCK_EPOCH_EVENTS} AS epoch_s FROM events),
l AS (
  SELECT event_id, event_type, epoch_s,
         CASE WHEN epoch_s - lag(epoch_s) OVER (PARTITION BY event_type ORDER BY epoch_s, event_id)
                   > {_SESSION_GAP_S} THEN 1 ELSE 0 END AS brk
  FROM e
),
i AS (
  SELECT event_type, epoch_s,
         sum(brk) OVER (PARTITION BY event_type ORDER BY epoch_s, event_id
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM l
)
SELECT min(epoch_s) AS session_start, max(epoch_s) + {_SESSION_GAP_S} AS session_end,
       event_type, count(*) AS n_events
FROM i
GROUP BY event_type, island
""".strip()


# --------------------------------------------------------------------------
# Registry assembly
# --------------------------------------------------------------------------


def _specs() -> list[QuerySpec]:
    specs: list[QuerySpec] = []

    def add(name, builder, oracle, headline=False, tags=(), doc=""):
        specs.append(QuerySpec(name, builder, oracle, headline, tuple(tags), doc))

    # report plane ---------------------------------------------------------
    add(
    

def _ordered(specs: list[QuerySpec]) -> list[QuerySpec]:
    pos = {name: i for i, name in enumerate(_DRIVER_WINDOW_FIRST)}
    front = sorted((s for s in specs if s.name in pos), key=lambda s: pos[s.name])
    rest = [s for s in specs if s.name not in pos]
    return front + rest


QUERIES: dict[str, QuerySpec] = {s.name: s for s in _ordered(_specs())}


def get_query(name: str) -> QuerySpec:
    return QUERIES[name]


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.builder for name, spec in QUERIES.items()}


def oracle_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}


def headline_queries() -> list[str]:
    return [name for name, spec in QUERIES.items() if spec.headline]
