"""The reference's report-query menu as declarative DataFrame plans.

Each function re-expresses one canned PostgreSQL query of the reference's
report tool (report.py:103-235) over the canonical ``files``/``status``
DataFrames.  All are pure Catalyst plans: filters and projections push into
the scan, the argmax-per-group is a broadcast semi-join, sorts/limits fuse
into TakeOrderedAndProject where combined.  Column aliases are stable so
downstream renderers and the correctness harness can rely on them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Hard-coded invocation constants of the reference CLI (report.py:235):
# 3 GiB size floor, 608400-second (~7 day) recency window.
LARGE_OLD_MIN_SIZE = 3 * 1024**3
LARGE_OLD_MIN_DELTA = 608_400


def status_full(status: DataFrame) -> DataFrame:
    """'full' action: second-truncated time, all rows, time-ordered
    (report.py:118-121)."""
    return status.select(
        F.date_trunc("second", "time").alias("time"),
        "status",
        "value",
        "units",
    ).orderBy("time")


def status_events(status: DataFrame) -> DataFrame:
    """'events' action: only event rows (units = 'event'), time-ordered,
    projecting exactly (time, status) as the reference does
    (report.py:128-131 — the 'full' action carries value/units; 'events'
    deliberately does not)."""
    return (
        status.filter(F.col("units") == "event")
        .select(F.date_trunc("second", "time").alias("time"), "status")
        .orderBy("time")
    )


def status_averages(status: DataFrame) -> DataFrame:
    """'averages' action: AVG(value) per (status, units) over '%rate'
    statuses, ordered by units (report.py:139-145)."""
    return (
        status.filter(F.col("status").like("%rate"))
        .groupBy("status", "units")
        .agg(F.avg("value").alias("avg"))
        .orderBy("units")
    )


def status_brief(status: DataFrame) -> DataFrame:
    """'brief' action: the latest row per status key via the reference's
    IN-(SELECT MAX(id) GROUP BY status) shape (report.py:153-159) — kept as
    a semi-join so the engine exercises that operator; the inner aggregate
    is tiny and broadcasts."""
    # semi-join on id ALONE — the reference's `id IN (SELECT MAX(id) ...
    # GROUP BY status)` is id-membership, which keeps the NULL-status
    # group's latest row; a (status, id) join key would drop it (NULL
    # never equi-matches — NULL-key battery catch)
    latest = status.groupBy("status").agg(F.max("id").alias("id")).select("id")
    return (
        status.join(F.broadcast(latest), on="id", how="left_semi")
        .select(F.date_trunc("second", "time").alias("time"), "status", "value", "units")
        .orderBy("time")
    )


def first_thousand(files: DataFrame, deterministic: bool = False) -> DataFrame:
    """'1000' action: LIMIT 1000 (report.py:166-175).  The reference has no
    ORDER BY — a nondeterministic row set; pass deterministic=True to pin
    the row set by id for oracle comparison."""
    return files.orderBy("id").limit(1000) if deterministic else files.limit(1000)


def large_old_files(
    files: DataFrame,
    min_size: int = LARGE_OLD_MIN_SIZE,
    min_delta: int = LARGE_OLD_MIN_DELTA,
    as_of_epoch: Column | int | None = None,
) -> DataFrame:
    """'largeoldfiles' action (report.py:178-191): large files *recently*
    changed on either ctime or mtime (backup candidates), multi-key sorted by
    GREATEST/LEAST of the two times, both descending.

    ``as_of_epoch`` replaces the reference's ``NOW()`` for deterministic
    replay; defaults to current time like the reference.
    """
    from storage_crawler_spark.functions.paths import pg_escape_col

    now = F.unix_timestamp() if as_of_epoch is None else F.lit(as_of_epoch)
    recent = (F.col("st_ctime") + min_delta >= now) | (F.col("st_mtime") + min_delta >= now)
    return (
        files.filter((F.col("st_size") >= min_size) & recent)
        .select(
            F.col("insert_time").cast("long").alias("insert_epoch"),
            pg_escape_col(F.col("path")).alias("path"),
            F.col("id"),
            F.col("st_size"),
            pg_escape_col(F.col("extension")).alias("extension"),
            F.col("st_uid"),
            F.col("st_gid"),
            F.col("st_atime"),
            F.col("st_mtime"),
            F.col("st_ctime"),
            F.col("owner"),
        )
        .orderBy(
            F.greatest("st_mtime", "st_ctime").desc(),
            F.least("st_mtime", "st_ctime").desc(),
        )
    )


def table_schema(spark: SparkSession, table: str) -> DataFrame:
    """'schema'/'schema-all' action: column name/type/nullability via the
    catalog — the information_schema introspection of report.py:103-112."""
    cols = spark.catalog.listColumns(table)
    return spark.createDataFrame(
        [(c.name, c.dataType, c.nullable) for c in cols],
        "column_name string, data_type string, is_nullable boolean",
    )
