"""Derived canonical views over the driver's synthetic tables.

The correctness harness compares our Spark plans against DuckDB running on
the same parquet files, so every reference-plane query (which wants
``files``/``status`` tables) is expressed over *deterministic derivations*
of the driver tables.  The derivation SQL below is written in the common
SQL dialect both engines parse identically (||, CASE, %, instr, substr,
length, greatest, CAST), so one string serves as both the Spark temp view
and the DuckDB CTE — derivation drift between engines is impossible.

``files`` is derived from ``documents`` (doc_id → path/size/times/owner),
``status`` from ``events`` (event_id/ts/event_type → id/time/status/value/
units).  Path shapes are chosen to exercise every find_extension edge:
dotless names, multi-dot tails, >6-char extensions (tail-scan miss →
fall-through), and dotted directory components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

# -- extension, as the reference computes it (storcrawl.py:259-268), for
# clean-ASCII paths, in the common dialect.  The negative scan covers the
# last min(L+1, len) bytes EXCLUDING the final byte (path[-1:0] is empty);
# on miss it falls through and rescans from the start.
EXTENSION_EXPR = """
CASE
  WHEN instr(substr({p}, greatest(1, length({p}) - 6), length({p}) - greatest(1, length({p}) - 6)), '.') > 0
    THEN substr({p}, greatest(1, length({p}) - 6) + instr(substr({p}, greatest(1, length({p}) - 6), length({p}) - greatest(1, length({p}) - 6)), '.'))
  WHEN instr({p}, '.') > 0
    THEN substr({p}, instr({p}, '.') + 1)
  ELSE NULL
END
""".strip()

FILES_VIEW_SQL = f"""
SELECT
  doc_id AS id,
  CAST(1710000000 + doc_id AS BIGINT) AS insert_epoch,
  (CASE CAST(doc_id % 3 AS INTEGER)
     WHEN 0 THEN '/data/' || source
     WHEN 1 THEN '/data/v1.0/' || source
     ELSE '/archive/' || source
   END) || '/' ||
  (CASE CAST(doc_id % 5 AS INTEGER)
     WHEN 0 THEN 'doc_' || CAST(doc_id AS STRING)
     WHEN 1 THEN 'doc_' || CAST(doc_id AS STRING) || '.tarball'
     WHEN 2 THEN 'doc_' || CAST(doc_id AS STRING) || '.tar.gz'
     WHEN 3 THEN 'doc_' || CAST(doc_id AS STRING) || '.' || lang || '.txt'
     ELSE 'doc_' || CAST(doc_id AS STRING) || '.dat'
   END) AS path,
  CAST(n_chars * 4096 AS BIGINT) AS st_size,
  CAST(1700000000 + (doc_id * 7919) % 900000 AS BIGINT) AS st_mtime,
  CAST(1700000000 + (doc_id * 104729) % 900000 AS BIGINT) AS st_ctime,
  CAST(1700000000 + (doc_id * 13) % 900000 AS BIGINT) AS st_atime,
  CAST(doc_id % 10 AS BIGINT) AS st_uid,
  CAST(doc_id % 5 AS BIGINT) AS st_gid,
  CASE WHEN doc_id % 7 = 0 THEN NULL
       ELSE 'owner_' || CAST(CAST(doc_id % 7 AS INTEGER) AS STRING) END AS owner
FROM documents
""".strip()

# extension is derived from the path expression; computed in a wrapper so the
# common dialect stays readable.
FILES_WITH_EXT_SQL = (
    "SELECT f.*, " + EXTENSION_EXPR.format(p="f.path") + " AS extension FROM (" + FILES_VIEW_SQL + ") f"
)

# Deterministic as-of instant for 'recent change' predicates (replaces the
# reference's NOW(), which an oracle comparison cannot reproduce).
FILES_AS_OF_EPOCH = 1_700_500_000
# Scaled-down large/recent thresholds for the synthetic sizes/times above
# (the reference CLI hardcodes 3 GiB / 608400 s, report.py:235 — kept for
# real crawls in reports/queries.py; these drive the oracle-checked plan).
FILES_MIN_SIZE = 600_000
FILES_MIN_DELTA = 500_000

STATUS_VIEW_SQL = """
SELECT
  event_id AS id,
  ts AS time,
  CASE event_type
    WHEN 'click' THEN 'file stat rate'
    WHEN 'view' THEN 'file walk rate'
    WHEN 'purchase' THEN 'insert rate'
    ELSE event_type
  END AS status,
  CASE WHEN event_type = 'signup' THEN NULL ELSE value END AS value,
  CASE event_type
    WHEN 'click' THEN 'files/sec'
    WHEN 'view' THEN 'entries/sec'
    WHEN 'purchase' THEN 'inserts/sec'
    WHEN 'error' THEN 'errors'
    ELSE 'event'
  END AS units
FROM events
""".strip()

BASE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_events_ts(events: DataFrame) -> DataFrame:
    """Canonicalize ``events.ts`` to a session-timezone TIMESTAMP whatever
    physical parquet type the driver wrote this round:

    - nanosecond parquet → Spark reads LONG (under ``nanosAsLong``):
      ``timestamp_micros(ts div 1000)``;
    - microsecond parquet → Spark reads TIMESTAMP_NTZ: reinterpreted in the
      (UTC-pinned) session timezone, matching DuckDB's naive ``epoch()``;
    - tz-aware parquet → already TIMESTAMP, passed through.

    Every consumer (``Dialect.epoch_s_events`` → ``unix_seconds(ts)``, the
    status view, the streaming source, the temporal joins) reads the
    canonical column, so a future driver-side dtype flip only touches here.
    """
    dt = events.schema["ts"].dataType
    if isinstance(dt, LongType):
        return events.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, TimestampNTZType):
        return events.withColumn("ts", F.col("ts").cast("timestamp"))
    return events


def register_base_tables(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = BASE_TABLES) -> None:
    """Register the driver parquet tables as temp views (idempotent).

    ``events.ts`` is normalized to TIMESTAMP via :func:`normalize_events_ts`
    (schema-adaptive: LONG nanos or TIMESTAMP/NTZ micros) so second-level
    results match DuckDB's native timestamp reading regardless of the
    parquet physical type.  The session timezone is pinned UTC here — the
    NTZ reinterpretation and ``unix_seconds`` both depend on it, and the
    driver's session may not come from session.build_session.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for name in tables:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = normalize_events_ts(df)
        df.createOrReplaceTempView(name)


def files_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_base_tables(spark, sf_dir, ("documents",))
    return spark.sql(FILES_WITH_EXT_SQL)


def status_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_base_tables(spark, sf_dir, ("events",))
    return spark.sql(STATUS_VIEW_SQL)


def with_files_cte(select_sql: str) -> str:
    """Wrap an oracle SELECT with the files-view CTE (DuckDB side)."""
    return f"WITH files AS ({FILES_WITH_EXT_SQL})\n{select_sql}"


def with_status_cte(select_sql: str) -> str:
    return f"WITH status AS ({STATUS_VIEW_SQL})\n{select_sql}"
