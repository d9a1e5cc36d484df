"""PostgreSQL parity adapter: schema-per-tag DDL + batched JDBC writes.

The reference's sink is psycopg2 row-at-a-time INSERTs, group-committed on
a timer (storcrawl.py:314-417), after a DDL bootstrap that drops and
re-creates the per-tag schema (storcrawl.py:88-164) and provisions a
read-only reporting user (storcrawl.py:166-215).  Here the DDL is rendered
from the engine's canonical StructType schemas — one source of truth — and
the data path is Spark's JDBC writer: executor-parallel batched INSERTs
(``batchsize``), the scalable replacement for group commit.

No upstream PostgreSQL JDBC driver jar ships in this environment (and the
sandbox has no network to fetch one), so the repo VENDORS a minimal
wire-protocol JDBC driver (vendor/minipg — Simple Query protocol, text
format, trust/cleartext auth) registered for the standard
``jdbc:postgresql:`` URL prefix, which makes Spark resolve its REAL
PostgresDialect and exercise its real type mapping.  ``write_files_jdbc``
prefers upstream pgjdbc when a deployment provides it and falls back to
the vendored driver; tests/test_postgres_spark_jdbc.py round-trips real
crawl rows (bytea path with non-UTF-8 bytes, bit(19) mode, timestamptz)
through Spark's JDBC writer AND ``spark.read.jdbc`` against a live
PostgreSQL 15.  The embedded-Derby round-trip
(tests/test_sources.py::test_jdbc_write_round_trip_embedded_derby)
remains as the second-database check of the same sink.

The PostgreSQL DDL itself is no longer render-only (r12): a PostgreSQL 15
server IS available, and tests/test_postgres_e2e.py executes the full
lifecycle against it — destructive schema re-create (twice, proving the
DROP..CASCADE), real crawl rows COPYed through the rendered bytea /
bit(19) / timestamptz columns with a non-UTF-8 path round-tripping
byte-for-byte, and the reporting user provisioned with its read-only
grant proven by querying AS that user and being denied the write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from storage_crawler_spark.schemas import FILES_SCHEMA, STATUS_SCHEMA

# Spark type → PostgreSQL type for the reference's files DDL
# (storcrawl.py:132-148; bit(19) and bytea restored on the way out).
_PG_OVERRIDES = {
    "path": "bytea",
    "extension": "bytea",
    "st_mode": "bit(19)",
    "st_dev": "text",
}

_PG_TYPES = {
    T.LongType(): "bigint",
    T.IntegerType(): "int",
    T.DoubleType(): "double precision",
    T.StringType(): "text",
    T.BinaryType(): "bytea",
    T.TimestampType(): "timestamp with time zone",
    T.BooleanType(): "boolean",
}


def _pg_type(field: T.StructField) -> str:
    if field.name in _PG_OVERRIDES:
        return _PG_OVERRIDES[field.name]
    return _PG_TYPES.get(field.dataType, "text")


def _render_table(schema_name: str, table: str, st: T.StructType, serial_id: bool) -> str:
    cols = []
    for f in st.fields:
        if serial_id and f.name == "id":
            cols.append("id SERIAL")
            continue
        null = "" if f.nullable else " NOT NULL"
        cols.append(f"{f.name} {_pg_type(f)}{null}")
    body = ",\n  ".join(cols)
    return f"CREATE TABLE {schema_name}.{table} (\n  {body}\n)"


def files_table_ddl(tag: str) -> str:
    """files DDL (storcrawl.py:132-148) rendered from FILES_SCHEMA."""
    return _render_table(f"storcrawl_{tag}", "files", FILES_SCHEMA, serial_id=True)


def status_table_ddl(tag: str) -> str:
    """Normalized status DDL (SURVEY.md §1.3 design decision: the jsonb
    blob the reference creates cannot serve its own report queries)."""
    return _render_table(f"storcrawl_{tag}", "status", STATUS_SCHEMA, serial_id=True)


def schema_lifecycle_ddl(tag: str) -> list[str]:
    """The destructive re-create sequence (storcrawl.py:88-164)."""
    s = f"storcrawl_{tag}"
    return [
        f"DROP SCHEMA IF EXISTS {s} CASCADE",
        f"CREATE SCHEMA {s}",
        files_table_ddl(tag),
        status_table_ddl(tag),
    ]


def reporting_user_ddl(tag: str, user: str, password: str, database: str = "storcrawl") -> list[str]:
    """Read-only reporting-user provisioning (storcrawl.py:166-215).

    ``database`` is interpolated into the GRANT CONNECT like the reference's
    configured db name — a function call (``current_database()``) is not
    legal PostgreSQL in identifier position."""
    s = f"storcrawl_{tag}"
    return [
        f"DROP OWNED BY {user}",
        f"DROP USER IF EXISTS {user}",
        f"CREATE USER {user} ENCRYPTED PASSWORD '{password}'",
        f"GRANT USAGE ON SCHEMA {s} TO {user}",
        f"GRANT SELECT ON ALL TABLES IN SCHEMA {s} TO {user}",
        f"ALTER DEFAULT PRIVILEGES IN SCHEMA {s} GRANT SELECT ON TABLES TO {user}",
        f'GRANT CONNECT ON DATABASE "{database}" TO {user}',
    ]


def _resolve_pg_driver(spark, url: str) -> str:
    """Pick the PostgreSQL JDBC driver class available on the DRIVER
    classloader: upstream pgjdbc when a deployment provides it, else the
    vendored minimal driver (vendor/minipg, put on the classpath by
    session.build_session).  Explicit ``properties={'driver': ...}`` from
    the caller always wins over this probe."""
    if not url.startswith("jdbc:postgresql:"):
        return ""  # non-PG URL (e.g. Derby in tests): let Spark infer
    jvm = spark._jvm
    for cls in ("org.postgresql.Driver", "minipg.MiniPgDriver"):
        try:
            jvm.java.lang.Class.forName(cls)
            return cls
        except Exception:
            continue
    raise RuntimeError(
        "no PostgreSQL JDBC driver on the Spark driver classpath — vendor/"
        "minipg/minipg.jar missing? (session.build_session adds it via "
        "spark.driver.extraClassPath at JVM launch; a session built before "
        "the jar existed needs a restart)"
    )


def write_files_jdbc(
    files: DataFrame,
    url: str,
    tag: str = "crawl",
    batchsize: int = 10_000,
    mode: str = "append",
    properties: dict | None = None,
) -> None:
    """Executor-parallel batched JDBC append of the files table.

    ``batchsize`` plays the reference's group-commit role
    (storcrawl.py:382-391) — rows buffer into multi-row INSERT batches per
    partition instead of committing on a wall-clock timer.

    The engine-side ``id`` column (monotonically_increasing_id — a
    partition-stamped BIGINT) is dropped before the write: the table's
    ``id`` is SERIAL, DB-assigned exactly like the reference (storcrawl.py
    never inserts it), and the engine's partition-stamped values overflow
    the SERIAL's int4 anyway.
    """
    props = dict(properties or {})
    if "driver" not in props:
        driver = _resolve_pg_driver(files.sparkSession, url)
        if driver:
            props["driver"] = driver
    if "id" in files.columns:
        files = files.drop("id")
    (
        files.write.mode(mode)
        .option("batchsize", batchsize)
        .jdbc(url, f"storcrawl_{tag}.files", properties=props)
    )


def write_status_jdbc(
    status: DataFrame,
    url: str,
    tag: str = "crawl",
    batchsize: int = 10_000,
    mode: str = "append",
    properties: dict | None = None,
) -> None:
    """Append the status/event log through Spark's JDBC writer — the side
    channel the reference inserts row-at-a-time from the status process
    (storcrawl.py:303-309); same id-drop contract as
    :func:`write_files_jdbc` (SERIAL, DB-assigned)."""
    props = dict(properties or {})
    if "driver" not in props:
        driver = _resolve_pg_driver(status.sparkSession, url)
        if driver:
            props["driver"] = driver
    if "id" in status.columns:
        status = status.drop("id")
    (
        status.write.mode(mode)
        .option("batchsize", batchsize)
        .jdbc(url, f"storcrawl_{tag}.status", properties=props)
    )


def read_files_jdbc(
    spark,
    url: str,
    tag: str = "crawl",
    properties: dict | None = None,
) -> DataFrame:
    """Read the per-tag files table back through Spark's JDBC source — the
    report side's scan (report.py:79-86 connects psycopg2 and SELECTs the
    same table; here Catalyst gets a JDBC relation it can push filters
    into)."""
    props = dict(properties or {})
    if "driver" not in props:
        driver = _resolve_pg_driver(spark, url)
        if driver:
            props["driver"] = driver
    return spark.read.jdbc(url, f"storcrawl_{tag}.files", properties=props)
