"""Spark-JDBC end-to-end against live PostgreSQL 15 (r12 verdict item 1):
real crawl rows written through ``write_files_jdbc`` — Spark's OWN JDBC
writer and PostgresDialect type mapping, not psql COPY — into the
reference's exact column types (bytea path, bit(19) mode, timestamptz),
then read back with ``spark.read.jdbc`` and compared byte-for-byte,
non-UTF-8 path included.  Reference parity: storcrawl.py:563-575 (the
psycopg2 sink) and report.py:79-86 (the reader).

The sandbox ships no pgjdbc jar and has no network to fetch one, so the
driver under these tests is the VENDORED minimal wire-protocol driver
(vendor/minipg): because it registers the standard ``jdbc:postgresql:``
URL prefix, Spark resolves its real PostgresDialect — the insert
statement shape, type mapping, savePartition transaction protocol, and
read-side schema resolution exercised here are Spark's own code paths.

Skips cleanly when no server is reachable (same contract as
tests/test_postgres_e2e.py)."""

from __future__ import annotations

import os
import socket
import subprocess

import pytest

_PG = os.environ.get("SPARK_GRAFT_PG", "127.0.0.1:54329")
_HOST, _PORT = _PG.rsplit(":", 1)
_URL = f"jdbc:postgresql://{_HOST}:{_PORT}/postgres"
_PROPS = {"user": "postgres"}


def _pg_up() -> bool:
    try:
        with socket.create_connection((_HOST, int(_PORT)), timeout=1):
            return True
    except OSError:
        return False


pytestmark = pytest.mark.skipif(
    not _pg_up(), reason=f"no PostgreSQL at {_PG} (see module docstring)"
)


def _psql(sql: str, stdin: str | None = None) -> str:
    cmd = [
        "psql", "-h", _HOST, "-p", _PORT, "-U", "postgres", "-d", "postgres",
        "-v", "ON_ERROR_STOP=1", "-X", "-qAt", "-c", sql,
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, input=stdin)
    assert r.returncode == 0, f"psql failed: {r.stderr}\nSQL: {sql[:300]}"
    return r.stdout.strip()


@pytest.fixture(scope="module")
def crawl_rows(spark, tmp_path_factory):
    """Real crawl over a planted tree with a non-UTF-8 path byte."""
    from storage_crawler_spark.config import CrawlConfig
    from storage_crawler_spark.crawl import crawl

    root = tmp_path_factory.mktemp("sparkjdbc") / "tree"
    (root / "sub").mkdir(parents=True)
    (root / "a.txt").write_bytes(b"x" * 123)
    (root / "sub" / "b.dat").write_bytes(b"y" * 4096)
    with open(os.fsencode(str(root)) + b"/caf\xe9.bin", "wb") as fh:
        fh.write(b"z")
    res = crawl(spark, CrawlConfig(dirs=[str(root)]))
    return res.files


def test_spark_jdbc_write_and_read_back_byte_fidelity(spark, crawl_rows):
    """files -> Spark JDBC writer -> PostgreSQL -> spark.read.jdbc -> files:
    every column the reference stores survives byte-for-byte."""
    from storage_crawler_spark.sources.jdbc import (
        read_files_jdbc,
        schema_lifecycle_ddl,
        write_files_jdbc,
    )

    for stmt in schema_lifecycle_ddl("sparkjdbc"):
        _psql(stmt)

    write_files_jdbc(crawl_rows, _URL, tag="sparkjdbc", properties=_PROPS)

    want = {bytes(r.path): r for r in crawl_rows.collect()}
    assert len(want) >= 4

    # server-side sanity before Spark reads back: count + a bit(19) column
    n_pg = int(_psql("SELECT count(*) FROM storcrawl_sparkjdbc.files"))
    assert n_pg == len(want)
    mode_len = _psql(
        "SELECT DISTINCT length(st_mode::text) FROM storcrawl_sparkjdbc.files"
    )
    assert mode_len == "19"

    got_df = read_files_jdbc(spark, _URL, tag="sparkjdbc", properties=_PROPS)
    # schema through Spark's PostgresDialect mapping
    by_name = {f.name: f.dataType.simpleString() for f in got_df.schema.fields}
    assert by_name["path"] == "binary"
    assert by_name["extension"] == "binary"
    assert by_name["st_mode"] == "string"
    assert by_name["st_size"] == "bigint"
    assert by_name["insert_time"].startswith("timestamp")

    got = {bytes(r.path): r for r in got_df.collect()}
    assert set(got) == set(want)
    non_utf8 = [p for p in want if p.endswith(b"caf\xe9.bin")]
    assert non_utf8, "fixture must contain the non-UTF-8 path"
    for p, w in want.items():
        g = got[p]
        assert bytes(g.path) == p  # bytea byte-fidelity both ways
        assert (None if g.extension is None else bytes(g.extension)) == (
            None if w.extension is None else bytes(w.extension)
        )
        assert g.st_mode == w.st_mode and len(g.st_mode) == 19
        for c in ("st_ino", "st_dev", "st_nlink", "st_uid", "st_gid",
                  "st_size", "st_atime", "st_mtime", "st_ctime", "owner"):
            assert getattr(g, c) == getattr(w, c), c
        # timestamptz round trip at microsecond grain (both sides UTC)
        assert g.insert_time == w.insert_time


def test_spark_jdbc_report_pushdown_reads_live_table(spark, crawl_rows):
    """The report side's JDBC scan: a filtered aggregate over the live
    table — Catalyst pushes the projection into the JDBC source and the
    totals match both Spark-side originals and a psql-side aggregate."""
    from pyspark.sql import functions as F

    from storage_crawler_spark.sources.jdbc import (
        read_files_jdbc,
        schema_lifecycle_ddl,
        write_files_jdbc,
    )

    for stmt in schema_lifecycle_ddl("sparkjdbc_rpt"):
        _psql(stmt)
    write_files_jdbc(crawl_rows, _URL, tag="sparkjdbc_rpt", properties=_PROPS)

    df = read_files_jdbc(spark, _URL, tag="sparkjdbc_rpt", properties=_PROPS)
    # non-directory bytes (st_mode position 4 = S_IFDIR bit, SURVEY §2)
    spark_total = (
        df.filter(F.substring("st_mode", 5, 1) == "0")
        .agg(F.sum("st_size").alias("b"))
        .collect()[0]["b"]
    )
    pg_total = int(_psql(
        "SELECT coalesce(sum(st_size), 0) FROM storcrawl_sparkjdbc_rpt.files "
        "WHERE get_bit(st_mode, 4) = 0"
    ))
    orig_total = sum(
        r.st_size for r in crawl_rows.collect() if r.st_mode[4] == "0"
    )
    assert spark_total == pg_total == orig_total


def test_spark_jdbc_append_twice_accumulates(spark, crawl_rows):
    """Append-mode semantics through the savePartition transaction path:
    two writes, double the rows, no constraint games."""
    from storage_crawler_spark.sources.jdbc import (
        schema_lifecycle_ddl,
        write_files_jdbc,
    )

    for stmt in schema_lifecycle_ddl("sparkjdbc_x2"):
        _psql(stmt)
    write_files_jdbc(crawl_rows, _URL, tag="sparkjdbc_x2", properties=_PROPS)
    write_files_jdbc(crawl_rows, _URL, tag="sparkjdbc_x2", properties=_PROPS)
    n = crawl_rows.count()
    n_pg = int(_psql("SELECT count(*) FROM storcrawl_sparkjdbc_x2.files"))
    assert n_pg == 2 * n
    # SERIAL id filled server-side for every row
    n_ids = int(_psql(
        "SELECT count(DISTINCT id) FROM storcrawl_sparkjdbc_x2.files"
    ))
    assert n_ids == 2 * n


def test_spark_jdbc_status_log_round_trip(spark, crawl_rows):
    """The status side channel (storcrawl.py:303-309 parity): lifecycle
    event rows written through Spark's JDBC writer into the rendered
    normalized status table, read back via a report-shaped aggregate in
    both engines."""
    from storage_crawler_spark.config import CrawlConfig
    from storage_crawler_spark.crawl import crawl
    from storage_crawler_spark.sources.jdbc import (
        schema_lifecycle_ddl,
        write_status_jdbc,
    )

    res = crawl(spark, CrawlConfig(dirs=[os.fsdecode(
        bytes(crawl_rows.select("path").orderBy("path").first().path))]))
    status = res.status
    want = status.count()
    assert want > 0

    for stmt in schema_lifecycle_ddl("sparkjdbc_st"):
        _psql(stmt)
    write_status_jdbc(status, _URL, tag="sparkjdbc_st", properties=_PROPS)

    n_pg = int(_psql("SELECT count(*) FROM storcrawl_sparkjdbc_st.status"))
    assert n_pg == want
    # the reporter's event projection (report.py get_status events shape)
    evs = _psql(
        "SELECT status FROM storcrawl_sparkjdbc_st.status "
        "WHERE status IN ('begin', 'end') ORDER BY time, status"
    ).splitlines()
    assert "begin" in evs and "end" in evs
    # SERIAL ids assigned server-side, value/units nullable columns intact
    n_ids = int(_psql(
        "SELECT count(DISTINCT id) FROM storcrawl_sparkjdbc_st.status"
    ))
    assert n_ids == want


# ---------------------------------------------------------------------------
# r14 hardening (r13 verdict item 5): the literal renderer's injection-
# shaped surface, NULLs of every mapped type, and loud walls on the
# surfaces the driver cannot honor.
# ---------------------------------------------------------------------------


def test_spark_jdbc_nulls_of_every_mapped_type(spark):
    """One all-NULL row and one valued row for every Spark type the
    PostgresDialect maps: the writer's setNull path and the reader's
    wasNull path both survive."""
    import datetime
    from decimal import Decimal

    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("s", T.StringType()),
        T.StructField("b", T.BinaryType()),
        T.StructField("f_bool", T.BooleanType()),
        T.StructField("f_short", T.ShortType()),
        T.StructField("f_int", T.IntegerType()),
        T.StructField("f_long", T.LongType()),
        T.StructField("f_float", T.FloatType()),
        T.StructField("f_double", T.DoubleType()),
        T.StructField("f_dec", T.DecimalType(12, 3)),
        T.StructField("f_ts", T.TimestampType()),
        T.StructField("f_date", T.DateType()),
    ])
    valued = (
        1, "v", bytearray(b"\x00\x01\xff"), True, 7, 42, 2**40, 1.5, 2.25,
        Decimal("123456789.125"),
        datetime.datetime(2024, 2, 29, 12, 34, 56, 789000),
        datetime.date(1999, 12, 31),
    )
    nulled = (2,) + (None,) * 11
    df = spark.createDataFrame([valued, nulled], schema)

    _psql("DROP TABLE IF EXISTS minipg_nulls")
    df.write.jdbc(_URL, "minipg_nulls", mode="overwrite", properties=_PROPS)
    back = spark.read.jdbc(_URL, "minipg_nulls", properties=_PROPS)

    rows = {r["k"]: r for r in back.collect()}
    assert set(rows) == {1, 2}
    r2 = rows[2]
    for c in schema.fieldNames():
        if c != "k":
            assert r2[c] is None, f"column {c} lost its NULL"
    r1 = rows[1]
    assert r1["s"] == "v" and bytes(r1["b"]) == b"\x00\x01\xff"
    assert r1["f_bool"] is True and r1["f_short"] == 7 and r1["f_int"] == 42
    assert r1["f_long"] == 2**40
    assert r1["f_float"] == 1.5 and r1["f_double"] == 2.25
    assert r1["f_dec"] == Decimal("123456789.125")
    assert r1["f_ts"] == datetime.datetime(2024, 2, 29, 12, 34, 56, 789000)
    assert r1["f_date"] == datetime.date(1999, 12, 31)


def test_spark_jdbc_quoting_torture_row(spark):
    """The injection-shaped surface a literal renderer must prove safe:
    embedded single quotes, doubled quotes, backslashes (lone, doubled,
    trailing), newline/semicolon/comment markers, a '?' that must NOT be
    taken as a placeholder, dollar-quoting markers, and binary holding
    quote/backslash bytes — all byte-identical after write -> PG -> read."""
    from pyspark.sql import types as T

    torture = [
        "it's",
        "''already doubled''",
        "back\\slash",
        "double\\\\backslash",
        "trailing backslash\\",
        "line\nbreak; DROP TABLE should_not_run; --",
        "placeholder ? inside",
        "$$dollar$$ quoted",
        "café ☃ \U0001f600",
        "",
    ]
    schema = T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("s", T.StringType()),
        T.StructField("b", T.BinaryType()),
    ])
    rows = [
        (i, s, bytearray(s.encode("utf-8") + b"\x27\x5c\x00"))
        for i, s in enumerate(torture)
    ]
    df = spark.createDataFrame(rows, schema)
    _psql("DROP TABLE IF EXISTS minipg_torture")
    df.write.jdbc(_URL, "minipg_torture", mode="overwrite", properties=_PROPS)
    back = spark.read.jdbc(_URL, "minipg_torture", properties=_PROPS)
    got = {r["k"]: (r["s"], bytes(r["b"])) for r in back.collect()}
    for i, s in enumerate(torture):
        assert got[i] == (s, s.encode("utf-8") + b"\x27\x5c\x00"), repr(s)
    # nothing in the torture strings executed as SQL
    assert _psql(
        "SELECT count(*) FROM information_schema.tables "
        "WHERE table_name = 'should_not_run'"
    ) == "0"


def test_minipg_pins_standard_conforming_strings(spark):
    """The quote() contract (backslash is plain; only ' doubles) must be
    guaranteed by the SESSION, not assumed from server defaults."""
    jvm = spark.sparkContext._jvm
    props = jvm.java.util.Properties()
    props.setProperty("user", "postgres")
    conn = jvm.java.sql.DriverManager.getConnection(_URL, props)
    try:
        st = conn.createStatement()
        rs = st.executeQuery("SHOW standard_conforming_strings")
        assert rs.next()
        assert rs.getString(1) == "on"
    finally:
        conn.close()


def test_minipg_setquerytimeout_walls(spark):
    """setQueryTimeout(0) (Spark's default: no limit) is accepted; any
    non-zero timeout would be silently ignored, so it must throw
    SQLFeatureNotSupportedException naming the wall."""
    from py4j.protocol import Py4JJavaError

    jvm = spark.sparkContext._jvm
    props = jvm.java.util.Properties()
    props.setProperty("user", "postgres")
    conn = jvm.java.sql.DriverManager.getConnection(_URL, props)
    try:
        st = conn.createStatement()
        st.setQueryTimeout(0)  # accepted
        with pytest.raises(Py4JJavaError) as ei:
            st.setQueryTimeout(5)
        assert "SQLFeatureNotSupported" in str(ei.value.java_exception.getClass())
        assert "setQueryTimeout" in str(ei.value.java_exception.getMessage())
    finally:
        conn.close()
