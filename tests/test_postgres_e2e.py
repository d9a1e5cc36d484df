"""Live-PostgreSQL end-to-end for the DDL lifecycle (r11 verdict item 6;
reference storcrawl.py:88-164, :166-215, :563-575 parity).

The DDL renderers were previously unit-tested and Derby-round-tripped but
NEVER executed against a real PostgreSQL — a sandbox constraint that
lifted in r12 (PostgreSQL 15 in the image).  These tests run the full
destructive re-create sequence, load REAL crawl rows through the rendered
schema (COPY in PostgreSQL's own bytea/bit(19) text formats — the exact
column types the reference uses), provision the read-only reporting user,
and prove the grant actually works by running a report query AS that user.

Skips cleanly when no server is reachable: start one with

    initdb -D <dir>/data -A trust
    pg_ctl -D <dir>/data -o "-p 54329 -k <dir>" start

(or point SPARK_GRAFT_PG at host:port of any trust-auth server with a
superuser named ``postgres``).
"""

from __future__ import annotations

import os
import socket
import subprocess

import pytest

_PG = os.environ.get("SPARK_GRAFT_PG", "127.0.0.1:54329")
_HOST, _PORT = _PG.rsplit(":", 1)


def _pg_up() -> bool:
    try:
        with socket.create_connection((_HOST, int(_PORT)), timeout=1):
            return True
    except OSError:
        return False


pytestmark = pytest.mark.skipif(
    not _pg_up(), reason=f"no PostgreSQL at {_PG} (see module docstring)"
)


def _psql(sql: str, user: str = "postgres", stdin: str | None = None) -> str:
    cmd = [
        "psql", "-h", _HOST, "-p", _PORT, "-U", user, "-d", "postgres",
        "-v", "ON_ERROR_STOP=1", "-X", "-qAt", "-c", sql,
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, input=stdin)
    assert r.returncode == 0, f"psql failed: {r.stderr}\nSQL: {sql[:300]}"
    return r.stdout.strip()


def test_schema_lifecycle_ddl_executes_on_real_postgres(spark, tmp_path):
    """The destructive re-create sequence runs verbatim on PostgreSQL 15,
    twice (idempotence through DROP..CASCADE), and the created columns
    carry the reference's exact types (bytea paths, bit(19) mode)."""
    from storage_crawler_spark.sources.jdbc import schema_lifecycle_ddl

    for _ in range(2):  # second pass exercises DROP SCHEMA .. CASCADE
        for stmt in schema_lifecycle_ddl("e2e"):
            _psql(stmt)
    types = _psql(
        "SELECT column_name || ':' || data_type FROM information_schema.columns "
        "WHERE table_schema = 'storcrawl_e2e' AND table_name = 'files' "
        "AND column_name IN ('path', 'st_mode', 'st_size') ORDER BY column_name"
    ).splitlines()
    assert types == ["path:bytea", "st_mode:bit", "st_size:bigint"]


def test_crawl_rows_load_and_report_reads_back(spark, tmp_path):
    """REAL crawl rows (our walker over a planted tree, including a
    non-UTF-8 path) load through the rendered DDL via COPY in PostgreSQL's
    own text formats, and the reference-shaped report aggregate reads back
    the same totals Spark computes."""
    from storage_crawler_spark.config import CrawlConfig
    from storage_crawler_spark.crawl import crawl
    from storage_crawler_spark.sources.jdbc import schema_lifecycle_ddl

    root = tmp_path / "tree"
    (root / "sub").mkdir(parents=True)
    (root / "a.txt").write_bytes(b"x" * 100)
    (root / "sub" / "b.dat").write_bytes(b"y" * 2048)
    # genuinely non-UTF-8 name: written via a BYTES path (latin-1 0xe9)
    with open(os.fsencode(str(root)) + b"/caf\xe9.bin", "wb") as fh:
        fh.write(b"z")

    res = crawl(spark, CrawlConfig(dirs=[str(root)]))
    rows = res.files.collect()
    assert len(rows) >= 4

    for stmt in schema_lifecycle_ddl("e2e_load"):
        _psql(stmt)

    # COPY text format: bytea as \x hex, bit(19) as the 0/1 string, NULL as \N
    def cell(v, col):
        if v is None:
            return "\\N"
        if col in ("path", "extension"):
            return "\\\\x" + bytes(v).hex()
        return str(v)

    cols = ["insert_time", "path", "extension", "st_mode", "st_ino",
            "st_dev", "st_nlink", "st_uid", "st_gid", "st_size",
            "st_atime", "st_mtime", "st_ctime"]
    lines = "\n".join(
        "\t".join(cell(getattr(r, c), c) for c in cols) for r in rows
    )
    _psql(
        f"COPY storcrawl_e2e_load.files ({', '.join(cols)}) FROM STDIN",
        stdin=lines + "\n",
    )

    n_pg = int(_psql("SELECT count(*) FROM storcrawl_e2e_load.files"))
    assert n_pg == len(rows)
    # reference-shaped report aggregate (report.py du family): totals match
    pg_bytes = int(_psql(
        "SELECT coalesce(sum(st_size), 0) FROM storcrawl_e2e_load.files "
        "WHERE get_bit(st_mode, 4) = 0"  # bit(19): position 4 = S_IFDIR bit
    ))
    spark_bytes = sum(
        r.st_size for r in rows if r.st_mode[4] == "0"
    )
    assert pg_bytes == spark_bytes
    # the non-UTF-8 path survived the bytea round-trip byte-for-byte
    raw = _psql(
        "SELECT encode(path, 'hex') FROM storcrawl_e2e_load.files "
        "WHERE position('\\x2e62696e'::bytea in path) > 0"  # '.bin'
    )
    assert raw and bytes.fromhex(raw).endswith(b"caf\xe9.bin")


def test_reporting_user_ddl_provisions_and_grants_work(spark):
    """The read-only reporting-user sequence (storcrawl.py:166-215) runs
    verbatim, and the grant is REAL: the user can SELECT the files table
    but cannot write it."""
    from storage_crawler_spark.sources.jdbc import (
        reporting_user_ddl,
        schema_lifecycle_ddl,
    )

    for stmt in schema_lifecycle_ddl("e2e_rpt"):
        _psql(stmt)
    _psql("INSERT INTO storcrawl_e2e_rpt.status (time, status, value, units) "
          "VALUES (now(), 'begin', NULL, 'event')")
    for stmt in reporting_user_ddl("e2e_rpt", "storcrawl_reader", "s3cret",
                                   database="postgres"):
        # first-run bootstrap: DROP OWNED BY fails before the user exists,
        # exactly like the reference's first run — guard it the same way
        if stmt.startswith("DROP OWNED BY"):
            subprocess.run(
                ["psql", "-h", _HOST, "-p", _PORT, "-U", "postgres",
                 "-d", "postgres", "-X", "-qAt", "-c", stmt],
                capture_output=True, text=True,
            )
            continue
        _psql(stmt)
    got = _psql(
        "SELECT count(*) FROM storcrawl_e2e_rpt.status", user="storcrawl_reader"
    )
    assert got == "1"
    w = subprocess.run(
        ["psql", "-h", _HOST, "-p", _PORT, "-U", "storcrawl_reader",
         "-d", "postgres", "-X", "-qAt", "-c",
         "INSERT INTO storcrawl_e2e_rpt.status (time, status) "
         "VALUES (now(), 'nope')"],
        capture_output=True, text=True,
    )
    assert w.returncode != 0 and "permission denied" in w.stderr
