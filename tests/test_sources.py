"""Sources/sinks tests: lake round-trip, JDBC DDL parity, binaryFile scan."""

from __future__ import annotations

import os

import pytest

from storage_crawler_spark.config import CrawlConfig
from storage_crawler_spark.crawl import crawl
from storage_crawler_spark.sources import (
    drop_tag,
    files_table_ddl,
    list_tags,
    read_binary_tree,
    read_files,
    read_status,
    reporting_user_ddl,
    schema_lifecycle_ddl,
    status_table_ddl,
    write_crawl,
)


@pytest.fixture()
def small_tree(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "x.txt").write_text("hello")
    (tmp_path / "a" / "y.tar.gz").write_bytes(b"\x00\x01")
    (tmp_path / "b").mkdir()
    (tmp_path / "b" / "z").write_text("no extension")
    return str(tmp_path)


def test_lake_round_trip(spark, small_tree, tmp_path):
    lake_root = str(tmp_path / "lake")
    result = crawl(spark, CrawlConfig(dirs=[small_tree]))
    write_crawl(result, lake_root, tag="t1", target_partitions=2)

    files = read_files(spark, lake_root, "t1")
    assert files.count() == result.files.count()
    assert set(files.columns) == set(result.files.columns)
    # paths survive byte-exact
    orig = sorted(r.path for r in result.files.select("path").collect())
    back = sorted(r.path for r in files.select("path").collect())
    assert orig == back

    status = read_status(spark, lake_root, "t1")
    assert status.filter("status = 'begin'").count() == 1

    assert list_tags(lake_root) == ["t1"]
    assert drop_tag(lake_root, "t1") is True
    assert list_tags(lake_root) == []
    assert drop_tag(lake_root, "t1") is False


def test_lake_append_status(spark, small_tree, tmp_path):
    lake_root = str(tmp_path / "lake")
    result = crawl(spark, CrawlConfig(dirs=[small_tree]))
    write_crawl(result, lake_root, tag="t2", target_partitions=1)
    write_crawl(result, lake_root, tag="t2", target_partitions=1)  # re-run
    # files overwritten, status appended (append-only event log)
    assert read_files(spark, lake_root, "t2").count() == result.files.count()
    assert read_status(spark, lake_root, "t2").filter("status = 'begin'").count() == 2


def test_jdbc_ddl_parity():
    ddl = files_table_ddl("mytag")
    assert ddl.startswith("CREATE TABLE storcrawl_mytag.files")
    # reference column types survive the StructType rendering
    for fragment in (
        "id SERIAL",
        "path bytea NOT NULL",
        "extension bytea",
        "st_mode bit(19) NOT NULL",
        "st_dev text",
        "st_size bigint",
        "insert_time timestamp with time zone NOT NULL",
        "owner text",
    ):
        assert fragment in ddl, f"missing: {fragment}"

    sddl = status_table_ddl("mytag")
    assert "storcrawl_mytag.status" in sddl and "id SERIAL" in sddl

    seq = schema_lifecycle_ddl("mytag")
    assert seq[0] == "DROP SCHEMA IF EXISTS storcrawl_mytag CASCADE"
    assert seq[1] == "CREATE SCHEMA storcrawl_mytag"

    grants = reporting_user_ddl("mytag", "report_user", "pw")
    assert any(g.startswith("CREATE USER report_user") for g in grants)
    assert any("GRANT SELECT ON ALL TABLES" in g for g in grants)


def test_binary_files_scan(spark, small_tree):
    df = read_binary_tree(spark, small_tree, recursive=True)
    rows = {bytes(r.path).decode(): r for r in df.collect()}
    # only regular files (binaryFile hides directories)
    names = {os.path.basename(p) for p in rows}
    assert names == {"x.txt", "y.tar.gz", "z"}
    x = next(r for p, r in rows.items() if p.endswith("x.txt"))
    assert bytes(x.content) == b"hello"
    assert x.st_size == 5

    # column pruning path: no content column requested
    no_content = read_binary_tree(spark, small_tree, with_content=False)
    assert "content" not in no_content.columns
    assert no_content.count() == 3

    # glob filter pushdown
    only_txt = read_binary_tree(spark, small_tree, glob="*.txt")
    assert only_txt.count() == 1
