"""Round-9 incremental-crawl end-to-end parity (VERDICT r8 item 8).

The full incremental-maintenance pipeline a deployment runs instead of
nightly full crawls, exercised at thousands-of-entries scale and checked
ORACLE-SHAPED (DuckDB EXCEPT over the two lakes), not by Python loops:

1. full crawl of a ~1.3k-entry tree → lake tag t0 (write_crawl/read_files)
2. the filesystem mutates inside a known set of subtrees (modify / delete /
   add / new nested dir)
3. the fsmeta STREAMING source (mtime-watermark incremental contract,
   sources/fsmeta.py FsMetaStreamReader) detects exactly the touched
   entries — deletions surface through the parent directory's bumped mtime
4. the touched entries map to their top-level subtrees, which are batch
   re-crawled and merged into the lake with merge_snapshot (prefix-replace)
5. a fresh FULL crawl of the mutated tree is the ground truth: DuckDB runs
   EXCEPT in both directions over the stat-stable column set — both must
   be empty.

Reference parity anchor: the reference has no incremental mode at all
(storcrawl.py runs full crawls per tag); this plane is part of the
beyond-reference lake-maintenance surface.
"""

from __future__ import annotations

import os
import time

import duckdb
import pytest

from storage_crawler_spark.config import CrawlConfig
from storage_crawler_spark.crawl import crawl

N_DIRS = 32
N_FILES = 40
HOT = (0, 7, 14, 21, 28)  # subtrees that mutate


def _utime(p, ts):
    os.utime(p, (ts, ts))


def _build_tree(root, t_old: int) -> None:
    for d in range(N_DIRS):
        dd = root / f"d{d:02d}"
        dd.mkdir(parents=True)
        for i in range(N_FILES):
            f = dd / f"f{i:02d}.dat"
            f.write_text("x" * (37 * (d + 1) + 11 * i))
            _utime(f, t_old)
    # dirs after contents (file creation bumps the parent's mtime), root last
    for d in range(N_DIRS):
        _utime(root / f"d{d:02d}", t_old)
    _utime(root, t_old)


def _mutate_tree(root, t_new: int) -> set[bytes]:
    """Apply the planted mutations; return the exact entry set the mtime
    stream must emit (touched files + bumped dirs; deleted files are gone
    and surface only via their parent dir)."""
    expect: set[bytes] = set()
    for d in HOT:
        dd = root / f"d{d:02d}"
        for i in range(0, 8):  # modified
            f = dd / f"f{i:02d}.dat"
            f.write_text("y" * (100 + i))
            _utime(f, t_new)
            expect.add(str(f).encode())
        for i in range(8, 14):  # deleted
            (dd / f"f{i:02d}.dat").unlink()
        for j in range(3):  # added
            f = dd / f"n{j}.dat"
            f.write_text("z" * (50 + j))
            _utime(f, t_new)
            expect.add(str(f).encode())
        sub = dd / "sub"
        sub.mkdir()
        for j in range(2):
            f = sub / f"s{j}.dat"
            f.write_text("s" * (20 + j))
            _utime(f, t_new)
            expect.add(str(f).encode())
        _utime(sub, t_new)
        expect.add(str(sub).encode())
        _utime(dd, t_new)  # parent: bumped by delete/add/mkdir anyway
        expect.add(str(dd).encode())
    return expect


# Reference files-table columns (§1.2) that are stable across the merged
# lake and a fresh crawl of the same filesystem state: everything except
# the per-crawl id/insert_time and the read-side-volatile atime/ctime.
STABLE_COLS = (
    "path, st_mode, st_nlink, st_uid, st_gid, st_size, st_mtime, st_ino, "
    "extension, owner"
)


def _stable_pdf(df):
    import pandas as pd  # noqa: F401

    return df.selectExpr(*STABLE_COLS.split(", ")).toPandas()


def test_streaming_detect_recrawl_merge_parity(spark, tmp_path):
    from storage_crawler_spark.sources.fsmeta import register_fsmeta
    from storage_crawler_spark.sources.lake import merge_snapshot, read_files, write_crawl

    register_fsmeta(spark)
    now = int(time.time())
    t_old, t_mid, t_new = now - 1000, now - 500, now - 50

    root = tmp_path / "tree"
    _build_tree(root, t_old)

    # 1. full crawl → lake
    lake = str(tmp_path / "lake")
    write_crawl(crawl(spark, CrawlConfig(dirs=[str(root)])), lake, tag="t0")
    old = read_files(spark, lake, tag="t0")
    n_total = old.count()
    assert n_total == 1 + N_DIRS + N_DIRS * N_FILES  # root + dirs + files

    # 2. mutate
    expect_stream = _mutate_tree(root, t_new)

    # 3. streaming detection: one availableNow micro-batch over the mtime
    #    window (t_mid, now] — start_mtime pins the replayed watermark so
    #    the pre-mutation corpus (all mtimes t_old < t_mid) stays silent
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    s = (
        spark.readStream.format("fsmeta")
        .option("start_mtime", str(t_mid))
        .option("slack_s", "0")
        .load(str(root))
    )
    q = (
        s.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {bytes(r.path) for r in spark.read.parquet(out).collect()}
    # detection is EXACT: every touched entry, nothing untouched
    assert streamed == expect_stream

    # 4. touched entries → top-level subtrees → batch re-crawl → merge
    rootb = str(root).encode()
    tops = sorted(
        {rootb + b"/" + p[len(rootb) + 1 :].split(b"/", 1)[0] for p in streamed}
    )
    assert tops == sorted(str(root / f"d{d:02d}").encode() for d in HOT)
    new = crawl(
        spark, CrawlConfig(dirs=[os.fsdecode(t) for t in tops])
    ).files.localCheckpoint()
    merged = merge_snapshot(old, new, tops)

    # 5. ground truth: fresh full crawl; EXCEPT both ways in DuckDB
    fresh = crawl(spark, CrawlConfig(dirs=[str(root)])).files
    con = duckdb.connect()
    con.register("merged", _stable_pdf(merged))
    con.register("fresh", _stable_pdf(fresh))
    fwd = con.execute(
        f"SELECT count(*) FROM (SELECT {STABLE_COLS} FROM merged "
        f"EXCEPT SELECT {STABLE_COLS} FROM fresh)"
    ).fetchone()[0]
    bwd = con.execute(
        f"SELECT count(*) FROM (SELECT {STABLE_COLS} FROM fresh "
        f"EXCEPT SELECT {STABLE_COLS} FROM merged)"
    ).fetchone()[0]
    assert (fwd, bwd) == (0, 0)
    # incremental emission bound: the stream moved O(churn), not O(corpus)
    assert len(streamed) < n_total / 10
