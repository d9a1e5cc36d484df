"""Distributed directory expansion + stat — the crawl plane's hot path.

The reference runs N walker processes popping a shared dir queue
(``os.scandir`` per dir, re-enqueue child dirs, emit every entry) and N
stater processes calling ``os.lstat`` per path (storcrawl.py:420-488).  The
Spark-native shape is a **per-level frontier loop**: the set of directories
at depth d is a DataFrame; one ``mapInPandas`` pass scans every directory in
the frontier AND stats its entries in the same Arrow batch (scandir's
DirEntry.stat(follow_symlinks=False) is the lstat — one syscall pass, no
inter-stage queue hop), emitting a columnar batch of entries; the child
directories become the depth d+1 frontier.

Scale properties:
- work distribution: the frontier is repartitioned by path hash each level,
  so a skewed tree (one dir with 10M children) spreads across the cluster as
  its children become the next frontier; within a single giant directory,
  scandir streams and yields Arrow batches incrementally (no per-dir
  materialization of the full child list beyond the batch).
- no driver round-trip of row data: entries stay in executors; the driver
  only sees per-level counts (Spark actions), never paths.
- lineage: each level is localCheckpoint()ed to keep the plan tree flat
  (a depth-30 tree would otherwise nest 30 unions of mapInPandas plans).

Semantics preserved from the reference:
- every entry (file, dir, symlink) is emitted, including excluded dirs
  (the exclusion filter gates *descent* only — storcrawl.py:466-473);
- symlinked dirs are emitted but never descended (follow_symlinks=False,
  storcrawl.py:465);
- lstat, never stat (symlinks are records themselves, storcrawl.py:434).

Deliberately fixed defect: on lstat failure the reference silently reuses
the previous record's stat struct (storcrawl.py:427-440); we emit NULL stat
columns plus an ``error`` string instead.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql.types import BooleanType, StructField, StructType

from storage_crawler_spark.schemas import ENTRY_SCHEMA

_BATCH_ROWS = 8192

# ENTRY_SCHEMA + the internal descend flag (is_dir AND not excluded).  The
# record's is_dir column is the REAL lstat answer — an excluded directory is
# still a directory (the exclusion contract gates descent only); the caller
# derives the next frontier from ``descend`` and drops the column.
# (Built as a fresh StructType: StructType.add mutates in place.)
ENTRY_DESCEND_SCHEMA = StructType(
    list(ENTRY_SCHEMA.fields) + [StructField("descend", BooleanType())]
)


def _entry_record(path: bytes, st, is_dir: bool, is_symlink: bool, error: str | None):
    """ENTRY_SCHEMA tuple (no descend column — streaming/incremental.py
    shares this for plain per-path stats)."""
    if st is None:
        return (path, is_dir, is_symlink) + (None,) * 10 + (error,)
    return (
        path,
        is_dir,
        is_symlink,
        int(st.st_mode),
        int(st.st_ino),
        int(st.st_dev),
        int(st.st_nlink),
        int(st.st_uid),
        int(st.st_gid),
        int(st.st_size),
        int(st.st_atime),  # truncation toward zero, as the reference does
        int(st.st_mtime),  # (storcrawl.py:368-370)
        int(st.st_ctime),
        None,
    )


def _entry_record_descend(
    path: bytes, st, is_dir: bool, is_symlink: bool, error: str | None, descend: bool
):
    return _entry_record(path, st, is_dir, is_symlink, error) + (descend,)


def scan_frontier_batches(
    dir_paths: Iterator[pd.DataFrame],
    exclude_names: frozenset[bytes],
    levels_per_job: int = 1,
    dir_budget: int = 64,
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: for each frontier directory, scandir + lstat its
    children, yielding columnar batches of ENTRY_DESCEND_SCHEMA rows.

    ``is_dir`` is the real lstat answer (symlinks-to-dirs are False —
    follow_symlinks=False); ``descend`` additionally applies the exclusion
    list, so the caller derives the next frontier with a plain filter, no
    second pass, and excluded dirs still report is_dir=true in the output.

    ``levels_per_job`` > 1 engages IN-TASK descent (r14, the deep-chain
    fix): a chain-shaped tree puts ONE directory in each frontier, so the
    per-level driver round-trip (checkpoint + count ≈ two Spark jobs)
    dominates a 10k-deep crawl by ~10,000×.  With k levels per job the
    task keeps a local BFS deque of (dir, rel_depth): a descendable child
    at rel depth < k is scanned in the SAME task (its row is emitted with
    descend=false — the driver must not re-scan it), while a child AT
    rel depth k is handed back with descend=true as next frontier.
    ``dir_budget`` caps how many EXTRA directories one task adopts
    in-task (frontier dirs are driver-routed work and don't count), so a
    frontier that suddenly WIDENS (one dir fanning out to 100k) hands the
    fan-out back to the driver for repartitioning instead of serializing
    the subtree into one task — deep mode costs at most ``dir_budget``
    serial scandir calls where there was nothing to parallelize anyway.
    Routing is decided at enqueue time, so every emitted row's descend
    flag is final.
    """
    cols = [f.name for f in ENTRY_DESCEND_SCHEMA.fields]
    buf: list[tuple] = []
    from collections import deque

    for pdf in dir_paths:
        queue: deque[tuple[bytes, int]] = deque(
            (bytes(raw), 0) for raw in pdf["path"]
        )
        extra = 0  # in-task-adopted dirs, capped by dir_budget
        while queue:
            d, rel = queue.popleft()
            try:
                it = os.scandir(d)
            except OSError as exc:
                # Unreadable dir: the dir row itself was emitted by the
                # parent's scan; the reference just logs and moves on
                # (storcrawl.py:463 try) — we do the same: skip.
                _ = exc
                continue
            with it:
                for entry in it:
                    name = os.path.basename(entry.path.encode() if isinstance(entry.path, str) else entry.path)
                    epath = entry.path if isinstance(entry.path, bytes) else entry.path.encode()
                    try:
                        st = entry.stat(follow_symlinks=False)
                        is_symlink = entry.is_symlink()
                        is_dir = entry.is_dir(follow_symlinks=False)
                        err = None
                    except OSError as exc:
                        st, is_symlink, is_dir, err = None, False, False, str(exc)
                    descend = is_dir and name not in exclude_names
                    if descend and rel + 1 < levels_per_job and extra < dir_budget:
                        queue.append((epath, rel + 1))
                        extra += 1
                        descend = False  # handled in-task; driver must not re-scan
                    buf.append(_entry_record_descend(epath, st, is_dir, is_symlink, err, descend))
                    if len(buf) >= _BATCH_ROWS:
                        yield pd.DataFrame(buf, columns=cols)
                        buf = []
    if buf:
        yield pd.DataFrame(buf, columns=cols)


def expand_level(
    frontier: DataFrame,
    exclude_names: frozenset[bytes],
    parallelism: int,
    levels_per_job: int = 1,
    dir_budget: int = 64,
) -> DataFrame:
    """One frontier level → entries DataFrame (ENTRY_DESCEND_SCHEMA).
    ``levels_per_job`` > 1 lets each task descend that many levels in-task
    (deep-chain mode — see :func:`scan_frontier_batches`)."""
    n = max(1, parallelism)
    kernel = lambda it: scan_frontier_batches(  # noqa: E731
        it, exclude_names, levels_per_job, dir_budget
    )
    return frontier.repartition(n, F.col("path")).mapInPandas(kernel, ENTRY_DESCEND_SCHEMA)


def stat_roots(spark, roots: list[bytes]) -> DataFrame:
    """Stat the crawl roots themselves (the reference seeds roots into the
    dir queue, so root dirs appear as rows too once their parent is scanned —
    but roots have no parent in the crawl, so we stat them explicitly).
    Roots are always descended when they are real dirs: the reference's
    exclusion check applies to dirs FOUND during the walk, not to seeds."""
    recs = []
    for r in roots:
        try:
            st = os.lstat(r)
            is_dir = os.path.isdir(r) and not os.path.islink(r)
            recs.append(_entry_record_descend(r, st, is_dir, os.path.islink(r), None, is_dir))
        except OSError as exc:
            recs.append(_entry_record_descend(r, None, False, False, str(exc), False))
    return spark.createDataFrame(recs, ENTRY_DESCEND_SCHEMA)
