"""End-to-end crawl over a synthetic tree (SURVEY.md §5.3 / FIXTURES.md §4)."""

from __future__ import annotations

import os

import pytest

from storage_crawler_spark.config import CrawlConfig
from storage_crawler_spark.crawl import crawl


@pytest.fixture()
def tree(tmp_path):
    """Build the fixture tree: excluded dir, symlinks (file + dir targets),
    long extensions, dotless names, dotted dir components, non-UTF-8 name."""
    root = tmp_path / "root"
    (root / "sub1").mkdir(parents=True)
    (root / "sub1" / "a.txt").write_bytes(b"x" * 10)
    (root / "sub1" / "archive.tarball").write_bytes(b"y" * 100)
    (root / "sub1" / "noext").write_bytes(b"z")
    (root / ".snapshot").mkdir()
    (root / ".snapshot" / "hidden_child.txt").write_bytes(b"h")
    (root / "v1.0").mkdir()
    (root / "v1.0" / "plain").write_bytes(b"p" * 7)
    (root / "deep" / "d1" / "d2").mkdir(parents=True)
    (root / "deep" / "d1" / "d2" / "leaf.tar.gz").write_bytes(b"l" * 42)
    os.symlink(root / "sub1" / "a.txt", root / "link_to_file")
    os.symlink(root / "sub1", root / "link_to_dir")  # must NOT be descended
    non_utf8 = bytes(root) + b"/caf\xe9.dat"
    with open(non_utf8, "wb") as fh:
        fh.write(b"cafe")
    return root


def test_crawl_rows_and_semantics(spark, tree, tmp_path):
    owners_file = tmp_path / "owners.txt"
    owners_file.write_text(
        f"alice={tree}\nbob={tree}/sub1\n"
    )
    cfg = CrawlConfig(dirs=[str(tree)], owners=str(owners_file))
    res = crawl(spark, cfg)
    rows = res.files.collect()
    by_path = {bytes(r.path): r for r in rows}

    root = bytes(tree)
    # every entry present: files, dirs, symlinks, excluded dir itself
    assert root in by_path
    assert root + b"/.snapshot" in by_path  # excluded dir row still emitted
    assert root + b"/.snapshot/hidden_child.txt" not in by_path  # not descended
    # exclusion gates DESCENT only: the excluded dir's own record still says
    # "directory" (S_IFDIR mode bits — regression for the descend/is_dir mixup)
    snap = by_path[root + b"/.snapshot"]
    assert int(snap.st_mode, 2) & 0o170000 == 0o040000
    assert root + b"/link_to_dir" in by_path
    assert root + b"/link_to_dir/a.txt" not in by_path  # symlink dir not descended
    assert root + b"/deep/d1/d2/leaf.tar.gz" in by_path  # depth works
    assert root + b"/caf\xe9.dat" in by_path  # non-UTF-8 fidelity

    # extension semantics on crawled rows
    assert bytes(by_path[root + b"/deep/d1/d2/leaf.tar.gz"].extension) == b"tar.gz"
    assert bytes(by_path[root + b"/sub1/archive.tarball"].extension) == b"tarball"
    assert by_path[root + b"/v1.0/plain"].extension is not None  # fall-through quirk
    assert bytes(by_path[root + b"/v1.0/plain"].extension).endswith(b"0/plain")

    # owner: deepest ancestor wins
    assert by_path[root + b"/sub1/a.txt"].owner == "bob"
    assert by_path[root + b"/v1.0/plain"].owner == "alice"

    # lstat not stat: symlink rows carry symlink mode bits (S_IFLNK = 0o120000)
    link = by_path[root + b"/link_to_file"]
    assert link.st_mode[:5] != "00000"  # mode present
    assert int(link.st_mode, 2) & 0o170000 == 0o120000

    # sizes recorded
    assert by_path[root + b"/sub1/a.txt"].st_size == 10

    # st_mode is the 19-bit string encoding
    f = by_path[root + b"/sub1/archive.tarball"]
    assert len(f.st_mode) == 19 and set(f.st_mode) <= {"0", "1"}

    # summary counters agree with the row set
    assert res.summary["files"] == len(rows)
    dir_rows = [r for r in rows if int(r.st_mode, 2) & 0o170000 == 0o040000]
    assert res.summary["dirs"] == len(dir_rows)

    # status log: all nine lifecycle events present (storcrawl.py:575-629)
    status = {r.status for r in res.status.collect()}
    for ev in (
        "begin",
        "walker started",
        "processed all dirs",
        "processed all files",
        "processed all DB commits",
        "end",
    ):
        assert ev in status
    assert "file stat rate" in status  # metric snapshot rows too


def test_crawl_is_deterministic_rowset(spark, tree):
    cfg = CrawlConfig(dirs=[str(tree)])
    a = {bytes(r.path) for r in crawl(spark, cfg).files.collect()}
    b = {bytes(r.path) for r in crawl(spark, cfg).files.collect()}
    assert a == b


def test_crawl_logfile_rotating_reference_format(spark, tree, tmp_path):
    """With config.logfile set, the crawl writes its lifecycle + metric
    events to a rotating file in the reference listener's record format."""
    logfile = tmp_path / "storcrawl.log"
    crawl(spark, CrawlConfig(dirs=[str(tree)], logfile=str(logfile)))
    text = logfile.read_text()
    for needle in ("begin", "processed all dirs", "end", "file stat rate", "INFO"):
        assert needle in text
    # reference format: asctime processName name levelname message
    first = text.splitlines()[0]
    assert " storcrawl " in first and "INFO" in first
    # repeated crawls append through ONE handler (no duplicate lines)
    crawl(spark, CrawlConfig(dirs=[str(tree)], logfile=str(logfile)))
    ends = [ln for ln in logfile.read_text().splitlines() if ln.endswith(" end")]
    assert len(ends) == 2


def test_crawl_level_store_spills_levels_and_matches_default(spark, tree, tmp_path):
    """level_store mode must produce the same rowset as localCheckpoint mode,
    while leaving per-level parquet artifacts (+ files_stage) in the store."""
    store = tmp_path / "levels"
    res_default = crawl(spark, CrawlConfig(dirs=[str(tree)]))
    res_lake = crawl(spark, CrawlConfig(dirs=[str(tree)], level_store=str(store)))

    default_paths = {bytes(r.path) for r in res_default.files.collect()}
    lake_rows = {bytes(r.path): r for r in res_lake.files.collect()}
    assert set(lake_rows) == default_paths
    assert res_lake.summary["files"] == res_default.summary["files"]
    assert res_lake.summary["dirs"] == res_default.summary["dirs"]

    names = sorted(p.name for p in store.iterdir())
    assert "files_stage" in names
    levels = [n for n in names if n.startswith("level_")]
    # r14 deep-batching: a small frontier descends in-task, so the whole
    # 3-deep fixture collapses into ONE spilled frontier round; with
    # batching disabled the per-level artifacts reappear (checked below)
    assert len(levels) >= 1
    # spilled levels are real re-readable parquet incl. non-UTF-8 path bytes
    lv0 = spark.read.parquet(str(store / levels[0]))
    assert "descend" in lv0.columns  # frontier flag travels with the level
    root = bytes(tree)
    assert root + b"/caf\xe9.dat" in {bytes(r.path) for r in lv0.collect()}

    # strict per-level BFS (deep_batch_levels=1) still spills one artifact
    # per depth and produces the identical rowset
    store2 = tmp_path / "levels_bfs"
    res_bfs = crawl(spark, CrawlConfig(
        dirs=[str(tree)], level_store=str(store2), deep_batch_levels=1))
    assert {bytes(r.path) for r in res_bfs.files.collect()} == default_paths
    bfs_levels = [n for n in sorted(p.name for p in store2.iterdir())
                  if n.startswith("level_")]
    assert len(bfs_levels) >= 3


def test_crawl_random_tree_matches_reference_walk(spark, tmp_path):
    """Randomized-tree crawl vs an independent os-level reference walk.

    The curated fixture pins known edge cases; this seeded random tree
    (adversarial names — dots, spaces, non-UTF-8 bytes, long extensions —
    random nesting, file/dir symlinks, an excluded directory name) checks
    the full walker semantics hold on shapes nobody hand-picked: every
    entry emitted exactly once, descent gated by exclusion and symlink
    status, lstat fidelity for size and mode type bits."""
    import random
    import stat as stat_mod

    rng = random.Random(1234)
    root = tmp_path / "rnd"
    root.mkdir()
    name_pool = [
        b"plain",
        b"a.txt",
        b"two.dots.tar.gz",
        b"trailing.",
        b".hidden",
        b"sp ace",
        b"caf\xe9",  # non-UTF-8
        b"longextension.verylongext",
        b"v1.0",
        b"skipme",
    ]
    dirs = [root]
    all_entries = []
    for _ in range(40):
        parent = rng.choice(dirs)
        raw = rng.choice(name_pool) + str(rng.randrange(1000)).encode()
        full = bytes(parent) + b"/" + raw
        kind = rng.randrange(10)
        try:
            if kind < 3 and len(dirs) < 15:
                os.mkdir(full)
                dirs.append(type(root)(os.fsdecode(full)))
            elif kind == 3 and all_entries:
                os.symlink(rng.choice(all_entries), full)
            else:
                with open(full, "wb") as fh:
                    fh.write(b"x" * rng.randrange(0, 200))
        except FileExistsError:
            continue
        all_entries.append(full)
    excluded_dir = bytes(root) + b"/EXCLUDED"
    os.mkdir(excluded_dir)
    with open(excluded_dir + b"/invisible.txt", "wb") as fh:
        fh.write(b"no")

    # independent reference walk with the reference's semantics
    expect: dict[bytes, os.stat_result] = {}
    frontier = [bytes(root)]
    expect[bytes(root)] = os.lstat(bytes(root))
    while frontier:
        nxt = []
        for d in frontier:
            for entry in os.scandir(d):
                p = entry.path if isinstance(entry.path, bytes) else os.fsencode(entry.path)
                st = os.lstat(p)
                expect[p] = st
                if (
                    stat_mod.S_ISDIR(st.st_mode)
                    and os.path.basename(p) != b"EXCLUDED"
                ):
                    nxt.append(p)
        frontier = nxt

    res = crawl(spark, CrawlConfig(dirs=[str(root)], exclude=["EXCLUDED"]))
    got = {bytes(r.path): r for r in res.files.collect()}

    assert set(got) == set(expect)
    for p, st in expect.items():
        r = got[p]
        assert r.st_size == st.st_size, p
        assert int(r.st_mode, 2) & 0o170000 == stat_mod.S_IFMT(st.st_mode), p
        assert r.st_mtime == int(st.st_mtime), p
