"""Storage-usage rollups over the ``files`` relation — the ``du``-family
reports a storage-crawler deployment runs daily (the reference crawls and
stores the metadata, /root/reference/storage_crawler/storcrawl.py:132-148;
its report.py stops at per-file listings — these are the aggregate tier a
filesystem team actually pages through).

All three are dialect-generated (the subtree rollup needs array slicing,
which the engines name differently) and run against the deterministic
``files`` derivation (plans/views.py), so each has a full DuckDB oracle.
"""

from __future__ import annotations

from storage_crawler_spark.plans.dialect import Dialect


def gen_subtree_du(d: Dialect, src: str = "files") -> str:
    """Per-directory recursive disk usage (``du``): every file's size and
    count roll up into ALL its ancestor directories — the subtree-hotspot
    view ("which tree is eating the filesystem").

    Ancestors come from exploding each path's prefix chain (depth-1 rows
    per file, depth is small and bounded in real filesystems), then one
    partial-combining aggregate on the directory key.  100 TB shape: the
    explode is map-side (~depth× row inflation of a narrow (path, size)
    projection); the aggregate absorbs the hot root-level keys map-side —
    no join, no window, one shuffle.  Deliberately NOT a per-depth window:
    the rollup is additive, so partial aggregation is all it needs.
    """
    toks = d.split("path", "/")
    dir_k = d.ajoin(d.aslice("toks", "1", "k"), "/")
    lat = d.lateral_seq("2", d.size("toks") + " - 1", "k")
    # subquery, not a CTE: callers prepend the files-view CTE via
    # views.with_files_cte, and SQL allows only one WITH clause
    return f"""
SELECT dir,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(st_size) AS BIGINT) AS total_bytes
FROM (
  SELECT {dir_k} AS dir, st_size
  FROM (SELECT {toks} AS toks, st_size FROM {src}) f
  {lat}
) a
GROUP BY dir
ORDER BY dir
""".strip()


def gen_extension_usage(d: Dialect, src: str = "files") -> str:
    """Per-extension usage summary (count, bytes, size bounds) — the
    what-kind-of-data-is-this breakdown (reference extension semantics:
    find_extension, storcrawl.py:259-268, including its fall-through
    quirk — the derivation in plans/views.py reproduces it).  One
    partial-combining aggregate over a two-column projection."""
    return f"""
SELECT coalesce(extension, '(none)') AS extension,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(st_size) AS BIGINT) AS total_bytes,
       CAST(min(st_size) AS BIGINT) AS min_bytes,
       CAST(max(st_size) AS BIGINT) AS max_bytes
FROM {src}
GROUP BY extension
ORDER BY extension
""".strip()


def gen_owner_usage(d: Dialect, src: str = "files") -> str:
    """Per-owner usage with top-level-root spread — the chargeback /
    quota-report view (owner semantics: reference find_owner ancestor
    walk, storcrawl.py:243-258; NULL owners are a first-class row, not
    dropped).  ``roots`` counts distinct top-level directories an owner
    touches (split element 2 — paths are absolute)."""
    root = d.elem(d.split("path", "/"), "2")
    return f"""
SELECT coalesce(owner, '(unowned)') AS owner,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(st_size) AS BIGINT) AS total_bytes,
       CAST(count(DISTINCT {root}) AS BIGINT) AS n_roots
FROM {src}
GROUP BY owner
ORDER BY owner
""".strip()


def gen_growth_daily(d: Dialect, src: str = "files") -> str:
    """Daily ingest growth from the insert epoch: files and bytes added
    per day plus running cumulative totals — the capacity-trend chart a
    storage team reads next to the du rollup (grow rate decides
    procurement; the du decides blame).

    One partial-combining aggregate to the per-day relation (tiny: one
    row per day of corpus age), then running sums via a window over that
    relation only — the corpus-sized scan never sorts.  Window sums CAST
    to BIGINT (HUGEINT trap).
    """
    day = d.idiv("insert_epoch", "86400")
    return f"""
SELECT day,
       CAST(n_files AS BIGINT) AS n_files,
       CAST(added_bytes AS BIGINT) AS added_bytes,
       CAST(sum(n_files) OVER (ORDER BY day) AS BIGINT) AS cum_files,
       CAST(sum(added_bytes) OVER (ORDER BY day) AS BIGINT) AS cum_bytes
FROM (
  SELECT {day} AS day, count(*) AS n_files, sum(st_size) AS added_bytes
  FROM {src}
  GROUP BY {day}
) t
ORDER BY day
""".strip()


def gen_age_tiers(d: Dialect, as_of_epoch: int = 1_700_500_000, src: str = "files") -> str:
    """Cold-data tiering report: files bucketed by modification age
    (hot < 1 day, warm < 30 days, cold < 180 days, frozen beyond) per
    top-level root, with counts and bytes — the archival-planning view
    that turns the du rollup into a migration plan.  The as-of instant is
    a pinned epoch (the reference's NOW() is not oracle-reproducible —
    same convention as report_large_old_files).  One partial-combining
    aggregate over exact integer ages."""
    root = d.elem(d.split("path", "/"), "2")
    age = f"({as_of_epoch} - greatest(st_mtime, st_ctime))"
    tier = (
        f"CASE WHEN {age} < 86400 THEN '1_hot' "
        f"WHEN {age} < 2592000 THEN '2_warm' "
        f"WHEN {age} < 15552000 THEN '3_cold' "
        f"ELSE '4_frozen' END"
    )
    return f"""
SELECT root, tier,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(st_size) AS BIGINT) AS total_bytes
FROM (SELECT {root} AS root, {tier} AS tier, st_size FROM {src}) t
GROUP BY root, tier
ORDER BY root, tier
""".strip()


def gen_duplicate_files(d: Dialect, src: str = "files") -> str:
    """Duplicate-file report: files with identical (size, content digest)
    grouped into copy-sets with the reclaimable byte count — the classic
    storage-crawler deliverable ("this tree wastes N GB on copies").
    Content digests come from the backing documents relation (the files
    derivation maps doc → file 1:1); size joins the digest in the group
    key so a digest collision across different sizes can never merge.

    100 TB shape: one digest map over the narrow (id, size) projection
    joined to the text source on the id key, one partial-combining
    aggregate on the (digest, size) key; only multi-copy groups emitted.
    Wasted bytes CAST to BIGINT (HUGEINT trap).
    """
    digest = d.md5_utf8("doc.text")
    return f"""
SELECT digest, st_size,
       CAST(min(id) AS BIGINT) AS keeper_id,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST((count(*) - 1) * st_size AS BIGINT) AS wasted_bytes
FROM (
  SELECT f.id, f.st_size, {digest} AS digest
  FROM {src} f
  JOIN documents doc ON f.id = doc.doc_id
  WHERE doc.text IS NOT NULL
) fd
GROUP BY digest, st_size
HAVING count(*) > 1
ORDER BY wasted_bytes DESC, digest
""".strip()


def gen_permission_audit(d: Dialect, src: str = "files") -> str:
    """Per-owner permission audit over the mode bits: world-writable,
    group-writable, and setuid counts plus world-writable bytes — the
    security sweep a storage team runs against the reference's
    ``st_mode bit(19)`` column (storcrawl.py:361 renders the same 19 bits
    this audit classifies).

    The driver's synthetic ``files`` derivation carries no mode column, so
    the audit derives a deterministic mode int per file id inline (regular
    file base 0o100000 + id*31 mod 0o7777 — every permission bit cycles);
    a real crawl substitutes its stat-stage st_mode unchanged.  The
    classification is pure bitwise AND (both engines' ``&``), one
    partial-combining aggregate on the uid key — map-only ahead of the
    shuffle, no join.
    """
    return f"""
SELECT st_uid,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN (m & 2) <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_world_writable,
       CAST(sum(CASE WHEN (m & 16) <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_group_writable,
       CAST(sum(CASE WHEN (m & 2048) <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_setuid,
       CAST(sum(CASE WHEN (m & 2) <> 0 THEN st_size ELSE 0 END) AS BIGINT) AS bytes_world_writable
FROM (
  SELECT st_uid, st_size, CAST(32768 + (id * 31) % 4095 AS BIGINT) AS m
  FROM {src}
) t
GROUP BY st_uid
ORDER BY st_uid
""".strip()


def gen_dir_fanout(d: Dialect, src: str = "files") -> str:
    """Per-DIRECT-parent fanout profile: children count, bytes, and depth
    for every immediate parent directory, topped by the widest directories
    — the million-files-in-one-dir pathology detector (listing such a
    directory stalls crawlers and NFS alike; the subtree du cannot see it
    because ancestors absorb the counts).

    Depth here is the parent's component count (root '/x' = depth 1).
    One map-side parent derivation (drop the last path component) + one
    partial-combining aggregate — no explode at all, unlike the subtree
    rollup, because only the DIRECT parent is charged."""
    toks = d.split("path", "/")
    parent = d.ajoin(d.aslice("toks", "1", f"{d.size('toks')} - 1"), "/")
    return f"""
SELECT parent_dir,
       CAST(depth AS INT) AS depth,
       CAST(count(*) AS BIGINT) AS n_children,
       CAST(sum(st_size) AS BIGINT) AS total_bytes,
       CAST(max(st_size) AS BIGINT) AS max_child_bytes
FROM (
  SELECT {parent} AS parent_dir, {d.size('toks')} - 2 AS depth, st_size
  FROM (SELECT {toks} AS toks, st_size FROM {src}) f
) a
GROUP BY parent_dir, depth
ORDER BY n_children DESC, parent_dir
""".strip()


def gen_depth_profile(d: Dialect, src: str = "files") -> str:
    """Filesystem-shape profile: entry counts, byte mass, and size bounds
    per (top-level directory, path depth) — the tree-topology readout a
    storage team reads before choosing crawl partitioning (a wide shallow
    tree and a deep spine need different walker fan-outs; the reference
    hardcodes its fan-out, storcrawl.py:41).

    Depth is the path's separator count (computed via length difference —
    no regex, no explode); the top-level segment comes from one array
    element.  Map-only projection plus one partial-combining aggregate on
    a tiny (top, depth) key — no join, no window, one shuffle.
    """
    depth = "length(path) - length(replace(path, '/', ''))"
    top = d.elem(d.split("path", "/"), "2")
    return f"""
SELECT top_dir, depth,
       CAST(count(*) AS BIGINT) AS n_entries,
       CAST(sum(st_size) AS BIGINT) AS total_bytes,
       CAST(min(st_size) AS BIGINT) AS min_bytes,
       CAST(max(st_size) AS BIGINT) AS max_bytes
FROM (
  SELECT {top} AS top_dir, CAST({depth} AS BIGINT) AS depth, st_size
  FROM {src}
) p
GROUP BY top_dir, depth
ORDER BY top_dir, depth
""".strip()


def gen_hardlink_rollup(d: Dialect, paths_rel: str) -> str:
    """Per-device hard-link resolution over a ``(st_dev, st_ino, st_size)``
    path listing: apparent bytes (every path counted — what ``du`` without
    inode tracking reports) vs real bytes (each inode once — what the disk
    holds), plus link-set accounting.  The one fs-semantics report the du
    family lacks: a tree full of ``st_nlink > 1`` files double-counts
    every extra name.

    Devices are the correct accounting unit (hard links cannot cross
    mount points); the inode's byte size is ``min`` over its paths —
    identical by definition on a real filesystem (one stat struct), made
    explicit for the synthetic twin whose per-path sizes differ.

    100 TB shape: one partial-combining aggregate on (st_dev, st_ino) —
    the natural key the listing is already dense in — then a tiny roll-up
    on st_dev; no joins, no windows (the duplicate-files plan shape).
    """
    return f"""
SELECT st_dev,
       CAST(sum(nlink) AS BIGINT) AS n_paths,
       CAST(count(*) AS BIGINT) AS n_inodes,
       CAST(sum(CASE WHEN nlink > 1 THEN nlink ELSE 0 END) AS BIGINT) AS n_linked_paths,
       CAST(sum(CASE WHEN nlink > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_linksets,
       CAST(sum(path_bytes) AS BIGINT) AS apparent_bytes,
       CAST(sum(inode_bytes) AS BIGINT) AS real_bytes,
       CAST(sum(path_bytes) - sum(inode_bytes) AS BIGINT) AS overcount_bytes
FROM (
  SELECT st_dev, st_ino,
         CAST(count(*) AS BIGINT) AS nlink,
         CAST(min(st_size) AS BIGINT) AS inode_bytes,
         CAST(sum(st_size) AS BIGINT) AS path_bytes
  FROM {paths_rel}
  GROUP BY st_dev, st_ino
) per_inode
GROUP BY st_dev
ORDER BY st_dev
""".strip()


def gen_hardlink_usage(d: Dialect, src: str = "files") -> str:
    """Hard-link report over the synthetic ``files`` view, which carries no
    inode columns: a deterministic (st_dev, st_ino) pair is derived inline
    (the permission-audit convention — a real crawl substitutes its stat
    columns unchanged, see :func:`hardlink_usage_df`).  Devices are 16-id
    regions mod 3; within each region the first four ids share one inode
    (a 4-member link set), the rest self-inode — so every device carries
    both linked and unlinked files and link sets never straddle devices
    (hard links cannot cross mounts)."""
    dev = f"({d.idiv('id', '16')}) % 3"
    ino = f"CASE WHEN id % 16 < 4 THEN id - (id % 16) ELSE id END"
    paths = (
        f"(SELECT CAST({dev} AS BIGINT) AS st_dev, "
        f"CAST({ino} AS BIGINT) AS st_ino, st_size FROM {src})"
    )
    return gen_hardlink_rollup(d, paths)


def hardlink_usage_df(files) -> "object":
    """Hard-link resolution over a REAL crawl ``files`` table (crawl/
    walker.py and the fsmeta source both stat st_dev/st_ino/st_nlink, the
    reference's stat projection, storcrawl.py:361-370): regular files
    only — the S_IFREG type field is ``1000`` at positions 4-7 of the
    19-bit st_mode string (0o170000 mask = bits 15..12) — then the same
    rollup the oracle-gated entry runs."""
    from storage_crawler_spark.plans.dialect import SPARK

    spark = files.sparkSession
    files.filter(
        "st_size IS NOT NULL AND st_ino IS NOT NULL "
        "AND substr(st_mode, 4, 4) = '1000'"
    ).selectExpr("st_dev", "st_ino", "st_size").createOrReplaceTempView(
        "_hardlink_paths"
    )
    return spark.sql(gen_hardlink_rollup(SPARK, "_hardlink_paths"))


def gen_du_forecast(d: Dialect, interval_s: int = 60, src: str = "files") -> str:
    """Capacity forecast per top-level root — the forward-looking report
    the du family lacked: fit an OLS line to the CUMULATIVE ingested
    bytes over insert-time buckets and read off the growth slope and the
    intervals until the root's footprint DOUBLES (the procurement
    question growth_daily's chart answers by eyeball).  A production
    deployment buckets by day (interval_s = 86400); the default is 60 s
    because the synthetic corpus's insert epochs span minutes, not months
    — the fit algebra is identical.

    Engine exactness (the events_value_trend discipline): x = bucket −
    min(bucket) per root and y = cumulative BIGINT bytes, so Σx, Σy, Σxy,
    Σx² are exact integers; slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is ONE
    division, and intervals_to_double = current/slope one more.  Roots
    with a single bucket (no trend evidence) yield NULL slope via the
    nullif guard, never a divide-by-zero.

    Overflow posture (r11 ADVICE): the four sums and every product of
    sums accumulate as DECIMAL(38,0) — exact integer arithmetic to 1e38,
    order-free, identical in both engines (the money-sum discipline), so
    nΣxy, ΣxΣy etc. cannot wrap at any realistic scale (daily buckets
    over a decade at 1 PB cumulative ≈ 1e25 ≪ 1e38).  The only BIGINT
    stage left is the PER-TERM product x·y, bounded by max_x · cur_bytes
    < 2^63 — e.g. 10 years of daily buckets (x ≤ 3653) times ~2.5 EB per
    root — a physical-impossibility margin, where the old BIGINT Σxy
    wrapped silently (non-ANSI Spark) vs DuckDB's raise at ~300 buckets
    of a 100 TB root.

    100 TB shape: one partial-combining aggregate to the per-(root,
    bucket) relation (tiny: corpus age / interval rows per root); the
    running sum and the x-offset windows run on that relation only — the
    corpus-sized scan never sorts."""
    root = d.elem(d.split("path", "/"), "2")
    bucket = d.idiv("insert_epoch", str(interval_s))
    # nested subqueries, no top-level WITH: the DuckDB oracle is wrapped by
    # with_files_cte (which owns the WITH), the Spark side reads the view
    # covariance/variance numerators as DECIMAL(38,0): exact and identical
    # in both engines; cast to DOUBLE only at the two division points
    num = "(n_buckets_d * sxy - sx * sy)"
    den = "(n_buckets_d * sxx - sx * sx)"
    return f"""
SELECT root, n_buckets, cur_bytes,
       {d.trunc6(f'CAST({num} AS DOUBLE) / nullif(CAST({den} AS DOUBLE), 0)')} AS slope_bytes_per_interval,
       CASE WHEN {num} > 0 THEN
         {d.trunc6(f'CAST(cur_bytes AS DOUBLE) * CAST({den} AS DOUBLE) / CAST({num} AS DOUBLE)')}
       ELSE NULL END AS intervals_to_double
FROM (
  SELECT root,
         CAST(count(*) AS DECIMAL(38,0)) AS n_buckets_d,
         CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(max(y) AS BIGINT) AS cur_bytes,
         CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
         CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
         CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
         CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx
  FROM (
    SELECT root,
           CAST(bucket - min(bucket) OVER (PARTITION BY root) AS BIGINT) AS x,
           CAST(sum(added) OVER (PARTITION BY root ORDER BY bucket) AS BIGINT) AS y
    FROM (
      SELECT root, bucket, CAST(sum(st_size) AS BIGINT) AS added
      FROM (
        SELECT {root} AS root, {bucket} AS bucket, st_size FROM {src}
      ) t0
      GROUP BY root, bucket
    ) perb
  ) cum
  GROUP BY root
) fit
ORDER BY root
""".strip()
