"""Deduplication operators over ``documents`` (SURVEY.md §2.9 north star).

Four tiers, each a different cost/recall point, all shuffle-conscious:

- **exact** — md5-fingerprint groupBy.  At 100 TB this is a single shuffle
  on a 16-byte key with map-side partial aggregation; the text column never
  moves, only (hash, id).
- **n-gram Jaccard** — exact token-set Jaccard over *blocked* pairs (same
  lang, |n_chars| window).  Blocking keys turn an O(n²) cross join into a
  per-block join a shuffle can colocate; the length window keeps blocks
  tight (a true near-dup rarely changes length much).
- **MinHash + LSH** — k=16 permutations over 3-token shingles, banded 4×4;
  candidate pairs come from band-key equality joins (shuffle on band key),
  estimated similarity = signature agreement.  The scale path: cost is
  linear in corpus + join on colliding buckets only.
- **SimHash** — 64-bit near-dup fingerprint with Hamming-ball lookup,
  implemented as an Arrow-vectorized pandas UDF (bit ops are not worth
  expressing in SQL); Spark-only, verified by pytest rather than the SQL
  oracle.

The SQL-expressible tiers are generated per dialect (plans/dialect.py) so
the DuckDB oracle runs the semantically identical query.
"""

from __future__ import annotations

from storage_crawler_spark.plans.dialect import Dialect

# (a, b) multipliers for the 16 minhash permutations ((a*h + b) mod P).
MINHASH_P = 2_147_483_647
MINHASH_PERMS = [
    (541, 11), (1223, 29), (2741, 47), (3571, 83),
    (4799, 101), (5903, 131), (7129, 173), (8387, 199),
    (9613, 233), (10847, 271), (12011, 313), (13217, 353),
    (14407, 397), (15601, 433), (16811, 479), (18041, 523),
]
N_BANDS = 4
ROWS_PER_BAND = 4
# Winnowing defaults shared by gen_winnow_fk and gen_winnow_pairs: the
# fk_rel contract guard compares against THESE (r13 ADVICE — a literal
# (8, 4, 50) in the guard would silently drift from the signatures).
WINNOW_K = 8
WINNOW_W = 4
WINNOW_DF_CAP = 50
WINNOW_MIN_SHARED = 25
# The threshold-histogram's deliberately-low pair floor, shared by
# gen_threshold_histogram's default and the Spark builder's fastpath pair
# stage (a literal 0.3 in both places would silently drift).
THRESHOLD_HISTOGRAM_FLOOR = 0.3


def gen_dedup_exact(d: Dialect) -> str:
    """Exact dedup: one group per distinct text fingerprint, keeper = min id."""
    fp = d.md5_utf8("text")
    return f"""
SELECT fp, count(*) AS n_docs, min(doc_id) AS keeper_doc_id
FROM (SELECT doc_id, {fp} AS fp FROM documents) t
GROUP BY fp
HAVING count(*) >= 1
""".strip()


def gen_jaccard_prep(d: Dialect, length_window: int = 60, src: str = "documents") -> str:
    """Per-document Jaccard prep: hashed distinct token set + set size.

    Tokens are hashed to 64-bit BIGINTs once per document: set intersection
    on primitive-long arrays is ~2.6× faster than on string arrays (Spark's
    array_intersect takes a specialized primitive path), and the hash is
    computed in the map-only prep, not per pair.  The hash is engine-local
    (Spark xxhash64 / DuckDB md5 prefix — see Dialect.token_hash64): only
    intersection CARDINALITIES reach the output, so the engines never
    compare hash values, and a collision merging two tokens within one
    engine is negligible at 2^48+.

    (``length_window`` is accepted for signature stability; the ±window
    predicate is applied inside the rank-bucketed pair join, which blocks on
    sorted-neighborhood rank — see :func:`gen_jaccard_pairs`.)
    """
    toks = d.adistinct(d.split("text"))
    hs = d.transform(toks, "t", d.token_hash64("t"))
    return f"""
SELECT doc_id, lang, n_chars, {hs} AS hs, {d.size(toks)} AS n_toks
FROM {src}
""".strip()


def gen_jaccard_pairs(
    d: Dialect,
    threshold: float = 0.5,
    length_window: int = 60,
    prep_rel: str | None = None,
    block_cap: int = 512,
    block_width: int = 64,
    ranked_rel: str | None = None,
    src: str = "documents",
    prefix_col: str | None = None,
) -> str:
    """Blocked exact Jaccard over distinct token sets, with bounded blocks.

    Blocking is **sorted-neighborhood**: docs are ranked per ``lang`` by
    (n_chars, doc_id); only pairs within ``block_cap`` rank positions are
    compared.  The |n_chars diff| ≤ window predicate is applied exactly
    inside the block.

    Why capped: a corpus of many same-lang same-length docs made the old
    (lang, length-bucket) block quadratic.  The rank cap bounds total work
    at O(n·cap), whatever the length histogram does.  Recall: a true pair
    is dropped only when > block_cap docs sit between the two in the
    per-lang length sort — i.e. only on corpora where the quadratic scan
    was the alternative; :func:`gen_jaccard_dropped` counts that loss
    instead of letting it hide.

    Join-key shape (the part that decides parallelism): ranks are bucketed
    at ``block_width`` (NOT at ``block_cap``) and the probe side is
    expanded to offsets 0..ceil(cap/width), so every in-cap rank pair meets
    on exactly one (lang, bucket) equi-key while the key space stays
    n/width keys per lang.  Bucketing at the cap itself (round-1 shape)
    collapsed the key space to n/cap keys — ~20 keys at 5k docs — and the
    join ran ~5× slower on 32 cores from key-granularity skew alone, with
    identical pair counts.  Candidate volume is the same either way
    (≈ n·(cap+width)); only the distribution changes.

    A size bound prunes ahead of the set intersection: J = |∩|/|∪| ≤
    min(n_toks)/max(n_toks), so pairs with min < θ·max cannot reach the
    threshold and are rejected with two integer reads — the intersection
    (the per-pair hot cost) only runs on pairs that could qualify.  Exact,
    not approximate.

    ``prep_rel`` lets the Spark builder substitute a cached/materialized
    prep relation (Spark inlines CTEs, so tokenizing twice is real work);
    ``ranked_rel`` substitutes a relation that already carries ``rnk``
    (see :func:`gen_jaccard_ranked`) so the per-lang window also runs
    once.  The oracle inlines both CTEs.
    """
    width = min(block_width, block_cap)
    n_off = block_cap // width + (1 if block_cap % width else 0) + 1
    offsets = ", ".join(f"({i})" for i in range(n_off))
    inter = d.size(d.aintersect("a.hs", "b.hs"))
    if ranked_rel:
        rt = ranked_rel
        with_clause = ""
    else:
        t = prep_rel or "t"
        prep_cte = "" if prep_rel else f"t AS (\n{gen_jaccard_prep(d, length_window, src=src)}\n),\n"
        with_clause = f"WITH {prep_cte}rt AS (\n{gen_jaccard_ranked(d, t, src=src)}\n)\n"
        rt = "rt"
    rblk = d.idiv("(rnk - 1)", str(width))
    # The threshold test runs as an EXACT INTEGER predicate on the hoisted
    # intersection column: trunc6(i/u) >= θ  ⟺  1e6·i >= (1e6·θ)·u when
    # 1e6·θ is an integer (θ is a per-mille-grained knob), with u = union
    # size.  Why it matters (r12): CollapseProject + predicate pushdown
    # substitute a computed column back into every consumer, so filtering
    # on the trunc6'd DOUBLE evaluated the array-intersection 2-4× per
    # candidate pair (the guard branch of the overflow-safe trunc6 made
    # it visibly worse on the bench); the integer predicate costs one
    # intersection per pair, and the display score is only computed for
    # the few survivors.
    thr6 = int(round(threshold * 1_000_000))
    assert abs(thr6 / 1_000_000 - threshold) < 1e-12, "threshold finer than 1e-6"
    # Spark-side exact prefix pre-filter (r14 optimization): when the
    # ranked relation carries the fastpath's sorted-prefix column, an
    # arrays_overlap test runs BEFORE the set intersection.  SSJoin lemma
    # (see fastpath.JACCARD_PREF_THETA): sets with overlap >= α share an
    # element in their (size − α + 1)-prefixes under any global order; a
    # pair at this threshold needs i >= ceil(θ·|x|) per side, so prefixes
    # built at JACCARD_PREF_THETA can never reject a qualifying pair as
    # long as threshold >= that θ.  Non-matching candidates (the vast
    # majority) are rejected at ~half an intersection's cost; matches pay
    # the overlap probe (early-exit) plus the intersection.  Oracle-side
    # semantics untouched: the filter is pure pruning, and the guard
    # keeps it off any query whose threshold is below the prep's θ.
    pre = ""
    if prefix_col is not None:
        from storage_crawler_spark.operators.fastpath import JACCARD_PREF_THETA

        if d.name != "spark":
            raise ValueError("prefix_col is a Spark engine-path pruning device")
        if threshold < JACCARD_PREF_THETA:
            raise ValueError(
                f"prefix_col prefixes are built for θ={JACCARD_PREF_THETA}; "
                f"a lower query threshold ({threshold}) would prune true pairs"
            )
        pre = f"\n   AND arrays_overlap(a.{prefix_col}, b.{prefix_col})"
    # Display score from the SAME integer quantities as the filter
    # (r12 ADVICE): floor(1e6*i/u)/1e6 via exact integer division, so a
    # boundary pair that passes the integer predicate can never DISPLAY
    # a score that truncates below the threshold (the old trunc6'd DOUBLE
    # division could round down across the 1e-6 boundary the filter
    # already cleared).  i is cast to BIGINT at the production site so
    # 1e6*i cannot wrap 32-bit int at large token counts.
    jac6 = f"CAST({d.idiv('1000000 * i', '(an + bn - i)')} AS DOUBLE) / 1000000"
    return f"""{with_clause}SELECT doc_a, doc_b,
       {jac6} AS jaccard
FROM (
  SELECT least(a.doc_id, b.doc_id) AS doc_a, greatest(a.doc_id, b.doc_id) AS doc_b,
         CAST({inter} AS BIGINT) AS i, a.n_toks AS an, b.n_toks AS bn
  FROM (SELECT x.*, {rblk} + off.o AS jblk
        FROM {rt} x CROSS JOIN (VALUES {offsets}) AS off(o)) a
  JOIN (SELECT x.*, {rblk} AS rblk FROM {rt} x) b
    ON a.lang = b.lang AND a.jblk = b.rblk
   AND b.rnk > a.rnk AND b.rnk - a.rnk <= {block_cap}
   AND abs(a.n_chars - b.n_chars) <= {length_window}
   AND least(a.n_toks, b.n_toks) >= {threshold} * greatest(a.n_toks, b.n_toks){pre}
) p0
WHERE 1000000 * i >= {thr6} * (an + bn - i)
""".strip()


def scalable_lang_rank(src_df, n_partitions: int | None = None):
    """Two-phase range-partitioned per-lang rank — row_number() OVER
    (PARTITION BY lang ORDER BY n_chars, doc_id) without the per-lang
    single-task sort.

    A per-lang window funnels each lang through ONE sort task; at 100 TB a
    big lang is a straight scale ceiling.  Two-phase instead:

    1. ``repartitionByRange(lang, n_chars, doc_id)`` — each lang's global
       sort order becomes partition-contiguous (a lang may span partitions);
    2. one shuffle computes, per (partition, lang) group, local
       ``row_number`` AND group count (two window functions over the same
       spec — Catalyst evaluates both in a single sort pass, and group size
       is bounded by the RANGE partitioner's balance, not by lang size);
    3. the distinct (pid, lang, count) triples — O(partitions × langs),
       kilobytes — come to the driver, prefix-sum to per-(pid, lang)
       offsets, and broadcast-join back: global rank = local + offset.

    Output: src_df columns + ``rnk``.  Bit-identical to the window (the
    jaccard oracle's hash match proves it on every driver run; pytest
    proves it on random data).  src_df needs doc_id, lang, n_chars.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = src_df.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism
    pidded = (
        src_df.select("doc_id", "lang", "n_chars")
        .repartitionByRange(n, "lang", "n_chars", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        # pin partition ids: spark_partition_id is plan-dependent, and the
        # column is consumed by two different downstream plans
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("pid", "lang").orderBy("n_chars", "doc_id")
    local = pidded.select(
        "doc_id",
        "lang",
        "pid",
        F.row_number().over(w).alias("local_rnk"),
        F.count(F.lit(1)).over(Window.partitionBy("pid", "lang")).alias("grp_cnt"),
    )
    counts = sorted(
        (
            (r.pid, r.lang, r.grp_cnt)
            for r in local.select("pid", "lang", "grp_cnt").distinct().collect()
        ),
        # None-safe: lang may be NULL (the window path groups NULL langs into
        # one partition; a plain tuple sort would raise TypeError on
        # None-vs-str).  Only (pid, lang-grouping) matters — the offset walk
        # below keys per-lang state off pid order alone.
        key=lambda t: (t[0], t[1] is not None, t[1] or ""),
    )
    offsets, seen = [], {}
    for pid, lang, cnt in counts:  # pid ascending == global order per lang
        offsets.append((pid, lang, seen.get(lang, 0)))
        seen[lang] = seen.get(lang, 0) + cnt
    off_df = spark.createDataFrame(offsets, "pid INT, lang STRING, off BIGINT")
    # eqNullSafe on lang: a plain equi-join would drop NULL-lang rows (the
    # window path ranks them as their own partition, so this path must too).
    ranked = (
        local.alias("l")
        .join(
            F.broadcast(off_df).alias("o"),
            (F.col("l.pid") == F.col("o.pid")) & F.col("l.lang").eqNullSafe(F.col("o.lang")),
        )
        .select("l.doc_id", (F.col("local_rnk") + F.col("off")).alias("rnk"))
    )
    return src_df.join(ranked, "doc_id")


def gen_jaccard_ranked(d: Dialect, prep_rel: str = "t", src: str = "documents") -> str:
    """Per-lang sorted-neighborhood rank joined onto the Jaccard prep.

    The rank depends only on (doc_id, lang, n_chars) — source-table columns,
    no tokenization — so the window runs over a NARROW pruned scan of
    ``src`` and the result is hash-joined back to the prep by doc_id: the
    token-hash arrays never ride the per-lang exchange, and the rank side
    never pays the tokenize/md5 map.  A ``row_number() OVER (PARTITION BY
    lang …)`` necessarily funnels each lang into one sort task; keeping that
    shuffle to 20-byte rows makes it cheap at any corpus size, while the
    array-carrying join distributes on doc_id across all cores.  (At extreme
    per-lang cardinality the single-task sort itself becomes the ceiling;
    the two-phase range-partitioned rank is the documented upgrade path.)"""
    return f"""
SELECT p.*, r.rnk
FROM {prep_rel} p
JOIN (SELECT doc_id, row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rnk
      FROM {src}) r
  ON p.doc_id = r.doc_id
""".strip()


def gen_jaccard_dropped(
    d: Dialect, length_window: int = 60, block_cap: int = 512, src: str = "documents"
) -> str:
    """Diagnostic for the block cap: per lang, how many length-window
    neighbors the densest doc has, and an upper bound on pairs the rank cap
    refuses to compare (pairs within ±window chars but > block_cap rank
    positions apart).  0 everywhere ⇒ the capped result is exact."""
    est = d.idiv(f"CAST(sum(greatest(0, neighbors - 2 * {block_cap})) AS BIGINT)", "2")
    return f"""
SELECT lang, count(*) AS n_docs, max(neighbors) AS max_neighbors,
       {est} AS est_dropped_pairs
FROM (
  SELECT lang,
         count(*) OVER (PARTITION BY lang ORDER BY n_chars
                        RANGE BETWEEN {length_window} PRECEDING AND {length_window} FOLLOWING) - 1 AS neighbors
  FROM {src}
) t
GROUP BY lang
""".strip()


def gen_substring_spans(
    d: Dialect, width: int = 32, stride: int = 8, src: str = "documents"
) -> str:
    """Cross-document EXACT substring dedup: token windows of ``width``
    tokens (sampled every ``stride``) that occur verbatim in two or more
    documents — the span-level tier between exact-doc dedup (whole-text
    fingerprint) and near-dup (MinHash/Jaccard), catching boilerplate,
    quoted passages, and template text that document-level similarity
    misses entirely.

    Spark-first shape: a UDTF-shaped lateral explode of window start
    positions (zero Python), one md5 per sampled window (md5 — not the
    engine-local token hash — because the span KEY is an output column and
    must be byte-identical in both engines), then a single aggregation on
    the span key.  Wholly map-side until one shuffle on span_key; the
    count-distinct is planned as Spark's standard expand+two-phase
    aggregate, both phases partial-combining.  100 TB posture: window
    volume is n_tokens/stride per doc — the stride caps explode fan-out at
    a measured recall cost (a duplicated region of length L >= width +
    stride - 1 always contains a sampled window start in one doc, but BOTH
    docs must sample aligned starts, so stride>1 trades recall for volume;
    stride=1 is the exact Lee-et-al-style sweep and the documented
    upgrade, whose volume wants the rolling-hash fingerprint rather than
    per-window md5).  Common-boilerplate span keys are hot but the
    aggregate is partial-combining, so skew collapses map-side; no join
    anywhere.

    Output: span_key (md5 hex), n_docs (distinct documents containing the
    span), n_occurrences (total sampled occurrences), first_doc_id
    (min doc id — the canonical holder).
    """
    return f"""
SELECT span_key, count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs,
       min(doc_id) AS first_doc_id
FROM (
{gen_span_windows(d, width, stride, src)}
) w
GROUP BY span_key
HAVING count(DISTINCT doc_id) >= 2
""".strip()


def gen_span_windows(
    d: Dialect, width: int = 32, stride: int = 8, src: str = "documents"
) -> str:
    """(doc_id, span_key) sampled-window relation shared by the substring
    operators.  Docs shorter than ``width`` tokens emit NO rows (the guard
    precedes the explode — Spark's sequence() counts down on lo > hi)."""
    toks = d.split("text")
    span = d.ajoin(d.aslice("toks", "pos", str(width)), " ")
    key = d.md5_utf8(span)
    lat = d.lateral_seq("1", f"n_toks - {width - 1}", "pos", str(stride))
    return f"""
SELECT doc_id, {key} AS span_key
FROM (SELECT doc_id, {toks} AS toks, {d.size(d.split('text'))} AS n_toks
      FROM {src}
      WHERE {d.size(d.split('text'))} >= {width}) t
{lat}
""".strip()


def gen_dup_span_ratio(
    d: Dialect,
    width: int = 32,
    stride: int = 8,
    src: str = "documents",
    windows_rel: str | None = None,
) -> str:
    """Per-document duplicated-span ratio: the fraction of a doc's sampled
    token windows whose exact text also occurs in ANOTHER document — the
    quality signal substring-span dedup feeds back to filtering (a doc
    that is 80% shared boilerplate is a removal candidate even when no
    single other doc is a near-duplicate of it).

    Shape: the sampled-window relation (:func:`gen_span_windows`), one
    aggregation to per-(span, doc) rows, a self-aggregation marking spans
    with >= 2 docs, then a broadcast-friendly semi-style join back and a
    final per-doc aggregation.  All joins are on span_key (equi).  Docs
    shorter than the window emit no windows and are ABSENT from the
    output (not ratio 0) — consumers left-joining this signal must treat
    a missing row as 'not computable', not 'clean'.

    The window relation is referenced twice; Spark inlines CTEs, so the
    Spark builder passes ``windows_rel`` naming a persisted temp view
    (the explode + per-window md5 is the dominant cost and must not run
    twice at scale), while the DuckDB oracle keeps the inline CTE (DuckDB
    materializes CTEs referenced more than once).
    """
    ratio = d.trunc6(
        "CAST(sum(CASE WHEN dup.span_key IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)"
        " / count(*)"
    )
    if windows_rel:
        w = windows_rel
        with_clause = "WITH "
    else:
        w = "w"
        with_clause = f"WITH w AS (\n{gen_span_windows(d, width, stride, src)}\n),\n"
    return f"""{with_clause}per_doc AS (SELECT span_key, doc_id, count(*) AS n FROM {w} GROUP BY span_key, doc_id),
dup AS (SELECT span_key FROM per_doc GROUP BY span_key HAVING count(*) >= 2)
SELECT {w}.doc_id,
       count(*) AS n_windows,
       CAST(sum(CASE WHEN dup.span_key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
       {ratio} AS dup_ratio
FROM {w} LEFT JOIN dup ON {w}.span_key = dup.span_key
GROUP BY {w}.doc_id
""".strip()


def _shingles(d: Dialect) -> str:
    """3-token shingles; documents shorter than 3 tokens shingle to the whole
    text.  seq() bounds are guarded (Spark's sequence counts down on lo>hi)."""
    toks = "toks"
    three = d.transform(
        d.seq("1", f"{d.size(toks)} - 2"),
        "i",
        f"concat({d.elem(toks, 'i')}, ' ', {d.elem(toks, 'i + 1')}, ' ', {d.elem(toks, 'i + 2')})",
    )
    return f"CASE WHEN {d.size(toks)} >= 3 THEN {three} ELSE {d.arr1('text')} END"


def gen_minhash_sigs(d: Dialect, src: str = "documents") -> str:
    """Per-document minhash signature (16 BIGINT columns m0..m15).

    Pipeline: tokens → 3-shingles → md5-derived 48-bit shingle hash (md5
    computed once per shingle) → per-permutation min.  Everything stays in
    array expressions: no explode, no extra shuffle — at scale this is a
    map-only stage over the documents scan.
    """
    mins = ",\n  ".join(
        f"{d.amin(d.transform('hs', 'h', f'({a} * h + {b}) % {MINHASH_P}'))} AS m{k}"
        for k, (a, b) in enumerate(MINHASH_PERMS)
    )
    # adistinct before md5: min() is idempotent to duplicates, so hashing
    # each DISTINCT shingle once yields bit-identical signatures while
    # cutting the md5 volume (the dominant cost of the whole operator) by
    # the corpus' shingle repetition factor.
    return f"""
SELECT doc_id,
  {mins}
FROM (
  SELECT doc_id, {d.transform("hexes", "m", d.hex12_to_bigint("m"))} AS hs
  FROM (
    SELECT doc_id, {d.transform("shingles", "s", f"substr({d.md5_utf8('s')}, 1, 12)")} AS hexes
    FROM (
      SELECT doc_id, {d.adistinct(_shingles(d))} AS shingles
      FROM (SELECT doc_id, text, {d.split("text")} AS toks FROM {src}) t0
    ) t1
  ) t2
) t3
""".strip()


def gen_minhash_bands(d: Dialect, sigs_rel: str) -> str:
    """The band-key relation ``(doc_id, band_id, band_key)`` — one row per
    document per band, ``band_key = md5(concat_ws('|', band's 4 sig cols))``.

    The two dialects emit the same row multiset through different shapes:

    - DuckDB (the oracle) keeps the original {N_BANDS}-way UNION ALL — one
      SELECT per band.
    - Spark computes all {N_BANDS} keys in ONE projection and posexplodes
      them: under a persisted ``sigs_rel`` the UNION form executes a
      separate InMemoryTableScan per branch per consumer (the pair self-join
      reads bands twice → 8 scans, each its own AQE stage — the "many small
      stages" latency the r14 profile flagged), while the explode form is
      1 scan + 1 Generate per consumer.  Total md5 work is identical (4 per
      doc either way); ``posexplode``'s (pos, col) is exactly the UNION
      branches' ``({{band}} AS band_id, key AS band_key)``, so the relation
      is identical by construction.  Guide §2.4 (remove redundant
      exchanges/stages), §1.2 (plan-shape latency at bench scale).
    """
    keys = []
    for band in range(N_BANDS):
        cols = ", ".join(f"m{band * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        keys.append(d.md5_utf8(f"concat_ws('|', {cols})"))
    if d.name == "spark":
        arr = ", ".join(keys)
        return (
            f"SELECT doc_id, band_id, band_key FROM {sigs_rel}\n"
            f"  LATERAL VIEW posexplode(array({arr})) b AS band_id, band_key"
        )
    return "\nUNION ALL\n".join(
        f"SELECT doc_id, {band} AS band_id, {key} AS band_key FROM {sigs_rel}"
        for band, key in enumerate(keys)
    )


def gen_minhash_pairs(
    d: Dialect, min_agreement: float = 0.25, sigs_rel: str | None = None
) -> str:
    """LSH candidate generation + signature-agreement estimate.

    Bands of {ROWS_PER_BAND} rows; candidates = pairs sharing ≥1 band key
    (equality join per band, unioned); estimate = fraction of the 16
    signature slots that agree.  The band join is the only shuffle.

    The signature relation is referenced 6 times (4 band scans + both probe
    sides).  Spark inlines CTEs, which would recompute the whole shingle/
    md5/permutation pipeline each time — the Spark builder therefore passes
    ``sigs_rel`` naming a persisted temp view (at 100 TB: a materialized
    signature table), while the DuckDB oracle keeps the inline CTE (DuckDB
    materializes CTEs referenced more than once).
    """
    ctes: list[str] = []
    if sigs_rel is None:
        ctes.append(f"sigs AS (\n{gen_minhash_sigs(d)}\n)")
        sigs_rel = "sigs"
    ctes.append(f"bands AS (\n{gen_minhash_bands(d, sigs_rel)}\n)")
    ctes.append(
        f"""cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_key = y.band_key AND x.doc_id < y.doc_id
)"""
    )
    agree = " + ".join(f"(CASE WHEN sa.m{k} = sb.m{k} THEN 1 ELSE 0 END)" for k in range(16))
    with_clause = "WITH " + ",\n".join(ctes)
    return f"""{with_clause}
SELECT doc_a, doc_b, est_jaccard FROM (
  SELECT c.doc_a, c.doc_b,
         round(CAST({agree} AS DOUBLE) / 16, 6) AS est_jaccard
  FROM cand c
  JOIN {sigs_rel} sa ON sa.doc_id = c.doc_a
  JOIN {sigs_rel} sb ON sb.doc_id = c.doc_b
) p
WHERE est_jaccard >= {min_agreement}
""".strip()


def gen_minhash_pairs_incremental(
    d: Dialect,
    new_pred: str = "doc_id % 10 = 0",
    min_agreement: float = 0.25,
    sigs_rel: str | None = None,
) -> str:
    """Incremental near-dup pass: candidate pairs that involve at least one
    NEW document (``new_pred``) — the daily-increment pattern at 100 TB,
    where re-pairing the whole corpus per batch is a non-starter.  The band
    join probes the full banded index with only the new docs' bands, so
    per-batch work is O(|new| · bands), not O(|corpus|); old↔old pairs are
    never generated.  Result is EXACTLY the full pair set restricted to
    pairs touching a new doc (the oracle states it that way over the full
    join — an independent formulation, not a restatement).

    Same banding/agreement machinery as :func:`gen_minhash_pairs`;
    ``least``/``greatest`` + DISTINCT canonicalize new↔new pairs that meet
    in both probe directions.
    """
    ctes: list[str] = []
    if sigs_rel is None:
        ctes.append(f"sigs AS (\n{gen_minhash_sigs(d)}\n)")
        sigs_rel = "sigs"
    ctes.append(f"bands AS (\n{gen_minhash_bands(d, sigs_rel)}\n)")
    ctes.append(f"bands_new AS (SELECT * FROM bands WHERE {new_pred})")
    ctes.append(
        """cand AS (
  SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a, greatest(x.doc_id, y.doc_id) AS doc_b
  FROM bands_new x JOIN bands y
    ON x.band_id = y.band_id AND x.band_key = y.band_key AND x.doc_id <> y.doc_id
)"""
    )
    agree = " + ".join(f"(CASE WHEN sa.m{k} = sb.m{k} THEN 1 ELSE 0 END)" for k in range(16))
    with_clause = "WITH " + ",\n".join(ctes)
    return f"""{with_clause}
SELECT doc_a, doc_b, est_jaccard FROM (
  SELECT c.doc_a, c.doc_b,
         round(CAST({agree} AS DOUBLE) / 16, 6) AS est_jaccard
  FROM cand c
  JOIN {sigs_rel} sa ON sa.doc_id = c.doc_a
  JOIN {sigs_rel} sb ON sb.doc_id = c.doc_b
) p
WHERE est_jaccard >= {min_agreement}
""".strip()


def gen_lsh_quality(
    d: Dialect,
    jaccard_threshold: float = 0.5,
    ranked_rel: str | None = None,
    sigs_rel: str | None = None,
    prefix_col: str | None = None,
    pairs_rel: str | None = None,
) -> str:
    """Precision/recall of the minhash-LSH candidate tier against exact
    blocked Jaccard at ``jaccard_threshold`` — the dedup sketch's accuracy
    measured as a driver-checked query.

    true  = exact pairs with J >= threshold (gen_jaccard_pairs)
    found = LSH candidate pairs (gen_minhash_pairs, any agreement)
    Reports |true|, |found|, |true ∩ found|, recall (found/true) and
    precision-proxy (hits/found).  Pair ids are (least, greatest) in both
    generators, so the intersection is a plain equi-join.  The ratio
    divisors are NULLIF-guarded: a corpus with no true (or no candidate)
    pairs reports NULL recall/precision instead of throwing on Spark
    (ANSI DIVIDE_BY_ZERO) while DuckDB silently NULLs — the engines must
    agree on the degenerate corpus too.

    ``ranked_rel``/``sigs_rel`` (r14 optimization) let the Spark builder
    substitute persisted prep relations exactly as the standalone pair
    entries do — the raw inline form re-tokenizes/re-hashes per CTE
    reference under Spark's CTE inlining; ``pairs_rel`` goes further and
    substitutes the whole truth-side pair relation (the builder supplies
    :func:`fastpath.jaccard_pairs_blocked` at this ``jaccard_threshold``).
    The oracle leaves all of them None."""
    if pairs_rel is not None and d.name != "spark":
        raise ValueError("pairs_rel is a Spark engine-path device")
    exact = (
        f"SELECT doc_a, doc_b, jaccard FROM {pairs_rel}"
        if pairs_rel is not None
        else gen_jaccard_pairs(
            d, threshold=jaccard_threshold, ranked_rel=ranked_rel, prefix_col=prefix_col
        )
    )
    lsh = gen_minhash_pairs(d, sigs_rel=sigs_rel)
    return f"""
WITH truth AS (
{exact}
),
found AS (
{lsh}
),
hits AS (SELECT truth.doc_a, truth.doc_b
         FROM truth JOIN found ON truth.doc_a = found.doc_a AND truth.doc_b = found.doc_b)
SELECT (SELECT count(*) FROM truth) AS n_true,
       (SELECT count(*) FROM found) AS n_found,
       (SELECT count(*) FROM hits) AS n_hits,
       {d.trunc6("CAST((SELECT count(*) FROM hits) AS DOUBLE) / NULLIF((SELECT count(*) FROM truth), 0)")} AS recall,
       {d.trunc6("CAST((SELECT count(*) FROM hits) AS DOUBLE) / NULLIF((SELECT count(*) FROM found), 0)")} AS precision_proxy
""".strip()


def gen_dedup_paragraphs(d: Dialect, block_tokens: int = 8, src: str = "documents") -> str:
    """C4-style paragraph-level dedup WITH document reassembly: drop every
    repeated paragraph except its first global occurrence, then rebuild
    each document from its surviving paragraphs in order (C4 / Raffel et
    al. 2020 dedupe three-sentence spans the same way; reference parity:
    the storage-crawler surface has no text plane — this is the
    training-data tier built on the same engine).

    Paragraph = non-overlapping ``block_tokens``-token block.  That is the
    segmentation FALLBACK for unstructured text (the synthetic corpus has
    no newlines); real corpora pass natural ``\\n\\n`` splits through the
    identical plan — only the ``paras`` CTE changes.  Unlike
    :func:`gen_substring_spans` (which *reports* duplicated spans), this
    operator *rewrites* the corpus: the output is the cleaned document.

    First-occurrence-wins is a ``row_number`` over (paragraph md5) ordered
    by (doc_id, para_no) — deterministic, and the window partitions on the
    paragraph hash so state per group is the duplicate multiplicity (tiny);
    the hot-key case is boilerplate repeated millions of times, which this
    window handles as one partition's sort — bounded by the duplicate
    count, not the corpus.  Reassembly is one ordered array agg per doc.
    Three shuffles total (paragraph-hash window, per-doc counts, per-doc
    reassembly join); the paragraph explode itself is map-side lateral.

    Output per input document (text IS NOT NULL): n_paras, n_kept
    (0 if every paragraph was someone else's), clean_len, clean_md5 (md5
    of the reassembled text; NULL when nothing survives).  The md5
    projection keeps raw rebuilt text out of the comparator while still
    pinning its exact bytes.
    """
    n_blocks = f"CAST(ceil({d.size('toks')} / {block_tokens}.0) AS BIGINT)"
    block = d.aslice("toks", f"(p - 1) * {block_tokens} + 1", str(block_tokens))
    rebuilt = d.ajoin(d.agg_arr_by("para_no", "para"))
    return f"""
WITH paras AS (
  SELECT doc_id, p AS para_no, {d.ajoin('block')} AS para
  FROM (
    SELECT doc_id, {block} AS block, p
    FROM (SELECT doc_id, {d.split('text')} AS toks FROM {src} WHERE text IS NOT NULL) t0
    {d.lateral_seq('1', n_blocks, 'p')}
  ) t1
),
ranked AS (
  SELECT doc_id, para_no, para,
         row_number() OVER (PARTITION BY {d.md5_utf8('para')}
                            ORDER BY doc_id, para_no) AS rn
  FROM paras
),
totals AS (
  SELECT doc_id, count(*) AS n_paras FROM paras GROUP BY doc_id
),
kept AS (
  SELECT doc_id, count(*) AS n_kept,
         CAST(length({rebuilt}) AS BIGINT) AS clean_len,
         {d.md5_utf8(rebuilt)} AS clean_md5
  FROM ranked WHERE rn = 1 GROUP BY doc_id
)
SELECT t.doc_id, t.n_paras,
       coalesce(k.n_kept, CAST(0 AS BIGINT)) AS n_kept,
       coalesce(k.clean_len, CAST(0 AS BIGINT)) AS clean_len,
       k.clean_md5
FROM totals t LEFT JOIN kept k ON t.doc_id = k.doc_id
""".strip()


def gen_containment_pairs(
    d: Dialect,
    threshold_pct: int = 80,
    sh_rel: str | None = None,
    prep_rel: str | None = None,
    src: str = "documents",
) -> str:
    """Asymmetric containment near-dup pairs over 3-token shingle sets via
    df-ordered prefix filtering (the AllPairs/PPJoin candidate scheme
    re-expressed relationally).  Containment C = |A∩B| / min(|A|,|B|)
    catches the pair symmetric Jaccard structurally cannot: a document
    quoted wholesale inside a much larger one (J = |A|/|B| → 0 while
    C = 1).  Length-window blocking is equally useless for that shape —
    the prefix filter replaces it.  Shingles, not unigram tokens, are the
    set elements: token sets over a small vocabulary saturate (every doc
    contains every frequent word), while the 3-gram space keeps set
    containment a sequence-ish, meaningful signal — the same reason
    minhash shingles first.

    Candidate generation is EXACT (full recall at the threshold), from the
    prefix-filter theorem: order each doc's distinct shingles by ascending
    document frequency (ties by shingle), keep the first ⌊(1−θ)·n⌋+1 as
    its *prefix*; if C(S,L) ≥ θ with |S| ≤ |L|, S misses at most
    (1−θ)|S| of L, so at least one prefix shingle — in ANY fixed global
    order — lands in L.  Candidates = prefix(X) ⋈ full shingle stream on
    shingle; exact set intersection verifies.  Because recall is exact,
    the OUTPUT is independent of the chosen order: the two engines need
    not even agree on df ties for the result to match.

    The df-ascending order is the load-bearing optimization: prefix
    shingles are each doc's RAREST, so the candidate join fans out by
    df(shingle) of rare shingles only — boilerplate/hot shingles appear
    solely on the (never-probed) index side.  100 TB shape: shingle
    explode (map) → df aggregate (partial-combining) → per-doc prefix-rank
    window (one shuffle on doc_id) → equi-join on rare shingle keys →
    DISTINCT pair dedup → two doc_id-keyed hash joins onto the hashed
    shingle arrays for exact verification.  No all-pairs product at any
    stage.

    ``sh_rel``/``prep_rel`` let the Spark builder persist the exploded
    shingle relation and the per-doc hashed-shingle prep once (Spark
    inlines CTEs); the oracle inlines both.
    """
    theta = threshold_pct / 100.0
    parts = []
    if sh_rel:
        sh = sh_rel
    else:
        sh = "sh"
        lat = d.lateral_explode("shingles", "shingle")
        parts.append(
            f"""sh AS (
SELECT doc_id, shingle
FROM (
  SELECT doc_id, {d.adistinct(_shingles(d))} AS shingles
  FROM (SELECT doc_id, text, {d.split("text")} AS toks FROM {src}) s0
) s1
{lat}
)"""
        )
    if prep_rel:
        pr = prep_rel
    else:
        pr = "pr"
        hs = d.transform(d.adistinct(_shingles(d)), "s", d.token_hash64("s"))
        parts.append(
            f"""pr AS (
SELECT doc_id, {hs} AS hs, {d.size(hs)} AS n_sh
FROM (SELECT doc_id, text, {d.split("text")} AS toks FROM {src}) p0
)"""
        )
    inter = d.size(d.aintersect("a.hs", "b.hs"))
    prefix_len = d.idiv(f"(100 - {threshold_pct}) * n_sh", "100")
    parts.append(
        f"""df AS (SELECT shingle, count(*) AS df FROM {sh} GROUP BY shingle),
sz AS (SELECT doc_id, count(*) AS n_sh FROM {sh} GROUP BY doc_id),
pref AS (
  SELECT doc_id, shingle FROM (
    SELECT {sh}.doc_id, {sh}.shingle, sz.n_sh,
           row_number() OVER (PARTITION BY {sh}.doc_id
                              ORDER BY df.df, {sh}.shingle) AS pos
    FROM {sh}
    JOIN df ON {sh}.shingle = df.shingle
    JOIN sz ON {sh}.doc_id = sz.doc_id
  ) o
  WHERE pos <= {prefix_len} + 1
),
cand AS (
  SELECT DISTINCT least(p.doc_id, {sh}.doc_id) AS doc_a,
                  greatest(p.doc_id, {sh}.doc_id) AS doc_b
  FROM pref p
  JOIN {sh} ON p.shingle = {sh}.shingle AND p.doc_id <> {sh}.doc_id
)"""
    )
    with_clause = "WITH " + ",\n".join(parts)
    # Exact-integer threshold on the hoisted intersection (the jaccard-
    # pairs discipline, r12): trunc6(i/least) >= θ ⟺ 1e6·i >= 10000·pct·
    # least(an, bn) for the integer-percent knob, so the filter evaluates
    # the intersection ONCE per candidate pair (CollapseProject re-inlines
    # computed columns into consumers; the trunc6'd-DOUBLE filter form
    # ran it 3-6x) and the display scores compute only for survivors.
    # Display scores from the SAME integer quantities as the filter
    # (r12 ADVICE, same rationale as gen_jaccard_pairs): exact integer
    # floor-division so filter and displayed score agree at threshold
    # boundaries; BIGINT i so 1e6*i cannot wrap.
    con6 = f"CAST({d.idiv('1000000 * i', 'least(an, bn)')} AS DOUBLE) / 1000000"
    jac6 = f"CAST({d.idiv('1000000 * i', '(an + bn - i)')} AS DOUBLE) / 1000000"
    return f"""{with_clause}
SELECT doc_a, doc_b,
       {con6} AS containment,
       {jac6} AS jaccard
FROM (
  SELECT c.doc_a, c.doc_b, CAST({inter} AS BIGINT) AS i, a.n_sh AS an, b.n_sh AS bn
  FROM cand c
  JOIN {pr} a ON c.doc_a = a.doc_id
  JOIN {pr} b ON c.doc_b = b.doc_id
) v0
WHERE 1000000 * i >= {10000 * threshold_pct} * least(an, bn)
""".strip()


def gen_dedup_normalized(d: Dialect) -> str:
    """Normalization-aware exact dedup, reported AGAINST raw exact dedup:
    per language, how many extra duplicate docs casefolding +
    whitespace-collapse exposes that byte-exact fingerprints miss — the
    standard first escalation when exact dedup under-fires on scraped
    text (trailing whitespace, case-variant mirrors).

    Both fingerprints compute in ONE scan (two md5s per row, map-only);
    the single aggregate groups by lang and counts docs minus distinct
    fingerprints of each kind.  No joins, one shuffle.
    """
    raw_fp = d.md5_utf8("text")
    norm = d.regex_replace_all("lower(trim(text))", "[ ]+", " ")
    norm_fp = d.md5_utf8(norm)
    return f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) - count(DISTINCT raw_fp) AS BIGINT) AS raw_dup_docs,
       CAST(count(*) - count(DISTINCT norm_fp) AS BIGINT) AS norm_dup_docs
FROM (
  SELECT lang, {raw_fp} AS raw_fp, {norm_fp} AS norm_fp
  FROM documents WHERE text IS NOT NULL
) t
GROUP BY lang
ORDER BY lang
""".strip()


def gen_threshold_histogram(
    d: Dialect,
    threshold: float = THRESHOLD_HISTOGRAM_FLOOR,
    bin_width_pct: int = 5,
    ranked_rel: str | None = None,
    pairs_rel: str | None = None,
) -> str:
    """Operating-characteristic histogram for the near-dup cutoff: blocked
    exact-Jaccard pairs (at a deliberately LOW floor) bucketed into
    similarity bins — the curve a corpus owner reads before choosing the
    production threshold (a cliff in the histogram = a safe cutoff; a
    smooth slope = the threshold is picking an arbitrary point of a
    continuum).

    Reuses the rank-blocked pair generator unchanged at ``threshold`` and
    adds ONE partial-combining aggregate on the (tiny) bin key — the pair
    relation's cost dominates and is already bounded O(n·cap).

    ``pairs_rel`` (r14 optimization, Spark engine path only) substitutes a
    pre-built (doc_a, doc_b, jaccard) pair relation — the builder supplies
    :func:`fastpath.jaccard_pairs_blocked` at this same ``threshold``; the
    oracle leaves it None and inlines the SQL pair generator.
    """
    if pairs_rel is not None and d.name != "spark":
        raise ValueError("pairs_rel is a Spark engine-path device")
    inner = (
        f"SELECT doc_a, doc_b, jaccard FROM {pairs_rel}"
        if pairs_rel is not None
        else gen_jaccard_pairs(d, threshold=threshold, ranked_rel=ranked_rel)
    )
    bin_id = d.idiv(f"CAST(floor(jaccard * 100) AS BIGINT)", str(bin_width_pct))
    lo = f"{bin_id} * {bin_width_pct}"
    return f"""
SELECT CAST({lo} AS BIGINT) AS bin_lo_pct,
       CAST(count(*) AS BIGINT) AS n_pairs,
       {d.trunc6('min(jaccard)')} AS min_j,
       {d.trunc6('max(jaccard)')} AS max_j
FROM (
{inner}
) pairs
GROUP BY {bin_id}
ORDER BY bin_lo_pct
""".strip()


def gen_winnow_fk(
    d: Dialect,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    df_cap: int = WINNOW_DF_CAP,
    winnow_rel: str | None = None,
    rows_rel: str | None = None,
) -> str:
    """Standalone (doc_id, fp) df-capped fingerprint relation — the shared
    input of the winnow pair join and both per-doc size aggregates.  Split
    out (r12) so the Spark builder can CHECKPOINT it once: the final query
    references it three times (pair join a/b sides + sizes) and under CTE
    inlining each reference re-ran the explode and the df groupBy — the
    measured majority of dedup_winnow_pairs' tier-2 CPU (the r11 verdict's
    md5-hashing hypothesis was measured and REJECTED: a portable
    polynomial-hash rewrite of the k-gram stage was SLOWER — higher-order-
    function interpretation dominates the lambda body — while this
    reference-dedup recovers the triple recompute)."""
    from storage_crawler_spark.operators.text import winnow_fps_cte

    if rows_rel is not None:
        # r14 optimization: the Spark builder supplies PRE-EXPLODED
        # (doc_id, fp) rows (fastpath.winnow_fp_rows) — no array column,
        # so no cached array cells are ever re-boxed — and the df cap is
        # a window count over ONE exchange of the rows instead of the
        # groupBy+join form (which shuffled the rows twice and paid the
        # join probe).  Identical rows: count(*) OVER (PARTITION BY fp)
        # <= cap keeps exactly the rows whose fp survives the HAVING
        # (parity-pinned; the oracle path below keeps the join form).
        return f"""
SELECT doc_id, fp FROM (
  SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df
  FROM {rows_rel}
) t
WHERE df <= {df_cap}
""".strip()
    lat = d.lateral_explode("fps", "fp")
    if winnow_rel is not None:
        winnow = f"winnow AS (SELECT * FROM {winnow_rel})"
    else:
        winnow = winnow_fps_cte(d, k, w)
    return f"""
WITH {winnow},
fp_rel AS (
  SELECT doc_id, fp
  FROM winnow
  {lat}
),
kept AS (
  SELECT fp FROM fp_rel GROUP BY fp HAVING count(*) <= {df_cap}
)
SELECT f.doc_id, f.fp FROM fp_rel f JOIN kept ON f.fp = kept.fp
""".strip()


def gen_winnow_pairs(
    d: Dialect,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = WINNOW_MIN_SHARED,
    df_cap: int = WINNOW_DF_CAP,
    winnow_rel: str | None = None,
    fk_rel: str | None = None,
    pair_partials_rel: str | None = None,
) -> str:
    """Near-duplicate CANDIDATE pairs from winnowed fingerprints: documents
    sharing >= ``min_shared`` selected k-gram fingerprints, with the shared
    count and each side's fingerprint count (enough for a downstream
    containment/overlap score — shared over min side-count, both measured
    in the df-capped fingerprint space so numerator and denominator agree).
    The winnowing guarantee makes this the
    scalable substring-overlap prefilter: any common substring of length
    >= k + w - 1 forces a shared fingerprint, so recall on long overlaps is
    structural, not probabilistic.

    100 TB shape: pair generation is a fingerprint-keyed equi-join, bounded
    by the ``df_cap`` document-frequency filter (a fingerprint present in
    more than df_cap docs is corpus boilerplate, useless as a dedup signal,
    and quadratic in the join — the same cap discipline as the Jaccard
    blocker).  No CartesianProduct anywhere: explode -> df filter ->
    self-equi-join -> pair aggregate, all partial-combining.

    ``winnow_rel`` points the query at a pre-materialized winnow relation
    (the Spark builder persists it — the md5-per-position hashing runs
    once and the relation feeds the explode); ``fk_rel`` points it at a
    pre-materialized df-capped fingerprint relation (:func:`gen_winnow_fk`
    — referenced THREE times below, so the Spark builder checkpoints it;
    r12, the measured tier-2 CPU recovery).  The oracle path leaves both
    None and inlines the CTEs (DuckDB materializes multiply-referenced
    CTEs itself).

    CONTRACT when ``fk_rel`` is supplied: ``k``/``w``/``df_cap`` are baked
    into the pre-built relation (:func:`gen_winnow_fk` took them), so this
    function IGNORES its own copies of those parameters — passing
    non-default values alongside ``fk_rel`` would silently yield pairs for
    a different configuration, so it is rejected (r12 ADVICE).

    (An r14 experiment replaced the fp-keyed pair SELF-join with per-fp
    grouped Arrow pair generation; it cut JVM CPU but tripled wall from
    per-group pandas overhead — measured and REVERTED, the self-join over
    the checkpointed df-capped relation stays.  See OPTIMIZATION_r14.md.)
    """
    from storage_crawler_spark.operators.text import winnow_fps_cte

    lat = d.lateral_explode("fps", "fp")
    if pair_partials_rel is not None:
        # r15 Spark-engine path: the pair candidates come pre-generated
        # (and same-chunk pre-combined) by fastpath.winnow_pair_partials
        # over the SAME fk relation — sum(cnt) over chunks == count(*)
        # over the fp-keyed self-join (exactness argument at the fastpath
        # site; parity-pinned).  The oracle dialect never takes this path.
        if d.name != "spark":
            raise ValueError(
                "gen_winnow_pairs: pair_partials_rel is a Spark ENGINE "
                "path; the oracle keeps the self-join formulation"
            )
        if fk_rel is None:
            raise ValueError(
                "gen_winnow_pairs: pair_partials_rel requires fk_rel "
                "(sizes must count the same df-capped relation)"
            )
    if fk_rel is not None:
        if (k, w, df_cap) != (WINNOW_K, WINNOW_W, WINNOW_DF_CAP):
            raise ValueError(
                "gen_winnow_pairs: k/w/df_cap are baked into fk_rel at its "
                "build (gen_winnow_fk); pass them there, not here"
            )
        prelude = f"WITH fk AS (SELECT doc_id, fp FROM {fk_rel}),"
    else:
        if winnow_rel is not None:
            winnow = f"winnow AS (SELECT * FROM {winnow_rel})"
        else:
            winnow = winnow_fps_cte(d, k, w)
        prelude = f"""WITH {winnow},
fp_rel AS (
  SELECT doc_id, fp
  FROM winnow
  {lat}
),
kept AS (
  SELECT fp FROM fp_rel GROUP BY fp HAVING count(*) <= {df_cap}
),
fk AS (
  SELECT f.doc_id, f.fp FROM fp_rel f JOIN kept ON f.fp = kept.fp
),"""
    if pair_partials_rel is not None:
        pairs = f"""pairs AS (
  SELECT doc_a, doc_b, CAST(sum(cnt) AS BIGINT) AS shared_fps
  FROM {pair_partials_rel}
  GROUP BY doc_a, doc_b
  HAVING sum(cnt) >= {min_shared}
)"""
    else:
        pairs = f"""pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS shared_fps
  FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= {min_shared}
)"""
    return f"""
{prelude}
{pairs},
sizes AS (
  -- counts over the df-FILTERED relation, matching the numerator's
  -- fingerprint space: counting ALL fingerprints here would deflate the
  -- score for boilerplate-heavy docs (r7 ADVICE).  Docs with zero kept
  -- fps can't appear in pairs, so the inner join loses nothing.
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps FROM fk GROUP BY doc_id
)
SELECT p.doc_a, p.doc_b, p.shared_fps,
       sa.n_fps AS fps_a, sb.n_fps AS fps_b,
       {d.trunc6('CAST(p.shared_fps AS DOUBLE) / CAST(least(sa.n_fps, sb.n_fps) AS DOUBLE)')} AS containment
FROM pairs p
JOIN sizes sa ON p.doc_a = sa.doc_id
JOIN sizes sb ON p.doc_b = sb.doc_id
ORDER BY p.shared_fps DESC, p.doc_a, p.doc_b
""".strip()
