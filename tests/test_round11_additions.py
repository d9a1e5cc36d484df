"""Round-11 fixtures: regressions for the r10 ADVICE items (utm literal
prefix, attribution fragment composition, fsmeta fixture-path constant,
funnel epoch-0 sentinel) plus the planted fixtures for the FIXED
ingest_sitemap_coverage entry (the r10 CTE-inlining breakage)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from storage_crawler_spark.plans.dialect import DUCK, SPARK


def _duck(sql: str, **views: pd.DataFrame):
    con = duckdb.connect()
    for name, df in views.items():
        con.register(name, df)
    return con.execute(sql).fetch_arrow_table().to_pydict()


def _url_docs() -> pd.DataFrame:
    # same planted corpus as the r10 URL fixtures: ids chosen so the
    # synthesized variants cover every canonicalization edge and ids
    # {0,3} / {1,2} collide after canonicalization
    ids = [0, 1, 2, 3, 20, 23]
    return pd.DataFrame(
        {
            "doc_id": pd.array(ids, dtype="int64"),
            "text": ["w"] * len(ids),
            "lang": ["en"] * len(ids),
            "source": ["alpha", "alpha", "alpha", "alpha", "src0", "src0"],
            "n_chars": [1] * len(ids),
        }
    )


# ---------------------------------------------------------------------------
# ingest_sitemap_coverage (fixed r11): planted declared-vs-fetched coverage.
# The corpus fetches exactly ONE page group per (domain, lang) section, so
# the declared grid (GROUPS=12 groups per section) is 1/12 covered — the
# missing-group accounting is hand-derivable.
# ---------------------------------------------------------------------------


def test_sitemap_coverage_planted_single_section():
    from storage_crawler_spark.operators import urls

    got = _duck(urls.gen_sitemap_coverage(DUCK), documents=_url_docs())
    rows = {
        d: (dec, f, m, c)
        for d, dec, f, m, c in zip(
            got["domain"], got["n_declared"], got["n_fetched"],
            got["n_missing"], got["coverage"],
        )
    }
    # alpha fetched only group 0 of section (alpha, en); src0 only group 1
    assert rows == {
        "alpha.example.com": (12, 1, 11, 0.083333),
        "src0.example.com": (12, 1, 11, 0.083333),
    }


def test_sitemap_coverage_planted_multi_lang_grid():
    from storage_crawler_spark.operators import urls

    docs = _url_docs()
    # a second language on alpha adds a whole SECTION (12 more declared
    # groups), not just one URL — the grid is per (domain, lang)
    docs.loc[docs.doc_id == 3, "lang"] = "zh"
    got = _duck(urls.gen_sitemap_coverage(DUCK), documents=docs)
    rows = dict(zip(got["domain"], zip(got["n_declared"], got["n_fetched"])))
    assert rows["alpha.example.com"] == (24, 2)   # (en,0) and (zh,0) fetched
    assert rows["src0.example.com"] == (12, 1)


def test_sitemap_coverage_spark_builder_checkpoints(spark, tmp_path):
    """The r10 breakage was plan-time (broadcast OOM at 500 rows through
    the inlined canonicalization chain); the fixed builder must run the
    checkpointed path and agree with the DuckDB oracle on the planted
    corpus."""
    from storage_crawler_spark.plans import registry

    sf = str(tmp_path / "smapdocs")
    os.makedirs(sf, exist_ok=True)
    _url_docs().to_parquet(f"{sf}/documents.parquet", index=False)
    spec = registry.get_query("ingest_sitemap_coverage")
    got = sorted(tuple(r) for r in spec.builder(spark, sf).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert got == want and len(got) == 2


# ---------------------------------------------------------------------------
# ADVICE r10 (urls.py): utm strip must match the LITERAL prefix 'utm_' —
# LIKE's `_` is a single-char wildcard, so the old form also dropped
# utmX=... params.
# ---------------------------------------------------------------------------


def test_kept_params_literal_utm_prefix_duck():
    from storage_crawler_spark.operators.urls import kept_params_expr

    expr = kept_params_expr(DUCK, "q")
    got = _duck(
        f"SELECT {expr} AS kept FROM (VALUES "
        "('utmx=1&utm_source=feed&page=2'), "   # utmx survives, utm_source dies
        "('utm1=a&utm_medium=rss'), "           # utm1 survives
        "('utm_campaign=x'), "                  # all dropped
        "('a=1&b=2')) t(q)",
    )
    # DuckDB's array_to_string renders the all-dropped list as NULL (Spark
    # as ''); gen_url_rel's `kept <> ''` guard treats both as no-query
    assert got["kept"] == ["utmx=1&page=2", "utm1=a", None, "a=1&b=2"]


def test_kept_params_literal_utm_prefix_spark(spark):
    from storage_crawler_spark.operators.urls import kept_params_expr

    expr = kept_params_expr(SPARK, "q")
    got = [
        r["kept"]
        for r in spark.sql(
            f"SELECT {expr} AS kept FROM (VALUES "
            "('utmx=1&utm_source=feed&page=2'), ('utm1=a&utm_medium=rss'), "
            "('utm_campaign=x'), ('a=1&b=2')) t(q)"
        ).collect()
    ]
    assert got == ["utmx=1&page=2", "utm1=a", "", "a=1&b=2"]


# ---------------------------------------------------------------------------
# ADVICE r10 (analytics.py): gen_attribution_credit composes the pairs CTE
# from exposed fragments, never by string-splitting assembled SQL.
# ---------------------------------------------------------------------------


def test_attribution_fragments_compose_exactly():
    from storage_crawler_spark.operators import analytics as A

    ctes, select = A.attribution_pair_fragments(DUCK)
    # the standalone pairs SQL is exactly WITH <ctes> <select> — one source
    assert A.gen_attribution_pairs(DUCK) == f"WITH {ctes}\n{select}"
    # and the composed credit SQL parses + runs in DuckDB (empty input)
    empty = pd.DataFrame(
        {
            "event_id": pd.array([], dtype="int64"),
            "ts": pd.array([], dtype="datetime64[us]"),
            "user_id": pd.array([], dtype="Int64"),
            "event_type": pd.array([], dtype=object),
            "value": pd.array([], dtype="float64"),
            "props": pd.array([], dtype=object),
        }
    )
    got = _duck(A.gen_attribution_credit(DUCK), events=empty)
    assert got["channel"] == []


# ---------------------------------------------------------------------------
# ADVICE r10 (registry.py): fsmeta fixture path is single-sourced and
# env-overridable; builder and oracle must both read it.
# ---------------------------------------------------------------------------


def test_fsmeta_fixture_dir_single_sourced():
    from storage_crawler_spark.plans import registry

    spec = registry.get_query("fsmeta_scan")
    assert registry._FSMETA_FIXTURE_DIR in spec.oracle
    # no other literal testdata path may hide in the oracle
    assert spec.oracle.count("read_blob") == 1


# ---------------------------------------------------------------------------
# Streaming URL dedup (r11): the canonical-URL key set emitted by the
# stream must equal the batch DISTINCT — on the planted corpus the three
# canonicalization collision groups collapse to exactly three curls.
# ---------------------------------------------------------------------------


def test_streaming_url_dedup_planted_key_set(spark, tmp_path):
    from storage_crawler_spark.plans import registry

    sf = str(tmp_path / "surldocs")
    os.makedirs(sf, exist_ok=True)
    _url_docs().to_parquet(f"{sf}/documents.parquet", index=False)
    spec = registry.get_query("streaming_url_dedup")
    got = sorted(r["curl"] for r in spec.builder(spark, sf).collect())
    assert got == [
        "https://alpha.example.com/docs/en/0",
        "https://alpha.example.com/docs/en/0?page=2",
        "https://src0.example.com/docs/en/1",
    ]


# ---------------------------------------------------------------------------
# Vacuum plan (r11 rework): the orphan set comes from a real manifest
# ANTI-JOIN on path, not an inline modulus predicate — a custom manifest
# must change the orphan set.
# ---------------------------------------------------------------------------


def _vacuum_docs():
    return pd.DataFrame(
        {
            "doc_id": pd.array([0, 7, 14, 21, 3], dtype="int64"),
            "text": ["w"] * 5,
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": [10, 20, 30, 40, 50],
        }
    )


def test_vacuum_plan_consumes_the_manifest_relation():
    from storage_crawler_spark.plans import views as V
    from storage_crawler_spark.sources import lake

    # a manifest that references EVERY file -> zero orphans everywhere,
    # proving the orphan flag reads the manifest join, not id arithmetic
    sql = (
        "WITH files AS (" + V.FILES_WITH_EXT_SQL + "),\n"
        "full_manifest AS (SELECT path FROM files)\n"
        + lake.gen_vacuum_plan(DUCK, manifest_rel="full_manifest")
    )
    got = _duck(sql, documents=_vacuum_docs())
    assert sum(got["n_orphans"]) == 0 and sum(got["bytes_reclaimable"]) == 0
    # and the default manifest reproduces the id % 7 dereference set
    got2 = _duck(
        "WITH files AS (" + V.FILES_WITH_EXT_SQL + ")\n"
        + lake.gen_vacuum_plan(DUCK),
        documents=_vacuum_docs(),
    )
    assert sum(got2["n_orphans"]) == 4  # ids 0, 7, 14, 21


# ---------------------------------------------------------------------------
# Hard-link resolution report (r11): apparent vs real bytes per device —
# planted synthetic values, and the SAME rollup over a REAL crawl of a tree
# with actual os.link hard links.
# ---------------------------------------------------------------------------


def _hardlink_docs():
    # dense ids 0..19: dev = (id div 16) % 3 -> ids 0-15 dev 0, 16-19 dev 1;
    # within each 16-block ids with id % 16 < 4 share one inode
    return pd.DataFrame(
        {
            "doc_id": pd.array(range(20), dtype="int64"),
            "text": ["w"] * 20,
            "lang": ["en"] * 20,
            "source": ["s"] * 20,
            "n_chars": pd.array(range(1, 21), dtype="int64"),
        }
    )


def test_hardlink_usage_planted_devices():
    from storage_crawler_spark.plans import views as V
    from storage_crawler_spark.reports import usage

    got = _duck(
        V.with_files_cte(usage.gen_hardlink_usage(DUCK)),
        documents=_hardlink_docs(),
    )
    rows = {
        d: tuple(t)
        for d, *t in zip(
            got["st_dev"], got["n_paths"], got["n_inodes"], got["n_linked_paths"],
            got["n_linksets"], got["apparent_bytes"], got["real_bytes"],
        )
    }
    # dev 0: ids 0-15 -> 16 paths; ids 0-3 one inode + 12 self = 13 inodes.
    # sizes (id+1)*4096: linked set bytes 1+2+3+4 apparent, min=1 real;
    # apparent = sum(1..16)*4096, real = (1 + sum(5..16))*4096
    assert rows[0] == (
        16, 13, 4, 1, sum(range(1, 17)) * 4096, (1 + sum(range(5, 17))) * 4096,
    )
    # dev 1: ids 16-19 all in one link set (id % 16 in 0..3)
    assert rows[1] == (
        4, 1, 4, 1, sum(range(17, 21)) * 4096, 17 * 4096,
    )
    # conservation: overcount = apparent - real everywhere
    for a, r, o in zip(got["apparent_bytes"], got["real_bytes"], got["overcount_bytes"]):
        assert o == a - r


def test_hardlink_usage_real_crawl_with_links(spark, tmp_path):
    from storage_crawler_spark.config import CrawlConfig
    from storage_crawler_spark.crawl import crawl
    from storage_crawler_spark.reports.usage import hardlink_usage_df

    root = tmp_path / "tree"
    root.mkdir()
    (root / "a.txt").write_bytes(b"x" * 100)
    (root / "b.txt").write_bytes(b"y" * 50)
    os.link(root / "a.txt", root / "a_link.txt")  # second name, same inode
    res = crawl(spark, CrawlConfig(dirs=[str(root)]))
    out = hardlink_usage_df(res.files).collect()
    assert len(out) == 1  # one device
    r = out[0]
    # three paths, two inodes; the extra name double-counts 100 bytes
    assert (r.n_paths, r.n_inodes, r.n_linked_paths, r.n_linksets) == (3, 2, 2, 1)
    assert r.apparent_bytes == 250 and r.real_bytes == 150
    assert r.overcount_bytes == 100


# ---------------------------------------------------------------------------
# Graph-ANN two-hop probe (r11): a planted chain graph where the two-hop
# frontier is hand-derivable — hop labels, exact reranking, and the
# exact_rank audit column (misses surface as NULLs by construction).
# ---------------------------------------------------------------------------


def test_graph_2hop_planted_chain():
    import math

    from storage_crawler_spark.operators import cluster

    # unit vectors at increasing angles, one trained cell (cells_k=1, no
    # residual refinement — the hop semantics are what's under test): with
    # m=2, mutual-kNN forms the chain 0-1-2-3-4 and isolates 5
    # (4's top-2 are {3, 2}; nobody lists 5 back)
    angles = [0, 10, 20, 30, 40, 80]
    emb = pd.DataFrame(
        {
            "vec_id": pd.array(range(6), dtype="int64"),
            "embedding": [
                [math.cos(math.radians(a)), math.sin(math.radians(a))]
                for a in angles
            ],
            "label": pd.array([0] * 6, dtype="Int32"),
        }
    )
    got = _duck(
        cluster.gen_graph_2hop_topk(DUCK, 0, k=3, m=2, cells_k=1, res_bits=0),
        embeddings=emb,
    )
    # query 0: hop1 = {1}, hop2 = {2}; candidates rerank to [1, 2];
    # exact top-3 = [1, 2, 3] -> 3 is the structural two-hop miss
    assert got["vec_id"] == [1, 2]
    assert got["hop"] == [1, 2]
    assert got["exact_rank"] == [1, 2]
    # lattice cosines: floor(cos(10°)·1e6), floor(cos(20°)·1e6)
    assert got["simq"] == [
        math.floor(math.cos(math.radians(10)) * 1e6),
        math.floor(math.cos(math.radians(20)) * 1e6),
    ]


# ---------------------------------------------------------------------------
# ADVICE r10 (streaming/stateful.py): epoch 0 is a valid first-qualifying
# funnel time — the old 0 sentinel let a later view re-emit stage 1.
# ---------------------------------------------------------------------------


class _FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def test_funnel_epoch_zero_not_double_counted():
    from storage_crawler_spark.streaming.stateful import _funnel_fn_factory

    fn = _funnel_fn_factory(("view", "click", "purchase"), 86400)
    st = _FakeState()
    b1 = pd.DataFrame(
        {
            "user_id": [7, 7],
            "event_id": [0, 1],
            "event_type": ["view", "click"],
            "epoch_s": [0, 10],
        }
    )
    out1 = pd.concat(list(fn((7,), iter([b1]), st)))
    assert out1[["stage", "t"]].values.tolist() == [[1, 0], [2, 10]]
    assert st.get == (0, 10, -1)
    # a later view must NOT re-emit stage 1 (the 0-sentinel bug); a
    # purchase inside the lag still completes the funnel
    b2 = pd.DataFrame(
        {
            "user_id": [7, 7],
            "event_id": [2, 3],
            "event_type": ["view", "purchase"],
            "epoch_s": [100, 200],
        }
    )
    out2 = pd.concat(list(fn((7,), iter([b2]), st)))
    assert out2[["stage", "t"]].values.tolist() == [[3, 200]]
    assert st.get == (0, 10, 200)


# ---------------------------------------------------------------------------
# Binary quantization plane (r11): sign-bit packing into 32-bit words,
# per-label audit, Hamming top-k.  dim 34 forces the multi-word path
# (words = [bits 0-31, bits 32-33]); hamming values pin the packing.
# ---------------------------------------------------------------------------


def _binq_embeddings() -> pd.DataFrame:
    dim = 34
    ones = [1.0] * dim
    flip0 = [-1.0] + [1.0] * (dim - 1)
    return pd.DataFrame(
        {
            "vec_id": pd.array(range(6), dtype="int64"),
            "embedding": [
                ones,            # query: all bits set
                flip0,           # hamming 1 from query
                [-x for x in ones],  # antipode: all bits clear, hamming 34
                flip0,           # duplicate of vec 1: code collision
                [0.0] * dim,     # zero-norm: dropped by the nrm guard
                None,            # NULL embedding: dropped
            ],
            "label": pd.array([0, 1, 0, 1, 0, 1], dtype="Int32"),
        }
    )


def test_binary_quant_audit_planted():
    from storage_crawler_spark.operators import similarity

    got = _duck(similarity.gen_binary_quant_audit(DUCK), embeddings=_binq_embeddings())
    # label 0: vecs {0 all-ones, 2 all-zeros-code}; zero-norm vec 4 dropped.
    # densities 1.0 and 0.0; sign_cos = sum|x|/(sqrt(34)*sqrt(34)) = 1 both.
    # label 1: vecs {1, 3} identical -> ONE distinct code; density 33/34.
    assert got["label"] == [0, 1]
    assert got["n_vecs"] == [2, 2]
    assert got["n_codes"] == [2, 1]
    assert got["mean_bit_density"] == [0.5, 0.970588]
    assert got["mean_sign_cos"] == [1.0, 1.0]
    assert got["min_sign_cos"] == [1.0, 1.0]


def test_hamming_topk_planted():
    from storage_crawler_spark.operators import similarity

    got = _duck(similarity.gen_hamming_topk(DUCK, 0, k=3), embeddings=_binq_embeddings())
    # hamming ties (vecs 1 and 3 at distance 1) break by vec_id; the
    # antipode is the full-dim distance 34 with cosine -1; exact ranks are
    # cosine-desc with the same vec_id break
    assert got["vec_id"] == [1, 3, 2]
    assert got["hamming"] == [1, 1, 34]
    assert got["cosine"] == [0.941176, 0.941176, -1.0]
    assert got["exact_rank"] == [1, 2, 3]


def test_hamming_topk_spark_parity_planted(spark, tmp_path):
    """The multi-word packing path (dim 34 -> 2 words) cross-engine: the
    sf battery stores are 8/64-dim, so this planted frame is the only
    word-boundary-straddling case — run BOTH engines on it."""
    from storage_crawler_spark.operators import similarity

    emb = _binq_embeddings()
    path = str(tmp_path / "binq.parquet")
    emb.to_parquet(path, index=False)
    spark.read.parquet(path).createOrReplaceTempView("embeddings")
    try:
        for gen in (similarity.gen_binary_quant_audit,
                    lambda d: similarity.gen_hamming_topk(d, 0, k=3)):
            srows = sorted(tuple(r) for r in spark.sql(gen(SPARK)).collect())
            con = duckdb.connect()
            con.register("embeddings", emb)
            drows = sorted(tuple(r) for r in con.execute(gen(DUCK)).fetchall())
            assert srows == drows
    finally:
        spark.catalog.dropTempView("embeddings")


# ---------------------------------------------------------------------------
# lake_file_skipping (r11): planted zone-map audit.  21 rows, epochs at
# 50 s steps (span 1000), alternating two-value cents — time predicates
# prune to exactly one file, the mid-value predicate scans EVERY file and
# matches nothing (7 false positives: zone-map bluntness), the top-value
# predicate matches in every file (0 skip, honestly).
# ---------------------------------------------------------------------------


def _fskip_events() -> pd.DataFrame:
    base = 1_700_000_000
    rows = [
        (i + 1, base + 50 * i, 1, "view", 10.0 + 5.0 * (i % 2), None)
        for i in range(21)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
    return pdf


def test_file_skipping_planted():
    from storage_crawler_spark.sources import lake

    got = _duck(lake.gen_file_skipping(DUCK, n_files=7), events=_fskip_events())
    rows = list(zip(got["pred_id"], got["dim"], got["n_files"], got["files_scanned"],
                    got["files_matching"], got["false_positive_scans"],
                    got["rows_matched"], got["skip_ratio"]))
    # 7 files x 3 rows; file k holds epochs [150(k-1), 150(k-1)+100].
    # pred1 time [450,550]: exactly file 4; pred2 time [990,1000]: file 7.
    # cents alternate {1000, 1500}: pred3 value [1225,1275] overlaps every
    # file's [1000,1500] zone map but matches NO row; pred4 value
    # [1495,1500] hits the 10 odd rows spread over all 7 files.
    assert rows == [
        (1, "time", 7, 1, 1, 0, 3, 0.857142),
        (2, "time", 7, 1, 1, 0, 1, 0.857142),
        (3, "value", 7, 7, 0, 7, 0, 0.0),
        (4, "value", 7, 7, 7, 0, 10, 0.0),
    ]


def test_file_skipping_spark_builder_checkpoints(spark, tmp_path):
    """The registry builder must consume the CHECKPOINTED tiles relation
    (tile is a computed join column read by two chains) and agree with the
    oracle on the planted frame."""
    from storage_crawler_spark.plans.registry import QUERIES

    pdf = _fskip_events()
    sf = tmp_path / "sf"
    sf.mkdir()
    pdf.to_parquet(str(sf / "events.parquet"), index=False)
    df = QUERIES["lake_file_skipping"].builder(spark, str(sf))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    srows = sorted(tuple(r) for r in df.collect())
    # n_files=64 > 21 rows -> every row its own file, 43 empty tiles never
    # materialize; recompute the oracle at the SAME n_files for parity
    from storage_crawler_spark.sources import lake

    got = _duck(lake.gen_file_skipping(DUCK, n_files=64), events=pdf)
    drows = sorted(zip(got["pred_id"], got["dim"], got["n_files"],
                       got["files_scanned"], got["files_matching"],
                       got["false_positive_scans"], got["rows_matched"],
                       got["skip_ratio"]))
    assert srows == drows


# ---------------------------------------------------------------------------
# ingest_url_frontier (r11): politeness-slotted per-host schedule.
# ---------------------------------------------------------------------------


def test_url_frontier_planted_collapse():
    """Full canonicalization chain: alpha's 4 docs collapse to 2 canonical
    URLs (one slot of 2 at per_slot=2); src0's 2 docs to 1."""
    from storage_crawler_spark.operators import urls

    got = _duck(urls.gen_url_frontier(DUCK, per_slot=2), documents=_url_docs())
    rows = list(zip(got["domain"], got["slot"], got["n_urls"], got["first_curl"]))
    assert rows == [
        ("alpha.example.com", 0, 2, "https://alpha.example.com/docs/en/0"),
        ("src0.example.com", 0, 1, "https://src0.example.com/docs/en/1"),
    ]


def test_url_frontier_planted_depth_priority():
    """BFS-by-depth packing via the url_rel hook: shallow pages fill the
    early slots; the curl tie-break orders equal depths."""
    from storage_crawler_spark.operators import urls

    u = pd.DataFrame(
        {
            "domain": ["h.example.com"] * 5 + ["i.example.com"],
            "curl": [
                "https://h.example.com/z",       # depth 1 (but curl sorts last among depth-1)
                "https://h.example.com/a",       # depth 1
                "https://h.example.com/a/b",     # depth 2
                "https://h.example.com/a/a",     # depth 2
                "https://h.example.com/a/b/c",   # depth 3
                "https://i.example.com/only",
            ],
            "cpath": ["/z", "/a", "/a/b", "/a/a", "/a/b/c", "/only"],
        }
    )
    got = _duck(urls.gen_url_frontier(DUCK, per_slot=2, url_rel="myurls"), myurls=u)
    rows = list(zip(got["domain"], got["slot"], got["n_urls"],
                    got["min_depth"], got["max_depth"], got["first_curl"]))
    assert rows == [
        ("h.example.com", 0, 2, 1, 1, "https://h.example.com/a"),
        ("h.example.com", 1, 2, 2, 2, "https://h.example.com/a/a"),
        ("h.example.com", 2, 1, 3, 3, "https://h.example.com/a/b/c"),
        ("i.example.com", 0, 1, 1, 1, "https://i.example.com/only"),
    ]


# ---------------------------------------------------------------------------
# sketch_hll_distinct (r11): the deterministic HLL pinned against an
# independent Python replication of the md5 register derivation and the
# two-branch Flajolet estimator.
# ---------------------------------------------------------------------------


def _py_hll_estimate(user_ids, m=64, alpha=0.709):
    import hashlib
    import math

    regs = {}
    for uid in user_ids:
        h = int(hashlib.md5(f"hll{uid}".encode()).hexdigest()[:12], 16)
        bucket, rest = h % m, h >> 6
        rho = 43 - rest.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    harm = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    raw = alpha * m * m / harm
    v = m - len(regs)
    est = m * math.log(m / v) if (v > 0 and raw <= 2.5 * m) else raw
    return len(regs), math.floor(est * 1e6) / 1e6


def test_hll_distinct_planted_python_replication():
    from storage_crawler_spark.operators import sketches

    ev = pd.DataFrame(
        {
            "event_id": pd.array(range(40), dtype="int64"),
            "ts": pd.to_datetime([1_700_000_000 + i for i in range(40)], unit="s"),
            # type A sees users 0..19 (each twice -> duplicates must not
            # move registers), type B sees users 100..104; one NULL user
            "user_id": pd.array(
                [i % 20 for i in range(30)] + [100 + i for i in range(5)]
                + [None] + [7, 7, 7, 7],
                dtype="Int64",
            ),
            "event_type": ["A"] * 30 + ["B"] * 5 + ["A"] * 5,
            "value": [1.0] * 40,
            "props": [None] * 40,
        }
    )
    got = _duck(sketches.gen_hll_distinct(DUCK), events=ev)
    exp_a = _py_hll_estimate(range(20))   # duplicate arrivals don't move maxima
    exp_b = _py_hll_estimate(range(100, 105))
    assert got["event_type"] == ["A", "B"]
    assert list(zip(got["n_registers_hit"], got["distinct_est"])) == [exp_a, exp_b]


# ---------------------------------------------------------------------------
# sketch_dd_quantiles (r11): hand-derived integer log-lattice buckets.
# ---------------------------------------------------------------------------


def test_dd_quantiles_planted():
    from storage_crawler_spark.operators import sketches

    # type A cents: [-250, 0, 1, 3, 100, 700 x5] (n=10)
    #   p50 rank 5 -> 100  in octave-quartile [96, 111]
    #   p90 rank 9 -> 700  in [640, 767]; p99 rank 10 -> same bucket
    # type B cents: [-900, -100] (n=2): mirrored negative store —
    #   p50 rank 1 -> [-1023, -896]; p90/p99 rank 2 -> [-111, -96]
    vals_a = [-2.50, 0.0, 0.01, 0.03, 1.00, 7.00, 7.00, 7.00, 7.00, 7.00]
    vals_b = [-9.00, -1.00]
    n = len(vals_a) + len(vals_b)
    ev = pd.DataFrame(
        {
            "event_id": pd.array(range(n), dtype="int64"),
            "ts": pd.to_datetime([1_700_000_000 + i for i in range(n)], unit="s"),
            "user_id": pd.array([1] * n, dtype="Int64"),
            "event_type": ["A"] * len(vals_a) + ["B"] * len(vals_b),
            "value": vals_a + vals_b,
            "props": [None] * n,
        }
    )
    got = _duck(sketches.gen_dd_quantiles(DUCK), events=ev)
    rows = list(zip(got["event_type"], got["q_pm"], got["n_rows"], got["rnk"],
                    got["lo_cents"], got["hi_cents"]))
    assert rows == [
        ("A", 500, 10, 5, 96, 111),
        ("A", 900, 10, 9, 640, 767),
        ("A", 990, 10, 10, 640, 767),
        ("B", 500, 2, 1, -1023, -896),
        ("B", 900, 2, 2, -111, -96),
        ("B", 990, 2, 2, -111, -96),
    ]


def test_dd_interval_contains_exact_quantile():
    """Structural guarantee on the sf0.001 corpus: the emitted interval
    brackets the exact rank-ceil(q*n) order statistic, per type and q."""
    import duckdb as _dd

    from storage_crawler_spark.operators import sketches

    con = _dd.connect()
    con.sql("CREATE VIEW events AS SELECT * FROM "
            "'/root/testdata/sf0.001/events.parquet'")
    got = con.sql(sketches.gen_dd_quantiles(DUCK)).fetchall()
    assert got
    for et, q_pm, n, rnk, lo, hi in got:
        etq = "IS NULL" if et is None else f"= '{et}'"
        (exact,) = con.sql(
            f"SELECT CAST(CAST(coalesce(value,0) AS DECIMAL(18,2)) * 100 AS BIGINT) c "
            f"FROM events WHERE event_type {etq} ORDER BY c LIMIT 1 OFFSET {rnk - 1}"
        ).fetchone()
        assert lo <= exact <= hi, (et, q_pm, exact, lo, hi)


# ---------------------------------------------------------------------------
# multimodal_phash (r11): integer fixed-point DCT pinned against an
# independent Python replication.
# ---------------------------------------------------------------------------


def _py_phash(payload: bytes):
    import math

    C = [[round(4096 * math.cos(math.pi * (2 * x + 1) * u / 16)) for x in range(8)]
         for u in range(8)]
    p = payload[:64]
    coef = {}
    for u in range(8):
        for v in range(8):
            coef[(u, v)] = sum(
                p[8 * y + x] * C[u][x] * C[v][y] for x in range(8) for y in range(8)
            )
    ac = sorted(((f, u, v) for (u, v), f in coef.items() if (u, v) != (0, 0)))
    med = ac[31][0]  # rank-32 under the (f, u, v) total order
    phash = sum(1 << (u * 8 + v - 1) for (u, v), f in coef.items()
                if (u, v) != (0, 0) and f > med)
    nbits = sum(1 for (u, v), f in coef.items() if (u, v) != (0, 0) and f > med)
    return phash, nbits


def test_phash_planted_python_replication():
    from storage_crawler_spark.operators import multimodal

    flat = "a" * 64                       # uniform plane: every AC coeff 0
    halves = "a" * 32 + "z" * 32          # top/bottom split: pure-v structure
    ramp = "".join(chr(33 + i) for i in range(64))
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([0, 1, 2, 3], dtype="int64"),
            "text": [flat, halves, ramp, "short"],  # <64 bytes drops out
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [64, 64, 64, 5],
        }
    )
    got = _duck(multimodal.gen_phash(DUCK), documents=docs)
    assert got["doc_id"] == [0, 1, 2]     # the short payload is excluded
    exp = [_py_phash(t.encode()) for t in (flat, halves, ramp)]
    assert list(zip(got["phash"], got["n_bits_set"])) == exp
    # uniform plane: all AC coefficients are 0, nothing exceeds the median
    assert got["phash"][0] == 0 and got["n_bits_set"][0] == 0


# ---------------------------------------------------------------------------
# sketch_kmv_overlap (r11): KMV estimator pinned against an independent
# Python replication on partial-overlap sets; identical sets must read 1.0.
# ---------------------------------------------------------------------------


def _py_kmv(users_a, users_b, k=4):
    import hashlib
    import math

    def h(uid):
        return int(hashlib.md5(f"kmv{uid}".encode()).hexdigest()[:12], 16)

    ska = sorted(h(u) for u in set(users_a))[:k]
    skb = sorted(h(u) for u in set(users_b))[:k]
    union = sorted(set(ska) | set(skb))[:k]
    tau, ku = union[-1], len(union)
    matches = len({x for x in ska if x <= tau} & {x for x in skb if x <= tau})
    union_est = float(ku) if ku < k else (k - 1) * float(1 << 48) / tau
    jac = matches / ku
    t6 = lambda x: math.floor(x * 1e6) / 1e6
    return t6(jac), t6(jac * union_est)


def test_kmv_overlap_planted_python_replication():
    from storage_crawler_spark.operators import sketches

    # A: users 1..6, B: users 4..9 -> exact inter 3, union 9, jaccard 1/3
    rows = [("A", u) for u in range(1, 7)] + [("B", u) for u in range(4, 10)]
    n = len(rows)
    ev = pd.DataFrame(
        {
            "event_id": pd.array(range(n), dtype="int64"),
            "ts": pd.to_datetime([1_700_000_000 + i for i in range(n)], unit="s"),
            "user_id": pd.array([u for _, u in rows], dtype="Int64"),
            "event_type": [t for t, _ in rows],
            "value": [1.0] * n,
            "props": [None] * n,
        }
    )
    got = _duck(sketches.gen_kmv_overlap(DUCK, k=4), events=ev)
    assert got["type_a"] == ["A"] and got["type_b"] == ["B"]
    assert got["n_a"] == [6] and got["n_b"] == [6]
    assert got["exact_inter"] == [3]
    assert got["exact_jaccard"] == [0.333333]
    jac, inter = _py_kmv(range(1, 7), range(4, 10), k=4)
    assert got["kmv_jaccard_est"] == [jac]
    assert got["kmv_inter_est"] == [inter]


def test_kmv_identical_sets_estimate_unity():
    from storage_crawler_spark.operators import sketches

    rows = [(t, u) for t in ("A", "B") for u in range(200)]
    n = len(rows)
    ev = pd.DataFrame(
        {
            "event_id": pd.array(range(n), dtype="int64"),
            "ts": pd.to_datetime([1_700_000_000 + i for i in range(n)], unit="s"),
            "user_id": pd.array([u for _, u in rows], dtype="Int64"),
            "event_type": [t for t, _ in rows],
            "value": [1.0] * n,
            "props": [None] * n,
        }
    )
    got = _duck(sketches.gen_kmv_overlap(DUCK), events=ev)
    # identical 200-user sets, saturated k=64 sketches: the union synopsis
    # equals each side's, every union hash matches -> jaccard EXACTLY 1.0
    # (the double-counting bug this fixture pins read 0.5 here)
    assert got["kmv_jaccard_est"] == [1.0]
    assert got["exact_jaccard"] == [1.0]
