"""Round-10 fixtures: regressions for the r9 ADVICE items (semantic-dedup
NULL-label CASE semantics, gen_knn_edges default m alignment, semantic_dedup
self-registration) plus fixtures for the round-10 operators as they land."""

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


# ---------------------------------------------------------------------------
# ADVICE r9 (medium): semantic_dedup same_label must use CASE semantics —
# (label_a == label_b).cast('long') is NULL when either label is NULL, the
# oracle's CASE WHEN yields 0.  The embeddings schema allows NULL labels.
# ---------------------------------------------------------------------------

_NULL_LABEL_EMB = pd.DataFrame(
    {
        "vec_id": pd.array(range(6), dtype="int64"),
        "embedding": [
            [0.0, 0.0], [0.001, 0.0], [0.0, 0.001],  # dup group A (0,1,2)
            [5.0, 5.0], [5.001, 5.0],                  # dup group B (3,4)
            [-6.0, 7.0],                               # isolated (5)
        ],
        # NULL labels land INSIDE both duplicate groups, so within-threshold
        # pairs touch a NULL-labeled endpoint
        "label": pd.array([0, None, 0, None, 2, 3], dtype="Int32"),
    }
)


def test_semantic_dedup_null_labels_duck_oracle():
    from storage_crawler_spark.operators import kmeans as km

    got = _duck(
        km.gen_semantic_dedup(DUCK, k=3, iters=2, thr=100_000),
        embeddings=_NULL_LABEL_EMB,
    )
    by_pair = dict(zip(zip(got["keep_id"], got["drop_id"]), got["same_label"]))
    assert by_pair == {(0, 1): 0, (0, 2): 1, (1, 2): 0, (3, 4): 0}
    # the NULL-touching pairs are 0, never NULL
    assert all(v is not None for v in by_pair.values())


def test_semantic_dedup_null_labels_spark_matches_oracle_bitwise(spark, tmp_path):
    """Engine path vs oracle over a planted store with NULL labels inside
    both duplicate groups (current testdata has no NULL labels, so only a
    planted fixture exercises the CASE path)."""
    from storage_crawler_spark.operators import kmeans as km

    sf = str(tmp_path / "sfnull")
    os.makedirs(sf, exist_ok=True)
    _NULL_LABEL_EMB.to_parquet(f"{sf}/embeddings.parquet", index=False)

    got = [tuple(r) for r in km.semantic_dedup(spark, sf, k=3, iters=2, thr=100_000).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    want = [tuple(r) for r in con.execute(
        km.gen_semantic_dedup(DUCK, k=3, iters=2, thr=100_000)
    ).fetchall()]
    assert got == want and len(got) == 4
    assert all(r[4] is not None for r in got), "same_label must never be NULL"


def test_semantic_dedup_registers_its_own_base_table(spark, sf_dir):
    """ADVICE r9 (low): callable outside the registry builder — no
    pre-registered `embeddings` view required."""
    from storage_crawler_spark.operators import kmeans as km

    spark.catalog.dropTempView("embeddings") if any(
        t.name == "embeddings" for t in spark.catalog.listTables()
    ) else None
    df = km.semantic_dedup(spark, sf_dir)
    assert df.count() > 0


def test_knn_edges_default_m_matches_downstream():
    """ADVICE r9 (low): every caller uses m=8; the default must agree so a
    bare gen_knn_edges(d) builds the same graph as the registered entries."""
    import inspect

    from storage_crawler_spark.operators import cluster

    sig = inspect.signature(cluster.gen_knn_edges)
    assert sig.parameters["m"].default == 8
    assert cluster.gen_knn_edges(DUCK) == cluster.gen_knn_edges(DUCK, m=8)

# ---------------------------------------------------------------------------
# Cache-reachability audit (VERDICT r9 item 2 + the bug class it uncovered):
# Spark's cache replacement does not descend into WITH/CTE definitions, so a
# persist()'d view referenced from inside a downstream WITH silently
# recomputes per reference.  Builders with that shape must checkpoint
# (registry._checkpoint_view) instead; these guards pin the executed-plan
# evidence for the representative of each fixed family.
# ---------------------------------------------------------------------------


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_attribution_consumes_pairs_from_cache(spark, sf_dir):
    from storage_crawler_spark.plans.registry import QUERIES

    spark.catalog.clearCache()
    df = QUERIES["events_attribution_credit"].builder(spark, sf_dir)
    plan = _executed_plan(df)
    assert plan.count("InMemoryTableScan") >= 3, (
        "pairs/per_purchase must be read from cache, not re-joined per consumer"
    )
    spark.catalog.clearCache()


def test_kcore_consumes_peeled_relation_from_checkpoint(spark, sf_dir):
    from storage_crawler_spark.plans.registry import QUERIES

    spark.catalog.clearCache()
    df = QUERIES["sim_knn_kcore"].builder(spark, sf_dir)
    plan = _executed_plan(df)
    assert plan.count("Scan ExistingRDD") >= 2, (
        "the peeled edge set must be a checkpointed scan (WITH refs can't "
        "hit the cache), so the 6-round peel chain runs once, not twice"
    )
    spark.catalog.clearCache()


def test_bpe_enc1_checkpoint_reaches_both_epoch2_consumers(spark, sf_dir):
    from storage_crawler_spark.plans.registry import QUERIES

    spark.catalog.clearCache()
    df = QUERIES["text_bpe_encode"].builder(spark, sf_dir)
    plan = _executed_plan(df)
    assert plan.count("Scan ExistingRDD") >= 2
    spark.catalog.clearCache()


def test_cached_cte_view_inside_outer_with_is_not_replaced_probe(spark):
    """The behavioral probe the audit rests on, in its precise form: a
    cached relation whose OWN plan contains a WITH fails cache lookup when
    referenced from inside another WITH (CTE-id renumbering breaks the
    canonicalized match), while plain FROM/subquery references — and
    CTE-free cached plans — match everywhere.  If a Spark upgrade makes
    the last assertion fail, cache replacement reaches merged CTEs and the
    _checkpoint_view call sites can be downgraded to _persist_view."""
    cte_df = spark.sql(
        "WITH t AS (SELECT id, id * 3 AS y FROM range(8)) SELECT * FROM t"
    )
    cte_df.persist()
    cte_df.createOrReplaceTempView("_cte_cache_probe")
    flat_df = spark.range(8).selectExpr("id", "id * 2 AS y")
    flat_df.persist()
    flat_df.createOrReplaceTempView("_flat_cache_probe")
    try:
        hits = lambda sql: _executed_plan(spark.sql(sql)).count(  # noqa: E731
            "InMemoryTableScan"
        )
        assert hits("SELECT sum(y) FROM _flat_cache_probe") == 1
        assert hits("WITH x AS (SELECT y FROM _flat_cache_probe) SELECT sum(y) FROM x") == 1
        assert hits("SELECT sum(y) FROM _cte_cache_probe") == 1
        assert hits("SELECT sum(y) FROM (SELECT y FROM _cte_cache_probe) s") == 1
        assert hits("WITH x AS (SELECT y FROM _cte_cache_probe) SELECT sum(y) FROM x") == 0, (
            "cache replacement now reaches CTE-bearing plans under an outer "
            "WITH — _checkpoint_view call sites can revert to _persist_view"
        )
    finally:
        cte_df.unpersist()
        flat_df.unpersist()
        spark.catalog.dropTempView("_cte_cache_probe")
        spark.catalog.dropTempView("_flat_cache_probe")


# ---------------------------------------------------------------------------
# Deep-iteration guard (VERDICT r9 item 3): the unrolled peel chain must
# stay analyzable at production iteration depths — linear plan growth, no
# 3^k analysis blowup (the MMR OOM lesson).
# ---------------------------------------------------------------------------


def test_kcore_peel_chain_survives_depth_8(spark, sf_dir):
    import time

    from storage_crawler_spark.operators import cluster
    from storage_crawler_spark.plans import views as V

    V.register_base_tables(spark, sf_dir, ("embeddings",))
    t0 = time.time()
    df8 = spark.sql(cluster.gen_kcore_peeled(SPARK, rounds=8))
    _ = df8.schema  # forces full analysis of the unrolled chain
    analysis_s = time.time() - t0
    assert analysis_s < 60, f"rounds=8 peel analysis took {analysis_s:.1f}s"
    # growth must be ~linear in rounds: the 8-round optimized plan stays
    # within 4x the 4-round one (a doubling-per-round form would be ~16x)
    p4 = spark.sql(cluster.gen_kcore_peeled(SPARK, rounds=4))
    s8 = len(df8._jdf.queryExecution().optimizedPlan().toString())
    s4 = len(p4._jdf.queryExecution().optimizedPlan().toString())
    assert s8 < 4 * s4, f"plan size blew up: rounds=4 -> {s4}, rounds=8 -> {s8}"


def test_kcore_peel_depth_8_matches_duck_oracle(spark, sf_dir):
    from storage_crawler_spark.operators import cluster
    from storage_crawler_spark.plans import views as V

    V.register_base_tables(spark, sf_dir, ("embeddings",))
    got = [
        tuple(r)
        for r in spark.sql(
            "SELECT a, b FROM ("
            + cluster.gen_kcore_peeled(SPARK, rounds=8)
            + ") x ORDER BY a, b"
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = con.execute(
        "SELECT a, b FROM ("
        + cluster.gen_kcore_peeled(DUCK, rounds=8)
        + ") x ORDER BY a, b"
    ).fetchall()
    assert got == [tuple(r) for r in want]


# ---------------------------------------------------------------------------
# Streaming funnel / attribution twins (VERDICT r9 item 5): planted stream
# == batch parity on the semantics edges (window edges, re-entries, linear
# remainder, same-instant click ties), beyond the randomized battery draws.
# ---------------------------------------------------------------------------


def _planted_events_sf(tmp_path) -> str:
    import json as _json

    base = 1_704_000_000
    rows = [
        # (event_id, ts_s, user_id, event_type, value, props)
        # user 1: clean full funnel + 3-click attribution with remainder
        (1, base + 100, 1, "view", None, None),
        (2, base + 200, 1, "click", None, _json.dumps({"k": 0})),
        (3, base + 210, 1, "click", None, _json.dumps({"k": 1})),
        # same-instant click tie: higher event_id wins last-touch
        (4, base + 210, 1, "click", None, _json.dumps({"k": 2})),
        (5, base + 300, 1, "purchase", 1.000001, None),
        # user 2: click BEFORE the first view — credits attribution,
        # never advances the funnel
        (6, base + 100, 2, "click", None, _json.dumps({"k": 3})),
        (7, base + 150, 2, "view", None, None),
        (8, base + 200, 2, "purchase", 2.0, None),
        # user 3: lag-edge cases — same-instant step (strict >) fails,
        # exactly t1 + lag qualifies
        (9, base, 3, "view", None, None),
        (10, base, 3, "click", None, _json.dumps({"k": 0})),
        (11, base + 86400, 3, "click", None, _json.dumps({"k": 1})),
        (12, base + 86400 + 86400, 3, "purchase", 4.0, None),
        # window edge: click exactly window_s before the purchase counts
        # (tc >= tp - window_s), one second older does not
        (13, base + 200000 - 86400, 4, "click", None, _json.dumps({"k": 2})),
        (14, base + 200000 - 86401, 4, "click", None, _json.dumps({"k": 3})),
        (15, base + 200000, 4, "purchase", 8.0, None),
        # NULL hygiene: NULL-user rows, NULL-value purchase, NULL-props click
        (16, base + 50, None, "view", None, None),
        (17, base + 60, 5, "purchase", None, None),
        (18, base + 55, 5, "click", None, None),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
    pdf["user_id"] = pd.array(pdf["user_id"], dtype="Int64")
    d = tmp_path / "planted_events"
    d.mkdir()
    pdf.to_parquet(str(d / "events.parquet"), index=False)
    return str(d)


def test_streaming_funnel_matches_batch_oracle_planted(spark, tmp_path):
    from parity_util import assert_parity

    from storage_crawler_spark.plans import registry

    sf = _planted_events_sf(tmp_path)
    spec = registry.get_query("streaming_funnel_steps")
    df = spec.builder(spark, sf)
    row = df.collect()[0]
    # users 1,2,3 have views; only user 1 chains click+purchase strictly
    # inside the lag windows; user 3's same-instant click fails es > t1 but
    # its t1+lag click qualifies — purchase then falls at t2+lag exactly
    assert (row.n_step1, row.n_step2, row.n_step3) == (3, 2, 2)
    assert_parity(df, spec.oracle, {"events": f"{sf}/events.parquet"},
                  "streaming_funnel_steps planted")


def test_streaming_attribution_matches_batch_oracle_planted(spark, tmp_path):
    from parity_util import assert_parity

    from storage_crawler_spark.plans import registry

    sf = _planted_events_sf(tmp_path)
    spec = registry.get_query("streaming_attribution_credit")
    df = spec.builder(spark, sf)
    rows = {r.channel: r for r in df.collect()}
    # user 1: vm = floor(1.000001 * 1e6) = 1_000_000 (the IEEE product is
    # 1000000.99999…, and BOTH engines floor the same double) over 3
    # clicks -> 333333 each + remainder 1 to the same-instant tie winner
    # (event_id 4, channel 2) which also takes last-touch; user 3's
    # window-edge click (exactly tp - window_s) is channel 1; user 4's
    # in-window click is channel 2; user 2's is 3
    assert rows[0].linear_credit_micro == 333333
    assert rows[1].linear_credit_micro == 333333 + 4_000_000
    assert rows[2].linear_credit_micro == 333334 + 8_000_000
    assert rows[3].linear_credit_micro == 2_000_000
    assert rows[2].last_touch_credit_micro == 1_000_000 + 8_000_000
    # the one-second-too-old click (event 14) credits nothing
    assert rows[3].n_touches == 1
    assert_parity(df, spec.oracle, {"events": f"{sf}/events.parquet"},
                  "streaming_attribution_credit planted")


# ---------------------------------------------------------------------------
# URL / domain ingest tier (r10): every canonicalization step verified on a
# planted corpus where the expected canonical strings are hand-derivable.
# ---------------------------------------------------------------------------


def _url_docs() -> pd.DataFrame:
    # doc_ids chosen so the synthesized variants cover: https/http, www,
    # host case, :443, trailing slash, utm-only query, page+utm query,
    # bare query, fragment — and so ids {0,3} and {1,2} collide after
    # canonicalization (same source, lang, page group, query class)
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


def test_url_canonicalization_planted_strings():
    from storage_crawler_spark.operators import urls

    got = _duck(
        "SELECT doc_id, url, curl FROM (" + urls.gen_url_rel(DUCK) + ") u ORDER BY doc_id",
        documents=_url_docs(),
    )
    by_id = dict(zip(got["doc_id"], zip(got["url"], got["curl"])))
    # id 0: every variant at once — www, upper host, :443, trailing slash,
    # utm-only query, fragment — all fold away
    assert by_id[0][0] == (
        "https://www.ALPHA.example.com:443/docs/en/0/"
        "?utm_source=feed&utm_medium=rss#section-1"
    )
    assert by_id[0][1] == "https://alpha.example.com/docs/en/0"
    # id 1: http folds to https, mixed-case host lowers, utm_campaign
    # dropped but page=2 kept
    assert by_id[1][0] == "http://alpha.Example.com/docs/en/0?page=2&utm_campaign=x"
    assert by_id[1][1] == "https://alpha.example.com/docs/en/0?page=2"
    # id 2 collides with 1; id 3 collides with 0
    assert by_id[2][1] == by_id[1][1]
    assert by_id[3][1] == by_id[0][1]
    # id 20/23: group (20 div 20) % 12 = 1 -> the robots allow-override
    # path; 20 (utm-only query) and 23 (no query) canonicalize identically
    assert by_id[20][1] == "https://src0.example.com/docs/en/1"
    assert by_id[23][1] == by_id[20][1]


def test_url_dedup_first_seen_keepers_planted():
    from storage_crawler_spark.operators import urls

    got = _duck(urls.gen_url_dedup(DUCK), documents=_url_docs())
    groups = dict(zip(got["curl"], zip(got["keep_id"], got["n_dups"])))
    assert groups == {
        "https://alpha.example.com/docs/en/0": (0, 2),
        "https://alpha.example.com/docs/en/0?page=2": (1, 2),
        "https://src0.example.com/docs/en/1": (20, 2),
    }


def test_robots_longest_match_and_full_block_planted():
    from storage_crawler_spark.operators import urls

    got = _duck(urls.gen_robots_filter(DUCK), documents=_url_docs())
    rows = dict(zip(got["domain"], zip(got["n_allowed"], got["n_blocked"])))
    # alpha.example.com: path /docs/en/0 -> '/docs/en' disallow wins
    assert rows["alpha.example.com"] == (0, 4)
    # src0.example.com: fully disallowed at '/', BUT the wildcard
    # '/docs/en/1' allow is LONGER — most-specific-rule wins, so the
    # group-1 paths stay crawlable even on the blocked domain
    assert rows["src0.example.com"] == (2, 0)


def test_blocklist_priority_planted():
    from storage_crawler_spark.operators import urls

    docs = _url_docs()
    # move one alpha doc onto a blocked domain and one onto a French path
    docs.loc[docs.doc_id == 2, "source"] = "src1"   # domain-blocked
    docs.loc[docs.doc_id == 3, "lang"] = "fr"       # keyword-blocked
    got = _duck(urls.gen_blocklist_filter(DUCK), documents=docs)
    rows = {
        s: (k, bd, bk)
        for s, k, bd, bk in zip(
            got["source"], got["n_kept"], got["n_blocked_domain"],
            got["n_blocked_keyword"],
        )
    }
    # id 1 carries page=2 and id 3 is now French -> keyword-blocked;
    # id 0 has utm-only -> kept
    assert rows["alpha"] == (1, 0, 2)
    # domain block wins (and is counted) even though id 2 also has page=2
    assert rows["src1"] == (0, 1, 0)
    assert rows["src0"] == (2, 0, 0)


def test_url_rel_spark_matches_duck_bitwise(spark, tmp_path):
    from storage_crawler_spark.operators import urls
    from storage_crawler_spark.plans import views as V

    sf = str(tmp_path / "urldocs")
    os.makedirs(sf, exist_ok=True)
    _url_docs().to_parquet(f"{sf}/documents.parquet", index=False)
    V.register_base_tables(spark, sf, ("documents",))
    got = sorted(
        tuple(r) for r in spark.sql(urls.gen_url_rel(SPARK)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(urls.gen_url_rel(DUCK)).fetchall())
    assert got == want and len(got) == 6


# ---------------------------------------------------------------------------
# Forget-apply (r10): the right-to-be-forgotten maintenance step — all three
# shard actions, the exact threshold boundary, and the referential proof.
# ---------------------------------------------------------------------------


def test_forget_apply_planted_actions_and_conservation():
    from storage_crawler_spark.operators import pipeline as pl

    # shard_size=4: shard 0 untouched (ids 1,2,3 + none ≡ 0 mod 53 except
    # 0 — excluded from the store), shard 1 (ids 4..7) one tombstone via
    # bulk range? no — use modulus 5: ids 5 in shard 1 -> deletion_vector;
    # shard 2 = bulk -> rewrite; boundary shard 3 has exactly 1/4 deleted
    # (ids 12..15, 15 ≡ 0 mod 5) = 250000 micro == threshold -> rewrite
    emb = pd.DataFrame(
        {
            "vec_id": pd.array(range(1, 16 + 1), dtype="int64"),
            "embedding": [[0.0, 1.0]] * 16,
            "label": pd.array([0] * 16, dtype="Int32"),
        }
    )
    got = _duck(
        pl.gen_forget_apply(DUCK, modulus=5, shard_size=4, bulk_shard=2),
        embeddings=emb,
    )
    rows = {
        s: (nd, fm, a, kc, ks)
        for s, n, nd, fm, a, kc, ks in zip(
            got["shard"], got["n_vectors"], got["n_deleted"],
            got["deleted_frac_micro"], got["action"], got["kept_count"],
            got["kept_id_sum"],
        )
    }
    assert rows[0] == (0, 0, "untouched", 3, 6)          # ids 1,2,3
    assert rows[1] == (1, 250000, "rewrite", 3, 4 + 6 + 7)  # id 5 out — AT threshold
    assert rows[2] == (4, 1000000, "rewrite", 0, 0)      # bulk shard 8..11
    assert rows[3] == (1, 250000, "rewrite", 3, 12 + 13 + 14)  # id 15 out
    # conservation: kept + deleted == total per shard
    assert all(
        n == nd + kc
        for n, nd, kc in zip(got["n_vectors"], got["n_deleted"], got["kept_count"])
    )


def test_forget_apply_below_threshold_is_deletion_vector():
    from storage_crawler_spark.operators import pipeline as pl

    # one tombstone in a 5-vector shard: 200000 micro < 250000 threshold
    emb = pd.DataFrame(
        {
            "vec_id": pd.array(range(5, 10), dtype="int64"),
            "embedding": [[1.0, 0.0]] * 5,
            "label": pd.array([0] * 5, dtype="Int32"),
        }
    )
    got = _duck(
        pl.gen_forget_apply(DUCK, modulus=5, shard_size=16, bulk_shard=9),
        embeddings=emb,
    )
    assert got["action"] == ["deletion_vector"]
    assert got["deleted_frac_micro"] == [200000]


def test_url_revisions_planted_drift_and_majority():
    from storage_crawler_spark.operators import urls

    docs = _url_docs()
    # ids {0,3} share a canonical URL: give them DIFFERENT texts (a true
    # revision); ids {1,2} share one: give them the SAME text (a pure
    # refetch).  Majority: add nothing else, so the keeper version of
    # {0,3} holds 1 of 2 fetches (ties count as majority: 1*2 >= 2).
    docs.loc[docs.doc_id == 0, "text"] = "old content"
    docs.loc[docs.doc_id == 3, "text"] = "new content"
    docs.loc[docs.doc_id == 1, "text"] = "same"
    docs.loc[docs.doc_id == 2, "text"] = "same"
    got = _duck(urls.gen_url_revisions(DUCK), documents=docs)
    rows = {
        c: (nf, nv, k, m)
        for c, nf, nv, k, m in zip(
            got["curl"], got["n_fetches"], got["n_versions"],
            got["keep_id"], got["keeper_is_majority"],
        )
    }
    assert rows["https://alpha.example.com/docs/en/0"] == (2, 2, 0, 1)
    assert rows["https://alpha.example.com/docs/en/0?page=2"] == (2, 1, 1, 1)


def test_url_revisions_spark_matches_duck_planted(spark, tmp_path):
    from storage_crawler_spark.plans import registry

    from parity_util import assert_parity

    docs = _url_docs()
    docs.loc[docs.doc_id == 3, "text"] = "changed"
    sf = str(tmp_path / "revdocs")
    os.makedirs(sf, exist_ok=True)
    docs.to_parquet(f"{sf}/documents.parquet", index=False)
    spec = registry.get_query("ingest_url_revisions")
    assert_parity(
        spec.builder(spark, sf), spec.oracle,
        {"documents": f"{sf}/documents.parquet"}, "ingest_url_revisions planted",
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation audit (r10): hand-checkable prefix-vs-full rankings.
# ---------------------------------------------------------------------------


def test_matryoshka_audit_planted_rankings():
    from storage_crawler_spark.operators import similarity as sim

    # query = id 0.  Candidate 1 is NEAR in the first 2 dims but FAR in the
    # tail; candidate 2 is uniformly mid; candidate 3 uniformly far.
    emb = pd.DataFrame(
        {
            "vec_id": pd.array([0, 1, 2, 3], dtype="int64"),
            "embedding": [
                [0.0, 0.0, 0.0, 0.0],
                [0.01, 0.01, 9.0, 9.0],   # prefix-2 winner, full loser
                [1.0, 1.0, 1.0, 1.0],     # full winner
                [5.0, 5.0, 5.0, 5.0],
            ],
            "label": pd.array([0, 0, 0, 0], dtype="Int32"),
        }
    )
    got = _duck(
        sim.gen_matryoshka_audit(DUCK, query_vec_id=0, k=2, prefixes=(2,)),
        embeddings=emb,
    )
    # prefix-2 d2: c1 = 2e8 < c2 = 2e12 < c3 = 5e13 -> prefix top-2 {1, 2}.
    # full d2: c2 = 4e12 < c3 = 1e14 < c1 = 1.62e14 (the far tail sinks
    # c1 below c3!) -> full top-2 {2, 3}.  Overlap = {2}, top-1 disagrees.
    assert got["prefix_dim"] == [2]
    assert got["overlap_k"] == [1]
    assert got["recall_at_k"] == [0.5]
    assert got["top1_agree"] == [0]


def test_matryoshka_audit_spark_matches_duck(spark, sf_dir):
    from parity_util import assert_parity

    from storage_crawler_spark.plans import registry

    spec = registry.get_query("sim_matryoshka_audit")
    assert_parity(
        spec.builder(spark, sf_dir), spec.oracle,
        {"embeddings": f"{sf_dir}/embeddings.parquet"}, "sim_matryoshka_audit",
    )


# ---------------------------------------------------------------------------
# Vacuum plan (r10, r11-queued): retention-edge and conservation fixtures.
# ---------------------------------------------------------------------------


def _vacuum_docs():
    # files-view mtime = 1700000000 + (doc_id*7919) % 900000; as-of default
    # 1700500000, retention 400000 -> vacuum-now iff mtime <= 1700100000,
    # i.e. (doc_id*7919) % 900000 <= 100000
    return pd.DataFrame(
        {
            "doc_id": pd.array([0, 7, 14, 21, 3], dtype="int64"),
            "text": ["w"] * 5,
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": [10, 20, 30, 40, 50],
        }
    )


def test_vacuum_plan_retention_split_and_conservation():
    from storage_crawler_spark.plans import views as V
    from storage_crawler_spark.sources import lake

    got = _duck(
        V.with_files_cte(lake.gen_vacuum_plan(DUCK)), documents=_vacuum_docs()
    )
    rows = {r: t for r, *t in zip(
        got["root"], got["n_files"], got["n_orphans"], got["n_vacuum_now"],
        got["n_retained_young"], got["bytes_reclaimable"],
    )}
    # ids 0,7,14,21 are orphans (id % 7 == 0); id 3 is live.
    # mtime offset = (id*7919) % 900000; vacuum-now iff offset <= 100000:
    # id 0 -> 0 (now), id 7 -> 55433 (now), id 14 -> 110866 (young),
    # id 21 -> 166299 (young) -> two vacuum-now, two retained
    total = [sum(x) for x in zip(*rows.values())]
    assert total[0] == 5 and total[1] == 4
    assert total[2] == 2 and total[3] == 2
    # reclaimable = sizes of docs 0 and 7 = (10 + 20) * 4096
    assert total[4] == (10 + 20) * 4096
    # conservation: orphans = vacuum_now + retained_young in every root
    for r, (nf, no, nv, nr, b) in rows.items():
        assert no == nv + nr


def test_vacuum_plan_spark_matches_duck(spark, sf_dir):
    from parity_util import assert_parity

    from storage_crawler_spark.plans import registry

    spec = registry.get_query("lake_vacuum_plan")
    assert_parity(
        spec.builder(spark, sf_dir), spec.oracle,
        {"documents": f"{sf_dir}/documents.parquet"}, "lake_vacuum_plan",
    )
