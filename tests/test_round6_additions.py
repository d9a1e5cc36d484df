"""Hand-computed semantic fixtures for the round-6 operators (DuckDB-side;
the registry sweep + randomized parity batteries pin Spark to the same
generated SQL): event-type affinity lift, exact-moment value trend, robust
length profile, and BPE merge-pair counting."""

from __future__ import annotations

import duckdb
import pandas as pd

from storage_crawler_spark.operators import analytics, text
from storage_crawler_spark.plans.dialect import DUCK


def _duck(sql: str, **views: pd.DataFrame):
    con = duckdb.connect()
    for name, df in views.items():
        con.register(name, df)
    return con.execute(sql).fetch_arrow_table().to_pydict()


def _events(rows):
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = pd.to_datetime(ev["ts"], unit="s")
    return ev


# ---------------------------------------------------------------------------
# events_type_affinity
# ---------------------------------------------------------------------------


def test_type_affinity_lift_and_jaccard():
    base = 1_700_000_000
    # users 0,1: {a,b}; user 2: {a}; user 3: {b,c}  ->  n_users=4,
    # counts a=3 b=3 c=1; pairs: (a,b)=2, (b,c)=1, (a,c) absent
    rows, eid = [], 0
    for u, types in ((0, "ab"), (1, "ab"), (2, "a"), (3, "bc")):
        for t in types:
            rows.append((eid, base + eid, u, t, 1.0, "{}"))
            eid += 1
    got = _duck(analytics.gen_type_affinity(DUCK), events=_events(rows))
    by_pair = {
        (a, b): (nb, lift, jac)
        for a, b, nb, lift, jac in zip(
            got["type_a"], got["type_b"], got["n_both"], got["lift"], got["user_jaccard"]
        )
    }
    assert set(by_pair) == {("a", "b"), ("b", "c")}
    nb, lift, jac = by_pair[("a", "b")]
    assert nb == 2
    assert abs(lift - (2 * 4) / (3 * 3)) < 1e-6
    assert jac == 2 / (3 + 3 - 2)
    nb, lift, jac = by_pair[("b", "c")]
    assert nb == 1 and abs(lift - 4 / 3) < 1e-6 and abs(jac - 1 / 3) < 1e-6


def test_type_affinity_duplicate_events_count_once():
    base = 1_700_000_000
    # user 0 fires type a twice and b once: distinct (user, type) dedups
    rows = [
        (0, base, 0, "a", 1.0, "{}"),
        (1, base + 1, 0, "a", 1.0, "{}"),
        (2, base + 2, 0, "b", 1.0, "{}"),
        (3, base + 3, 1, "a", 1.0, "{}"),
    ]
    got = _duck(analytics.gen_type_affinity(DUCK), events=_events(rows))
    assert got["n_both"] == [1] and got["n_a"] == [2] and got["n_b"] == [1]


# ---------------------------------------------------------------------------
# events_value_trend
# ---------------------------------------------------------------------------


def test_value_trend_exact_slope_intercept():
    day = 86400
    base = 1_700_006_400  # mid-day so the floor lands all events on one day
    # daily sums for type t: day0 = 1+1 = 2, day1 = 2, day2 = 3
    rows = [
        (0, base, 0, "t", 1.0, "{}"),
        (1, base + 100, 1, "t", 1.0, "{}"),
        (2, base + day, 0, "t", 2.0, "{}"),
        (3, base + 2 * day, 0, "t", 3.0, "{}"),
    ]
    got = _duck(analytics.gen_value_trend(DUCK), events=_events(rows))
    # moments: n=3 sx=3 sy8=56 sxy=64 sxx=5 -> slope 0.5, intercept 11/6
    assert got["event_type"] == ["t"] and got["n_days"] == [3]
    assert got["slope_per_day"] == [0.5]
    assert abs(got["intercept_day0"][0] - 1.833333) < 1e-9
    assert abs(got["mean_daily_value"][0] - 2.333333) < 1e-9


def test_value_trend_single_day_type_excluded():
    base = 1_700_006_400
    rows = [(0, base, 0, "solo", 4.0, "{}"), (1, base + 10, 1, "solo", 2.0, "{}")]
    got = _duck(analytics.gen_value_trend(DUCK), events=_events(rows))
    assert got["event_type"] == []  # zero x-variance -> no trend row


# ---------------------------------------------------------------------------
# text_length_robust
# ---------------------------------------------------------------------------


def test_length_robust_median_mad_winsorize():
    lens = [10, 20, 30, 40, 1000]
    docs = pd.DataFrame(
        [(i, "x", "en", "s", n) for i, n in enumerate(lens)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = _duck(text.gen_length_robust(DUCK), documents=docs)
    assert got["lang"] == ["en"] and got["n_docs"] == [5]
    assert got["median_len"] == [30.0]
    # |x - 30| = [20, 10, 0, 10, 970] -> median 10
    assert got["mad_len"] == [10.0]
    # disc bounds are corpus values: p05 -> 10, p95 -> 1000 (n=5: no clip)
    assert got["p05_len"] == [10] and got["p95_len"] == [1000]
    assert got["winsorized_mean"] == [220.0]


def test_length_robust_winsorize_clips_outlier():
    # 20 docs of 100 chars + one 10000-char outlier: p95 bound excludes it
    lens = [100] * 20 + [10_000]
    docs = pd.DataFrame(
        [(i, "x", "en", "s", n) for i, n in enumerate(lens)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = _duck(text.gen_length_robust(DUCK), documents=docs)
    assert got["p95_len"] == [100]
    assert got["winsorized_mean"] == [100.0]
    assert got["mad_len"] == [0.0]


# ---------------------------------------------------------------------------
# text_bpe_merge_pairs
# ---------------------------------------------------------------------------


def test_bpe_pairs_weighted_by_word_frequency_with_multiplicity():
    docs = pd.DataFrame(
        [(0, "ab ab cd", "en", "s", 8), (1, "aba", "en", "s", 3)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = _duck(text.gen_bpe_merge_pairs(DUCK), documents=docs)
    by_pair = {
        (l, r): (c, w)
        for l, r, c, w in zip(
            got["sym_l"], got["sym_r"], got["pair_count"], got["n_word_types"]
        )
    }
    # words: ab(freq 2), cd(1), aba(1); pairs: ab from "ab"(2) + "aba"(1),
    # ba from "aba"(1), cd from "cd"(1)
    assert by_pair[("a", "b")] == (3, 2)
    assert by_pair[("b", "a")] == (1, 1)
    assert by_pair[("c", "d")] == (1, 1)
    # ordering: pair_count DESC then syms
    assert (got["sym_l"][0], got["sym_r"][0]) == ("a", "b")


def test_bpe_pairs_single_char_words_excluded():
    docs = pd.DataFrame(
        [(0, "a b c ab", "en", "s", 8)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = _duck(text.gen_bpe_merge_pairs(DUCK), documents=docs)
    assert list(zip(got["sym_l"], got["sym_r"])) == [("a", "b")]


# ---------------------------------------------------------------------------
# join_asof_tolerance_events (Spark builder vs hand-known window)
# ---------------------------------------------------------------------------


def test_asof_tolerance_expires_old_matches(spark):
    from storage_crawler_spark.operators.temporal import asof_join_tolerance

    left = spark.createDataFrame(
        [(1, 10, 1000), (2, 20, 1000)], "event_id LONG, user_id LONG, left_ts_s LONG"
    )
    right = spark.createDataFrame(
        [(10, 900), (10, 100), (20, 100)], "user_id LONG, ts_s LONG"
    )
    out = {
        r.event_id: (r.asof_ts, r.asof_n)
        for r in asof_join_tolerance(
            left, right, key="user_id", left_ts="left_ts_s", right_ts="ts_s",
            tolerance_s=200,
        ).collect()
    }
    # user 10: purchase at 900 is inside [800, 1000]; 100 is expired
    assert out[1] == (900, 1)
    # user 20: only purchase is at 100 -> expired -> NULL match, count 0
    assert out[2] == (None, 0)


def test_asof_tolerance_same_instant_inclusive(spark):
    from storage_crawler_spark.operators.temporal import asof_join_tolerance

    left = spark.createDataFrame([(1, 10, 500)], "event_id LONG, user_id LONG, left_ts_s LONG")
    right = spark.createDataFrame([(10, 500), (10, 300)], "user_id LONG, ts_s LONG")
    row = asof_join_tolerance(
        left, right, key="user_id", left_ts="left_ts_s", right_ts="ts_s", tolerance_s=200
    ).collect()[0]
    # same-instant right row matches; 300 is exactly at the lower bound (inclusive)
    assert (row.asof_ts, row.asof_n) == (500, 2)


# ---------------------------------------------------------------------------
# sim_hybrid_rrf
# ---------------------------------------------------------------------------


def test_hybrid_rrf_fuses_ranks_and_keeps_single_list_hits():
    from storage_crawler_spark.operators import similarity

    # doc 1 hits the query terms hard (text rank 1); doc 2 has no terms but
    # is the nearest vector; doc 3 hits both lists.
    docs = pd.DataFrame(
        [
            (1, "spark query merge spark query", "en", "s", 29),
            (2, "nothing relevant here", "en", "s", 21),
            (3, "spark stuff", "en", "s", 11),
        ],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    emb = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "embedding": [[1.0, 0.0], [0.0, 1.0], [1.0, 0.1], [0.5, 0.9]],
            "label": [0, 0, 0, 0],
        }
    )
    got = _duck(similarity.gen_hybrid_rrf(DUCK), documents=docs, embeddings=emb)
    rows = {
        d: (t, v, s)
        for d, t, v, s in zip(
            got["doc_id"], got["text_rank"], got["vec_rank"], got["rrf_score"]
        )
    }
    # text ranks: doc 1 (two distinct terms, higher tf) then doc 3
    assert rows[1][0] == 1 and rows[3][0] == 2
    # vector tier is the RP-LSH multi-probe index (round 9): only vectors
    # within Hamming radius 1 of the query's hyperplane signature are
    # candidates.  vec 2 (cosine≈0.995, near-parallel to the query) shares
    # the signature and ranks 1; the md5-deterministic planes put vecs 1
    # and 3 outside the probe radius here, so they are pruned BY DESIGN —
    # they still surface through the lexical list with NULL vec_rank.
    assert rows[2][1] == 1
    assert rows[1][1] is None and rows[3][1] is None
    # doc 2 never hits a query term -> lexical side NULL, still present
    assert rows[2][0] is None
    import math

    exp3 = 1 / 62  # lexical rank 2 only; vector side pruned
    assert abs(rows[3][2] - math.floor(exp3 * 1e6) / 1e6) < 1e-9
    # fused order: doc1 (text rank 1) ties doc2 (vec rank 1) at 1/61,
    # doc_id breaks the tie; doc3 (1/62) trails
    assert got["doc_id"] == [1, 2, 3]


# ---------------------------------------------------------------------------
# pipeline_shard_balance
# ---------------------------------------------------------------------------


def test_shard_balance_totals_and_ratio():
    from storage_crawler_spark.operators import sampling

    docs = pd.DataFrame(
        [(i, "x", "en", "s", 100) for i in range(50)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = _duck(sampling.gen_shard_balance(DUCK), documents=docs)
    assert sum(got["n_docs"]) == 50
    assert sum(got["sum_chars"]) == 5000
    # uniform doc sizes: ratio is exactly (docs-in-shard / ideal)
    ideal = 5000 / len(got["shard_id"])
    for n, r in zip(got["sum_chars"], got["load_ratio"]):
        import math

        assert abs(r - math.floor(n / ideal * 1e6) / 1e6) < 1e-9


def test_shard_balance_empty_corpus_yields_null_ratio():
    from storage_crawler_spark.operators import sampling

    docs = pd.DataFrame(
        [(0, "", "en", "s", 0), (1, "", "en", "s", 0)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = _duck(sampling.gen_shard_balance(DUCK), documents=docs)
    assert all(r is None for r in got["load_ratio"])
    assert sum(got["n_docs"]) == 2


# ---------------------------------------------------------------------------
# ingest_cdc_upsert
# ---------------------------------------------------------------------------


def test_cdc_upsert_merge_semantics():
    import hashlib

    from storage_crawler_spark.sources.ingest import _DIGEST_MOD, gen_cdc_upsert

    n = 26
    docs = pd.DataFrame(
        [(i, f"d{i}", "en", "s", len(f"d{i}")) for i in range(n)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = _duck(gen_cdc_upsert(DUCK), documents=docs)
    # updates: %10==0 minus delete overlap -> {0, 10} (20 % 17 == 3 deleted)
    # deletes: %17==3 -> {3, 20}; inserts: %23==5 -> {5} as 1000005
    final = {}
    for i in range(n):
        if i % 17 == 3:
            continue
        final[i] = f"d{i} [updated]" if i % 10 == 0 else f"d{i}"
    final[1000005] = "d5"
    assert got["source"] == ["s"]
    assert got["n_docs"] == [len(final)] == [25]
    assert got["sum_chars"] == [sum(len(t) for t in final.values())]
    dig = sum(
        int(hashlib.md5(t.encode()).hexdigest()[:12], 16) for t in final.values()
    )
    assert got["text_digest_sum"] == [dig % _DIGEST_MOD]


def test_cdc_upsert_null_text_not_updated():
    from storage_crawler_spark.sources.ingest import gen_cdc_upsert

    docs = pd.DataFrame(
        [(0, None, "en", "s", 0), (1, "x", "en", "s", 1)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = _duck(gen_cdc_upsert(DUCK), documents=docs)
    # doc 0 matches the update selector but has NULL text: stays as-is
    assert got["n_docs"] == [2] and got["sum_chars"] == [1]


# ---------------------------------------------------------------------------
# embedding_dim_stats
# ---------------------------------------------------------------------------


def test_dim_stats_per_dimension_moments():
    emb = pd.DataFrame(
        {
            "vec_id": [0, 1, 2],
            "embedding": [[1.0, 2.0], [3.0, 4.0], [0.0, 6.0]],
            "label": [0, 0, 0],
        }
    )
    from storage_crawler_spark.operators import similarity

    got = _duck(similarity.gen_dim_stats(DUCK), embeddings=emb)
    assert got["dim"] == [1, 2]
    d1 = {k: got[k][0] for k in got}
    assert (d1["n_vecs"], d1["min_x"], d1["max_x"], d1["n_zero"]) == (3, 0.0, 3.0, 1)
    assert abs(d1["mean_x"] - 1.333333) < 1e-9
    assert abs(d1["mean_x2"] - 3.333333) < 1e-9
    d2 = {k: got[k][1] for k in got}
    assert (d2["mean_x"], d2["n_zero"]) == (4.0, 0)


# ---------------------------------------------------------------------------
# multimodal_dimension_audit (closed-form oracle side)
# ---------------------------------------------------------------------------


def test_dimension_audit_extreme_aspect_and_wav():
    from storage_crawler_spark.operators import multimodal

    docs = pd.DataFrame(
        [(i, "x", "en", "s", 1) for i in range(10)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = _duck(multimodal.gen_dimension_audit_oracle(DUCK), documents=docs)
    by_fmt = {
        f: (n, ex, un)
        for f, n, ex, un in zip(
            got["format"], got["n_files"], got["n_extreme_aspect"], got["n_unparsed"]
        )
    }
    # ids 0,5 -> png: (w,h) = (1,1) and (6,36); 36 > 4*6 -> one extreme
    assert by_fmt["png"] == (2, 1, 0)
    # ids 3,8 -> wav: no dims but channels set -> not "unparsed"
    assert by_fmt["wav"][0] == 2 and by_fmt["wav"][2] == 0


# ---------------------------------------------------------------------------
# events_session_stats
# ---------------------------------------------------------------------------


def test_session_stats_islands_and_bounces():
    base = 1_700_000_000
    rows = [
        # user 0: one 2-event session (gap 100s) then a bounce 5000s later
        (0, base, 0, "a", 1.0, "{}"),
        (1, base + 100, 0, "a", 1.0, "{}"),
        (2, base + 5000, 0, "a", 1.0, "{}"),
        # user 1: single bounce
        (3, base, 1, "a", 1.0, "{}"),
    ]
    got = _duck(analytics.gen_session_stats(DUCK), events=_events(rows))
    assert got["n_sessions"] == [3] and got["n_users"] == [2]
    assert got["n_bounce"] == [2]
    assert got["max_events"] == [2] and got["max_duration_s"] == [100]
    # durations [100, 0, 0] -> p50 = 0; events [2, 1, 1] -> p50 = 1
    assert got["p50_duration_s"] == [0.0] and got["p50_events"] == [1.0]


def test_session_stats_gap_boundary_inclusive():
    base = 1_700_000_000
    # exactly 1800s gap: NOT a new session (only gaps > 1800 split)
    rows = [(0, base, 0, "a", 1.0, "{}"), (1, base + 1800, 0, "a", 1.0, "{}")]
    got = _duck(analytics.gen_session_stats(DUCK), events=_events(rows))
    assert got["n_sessions"] == [1] and got["max_duration_s"] == [1800]


# ---------------------------------------------------------------------------
# tpch_basket_brands
# ---------------------------------------------------------------------------


def test_basket_brands_lift_and_support():
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 1, 2, 2, 3],
            "l_partkey": [10, 11, 20, 10, 30, 10],
        }
    )
    part = pd.DataFrame(
        {"p_partkey": [10, 11, 20, 30], "p_brand": ["A", "A", "B", "C"]}
    )
    got = _duck(analytics.gen_basket_brands(DUCK), lineitem=lineitem, part=part)
    by_pair = {
        (a, b): (nb, l, s)
        for a, b, nb, l, s in zip(
            got["brand_a"], got["brand_b"], got["n_both"], got["lift"], got["support"]
        )
    }
    # order 1: {A, B}; order 2: {A, C}; order 3: {A} -> pairs (A,B), (A,C)
    assert set(by_pair) == {("A", "B"), ("A", "C")}
    nb, lift, sup = by_pair[("A", "B")]
    # n_orders=3, n_A=3, n_B=1: lift = 1*3/(3*1) = 1.0, support = 1/3
    assert nb == 1 and lift == 1.0 and abs(sup - 1 / 3) < 1e-6


# ---------------------------------------------------------------------------
# pipeline_quality_budget_curve
# ---------------------------------------------------------------------------


def test_quality_budget_curve_cumulative_closure():
    from storage_crawler_spark.operators import pipeline as pipeline_ops

    # 20 docs of strictly increasing token counts -> strictly increasing
    # logits (length term monotone below 100 tokens, ratios constant)
    docs = pd.DataFrame(
        [
            (i, " ".join(f"w{j}" for j in range(2 + 4 * i)), "en", "s", 0)
            for i in range(20)
        ],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = _duck(pipeline_ops.gen_quality_budget_curve(DUCK), documents=docs)
    assert got["decile"] == list(range(1, 11))
    assert got["n_docs"] == [2] * 10
    assert got["cum_docs"][-1] == 20
    total_tokens = sum(2 + 4 * i for i in range(20))
    assert got["cum_tokens"][-1] == total_tokens
    # decile 1 holds the two LONGEST docs
    assert got["sum_tokens"][0] == (2 + 4 * 18) + (2 + 4 * 19)
    # cumulative columns are monotone
    assert got["cum_tokens"] == sorted(got["cum_tokens"])


# ---------------------------------------------------------------------------
# report_permission_audit
# ---------------------------------------------------------------------------


def test_permission_audit_bit_classification():
    from storage_crawler_spark.plans import views as V
    from storage_crawler_spark.reports import usage

    # two files, hand-derivable modes: m = 32768 + (id * 31) % 4095
    docs = pd.DataFrame(
        [(i, "x", "en", "s", 10) for i in range(20)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = _duck(
        V.with_files_cte(usage.gen_permission_audit(DUCK)), documents=docs
    )
    # recompute expected per uid (uid = id % 10) in python
    exp = {}
    for i in range(20):
        m = 32768 + (i * 31) % 4095
        uid = i % 10
        e = exp.setdefault(uid, [0, 0, 0, 0, 0])
        e[0] += 1
        e[1] += 1 if m & 2 else 0
        e[2] += 1 if m & 16 else 0
        e[3] += 1 if m & 2048 else 0
        e[4] += 10 * 4096 if m & 2 else 0
    for uid, n, ww, gw, su, bw in zip(
        got["st_uid"], got["n_files"], got["n_world_writable"],
        got["n_group_writable"], got["n_setuid"], got["bytes_world_writable"],
    ):
        assert exp[uid] == [n, ww, gw, su, bw]


# ---------------------------------------------------------------------------
# text_quality_learned (iterative fit: loss monotone, deterministic,
# better than majority class)
# ---------------------------------------------------------------------------


def test_logreg_loss_monotone_and_deterministic(spark):
    from pyspark.sql import functions as F

    from storage_crawler_spark.operators.logreg import (
        _score_col,
        feature_frame,
        log_loss,
        logreg_fit,
    )

    sf = "/root/testdata/sf0.001"
    feats = feature_frame(spark, sf).persist()
    try:
        losses = [log_loss(feats, logreg_fit(feats, iters=i)) for i in (0, 5, 15, 30)]
        assert all(a >= b - 1e-12 for a, b in zip(losses, losses[1:])), losses
        # determinism: two fits, same weights
        assert logreg_fit(feats, iters=10) == logreg_fit(feats, iters=10)
        # beats the majority-class baseline on the rule labels
        w = logreg_fit(feats, iters=30)
        acc = feats.agg(
            F.avg(((_score_col(w) >= 0).cast("int") == F.col("label")).cast("double"))
        ).collect()[0][0]
        pos = feats.agg(F.avg("label")).collect()[0][0]
        assert acc >= max(pos, 1 - pos) - 1e-9
    finally:
        feats.unpersist()


def test_quality_learned_report_consistency(spark):
    from storage_crawler_spark.operators.logreg import quality_learned_report

    rep = quality_learned_report(spark, "/root/testdata/sf0.001", iters=10).collect()
    assert len(rep) > 0
    for r in rep:
        assert 0 <= r.n_agree <= r.n_docs
        assert 0 <= r.n_keep_learned <= r.n_docs
        assert 0 <= r.n_keep_rule <= r.n_docs
