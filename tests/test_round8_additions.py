"""Hand-computed semantic fixtures for the round-8 operators (DuckDB-side;
the registry sweep + oracle gate pin Spark to the same generated SQL):
greedy BPE merge-fold semantics, two-epoch merge learning, compression
accounting, vocabulary-contract edge cases, and the event-graph PageRank
power iteration."""

from __future__ import annotations

import duckdb
import pandas as pd

from storage_crawler_spark.operators import text
from storage_crawler_spark.plans.dialect import DUCK


def _duck(sql: str, **views: pd.DataFrame):
    con = duckdb.connect()
    for name, df in views.items():
        con.register(name, df)
    return con.execute(sql).fetch_arrow_table().to_pydict()


def _docs(texts, langs=None, sources=None):
    n = len(texts)
    return pd.DataFrame(
        {
            "doc_id": range(n),
            "text": texts,
            "lang": langs or ["en"] * n,
            "source": sources or ["s0"] * n,
            "n_chars": [len(t) if t is not None else 0 for t in texts],
        }
    )


# ---------------------------------------------------------------------------
# BPE encode (text_bpe_encode / text_bpe_compression)
# ---------------------------------------------------------------------------


def _encode_map(texts, **kw):
    got = _duck(text.gen_bpe_encode(DUCK, **kw), documents=_docs(texts))
    return dict(zip(got["word"], got["tokens"])), dict(zip(got["word"], got["n_tokens"]))


def test_bpe_single_merge_greedy_leftmost():
    # corpus: 'ab' dominates pair counts -> first merge is (a, b).
    # greedy left-to-right application on every word shape:
    toks, counts = _encode_map(["ab ab ab ab ab abab ababa aab abb"], k1=1, k2=0)
    assert toks["ab"] == "ab" and counts["ab"] == 1
    assert toks["abab"] == "ab_ab"
    assert toks["ababa"] == "ab_ab_a"
    assert toks["aab"] == "a_ab"
    assert toks["abb"] == "ab_b"


def test_bpe_same_symbol_merge_no_cascade_within_pass():
    # only 'a' pairs exist -> merge (a, a); greedy pairing halves runs,
    # odd tail stays single, and the new 'aa' symbol does NOT re-merge
    # under the same rule in the same pass
    toks, counts = _encode_map(["aa aa aa aaa aaaa aaaaa"], k1=1, k2=0)
    assert toks["aaa"] == "aa_a"
    assert toks["aaaa"] == "aa_aa"
    assert toks["aaaaa"] == "aa_aa_a"


def test_bpe_epoch2_learns_multichar_merges():
    # epoch 1 learns (a,b) [and maybe more chars]; epoch 2 sees symbol
    # sequence [ab, ab] everywhere and learns the MULTI-CHAR merge (ab, ab)
    toks, counts = _encode_map(["abab abab abab abab"], k1=1, k2=1)
    assert toks["abab"] == "abab" and counts["abab"] == 1


def test_bpe_rank_order_is_frequency_then_lexical():
    # 'xy' appears 3x weighted, 'yz' 2x: (x,y) must outrank (y,z); the word
    # 'xyz' then encodes as [xy, z] (the higher-rank merge fires first and
    # consumes the y)
    toks, _ = _encode_map(["xy xy xyz yz"], k1=2, k2=0)
    assert toks["xyz"] == "xy_z"


def test_bpe_vocab_contract_filters_and_caps():
    # words with non-[a-z0-9] chars are excluded from the vocabulary (they
    # would collide with the fold's structural characters); uppercase is
    # folded by lower(); overlong words are dropped by max_word_len
    got = _duck(
        text.gen_bpe_encode(DUCK, max_word_len=6),
        documents=_docs(["He-llo WORLD a_b c|d longerthansix ok"]),
    )
    words = set(got["word"])
    assert "world" in words and "ok" in words
    assert "he-llo" not in words and "a_b" not in words and "c|d" not in words
    assert "longerthansix" not in words


def test_bpe_doc_tokens_vocab_and_fallback_accounting():
    # doc: 'ab ab Zq xyz!' -> vocab words: ab(freq2), xyz?? no: 'xyz!' has
    # '!' -> OOV; 'Zq' lowercases to 'zq' (in charset).  With k1 merges,
    # 'ab' encodes to 1 token, 'zq' to <=2; OOV 'xyz!' falls back to 4
    # (char-level), so totals close exactly
    got = _duck(text.gen_bpe_doc_tokens(DUCK), documents=_docs(["ab ab Zq xyz!"]))
    assert got["doc_id"] == [0]
    assert got["n_words"] == [4]
    # ab ab -> 1+1; zq -> 'z_q' unless (z,q) mined (freq 1 -> it IS a
    # candidate; with default k1=24 it gets merged) -> 1; fallback 4
    assert got["n_bpe_tokens"][0] in (7, 8)
    assert got["n_word_chars"] == [2 + 2 + 2 + 4]
    # every word OOV -> pure char fallback: tokens == chars
    got2 = _duck(text.gen_bpe_doc_tokens(DUCK), documents=_docs(["!! ?? ##"]))
    assert got2["n_bpe_tokens"] == got2["n_word_chars"]


def test_bpe_no_vocab_yields_empty_encode_and_null_compression():
    got = _duck(text.gen_bpe_encode(DUCK), documents=_docs(["!!! ---", None]))
    assert len(got["word"]) == 0
    comp = _duck(text.gen_bpe_compression(DUCK), documents=_docs(["!!! ---", None]))
    assert comp["n_word_types"] == [0]
    assert comp["tokens_per_char"] == [None]


def test_bpe_compression_accounting_closes():
    # hand-checked corpus: 'ab ab cd' -> vocab ab(freq2,len2) cd(freq1,len2)
    # merges epoch1: (a,b) rank1 (count2), (c,d) rank2 (count1) -> both
    # words encode to 1 token
    comp = _duck(text.gen_bpe_compression(DUCK), documents=_docs(["ab ab cd"]))
    assert comp["n_word_types"] == [2]
    assert comp["total_words"] == [3]
    assert comp["chars_weighted"] == [6]
    assert comp["bpe_tokens_weighted"] == [3]
    assert comp["tokens_per_char"] == [0.5]
    assert comp["avg_tokens_per_word"] == [1.0]


# ---------------------------------------------------------------------------
# event-graph PageRank (events_pagerank)
# ---------------------------------------------------------------------------


def _events(rows):
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = pd.to_datetime(ev["ts"], unit="s")
    return ev


def _pr_duck(rows, **kw):
    from storage_crawler_spark.operators.analytics import gen_pagerank

    got = _duck(gen_pagerank(DUCK, **kw), events=_events(rows))
    return list(zip(got["rnk"], got["event_type"], got["rank_scaled"], got["pagerank"]))


def test_pagerank_planted_hub_dominates():
    # star graph: every user alternates spoke -> hub, so all flow
    # concentrates on 'hub'; spokes only get teleport + hub's split-back...
    # here spokes never receive transitions at all (hub is terminal per
    # pair), so hub must rank first by a wide margin
    rows = []
    eid = 0
    for u, spoke in enumerate(["a", "b", "c", "d"]):
        for rep in range(3):
            rows.append((eid, 1000 + eid, u, spoke, 1.0, None)); eid += 1
            rows.append((eid, 1000 + eid, u, "hub", 1.0, None)); eid += 1
    got = _pr_duck(rows)
    assert got[0][1] == "hub"
    ranks = {t: p for _, t, _, p in got}
    assert all(ranks["hub"] > 2 * ranks[s] for s in "abcd")


def test_pagerank_mass_conservation_and_uniform_cycle():
    # 3-cycle a->b->c->a with equal weights: symmetry forces equal ranks;
    # total scaled mass stays within floor-loss slack of PR_S
    from storage_crawler_spark.operators.analytics import PR_S

    rows = []
    eid = 0
    for rep in range(4):
        for t in ["a", "b", "c"]:
            rows.append((eid, 1000 + eid, 7, t, 1.0, None)); eid += 1
    got = _pr_duck(rows)
    scaled = [r for _, _, r, _ in got]
    assert len(got) == 3
    assert max(scaled) - min(scaled) <= 3  # symmetric up to floor slack
    assert 0 <= PR_S - sum(scaled) < 1000 * len(got)


def test_pagerank_dangling_mass_redistributes():
    # a -> b and b is terminal for every user: b is dangling; its mass must
    # recycle (no sink collapse), so both ranks stay strictly positive and
    # b (receiving all of a's flow) outranks a
    rows = [(0, 1000, 1, "a", 1.0, None), (1, 1001, 1, "b", 1.0, None),
            (2, 1002, 2, "a", 1.0, None), (3, 1003, 2, "b", 1.0, None)]
    got = _pr_duck(rows)
    ranks = {t: r for _, t, r, _ in got}
    assert ranks["b"] > ranks["a"] > 0


def test_pagerank_empty_and_single_type():
    assert _pr_duck([(0, 1000, None, "a", 1.0, None)]) == []  # NULL users only
    got = _pr_duck([(0, 1000, 1, "a", 1.0, None), (1, 1001, 1, "a", 1.0, None)])
    from storage_crawler_spark.operators.analytics import PR_S

    assert len(got) == 1 and got[0][1] == "a"
    assert got[0][2] >= PR_S - 100  # self-loop keeps all mass minus floor slack


def test_hits_separates_hub_and_authority_roles():
    from storage_crawler_spark.operators.analytics import gen_hits

    # pure bipartite flow: 'start' always transitions to 'end' and nothing
    # flows anywhere else -> 'start' is the pure hub (authority 0), 'end'
    # the pure authority (hub 0)
    rows = []
    eid = 0
    for u in range(6):
        rows.append((eid, 1000 + eid, u, "start", 1.0, None)); eid += 1
        rows.append((eid, 1000 + eid, u, "end", 1.0, None)); eid += 1
    got = _duck(gen_hits(DUCK), events=_events(rows))
    out = {t: (a, h) for t, a, h, _, _ in zip(
        got["event_type"], got["authority_scaled"], got["hub_scaled"],
        got["authority"], got["hub"])}
    from storage_crawler_spark.operators.analytics import PR_PS

    assert out["start"] == (0, PR_PS)
    assert out["end"] == (PR_PS, 0)


def test_hits_spark_duck_parity_on_random_fixture(spark):
    import random

    from storage_crawler_spark.operators.analytics import gen_hits, hits_events

    rng = random.Random(99)
    types = ["a", "b", "c", "d", "hubby"]
    rows = [(eid, 1000 + rng.randrange(4000), rng.randrange(10),
             rng.choice(types), 1.0, None) for eid in range(250)]
    pdf = _events(rows)
    spark.createDataFrame(pdf).createOrReplaceTempView("events")
    s = [tuple(r) for r in hits_events(spark, k=7).collect()]
    con = duckdb.connect()
    con.register("events", pdf)
    d = con.execute(gen_hits(DUCK, k=7)).fetchall()
    assert s == d


def test_pagerank_spark_duck_parity_on_random_fixture(spark):
    import random

    from storage_crawler_spark.operators.analytics import gen_pagerank, pagerank_events

    rng = random.Random(42)
    types = ["a", "b", "c", "d", "e", "sink"]
    rows = []
    for eid in range(300):
        # 'sink' never emits a successor for half the users (dangling-ish)
        rows.append((eid, 1000 + rng.randrange(5000), rng.randrange(12),
                     rng.choice(types), 1.0, None))
    pdf = _events(rows)
    spark.createDataFrame(pdf).createOrReplaceTempView("events")
    s = [tuple(r) for r in pagerank_events(spark, k=6).collect()]
    con = duckdb.connect()
    con.register("events", pdf)
    d = con.execute(gen_pagerank(DUCK, k=6)).fetchall()
    assert s == d


# ---------------------------------------------------------------------------
# phrase search + license scan (text_phrase_search / text_license_scan)
# ---------------------------------------------------------------------------


def test_phrase_search_consecutive_only_with_counts():
    docs = [
        "the hash join wins",                  # 1 match
        "hash join here hash join there",      # 2 matches
        "join hash reversed",                  # 0 — order matters
        "hash x join",                         # 0 — not consecutive
        "HASH JOIN upper",                     # 1 — lower() in the index
        None,
    ]
    got = _duck(text.gen_phrase_search(DUCK), documents=_docs(docs))
    out = dict(zip(got["doc_id"], got["n_matches"]))
    assert out == {0: 1, 1: 2, 4: 1}


def test_phrase_search_three_term_chain():
    docs = ["a b c a b", "b c a", "a b b c"]
    got = _duck(text.gen_phrase_search(DUCK, phrase="a b c"), documents=_docs(docs))
    assert dict(zip(got["doc_id"], got["n_matches"])) == {0: 1}


def test_license_scan_marker_battery():
    docs = [
        "Copyright (c) 2024 Someone. All rights reserved.",   # copyright + all_rights
        "licensed under the GNU General Public License v3",   # gpl
        "released under the MIT License",                     # permissive
        "plain text, no markers",
        "see GPL-3 for terms",                                # gpl
    ]
    got = _duck(text.gen_license_scan(DUCK), documents=_docs(docs))
    assert got["n_docs"] == [5]
    assert got["n_copyright"] == [1]
    assert got["n_gpl"] == [2]
    assert got["n_all_rights"] == [1]
    assert got["n_permissive"] == [1]
    assert got["n_flagged"] == [4]
    assert abs(got["flagged_share"][0] - 0.8) < 1e-6


# ---------------------------------------------------------------------------
# incremental view maintenance (ingest_ivm_agg)
# ---------------------------------------------------------------------------


def _docs_ids(rows):
    # rows: (doc_id, text, source)
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[2] for r in rows],
            "n_chars": [len(r[1]) if r[1] is not None else 0 for r in rows],
        }
    )


def test_ivm_agg_consistent_on_planted_changes():
    from storage_crawler_spark.sources.ingest import gen_ivm_agg

    # doc 10: updated (%10=0, %17=10); doc 3: deleted (%17=3); doc 5:
    # re-inserted (%23=5); doc 7 untouched.  (NOT doc 20 — 20%17=3 makes
    # it a delete-wins case, the trap this fixture originally hit.)
    rows = [(10, "twenty chars here!", "a"), (3, "deleted", "a"),
            (5, "insert me", "b"), (7, "plain", "b")]
    got = _duck(gen_ivm_agg(DUCK), documents=_docs_ids(rows))
    out = {s: (ni, si, nf, sf, c) for s, ni, si, nf, sf, c
           in zip(got["source"], got["n_docs_ivm"], got["sum_chars_ivm"],
                  got["n_docs_full"], got["sum_chars_full"], got["consistent"])}
    assert all(v[4] == 1 for v in out.values())
    # source a: doc3 deleted, doc20 updated (+len(' [updated]')=10 chars)
    assert out["a"][0] == 1 and out["a"][1] == len("twenty chars here!") + 10
    # source b: doc5 duplicated by the insert
    assert out["b"][0] == 3 and out["b"][1] == 2 * len("insert me") + len("plain")


def test_ivm_agg_fully_deleted_source_stays_visible():
    from storage_crawler_spark.sources.ingest import gen_ivm_agg

    # source 'gone' holds only doc 3 (deleted): IVM row shows 0 docs, the
    # recompute side has no row — FULL OUTER JOIN keeps it, flagged
    # inconsistent (NULL != 0 -> consistent NULL/0, never silently equal)
    rows = [(3, "bye", "gone"), (7, "stay", "keep")]
    got = _duck(gen_ivm_agg(DUCK), documents=_docs_ids(rows))
    out = dict(zip(got["source"], zip(got["n_docs_ivm"], got["n_docs_full"], got["consistent"])))
    assert out["keep"] == (1, 1, 1)
    assert out["gone"][0] == 0 and out["gone"][1] is None and out["gone"][2] != 1


# ---------------------------------------------------------------------------
# DP release audit (pipeline_dp_release)
# ---------------------------------------------------------------------------


def test_dp_release_noise_frozen_and_accounted():
    from storage_crawler_spark.operators.sampling import gen_dp_release

    docs = _docs(["x"] * 6, sources=["s0", "s0", "s0", "s1", "s1", "s2"])
    a = _duck(gen_dp_release(DUCK), documents=docs)
    b = _duck(gen_dp_release(DUCK), documents=docs)
    assert a == b  # frozen noise: rerun-identical
    for exact, noise, released, abs_err in zip(
        a["exact_n"], a["noise"], a["released"], a["abs_err"]
    ):
        assert abs((exact + noise) - released) < 2e-6
        assert abs(abs_err - abs(noise)) < 2e-6
    # different seed -> different noise (same exact counts)
    c = _duck(gen_dp_release(DUCK, seed="dp2"), documents=docs)
    assert c["exact_n"] == a["exact_n"] and c["noise"] != a["noise"]


def test_dp_release_scale_tracks_epsilon():
    from storage_crawler_spark.operators.sampling import gen_dp_release

    docs = _docs(["x"] * 4, sources=["s0", "s1", "s2", "s3"])
    tight = _duck(gen_dp_release(DUCK, eps=10.0), documents=docs)
    loose = _duck(gen_dp_release(DUCK, eps=0.1), documents=docs)
    # same uniform, scale b = 1/eps: noise ratio is exactly 100x
    for t, l in zip(tight["noise"], loose["noise"]):
        assert abs(l - 100 * t) < 1e-3


# ---------------------------------------------------------------------------
# Holt forecast (events_holt_trend)
# ---------------------------------------------------------------------------


def _holt_py(counts, S=1_000_000):
    def tdiv(x, m):
        return x // m if x >= 0 else -((-x) // m)

    level, trend, sse = counts[0] * S, 0, 0
    for c in counts[1:]:
        err = tdiv(level + trend, S) - c
        sse += err * err
        nl = tdiv(c * S + 3 * (level + trend), 4)
        trend = tdiv(nl - level + 3 * trend, 4)
        level = nl
    return level, trend, sse


def test_holt_matches_reference_fold_and_directions():
    from storage_crawler_spark.operators.analytics import HOLT_S, gen_holt_trend

    # type 'up': 10,12,...,28 rising daily counts; 'flat': constant 5
    rows, eid = [], 0
    for day, cnt in enumerate(range(10, 30, 2)):
        for _ in range(cnt):
            rows.append((eid, day * 86400 + 100 + eid % 50, 1, "up", 1.0, None)); eid += 1
    for day in range(10):
        for _ in range(5):
            rows.append((eid, day * 86400 + 100 + eid % 50, 2, "flat", 1.0, None)); eid += 1
    got = _duck(gen_holt_trend(DUCK), events=_events(rows))
    out = {t: (lv, tr, fn, f7, sse) for t, _, lv, tr, fn, f7, sse in zip(
        got["event_type"], got["n_days"], got["level"], got["trend_per_day"],
        got["forecast_next"], got["forecast_7d"], got["one_step_sse"])}
    lvl, trd, sse = _holt_py(list(range(10, 30, 2)))
    import math

    assert abs(out["up"][0] - math.floor(lvl / HOLT_S * 1e6) / 1e6) < 2e-6
    assert out["up"][1] > 0 and out["up"][3] > out["up"][2]  # rising forecast
    assert out["up"][4] == sse
    assert out["flat"] == (5.0, 0.0, 5, 5, 0)  # flat: exact level, no error


def test_holt_single_day_type_is_degenerate():
    from storage_crawler_spark.operators.analytics import gen_holt_trend

    rows = [(0, 1000, 1, "once", 1.0, None), (1, 1001, 1, "once", 1.0, None)]
    got = _duck(gen_holt_trend(DUCK), events=_events(rows))
    assert got["n_days"] == [1]
    assert got["level"] == [2.0] and got["trend_per_day"] == [0.0]
    assert got["one_step_sse"] == [0]


# ---------------------------------------------------------------------------
# A/B proportion test (events_ab_test)
# ---------------------------------------------------------------------------


def test_ab_test_planted_effect_detected_and_null_accepted():
    import math

    from storage_crawler_spark.operators.analytics import gen_ab_test

    # find users on each side of the md5-parity split, then plant a huge
    # purchase-share difference between the arms
    from storage_crawler_spark.plans.dialect import DUCK as D
    import duckdb as dk

    con = dk.connect()
    grp_of = {}
    for u in range(40):
        key = D.md5_key48(f"CAST({u} AS STRING)", "ab")
        grp_of[u] = con.execute(f"SELECT CAST({key} % 2 AS INT)").fetchone()[0]
    a_users = [u for u, g in grp_of.items() if g == 0][:5]
    b_users = [u for u, g in grp_of.items() if g == 1][:5]
    rows, eid = [], 0
    for u in a_users:  # arm A: 80% purchases
        for i in range(50):
            t = "purchase" if i % 5 != 0 else "view"
            rows.append((eid, 1000 + eid, u, t, 1.0, None)); eid += 1
    for u in b_users:  # arm B: 20% purchases
        for i in range(50):
            t = "purchase" if i % 5 == 0 else "view"
            rows.append((eid, 1000 + eid, u, t, 1.0, None)); eid += 1
    got = _duck(gen_ab_test(DUCK), events=_events(rows))
    assert got["n_a"] == [250] and got["n_b"] == [250]
    assert got["significant_99"] == [1]
    # hand-check the pooled z
    pa, pb, pp = 0.8, 0.2, 0.5
    z = (pa - pb) / math.sqrt(pp * 0.5 * (1 / 250 + 1 / 250))
    assert abs(got["z_score"][0] - z) < 1e-4

    # null: identical behavior in both arms -> |z| small, not significant.
    # moduli 7 and 40 are coprime, so every user gets the same 1/7
    # purchase share (i % 5 with 40 users would give users = 0 mod 5 ALL
    # the purchases — a planted effect by accident)
    null_rows = [(i, 1000 + i, i % 40, "purchase" if i % 7 == 0 else "view", 1.0, None)
                 for i in range(2000)]
    got0 = _duck(gen_ab_test(DUCK), events=_events(null_rows))
    assert got0["significant_95"] == [0]


def test_ab_test_empty_cohort_yields_null_not_error():
    from storage_crawler_spark.operators.analytics import gen_ab_test

    rows = [(0, 1000, 2, "view", 1.0, None)]  # single user -> one arm empty
    got = _duck(gen_ab_test(DUCK), events=_events(rows))
    assert got["z_score"] == [None]


# ---------------------------------------------------------------------------
# Kneser-Ney bigram NLL (text_kn_bigram_nll)
# ---------------------------------------------------------------------------


def test_kn_bigram_hand_computed():
    import math

    got = _duck(text.gen_kn_bigram_nll(DUCK), documents=_docs(["a b a b a c"]))
    # bigrams: (a,b)x2 (b,a)x2 (a,c); c1(a)=3 n1+(a,*)=2; c1(b)=2 n1+(b,*)=1;
    # n1+(*,b)=n1+(*,a)=n1+(*,c)=1; types=3
    p_ab = (2 - 0.75) / 3 + 0.75 * 2 / 3 * (1 / 3)
    p_ba = (2 - 0.75) / 2 + 0.75 * 1 / 2 * (1 / 3)
    p_ac = (1 - 0.75) / 3 + 0.75 * 2 / 3 * (1 / 3)
    want = -(2 * math.log(p_ab) + 2 * math.log(p_ba) + math.log(p_ac)) / 5
    assert got["n_bigrams"] == [5]
    # 2e-6: the r13 order-free mean floors each row onto the 1e-6 lattice
    # BEFORE averaging (then trunc6), so the result sits in
    # (want - 2e-6, want] rather than within 1e-6 of the raw mean
    assert abs(got["mean_kn_nll"][0] - want) < 2e-6


def test_kn_continuation_beats_raw_frequency():
    # 'francisco' is the most frequent continuation by raw count but has a
    # single continuation TYPE; under KN its continuation probability term
    # equals the once-seen words', so the doc of one-off pairs must NOT be
    # penalized for lacking the high-frequency token (the classic KN
    # motivation).  Concretely: P_cont is uniform across all four
    # continuations here, so ranking depends only on the discounted term.
    docs = ["san francisco " * 5, "the dog the cat the fox"]
    got = _duck(text.gen_kn_bigram_nll(DUCK), documents=_docs(docs))
    nll = dict(zip(got["doc_id"], got["mean_kn_nll"]))
    assert set(nll) == {0, 1}
    # the repeated-pair doc is highly predictable -> much lower NLL
    assert nll[0] < nll[1]


def test_kn_single_and_empty_docs_emit_nothing():
    got = _duck(text.gen_kn_bigram_nll(DUCK), documents=_docs(["solo", None, ""]))
    assert got["doc_id"] == []


# ---------------------------------------------------------------------------
# deterministic count-min heavy hitters (sketch_heavy_hitters)
# ---------------------------------------------------------------------------


def _cms_duck(rows, **kw):
    from storage_crawler_spark.operators.sketches import gen_cms_heavy_hitters

    got = _duck(gen_cms_heavy_hitters(DUCK, **kw), events=_events(rows))
    return list(zip(got["user_id"], got["exact_n"], got["est_n"],
                    got["overcount"], got["lower_bounded"]))


def test_cms_planted_heavy_hitter_tops_and_never_undercounts():
    rows = []
    eid = 0
    for _ in range(50):  # user 7: 50 events — the planted hitter
        rows.append((eid, 1000 + eid, 7, "click", 1.0, None)); eid += 1
    for u in range(20, 40):  # 20 background users, 2 events each
        for _ in range(2):
            rows.append((eid, 1000 + eid, u, "view", 1.0, None)); eid += 1
    got = _cms_duck(rows)
    assert got[0][0] == 7 and got[0][2] >= 50
    assert all(lb == 1 and est >= exact for _, exact, est, over, lb in got)
    assert all(over == est - exact for _, exact, est, over, lb in got)


def test_cms_exact_when_width_dwarfs_users():
    # 5 users in a 1024-wide sketch: collisions are overwhelmingly
    # unlikely under the md5 uniform, so estimates are exact
    rows = [(i, 1000 + i, i % 5, "click", 1.0, None) for i in range(100)]
    got = _cms_duck(rows)
    assert all(over == 0 for _, _, _, over, _ in got)
    assert sorted(exact for _, exact, _, _, _ in got) == [20] * 5


def test_cms_narrow_width_forces_collisions_but_keeps_bound():
    # width 2: massive collision mass, yet the structural lower bound and
    # the overcount identity must still hold
    rows = [(i, 1000 + i, i % 30, "click", 1.0, None) for i in range(300)]
    got = _cms_duck(rows, width=2)
    assert all(lb == 1 for *_, lb in got)
    assert any(over > 0 for _, _, _, over, _ in got)


# ---------------------------------------------------------------------------
# power-iteration PCA (embedding_pca_power)
# ---------------------------------------------------------------------------


def _embeddings(vectors, labels=None):
    n = len(vectors)
    return pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": [list(map(float, v)) if v is not None else None for v in vectors],
            "label": labels or [0] * n,
        }
    )


def _pca_duck(vectors, **kw):
    from storage_crawler_spark.operators.similarity import gen_pca_power

    got = _duck(gen_pca_power(DUCK, **kw), embeddings=_embeddings(vectors))
    return list(zip(got["dim"], got["loading_scaled"], got["loading"], got["top_eig_share"]))


def test_pca_planted_dominant_direction():
    # dim 1 varies 100x more than the rest: the top direction must be the
    # dim-1 axis (|loading_1| == 1.0 after max-abs normalization) with the
    # other loadings near zero, and the variance share near 1
    import random

    rng = random.Random(3)
    vecs = [[rng.uniform(-4, 4), rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05)]
            for _ in range(60)]
    got = _pca_duck(vecs)
    loads = {d_: abs(l) for d_, _, l, _ in got}
    assert loads[1] == 1.0 and loads[2] < 0.1 and loads[3] < 0.1
    assert got[0][3] > 0.9  # top_eig_share


def test_pca_symmetric_two_dim_diagonal():
    # perfectly correlated pair (x, x): top direction is the diagonal —
    # equal-magnitude same-sign loadings (up to floor slack on the lattice)
    vecs = [[x / 10.0, x / 10.0] for x in range(-30, 31)]
    got = _pca_duck(vecs)
    (d1, s1, l1, sh), (d2, s2, l2, _) = got
    assert abs(abs(s1) - abs(s2)) <= 2 and (s1 > 0) == (s2 > 0)
    assert sh > 0.9


def test_pca_empty_and_degenerate():
    assert _pca_duck([]) == []
    assert _pca_duck([None, None]) == []
    # constant vectors: zero scatter everywhere -> m guard keeps the query
    # total (no div-by-zero); loadings collapse deterministically
    got = _pca_duck([[1.0, 2.0]] * 5)
    assert len(got) == 2
    assert all(r[3] is not None for r in got)


def test_pca_project_separates_planted_clusters(spark):
    # two label clusters displaced along dim 1 (the dominant variance
    # axis): projected score ranges must not overlap, and the Spark
    # literal-array path must match the oracle's relational projection
    import random

    from storage_crawler_spark.operators.similarity import (
        gen_pca_project,
        pca_project_embeddings,
    )

    rng = random.Random(5)
    vecs, labels = [], []
    for i in range(60):
        base = 3.0 if i % 2 == 0 else -3.0
        vecs.append([base + rng.uniform(-0.2, 0.2),
                     rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1)])
        labels.append(i % 2)
    pdf = _embeddings(vecs, labels=labels)
    spark.createDataFrame(pdf).createOrReplaceTempView("embeddings")
    s = [tuple(r) for r in pca_project_embeddings(spark, k=10).collect()]
    con = duckdb.connect()
    con.register("embeddings", pdf)
    d = con.execute(gen_pca_project(DUCK, k=10)).fetchall()
    assert s == d
    by_label = {r[0]: r for r in s}
    lo0, hi0 = by_label[0][3], by_label[0][4]
    lo1, hi1 = by_label[1][3], by_label[1][4]
    assert hi1 < lo0 or hi0 < lo1  # disjoint score ranges


def test_pca_spark_duck_parity_on_random_fixture(spark):
    import random

    from storage_crawler_spark.operators.similarity import (
        gen_pca_power,
        pca_power_embeddings,
    )

    rng = random.Random(11)
    vecs = [[rng.uniform(-2, 2) for _ in range(8)] for _ in range(80)]
    pdf = _embeddings(vecs, labels=[i % 3 for i in range(80)])
    spark.createDataFrame(pdf).createOrReplaceTempView("embeddings")
    s = [tuple(r) for r in pca_power_embeddings(spark, k=8).collect()]
    con = duckdb.connect()
    con.register("embeddings", pdf)
    d = con.execute(gen_pca_power(DUCK, k=8)).fetchall()
    assert s == d


def test_bpe_spark_duck_parity_on_mixed_fixture(spark):
    # engine parity on a fixture exercising merges, cascade shapes, and
    # filtered words together (the oracle gate's check, in-miniature)
    texts = [
        "the theme therefore then the the an and banana bandana",
        "aaa aaaa abab ababa Mixed-Case 99 bottles of 99 problems",
        None,
        "the quick brown fox jumps over the lazy dog again and again",
    ]
    pdf = _docs(texts)
    spark.createDataFrame(pdf).createOrReplaceTempView("documents")
    from storage_crawler_spark.plans.dialect import SPARK

    s = [tuple(r) for r in spark.sql(text.gen_bpe_encode(SPARK, k1=8, k2=4)).collect()]
    con = duckdb.connect()
    con.register("documents", pdf)
    d = con.execute(text.gen_bpe_encode(DUCK, k1=8, k2=4)).fetchall()
    assert s == d
