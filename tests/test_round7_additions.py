"""Hand-computed semantic fixtures for the round-7 operators (DuckDB-side;
the registry sweep + oracle gate pin Spark to the same generated SQL):
winnowing guarantee and density, winnow-pair recall, Flesch readability,
n-gram novelty, Poisson-bootstrap determinism, z-order pruning dominance,
sweep-line concurrency, day-of-week index closure, aHash hamming, and
lattice-exact dimension correlation."""

from __future__ import annotations

import duckdb
import pandas as pd

from storage_crawler_spark.operators import analytics, dedup, multimodal, sampling, similarity, text
from storage_crawler_spark.plans.dialect import DUCK
from storage_crawler_spark.sources.lake import gen_zorder_layout


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


def _events(rows):
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = pd.to_datetime(ev["ts"], unit="s")
    return ev


# ---------------------------------------------------------------------------
# winnowing (text_winnow_fingerprints / dedup_winnow_pairs)
# ---------------------------------------------------------------------------


def test_winnow_guarantee_shared_substring_forces_shared_fingerprint():
    # the structural guarantee: any common substring of length >= k + w - 1
    # (= 11 chars at k=8, w=4) forces at least one shared fingerprint
    shared = "zqxjkvwpbfy gm"  # 14 chars, unusual so no accidental grams
    a = "aaaa bbbb cccc " + shared + " dddd eeee ffff gggg hhhh iiii"
    b = "1111 2222 3333 " + shared + " 4444 5555 6666 7777 8888 9999"
    got = _duck(
        dedup.gen_winnow_pairs(DUCK, min_shared=1, df_cap=10), documents=_docs([a, b])
    )
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (0, 1) in pairs


def test_winnow_density_near_theory():
    # density should sit near 2/(w+1) = 0.4 before dedup collapses repeats
    txt = " ".join(f"tok{i}word{i * 7 % 13}" for i in range(200))
    got = _duck(text.gen_winnow_fingerprints(DUCK, k=8, w=4), documents=_docs([txt]))
    assert got["n_fingerprints"][0] > 0
    assert 0.2 < got["density"][0] < 0.6


def test_winnow_short_doc_emits_zero_row():
    got = _duck(text.gen_winnow_fingerprints(DUCK, k=8, w=4), documents=_docs(["tiny"]))
    assert got["n_fingerprints"] == [0] and got["density"] == [None]


# ---------------------------------------------------------------------------
# text_readability
# ---------------------------------------------------------------------------


def test_readability_monosyllabic_scores_higher():
    easy = "The cat sat. The dog ran. We go now. It is big."
    hard = (
        "Incomprehensibility characterizes institutionalized "
        "multidimensional organizational infrastructures."
    )
    got = _duck(
        text.gen_readability(DUCK),
        documents=_docs([easy, hard], sources=["easy", "hard"]),
    )
    by_src = dict(zip(got["source"], got["avg_fre"]))
    assert by_src["easy"] > 70 > by_src["hard"]
    shares = dict(zip(got["source"], got["easy_share"]))
    assert shares["easy"] == 1.0 and shares["hard"] == 0.0


# ---------------------------------------------------------------------------
# text_ngram_novelty
# ---------------------------------------------------------------------------


def test_ngram_novelty_duplicate_docs_have_zero_novelty():
    dup = "alpha beta gamma delta epsilon zeta"
    uniq = "one two three four five six seven"
    got = _duck(
        text.gen_ngram_novelty(DUCK, n=3),
        documents=_docs([dup, dup, uniq], sources=["d", "d", "u"]),
    )
    by_src = dict(zip(got["source"], got["avg_novelty"]))
    assert by_src["d"] == 0.0  # every gram appears in the twin
    assert by_src["u"] == 1.0  # every gram unique corpus-wide


# ---------------------------------------------------------------------------
# sample_bootstrap_ci
# ---------------------------------------------------------------------------


def test_bootstrap_deterministic_and_brackets_mean():
    docs = _docs([f"{'x' * (10 + 7 * (i % 13))}" for i in range(100)])
    q = sampling.gen_bootstrap_ci(DUCK, n_reps=16)
    g1 = _duck(q, documents=docs)
    g2 = _duck(q, documents=docs)
    assert g1 == g2  # frozen md5 draws: bit-identical reruns
    assert g1["n_replicas"] == [16]
    assert g1["boot_se"][0] > 0
    assert g1["rep_min"][0] <= g1["mean_chars"][0] <= g1["rep_max"][0]


# ---------------------------------------------------------------------------
# lake_zorder_layout
# ---------------------------------------------------------------------------


def test_zorder_bounds_both_dimensions():
    base = 1_700_000_000
    rows = [
        (i, base + i * 61, i % 50, "click", 1.0, "{}") for i in range(2048)
    ]
    got = _duck(gen_zorder_layout(DUCK, n_files=16), events=_events(rows))
    by = {
        lay: (t, u)
        for lay, t, u in zip(
            got["layout"], got["avg_files_per_time_slice"], got["avg_files_per_user_slice"]
        )
    }
    zt, zu = by["zorder"]
    tt, tu = by["time_linear"]
    ut, uu = by["user_linear"]
    # linear layouts are degenerate on their off dimension; z-order beats
    # each layout's WORST dimension on both axes
    assert zt < tu and zt < ut
    assert zu < tu and zu < ut
    # and each linear layout is near-perfect on its own dimension
    assert tt <= 2.0 and uu <= 2.5


# ---------------------------------------------------------------------------
# events_session_concurrency
# ---------------------------------------------------------------------------


def test_session_concurrency_micro():
    base = 1_700_000_000
    # user 0: one session [0, 100]; user 1: one session [50, 150]
    # -> concurrency 1 on [0,50), 2 on [50,101), 1 on [101,151), span 151
    rows = [
        (0, base + 0, 0, "click", 1.0, "{}"),
        (1, base + 100, 0, "click", 1.0, "{}"),
        (2, base + 50, 1, "click", 1.0, "{}"),
        (3, base + 150, 1, "click", 1.0, "{}"),
    ]
    got = _duck(analytics.gen_session_concurrency(DUCK, gap_s=1800), events=_events(rows))
    assert got["n_sessions"] == [2]
    assert got["max_concurrency"] == [2]
    assert got["span_seconds"] == [151]
    assert got["idle_seconds"] == [0]
    expected_avg = (50 * 1 + 51 * 2 + 50 * 1) / 151
    assert abs(got["avg_concurrency"][0] - expected_avg) < 1e-5


# ---------------------------------------------------------------------------
# events_dow_seasonality
# ---------------------------------------------------------------------------


def test_dow_seasonality_indexes_average_to_one():
    base = 1_700_000_000
    rows = [(i, base + i * 86400 // 3, 1, "click", 1.0, "{}") for i in range(210)]
    got = _duck(analytics.gen_dow_seasonality(DUCK), events=_events(rows))
    total_n = sum(got["n"])
    assert total_n == 210
    # sum over dows of n * 7 / total == 7 by construction
    assert abs(sum(got["seasonality_idx"]) - 7.0) < 1e-4


# ---------------------------------------------------------------------------
# multimodal_ahash / dedup_media_hamming
# ---------------------------------------------------------------------------


def test_ahash_identical_payloads_hamming_zero():
    a = "payload payload payload payload payload payload!!"
    c = "completely different bytes 0123456789 abcdefghij zz"
    got = _duck(multimodal.gen_ahash_pairs(DUCK, max_hamming=0), documents=_docs([a, a, c]))
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (0, 1) in pairs
    assert all(h == 0 for h in got["hamming"])


def test_ahash_bit_rule_exact():
    # bytes 'ab' = 97, 98; mean 97.5 -> bit set iff byte >= 97.5 (integer
    # cross-multiply: b * 2 >= 195): only byte 98 (position 2, bit 1)
    got = _duck(multimodal.gen_ahash(DUCK), documents=_docs(["ab"]))
    assert got["n_head_bytes"] == [2]
    assert got["ahash"] == [2]  # bit 1 only


# ---------------------------------------------------------------------------
# embedding_corr_audit
# ---------------------------------------------------------------------------


def test_corr_audit_flags_duplicated_dimension():
    # dim 2 == dim 1 exactly -> corr 1; dim 3 = -dim 1 -> corr -1
    vecs = []
    for i in range(40):
        x = ((i * 37) % 17 - 8) / 16.0
        y = ((i * 11) % 23 - 11) / 32.0
        vecs.append([x, x, -x, y])
    emb = pd.DataFrame({"vec_id": range(40), "embedding": vecs, "label": [0] * 40})
    got = _duck(similarity.gen_corr_audit(DUCK, top_k=3), embeddings=emb)
    top = list(zip(got["dim_i"], got["dim_j"], got["corr"]))
    by_pair = {(i, j): c for i, j, c in top}
    assert by_pair[(1, 2)] > 0.999
    assert by_pair[(1, 3)] < -0.999
