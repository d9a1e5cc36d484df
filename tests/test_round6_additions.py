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
