"""Second batch of hand-computed semantic fixtures for the third-pass
operators (DuckDB-side; the randomized parity batteries pin Spark to the
same SQL): containment subset detection, transition-matrix tie order,
cohort-retention offsets, BM25 ranking monotonicity, byte-entropy closed
forms, and vocab-coverage OOV accounting."""

from __future__ import annotations

import duckdb
import pandas as pd
import math

from storage_crawler_spark.operators import analytics, dedup, text
from storage_crawler_spark.plans.dialect import DUCK


def _duck(sql: str, **views: pd.DataFrame):
    con = duckdb.connect()
    for name, df in views.items():
        con.register(name, df)
    return con.execute(sql).fetch_arrow_table().to_pydict()


def _docs(rows):
    return pd.DataFrame(
        [(i, t, "en", f"src{i % 2}", len(t)) for i, t in enumerate(rows)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )


def test_containment_subset_detected_and_disjoint_excluded():
    big = " ".join(f"w{i}" for i in range(40))
    small = " ".join(f"w{i}" for i in range(10, 22))  # shingles subset of big
    other = " ".join(f"z{i}" for i in range(30))  # disjoint
    got = _duck(dedup.gen_containment_pairs(DUCK), documents=_docs([big, small, other]))
    pairs = {(a, b): c for a, b, c in zip(got["doc_a"], got["doc_b"], got["containment"])}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert all(2 not in p for p in pairs)


def test_transition_matrix_tie_breaks_by_event_id():
    base = 1_700_000_000
    rows = [
        # same second: event_id order decides click -> view -> purchase
        (0, base, 0, "click", 1.0, "{}"),
        (1, base, 0, "view", 1.0, "{}"),
        (2, base, 0, "purchase", 1.0, "{}"),
    ]
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    ev["ts"] = pd.to_datetime(ev["ts"], unit="s")
    got = _duck(analytics.gen_transition_matrix(DUCK), events=ev)
    trans = set(zip(got["from_type"], got["to_type"]))
    assert trans == {("click", "view"), ("view", "purchase")}


def test_cohort_retention_offsets():
    base = 1_700_000_000
    wk = analytics.SECONDS_PER_WEEK
    rows = []
    eid = 0
    # cohort week 0: users 0,1. user 0 returns week 1; user 1 does not.
    for u, weeks in ((0, [0, 1]), (1, [0])):
        for w in weeks:
            rows.append((eid, base + w * wk, u, "click", 1.0, "{}"))
            eid += 1
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    ev["ts"] = pd.to_datetime(ev["ts"], unit="s")
    got = _duck(analytics.gen_cohort_retention(DUCK), events=ev)
    by_off = dict(zip(got["week_offset"], zip(got["active_users"], got["retention"])))
    assert by_off[0] == (2, 1.0)
    assert by_off[1] == (1, 0.5)


def test_bm25_more_query_terms_ranks_higher():
    filler = " ".join(f"f{i}" for i in range(20))
    docs = _docs(
        [
            f"spark query merge {filler}",  # all 3 terms
            f"spark query {filler} x1",  # 2 terms, same length
            f"spark {filler} x1 x2",  # 1 term
            filler + " a b c",  # none
        ]
    )
    got = _duck(text.gen_bm25_topk(DUCK), documents=docs)
    assert got["doc_id"][:3] == [0, 1, 2]
    assert 3 not in got["doc_id"]
    assert got["n_terms_hit"][:3] == [3, 2, 1]


def test_byte_entropy_closed_forms():
    from storage_crawler_spark.operators.multimodal import gen_byte_entropy

    got = _duck(gen_byte_entropy(DUCK), documents=_docs(["aaaaaaaa", "abababab"]))
    by_id = dict(zip(got["doc_id"], got["byte_entropy"]))
    assert by_id[0] == 0.0  # single symbol
    assert abs(by_id[1] - math.log(2)) < 1e-6  # two equiprobable symbols


def test_vocab_coverage_oov_accounting():
    # 'rare' never makes the top-64 vocab only if vocab is smaller than the
    # distinct token count — use vocab_size=2 to force OOV
    docs = _docs(["a a a b rare", "a b b b"])
    got = _duck(text.gen_vocab_coverage(DUCK, vocab_size=2), documents=docs)
    by_id = dict(zip(got["doc_id"], zip(got["oov_tokens"], got["n_tokens"])))
    assert by_id[0] == (1, 5)  # 'rare' is OOV; a,b in vocab
    assert by_id[1] == (0, 4)
