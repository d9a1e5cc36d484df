"""Round-11 third-pass fixtures: planted corpora for the session's new
operators (priority sampling, epoch planning, encoding audit, domain caps,
recrawl priority, column stats, kNN link prediction), each hand- or
Python-replication-derived per the house contract."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

from storage_crawler_spark.plans.dialect import DUCK, SPARK


def _duck(sql: str, **views: pd.DataFrame):
    con = duckdb.connect()
    for name, df in views.items():
        con.register(name, df)
    return con.execute(sql).fetch_arrow_table().to_pydict()


def _key48(s: str, seed: str = "") -> int:
    return int(hashlib.md5((seed + s).encode()).hexdigest()[:12], 16)


# ---------------------------------------------------------------------------
# sample_priority: independent Python replication of the Duffield-Lund-
# Thorup estimator on a planted corpus, plus the unsaturated degenerate
# (n <= k -> tau = 0, est_weight = w, estimate EXACT).
# ---------------------------------------------------------------------------


def _prio_docs(n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": pd.array(range(n), dtype="int64"),
            "text": ["x" * (7 + 13 * (i % 11)) for i in range(n)],
            "lang": ["en" if i % 2 else "fr" for i in range(n)],
            "source": ["s"] * n,
            "n_chars": pd.array([7 + 13 * (i % 11) for i in range(n)], dtype="int64"),
        }
    )


def _py_priority_sample(docs: pd.DataFrame, k: int, seed: str = "prio"):
    rows = []
    for i, t in zip(docs["doc_id"], docs["text"]):
        w = float(max(len(t), 1))
        u = (_key48(str(i), seed) + 1.0) / 281474976710656.0
        rows.append((i, w, w / u))
    rows.sort(key=lambda r: (-r[2], r[0]))
    top1 = rows[: k + 1]
    tau = top1[-1][2] if len(rows) > k else 0.0
    samp = top1[:k]
    est_total = 0.0
    out = []
    for rk, (i, w, q) in enumerate(samp, start=1):
        ew = max(w, tau)
        est_total += ew
        out.append((rk, i, w, q, ew))
    exact_total = float(sum(max(len(t), 1) for t in docs["text"]))
    return out, est_total, exact_total


def _trunc6(x: float) -> float:
    import math

    return math.floor(x * 1_000_000) / 1_000_000


def test_priority_sample_planted_python_replication():
    from storage_crawler_spark.operators.sampling import gen_priority_sample

    docs = _prio_docs(40)
    k = 8
    got = _duck(gen_priority_sample(DUCK, k=k), documents=docs)
    exp, est_total, exact_total = _py_priority_sample(docs, k)
    assert list(got["sample_rank"]) == [r[0] for r in exp]
    assert list(got["doc_id"]) == [r[1] for r in exp]
    assert list(got["w"]) == [int(r[2]) for r in exp]
    assert list(got["priority"]) == [_trunc6(r[3]) for r in exp]
    assert list(got["est_weight"]) == [_trunc6(r[4]) for r in exp]
    assert got["est_total"][0] == _trunc6(est_total)
    assert got["exact_total"][0] == int(exact_total)
    assert got["rel_err"][0] == _trunc6((est_total - exact_total) / exact_total)
    # saturated draw: tau > 0 must have lifted at least one light item
    assert any(g > w for g, w in zip(got["est_weight"], got["w"]))


def test_priority_sample_unsaturated_exact():
    from storage_crawler_spark.operators.sampling import gen_priority_sample

    docs = _prio_docs(5)  # n < k -> tau = 0, estimator degenerates to exact
    got = _duck(gen_priority_sample(DUCK, k=8), documents=docs)
    assert len(got["doc_id"]) == 5
    assert list(got["est_weight"]) == [float(w) for w in got["w"]]
    assert got["est_total"][0] == float(got["exact_total"][0])
    assert got["rel_err"][0] == 0.0


# ---------------------------------------------------------------------------
# pipeline_epoch_plan: hand-derived water-filling on a planted corpus with
# three cap tiers, plus the infeasible (all caps saturated) regime.
# ---------------------------------------------------------------------------


def _epoch_docs() -> pd.DataFrame:
    rows = []
    # clean: 4 unique docs of 10 tokens -> dr 1.0, cap 4, t = 40
    for i in range(4):
        rows.append((i, " ".join([f"c{i}w{j}" for j in range(10)]), "clean"))
    # dupey: 8 docs, 2 distinct texts -> dr 0.25, cap 2, t = 80
    for i in range(8):
        rows.append((10 + i, " ".join([f"d{i % 2}w{j}" for j in range(10)]), "dupey"))
    # spam: 10 docs, 1 distinct text -> dr 0.1, cap 1, t = 100
    for i in range(10):
        rows.append((30 + i, " ".join([f"sw{j}" for j in range(10)]), "spam"))
    return pd.DataFrame(
        {
            "doc_id": pd.array([r[0] for r in rows], dtype="int64"),
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[2] for r in rows],
            "n_chars": pd.array([len(r[1]) for r in rows], dtype="int64"),
        }
    )


def test_epoch_plan_planted_water_filling():
    from storage_crawler_spark.operators.pipeline import gen_epoch_plan

    got = _duck(gen_epoch_plan(DUCK, epochs_target=2), documents=_epoch_docs())
    rows = {
        s: (cap, e, a, l, f)
        for s, cap, e, a, l, f in zip(
            got["source"], got["repeat_cap"], got["epochs"],
            got["alloc_tokens"], got["lambda_mult"], got["feasible"],
        )
    }
    # T = 220, B = 440.  Caps: spam 1 (t=100), dupey 2 (t=80), clean 4 (t=40).
    # Prefix {1}: lam = (440 - 100) / 120 = 2.8333... >= 1, <= 2?  No (> 2).
    # Prefix {1,2}: lam = (440 - 100 - 160) / 40 = 4.5 >= 2 but > next cap 4 -> invalid.
    # Infeasible?  tc_all = 100 + 160 + 160 = 420 < 440 -> feasible = 0,
    # lam = max cap 4, epochs = cap everywhere.
    assert got["budget_tokens"][0] == 440
    assert rows == {
        "spam": (1, 1.0, 100.0, 4.0, 0),
        "dupey": (2, 2.0, 160.0, 4.0, 0),
        "clean": (4, 4.0, 160.0, 4.0, 0),
    }


def test_epoch_plan_planted_interior_lambda():
    from storage_crawler_spark.operators.pipeline import gen_epoch_plan

    docs = _epoch_docs()
    # double the clean source (8 unique docs, t = 80): T = 260, B = 520,
    # tc_all = 100 + 160 + 320 = 580 >= B -> feasible.
    # Prefix {}: lam = 520/260 = 2.0 <= min cap 1?  No.
    # Prefix {1}: lam = (520-100)/160 = 2.625 in [1, 2]?  No.
    # Prefix {1,2}: lam = (520-100-160)/80 = 3.25 in [2, 4]?  Yes.
    extra = pd.DataFrame(
        {
            "doc_id": pd.array([100 + i for i in range(4)], dtype="int64"),
            "text": [" ".join([f"e{i}w{j}" for j in range(10)]) for i in range(4)],
            "lang": ["en"] * 4,
            "source": ["clean"] * 4,
            "n_chars": pd.array([99] * 4, dtype="int64"),
        }
    )
    got = _duck(
        gen_epoch_plan(DUCK, epochs_target=2),
        documents=pd.concat([docs, extra], ignore_index=True),
    )
    rows = {
        s: (cap, e, a, l, f)
        for s, cap, e, a, l, f in zip(
            got["source"], got["repeat_cap"], got["epochs"],
            got["alloc_tokens"], got["lambda_mult"], got["feasible"],
        )
    }
    assert rows == {
        "spam": (1, 1.0, 100.0, 3.25, 1),
        "dupey": (2, 2.0, 160.0, 3.25, 1),
        "clean": (4, 3.25, 260.0, 3.25, 1),
    }
    # allocation conservation: sum alloc == budget exactly
    assert sum(rows[s][2] for s in rows) == 520.0


# ---------------------------------------------------------------------------
# text_encoding_audit: planted defect corpus — hand-counted replacement /
# mojibake / control occurrences, tab/LF/CR exempt, NULL text counted clean.
# ---------------------------------------------------------------------------


def _enc_docs() -> pd.DataFrame:
    texts = [
        "perfectly clean text",          # clean
        "lost � bytes �� here",  # 3 replacement chars
        "cafÃ© and â€™ quote",  # moji: 1x 'Ã©' + 1x 'â€'
        "bin\x01ary\x02 spill\x1f but tab\tand\nnewline ok",  # 3 control
        None,                            # NULL text -> clean, 0 occurrences
        "double hit Ã¼ and Ã¤",  # moji: 'Ã¼' + 'Ã¤'
    ]
    return pd.DataFrame(
        {
            "doc_id": pd.array(range(len(texts)), dtype="int64"),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["a", "a", "b", "b", "c", "b"],
            "n_chars": pd.array(
                [len(t) if t else 0 for t in texts], dtype="int64"
            ),
        }
    )


def test_encoding_audit_planted_counts():
    from storage_crawler_spark.operators.text import gen_encoding_audit

    got = _duck(gen_encoding_audit(DUCK), documents=_enc_docs())
    rows = {
        s: tuple(got[c][i] for c in (
            "n_docs", "docs_replacement", "docs_mojibake", "docs_control",
            "total_replacement", "total_mojibake", "total_control",
            "clean_ratio",
        ))
        for i, s in enumerate(got["source"])
    }
    assert rows == {
        "a": (2, 1, 0, 0, 3, 0, 0, 0.5),
        "b": (3, 0, 2, 1, 0, 4, 3, 0.0),
        "c": (1, 0, 0, 0, 0, 0, 0, 1.0),
    }


def test_encoding_audit_spark_parity_planted(spark, tmp_path):
    from storage_crawler_spark.operators.text import gen_encoding_audit
    from storage_crawler_spark.plans import registry

    sf = str(tmp_path / "encdocs")
    import os

    os.makedirs(sf, exist_ok=True)
    _enc_docs().to_parquet(f"{sf}/documents.parquet", index=False)
    spec = registry.get_query("text_encoding_audit")
    got = {
        r["source"]: (r["total_replacement"], r["total_mojibake"],
                      r["total_control"], r["clean_ratio"])
        for r in spec.builder(spark, sf).collect()
    }
    assert got == {
        "a": (3, 0, 0, 0.5),
        "b": (0, 4, 3, 0.0),
        "c": (0, 0, 0, 1.0),
    }


# ---------------------------------------------------------------------------
# ingest_domain_caps: planted url relation via the url_rel hook — cap
# binding, URL dedup (min-doc representative), md5-frozen pick order
# replicated independently in Python; plus the full-chain collapse corpus.
# ---------------------------------------------------------------------------


def _caps_urls() -> pd.DataFrame:
    rows = [
        # big.example.com: 5 distinct canonical URLs (cap 3 must bind),
        # /a fetched twice (doc 11 and 10 -> keep_doc 10)
        ("big.example.com", "https://big.example.com/a", 11),
        ("big.example.com", "https://big.example.com/a", 10),
        ("big.example.com", "https://big.example.com/b", 12),
        ("big.example.com", "https://big.example.com/c", 13),
        ("big.example.com", "https://big.example.com/d", 14),
        ("big.example.com", "https://big.example.com/e", 15),
        # tiny.example.com: 2 URLs, under the cap
        ("tiny.example.com", "https://tiny.example.com/x", 20),
        ("tiny.example.com", "https://tiny.example.com/y", 21),
    ]
    return pd.DataFrame(
        {
            "domain": [r[0] for r in rows],
            "curl": [r[1] for r in rows],
            "doc_id": pd.array([r[2] for r in rows], dtype="int64"),
        }
    )


def test_domain_caps_planted_rank_replication():
    from storage_crawler_spark.operators import urls

    got = _duck(urls.gen_domain_caps(DUCK, cap=3, url_rel="myurls"),
                myurls=_caps_urls())
    # independent rank replication: md5('domcap' || curl) first 12 hex
    big = sorted(
        ["https://big.example.com/" + p for p in "abcde"],
        key=lambda c: (_key48(c, "domcap"), c),
    )[:3]
    rows = list(zip(got["domain"], got["curl"], got["keep_doc"],
                    got["pick_order"], got["n_urls"], got["n_dropped"]))
    keep_doc = {"https://big.example.com/" + p: d
                for p, d in zip("abcde", (10, 12, 13, 14, 15))}
    # ('a' appears twice, docs 11 and 10 — the dedup keeps min doc 10)
    tiny = sorted(["https://tiny.example.com/x", "https://tiny.example.com/y"],
                  key=lambda c: (_key48(c, "domcap"), c))
    tiny_doc = {"https://tiny.example.com/x": 20, "https://tiny.example.com/y": 21}
    assert rows == [
        ("big.example.com", big[0], keep_doc[big[0]], 1, 5, 2),
        ("big.example.com", big[1], keep_doc[big[1]], 2, 5, 2),
        ("big.example.com", big[2], keep_doc[big[2]], 3, 5, 2),
        ("tiny.example.com", tiny[0], tiny_doc[tiny[0]], 1, 2, 0),
        ("tiny.example.com", tiny[1], tiny_doc[tiny[1]], 2, 2, 0),
    ]


def test_domain_caps_full_chain_collapse():
    """Through the real canonicalizer: _url_docs's alpha section collapses
    ids {0,3} and {1,2} into 2 canonical URLs — under the cap, nothing
    dropped, keep_doc is the min id of each collapse class."""
    from storage_crawler_spark.operators import urls

    from tests.test_round11_additions import _url_docs

    got = _duck(urls.gen_domain_caps(DUCK, cap=3), documents=_url_docs())
    per_dom = {}
    for d, c, k, po, n, dr in zip(got["domain"], got["curl"], got["keep_doc"],
                                  got["pick_order"], got["n_urls"],
                                  got["n_dropped"]):
        per_dom.setdefault(d, []).append((k, n, dr))
    assert sorted(k for k, n, dr in per_dom["alpha.example.com"]) == [0, 1]
    assert all(n == 2 and dr == 0 for k, n, dr in per_dom["alpha.example.com"])


# ---------------------------------------------------------------------------
# ingest_recrawl_priority: planted fetch sequences via the url_rel hook —
# all four tiers, the flapping A->B->A page (2 changes, 2 versions: the
# transition statistic, not the version count), integer tier boundaries.
# ---------------------------------------------------------------------------


def test_recrawl_priority_planted_tiers():
    from storage_crawler_spark.operators import urls

    seqs = {
        # flapping: A B A -> 2 changes over 2 intervals -> ratio 1.0 hot
        "https://h.example.com/flap": ["A", "B", "A"],
        # stable: B B B -> 0 changes -> cold
        "https://h.example.com/stable": ["B", "B", "B"],
        # boundary hot: 1 change over 2 intervals (2*1 >= 2) -> hot
        "https://h.example.com/edge": ["A", "A", "B"],
        # warm: 1 change over 9 intervals (2 < 9, 10 >= 9) -> warm
        "https://h.example.com/slow": ["A"] * 5 + ["B"] * 5,
        # single fetch -> unknown
        "https://h.example.com/once": ["A"],
    }
    u_rows, d_rows, nid = [], [], 0
    for curl, texts in seqs.items():
        for t in texts:
            u_rows.append(("h.example.com", curl, nid))
            d_rows.append((nid, t))
            nid += 1
    u = pd.DataFrame(
        {
            "domain": [r[0] for r in u_rows],
            "curl": [r[1] for r in u_rows],
            "doc_id": pd.array([r[2] for r in u_rows], dtype="int64"),
        }
    )
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([r[0] for r in d_rows], dtype="int64"),
            "text": [r[1] for r in d_rows],
            "lang": ["en"] * len(d_rows),
            "source": ["s"] * len(d_rows),
            "n_chars": pd.array([1] * len(d_rows), dtype="int64"),
        }
    )
    got = _duck(urls.gen_recrawl_priority(DUCK, url_rel="myurls"),
                myurls=u, documents=docs)
    rows = {
        c: (nf, nc, r, t)
        for c, nf, nc, r, t in zip(got["curl"], got["n_fetches"],
                                   got["n_changes"], got["change_ratio"],
                                   got["tier"])
    }
    assert rows["https://h.example.com/flap"] == (3, 2, 1.0, "hot")
    assert rows["https://h.example.com/stable"] == (3, 0, 0.0, "cold")
    assert rows["https://h.example.com/edge"] == (3, 1, 0.5, "hot")
    assert rows["https://h.example.com/slow"] == (10, 1, 0.111111, "warm")
    nf, nc, r, t = rows["https://h.example.com/once"]
    assert (nf, nc, t) == (1, 0, "unknown") and (r is None or r != r)


# ---------------------------------------------------------------------------
# lake_column_stats: planted lineitem with NULLs, duplicate values, and a
# known shipdate span — every cell hand-derivable.
# ---------------------------------------------------------------------------


def test_column_stats_planted():
    from storage_crawler_spark.sources.lake import gen_column_stats

    li = pd.DataFrame(
        {
            "l_orderkey": pd.array([1, 1, 2, 3], dtype="int64"),
            "l_partkey": pd.array([10, 20, 10, None], dtype="Int64"),
            "l_suppkey": pd.array([5, 5, 5, 5], dtype="int64"),
            "l_linenumber": pd.array([1, 2, 1, 1], dtype="int32"),
            "l_quantity": [1.0, 2.0, 2.0, 8.0],
            "l_extendedprice": [100.0, 200.0, 300.0, 400.0],
            "l_discount": [0.0, 0.1, 0.1, 0.0],
            "l_tax": [0.02, 0.02, 0.02, 0.02],
            "l_returnflag": ["A", "R", None, "N"],
            "l_linestatus": ["F", "O", "F", "O"],
            "l_shipdate": pd.to_datetime(
                ["1996-01-01", "1996-01-01", "1997-06-15", None]
            ),
        }
    )
    got = _duck(gen_column_stats(DUCK), lineitem=li)
    rows = {
        c: (nc, nf, ndv, mn, mx, ms, xs, w)
        for c, nc, nf, ndv, mn, mx, ms, xs, w in zip(
            got["col_name"], got["null_count"], got["null_frac"], got["ndv"],
            got["min_num"], got["max_num"], got["min_str"], got["max_str"],
            got["avg_width"],
        )
    }
    assert got["n_rows"][0] == 4
    assert rows["l_orderkey"] == (0, 0.0, 3, 1.0, 3.0, None, None, 8.0)
    assert rows["l_partkey"] == (1, 0.25, 2, 10.0, 20.0, None, None, 8.0)
    assert rows["l_suppkey"] == (0, 0.0, 1, 5.0, 5.0, None, None, 8.0)
    assert rows["l_linenumber"] == (0, 0.0, 2, 1.0, 2.0, None, None, 4.0)
    assert rows["l_quantity"] == (0, 0.0, 3, 1.0, 8.0, None, None, 8.0)
    assert rows["l_returnflag"] == (1, 0.25, 3, None, None, "A", "R", 1.0)
    assert rows["l_linestatus"] == (0, 0.0, 2, None, None, "F", "O", 1.0)
    # shipdate: epoch seconds of 1996-01-01 / 1997-06-15, one NULL
    import datetime as dt

    lo = dt.datetime(1996, 1, 1, tzinfo=dt.timezone.utc).timestamp()
    hi = dt.datetime(1997, 6, 15, tzinfo=dt.timezone.utc).timestamp()
    assert rows["l_shipdate"] == (1, 0.25, 2, lo, hi, None, None, 8.0)


# ---------------------------------------------------------------------------
# sim_knn_link_predict: planted graph via the edges_rel hook — hand-derived
# common-neighbour counts, Jaccard-as-integer-degree-sum tie-break order.
# ---------------------------------------------------------------------------


def test_link_predict_planted_graph():
    from storage_crawler_spark.operators.cluster import gen_knn_link_predict

    und = [(1, 2), (2, 3), (3, 4), (1, 4), (2, 4), (4, 5)]
    both = und + [(b, a) for a, b in und]
    e = pd.DataFrame(
        {
            "a": pd.array([p[0] for p in both], dtype="int64"),
            "b": pd.array([p[1] for p in both], dtype="int64"),
        }
    )
    got = _duck(gen_knn_link_predict(DUCK, k=10, edges_rel="myedges"),
                myedges=e)
    rows = list(zip(got["x"], got["y"], got["common_n"],
                    got["deg_x"], got["deg_y"], got["jaccard"]))
    # (1,3): common {2,4}, both deg 2 -> jaccard 1.0 leads.
    # cn=1 group ordered by INTEGER degree sum then (x, y):
    # (1,5) sum 3, (3,5) sum 3, (2,5) sum 4.
    assert rows == [
        (1, 3, 2, 2, 2, 1.0),
        (1, 5, 1, 2, 1, 0.5),
        (3, 5, 1, 2, 1, 0.5),
        (2, 5, 1, 3, 1, 0.333333),
    ]


# ---------------------------------------------------------------------------
# sketch_ams_f2: independent Python replication of the md5 sign derivation,
# the exact integer register sums, and the median-of-means / mean readouts.
# ---------------------------------------------------------------------------


def test_ams_f2_planted_python_replication():
    import math
    from collections import Counter, defaultdict

    from storage_crawler_spark.operators.sketches import AMS_B, AMS_G, gen_ams_f2

    rows = []
    eid = 0
    # skewed type: one heavy user -> F2 far above n; uniform type beside it
    for u, n in [(1, 6), (2, 1), (3, 1)]:
        for _ in range(n):
            rows.append((eid, "heavy", u)); eid += 1
    for u in range(10, 18):
        rows.append((eid, "flat", u)); eid += 1
    ev = pd.DataFrame(
        {
            "event_id": pd.array([r[0] for r in rows], dtype="int64"),
            "ts": pd.to_datetime(["2024-01-01"] * len(rows)),
            "user_id": pd.array([r[2] for r in rows], dtype="int64"),
            "event_type": [r[1] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    got = _duck(gen_ams_f2(DUCK), events=ev)

    def py_est(users: dict):
        zs = defaultdict(int)
        for u, fu in users.items():
            for g in range(AMS_G):
                h = _key48(f"{g}|{u}", "ams")
                for b in range(AMS_B):
                    zs[(g, b)] += (1 if (h >> b) & 1 else -1) * fu
        gsum = sorted(sum(zs[(g, b)] ** 2 for b in range(AMS_B)) for g in range(AMS_G))
        med = gsum[AMS_G // 2]
        mean = sum(gsum)
        return (
            math.floor(med / AMS_B * 1e6) / 1e6,
            math.floor(mean / (AMS_G * AMS_B) * 1e6) / 1e6,
        )

    exp = {"heavy": ({1: 6, 2: 1, 3: 1}, 38), "flat": ({u: 1 for u in range(10, 18)}, 8)}
    byt = {
        t: (ne, nu, f2x, e, m)
        for t, ne, nu, f2x, e, m in zip(
            got["event_type"], got["n_events"], got["n_users"],
            got["f2_exact"], got["f2_est"], got["f2_est_mean"],
        )
    }
    for t, (users, f2_exact) in exp.items():
        est, est_mean = py_est(users)
        ne, nu, f2x, e, m = byt[t]
        assert (ne, nu) == (sum(users.values()), len(users))
        assert f2x == f2_exact
        assert e == est and m == est_mean


# ---------------------------------------------------------------------------
# report_du_forecast: hand-derived OLS on a planted ingest history, plus the
# single-bucket NULL-guard root.
# ---------------------------------------------------------------------------


def test_du_forecast_planted_ols():
    from storage_crawler_spark.plans.dialect import DUCK
    from storage_crawler_spark.reports.usage import gen_du_forecast

    rows = [
        # /data: buckets 0,1,2 add 100,100,400 -> y = 100,200,600, x = 0,1,2
        # n=3 sx=3 sy=900 sxy=1400 sxx=5 -> slope (4200-2700)/6 = 250
        # horizon = 600 * 6 / 1500 = 2.4
        ("/data/a", 0, 60),   ("/data/b", 0, 40),
        ("/data/c", 60, 100),
        ("/data/d", 120, 400),
        # /solo: one bucket -> NULL slope and horizon
        ("/solo/x", 300, 77),
    ]
    f = pd.DataFrame(
        {
            "path": [r[0] for r in rows],
            "insert_epoch": pd.array([r[1] for r in rows], dtype="int64"),
            "st_size": pd.array([r[2] for r in rows], dtype="int64"),
        }
    )
    got = _duck(gen_du_forecast(DUCK, interval_s=60, src="my_files"), my_files=f)
    by = {
        r: (n, c, s, h)
        for r, n, c, s, h in zip(got["root"], got["n_buckets"], got["cur_bytes"],
                                 got["slope_bytes_per_interval"],
                                 got["intervals_to_double"])
    }
    assert by["data"] == (3, 600, 250.0, 2.4)
    assert by["solo"][0:2] == (1, 77) and by["solo"][2] is None and by["solo"][3] is None


# ---------------------------------------------------------------------------
# sim_ivf_recall_curve: planted store where the bucket structure makes the
# whole curve hand-derivable (in-bucket vs out-of-bucket neighbours).
# ---------------------------------------------------------------------------


def test_ivf_recall_curve_planted():
    import numpy as np
    import pyarrow as pa

    from storage_crawler_spark.operators.similarity import gen_ivf_recall_curve

    # dim 4, nbits=4 sign bucket over all components.  Query = [1,1,1,1]
    # (bucket 1111).  In-bucket: three progressively-rotated positives.
    # Out-of-bucket: one vector CLOSER than every in-bucket one (first
    # component negative -> different bucket) — the recall killer.
    # a one-negative-component vector's cosine against q caps at
    # cos = 3/(2*sqrt(3)) = 0.866 (at x1 -> 0-), so the in-bucket vectors
    # are chosen BELOW that cap to make the out-of-bucket neighbour rank 1
    vecs = [
        [1.0, 1.0, 1.0, 1.0],           # 0 query (bucket 1111)
        [-0.015625, 1.0, 1.0, 1.0],     # 1 out-of-bucket, cos ~ 0.8616 (rank 1)
        [1.0, 1.0, 0.25, 0.125],        # 2 in-bucket, cos ~ 0.8237
        [1.0, 0.5, 0.25, 0.125],        # 3 in-bucket, cos ~ 0.809
        [1.0, 0.25, 0.125, 0.0625],     # 4 in-bucket, cos ~ 0.689
        [-1.0, -1.0, -1.0, -1.0],       # 5 antipode, out-of-bucket, rank last
    ]
    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    q = vecs[0]
    ranked = sorted(range(1, 6), key=lambda i: (-math.floor(cos(q, vecs[i]) * 1e6), i))
    in_bucket = {i for i in range(1, 6) if all(c >= 0 for c in vecs[i])}
    iv_ranked = [i for i in ranked if i in in_bucket]
    table = pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array([np.array(v, dtype=np.float32) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 6, pa.int32()),
    })
    got = _duck(gen_ivf_recall_curve(DUCK, ks=(1, 2, 5)),
                embeddings=table.to_pandas())
    by = {k: (ne, nh, r) for k, ne, nh, r in zip(got["k"], got["n_exact"],
                                                 got["n_hits"], got["recall"])}
    # hand-derive expected hits per k
    for k in (1, 2, 5):
        ex_k = set(ranked[:k]); iv_k = set(iv_ranked[:k])
        hits = len(ex_k & iv_k)
        n_exact = min(k, 5)
        assert by[k][0] == n_exact and by[k][1] == hits, (k, by[k], ranked, iv_ranked)
        assert abs(by[k][2] - hits / n_exact) < 1e-6
    # the planted out-of-bucket near-neighbour must actually cost recall@1
    assert ranked[0] == 1 and by[1][1] == 0
