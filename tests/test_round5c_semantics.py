"""Semantic fixtures for the round-5 third-pass operators — hand-computed
or independently-computed expectations, beyond the Spark-vs-DuckDB parity
the randomized batteries already enforce.

- label cohesion: the sum-vector identity must equal the brute-force mean
  pairwise cosine computed in numpy;
- windowed funnel: completion inside vs outside the step window;
- stickiness: alternating-week activity gives WAU < MAU;
- compaction plan: running-sum bins can overshoot by at most one file;
- int8 quantization: zero vectors error-free, well-scaled vectors bounded.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from storage_crawler_spark.operators import analytics, similarity
from storage_crawler_spark.plans.dialect import DUCK
from storage_crawler_spark.plans import views as V
from storage_crawler_spark.sources.lake import gen_compaction_plan


def _duck(sql: str, **views: pd.DataFrame):
    con = duckdb.connect()
    for name, df in views.items():
        con.register(name, df)
    return con.execute(sql).fetch_arrow_table().to_pydict()


def test_label_cohesion_matches_bruteforce():
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(9, 6)).astype(np.float64)
    emb = pd.DataFrame(
        {
            "vec_id": range(9),
            "embedding": [v.astype(np.float32) for v in vecs],
            "label": [i % 2 for i in range(9)],
        }
    )
    got = _duck(similarity.gen_label_cohesion(DUCK), embeddings=emb)
    for label in (0, 1):
        sub = vecs[[i for i in range(9) if i % 2 == label]].astype(np.float32).astype(np.float64)
        unit = sub / np.linalg.norm(sub, axis=1, keepdims=True)
        sims = unit @ unit.T
        n = len(sub)
        brute = (sims.sum() - n) / (n * (n - 1))
        idx = got["label"].index(label)
        assert got["mean_pairwise_cos"][idx] == pytest.approx(brute, abs=2e-6)


def test_funnel_window_boundary():
    base = 1_700_000_000
    w = 6 * 3600
    rows = [
        # user 0: full conversion, each step exactly AT the window edge
        (0, base, 0, "signup", 1.0, "{}"),
        (1, base + w, 0, "click", 1.0, "{}"),
        (2, base + 2 * w, 0, "purchase", 1.0, "{}"),
        # user 1: click one second past the window -> stops at step 1
        (3, base, 1, "signup", 1.0, "{}"),
        (4, base + w + 1, 1, "click", 1.0, "{}"),
        # user 2: click before signup only -> stops at step 1
        (5, base + 100, 2, "click", 1.0, "{}"),
        (6, base + 200, 2, "signup", 1.0, "{}"),
    ]
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = pd.to_datetime(ev["ts"], unit="s")
    got = _duck(analytics.gen_funnel_conversion(DUCK), events=ev)
    assert got["users"] == [3, 1, 1]  # signup x3; click in-window x1; purchase x1


def test_stickiness_alternating_weeks():
    base = 1_700_000_000
    wk = analytics.SECONDS_PER_WEEK
    rows = []
    eid = 0
    # user 0 active weeks 0..3; user 1 only week 0 and week 2
    for w, users in enumerate(([0, 1], [0], [0, 1], [0])):
        for u in users:
            rows.append((eid, base + w * wk + 60, u, "click", 1.0, "{}"))
            eid += 1
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev["ts"] = pd.to_datetime(ev["ts"], unit="s")
    got = _duck(analytics.gen_stickiness(DUCK), events=ev)
    # week 3 (last): WAU = 1 (user 0), trailing-4 MAU = 2 (user 1 active wk 2)
    assert got["wau"][-1] == 1 and got["mau"][-1] == 2
    assert got["stickiness"][-1] == 0.5


def test_compaction_bins_overshoot_by_at_most_one_file():
    docs = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": ["x" for _ in range(40)],
            "lang": ["en"] * 40,
            "source": [f"src{i % 3}" for i in range(40)],
            "n_chars": [((i * 37) % 900) + 50 for i in range(40)],
        }
    )
    target = 8 << 20
    sql = V.with_files_cte(gen_compaction_plan(DUCK, target_bytes=target))
    got = _duck(sql, documents=docs)
    # each file is n_chars*4096 <= ~3.9 MB; a bin closes only once the
    # running sum crosses target, so total <= target + max single file
    max_file = max(docs.n_chars) * 4096
    for b in got["total_bytes"]:
        assert b <= target + max_file
    # bins within a root are dense from 0
    root_bins: dict[str, list[int]] = {}
    for r, b in zip(got["root"], got["bin_id"]):
        root_bins.setdefault(r, []).append(b)
    for r, bins in root_bins.items():
        assert sorted(bins) == list(range(len(bins))), (r, bins)


def test_int8_quant_zero_and_bounded():
    emb = pd.DataFrame(
        {
            "vec_id": [0, 1, 2],
            "embedding": [
                np.zeros(8, dtype=np.float32),
                np.linspace(-1, 1, 8).astype(np.float32),
                (np.ones(8) * 0.5).astype(np.float32),
            ],
            "label": [0, 0, 1],
        }
    )
    got = _duck(similarity.gen_int8_quant_audit(DUCK), embeddings=emb)
    # label 0 holds the zero vector (err 0) and a ramp; relative error of
    # symmetric int8 on well-scaled data is < 1% energy
    for rel in got["max_rel_err"]:
        assert rel < 0.01
