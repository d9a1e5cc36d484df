"""Round-9 fixtures: regressions for the ADVICE items (license-scan '(c)'
cross-engine parity, phrase-search vocab-contract validation, IVM delta-only
sources, PCA overflow guard) and the flattened inverted-index posting head."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from storage_crawler_spark.operators import text
from storage_crawler_spark.plans.dialect import DUCK, SPARK


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
# license scan: the '(c)' copyright form must match in BOTH engines
# (round-8 escape-based pattern silently lost the group in Spark literals)
# ---------------------------------------------------------------------------

_C_FORM_DOCS = [
    "copyright (c) 2024 someone",   # the most common real-world form
    "Copyright 2019 Anyone",        # bare-year form
    "copyright (c) no year here",   # (c) but no year -> NOT a match
    "plain text",
]


def test_license_scan_c_form_duck():
    got = _duck(text.gen_license_scan(DUCK), documents=_docs(_C_FORM_DOCS))
    assert got["n_copyright"] == [2]


def test_license_scan_c_form_spark(spark):
    spark.createDataFrame(_docs(_C_FORM_DOCS)).createOrReplaceTempView("documents")
    row = spark.sql(text.gen_license_scan(SPARK)).collect()[0]
    spark.catalog.dropTempView("documents")
    assert row.n_copyright == 2  # Spark RLIKE must agree with DuckDB


# ---------------------------------------------------------------------------
# phrase search: vocab-contract validation (injection-shaped inputs rejected)
# ---------------------------------------------------------------------------


def test_phrase_search_rejects_quotes_and_empty():
    with pytest.raises(ValueError):
        text.gen_phrase_search(DUCK, phrase="o'brien join")
    with pytest.raises(ValueError):
        text.gen_phrase_search(DUCK, phrase="   ")
    with pytest.raises(ValueError):
        text.gen_phrase_search(DUCK, phrase="hash; drop")


def test_phrase_search_normalizes_case_and_space_runs():
    # upper case + double spaces normalize instead of erroring; the
    # resulting SQL matches the plain-phrase form
    docs = ["the hash join wins"]
    got = _duck(
        text.gen_phrase_search(DUCK, phrase="HASH  JOIN"), documents=_docs(docs)
    )
    assert dict(zip(got["doc_id"], got["n_matches"])) == {0: 1}


# ---------------------------------------------------------------------------
# inverted index: posting head is now a flat comma-joined string
# ---------------------------------------------------------------------------


def test_inverted_index_postings_flat_string():
    got = _duck(text.gen_inverted_index(DUCK), documents=_docs(
        ["apple banana", "apple", "apple banana"]
    ))
    idx = dict(zip(got["term"], got["postings_head"]))
    assert idx["apple"] == "0,1,2" and idx["banana"] == "0,2"
    assert all(isinstance(v, str) for v in idx.values())


# ---------------------------------------------------------------------------
# IVM: a source introduced solely by inserts must surface (FULL OUTER fix)
# ---------------------------------------------------------------------------


def test_ivm_delta_only_source_not_dropped():
    from storage_crawler_spark.sources import ingest

    # The CDC batch is deterministic over doc_id (see cdc_change_ctes);
    # rather than re-deriving it, check the structural property the fix
    # guarantees: every source present in EITHER the base or the merged
    # corpus appears in the output, and `consistent` is never NULL.
    docs = _docs(
        ["aaa", "bbb", "ccc", "ddd", "eee", "fff", "ggg", "hhh"],
        sources=["s0", "s1", "s0", "s1", "s2", "s0", "s1", "s2"],
    )
    got = _duck(ingest.gen_ivm_agg(DUCK), documents=docs)
    assert None not in got["consistent"]
    assert all(c == 1 for c in got["consistent"])  # IVM identity holds
    assert set(got["source"]) >= set(docs["source"])


# ---------------------------------------------------------------------------
# round-9 operators: hand-computed semantic fixtures (DuckDB side; the
# registry sweep + oracle gate pin Spark to the same generated SQL)
# ---------------------------------------------------------------------------


def test_chunk_dedup_cross_doc_only_and_short_docs_absent():
    docs = _docs(
        [
            "AAAABBBBCCCC",      # chunks (w=4,s=4): AAAA BBBB CCCC
            "BBBBXXXXAAAA",      # chunks: BBBB XXXX AAAA -> 2 of 3 shared
            "AAAAAAAA",          # AAAA AAAA: within-doc repeat, cross-doc dup
            "tiny",              # len 4 == width -> one chunk, unique
            "abc",               # shorter than width -> absent
            None,
        ]
    )
    got = _duck(text.gen_chunk_dedup(DUCK, width=4, stride=4), documents=docs)
    rows = {d: (n, nd, s) for d, n, nd, s in zip(
        got["doc_id"], got["n_chunks"], got["n_dup_chunks"], got["dup_share"])}
    assert rows[0] == (3, 2, 0.666666)   # AAAA+BBBB shared, CCCC not
    assert rows[1] == (3, 2, 0.666666)
    assert rows[2] == (2, 2, 1.0)        # both AAAA chunks cross-doc dup
    assert rows[3] == (1, 0, 0.0)
    assert 4 not in rows and 5 not in rows


def test_chunk_dedup_within_doc_repeat_is_not_cross_doc():
    got = _duck(text.gen_chunk_dedup(DUCK, width=4, stride=4),
                documents=_docs(["ZZZZZZZZZZZZ"]))  # 3 x ZZZZ, one doc only
    assert got["n_dup_chunks"] == [0]


def test_head_tail_overlap_direction_and_df_cap():
    docs = _docs(
        [
            "a b c d e f",       # tail 'd e f'
            "d e f g h i",       # head 'd e f' -> (0 -> 1)
            "x y z d e f",       # tail 'd e f' too -> (2 -> 1)
            "q r s t u v",
        ]
    )
    got = _duck(text.gen_head_tail_overlap(DUCK, k=3), documents=docs)
    pairs = set(zip(got["tail_doc"], got["head_doc"]))
    assert pairs == {(0, 1), (2, 1)}     # direction: tail_doc chains INTO head_doc
    # df cap: make 'd e f' head 21 docs -> all pruned
    many = _docs(["a b c d e f"] + ["d e f g h i"] * 21)
    got2 = _duck(text.gen_head_tail_overlap(DUCK, k=3, max_df=20), documents=many)
    assert got2["tail_doc"] == []


def test_head_tail_short_docs_emit_nothing():
    # 5 tokens < 2k=6: head/tail would overlap in-doc; excluded
    got = _duck(text.gen_head_tail_overlap(DUCK, k=3),
                documents=_docs(["a b c a b", "a b c x y z"]))
    assert got["tail_doc"] == []


def test_pmi_prefers_exclusive_pairs():
    import math

    # 'x y' always together (c_xy=4, c_x=c_y=4); 'a b' diluted (a also
    # precedes c).  N = 16 bigrams total.
    docs = _docs(["x y a b a c"] * 4)
    got = _duck(text.gen_pmi_pairs(DUCK, min_count=1, top_k=10), documents=docs)
    rows = {(p, c): (n, pmi) for p, c, n, _, _, pmi in zip(
        got["prev"], got["cur"], got["c_xy"], got["c_x"], got["c_y"], got["pmi"])}
    # PMI(x,y) = ln(4*20 / (4*4)) = ln(5);  20 bigrams: 5 per doc x 4 docs
    assert rows[("x", "y")][1] == pytest.approx(math.floor(math.log(5) * 1e6) / 1e6)
    # exclusive pair outranks the diluted one
    assert got["prev"][0] == "x" and got["cur"][0] == "y"
    assert rows[("a", "b")][1] < rows[("x", "y")][1]


def _events_df(rows):
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
    pdf["user_id"] = pd.array(pdf["user_id"], dtype="Int64")
    return pdf


def test_funnel_strict_order_and_window():
    from storage_crawler_spark.operators import analytics

    T = 1_700_000_000
    rows = [
        # user 1: full funnel inside windows
        (0, T + 0, 1, "view", 1.0, "{}"),
        (1, T + 100, 1, "click", 1.0, "{}"),
        (2, T + 200, 1, "purchase", 1.0, "{}"),
        # user 2: click BEFORE first view -> stalls at step 1
        (3, T + 100, 2, "click", 1.0, "{}"),
        (4, T + 200, 2, "view", 1.0, "{}"),
        # user 3: click outside the window
        (5, T + 0, 3, "view", 1.0, "{}"),
        (6, T + 5000, 3, "click", 1.0, "{}"),
        # user 4: purchase only -> not even step 1
        (7, T + 0, 4, "purchase", 1.0, "{}"),
    ]
    got = _duck(
        analytics.gen_funnel_steps(DUCK, max_lag_s=1000), events=_events_df(rows)
    )
    assert (got["n_step1"][0], got["n_step2"][0], got["n_step3"][0]) == (3, 1, 1)
    assert got["conv_1_2"][0] == pytest.approx(0.333333)


def test_funnel_same_instant_does_not_chain():
    from storage_crawler_spark.operators import analytics

    T = 1_700_000_000
    rows = [
        (0, T, 1, "view", 1.0, "{}"),
        (1, T, 1, "click", 1.0, "{}"),  # same second: es > t1 is strict
    ]
    got = _duck(analytics.gen_funnel_steps(DUCK), events=_events_df(rows))
    assert (got["n_step1"][0], got["n_step2"][0]) == (1, 0)


def test_type_triangles_min_support_and_single_materialization():
    from storage_crawler_spark.operators import analytics

    T = 1_700_000_000
    rows = []
    eid = 0
    # users 1-3 do a+b+c (triangle support 3); user 4 does a+d only
    for u in (1, 2, 3):
        for t in ("a", "b", "c"):
            rows.append((eid, T + eid, u, t, 1.0, "{}")); eid += 1
    for t in ("a", "d"):
        rows.append((eid, T + eid, 4, t, 1.0, "{}")); eid += 1
    got = _duck(
        analytics.gen_type_triangles(DUCK, min_users=3), events=_events_df(rows)
    )
    tris = list(zip(got["node_a"], got["node_b"], got["node_c"]))
    assert tris == [("a", "b", "c")]     # once, in node order; a-d edge below support
    assert got["support_ab"] == [3] and got["support_ac"] == [3]


def test_benford_digit_extraction_integer_side():
    from storage_crawler_spark.operators import analytics

    T = 1_700_000_000
    vals = [1.0, 19.5, 0.02, 925.0, 0.0, -5.0, None, 0.0000001]
    rows = [(i, T + i, 1, "view", v, "{}") for i, v in enumerate(vals)]
    got = _duck(analytics.gen_benford_audit(DUCK), events=_events_df(rows))
    by_digit = dict(zip(got["digit"], got["n"]))
    # 1.0 and 19.5 -> digit 1; 0.02 -> 2; 925.0 -> 9; zero/negative/NULL and
    # sub-1e-6 excluded
    assert by_digit == {1: 2, 2: 1, 9: 1}
    exp1 = next(e for d, e in zip(got["digit"], got["benford_share"]) if d == 1)
    assert exp1 == pytest.approx(0.301029)  # trunc6(log10 2)


def test_burst_windows_z_threshold_exact_moments():
    from storage_crawler_spark.operators import analytics

    T = 1_700_000_000 - 1_700_000_000 % 3600  # hour-aligned
    rows = []
    eid = 0
    # type 'a': nine 1-count hours + one 11-count hour
    for h in range(9):
        rows.append((eid, T + h * 3600, 1, "a", 1.0, "{}")); eid += 1
    for _ in range(11):
        rows.append((eid, T + 9 * 3600, 1, "a", 1.0, "{}")); eid += 1
    got = _duck(analytics.gen_burst_windows(DUCK, z_hi=2.0), events=_events_df(rows))
    # mean = 2, var = (9*1 + 121)/10 - 4 = 9, sigma = 3, z(11) = 3 > 2
    assert got["event_type"] == ["a"]
    assert got["n"] == [11]
    assert got["zscore"] == [3.0]


def test_retention_cohorts_decay_and_uncohorted_users():
    from storage_crawler_spark.operators import analytics

    W = 604800
    rows = [
        # cohort week 0: users 1,2 sign up; user 1 active weeks 0,1,2;
        # user 2 active weeks 0,2 only
        (0, 0 * W + 10, 1, "signup", 1.0, "{}"),
        (1, 0 * W + 20, 2, "signup", 1.0, "{}"),
        (2, 1 * W + 10, 1, "view", 1.0, "{}"),
        (3, 2 * W + 10, 1, "view", 1.0, "{}"),
        (4, 2 * W + 20, 2, "click", 1.0, "{}"),
        # user 3 never signs up -> uncohorted, contributes nothing
        (5, 0 * W + 30, 3, "view", 1.0, "{}"),
        # user 1 activity BEFORE its signup week cannot exist here (wk >=
        # cwk filter) — signup defines week 0
    ]
    got = _duck(analytics.gen_retention_cohorts(DUCK), events=_events_df(rows))
    cells = {
        (c, o): (n, nc, r)
        for c, o, n, nc, r in zip(
            got["cohort_week"], got["week_offset"], got["n_active"],
            got["n_cohort"], got["retention"],
        )
    }
    ks = {k[1] for k in cells}
    assert ks == {0, 1, 2}
    (c0,) = {k[0] for k in cells}
    assert cells[(c0, 0)] == (2, 2, 1.0)   # signup week: everyone active
    assert cells[(c0, 1)] == (1, 2, 0.5)   # only user 1
    assert cells[(c0, 2)] == (2, 2, 1.0)   # both return


def test_bloom_semijoin_no_false_negatives_and_exact_count():
    from storage_crawler_spark.operators import sketches

    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4, 5],
            "o_custkey": [1] * 5,
            "o_orderstatus": ["O"] * 5,
            "o_totalprice": [1.0] * 5,
            "o_orderdate": ["1998-01-01"] * 5,
            "o_orderpriority": ["1-URGENT", "1-URGENT", "3-MEDIUM", "3-MEDIUM", "1-URGENT"],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 3, 4, 5, 9, 10],
            "l_linenumber": [1, 2, 1, 1, 1, 1, 1, 1],
        }
    )
    got = _duck(sketches.gen_bloom_semijoin(DUCK), orders=orders, lineitem=lineitem)
    row = {k: v[0] for k, v in got.items()}
    assert row["n_build"] == 3                    # keys 1,2,5
    assert row["n_probe"] == 8
    assert row["n_exact"] == 4                    # rows with keys 1,1,2,5
    # STRUCTURAL contract: a Bloom filter never misses a true key
    assert row["n_bloom_pass"] >= row["n_exact"]
    assert row["n_false_pos"] == row["n_bloom_pass"] - row["n_exact"]
    # 9 bits max set for 3 keys x 3 hashes in 32768 bits -> fp ~ 0
    assert row["n_false_pos"] == 0


def test_depth_profile_counts_and_top_segment():
    from storage_crawler_spark.reports import usage

    files = pd.DataFrame(
        {
            "path": ["/data/a/x.txt", "/data/a/b/y.txt", "/archive/z.dat"],
            "st_size": [10, 20, 30],
        }
    )
    got = _duck(usage.gen_depth_profile(DUCK), files=files)
    rows = {
        (t, d): (n, b)
        for t, d, n, b in zip(
            got["top_dir"], got["depth"], got["n_entries"], got["total_bytes"]
        )
    }
    assert rows == {
        ("archive", 2): (1, 30),
        ("data", 3): (1, 10),
        ("data", 4): (1, 20),
    }


def test_crosslingual_dups_unordered_pair_and_null_lang():
    from storage_crawler_spark.operators import similarity

    # vecs 0/1 identical (cos 1) with langs en/fr; vec 2 orthogonal; vec 3
    # duplicates vec 0 but its doc has NULL lang -> its pairs are excluded
    emb = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "embedding": [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 0.0]],
            "label": [0, 0, 0, 0],
        }
    )
    docs = _docs(["a", "b", "c", "d"], langs=["fr", "en", "en", None])
    got = _duck(similarity.gen_crosslingual_dups(DUCK), embeddings=emb, documents=docs)
    assert list(zip(got["lang_a"], got["lang_b"], got["n_pairs"])) == [("en", "fr", 1)]
    assert got["mean_cosine"] == [1.0]   # lattice-exact


def test_batch_knn_gemm_matches_oracle_bitwise(spark):
    """The GEMM builder's int64 matmul path must equal the oracle's
    per-pair SQL folds EXACTLY (integer lattice — no float tolerance)."""
    import duckdb as _duck_mod

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from storage_crawler_spark.operators import similarity

    rng = np.random.default_rng(12)
    n, dim = 60, 8
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs[7] = vecs[0]  # exact duplicate -> dot tie broken by vec_id
    import tempfile, os as _os

    with tempfile.TemporaryDirectory() as td:
        path = _os.path.join(td, "embeddings.parquet")
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
                    "label": pa.array([0] * n, pa.int32()),
                }
            ),
            path,
        )
        spark.read.parquet(path).createOrReplaceTempView("embeddings")
        try:
            got = [
                tuple(r)
                for r in similarity.batch_knn_gemm(spark, query_ids=(0, 3), k=4).collect()
            ]
            con = _duck_mod.connect()
            con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
            want = con.execute(
                similarity.gen_batch_knn_oracle(DUCK, query_ids=(0, 3), k=4)
            ).fetchall()
            assert got == [tuple(r) for r in want]
        finally:
            spark.catalog.dropTempView("embeddings")


def test_lang_mix_entropy_and_evidence_floor():
    from storage_crawler_spark.operators import text as t

    import math

    docs = _docs(
        [
            "the cat and der hund und die katze",  # en markers: the, and (2); de: der, und, die (3)
            "the the the of of",                   # pure en, 5 markers
            "xyz qrs tuv",                         # zero markers -> NULL entropy
            "the",                                 # 1 marker < floor -> NULL entropy
        ]
    )
    got = _duck(t.gen_lang_mix(DUCK, min_markers=3), documents=docs)
    rows = {d: r for d, r in zip(got["doc_id"], zip(
        got["n_markers"], got["n_langs"], got["lang_entropy"], got["mixed"]))}
    # doc 0: en=2, de=3 -> H = -(2/5)ln(2/5) - (3/5)ln(3/5)
    h = -(2 / 5) * math.log(2 / 5) - (3 / 5) * math.log(3 / 5)
    assert rows[0][0] == 5 and rows[0][1] == 2 and rows[0][3] == 1
    assert rows[0][2] == pytest.approx(math.floor(h * 1e6) / 1e6)
    assert rows[1] == (5, 1, 0.0, 0)          # pure -> entropy 0, not mixed
    assert rows[2][2] is None and rows[2][3] == 0
    assert rows[3][2] is None and rows[3][3] == 0


def test_decontaminate_short_train_docs_kept():
    from storage_crawler_spark.operators import pipeline as pl
    from storage_crawler_spark.operators.sampling import split_bucket_expr, split_case_expr

    # find doc ids for each split under the real md5 assignment, then plant
    # a 5-gram leak from one eval doc into one train doc
    probe = _docs(["x"] * 64)
    got = _duck(
        f"SELECT doc_id, {split_case_expr(split_bucket_expr(DUCK))} AS split "
        f"FROM documents",
        documents=probe,
    )
    by_split = {}
    for d, s in zip(got["doc_id"], got["split"]):
        by_split.setdefault(s, []).append(d)
    tr, ev = by_split["train"][:3], by_split["val"][0]
    texts = [None] * 64
    leak = "alpha beta gamma delta epsilon"
    texts[tr[0]] = leak + " tail words here"       # leaked train doc
    texts[tr[1]] = "clean train doc with words aplenty ok"  # clean
    texts[tr[2]] = "tiny"                          # < 5 tokens: cannot leak, kept
    texts[ev] = leak + " something else"
    for i in range(64):
        if texts[i] is None:
            texts[i] = f"filler{i}"                # 1 token: no grams
    docs = _docs(texts)
    got2 = _duck(pl.gen_decontaminate_apply(DUCK), documents=docs)
    total = {
        "n_train": sum(got2["n_train"]),
        "n_dropped": sum(got2["n_dropped"]),
        "n_kept": sum(got2["n_kept"]),
    }
    assert total["n_train"] == len(by_split["train"])
    assert total["n_dropped"] == 1                 # exactly the planted leak
    assert total["n_kept"] == total["n_train"] - 1


def test_attribution_exact_micro_accounting():
    from storage_crawler_spark.operators import analytics

    T = 1_700_000_000
    rows = [
        # user 1: clicks on channels 0 and 1, then purchase 10.5
        (0, T + 0, 1, "click", 1.0, '{"k": 0}'),
        (1, T + 50, 1, "click", 1.0, '{"k": 1}'),   # latest -> last-touch + remainder
        (2, T + 100, 1, "purchase", 10.5, "{}"),
        # user 2: purchase with no clicks in window -> unattributed
        (3, T + 0, 2, "purchase", 5.0, "{}"),
        # user 3: click AFTER purchase -> not credited
        (4, T + 10, 3, "purchase", 3.0, "{}"),
        (5, T + 20, 3, "click", 1.0, '{"k": 2}'),
    ]
    got = _duck(analytics.gen_attribution_credit(DUCK), events=_events_df(rows))
    by_ch = {c: (lt, lin) for c, lt, lin in zip(
        got["channel"], got["last_touch_credit_micro"], got["linear_credit_micro"])}
    vm = int(10.5 * 1e6)
    # linear: floor(vm/2) each, remainder (0) to latest; last-touch: all to ch 1
    assert by_ch[0] == (0, vm // 2)
    assert by_ch[1] == (vm, vm - vm // 2)
    assert 2 not in by_ch                      # post-purchase click never credited
    # conservation: linear credits sum exactly to the attributed value
    assert sum(lin for _, lin in by_ch.values()) == vm


def test_attribution_remainder_to_latest_click():
    from storage_crawler_spark.operators import analytics

    T = 1_700_000_000
    rows = [
        (0, T + 0, 1, "click", 1.0, '{"k": 0}'),
        (1, T + 1, 1, "click", 1.0, '{"k": 0}'),
        (2, T + 2, 1, "click", 1.0, '{"k": 1}'),   # latest
        (3, T + 9, 1, "purchase", 0.00001, "{}"),  # vm = 10 micro, 10 = 3*3 + 1
    ]
    got = _duck(analytics.gen_attribution_credit(DUCK), events=_events_df(rows))
    by_ch = dict(zip(got["channel"], got["linear_credit_micro"]))
    assert by_ch == {0: 6, 1: 4}               # 3+3, 3+1 remainder to latest


def test_audio_features_spark_decode_matches_closed_form(spark):
    """The WAV parse (RIFF scan + numpy int16) must recover EXACTLY the
    closed-form PCM the oracle re-derives relationally."""
    import duckdb as _ddb

    from storage_crawler_spark.operators import multimodal

    docs = _docs(["x"] * 7)
    spark.createDataFrame(docs).createOrReplaceTempView("documents")
    try:
        got = [
            tuple(r)
            for r in multimodal.audio_features(
                multimodal.synth_audio(spark.table("documents"))
            ).orderBy("doc_id", "frame_no").collect()
        ]
    finally:
        spark.catalog.dropTempView("documents")
    con = _ddb.connect()
    con.register("documents", docs)
    want = con.execute(multimodal.gen_audio_features_oracle(DUCK)).fetchall()
    assert got == [tuple(r) for r in want]
    assert len(got) == 7 * 4                   # 256 samples / 64-frame = 4 frames


# ---------------------------------------------------------------------------
# lattice k-means: hand-computed fit semantics (the oracle-gated iteration)
# ---------------------------------------------------------------------------


def _emb(vecs, labels=None):
    return pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": vecs,
            "label": labels or [0] * len(vecs),
        }
    )


def test_kmeans_lattice_two_planted_clusters():
    from storage_crawler_spark.operators import kmeans as km

    Q = km.KM_Q
    # two tight 1-D clusters around 1.0 and 3.0; k=2 init = vecs 0,1 (one
    # in each cluster), so one iteration already lands the exact means
    vecs = [[1.0], [3.0], [1.5], [3.5], [1.25], [3.25]]
    got = _duck(km.gen_kmeans_lattice(DUCK, k=2, iters=2), embeddings=_emb(vecs))
    rows = {(c, d): (v, n) for c, d, v, n in zip(
        got["cid"], got["dim"], got["c"], got["n_assigned"])}
    # cluster 0 <- {1.0, 1.5, 1.25}: mean lattice = (sum of floors) // 3
    c0 = (int(1.0 * Q) + int(1.5 * Q) + int(1.25 * Q)) // 3
    c1 = (int(3.0 * Q) + int(3.5 * Q) + int(3.25 * Q)) // 3
    assert rows[(0, 1)] == (c0, 3)
    assert rows[(1, 1)] == (c1, 3)


def test_kmeans_lattice_empty_cluster_keeps_previous_centroid():
    from storage_crawler_spark.operators import kmeans as km

    # vec 1's init centroid is immediately orphaned (every point nearer
    # vec 0's): cluster 1 must keep its INIT centroid, not vanish
    vecs = [[0.0], [10.0], [0.1], [0.2]]
    # all points are nearer 0 than 10 except vec 1 itself... vec 1 IS at
    # 10 so it stays its own cluster; use a truly orphaned seed instead:
    vecs = [[0.0], [0.4], [0.1], [0.2]]
    # init c0=0.0, c1=0.4; iter1: 0.0,0.1,0.2 -> c0; 0.4 -> c1 (not
    # orphaned either).  Orphan properly: duplicate seeds.
    vecs = [[0.0], [0.0], [1.0], [2.0]]
    # init c0=c1=0.0; ties break to cid 0, so the iteration-1 UPDATE sees
    # nothing in cluster 1 and must RETAIN its init centroid (lattice 0) —
    # without retention the cluster would vanish.  n_assigned reports the
    # partition the TRAINED model induces (the a_fin re-assignment): c0
    # moved to the global mean 0.75, so the two zero vectors now fall to
    # the retained c1 — retention is precisely what lets them.
    got = _duck(km.gen_kmeans_lattice(DUCK, k=2, iters=1), embeddings=_emb(vecs))
    rows = {(c, d): (v, n) for c, d, v, n in zip(
        got["cid"], got["dim"], got["c"], got["n_assigned"])}
    assert rows[(1, 1)] == (0, 2)        # centroid kept at 0; re-captures zeros
    assert rows[(0, 1)] == ((0 + 0 + 65536 + 131072) // 4, 2)


def test_kmeans_lattice_spark_loop_matches_oracle(spark):
    import duckdb as _ddb

    from storage_crawler_spark.operators import kmeans as km

    vecs = [[float(i % 5), float((i * 3) % 7)] for i in range(30)]
    emb = _emb(vecs)
    spark.createDataFrame(emb).createOrReplaceTempView("embeddings")
    try:
        got = [tuple(r) for r in km.kmeans_lattice_artifact(spark, k=4, iters=3).collect()]
    finally:
        spark.catalog.dropTempView("embeddings")
    con = _ddb.connect()
    con.register("embeddings", emb)
    want = con.execute(km.gen_kmeans_lattice(DUCK, k=4, iters=3)).fetchall()
    assert got == [tuple(r) for r in want]


def test_ivf_lattice_nprobe_full_is_exact_bruteforce():
    from storage_crawler_spark.operators import kmeans as km

    vecs = [[float(i), float(10 - i)] for i in range(12)]
    emb = _emb(vecs)
    got = _duck(
        km.gen_ivf_lattice_topk(DUCK, 0, 5, nprobe=4, k=4, iters=2), embeddings=emb
    )
    # nprobe = k probes every cell: result must equal the exact integer-dot
    # brute force over all other vectors
    Q = km.KM_Q
    qs = [int(v * Q) for v in vecs[0]]
    dots = sorted(
        (-(sum(int(u * Q) * w for u, w in zip(v, qs))), i)
        for i, v in enumerate(vecs) if i != 0
    )[:5]
    assert list(got["vec_id"]) == [i for _, i in dots]


# ---------------------------------------------------------------------------
# lattice PQ: compressed-tier semantics (oracle-gated train/encode/ADC)
# ---------------------------------------------------------------------------


def test_pq_lattice_perfect_recall_when_codebook_covers_points():
    from storage_crawler_spark.operators import pq

    # m=2 (dsub=1), ksub=4, and the four SEED vectors carry four DISTINCT
    # coordinates in each subspace: every coordinate in the store sits
    # exactly on a centroid (the 5th vector reuses seed coordinates), so
    # codes reproduce vectors exactly and the ADC ranking equals the
    # exact ranking (recall 1.0)
    vecs = [[0.0, 3.0], [1.0, 2.0], [2.0, 1.0], [3.0, 0.0], [1.0, 1.0]]
    emb = pd.DataFrame(
        {"vec_id": range(5), "embedding": vecs, "label": [0] * 5}
    )
    got = _duck(
        pq.gen_pq_lattice_recall(DUCK, 0, 3, m=2, ksub=4, iters=3), embeddings=emb
    )
    assert got["n_hits"] == [3] and got["recall"] == [1.0]


def test_pq_lattice_spark_matches_oracle_bitwise(spark):
    import duckdb as _ddb

    from storage_crawler_spark.operators import pq

    vecs = [[float((i * 3) % 7), float(i % 5), float((i * 2) % 3), float(i % 4)]
            for i in range(24)]
    emb = pd.DataFrame({"vec_id": range(24), "embedding": vecs, "label": [0] * 24})
    spark.createDataFrame(emb).createOrReplaceTempView("embeddings")
    try:
        got = [
            tuple(r)
            for r in pq.pq_lattice_topk(spark, 0, 6, m=2, ksub=4, iters=2).collect()
        ]
    finally:
        spark.catalog.dropTempView("embeddings")
    con = _ddb.connect()
    con.register("embeddings", emb)
    want = con.execute(pq.gen_pq_lattice_topk(DUCK, 0, 6, m=2, ksub=4, iters=2)).fetchall()
    assert got == [tuple(r) for r in want]


def test_pq_lattice_estimate_is_sum_of_subspace_cells():
    from storage_crawler_spark.operators import pq

    # with ksub=1 every vector gets code 0 in both subspaces: est_d2 for
    # every vector = dist(q_sub, centroid_sub) summed — one shared value
    vecs = [[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]]
    emb = pd.DataFrame({"vec_id": range(3), "embedding": vecs, "label": [0] * 3})
    got = _duck(
        pq.gen_pq_lattice_topk(DUCK, 0, 3, m=2, ksub=1, iters=1), embeddings=emb
    )
    assert len(set(got["est_d2"])) == 1   # all collapse to the same cell sum


# ---------------------------------------------------------------------------
# lattice logistic regression (the last rows-only entry, retired): the
# 12-step integer fit is bit-identical across engines, the conjunction
# margin reproduces the rule exactly, and the learned model beats the
# majority class on the real corpus
# ---------------------------------------------------------------------------


def test_lrl_conjunction_margin_equals_rule():
    """y = 1 ⟺ mm >= 0 by construction — the feature that makes the
    conjunctive rule linearly separable; verified on docs straddling each
    clause boundary (stop-ratio, distinct-ratio, both band edges)."""
    from storage_crawler_spark.operators import logreg as lr

    texts = [
        "the " * 50,                       # stops high, distinct ~0 -> drop
        " ".join(f"w{i}" for i in range(50)),   # no stopwords -> drop
        ("the and of " + " ".join(f"w{i}" for i in range(20))),  # keep
        "short doc",                        # n=2 < 10 -> drop (band)
        ("the of " + " ".join(f"w{i}" for i in range(300))),     # n>200 -> drop
    ]
    got = _duck(
        "WITH x AS (" + lr.lrl_feature_sql(DUCK) + ") SELECT doc_id, mm, y FROM x ORDER BY doc_id",
        documents=_docs(texts),
    )
    for mm, y in zip(got["mm"], got["y"]):
        assert (mm >= 0) == (y == 1)
    assert got["y"] == [0, 0, 1, 0, 0]


def test_lrl_spark_loop_matches_oracle_bitwise(spark):
    from storage_crawler_spark.operators import logreg as lr

    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in lr.quality_learned_lattice_report(spark, sf).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(lr.gen_quality_learned_lattice(DUCK)).fetchall()
    assert got == [tuple(r) for r in want]
    assert len(got) > 0


def test_lrl_agreement_beats_majority_class():
    from storage_crawler_spark.operators import logreg as lr

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    rows = con.execute(lr.gen_quality_learned_lattice(DUCK)).fetchall()
    n = sum(r[1] for r in rows)
    rule_keep = sum(r[3] for r in rows)
    agree = sum(r[4] for r in rows)
    majority = max(rule_keep, n - rule_keep)
    assert agree >= majority, (agree, majority, n)


def test_lrl_weight_columns_constant_and_fit_deterministic():
    from storage_crawler_spark.operators import logreg as lr

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    a = con.execute(lr.gen_quality_learned_lattice(DUCK)).fetchall()
    b = con.execute(lr.gen_quality_learned_lattice(DUCK)).fetchall()
    assert a == b
    # the five weight columns are the same fit artifact on every row
    for col in range(6, 11):
        assert len({r[col] for r in a}) == 1


def test_lrl_empty_corpus_zero_weights_empty_report():
    from storage_crawler_spark.operators import logreg as lr

    got = _duck(
        lr.gen_quality_learned_lattice(DUCK),
        documents=_docs([]).astype(
            {"doc_id": "int64", "text": "object", "lang": "object",
             "source": "object", "n_chars": "int64"}
        ),
    )
    assert got["source"] == []


# ---------------------------------------------------------------------------
# SemDeDup on the lattice quantizer: planted duplicates surface, distant
# vectors don't, and the keeper convention holds
# ---------------------------------------------------------------------------


def test_semantic_dedup_planted_duplicates():
    from storage_crawler_spark.operators import kmeans as km

    # two tight duplicate groups far apart + one isolated vector
    vecs = [
        [0.0, 0.0], [0.001, 0.0], [0.0, 0.001],      # group A (ids 0,1,2)
        [5.0, 5.0], [5.001, 5.0],                     # group B (ids 3,4)
        [-6.0, 7.0],                                  # isolated (id 5)
    ]
    emb = pd.DataFrame({"vec_id": range(6), "embedding": vecs, "label": [0, 0, 1, 2, 2, 3]})
    got = _duck(km.gen_semantic_dedup(DUCK, k=3, iters=2, thr=100_000), embeddings=emb)
    pairs = set(zip(got["keep_id"], got["drop_id"]))
    assert pairs == {(0, 1), (0, 2), (1, 2), (3, 4)}
    # keeper is always the lower id; same_label marks the (0,1) and (3,4) pairs
    assert all(a < b for a, b in pairs)
    by_pair = dict(zip(zip(got["keep_id"], got["drop_id"]), got["same_label"]))
    assert by_pair[(0, 1)] == 1 and by_pair[(0, 2)] == 0 and by_pair[(3, 4)] == 1


def test_semantic_dedup_spark_matches_oracle_bitwise(spark):
    from storage_crawler_spark.plans import views as V
    from storage_crawler_spark.operators import kmeans as km

    sf = "/root/testdata/sf0.001"
    V.register_base_tables(spark, sf, ("embeddings",))
    got = [tuple(r) for r in km.semantic_dedup(spark, sf).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    want = con.execute(km.gen_semantic_dedup(DUCK)).fetchall()
    assert got == [tuple(r) for r in want]
    assert len(got) > 0


# ---------------------------------------------------------------------------
# PII scan: every pattern's positive path (random corpora carry no PII —
# the license-scan '(c)' blind-spot lesson applies to spans too)
# ---------------------------------------------------------------------------

_PII_DOCS = [
    "contact me at jane.doe+spam@example.co.uk or 555-867-5309",
    "server at 10.0.0.1 and 192.168.001.200 responded",
    "ssn 123-45-6789 leaked with phone 800-555-1234",
    "clean document with no sensitive spans at all",
    None,
    "double email a@b.io c@d.net",
]
_PII_SRC = ["s0", "s0", "s1", "s1", "s1", "s2"]


def test_pii_scan_span_counts_and_redaction_budget():
    got = _duck(
        text.gen_pii_scan(DUCK), documents=_docs(_PII_DOCS, sources=_PII_SRC)
    )
    rows = {
        s: (e, p, i4, ssn, fl, rc)
        for s, e, p, i4, ssn, fl, rc in zip(
            got["source"], got["n_email"], got["n_phone"], got["n_ipv4"],
            got["n_ssn"], got["n_flagged"], got["redact_chars"],
        )
    }
    assert rows["s0"] == (1, 1, 2, 0, 2, 62)
    # SSN shape must NOT also count as a phone; the dashed phone beside it does
    assert rows["s1"] == (0, 1, 0, 1, 1, 23)
    # multiple emails in one doc all count; redact budget = 6 + 7 chars
    assert rows["s2"] == (2, 0, 0, 0, 1, 13)


def test_pii_scan_planted_spans_cross_engine(spark):
    docs = _docs(_PII_DOCS, sources=_PII_SRC)
    spark.createDataFrame(docs).createOrReplaceTempView("documents")
    try:
        got = [tuple(r) for r in spark.sql(text.gen_pii_scan(SPARK)).collect()]
    finally:
        spark.catalog.dropTempView("documents")
    want = _duck(text.gen_pii_scan(DUCK), documents=docs)
    want_rows = list(zip(*[want[c] for c in want]))
    assert sorted(got) == sorted(want_rows)


# ---------------------------------------------------------------------------
# DSIR importance weights: targetlike raw docs score higher, LM state is
# bucket-bounded, and the no-target degenerate case stays finite
# ---------------------------------------------------------------------------


def test_dsir_targetlike_docs_outweigh_divergent_docs():
    from storage_crawler_spark.operators.pipeline import gen_dsir_weights

    target = ["alpha beta gamma delta"] * 6           # the target LM
    raw_like = ["alpha beta gamma delta"] * 2         # raw, looks like target
    raw_far = ["zeta eta theta iota"] * 2             # raw, disjoint vocab
    docs = _docs(
        target + raw_like + raw_far,
        langs=["en"] * 6 + ["de"] * 4,
        sources=["t"] * 6 + ["like"] * 2 + ["far"] * 2,
    )
    got = _duck(gen_dsir_weights(DUCK), documents=docs)
    w = dict(zip(got["doc_id"], got["mean_llr"]))
    by_src = dict(zip(got["doc_id"], got["source"]))
    likes = [w[i] for i in w if by_src[i] == "like"]
    fars = [w[i] for i in w if by_src[i] == "far"]
    assert len(likes) == 2 and len(fars) == 2
    assert min(likes) > max(fars)
    # only RAW docs appear (the 6 target docs are the LM, not the corpus)
    assert len(w) == 4


def test_dsir_no_target_slice_stays_finite():
    from storage_crawler_spark.operators.pipeline import gen_dsir_weights

    docs = _docs(["some words here"] * 3, langs=["de", "fr", None])
    got = _duck(gen_dsir_weights(DUCK), documents=docs)
    assert len(got["doc_id"]) == 3
    assert all(v is not None for v in got["mean_llr"])


# ---------------------------------------------------------------------------
# bipartite label propagation: planted blocks recover, alternating
# schedule is oscillation-free, NULL endpoints drop
# ---------------------------------------------------------------------------


def _events_us_df(rows):
    import pandas as pd

    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).astype({"ts": "datetime64[us]"})


def test_lpa_planted_blocks_recover_two_communities():
    from storage_crawler_spark.operators.analytics import gen_lpa_communities

    # block A: users 1-3 hit only types a1/a2; block B: users 4-6 only b1/b2
    import pandas as pd

    rows = []
    eid = 0
    for u in (1, 2, 3):
        for t in ("a1", "a2"):
            for _ in range(3):
                rows.append((eid, pd.Timestamp("2024-01-01"), u, t, 1.0, None)); eid += 1
    for u in (4, 5, 6):
        for t in ("b1", "b2"):
            for _ in range(3):
                rows.append((eid, pd.Timestamp("2024-01-01"), u, t, 1.0, None)); eid += 1
    # NULL endpoints must be excluded, not crash or form a community
    rows.append((eid, pd.Timestamp("2024-01-01"), None, "a1", 1.0, None)); eid += 1
    rows.append((eid, pd.Timestamp("2024-01-01"), 1, None, 1.0, None))
    got = _duck(gen_lpa_communities(DUCK), events=_events_us_df(rows))
    # exactly two communities, each 3 users + 2 types, disjoint blocks
    assert len(got["community"]) == 2
    assert sorted(zip(got["n_users"], got["n_types"])) == [(3, 2), (3, 2)]
    # internal weight = all 18 events of the block (6 pairs x 3 events)
    assert sorted(got["w_internal"]) == [18, 18]


def test_lpa_more_sweeps_deterministic_and_coarsening_bounded():
    from storage_crawler_spark.operators.analytics import gen_lpa_communities
    import pandas as pd

    rows = []
    eid = 0
    for u in range(1, 7):
        for t in ("x", "y", "z"):
            for _ in range((u + len(t)) % 3 + 1):
                rows.append((eid, pd.Timestamp("2024-01-01"), u, t, 1.0, None)); eid += 1
    ev = _events_us_df(rows)
    one = _duck(gen_lpa_communities(DUCK, sweeps=1), events=ev)
    two = _duck(gen_lpa_communities(DUCK, sweeps=2), events=ev)
    again = _duck(gen_lpa_communities(DUCK, sweeps=2), events=ev)
    assert two == again  # fixed-sweep chain is deterministic
    # every node appears exactly once at any sweep depth
    assert sum(one["n_users"]) == 6 and sum(one["n_types"]) == 3
    assert sum(two["n_users"]) == 6 and sum(two["n_types"]) == 3
    # coarsening only merges: community count never increases with depth
    assert len(two["community"]) <= len(one["community"])


def test_dsir_rejects_injection_shaped_target_lang():
    from storage_crawler_spark.operators.pipeline import gen_dsir_weights

    for bad in ("en' OR '1'='1", "", "a b", "x" * 9):
        with pytest.raises(ValueError):
            gen_dsir_weights(DUCK, target_lang=bad)
    with pytest.raises(ValueError):
        gen_dsir_weights(DUCK, buckets=1)


# ---------------------------------------------------------------------------
# SCD2 history: gaps-and-islands validity intervals over per-user state
# ---------------------------------------------------------------------------


def _events_sec_df(rows):
    """Events fixture with ts given in epoch SECONDS (the module has two
    earlier `_events_df` helpers with different ts units; this one is
    explicit and owned by the SCD2 tests)."""
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
    pdf["user_id"] = pd.array(pdf["user_id"], dtype="Int64")
    return pdf


def test_scd2_planted_runs():
    from storage_crawler_spark.operators import analytics

    T = 1_700_000_000
    rows = [
        # user 1: A,A,B,A -> three intervals, last open
        (0, T + 0, 1, "A", 1.0, "{}"),
        (1, T + 10, 1, "A", 1.0, "{}"),
        (2, T + 20, 1, "B", 1.0, "{}"),
        (3, T + 30, 1, "A", 1.0, "{}"),
        # user 2: single event -> one open interval
        (4, T + 5, 2, "C", 1.0, "{}"),
        # NULL user / NULL type rows are excluded entirely
        (5, T + 6, None, "A", 1.0, "{}"),
        (6, T + 7, 3, None, 1.0, "{}"),
    ]
    got = _duck(analytics.gen_scd2_history(DUCK), events=_events_sec_df(rows))
    assert got["user_id"] == [1, 1, 1, 2]
    assert got["state"] == ["A", "B", "A", "C"]
    assert got["valid_from_s"] == [T + 0, T + 20, T + 30, T + 5]
    assert got["valid_to_s"] == [T + 20, T + 30, None, None]
    assert got["last_seen_s"] == [T + 10, T + 20, T + 30, T + 5]
    assert got["n_events"] == [2, 1, 1, 1]
    assert got["is_current"] == [0, 0, 1, 1]


def test_scd2_intervals_tile_per_user():
    """valid_to of interval i equals valid_from of interval i+1 (no gaps,
    no overlaps), and exactly one open interval per user."""
    from storage_crawler_spark.operators import analytics

    T = 1_700_000_000
    rows = [
        (i, T + 37 * i, i % 3, "t" + str((i * 7) % 4), float(i), "{}")
        for i in range(60)
    ]
    got = _duck(analytics.gen_scd2_history(DUCK), events=_events_sec_df(rows))
    by_user: dict = {}
    for u, vf, vt, cur in zip(
        got["user_id"], got["valid_from_s"], got["valid_to_s"], got["is_current"]
    ):
        by_user.setdefault(u, []).append((vf, vt, cur))
    for u, ivs in by_user.items():
        assert sum(c for _, _, c in ivs) == 1
        assert ivs[-1][1] is None and ivs[-1][2] == 1
        for (f1, t1, _), (f2, _, _) in zip(ivs, ivs[1:]):
            assert t1 == f2 and f1 < f2


def test_scd2_spark_matches_oracle_bitwise(spark):
    from storage_crawler_spark.operators import analytics

    T = 1_700_000_000
    rows = [
        (i, T + 13 * i, (i * 5) % 7, "t" + str((i * 11) % 5), float(i), "{}")
        for i in range(120)
    ]
    pdf = _events_sec_df(rows)
    spark.createDataFrame(pdf).createOrReplaceTempView("events")
    got = spark.sql(analytics.gen_scd2_history(SPARK)).toPandas()
    spark.catalog.dropTempView("events")
    con = duckdb.connect()
    con.register("events", pdf)
    want = con.execute(analytics.gen_scd2_history(DUCK)).fetchdf()
    pd.testing.assert_frame_equal(
        got.astype({"user_id": "int64"}),
        want.astype({"user_id": "int64"}),
        check_dtype=False,
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint: sustained level-shift alarms per event type
# ---------------------------------------------------------------------------


def _hourly_events(counts_by_type, T=1_700_000_000 // 3600 * 3600):
    """Events with exactly counts_by_type[t][b] rows in hour-bucket b."""
    rows, eid = [], 0
    for t, counts in counts_by_type.items():
        for b, n in enumerate(counts):
            for j in range(n):
                rows.append((eid, T + b * 3600 + j * 7, 1, t, 1.0, "{}"))
                eid += 1
    return _events_sec_df(rows), T


def test_cusum_flat_series_never_alarms():
    """Zero variance -> sigma 0 -> nullif guard -> no alarm rows (and no
    divide-by-zero crash on either engine)."""
    from storage_crawler_spark.operators import analytics

    ev, _ = _hourly_events({"A": [10] * 24})
    got = _duck(analytics.gen_cusum_changepoint(DUCK), events=ev)
    assert got["event_type"] == []


def test_cusum_detects_planted_shift_not_preshift():
    from storage_crawler_spark.operators import analytics

    # 30 hours at ~10/h (small alternation so sigma > 0), then 30 at 16/h
    pre = [10, 11] * 15
    post = [16] * 30
    ev, T = _hourly_events({"A": pre + post, "B": [10, 11] * 30})
    got = _duck(analytics.gen_cusum_changepoint(DUCK), events=ev)
    assert set(got["event_type"]) == {"A"}
    shift_s = T + 30 * 3600
    assert all(b >= shift_s for b in got["bucket_start_s"])
    assert len(got["bucket_start_s"]) >= 5
    # cusum is the one-sided statistic: non-negative, and the sigma ratio
    # strictly exceeds the default threshold on every emitted row
    assert all(c >= 0 for c in got["cusum"])
    assert all(r > 5.0 for r in got["cusum_sigmas"])


def test_cusum_closed_form_matches_recursion():
    """P_i - min(0, running-min P) == the textbook max(0, S+dev) recursion,
    on the exact lattice, for a pseudorandom series."""
    from storage_crawler_spark.operators import analytics

    counts = [((i * 2654435761) >> 7) % 9 + 1 for i in range(50)]
    ev, T = _hourly_events({"A": counts})
    got = _duck(analytics.gen_cusum_changepoint(DUCK, h=0.5), events=ev)
    nb, total = len(counts), sum(counts)
    ssq = sum(c * c for c in counts)
    var = (nb * ssq - total * total) / (nb * nb)
    sigma = var**0.5
    s, want = 0, {}
    for b, n in enumerate(counts):
        s = max(0, s + (100 * nb * n - 110 * total))
        cus = s / (100.0 * nb)
        if sigma and cus / sigma > 0.5:
            want[T + b * 3600] = cus
    assert dict(zip(got["bucket_start_s"], got["cusum"])) == {
        k: _trunc6(v) for k, v in want.items()
    }


def _trunc6(x: float) -> float:
    import math

    return math.floor(x * 1_000_000) / 1_000_000


def test_cusum_spark_matches_oracle_bitwise(spark):
    from storage_crawler_spark.operators import analytics

    counts = {"A": [((i * 97) % 13) + 3 for i in range(40)],
              "B": [5, 6] * 10 + [12] * 20}
    ev, _ = _hourly_events(counts)
    spark.createDataFrame(ev).createOrReplaceTempView("events")
    got = spark.sql(analytics.gen_cusum_changepoint(SPARK, h=1.0)).toPandas()
    spark.catalog.dropTempView("events")
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute(analytics.gen_cusum_changepoint(DUCK, h=1.0)).fetchdf()
    assert len(got) >= 1
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# MMR diversity re-rank: greedy lattice selection over the cosine top-pool
# ---------------------------------------------------------------------------


def _emb_df(vecs):
    return pd.DataFrame(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": [None if v is None else [float(x) for x in v] for v in vecs],
            "label": [0] * len(vecs),
        }
    )


def test_mmr_demotes_near_duplicate():
    """A duplicate of the top hit outranks the diverse doc on pure
    relevance but is demoted below it by the MMR marginal."""
    from storage_crawler_spark.operators import similarity

    vecs = [
        [1.0, 0.0],  # 0: query
        [1.0, 0.0],  # 1: top hit (rel 1.0)
        [1.0, 0.0],  # 2: exact duplicate of the top hit (rel 1.0)
        [0.8, 0.6],  # 3: diverse (rel 0.8, sim-to-1 0.8)
    ]
    got = _duck(
        similarity.gen_mmr_rerank(DUCK, pool_n=3, k=3, lam_tenths=4),
        embeddings=_emb_df(vecs),
    )
    # lam=0.4: dup marginal .4*1-.6*1=-0.2 < diverse .4*.8-.6*.8=-0.16
    assert list(zip(got["rank"], got["doc_id"])) == [(1, 1), (2, 3), (3, 2)]
    assert got["relevance"][0] == 1.0 and abs(got["relevance"][1] - 0.8) < 1e-6


def test_mmr_short_pool_and_validation():
    from storage_crawler_spark.operators import similarity

    # pool smaller than k: graceful min(k, |pool|) rows, consecutive ranks
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.5, 0.5]]
    got = _duck(
        similarity.gen_mmr_rerank(DUCK, pool_n=5, k=5, lam_tenths=7),
        embeddings=_emb_df(vecs),
    )
    assert got["rank"] == [1, 2]
    with pytest.raises(ValueError):
        similarity.gen_mmr_rerank(DUCK, lam_tenths=11)
    with pytest.raises(ValueError):
        similarity.gen_mmr_rerank(DUCK, pool_n=4, k=5)
    # zero-norm and NULL embeddings are dropped by the norm guard, not fatal
    got2 = _duck(
        similarity.gen_mmr_rerank(DUCK, pool_n=2, k=2),
        embeddings=_emb_df([[1.0, 0.0], [0.0, 0.0], None, [0.6, 0.8]]),
    )
    assert got2["doc_id"] == [3]


def test_mmr_oracle_chain_equals_shared_greedy():
    """The unrolled selection CTEs reproduce mmr_greedy (the recursion the
    Spark engine path runs) pick-for-pick on a pseudorandom store."""
    import math

    from storage_crawler_spark.operators import similarity

    vecs = [
        [((i * j * 2654435761) >> 9) % 1000 / 1000.0 - 0.5 for j in range(1, 9)]
        for i in range(40)
    ]
    pdf = _emb_df(vecs)
    sql = similarity.gen_mmr_rerank(DUCK, pool_n=12, k=6, lam_tenths=7)
    got = _duck(sql, embeddings=pdf)

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    f32 = {i: [float(pd.Series([x], dtype="float32")[0]) for x in v]
           for i, v in enumerate(vecs)}
    nrm = {i: math.sqrt(dot(v, v)) for i, v in f32.items()}
    q, qn = f32[0], nrm[0]
    cos = {i: dot(v, q) / (nrm[i] * qn) for i, v in f32.items() if i != 0 and nrm[i] > 0}
    pool = sorted(cos, key=lambda i: (-cos[i], i))[:12]
    relq = [(i, math.floor(cos[i] * similarity.MMR_Q)) for i in pool]
    pairs = {
        (a, b): math.floor(dot(f32[a], f32[b]) / (nrm[a] * nrm[b]) * similarity.MMR_Q)
        for a in pool
        for b in pool
        if a != b
    }
    picks = similarity.mmr_greedy(relq, pairs, k=6, lam_tenths=7)
    assert [(r, v) for r, v, _, _ in picks] == list(zip(got["rank"], got["doc_id"]))


def test_mmr_spark_engine_path_matches_oracle(spark, tmp_path):
    from storage_crawler_spark.operators import similarity

    vecs = [
        [((i + 3) * (j + 7) * 40503) % 997 / 997.0 - 0.5 for j in range(6)]
        for i in range(30)
    ]
    pdf = _emb_df(vecs)
    pdf["embedding"] = pdf["embedding"].map(
        lambda v: None if v is None else pd.Series(v, dtype="float32").tolist()
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array(pdf["vec_id"], type=pa.int64()),
            "embedding": pa.array(pdf["embedding"], type=pa.list_(pa.float32())),
            "label": pa.array(pdf["label"], type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    got = similarity.mmr_rerank(spark, str(tmp_path), pool_n=10, k=5).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path}/embeddings.parquet'"
    )
    want = con.execute(
        similarity.gen_mmr_rerank(DUCK, pool_n=10, k=5)
    ).fetchdf()
    assert len(got) == 5
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# kNN-graph k-core: mutual-kNN edges + fixed-round degree peel
# ---------------------------------------------------------------------------


def _sym_edges(pairs):
    """Both-direction edge relation from undirected {a,b} pairs."""
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return pd.DataFrame(rows, columns=["a", "b"])


def test_kcore_clique_survives_chain_peels():
    from storage_crawler_spark.operators import cluster

    clique = [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]
    chain = [(5, 6), (6, 7), (7, 8)]
    got = _duck(
        cluster.gen_knn_kcore(DUCK, kcore=3, rounds=4, edges_rel="pe"),
        pe=_sym_edges(clique + chain),
    )
    assert got["vec_id"] == [1, 2, 3, 4, 5]
    assert got["degree"] == [4, 4, 4, 4, 4]
    assert got["converged"] == [1] * 5


def test_kcore_converged_flag_honest_on_short_peel():
    """A long pendant chain peels one edge-layer per round: too few rounds
    -> converged 0 and interior chain nodes still present; enough rounds
    -> converged 1 and only the triangle remains."""
    from storage_crawler_spark.operators import cluster

    tri = [(1, 2), (2, 3), (1, 3)]
    chain = [(3, 10), (10, 11), (11, 12), (12, 13), (13, 14), (14, 15)]
    ed = _sym_edges(tri + chain)
    sql_short = cluster.gen_knn_kcore(DUCK, kcore=2, rounds=2, edges_rel="pe")
    short = _duck(sql_short, pe=ed)
    assert short["converged"] == [0] * len(short["vec_id"])
    assert 11 in short["vec_id"]  # interior of the chain not yet peeled
    sql_full = cluster.gen_knn_kcore(DUCK, kcore=2, rounds=7, edges_rel="pe")
    full = _duck(sql_full, pe=ed)
    assert full["vec_id"] == [1, 2, 3]
    assert full["converged"] == [1, 1, 1]


def test_knn_edges_mutual_filter_prunes_one_way_links():
    from storage_crawler_spark.operators import cluster

    # one trained cell (k=1, no residual refinement — the mutual filter is
    # what's under test); with m=1: 0<->1 mutual, 2 -> 1 unreciprocated
    # (1 prefers 0), so only edge {0,1} survives
    vecs = [
        [1.0, 0.02, 0.02, 0.02],
        [0.99, 0.14, 0.02, 0.02],
        [0.90, 0.43, 0.02, 0.02],
    ]
    got = _duck(
        "SELECT a, b FROM ("
        + cluster.gen_knn_edges(DUCK, m=1, k=1, res_bits=0)
        + ") x ORDER BY a, b",
        embeddings=_emb_df(vecs),
    )
    assert list(zip(got["a"], got["b"])) == [(0, 1), (1, 0)]


def test_kcore_spark_builder_matches_oracle(spark, tmp_path):
    from storage_crawler_spark.operators import cluster
    from storage_crawler_spark.plans import views as V

    vecs = [
        [((i + 5) * (j + 3) * 48611) % 883 / 883.0 - 0.5 for j in range(8)]
        for i in range(60)
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array(range(60), type=pa.int64()),
            "embedding": pa.array(
                [[float(pd.Series([x], dtype="float32")[0]) for x in v] for v in vecs],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * 60, type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    V.register_base_tables(spark, str(tmp_path), ("embeddings",))
    peeled = spark.sql(cluster.gen_kcore_peeled(SPARK, kcore=3, rounds=5, m=4))
    peeled.persist()
    peeled.createOrReplaceTempView("_kcore_peeled_t")
    got = spark.sql(
        cluster.gen_knn_kcore(SPARK, kcore=3, peeled_rel="_kcore_peeled_t")
    ).toPandas()
    peeled.unpersist()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path}/embeddings.parquet'"
    )
    want = con.execute(
        cluster.gen_knn_kcore(DUCK, kcore=3, rounds=5, m=4)
    ).fetchdf()
    assert len(got) >= 1
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cusum_hc_rel_finish_identical():
    """The hc_rel substitution (streaming twin's finish) is plan-identical
    to the inline bucket aggregation: same alarms from pre-aggregated
    counters as from the raw events."""
    from storage_crawler_spark.operators import analytics

    counts = {"A": [4, 5] * 12 + [11] * 12, "B": [3] * 30}
    ev, T = _hourly_events(counts)
    inline = _duck(analytics.gen_cusum_changepoint(DUCK, h=2.0), events=ev)
    hc = pd.DataFrame(
        [
            (t, T // 3600 + b, n)
            for t, cs in counts.items()
            for b, n in enumerate(cs)
        ],
        columns=["event_type", "hb", "n"],
    )
    via_rel = _duck(
        analytics.gen_cusum_changepoint(DUCK, h=2.0, hc_rel="hcv"), hcv=hc
    )
    assert inline == via_rel and len(inline["event_type"]) >= 1


# ---------------------------------------------------------------------------
# MAD robust outliers: modified z-score per event type
# ---------------------------------------------------------------------------


def test_mad_planted_whale_flagged_mean_robust():
    """One extreme whale is flagged; the median/MAD baseline ignores it
    (unlike mean/sigma, where the whale inflates sigma)."""
    from storage_crawler_spark.operators import analytics

    T = 1_700_000_000
    vals = [10.0, 10.125, 10.25, 10.0, 10.125, 10.25, 10.0, 10.125, 1000.0]
    rows = [(i, T + i, 1, "A", v, "{}") for i, v in enumerate(vals)]
    got = _duck(analytics.gen_mad_outliers(DUCK), events=_events_sec_df(rows))
    assert got["event_id"] == [8]
    assert got["robust_z"][0] > 1000


def test_mad_zero_mad_and_null_guards():
    from storage_crawler_spark.operators import analytics

    T = 1_700_000_000
    rows = [(i, T + i, 1, "C", 5.0, "{}") for i in range(10)]  # constant: MAD 0
    rows += [(20, T, 1, None, 99999.0, "{}"), (21, T, 1, "C", None, "{}")]
    got = _duck(analytics.gen_mad_outliers(DUCK), events=_events_sec_df(rows))
    assert got["event_id"] == []


def test_mad_spark_matches_oracle_bitwise(spark):
    from storage_crawler_spark.operators import analytics

    T = 1_700_000_000
    rows = [
        (i, T + 7 * i, (i * 3) % 5, "t" + str(i % 3),
         (((i * 2654435761) >> 5) % 64) / 8.0 + (200.0 if i % 37 == 0 else 0.0),
         "{}")
        for i in range(200)
    ]
    pdf = _events_sec_df(rows)
    spark.createDataFrame(pdf).createOrReplaceTempView("events")
    got = spark.sql(analytics.gen_mad_outliers(SPARK)).toPandas()
    spark.catalog.dropTempView("events")
    con = duckdb.connect()
    con.register("events", pdf)
    want = con.execute(analytics.gen_mad_outliers(DUCK)).fetchdf()
    assert len(got) >= 1
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# RAKE keywords: stopword-split phrase runs scored by degree/frequency
# ---------------------------------------------------------------------------


def _docs_df(texts):
    return pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) if t else 0 for t in texts],
        }
    )


def test_rake_hand_computed_scores():
    from storage_crawler_spark.operators import text as t

    docs = _docs_df(["x alpha beta x gamma x", "x alpha beta x delta gamma x"])
    got = _duck(t.gen_rake_keywords(DUCK, n_stop=1, top_k=10), documents=docs)
    # stop = {x}; freq: alpha 2, beta 2, gamma 2, delta 1
    # deg: alpha 4, beta 4, gamma 3 (singleton + pair), delta 2
    # scores: alpha beta = 2+2, delta gamma = 2+1.5, gamma = 1.5
    assert got["phrase"] == ["alpha beta", "delta gamma", "gamma"]
    assert got["rake_score"] == [4.0, 3.5, 1.5]
    assert got["n_occurrences"] == [2, 1, 1]
    assert all("x" not in p.split() for p in got["phrase"])


def test_rake_max_len_cap_and_empty_docs():
    from storage_crawler_spark.operators import text as t

    docs = _docs_df(["stop a b c d e stop", None, ""])
    # 'stop' is the most frequent token; the 5-word run exceeds max_len=4
    # and is dropped entirely (documented cap), leaving nothing
    got = _duck(t.gen_rake_keywords(DUCK, n_stop=1, max_len=4), documents=docs)
    assert got["phrase"] == []
    got5 = _duck(t.gen_rake_keywords(DUCK, n_stop=1, max_len=5), documents=docs)
    assert got5["phrase"] == ["a b c d e"]


def test_rake_spark_matches_oracle_bitwise(spark):
    from storage_crawler_spark.operators import text as t

    words = ["spark", "query", "merge", "join", "scan", "the", "of", "fast"]
    texts = [
        " ".join(words[((i * 7 + j * 3) % len(words))] for j in range(14))
        for i in range(40)
    ]
    pdf = _docs_df(texts)
    spark.createDataFrame(pdf).createOrReplaceTempView("documents")
    got = spark.sql(t.gen_rake_keywords(SPARK, n_stop=2, top_k=25)).toPandas()
    spark.catalog.dropTempView("documents")
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(t.gen_rake_keywords(DUCK, n_stop=2, top_k=25)).fetchdf()
    assert len(got) >= 5
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_clustering_coeff_triangle_vs_star():
    """Triangle nodes have cc 1; a star center has cc 0 (no neighbour
    pair connected); leaves (degree 1) get the degree<2 zero."""
    from storage_crawler_spark.operators import cluster

    tri = [(1, 2), (2, 3), (1, 3)]
    star = [(10, 11), (10, 12), (10, 13)]
    got = _duck(
        cluster.gen_knn_clustering_coeff(DUCK, edges_rel="pe"),
        pe=_sym_edges(tri + star),
    )
    cc = dict(zip(got["vec_id"], got["clustering_coeff"]))
    ntri = dict(zip(got["vec_id"], got["n_triangles"]))
    assert cc[1] == cc[2] == cc[3] == 1.0 and ntri[1] == 1
    assert cc[10] == 0.0 and ntri[10] == 0
    assert cc[11] == cc[12] == cc[13] == 0.0  # degree-1 leaves


def test_clustering_coeff_spark_matches_oracle(spark, tmp_path):
    from storage_crawler_spark.operators import cluster
    from storage_crawler_spark.plans import views as V
    import pyarrow as pa
    import pyarrow.parquet as pq

    vecs = [
        [((i + 11) * (j + 2) * 104729) % 769 / 769.0 - 0.5 for j in range(8)]
        for i in range(50)
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(50), type=pa.int64()),
            "embedding": pa.array(
                [[float(pd.Series([x], dtype="float32")[0]) for x in v] for v in vecs],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * 50, type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    V.register_base_tables(spark, str(tmp_path), ("embeddings",))
    edges = spark.sql(cluster.gen_knn_edges(SPARK, m=4))
    edges.persist()
    edges.createOrReplaceTempView("_cc_edges_t")
    got = spark.sql(
        cluster.gen_knn_clustering_coeff(SPARK, edges_rel="_cc_edges_t")
    ).toPandas()
    edges.unpersist()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path}/embeddings.parquet'"
    )
    want = con.execute(cluster.gen_knn_clustering_coeff(DUCK, m=4)).fetchdf()
    assert len(got) >= 10
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# Periodicity ACF: lag-24/168 autocorrelation of the hourly count series
# ---------------------------------------------------------------------------


def test_acf_planted_daily_rhythm_near_one():
    """A perfectly 24-periodic series has acf24 = 1 exactly (the paired
    sums are identical); a constant series keeps its row with the
    nullif-guarded NULL acf (zero variance — correlation undefined)."""
    from storage_crawler_spark.operators import analytics

    daily = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4, 6, 2, 6, 4]
    counts = {"A": daily * 6, "B": [7] * 144}
    ev, _ = _hourly_events(counts)
    got = _duck(analytics.gen_periodicity_acf(DUCK, lags=(24,)), events=ev)
    assert got["event_type"] == ["A", "B"]
    assert got["acf"][0] == 1.0 and got["acf"][1] is None


def test_acf_pairwise_complete_on_gaps():
    """Buckets missing on either side of the lag form no pair: a series
    observed only on even hours has zero lag-1... but full lag-2 pairs."""
    from storage_crawler_spark.operators import analytics

    # hours 0,2,4,...,58 observed; lag 2 pairs = 29, lag 1 pairs = 0
    counts = {"A": [1] * 60}
    ev, T = _hourly_events(counts)
    pdf = ev[(ev["ts"].astype("int64") // 10**9 - T) // 3600 % 2 == 0].reset_index(drop=True)
    # vary values so variance > 0: bump every 4th hour
    vals = ((pdf["ts"].astype("int64") // 10**9 - T) // 3600 % 4 == 0)
    pdf = pd.concat([pdf, pdf[vals]]).reset_index(drop=True)
    pdf["event_id"] = range(len(pdf))
    got1 = _duck(
        analytics.gen_periodicity_acf(DUCK, lags=(1,), min_pairs=1), events=pdf
    )
    got2 = _duck(
        analytics.gen_periodicity_acf(DUCK, lags=(2,), min_pairs=1), events=pdf
    )
    assert got1["event_type"] == []  # no adjacent observed hours
    assert got2["n_pairs"] == [29]


def test_acf_spark_matches_oracle_bitwise(spark):
    from storage_crawler_spark.operators import analytics

    counts = {
        "A": [((i * 31) % 7) + ((i % 24) // 6) for i in range(120)],
        "B": [((i * 17) % 5) + 1 for i in range(80)],
    }
    ev, _ = _hourly_events(counts)
    spark.createDataFrame(ev).createOrReplaceTempView("events")
    got = spark.sql(
        analytics.gen_periodicity_acf(SPARK, lags=(6, 24), min_pairs=10)
    ).toPandas()
    spark.catalog.dropTempView("events")
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute(
        analytics.gen_periodicity_acf(DUCK, lags=(6, 24), min_pairs=10)
    ).fetchdf()
    assert len(got) >= 3
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_embedding_coverage_strays_and_unusables():
    from storage_crawler_spark.operators import pipeline

    docs = _docs_df(["a", "b", "c", "d"])          # doc_ids 0..3
    docs.loc[3, "source"] = None                   # NULL-source doc
    emb = _emb_df([[1.0, 0.0], [0.0, 0.0], [0.5, 0.5]])  # ids 0..2; id1 zero-norm
    # orphan vector id 9
    emb = pd.concat(
        [emb, pd.DataFrame({"vec_id": [9], "embedding": [[1.0, 1.0]], "label": [0]})],
        ignore_index=True,
    )
    got = _duck(
        pipeline.gen_embedding_coverage(DUCK), documents=docs, embeddings=emb
    )
    by = {
        s: (d0, v, m, u)
        for s, d0, v, m, u in zip(
            got["source"], got["n_docs"], got["n_vectors"],
            got["n_missing_vector"], got["n_unusable_vector"],
        )
    }
    # docs 0,1,2 have source 's': vectors 0,1,2 matched, one zero-norm
    assert by["s"] == (3, 3, 0, 1)
    # doc 3 (NULL source) has no vector
    assert by["__null_source__"] == (1, 0, 1, 0)
    # vector 9 has no doc
    assert by["__orphan_vector__"] == (0, 1, 0, 0)


def test_embedding_coverage_spark_matches_oracle(spark):
    from storage_crawler_spark.operators import pipeline

    docs = _docs_df(["x y"] * 30)
    docs.loc[7, "source"] = None
    vecs = [[float(i % 5) + 0.5, 1.0] for i in range(25)]
    emb = _emb_df(vecs)
    emb.at[3, "embedding"] = None
    emb.at[4, "vec_id"] = 99  # orphan
    spark.createDataFrame(docs).createOrReplaceTempView("documents")
    spark.createDataFrame(emb).createOrReplaceTempView("embeddings")
    got = spark.sql(pipeline.gen_embedding_coverage(SPARK)).toPandas()
    spark.catalog.dropTempView("documents")
    spark.catalog.dropTempView("embeddings")
    con = duckdb.connect()
    con.register("documents", docs)
    con.register("embeddings", emb)
    want = con.execute(pipeline.gen_embedding_coverage(DUCK)).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_schema_evolution_merged_read_fidelity(spark, tmp_path):
    """mergeSchema over two disjoint-column file groups reconstructs the
    CASE-masked original exactly — including NULL fill for each group's
    missing columns and the digest over surviving text bytes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from storage_crawler_spark.plans.dialect import DUCK
    from storage_crawler_spark.sources import ingest

    docs = _docs_df(["alpha", None, "gamma docs", "", "epsilon five"])
    docs.loc[2, "lang"] = None
    pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
    merged = ingest.read_documents_pqmix(spark, str(tmp_path))
    # union schema present, NULLs where the file group lacks the column
    assert set(merged.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    rows = {r["doc_id"]: r for r in merged.collect()}
    assert rows[0]["text"] == "alpha" and rows[0]["source"] is None
    assert rows[1]["text"] is None  # even row, originally NULL
    assert rows[3]["source"] == "s" and rows[3]["text"] is None  # odd group
    got = ingest.generation_fingerprint(merged).toPandas()
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(ingest.gen_generation_fingerprint(DUCK)).fetchdf()
    got = got.sort_values("lang", na_position="first").reset_index(drop=True)
    want = want.sort_values("lang", na_position="first").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
