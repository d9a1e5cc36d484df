"""Round-13 fixtures: the five r12 ADVICE items, each pinned — epoch-plan
HLL source coverage, empty-input HLL estimate, integer-consistent
jaccard/containment display scores, the gen_winnow_pairs fk_rel parameter
contract, and the hits_events count-before-collect guard ordering."""

from __future__ import annotations

import math

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
# ADVICE 1: gen_epoch_plan_hll must cover the same source set as the exact
# gen_epoch_plan.  Investigation note: the r12 ADVICE premise ("the exact
# plan emits a row for an all-NULL-text source") is wrong — the SHARED
# tail filters `WHERE n_text > 0` in both forms, so the plans were already
# consistent; the INNER->LEFT JOIN + coalesce change hardens the HLL form
# so consistency no longer depends on the tail's filter, and this test
# pins the invariant both ways.
# ---------------------------------------------------------------------------


def _docs_with_null_source() -> pd.DataFrame:
    rows = []
    for i in range(6):
        rows.append((f"d{i}", "web", f"alpha beta gamma doc {i}"))
    for i in range(4):
        rows.append((f"n{i}", "nulls_only", None))
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "source": [r[1] for r in rows],
            "text": [r[2] for r in rows],
        }
    )


def test_epoch_plan_hll_keeps_all_null_text_source():
    from storage_crawler_spark.operators.pipeline import (
        gen_epoch_plan,
        gen_epoch_plan_hll,
    )

    docs = _docs_with_null_source()
    exact = _duck(gen_epoch_plan(DUCK), documents=docs)
    hll = _duck(gen_epoch_plan_hll(DUCK), documents=docs)
    assert sorted(exact["source"]) == sorted(hll["source"]), (
        "HLL epoch plan must cover the same source set as the exact plan"
    )
    # both forms drop the zero-token source by the documented cap-domain
    # rule (tail: WHERE n_text > 0) — neither form may differ from that
    assert sorted(hll["source"]) == ["web"]


# ---------------------------------------------------------------------------
# ADVICE 2: gen_hll_ndv on zero matching rows estimates 0, not NULL (the
# ungrouped form aggregates an empty input to one row whose harmonic sum
# is NULL; the linear-counting branch must see 0).
# ---------------------------------------------------------------------------


def test_hll_ndv_empty_input_estimates_zero():
    from storage_crawler_spark.operators.sketches import gen_hll_ndv

    empty = pd.DataFrame({"k": pd.array([], dtype="string")})
    sql = gen_hll_ndv(DUCK, "k", "t", "seed13")
    out = _duck(sql, t=empty)
    assert out["n_registers_hit"] == [0]
    assert out["distinct_est"] == [0.0], "empty-input NDV estimate must be 0, not NULL"


def test_hll_ndv_nonempty_unchanged_by_coalesce():
    from storage_crawler_spark.operators.sketches import gen_hll_ndv

    t = pd.DataFrame({"k": pd.array([f"key{i}" for i in range(500)], dtype="string")})
    out = _duck(gen_hll_ndv(DUCK, "k", "t", "seed13"), t=t)
    est = out["distinct_est"][0]
    assert est is not None and 250 < est < 1000  # m=64 HLL, ~±12% typical


# ---------------------------------------------------------------------------
# ADVICE 3: displayed jaccard/containment scores come from the SAME integer
# quantities as the exact-integer threshold filter, so no surviving pair
# can display a score below the documented threshold.  Construct a boundary
# pair where i/u is an exact multiple of 1e-6 (the case where the old
# double-division trunc6 could land one ulp below and truncate under the
# threshold the integer filter already cleared).
# ---------------------------------------------------------------------------


def _boundary_docs() -> pd.DataFrame:
    # Two docs over a shared vocabulary sized so the token-set jaccard is
    # EXACTLY 0.8: |A∩B| = 8, |A∪B| = 10 -> union = an + bn - i with
    # an = bn = 9: i=8, u=10, 8/10 = 0.8 exactly at the 1e-6 grid.
    shared = [f"tok{i:02d}" for i in range(8)]
    a = " ".join(shared + ["onlya"])
    b = " ".join(shared + ["onlyb"])
    return pd.DataFrame(
        {
            "doc_id": pd.array([1, 2], dtype="int64"),
            "source": ["web", "web"],
            "lang": ["en", "en"],
            "text": [a, b],
            "n_chars": pd.array([len(a), len(b)], dtype="int64"),
        }
    )


def test_jaccard_display_matches_integer_filter_at_boundary():
    from storage_crawler_spark.operators.dedup import gen_jaccard_pairs

    out = _duck(gen_jaccard_pairs(DUCK, threshold=0.8), documents=_boundary_docs())
    assert len(out["doc_a"]) == 1, "the exact-0.8 pair must survive a 0.8 threshold"
    assert out["jaccard"][0] == pytest.approx(0.8)
    # the invariant itself: every displayed score >= threshold
    assert all(j >= 0.8 for j in out["jaccard"])


def test_jaccard_display_is_floor_of_integer_ratio():
    """Non-boundary ratio: display must equal floor(1e6*i/u)/1e6 exactly."""
    from storage_crawler_spark.operators.dedup import gen_jaccard_pairs

    # i=7, an=bn=9 -> u=11, 7/11 = 0.636363... -> floor at 1e-6 = 0.636363
    shared = [f"tok{i:02d}" for i in range(7)]
    ta = " ".join(shared + ["xa", "ya"])
    tb = " ".join(shared + ["xb", "yb"])
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([1, 2], dtype="int64"),
            "source": ["web", "web"],
            "lang": ["en", "en"],
            "text": [ta, tb],
            "n_chars": pd.array([len(ta), len(tb)], dtype="int64"),
        }
    )
    out = _duck(gen_jaccard_pairs(DUCK, threshold=0.5), documents=docs)
    assert out["jaccard"][0] == math.floor(7 / 11 * 1_000_000) / 1_000_000


# ---------------------------------------------------------------------------
# ADVICE 4: gen_winnow_pairs rejects non-default k/w/df_cap alongside
# fk_rel (they are baked into the fk relation's build and would be
# silently ignored).
# ---------------------------------------------------------------------------


def test_winnow_pairs_fk_rel_rejects_divergent_params():
    from storage_crawler_spark.operators.dedup import gen_winnow_pairs

    with pytest.raises(ValueError, match="baked into fk_rel"):
        gen_winnow_pairs(DUCK, df_cap=10, fk_rel="some_rel")
    # defaults alongside fk_rel remain fine
    sql = gen_winnow_pairs(DUCK, fk_rel="some_rel")
    assert "some_rel" in sql


# ---------------------------------------------------------------------------
# ADVICE 5: hits_events guards node cardinality via count() BEFORE the
# first collect.  Verified structurally: the count query precedes the node
# collect in the function source (runtime order is source order).
# ---------------------------------------------------------------------------


def test_hits_events_guard_precedes_node_collect():
    import inspect

    from storage_crawler_spark.operators.analytics import hits_events

    src = inspect.getsource(hits_events)
    i_count = src.index("SELECT count(*) FROM nodes")
    i_guard = src.index("check_model_state(n_nodes * n_nodes")
    i_collect = src.index("SELECT node FROM nodes")
    assert i_count < i_guard < i_collect


# ---------------------------------------------------------------------------
# r12 verdict item 5 (A/B): the batched one-scan column-stats HLL variant
# must stay value-identical to the union form (same seeds, same register
# algebra), so the measured plan comparison is apples-to-apples.  The
# union form won the A/B (see gen_column_stats_hll_batched docstring) and
# remains the registry entry.
# ---------------------------------------------------------------------------


def test_colstats_hll_forms_identical():
    from storage_crawler_spark.sources.lake import (
        gen_column_stats_hll,
        gen_column_stats_hll_batched,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    )
    a = con.execute(gen_column_stats_hll(DUCK)).fetchall()
    b = con.execute(gen_column_stats_hll_batched(DUCK)).fetchall()
    assert len(a) == 11
    assert a == b


def test_colstats_hll_batched_all_null_column_reports_zero():
    """The batched form's LEFT JOIN from the column spec: an all-NULL
    column still reports a row with estimate 0 (the union form gets the
    same from gen_hll_ndv's empty-input contract)."""
    from storage_crawler_spark.sources.lake import (
        gen_column_stats_hll,
        gen_column_stats_hll_batched,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * EXCLUDE (l_tax), "
        "CAST(NULL AS DOUBLE) AS l_tax FROM "
        "read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    )
    a = con.execute(gen_column_stats_hll(DUCK)).fetchall()
    b = con.execute(gen_column_stats_hll_batched(DUCK)).fetchall()
    assert a == b
    tax = [r for r in b if r[0] == "l_tax"][0]
    assert tax[4] == 0 and tax[5] == 0.0  # n_registers_hit, ndv_est
