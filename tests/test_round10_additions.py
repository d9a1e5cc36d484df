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
