"""Round-14 fixtures: the r13 ADVICE items, each pinned — the kNN-edge
memo's unpersist-on-key-change (no storage-block leak when sf_dir
switches within one session), the winnow defaults hoisted to shared
constants, the minipg jar registered for executors, and the
_DRIVER_WINDOW_R12 deletion (covered by test_registry_window's existing
single-window contract)."""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# ADVICE: _knn_edges_shared must unpersist the superseded checkpoint's
# storage blocks when the (applicationId, sf_dir) key changes, and the
# memo must be lock-guarded.  DataFrame.unpersist() is NOT sufficient for
# a localCheckpoint (probed: the blocks belong to the LogicalRDD's
# underlying RDD), so the fix goes through analyzed().rdd().unpersist().
# ---------------------------------------------------------------------------


def _cached_rdd_ids(spark) -> set[str]:
    sc = spark.sparkContext
    return {
        str(r.id())
        for r in sc._jsc.sc().getRDDStorageInfo()
        if r.numCachedPartitions() > 0
    }


def _checkpoint_rdd_id(df) -> str:
    return str(df._jdf.queryExecution().analyzed().rdd().id())


def test_knn_edges_memo_unpersists_superseded_checkpoint(spark, monkeypatch):
    from storage_crawler_spark.plans import registry

    # Stand-in edge relations: the real lattice fit is ~25 CPU-s; the memo
    # logic under test is independent of what the relation holds.
    def fake_edges(s, m=8):
        return s.range(64).selectExpr("id AS src", "id + 1 AS dst")

    import storage_crawler_spark.operators.cluster as cluster

    monkeypatch.setattr(cluster, "knn_edges_lattice", fake_edges)
    # Isolate from any memo state earlier tests left behind.
    monkeypatch.setattr(registry, "_KNN_EDGES_SHARED_KEY", [None, None])

    rel = registry._knn_edges_shared(spark, "/sf/dirA")
    first = registry._KNN_EDGES_SHARED_KEY[1]
    first_id = _checkpoint_rdd_id(first)
    assert rel == "_knn_edges_shared"
    assert first_id in _cached_rdd_ids(spark)

    # Same key: memoized, no rebuild.
    registry._knn_edges_shared(spark, "/sf/dirA")
    assert registry._KNN_EDGES_SHARED_KEY[1] is first

    # Key change within the same application: the old checkpoint's blocks
    # must be gone and the new ones present.
    registry._knn_edges_shared(spark, "/sf/dirB")
    second = registry._KNN_EDGES_SHARED_KEY[1]
    assert second is not first
    cached = _cached_rdd_ids(spark)
    assert first_id not in cached, "superseded checkpoint leaked its blocks"
    assert _checkpoint_rdd_id(second) in cached
    # Clean up the test's own checkpoint.
    second._jdf.queryExecution().analyzed().rdd().unpersist(False)


def test_knn_edges_memo_skips_unpersist_across_applications(spark, monkeypatch):
    """A stale handle from a PREVIOUS application (fresh JVM) must not be
    unpersisted — its blocks are already gone and the call could only
    throw; the guard compares application ids before touching it."""
    from storage_crawler_spark.plans import registry

    def fake_edges(s, m=8):
        return s.range(8).selectExpr("id AS src", "id + 1 AS dst")

    import storage_crawler_spark.operators.cluster as cluster

    monkeypatch.setattr(cluster, "knn_edges_lattice", fake_edges)

    class Boom:
        @property
        def _jdf(self):  # pragma: no cover - must never be reached
            raise AssertionError("unpersist attempted on a stale-app handle")

    monkeypatch.setattr(
        registry, "_KNN_EDGES_SHARED_KEY", [("dead-app-id", "/sf/old"), Boom()]
    )
    registry._knn_edges_shared(spark, "/sf/new")
    ck = registry._KNN_EDGES_SHARED_KEY[1]
    assert ck is not None and not isinstance(ck, Boom)
    ck._jdf.queryExecution().analyzed().rdd().unpersist(False)


# ---------------------------------------------------------------------------
# ADVICE: winnow defaults shared between gen_winnow_fk / gen_winnow_pairs
# and the fk_rel guard — the guard must track the signature defaults, not
# a hardcoded tuple.
# ---------------------------------------------------------------------------


def test_winnow_guard_tracks_signature_defaults():
    import inspect

    from storage_crawler_spark.operators import dedup

    fk_sig = inspect.signature(dedup.gen_winnow_fk)
    pairs_sig = inspect.signature(dedup.gen_winnow_pairs)
    expected = (dedup.WINNOW_K, dedup.WINNOW_W, dedup.WINNOW_DF_CAP)
    assert (
        fk_sig.parameters["k"].default,
        fk_sig.parameters["w"].default,
        fk_sig.parameters["df_cap"].default,
    ) == expected
    assert (
        pairs_sig.parameters["k"].default,
        pairs_sig.parameters["w"].default,
        pairs_sig.parameters["df_cap"].default,
    ) == expected
    # Passing exactly the shared build configuration alongside fk_rel is
    # accepted; anything else is rejected.
    sql = dedup.gen_winnow_pairs(
        __import__(
            "storage_crawler_spark.plans.dialect", fromlist=["DUCK"]
        ).DUCK,
        k=dedup.WINNOW_K,
        w=dedup.WINNOW_W,
        df_cap=dedup.WINNOW_DF_CAP,
        fk_rel="prebuilt_fk",
    )
    assert "prebuilt_fk" in sql
    with pytest.raises(ValueError):
        dedup.gen_winnow_pairs(
            __import__(
                "storage_crawler_spark.plans.dialect", fromlist=["DUCK"]
            ).DUCK,
            df_cap=dedup.WINNOW_DF_CAP + 1,
            fk_rel="prebuilt_fk",
        )


# ---------------------------------------------------------------------------
# ADVICE: the vendored minipg jar must reach executors (spark.jars), not
# only the driver classloader (spark.driver.extraClassPath) — on a
# non-local master the JDBC read/write tasks load the driver class
# executor-side.
# ---------------------------------------------------------------------------


def test_session_registers_minipg_for_executors(spark):
    import os

    import storage_crawler_spark.session as sess

    jar = os.path.join(
        os.path.dirname(os.path.dirname(sess.__file__)),
        "vendor",
        "minipg",
        "minipg.jar",
    )
    if not os.path.exists(jar):
        pytest.skip("vendored minipg.jar not built")
    conf = spark.sparkContext.getConf()
    assert jar in (conf.get("spark.driver.extraClassPath", "") or "")
    assert jar in (conf.get("spark.jars", "") or "")
