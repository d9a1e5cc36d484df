"""Testdata-schema drift guard.

Round 3's only break was driver-side: events.ts changed parquet dtype
(nanos-as-LONG → timestamp[us]) and 14 registry entries started throwing
AnalysisException — a failure visible from *analysis alone*, no execution
needed, yet it first surfaced at the driver's correctness gate.  This test
builds every registry entry's DataFrame against the ACTUAL
``/root/testdata`` parquet and touches ``.schema`` (forces full analysis),
so the next dtype drift fails in-round, in pytest, with the entry name in
the assertion.

Streaming-backed builders execute a bounded AvailableNow run inside the
builder itself (that is their contract); at sf0.001 each is ~1-2 s, and that
execution is exactly where their round-3 break surfaced — so they are
covered too, not skipped.
"""

from __future__ import annotations

import pytest

from storage_crawler_spark.plans import registry

# One shared mark: the whole module is pointless if the testdata dir moved.
pytestmark = pytest.mark.usefixtures("sf_dir")


def _entry_names() -> list[str]:
    return list(registry.QUERIES)


@pytest.mark.parametrize("name", _entry_names())
def test_entry_analyzes_against_driver_testdata(spark, sf_dir, name):
    spec = registry.get_query(name)
    df = spec.builder(spark, sf_dir)
    # .schema forces analysis (resolution + type-checking) without running
    # a job for pure-plan builders; builders that execute internally
    # (streaming run_to_completion, k-means fit) have already run by now.
    assert len(df.schema.fields) > 0, f"{name}: empty schema"


def test_events_ts_epoch_is_session_tz_independent(spark, sf_dir):
    """The driver's session need not be UTC: register_base_tables pins the
    session timezone itself, so the canonical events.ts epoch must agree
    with DuckDB's naive epoch() even when the session starts in another
    zone (TIMESTAMP_NTZ reinterpretation is timezone-sensitive)."""
    import duckdb

    from storage_crawler_spark.plans import views as V

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        V.register_base_tables(spark, sf_dir, ("events",))
        got = [
            r.s
            for r in spark.sql(
                "SELECT unix_seconds(ts) AS s FROM events ORDER BY event_id LIMIT 5"
            ).collect()
        ]
        exp = [
            r[0]
            for r in duckdb.sql(
                f"SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s "
                f"FROM '{sf_dir}/events.parquet' ORDER BY event_id LIMIT 5"
            ).fetchall()
        ]
        assert got == exp
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_driver_window_leads_query_order():
    """The driver samples the first 50 entries of queries() order; the
    explicit window list must fit that sample and be the exact prefix of
    the registry order (r10: 33 rotation slots + new operators as they
    land, so <= 50 rather than exactly 50 mid-round)."""
    names = list(registry.QUERIES)
    w = list(registry._DRIVER_WINDOW_FIRST)
    assert len(w) <= 50
    assert names[: len(w)] == w
