"""Drift guards for the driver-window rotation.

The external correctness gate samples the FIRST 50 entries of queries()
dict order; a rotation mistake (wrong length, a name that no longer exists,
a rows-only entry burning a slot) silently costs driver stamps.  These
invariants fail the suite the moment the tuple drifts from its contract.
"""

from __future__ import annotations

from storage_crawler_spark.plans import registry


def test_window_is_exactly_fifty_unique_names():
    w = registry._DRIVER_WINDOW_FIRST
    assert len(w) == 50
    assert len(set(w)) == 50


def test_window_names_exist_and_lead_query_order():
    w = registry._DRIVER_WINDOW_FIRST
    names = list(registry.QUERIES)
    missing = [n for n in w if n not in registry.QUERIES]
    assert not missing, f"window names not in registry: {missing}"
    assert names[: len(w)] == list(w), "queries() order must lead with the window"


def test_every_window_slot_is_oracle_gated():
    oracles = registry.oracle_map()
    burned = [n for n in registry._DRIVER_WINDOW_FIRST if n not in oracles]
    assert not burned, f"rows-only entries burning window slots: {burned}"


def test_oracle_coverage_floor():
    """Only the genuinely non-relational entries (iterative k-means/PQ fits,
    the live-filesystem fsmeta scan) may lack an oracle; a regression that
    drops an oracle elsewhere shows up here."""
    oracles = registry.oracle_map()
    rows_only = {n for n in registry.QUERIES if n not in oracles}
    assert rows_only <= {
        "sim_ivf_trained_topk",
        "sim_pq_topk",
        "sim_pq_recall",
        "fsmeta_scan",
        # iterative full-batch logistic-regression fit: 60 sequential
        # gradient steps (each a partial-combining aggregate) cannot be
        # expressed as one ANSI-SQL statement; honest rows-only entry.
        "text_quality_learned",
    }, f"unexpected rows-only entries: {sorted(rows_only)}"
