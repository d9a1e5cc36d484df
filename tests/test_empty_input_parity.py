"""Empty-input parity battery: EVERY oracle-gated registry entry run on
empty (schema-preserving) tables in both engines.

The driver's gate and the fixed testdata never exercise zero-row inputs,
and the first full empty sweep found five real defects hiding there: two
ANSI DIVIDE_BY_ZERO crashes (funnel conversion-rate denominator, bootstrap
replica variance), a late unresolvable-plan crash in the k-means fit, and
two engine-semantic gaps documented below.  This battery freezes the fixed
state and the documented exceptions so regressions (or silent behavior
drift in either engine) surface immediately.

Known, accepted divergences (asserted as such, not skipped):

- ``grouping_sets_orders`` / ``rollup_events_daily``: on EMPTY input,
  DuckDB emits the SQL-standard grand-total row for the () grouping set
  (count 0) while Spark emits no rows at all.  Both are defensible; the
  entries are parity-exact on any non-empty input (driver gate + random
  batteries), so the divergence is recorded rather than papered over with
  a grand-total filter that would change real output.
- ``sim_pq_topk`` / ``sim_pq_recall`` / ``sim_ivf_trained_topk``
  (rows-only): the k-means/PQ fits raise a LOUD ValueError on an empty
  store by contract — a quantizer trained on nothing is a defect upstream,
  not an empty result.
"""

from __future__ import annotations

import duckdb
import pytest

from parity_util import assert_parity

from storage_crawler_spark.plans import registry

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# oracle-gated entries expected to DIVERGE on empty input (see module doc)
KNOWN_EMPTY_DIVERGENT = {"grouping_sets_orders", "rollup_events_daily"}

# entries whose fit contract is a loud error on empty input (the lattice
# k-means pair is oracle-gated but its ENGINE path still refuses to fit an
# empty store — the oracle chain simply yields 0 rows; the loud error is
# the deliberate contract, same as the float fits)
LOUD_ON_EMPTY = {
    "sim_pq_topk",
    "sim_pq_recall",
    "sim_ivf_trained_topk",
    "sim_kmeans_lattice",
    "dedup_semantic",
}

# live-FS entry: its oracle reads the REAL testdata directory through
# DuckDB's own filesystem functions, so the empty-view fixture cannot
# empty it — structurally out of this battery's scope
LIVE_FS = {"fsmeta_scan"}

ENTRIES = sorted(
    n for n in registry.oracle_map()
    if n not in KNOWN_EMPTY_DIVERGENT and n not in LOUD_ON_EMPTY
    and n not in LIVE_FS
)


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet') LIMIT 0) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


@pytest.mark.parametrize("entry", ENTRIES)
def test_empty_input_parity(spark, empty_sf_dir, entry):
    spec = registry.get_query(entry)
    views = {t: f"{empty_sf_dir}/{t}.parquet" for t in TABLES}
    assert_parity(spec.builder(spark, empty_sf_dir), spec.oracle, views, entry)


@pytest.mark.parametrize("entry", sorted(KNOWN_EMPTY_DIVERGENT))
def test_known_rollup_empty_divergence_is_stable(spark, empty_sf_dir, entry):
    """Pin the documented state: Spark 0 rows, DuckDB exactly the
    grand-total row.  If either engine changes its ROLLUP-of-empty
    semantics, this fails and the entry moves back to the main battery."""
    spec = registry.get_query(entry)
    s_rows = spec.builder(spark, empty_sf_dir).collect()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{empty_sf_dir}/{t}.parquet'")
    d_rows = con.execute(spec.oracle).fetchall()
    assert s_rows == []
    assert len(d_rows) == 1


@pytest.mark.parametrize("entry", sorted(LOUD_ON_EMPTY))
def test_fit_entries_fail_loudly_on_empty(spark, empty_sf_dir, entry):
    spec = registry.get_query(entry)
    with pytest.raises(ValueError):
        spec.builder(spark, empty_sf_dir).collect()
