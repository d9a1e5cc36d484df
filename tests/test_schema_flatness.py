"""Final-schema flatness guard (the r8 red-row class).

Round 8's ONLY red driver row was text_inverted_index: the answer was
oracle-correct but its ARRAY<BIGINT> postings column crashed the driver's
pandas canonicalizer ("unhashable type: 'list'").  Round 9 flattened it —
this battery pins the invariant for EVERY oracle-gated entry: no final
schema may carry a nested type (LIST/STRUCT/MAP), because the external
comparator cannot sort such cells.

Checked on the DuckDB side via DESCRIBE (pure compile — no data reads, so
even the unrolled lattice-fit chains cost milliseconds); the Spark side
cannot silently diverge in shape because the driver's schema compare would
go red first, and the shared-generator entries emit identical column sets
by construction.
"""

from __future__ import annotations

import duckdb
import pytest

from storage_crawler_spark.plans import registry

_SF = "/root/testdata/sf0.001"
_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

_ORACLED = sorted(registry.oracle_map())


@pytest.fixture(scope="module")
def duck_con():
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{_SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("entry", _ORACLED)
def test_final_schema_is_flat(duck_con, entry):
    sql = registry.oracle_map()[entry]
    desc = duck_con.execute(f"DESCRIBE {sql}").fetchall()
    nested = [
        (name, typ)
        for name, typ, *_ in desc
        if "[]" in typ or typ.startswith(("STRUCT", "MAP", "LIST", "UNION"))
    ]
    assert not nested, (
        f"{entry}: nested final-schema columns {nested} — the driver's "
        f"canonicalizer cannot sort list/struct cells (r8 inverted-index "
        f"red row); render them flat (array_join / explode) instead"
    )
