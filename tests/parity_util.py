"""Shared Spark-vs-DuckDB comparison for the randomized parity batteries.

One compare implementation for all four batteries (documents corpus,
registry entries, events plane, relational plane), using the
driver-faithful normalizer from tools/check_oracle.py so a pass here means
the same thing as a pass at the driver's gate.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import value_hash  # noqa: E402


def assert_parity(sdf, duck_sql: str, views: dict[str, str], label: str) -> None:
    """Assert a Spark DataFrame and a DuckDB query agree on columns, row
    count, and the order-insensitive value hash.  ``views`` maps view name
    → parquet path registered for the DuckDB side."""
    s_cols = [f.name for f in sdf.schema.fields]
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for name, path in views.items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    # Arrow fetch, not fetchall(): DuckDB's fetchall() flattens HUGEINT to
    # Python int, hiding the decimal128-vs-int64 drift the driver's hash
    # catches (see tools/check_oracle.py — round-4 text_pack_bins red row)
    tbl = con.execute(duck_sql).fetch_arrow_table()
    d_cols = tbl.column_names
    d_rows = [
        tuple(tbl.column(i)[r].as_py() for i in range(tbl.num_columns))
        for r in range(tbl.num_rows)
    ]

    assert sorted(s_cols) == sorted(d_cols), f"{label}: column drift"
    assert len(s_rows) == len(d_rows), f"{label}: row count {len(s_rows)} vs {len(d_rows)}"
    assert value_hash(s_rows, s_cols) == value_hash(d_rows, d_cols), f"{label}: value drift"
