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
