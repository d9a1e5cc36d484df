"""Planted-typo semantics for the SymSpell-relational miner: each
Damerau-Levenshtein-1 class (deletion, insertion, substitution, adjacent
transposition) must be caught, everything at distance ≥2 excluded, and the
Spark plan must agree with the DuckDB oracle on the same corpus."""

from __future__ import annotations

import pytest

from parity_util import assert_parity

from storage_crawler_spark.plans import registry

# (corpus-planted rare token, its frequent correction) per edit class
PLANTED = {
    "windo": "window",  # deletion
    "windows": "window",  # insertion
    "wundow": "window",  # substitution
    "sprak": "spark",  # adjacent transposition
}
# distance >= 2 from every frequent token: must NOT appear
NEGATIVES = ("wndoo", "sparkle", "windstorm")


@pytest.fixture(scope="module")
def typo_sf_dir(tmp_path_factory):
    import pandas as pd

    body = " ".join(["window"] * 30 + ["spark"] * 25)
    planted = " ".join(list(PLANTED) + list(NEGATIVES))
    rows = [
        (0, body, "en", "src0", len(body)),
        (1, planted, "en", "src1", len(planted)),
        (2, body, "en", "src2", len(body)),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    d = tmp_path_factory.mktemp("typos")
    pdf.to_parquet(str(d / "documents.parquet"), index=False)
    return str(d)


def test_typo_classes_and_parity(spark, typo_sf_dir):
    spec = registry.get_query("text_typo_pairs")
    df = spec.builder(spark, typo_sf_dir)
    got = {(r.typo, r.correction) for r in df.collect()}
    for typo, corr in PLANTED.items():
        assert (typo, corr) in got, f"missed {typo} -> {corr}"
    flagged = {t for t, _ in got}
    for neg in NEGATIVES:
        assert neg not in flagged, f"false positive {neg}"
    assert_parity(
        spec.builder(spark, typo_sf_dir),
        spec.oracle,
        {"documents": f"{typo_sf_dir}/documents.parquet"},
        "text_typo_pairs",
    )
