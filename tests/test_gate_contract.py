"""Gate-contract guard (r10 VERDICT item 4): the one red entry round 10
shipped (`ingest_sitemap_coverage`) bypassed every house gate — no oracle
sweep, no battery enrollment, no fixtures.  This module automates the
convention so the suite itself fails on any entry with zero external
attestation or zero test coverage; run against the r10 snapshot (cb47b03)
it fails exactly on that entry.

(a) EXTERNAL ATTESTATION: every registry entry must appear as green in at
    least one repo-root artifact — an `ok <name>:` line in an
    ORACLE_SWEEP_*.txt, or a rows+hash-matching record in a
    CORRECTNESS_r*.json.  Landing an operator therefore REQUIRES running
    `tools/check_oracle.py --only <name>` and committing the round's sweep
    artifact in the same change.

(b) BATTERY COVERAGE: every entry must be exercised by at least one test —
    the empty-input battery auto-discovers every oracle-gated entry (its
    documented exceptions are referenced by name, which counts), and any
    rows-only entry must be named somewhere under tests/.
"""

from __future__ import annotations

import glob
import json
import os
import re

from storage_crawler_spark.plans import registry

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _attested_names() -> set[str]:
    names: set[str] = set()
    for f in glob.glob(os.path.join(_ROOT, "ORACLE_SWEEP_*.txt")):
        with open(f) as fh:
            for line in fh:
                m = re.match(r"ok\s+(\w+):", line.strip())
                if m:
                    names.add(m.group(1))
    for f in glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")):
        with open(f) as fh:
            data = json.load(fh)
        for name, rec in data.items():
            if isinstance(rec, dict) and rec.get("rows_match") and rec.get(
                "hash_match", True
            ):
                names.add(name)
    return names


def test_every_entry_externally_attested():
    attested = _attested_names()
    missing = sorted(n for n in registry.QUERIES if n not in attested)
    assert not missing, (
        "registry entries with NO green sweep/stamp artifact (run "
        f"tools/check_oracle.py --only <name> and commit the artifact): {missing}"
    )


def test_every_entry_referenced_by_a_test():
    # the empty-input battery parametrizes over every oracle-gated entry,
    # minus its documented exception sets — entries in those sets are
    # referenced by name there, so literal-name search covers them too
    oracle_gated = set(registry.oracle_map())
    corpus = []
    for f in glob.glob(os.path.join(_ROOT, "tests", "test_*.py")):
        with open(f) as fh:
            corpus.append(fh.read())
    blob = "\n".join(corpus)
    uncovered = sorted(
        n
        for n in registry.QUERIES
        if n not in oracle_gated and f'"{n}"' not in blob and f"'{n}'" not in blob
    )
    assert not uncovered, (
        f"rows-only entries with zero test references: {uncovered}"
    )
