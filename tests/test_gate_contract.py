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


def test_pytest_closeout_attestation_is_honest():
    """r13 verdict item 2: a round's "pytest N passed" close-out claim must
    be measured at the commit it describes.  The newest
    PYTEST_CLOSEOUT_r*.json must name a real commit, a clean tree, and
    zero failures — the judge verifies freshness by diffing the recorded
    sha against the round head (doc-only diffs allowed).  Older rounds'
    artifacts attest THEIR shas and are exempt (history, not claims)."""
    files = glob.glob(os.path.join(_ROOT, "PYTEST_CLOSEOUT_r*.json"))
    if not files:
        return  # pre-r14 history has no close-out artifacts
    latest = max(files, key=lambda f: int(re.search(r"_r(\d+)", f).group(1)))
    with open(latest) as fh:
        rec = json.load(fh)
    for key in ("round", "head_sha", "dirty", "passed", "failed", "duration_s"):
        assert key in rec, f"{latest} missing {key}"
    assert rec["failed"] == 0 and rec.get("errors", 0) == 0, (
        f"{latest} records a FAILING suite — fix or re-run at the fixed sha"
    )
    assert rec["dirty"] is False, (
        f"{latest} was measured on a dirty tree — not attributable to a sha"
    )
    assert rec["passed"] > 1000, f"{latest} passed-count implausibly low"
    import subprocess

    r = subprocess.run(
        ["git", "cat-file", "-t", rec["head_sha"]],
        cwd=_ROOT, capture_output=True, text=True,
    )
    assert r.stdout.strip() == "commit", (
        f"{latest} head_sha {rec['head_sha']} is not a commit in this repo"
    )
