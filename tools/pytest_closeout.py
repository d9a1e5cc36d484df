#!/usr/bin/env python
"""Round close-out pytest attestation (r13 verdict item 2): run the FULL
suite and record the result WITH the sha of the tree it tested, so a
"pytest N passed" claim is verifiable against the commit it describes —
none of the committed artifacts may be re-used to attest a later HEAD.

Writes PYTEST_CLOSEOUT_r{N}.json:
  {"round": N, "head_sha": ..., "dirty": bool, "collected": n,
   "passed": n, "failed": n, "errors": n, "duration_s": s}

``dirty`` records whether the working tree had uncommitted changes
beyond this artifact itself — a truthful close-out runs on a clean tree
at the final commit of the round (commit the artifact immediately after;
the judge then checks `git diff <head_sha> <round-end>` is doc-only).

Usage: python tools/pytest_closeout.py --round 14 [--pytest-args "..."]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--pytest-args", default="")
    args = ap.parse_args()

    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=_ROOT, capture_output=True, text=True
    ).stdout.strip()
    out_name = f"PYTEST_CLOSEOUT_r{args.round}.json"
    porcelain = subprocess.run(
        ["git", "status", "--porcelain"], cwd=_ROOT, capture_output=True, text=True
    ).stdout.splitlines()
    dirty = any(out_name not in line for line in porcelain)

    t0 = time.monotonic()
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q"] + (
        args.pytest_args.split() if args.pytest_args else []
    )
    r = subprocess.run(cmd, cwd=_ROOT, capture_output=True, text=True)
    dur = time.monotonic() - t0
    tail = (r.stdout or "") + (r.stderr or "")
    # pytest -q summary: "1879 passed, 2 skipped in 1470.12s (0:24:30)"
    counts = {"passed": 0, "failed": 0, "errors": 0, "skipped": 0}
    m = re.findall(r"(\d+) (passed|failed|error(?:s)?|skipped)", tail)
    for n, kind in m:
        counts[kind.rstrip("s") if kind.startswith("error") else kind] = int(n)
    rec = {
        "round": args.round,
        "head_sha": head,
        "dirty": dirty,
        "collected": sum(counts.values()),
        "passed": counts["passed"],
        "failed": counts["failed"],
        "errors": counts["errors"],
        "skipped": counts["skipped"],
        "duration_s": round(dur, 1),
        "exit_code": r.returncode,
    }
    with open(os.path.join(_ROOT, out_name), "w") as fh:
        json.dump(rec, fh, indent=1)
        fh.write("\n")
    print(json.dumps(rec))
    # echo the last lines so failures are visible in the terminal
    sys.stdout.write("\n".join(tail.splitlines()[-15:]) + "\n")
    return 0 if r.returncode == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
