"""Turn-boundary compile gate.

Round 6 was zeroed by a snapshot commit that captured a mid-edit
``plans/registry.py`` with an unclosed ``add(`` — a SyntaxError that killed
every driver probe.  Pytest collection imports most modules already; this
test makes the guarantee explicit and total: every ``.py`` file in the
package AND the repo-root entry points must byte-compile, and the entry
module must import and expose a consistent query/oracle surface.

Run ``make verify`` (or just this file) before any stopping point.
"""

from __future__ import annotations

import os
import py_compile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "storage_crawler_spark")


def _all_py_files() -> list[str]:
    out = []
    for root, _dirs, files in os.walk(PKG):
        for name in files:
            if name.endswith(".py"):
                out.append(os.path.join(root, name))
    for name in ("__spark_entry__.py", "bench.py"):
        path = os.path.join(REPO, name)
        if os.path.exists(path):
            out.append(path)
    return sorted(out)


@pytest.mark.parametrize("path", _all_py_files(), ids=lambda p: os.path.relpath(p, REPO))
def test_compiles(path):
    py_compile.compile(path, doraise=True)


def test_entry_surface_consistent():
    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    assert len(queries) >= 179
    stray = set(oracles) - set(queries)
    assert not stray, f"oracle_sql() keys missing from queries(): {sorted(stray)}"
