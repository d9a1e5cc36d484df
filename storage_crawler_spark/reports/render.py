"""Result renderers matching the reference's display formats.

- CSV-ish lines: label row first, then comma-joined cells; datetimes as
  ``isoformat(' ')``, other values via repr() (report.py:88-101).
- JSON document: per-row OrderedDict with the reference's renamed keys,
  pretty-printed array (report.py:194-209).

Both stream via ``toLocalIterator`` so the driver never materializes a
large result — the renderers exist for CLI parity, not the data path.
"""

from __future__ import annotations

import datetime
import json
from typing import Iterator

from pyspark.sql import DataFrame


def _cell(v) -> str:
    if isinstance(v, datetime.datetime):
        return v.isoformat(" ")
    return repr(v)


def to_csv_lines(df: DataFrame) -> Iterator[str]:
    """Yield a header line, then one comma-joined line per row."""
    yield ",".join(df.columns)
    for row in df.toLocalIterator():
        yield ",".join(_cell(v) for v in row)


# Key renames of the reference's JSON output (report.py:197-208).
_JSON_KEYS = [
    ("insert_epoch", "insert_ts"),
    ("path", "path"),
    ("id", "id"),
    ("st_size", "size"),
    ("extension", "ext"),
    ("st_uid", "uid"),
    ("st_gid", "gid"),
    ("st_atime", "atime"),
    ("st_mtime", "mtime"),
    ("st_ctime", "ctime"),
    ("owner", "owner"),
]


def to_json_doc(df: DataFrame) -> str:
    """Pretty JSON array with the reference's key names, preserving row
    order."""
    cols = set(df.columns)
    out = []
    for row in df.toLocalIterator():
        d = {}
        for src, dst in _JSON_KEYS:
            if src in cols:
                d[dst] = row[src]
        if not d:  # non-largeoldfiles frames: passthrough
            d = row.asDict()
        out.append(d)
    return json.dumps(out, indent=2, default=str)
