"""Property-based tests (hypothesis) for the byte-faithful scalar functions.

These check *invariants* rather than examples: the extension scan's
suffix/None laws, the PG escape round-trip, mode-bit rendering, and
python↔Spark-UDF↔SQL-expression agreement on arbitrary inputs.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from storage_crawler_spark.functions.paths import find_extension, pg_escape_bytea

# -- find_extension laws ----------------------------------------------------

paths = st.binary(min_size=0, max_size=40)


@given(paths)
def test_extension_none_iff_no_dot(path):
    assert (find_extension(path) is None) == (b"." not in path)


@given(paths)
def test_extension_is_dot_suffix(path):
    ext = find_extension(path)
    if ext is not None:
        # result is exactly what follows some dot in the path
        assert path.endswith(ext)
        assert path[len(path) - len(ext) - 1 : len(path) - len(ext)] == b"."


@given(paths, st.integers(min_value=0, max_value=12))
def test_extension_tail_window_priority(path, ext_len):
    """If a dot exists in the scan window (last L+1 bytes, excluding the
    final byte from the negative scan's view), the FIRST dot of that window
    wins — the positive fall-through only runs on window miss."""
    ext = find_extension(path, ext_len)
    chrs = min(len(path), ext_len + 1)
    window_hit = None
    for i in range(-chrs, 0):
        if path[i : i + 1] == b".":
            window_hit = path[i + 1 :]
            break
    if window_hit is not None:
        assert ext == window_hit


# -- pg escape round-trip ----------------------------------------------------


def _unescape(s: str) -> bytes:
    out = bytearray()
    i = 0
    while i < len(s):
        if s[i] == "\\":
            if s[i + 1] == "\\":
                out.append(0x5C)
                i += 2
            else:
                out.append(int(s[i + 1 : i + 4], 8))
                i += 4
        else:
            out.append(ord(s[i]))
            i += 1
    return bytes(out)


@given(paths)
def test_pg_escape_roundtrip(raw):
    esc = pg_escape_bytea(raw)
    assert _unescape(esc) == raw
    # printable ASCII minus backslash passes through verbatim
    assert re.fullmatch(r"(?:[\x20-\x5b\x5d-\x7e]|\\\\|\\[0-7]{3})*", esc)


# -- Spark parity (batched: one Spark job over many hypothesis examples) -----


@settings(max_examples=10, deadline=None)
@given(st.lists(paths, min_size=1, max_size=30))
def test_extension_udf_matches_python(spark, batch):
    from pyspark.sql import functions as F

    from storage_crawler_spark.functions.paths import extension_col, pg_escape_col

    df = spark.createDataFrame([(p,) for p in batch], "path binary")
    rows = df.select(
        "path",
        extension_col(F.col("path")).alias("ext"),
        pg_escape_col(F.col("path")).alias("esc"),
    ).collect()
    for r in rows:
        p = bytes(r.path)
        expected = find_extension(p)
        got = bytes(r.ext) if r.ext is not None else None
        assert got == expected, f"path={p!r}"
        assert r.esc == pg_escape_bytea(p)


ascii_names = st.text(
    alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E, exclude_characters="'\\%_"),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(ascii_names, min_size=1, max_size=20))
def test_extension_sql_expr_matches_python_for_ascii(spark, names):
    """The common-dialect EXTENSION_EXPR (used by the files-view oracle)
    agrees with the byte-faithful python on clean-ASCII paths."""
    from storage_crawler_spark.plans.views import EXTENSION_EXPR

    df = spark.createDataFrame([(n,) for n in names], "p string")
    df.createOrReplaceTempView("_ext_prop")
    rows = spark.sql(
        f"SELECT p, {EXTENSION_EXPR.format(p='p')} AS ext FROM _ext_prop"
    ).collect()
    for r in rows:
        expected = find_extension(r.p.encode())
        got = r.ext.encode() if r.ext is not None else None
        assert got == expected, f"path={r.p!r}"


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 19) - 1), min_size=1, max_size=30))
def test_mode_bits_col(spark, modes):
    from pyspark.sql import functions as F

    from storage_crawler_spark.functions.paths import mode_bits_col

    df = spark.createDataFrame([(m,) for m in modes], "m long")
    rows = df.select("m", mode_bits_col(F.col("m")).alias("bits")).collect()
    for r in rows:
        assert r.bits == format(r.m, "019b")
