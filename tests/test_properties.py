"""Property-based tests (hypothesis) for the pure scalar/functional layer —
the byte-level semantics that a fixed fixture set can't sweep: arbitrary
path bytes, arbitrary rc-file text, arbitrary token streams.

No SparkSession here: these functions are deliberately plain Python (the
pandas UDFs map them), so properties run in milliseconds.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from storage_crawler_spark.config import parse_rc
from storage_crawler_spark.functions.paths import find_extension, pg_escape_bytea
from storage_crawler_spark.operators.simhash import simhash64, simhash64_batch

path_bytes = st.binary(min_size=0, max_size=40)


@given(path_bytes, st.integers(min_value=0, max_value=10))
def test_find_extension_invariants(path, ext_len):
    """The extension, when present, is a literal suffix of the path that is
    preceded by a dot; a dot-free path yields None; and the reference's
    fall-through quirk means the FIRST dot found (tail window first, then
    from the start) wins."""
    ext = find_extension(path, ext_len)
    if ext is None:
        assert b"." not in path
    else:
        assert path.endswith(ext)
        assert path[len(path) - len(ext) - 1 : len(path) - len(ext)] == b"."


@given(path_bytes)
def test_pg_escape_round_trip(raw):
    """ENCODE(bytea,'escape') must be losslessly decodable: printable ASCII
    verbatim, backslash doubled, the rest \\nnn octal — so reversing the
    escape recovers the exact input bytes."""
    s = pg_escape_bytea(raw)
    out, i = bytearray(), 0
    while i < len(s):
        c = s[i]
        if c == "\\":
            if s[i + 1] == "\\":
                out.append(0x5C)
                i += 2
            else:
                out.append(int(s[i + 1 : i + 4], 8))
                i += 4
        else:
            out.append(ord(c))
            i += 1
    assert bytes(out) == raw


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["tag", "owners", "walkers", "extension_length", "dir", "exclude"]),
            st.text(
                alphabet=st.characters(whitelist_categories=("Ll", "Nd"), max_codepoint=127),
                min_size=1,
                max_size=8,
            ),
        ),
        max_size=6,
    )
)
def test_parse_rc_last_scalar_wins_lists_accumulate(pairs):
    """rc parsing: later scalar keys override earlier ones (configargparse
    semantics), list keys accumulate in file order, junk never raises."""
    numeric = {"walkers", "extension_length"}
    lines = []
    for key, val in pairs:
        if key in numeric:
            val = str(len(val))  # keep it castable
        lines.append(f"{key} = {val}")
    got = parse_rc("\n".join(lines))

    scalars = {"tag": "tag", "owners": "owners", "walkers": "walkers", "extension_length": "extension_length"}
    for key, fieldname in scalars.items():
        vals = [v for k, v in pairs if k == key]
        if key in numeric:
            vals = [len(v) for v in vals]
        if vals:
            assert got[fieldname] == vals[-1]
    for key, fieldname in (("dir", "dirs"), ("exclude", "exclude")):
        vals = [v for k, v in pairs if k == key]
        if vals:
            assert got[fieldname] == vals


@given(st.data())
@settings(max_examples=25, deadline=None)
def test_simhash_batch_equals_scalar_property(data):
    """Batch simhash must equal the scalar reference on arbitrary
    space-joined token streams, including empty and None docs."""
    vocab = [f"t{i}" for i in range(40)] + ["", " "]
    docs = data.draw(
        st.lists(
            st.one_of(
                st.none(),
                st.lists(st.sampled_from(vocab), max_size=30).map(" ".join),
            ),
            min_size=1,
            max_size=20,
        )
    )
    got = simhash64_batch(pd.Series(docs, dtype=object)).tolist()
    assert got == [simhash64(d) for d in docs]


def test_parse_rc_comments_and_colon_forms():
    got = parse_rc("# comment\n; also comment\ntag: colonform\n\nnot_a_known_key = x\n")
    assert got == {"tag": "colonform"}
