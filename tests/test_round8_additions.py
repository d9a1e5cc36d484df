"""Hand-computed semantic fixtures for the round-8 operators (DuckDB-side;
the registry sweep + oracle gate pin Spark to the same generated SQL):
greedy BPE merge-fold semantics, two-epoch merge learning, compression
accounting, vocabulary-contract edge cases, and the event-graph PageRank
power iteration."""

from __future__ import annotations

import duckdb
import pandas as pd

from storage_crawler_spark.operators import text
from storage_crawler_spark.plans.dialect import DUCK


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
# BPE encode (text_bpe_encode / text_bpe_compression)
# ---------------------------------------------------------------------------


def _encode_map(texts, **kw):
    got = _duck(text.gen_bpe_encode(DUCK, **kw), documents=_docs(texts))
    return dict(zip(got["word"], got["tokens"])), dict(zip(got["word"], got["n_tokens"]))


def test_bpe_single_merge_greedy_leftmost():
    # corpus: 'ab' dominates pair counts -> first merge is (a, b).
    # greedy left-to-right application on every word shape:
    toks, counts = _encode_map(["ab ab ab ab ab abab ababa aab abb"], k1=1, k2=0)
    assert toks["ab"] == "ab" and counts["ab"] == 1
    assert toks["abab"] == "ab_ab"
    assert toks["ababa"] == "ab_ab_a"
    assert toks["aab"] == "a_ab"
    assert toks["abb"] == "ab_b"


def test_bpe_same_symbol_merge_no_cascade_within_pass():
    # only 'a' pairs exist -> merge (a, a); greedy pairing halves runs,
    # odd tail stays single, and the new 'aa' symbol does NOT re-merge
    # under the same rule in the same pass
    toks, counts = _encode_map(["aa aa aa aaa aaaa aaaaa"], k1=1, k2=0)
    assert toks["aaa"] == "aa_a"
    assert toks["aaaa"] == "aa_aa"
    assert toks["aaaaa"] == "aa_aa_a"


def test_bpe_epoch2_learns_multichar_merges():
    # epoch 1 learns (a,b) [and maybe more chars]; epoch 2 sees symbol
    # sequence [ab, ab] everywhere and learns the MULTI-CHAR merge (ab, ab)
    toks, counts = _encode_map(["abab abab abab abab"], k1=1, k2=1)
    assert toks["abab"] == "abab" and counts["abab"] == 1


def test_bpe_rank_order_is_frequency_then_lexical():
    # 'xy' appears 3x weighted, 'yz' 2x: (x,y) must outrank (y,z); the word
    # 'xyz' then encodes as [xy, z] (the higher-rank merge fires first and
    # consumes the y)
    toks, _ = _encode_map(["xy xy xyz yz"], k1=2, k2=0)
    assert toks["xyz"] == "xy_z"


def test_bpe_vocab_contract_filters_and_caps():
    # words with non-[a-z0-9] chars are excluded from the vocabulary (they
    # would collide with the fold's structural characters); uppercase is
    # folded by lower(); overlong words are dropped by max_word_len
    got = _duck(
        text.gen_bpe_encode(DUCK, max_word_len=6),
        documents=_docs(["He-llo WORLD a_b c|d longerthansix ok"]),
    )
    words = set(got["word"])
    assert "world" in words and "ok" in words
    assert "he-llo" not in words and "a_b" not in words and "c|d" not in words
    assert "longerthansix" not in words


def test_bpe_no_vocab_yields_empty_encode_and_null_compression():
    got = _duck(text.gen_bpe_encode(DUCK), documents=_docs(["!!! ---", None]))
    assert len(got["word"]) == 0
    comp = _duck(text.gen_bpe_compression(DUCK), documents=_docs(["!!! ---", None]))
    assert comp["n_word_types"] == [0]
    assert comp["tokens_per_char"] == [None]


def test_bpe_compression_accounting_closes():
    # hand-checked corpus: 'ab ab cd' -> vocab ab(freq2,len2) cd(freq1,len2)
    # merges epoch1: (a,b) rank1 (count2), (c,d) rank2 (count1) -> both
    # words encode to 1 token
    comp = _duck(text.gen_bpe_compression(DUCK), documents=_docs(["ab ab cd"]))
    assert comp["n_word_types"] == [2]
    assert comp["total_words"] == [3]
    assert comp["chars_weighted"] == [6]
    assert comp["bpe_tokens_weighted"] == [3]
    assert comp["tokens_per_char"] == [0.5]
    assert comp["avg_tokens_per_word"] == [1.0]


def test_bpe_spark_duck_parity_on_mixed_fixture(spark):
    # engine parity on a fixture exercising merges, cascade shapes, and
    # filtered words together (the oracle gate's check, in-miniature)
    texts = [
        "the theme therefore then the the an and banana bandana",
        "aaa aaaa abab ababa Mixed-Case 99 bottles of 99 problems",
        None,
        "the quick brown fox jumps over the lazy dog again and again",
    ]
    pdf = _docs(texts)
    spark.createDataFrame(pdf).createOrReplaceTempView("documents")
    from storage_crawler_spark.plans.dialect import SPARK

    s = [tuple(r) for r in spark.sql(text.gen_bpe_encode(SPARK, k1=8, k2=4)).collect()]
    con = duckdb.connect()
    con.register("documents", pdf)
    d = con.execute(text.gen_bpe_encode(DUCK, k1=8, k2=4)).fetchall()
    assert s == d
