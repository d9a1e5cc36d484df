"""SimHash near-dup fingerprinting (Charikar) — Spark-only operator.

64-bit simhash over whitespace tokens: each token hashes to 64 bits (md5
prefix); bit-position vote weighted by token frequency; fingerprint = sign
vector.  Near-dups are pairs within a small Hamming distance, found by the
pigeonhole trick: split the 64 bits into 4 16-bit chunks — any pair within
Hamming distance 3 shares at least one exact chunk, so candidate pairs come
from equality joins on chunk values (shuffle on 16-bit keys), never a
cross join.

Bit-twiddling is a poor fit for SQL, so the fingerprint is an
Arrow-vectorized pandas UDF (hot loop in numpy); the chunk join and Hamming
verification are relational.  Verified by pytest (self-similarity, known
perturbations) rather than the SQL oracle.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

_BITS = 64
_MASK = (1 << _BITS) - 1


def simhash64(text: str | None) -> int | None:
    if text is None:
        return None
    votes = [0] * _BITS
    for tok in text.split(" "):
        if not tok:
            continue
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for b in range(_BITS):
            votes[b] += 1 if (h >> b) & 1 else -1
    fp = 0
    for b in range(_BITS):
        if votes[b] > 0:
            fp |= 1 << b
    # store as signed 64-bit for Spark LongType
    return fp - (1 << _BITS) if fp >= (1 << 63) else fp


@F.pandas_udf(LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    return texts.map(simhash64)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & _MASK).count("1")


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """doc_id + 64-bit simhash fingerprint."""
    return docs.select("doc_id", simhash_udf(F.col("text")).alias("simhash"))


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Candidate pairs via 16-bit chunk equality (pigeonhole over 4 chunks
    guarantees recall for distance ≤ 3), verified by exact Hamming distance.

    Fingerprints are persisted before the chunk fan-out: the pandas-UDF
    hash is the expensive stage and the plan references it on both join
    sides — without the persist Spark would recompute it per reference
    (at 100 TB: a materialized fingerprint table).  The 4-chunk fan-out is
    a single posexplode pass, not a 4-way union of re-scans.
    """
    fp = simhash_fingerprints(docs).persist()
    chunk_vals = F.array(
        *[
            F.shiftrightunsigned("simhash", c * 16).bitwiseAND(F.lit(0xFFFF))
            for c in range(4)
        ]
    )
    chunks = fp.select(
        "doc_id", "simhash", F.posexplode(chunk_vals).alias("chunk_id", "chunk_val")
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # exact Hamming verification, JVM-side (bit_count on xor)
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
