"""Exact-greedy sequence packing (the stateful complement to
``text.gen_pack_bins``'s window approximation).

Greedy packing — close a bin when the next chunk would overflow — is
inherently sequential, so the distributed form runs greedy PER PARTITION:
chunks are range-partitioned and sorted by (doc_id, chunk_no), each
partition packs its own stream with a carried fill counter, and bin ids are
namespaced by partition (``pid * 2^32 + local_bin``).  Bins never span
workers — exactly what production packers do, costing at most one
underfilled bin per partition (negligible against partitions of millions of
tokens).  Unlike the window formulation, NO bin exceeds the budget (a
single over-budget chunk gets a bin of its own).

mapInPandas keeps the kernel Arrow-batched; the carry lives across batches
of one partition via the generator closure — the same per-partition
imperative pattern as the crawl's scandir kernel.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("chunk_no", T.LongType(), False),
        T.StructField("n_chunk_tokens", T.LongType(), False),
        T.StructField("bin_id", T.LongType(), False),
        T.StructField("bin_fill", T.LongType(), False),
    ]
)


def pack_greedy(chunks: DataFrame, token_budget: int = 256, n_partitions: int | None = None) -> DataFrame:
    """chunks(doc_id, chunk_no, n_chunk_tokens) → + (bin_id, bin_fill).

    ``bin_fill`` is the bin's running total AFTER this chunk — the last
    chunk of a bin carries its final fill.  Deterministic for a given
    partitioning (range partitioner boundaries are sampled with a fixed
    seed over the same input)."""
    n = n_partitions or chunks.sparkSession.sparkContext.defaultParallelism

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = int(TaskContext.get().partitionId())
        local_bin, fill = 0, 0
        for pdf in batches:
            out = []
            for doc_id, chunk_no, n_tok in zip(
                pdf["doc_id"], pdf["chunk_no"], pdf["n_chunk_tokens"], strict=True
            ):
                n_tok = int(n_tok)
                if fill > 0 and fill + n_tok > token_budget:
                    local_bin += 1
                    fill = 0
                fill += n_tok
                out.append((int(doc_id), int(chunk_no), n_tok, (pid << 32) | local_bin, fill))
            yield pd.DataFrame(out, columns=[f.name for f in PACKED_SCHEMA.fields])

    return (
        chunks.repartitionByRange(n, "doc_id", "chunk_no")
        .sortWithinPartitions("doc_id", "chunk_no")
        .mapInPandas(kernel, PACKED_SCHEMA)
    )


def pack_greedy_oracle_sql(
    token_budget: int = 256, chunk_tokens: int = 64, stride: int = 48
) -> str:
    """DuckDB-ONLY oracle for single-partition exact-greedy packing: the
    sequential fold that :func:`pack_greedy` computes per partition,
    expressed as a recursive CTE stepping one chunk at a time in
    (doc_id, chunk_no) order.  Not dialect-shared — Spark SQL has no
    recursive CTEs, and the point is an INDEPENDENT formulation of the
    same greedy contract (close the bin when the next chunk would
    overflow; an over-budget chunk gets a bin to itself).  With one
    partition, pack_greedy's pid-namespaced bin id (pid << 32 | local)
    degenerates to the plain sequential bin counter this recursion
    produces; the multi-partition path's properties (no bin over budget,
    bins never span partitions) stay pinned by pytest.

    SCALE BOUND (r12, found by the sf1.0 tier): this recursion re-joins
    the full chunk relation once per step — O(n²) in DuckDB (~280 s at
    sf0.1's 16k chunks, CPU-hours at sf1.0's 80k) — while the Spark path
    it checks stays linear (5 s at sf1.0).  Greedy packing is inherently
    sequential, so a faster INDEPENDENT relational oracle does not exist;
    the oracle compare is therefore capped at the ≤ sf0.1 gate tiers, and
    at-scale verification uses the CONTRACT properties instead
    (tests/test_round12_additions.py::test_pack_greedy_contract_at_scale:
    budget bound, fill telescoping, count preservation at 200k chunks)."""
    from storage_crawler_spark.operators.text import gen_chunk_split
    from storage_crawler_spark.plans.dialect import DUCK

    return f"""
WITH RECURSIVE chunks AS (
  SELECT doc_id, chunk_no, n_chunk_tokens,
         row_number() OVER (ORDER BY doc_id, chunk_no) AS rn
  FROM (
{gen_chunk_split(DUCK, chunk_tokens, stride)}
  ) c
),
greedy AS (
  SELECT rn, doc_id, chunk_no, n_chunk_tokens,
         CAST(0 AS BIGINT) AS bin_id, n_chunk_tokens AS bin_fill
  FROM chunks WHERE rn = 1
  UNION ALL
  SELECT c.rn, c.doc_id, c.chunk_no, c.n_chunk_tokens,
         CASE WHEN g.bin_fill > 0 AND g.bin_fill + c.n_chunk_tokens > {token_budget}
              THEN g.bin_id + 1 ELSE g.bin_id END,
         CASE WHEN g.bin_fill > 0 AND g.bin_fill + c.n_chunk_tokens > {token_budget}
              THEN c.n_chunk_tokens ELSE g.bin_fill + c.n_chunk_tokens END
  FROM greedy g JOIN chunks c ON c.rn = g.rn + 1
)
SELECT doc_id, chunk_no, n_chunk_tokens, bin_id, bin_fill
FROM greedy
""".strip()
