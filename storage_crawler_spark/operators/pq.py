"""Product quantization (PQ) over the embeddings table — the memory-compression
tier of the similarity stack (Jégou et al. 2011, public): each vector is cut
into ``m`` subvectors, each subvector is vector-quantized against its own
``ksub``-centroid codebook (trained with the distributed Lloyd's machinery in
operators/kmeans.py), and the stored representation shrinks from ``dim``
float32s to ``m`` small codes — 32× at dim=64/m=8/float32 (one byte-sized
code replaces eight 4-byte floats per subspace).  At 100 TB of embeddings
this is the difference between an index that fits executor memory and one
that doesn't.

Spark-first shape:

- **Train** — ``m`` independent Lloyd's fits, each over the subvector slice
  (a map-only projection of the corpus); per-fit driver state is
  ksub × (dim/m) floats, total m × ksub × (dim/m) = ``dim × ksub`` — a few
  KB regardless of corpus size.
- **Encode** — ONE map-only Catalyst projection: per subspace an argmin over
  ksub literal-centroid distance folds (the same expression family as
  kmeans.assign_clusters), emitting ``codes: array<int>``.  No UDF, no
  shuffle; at scale this is a streaming re-write of the embedding column.
- **ADC query** (asymmetric distance computation) — the query stays
  UN-quantized: a per-(subspace, code) lookup table of exact
  query-subvector-to-centroid distances is built driver-side (m × ksub
  doubles) and baked into a literal array-of-arrays; each row's distance
  estimate is an ``aggregate`` fold indexing the LUT by its codes — map-only,
  then TakeOrderedAndProject.  Scanning COMPRESSED codes instead of raw
  vectors is the entire point: the hot loop reads m small ints per row.
- **Determinism** — kmeans_fit is deterministic (first-k init, tie-break to
  the lower centroid id, fixed iterations), so codebooks, codes, and ADC
  rankings are rerun-stable: the driver's rows-only check is meaningful.

The iterative fit is not SQL-expressible for the DuckDB oracle, so the
registry entries are rows-only; accuracy is covered by the measured recall
probe (:func:`pq_recall`) and the clustered-corpus pytest, mirroring the
trained-IVF precedent (sim_ivf_trained_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from storage_crawler_spark.operators.kmeans import kmeans_fit, load_vectors


def _dist2(vec_expr: str, centroid: list[float]) -> str:
    """Squared L2 distance from ``vec_expr`` to a literal centroid."""
    arr = "array(" + ", ".join(f"CAST({c!r} AS DOUBLE)" for c in centroid) + ")"
    return (
        f"aggregate(zip_with({vec_expr}, {arr}, (u, v) -> (u - v) * (u - v)), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _subspace_dims(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(
            f"embedding dim {dim} is not divisible by m={m} subspaces; "
            f"pick m from the divisors of {dim}"
        )
    return dim // m


def pq_fit(
    vectors: DataFrame, dim: int, m: int = 8, ksub: int = 16, iters: int = 4
) -> list[list[list[float]]]:
    """Train the ``m`` codebooks; returns codebooks[s] = ksub × (dim/m)
    centroid lists.  Each subspace fit sees only its slice — a map-only
    projection — and runs the shared distributed Lloyd's loop."""
    dsub = _subspace_dims(dim, m)
    codebooks = []
    for s in range(m):
        sub = vectors.select(
            "vec_id", F.expr(f"slice(ev, {s * dsub + 1}, {dsub})").alias("ev")
        )
        codebooks.append(kmeans_fit(sub, k=ksub, iters=iters))
    return codebooks


def pq_encode(vectors: DataFrame, codebooks: list[list[list[float]]]) -> DataFrame:
    """vectors(vec_id, label, ev) → (vec_id, label, codes array<int>); one
    map-only projection, argmin per subspace with ties to the lower code
    (array_position returns the FIRST index of the min)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    code_exprs = []
    for s in range(m):
        sub = f"slice(ev, {s * dsub + 1}, {dsub})"
        dists = "array(" + ", ".join(_dist2(sub, c) for c in codebooks[s]) + ")"
        code_exprs.append(
            f"CAST(array_position({dists}, array_min({dists})) - 1 AS INT)"
        )
    codes = "array(" + ", ".join(code_exprs) + ")"
    return vectors.select("vec_id", "label", F.expr(codes).alias("codes"))


def _adc_lut(q_ev: list[float], codebooks: list[list[list[float]]]) -> list[list[float]]:
    """Exact squared distances from each query SUBvector to every centroid
    of its subspace — the ADC lookup table (m × ksub doubles)."""
    dsub = len(codebooks[0][0])
    lut = []
    for s, book in enumerate(codebooks):
        q_sub = q_ev[s * dsub : (s + 1) * dsub]
        lut.append(
            [sum((u - v) * (u - v) for u, v in zip(q_sub, c)) for c in book]
        )
    return lut


def pq_adc_topk(
    spark,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
) -> DataFrame:
    """Approximate k-nearest-neighbours of ``query_vec_id`` by PQ/ADC:
    (vec_id, label, est_d2) ranked by estimated squared L2 distance.

    The scan reads only the codes column; the LUT fold is
    ``sum_s lut[s][codes[s]]`` — m literal-array lookups per row inside
    whole-stage codegen, fused to TakeOrderedAndProject."""
    vectors = load_vectors(spark, sf_dir)
    vectors.persist()
    try:
        first = vectors.select(F.size("ev").alias("d")).limit(1).collect()
        if not first:
            raise ValueError("empty embeddings table")
        dim = first[0].d
        codebooks = pq_fit(vectors, dim, m=m, ksub=ksub, iters=iters)
        codes = pq_encode(vectors, codebooks)
        q_row = vectors.filter(F.col("vec_id") == query_vec_id).select("ev").collect()
        if not q_row:
            raise ValueError(f"query_vec_id={query_vec_id} not found")
        lut = _adc_lut(list(q_row[0].ev), codebooks)
        lut_lit = (
            "array("
            + ", ".join(
                "array(" + ", ".join(f"CAST({d!r} AS DOUBLE)" for d in row) + ")"
                for row in lut
            )
            + ")"
        )
        est = (
            f"aggregate(sequence(1, {m}), CAST(0.0 AS DOUBLE), (acc, s) -> "
            f"acc + element_at(element_at({lut_lit}, s), element_at(codes, s) + 1))"
        )
        return (
            codes.filter(F.col("vec_id") != query_vec_id)
            .select("vec_id", "label", F.round(F.expr(est), 6).alias("est_d2"))
            .orderBy("est_d2", "vec_id")
            .limit(k)
        )
    finally:
        vectors.unpersist()


def pq_recall(
    spark,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
) -> DataFrame:
    """Recall@k of the PQ/ADC ranking against the exact squared-L2 top-k —
    the measured-accuracy contract of the compressed tier (same shape as
    gen_ivf_recall / gen_rp_lsh_recall, driver-composed because the fit is
    iterative).  One row: k, n_hits, recall."""
    vectors = load_vectors(spark, sf_dir)
    q_row = vectors.filter(F.col("vec_id") == query_vec_id).select("ev").collect()
    if not q_row:
        raise ValueError(f"query_vec_id={query_vec_id} not found")
    q_arr = (
        "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in q_row[0].ev) + ")"
    )
    exact_d2 = (
        f"aggregate(zip_with(ev, {q_arr}, (u, v) -> (u - v) * (u - v)), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    exact = (
        vectors.filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", F.expr(exact_d2).alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(k)
    )
    approx = pq_adc_topk(spark, sf_dir, query_vec_id, k, m, ksub, iters)
    hits = exact.join(approx, "vec_id").count()
    return spark.createDataFrame(
        [(k, hits, round(hits / k, 6))], "k int, n_hits int, recall double"
    )
