"""Distributed Lloyd's k-means over the embeddings table — the trained
coarse quantizer that upgrades the IVF similarity tier from sign-pattern
buckets (operators/similarity.py) to real learned centroids.

Spark-first shape (the one that holds at 100 TB):

- **Assign** is a map: centroids are a k×dim literal broadcast into a
  Catalyst expression (k is small by construction — a coarse quantizer is
  k ≈ √n partitions, not n), argmin of squared distance per row.  No UDF:
  the distance unrolls into `aggregate(zip_with(...))` folds.
- **Update** explodes assigned vectors to (cluster, dim_pos, value) rows and
  mean-aggregates per (cluster, dim_pos): one shuffle of n·dim skinny rows,
  partial-aggregated map-side, then k×dim means — kilobytes — collect to
  the driver for the next round's broadcast.  This is the canonical
  distributed k-means data flow (MLlib's KMeans does the same dance with a
  denser accumulator).
- **Determinism**: init = the k lowest vec_ids' vectors; ties in argmin
  break toward the lower cluster id; fixed iteration count.  Same input ⇒
  same model, so downstream entries are driver-checkable (rows-only: the
  iteration is not SQL-expressible for the DuckDB oracle).

An empty cluster keeps its previous centroid (standard Lloyd's fallback).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist2_expr(centroid: list[float]) -> str:
    """Squared L2 distance from ``ev`` to a literal centroid, as one fold."""
    arr = "array(" + ", ".join(f"CAST({c!r} AS DOUBLE)" for c in centroid) + ")"
    return (
        f"aggregate(zip_with(ev, {arr}, (u, v) -> (u - v) * (u - v)), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def assign_clusters(vectors: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """vectors(vec_id, ev) + literal centroids → (vec_id, ev, cluster);
    nearest centroid by squared L2, ties → lowest cluster id
    (array_position returns the FIRST index of the min)."""
    dists = "array(" + ", ".join(_dist2_expr(c) for c in centroids) + ")"
    return vectors.withColumn("__d", F.expr(dists)).withColumn(
        "cluster", (F.expr("array_position(__d, array_min(__d))") - 1).cast("int")
    ).drop("__d")


def farthest_first_init(vectors: DataFrame, k: int) -> list[list[float]]:
    """Deterministic k-means++-style seeding: start from the lowest vec_id,
    then repeatedly take the vector FARTHEST (max squared distance to its
    nearest chosen centroid; ties → lowest vec_id).  Farthest-first is the
    derandomized k-means++ (the 2-approximation for the k-center objective)
    — seeds spread across the data instead of the first k rows, which can
    all share one true cluster and strand Lloyd's in a poor local minimum.

    Each of the k-1 rounds is one distributed argmax over a map-only
    distance expression (TakeOrderedAndProject, one row to the driver);
    total driver state is k×dim floats.  Fully deterministic ⇒ downstream
    rows-only driver checks stay reproducible.
    """
    first = vectors.orderBy("vec_id").limit(1).select("ev").collect()
    if not first:
        raise ValueError("cannot seed k-means from an empty vector set")
    chosen: list[list[float]] = [list(first[0].ev)]
    while len(chosen) < k:
        min_d2 = "least(" + ", ".join(_dist2_expr(c) for c in chosen) + ")" \
            if len(chosen) > 1 else _dist2_expr(chosen[0])
        far = (
            vectors.select("vec_id", "ev", F.expr(min_d2).alias("d2"))
            .orderBy(F.col("d2").desc(), "vec_id")
            .limit(1)
            .collect()
        )
        if far[0].d2 == 0.0:
            # every remaining vector coincides with a chosen seed: fewer
            # than k distinct points exist.  Return the distinct seeds
            # (matching the 'first' init, which also returns < k when the
            # corpus is smaller) instead of silently duplicating centroids.
            break
        chosen.append(list(far[0].ev))
    return chosen


def kmeans_fit(
    vectors: DataFrame, k: int = 8, iters: int = 5, init: str = "first"
) -> list[list[float]]:
    """Lloyd's iterations; returns the k×dim centroid list.

    ``vectors`` needs (vec_id, ev: array<double>).  The per-iteration
    driver state is k×dim floats; everything heavy stays distributed.
    ``init``: 'first' (the k lowest vec_ids — one job, the default) or
    'farthest' (deterministic spread seeding above).  Measured on the
    synthetic embeddings the two converge to equal inertia (uniform-ish
    data has no bad seeds to avoid), so the cheap init stays default;
    'farthest' is for genuinely clustered corpora, where first-k seeds
    can all land in one true cluster.
    """
    if init == "farthest":
        centroids = farthest_first_init(vectors, k)
    else:
        init_rows = vectors.orderBy("vec_id").limit(k).select("ev").collect()
        centroids = [list(r.ev) for r in init_rows]
    if not centroids:
        # an empty store must fail LOUDLY here, not as an unresolvable
        # array_position over a zero-arm distance array three calls later
        # (empty-input battery catch); same contract as the farthest init
        raise ValueError("cannot fit k-means on an empty vector set")
    for _ in range(iters):
        assigned = assign_clusters(vectors, centroids)
        means = (
            assigned.select("cluster", F.posexplode("ev").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty cluster → keep previous
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r.cluster, {})[r.pos] = r.m
        for cid, poses in by_cluster.items():
            new[cid] = [poses[i] for i in range(len(poses))]
        centroids = new
    return centroids


def inertia(vectors: DataFrame, centroids: list[list[float]]) -> float:
    """Sum of squared distances to assigned centroids (the Lloyd's
    objective; must be non-increasing over iterations)."""
    assigned = assign_clusters(vectors, centroids)
    dist_cases = "CASE cluster " + " ".join(
        f"WHEN {i} THEN {_dist2_expr(c)}" for i, c in enumerate(centroids)
    ) + " END"
    return assigned.select(F.expr(dist_cases).alias("d2")).agg(F.sum("d2")).collect()[0][0]


def load_vectors(spark, sf_dir: str) -> DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            "label",
            F.expr("transform(embedding, v -> CAST(v AS DOUBLE))").alias("ev"),
        )
    )


def ivf_trained_topk(spark, sf_dir: str, query_vec_id: int = 0, k_neighbours: int = 10,
                     k_clusters: int = 8, iters: int = 3, nprobe: int = 2) -> DataFrame:
    """IVF top-k with TRAINED centroids: fit the coarse quantizer, assign
    the corpus, probe the ``nprobe`` clusters whose centroids are nearest
    the query (multi-probe — the standard IVF recall lever: true
    neighbours of a query near a cell boundary live in the adjacent cell,
    which single-probe misses structurally).

    The centroids are driver-held (k×dim floats), so probe selection is a
    driver-side argsort and reaches the plan as a pushed-down
    ``cluster IN (...)`` filter — no join for candidate selection at all;
    the only join is broadcasting the single query row for the cosine.
    ``nprobe = k_clusters`` degenerates to exact brute force (every cell
    probed), which is the property the recall test pins.  The plan shape
    after training matches the sign-bucket variant (bucket filter +
    map-only cosine + TakeOrderedAndProject); training cost amortizes over
    every query served from the index."""
    vectors = load_vectors(spark, sf_dir)
    vectors.persist()
    centroids = kmeans_fit(vectors, k=k_clusters, iters=iters)
    assigned = assign_clusters(vectors, centroids)
    norms = assigned.withColumn(
        "nrm", F.expr("sqrt(aggregate(zip_with(ev, ev, (u, v) -> u * v), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))")
    )
    # probe selection: the query vector is one row (O(dim) to the driver),
    # centroid distances are a python-side argsort over k scalars
    q_row = vectors.filter(F.col("vec_id") == query_vec_id).select("ev").collect()
    if not q_row:
        raise ValueError(f"query_vec_id={query_vec_id} not found")
    q_ev = list(q_row[0].ev)
    if not any(q_ev):
        raise ValueError(f"query_vec_id={query_vec_id} is the zero vector; cosine undefined")
    d2 = [
        (sum((u - v) * (u - v) for u, v in zip(q_ev, c)), i)
        for i, c in enumerate(centroids)
    ]
    probes = [i for _, i in sorted(d2)[: max(1, min(nprobe, k_clusters))]]
    q = norms.filter(F.col("vec_id") == query_vec_id).select(
        F.col("ev").alias("q_ev"), F.col("nrm").alias("q_nrm")
    )
    cos = "aggregate(zip_with(ev, q_ev, (u, v) -> u * v), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) / (nrm * q_nrm)"
    return (
        # nrm > 0: a zero-norm corpus vector would throw ANSI DIVIDE_BY_ZERO
        norms.filter((F.col("nrm") > 0) & F.col("cluster").isin(probes))
        .join(F.broadcast(q))
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", F.round(F.expr(cos), 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(k_neighbours)
    )
