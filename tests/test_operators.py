"""Operator tests: multimodal fan-out/resize plumbing, embedding near-dup."""

from __future__ import annotations

from pyspark.sql import functions as F

from storage_crawler_spark.operators.multimodal import (
    documents_as_media,
    frame_sample,
    resize_stub,
)

SF_DIR = "/root/testdata/sf0.001"


def _register_events(spark):
    from storage_crawler_spark.plans.views import register_base_tables

    register_base_tables(spark, SF_DIR, ("events",))


def _media(spark):
    spark.read.parquet(f"{SF_DIR}/documents.parquet").createOrReplaceTempView("documents")
    return documents_as_media(spark.table("documents"))


def test_frame_sample_fanout(spark):
    media = _media(spark)
    frames = frame_sample(media, n_frames=4, frame_len=64)
    n_docs = media.count()
    stats = frames.groupBy("doc_id").agg(F.count("*").alias("k")).collect()
    assert len(stats) == n_docs  # every doc yields >= 1 frame
    assert all(1 <= r.k <= 4 for r in stats)
    # frame bytes are real slices of the payload
    one = frames.filter("doc_id = 0 AND frame_no = 0").collect()[0]
    doc0 = media.filter("doc_id = 0").collect()[0]
    assert bytes(one.frame_bytes) == bytes(doc0.content)[one.frame_offset : one.frame_offset + 64]


def test_frame_sample_deterministic(spark):
    media = _media(spark)
    a = sorted(map(tuple, frame_sample(media).select("doc_id", "frame_no", "frame_offset").collect()))
    b = sorted(map(tuple, frame_sample(media).select("doc_id", "frame_no", "frame_offset").collect()))
    assert a == b


def test_resize_stub_bounds(spark):
    media = _media(spark)
    resized = resize_stub(media, target_w=64, target_h=64)
    rows = resized.collect()
    assert len(rows) == media.count()
    target_bytes = max(64 * 64 // 256, 16)
    for r in rows:
        assert r.width == 64 and r.height == 64
        assert r.content is not None and len(bytes(r.content)) <= target_bytes


def test_embedding_near_dup_matches_brute_force(spark):
    """The bucketed near-dup must agree with a brute-force filter restricted
    to same-bucket pairs (the blocking is the only approximation)."""
    from storage_crawler_spark.operators.similarity import gen_embedding_near_dup
    from storage_crawler_spark.plans.dialect import SPARK

    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").createOrReplaceTempView("embeddings")
    out = spark.sql(gen_embedding_near_dup(SPARK, threshold=0.3)).collect()
    assert all(r.cosine >= 0.3 for r in out)
    assert all(r.vec_a < r.vec_b for r in out)


def test_sketch_distinct_within_tolerance(spark):
    from storage_crawler_spark.operators.sketches import approx_distinct_by

    _register_events(spark)
    ev = spark.table("events")
    approx = {r.event_type: r.approx_distinct_user_id for r in approx_distinct_by(ev, "event_type", "user_id").collect()}
    exact = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()}
    assert set(approx) == set(exact)
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(0.05 * e, 2), (k, approx[k], e)


def test_sketch_quantiles_ordered_and_bounded(spark):
    from storage_crawler_spark.operators.sketches import approx_quantiles_by

    _register_events(spark)
    ev = spark.table("events")
    rows = approx_quantiles_by(ev, "event_type", "value").collect()
    bounds = {
        r.event_type: (r.lo, r.hi)
        for r in ev.groupBy("event_type").agg(F.min("value").alias("lo"), F.max("value").alias("hi")).collect()
    }
    assert rows
    for r in rows:
        qs = [r.p25, r.p50, r.p90, r.p99]
        if any(q is None for q in qs):
            continue  # all-NULL value groups (e.g. signup events)
        assert qs == sorted(qs)
        lo, hi = bounds[r.event_type]
        assert lo <= qs[0] and qs[-1] <= hi


def test_heavy_hitter_sketch_deterministic(spark):
    from storage_crawler_spark.operators.sketches import heavy_hitter_sketch

    _register_events(spark)
    ev = spark.table("events")
    a = bytes(heavy_hitter_sketch(ev, "event_type").collect()[0].cms)
    b = bytes(heavy_hitter_sketch(ev, "event_type").collect()[0].cms)
    assert a == b and len(a) > 0


# -- jaccard block cap (operators/dedup.py) ---------------------------------


def test_jaccard_block_cap_bounds_skewed_corpus(spark):
    """A same-lang same-length corpus (the pathological case for length
    blocking) must stay bounded under the rank cap, and the diagnostic must
    report the dropped comparisons instead of hiding them."""
    from storage_crawler_spark.operators.dedup import gen_jaccard_dropped, gen_jaccard_pairs
    from storage_crawler_spark.plans.dialect import SPARK

    rows = []
    for i in range(200):
        text = f"a{i % 4} b{i % 4} c{i % 4} d{i % 4}"  # 4 disjoint templates, equal length
        rows.append((i, "en", text, len(text)))
    spark.createDataFrame(
        rows, "doc_id LONG, lang STRING, text STRING, n_chars INT"
    ).createOrReplaceTempView("documents")
    try:
        # cap 1024 > any rank distance in this 200-doc corpus ⇒ exact result
        uncapped = {
            (r.doc_a, r.doc_b)
            for r in spark.sql(gen_jaccard_pairs(SPARK, block_cap=1024)).collect()
        }
        capped = {
            (r.doc_a, r.doc_b)
            for r in spark.sql(gen_jaccard_pairs(SPARK, block_cap=8)).collect()
        }
        assert len(uncapped) == 4 * (50 * 49) // 2  # full quadratic-per-template answer
        assert capped <= uncapped
        assert 0 < len(capped) <= 200 * 8  # work bounded by n·cap, not n²
        diag = {r.lang: r for r in spark.sql(gen_jaccard_dropped(SPARK, block_cap=8)).collect()}
        assert diag["en"].max_neighbors == 199
        assert diag["en"].est_dropped_pairs > 0
        # with a cap wider than any neighborhood the capped result is exact
        diag_wide = spark.sql(gen_jaccard_dropped(SPARK, block_cap=1_000_000)).collect()
        assert all(r.est_dropped_pairs == 0 for r in diag_wide)
    finally:
        spark.catalog.dropTempView("documents")


def test_scalable_lang_rank_equals_window(spark):
    """Two-phase range-partitioned rank must be bit-identical to
    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id),
    including a skewed lang that spans many range partitions and ties on
    n_chars (broken by doc_id)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from storage_crawler_spark.operators.dedup import scalable_lang_rank

    rng = random.Random(3)
    rows = [
        (i, "big" if i % 10 else "rare", rng.choice([50, 50, 50, 100, rng.randint(1, 500)]))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, n_chars LONG")
    got = {r.doc_id: r.rnk for r in scalable_lang_rank(df, n_partitions=16).collect()}
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    want = {r.doc_id: r.rnk for r in df.withColumn("rnk", F.row_number().over(w)).collect()}
    assert got == want


# -- substring-span dedup (operators/dedup.py) -------------------------------


def test_substring_spans_finds_cross_doc_duplicate_run(spark):
    """Two docs share an exact 48-token run at stride-aligned offsets; the
    sampled-window sweep must surface at least one shared span keyed to
    both docs, an unrelated doc must contribute nothing, and a doc shorter
    than the window must not explode (Spark's sequence() counts DOWN on
    lo > hi — the guard must precede the lateral)."""
    from storage_crawler_spark.operators.dedup import gen_substring_spans
    from storage_crawler_spark.plans.dialect import SPARK

    shared = " ".join(f"s{i}" for i in range(48))
    doc_a = " ".join(f"a{i}" for i in range(16)) + " " + shared + " tail_a"
    doc_b = " ".join(f"b{i}" for i in range(8)) + " " + shared + " tail_b"
    other = " ".join(f"z{i}" for i in range(80))
    short = "tiny doc"
    spark.createDataFrame(
        [(0, doc_a), (1, doc_b), (2, other), (3, short)], "doc_id LONG, text STRING"
    ).createOrReplaceTempView("documents")
    try:
        rows = spark.sql(gen_substring_spans(SPARK, width=32, stride=8)).collect()
        assert rows, "shared 48-token run not detected"
        # every reported span is cross-doc by construction of the HAVING
        assert all(r.n_docs >= 2 for r in rows)
        # the only cross-doc material is the shared run between docs 0 and 1
        assert all(r.first_doc_id == 0 for r in rows)

        # companion quality signal: sharers have dup_ratio > 0, the
        # unrelated doc reports 0, the short doc emits no windows at all
        from storage_crawler_spark.operators.dedup import gen_dup_span_ratio

        ratios = {
            r.doc_id: r for r in spark.sql(gen_dup_span_ratio(SPARK, width=32, stride=8)).collect()
        }
        assert ratios[0].dup_ratio > 0 and ratios[1].dup_ratio > 0
        assert ratios[2].dup_ratio == 0.0
        assert 3 not in ratios  # shorter than the window: no sampled windows
    finally:
        spark.catalog.dropTempView("documents")


def test_split_contamination_detects_cross_split_span(spark):
    """Plant an identical 40-token run in one train doc and one test doc
    (doc ids chosen by querying the deterministic split itself); the
    contamination report must surface it with the right per-split counts,
    and a train-only duplicate must NOT appear."""
    from storage_crawler_spark.operators.pipeline import gen_split_contamination
    from storage_crawler_spark.operators.sampling import gen_split_assign
    from storage_crawler_spark.plans.dialect import SPARK

    ids = spark.createDataFrame([(i,) for i in range(300)], "doc_id LONG")
    ids.createOrReplaceTempView("documents")
    try:
        splits = {
            r.doc_id: r.split
            for r in spark.sql(gen_split_assign(SPARK, src="documents")).collect()
        }
        train_ids = [i for i, s in splits.items() if s == "train"]
        test_id = next(i for i, s in splits.items() if s == "test")
        shared = " ".join(f"c{i}" for i in range(40))
        filler = lambda tag: " ".join(f"{tag}{i}" for i in range(40))  # noqa: E731
        docs = [
            (train_ids[0], shared),                 # train copy
            (test_id, shared),                      # test copy -> contaminated
            (train_ids[1], filler("t")),            # train-only duplicate pair...
            (train_ids[2], filler("t")),            # ...must NOT be reported
        ]
        spark.createDataFrame(docs, "doc_id LONG, text STRING").createOrReplaceTempView(
            "documents"
        )
        rows = spark.sql(gen_split_contamination(SPARK)).collect()
        assert rows, "planted cross-split span not detected"
        assert all(r.n_train > 0 and (r.n_val + r.n_test) > 0 for r in rows)
        assert all(r.example_eval_doc == test_id for r in rows)
    finally:
        spark.catalog.dropTempView("documents")


# -- simhash (operators/simhash.py) -----------------------------------------


def test_simhash_batch_equals_scalar():
    """The vectorized batch path must be bit-identical to the scalar
    reference, including None / empty / whitespace-only edge docs."""
    import random

    import pandas as pd

    from storage_crawler_spark.operators.simhash import simhash64, simhash64_batch

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(300)]
    docs = [
        " ".join(rng.choices(vocab, k=rng.randint(0, 120))) for _ in range(200)
    ] + [None, "", "   ", "single", "a  b   c"]
    got = simhash64_batch(pd.Series(docs, dtype=object)).tolist()
    assert got == [simhash64(d) for d in docs]


def test_simhash_batch_work_is_sublinear_in_occurrences():
    """The batch path's scale contract, asserted on WORK not wall-clock
    (this sandbox throttles CPU unpredictably): md5 must run once per
    DISTINCT token in the batch — not once per occurrence as the scalar
    reference does — and the 64-bit vote must not loop in Python (no
    per-row Python beyond tokenize; enforced by the md5 bound, since the
    scalar path cannot produce fingerprints without per-occurrence hashing)."""
    import random
    from unittest import mock

    import pandas as pd

    import storage_crawler_spark.operators.simhash as sh

    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(500)]
    docs = [" ".join(rng.choices(vocab, k=150)) for _ in range(1000)]  # 150k occurrences
    s = pd.Series(docs, dtype=object)

    calls = {"n": 0}
    real_md5 = sh.hashlib.md5

    def counting_md5(data):
        calls["n"] += 1
        return real_md5(data)

    with mock.patch.object(sh.hashlib, "md5", counting_md5):
        got = sh.simhash64_batch(s).tolist()
    assert calls["n"] <= len(vocab)  # one md5 per distinct token, not 150 000
    assert got == [sh.simhash64(d) for d in docs]


def test_simhash_near_dups_finds_perturbed_doc(spark):
    """A doc and its single-token-perturbed copy land within the Hamming
    radius the 8×8-bit pigeonhole guarantees (≤ 7); an unrelated doc does
    not pair with either."""
    from storage_crawler_spark.operators.simhash import (
        hamming64,
        simhash64,
        simhash_near_dups,
    )

    base = " ".join(f"w{i}" for i in range(400))
    near = " ".join(f"w{i}" for i in range(399)) + " x0"
    other = " ".join(f"z{i}" for i in range(400))
    assert hamming64(simhash64(base), simhash64(near)) <= 7  # within guarantee
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, other)], "doc_id LONG, text STRING"
    )
    pairs = {(r.doc_a, r.doc_b) for r in simhash_near_dups(docs, max_hamming=7).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_near_dups_recall_at_distance_5(spark):
    """The round-2..3 wart made concrete: a pair at Hamming distance 4..7 is
    OUTSIDE the old 4×16-bit guarantee but inside the 8×8-bit one.  Find a
    perturbation at measured distance 5-7 and require the pair to be
    returned; also require the contract to reject max_hamming beyond the
    pigeonhole bound instead of silently under-recalling."""
    import pytest

    from storage_crawler_spark.operators.simhash import (
        hamming64,
        simhash64,
        simhash_near_dups,
    )

    base = " ".join(f"w{i}" for i in range(400))
    h_base = simhash64(base)
    far = None
    for k in range(2, 40):  # grow the perturbation until distance lands in [4, 7]
        cand = " ".join(f"w{i}" for i in range(400 - k)) + " " + " ".join(f"x{i}" for i in range(k))
        d = hamming64(h_base, simhash64(cand))
        if 4 <= d <= 7:
            far = cand
            break
    assert far is not None, "no perturbation landed in distance [4, 7]"
    docs = spark.createDataFrame([(0, base), (1, far)], "doc_id LONG, text STRING")
    pairs = {(r.doc_a, r.doc_b) for r in simhash_near_dups(docs, max_hamming=7).collect()}
    assert (0, 1) in pairs

    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dups(docs, max_hamming=10)


# -- greedy packing (operators/packing.py) -----------------------------------


def test_pack_greedy_respects_budget_and_covers_all_chunks(spark):
    """Exact-greedy packing: no bin exceeds the budget unless a single
    chunk alone does; every chunk lands in exactly one bin; chunks of one
    bin are contiguous in (doc_id, chunk_no) order."""
    import random

    from storage_crawler_spark.operators.packing import pack_greedy

    rng = random.Random(5)
    rows = [(d, c, rng.randint(10, 90)) for d in range(40) for c in range(rng.randint(1, 5))]
    chunks = spark.createDataFrame(rows, "doc_id LONG, chunk_no LONG, n_chunk_tokens LONG")
    packed = pack_greedy(chunks, token_budget=128, n_partitions=4).collect()

    assert len(packed) == len(rows)
    assert {(r.doc_id, r.chunk_no) for r in packed} == {(d, c) for d, c, _ in rows}
    by_bin: dict[int, list] = {}
    for r in packed:
        by_bin.setdefault(r.bin_id, []).append(r)
    for rs in by_bin.values():
        total = sum(r.n_chunk_tokens for r in rs)
        assert total <= 128 or len(rs) == 1
        assert max(r.bin_fill for r in rs) == total
        # contiguity: bins hold consecutive chunks of the sorted stream
        keys = sorted((r.doc_id, r.chunk_no) for r in rs)
        all_sorted = sorted((d, c) for d, c, _ in rows)
        i = all_sorted.index(keys[0])
        assert all_sorted[i : i + len(keys)] == keys


# -- k-means / trained IVF (operators/kmeans.py) -----------------------------


def test_kmeans_inertia_monotone_and_deterministic(spark):
    """Lloyd's objective must be non-increasing over iterations, the fit
    deterministic across reruns, and every cluster id in range."""
    from storage_crawler_spark.operators.kmeans import (
        assign_clusters,
        inertia,
        kmeans_fit,
        load_vectors,
    )

    vectors = load_vectors(spark, "/root/testdata/sf0.001")
    vectors.persist()
    prev = None
    for iters in (1, 2, 4):
        c = kmeans_fit(vectors, k=4, iters=iters)
        cur = inertia(vectors, c)
        if prev is not None:
            assert cur <= prev + 1e-9
        prev = cur
    again = kmeans_fit(vectors, k=4, iters=4)
    assert inertia(vectors, again) == prev  # bit-stable rerun
    clusters = {r.cluster for r in assign_clusters(vectors, again).select("cluster").distinct().collect()}
    assert clusters <= set(range(4)) and len(clusters) >= 2

    # farthest-first seeding: deterministic, k distinct spread seeds, and a
    # fit quality in the same regime as the cheap init on this corpus
    from storage_crawler_spark.operators.kmeans import farthest_first_init

    seeds = farthest_first_init(vectors, 4)
    assert seeds == farthest_first_init(vectors, 4)  # bit-stable
    assert len({tuple(s) for s in seeds}) == 4  # distinct seeds
    far = kmeans_fit(vectors, k=4, iters=4, init="farthest")
    assert inertia(vectors, far) <= prev * 1.05

    # k > distinct points: return the distinct seeds, never duplicates
    spark_df = vectors.sparkSession.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [0.0, 0.0])],
        "vec_id LONG, ev ARRAY<DOUBLE>",
    )
    small = farthest_first_init(spark_df, 5)
    assert len(small) == 2 and len({tuple(s) for s in small}) == 2


def test_ivf_trained_topk_shape(spark):
    from storage_crawler_spark.operators.kmeans import ivf_trained_topk

    rows = ivf_trained_topk(spark, "/root/testdata/sf0.001", k_neighbours=5).collect()
    assert 0 < len(rows) <= 5
    assert rows[0].cosine >= rows[-1].cosine  # ranked
    assert all(r.vec_id != 0 for r in rows)  # query excluded


def test_ivf_trained_multiprobe_recall(spark):
    """Multi-probe contract: probing every cell (nprobe = k_clusters) is
    exact brute force — its top-k id set must equal the full-scan cosine
    top-k — and recall is monotone in nprobe (more cells probed can never
    lose a neighbour that fewer cells found)."""
    from storage_crawler_spark.operators.kmeans import ivf_trained_topk

    sf = "/root/testdata/sf0.001"
    k = 8

    def ids(nprobe):
        return {
            r.vec_id
            for r in ivf_trained_topk(
                spark, sf, k_neighbours=k, k_clusters=4, nprobe=nprobe
            ).collect()
        }

    exact = ids(4)  # every cell probed == brute force
    # independent brute-force oracle: full-scan cosine top-k via the
    # sign-bucket module's exact generator
    from storage_crawler_spark.operators.similarity import gen_cosine_topk
    from storage_crawler_spark.plans.dialect import SPARK
    from storage_crawler_spark.plans import views as V

    V.register_base_tables(spark, sf, ("embeddings",))
    brute = {r.vec_id for r in spark.sql(gen_cosine_topk(SPARK, 0, k)).collect()}
    assert exact == brute
    r1, r2 = len(ids(1) & brute), len(ids(2) & brute)
    assert r1 <= r2 <= k  # recall monotone in nprobe


# -- media header parsing (operators/multimodal.py) -------------------------


def test_sniff_header_formats_and_edge_cases():
    """Byte-level header parser: every synthesized format round-trips, and
    malformed/truncated/non-canonical inputs degrade to None instead of
    raising (executor-safety contract for mapInPandas kernels)."""
    import struct

    from storage_crawler_spark.operators.multimodal import _synth_blob, sniff_header

    for doc_id in range(25):
        info = sniff_header(_synth_blob(doc_id))
        kind = doc_id % 5
        assert info["format"] == ("png", "gif", "bmp", "wav", "jpeg")[kind]
        if kind in (0, 1, 2, 4):
            assert info["width"] == doc_id % 640 + 1
            assert info["height"] == (doc_id * 7) % 480 + 1
        else:
            assert info["channels"] == doc_id % 2 + 1
            assert info["sample_rate_hz"] == 8000 + (doc_id % 3) * 4000

    assert sniff_header(None)["format"] is None
    assert sniff_header(b"")["format"] is None
    assert sniff_header(b"garbage not a header")["format"] is None
    assert sniff_header(_synth_blob(0)[:10])["format"] is None  # truncated PNG

    # WAV with a LIST chunk before fmt (non-canonical order must still parse)
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 12 + 24) + b"WAVE"
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"fmt " + struct.pack("<I", 16) + fmt
    )
    info = sniff_header(wav)
    assert (info["format"], info["channels"], info["sample_rate_hz"]) == ("wav", 2, 44100)

    # JPEG with an APP0 segment before SOF0 (the common JFIF layout)
    sof = struct.pack(">BHHB", 8, 99, 44, 1) + b"\x01\x11\x00"
    jfif = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x01\x02" + b"\x00" * 7
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xd9"
    )
    info = sniff_header(jfif)
    assert (info["format"], info["width"], info["height"]) == ("jpeg", 44, 99)


# -- dedup clustering (operators/cluster.py) --------------------------------


def test_connected_components_chain_clique_singleton(spark):
    """Min-label propagation must handle: a 4-node chain (needs >1 round —
    label 0 travels hop by hop), a 3-clique, an isolated node, and must be
    deterministic (component = min reachable doc_id)."""
    from storage_crawler_spark.operators.cluster import connected_components

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (10, 12)],
        "doc_a LONG, doc_b LONG",
    )
    nodes = spark.createDataFrame([(i,) for i in (0, 1, 2, 3, 10, 11, 12, 99)], "doc_id LONG")
    rows = {r.doc_id: r for r in connected_components(edges, nodes).collect()}
    assert {i: rows[i].component for i in rows} == {
        0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 12: 10, 99: 99,
    }
    assert rows[0].cluster_size == 4 and rows[0].is_keeper == 1
    assert rows[3].cluster_size == 4 and rows[3].is_keeper == 0
    assert rows[12].cluster_size == 3
    assert rows[99].cluster_size == 1 and rows[99].is_keeper == 1


# -- temporal joins (operators/temporal.py) ---------------------------------


def test_asof_join_micro(spark):
    from storage_crawler_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 200), (3, "u2", 50), (4, "u3", 10)],
        "id LONG, k STRING, ts LONG",
    )
    right = spark.createDataFrame(
        [("u1", 100), ("u1", 150), ("u2", 60), ("u2", 40)], "k STRING, ts LONG"
    )
    out = {r.id: (r.asof_ts, r.asof_n) for r in
           asof_join(left, right, key="k", left_ts="ts", right_ts="ts").collect()}
    assert out[1] == (100, 1)   # equal ts is inclusive
    assert out[2] == (150, 2)
    assert out[3] == (40, 1)    # 60 is after 50
    assert out[4] == (None, 0)  # no right rows for u3


def test_asof_null_keys_never_match(spark):
    """SQL-equality semantics on NULL keys: a NULL-key left row must NOT
    match NULL-key right rows (Window.partitionBy would group them into one
    NULL partition otherwise — r6 ADVICE item, temporal.py)."""
    from storage_crawler_spark.operators.temporal import (
        asof_join,
        asof_join_forward,
        asof_join_tolerance,
    )

    left = spark.createDataFrame(
        [(1, None, 100), (2, "u1", 100)], "id LONG, k STRING, ts LONG"
    )
    right = spark.createDataFrame(
        [(None, 50), (None, 150), ("u1", 50)], "k STRING, ts LONG"
    )
    back = {r.id: (r.asof_ts, r.asof_n) for r in
            asof_join(left, right, key="k", left_ts="ts", right_ts="ts").collect()}
    assert back[1] == (None, 0)   # NULL key: unmatched, not paired with NULL rights
    assert back[2] == (50, 1)
    fwd = {r.id: (r.next_ts, r.next_n) for r in
           asof_join_forward(left, right, key="k", left_ts="ts", right_ts="ts").collect()}
    assert fwd[1] == (None, 0)
    tol = {r.id: (r.asof_ts, r.asof_n) for r in
           asof_join_tolerance(left, right, key="k", left_ts="ts", right_ts="ts",
                               tolerance_s=1000).collect()}
    assert tol[1] == (None, 0)
    assert tol[2] == (50, 1)


def test_range_join_micro(spark):
    from storage_crawler_spark.operators.temporal import range_join
    from pyspark.sql import functions as F

    a = spark.createDataFrame(
        [(1, "u1", 0), (2, "u1", 95), (3, "u2", 0)], "ev_a LONG, k STRING, a_ts LONG"
    )
    b = spark.createDataFrame(
        [(10, "u1", 100), (11, "u1", 101), (12, "u2", 500)], "ev_b LONG, k STRING, b_ts LONG"
    )
    out = range_join(a, b, key="k", left_ts="a_ts", right_ts="b_ts", width_s=100)
    pairs = sorted((r.ev_a, r.ev_b) for r in out.collect())
    # (1,10): delta 100 <= 100 ok (bucket boundary: 0→blk0, 100→blk1);
    # (1,11): delta 101 excluded; (2,10): delta 5; (2,11): delta 6;
    # (3,12): delta 500 excluded
    assert pairs == [(1, 10), (2, 10), (2, 11)]
    # the plan must be a hash join on the bucketed keys, not a nested loop
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_connected_components_nonconvergence_raises(spark):
    """A chain whose diameter exceeds max_iter must raise, not silently
    return wrong component ids (the label needs ~n rounds to cross an
    n-node chain)."""
    import pytest

    from storage_crawler_spark.operators.cluster import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a LONG, doc_b LONG"
    )
    nodes = spark.createDataFrame([(i,) for i in range(13)], "doc_id LONG")
    with pytest.raises(RuntimeError, match="could not confirm convergence"):
        connected_components(edges, nodes, max_iter=2)
    # and with enough rounds the same graph resolves to one component
    rows = connected_components(edges, nodes, max_iter=20).collect()
    assert {r.component for r in rows} == {0}


def test_connected_components_logarithmic_on_long_chain(spark):
    """Pointer doubling makes a 200-node chain converge in O(log n) rounds:
    12 rounds suffice with the shortcut (log2(200) ≈ 7.6 + slack), while the
    plain one-hop propagation provably cannot cross 199 hops in 12 rounds —
    the budget only works because the shortcut halves label chains."""
    import pytest

    from storage_crawler_spark.operators.cluster import connected_components

    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a LONG, doc_b LONG"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id LONG")
    rows = connected_components(edges, nodes, max_iter=12).collect()
    assert {r.component for r in rows} == {0}
    assert all(r.cluster_size == n for r in rows)
    with pytest.raises(RuntimeError, match="could not confirm convergence"):
        connected_components(edges, nodes, max_iter=12, shortcut=False)


def test_scalable_lang_rank_null_lang(spark):
    """NULL lang must neither crash the driver-side offset sort nor drop
    rows at the offset join: output matches the window formulation, which
    treats NULL as its own partition."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from storage_crawler_spark.operators.dedup import scalable_lang_rank

    rows = [
        (i, None if i % 3 == 0 else ("en" if i % 2 else "de"), (i * 37) % 211)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, n_chars LONG")
    got = {r.doc_id: r.rnk for r in scalable_lang_rank(df, n_partitions=8).collect()}
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    want = {r.doc_id: r.rnk for r in df.withColumn("rnk", F.row_number().over(w)).collect()}
    assert got == want


# ---- round-5 n-gram plane: semantic behavior (parity is covered by the
# randomized batteries; these pin the MEANING of the outputs) --------------


def _docs_view(spark, rows):
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).createOrReplaceTempView("documents")


def test_boilerplate_ngrams_ranks_injected_banner_first(spark):
    from storage_crawler_spark.operators.text import gen_boilerplate_ngrams
    from storage_crawler_spark.plans.dialect import SPARK

    banner = "subscribe to our newsletter now"
    rows = [
        (i, f"u{i} v{i} w{i} x{i} {banner}", "en", "src0", 0) for i in range(6)
    ] + [(10, "totally unrelated text body", "en", "src1", 0)]
    _docs_view(spark, rows)
    top = spark.sql(gen_boilerplate_ngrams(SPARK, n=5, top_k=3)).collect()
    assert top[0].ngram == banner
    assert top[0].n_docs == 6 and top[0].n_occur == 6


def test_ngram_contamination_flags_train_duplicate(spark):
    from storage_crawler_spark.operators.pipeline import gen_ngram_contamination
    from storage_crawler_spark.operators.sampling import N_BUCKETS, split_bucket_expr
    from storage_crawler_spark.plans.dialect import SPARK

    # pick ids by their actual split buckets so the test is robust to the
    # md5 split assignment: one train id, two eval ids
    import duckdb

    from storage_crawler_spark.plans.dialect import DUCK

    con = duckdb.connect()
    bucket = split_bucket_expr(DUCK, id_col="i")
    ids = con.execute(
        f"SELECT i, {bucket} AS b FROM (SELECT unnest(generate_series(0, 200)) AS i)"
    ).fetchall()
    train_hi = 80 * N_BUCKETS // 100
    train_id = next(i for i, b in ids if b < train_hi)
    eval_ids = [i for i, b in ids if b >= train_hi]
    dup_eval, clean_eval = eval_ids[0], eval_ids[1]

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (train_id, shared, "en", "src0", 0),
        (dup_eval, shared, "en", "src0", 0),  # verbatim train text in eval
        (clean_eval, "one two three four five six", "en", "src0", 0),
    ]
    _docs_view(spark, rows)
    out = {r.doc_id: r for r in spark.sql(gen_ngram_contamination(SPARK, n=5)).collect()}
    assert train_id not in out  # train docs are not reported
    assert out[dup_eval].contaminated_frac == 1.0 and out[dup_eval].flagged == 1
    assert out[clean_eval].n_in_train == 0 and out[clean_eval].flagged == 0


def test_domain_mixture_weights_sum_to_one_and_lift_small_domains(spark):
    from storage_crawler_spark.operators.pipeline import gen_domain_mixture
    from storage_crawler_spark.plans.dialect import SPARK

    rows = [(i, "w " * 50, "en", "big", 0) for i in range(9)] + [
        (100, "w " * 50, "en", "small", 0)
    ]
    _docs_view(spark, rows)
    out = {r.source: r for r in spark.sql(gen_domain_mixture(SPARK)).collect()}
    assert abs(sum(r.mix_weight for r in out.values()) - 1.0) < 1e-5
    assert abs(sum(r.token_share for r in out.values()) - 1.0) < 1e-5
    # alpha=0.5 lifts the small domain above its raw share and caps the big one
    assert out["small"].mix_weight > out["small"].token_share
    assert out["big"].mix_weight < out["big"].token_share
    # NULL text counts zero tokens but the doc still counts
    _docs_view(spark, rows + [(101, None, "en", "small", 0)])
    out2 = {r.source: r for r in spark.sql(gen_domain_mixture(SPARK)).collect()}
    assert out2["small"].n_docs == 2
    assert out2["small"].sum_tokens == out["small"].sum_tokens


# ---- large-star/small-star CC (scale path) ------------------------------


def _cc_both(spark, edge_rows, node_ids):
    from storage_crawler_spark.operators.cluster import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(edge_rows or [(0, 0)], "doc_a LONG, doc_b LONG")
    if not edge_rows:
        edges = edges.filter("doc_a != doc_a")  # empty with schema
    nodes = spark.createDataFrame([(i,) for i in node_ids], "doc_id LONG")
    a = {r.doc_id: (r.component, r.cluster_size, r.is_keeper)
         for r in connected_components(edges, nodes).collect()}
    b = {r.doc_id: (r.component, r.cluster_size, r.is_keeper)
         for r in connected_components_star(edges, nodes).collect()}
    return a, b


def test_cc_star_matches_propagation_on_chain_clique_singletons(spark):
    chain = [(i, i + 1) for i in range(20, 40)]
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    a, b = _cc_both(spark, chain + clique, list(range(45)))
    assert a == b
    assert a[25][0] == 20 and a[3][0] == 0 and a[44][0] == 44


def test_cc_star_matches_propagation_on_random_graphs(spark):
    import random

    for seed in (7, 19, 101):
        rng = random.Random(seed)
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(20, 140))
        ]
        # duplicates + reversed duplicates are legal pair-generator output
        edges += [(b_, a_) for a_, b_ in edges[:10]]
        a, b = _cc_both(spark, [(x, y) for x, y in edges if x != y], list(range(n)))
        assert a == b, f"seed {seed}: star CC diverged from propagation CC"


def test_cc_auto_dispatch_paths_agree(spark):
    """connected_components_auto picks propagation below the threshold and
    the star path at/above it; both must label identically (the registry
    default dispatch, closed r8)."""
    from storage_crawler_spark.operators.cluster import connected_components_auto

    edge_rows = [(i, i + 1) for i in range(10)] + [(20, 21), (21, 22)]
    edges = spark.createDataFrame(edge_rows, "doc_a LONG, doc_b LONG")
    nodes = spark.range(25).withColumnRenamed("id", "doc_id")
    small = {r.doc_id: (r.component, r.cluster_size)
             for r in connected_components_auto(edges, nodes).collect()}
    forced_star = {r.doc_id: (r.component, r.cluster_size)
                   for r in connected_components_auto(edges, nodes, star_threshold=1).collect()}
    assert small == forced_star
    assert small[5] == (0, 11) and small[22] == (20, 3) and small[24] == (24, 1)


def test_cc_star_long_chain_converges_and_empty_graph(spark):
    from storage_crawler_spark.operators.cluster import connected_components_star

    # 300-node chain: diameter 300 >> rounds; star path must converge well
    # under its cap without any diameter dependence
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "doc_a LONG, doc_b LONG"
    )
    nodes = spark.range(301).withColumnRenamed("id", "doc_id")
    rows = connected_components_star(edges, nodes, max_iter=15).collect()
    assert all(r.component == 0 for r in rows) and len(rows) == 301
    assert sum(r.is_keeper for r in rows) == 1

    empty = edges.filter("doc_a < 0")
    rows2 = connected_components_star(empty, spark.range(4).withColumnRenamed("id", "doc_id")).collect()
    assert {r.doc_id: r.component for r in rows2} == {i: i for i in range(4)}
    assert all(r.cluster_size == 1 and r.is_keeper == 1 for r in rows2)


# -- product quantization (operators/pq.py) ----------------------------------


def test_pq_fit_encode_shapes_and_determinism(spark):
    """Codebook shapes, code ranges, rerun bit-stability, and the
    divisibility guard."""
    import pytest as _pytest

    from storage_crawler_spark.operators.pq import pq_encode, pq_fit
    from storage_crawler_spark.operators.kmeans import load_vectors

    vectors = load_vectors(spark, "/root/testdata/sf0.001")
    vectors.persist()
    m, ksub = 4, 8
    books = pq_fit(vectors, dim=64, m=m, ksub=ksub, iters=2)
    assert len(books) == m
    assert all(len(b) == ksub for b in books)
    assert all(len(c) == 64 // m for b in books for c in b)
    assert books == pq_fit(vectors, dim=64, m=m, ksub=ksub, iters=2)  # bit-stable

    codes = pq_encode(vectors.select("vec_id", F.lit(0).alias("label"), "ev"), books)
    rows = codes.collect()
    assert all(len(r.codes) == m for r in rows)
    assert all(0 <= c < ksub for r in rows for c in r.codes)

    with _pytest.raises(ValueError, match="not divisible"):
        pq_fit(vectors, dim=64, m=7)
    vectors.unpersist()


def test_pq_encode_centroid_roundtrip(spark):
    """A vector that IS a centroid must encode to that centroid's code in
    every subspace (argmin distance 0), and exact duplicates must get
    identical codes."""
    from storage_crawler_spark.operators.pq import pq_encode

    books = [
        [[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]],
        [[0.0, 0.0], [-1.0, -1.0], [3.0, 3.0]],
    ]
    df = spark.createDataFrame(
        [
            (0, 0, [1.0, 1.0, -1.0, -1.0]),  # centroids (1, 1)
            (1, 0, [2.0, 2.0, 3.0, 3.0]),    # centroids (2, 2)
            (2, 0, [1.0, 1.0, -1.0, -1.0]),  # duplicate of 0
        ],
        "vec_id LONG, label INT, ev ARRAY<DOUBLE>",
    )
    got = {r.vec_id: list(r.codes) for r in pq_encode(df, books).collect()}
    assert got[0] == [1, 1]
    assert got[1] == [2, 2]
    assert got[2] == got[0]


def test_pq_adc_recall_on_clustered_corpus(spark, tmp_path):
    """On a corpus of tight clusters around distinct anchors, ADC over PQ
    codes must (a) rank the query's own cluster-mates first — recall@k
    high against exact L2 — and (b) be rerun-deterministic.  Random data
    can't pin accuracy (quantization error swamps the tiny true gaps);
    clustered data is the regime PQ is FOR."""
    import random

    import pandas as pd

    from storage_crawler_spark.operators.pq import pq_adc_topk, pq_recall

    rng = random.Random(7)
    anchors = [[rng.choice((-4.0, 4.0)) for _ in range(8)] for _ in range(4)]
    # cluster size = k + 1: the query's 8 non-query mates are EXACTLY the
    # exact-L2 top-8, and inter-cluster gaps dwarf quantization error, so
    # ADC must recover the full set — recall == 1.0, not a loose bound.
    # (With more mates than k, mates quantize to identical codes and the
    # est_d2 tie-break picks an arbitrary-but-deterministic k-subset, which
    # caps recall below 1 structurally, not through any PQ defect.)
    k = 8
    rows = []
    for vec_id in range(36):
        a = anchors[vec_id % 4]
        rows.append(
            (vec_id, [x + rng.uniform(-0.05, 0.05) for x in a], vec_id % 4)
        )
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/embeddings.parquet", index=False)

    got = pq_adc_topk(spark, sf, query_vec_id=0, k=k, m=4, ksub=4, iters=3).collect()
    assert len(got) == k
    assert [r.est_d2 for r in got] == sorted(r.est_d2 for r in got)  # ranked
    assert all(r.label == 0 for r in got)  # every hit a cluster-mate

    rec = pq_recall(spark, sf, query_vec_id=0, k=k, m=4, ksub=4, iters=3).collect()[0]
    assert rec.recall == 1.0
    again = pq_adc_topk(spark, sf, query_vec_id=0, k=k, m=4, ksub=4, iters=3).collect()
    assert [(r.vec_id, r.est_d2) for r in again] == [(r.vec_id, r.est_d2) for r in got]


# -- rate anomaly (plans/registry.py gen_rate_anomaly) -----------------------


def test_rate_anomaly_planted_spike(spark, tmp_path):
    """A 10x spike after a PERFECTLY steady baseline must be flagged (the
    zero-trailing-variance case the sd floor exists for), steady windows
    must stay silent, and a mild wobble within the floor must not alarm."""
    import pandas as pd

    from storage_crawler_spark.plans import registry

    rows = []
    eid = 0
    base = 1_700_000_000
    # steady: 5 events in each of windows 0..9; spike: 50 events in window 10;
    # then 4 more steady windows (their trails contain the spike — allowed
    # to alarm or not; we only pin the spike window and the pre-spike quiet)
    for w in range(15):
        n = 50 if w == 10 else 5
        for i in range(n):
            rows.append(
                (eid, pd.Timestamp(base + w * 3600 + (i % 3000), unit="s"),
                 7, "steady", 1.0, "{}")
            )
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/events.parquet", index=False)

    spec = registry.get_query("window_rate_anomaly")
    got = {r.window_start: r for r in spec.builder(spark, sf).collect()}
    spike_ws = base // 3600 * 3600 + 10 * 3600
    assert spike_ws in got, "zero-variance-trail spike must be flagged"
    assert got[spike_ws].z == (50 - 5) / 1.0  # exact: sd floored at 1.0
    pre_spike = [ws for ws in got if ws < spike_ws]
    assert pre_spike == [], f"steady baseline windows flagged: {pre_spike}"


# -- shard export (operators/sampling.py) ------------------------------------


def test_shard_plan_covers_corpus_and_write_matches(spark, tmp_path):
    """The shard plan must partition the corpus (every doc exactly once,
    positions 1..|shard| contiguous per shard), and the materialized
    writer must produce ONE file per shard whose physical row order IS the
    plan's shard_pos order."""
    import glob

    import pyarrow.parquet as pq

    from storage_crawler_spark.operators.sampling import gen_shard_plan, write_shards
    from storage_crawler_spark.plans.dialect import SPARK

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("documents")
    try:
        n_docs = docs.count()
        plan = spark.sql(gen_shard_plan(SPARK, n_shards=8)).collect()
        assert len(plan) == n_docs
        assert len({r.doc_id for r in plan}) == n_docs  # exactly once
        by_shard: dict[int, list] = {}
        for r in plan:
            by_shard.setdefault(r.shard_id, []).append(r)
        assert set(by_shard) <= set(range(8))
        for rows in by_shard.values():
            assert sorted(r.shard_pos for r in rows) == list(range(1, len(rows) + 1))

        out = str(tmp_path / "shards")
        write_shards(docs, out, n_shards=8)
        for shard_id, rows in by_shard.items():
            files = glob.glob(f"{out}/shard_id={shard_id}/*.parquet")
            assert len(files) == 1, f"shard {shard_id}: {len(files)} files"
            physical = pq.read_table(files[0], columns=["doc_id"])["doc_id"].to_pylist()
            want = [r.doc_id for r in sorted(rows, key=lambda r: r.shard_pos)]
            assert physical == want  # file order == plan order
    finally:
        spark.catalog.dropTempView("documents")


# -- quality-audit plane semantics (operators/text.py) ------------------------


def test_gopher_battery_flags_planted_violations(spark):
    """Each rule must trip on a document built to violate exactly it."""
    from storage_crawler_spark.operators.text import gen_gopher_battery
    from storage_crawler_spark.plans.dialect import SPARK

    rows = [
        (0, "the cat sat on the mat with a hat of fur", "en", "s", 0),  # clean
        (1, "tiny doc", "en", "s", 0),                                   # too few words
        (2, " ".join(["supercalifragilistic"] * 30), "en", "s", 0),      # long words, no stopwords
        (3, "the " + " ".join(["###"] * 20), "en", "s", 0),              # symbol spam
        (4, "the " + " ".join(["12345"] * 20), "en", "s", 0),            # numeric: low alpha
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).createOrReplaceTempView("documents")
    try:
        got = {r.doc_id: r for r in spark.sql(gen_gopher_battery(SPARK)).collect()}
        assert got[0].keep == 1
        assert got[1].flag_word_count == 0 and got[1].keep == 0
        assert got[2].flag_word_len == 0 and got[2].flag_stopwords == 0
        assert got[3].flag_symbols == 0
        assert got[4].flag_alpha == 0
    finally:
        spark.catalog.dropTempView("documents")


def test_zipf_audit_recovers_planted_power_law(spark):
    """A corpus whose term frequencies are an EXACT power law freq(r) =
    round(1000·r^s) must yield a fitted slope close to s — the audit
    measures what it claims to measure, beyond cross-engine parity."""
    import math

    from storage_crawler_spark.operators.text import gen_zipf_audit
    from storage_crawler_spark.plans.dialect import SPARK

    s_true = -1.0
    terms = [f"w{r}" for r in range(1, 41)]
    bag = []
    for r, t in enumerate(terms, start=1):
        bag.extend([t] * max(int(round(100 * r**s_true)), 1))
    # spread the bag over docs (content per doc irrelevant to the audit)
    docs = [
        (i, " ".join(bag[i::10]), "xx", "s", 0) for i in range(10)
    ]
    spark.createDataFrame(
        docs, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).createOrReplaceTempView("documents")
    try:
        row = spark.sql(gen_zipf_audit(SPARK, top_k=40)).collect()[0]
        assert row.lang == "xx"
        # rounding to integer counts + regression noise: ±0.15 is tight
        # enough to catch a sign error, a swapped axis, or rank off-by-one
        assert abs(row.zipf_slope - s_true) < 0.15, row.zipf_slope
    finally:
        spark.catalog.dropTempView("documents")
