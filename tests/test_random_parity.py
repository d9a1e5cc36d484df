"""Randomized Spark-vs-DuckDB parity over adversarial corpora.

The driver's oracle gate (and tools/check_oracle.py) only ever compares the
engines on the FIXED synthetic testdata; these tests sweep the same
dialect-generated queries over seeded random corpora built to hit the edges
the fixture can't: empty texts, single tokens, exact duplicates, shared
substring runs, repeated-whitespace-free token streams, NULL lang, and
cross-lang near-duplicates.  Any cross-engine semantic drift in the shared
SQL source (split/array/lambda/regex/rounding behavior) fails here with the
seed that produced it.

Comparison reuses the driver-faithful normalizer from tools/check_oracle.py
(column-name sort, repr-precision floats, row sort) so a pass here means
the same thing as a pass at the gate.
"""

from __future__ import annotations

import random

import pytest

from parity_util import assert_parity

from storage_crawler_spark.operators import dedup, pipeline, sampling, similarity, text
from storage_crawler_spark.plans.dialect import DUCK, SPARK

VOCAB = (
    [f"w{i}" for i in range(30)]
    + ["the", "a", "of", "and", "is"]
    # non-ASCII and punctuation-bearing tokens: md5/split/length parity must
    # hold on multi-byte UTF-8 and regex-significant characters too
    + ["é", "日本", "naïve", "a.b", "x+y", "(paren)", "emoji🙂"]
)


def _random_corpus(seed: int, n_docs: int = 60) -> list[tuple]:
    """Seeded corpus with the documents schema and adversarial structure."""
    rng = random.Random(seed)
    rows = []
    shared_run = " ".join(rng.choice(VOCAB) for _ in range(12))
    for doc_id in range(n_docs):
        kind = rng.randrange(9)
        if kind == 8:
            # NULL text: the schema allows it but the fixed testdata never
            # ships one — the exact blind-spot class the r7 zorder ADVICE
            # exposed for NULL keys; every entry must filter or propagate
            # NULLs identically in both engines
            body = None
        elif kind == 0:
            body = ""  # empty text
        elif kind == 1:
            body = rng.choice(VOCAB)  # single token
        elif kind == 2 and rows:
            body = rows[rng.randrange(len(rows))][1]  # exact duplicate
        elif kind == 3:
            # shared substring run embedded at a random offset
            pre = " ".join(rng.choice(VOCAB) for _ in range(rng.randrange(6)))
            post = " ".join(rng.choice(VOCAB) for _ in range(rng.randrange(6)))
            body = " ".join(x for x in (pre, shared_run, post) if x)
        else:
            body = " ".join(rng.choice(VOCAB) for _ in range(rng.randrange(1, 40)))
        lang = rng.choice(["en", "fr", "de", None])
        # ~5% NULL source: grouping keys the schema allows to be NULL
        source = None if rng.random() < 0.05 else f"src{doc_id % 3}"
        rows.append((doc_id, body, lang, source, len(body) if body is not None else 0))
    return rows


QUERIES = [
    ("dedup_exact", lambda d: dedup.gen_dedup_exact(d)),
    ("jaccard_pairs", lambda d: dedup.gen_jaccard_pairs(d, threshold=0.3, block_cap=64)),
    ("minhash_sigs", lambda d: dedup.gen_minhash_sigs(d)),
    ("minhash_pairs", lambda d: dedup.gen_minhash_pairs(d)),
    (
        "minhash_incremental",
        # Spark runs the incremental probe, DuckDB the full join restricted
        # to new-doc pairs — independent formulations whose equality is the
        # incremental pass's correctness claim
        lambda d: dedup.gen_minhash_pairs_incremental(d)
        if d.name == "spark"
        else "SELECT doc_a, doc_b, est_jaccard FROM (\n"
        + dedup.gen_minhash_pairs(d)
        + "\n) fp WHERE doc_a % 10 = 0 OR doc_b % 10 = 0",
    ),
    ("substring_spans", lambda d: dedup.gen_substring_spans(d, width=8, stride=2)),
    ("dup_span_ratio", lambda d: dedup.gen_dup_span_ratio(d, width=8, stride=2)),
    ("token_stats", lambda d: text.gen_token_stats(d)),
    ("quality_score", lambda d: text.gen_quality_score(d)),
    ("text_normalize", lambda d: text.gen_text_normalize(d)),
    ("fingerprint", lambda d: text.gen_fingerprint(d)),
    ("repetition", lambda d: text.gen_repetition(d)),
    ("unigram_surprisal", lambda d: text.gen_unigram_surprisal(d)),
    ("tfidf_topterms", lambda d: text.gen_tfidf_topterms(d)),
    ("split_assign", lambda d: sampling.gen_split_assign(d)),
    ("split_counts", lambda d: sampling.gen_split_counts(d)),
    ("stratified_sample", lambda d: sampling.gen_stratified_sample(d, per_stratum=5)),
    # ln(u)/w keys: empty-text rows filtered, w floors at 1, ulp-level ln
    # divergence must not flip md5-spread ranks
    ("weighted_sample", lambda d: sampling.gen_weighted_sample(d, sample_size=25)),
    ("lang_id", lambda d: text.gen_lang_id(d)),
    ("pii_redact", lambda d: text.gen_pii_redact(d)),
    ("quality_filter", lambda d: text.gen_quality_filter(d)),
    ("chunk_split", lambda d: text.gen_chunk_split(d, chunk_tokens=8, stride=6)),
    ("pack_bins", lambda d: text.gen_pack_bins(d, token_budget=40, chunk_tokens=8, stride=6)),
    # round-5 n-gram plane: small n so the 1-40-token random docs produce grams
    ("token_ngrams", lambda d: text.gen_token_ngrams(d, n=3)),
    ("boilerplate_ngrams", lambda d: text.gen_boilerplate_ngrams(d, n=3, top_k=20)),
    ("ngram_contamination", lambda d: pipeline.gen_ngram_contamination(d, n=3)),
    ("domain_mixture", lambda d: pipeline.gen_domain_mixture(d)),
    # round-5 quality-audit plane
    ("gopher_battery", lambda d: text.gen_gopher_battery(d)),
    ("zipf_audit", lambda d: text.gen_zipf_audit(d, top_k=10, prebuckets=4)),
    # small n/max_df so the 1-40-token random docs produce grams and the
    # boilerplate cap actually drops the shared_run grams
    ("source_overlap", lambda d: text.gen_source_overlap(d, n=3, max_df=10)),
    ("split_divergence", lambda d: pipeline.gen_split_divergence(d)),
    # empty texts, NULL lang, exact duplicates all hit the card's guards
    ("corpus_card", lambda d: pipeline.gen_corpus_card(d)),
    # interpolated quantiles over the adversarial length distribution
    ("length_quantiles", lambda d: text.gen_length_quantiles(d)),
    ("shard_plan", lambda d: sampling.gen_shard_plan(d, n_shards=4)),
    ("mixture_quota", lambda d: pipeline.gen_mixture_quota(d, token_budget=500)),
    # round-5 second-pass additions: small blocks/budgets so the 1-40-token
    # random docs exercise multi-paragraph, multi-chunk, multi-bin paths
    ("dedup_paragraphs", lambda d: dedup.gen_dedup_paragraphs(d, block_tokens=4)),
    ("inverted_index", lambda d: text.gen_inverted_index(d, postings_cap=5, min_df=2)),
    ("bigram_nll", lambda d: text.gen_bigram_nll(d)),
    ("langid_confusion", lambda d: text.gen_langid_confusion(d)),
    ("pack_render", lambda d: text.gen_pack_render(d, token_budget=40, chunk_tokens=8, stride=6)),
    # round-9 additions: small widths/k so 1-40-token random docs hit the
    # multi-chunk and head/tail paths; min_count=1 so collocations appear
    ("chunk_dedup", lambda d: text.gen_chunk_dedup(d, width=8, stride=8)),
    ("head_tail_overlap", lambda d: text.gen_head_tail_overlap(d, k=2, max_df=10)),
    ("pmi_pairs", lambda d: text.gen_pmi_pairs(d, min_count=1, top_k=20)),
    # mixed-language entropy: NULL/empty texts, multibyte tokens outside
    # every marker list, en-marker-only vocab -> evidence floor paths
    ("lang_mix", lambda d: text.gen_lang_mix(d, min_markers=1)),
]


@pytest.fixture(scope="module", params=[11, 23, 47])
def corpus_parquet(request, tmp_path_factory, spark):
    import pandas as pd

    rows = _random_corpus(request.param)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    path = str(tmp_path_factory.mktemp("rand") / f"documents_{request.param}.parquet")
    pdf.to_parquet(path, index=False)
    spark.read.parquet(path).createOrReplaceTempView("documents")
    yield path
    spark.catalog.dropTempView("documents")


def _random_embeddings(seed: int, n: int = 40, dim: int = 8) -> list[tuple]:
    """Seeded embedding corpus: components are k/8 rationals (exactly
    representable in float32 AND float64, so the double-cast is lossless in
    both engines), with exact duplicates, a negated twin, sign-boundary
    zeros in the bucketed components, and one ALL-ZERO vector — the row
    that crashes an unguarded cosine on Spark (ANSI DIVIDE_BY_ZERO) while
    DuckDB silently NULLs; the nrm > 0 guard must make the engines agree."""
    rng = random.Random(seed)
    rows = []
    for vec_id in range(n):
        kind = rng.randrange(8)
        if vec_id == n // 3:
            vec = None  # NULL embedding: allowed by schema, filtered by every op
        elif vec_id == n // 2:
            vec = [0.0] * dim  # the failed-embedding row
        elif kind == 0 and any(r[1] is not None for r in rows):
            # exact duplicate — of a NON-NULL prior row (the NULL row is
            # un-copyable; seeds beyond the committed params could draw
            # it, crashing the GENERATOR itself — found by the r11c fuzz)
            pool = [r[1] for r in rows if r[1] is not None]
            vec = list(pool[rng.randrange(len(pool))])
        elif kind == 1 and any(r[1] is not None for r in rows):
            pool = [r[1] for r in rows if r[1] is not None]
            vec = [-x for x in pool[rng.randrange(len(pool))]]  # antipode
        else:
            vec = [rng.randrange(-16, 17) / 8 for _ in range(dim)]
            if kind == 2:
                vec[rng.randrange(dim)] = 0.0  # sign-boundary component
        # ~10% NULL labels: the grouping-key NULL class
        label = None if rng.random() < 0.1 else vec_id % 4
        rows.append((vec_id, vec, label))
    return rows


EMB_QUERIES = [
    ("cosine_topk", lambda d: similarity.gen_cosine_topk(d, 0, 10)),
    # r10 forget-apply: random stores exercise ragged final shards, shard
    # boundaries, and the integer micro-lattice rewrite threshold
    ("forget_apply", lambda d: pipeline.gen_forget_apply(d)),
    # r10 matryoshka audit: duplicate/antipode/ragged-dim vectors — the
    # query-dim alignment filter and lattice tie-breaks must agree
    ("matryoshka_audit", lambda d: similarity.gen_matryoshka_audit(d, prefixes=(2, 4))),
    # r11 graph-ANN two-hop probe: random stores give ragged bucket
    # populations, mutual-edge asymmetry, duplicate vectors (lattice
    # cosine ties -> dst tie-break) — hop frontier + exact_rank must agree
    ("graph_2hop_topk", lambda d: _cl().gen_graph_2hop_topk(d, 0, 5, m=3)),
    # r11c link prediction: random stores give ragged mutual graphs —
    # wedge counts, degree-sum tie order, and the anti-join must agree
    ("knn_link_predict", lambda d: _cl().gen_knn_link_predict(d, k=8, m=3)),
    ("ivf_topk", lambda d: similarity.gen_ivf_topk(d, 0, 10)),
    ("embedding_near_dup", lambda d: similarity.gen_embedding_near_dup(d)),
    ("knn_join", lambda d: similarity.gen_knn_join(d, k=3)),
    # duplicate/antipode/zero rows: dup pairs must be excluded by the
    # cosine ceiling, zero-norm rows by the nrm guard, same-label by the
    # mining predicate — on adversarial vectors in both engines
    ("hard_negatives", lambda d: similarity.gen_hard_negatives(d, k=3, dup_threshold=0.9)),
    # Spark runs the incremental probe, DuckDB the full pair join restricted
    # to new-vector pairs — independent formulations (minhash-incremental
    # pattern, vector-space twin)
    (
        "embedding_incremental",
        lambda d: similarity.gen_embedding_near_dup_incremental(d)
        if d.name == "spark"
        else "SELECT vec_a, vec_b, cosine FROM (\n"
        + similarity.gen_embedding_near_dup(d)
        + "\n) fp WHERE vec_a % 10 = 0 OR vec_b % 10 = 0",
    ),
    ("ivf_recall", lambda d: similarity.gen_ivf_recall(d, 0, 10)),
    # r11c recall curve: duplicate/antipode/zero vectors stress lattice
    # ties in BOTH ranked lists and the per-k grid join
    ("ivf_recall_curve", lambda d: similarity.gen_ivf_recall_curve(d, 0, ks=(1, 3, 5))),
    # round-5 audit plane: the all-zero vector must land in n_zero_norm (not
    # crash), and outlier ranks must agree on exact-duplicate ties
    ("embedding_stats", lambda d: similarity.gen_embedding_stats(d)),
    ("label_outliers", lambda d: similarity.gen_label_outliers(d, per_label=3)),
    # 4 planes on 8-dim vectors: duplicate/antipode/zero rows exercise sign
    # boundaries in every signature bit
    ("rp_lsh_topk", lambda d: similarity.gen_rp_lsh_topk(d, 0, 10, n_planes=4)),
    ("rp_lsh_recall", lambda d: similarity.gen_rp_lsh_recall(d, 0, 10, n_planes=4)),
    # int8 quantization audit: the all-zero vector takes the scale=0
    # short-circuit, duplicates/antipodes must land in identical error cells
    ("int8_quant_audit", lambda d: similarity.gen_int8_quant_audit(d)),
    # r11 binary plane: duplicates share one packed code (n_codes <
    # n_vecs), antipodes complement within the live dims, sign-boundary
    # zeros quantize to 0-bits, the all-zero row drops at the nrm guard —
    # packing/popcount folds must agree bit-for-bit cross-engine
    ("binary_quant_audit", lambda d: similarity.gen_binary_quant_audit(d)),
    ("hamming_topk", lambda d: similarity.gen_hamming_topk(d, 0, 10)),
    # pair-free cohesion identity: duplicate vectors (cos 1 pairs), the
    # antipode (cos -1), zero-norm exclusion and singleton labels
    ("label_cohesion", lambda d: similarity.gen_label_cohesion(d)),
    # centroid argmin ties on duplicate/antipode vectors; 4-label corpus
    ("centroid_confusion", lambda d: similarity.gen_centroid_confusion(d)),
    # the random fixture plants exact-duplicate vectors (kind-2 rows)
    ("embedding_exact_dups", lambda d: similarity.gen_embedding_exact_dups(d)),
    # per-dimension audit: the all-zero vector contributes a zero in every
    # dim; antipodes cancel in mean_x but not mean_x2
    ("dim_stats", lambda d: similarity.gen_dim_stats(d)),
    # round-8 additions: integer-lattice moments and power iterations must
    # agree on NULL/zero/duplicate/antipode vectors; the SPARK rendering of
    # the unrolled chains is valid (if slower) SQL, so gen-level parity
    # covers the oracle formulation on adversarial stores
    ("corr_audit", lambda d: similarity.gen_corr_audit(d)),
    ("pca_power", lambda d: similarity.gen_pca_power(d, k=6)),
    ("pca_project", lambda d: similarity.gen_pca_project(d, k=6)),
    # round-9: integer-lattice batched-kNN oracle form — duplicate vectors
    # give exact dot ties (vec_id break), NULL embeddings excluded; the
    # GEMM builder's bit-parity to this form is pinned at the gate and in
    # test_round9_additions
    ("batch_knn_oracle", lambda d: similarity.gen_batch_knn_oracle(d, (0, 1), k=3)),
    # round-9 lattice k-means: the unrolled iteration chain must agree on
    # adversarial stores — duplicate/antipode/zero vectors create argmin
    # ties (cid break), NULL embeddings drop, < k distinct points shrink
    # the init; small k/iters keep the chain light
    ("kmeans_lattice", lambda d: _km().gen_kmeans_lattice(d, k=4, iters=2)),
    ("ivf_lattice_topk", lambda d: _km().gen_ivf_lattice_topk(d, 0, 5, nprobe=2, k=4, iters=2)),
    # lattice PQ: subspace-keyed chain on 8-dim stores (m=4 -> dsub 2),
    # duplicate/zero vectors create code ties; NULL embeddings drop
    ("pq_lattice_topk", lambda d: _pq().gen_pq_lattice_topk(d, 0, 5, m=4, ksub=4, iters=2)),
    ("pq_lattice_recall", lambda d: _pq().gen_pq_lattice_recall(d, 0, 5, m=4, ksub=4, iters=2)),
    # round-9 SemDeDup: duplicate vectors are d2=0 pairs in whatever cell
    # they land in; antipodes split cells; NULL embeddings drop
    ("semantic_dedup", lambda d: _km().gen_semantic_dedup(d, k=4, iters=2)),
    # round-9 MMR: duplicate vectors give simq ties (vec_id break), the
    # antipode lands last on relevance, zero/NULL vectors drop at the norm
    # guard; SMALL k keeps the unrolled chain's 3^k Spark inlining benign
    # (the registry's Spark path is the collected-pool greedy)
    ("mmr_rerank", lambda d: similarity.gen_mmr_rerank(d, pool_n=6, k=3)),
    # round-9 k-core: duplicate vectors are mutual-top-1 pairs; the peel
    # must agree on adversarial degree ties in both engines
    ("knn_kcore", lambda d: _cl().gen_knn_kcore(d, kcore=2, rounds=3, m=3)),
    # round-9 clustering coefficient: duplicate/antipode vectors create
    # mutual pairs and degenerate wedges; exact triangle counts must agree
    ("knn_clustering_coeff", lambda d: _cl().gen_knn_clustering_coeff(d, m=3)),
]


def _cl():
    from storage_crawler_spark.operators import cluster

    return cluster


def _pq():
    from storage_crawler_spark.operators import pq

    return pq


def _km():
    from storage_crawler_spark.operators import kmeans

    return kmeans


@pytest.fixture(scope="module", params=[5, 17])
def embeddings_parquet(request, tmp_path_factory, spark):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = _random_embeddings(request.param)
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [np.array(r[1], dtype=np.float32) if r[1] is not None else None
                 for r in rows],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),  # None -> NULL
        }
    )
    path = str(tmp_path_factory.mktemp("remb") / f"embeddings_{request.param}.parquet")
    pq.write_table(table, path)
    spark.read.parquet(path).createOrReplaceTempView("embeddings")
    yield path
    spark.catalog.dropTempView("embeddings")


@pytest.mark.parametrize("name,gen", EMB_QUERIES, ids=[q[0] for q in EMB_QUERIES])
def test_random_embeddings_parity(spark, embeddings_parquet, name, gen):
    assert_parity(
        spark.sql(gen(SPARK)), gen(DUCK), {"embeddings": embeddings_parquet}, name
    )


@pytest.mark.parametrize("seed", [7, 23])
def test_random_crosslingual_dups_parity(spark, tmp_path, seed):
    """round-9 cross-lingual near-dup matrix: needs BOTH random tables —
    duplicate/antipode vectors create cos=1/-1 pairs whose lang lookups hit
    NULL-lang docs (excluded identically in both engines)."""
    import pandas as pd

    from storage_crawler_spark.operators import similarity as sim

    doc_rows = _random_corpus(seed, n_docs=40)
    emb_rows = _random_embeddings(seed)
    dpath, epath = str(tmp_path / "documents.parquet"), str(tmp_path / "embeddings.parquet")
    pd.DataFrame(doc_rows, columns=["doc_id", "text", "lang", "source", "n_chars"]).to_parquet(dpath, index=False)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in emb_rows], pa.int64()),
                "embedding": pa.array(
                    [np.array(r[1], dtype=np.float32) if r[1] is not None else None
                     for r in emb_rows],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([r[2] for r in emb_rows], pa.int32()),
            }
        ),
        epath,
    )
    spark.read.parquet(dpath).createOrReplaceTempView("documents")
    spark.read.parquet(epath).createOrReplaceTempView("embeddings")
    try:
        assert_parity(
            spark.sql(sim.gen_crosslingual_dups(SPARK)),
            sim.gen_crosslingual_dups(DUCK),
            {"documents": dpath, "embeddings": epath},
            f"crosslingual_dups[{seed}]",
        )
    finally:
        spark.catalog.dropTempView("documents")
        spark.catalog.dropTempView("embeddings")


# Registry ENTRIES (builder + committed oracle) that need only a documents
# table: sweeping these runs the real builder paths — the persisted prep,
# the ranked-relation cache, the parquet-footer strategy gate, the derived
# files view with its extension fall-through and escape encoding — not just
# the raw generators above.
DOC_ENTRIES = [
    "report_first_thousand",
    "report_large_old_files",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_jaccard_block_guard",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh",
    "dedup_minhash_incremental",
    "dedup_substring_spans",
    "text_dup_span_ratio",
    "dedup_cluster_assign",
    "dedup_cluster_keepers",
    "owner_prefix_join",
    "lake_snapshot_diff",
    "stratified_sample",
    "pipeline_training_corpus",
    "pipeline_split_contamination",
    # format ingestion: derives JSONL/CSV/ORC from the random parquet and
    # must reproduce the oracle's parquet aggregate byte-for-byte
    "ingest_jsonl_fidelity",
    "ingest_csv_fidelity",
    "ingest_orc_fidelity",
    "ingest_schema_evolution",
    # disjoint-generation mergeSchema twin: NULL fill in BOTH directions
    # over random corpora (NULL texts land in either parity class)
    "ingest_disjoint_generations",
    # round-5 additions
    "text_boilerplate_ngrams",
    "pipeline_ngram_contamination",
    "pipeline_domain_mixture",
    # r5 rows-only -> oracle conversions: the independent DuckDB
    # formulations must hold on adversarial corpora too (empty texts,
    # multi-byte tokens, exact duplicates)
    "dedup_simhash_pairs",
    "text_pack_greedy",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    # round-5 second-pass entries (registry builder + committed oracle)
    "dedup_paragraphs",
    "text_inverted_index",
    "text_bigram_nll",
    "text_langid_confusion",
    "text_pack_render",
    # round-5 third-pass entries
    "text_vocab_coverage",
    "pipeline_forget_audit",
    # prefix-filter containment: exact duplicates (containment 1.0), short
    # docs (<3 tokens shingle to whole text), NULL langs must all survive
    "dedup_containment_pairs",
    # char entropy: len<3 docs must surface as NULL-entropy rows; normalized
    # dedup: case/whitespace variants in the random corpus
    "text_char_entropy",
    "dedup_normalized_exact",
    # threshold histogram shares the rank-blocked pair machinery; random
    # corpora exercise bin edges at exact-decimal jaccard ties
    "dedup_threshold_histogram",
    # usage rollups run on the files derivation of the random corpus:
    # multi-byte path components, the extension fall-through quirk
    "report_subtree_du",
    "report_extension_usage",
    "report_owner_usage",
    "report_growth_daily",
    "report_age_tiers",
    # exact-duplicate docs in the random corpus become duplicate files
    "report_duplicate_files",
    # logit-decided keep flag must agree on empty/single-token docs
    "text_quality_classifier",
    # exact-dup and case-variant docs in the random corpus make each
    # funnel tier drop a different count
    "pipeline_dedup_funnel",
    # symmetric-delete joins on multi-byte tokens (substr is char-based in
    # both engines; the naive byte view would break on the UTF-8 vocab)
    "text_typo_pairs",
    # compaction bins over the files derivation: empty roots, NULL-frame
    # coalesce on each root's first file, duplicate sizes at bin edges
    "lake_compaction_plan",
    # quota caps bind on the random corpus's tiny sources; empty-text docs
    # excluded identically in plan and apply
    "pipeline_mixture_apply",
    # tertile thresholds on tiny corpora: ties at the interpolated
    # percentile and single-doc buckets
    "text_perplexity_tertiles",
    # hex positional-byte access on multi-byte UTF-8 payloads; empty and
    # single-byte payloads take the NULL/sign-pin paths
    "multimodal_byte_entropy",
    # r11 pHash: random payloads sweep the <64-byte exclusion, multi-byte
    # UTF-8 planes, and coefficient ties at the rank-32 median split
    "multimodal_phash",
    # bm25 on corpora where query terms tie and miss entirely
    "text_bm25_topk",
    # exact duplicates planted across split lines must contaminate
    "pipeline_neardup_contamination",
    "text_quality_by_source",
    "text_vocab_coverage_curve",
    # NULL-lang stratum and single-doc strata (sd 0 -> alloc 0)
    "sample_neyman_allocation",
    # r11c priority sampling: random corpora sweep saturated/unsaturated
    # tau regimes, NULL texts excluded identically, rank-pinned fold
    "sample_priority",
    # r11c epoch plan: random corpora with planted exact duplicates sweep
    # the cap tiers and both feasible/infeasible water-filling regimes
    "pipeline_epoch_plan",
    # r11c encoding audit: random multi-byte texts must count zero unless
    # a defect literal genuinely lands; NULL texts are clean
    "text_encoding_audit",
    # r11c domain caps: random corpora drive the synthesized URL tier
    # through cap-binding and under-cap hosts with md5-frozen pick order
    "ingest_domain_caps",
    # r11c recrawl priority: random corpora exercise duplicate-fetch
    # sequences (transition counting) and single-fetch unknowns
    "ingest_recrawl_priority",
    # r11c du forecast: random corpora give ragged per-root bucket
    # histories incl. the single-bucket NULL-guard path
    "report_du_forecast",
    # disc-bound winsorize on tiny strata; NULL lang/n_chars filtered
    "text_length_robust",
    # multi-byte words: substr/length are char-based in both engines;
    # single-char and empty tokens excluded identically
    "text_bpe_merge_pairs",
    # md5 shard keys on random doc_ids; NULL n_chars coalesce; the
    # all-empty-corpus NULL-ratio guard
    "pipeline_shard_balance",
    # MERGE semantics on random ids: delete-wins overlap rows, NULL-text
    # update exclusion, digest over the merged state
    "ingest_cdc_upsert",
    # decile thresholds over heavily-tied logits (duplicate docs): the
    # map-side CASE bucketing must agree on every tie
    "pipeline_quality_budget_curve",
    # bitwise mode classification over the files derivation of random ids
    "report_permission_audit",
    # round-8 additions
    # two-epoch BPE on adversarial vocab: multi-byte words are excluded by
    # the [a-z0-9] charset contract identically; greedy fold ties on equal
    # pair counts break lexically in both engines
    "text_bpe_encode",
    "text_bpe_compression",
    # Kneser-Ney: continuation counts on corpora with single-context words
    # and repeated bigrams; every scored pair has c>=1 by construction
    "text_kn_bigram_nll",
    # IVM vs recompute on random ids: the delete-wins/update/insert rules
    # hit arbitrary id residues; consistency flag must be 1 everywhere a
    # source survives
    "ingest_ivm_agg",
    # RAKE: random short docs make the corpus-derived stopword set and the
    # idiv-lattice ranking agree or fail loudly; phrase-text tie-breaks on
    # repeated runs are the adversarial surface
    "text_rake_keywords",
    # frozen Laplace on random source sets; clamp at the uniform edge
    "pipeline_dp_release",
    # corpus-level BPE apply: OOV char-fallback on multibyte/punctuated
    # words; vocab join on adversarial token sets
    "text_bpe_doc_tokens",
    # positional phrase chain on random corpora: repeated/overlapping
    # occurrences, phrase terms missing entirely
    "text_phrase_search",
    # regex marker battery on adversarial text (multibyte, empty docs)
    "text_license_scan",
    # round-9 additions over the derived files view / documents table
    "report_depth_profile",
    "text_chunk_dedup",
    "text_head_tail_overlap",
    "text_pmi_pairs",
    # decontamination apply: short-doc keep path, empty train/eval splits
    "pipeline_decontaminate",
    # synth->parse->features closed-form audio chain on random doc ids
    "multimodal_audio_features",
    # r9 lattice logreg: the full 12-step integer fit must stay
    # bit-identical on adversarial corpora (empty texts, multi-byte
    # tokens, exact duplicates shift every gradient sum)
    "text_quality_learned",
    # r9 compliance + importance-resampling planes: random corpora have
    # no real PII (the planted-span positive path is pinned in
    # test_round9_additions — the license-scan blind-spot lesson) but
    # exercise the zero-hit aggregate; DSIR's hashed LMs shift with every
    # token so the trunc6'd per-doc means sweep the ln() boundary
    "text_pii_scan",
    "pipeline_dsir_weights",
    # r10 URL tier: canonicalization string algebra over synthesized URLs
    # (NULL source/lang rows excluded identically), first-seen keeper ties,
    # longest-prefix robots argmax, constant blocklists — all on random
    # corpora whose doc_id/source/lang interplay differs from the testdata
    "ingest_url_dedup",
    "ingest_domain_tiers",
    "ingest_robots_filter",
    "ingest_blocklist_filter",
    # random texts give per-URL version multisets the md5 grouping must
    # reproduce; NULL texts coalesce to '' identically
    "ingest_url_revisions",
    # r11 fix: the declared grid (sections x GROUPS lateral explode) vs
    # fetched canonical paths on corpora whose (source, lang, group)
    # interplay differs from the testdata
    "ingest_sitemap_coverage",
    # r11 streaming twin: the canonicalizer runs per micro-batch and the
    # curl key set must equal the batch DISTINCT whatever the batch split
    "streaming_url_dedup",
    # r11 frontier: random (source, lang, group) interplay varies the
    # per-host DISTINCT set and the slot packing; the curl tie-break on
    # uniform synthetic depths is the whole ordering
    "ingest_url_frontier",
    # r11 hard-link resolution: random sizes sweep the min-size inode
    # accounting; sparse random doc_ids vary link-set membership
    "report_hardlink_usage",
    # r11-queued vacuum plan: random sizes/mtimes sweep the retention edge
    "lake_vacuum_plan",
]


@pytest.fixture(scope="module", params=[31, 47])
def docs_sf_dir(request, tmp_path_factory):
    import pandas as pd

    rows = _random_corpus(request.param, n_docs=80)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    d = tmp_path_factory.mktemp("rdocs")
    pdf.to_parquet(str(d / "documents.parquet"), index=False)
    return str(d)


@pytest.mark.parametrize("entry", DOC_ENTRIES)
def test_random_docs_registry_entry_parity(spark, docs_sf_dir, entry):
    from storage_crawler_spark.plans import registry

    spec = registry.get_query(entry)
    assert_parity(
        spec.builder(spark, docs_sf_dir),
        spec.oracle,
        {"documents": f"{docs_sf_dir}/documents.parquet"},
        entry,
    )


@pytest.mark.parametrize("name,gen", QUERIES, ids=[q[0] for q in QUERIES])
def test_random_corpus_parity(spark, corpus_parquet, name, gen):
    assert_parity(spark.sql(gen(SPARK)), gen(DUCK), {"documents": corpus_parquet}, name)
