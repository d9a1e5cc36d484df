"""End-to-end training-corpus pipeline as ONE declarative plan.

The individual operators (quality filter, exact dedup, deterministic
split) are each oracle-gated; this module composes them the way a corpus
owner actually runs them —

    quality filter → exact-dedup keepers → train/val/test split → audit agg

— as a single dialect-generated query, so the whole pipeline is ONE
Catalyst plan (and ONE DuckDB oracle).  That is the point of a declarative
engine: no intermediate materialization, no orchestration glue; Catalyst
sees the full dataflow and can pushdown/prune/CSE across stage boundaries
that an imperative pipeline would freeze into files.

100 TB shape: the filter is a pure scan+project (column-pruned, no
shuffle); the dedup keeper selection is a min-over-fingerprint window (one
shuffle on the 16-byte md5 key, no join-back); the split is an inlined
map expression; the final audit aggregate partial-combines.  Total: two
shuffles end-to-end, both on keys with no skew by construction (md5
outputs), and zero joins.
"""

from __future__ import annotations

from storage_crawler_spark.operators.dedup import gen_span_windows
from storage_crawler_spark.operators.sampling import split_bucket_expr, split_case_expr
from storage_crawler_spark.operators.text import gen_quality_filter
from storage_crawler_spark.plans.dialect import Dialect, avg_lattice


def gen_training_pipeline(
    d: Dialect,
    train_pct: int = 80,
    val_pct: int = 10,
) -> str:
    """Per-(split, lang) corpus audit after filter → dedup → split.

    Output: split, lang, n_docs, sum_tokens — the sanity table a pipeline
    owner checks before training (split proportions and language balance
    AFTER cleaning, which filtering and dedup both distort).

    Composition avoids every self-join: the quality filter carries
    text/lang through as passthrough columns (single scan), the exact-dedup
    keeper is a min-over-fingerprint window (one shuffle, no join-back),
    and the split is an inlined expression (map) — so the whole pipeline
    is scan → project/filter → window(fp) → project → agg: exactly two
    shuffles, both on md5-derived keys with no skew by construction.
    """
    fp = d.md5_utf8("text")
    split = split_case_expr(split_bucket_expr(d), train_pct, val_pct)
    return f"""
WITH qf AS (
{gen_quality_filter(d, passthrough=("text", "lang"))}
),
kept AS (
  SELECT doc_id, text, lang, n_tokens FROM qf WHERE keep = 1
),
surv AS (
  SELECT doc_id, lang, n_tokens
  FROM (
    SELECT doc_id, lang, n_tokens,
           min(doc_id) OVER (PARTITION BY {fp}) AS keeper_id
    FROM kept
  ) w
  WHERE doc_id = keeper_id
)
SELECT {split} AS split, lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM surv
GROUP BY {split}, lang
""".strip()


def gen_split_contamination(
    d: Dialect,
    width: int = 32,
    stride: int = 8,
    train_pct: int = 80,
    val_pct: int = 10,
) -> str:
    """Train→eval contamination report: exact token spans that occur in
    BOTH the train split and an eval split (val/test) — the benchmark-
    decontamination check every serious pipeline runs before training
    (an eval answer string sitting verbatim in train invalidates the
    eval).  Composes the sampled-window relation (substring-dedup tier)
    with the deterministic split expression.

    Output per contaminated span: occurrence counts in each split and the
    lowest eval doc id as the audit example.

    Shape: windows explode (map) joined to nothing — the split is an
    inlined expression on doc_id — then ONE aggregation to per-(span,
    split) counts and ONE conditional-aggregation pass to the cross-split
    verdict (deliberately not a per-split self-join: Spark inlines CTEs,
    and the single-pass pivot avoids recomputing the window relation).
    Two shuffles, both on span_key.
    """
    split = split_case_expr(split_bucket_expr(d), train_pct, val_pct)
    return f"""
WITH w AS (
{gen_span_windows(d, width, stride)}
),
per AS (
  SELECT span_key, {split} AS split, count(*) AS n, min(doc_id) AS example_doc
  FROM w
  GROUP BY span_key, {split}
)
SELECT span_key,
       CAST(sum(CASE WHEN split = 'train' THEN n ELSE 0 END) AS BIGINT) AS n_train,
       CAST(sum(CASE WHEN split = 'val' THEN n ELSE 0 END) AS BIGINT) AS n_val,
       CAST(sum(CASE WHEN split = 'test' THEN n ELSE 0 END) AS BIGINT) AS n_test,
       min(CASE WHEN split <> 'train' THEN example_doc END) AS example_eval_doc
FROM per
GROUP BY span_key
HAVING sum(CASE WHEN split = 'train' THEN n ELSE 0 END) > 0
   AND sum(CASE WHEN split <> 'train' THEN n ELSE 0 END) > 0
""".strip()


def gen_ngram_contamination(
    d: Dialect,
    n: int = 5,
    train_pct: int = 80,
    val_pct: int = 10,
    threshold: str = "0.2",
    kd_rel: str | None = None,
) -> str:
    """Per-eval-document n-gram contamination: for every val/test document,
    the fraction of its DISTINCT token ``n``-grams that also occur anywhere
    in the train split — the GPT-3/PaLM-style decontamination unit (a token
    n-gram, not an exact span), reported per document so a flagged eval doc
    can be dropped or quarantined.  Complements gen_split_contamination,
    which reports per-SPAN counts; this reports the per-DOC verdict.

    Expressed as a semi-match LEFT JOIN on the n-gram key, NOT a
    max-over-window per key: at 100 TB a boilerplate n-gram puts 1e8 rows
    in one window partition and a window cannot be split, while AQE's
    skew-join splits hot join keys mechanically.  Shape: explode (map) →
    one distinct agg on (ngram, doc) → eval-side/train-side split by an
    inlined expression (no join back) → join on ngram → per-doc agg.

    The (ngram, doc, split) relation is referenced twice (eval rows, train
    keys); Spark inlines CTEs, so the Spark builder persists it once and
    passes ``kd_rel`` (registry ``_persist_view`` convention); the DuckDB
    oracle keeps the inline CTE.

    ``flagged`` compares exact doubles built from the same integers in both
    engines — no float-sum order dependence; ``contaminated_frac`` is
    floor-truncated per the repo float-parity convention.
    """
    from storage_crawler_spark.operators.text import gen_token_ngrams

    split = split_case_expr(split_bucket_expr(d), train_pct, val_pct)
    if kd_rel:
        with_clause = "WITH "
        kd = kd_rel
    else:
        kd = "kd"
        with_clause = f"""WITH g AS (
{gen_token_ngrams(d, n)}
),
kd AS (
  SELECT DISTINCT ngram, doc_id, {split} AS split FROM g
),
"""
    frac = "CAST(n_in_train AS DOUBLE) / n_grams"
    return f"""{with_clause}ev AS (
  SELECT ngram, doc_id, split FROM {kd} WHERE split <> 'train'
),
tr AS (
  SELECT DISTINCT ngram FROM {kd} WHERE split = 'train'
)
SELECT doc_id, split, n_grams, n_in_train,
       {d.trunc6(frac)} AS contaminated_frac,
       CASE WHEN {frac} >= {threshold} THEN 1 ELSE 0 END AS flagged
FROM (
  SELECT e.doc_id AS doc_id, e.split AS split,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN t.ngram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_in_train
  FROM ev e
  LEFT JOIN tr t ON e.ngram = t.ngram
  GROUP BY e.doc_id, e.split
) agg
""".strip()


def _mixture_shares_cte(d: Dialect) -> str:
    """Shared CTE chain of the mixture plane: per-source doc/token counts
    and each source's token share of the corpus — ONE corpus aggregation
    (partial-combining sum of per-doc token counts on the low-cardinality
    source key), with the global share window running on the tiny
    per-source relation.  Used by gen_domain_mixture (weights report) and
    gen_mixture_quota (budgeted quotas) so the two stay semantically
    identical by construction."""
    ntoks = d.size(d.split("text"))
    return f"""per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN text IS NULL THEN 0 ELSE {ntoks} END) AS BIGINT) AS sum_tokens
  FROM documents
  GROUP BY source
),
shares AS (
  SELECT source, n_docs, sum_tokens,
         CAST(sum_tokens AS DOUBLE) / CAST(sum(sum_tokens) OVER () AS DOUBLE) AS share
  FROM per_src
)"""


def gen_domain_mixture(d: Dialect) -> str:
    """Domain-mixture weights report: per source (domain), document and
    token counts, the domain's token share of the corpus, and the
    temperature-sampled mixture weight w_i = sqrt(share_i) / Σ_j
    sqrt(share_j) (alpha = 0.5 — the mT5/XLM-R up-sampling rule that lifts
    small domains without letting the head domain dominate).  This is the
    table a corpus owner turns into per-domain sampling rates.

    100 TB shape: ONE aggregation over the corpus (partial-combining sum
    of per-doc token counts, shuffle on the low-cardinality source key —
    skew-free because the heavy lifting collapses map-side), then the
    global windows run on the per-DOMAIN relation: thousands of rows at
    most, so the unpartitioned OVER () is a driver-scale no-op, not a
    single-reducer bottleneck over docs.

    Float parity: shares are exact-integer ratios in double (identical in
    both engines); sqrt is IEEE-correctly-rounded (identical); only the
    Σ sqrt(share) fold is summation-order-dependent, and both outputs are
    floor-truncated at 6 decimals per the repo convention.  The BIGINT
    casts pin DuckDB's HUGEINT sum/window-sum back to int64.
    """
    return f"""
WITH {_mixture_shares_cte(d)}
SELECT source, n_docs, sum_tokens,
       {d.trunc6('share')} AS token_share,
       {d.trunc6('sqrt(share) / sum(sqrt(share)) OVER ()')} AS mix_weight
FROM shares
""".strip()


def gen_split_divergence(d: Dialect, train_pct: int = 80, val_pct: int = 10) -> str:
    """Vocabulary-drift gate between the deterministic train split and each
    held-out split: add-one-smoothed unigram KL divergence KL(eval ‖ train)
    plus out-of-vocabulary mass — the split-hygiene check a pipeline runs
    BEFORE trusting its validation loss (a val set whose vocabulary has
    drifted from train measures domain shift, not model quality; for the
    md5-bucketed split here the expected divergence is near zero, so a
    LARGE value is the alarm).

    KL(e ‖ t) = Σ_v p_e(v) · ln(p_e(v) / p_t(v)) over the UNION vocabulary
    with add-one smoothing (p_s(v) = (c_s(v) + 1) / (N_s + V)) — smoothing
    makes both distributions full-support, so the sum is finite even for
    OOV terms.  oov_mass = unsmoothed token mass of eval terms unseen in
    train.

    100 TB shape: one explode → one (split, term) partial-combining
    aggregate → a per-TERM pivot (conditional sums, no join of exploded
    streams) → one scalar aggregate per eval split.  The pivot means the
    union-vocabulary "full outer join" costs nothing: each term row
    already carries all three splits' counts.  Scalar totals (N_s, V)
    ride in via a single-row cross join, and the long (eval_split, ...)
    output pivots off ONE 1-row ``final`` aggregate via a constant-VALUES
    cross join — a UNION ALL referencing the CTE twice would make Spark
    (which inlines CTEs) run the whole explode chain twice.

    Float parity: counts are exact integers; each term's contribution is
    a few IEEE-rounded ops on identical doubles; only the final Σ over
    terms is order-dependent — floor-truncated at 6 decimals per repo
    convention.
    """
    split = split_case_expr(split_bucket_expr(d), train_pct, val_pct)
    lat = d.lateral_explode(d.split("text"), "token")
    return f"""
WITH toks AS (
  SELECT {split} AS split, token
  FROM (SELECT doc_id, text FROM documents WHERE text IS NOT NULL) t0
  {lat}
),
tf AS (
  SELECT token,
         CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS c_train,
         CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS c_val,
         CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS c_test
  FROM toks
  GROUP BY token
),
tot AS (
  SELECT CAST(sum(c_train) AS DOUBLE) AS n_train,
         CAST(sum(c_val) AS DOUBLE) AS n_val,
         CAST(sum(c_test) AS DOUBLE) AS n_test,
         CAST(count(*) AS DOUBLE) AS vocab
  FROM tf
),
contrib AS (
  SELECT
    tf.c_train, tf.c_val, tf.c_test, tot.n_train, tot.n_val, tot.n_test, tot.vocab,
    (tf.c_val + 1.0) / (tot.n_val + tot.vocab) AS p_val,
    (tf.c_test + 1.0) / (tot.n_test + tot.vocab) AS p_test,
    (tf.c_train + 1.0) / (tot.n_train + tot.vocab) AS p_train
  FROM tf CROSS JOIN tot
),
fin AS (
  SELECT CAST(max(vocab) AS BIGINT) AS union_vocab,
         sum(p_val * ln(p_val / p_train)) AS kl_val,
         sum(p_test * ln(p_test / p_train)) AS kl_test,
         sum(CASE WHEN c_train = 0 THEN c_val ELSE 0 END) / max(n_val) AS oov_val,
         sum(CASE WHEN c_train = 0 THEN c_test ELSE 0 END) / max(n_test) AS oov_test
  FROM contrib
)
SELECT m.eval_split, f.union_vocab,
       {d.trunc6("CASE m.eval_split WHEN 'val' THEN kl_val ELSE kl_test END")} AS kl_vs_train,
       {d.trunc6("CASE m.eval_split WHEN 'val' THEN oov_val ELSE oov_test END")} AS oov_mass
FROM fin f CROSS JOIN (VALUES ('val'), ('test')) AS m(eval_split)
ORDER BY eval_split DESC
""".strip()


def gen_corpus_card(d: Dialect) -> str:
    """The corpus card: one (metric, value) row per headline corpus
    statistic — document/token/char volume, NULL-text count, language and
    source cardinality, and the exact-duplicate ratio.  This is the
    one-query summary a dataset datasheet starts from, and the cheap
    drift check run after every ingest batch (diff two cards, alarm on
    deltas).

    ONE pass over the corpus: a single aggregate row (Spark plans the
    multiple COUNT(DISTINCT)s via expand + one shuffle; everything else
    partial-combines map-side), then the long (metric, value) format
    pivots off that ONE-row relation via a constant-VALUES cross join and
    a CASE — zero extra scans.  (A UNION ALL of per-metric projections
    would reference the agg CTE nine times, and Spark inlines CTEs: nine
    full corpus scans.)  All values emitted as DOUBLE so the long format
    is type-stable; ratios floor-truncated per repo convention.
    """
    ntoks = d.size(d.split("text"))
    md5t = d.md5_utf8("text")
    return f"""
WITH agg AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS n_null_text,
         CAST(sum(CASE WHEN text IS NULL THEN 0 ELSE {ntoks} END) AS DOUBLE) AS total_tokens,
         CAST(sum(CASE WHEN text IS NULL THEN 0 ELSE length(text) END) AS DOUBLE) AS total_chars,
         CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs,
         CAST(count(DISTINCT source) AS DOUBLE) AS n_sources,
         CAST(count(DISTINCT {md5t}) AS DOUBLE) AS n_distinct_texts
  FROM documents
)
SELECT m.metric,
       CASE m.metric
         WHEN 'exact_dup_ratio' THEN {d.trunc6('CASE WHEN n_docs - n_null_text > 0 THEN 1.0 - n_distinct_texts / (n_docs - n_null_text) ELSE 0.0 END')}
         WHEN 'mean_doc_tokens' THEN {d.trunc6('CASE WHEN n_docs - n_null_text > 0 THEN total_tokens / (n_docs - n_null_text) ELSE 0.0 END')}
         WHEN 'n_distinct_texts' THEN n_distinct_texts
         WHEN 'n_docs' THEN n_docs
         WHEN 'n_langs' THEN n_langs
         WHEN 'n_null_text' THEN n_null_text
         WHEN 'n_sources' THEN n_sources
         WHEN 'total_chars' THEN total_chars
         ELSE total_tokens
       END AS value
FROM agg CROSS JOIN (VALUES ('exact_dup_ratio'), ('mean_doc_tokens'),
  ('n_distinct_texts'), ('n_docs'), ('n_langs'), ('n_null_text'),
  ('n_sources'), ('total_chars'), ('total_tokens')) AS m(metric)
ORDER BY metric
""".strip()


def gen_mixture_quota(
    d: Dialect, token_budget: int = 1_000_000, alpha_pct: int = 50
) -> str:
    """Per-source sampling QUOTAS for a token-budgeted training mixture —
    the actionable sequel to :func:`gen_domain_mixture`: given a total
    ``token_budget``, each source's token allocation is budget × w_i
    (temperature-sampled weight, alpha = ``alpha_pct``/100), converted to
    a document quota via the source's OWN mean document length, and capped
    at the documents the source actually has (a small source cannot
    oversample without replacement; the shortfall is reported as its own
    column instead of silently redistributed).

    One corpus aggregation (identical shape to gen_domain_mixture), then
    pure arithmetic on the per-source relation.  Integer quotas use floor
    — budgets are ceilings, not targets.
    """
    # sqrt is IEEE-correctly-rounded everywhere; pow(x, 0.5) is not
    # guaranteed to be, and a last-ulp libm/JVM divergence under the
    # floor()ed quota could flip an integer — use sqrt for the canonical
    # alpha = 0.5 and pow only for other temperatures
    share_pow = (
        "sqrt(share)" if alpha_pct == 50 else f"power(share, {alpha_pct} / 1.0e2)"
    )
    return f"""
WITH {_mixture_shares_cte(d)},
weights AS (
  SELECT source, n_docs, sum_tokens, share,
         {share_pow} / sum({share_pow}) OVER () AS w
  FROM shares
  WHERE sum_tokens > 0
)
SELECT source, n_docs, sum_tokens,
       {d.trunc6('w')} AS mix_weight,
       CAST(floor({token_budget} * w) AS BIGINT) AS token_quota,
       least(CAST(floor({token_budget} * w / (CAST(sum_tokens AS DOUBLE) / n_docs)) AS BIGINT),
             n_docs) AS doc_quota,
       CAST(greatest(CAST(floor({token_budget} * w / (CAST(sum_tokens AS DOUBLE) / n_docs)) AS BIGINT) - n_docs,
                     0) AS BIGINT) AS doc_shortfall
FROM weights
ORDER BY source
""".strip()


def gen_forget_audit(d: Dialect, modulus: int = 53) -> str:
    """Right-to-be-forgotten propagation audit: given a tombstone set (here
    a deterministic predicate — every doc whose id ≡ 0 mod ``modulus``,
    standing in for an opt-out request table), report per source what a
    purge removes from the corpus AND from the derived chunk relation.
    The delete itself is the trivial anti-join; what a compliance review
    actually needs is this audit — proof the purge reaches every derived
    table, with row/char/chunk counts per source.

    100 TB shape: the chunk relation never materializes its text — only
    (doc_id, 1) rows reach the per-doc chunk-count aggregate (partial-
    combining on doc_id, the same key the LEFT JOIN then uses, so AQE
    reuses the exchange); the outer aggregate partial-combines on the
    small ``source`` key.  A real tombstone TABLE would broadcast: opt-out
    sets are tiny relative to the corpus.

    All conditional sums CAST to BIGINT (DuckDB sum → HUGEINT, the round-4
    driver-hash trap).
    """
    from storage_crawler_spark.operators.text import gen_chunk_split

    tomb = f"d.doc_id % {modulus} = 0"
    return f"""
WITH ch AS (
  SELECT doc_id, count(*) AS n_chunks
  FROM (
{gen_chunk_split(d)}
  ) c
  GROUP BY doc_id
)
SELECT d.source AS source,
       CAST(sum(CASE WHEN {tomb} THEN 1 ELSE 0 END) AS BIGINT) AS docs_purged,
       CAST(sum(CASE WHEN {tomb} THEN 0 ELSE 1 END) AS BIGINT) AS docs_kept,
       CAST(sum(CASE WHEN {tomb} THEN d.n_chars ELSE 0 END) AS BIGINT) AS chars_purged,
       CAST(sum(CASE WHEN {tomb} THEN coalesce(ch.n_chunks, 0) ELSE 0 END) AS BIGINT) AS chunks_purged
FROM documents d
LEFT JOIN ch ON d.doc_id = ch.doc_id
GROUP BY d.source
ORDER BY source
""".strip()


def gen_dedup_funnel(d: Dialect) -> str:
    """Dedup-cascade funnel: docs and tokens surviving each escalating
    tier — raw → byte-exact keepers → normalized-exact keepers — the
    one-page answer to "how much does each dedup stage actually remove?"
    that decides whether the expensive near-dup tiers are worth running
    on a given corpus.

    Each tier's keeper rule is the same min-doc_id-over-fingerprint used
    by the production operators (dedup_exact / dedup_normalized_exact),
    recomputed here inside one query so the funnel is ONE Catalyst plan:
    a single scan computes both fingerprints and the token count, two
    window passes (one per fingerprint key) mark keepers, and one
    aggregate pivots the three tiers into rows.  100 TB shape: two
    shuffles on md5 keys (no skew by construction), zero joins.
    """
    raw_fp = d.md5_utf8("text")
    norm = d.regex_replace_all("lower(trim(text))", "[ ]+", " ")
    norm_fp = d.md5_utf8(norm)
    ntoks = d.size(d.split("text"))
    tiers = {
        1: ("raw", "1"),
        2: ("exact_keepers", "CASE WHEN doc_id = raw_keeper THEN 1 ELSE 0 END"),
        3: ("normalized_keepers", "CASE WHEN doc_id = norm_keeper THEN 1 ELSE 0 END"),
    }
    unions = "\nUNION ALL\n".join(
        f"SELECT {no} AS tier_no, '{name}' AS tier,"
        f" CAST(sum({flag}) AS BIGINT) AS n_docs,"
        f" CAST(sum(({flag}) * n_tokens) AS BIGINT) AS sum_tokens FROM marked"
        for no, (name, flag) in tiers.items()
    )
    return f"""
WITH marked AS (
  SELECT doc_id, n_tokens,
         min(doc_id) OVER (PARTITION BY raw_fp) AS raw_keeper,
         min(doc_id) OVER (PARTITION BY norm_fp) AS norm_keeper
  FROM (
    SELECT doc_id, {raw_fp} AS raw_fp, {norm_fp} AS norm_fp, {ntoks} AS n_tokens
    FROM documents WHERE text IS NOT NULL
  ) f
)
{unions}
ORDER BY tier_no
""".strip()


def gen_mixture_apply(
    d: Dialect, token_budget: int = 1_000_000, alpha_pct: int = 50
) -> str:
    """Materialize the temperature-sampled mixture that
    :func:`gen_mixture_quota` plans: each source's ``doc_quota``
    lowest-md5-key documents are selected (the frozen Efraimidis-style
    uniform of the sampling plane — rerun- and engine-stable), and the
    audit emitted is the per-source REALIZED sample vs its plan: docs
    kept, tokens kept, token overshoot/undershoot against the quota.
    This closes the mixture loop: weights → quotas → the actual
    deterministic document set.

    100 TB shape: the quota relation is source-cardinality rows
    (broadcast); the rank is a per-source window over (source, key) pairs
    — at extreme per-source cardinality the two-phase range-partitioned
    rank of the Jaccard plane is the documented upgrade path; everything
    else is map-side arithmetic and one final partial-combining
    aggregate.
    """
    key = d.md5_key48("CAST(doc_id AS STRING)", seed="mix")
    ntoks = d.size(d.split("text"))
    quota = gen_mixture_quota(d, token_budget, alpha_pct)
    return f"""
WITH q AS (
{quota}
),
ranked AS (
  SELECT doc_id, source, n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS rnk
  FROM (
    SELECT doc_id, source, {ntoks} AS n_tokens, {key} AS key
    FROM documents WHERE text IS NOT NULL
  ) t
),
kept AS (
  SELECT r.source, r.n_tokens
  FROM ranked r JOIN q ON r.source = q.source
  WHERE r.rnk <= q.doc_quota
)
SELECT q.source AS source, q.doc_quota AS doc_quota,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS docs_kept,
       CAST(coalesce(k.tok_kept, 0) AS BIGINT) AS tokens_kept,
       q.token_quota AS token_quota,
       CAST(coalesce(k.tok_kept, 0) - q.token_quota AS BIGINT) AS token_overshoot
FROM q
LEFT JOIN (
  SELECT source, count(*) AS n_kept, CAST(sum(n_tokens) AS BIGINT) AS tok_kept
  FROM kept GROUP BY source
) k ON q.source = k.source
ORDER BY source
""".strip()


def gen_neardup_contamination(d: Dialect, sigs_rel: str | None = None) -> str:
    """NEAR-duplicate train→eval contamination: an eval document is
    contaminated if it shares a minhash LSH band key with ANY train
    document — the leakage mode exact n-gram decontamination
    (:func:`gen_ngram_contamination`) misses (a paraphrased or lightly
    edited train document inflates eval scores just as surely as a
    verbatim one).  Reuses the production LSH banding unchanged
    (operators/dedup.py), so "contaminated" here means exactly "the dedup
    tier would have paired them".

    Per held-out split: doc count, contaminated count, rate.

    100 TB shape: signatures are a map-only derivation (persisted once
    Spark-side via ``sigs_rel``); band keys explode 4× (constant); the
    train-side band-key set DISTINCTs down before the semi-join, which
    shuffles on the 16-byte band key; one final tiny aggregate.
    """
    from storage_crawler_spark.operators.dedup import gen_minhash_bands, gen_minhash_sigs
    from storage_crawler_spark.operators.sampling import split_bucket_expr, split_case_expr

    split = split_case_expr(split_bucket_expr(d))
    ctes: list[str] = []
    if sigs_rel is None:
        ctes.append(f"sigs AS (\n{gen_minhash_sigs(d)}\n)")
        sigs_rel = "sigs"
    ctes.append(f"bands AS (\n{gen_minhash_bands(d, sigs_rel)}\n)")
    ctes.append(
        f"""sb AS (
  SELECT b.doc_id, dsp.split, b.band_id, b.band_key
  FROM bands b
  JOIN (SELECT doc_id, {split} AS split FROM documents) dsp
    ON b.doc_id = dsp.doc_id
),
trainkeys AS (
  SELECT DISTINCT band_id, band_key FROM sb WHERE split = 'train'
),
evaldocs AS (
  SELECT doc_id, split, max(hit) AS contaminated
  FROM (
    SELECT s.doc_id, s.split,
           CASE WHEN t.band_key IS NOT NULL THEN 1 ELSE 0 END AS hit
    FROM sb s
    LEFT JOIN trainkeys t ON s.band_id = t.band_id AND s.band_key = t.band_key
    WHERE s.split <> 'train'
  ) h
  GROUP BY doc_id, split
)"""
    )
    ctes_sql = ",\n".join(ctes)
    rate = d.trunc6("CAST(sum(contaminated) AS DOUBLE) / count(*)")
    return f"""WITH {ctes_sql}
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(contaminated) AS BIGINT) AS n_contaminated,
       {rate} AS contamination_rate
FROM evaldocs
GROUP BY split
ORDER BY split
""".strip()


def gen_quality_budget_curve(d) -> str:
    """Token-budget vs quality-cutoff curve: if the corpus is filtered to
    its top decile / top two deciles / ... by the quality-classifier
    logit, how many documents and tokens survive?  The keep-rate decision
    table behind "filter at quality X or at token budget Y" — computed
    without ever sorting the corpus globally.

    Deciles come from exact percentile THRESHOLDS (one reduce over the
    logit relation, the perplexity-tertile pattern) applied map-side as
    nine CASE comparisons — not ntile(), whose global sort is the
    100 TB anti-shape.  Thresholds are ``percentile_disc`` over the
    logits recovered onto the exact 1e-6 BIGINT lattice (r13, the
    tertile fix: percentile_cont's interpolation for non-binary-exact
    fractions like 0.9 is associated differently by the two engines and
    can land one ulp apart, flipping docs that sit exactly on a
    threshold lattice point; disc selects an actual data value and the
    comparison is then exact BIGINT).  Boundary semantics (r14): the
    ``percentile_disc(q)`` element is by definition part of the bottom
    ``q`` mass (its cume_dist first reaches ``q``), so the bucket
    comparison is ``micro <= t`` — the threshold element fills DOWNWARD
    into the worse decile, and on distinct logits with ``n`` divisible
    by 10 every decile holds exactly ``n/10`` docs (the equal-fill
    closure contract pinned by
    tests/test_round6_additions.py::test_quality_budget_curve_cumulative_closure).
    Tied logits straddling a threshold move together into the worse
    decile in both engines.  The cumulative column runs over the 10-row
    decile relation only.
    """
    from storage_crawler_spark.operators.text import gen_quality_classifier

    qc = gen_quality_classifier(d)
    pc = ", ".join(
        f"CAST(percentile_disc({(10 - i) / 10}) WITHIN GROUP (ORDER BY micro) AS BIGINT) AS t{i}"
        for i in range(1, 10)
    )
    bucket = "1 + " + " + ".join(
        f"(CASE WHEN micro <= t{i} THEN 1 ELSE 0 END)" for i in range(1, 10)
    )
    return f"""
WITH qc AS (
{qc}
),
qcm AS (
  SELECT CAST(round(quality_logit * 1000000.0e0) AS BIGINT) AS micro, n_tokens
  FROM qc
),
th AS (SELECT {pc} FROM qcm),
b AS (
  SELECT CAST(({bucket}) AS INT) AS decile, n_tokens
  FROM qcm CROSS JOIN th
),
per AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
  FROM b GROUP BY decile
)
SELECT decile, n_docs, sum_tokens,
       CAST(sum(n_docs) OVER w AS BIGINT) AS cum_docs,
       CAST(sum(sum_tokens) OVER w AS BIGINT) AS cum_tokens
FROM per
WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY decile
""".strip()


def gen_decontaminate_apply(
    d: Dialect,
    n: int = 5,
    train_pct: int = 80,
    val_pct: int = 10,
    kd_rel: str | None = None,
) -> str:
    """Decontamination APPLY (the GPT-3 appendix-C direction): drop TRAIN
    documents sharing any token ``n``-gram with the held-out splits, so
    the benchmark stays clean and the training corpus loses the leaked
    mass — the action sequel to :func:`gen_ngram_contamination`'s per-doc
    verdict.  Per-source manifest: train docs, dropped, kept, drop share
    (the corpus-budget cost of decontamination, per feed).

    Train docs too short to yield an n-gram cannot leak and are kept —
    membership comes from the split expression on ``documents`` itself,
    not from the gram relation.  Shape: one distinct (ngram, doc, split)
    relation (``kd_rel`` persisted by the Spark builder, same convention
    as the detector), eval keys semi-matched onto train grams via a hash
    join (AQE-splittable; never a window), one per-doc max, one per-source
    aggregate.
    """
    from storage_crawler_spark.operators.text import gen_token_ngrams

    split = split_case_expr(split_bucket_expr(d), train_pct, val_pct)
    if kd_rel:
        with_clause = "WITH "
        kd = kd_rel
    else:
        kd = "kd"
        with_clause = f"""WITH g AS (
{gen_token_ngrams(d, n)}
),
kd AS (
  SELECT DISTINCT ngram, doc_id, {split} AS split FROM g
),
"""
    share = d.trunc6("CAST(sum(hit) AS DOUBLE) / count(*)")
    return f"""{with_clause}evk AS (
  SELECT DISTINCT ngram FROM {kd} WHERE split <> 'train'
),
verdict AS (
  SELECT k.doc_id,
         max(CASE WHEN e.ngram IS NOT NULL THEN 1 ELSE 0 END) AS hit
  FROM {kd} k LEFT JOIN evk e ON k.ngram = e.ngram
  WHERE k.split = 'train'
  GROUP BY k.doc_id
),
train_docs AS (
  SELECT doc_id, source FROM documents WHERE {split} = 'train'
)
SELECT t.source,
       CAST(count(*) AS BIGINT) AS n_train,
       CAST(sum(hit) AS BIGINT) AS n_dropped,
       CAST(count(*) - sum(hit) AS BIGINT) AS n_kept,
       {share} AS drop_share
FROM (
  SELECT td.source, coalesce(v.hit, 0) AS hit
  FROM train_docs td LEFT JOIN verdict v ON td.doc_id = v.doc_id
) t
GROUP BY t.source
ORDER BY t.source
""".strip()


def gen_dsir_tok(d: Dialect, buckets: int = 256) -> str:
    """(doc_id, source, lang, b) hashed-token relation — the ONE corpus
    explode every DSIR stage reads.  Factored out so the Spark builder
    can persist it (Spark inlines CTEs: the un-persisted form re-scanned
    documents five times — plan-audit catch); the DuckDB oracle keeps it
    as a MATERIALIZED CTE."""
    toks = d.split("text")
    lat = d.lateral_explode("toks", "token")
    bucket = f"({d.md5_key48('token', 'dsir')} % {buckets})"
    return f"""
SELECT doc_id, source, lang, {bucket} AS b
FROM (SELECT doc_id, source, lang, {toks} AS toks
      FROM documents WHERE text IS NOT NULL) t0
{lat}
""".strip()


def gen_dsir_weights(
    d: Dialect,
    buckets: int = 256,
    target_lang: str = "en",
    tok_rel: str | None = None,
) -> str:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every RAW
    document by the mean log-likelihood ratio of its tokens under two
    hashed-unigram language models — one fit on the TARGET distribution
    (here the ``target_lang`` slice, standing in for the curated corpus),
    one on the raw remainder.  High-weight raw documents "look like" the
    target and are what importance resampling keeps.

    Relational shape: one token explode (the corpus is touched once),
    md5-hashed into ``buckets`` LM cells (the DSIR hashing trick — the
    LM state is O(buckets), not O(vocab)), two ≤``buckets``-row count
    relations, then the scoring join — both LMs broadcast in Spark, so
    the only shuffle is the per-doc combine.  Add-one smoothing keeps
    every bucket finite; the log ratio is ONE ln() per token over a
    deterministic integer-derived rational, and mean_llr is an order-free
    lattice mean at p=12 (r14 determinism audit; |ln ratio| is bounded
    by ln of the corpus token count — far under the 9e3 lattice bound).

    Output: every raw doc's (n_toks, mean_llr), doc_id-ordered — no
    float ranking crosses engines (the BM25 last-ulp lesson); consumers
    resample by thresholding mean_llr themselves.
    """
    # target_lang is spliced into SQL literals: enforce the lang-code
    # contract instead of escaping (the phrase-search lesson — validated
    # inputs beat quoting games)
    if not target_lang.isascii() or not target_lang.isalnum() or not (
        1 <= len(target_lang) <= 8
    ):
        raise ValueError(f"target_lang must be a short alnum code: {target_lang!r}")
    if not 2 <= buckets <= 1_048_576:
        raise ValueError(f"buckets out of range: {buckets}")
    # P_target(b) / P_raw(b) with add-one smoothing, as one rational:
    # ((tc+1) / (T+B)) / ((rc+1) / (R+B)) — every operand an exact
    # integer cast to DOUBLE, so the rational is bit-identical across
    # engines and the single ln() lands inside the trunc6 floor
    ratio = (
        f"(CAST(coalesce(tc.c, 0) + 1 AS DOUBLE) / CAST(tot.t + {buckets} AS DOUBLE)) "
        f"/ (CAST(coalesce(rc.c, 0) + 1 AS DOUBLE) / CAST(tot.r + {buckets} AS DOUBLE))"
    )
    mat = " MATERIALIZED" if d.name == "duck" else ""
    tok_cte = (
        f"tok AS (SELECT doc_id, source, lang, b FROM {tok_rel})"
        if tok_rel
        else f"tok AS{mat} (\n{gen_dsir_tok(d, buckets)}\n)"
    )
    return f"""
WITH {tok_cte},
tcnt AS (
  SELECT b, CAST(count(*) AS BIGINT) AS c FROM tok
  WHERE lang = '{target_lang}' GROUP BY b
),
rcnt AS (
  SELECT b, CAST(count(*) AS BIGINT) AS c FROM tok
  WHERE lang <> '{target_lang}' OR lang IS NULL GROUP BY b
),
tot AS (
  SELECT (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM tcnt) AS t,
         (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM rcnt) AS r
)
SELECT tok.doc_id, tok.source,
       CAST(count(*) AS BIGINT) AS n_toks,
       {avg_lattice(d, f'ln({ratio})', 12)} AS mean_llr
FROM tok
LEFT JOIN tcnt tc ON tok.b = tc.b
LEFT JOIN rcnt rc ON tok.b = rc.b
CROSS JOIN tot
WHERE tok.lang <> '{target_lang}' OR tok.lang IS NULL
GROUP BY tok.doc_id, tok.source
ORDER BY tok.doc_id
""".strip()


def gen_embedding_coverage(d: Dialect) -> str:
    """Referential-integrity audit between the document corpus and its
    embedding store: per source, how many documents have a vector, how
    many are missing one, and how many matched vectors are unusable
    (NULL or empty embedding, or zero norm — the rows every similarity
    entry's norm guard silently drops).  Orphan vectors (no matching
    document) roll up under the ``__orphan_vector__`` label, NULL-source
    documents under ``__null_source__`` — a FULL OUTER JOIN so neither
    side's strays can hide.  This is the audit a pipeline runs BEFORE
    trusting any ANN/dedup result: a 30%-unembedded source silently
    vanishes from semantic dedup without ever failing a query.

    All columns are exact BIGINT counts (no float anywhere).  100 TB
    shape: one id-keyed shuffle join + a partial-combining aggregate on
    the tiny source key; the zero-norm probe reuses the fold the norm
    CTE pays everywhere else.
    """
    ev = d.cast_double_arr("e.embedding")
    bad = (
        f"(e.embedding IS NULL OR {d.size(ev)} = 0 "
        f"OR {d.dot(ev, ev)} = 0)"
    )
    src = (
        "CASE WHEN dd.doc_id IS NULL THEN '__orphan_vector__' "
        "ELSE coalesce(dd.source, '__null_source__') END"
    )
    return f"""
WITH dd AS (SELECT doc_id, source FROM documents),
j AS (
  SELECT dd.doc_id, dd.source, e.vec_id,
         CASE WHEN e.vec_id IS NOT NULL AND {bad} THEN 1 ELSE 0 END AS is_bad,
         {src} AS bucket
  FROM dd FULL OUTER JOIN embeddings e ON dd.doc_id = e.vec_id
)
SELECT bucket AS source,
       CAST(count(doc_id) AS BIGINT) AS n_docs,
       CAST(count(vec_id) AS BIGINT) AS n_vectors,
       CAST(count(doc_id) - count(CASE WHEN vec_id IS NOT NULL
                                       THEN doc_id END) AS BIGINT) AS n_missing_vector,
       CAST(sum(is_bad) AS BIGINT) AS n_unusable_vector
FROM j
GROUP BY bucket
ORDER BY source
""".strip()


def gen_forget_apply(d: Dialect, modulus: int = 53, shard_size: int = 64,
                     rewrite_frac_micro: int = 250_000, bulk_shard: int = 5) -> str:
    """Right-to-be-forgotten APPLY on the embedding store — the maintenance
    step after :func:`gen_forget_audit`'s compliance report: per shard
    (``vec_id div shard_size``, the physical file grain), decide between a
    full shard REWRITE (deleted fraction >= threshold — reclaim the space)
    and a DELETION VECTOR (the Delta/Iceberg merge-on-read artifact: keep
    the file, mask the positions), and emit the referential proof that the
    applied store holds exactly the kept vectors (count + exact vec_id sum
    per shard — any dropped keeper or surviving tombstone breaks it).

    The tombstone set is the audit's deterministic predicate (vec_id ≡ 0
    mod ``modulus``) PLUS one planted bulk-account range (every vector of
    shard ``bulk_shard`` — real forget requests cluster: deleting an
    account tombstones its whole history, which is exactly what pushes a
    shard over the rewrite threshold), so audit → apply is an end-to-end
    checkable path AND both actions are exercised on real data.  Threshold compares on the integer micro-lattice
    (floor(frac·10⁶) vs ``rewrite_frac_micro``) — no float in a decision.

    100 TB shape: ONE scan of the store projecting (shard, tombstone
    flag) — the embedding arrays never move — and one partial-combining
    aggregate on shard; the real rewrite would then touch only the
    'rewrite' shards (listed here), which is the point of the manifest.
    """
    shard = d.idiv("vec_id", str(shard_size))
    tomb = f"(vec_id % {modulus} = 0 OR {shard} = {bulk_shard})"
    n_del = f"CAST(sum(CASE WHEN {tomb} THEN 1 ELSE 0 END) AS BIGINT)"
    frac_micro = d.idiv(f"{n_del} * 1000000", "count(*)")
    return f"""
SELECT CAST({shard} AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(CASE WHEN {tomb} THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
       CAST({frac_micro} AS BIGINT) AS deleted_frac_micro,
       CASE WHEN {frac_micro} >= {rewrite_frac_micro} THEN 'rewrite'
            WHEN sum(CASE WHEN {tomb} THEN 1 ELSE 0 END) > 0 THEN 'deletion_vector'
            ELSE 'untouched' END AS action,
       CAST(sum(CASE WHEN {tomb} THEN 0 ELSE 1 END) AS BIGINT) AS kept_count,
       CAST(sum(CASE WHEN {tomb} THEN 0 ELSE vec_id END) AS BIGINT) AS kept_id_sum
FROM embeddings
GROUP BY {shard}
ORDER BY shard
""".strip()


def gen_epoch_plan(d: Dialect, epochs_target: int = 2) -> str:
    """Data-constrained epoch allocation (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models", public): given a token
    budget of ``epochs_target`` × the corpus (the scale-invariant form of
    "train for ~2 epochs of data"), allocate per-source repeat counts so
    that sources repeat no more than their REPEAT CAP — derived here from
    the source's exact-duplicate ratio (a source whose content is already
    repetitive has effectively "used up" its repeats: cap = least(4,
    1 + floor(4·distinct_ratio)) ∈ {1..4}, the paper's ~4-epoch
    diminishing-returns knee) — and the remaining budget spreads as one
    GLOBAL multiplier λ over the uncapped sources: the water-filling
    solution of Σ_s t_s·min(cap_s, λ) = B.

    λ has a CLOSED RELATIONAL FORM: group sources by cap, order the
    (≤4-row) cap relation ascending, take prefix cumulative sums, and pick
    the unique prefix where λ_j = (B − Σ_{cap≤c_j} t·cap) / (T − Σ_{cap≤c_j} t)
    lands in [c_j, c_{j+1}] — no iteration.  If even every cap saturated
    cannot absorb B (Σ t·cap < B), the plan reports feasible = 0, epochs =
    cap everywhere, and the λ column carries the max cap.

    Engine exactness: token/cap sums are BIGINT; λ is ONE division of
    exact integers; epochs = min(cap, λ) and alloc = t·epochs are single
    IEEE ops — identical cross-engine.  Boundary ties (λ exactly on a cap)
    resolve to the smallest valid prefix (ORDER BY + LIMIT 1).

    100 TB shape: one corpus aggregate on the low-cardinality source key
    (the distinct-fingerprint count shuffles (source, fp) pairs — the
    dedup_exact cost class; swap in the HLL sketch for an approximate cap
    at extreme scale); ALL downstream algebra runs on the per-source and
    per-cap relations (K and ≤4 rows).  The windows are over the ≤4-row
    cap relation — never the corpus."""
    ntoks = d.size(d.split("text"))
    fp = d.md5_utf8("text")
    return f"""
WITH per_src AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN text IS NULL THEN 0 ELSE {ntoks} END) AS BIGINT) AS sum_tokens,
         CAST(count(DISTINCT CASE WHEN text IS NULL THEN NULL ELSE {fp} END) AS BIGINT) AS n_distinct,
         CAST(count(text) AS BIGINT) AS n_text
  FROM documents
  GROUP BY source
),
{_epoch_plan_tail(d, epochs_target)}
""".strip()


def gen_epoch_plan_hll(d: Dialect, epochs_target: int = 2) -> str:
    """Sketch-swapped :func:`gen_epoch_plan` (r12, verdict item 9 — the
    swap the base entry's docstring promises for extreme scale): the
    per-source exact-duplicate ratio driving the repeat cap comes from the
    deterministic HLL NDV estimate (operators/sketches.gen_hll_ndv, m=64
    registers per source) instead of count(DISTINCT md5(text)).

    Cost class: the exact form shuffles every distinct (source,
    fingerprint) pair — the dedup_exact class, corpus-sized; the sketch
    form's state is 64 register rows per source whatever the corpus
    volume, all partial-combining.  The estimate is engine-identical (the
    HLL exactness argument: single-bit doubles, ≤64-term sums under 52
    mantissa bits), so caps — and the whole closed-form water-filling
    allocation downstream — stay hash-gateable; the ~13% relative error
    of m=64 moves a source's cap only when 4·ratio sits near an integer
    boundary, and the output exposes distinct_ratio so the swap is
    auditable against the exact entry."""
    from storage_crawler_spark.operators.sketches import gen_hll_ndv

    ntoks = d.size(d.split("text"))
    hll = gen_hll_ndv(
        d, d.md5_utf8("text"), "documents", "epochndv", group_by="source"
    )
    return f"""
WITH base_src AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN text IS NULL THEN 0 ELSE {ntoks} END) AS BIGINT) AS sum_tokens,
         CAST(count(text) AS BIGINT) AS n_text
  FROM documents
  GROUP BY source
),
hll_src AS (
{hll}
),
per_src AS (
  SELECT b.source, b.n_docs, b.sum_tokens,
         coalesce(h.distinct_est, CAST(0 AS DOUBLE)) AS n_distinct,
         b.n_text
  FROM base_src b LEFT JOIN hll_src h ON h.grp = b.source
),
{_epoch_plan_tail(d, epochs_target)}
""".strip()


def _epoch_plan_tail(d: Dialect, epochs_target: int) -> str:
    """Shared water-filling tail of the epoch plans: everything after the
    per-source relation (caps → totals → cap-prefix candidates → λ pick).
    ``per_src`` must provide (source, n_docs, sum_tokens, n_distinct,
    n_text); n_distinct may be exact BIGINT or the HLL DOUBLE estimate —
    the cap algebra (one division, floor, least) is identical either way."""
    return _EPOCH_TAIL_TEMPLATE.format(
        epochs_target=epochs_target,
        ratio=d.trunc6("c.distinct_ratio"),
        epochs=d.trunc6("least(CAST(c.cap AS DOUBLE), l.lam)"),
        alloc=d.trunc6("c.sum_tokens * least(CAST(c.cap AS DOUBLE), l.lam)"),
        lam=d.trunc6("l.lam"),
    )


_EPOCH_TAIL_TEMPLATE = """caps AS (
  SELECT source, n_docs, sum_tokens,
         CAST(n_distinct AS DOUBLE) / n_text AS distinct_ratio,
         least(4, 1 + CAST(floor(4.0e0 * n_distinct / n_text) AS BIGINT)) AS cap
  FROM per_src
  WHERE n_text > 0
),
tot AS (
  SELECT CAST(sum(sum_tokens) AS BIGINT) AS t_all,
         CAST(sum(sum_tokens * cap) AS BIGINT) AS tc_all,
         CAST({epochs_target} * sum(sum_tokens) AS BIGINT) AS budget,
         CAST(max(cap) AS DOUBLE) AS max_cap
  FROM caps
),
bycap AS (
  SELECT cap, CAST(sum(sum_tokens) AS BIGINT) AS t_c,
         CAST(sum(sum_tokens * cap) AS BIGINT) AS tc_c
  FROM caps GROUP BY cap
),
cand AS (
  SELECT CAST(0 AS BIGINT) AS capv, CAST(0 AS BIGINT) AS cum_t,
         CAST(0 AS BIGINT) AS cum_tc
  FROM tot
  UNION ALL
  SELECT cap,
         CAST(sum(t_c) OVER (ORDER BY cap) AS BIGINT),
         CAST(sum(tc_c) OVER (ORDER BY cap) AS BIGINT)
  FROM bycap
),
sel AS (
  SELECT capv, cum_t, cum_tc,
         lead(capv) OVER (ORDER BY capv) AS next_cap
  FROM cand
),
pick AS (
  SELECT (CAST(t.budget AS DOUBLE) - s.cum_tc) / (t.t_all - s.cum_t) AS lam
  FROM sel s CROSS JOIN tot t
  WHERE t.t_all > s.cum_t
    AND (CAST(t.budget AS DOUBLE) - s.cum_tc) / (t.t_all - s.cum_t) >= s.capv
    AND (s.next_cap IS NULL
         OR (CAST(t.budget AS DOUBLE) - s.cum_tc) / (t.t_all - s.cum_t) <= s.next_cap)
  ORDER BY capv
  LIMIT 1
),
lamsel AS (
  SELECT CASE WHEN t.tc_all < t.budget THEN t.max_cap ELSE p.lam END AS lam,
         CASE WHEN t.tc_all < t.budget THEN 0 ELSE 1 END AS feasible,
         t.budget
  FROM tot t LEFT JOIN pick p ON 1 = 1
)
SELECT c.source, c.n_docs, c.sum_tokens,
       {ratio} AS distinct_ratio,
       c.cap AS repeat_cap,
       {epochs} AS epochs,
       {alloc} AS alloc_tokens,
       {lam} AS lambda_mult,
       CAST(l.feasible AS INT) AS feasible,
       l.budget AS budget_tokens
FROM caps c CROSS JOIN lamsel l
ORDER BY c.source
""".strip()
