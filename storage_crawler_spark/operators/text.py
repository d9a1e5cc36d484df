"""Text-analysis operators over the ``documents`` table (SURVEY.md §2.9).

All four operators are pure Catalyst/DuckDB expressions generated from one
source per operator (see plans/dialect.py) — no Python UDFs in the hot path,
so at 100 TB these run entirely inside whole-stage codegen over a single
parquet scan with column pruning (only ``doc_id``/``text``/``lang`` read).
"""

from __future__ import annotations

from storage_crawler_spark.plans.dialect import Dialect, avg_lattice

# Stopword markers per language for the n-gram/marker language-ID heuristic.
_LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "a"),
    "de": ("der", "und", "die", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "los", "y", "es", "las"),
    "zh": ("de", "shi", "le", "zai", "he"),
}

_STOPWORDS = ("the", "a", "of", "and", "is", "to", "in", "it", "on", "for")


def _avg6_exact(d: Dialect, row_expr: str) -> str:
    """ORDER-FREE engine-exact mean of a per-row DOUBLE expression (r13 —
    found by the fresh-seed fuzz wave, text_perplexity_tertiles seed 257):
    ``trunc6(avg(x))`` over doubles is partition-order-DEPENDENT on Spark
    (partial sums merge in task-completion order) while DuckDB sums in its
    own order, so a mean within ~sqrt(n) ulps of a 1e-6 grid line can
    truncate differently per engine — a latent flake in every
    avg-of-transcendental site.  Instead: floor each row onto the exact
    1e-6 BIGINT lattice (per-row doubles are bit-identical cross-engine —
    ints through ln/division, each a single IEEE op), sum the BIGINTs
    (exact, order-free), and take ONE late division + trunc6.

    The displayed mean differs from the old form by < 1e-6 (per-row floor
    before the mean instead of after); what it buys is determinism.
    BIGINT bound: sum < 2^63 needs n·x < 9.2e12 — at nll ≈ 50 that is
    ~1.8e11 rows PER GROUP, far past any per-doc/per-bucket group."""
    micro = f"CAST(floor(({row_expr}) * 1000000.0e0) AS BIGINT)"
    return d.trunc6(
        f"CAST(sum({micro}) AS DOUBLE) / "
        f"(CAST(count({micro}) AS DOUBLE) * 1000000.0e0)"
    )


def _avg6_lattice(d: Dialect, row_expr: str) -> str:
    """:func:`_avg6_exact` for rows ALREADY on the 1e-6 lattice (trunc6'd
    upstream): recover the exact integer with round() — floor would go
    k-1 when k/1e6 * 1e6 lands an ulp under k — then the same exact sum
    and single late division.  (round ties can't occur: the product is
    within an ulp of an integer.)"""
    micro = f"CAST(round(({row_expr}) * 1000000.0e0) AS BIGINT)"
    return d.trunc6(
        f"CAST(sum({micro}) AS DOUBLE) / "
        f"(CAST(count({micro}) AS DOUBLE) * 1000000.0e0)"
    )


def _in_list(words: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


# BPE-ish pre-tokenization (the GPT-2 pattern family, reduced to portable
# ASCII classes): letter runs, digit runs, and punctuation singletons each
# count as one token — the word-boundary split a byte-pair encoder sees
# before merges.  Counts approximate LLM token counts far better than
# whitespace (punctuation and numbers tokenize separately).
_BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def gen_token_stats(d: Dialect) -> str:
    """Whitespace + BPE-ish-regex token counts, char stats per document."""
    toks = d.split("text")
    btoks = d.regex_tokens("text", _BPE_ISH)
    return f"""
SELECT
  doc_id,
  {d.size(toks)} AS n_tokens,
  {d.size(btoks)} AS n_bpe_tokens,
  length(text) AS n_chars_text,
  {d.size(d.adistinct(toks))} AS n_distinct_tokens,
  {d.trunc6(f"CAST(length(replace(text, ' ', '')) AS DOUBLE) / {d.size(toks)}")} AS avg_token_len
FROM documents
""".strip()


def gen_quality_score(d: Dialect) -> str:
    """Heuristic quality scoring: stopword ratio, token-length shape,
    distinct-token ratio — the length/punct/stopword family of filters used
    by LLM-data pipelines (C4/Gopher-style rules)."""
    toks = d.split("text")
    stops = d.size(d.afilter(toks, "x", f"x IN {_in_list(_STOPWORDS)}"))
    # outputs are floor-truncated, not rounded: ratios with power-of-two
    # denominators land EXACTLY on decimal ties where the engines' round()
    # half-rules differ (Spark HALF_UP, DuckDB half-to-even); floor has no
    # half-rule and the input doubles are bit-identical in both engines
    score = (
        "0.4 * stop_ratio + 0.3 * distinct_ratio"
        " + 0.3 * (CASE WHEN avg_token_len > 10 THEN 1.0 ELSE avg_token_len / 10 END)"
    )
    return f"""
SELECT doc_id, n_tokens,
       {d.trunc6('stop_ratio')} AS stop_ratio,
       {d.trunc6('distinct_ratio')} AS distinct_ratio,
       {d.trunc6('avg_token_len')} AS avg_token_len,
       {d.trunc6(score)} AS quality_score
FROM (
  SELECT
    doc_id,
    {d.size(toks)} AS n_tokens,
    CAST({stops} AS DOUBLE) / {d.size(toks)} AS stop_ratio,
    CAST({d.size(d.adistinct(toks))} AS DOUBLE) / {d.size(toks)} AS distinct_ratio,
    CAST(length(replace(text, ' ', '')) AS DOUBLE) / {d.size(toks)} AS avg_token_len
  FROM documents
) t
""".strip()


def gen_lang_id(d: Dialect) -> str:
    """Marker-word language ID: score each language by marker hits over the
    token set, argmax with a fixed priority order on ties; compared against
    the labeled ``lang`` column."""
    toks = d.adistinct(d.split("text"))
    scores = {
        lang: d.size(d.afilter(toks, "x", f"x IN {_in_list(markers)}"))
        for lang, markers in _LANG_MARKERS.items()
    }
    score_cols = ",\n    ".join(f"{expr} AS s_{lang}" for lang, expr in scores.items())
    langs = list(_LANG_MARKERS)
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    pick = "CASE WHEN " + best + " = 0 THEN 'unknown' " + " ".join(
        f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
SELECT doc_id, lang AS actual_lang, {pick} AS predicted_lang,
       CASE WHEN {pick} = lang THEN 1 ELSE 0 END AS hit
FROM (
  SELECT doc_id, lang,
    {score_cols}
  FROM documents
) t
""".strip()


def gen_fingerprint(d: Dialect) -> str:
    """Order-sensitive rolling document fingerprint: a 31/131 polynomial
    hash folded over (token length, first char) left-to-right — the rolling
    content-defined fingerprint family, kept integer-exact in both engines."""
    # fold over a pre-transformed BIGINT array: per-token value first
    # (length*131 + first-char), then the order-sensitive 31-poly fold —
    # keeps the fold input homogeneous for both engines' reduce primitives
    # coalesce: a NULL text must fingerprint exactly like the empty text
    # (Spark folds a NULL array to NULL while DuckDB's list_prepend seeds
    # the fold anyway — an engine divergence the NULL-planted random
    # battery caught; the fixed testdata ships no NULL texts, so the
    # oracle gate alone never sees this path)
    tokvals = d.transform(
        d.split("coalesce(text, '')"),
        "x",
        f"CAST(length(x) AS BIGINT) * 131 + {d.ascii_safe('x')}",
    )
    return f"""
SELECT doc_id, {d.reduce_bigint(tokvals, "(acc * 31 + x) % 1000000007")} AS fingerprint
FROM documents
""".strip()


def gen_token_explode(d: Dialect, src: str = "documents") -> str:
    """(doc_id, token) exploded relation shared by the corpus-model
    scorers (surprisal, tf-idf)."""
    toks = d.split("text")
    lat = d.lateral_explode("toks", "token")
    return f"""
SELECT doc_id, token
FROM (SELECT doc_id, {toks} AS toks FROM {src}) t
{lat}
""".strip()


def gen_unigram_surprisal(
    d: Dialect, src: str = "documents", tok_rel: str | None = None
) -> str:
    """Per-document mean token surprisal under the corpus' OWN unigram
    model — the classic statistical gibberish/quality signal: a document of
    corpus-rare tokens scores high, boilerplate scores low, and unlike the
    rule-based quality score it needs no hand-tuned thresholds.

    surprisal(t) = -ln(count(t) / total_tokens); output = per-doc mean,
    floor-truncated at 6 decimals (repo float-parity convention — the
    per-doc mean's summation order is engine-dependent at the ULP level).

    100 TB shape: one explode (map), a token-frequency aggregate
    (partial-combining; vocabulary skew collapses map-side), a
    token-keyed join of the exploded stream against the frequency table
    (broadcast for any real vocabulary; the heavy stream never re-sorts),
    and a per-doc aggregate.  The exploded relation is referenced by both
    the model and the scoring pass; Spark inlines CTEs, so the Spark
    builder passes ``tok_rel`` naming a persisted temp view (one explode),
    while the DuckDB oracle keeps the inline CTE (DuckDB materializes
    multiply-referenced CTEs).
    """
    if tok_rel:
        tok = tok_rel
        with_clause = "WITH "
    else:
        tok = "tok"
        with_clause = f"WITH tok AS (\n{gen_token_explode(d, src)}\n),\n"
    return f"""{with_clause}freq AS (SELECT token, count(*) AS n FROM {tok} GROUP BY token),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM freq)
SELECT doc_id, count(*) AS n_tokens,
       {_avg6_exact(d, "-ln(f.n / tot.total)")} AS mean_surprisal
FROM {tok}
JOIN freq f ON {tok}.token = f.token
CROSS JOIN tot
GROUP BY doc_id
""".strip()


def gen_tfidf_topterms(
    d: Dialect, k: int = 3, src: str = "documents", tf_rel: str | None = None
) -> str:
    """Per-document characteristic terms: top-``k`` tokens ranked on the
    integer (tf DESC, df ASC, token) lattice, with the tf·idf score
    emitted as an informational column.

    This is NOT a strict tf·idf top-k: a term with lower tf but much
    rarer df can out-score a lattice-ranked term (tf=10/df=5 loses on
    score to tf=9/df=1 in a 100-doc corpus but ranks first here).  The
    lattice is chosen deliberately — JVM and libm ``ln`` can differ in
    the last ulp, so a float ORDER BY is not exactly reproducible across
    engines; the integer lattice agrees with the tf·idf order whenever
    one term dominates on both axes and is bit-reproducible everywhere.
    Consumers needing the strict float ordering should sort the emitted
    ``tfidf`` column and accept engine-local tie behavior.

    100 TB shape: explode (map) → (doc, token) tf aggregate → token df
    aggregate (both partial-combining) → broadcast df back onto the tf
    relation → per-doc top-k window on integer keys.  The tf relation is
    referenced twice (df derivation + scoring); Spark inlines CTEs, so
    the Spark builder passes ``tf_rel`` naming a persisted temp view,
    while the DuckDB oracle keeps the inline CTE.
    """
    if tf_rel:
        tf = tf_rel
        with_clause = "WITH "
    else:
        tf = "tf"
        with_clause = (
            f"WITH tok AS (\n{gen_token_explode(d, src)}\n),\n"
            "tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),\n"
        )
    return f"""{with_clause}df AS (SELECT token, count(*) AS df FROM {tf} GROUP BY token),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM {src})
SELECT doc_id, token, tf, df,
       {d.trunc6("tf * ln(n_docs / df)")} AS tfidf,
       rnk
FROM (
  SELECT {tf}.doc_id, {tf}.token, {tf}.tf, df.df, n.n_docs,
         row_number() OVER (PARTITION BY {tf}.doc_id
                            ORDER BY {tf}.tf DESC, df.df, {tf}.token) AS rnk
  FROM {tf} JOIN df ON {tf}.token = df.token CROSS JOIN n
) r
WHERE rnk <= {k}
""".strip()


# Portable regexes (Java regex ∩ RE2 — explicit ASCII classes only).
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
_PHONE_RE = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
_LONG_DIGITS_RE = "[0-9]{9,}"


def gen_vocab_coverage(
    d: Dialect, vocab_size: int = 64, src: str = "documents", tok_rel: str | None = None
) -> str:
    """Tokenizer-training preflight: build the top-``vocab_size`` word
    vocabulary from the corpus itself (count DESC, token ASC — a total
    deterministic order), then score every document's out-of-vocabulary
    token rate against it.  High OOV-rate docs are what blow up a learned
    tokenizer's fertility; this is the signal a pipeline uses to size the
    vocab or route docs to a byte-fallback path.

    100 TB shape: token explode (map) → token-frequency aggregate
    (partial-combining); the vocab selection is ``ORDER BY freq DESC,
    token LIMIT vocab_size`` — Spark fuses that to TakeOrderedAndProject
    (map-side partial top-k, NO window, no single-partition sort of the
    vocabulary relation, which grows with corpus size; the previous
    global ``row_number`` form was exactly that sort).  The vocab is a
    ≤``vocab_size``-row broadcast joined back onto the exploded stream —
    the heavy stream is touched by one map and one per-doc aggregate, no
    re-sort.  Spark builder persists the exploded relation (``tok_rel``);
    the oracle inlines the CTE.
    """
    if tok_rel:
        tok = tok_rel
        with_clause = "WITH "
    else:
        tok = "tok"
        with_clause = f"WITH tok AS (\n{gen_token_explode(d, src)}\n),\n"
    oov = "CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
    return f"""{with_clause}freq AS (SELECT token, count(*) AS n FROM {tok} GROUP BY token),
vocab AS (
  SELECT token FROM freq ORDER BY n DESC, token LIMIT {vocab_size}
)
SELECT {tok}.doc_id AS doc_id,
       count(*) AS n_tokens,
       {oov} AS oov_tokens,
       {d.trunc6(f"CAST({oov} AS DOUBLE) / count(*)")} AS oov_rate
FROM {tok}
LEFT JOIN vocab v ON {tok}.token = v.token
GROUP BY {tok}.doc_id
""".strip()


def gen_text_normalize(d: Dialect) -> str:
    """Canonical text normalization for dedup/training prep: lowercase,
    non-alphanumerics → space, whitespace collapsed, trimmed.  Pure
    scan+project (no UDF, no shuffle); emits before/after lengths so the
    reduction is auditable."""
    norm = d.regex_replace_all(
        d.regex_replace_all("lower(text)", "[^a-z0-9 ]", " "), "  *", " "
    )
    return f"""
SELECT doc_id, norm_text,
       length(text) AS n_chars_raw, length(norm_text) AS n_chars_norm
FROM (SELECT doc_id, text, trim({norm}) AS norm_text FROM documents) t
""".strip()


def gen_pii_redact(d: Dialect) -> str:
    """PII scrubbing pass (emails, phone-shaped numbers, long digit runs →
    typed placeholder tokens) with per-document match counts.  Training-data
    hygiene at scale must be a map-only pass — three chained
    regexp_replaces inside codegen, counts from the same patterns, one
    pruned scan."""
    n_email = d.size(d.regex_tokens("text", _EMAIL_RE))
    n_phone = d.size(d.regex_tokens("text", _PHONE_RE))
    red = d.regex_replace_all(
        d.regex_replace_all(
            d.regex_replace_all("text", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _LONG_DIGITS_RE,
        "<NUM>",
    )
    return f"""
SELECT doc_id,
       CAST({n_email} AS BIGINT) AS n_emails,
       CAST({n_phone} AS BIGINT) AS n_phones,
       {red} AS red_text
FROM documents
""".strip()


def gen_repetition(d: Dialect) -> str:
    """Duplicate n-gram ratio (Gopher/C4 repetition filter): fraction of
    3-gram occurrences that are repeats of an earlier 3-gram in the same
    document.  High ratios flag boilerplate/spam/looping generations.
    Array-expression only — one pruned scan, no shuffle."""
    toks = "toks"
    three = d.transform(
        d.seq("1", f"{d.size(toks)} - 2"),
        "i",
        f"concat({d.elem(toks, 'i')}, ' ', {d.elem(toks, 'i + 1')}, ' ', {d.elem(toks, 'i + 2')})",
    )
    grams = f"CASE WHEN {d.size(toks)} >= 3 THEN {three} ELSE {d.arr1('text')} END"
    return f"""
SELECT doc_id, n_grams, n_distinct_grams,
       {d.trunc6("1.0 - CAST(n_distinct_grams AS DOUBLE) / n_grams")} AS dup_ratio
FROM (
  SELECT doc_id, {d.size('grams')} AS n_grams,
         {d.size(d.adistinct('grams'))} AS n_distinct_grams
  FROM (
    SELECT doc_id, {grams} AS grams
    -- NULL ≡ '' at the scan: array_distinct([NULL]) keeps the NULL in
    -- Spark but drops it in DuckDB (battery-caught divergence)
    FROM (SELECT doc_id, coalesce(text, '') AS text, {d.split("coalesce(text, '')")} AS toks
          FROM documents) t0
  ) t1
) t2
""".strip()


def gen_quality_filter(
    d: Dialect,
    min_tokens: int = 10,
    max_tokens: int = 5000,
    max_avg_token_len: float = 12.0,
    max_dup_ratio: float = 0.6,
    passthrough: tuple[str, ...] = (),
) -> str:
    """The composite keep/drop verdict a pipeline actually applies —
    C4/Gopher-style rule conjunction with machine-readable reasons.

    Each rule is a named boolean; ``keep`` is their conjunction and
    ``reasons`` concatenates the failed rule names (stable order), so a
    corpus owner can audit drop causes with one groupBy.  Still a pure
    scan+project: the rules reuse the token/repetition expressions inline
    and Catalyst CSEs the token split.

    ``passthrough`` names extra source columns to carry through to the
    output — composers (the end-to-end pipeline) need text/lang downstream
    of the verdict, and carrying them here keeps the composition a single
    scan instead of a self-join back to the source on doc_id."""
    toks = d.split("text")
    three = d.transform(
        d.seq("1", f"{d.size('toks')} - 2"),
        "i",
        f"concat({d.elem('toks', 'i')}, ' ', {d.elem('toks', 'i + 1')}, ' ', {d.elem('toks', 'i + 2')})",
    )
    grams = f"CASE WHEN {d.size('toks')} >= 3 THEN {three} ELSE {d.arr1('text')} END"
    rules = {
        "too_short": f"n_tokens < {min_tokens}",
        "too_long": f"n_tokens > {max_tokens}",
        "long_tokens": f"avg_token_len > {max_avg_token_len}",
        "repetitive": f"dup_ratio > {max_dup_ratio}",
    }
    fails = " || ".join(
        f"(CASE WHEN {pred} THEN '{name};' ELSE '' END)" for name, pred in rules.items()
    )
    keep = " AND ".join(f"NOT ({pred})" for pred in rules.values())
    pt = "".join(f", {c}" for c in passthrough)
    # inner layers already carry text/toks; only OTHER passthrough columns
    # need selecting up from the source scan
    pt_inner = "".join(f", {c}" for c in passthrough if c not in ("text", "toks"))
    return f"""
SELECT doc_id, n_tokens, {d.trunc6('avg_token_len')} AS avg_token_len,
       {d.trunc6('dup_ratio')} AS dup_ratio,
       CAST(CASE WHEN {keep} THEN 1 ELSE 0 END AS INT) AS keep,
       {fails} AS reasons{pt}
FROM (
  SELECT doc_id,
         {d.size('toks')} AS n_tokens,
         CAST(length(replace(text, ' ', '')) AS DOUBLE) / {d.size('toks')} AS avg_token_len,
         1.0 - CAST({d.size(d.adistinct('grams'))} AS DOUBLE) / {d.size('grams')} AS dup_ratio{pt}
  FROM (
    SELECT doc_id, text, toks, {grams} AS grams{pt_inner}
    FROM (SELECT doc_id, coalesce(text, '') AS text,
                 {d.split("coalesce(text, '')")} AS toks{pt_inner}
          FROM documents) t00
  ) t1
) t2
""".strip()


def gen_chunk_split(d: Dialect, chunk_tokens: int = 64, stride: int = 48) -> str:
    """Context-window chunking: split each document into ``chunk_tokens``-token
    windows starting every ``stride`` tokens (overlap = chunk_tokens −
    stride) — the packing step before tokenization in a training pipeline.

    UDTF-shaped (1 doc → ceil(n/stride) rows) but implemented as a lateral
    explode of an integer sequence + array slice: pure Catalyst row
    expansion, no Python, no shuffle — the chunk fan-out happens inside the
    scan stage.  Chunk starts are 0, stride, 2·stride … ≤ n−1, so the last
    chunk may be short (its real token count is emitted); every token is
    covered and chunk boundaries are deterministic in both engines.
    """
    starts = f"{d.lateral_seq('0', d.idiv('n_toks - 1', str(stride)), 'ci')}"
    chunk = d.aslice("toks", f"ci * {stride} + 1", str(chunk_tokens))
    return f"""
SELECT doc_id, ci AS chunk_no, {d.ajoin('chunk')} AS chunk_text,
       {d.size('chunk')} AS n_chunk_tokens
FROM (
  SELECT doc_id, ci, {chunk} AS chunk
  FROM (SELECT doc_id, {d.split('text')} AS toks, {d.size(d.split('text'))} AS n_toks
        FROM documents) t0
  {starts}
) t1
""".strip()


def gen_pack_bins(d: Dialect, token_budget: int = 256, chunk_tokens: int = 64, stride: int = 48) -> str:
    """Streaming sequence packing: assign chunks (from
    :func:`gen_chunk_split`) to fixed-token-budget bins by running token
    count — bin = floor(tokens_before_this_chunk / budget) over the
    deterministic (doc_id, chunk_no) order.

    This is the window-function formulation of greedy packing: one running
    sum per ordered stream, no per-bin state machine — and the running sum
    itself is the TWO-PASS partitioned form (:func:`_pack_cum_ctes`:
    doc-id range buckets, per-bucket partitioned cumsums, theta-join
    carry-in over the ≤33-row bucket totals), so no single-partition
    window exists at any scale.  Bins are filled to the budget ± one chunk
    (a chunk never splits); the exact-greedy variant (reset at the
    boundary) trades that overflow for sequential state — documented, not
    hidden.

    ``bin_id`` is CAST to BIGINT because DuckDB's window ``sum(BIGINT)``
    returns HUGEINT and ``//`` keeps that width, which Arrow renders as
    decimal128(38,0) against Spark's int64 (driver r4 hash mismatch).
    """
    ctes = _pack_cum_ctes(d, chunk_tokens, stride, with_text=False)
    return f"""WITH {ctes}
SELECT doc_id, chunk_no, n_chunk_tokens,
       CAST({d.idiv("cum_before", str(token_budget))} AS BIGINT) AS bin_id
FROM pk_cum
""".strip()


def _pack_cum_ctes(d: Dialect, chunk_tokens: int, stride: int, with_text: bool) -> str:
    """CTE chain ending in ``pk_cum``: the chunk stream with its exact
    running-token-offset ``cum_before`` over (doc_id, chunk_no) order,
    computed as the two-pass partitioned prefix sum (the
    events_session_concurrency pattern): chunks range-bucket on doc_id
    (32 equal-width buckets from one min/max probe — a bucket boundary
    never splits a document, so the (doc_id, chunk_no) tie order is
    entirely intra-partition), each bucket runs a PARTITIONED cumsum, and
    the cross-bucket carry is a theta-join aggregate over the ≤33-row
    bucket totals."""
    text_col = ", chunk_text" if with_text else ""
    return f"""pk_ch AS (
  SELECT doc_id, chunk_no{text_col}, n_chunk_tokens
  FROM (
{gen_chunk_split(d, chunk_tokens, stride)}
  ) chunks0
),
pk_b AS (
  SELECT CAST(min(doc_id) AS BIGINT) AS kmin,
         ({d.idiv('(max(doc_id) - min(doc_id))', '32')} + 1) AS w
  FROM pk_ch
),
pk_r AS (
  SELECT pk_ch.*, {d.idiv('(doc_id - pk_b.kmin)', 'pk_b.w')} AS pk
  FROM pk_ch CROSS JOIN pk_b
),
pk_t AS (
  SELECT pk, CAST(sum(n_chunk_tokens) AS BIGINT) AS tok FROM pk_r GROUP BY pk
),
pk_o AS (
  SELECT a.pk, CAST(coalesce(sum(b.tok), 0) AS BIGINT) AS carry
  FROM pk_t a LEFT JOIN pk_t b ON b.pk < a.pk
  GROUP BY a.pk
),
pk_cum AS (
  SELECT r.doc_id, r.chunk_no{text_col.replace('chunk_text', 'r.chunk_text')},
         r.n_chunk_tokens,
         o.carry
           + sum(r.n_chunk_tokens) OVER (PARTITION BY r.pk
                                         ORDER BY r.doc_id, r.chunk_no
                                         ROWS UNBOUNDED PRECEDING)
           - r.n_chunk_tokens AS cum_before
  FROM pk_r r JOIN pk_o o ON r.pk = o.pk
)"""


def gen_token_ngrams(
    d: Dialect, n: int = 5, src: str = "documents", passthrough: tuple[str, ...] = ()
) -> str:
    """(doc_id, gram_no, ngram) token n-gram relation — the shared base of
    the boilerplate detector and the n-gram contamination check (the
    GPT-3-style decontamination unit is a token n-gram, not a char span).

    Same lateral-sequence shape as :func:`gen_chunk_split` (pure Catalyst
    row expansion inside the scan stage, no Python, no shuffle), with
    stride 1 and only FULL n-grams: documents shorter than ``n`` tokens
    are filtered out BEFORE the sequence so the inclusive bounds stay
    lo <= hi (Spark's ``sequence`` raises on inverted bounds; the filter
    also drops NULL texts in both engines — Spark sizes a NULL split to
    -1, DuckDB to NULL, and both fail ``n_toks >= n``).

    ``passthrough`` names extra source columns carried to the output
    (e.g. ``source`` for the cross-source overlap matrix) — keeping them
    here keeps composers a single scan instead of a join back on doc_id.
    """
    starts = d.lateral_seq("0", f"n_toks - {n}", "gi")
    gram = d.ajoin(d.aslice("toks", "gi + 1", str(n)))
    pt = "".join(f", {c}" for c in passthrough)
    return f"""
SELECT doc_id{pt}, gi AS gram_no, {gram} AS ngram
FROM (
  SELECT doc_id{pt}, toks, n_toks
  FROM (SELECT doc_id{pt}, {d.split('text')} AS toks,
               {d.size(d.split('text'))} AS n_toks
        FROM {src}) t0
  WHERE n_toks >= {n}
) t1
{starts}
""".strip()


def gen_boilerplate_ngrams(
    d: Dialect, n: int = 5, top_k: int = 50, gram_rel: str | None = None
) -> str:
    """Corpus-wide boilerplate detector: the ``top_k`` token n-grams by
    document frequency (then total occurrences) — headers, footers,
    cookie banners, and license blurbs surface here long before any
    per-document signal sees them, and the output feeds a removal filter.

    Order is fully deterministic: (n_docs DESC, n_occur DESC, ngram) — the
    ngram itself is the final tiebreak, so LIMIT is stable across engines.

    100 TB shape: one aggregation on the exploded gram relation with
    map-side partial combine (hot boilerplate keys collapse per-partition
    BEFORE the shuffle, so key skew is absorbed where it is created), and
    the top-k fuses to TakeOrderedAndProject — no global sort. The
    count(DISTINCT doc_id) rides the same shuffle via Spark's expand.
    """
    grams = gram_rel if gram_rel else f"(\n{gen_token_ngrams(d, n)}\n) g"
    return f"""
SELECT ngram,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occur
FROM {grams}
GROUP BY ngram
ORDER BY n_docs DESC, n_occur DESC, ngram
LIMIT {top_k}
""".strip()


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gen_gopher_battery(
    d: Dialect,
    min_words: int = 5,
    max_words: int = 100000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 1,
) -> str:
    """Gopher-style per-rule quality battery (Rae et al. 2021 §A1.1, public
    paper): word-count bounds, mean-word-length bounds, symbol-to-word
    ratio (# and ... pollution), alphabetic-word fraction, and stop-word
    hits — each emitted as its OWN flag column plus the conjunction, unlike
    :func:`gen_quality_filter` whose per-rule verdicts collapse into one
    reasons string.  Corpus owners tune thresholds per rule; exposing each
    flag lets one groupBy measure every rule's marginal kill rate.

    Pure scan+project: every signal derives from the one token split (CSE'd
    by Catalyst) — no shuffle, no UDF, whole-stage codegen end to end, so
    at 100 TB this runs at parquet-scan speed with only
    ``doc_id``/``text`` read.  Symbol pattern is written with character
    classes (``[#]|[.][.][.]``) — no backslash escapes, which the two
    engines' string literals would treat differently.
    """
    alpha_words = d.size(d.afilter("toks", "w", d.re_match("w", "[A-Za-z]")))
    stop_hits = d.size(
        d.afilter("toks", "w", f"lower(w) IN {_in_list(_GOPHER_STOPWORDS)}")
    )
    n_symbols = d.size(d.regex_tokens("text", "[#]|[.][.][.]"))
    rules = {
        "flag_word_count": f"n_words >= {min_words} AND n_words <= {max_words}",
        "flag_word_len": (
            f"mean_word_len >= {min_mean_word_len} AND mean_word_len <= {max_mean_word_len}"
        ),
        "flag_symbols": f"symbol_ratio <= {max_symbol_ratio}",
        "flag_alpha": f"alpha_frac >= {min_alpha_frac}",
        "flag_stopwords": f"stop_hits >= {min_stop_hits}",
    }
    flags = ",\n       ".join(
        f"CAST(CASE WHEN {pred} THEN 1 ELSE 0 END AS INT) AS {name}"
        for name, pred in rules.items()
    )
    keep = " AND ".join(f"({pred})" for pred in rules.values())
    return f"""
SELECT doc_id, n_words,
       {d.trunc6('mean_word_len')} AS mean_word_len,
       {d.trunc6('symbol_ratio')} AS symbol_ratio,
       {d.trunc6('alpha_frac')} AS alpha_frac,
       stop_hits,
       {flags},
       CAST(CASE WHEN {keep} THEN 1 ELSE 0 END AS INT) AS keep
FROM (
  SELECT doc_id,
         CAST({d.size('toks')} AS BIGINT) AS n_words,
         CAST(length(replace(text, ' ', '')) AS DOUBLE) / {d.size('toks')} AS mean_word_len,
         CAST({n_symbols} AS DOUBLE) / {d.size('toks')} AS symbol_ratio,
         CAST({alpha_words} AS DOUBLE) / {d.size('toks')} AS alpha_frac,
         CAST({stop_hits} AS BIGINT) AS stop_hits
  FROM (SELECT doc_id, text, {d.split('text')} AS toks FROM documents
        WHERE text IS NOT NULL AND length(text) > 0) t0
) t1
""".strip()


def gen_zipf_audit(d: Dialect, top_k: int = 100, prebuckets: int = 16) -> str:
    """Corpus-health audit: per-language Zipf slope — the least-squares
    slope of ln(frequency) against ln(rank) over each language's ``top_k``
    most frequent terms (natural text sits near −1; spam, logs, and
    boilerplate-heavy corpora drift off it).  regr_slope/regr_intercept are
    native aggregates in BOTH engines, so the fit never leaves the JVM /
    the vectorized engine.

    100 TB shape — the naive formulation (one rank window per language over
    ALL distinct terms) would sort a vocabulary-sized relation per
    language; instead the rank is **two-phase**: terms first take a
    per-(lang, md5-bucket) top-``top_k`` (``prebuckets`` deterministic
    md5 buckets — engine hashes differ, md5 doesn't), which bounds the
    final per-language sort to ``top_k × prebuckets`` rows.  The global
    top-k is provably a subset of the union of per-bucket top-ks.  Tie
    order is pinned (freq DESC, term) at both phases, so LIMIT-by-rank is
    stable across engines.
    """
    bucket = f"({d.md5_key48('term')} % {prebuckets})"
    return f"""
WITH toks AS (
  SELECT lang, lower(tok) AS term
  FROM (SELECT lang, text FROM documents
        WHERE text IS NOT NULL AND lang IS NOT NULL) t0
  {d.lateral_explode(d.split('text'), 'tok')}
),
tf AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS freq
  FROM toks GROUP BY lang, term
),
pre AS (
  SELECT lang, term, freq
  FROM (
    SELECT lang, term, freq,
           row_number() OVER (PARTITION BY lang, {bucket}
                              ORDER BY freq DESC, term) AS r1
    FROM tf
  ) p WHERE r1 <= {top_k}
),
rk AS (
  SELECT lang, term, freq,
         row_number() OVER (PARTITION BY lang ORDER BY freq DESC, term) AS rnk
  FROM pre
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(freq) AS BIGINT) AS total_freq,
       {d.trunc6('regr_slope(ln(freq), ln(rnk))')} AS zipf_slope,
       {d.trunc6('regr_intercept(ln(freq), ln(rnk))')} AS zipf_intercept
FROM rk
WHERE rnk <= {top_k}
GROUP BY lang
ORDER BY lang
""".strip()


SOURCE_OVERLAP_MAX_DF = 50


def gen_source_overlap(
    d: Dialect,
    n: int = 5,
    max_df: int = SOURCE_OVERLAP_MAX_DF,
    gram_rel: str | None = None,
    kept_rel: str | None = None,
) -> str:
    """Cross-source duplication matrix: n-gram Jaccard similarity between
    every pair of sources — "which feeds are mirroring each other" is the
    FIRST question of corpus curation (a mirrored feed double-counts its
    domain in the training mixture and silently defeats per-source
    dedup budgets).

    Grams occurring in more than ``max_df`` documents are excluded from
    the comparison — they are corpus-wide boilerplate (see
    :func:`gen_boilerplate_ngrams`), carry no source-identity signal, and
    at scale they are exactly the join-fanout keys: the cap is both the
    statistical and the physical bound.  The exclusion count is emitted
    per pair is NOT needed — the boilerplate detector reports the dropped
    mass corpus-wide.

    100 TB shape: distinct (source, ngram) via one partial-combining
    aggregate over the exploded gram relation; the pair intersection is a
    self-equi-join on ngram whose per-key fanout is bounded by the
    number of sources (post-cap); per-source gram totals are a tiny
    dimension broadcast back onto the pair rows.  No cross join of
    sources, no all-pairs of documents.

    The gram relation is referenced from several CTEs; Spark inlines
    CTEs, so the Spark builder passes ``gram_rel`` naming a persisted
    temp view (one explode), while the DuckDB oracle keeps the inline
    form (DuckDB materializes multiply-referenced CTEs) — the same
    split as gen_unigram_surprisal.

    ``kept_rel`` (r14 optimization, Spark engine path ONLY) goes much
    further: it names a persisted relation holding ONE row per
    df-capped ngram with just its distinct source set
    (``srcs array<string>`` — the builder aggregates
    :func:`fastpath.source_gram_rows` with
    ``collect_set(source) ... HAVING count(*) <= max_df``).  sizes and
    pairs then derive by exploding the tiny per-ngram source sets —
    sizes is ``explode(srcs)`` counted per source, pairs is the
    ``sa < sb`` double-explode counted per pair — which removes the
    ngram-keyed self-join and every repeated DISTINCT/groupBy of the
    inline chain: the ngram strings cross exactly one exchange (the
    builder's groupBy), everything after is source-keyed and tiny.
    Exactly the relation algebra of the inline form (a kept ngram
    contributes 1 to each of its sources' sizes and to each unordered
    source pair it spans); parity-pinned full-entry and oracle-gated.
    """
    if kept_rel is not None:
        if d.name != "spark":
            raise ValueError("kept_rel is a Spark engine-path device")
        return f"""
WITH sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_grams
  FROM (SELECT explode(srcs) AS source FROM {kept_rel}) e
  GROUP BY source
),
pairs AS (
  SELECT sa AS source_a, sb AS source_b, CAST(count(*) AS BIGINT) AS n_common
  FROM {kept_rel}
  LATERAL VIEW explode(srcs) _la AS sa
  LATERAL VIEW explode(srcs) _lb AS sb
  WHERE sa < sb
  GROUP BY sa, sb
)
SELECT p.source_a, p.source_b, p.n_common,
       sa.n_grams AS grams_a, sb.n_grams AS grams_b,
       {d.trunc6('CAST(p.n_common AS DOUBLE) / (sa.n_grams + sb.n_grams - p.n_common)')} AS jaccard
FROM pairs p
JOIN sizes sa ON p.source_a = sa.source
JOIN sizes sb ON p.source_b = sb.source
ORDER BY source_a, source_b
""".strip()
    if gram_rel:
        grams = gram_rel
        dg_src = gram_rel
    else:
        grams = "(\n" + gen_token_ngrams(d, n, passthrough=("source",)) + "\n) gr"
        dg_src = grams
    return f"""
WITH dg AS (
  SELECT DISTINCT doc_id, source, ngram
  FROM {dg_src}
  WHERE source IS NOT NULL
),
df AS (
  SELECT ngram FROM (
    SELECT ngram, count(*) AS n_docs FROM dg GROUP BY ngram
  ) t WHERE n_docs <= {max_df}
),
g AS (
  SELECT DISTINCT d0.source, d0.ngram
  FROM dg d0 JOIN df ON d0.ngram = df.ngram
),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY source),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM g a JOIN g b ON a.ngram = b.ngram AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT p.source_a, p.source_b, p.n_common,
       sa.n_grams AS grams_a, sb.n_grams AS grams_b,
       {d.trunc6('CAST(p.n_common AS DOUBLE) / (sa.n_grams + sb.n_grams - p.n_common)')} AS jaccard
FROM pairs p
JOIN sizes sa ON p.source_a = sa.source
JOIN sizes sb ON p.source_b = sb.source
ORDER BY source_a, source_b
""".strip()


def gen_length_quantiles(d: Dialect) -> str:
    """Exact per-language document-length quantiles (p25/p50/p90/p99 of
    n_chars, linearly interpolated) — the exactness baseline that the
    approximate sketch tier (operators/sketches.py GK quantiles,
    ``sketch_value_quantiles``) is measured against, mirroring the
    brute-force-cosine-vs-IVF pairing of the similarity stack.  Length
    distributions drive chunking budgets and truncation policy; p99 is the
    one that finds the pathological megadocs.

    ``percentile_cont(q) WITHIN GROUP (ORDER BY col)`` parses in BOTH
    engines, and linear interpolation over exact BIGINT inputs is a few
    IEEE-rounded ops — bit-identical, no trunc6 hedging needed on the
    quantiles themselves (still applied, for the repo convention).

    Scale note: exact per-group percentiles sort each group — fine at any
    per-language cardinality a documents table reaches, but the 100 TB
    DEFAULT is the mergeable GK sketch; this is the audit/oracle tier, the
    same exact-vs-approx contract as the ANN plane.
    """
    qs = {"p25": 0.25, "p50": 0.50, "p90": 0.90, "p99": 0.99}
    cols = ",\n       ".join(
        f"{d.trunc6(f'percentile_cont({q}) WITHIN GROUP (ORDER BY n_chars)')} AS {name}_chars"
        for name, q in qs.items()
    )
    return f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       {cols},
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
WHERE text IS NOT NULL AND lang IS NOT NULL
GROUP BY lang
ORDER BY lang
""".strip()


def gen_inverted_index(
    d: Dialect, postings_cap: int = 20, min_df: int = 2, src: str = "documents"
) -> str:
    """Inverted-index build (term -> posting list), the IR-side primitive a
    corpus engine owes its search tier: per term, the document frequency
    and the head of the sorted posting list (first ``postings_cap`` doc
    ids), rare terms (< ``min_df`` docs) pruned.

    Spark-first shape: tokenize map-side (portable ASCII regex), one
    DISTINCT shuffle on (term, doc_id), then the term-level plane reuses
    that relation twice — document frequency as a partial-combining count,
    and the posting head through a per-term ``row_number`` that BOUNDS the
    aggregation state to ``postings_cap`` rows before the ordered array agg
    (collect-then-slice would buffer every posting of a hot term; ranking
    first caps the buffer at the output size).  100 TB posture: the
    window's per-term sort is the cost ceiling for stopword-grade terms —
    the documented two-phase upgrade partial-top-ks per partition before
    the global rank, same trick as the jaccard rank blocks; df itself
    partial-aggregates and never skews.

    Output: term, n_docs (full document frequency), postings_head (the
    sorted posting head rendered as a comma-joined string, ≤
    ``postings_cap`` ids — flat so every driver/canonicalizer downstream
    can hash the cell; the array form only ever fed this projection).
    """
    toks = d.regex_tokens("lower(text)", "[a-z0-9]+")
    postings = d.ajoin(d.agg_arr_by("doc_id", "CAST(doc_id AS STRING)"), ",")
    if d.name == "spark":
        # r15 Spark-engine restructure (guide §2.4 — same-key operations
        # share one exchange): the document frequency rides the SAME
        # term-partitioned window pass as the posting rank —
        # count(*) OVER (PARTITION BY term) == docfreq.n_docs joined back
        # on term, row for row — so the separate groupBy exchange, the
        # docfreq×ranked join AND the second computation of td (the
        # tokenize+DISTINCT CTE was referenced twice under inlining)
        # all disappear; the final GROUP BY (term, n_docs) reuses the
        # window's term partitioning.  The oracle keeps the join form
        # below — identical relation by construction.
        return f"""
WITH td AS (
  SELECT DISTINCT doc_id, tok AS term
  FROM (SELECT doc_id, {toks} AS toks FROM {src} WHERE text IS NOT NULL) t0
  {d.lateral_explode('toks', 'tok')}
),
ranked AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn,
         count(*) OVER (PARTITION BY term) AS n_docs
  FROM td
)
SELECT term, n_docs, {postings} AS postings_head
FROM ranked
WHERE rn <= {postings_cap} AND n_docs >= {min_df}
GROUP BY term, n_docs
""".strip()
    return f"""
WITH td AS (
  SELECT DISTINCT doc_id, tok AS term
  FROM (SELECT doc_id, {toks} AS toks FROM {src} WHERE text IS NOT NULL) t0
  {d.lateral_explode('toks', 'tok')}
),
docfreq AS (
  SELECT term, count(*) AS n_docs FROM td GROUP BY term
),
ranked AS (
  SELECT term, doc_id, row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM td
)
SELECT f.term, f.n_docs, {postings} AS postings_head
FROM docfreq f JOIN ranked r ON f.term = r.term
WHERE r.rn <= {postings_cap} AND f.n_docs >= {min_df}
GROUP BY f.term, f.n_docs
""".strip()


def gen_bigram_relation(d: Dialect, src: str = "documents") -> str:
    """(doc_id, prev, cur) adjacent-token pairs — the stream the bigram LM
    is both trained on and scored against.  Map-only lateral over token
    positions; single-token and NULL docs emit no row (a bigram model has
    nothing to say about them)."""
    toks = d.split("text")
    return f"""
SELECT doc_id, {d.elem('toks', 'i')} AS prev, {d.elem('toks', 'i + 1')} AS cur
FROM (
  SELECT doc_id, toks, {d.size('toks')} AS n
  FROM (SELECT doc_id, {toks} AS toks FROM {src} WHERE text IS NOT NULL) t0
  WHERE {d.size('toks')} >= 2
) t1
{d.lateral_seq('1', 'n - 1', 'i')}
""".strip()


def gen_bigram_nll(d: Dialect, src: str = "documents", big_rel: str | None = None) -> str:
    """Per-document mean bigram negative log-likelihood under the corpus'
    OWN add-one-smoothed bigram model — the CCNet-style LM-perplexity
    quality filter (Wenzek et al. 2020 rank documents by KenLM perplexity;
    the corpus-self-trained bigram is the relational analogue, one model
    order up from :func:`gen_unigram_surprisal`).

    P(cur | prev) = (c(prev,cur) + 1) / (c(prev) + V), V = distinct
    continuation vocabulary; output = per-doc mean of −ln P, floor-
    truncated at 6 decimals (float-parity convention).

    100 TB shape: the bigram stream is built map-side and referenced four
    times (stream, bigram counts, context counts, vocab scalar) — the
    Spark builder persists it once via ``big_rel``; both count relations
    partial-aggregate (stopword-pair skew collapses map-side), the scoring
    join keys on (prev, cur) — broadcastable for real vocabularies, plain
    shuffle join beyond — and the final per-doc aggregate is the only
    other shuffle.
    """
    if big_rel:
        big = big_rel
        with_clause = "WITH "
    else:
        big = "big"
        with_clause = f"WITH big AS (\n{gen_bigram_relation(d, src)}\n),\n"
    return f"""{with_clause}bc AS (SELECT prev, cur, count(*) AS c2 FROM {big} GROUP BY prev, cur),
uc AS (SELECT prev, count(*) AS c1 FROM {big} GROUP BY prev),
vocab AS (SELECT CAST(count(DISTINCT cur) AS DOUBLE) AS v FROM {big})
SELECT {big}.doc_id, count(*) AS n_bigrams,
       {_avg6_exact(d, "-ln((bc.c2 + 1) / (uc.c1 + vocab.v))")} AS mean_bigram_nll
FROM {big}
JOIN bc ON {big}.prev = bc.prev AND {big}.cur = bc.cur
JOIN uc ON {big}.prev = uc.prev
CROSS JOIN vocab
GROUP BY {big}.doc_id
""".strip()


def gen_kn_bigram_nll(d: Dialect, src: str = "documents", big_rel: str | None = None) -> str:
    """Per-document mean bigram NLL under the corpus' own INTERPOLATED
    KNESER-NEY model — the smoothing real LM-perplexity quality filters
    (KenLM) actually use, one rung above :func:`gen_bigram_nll`'s add-one:

        P_KN(cur|prev) = (c(prev,cur) - D) / c(prev)
                       + D * N1+(prev,*) / c(prev) * N1+(*,cur) / N1+(*,*)

    with absolute discount D = 0.75 and continuation counts N1+ (distinct
    right/left extensions) — the continuation distribution is what makes
    KN rank "francisco" low outside "san francisco" where raw frequency
    overrates it.  Scoring the corpus' own bigrams means every scored pair
    has c >= 1, so the discounted term is >= 0.25/c1 and the ln argument
    is strictly positive without a max() clamp.

    Every model quantity is an exact integer count (c2, c1 = sum of c2,
    forward/backward continuation counts, total bigram types); the only
    floats are per-row (no order-dependent sums before the final avg, the
    same determinism profile the add-one entry has held green since r5).

    100 TB shape: identical to gen_bigram_nll — the bigram stream is
    persisted once by the Spark builder (``big_rel``), counts
    partial-aggregate, continuation counts come from the already-reduced
    bc relation (no extra corpus scan), the type total is a 1-row
    broadcast scalar.
    """
    if big_rel:
        big = big_rel
        with_clause = "WITH "
    else:
        big = "big"
        with_clause = f"WITH big AS (\n{gen_bigram_relation(d, src)}\n),\n"
    p_kn = (
        "(CAST(bc.c2 AS DOUBLE) - 0.75e0) / CAST(uc.c1 AS DOUBLE)"
        " + (0.75e0 * CAST(uc.n1p_fwd AS DOUBLE) / CAST(uc.c1 AS DOUBLE))"
        " * (CAST(cont.n1p_rev AS DOUBLE) / CAST(tot.n_types AS DOUBLE))"
    )
    return f"""{with_clause}bc AS (
  SELECT prev, cur, CAST(count(*) AS BIGINT) AS c2 FROM {big} GROUP BY prev, cur
),
uc AS (
  SELECT prev, CAST(sum(c2) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS n1p_fwd
  FROM bc GROUP BY prev
),
cont AS (
  SELECT cur, CAST(count(*) AS BIGINT) AS n1p_rev FROM bc GROUP BY cur
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM bc)
SELECT {big}.doc_id, count(*) AS n_bigrams,
       {_avg6_exact(d, f"-ln({p_kn})")} AS mean_kn_nll
FROM {big}
JOIN bc ON {big}.prev = bc.prev AND {big}.cur = bc.cur
JOIN uc ON {big}.prev = uc.prev
JOIN cont ON {big}.cur = cont.cur
CROSS JOIN tot
GROUP BY {big}.doc_id
""".strip()


def gen_langid_confusion(d: Dialect) -> str:
    """Language-ID confusion matrix: the per-doc :func:`gen_lang_id`
    predictions rolled up to (labeled lang × predicted lang) counts and
    within-label shares — the audit that turns a classifier into a
    monitored component (which labels leak into 'unknown', which pairs
    confuse).  One marker-scoring scan + one partial-combining aggregate;
    the share window runs on the tiny confusion relation, not the corpus.
    Both the count and the window sum are CAST before the division (DuckDB
    window ``sum(BIGINT)`` returns HUGEINT — the r4 pack_bins trap)."""
    share = d.trunc6(
        "CAST(count(*) AS DOUBLE) / "
        "CAST(sum(count(*)) OVER (PARTITION BY actual_lang) AS DOUBLE)"
    )
    return f"""
WITH pred AS (
{gen_lang_id(d)}
)
SELECT actual_lang, predicted_lang, count(*) AS n_docs,
       {share} AS share_of_actual
FROM pred
GROUP BY actual_lang, predicted_lang
""".strip()


def gen_pack_render(
    d: Dialect, token_budget: int = 256, chunk_tokens: int = 64, stride: int = 48
) -> str:
    """Packed-sequence RENDERING: materialize each :func:`gen_pack_bins`
    bin as its concatenated training sequence (chunks in stream order,
    space-joined), md5-projected so the comparator never carries the raw
    packed text.  This is the artifact-producing end of the packing tier —
    bins stop being bookkeeping and become the causal-LM examples a
    training job would write to shards.

    The in-bin order key is ``cum_before`` (each chunk's running token
    offset): strictly increasing along the (doc_id, chunk_no) stream, so
    it both orders chunks within a bin and is unique — no composite-key
    struct needed.  Same two-pass partitioned running sum as pack_bins
    (:func:`_pack_cum_ctes`), then one partial-combining aggregate per
    bin.
    """
    rebuilt = d.ajoin(d.agg_arr_by("cum_before", "chunk_text"))
    ctes = _pack_cum_ctes(d, chunk_tokens, stride, with_text=True)
    return f"""WITH {ctes}
SELECT bin_id, count(*) AS n_chunks,
       CAST(sum(n_chunk_tokens) AS BIGINT) AS n_tokens,
       CAST(length({rebuilt}) AS BIGINT) AS packed_len,
       {d.md5_utf8(rebuilt)} AS packed_md5
FROM (
  SELECT CAST({d.idiv('cum_before', str(token_budget))} AS BIGINT) AS bin_id,
         chunk_text, n_chunk_tokens, cum_before
  FROM pk_cum
) binned
GROUP BY bin_id
""".strip()


def gen_char_entropy(d: Dialect, width: int = 3) -> str:
    """Per-document character-``width``-gram Shannon entropy (nats) — the
    compression-ratio-style gibberish/diversity signal: natural prose sits
    in a stable band, base64 blobs and mashed-keyboard noise score high,
    single-character padding scores near 0.  Complements the token-level
    signals (surprisal, bigram NLL): it needs no corpus model and catches
    sub-token garbage that tokenizes into OOV singletons.

    Docs shorter than ``width`` chars have no gram and are emitted with
    NULL entropy (explicit LEFT JOIN), not silently dropped.

    Single-gram docs pin a portability trap: p=1 makes every summand
    ±0.0 and a unary minus yields -0.0, which Spark's floor() (BIGINT)
    renders 0 while DuckDB's (DOUBLE) keeps the sign — the entropy is
    therefore written ``0.0 - sum(...)`` so both engines emit +0.0.

    100 TB shape: the gram explode inflates the scan ~``width``× (map);
    then two partial-combining aggregates, (doc, gram) → doc, both keyed
    by doc_id so AQE plans one exchange.  No corpus-wide state at all —
    this scales embarrassingly.
    """
    lat = d.lateral_seq("1", f"length(text) - {width - 1}", "gi")
    p = "(CAST(c AS DOUBLE) / n)"
    return f"""
WITH g AS (
  SELECT doc_id, substr(text, gi, {width}) AS gram
  FROM (SELECT doc_id, text FROM documents WHERE length(text) >= {width}) b
  {lat}
),
gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
e AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
         {d.trunc6(f"0.0 - sum({p} * ln({p}))")} AS entropy
  FROM (SELECT doc_id, gram, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM gc) t
  GROUP BY doc_id
)
SELECT d.doc_id AS doc_id,
       coalesce(e.n_grams, CAST(0 AS BIGINT)) AS n_grams,
       e.entropy AS entropy
FROM documents d
LEFT JOIN e ON d.doc_id = e.doc_id
""".strip()


def gen_quality_classifier(d: Dialect) -> str:
    """Model-based quality scoring: a fixed-weight logistic model over the
    rule-battery features (stopword ratio, distinct-token ratio, length) —
    the relational stand-in for a fastText-style quality classifier (no
    model runtime exists in this stack, so the weights are frozen
    constants; swapping in learned weights changes nothing structurally).

    Both outputs are derived from the raw LOGIT only: with every literal
    CAST to DOUBLE (see below) the logit is a fixed left-associated chain
    of IEEE-exact double ops on bit-identical inputs, so the keep flag
    can never flip across engines and the truncated logit never straddles
    a floor boundary.  The sigmoid is deliberately NOT emitted:
    exp() may differ in the last ulp between JVM and libm, and at sf0.1
    one document's sigmoid landed exactly on a 1e-6 floor edge — the
    cross-SF sweep caught the hash drift.  Consumers wanting a
    probability apply the monotone 1/(1+e^-x) to the logit themselves.

    Map-only over the scan; no shuffle at all.
    """
    toks = d.split("text")
    stops = d.size(d.afilter(toks, "x", f"x IN {_in_list(_STOPWORDS)}"))
    # every literal CAST to DOUBLE: Spark parses bare 3.0/100.0 as
    # DECIMAL and runs mixed decimal/double arithmetic with different
    # intermediate rounding than DuckDB's all-double pipeline — at sf0.01
    # eight documents' logits crossed trunc6 floor edges from exactly this
    # (0.0875 vs 0.087499...).  With double literals every op is an
    # IEEE-exact double op in identical textual association.
    D = "CAST({} AS DOUBLE)"
    logit = (
        f"{D.format('-2.0')} + {D.format('3.0')} * stop_ratio"
        f" + {D.format('2.0')} * distinct_ratio"
        f" + {D.format('1.5')} * (CASE WHEN n_tokens > 100 THEN {D.format('1.0')}"
        f" ELSE n_tokens / {D.format('100.0')} END)"
    )
    return f"""
SELECT doc_id, n_tokens,
       {d.trunc6('logit')} AS quality_logit,
       CAST(CASE WHEN logit >= 0 THEN 1 ELSE 0 END AS INT) AS keep
FROM (
  SELECT doc_id, n_tokens, ({logit}) AS logit
  FROM (
    SELECT doc_id,
           {d.size(toks)} AS n_tokens,
           CAST({stops} AS DOUBLE) / {d.size(toks)} AS stop_ratio,
           CAST({d.size(d.adistinct(toks))} AS DOUBLE) / {d.size(toks)} AS distinct_ratio
    FROM documents
  ) f
) z
""".strip()


def gen_typo_pairs(
    d: Dialect,
    min_len: int = 4,
    rare_max: int = 2,
    freq_ratio: int = 10,
    tok_rel: str | None = None,
) -> str:
    """Vocabulary typo mining via the symmetric-delete (SymSpell) scheme,
    re-expressed relationally: a RARE token within edit distance 1 of a
    ``freq_ratio``× more frequent token is flagged as its probable
    typo/OCR corruption — the vocabulary-cleaning signal scraped corpora
    need before tokenizer training.

    Candidate generation is EXACT for Damerau-Levenshtein distance 1 —
    no verification UDF needed — from three equality joins on derived
    keys:
    - insert/delete: del_i(longer) = shorter  ⟺  one-char insertion;
    - substitution: del_i(a) = del_i(b) at the SAME position i  ⟺  the
      tokens differ exactly at i;
    - adjacent transposition (the most common real typo): swap_i(a) = b.
    All plain equi-joins; nothing fuzzy executes.

    100 TB shape: everything runs on the VOCABULARY relation (one
    partial-combining count over the exploded stream collapses the corpus
    to distinct tokens first), then a ~len× lateral expansion of that
    small relation and two hash joins on (deletion-string[, position])
    keys.  The corpus-sized stream is touched exactly once.
    """
    parts = []
    if tok_rel:
        tok = tok_rel
    else:
        tok = "tok"
        parts.append(f"tok AS (\n{gen_token_explode(d)}\n)")
    delvar = "concat(substr(token, 1, i - 1), substr(token, i + 1))"
    # swap of chars i, i+1 (defined for i < len; yields the token itself
    # when the two chars are equal — excluded by the <> predicate)
    swapvar = (
        "concat(substr(token, 1, i - 1), substr(token, i + 1, 1), "
        "substr(token, i, 1), substr(token, i + 2))"
    )
    lat = d.lateral_seq("1", "length(token)", "i")
    parts.append(
        f"""v AS (
  SELECT token, count(*) AS freq FROM {tok}
  WHERE length(token) BETWEEN {min_len} AND 20
  GROUP BY token
),
dv AS (
  SELECT token, freq, i, {delvar} AS del_s
  FROM v
  {lat}
),
sv AS (
  SELECT token, freq, {swapvar} AS swap_s
  FROM v
  {d.lateral_seq("1", "length(token) - 1", "i")}
),
cand AS (
  SELECT CASE WHEN s.freq < l.freq THEN s.token ELSE l.token END AS typo,
         CASE WHEN s.freq < l.freq THEN l.token ELSE s.token END AS correction,
         least(s.freq, l.freq) AS f_typo, greatest(s.freq, l.freq) AS f_corr
  FROM dv l JOIN v s ON l.del_s = s.token AND l.token <> s.token
  UNION
  SELECT CASE WHEN a.freq < b.freq THEN a.token ELSE b.token END AS typo,
         CASE WHEN a.freq < b.freq THEN b.token ELSE a.token END AS correction,
         least(a.freq, b.freq) AS f_typo, greatest(a.freq, b.freq) AS f_corr
  FROM dv a JOIN dv b ON a.del_s = b.del_s AND a.i = b.i AND a.token < b.token
  UNION
  SELECT CASE WHEN a.freq < b.freq THEN a.token ELSE b.token END AS typo,
         CASE WHEN a.freq < b.freq THEN b.token ELSE a.token END AS correction,
         least(a.freq, b.freq) AS f_typo, greatest(a.freq, b.freq) AS f_corr
  FROM sv a JOIN v b ON a.swap_s = b.token AND a.token < b.token
)"""
    )
    ctes = ",\n".join(parts)
    return f"""WITH {ctes}
SELECT typo, correction, CAST(f_typo AS BIGINT) AS f_typo, CAST(f_corr AS BIGINT) AS f_corr
FROM cand
WHERE f_typo <= {rare_max} AND f_corr >= {freq_ratio} * f_typo
ORDER BY typo, correction
""".strip()


def gen_perplexity_tertiles(
    d: Dialect, src: str = "documents", nll_rel: str | None = None
) -> str:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): bucket the
    corpus into LM-perplexity tertiles using the self-trained bigram NLL
    (:func:`gen_bigram_nll`) as the score, and report each bucket's
    volume and mean score — the standard curriculum/filter partition
    (train on head+middle, drop or downweight tail).

    Thresholds are exact ``percentile_disc`` over the per-doc scores
    recovered onto the integer 1e-6 lattice — an ACTUAL data value, so no
    interpolation arithmetic exists to diverge (r13: percentile_cont's
    v_a + f·(v_b − v_a) is associated differently by the two engines and
    came back one ulp apart at sf1.0, flipping the 10 docs sitting
    exactly on the threshold lattice point into different buckets; both
    engines' percentile_disc select the same element by cumulative-
    fraction ≥ q, verified across n ≡ 0,1 mod 3).  Computed in ONE
    reduce — deliberately not ntile(), whose global sort would funnel the
    corpus through a single task; the bucket assignment is then a
    broadcast of the 1-row threshold relation (allowlisted scalar shape)
    compared in EXACT BIGINT.

    The NLL relation is referenced twice (thresholds + assignment); the
    Spark builder persists it via ``nll_rel``, the oracle inlines.
    """
    if nll_rel:
        nll = nll_rel
        with_clause = "WITH "
    else:
        nll = "nll"
        with_clause = f"WITH nll AS (\n{gen_bigram_nll(d, src)}\n),\n"
    # scores are trunc6'd upstream: round() recovers the exact integer
    # (floor would go k-1 an ulp under the grid — the _avg6_lattice rule)
    micro = "CAST(round(mean_bigram_nll * 1000000.0e0) AS BIGINT)"
    bucket = (
        "CASE WHEN micro <= th.t1 THEN 'head' "
        "WHEN micro <= th.t2 THEN 'middle' ELSE 'tail' END"
    )
    return f"""{with_clause}nllm AS (
  SELECT {micro} AS micro, n_bigrams FROM {nll}
),
th AS (
  SELECT CAST(percentile_disc(0.3333333333333333) WITHIN GROUP (ORDER BY micro) AS BIGINT) AS t1,
         CAST(percentile_disc(0.6666666666666666) WITHIN GROUP (ORDER BY micro) AS BIGINT) AS t2
  FROM nllm
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bigrams) AS BIGINT) AS sum_bigrams,
       {d.trunc6("CAST(sum(micro) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0e0)")} AS mean_nll
FROM (
  SELECT {bucket} AS bucket, micro, n_bigrams
  FROM nllm CROSS JOIN th
) b
GROUP BY bucket
ORDER BY bucket
""".strip()


def gen_bm25_topk(
    d: Dialect,
    query_terms: tuple[str, ...] = ("spark", "query", "merge"),
    k: int = 10,
    k1_x10: int = 12,
    b_x100: int = 75,
    tok_rel: str | None = None,
) -> str:
    """BM25 ranked retrieval for a fixed term query — the scoring tier on
    top of the inverted-index build (:func:`gen_inverted_index`): idf from
    document frequency, per-doc tf with the k1/b length normalization
    (k1 = ``k1_x10``/10, b = ``b_x100``/100 — integer params so the
    constants render identically in both engines).

    idf uses the standard Robertson-Sparck-Jones form with the +1 floor
    (ln((N - df + 0.5)/(df + 0.5) + 1)) so stopword-frequent terms cannot
    go negative.  The top-k ORDER BY runs on the floor-TRUNCATED score
    (ties then by doc_id): ln() may differ in the last ulp between JVM
    and libm, and a raw-float ORDER BY would let that swap ranks at the
    LIMIT boundary — truncation coarsens the comparison to a granularity
    ulp drift cannot straddle (same reasoning as the tf-idf integer
    lattice, applied to an inherently-float score).

    100 TB shape: the query-term relation is a constant-VALUES broadcast;
    tf for the query terms only comes off the exploded stream pre-filtered
    by the term IN-list (pushed into the scan side of the aggregate);
    avg-doc-length is a 1-row scalar; final top-k fuses into
    TakeOrderedAndProject.  The corpus-wide inverted index is never
    needed for a fixed query — only df for the query's own terms.
    """
    # E-notation literals parse as DOUBLE in BOTH engines; bare 10.0 would
    # be DECIMAL in Spark and its exact decimal arithmetic (int * decimal)
    # rounds differently than DuckDB's double pipeline — the class of bug
    # the quality-classifier logit hit at sf0.1
    k1 = f"({k1_x10} / 1.0e1)"
    b = f"({b_x100} / 1.0e2)"
    parts, scored = bm25_scored_ctes(d, query_terms, k1, b, tok_rel)
    ctes = ",\n".join(parts)
    return f"""WITH {ctes}
SELECT doc_id, bm25, n_terms_hit
FROM (
  {scored}
) s
ORDER BY bm25 DESC, doc_id
LIMIT {k}
""".strip()


def bm25_scored_ctes(
    d: Dialect,
    query_terms: tuple[str, ...],
    k1: str,
    b: str,
    tok_rel: str | None = None,
) -> tuple[list[str], str]:
    """The BM25 scoring chain as (CTE list, scored-select) — shared by
    :func:`gen_bm25_topk` and the hybrid RRF fusion in
    operators/similarity.py, so the two retrieval tiers score identically
    by construction.  ``k1``/``b`` arrive pre-rendered (E-notation double
    literals, see gen_bm25_topk)."""
    terms = ", ".join(f"('{t}')" for t in query_terms)
    parts = []
    if tok_rel:
        tok = tok_rel
    else:
        tok = "tok"
        parts.append(f"tok AS (\n{gen_token_explode(d)}\n)")
    in_list = ", ".join(f"'{t}'" for t in query_terms)
    parts.append(
        f"""dl AS (SELECT doc_id, count(*) AS dlen FROM {tok} GROUP BY doc_id),
adl AS (SELECT avg(CAST(dlen AS DOUBLE)) AS avgdl, CAST(count(*) AS DOUBLE) AS n_docs FROM dl),
qt AS (SELECT term FROM (VALUES {terms}) AS q(term)),
tf AS (
  SELECT doc_id, token AS term, count(*) AS tf
  FROM {tok} WHERE token IN ({in_list})
  GROUP BY doc_id, token
),
df AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY term)"""
    )
    idf = "ln((adl.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)"
    tfn = f"tf.tf * ({k1} + 1) / (tf.tf + {k1} * (1 - {b} + {b} * dl.dlen / adl.avgdl))"
    scored = f"""SELECT doc_id, {d.trunc6('score')} AS bm25, n_terms_hit
  FROM (
    SELECT tf.doc_id AS doc_id,
           sum({idf} * {tfn}) AS score,
           CAST(count(*) AS INT) AS n_terms_hit
    FROM tf
    JOIN df ON tf.term = df.term
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN adl
    GROUP BY tf.doc_id
  ) s0"""
    return parts, scored


def gen_quality_by_source(d: Dialect) -> str:
    """Per-source quality profile: the keep rate and score distribution of
    the logistic quality model aggregated by source — the
    which-feed-is-junk table that decides source-level filtering or
    re-crawling before any per-document work is spent.

    Composes :func:`gen_quality_classifier` (map-only) with one
    partial-combining aggregate on the small source key.
    """
    inner = gen_quality_classifier(d)
    # the classifier emits doc-level rows; re-derive source via doc_id join
    # — or cheaper: recompute inline with source carried through.  The
    # classifier is a pure map, so carrying source is free: wrap with a
    # doc_id join against the narrow (doc_id, source) projection instead
    # of widening the classifier's contract.
    rate = d.trunc6("CAST(sum(keep) AS DOUBLE) / count(*)")
    return f"""
WITH q AS (
{inner}
)
SELECT s.source AS source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(q.keep) AS BIGINT) AS n_keep,
       {rate} AS keep_rate,
       {_avg6_lattice(d, 'q.quality_logit')} AS mean_logit
FROM q
JOIN (SELECT doc_id, source FROM documents) s ON q.doc_id = s.doc_id
GROUP BY s.source
ORDER BY source
""".strip()


def gen_vocab_coverage_curve(
    d: Dialect, sizes: tuple[int, ...] = (16, 64, 256, 1024), tok_rel: str | None = None
) -> str:
    """Tokenizer vocab-sizing curve: for each candidate vocabulary size N,
    what fraction of the corpus token STREAM the top-N words cover — the
    table that turns "how big should the vocab be" into a read-off (the
    knee of this curve), complementing the per-doc OOV audit
    (:func:`gen_vocab_coverage`).

    One frequency aggregate; the top-``max(sizes)`` selection is ``ORDER
    BY c DESC, token LIMIT max(sizes)`` — TakeOrderedAndProject in Spark
    (map-side partial top-k, NO window; a global ``row_number`` here
    would single-partition-sort the vocabulary relation, which grows
    with corpus size).  The ≤max(sizes)-row result collapses to ONE
    ordered counts array, and each candidate size reads its coverage as
    a prefix-slice fold of that array — per-size sums with no rank join
    and no per-size rescans.  Counts CAST pre-division (HUGEINT trap).
    """
    if tok_rel:
        tok = tok_rel
        with_clause = "WITH "
    else:
        tok = "tok"
        with_clause = f"WITH tok AS (\n{gen_token_explode(d)}\n),\n"
    vals = ", ".join(f"({n})" for n in sizes)
    max_n = max(sizes)
    # counts ordered by (c DESC, token): composite sort key per dialect —
    # Spark sorts struct fields left-to-right, DuckDB takes a key list
    key = "struct(-c, token)" if d.name == "spark" else "-c, token"
    carr = d.agg_arr_by(key, "c")
    prefix_sum = d.reduce_bigint(d.aslice("arr", "1", "v.n"), "acc + x")
    cov = d.trunc6(f"CAST({prefix_sum} AS DOUBLE) / t.total")
    return f"""{with_clause}freq AS (
  SELECT token, count(*) AS c FROM {tok} GROUP BY token
),
topn AS (
  SELECT token, c FROM freq ORDER BY c DESC, token LIMIT {max_n}
),
carr AS (SELECT {carr} AS arr FROM topn),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total, CAST(count(*) AS BIGINT) AS n_types FROM freq)
SELECT v.n AS vocab_size,
       t.n_types AS corpus_types,
       {cov} AS coverage
FROM carr
CROSS JOIN (VALUES {vals}) AS v(n)
CROSS JOIN tot t
ORDER BY vocab_size
""".strip()


def gen_length_robust(d: Dialect) -> str:
    """Robust per-language document-length profile: median, MAD (median
    absolute deviation), and a p05/p95-winsorized mean — the
    outlier-resistant companion to plain avg(n_chars) that survives the
    heavy right tail every scraped corpus has (one 100 MB page should not
    move the gate thresholds).

    Engine parity: the winsorize bounds use percentile_disc (actual corpus
    values, BIGINT), so clamped values stay integers and their sum is
    exact; the median/MAD use percentile_cont, whose interpolation is a
    selection plus one arithmetic step on exact integers — no
    order-dependent float summation anywhere.

    100 TB shape: two aggregates over the (lang, len) projection (exact
    percentiles need a per-group sort — per-LANG, bounded groups) plus one
    broadcast join of the tiny per-lang bounds back onto the stream for
    the clamp; sketch tier (GK quantiles) is the existing escape hatch
    when exactness is not required.
    """
    pc = "percentile_cont({q}) WITHIN GROUP (ORDER BY len)"
    pd_ = "percentile_disc({q}) WITHIN GROUP (ORDER BY len)"
    return f"""
WITH lx AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS len
  FROM documents
  WHERE lang IS NOT NULL AND n_chars IS NOT NULL
),
st AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         {pc.format(q='0.5')} AS med,
         CAST({pd_.format(q='0.05')} AS BIGINT) AS lo,
         CAST({pd_.format(q='0.95')} AS BIGINT) AS hi
  FROM lx GROUP BY lang
),
mad AS (
  SELECT lx.lang,
         {("percentile_cont(0.5) WITHIN GROUP "
           "(ORDER BY abs(CAST(lx.len AS DOUBLE) - st.med))")} AS mad
  FROM lx JOIN st ON lx.lang = st.lang
  GROUP BY lx.lang
),
win AS (
  SELECT lx.lang,
         CAST(sum(LEAST(GREATEST(lx.len, st.lo), st.hi)) AS BIGINT) AS wsum
  FROM lx JOIN st ON lx.lang = st.lang
  GROUP BY lx.lang
)
SELECT st.lang, st.n_docs,
       {d.trunc6('st.med')} AS median_len,
       {d.trunc6('mad.mad')} AS mad_len,
       st.lo AS p05_len, st.hi AS p95_len,
       {d.trunc6('CAST(win.wsum AS DOUBLE) / st.n_docs')} AS winsorized_mean
FROM st
JOIN mad ON st.lang = mad.lang
JOIN win ON st.lang = win.lang
ORDER BY st.lang
""".strip()


def gen_bpe_merge_pairs(d: Dialect, top_k: int = 40) -> str:
    """BPE tokenizer training, first merge step: adjacent character-pair
    frequencies over the corpus vocabulary, weighted by word frequency —
    the top rows are exactly the candidates the first BPE merge would
    pick, and re-running after each merge is the full training loop (the
    relational formulation scales where the in-memory reference trainers
    do not).

    100 TB shape: the pair counting runs on the DISTINCT-WORD relation
    (vocabulary), not the corpus stream — one partial-combining agg
    collapses the corpus to (word, freq), and the per-word lateral
    character scan costs O(word length) on that compact relation; the
    final top-k fuses into TakeOrderedAndProject.  Multiplicity within a
    word counts (BPE semantics), ties on count break lexically.
    """
    toks = d.split("lower(text)")
    lat = d.lateral_explode("toks", "w")
    seq = d.lateral_seq("1", "length(word) - 1", "i")
    return f"""
WITH words AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (
    SELECT w AS word
    FROM (SELECT {toks} AS toks FROM documents WHERE text IS NOT NULL) t0
    {lat}
  ) t1
  WHERE length(word) >= 2
  GROUP BY word
),
pairs AS (
  SELECT substr(word, i, 1) AS sym_l, substr(word, i + 1, 1) AS sym_r, freq
  FROM words
  {seq}
)
SELECT sym_l, sym_r,
       CAST(sum(freq) AS BIGINT) AS pair_count,
       CAST(count(*) AS BIGINT) AS n_word_types
FROM pairs
GROUP BY sym_l, sym_r
ORDER BY pair_count DESC, sym_l, sym_r
LIMIT {top_k}
""".strip()


def _bpe_rank_key(d: Dialect) -> str:
    """Composite (pair_count DESC, sym_l, sym_r) ordering key for the
    merge-list array agg — Spark compares struct fields left-to-right,
    DuckDB takes an ORDER BY key list.  Replaces the former global
    ``row_number`` rank: the top-k itself comes from ORDER BY + LIMIT
    (TakeOrderedAndProject — map-side partial top-k, no window), and the
    merge-application ORDER lives entirely in this agg key."""
    if d.name == "spark":
        return "struct(-pair_count, sym_l, sym_r)"
    return "-pair_count, sym_l, sym_r"


def _bpe_apply(d: Dialect, acc: str, merges_arr: str) -> str:
    """Fold a ranked merge list over a ``_``-joined symbol string, applying
    each merge greedily left-to-right — the BPE *encode* step as a pure
    (nested-lambda) array expression, identical fold order in both engines.

    Inner fold state is ``done-last`` (processed symbols ``_``-joined, the
    held-out rightmost symbol after ``-``); a merge fires when the held
    symbol is ``l`` and the next is ``r``, producing symbol ``lr`` which —
    exactly like greedy tokenizer encoders — cannot re-merge under the SAME
    rule in this pass.  Symbols are [a-z0-9]+ by vocab contract, so ``_``,
    ``-`` and `` `` are safe structural characters.
    """

    def part(s: str, i: int) -> str:
        return d.elem(d.split(s, "-"), str(i))

    l = d.elem(d.split("mg", " "), "1")
    r = d.elem(d.split("mg", " "), "2")
    step = f"""CASE
      WHEN {part('st', 2)} = {l} AND y = {r} THEN {part('st', 1)} || '-' || {l} || {r}
      WHEN {part('st', 2)} = '' THEN {part('st', 1)} || '-' || y
      ELSE (CASE WHEN {part('st', 1)} = '' THEN {part('st', 2)}
            ELSE {part('st', 1)} || '_' || {part('st', 2)} END) || '-' || y
    END"""
    if d.name == "spark":
        inner = f"aggregate(split(acc, '_'), '-', (st, y) -> {step})"
    else:
        inner = f"list_reduce(list_prepend('-', string_split(acc, '_')), (st, y) -> {step})"
    # state -> final symbol string: done=='' iff everything merged into
    # last, so replacing the state separator and trimming the leading '_'
    # closes both cases with ONE reference to the inner fold.
    fin = f"trim(LEADING '_' FROM replace({inner}, '-', '_'))"
    if d.name == "spark":
        return f"aggregate({merges_arr}, {acc}, (acc, mg) -> {fin})"
    return f"list_reduce(list_prepend({acc}, {merges_arr}), (acc, mg) -> {fin})"


def gen_bpe_enc1(d: Dialect, k1: int = 24, max_word_len: int = 24, src: str = "documents") -> str:
    """Standalone SELECT for the epoch-1 BPE encoding (word, freq, toks):
    mine the ``k1`` highest-count adjacent CHARACTER pairs over the
    distinct-word relation and fold them, rank order, over every word.
    What the Spark builder persists — epoch 2 references it twice (pair
    re-mining AND re-encoding), and the fold is the dominant cost.

    Vocabulary contract: lowercase whitespace tokens matching
    ``^[a-z0-9]+$`` and <= ``max_word_len`` chars — the charset keeps the
    ``_``/``-``/space structural characters of the fold representation
    collision-free, the cap bounds per-row fold cost.

    100 TB shape: the corpus collapses to (word, freq) in one
    partial-combining aggregate; everything downstream runs on that
    compact vocabulary relation.  The merge table is a <= ``k1``-row
    1-row-array relation (broadcast); the fold is map-side.
    """
    rep0 = d.ajoin(d.transform(d.seq("1", "length(word)"), "i", "substr(word, i, 1)"), "_")
    toks = d.split("lower(text)")
    lat = d.lateral_explode("toks", "w")
    seq_i = d.lateral_seq("1", "length(word) - 1", "i")
    return f"""
WITH bpe_vocab AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (
    SELECT w AS word
    FROM (SELECT {toks} AS toks FROM {src} WHERE text IS NOT NULL) t0
    {lat}
  ) t1
  WHERE {d.re_match('word', '^[a-z0-9]+$')} AND length(word) <= {max_word_len}
  GROUP BY word
),
bpe_pairs1 AS (
  SELECT substr(word, i, 1) AS sym_l, substr(word, i + 1, 1) AS sym_r,
         CAST(sum(freq) AS BIGINT) AS pair_count
  FROM (SELECT word, freq FROM bpe_vocab WHERE length(word) >= 2) v
  {seq_i}
  GROUP BY sym_l, sym_r
),
bpe_merges1 AS (
  SELECT sym_l, sym_r, pair_count
  FROM bpe_pairs1
  ORDER BY pair_count DESC, sym_l, sym_r
  LIMIT {k1}
),
bpe_m1 AS (
  SELECT {d.agg_arr_by(_bpe_rank_key(d), "sym_l || ' ' || sym_r")} AS marr
  FROM bpe_merges1
)
SELECT word, freq, {_bpe_apply(d, 'rep0', 'marr')} AS toks
FROM (SELECT word, freq, {rep0} AS rep0 FROM bpe_vocab) w
CROSS JOIN bpe_m1
""".strip()


def bpe_enc2_cte(
    d: Dialect,
    k1: int = 24,
    k2: int = 16,
    max_word_len: int = 24,
    enc1_rel: str | None = None,
) -> str:
    """CTE chain ending in ``bpe_enc2`` (word, freq, toks): epoch-2 BPE —
    re-mine the ``k2`` top adjacent SYMBOL pairs over the epoch-1 encoding
    (multi-char merges now appear: the mine -> apply -> re-mine -> apply
    training loop at epoch granularity) and fold them on top.

    ``enc1_rel`` substitutes a persisted epoch-1 relation (Spark builder;
    epoch 2 references it twice and Spark inlines CTEs); the oracle leaves
    it None and inlines.
    """
    if enc1_rel is not None:
        enc1 = f"bpe_enc1 AS (SELECT word, freq, toks FROM {enc1_rel})"
    else:
        enc1 = f"bpe_enc1 AS (\n{gen_bpe_enc1(d, k1, max_word_len)}\n)"
    nsyms = d.size(d.split("toks", "_"))
    seq_i = d.lateral_seq("1", f"{d.size('syms')} - 1", "i")
    return f"""{enc1},
bpe_pairs2 AS (
  SELECT {d.elem('syms', 'i')} AS sym_l, {d.elem('syms', 'i + 1')} AS sym_r,
         CAST(sum(freq) AS BIGINT) AS pair_count
  FROM (SELECT freq, {d.split('toks', '_')} AS syms FROM bpe_enc1 WHERE {nsyms} >= 2) s
  {seq_i}
  GROUP BY sym_l, sym_r
),
bpe_merges2 AS (
  SELECT sym_l, sym_r, pair_count
  FROM bpe_pairs2
  ORDER BY pair_count DESC, sym_l, sym_r
  LIMIT {k2}
),
bpe_m2 AS (
  SELECT {d.agg_arr_by(_bpe_rank_key(d), "sym_l || ' ' || sym_r")} AS marr2
  FROM bpe_merges2
),
bpe_enc2 AS (
  SELECT word, freq, {_bpe_apply(d, 'toks', 'marr2')} AS toks
  FROM bpe_enc1 CROSS JOIN bpe_m2
)"""


def gen_bpe_encode(
    d: Dialect,
    k1: int = 24,
    k2: int = 16,
    max_word_len: int = 24,
    top_words: int = 200,
    enc1_rel: str | None = None,
) -> str:
    """Two-epoch BPE ENCODING of the corpus vocabulary: the ``top_words``
    most frequent words with their merged-symbol tokenization and token
    count under the learned (k1 char-pair + k2 symbol-pair) merge table.
    Closes the tokenizer-training loop that gen_bpe_merge_pairs opens:
    mine -> apply -> re-mine -> apply -> measure.

    Epoch granularity (re-rank after each full application pass, not after
    every single merge) is the standard scalable approximation of
    sequential BPE training; the APPLICATION itself is exact greedy
    encoding under the learned ranked merge list.  Deterministic: exact
    integer pair counts, total tiebreak ordering, engine-identical fold.
    """
    return f"""
WITH {bpe_enc2_cte(d, k1, k2, max_word_len, enc1_rel)}
SELECT word, freq, CAST(length(word) AS BIGINT) AS n_chars,
       CAST({d.size(d.split('toks', '_'))} AS BIGINT) AS n_tokens,
       toks AS tokens
FROM bpe_enc2
ORDER BY freq DESC, word
LIMIT {top_words}
""".strip()


def gen_bpe_compression(
    d: Dialect,
    k1: int = 24,
    k2: int = 16,
    max_word_len: int = 24,
    enc1_rel: str | None = None,
) -> str:
    """Corpus-level compression audit of the learned BPE table: frequency-
    weighted tokens-per-char and tokens-per-word over the whole vocabulary
    — the number a tokenizer-training run is actually optimizing, measured
    on the same relation the merges were mined from.  One row.
    """
    ratio = "CAST(sum(freq * n_toks) AS DOUBLE) / CAST(sum(freq * length(word)) AS DOUBLE)"
    tpw = "CAST(sum(freq * n_toks) AS DOUBLE) / CAST(sum(freq) AS DOUBLE)"
    return f"""
WITH {bpe_enc2_cte(d, k1, k2, max_word_len, enc1_rel)}
SELECT CAST(count(*) AS BIGINT) AS n_word_types,
       CAST(sum(freq) AS BIGINT) AS total_words,
       CAST(sum(freq * length(word)) AS BIGINT) AS chars_weighted,
       CAST(sum(freq * n_toks) AS BIGINT) AS bpe_tokens_weighted,
       {d.trunc6(ratio)} AS tokens_per_char,
       {d.trunc6(tpw)} AS avg_tokens_per_word
FROM (SELECT word, freq, {d.size(d.split('toks', '_'))} AS n_toks FROM bpe_enc2) e
""".strip()


def gen_bpe_doc_tokens(
    d: Dialect,
    k1: int = 24,
    k2: int = 16,
    max_word_len: int = 24,
    enc1_rel: str | None = None,
) -> str:
    """Per-document token counts under the LEARNED BPE tokenizer — the
    corpus-level apply step (token-budget planning, shard sizing, packing
    inputs all consume this number, not whitespace counts).  Each corpus
    word joins the vocabulary's encoded token count; words outside the
    vocabulary contract (charset/length) fall back to one token per
    character — the byte-fallback convention of production BPE
    tokenizers, stated in SQL instead of assumed.

    100 TB shape: the (word -> n_tokens) map is vocabulary-sized
    (broadcast); the corpus stream is exploded map-side and the per-doc
    sum partial-combines — ONE shuffle on doc_id beyond the vocab
    pipeline.  The Spark builder persists the epoch-1 encoding via
    ``enc1_rel`` exactly like the encode entry.
    """
    toks = d.split("lower(text)")
    lat = d.lateral_explode("toks", "w")
    ratio = d.trunc6("CAST(sum(n_toks) AS DOUBLE) / CAST(sum(length(word)) AS DOUBLE)")
    return f"""
WITH {bpe_enc2_cte(d, k1, k2, max_word_len, enc1_rel)},
wt AS (
  SELECT word, CAST({d.size(d.split('toks', '_'))} AS BIGINT) AS n_tokens
  FROM bpe_enc2
),
wstream AS (
  -- 'stream' is a STREAM-TVF keyword in Spark 4 (FROM STREAM s parses s
  -- as the table) — the CTE must not use that name
  SELECT doc_id, w AS word
  FROM (SELECT doc_id, {toks} AS toks FROM documents WHERE text IS NOT NULL) t0
  {lat}
),
scored AS (
  SELECT ws.doc_id, ws.word,
         coalesce(wt.n_tokens, CAST(length(ws.word) AS BIGINT)) AS n_toks
  FROM wstream ws LEFT JOIN wt ON ws.word = wt.word
  WHERE ws.word <> ''
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_toks) AS BIGINT) AS n_bpe_tokens,
       CAST(sum(length(word)) AS BIGINT) AS n_word_chars,
       {ratio} AS tokens_per_char
FROM scored
GROUP BY doc_id
ORDER BY doc_id
""".strip()


def winnow_fps_cte(d: Dialect, k: int = 8, w: int = 4, src: str = "documents") -> str:
    """(doc_id, n_grams, fps) winnowed-fingerprint relation — the shared
    base of the per-doc stats entry and the pair-candidate dedup entry.

    Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS
    fingerprinter): hash every char ``k``-gram, slide a window of ``w``
    consecutive hashes, keep each window's MINIMUM, and dedupe.  The
    selected set is position-robust (any shared substring of length
    >= k + w - 1 guarantees a shared fingerprint) at expected density
    2/(w+1) — the local-fingerprint contract a full k-gram set cannot give
    at 100 TB storage cost.

    Hash values CROSS the output (they key the pair join), so the md5
    48-bit construction is mandatory here — the per-engine xxhash shortcut
    of token_hash64 would diverge.  Entirely array expressions inside the
    scan stage (transform over sequence, array_min over slice): no explode,
    no shuffle until a consumer aggregates.  Docs shorter than k + w - 1
    chars have no full window and are excluded (consumers LEFT JOIN back
    if they need every doc).
    """
    return f"winnow AS (\n{gen_winnow_rel(d, k, w, src)}\n)"


def gen_winnow_rel(d: Dialect, k: int = 8, w: int = 4, src: str = "documents") -> str:
    """Standalone SELECT form of the winnow relation — what the Spark
    builders persist before the multi-reference pair query (the md5
    hashing dominates and must run once)."""
    gram_hash = d.hex12_to_bigint(f"substr({d.md5_utf8(f'substr(text, i, {k})')}, 1, 12)")
    hashes = d.transform(d.seq("1", f"length(text) - {k} + 1"), "i", gram_hash)
    mins = d.transform(
        d.seq("1", f"{d.size('hashes')} - {w} + 1"),
        "j",
        d.amin(d.aslice("hashes", "j", str(w))),
    )
    return f"""
  SELECT doc_id, {d.size('hashes')} AS n_grams, {d.adistinct(mins)} AS fps
  FROM (
    SELECT doc_id, {hashes} AS hashes
    FROM {src}
    WHERE text IS NOT NULL AND length(text) >= {k + w - 1}
  ) g""".strip("\n")


def gen_winnow_fingerprints(
    d: Dialect, k: int = 8, w: int = 4, winnow_rel: str | None = None
) -> str:
    """Per-document winnowing stats: k-gram count, selected-fingerprint
    count, and selection density (distinct fingerprints per window
    position) — the storage-cost audit for the MOSS-style fingerprint
    index (expected density ~2/(w+1) before dedup; a density near 1 means
    pathological hash ties or tiny docs).  Short docs (< k + w - 1 chars)
    surface with n_fingerprints 0 via the LEFT JOIN, not silently absent.

    ``winnow_rel`` points the Spark builder at a pre-computed winnow
    relation (the r14 Arrow fast path — operators/fastpath.winnow_rel);
    the oracle path leaves it None and inlines the CTE."""
    winnow = (
        f"winnow AS (SELECT * FROM {winnow_rel})"
        if winnow_rel is not None
        else winnow_fps_cte(d, k, w)
    )
    return f"""
WITH {winnow}
SELECT d.doc_id,
       CAST(coalesce(w.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce({d.size('w.fps')}, 0) AS BIGINT) AS n_fingerprints,
       CASE WHEN w.doc_id IS NULL THEN NULL
            ELSE {d.trunc6(f"CAST({d.size('w.fps')} AS DOUBLE) / CAST(w.n_grams - {w} + 1 AS DOUBLE)")}
       END AS density
FROM documents d LEFT JOIN winnow w ON d.doc_id = w.doc_id
ORDER BY d.doc_id
""".strip()


def gen_readability(d: Dialect) -> str:
    """Flesch reading-ease profile per (lang, source): word/sentence/
    syllable counts from portable regex classes, FRE = 206.835 -
    1.015·(words/sentences) - 84.6·(syllables/words), plus hard/easy
    shares — the readability cut a curriculum-ordering pipeline buckets
    on.  Syllables are vowel-group counts (the classic heuristic); vowel
    groups cannot span words (non-letters break them), so one whole-text
    regex pass replaces a per-word loop.  All literals are E-notation
    DOUBLEs and counts are cast before arithmetic (the decimal-literal
    trap in plans/dialect.py).  One partial-combining aggregate; the
    regex extraction runs inside the scan stage.

    Determinism (r14 audit): avg_fre is an order-free lattice mean at
    p=9 (bound |fre| < 9e6 — a doc would need ~9M unpunctuated words to
    leave the lattice; determinism itself holds to 9e9).  hard_share /
    easy_share need NO lattice: means of exact 0/1 doubles — every
    partial sum is an exact integer below 2^53, so any summation order
    yields the identical sum and the single division is one IEEE op."""
    words = d.size(d.regex_tokens("text", "[A-Za-z]+"))
    sents = d.size(d.regex_tokens("text", "[.!?]+"))
    syls = d.size(d.regex_tokens("text", "[aeiouyAEIOUY]+"))
    return f"""
WITH per_doc AS (
  SELECT lang, source,
         CAST({words} AS DOUBLE) AS w,
         CAST(greatest({sents}, 1) AS DOUBLE) AS s,
         CAST({syls} AS DOUBLE) AS syl
  FROM documents
  WHERE text IS NOT NULL AND {words} >= 1
),
scored AS (
  SELECT lang, source,
         206.835e0 - 1.015e0 * (w / s) - 84.6e0 * (syl / w) AS fre
  FROM per_doc
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       {avg_lattice(d, 'fre', 9)} AS avg_fre,
       {d.trunc6('avg(CASE WHEN fre < 30.0e0 THEN 1.0e0 ELSE 0.0e0 END)')} AS hard_share,
       {d.trunc6('avg(CASE WHEN fre > 70.0e0 THEN 1.0e0 ELSE 0.0e0 END)')} AS easy_share
FROM scored
GROUP BY lang, source
ORDER BY lang, source
""".strip()


def gen_ngram_novelty(d: Dialect, n: int = 3) -> str:
    """Per-source n-gram novelty: the average share of a document's
    DISTINCT token n-grams that occur in no other document — near-zero
    novelty marks templated/boilerplate sources worth down-weighting,
    near-one marks unique long-tail content.  The corpus-wide document
    frequency is computed on HASHED n-grams (only the df COUNT reaches the
    output, so the per-engine set-cardinality hash of token_hash64 is
    sound — same contract as exact Jaccard).

    100 TB shape: distinct-gram explode (array_distinct inside the scan
    stage caps the fan-out at the gram count) -> two partial-combining
    aggregates (df on gram key, novelty on doc key) -> one per-source
    rollup.  No joins against raw text after the first projection.

    Determinism (r14 audit): the per-doc novelty is an exact rational
    (avg of 0/1 doubles — integer partial sums, order-free); avg_novelty
    over those rationals is an order-free lattice mean at p=12 (novelty
    lives in [0, 1]); min/max are order-free by algebra."""
    grams = d.adistinct(
        d.transform(
            d.seq("1", f"{d.size('toks')} - {n} + 1"),
            "i",
            d.token_hash64(d.ajoin(d.aslice("toks", "i", str(n)))),
        )
    )
    lat = d.lateral_explode("grams", "g")
    return f"""
WITH t0 AS (
  SELECT doc_id, source, {d.split('text')} AS toks
  FROM documents WHERE text IS NOT NULL
),
gset AS (
  SELECT doc_id, source, {grams} AS grams
  FROM t0 WHERE {d.size('toks')} >= {n}
),
e AS (
  SELECT doc_id, source, g
  FROM gset
  {lat}
),
df AS (
  SELECT g, CAST(count(*) AS BIGINT) AS doc_freq FROM e GROUP BY g
),
nov AS (
  SELECT e.doc_id, e.source,
         avg(CASE WHEN df.doc_freq = 1 THEN 1.0e0 ELSE 0.0e0 END) AS novelty
  FROM e JOIN df ON e.g = df.g
  GROUP BY e.doc_id, e.source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       {avg_lattice(d, 'novelty', 12)} AS avg_novelty,
       {d.trunc6('min(novelty)')} AS min_novelty,
       {d.trunc6('max(novelty)')} AS max_novelty
FROM nov
GROUP BY source
ORDER BY source
""".strip()


def gen_phrase_search(d: Dialect, phrase: str = "hash join", top_k: int = 50) -> str:
    """Positional-index PHRASE matching: documents containing the exact
    consecutive token sequence ``phrase``, with per-doc occurrence counts
    — the IR tier above BM25's bag-of-words (which cannot distinguish
    "hash join" from "join ... hash").  The relational form of a
    positional inverted index probe: each phrase term selects its posting
    rows, and consecutive terms must meet at pos + 1 — equi-joins on
    (doc_id, position arithmetic), never a string scan per candidate.

    100 TB shape: one positional explode per phrase term, each with the
    term filter applied IMMEDIATELY after the explode (map-side, inside
    the same stage — nothing wide ever materializes; the parquet scan
    itself stays the pruned text column).  n-term phrases cost n explode
    passes, which beats materializing the full positional index: the
    index is corpus-sized, the filtered posting relations are
    term-frequency-sized and become the (doc_id, pos) equi-join inputs.
    A dedicated-index deployment would persist pidx bucketed by token —
    the query below is unchanged, only the CTE source swaps.  The join
    chain partial-combines into per-doc counts; fused top-k.
    """
    # Terms are spliced into single-quoted SQL literals: enforce the same
    # [a-z0-9]+ vocab contract the tokenizer plane uses, so no quote (or any
    # other metacharacter) can reach the literal and runs of spaces can't
    # produce empty '' terms.
    import re as _re

    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one term")
    for t in terms:
        if not _re.fullmatch(r"[a-z0-9]+", t):
            raise ValueError(f"phrase term {t!r} violates the [a-z0-9]+ vocab contract")
    toks = d.split("lower(text)")
    lat = d.lateral_seq("1", d.size("toks"), "i")
    joins = []
    for n, term in enumerate(terms):
        cond = f"t{n}.token = '{term}'"
        if n == 0:
            joins.append(f"(SELECT doc_id, pos FROM pidx t0 WHERE {cond}) t0")
        else:
            joins.append(
                f"JOIN (SELECT doc_id, pos FROM pidx t{n} WHERE {cond}) t{n}\n"
                f"  ON t{n}.doc_id = t0.doc_id AND t{n}.pos = t0.pos + {n}"
            )
    chain = "\n".join(joins)
    return f"""
WITH pidx AS (
  SELECT doc_id, {d.elem('toks', 'i')} AS token, i AS pos
  FROM (SELECT doc_id, {toks} AS toks FROM documents WHERE text IS NOT NULL) t
  {lat}
)
SELECT t0.doc_id, CAST(count(*) AS BIGINT) AS n_matches
FROM {chain}
GROUP BY t0.doc_id
ORDER BY n_matches DESC, t0.doc_id
LIMIT {top_k}
""".strip()


def gen_license_scan(d: Dialect) -> str:
    """Training-data COMPLIANCE scan: per-source counts of documents
    whose text carries license/copyright markers — the filter a corpus
    builder runs before anything ships (copyleft text in a permissive
    corpus is a legal defect, not a quality one).  Marker battery:
    copyright lines, GPL/AGPL phrases, 'all rights reserved',
    permissive-license names; each its OWN flag column so marginal rates
    fall out of one aggregate (the Gopher-battery shape).

    Patterns are portable ASCII classes (Java regex ∩ RE2, the re_match
    contract); matching is case-insensitive via lower() in the scan.
    One pruned scan, map-side flags, one partial-combining aggregate.
    """
    flags = {
        "copyright": "copyright ([(]c[)] )?[0-9]{4}",
        "gpl": "(gnu (general|lesser|affero) public license|gpl-?[23])",
        "all_rights": "all rights reserved",
        "permissive": "(mit license|apache license|bsd license)",
    }
    flag_cols = ",\n         ".join(
        f"CAST({d.re_match('lower(text)', pat)} AS INT) AS f_{name}"
        for name, pat in flags.items()
    )
    sums = ",\n       ".join(
        f"CAST(sum(f_{name}) AS BIGINT) AS n_{name}" for name in flags
    )
    any_flag = " + ".join(f"f_{name}" for name in flags)
    share = d.trunc6(
        "CAST(sum(CASE WHEN any_hit > 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)"
    )
    return f"""
WITH scanned AS (
  SELECT source,
         {flag_cols}
  FROM documents WHERE text IS NOT NULL
),
with_any AS (
  SELECT scanned.*, {any_flag} AS any_hit FROM scanned
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       {sums},
       CAST(sum(CASE WHEN any_hit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       {share} AS flagged_share
FROM with_any
GROUP BY source
ORDER BY source
""".strip()


def gen_chunk_dedup(
    d: Dialect, width: int = 40, stride: int = 40, src: str = "documents"
) -> str:
    """Exact-substring chunk dedup signal (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" fixed-window
    variant, relationally): slice every document into fixed ``width``-char
    chunks at ``stride`` offsets, hash each chunk, and report per document
    what fraction of its chunks also occur in OTHER documents — the
    cross-document boilerplate/quotation mass a paragraph- or
    document-level dedup cannot see.

    100 TB shape: the chunk explode is map-side (one lateral over
    ``(n - width) / stride + 1`` positions, ~1 row per ``stride`` corpus
    chars at stride = width); chunks immediately collapse to 48-bit md5
    keys, so the shuffled relation is (doc_id, BIGINT) — never chunk
    text; the chunk-frequency aggregate partial-combines (hot boilerplate
    chunks collapse map-side) and the per-doc share is one more
    partial-combining aggregate after an equi-join on the hash key.
    Documents shorter than ``width`` emit no chunks and are absent.
    """
    npos = f"{d.idiv(f'(n - {width})', str(stride))} + 1"
    lat = d.lateral_seq("1", npos, "i")
    chunk = f"substr(text, (i - 1) * {stride} + 1, {width})"
    share = d.trunc6(
        "CAST(sum(CASE WHEN s.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)"
    )
    return f"""
WITH ch AS (
  SELECT doc_id, {chunk} AS chunk
  FROM (SELECT doc_id, text, length(text) AS n FROM {src}
        WHERE text IS NOT NULL AND length(text) >= {width}) t
  {lat}
),
chh AS (SELECT doc_id, {d.md5_key48('chunk')} AS h FROM ch),
hstat AS (SELECT h, count(DISTINCT doc_id) AS nd FROM chh GROUP BY h)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN s.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       {share} AS dup_share
FROM chh c JOIN hstat s ON c.h = s.h
GROUP BY c.doc_id
ORDER BY doc_id
""".strip()


def gen_head_tail_overlap(d: Dialect, k: int = 3, max_df: int = 20) -> str:
    """Chunking-artifact detector: document pairs where one document's
    LAST ``k`` tokens exactly equal another's FIRST ``k`` tokens — the
    signature of a long source text split into overlapping training chunks
    (each chunk repeats the previous chunk's tail as its head).  Corpus
    builders run this to re-assemble or down-weight split series that
    per-document dedup treats as distinct.

    100 TB shape: head/tail grams are a map-only array slice per document
    (docs shorter than ``2k`` tokens emit none — head and tail would
    overlap in-document); the pair relation is ONE equi-join on the gram
    string whose per-key fanout is capped by ``max_df`` on the head side
    (grams heading more than ``max_df`` docs are template boilerplate, not
    chain links, and are exactly the join-explosion keys).  No all-pairs
    anywhere.
    """
    toks = d.split("text")
    head = d.ajoin(d.aslice("toks", "1", str(k)), " ")
    tail = d.ajoin(d.aslice("toks", f"{d.size('toks')} - {k} + 1", str(k)), " ")
    return f"""
WITH g AS (
  SELECT doc_id, {head} AS head_gram, {tail} AS tail_gram
  FROM (SELECT doc_id, {toks} AS toks FROM documents WHERE text IS NOT NULL) t
  WHERE {d.size('toks')} >= {2 * k}
),
hd AS (SELECT head_gram, count(*) AS df FROM g GROUP BY head_gram)
SELECT a.doc_id AS tail_doc, b.doc_id AS head_doc, a.tail_gram AS gram
FROM g a
JOIN (
  SELECT g.doc_id, g.head_gram
  FROM g JOIN hd ON g.head_gram = hd.head_gram
  WHERE hd.df <= {max_df}
) b ON a.tail_gram = b.head_gram AND a.doc_id <> b.doc_id
ORDER BY tail_doc, head_doc
""".strip()


def gen_pmi_pairs(
    d: Dialect, min_count: int = 5, top_k: int = 40, big_rel: str | None = None
) -> str:
    """Top collocations by pointwise mutual information over adjacent token
    pairs: PMI = ln(c_xy * N / (c_x * c_y)) — the classic collocation /
    multi-word-expression miner (Church & Hanks 1990), and the signal a
    tokenizer-vocab or phrase-mining pass ranks candidates by.

    Engine parity: the ranking key is the raw ratio c_xy * N / (c_x * c_y)
    — every factor is an exact BIGINT and the products stay under 2^53 for
    corpora up to ~10^8 bigrams, so the ordering doubles are identical in
    both engines (ln is applied only to the EMITTED trunc6 column, never
    the sort key); ties pin on (prev, cur).  ``min_count`` floors noise
    pairs (PMI's known low-frequency pathology).

    100 TB shape: the bigram stream is shared with the LM plane
    (:func:`gen_bigram_relation`; the Spark builder persists it via
    ``big_rel`` — it is referenced four times); pair/context counts all
    partial-combine; the final top-k fuses to TakeOrderedAndProject.
    Beyond 2^53-scale products the sort key needs the ln form with an
    accepted ulp posture — documented, not needed at any current gate.
    """
    if big_rel:
        bg = big_rel
        with_clause = "WITH "
    else:
        bg = "bg"
        with_clause = f"WITH bg AS (\n{gen_bigram_relation(d)}\n),\n"
    ratio = "(CAST(p.c_xy AS DOUBLE) * nn.n) / (CAST(cx.c_x AS DOUBLE) * cy.c_y)"
    return f"""{with_clause}pc AS (
  SELECT prev, cur, CAST(count(*) AS BIGINT) AS c_xy FROM {bg} GROUP BY prev, cur
),
cx AS (SELECT prev, CAST(count(*) AS BIGINT) AS c_x FROM {bg} GROUP BY prev),
cy AS (SELECT cur, CAST(count(*) AS BIGINT) AS c_y FROM {bg} GROUP BY cur),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {bg})
SELECT p.prev, p.cur, p.c_xy, cx.c_x, cy.c_y,
       {d.trunc6(f'ln({ratio})')} AS pmi
FROM pc p
JOIN cx ON p.prev = cx.prev
JOIN cy ON p.cur = cy.cur
CROSS JOIN nn
WHERE p.c_xy >= {min_count}
ORDER BY {ratio} DESC, p.prev, p.cur
LIMIT {top_k}
""".strip()


def gen_lang_mix(d: Dialect, min_markers: int = 3) -> str:
    """Code-switching / mixed-language detector: per document, marker-word
    hit counts for each supported language, the Shannon entropy of that
    distribution, and a mixed flag — single-label language ID
    (:func:`gen_lang_id`) silently mislabels bilingual documents, and a
    tokenizer trained on mislabeled mixed text inherits the damage; this
    is the audit that catches them.

    Determinism: per-language counts are 5 conditional sums over the
    exploded token stream (no join, no pivot machinery), and the entropy
    is ONE fixed expression tree over those 5 integer counts — identical
    evaluation order in both engines, no float-aggregation order anywhere.
    Docs with fewer than ``min_markers`` total marker hits emit entropy
    NULL (too little evidence to call mixing).

    100 TB shape: map-side explode + one partial-combining per-doc
    aggregate; the marker lists are inlined constants.
    """
    toks = d.regex_tokens("lower(text)", "[a-z]+")
    sums = ",\n         ".join(
        f"CAST(sum(CASE WHEN tok IN {_in_list(ws)} THEN 1 ELSE 0 END) AS BIGINT) AS n_{lang}"
        for lang, ws in _LANG_MARKERS.items()
    )
    langs = list(_LANG_MARKERS)
    tot = " + ".join(f"n_{l}" for l in langs)
    pterm = (
        "(CASE WHEN n_{l} > 0 THEN -(CAST(n_{l} AS DOUBLE) / tot) "
        "* ln(CAST(n_{l} AS DOUBLE) / tot) ELSE 0.0e0 END)"
    )
    ent = " + ".join(pterm.format(l=l) for l in langs)
    npresent = " + ".join(f"(CASE WHEN n_{l} > 0 THEN 1 ELSE 0 END)" for l in langs)
    cols = ", ".join(f"n_{l}" for l in langs)
    return f"""
WITH hits AS (
  SELECT doc_id,
         {sums}
  FROM (SELECT doc_id, {toks} AS toks FROM documents WHERE text IS NOT NULL) t0
  {d.lateral_explode('toks', 'tok')}
  GROUP BY doc_id
),
scored AS (
  SELECT doc_id, {cols}, {tot} AS tot, {npresent} AS n_langs
  FROM hits
)
SELECT doc_id, {cols}, tot AS n_markers, CAST(n_langs AS BIGINT) AS n_langs,
       CASE WHEN tot >= {min_markers} THEN {d.trunc6(ent)} END AS lang_entropy,
       CAST(CASE WHEN tot >= {min_markers} AND n_langs >= 2 THEN 1 ELSE 0 END AS INT)
         AS mixed
FROM scored
ORDER BY doc_id
""".strip()


def gen_pii_scan(d: Dialect) -> str:
    """Training-data PII scrub audit: per-source counts of email /
    dashed-phone / IPv4 / SSN-shaped spans plus the total characters a
    redaction pass would rewrite — the scrub manifest an LLM corpus runs
    before release (the compliance twin of gen_license_scan, which covers
    licensing).

    Span counting is ``regex_tokens`` (regexp_extract_all) so MULTIPLE
    hits per document all count, unlike the license scan's boolean flags;
    redact_chars folds the matched spans' lengths with the shared
    left-to-right reduce contract.  Patterns are portable ASCII classes
    with no backslash escapes (the re_match contract — Java regex ∩ RE2);
    SSN is checked before phone can match inside it structurally because
    the two shapes ({3}-{2}-{4} vs {3}-{3}-{4}) are mutually exclusive.
    A span can still hit TWO families (a phone-shaped digit run inside an
    email's local part counts as both) — redact_chars is therefore an
    UPPER bound on the rewrite, the safe direction for a scrub budget.

    One pruned scan, map-side extract_all, one partial-combining
    aggregate — no shuffle beyond the per-source combine.
    """
    pats = {
        "email": "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}",
        "phone": "[0-9]{3}[-][0-9]{3}[-][0-9]{4}",
        "ipv4": "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}",
        "ssn": "[0-9]{3}[-][0-9]{2}[-][0-9]{4}",
    }
    hit_cols = ",\n         ".join(
        f"CAST({d.size(d.regex_tokens('text', pat))} AS BIGINT) AS c_{name}"
        for name, pat in pats.items()
    )
    redact = " + ".join(
        d.reduce_bigint(
            d.transform(d.regex_tokens("text", pat), "x", "length(x)"),
            "acc + CAST(x AS BIGINT)",
        )
        for pat in pats.values()
    )
    sums = ",\n       ".join(f"CAST(sum(c_{n}) AS BIGINT) AS n_{n}" for n in pats)
    any_hit = " + ".join(f"c_{n}" for n in pats)
    return f"""
WITH scanned AS (
  SELECT source,
         {hit_cols},
         CAST({redact} AS BIGINT) AS redact_chars
  FROM documents WHERE text IS NOT NULL
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       {sums},
       CAST(sum(CASE WHEN {any_hit} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(sum(redact_chars) AS BIGINT) AS redact_chars
FROM scanned
GROUP BY source
ORDER BY source
""".strip()


def gen_rake_keywords(
    d: Dialect,
    src: str = "documents",
    n_stop: int = 8,
    max_len: int = 4,
    top_k: int = 40,
) -> str:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free token runs, each scored by the sum of its
    member words' degree/frequency ratios — degree rewards words that
    co-occur in longer phrases, frequency discounts ubiquitous ones.
    The corpus has no fixed stopword list, so the stopword set is the
    corpus' own top-``n_stop`` tokens by frequency (deterministic, and
    the right analogue: RAKE's published lists are exactly the highest-
    frequency function words of English).

    Exactness: word scores live on the idiv lattice floor(1e6·deg/freq)
    — BIGINT end to end, so phrase scores and the final ranking are
    engine-exact with a phrase-text tie-break (no float ever enters the
    ordering; the emitted rake_score is presentation only).

    100 TB shape: positional explode is map-only; the stopword set is a
    TakeOrderedAndProject top-N broadcast back as an anti-join; phrase
    islands come from a PARTITION BY doc_id window (pos − row_number);
    word stats and phrase scores are partial-combining aggregates over
    (doc, island)-keyed equi-joins; final top-k fuses.  Phrases longer
    than ``max_len`` are dropped (the cap bounds phrase-string width —
    documented RAKE variant).
    """
    toks = d.regex_tokens("lower(text)", "[a-z0-9]+")
    tok_i = d.elem("toks", "i")
    lat = d.lateral_seq("1", d.size("toks"), "i")
    phrase = d.ajoin(d.agg_arr_by("pos", "token"), " ")
    ws = d.idiv("(1000000 * deg)", "freq")
    prefix = f"""
WITH tp AS (
  SELECT doc_id, i AS pos, {tok_i} AS token
  FROM (
    SELECT doc_id, toks
    FROM (SELECT doc_id, {toks} AS toks FROM {src} WHERE text IS NOT NULL) t0
    WHERE {d.size('toks')} >= 1
  ) t1
  {lat}
),
stop AS (
  SELECT token FROM (
    SELECT token, count(*) AS n FROM tp GROUP BY token
    ORDER BY n DESC, token LIMIT {n_stop}
  ) s
),
cand AS (
  SELECT doc_id, pos, token,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM tp WHERE token NOT IN (SELECT token FROM stop)
),"""
    suffix = f"""SELECT phrase, max(n_words) AS n_words,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       {d.trunc6('(CAST(max(score) AS DOUBLE) / 1000000)')} AS rake_score
FROM psc
GROUP BY phrase
ORDER BY max(score) DESC, phrase
LIMIT {top_k}
""".rstrip()
    if d.name == "spark":
        # Spark engine path (r14 optimization): the island length is a
        # count(*) window over cand — (doc_id, isl) clustering is already
        # satisfied by the island window's doc_id hash partitioning, so no
        # new exchange — and islands longer than max_len are dropped BEFORE
        # any join (identical semantics: ph's HAVING kept wstat/psc blind
        # to them).  wstat then needs no cand×ph join (freq = count(*),
        # deg = sum(n_words) over the kept rows directly), and psc folds
        # phrase assembly + scoring into ONE (doc_id, isl) aggregate after
        # the single token-keyed join to wsc — both cand×ph joins removed.
        # Same relation algebra row-for-row: every kept island contributes
        # one psc row with the same phrase / n_words / summed-ws score.
        # The DuckDB oracle formulation below is untouched.
        return f"""{prefix}
candk AS (
  SELECT doc_id, pos, token, isl, n_words FROM (
    SELECT doc_id, pos, token, isl,
           CAST(count(*) OVER (PARTITION BY doc_id, isl) AS BIGINT) AS n_words
    FROM cand
  ) c0 WHERE n_words <= {max_len}
),
wstat AS (
  SELECT token, CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(n_words) AS BIGINT) AS deg
  FROM candk GROUP BY token
),
wsc AS (
  SELECT token, CAST({ws} AS BIGINT) AS ws FROM wstat
),
psc AS (
  SELECT c.doc_id, c.isl,
         {d.ajoin(d.agg_arr_by('c.pos', 'c.token'), ' ')} AS phrase,
         max(c.n_words) AS n_words,
         CAST(sum(w.ws) AS BIGINT) AS score
  FROM candk c JOIN wsc w ON w.token = c.token
  GROUP BY c.doc_id, c.isl
)
{suffix}""".strip()
    return f"""{prefix}
ph AS (
  SELECT doc_id, isl, {phrase} AS phrase,
         CAST(count(*) AS BIGINT) AS n_words
  FROM cand GROUP BY doc_id, isl
  HAVING count(*) <= {max_len}
),
wstat AS (
  SELECT c.token, CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(p.n_words) AS BIGINT) AS deg
  FROM cand c JOIN ph p ON c.doc_id = p.doc_id AND c.isl = p.isl
  GROUP BY c.token
),
wsc AS (
  SELECT token, CAST({ws} AS BIGINT) AS ws FROM wstat
),
psc AS (
  SELECT p.doc_id, p.isl, p.phrase, p.n_words,
         CAST(sum(w.ws) AS BIGINT) AS score
  FROM ph p
  JOIN cand c ON c.doc_id = p.doc_id AND c.isl = p.isl
  JOIN wsc w ON w.token = c.token
  GROUP BY p.doc_id, p.isl, p.phrase, p.n_words
)
{suffix}""".strip()


def _occ(s: str, lit: str) -> str:
    """Occurrence count of a literal substring: the replace-and-measure
    identity (length delta / literal length) — no regex, so there is no
    Java-vs-RE2 escape surface at all (the house regex rule taken to its
    safest end).  ``lit`` is embedded as a raw UTF-8 SQL literal."""
    n = len(lit)
    esc = lit.replace("'", "''")
    if n == 1:
        return f"(length({s}) - length(replace({s}, '{esc}', '')))"
    return f"((length({s}) - length(replace({s}, '{esc}', ''))) / {n})"


def gen_encoding_audit(d: Dialect) -> str:
    """Corpus encoding-hygiene audit (the C4/CCNet cleaning pass that runs
    BEFORE any quality model sees the text): per source, documents and
    occurrence totals for three defect classes —

    - REPLACEMENT characters (U+FFFD): a decoder already gave up upstream;
      the bytes are unrecoverable and the doc usually needs re-fetching;
    - MOJIBAKE signatures: UTF-8 read as CP1252/Latin-1 and re-encoded —
      detected by the classic double-encoding digraphs ('â€¦' smart-punct
      family via the 'â€' prefix; 'Ã©'-class accented-vowel pairs).
      Counting LITERAL digraphs (embedded as raw UTF-8 in the SQL text)
      sidesteps the Java-vs-RE2 regex escape divergence entirely;
    - stray C0/DEL CONTROL characters (excluding tab/LF/CR): binary spill
      into a text column.  Counted via translate() deletion — the control
      set is built from chr() calls (constant-folded), never backslash
      escapes.  NUL itself is excluded (DuckDB strings cannot carry it).

    Output per source: doc counts and total occurrences per class, plus
    the clean-doc ratio.  100 TB shape: pure map-side string algebra over
    one pruned scan feeding a partial-combining aggregate on the
    low-cardinality source key — zero joins, zero windows."""
    ctrl_codes = list(range(1, 9)) + [11, 12] + list(range(14, 32)) + [127]
    ctrl_str = " || ".join(f"chr({c})" for c in ctrl_codes)
    moji_pairs = ["Ã©", "Ã¼", "Ã±",
                  "Ã¤", "Ã¶", "Ã "]
    t = "coalesce(text, '')"
    repl = _occ(t, "�")
    moji = " + ".join([_occ(t, "â€")] + [_occ(t, p) for p in moji_pairs])
    ctrl = f"(length({t}) - length(translate({t}, {ctrl_str}, '')))"
    return f"""
WITH scored AS (
  SELECT source,
         CAST({repl} AS BIGINT) AS n_repl,
         CAST({moji} AS BIGINT) AS n_moji,
         CAST({ctrl} AS BIGINT) AS n_ctrl
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_repl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_replacement,
       CAST(sum(CASE WHEN n_moji > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_mojibake,
       CAST(sum(CASE WHEN n_ctrl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_control,
       CAST(sum(n_repl) AS BIGINT) AS total_replacement,
       CAST(sum(n_moji) AS BIGINT) AS total_mojibake,
       CAST(sum(n_ctrl) AS BIGINT) AS total_control,
       {d.trunc6("CAST(sum(CASE WHEN n_repl = 0 AND n_moji = 0 AND n_ctrl = 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)")} AS clean_ratio
FROM scored
GROUP BY source
ORDER BY source
""".strip()
