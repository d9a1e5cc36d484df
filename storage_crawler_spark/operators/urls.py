"""URL / domain ingest tier: canonicalization, URL-level dedup, domain
quality tiers, robots.txt filtering, and domain/keyword blocklists.

The one standard LLM-ingest stage that had no entry (r9 VERDICT item 8):
every web-scale corpus (C4, CCNet, RefinedWeb) dedups at the URL level and
filters by robots rules and blocklists BEFORE any content-based tier runs
— a URL pass costs a scan, a content pass costs the corpus.

The ``documents`` table carries no URL column, so — like the ``files``
view derived from documents (plans/views.py) — a deterministic ``urls``
relation is derived in the common dialect, with every canonicalization
edge planted: scheme variants (http/https), host case, ``www.`` prefixes,
default ports (:443/:80), trailing slashes, tracking query parameters
(``utm_*``) beside real ones, and fragments.  The canonicalizer is pure
common-dialect string/array algebra (no regex: the r8 license-scan
portability lesson), so one generator serves both engines and the oracle
gate proves the whole parse → normalize → fold pipeline, not just counts.

100 TB shape: every operator here is scan → map-side string algebra →
one partial-combining aggregate (or one broadcast join against a
constant rule set).  Nothing shuffles anything wider than (key, counts).
"""

from __future__ import annotations

from storage_crawler_spark.plans.dialect import Dialect

# deterministic dup-group width: docs sharing (source, lang, page group)
# collapse to one canonical URL.  The group is doc_id/20 mod GROUPS (not a
# doc_id residue: the testdata's source IS a doc_id residue, so residue
# groups would never collide within a source)
GROUPS = 12


def kept_params_expr(d: Dialect, col: str = "query") -> str:
    """Surviving query parameters after tracking-param removal: drop
    params whose name starts with the LITERAL prefix ``utm_`` (substr
    test, NOT ``LIKE 'utm_%'`` — LIKE's ``_`` is a single-character
    wildcard, so the LIKE form also dropped ``utmX=...`` params, r10
    ADVICE), keep survivors in original order."""
    return d.ajoin(
        d.afilter(d.split(col, "&"), "p", "substr(p, 1, 4) <> 'utm_' AND p <> ''"),
        "&",
    )


def _url_synth(d: Dialect, docs_rel: str = "documents") -> str:
    """Raw URL synthesis (one deterministic URL per document) with planted
    canonicalization variance.  NULL source/lang rows are excluded — a
    landing zone row without provenance has no URL.  ``docs_rel`` lets the
    streaming twin aim the same synthesis at a streaming temp view."""
    return f"""
SELECT doc_id, source,
       (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
       || '://'
       || (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END)
       || (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END)
       || (CASE WHEN doc_id % 3 = 1 THEN '.Example.com' ELSE '.example.com' END)
       || (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END)
       || '/docs/' || lang || '/' || CAST({d.idiv('doc_id', '20')} % {GROUPS} AS STRING)
       || (CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END)
       || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&utm_medium=rss'
                WHEN doc_id % 4 = 1 THEN '?page=2&utm_campaign=x'
                WHEN doc_id % 4 = 2 THEN '?page=2'
                ELSE '' END)
       || (CASE WHEN doc_id % 13 = 0 THEN '#section-1' ELSE '' END)
       AS url
FROM {docs_rel}
WHERE source IS NOT NULL AND lang IS NOT NULL
""".strip()


def gen_url_rel(d: Dialect, docs_rel: str = "documents") -> str:
    """(doc_id, source, url, curl, domain, cpath) — the shared URL relation
    every operator in this tier reads (one documents scan, map-only).

    Canonicalization steps, each a COLUMN of its own subquery layer —
    never one nested expression: every step references its inputs 2-3
    times, so textual nesting grows the expression tree ~3^depth (the
    single-expression form hit ~10 levels and Catalyst's expression
    canonicalization churned for minutes on 500 rows).  Layered columns
    keep the tree linear; Catalyst's CollapseProject declines to merge
    projections that would duplicate non-trivial expressions, so the
    layers survive optimization:

    1. drop the fragment,
    2. fold the scheme to https (URL-dedup convention: http/https serve
       the same document),
    3. lowercase the host, strip a leading ``www.`` and the default
       ports ``:443``/``:80``,
    4. strip ONE trailing slash from a non-root path,
    5. drop ``utm_*`` tracking parameters, keeping survivors in their
       original order (no re-sorting: parameter order can be semantic).
    """
    kept = kept_params_expr(d)
    return f"""
SELECT doc_id, source, url, curl,
       CASE WHEN instr(substr(curl, 9), '/') > 0
            THEN substr(substr(curl, 9), 1, instr(substr(curl, 9), '/') - 1)
            ELSE substr(curl, 9) END AS domain,
       CASE WHEN instr(substr(curl, 9), '/') > 0
            THEN substr(substr(curl, 9), instr(substr(curl, 9), '/'))
            ELSE '/' END AS cpath
FROM (
  SELECT doc_id, source, url,
         'https://' || host || path
         || (CASE WHEN kept <> '' THEN '?' || kept ELSE '' END) AS curl
  FROM (
    SELECT doc_id, source, url, host,
           CASE WHEN length(path0) > 1 AND substr(path0, length(path0), 1) = '/'
                THEN substr(path0, 1, length(path0) - 1) ELSE path0 END AS path,
           {kept} AS kept
    FROM (
      SELECT doc_id, source, url,
             CASE WHEN h2 LIKE 'www.%' THEN substr(h2, 5) ELSE h2 END AS host,
             CASE WHEN instr(pathq, '?') > 0
                  THEN substr(pathq, 1, instr(pathq, '?') - 1)
                  ELSE pathq END AS path0,
             CASE WHEN instr(pathq, '?') > 0
                  THEN substr(pathq, instr(pathq, '?') + 1)
                  ELSE '' END AS query
      FROM (
        SELECT doc_id, source, url, pathq,
               CASE WHEN h1 LIKE '%:443' THEN substr(h1, 1, length(h1) - 4)
                    WHEN h1 LIKE '%:80' THEN substr(h1, 1, length(h1) - 3)
                    ELSE h1 END AS h2
        FROM (
          SELECT doc_id, source, url,
                 lower(CASE WHEN instr(rest, '/') > 0
                            THEN substr(rest, 1, instr(rest, '/') - 1)
                            ELSE rest END) AS h1,
                 CASE WHEN instr(rest, '/') > 0
                      THEN substr(rest, instr(rest, '/'))
                      ELSE '/' END AS pathq
          FROM (
            SELECT doc_id, source, url, substr(ufrag, instr(ufrag, '://') + 3) AS rest
            FROM (
              SELECT doc_id, source, url,
                     CASE WHEN instr(url, '#') > 0
                          THEN substr(url, 1, instr(url, '#') - 1)
                          ELSE url END AS ufrag
              FROM (
{_url_synth(d, docs_rel)}
              ) raw
            ) l1
          ) l2
        ) l3
      ) l4
    ) l5
  ) l6
) l7
""".strip()


def gen_url_dedup(d: Dialect) -> str:
    """URL-level dedup manifest: every canonical URL hit by 2+ documents,
    with the keeper (min doc_id — the C4/CCNet first-seen convention) and
    the casualty count.  The planted variants make http/HTTPS, Www/case,
    :443, trailing-slash, utm-param and fragment twins all fold here —
    the oracle equality proves each canonicalization step.

    100 TB shape: one scan, map-side string algebra, ONE shuffle on curl
    (partial-combining min/count); no joins."""
    return f"""
WITH u AS (
{gen_url_rel(d)}
)
SELECT curl, CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM u
GROUP BY curl
HAVING count(*) >= 2
ORDER BY curl, keep_id
""".strip()


def gen_domain_tiers(d: Dialect) -> str:
    """Per-domain ingest quality tier from URL-duplication structure: the
    domain-reputation pass web pipelines run before fetching content —
    heavy URL duplication (tracking-param spam, mirror paths) marks a
    domain for aggressive URL-only dedup or exclusion.

    dup_ratio = 1 - distinct_canonical/docs, truncated to 6 decimals ONCE
    on emission (exactness discipline); tiers on fixed thresholds.
    100 TB shape: one scan, one partial-combining aggregate on domain."""
    ratio = d.trunc6(
        "1.0e0 - CAST(count(DISTINCT curl) AS DOUBLE) / CAST(count(*) AS DOUBLE)"
    )
    return f"""
WITH u AS (
{gen_url_rel(d)}
)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT curl) AS BIGINT) AS n_canonical,
       {ratio} AS dup_ratio,
       CASE WHEN {ratio} >= 0.2 THEN 'heavy'
            WHEN count(DISTINCT curl) < count(*) THEN 'moderate'
            ELSE 'clean' END AS tier
FROM u
GROUP BY domain
ORDER BY domain
""".strip()


# robots.txt rule set: wildcard-domain defaults plus one fully-blocked
# domain; '/docs/en/1' is the longest-prefix ALLOW override inside the
# '/docs/en' disallow (the Googlebot most-specific-rule semantics)
_ROBOTS_RULES = (
    ("*", "/docs/en", "disallow"),
    ("*", "/docs/en/1", "allow"),
    ("*", "/docs/zh", "disallow"),
    ("src0.example.com", "/", "disallow"),
)


def robots_rules_values(d: Dialect) -> str:
    rows = ", ".join(f"('{dom}', '{p}', '{k}')" for dom, p, k in _ROBOTS_RULES)
    return f"(VALUES {rows}) AS r(rdomain, prefix, kind)"


def gen_robots_filter(d: Dialect, url_rel: str | None = None) -> str:
    """robots.txt filtering with the standard longest-match semantics:
    among the rules whose prefix matches the URL path (domain-specific or
    wildcard), the LONGEST prefix decides; allow wins length ties (the
    Googlebot tie-break); no matching rule means allowed.  Output is the
    per-domain crawl budget: how many URLs survive.

    100 TB shape: the rule set is constant and tiny — the join is a
    broadcast nested-loop against a 4-row VALUES relation (allowlisted
    BNLJ shape), the per-URL candidate fan-out is <= |rules|, and the
    longest-match argmax is a PARTITION BY doc_id window over those few
    candidate rows, never over the corpus.  The Spark builder passes a
    CHECKPOINTED ``url_rel``: the url relation is referenced twice AND
    its computed columns land in the join condition, so predicate
    pushdown would otherwise substitute the whole canonicalization chain
    per reference (measured: a 3 MB optimized plan from a 3 KB one)."""
    u_cte = (
        f"u AS (\n{gen_url_rel(d)}\n),"
        if url_rel is None
        else f"u AS (SELECT * FROM {url_rel}),"
    )
    return f"""
WITH {u_cte}
hits AS (
  SELECT u.doc_id, u.domain, r.kind,
         row_number() OVER (
           PARTITION BY u.doc_id
           ORDER BY length(r.prefix) DESC,
                    CASE WHEN r.kind = 'allow' THEN 0 ELSE 1 END,
                    r.prefix
         ) AS rnk
  FROM u
  JOIN {robots_rules_values(d)}
    ON (r.rdomain = u.domain OR r.rdomain = '*')
   AND substr(u.cpath, 1, length(r.prefix)) = r.prefix
),
verdicts AS (
  SELECT u.doc_id, u.domain,
         CASE WHEN h.kind IS NULL OR h.kind = 'allow' THEN 1 ELSE 0 END AS allowed
  FROM u
  LEFT JOIN (SELECT doc_id, kind FROM hits WHERE rnk = 1) h
    ON u.doc_id = h.doc_id
)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(allowed) AS BIGINT) AS n_allowed,
       CAST(sum(1 - allowed) AS BIGINT) AS n_blocked
FROM verdicts
GROUP BY domain
ORDER BY domain
""".strip()


# domain + URL-substring blocklist (the manual exclusion list every web
# pipeline maintains beside robots): domain block wins over keyword block
_BLOCKED_DOMAINS = ("src1.example.com", "src7.example.com")
# '/docs/fr/' varies WITHIN every source (lang is not a doc_id residue),
# so keyword blocks are per-document, not all-or-nothing per source
_BLOCKED_KEYWORDS = ("/docs/fr/", "page=2")


def gen_blocklist_filter(d: Dialect) -> str:
    """Domain/keyword blocklist manifest per source: URLs dropped by a
    blocked domain, dropped by a URL-substring keyword (checked only if
    the domain passed — first-match-wins priority, stated), or kept.

    100 TB shape: pure map-side predicates (IN over a constant list,
    instr over constant keywords) + one partial-combining aggregate on
    source; no joins at all."""
    dom_in = ", ".join(f"'{x}'" for x in _BLOCKED_DOMAINS)
    kw_hit = " OR ".join(f"instr(curl, '{k}') > 0" for k in _BLOCKED_KEYWORDS)
    return f"""
WITH u AS (
{gen_url_rel(d)}
),
flags AS (
  SELECT source,
         CASE WHEN domain IN ({dom_in}) THEN 1 ELSE 0 END AS dom_block,
         CASE WHEN domain IN ({dom_in}) THEN 0
              WHEN {kw_hit} THEN 1 ELSE 0 END AS kw_block
  FROM u
)
SELECT source,
       CAST(sum(1 - dom_block - kw_block) AS BIGINT) AS n_kept,
       CAST(sum(dom_block) AS BIGINT) AS n_blocked_domain,
       CAST(sum(kw_block) AS BIGINT) AS n_blocked_keyword
FROM flags
GROUP BY source
ORDER BY source
""".strip()


def gen_url_revisions(d: Dialect, url_rel: str | None = None) -> str:
    """Content-revision detection per canonical URL: among URL-duplicate
    groups, how many carry DIFFERENT document texts — the recrawl-drift
    signal (same page fetched twice with changed content) that decides
    between keep-first (static pages) and keep-latest (news/wikis) dedup
    policies.  Output: per canonical URL with 2+ docs, the fetch count,
    the distinct-content count (md5 fingerprints — never the text), and
    whether the keeper's content is the majority version.

    100 TB shape: one scan projecting (curl, md5(text), doc_id), one
    partial-combining aggregate per (curl, fp) then per curl; the text
    column never leaves the first projection.  The Spark builder passes a
    CHECKPOINTED ``url_rel``: curl is a join/group key computed through
    the layered canonicalizer, and per_version is referenced twice, so the
    inline form re-substitutes the chain per reference (robots lesson)."""
    fp = d.md5_utf8("coalesce(text, '')")
    u_cte = (
        f"u AS (\n{gen_url_rel(d)}\n),"
        if url_rel is None
        else f"u AS (SELECT * FROM {url_rel}),"
    )
    return f"""
WITH {u_cte}
fetches AS (
  SELECT u.curl, u.doc_id, {fp} AS fp
  FROM u JOIN documents doc ON u.doc_id = doc.doc_id
),
per_version AS (
  SELECT curl, fp, CAST(count(*) AS BIGINT) AS n_fetches,
         CAST(min(doc_id) AS BIGINT) AS first_id
  FROM fetches GROUP BY curl, fp
)
SELECT curl,
       CAST(sum(n_fetches) AS BIGINT) AS n_fetches,
       CAST(count(*) AS BIGINT) AS n_versions,
       CAST(min(first_id) AS BIGINT) AS keep_id,
       CASE WHEN max(CASE WHEN first_id = keeper.kid THEN n_fetches ELSE 0 END)
                 * 2 >= sum(n_fetches) THEN 1 ELSE 0 END AS keeper_is_majority
FROM per_version
JOIN (
  SELECT curl AS kcurl, CAST(min(first_id) AS BIGINT) AS kid
  FROM per_version GROUP BY curl
) keeper ON per_version.curl = keeper.kcurl
GROUP BY curl
HAVING sum(n_fetches) >= 2
ORDER BY curl
""".strip()


def gen_sitemap_coverage(d: Dialect, url_rel: str | None = None) -> str:
    """Crawl-frontier coverage per domain: the sitemap-declared URL grid
    (every page group of every observed (domain, language) section —
    derived by EXPLODING a constant sequence per section row, never a
    cartesian grid join) LEFT-joined against the canonical URLs actually
    fetched — declared/fetched/missing counts and the coverage ratio the
    crawl-ops dashboard pages on.  The referential dual of the robots
    filter: robots says what we may fetch, this says what we did.

    100 TB shape: fetched keys partial-combine to one row per (domain,
    lang, group); sections are a tiny distinct; the declared relation is
    |sections| x GROUPS rows via lateral explode (broadcastable); one
    LEFT JOIN on the composite key, one roll-up on domain."""
    u_cte = (
        f"u AS (\n{gen_url_rel(d)}\n),"
        if url_rel is None
        else f"u AS (SELECT * FROM {url_rel}),"
    )
    lat = d.lateral_seq("0", str(GROUPS - 1), "grp")
    return f"""
WITH {u_cte}
fetched AS (
  SELECT DISTINCT domain,
         {d.elem(d.split('ponly', '/'), '3')} AS lang,
         {d.elem(d.split('ponly', '/'), '4')} AS grp_s
  FROM (
    SELECT domain,
           CASE WHEN instr(cpath, '?') > 0
                THEN substr(cpath, 1, instr(cpath, '?') - 1)
                ELSE cpath END AS ponly
    FROM u
  ) p
),
sections AS (
  SELECT DISTINCT domain, lang FROM fetched
),
declared AS (
  SELECT s.domain, s.lang, CAST(grp AS BIGINT) AS grp
  FROM sections s
  {lat}
),
hits AS (
  SELECT dec.domain,
         CASE WHEN f.grp_s IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM declared dec
  LEFT JOIN fetched f
    ON dec.domain = f.domain AND dec.lang = f.lang
   AND CAST(dec.grp AS STRING) = f.grp_s
)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_declared,
       CAST(sum(hit) AS BIGINT) AS n_fetched,
       CAST(sum(1 - hit) AS BIGINT) AS n_missing,
       {d.trunc6('CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE)')} AS coverage
FROM hits
GROUP BY domain
ORDER BY domain
""".strip()


def gen_url_frontier(d: Dialect, per_slot: int = 2, url_rel: str | None = None) -> str:
    """Crawl-frontier schedule under the per-host politeness contract: a
    fetcher may issue at most ``per_slot`` requests to one host per time
    slot (the crawl-delay discipline every polite crawler honors), so each
    host's pending canonical URLs are ranked and packed into consecutive
    slots.  Rank order is BFS-by-depth (shallow paths first — the frontier
    prioritization web crawlers default to, since hubs sit near the root)
    with the canonical URL as the total-order tie-break.  Output is the
    schedule relation per (domain, slot): how many URLs, the depth range,
    and the first URL — the relation a fetch fleet executes directly.

    Composes with the rest of the ingest tier: run the robots filter and
    blocklists first, then schedule survivors (each entry stays
    independently oracle-checkable; the composition is a WHERE on the
    shared url relation).

    100 TB shape: one scan, map-side canonicalization, then ONE exchange
    on domain reused by the DISTINCT, the per-host window, and the final
    (domain, slot) partial aggregate — politeness is per-host state, so
    the per-domain sort is exactly the work a frontier shard owns.  A
    single host's schedule is inherently sequential (that IS the
    politeness constraint); a host too large for one shard is capped
    upstream by per-host page budgets, not by splitting the window.
    """
    depth = f"CAST({d.size(d.split('cpath', '/'))} - 1 AS BIGINT)"
    u_cte = (
        f"u AS (\n{gen_url_rel(d)}\n),"
        if url_rel is None
        else f"u AS (SELECT * FROM {url_rel}),"
    )
    return f"""
WITH {u_cte}
pend AS (
  SELECT DISTINCT domain, curl, cpath FROM u
),
scored AS (
  SELECT domain, curl, {depth} AS depth FROM pend
),
ranked AS (
  SELECT domain, curl, depth,
         row_number() OVER (PARTITION BY domain ORDER BY depth, curl) AS rnk
  FROM scored
),
slots AS (
  SELECT domain, curl, depth,
         CAST({d.idiv('(rnk - 1)', str(per_slot))} AS BIGINT) AS slot
  FROM ranked
)
SELECT domain, slot,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(min(depth) AS BIGINT) AS min_depth,
       CAST(max(depth) AS BIGINT) AS max_depth,
       min(curl) AS first_curl
FROM slots
GROUP BY domain, slot
ORDER BY domain, slot
""".strip()


def gen_domain_caps(d: Dialect, cap: int = 3, url_rel: str | None = None) -> str:
    """Per-host frequency cap — the C4/CCNet "at most N pages per host"
    pass that stops a single boilerplate-heavy domain from dominating the
    training mixture: canonical URLs are deduplicated per domain, ranked
    by a frozen md5 uniform (an engine-stable shuffle, so the kept set is
    a fair per-host sample rather than a crawl-order artifact), and only
    the first ``cap`` survive.  Output is the KEEP relation downstream
    stages semi-join on — (domain, curl, representative doc, pick order)
    — with each domain's total and dropped counts riding along as audit
    columns (a domain with n_dropped > 0 is where the cap actually bit).

    100 TB shape: one scan + map-side canonicalization, then ONE exchange
    on domain reused by the per-URL dedup, both windows (rank + domain
    count), and the output; the per-domain sort is bounded by host size —
    a pathological mega-host takes the same two-phase rank escape hatch
    as the jaccard tier, or is pre-capped by the crawl frontier's
    per-host budget upstream.  The Spark builder passes a CHECKPOINTED
    ``url_rel`` (domain/curl are computed join keys through the layered
    canonicalizer — the tier's standing recompute trap)."""
    key = d.md5_key48("curl", "domcap")
    u_cte = (
        f"u AS (\n{gen_url_rel(d)}\n),"
        if url_rel is None
        else f"u AS (SELECT * FROM {url_rel}),"
    )
    return f"""
WITH {u_cte}
per_url AS (
  SELECT domain, curl, CAST(min(doc_id) AS BIGINT) AS keep_doc
  FROM u GROUP BY domain, curl
),
ranked AS (
  SELECT domain, curl, keep_doc,
         row_number() OVER (PARTITION BY domain ORDER BY {key}, curl) AS pick_order,
         count(*) OVER (PARTITION BY domain) AS n_urls
  FROM per_url
)
SELECT domain, curl, keep_doc,
       CAST(pick_order AS BIGINT) AS pick_order,
       CAST(n_urls AS BIGINT) AS n_urls,
       CAST(greatest(n_urls - {cap}, 0) AS BIGINT) AS n_dropped
FROM ranked
WHERE pick_order <= {cap}
ORDER BY domain, pick_order
""".strip()


def gen_recrawl_priority(d: Dialect, url_rel: str | None = None) -> str:
    """Recrawl scheduling from observed change rates (Cho & Garcia-Molina
    2003, "Effective Page Refresh Policies for Web Crawlers", public): for
    every canonical URL fetched more than once, order the fetches (doc_id
    = fetch sequence) and count CONSECUTIVE-fetch content transitions —
    the page's observed change ratio X/n over n = fetches−1 refetch
    intervals, the sufficient statistic the Poisson-change estimator
    λ̂ = −ln(1 − X/n) is a monotone function of.  Pages tier into the
    refresh classes a crawler budgets by: ``hot`` (changed on ≥ half the
    refetch intervals — recrawl every cycle), ``warm`` (≥ a tenth),
    ``cold`` (never/rarely changed — longest interval), and ``unknown``
    (single fetch, no evidence yet — scheduled by the frontier's
    depth policy instead).  Tier boundaries compare 2X ≥ n / 10X ≥ n in
    INTEGER arithmetic, so the classification is exact cross-engine; the
    change_ratio column is display-only.

    The transition count (not the revisions entry's distinct-version
    count) is the right statistic: a page flapping A→B→A has 2 changes
    but only 2 versions; the Poisson estimator needs interval evidence.

    100 TB shape: one scan projecting (curl, fp, doc_id) — text never
    leaves the first projection; one window partitioned by curl (bounded
    by per-URL fetch count) for the lag comparison; one partial-combining
    aggregate per curl.  The Spark builder passes a CHECKPOINTED
    ``url_rel`` (curl is a computed partition key — the tier's standing
    recompute trap)."""
    fp = d.md5_utf8("coalesce(text, '')")
    u_cte = (
        f"u AS (\n{gen_url_rel(d)}\n),"
        if url_rel is None
        else f"u AS (SELECT * FROM {url_rel}),"
    )
    return f"""
WITH {u_cte}
fetches AS (
  SELECT u.domain, u.curl, u.doc_id, {fp} AS fp
  FROM u JOIN documents doc ON u.doc_id = doc.doc_id
),
seq AS (
  SELECT domain, curl, doc_id, fp,
         lag(fp) OVER (PARTITION BY curl ORDER BY doc_id) AS prev_fp
  FROM fetches
),
per_url AS (
  SELECT domain, curl,
         CAST(count(*) AS BIGINT) AS n_fetches,
         CAST(sum(CASE WHEN prev_fp IS NOT NULL AND fp <> prev_fp
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_changes
  FROM seq
  GROUP BY domain, curl
)
SELECT domain, curl, n_fetches, n_changes,
       CASE WHEN n_fetches >= 2
            THEN {d.trunc6('CAST(n_changes AS DOUBLE) / (n_fetches - 1)')}
            ELSE NULL END AS change_ratio,
       CASE WHEN n_fetches < 2 THEN 'unknown'
            WHEN 2 * n_changes >= n_fetches - 1 THEN 'hot'
            WHEN 10 * n_changes >= n_fetches - 1 THEN 'warm'
            ELSE 'cold' END AS tier
FROM per_url
ORDER BY domain, curl
""".strip()
