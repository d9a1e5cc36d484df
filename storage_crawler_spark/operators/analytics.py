"""Behavioral analytics over the ``events`` stream (batch plane).

The reference's event table feeds rate/summary reports
(/root/reference/storage_crawler/report.py:59-96); this module adds the
standard product-analytics derivatives a warehouse team would run on the
same table — cohort retention here, sessionization and funnels in
streaming/.  All are generated per dialect so the DuckDB oracle runs the
semantically identical query.
"""

from __future__ import annotations

from storage_crawler_spark.plans.dialect import Dialect, money_double
from storage_crawler_spark.operators import check_model_state

SECONDS_PER_WEEK = 604_800


def gen_cohort_retention(
    d: Dialect,
    ev_rel: str | None = None,
    first_rel: str | None = None,
) -> str:
    """Weekly cohort-retention matrix: users are cohorted by the epoch week
    of their FIRST event; each (cohort_week, week_offset) cell counts how
    many of that cohort were active ``offset`` weeks later, plus the
    retention ratio against the cohort size.

    Engine-parity notes: weeks are integer floor-divisions of epoch
    seconds (no calendar/timezone semantics to disagree on), counts are
    BIGINT, and the single float output is floor-truncated at 6 decimals
    (repo convention).

    100 TB shape: one narrow (user_id, week) projection of the event
    stream, distinct-ed per (user, week) with partial aggregation; the
    first-seen relation is a second partial agg on the same shuffle key
    (user_id), so AQE coalesces them onto one exchange; cohort sizes are
    a tiny relation broadcast back onto the per-cell counts.  Nothing
    ever re-sorts the raw event stream.  The Spark builder persists the
    (user, week) relation once (``ev_rel``/``first_rel``) since Spark
    inlines CTEs; the oracle keeps inline CTEs (DuckDB materializes
    multiply-referenced CTEs).
    """
    wk = d.idiv(d.epoch_s_events("ts"), str(SECONDS_PER_WEEK))
    parts = []
    if ev_rel:
        ev = ev_rel
    else:
        ev = "ev"
        parts.append(
            f"ev AS (SELECT DISTINCT user_id, {wk} AS wk FROM events WHERE user_id IS NOT NULL)"
        )
    if first_rel:
        first = first_rel
    else:
        first = "fw"
        parts.append(
            f"fw AS (SELECT user_id, min(wk) AS cohort_wk FROM {ev} GROUP BY user_id)"
        )
    parts.append(
        f"cs AS (SELECT cohort_wk, count(*) AS cohort_users FROM {first} GROUP BY cohort_wk)"
    )
    with_clause = "WITH " + ",\n".join(parts)
    ratio = d.trunc6("CAST(count(*) AS DOUBLE) / s.cohort_users")
    return f"""{with_clause}
SELECT f.cohort_wk AS cohort_wk,
       e.wk - f.cohort_wk AS week_offset,
       count(*) AS active_users,
       s.cohort_users AS cohort_users,
       {ratio} AS retention
FROM {ev} e
JOIN {first} f ON e.user_id = f.user_id
JOIN cs s ON f.cohort_wk = s.cohort_wk
GROUP BY f.cohort_wk, e.wk - f.cohort_wk, s.cohort_users
ORDER BY cohort_wk, week_offset
""".strip()


def gen_funnel_conversion(
    d: Dialect,
    steps: tuple[str, ...] = ("signup", "click", "purchase"),
    window_s: int = 6 * 3600,
) -> str:
    """Windowed ordered-funnel conversion over the event stream: a user
    completes step k if some step-k event occurs AT OR AFTER their step-k−1
    completion time and within ``window_s`` seconds of it (completion time
    = earliest qualifying instant, the standard product-analytics
    semantics; ties at the same second count, matching the at-or-before
    convention of the as-of join).  The window is what makes a funnel a
    funnel — without it any long-lived user trivially "converts".

    Output: one row per funnel step with the surviving-user count and the
    conversion rate against step 1.

    100 TB shape: one narrow (user, type, second) projection; each step is
    a partial-combining min-aggregate joined to the previous step's tiny
    per-user relation — every join and every aggregate keys on user_id, so
    AQE plans ONE exchange for the whole chain and the step relations
    shrink monotonically.  Step count is a query constant, so the chain
    depth is fixed at plan time, not data-driven.
    """
    es = d.epoch_s_events("ts")
    parts = [
        f"ev AS (SELECT user_id, event_type, {es} AS es FROM events WHERE user_id IS NOT NULL)"
    ]
    for i, step in enumerate(steps):
        if i == 0:
            parts.append(
                f"u1 AS (SELECT user_id, min(es) AS t1 FROM ev WHERE event_type = '{step}' GROUP BY user_id)"
            )
        else:
            parts.append(
                f"u{i + 1} AS (SELECT e.user_id, min(e.es) AS t{i + 1} "
                f"FROM ev e JOIN u{i} p ON e.user_id = p.user_id "
                f"AND e.es >= p.t{i} AND e.es <= p.t{i} + {window_s} "
                f"WHERE e.event_type = '{step}' GROUP BY e.user_id)"
            )
    unions = "\nUNION ALL\n".join(
        f"SELECT {i + 1} AS step_no, '{step}' AS step, CAST(count(*) AS BIGINT) AS users FROM u{i + 1}"
        for i, step in enumerate(steps)
    )
    # nullif: an empty stream makes step-1 users 0 — Spark's ANSI divide
    # would CRASH where DuckDB yields a value (empty-input battery catch)
    rate = d.trunc6("CAST(f.users AS DOUBLE) / CAST(nullif(s1.users, 0) AS DOUBLE)")
    ctes = ",\n".join(parts)
    return f"""WITH {ctes},
f AS (
{unions}
),
s1 AS (SELECT users FROM f WHERE step_no = 1)
SELECT f.step_no AS step_no, f.step AS step, f.users AS users,
       {rate} AS conversion_rate
FROM f CROSS JOIN s1
ORDER BY step_no
""".strip()


def gen_stickiness(d: Dialect, trail_weeks: int = 4) -> str:
    """Weekly engagement stickiness: per week, WAU (distinct active users),
    trailing-``trail_weeks`` MAU (distinct users active in that window),
    and the WAU/MAU ratio — the standard engagement-health metric.

    MAU is a DISTINCT over a trailing window, which no window function
    computes (COUNT(DISTINCT) OVER RANGE is unsupported in both engines).
    A BETWEEN range join against a week dimension would plan a
    BroadcastNestedLoopJoin (the plan-audit tool rejected exactly that
    first cut); instead each (user, activity-week) row is EXPANDED
    map-side to the ``trail_weeks`` window-weeks it contributes to — a
    constant lateral fan-out that turns the trailing window into plain
    equi semantics.  100 TB shape: one narrow projection of the event
    stream, a ``trail_weeks``× map-side expansion, two partial-combining
    distinct aggregates, and one broadcast-sized equi-join of the
    per-week relations; no non-equi join anywhere.
    """
    wk = d.idiv(d.epoch_s_events("ts"), str(SECONDS_PER_WEEK))
    ratio = d.trunc6("CAST(w.wau AS DOUBLE) / m.mau")
    lat = d.lateral_seq("0", str(trail_weeks - 1), "o")
    return f"""
WITH ev AS (SELECT DISTINCT user_id, {wk} AS wk FROM events WHERE user_id IS NOT NULL),
wau AS (SELECT wk, count(*) AS wau FROM ev GROUP BY wk),
contrib AS (
  SELECT DISTINCT user_id, ev.wk + o AS wwk
  FROM ev
  {lat}
),
mau AS (SELECT wwk, count(*) AS mau FROM contrib GROUP BY wwk)
SELECT w.wk AS wk, w.wau AS wau, m.mau AS mau, {ratio} AS stickiness
FROM wau w JOIN mau m ON w.wk = m.wwk
ORDER BY wk
""".strip()


def gen_transition_matrix(d: Dialect) -> str:
    """Per-user event-type transition matrix (first-order Markov audit):
    counts and conditional probabilities P(next | current) over each
    user's time-ordered event sequence — the behavioral-drift fingerprint
    compared release-over-release.

    Tie handling is explicit: the successor order is (ts, event_id), so
    same-second events transition in event_id order — deterministic in
    both engines.

    100 TB shape: one lag window per user (shuffle on user_id, sort by
    the 12-byte (ts, id) key), one partial-combining aggregate on the
    (type × type)-sized key space, and a broadcast-sized per-source total
    join for the conditional probability.
    """
    es = d.epoch_s_events("ts")
    prob = d.trunc6("CAST(t.n AS DOUBLE) / f.n_from")
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY {es}, event_id) AS next_type
  FROM events WHERE user_id IS NOT NULL
),
t AS (
  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
),
f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM t GROUP BY from_type)
SELECT t.from_type AS from_type, t.to_type AS to_type,
       CAST(t.n AS BIGINT) AS n_transitions,
       {prob} AS p_next
FROM t JOIN f ON t.from_type = f.from_type
ORDER BY from_type, to_type
""".strip()


def gen_hourly_profile(d: Dialect) -> str:
    """Diurnal load profile per event type: for each hour-of-day, the
    mean and variance of the DAILY count at that hour across the stream's
    whole span — the seasonal baseline that turns the trailing-window
    anomaly detector (window_rate_anomaly) into a seasonality-aware one,
    and the capacity-planning heatmap on its own.

    Cross-engine exactness: day/hour come from integer floor-division of
    epoch seconds; the per-cell aggregates crossing the engines are exact
    integers (Σn, Σn² — the rate-anomaly convention); mean/variance
    divide by the GLOBAL day-span (zero-activity days count — an hour
    that fires one day in thirty is rare, not routine) and truncate at
    the output only.

    100 TB shape: one narrow projection, a (type × day × hour) partial
    aggregate, a (type × hour) re-aggregate (tiny), and a 1-row day-span
    scalar broadcast.
    """
    es = d.epoch_s_events("ts")
    day = d.idiv("es", "86400")
    hour = d.idiv("es % 86400", "3600")
    mean = "sum_n / nd"
    var = f"sum_n2 / nd - ({mean}) * ({mean})"
    return f"""
WITH ev AS (
  SELECT event_type, {day} AS d, {hour} AS h
  FROM (SELECT event_type, {es} AS es FROM events WHERE event_type IS NOT NULL) e0
),
days AS (SELECT CAST(count(DISTINCT d) AS DOUBLE) AS nd FROM ev),
hc AS (SELECT event_type, d, h, count(*) AS n FROM ev GROUP BY event_type, d, h),
base AS (
  SELECT event_type, h,
         CAST(count(*) AS BIGINT) AS active_days,
         CAST(sum(n) AS BIGINT) AS sum_n,
         CAST(sum(n * n) AS BIGINT) AS sum_n2
  FROM hc GROUP BY event_type, h
)
SELECT event_type, h AS hour, active_days, sum_n,
       {d.trunc6(mean)} AS mean_per_day,
       {d.trunc6(var)} AS var_per_day
FROM base CROSS JOIN days
ORDER BY event_type, hour
""".strip()


def gen_user_streaks(d: Dialect) -> str:
    """Per-user activity streaks (gaps-and-islands): distinct active days
    collapse into consecutive runs via the classic day − dense-rank island
    key; output = days active, longest streak, streak count per user —
    the engagement-depth metric cohort retention cannot see (same WAU, 
    very different habits).

    All-integer pipeline (epoch-day floor division, rank arithmetic), so
    the engines agree exactly.  100 TB shape: (user, day) distinct with
    partial aggregation, ONE per-user window over the compact distinct
    relation (shuffle on user_id), two partial-combining aggregates.
    """
    es = d.epoch_s_events("ts")
    day = d.idiv("es", "86400")
    return f"""
WITH ud AS (
  SELECT DISTINCT user_id, {day} AS d
  FROM (SELECT user_id, {es} AS es FROM events WHERE user_id IS NOT NULL) e0
),
isl AS (
  SELECT user_id, d,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS island
  FROM ud
),
runs AS (
  SELECT user_id, island, CAST(count(*) AS BIGINT) AS run_len
  FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(sum(run_len) AS BIGINT) AS active_days,
       CAST(max(run_len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM runs
GROUP BY user_id
ORDER BY user_id
""".strip()


def gen_user_value_quantiles(d: Dialect) -> str:
    """Whale-curve summary: exact quantiles of per-user total event value
    (p50/p90/p99/max) — the monetization-skew readout, and the analytics
    twin of the salted-aggregation plane's skew concern.

    Exactness: event values are CENT-denominated doubles (2 decimals —
    NOT binary-exact), so every sum routes through DECIMAL(18,2) per the
    repo's money-sum convention and converts to DOUBLE exactly once per
    emitted number (one correctly-rounded op, identical in both engines).
    The r9 form summed doubles directly on a false "1/8-lattice" premise;
    it survived the sf0.01 gate by luck and the r10 sf0.1 full sweep
    caught the trunc6 boundary flip on the corpus-wide sum — the
    order-dependent float-sum class the DECIMAL convention exists for.
    """
    pc = "percentile_cont({q}) WITHIN GROUP (ORDER BY CAST(total_dec AS DOUBLE))"
    return f"""
WITH uv AS (
  SELECT user_id, sum(CAST(coalesce(value, 0) AS DECIMAL(18,2))) AS total_dec
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       {d.trunc6(pc.format(q='0.5'))} AS p50,
       {d.trunc6(pc.format(q='0.9'))} AS p90,
       {d.trunc6(pc.format(q='0.99'))} AS p99,
       {d.trunc6('CAST(max(total_dec) AS DOUBLE)')} AS max_total,
       {d.trunc6(money_double('sum(total_dec)'))} AS sum_total
FROM uv
""".strip()


def gen_interarrival_quantiles(d: Dialect) -> str:
    """Per-event-type inter-arrival cadence: exact p50/p90/p99/max of the
    gap (seconds) between consecutive events of the same type — the
    latency/cadence audit that tells a pipeline owner whether a feed is
    steady, bursty, or dying.  Integer gaps from a lag window, exact
    percentile_cont on them (interpolation arithmetic on exact integers —
    cross-engine identical), one tiny per-type aggregate.
    """
    es = d.epoch_s_events("ts")
    pc = "percentile_cont({q}) WITHIN GROUP (ORDER BY gap_s)"
    return f"""
WITH g AS (
  SELECT event_type,
         es - lag(es) OVER (PARTITION BY event_type ORDER BY es, event_id) AS gap_s
  FROM (SELECT event_id, event_type, {es} AS es FROM events WHERE event_type IS NOT NULL) e0
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_gaps,
       {d.trunc6(pc.format(q='0.5'))} AS p50_s,
       {d.trunc6(pc.format(q='0.9'))} AS p90_s,
       {d.trunc6(pc.format(q='0.99'))} AS p99_s,
       CAST(max(gap_s) AS BIGINT) AS max_s
FROM g
WHERE gap_s IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""".strip()


def gen_type_affinity(d: Dialect) -> str:
    """Event-type co-occurrence affinity (market-basket lift over users):
    for every unordered pair of event types, how many users did BOTH, and
    the lift n_users * n_both / (n_a * n_b) plus the user-set Jaccard —
    the feature-adjacency readout behind bundling and funnel design
    (reference surface has per-type counts only; this is the pairwise
    tier).

    100 TB shape: DISTINCT (user, type) first (partial agg shrinks the
    stream to at most |users| x |type vocab|), then a self equi-join on
    user_id whose per-user fanout is bounded by C(T, 2) for a bounded
    type vocabulary T — never a cross join; per-type counts and the 1-row
    user total are broadcast to the final enrich.  All counts CAST to
    BIGINT before the final double division (DuckDB HUGEINT trap).
    """
    return f"""
WITH ut AS (
  SELECT DISTINCT user_id, event_type
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
tc AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n
  FROM ut GROUP BY event_type
),
co AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM ut a
  JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT co.type_a, co.type_b, co.n_both, ta.n AS n_a, tb.n AS n_b,
       {d.trunc6('CAST(co.n_both AS DOUBLE) * tot.n_users / (ta.n * tb.n)')} AS lift,
       {d.trunc6('CAST(co.n_both AS DOUBLE) / (ta.n + tb.n - co.n_both)')} AS user_jaccard
FROM co
JOIN tc ta ON co.type_a = ta.event_type
JOIN tc tb ON co.type_b = tb.event_type
CROSS JOIN tot
ORDER BY co.type_a, co.type_b
""".strip()


def gen_value_trend(d: Dialect) -> str:
    """Per-event-type linear trend of daily value volume: OLS slope and
    intercept of sum(value)-per-day against the day index, from EXACT
    integer moments — the is-this-feed-growing/decaying readout.

    Engine parity: values are discretized onto the 1/8 lattice via an
    explicit floor(value * 8) — CAST(double AS BIGINT) would diverge
    (Spark truncates, DuckDB rounds), so the floor is written out.  The
    per-day sums and all five OLS moments (n, Sx, Sy, Sxy, Sxx) are then
    BIGINT-exact, and both engines compute the identical rational before
    one final double division (trunc6-ed).  The day index is offset by
    the corpus' min day so the squared moments stay far from BIGINT
    range (a fixed-epoch offset would also work; the min-day scalar is a
    1-row broadcast).  Native regr_slope over raw doubles would drift by
    summation order — this formulation cannot.

    100 TB shape: one partial-combining aggregate to (type, day) — the
    compact relation everything else runs on — then one tiny per-type
    aggregate; the min-day scalar joins broadcast.
    """
    es = d.epoch_s_events("ts")
    day = d.idiv("es", "86400")
    return f"""
WITH e0 AS (
  SELECT event_type, {day} AS d, CAST(floor(coalesce(value, 0) * 8) AS BIGINT) AS v8
  FROM (SELECT event_type, value, {es} AS es FROM events
        WHERE event_type IS NOT NULL) raw
),
daily AS (
  SELECT event_type, d, CAST(sum(v8) AS BIGINT) AS y8
  FROM e0 GROUP BY event_type, d
),
mind AS (SELECT CAST(min(d) AS BIGINT) AS d0 FROM daily),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(d - d0) AS BIGINT) AS sx,
         CAST(sum(y8) AS BIGINT) AS sy,
         CAST(sum((d - d0) * y8) AS BIGINT) AS sxy,
         CAST(sum((d - d0) * (d - d0)) AS BIGINT) AS sxx
  FROM daily CROSS JOIN mind
  GROUP BY event_type
)
SELECT event_type, n AS n_days,
       {d.trunc6('CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) / 8')} AS slope_per_day,
       {d.trunc6('CAST(sxx * sy - sx * sxy AS DOUBLE) / (n * sxx - sx * sx) / 8')} AS intercept_day0,
       {d.trunc6('CAST(sy AS DOUBLE) / n / 8')} AS mean_daily_value
FROM m
WHERE n * sxx - sx * sx <> 0
ORDER BY event_type
""".strip()


def gen_session_stats(d: Dialect, gap_s: int = 1800) -> str:
    """Corpus-level session-length distribution: sessionize every user's
    event stream by a ``gap_s`` inactivity gap (the batch twin of the
    streaming session_window plane), then report session counts and exact
    duration / events-per-session quantiles in ONE summary row — the
    engagement-shape readout behind session-window sizing itself.

    All-integer pipeline (epoch-second gaps, lag + running-sum islands on
    the same (user, ts, id) sort order — ONE shuffle serves both windows),
    exact percentile_cont over integer durations.  100 TB: per-user
    windows shuffle on user_id; the final aggregate is a 1-row reduce.
    """
    es = d.epoch_s_events("ts")
    pc = "percentile_cont({q}) WITHIN GROUP (ORDER BY {col})"
    return f"""
WITH e0 AS (
  SELECT user_id, event_id, {es} AS es
  FROM events WHERE user_id IS NOT NULL
),
marked AS (
  SELECT user_id, event_id, es,
         CASE WHEN es - lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id)
                   > {gap_s}
              OR lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM e0
),
sess AS (
  SELECT user_id, es,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY es, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
  FROM marked
),
per_sess AS (
  SELECT user_id, sess_no,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(max(es) - min(es) AS BIGINT) AS duration_s
  FROM sess GROUP BY user_id, sess_no
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       {d.trunc6(pc.format(q='0.5', col='duration_s'))} AS p50_duration_s,
       {d.trunc6(pc.format(q='0.9', col='duration_s'))} AS p90_duration_s,
       CAST(max(duration_s) AS BIGINT) AS max_duration_s,
       {d.trunc6(pc.format(q='0.5', col='n_events'))} AS p50_events,
       CAST(max(n_events) AS BIGINT) AS max_events,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce
FROM per_sess
""".strip()


def gen_basket_brands(d: Dialect, top_k: int = 25) -> str:
    """Market-basket affinity over the TPC-H fact table: for every
    unordered pair of part BRANDS co-purchased in one order, the co-order
    count, lift, and support — the retail twin of the events-plane type
    affinity, exercised here against the big lineitem relation (the scale
    stress is the point: the pair generator must stay bounded on a
    100 TB fact table).

    100 TB shape: broadcast the part dimension onto lineitem, DISTINCT to
    (order, brand) with partial aggregation (the stream shrinks to at most
    lines-per-order distinct brands), self equi-join on the order key —
    per-order fanout bounded by C(brands-in-order, 2), never a cross join
    — then one partial agg on the tiny brand-pair key.  All counts BIGINT
    before the final double arithmetic.
    """
    return f"""
WITH lp AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
bc AS (SELECT brand, CAST(count(*) AS BIGINT) AS n FROM lp GROUP BY brand),
tot AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders FROM lp),
co AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM lp a JOIN lp b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY a.brand, b.brand
)
SELECT co.brand_a, co.brand_b, co.n_both, ca.n AS n_a, cb.n AS n_b,
       {d.trunc6('CAST(co.n_both AS DOUBLE) * tot.n_orders / (ca.n * cb.n)')} AS lift,
       {d.trunc6('CAST(co.n_both AS DOUBLE) / tot.n_orders')} AS support
FROM co
JOIN bc ca ON co.brand_a = ca.brand
JOIN bc cb ON co.brand_b = cb.brand
CROSS JOIN tot
ORDER BY co.n_both DESC, co.brand_a, co.brand_b
LIMIT {top_k}
""".strip()


def gen_session_concurrency(d: Dialect, gap_s: int = 1800) -> str:
    """Time-weighted session-concurrency profile via a sweep line: derive
    inactivity-gap sessions (same island construction as
    :func:`gen_session_stats`), emit +1 at each session start and -1 one
    second after its end (end-inclusive intervals with NO tie rule needed
    — the +1/-1 never land on the same instant for the same session), and
    prefix-sum the deltas over time.  Answers the capacity question an
    interval self-join cannot answer at scale: the overlap-pair relation
    is Theta(n^2) on dense corpora, while the sweep line is O(n log n)
    with output linear in CHANGE POINTS.

    100 TB shape: sessionization shuffles on user_id (bounded windows);
    deltas collapse to distinct seconds via one partial-combining
    aggregate, then the prefix sum runs as the standard TWO-PASS
    partitioned form: change points range-bucket on time (32 equal-width
    buckets from one min/max probe), each bucket computes its running sum
    under a PARTITIONED window, and the cross-bucket carry-in is the sum
    of lower buckets' totals — a ≤32-row theta-join aggregate, broadcast
    back onto the rows.  The inter-change-point duration likewise reads
    intra-bucket ``lead`` with the next non-empty bucket's min time as the
    boundary fallback.  No unpartitioned window anywhere: the sweep
    scales to arbitrarily many change points by raising the bucket count.

    All-integer sweep; the one division is cast to DOUBLE then trunc6-ed.
    """
    es = d.epoch_s_events("ts")
    return f"""
WITH e0 AS (
  SELECT user_id, event_id, {es} AS es
  FROM events WHERE user_id IS NOT NULL
),
marked AS (
  SELECT user_id, event_id, es,
         CASE WHEN es - lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id)
                   > {gap_s}
              OR lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM e0
),
sess AS (
  SELECT user_id, es,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY es, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
  FROM marked
),
per_sess AS (
  SELECT user_id, sess_no,
         CAST(min(es) AS BIGINT) AS t_start,
         CAST(max(es) AS BIGINT) AS t_end
  FROM sess GROUP BY user_id, sess_no
),
deltas AS (
  SELECT t_start AS t, 1 AS delta FROM per_sess
  UNION ALL
  SELECT t_end + 1 AS t, -1 AS delta FROM per_sess
),
change_points AS (
  SELECT t, CAST(sum(delta) AS BIGINT) AS d FROM deltas GROUP BY t
),
bounds AS (
  SELECT CAST(min(t) AS BIGINT) AS tmin,
         ({d.idiv('(max(t) - min(t))', '32')} + 1) AS w
  FROM change_points
),
cp AS (
  SELECT t, d, {d.idiv('(t - b.tmin)', 'b.w')} AS pk
  FROM change_points CROSS JOIN bounds b
),
btot AS (
  SELECT pk, CAST(sum(d) AS BIGINT) AS tot, CAST(min(t) AS BIGINT) AS bt_min
  FROM cp GROUP BY pk
),
carry AS (
  SELECT a.pk, CAST(coalesce(sum(b.tot), 0) AS BIGINT) AS carry_in
  FROM btot a LEFT JOIN btot b ON b.pk < a.pk
  GROUP BY a.pk
),
nxt AS (
  SELECT a.pk, CAST(min(b.bt_min) AS BIGINT) AS next_min
  FROM btot a LEFT JOIN btot b ON b.pk > a.pk
  GROUP BY a.pk
),
running AS (
  SELECT cp.t,
         sum(cp.d) OVER (PARTITION BY cp.pk ORDER BY cp.t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           + c.carry_in AS conc,
         coalesce(lead(cp.t) OVER (PARTITION BY cp.pk ORDER BY cp.t),
                  n.next_min) - cp.t AS dur
  FROM cp
  JOIN carry c ON cp.pk = c.pk
  JOIN nxt n ON cp.pk = n.pk
),
p AS (
  SELECT CAST(conc AS BIGINT) AS conc, CAST(dur AS BIGINT) AS dur
  FROM running WHERE dur IS NOT NULL
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM per_sess) AS n_sessions,
       CAST(max(conc) AS BIGINT) AS max_concurrency,
       {d.trunc6('CAST(sum(conc * dur) AS DOUBLE) / CAST(sum(dur) AS DOUBLE)')} AS avg_concurrency,
       CAST(sum(CASE WHEN conc = 0 THEN dur ELSE 0 END) AS BIGINT) AS idle_seconds,
       CAST(sum(dur) AS BIGINT) AS span_seconds
FROM p
""".strip()


def gen_dow_seasonality(d: Dialect) -> str:
    """Day-of-week seasonality index per event type: each (type, dow)
    cell's event count against the type's uniform-week expectation
    (count_total / 7) — the load-shape fingerprint capacity planning and
    anomaly baselines both start from.  Weekday derivation is pure epoch
    arithmetic ((days + 4) % 7, day 0 = Thursday), identical in both
    engines and timezone-free by construction.

    One partial-combining aggregate on (type, dow); the per-type total
    rides along via a window over the 7-row-per-type aggregate, not a
    second scan."""
    dow = f"CAST(({d.idiv(d.epoch_s_events('ts'), '86400')} + 4) % 7 AS INT)"
    return f"""
WITH cells AS (
  SELECT event_type, {dow} AS dow, CAST(count(*) AS BIGINT) AS n
  FROM events
  GROUP BY event_type, {dow}
)
SELECT event_type, dow, n,
       {d.trunc6('CAST(n AS DOUBLE) * 7.0e0 / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE)')} AS seasonality_idx
FROM cells
ORDER BY event_type, dow
""".strip()


# ---------------------------------------------------------------------------
# event-graph PageRank (fixed-iteration power method, integer lattice)
# ---------------------------------------------------------------------------

# Scaling constants shared by the Spark builder and the DuckDB oracle.
# Rank mass is S; per-edge transition probabilities are floored onto the
# PS lattice; damping alpha = 17/20 (0.85) as an exact rational.  Bounds:
# per-edge product 17 * r * p_scaled <= 17 * 1e11 * 1e6 = 1.7e18 < 2^63,
# so every intermediate stays in BIGINT in both engines.
PR_S = 100_000_000_000
PR_PS = 1_000_000
PR_ALPHA_NUM = 17
PR_ALPHA_DEN = 20
PR_ITERS = 20


def pagerank_cte_base(d: Dialect) -> str:
    """Shared base CTEs for the PageRank entry: the weighted event-type
    transition graph (same lead-window construction as
    :func:`gen_transition_matrix`), the node universe, the node count, and
    the dangling flag (types with no outgoing transition)."""
    es = d.epoch_s_events("ts")
    p_scaled = d.idiv(f"n * {PR_PS}", "n_from")
    return f"""seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY {es}, event_id) AS next_type
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
t AS (
  SELECT event_type AS from_type, next_type AS to_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
),
f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM t GROUP BY from_type),
e AS (
  SELECT t.from_type, t.to_type, CAST({p_scaled} AS BIGINT) AS p_scaled
  FROM t JOIN f ON t.from_type = f.from_type
),
nodes AS (SELECT DISTINCT event_type AS node FROM seq),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
nd AS (
  SELECT nodes.node, CAST(o.from_type IS NULL AS INT) AS is_dangling
  FROM nodes LEFT JOIN (SELECT DISTINCT from_type FROM e) o ON nodes.node = o.from_type
)"""


def gen_pagerank(d: Dialect, k: int = PR_ITERS) -> str:
    """Event-type PageRank via ``k`` unrolled power-iteration steps —
    hub/sink detection on the behavioral transition graph (which event
    types concentrate flow), the iterative-graph-centrality counterpart of
    the connected-components family.

    Determinism (the events_value_trend integer-lattice discipline): rank
    mass is the BIGINT lattice ``PR_S``, probabilities the ``PR_PS``
    lattice, damping the exact rational 17/20, and every step is
    per-edge floor-divided THEN summed — identical BIGINT arithmetic in
    both engines, so the fixed-k result is hash-exact, unlike a
    float-vector power iteration whose summation order would drift.
    Update rule per node v:

        r'(v) = (3*S) div (20*N)                          -- teleport
              + sum_u (17 * r(u) * p(u,v)) div (20*PS)    -- damped flow
              + (17 * dangling_mass) div (20*N)           -- dangling share

    DuckDB materializes each iteration CTE (referenced twice: next step +
    dangling sum) — the Spark engine path is the distributed Python loop
    :func:`pagerank_events`, which checkpoints per iteration instead; this
    generator is the ORACLE formulation (and a debugging aid on Spark,
    where the doubled reference is merely wasteful, not wrong).

    100 TB shape (engine path): the heavy work — collapsing the event
    stream to the (type x type) weighted edge relation — is one window +
    one partial-combining aggregate, run ONCE and persisted; each of the
    k iterations then joins/aggregates relations bounded by the TYPE
    cardinality, with O(1)-row driver state (the dangling-mass scalar),
    never touching the raw stream again.
    """
    mat = " MATERIALIZED" if d.name == "duck" else ""
    teleport = d.idiv(f"{PR_ALPHA_DEN - PR_ALPHA_NUM} * {PR_S}", f"{PR_ALPHA_DEN} * nn.n")
    dterm = d.idiv(f"{PR_ALPHA_NUM} * dm", f"{PR_ALPHA_DEN} * nn.n")
    edge_term = d.idiv(
        f"{PR_ALPHA_NUM} * r.r * e.p_scaled", f"{PR_ALPHA_DEN} * {PR_PS}"
    )
    parts = [pagerank_cte_base(d)]
    parts.append(
        f"r0 AS{mat} (\n  SELECT node, CAST({d.idiv(str(PR_S), 'nn.n')} AS BIGINT) AS r"
        "\n  FROM nodes CROSS JOIN nn\n)"
    )
    for i in range(1, k + 1):
        prev = f"r{i - 1}"
        parts.append(
            f"""dg{i - 1} AS (
  SELECT CAST(coalesce(sum(p.r), 0) AS BIGINT) AS dm
  FROM {prev} p JOIN nd ON p.node = nd.node
  WHERE nd.is_dangling = 1
)"""
        )
        parts.append(
            f"""r{i} AS{mat} (
  SELECT nd.node,
         CAST({teleport} + coalesce(c.contrib, 0) + {dterm} AS BIGINT) AS r
  FROM nd
  CROSS JOIN nn
  CROSS JOIN dg{i - 1}
  LEFT JOIN (
    SELECT e.to_type AS node, CAST(sum({edge_term}) AS BIGINT) AS contrib
    FROM e JOIN {prev} r ON e.from_type = r.node
    GROUP BY e.to_type
  ) c ON nd.node = c.node
)"""
        )
    chain = ",\n".join(parts)
    pr = d.trunc6(f"CAST(r AS DOUBLE) / {PR_S}.0e0")
    return f"""
WITH {chain}
SELECT CAST(row_number() OVER (ORDER BY r DESC, node) AS BIGINT) AS rnk,
       node AS event_type, r AS rank_scaled, {pr} AS pagerank
FROM r{k}
ORDER BY rnk
""".strip()


def pagerank_events(spark, k: int = PR_ITERS):
    """Spark engine path for :func:`gen_pagerank`: build the weighted
    edge relation once (distributed window + aggregate over ``events``),
    persist it, then run ``k`` exact-BIGINT power-iteration steps over
    type-cardinality-bounded relations, checkpointing each (the
    connected-components lineage discipline).  Driver state is two
    scalars per iteration (node count once, dangling mass each step) —
    O(k) 1-row collects, the k-means/PQ contract.
    """
    from pyspark.sql import functions as F

    from storage_crawler_spark.plans.dialect import SPARK

    base = pagerank_cte_base(SPARK)
    rel = spark.sql(f"WITH {base} SELECT * FROM e")
    edges = rel.localCheckpoint(eager=True)
    nd = spark.sql(f"WITH {base} SELECT * FROM nd").localCheckpoint(eager=True)
    n = nd.count()
    # bounded-model-state contract (r12): the per-iteration rank/contrib
    # relations stay distributed, but their size — and the loop's cost —
    # is |event types|; assert the schema-guaranteed bound loudly
    check_model_state(n, "pagerank_events (event-type node relation)")
    if n == 0:
        return spark.sql(
            "SELECT CAST(NULL AS BIGINT) AS rnk, CAST(NULL AS STRING) AS event_type, "
            "CAST(NULL AS BIGINT) AS rank_scaled, CAST(NULL AS DOUBLE) AS pagerank "
            "WHERE 1 = 0"
        )
    an, ad, S, PS = PR_ALPHA_NUM, PR_ALPHA_DEN, PR_S, PR_PS
    # the dangling-mass scalar needs a per-iteration job only when dangling
    # nodes exist at all; most event graphs have none (every type recurs),
    # so check once and save k jobs
    has_dangling = not nd.filter("is_dangling = 1").isEmpty()
    ranks = nd.select("node", F.lit(S // n).cast("long").alias("r"))
    for _ in range(k):
        dm = 0
        if has_dangling:
            dm = (
                ranks.join(nd.filter("is_dangling = 1"), "node")
                .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long"))
                .collect()[0][0]
            )
        base_mass = ((ad - an) * S) // (ad * n) + (an * dm) // (ad * n)
        contrib = (
            edges.join(ranks, edges.from_type == ranks.node)
            .select(
                F.col("to_type").alias("node"),
                F.expr(f"({an} * r * p_scaled) div ({ad} * {PS})").alias("term"),
            )
            .groupBy("node")
            .agg(F.sum("term").cast("long").alias("contrib"))
        )
        ranks = (
            nd.select("node")
            .join(contrib, "node", "left")
            .select(
                "node",
                (F.coalesce(F.col("contrib"), F.lit(0)) + F.lit(base_mass))
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    ranks.createOrReplaceTempView("_pagerank_final")
    pr = SPARK.trunc6(f"CAST(r AS DOUBLE) / {S}.0e0")
    return spark.sql(
        f"""
SELECT CAST(row_number() OVER (ORDER BY r DESC, node) AS BIGINT) AS rnk,
       node AS event_type, r AS rank_scaled, {pr} AS pagerank
FROM _pagerank_final
ORDER BY rnk
""".strip()
    )


def gen_ab_test(d: Dialect, seed: str = "ab", metric_type: str = "purchase") -> str:
    """Two-proportion z-test between deterministic A/B cohorts: every
    event inherits its user's cohort (parity of the frozen md5 uniform —
    the assignment a real experiment framework would persist) and the
    compared metric is the ``metric_type`` share of events — pooled-
    variance z-score with 95%/99% significance flags, the experiment
    readout every event pipeline ends at.  (Binary per-user conversion is
    degenerate on streams where every user eventually converts — rate 1.0
    in both arms, z = 0/0 — which is exactly what the synthetic stream
    exhibits; the event-share metric stays informative.  A production
    variant would add a clustered-SE correction for the user-level
    assignment; the pooled z here is the standard first readout.)

    The split is a pure function of (seed, user_id), so cohort
    assignment, rates, and the z-score are engine- and rerun-stable; with
    no planted effect the test should accept H0 (|z| < 1.96) — the null
    calibration IS the audit.  erf/normal-CDF p-values are deliberately
    absent (engines disagree on erf availability); the two
    critical-value flags carry the decision.

    One scan -> 2-group partial-combining aggregate -> 1-row arithmetic.
    Zero-denominator guards via nullif so an empty cohort yields NULL z,
    not an engine-divergent division."""
    u_key = d.md5_key48("CAST(user_id AS STRING)", seed)
    z_num = "(pa - pb)"
    z_den = "sqrt(nullif(p_pool * (1.0e0 - p_pool) * (1.0e0 / na + 1.0e0 / nb), 0.0e0))"
    return f"""
WITH g AS (
  SELECT CAST({u_key} % 2 AS INT) AS grp,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(CASE WHEN event_type = '{metric_type}' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_converted
  FROM events WHERE user_id IS NOT NULL
  GROUP BY grp
),
wide AS (
  SELECT CAST(max(CASE WHEN grp = 0 THEN n_users END) AS DOUBLE) AS na,
         CAST(max(CASE WHEN grp = 0 THEN n_converted END) AS DOUBLE) AS ca,
         CAST(max(CASE WHEN grp = 1 THEN n_users END) AS DOUBLE) AS nb,
         CAST(max(CASE WHEN grp = 1 THEN n_converted END) AS DOUBLE) AS cb
  FROM g
),
rates AS (
  SELECT na, ca, nb, cb,
         ca / nullif(na, 0.0e0) AS pa,
         cb / nullif(nb, 0.0e0) AS pb,
         (ca + cb) / nullif(na + nb, 0.0e0) AS p_pool
  FROM wide
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
       CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
       {d.trunc6('pa')} AS rate_a, {d.trunc6('pb')} AS rate_b,
       {d.trunc6('pa - pb')} AS lift,
       {d.trunc6(f'{z_num} / {z_den}')} AS z_score,
       CAST(abs({z_num} / {z_den}) > 1.96e0 AS INT) AS significant_95,
       CAST(abs({z_num} / {z_den}) > 2.576e0 AS INT) AS significant_99
FROM rates
""".strip()


def gen_hits(d: Dialect, k: int = PR_ITERS) -> str:
    """HITS hubs & authorities on the event-type transition graph — the
    bipartite companion of :func:`gen_pagerank`: authority = types that
    FLOW CONCENTRATES INTO (weighted in-links from good hubs), hub =
    types whose outgoing transitions POINT AT good authorities.  PageRank
    finds global stationarity; HITS separates the two roles a type can
    play, which is the drill-down a funnel designer actually wants.

    Same integer-lattice discipline: edge weights are the PR_PS-scaled
    transition probabilities from the shared base, scores live on the
    PR_PS lattice with max normalization each half-step (authorities
    update from hubs, THEN hubs from the new authorities — the classic
    ordering), every quantity non-negative BIGINT, per-edge
    multiply-then-sum exact.  Bounds: p <= 1e6, score <= 1e6, so a
    half-step term is <= 1e12 x type-cardinality — BIGINT-safe to a
    million types.

    DuckDB materializes each half-step CTE; the Spark engine path
    (:func:`hits_events`) iterates on the driver over the collected
    (type x type) edge relation — bounded MODEL STATE for a
    type-cardinality graph (the PCA d^2 contract); for graphs whose node
    set outgrows the driver, the distributed per-step shape is exactly
    gen_pagerank's loop with two aggregates per round.
    """
    mat = " MATERIALIZED" if d.name == "duck" else ""
    VS = PR_PS
    parts = [pagerank_cte_base(d)]
    parts.append(
        f"hn0 AS{mat} (SELECT node, CAST({VS} AS BIGINT) AS h FROM nodes)"
    )
    for i in range(1, k + 1):
        prev_h = f"hn{i - 1}"
        parts.append(
            f"""ar{i} AS{mat} (
  SELECT nd.node, CAST(coalesce(c.s, 0) AS BIGINT) AS a
  FROM nd LEFT JOIN (
    SELECT e.to_type AS node, CAST(sum(e.p_scaled * h.h) AS BIGINT) AS s
    FROM e JOIN {prev_h} h ON e.from_type = h.node
    GROUP BY e.to_type
  ) c ON nd.node = c.node
)"""
        )
        parts.append(
            f"ma{i} AS (SELECT greatest(CAST(max(a) AS BIGINT), 1) AS m FROM ar{i})"
        )
        parts.append(
            f"""an{i} AS{mat} (
  SELECT node, CAST({d.idiv(f'a * {VS}', 'mx.m')} AS BIGINT) AS a
  FROM ar{i} CROSS JOIN ma{i} mx
)"""
        )
        parts.append(
            f"""hr{i} AS{mat} (
  SELECT nd.node, CAST(coalesce(c.s, 0) AS BIGINT) AS h
  FROM nd LEFT JOIN (
    SELECT e.from_type AS node, CAST(sum(e.p_scaled * a.a) AS BIGINT) AS s
    FROM e JOIN an{i} a ON e.to_type = a.node
    GROUP BY e.from_type
  ) c ON nd.node = c.node
)"""
        )
        parts.append(
            f"mh{i} AS (SELECT greatest(CAST(max(h) AS BIGINT), 1) AS m FROM hr{i})"
        )
        parts.append(
            f"""hn{i} AS{mat} (
  SELECT node, CAST({d.idiv(f'h * {VS}', 'mx.m')} AS BIGINT) AS h
  FROM hr{i} CROSS JOIN mh{i} mx
)"""
        )
    chain = ",\n".join(parts)
    return f"""
WITH {chain}
SELECT a.node AS event_type,
       a.a AS authority_scaled, h.h AS hub_scaled,
       {d.trunc6(f'CAST(a.a AS DOUBLE) / {VS}.0e0')} AS authority,
       {d.trunc6(f'CAST(h.h AS DOUBLE) / {VS}.0e0')} AS hub
FROM an{k} a JOIN hn{k} h ON a.node = h.node
ORDER BY event_type
""".strip()


def hits_events(spark, k: int = PR_ITERS):
    """Spark engine path for :func:`gen_hits`: the weighted (type x type)
    edge relation is built distributed ONCE (the corpus-scan cost), then
    collected as bounded model state and iterated in exact Python
    integers — see gen_hits for the contract and the big-node-set
    alternative."""
    from storage_crawler_spark.plans.dialect import SPARK

    base = pagerank_cte_base(SPARK)
    # bounded-model-state contract (r12, ordering fixed per r12 ADVICE):
    # guard the node CARDINALITY via a distributed count() BEFORE the
    # first collect — nodes are event TYPES, so the edge relation is
    # ≤ |nodes|², and the node collect itself must not be the unguarded
    # one the guard exists to catch.
    n_nodes = spark.sql(f"WITH {base} SELECT count(*) FROM nodes").collect()[0][0]
    check_model_state(n_nodes * n_nodes, "hits_events (type x type edges)")
    nodes = [r[0] for r in spark.sql(f"WITH {base} SELECT node FROM nodes").collect()]
    edges = spark.sql(
        f"WITH {base} SELECT e.from_type, e.to_type, e.p_scaled FROM e"
    ).collect()
    check_model_state(3 * len(edges), "hits_events (collected edge rows)")
    if not nodes:
        return spark.sql(
            "SELECT CAST(NULL AS STRING) AS event_type, "
            "CAST(NULL AS BIGINT) AS authority_scaled, CAST(NULL AS BIGINT) AS hub_scaled, "
            "CAST(NULL AS DOUBLE) AS authority, CAST(NULL AS DOUBLE) AS hub WHERE 1 = 0"
        )
    VS = PR_PS
    out_edges: dict[str, list[tuple[str, int]]] = {}
    in_edges: dict[str, list[tuple[str, int]]] = {}
    for f_, t_, p in edges:
        out_edges.setdefault(f_, []).append((t_, int(p)))
        in_edges.setdefault(t_, []).append((f_, int(p)))
    h = {n: VS for n in nodes}
    a = {n: 0 for n in nodes}
    for _ in range(k):
        ar = {n: sum(p * h[u] for u, p in in_edges.get(n, [])) for n in nodes}
        ma = max(max(ar.values()), 1)
        a = {n: (x * VS) // ma for n, x in ar.items()}
        hr = {n: sum(p * a[t] for t, p in out_edges.get(n, [])) for n in nodes}
        mh = max(max(hr.values()), 1)
        h = {n: (x * VS) // mh for n, x in hr.items()}
    rows = [(n, a[n], h[n]) for n in sorted(nodes)]
    df = spark.createDataFrame(
        rows, "event_type STRING, authority_scaled BIGINT, hub_scaled BIGINT"
    )
    df.createOrReplaceTempView("_hits_final")
    auth = SPARK.trunc6(f"CAST(authority_scaled AS DOUBLE) / {VS}.0e0")
    hub = SPARK.trunc6(f"CAST(hub_scaled AS DOUBLE) / {VS}.0e0")
    return spark.sql(
        f"""
SELECT event_type, authority_scaled, hub_scaled,
       {auth} AS authority, {hub} AS hub
FROM _hits_final
ORDER BY event_type
""".strip()
    )


# ---------------------------------------------------------------------------
# Holt double-exponential smoothing (per-type load forecast)
# ---------------------------------------------------------------------------

HOLT_S = 1_000_000  # level/trend lattice


def _holt_tdiv(d: Dialect, x: str, m: str) -> str:
    """Truncating division via the dialect's INTEGER div with a sign
    split (engine-safe for negative trends — the PCA-iterate pattern).
    Float '/' + CAST would lose exactness: doubles carry 53 bits and the
    scaled level products reach ~2^52 already at modest volumes."""
    return (
        f"(CASE WHEN ({x}) >= 0 THEN {d.idiv(f'({x})', f'({m})')} "
        f"ELSE -({d.idiv(f'(-({x}))', f'({m})')}) END)"
    )


def gen_holt_trend(d: Dialect, alpha_4th: int = 1, beta_4th: int = 1) -> str:
    """Per-event-type HOLT double-exponential smoothing over the daily
    count series — the forecasting readout the trend/seasonality entries
    stop short of: smoothed level, per-day trend, next-day and 7-day
    forecasts, and the in-sample one-step SSE (the model-quality number
    that says whether the forecast is worth reading).

    Exact-integer discipline: level/trend live on the HOLT_S lattice,
    alpha = beta = 1/4 as exact rationals, every step a
    multiply-then-truncating-divide on BIGINTs folded in pinned day order
    (state string 'level:trend:sse', the BPE fold pattern) — hash-exact
    across engines where a float EWMA would drift.  The series is the
    OBSERVED days in order (no zero-fill spine; each fold step is one
    observed day, which is the standard irregular-series reading).

    100 TB shape: the stream collapses to (type, day, count) in one
    partial-combining aggregate; the per-type ordered array is bounded by
    CALENDAR DAYS, not corpus size, so the fold is a per-type scalar
    expression over a tiny relation.
    """
    day = d.idiv(d.epoch_s_events("ts"), "86400")
    arr = d.agg_arr_by("day", "CAST(cnt AS STRING)")
    an, ad = alpha_4th, 4
    bn, bd = beta_4th, 4

    def part(i: int) -> str:
        return d.elem(d.split("st", ":"), str(i))

    L = f"CAST({part(1)} AS BIGINT)"
    T = f"CAST({part(2)} AS BIGINT)"
    E = f"CAST({part(3)} AS BIGINT)"
    C = "CAST(x AS BIGINT)"
    pred = f"({L} + {T})"
    err = f"({_holt_tdiv(d, pred, str(HOLT_S))} - {C})"
    nl = _holt_tdiv(d, f"{an} * {C} * {HOLT_S} + {ad - an} * {pred}", str(ad))
    nt = _holt_tdiv(d, f"{bn} * ({nl} - {L}) + {bd - bn} * {T}", str(bd))
    step = (
        f"CASE WHEN st = 'I' THEN CAST({C} * {HOLT_S} AS STRING) || ':0:0' "
        f"ELSE CAST({nl} AS STRING) || ':' || CAST({nt} AS STRING) || ':' "
        f"|| CAST({E} + {err} * {err} AS STRING) END"
    )
    if d.name == "spark":
        fold = f"aggregate(darr, 'I', (st, x) -> {step})"
    else:
        fold = f"list_reduce(list_prepend('I', darr), (st, x) -> {step})"
    return f"""
WITH daily AS (
  SELECT event_type, {day} AS day, CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE event_type IS NOT NULL
  GROUP BY event_type, {day}
),
series AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days, {arr} AS darr
  FROM daily GROUP BY event_type
),
fitted AS (
  SELECT event_type, n_days, {fold} AS hstate FROM series
),
parsed AS (
  SELECT event_type, n_days,
         CAST({d.elem(d.split('hstate', ':'), '1')} AS BIGINT) AS lvl,
         CAST({d.elem(d.split('hstate', ':'), '2')} AS BIGINT) AS trd,
         CAST({d.elem(d.split('hstate', ':'), '3')} AS BIGINT) AS sse
  FROM fitted
)
SELECT event_type, n_days,
       {d.trunc6(f'CAST(lvl AS DOUBLE) / {HOLT_S}.0e0')} AS level,
       {d.trunc6(f'CAST(trd AS DOUBLE) / {HOLT_S}.0e0')} AS trend_per_day,
       {_holt_tdiv(d, 'lvl + trd', str(HOLT_S))} AS forecast_next,
       {_holt_tdiv(d, 'lvl + 7 * trd', str(HOLT_S))} AS forecast_7d,
       sse AS one_step_sse
FROM parsed
ORDER BY event_type
""".strip()


def gen_funnel_stage(
    d: Dialect,
    step: str,
    idx: int,
    prev_rel: str | None = None,
    max_lag_s: int = 86400,
) -> str:
    """Per-user first-qualifying-event time of one funnel stage — factored
    so the Spark builder can stage s1/s2 as persisted plain-FROM relations
    (each is read by the next stage AND the final count; inline, CTE
    inlining re-derived s1 three times and scanned events six times).
    Semantics identical to the inline chain in :func:`gen_funnel_steps`."""
    es = d.epoch_s_events("e.ts")
    if prev_rel is None:
        return (
            f"SELECT e.user_id, CAST(min({es}) AS BIGINT) AS t1\n"
            f"FROM events e\n"
            f"WHERE e.user_id IS NOT NULL AND e.event_type = '{step}'\n"
            f"GROUP BY e.user_id"
        )
    p = idx - 1
    return (
        f"SELECT e.user_id, CAST(min({es}) AS BIGINT) AS t{idx}\n"
        f"FROM events e JOIN {prev_rel} s ON e.user_id = s.user_id\n"
        f"WHERE e.user_id IS NOT NULL AND e.event_type = '{step}'\n"
        f"  AND {es} > s.t{p} AND {es} <= s.t{p} + {max_lag_s}\n"
        f"GROUP BY e.user_id"
    )


def gen_funnel_readout(d: Dialect, s1_rel: str, s2_rel: str, s3_rel: str) -> str:
    """Final 1-row funnel readout over staged stage relations: three 1-row
    count aggregates cross-joined (1-row build sides), NULL-guarded
    conversion rates."""
    rate = lambda a, b: d.trunc6(f"CAST({a} AS DOUBLE) / nullif({b}, 0)")  # noqa: E731
    return f"""
SELECT n1 AS n_step1, n2 AS n_step2, n3 AS n_step3,
       {rate('n2', 'n1')} AS conv_1_2,
       {rate('n3', 'n2')} AS conv_2_3,
       {rate('n3', 'n1')} AS conv_overall
FROM (SELECT CAST(count(*) AS BIGINT) AS n1 FROM {s1_rel}) a
CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n2 FROM {s2_rel}) b
CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n3 FROM {s3_rel}) c
""".strip()


def gen_funnel_steps(
    d: Dialect,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    max_lag_s: int = 86400,
) -> str:
    """Ordered conversion funnel: how many users performed step 1, then
    step 2 within ``max_lag_s`` seconds AFTER their first step 1, then
    step 3 within the window after that — the product-analytics primitive
    every event warehouse ships (strict temporal ordering plus a
    conversion window, neither expressible as a plain GROUP BY).

    Semantics: t1 = user's earliest step-1 event; t_{i+1} = earliest
    step-(i+1) event with t_i < time <= t_i + max_lag_s (the canonical
    "first qualifying event" funnel — re-entries don't help, earlier
    out-of-order events don't count, late conversions fall outside the
    window).  Conversion rates are NULL-guarded for empty stages.

    100 TB shape: each stage is a per-user aggregate over a
    type-pruned scan (the event_type filter pushes down), chained by
    equi-joins on user_id — stage relations shrink monotonically, every
    aggregate partial-combines, and no window functions at all.  The
    final readout is three 1-row scalars.
    """
    assert len(steps) == 3
    es = d.epoch_s_events("ts")
    rate = lambda a, b: d.trunc6(f"CAST({a} AS DOUBLE) / nullif({b}, 0)")  # noqa: E731
    return f"""
WITH e0 AS (
  SELECT user_id, event_type, {es} AS es
  FROM events WHERE user_id IS NOT NULL
),
s1 AS (
  SELECT user_id, CAST(min(es) AS BIGINT) AS t1
  FROM e0 WHERE event_type = '{steps[0]}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, CAST(min(e.es) AS BIGINT) AS t2
  FROM e0 e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = '{steps[1]}' AND e.es > s1.t1 AND e.es <= s1.t1 + {max_lag_s}
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, CAST(min(e.es) AS BIGINT) AS t3
  FROM e0 e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = '{steps[2]}' AND e.es > s2.t2 AND e.es <= s2.t2 + {max_lag_s}
  GROUP BY e.user_id
),
c AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
         (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
         (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n3
)
SELECT n1 AS n_step1, n2 AS n_step2, n3 AS n_step3,
       {rate('n2', 'n1')} AS conv_1_2,
       {rate('n3', 'n2')} AS conv_2_3,
       {rate('n3', 'n1')} AS conv_overall
FROM c
""".strip()


def gen_type_triangles(d: Dialect, min_users: int = 3) -> str:
    """Triangle enumeration on the event-type co-occurrence graph: nodes
    are event types, an edge joins two types sharing at least
    ``min_users`` distinct users, and every triangle is listed with its
    three edge supports — the smallest interesting graph-motif operator,
    and the node-iterator join formulation is exactly how a distributed
    engine counts triangles at scale (E ⋈ E ⋈ E with a total node order
    so each triangle materializes ONCE, never 6 ways).

    100 TB shape: the distinct (user, type) relation partial-combines;
    the per-user type fanout is bounded by the type-dimension cardinality
    (each user contributes ≤ C(types, 2) pairs map-side); the edge
    relation is at most types² rows — a broadcast — so the two triangle
    joins never shuffle anything corpus-sized.
    """
    return f"""
WITH ut AS (
  SELECT DISTINCT user_id, event_type
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
pe AS (
  SELECT a.event_type AS t1, b.event_type AS t2,
         CAST(count(*) AS BIGINT) AS n_users
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
),
ed AS (SELECT t1, t2, n_users FROM pe WHERE n_users >= {min_users})
SELECT e1.t1 AS node_a, e1.t2 AS node_b, e2.t2 AS node_c,
       e1.n_users AS support_ab, e2.n_users AS support_bc, e3.n_users AS support_ac
FROM ed e1
JOIN ed e2 ON e2.t1 = e1.t2
JOIN ed e3 ON e3.t1 = e1.t1 AND e3.t2 = e2.t2
ORDER BY node_a, node_b, node_c
""".strip()


def gen_benford_audit(d: Dialect) -> str:
    """Benford leading-digit audit of the event value distribution:
    observed share of each leading digit 1-9 against the Benford
    expectation log10(1 + 1/digit) — the fabricated-/synthetic-data
    smoke test auditors run on numeric columns (organically-generated
    magnitudes follow Benford; uniform or hand-made ones don't).

    Engine parity: the leading digit is extracted INTEGER-side —
    value*10^6 floored to BIGINT (one exactly-rounded multiply, identical
    doubles both engines), then the first character of the BIGINT's
    decimal rendering — never via log10/pow on floats, whose ulp drift
    could flip a digit at magnitude boundaries.  Values below 10^-6 (and
    zero/negative/NULL) are excluded: the integer rendering cannot reach
    their first significant digit (documented magnitude floor).  Expected
    shares are trunc6 of ln-ratio constants.

    100 TB shape: map-only digit projection, one 9-group aggregate —
    partial-combining, no joins, no windows.
    """
    ld = "CAST(substr(CAST(v100 AS STRING), 1, 1) AS BIGINT)"
    obs = d.trunc6("CAST(count(*) AS DOUBLE) / max(tot)")
    exp_ = d.trunc6("ln(1.0e0 + 1.0e0 / max(ld)) / ln(10.0e0)")
    dev = d.trunc6(
        "abs(CAST(count(*) AS DOUBLE) / max(tot) - ln(1.0e0 + 1.0e0 / max(ld)) / ln(10.0e0))"
    )
    return f"""
WITH v AS (
  SELECT CAST(floor(value * 1000000) AS BIGINT) AS v100
  FROM events WHERE value IS NOT NULL AND value >= 1.0e-6 AND value < 1.0e12
),
dig AS (
  SELECT {ld} AS ld FROM v
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM v)
SELECT ld AS digit,
       CAST(count(*) AS BIGINT) AS n,
       {obs} AS obs_share,
       {exp_} AS benford_share,
       {dev} AS abs_dev
FROM dig CROSS JOIN tot
GROUP BY ld
ORDER BY ld
""".strip()


def gen_burst_windows(d: Dialect, z_hi: float = 2.0, hc_rel: str | None = None) -> str:
    """Rate-burst detection per event type: hourly buckets whose count
    exceeds the type's mean by more than ``z_hi`` standard deviations —
    the incident-window readout an ops dashboard derives from the event
    stream (and the batch twin of the streaming rate-anomaly entry).

    Engine parity: bucket counts are exact BIGINTs; mean and variance
    come from exact integer sums (n, Σc, Σc²) divided late, and σ is one
    correctly-rounded sqrt — so the z threshold compares IDENTICAL
    doubles in both engines.  Baseline is over OBSERVED buckets (an hour
    with zero events contributes no bucket — documented, matching the
    streaming twin's frame).

    100 TB shape: one partial-combining (type, hour) count, one tiny
    per-type moment aggregate broadcast back — no windows, no self-join
    over the bucket relation.  The bucket counters are pure sums, so the
    relation is micro-batch-splittable — ``hc_rel`` substitutes the
    incrementally-maintained streaming counter table (the
    ``streaming_burst_windows`` twin), finish identical.
    """
    es = d.epoch_s_events("ts")
    mu = "(CAST(s1 AS DOUBLE) / nb)"
    var = f"(CAST(s2 AS DOUBLE) / nb - {mu} * {mu})"
    sigma = f"sqrt(CASE WHEN {var} < 0 THEN 0 ELSE {var} END)"
    z = f"(CAST(n AS DOUBLE) - {mu}) / nullif({sigma}, 0)"
    if hc_rel:
        hc_cte = f"hc AS (SELECT event_type, hb, n FROM {hc_rel})"
    else:
        hc_cte = f"""e0 AS (
  SELECT event_type, {d.idiv(f'({es})', '3600')} AS hb
  FROM events WHERE event_type IS NOT NULL
),
hc AS (
  SELECT event_type, hb, CAST(count(*) AS BIGINT) AS n
  FROM e0 GROUP BY event_type, hb
)"""
    return f"""
WITH {hc_cte},
st AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(n) AS BIGINT) AS s1, CAST(sum(n * n) AS BIGINT) AS s2
  FROM hc GROUP BY event_type
)
SELECT h.event_type, CAST(h.hb * 3600 AS BIGINT) AS bucket_start_s, h.n,
       {d.trunc6(z)} AS zscore
FROM hc h JOIN st s ON h.event_type = s.event_type
WHERE {z} > {z_hi}
ORDER BY h.event_type, bucket_start_s
""".strip()


def gen_retention_cohorts(d: Dialect) -> str:
    """Weekly cohort retention matrix: users cohorted by the week of their
    first signup event; each (cohort week, weeks-since) cell counts the
    distinct cohort members active in that week — the canonical
    warehouse retention triangle (offset 0 is the signup week itself, so
    its retention is 1 by construction; later offsets decay).

    Week indexes are absolute epoch-week integers (epoch seconds div
    604800) — no calendar/timezone surface at all, identical in both
    engines.  100 TB shape: cohort assignment is one per-user aggregate
    over the signup-pruned scan; activity dedups to distinct (user,
    week) via partial-combining DISTINCT; the join keys on user_id and
    the matrix aggregate is tiny.  No windows.
    """
    es = d.epoch_s_events("ts")
    wk = d.idiv(f"({es})", "604800")
    ret = d.trunc6("CAST(count(*) AS DOUBLE) / max(s.n_cohort)")
    return f"""
WITH e0 AS (
  SELECT user_id, event_type, {wk} AS wk
  FROM events WHERE user_id IS NOT NULL
),
coh AS (
  SELECT user_id, CAST(min(wk) AS BIGINT) AS cwk
  FROM e0 WHERE event_type = 'signup' GROUP BY user_id
),
sz AS (SELECT cwk, CAST(count(*) AS BIGINT) AS n_cohort FROM coh GROUP BY cwk),
act AS (
  SELECT DISTINCT e0.user_id, coh.cwk, e0.wk - coh.cwk AS wo
  FROM e0 JOIN coh ON e0.user_id = coh.user_id
  WHERE e0.wk >= coh.cwk
)
SELECT a.cwk AS cohort_week, CAST(a.wo AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(max(s.n_cohort) AS BIGINT) AS n_cohort,
       {ret} AS retention
FROM act a JOIN sz s ON a.cwk = s.cwk
GROUP BY a.cwk, a.wo
ORDER BY cohort_week, week_offset
""".strip()


def attribution_pair_fragments(
    d: Dialect, window_s: int = 86400, n_channels: int = 4
) -> tuple[str, str]:
    """(px/cx CTE block, final SELECT) of the touchpoint pair relation,
    exposed separately so :func:`gen_attribution_credit` can hoist the
    CTEs into its own WITH by COMPOSITION — not by string-splitting the
    assembled SQL (r10 ADVICE: the split silently depended on the exact
    'WITH ' prefix and on inner SELECTs never sitting at column 0)."""
    es = d.epoch_s_events("ts")
    chan = f"(CAST({d.json_str('props', '$.k')} AS BIGINT) % {n_channels})"
    ctes = f"""
px AS (
  SELECT event_id AS pid, user_id, {es} AS tp,
         CAST(floor(value * 1000000) AS BIGINT) AS vm
  FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND value IS NOT NULL
),
cx AS (
  SELECT event_id AS cid, user_id, {es} AS tc, {chan} AS channel
  FROM events
  WHERE event_type = 'click' AND user_id IS NOT NULL AND props IS NOT NULL
)
""".strip()
    select = f"""
SELECT p.pid, p.vm, c.cid, c.tc, c.channel
FROM px p JOIN cx c
  ON p.user_id = c.user_id
 AND c.tc < p.tp AND c.tc >= p.tp - {window_s}
""".strip()
    return ctes, select


def gen_attribution_pairs(d: Dialect, window_s: int = 86400, n_channels: int = 4) -> str:
    """(pid, vm, cid, tc, channel) purchase×click touchpoint pair relation
    — the one expensive join of the attribution matrix, factored out so
    the Spark builder persists it.  Un-persisted, Spark's CTE inlining
    re-ran the purchase×click equi-join 3× and scanned events 7×
    (per_purchase / last_pick / credited each re-derive it — the r9
    plan-audit catch); the oracle materializes it instead."""
    ctes, select = attribution_pair_fragments(d, window_s, n_channels)
    return f"WITH {ctes}\n{select}"


def gen_attribution_per_purchase(d: Dialect, pairs_rel: str = "pairs") -> str:
    """(pid, n_clicks, max_tc) per-purchase touch roll-up over the pair
    relation — factored so the Spark builder can stage it as a plain
    relation (cache replacement does not descend into WITH/CTE
    definitions on Spark 4.x; see tools/audit_cache.py)."""
    return (
        "SELECT pid, CAST(count(*) AS BIGINT) AS n_clicks,\n"
        "       CAST(max(tc) AS BIGINT) AS max_tc\n"
        f"FROM {pairs_rel} GROUP BY pid"
    )


def gen_attribution_last_pick(
    d: Dialect, pairs_rel: str = "pairs", pp_rel: str = "per_purchase"
) -> str:
    """Latest-click argmax without windows or composite-key overflow: max
    tc per purchase (already in ``pp_rel``), then max cid among that
    instant's ties."""
    return (
        "SELECT pr.pid, CAST(max(pr.cid) AS BIGINT) AS last_cid\n"
        f"FROM {pairs_rel} pr JOIN {pp_rel} pp ON pr.pid = pp.pid AND pr.tc = pp.max_tc\n"
        "GROUP BY pr.pid"
    )


def gen_attribution_rollup(
    d: Dialect,
    pairs_rel: str = "pairs",
    pp_rel: str = "per_purchase",
    lp_rel: str = "last_pick",
) -> str:
    """Final channel roll-up of the credited touches (see
    :func:`gen_attribution_credit` for the accounting contract)."""
    return f"""
SELECT CAST(channel AS BIGINT) AS channel,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases_touched,
       CAST(sum(linear_micro) AS BIGINT) AS linear_credit_micro,
       CAST(sum(last_touch_micro) AS BIGINT) AS last_touch_credit_micro
FROM (
  SELECT pr.channel, pr.pid,
         {d.idiv('pr.vm', 'pp.n_clicks')}
           + CASE WHEN pr.cid = lp.last_cid THEN pr.vm % pp.n_clicks ELSE 0 END
           AS linear_micro,
         CASE WHEN pr.cid = lp.last_cid THEN pr.vm ELSE 0 END AS last_touch_micro
  FROM {pairs_rel} pr
  JOIN {pp_rel} pp ON pr.pid = pp.pid
  JOIN {lp_rel} lp ON pr.pid = lp.pid
) credited
GROUP BY channel
ORDER BY channel
""".strip()


def gen_attribution_credit(
    d: Dialect,
    window_s: int = 86400,
    n_channels: int = 4,
) -> str:
    """Multi-touch attribution matrix: every purchase's value is credited
    to the click touchpoints in the preceding ``window_s`` seconds, under
    BOTH standard models side by side — last-touch (full credit to the
    latest click) and linear (equal split across clicks) — per campaign
    channel (the ``props.k`` payload field mod ``n_channels``).  The
    model-choice question every growth team argues about, as one query.

    Exact-integer accounting: purchase value enters as floor(value·10⁶)
    micro-units; the linear split is floor(vm / n_clicks) per click with
    the remainder assigned to the latest click, so per-purchase credit
    sums EXACTLY to vm under both models and every aggregate is a BIGINT
    sum — no float-order drift anywhere.  The latest click is a two-step
    argmax (max time per purchase, then max event_id among that instant's
    ties) — no window over the click stream and no composite-key
    arithmetic that could overflow BIGINT at real timestamps.

    100 TB shape: the purchase×click pair join is an equi-join on user_id
    with the time window as a pushed residual (per-user fanout is bounded
    by user activity; AQE splits hot users); the latest-click selection is
    a per-purchase max over the pair relation (partial-combining), never a
    window over the click stream.  The pair relation is consumed by THREE
    downstream relations; this inline form (the DuckDB oracle) MATERIALIZES
    it as a CTE, while the Spark builder stages the factored fragments
    (:func:`gen_attribution_pairs` persisted, then per_purchase /
    last_pick / rollup as plain-FROM temp views) because Spark's cache
    replacement does not descend into WITH definitions.
    """
    # hoist the px/cx CTEs of the factored pair SQL into this WITH and
    # wrap its SELECT as the (oracle-MATERIALIZED) pairs CTE — composed
    # from the exposed fragments, never by splitting assembled SQL
    mat = " MATERIALIZED" if d.name == "duck" else ""
    ctes, select = attribution_pair_fragments(d, window_s, n_channels)
    pairs_cte = f"{ctes},\npairs AS{mat} (\n{select}\n)"
    return f"""
WITH {pairs_cte},
per_purchase AS (
{gen_attribution_per_purchase(d)}
),
last_pick AS (
{gen_attribution_last_pick(d)}
)
{gen_attribution_rollup(d)}
""".strip()


def gen_lpa_edges(d: Dialect) -> str:
    """(u, t, w) weighted bipartite edge relation — the one events
    aggregate every LPA round reads.  Factored out so the Spark builder
    persists it (Spark inlines CTEs: the un-persisted form re-scanned
    events four times — plan-audit catch); the oracle materializes it."""
    uk = d.md5_key48("CAST(user_id AS STRING)", "lpau:")
    tk = d.md5_key48("event_type", "lpat:")
    return f"""
SELECT {uk} AS u, {tk} AS t, CAST(count(*) AS BIGINT) AS w
FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
GROUP BY {uk}, {tk}
""".strip()


def gen_lpa_communities(
    d: Dialect,
    sweeps: int = 1,
    edges_rel: str | None = None,
    labels_rels: tuple[str, str] | None = None,
) -> str:
    """Community detection by WEIGHTED LABEL PROPAGATION over the
    user x event-type bipartite graph (edge weight = event count per
    pair) — the graph-community plane beside PageRank/HITS (centrality)
    and connected components (reachability).

    Synchronous LPA oscillates on bipartite graphs (two-coloring flip —
    measured: the one-shot update collapses every node into one of two
    alternating labels by round 5), so the schedule is the bipartite-safe
    ALTERNATING sweep: users adopt their weighted-dominant type label,
    THEN types adopt their weighted-dominant user-community label — one
    full sweep = both half-rounds; updates never feed a node's own side.
    Ties break to the smallest label (argmax by sum DESC, lbl ASC);
    labels are md5_key48 node keys, so the whole fixed-``sweeps`` chain
    is deterministic and oracle-checkable.  One sweep is the interesting
    fixed point on dense graphs (dominant-type clustering); more sweeps
    merge clusters, the documented LPA coarsening behavior.

    Scale shape: each half-round is an equi-join of the edge relation
    with a label relation on the node key, a partial-combining (node,
    label) weight aggregate, and a PARTITION-BY-node rank — no global
    window, no driver state at all (unlike PageRank's bounded-model
    collect, the label relation stays distributed).  Output is community
    roll-ups: member counts per side + internal edge weight.
    """
    mat = " MATERIALIZED" if d.name == "duck" else ""
    e_cte = (
        f"e AS (SELECT u, t, w FROM {edges_rel})"
        if edges_rel
        else f"e AS{mat} (\n{gen_lpa_edges(d)}\n)"
    )
    parts = [e_cte]
    if labels_rels is not None:
        # r14 optimization: the Spark builder materializes the final
        # label relations (each is referenced 2× by the roll-up below,
        # and under CTE inlining every reference re-ran the whole sweep
        # chain of joins + windows); the oracle leaves this None.
        un_rel, tn_rel = labels_rels
        r = 1
        parts.append(f"un{r} AS (SELECT id, lbl FROM {un_rel})")
        parts.append(f"tn{r} AS (SELECT id, lbl FROM {tn_rel})")
        sweeps = 0  # skip the inline sweep chain
    else:
        parts.append("un0 AS (SELECT u AS id, u AS lbl FROM e GROUP BY u)")
        parts.append("tn0 AS (SELECT t AS id, t AS lbl FROM e GROUP BY t)")
        r = 0
    for _ in range(sweeps):
        r += 1
        parts.append(
            f"""un{r} AS (
  SELECT v AS id, lbl FROM (
    SELECT e.u AS v, l.lbl,
           row_number() OVER (PARTITION BY e.u
                              ORDER BY sum(e.w) DESC, l.lbl) AS rn
    FROM e JOIN tn{r - 1} l ON l.id = e.t
    GROUP BY e.u, l.lbl
  ) x WHERE rn = 1
)"""
        )
        r += 1
        parts.append(f"un{r} AS (SELECT id, lbl FROM un{r - 1})")
        parts.append(
            f"""tn{r} AS (
  SELECT v AS id, lbl FROM (
    SELECT e.t AS v, l.lbl,
           row_number() OVER (PARTITION BY e.t
                              ORDER BY sum(e.w) DESC, l.lbl) AS rn
    FROM e JOIN un{r - 1} l ON l.id = e.u
    GROUP BY e.t, l.lbl
  ) x WHERE rn = 1
)"""
        )
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT m.lbl AS community,
       CAST(sum(m.is_user) AS BIGINT) AS n_users,
       CAST(sum(1 - m.is_user) AS BIGINT) AS n_types,
       CAST(coalesce(iw.w_internal, 0) AS BIGINT) AS w_internal
FROM (
  SELECT lbl, 1 AS is_user FROM un{r}
  UNION ALL
  SELECT lbl, 0 AS is_user FROM tn{r}
) m
LEFT JOIN (
  SELECT ul.lbl, CAST(sum(e.w) AS BIGINT) AS w_internal
  FROM e
  JOIN un{r} ul ON ul.id = e.u
  JOIN tn{r} tl ON tl.id = e.t AND tl.lbl = ul.lbl
  GROUP BY ul.lbl
) iw ON iw.lbl = m.lbl
GROUP BY m.lbl, iw.w_internal
ORDER BY n_users DESC, community
""".strip()


def gen_scd2_history(d: Dialect) -> str:
    """Slowly-changing-dimension type-2 history of each user's *current
    event_type state*: consecutive same-type events collapse into one
    validity interval ``[valid_from_s, valid_to_s)``, the last interval per
    user is open (``valid_to_s`` NULL, ``is_current`` 1).  This is the
    warehouse-side dual of the reference's status tracking (storcrawl
    report.py keeps only the latest status row; SCD2 keeps the full
    dimension history a 100 TB lakehouse needs for as-of queries).

    Gaps-and-islands: a change flag per event (lag over the per-user
    timeline, tie-broken by event_id), a per-user prefix sum of flags as
    the run id, one aggregate per run, then lead() for the closing edge.

    100 TB shape: every window is PARTITION BY user_id (shuffle on
    user_id, no global sort until the bounded final ORDER BY); aggregates
    are partial-combining.  Runs ≤ events, so no operator state exceeds
    the per-user event list Spark already sorts within the shuffle.
    """
    es = d.epoch_s_events("ts")
    return f"""
WITH e0 AS (
  SELECT user_id, event_type, {es} AS ts_s, event_id
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
flg AS (
  SELECT user_id, event_type, ts_s, event_id,
         CASE WHEN lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts_s, event_id)
                   IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM e0
),
runs AS (
  SELECT user_id, event_type, ts_s, event_id,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flg
),
iv AS (
  SELECT user_id, run_id,
         min(event_type)          AS state,
         CAST(min(ts_s) AS BIGINT) AS valid_from_s,
         CAST(max(ts_s) AS BIGINT) AS last_seen_s,
         CAST(count(*) AS BIGINT)  AS n_events
  FROM runs
  GROUP BY user_id, run_id
)
SELECT user_id, state, valid_from_s,
       CAST(lead(valid_from_s) OVER (PARTITION BY user_id ORDER BY run_id)
            AS BIGINT) AS valid_to_s,
       last_seen_s, n_events,
       CASE WHEN lead(valid_from_s) OVER (PARTITION BY user_id
                                          ORDER BY run_id) IS NULL
            THEN 1 ELSE 0 END AS is_current
FROM iv
ORDER BY user_id, valid_from_s, state
""".strip()


def gen_cusum_changepoint(
    d: Dialect, h: float = 5.0, slack_pct: int = 10, hc_rel: str | None = None
) -> str:
    """CUSUM level-shift detection per event type: hourly buckets where
    the one-sided cumulative sum of (count - mean - slack) exceeds
    ``h`` standard deviations — the SUSTAINED-shift detector that
    complements :func:`gen_burst_windows`' point-anomaly z-score (a 1.5σ
    step that never spikes past z_hi is invisible to the z test but
    accumulates linearly in the CUSUM; Page 1954).

    The recursive form S_i = max(0, S_{i-1} + dev_i) is not relational,
    but its closed form is: S_i = P_i - min(0, min_{j<=i} P_j) where P
    is the prefix sum of deviations — two PARTITION-BY-type running
    windows, no recursion.  Deviations are kept on an exact BIGINT
    lattice (dev_i = 100*nb*n_i - (100 + slack_pct)*total, i.e. scaled
    by 100*nb) so the prefix sum, running min, and their difference are
    engine-exact; only the final division and the one correctly-rounded
    sqrt produce doubles, so the alarm threshold compares IDENTICAL
    doubles in both engines (same posture as gen_burst_windows).
    Slack is ``slack_pct`` percent OF THE MEAN per step (relative
    CUSUM) — rational, hence exact on the lattice; classic k*sigma
    slack would put an irrational inside the prefix sum.

    100 TB shape: one partial-combining (type, hour) count, a tiny
    per-type moment aggregate broadcast back, and the two running
    windows PARTITION BY event_type (shuffle on the type key, never a
    global sort).  Baseline is over OBSERVED buckets, matching the
    burst detector's frame.  The bucket counters are pure sums, so the
    relation is micro-batch-splittable — ``hc_rel`` substitutes the
    incrementally-maintained streaming counter table (the
    ``streaming_cusum_changepoint`` twin), finish identical.
    """
    es = d.epoch_s_events("ts")
    # dev on the 100*nb lattice; P and runmin inherit it
    dev = f"(100 * nb * n - (100 + {slack_pct}) * total)"
    var = "(CAST(nb AS DOUBLE) * ssq - CAST(total AS DOUBLE) * total)"
    sigma = f"(sqrt(CASE WHEN {var} < 0 THEN 0 ELSE {var} END) / nb)"
    cus = "(CAST(p - LEAST(0, mn) AS DOUBLE) / (100.0e0 * nb))"
    ratio = f"({cus} / nullif({sigma}, 0))"
    if hc_rel:
        hc_cte = f"hc AS (SELECT event_type, hb, n FROM {hc_rel})"
    else:
        hc_cte = f"""e0 AS (
  SELECT event_type, {d.idiv(f'({es})', '3600')} AS hb
  FROM events WHERE event_type IS NOT NULL
),
hc AS (
  SELECT event_type, hb, CAST(count(*) AS BIGINT) AS n
  FROM e0 GROUP BY event_type, hb
)"""
    return f"""
WITH {hc_cte},
st AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(n) AS BIGINT) AS total,
         CAST(sum(n * n) AS BIGINT) AS ssq
  FROM hc GROUP BY event_type
),
pf AS (
  SELECT h.event_type, h.hb, h.n, s.nb, s.total, s.ssq,
         sum({dev}) OVER (PARTITION BY h.event_type ORDER BY h.hb
                          ROWS UNBOUNDED PRECEDING) AS p
  FROM hc h JOIN st s ON h.event_type = s.event_type
),
cs AS (
  SELECT event_type, hb, n, nb, total, ssq, p,
         min(p) OVER (PARTITION BY event_type ORDER BY hb
                      ROWS UNBOUNDED PRECEDING) AS mn
  FROM pf
)
SELECT event_type, CAST(hb * 3600 AS BIGINT) AS bucket_start_s, n,
       {d.trunc6(cus)} AS cusum,
       {d.trunc6(ratio)} AS cusum_sigmas
FROM cs
WHERE {ratio} > {h}
ORDER BY event_type, bucket_start_s
""".strip()


def gen_mad_outliers(d: Dialect, z_cut: float = 3.5) -> str:
    """Robust per-type value outliers via the modified z-score (Iglewicz &
    Hoaglin 1993): 0.6745·(value − median)/MAD, flagged beyond ``z_cut``
    — the robust complement of mean/σ detectors (burst z, CUSUM): one
    real whale inflates a mean-based σ enough to hide the NEXT whale,
    while median/MAD don't move.

    Exactness: event values are multiples of 1/8 (exactly representable),
    so percentile_cont's interpolation arithmetic is exact and the
    median/MAD are bit-identical across engines (the
    gen_user_value_quantiles convention); the final ratio is the same
    double expression in both engines.  MAD = 0 types (constant values)
    emit nothing via the nullif guard — the standard MAD caveat,
    documented rather than patched.

    100 TB shape: two partial-combining per-type aggregates (median, then
    MAD over the broadcast-joined deviations) and one filtered scan —
    no windows, no global sort before the bounded final ORDER BY.
    """
    med = "percentile_cont(0.5) WITHIN GROUP (ORDER BY value)"
    madp = "percentile_cont(0.5) WITHIN GROUP (ORDER BY ad)"
    mz = "(0.6745e0 * (e.value - m.med) / nullif(md.mad, 0))"
    return f"""
WITH ev AS (
  SELECT event_id, event_type, value FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
),
m AS (
  SELECT event_type, {med} AS med FROM ev GROUP BY event_type
),
ad0 AS (
  SELECT e.event_type, abs(e.value - m.med) AS ad
  FROM ev e JOIN m ON e.event_type = m.event_type
),
md AS (
  SELECT event_type, {madp} AS mad FROM ad0 GROUP BY event_type
)
SELECT e.event_id, e.event_type, {d.trunc6('e.value')} AS value,
       {d.trunc6(mz)} AS robust_z
FROM ev e
JOIN m ON e.event_type = m.event_type
JOIN md ON e.event_type = md.event_type
WHERE abs({mz}) > {z_cut}
ORDER BY e.event_type, e.event_id
""".strip()


def gen_periodicity_acf(
    d: Dialect, lags: tuple[int, ...] = (24, 168), min_pairs: int = 24
) -> str:
    """Seasonality audit per event type: the lag-``k`` autocorrelation of
    the hourly count series at the daily (24) and weekly (168) lags — a
    feed with acf24 near 1 has a strong diurnal rhythm, near 0 is
    memoryless, negative alternates; the spectral complement of the
    dow-seasonality table (which asks WHICH day, this asks whether the
    period exists at all).

    ACF here is the Pearson correlation of paired observed buckets
    (n(t), n(t+k)) — buckets missing on either side of the lag simply
    form no pair ('pairwise-complete', documented; an absent hour is
    unobserved, not zero, matching the burst/CUSUM frame).  Exactness:
    counts are BIGINT, the correlation is assembled from exact integer
    sums (n, Σx, Σy, Σxy, Σx², Σy²) with one late division and one
    correctly-rounded sqrt per side — identical doubles in both engines
    (corr_audit discipline), nullif-guarded for constant series.

    100 TB shape: one partial-combining (type, hour) count, then a
    self-equi-join on (type, hb+k) per lag over the tiny bucket
    relation, and a per-(type, lag) moment aggregate.  No windows.
    """
    es = d.epoch_s_events("ts")
    num = "(CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    vx = "(CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    vy = "(CAST(np AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)"
    acf = (
        f"({num} / nullif(sqrt(CASE WHEN {vx} < 0 THEN 0 ELSE {vx} END) * "
        f"sqrt(CASE WHEN {vy} < 0 THEN 0 ELSE {vy} END), 0))"
    )
    blocks = []
    for k in lags:
        blocks.append(
            f"""SELECT x.event_type, CAST({k} AS BIGINT) AS lag_h,
       CAST(count(*) AS BIGINT) AS np,
       CAST(sum(x.n) AS BIGINT) AS sx, CAST(sum(y.n) AS BIGINT) AS sy,
       CAST(sum(x.n * y.n) AS BIGINT) AS sxy,
       CAST(sum(x.n * x.n) AS BIGINT) AS sxx,
       CAST(sum(y.n * y.n) AS BIGINT) AS syy
FROM hc x JOIN hc y ON x.event_type = y.event_type AND y.hb = x.hb + {k}
GROUP BY x.event_type"""
        )
    unioned = "\nUNION ALL\n".join(blocks)
    return f"""
WITH e0 AS (
  SELECT event_type, {d.idiv(f'({es})', '3600')} AS hb
  FROM events WHERE event_type IS NOT NULL
),
hc AS (
  SELECT event_type, hb, CAST(count(*) AS BIGINT) AS n
  FROM e0 GROUP BY event_type, hb
),
mom AS (
{unioned}
)
SELECT event_type, lag_h, np AS n_pairs, {d.trunc6(acf)} AS acf
FROM mom
WHERE np >= {min_pairs}
ORDER BY event_type, lag_h
""".strip()
