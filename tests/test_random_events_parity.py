"""Randomized Spark-vs-DuckDB parity for the events plane.

The events-backed entries carry the most tie-prone semantics in the repo —
the as-of join's at-or-before with equal timestamps, the range join's
inclusive window edges, the status argmax, session gap merging — and the
fixed testdata exercises one draw of them.  These tests synthesize seeded
random events tables with DELIBERATE collisions (same user+timestamp,
duplicate purchase instants, unknown event types, NULL values) into a tmp
dir shaped like an sf_dir, then run the REAL registry builders and their
DuckDB oracles unmodified on it.

The timestamp column is written as microsecond parquet (what the driver
currently ships); the schema-adaptive normalization is therefore also
exercised on data the fixture never saw.
"""

from __future__ import annotations

import json
import random

import pytest

from parity_util import assert_parity

from storage_crawler_spark.plans import registry

EVENT_ENTRIES = [
    "report_status_full",
    "report_status_events",
    "report_status_averages",
    "report_status_brief",
    "window_event_deltas",
    "window_moving_avg",
    "rollup_events_daily",
    "events_json_props",
    "join_asof_events",
    # forward direction: same-instant inclusivity on pooled ties, mirrored
    "join_asof_forward_events",
    # RANGE-frame expiry: pooled instants land right rows exactly at the
    # tolerance lower bound (value-inclusive in both engines)
    "join_asof_tolerance_events",
    "events_interarrival_quantiles",
    "join_range_events",
    "streaming_window_counts",
    "streaming_session_counts",
    "streaming_attribution_join",
    "streaming_dedup",
    "streaming_user_sessions",
    # trailing-z anomaly: pooled-instant ties stress the exact-integer
    # trailing stats and the cross-engine threshold decisions
    "window_rate_anomaly",
    # cohort weeks from integer epoch floor-division: pooled instants give
    # same-user duplicate (user, week) rows the DISTINCT must collapse
    "events_cohort_retention",
    # windowed funnel: pooled instants create exact window-edge ties
    # (es = t + window) and same-second step completions in both engines
    "events_funnel_conversion",
    # trailing-window DISTINCT: weeks with partial overlap across the 7-day
    # span; the range join must agree on inclusive edges
    "events_stickiness",
    # lead() tie order on pooled instants is the whole test here
    "events_transition_matrix",
    # integer day/hour bucketing on pooled instants; exact sum/sum-sq cells
    "events_hourly_profile",
    # island keys on pooled instants: same-day duplicate events collapse
    "events_user_streaks",
    # NULL values coalesce to 0; percentile interpolation on exact sums
    "events_user_value_quantiles",
    # distinct (user, type) first; pooled instants create duplicate events
    # the DISTINCT must collapse before the pair join
    "events_type_affinity",
    # exact-moment OLS: NULL values floor to 0 on the 1/8 lattice; pooled
    # instants create multi-event days the daily pre-agg must sum exactly
    "events_value_trend",
    # sessionization islands on pooled instants (zero-gap events share a
    # session; same-second tie order pinned by event_id)
    "events_session_stats",
    # round-8 additions
    # fixed-k lattice PageRank: pooled instants stress lead() tie order in
    # the edge construction; NULL users/types drop identically
    "events_pagerank",
    # frozen-parity cohorts on random users; NULL values don't reach the
    # proportion; arm emptiness yields NULL z in both engines
    "events_ab_test",
    # deterministic count-min: random user multisets must give identical
    # counters and min-estimates; ties at est_n break by user_id
    "sketch_heavy_hitters",
    # streaming twin of the sketch: micro-batched counters vs the one-shot
    # oracle on random streams
    "streaming_cms_hitters",
    # HITS half-steps on random graphs: dangling/sourceless types hit the
    # coalesce-0 paths; normalization guard on all-zero rounds
    "events_hits",
    # round-7 events entries that predate this battery: sweep-line
    # concurrency on pooled-instant interval edges; dow indexes on
    # partial final weeks; zorder ntile ties on pooled instants (NULL
    # users dropped identically per the r7 ADVICE fix)
    "events_session_concurrency",
    # Holt fold: pooled instants collapse to same-day counts; single-day
    # types, NULL-type exclusion, negative-trend sign-split divisions
    "events_holt_trend",
    "events_dow_seasonality",
    "lake_zorder_layout",
    # r11 zone-map skipping audit: pooled-instant epoch ties exercise the
    # ntile (epoch, event_id) tie order; NULL ts/value rows drop at the
    # scan; negative/pooled money routes through DECIMAL cents
    "lake_file_skipping",
    # r11 deterministic HLL pair: random user pools sweep both estimator
    # branches (linear counting vs raw) and NULL users/types; the
    # streaming twin's register maxima must hash-match the one-shot chain
    "sketch_hll_distinct",
    "streaming_hll_distinct",
    # r11 DD-sketch pair: random NULL/zero/negative pooled money sweeps
    # the mirrored negative store, the zero bucket, and sub-octave edges
    "sketch_dd_quantiles",
    "streaming_dd_quantiles",
    # r11 KMV overlap: random user pools give partial-overlap pairs,
    # unsaturated sketches (exact-arithmetic branch) and NULL users/types
    "sketch_kmv_overlap",
    # r11c AMS F2 pair: random user pools sweep skewed/uniform frequency
    # vectors and NULL users/types; the streaming twin's signed sums must
    # hash-match the one-shot chain
    "sketch_ams_f2",
    "streaming_ams_f2",
    # round-9 additions: windowed funnel chaining on pooled-instant ties
    # (es > t1 strictness), triangle joins on NULL-pruned type pairs,
    # Benford's integer-side digit on NULL/zero/negative values, burst
    # z-threshold on exact moments over sparse random buckets
    "events_funnel_steps",
    "events_type_triangles",
    "events_benford_audit",
    "events_burst_windows",
    # epoch-week cohorts: users with no signup event are uncohorted; pooled
    # instants collapse to shared weeks; offset-0 cells must be complete
    "events_retention_cohorts",
    # micro-unit attribution: NULL users/values/props, same-instant click
    # ties (two-step argmax), purchases with no window clicks
    "events_attribution_credit",
    # r9 bipartite LPA: random graphs stress weighted-argmax ties on
    # equal edge counts (smallest-md5-label break) and NULL user/type
    # exclusion; the whole alternating chain must agree bit for bit
    "events_lpa_communities",
    # SCD2 gaps-and-islands: pooled instants force the lag/lead tie-break
    # on event_id; single-event users; NULL user/type exclusion
    "events_scd2_history",
    # CUSUM closed form on random sparse buckets: zero-variance types hit
    # the nullif sigma guard; exact-lattice prefix sums must agree
    "events_cusum_changepoint",
    # its streaming twin rides the micro-batched counters against the
    # same one-shot oracle
    "streaming_cusum_changepoint",
    # MAD modified z: random 1/8-lattice values with NULLs; constant-value
    # types hit the MAD=0 nullif guard in both engines
    "events_mad_outliers",
    # ACF: random sparse buckets -> ragged lag pairing; constant and
    # near-constant types hit the zero-variance NULL guard identically
    "events_periodicity_acf",
    # streaming_event_deltas is rows-only (stateful applyInPandasWithState,
    # no SQL oracle) — covered by tests/test_streaming.py instead
    # r10 stateful twins: per-user funnel stage state and the click-ring
    # attribution credit replayed over random streams (pooled instants,
    # NULL users/values/props, same-instant click ties) against the
    # one-shot batch oracles
    "streaming_funnel_steps",
    "streaming_attribution_credit",
]


def _random_events(seed: int, n: int = 300) -> "pd.DataFrame":  # noqa: F821
    import pandas as pd

    rng = random.Random(seed)
    base = 1_704_000_000  # 2024-01-01-ish, matches the fixture's era
    types = ["click", "view", "purchase", "signup", "error", "mystery"]
    rows = []
    # 35-day span: the week-granular entries (cohort offsets, trailing
    # MAU, streak islands) need multi-week structure; the pooled instants
    # below still create the same-second ties the join planes stress
    ts_pool = [base + rng.randrange(0, 35 * 86_400) for _ in range(n // 3)]
    for event_id in range(n):
        # ~5% NULL users: the schema allows them, and the r7 zorder ADVICE
        # showed NULL-key ordering is exactly where engines diverge —
        # every entry must either filter or handle them identically
        user_id = None if rng.random() < 0.05 else rng.randrange(12)
        # ~3% NULL event_type: same NULL-key class as user_id
        event_type = None if rng.random() < 0.03 else rng.choice(types)
        # a third of events reuse pooled instants → same-user same-ts ties,
        # duplicate purchase instants (as-of tie break), shared window edges
        ts_s = rng.choice(ts_pool) if rng.random() < 0.33 else base + rng.randrange(0, 35 * 86_400)
        value = None if rng.random() < 0.1 else rng.randrange(0, 8000) / 8
        props = json.dumps({"k": rng.randrange(0, 1000)}) if rng.random() < 0.9 else json.dumps({})
        rows.append((event_id, pd.Timestamp(ts_s, unit="s"), user_id, event_type, value, props))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    # nullable Int64: plain int64 silently coerces to float64 under None,
    # writing NaN DOUBLES (not NULLs!) to parquet — the NULL-user rows
    # would then pass IS NOT NULL filters as real NaN keys
    pdf["user_id"] = pd.array(pdf["user_id"], dtype="Int64")
    return pdf


@pytest.fixture(scope="module", params=[3, 19])
def events_sf_dir(request, tmp_path_factory):
    pdf = _random_events(request.param)
    d = tmp_path_factory.mktemp("revents")
    pdf.to_parquet(str(d / "events.parquet"), index=False)
    return str(d)


@pytest.mark.parametrize("name", EVENT_ENTRIES)
def test_random_events_parity(spark, events_sf_dir, name):
    spec = registry.get_query(name)
    assert_parity(
        spec.builder(spark, events_sf_dir),
        spec.oracle,
        {"events": f"{events_sf_dir}/events.parquet"},
        name,
    )
