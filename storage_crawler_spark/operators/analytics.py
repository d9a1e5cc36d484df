"""Behavioral analytics over the ``events`` stream (batch plane).

The reference's event table feeds rate/summary reports
(/root/reference/storage_crawler/report.py:59-96); this module adds the
standard product-analytics derivatives a warehouse team would run on the
same table — cohort retention here, sessionization and funnels in
streaming/.  All are generated per dialect so the DuckDB oracle runs the
semantically identical query.
"""

from __future__ import annotations

from storage_crawler_spark.plans.dialect import Dialect

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
