"""Custom stateful streaming operator: per-key deltas via
``applyInPandasWithState``.

The reference's status daemon derives rates as ``(counter_now − prev) /
interval`` from values it remembers between samples (storcrawl.py:503-512)
— per-key state carried across arrivals.  In Spark that is a stateful
streaming transformation: state = the key's last-seen (event_id, epoch),
output = one row per input event with its delta to the previous event of
the same key.  Batch equivalent: ``lag(epoch_s) OVER (PARTITION BY
event_type ORDER BY event_id)`` (plans/registry.gen_event_deltas).

Arrow-batched (pandas) on both sides of the state boundary — the rows of a
key arrive as pandas DataFrames, state is a tuple, output is pandas; no
row-at-a-time Python.  At scale the operator shuffles once on the key and
keeps O(1) state per key in the state store.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_id BIGINT, event_type STRING, epoch_s BIGINT, delta_s BIGINT"
STATE_SCHEMA = "last_id BIGINT, last_epoch BIGINT"


def _delta_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    last_id, last_epoch = state.get if state.exists else (None, None)
    for pdf in pdfs:
        if pdf.empty:
            continue
        pdf = pdf.sort_values("event_id")
        epochs = pdf["epoch_s"].astype("int64")
        prev = epochs.shift(1)
        deltas = epochs - prev
        if last_epoch is not None:
            deltas.iloc[0] = epochs.iloc[0] - last_epoch
        last_id = int(pdf["event_id"].iloc[-1])
        last_epoch = int(epochs.iloc[-1])
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"].astype("int64"),
                "event_type": event_type,
                "epoch_s": epochs,
                # pandas nullable Int64 keeps the first-row NULL delta
                "delta_s": deltas.astype("Int64"),
            }
        )
    state.update((last_id, last_epoch))


def per_key_deltas(events: DataFrame) -> DataFrame:
    """Streaming per-event_type time deltas (rate numerators).

    Expects the columns of :func:`streaming.events.read_events_stream`
    (``event_id``, ``event_type``, ``epoch_s``).  Exactly one output row
    per input row, so the driver's rows-only check is batch-split
    independent; exact value parity with the batch ``lag()`` plan holds
    when files arrive in event order (single-file sources, tests).
    """
    return (
        events.select("event_id", "event_type", "epoch_s")
        .groupBy("event_type")
        .applyInPandasWithState(
            _delta_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ANOMALY_OUTPUT_SCHEMA = (
    "window_start BIGINT, event_type STRING, n_events BIGINT, "
    "trail_mean DOUBLE, trail_std DOUBLE, z DOUBLE"
)
# ring of the last `trail` CLOSED windows + the currently-open window
ANOMALY_STATE_SCHEMA = "counts ARRAY<BIGINT>, cur_ws BIGINT, cur_n BIGINT"


def _trunc6(x: float) -> float:
    """Floor-truncate to 6 decimals — the exact semantics of the SQL
    trunc6 (CAST(floor(x*1e6) AS DOUBLE)/1e6), so streaming output values
    are bit-comparable with the batch plan's."""
    import math

    return math.floor(x * 1_000_000) / 1_000_000


def _anomaly_fn_factory(window_s: int, trail: int, z_thresh: float):
    def fn(key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState):
        (event_type,) = key
        counts, cur_ws, cur_n = (
            state.get if state.exists else ([], None, 0)
        )
        counts = list(counts)
        out_rows = []

        def close_window():
            nonlocal counts
            # evaluate the closing window against the trailing ring —
            # EXACTLY the batch plan's math: exact integer sums, then a
            # few IEEE double ops, sd floored at 1.0
            m = float(len(counts))
            if m >= 4:
                s1 = float(sum(counts))
                s2 = float(sum(c * c for c in counts))
                mean_n = s1 / m
                var_n = (s2 - s1 * s1 / m) / (m - 1)
                sd_eff = max(var_n**0.5, 1.0)
                if abs(cur_n - mean_n) >= z_thresh * sd_eff:
                    out_rows.append(
                        (cur_ws, event_type, cur_n, _trunc6(mean_n),
                         _trunc6(sd_eff), _trunc6((cur_n - mean_n) / sd_eff))
                    )
            counts = (counts + [cur_n])[-trail:]

        for pdf in pdfs:
            if pdf.empty:
                continue
            for epoch in pdf.sort_values("epoch_s")["epoch_s"].astype("int64"):
                ws = int(epoch) // window_s * window_s
                if cur_ws is None:
                    cur_ws, cur_n = ws, 1
                elif ws == cur_ws:
                    cur_n += 1
                elif ws > cur_ws:
                    close_window()
                    cur_ws, cur_n = ws, 1
                # ws < cur_ws: late event for an already-closed window —
                # dropped (the batch replay is the late-data-correct path)
        state.update((counts, cur_ws, cur_n))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["window_start", "event_type", "n_events",
                         "trail_mean", "trail_std", "z"],
            )

    return fn


def rate_anomaly_stream(
    events: DataFrame, window_s: int = 3600, trail: int = 6, z_thresh: float = 2.0
) -> DataFrame:
    """Streaming twin of the batch trailing-z detector
    (plans/registry.gen_rate_anomaly): per event_type, flag each CLOSING
    time window whose count deviates from the trailing ``trail``-window
    mean by ≥ ``z_thresh`` effective standard deviations (sd floored at
    1.0 — the count-noise floor; see the batch docstring).

    State per key is O(trail) BIGINTs (the ring of closed-window counts
    plus the open window) — the state store stays kilobytes per
    event_type forever.  A window only closes when a LATER window's first
    event arrives, so the trailing statistics see exactly the batch
    plan's "last ``trail`` OBSERVED windows" — the batch-parity pytest
    pins stream output == batch output minus each key's final window
    (which never closes in a finite stream).  Late events for closed
    windows are dropped here; the batch replay is the late-data-correct
    path — the standard lambda split, stated rather than hidden.
    """
    return (
        events.select("event_type", "epoch_s")
        .groupBy("event_type")
        .applyInPandasWithState(
            _anomaly_fn_factory(window_s, trail, z_thresh),
            outputStructType=ANOMALY_OUTPUT_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming twin of the batch conversion funnel (analytics.gen_funnel_steps)
# ---------------------------------------------------------------------------

FUNNEL_OUTPUT_SCHEMA = "user_id BIGINT, stage INT, t BIGINT"
# first qualifying time per stage; -1 = not reached (NOT 0: epoch 0 is a
# legitimate instant — a 0 sentinel would let a user re-emit stage 1 on a
# later view and double-count n_step1, r10 ADVICE)
FUNNEL_STATE_SCHEMA = "t1 BIGINT, t2 BIGINT, t3 BIGINT"


def _funnel_fn_factory(steps: tuple, max_lag_s: int):
    s1, s2, s3 = steps

    def fn(key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState):
        (user_id,) = key
        t1, t2, t3 = state.get if state.exists else (-1, -1, -1)
        out = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            # the funnel is order-sensitive: replay each user's arrivals in
            # event-time order (ties by event_id, the batch convention)
            pdf = pdf.sort_values(["epoch_s", "event_id"])
            for et, es in zip(pdf["event_type"], pdf["epoch_s"].astype("int64")):
                es = int(es)
                # first-qualifying-event semantics, exactly the batch CTEs:
                # re-entries don't help, late conversions fall outside the lag
                if t1 < 0 and et == s1:
                    t1 = es
                    out.append((user_id, 1, es))
                elif t1 >= 0 and t2 < 0 and et == s2 and t1 < es <= t1 + max_lag_s:
                    t2 = es
                    out.append((user_id, 2, es))
                elif t2 >= 0 and t3 < 0 and et == s3 and t2 < es <= t2 + max_lag_s:
                    t3 = es
                    out.append((user_id, 3, es))
        state.update((t1, t2, t3))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "stage", "t"])

    return fn


def funnel_stages_stream(
    events: DataFrame,
    steps: tuple = ("view", "click", "purchase"),
    max_lag_s: int = 86400,
) -> DataFrame:
    """Streaming twin of the batch funnel: per-user stage-completion
    events.  State per user is three BIGINTs (the first qualifying time of
    each stage) — O(1) forever; each stage emits AT MOST ONCE per user, so
    the downstream roll-up (count stage>=k) over the update-mode output
    equals the batch s1/s2/s3 memberships exactly.

    Exactness contract: per-user event-time order must hold across
    micro-batches (single-file sources / ordered arrival — the house
    caveat shared by per_key_deltas); an out-of-order step-1 arriving
    after a step-2 was evaluated is dropped here, while the batch replay
    is the late-data-correct path.
    """
    return (
        events.filter(F.col("user_id").isNotNull())
        .select("user_id", "event_id", "event_type", "epoch_s")
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_fn_factory(steps, max_lag_s),
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming twin of the batch multi-touch attribution matrix
# (analytics.gen_attribution_credit)
# ---------------------------------------------------------------------------

ATTR_OUTPUT_SCHEMA = (
    "pid BIGINT, channel BIGINT, linear_micro BIGINT, last_touch_micro BIGINT"
)
# ring of live clicks (older than window_s behind the clock are evicted);
# channel NULL is encoded as the sentinel below because state arrays are
# exchanged positionally
ATTR_STATE_SCHEMA = (
    "cids ARRAY<BIGINT>, tcs ARRAY<BIGINT>, chans ARRAY<BIGINT>, clock BIGINT"
)
_ATTR_NULL_CHAN = -(1 << 62)


def _attr_fn_factory(window_s: int):
    def fn(key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState):
        cids, tcs, chans, clock = (
            state.get if state.exists else ([], [], [], 0)
        )
        cids, tcs, chans = list(cids), list(tcs), list(chans)
        out = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["epoch_s", "event_id"])
            for eid, et, es, vm, chan in zip(
                pdf["event_id"].astype("int64"),
                pdf["event_type"],
                pdf["epoch_s"].astype("int64"),
                pdf["vm"],
                pdf["channel"],
            ):
                es = int(es)
                clock = max(clock, es)
                if et == "click":
                    cids.append(int(eid))
                    tcs.append(es)
                    chans.append(
                        _ATTR_NULL_CHAN if pd.isna(chan) else int(chan)
                    )
                    continue
                # purchase: credit the remembered clicks in (tp-window, tp)
                tp, pvm = es, int(vm)
                touch = [
                    i for i, tc in enumerate(tcs)
                    if tc < tp and tc >= tp - window_s
                ]
                if not touch:
                    continue
                n_clicks = len(touch)
                max_tc = max(tcs[i] for i in touch)
                last_cid = max(cids[i] for i in touch if tcs[i] == max_tc)
                for i in touch:
                    is_last = cids[i] == last_cid
                    out.append((
                        int(eid),
                        None if chans[i] == _ATTR_NULL_CHAN else chans[i],
                        pvm // n_clicks + (pvm % n_clicks if is_last else 0),
                        pvm if is_last else 0,
                    ))
            # evict clicks that can never touch a future purchase (future
            # tp >= clock under the in-order contract, and the window needs
            # tc >= tp - window_s) — state stays O(user activity in window)
            live = [i for i, tc in enumerate(tcs) if tc >= clock - window_s]
            cids = [cids[i] for i in live]
            tcs = [tcs[i] for i in live]
            chans = [chans[i] for i in live]
        state.update((cids, tcs, chans, clock))
        if out:
            yield pd.DataFrame(
                out,
                columns=["pid", "channel", "linear_micro", "last_touch_micro"],
            )

    return fn


def attribution_credit_stream(
    events: DataFrame, window_s: int = 86400, n_channels: int = 4
) -> DataFrame:
    """Streaming twin of the batch attribution matrix: per-user state is
    the ring of clicks still inside the look-back window (evicted as the
    per-user clock advances, so the state store holds O(clicks within
    window_s) per user, never the history); each arriving purchase credits
    the remembered touchpoints under BOTH models with the batch's exact
    integer accounting (floor split, remainder to the latest click,
    two-step argmax with event_id ties).

    Emits one credited row per (purchase, touching click); the channel
    roll-up over the update-mode output equals the batch matrix exactly
    under the per-user in-order arrival contract (see
    :func:`funnel_stages_stream`)."""
    prepped = (
        events.filter(F.col("user_id").isNotNull())
        .filter(
            ((F.col("event_type") == "purchase") & F.col("value").isNotNull())
            | ((F.col("event_type") == "click") & F.col("props").isNotNull())
        )
        .select(
            "user_id",
            "event_id",
            "event_type",
            "epoch_s",
            F.floor(F.col("value") * 1_000_000).cast("long").alias("vm"),
            (
                F.get_json_object("props", "$.k").cast("long") % n_channels
            ).alias("channel"),
        )
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _attr_fn_factory(window_s),
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
