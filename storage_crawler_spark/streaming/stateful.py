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
