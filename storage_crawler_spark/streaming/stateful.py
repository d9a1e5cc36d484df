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
