"""Custom stateful streaming operator: watermark-bounded LWW change filter.

``streaming_lww_filter`` turns a raw at-least-once change stream into a
*state-advancing* stream: per key it remembers the highest ``(warc_ts,
offset)`` sequence seen and emits a row only when an incoming event advances
it. Duplicate deliveries, within-trigger losers, and stale out-of-order
updates are all absorbed before they reach the sink — the streaming-native
form of the engine's LWW dedup (SURVEY §2.6 W1) and of the reference's
hash/sequence change gate (``boxing/database/metadata.py:57-69``).

Built on ``applyInPandasWithState`` (Arrow-vectorized per-group state — no
row-at-a-time Python): state per key is just the two sequence numbers, and
the event-time timeout expires state once the watermark passes it, so state
size is bounded by the number of keys active inside the watermark window —
the "watermark on warc_ts bounding the LWW dedup state" requirement from
BASELINE.json, independent of total stream length.

Downstream, the emitted stream feeds the same ``foreachBatch`` MERGE; the
merge's own dedup+ledger still make redelivery safe.

Lateness contract (the price of bounded state): with a watermark, Spark
drops input events whose ``ts`` is older than the watermark *before* this
operator sees them. An event arriving later than the configured delay is
therefore not applied at all — whereas the unfiltered batch/merge path,
which keeps no state, would still LWW-resolve it. Use a watermark at least
as large as the source's worst-case disorder (the generator's jitter is
±5 min vs the 10-min default here); with that sizing, the filtered and
unfiltered paths converge to the same state (tests/test_stateful_stream.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("best_ts", T.LongType()),  # microseconds since epoch
        T.StructField("best_offset", T.LongType()),
    ]
)


def streaming_lww_filter(
    stream: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    offset_col: str = "offset",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful change-only filter over a keyed change stream.

    Emits, per trigger and key, the rows that strictly advance the key's
    ``(ts, offset)`` high-water sequence (in ascending order when several
    advance within one trigger). Requires an event-time watermark on
    ``ts_col`` — it both bounds state (timeout cleanup) and defines how late
    an event may arrive, per SURVEY §2.10.
    """
    out_schema = stream.schema
    if ts_col not in [f.name for f in out_schema.fields]:
        raise ValueError(f"{ts_col!r} not in stream schema {out_schema.simpleString()}")

    def fn(key_tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        best_ts, best_off = state.get if state.exists else (-1, -1)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values([ts_col, offset_col], kind="mergesort").reset_index(drop=True)
        ts_us = pdf[ts_col].astype("datetime64[us]").astype("int64")  # unit-stable µs
        off = pdf[offset_col].astype("int64")
        # sorted ascending ⇒ the running prefix max is just the previous row:
        # a row advances the sequence iff it differs from its predecessor and
        # beats the carried state. Pure vector ops — no per-row Python.
        dup_prev = (ts_us.shift() == ts_us) & (off.shift() == off)
        gt_state = (ts_us > best_ts) | ((ts_us == best_ts) & (off > best_off))
        mask = (~dup_prev.fillna(False)) & gt_state
        if mask.any():
            new_ts = int(ts_us.iloc[-1])
            new_off = int(off.iloc[-1])
            state.update((new_ts, new_off))
            # expire state once the watermark passes an hour beyond the best
            # event time — bounds state to keys active in the window. Clamped
            # above the current watermark: for a key whose latest event is
            # already older than the watermark the timeout must still be in
            # the engine's future, or Spark rejects it.
            timeout_ms = max(
                new_ts // 1000 + 3_600_000,
                state.getCurrentWatermarkMs() + 60_000,
            )
            state.setTimeoutTimestamp(timeout_ms)
            yield pdf[mask]

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
