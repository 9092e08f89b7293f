"""Streaming sessionization — the `applyInPandasWithState` twin of
ops/sessions.py's batch definition (which is the semantics this must
match; tests/test_streaming_sessions.py asserts closed-session equality
over a replayed file stream).

Shape: one stateful shuffle keyed by the session key. Per-key state is
the OPEN tail only — the pending events whose session the watermark has
not yet sealed — plus the next session ordinal, so state is bounded by
(arrival rate × watermark horizon) per key, not by stream lifetime. A
session is emitted exactly once, when the watermark proves it can no
longer be extended: any event the operator will still accept has
``ts ≥ watermark > session_end + gap``, which by the gap rule starts a
new session. Out-of-order events inside the watermark are buffered and
re-sorted by ``(ts, id)`` before the gap test, so arrival order never
changes the result — the property that makes the batch twin an oracle.

The per-key ordinal counter survives after a key's sessions all close
(O(#keys) state, inherent to emitting per-key ordinals — drop the
ordinal if key cardinality is unbounded). Event-time timeouts close
sessions for keys with no new data as soon as the watermark passes
``end + gap``.

The reference has no session surface (its pipeline is a per-row map into
ES — MessageHandler.java:135-139); this is the log-analytics half of the
engine meeting Structured Streaming's state store.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_US = 1_000_000


def _micros(series: pd.Series) -> "pd.Series":
    return pd.Series(series.values.astype("datetime64[us]").astype("int64"))


def sessionize_stream(
    stream_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 3600,
    id_col: str = "event_id",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming inactivity-gap sessions: one output row per CLOSED
    session — ``(key, session_idx, n_events, start_ts, end_ts,
    duration_s)``, the exact schema and integer-microsecond arithmetic of
    ops/sessions.session_stats. ``delay`` is the watermark (late events
    beyond it are dropped by the state operator, Spark's contract)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_field = stream_df.schema[key_col]
    out_schema = StructType(
        [
            StructField(key_col, key_field.dataType),
            StructField("session_idx", LongType()),
            StructField("n_events", LongType()),
            StructField("start_ts", TimestampType()),
            StructField("end_ts", TimestampType()),
            StructField("duration_s", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("next_idx", LongType()),
            StructField("pend_us", ArrayType(LongType())),
            StructField("pend_ids", ArrayType(LongType())),
        ]
    )
    gap_us = int(gap_s) * _US

    def fn(key, pdfs, state: GroupState):
        next_idx, pend = (state.get[0], list(zip(state.get[1], state.get[2]))) if state.exists else (1, [])
        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf):
                    pend.extend(
                        (int(u), int(i))
                        for u, i in zip(_micros(pdf[ts_col]), pdf[id_col].astype("int64"))
                    )
        else:
            # timeout invocation consumes the (empty) iterator implicitly
            for _ in pdfs:
                pass
        pend.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        # split the pending run into gap-delimited sessions
        sessions: list[list[tuple[int, int]]] = []
        for ev in pend:
            if sessions and ev[0] - sessions[-1][-1][0] <= gap_us:
                sessions[-1].append(ev)
            else:
                sessions.append([ev])
        out = []
        while sessions and wm_us > sessions[0][-1][0] + gap_us:
            s = sessions.pop(0)
            start_us, end_us = s[0][0], s[-1][0]
            out.append(
                (
                    key[0],
                    int(next_idx),
                    len(s),
                    pd.Timestamp(start_us, unit="us"),
                    pd.Timestamp(end_us, unit="us"),
                    int((end_us - start_us) // _US),
                )
            )
            next_idx += 1
        tail = [ev for s in sessions for ev in s]
        state.update((next_idx, [e[0] for e in tail], [e[1] for e in tail]))
        if tail:
            # wake up when the watermark can seal the open session
            state.setTimeoutTimestamp(tail[-1][0] // 1000 + gap_s * 1000 + 1)
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    return (
        stream_df.withWatermark(ts_col, delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
