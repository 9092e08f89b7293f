"""Inactivity-gap sessionization over event streams — the standard prep
step for agent/interaction logs before behavioral analytics or
training-episode extraction (group a user's events into sessions split
wherever the inter-event silence exceeds a gap).

The reference has no session surface (its pipeline is a per-row map into
ES — MessageHandler.java:135-139); this belongs to the log-analytics half
of the engine, next to the events rollup.

Scale shape: ONE hash-partitioned window keyed by the session key (a
shuffle by user — never a global sort, never a single partition: the
WindowExec partitions by key), then the rollup's groupBy rides a second
keyed shuffle with map-side partial aggregation. Skewed power-users are
AQE-splittable on the groupBy side; the window side is bounded by one
user's events per task. All arithmetic is integer microseconds
(``unix_micros`` / DuckDB ``epoch_us``), so the gap test and durations
are engine-exact, no float drift.

A streaming twin would be ``applyInPandasWithState`` with the gap as the
state timeout — the batch definition here is the semantics it must match
(see streaming/dedup.py for the engine's watermarked-state pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 3600,
    id_col: str = "event_id",
) -> DataFrame:
    """The input rows plus a per-key ``session_idx`` (1-based): a new
    session starts at the first event and wherever the gap since the
    previous event (same key, ordered by ``(ts, id)`` — the id breaks
    timestamp ties deterministically) exceeds ``gap_s`` seconds. The
    running sum of session starts over the same ordering is the session
    ordinal."""
    # NTZ-safe: cast to TIMESTAMP for unix_micros — a session-timezone
    # offset is a constant, so gaps, durations, and orderings are
    # unaffected by it
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(us, F.col(id_col))
    prev = F.lag(us).over(w)
    new_s = F.when(
        prev.isNull() | ((us - prev) > int(gap_s) * 1_000_000), 1
    ).otherwise(0)
    return events.withColumn("session_idx", F.sum(new_s).over(w).cast("long"))


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 3600,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-session rollup of :func:`sessionize`: (key, session_idx,
    n_events, start_ts, end_ts, duration_s) — duration in whole seconds
    by integer-microsecond floor division, so the DuckDB oracle's
    ``epoch_us(...) // 1000000`` matches exactly."""
    s = sessionize(events, key_col, ts_col, gap_s, id_col)
    return s.groupBy(key_col, "session_idx").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        # integer microsecond floor-division — no float path at all
        F.expr(
            f"(unix_micros(CAST(max({ts_col}) AS TIMESTAMP))"
            f" - unix_micros(CAST(min({ts_col}) AS TIMESTAMP)))"
            " DIV 1000000"
        )
        .cast("long")
        .alias("duration_s"),
    )
