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


def turn_contexts(
    df: DataFrame,
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    k_prev: int = 3,
    sep: str = "\n",
) -> DataFrame:
    """Training-example context assembly over a keyed ordered log: for
    EVERY row, the concatenation of the previous ``k_prev`` texts of the
    same key plus its own, in order — the "turn + rolling context" unit
    an LLM fine-tuning pipeline feeds the tokenizer for multi-turn
    transcripts (key=conv_id, order=turn_idx) and a session-context
    feature for event logs (key=user_id, order=event_id).

    ``order_col`` must be unique per key (turn_idx / event_id are) — the
    window order is then total, so contexts are deterministic.

    Output: (key, order, n_ctx, context) where n_ctx counts the rows in
    the frame (≤ k_prev+1) and context joins them with ``sep``.

    Scale shape: ONE hash-partitioned window keyed by ``key_col`` — the
    same keyed-window plan as :func:`sessionize` (asserted in
    tests/test_plans.py), never a single partition, never a global sort.
    The frame duplicates each text ≤ k_prev+1 times AFTER the shuffle
    (the shuffle itself carries each row once); state per task is one
    key's rows."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(order_col))
        .rowsBetween(-int(k_prev), 0)
    )
    ctx = F.collect_list(F.col(text_col)).over(w)
    return df.select(
        key_col,
        order_col,
        F.size(ctx).cast("long").alias("n_ctx"),
        F.array_join(ctx, sep).alias("context"),
    )
