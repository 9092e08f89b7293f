"""Watermarked windowed rollup over an event stream — the canonical
Structured Streaming aggregation (tumbling/sliding event-time windows +
late-data watermark), the streaming twin of the batch events rollup.

Append output mode means a window row is emitted exactly ONCE, when the
watermark proves no in-horizon late event can still land in it — so the
emitted counts are FINAL and must equal the batch groupBy over the same
consumed input restricted to closed windows (pytest-asserted, including
a late-but-within-watermark event that lands in an earlier window from a
later micro-batch).

Scale shape: ONE keyed stateful shuffle (window × keys); state is
bounded by key cardinality × windows inside the watermark horizon —
never by stream lifetime (closed windows evict on emit). Map-side
partial aggregation does the heavy counting before the shuffle, exactly
like the batch plan.

The reference's analog is its per-batch JMX counters
(ref: src/main/java/org/elasticsearch/kafka/indexer/jmx — counts per
poll batch); this surfaces them as event-time-correct windows instead of
arrival-time batch boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_rollup_stream(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Per (event-time window × keys) rollup of a streaming DataFrame:
    ``(win_start, win_end, *keys, n[, sum_v])``. ``delay`` is the
    watermark — events later than it are dropped, anything inside it is
    correctly back-filled before the window closes. ``slide`` selects
    sliding windows (default: tumbling). Write with append output mode;
    each window row is final when emitted."""
    w = events.withWatermark(ts_col, delay)
    win = F.window(F.col(ts_col), window, slide or window)
    aggs = [F.count("*").cast("long").alias("n")]
    if value_col is not None:
        aggs.append(F.round(F.sum(F.col(value_col).cast("double")), 6).alias("sum_v"))
    return (
        w.groupBy(win.alias("win"), *[F.col(k) for k in keys])
        .agg(*aggs)
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *[F.col(k) for k in keys],
            *[F.col(c) for c in (["n"] + (["sum_v"] if value_col else []))],
        )
    )
