"""Watermarked windowed rollup (streaming/rollup.py): append-mode window
rows must be FINAL — equal to the batch groupBy over the consumed input
restricted to the closed windows — including a late (but within-
watermark) event back-filling an earlier window from a later micro-batch,
and each window emitted exactly once."""

from __future__ import annotations

import datetime as dt

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _rows(*specs):
    return [
        (int(eid), T0 + dt.timedelta(seconds=off), et, float(v))
        for eid, off, et, v in specs
    ]


# window = 60 s tumbling. F1 fills 12:00 and 12:01 windows; F2 adds a LATE
# event at offset 30 (12:00 window) plus 12:02 rows; sentinels push the
# watermark far past everything so all real windows close.
F1 = _rows((0, 0, "click", 1), (1, 10, "click", 2), (2, 70, "error", 3))
F2 = _rows((3, 30, "click", 4), (4, 130, "click", 5), (5, 140, "error", 6))
SENT1 = _rows((90, 10_000, "sent", 0))
SENT2 = _rows((91, 20_000, "sent", 0))


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_windowed_rollup_matches_batch_and_is_final(spark, tmp_path):
    from pyspark.sql import functions as F

    from kafka_elasticsearch_standalone_consumer_spark.streaming.rollup import (
        windowed_rollup_stream,
    )

    src, sink, ckpt = (str(tmp_path / p) for p in ("src", "roll", "ckpt"))
    for part in (F1, F2, SENT1, SENT2):
        _write(spark, part, src)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    roll = windowed_rollup_stream(
        stream, window="60 seconds", keys=("event_type",),
        value_col="value", delay="120 seconds",
    )
    q = (
        roll.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(sink).filter(F.col("event_type") != "sent").collect()
    # exactly once per (window, key)
    seen = [(r["win_start"], r["event_type"]) for r in got]
    assert len(seen) == len(set(seen))

    # batch truth over the same consumed input, same window fn
    batch = (
        spark.read.parquet(src)
        .filter(F.col("event_type") != "sent")
        .groupBy(F.window("ts", "60 seconds").alias("win"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum(F.col("value").cast("double")), 6).alias("sum_v"),
        )
        .select(
            F.col("win.start").alias("win_start"), "event_type", "n", "sum_v"
        )
        .collect()
    )
    want = {(r["win_start"], r["event_type"]): (r["n"], r["sum_v"]) for r in batch}
    got_m = {(r["win_start"], r["event_type"]): (r["n"], r["sum_v"]) for r in got}
    # every emitted window is final and correct — the late eid=3 event
    # (offset 30, arriving in batch 2) must be inside the 12:00 click count
    assert got_m == want
    assert got_m[(T0, "click")] == (3, 7.0)
