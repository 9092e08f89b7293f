"""Streaming sessionization (streaming/sessions.py): closed sessions
emitted by the applyInPandasWithState operator must equal the batch
session_stats over the consumed input — including a late (but within-
watermark) event that back-fills an earlier session from a later
micro-batch, and sessions sealed purely by event-time TIMEOUT (the final
batches carry no rows for the real keys)."""

from __future__ import annotations

import datetime as dt


T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _rows(*offsets_by_user):
    rows = []
    for user, eid, off_s in offsets_by_user:
        rows.append((int(user), int(eid), T0 + dt.timedelta(seconds=off_s)))
    return rows


SCHEMA = "user_id long, event_id long, ts timestamp"
GAP = 60

F1 = _rows((1, 10, 0), (1, 11, 10), (1, 13, 30), (2, 20, 5))
#      late back-fill ↓ for user1 session 1 (arrives a batch later)
F2 = _rows((1, 12, 20), (1, 14, 200), (1, 15, 210), (2, 21, 300))
SENT1 = _rows((99, 90, 10_000))
SENT2 = _rows((99, 91, 20_000))


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_stream_sessions_match_batch(spark, tmp_path):
    from kafka_elasticsearch_standalone_consumer_spark.ops.sessions import session_stats
    from kafka_elasticsearch_standalone_consumer_spark.streaming.sessions import (
        sessionize_stream,
    )

    src, sink, ckpt = (str(tmp_path / p) for p in ("src", "sessions", "ckpt"))
    for part in (F1, F2, SENT1, SENT2):
        _write(spark, part, src)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    sessions = sessionize_stream(stream, gap_s=GAP, delay="400 seconds")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    def key(r):
        return (
            r["user_id"],
            r["session_idx"],
            r["n_events"],
            r["start_ts"],
            r["end_ts"],
            r["duration_s"],
        )

    got = sorted(key(r) for r in spark.read.parquet(sink).collect())
    batch_in = spark.createDataFrame(F1 + F2, SCHEMA)
    want = sorted(key(r) for r in session_stats(batch_in, gap_s=GAP).collect())
    assert got == want and len(got) == 4
    # the late event landed inside user1's FIRST session, not a new one
    by = {(r[0], r[1]): r for r in got}
    assert by[(1, 1)][2] == 4 and by[(1, 1)][5] == 30
    assert by[(1, 2)][2] == 2 and by[(2, 1)][2] == 1 and by[(2, 2)][2] == 1
    # sentinel sessions stay open (watermark never passes their end + gap)
    assert not any(r[0] == 99 for r in got)
