"""Streaming trending-terms monitor: per-tumbling-window Misra–Gries —
closed windows emit FINAL top-k rows (est ≤ true ≤ est + bound; exact in
the capacity ≥ vocabulary regime), late rows are dropped and counted,
open windows emit nothing until the watermark passes, and replays
re-emit the closure ledger without re-merging."""

from __future__ import annotations

import datetime as dt

from kafka_elasticsearch_standalone_consumer_spark.streaming.trending import (
    trending_stream_writer,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _run(spark, src, state, metrics, ck, capacity=64):
    stream = (
        spark.readStream.schema("ts timestamp, value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        trending_stream_writer(
            spark,
            stream,
            "ts",
            "value",
            state,
            metrics,
            ck,
            window="10 minutes",
            delay="2 minutes",
            k=3,
            capacity=capacity,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_trending_windows_close_exact_and_replay(spark, tmp_path):
    def at(minute, second=0):
        return T0 + dt.timedelta(minutes=minute, seconds=second)

    # window [0,10): a=3, b=2, c=1 ; window [10,20): b=4, d=1
    b0 = (
        [(at(1), "a")] * 3
        + [(at(2), "b")] * 2
        + [(at(3), "c")]
        + [(at(11), "b")] * 4
        + [(at(12), "d")]
    )
    # batch 1: max ts 32 min -> watermark 30 -> closes [0,10) AND [10,20);
    # includes ONE late row for [0,10) (late vs the post-batch watermark)
    b1 = [(at(31), "e")] * 2 + [(at(32), "e")] + [(at(4), "a")]
    src = str(tmp_path / "src")
    spark.createDataFrame(b0, "ts timestamp, value string").coalesce(1).write.parquet(src)
    spark.createDataFrame(b1, "ts timestamp, value string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    state, metrics, ck = (str(tmp_path / x) for x in ("state", "metrics", "ck"))
    _run(spark, src, state, metrics, ck)

    m = spark.read.parquet(metrics).collect()
    by_batch: dict = {}
    for r in m:
        by_batch.setdefault(r["batch_id"], []).append(
            (r["window_start"], r["rank"], r["value"], r["est"], r["bound"])
        )
    MIN = 60 * 1_000_000
    w0 = min(r["window_start"] for r in m)  # absolute epoch micros of T0's window
    w1 = w0 + 10 * MIN
    # batch 0: watermark = 12min - 2min = exactly the first window's end
    # -> [0,10) closes ALREADY in batch 0 with EXACT finals (capacity 64
    # >> vocab -> bound 0)
    assert sorted(by_batch[0]) == [
        (w0, 1, "a", 3, 0),
        (w0, 2, "b", 2, 0),
        (w0, 3, "c", 1, 0),
    ]
    # batch 1 advances the watermark to 30min and closes [10,20); the
    # late 'a' row never lands in the already-closed [0,10)
    assert sorted(by_batch[1]) == [
        (w1, 1, "b", 4, 0),
        (w1, 2, "d", 1, 0),
    ]
    # the late row was counted
    from kafka_elasticsearch_standalone_consumer_spark.streaming.trending import (
        _read_state,
        _state_versions,
    )

    wins, wm_us, late, _ = _read_state(state, _state_versions(state)[-1])
    assert late == 1
    assert wm_us == w0 + 30 * MIN
    # the [30,40) window is still open in state
    assert set(wins) == {w0 + 30 * MIN}
    assert wins[w0 + 30 * MIN]["counters"] == {"e": 3}

    # replay with a fresh checkpoint: closures re-emit identically from
    # the ledger, state not re-merged
    _run(spark, src, state, metrics, str(tmp_path / "ck2"))
    m2 = spark.read.parquet(metrics).collect()
    assert sorted(map(tuple, m2)) == sorted(map(tuple, m))
    wins2, _, late2, _ = _read_state(state, _state_versions(state)[-1])
    assert wins2 == wins and late2 == late


def test_trending_pre_epoch_windows_floor_align(spark, tmp_path):
    """Pre-1970 event times land in FLOOR-aligned windows: integer ``div``
    truncates toward zero, which would shift 1969-12-31T23:55 into the
    epoch window [00:00, 00:10) and misalign window boundaries with the
    watermark-close arithmetic; the pmod floor keeps the promised
    'integer floor of event-time micros' for negative micros too."""
    t_neg = dt.datetime(1969, 12, 31, 23, 55, 0)
    b0 = [(t_neg, "x")] * 2
    b1 = [(dt.datetime(1970, 1, 1, 1, 0, 0), "y")]  # closes the 1969 window
    src = str(tmp_path / "src")
    spark.createDataFrame(b0, "ts timestamp, value string").coalesce(1).write.parquet(src)
    spark.createDataFrame(b1, "ts timestamp, value string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    state, metrics, ck = (str(tmp_path / x) for x in ("state", "metrics", "ck"))
    _run(spark, src, state, metrics, ck)
    m = spark.read.parquet(metrics).collect()
    MIN = 60 * 1_000_000
    closed = {(r["window_start"], r["value"], r["est"]) for r in m}
    # 23:55 floors to the [-10min, 0) window, NOT to [0, +10min)
    assert (-10 * MIN, "x", 2) in closed
    assert not any(ws == 0 for ws, _v, _e in closed)


def test_trending_tight_capacity_keeps_mg_contract(spark, tmp_path):
    def at(minute, second=0):
        return T0 + dt.timedelta(minutes=minute, seconds=second)

    # one window with a skewed vocabulary far over capacity=4, then a
    # closer batch; the heavy value must survive with est <= true <= est+bound
    b0 = [(at(1, i % 50), "hot") for i in range(60)] + [
        (at(2, i % 55), f"t{i:03d}") for i in range(40)
    ]
    b1 = [(at(31), "x")]
    src = str(tmp_path / "src")
    spark.createDataFrame(b0, "ts timestamp, value string").coalesce(2).write.parquet(src)
    spark.createDataFrame(b1, "ts timestamp, value string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    state, metrics, ck = (str(tmp_path / x) for x in ("state", "metrics", "ck"))
    _run(spark, src, state, metrics, ck, capacity=4)

    m = spark.read.parquet(metrics).collect()
    assert m, "the early window must have closed"
    top = {r["value"]: (r["est"], r["bound"]) for r in m}
    assert "hot" in top, "the heavy value must survive a tight sketch"
    est, bound = top["hot"]
    assert est <= 60 <= est + bound
