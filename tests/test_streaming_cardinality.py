"""Streaming HLL cardinality monitor: max-merged registers across
micro-batches — the final stream-so-far estimate is BIT-identical to
the batch sketch over the union of all batches (register max-merge is
exact and the driver-side estimator mirrors hll_cardinality's
arithmetic), and replay never re-merges."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.streaming.cardinality import (
    hll_estimate_from_registers,
    hll_stream_writer,
)


def _run(spark, src, state, metrics, ck, p=7):
    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        hll_stream_writer(spark, stream, "value", state, metrics, ck, p=p)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_stream_hll_matches_batch_and_replays(spark, tmp_path):
    from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import (
        hll_cardinality,
        hll_registers,
    )

    b0 = [(f"u{i:05d}",) for i in range(400)] + [("hot",)] * 50 + [(None,)]
    b1 = [(f"u{i:05d}",) for i in range(200, 700)] + [("hot",)] * 20
    src = str(tmp_path / "src")
    spark.createDataFrame(b0, "value string").coalesce(1).write.parquet(src)
    spark.createDataFrame(b1, "value string").coalesce(1).write.mode("append").parquet(src)
    state, metrics, ck = (str(tmp_path / x) for x in ("state", "metrics", "ck"))
    _run(spark, src, state, metrics, ck)

    m = {r["batch_id"]: r for r in spark.read.parquet(metrics).collect()}
    assert set(m) == {0, 1}

    # final estimate == the BATCH sketch over the whole stream, BIT-identical
    union = spark.read.parquet(src).filter(F.col("value").isNotNull())
    want = hll_cardinality(union, "value", p=7).collect()[0]
    assert m[1]["est_r"] == want["est_r"]
    assert m[1]["reg_zeros"] == want["reg_zeros"]
    # registers in state == batch registers over the union (max-merge law)
    from kafka_elasticsearch_standalone_consumer_spark.streaming.cardinality import (
        _read_state,
        _state_versions,
    )

    reg, n_seen = _read_state(state, _state_versions(state)[-1])
    want_reg = {r["j"]: r["rho"] for r in hll_registers(union, "value", p=7).collect()}
    assert reg == want_reg
    # n_seen counts non-NULL items exactly; the estimate is in the right
    # ballpark of the true 701 distinct (HLL error ~9% at p=7)
    assert n_seen == len(b0) - 1 + len(b1)
    assert abs(m[1]["est_r"] - 701) / 701 < 0.25
    # mid-stream snapshot covers only batch 0, so its estimate is smaller
    assert m[0]["est_r"] < m[1]["est_r"]
    assert m[0]["n_seen"] == len(b0) - 1

    # the driver-side estimator twin agrees with the batch op on its own
    assert hll_estimate_from_registers(reg, 7) == (want["est_r"], want["reg_zeros"])

    # replay: fresh checkpoint, same state/metrics -> both versions exist,
    # the handler re-emits without re-merging
    _run(spark, src, state, metrics, str(tmp_path / "ck2"))
    m2 = {r["batch_id"]: r for r in spark.read.parquet(metrics).collect()}
    assert {b: tuple(r) for b, r in m2.items()} == {b: tuple(r) for b, r in m.items()}
