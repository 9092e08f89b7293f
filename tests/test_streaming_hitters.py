"""Streaming frequent-terms monitor: Misra–Gries state across
micro-batches — exact when capacity covers the vocabulary, honest
est/bound contract when it doesn't, and replay never double-counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.streaming.hitters import (
    heavy_hitters_stream_writer,
)


def _run(spark, src, state, metrics, ck, k, capacity):
    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        heavy_hitters_stream_writer(
            spark, stream, "value", state, metrics, ck, k=k, capacity=capacity
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_stream_topk_exact_when_capacity_covers_vocab(spark, tmp_path):
    # two files -> two micro-batches; strictly decreasing frequencies
    rows = [(f"v{i:03d}",) for i in range(50) for _ in range(100 - i)]
    src = str(tmp_path / "src")
    df = spark.createDataFrame(rows, "value string")
    df.coalesce(1).write.parquet(src)
    df.coalesce(1).write.mode("append").parquet(src)
    state, metrics, ck = (str(tmp_path / d) for d in ("state", "metrics", "ck"))
    _run(spark, src, state, metrics, ck, k=5, capacity=512)

    m = spark.read.parquet(metrics).collect()
    by_batch = {}
    for r in m:
        by_batch.setdefault(r["batch_id"], []).append(r)
    assert set(by_batch) == {0, 1}
    final = sorted(by_batch[max(by_batch)], key=lambda r: r["rank"])
    # capacity 512 > vocab 50: no reduction anywhere -> bound 0, counts exact
    assert all(r["bound"] == 0 for r in m)
    exact = (
        spark.read.parquet(src)
        .groupBy("value")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("value"))
        .limit(5)
        .collect()
    )
    assert [(r["value"], r["est_count"]) for r in final] == [
        (r["value"], r["c"]) for r in exact
    ]
    assert final[0]["n_seen"] == len(rows) * 2
    # mid-stream row covers only batch 0
    assert sorted(by_batch[0], key=lambda r: r["rank"])[0]["n_seen"] == len(rows)

    # replay: fresh checkpoint, same state/metrics -> both batch ids already
    # versioned, the handler takes the re-emit branch and nothing re-merges
    _run(spark, src, state, metrics, str(tmp_path / "ck2"), k=5, capacity=512)
    m2 = spark.read.parquet(metrics).collect()
    assert sorted(map(tuple, m2)) == sorted(map(tuple, m))


def test_stream_bound_contract_under_reduction(spark, tmp_path):
    # tiny capacity over a 400-value vocab with two genuinely heavy values:
    # reductions happen, the bound is nonzero, and est <= true <= est+bound
    heavy = [("hot",)] * 300 + [("warm",)] * 200
    tail = [(f"t{i:04d}",) for i in range(400) for _ in range(2)]
    src = str(tmp_path / "src")
    spark.createDataFrame(heavy + tail[:400], "value string").coalesce(
        2
    ).write.parquet(src)
    spark.createDataFrame(tail[400:], "value string").coalesce(2).write.mode(
        "append"
    ).parquet(src)
    state, metrics, ck = (str(tmp_path / d) for d in ("state", "metrics", "ck"))
    _run(spark, src, state, metrics, ck, k=3, capacity=16)

    m = spark.read.parquet(metrics).collect()
    final_bid = max(r["batch_id"] for r in m)
    final = sorted((r for r in m if r["batch_id"] == final_bid), key=lambda r: r["rank"])
    assert final and final[0]["bound"] > 0
    assert final[0]["value"] == "hot" and final[1]["value"] == "warm"
    true = {
        r["value"]: r["c"]
        for r in spark.read.parquet(src)
        .groupBy("value")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for r in final:
        assert r["est_count"] <= true[r["value"]] <= r["est_count"] + r["bound"]
    assert final[0]["n_seen"] == len(heavy) + len(tail)
