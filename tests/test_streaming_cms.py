"""Streaming Count-Min monitor: additive registers across micro-batches —
the final stream-so-far estimates equal the batch sketch over the union
of all batches, est >= true for every probe, and replay never
double-counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.streaming.cms import (
    cms_stream_writer,
)

PROBES = ["hot", "warm", "t0001", "absent"]


def _run(spark, src, state, metrics, ck, d=4, w=64):
    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        cms_stream_writer(
            spark, stream, "value", PROBES, state, metrics, ck, d=d, w=w
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_stream_cms_matches_batch_and_replays(spark, tmp_path):
    from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import (
        cms_estimate,
    )

    b0 = [("hot",)] * 30 + [("warm",)] * 10 + [(f"t{i:04d}",) for i in range(50)]
    b1 = [("hot",)] * 20 + [(f"t{i:04d}",) for i in range(50)]
    src = str(tmp_path / "src")
    spark.createDataFrame(b0, "value string").coalesce(1).write.parquet(src)
    spark.createDataFrame(b1, "value string").coalesce(1).write.mode("append").parquet(src)
    state, metrics, ck = (str(tmp_path / x) for x in ("state", "metrics", "ck"))
    _run(spark, src, state, metrics, ck)

    m = spark.read.parquet(metrics).collect()
    by_batch: dict = {}
    for r in m:
        by_batch.setdefault(r["batch_id"], {})[r["value"]] = r
    assert set(by_batch) == {0, 1}

    # final estimates == the BATCH sketch over the whole stream (register
    # addition is exact), and est >= true for every probe
    union = spark.read.parquet(src)
    batch = {
        r["value"]: (r["est"], r["n_true"])
        for r in cms_estimate(union, "value", PROBES, d=4, w=64, with_exact=True).collect()
    }
    final = by_batch[1]
    for p in PROBES:
        assert final[p]["est"] == batch[p][0], p
        assert final[p]["est"] >= batch[p][1], p
    assert final["hot"]["n_seen"] == len(b0) + len(b1)
    # mid-stream snapshot covers only batch 0
    assert by_batch[0]["hot"]["n_seen"] == len(b0)
    assert by_batch[0]["hot"]["est"] >= 30

    # replay: fresh checkpoint, same state/metrics -> both batch versions
    # exist, the handler re-emits without re-merging
    _run(spark, src, state, metrics, str(tmp_path / "ck2"))
    m2 = spark.read.parquet(metrics).collect()
    assert sorted(map(tuple, m2)) == sorted(map(tuple, m))
