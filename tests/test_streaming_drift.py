"""Streaming drift monitor: per-batch JSD vs a fixed baseline — a batch
from the same generator reads low, a poisoned (alien-vocabulary) batch
reads high, and the per-batch rows match the BATCH corpus_drift exactly."""

from __future__ import annotations

from kafka_elasticsearch_standalone_consumer_spark.corpus import (
    TRANSCRIPTS_SCHEMA,
    generate_transcripts,
)
from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import corpus_drift
from kafka_elasticsearch_standalone_consumer_spark.streaming.drift import (
    drift_stream_writer,
)


def test_drift_monitor_flags_poisoned_batch(spark, tmp_path):
    baseline = generate_transcripts(spark, n_convs=40, seed=1, partitions=2)
    good = generate_transcripts(spark, n_convs=10, seed=2, partitions=1)
    poison = spark.createDataFrame(
        [
            ("convP%07d" % i, 0, "user",
             "zzq qqz zqz alien vocab entirely disjoint tokens xxj jjx", None, None)
            for i in range(30)
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    src = str(tmp_path / "src")
    good.coalesce(1).write.parquet(src)
    poison.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    metrics, ckpt = str(tmp_path / "metrics"), str(tmp_path / "ck")
    q = (
        drift_stream_writer(spark, stream, baseline, metrics, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = {r["batch_id"]: r for r in spark.read.parquet(metrics).collect()}
    assert len(rows) == 2
    jsds = sorted((r["jsd_r"] for r in rows.values()))
    assert jsds[1] > 2 * jsds[0] > 0  # poisoned batch reads far higher
    # each row equals the batch-mode corpus_drift of (baseline, that file)
    for batch_df, jsd in ((good, jsds[0]), (poison, jsds[1])):
        want = corpus_drift(baseline, batch_df).collect()[0]["jsd_r"]
        assert abs(want - jsd) < 1e-9
