"""Streaming classifier gate: per-batch routing equals the batch-mode
classifier_score exactly, accepted/rejected partitions never overlap,
zero-totals appear in the metrics, and a replayed batch overwrites its
own partition instead of duplicating."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.ops.curation import classifier_score
from kafka_elasticsearch_standalone_consumer_spark.streaming.classify import (
    classifier_stream_writer,
)

SCHEMA = "doc_id long, text string"


def _weights(spark):
    return spark.range(64).select(
        F.col("id").alias("bucket"),
        (((F.col("id") % 5) - 2).cast("double") * F.lit(0.25)).alias("weight"),
    )


def test_classifier_gate_routes_and_matches_batch_mode(spark, tmp_path):
    rows_a = [(i, f"w{i % 9:05d} w{(i * 3) % 9:05d} common") for i in range(40)]
    rows_b = [(100 + i, f"w{i % 4:05d} rare") for i in range(20)] + [(999, "")]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows_a, SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(rows_b, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    acc, rej, met, ck = (str(tmp_path / p) for p in ("acc", "rej", "met", "ck"))
    w = _weights(spark)
    q = (
        classifier_stream_writer(
            spark, stream, w, 64, acc, rej, met, ck, bias=0.0, threshold=0.0
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    accepted = spark.read.parquet(acc).collect()
    rejected = spark.read.parquet(rej).collect()
    all_rows = rows_a + rows_b
    assert len(accepted) + len(rejected) == len(all_rows)
    assert not ({r["doc_id"] for r in accepted} & {r["doc_id"] for r in rejected})

    # routing equals batch-mode classifier_score exactly (logits bit-equal)
    batch = classifier_score(
        spark.createDataFrame(all_rows, SCHEMA), w, 64
    ).collect()
    want = {r["doc_id"]: (r["logit"], r["keep"]) for r in batch}
    for r in accepted:
        assert want[r["doc_id"]] == (r["logit"], True)
    for r in rejected:
        assert want[r["doc_id"]] == (r["logit"], False)

    # metrics: one row per batch, accept counts consistent
    met_rows = {r["batch_id"]: r for r in spark.read.parquet(met).collect()}
    assert len(met_rows) == 2
    assert sum(r["n_rows"] for r in met_rows.values()) == len(all_rows)
    assert sum(r["n_accepted"] for r in met_rows.values()) == len(accepted)

    # replay safety: re-running the same batch overwrites its partition
    from kafka_elasticsearch_standalone_consumer_spark.streaming.classify import (
        classifier_stream_writer as _w2,
    )

    stream2 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    ck2 = str(tmp_path / "ck2")  # fresh checkpoint = batch ids replayed
    q2 = (
        _w2(spark, stream2, w, 64, acc, rej, met, ck2)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    assert len(spark.read.parquet(acc).collect()) == len(accepted)
    assert len(spark.read.parquet(rej).collect()) == len(rejected)
