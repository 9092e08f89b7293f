"""Streaming data-quality drift monitor — the ingest gate a training-data
pipeline runs in front of the index/dataset build: every micro-batch's
unigram distribution is compared (Jensen-Shannon divergence, nats)
against a FIXED baseline slice (the accepted training mix / a golden
crawl dump), and the per-batch metrics append to a parquet sink the
operator alerts on. A source that silently changes domain, language, or
format shows up as a JSD step change before it poisons the corpus.

The reference daemon's only data-quality signal was the failed-event
path (AccessLogMessageHandler's catch — rows that failed to PARSE);
this monitor catches the harder failure where rows parse fine but the
DISTRIBUTION drifted.

Effectively-once like the other streaming sinks: metrics are partitioned
by ``batch_id`` and a replayed micro-batch OVERWRITES its own partition
(dynamic partition overwrite — streaming/alerts.py's trick).

Scale shape: the baseline's (term, count) table is computed ONCE and
persisted (vocabulary-sized, not corpus-sized); each micro-batch adds
one tokenize pass + one groupBy over the BATCH, a vocab-keyed outer join
against the cached baseline, and a single-row aggregate. Small batches
against a huge baseline legitimately read high (a sample never covers
the full vocabulary) — calibrate the alert threshold on known-good
batches, which is what the per-batch history in the sink is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
    drift_between_counts,
    unigram_counts,
)


def drift_stream_writer(
    spark: SparkSession,
    stream_df: DataFrame,
    baseline_df: DataFrame,
    metrics_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
):
    """Return a ready-to-start ``DataStreamWriter`` appending one metrics
    row per micro-batch to ``metrics_path``:
    (batch_id, n_tokens_a, n_tokens_b, vocab_a, vocab_b, vocab_shared,
    jsd_r) — side a is the baseline, side b the batch. Caller picks the
    trigger and calls ``.start()``."""
    base_counts = (
        unigram_counts(baseline_df, text_col).withColumnRenamed("c", "c_a").persist()
    )
    base_counts.count()  # materialize once, before the stream starts

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bc = unigram_counts(batch_df, text_col).withColumnRenamed("c", "c_b")
        row = drift_between_counts(base_counts, bc).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        (
            row.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(metrics_path)
        )

    return stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
