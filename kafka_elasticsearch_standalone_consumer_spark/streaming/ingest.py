"""Structured-Streaming ingest: the reference's pull loop, Spark-native.

The reference daemon loops forever per Kafka partition: fetch a batch →
transform → bulk-index → commit offset (``jobs/IndexerJob.java:232-280``,
``284-426``). The Spark-native equivalent is a streaming source feeding
``foreachBatch``, where each micro-batch becomes one index SEGMENT
(pipeline/incremental.py) and the offset commit splits into two layers
with the same at-least-once ordering the reference had:

* Spark's streaming checkpoint (``checkpointLocation``) tracks SOURCE
  offsets — which input files / Kafka offsets were consumed (the
  reference's ``KafkaClient.saveOffsetInKafka``, ``KafkaClient.java:87-108``);
* the segment registry's ``idempotency_key = batch-<batch_id>`` makes a
  replayed micro-batch (crash between index write and Spark's own commit)
  a no-op, upgrading the pair to effectively-once index contents.

Swap the file source for ``spark.readStream.format("kafka")`` on a real
cluster — nothing below the source changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_elasticsearch_standalone_consumer_spark.pipeline.incremental import append_segment
from kafka_elasticsearch_standalone_consumer_spark.tables import Warehouse


def index_stream_writer(
    spark: SparkSession,
    stream_df: DataFrame,
    warehouse_path: str,
    checkpoint_dir: str,
    num_partitions: int | None = None,
    compact_every: int | None = None,
    optimize_to: int | None = None,
    quarantine_dir: str | None = None,
):
    """Return a ready-to-start ``DataStreamWriter`` that indexes each
    micro-batch of transcripts as a new segment. Caller picks the trigger
    (``availableNow=True`` for catch-up-and-stop, processingTime for a
    daemon) and calls ``.start()``.

    The base index must already exist (build_index once over the initial
    corpus, possibly empty).

    ``compact_every=N`` runs the Lucene-style FULL merge whenever N or
    more segments have accumulated (the ES background-merge analogue):
    query read amplification is linear in segment count, so a
    long-running stream keeps it bounded. Compaction is an exact rebuild
    — results are identical before and after (tested) — and is itself
    safe to replay.

    ``optimize_to=N`` instead runs the TIERED partial merge
    (pipeline/incremental.optimize) after every batch that leaves more
    than N segments — merging only the micro-batch tail, never
    re-touching the base build. This is the production shape for a
    long-running stream: per-batch merge cost stays proportional to the
    recent tail while a full compaction re-reads the whole corpus every
    time. The two knobs compose — tiered merges keep the count at N
    between the rarer full compactions.

    ``quarantine_dir`` enables the reference's failed-event quarantine on
    the streaming path (the reference daemon routes messages its handler
    cannot transform to a side channel instead of poisoning the bulk
    request — reference ``AccessLogMessageHandler.java``'s catch path):
    rows that cannot become documents (NULL/empty ``text``, NULL
    ``conv_id`` or ``turn_idx``) are written under
    ``quarantine_dir/batch_id=<id>/`` via dynamic partition overwrite —
    the same replay-safety trick streaming/alerts.py uses, so a replayed
    micro-batch overwrites its own quarantine partition instead of
    duplicating it — and only the valid rows are indexed.
    """
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.incremental import (
        compact,
        list_segments,
        optimize,
    )

    wh = Warehouse(warehouse_path)
    if not wh.exists("sys_meta"):
        raise ValueError(
            f"no base index at {warehouse_path}; run build_index first "
            "(an empty-transcripts build bootstraps a fresh warehouse)"
        )

    bad_cond = (
        "text IS NULL OR length(trim(text)) = 0 "
        "OR conv_id IS NULL OR turn_idx IS NULL"
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if quarantine_dir is not None:
            from pyspark.sql import functions as F

            bad = batch_df.filter(bad_cond).withColumn(
                "batch_id", F.lit(int(batch_id))
            )
            (
                bad.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(quarantine_dir)
            )
            batch_df = batch_df.filter(f"NOT ({bad_cond})")
            if batch_df.isEmpty():
                return
        append_segment(
            spark,
            batch_df,
            warehouse_path,
            idempotency_key=f"batch-{batch_id}",
            num_partitions=num_partitions,
        )
        if compact_every and len(list_segments(wh)) - 1 >= compact_every:
            compact(spark, warehouse_path, num_partitions=num_partitions)
        elif optimize_to and len(list_segments(wh)) > optimize_to:
            optimize(
                spark,
                warehouse_path,
                max_num_segments=optimize_to,
                num_partitions=num_partitions,
            )

    return stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
