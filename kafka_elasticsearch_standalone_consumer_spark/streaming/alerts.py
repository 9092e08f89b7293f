"""Streaming percolation — ES's alerting pattern, Spark-native.

ES 1.x users registered percolator queries on the index the reference
fed (``.percolator`` docs behind the same indexing boundary, reference
``MessageHandler.java:135-139``) and percolated every incoming document
to trigger alerts/routing. The Structured-Streaming equivalent: each
micro-batch runs the SAME broadcast-join percolate pass the batch API
uses (query/percolate.py — the registered set is tiny, the document side
never shuffles), and matches append to a parquet alerts sink.

Effectively-once: the alerts sink is partitioned by ``batch_id``, and a
replayed micro-batch (crash between the sink write and Spark's source
commit) OVERWRITES its own partition (dynamic partition overwrite) —
alerts never duplicate, matching the ingest path's idempotency-key
discipline (streaming/ingest.py).

Swap the file source for ``spark.readStream.format("kafka")`` on a real
cluster — nothing below the source changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.query.percolate import percolate


def alert_stream_writer(
    spark: SparkSession,
    stream_df: DataFrame,
    queries: list[tuple[int, str]],
    alerts_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    operator: str = "or",
    minimum_should_match: int = 1,
    analyzer: str = "standard",
):
    """Return a ready-to-start ``DataStreamWriter`` that percolates each
    micro-batch against the registered ``queries`` and appends matching
    (doc, query) pairs to the ``alerts_path`` parquet sink. Caller picks
    the trigger and calls ``.start()``.

    Alert rows: (batch_id, doc_id, query_id, n_matched) — per-batch
    partitions are overwritten on replay, so the sink is exactly the
    set of matches for the consumed input regardless of retries."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        matches = percolate(
            batch_df,
            queries,
            id_col=id_col,
            text_col=text_col,
            operator=operator,
            minimum_should_match=minimum_should_match,
            analyzer=analyzer,
        ).withColumn("batch_id", F.lit(int(batch_id)))
        (
            matches.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(alerts_path)
        )

    return stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
