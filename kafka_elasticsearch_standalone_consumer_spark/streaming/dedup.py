"""Streaming deduplication — stateful operators for the ingest path.

A 100 TB training-data pipeline dedups BEFORE indexing, and on a stream
that must be stateful: a duplicate may arrive hours after the original.
Two Spark-native shapes:

* :func:`dedup_stream` — exact dedup with bounded state:
  ``withWatermark(ts) + dropDuplicatesWithinWatermark(text_hash)``. Spark
  keeps one state row per distinct hash inside the watermark horizon and
  evicts beyond it — state is bounded by (arrival rate × horizon), not by
  stream lifetime, which is what survives an unbounded stream. The dedup
  key is ``sha2(text)`` (32 bytes/row of state), never the document.
* :func:`dedup_index_stream_writer` — the composed ingest:
  watermarked exact dedup feeding the segment-per-micro-batch index
  writer (streaming/ingest.py), so the index never even stores
  within-horizon duplicates. Cross-batch duplicate suppression rides
  Spark's own state store (checkpointed with the query), replays included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dedup_stream(
    stream_df: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    horizon: str = "1 hour",
) -> DataFrame:
    """Watermarked exact dedup: keep the first arrival of each distinct
    ``text`` within the ``horizon``; emit rows unchanged (the hash key is
    dropped). State per distinct hash, evicted past the watermark."""
    hashed = stream_df.withColumn("__text_hash", F.sha2(F.col(text_col), 256))
    out = hashed.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        ["__text_hash"]
    )
    return out.drop("__text_hash")


def dedup_index_stream_writer(
    spark: SparkSession,
    stream_df: DataFrame,
    warehouse_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    text_col: str = "text",
    horizon: str = "1 hour",
    num_partitions: int | None = None,
    compact_every: int | None = None,
):
    """Deduplicated streaming ingest: ``dedup_stream`` → one index segment
    per micro-batch (see streaming/ingest.index_stream_writer for the
    at-least-once / replay-no-op contract, which is unchanged)."""
    from kafka_elasticsearch_standalone_consumer_spark.streaming.ingest import (
        index_stream_writer,
    )

    deduped = dedup_stream(stream_df, ts_col, text_col, horizon)
    return index_stream_writer(
        spark,
        deduped,
        warehouse_path,
        checkpoint_dir,
        num_partitions=num_partitions,
        compact_every=compact_every,
    )
