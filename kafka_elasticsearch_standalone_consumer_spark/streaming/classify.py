"""Streaming quality-classifier gate — the "apply the trained quality
classifier to the firehose" step of a training-data pipeline: every
micro-batch is scored by the hashed linear classifier
(:func:`ops.curation.classifier_score`) and routed — rows whose logit
clears the threshold land in the accepted sink, the rest in a rejected
sink alongside their scores (so threshold recalibration can replay the
rejects instead of re-crawling). One metrics row per batch records the
accept rate.

The reference daemon routed only on PARSE failure (the failed-event
path); this gate routes on MODEL score — the standard CCNet/fastText
quality-filter deployment shape, composed Spark-natively.

Effectively-once like the other streaming sinks here: both data sinks
and the metrics sink are partitioned by ``batch_id``, and a replayed
micro-batch OVERWRITES its own partition (dynamic partition overwrite —
streaming/alerts.py's trick), so retries and checkpoint replays never
duplicate rows.

Scale shape: the weight table is n_buckets rows — broadcast; each
micro-batch costs one tokenize pass + ONE doc-keyed aggregation over the
BATCH (never the history), and the routing filter fuses into the scored
scan. State is zero — the classifier is stateless, so no watermark and
no store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.ops.curation import classifier_score


def classifier_stream_writer(
    spark: SparkSession,
    stream_df: DataFrame,
    weights: DataFrame,
    n_buckets: int,
    accepted_path: str,
    rejected_path: str,
    metrics_path: str,
    checkpoint_dir: str,
    bias: float = 0.0,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Return a ready-to-start ``DataStreamWriter``: per micro-batch,
    score with the broadcast hashed-linear weights and route rows to
    ``accepted_path`` / ``rejected_path`` (each row carries n_tokens,
    logit, score), appending one (batch_id, n_rows, n_accepted,
    accept_rate_r) row to ``metrics_path``. Caller picks the trigger and
    calls ``.start()``.

    ``weights`` is materialized once driver-side (n_buckets rows) so the
    stream never re-evaluates its lineage."""
    w = weights.persist()
    w.count()  # materialize once, before the stream starts

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        scored = classifier_score(
            batch_df,
            w,
            n_buckets,
            bias=bias,
            threshold=threshold,
            text_col=text_col,
            id_col=id_col,
        )
        routed = (
            batch_df.join(scored, id_col)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .persist()
        )
        try:
            for path, keep in ((accepted_path, True), (rejected_path, False)):
                (
                    routed.filter(F.col("keep") == keep)
                    .drop("keep")
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(path)
                )
            metrics = routed.agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum(F.col("keep").cast("long")).alias("n_accepted"),
            ).select(
                F.lit(int(batch_id)).alias("batch_id"),
                "n_rows",
                "n_accepted",
                F.round(
                    F.col("n_accepted").cast("double") / F.col("n_rows"), 6
                ).alias("accept_rate_r"),
            )
            (
                metrics.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(metrics_path)
            )
        finally:
            routed.unpersist()

    return stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
