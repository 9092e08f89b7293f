"""Streaming percolation (streaming/alerts.py): micro-batch alerts must
equal one batch percolate over the full consumed input, and a replayed
batch must not duplicate alerts (dynamic partition overwrite)."""

from __future__ import annotations

import pytest

from kafka_elasticsearch_standalone_consumer_spark.corpus import (
    TRANSCRIPTS_SCHEMA,
    generate_transcripts,
)
from kafka_elasticsearch_standalone_consumer_spark.ids import assign_dense_ids
from kafka_elasticsearch_standalone_consumer_spark.query.percolate import percolate
from kafka_elasticsearch_standalone_consumer_spark.streaming.alerts import (
    alert_stream_writer,
)

QUERIES = [(1, "w00000"), (2, "w00003 w00007"), (3, "zzabsent")]


@pytest.fixture(scope="module")
def docs(spark):
    t = generate_transcripts(spark, n_convs=60, seed=5, partitions=4)
    d = assign_dense_ids(t).select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    d.persist().count()
    return d


def _alerts(spark, path):
    rows = spark.read.parquet(path).collect()
    return {(r["doc_id"], r["query_id"], r["n_matched"]) for r in rows}


def test_stream_alerts_match_batch_percolate(spark, docs, tmp_path):
    src, sink, ckpt = (str(tmp_path / p) for p in ("src", "alerts", "ckpt"))
    half_a = docs.filter("turn_idx % 2 = 0")
    half_b = docs.filter("turn_idx % 2 = 1")
    half_a.coalesce(1).write.parquet(src)
    half_b.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    # the stream has no doc_id column — percolate on the natural key text;
    # use conv_id+turn_idx-derived id via a select in the writer's input
    stream_ids = stream.selectExpr(
        "CAST(turn_idx AS LONG) + 1000000 * CAST(substr(conv_id, 5) AS LONG) AS doc_id",
        "text",
    )
    q = (
        alert_stream_writer(
            spark, stream_ids, QUERIES, sink, ckpt, minimum_should_match=1
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    batch_input = docs.selectExpr(
        "CAST(turn_idx AS LONG) + 1000000 * CAST(substr(conv_id, 5) AS LONG) AS doc_id",
        "text",
    )
    want = {
        (r["doc_id"], r["query_id"], r["n_matched"])
        for r in percolate(batch_input, QUERIES).collect()
    }
    got = _alerts(spark, sink)
    assert got == want and got
    # absent-term query never fires
    assert not any(qid == 3 for _, qid, _ in got)

    # replay: a fresh checkpoint re-consumes everything; per-batch dynamic
    # partition overwrite keeps the sink duplicate-free
    q2 = (
        alert_stream_writer(
            spark, stream_ids, QUERIES, sink, str(tmp_path / "ckpt2")
        )
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    assert _alerts(spark, sink) == want
