"""Driver-side serving path (search_local): must be rank- AND
score-identical to the distributed search() on every mode, honor delete
tombstones and multi-segment baked-avgdl bounds, and reject ephemeral
indexes (no pruned files to read)."""

from __future__ import annotations

import pytest

from kafka_elasticsearch_standalone_consumer_spark.corpus import generate_transcripts
from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
from kafka_elasticsearch_standalone_consumer_spark.pipeline.incremental import (
    append_segment,
    delete_docs,
)
from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

Q = "w00000 w00003 w00015"


def _dist(idx, q, mode):
    return [(r["doc_id"], round(r["score"], 10)) for r in idx.search(q, 10, mode=mode).collect()]


def _loc(idx, q, mode):
    return [(d, round(s, 10)) for d, s in idx.search_local(q, 10, mode=mode)]


def test_local_identical_to_distributed(spark, built_index):
    idx, _ = built_index
    for mode in ("bmw", "exact", "intersect"):
        dist = _dist(idx, Q, mode)
        assert _loc(idx, Q, mode) == dist, mode
        assert dist, mode  # all three modes must actually match docs
    assert idx.search_local("zzabsent", 10) == []
    assert idx.search_local("", 10) == []


def test_local_with_segments_and_deletes(spark, transcripts, tmp_path):
    wh = str(tmp_path / "idx")
    build_index(spark, transcripts, wh, docs_per_shard=256, n_buckets=8)
    append_segment(
        spark, generate_transcripts(spark, n_convs=30, seed=7), wh, idempotency_key="s1"
    )
    idx = Index(spark, wh)
    top = idx.search_local(Q, 10)
    assert _loc(idx, Q, "bmw") == _dist(idx, Q, "bmw")
    # tombstone the current best hit: both paths must drop it, scores frozen
    delete_docs(spark, wh, f"doc_id = {top[0][0]}")
    idx = Index(spark, wh)
    loc, dist = _loc(idx, Q, "bmw"), _dist(idx, Q, "bmw")
    assert loc == dist
    assert top[0][0] not in {d for d, _ in loc}


def test_local_rejects_ephemeral(spark, transcripts):
    idx = Index.ephemeral(
        transcripts.selectExpr("row_number() OVER (ORDER BY conv_id, turn_idx) AS doc_id", "text"),
        docs_per_shard=256,
        n_buckets=8,
    )
    with pytest.raises(ValueError, match="warehouse"):
        idx.search_local(Q, 10)
