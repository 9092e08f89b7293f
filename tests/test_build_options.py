"""Build-time knobs: the unmaterialized-forward-index mode must produce a
query-identical index with no tokens table on disk."""

from __future__ import annotations

import os

from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

QUERIES = ["w00000 w00003", "w00250", "w00001 w01500 w00007"]


def test_unmaterialized_tokens_build_is_identical(spark, transcripts, tmp_path):
    a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, transcripts, a_path, docs_per_shard=256, n_buckets=8)
    rb = build_index(
        spark, transcripts, b_path, docs_per_shard=256, n_buckets=8,
        materialize_tokens=False,
    )
    assert "tokens" not in rb.ran and not os.path.isdir(os.path.join(b_path, "tokens"))
    ia, ib = Index(spark, a_path), Index(spark, b_path)
    for q in QUERIES:
        want = [(r["doc_id"], round(r["score"], 9)) for r in ia.search(q, 10).collect()]
        got = [(r["doc_id"], round(r["score"], 9)) for r in ib.search(q, 10).collect()]
        assert got == want, q
    # the oracle path recomputes tokens on the fly
    q = QUERIES[0]
    oracle = [(r["doc_id"], round(r["score"], 9)) for r in ib.search_oracle(q, 10).collect()]
    fast = [(r["doc_id"], round(r["score"], 9)) for r in ib.search(q, 10).collect()]
    assert oracle == fast
