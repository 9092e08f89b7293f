"""Delete tombstones (Lucene live-docs semantics): deleted docs vanish from
every query surface immediately, surviving docs keep their PRE-delete
scores (stats frozen), and compaction purges tombstones and re-bakes stats
exactly like a fresh build over the survivors."""

from __future__ import annotations

import pytest

from kafka_elasticsearch_standalone_consumer_spark.corpus import generate_transcripts
from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
from kafka_elasticsearch_standalone_consumer_spark.pipeline.incremental import (
    compact,
    delete_docs,
)
from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

K = 10
Q = "w00000 w00003"


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


@pytest.fixture(scope="module")
def deleted_wh(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("del") / "idx")
    tr = generate_transcripts(spark, n_convs=80, seed=21, partitions=4)
    build_index(spark, tr, path, docs_per_shard=256, n_buckets=8, positions=True)
    before = {
        "bmw": _rows(Index(spark, path).search(Q, 50)),
        "oracle": _rows(Index(spark, path).search_oracle(Q, 50)),
    }
    n = delete_docs(spark, path, "role = 'tool'")
    assert n > 0
    return path, before, n


def test_deleted_docs_gone_scores_frozen(spark, deleted_wh):
    path, before, _n = deleted_wh
    idx = Index(spark, path)
    tool_ids = {r["doc_id"] for r in idx._docs_df().filter("role = 'tool'").collect()}
    survivors = [(d, s) for d, s in before["bmw"] if d not in tool_ids][:K]
    for mode in ("bmw", "exact"):
        got = _rows(idx.search(Q, K, mode=mode))
        assert got == survivors, mode  # same docs, same (frozen) scores
    assert _rows(idx.search_oracle(Q, K)) == survivors
    assert idx.stats()["n_deleted"] > 0


def test_deletes_compose_with_filters_and_batch(spark, deleted_wh):
    path, _before, _n = deleted_wh
    idx = Index(spark, path)
    got = idx.fetch(idx.search(Q, K, where="role <> 'user'")).collect()
    assert got and all(r["role"] == "assistant" for r in got)  # tool deleted
    batch = idx.search_many({"a": Q}, K).collect()
    single = _rows(idx.search(Q, K))
    assert sorted((r["doc_id"], round(r["score"], 9)) for r in batch) == sorted(single)
    # facets and phrase surfaces exclude tombstones too
    roles = {r["role"] for r in idx.facets(Q, by="role").collect()}
    assert "tool" not in roles


def test_compact_purges_tombstones(spark, deleted_wh, tmp_path):
    path, _before, _n = deleted_wh
    idx0 = Index(spark, path)
    keys_before = {
        (r["conv_id"], r["turn_idx"])
        for r in idx0.search(Q, K).join(idx0.doc_keys(), "doc_id").collect()
    }
    compact(spark, path)
    idx = Index(spark, path)
    assert idx.stats()["n_deleted"] == 0
    assert idx._docs_df().filter("role = 'tool'").count() == 0
    # equal to a one-shot build over the survivors (stats re-baked)
    ref = str(tmp_path / "ref")
    survivors = generate_transcripts(spark, n_convs=80, seed=21, partitions=4).filter(
        "role <> 'tool'"
    )
    build_index(spark, survivors, ref, docs_per_shard=256, n_buckets=8, positions=True)
    ridx = Index(spark, ref)
    want = {
        (r["conv_id"], r["turn_idx"], round(r["score"], 6))
        for r in ridx.search(Q, K).join(ridx.doc_keys(), "doc_id").collect()
    }
    got = {
        (r["conv_id"], r["turn_idx"], round(r["score"], 6))
        for r in idx.search(Q, K).join(idx.doc_keys(), "doc_id").collect()
    }
    assert got == want
    assert {(c, t) for c, t, _ in got} <= keys_before | {(c, t) for c, t, _ in want}


def test_delete_by_query_matches_count_and_replays_noop(spark, tmp_path):
    """ES 1.x DELETE /_query: the tombstoned set is exactly the live
    match set (msm respected, where= respected), a replay is a no-op,
    and survivors keep frozen scores until compact purges."""
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.incremental import (
        delete_by_query,
    )

    path = str(tmp_path / "dbq")
    tr = generate_transcripts(spark, n_convs=20, seed=31, partitions=2)
    build_index(spark, tr, path, docs_per_shard=256, n_buckets=8)
    idx = Index(spark, path)
    q = "w00000 w00003"
    n_scope = idx.count_matches(q, where="role = 'tool'", min_should_match=2).collect()[0]["n"]
    assert n_scope > 0
    probe_before = _rows(Index(spark, path).search("w00001 w00002", 50))
    assert delete_by_query(spark, path, q, where="role = 'tool'", min_should_match=2) == n_scope
    idx2 = Index(spark, path)
    assert idx2.count_matches(q, where="role = 'tool'", min_should_match=2).collect()[0]["n"] == 0
    # survivors of an unrelated query keep their exact pre-delete scores
    # (docs promoted into the post-delete top-k are new entries, not drift)
    before_map = dict(probe_before)
    for d, s in _rows(idx2.search("w00001 w00002", 50)):
        assert d not in before_map or before_map[d] == s
    # replay and empty-query are no-ops
    assert delete_by_query(spark, path, q, where="role = 'tool'", min_should_match=2) == 0
    assert delete_by_query(spark, path, "...") == 0
    compact(spark, path)
    idx3 = Index(spark, path)
    assert idx3.stats()["n_deleted"] == 0
    assert idx3.count_matches(q, where="role = 'tool'", min_should_match=2).collect()[0]["n"] == 0


def test_delete_docs_returns_delta(spark, tmp_path):
    """ADVICE r01: a second overlapping delete reports only the NEW
    tombstones, not the cumulative table size."""
    path = str(tmp_path / "ddelta")
    tr = generate_transcripts(spark, n_convs=20, seed=31, partitions=2)
    build_index(spark, tr, path, docs_per_shard=256, n_buckets=8)
    n_tool = Index(spark, path)._docs_df().filter("role = 'tool'").count()
    n_all = Index(spark, path)._docs_df().count()
    assert delete_docs(spark, path, "role = 'tool'") == n_tool
    # overlapping predicate: tool docs are already tombstoned
    assert delete_docs(spark, path, "role IN ('tool', 'user')") == (
        Index(spark, path)._docs_df().filter("role = 'user'").count()
    )
    assert delete_docs(spark, path, "role = 'tool'") == 0
    assert Index(spark, path).stats()["n_deleted"] < n_all
