"""ES 1.5.0 ``inner_hits``: has_child and nested queries surfacing the
child / nested-object evidence behind each parent hit.

The reference pins ES 1.5.1 (ref: pom.xml:22) — the exact minor that
introduced inner_hits — so both flavors are part of its users' query
surface. Invariants tested here: the parent set and parent scores are
IDENTICAL to the evidence-free query (inner_hits never changes ranking),
child ranks are dense 1..min(inner_k, n_children) ordered by the clause
score with Lucene's deterministic tie order, and the trap semantics of
the underlying queries (per-object scoping) carry through unchanged."""

from __future__ import annotations

import pytest

from kafka_elasticsearch_standalone_consumer_spark.corpus import generate_transcripts
from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index


@pytest.fixture(scope="module")
def conv_idx(spark):
    from pyspark.sql import functions as F

    t = generate_transcripts(spark, n_convs=40, seed=7)
    # stable synthetic doc_id: conv index * 64 + turn (the corpus row key)
    did = (
        F.substring("conv_id", 5, 10).cast("long") * 64 + F.col("turn_idx")
    )
    docs = t.select(
        did.alias("doc_id"),
        F.col("text"),
        (did % 9).cast("string").alias("conv_key"),
    )
    return Index.ephemeral(docs, docs_per_shard=64, n_buckets=8)


@pytest.fixture(scope="module")
def nested_idx(spark):
    rows = [
        (0, "alpha beta", [("a", 1.0), ("b", 9.0)]),  # cross-object trap
        (1, "alpha beta", [("a", 7.0)]),
        (2, "alpha gamma", [("a", 5.0), ("a", 9.0), ("a", 9.0), ("b", 1.0)]),
        (3, "delta", []),
    ]
    df = spark.createDataFrame(
        [(d, t, [{"name": n, "ms": m} for n, m in arr]) for d, t, arr in rows],
        "doc_id long, text string, calls array<struct<name:string,ms:double>>",
    )
    return Index.ephemeral(df, docs_per_shard=4, n_buckets=4)


INNER = "x.name = 'a' AND x.ms >= 5.0"


def test_child_parents_identical_to_has_child(conv_idx):
    """inner_hits is evidence, not ranking: the distinct parents and their
    scores must equal search_has_child's top-k exactly (bit-identical —
    both aggregate the same score-all set)."""
    q = "w00000 w00412"
    base = conv_idx.search_has_child(
        q, 5, score_mode="max", group_col="conv_key"
    ).collect()
    inner = conv_idx.search_has_child_inner(
        q, 5, inner_k=3, score_mode="max", group_col="conv_key"
    ).collect()
    got = {}
    for r in inner:
        got.setdefault(r["conv_key"], r["parent_score"])
        assert got[r["conv_key"]] == r["parent_score"]
    assert got == {r["conv_key"]: r["score"] for r in base}


def test_child_ranks_dense_and_ordered(conv_idx):
    q = "w00000 w00412"
    rows = conv_idx.search_has_child_inner(
        q, 5, inner_k=3, score_mode="sum", group_col="conv_key"
    ).collect()
    by_parent: dict[str, list] = {}
    for r in rows:
        by_parent.setdefault(r["conv_key"], []).append(r)
    for rs in by_parent.values():
        assert [r["child_rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        # child order: score desc, doc_id asc
        keys = [(-r["child_score"], r["child_doc_id"]) for r in rs]
        assert keys == sorted(keys)


def test_child_scores_are_real_hits(conv_idx):
    """Every surfaced child must appear in the score-all set with the
    same score (the evidence is genuine, not recomputed)."""
    q = "w00000 w00412"
    scored = {
        r["doc_id"]: r["score"]
        for r in conv_idx.search_oracle(q, None).collect()
    }
    for r in conv_idx.search_has_child_inner(
        q, 5, inner_k=3, score_mode="max", group_col="conv_key"
    ).collect():
        assert scored[r["child_doc_id"]] == r["child_score"]


def test_nested_inner_hits_objects_and_ranks(nested_idx):
    rows = nested_idx.search_nested_inner(
        "alpha", 10, inner_k=2,
        nested_col="calls", inner_where=INNER,
        inner_score="x.ms", score_mode="max",
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # the trap doc (0) has no same-object match; doc 3 misses the text
    assert set(by_doc) == {1, 2}
    # doc 1: single matching object
    assert [(r["inner_rank"], r["iscore"]) for r in by_doc[1]] == [(1, 7.0)]
    # doc 2: three matching objects, inner_k=2 keeps the two ms=9.0 ties
    # in array-position order; the ms=5.0 object is cut
    assert [(r["inner_rank"], r["iscore"]) for r in by_doc[2]] == [
        (1, 9.0),
        (2, 9.0),
    ]
    # tie broken by array position: the FIRST 9.0 object ranks 1
    assert by_doc[2][0]["hit"]["ms"] == 9.0


def test_nested_inner_parent_scores_match_search_nested(nested_idx):
    base = {
        r["doc_id"]: r["score"]
        for r in nested_idx.search_nested(
            "alpha", 10, nested_col="calls", inner_where=INNER,
            inner_score="x.ms", score_mode="max",
        ).collect()
    }
    inner = nested_idx.search_nested_inner(
        "alpha", 10, inner_k=2,
        nested_col="calls", inner_where=INNER,
        inner_score="x.ms", score_mode="max",
    ).collect()
    assert {r["doc_id"]: r["score"] for r in inner} == base
