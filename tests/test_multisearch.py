"""Multi-index (alias) search: query_then_fetch scores each index with
its own statistics, dfs_query_then_fetch merges statistics first — the
dfs scores must equal single-index scores over the union corpus, and the
qtf scores must equal each half's own search_oracle."""

from __future__ import annotations

import pytest

from kafka_elasticsearch_standalone_consumer_spark.query.multisearch import MultiIndex

Q = "w00000 w00003"


@pytest.fixture(scope="module")
def split_indexes(spark, transcripts):
    from kafka_elasticsearch_standalone_consumer_spark.ids import assign_dense_ids
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    docs = assign_dense_ids(transcripts)
    even = Index.ephemeral(docs.filter("doc_id % 2 = 0"), docs_per_shard=256, n_buckets=8)
    odd = Index.ephemeral(docs.filter("doc_id % 2 = 1"), docs_per_shard=256, n_buckets=8)
    full = Index.ephemeral(docs, docs_per_shard=256, n_buckets=8)
    return even, odd, full


def test_qtf_matches_per_index_oracles(spark, split_indexes):
    even, odd, full = split_indexes
    got = [
        (r["idx"], r["doc_id"], round(r["score"], 9))
        for r in MultiIndex([even, odd]).search(Q, 15).collect()
    ]
    per = []
    for i, ix in enumerate((even, odd)):
        per += [
            (i, r["doc_id"], round(r["score"], 9))
            for r in ix.search_oracle(Q, None).collect()
        ]
    want = sorted(per, key=lambda t: (-t[2], t[0], t[1]))[:15]
    assert got == want and got
    # both indexes contribute (the corpus split guarantees matches on each side)
    assert {i for i, _, _ in got} == {0, 1}


def test_dfs_equals_union_corpus_scores(spark, split_indexes):
    even, odd, full = split_indexes
    got = {
        r["doc_id"]: round(r["score"], 6)
        for r in MultiIndex([even, odd]).search(Q, 25, mode="dfs_query_then_fetch").collect()
    }
    union = {
        r["doc_id"]: round(r["score"], 6)
        for r in full.search_oracle(Q, None).collect()
    }
    assert got and all(union[d] == s for d, s in got.items())
    # and qtf scores genuinely DIFFER from dfs for some doc (local stats)
    qtf = {
        r["doc_id"]: round(r["score"], 6)
        for r in MultiIndex([even, odd]).search(Q, 25).collect()
    }
    assert any(qtf.get(d) is not None and qtf[d] != s for d, s in got.items())


def test_multi_index_validation(spark, split_indexes):
    even, odd, _ = split_indexes
    with pytest.raises(ValueError, match="at least one"):
        MultiIndex([])
    with pytest.raises(ValueError, match="mode"):
        MultiIndex([even]).search(Q, 5, mode="nope")
    # absent-term query: empty on both modes, stable schema
    assert MultiIndex([even, odd]).search("zzznope", 5).count() == 0
    assert (
        MultiIndex([even, odd]).search("zzznope", 5, mode="dfs_query_then_fetch").count()
        == 0
    )


def test_indices_boost_scales_before_merge(spark, split_indexes):
    """ES indices_boost: per-index multiplicative boost applied before
    the merge — boosted hits outrank, unboosted scores unchanged."""
    even, odd, _ = split_indexes
    mi = MultiIndex([even, odd])
    base = [(r["idx"], r["doc_id"], round(r["score"], 9))
            for r in mi.search(Q, 100_000).collect()]  # the full score set
    boosted = [(r["idx"], r["doc_id"], round(r["score"], 9))
               for r in mi.search(Q, 50, indices_boost=[1.0, 3.0]).collect()]
    bmap = dict(((i, d), s) for i, d, s in base)
    for i, d, s in boosted:
        want = round(bmap[(i, d)] * (3.0 if i == 1 else 1.0), 9)
        assert abs(s - want) < 1e-8, (i, d)
    # every idx-1 hit now outranks every idx-0 hit with a same-ballpark base score
    with pytest.raises(ValueError, match="indices_boost"):
        mi.search(Q, 10, indices_boost=[1.0])
    # dfs mode takes the boost too
    dfs = mi.search(Q, 10, mode="dfs_query_then_fetch", indices_boost=[1.0, 3.0]).collect()
    assert dfs
