"""The ES ``stop`` analyzer: tokenization parity across all three
implementations, Lucene-style field norms (dl counts surviving tokens)
and position increments (gaps preserved), query/index analysis symmetry
on every query surface, and analyzer persistence through build → append
→ compact."""

from __future__ import annotations

import pytest

from kafka_elasticsearch_standalone_consumer_spark.analysis import (
    STOP_WORDS,
    doc_term_freqs,
    tokenize_col,
    tokenize_text,
    tokens_from,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick movement of the enemy"),
    (2, "quick the fox"),          # gap INSIDE the phrase
    (3, "brown fox quick fox"),
    (4, "the of and to in"),       # all stopwords → empty after analysis
    (5, "quick brown fox"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_tokenizers_rank_identical_with_stop(spark, docs_df):
    """fused ≡ sql ≡ pandas token streams under analyzer='stop'."""
    base = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in tokens_from(docs_df, method="sql", analyzer="stop").collect()
    }
    for method in ("pandas", "fused"):
        got = {
            (r["doc_id"], r["term"]): r["tf"]
            for r in tokens_from(docs_df, method=method, analyzer="stop").collect()
        }
        assert got == base, method
    assert base and all(t not in STOP_WORDS for _, t in base)
    # python tokenizer agrees too
    py = {}
    for d, text in DOCS:
        for t in tokenize_text(text, "stop"):
            py[(d, t)] = py.get((d, t), 0) + 1
    assert py == base


def test_stop_dl_and_positions_are_lucene_style(spark, docs_df):
    """dl counts surviving tokens only; positions keep ORIGINAL offsets
    (increments preserved across removed stopwords)."""
    rows = doc_term_freqs(docs_df, positions=True, analyzer="stop").collect()
    by = {(r["doc_id"], r["term"]): r for r in rows}
    # doc 0: "the quick brown fox jumps over the lazy dog" → 7 kept
    assert by[(0, "quick")]["dl"] == 7
    assert list(by[(0, "quick")]["positions"]) == [1]  # original offset
    assert list(by[(0, "dog")]["positions"]) == [8]
    # doc 2: "quick the fox" → quick@0, fox@2 (gap preserved)
    assert list(by[(2, "fox")]["positions"]) == [2]
    assert by[(2, "fox")]["dl"] == 2
    # doc 4 is all stopwords → no rows at all
    assert not any(d == 4 for d, _ in by)


def test_stop_index_query_surfaces(spark, docs_df):
    """End-to-end on a stop-analyzer index: queries carrying stopwords
    analyze them away (search ≡ oracle, msm counts analyzed terms), and
    _analyze/_count surfaces agree."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    idx = Index.ephemeral(docs_df, docs_per_shard=4, n_buckets=4, analyzer="stop")
    assert idx.meta["analyzer"] == "stop"
    a = [(r["doc_id"], round(r["score"], 9)) for r in idx.search("the quick fox", 10).collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in idx.search_oracle("the quick fox", 10).collect()]
    c = [(r["doc_id"], round(r["score"], 9)) for r in idx.search("quick fox", 10).collect()]
    assert a == b == c and a
    # msm counts ANALYZED terms: "the quick fox" has 2 effective terms
    m = idx.search("the quick fox", 10, min_should_match=2).collect()
    assert {r["doc_id"] for r in m} == {0, 2, 3, 5}  # docs with quick AND fox
    # intersect mode agrees
    i = idx.search("the quick fox", 10, mode="intersect").collect()
    assert {r["doc_id"] for r in i} == {0, 2, 3, 5}
    # _analyze shows the gap
    an = idx.analyze("quick the fox").collect()
    assert [(r["position"], r["token"]) for r in an] == [(0, "quick"), (2, "fox")]
    # count over analyzed scope
    assert idx.count_matches("the of quick").collect()[0]["n"] == 5  # docs w/ quick? 0,1,2,3,5
    # percolate analyzes registered queries the same way
    p = idx.percolate([(1, "the quick")], operator="and").collect()
    assert {r["doc_id"] for r in p} == {0, 1, 2, 3, 5}


def test_stop_index_phrase_gaps(spark, docs_df):
    """match_phrase with Lucene position increments: stopwords inside the
    phrase become gaps that must be respected, fast path ≡ oracle."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    idx = Index.ephemeral(
        docs_df, docs_per_shard=4, n_buckets=4, positions=True, analyzer="stop"
    )

    def both(phrase, slop=0):
        f = [(r["doc_id"], round(r["score"], 9)) for r in idx.search_phrase(phrase, 10, slop=slop).collect()]
        o = [(r["doc_id"], round(r["score"], 9)) for r in idx.search_phrase_oracle(phrase, 10, slop=slop).collect()]
        assert f == o, phrase
        return [d for d, _ in f]

    # adjacent phrase
    assert set(both("quick brown")) == {0, 5}
    # phrase WITH a stopword: "quick the fox" → quick@0, fox@2 — the gap
    # matches ANY filler token (Lucene position increments), so every
    # "quick ? fox" doc qualifies: 0 (quick brown fox…), 2, 5
    assert set(both("quick the fox")) == {0, 2, 5}
    # "the quick brown fox" → offsets [1,2,3] relative → docs 0, 5
    assert set(both("the quick brown fox")) == {0, 5}
    # slop bridges the gap: "quick fox" slop=1 also matches doc 2's gap
    assert set(both("quick fox", slop=1)) >= {2, 5}


def test_analyzer_survives_append_and_compact(spark, docs_df, tmp_path):
    """meta['analyzer'] threads through segment append and compaction —
    a compacted stop index stays query-identical."""
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.incremental import (
        append_segment,
        compact,
    )
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    wh = str(tmp_path / "stopidx")
    base = docs_df.filter("doc_id <= 3").select("text")
    base = base.withColumn("conv_id", base["text"].substr(1, 4)).withColumn(
        "turn_idx", (base["text"].substr(1, 1) == "x").cast("int")
    )
    build_index(spark, base, wh, docs_per_shard=4, n_buckets=4, analyzer="stop")
    more = docs_df.filter("doc_id > 3").select("text")
    more = more.withColumn("conv_id", more["text"].substr(1, 4)).withColumn(
        "turn_idx", (more["text"].substr(1, 1) == "x").cast("int")
    )
    assert append_segment(spark, more, wh, idempotency_key="b1") is not None
    before = [(r["doc_id"], round(r["score"], 9)) for r in Index(spark, wh).search("the quick fox", 10).collect()]
    assert before
    compact(spark, wh)
    idx2 = Index(spark, wh)
    assert idx2.meta["analyzer"] == "stop"
    after = [(r["doc_id"], round(r["score"], 9)) for r in idx2.search("the quick fox", 10).collect()]
    assert {d for d, _ in after} == {d for d, _ in before}


def test_unknown_analyzer_rejected(spark, docs_df):
    with pytest.raises(ValueError, match="analyzer"):
        tokenize_text("x", "porter")
    with pytest.raises(ValueError, match="analyzer"):
        tokens_from(docs_df, analyzer="nope").collect()
