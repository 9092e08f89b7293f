"""ES percolator (reverse search): registered queries matched against a
document stream — semantics vs a pure-Python recomputation, operator
modes, delete handling through Index.percolate, the broadcast plan, and
the streaming foreachBatch composition."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text
from kafka_elasticsearch_standalone_consumer_spark.query.percolate import (
    compile_queries,
    percolate,
)

QUERIES = [(1, "w00000"), (2, "w00000 w00001 w00002"), (3, "w00003 w00004")]


def _python_matches(rows, queries, operator="or", msm=1):
    out = []
    compiled = compile_queries(queries, operator, msm)
    for r in rows:
        toks = set(tokenize_text(r["text"]))
        for qid, terms, req in compiled:
            n = len(toks & set(terms))
            if n >= req:
                out.append((r["doc_id"], qid, n))
    return sorted(out)


def test_percolate_matches_python(spark, built_index):
    idx, _ = built_index
    rows = idx._docs_df().select("doc_id", "text").collect()
    for op, msm in (("or", 1), ("or", 2), ("and", 1)):
        got = [
            (r["doc_id"], r["query_id"], r["n_matched"])
            for r in percolate(
                idx._docs_df(), QUERIES, operator=op, minimum_should_match=msm
            ).collect()
        ]
        assert got == _python_matches(rows, QUERIES, op, msm) and got


def test_percolate_empty_and_invalid(spark, built_index):
    idx, _ = built_index
    import pytest

    # queries with no tokens are rejected (dropped), never match-all
    assert percolate(idx._docs_df(), [(9, "...")]).count() == 0
    with pytest.raises(ValueError, match="operator"):
        percolate(idx._docs_df(), QUERIES, operator="xor")


def test_percolate_plan_broadcasts_queries(spark, built_index):
    """The registered-query side must broadcast: the doc stream never
    shuffles for the join (only the (doc, query) aggregation exchanges)."""
    idx, _ = built_index
    df = percolate(idx._docs_df(), QUERIES)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan


def test_index_percolate_honors_deletes(spark, transcripts, tmp_path):
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.incremental import (
        delete_docs,
    )
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    wh = str(tmp_path / "idx")
    build_index(spark, transcripts, wh, docs_per_shard=512, n_buckets=8)
    idx = Index(spark, wh)
    before = idx.percolate(QUERIES).collect()
    victims = sorted({r["doc_id"] for r in before})[:5]
    delete_docs(spark, wh, f"doc_id IN ({', '.join(str(v) for v in victims)})")
    after = Index(spark, wh).percolate(QUERIES).collect()
    gone = {r["doc_id"] for r in before} - {r["doc_id"] for r in after}
    assert set(victims) <= gone | set()
    assert all(r["doc_id"] not in victims for r in after)


def test_percolate_existing_doc(spark, built_index, transcripts, tmp_path):
    """ES 1.x percolate-existing-document: results equal percolating the
    fetched _source; missing ids are silently absent; tombstoned docs
    percolate nothing; a FilteredIndex passes the surface through (a
    get + registered-query match has no alias-filter surface)."""
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.incremental import (
        delete_docs,
    )
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import (
        FilteredIndex,
        Index,
    )

    idx, _ = built_index
    all_matches = idx.percolate(QUERIES).collect()
    some = sorted({r["doc_id"] for r in all_matches})[:4]
    ids = some + [99999999]  # one missing id
    got = [
        (r["doc_id"], r["query_id"], r["n_matched"])
        for r in idx.percolate_existing(ids, QUERIES).collect()
    ]
    want = sorted(
        (r["doc_id"], r["query_id"], r["n_matched"])
        for r in all_matches
        if r["doc_id"] in set(some)
    )
    assert got == want and got
    # FilteredIndex: passes through (in _UNFILTERED_OK)
    fidx = FilteredIndex(idx, [("role", "=", "user")])
    got_f = [
        (r["doc_id"], r["query_id"], r["n_matched"])
        for r in fidx.percolate_existing(ids, QUERIES).collect()
    ]
    assert got_f == got

    # tombstoned doc percolates nothing
    wh = str(tmp_path / "idx2")
    build_index(spark, transcripts, wh, docs_per_shard=512, n_buckets=8)
    victim = some[0]
    delete_docs(spark, wh, f"doc_id = {victim}")
    got2 = Index(spark, wh).percolate_existing(ids, QUERIES).collect()
    assert all(r["doc_id"] != victim for r in got2)
    assert {r["doc_id"] for r in got2} == set(some) - {victim}


def test_percolate_in_streaming_foreachbatch(spark, transcripts, tmp_path):
    """The percolator composes with Structured Streaming: each micro-batch
    of documents is matched against the registered queries and appended to
    an alert sink — batch results must equal percolating the union."""
    import glob

    raw = transcripts.limit(40).collect()
    rows = [{"doc_id": i, "text": r["text"]} for i, r in enumerate(raw)]
    schema = "doc_id long, text string"
    src = str(tmp_path / "stream_src")
    sink = str(tmp_path / "alerts")
    spark.createDataFrame(rows[:20], schema).write.parquet(src + "/b0")
    spark.createDataFrame(rows[20:], schema).write.parquet(src + "/b1")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )

    def handle(batch, _bid):
        percolate(batch, QUERIES).write.mode("append").parquet(sink)

    q = stream.writeStream.foreachBatch(handle).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert glob.glob(sink + "/*.parquet")
    got = sorted(
        (r["doc_id"], r["query_id"], r["n_matched"])
        for r in spark.read.parquet(sink).collect()
    )
    want = _python_matches(rows, QUERIES)
    assert got == want and got


def test_mpercolate_equals_per_request_percolate(spark, built_index):
    """_mpercolate: the batched pass must answer each request exactly as
    a single-doc percolate call would — same analyzer, operator, msm."""
    from kafka_elasticsearch_standalone_consumer_spark.query.percolate import (
        mpercolate,
    )

    idx, _ = built_index
    rows = idx._docs_df().select("doc_id", "text").limit(6).collect()
    reqs = [(int(r["doc_id"]), r["text"] or "") for r in rows]
    got = sorted(
        (r["req_id"], r["query_id"], r["n_matched"])
        for r in mpercolate(
            spark, reqs, QUERIES, minimum_should_match=2
        ).collect()
    )
    want = []
    for rid, text in reqs:
        one = spark.createDataFrame([(rid, text)], "doc_id long, text string")
        for r in percolate(one, QUERIES, minimum_should_match=2).collect():
            want.append((rid, r["query_id"], r["n_matched"]))
    assert got == sorted(want)


def test_count_percolate_totals_include_zero(spark):
    """Count mode: every doc reports a total, 0 included (ES returns
    total:0 rather than omitting the request)."""
    from kafka_elasticsearch_standalone_consumer_spark.query.percolate import (
        count_percolate,
    )

    docs = spark.createDataFrame(
        [
            (0, "w00000 w00001"),   # matches q1 (1 term) and q2 (2 of 3)
            (1, "w00003"),          # q3 needs both terms with 'and'-ish msm
            (2, "zzz"),             # matches nothing
            (3, None),              # NULL text matches nothing
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_queries"]
        for r in count_percolate(docs, QUERIES, minimum_should_match=2).collect()
    }
    assert got == {0: 2, 1: 0, 2: 0, 3: 0}


def test_percolate_filter_and_size(spark):
    """ES 1.x percolate filter + size: the metadata filter narrows the
    REGISTERED set before the broadcast; size caps matches per doc,
    lowest query_id first (the pinned deterministic order)."""
    docs = spark.createDataFrame(
        [(0, "w00000 w00001 w00003"), (1, "w00000"), (2, "zzz")],
        "doc_id long, text string",
    )
    qs = [(1, "w00000"), (2, "w00001"), (3, "w00000 w00003"), (4, "w00003")]
    meta = {1: {"tag": "ops", "prio": 1}, 2: {"tag": "ml"},
            3: {"tag": "ops", "prio": 3}, 4: {"tag": "ops", "prio": 9}}

    # unfiltered baseline: doc 0 matches all four
    base = {(r["doc_id"], r["query_id"]) for r in percolate(docs, qs).collect()}
    assert base == {(0, 1), (0, 2), (0, 3), (0, 4), (1, 1), (1, 3)}

    # tag filter drops q2 everywhere
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate(
            docs, qs, queries_meta=meta, query_where=("tag", "=", "ops")
        ).collect()
    }
    assert got == {(0, 1), (0, 3), (0, 4), (1, 1), (1, 3)}

    # compound tuple list + numeric op
    got2 = {
        (r["doc_id"], r["query_id"])
        for r in percolate(
            docs, qs, queries_meta=meta,
            query_where=[("tag", "=", "ops"), ("prio", "<=", 3)],
        ).collect()
    }
    assert got2 == {(0, 1), (0, 3), (1, 1), (1, 3)}

    # size caps per-doc matches, query_id asc
    capped = {
        (r["doc_id"], r["query_id"])
        for r in percolate(docs, qs, size=2).collect()
    }
    assert capped == {(0, 1), (0, 2), (1, 1), (1, 3)}

    # queries with no metadata fail any non-null condition
    none_left = percolate(
        docs, qs, query_where=("missing_field", "=", "x")
    ).count()
    assert none_left == 0
