"""ES _count API (search_type=count): distributed count, its zero-job
local twin, match_all default, filters, min_should_match, tombstones,
and the filtered-alias wrap."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.corpus import generate_transcripts
from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
from kafka_elasticsearch_standalone_consumer_spark.pipeline.incremental import delete_docs
from kafka_elasticsearch_standalone_consumer_spark.query.engine import FilteredIndex, Index

Q = "w00000 w00003 w00015"


def _total(df):
    return df.collect()[0]["total"]


def test_count_matches_brute_force(spark, built_index, transcripts):
    idx, _ = built_index
    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col

    terms = sorted(set(Q.split()))
    brute = (
        transcripts.select(
            F.size(F.array_intersect(tokenize_col(F.col("text")), F.array(*[F.lit(t) for t in terms])))
            .alias("nt")
        )
        .filter(F.col("nt") >= 1)
        .count()
    )
    assert _total(idx.count(Q)) == brute
    # msm=2 and msm > #terms
    brute2 = (
        transcripts.select(
            F.size(F.array_intersect(tokenize_col(F.col("text")), F.array(*[F.lit(t) for t in terms])))
            .alias("nt")
        )
        .filter(F.col("nt") >= 2)
        .count()
    )
    assert _total(idx.count(Q, min_should_match=2)) == brute2
    assert _total(idx.count(Q, min_should_match=4)) == 0
    # match_all default: every live doc
    assert _total(idx.count()) == transcripts.count()
    # absent term
    assert _total(idx.count("zzabsent")) == 0


def test_count_local_twin_identical(spark, built_index):
    idx, _ = built_index
    for q, msm in ((Q, 1), (Q, 2), (Q, 4), ("", 1), ("zzabsent", 1)):
        assert idx.count_local(q, min_should_match=msm) == _total(
            idx.count(q, min_should_match=msm)
        ), (q, msm)
    # filter surfaces: SQL string distributed, tuple local
    dist = _total(idx.count(Q, where="role = 'user'"))
    loc = idx.count_local(Q, where=[("role", "=", "user")])
    assert loc == dist and dist > 0
    assert idx.count_local("", where=[("role", "=", "user")]) == _total(
        idx.count(where="role = 'user'")
    )


def test_count_tombstones_and_filtered_alias(spark, tmp_path):
    wh = str(tmp_path / "idx")
    t = generate_transcripts(spark, n_convs=40, seed=11)
    build_index(spark, t, wh, docs_per_shard=128, n_buckets=8)
    idx = Index(spark, wh)
    before = _total(idx.count(Q))
    doc = idx.search(Q, 1).collect()[0]["doc_id"]
    delete_docs(spark, wh, f"doc_id = {doc}")
    idx = Index(spark, wh)
    assert _total(idx.count(Q)) == before - 1
    assert idx.count_local(Q) == before - 1
    # filtered alias AND-s its filter into both twins
    fi = FilteredIndex(idx, [("role", "=", "user")])
    assert _total(fi.count(Q)) == _total(idx.count(Q, where="role = 'user'"))
    assert fi.count_local(Q) == idx.count_local(Q, where=[("role", "=", "user")])
