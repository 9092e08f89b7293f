"""Dense doc_id assignment: dense, stable, order-correct, partition-proof."""

from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.ids import assign_dense_ids


def test_dense_ids_match_row_number(spark):
    data = [(f"c{i % 37:03d}", i % 11) for i in range(500)]
    data = list(dict.fromkeys(data))
    df = spark.createDataFrame(data, "conv_id string, turn_idx int").repartition(7)
    got = assign_dense_ids(df, num_partitions=5).collect()
    expect = {
        (c, t): r for r, (c, t) in enumerate(sorted({(c, t) for c, t in data}))
    }
    assert len(got) == len(expect)
    for row in got:
        assert row["doc_id"] == expect[(row["conv_id"], row["turn_idx"])]
    spark.catalog.clearCache()


def test_dense_ids_stable_across_partitionings(spark, transcripts):
    a = assign_dense_ids(transcripts.repartition(3), num_partitions=4)
    b = assign_dense_ids(transcripts.repartition(9), num_partitions=2)
    am = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in a.select("conv_id", "turn_idx", "doc_id").collect()}
    bm = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in b.select("conv_id", "turn_idx", "doc_id").collect()}
    assert am == bm
    n = len(am)
    assert sorted(am.values()) == list(range(n))  # dense 0..n-1
    spark.catalog.clearCache()


def test_invariant_per_turn_text_equality(spark, transcripts):
    """BASELINE invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering — rebuild text via doc_id join."""
    with_ids = assign_dense_ids(transcripts, num_partitions=4)
    doc_map = with_ids.select("conv_id", "turn_idx", "doc_id")
    rejoined = (
        transcripts.join(doc_map, ["conv_id", "turn_idx"])
        .join(with_ids.select("doc_id", F.col("text").alias("text2")), "doc_id")
    )
    assert rejoined.filter(F.col("text") != F.col("text2")).count() == 0
    assert rejoined.count() == transcripts.count()
    spark.catalog.clearCache()
