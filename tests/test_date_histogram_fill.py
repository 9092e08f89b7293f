"""date_histogram min_doc_count / extended_bounds (ES 1.x fill semantics)."""

from __future__ import annotations

from datetime import datetime

from kafka_elasticsearch_standalone_consumer_spark.query.aggs import date_histogram


def _df(spark, days):
    return spark.createDataFrame(
        [(datetime(2024, 1, d, 12, 30),) for d in days], "ts timestamp"
    )


def test_fill_interior_gaps(spark):
    got = [
        (r["bucket"], r["n"])
        for r in date_histogram(_df(spark, [1, 1, 4]), "ts", "day", min_doc_count=0).collect()
    ]
    assert got == [
        ("2024-01-01", 2),
        ("2024-01-02", 0),
        ("2024-01-03", 0),
        ("2024-01-04", 1),
    ]


def test_extended_bounds_widen_and_data_can_exceed_them(spark):
    got = [
        (r["bucket"], r["n"])
        for r in date_histogram(
            _df(spark, [2, 3]),
            "ts",
            "day",
            min_doc_count=0,
            extended_bounds=("2023-12-31", "2024-01-03"),
        ).collect()
    ]
    assert got == [
        ("2023-12-31", 0),
        ("2024-01-01", 0),
        ("2024-01-02", 1),
        ("2024-01-03", 1),
    ]
    # bounds narrower than the data never truncate (ES: union of both)
    got2 = [
        r["bucket"]
        for r in date_histogram(
            _df(spark, [1, 5]),
            "ts",
            "day",
            min_doc_count=0,
            extended_bounds=("2024-01-02", "2024-01-03"),
        ).collect()
    ]
    assert got2 == [f"2024-01-0{d}" for d in range(1, 6)]


def test_empty_input(spark):
    empty = _df(spark, []).filter("ts IS NOT NULL")
    assert date_histogram(empty, "ts", "day", min_doc_count=0).count() == 0
    rows = date_histogram(
        empty, "ts", "day", min_doc_count=0, extended_bounds=("2024-01-01", "2024-01-03")
    ).collect()
    assert [(r["bucket"], r["n"]) for r in rows] == [
        ("2024-01-01", 0),
        ("2024-01-02", 0),
        ("2024-01-03", 0),
    ]


def test_min_doc_count_filters_sparse_buckets(spark):
    got = [
        (r["bucket"], r["n"])
        for r in date_histogram(
            _df(spark, [1, 1, 2, 3, 3, 3]), "ts", "day", min_doc_count=2
        ).collect()
    ]
    assert got == [("2024-01-01", 2), ("2024-01-03", 3)]


def test_month_unit_fill(spark):
    df = spark.createDataFrame(
        [(datetime(2024, 1, 15),), (datetime(2024, 4, 2),)], "ts timestamp"
    )
    got = [(r["bucket"], r["n"]) for r in date_histogram(df, "ts", "month", min_doc_count=0).collect()]
    assert got == [("2024-01", 1), ("2024-02", 0), ("2024-03", 0), ("2024-04", 1)]


def test_numeric_histogram_fill(spark):
    """The numeric twin: interior gaps fill with n=0, extended_bounds
    widen, buckets are exact multiples of the interval, min_doc_count>1
    filters sparse buckets, empty input w/o bounds yields zero rows."""
    from kafka_elasticsearch_standalone_consumer_spark.query.aggs import histogram

    df = spark.createDataFrame(
        [(1, 5.0), (2, 7.0), (3, 55.0)], "id long, v double"
    )
    got = {r["bucket"]: r["n"] for r in histogram(df, "v", 10.0, min_doc_count=0).collect()}
    assert got == {0.0: 2, 10.0: 0, 20.0: 0, 30.0: 0, 40.0: 0, 50.0: 1}
    wide = {r["bucket"]: r["n"] for r in histogram(
        df, "v", 10.0, min_doc_count=0, extended_bounds=(-10.0, 70.0)).collect()}
    assert wide[-10.0] == 0 and wide[60.0] == 0 and wide[70.0] == 0
    assert len(wide) == 9 and wide[0.0] == 2
    sparse = {r["bucket"]: r["n"] for r in histogram(df, "v", 10.0, min_doc_count=2).collect()}
    assert sparse == {0.0: 2}
    empty = df.filter("id < 0")
    assert histogram(empty, "v", 10.0, min_doc_count=0).count() == 0
    assert histogram(empty, "v", 10.0, min_doc_count=0,
                     extended_bounds=(0.0, 20.0)).count() == 3
