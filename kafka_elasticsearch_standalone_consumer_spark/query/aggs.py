"""ES-style aggregations beyond ``terms`` (histogram / range / stats /
date_histogram) — fully declarative.

Elasticsearch exposes these over the docs matching a query (the reference
fed ES 1.5.1, reference ``pom.xml:22``, whose facet/aggregation API
covers exactly this set); here each is pure Column algebra over a
DataFrame of documents, and :class:`~...engine.Index` methods scope them
to the BM25 match set via a left-semi join (same shape as
``Index.facets``: term-pruned tokens scan → distinct matching docs →
semi join → one aggregation — Catalyst owns the plan, the facet scan is
column-pruned to doc_id + the aggregated field).

Aggregations touch every matching doc, so at 100 TB these are the
declarative paths (one aggregation shuffle whose key cardinality is the
bucket count, with map-side partial aggregation) — never kernels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def histogram(df: DataFrame, field: str, interval: float) -> DataFrame:
    """ES histogram agg: fixed-width buckets, (bucket, n) ascending.

    Bucket key = floor(value / interval) * interval, ES's exact rule."""
    bucket = (F.floor(F.col(field) / F.lit(float(interval))) * F.lit(float(interval)))
    return (
        df.groupBy(bucket.cast("double").alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("bucket")
    )


def _range_label(field: str, bounds: list[float]) -> Column:
    """ES range-agg key: "*-b0", "b0-b1", …, "bn-*"."""
    c = F.col(field)
    expr = F.lit(f"{bounds[-1]}-*")
    for lo, hi in reversed(list(zip([None] + list(bounds), list(bounds) + [None]))):
        if hi is None:
            continue
        label = f"{'*' if lo is None else lo}-{hi}"
        cond = c < F.lit(float(hi)) if lo is None else (
            (c >= F.lit(float(lo))) & (c < F.lit(float(hi)))
        )
        expr = F.when(cond, F.lit(label)).otherwise(expr)
    return expr


def range_counts(df: DataFrame, field: str, bounds: list[float]) -> DataFrame:
    """ES range agg: half-open [lo, hi) buckets with open ends,
    (range_label, n) for non-empty buckets, label ascending."""
    return (
        df.groupBy(_range_label(field, sorted(bounds)).alias("range_label"))
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("range_label")
    )


def stats_summary(df: DataFrame, field: str) -> DataFrame:
    """ES stats agg: one row of count / min / max / sum / avg."""
    c = F.col(field).cast("double")
    return df.agg(
        F.count(c).cast("long").alias("n"),
        F.min(c).alias("min_v"),
        F.max(c).alias("max_v"),
        F.round(F.sum(c), 6).alias("sum_v"),
        F.round(F.avg(c), 6).alias("avg_v"),
    )


def date_histogram(df: DataFrame, ts_field: str, unit: str = "day") -> DataFrame:
    """ES date_histogram: calendar-interval buckets (day/month/year/hour),
    emitted as strings so cross-engine comparisons are timezone-stable
    (the session zone is pinned to UTC in session.py)."""
    fmt = {
        "hour": "yyyy-MM-dd HH:00",
        "day": "yyyy-MM-dd",
        "month": "yyyy-MM",
        "year": "yyyy",
    }[unit]
    return (
        df.groupBy(F.date_format(F.col(ts_field), fmt).alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("bucket")
    )
