"""ES aggregation surfaces (histogram / range / stats / date_histogram):
each checked against a pure-Python recomputation over the fetched match
set, and scoping must respect filters, min_should_match, and tombstones
(they share facets' _agg_scope)."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text

Q = "w00000 w00003"


def _matched_rows(idx, q, msm=1, where=None):
    terms = set(tokenize_text(q))
    rows = idx._docs_df().collect()
    out = []
    for r in rows:
        toks = set(tokenize_text(r["text"]))
        if len(terms & toks) >= msm and (where is None or where(r)):
            out.append(r)
    return out


def test_histogram_matches_python(spark, built_index):
    idx, _ = built_index
    got = {r["bucket"]: r["n"] for r in idx.histogram(Q, "turn_idx", 5.0).collect()}
    want = Counter(math.floor(r["turn_idx"] / 5.0) * 5.0 for r in _matched_rows(idx, Q))
    assert got == dict(want) and got


def test_range_agg_matches_python(spark, built_index):
    idx, _ = built_index
    got = {r["range_label"]: r["n"] for r in idx.range_agg(Q, "turn_idx", [3, 8]).collect()}

    def label(v):
        return "*-3" if v < 3 else ("3-8" if v < 8 else "8-*")

    want = Counter(label(r["turn_idx"]) for r in _matched_rows(idx, Q))
    assert got == dict(want) and got


def test_stats_agg_matches_python(spark, built_index):
    idx, _ = built_index
    row = idx.stats_agg(Q, "turn_idx").collect()[0]
    vals = [r["turn_idx"] for r in _matched_rows(idx, Q)]
    assert row["n"] == len(vals)
    assert row["min_v"] == min(vals) and row["max_v"] == max(vals)
    assert row["sum_v"] == round(float(sum(vals)), 6)
    assert abs(row["avg_v"] - sum(vals) / len(vals)) < 1e-6


def test_date_histogram_matches_python(spark, built_index):
    idx, _ = built_index
    got = {r["bucket"]: r["n"] for r in idx.date_histogram(Q, "ts", "day").collect()}
    want = Counter(r["ts"].strftime("%Y-%m-%d") for r in _matched_rows(idx, Q))
    assert got == dict(want) and got


def test_agg_scope_respects_filter_and_msm(spark, built_index):
    idx, _ = built_index
    got = {
        r["bucket"]: r["n"]
        for r in idx.histogram(
            Q, "turn_idx", 5.0, where="role = 'user'", min_should_match=2
        ).collect()
    }
    want = Counter(
        math.floor(r["turn_idx"] / 5.0) * 5.0
        for r in _matched_rows(idx, Q, msm=2, where=lambda r: r["role"] == "user")
    )
    assert got == dict(want)
    # empty query -> empty result, stable schema
    assert idx.histogram("", "turn_idx", 5.0).count() == 0
