"""Multi-field BM25 (ES multi_match): most_fields sums per-field scores,
best_fields is dis-max (max + tie_breaker × rest); per-field statistics
are independent. Checked against a pure-Python recompute."""

from __future__ import annotations

import math

import pytest

from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text
from kafka_elasticsearch_standalone_consumer_spark.query.multifield import multi_field_bm25

Q = "w00000 w00003"
FIELDS = {"head": 2.0, "text": 1.0}


@pytest.fixture(scope="module")
def fielded_docs(spark, transcripts):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col

    df = transcripts.select(
        F.row_number().over(Window.orderBy("conv_id", "turn_idx")).alias("doc_id"),
        "text",
        F.array_join(F.slice(tokenize_col(F.col("text")), 1, 4), " ").alias("head"),
    )
    df.persist().count()
    return df


def _python_field_scores(rows, field, boost, terms, k1=1.2, b=0.75):
    toks = {r["doc_id"]: tokenize_text(r[field]) for r in rows}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for q in terms:
        df[q] = sum(1 for t in toks.values() if q in t)
    out = {}
    for d, ts in toks.items():
        s = 0.0
        for q in terms:
            c = ts.count(q)
            if c and df[q]:
                idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
                s += boost * idf * c / (c + k1 * (1 - b + b * len(ts) / (avgdl or 1e-9)))
        if s:
            out[d] = s
    return out


def _want(rows, mode, tie_breaker=0.0):
    terms = tokenize_text(Q)
    per_field = {
        f: _python_field_scores(rows, f, boost, terms) for f, boost in FIELDS.items()
    }
    docs = set().union(*[set(v) for v in per_field.values()])
    combined = {}
    for d in docs:
        fs = [v[d] for v in per_field.values() if d in v]
        if mode == "most_fields":
            combined[d] = sum(fs)
        else:
            combined[d] = max(fs) + tie_breaker * (sum(fs) - max(fs))
    ranked = sorted(combined.items(), key=lambda x: (-x[1], x[0]))[:10]
    return [(d, round(s, 9)) for d, s in ranked]


def test_most_and_best_fields_match_python(spark, fielded_docs):
    rows = fielded_docs.collect()
    got_most = [
        (r["doc_id"], round(r["score"], 9))
        for r in multi_field_bm25(fielded_docs, Q, FIELDS, 10).collect()
    ]
    assert got_most == _want(rows, "most_fields") and got_most

    got_best = [
        (r["doc_id"], round(r["score"], 9))
        for r in multi_field_bm25(
            fielded_docs, Q, FIELDS, 10, mode="best_fields", tie_breaker=0.3
        ).collect()
    ]
    assert got_best == _want(rows, "best_fields", 0.3) and got_best

    # tie_breaker=1.0 degenerates to most_fields; unknown mode rejected
    got_tb1 = [
        (r["doc_id"], round(r["score"], 9))
        for r in multi_field_bm25(
            fielded_docs, Q, FIELDS, 10, mode="best_fields", tie_breaker=1.0
        ).collect()
    ]
    assert got_tb1 == got_most
    with pytest.raises(ValueError, match="mode"):
        multi_field_bm25(fielded_docs, Q, FIELDS, 10, mode="nope")
