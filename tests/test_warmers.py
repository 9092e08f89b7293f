"""ES 1.x _warmer API (pipeline/warmers.py): PUT/GET/DELETE registry
semantics and warm() returning exactly the plain query's top-k."""

from __future__ import annotations

import pytest

from kafka_elasticsearch_standalone_consumer_spark.pipeline.warmers import (
    delete_warmer,
    get_warmers,
    put_warmer,
    warm,
)
from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, "alpha beta"),
            (2, "alpha"),
            (3, "delta"),
        ],
        "doc_id long, text string",
    )
    return Index.ephemeral(df, docs_per_shard=4, n_buckets=4)


def test_registry_put_get_delete(tmp_path):
    reg = str(tmp_path / "warmers.json")
    put_warmer(reg, "daily_top", "alpha beta", k=3)
    put_warmer(reg, "daily_errors", "delta")
    put_warmer(reg, "weekly_top", "gamma", mode="exact")
    assert set(get_warmers(reg)) == {"daily_top", "daily_errors", "weekly_top"}
    assert set(get_warmers(reg, "daily_*")) == {"daily_top", "daily_errors"}
    # PUT replaces (ES semantics)
    put_warmer(reg, "daily_top", "alpha", k=1)
    assert get_warmers(reg)["daily_top"] == {"query_text": "alpha", "k": 1}
    assert delete_warmer(reg, "daily_*") == ["daily_errors", "daily_top"]
    assert set(get_warmers(reg)) == {"weekly_top"}
    assert delete_warmer(reg, "nomatch*") == []


def test_put_warmer_validates_body(tmp_path):
    reg = str(tmp_path / "warmers.json")
    with pytest.raises(ValueError):
        put_warmer(reg, "bad", "alpha", boost_mode="sum")
    with pytest.raises(ValueError):
        put_warmer(reg, "empty", "   ")


def test_warm_returns_the_plain_topk(idx, tmp_path):
    reg = str(tmp_path / "warmers.json")
    put_warmer(reg, "a", "alpha beta", k=3)
    put_warmer(reg, "b", "delta")
    rows = warm(idx, reg)
    by = {}
    for name, doc_id, rank, score in rows:
        by.setdefault(name, []).append((doc_id, rank, score))
    want_a = [
        (r["doc_id"], i + 1, r["score"])
        for i, r in enumerate(idx.search("alpha beta", 3).collect())
    ]
    want_b = [
        (r["doc_id"], i + 1, r["score"])
        for i, r in enumerate(idx.search("delta", 10).collect())
    ]
    assert by == {"a": want_a, "b": want_b}
    # pattern-scoped warm
    assert {r[0] for r in warm(idx, reg, "a")} == {"a"}
