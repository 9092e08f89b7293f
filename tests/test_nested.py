"""ES ``nested`` field type: per-nested-object query scoping + the
nested aggregation with reverse_nested parent counts.

The load-bearing semantic is cross-object false-match avoidance: a
condition like ``x.a = 1 AND x.b = 2`` must hold inside ONE object — a
flattened object field (what a naive index does) matches a doc whose
objects satisfy the two conjuncts separately. ES 1.x indexes nested
objects as hidden sub-documents to get this right (the mapping rides
behind the reference's ``prepareIndex`` boundary,
ref: MessageHandler.java:135-139); here the clause compiles to
higher-order Column functions over the array column."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index


@pytest.fixture(scope="module")
def nested_idx(spark):
    """Four docs with hand-built nested ``calls`` arrays.

    doc 0: the TRAP — has (name='a', ms=1.0) and (name='b', ms=9.0):
           matches 'name=a' and 'ms>=5' separately but in DIFFERENT
           objects; a flattened AND would false-match it.
    doc 1: (name='a', ms=7.0) — a genuine same-object match.
    doc 2: (name='a', ms=5.0), (name='a', ms=9.0) — TWO matching objects.
    doc 3: no matching objects at all (and doc text misses the query).
    """
    rows = [
        (0, "alpha beta", [("a", 1.0), ("b", 9.0)]),
        (1, "alpha beta", [("a", 7.0)]),
        (2, "alpha gamma", [("a", 5.0), ("a", 9.0), ("b", 1.0)]),
        (3, "delta", []),
    ]
    df = spark.createDataFrame(
        [
            (d, t, [{"name": n, "ms": m} for n, m in arr])
            for d, t, arr in rows
        ],
        "doc_id long, text string, calls array<struct<name:string,ms:double>>",
    )
    return Index.ephemeral(df, docs_per_shard=4, n_buckets=4)


INNER = "x.name = 'a' AND x.ms >= 5.0"


def test_nested_only_per_object_scoping(nested_idx):
    got = nested_idx.search_nested(
        "", 10, nested_col="calls", inner_where=INNER, score_mode="sum"
    ).collect()
    # doc 0 is the trap: satisfies the conjuncts only across objects
    assert {r["doc_id"]: r["score"] for r in got} == {1: 1.0, 2: 2.0}


def test_flattened_semantics_would_false_match(nested_idx):
    """The trap doc DOES match under flattened semantics — proving the
    fixture exercises the distinction, not a vacuous case."""
    flat = nested_idx._docs_df().filter(
        "exists(calls, x -> x.name = 'a') AND exists(calls, x -> x.ms >= 5.0)"
    )
    assert 0 in {r["doc_id"] for r in flat.collect()}


def test_score_modes(nested_idx):
    def score(mode, inner_score=None):
        rows = nested_idx.search_nested(
            "", 10, nested_col="calls", inner_where=INNER,
            score_mode=mode, inner_score=inner_score,
        ).collect()
        return {r["doc_id"]: r["score"] for r in rows}

    assert score("sum", "x.ms") == {1: 7.0, 2: 14.0}
    assert score("avg", "x.ms") == {1: 7.0, 2: 7.0}
    assert score("max", "x.ms") == {1: 7.0, 2: 9.0}
    assert score("min", "x.ms") == {1: 7.0, 2: 5.0}
    assert score("none") == {1: 0.0, 2: 0.0}
    with pytest.raises(ValueError):
        nested_idx.search_nested(
            "", 10, nested_col="calls", inner_where=INNER, score_mode="prod"
        )


def test_bool_must_combination(nested_idx):
    """Text query + nested clause: both must match, scores add."""
    base = {
        r["doc_id"]: r["score"]
        for r in nested_idx.search_oracle("alpha", None).collect()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in nested_idx.search_nested(
            "alpha", 10, nested_col="calls", inner_where=INNER, score_mode="sum"
        ).collect()
    }
    assert set(got) == {1, 2}  # doc 0 fails nested, doc 3 fails text
    for d, s in got.items():
        assert math.isclose(s, base[d] + (1.0 if d == 1 else 2.0))


def test_nested_agg_counts_and_reverse_nested(spark, nested_idx):
    got = nested_idx.nested_agg(
        "alpha", "calls", "name", metric="x.ms"
    ).collect()
    by_bucket = {r["bucket"]: (r["n_nested"], r["n_parents"], r["avg_v"]) for r in got}
    # docs 0,1,2 match 'alpha': name='a' objects = 1+1+2, across 3 parents
    assert by_bucket["a"] == (4, 3, round((1.0 + 7.0 + 5.0 + 9.0) / 4, 6))
    assert by_bucket["b"] == (2, 2, 5.0)
    # ES terms-agg order: count desc, bucket asc
    assert [r["bucket"] for r in got] == ["a", "b"]


def test_reverse_nested_agg_parent_metric(nested_idx):
    """Explicit reverse_nested: a parent contributes to a bucket ONCE no
    matter how many of its objects land there, and the metric is computed
    over the PARENT row (text length), not the objects."""
    got = nested_idx.reverse_nested_agg(
        "alpha", "calls", "name", "length(text)"
    ).collect()
    by_bucket = {r["bucket"]: (r["n_parents"], r["avg_parent_v"]) for r in got}
    # docs 0,1,2 match 'alpha'; 'a' objects live in all three parents
    # (doc 2's TWO 'a' objects count its parent once); 'b' in docs 0 and 2
    la, lb, lc = len("alpha beta"), len("alpha beta"), len("alpha gamma")
    assert by_bucket["a"] == (3, round((la + lb + lc) / 3, 6))
    assert by_bucket["b"] == (2, round((la + lc) / 2, 6))
    assert [r["bucket"] for r in got] == ["a", "b"]
    # inner_where pre-filters objects before the step-back
    got2 = nested_idx.reverse_nested_agg(
        "alpha", "calls", "name", "length(text)", inner_where="x.ms >= 5.0"
    ).collect()
    by2 = {r["bucket"]: r["n_parents"] for r in got2}
    assert by2 == {"a": 2, "b": 1}


def test_nested_agg_inner_where(nested_idx):
    got = nested_idx.nested_agg(
        "alpha", "calls", "name", metric="x.ms", inner_where="x.ms >= 5.0"
    ).collect()
    by_bucket = {r["bucket"]: (r["n_nested"], r["n_parents"]) for r in got}
    assert by_bucket == {"a": (3, 2), "b": (1, 1)}


def test_nested_local_twin_identical(spark, tmp_path):
    """search_nested_local (tuple inner conditions, pyarrow + NumPy) must
    be score-identical to search_nested (SQL inner condition) on a
    persisted warehouse — every score_mode, with and without a text
    clause, nulls included."""
    import random

    from pyspark.sql import functions as F

    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index

    rng = random.Random(77)
    rows = []
    for i in range(80):
        arr = [
            {
                "name": rng.choice(["a", "b", None]),
                "ms": float(rng.randint(0, 9)),
            }
            for _ in range(rng.randint(0, 4))
        ]
        text = " ".join(rng.choices(["alpha", "beta", "gamma", "delta"], k=rng.randint(1, 6)))
        rows.append((i, text, arr))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, calls array<struct<name:string,ms:double>>"
    ).select(
        "text", "calls",
        F.format_string("c%010d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
    )
    wh = str(tmp_path / "nidx")
    build_index(spark, docs, wh, docs_per_shard=16, n_buckets=4)
    idx = Index(spark, wh)
    sql_inner = "x.name = 'a' AND x.ms >= 5.0"
    tup_inner = [("name", "=", "a"), ("ms", ">=", 5.0)]
    for q in ("alpha beta", ""):
        for mode in ("sum", "avg", "max", "min", "none"):
            dist = [
                (r["doc_id"], r["score"])
                for r in idx.search_nested(
                    q, 20, nested_col="calls", inner_where=sql_inner,
                    score_mode=mode, inner_score="x.ms",
                ).collect()
            ]
            loc = idx.search_nested_local(
                q, 20, nested_col="calls", inner=tup_inner,
                score_mode=mode, inner_score="ms",
            )
            assert loc == dist, (q, mode)
            assert dist or mode == "none" or q, (q, mode)
    # null-matching ops on the serving surface
    got = idx.search_nested_local(
        "", 100, nested_col="calls", inner=[("name", "isnull", None)],
        score_mode="sum",
    )
    want = {
        i for i, _t, arr in rows if any(o["name"] is None for o in arr)
    }
    assert {d for d, _ in got} == want


def test_nested_sort_modes_and_missing_last(nested_idx):
    """Sort-by-nested-field: mode rollup over matching objects only,
    missing docs (no matching object) last with NULL key, ties doc_id."""
    got = nested_idx.search_nested_sort(
        "alpha", 10, nested_col="calls", sort_expr="x.ms",
        inner_where=INNER, mode="max",
    ).collect()
    # doc 2 max=9, doc 1 max=7, doc 0 matches text but no object -> NULL last
    assert [(r["doc_id"], r["sort_v"]) for r in got] == [
        (2, 9.0), (1, 7.0), (0, None)
    ]
    got_min_asc = nested_idx.search_nested_sort(
        "alpha", 10, nested_col="calls", sort_expr="x.ms",
        inner_where=INNER, mode="min", ascending=True,
    ).collect()
    # missing still LAST in ascending order (ES missing _last)
    assert [(r["doc_id"], r["sort_v"]) for r in got_min_asc] == [
        (2, 5.0), (1, 7.0), (0, None)
    ]
    got_avg = nested_idx.search_nested_sort(
        "alpha", 10, nested_col="calls", sort_expr="x.ms",
        inner_where=INNER, mode="avg",
    ).collect()
    assert [(r["doc_id"], r["sort_v"]) for r in got_avg] == [
        (1, 7.0), (2, 7.0), (0, None)  # 7.0 tie broken by doc_id asc
    ]

    with pytest.raises(ValueError):
        nested_idx.search_nested_sort(
            "alpha", 10, nested_col="calls", sort_expr="x.ms", mode="median"
        )
