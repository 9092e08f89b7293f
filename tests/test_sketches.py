"""Misra–Gries heavy hitters and Sequential Poisson weighted sampling."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import (
    _mg_reduce,
    heavy_hitters,
)
from kafka_elasticsearch_standalone_consumer_spark.ops.curation import weighted_sample


def _zipf_values(n_kinds: int = 300, scale: int = 1) -> list[str]:
    """Deterministic skewed multiset: value v_i appears scale*(n_kinds-i)
    times — strictly decreasing frequencies, no ties."""
    out = []
    for i in range(n_kinds):
        out.extend([f"v{i:04d}"] * (scale * (n_kinds - i)))
    return out


def test_mg_reduce_bounds_and_keeps_heavy():
    counters = {f"v{i}": i + 1 for i in range(100)}
    _mg_reduce(counters, 10)
    assert len(counters) <= 10
    # the heaviest keys survive a reduction
    assert "v99" in counters and "v98" in counters


def test_heavy_hitters_exact_vs_groupby(spark):
    vals = _zipf_values()
    df = spark.createDataFrame([(v,) for v in vals], "value string").repartition(8)
    # capacity below the 300-value vocab so partitions reduce, but large
    # enough that the 10th count (291) clears N/(capacity+1) = 175.7
    got = heavy_hitters(df, "value", k=10, capacity=256).collect()
    want = (
        df.groupBy("value")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("value"))
        .limit(10)
        .collect()
    )
    assert [(r["value"], r["freq"]) for r in got] == [
        (r["value"], r["freq"]) for r in want
    ]
    assert [r["rank"] for r in got] == list(range(1, 11))


def test_heavy_hitters_no_reduction_small_vocab(spark):
    # vocab smaller than capacity -> no partition reduces -> exact even when
    # the k-th count sits below the miss threshold
    df = spark.createDataFrame([(f"v{i % 5}",) for i in range(50)], "value string")
    got = heavy_hitters(df, "value", k=5, capacity=100).collect()
    assert len(got) == 5 and all(r["freq"] == 10 for r in got)
    # fewer distinct values than k: returns them all, still certified
    got2 = heavy_hitters(df, "value", k=4 + 10, capacity=100).collect()
    assert len(got2) == 5


def test_heavy_hitters_uncertifiable_raises(spark):
    # near-uniform data with a tiny capacity: reductions happen and the
    # k-th count cannot clear N/(capacity+1)
    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(2000)], "value string"
    ).repartition(4)
    with pytest.raises(RuntimeError, match="could not certify"):
        heavy_hitters(df, "value", k=5, capacity=20)
    # best-effort mode returns whatever survived, without the guarantee
    # (uniform freq-1 data can empty the sketch entirely — no heavy hitter
    # exists, so an empty candidate set is honest)
    rows = heavy_hitters(df, "value", k=5, capacity=20, require_certified=False).collect()
    assert len(rows) <= 5


def test_heavy_hitters_ignores_nulls_and_guards(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), ("b",)], "value string")
    got = heavy_hitters(df, "value", k=2, capacity=10).collect()
    assert [(r["value"], r["freq"]) for r in got] == [("a", 2), ("b", 1)]
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "value", k=0)
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, "value", k=10, capacity=10)


def _sps_key(doc_id: int, w: float, seed: int) -> float:
    h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:8]
    return (int(h, 16) / 4294967296.0) / w


def test_weighted_sample_matches_python_recompute(spark):
    rows = [(i, float(1 + i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [
        (r["doc_id"], r["xi"])
        for r in weighted_sample(df, "w", k=25, seed=7).collect()
    ]
    want = sorted(
        ((_sps_key(i, w, 7), i) for i, w in rows),
    )[:25]
    assert [d for _, d in want] == [d for d, _ in got]
    for (wk, _), (_, gx) in zip(want, got):
        assert gx == wk  # bit-identical keys, no rounding


def test_weighted_sample_excludes_nonpositive_and_is_stable(spark):
    rows = [(1, 5.0), (2, 0.0), (3, -1.0), (4, 2.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, "w", k=10, seed=42).collect()
    assert sorted(r["doc_id"] for r in got) == [1, 4]
    # reruns and repartitioning don't change the pick
    again = weighted_sample(df.repartition(3), "w", k=10, seed=42).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in again]
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(df, "w", k=0)


def test_weighted_sample_weight_bias(spark):
    # two weight classes 10:1 — the heavy class must dominate the sample
    rows = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, "w", k=200, seed=3).collect()
    heavy = sum(1 for r in got if r["doc_id"] % 2 == 0)
    assert heavy > 150


def test_hll_cardinality_accuracy_and_determinism(spark):
    """Portable HLL: estimate within the 3-sigma envelope of the exact
    count, bit-identical under repartitioning (the integer register sum
    is order-free), and exact linear counting at tiny cardinalities."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import (
        hll_cardinality,
    )

    df = spark.range(20000).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
    # duplicates must not move the estimate: union the stream with itself
    dup = df.unionAll(df)
    r = hll_cardinality(dup, "v", p=9, with_exact=True).collect()[0]
    assert r["n_exact"] == 20000
    assert abs(r["est_r"] / 20000 - 1.0) < 3 * 1.04 / 512**0.5
    r2 = hll_cardinality(dup.repartition(13), "v", p=9).collect()[0]
    assert r2["est_r"] == r["est_r"] and r2["reg_zeros"] == r["reg_zeros"]
    with pytest.raises(ValueError, match="p must be"):
        hll_cardinality(df, "v", p=3)


def test_hll_registers_merge_by_max(spark):
    """Register tables from disjoint halves max-merge to the whole-stream
    sketch — the mergeability that lets shards sketch independently."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import (
        hll_registers,
    )

    a = spark.range(0, 3000).select(F.concat(F.lit("x"), F.col("id")).alias("v"))
    b = spark.range(3000, 7000).select(F.concat(F.lit("x"), F.col("id")).alias("v"))
    whole = {
        (r["j"], r["rho"]) for r in hll_registers(a.unionAll(b), "v").collect()
    }
    ra = {r["j"]: r["rho"] for r in hll_registers(a, "v").collect()}
    for r in hll_registers(b, "v").collect():
        ra[r["j"]] = max(ra.get(r["j"], 0), r["rho"])
    assert set(ra.items()) == whole


def test_cms_one_sided_guarantee_and_merge(spark):
    """Count-Min: est >= true for EVERY probe (deterministic one-sided
    guarantee); registers merge by addition across splits (the shard
    story); and with w >> distinct values no collisions occur, so the
    estimates are exact."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import (
        cms_estimate,
        cms_registers,
    )

    rows = [(f"v{i % 7}",) for i in range(70)] + [("rare",)] * 3
    df = spark.createDataFrame(rows, "value string")
    probes = [f"v{i}" for i in range(7)] + ["rare", "absent"]

    got = {
        r["value"]: (r["est"], r["n_true"])
        for r in cms_estimate(df, "value", probes, d=4, w=64, with_exact=True).collect()
    }
    assert len(got) == len(probes)
    for v, (est, true) in got.items():
        assert est >= true, v
    assert got["rare"][1] == 3 and got["absent"][1] == 0

    # tiny w forces collisions -> still one-sided
    tight = {
        r["value"]: (r["est"], r["n_true"])
        for r in cms_estimate(df, "value", probes, d=2, w=4, with_exact=True).collect()
    }
    assert all(est >= true for est, true in tight.values())

    # wide sketch, 8 distinct values: exact
    wide = {
        r["value"]: (r["est"], r["n_true"])
        for r in cms_estimate(df, "value", probes, d=4, w=4096, with_exact=True).collect()
    }
    assert all(est == true for est, true in wide.values())

    # merge-by-addition: sketch(split1) + sketch(split2) == sketch(all)
    idf = spark.createDataFrame(
        [(i, v) for i, (v,) in enumerate(rows)], "i long, value string"
    )
    df1 = idf.filter("i % 2 = 0").select("value")
    df2 = idf.filter("i % 2 = 1").select("value")
    r_all = {(r["j"], r["b"]): r["c"] for r in cms_registers(df, "value", d=3, w=32).collect()}
    r1 = {(r["j"], r["b"]): r["c"] for r in cms_registers(df1, "value", d=3, w=32).collect()}
    r2 = {(r["j"], r["b"]): r["c"] for r in cms_registers(df2, "value", d=3, w=32).collect()}
    merged = {}
    for part in (r1, r2):
        for k, c in part.items():
            merged[k] = merged.get(k, 0) + c
    assert merged == r_all


def test_cms_null_values_dropped(spark):
    """NULL stream values carry no countable value: they are dropped
    before hashing (md5 would propagate NULL into the register key), so
    registers stay well-formed and n_seen counts real items only."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import (
        cms_estimate,
        cms_registers,
    )

    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,), ("b",)], "value string"
    )
    regs = cms_registers(df, "value", d=2, w=16).collect()
    assert all(r["b"] is not None for r in regs)
    assert sum(r["c"] for r in regs if r["j"] == 0) == 3  # row 0 total = non-null count
    got = {
        r["value"]: (r["est"], r["n_true"])
        for r in cms_estimate(df, "value", ["a", "b"], d=2, w=16, with_exact=True).collect()
    }
    assert got["a"] == (2, 2) and got["b"] == (1, 1)


def test_bloom_no_false_negatives_and_merge(spark):
    """Bloom filter: every PRESENT value answers true (deterministic
    one-sided guarantee — all k of its bits were set by its own
    occurrences); bit sets merge by union across splits (the shard
    story); NULLs are dropped before hashing."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import (
        bloom_bits,
        bloom_contains,
    )

    rows = [(f"v{i % 7}",) for i in range(70)] + [("rare",), (None,)]
    df = spark.createDataFrame(rows, "value string")
    probes = [f"v{i}" for i in range(7)] + ["rare", "absent0", "absent1"]

    got = {
        r["value"]: (r["present"], r["n_true"])
        for r in bloom_contains(
            df, "value", probes, k=4, m=4096, with_exact=True
        ).collect()
    }
    assert len(got) == len(probes)
    for v, (present, true) in got.items():
        if true > 0:
            assert present, v  # no false negatives, ever
    # 8 distinct values x 4 bits in 4096: far under saturation -> the
    # absent probes come back false here (a data-dependent fact this
    # fixture pins; the guarantee itself is only one-sided)
    assert not got["absent0"][0] and not got["absent1"][0]

    # a saturated filter (m=2) answers true for everything: the false
    # positive side is real and honestly one-sided
    sat = {
        r["value"]: r["present"]
        for r in bloom_contains(df, "value", ["absent0"], k=2, m=2).collect()
    }
    assert sat["absent0"]

    # merge-by-union: bits(split1) UNION bits(split2) == bits(all)
    idf = spark.createDataFrame(
        [(i, v) for i, (v,) in enumerate(rows)], "i long, value string"
    )
    df1 = idf.filter("i % 2 = 0").select("value")
    df2 = idf.filter("i % 2 = 1").select("value")
    b_all = {r["bit"] for r in bloom_bits(df, "value", k=3, m=64).collect()}
    b1 = {r["bit"] for r in bloom_bits(df1, "value", k=3, m=64).collect()}
    b2 = {r["bit"] for r in bloom_bits(df2, "value", k=3, m=64).collect()}
    assert (b1 | b2) == b_all
    assert None not in b_all  # NULL rows never hashed

    import pytest

    with pytest.raises(ValueError):
        bloom_bits(df, "value", k=0, m=64)
