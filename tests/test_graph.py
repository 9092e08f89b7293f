"""PageRank over an edge table: deterministic fold matches a sequential
pure-Python reference bit-for-bit; the scale-path sum agrees to fp noise."""

from __future__ import annotations

from collections import Counter

import pytest

from kafka_elasticsearch_standalone_consumer_spark.ops.graph import pagerank

EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 0), (3, 2), (4, 0), (4, 3)]


def _ref_pagerank(edges, n_iter, d):
    """Sequential float64 reference: contributions folded in ascending
    src order — the exact arithmetic the deterministic mode promises."""
    es = sorted(set(edges))
    nodes = sorted({s for s, _ in es} | {t for _, t in es})
    outdeg = Counter(s for s, _ in es)
    pr = {v: 1.0 / len(nodes) for v in nodes}
    tele = (1.0 - d) / len(nodes)
    for _ in range(n_iter):
        acc = {v: 0.0 for v in nodes}
        for s, t in es:  # sorted by (src, dst): per-dst folds go src-ascending
            acc[t] = acc[t] + pr[s] / outdeg[s]
        pr = {v: tele + d * acc[v] for v in nodes}
    return pr


def test_deterministic_matches_reference_bitwise(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long").repartition(4)
    got = {
        r["node"]: r["pr"]
        for r in pagerank(df, n_iter=5, damping=0.85, deterministic=True).collect()
    }
    want = _ref_pagerank(EDGES, 5, 0.85)
    assert got == want  # exact float equality, not approx


def test_sum_path_agrees_and_mass_conserved(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    det = {
        r["node"]: r["pr"]
        for r in pagerank(df, n_iter=5, deterministic=True).collect()
    }
    fast = {
        r["node"]: r["pr"]
        for r in pagerank(df, n_iter=5, deterministic=False).collect()
    }
    assert det.keys() == fast.keys()
    for v in det:
        assert abs(det[v] - fast[v]) < 1e-12
    # every node here has an out-edge -> no dangling leak: mass sums to 1
    assert abs(sum(det.values()) - 1.0) < 1e-9


def test_star_center_dominates_and_dupes_collapse(spark):
    star = [(i, 0) for i in range(1, 8)] + [(0, 1)]
    df = spark.createDataFrame(star + star, "src long, dst long")  # dup edges
    # 11 not 10: the 0<->1 cycle oscillates and node 1 transiently leads
    # on even iteration counts before convergence
    got = pagerank(df, n_iter=11, deterministic=True).collect()
    top = max(got, key=lambda r: r["pr"])
    assert top["node"] == 0
    want = _ref_pagerank(star, 11, 0.85)
    assert {r["node"]: r["pr"] for r in got} == want


def test_dangling_mass_decays_not_crashes(spark):
    # node 2 has no out-edges: its inflow is absorbed, total mass < 1
    df = spark.createDataFrame([(0, 2), (1, 2), (2 - 2, 1)], "src long, dst long")
    got = pagerank(df, n_iter=5, deterministic=True).collect()
    assert 0 < sum(r["pr"] for r in got) < 1.0
    assert {r["node"] for r in got} == {0, 1, 2}


def test_guards(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(df, n_iter=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
    empty = df.filter("src < 0")
    assert pagerank(empty, n_iter=2).count() == 0
