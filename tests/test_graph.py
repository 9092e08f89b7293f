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


def _ref_hits(edges, n_iter):
    """Pure-Python HITS with max normalization, ascending-neighbor folds."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    a = {v: 1.0 for v in nodes}
    h = {v: 1.0 for v in nodes}
    for _ in range(n_iter):
        raw = {v: 0.0 for v in nodes}
        for u, w in sorted(set(edges)):          # ascending (src, dst)
            raw[w] += h[u]
        mx = max(raw.values())
        a = {v: (raw[v] / mx if mx > 0 else 0.0) for v in nodes}
        raw = {v: 0.0 for v in nodes}
        for u, w in sorted(set(edges), key=lambda e: (e[1], e[0])):
            raw[u] += a[w]
        mx = max(raw.values())
        h = {v: (raw[v] / mx if mx > 0 else 0.0) for v in nodes}
    return a, h


def test_hits_matches_python_reference(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.graph import hits

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["auth"], r["hub"]) for r in hits(df, n_iter=5, deterministic=True).collect()}
    a, h = _ref_hits(edges, 5)
    assert set(got) == set(a)
    for v in a:
        assert got[v][0] == a[v], ("auth", v)   # bit-identical fold
        assert got[v][1] == h[v], ("hub", v)
    # node 3 is the authority (most endorsed); node 1 the best hub
    assert max(a, key=a.get) == 3
    assert max(h, key=h.get) == 1
    # the at-scale plain-sum path agrees to float tolerance
    loose = {r["node"]: (r["auth"], r["hub"]) for r in hits(df, n_iter=5).collect()}
    for v in a:
        assert abs(loose[v][0] - a[v]) < 1e-12


def test_hits_guards_and_degenerates(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.graph import hits

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iter"):
        hits(df, n_iter=0)
    got = {r["node"]: (r["auth"], r["hub"]) for r in hits(df, n_iter=3, deterministic=True).collect()}
    # 0→1: node 1 is the only authority, node 0 the only hub
    assert got[1] == (1.0, 0.0) and got[0] == (0.0, 1.0)
    assert hits(df.filter("src < 0"), n_iter=2).count() == 0
