"""Link-graph quality weighting: distributed PageRank over an edge table.

Web-scale pretraining curation weights documents by link authority
(CommonCrawl-style harmonic/PageRank centrality); this is the DataFrame
form over an arbitrary ``(src, dst)`` edge table. It composes with the
repo's other graph op (``ops/dedup.dup_clusters`` connected components)
— same join primitives, same driver-side fixed iteration control.

Reference parity: the reference daemon has no graph op (it delegates all
ranking to ES/Lucene, ref MessageHandler.java:135-139); this covers the
"beyond the reference: training-data pipeline" mandate alongside dedup
and ANN.

Scale shape (per iteration): ONE shuffle joining edges to the current
rank vector on ``src`` (hash join; at 100 TB pre-partition or bucket the
edge table by src once so every iteration's join co-locates without a
fresh edge shuffle), then ONE shuffle aggregating contributions by
``dst``.  ``deterministic=False`` (the at-scale default) aggregates with
a plain ``sum`` — map-side partial aggregation, bounded state, skewed
in-degree (celebrity pages) handled by AQE skew-split.
``deterministic=True`` folds each node's contributions in ascending-src
order (``sort_array(collect_list)`` + sequential float64 ``aggregate``),
making the result BIT-identical across runs, partitionings, and engines
(DuckDB ``list_sum`` over ``list(... ORDER BY src)`` folds identically —
the repo's MMR/semdedup precedent); its per-node state is in-degree-
sized, so reserve it for verification, not the 100-TB path.

Dangling mass: nodes with no out-edges absorb rank without
redistributing it (their mass decays toward the teleport term). That is
the exact semantics the unrolled-SQL oracle mirrors; classic dangling
redistribution adds a 1-row aggregate crossJoin per iteration and is
deliberately not done here — callers who need stochastic-matrix
normalization can add a sink self-loop per dangling node to the edge
table, which keeps both engines in lockstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    deterministic: bool = False,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank. Returns ``(node, pr)`` for every node
    appearing as an endpoint. Duplicate edges are collapsed (unweighted
    graph). ``n_iter`` is fixed rather than convergence-tested so the
    result is a pure function of the input — production runs would stop
    on an L1-delta threshold (one bounded scalar aggregate per round).
    Long lineages are truncated with an eager ``localCheckpoint`` every
    8 rounds, the ``dup_clusters`` pattern."""
    if n_iter < 1:
        raise ValueError("n_iter must be ≥ 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # bounded control-plane scalar (node count, not rows)
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("pr"))
    outdeg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    tele = (1.0 - damping) / n  # same IEEE ops as the oracle's (1-d)/n
    pr = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    for i in range(n_iter):
        contribs = (
            e.join(pr.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select("dst", "src", (F.col("pr") / F.col("deg")).alias("c"))
        )
        if deterministic:
            s = contribs.groupBy("dst").agg(
                F.aggregate(
                    F.sort_array(F.collect_list(F.struct("src", "c"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["c"],
                ).alias("s")
            )
        else:
            s = contribs.groupBy("dst").agg(F.sum("c").alias("s"))
        pr = (
            nodes.join(s, nodes["node"] == s["dst"], "left")
            .select(
                "node",
                (
                    F.lit(tele)
                    + F.lit(float(damping)) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("pr"),
            )
        )
        if (i + 1) % 8 == 0 and i + 1 < n_iter:
            pr = pr.localCheckpoint()
    return pr


def hits(
    edges: DataFrame,
    n_iter: int = 5,
    deterministic: bool = False,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999, hubs & authorities) over an
    unweighted edge table — the other classic link-centrality signal
    next to :func:`pagerank` (authority ≈ endorsed content, hub ≈
    curatorial link pages; web-curation pipelines weight by either).

    Per round: ``a(v) = Σ_{(u,v)∈E} h(u)`` then ``h(v) = Σ_{(v,w)∈E}
    a(w)``, each normalized by its MAXIMUM. Max-normalization (HITS
    converges under any positive scaling) is chosen deliberately: max
    is float-order-INDEPENDENT where the classic L2 norm would add a
    whole-vector ordered sum, so the only order-sensitive op left is
    the per-node contribution sum — handled exactly like pagerank's:
    ``deterministic=True`` folds in ascending-neighbor order
    (``sort_array(collect_list)`` + sequential float64 aggregate ==
    DuckDB ``list_sum(list(... ORDER BY ...))``), giving BIT-identical
    results across runs/partitionings/engines; ``deterministic=False``
    is the at-scale plain-sum path (map-side partials, AQE skew-split).
    Nodes with no in-edges hold authority 0; no out-edges, hub 0.

    Returns ``(node, auth, hub)``. Scale shape per round: two
    join+keyed-agg shuffle pairs (one per vector) plus a 1-row max
    aggregate broadcast back (the accepted 1-row crossJoin pattern) —
    the same plan family as pagerank. Each half-round's raw vector is
    localCheckpoint-ed: it has two consumers (the max aggregate and
    the division), so without materialization the recomputed lineage
    doubles per half-round; the checkpointed state is node-sized."""
    if n_iter < 1:
        raise ValueError("n_iter must be ≥ 1")
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )

    def _step(vec: DataFrame, vcol: str, join_key: str, group_key: str, out: str):
        """One half-round: sum vec[vcol] over edges joined on join_key,
        keyed by group_key, max-normalized."""
        contribs = e.join(vec.withColumnRenamed("node", join_key), join_key).select(
            F.col(group_key).alias("node"),
            F.col(join_key).alias("nbr"),
            F.col(vcol).alias("c"),
        )
        if deterministic:
            s = contribs.groupBy("node").agg(
                F.aggregate(
                    F.sort_array(F.collect_list(F.struct("nbr", "c"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["c"],
                ).alias("s")
            )
        else:
            s = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        raw = nodes.join(s, "node", "left").select(
            "node", F.coalesce(F.col("s"), F.lit(0.0)).alias("raw")
        )
        # raw has TWO consumers (the max aggregate and the division), so
        # materialize the node-sized vector once — otherwise every
        # half-round doubles the recomputed lineage (2^rounds blowup)
        raw = raw.localCheckpoint()
        mx = raw.agg(F.max("raw").alias("mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            "node",
            F.when(F.col("mx") > 0.0, F.col("raw") / F.col("mx"))
            .otherwise(F.lit(0.0))
            .alias(out),
        )

    a = nodes.select("node", F.lit(1.0).alias("auth"))
    h = nodes.select("node", F.lit(1.0).alias("hub"))
    for _i in range(n_iter):
        a = _step(h, "hub", "src", "dst", "auth")
        h = _step(a, "auth", "dst", "src", "hub")
    return a.join(h, "node")
