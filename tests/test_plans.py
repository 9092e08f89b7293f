"""Physical-plan assertions (SURVEY §3.3/§4.2): the optimizations we rely
on must be visible in the plan, not assumed — partition pruning on the
postings scan, predicate pushdown, broadcast of query-term weights, and
whole-stage codegen on the oracle path.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df, mode="formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_postings_scan_is_partition_pruned(spark, built_index):
    idx, path = built_index
    idfw, buckets = idx._plan_terms("w00000 w00412")
    hits = idx.postings.filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(list(idfw))
    )
    plan = _plan(hits)
    # directory-level pruning on the bucket partition column
    assert "PartitionFilters" in plan
    seg = plan[plan.index("PartitionFilters") :]
    assert "term_bucket" in seg[: seg.index("]") + 1]
    # row-group/predicate pushdown on the term column
    assert "PushedFilters" in plan
    seg = plan[plan.index("PushedFilters") :]
    assert "term" in seg[: seg.index("]") + 1]


def test_postings_scan_prunes_columns(spark, built_index):
    idx, _ = built_index
    pruned = idx.postings.select("term", "shard", "n_docs")
    plan = _plan(pruned)
    seg = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "docs:binary" not in seg and "tfs:binary" not in seg  # blobs not read
    assert "n_docs:int" in seg


def test_oracle_uses_broadcast_and_codegen(spark, built_index):
    idx, _ = built_index
    df = idx.search_oracle("w00000 w00412", 10)
    df.collect()  # AQE: the final plan (with codegen spans) exists post-run
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "WholeStageCodegen" in plan or "isFinalPlan=true" in plan


def test_term_lookup_is_driver_side(spark, built_index):
    """Warehouse-backed term planning must not launch a Spark job."""
    idx, _ = built_index
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    rows = idx._lookup_terms_arrow(["w00000", "w00412", "zzabsent"])
    after = tracker.getJobIdsForGroup(None)
    assert rows is not None and len(rows) >= 2
    assert before == after


def test_ann_and_ivf_scans_are_partition_pruned(spark, transcripts, tmp_path):
    """Materialized vector indexes: the probe predicate must hit the
    partition column (sig / list_id) as a PartitionFilter — directory-level
    pruning, the same shape as the postings term_bucket scan."""
    import numpy as np

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        ANN_TABLE,
        IVF_TABLE,
        ann_topk_indexed,
        build_ann_index,
        build_ivf_index,
        ivf_search,
    )

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    ann_wh = str(tmp_path / "ann")
    build_ann_index(emb, ann_wh, bits=6, dim=16)
    plan = _plan(ann_topk_indexed(spark, ann_wh, [float(x) for x in vecs[0]], 5))
    seg = plan[plan.index("PartitionFilters") :]
    assert "sig" in seg[: seg.index("]") + 1]

    ivf_wh = str(tmp_path / "ivf")
    build_ivf_index(emb, vecs[:4].astype(np.float64), ivf_wh)
    plan = _plan(ivf_search(spark, ivf_wh, [float(x) for x in vecs[0]], 5, nprobe=2))
    seg = plan[plan.index("PartitionFilters") :]
    assert "list_id" in seg[: seg.index("]") + 1]


def test_function_score_join_is_column_pruned(spark, built_index):
    """function_score joins the doc store pruned to (doc_id, field) —
    the plan must not read the text column."""
    idx, _ = built_index
    plan = _plan(idx.function_score("w00000 w00412", "turn_idx", 10, modifier="log1p"))
    docs_scans = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln and "turn_idx" in ln
    ]
    assert docs_scans and all("text" not in ln for ln in docs_scans)


def test_significant_terms_sizes_are_broadcast(spark, built_index):
    """The two one-row size aggregates must join via broadcast (nested
    loop on a 1-row side), never a shuffle keyed on them."""
    idx, _ = built_index
    plan = _plan(idx.significant_terms("w00000 w00412", size=5))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_search_sort_is_topk_not_global_sort(spark, built_index):
    """Field-sorted search must compile to TakeOrderedAndProject (per-
    partition top-k + k-row merge), never a global Sort, and must not
    touch the text column after the match set is built."""
    idx, _ = built_index
    df = idx.search_sort("w00000 w00412", "turn_idx", 10)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan


def test_composite_agg_is_paged_topk(spark, built_index):
    """Composite agg: partial (map-side) aggregation on the composite
    key, the after-key predicate applied before the ordering, and a
    TakeOrderedAndProject page — no global bucket sort."""
    idx, _ = built_index
    df = idx.composite_agg(
        "w00000 w00412",
        [("role", "role"), ("b4", "cast(turn_idx % 4 as string)")],
        size=3,
        after=("assistant", "1"),
    )
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    # two-phase aggregation: a partial_ merge mode appears before the final
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_decontaminate_broadcasts_and_never_cross_joins(spark, built_index):
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import decontaminate

    idx, _ = built_index
    docs = idx._docs_df().select("doc_id", "text")
    df = decontaminate(
        docs.filter("doc_id % 10 != 0"), docs.filter("doc_id % 10 = 0"), n=3
    )
    df.collect()  # AQE final plan
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_pack_shards_has_no_window_or_single_partition_sort(spark, built_index):
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import pack_shards

    idx, _ = built_index
    df = pack_shards(idx._docs_df().select("doc_id", "text"), 500, num_partitions=4)
    plan = _plan(df)
    assert "Window" not in plan  # the naive serial cumsum shape
    assert "MapInPandas" in plan
    # the only exchange is the range repartition (plus AQE read stages)
    assert "rangepartitioning" in plan.lower()
    assert "SinglePartition" not in plan


def test_dup_spans_plan_no_cartesian(spark, built_index):
    """dup_span_stats must be gram-keyed aggregation + join — never an
    all-pairs product — and the doc-side rollup a partial-agg groupBy."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import dup_span_stats

    idx, _ = built_index
    docs = idx._docs_df().select("doc_id", "text")
    plan = _plan(dup_span_stats(docs, n=5))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan  # map-side partials on the gram key


def test_children_agg_plan_shape(spark, built_index):
    """children_agg: one join keyed on the parent key + one groupBy on
    the bucket — no window, no cartesian; the final order is over bucket
    cardinality only (tiny), not the corpus."""
    idx, _ = built_index
    parents = (
        idx._docs_df().select("conv_id").distinct()
        .select("conv_id", F.substring("conv_id", 1, 6).alias("grp"))
    )
    plan = _plan(idx.children_agg("w00000", parents, "grp"))
    assert "CartesianProduct" not in plan and "Window" not in plan
    assert "HashAggregate" in plan


def test_nested_clause_is_scan_fused_no_explode(spark):
    """search_nested: the nested clause must compile to higher-order
    functions fused into the doc scan — NO Generate (explode) and no
    window; the only exchanges serve the doc_id join/top-k. nested_agg
    is the one place a Generate is expected (it steps INTO the objects)."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    df = spark.createDataFrame(
        [(i, "alpha beta", [{"name": "a", "ms": float(i)}]) for i in range(8)],
        "doc_id long, text string, calls array<struct<name:string,ms:double>>",
    )
    idx = Index.ephemeral(df, docs_per_shard=4, n_buckets=4)
    plan = _plan(
        idx.search_nested(
            "alpha", 5, nested_col="calls", inner_where="x.ms >= 2.0",
            score_mode="sum",
        )
    )
    assert "Generate" not in plan and "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    agg_plan = _plan(idx.nested_agg("alpha", "calls", "name"))
    assert "Generate" in agg_plan  # the explode into nested objects
    assert "CartesianProduct" not in agg_plan and "Window" not in agg_plan


def test_geo_paths_fuse_into_scan_and_topk(spark):
    """Geo family plan shape: the polygon / geohash-cell predicates are
    constant expressions fused into the doc scan (no UDF, no Generate,
    no extra join), and _geo_distance sort compiles to
    TakeOrderedAndProject — never a global Sort."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    df = spark.createDataFrame(
        [(i, "alpha beta", -80.0 + i * 7.9, -170.0 + i * 17.3) for i in range(21)],
        "doc_id long, text string, lat double, lon double",
    )
    idx = Index.ephemeral(df, docs_per_shard=8, n_buckets=4)
    poly = [(70.0, -170.0), (75.0, -40.0), (0.0, -30.0), (-60.0, -70.0)]

    plan = _plan(idx.search_geo_polygon("alpha", 5, polygon=poly))
    assert "BatchEvalPython" not in plan and "Generate" not in plan
    assert "CartesianProduct" not in plan

    plan = _plan(
        idx.search_geohash_cell("alpha", 5, point=(10.0, -50.0), precision=2, neighbors=True)
    )
    assert "BatchEvalPython" not in plan and "Generate" not in plan

    plan = _plan(idx.search_geo_distance_sort("alpha", 5, origin=(37.77, -122.42)))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_geo_shape_indexed_fuses_into_scan(spark):
    """Indexed-shape plan shape: the per-row crossing-parity predicate
    over the stored ring column is a pure scan predicate — no explode of
    the vertex array, no UDF, no cartesian join."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    rows = [
        (i, "alpha beta", [(float(i % 5), 0.0), (float(i % 5) + 2.0, 1.0),
                           (float(i % 5) + 1.0, 3.0)])
        for i in range(21)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, shape array<struct<lon:double,lat:double>>"
    )
    idx = Index.ephemeral(df, docs_per_shard=8, n_buckets=4)
    ring = [(f"shape[{j}].lon", f"shape[{j}].lat") for j in range(3)]
    plan = _plan(
        idx.search_geo_shape_indexed("alpha", 5, ring_sql=ring, point=(1.5, 1.0))
    )
    assert "BatchEvalPython" not in plan and "Generate" not in plan
    assert "CartesianProduct" not in plan


def test_nested_sort_fuses_into_scan_and_topk(spark):
    """Nested sort plan shape: the per-object filter/transform/rollup is
    higher-order Column algebra fused into the doc scan — no explode
    (Generate), no Python, no extra join beyond the match-set semi-join —
    and the ordering is TakeOrderedAndProject, never a global Sort."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    df = spark.createDataFrame(
        [
            (i, "alpha beta", [{"name": "a", "ms": float(i)}])
            for i in range(21)
        ],
        "doc_id long, text string, calls array<struct<name:string,ms:double>>",
    )
    idx = Index.ephemeral(df, docs_per_shard=8, n_buckets=4)
    plan = _plan(
        idx.search_nested_sort(
            "alpha", 5, nested_col="calls", sort_expr="x.ms",
            inner_where="x.name = 'a'", mode="max",
        )
    )
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "Generate" not in plan
    assert "CartesianProduct" not in plan


def test_semdedup_is_cluster_local_no_cartesian(spark):
    """semdedup's quadratic work must stay inside per-cluster Python
    tasks: one join to attach list_id, ONE groupBy feeding a single
    FlatMapGroupsInPandas — never a self-join or cartesian pair blowup."""
    import numpy as np

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import semdedup

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semdedup(df, 0.95, n_lists=4, iters=2)
    out.collect()  # AQE final plan
    plan = _plan(out)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # exactly one grouped-Pandas stage in the executed (final) plan — AQE
    # simple mode appends the initial plan too, so slice it off first
    final = _plan(out, mode="simple").split("== Initial Plan ==")[0]
    assert final.count("FlatMapGroupsInPandas") == 1


def test_highlight_fetch_broadcasts_hits(spark, built_index):
    """highlight = fetch(top-k hits) + regexp Columns: the k-row hits side
    must broadcast so the docs scan stays shuffle-free, and no extra
    aggregate/window appears for the snippet arithmetic."""
    idx, _ = built_index
    q = "w00000 w00002"
    df = idx.highlight(idx.search(q, 5), q, n_chars=60)
    df.collect()
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan and "Window" not in plan


def test_sq8_scan_is_top_c_and_rescore_broadcasts(spark):
    """SQ8 pass 1 must reduce via TakeOrderedAndProject (per-partition
    top-C, no table shuffle); pass 2 must broadcast the C-row candidate
    set — never shuffle the fat embedding table."""
    import numpy as np

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import sq8_topk

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((60, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    df = sq8_topk(emb, [float(x) for x in vecs[0]], k=5, rescore=20)
    df.collect()  # AQE final plan
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_bq_scan_is_pure_column_top_c_and_rescore_broadcasts(spark):
    """Binary-quantization pass 1 must be pure Column algebra — NO Python
    evaluation node (the packing is a bitwise-OR chain, unlike SQ8's
    Arrow kernel) — reducing via TakeOrderedAndProject; pass 2 must
    broadcast the candidate set, never shuffle the embedding table."""
    import numpy as np

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import bq_topk

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((60, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    df = bq_topk(emb, [float(x) for x in vecs[0]], k=5, rescore=20)
    df.collect()  # AQE final plan
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_sessionize_window_is_keyed_not_single_partition(spark):
    """The sessionization window must hash-partition by the session key —
    never the WindowExec 'moving all data to a single partition' shape —
    and the rollup must be one keyed aggregation, no global sort."""
    import datetime as dt

    from kafka_elasticsearch_standalone_consumer_spark.ops.sessions import (
        session_stats,
    )

    ev = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i * 10), i % 5)
         for i in range(50)],
        "event_id long, ts timestamp, user_id long",
    )
    plan = _plan(session_stats(ev))
    assert "Window" in plan
    # every exchange is keyed (user_id for the window, user_id+session
    # for the rollup) — never SinglePartition
    assert "hashpartitioning(user_id" in plan
    assert "SinglePartition" not in plan
    assert "Sort" in plan  # the per-partition window sort...
    # ...but never a global one (formatted Sort details: [...keys...],
    # <global>, 0 — global=true would read "], true, 0")
    assert "], true, 0" not in plan


def test_reverse_nested_agg_plan_shape(spark):
    """reverse_nested: ONE explode, a keyed dedup (the semantics), one
    keyed groupBy — no cartesian, no join back to the doc store."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    df = spark.createDataFrame(
        [(i, "alpha beta", [{"name": "a", "ms": float(i)}]) for i in range(8)],
        "doc_id long, text string, calls array<struct<name:string,ms:double>>",
    )
    idx = Index.ephemeral(df, docs_per_shard=8, n_buckets=4)
    plan = _plan(idx.reverse_nested_agg("alpha", "calls", "name", "length(text)"))
    assert "Generate" in plan and "explode(" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final, keyed


def test_knn_join_ivf_prunes_lists_broadcasts_routing_keyed_window(spark, tmp_path):
    """The routed batched-kNN plan must show: directory-level pruning on
    list_id (only routed lists read), a broadcast of the tiny routing
    table (never a shuffle of the vector table), and a qid-keyed window —
    no SinglePartition anywhere, no cartesian."""
    import numpy as np

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        build_ivf_index,
        knn_join_ivf,
        train_centroids,
    )

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((80, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(80)],
        "vec_id long, embedding array<float>",
    )
    qs = emb.filter("vec_id < 3").selectExpr("vec_id as qid", "embedding")
    cent = train_centroids(emb, 4, iters=1)
    wh = str(tmp_path / "ivf")
    build_ivf_index(emb, cent, wh)
    df = knn_join_ivf(spark, wh, qs, k=5, nprobe=1)
    df.collect()  # AQE final plan
    plan = _plan(df)
    assert "PartitionFilters" in plan
    seg = plan[plan.index("PartitionFilters") :]
    assert "list_id" in seg[: seg.index("]") + 1]
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    assert "hashpartitioning(qid" in plan
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_turn_contexts_window_is_keyed_not_single_partition(spark):
    """Context assembly must hash-partition its window by the conv key —
    never the single-partition WindowExec shape, never a global sort."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.sessions import (
        turn_contexts,
    )

    df = spark.createDataFrame(
        [(f"c{i%7}", i, f"t{i}") for i in range(100)],
        "conv_id string, turn_idx int, text string",
    )
    plan = _plan(turn_contexts(df, k_prev=3))
    assert "Window" in plan
    assert "hashpartitioning(conv_id" in plan
    assert "SinglePartition" not in plan
    assert "], true, 0" not in plan  # no global sort


def test_bpe_encode_stays_jvm_side_one_shuffle(spark):
    """The BPE encoder must be pure codegen Column algebra — no Python
    eval in the plan, no window, exactly one exchange (the final per-doc
    partial->final aggregate)."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import bpe_encode

    docs = spark.createDataFrame(
        [(i, f"w{i:05d} alpha beta w{i*7:05d}") for i in range(50)],
        "doc_id long, text string",
    )
    merges = [(1, "0", "0", 9), (2, "w", "00", 5), (3, "a", "l", 3)]
    plan = _plan(bpe_encode(docs, merges))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan and "SinglePartition" not in plan
    assert plan.count("Exchange") <= 2  # partial agg + (AQE) reuse, never more
    assert "partial_count" in plan or "partial_sum" in plan


def test_winnow_fingerprints_is_shuffle_free_scan(spark):
    """Winnowing is per-row Column algebra + an explode — NO exchange, no
    Python eval; any shuffle belongs to the caller's downstream join."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(20)],
        "doc_id long, text string",
    )
    plan = _plan(winnow_fingerprints(docs, k=3, w=3))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hard_negatives_broadcasts_labels_keyed_window(spark):
    """The label exclusion must be a BROADCAST anti-join (labels never
    shuffle the corpus) and the re-rank a qid-keyed window — no
    cartesian, no single partition."""
    import numpy as np

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        hard_negatives,
    )

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((60, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    qs = emb.filter("vec_id < 2").selectExpr("vec_id as qid", "embedding")
    pos = spark.createDataFrame(
        [(0, 10), (1, 11)], "qid long, pos_id long"
    )
    df = hard_negatives(emb, qs, pos, k=5)
    df.collect()  # AQE final plan
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "hashpartitioning(qid" in plan
    assert "CartesianProduct" not in plan and "SinglePartition" not in plan


def test_heavy_hitters_exact_pass_broadcasts_candidates(spark):
    """Pass 2 of heavy_hitters: the sketch-bounded candidate set must be
    a BROADCAST hash-join filter (the corpus is never shuffled on the
    value key) and the top-k a TakeOrderedAndProject, not a global sort."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import _exact_pass

    vals = spark.createDataFrame(
        [(f"v{i % 40}",) for i in range(400)], "value string"
    ).repartition(4)
    cands = spark.createDataFrame([(f"v{i}",) for i in range(10)], "value string")
    df = _exact_pass(vals, cands, 5)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_weighted_sample_is_scan_plus_topk(spark):
    """Sequential Poisson sampling: per-row hash key + one
    TakeOrderedAndProject — no exchange beyond the top-k merge, no
    Python eval, no global sort."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import weighted_sample

    df = spark.createDataFrame(
        [(i, float(1 + i % 5)) for i in range(200)], "doc_id long, w double"
    ).repartition(4)
    plan = _plan(weighted_sample(df, "w", k=10))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pagerank_iteration_is_keyed_joins_no_cartesian(spark):
    """One PageRank round = edges⋈pr hash join on src + a dst-keyed
    aggregation — never a cartesian product, never a single-partition
    exchange, no Python eval anywhere (the fold is a JVM higher-order
    function)."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 50) for i in range(200)], "src long, dst long"
    ).repartition(4)
    df = pagerank(edges, n_iter=2, deterministic=False)
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "SinglePartition" not in plan
    assert "hashpartitioning(dst" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    det = _plan(pagerank(edges, n_iter=1, deterministic=True))
    assert "aggregate(" in det and "BatchEvalPython" not in det


def test_inner_hits_window_runs_after_broadcast_parent_prune(spark):
    """inner_hits (has_child flavor): the per-parent child ranking must
    be a window over ONLY the top-k parents' children — the parent top-k
    is broadcast back against the scored set (BroadcastHashJoin), the
    window partitions on the parent key (never SinglePartition over the
    full match set), and no cartesian product appears. The nested flavor
    must keep search_nested's no-Generate scan for the parents and add
    exactly one bounded Generate (the ≤ k×inner_k explode)."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    df = spark.createDataFrame(
        [
            (i, "alpha beta", str(i % 5), [{"name": "a", "ms": float(i)}])
            for i in range(40)
        ],
        "doc_id long, text string, conv_key string, "
        "calls array<struct<name:string,ms:double>>",
    )
    idx = Index.ephemeral(df, docs_per_shard=8, n_buckets=4)

    child = _plan(
        idx.search_has_child_inner("alpha", 3, inner_k=2, group_col="conv_key")
    )
    assert "BroadcastHashJoin" in child
    assert "CartesianProduct" not in child
    assert "Window" in child and "hashpartitioning(conv_key" in child

    nested = _plan(
        idx.search_nested_inner(
            "alpha", 3, inner_k=2,
            nested_col="calls", inner_where="x.ms >= 2.0",
            inner_score="x.ms", score_mode="max",
        )
    )
    # exactly ONE Generate node (the post-top-k explode): formatted mode
    # prints each node once in the tree and once in the detail section
    assert nested.count("Generate") == 2
    assert "Window" not in nested and "CartesianProduct" not in nested
    assert "BroadcastHashJoin" in nested


def test_similarity_modules_share_the_oracle_plan_shape(spark):
    """search_similarity must cost what the BM25 oracle costs: term-pruned
    tokens scan, broadcast per-term stats, ONE doc-keyed aggregation,
    TakeOrderedAndProject — never a cartesian product, never a global
    Sort, no Python eval."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    df = spark.createDataFrame(
        [(i, "alpha beta gamma"[: 5 + (i % 3) * 5]) for i in range(30)],
        "doc_id long, text string",
    )
    idx = Index.ephemeral(df, docs_per_shard=8, n_buckets=4)
    for sim in ("classic", "lm_dirichlet", "lm_jm", "dfr_inl2", "ib_ll"):
        plan = _plan(idx.search_similarity("alpha beta", 5, similarity=sim))
        assert "TakeOrderedAndProject" in plan, sim
        assert "CartesianProduct" not in plan, sim
        assert "BroadcastHashJoin" in plan, sim
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, sim
    # tunable-k1/b path shares the oracle shape too (no BMW, by design)
    plan = _plan(idx.search_params("alpha beta", 5, k1=1.6, b=0.25))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_leakage_split_broadcasts_and_never_cross_joins(spark):
    """leakage_safe_split: the eval shingle set and the dirty-gram set
    ride broadcast joins; the train side never cartesian-joins."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import (
        leakage_safe_split,
    )

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta eps zeta eta theta iota") for i in range(20)],
        "doc_id long, text string",
    )
    plan = _plan(leakage_safe_split(df, eval_frac=0.3, n=8))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zipf_and_entropy_plans_stay_aggregated(spark):
    """zipf_fit: term count + TakeOrderedAndProject head (never a global
    Sort over the vocabulary); the rank window runs over <= top_n rows.
    token_entropy: two keyed aggregations, no window, no Python eval."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        token_entropy,
        zipf_fit,
    )

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta"[: 6 + (i % 4) * 5]) for i in range(40)],
        "doc_id long, text string",
    )
    zplan = _plan(zipf_fit(df, top_n=10))
    assert "TakeOrderedAndProject" in zplan
    assert "CartesianProduct" not in zplan
    assert "BatchEvalPython" not in zplan and "ArrowEvalPython" not in zplan
    eplan = _plan(token_entropy(df))
    assert "Window" not in eplan
    assert "CartesianProduct" not in eplan
    assert "BatchEvalPython" not in eplan and "ArrowEvalPython" not in eplan
