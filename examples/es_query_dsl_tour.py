"""Tour of the Elasticsearch query-DSL surface, Spark-side — the
"switch from the reference" checklist in executable form.

    python examples/es_query_dsl_tour.py [n_convs]

Every section is one library call a reference user would recognize from
the ES 1.5.1 API their pipeline wrote to (reference ``pom.xml:22``,
``MessageHandler.java:135-139``): full-text queries, structured bool,
multi-term rewrites, scoring functions, aggregations, suggesters, the
percolator, pagination, and the serving path. Run it end to end as an
integration smoke.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def show(title, df, n=3):
    print(f"\n-- {title}")
    for r in df.limit(n).collect():
        print("  ", tuple(r))


def main(n_convs: int = 300) -> None:
    from pyspark.sql import functions as F

    from kafka_elasticsearch_standalone_consumer_spark.corpus import generate_transcripts
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index
    from kafka_elasticsearch_standalone_consumer_spark.query.multisearch import MultiIndex
    from kafka_elasticsearch_standalone_consumer_spark.query.percolate import percolate
    from kafka_elasticsearch_standalone_consumer_spark.session import get_spark

    spark = get_spark("es-dsl-tour", master="local[8]")
    wh = tempfile.mkdtemp() + "/idx"
    tr = generate_transcripts(spark, n_convs=n_convs, seed=42)
    build_index(spark, tr, wh, docs_per_shard=1024, n_buckets=16, positions=True)
    idx = Index(spark, wh)
    q = "w00000 w00003"

    # --- full-text queries ---------------------------------------------
    show("match (BM25, block-max WAND)", idx.search(q, 5, mode="bmw"))
    show("match_phrase", idx.search_phrase("w00000 w00003", 3))
    show("match_phrase slop=2", idx.search_phrase("w00000 w00003", 3, slop=2))
    show("bool (must/should/must_not + filter)", idx.search_bool(
        must=["w00000"], should=["w00003"], must_not=["w00007"],
        filters=[("role", "user")], k=5,
    ))
    show("minimum_should_match=2", idx.search(q + " w00005", 5, min_should_match=2))
    show("prefix", idx.search_prefix("w0000", 3))
    show("fuzzy (DL<=1)", idx.search_fuzzy("w0000x", 3))
    show("common_terms", idx.search_common_terms(q, 5, cutoff_frequency=0.5))
    show("boosting (demote w00007)", idx.search_boosting(q, "w00007", 0.3, 5))
    show("terms query", idx.search_terms(["w00000", "w00005"], 5))
    show("terms LOOKUP (value set point-read from doc 3)",
         idx.search_terms_lookup(3, 5, max_terms=4))
    show("more_like_this(doc 7)", idx.more_like_this(7, 5))

    # --- scoring functions ---------------------------------------------
    show("function_score field_value_factor", idx.function_score(q, "turn_idx", 5, modifier="log1p"))
    show("function_score gauss decay", idx.decay_score(q, "turn_idx", 5.0, 4.0, 5))
    show("function_score random_score", idx.random_score(q, seed=7, k=5))
    show("rescore window by phrase", idx.rescore(q, "w00000 w00003", 5))
    show("sort by field (no scoring)", idx.search_sort(q, "turn_idx", 5))
    show("collapse by role", idx.search_collapse(q, "role", 5))
    show("_explain doc 7", idx.explain_score(q, 7))

    # --- aggregations ---------------------------------------------------
    show("terms agg + metric", idx.terms_agg(q, "role", "turn_idx", ("avg",)))
    show("nested terms buckets", idx.nested_terms_agg(q, "role", "cast(turn_idx % 3 as string)", size=2, child_size=2))
    show("filters agg", idx.filters_agg(q, {"early": "turn_idx < 3"}))
    show("composite agg page", idx.composite_agg(q, [("role", "role")], size=3))
    show("significant_terms", idx.significant_terms(q, size=3))

    # --- suggesters / introspection -------------------------------------
    show("term suggester", idx.suggest_terms("w0000x"))
    show("completion suggester", idx.suggest_complete("w000", 3))
    show("phrase suggester", idx.suggest_phrase("w00000 w0001"))
    show("phrase suggester (collate=True prunes non-matching)",
         idx.suggest_phrase("w00000 w0001", collate=True))
    show("context suggester (completion scoped to role=user)",
         idx.suggest_complete_context("w000", [("role", "=", "user")], 3))
    show("value_count agg (non-NULL tool over matches)",
         idx.value_count_agg(q, "tool"))
    show("filter agg (match set narrowed to user turns, stats on turn_idx)",
         idx.filter_agg(q, "role = 'user'", "turn_idx"))
    show("_analyze", idx.analyze("The W00000 and W00003!"))
    show("_termvectors doc 7", idx.term_vectors(7))
    show("_count", idx.count_matches(q))

    # --- round-3 additions: filter-context, spans, FLT, parent/child ----
    show("ids query", idx.search_ids([3, 7, 11], 5, boost=1.5))
    show("constant_score (query + filter)", idx.constant_score(q, where="turn_idx >= 2", boost=2.0, k=3))
    show("match_all", idx.match_all(3))
    show("exists query", idx.search_exists("role", 3))
    show("fuzzy_like_this (scored fuzzy)", idx.fuzzy_like_this("w0000x w00003", 5))
    show("dis_max", idx.search_dis_max(["w00000", "w00003 w00005"], tie_breaker=0.3, k=5))
    show("span_near (ordered, slop 2)", idx.search_span_near(["w00000", "w00003"], slop=2, in_order=True, k=3))
    show("has_child (conv by best turn)", idx.search_has_child(q, 3))
    show("extended_stats agg", idx.extended_stats_agg(q, "turn_idx"))
    show("percentile_ranks agg", idx.percentile_ranks_agg(q, "turn_idx", [2.0, 6.0]))
    show("scripted_metric agg", idx.scripted_metric_agg(q, "CAST(turn_idx AS DOUBLE)", "avg(mapped)"))

    # --- percolator / pagination / export -------------------------------
    show("percolate 2 registered queries", idx.percolate([(1, "w00000"), (2, q)]))
    p1 = idx.search(q, 5).collect()
    cur = (p1[-1]["score"], p1[-1]["doc_id"])
    show("search_after page 2 (pruned WAND)", idx.search_after(q, cur, 5, mode="bmw"))
    print("\n-- scan export rows:", idx.scan_all(q).count())

    # --- round-3b additions: pages, names, templates ---------------------
    show("min_score cutoff", idx.search(q, 5, min_score=0.2))
    show("post_filter (total stays pre-filter)",
         idx.search_post_filter(q, "role = 'user'", 3))
    show("named queries (matched_queries)",
         idx.search_named({"first": "w00000", "third": "w00003"}, 5))
    show("script_fields on the fetched page",
         idx.script_fields(idx.search(q, 3), {"ti2": "turn_idx * 2"}))
    show("search template (mustache)",
         idx.search_template("{{w}} role:{{r}}", {"w": "w00003", "r": "user"}, 3))
    show("_source filtering on fetch",
         idx.fetch(idx.search(q, 2), includes=["role", "turn_idx"]))
    show("top_children / has_child avg", idx.search_has_child(q, 3, score_mode="avg"))
    show("simple_query_string (lenient end-user syntax)",
         idx.simple_query_string("w00000 | w00003 -w00007 w0001*", 5))
    show("span_multi prefix clause near a term",
         idx.search_span_near([{"prefix": "w0001"}, "w00000"], slop=2, k=3))
    parents = idx._docs_df().select("conv_id").distinct().select(
        "conv_id", F.substring("conv_id", 1, 6).alias("grp"))
    show("children aggregation (parent buckets over matching turns)",
         idx.children_agg(q, parents, "grp", metric="length(text)"))

    # --- round-4 additions: nested, geo, filtered aliases ----------------
    ndocs = idx._docs_df().selectExpr(
        "doc_id", "text",
        "array(named_struct('name', tool, 'ms', CAST(turn_idx AS DOUBLE))) AS calls",
    )
    nidx = Index.ephemeral(ndocs, docs_per_shard=1024, n_buckets=8)
    show("nested query (condition scoped to ONE object, score_mode=sum)",
         nidx.search_nested(q, 3, nested_col="calls",
                            inner_where="x.name IS NOT NULL AND x.ms >= 2.0",
                            score_mode="sum"))
    show("nested aggregation + reverse_nested parent counts",
         nidx.nested_agg(q, "calls", "name", metric="x.ms"))
    gdocs = idx._docs_df().selectExpr(
        "doc_id", "text",
        "((doc_id * 937) % 17000) / 100.0 - 85.0 AS lat",
        "((doc_id * 1409) % 36000) / 100.0 - 180.0 AS lon")
    gidx = Index.ephemeral(gdocs, docs_per_shard=1024, n_buckets=8)
    show("geo_distance filter (haversine fused into the scan)",
         gidx.search_geo_distance(q, 3, origin=(37.77, -122.42), radius_km=8000.0))
    show("geo_distance ring aggregation",
         gidx.geo_distance_agg(q, origin=(37.77, -122.42), bounds_km=[3000.0, 9000.0]))
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.snapshot import (
        open_alias,
        set_alias,
    )
    areg = tempfile.mkdtemp() + "/reg"
    set_alias(areg, "users_only", wh, where=[("role", "=", "user")])
    fidx = open_alias(spark, areg, "users_only")
    show("filtered alias (read-side rewrite on every surface)", fidx.search(q, 3))
    print("\n-- filtered alias on the serving path:", fidx.search_local(q, 3))

    # --- multi-index & serving ------------------------------------------
    docs = idx._docs_df().select("doc_id", "text")
    even = Index.ephemeral(docs.filter("doc_id % 2 = 0"), docs_per_shard=1024, n_buckets=8)
    odd = Index.ephemeral(docs.filter("doc_id % 2 = 1"), docs_per_shard=1024, n_buckets=8)
    show("multi-index dfs_query_then_fetch",
         MultiIndex([even, odd]).search(q, 5, mode="dfs_query_then_fetch"))
    show("indices query (per-member routing)",
         MultiIndex([even, odd]).indices_query([0], q, no_match_query="none", k=5))
    print("\n-- search_local (zero Spark jobs):", idx.search_local(q, 3))

    # --- warmers & nested sort (round 4e) -------------------------------
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.warmers import (
        put_warmer,
        warm,
    )

    wreg = tempfile.mkdtemp() + "/warmers.json"
    put_warmer(wreg, "daily_top", q, k=3)
    print("\n-- _warmer replay (primes caches, returns the warmed top-k):")
    for row in warm(idx, wreg):
        print("  ", row)
    ndocs = idx._docs_df().selectExpr(
        "doc_id", "text",
        "array(named_struct('name', tool, 'ms', CAST(turn_idx AS DOUBLE))) AS calls",
    )
    nidx = Index.ephemeral(ndocs, docs_per_shard=1024, n_buckets=8)
    show("sort by nested field (mode=max, missing last)",
         nidx.search_nested_sort(q, 3, nested_col="calls", sort_expr="x.ms",
                                 inner_where="x.name IS NOT NULL", mode="max"))

    # --- round 4g: geo_shape, field MLT, fuzzy completion, terminate_after,
    # background-filtered significant_terms ------------------------------
    gdocs = idx._docs_df().selectExpr(
        "doc_id", "text",
        "((doc_id * 937) % 17000) / 100.0 - 85.0 AS lat",
        "((doc_id * 1409) % 36000) / 100.0 - 180.0 AS lon",
    )
    gidx = Index.ephemeral(gdocs, docs_per_shard=1024, n_buckets=8)
    show("geo_shape envelope (disjoint = outside the box)",
         gidx.search_geo_shape(q, 3,
             shape={"type": "envelope", "coordinates": [[-130.0, 60.0], [-60.0, 0.0]]},
             relation="disjoint"))
    from kafka_elasticsearch_standalone_consumer_spark.query.multifield import (
        more_like_this_field,
    )
    from pyspark.sql import functions as F
    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col

    fdocs = idx._docs_df().select(
        "doc_id",
        F.array_join(F.slice(tokenize_col(F.col("text")), 1, 5), " ").alias("title"),
    )
    show("more_like_this_field (title-scoped MLT, doc 0 seed)",
         more_like_this_field(fdocs, 0, "title", 3, max_query_terms=3))
    print("\n-- fuzzy completion (input 'w0q01', distance 1):",
          [tuple(r) for r in idx.suggest_complete("w0q01", 3, fuzziness=1).collect()])
    show("terminate_after=2 (first 2 matching docs per shard)",
         idx.search_terminate_after(q, 3, terminate_after=2))
    show("significant_terms with background_filter (even turns)",
         idx.significant_terms(q, size=5, background_where="turn_idx % 2 = 0"))

    # --- round-4i additions: inner_hits, _mpercolate, percolate count ----
    cdocs = idx._docs_df().select(
        "doc_id", "text", (F.col("doc_id") % 7).cast("string").alias("conv_key")
    )
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index as _Ix

    cidx = _Ix.ephemeral(cdocs, docs_per_shard=128, n_buckets=8)
    show("inner_hits on has_child (top convs + their top-2 matching turns)",
         cidx.search_has_child_inner(q, 3, inner_k=2, group_col="conv_key"))
    show("inner_hits on nested (matching objects ranked by x.ms)",
         nidx.search_nested_inner(q, 3, inner_k=2, nested_col="calls",
                                  inner_where="x.ms >= 2.0",
                                  inner_score="x.ms", score_mode="max"))
    from kafka_elasticsearch_standalone_consumer_spark.query.percolate import (
        count_percolate,
        mpercolate,
    )

    show("_mpercolate (2 requests, one broadcast pass)",
         mpercolate(spark, [(0, "w00000 stream"), (1, q)],
                    [(1, "w00000"), (2, q)]))
    show("percolate count mode (0-totals included)",
         count_percolate(idx._docs_df().limit(5), [(1, "w00000"), (2, q)]))
    show("similarity module: classic TF-IDF (ES 1.x default, with coord)",
         idx.search_similarity(q, 3, similarity="classic"))
    show("similarity module: LMDirichlet (mu=2000)",
         idx.search_similarity(q, 3, similarity="lm_dirichlet"))
    show("similarity module: LMJelinekMercer (lambda=0.1)",
         idx.search_similarity(q, 3, similarity="lm_jm"))
    show("similarity module: DFR InL2 (Amati & van Rijsbergen 2002)",
         idx.search_similarity(q, 3, similarity="dfr_inl2"))
    show("similarity module: IB log-logistic (Clinchant & Gaussier 2010)",
         idx.search_similarity(q, 3, similarity="ib_ll"))
    show("per-field similarity settings: BM25 with k1=1.6, b=0.25",
         idx.search_params(q, 3, k1=1.6, b=0.25))
    show("minimum_should_match spec string ('1<-34%')",
         idx.search(q, 3, min_should_match="1<-34%"))
    show("query_string caret boost (first term's idf ×2)",
         idx.query_string(q.split()[0] + "^2 " + " ".join(q.split()[1:]), 3))
    show("significant_terms over a METADATA field (role)",
         idx.significant_terms_field(q, "role", size=3))
    show("suggest_mode=popular (strictly-more-frequent corrections)",
         idx.suggest_terms(q.split()[0], max_edits=1, suggest_mode="popular"))
    show("ES _stats corpus summary", idx.corpus_summary())

    # --- round-5 continuation: terms_stats facet, _script sort,
    # --- percolate-existing-doc ------------------------------------------
    show("terms_stats facet: per-role count/total/min/max/mean of turn_idx",
         idx.facets_stats(q, "role", "turn_idx", size=3))
    show("_script sort: computed expression as the sort key",
         idx.search_sort(q, "turn_idx % 3", 3))
    some_ids = [r["doc_id"] for r in idx.search(q, 3).collect()]
    show("percolate EXISTING docs (by stored id, never re-shipping text)",
         idx.percolate_existing(some_ids, [(1, q.split()[0]), (2, q)]))
    print("\nDSL tour complete.")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
