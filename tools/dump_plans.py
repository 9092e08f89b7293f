"""Regenerate PLANS.md — captured physical plans for the hot paths, with
the properties we engineered for (PartitionFilters / PushedFilters /
ReadSchema pruning / broadcast / single-shuffle pack) visible in situ.

    python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def plan_of(df, mode="formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def main() -> None:
    from kafka_elasticsearch_standalone_consumer_spark.analysis import doc_term_freqs
    from kafka_elasticsearch_standalone_consumer_spark.corpus import generate_transcripts
    from kafka_elasticsearch_standalone_consumer_spark.index.build import build_postings
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index
    from kafka_elasticsearch_standalone_consumer_spark.session import get_spark

    spark = get_spark(app_name="dump-plans", master="local[4]", shuffle_partitions=4)
    wh = tempfile.mkdtemp() + "/idx"
    tr = generate_transcripts(spark, n_convs=200, seed=42)
    build_index(spark, tr, wh, docs_per_shard=512, n_buckets=8)
    idx = Index(spark, wh)

    sections = []

    idfw, buckets = idx._plan_terms("w00000 w00412")
    hits = idx.postings.filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(list(idfw))
    )
    sections.append(
        (
            "Query-path postings scan",
            "The per-query scan must touch only the query terms' bucket "
            "directories (PartitionFilters on term_bucket) and push the "
            "term equality into the parquet reader (PushedFilters) — query "
            "cost stays ~|q|·n_shards rows no matter how wide the corpus is.",
            plan_of(hits),
        )
    )

    oracle = idx.search_oracle("w00000 w00412", 10)
    oracle.collect()
    sections.append(
        (
            "BM25 DataFrame oracle (verification path)",
            "Declarative joins/agg: query-term weights broadcast (no "
            "shuffle of the big side), tokens scan filtered by term before "
            "any join, one aggregation, TakeOrderedAndProject for top-k.",
            plan_of(oracle),
        )
    )

    toks = doc_term_freqs(idx.wh.read(spark, "docs"))
    sections.append(
        (
            "Fused tokenize + tf-count (index-build hot path)",
            "One narrow Arrow pass — no Exchange anywhere in the plan: the "
            "per-(doc, term) aggregation never crosses row boundaries, so "
            "Catalyst's explode→groupBy shuffle is provably unnecessary.",
            plan_of(toks),
        )
    )

    facet = idx.facets("w00000 w00412", by="role")
    sections.append(
        (
            "Facet aggregation (ES terms agg)",
            "Fully declarative: term-pruned tokens scan → distinct matching "
            "docs → LEFT SEMI join the doc store (column-pruned to doc_id + "
            "the facet column) → one aggregation. Catalyst owns the whole "
            "physical plan; no kernels on this path.",
            plan_of(facet),
        )
    )

    import numpy as np

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        ann_topk_indexed,
        build_ann_index,
        build_ivf_index,
        ivf_search,
    )

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((64, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    ann_wh = tempfile.mkdtemp() + "/ann"
    build_ann_index(emb, ann_wh, bits=6, dim=16)
    sections.append(
        (
            "Materialized ANN probe (sig partition pruning)",
            "build_ann_index writes embeddings partitioned by the sign-LSH "
            "signature; the probe-bucket predicate shows up as "
            "PartitionFilters on sig — directory-level pruning reads "
            "~(1+bits)/2^bits of the table, independent of its width.",
            plan_of(ann_topk_indexed(spark, ann_wh, [float(x) for x in vecs[0]], 5)),
        )
    )
    ivf_wh = tempfile.mkdtemp() + "/ivf"
    build_ivf_index(emb, vecs[:4].astype(np.float64), ivf_wh)
    sections.append(
        (
            "IVF search (list_id partition pruning)",
            "IVF inverted lists ARE partition directories; probing nprobe "
            "lists is PartitionFilters on list_id — ~nprobe/n_lists of the "
            "data read, exact cosine only inside the probed lists.",
            plan_of(ivf_search(spark, ivf_wh, [float(x) for x in vecs[0]], 5, nprobe=2)),
        )
    )

    sig = idx.significant_terms("w00000 w00412", size=5)
    sections.append(
        (
            "significant_terms (JLH foreground/background)",
            "Both frequency sides come off the SAME distinct (doc, term) "
            "aggregation; the two one-row size aggregates join in as "
            "BroadcastNestedLoopJoin (1-row broadcasts, not shuffles) — so "
            "the operator costs one token-stream aggregation regardless of "
            "vocabulary or corpus width.",
            plan_of(sig),
        )
    )

    fs = idx.function_score("w00000 w00412", "turn_idx", 10, modifier="log1p")
    sections.append(
        (
            "function_score (field_value_factor rescoring)",
            "The score-all BM25 plan plus ONE join against the doc store "
            "column-pruned to (doc_id, field) — ReadSchema shows only the "
            "two columns — and a TakeOrderedAndProject. Rescoring by a "
            "document field never rereads text or re-runs scoring.",
            plan_of(fs),
        )
    )

    srt = idx.search_sort("w00000 w00412", "turn_idx", 10)
    sections.append(
        (
            "Field-sorted search (ES sort)",
            "No scoring at all: term-pruned match set → semi join → "
            "TakeOrderedAndProject. A deep corpus pays per-partition top-k "
            "plus a k-row merge — never a global sort.",
            plan_of(srt),
        )
    )

    comp = idx.composite_agg(
        "w00000 w00412",
        [("role", "role"), ("b4", "cast(turn_idx % 4 as string)")],
        size=3,
        after=("assistant", "1"),
    )
    sections.append(
        (
            "Composite aggregation (paged bucket streaming)",
            "One map-side-partial aggregation on the composite key, the "
            "after-key predicate filtering buckets BEFORE the ordering, and "
            "a TakeOrderedAndProject for the page — paging through millions "
            "of buckets never sorts them globally or spills them to the "
            "driver.",
            plan_of(comp),
        )
    )

    from kafka_elasticsearch_standalone_consumer_spark.query.percolate import percolate

    perc = percolate(idx._docs_df(), [(1, "w00000"), (2, "w00412 w00003")])
    sections.append(
        (
            "Percolator (reverse search)",
            "The registered-query term table is BROADCAST — the document "
            "stream never shuffles for the join; the only exchange is the "
            "(doc, query) aggregation with map-side partials, and the join "
            "materializes only pairs sharing a term (never docs×queries).",
            plan_of(perc),
        )
    )

    pack = build_postings(toks, avgdl=50.0, docs_per_shard=512, n_buckets=8)
    sections.append(
        (
            "Posting pack (the ONE big shuffle of the build)",
            "Range repartition on (term_bucket, term, shard) — sampled "
            "boundaries absorb Zipf skew; in-partition sort makes every "
            "(term, shard) run contiguous for the streaming pack kernel; "
            "tasks hold contiguous bucket ranges so the partitioned write "
            "emits ~n_buckets/P files per task.",
            plan_of(pack),
        )
    )

    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import pack_shards
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import decontaminate

    docs_tbl = idx.wh.read(spark, "docs").select(
        "doc_id", F.col("text")
    )
    decon = decontaminate(
        docs_tbl.filter("doc_id % 10 != 0"), docs_tbl.filter("doc_id % 10 = 0"), n=3
    )
    sections.append(
        (
            "Decontamination (train/test shingle overlap)",
            "Candidate generation is ONE equi-join on the shingle; the test "
            "side (distinct benchmark shingles) is orders of magnitude "
            "smaller than the train corpus, so AQE broadcasts it and the "
            "train-side shingle stream never shuffles — look for "
            "BroadcastHashJoin below. Never a cross join.",
            plan_of(decon),
        )
    )

    packed = pack_shards(docs_tbl, 2000, num_partitions=4)
    sections.append(
        (
            "Training-shard packing (two-pass cumulative sum)",
            "A window `sum OVER (ORDER BY doc_id)` would serialize the "
            "corpus through one task; instead: range repartition + "
            "in-partition sort, per-partition token sums collected (bounded "
            "driver data: one long per partition), exclusive offsets "
            "broadcast into an Arrow pass. The plan has NO Window and no "
            "single-partition Exchange — only the range Exchange.",
            plan_of(packed),
        )
    )

    named = idx.search_named({"a": "w00000 w00412", "b": "w00007"}, 10)
    sections.append(
        (
            "Named queries (matched_queries, ONE scan for N clauses)",
            "All clauses' terms prune one tokens scan; the (qname, term, "
            "idfw) clause map is a broadcast join — look for a single scan "
            "and BroadcastHashJoin below, then two map-side-combinable "
            "aggregations (per-(doc,clause), per-doc). N named clauses never "
            "cost N scans.",
            plan_of(named),
        )
    )

    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        repetition_features,
    )

    rep = repetition_features(docs_tbl)
    sections.append(
        (
            "Repetition features (Gopher filters)",
            "One tokenize pass feeds the per-n gram streams; every groupBy "
            "is keyed on (doc_id[, gram]) — per-doc keys, partial_max/"
            "partial_count map-side combines, no skewable global key — and "
            "the assembly is doc_id-keyed shuffles Catalyst lays out as "
            "ordinary SortMergeJoins. No Window, no UDF.",
            plan_of(rep),
        )
    )

    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import dup_span_stats

    sections.append(
        (
            "Cross-doc duplicated substrings (dup_spans, Lee et al.)",
            "Gram explode is narrow (≤ n× the token stream); the global "
            "distinct-doc counts are ONE gram-keyed groupBy with map-side "
            "partials (the skewed boilerplate grams are exactly what AQE "
            "skew-join splitting handles at scale); the flagged grams join "
            "back on the gram key and roll up per doc. No cartesian "
            "product anywhere — asserted in tests/test_plans.py.",
            plan_of(dup_span_stats(docs_tbl, n=5)),
        )
    )

    parents = (
        idx._docs_df().select("conv_id").distinct()
        .select("conv_id", F.substring("conv_id", 1, 6).alias("grp"))
    )
    sections.append(
        (
            "Children aggregation (parent buckets over matching turns)",
            "Term-pruned match-set scan → join children→parents keyed on "
            "the parent key (a standard shuffle join on the corpus's "
            "natural conv partitioning; neither side broadcasts at 10^12 "
            "turns vs 10^10 conversations, AQE picks the strategy) → ONE "
            "groupBy on the bucket value. No window, no global sort over "
            "the corpus — the final order is bucket-cardinality rows.",
            plan_of(idx.children_agg("w00000", parents, "grp")),
        )
    )

    ndocs = idx._docs_df().selectExpr(
        "doc_id", "text",
        "array(named_struct('name', tool, 'ms', CAST(turn_idx AS DOUBLE))) AS calls",
    )
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index as _Ix

    nidx = _Ix.ephemeral(ndocs, docs_per_shard=1024, n_buckets=8)
    sections.append(
        (
            "Nested query (per-object scoped clause, search_nested)",
            "The nested condition compiles to higher-order Column functions "
            "(filter/transform/aggregate over the array<struct> column) — a "
            "per-row predicate fused into the column-pruned doc scan by "
            "whole-stage codegen: NO Generate (explode), no window, no "
            "extra shuffle; the only exchange serves the doc_id equi-join "
            "against the scored match set and the final top-k "
            "(TakeOrderedAndProject). Asserted in tests/test_plans.py.",
            plan_of(
                nidx.search_nested(
                    "w00000", 5, nested_col="calls",
                    inner_where="x.ms >= 2.0", score_mode="sum",
                )
            ),
        )
    )

    sections.append(
        (
            "Nested sort (sort-by-nested-field, search_nested_sort)",
            "ES's nested sort skips scoring like every field sort: term-"
            "pruned match set → per-object filter/transform + mode rollup "
            "as higher-order Column algebra fused into the doc scan (no "
            "Generate, no Python) → TakeOrderedAndProject with NULL keys "
            "(missing _last) — never a global Sort. Keys rounded to 4 dp "
            "before ordering (the geo-sort rule).",
            plan_of(
                nidx.search_nested_sort(
                    "w00000", 5, nested_col="calls", sort_expr="x.ms",
                    inner_where="x.name IS NOT NULL", mode="max",
                )
            ),
        )
    )

    gdocs = idx._docs_df().selectExpr(
        "doc_id", "text",
        "((doc_id * 937) % 17000) / 100.0 - 85.0 AS lat",
        "((doc_id * 1409) % 36000) / 100.0 - 180.0 AS lon",
    )
    gidx = _Ix.ephemeral(gdocs, docs_per_shard=1024, n_buckets=8)
    sections.append(
        (
            "Geo distance filter (haversine in codegen, search_geo_distance)",
            "The great-circle distance is a SQL trig expression inside the "
            "filter — whole-stage codegen evaluates it during the doc scan "
            "(two double columns read), so the geo clause costs a scan "
            "predicate, not a UDF or a join; the rest of the plan is the "
            "ordinary filtered-BM25 shape (filter semi-join + top-k).",
            plan_of(
                gidx.search_geo_distance(
                    "w00000", 5, origin=(37.77, -122.42), radius_km=8000.0
                )
            ),
        )
    )

    sections.append(
        (
            "_geo_distance sort (search_geo_distance_sort)",
            "ES's distance sort skips scoring entirely: term-pruned match "
            "set → haversine in codegen → TakeOrderedAndProject (per-"
            "partition top-k + a k-row merge) — never a global Sort. Sort "
            "keys are rounded to 4 dp before ordering so last-ulp libm "
            "differences can never reorder engines.",
            plan_of(
                gidx.search_geo_distance_sort(
                    "w00000", 5, origin=(37.77, -122.42)
                )
            ),
        )
    )

    sections.append(
        (
            "Geo polygon + geohash cell filters (pure scan predicates)",
            "geo_polygon compiles the crossing-parity ray-cast to CASE "
            "terms (~4 float ops per edge per row); geohash_cell resolves "
            "its <=9 target cells driver-side and tests one int64 bit-"
            "interleave against constants. Both are ordinary pushed scan "
            "predicates — no UDF, no explode, no extra join.",
            plan_of(
                gidx.search_geo_polygon(
                    "w00000",
                    5,
                    polygon=[
                        (70.0, -170.0), (75.0, -40.0), (0.0, -30.0),
                        (-60.0, -70.0), (-20.0, -160.0),
                    ],
                )
            ),
        )
    )

    sdocs = idx._docs_df().selectExpr(
        "doc_id", "text",
        "array(named_struct('lon', CAST(doc_id % 7 AS DOUBLE), 'lat', CAST(0 AS DOUBLE)),"
        " named_struct('lon', CAST(doc_id % 7 + 2 AS DOUBLE), 'lat', CAST(1 AS DOUBLE)),"
        " named_struct('lon', CAST(doc_id % 7 + 1 AS DOUBLE), 'lat', CAST(3 AS DOUBLE))) AS shape",
    )
    sidx = _Ix.ephemeral(sdocs, docs_per_shard=1024, n_buckets=8)
    sections.append(
        (
            "Indexed geo_shape (per-document polygons, search_geo_shape_indexed)",
            "The per-row crossing-parity predicate (runtime edge-direction "
            "resolution — per-row slopes defeat the constant-polygon "
            "compile-time sign fold) is still a pure scan predicate over "
            "the stored array<struct> ring column: no Generate (explode), "
            "no UDF, no extra join; the only exchanges serve the match-set "
            "equi-join and the final TakeOrderedAndProject.",
            plan_of(
                sidx.search_geo_shape_indexed(
                    "w00000", 5,
                    ring_sql=[(f"shape[{j}].lon", f"shape[{j}].lat") for j in range(3)],
                    point=(1.0, 1.0),
                )
            ),
        )
    )

    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        lang_guess_trigram,
    )

    sections.append(
        (
            "Trigram language ID (lang_guess_trigram)",
            "The doc side explodes character trigrams (narrow), joins the "
            "BROADCAST profile table, and aggregates per (doc, lang) with "
            "map-side partials; the argmax is a struct-MIN aggregation "
            "(lexicographic (-score, lang)) — map-side combinable, no "
            "window sort (the window form was 10x slower) — then a left "
            "join restores zero-hit docs as 'und'. One real shuffle keyed "
            "on doc_id — the percolate plan shape.",
            plan_of(lang_guess_trigram(docs_tbl)),
        )
    )

    import numpy as np

    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import (
        c4_clean,
        gopher_rules,
    )
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import sq8_topk

    rng = np.random.default_rng(11)
    vmat = rng.standard_normal((200, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vmat[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    sq8 = sq8_topk(emb, [float(x) for x in vmat[0]], k=5, rescore=20)
    sq8.collect()
    sections.append(
        (
            "SQ8 quantized ANN (quantized top-C scan + broadcast exact rescore)",
            "Pass 1 reads only the 4x-smaller int8 code blobs and reduces "
            "per-partition via TakeOrderedAndProject (no shuffle of the "
            "table); pass 2 broadcast-joins the C-row candidate set back to "
            "the fat vectors for the exact rescore — full-precision bytes "
            "are read for C rows only. Asserted no SortMergeJoin/Cartesian "
            "in tests/test_plans.py.",
            plan_of(sq8),
        )
    )

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import pq_topk

    pq = pq_topk(
        emb, [float(x) for x in vmat[0]], k=5, rescore=20, m=4, k_cent=8, sample_n=64
    )
    pq.collect()
    sections.append(
        (
            "PQ ANN (ADC scan over m-byte codes + broadcast exact rescore)",
            "Codebooks train driver-side on a bounded sample (corpus-size "
            "independent); the ADC pass reads only the m-byte code blobs "
            "(16x smaller at dim=64, m=16) and ranks via one lookup-table "
            "fancy-index per Arrow batch, reducing per-partition through "
            "TakeOrderedAndProject; the C-row candidate set broadcast-joins "
            "back to the fat vectors for the exact rescore — the SQ8 shape "
            "with a deeper compression ratio.",
            plan_of(pq),
        )
    )

    docs_dl = idx._docs_df().select("doc_id", "text")
    sections.append(
        (
            "Gopher / C4 quality filters (scan-speed Column algebra)",
            "Both curation filters are ONE projection of higher-order "
            "array/regex expressions fused by whole-stage codegen — no "
            "shuffle, no UDF, no explode; they run at scan speed and "
            "preserve the input partitioning (gopher_rules shown; c4_clean "
            "plans identically).",
            plan_of(gopher_rules(docs_dl, min_stopwords=1)),
        )
    )
    _ = c4_clean  # same plan shape; kept imported for parity checks

    sections.append(
        (
            "Driver-side pyarrow point-read paths (no Spark plan — by design)",
            "Three query paths deliberately execute with ZERO Spark jobs via\n"
            "pruned pyarrow parquet reads; their 'plan' is the file layout:\n\n"
            "* **Serving path** (`search_local` / `search_phrase_local` /\n"
            "  `get_docs_local`): term_bucket hive-partition pruning + term\n"
            "  row-group pruning inside bucket-sorted postings files — cost\n"
            "  ~|q|·n_shards posting runs regardless of corpus width; the doc\n"
            "  store is doc_id-ordered so `get_docs_local`'s id-set filter\n"
            "  prunes to the covering row groups. Rank/score-identity with\n"
            "  the distributed plan: tests/test_local_serving.py.\n"
            "* **Term-dictionary expansions** (prefix/wildcard/fuzzy/suggest):\n"
            "  term_stats is term-sorted AND carries a term_len column; the\n"
            "  read pushes `prefix range AND len within the edit-distance\n"
            "  pigeonhole` into the parquet filter, and a hard cap\n"
            "  (MAX_EXPANSION_SCAN) fails loudly rather than materializing a\n"
            "  vocabulary slice driver-side (tests/test_filtered_search.py\n"
            "  'term_len' assertions).\n"
            "* **Phrase-suggester LM** (`suggest_phrase`): lm_unigrams /\n"
            "  lm_bigrams are range-clustered and sorted so footer min/max\n"
            "  prunes candidate-count point reads — suggestion cost is\n"
            "  independent of corpus tokenize cost; the on-demand pass\n"
            "  remains only as the ephemeral-index fallback.",
            "(driver-side pyarrow dataset reads; pruning is asserted in the "
            "tests named above rather than via .explain)",
        )
    )

    import datetime as dt

    from kafka_elasticsearch_standalone_consumer_spark.ops.sessions import session_stats

    ev = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i * 40), i % 7)
         for i in range(100)],
        "event_id long, ts timestamp, user_id long",
    )
    sections.append(
        (
            "Sessionization (inactivity-gap windows)",
            "The window hash-partitions on the session KEY (user_id) — "
            "never WindowExec's single-partition shape — so a task holds "
            "one user's events, and the rollup is a second keyed shuffle "
            "with map-side partials. Both sorts are per-partition "
            "(global=false). Asserted in tests/test_plans.py.",
            plan_of(session_stats(ev)),
        )
    )

    ndf = spark.createDataFrame(
        [(i, "w00000 alpha", [{"name": "a", "ms": float(i)}]) for i in range(16)],
        "doc_id long, text string, calls array<struct<name:string,ms:double>>",
    )
    nidx = Index.ephemeral(ndf, docs_per_shard=16, n_buckets=4)
    sections.append(
        (
            "reverse_nested aggregation (step back to parents)",
            "ONE explode (bounded blowup = objects/doc), the (bucket, "
            "parent) distinct that IS reverse_nested's a-parent-counts-"
            "once semantics, one keyed groupBy. The parent metric rides "
            "the rows from before the explode — no join back to the doc "
            "store, no cartesian.",
            plan_of(nidx.reverse_nested_agg("alpha", "calls", "name", "length(text)")),
        )
    )

    import tempfile as _tf

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        build_ivf_index,
        knn_join_ivf,
        train_centroids,
    )

    qs3 = emb.filter("vec_id < 3").selectExpr("vec_id as qid", "embedding")
    ivf_wh = _tf.mkdtemp(prefix="plans_ivf_")
    build_ivf_index(emb, train_centroids(emb, 4, iters=1), ivf_wh)
    kj = knn_join_ivf(spark, ivf_wh, qs3, k=5, nprobe=1)
    kj.collect()
    sections.append(
        (
            "Batched kNN join, IVF-routed (knn_join_ivf)",
            "One job answers the whole query batch: the scan is partition-"
            "pruned to the union of routed lists (PartitionFilters on "
            "list_id), the tiny (qid, list_id, qvec) routing table "
            "BroadcastExchanges so each base row is scored only against "
            "the queries that probed its list, the fold-order pair cosine "
            "runs in codegen, and the only shuffle is the qid-keyed window "
            "over surviving rows. Asserted in tests/test_plans.py. The "
            "brute twin (knn_join) has no join at all — a mapInPandas "
            "matmul emitting ≤ q×k rows per Arrow batch into the same "
            "keyed window.",
            plan_of(kj),
        )
    )

    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import bpe_encode

    enc = bpe_encode(
        tr.withColumn("doc_id", F.monotonically_increasing_id()),
        [(1, "0", "0", 9), (2, "w", "00", 5)],
    )
    enc.collect()
    sections.append(
        (
            "BPE encoder (pure-Column greedy merge chain)",
            "The double-delimiter replace chain runs entirely inside "
            "whole-stage codegen — no BatchEvalPython/ArrowEvalPython, no "
            "window, and exactly ONE exchange (the final per-doc "
            "partial→final aggregate). Token counting is length arithmetic "
            "on the chain's output, so the whole encoder is scan-speed. "
            "Asserted in tests/test_plans.py.",
            plan_of(enc),
        )
    )

    from kafka_elasticsearch_standalone_consumer_spark.ops.graph import pagerank

    edges = spark.range(500).select(
        F.col("id").alias("src"), ((F.col("id") * 7 + 3) % 500).alias("dst")
    )
    pr = pagerank(edges, n_iter=2)
    pr.collect()
    sections.append(
        (
            "PageRank iteration (link-authority curation weight)",
            "One round = edges⋈rank hash join keyed on src plus ONE "
            "dst-keyed partial→final aggregation — never a cartesian "
            "product, never a single-partition exchange, no Python eval. "
            "At 100 TB the edge table is bucketed by src once so every "
            "round's join co-locates; AQE splits celebrity-in-degree skew. "
            "Asserted in tests/test_plans.py.",
            plan_of(pr),
        )
    )

    cdocs = spark.createDataFrame(
        [
            (i, "alpha beta", str(i % 5), [{"name": "a", "ms": float(i)}])
            for i in range(40)
        ],
        "doc_id long, text string, conv_key string, "
        "calls array<struct<name:string,ms:double>>",
    )
    cix = Index.ephemeral(cdocs, docs_per_shard=8, n_buckets=4)
    ih = cix.search_has_child_inner("alpha", 3, inner_k=2, group_col="conv_key")
    ih.collect()
    sections.append(
        (
            "inner_hits on has_child (ES 1.5.0 — parent evidence)",
            "The parent top-k is the existing has_child aggregation "
            "(parent-keyed groupBy + TakeOrderedAndProject); the ≤k "
            "surviving parents BROADCAST back against the scored children "
            "(BroadcastHashJoin), so the per-parent row_number window only "
            "ever ranks survivors' children — never a global window, never "
            "a cartesian product. The nested flavor ranks objects with "
            "higher-order Columns and explodes only ≤ k×inner_k rows AFTER "
            "the top-k join (exactly one Generate, plan-asserted). "
            "Asserted in tests/test_plans.py.",
            plan_of(ih),
        )
    )

    import numpy as np

    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import (
        build_dedup_store,
        dedup_incremental,
    )
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import bq_topk

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((120, 64)).astype(np.float32)
    embp = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(120)],
        "vec_id long, embedding array<float>",
    )
    bq = bq_topk(embp, [float(x) for x in vecs[0]], k=5, rescore=20)
    bq.collect()
    sections.append(
        (
            "Binary-quantization ANN (1-bit codes, Hamming scan + exact rescore)",
            "Pass 1 is PURE Column algebra — the sign-bit packing is a "
            "bitwise-OR chain and the Hamming ranking a bit_count fold, so "
            "the whole candidate scan stays inside WholeStageCodegen with "
            "no Python evaluator anywhere (plan-asserted: no ArrowEvalPython/"
            "MapInPandas) and reduces via TakeOrderedAndProject; pass 2 "
            "broadcasts the candidate ids back to the fat vectors. At scale "
            "pass 1 reads ONE int64 per 64 dims — a 32× narrower scan than "
            "float32.",
            plan_of(bq),
        )
    )

    dstore = tempfile.mkdtemp() + "/dstore"
    hist = tr.selectExpr(
        "cast(turn_idx as long) + 1000 * (abs(hash(conv_id)) % 1000) as doc_id", "text"
    ).limit(200)
    build_dedup_store(hist.filter("doc_id % 2 = 0"), dstore)
    incr = dedup_incremental(spark, dstore, hist.filter("doc_id % 2 = 1"), threshold=0.8)
    incr.collect()
    sections.append(
        (
            "Incremental dedup probe (new batch vs persisted LSH store)",
            "History is never rescanned: the probe joins the store's banded "
            "signature table (hive-partitioned by band) against the new "
            "batch's bands, and the exact-verification shingle read is "
            "LEFT-SEMI pruned to candidate doc_ids only. The decision fold "
            "is a struct-min aggregate — no window over the corpus.",
            plan_of(incr),
        )
    )

    out = ["# PLANS — captured physical plans for the hot paths",
           "",
           "Regenerate with `python tools/dump_plans.py`. Assertions over these",
           "properties live in `tests/test_plans.py` (they run per-commit; this",
           "file is the human-readable snapshot).",
           ""]
    for title, why, plan in sections:
        out += [f"## {title}", "", why, "", "```", plan.rstrip(), "```", ""]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
