"""End-to-end training-data pipeline demo: curate a transcripts corpus,
index the survivors, and query it — the full "switch from the reference"
story in one file.

    python examples/curate_and_index.py [n_convs]

Stages (each a library call — nothing here is demo-only logic):
  1. generate the deterministic synthetic transcripts corpus
  2. assign dense doc_ids (stable (conv_id, turn_idx) identity)
  3. text-quality scoring + Gopher repetition gate → drop low-quality turns
  4. exact dedup → keep one copy per distinct text
  4b. near-dup clusters → keep the min-id doc per component;
      PII redaction; benchmark decontamination; token-budget shard packing
  5. resumable index build over the survivors
  6. BM25 / phrase / filtered / facet queries with highlighted hits
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(n_convs: int = 400) -> None:
    from kafka_elasticsearch_standalone_consumer_spark.corpus import generate_transcripts
    from kafka_elasticsearch_standalone_consumer_spark.ids import assign_dense_ids
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import exact_dedup
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import quality_features
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index
    from kafka_elasticsearch_standalone_consumer_spark.session import get_spark

    spark = get_spark(app_name="curate-and-index")

    # 1-2: corpus + identity
    turns = assign_dense_ids(generate_transcripts(spark, n_convs=n_convs, seed=42))
    n0 = turns.count()

    # 3: quality gate (empty/garbage turns score < 0.5) + Gopher
    # repetition gate (chant/boilerplate loops: dup-5-gram fraction > 0.5)
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        repetition_features,
    )

    # 3a: rule-based quality gates first (Gopher A1.1 + C4 §2.2) — pure
    # Column algebra, so they cost one scan before anything heavier runs
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import (
        c4_clean,
        gopher_rules,
    )

    docs_gc = turns.select("doc_id", "text")
    n_gopher = gopher_rules(docs_gc, min_words=5, min_stopwords=0).filter("keep").count()
    n_c4 = c4_clean(docs_gc, min_kept_lines=0).filter("keep").count()
    print(f"rule gates: gopher keeps {n_gopher}, c4 keeps {n_c4} of {turns.count()}")

    scored = quality_features(turns.select("doc_id", "text")).select("doc_id", "quality")
    keep_q = scored.filter(F.col("quality") >= 0.5).select("doc_id")
    loops = repetition_features(turns.select("doc_id", "text"))
    keep_r = loops.filter(F.col("dup5_frac") <= 0.5).select("doc_id")
    turns_q = turns.join(keep_q, "doc_id", "left_semi").join(keep_r, "doc_id", "left_semi")

    # 4: exact dedup (keep the lowest doc_id of each distinct text)
    keep_d = exact_dedup(turns_q).select(F.col("keep_id").alias("doc_id"))
    deduped = turns_q.join(keep_d, "doc_id", "left_semi")

    # 4b: near-dup clusters → canonical doc per component; scrub PII;
    # drop benchmark-contaminated docs; pack the rest into token shards
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import (
        pack_shards,
        redact_pii,
    )
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import (
        decontaminate,
        dup_clusters,
        minhash_lsh_pairs,
    )

    clusters = dup_clusters(deduped, minhash_lsh_pairs(deduped, threshold=0.8))
    canon = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    near_deduped = deduped.join(canon, "doc_id", "left_semi")
    benchmark = deduped.filter("doc_id % 97 = 0")  # stand-in eval set
    dirty = decontaminate(near_deduped, benchmark, n=8).select("doc_id")
    clean = near_deduped.join(dirty, "doc_id", "left_anti")
    clean = clean.drop("text").join(
        redact_pii(clean).select("doc_id", "text"), "doc_id"
    )
    shards = pack_shards(clean, target_tokens=4096)
    n_shards = shards.select("shard_id").distinct().count()
    survivors = clean.drop("doc_id")
    n1 = survivors.count()
    print(f"shard packing: {n1} docs -> {n_shards} shards of ~4096 tokens")

    # 5: resumable index build (with positions: phrase queries)
    wh = tempfile.mkdtemp(prefix="curated_idx_") + "/idx"
    build_index(spark, survivors, wh, positions=True)
    idx = Index(spark, wh)

    # 6: query it every way
    q = "w00000 w00002"
    top = (
        idx.highlight(idx.search(q, 5), q)
        .select("conv_id", "turn_idx", "score", "snippet")
        .orderBy(F.desc("score"))
    )
    phrase_hits = idx.search_phrase("w00000 w00001", 5)
    user_hits = idx.search(q, 5, where="role = 'user'")
    facet = idx.facets(q, by="role")

    print(f"turns: {n0} -> quality+dedup survivors: {n1}")
    top.show(5, truncate=60)
    print("phrase hits:", phrase_hits.count(), "| user-only hits:", user_hits.count())
    facet.show()

    # 7: dense + hybrid retrieval over an embedding column
    import numpy as np
    from pyspark.sql import Window

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        cosine_topk,
        ivfpq_topk,
        pq_topk,
        rrf_fuse,
    )

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((200, 32)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    qv = [float(x) for x in vecs[0]]
    print("PQ ANN (m-byte ADC scan + exact rescore):")
    pq_topk(emb, qv, 5, rescore=20, m=8, k_cent=16, sample_n=128).show()
    print("IVF-PQ (residual codes, 2 of 8 lists probed):")
    ivfpq_topk(
        emb, qv, 5, nprobe=2, rescore=20, n_lists=8, m=8, k_cent=16, sample_n=128
    ).show()

    def ranked(df, score_col, id_col):
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        return df.withColumn("rank", F.row_number().over(w)).select(
            F.col(id_col).alias("doc_id"), "rank"
        )

    print("hybrid BM25 + dense via reciprocal-rank fusion:")
    rrf_fuse(
        [ranked(idx.search(q, 50), "score", "doc_id"),
         ranked(cosine_topk(emb, qv, 50), "cosine", "vec_id")],
        k=5,
    ).show()

    print("batched kNN join (one pass, all queries):")
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import knn_join

    qs = emb.filter(F.col("vec_id") < 3).selectExpr("vec_id as qid", "embedding")
    knn_join(emb, qs, k=3).orderBy("qid", "rank").show()

    print("TF-IDF keyterms (top-2 per doc) and PMI collocations:")
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        doc_keyterms,
        pmi_pairs,
    )

    doc_keyterms(docs_gc, k=2).show(6)
    pmi_pairs(docs_gc, top_n=5, min_count=3).show(truncate=False)

    print("rolling-context training examples (turn + previous 2 turns):")
    from kafka_elasticsearch_standalone_consumer_spark.ops.sessions import turn_contexts

    turn_contexts(turns.limit(200), k_prev=2, sep=" | ").show(5, truncate=60)

    print("BPE tokenizer: train 8 merges, encode the corpus (pure Column):")
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        bpe_encode,
        bpe_merges,
        bpe_pair_counts,
    )

    bpe_pair_counts(docs_gc, top_n=5).show()
    merges = bpe_merges(docs_gc, n_merges=8)
    print("  merges:", [(l, r) for _, l, r, _ in merges])
    bpe_encode(docs_gc, merges).orderBy("doc_id").show(5)

    print("MMR diversified top-5 (duplicates fall behind diverse picks):")
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        cosine_range,
        hard_negatives,
        mmr_rerank,
    )

    mmr_rerank(emb, qv, k=5, n_candidates=20, lam=0.5).show()
    print("radius search (cosine >= 0.4):")
    cosine_range(emb, qv, 0.4).show()
    print("hard negatives for 2 queries (positives q+10/q+11 excluded):")
    pos = spark.createDataFrame(
        [(q, q + 10) for q in range(2)] + [(q, q + 11) for q in range(2)],
        "qid long, pos_id long",
    )
    qs2 = emb.filter(F.col("vec_id") < 2).selectExpr("vec_id as qid", "embedding")
    hard_negatives(emb, qs2, pos, k=3).orderBy("qid", "rank").show()

    print("temperature-resampled role mixture (alpha=0.5 flattening):")
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import (
        temperature_mix,
    )

    mixed = temperature_mix(clean, "role", alpha=0.5)
    clean.groupBy("role").count().withColumnRenamed("count", "before").join(
        mixed.groupBy("role").count().withColumnRenamed("count", "after"), "role"
    ).orderBy("role").show()

    print("certified heavy hitters + PageRank authority weights:")
    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col
    from kafka_elasticsearch_standalone_consumer_spark.ops.graph import pagerank
    from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import (
        heavy_hitters,
    )

    toks = clean.select(F.explode(tokenize_col(F.col("text"))).alias("term"))
    heavy_hitters(toks, "term", k=5, capacity=512).show()
    n_cl = clean.count()
    edges = clean.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 1409 + 937) % n_cl).cast("long").alias("dst"),
    )
    pagerank(edges, n_iter=5).orderBy(F.desc("pr"), "node").show(5)

    # round-5 continuation: the filter-funnel attrition report (which rule
    # ate the corpus, one pass) and cross-run incremental dedup against a
    # persisted signature store (history never rescanned)
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import filter_funnel
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import (
        build_dedup_store,
        dedup_incremental,
    )

    print("filter funnel (per-stage attrition):")
    filter_funnel(
        clean,
        [("min_len", "length(text) >= 50"), ("user_or_assistant", "role <> 'tool'")],
    ).show(truncate=False)
    print("incremental dedup of a new batch against persisted history")
    print("(the batch smuggles in one exact copy of a history doc — caught):")
    store = tempfile.mkdtemp() + "/dstore"
    hist = clean.filter("doc_id % 2 = 0").select("doc_id", "text")
    build_dedup_store(hist, store)
    batch = (
        clean.filter("doc_id % 2 = 1")
        .select("doc_id", "text")
        .unionByName(hist.limit(1).select((F.col("doc_id") + 10**6).alias("doc_id"), "text"))
    )
    dedup_incremental(spark, store, batch, threshold=0.8).filter("NOT keep").show(5)
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400)
