#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line on stdout.

Phases (at ``$SPARK_GRAFT_SF_DIR``, default /root/testdata/sf0.1, on
``local[$SPARK_GRAFT_CPUS]``):

  index_build     full checkpointed index build over a deterministic
                  synthetic transcripts corpus sized to the sf (the
                  BASELINE.json headline: turns/sec), best-of-N
  index_build_8x  best-of-$KESC_BENCH_8X_REPS (default 2) builds over an
                  8x corpus (~1.6M turns at sf0.1) — compute dominates
                  the fixed session/scheduling overhead, so round-over-
                  round regressions show here before they clear the
                  sf0.1 noise floor
  bm25_wand       reference query set, block-max WAND fast path (per-query);
                  all query phases are best-of-$KESC_BENCH_QUERY_REPS (default 2)
  bm25_wand_batch the same query set in ONE Spark job (search_many)
  bm25_local      the same query set through the zero-Spark-job serving
                  path (driver-side pyarrow + the same kernels) —
                  measures point-query latency without the scheduler
                  floor; rank-identical to bm25_wand
  bm25_phrase     one exact-phrase query over a positions build
  facets          one terms-aggregation over all matches
  bm25_oracle     one query through the declarative DataFrame oracle
  dedup_minhash   MinHash+LSH near-dup pairs over documents.parquet
  dedup_simhash   SimHash near-dup pairs over documents.parquet
  quality         text-quality feature pass over documents.parquet
  dup_spans       cross-doc exact-substring duplication stats (Lee et al.)
  bpe_train16     BPE trainer, 16 merges (one corpus groupBy + driver loop)
  bpe_encode      pure-Column BPE encoder applying those merges corpus-wide
  cms_probe8      Count-Min sketch build + 8 probe estimates (one pass)
  lang_tri        trigram-profile language ID over documents.parquet
  cosine_topk     brute-force cosine top-10 over embeddings.parquet

``--scaling`` additionally reruns the index build at pinned local[N]
vs local[4N] physical CPUs (the sandbox proxy for N vs 4N executors;
see SCALING_CORES) and rewrites BENCH.md with both throughputs +
efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_QUERIES = 20

# Query phases are best-of-N too (builds always were): on this VM's ±30%
# co-tenant noise a single-shot query wall can't distinguish a real
# regression from a noisy neighbor — r2's bm25_wand "regression" read
# 1.34x in one single-run table and 1.10x in another on the same code.
QUERY_REPS = int(os.environ.get("KESC_BENCH_QUERY_REPS", "2"))


def best_of(fn, reps: int = 0) -> float:
    """Min wall over ``reps`` runs of ``fn`` (measures the engine, not
    the noisiest co-tenant; queries are warm after rep 1, which is the
    regime ES serves from anyway)."""
    walls = []
    for _ in range(reps or QUERY_REPS):
        t0 = time.monotonic()
        fn()
        walls.append(time.monotonic() - t0)
    return min(walls)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def n_convs_for(sf: float) -> int:
    # ~10.5 turns/conversation → ~200k turns at sf0.1
    return max(int(190_000 * (sf / 0.1) / 10.5), 50)


def build_and_query(master: str, shuffle_partitions: int, sf: float, measure_queries: bool):
    """One full cycle on a fresh SparkSession; returns (timings, counts)."""
    from kafka_elasticsearch_standalone_consumer_spark.corpus import (
        generate_transcripts,
        reference_queries,
    )
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index
    from kafka_elasticsearch_standalone_consumer_spark.session import get_spark

    spark = get_spark(app_name=f"bench-{master}", master=master, shuffle_partitions=shuffle_partitions)
    t: dict[str, float] = {}
    # warehouse on RAM-backed scratch when present (stands in for the
    # per-node local storage a real cluster writes index tables to)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    wh = tempfile.mkdtemp(prefix="bench_idx_", dir=scratch)
    try:
        n_convs = n_convs_for(sf)
        tr = generate_transcripts(spark, n_convs=n_convs, seed=42)
        n_turns = tr.count()  # generation cost excluded from build timing

        # best-of-N fresh builds: the sandbox VM's co-tenant noise swings
        # single-run walls up to ±4×; min measures the engine
        reps = int(os.environ.get("KESC_BENCH_BUILD_REPS", "2"))
        walls = []
        for i in range(reps):
            target = wh if i == reps - 1 else f"{wh}_warm{i}"
            t0 = time.monotonic()
            build_index(spark, tr, target, docs_per_shard=1 << 14, n_buckets=64)
            walls.append(time.monotonic() - t0)
            if target != wh:
                shutil.rmtree(target, ignore_errors=True)
        t["index_build"] = min(walls)

        timings_q = None
        if measure_queries:
            idx = Index(spark, wh)
            idx.postings = idx.postings.persist()
            idx.postings.count()  # warm the postings cache (ES keeps segments hot)
            qs = [q["query"] for q in reference_queries(N_QUERIES)]

            def _wand():
                for q in qs:
                    idx.search(q, 10, mode="bmw").collect()

            t["bm25_wand"] = best_of(_wand)
            # whole set, ONE Spark job
            t["bm25_wand_batch"] = best_of(lambda: idx.search_many(qs, 10).collect())
            # zero-Spark-job serving path (driver-side pyarrow + kernels):
            # same queries, rank-identical results, no scheduling floor
            idx.search_local(qs[0], 10)  # warm the dataset discovery cache

            def _local():
                for q in qs:
                    idx.search_local(q, 10)

            # the local path is cheap (~2 s) and scheduler-free, so extra
            # reps cost little and squeeze out the remaining timer noise
            t["bm25_local"] = best_of(_local, reps=max(QUERY_REPS, 4))
            t["facets"] = best_of(lambda: idx.facets(qs[0], by="role").collect())
            t["bm25_oracle"] = best_of(lambda: idx.search_oracle(qs[0], 10).collect())
            timings_q = len(qs)

            # phrase path: positions build (ES text fields index positions
            # by default — this is that cost, reported separately from the
            # frequency-only headline) + one exact-phrase query
            from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text

            wh_pos = wh + "_pos"
            t0 = time.monotonic()
            build_index(spark, tr, wh_pos, docs_per_shard=1 << 14, n_buckets=64,
                        positions=True)
            t["index_build_pos"] = time.monotonic() - t0
            idx_p = Index(spark, wh_pos)
            toks = tokenize_text(idx_p._docs_df().select("text").first()["text"])
            phrase = " ".join(toks[:2]) if len(toks) >= 2 else "w00000"
            t["bm25_phrase"] = best_of(lambda: idx_p.search_phrase(phrase, 10).collect())
            t["bm25_phrase_slop"] = best_of(
                lambda: idx_p.search_phrase(phrase, 10, slop=2).collect()
            )
            shutil.rmtree(wh_pos, ignore_errors=True)

            # 8× corpus, best-of-N (default 2): THE compute-dominated
            # regression sentinel (the sf0.1 build is ~half fixed scheduling
            # overhead, so a 10–20% engine regression hides inside its
            # run-to-run noise). Single-rep, round-3's driver run read 82.8 s
            # where the builder's best-of-N read 48.4 s — a 1.7× spread that
            # was pure co-tenant noise; best-of-N keeps the sentinel honest.
            tr8 = generate_transcripts(spark, n_convs=n_convs * 8, seed=42)
            n8 = tr8.count()
            reps8 = int(os.environ.get("KESC_BENCH_8X_REPS", "2"))
            walls8 = []
            for i in range(reps8):
                wh8 = f"{wh}_8x{i}"
                t0 = time.monotonic()
                build_index(spark, tr8, wh8, docs_per_shard=1 << 14, n_buckets=64)
                walls8.append(time.monotonic() - t0)
                shutil.rmtree(wh8, ignore_errors=True)
            t["index_build_8x"] = min(walls8)
            counts_extra = {"n_turns_8x": n8}
            return t, {"n_turns": n_turns, "n_queries": timings_q, **counts_extra}
        return t, {"n_turns": n_turns, "n_queries": timings_q}
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        spark.stop()


def aux_benchmarks(sf_dir: str, t: dict) -> None:
    from pyspark.sql import functions as F

    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import minhash_lsh_pairs
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import cosine_topk
    from kafka_elasticsearch_standalone_consumer_spark.session import get_spark

    spark = get_spark(app_name="bench-aux", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t["dedup_minhash"] = best_of(lambda: minhash_lsh_pairs(docs, threshold=0.8).count())

        from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import simhash_pairs
        from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import quality_features

        t["dedup_simhash"] = best_of(lambda: simhash_pairs(docs, max_hamming=3).count())
        t["quality"] = best_of(lambda: quality_features(docs).count())

        from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
            repetition_features,
        )

        t["repetition"] = best_of(lambda: repetition_features(docs).count())

        from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import dup_span_stats

        t["dup_spans"] = best_of(lambda: dup_span_stats(docs, n=8).count())

        from kafka_elasticsearch_standalone_consumer_spark.query.percolate import percolate

        # reverse search: 32 registered alert queries against every doc
        vocab = "join hash filter vector stream table row scan".split()
        perc_qs = [(i, f"{vocab[i % 8]} {vocab[(i + 3) % 8]} dup") for i in range(32)]
        t["percolate"] = best_of(
            lambda: percolate(docs, perc_qs, minimum_should_match=2).count()
        )

        from kafka_elasticsearch_standalone_consumer_spark.ops.curation import (
            pack_shards,
            redact_pii,
        )
        from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import dup_clusters

        t["dedup_clusters"] = best_of(
            lambda: dup_clusters(
                docs, minhash_lsh_pairs(docs, threshold=0.8)
            ).count()
        )
        t["pack_shards"] = best_of(lambda: pack_shards(docs, 4096).count())
        t["redact_pii"] = best_of(lambda: redact_pii(docs).count())

        from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
            doc_keyterms,
            pmi_pairs,
        )

        t["doc_keyterms"] = best_of(lambda: doc_keyterms(docs, k=3).count())
        t["pmi_pairs"] = best_of(lambda: pmi_pairs(docs, top_n=20, min_count=5).count())

        from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col
        from kafka_elasticsearch_standalone_consumer_spark.ops.graph import pagerank
        from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import heavy_hitters

        # certified exact top-50 terms without a full-vocabulary groupBy
        toks = docs.select(F.explode(tokenize_col(F.col("text"))).alias("term"))
        t["heavy_hitters"] = best_of(
            lambda: heavy_hitters(toks, "term", k=50, capacity=4096).count()
        )
        # 5 damped iterations over the synthesized 3-out-link doc graph
        # (plain-sum scale path, not the deterministic verification fold)
        n_docs = docs.count()
        pr_edges = docs.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    *[((F.col("doc_id") * 1409 + 937 * j) % n_docs).cast("long") for j in range(3)]
                )
            ).alias("dst"),
        )
        t["pagerank_5it"] = best_of(lambda: pagerank(pr_edges, n_iter=5).count())

        from kafka_elasticsearch_standalone_consumer_spark.ops.curation import (
            leakage_safe_split,
            nb_classify,
        )
        from kafka_elasticsearch_standalone_consumer_spark.ops.graph import hits

        # HITS (plain-sum scale path) over the same synthesized graph
        t["hits_4it"] = best_of(lambda: hits(pr_edges, n_iter=4).count())
        # contamination-aware split: shingle both sides, broadcast-filter
        t["leakage_split"] = best_of(
            lambda: leakage_safe_split(docs, eval_frac=0.1, n=8).count()
        )
        # naive Bayes trained + applied in one distributed pass
        t["nb_classify"] = best_of(lambda: nb_classify(docs).count())

        from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import cms_estimate
        from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
            lang_guess_trigram,
        )

        # Count-Min sketch build + 8 probe estimates (one explode+agg pass)
        cms_probes = ["table", "join", "hash", "stream", "vector", "key", "row", "the"]
        t["cms_probe8"] = best_of(
            lambda: cms_estimate(toks, "term", cms_probes, d=4, w=256).count()
        )
        # trigram-profile language ID (broadcast profiles, one explode+agg)
        t["lang_tri"] = best_of(lambda: lang_guess_trigram(docs).count())

        from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
            bpe_encode,
            bpe_merges,
        )

        # trainer (one corpus groupBy + driver merge loop) then the
        # pure-Column encoder applying those merges over the whole corpus
        t0 = time.monotonic()
        merges = bpe_merges(docs, n_merges=16)
        t["bpe_train16"] = time.monotonic() - t0
        t["bpe_encode"] = best_of(lambda: bpe_encode(docs, merges).count())

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
        t["cosine_topk"] = best_of(lambda: cosine_topk(emb, qv, 10).collect())

        from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import knn_join

        # batched kNN: ONE pass answers 32 queries (vs 32 cosine_topk jobs)
        q32 = emb.filter(F.col("vec_id") < 32).selectExpr(
            "vec_id as qid", "embedding"
        )
        t["knn_join_32q"] = best_of(lambda: knn_join(emb, q32, 10).count())
        recall = ann_recall(spark, emb)
        t["ann_recall_phase"] = recall.pop("_wall")
    finally:
        spark.stop()
    return recall


ANN_RECALL_QUERIES = 10
ANN_RECALL_K = 10


def ann_recall(spark, emb) -> dict:
    """Measured recall@k for the ANN paths at PRODUCTION-ish operating
    points — the oracle entries pin deterministic 100%-recall
    configurations (correct, enforcing), so this is where the
    accuracy/cost trade-off of realistic settings gets stated honestly:

    * lsh_h1 / lsh_h0 — 8-bit hyperplane LSH probing Hamming ≤ 1 / exact
      bucket only (≈9/256 resp. 1/256 of the data read on the indexed
      layout)
    * ivf_np4 / ivf_np1 — 16-list trained-codebook IVF probing 4 resp. 1
      list (≈1/4 resp. 1/16 of the data read)

    Ground truth is brute-force cosine top-k; recall is averaged over
    the first ANN_RECALL_QUERIES corpus vectors as queries.
    """
    import time as _time

    from pyspark.sql import functions as F

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        cosine_topk,
        ivf_search,
        ivfpq_topk,
        lsh_topk,
        pq_topk,
        opq_topk,
        bq_topk,
        sq8_topk,
        train_centroids,
        build_ivf_index,
    )

    t0 = _time.monotonic()
    qrows = emb.filter(F.col("vec_id") < ANN_RECALL_QUERIES).collect()
    queries = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in qrows}
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    ivf_wh = tempfile.mkdtemp(prefix="bench_ivf_", dir=scratch)
    try:
        cent = train_centroids(emb, n_lists=16, iters=3)
        build_ivf_index(emb, cent, ivf_wh)
        hits = {k: 0 for k in ("lsh_h1", "lsh_h0", "ivf_np4", "ivf_np1", "sq8_r20", "sq8_rk", "pq_r20", "pq_rk", "opq_r20", "ivfpq_np4", "bq_r50", "bq_r100", "knn_ivf_np4")}
        denom = 0
        truths = {}
        for qid, qv in queries.items():
            truth = {
                r["vec_id"]
                for r in cosine_topk(emb, qv, ANN_RECALL_K).collect()
            }
            truths[qid] = truth
            denom += len(truth)
            got = {
                "lsh_h1": lsh_topk(emb, qv, ANN_RECALL_K, bits=8, probe_hamming=1),
                "lsh_h0": lsh_topk(emb, qv, ANN_RECALL_K, bits=8, probe_hamming=0),
                "ivf_np4": ivf_search(spark, ivf_wh, qv, ANN_RECALL_K, nprobe=4),
                "ivf_np1": ivf_search(spark, ivf_wh, qv, ANN_RECALL_K, nprobe=1),
                "sq8_r20": sq8_topk(emb, qv, ANN_RECALL_K, rescore=20),
                "sq8_rk": sq8_topk(emb, qv, ANN_RECALL_K, rescore=ANN_RECALL_K),
                "pq_r20": pq_topk(emb, qv, ANN_RECALL_K, rescore=20),
                "opq_r20": opq_topk(emb, qv, ANN_RECALL_K, rescore=20),
                "pq_rk": pq_topk(emb, qv, ANN_RECALL_K, rescore=ANN_RECALL_K),
                "ivfpq_np4": ivfpq_topk(emb, qv, ANN_RECALL_K, nprobe=4, rescore=50),
                "bq_r50": bq_topk(emb, qv, ANN_RECALL_K, rescore=50),
                "bq_r100": bq_topk(emb, qv, ANN_RECALL_K, rescore=100),
            }
            for name, df in got.items():
                hits[name] += len(truth & {r["vec_id"] for r in df.collect()})
        # batched routed kNN join: ONE job answers all queries at nprobe=4
        from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
            knn_join_ivf,
        )

        qdf = emb.filter(F.col("vec_id") < ANN_RECALL_QUERIES).selectExpr(
            "vec_id as qid", "embedding"
        )
        for r in knn_join_ivf(spark, ivf_wh, qdf, ANN_RECALL_K, nprobe=4).collect():
            if r["vec_id"] in truths[int(r["qid"])]:
                hits["knn_ivf_np4"] += 1
        out = {name: round(h / denom, 4) for name, h in hits.items()}
        out["_wall"] = _time.monotonic() - t0
        return out
    finally:
        shutil.rmtree(ivf_wh, ignore_errors=True)


RECALL_MD_START = "<!-- ann-recall:start -->"
RECALL_MD_END = "<!-- ann-recall:end -->"
CAMPAIGNS_MD_START = "<!-- campaigns:start -->"
CAMPAIGNS_MD_END = "<!-- campaigns:end -->"
ROUNDS_MD_START = "<!-- round-over-round:start -->"
ROUNDS_MD_END = "<!-- round-over-round:end -->"


def update_recall_md(recall: dict) -> None:
    """Insert/replace the ANN-recall section of BENCH.md (marker-delimited
    so --scaling's full rewrite and this section compose in either order)."""
    section = f"""{RECALL_MD_START}
## ANN recall at production operating points

The correctness oracles pin LSH/IVF at deterministic 100%-recall
configurations; the numbers below state the accuracy/cost trade-off at
realistic settings instead (recall@{ANN_RECALL_K} vs brute-force cosine,
{ANN_RECALL_QUERIES} corpus-vector queries, embeddings.parquet at the bench sf;
data-read fractions assume the indexed layouts, where probes become
partition pruning):

| path | operating point | ~data read | recall@{ANN_RECALL_K} |
|---|---|---|---|
| LSH (8-bit hyperplane) | probe Hamming ≤ 1 | 9/256 | {recall['lsh_h1']} |
| LSH (8-bit hyperplane) | exact bucket only | 1/256 | {recall['lsh_h0']} |
| IVF (16 trained lists) | nprobe=4 | 1/4 | {recall['ivf_np4']} |
| IVF (16 trained lists) | nprobe=1 | 1/16 | {recall['ivf_np1']} |
| SQ8 (int8 + exact rescore) | rescore=20 | 1/4 of bytes + 20 rows | {recall['sq8_r20']} |
| SQ8 (int8 + exact rescore) | rescore=k (pure quantized rank) | 1/4 of bytes + {ANN_RECALL_K} rows | {recall['sq8_rk']} |
| PQ (16×256 ADC, 1024-sample codebooks + exact rescore) | rescore=20 | 1/16 of bytes + 20 rows | {recall['pq_r20']} |
| PQ (16×256 ADC, 1024-sample codebooks + exact rescore) | rescore=k (pure ADC rank) | 1/16 of bytes + {ANN_RECALL_K} rows | {recall['pq_rk']} |
| OPQ (learned rotation + the same 16×256 ADC) | rescore=20 | 1/16 of bytes + 20 rows | {recall['opq_r20']} |
| IVF-PQ (16 lists, residual 16×256, rescore=50) | nprobe=4 | 1/4 of rows × 1/16 of bytes + 50 rows | {recall['ivfpq_np4']} |
| BQ (1-bit sign codes + exact rescore) | rescore=50 | 1/32 of bytes + 50 rows | {recall['bq_r50']} |
| BQ (1-bit sign codes + exact rescore) | rescore=100 | 1/32 of bytes + 100 rows | {recall['bq_r100']} |
| batched kNN join (IVF-routed, all {ANN_RECALL_QUERIES} queries in ONE job) | nprobe=4 | union of routed lists, once | {recall['knn_ivf_np4']} |
{RECALL_MD_END}"""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md")
    text = ""
    if os.path.isfile(path):
        with open(path) as f:
            text = f.read()
    if RECALL_MD_START in text and RECALL_MD_END in text:
        pre = text[: text.index(RECALL_MD_START)]
        post = text[text.index(RECALL_MD_END) + len(RECALL_MD_END):]
        text = pre + section + post
    else:
        text = text.rstrip("\n") + "\n\n" + section + "\n"
    with open(path, "w") as f:
        f.write(text)


SCALING_SF_MULT = 8  # scaling corpus is 8× the headline sf (~1.6M turns):
# the two-parallelism comparison needs compute to dominate the ~20 s of
# fixed session/stage-scheduling overhead, which at the headline size
# would measure the scheduler, not the engine — and a multi-minute job is
# closer in shape to the 100 TB regime the build targets


def child_build(cores: int, sf: float) -> None:
    """Subprocess body for one scaling leg (prints one JSON line)."""
    t, counts = build_and_query(f"local[{cores}]", cores, sf, measure_queries=False)
    print(json.dumps({"build_sec": t["index_build"], "n_turns": counts["n_turns"]}))


SCALING_CORES = (2, 8)  # N and 4N *physical* cores. The host exposes 32
# vCPUs over ~16 physical cores (SMT): a pure-ALU multiprocess probe
# measures aggregate scaling 2→8 procs = 3.90× (0.975), 4→16 = 3.49×
# (0.87), 8→32 = 2.66× (0.67) — so comparing local[8] to local[32] would
# measure hyper-threading, not the engine. Pinned 2 vs 8 CPUs keeps both
# legs on real cores at the required 4× ratio.


def run_scaling(sf: float) -> dict:
    """Pinned-CPU local[N] vs local[4N] on the SAME input — the sandbox
    stand-in for N vs 4N executors (BASELINE.md scaling row).

    Each leg runs in a subprocess pinned with ``taskset -c 0-{N-1}`` so the
    whole process tree (JVM task threads AND Python/Arrow UDF workers)
    really has N CPUs. Unpinned, a local[8] session's 8 JVM threads plus 8
    Python workers spread over all 32 host CPUs (~2× the budget), which
    silently deflates the measured speedup.
    """
    import subprocess

    # the headline phase's stopped SparkSession leaves its py4j-gatewayed
    # JVM alive until THIS python exits — observed burning ~0.5 CPU during
    # the pinned legs. Tear the gateway down so the legs run clean.
    try:
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        from pyspark import SparkContext

        gw = SparkContext._gateway
        if gw is not None:
            gw.shutdown()
            SparkContext._gateway = None
            SparkContext._jvm = None
    except Exception:
        pass  # scaling must run even if the gateway is already gone

    reps = int(os.environ.get("KESC_SCALING_REPS", "3"))
    out = {"n_turns": None, "cores": list(SCALING_CORES), "reps": reps}
    # INTERLEAVED legs (2,8,2,8,...), not block-ordered: host co-tenant
    # windows drift over the ~30 min campaign, and running all small-leg
    # reps first lets a quieting (or loudening) host bias the ratio one
    # way — interleaving makes both legs sample the same window mixture
    # (round 4: block order read 0.727 in a window where an interleaved
    # campaign read 0.822; see BENCH.md campaign disclosure).
    rep_lists: dict[int, list] = {cores: [] for cores in SCALING_CORES}
    for rep_i in range(reps):
        for cores in SCALING_CORES:
            cmd = [
                "taskset", "-c", f"0-{cores - 1}",
                sys.executable, os.path.abspath(__file__),
                "--child-build", str(cores), str(sf * SCALING_SF_MULT),
            ]
            # best-of-N: this sandbox VM shows ±30% run-to-run wall
            # variance from invisible host co-tenancy; the min estimates
            # the engine, not the noisiest co-tenant
            res = subprocess.run(cmd, capture_output=True, text=True, check=True)
            rep_lists[cores].append(json.loads(res.stdout.strip().splitlines()[-1]))
            log(f"scaling: local[{cores}] rep {rep_lists[cores][-1]['build_sec']:.1f}s")
    for cores in SCALING_CORES:
        legs = rep_lists[cores]
        leg = min(legs, key=lambda r: r["build_sec"])
        thr = leg["n_turns"] / leg["build_sec"]
        out["n_turns"] = leg["n_turns"]
        out[f"local{cores}"] = {
            "build_sec": round(leg["build_sec"], 2),
            "turns_per_sec": round(thr, 1),
            "all_reps_sec": [round(r["build_sec"], 2) for r in legs],
        }
        log(f"scaling: local[{cores}] (pinned to {cores} CPUs) best-of-{reps} "
            f"{leg['build_sec']:.1f}s ({thr:.0f} turns/s)")
    lo, hi = SCALING_CORES
    t_lo = out[f"local{lo}"]["build_sec"]
    t_hi = out[f"local{hi}"]["build_sec"]
    out["speedup_n_to_4n"] = round(t_lo / t_hi, 3)
    out["efficiency"] = round((t_lo / t_hi) / (hi / lo), 3)
    return out


def _round_over_round_md(t: dict) -> str:
    """Per-query deltas vs the previous round's recorded BENCH_r{N}.json
    (the driver writes one per round; compare against the newest)."""
    import glob
    import re as _re

    here = os.path.dirname(os.path.abspath(__file__))
    prior = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")),
                   key=lambda p: int(_re.search(r"r(\d+)", p).group(1)))
    if not prior:
        return ""
    with open(prior[-1]) as f:
        rec = json.load(f)
    # the driver records our JSON line under "parsed"
    base = rec.get("parsed", rec).get("queries", {})
    rows = []
    for k in sorted(set(t) | set(base)):
        cur, old = t.get(k), base.get(k)
        if cur is not None and old is not None:
            rows.append(f"| {k} | {old:.2f} | {cur:.2f} | {cur / old:.2f}x |")
        elif cur is not None:
            rows.append(f"| {k} | — | {cur:.2f} | new |")
    name = os.path.basename(prior[-1])
    return (
        f"\n{ROUNDS_MD_START}\n## Round-over-round (this run vs {name})\n\n"
        "Best-of-N walls on a VM with ±30% noise — read trends, not ±20%\n"
        "wiggles; the 8x-corpus build is the compute-dominated sentinel.\n\n"
        "| phase | prev (s) | now (s) | ratio |\n|---|---|---|---|\n"
        + "\n".join(rows) + f"\n{ROUNDS_MD_END}\n"
    )


def write_bench_md(sf: float, n_turns: int, scaling: dict, t: dict | None = None) -> None:
    lo, hi = SCALING_CORES
    md = f"""# BENCH — measured scaling evidence

Two-parallelism scaling run (sandbox proxy for N vs 4N executors per
BASELINE.md): the SAME deterministic transcripts corpus ({n_turns:,} turns,
{SCALING_SF_MULT}x the sf={sf} headline corpus so compute dominates the
~12 s fixed session overhead) built end-to-end (dense ids -> tokenize ->
stats -> salted posting pack -> parquet warehouse) at local[{lo}] and
local[{hi}].

Methodology (all reproducible with `python bench.py --scaling`):

* **Pinned CPUs.** Each leg runs in its own process under
  `taskset -c 0-(N-1)`, so the JVM task threads AND the Python/Arrow UDF
  workers together get exactly N CPUs — an honest stand-in for an N-core
  vs 4N-core cluster. Unpinned, the small leg borrows idle host cores
  through its Python workers and the comparison is meaningless.
* **Physical cores only.** The host exposes 32 vCPUs over ~16 physical
  cores (SMT). A pure-ALU multiprocess probe (no Spark) measures the
  host's own aggregate scaling at 2->8 procs = 3.90x (0.975 eff),
  4->16 = 3.49x (0.87), 8->32 = 2.66x (0.67): above 16 workers the
  hardware itself cannot scale, so a local[8]-vs-local[32] comparison
  would measure hyper-threading, not the engine. N={lo} vs 4N={hi}
  keeps both legs on real cores at the required 4x ratio.
* **RAM-backed scratch** (`/dev/shm`) for shuffle dirs and the output
  warehouse: on a real cluster every executor spills/writes to its own
  local NVMe (aggregate bandwidth scales with node count); the sandbox's
  single shared virtual disk would otherwise serialize both legs at the
  same ~775 MB/s.

* **Best-of-{scaling.get('reps', 1)} per leg, legs INTERLEAVED**
  (2,8,2,8,…): the sandbox VM shows up to ±30% run-to-run wall variance
  from invisible host co-tenancy; the min over repeats estimates the
  engine, not the noisiest co-tenant, and interleaving makes both legs
  sample the same host-window mixture so drift cannot bias the ratio
  (all rep times listed below).

| parallelism | build wall (s), best | all reps (s) | throughput (turns/s) |
|---|---|---|---|
| local[{lo}], {lo} CPUs (N)  | {scaling[f'local{lo}']['build_sec']} | {scaling[f'local{lo}'].get('all_reps_sec')} | {scaling[f'local{lo}']['turns_per_sec']} |
| local[{hi}], {hi} CPUs (4N) | {scaling[f'local{hi}']['build_sec']} | {scaling[f'local{hi}'].get('all_reps_sec')} | {scaling[f'local{hi}']['turns_per_sec']} |

speedup N->4N: **{scaling['speedup_n_to_4n']}x** of a possible 4x ->
scaling efficiency **{scaling['efficiency']}** (target >= 0.8 per BASELINE.json).
"""
    if t:
        md += _round_over_round_md(t)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md")
    # preserve hand-maintained marker sections across full rewrites (the
    # campaign-disclosure history and the recall table both outlive any
    # single --scaling run)
    old = ""
    if os.path.isfile(path):
        with open(path) as f:
            old = f.read()
    for start, end in ((CAMPAIGNS_MD_START, CAMPAIGNS_MD_END),
                       (ROUNDS_MD_START, ROUNDS_MD_END),
                       (RECALL_MD_START, RECALL_MD_END)):
        if start in old and end in old and start not in md:
            kept = old[old.index(start): old.index(end) + len(end)]
            md = md.rstrip("\n") + "\n\n" + kept + "\n"
    with open(path, "w") as f:
        f.write(md)


def main():
    if "--child-build" in sys.argv:
        i = sys.argv.index("--child-build")
        child_build(int(sys.argv[i + 1]), float(sys.argv[i + 2]))
        return
    if "--scaling-only" in sys.argv:
        # re-run JUST the pinned legs (the headline phase is ~14 min of
        # work that doesn't feed the scaling number): for repeating the
        # measurement when the first attempt lands in the host's
        # co-tenant-noise regime (see BENCH.md methodology)
        sf = sf_of(SF_DIR)
        scaling = run_scaling(sf)
        write_bench_md(sf, scaling["n_turns"], scaling)
        print(json.dumps({"metric": "scaling_efficiency", "unit": "ratio",
                          "value": scaling["efficiency"], "sf": sf,
                          "scaling": scaling}))
        return
    sf = sf_of(SF_DIR)
    t, counts = build_and_query(f"local[{CPUS}]", CPUS, sf, measure_queries=True)
    recall = aux_benchmarks(SF_DIR, t)

    scaling = None
    if "--scaling" in sys.argv:
        scaling = run_scaling(sf)
        write_bench_md(sf, scaling["n_turns"], scaling, t)
    if recall:
        update_recall_md(recall)

    total = sum(t.values())
    result = {
        "metric": "index_build+bm25_suite_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in t.items()},
        "sf": sf,
        "n_turns": counts["n_turns"],
        "index_turns_per_sec": round(counts["n_turns"] / t["index_build"], 1),
        "bm25_sec_per_query": round(t["bm25_wand"] / counts["n_queries"], 3),
        "bm25_local_sec_per_query": round(t["bm25_local"] / counts["n_queries"], 4),
    }
    if recall:
        result["ann_recall_at_10"] = recall
    if "n_turns_8x" in counts:
        result["n_turns_8x"] = counts["n_turns_8x"]
        result["index_8x_turns_per_sec"] = round(
            counts["n_turns_8x"] / t["index_build_8x"], 1
        )
    if scaling:
        result["scaling"] = scaling
    print(json.dumps(result))


if __name__ == "__main__":
    main()
