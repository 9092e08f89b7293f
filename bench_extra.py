#!/usr/bin/env python
"""Supplementary benchmarks (round 6 optimization evidence) — NOT the
driver-timed bench (bench.py is frozen for measurement; this file only
isolates where its phases spend time, per the optimization guide §1).

Usage:
  python bench_extra.py ann      # per-path breakdown of ann_recall_phase
  python bench_extra.py build    # per-step breakdown of index_build
  python bench_extra.py aux      # the small aux phases, isolated walls
  python bench_extra.py wand     # per-query bm25 wand wall + job shape

Each section prints one JSON line so runs are diffable. Uses the same
corpus/session parameters as bench.py.
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


def _spark(name: str):
    from kafka_elasticsearch_standalone_consumer_spark.session import get_spark

    return get_spark(app_name=name, master=f"local[{CPUS}]", shuffle_partitions=CPUS)


def _timed(label: str, spark, fn, t: dict):
    spark.sparkContext.setJobDescription(label)
    t0 = time.monotonic()
    out = fn()
    t[label] = round(time.monotonic() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    return out


def ann_breakdown() -> None:
    """ann_recall_phase, path by path: 10 queries against embeddings.parquet
    exactly as bench.ann_recall runs them, but with per-path accumulated
    walls and the driver-side trainer isolated."""
    import numpy as np
    from pyspark.sql import functions as F

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        bq_topk,
        build_ivf_index,
        cosine_topk,
        ivf_search,
        ivfpq_topk,
        knn_join_ivf,
        lsh_topk,
        opq_topk,
        pq_topk,
        sq8_topk,
        train_centroids,
        _opq_fit,
        _pq_lloyd,
    )

    spark = _spark("bench-extra-ann")
    t: dict[str, float] = {}
    try:
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        n_vec = emb.count()
        qrows = emb.filter(F.col("vec_id") < 10).collect()
        queries = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in qrows}

        # driver-side trainer in isolation (no Spark)
        rows = emb.orderBy("vec_id").limit(1024).collect()
        x = np.array([[float(v) for v in r["embedding"]] for r in rows])
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        t0 = time.monotonic(); _pq_lloyd(x, 16, 256, 8)
        t["driver_pq_lloyd_fit"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic(); _opq_fit(x, 16, 256, 8, 8)
        t["driver_opq_fit"] = round(time.monotonic() - t0, 3)

        scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
        ivf_wh = tempfile.mkdtemp(prefix="bx_ivf_", dir=scratch)
        try:
            _timed("train_centroids+build_ivf", spark, lambda: (
                build_ivf_index(emb, train_centroids(emb, n_lists=16, iters=3), ivf_wh)
            ), t)
            paths = {
                "truth_cosine": lambda qv: cosine_topk(emb, qv, 10),
                "lsh_h1": lambda qv: lsh_topk(emb, qv, 10, bits=8, probe_hamming=1),
                "lsh_h0": lambda qv: lsh_topk(emb, qv, 10, bits=8, probe_hamming=0),
                "ivf_np4": lambda qv: ivf_search(spark, ivf_wh, qv, 10, nprobe=4),
                "ivf_np1": lambda qv: ivf_search(spark, ivf_wh, qv, 10, nprobe=1),
                "sq8_r20": lambda qv: sq8_topk(emb, qv, 10, rescore=20),
                "sq8_rk": lambda qv: sq8_topk(emb, qv, 10, rescore=10),
                "pq_r20": lambda qv: pq_topk(emb, qv, 10, rescore=20),
                "pq_rk": lambda qv: pq_topk(emb, qv, 10, rescore=10),
                "opq_r20": lambda qv: opq_topk(emb, qv, 10, rescore=20),
                "ivfpq_np4": lambda qv: ivfpq_topk(emb, qv, 10, nprobe=4, rescore=50),
                "bq_r50": lambda qv: bq_topk(emb, qv, 10, rescore=50),
                "bq_r100": lambda qv: bq_topk(emb, qv, 10, rescore=100),
            }
            for name, fn in paths.items():
                spark.sparkContext.setJobDescription(f"ann:{name}")
                t0 = time.monotonic()
                for qv in queries.values():
                    fn(qv).collect()
                t[name] = round(time.monotonic() - t0, 3)
                spark.sparkContext.setJobDescription(None)
            qdf = emb.filter(F.col("vec_id") < 10).selectExpr(
                "vec_id as qid", "embedding"
            )
            _timed("knn_ivf_np4", spark,
                   lambda: knn_join_ivf(spark, ivf_wh, qdf, 10, nprobe=4).collect(), t)
        finally:
            shutil.rmtree(ivf_wh, ignore_errors=True)
        total = round(sum(v for k, v in t.items() if not k.startswith("driver_")), 3)
        print(json.dumps({"section": "ann", "n_vec": n_vec, "total": total, "t": t}))
    finally:
        spark.stop()


def build_breakdown() -> None:
    """index_build, step by step (the checkpoint log already walls each
    step — this surfaces those numbers without reading parquet logs).
    ``KESC_BX_MULT`` scales the corpus (8 = the bench's 8x sentinel)."""
    from kafka_elasticsearch_standalone_consumer_spark.corpus import generate_transcripts
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index

    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)
    n_convs = max(int(190_000 * (sf / 0.1) / 10.5), 50)
    n_convs *= int(os.environ.get("KESC_BX_MULT", "1"))
    spark = _spark("bench-extra-build")
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    wh = tempfile.mkdtemp(prefix="bx_idx_", dir=scratch)
    try:
        tr = generate_transcripts(spark, n_convs=n_convs, seed=42)
        tr.count()
        t0 = time.monotonic()
        build_index(spark, tr, wh, docs_per_shard=1 << 14, n_buckets=64)
        wall = time.monotonic() - t0
        from kafka_elasticsearch_standalone_consumer_spark.tables import Warehouse

        steps = {
            r["step_id"]: round(r["wall_ms"] / 1000.0, 3)
            for r in Warehouse(wh).read_rows("sys_checkpoint")
            if r["status"] == "ok"
        }
        print(json.dumps({"section": "build", "wall": round(wall, 3), "steps": steps}))
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        spark.stop()


def aux_walls() -> None:
    """The sub-3s aux phases, one labelled wall each (single rep)."""
    from pyspark.sql import functions as F

    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import nb_classify
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import (
        dup_clusters,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from kafka_elasticsearch_standalone_consumer_spark.ops.graph import hits, pagerank
    from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import heavy_hitters

    spark = _spark("bench-extra-aux")
    t: dict[str, float] = {}
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n_docs = docs.count()
        _timed("dedup_minhash", spark,
               lambda: minhash_lsh_pairs(docs, threshold=0.8).count(), t)
        _timed("dedup_simhash", spark,
               lambda: simhash_pairs(docs, max_hamming=3).count(), t)
        _timed("dedup_clusters", spark, lambda: dup_clusters(
            docs, minhash_lsh_pairs(docs, threshold=0.8)).count(), t)
        toks = docs.select(F.explode(tokenize_col(F.col("text"))).alias("term"))
        _timed("heavy_hitters", spark,
               lambda: heavy_hitters(toks, "term", k=50, capacity=4096).count(), t)
        pr_edges = docs.select(
            F.col("doc_id").alias("src"),
            F.explode(F.array(*[
                ((F.col("doc_id") * 1409 + 937 * j) % n_docs).cast("long")
                for j in range(3)
            ])).alias("dst"),
        )
        _timed("pagerank_5it", spark, lambda: pagerank(pr_edges, n_iter=5).count(), t)
        _timed("hits_4it", spark, lambda: hits(pr_edges, n_iter=4).count(), t)
        _timed("nb_classify", spark, lambda: nb_classify(docs).count(), t)
        print(json.dumps({"section": "aux", "t": t}))
    finally:
        spark.stop()


def wand_walls() -> None:
    """bm25_wand: build once, then per-query walls on the warm path."""
    from kafka_elasticsearch_standalone_consumer_spark.corpus import (
        generate_transcripts,
        reference_queries,
    )
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)
    n_convs = max(int(190_000 * (sf / 0.1) / 10.5), 50)
    spark = _spark("bench-extra-wand")
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    wh = tempfile.mkdtemp(prefix="bx_wand_", dir=scratch)
    try:
        tr = generate_transcripts(spark, n_convs=n_convs, seed=42)
        build_index(spark, tr, wh, docs_per_shard=1 << 14, n_buckets=64)
        idx = Index(spark, wh)
        idx.postings = idx.postings.persist()
        idx.postings.count()
        qs = [q["query"] for q in reference_queries(20)]
        walls = []
        for rep in range(2):
            for q in qs:
                t0 = time.monotonic()
                idx.search(q, 10, mode="bmw").collect()
                walls.append(round(time.monotonic() - t0, 4))
        print(json.dumps({
            "section": "wand",
            "rep1_total": round(sum(walls[:20]), 3),
            "rep2_total": round(sum(walls[20:]), 3),
            "per_query_rep2": walls[20:],
        }))
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ann"
    {"ann": ann_breakdown, "build": build_breakdown,
     "aux": aux_walls, "wand": wand_walls}[which]()
