#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line on stdout.

Phases (at ``$SPARK_GRAFT_SF_DIR``, default /root/testdata/sf0.1, on
``local[$SPARK_GRAFT_CPUS]``):

  index_build   full checkpointed index build over a deterministic
                synthetic transcripts corpus sized to the sf (the
                BASELINE.json headline: turns/sec)
  bm25_wand     reference query set through the block-max WAND fast path
  bm25_oracle   one query through the declarative DataFrame oracle
  dedup_minhash MinHash+LSH near-dup pairs over documents.parquet
  cosine_topk   brute-force cosine top-10 over embeddings.parquet

``--scaling`` additionally reruns the index build at local[8] vs
local[32] (the sandbox proxy for N vs 4N executors) and rewrites
BENCH.md with both throughputs + efficiency.
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
    wh = tempfile.mkdtemp(prefix="bench_idx_")
    try:
        n_convs = n_convs_for(sf)
        tr = generate_transcripts(spark, n_convs=n_convs, seed=42)
        n_turns = tr.count()  # generation cost excluded from build timing

        t0 = time.monotonic()
        build_index(spark, tr, wh, docs_per_shard=1 << 14, n_buckets=64)
        t["index_build"] = time.monotonic() - t0

        timings_q = None
        if measure_queries:
            idx = Index(spark, wh)
            idx.postings = idx.postings.persist()
            idx.postings.count()  # warm the postings cache (ES keeps segments hot)
            qs = [q["query"] for q in reference_queries(N_QUERIES)]
            t0 = time.monotonic()
            for q in qs:
                idx.search(q, 10, mode="bmw").collect()
            t["bm25_wand"] = time.monotonic() - t0
            t0 = time.monotonic()
            idx.search_oracle(qs[0], 10).collect()
            t["bm25_oracle"] = time.monotonic() - t0
            timings_q = len(qs)
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
        t0 = time.monotonic()
        minhash_lsh_pairs(docs, threshold=0.8).count()
        t["dedup_minhash"] = time.monotonic() - t0

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
        t0 = time.monotonic()
        cosine_topk(emb, qv, 10).collect()
        t["cosine_topk"] = time.monotonic() - t0
    finally:
        spark.stop()


def run_scaling(sf: float) -> dict:
    """local[8] vs local[32] on the SAME input — the sandbox stand-in for
    N vs 4N executors (BASELINE.md scaling row)."""
    out = {}
    for cores in (8, 32):
        t, counts = build_and_query(f"local[{cores}]", cores, sf, measure_queries=False)
        thr = counts["n_turns"] / t["index_build"]
        out[f"local{cores}"] = {
            "build_sec": round(t["index_build"], 2),
            "turns_per_sec": round(thr, 1),
        }
        log(f"scaling: local[{cores}] build {t['index_build']:.1f}s ({thr:.0f} turns/s)")
    t8 = out["local8"]["build_sec"]
    t32 = out["local32"]["build_sec"]
    out["speedup_8_to_32"] = round(t8 / t32, 3)
    out["efficiency"] = round((t8 / t32) / 4.0, 3)
    return out


def write_bench_md(sf: float, n_turns: int, scaling: dict) -> None:
    md = f"""# BENCH — measured scaling evidence

Two-parallelism scaling run (sandbox proxy for N vs 4N executors per
BASELINE.md): the SAME deterministic transcripts corpus ({n_turns:,} turns,
sf={sf}) built end-to-end (dense ids → tokenize → stats → salted posting
pack → parquet warehouse) at local[8] and local[32].

| parallelism | build wall (s) | throughput (turns/s) |
|---|---|---|
| local[8]  (N)  | {scaling['local8']['build_sec']} | {scaling['local8']['turns_per_sec']} |
| local[32] (4N) | {scaling['local32']['build_sec']} | {scaling['local32']['turns_per_sec']} |

speedup 8→32 cores: **{scaling['speedup_8_to_32']}×** of a possible 4× →
scaling efficiency **{scaling['efficiency']}** (target ≥ 0.8 per BASELINE.json).

Reproduce: `python bench.py --scaling`
"""
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write(md)


def main():
    sf = sf_of(SF_DIR)
    t, counts = build_and_query(f"local[{CPUS}]", CPUS, sf, measure_queries=True)
    aux_benchmarks(SF_DIR, t)

    scaling = None
    if "--scaling" in sys.argv:
        scaling = run_scaling(sf)
        write_bench_md(sf, counts["n_turns"], scaling)

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
    }
    if scaling:
        result["scaling"] = scaling
    print(json.dumps(result))


if __name__ == "__main__":
    main()
