#!/usr/bin/env python
"""Dump .explain('formatted') for the round-6-touched query paths into
plans/r06/<name>_<tag>.txt (tag = before|after). Run once on the round-5
tree (tag before) and once on the optimized tree (tag after)."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r06")
os.makedirs(OUT, exist_ok=True)


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    import __spark_entry__ as entry
    from kafka_elasticsearch_standalone_consumer_spark.session import get_spark

    spark = get_spark(app_name=f"r06-plans-{TAG}", master="local[4]",
                      shuffle_partitions=4)
    qs = entry.queries()
    names = [
        "ann_lsh_topk", "ann_sq8_topk", "ann_pq_topk", "ann_opq_topk",
        "ann_ivfpq_topk", "semdedup", "ivf_topk", "knn_join_ivf_topk",
        "ann_bq_topk", "bm25_topk_wand", "dedup_minhash_lsh",
    ]
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
                f.write(explain_str(df))
            print(f"wrote {name}_{TAG}.txt", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"SKIP {name}: {type(e).__name__}: {e}", file=sys.stderr)

    # build-side intermediates whose shape changed (no entry returns them)
    import numpy as np
    from kafka_elasticsearch_standalone_consumer_spark.ops import similarity as sim

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cent = sim.train_centroids(emb, n_lists=4, iters=1)
    if hasattr(sim, "ivf_assign_with_payload"):
        assigned = sim.ivf_assign_with_payload(emb, cent)
    else:
        assigned = emb.join(sim.ivf_assign(emb, cent), "vec_id")
    with open(os.path.join(OUT, f"ivf_build_assign_{TAG}.txt"), "w") as f:
        f.write(explain_str(assigned))
    print(f"wrote ivf_build_assign_{TAG}.txt", file=sys.stderr)

    # postings-pack plan (build-side intermediate): the before tree streams
    # the shuffled+sorted token rows through mapInArrow; the after tree
    # materializes them as parquet and packs from per-task file reads
    import inspect
    import shutil
    import tempfile

    from kafka_elasticsearch_standalone_consumer_spark.analysis import doc_term_freqs
    from kafka_elasticsearch_standalone_consumer_spark.index import build as ib

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    toks = doc_term_freqs(docs)
    scratch = None
    try:
        kwargs = {}
        if "scratch_dir" in inspect.signature(ib.build_postings).parameters:
            scratch = tempfile.mkdtemp(prefix="r06plan_")
            kwargs["scratch_dir"] = os.path.join(scratch, "s")
        packed = ib.build_postings(toks, avgdl=10.0, docs_per_shard=1 << 14,
                                   n_buckets=64, **kwargs)
        with open(os.path.join(OUT, f"postings_pack_{TAG}.txt"), "w") as f:
            f.write(explain_str(packed))
        print(f"wrote postings_pack_{TAG}.txt", file=sys.stderr)
    finally:
        if scratch:
            shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
