"""Operating the index like the ES cluster it replaces — and serving
point queries without paying Spark's job-scheduling floor.

    python examples/operate_and_serve.py [n_convs]

The reference's users lean on three operational ES behaviors beyond
querying (snapshot/restore, alias swaps, analyzer choice) plus the
implicit one: a point query answers in milliseconds. Each section below
is the Spark-side counterpart, one library call each:

  1. build an index with a non-default analyzer (the `english` chain)
  2. snapshot it into a repository (verifying manifest)
  3. restore under a new name and atomically swap a `prod` alias onto it
  4. serve point queries through the alias with the ZERO-Spark-job path
     (search_local / search_phrase_local / get_docs_local) and show they
     are rank/score-identical to the distributed plan
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_convs: int = 400) -> None:
    from kafka_elasticsearch_standalone_consumer_spark.corpus import generate_transcripts
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.snapshot import (
        create_snapshot,
        list_snapshots,
        open_alias,
        restore_snapshot,
        set_alias,
    )
    from kafka_elasticsearch_standalone_consumer_spark.session import get_spark

    spark = get_spark(app_name="operate-and-serve", master="local[8]")
    root = tempfile.mkdtemp(prefix="ops_demo_")
    wh, repo, registry = f"{root}/idx", f"{root}/repo", f"{root}/registry"

    # 1. build — analyzer is a build knob, threaded through append/compact
    turns = generate_transcripts(spark, n_convs=n_convs, seed=42)
    build_index(spark, turns, wh, docs_per_shard=1024, n_buckets=16,
                positions=True, analyzer="standard")
    print(f"built {wh} over {turns.count()} turns")

    # 2. snapshot into a repository
    info = create_snapshot(wh, repo, "nightly-0")
    print(f"snapshot nightly-0: {info['n_files']} files, {info['total_bytes']:,} bytes")
    print("repository:", [s["name"] for s in list_snapshots(repo)])

    # 3. restore + atomic alias swap (the ES zero-downtime reindex move)
    restore_snapshot(repo, "nightly-0", f"{root}/idx_restored")
    set_alias(registry, "prod", f"{root}/idx_restored")
    idx = open_alias(spark, registry, "prod")

    # 4. point-query serving: same kernels, pruned pyarrow reads, no jobs
    q = "w00000 w00003 w00015"
    dist = [(r["doc_id"], round(r["score"], 9))
            for r in idx.search(q, 5, mode="bmw").collect()]
    loc = [(d, round(s, 9)) for d, s in idx.search_local(q, 5)]
    assert loc == dist, "serving path must be rank/score-identical"
    print("search_local == search():", loc == dist, "->", loc[:3])

    filt = idx.search_local(q, 5, where=[("role", "=", "user")])
    print("filtered serving hits:", [d for d, _ in filt])

    first_text = idx.fetch(idx.search(q, 1)).first()["text"]
    phrase = " ".join(first_text.split()[:2])
    print("phrase local:", idx.search_phrase_local(phrase, 3))
    print("mget local:", [r["doc_id"] for r in idx.get_docs_local([1, 5, 10**9])])
    print("bool local:", idx.search_bool_local(
        should=[q], must_not=["w00015"], where=[("role", "=", "user")], k=3))
    print("simple_query_string local:",
          idx.simple_query_string_local("w00000 | w00003 -w00015 w0001*", 3))
    print("prefix local:", idx.search_prefix_local("w0001", 3))
    print("wildcard local:", idx.search_wildcard_local("w0?00*", 3))

    # 5. index templates: settings applied by name pattern at creation
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.templates import (
        create_index,
        put_template,
    )
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    treg = root + "/templates.json"
    put_template(treg, "stopdocs", "docs-*", {"analyzer": "stop", "n_buckets": 8})
    tpath = create_index(spark, turns, treg, "docs-2026", root)
    tidx = Index(spark, tpath)
    print("templated index analyzer:", tidx.meta["analyzer"],
          "| stopword query hits:", tidx.search("the and of", 3).count())

    # 6. ES _optimize: tiered partial merge (max_num_segments), doc_ids
    # preserved, queries score identically before and after
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.incremental import (
        append_segment,
        list_segments,
        optimize,
    )
    from kafka_elasticsearch_standalone_consumer_spark.tables import Warehouse

    extra1 = turns.filter("turn_idx % 3 = 0").selectExpr(
        "concat(conv_id, '-x1') AS conv_id", "turn_idx", "role", "text", "tool", "ts")
    extra2 = turns.filter("turn_idx % 3 = 1").selectExpr(
        "concat(conv_id, '-x2') AS conv_id", "turn_idx", "role", "text", "tool", "ts")
    append_segment(spark, extra1, tpath, idempotency_key="x1")
    append_segment(spark, extra2, tpath, idempotency_key="x2")
    before = [tuple(r) for r in Index(spark, tpath).search("the and of", 3).collect()]
    retired = optimize(spark, tpath, max_num_segments=2)
    after = [tuple(r) for r in Index(spark, tpath).search("the and of", 3).collect()]
    print("optimize retired", retired, "segments ->",
          len(list_segments(Warehouse(tpath))), "left; results identical:",
          before == after)

    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400)
