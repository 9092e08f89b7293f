"""Inverted-index build: tokens → sharded, compressed posting runs.

This is the Spark-native re-expression of the reference's ingestion loop
(``IndexerJob.processBatch``, reference ``jobs/IndexerJob.java:284-426``):
where the reference fetched a Kafka batch per partition, transformed rows,
and bulk-posted to Elasticsearch, we scan the transcripts table, tokenize,
and build the index Elasticsearch used to build implicitly.

Skew handling (explicit, per the north rule): the shuffle key is
``(term, shard)`` where ``shard = doc_id div docs_per_shard`` partitions
DOCUMENT space into contiguous ranges. A hot term (Zipfian head) therefore
splits into up to ``n_shards`` independent runs — this is salting where the
salt is a *global* doc range, which buys three properties at once:

  1. no (term, shard) group can exceed ``docs_per_shard`` postings —
     bounded task memory regardless of term skew;
  2. runs of the same term are doc-disjoint and ordered — concatenable
     at read time with zero merge work;
  3. every shard is a self-contained mini-index over its doc range (the
     Elasticsearch shard model), so top-k query kernels run per shard
     with no cross-shard data exchange until the final k-row merge.

The pack stage is ONE shuffle (repartition by term+shard, sort within
partitions by (term, shard, doc_id)) followed by a streaming mapInPandas
that packs complete runs per Arrow batch, carrying the possibly-split
trailing run into the next batch — no per-group pandas overhead, constant
memory per task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark import B, BLOCK_SIZE, K1
from kafka_elasticsearch_standalone_consumer_spark.index import codec

DEFAULT_DOCS_PER_SHARD = 1 << 16  # test-scale default; cluster scale: 1<<22
DEFAULT_TERM_BUCKETS = 64

POSTINGS_SCHEMA = (
    "term string, shard long, n_docs int, docs binary, tfs binary, dls binary, "
    "block_offs_docs array<int>, block_offs_tfs array<int>, block_offs_dls array<int>, "
    "block_max_doc array<long>, block_max_tf array<int>, block_max_impact array<float>"
)
POSTINGS_SCHEMA_POS = POSTINGS_SCHEMA + ", pos binary, block_offs_pos array<int>"


def with_shard(df: DataFrame, docs_per_shard: int, doc_col: str = "doc_id") -> DataFrame:
    """Integer-exact doc-range shard id (no float division: survives 10^12 ids)."""
    return df.withColumn("shard", F.expr(f"{doc_col} div {int(docs_per_shard)}"))


def term_bucket_col(term_col="term", n_buckets: int = DEFAULT_TERM_BUCKETS):
    """Stable hash bucket of a term — the postings partition column the
    query path prunes on (``WHERE term_bucket IN (...)``)."""
    return F.pmod(F.xxhash64(F.col(term_col)), F.lit(n_buckets)).cast("int")


def _pack_batch(
    pdf: pd.DataFrame, avgdl: float, block_size: int, positions: bool = False
) -> pd.DataFrame:
    """Pack every complete (term, shard) run in a sorted batch into rows."""
    terms = pdf["term"].to_numpy()
    shards = pdf["shard"].to_numpy()
    docs = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)
    pos_col = pdf["positions"].to_numpy() if positions else None
    n = len(pdf)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    rows = []
    for s, e in zip(starts, ends):
        run = codec.pack_run(
            docs[s:e], tfs[s:e], dls[s:e], avgdl=avgdl, k1=K1, b=B, block_size=block_size
        )
        row = (
            terms[s],
            int(shards[s]),
            run["n_docs"],
            run["docs"],
            run["tfs"],
            run["dls"],
            run["block_offs_docs"],
            run["block_offs_tfs"],
            run["block_offs_dls"],
            run["block_max_doc"],
            run["block_max_tf"],
            run["block_max_impact"],
        )
        if positions:
            flat = (
                np.concatenate([np.asarray(p, dtype=np.int64) for p in pos_col[s:e]])
                if e > s
                else np.empty(0, np.int64)
            )
            pos_buf, pos_offs = codec.pack_positions(flat, tfs[s:e], block_size)
            row = row + (pos_buf, pos_offs)
        rows.append(row)
    cols = [
        "term", "shard", "n_docs", "docs", "tfs", "dls",
        "block_offs_docs", "block_offs_tfs", "block_offs_dls",
        "block_max_doc", "block_max_tf", "block_max_impact",
    ]
    if positions:
        cols += ["pos", "block_offs_pos"]
    return pd.DataFrame(rows, columns=cols)


def build_postings(
    tokens_with_dl: DataFrame,
    avgdl: float,
    docs_per_shard: int = DEFAULT_DOCS_PER_SHARD,
    n_buckets: int = DEFAULT_TERM_BUCKETS,
    num_partitions: int | None = None,
    block_size: int = BLOCK_SIZE,
    positions: bool = False,
) -> DataFrame:
    """tokens(doc_id, term, tf, dl) → postings rows (one per term×shard run).

    ``dl`` rides along per posting (Lucene-norm style) so queries never
    join doc_stats; ``avgdl`` is baked into the exact block-max impacts.
    ``positions=True`` expects a ``positions`` array column on the input
    and packs the per-posting position stream (phrase-query support).
    """
    num_partitions = (
        num_partitions or tokens_with_dl.sparkSession.sparkContext.defaultParallelism
    )
    # Range-partition on (bucket, term, shard): (a) the sampler balances
    # partitions by actual row counts, absorbing Zipf term skew better than
    # hash; (b) each reduce task holds a CONTIGUOUS bucket range, so the
    # partitionBy(term_bucket) writer emits ~buckets/P files per task
    # instead of up to `n_buckets` (64× fewer files at scale). A run split
    # across a range boundary just yields two doc-disjoint rows for the
    # same (term, shard) — the query kernels already merge run lists.
    arranged = (
        with_shard(tokens_with_dl, docs_per_shard)
        .withColumn("term_bucket", term_bucket_col("term", n_buckets))
        .repartitionByRange(num_partitions, "term_bucket", "term", "shard")
        .sortWithinPartitions("term_bucket", "term", "shard", "doc_id")
        .select(
            "term", "shard", "doc_id", "tf", "dl",
            *(["positions"] if positions else []),
        )
    )

    def pack(batches):
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold back the trailing run — it may continue in the next batch
            terms = pdf["term"].to_numpy()
            shards = pdf["shard"].to_numpy()
            last_start = int(
                np.flatnonzero((terms != terms[-1]) | (shards != shards[-1]))[-1] + 1
            ) if ((terms != terms[-1]) | (shards != shards[-1])).any() else 0
            carry = pdf.iloc[last_start:]
            head = pdf.iloc[:last_start]
            if len(head):
                yield _pack_batch(head, avgdl, block_size, positions)
        if carry is not None and len(carry):
            yield _pack_batch(carry, avgdl, block_size, positions)

    schema = POSTINGS_SCHEMA_POS if positions else POSTINGS_SCHEMA
    packed = arranged.mapInPandas(pack, schema=schema)
    return packed.withColumn("term_bucket", term_bucket_col("term", n_buckets))
