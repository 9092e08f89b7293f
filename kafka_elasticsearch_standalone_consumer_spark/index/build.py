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


def _run_changes(terms, shards: np.ndarray) -> np.ndarray:
    """Boolean run-start flags over a sorted batch: True where the
    (term, shard) key differs from the previous row. ``terms`` is an
    Arrow string array (compared natively — no Python strings)."""
    import pyarrow.compute as pc

    n = len(terms)
    change = np.empty(n, dtype=bool)
    change[0] = True
    if n > 1:
        tne = pc.not_equal(terms.slice(1), terms.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        change[1:] = tne | (shards[1:] != shards[:-1])
    return change


def _pack_arrow(tbl, avgdl: float, block_size: int, positions: bool):
    """Pack one boundary-complete Arrow table of sorted token rows into a
    postings RecordBatch — zero-copy in (list flatten) and out (binary/
    list arrays built directly over the codec core's buffers)."""
    import pyarrow as pa

    n = tbl.num_rows
    terms = tbl.column("term").combine_chunks()
    shards = tbl.column("shard").combine_chunks().to_numpy(zero_copy_only=False)
    docs = tbl.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
    tfs = tbl.column("tf").combine_chunks().to_numpy(zero_copy_only=False)
    dls = tbl.column("dl").combine_chunks().to_numpy(zero_copy_only=False)
    change = _run_changes(terms, shards)
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    flat_pos = row_tf = None
    if positions:
        p_col = tbl.column("positions").combine_chunks()
        flat_pos = p_col.flatten().to_numpy(zero_copy_only=False)
        # segment lengths follow the old pack loop: tf per posting (the
        # stored lists have exactly tf entries by construction)
        row_tf = tfs
    core = codec.pack_runs_core(
        docs, tfs, dls, starts, ends, avgdl=avgdl, k1=K1, b=B,
        block_size=block_size, flat_pos=flat_pos, pos_row_tf=row_tf,
    )
    r = starts.size
    list_offs = pa.array(core["list_offs"].astype(np.int32), type=pa.int32())

    def bin_arr(enc: np.ndarray, bounds: np.ndarray) -> pa.Array:
        off = np.empty(r + 1, dtype=np.int32)
        off[0] = 0
        off[1:] = bounds
        return pa.BinaryArray.from_buffers(
            pa.binary(), r, [None, pa.py_buffer(off), pa.py_buffer(enc)]
        )

    def list_arr(vals: np.ndarray) -> pa.Array:
        return pa.ListArray.from_arrays(list_offs, pa.array(vals))

    arrays = [
        terms.take(pa.array(starts, type=pa.int64())),
        pa.array(shards[starts], type=pa.int64()),
        pa.array(core["n_docs"].astype(np.int32), type=pa.int32()),
        bin_arr(core["enc_docs"], core["bounds_docs"]),
        bin_arr(core["enc_tfs"], core["bounds_tfs"]),
        bin_arr(core["enc_dls"], core["bounds_dls"]),
        list_arr(core["offs_docs"]),
        list_arr(core["offs_tfs"]),
        list_arr(core["offs_dls"]),
        list_arr(core["block_max_doc"]),
        list_arr(core["block_max_tf"]),
        list_arr(core["block_max_impact"]),
    ]
    names = [
        "term", "shard", "n_docs", "docs", "tfs", "dls",
        "block_offs_docs", "block_offs_tfs", "block_offs_dls",
        "block_max_doc", "block_max_tf", "block_max_impact",
    ]
    if positions:
        arrays.append(bin_arr(core["enc_pos"], core["bounds_pos"]))
        arrays.append(list_arr(core["offs_pos"]))
        names += ["pos", "block_offs_pos"]
    return pa.RecordBatch.from_arrays(arrays, names=names)


def _pack_stream(batches, avgdl: float, block_size: int, positions: bool):
    """Carry-loop pack over an iterator of Arrow record batches of SORTED
    token rows: yields postings RecordBatches, holding back the trailing
    (possibly batch-split) run so output rows are independent of the
    input batching. Arrow-native (guide §4.2): rows never surface as
    pandas objects — the term column stays an Arrow string array
    (65M-row builds were spending more wall materializing Python
    strings than packing), the positions lists flatten zero-copy, and
    the output batch is assembled straight from the codec core's encode
    buffers (a BinaryArray IS offsets + one data buffer; runs tile the
    batch, so the per-run byte bounds ARE the offsets). Byte-identical
    rows to the per-run pack_run loop
    (tests/test_pack_runs_equivalence.py)."""
    import pyarrow as pa

    carry = None
    for rb in batches:
        tbl = pa.Table.from_batches([rb])
        if carry is not None and carry.num_rows:
            tbl = pa.concat_tables([carry, tbl])
        if not tbl.num_rows:
            continue
        # hold back the trailing run — it may continue in the next batch
        terms = tbl.column("term").combine_chunks()
        shards = tbl.column("shard").combine_chunks().to_numpy(zero_copy_only=False)
        change = _run_changes(terms, shards)
        last_start = int(np.flatnonzero(change)[-1])  # trailing run's start
        carry = tbl.slice(last_start)
        head = tbl.slice(0, last_start)
        if head.num_rows:
            yield _pack_arrow(head, avgdl, block_size, positions)
    if carry is not None and carry.num_rows:
        yield _pack_arrow(carry, avgdl, block_size, positions)


def build_postings(
    tokens_with_dl: DataFrame,
    avgdl: float,
    docs_per_shard: int = DEFAULT_DOCS_PER_SHARD,
    n_buckets: int = DEFAULT_TERM_BUCKETS,
    num_partitions: int | None = None,
    block_size: int = BLOCK_SIZE,
    positions: bool = False,
    scratch_dir: str | None = None,
) -> DataFrame:
    """tokens(doc_id, term, tf, dl) → postings rows (one per term×shard run).

    ``dl`` rides along per posting (Lucene-norm style) so queries never
    join doc_stats; ``avgdl`` is baked into the exact block-max impacts.
    ``positions=True`` expects a ``positions`` array column on the input
    and packs the per-posting position stream (phrase-query support).

    ``scratch_dir`` (the warehouse build passes one) switches the pack
    input to MATERIALIZE-THEN-READ: the shuffled+sorted token rows are
    EAGERLY written as parquet (one file per range partition, columnar,
    whole-stage codegen) and each pack task then reads ITS OWN file with
    pyarrow — so the JVM→Python boundary carries 1 file path per task
    instead of every token row. Spark's per-row Arrow conversion moves
    ~2–3M rows/s/task while pyarrow's C parquet reader moves ~58M rows/s
    (measured on this corpus: a TRIVIAL mapInArrow consumer over the 65M
    sorted 8x-corpus rows cost 24–29 s — the pack compute itself is
    ~0.6 s); this is guide §8's "read your own partition's slice from
    storage" co-location. Output rows are byte-identical to the
    streaming form: one task still packs exactly one sorted range
    partition, and the carry loop makes rows independent of batching.
    The caller owns ``scratch_dir`` cleanup (the builder deletes it
    after the postings table commits). Without ``scratch_dir`` (the
    ephemeral/small path) the pack streams through mapInArrow directly.
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
    schema = POSTINGS_SCHEMA_POS if positions else POSTINGS_SCHEMA

    if scratch_dir is not None:
        import os

        spark = tokens_with_dl.sparkSession
        arranged.write.mode("overwrite").parquet(scratch_dir)
        files = sorted(
            os.path.join(dp, f)
            for dp, _dirs, fs in os.walk(scratch_dir)
            for f in fs
            if f.startswith("part-") and not f.endswith(".crc")
        )
        cols = ["term", "shard", "doc_id", "tf", "dl"] + (
            ["positions"] if positions else []
        )

        def pack_files(path_batches):
            import pyarrow.parquet as pq

            for rb in path_batches:
                for path in rb.column(0).to_pylist():
                    pf = pq.ParquetFile(path)
                    yield from _pack_stream(
                        pf.iter_batches(batch_size=1 << 17, columns=cols),
                        avgdl, block_size, positions,
                    )

        paths = spark.createDataFrame([(p,) for p in files], "path string")
        packed = paths.repartition(max(len(files), 1)).mapInArrow(
            pack_files, schema=schema
        )
        return packed.withColumn("term_bucket", term_bucket_col("term", n_buckets))

    def pack(batches):
        yield from _pack_stream(batches, avgdl, block_size, positions)

    packed = arranged.mapInArrow(pack, schema=schema)
    return packed.withColumn("term_bucket", term_bucket_col("term", n_buckets))
