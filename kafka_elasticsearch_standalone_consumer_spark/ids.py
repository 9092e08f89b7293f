"""Dense, deterministic doc_id assignment — vectorized, no row-at-a-time ops.

Document identity (SURVEY §1.4): one turn = one document; ``doc_id`` is the
dense rank of ``(conv_id, turn_idx)`` under stable global ordering —
semantically ``row_number() OVER (ORDER BY conv_id, turn_idx) - 1``, but a
single-partition window would serialize the whole corpus through one task.

Scalable technique (classic zipWithIndex-without-RDD):
  1. range-repartition + sort within partitions on the order key —
     partitions are globally ordered, rows ordered within each;
  2. one cheap pass counts rows per partition;
  3. cumulative partition offsets are broadcast; a mapInPandas pass
     assigns ``offset[pid] + local_row_number``.

Two scans of the input, zero driver-side row loops; at 10^12 rows the
count pass reads only the order-key columns (column-pruned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense int64 ``id_col`` = rank under ``order_cols`` ordering."""
    num_partitions = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    arranged = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    # cache so the count pass and the assignment pass see identical
    # range-sample boundaries (and to avoid recomputing the sort)
    arranged = arranged.persist()
    counts = {r["_pid"]: r["cnt"] for r in arranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = arranged.drop("_pid").schema.add(id_col, "long", False)

    def assign(batches):
        local = 0
        for pdf in batches:
            if not len(pdf):
                continue
            base = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf[id_col] = range(base + local, base + local + len(pdf))
            local += len(pdf)
            yield pdf

    return arranged.mapInPandas(assign, schema=out_schema)


def build_doc_map(transcripts: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """doc_map(conv_id, turn_idx, doc_id) — the stable identity table."""
    return assign_dense_ids(
        transcripts.select("conv_id", "turn_idx"),
        order_cols=("conv_id", "turn_idx"),
        num_partitions=num_partitions,
    )
