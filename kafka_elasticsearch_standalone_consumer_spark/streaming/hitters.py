"""Streaming frequent-terms monitor — a bounded Misra–Gries summary of
the WHOLE stream so far, updated per micro-batch, with the current top-k
estimate appended to a metrics sink.

The batch :func:`ops.sketches.heavy_hitters` certifies an exact top-k
with a second counting pass; a stream cannot re-scan its history, so the
streaming form keeps the classic estimate-with-error-bound contract
instead: for every tracked value, ``est ≤ true ≤ est + bound`` where
``bound`` is the cumulative sum of reduction DELTAS across every
per-partition sketch and driver-side merge (per Misra–Gries /
mergeable-summaries analysis, bound ≤ N_stream/(capacity+1); a single
value's counter loses at most one delta per reduction).
The emitted rows carry the bound so the operator can see exactly how
trustworthy each rank is — a value whose lead over the (k+1)-th estimate
exceeds ``bound`` is provably in the true top-k.

Execution per micro-batch: the distributed per-partition sketch kernel
(ops/sketches._sketch_partitions — O(capacity) state per partition) runs
over the BATCH; only the sketch-sized survivor summaries collect to the
driver, where they merge into the persistent state (capacity-bounded, a
driver-side pyarrow read/write like every control-plane table in this
repo — never a Spark job for one small table).

Effectively-once: state is VERSIONED by batch_id (``v{batch_id}.parquet``
under ``state_path``). A replayed micro-batch finds its own version
already present, skips the merge, and just rewrites its metrics
partition (dynamic partition overwrite — streaming/alerts.py's trick), so
restarts never double-count. Only the latest two versions are kept.

Reference parity: the reference daemon exposed per-batch counters over
JMX (ref ConsumerJob statistics); this is the content-level analogue — a
live "what terms dominate the ingest" signal with bounded memory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import (
    SKETCH_SCHEMA,
    _mg_reduce,
    _sketch_partitions,
)

_META_KEY = "__mg_meta__"  # reserved state row: n_seen / bound live here


def _state_versions(state_path: str) -> list[int]:
    if not os.path.isdir(state_path):
        return []
    out = []
    for f in os.listdir(state_path):
        if f.startswith("v") and f.endswith(".parquet"):
            out.append(int(f[1:-8]))
    return sorted(out)


def _read_state(state_path: str, version: int) -> tuple[dict[str, int], int, int]:
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(state_path, f"v{version:020d}.parquet"))
    counters: dict[str, int] = {}
    n_seen = bound = 0
    for v, c, n, b in zip(
        tbl.column("value").to_pylist(),
        tbl.column("cnt").to_pylist(),
        tbl.column("n_seen").to_pylist(),
        tbl.column("bound").to_pylist(),
    ):
        if v == _META_KEY:
            n_seen, bound = int(n), int(b)
        else:
            counters[v] = int(c)
    return counters, n_seen, bound


def _write_state(
    state_path: str, version: int, counters: dict[str, int], n_seen: int, bound: int
) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(state_path, exist_ok=True)
    tbl = pa.table(
        {
            "value": list(counters) + [_META_KEY],
            "cnt": list(counters.values()) + [0],
            "n_seen": [0] * len(counters) + [n_seen],
            "bound": [0] * len(counters) + [bound],
        }
    )
    tmp = os.path.join(state_path, f".v{version:020d}.parquet.tmp")
    pq.write_table(tbl, tmp)
    os.replace(tmp, os.path.join(state_path, f"v{version:020d}.parquet"))
    # keep the latest two versions (current + replay fallback), drop older
    for old in _state_versions(state_path)[:-2]:
        os.remove(os.path.join(state_path, f"v{old:020d}.parquet"))


def heavy_hitters_stream_writer(
    spark: SparkSession,
    stream_df: DataFrame,
    value_col: str,
    state_path: str,
    metrics_path: str,
    checkpoint_dir: str,
    k: int = 10,
    capacity: int = 4096,
):
    """Return a ready-to-start ``DataStreamWriter``. Each micro-batch
    appends ≤ k metrics rows: (batch_id, rank, value, est_count, bound,
    n_seen) — the stream-so-far top-k estimate, its cumulative undercount
    bound, and the total items seen. Caller picks the trigger and calls
    ``.start()``."""
    if capacity <= k:
        raise ValueError(f"capacity ({capacity}) must exceed k ({k})")
    cap = int(capacity)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        versions = _state_versions(state_path)
        if bid in versions:
            # replayed batch: state already merged — just re-emit metrics
            counters, n_seen, bound = _read_state(state_path, bid)
        else:
            base = max((v for v in versions if v < bid), default=None)
            counters, n_seen, bound = (
                _read_state(state_path, base) if base is not None else ({}, 0, 0)
            )
            summary = (
                batch_df.select(F.col(value_col).cast("string").alias("value"))
                .mapInPandas(_sketch_partitions(cap), schema=SKETCH_SCHEMA)
                .collect()
            )
            for r in summary:
                if r["value"] is None:
                    # marker row: partition total + its summed reduce deltas
                    n_seen += int(r["n_part"])
                    bound += int(r["cnt"])
                else:
                    counters[r["value"]] = counters.get(r["value"], 0) + int(r["cnt"])
            bound += _mg_reduce(counters, cap)
            _write_state(state_path, bid, counters, n_seen, bound)
        top = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        rows = [
            (bid, i + 1, v, int(c), int(bound), int(n_seen))
            for i, (v, c) in enumerate(top)
        ]
        out = spark.createDataFrame(
            rows or [(bid, 0, None, 0, int(bound), int(n_seen))],
            "batch_id long, rank long, value string, est_count long, "
            "bound long, n_seen long",
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(metrics_path)
        )

    return stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
