"""Streaming HyperLogLog cardinality monitor — max-merged HLL registers
over the WHOLE stream so far, updated per micro-batch, with the
stream-so-far distinct-count estimate appended to a metrics sink.

The batch :func:`ops.sketches.hll_cardinality` can attach the exact
distinct count as a verification twin; a stream cannot re-scan its
history, so the streaming form keeps the HLL merge law instead:
registers combine by MAX (the property ES's cardinality agg relies on
to merge shards — the same merge the batch op pytest-asserts across
splits), so the monitor's state after batch N is byte-identical to the
batch sketch over the union of batches 0..N, and the estimate is
byte-identical too (pytest-asserted).

Execution per micro-batch: the distributed register build
(:func:`ops.sketches.hll_registers` — one groupBy(j).max(rho) whose
exchange is bounded at m rows per input partition) runs over the BATCH;
only the ≤ m register rows collect to the driver, where they MAX into
the persistent state. The estimate is then computed driver-side with
arithmetic that MIRRORS hll_cardinality exactly: the register sum is
the exact integer Σ2^(53−M) (overflow-free int64 in any engine), the
bias constant folds to one float literal, the raw estimate is ONE IEEE
division, the linear-counting branch is the only libm call, and the
final 4-dp rounding uses decimal HALF_UP — the same rule Spark's
``round`` applies to a double via its shortest decimal representation.

Effectively-once: state is VERSIONED by batch_id
(``v{batch_id}.parquet`` under ``state_path``, latest two kept — the
streaming/cms.py convention). A replayed micro-batch finds its own
version, skips the merge, and just rewrites its metrics partition
(dynamic partition overwrite), so restarts never double-merge — and
because max-merge is idempotent anyway, even a lost version file only
costs work, never correctness.

Reference parity: the reference daemon surfaced per-partition counters
over JMX (ref IndexerJobStatus.java:5-48); this is the content-level
"how many DISTINCT values have arrived" signal in m integers of state,
the sibling of the Misra–Gries (streaming/hitters) and Count-Min
(streaming/cms) monitors.
"""

from __future__ import annotations

import math
import os
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession

from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import hll_registers


def _state_versions(state_path: str) -> list[int]:
    if not os.path.isdir(state_path):
        return []
    return sorted(
        int(f[1:-8])
        for f in os.listdir(state_path)
        if f.startswith("v") and f.endswith(".parquet")
    )


def _read_state(state_path: str, version: int) -> tuple[dict[int, int], int]:
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(state_path, f"v{version:020d}.parquet"))
    reg: dict[int, int] = {}
    n_seen = 0
    for j, rho in zip(tbl.column("j").to_pylist(), tbl.column("rho").to_pylist()):
        if j < 0:
            n_seen = int(rho)
        else:
            reg[int(j)] = int(rho)
    return reg, n_seen


def _write_state(
    state_path: str, version: int, reg: dict[int, int], n_seen: int
) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(state_path, exist_ok=True)
    keys = sorted(reg)
    tbl = pa.table(
        {"j": keys + [-1], "rho": [reg[k] for k in keys] + [n_seen]}
    )
    tmp = os.path.join(state_path, f".v{version:020d}.parquet.tmp")
    pq.write_table(tbl, tmp)
    os.replace(tmp, os.path.join(state_path, f"v{version:020d}.parquet"))
    for old in _state_versions(state_path)[:-2]:
        os.remove(os.path.join(state_path, f"v{old:020d}.parquet"))


def hll_estimate_from_registers(reg: dict[int, int], p: int) -> tuple[float, int]:
    """Driver-side estimate twin of :func:`ops.sketches.hll_cardinality`
    — same exact-integer register sum, same one-division raw estimate,
    same linear-counting branch, same 4-dp HALF_UP rounding (Spark's
    ``round`` semantics on a double: shortest decimal repr, then half
    up). Returns (est_r, reg_zeros)."""
    m = 1 << p
    num = 0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << 53)
    s_scaled = 0
    reg_zeros = 0
    for j in range(m):
        rho = reg.get(j, 0)
        if rho == 0:
            reg_zeros += 1
        s_scaled += 1 << (53 - rho)
    raw = num / float(s_scaled)
    if raw <= 2.5 * m and reg_zeros > 0:
        est = float(m) * math.log(float(m) / float(reg_zeros))
    else:
        est = raw
    est_r = float(
        Decimal(repr(est)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    )
    return est_r, reg_zeros


def hll_stream_writer(
    spark: SparkSession,
    stream_df: DataFrame,
    value_col: str,
    state_path: str,
    metrics_path: str,
    checkpoint_dir: str,
    p: int = 9,
):
    """Return a ready-to-start ``DataStreamWriter``. Each micro-batch
    appends ONE metrics row: (batch_id, est_r, reg_zeros, n_seen) — the
    stream-so-far distinct-count estimate and the exact count of items
    seen. Caller picks the trigger and calls ``.start()``."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16] (m = 2^p registers)")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        versions = _state_versions(state_path)
        if bid in versions:
            reg, n_seen = _read_state(state_path, bid)
        else:
            base = max((v for v in versions if v < bid), default=None)
            reg, n_seen = (
                _read_state(state_path, base) if base is not None else ({}, 0)
            )
            batch_df = batch_df.filter(batch_df[value_col].isNotNull())
            n_batch = batch_df.count()
            for r in hll_registers(batch_df, value_col, p).collect():
                j, rho = int(r["j"]), int(r["rho"])
                if rho > reg.get(j, 0):
                    reg[j] = rho
            n_seen += int(n_batch)
            _write_state(state_path, bid, reg, n_seen)
        est_r, reg_zeros = hll_estimate_from_registers(reg, p)
        out = spark.createDataFrame(
            [(bid, est_r, reg_zeros, int(n_seen))],
            "batch_id long, est_r double, reg_zeros long, n_seen long",
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
