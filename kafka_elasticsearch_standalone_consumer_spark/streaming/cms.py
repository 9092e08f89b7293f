"""Streaming Count-Min frequency monitor — additive CMS registers over
the WHOLE stream so far, updated per micro-batch, with point-frequency
estimates for a fixed probe set appended to a metrics sink.

The batch :func:`ops.sketches.cms_estimate` can attach exact counts as a
verification twin; a stream cannot re-scan its history, so the streaming
form keeps the CMS contract instead: for every probe, ``true ≤ est``
DETERMINISTICALLY (every occurrence lands in all d of its buckets — the
one-sided guarantee needs no probabilistic argument), with the classic
ε·N overestimate expectation governed by the width.

Execution per micro-batch: the distributed register build
(:func:`ops.sketches.cms_registers` — ONE explode+aggregate pass whose
exchange is bounded at d·w rows per partition) runs over the BATCH; only
the ≤ d·w register rows collect to the driver, where they ADD into the
persistent state (registers are additive — the same merge the batch op
pytest-asserts across splits). State is a driver-side pyarrow read/write
like every control-plane table in this repo — never a Spark job for one
small table.

Effectively-once: state is VERSIONED by batch_id (``v{batch_id}.parquet``
under ``state_path``). A replayed micro-batch finds its own version
already present, skips the merge, and just rewrites its metrics partition
(dynamic partition overwrite — streaming/alerts.py's trick), so restarts
never double-count. Only the latest two versions are kept.

Reference parity: the reference daemon exposed per-batch counters over
JMX (ref ConsumerJob statistics); this is the content-level analogue — a
live "how often are these terms arriving" signal in d·w integers of
state, the sibling of the Misra–Gries top-k monitor (streaming/hitters).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import cms_registers


def _bucket(value: str, j: int, w: int) -> int:
    """Driver-side twin of ops.sketches._cms_bucket: md5 of
    ``{j}:{value}``, first 8 hex digits as an integer, mod w — hashlib
    and the engines' md5 agree byte-for-byte."""
    h = hashlib.md5(f"{j}:{value}".encode()).hexdigest()
    return int(h[:8], 16) % w


def _state_versions(state_path: str) -> list[int]:
    if not os.path.isdir(state_path):
        return []
    return sorted(
        int(f[1:-8])
        for f in os.listdir(state_path)
        if f.startswith("v") and f.endswith(".parquet")
    )


def _read_state(state_path: str, version: int) -> tuple[dict[tuple[int, int], int], int]:
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(state_path, f"v{version:020d}.parquet"))
    reg: dict[tuple[int, int], int] = {}
    n_seen = 0
    for j, b, c in zip(
        tbl.column("j").to_pylist(),
        tbl.column("b").to_pylist(),
        tbl.column("c").to_pylist(),
    ):
        if j < 0:
            n_seen = int(c)
        else:
            reg[(int(j), int(b))] = int(c)
    return reg, n_seen


def _write_state(
    state_path: str, version: int, reg: dict[tuple[int, int], int], n_seen: int
) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(state_path, exist_ok=True)
    keys = sorted(reg)
    tbl = pa.table(
        {
            "j": [k[0] for k in keys] + [-1],
            "b": [k[1] for k in keys] + [-1],
            "c": [reg[k] for k in keys] + [n_seen],
        }
    )
    tmp = os.path.join(state_path, f".v{version:020d}.parquet.tmp")
    pq.write_table(tbl, tmp)
    os.replace(tmp, os.path.join(state_path, f"v{version:020d}.parquet"))
    for old in _state_versions(state_path)[:-2]:
        os.remove(os.path.join(state_path, f"v{old:020d}.parquet"))


def cms_stream_writer(
    spark: SparkSession,
    stream_df: DataFrame,
    value_col: str,
    probes: list[str],
    state_path: str,
    metrics_path: str,
    checkpoint_dir: str,
    d: int = 4,
    w: int = 256,
):
    """Return a ready-to-start ``DataStreamWriter``. Each micro-batch
    appends one metrics row per probe: (batch_id, value, est, n_seen) —
    the stream-so-far frequency estimate (``est ≥ true`` always) and the
    total items seen. Caller picks the trigger and calls ``.start()``."""
    probe_list = sorted(set(str(p) for p in probes))
    if not probe_list:
        raise ValueError("cms_stream_writer needs at least one probe value")
    probe_buckets = {
        p: [(j, _bucket(p, j, w)) for j in range(d)] for p in probe_list
    }

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
            rows = cms_registers(batch_df, value_col, d, w).collect()
            for r in rows:
                key = (int(r["j"]), int(r["b"]))
                reg[key] = reg.get(key, 0) + int(r["c"])
            # row j carries every batch item once -> row 0's total = batch size
            n_seen += sum(int(r["c"]) for r in rows if int(r["j"]) == 0)
            _write_state(state_path, bid, reg, n_seen)
        out_rows = [
            (
                bid,
                p,
                min(reg.get(jb, 0) for jb in probe_buckets[p]),
                int(n_seen),
            )
            for p in probe_list
        ]
        out = spark.createDataFrame(
            out_rows, "batch_id long, value string, est long, n_seen long"
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
