"""Streaming trending-terms monitor — per-tumbling-window Misra–Gries
top-k over event time, the composition of the windowed rollup
(streaming/rollup.py) and the whole-stream frequent-terms monitor
(streaming/hitters.py): "what dominated THIS hour", not "what dominates
the stream so far", with bounded state per window.

Execution per micro-batch (foreachBatch):

* each row is assigned its tumbling window by integer floor of the
  event-time microseconds (deterministic, no session-timezone seam);
* a mapInPandas kernel streams every partition through ONE pass keeping
  a ``capacity``-bounded Misra–Gries counter dict PER WINDOW it sees
  (state O(windows_in_partition × capacity), independent of partition
  row count or vocabulary), emitting per-(window, value) survivor
  counts plus a per-window reduction-delta marker — the same
  mergeable-summaries algebra as the whole-stream monitor;
* survivors collect to the driver (≤ partitions × windows × capacity
  rows) and merge into the persistent per-window state, reducing back
  to ``capacity`` counters with the delta folding into that window's
  error bound (est ≤ true ≤ est + bound, the Misra–Gries contract);
* the monitor keeps its own WATERMARK: the max event time seen so far
  minus ``delay``. Windows whose end ≤ watermark CLOSE: their final
  top-``k`` rows (window_start, rank, value, est, bound) append to the
  metrics sink and their state is dropped — append-mode finality, like
  the rollup. Rows arriving for an already-closed window are DROPPED
  and counted (``late`` in the state meta) — the explicit late-data
  policy: lateness is judged against the watermark from the PREVIOUS
  batch (Spark's own semantics), so a batch's rows always count into
  windows that same batch is about to close.

Effectively-once: state is VERSIONED by batch_id (streaming/cms.py's
convention — a replayed batch finds its version, skips the merge, and
just rewrites its batch_id metrics partition via dynamic partition
overwrite), so restarts never double-count and never re-close a window.

Reference parity: the reference daemon's JMX counters are per-batch
totals (ref IndexerJobStatus.java:5-48); this is the event-time
analogue a content pipeline actually watches — bursts localized in
time, with bounded memory however wide the vocabulary runs.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.ops.sketches import _mg_reduce

_META = "__mg_meta__"  # per-window marker row: c carries the delta sum


def _windowed_sketch(capacity: int):
    """mapInPandas kernel: one pass per partition, a capacity-bounded
    Misra–Gries dict per window seen. Emits (ws, value, c) survivors
    plus one (ws, _META, delta_sum) marker per window."""

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[int, dict[str, int]] = {}
        deltas: dict[int, int] = {}
        for pdf in batches:
            for ws, v in zip(pdf["ws"].to_numpy(), pdf["value"].to_numpy()):
                ws = int(ws)
                counters = state.setdefault(ws, {})
                counters[v] = counters.get(v, 0) + 1
                if len(counters) > capacity:
                    deltas[ws] = deltas.get(ws, 0) + _mg_reduce(counters, capacity)
        out_ws, out_v, out_c = [], [], []
        for ws, counters in state.items():
            for v, c in counters.items():
                out_ws.append(ws)
                out_v.append(v)
                out_c.append(c)
            out_ws.append(ws)
            out_v.append(_META)
            out_c.append(deltas.get(ws, 0))
        yield pd.DataFrame({"ws": out_ws, "value": out_v, "c": out_c})

    return sketch


def _state_versions(state_path: str) -> list[int]:
    if not os.path.isdir(state_path):
        return []
    return sorted(
        int(f[1:-8])
        for f in os.listdir(state_path)
        if f.startswith("v") and f.endswith(".parquet")
    )


def _read_state(state_path: str, version: int):
    import json

    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(state_path, f"v{version:020d}.parquet"))
    wins: dict[int, dict] = {}
    wm_us = -(1 << 62)
    late = 0
    closed: list[tuple] = []
    for ws, v, c in zip(
        tbl.column("ws").to_pylist(),
        tbl.column("value").to_pylist(),
        tbl.column("c").to_pylist(),
    ):
        if ws == -1:  # global meta: watermark / late counter
            if v == "wm":
                wm_us = int(c)
            elif v == "late":
                late = int(c)
            continue
        if ws == -2:  # closure ledger row for THIS version's batch
            w_s, rank, val, bound = json.loads(v)
            closed.append((int(w_s), int(rank), val, int(c), int(bound)))
            continue
        w = wins.setdefault(int(ws), {"counters": {}, "bound": 0})
        if v == _META:
            w["bound"] = int(c)
        else:
            w["counters"][v] = int(c)
    return wins, wm_us, late, closed


def _write_state(
    state_path: str, version: int, wins, wm_us: int, late: int, closed: list[tuple]
):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    ws_l, v_l, c_l = [], [], []
    for ws in sorted(wins):
        w = wins[ws]
        for v in sorted(w["counters"]):
            ws_l.append(ws)
            v_l.append(v)
            c_l.append(w["counters"][v])
        ws_l.append(ws)
        v_l.append(_META)
        c_l.append(w["bound"])
    # closure ledger: what THIS batch finalized (replay re-emits from it)
    for w_s, rank, val, est, bound in closed:
        ws_l.append(-2)
        v_l.append(json.dumps([w_s, rank, val, bound]))
        c_l.append(est)
    ws_l += [-1, -1]
    v_l += ["wm", "late"]
    c_l += [wm_us, late]
    os.makedirs(state_path, exist_ok=True)
    tmp = os.path.join(state_path, f".v{version:020d}.parquet.tmp")
    pq.write_table(pa.table({"ws": ws_l, "value": v_l, "c": c_l}), tmp)
    os.replace(tmp, os.path.join(state_path, f"v{version:020d}.parquet"))
    for old in _state_versions(state_path)[:-2]:
        os.remove(os.path.join(state_path, f"v{old:020d}.parquet"))


def trending_stream_writer(
    spark: SparkSession,
    stream_df: DataFrame,
    ts_col: str,
    value_col: str,
    state_path: str,
    metrics_path: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    delay: str = "10 minutes",
    k: int = 10,
    capacity: int = 64,
):
    """Return a ready-to-start ``DataStreamWriter``. Each micro-batch
    appends the FINAL top-``k`` rows of every window the advancing
    watermark closed: (batch_id, window_start, rank, value, est, bound)
    — est ≤ true ≤ est + bound per value, rank by est desc then value
    asc. Window/delay are SQL interval strings; window start is the
    integer floor of event-time micros (timezone-free)."""
    epoch = "TIMESTAMP '1970-01-01 00:00:00+00:00'"
    win_us = int(
        spark.sql(
            f"SELECT unix_micros({epoch} + INTERVAL {window})"
        ).collect()[0][0]
    )
    delay_us = int(
        spark.sql(
            f"SELECT unix_micros({epoch} + INTERVAL {delay})"
        ).collect()[0][0]
    )
    if win_us <= 0:
        raise ValueError("window must be a positive interval")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        versions = _state_versions(state_path)
        if bid in versions:
            # replay: state (incl. closures) already advanced for this
            # batch — re-emit this batch's metrics from its closure ledger
            _, _, _, closed = _read_state(state_path, bid)
        else:
            base = max((v for v in versions if v < bid), default=None)
            wins, wm_us, late, _ = (
                _read_state(state_path, base)
                if base is not None
                else ({}, -(1 << 62), 0, [])
            )
            rows = (
                batch_df.select(
                    F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
                    F.col(value_col).cast("string").alias("value"),
                )
                .filter(F.col("value").isNotNull() & F.col("us").isNotNull())
                # floor-aligned window start on longs: us − (us mod⁺ win).
                # `div` truncates toward zero, which would misalign pre-1970
                # event times (negative micros) with the watermark-close
                # arithmetic; pmod is nonnegative, so this is a true floor.
                .select(
                    (F.col("us") - F.pmod(F.col("us"), F.lit(win_us))).alias("ws"),
                    "value",
                )
            )
            # late rule (Spark watermark semantics): a row is late iff its
            # window already CLOSED — i.e. its end <= the watermark from
            # the PREVIOUS batch; this batch's own rows always count into
            # windows this batch is about to close
            late_now = rows.filter((F.col("ws") + win_us) <= wm_us)
            live = rows.filter((F.col("ws") + win_us) > wm_us)
            late += int(late_now.count())
            max_us = batch_df.select(
                F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("m")
            ).collect()[0][0]
            if max_us is not None:
                wm_us = max(wm_us, int(max_us) - delay_us)
            sk = live.mapInPandas(
                _windowed_sketch(capacity), schema="ws long, value string, c long"
            )
            for r in sk.collect():
                ws, v, c = int(r["ws"]), r["value"], int(r["c"])
                w = wins.setdefault(ws, {"counters": {}, "bound": 0})
                if v == _META:
                    w["bound"] += c
                else:
                    counters = w["counters"]
                    counters[v] = counters.get(v, 0) + c
                    if len(counters) > capacity:
                        w["bound"] += _mg_reduce(counters, capacity)
            closed = []
            for ws in sorted(ws for ws in wins if ws + win_us <= wm_us):
                w = wins.pop(ws)
                top = sorted(w["counters"].items(), key=lambda t: (-t[1], t[0]))[:k]
                for rank, (v, c) in enumerate(top, start=1):
                    closed.append((ws, rank, v, c, w["bound"]))
            _write_state(state_path, bid, wins, wm_us, late, closed)
        out = spark.createDataFrame(
            [(bid, w_s, rank, v, est, bound) for w_s, rank, v, est, bound in closed],
            "batch_id long, window_start long, rank int, value string, "
            "est long, bound long",
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
