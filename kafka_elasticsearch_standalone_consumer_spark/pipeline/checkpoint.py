"""Checkpointed, resumable lineage — the reference's offset-commit analogue.

The reference checkpoints by committing the Kafka offset back to Kafka
AFTER a successful Elasticsearch post (at-least-once: post at
``jobs/IndexerJob.java:377``, commit at ``:390-415``; offset resolution on
restart at ``:171-230``). Here the cursor becomes a ``_checkpoint`` table:
one row per completed build step, appended only after the step's output
table is fully written (same ordering ⇒ same at-least-once semantics), and
step outputs are idempotent overwrites (re-running a half-finished step is
safe, mirroring the reference's re-process-on-crash).

``_metrics`` mirrors the reference's per-partition JobStatus/JMX surface
(``IndexerJobStatus.java:5-48``, ``jmx/KafkaEsIndexerStatus.java:25-67``)
as plain rows: (run_id, phase, key, value).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import SparkSession

from kafka_elasticsearch_standalone_consumer_spark.tables import Warehouse

CHECKPOINT_TABLE = "sys_checkpoint"
METRICS_TABLE = "sys_metrics"

CHECKPOINT_SCHEMA = "run_id string, step_id string, status string, rows long, wall_ms long, ts double"
METRICS_SCHEMA = "run_id string, phase string, key string, value double"


def _arrow_schemas():
    import pyarrow as pa

    ckpt = pa.schema(
        [
            ("run_id", pa.string()),
            ("step_id", pa.string()),
            ("status", pa.string()),
            ("rows", pa.int64()),
            ("wall_ms", pa.int64()),
            ("ts", pa.float64()),
        ]
    )
    metrics = pa.schema(
        [
            ("run_id", pa.string()),
            ("phase", pa.string()),
            ("key", pa.string()),
            ("value", pa.float64()),
        ]
    )
    return ckpt, metrics


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


class CheckpointLog:
    """Control-plane rows are written driver-side as plain parquet files
    (same layout Spark reads) — a Spark job per one-row commit would cost
    ~0.5 s of scheduling each, 21× per build (see Warehouse.append_rows)."""

    def __init__(self, spark: SparkSession, warehouse: Warehouse, run_id: str | None = None):
        self.spark = spark
        self.warehouse = warehouse
        self.run_id = run_id or new_run_id()
        self._ckpt_schema, self._metrics_schema = _arrow_schemas()

    def completed_steps(self) -> set[str]:
        """Steps marked ok by ANY previous run — outputs are deterministic
        tables, so a completed step never re-runs (reference restart logic,
        ``IndexerJob.java:171-230``, simplified to step granularity)."""
        if not self.warehouse.exists(CHECKPOINT_TABLE):
            return set()
        return {
            r["step_id"]
            for r in self.warehouse.read_rows(CHECKPOINT_TABLE)
            if r["status"] == "ok"
        }

    def mark(self, step_id: str, status: str, rows: int, wall_ms: int) -> None:
        row = [(self.run_id, step_id, status, int(rows), int(wall_ms), time.time())]
        self.warehouse.append_rows(CHECKPOINT_TABLE, row, self._ckpt_schema)

    def metric(self, phase: str, key: str, value: float) -> None:
        row = [(self.run_id, phase, key, float(value))]
        self.warehouse.append_rows(METRICS_TABLE, row, self._metrics_schema)


class StepRunner:
    """Run named steps once; skip steps a previous run completed.

    ``max_retries`` mirrors the reference's bounded reconnect/retry loops
    (``jobs/IndexerJob.java:104-136`` Kafka reinit ×N, ``:428-455`` ES
    reconnect ×N, sleep between attempts): a step that throws is retried
    up to N times — safe because every step's output is an idempotent
    overwrite — then marked failed and re-raised (the reference likewise
    gives up and surfaces the failure after numberOfReinitAttempts).
    """

    def __init__(
        self,
        log: CheckpointLog,
        fail_after: str | None = None,
        max_retries: int = 0,
        retry_sleep_s: float = 1.0,
    ):
        self.log = log
        self.done = log.completed_steps()
        self.fail_after = fail_after  # test hook: simulate a crash
        self.max_retries = max_retries
        self.retry_sleep_s = retry_sleep_s
        self.skipped: list[str] = []
        self.ran: list[str] = []
        self.retried: dict[str, int] = {}

    def step(self, step_id: str, fn) -> None:
        """fn() fully writes the step's output table(s), returns row count."""
        if step_id in self.done:
            self.skipped.append(step_id)
            return
        t0 = time.monotonic()
        attempt = 0
        while True:
            try:
                rows = fn()
                break
            except Exception:
                attempt += 1
                if attempt > self.max_retries:
                    self.log.mark(step_id, "failed", 0, int((time.monotonic() - t0) * 1000))
                    raise
                self.retried[step_id] = attempt
                self.log.metric(step_id, "retries", float(attempt))
                time.sleep(self.retry_sleep_s)
        wall_ms = int((time.monotonic() - t0) * 1000)
        self.log.mark(step_id, "ok", rows or 0, wall_ms)
        self.log.metric(step_id, "rows", float(rows or 0))
        self.log.metric(step_id, "wall_ms", float(wall_ms))
        self.ran.append(step_id)
        if self.fail_after == step_id:
            raise RuntimeError(f"simulated failure after step {step_id}")
