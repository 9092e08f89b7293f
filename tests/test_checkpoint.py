"""Resumability (SURVEY §5.2.5): crash after step k → re-run skips
completed steps and produces identical final tables."""

import pytest
from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.corpus import generate_transcripts
from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index


def _topk(idx, q, k=10):
    return [(r["doc_id"], round(r["score"], 9)) for r in idx.search(q, k).collect()]


def test_resume_after_simulated_failure(spark, transcripts, tmp_path):
    clean_path = str(tmp_path / "clean")
    crash_path = str(tmp_path / "crash")
    kw = dict(docs_per_shard=256, n_buckets=8)

    build_index(spark, transcripts, clean_path, **kw)

    with pytest.raises(RuntimeError, match="simulated failure"):
        build_index(spark, transcripts, crash_path, fail_after="doc_stats", **kw)

    r2 = build_index(spark, transcripts, crash_path, **kw)
    assert set(r2.skipped) == {"docs", "tokens", "doc_stats"}
    assert r2.ran == ["term_stats", "meta", "doc_map", "postings"]

    a, b = Index(spark, clean_path), Index(spark, crash_path)
    assert a.meta == b.meta
    for q in ("w00000", "w00002 w00050", "w01104 w00033 w00398"):
        assert _topk(a, q) == _topk(b, q)
    # identical postings tables
    cols = ["term", "shard", "n_docs"]
    pa = sorted(map(tuple, a.postings.select(*cols).collect()))
    pb = sorted(map(tuple, b.postings.select(*cols).collect()))
    assert pa == pb


def test_checkpoint_metrics_recorded(spark, built_index):
    idx, path = built_index
    ck = idx.wh.read(spark, "sys_checkpoint")
    assert ck.filter(ck.status == "ok").count() >= 8  # 7 steps + ALL
    m = idx.wh.read(spark, "sys_metrics")
    phases = {r["phase"] for r in m.select("phase").distinct().collect()}
    assert {"docs", "tokens", "postings"} <= phases
    assert m.filter((m.phase == "docs") & (m.key == "rows")).count() == 1


def test_dry_run_writes_nothing(spark, tmp_path):
    t = generate_transcripts(spark, n_convs=20, seed=1, partitions=2)
    p = str(tmp_path / "dry")
    r = build_index(spark, t, p, dry_run=True)
    assert r.dry_run_rows > 0
    import os

    assert os.listdir(p) == []


def test_step_retry_bounded(spark, tmp_path):
    """Reference parity: bounded retry loops (IndexerJob reinit ×N) — a
    flaky step succeeds on retry; exceeding the budget fails the build."""
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.checkpoint import (
        CheckpointLog,
        StepRunner,
    )
    from kafka_elasticsearch_standalone_consumer_spark.tables import Warehouse

    wh = Warehouse(str(tmp_path / "retry"))
    runner = StepRunner(CheckpointLog(spark, wh), max_retries=2, retry_sleep_s=0.01)
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")
        return 7

    runner.step("flaky", flaky)
    assert attempts["n"] == 3 and runner.retried["flaky"] == 2

    runner2 = StepRunner(CheckpointLog(spark, wh), max_retries=1, retry_sleep_s=0.01)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="always"):
        runner2.step("doomed", lambda: (_ for _ in ()).throw(RuntimeError("always")))
    statuses = {r["step_id"]: r["status"] for r in wh.read_rows("sys_checkpoint")}
    assert statuses["doomed"] == "failed" and statuses["flaky"] == "ok"
