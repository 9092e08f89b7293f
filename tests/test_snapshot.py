"""Snapshot/restore + aliases: point-in-time isolation from later
mutations of the source, manifest verification, atomic alias swap."""

from __future__ import annotations

import json
import os

import pytest


def _top(idx, q="w00000 w00003", k=5):
    return [(r["doc_id"], round(r["score"], 9)) for r in idx.search(q, k).collect()]


def test_snapshot_restore_point_in_time(spark, built_index, tmp_path):
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.incremental import delete_docs
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.snapshot import (
        create_snapshot,
        list_snapshots,
        restore_snapshot,
    )
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    _idx, path = built_index
    # snapshot BEFORE mutation (built_index is session-scoped: work on a copy)
    import shutil

    src = str(tmp_path / "src")
    shutil.copytree(path, src)
    before = _top(Index(spark, src))
    m = create_snapshot(src, str(tmp_path / "repo"), "s1")
    assert m["n_files"] > 0 and m["total_bytes"] > 0
    assert [s["name"] for s in list_snapshots(str(tmp_path / "repo"))] == ["s1"]
    # duplicate names refused
    with pytest.raises(ValueError, match="already exists"):
        create_snapshot(src, str(tmp_path / "repo"), "s1")
    # mutate the source: tombstone the current top hit
    delete_docs(spark, src, f"doc_id = {before[0][0]}")
    mutated = _top(Index(spark, src))
    assert mutated[0][0] != before[0][0]
    # restore is the pre-mutation index
    restore_snapshot(str(tmp_path / "repo"), "s1", str(tmp_path / "restored"))
    assert _top(Index(spark, str(tmp_path / "restored"))) == before
    # a corrupted snapshot fails the manifest check loudly
    data = str(tmp_path / "repo" / "s1" / "data")
    victim = None
    for dirpath, _d, files in os.walk(data):
        for f in files:
            if f.endswith(".parquet"):
                victim = os.path.join(dirpath, f)
                break
        if victim:
            break
    os.remove(victim)
    with pytest.raises(ValueError, match="missing"):
        restore_snapshot(str(tmp_path / "repo"), "s1", str(tmp_path / "restored2"))


def test_alias_swap_and_resolution(spark, built_index, tmp_path):
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.snapshot import (
        drop_alias,
        open_alias,
        resolve_alias,
        set_alias,
    )

    _idx, path = built_index
    reg = str(tmp_path / "reg")
    set_alias(reg, "prod", path)
    assert resolve_alias(reg, "prod") == os.path.abspath(path)
    idx = open_alias(spark, reg, "prod")
    assert _top(idx)
    # atomic re-point
    set_alias(reg, "prod", path)
    with open(os.path.join(reg, "aliases.json")) as fh:
        assert json.load(fh)["prod"] == os.path.abspath(path)
    drop_alias(reg, "prod")
    with pytest.raises(KeyError):
        resolve_alias(reg, "prod")
