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


def test_filtered_alias_injects_on_every_surface(spark, built_index, tmp_path):
    """Filtered alias (read-side rewrite): every where=-taking surface
    gets the alias filter; alias results ≡ explicit where= on the
    concrete index — distributed AND local serving paths."""
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.snapshot import (
        open_alias,
        set_alias,
    )

    idx, path = built_index
    reg = str(tmp_path / "reg")
    set_alias(reg, "users", path, where=[("role", "=", "user")])
    fidx = open_alias(spark, reg, "users")

    q = "w00000 w00003"
    got = [(r["doc_id"], r["score"]) for r in fidx.search(q, 10).collect()]
    want = [
        (r["doc_id"], r["score"])
        for r in idx.search(q, 10, where="role = 'user'").collect()
    ]
    assert got == want and got
    # user where= composes with (narrows) the alias filter
    both = [
        (r["doc_id"], r["score"])
        for r in fidx.search(q, 10, where="turn_idx >= 2").collect()
    ]
    assert both == [
        (r["doc_id"], r["score"])
        for r in idx.search(q, 10, where="role = 'user' AND turn_idx >= 2").collect()
    ]
    # zero-Spark-job serving twin: tuple filters prepended
    assert fidx.search_local(q, 10) == idx.search_local(
        q, 10, where=[("role", "=", "user")]
    )
    # aggregations are filtered too
    assert fidx.facets(q, by="role").collect() == idx.facets(
        q, by="role", where="role = 'user'"
    ).collect()


def test_filtered_alias_refuses_unfilterable_surfaces(spark, built_index, tmp_path):
    """Query surfaces with no filter hook must raise — never silently
    return unfiltered hits (the ES-1.x partial-application trap). The
    get/fetch family passes through because ES itself does not apply
    alias filters there."""
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.snapshot import (
        open_alias,
        set_alias,
    )

    idx, path = built_index
    reg = str(tmp_path / "reg")
    set_alias(reg, "users", path, where=[("role", "=", "user")])
    fidx = open_alias(spark, reg, "users")
    with pytest.raises(NotImplementedError):
        fidx.search_many(["w00000"], 5)
    # ES get API ignores alias filters — passes through by design
    assert fidx.get_docs_local([0]) == idx.get_docs_local([0])
    # non-filter ops and metadata still work
    assert fidx.meta["n_docs"] == idx.meta["n_docs"]
    assert (
        fidx.analyze("The Running foxes").collect()
        == idx.analyze("The Running foxes").collect()
    )


def test_filtered_alias_registry_roundtrip_and_validation(spark, built_index, tmp_path):
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.snapshot import (
        open_alias,
        resolve_alias,
        set_alias,
    )
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import (
        FilteredIndex,
        _filters_to_sql,
    )

    idx, path = built_index
    reg = str(tmp_path / "reg")
    set_alias(reg, "f", path, where=[("role", "in", ("user", "tool")), ("turn_idx", ">=", 1)])
    assert resolve_alias(reg, "f") == os.path.abspath(path)
    assert isinstance(open_alias(spark, reg, "f"), FilteredIndex)
    # plain alias still resolves to a bare Index
    set_alias(reg, "p", path)
    assert not isinstance(open_alias(spark, reg, "p"), FilteredIndex)
    # SQL compilation: quoting, null ops, op validation
    assert _filters_to_sql([("lang", "=", "it's")]) == "lang = 'it''s'"
    assert _filters_to_sql([("tool", "isnull", None)]) == "tool IS NULL"
    with pytest.raises(ValueError):
        _filters_to_sql([("lang", "~", "en")])
    with pytest.raises(ValueError):
        set_alias(reg, "bad", path, where=[("lang; drop", "=", "en")])
