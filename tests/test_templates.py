"""Index templates (ES 1.x _template): registry CRUD, ES precedence
(matching templates in ascending order, explicit settings on top), and
end-to-end create_index picking the template up automatically."""

from __future__ import annotations

import pytest

from kafka_elasticsearch_standalone_consumer_spark.pipeline.templates import (
    create_index,
    delete_template,
    get_templates,
    put_template,
    resolve_settings,
)
from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index


def test_registry_crud_and_validation(tmp_path):
    reg = str(tmp_path / "templates.json")
    put_template(reg, "a", "logs-*", {"analyzer": "stop"}, order=0)
    put_template(reg, "a", "logs-*", {"analyzer": "porter"})  # PUT replaces
    assert get_templates(reg)["a"]["settings"] == {"analyzer": "porter"}
    delete_template(reg, "a")
    assert get_templates(reg) == {}
    with pytest.raises(KeyError):
        delete_template(reg, "a")
    with pytest.raises(ValueError):
        put_template(reg, "bad", "x-*", {"tokenizer": "fused"})  # not templatable


def test_resolve_precedence(tmp_path):
    reg = str(tmp_path / "templates.json")
    put_template(reg, "base", "docs-*", {"analyzer": "stop", "n_buckets": 8}, order=0)
    put_template(reg, "override", "docs-2026*", {"analyzer": "porter"}, order=5)
    put_template(reg, "decoy", "logs-*", {"analyzer": "keyword"}, order=9)
    # higher order overwrites per-key; non-matching patterns never apply
    assert resolve_settings(reg, "docs-2026.01") == {
        "analyzer": "porter", "n_buckets": 8,
    }
    assert resolve_settings(reg, "docs-old") == {"analyzer": "stop", "n_buckets": 8}
    assert resolve_settings(reg, "metrics-1") == {}
    # explicit settings beat every template (ES precedence)
    assert resolve_settings(reg, "docs-2026.01", analyzer="standard") == {
        "analyzer": "standard", "n_buckets": 8,
    }
    # explicit None means "not given" — template value survives
    assert resolve_settings(reg, "docs-2026.01", analyzer=None)["analyzer"] == "porter"


def test_create_index_applies_template(spark, transcripts, tmp_path):
    reg = str(tmp_path / "templates.json")
    put_template(
        reg, "stopdocs", "docs-*",
        {"analyzer": "stop", "docs_per_shard": 256, "n_buckets": 8},
    )
    path = create_index(spark, transcripts, reg, "docs-2026", str(tmp_path))
    idx = Index(spark, path)
    assert idx.meta["analyzer"] == "stop"
    assert int(idx.meta["docs_per_shard"]) == 256
    # stop analysis is live: a pure-stopword query matches nothing
    assert idx.search("the and of", 5).count() == 0
    # explicit override beats the template
    path2 = create_index(
        spark, transcripts, reg, "docs-explicit", str(tmp_path), analyzer="standard"
    )
    assert Index(spark, path2).meta["analyzer"] == "standard"


def test_mappings_payload_validation_and_resolution(tmp_path):
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.templates import (
        resolve_aliases,
    )

    reg = str(tmp_path / "templates.json")
    # mappings compile onto build knobs; template-local settings win
    put_template(
        reg, "m", "docs-*",
        settings={"positions": True},
        mappings={"text": {"analyzer": "porter", "positions": False}},
    )
    got = resolve_settings(reg, "docs-x")
    assert got["analyzer"] == "porter" and got["positions"] is True
    # unknown field / option fail loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        put_template(reg, "bad", "x-*", mappings={"title": {"analyzer": "stop"}})
    with _pytest.raises(ValueError):
        put_template(reg, "bad", "x-*", mappings={"text": {"norms": False}})
    with _pytest.raises(ValueError):
        put_template(reg, "bad", "x-*", aliases={"a": [("lang", "~", "en")]})
    # alias merge: higher order overwrites per alias name
    put_template(reg, "a1", "docs-*", aliases={"prod": None}, order=0)
    put_template(
        reg, "a2", "docs-*", aliases={"prod": [["lang", "=", "en"]]}, order=1
    )
    assert resolve_aliases(reg, "docs-x")["prod"] == [("lang", "=", "en")]
    assert resolve_aliases(reg, "other") == {}


def test_create_index_registers_template_aliases(spark, transcripts, tmp_path):
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.snapshot import open_alias
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import FilteredIndex

    reg = str(tmp_path / "templates.json")
    put_template(
        reg, "t", "docs-*",
        settings={"docs_per_shard": 256, "n_buckets": 8},
        aliases={"users_only": [["role", "=", "user"]], "everything": None},
    )
    path = create_index(spark, transcripts, reg, "docs-2026", str(tmp_path))
    areg = str(tmp_path / "aliases_reg")
    fidx = open_alias(spark, areg, "users_only")
    assert isinstance(fidx, FilteredIndex)
    plain = open_alias(spark, areg, "everything")
    assert not isinstance(plain, FilteredIndex)
    q = "w00000 w00003"
    got = [(r["doc_id"], r["score"]) for r in fidx.search(q, 10).collect()]
    want = [
        (r["doc_id"], r["score"])
        for r in Index(spark, path).search(q, 10, where="role = 'user'").collect()
    ]
    assert got == want and got
