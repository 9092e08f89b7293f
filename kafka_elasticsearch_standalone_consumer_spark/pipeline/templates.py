"""Index templates — ES 1.x ``_template`` API: named setting bundles
applied automatically when a NEW index's name matches the template's
pattern (``te*`` glob semantics, like ES), so operators never hand-set
analyzers or shard counts per daily index. The reference's users lived by
this around the index its bulk sink fed (time-based indices created on
first write pick up mappings/settings from a template — ES 1.x
``indices.put_template``; the reference delegates creation to the same
server boundary, ref: ``MessageHandler.java:135-139``).

Precedence is ES's exactly: all templates whose pattern matches the new
index name apply in ascending ``order`` (higher order overwrites
per-key), and settings passed explicitly at creation time override every
template. The registry is a tiny JSON control-plane file with the same
write-temp-then-``os.replace`` atomicity as the alias registry
(snapshot.py) — template resolution is driver-side dictionary work,
never a Spark job, at any corpus scale.

A template carries the full ES 1.x payload shape:

* ``settings`` — the engine's index-creation knobs (ES analysis + shard
  settings): ``analyzer``, ``positions``, ``docs_per_shard``,
  ``n_buckets``.
* ``mappings`` — per-field options for the indexed text field
  (ES put-mapping under a template). The engine indexes one analyzed
  text field, so the supported shape is ``{"text": {"analyzer": ...,
  "positions": ...}}``; field options compile onto the same build knobs
  (template-local ``settings`` win over its own mappings, matching ES
  where explicit settings beat mapping defaults). Unknown fields or
  options fail loudly rather than templating something the build would
  silently drop.
* ``aliases`` — aliases-on-create (ES templates carry an ``aliases``
  body): ``{alias_name: None | [(col, op, value), ...]}``; a filter
  list makes it a FILTERED alias (see snapshot.set_alias). When a new
  index picks the template up, ``create_index`` registers every
  resolved alias pointing at the fresh warehouse.
"""

from __future__ import annotations

import fnmatch
import json
import os

TEMPLATE_FILE = "templates.json"

#: build_index kwargs a template may set (ES: analysis + shard settings)
TEMPLATABLE = ("analyzer", "positions", "docs_per_shard", "n_buckets")

#: per-field mapping options (the engine's one analyzed text field)
MAPPABLE_FIELDS = ("text",)
MAPPABLE_OPTIONS = ("analyzer", "positions")


def _read(registry_path: str) -> dict:
    if not os.path.exists(registry_path):
        return {}
    with open(registry_path) as f:
        return json.load(f)


def _write(registry_path: str, reg: dict) -> None:
    os.makedirs(os.path.dirname(registry_path) or ".", exist_ok=True)
    tmp = registry_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=1, sort_keys=True)
    os.replace(tmp, registry_path)  # atomic on POSIX, like the alias swap


def put_template(
    registry_path: str,
    name: str,
    pattern: str,
    settings: dict | None = None,
    order: int = 0,
    mappings: dict | None = None,
    aliases: dict | None = None,
) -> dict:
    """Register (or replace — ES PUT semantics) a template: ``pattern``
    is an fnmatch glob over future index names, ``settings`` a dict of
    TEMPLATABLE build knobs, ``mappings`` per-field options (see module
    docstring), ``aliases`` aliases-on-create (optionally filtered),
    ``order`` the ES tie-break (higher order overwrites lower per-key
    when several templates match)."""
    settings = dict(settings or {})
    bad = sorted(set(settings) - set(TEMPLATABLE))
    if bad:
        raise ValueError(
            f"non-templatable settings {bad}; templatable: {list(TEMPLATABLE)}"
        )
    mappings = {f: dict(o) for f, o in (mappings or {}).items()}
    for field, opts in mappings.items():
        if field not in MAPPABLE_FIELDS:
            raise ValueError(
                f"unmappable field {field!r}; the engine indexes {MAPPABLE_FIELDS}"
            )
        bad = sorted(set(opts) - set(MAPPABLE_OPTIONS))
        if bad:
            raise ValueError(
                f"unmappable options {bad} for field {field!r}; "
                f"mappable: {list(MAPPABLE_OPTIONS)}"
            )
    aliases_norm: dict = {}
    for alias, flt in (aliases or {}).items():
        if flt is not None:
            from kafka_elasticsearch_standalone_consumer_spark.query.engine import (
                _filters_to_sql,
            )

            _filters_to_sql([tuple(f) for f in flt])  # validate eagerly
            aliases_norm[alias] = [list(f) for f in flt]
        else:
            aliases_norm[alias] = None
    reg = _read(registry_path)
    reg[name] = {
        "pattern": pattern,
        "settings": settings,
        "order": int(order),
        "mappings": mappings,
        "aliases": aliases_norm,
    }
    _write(registry_path, reg)
    return reg[name]


def delete_template(registry_path: str, name: str) -> None:
    reg = _read(registry_path)
    if name not in reg:
        raise KeyError(f"no template {name!r}")
    del reg[name]
    _write(registry_path, reg)


def get_templates(registry_path: str) -> dict:
    return _read(registry_path)


def _matching(registry_path: str, index_name: str) -> list[dict]:
    return sorted(
        (t for t in _read(registry_path).values()
         if fnmatch.fnmatchcase(index_name, t["pattern"])),
        key=lambda t: t["order"],
    )


def resolve_settings(registry_path: str, index_name: str, **explicit) -> dict:
    """Merged creation settings for ``index_name``: matching templates in
    ascending order (higher order overwrites per-key; within one template
    its field mappings apply first, then its settings), then explicit
    kwargs on top — ES's documented precedence."""
    merged: dict = {}
    for t in _matching(registry_path, index_name):
        for opts in t.get("mappings", {}).values():
            merged.update(opts)  # text-field options → the same build knobs
        merged.update(t["settings"])
    merged.update({k: v for k, v in explicit.items() if v is not None})
    return merged


def resolve_aliases(registry_path: str, index_name: str) -> dict:
    """Aliases-on-create for ``index_name``: per-alias-name overwrite in
    ascending template order. Values are None (plain alias) or a filter
    tuple list (filtered alias)."""
    merged: dict = {}
    for t in _matching(registry_path, index_name):
        for alias, flt in t.get("aliases", {}).items():
            merged[alias] = None if flt is None else [tuple(f) for f in flt]
    return merged


def create_index(
    spark,
    transcripts,
    registry_path: str,
    index_name: str,
    base_dir: str,
    alias_registry: str | None = None,
    **explicit,
):
    """Create (build) a new index named ``index_name`` under
    ``base_dir/index_name`` with template-resolved settings — the ES
    create-on-first-write path. Explicit kwargs (any ``build_index``
    argument) override template values. Template aliases-on-create are
    registered in ``alias_registry`` (default ``base_dir/aliases_reg``)
    pointing at the fresh warehouse — filtered when the template says so.
    Returns the warehouse path."""
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index

    tmpl = {k: v for k, v in explicit.items() if k in TEMPLATABLE}
    other = {k: v for k, v in explicit.items() if k not in TEMPLATABLE}
    settings = resolve_settings(registry_path, index_name, **tmpl)
    path = os.path.join(base_dir, index_name)
    build_index(spark, transcripts, path, **settings, **other)
    aliases = resolve_aliases(registry_path, index_name)
    if aliases:
        from kafka_elasticsearch_standalone_consumer_spark.pipeline.snapshot import (
            set_alias,
        )

        reg = alias_registry or os.path.join(base_dir, "aliases_reg")
        for alias, flt in sorted(aliases.items()):
            set_alias(reg, alias, path, where=flt)
    return path
