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

Only the engine's index-creation knobs are templatable (ES's analysis +
shard-count settings): ``analyzer``, ``positions``, ``docs_per_shard``,
``n_buckets``.
"""

from __future__ import annotations

import fnmatch
import json
import os

TEMPLATE_FILE = "templates.json"

#: build_index kwargs a template may set (ES: analysis + shard settings)
TEMPLATABLE = ("analyzer", "positions", "docs_per_shard", "n_buckets")


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
    settings: dict,
    order: int = 0,
) -> dict:
    """Register (or replace — ES PUT semantics) a template: ``pattern``
    is an fnmatch glob over future index names, ``settings`` a dict of
    TEMPLATABLE build knobs, ``order`` the ES tie-break (higher order
    overwrites lower per-key when several templates match)."""
    bad = sorted(set(settings) - set(TEMPLATABLE))
    if bad:
        raise ValueError(
            f"non-templatable settings {bad}; templatable: {list(TEMPLATABLE)}"
        )
    reg = _read(registry_path)
    reg[name] = {"pattern": pattern, "settings": dict(settings), "order": int(order)}
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


def resolve_settings(registry_path: str, index_name: str, **explicit) -> dict:
    """Merged creation settings for ``index_name``: matching templates in
    ascending order (higher order overwrites per-key), then explicit
    kwargs on top — ES's documented precedence."""
    merged: dict = {}
    matching = sorted(
        (t for t in _read(registry_path).values()
         if fnmatch.fnmatchcase(index_name, t["pattern"])),
        key=lambda t: t["order"],
    )
    for t in matching:
        merged.update(t["settings"])
    merged.update({k: v for k, v in explicit.items() if v is not None})
    return merged


def create_index(
    spark,
    transcripts,
    registry_path: str,
    index_name: str,
    base_dir: str,
    **explicit,
):
    """Create (build) a new index named ``index_name`` under
    ``base_dir/index_name`` with template-resolved settings — the ES
    create-on-first-write path. Explicit kwargs (any ``build_index``
    argument) override template values. Returns the warehouse path."""
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index

    tmpl = {k: v for k, v in explicit.items() if k in TEMPLATABLE}
    other = {k: v for k, v in explicit.items() if k not in TEMPLATABLE}
    settings = resolve_settings(registry_path, index_name, **tmpl)
    path = os.path.join(base_dir, index_name)
    build_index(spark, transcripts, path, **settings, **other)
    return path
