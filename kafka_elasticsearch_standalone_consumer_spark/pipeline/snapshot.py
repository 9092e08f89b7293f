"""Snapshot/restore and index aliases — the operational surface of the
Elasticsearch the reference wrote into (ES 1.x ``_snapshot`` repositories
and ``_aliases``; the reference's users relied on both around the index
its bulk sink fed, ref: ``MessageHandler.java:135-139``).

A warehouse is a directory tree of immutable parquet tables (plus the
small sys_* control tables), so a snapshot is a manifest + a verbatim
copy of that tree into a repository directory — point-in-time by
construction, because every mutation path (append_segment / compact /
reindex / deletes) writes NEW files and commits via the registry row.
On a real deployment the copy step is an object-store server-side copy
or an Iceberg snapshot (metadata-only); the manifest/restore protocol
here is exactly that shape with shutil doing the byte movement —
control-plane work, never a Spark job.

Aliases are a tiny name→path indirection (ES's ``_aliases`` API): point
``prod`` at ``idx_v2`` and readers opening through the alias atomically
see the new index — the standard zero-downtime reindex dance. The swap
is write-temp-then-``os.replace`` (atomic on POSIX).
"""

from __future__ import annotations

import json
import os
import shutil
import time

SNAP_MANIFEST = "snapshot.json"
ALIAS_FILE = "aliases.json"


def _tree_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            out.append(os.path.relpath(os.path.join(dirpath, f), root))
    return sorted(out)


def create_snapshot(warehouse_path: str, repo_path: str, name: str) -> dict:
    """Copy the warehouse tree into ``repo_path/name`` and write a
    manifest (file list + sizes). Fails if the snapshot name exists —
    snapshots are immutable, like ES repositories."""
    dest = os.path.join(repo_path, name)
    if os.path.exists(dest):
        raise ValueError(f"snapshot {name!r} already exists in {repo_path}")
    os.makedirs(repo_path, exist_ok=True)
    shutil.copytree(warehouse_path, os.path.join(dest, "data"))
    files = _tree_files(os.path.join(dest, "data"))
    manifest = {
        "name": name,
        "source": os.path.abspath(warehouse_path),
        "created_unix": int(time.time()),
        "n_files": len(files),
        "total_bytes": sum(
            os.path.getsize(os.path.join(dest, "data", f)) for f in files
        ),
        "files": files,
    }
    with open(os.path.join(dest, SNAP_MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def list_snapshots(repo_path: str) -> list[dict]:
    out = []
    if not os.path.isdir(repo_path):
        return out
    for name in sorted(os.listdir(repo_path)):
        mf = os.path.join(repo_path, name, SNAP_MANIFEST)
        if os.path.isfile(mf):
            with open(mf) as fh:
                m = json.load(fh)
            out.append({k: m[k] for k in ("name", "source", "created_unix", "n_files", "total_bytes")})
    return out


def restore_snapshot(repo_path: str, name: str, dest_path: str) -> dict:
    """Restore a snapshot into a NEW warehouse directory, verifying the
    manifest's file list on the way out (a missing file fails loudly
    instead of producing a silently-partial index)."""
    src = os.path.join(repo_path, name)
    mf = os.path.join(src, SNAP_MANIFEST)
    if not os.path.isfile(mf):
        raise ValueError(f"no snapshot {name!r} in {repo_path}")
    with open(mf) as fh:
        manifest = json.load(fh)
    data = os.path.join(src, "data")
    have = _tree_files(data)
    missing = sorted(set(manifest["files"]) - set(have))
    if missing:
        raise ValueError(f"snapshot {name!r} is missing {len(missing)} files: {missing[:5]}")
    if os.path.exists(dest_path) and os.listdir(dest_path):
        raise ValueError(f"restore destination {dest_path} is not empty")
    shutil.copytree(data, dest_path, dirs_exist_ok=True)
    return manifest


# -- aliases ----------------------------------------------------------------

def _read_aliases(registry_path: str) -> dict[str, str]:
    p = os.path.join(registry_path, ALIAS_FILE)
    if not os.path.isfile(p):
        return {}
    with open(p) as fh:
        return json.load(fh)


def _write_aliases(registry_path: str, aliases: dict[str, str]) -> None:
    os.makedirs(registry_path, exist_ok=True)
    tmp = os.path.join(registry_path, ALIAS_FILE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(aliases, fh, indent=1)
    os.replace(tmp, os.path.join(registry_path, ALIAS_FILE))  # atomic swap


def set_alias(
    registry_path: str,
    alias: str,
    warehouse_path: str,
    where: list[tuple] | None = None,
) -> None:
    """Point ``alias`` at a warehouse (atomically replaces any previous
    target — the ES `swap alias onto the new index` move).

    ``where`` makes it a FILTERED alias (ES ``_aliases`` with a
    ``filter`` body): a conjunction of ``(col, op, value)`` tuples — the
    same surface as the local serving ``where=`` — applied read-side on
    every query surface when the alias is opened (see
    :class:`~...engine.FilteredIndex`). Nothing is applied at write
    time, which is what keeps the semantics whole: the filter is a pure
    view, so readers through the alias and readers of the concrete index
    never disagree about what was indexed."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import (
        _filters_to_sql,
    )

    aliases = _read_aliases(registry_path)
    if where is not None:
        _filters_to_sql([tuple(f) for f in where])  # validate eagerly
        aliases[alias] = {
            "path": os.path.abspath(warehouse_path),
            "where": [list(f) for f in where],
        }
    else:
        aliases[alias] = os.path.abspath(warehouse_path)
    _write_aliases(registry_path, aliases)


def drop_alias(registry_path: str, alias: str) -> None:
    aliases = _read_aliases(registry_path)
    aliases.pop(alias, None)
    _write_aliases(registry_path, aliases)


def _alias_entry(registry_path: str, alias: str) -> tuple[str, list[tuple] | None]:
    aliases = _read_aliases(registry_path)
    if alias not in aliases:
        raise KeyError(f"unknown alias {alias!r} in {registry_path}")
    ent = aliases[alias]
    if isinstance(ent, str):  # plain alias (and the pre-filter file format)
        return ent, None
    return ent["path"], [tuple(f) for f in ent.get("where") or []] or None


def resolve_alias(registry_path: str, alias: str) -> str:
    return _alias_entry(registry_path, alias)[0]


def open_alias(spark, registry_path: str, alias: str):
    """Open an :class:`~...engine.Index` through an alias — a
    :class:`~...engine.FilteredIndex` view when the alias carries a
    filter."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import (
        FilteredIndex,
        Index,
    )

    path, where = _alias_entry(registry_path, alias)
    idx = Index(spark, path)
    return idx if where is None else FilteredIndex(idx, where)
