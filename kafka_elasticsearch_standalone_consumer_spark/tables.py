"""Table-format seam (SURVEY §1.4, §4.3).

The north rule targets Iceberg tables; this sandbox has no Iceberg runtime
jar, so the seam is a thin store abstraction over a warehouse directory of
Parquet tables with identical schemas/partitioning. Swapping in Iceberg
means replacing ``read``/``write`` with ``spark.read.format("iceberg")`` /
``df.writeTo(...).partitionedBy(...)`` — nothing else in the engine touches
paths.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class Warehouse:
    """A directory of named Parquet tables (Iceberg-shaped seam)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f.startswith(("part-", "_SUCCESS")) or "=" in f
            for f in os.listdir(p)
        )

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: tuple[str, ...] | None = None,
    ) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        p = self.path(name)
        w.parquet(p)
        # Spark writes no data file for an empty DataFrame, which loses the
        # schema for later readers (empty-corpus bootstrap, empty segments).
        # Persist a zero-row schema-bearing file in that case.
        if not any(
            f.startswith("part-") or f.endswith(".parquet")
            for _d, _s, files in os.walk(p)
            for f in files
        ):
            import pyarrow.parquet as pq

            # partition columns stay IN the file: with no partition dirs,
            # discovery treats the table as unpartitioned and the column
            # must come from the file schema
            pq.write_table(df.limit(0).toArrow(), os.path.join(p, "part-empty-schema.parquet"))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    # -- driver-side fast paths (no Spark job) -----------------------------
    # Control-plane tables are a handful of rows; routing them through a
    # Spark write/read costs a full job each (~0.5 s of pure scheduling),
    # which at 21 control ops per build dominated small-corpus builds and
    # wrecked the N→4N scaling efficiency. These paths produce/consume the
    # SAME parquet layout Spark reads/writes — only the engine differs.

    def count_rows(self, name: str) -> int:
        """Exact row count from parquet footers (metadata-only, no scan)."""
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        paths = [
            os.path.join(dirpath, f)
            for dirpath, _dirs, files in os.walk(self.path(name))
            for f in files
            if f.endswith(".parquet") or (f.startswith("part-") and not f.endswith(".crc"))
        ]
        if not paths:
            return 0
        with ThreadPoolExecutor(max_workers=min(16, len(paths))) as ex:
            return sum(ex.map(lambda p: pq.read_metadata(p).num_rows, paths))

    def append_rows(self, name: str, rows: list[tuple], arrow_schema) -> None:
        """Append a few control rows as one parquet file (atomic rename)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = self.path(name)
        os.makedirs(p, exist_ok=True)
        cols = [pa.array([r[i] for r in rows], type=f.type) for i, f in enumerate(arrow_schema)]
        table = pa.Table.from_arrays(cols, schema=arrow_schema)
        tmp = os.path.join(p, f".tmp-{uuid.uuid4().hex}")
        final = os.path.join(p, f"part-ctl-{uuid.uuid4().hex}.parquet")
        pq.write_table(table, tmp)
        os.rename(tmp, final)

    def write_meta(self, name: str, payload: dict) -> None:
        """Overwrite a one-row JSON metadata table (driver-side)."""
        import json
        import shutil

        import pyarrow as pa

        p = self.path(name)
        if os.path.isdir(p):
            shutil.rmtree(p)
        self.append_rows(name, [(json.dumps(payload),)], pa.schema([("meta", pa.string())]))

    def read_meta(self, name: str) -> dict:
        import json

        return json.loads(self.read_rows(name)[0]["meta"])

    def read_rows(self, name: str) -> list[dict]:
        """Read a small control table driver-side (no Spark job)."""
        import pyarrow.parquet as pq

        out: list[dict] = []
        for dirpath, _dirs, files in os.walk(self.path(name)):
            for f in sorted(files):
                if f.endswith(".parquet") or (f.startswith("part-") and not f.endswith(".crc")):
                    out.extend(pq.read_table(os.path.join(dirpath, f)).to_pylist())
        return out
