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
        w.parquet(self.path(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))
