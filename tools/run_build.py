"""spark-submit entry point: build (or resume) the index over a transcripts
table. Shipped to executors via --py-files (see submit_build.sh).

    spark-submit --py-files engine.zip tools/run_build.py <transcripts> <warehouse> [--dry-run]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    src, wh = sys.argv[1], sys.argv[2]
    dry = "--dry-run" in sys.argv
    spark = SparkSession.builder.appName("kesc-index-build").getOrCreate()
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index

    transcripts = spark.read.parquet(src)
    runner = build_index(spark, transcripts, wh, dry_run=dry)
    if dry:
        print(f"dry-run: {runner.dry_run_rows} token rows (nothing written)")
    else:
        print(f"ran steps: {runner.ran}; skipped (already complete): {runner.skipped}")


if __name__ == "__main__":
    main()
