from __future__ import annotations

import pytest

from kafka_elasticsearch_standalone_consumer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kesc-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts(spark):
    """Small deterministic corpus (~1k turns) shared across tests."""
    from kafka_elasticsearch_standalone_consumer_spark.corpus import generate_transcripts

    df = generate_transcripts(spark, n_convs=100, seed=42, partitions=4)
    df.persist().count()
    return df


@pytest.fixture(scope="session")
def built_index(spark, transcripts, tmp_path_factory):
    """Index built once over the shared corpus; returns (Index, warehouse path)."""
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    path = str(tmp_path_factory.mktemp("warehouse") / "idx")
    # small shards so multi-shard paths are exercised at test scale
    build_index(spark, transcripts, path, docs_per_shard=256, n_buckets=8)
    return Index(spark, path), path
