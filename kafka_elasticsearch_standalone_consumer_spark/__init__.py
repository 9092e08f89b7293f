"""PySpark-native full-text indexing + BM25 query engine.

A brand-new engine with the capabilities of the reference
``reachkrishnaraj/kafka-elasticsearch-standalone-consumer`` (a Kafka →
Elasticsearch bulk-indexing daemon, see ``/root/reference``): the ingestion
half (partitioned consume → transform → bulk index, reference
``IndexerJob.java:284-426``) becomes a partition-parallel, checkpointed,
resumable Spark index-build job; the search half (what Elasticsearch 1.5.1
did for the reference behind ``MessageHandler.java:135-139``) becomes a
from-scratch inverted index (delta+varint posting blocks, DF/doc-length
stats) plus a BM25(k1=1.2, b=0.75) top-k query path with block-max pruning.

Everything here is built Spark-first on the public PySpark DataFrame API —
it is NOT a port of the reference's Java.
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128
