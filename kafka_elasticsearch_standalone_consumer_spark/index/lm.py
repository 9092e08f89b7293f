"""Persisted language-model tables for the phrase suggester.

The phrase suggester's Laplace bigram LM needs, per call, the corpus
frequency of every candidate unigram and adjacent bigram. The on-demand
path (Index.suggest_phrase's fallback) recomputes them with one pruned
tokens aggregation plus one corpus tokenize-and-pair pass — correct, but
a 100 TB scan per suggestion. A production deployment builds the counts
ONCE here (the same move Lucene-era ES made by keeping its suggester FSTs
next to the index) and the suggester then resolves candidates with
driver-side footer-pruned pyarrow point reads — zero Spark jobs, cost
independent of corpus size, exactly the term_stats dictionary-lookup
pattern (engine._lookup_terms_arrow).

Tables (written next to the index in the same warehouse):

* ``lm_unigrams(term, c)``  — total occurrences per term, range-
  clustered + sorted by term so parquet footer min/max prunes a point
  read to the covering row groups;
* ``lm_bigrams(pair, c)``   — adjacent-pair counts, keyed "a b",
  range-clustered + sorted by pair for the same pruning;
* ``sys_lm_meta``           — the scalars the LM needs (n_tokens,
  vocab) plus the analyzer and the n_docs the build saw, so a reader
  can detect staleness after appends.

Counts are over the live base corpus with the index's analyzer — the
identical numbers the on-demand pass derives, so the suggester's scores
are bit-for-bit the same whichever path serves them (asserted in
tests/test_filtered_search.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.tables import Warehouse

UNIGRAMS_TABLE = "lm_unigrams"
BIGRAMS_TABLE = "lm_bigrams"
LM_META = "sys_lm_meta"


def build_lm_tables(spark: SparkSession, warehouse_path: str) -> dict:
    """Materialize the suggester LM over an existing index warehouse.

    One tokenize pass computes both tables: unigrams are a groupBy over
    the exploded token stream (map-side partial aggregation; key
    cardinality = |vocab|), bigrams a groupBy over the adjacent-pair
    stream (cardinality ≤ |vocab|², Zipf-bounded far lower in practice).
    Both shuffles are aggregation-sized, not corpus-sized. Returns the
    meta payload."""
    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import read_meta

    wh = Warehouse(warehouse_path)
    meta = read_meta(spark, wh)
    analyzer = meta.get("analyzer", "standard")
    docs = wh.read(spark, "docs")
    num = spark.sparkContext.defaultParallelism

    toks = docs.select(tokenize_col(F.col("text"), analyzer=analyzer).alias("w"))
    uni = (
        toks.select(F.explode("w").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("c"))
        .repartitionByRange(num, "term")
        .sortWithinPartitions("term")
    )
    wh.write(uni, UNIGRAMS_TABLE)

    pairs = toks.select(
        F.explode(
            # sequence() counts DOWN when stop < start — short docs must
            # short-circuit to an empty array (same guard as the
            # on-demand pass in engine.suggest_phrase)
            F.expr(
                "CASE WHEN size(w) >= 2 THEN "
                "transform(sequence(0, size(w) - 2), "
                "i -> concat(w[i], ' ', w[i + 1])) "
                "ELSE array() END"
            )
        ).alias("pair")
    )
    big = (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("long").alias("c"))
        .repartitionByRange(num, "pair")
        .sortWithinPartitions("pair")
    )
    wh.write(big, BIGRAMS_TABLE)

    scalars = wh.read(spark, UNIGRAMS_TABLE).agg(
        F.sum("c").alias("n_tokens"), F.count("*").alias("vocab")
    ).collect()[0]
    payload = {
        "n_tokens": int(scalars["n_tokens"] or 0),
        "vocab": int(scalars["vocab"] or 0),
        "analyzer": analyzer,
        "n_docs": int(meta.get("n_docs", 0)),
    }
    wh.write_meta(LM_META, payload)
    return payload


def lookup_counts(
    wh: Warehouse, terms: list[str], pairs: list[str]
) -> tuple[dict[str, float], dict[str, float], float, float] | None:
    """(uni, big, n_tokens, vocab) via driver-side footer-pruned pyarrow
    point reads of the LM tables, or None when the warehouse has no
    materialized LM. No Spark job — the serving-path contract."""
    if not (wh.exists(UNIGRAMS_TABLE) and wh.exists(BIGRAMS_TABLE)):
        return None
    import pyarrow.dataset as pads

    meta = wh.read_meta(LM_META)
    uni: dict[str, float] = {}
    if terms:
        tbl = pads.dataset(wh.path(UNIGRAMS_TABLE), format="parquet").to_table(
            filter=pads.field("term").isin(sorted(terms))
        )
        uni = dict(
            zip(tbl.column("term").to_pylist(), map(float, tbl.column("c").to_pylist()))
        )
    big: dict[str, float] = {}
    if pairs:
        tbl = pads.dataset(wh.path(BIGRAMS_TABLE), format="parquet").to_table(
            filter=pads.field("pair").isin(sorted(pairs))
        )
        big = dict(
            zip(tbl.column("pair").to_pylist(), map(float, tbl.column("c").to_pylist()))
        )
    return uni, big, float(meta["n_tokens"]), float(meta["vocab"])
