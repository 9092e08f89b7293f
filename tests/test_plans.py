"""Physical-plan assertions (SURVEY §3.3/§4.2): the optimizations we rely
on must be visible in the plan, not assumed — partition pruning on the
postings scan, predicate pushdown, broadcast of query-term weights, and
whole-stage codegen on the oracle path.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df, mode="formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_postings_scan_is_partition_pruned(spark, built_index):
    idx, path = built_index
    idfw, buckets = idx._plan_terms("w00000 w00412")
    hits = idx.postings.filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(list(idfw))
    )
    plan = _plan(hits)
    # directory-level pruning on the bucket partition column
    assert "PartitionFilters" in plan
    seg = plan[plan.index("PartitionFilters") :]
    assert "term_bucket" in seg[: seg.index("]") + 1]
    # row-group/predicate pushdown on the term column
    assert "PushedFilters" in plan
    seg = plan[plan.index("PushedFilters") :]
    assert "term" in seg[: seg.index("]") + 1]


def test_postings_scan_prunes_columns(spark, built_index):
    idx, _ = built_index
    pruned = idx.postings.select("term", "shard", "n_docs")
    plan = _plan(pruned)
    seg = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "docs:binary" not in seg and "tfs:binary" not in seg  # blobs not read
    assert "n_docs:int" in seg


def test_oracle_uses_broadcast_and_codegen(spark, built_index):
    idx, _ = built_index
    df = idx.search_oracle("w00000 w00412", 10)
    df.collect()  # AQE: the final plan (with codegen spans) exists post-run
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "WholeStageCodegen" in plan or "isFinalPlan=true" in plan


def test_term_lookup_is_driver_side(spark, built_index):
    """Warehouse-backed term planning must not launch a Spark job."""
    idx, _ = built_index
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    rows = idx._lookup_terms_arrow(["w00000", "w00412", "zzabsent"])
    after = tracker.getJobIdsForGroup(None)
    assert rows is not None and len(rows) >= 2
    assert before == after
