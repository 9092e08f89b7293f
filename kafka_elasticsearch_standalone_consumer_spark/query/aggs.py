"""ES-style aggregations beyond ``terms`` (histogram / range / stats /
date_histogram) — fully declarative.

Elasticsearch exposes these over the docs matching a query (the reference
fed ES 1.5.1, reference ``pom.xml:22``, whose facet/aggregation API
covers exactly this set); here each is pure Column algebra over a
DataFrame of documents, and :class:`~...engine.Index` methods scope them
to the BM25 match set via a left-semi join (same shape as
``Index.facets``: term-pruned tokens scan → distinct matching docs →
semi join → one aggregation — Catalyst owns the plan, the facet scan is
column-pruned to doc_id + the aggregated field).

Aggregations touch every matching doc, so at 100 TB these are the
declarative paths (one aggregation shuffle whose key cardinality is the
bucket count, with map-side partial aggregation) — never kernels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def histogram(
    df: DataFrame,
    field: str,
    interval: float,
    min_doc_count: int = 1,
    extended_bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """ES histogram agg: fixed-width buckets, (bucket, n) ascending.

    Bucket key = floor(value / interval) * interval, ES's exact rule.
    ``min_doc_count`` / ``extended_bounds`` carry the ES 1.x empty-
    bucket semantics (the numeric twin of date_histogram's fill):
    buckets under the count are omitted; at 0 every interval step
    between the (bounds-widened) first and last bucket appears, empties
    as n=0. The series is built over INTEGER bucket indices
    (sequence(lo_idx, hi_idx)) and multiplied back by the interval, so
    the fill never accumulates float step error; the 1-row min/max
    aggregate + ≤series-length explode is the only added cost at
    100 TB. Empty input with no explicit bounds yields zero rows."""
    iv = float(interval)
    bucket = F.floor(F.col(field) / F.lit(iv)) * F.lit(iv)
    counts = (
        df.groupBy(bucket.cast("double").alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    if min_doc_count >= 1:
        if min_doc_count > 1:
            counts = counts.filter(F.col("n") >= int(min_doc_count))
        return counts.orderBy("bucket")
    lo = F.floor(F.min(field) / F.lit(iv))
    hi = F.floor(F.max(field) / F.lit(iv))
    if extended_bounds is not None:
        eb_lo, eb_hi = extended_bounds
        # least/greatest skip NULLs in both engines, so explicit bounds
        # still apply when the frame is empty
        lo = F.least(lo, F.floor(F.lit(float(eb_lo)) / F.lit(iv)))
        hi = F.greatest(hi, F.floor(F.lit(float(eb_hi)) / F.lit(iv)))
    series = (
        df.agg(lo.alias("lo"), hi.alias("hi"))
        .select(F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("i"))
        .select((F.col("i") * F.lit(iv)).cast("double").alias("bucket"))
    )
    return (
        series.join(counts, "bucket", "left")
        .select("bucket", F.coalesce("n", F.lit(0)).cast("long").alias("n"))
        .orderBy("bucket")
    )


def _range_label(field: str, bounds: list[float]) -> Column:
    """ES range-agg key: "*-b0", "b0-b1", …, "bn-*"."""
    c = F.col(field)
    expr = F.lit(f"{bounds[-1]}-*")
    for lo, hi in reversed(list(zip([None] + list(bounds), list(bounds) + [None]))):
        if hi is None:
            continue
        label = f"{'*' if lo is None else lo}-{hi}"
        cond = c < F.lit(float(hi)) if lo is None else (
            (c >= F.lit(float(lo))) & (c < F.lit(float(hi)))
        )
        expr = F.when(cond, F.lit(label)).otherwise(expr)
    return expr


def _range_lower(field: str, bounds: list[float]) -> Column:
    """Numeric lower bound of each bucket (−inf for the open start) —
    the ordering key, since labels sort lexicographically ('10-20'
    before '5-10')."""
    c = F.col(field)
    expr = F.lit(float(bounds[-1]))
    for lo, hi in reversed(list(zip([None] + list(bounds), list(bounds) + [None]))):
        if hi is None:
            continue
        lower = float("-inf") if lo is None else float(lo)
        cond = c < F.lit(float(hi)) if lo is None else (
            (c >= F.lit(float(lo))) & (c < F.lit(float(hi)))
        )
        expr = F.when(cond, F.lit(lower)).otherwise(expr)
    return expr


def range_counts(df: DataFrame, field: str, bounds: list[float]) -> DataFrame:
    """ES range agg: half-open [lo, hi) buckets with open ends,
    (range_label, n) for non-empty buckets, in bucket order (numeric
    lower bound asc, not label-lexicographic). Docs with a NULL field
    value are excluded — ES's range aggregation ignores docs missing
    the field."""
    bs = sorted(bounds)
    return (
        df.filter(F.col(field).isNotNull())
        .groupBy(
            _range_lower(field, bs).alias("_lo"),
            _range_label(field, bs).alias("range_label"),
        )
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("_lo")
        .select("range_label", "n")
    )


def _ip4_to_int(s: str) -> int:
    a, b, c, d = (int(p) for p in s.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


def _ip_to_long(c: Column) -> Column:
    """Dotted-quad IPv4 string → numeric (JVM-side split + shifts)."""
    p = F.split(c, r"\.")
    return (
        p[0].cast("long") * 16777216
        + p[1].cast("long") * 65536
        + p[2].cast("long") * 256
        + p[3].cast("long")
    )


def ip_range_counts(df: DataFrame, field: str, bounds: list[str]) -> DataFrame:
    """ES ``ip_range`` aggregation: half-open [lo, hi) buckets over an
    IPv4 string field, bounds given as dotted quads, open ends at both
    sides — same key format as the range agg ("*-b0", "b0-b1", "bn-*"),
    bucket order = numeric lower bound. NULL / non-IP values are
    excluded like docs missing the field. The dotted-quad → numeric
    conversion is pure Column algebra, so the whole agg is one
    map-side-combined groupBy."""
    bs = sorted(bounds, key=_ip4_to_int)
    n = _ip_to_long(F.col(field))
    label = F.lit(f"{bs[-1]}-*")
    lower = F.lit(float(_ip4_to_int(bs[-1])))
    for lo, hi in reversed(list(zip([None] + bs, bs + [None]))):
        if hi is None:
            continue
        lab = f"{'*' if lo is None else lo}-{hi}"
        hi_n = F.lit(_ip4_to_int(hi))
        cond = n < hi_n if lo is None else ((n >= F.lit(_ip4_to_int(lo))) & (n < hi_n))
        label = F.when(cond, F.lit(lab)).otherwise(label)
        lower = F.when(
            cond, F.lit(float("-inf") if lo is None else float(_ip4_to_int(lo)))
        ).otherwise(lower)
    # NULLs and non-dotted-quad strings are excluded BEFORE the numeric
    # cast (ANSI mode would throw on a malformed cast, and ES's ip_range
    # ignores docs missing/invalid in the field)
    return (
        df.filter(F.col(field).rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"))
        .groupBy(lower.alias("_lo"), label.alias("range_label"))
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("_lo")
        .select("range_label", "n")
    )


def stats_summary(df: DataFrame, field: str) -> DataFrame:
    """ES stats agg: one row of count / min / max / sum / avg."""
    c = F.col(field).cast("double")
    return df.agg(
        F.count(c).cast("long").alias("n"),
        F.min(c).alias("min_v"),
        F.max(c).alias("max_v"),
        F.round(F.sum(c), 6).alias("sum_v"),
        F.round(F.avg(c), 6).alias("avg_v"),
    )


def extended_stats(df: DataFrame, field: str, sigma: float = 2.0) -> DataFrame:
    """ES extended_stats agg: the stats row plus sum_of_squares,
    POPULATION variance / std_deviation (ES uses the biased n-divisor
    form) and the ``avg ± sigma·σ`` std_deviation_bounds. One
    map-side-combinable pass — every term is an algebraic aggregate, so
    partial aggregation holds at any scale. Variance-family values are
    rounded to 4 decimals (one-pass vs Welford fp drift stays below
    that across engines)."""
    c = F.col(field).cast("double")
    std = F.stddev_pop(c)
    return df.agg(
        F.count(c).cast("long").alias("n"),
        F.min(c).alias("min_v"),
        F.max(c).alias("max_v"),
        F.round(F.sum(c), 6).alias("sum_v"),
        F.round(F.avg(c), 6).alias("avg_v"),
        F.round(F.sum(c * c), 6).alias("sum_sq"),
        F.round(F.var_pop(c), 4).alias("variance"),
        F.round(std, 4).alias("std_dev"),
        F.round(F.avg(c) + F.lit(float(sigma)) * std, 4).alias("std_upper"),
        F.round(F.avg(c) - F.lit(float(sigma)) * std, 4).alias("std_lower"),
    )


def percentile_ranks(df: DataFrame, field: str, values: list[float]) -> DataFrame:
    """ES percentile_ranks agg, exact-CDF definition: for each probe
    value v, pct = 100 · |{x ≤ v}| / n — the step-function empirical CDF
    (ES's t-digest interpolates between centroids; the exact form is
    deterministic and cross-engine comparable, the same trade the
    percentiles agg documents). One conditional-sum pass over the scoped
    set, (value, pct) rows in probe order."""
    c = F.col(field).cast("double")
    vs = [float(v) for v in values]
    row = df.agg(
        F.count(c).alias("_n"),
        *[
            F.sum(F.when(c <= F.lit(v), 1).otherwise(0)).alias(f"_c{i}")
            for i, v in enumerate(vs)
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(v).alias("value"),
                F.round(F.col(f"_c{i}") * 100.0 / F.col("_n"), 6).alias("pct"),
            )
            for i, v in enumerate(vs)
        ]
    )
    return row.select(F.explode(pairs).alias("vp")).select("vp.value", "vp.pct")


def date_range_counts(df: DataFrame, ts_field: str, bounds: list[str]) -> DataFrame:
    """ES date_range agg: half-open [from, to) buckets over ISO timestamp
    bounds with open ends, (range_label, n) in bucket order; docs with a
    NULL timestamp are excluded (ES ignores docs missing the field).
    Bucket labels use the ISO bound strings verbatim."""
    c = F.col(ts_field).cast("timestamp")
    bs = sorted(bounds)
    label = F.lit(f"{bs[-1]}-*")
    order = F.lit(len(bs))
    for i, (lo, hi) in reversed(
        list(enumerate(zip([None] + bs, bs + [None])))
    ):
        if hi is None:
            continue
        cond = (
            c < F.lit(hi).cast("timestamp")
            if lo is None
            else (c >= F.lit(lo).cast("timestamp")) & (c < F.lit(hi).cast("timestamp"))
        )
        label = F.when(cond, F.lit(f"{'*' if lo is None else lo}-{hi}")).otherwise(label)
        order = F.when(cond, F.lit(i)).otherwise(order)
    return (
        df.filter(c.isNotNull())
        .groupBy(order.alias("_i"), label.alias("range_label"))
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("_i")
        .select("range_label", "n")
    )


def percentiles(
    df: DataFrame,
    field: str,
    pcts: list[float] | None = None,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """ES percentiles agg: (pct, value) per requested fraction, pct asc.

    ``exact=True`` is the interpolated exact quantile (Spark
    ``percentile``; value at rank p·(n−1), the same definition as SQL
    ``quantile_cont`` — cross-engine comparable). ``exact=False`` is the
    scale path: ``percentile_approx`` (Greenwald–Khanna sketch, mergeable
    across partitions with map-side partials — the analogue of ES's
    t-digest; exact percentiles need a full sort at 100 TB, the sketch
    doesn't). Values rounded to 6 decimals."""
    if pcts is None:
        pcts = [0.01, 0.05, 0.25, 0.50, 0.75, 0.95, 0.99]  # ES defaults /100
    ps = [float(p) for p in pcts]
    c = F.col(field).cast("double")
    vals = F.percentile(c, ps) if exact else F.percentile_approx(c, ps, accuracy)
    pairs = F.arrays_zip(
        F.array(*[F.lit(p) for p in ps]).alias("pct"),
        F.col("vals").alias("value"),
    )
    return (
        df.agg(vals.alias("vals"))
        .select(F.explode(pairs).alias("pv"))
        .select(
            F.col("pv.pct").alias("pct"),
            F.round(F.col("pv.value"), 6).alias("value"),
        )
        .orderBy("pct")
    )


def cardinality(df: DataFrame, field: str, exact: bool = False, rsd: float = 0.05) -> DataFrame:
    """ES cardinality agg: one row ``n_distinct``.

    Default is the ES-faithful approximate mode — Spark's
    ``approx_count_distinct`` is HyperLogLog++ (the same sketch family ES
    uses), constant memory per partition and mergeable, so it is the only
    sane mode at 100 TB. ``exact=True`` (count_distinct: a shuffle keyed
    on the value) is the verification mode for small scopes."""
    c = F.col(field)
    agg = F.count_distinct(c) if exact else F.approx_count_distinct(c, rsd)
    return df.agg(agg.cast("long").alias("n_distinct"))


def top_hits(
    df: DataFrame,
    bucket_field: str,
    sort_field: str,
    k: int,
    ascending: bool = False,
    id_field: str = "doc_id",
) -> DataFrame:
    """ES top_hits sub-aggregation under a terms bucket: the k best docs
    per ``bucket_field`` value ordered by ``sort_field`` (ties by
    ``id_field`` asc, ES's deterministic tiebreak when a sort is given).

    One window (row_number partitioned by the bucket) — a single shuffle
    keyed on the bucket value with no global sort, so the cost at 100 TB
    is one exchange + a per-partition top-k, not an ordering of the
    corpus."""
    w = Window.partitionBy(bucket_field).orderBy(
        F.asc(sort_field) if ascending else F.desc(sort_field), F.asc(id_field)
    )
    return (
        df.withColumn("rank_in_bucket", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_in_bucket") <= k)
        .select(
            bucket_field,
            id_field,
            F.col(sort_field).cast("double").alias("sort_value"),
            "rank_in_bucket",
        )
        .orderBy(bucket_field, "rank_in_bucket")
    )


def terms_metric(
    df: DataFrame,
    bucket_field: str,
    metric_field: str,
    metrics: tuple[str, ...] = ("avg",),
    size: int = 10,
    order_by: str | None = None,
    ascending: bool = False,
) -> DataFrame:
    """ES terms aggregation with metric sub-aggregations: per bucket the
    doc count plus avg/min/max/sum of ``metric_field``, buckets ordered by
    doc count desc (ES default) with value-asc ties, top ``size``.

    ``order_by`` is ES 1.x's terms-agg ``order`` on a SUB-AGGREGATION
    (``{"order": {"avg_value": "desc"}}``): name one of the requested
    metrics and buckets rank by that metric instead of doc count
    (``ascending`` flips direction, ES's "asc"). The sort key is the
    6-dp-ROUNDED metric the row reports (rounded BEFORE ordering — the
    geo rule, since avg sums are accumulation-order-sensitive), ties
    bucket asc.

    One groupBy — all requested metrics ride the same shuffle with
    map-side partials, so nesting metrics under the terms bucket is free
    at 100 TB relative to the terms agg alone; any ordering is still a
    TakeOrderedAndProject over bucket-cardinality rows."""
    fns = {"avg": F.avg, "min": F.min, "max": F.max, "sum": F.sum}
    if order_by is not None and order_by not in metrics:
        raise ValueError(
            f"order_by {order_by!r} must name one of the requested metrics {metrics}"
        )
    c = F.col(metric_field).cast("double")
    agg_cols = [F.count("*").cast("long").alias("n")] + [
        F.round(fns[m](c), 6).alias(f"{m}_v") for m in metrics
    ]
    key = F.col("n") if order_by is None else F.col(f"{order_by}_v")
    return (
        df.groupBy(bucket_field)
        .agg(*agg_cols)
        .orderBy(key.asc() if ascending else key.desc(), F.asc(bucket_field))
        .limit(size)
    )


def nested_terms(
    df: DataFrame,
    parent_field: str,
    child_field: str,
    metric_field: str | None = None,
    metrics: tuple[str, ...] = (),
    size: int = 10,
    child_size: int = 10,
) -> DataFrame:
    """ES two-level bucket aggregation: ``terms(parent) → terms(child)``
    with optional metric sub-aggs on the leaves — the `group by country,
    then browser per country` idiom (ES 1.5.1's nested-aggregation API,
    reference ``pom.xml:22``; the reference's ES mappings invite exactly
    this over index/type routing fields, reference ``IndexHandler.java``).

    Either field may be a SQL *expression* (e.g. a ``date_trunc``), which
    is how ES nests date_histogram under terms — the expression is
    aliased to ``parent`` / ``child`` in the output.

    One groupBy on the composite (parent, child) key computes every leaf
    (map-side partial aggregation, key cardinality = bucket product);
    parent totals and ranks ride TWO windows keyed on the parent only.
    At 100 TB that is one exchange on the composite key plus one on the
    parent key over *bucket rows* (not doc rows) — the post-aggregation
    data is tiny, so the windows are free relative to the scan.

    Output: (parent, child, n, [metric_v...], parent_n), ordered ES-style:
    parent buckets by total count desc (parent asc ties), children inside
    a parent by count desc (child asc ties); top ``size`` parents ×
    ``child_size`` children."""
    fns = {"avg": F.avg, "min": F.min, "max": F.max, "sum": F.sum}
    agg_cols = [F.count("*").cast("long").alias("n")]
    if metric_field is not None:
        c = F.col(metric_field).cast("double")
        agg_cols += [F.round(fns[m](c), 6).alias(f"{m}_v") for m in metrics]
    leaves = df.groupBy(
        F.expr(parent_field).alias("parent"), F.expr(child_field).alias("child")
    ).agg(*agg_cols)
    wp = Window.partitionBy("parent")
    leaves = leaves.withColumn("parent_n", F.sum("n").over(wp).cast("long"))
    pw = Window.orderBy(F.desc("parent_n"), F.asc("parent"))
    cw = Window.partitionBy("parent").orderBy(F.desc("n"), F.asc("child"))
    return (
        leaves.withColumn("parent_rank", F.dense_rank().over(pw))
        .withColumn("child_rank", F.row_number().over(cw))
        .filter((F.col("parent_rank") <= size) & (F.col("child_rank") <= child_size))
        .drop("parent_rank", "child_rank")
        .orderBy(F.desc("parent_n"), F.asc("parent"), F.desc("n"), F.asc("child"))
    )


def filters_counts(
    df: DataFrame, filters: dict[str, str], other_bucket: bool = True
) -> DataFrame:
    """ES ``filters`` aggregation: one named bucket per SQL predicate,
    counted over the scoped docs, plus ES's optional ``_other_`` bucket
    (docs matching none of the filters). Buckets may overlap, exactly as
    in ES — each predicate is evaluated independently.

    A single pass: every bucket is a conditional count inside ONE
    aggregation (no per-filter jobs, no second scan for ``_other_``), then
    the 1-row wide result is unpivoted to (bucket, n) rows with ``stack``
    — driver-cheap and scan-minimal at any scale.

    Output: (bucket, n) ordered by bucket name asc (``_other_`` first by
    its ES-reserved name)."""
    names = sorted(filters)
    conds = {n: F.expr(filters[n]) for n in names}
    agg_cols = [
        F.sum(F.when(conds[n], 1).otherwise(0)).cast("long").alias(f"b{i}")
        for i, n in enumerate(names)
    ]
    if other_bucket:
        none_match = None
        for n in names:
            none_match = ~conds[n] if none_match is None else (none_match & ~conds[n])
        agg_cols.append(
            F.sum(F.when(none_match, 1).otherwise(0)).cast("long").alias("b_other")
        )
    wide = df.agg(*agg_cols)
    # bucket names are user strings — escape quotes so a name like
    # "it's" can't break (or inject into) the stack() expression
    pairs = [f"'{n.replace(chr(39), chr(39) * 2)}', b{i}" for i, n in enumerate(names)]
    if other_bucket:
        pairs.append("'_other_', b_other")
    n_cols = len(pairs)
    return (
        wide.select(
            F.expr(f"stack({n_cols}, {', '.join(pairs)}) AS (bucket, n)")
        ).orderBy("bucket")
    )


def composite_buckets(
    df: DataFrame,
    sources: list[tuple[str, str]],
    size: int = 10,
    after: tuple | None = None,
    metric_field: str | None = None,
    metrics: tuple[str, ...] = (),
) -> DataFrame:
    """ES ``composite`` aggregation: stream ALL buckets of a multi-source
    key in deterministic key order, ``size`` at a time, resuming from an
    ``after`` key — ES's answer to paging through millions of buckets
    without the terms-agg top-N truncation.

    ``sources`` is an ordered list of (name, SQL expression) — terms /
    histogram / date_histogram sources are all just expressions here.
    ``after`` is the last key tuple of the previous page; buckets
    strictly greater (lexicographically, each source asc) come back.

    This is the RIGHT shape at 100 TB: one map-side-partial aggregation
    on the composite key, the after-key predicate applied BEFORE the
    ordering so a deep page still only sorts surviving buckets, and a
    TakeOrderedAndProject for the page — never a global sort of the
    corpus, never a driver-side bucket spill."""
    fns = {"avg": F.avg, "min": F.min, "max": F.max, "sum": F.sum}
    keys = [n for n, _ in sources]
    agg_cols = [F.count("*").cast("long").alias("n")]
    if metric_field is not None:
        c = F.col(metric_field).cast("double")
        agg_cols += [F.round(fns[m](c), 6).alias(f"{m}_v") for m in metrics]
    buckets = df.groupBy(
        *[F.expr(e).alias(n) for n, e in sources]
    ).agg(*agg_cols)
    if after is not None:
        if len(after) != len(keys):
            raise ValueError("after key arity must match sources")
        # lexicographic strictly-greater: (k0 > a0) OR (k0 = a0 AND (k1 > a1)) ...
        pred = None
        for i in range(len(keys) - 1, -1, -1):
            gt = F.col(keys[i]) > F.lit(after[i])
            if pred is None:
                pred = gt
            else:
                pred = gt | ((F.col(keys[i]) == F.lit(after[i])) & pred)
        buckets = buckets.filter(pred)
    return buckets.orderBy(*[F.asc(k) for k in keys]).limit(size)


def pipeline_metrics(
    buckets: DataFrame,
    bucket_col: str = "bucket",
    value_col: str = "n",
    moving_window: int = 3,
) -> DataFrame:
    """ES pipeline aggregations over an ordered bucket series (the
    histogram/date_histogram output): per bucket the ``cumulative_sum``,
    ``derivative`` (difference vs the previous bucket; NULL for the
    first, ES's behavior), and ``moving_avg`` (simple model over the
    trailing ``moving_window`` buckets INCLUDING the current one).

    Pipeline aggs post-process *bucket rows*, not documents — the three
    windows share one unpartitioned ordering over at most thousands of
    rows, so at 100 TB their cost is invisible next to the histogram
    aggregation that feeds them."""
    w = Window.orderBy(bucket_col)
    v = F.col(value_col).cast("double")
    return buckets.select(
        bucket_col,
        value_col,
        F.sum(v).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_sum"),
        (v - F.lag(v, 1).over(w)).alias("derivative"),
        F.round(
            F.avg(v).over(w.rowsBetween(-(moving_window - 1), 0)), 6
        ).alias("moving_avg"),
    ).orderBy(bucket_col)


def scripted_metric(
    df: DataFrame, map_expr: str, reduce_expr: str = "sum(mapped)"
) -> DataFrame:
    """ES scripted_metric aggregation, Spark-first: the map script is a
    per-row SQL expression (column ``mapped``), the combine/reduce pair a
    SQL aggregate over it — Catalyst runs the map inside the scan's
    codegen stage and the aggregate map-side-partial, so the shape is one
    pass + one tiny final combine, same as ES's per-shard combine →
    coordinator reduce. Like ES, a non-associative reduce is on the
    caller (ES ships the same caveat for its combine_script)."""
    return df.selectExpr(f"({map_expr}) AS mapped").agg(
        F.expr(reduce_expr).alias("value")
    )


def missing_count(df: DataFrame, field: str) -> DataFrame:
    """ES ``missing`` aggregation: how many scoped docs lack a value for
    ``field`` (NULL). One conditional count — a single aggregation."""
    return df.agg(
        F.sum(F.when(F.col(field).isNull(), 1).otherwise(0)).cast("long").alias("n_missing")
    )


def date_histogram(
    df: DataFrame,
    ts_field: str,
    unit: str = "day",
    min_doc_count: int = 1,
    extended_bounds: tuple[str, str] | None = None,
) -> DataFrame:
    """ES date_histogram: calendar-interval buckets (day/month/year/hour),
    emitted as strings so cross-engine comparisons are timezone-stable
    (the session zone is pinned to UTC in session.py).

    ES 1.x semantics knobs (api ``min_doc_count`` / ``extended_bounds``):
    buckets with fewer than ``min_doc_count`` docs are omitted; at 0 the
    histogram is FILLED — every calendar step between the (possibly
    bounds-widened) first and last bucket appears, empties as n=0.  The
    fill is plan-side: a 1-row min/max aggregate feeds ``sequence`` +
    ``explode`` (≤ one row per calendar step, never data-sized) and the
    observed counts left-join onto the series, so at 100 TB the only
    added cost is the scalar aggregate.  Empty input with no explicit
    bounds yields zero rows (``sequence`` over NULL explodes to nothing);
    with bounds it yields the all-zero series, exactly as ES does."""
    fmt = {
        "hour": "yyyy-MM-dd HH:00",
        "day": "yyyy-MM-dd",
        "month": "yyyy-MM",
        "year": "yyyy",
    }[unit]
    counts = (
        df.groupBy(F.date_format(F.col(ts_field), fmt).alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    if min_doc_count >= 1:
        if min_doc_count > 1:
            counts = counts.filter(F.col("n") >= int(min_doc_count))
        return counts.orderBy("bucket")
    # min_doc_count == 0: fill the calendar series with empty buckets
    ts_type = df.schema[ts_field].dataType
    lo = F.date_trunc(unit, F.min(ts_field))
    hi = F.date_trunc(unit, F.max(ts_field))
    if extended_bounds is not None:
        eb_lo, eb_hi = extended_bounds
        # least/greatest skip NULLs in both Spark and DuckDB, so explicit
        # bounds still apply when the frame is empty
        lo = F.least(lo, F.date_trunc(unit, F.lit(eb_lo).cast(ts_type)))
        hi = F.greatest(hi, F.date_trunc(unit, F.lit(eb_hi).cast(ts_type)))
    series = (
        df.agg(lo.alias("lo"), hi.alias("hi"))
        .select(
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr(f"interval 1 {unit}"))
            ).alias("t")
        )
        .select(F.date_format("t", fmt).alias("bucket"))
    )
    return (
        series.join(counts, "bucket", "left")
        .select("bucket", F.coalesce("n", F.lit(0)).cast("long").alias("n"))
        .orderBy("bucket")
    )
