"""Mergeable frequency sketches for corpus-scale term statistics.

At 100 TB a plain ``groupBy(value).count().orderBy(...)`` computes exact
counts for EVERY distinct value just to keep the top k — the shuffle
carries the whole long tail (in a web corpus, billions of once-seen
tokens).  The classic fix is a two-pass design built on the Misra–Gries
(space-saving) summary:

pass 1  each partition streams its values through a bounded
        Misra–Gries sketch (``capacity`` counters, O(capacity) memory
        regardless of partition size) and emits only its survivors —
        every value whose GLOBAL frequency exceeds N/(capacity+1) is
        guaranteed to survive in at least one partition (if it were
        below the local threshold everywhere, summing the per-partition
        bounds would put it below the global threshold too);
pass 2  exact counts for the candidate union only — the aggregation key
        set is now bounded by the sketch, not by the vocabulary.

The result is EXACT (not approximate) whenever the k-th candidate's
exact count clears the N/(capacity+1) miss threshold — the function
certifies that inequality and raises loudly when the capacity was too
small to prove the top-k, so callers never silently get a maybe-list.
Reference parity: the reference delegates term statistics to ES/Lucene
(ref MessageHandler.java:135-139); this is the bounded-memory analogue
of a "top terms" facet over a corpus too large to groupBy raw.

Misra & Gries 1982; merge/undercount bound from Agarwal et al.,
"Mergeable Summaries" (PODS 2012): merging exact batch counts into a
summary and reducing back to ``capacity`` counters by subtracting the
(capacity+1)-th largest count keeps total undercount ≤ N_p/(capacity+1).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_reduce(counters: dict[str, int], capacity: int) -> int:
    """Shrink ``counters`` to ≤ capacity entries in place by subtracting
    the (capacity+1)-th largest count from every counter (the mergeable-
    summaries reduction; equivalent to a run of pairwise decrements).
    Returns the subtracted delta — any value's true-count undercount
    grows by at most that much, which is what the streaming monitor's
    error bound accumulates."""
    if len(counters) <= capacity:
        return 0
    counts = np.fromiter(counters.values(), dtype=np.int64, count=len(counters))
    # (capacity+1)-th largest == index -(capacity+1) in ascending order
    delta = int(np.partition(counts, -(capacity + 1))[-(capacity + 1)])
    for k in list(counters):
        c = counters[k] - delta
        if c > 0:
            counters[k] = c
        else:
            del counters[k]
    return delta


# per-partition sketch output: one row per surviving counter (cnt is its
# LOWER-bound count) plus one marker row (value NULL) whose n_part is the
# partition's total item count, reduced says whether any reduction
# happened, and cnt carries the partition's summed reduction deltas (the
# per-value undercount bound contribution)
SKETCH_SCHEMA = "value string, cnt long, n_part long, reduced boolean"


def _sketch_partitions(cap: int):
    """mapInPandas kernel factory: stream a partition's ``value`` column
    through a bounded Misra–Gries summary and emit survivors + marker.
    Shared by the batch :func:`heavy_hitters` (which ignores ``cnt`` and
    recounts exactly) and the streaming monitor (which merges the counted
    summaries into persistent state)."""

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_part = 0
        dropped = 0
        for pdf in batches:
            s = pdf["value"].dropna()
            n_part += len(s)
            for v, c in s.value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > cap:
                dropped += _mg_reduce(counters, cap)
        yield pd.DataFrame(
            {
                "value": list(counters) + [None],
                "cnt": list(counters.values()) + [dropped],
                "n_part": [0] * len(counters) + [n_part],
                "reduced": [False] * len(counters) + [dropped > 0],
            }
        )

    return sketch


def _exact_pass(vals: DataFrame, candidates: DataFrame, k: int) -> DataFrame:
    """Pass 2: exact counts restricted to the candidate set. The
    broadcast is the point — the sketch-bounded candidates hash-join as
    a scan-side filter + partial agg, so the corpus itself is never
    shuffled on the value key; the top-k is a TakeOrderedAndProject,
    never a global sort."""
    return (
        vals.join(candidates.hint("broadcast"), "value")
        .groupBy("value")
        .agg(F.count("*").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("value"))
        .limit(k)
    )


def hll_registers(df: DataFrame, value_col: str, p: int = 9) -> DataFrame:
    """HyperLogLog register table ``(j, rho)`` for ``value_col`` — the
    PORTABLE sketch (Flajolet et al. 2007): hash = md5 (the repo's
    cross-engine hash idiom, see ops/dedup.py), register index j = the
    first 16 hash bits mod m (uniform because m divides 2^16), rho = the
    leading-zero rank of the next 52 hash bits computed as
    ``53 - length(bin(v))`` — pure integer/string ops that evaluate
    identically in Spark and DuckDB, which is what makes the estimate
    oracle-able bit for bit (Spark's own approx_count_distinct is a
    different HLL++ implementation and matches nothing outside the JVM).

    Scale shape: one groupBy(j).max(rho) — map-side partial max means the
    exchange carries at most m rows per input partition regardless of
    corpus size, and register tables MERGE by the same max, so shards /
    days / segments can sketch independently and combine (the property
    ES's cardinality agg relies on)."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16] (m = 2^p registers)")
    m = 1 << p
    h = F.md5(F.col(value_col).cast("string"))
    v = F.conv(F.substring(h, 5, 13), 16, 10).cast("long")
    return (
        df.select(
            (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % m).alias("j"),
            F.when(v == 0, F.lit(53))
            .otherwise(F.lit(53) - F.length(F.bin(v)))
            .cast("long")
            .alias("rho"),
        )
        .groupBy("j")
        .agg(F.max("rho").alias("rho"))
    )


def hll_cardinality(
    df: DataFrame, value_col: str, p: int = 9, with_exact: bool = False
) -> DataFrame:
    """Approximate distinct count of ``value_col`` via the portable HLL
    sketch of :func:`hll_registers` — one row ``(est_r, reg_zeros
    [, n_exact])``. Standard error ≈ 1.04/sqrt(2^p) (~4.6% at p=9).

    Determinism contract: the register sum is kept as the EXACT integer
    ``sum(2^(53 - M))`` — every term is a dyadic integer and the total
    stays under 2^(53+p) < 2^63, so it is overflow-free int64 arithmetic
    in any engine and any partitioning; the bias constant alpha·m²·2^53
    is folded to ONE Python float literal, so the raw estimate is a
    single IEEE division — bit-identical cross-engine. The small-range
    branch (raw ≤ 2.5m with empty registers, Flajolet's linear counting
    ``m·ln(m/zeros)``) is the only libm call and the 4-dp output
    rounding absorbs its last-ulp skew (the repo's established ln rule).

    ``with_exact=True`` attaches the exact distinct count (a full
    shuffle on the value — the verification twin a 100 TB run drops)."""
    m = 1 << p
    num = 0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << 53)
    spark = df.sparkSession
    frame = (
        spark.range(m)
        .select(F.col("id").alias("j"))
        .join(hll_registers(df, value_col, p), "j", "left")
        .select(F.coalesce(F.col("rho"), F.lit(0)).cast("int").alias("M"))
    )
    s = frame.agg(
        F.sum(F.expr("shiftleft(1L, cast(53 - M as int))")).cast("long").alias("s_scaled"),
        F.sum(F.when(F.col("M") == 0, 1).otherwise(0)).cast("long").alias("reg_zeros"),
    )
    raw = F.lit(num) / F.col("s_scaled").cast("double")
    out = s.select(
        F.round(
            F.when(
                (raw <= F.lit(2.5 * m)) & (F.col("reg_zeros") > 0),
                F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("reg_zeros").cast("double")),
            ).otherwise(raw),
            4,
        ).alias("est_r"),
        "reg_zeros",
    )
    if with_exact:
        exact = df.agg(
            F.count_distinct(F.col(value_col).cast("string")).cast("long").alias("n_exact")
        )
        out = out.crossJoin(exact)  # 1 row × 1 row
    return out


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 10,
    capacity: int = 4096,
    require_certified: bool = True,
) -> DataFrame:
    """Exact top-``k`` most frequent values of ``value_col`` without a
    full-vocabulary aggregation: per-partition Misra–Gries candidate
    sketch, then one exact counting pass restricted to the candidates.
    Output ``(value, freq, rank)`` ordered by (freq desc, value asc) —
    the deterministic tiebreak every top-k in this repo uses.

    Certification: any value missing from the candidate set has global
    frequency ≤ N/(capacity+1); if the k-th candidate's exact count is
    strictly above that threshold the returned top-k is provably exact.
    When the inequality fails, ``require_certified=True`` (default)
    raises with the failing numbers and the remedy (raise ``capacity``);
    ``False`` returns the best-effort list for exploratory use.

    Scale shape: pass 1 is a scan with O(capacity) state per partition
    emitting ≤ capacity+1 rows each (survivors + one partition-total
    marker); the distinct over survivors and the join-back shuffle only
    sketch-sized data. Pass 2's groupBy keys are candidates only, so the
    exchange after the map-side partial agg carries ≤ (#partitions ×
    capacity) rows no matter how large the vocabulary is. Nothing ever
    collects to the driver except the two certification scalars."""
    if k < 1:
        raise ValueError("k must be ≥ 1")
    if capacity <= k:
        raise ValueError(
            f"capacity ({capacity}) must exceed k ({k}): the certification "
            "threshold N/(capacity+1) can never sit below the k-th count "
            "otherwise"
        )
    vals = df.select(F.col(value_col).cast("string").alias("value"))
    cap = int(capacity)
    summary = vals.mapInPandas(_sketch_partitions(cap), schema=SKETCH_SCHEMA)
    summary = summary.persist()
    try:
        tot = summary.agg(
            F.sum("n_part").alias("n"), F.max("reduced").alias("any_reduced")
        ).collect()[0]
        n_total = tot["n"] or 0
        any_reduced = bool(tot["any_reduced"])
        candidates = summary.filter(F.col("value").isNotNull()).select("value").distinct()
        rows = _exact_pass(vals, candidates, k).collect()
    finally:
        summary.unpersist()
    threshold = n_total / (cap + 1)
    kth = rows[-1]["freq"] if len(rows) == k else 0
    # no partition ever reduced -> the candidate set IS the vocabulary and
    # the exact pass is unconditionally complete; otherwise the k-th count
    # must clear the miss threshold (strictly — a tie could hide outside)
    certified = (not any_reduced) or (len(rows) == k and kth > threshold)
    if require_certified and not certified:
        raise RuntimeError(
            f"heavy_hitters could not certify the top-{k}: k-th exact count "
            f"{kth} is not above the miss threshold N/(capacity+1) = "
            f"{threshold:.1f} (N={n_total}, capacity={cap}). Raise capacity "
            f"above ~{int(n_total / max(kth, 1)) + 1} and rerun."
        )
    spark = df.sparkSession
    out = spark.createDataFrame(
        [(r["value"], int(r["freq"]), i + 1) for i, r in enumerate(rows)],
        "value string, freq long, rank long",
    )
    return out


# ---- Count-Min sketch (Cormode & Muthukrishnan 2005) --------------------


def _cms_bucket(value_col: str, j: int, w: int):
    """Row-``j`` bucket of a value under the PORTABLE hash idiom (md5
    prefix, the hll_registers/simhash convention): salt the row id into
    the hashed string, take the first 8 hex digits as an integer, mod
    ``w``. Pure integer/string ops that evaluate identically in Spark,
    DuckDB and Python's hashlib."""
    h = F.md5(F.concat(F.lit(f"{j}:"), F.col(value_col).cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % w


def cms_registers(
    df: DataFrame, value_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Count-Min register table ``(j, b, c)``: ``d`` hash rows × ``w``
    buckets, ``c`` = how many input rows hash into the bucket. ONE narrow
    pass: each input row explodes into its ``d`` (row, bucket) pairs and
    a single groupBy aggregates them — map-side partials bound the
    exchange at d·w rows per input partition regardless of corpus size.
    Registers MERGE BY ADDITION (counts are additive), so shards /
    segments / days sketch independently and sum — the same merge story
    as hll_registers (max) and Misra–Gries (counter merge), pytest-
    asserted. All-integer, so estimates are oracle-able bit for bit."""
    if d < 1 or w < 1:
        raise ValueError("need d >= 1 hash rows and w >= 1 buckets")
    pairs = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cms_bucket(value_col, j, w).alias("b"))
            for j in range(d)
        ]
    )
    return (
        # NULLs carry no countable value and would hash to NULL buckets
        # (md5 propagates NULL) — drop them, like the exact-count twin's
        # probe filter does implicitly
        df.filter(F.col(value_col).isNotNull())
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.j").alias("j"), F.col("p.b").alias("b"))
        .groupBy("j", "b")
        .agg(F.count("*").cast("long").alias("c"))
    )


def cms_estimate(
    df: DataFrame,
    value_col: str,
    probes: list[str],
    d: int = 4,
    w: int = 256,
    with_exact: bool = False,
) -> DataFrame:
    """Point-frequency estimates for ``probes`` from the Count-Min sketch
    of ``df[value_col]``: est(v) = min over rows j of register[j][b_j(v)]
    (absent register = 0). The CMS guarantee is one-sided and holds
    DETERMINISTICALLY for any data and hash choice: est ≥ true, since
    every occurrence of v lands in each of v's d buckets. The classic
    ε = e/w overestimate bound is probabilistic over hash draws; with
    the fixed md5 rows it is reported by comparing to the exact count
    (``with_exact`` — the verification twin a 100 TB run drops, leaving
    a d·w-integer summary standing in for the full value distribution).

    Plan: the register table (≤ d·w rows) broadcasts to the probe side;
    nothing here re-shuffles the corpus. Returns (value, est[, n_true]),
    value asc."""
    spark = df.sparkSession
    reg = cms_registers(df, value_col, d, w)
    pdf = spark.createDataFrame([(p,) for p in probes], "value string")
    pb = pdf.select(
        "value",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), _cms_bucket("value", j, w).alias("b"))
                    for j in range(d)
                ]
            )
        ).alias("p"),
    ).select("value", F.col("p.j").alias("j"), F.col("p.b").alias("b"))
    est = (
        pb.join(F.broadcast(reg), ["j", "b"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est"))
    )
    if with_exact:
        exact = (
            df.select(F.col(value_col).cast("string").alias("value"))
            .filter(F.col("value").isin(list(probes)))
            .groupBy("value")
            .agg(F.count("*").cast("long").alias("n_true"))
        )
        est = est.join(exact, "value", "left").select(
            "value", "est", F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true")
        )
    return est.orderBy(F.asc("value"))


def bloom_bits(df: DataFrame, value_col: str, k: int = 4, m: int = 4096) -> DataFrame:
    """Bloom-filter bit set (Bloom 1970) for ``value_col``: one row per
    SET bit position in ``[0, m)`` under ``k`` portable hash rows — the
    same md5 ``'{j}:' || value`` salt idiom as the Count-Min buckets
    (:func:`_cms_bucket` is reused verbatim as the bit function), so the
    whole filter is pure integer/string arithmetic that evaluates
    identically in Spark, DuckDB and hashlib.

    Scale shape: ONE narrow pass — each row explodes into its ``k`` bit
    positions and a ``distinct`` bounds the exchange at ``m`` rows per
    input partition regardless of corpus size (the key space IS the
    filter). Bit sets MERGE BY UNION (bitwise OR) — shards / segments /
    days build independently and `distinct`-union, the same merge story
    as HLL (max) and CMS (add); pytest-asserted. NULLs carry no value
    and would hash to NULL bits (md5 propagates NULL) — dropped, the
    CMS convention."""
    if k < 1 or m < 1:
        raise ValueError("need k >= 1 hash rows and m >= 1 bits")
    bits = F.array(*[_cms_bucket(value_col, j, m) for j in range(k)])
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.explode(bits).alias("bit"))
        .distinct()
    )


def bloom_contains(
    df: DataFrame,
    value_col: str,
    probes: list[str],
    k: int = 4,
    m: int = 4096,
    with_exact: bool = False,
) -> DataFrame:
    """Approximate membership for ``probes`` against the Bloom filter of
    ``df[value_col]``: present(v) = all ``k`` of v's bit positions are
    set. The Bloom guarantee is one-sided and DETERMINISTIC for any data
    and hash choice: **no false negatives** — every occurrence of v sets
    all k of v's bits, so a present value always answers true. False
    positives happen when an absent value's bits are all covered by
    other values; the classic (1 - e^{-kn/m})^k rate is probabilistic
    over hash draws, but for the FIXED md5 rows the answer is a pure
    function of the data — which is what makes the probe table
    oracle-able bit for bit (``with_exact`` attaches the exact count,
    the verification twin a 100 TB run drops).

    Plan: the bit set (≤ m rows) broadcasts to the probe side; nothing
    here re-shuffles the corpus. Returns (value, present[, n_true]),
    value asc."""
    spark = df.sparkSession
    bits = bloom_bits(df, value_col, k, m).withColumn("hit", F.lit(1))
    pdf = spark.createDataFrame([(p,) for p in probes], "value string")
    pb = pdf.select(
        "value",
        F.explode(
            F.array(*[_cms_bucket("value", j, m) for j in range(k)])
        ).alias("bit"),
    )
    out = (
        pb.join(F.broadcast(bits), "bit", "left")
        .groupBy("value")
        .agg((F.min(F.coalesce(F.col("hit"), F.lit(0))) == 1).alias("present"))
    )
    if with_exact:
        exact = (
            df.select(F.col(value_col).cast("string").alias("value"))
            .filter(F.col("value").isin(list(probes)))
            .groupBy("value")
            .agg(F.count("*").cast("long").alias("n_true"))
        )
        out = out.join(exact, "value", "left").select(
            "value",
            "present",
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
        )
    return out.orderBy(F.asc("value"))
