"""Corpus-curation operators: PII redaction and deterministic stratified
sampling — the last-mile steps of a training-data pipeline (after dedup /
quality filtering, before tokenization).

Both are pure Column algebra (JVM-side, whole-stage codegen; no shuffle at
all for redaction, none for sampling either since the filter is a per-row
hash test): at 100 TB they run at scan speed.

The reference has no curation surface (its pipeline is a per-row map into
ES — MessageHandler.java:135-139); these belong to the training-data half
of the engine, like ops/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Patterns stay inside the regex subset Java and RE2 share (char classes,
# bounded repetition, \b, alternation — no backrefs/lookarounds), so the
# DuckDB oracles run the IDENTICAL expressions.
PII_PATTERNS: list[tuple[str, str]] = [
    # order matters: emails first so their digits never half-match phones
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact_pii_col(c: Column) -> Column:
    """The text column with every PII_PATTERNS match replaced by its tag
    (chained regexp_replace — one codegen expression, no UDF)."""
    for pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, text, n_redactions): the redacted text plus how many
    substitutions were made (length-delta count of the inserted tags) —
    the audit column curation pipelines keep."""
    red = redact_pii_col(F.col(text_col))
    # count matches per pattern against the PROGRESSIVELY redacted text so
    # overlapping patterns aren't double-counted (same order as the
    # replacement chain)
    cur = F.col(text_col)
    counts = []
    for pat, tag in PII_PATTERNS:
        counts.append(F.size(F.split(cur, pat, -1)) - 1)
        cur = F.regexp_replace(cur, pat, tag)
    total = counts[0]
    for extra in counts[1:]:
        total = total + extra
    return df.select(
        F.col(id_col).alias("doc_id"),
        red.alias("text"),
        total.cast("long").alias("n_redactions"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum subsampling: keep each row iff a
    portable hash of (id, seed) lands under its stratum's fraction —
    training-mix rebalancing (e.g. downsample boilerplate-heavy sources,
    keep all rare-language docs).

    Unlike ``DataFrame.sampleBy`` (partition-order-dependent RNG), the
    keep decision is a pure function of the row, so the sample is
    reproducible across cluster sizes, AQE re-plans, and engines (the
    md5-prefix → unit-interval trick shared with random_score/simhash).
    Strata missing from ``fractions`` are dropped (fraction 0).
    """
    key = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(int(seed))))
    u = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double") / F.lit(
        4294967296.0
    )
    frac = F.lit(0.0)
    for s, p in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == s, F.lit(float(p))).otherwise(frac)
    return df.filter(u < frac)


def leakage_safe_split(
    df: DataFrame,
    eval_frac: float = 0.1,
    n: int = 8,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Contamination-aware train/eval split: a deterministic hash split
    (the portable md5(id:seed) unit-interval trick shared with
    stratified_sample) proposes an eval set, then every proposed eval
    doc sharing ANY word n-gram shingle with the train side is MOVED
    BACK to train — the final eval set is shingle-disjoint from train
    by construction (the Lee et al. 2022 / GPT-3-appendix n-gram
    leakage rule applied at split time; the fix biases the eval set
    smaller, never contaminated). Docs with < n tokens carry no
    shingles and stay where the hash put them. Returns (doc_id, split)
    for EVERY input doc, split ∈ ('train', 'eval').

    Scale shape: the proposed eval side is eval_frac of the corpus;
    its distinct-shingle set broadcasts, the train shingle stream is
    scanned ONCE against it (left-semi — never a cross join, and the
    train side never shuffles), and the resulting dirty-shingle set —
    ⊆ the eval shingles — broadcasts back to convict eval docs. The
    verdict rides to the full corpus via one left join on doc_id."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import shingle_df

    key = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(int(seed))))
    u = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double") / F.lit(
        4294967296.0
    )
    tagged = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        (u < F.lit(float(eval_frac))).alias("cand"),
    )
    ev = tagged.filter(F.col("cand"))
    tr = tagged.filter(~F.col("cand"))
    ev_sh = shingle_df(ev, "text", "doc_id", n)
    dirty_grams = (
        shingle_df(tr, "text", "doc_id", n)
        .select("shingle")
        .join(F.broadcast(ev_sh.select("shingle").distinct()), "shingle", "left_semi")
        .distinct()
    )
    dirty_docs = (
        ev_sh.join(F.broadcast(dirty_grams), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("dirty", F.lit(True))
    )
    return tagged.join(dirty_docs, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("cand") & F.col("dirty").isNull(), F.lit("eval"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement — Sequential
    Poisson Sampling (Ohlsson 1998, the πps design used by production
    survey/sampling systems): every row gets the key ξ = u / w where u is
    the portable md5(id:seed) unit-interval hash and w its weight; the k
    smallest keys are the sample. Higher weight → smaller expected key →
    proportionally higher inclusion probability. The curation use is
    quality- or length-weighted training-data selection where the pick
    must be reproducible across engines, cluster sizes, and reruns.

    Float identity across engines: u is an integer < 2^32 divided by
    2^32 (both exact in binary64) and ξ is one IEEE-correctly-rounded
    division, so ξ is BIT-identical in any engine that computes w
    identically — no rounding rule needed, unlike the ln/pow form of
    Efraimidis–Espirakis keys. Rows with w ≤ 0 have inclusion
    probability 0 and are excluded (πps semantics).

    Scale shape: a per-row hash + one TakeOrderedAndProject top-k by
    (ξ asc, id asc) — no shuffle beyond the per-partition top-k merge,
    no RNG state, order-independent."""
    if k < 1:
        raise ValueError("k must be ≥ 1")
    key = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(int(seed))))
    u = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double") / F.lit(
        4294967296.0
    )
    w = F.col(weight_col).cast("double")
    return (
        df.filter(w > 0)
        .withColumn("xi", u / w)
        .orderBy(F.asc("xi"), F.asc(id_col))
        .limit(k)
    )


def domain_mix(
    df: DataFrame,
    domain_col: str,
    targets: dict[str, float],
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Static domain-mixture rebalancing — the deployment step of a
    DoReMi/Pile-style mixture spec: downsample each domain so the OUTPUT
    mixture hits ``targets``' proportions at the largest total that
    needs no upsampling.

    With observed counts c_d and normalized target shares t_d, the
    largest feasible output is T = min_d(c_d / t_d); each domain then
    keeps at rate r_d = t_d * T / c_d (the binding domain keeps
    everything, the rest downsample proportionally). The keep decision
    is :func:`stratified_sample`'s portable (id, seed) hash, so the mix
    is deterministic and engine-reproducible; the DuckDB oracle
    recomputes the identical rate arithmetic (keep the ``t*T/c`` and
    ``c/t`` expression shapes in lockstep — float identity matters).
    Domains absent from ``targets`` are dropped.

    Scale shape: ONE count-by-domain aggregation whose key cardinality
    is the mixture spec's size (collected driver-side like the IVF
    centroids — bounded by #domains, never corpus size), then the same
    scan-speed per-row hash filter as stratified_sample. Two passes over
    the input, zero shuffles beyond the count's partial agg."""
    tot = sum(targets.values())
    shares = {d: float(v) / tot for d, v in targets.items()}
    counts = {
        r["d"]: float(r["c"])
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.count("*").alias("c"))
        .collect()
        if r["d"] in shares
    }
    total = min(
        (counts.get(d, 0.0) / v for d, v in shares.items() if v > 0),
        default=0.0,
    )
    rates = {
        d: (v * total / counts[d]) if counts.get(d) else 0.0
        for d, v in shares.items()
    }
    return stratified_sample(df, domain_col, rates, seed=seed, id_col=id_col)


def temperature_mix(
    df: DataFrame,
    domain_col: str,
    alpha: float = 0.5,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-resampled domain mixture — the ``p_d ∝ c_d^alpha``
    flattening rule multilingual LM pipelines use to upweight rare
    domains/languages (XLM-R's alpha=0.3, mT5's alpha=0.3, GPT-style
    corpus reweighting): with ``alpha < 1`` large domains are
    downsampled toward the flattened share while the binding (smallest
    effective) domain keeps everything — output domain sizes end up
    proportional to ``c_d^alpha``.

    Downsample-only realization (no upsampling, like :func:`domain_mix`):
    unnormalized weights w_d = c_d^alpha, feasible total scale
    T = min_d(c_d / w_d), keep rate r_d = min(w_d * T / c_d, 1). The
    normalizer Σ c^alpha cancels symbolically, so it is never computed —
    that's what keeps the rates bit-reproducible in any engine that
    mirrors the same three ops (pow, min, multiply-divide). At
    ``alpha=0.5`` the power is ``sqrt`` — IEEE-correctly-rounded in every
    libm, hence bit-identical cross-engine; other alphas go through
    ``pow`` and are only last-ulp-close, so pin 0.5 where engine
    identity is asserted. Selection is :func:`stratified_sample`'s
    portable (id, seed) hash; NULL domains drop.

    Scale shape: ONE count-by-domain aggregation (key cardinality =
    #domains, collected driver-side) + the scan-speed per-row hash
    filter — identical cost to :func:`domain_mix`."""
    import math

    counts = {
        r["d"]: float(r["c"])
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.count("*").alias("c"))
        .collect()
        if r["d"] is not None
    }
    if not counts:
        return df.filter(F.lit(False))
    w = {
        d: math.sqrt(c) if alpha == 0.5 else math.pow(c, float(alpha))
        for d, c in counts.items()
    }
    t = min(counts[d] / w[d] for d in counts)
    rates = {d: min(w[d] * t / counts[d], 1.0) for d in counts}
    return stratified_sample(df, domain_col, rates, seed=seed, id_col=id_col)


def normalize_unicode(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode NFC normalization — the canonical-composition cleanup
    every pretraining pipeline runs before tokenization (decomposed
    e + U+0301 and precomposed é must tokenize identically).

    Returns (doc_id, text_nfc, changed). Spark has no built-in Unicode
    normalizer, so this is an Arrow-batched ``mapInPandas`` pass over
    Python's ``unicodedata`` (both it and DuckDB's ``nfc_normalize``
    implement UAX #15, so the oracle is byte-exact). One scan, no
    shuffle; the UDF is the documented slow path but runs at Arrow-batch
    granularity, not per row."""
    import unicodedata

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            t = pdf["text"]
            norm = t.map(
                lambda x: None
                if x is None
                else unicodedata.normalize("NFC", x)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "text_nfc": norm,
                    "changed": norm.ne(t) & t.notna(),
                }
            )

    return df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(gen, schema="doc_id long, text_nfc string, changed boolean")


def pack_shards(
    df: DataFrame,
    target_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every doc to a training shard of ~``target_tokens``
    consecutive tokens in stable ``id_col`` order (the step that turns a
    curated corpus into fixed-budget training files):
    ``shard_id = floor(exclusive_prefix_sum(n_tokens) / target)``.

    A naive window cumsum (``sum OVER (ORDER BY id)``) serializes the
    corpus through one task; this uses the same two-pass
    partition-offset technique as ids.assign_dense_ids — range-partition
    + in-partition sort, one column-pruned pass for per-partition token
    SUMS, broadcast exclusive offsets, then an Arrow pass computing
    ``(offset + local_cumsum_exclusive) // target``. All-integer
    arithmetic, deterministic at any parallelism.

    Returns (doc_id, n_tokens, shard_id); token counts use the index
    tokenizer so shard budgets line up with what gets indexed/tokenized.
    """
    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col

    num_partitions = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    arranged = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokenize_col(F.col(text_col))).cast("long").alias("n_tokens"),
        )
        .repartitionByRange(num_partitions, F.col("doc_id"))
        .sortWithinPartitions("doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    sums = {
        r["_pid"]: r["s"]
        for r in arranged.groupBy("_pid").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += int(sums[pid])
    tgt = int(target_tokens)

    def assign(batches):
        local = 0
        for pdf in batches:
            if not len(pdf):
                continue
            base = offsets[int(pdf["_pid"].iloc[0])]
            n = pdf["n_tokens"].to_numpy()
            excl = base + local + n.cumsum() - n
            pdf = pdf.drop(columns=["_pid"])
            pdf["shard_id"] = excl // tgt
            local += int(n.sum())
            yield pdf

    return arranged.mapInPandas(
        assign, schema="doc_id long, n_tokens long, shard_id long"
    )


GOPHER_REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _hash_bucket(c: Column, n_buckets: int) -> Column:
    """Portable token→bucket hash (md5-prefix trick shared with
    stratified_sample / simhash, so DuckDB mirrors it byte-for-byte)."""
    return (
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % int(n_buckets)
    )


def nb_classify(
    df: DataFrame,
    label_col: str = "lang",
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial naive Bayes TRAINED AND APPLIED in one distributed
    pass (resubstitution scoring — the shape a curation pipeline uses
    to bootstrap a domain/language tagger from a labeled seed):

        score(d, l) = ln(n_l/n) + Σ_t tf_dt · ln((c_tl + α)/(c_l + αV))

    with c_tl the token-in-class counts, c_l the class token totals,
    V the corpus vocabulary size, and Laplace smoothing pricing unseen
    (t, l) pairs at (0+α)/(c_l+αV) via a left join + coalesce (the
    lm_importance precedent). Rows with a NULL label are dropped.
    Returns (id, pred, score_r): the argmax class per doc with its
    4-dp-rounded log-posterior — scores are rounded BEFORE the argmax
    (the geo-sort rule: ln ulp + sum order), ties break label asc, so
    the prediction can never flap cross-engine.

    Scale shape: training is two token-keyed aggregations (the df-stats
    cost class); scoring explodes doc tokens × |classes| (a broadcast
    of the class list — |classes| is dozens, not corpus-sized), left
    joins the (t, l) count table on its natural key, and reduces with
    ONE (doc, class)-keyed aggregation + one doc-keyed argmax window
    (hash-partitioned on the doc id)."""
    from pyspark.sql import Window

    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col

    a = float(alpha)
    base = df.filter(F.col(label_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.col(label_col).cast("string").alias("lbl"),
        F.col(text_col).alias("_text"),
    )
    toks = base.select(
        "_id", "lbl", F.explode(tokenize_col(F.col("_text"))).alias("t")
    )
    tf = toks.groupBy("_id", "lbl", "t").agg(
        F.count("*").cast("double").alias("tf")
    )
    ctl = toks.groupBy("t", F.col("lbl").alias("cl")).agg(
        F.count("*").cast("double").alias("ctl")
    )
    cl = toks.groupBy(F.col("lbl").alias("cl")).agg(
        F.count("*").cast("double").alias("c_l")
    )
    v = toks.select("t").distinct().agg(F.count("*").cast("double").alias("v"))
    classes = base.groupBy(F.col("lbl").alias("cl")).agg(
        F.count("*").cast("double").alias("n_l")
    )
    n = base.agg(F.count("*").cast("double").alias("n"))
    # every (doc token, class) pair: broadcast the class list, left join
    # the seen (t, class) counts, price unseen at the alpha floor
    pairs = (
        tf.crossJoin(F.broadcast(classes.select("cl")))
        .join(ctl, ["t", "cl"], "left")
        .join(F.broadcast(cl), "cl")
        .crossJoin(F.broadcast(v))
    )
    contrib = F.col("tf") * F.log(
        (F.coalesce(F.col("ctl"), F.lit(0.0)) + F.lit(a))
        / (F.col("c_l") + F.lit(a) * F.col("v"))
    )
    scores = (
        pairs.groupBy("_id", "cl")
        .agg(F.sum(contrib).alias("s"))
        .join(F.broadcast(classes), "cl")
        .crossJoin(F.broadcast(n))
        .select(
            "_id",
            "cl",
            F.round(
                F.log(F.col("n_l") / F.col("n")) + F.col("s"), 4
            ).alias("score_r"),
        )
    )
    w = Window.partitionBy("_id").orderBy(F.desc("score_r"), F.asc("cl"))
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("cl").alias("pred"),
            "score_r",
        )
    )


def classifier_score(
    df: DataFrame,
    weights: DataFrame,
    n_buckets: int,
    bias: float = 0.0,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """FastText-style hashed linear classifier INFERENCE over the corpus —
    the "apply the quality classifier to everything" pass every
    pretraining pipeline runs after training a tiny supervised model
    (fastText's trick: hash tokens into ``n_buckets`` feature buckets, a
    linear layer over bucket counts, sigmoid): per doc, logit =
    bias + Σ weight[hash(token)], score = sigmoid(logit), keep =
    logit > threshold.

    ``weights`` is the trained (bucket:long, weight:double) table — TINY
    (n_buckets rows), so it broadcasts; the corpus side is one tokenize
    pass + ONE doc-keyed aggregation, the same cost class as
    :func:`dsir_weights`. Tokens hash with the portable md5-prefix
    bucket (shared with DSIR) so any engine reproduces the features.

    Cross-engine exactness guidance: keep decisions compare the LOGIT
    (not the sigmoid) against ``threshold`` — with dyadic-rational
    weights (multiples of 2^-k) the sum is float-EXACT in any engine and
    summation order cannot flip a keep; the sigmoid is display-only
    (round it before asserting equality — exp differs in the last ulp
    across libms). Docs with no tokens score at the bare bias.

    Returns (id, n_tokens, logit, score, keep), one row per input doc."""
    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col

    toks = df.select(
        F.col(id_col),
        F.explode(tokenize_col(F.col(text_col))).alias("tok"),
    )
    per = (
        toks.select(id_col, _hash_bucket(F.col("tok"), n_buckets).alias("bucket"))
        .join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            (
                F.sum(F.coalesce(F.col("weight"), F.lit(0.0)))
                + F.lit(float(bias))
            ).alias("logit"),
        )
    )
    out = df.select(id_col).join(per, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("logit", F.lit(float(bias))).alias("logit"),
    )
    return out.select(
        id_col,
        "n_tokens",
        "logit",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit")))).alias("score"),
        (F.col("logit") > F.lit(float(threshold))).alias("keep"),
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): score every
    raw document by the importance log-ratio ``log p_target(d) −
    log p_raw(d)`` under hashed bag-of-buckets unigram models with add-1
    smoothing — the "make the pretraining mix look like the target
    domain" selector. ``target`` is the (small) in-domain sample; the raw
    model is fit on ``df`` itself. Returns (doc_id, n_tokens, weight,
    selected); ``selected`` = the doc is more target-like than raw-like
    (rounded weight > 0; DSIR's top-k/Gumbel variants threshold the same
    weight column).

    100 TB shape: two token scans feed bucket-count aggregations whose key
    cardinality is ``n_buckets`` (tiny, map-side combined); the per-token
    model lookup is a BROADCAST join of the n_buckets-row log-ratio table;
    the only doc-keyed shuffle is the final per-doc sum. Nothing driver-
    side scales with the corpus. Deterministic at any parallelism: the
    weight is a sum of per-bucket counts × a fixed ratio table, not a
    float left-fold over row order.
    """
    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col

    B = int(n_buckets)
    spark = df.sparkSession

    def buckets_of(frame: DataFrame, with_id: bool) -> DataFrame:
        cols = [F.col(id_col).alias("doc_id")] if with_id else []
        toks = frame.select(*cols, F.explode(tokenize_col(F.col(text_col))).alias("tok"))
        return toks.withColumn("bucket", _hash_bucket(F.col("tok"), B)).drop("tok")

    raw_tok = buckets_of(df, with_id=True)
    tgt_tok = buckets_of(target, with_id=False)
    raw_b = raw_tok.groupBy("bucket").agg(F.count("*").alias("cr"))
    tgt_b = tgt_tok.groupBy("bucket").agg(F.count("*").alias("ct"))
    dom = spark.range(B).select(F.col("id").alias("bucket"))
    stats = (
        dom.join(raw_b, "bucket", "left")
        .join(tgt_b, "bucket", "left")
        .fillna(0, subset=["cr", "ct"])
    )
    totals = stats.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )  # 1-row aggregate — the only crossJoin, same pattern as the engine
    ratio = stats.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("ct") + 1.0) / (F.col("nt") + F.lit(float(B))))
            - F.log((F.col("cr") + 1.0) / (F.col("nr") + F.lit(float(B))))
        ).alias("lr"),
    )
    per_doc = (
        raw_tok.groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("c"))
        .join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("lr")).alias("_s"),
        )
        # round like SQL engines round doubles: a tiny NEGATIVE sum rounds
        # to NEGATIVE zero (DuckDB/IEEE keep the sign; Spark's round goes
        # through BigDecimal and loses it, which made a -1e-5 weight hash
        # as +0.0 here and -0.0 in the oracle — found at sf0.1, a
        # pre-round-6 seam). Selection is unaffected (-0.0 > 0 is False).
        .select(
            "doc_id",
            "n_tokens",
            F.when(
                (F.round(F.col("_s"), 4) == 0.0) & (F.col("_s") < 0.0),
                F.lit(-0.0),
            )
            .otherwise(F.round(F.col("_s"), 4))
            .alias("weight"),
        )
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    out = base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("weight", F.lit(0.0)).alias("weight"),
    )
    return out.withColumn("selected", F.col("weight") > 0)


def _words(c: Column) -> Column:
    """Whitespace words (``\\S+`` runs) of the coalesced text column."""
    return F.regexp_extract_all(F.coalesce(c, F.lit("")), F.lit(r"\S+"), F.lit(0))


def _lines(c: Column) -> Column:
    return F.split(F.coalesce(c, F.lit("")), "\n", -1)


def _occurrences(c: Column, needle: str) -> Column:
    s = F.coalesce(c, F.lit(""))
    return (F.length(s) - F.length(F.replace(s, F.lit(needle), F.lit("")))) / F.lit(
        len(needle)
    )


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, appendix A1.1):
    per-doc word count, mean word length, symbol-to-word ratio (``#`` and
    ``...``), bullet-start / ellipsis-end line fractions, fraction of
    words with at least one alphabetic character, and the count of
    distinct required stopwords present — plus the conjunctive ``keep``
    decision. Defaults are the paper's thresholds; every threshold is a
    keyword so corpora with different registers can re-pin the operating
    point without forking the features.

    100 TB shape: pure Column algebra over one projection — no shuffle,
    no UDF, whole-stage codegen at scan speed (same class as
    quality_features). The reference has no quality surface; this is the
    training-data half of the engine (like ops/textstats.py).
    """
    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col

    c = F.col(text_col)
    words = _words(c)
    n_words = F.size(words)
    mean_wl = F.aggregate(F.transform(words, F.length), F.lit(0), lambda a, x: a + x) / F.greatest(
        n_words, F.lit(1)
    )
    symbol_ratio = (_occurrences(c, "#") + _occurrences(c, "...")) / F.greatest(
        n_words, F.lit(1)
    )
    lines = _lines(c)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^(•|- |\* )"))
    ) / n_lines
    ellipsis_frac = F.size(
        F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))
    ) / n_lines
    alpha_frac = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / F.greatest(
        n_words, F.lit(1)
    )
    toks = tokenize_col(c)
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS]),
            lambda s: F.array_contains(toks, s),
        )
    )
    feats = df.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        n_stop.cast("long").alias("n_req_stopwords"),
    )
    keep = (
        F.col("n_words").between(int(min_words), int(max_words))
        & F.col("mean_word_len").between(float(min_mean_word_len), float(max_mean_word_len))
        & (F.col("symbol_ratio") <= float(max_symbol_ratio))
        & (F.col("bullet_frac") <= float(max_bullet_frac))
        & (F.col("ellipsis_frac") <= float(max_ellipsis_frac))
        & (F.col("alpha_word_frac") >= float(min_alpha_word_frac))
        & (F.col("n_req_stopwords") >= int(min_stopwords))
    )
    return feats.withColumn("keep", keep)


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020, §2.2): keep only lines
    that end in a terminal punctuation mark (``.!?"``), contain at least
    ``min_words_per_line`` words, and do not mention "javascript"; then
    drop whole pages with fewer than ``min_kept_lines`` surviving lines,
    any page containing "lorem ipsum", and any page containing ``{``
    (the paper's code-page heuristic).

    Returns (doc_id, n_lines, n_kept, clean_text, keep) — clean_text is
    the surviving lines rejoined, so downstream stages (tokenize, dedup,
    pack) consume the cleaned bytes.

    100 TB shape: one projection with higher-order array functions
    (split / filter / array_join fused by codegen) — no shuffle, no UDF,
    no explode; runs at scan speed and preserves input partitioning.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    lines = _lines(F.col(text_col))

    def _line_ok(l: Column) -> Column:
        words_ok = F.size(
            F.filter(F.split(l, " "), lambda w: F.length(w) > 0)
        ) >= int(min_words_per_line)
        return (
            F.rtrim(l).rlike('[.!?"]$')
            & words_ok
            & ~F.lower(l).contains("javascript")
        )

    kept = F.filter(lines, _line_ok)
    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
        (
            (F.size(kept) >= int(min_kept_lines))
            & ~F.lower(c).contains("lorem ipsum")
            & ~c.contains("{")
        ).alias("keep"),
    )
    return out


def chunk_windows(
    df: DataFrame,
    max_len: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking: split each document's whitespace token
    stream into ``max_len``-token windows advancing by a stride of
    ``max_len - overlap`` — the sequence-preparation step for
    fixed-context training and embedding pipelines (every token lands in
    at least one chunk; consecutive chunks share ``overlap`` tokens of
    context). Docs at most ``max_len`` tokens long yield one chunk; the
    final chunk may be shorter than ``max_len``; empty docs yield none.

    Per chunk: (id, chunk_idx, chunk_text, n_tokens), chunk_idx counting
    from 0 in stream order.

    100 TB shape: pure Column algebra — ONE projection builds the chunk
    array per row (sequence/transform/slice fused by whole-stage
    codegen), ONE bounded posexplode (≈ n_tokens/stride rows per doc);
    no shuffle, no UDF, runs at scan speed and partitions inherit the
    input's layout."""
    if overlap >= max_len:
        raise ValueError(f"overlap ({overlap}) must be < max_len ({max_len})")
    stride = int(max_len) - int(overlap)
    w = F.split(F.col(text_col), " ")
    # n_chunks = 1 + ceil(max(n - max_len, 0) / stride); 0 when the doc is empty
    extra = F.greatest(F.size(w) - F.lit(int(max_len)), F.lit(0))
    n_chunks = F.lit(1) + F.ceil(extra / F.lit(float(stride))).cast("int")
    empty = F.col(text_col).isNull() | (F.length(F.col(text_col)) == 0)
    chunks = F.when(empty, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - F.lit(1)),
            lambda i: F.array_join(
                F.slice(w, i * F.lit(stride) + F.lit(1), int(max_len)), " "
            ),
        )
    )
    out = (
        df.select(F.col(id_col).cast("long").alias("doc_id"), chunks.alias("cs"))
        .select("doc_id", F.posexplode("cs").alias("chunk_idx", "chunk_text"))
        .select(
            F.col("doc_id").alias(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            "chunk_text",
            F.size(F.split(F.col("chunk_text"), " ")).cast("long").alias("n_tokens"),
        )
    )
    return out


def keep_rate_threshold(
    df: DataFrame,
    score_col: str,
    keep_rate: float,
    buckets: int = 1024,
) -> DataFrame:
    """Calibrate a quality-gate cutoff for a target keep rate: the
    threshold t such that keeping ``score >= t`` retains (at least) a
    ``keep_rate`` fraction of the corpus — the knob-tuning step every
    score-based curation gate (classifier_score, dsir_weights, gopher
    features) needs before it can run at a stated budget.

    The threshold is the k-th LARGEST element of the score multiset
    (k = max(1, floor(keep_rate·n)) — an exact order statistic, no
    interpolation), found by two-pass distributed selection instead of a
    global sort (the scale-killer a naive row_number would plan):

    1. one 1-row aggregate (n, min, max);
    2. fixed-width bucket histogram — ONE groupBy whose key cardinality
       is ``buckets``, map-side partials, driver walks the ≤``buckets``
       counts to find the bucket holding the k-th element;
    3. the exact rank within ONLY that bucket via
       TakeOrderedAndProject(limit = k − count_above) — bounded by the
       boundary bucket's size, so the corpus is never globally sorted.
       (Degenerate case to know about: a score taking ONE atomic value
       puts everything in one bucket and the limit degrades toward k —
       raise ``buckets`` or pre-quantize if your score is that coarse.)

    Since the threshold is an element of the multiset, a SQL oracle's
    naive ``row_number() = k`` recomputation matches it exactly whenever
    the upstream score column itself is cross-engine exact. Ties at the
    threshold keep MORE than k docs (score >= t is a pure value
    predicate — deterministic, partition-independent); ``n_kept``
    reports the realized count honestly.

    Returns ONE row: (n_docs, k_target, threshold DOUBLE, n_kept).
    """
    if not 0.0 < keep_rate <= 1.0:
        raise ValueError("keep_rate must be in (0, 1]")
    # NaN is not NULL: Spark's max() ranks it above everything, which
    # would poison mn/mx/width and make the calibration silently return
    # (NaN, 0) — drop it like NULL
    s = df.select(F.col(score_col).cast("double").alias("score")).filter(
        F.col("score").isNotNull() & ~F.isnan("score")
    )
    stats = s.agg(
        F.count("*").alias("n"), F.min("score").alias("mn"), F.max("score").alias("mx")
    ).collect()[0]
    n, mn, mx = int(stats["n"]), stats["mn"], stats["mx"]
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame(
            [(0, 0, None, 0)],
            "n_docs long, k_target long, threshold double, n_kept long",
        )
    k = max(1, int(keep_rate * n))
    if mn == mx:
        thr = float(mn)
    else:
        width = (mx - mn) / buckets
        b = F.least(
            F.floor((F.col("score") - F.lit(mn)) / F.lit(width)).cast("long"),
            F.lit(buckets - 1),
        )
        hist = {
            r["b"]: r["c"]
            for r in s.groupBy(b.alias("b")).agg(F.count("*").alias("c")).collect()
        }
        c_above, bb = 0, None
        for bi in sorted(hist, reverse=True):
            if c_above + hist[bi] >= k:
                bb = bi
                break
            c_above += hist[bi]
        rows = (
            s.filter(b == bb)
            .orderBy(F.desc("score"))
            .limit(k - c_above)
            .collect()
        )
        thr = float(rows[-1]["score"])
    n_kept = s.filter(F.col("score") >= thr).count()
    return spark.createDataFrame(
        [(n, k, thr, int(n_kept))],
        "n_docs long, k_target long, threshold double, n_kept long",
    )


def filter_funnel(df: DataFrame, stages: list[tuple[str, str]]) -> DataFrame:
    """Per-stage attrition report for an ORDERED filter chain — the
    observability table every large cleaning run needs ("which rule ate
    my corpus?"), reporting for each stage how many docs reached it, how
    many it dropped, how many survived, and its local drop rate.

    Semantics: stages apply in order; a doc is charged to the FIRST
    stage whose predicate it fails, exactly as if the filters ran
    sequentially. A NULL predicate drops the row (Spark/SQL filter
    semantics: WHERE keeps only TRUE) — ``coalesce(pred, FALSE)`` pins
    that in both engines.

    Scale shape: ONE corpus pass, not S passes — each row computes its
    first-failing stage index as a single codegen'd CASE cascade, one
    tiny groupBy counts the ≤ S+1 buckets, and the funnel algebra
    (prefix sums) runs driver-side on that bounded result. All counts
    are exact integers; drop_rate is ONE IEEE division per stage
    (NULL when the stage saw nothing).

    ``stages``: ordered (name, sql_predicate) pairs — predicates are SQL
    expression strings so callers (and oracles) share literals. Returns
    (stage_idx, stage, n_in, n_dropped, n_out, drop_rate), stage order.
    """
    if not stages:
        raise ValueError("filter_funnel needs at least one stage")
    names = [n for n, _ in stages]
    if len(set(names)) != len(names):
        raise ValueError("stage names must be unique")
    ff = None
    for i, (_, pred) in enumerate(stages):
        cond = ~F.coalesce(F.expr(pred), F.lit(False))
        ff = F.when(cond, F.lit(i)) if ff is None else ff.when(cond, F.lit(i))
    ff = ff.otherwise(F.lit(len(stages)))
    counts = {
        int(r["ff"]): int(r["n"])
        for r in df.select(ff.alias("ff"))
        .groupBy("ff")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = sum(counts.values())
    rows = []
    n_in = total
    for i, (name, _) in enumerate(stages):
        dropped = counts.get(i, 0)
        rate = float(dropped) / float(n_in) if n_in > 0 else None
        rows.append((i, name, n_in, dropped, n_in - dropped, rate))
        n_in -= dropped
    return df.sparkSession.createDataFrame(
        rows,
        "stage_idx int, stage string, n_in long, n_dropped long, "
        "n_out long, drop_rate double",
    )
