"""Text analysis for training-data curation — all Column algebra except the
rolling-hash fingerprint (one Arrow-batched kernel).

* language-ID: stopword-hit-ratio heuristic (English stopword list);
* quality scoring: length / punctuation / stopword / alpha ratios;
* token counting: whitespace and BPE-ish regex counts;
* document fingerprinting: 64-bit polynomial rolling hash of the token
  stream (content-defined identity that survives re-serialization).

These run before the index build in a curation pipeline; they share the
index tokenizer (analysis.py) so "tokens" means the same thing everywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col

EN_STOPWORDS = (
    "the of and to in a is that it for on as are with be this was at by an "
    "or from has had have not but they you his her its we our their"
).split()

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def ws_token_count(c: Column) -> Column:
    """Whitespace token count (0 for empty/blank) — count of \\S+ runs."""
    return F.size(F.regexp_extract_all(F.coalesce(c, F.lit("")), F.lit(r"\S+"), F.lit(0)))


def bpe_token_count(c: Column) -> Column:
    """BPE-ish token count: letter runs + digit runs + individual symbols."""
    return F.size(F.regexp_extract_all(F.coalesce(c, F.lit("")), F.lit(BPE_PATTERN), F.lit(0)))


def stopword_ratio(c: Column) -> Column:
    toks = tokenize_col(c)
    hits = F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(c: Column) -> Column:
    s = F.coalesce(c, F.lit(""))
    n_punct = F.length(s) - F.length(F.regexp_replace(s, r"[^\w\s]", ""))
    return n_punct / F.greatest(F.length(s), F.lit(1))


def alpha_ratio(c: Column) -> Column:
    s = F.coalesce(c, F.lit(""))
    return (
        F.length(F.regexp_replace(s, r"[^A-Za-z]", "")) / F.greatest(F.length(s), F.lit(1))
    )


def mean_token_len(c: Column) -> Column:
    toks = tokenize_col(c)
    total = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, x: a + x)
    return total / F.greatest(F.size(toks), F.lit(1))


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy (nats) of the unigram term
    distribution — a repetition/templating quality signal (low entropy =
    repetitive text; the distributional cousin of the Gopher top-n-gram
    coverage features). Computed in the algebraically expanded form
    ``H = ln(dl) − (Σ tf·ln tf)/dl`` — ONE division by dl, so both
    engines share the same float-op sequence and only the Σ's
    accumulation order differs (absorbed by 4-dp display rounding
    downstream). Single-term docs get exactly 0; docs with no tokens
    are dropped (no distribution to measure). Returns
    (id_col, dl long, entropy double).

    Scale shape: one tokenize pass, one (doc, term)-keyed aggregation,
    one doc-keyed aggregation — per-doc keys, no global skew, no
    window, no collect."""
    toks = df.select(
        F.col(id_col), F.explode(tokenize_col(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").cast("double").alias("tf"))
    agg = tf.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("dl"),
        F.sum(F.col("tf") * F.log(F.col("tf"))).alias("s"),
    )
    return agg.select(
        F.col(id_col),
        F.col("dl"),
        (
            F.log(F.col("dl").cast("double")) - F.col("s") / F.col("dl").cast("double")
        ).alias("entropy"),
    )


def ngram_diversity(
    df: DataFrame,
    ns: tuple[int, ...] = (1, 2, 3),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus n-gram diversity — the distinct-N metric (Li et al. 2016,
    "A Diversity-Promoting Objective Function for Neural Conversation
    Models") at corpus scale: for each n, the number of DISTINCT token
    n-grams over the TOTAL n-gram occurrences. Low distinct-2/3 =
    templated/repetitive corpus — the aggregate cousin of the per-doc
    token_entropy signal. Returns (n, total_ngrams, distinct_ngrams,
    ratio) with ratio = ONE IEEE division of two exact
    integers-as-doubles — bit-identical cross-engine, no rounding.
    Docs shorter than n tokens contribute nothing at that n.

    Scale shape per n: one tokenize pass + an n-gram explode (the
    shingle_df construction WITHOUT the per-doc distinct — totals need
    every occurrence) + ONE aggregate (count + count DISTINCT). The ns
    are unioned — |ns| passes, each aggregation-only."""
    out = None
    for n in ns:
        toks = tokenize_col(F.col(text_col))
        m = F.size(toks) - (int(n) - 1)
        idx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(
            F.array().cast("array<int>")
        )
        gram = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(int(n))]
            ),
        )
        grams = df.select(F.explode(gram).alias("g"))
        row = grams.agg(
            F.lit(int(n)).alias("n"),
            F.count("*").cast("long").alias("total_ngrams"),
            F.countDistinct("g").cast("long").alias("distinct_ngrams"),
        ).select(
            "n",
            "total_ngrams",
            "distinct_ngrams",
            (
                F.col("distinct_ngrams").cast("double")
                / F.col("total_ngrams").cast("double")
            ).alias("ratio"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("n")


def zipf_fit(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", top_n: int = 100
) -> DataFrame:
    """Zipf-exponent fit of the corpus term-frequency distribution:
    closed-form OLS of y = ln(freq) on x = ln(rank) over the ``top_n``
    most frequent terms (rank = freq desc, term asc — a total order).
    Natural-language corpora sit near slope ≈ −1 (Zipf 1949); a mix
    drifting toward templated/duplicated text steepens the head — a
    corpus-health analytic next to :func:`corpus_drift`.

    Returns ONE row (slope, intercept, n_terms). slope =
    (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx), intercept = (Σy − slope·Σx)/n —
    the sums run over ≤ top_n values, so accumulation-order ulp is
    absorbed by 4-dp display rounding downstream.

    Scale shape: one tokenize pass + one term-keyed count, then
    TakeOrderedAndProject for the top_n head (never a global sort); the
    rank window runs over ≤ top_n rows (the accepted ≤k-row window),
    and the OLS is one 1-row aggregate."""
    toks = df.select(F.explode(tokenize_col(F.col(text_col))).alias("term"))
    freqs = (
        toks.groupBy("term")
        .agg(F.count("*").cast("double").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(int(top_n))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    xy = freqs.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("freq")).alias("y"),
    )
    agg = xy.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
        F.col("n").cast("long").alias("n_terms"),
    )


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc curation features + a composite [0,1] quality score."""
    c = F.col(text_col)
    feats = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.coalesce(c, F.lit(""))).alias("n_chars"),
        ws_token_count(c).alias("n_tokens_ws"),
        bpe_token_count(c).alias("n_tokens_bpe"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(alpha_ratio(c), 6).alias("alpha_ratio"),
        F.round(mean_token_len(c), 6).alias("mean_token_len"),
    )
    # composite: in-range length, some stopwords, mostly alphabetic, sane punctuation
    score = (
        F.when((F.col("n_chars") >= 20) & (F.col("n_chars") <= 20000), 0.25).otherwise(0.0)
        + F.when(F.col("stopword_ratio") >= 0.05, 0.25).otherwise(0.0)
        + F.when(F.col("alpha_ratio") >= 0.5, 0.25).otherwise(0.0)
        + F.when(F.col("punct_ratio") <= 0.2, 0.25).otherwise(0.0)
    )
    return feats.withColumn("quality", F.round(score, 2))


def lang_guess(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: 'en' when the English-stopword hit ratio
    clears 5%, else 'other'. (N-gram models plug in the same shape: a
    per-language score column + greatest().)"""
    c = F.col(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(stopword_ratio(c) >= 0.05, F.lit("en")).otherwise(F.lit("other")).alias("lang_guess"),
    )


# Character-trigram language profiles (Cavnar & Trenkle 1994 n-gram
# category shape, presence-weighted): each language's most frequent
# function-word trigrams, space-delimited forms included. Small public
# profile set — en/fr/de/es; the scoring is integer occurrence counting,
# so cross-engine results are exact with no float seam anywhere.
# The non-English profiles are chosen collision-free against the fixture
# corpus's trigram space (so English docs can never pick up foreign
# points from corpus words like "part"/"column"); English's profile
# leans on the/er/ha trigrams the corpus is rich in.
LANG_TRIGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", " an", "and", "nd ", " of", "of ", " to",
           "to ", " in", "is ", "ing", "ng ", " be", "er ", " re", " on",
           "on ", "es ", " wi", "ith", " it", " ha"),
    "fr": (" le", " la", " et", "et ", " un", " vo", "vou", "ous", "est",
           "ez ", "dan", "ans", " av", "vez", " ce", "ces", " au", "aux",
           "ait", "ais", "eur", "oir", " je", "our"),
    "de": (" de", "die", "ie ", "und", "das", "ist", " ni", "nic", "ich",
           " ei", "ein", "sch", "cht", " si", "sin", " ge", "zu ", "den",
           "gen", "ung", "aus", "ben", " zu", " un"),
    "es": (" el", "el ", "los", " y ", " es", "sta", "con", "ara", " un",
           "una", "ado", " ca", "asa", "rro", " pe", "ero", " ga", "ato",
           "ban", "iga", "nte", "ien", "mig", "per"),
}


def lang_guess_trigram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    profiles: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Trigram-profile language ID (Cavnar & Trenkle 1994): score(doc,
    lang) = how many character-trigram OCCURRENCES of the lowercased text
    appear in the language's profile; the doc's language is the argmax
    (ties by lang asc), or 'und' when NO profile trigram occurs.

    100 TB shape: the profile table (|langs| × ~24 rows) is broadcast;
    the doc side is one explode → join → (doc, lang) aggregation and the
    per-doc argmax is a struct-min aggregation (map-side combinable, no
    window sort) — the percolate plan shape. Scores are integer counts,
    so the DuckDB oracle matches exactly. Sub-3-char docs take an
    explicit empty-array branch: ``sequence(1, length(s) - 2)`` would
    DESCEND for them (the _grams lesson).

    Returns (doc_id, lang, score) one row per input doc."""
    prof = profiles or LANG_TRIGRAM_PROFILES
    spark = df.sparkSession
    rows = [(lang, tri) for lang, tris in sorted(prof.items()) for tri in tris]
    pdf = F.broadcast(spark.createDataFrame(rows, "lang string, tri string"))
    # project the lowered string ONCE (the lambda bodies otherwise
    # re-evaluate lower() per element); guard the <3-char case with an
    # explicit empty branch instead of filter(sequence(...)) so only one
    # index array is built per row (sequence(1,0) descends — never emit it)
    lowered = df.select(
        F.col(id_col).alias("doc_id"),
        F.lower(F.coalesce(F.col(text_col), F.lit(""))).alias("s"),
    )
    tris = F.expr(
        "CASE WHEN length(s) >= 3 THEN "
        "transform(sequence(1, length(s) - 2), i -> substring(s, i, 3)) "
        "ELSE array() END"
    )
    t = lowered.select("doc_id", F.explode(tris).alias("tri"))
    scores = t.join(pdf, "tri").groupBy("doc_id", "lang").agg(
        F.count("*").cast("long").alias("score")
    )
    # argmax(score) ties lang asc as ONE struct-min aggregation (struct
    # comparison is lexicographic: smallest -score = largest score, then
    # smallest lang) — map-side combinable, no window sort
    best = (
        scores.groupBy("doc_id")
        .agg(
            F.min(
                F.struct((-F.col("score")).alias("ns"), F.col("lang").alias("lang"))
            ).alias("m")
        )
        .select(
            "doc_id",
            F.col("m.lang").alias("lang"),
            (-F.col("m.ns")).cast("long").alias("score"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .distinct()
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("lang", F.lit("und")).alias("lang"),
            F.coalesce("score", F.lit(0)).cast("long").alias("score"),
        )
    )


def _grams(toks: DataFrame, n: int) -> DataFrame:
    """(doc_id, g) — every overlapping word n-gram of the token array
    (docs shorter than n contribute nothing). The size>=n filter guards
    sequence(): Spark's sequence(a, b) counts DOWN when b < a."""
    return toks.filter(F.size("w") >= n).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(w) - {n}), "
                f"i -> concat_ws(' ', slice(w, i + 1, {n})))"
            )
        ).alias("g"),
    )


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", table A1 — the standard
    web-corpus repetition filters):

    * ``top2_frac`` / ``top3_frac`` — fraction of the doc's tokens
      covered by its single most frequent word 2-gram / 3-gram
      (count·n / n_tokens, capped at 1.0 — self-overlapping grams like
      "c c" in a run of c's would otherwise exceed the token count);
      boilerplate and chant-like spam score high;
    * ``dup5_frac`` — duplicate 5-gram fraction: of all overlapping
      5-gram occurrences, the fraction that are repeats of an earlier
      one ((total − distinct) / total) — high for copy-paste loops.

    Docs with fewer tokens than n get 0 for that feature. 100 TB shape:
    one tokenize pass, then per-n groupBys keyed on (doc_id[, gram]) —
    map-side partial aggregation, no skew (keys are per-doc), and the
    final assembly is doc_id-keyed left joins Catalyst plans as one
    shuffle stage per feature."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokenize_col(F.col(text_col)).alias("w")
    )
    base = toks.select("doc_id", F.size("w").cast("long").alias("n_tokens"))
    tops = []
    for n in (2, 3):
        mx = (
            _grams(toks, n)
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("c"))
            .groupBy("doc_id")
            .agg(F.max("c").alias(f"_mx{n}"))
        )
        tops.append(mx)
    d5 = (
        _grams(toks, 5)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("_tot5"),
            F.count_distinct("g").alias("_dst5"),
        )
    )
    out = base.join(tops[0], "doc_id", "left").join(tops[1], "doc_id", "left").join(
        d5, "doc_id", "left"
    )
    return out.select(
        "doc_id",
        "n_tokens",
        F.round(
            F.least(
                F.lit(1.0),
                F.coalesce(F.col("_mx2") * 2.0 / F.col("n_tokens"), F.lit(0.0)),
            ),
            6,
        ).alias("top2_frac"),
        F.round(
            F.least(
                F.lit(1.0),
                F.coalesce(F.col("_mx3") * 3.0 / F.col("n_tokens"), F.lit(0.0)),
            ),
            6,
        ).alias("top3_frac"),
        F.round(
            F.coalesce(
                (F.col("_tot5") - F.col("_dst5")) / F.col("_tot5").cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("dup5_frac"),
    )


FP_SCHEMA = "doc_id long, fingerprint long"
_FP_BASE = np.uint64(1099511628211)  # FNV-ish odd multiplier
_FP_OFFSET = np.uint64(14695981039346656037)


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit polynomial rolling hash over the token stream.

    fp(d) = Σ_i hash(tok_i) · BASE^(n-1-i)  (mod 2^64) — order-sensitive,
    whitespace-normalization-invariant. Token hashes are xxhash64 JVM-side;
    the positional reduction is one vectorized segment-product kernel that
    runs as a STREAMING Arrow pass over doc-sorted partitions (mapInPandas
    with a doc-boundary carry, same pattern as ops/dedup.simhash — a
    grouped applyInPandas would instantiate pandas once per document).
    """
    spark = df.sparkSession
    num = spark.sparkContext.defaultParallelism
    th = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokenize_col(F.col(text_col))).alias("pos", "term"),
        )
        .select("doc_id", "pos", F.xxhash64("term").alias("h"))
        .repartition(num, "doc_id")
        .sortWithinPartitions("doc_id", "pos")
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["doc_id"].to_numpy()
        pos = pdf["pos"].to_numpy().astype(np.int64)
        h = pdf["h"].to_numpy().astype(np.uint64)
        uniq, starts, counts = np.unique(ids, return_index=True, return_counts=True)
        n_per = np.repeat(counts, counts)
        local = pos  # pos is already 0-based per doc
        exp = (n_per - 1 - local).astype(np.uint64)
        # BASE^exp via binary exponentiation, vectorized over all tokens
        result = np.ones_like(exp)
        base = np.full_like(exp, _FP_BASE)
        e = exp.copy()
        while e.any():
            odd = (e & np.uint64(1)).astype(bool)
            result[odd] *= base[odd]
            e >>= np.uint64(1)
            base *= base
        fp = np.add.reduceat(h * result, starts)
        return pd.DataFrame({"doc_id": uniq, "fingerprint": fp.astype(np.int64)})

    def gen(batches):
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            ids = pdf["doc_id"].to_numpy()
            boundary = np.flatnonzero(ids != ids[-1])
            last_start = int(boundary[-1] + 1) if boundary.size else 0
            carry = pdf.iloc[last_start:]
            head = pdf.iloc[:last_start]
            if len(head):
                yield kernel(head)
        if carry is not None and len(carry):
            yield kernel(carry)

    return th.mapInPandas(gen, schema=FP_SCHEMA)


def _lm_counts(
    docs: DataFrame, text_col: str, id_col: str, analyzer: str
) -> tuple[DataFrame, DataFrame, DataFrame, float]:
    """(pairs, uni, big, vocab) for an add-0.5 Laplace bigram LM: the
    per-doc adjacent-pair stream, the unigram and bigram count tables,
    and the vocabulary size (the only driver scalar)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_col(F.col(text_col), analyzer).alias("w"),
    )
    uni = (
        toks.select(F.explode("w").alias("u"))
        .groupBy("u")
        .agg(F.count("*").cast("double").alias("c1"))
    )
    vocab = float(uni.count())
    # guard size>=2 BEFORE sequence(): Spark's sequence(a, b) counts DOWN
    # when b < a, which would fabricate pairs for 1-token docs
    pairs = (
        toks.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1), "
                    "i -> struct(w[i - 1] AS w1, w[i] AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    big = pairs.groupBy("w1", "w2").agg(F.count("*").cast("double").alias("c2"))
    return pairs, uni, big, vocab


def lm_doc_quality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "standard",
    ref_docs: DataFrame | None = None,
) -> DataFrame:
    """Per-document bigram-LM negative log-likelihood — the CCNet-style
    perplexity proxy used to quality-filter web-scale training corpora
    (low nll = fluent/common phrasing, high = gibberish or boilerplate
    soup). Returns (doc_id, nll, n_bigrams) for docs with >= 2 tokens.

    Model: the same add-0.5 Laplace bigram LM the phrase suggester uses
    (engine.suggest_phrase / index/lm.py) — P(w2|w1) = (big(w1,w2)+0.5)
    / (uni(w1)+0.5·V). By default counts come from the scored corpus
    itself (every doc bigram exists in the tables, inner joins).  With
    ``ref_docs`` the LM trains on THAT corpus instead and scores these
    docs under it: bigrams/unigrams unseen in the reference left-join to
    NULL and coalesce to 0, so Laplace smoothing prices them exactly as
    the model demands (unseen pair under unseen w1 → P = 1/V).

    100 TB shape: one tokenize pass feeds (a) the unigram aggregation
    and (b) the adjacent-pair stream; pair probabilities attach via a
    join on the bigram key against the Zipf-bounded bigram-count table
    (map-side partial aggregation on both counts, AQE picks
    broadcast vs shuffle by the table's real size), then one per-doc
    aggregation. No driver-side data-plane collect — the only scalar is
    V (one count())."""
    pairs, uni, big, vocab = _lm_counts(docs, text_col, id_col, analyzer)
    if ref_docs is None:
        nll = -F.log((F.col("c2") + 0.5) / (F.col("c1") + 0.5 * vocab))
        scored = pairs.join(big, ["w1", "w2"]).join(uni, pairs["w1"] == uni["u"])
    else:
        _, uni, big, vocab = _lm_counts(ref_docs, text_col, id_col, analyzer)
        nll = -F.log(
            (F.coalesce(F.col("c2"), F.lit(0.0)) + 0.5)
            / (F.coalesce(F.col("c1"), F.lit(0.0)) + 0.5 * vocab)
        )
        scored = pairs.join(big, ["w1", "w2"], "left").join(
            uni, pairs["w1"] == uni["u"], "left"
        )
    return scored.groupBy("doc_id").agg(
        F.avg(nll).alias("nll"),
        F.count("*").cast("long").alias("n_bigrams"),
    )


def lm_importance_scores(
    docs: DataFrame,
    target_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "standard",
) -> DataFrame:
    """Contrastive LM importance for domain-targeted data selection
    (CCNet, Wenzek et al. 2020; the LM-based sibling of the hashed-
    feature DSIR in ops/curation.dsir_select): score = nll under the
    BACKGROUND LM (the corpus itself) − nll under the TARGET-domain LM.
    Positive = the doc reads more like the target domain than like the
    background — importance-sample by it to tilt a 100 TB crawl toward
    a small high-quality target set. Returns (doc_id, nll_bg,
    nll_target, score) for docs with ≥ 2 tokens.

    Scale shape: two lm_doc_quality passes sharing the pair stream's
    shape (the target LM's count tables are target-sized, typically
    broadcastable), joined once on doc_id."""
    bg = lm_doc_quality(docs, text_col, id_col, analyzer).select(
        "doc_id", F.col("nll").alias("nll_bg")
    )
    tg = lm_doc_quality(
        docs, text_col, id_col, analyzer, ref_docs=target_docs
    ).select("doc_id", F.col("nll").alias("nll_target"))
    return bg.join(tg, "doc_id").select(
        "doc_id",
        "nll_bg",
        "nll_target",
        (F.col("nll_bg") - F.col("nll_target")).alias("score"),
    )


def doc_keyterms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TF-IDF keyword extraction: each document's top-``k`` terms by
    ``tf · ln((N+1)/(df+1))`` (the classic smoothed idf — never negative,
    never divides by zero), ties by term ascending. The corpus-wide
    sibling of the per-query-doc term selection more_like_this does
    (query/multifield.py _mlt_select): MLT picks ONE doc's salient terms
    at query time; this materializes them for every doc — the standard
    keyword/tag-extraction prep step.

    Output: (doc_id, term, tf, score_r, rank), rank 1-based per doc.
    The sort key is rounded to 4 dp BEFORE ordering (the geo-sort rule:
    engines' libm ln may differ in the last ulp, and ranking on the
    rounded key with the term-asc tiebreak makes the order identical
    across engines instead of merely close).

    Scale shape: one tokenize pass → ONE (doc, term) groupBy for tf →
    ONE term-keyed groupBy for df (map-side partials; hot terms are the
    skewed keys AQE splits) → join back on the term key (co-partitioned
    with the df groupBy — exchange reuse) → ONE doc-keyed window for the
    per-doc top-k. No all-pairs, no global sort, no driver state; the
    df dictionary never materializes driver-side."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(tokenize_col(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_docs = df.select(F.col(id_col)).distinct().count()
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(
            F.col("tf").cast("double")
            * F.log((F.lit(float(n_docs + 1))) / (F.col("df").cast("double") + 1.0)),
            4,
        ).alias("score_r"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_r"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select("doc_id", "term", "tf", "score_r", "rank")
    )


def pmi_pairs(
    df: DataFrame,
    top_n: int = 20,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Collocation extraction: the corpus's top-``top_n`` adjacent-token
    pairs by pointwise mutual information,
    ``pmi = ln(c_ab·N·N / (P·c_a·c_b))`` (p(ab)=c_ab/P over the pair
    stream, p(a)=c_a/N over the token stream), restricted to pairs seen
    ≥ ``min_count`` times (rare-pair PMI is noise). The token-statistics
    sibling of significant_terms: that finds terms over-represented in a
    match set, this finds PAIRS over-represented vs independence —
    phrase-dictionary / tokenizer-merge-candidate mining for a training
    pipeline. Sort key rounded to 4 dp BEFORE ordering (the geo-sort
    rule), ties by pair ascending.

    Output: (pair, n_pair, pmi_r) — ``pair`` is the "t1 t2" string, the
    same adjacent-pair stream the suggester LM persists (index/lm.py).

    Scale shape: one tokenize pass feeds both streams; unigram and pair
    counts are ONE groupBy each (map-side partials, Zipf-skewed hot keys
    are AQE-splittable); the two scalar totals reduce to one row each;
    component counts join back on the term key; the final order is
    TakeOrderedAndProject over the min_count survivors. No window over
    the corpus, no driver-side dictionary."""
    w = tokenize_col(F.col(text_col))
    toks = df.select(w.alias("w"))
    uni = (
        toks.select(F.explode("w").alias("t"))
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(w) >= 2 THEN "
                "transform(sequence(0, size(w) - 2), "
                "i -> concat(w[i], ' ', w[i + 1])) "
                "ELSE array() END"
            )
        ).alias("pair")
    )
    pc = (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= int(min_count))
    )
    n_tok = toks.select(F.sum(F.size("w")).cast("double").alias("n")).collect()[0]["n"]
    n_pairs = toks.select(
        F.sum(F.greatest(F.size("w") - 1, F.lit(0))).cast("double").alias("p")
    ).collect()[0]["p"]
    ua = uni.select(F.col("t").alias("t1"), F.col("c").alias("c1"))
    ub = uni.select(F.col("t").alias("t2"), F.col("c").alias("c2"))
    scored = (
        pc.withColumn("t1", F.split("pair", " ")[0])
        .withColumn("t2", F.split("pair", " ")[1])
        .join(ua, "t1")
        .join(ub, "t2")
        .select(
            "pair",
            "n_pair",
            F.round(
                F.log(
                    F.col("n_pair").cast("double")
                    * F.lit(float(n_tok))
                    * F.lit(float(n_tok))
                    / (
                        F.lit(float(n_pairs))
                        * F.col("c1").cast("double")
                        * F.col("c2").cast("double")
                    )
                ),
                4,
            ).alias("pmi_r"),
        )
    )
    return scored.orderBy(F.desc("pmi_r"), F.asc("pair")).limit(int(top_n))


def bpe_merges(
    df: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    max_vocab: int = 1_000_000,
) -> "list[tuple[int, str, str, int]]":
    """BPE tokenizer-vocabulary induction (Sennrich et al. 2016, the
    word-level trainer GPT-2-style tokenizers use): learn the top
    ``n_merges`` byte-pair merges over the corpus. Deterministic: each
    round merges the pair with the highest summed word count, ties
    broken lexicographically on (left, right).

    Returns [(rank, left, right, count), ...] (a driver-side list — the
    merge table IS driver-sized by definition; callers persist it like a
    codebook).

    Scale shape — the honest split every real BPE trainer uses: the
    corpus-sized work is ONE distributed groupBy(word).count() (map-side
    partials; Zipf-hot words are AQE-splittable), because pair counts
    are a function of the WORD-FREQUENCY dictionary, not the corpus.
    The merge loop then runs driver-side over that dictionary, which is
    vocabulary-sized — bounded by ``max_vocab`` with a loud error, the
    MAX_EXPANSION_SCAN rule, never a silent OOM. Words are the standard
    analyzer's tokens so "symbol" means the same thing as everywhere
    else in the engine."""
    wc = (
        df.select(F.explode(tokenize_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    n_vocab = wc.count()
    if n_vocab > max_vocab:
        raise ValueError(
            f"BPE word dictionary has {n_vocab} entries > max_vocab="
            f"{max_vocab}; raise the cap deliberately or pre-filter "
            "(the merge loop holds the dictionary driver-side)"
        )
    rows = wc.collect()
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        key = tuple(r["w"])
        vocab[key] = vocab.get(key, 0) + int(r["c"])
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, int(n_merges) + 1):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (lhs, rhs), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, lhs, rhs, cnt))
        merged = lhs + rhs
        nxt: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == lhs and sym[i + 1] == rhs:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + c
        vocab = nxt
    return merges


def bpe_pair_counts(
    df: DataFrame,
    top_n: int = 30,
    text_col: str = "text",
) -> DataFrame:
    """Symbol-pair statistics over the word-frequency dictionary — the
    round-1 counting pass of a BPE trainer (the distributed half of
    :func:`bpe_merges`), kept fully declarative so it runs at corpus
    scale: overlapping adjacent character pairs per word, weighted by
    word frequency ("aaa" contributes (a,a) twice per occurrence, the
    Sennrich counting rule the merge loop uses).

    Output: (l, r, pair_cnt) ordered by pair_cnt desc then (l, r) asc
    — a total order, so top_n truncation is deterministic.

    Scale shape: ONE corpus-sized groupBy(word) with map-side partials
    collapses the token stream to the dictionary; everything after is
    dictionary-sized. The per-word pair expansion is pure Column
    algebra (filter(sequence)+transform, no UDF) and the final cut is
    TakeOrderedAndProject, never a global sort."""
    wc = (
        df.select(F.explode(tokenize_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    # positions 1..len-1; filter() (not sequence(1, len-1)) because Spark's
    # sequence(1, 0) is the DESCENDING [1, 0], not empty, for 1-char words
    pairs = wc.select(
        F.explode(
            F.expr("filter(sequence(1, length(w)), i -> i < length(w))")
        ).alias("i"),
        "w",
        "c",
    ).select(
        F.expr("substring(w, i, 1)").alias("l"),
        F.expr("substring(w, i + 1, 1)").alias("r"),
        "c",
    )
    out = pairs.groupBy("l", "r").agg(F.sum("c").cast("long").alias("pair_cnt"))
    return out.orderBy(F.desc("pair_cnt"), F.asc("l"), F.asc("r")).limit(int(top_n))


def bpe_encode(
    df: DataFrame,
    merges: "list[tuple[int, str, str, int]]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned BPE merge table (from :func:`bpe_merges`) to every
    document and report per-doc tokenizer statistics:
    (doc_id, n_words, n_bpe_tokens, fertility_r) where fertility is
    chars-per-BPE-token rounded to 4 dp (the geo-sort rounding rule).

    The encoder is PURE Column algebra — no UDF, whole-stage codegen:
    each word is rendered with double delimiters ('|c||c||c|') and each
    merge (l, r) in rank order is ONE left-to-right non-overlapping
    ``replace('|l||r|' -> '|lr|')`` pass, which is exactly the greedy
    per-round pass the trainer's re-segmentation loop runs (and what
    subword-nmt's encoder does), so trainer and encoder agree by
    construction. The double delimiter makes adjacent matches share no
    characters, so non-overlapping replace == greedy BPE. Token count
    falls out as delimiter-count/2 — pure integer arithmetic that any
    SQL engine reproduces byte-identically.

    Scale shape: one tokenize pass, per-row string algebra, ONE
    groupBy(doc_id) with map-side partials. No dictionary join, no
    driver loop, no shuffle beyond the final per-doc agg."""
    for _, lhs, rhs, _c in merges:
        if not (lhs.isalnum() and rhs.isalnum()):
            raise ValueError(f"non-alphanumeric merge symbol: {(lhs, rhs)!r}")
    expr = (
        "concat('|', array_join(transform(sequence(1, length(w)), "
        "i -> substring(w, i, 1)), '||'), '|')"
    )
    for _, lhs, rhs, _c in merges:
        expr = f"replace({expr}, '|{lhs}||{rhs}|', '|{lhs}{rhs}|')"
    n_tok = f"CAST((length({expr}) - length(replace({expr}, '|', ''))) / 2 AS BIGINT)"
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_col(F.col(text_col))).alias("w"),
    )
    per_word = words.select(
        "doc_id", F.expr(n_tok).alias("nt"), F.length("w").alias("nc")
    )
    return (
        per_word.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("nt").cast("long").alias("n_bpe_tokens"),
            F.round(
                F.sum("nc").cast("double") / F.sum("nt").cast("double"), 4
            ).alias("fertility_r"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every token k-gram with the
    engine's PORTABLE 60-bit md5-prefix hash, slide a w-hash window, and
    keep the minimum hash of each window; the fingerprint is the doc's
    DISTINCT selected-hash set. Winnowing's guarantee: any shared
    substring of at least k + w - 1 tokens yields at least one shared
    fingerprint, so a fingerprint equi-join finds plagiarism/copy
    candidates without all-pairs comparison — the positional variant's
    rightmost-tie rule only affects positions, which the value-set form
    drops, so both engines agree without a tie rule.

    Returns exploded (doc_id, fp) rows — join-ready, like the LSH band
    tables. Scale shape: per-doc pure Column algebra (k-gram hashing +
    per-window array_min inside codegen, ~dl windows per doc), one
    distinct; candidate discovery is then ONE fp-keyed self-join, the
    same bucketed shape as minhash banding."""
    if k < 1 or w < 1:
        raise ValueError("winnow_fingerprints needs k >= 1 and w >= 1")
    toks = tokenize_col(F.col(text_col))
    grams = F.expr(
        f"transform(filter(sequence(1, greatest(size(toks), 1)), "
        f"i -> i <= size(toks) - {int(k)} + 1), "
        f"i -> array_join(slice(toks, i, {int(k)}), ' '))"
    )
    hashes = F.expr(
        "transform(grams, g -> CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT))"
    )
    wins = F.expr(
        f"array_distinct(transform(filter(sequence(1, greatest(size(hs), 1)), "
        f"j -> j <= size(hs) - {int(w)} + 1), "
        f"j -> array_min(slice(hs, j, {int(w)}))))"
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .select("doc_id", grams.alias("grams"))
        .select("doc_id", hashes.alias("hs"))
        .select("doc_id", F.explode(wins).alias("fp"))
    )


def corpus_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Training-data drift check between two corpus snapshots/slices:
    Jensen-Shannon divergence (nats) between their unigram term
    distributions, plus vocabulary sizes and overlap — the standard QA
    gate before swapping a data source or accepting a new crawl dump
    into a training mix. One row:
    (n_tokens_a, n_tokens_b, vocab_a, vocab_b, vocab_shared, jsd_r).

    JSD = 0.5·KL(P‖M) + 0.5·KL(Q‖M), M = (P+Q)/2, natural log, terms
    absent from one side contribute only the other side's half (the
    p·ln(2p/(p+q)) form is 0-safe at p=0). Bounded by ln 2.

    Scale shape: each side is ONE tokenize pass + ONE groupBy(term) with
    map-side partials; the comparison is a full-outer join on the
    vocabulary (vocab-sized, not corpus-sized) and a single-row
    aggregate. Nothing is collected until the final row."""
    ca = unigram_counts(df_a, text_col).withColumnRenamed("c", "c_a")
    cb = unigram_counts(df_b, text_col).withColumnRenamed("c", "c_b")
    return drift_between_counts(ca, cb)


def unigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(t, c) unigram counts of a corpus slice — ONE tokenize pass + ONE
    groupBy; the reusable half of :func:`corpus_drift` (the streaming
    drift monitor computes the baseline side once and reuses it)."""
    return (
        df.select(F.explode(tokenize_col(F.col(text_col))).alias("t"))
        .groupBy("t")
        .agg(F.count("*").cast("double").alias("c"))
    )


def drift_between_counts(ca: DataFrame, cb: DataFrame) -> DataFrame:
    """JSD + vocab stats from two precomputed count tables (t, c_a) and
    (t, c_b) — see :func:`corpus_drift` for semantics."""
    j = ca.join(cb, "t", "full_outer").select(
        "t",
        F.coalesce("c_a", F.lit(0.0)).alias("c_a"),
        F.coalesce("c_b", F.lit(0.0)).alias("c_b"),
    )
    tot = j.agg(
        F.sum("c_a").alias("na"), F.sum("c_b").alias("nb")
    )
    scored = j.crossJoin(F.broadcast(tot)).select(
        "t", "c_a", "c_b",
        (F.col("c_a") / F.col("na")).alias("p"),
        (F.col("c_b") / F.col("nb")).alias("q"),
    )
    term_kl = (
        F.when(F.col("p") > 0,
               F.col("p") * F.log(2.0 * F.col("p") / (F.col("p") + F.col("q"))))
        .otherwise(F.lit(0.0))
        + F.when(F.col("q") > 0,
                 F.col("q") * F.log(2.0 * F.col("q") / (F.col("p") + F.col("q"))))
        .otherwise(F.lit(0.0))
    )
    return scored.agg(
        F.sum("c_a").cast("long").alias("n_tokens_a"),
        F.sum("c_b").cast("long").alias("n_tokens_b"),
        F.sum((F.col("c_a") > 0).cast("long")).alias("vocab_a"),
        F.sum((F.col("c_b") > 0).cast("long")).alias("vocab_b"),
        F.sum(((F.col("c_a") > 0) & (F.col("c_b") > 0)).cast("long")).alias("vocab_shared"),
        F.round(F.sum(term_kl) * 0.5, 6).alias("jsd_r"),
    )


def heaps_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_checkpoints: int = 8,
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (Heaps 1978): V(N) ≈ k·N^β, the
    closed-form OLS of ln V on ln N over ``n_checkpoints`` corpus
    prefixes (prefix = docs with id ≤ an evenly spaced threshold).
    Natural text sits near β ≈ 0.4–0.6; templated/duplicated corpora
    flatten toward 0 — the growth-side sibling of :func:`zipf_fit`'s
    frequency-side exponent. The vocabulary is counted over word
    ``n``-grams (default bigrams) so growth stays measurable even on a
    small closed unigram vocabulary.

    Scale shape: ONE gram pass feeds two aggregations — per-gram
    min(doc_id) (the "first seen" table, vocabulary-sized) and per-doc
    gram counts — then each prefix's (V, N) is a conditional sum in ONE
    1-row aggregate per table; no per-checkpoint corpus passes, no
    window, no sort. The ≤``n_checkpoints``-point OLS runs driver-side
    in checkpoint order; 4-dp rounding downstream absorbs ln/sum-order
    ulp (the zipf_fit rule).

    Returns ONE row (beta, intercept, n_points, vocab_total,
    grams_total).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokenize_col(F.col(text_col)).alias("w")
    )
    grams = _grams(toks, n)
    mx_row = df.agg(F.max(F.col(id_col)).alias("mx")).collect()[0]
    spark = df.sparkSession
    out_schema = (
        "beta double, intercept double, n_points long, "
        "vocab_total long, grams_total long"
    )
    if mx_row["mx"] is None:
        return spark.createDataFrame([(None, None, 0, 0, 0)], out_schema)
    mx = int(mx_row["mx"])
    k = int(n_checkpoints)
    ts = sorted({(i * mx) // k for i in range(1, k + 1)} - {0})
    first = grams.groupBy("g").agg(F.min("doc_id").alias("fid"))
    dc = grams.groupBy("doc_id").agg(F.count("*").alias("m"))
    vrow = first.agg(
        *[F.sum((F.col("fid") <= t).cast("long")).alias(f"v{i}") for i, t in enumerate(ts)]
    ).collect()[0]
    nrow = dc.agg(
        *[
            F.sum(F.when(F.col("doc_id") <= t, F.col("m")).otherwise(0))
            .cast("long")
            .alias(f"n{i}")
            for i, t in enumerate(ts)
        ]
    ).collect()[0]
    import math

    pts = []
    for i in range(len(ts)):
        v, nn = vrow[f"v{i}"] or 0, nrow[f"n{i}"] or 0
        if v > 0 and nn > 0:
            pts.append((math.log(float(nn)), math.log(float(v))))
    if len(pts) < 2:
        return spark.createDataFrame(
            [(None, None, len(pts), int(vrow[f"v{len(ts)-1}"] or 0),
              int(nrow[f"n{len(ts)-1}"] or 0))],
            out_schema,
        )
    np_ = float(len(pts))
    sx = sy = sxy = sxx = 0.0
    for x, y in pts:  # checkpoint order — the deterministic sequential fold
        sx += x
        sy += y
        sxy += x * y
        sxx += x * x
    beta = (np_ * sxy - sx * sy) / (np_ * sxx - sx * sx)
    intercept = (sy - beta * sx) / np_
    return spark.createDataFrame(
        [(
            float(beta), float(intercept), len(pts),
            int(vrow[f"v{len(ts)-1}"] or 0), int(nrow[f"n{len(ts)-1}"] or 0),
        )],
        out_schema,
    )
