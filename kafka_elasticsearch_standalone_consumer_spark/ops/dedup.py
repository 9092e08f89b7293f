"""Deduplication operators for large-scale training-data pipelines.

Four families, all declarative-first so Catalyst owns the physical plan:

* **exact**    — hash-groupBy on the normalized text (one shuffle);
* **n-gram Jaccard** — shingle-explode + self-join on shared shingles
  (never a cross join: candidate generation only touches pairs that share
  at least one shingle, which is also how it survives 100 TB);
* **MinHash + LSH** — per-doc signatures as pure Column aggregates
  (k multiply-shift permutations over ``xxhash64(shingle)``), banded into
  buckets, candidate pairs from a bucket self-join, verified with exact
  Jaccard. No Python in the signature path at all.
* **SimHash** — 64-bit tf-weighted sign fingerprint via one Arrow-batched
  ``applyInPandas`` over collected (hash, tf) pairs; near-dup candidates by
  banding the fingerprint into 16-bit chunks (Hamming ≤ 3 ⇒ some chunk equal).

The reference has no dedup (its pipeline is a pure per-row map), but any
engine replacing its ES sink at 10^12-doc scale needs these before
indexing; they reuse the same tokenizer as the index path (analysis.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: keep the min id per distinct text.

    One hash shuffle on the (long) text; at scale hash the text first
    (``sha2``) so the shuffle key is 32 bytes, not the document.
    """
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("text_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def shingle_df(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, shingle) — distinct word n-gram shingles per document.

    Token n-grams via a zero-copy arrays_zip of shifted slices (no UDF).
    Documents with < n tokens produce no shingles.
    """
    toks = tokenize_col(F.col(text_col))
    df = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    m = F.size(F.col("toks")) - (n - 1)
    # sequence(1, m) counts DOWN when m < 1 (yielding index 0 → runtime
    # error in element_at) — docs shorter than n tokens must produce an
    # EMPTY shingle list instead
    idx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(
        F.array().cast("array<int>")
    )
    shingle = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(F.col("toks"), i + j) for j in range(n)]),
    )
    return (
        df.select("doc_id", F.explode(F.array_distinct(shingle)).alias("shingle"))
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard ≥ threshold.

    Candidate pairs come from a self-join on shared shingles (docs with no
    common shingle are never paired). Cost is Σ_shingle df² over shingle
    document frequencies — LINEAR in total postings only while no shingle
    is hot; one boilerplate shingle shared by a million crawl pages makes
    the join quadratic. ``max_df`` is the guard: shingles with df >
    ``max_df`` are dropped from the shingle universe BEFORE the join
    (stoplist semantics — sizes and intersections are computed over the
    surviving shingles, so the reported Jaccard is over the capped sets;
    a hot shingle carries ~zero dedup signal, exactly like a stopword,
    but pairs whose overlap was ONLY hot shingles are no longer found —
    that is the documented recall trade). The hot set is tiny by Zipf, so
    it rides a broadcast anti-join. At 100 TB set ``max_df`` like the
    posting build sets its salting threshold; default None preserves the
    exact semantics for the oracle entry. Intersection size is a count per
    pair; set sizes join in to finish |A∩B| / (|A|+|B|-|A∩B|).
    """
    sh = shingle_df(df, text_col, id_col, n)
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > int(max_df))
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sh = sh.persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "id1").withColumnRenamed("sz", "sz1"), "id1")
        .join(sizes.withColumnRenamed("doc_id", "id2").withColumnRenamed("sz", "sz2"), "id2")
        .withColumn("jaccard", F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 32,
) -> DataFrame:
    """(doc_id, sig array<long>) — k-permutation MinHash, pure Column algebra.

    Permutation i is min over shingles of ``xxhash64(i, shingle)`` (a fresh
    salted 64-bit hash per permutation — no arithmetic that could overflow
    under ANSI mode). One groupBy shuffle produces all k mins as parallel
    aggregates; map-side partial aggregation keeps the shuffle at k longs
    per doc.
    """
    sh = shingle_df(df, text_col, id_col, n)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"m{i}") for i in range(k)
    ]
    sigs = sh.groupBy("doc_id").agg(*aggs)
    return sigs.select("doc_id", F.array(*[f"m{i}" for i in range(k)]).alias("sig"))


def banded_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
) -> DataFrame:
    """(doc_id, band, bh) — the banded LSH form of the MinHash signature:
    band i's hash is one xxhash64 over its ``k/bands`` signature slots.
    Two docs are LSH candidates iff they share a (band, bh) pair — the
    standard S-curve bucketing, shared by the ad-hoc pair finder and the
    persisted incremental store."""
    rows = k // bands
    sigs = minhash_signatures(df, text_col, id_col, n, k)
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.xxhash64(*[F.col("sig")[bi * rows + j] for j in range(rows)]).alias("bh"),
                )
                for bi in range(bands)
            ])
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bh")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash→LSH candidate pairs, verified by exact Jaccard ≥ threshold.

    bands×rows = k; a pair lands in a bucket iff one band of the signature
    matches exactly (standard S-curve). Candidates are then verified, so
    the output has no false positives; false negatives follow the S-curve
    (with k=32, b=8: P(candidate) ≈ 1-(1-j⁴)⁸ — >99% at j≥0.7).
    """
    banded = banded_signatures(df, text_col, id_col, n, k, bands)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )
    # verify candidates with exact Jaccard: the intersection is a
    # SHINGLE-KEYED equi-join — each shared shingle matches exactly once
    # (shingle_df is distinct per doc), so the count is |A∩B| with cost
    # Σ shared shingles. (The old form joined both docs' full shingle
    # sets on id alone and filtered s1==s2, materializing |A|×|B| rows
    # per candidate pair — quadratic in document length, guide §3.3's
    # exploding-join trap.)
    sh = shingle_df(df, text_col, id_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    j = (
        cand.join(sh.withColumnRenamed("doc_id", "id1"), "id1")
        .join(sh.select(F.col("doc_id").alias("id2"), "shingle"), ["id2", "shingle"])
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("inter"))
        .join(sizes.withColumnRenamed("doc_id", "id1").withColumnRenamed("sz", "sz1"), "id1")
        .join(sizes.withColumnRenamed("doc_id", "id2").withColumnRenamed("sz", "sz2"), "id2")
        .withColumn("jaccard", F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )
    return j


SIMHASH_SCHEMA = "doc_id long, simhash long"


def portable_term_hash():
    """60-bit md5-prefix term hash over the exploded ``term`` column,
    reproducible bit-for-bit in standard SQL engines (DuckDB:
    ``('0x' || substr(md5(term), 1, 15))::BIGINT``). Used where an external
    oracle must recompute the simhash exactly; ``xxhash64`` stays the
    production default (JVM-native, no hex-string math)."""
    return F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10).cast("long")


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", hash_expr=None
) -> DataFrame:
    """(doc_id, simhash) — 64-bit tf-weighted sign fingerprint.

    ``hash_expr`` optionally replaces the per-term hash (a Column over the
    exploded ``term`` column, e.g. :func:`portable_term_hash`); the default
    is ``xxhash64(term)``.

    Term hashes and tfs are computed JVM-side; the 64-lane weighted
    bit-sum runs as a STREAMING Arrow kernel over doc-sorted partitions
    (mapInPandas with a doc-boundary carry — a grouped applyInPandas would
    instantiate pandas once per document, ~1000× the invocation overhead
    for the same math; the kernel itself is segment-vectorized over every
    doc in a batch via ``np.add.reduceat``).
    """
    spark = df.sparkSession
    num = spark.sparkContext.defaultParallelism
    h = hash_expr if hash_expr is not None else F.xxhash64("term")
    th = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tokenize_col(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .select("doc_id", h.alias("h"), "tf")
        .repartition(num, "doc_id")
        .sortWithinPartitions("doc_id")
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["doc_id"].to_numpy()
        h = pdf["h"].to_numpy().astype(np.uint64)
        tf = pdf["tf"].to_numpy().astype(np.float64)
        uniq, starts = np.unique(ids, return_index=True)
        # bits: (n_terms, 64) ±tf contributions, segment-summed per doc
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.float64)
        contrib = (2.0 * bits - 1.0) * tf[:, None]
        sums = np.add.reduceat(contrib, starts, axis=0)
        fp = ((sums > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )
        return pd.DataFrame({"doc_id": uniq, "simhash": fp.astype(np.int64)})

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

    return th.mapInPandas(gen, schema=SIMHASH_SCHEMA)


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    hash_expr=None,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Candidate generation: band the 64-bit fingerprint into 4×16-bit chunks —
    any pair within Hamming ≤ 3 must agree on ≥1 chunk (pigeonhole), so a
    4-way chunk self-join finds all of them without a cross join (EXACT for
    max_hamming ≤ 3, not probabilistic).
    """
    fp = simhash(df, text_col, id_col, hash_expr=hash_expr)
    banded = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk"),
                    (F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF))).alias("cv"),
                )
                for i in range(4)
            ])
        ).alias("c"),
    ).select("doc_id", "simhash", "c.chunk", "c.cv")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            F.col("a.simhash").alias("h1"),
            F.col("b.simhash").alias("h2"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )


def _sym_edges(e: DataFrame) -> DataFrame:
    """Canonical symmetric edge set: both directions, no self loops,
    distinct — the representation both CC algorithms share."""
    return (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _star_contraction(edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): the
    O(log n)-round CC algorithm whose round count is independent of
    component DIAMETER — the fallback when min-label propagation's
    O(diameter) bound is adversarial (long chains of pairwise near-dups).

    * large-star: every node reroutes its strictly LARGER neighbors to
      the min of its closed neighborhood — one min-aggregate + one join,
      both keyed on the node id.
    * small-star: every node connects its smaller-or-equal neighbors
      (and itself) to that min over its down-edges — same two shuffles.

    Each round halves tall structures; at the fixpoint every component
    is a star rooted at its min id. Convergence is an exact edge-set
    comparison (count + exceptAll — pair-graph-sized, tiny next to the
    corpus), and ``localCheckpoint`` truncates the iterative lineage
    like the label-propagation path.

    Takes/returns the canonical symmetric edge set; the result's
    down-edges (u > v) map every non-root node to its component root.
    """
    edges = edges.localCheckpoint()
    for _ in range(max_rounds):
        # large-star: (v, m(u)) for v ∈ Γ(u), v > u; m = min(Γ⁺(u))
        m = (
            edges.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
        )
        large = (
            edges.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        after_large = _sym_edges(large)
        # small-star over down-edges: (v, m(u)) for v ∈ Γ(u), v < u, plus
        # (u, m(u)) — m = min of the down-neighborhood
        down = after_large.filter(F.col("v") < F.col("u"))
        m2 = down.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            down.join(m2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(m2.select("u", F.col("m").alias("v")))
        )
        new_edges = _sym_edges(small).localCheckpoint()
        if new_edges.count() == edges.count() and new_edges.exceptAll(edges).isEmpty():
            return new_edges
        edges = new_edges
    raise RuntimeError(
        f"star contraction did not converge in {max_rounds} rounds — "
        "O(log n) bound exceeded; the edge input is likely unstable"
    )


def dup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 20,
    method: str = "auto",
) -> DataFrame:
    """Connected components over a near-dup pair graph →
    ``(doc_id, cluster_id)`` for EVERY document, where ``cluster_id`` is
    the min doc id in the component (singletons label themselves) — the
    step that turns pairwise dedup output into "keep one per cluster".

    ``method``:

    * ``label`` — min-label propagation: every node starts labeled with
      its own id; each round takes the min label over the closed
      neighborhood. Fixpoint in O(component diameter) rounds — the right
      shape for near-dup clusters, which are shallow. Per round: one
      join of the label table to the edge list + one min-aggregate — two
      shuffles keyed on doc id, both map-side combinable. Raises after
      ``max_iters`` rounds.
    * ``star`` — alternating large-star/small-star contraction (Kiveris
      et al. SoCC'14): O(log n) rounds regardless of diameter, built
      from the same join primitive (see :func:`_star_contraction`).
    * ``auto`` (default) — label propagation first; if the diameter
      bound trips, fall back to star contraction instead of failing.

    ``localCheckpoint`` truncates the iterative lineage so the plan
    stays bounded; convergence checks are exact counts, deterministic
    throughout.
    """
    if method not in ("auto", "label", "star"):
        raise ValueError(f"unknown dup_clusters method: {method}")
    e = pairs.select(F.col("id1").alias("u"), F.col("id2").alias("v"))
    edges = _sym_edges(e).persist()
    all_ids = df.select(F.col(id_col).alias("id"))

    def _finish(labeled: DataFrame) -> DataFrame:
        edges.unpersist()
        return labeled

    if method != "star":
        labels = all_ids.select("id", F.col("id").alias("lbl"))
        converged = False
        for _ in range(max_iters):
            nbr = (
                edges.join(
                    labels.select(F.col("id").alias("v"), F.col("lbl").alias("lbl_v")),
                    "v",
                )
                .groupBy("u")
                .agg(F.min("lbl_v").alias("nbr_min"))
                .withColumnRenamed("u", "id")
            )
            stepped = labels.join(nbr, "id", "left").select(
                "id",
                F.col("lbl"),
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_min"), F.col("lbl"))
                ).alias("new_lbl"),
            )
            stepped = stepped.localCheckpoint()
            if stepped.filter(F.col("new_lbl") < F.col("lbl")).count() == 0:
                converged = True
                break
            labels = stepped.select("id", F.col("new_lbl").alias("lbl"))
        if converged:
            return _finish(
                stepped.select(
                    F.col("id").alias("doc_id"), F.col("new_lbl").alias("cluster_id")
                )
            )
        if method == "label":
            raise RuntimeError(
                f"dup_clusters did not converge in {max_iters} rounds — "
                "component diameter exceeds the bound; use method='star'"
            )
    # adversarial diameter (or method='star'): O(log n) star contraction
    stars = _star_contraction(edges)
    roots = (
        stars.filter(F.col("v") < F.col("u"))
        .groupBy("u")
        .agg(F.min("v").alias("root"))
        .select(F.col("u").alias("id"), F.col("root"))
    )
    return _finish(
        all_ids.join(roots, "id", "left").select(
            F.col("id").alias("doc_id"),
            F.coalesce(F.col("root"), F.col("id")).alias("cluster_id"),
        )
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Training-data decontamination: flag train docs sharing ≥
    ``min_hits`` distinct word n-grams with ANY test/benchmark doc — the
    standard n-gram-overlap leakage scan run before LLM training
    (n = 8–13 in practice; callers pick n to match their eval suite).

    Returns ``(doc_id, n_shingles, n_test_docs)`` per contaminated train
    doc: how many distinct shingles leaked and how many test docs they
    touch. Shape: two shingle explosions + ONE equi-join on the shingle —
    candidate generation only touches shared shingles (never a cross
    join), and the test side's distinct-shingle set is benchmark-sized
    (millions of rows vs the corpus's trillions), so Spark broadcasts it
    and the train side never shuffles.
    """
    tr = shingle_df(train, text_col, id_col, n)
    te = (
        shingle_df(test, text_col, id_col, n)
        .select("shingle", F.col("doc_id").alias("test_id"))
        .distinct()
    )
    return (
        tr.join(te, "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shingles"),
            F.countDistinct("test_id").alias("n_test_docs"),
        )
        .filter(F.col("n_shingles") >= int(min_hits))
    )


def dup_span_stats(
    df: DataFrame, n: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-document exact-substring duplication (the curation signal of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): an n-token window is DUPLICATED when its exact token
    sequence also occurs in at least one OTHER document; per doc report
    (n_windows, dup_windows, dup_frac). This catches boilerplate/license
    blocks that whole-doc near-dup (minhash/jaccard) misses because the
    surrounding text differs, and is the cross-corpus complement of the
    WITHIN-doc repetition_features (Gopher) signals.

    Docs shorter than ``n`` tokens have no windows and are absent.

    100 TB shape: one tokenize pass → n-gram explode (narrow, reuses the
    textstats gram builder) → ONE groupBy on the gram key for global
    distinct-doc counts (map-side partial agg; hot boilerplate grams are
    exactly the skewed keys AQE's skew-join splitting handles) → one
    shuffle join back on the gram → one groupBy on doc_id. Same cost
    class as dedup_jaccard; no all-pairs, no driver-side state."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import _grams

    toks = df.select(
        F.col(id_col).alias("doc_id"), tokenize_col(F.col(text_col)).alias("w")
    )
    grams = _grams(toks, int(n))
    dup = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g", F.lit(1).alias("is_dup"))
    )
    return (
        grams.join(dup, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("long").alias("dup_windows"),
        )
        .select(
            "doc_id", "n_windows", "dup_windows",
            F.round(F.col("dup_windows") / F.col("n_windows"), 6).alias("dup_frac"),
        )
    )


def dedup_keep(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    method: str = "auto",
) -> DataFrame:
    """Materialize the dedup decision: keep exactly one document per
    near-dup cluster — the canonical (min id) — and every singleton.
    This is the step training pipelines actually ship: :func:`dup_clusters`
    labels, then survivors = rows whose id IS their cluster id.

    Returns ``df``'s surviving rows, all columns. Shape: the clustering's
    two aggregation shuffles + ONE left-semi join of the corpus against
    the (cluster-count-sized) canonical id set — no extra corpus-wide
    shuffle beyond the join itself, and at 10^12 docs the survivor-id
    side is the broadcast candidate AQE will pick when clusters are few.
    """
    labels = dup_clusters(df, pairs, id_col=id_col, method=method)
    keep = labels.filter(F.col("cluster_id") == F.col("doc_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def dedup_passages(
    df: DataFrame,
    chunk: int = 12,
    delimiter: str | None = None,
    join_sep: str = " ",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Passage-level keep-first deduplication: split every document into
    passages, keep each distinct passage's FIRST global occurrence (the
    lexicographically least (doc, position)), drop every later repeat,
    and reconstruct the surviving text per document. This is the
    sub-document complement of whole-doc dedup — the C4/RefinedWeb-style
    step that strips repeated boilerplate paragraphs while keeping the
    novel remainder of each page, where :func:`dedup_keep` would either
    drop the whole doc or nothing.

    ``delimiter`` (a split regex, e.g. ``'\\n\\n+'``) selects paragraph
    mode; ``delimiter=None`` splits the whitespace token stream into
    fixed ``chunk``-token windows instead (the delimiter-free corpora
    case). Surviving passages are rejoined with ``join_sep`` in original
    order. Per doc: (id, n_passages, n_kept, text_dedup); empty docs have
    no passages and are absent.

    100 TB shape: ONE bounded explode (passages/doc), ONE groupBy on the
    passage key for the keep-first dictionary (map-side partial min; hot
    boilerplate passages are exactly the skewed keys AQE skew handling
    splits), ONE join back on the same key (exchange reuse — it is
    co-partitioned with the groupBy that built the dictionary), and ONE
    groupBy doc_id to reassemble. No all-pairs, no window over the
    corpus, no driver state. Passages are grouped by their exact text —
    at extreme scale swap the key for ``xxhash64(passage)`` to shrink
    shuffle bytes (same plan; collisions then need a verify pass).

    The first-occurrence key is ``doc_id * 2^20 + position`` — documents
    with more than 2^20 passages would overflow it and raise is left to
    the caller's schema bounds (a 12-token-window doc that long is ~12M
    tokens)."""
    w = F.split(F.col(text_col), " ")
    if delimiter is not None:
        passages = F.filter(
            F.split(F.col(text_col), delimiter), lambda x: F.length(x) > 0
        )
    else:
        n_chunks = F.ceil(F.size(w) / F.lit(float(chunk))).cast("int")
        empty = F.col(text_col).isNull() | (F.length(F.col(text_col)) == 0)
        passages = F.when(empty, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), n_chunks - F.lit(1)),
                lambda i: F.array_join(
                    F.slice(w, i * F.lit(chunk) + F.lit(1), chunk), " "
                ),
            )
        )
    p = (
        df.select(F.col(id_col).cast("long").alias("doc_id"), passages.alias("ps"))
        .select("doc_id", F.posexplode("ps").alias("pidx", "passage"))
        .withColumn(
            "okey",
            (F.col("doc_id") * F.lit(1048576) + F.col("pidx")).cast("long"),
        )
    )
    firsts = p.groupBy("passage").agg(F.min("okey").alias("first_key"))
    kept = F.col("okey") == F.col("first_key")
    return (
        p.join(firsts, "passage")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_passages"),
            F.sum(kept.cast("long")).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(kept, F.struct("pidx", "passage")))
                    ),
                    lambda x: x["passage"],
                ),
                join_sep,
            ).alias("text_dedup"),
        )
        .select(
            F.col("doc_id").alias(id_col), "n_passages", "n_kept", "text_dedup"
        )
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_count: int = 1,
) -> DataFrame:
    """Corpus-frequency LINE dedup — the boilerplate-removal pass of the
    RefinedWeb / Dolma pipelines: a line (exact '\\n'-split segment,
    byte-exact match, no normalization) occurring MORE than ``max_count``
    times across the whole corpus is removed from every document; the
    survivors rejoin with '\\n' in their original order. Headers, cookie
    banners and navigation chrome repeat across a crawl by the thousand
    while body prose is near-unique — that asymmetry is the whole method.

    Empty lines are kept verbatim and never counted (they are structure,
    not content; counting them would delete every blank separator in the
    corpus).

    100 TB shape: posexplode lines (narrow) → ONE line-keyed count
    groupBy with map-side partials (the mega-hot boilerplate lines are
    exactly the skew AQE skew-join splitting handles — the dup_spans
    story) → anti-join the flagged set back on the line key → one
    doc-keyed reassembly aggregation. No window, no global sort, nothing
    driver-side.

    Returns (id_col, text_dedup, n_lines, n_removed) — one row per input
    doc; a doc whose every line was boilerplate comes back with ''.
    """
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "pos", "line"
        ),
    )
    flagged = (
        lines.filter(F.col("line") != "")
        .groupBy("line")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > int(max_count))
        .select("line")
    )
    kept = lines.join(flagged, "line", "left_anti")
    out = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("text_dedup"),
        F.count("*").cast("long").alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"))
        .cast("long")
        .alias("n_lines"),
    )
    return (
        totals.join(out, "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
            "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def build_dedup_store(
    df: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
) -> None:
    """Persist the incremental-dedup LSH store for a corpus: the banded
    MinHash signatures (``bands/`` — (doc_id, band, bh), hive-partitioned
    by band so a probe batch's bucket join prunes to matching band
    directories) plus the distinct shingle table (``shingles/`` — the
    exact-verification sidecar; a 100 TB deployment that trusts the
    S-curve can drop it and skip verification, the with_exact
    convention) and a one-row ``meta.parquet`` pinning (n, k, bands) so
    every future batch hashes identically. Written once over history,
    then only APPENDED to — that is the point: new data never rescans
    old text, it joins old signatures."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    banded = banded_signatures(df, text_col, id_col, n, k, bands)
    banded.write.mode("errorifexists").partitionBy("band").parquet(store_path + "/bands")
    shingle_df(df, text_col, id_col, n).write.mode("errorifexists").parquet(
        store_path + "/shingles"
    )
    pq.write_table(
        pa.table({"n": [n], "k": [k], "bands": [bands]}), store_path + "/meta.parquet"
    )


def dedup_incremental(
    spark,
    store_path: str,
    new_df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    append: bool = False,
) -> DataFrame:
    """Cross-run incremental near-dedup: the keep/drop decision for a NEW
    batch against the PERSISTED history store of :func:`build_dedup_store`
    plus the batch itself — the shape a running ingestion pipeline
    actually needs (RefinedWeb/SlimPajama-style rolling dedup), where the
    historical corpus is never rescanned: only its k-long signatures (and,
    for verification, the shingles of candidate docs alone) are read.

    A new doc is a duplicate iff its exact 3-gram Jaccard to some
    HISTORICAL doc or some LOWER-ID doc of the same batch reaches
    ``threshold`` (the lower-id rule makes the within-batch decision
    deterministic and order-free). Candidates come from the banded-LSH
    bucket join (new bands × stored bands ∪ new × new), so recall
    follows the S-curve of the store's (k, bands) — at this repo's
    pinned operating point the LSH candidate set provably contains every
    qualifying pair (the dedup_minhash_lsh precedent), which is what
    lets an exact-SQL oracle cover the whole incremental pipeline.
    Verification reads old shingles ONLY for candidate doc_ids (a
    semi-join prune, never a history scan).

    Returns one row per new doc: (doc_id, keep, dup_of, dup_j) — dup_of
    = the SMALLEST matching doc id (struct-min, deterministic), dup_j
    its exact Jaccard, NULLs for keepers. ``append=True`` then writes
    the batch's signatures and shingles into the store so the next
    batch sees this one as history (the incremental loop;
    effectively-once is the caller's idempotency-key problem, same as
    segment ingest).

    STORE CONTRACT — id uniqueness: ``id_col`` values must be unique
    across the store AND every appended batch (the segment pipeline's
    dense monotone doc_ids satisfy this by construction). Signatures
    and shingles are keyed by doc_id alone, so re-using an id silently
    merges two docs' shingle sets and corrupts sizes/Jaccard; callers
    with replayable sources must de-duplicate ids (idempotency keys)
    before appending, exactly as segment ingest does."""
    import pyarrow.parquet as pq

    meta = pq.read_table(store_path + "/meta.parquet").to_pylist()[0]
    n, k, bands = int(meta["n"]), int(meta["k"]), int(meta["bands"])
    nb = banded_signatures(new_df, text_col, id_col, n, k, bands)
    store = (
        spark.read.parquet(store_path + "/bands")
        .withColumnRenamed("doc_id", "oid")
    )
    cand_old = (
        nb.join(store, ["band", "bh"])
        .select(F.col("doc_id").alias("nid"), "oid")
        .distinct()
    )
    a, b = nb.alias("a"), nb.alias("b")
    cand_new = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") > F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("nid"), F.col("b.doc_id").alias("oid"))
        .distinct()
    )
    cand = cand_old.unionByName(cand_new).distinct()

    new_sh = shingle_df(new_df, text_col, id_col, n)
    old_sh = spark.read.parquet(store_path + "/shingles").join(
        cand.select(F.col("oid").alias("doc_id")).distinct(), "doc_id", "left_semi"
    )
    sh = new_sh.unionByName(old_sh.select("doc_id", "shingle")).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    # shingle-keyed intersection join (each shared shingle matches once —
    # shingle sets are distinct per doc), cost Σ shared shingles; the old
    # id-only join + s1==s2 filter materialized |A|×|B| rows per pair
    inter = (
        cand.join(sh.withColumnRenamed("doc_id", "nid"), "nid")
        .join(sh.select(F.col("doc_id").alias("oid"), "shingle"), ["oid", "shingle"])
        .groupBy("nid", "oid")
        .agg(F.count("*").alias("inter"))
    )
    edges = (
        inter.join(sizes.select(F.col("doc_id").alias("nid"), F.col("sz").alias("sz1")), "nid")
        .join(sizes.select(F.col("doc_id").alias("oid"), F.col("sz").alias("sz2")), "oid")
        .withColumn("jaccard", F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
    )
    best = edges.groupBy("nid").agg(
        F.min(F.struct(F.col("oid"), F.col("jaccard"))).alias("m")
    )
    out = (
        new_df.select(F.col(id_col).alias("doc_id"))
        .join(best.select(F.col("nid").alias("doc_id"), "m"), "doc_id", "left")
        .select(
            "doc_id",
            F.col("m").isNull().alias("keep"),
            F.col("m.oid").alias("dup_of"),
            F.col("m.jaccard").alias("dup_j"),
        )
    )
    if append:
        nb.write.mode("append").partitionBy("band").parquet(store_path + "/bands")
        new_sh.write.mode("append").parquet(store_path + "/shingles")
    return out
