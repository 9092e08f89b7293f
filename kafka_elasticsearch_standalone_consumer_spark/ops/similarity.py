"""Similarity search over an embedding column (``array<float>``).

Two paths, mirroring the index engine's oracle/fast split:

* **brute-force cosine top-k** — pure Column algebra (``zip_with`` dot
  product + ``aggregate`` reduce), one full scan, one final top-k sort of
  partial per-partition top-k. The verification baseline.
* **LSH-bucketed** (random hyperplanes) — deterministic sign signature as
  Column algebra; at query time only the query's bucket (plus Hamming-1
  neighbor buckets for recall) is scanned. This is the 100 TB scale path:
  the scan prunes to ~|buckets|/2^bits of the table when the signature
  column is a partition/bucket key.

Exact scoring (the cosine itself) stays Column algebra in both paths;
Arrow-batched ``mapInPandas`` kernels carry the bulk per-row work that
row-at-a-time JVM expressions evaluate interpreted (the ad-hoc LSH
signature+probe filter, IVF coarse assignment, SQ8/PQ code scans) —
each kernel preserves the exact fold order of its Column/SQL twin where
an oracle compares values.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PLANE_SEED = 0xC0FFEE

_BLAS_CAPPED = False


def _cap_blas_threads(n: int = 8) -> None:
    """One-time cap on OpenBLAS's thread pool for the driver-side
    trainers. Their GEMMs are small ((~1k×64)@(64×4k)): at OpenBLAS's
    default thread count (= every vCPU) fork-join overhead dominates —
    measured 42 ms vs 10 ms at 8 threads on this box, and far worse
    under co-tenancy. Uses the public ``openblas_set_num_threads`` API
    via ctypes (numpy bundles OpenBLAS but exposes no knob); silently a
    no-op for other BLAS builds."""
    global _BLAS_CAPPED
    if _BLAS_CAPPED:
        return
    _BLAS_CAPPED = True
    try:
        import ctypes
        import glob
        import os

        libs = glob.glob(
            os.path.join(os.path.dirname(np.__file__), ".libs", "*openblas*")
        ) or glob.glob(
            os.path.join(os.path.dirname(os.path.dirname(np.__file__)),
                         "numpy.libs", "*openblas*")
        )
        for lib in libs:
            ob = ctypes.CDLL(lib)
            for sym in ("openblas_set_num_threads", "openblas_set_num_threads64_"):
                fn = getattr(ob, sym, None)
                if fn is not None:
                    fn(int(n))
                    return
    except Exception:
        pass  # cap is an optimization, never a requirement


def _vec_matrix(arr) -> np.ndarray:
    """pyarrow ``List<float>`` array → ``(n, dim)`` float64 matrix.

    Equal-length rows (every embedding fixture) take the zero-copy
    flatten+reshape path; ragged/null rows fall back to ``to_pylist``.
    float32→float64 widening is exact, so values are identical to the
    ``float(v)``-per-element Row loop this replaces — the Arrow transfer
    just skips ~65k Python float boxings per 1024×64 sample (guide §6:
    Arrow for driver transfers)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    try:
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if len(widths) and arr.null_count == 0 and (widths == widths[0]).all():
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.astype(np.float64).reshape(len(widths), int(widths[0]))
    except AttributeError:
        pass
    return np.asarray(arr.to_pylist(), dtype=np.float64)


def _sample_matrix(
    emb: DataFrame, id_col: str, vec_col: str, n: int, extra: tuple[str, ...] = ()
):
    """The bounded lowest-id training sample as (arrow_table, float64
    matrix): ONE Arrow-path transfer of only the needed columns instead
    of a full-row ``collect()`` + per-element ``float()`` loop. Row set,
    order and float values are identical to the Row path (global sort on
    the unique id, exact float32→float64 widening)."""
    tbl = (
        emb.select(id_col, vec_col, *extra).orderBy(id_col).limit(int(n)).toArrow()
    )
    return tbl, _vec_matrix(tbl.column(vec_col))


def _cosine(vec_col: Column, q: list[float]) -> Column:
    """Cosine similarity of an array<float> column against a literal query
    vector — float64 accumulation JVM-side (zip_with + aggregate; the
    interpreted HOF fold measures FASTER end-to-end at query scale than
    an unrolled per-element ``+`` chain, whose ~128-node expression tree
    inflates Catalyst planning per query and can overflow codegen —
    round-6 measured 0.15 s vs 0.67 s per top-k on the bench corpus)."""
    qn = float(np.linalg.norm(np.asarray(q, dtype=np.float64))) or 1e-30
    qlit = F.array(*[F.lit(float(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(vec_col, qlit, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (norm * F.lit(qn))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: (id, cosine) — deterministic tie-break on id.

    Catalyst plans this as scan → project → TakeOrderedAndProject: each
    partition keeps k rows, the driver merges k×P — no full sort, no big
    shuffle, which is exactly the distributed brute-force baseline shape.
    """
    scored = emb.select(
        F.col(id_col).alias("vec_id"), _cosine(F.col(vec_col), query_vec).alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def cosine_range(
    emb: DataFrame,
    query_vec: list[float],
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Radius (range) similarity search: every vector whose cosine with
    ``query_vec`` is >= ``tau`` — (vec_id, cosine), unbounded by k; the
    caller bounds the result with the radius. The brute-force baseline:
    one scan with the comparison fused into it by codegen (scan ->
    project -> filter, no shuffle at all). For the 100 TB path pass a
    pruned subset (an IVF probe's lists or an LSH bucket union) as
    ``emb`` — the predicate composes with partition pruning unchanged."""
    scored = emb.select(
        F.col(id_col).alias("vec_id"), _cosine(F.col(vec_col), query_vec).alias("cosine")
    )
    return scored.filter(F.col("cosine") >= float(tau))


def pool_embeddings(
    emb: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    deterministic: bool = False,
) -> DataFrame:
    """Elementwise MEAN-pooling of embedding vectors per group — the
    standard rollup from turn/passage vectors to a document/class
    vector (doc-level retrieval over turn embeddings, class centroids
    for a nearest-centroid classifier, semdedup-style cluster
    representatives). Returns ``(group, dim, mean)`` exploded per
    dimension, plus the group's member count.

    ``deterministic=True`` folds each group's vectors in ascending-id
    order (``sort_array(collect_list(struct(id, vec)))`` + a
    ``zip_with`` accumulator — the pagerank/MMR sequential-float64
    precedent), so per-dimension sums are BIT-identical to a SQL
    engine's ordered ``list_sum``; the mean is then ONE division by the
    exact member count. ``deterministic=False`` is the at-scale path:
    ``posexplode`` + plain (group, dim)-keyed sum — map-side partials,
    no per-group collect_list state — 1e-12-close, never bit-asserted.

    Scale shape (default): one explode (×dim) + ONE keyed aggregation;
    group count rides the same agg. The deterministic variant holds a
    group's vectors in one aggregation buffer — group-sized state,
    reserve it for verification."""
    gid = F.col(group_col).alias("grp")
    if deterministic:
        agg = emb.select(
            gid, F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
        ).groupBy("grp").agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("_id", "_v"))),
                F.array().cast("array<double>"),
                lambda acc, x: F.when(
                    F.size(acc) == 0,
                    F.transform(x["_v"], lambda v: v.cast("double")),
                ).otherwise(
                    F.zip_with(acc, x["_v"], lambda a, b: a + b.cast("double"))
                ),
            ).alias("s"),
            F.count("*").cast("double").alias("c"),
        )
        pooled = agg.select(
            "grp",
            F.col("c").cast("long").alias("n"),
            F.posexplode(F.transform(F.col("s"), lambda v: v / F.col("c"))).alias(
                "dim", "mean"
            ),
        )
        return pooled.select("grp", "dim", "mean", "n")
    ex = emb.select(
        gid,
        F.posexplode(
            F.transform(F.col(vec_col), lambda v: v.cast("double"))
        ).alias("dim", "v"),
    )
    agg = ex.groupBy("grp", "dim").agg(
        F.sum("v").alias("s"), F.count("*").cast("double").alias("c")
    )
    return agg.select(
        "grp", "dim", (F.col("s") / F.col("c")).alias("mean"),
        F.col("c").cast("long").alias("n"),
    )


def nearest_centroid(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "grp",
    deterministic: bool = False,
) -> DataFrame:
    """Nearest-centroid (Rocchio) classification by cosine: assign every
    vector to the closest group centroid — composes with
    :func:`pool_embeddings` (whose exploded ``(grp, dim, mean)`` output
    is this function's ``centroids`` input) into a label-propagation /
    domain-tagging stage for curation pipelines.

    Cosine = dot/(√Σv²·√Σc²) with every Σ a per-(key, dim-ordered)
    fold: ``deterministic=True`` folds in ascending-dim order (the
    pagerank/MMR sequential-float64 precedent) so dots and norms are
    BIT-identical to a SQL engine's ordered ``list_sum`` and the argmax
    (ties: group asc) can never flap cross-engine;
    ``deterministic=False`` is the at-scale plain-sum path. Returns
    ``(vec_id, pred, cos)`` — one row per vector.

    Scale shape: the centroid table is (n_groups × dim) rows —
    broadcast; the per-dim explode feeds ONE (vec, group)-keyed
    aggregation, and the argmax is a vec_id-keyed window (hash-
    partitioned, never SinglePartition)."""
    from pyspark.sql import Window

    ex = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(
            F.transform(F.col(vec_col), lambda v: v.cast("double"))
        ).alias("dim", "v"),
    )

    def _fold(df, keys, expr_col, out):
        if deterministic:
            return df.groupBy(*keys).agg(
                F.aggregate(
                    F.sort_array(F.collect_list(F.struct("dim", expr_col.alias("x")))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["x"],
                ).alias(out)
            )
        return df.groupBy(*keys).agg(F.sum(expr_col).alias(out))

    cent = centroids.select(
        F.col(group_col).alias("grp"), "dim", F.col("mean").alias("m")
    )
    j = ex.join(F.broadcast(cent), "dim")
    dots = _fold(j, ["vec_id", "grp"], F.col("v") * F.col("m"), "dot")
    vv = _fold(ex, ["vec_id"], F.col("v") * F.col("v"), "vv")
    cc = _fold(cent.select("grp", "dim", F.col("m").alias("v")),
               ["grp"], F.col("v") * F.col("v"), "cc")
    scored = (
        dots.join(vv, "vec_id")
        .join(F.broadcast(cc), "grp")
        .select(
            "vec_id",
            "grp",
            (F.col("dot") / (F.sqrt(F.col("vv")) * F.sqrt(F.col("cc")))).alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("grp"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("grp").alias("pred"), "cos")
    )


def mmr_rerank(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_candidates: int = 20,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein 1998): greedily pick the candidate maximizing
    ``lam * rel(i) - (1 - lam) * max_sim(i, selected)``, ties by id asc;
    the first pick is the plain argmax of relevance. Returns
    (step, vec_id, mmr) in selection order — step 1's mmr is the
    relevance itself, later steps the marginal score.

    Scale shape: the corpus-sized work is ONE distributed top-N
    (TakeOrderedAndProject, same plan as cosine_topk); the greedy loop
    is k × n_candidates over the COLLECTED candidate set — bounded by
    ``n_candidates``, never the corpus (an MMR rerank is candidate-sized
    by definition, like a cross-encoder rerank stage).

    Determinism: every relevance and pairwise similarity that feeds the
    greedy is recomputed driver-side with a SEQUENTIAL float64 left fold
    — the exact arithmetic of a SQL engine's ``list_sum`` and of the
    Spark ``aggregate`` fold — so the selection keys are BIT-identical
    to the oracle's recursive-CTE greedy and near-orthogonal candidates
    (whose marginal scores tie within float noise) break on vec_id in
    lockstep, never on last-ulp summation-order differences. The
    distributed cut itself orders by the Column-algebra cosine, whose
    gaps (~1e-4 on this data) dwarf summation noise, same contract as
    cosine_topk."""
    rows = (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("v"),
            _cosine(F.col(vec_col), query_vec).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(int(n_candidates))
        .collect()
    )
    if not rows:
        return emb.sparkSession.createDataFrame(
            [], "step int, vec_id long, mmr double"
        )

    def _seq_dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    import math

    ids = [int(r["vec_id"]) for r in rows]
    vecs = [[float(x) for x in r["v"]] for r in rows]
    qv = [float(x) for x in query_vec]
    qn = math.sqrt(_seq_dot(qv, qv)) or 1e-30
    nrm = [math.sqrt(_seq_dot(v, v)) or 1e-30 for v in vecs]
    rel = [_seq_dot(v, qv) / (nrm[i] * qn) for i, v in enumerate(vecs)]
    sims = [
        [_seq_dot(vecs[i], vecs[j]) / (nrm[i] * nrm[j]) for j in range(len(ids))]
        for i in range(len(ids))
    ]
    # anchor = argmax of the RECOMPUTED relevance (ties id asc) — the same
    # keys the oracle's anchor ORDER BY sees, not the distributed cut's order
    a0 = max(range(len(ids)), key=lambda i: (rel[i], -ids[i]))
    selected: list[int] = [a0]
    out = [(1, ids[a0], float(rel[a0]))]
    while len(selected) < min(int(k), len(ids)):
        best = None
        for i in range(len(ids)):
            if i in selected:
                continue
            sc = lam * rel[i] - (1.0 - lam) * max(sims[i][j] for j in selected)
            if best is None or (sc, -ids[i]) > (best[1], -ids[best[0]]):
                best = (i, sc)
        selected.append(best[0])
        out.append((len(selected), ids[best[0]], float(best[1])))
    return emb.sparkSession.createDataFrame(out, "step int, vec_id long, mmr double")


def _hyperplanes(dim: int, bits: int, seed: int = _PLANE_SEED) -> np.ndarray:
    """Deterministic Gaussian-ish hyperplanes from a counter-based hash."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def _py_signature(planes: np.ndarray, qv: np.ndarray) -> int:
    """Driver-side signature with the SAME int64 two's-complement
    convention as :func:`lsh_signature` (bit 63 encodes as −2^63), so
    probe sets match the stored/computed ``sig`` values at any
    ``bits ≤ 64``. Shared by every query-side probe builder."""
    u = np.uint64(0)
    for i, p in enumerate(planes):
        if float(p @ qv) > 0:
            u |= np.uint64(1) << np.uint64(i)
    return int(np.int64(u))


def _flip_bit(sig: int, i: int) -> int:
    """Hamming-neighbor signature: flip bit ``i`` in uint64 space and map
    back to the int64 value the ``sig`` column stores."""
    return int(np.int64(np.uint64(np.int64(sig)) ^ (np.uint64(1) << np.uint64(i))))


def _probe_sigs(planes: np.ndarray, qv: np.ndarray, probe_hamming: int) -> list[int]:
    """Query probe set: the query's signature plus all Hamming-1
    neighbors when ``probe_hamming ≥ 1`` — int64-convention-safe."""
    qsig = _py_signature(planes, qv)
    probe = {qsig}
    if probe_hamming >= 1:
        probe |= {_flip_bit(qsig, i) for i in range(len(planes))}
    return sorted(probe)


def lsh_signature(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-of-projection signature (int): bit i = 1 iff plane_i · v > 0.

    Bits are distinct powers of two, so summing them equals OR-ing them —
    bit 63 uses the two's-complement int64 value (−2^63) to stay inside
    LongType without ANSI overflow."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plit = F.array(*[F.lit(float(x)) for x in plane])
        proj = F.aggregate(
            F.zip_with(vec_col, plit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = int(np.int64(np.uint64(1) << np.uint64(i)))  # i=63 → −2^63
        sig = sig + F.when(proj > 0, F.lit(bit)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k, AD-HOC variant: computes every row's signature at scan
    time, then exact cosine inside the probed buckets. Use this when the
    embeddings are not materialized; the scale path is
    :func:`build_ann_index` + :func:`ann_topk_indexed`, where ``sig`` is a
    PARTITION column and the same probe predicate becomes directory-level
    partition pruning (~(1+bits)/2^bits of data read at probe_hamming=1
    instead of a full scan).

    The scan-time signature+probe filter is an Arrow ``mapInPandas``
    kernel (guide §4.2: the ``bits × dim`` interpreted-HOF projection
    chain cost ~1 ms/row — the kernel vectorizes across the batch's ROWS
    while accumulating each projection SEQUENTIALLY across dims, the
    exact fold order of :func:`lsh_signature` and of the oracle's
    ``list_sum``, so signatures are bit-identical to the Column form);
    only probed-bucket candidates cross back, and the exact cosine stays
    Column algebra."""
    import pandas as pd

    dim = len(query_vec)
    planes = _hyperplanes(dim, bits)
    qv = np.asarray(query_vec, dtype=np.float64)
    probe_arr = np.array(_probe_sigs(planes, qv, probe_hamming), dtype=np.int64)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            u = np.zeros(len(pdf), dtype=np.uint64)
            for i, plane in enumerate(planes):
                acc = np.zeros(len(pdf), dtype=np.float64)
                for j in range(m.shape[1]):
                    acc += m[:, j] * plane[j]  # sequential fold, dim order
                u |= (acc > 0).astype(np.uint64) << np.uint64(i)
            keep = np.isin(u.view(np.int64), probe_arr)
            if keep.any():
                yield pdf.loc[keep]

    cand = emb.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"{id_col} long, {vec_col} array<float>"
    )
    scored = cand.select(
        F.col(id_col).alias("vec_id"), _cosine(F.col(vec_col), query_vec).alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def _pair_cosine(a_vec: Column, b_vec: Column) -> Column:
    """Cosine between two array<float> columns, float64 accumulation."""
    dot = F.aggregate(
        F.zip_with(a_vec, b_vec, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def _norm(v):
        return F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    return dot / (_norm(a_vec) * _norm(b_vec))


def cosine_dup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs, EXACT: every (id1 < id2) pair with
    cosine ≥ threshold. All-pairs comparison — the verification baseline
    for :func:`cosine_dup_pairs_lsh` (which is the path that survives
    100 TB); Catalyst plans the self-join as broadcast nested loop when one
    side fits."""
    a = emb.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = emb.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("cosine", _pair_cosine(F.col("v1"), F.col("v2")))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def cosine_dup_pairs_lsh(
    emb: DataFrame,
    threshold: float,
    bits: int = 32,
    bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via sign-LSH banding: candidates are
    pairs agreeing on ≥1 of ``bands`` bands of ``bits/bands`` hyperplane
    sign bits each (collision prob per bit = 1 − θ/π), then verified with
    the exact cosine — no false positives; recall follows the LSH S-curve.
    At scale the band hash is the shuffle key: candidate generation is a
    band-bucket self-join, never all-pairs."""
    rows = bits // bands
    if dim is None:  # pass dim when known — saves a driver round-trip
        dim = len(emb.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits)
    sig = emb.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).alias("v"),
        lsh_signature(F.col(vec_col), planes).alias("sig"),
    )
    banded = sig.select(
        "doc_id",
        "v",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.shiftrightunsigned(F.col("sig"), bi * rows)
                    .bitwiseAND(F.lit((1 << rows) - 1))
                    .alias("bh"),
                )
                for bi in range(bands)
            ])
        ).alias("bb"),
    ).select("doc_id", "v", "bb.band", "bb.bh")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            F.col("a.v").alias("v1"),
            F.col("b.v").alias("v2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    return (
        cand.withColumn("cosine", _pair_cosine(F.col("v1"), F.col("v2")))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


# -- materialized vector indexes ------------------------------------------
# The scan-time signature computation in lsh_topk is the ad-hoc path; at
# scale the signature/list id must be a PARTITION COLUMN of a materialized
# table so probes become directory-level partition pruning (the same trick
# as the postings table's term_bucket). These builders/searchers own that.

ANN_TABLE = "ann_embeddings"
ANN_META = "sys_ann_meta"
IVF_TABLE = "ivf_embeddings"
IVF_META = "sys_ivf_meta"


def build_ann_index(
    emb: DataFrame,
    warehouse_path: str,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> None:
    """Materialize the embeddings partitioned by their sign-LSH signature.

    One pass computes ``sig`` JVM-side (lsh_signature Column algebra) and
    writes ``partitionBy(sig)`` — at query time :func:`ann_topk_indexed`'s
    bucket predicate is directory-level partition pruning: ~(1+bits)/2^bits
    of the table is read at probe_hamming=1, independent of table width.
    """
    from kafka_elasticsearch_standalone_consumer_spark.tables import Warehouse

    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits)
    wh = Warehouse(warehouse_path)
    df = emb.withColumn("sig", lsh_signature(F.col(vec_col), planes))
    wh.write(df, ANN_TABLE, partition_by=("sig",))
    wh.write_meta(ANN_META, {"bits": bits, "dim": dim, "id_col": id_col, "vec_col": vec_col})


def ann_topk_indexed(
    spark,
    warehouse_path: str,
    query_vec: list[float],
    k: int = 10,
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k over a :func:`build_ann_index` warehouse: the probe-bucket
    predicate hits the ``sig`` PARTITION column (PartitionFilters in the
    plan — asserted in tests/test_plans.py), then exact cosine inside the
    candidate set. Rank-identical to :func:`lsh_topk` at the same bits."""
    from kafka_elasticsearch_standalone_consumer_spark.tables import Warehouse

    wh = Warehouse(warehouse_path)
    meta = wh.read_meta(ANN_META)
    bits = int(meta["bits"])
    planes = _hyperplanes(int(meta["dim"]), bits)
    qv = np.asarray(query_vec, dtype=np.float64)
    cand = wh.read(spark, ANN_TABLE).filter(
        F.col("sig").isin(_probe_sigs(planes, qv, probe_hamming))
    )
    scored = cand.select(
        F.col(meta["id_col"]).alias("vec_id"),
        _cosine(F.col(meta["vec_col"]), list(map(float, query_vec))).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def train_centroids(
    emb: DataFrame,
    n_lists: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means codebook for an IVF index — distributed Lloyd's.

    Per iteration: ONE Arrow ``mapInPandas`` pass both assigns each
    vector (the :func:`ivf_assign` matmul rule: normalize, dot-product
    argmax, ties to the lowest centroid id) and folds the batch's RAW
    vectors into per-list partial sums, emitting only n_lists × dim tiny
    ``(list_id, pos, s)`` rows per batch; a keyed aggregation whose
    cardinality is n_lists × dim reduces them. (This replaces the
    assign-then-join-then-explode shape, which shuffled the corpus by id
    and exploded every component, with map-side partial aggregation in
    the kernel itself — the vectors never shuffle.) The codebook
    (n_lists × dim floats) lives driver-side, renormalized to the unit
    sphere each round (cosine objective). Deterministic init: the
    ``n_lists`` vectors with the smallest ids. Empty clusters keep their
    previous centroid.
    """
    import pandas as pd

    _tbl, cent = _sample_matrix(emb, id_col, vec_col, n_lists)
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)
    vecs = emb.select(vec_col)
    for _ in range(iters):
        cent_n = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)
        k, dim = cent_n.shape

        def kernel(batches, _cn=cent_n, _k=k, _dim=dim):
            for pdf in batches:
                if not len(pdf):
                    continue
                m_raw = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                m = m_raw / np.maximum(
                    np.linalg.norm(m_raw, axis=1, keepdims=True), 1e-30
                )
                assign = (m @ _cn.T).argmax(axis=1)
                psum = np.zeros((_k, _dim), dtype=np.float64)
                np.add.at(psum, assign, m_raw)
                present = np.unique(assign)
                yield pd.DataFrame(
                    {
                        "list_id": np.repeat(present, _dim).astype(np.int32),
                        "pos": np.tile(
                            np.arange(_dim, dtype=np.int32), len(present)
                        ),
                        "s": psum[present].ravel(),
                    }
                )

        sums = (
            vecs.mapInPandas(kernel, schema="list_id int, pos int, s double")
            .groupBy("list_id", "pos")
            .agg(F.sum("s").alias("s"))
            .collect()
        )
        new = cent.copy()
        acc = np.zeros_like(cent)
        seen = set()
        for r in sums:
            acc[r["list_id"], r["pos"]] = r["s"]
            seen.add(r["list_id"])
        for li in seen:
            n = np.linalg.norm(acc[li])
            if n > 1e-30:
                new[li] = acc[li] / n  # mean direction == normalized sum
        cent = new
    return cent


def build_ivf_index(
    emb: DataFrame,
    centroids: np.ndarray,
    warehouse_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize an IVF index: assign each vector to its nearest centroid
    (the :func:`ivf_assign` rule, fused with the payload via
    :func:`ivf_assign_with_payload` so the build is ONE pass with no
    assign→payload join shuffle) and write the table partitioned by
    ``list_id`` — the IVF inverted lists ARE partition directories, so a
    search probing ``nprobe`` lists reads ~nprobe/n_lists of the data.
    Centroids persist in the warehouse meta (they are small by
    construction)."""
    from kafka_elasticsearch_standalone_consumer_spark.tables import Warehouse

    wh = Warehouse(warehouse_path)
    df = ivf_assign_with_payload(emb, centroids, vec_col)
    wh.write(df, IVF_TABLE, partition_by=("list_id",))
    wh.write_meta(
        IVF_META,
        {
            "n_lists": int(centroids.shape[0]),
            "dim": int(centroids.shape[1]),
            "id_col": id_col,
            "vec_col": vec_col,
            "centroids": [[float(x) for x in c] for c in centroids],
        },
    )


def ivf_search(
    spark,
    warehouse_path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    where: str | None = None,
) -> DataFrame:
    """IVF search over a :func:`build_ivf_index` warehouse: rank centroids
    by normalized dot product against the query (driver-side NumPy — the
    codebook is tiny), scan only the top-``nprobe`` list partitions
    (partition pruning on ``list_id``), exact cosine inside them.

    ``where`` is the metadata filter of real-world vector search (label /
    tenant / date predicates next to the similarity): a SQL expression
    over the index's payload columns, applied INSIDE the pruned scan —
    Catalyst pushes it into the parquet read, so a selective filter cuts
    decode bytes, never a post-hoc join. Filtering narrows candidates
    only; with ``nprobe=ALL`` it is exactly brute-force-over-the-subset
    (the oracle operating point)."""
    from kafka_elasticsearch_standalone_consumer_spark.tables import Warehouse

    wh = Warehouse(warehouse_path)
    meta = wh.read_meta(IVF_META)
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    cent_n = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)
    qv = np.asarray(query_vec, dtype=np.float64)
    qn = qv / max(float(np.linalg.norm(qv)), 1e-30)
    sims = cent_n @ qn
    # deterministic probe order: similarity desc, list id asc
    order = np.lexsort((np.arange(sims.size), -sims))[:nprobe]
    lists = sorted(int(i) for i in order)
    cand = wh.read(spark, IVF_TABLE).filter(F.col("list_id").isin(lists))
    if where is not None:
        cand = cand.filter(where)
    scored = cand.select(
        F.col(meta["id_col"]).alias("vec_id"),
        _cosine(F.col(meta["vec_col"]), list(map(float, query_vec))).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantizer: assign each vector to its nearest centroid
    (dot-product argmax) — the write-side of an IVF index. Vectorized
    mapInPandas: one matmul per Arrow batch."""
    cent = centroids.astype(np.float64)
    cent_n = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            pdf = pdf[[id_col]].copy()
            pdf["list_id"] = (m @ cent_n.T).argmax(axis=1).astype(np.int32)
            yield pdf

    return emb.mapInPandas(kernel, schema=f"{id_col} long, list_id int")


def ivf_assign_with_payload(
    emb: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`ivf_assign` (same normalize → dot-argmax → lowest-id-tie
    rule), but carrying EVERY input column through the kernel and
    appending ``list_id`` — so callers that need the assigned rows
    (index build, IVF-PQ scan) get them in ONE pass instead of
    assigning on a narrow projection and join-shuffling the payload
    back by id. At 100 TB that join was the guide's "second shuffle of
    the heavy bytes"; this shape reads the fat row once and never
    shuffles it."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    cent = centroids.astype(np.float64)
    cent_n = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)
    out_schema = StructType(
        list(emb.schema.fields) + [StructField("list_id", IntegerType())]
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            pdf = pdf.copy()
            pdf["list_id"] = (m @ cent_n.T).argmax(axis=1).astype(np.int32)
            yield pdf

    return emb.mapInPandas(kernel, schema=out_schema)


def sq8_quantize(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization (the SQ8 of
    FAISS/Lucene KNN): ``scale = max|x| / 127``, ``code_i =
    rint(x_i / scale) ∈ [−127, 127]``, packed into ONE BinaryType blob per
    vector (same trick as the postings codec) plus two float64 sidecars
    (``scale``, ``norm``). 4× smaller than float32 — at 100 TB the codes
    column is what the first-pass scan reads, cutting scan bandwidth 4×
    before any pruning.

    Arrow-batched mapInPandas (one rint + tobytes per batch) — no per-row
    Python. Identical vectors quantize to identical blobs.
    """
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            amax = np.abs(m).max(axis=1)
            scale = np.maximum(amax / 127.0, 1e-30)
            codes = np.rint(m / scale[:, None]).astype(np.int8)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "codes": [c.tobytes() for c in codes],
                    "scale": scale,
                    "norm": np.linalg.norm(m, axis=1),
                }
            )

    return emb.mapInPandas(
        kernel, schema=f"{id_col} long, codes binary, scale double, norm double"
    )


def sq8_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    rescore: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantized-scan + exact-rescore ANN (the SQ8 search loop): the
    int8 codes produce an approximate cosine ``(codes·qcodes)·scale·qscale
    / (norm·qnorm)`` for every row, the top-``rescore`` candidates by that
    score (ties: id asc) are rescored with the EXACT float cosine against
    the original vectors, and the exact top-``k`` of those is returned.

    100 TB shape: pass 1 reads only (id, codes, scale, norm) — ~¼ of the
    embedding bytes — and reduces via TakeOrderedAndProject (per-partition
    top-``rescore``, no shuffle of the table); pass 2 joins the
    ``rescore``-row candidate set back to the fat table with a BROADCAST
    join, so full-precision vectors are read for only ``rescore`` rows.
    Recall is governed by ``rescore`` vs the quantization error (≤ ½·scale
    per component); the oracle entry pins an operating point where recall
    is exactly 1.0 and asserts it (LSH-entry precedent).
    """
    qv = np.asarray(query_vec, dtype=np.float64)
    qscale = max(float(np.abs(qv).max()) / 127.0, 1e-30)
    qcodes = np.rint(qv / qscale).astype(np.int8).astype(np.float64)
    qnorm = max(float(np.linalg.norm(qv)), 1e-30)

    import pandas as pd

    def score(batches):
        # quantize + score fused in ONE kernel pass: per-row arithmetic is
        # identical to sq8_quantize → decode → score (the int8 blob
        # round-trip is lossless and row-independent), so approx scores
        # are bit-identical to the two-kernel chain while crossing the
        # Python boundary once instead of twice. On the materialized
        # layout pass 1 reads the stored codes instead.
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            amax = np.abs(x).max(axis=1)
            scale = np.maximum(amax / 127.0, 1e-30)
            codes = np.rint(x / scale[:, None]).astype(np.int8).astype(np.float64)
            norm = np.linalg.norm(x, axis=1)
            approx = (codes @ qcodes) * scale * qscale / (norm * qnorm)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "approx": approx})

    cand = (
        emb.select(id_col, vec_col)
        .mapInPandas(score, schema=f"{id_col} long, approx double")
        .orderBy(F.desc("approx"), F.asc(id_col))
        .limit(int(rescore))
    )
    rescored = F.broadcast(cand.select(id_col)).join(emb, id_col).select(
        F.col(id_col).alias("vec_id"),
        _cosine(F.col(vec_col), [float(x) for x in query_vec]).alias("cosine"),
    )
    return rescored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def bq_codes(
    emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector 1-bit BINARY quantization (the sign-bit codes of
    Lucene/FAISS binary hashing): bit i is set iff component i > 0,
    packed into ``ceil(dim/64)`` int64 words — 64 dims collapse to ONE
    long, a 32× cut vs float32 storage (256× vs float64). Unlike SQ8's
    Arrow kernel this packing is PURE Column algebra (a bitwise-OR chain
    over per-component conditionals), so the pass stays inside
    whole-stage codegen with no Python in the loop; identical vectors
    pack to identical codes. Returns (id, code: array<long>).

    Each 64-term word is built as ONE parsed SQL expression string: the
    per-term ``when().bitwiseOR()`` Column chain this replaces issued
    ~400 py4j round-trips per word and dominated the per-query wall of
    the ad-hoc path (~1 s of driver-side plan construction per call —
    the guide §7.3 planning-cost failure mode). ``IF(x > 0.0D, bit, 0)``
    OR-folded left-to-right is the same expression tree, so codegen and
    per-row results are unchanged."""
    if dim < 1:
        raise ValueError("dim must be >= 1")
    n_words = (dim + 63) // 64
    words = []
    for w in range(n_words):
        terms = []
        for i in range(64 * w, min(64 * w + 64, dim)):
            bit = 1 << (i - 64 * w)
            if bit >= 1 << 63:
                bit -= 1 << 64  # two's-complement sign bit as a long literal
            # min-long has no direct literal form (−2^63 parses as unary
            # minus of an out-of-range literal) — spell it arithmetically
            blit = f"{bit}L" if bit != -(1 << 63) else "(-9223372036854775807L - 1L)"
            terms.append(
                f"IF(CAST(`{vec_col}`[{i}] AS DOUBLE) > 0.0D, {blit}, 0L)"
            )
        words.append(F.expr("CAST(0 AS BIGINT) | " + " | ".join(terms)))
    return emb.select(F.col(id_col), F.array(*words).alias("code"))


def _bq_pack(vec: "np.ndarray") -> list[int]:
    """Driver-side twin of :func:`bq_codes` for the query vector."""
    dim = len(vec)
    out = []
    for w in range((dim + 63) // 64):
        x = 0
        for i in range(64 * w, min(64 * w + 64, dim)):
            if vec[i] > 0:
                x |= 1 << (i - 64 * w)
        if x >= 1 << 63:
            x -= 1 << 64
        out.append(x)
    return out


def bq_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    rescore: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-quantized scan + exact-rescore ANN: pass 1 ranks every row
    by Hamming distance between its sign-bit code and the query's
    (``bit_count(xor)`` per word — sign agreement tracks cosine for
    roughly centered data), keeps the top-``rescore`` candidates
    (ties: Hamming asc, id asc) via TakeOrderedAndProject, and pass 2
    broadcast-joins those ids back to the float vectors for an exact
    cosine top-``k`` — the sq8_topk loop one quantization notch cruder.

    100 TB shape: pass 1 reads ONE long per 64 dims — a 32× narrower
    scan than float32 — entirely in whole-stage codegen (no Python, no
    shuffle of the table); pass 2 reads full vectors for only
    ``rescore`` rows. Recall is governed by ``rescore`` against the
    1-bit quantization error; the oracle entry pins an operating point
    where recall is exactly 1.0 and asserts it (SQ8/LSH precedent),
    with production operating points reported in the bench recall
    table."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qwords = _bq_pack(qv)
    codes = bq_codes(emb, len(query_vec), id_col, vec_col)
    qarr = F.array(*[F.lit(x).cast("long") for x in qwords])
    hamming = F.aggregate(
        F.zip_with(F.col("code"), qarr, lambda a, b: F.bit_count(a.bitwiseXOR(b))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    cand = (
        codes.select(F.col(id_col), hamming.alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc(id_col))
        .limit(int(rescore))
    )
    rescored = F.broadcast(cand.select(id_col)).join(emb, id_col).select(
        F.col(id_col).alias("vec_id"),
        _cosine(F.col(vec_col), [float(x) for x in query_vec]).alias("cosine"),
    )
    return rescored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def semdedup(
    emb: DataFrame,
    threshold: float,
    n_lists: int = 8,
    iters: int = 3,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    clustering embeddings with spherical k-means and comparing pairs ONLY
    inside each cluster. A vector is dropped iff some LOWER-id vector in
    its cluster has cosine ≥ ``threshold`` (deterministic keep-lowest-id
    representative — the paper's keep-one rule with a stable tie order);
    returns the kept ids, one ``id_col`` column.

    Scale shape (the reason this beats all-pairs at 100 TB): assignment
    is one Arrow matmul pass (:func:`ivf_assign`); the quadratic work is
    a per-cluster NumPy gram matrix inside ``applyInPandas`` — O((n/k)²)
    per task, never a global self-join. Pick ``n_lists`` ≈ n / desired
    cluster size (the paper uses 50k clusters for LAION); per-task memory
    is bounded by the largest cluster, so a flood of identical vectors is
    the skew case to watch — cap it upstream with exact dedup first.

    Like the paper's, the method is approximate: a cross-cluster pair is
    never compared. EXACT duplicates can never be missed (identical
    vectors get identical argmax assignments, whatever the centroids), so
    with ``threshold`` above the corpus's natural cross-pair ceiling the
    result equals the global all-pairs rule — that is the operating point
    the oracle pins."""
    import pandas as pd

    if centroids is None:
        centroids = train_centroids(emb, n_lists, iters, id_col, vec_col)
    # assignment fused with the payload: one pass, no assign→payload join
    df = ivf_assign_with_payload(emb.select(id_col, vec_col), centroids, vec_col)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)  # ids are unique — stable enough
        ids = ids[order]
        m = np.stack(pdf[vec_col].to_numpy())[order].astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        g = m @ m.T
        drop = np.tril(g >= float(threshold), -1).any(axis=1)
        return pd.DataFrame({id_col: ids[~drop]})

    return df.groupBy("list_id").applyInPandas(kernel, schema=f"{id_col} long")


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k_cent: int = 32,
    sample_n: int = 1024,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011): split each
    UNIT-NORMALIZED vector into ``m`` contiguous subvectors and run
    Lloyd's k-means (L2, ``k_cent`` centroids) independently per
    subspace. Training reads a BOUNDED deterministic sample — the
    ``sample_n`` lowest-id vectors — and runs driver-side NumPy, the
    standard FAISS practice (codebooks are trained on ~10⁵ samples even
    for billion-vector indexes); nothing here scales with corpus size.

    Returns ``(m, k_cent, dim // m)`` float64 codebooks. Deterministic:
    init = the first ``k_cent`` sample subvectors; empty clusters keep
    their previous centroid; ties in assignment go to the lowest
    centroid id (NumPy argmin).
    """
    _tbl, x = _sample_matrix(emb, id_col, vec_col, sample_n)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    return _pq_lloyd(x, m, k_cent, iters)


def _pq_lloyd(
    x: np.ndarray, m: int, k_cent: int, iters: int, init: np.ndarray | None = None
) -> np.ndarray:
    """Per-subspace Lloyd's on a driver-side sample matrix — the shared
    trainer behind :func:`pq_train` (raw unit vectors) and
    :func:`ivfpq_topk` (coarse residuals).

    All ``m`` subspaces iterate in lockstep through ONE block-diagonal
    2D GEMM distance computation and ONE bincount/add.at centroid update
    per Lloyd round — the per-subspace Python loop this replaces cost
    ~2 s per fit at the 16×256/1024 defaults (~8× this form), which
    dominated the bench's ANN recall phase because pq/opq/ivfpq_topk
    each retrain per call. Same contract: init = the first ``k_cent``
    sample subvectors, empty clusters keep their previous centroid,
    assignment ties go to the lowest centroid id (argmin;
    ``-2x·c + ||c||²`` expands ``||x−c||²`` minus a per-row constant,
    the same form :func:`pq_encode` uses). ``init`` warm-starts the
    codebooks instead of the first-``k_cent`` init — the OPQ alternation
    carries its books across rotations with it (Ge et al.'s actual
    non-parametric procedure) instead of refitting from scratch."""
    _cap_blas_threads()
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    # a codebook can't have more centroids than training points — clamp
    # (small-SF fixtures hit this with the 256-centroid default)
    k_cent = min(int(k_cent), len(x)) if init is None else int(init.shape[1])
    dsub = dim // m
    n = len(x)
    x = np.ascontiguousarray(x, dtype=np.float64)
    if init is not None:
        books = np.array(init, dtype=np.float64)  # copy — updated in place
    else:
        # books[s] starts as the first k_cent subvectors of subspace s
        books = np.ascontiguousarray(
            x[:k_cent].reshape(k_cent, m, dsub).transpose(1, 0, 2)
        )  # (m, k_cent, dsub)
    flat_x = x.reshape(n * m, dsub)  # row (i, s) = sample i's subvector s
    offs = np.arange(m) * k_cent
    bd = np.zeros((dim, m * k_cent), dtype=np.float64)
    # buffers reused across rounds: the (n, m·k) distance matrix is ~33 MB
    # at the 16×256/1024 defaults and a FRESH allocation per round costs
    # more than the GEMM itself (page-fault cost measured 29 ms alloc vs
    # 10.5 ms into a warm buffer) — same dgemm/subtract/argmax, so results
    # are bit-identical to the allocating form
    t = np.empty((n, m * k_cent), dtype=np.float64)
    t3 = t.reshape(n, m, k_cent)
    sums = np.empty((m * k_cent, dsub), dtype=np.float64)
    for _ in range(iters):
        # one well-shaped 2D GEMM for every subspace's dot products: the
        # (dim × m·k) operand is block-diagonal (books[s].T in block s),
        # so column block s of x @ bd is exactly sub_s @ books[s].T.
        # (A per-subspace (n,dsub)@(dsub,k) loop, or a 3D batched matmul,
        # degenerates into tiny threaded BLAS calls that thrash.)
        for s in range(m):
            bd[s * dsub : (s + 1) * dsub, s * k_cent : (s + 1) * k_cent] = books[s].T
        # argmin_c ||sub − c||² == argmax_c (sub·c − ||c||²/2), row-major
        np.dot(x, bd, out=t)
        np.subtract(t3, 0.5 * (books**2).sum(axis=2)[None, :, :], out=t3)
        assign = t3.argmax(axis=2)  # (n, m); ties → lowest centroid id
        flat = (assign + offs[None, :]).ravel()
        counts = np.bincount(flat, minlength=m * k_cent)
        sums[:] = 0.0
        np.add.at(sums, flat, flat_x)
        nz = counts > 0
        # sums rows are (s·k_cent + c); books rows are (s, c) — same order
        upd = books.reshape(m * k_cent, dsub)  # contiguous → view
        upd[nz] = sums[nz] / counts[nz, None]
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """PQ encoder: unit-normalize, split into subvectors, snap each to
    its nearest codebook centroid (L2 argmin, lowest id on ties) and pack
    the ``m`` uint8 codes into ONE BinaryType blob per vector — dim×4
    bytes of float32 become ``m`` bytes (32× at dim=64, m=8). Arrow-
    batched ``mapInPandas``; one distance matrix per (batch, subspace) —
    no per-row Python. Identical vectors encode to identical blobs.
    ``rotation`` (OPQ): an orthogonal matrix applied AFTER normalization
    — rotating a unit vector keeps it unit, so rotated-space cosines are
    the original cosines and the same codebook algebra applies."""
    import pandas as pd

    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, k_cent, dsub = books.shape
    if k_cent > 256:
        raise ValueError(f"k_cent {k_cent} overflows the uint8 code space")
    rot = None if rotation is None else np.ascontiguousarray(rotation, dtype=np.float64)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norm = np.linalg.norm(x, axis=1)
            x = x / np.maximum(norm[:, None], 1e-30)
            if rot is not None:
                x = x @ rot
            codes = np.empty((len(pdf), m), dtype=np.uint8)
            for s in range(m):
                sub = x[:, s * dsub : (s + 1) * dsub]
                # ||sub - c||² = ||sub||² - 2 sub·c + ||c||²; row term constant
                d2 = -2.0 * (sub @ books[s].T) + (books[s] ** 2).sum(axis=1)[None, :]
                codes[:, s] = d2.argmin(axis=1).astype(np.uint8)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": [c.tobytes() for c in codes]}
            )

    return emb.mapInPandas(kernel, schema=f"{id_col} long, codes binary")


def _pq_reconstruct(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Driver-side encode+decode of a sample matrix — the OPQ trainer's
    inner step (same L2 argmin / tie rule as :func:`pq_encode`)."""
    m, _, dsub = books.shape
    out = np.empty_like(x)
    for s in range(m):
        sub = x[:, s * dsub : (s + 1) * dsub]
        d2 = -2.0 * (sub @ books[s].T) + (books[s] ** 2).sum(axis=1)[None, :]
        out[:, s * dsub : (s + 1) * dsub] = books[s][d2.argmin(axis=1)]
    return out


def opq_train(
    emb: DataFrame,
    m: int = 16,
    k_cent: int = 256,
    sample_n: int = 1024,
    iters: int = 8,
    opq_iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """OPQ — Optimized Product Quantization (Ge et al., CVPR 2013,
    non-parametric variant): learn an ORTHOGONAL rotation R that
    redistributes variance across the ``m`` subspaces before product
    quantization, by alternating (a) PQ codebooks on the rotated sample
    and (b) the orthogonal-Procrustes solve ``R = U Vᵀ`` of
    ``SVD(Xᵀ X̂)`` (X = normalized sample, X̂ = its rotated-space PQ
    reconstruction). Same m bytes per vector, measurably higher recall
    when dimensions are correlated (this corpus: recall@10 at rescore=20
    moved 0.85 → 0.91 in the round-5 sweep).

    Driver-side on the bounded ``sample_n`` lowest-id sample like
    :func:`pq_train` — nothing scales with corpus size. Deterministic:
    identity init, NumPy SVD on the same matrix, the shared Lloyd's
    trainer. Returns (R: (dim, dim), codebooks: (m, k_cent, dim//m))."""
    _tbl, x = _sample_matrix(emb, id_col, vec_col, sample_n)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    return _opq_fit(x, m, k_cent, iters, opq_iters)


def _opq_fit(
    x: np.ndarray, m: int, k_cent: int, iters: int, opq_iters: int
) -> tuple[np.ndarray, np.ndarray]:
    """The pure OPQ-NP alternation on a normalized sample matrix — split
    out of :func:`opq_train` so the convergence properties (orthogonal
    R; non-increasing rotated-space quantization error) are directly
    property-testable without a Spark session.

    The codebooks WARM-START across alternations (Ge et al. 2013 §4:
    each non-parametric iteration runs ONE k-means update from the
    previous books, not a from-scratch refit): alternation 1 is a full
    ``iters``-round fit in the identity rotation (so the objective
    starts exactly at plain PQ's), later alternations are one Lloyd
    round each from the carried books, and a final full fit polishes in
    the converged rotation. Every step — re-assignment, centroid update,
    optimal Procrustes rotation — is objective-non-increasing, which is
    the property the contract test pins; the refit-per-alternation form
    this replaces did ~3× the Lloyd rounds for the same contract and
    dominated the bench's OPQ per-call wall."""
    dim = x.shape[1]
    r_mat = np.eye(dim)
    books = None
    for _ in range(int(opq_iters)):
        xr = x @ r_mat
        books = _pq_lloyd(xr, m, k_cent, iters if books is None else 1, init=books)
        xh = _pq_reconstruct(xr, books)
        u, _, vt = np.linalg.svd(x.T @ xh)
        r_mat = u @ vt
    books = _pq_lloyd(x @ r_mat, m, k_cent, iters, init=books)
    return r_mat, books


def pq_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    rescore: int = 100,
    m: int = 16,
    k_cent: int = 256,
    sample_n: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ ANN with asymmetric distance computation (ADC) + exact rescore:

    1. :func:`pq_train` fits the codebooks on a bounded sample
       (driver-side; corpus-size independent).
    2. :func:`pq_encode` turns every vector into an ``m``-byte code.
    3. The driver precomputes the ADC lookup table ``LUT[s][c] =
       q̂_sub(s) · codebook[s][c]`` (m × k_cent floats); the scan kernel
       reconstructs each vector's approximate cosine as
       ``Σ_s LUT[s][codes[s]] / ||reconstruction||`` with ONE fancy-index
       per Arrow batch — it reads only (id, codes), ~1/32nd of the
       embedding bytes, and reduces via TakeOrderedAndProject (no shuffle
       of the table).
    4. The top-``rescore`` approximate candidates (ties: id asc) are
       broadcast-joined back to the float vectors and exact-rescored; the
       exact top-``k`` of those is returned.

    Recall is governed by ``rescore`` vs the quantization error; the
    oracle entry pins an operating point where recall is exactly 1.0 and
    pytest asserts it (SQ8/LSH precedent), so the brute-force cosine SQL
    oracles the whole train→encode→ADC→rescore pipeline.

    Default codebooks are 16×256 trained on a 1024-vector sample (round-5
    recall sweep at sf0.1: 64-centroid/256-sample codebooks read 0.69
    recall@10 at rescore=20 vs 0.85 for these, 0.99 at rescore=50 — same
    16-byte code bandwidth, codebook training stays driver-side and
    corpus-size independent)."""
    books = pq_train(emb, m, k_cent, sample_n, id_col=id_col, vec_col=vec_col)
    return _pq_adc_topk(emb, books, None, query_vec, k, rescore, id_col, vec_col)


def _pq_adc_topk(
    emb: DataFrame,
    books: np.ndarray,
    rotation: np.ndarray | None,
    query_vec: list[float],
    k: int,
    rescore: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared ADC scan + exact rescore behind :func:`pq_topk` (rotation
    None) and :func:`opq_topk` (learned rotation): LUT and codes live in
    the (possibly rotated) space — rotation is orthogonal so rotated
    cosines ARE original cosines — while the final rescore reads the
    ORIGINAL float vectors."""
    import pandas as pd

    books = np.ascontiguousarray(books, dtype=np.float64)
    m = books.shape[0]
    dsub = books.shape[2]
    qv = np.asarray(query_vec, dtype=np.float64)
    qn = qv / max(float(np.linalg.norm(qv)), 1e-30)
    if rotation is not None:
        qn = qn @ rotation
    lut = np.stack(
        [books[s] @ qn[s * dsub : (s + 1) * dsub] for s in range(m)]
    )  # (m, k_cent)
    # ||reconstruction|| per code, for the cosine denominator
    cnorm2 = (books**2).sum(axis=2)  # (m, k_cent)
    rot = None if rotation is None else np.ascontiguousarray(rotation, dtype=np.float64)

    def score(batches):
        # encode + ADC fused in ONE kernel pass for the AD-HOC path (the
        # per-row normalize/rotate/argmin arithmetic is pq_encode's
        # verbatim, then the LUT lookup on the codes it just produced —
        # one Python boundary crossing instead of encode-kernel →
        # score-kernel). On the materialized layout pass 1 reads STORED
        # codes instead and only the LUT half runs.
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            x /= np.maximum(np.linalg.norm(x, axis=1)[:, None], 1e-30)
            if rot is not None:
                x = x @ rot
            c = np.empty((len(pdf), m), dtype=np.int64)
            for s in range(m):
                sub_x = x[:, s * dsub : (s + 1) * dsub]
                d2 = -2.0 * (sub_x @ books[s].T) + (books[s] ** 2).sum(axis=1)[None, :]
                c[:, s] = d2.argmin(axis=1)
            sub = np.arange(m)[None, :]
            num = lut[sub, c].sum(axis=1)
            rec = np.sqrt(np.maximum(cnorm2[sub, c].sum(axis=1), 1e-30))
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "approx": num / rec}
            )

    cand = (
        emb.select(id_col, vec_col)
        .mapInPandas(score, schema=f"{id_col} long, approx double")
        .orderBy(F.desc("approx"), F.asc(id_col))
        .limit(int(rescore))
    )
    rescored = F.broadcast(cand.select(id_col)).join(emb, id_col).select(
        F.col(id_col).alias("vec_id"),
        _cosine(F.col(vec_col), [float(x) for x in query_vec]).alias("cosine"),
    )
    return rescored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def opq_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    rescore: int = 100,
    m: int = 16,
    k_cent: int = 256,
    sample_n: int = 1024,
    opq_iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """OPQ ANN (Ge et al. 2013): :func:`opq_train` learns the orthogonal
    rotation + codebooks on the bounded sample, then the SAME m-byte
    ADC scan and broadcast exact rescore as :func:`pq_topk` run in the
    rotated space (rotation preserves cosines, the rescore reads the
    original floats). Same code bandwidth as PQ, higher recall on
    correlated dimensions — this corpus's recall@10 at rescore=20 moves
    0.85 → 0.91 (bench recall table; the oracle entry pins a rescore
    where recall is exactly 1.0, the PQ/SQ8 precedent)."""
    r_mat, books = opq_train(
        emb, m, k_cent, sample_n, opq_iters=opq_iters, id_col=id_col, vec_col=vec_col
    )
    return _pq_adc_topk(emb, books, r_mat, query_vec, k, rescore, id_col, vec_col)


def ivfpq_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int | None = 4,
    rescore: int = 100,
    n_lists: int = 16,
    m: int = 16,
    k_cent: int = 256,
    sample_n: int = 1024,
    coarse_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ with residual encoding — the canonical billion-scale FAISS
    architecture (IndexIVFPQ), composed from the engine's existing
    pieces:

    * coarse quantizer: :func:`train_centroids` (distributed spherical
      k-means); the :func:`ivf_assign` rule then gives every vector a
      ``list_id`` inside the scan kernel (a sample-trained driver-side
      coarse quantizer was tried for the per-call cost and REVERTED:
      recall@10 at nprobe=4 fell 0.96 → 0.88 at the bench corpus, where
      the 1024-row sample is half the table — the distributed trainer's
      quality is the point of the knob);
    * fine quantizer: PQ codebooks (:func:`_pq_lloyd`) trained on the
      RESIDUALS ``x̂ − c_list`` of a bounded driver-side sample — encoding
      the residual instead of the vector is what makes m bytes go much
      further once the coarse cell has soaked up most of the energy;
    * search: centroids ranked driver-side, the top-``nprobe`` lists
      scanned (on the materialized layout — :func:`build_ivf_index` +
      the codes column — this is partition pruning; here a filter on the
      assignment), approximate score = ``q̂·c_list + Σ_s LUT[s][code_s]``
      (plain ADC inner product on the reconstruction, per-list constant
      + one lookup-table fancy-index per Arrow batch), then the
      top-``rescore`` candidates broadcast-join back to the float
      vectors for the exact cosine and the exact top-``k`` is returned.

    ``nprobe=None`` probes every list, which removes coarse-quantizer
    loss entirely — with ``rescore`` covering the PQ error that is the
    oracle-able recall-1.0 operating point (the IVF all-lists + SQ8/PQ
    pinning precedents combined). Production points (nprobe ≪ n_lists)
    are reported in the bench recall table instead; the 16×256/1024-sample
    residual codebook defaults put nprobe=4 + rescore=50 at 0.96 recall@10
    (round-5 sf0.1 sweep; 64×256-sample codebooks read 0.63 at rescore=20).
    """
    import pandas as pd

    cent = train_centroids(emb, n_lists, coarse_iters, id_col, vec_col)
    cent_n = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)
    # residual PQ codebooks from the bounded deterministic sample; the
    # sample's coarse assignment is one tiny driver-side matmul (the
    # ivf_assign rule verbatim) — collecting the sample RAW saves the
    # corpus-wide assignment pass the old sample-after-assignment shape
    # paid before sampling 1024 rows of it
    _tbl, xr = _sample_matrix(emb, id_col, vec_col, sample_n)
    x = xr / np.maximum(np.linalg.norm(xr, axis=1, keepdims=True), 1e-30)
    lids = (x @ cent_n.T).argmax(axis=1)
    books = _pq_lloyd(x - cent_n[lids], m, k_cent, iters=8)
    dsub = books.shape[2]

    qv = np.asarray(query_vec, dtype=np.float64)
    qn = qv / max(float(np.linalg.norm(qv)), 1e-30)
    lut = np.stack([books[s] @ qn[s * dsub : (s + 1) * dsub] for s in range(m)])
    qdotc = cent_n @ qn  # per-list constant term

    sims = cent_n @ qn
    if nprobe is None:
        lists = list(range(n_lists))
    else:
        order = np.lexsort((np.arange(sims.size), -sims))[: int(nprobe)]
        lists = sorted(int(i) for i in order)

    lists_arr = np.array(lists, dtype=np.int64)

    def score(batches):
        # assignment + probe filter + residual ADC fused into ONE kernel
        # pass (guide §4.1: one Python boundary crossing, not an assign
        # kernel → JVM filter → score kernel ping-pong); the per-row
        # normalize/argmax/encode arithmetic is the ivf_assign +
        # residual-encode math verbatim, so candidates are unchanged
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
            li = (v @ cent_n.T).argmax(axis=1)
            keep = np.isin(li, lists_arr)
            if not keep.any():
                continue
            v, li, ids = v[keep], li[keep], pdf[id_col].to_numpy()[keep]
            res = v - cent_n[li]
            codes = np.empty((len(ids), m), dtype=np.int64)
            for s in range(m):
                sub = res[:, s * dsub : (s + 1) * dsub]
                d2 = -2.0 * (sub @ books[s].T) + (books[s] ** 2).sum(axis=1)[None, :]
                codes[:, s] = d2.argmin(axis=1)
            subi = np.arange(m)[None, :]
            approx = qdotc[li] + lut[subi, codes].sum(axis=1)
            yield pd.DataFrame({id_col: ids, "approx": approx})

    cand = (
        emb.select(id_col, vec_col)
        .mapInPandas(score, schema=f"{id_col} long, approx double")
        .orderBy(F.desc("approx"), F.asc(id_col))
        .limit(int(rescore))
    )
    rescored = F.broadcast(cand.select(id_col)).join(emb, id_col).select(
        F.col(id_col).alias("vec_id"),
        _cosine(F.col(vec_col), [float(x_) for x_ in query_vec]).alias("cosine"),
    )
    return rescored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    k_rrf: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
    combine lexical (BM25) and dense (cosine) retrieval without score
    calibration: ``rrf(d) = Σ_lists 1/(k_rrf + rank_list(d))``, summed
    over the lists that contain ``d``. Input: one DataFrame per ranked
    list with columns ``(id_col, rank)`` (rank 1-based, each list already
    truncated to its candidate depth — RRF fuses CANDIDATE LISTS, never
    corpora, so every input here is ≤ depth rows and the joins are
    trivia; the heavy lifting stays inside the per-list retrievals).
    Output: ``(id_col, rrf)`` top-``k``, ties by id ascending. The two
    reciprocal terms add commutatively in IEEE double, so the score is
    bit-identical across engines given identical input ranks."""
    if not ranked:
        raise ValueError("need at least one ranked list")
    fused = None
    terms = []
    for i, df in enumerate(ranked):
        d = df.select(F.col(id_col), F.col("rank").alias(f"__r{i}"))
        fused = d if fused is None else fused.join(d, id_col, "full_outer")
        terms.append(
            F.coalesce(F.lit(1.0) / (F.lit(int(k_rrf)) + F.col(f"__r{i}")), F.lit(0.0))
        )
    expr = terms[0]
    for t in terms[1:]:
        expr = expr + t
    return (
        fused.select(id_col, expr.alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
    )


def comb_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    method: str = "sum",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """CombSUM / CombMNZ score fusion (Fox & Shaw 1994) — the other
    classic hybrid-retrieval combiner next to :func:`rrf_fuse`: each
    candidate list's scores are min-max normalized over THE LIST
    (``(s − min)/(max − min)``; a constant list normalizes to 1.0 —
    every candidate is equally top), CombSUM sums the normalized scores
    over the lists containing the doc (missing contributes 0), and
    CombMNZ multiplies that sum by the number of lists that matched —
    rewarding consensus between the lexical and dense views.

    Input: one DataFrame per list with columns ``(id_col, score_col)``,
    each already truncated to its candidate depth (like RRF, this fuses
    CANDIDATE LISTS, never corpora — every input is ≤ depth rows, the
    min/max are 1-row broadcast aggregates and the joins are trivia).
    Output: ``(id_col, comb)`` top-``k``, ties by id ascending.

    Determinism: normalization is one subtraction and one IEEE division
    of exact list aggregates, the cross-list sum adds commutatively,
    and the MNZ multiplier is an integer — so given bit-identical input
    scores (this repo's BM25 and cosine both are) the fused score is
    bit-identical across engines."""
    if method not in ("sum", "mnz"):
        raise ValueError(f"method must be 'sum' or 'mnz', got {method!r}")
    if not ranked:
        raise ValueError("need at least one ranked list")
    fused = None
    for i, df in enumerate(ranked):
        stats = df.agg(
            F.min(score_col).alias(f"__mn{i}"), F.max(score_col).alias(f"__mx{i}")
        )
        d = df.crossJoin(F.broadcast(stats)).select(
            F.col(id_col),
            F.when(F.col(f"__mx{i}") == F.col(f"__mn{i}"), F.lit(1.0))
            .otherwise(
                (F.col(score_col) - F.col(f"__mn{i}"))
                / (F.col(f"__mx{i}") - F.col(f"__mn{i}"))
            )
            .alias(f"__s{i}"),
        )
        fused = d if fused is None else fused.join(d, id_col, "full_outer")
    total = F.lit(0.0)
    nz = F.lit(0)
    for i in range(len(ranked)):
        total = total + F.coalesce(F.col(f"__s{i}"), F.lit(0.0))
        nz = nz + F.when(F.col(f"__s{i}").isNotNull(), 1).otherwise(0)
    comb = total * nz.cast("double") if method == "mnz" else total
    return (
        fused.select(id_col, comb.alias("comb"))
        .orderBy(F.desc("comb"), F.asc(id_col))
        .limit(k)
    )


def _collect_queries(
    queries: DataFrame, q_id_col: str, q_vec_col: str, max_queries: int
) -> tuple[np.ndarray, np.ndarray]:
    """Bounded driver-side collect of the query batch: (ids, matrix).
    Raises loudly past ``max_queries`` instead of silently OOMing the
    driver — batched kNN broadcasts the query matrix to every task, so
    its size is a hard design bound, not a soft one."""
    n = queries.count()
    if n > max_queries:
        raise ValueError(
            f"knn_join query batch has {n} rows > max_queries={max_queries}; "
            "split the batch (the query matrix is broadcast to every task)"
        )
    rows = queries.select(q_id_col, q_vec_col).orderBy(q_id_col).collect()
    qids = np.array([r[q_id_col] for r in rows], dtype=np.int64)
    qm = np.array([[float(x) for x in r[q_vec_col]] for r in rows], dtype=np.float64)
    return qids, qm


def knn_join(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "qid",
    q_vec_col: str = "embedding",
    max_queries: int = 65536,
) -> DataFrame:
    """Batched exact cosine kNN join: for EVERY query in ``queries``, the
    top-``k`` neighbors from ``emb`` — ``(qid, vec_id, rank, cosine)``,
    rank 1-based per query, ties by ``vec_id`` ascending. This is the
    many-query complement of :func:`cosine_topk` (which plans one
    TakeOrderedAndProject per query and therefore one job per query).

    Shape for 100 TB: the query matrix (bounded by ``max_queries``,
    raises loudly beyond it) is broadcast inside an Arrow ``mapInPandas``
    kernel; each batch computes ONE normalized matmul (n×d @ d×q) and
    keeps only its LOCAL top-k per query, so at most q×k rows leave each
    Arrow batch regardless of corpus size. The global merge is a single
    window over those q×k×batches candidate rows, hash-partitioned by
    qid — the corpus itself is scanned once and never shuffled. Local
    top-k per batch is lossless: the global top-k is a subset of every
    superset's local top-k under the same (cosine desc, id asc) order.
    """
    from pyspark.sql import Window

    qids, qm = _collect_queries(queries, q_id_col, q_vec_col, max_queries)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
            ids = pdf[id_col].to_numpy().astype(np.int64)
            s = x @ qn.T  # (n, q)
            kk = min(k, len(ids))
            out_q, out_id, out_c = [], [], []
            for j in range(qn.shape[0]):
                col = s[:, j]
                # top-k by (cosine desc, id asc): lexsort is stable & total
                order = np.lexsort((ids, -col))[:kk]
                out_q.append(np.full(kk, qids[j]))
                out_id.append(ids[order])
                out_c.append(col[order])
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_id),
                    "cosine": np.concatenate(out_c),
                }
            )

    cand = emb.select(id_col, vec_col).mapInPandas(
        kernel, schema="qid long, vec_id long, cosine double"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", "cosine")
    )


def hard_negatives(
    emb: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "qid",
    pos_id_col: str = "pos_id",
) -> DataFrame:
    """Hard-negative mining for retrieval training (the DPR/contrastive
    practice): for every query, the top-``k`` most similar corpus
    vectors EXCLUDING the query's labeled positives and the query's own
    vector id (qids are assumed to live in the corpus id space; a qid
    absent from the corpus makes the self-exclusion a no-op). Returns
    (qid, vec_id, rank, cosine), rank 1-based per query, (cosine desc,
    id asc) total order.

    Scale shape: ONE :func:`knn_join` pass fetching k + max_positives + 1
    candidates per query (enough that the exclusions can never starve a
    query below k), a BROADCAST anti-join against the label set (labels
    are training-pair sized, corpus never shuffles), and the same
    qid-keyed window re-rank knn_join already does."""
    from pyspark.sql import Window

    max_pos = int(
        positives.groupBy(q_id_col).count().agg(F.max("count")).collect()[0][0] or 0
    )
    cand = knn_join(
        emb, queries, k + max_pos + 1,
        id_col=id_col, vec_col=vec_col, q_id_col=q_id_col,
    ).drop("rank")
    excl = positives.select(
        F.col(q_id_col), F.col(pos_id_col).cast("long").alias("vec_id")
    ).unionByName(
        queries.select(F.col(q_id_col), F.col(q_id_col).cast("long").alias("vec_id"))
    )
    neg = cand.join(F.broadcast(excl), [q_id_col, "vec_id"], "left_anti")
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        neg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(q_id_col, "vec_id", "rank", "cosine")
    )


def knn_join_ivf(
    spark,
    warehouse_path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int | None = 2,
    q_id_col: str = "qid",
    q_vec_col: str = "embedding",
    max_queries: int = 65536,
) -> DataFrame:
    """Batched kNN join routed through a :func:`build_ivf_index` warehouse:
    each query probes only its ``nprobe`` nearest inverted lists
    (``nprobe=None`` probes ALL lists — exact, the oracle operating
    point). Routing is driver-side NumPy over the tiny codebook; the
    plan is a partition-pruned scan of the union of routed lists, ONE
    broadcast join against the (qid, list_id, query_vec) routing table —
    so each base row is scored only against the queries routed to its
    list — exact fold-order cosine (:func:`_pair_cosine`, bit-identical
    to the SQL oracle), and ONE window per qid over the surviving rows.
    No Python in the scoring path."""
    from pyspark.sql import Window

    from kafka_elasticsearch_standalone_consumer_spark.tables import Warehouse

    wh = Warehouse(warehouse_path)
    meta = wh.read_meta(IVF_META)
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    cent_n = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)
    qids, qm = _collect_queries(queries, q_id_col, q_vec_col, max_queries)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    n_lists = cent_n.shape[0]
    np_ = n_lists if nprobe is None else min(nprobe, n_lists)
    sims = qn @ cent_n.T  # (q, n_lists)
    routing = []
    for j in range(qn.shape[0]):
        order = np.lexsort((np.arange(n_lists), -sims[j]))[:np_]
        for li in sorted(int(x) for x in order):
            routing.append((int(qids[j]), li, [float(x) for x in qm[j]]))
    rt = spark.createDataFrame(routing, "qid long, list_id int, qvec array<double>")
    lists = sorted({li for _, li, _ in routing})
    base = wh.read(spark, IVF_TABLE).filter(F.col("list_id").isin(lists))
    scored = (
        base.join(F.broadcast(rt), "list_id")
        .select(
            "qid",
            F.col(meta["id_col"]).cast("long").alias("vec_id"),
            _pair_cosine(F.col(meta["vec_col"]), F.col("qvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", "cosine")
    )
