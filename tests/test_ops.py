"""Training-data pipeline operators: dedup, similarity, text stats, media."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

A = "the quick brown fox jumps over the lazy dog near the old river bank today"
A_NEAR = "the quick brown fox jumps over the lazy dog near the old river bank tonight"
B = "completely different text about spark shuffles and posting lists compression"
C = "unrelated words describing benchmark throughput at massive industrial scale"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, A), (1, A_NEAR), (2, B), (3, C), (4, A)]  # 4 is exact dup of 0
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def _py_jaccard(x, y, n=3):
    tx = x.lower().split()
    ty = y.lower().split()
    sx = {" ".join(tx[i : i + n]) for i in range(len(tx) - n + 1)}
    sy = {" ".join(ty[i : i + n]) for i in range(len(ty) - n + 1)}
    return len(sx & sy) / len(sx | sy)


def test_exact_dedup(docs):
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import exact_dedup

    out = {r["keep_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0 and 4 collapse, min id kept
    assert out[1] == 1 and out[2] == 1 and out[3] == 1


def test_jaccard_pairs_matches_python(docs):
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import jaccard_pairs

    got = {(r["id1"], r["id2"]): r["jaccard"] for r in jaccard_pairs(docs, threshold=0.5).collect()}
    assert (0, 4) in got and got[(0, 4)] == 1.0
    assert (0, 1) in got
    assert abs(got[(0, 1)] - _py_jaccard(A, A_NEAR)) < 1e-9
    assert all(k in {(0, 1), (0, 4), (1, 4)} for k in got)


def test_jaccard_pairs_max_df_guards_hot_shingles(spark):
    """The df-cap guard: a universal boilerplate shingle shared by EVERY
    doc (the quadratic-join case at crawl scale) is dropped from the
    shingle universe before the candidate join; real near-dups that share
    ordinary shingles are still found, and pairs whose only overlap was
    the hot shingle disappear."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import jaccard_pairs

    boiler = "copyright footer notice"
    rows = [(i, f"{boiler} unique{i} alpha{i} beta{i} gamma{i}") for i in range(30)]
    # a genuine near-dup pair sharing most non-boilerplate shingles
    rows.append((100, f"{boiler} the quick brown fox jumps over the lazy dog"))
    rows.append((101, f"{boiler} the quick brown fox jumps over the lazy cat"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in jaccard_pairs(df, threshold=0.5, max_df=5).collect()
    }
    assert (100, 101) in capped and len(capped) == 1
    # over the capped universe the universal 'copyright footer notice'
    # shingle (df=32 > 5) is gone: 9 surviving shingles per doc, 8 shared
    # (only 'the lazy dog'/'the lazy cat' differ) -> 8/10
    assert abs(capped[(100, 101)] - 8 / 10) < 1e-9

    # the cap only removes hot-shingle-driven pairs; with a threshold the
    # boilerplate alone could never clear, uncapped finds the same pair
    uncapped = {
        (r["id1"], r["id2"]) for r in jaccard_pairs(df, threshold=0.5).collect()
    }
    assert (100, 101) in uncapped


def test_minhash_lsh_finds_near_dups(docs):
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import minhash_lsh_pairs

    got = {(r["id1"], r["id2"]): r["jaccard"] for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    # exact dup always collides in every band; near-dup (j≈0.86) collides whp
    assert (0, 4) in got and got[(0, 4)] == 1.0
    assert (0, 1) in got
    assert abs(got[(0, 1)] - _py_jaccard(A, A_NEAR)) < 1e-9
    # verification stage guarantees no false positives
    assert all(v >= 0.5 for v in got.values())


def test_simhash_exact_dup_zero_distance(docs):
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import simhash, simhash_pairs

    fps = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert fps[0] == fps[4]
    pairs = {(r["id1"], r["id2"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs[(0, 4)] == 0


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").persist(), vecs


def test_cosine_topk_matches_numpy(emb):
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import cosine_topk

    df, vecs = emb
    q = vecs[0].astype(np.float64)
    sims = (vecs.astype(np.float64) @ q) / (
        np.linalg.norm(vecs.astype(np.float64), axis=1) * np.linalg.norm(q)
    )
    want = sorted(range(40), key=lambda i: (-sims[i], i))[:5]
    got = cosine_topk(df, [float(x) for x in q], 5).collect()
    assert [r["vec_id"] for r in got] == want
    for r in got:
        assert abs(r["cosine"] - sims[r["vec_id"]]) < 1e-9


def test_lsh_topk_contains_self(emb):
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import lsh_topk

    df, vecs = emb
    got = lsh_topk(df, [float(x) for x in vecs[0]], 5, bits=6).collect()
    assert got[0]["vec_id"] == 0 and abs(got[0]["cosine"] - 1.0) < 1e-9


def test_ivf_assign(emb):
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import ivf_assign

    df, vecs = emb
    cents = vecs[:4].astype(np.float64)
    got = {r["vec_id"]: r["list_id"] for r in ivf_assign(df, cents).collect()}
    assert len(got) == 40
    for i in range(4):  # a centroid's own vector maps to itself
        assert got[i] == i


def test_quality_features_values(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import quality_features

    df = spark.createDataFrame([(1, "The cat, the hat!")], "doc_id long, text string")
    r = quality_features(df).collect()[0]
    assert r["n_chars"] == 17
    assert r["n_tokens_ws"] == 4
    assert r["n_tokens_bpe"] == 6  # The cat , the hat !
    assert abs(r["stopword_ratio"] - 0.5) < 1e-6  # the, the of 4 tokens
    assert abs(r["punct_ratio"] - 2 / 17) < 1e-5
    assert abs(r["mean_token_len"] - 3.0) < 1e-5


def test_token_entropy_hand_values(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import token_entropy

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # single term: H = 0 exactly
            (2, "a b c d"),          # uniform over 4: H = ln 4
            (3, "a a b"),            # H = ln3 - (2 ln2)/3
            (4, ""),                 # no tokens: dropped
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["dl"], r["entropy"]) for r in token_entropy(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == (4, 0.0)
    assert got[2][1] == pytest.approx(math.log(4.0), abs=1e-12)
    assert got[3][1] == pytest.approx(math.log(3.0) - 2 * math.log(2.0) / 3, abs=1e-12)


def test_pool_embeddings_matches_hand_mean(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        pool_embeddings,
    )

    rows = [
        (0, [1.0, 2.0, 3.0], "a"),
        (1, [3.0, 2.0, 1.0], "a"),
        (2, [10.0, 0.0, -2.0], "b"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    for det in (True, False):
        got = {
            (r["grp"], r["dim"]): (r["mean"], r["n"])
            for r in pool_embeddings(df, deterministic=det).collect()
        }
        assert got[("a", 0)] == (2.0, 2) and got[("a", 1)] == (2.0, 2)
        assert got[("a", 2)] == (2.0, 2)
        assert got[("b", 0)] == (10.0, 1) and got[("b", 2)] == (-2.0, 1)
        assert len(got) == 6
    # deterministic fold order: ascending vec_id, seeded by the first
    # vector (no 0.0+ prefix) — equals the plain sum here exactly
    det = pool_embeddings(df, deterministic=True).collect()
    loose = pool_embeddings(df, deterministic=False).collect()
    assert {tuple(r) for r in det} == {tuple(r) for r in loose}


def test_nb_classify_matches_hand_computation(spark):
    """Multinomial NB with Laplace smoothing, hand-recomputed: class-
    specific vocabulary must classify correctly, and the log-posterior
    matches the closed form to the 4-dp rounding."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import nb_classify

    rows = [
        (0, "spark spark shuffle", "a"),
        (1, "spark join", "a"),
        (2, "cat dog cat", "b"),
        (3, "dog dog", "b"),
        (4, None, None),  # NULL label: dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: (r["pred"], r["score_r"]) for r in nb_classify(df).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert [got[d][0] for d in range(4)] == ["a", "a", "b", "b"]
    # hand-check doc 2 under class b: tokens cat,cat,dog; c_b=5 tokens,
    # V=5 (spark shuffle join cat dog), c_cat_b=2, c_dog_b=3, prior 2/4
    want = math.log(2 / 4) + 2 * math.log((2 + 1) / (5 + 5)) + 1 * math.log((3 + 1) / (5 + 5))
    assert got[2][1] == pytest.approx(round(want, 4), abs=1e-9)


def test_nearest_centroid_recovers_separated_clusters(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        nearest_centroid,
        pool_embeddings,
    )

    rows = [
        (0, [1.0, 0.0, 0.1], "x"),
        (1, [0.9, 0.1, 0.0], "x"),
        (2, [0.0, 1.0, 0.1], "y"),
        (3, [0.1, 0.9, 0.0], "y"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    cents = pool_embeddings(df, deterministic=True)
    for det in (True, False):
        got = {
            r["vec_id"]: (r["pred"], r["cos"])
            for r in nearest_centroid(df, cents, deterministic=det).collect()
        }
        assert {v: p for v, (p, _) in got.items()} == {0: "x", 1: "x", 2: "y", 3: "y"}
        assert all(0.9 < c <= 1.0 + 1e-12 for _, c in got.values())


def test_leakage_safe_split_moves_contaminated_eval_docs(spark):
    """Planted leak: one hash-eval doc copies a train doc's 8-gram run —
    it must come back as 'train'; an eval doc with unique text stays
    'eval'; every input doc gets exactly one verdict."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import (
        leakage_safe_split,
    )

    # find ids that hash under/over the 0.5 threshold deterministically
    import hashlib

    def u(i, seed=42):
        return int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8], 16) / 2**32

    ev_ids = [i for i in range(100) if u(i) < 0.5][:2]
    tr_ids = [i for i in range(100) if u(i) >= 0.5][:1]
    shared = "q w e r t y u i o p"  # a 10-token run: shares 8-grams
    rows = [
        (ev_ids[0], shared),                    # leaked: shares with train
        (ev_ids[1], "z x c v b n m k j h"),     # clean: unique 8-grams
        (tr_ids[0], shared + " extra tail"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(df, eval_frac=0.5, n=8, seed=42).collect()
    }
    assert len(got) == 3
    assert got[ev_ids[0]] == "train"  # moved back by the leakage rule
    assert got[ev_ids[1]] == "eval"
    assert got[tr_ids[0]] == "train"


def test_zipf_fit_recovers_planted_exponent(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import zipf_fit

    # Plant an exactly Zipfian corpus: term ti appears round(720/i) times.
    words = []
    freqs = {}
    for i in range(1, 13):
        c = round(720 / i)
        freqs[f"t{i:02d}"] = c
        words += [f"t{i:02d}"] * c
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    r = zipf_fit(df, top_n=12).collect()[0]
    # Hand OLS on the same (ln rank, ln freq) points.
    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(float(c)) for _, c in ranked]
    n = float(len(xs))
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    assert r["n_terms"] == 12
    assert r["slope"] == pytest.approx(slope, abs=1e-9)
    assert r["intercept"] == pytest.approx(intercept, abs=1e-9)
    assert -1.05 < r["slope"] < -0.95  # the planted exponent


def test_lang_guess(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import lang_guess

    df = spark.createDataFrame(
        [(1, "the cat is on the mat and it is happy"), (2, "gato perro casa rojo azul verde")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_guess"] for r in lang_guess(df).collect()}
    assert got == {1: "en", 2: "other"}


def test_lang_guess_trigram(spark):
    """Trigram-profile language ID: planted fr/de/es/en sentences land on
    their language (argmax of integer occurrence counts, ties lang asc);
    a no-profile-hit doc reports 'und' with score 0; sub-3-char and
    NULL docs don't trip Spark's descending sequence(1, 0)."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        lang_guess_trigram,
    )

    rows = [
        (1, "vous avez des questions et vous les donnez dans la ville pour que les amis"),
        (2, "der hund und die katze sind nicht in der stadt und das ist ein schnelles schiff"),
        (3, "el perro y el gato que estaban en la casa con una paloma para los amigos"),
        (4, "the cat is on the mat and it is happy"),
        (5, "xxxx qqqq zzzz"),
        (6, "ab"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["lang"], r["score"]) for r in lang_guess_trigram(df).collect()}
    assert got[1][0] == "fr" and got[2][0] == "de" and got[3][0] == "es"
    assert got[4][0] == "en" and got[4][1] > 0
    assert got[5] == ("und", 0) and got[6] == ("und", 0) and got[7] == ("und", 0)
    assert len(got) == len(rows)


def test_fingerprint_properties(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import fingerprint

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha  beta\tgamma"), (3, "gamma beta alpha")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert fp[1] == fp[2]  # whitespace-normalization invariant
    assert fp[1] != fp[3]  # order-sensitive


def test_media_pipeline(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.multimodal import (
        extract_features,
        resize_images,
        sample_frames,
        synth_media,
    )

    media = synth_media(spark, n=12, partitions=2).persist()
    feats = extract_features(media, decoder="fake").collect()
    assert len(feats) == 12
    by_id = {r["media_id"]: r for r in feats}
    raw = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, r in by_id.items():
        assert r["n_bytes"] == len(raw[mid])
        assert sum(r["byte_hist"]) == len(raw[mid])
    thumbs = resize_images(media, out_w=8).collect()
    assert all(len(bytes(t["thumb"])) == 8 for t in thumbs)
    frames = sample_frames(media, every_ms=500).collect()
    assert len(frames) > 0 and all(f["t_ms"] % 500 == 0 for f in frames)


def test_media_stub_raises(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.multimodal import (
        extract_features,
        synth_media,
    )

    media = synth_media(spark, n=2, partitions=1)
    with pytest.raises(Exception, match="(?i)not.*implemented|NotImplementedError|Pillow|ffmpeg"):
        extract_features(media, decoder="stub").collect()


def test_cosine_dup_pairs_exact_matches_numpy(emb):
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        cosine_dup_pairs,
        cosine_dup_pairs_lsh,
    )

    emb, _vecs = emb
    rows = emb.collect()
    m = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    c = mn @ mn.T
    thr = float(np.quantile(c[np.triu_indices(len(m), 1)], 0.98))
    want = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(m))
        for j in range(i + 1, len(m))
        if c[i, j] >= thr
    }
    want = {(min(a, b), max(a, b)) for a, b in want}
    got_rows = cosine_dup_pairs(emb, thr).collect()
    got = {(r["id1"], r["id2"]) for r in got_rows}
    assert got == want
    for r in got_rows:  # scores agree with numpy within float tolerance
        i = int(np.flatnonzero(ids == r["id1"])[0])
        j = int(np.flatnonzero(ids == r["id2"])[0])
        assert abs(r["cosine"] - c[i, j]) < 1e-9
    # LSH variant: no false positives, sane recall on this tiny set
    lsh = {(r["id1"], r["id2"]) for r in cosine_dup_pairs_lsh(emb, thr).collect()}
    assert lsh <= want
    if want:
        assert len(lsh) >= len(want) * 0.5


SF001 = "/root/testdata/sf0.01"  # the driver's correctness-gate corpus


def test_entry_lsh_operating_points(spark):
    """The driver entries dedup_minhash_lsh / cosine_dup_pairs_lsh share
    EXACT-algorithm DuckDB oracles because recall is 100% at their pinned
    operating points on the sf0.01 corpus — assert that here (both are
    deterministic given the fixed permutations/hyperplanes, so this cannot
    flake) so the oracles stay valid."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
    )
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        cosine_dup_pairs,
        cosine_dup_pairs_lsh,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    j = {(r["id1"], r["id2"]) for r in jaccard_pairs(docs, threshold=0.8).collect()}
    m = {(r["id1"], r["id2"]) for r in minhash_lsh_pairs(docs, threshold=0.8).collect()}
    assert j and m == j  # 100% recall, no false positives
    ex = {(r["id1"], r["id2"]) for r in cosine_dup_pairs(emb, 0.4).collect()}
    lsh = {
        (r["id1"], r["id2"])
        for r in cosine_dup_pairs_lsh(emb, 0.4, bits=64, bands=32).collect()
    }
    assert ex and lsh == ex


def test_simhash_portable_hash_matches_brute(spark, docs):
    """The portable (md5-prefix) term hash must reproduce the exact same
    simhash as a pure-Python reimplementation — this is the contract the
    DuckDB oracle of the dedup_simhash driver entry relies on."""
    import hashlib
    import re
    from collections import Counter

    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import (
        portable_term_hash,
        simhash,
    )

    got = {r["doc_id"]: r["simhash"] for r in
           simhash(docs, hash_expr=portable_term_hash()).collect()}
    for row in docs.collect():
        tf = Counter(re.findall(r"[a-z0-9]+", row["text"].lower()))
        sums = [0.0] * 60
        for term, n in tf.items():
            h = int(hashlib.md5(term.encode()).hexdigest()[:15], 16)
            for b in range(60):
                sums[b] += n if (h >> b) & 1 else -n
        want = sum(1 << b for b in range(60) if sums[b] > 0)
        assert got[row["doc_id"]] == want, row["doc_id"]


def test_materialized_ann_matches_adhoc_and_ivf_finds_self(spark, emb, tmp_path):
    """ann_topk_indexed must be rank-identical to the ad-hoc lsh_topk at the
    same bits (same planes, same probe set); ivf_search must always find the
    query vector itself (its own list is by construction the top probe)."""
    import numpy as np

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        ann_topk_indexed,
        build_ann_index,
        build_ivf_index,
        ivf_search,
        lsh_topk,
    )

    df, vecs = emb
    qv = [float(x) for x in vecs[0]]
    ann_wh = str(tmp_path / "ann")
    build_ann_index(df, ann_wh, bits=6, dim=len(qv))
    got = [(r["vec_id"], round(r["cosine"], 9))
           for r in ann_topk_indexed(spark, ann_wh, qv, 5).collect()]
    want = [(r["vec_id"], round(r["cosine"], 9))
            for r in lsh_topk(df, qv, 5, bits=6).collect()]
    assert got == want and got[0][0] == 0

    ivf_wh = str(tmp_path / "ivf")
    build_ivf_index(df, np.stack(vecs[:4]).astype(np.float64), ivf_wh)
    hits = ivf_search(spark, ivf_wh, qv, 5, nprobe=2).collect()
    assert hits and hits[0]["vec_id"] == 0 and abs(hits[0]["cosine"] - 1.0) < 1e-9


def test_train_centroids_improves_objective(spark, emb, tmp_path):
    """Distributed spherical k-means: the mean best-centroid cosine must
    not decrease with iterations, and an IVF index built on the trained
    codebook still finds the query itself."""
    import numpy as np

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        build_ivf_index,
        ivf_search,
        train_centroids,
    )

    df, vecs = emb
    m = np.stack(vecs).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)

    def objective(cent):
        c = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)
        return float((m @ c.T).max(axis=1).mean())

    c0 = train_centroids(df, 4, iters=0)
    c5 = train_centroids(df, 4, iters=5)
    assert objective(c5) >= objective(c0) - 1e-9
    wh = str(tmp_path / "ivftrained")
    build_ivf_index(df, c5, wh)
    qv = [float(x) for x in vecs[3]]
    hits = ivf_search(spark, wh, qv, 5, nprobe=2).collect()
    assert hits and hits[0]["vec_id"] == 3 and abs(hits[0]["cosine"] - 1.0) < 1e-9


def test_lsh_probe_convention_matches_column_at_bits64(emb):
    """ADVICE r2: the driver-side probe signature must use the same int64
    two's-complement convention as the lsh_signature Column (bit 63 →
    −2^63) or probes silently miss at bits=64. Assert bit-for-bit parity
    between the Column-computed sig and _py_signature for every vector,
    and that a 64-bit probe still finds the query's own bucket."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        _hyperplanes,
        _probe_sigs,
        _py_signature,
        lsh_signature,
        lsh_topk,
    )

    df, vecs = emb
    planes = _hyperplanes(16, 64)
    got = {
        r["vec_id"]: r["sig"]
        for r in df.select("vec_id", lsh_signature(F.col("embedding"), planes).alias("sig")).collect()
    }
    for i in range(len(vecs)):
        assert got[i] == _py_signature(planes, vecs[i].astype(np.float64)), i
    # some signature must use bit 63 somewhere in 40 random vectors
    assert any(s < 0 for s in got.values())
    qv = vecs[3].astype(np.float64)
    assert _py_signature(planes, qv) in _probe_sigs(planes, qv, probe_hamming=1)
    out = lsh_topk(df, [float(x) for x in qv], 5, bits=64).collect()
    assert out and out[0]["vec_id"] == 3 and abs(out[0]["cosine"] - 1.0) < 1e-9


def test_lm_doc_quality_hand_computed(spark):
    """Tiny corpus where the add-0.5 Laplace bigram nll is computable by
    hand: vocab {a,b,c}, uni(a)=4 (doc 3's lone token counts), uni(b)=2,
    uni(c)=1."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import lm_doc_quality

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: (r["nll"], r["n_bigrams"]) for r in lm_doc_quality(df).collect()}
    V = 3.0
    # bigram counts: (a,b)=2, (b,a)=1, (a,c)=1
    p_ab = (2 + 0.5) / (4 + 0.5 * V)
    p_ba = (1 + 0.5) / (2 + 0.5 * V)
    p_ac = (1 + 0.5) / (4 + 0.5 * V)
    exp1 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    exp2 = -math.log(p_ac)
    assert out[1][1] == 3 and out[2][1] == 1
    assert abs(out[1][0] - exp1) < 1e-12
    assert abs(out[2][0] - exp2) < 1e-12
    assert 3 not in out  # single-token doc has no bigrams


def test_dup_clusters_components(spark):
    """Connected components: chain A-B-C (diameter 2), pair D-E, singleton
    F — every doc labeled with its component's min id; empty pair graph →
    all singletons."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import dup_clusters

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "id1 long, id2 long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}
    empty = spark.createDataFrame([], "id1 long, id2 long")
    got0 = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(docs, empty).collect()}
    assert got0 == {i: i for i in range(6)}
    # a longer chain still converges (diameter 5)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "id1 long, id2 long"
    )
    gotc = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(docs, chain).collect()}
    assert gotc == {i: 0 for i in range(6)}


def test_decontaminate_overlap(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import decontaminate

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # shares 'alpha beta gamma' + 'beta gamma delta'
            (2, "beta gamma delta epsilon"),    # shares 'beta gamma delta'
            (3, "zeta eta theta iota"),         # clean
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "alpha beta gamma delta kappa"), (101, "beta gamma delta")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_test_docs"])
        for r in decontaminate(train, test, n=3).collect()
    }
    assert got == {1: (2, 2), 2: (1, 2)}
    # min_hits raises the bar: doc 2's single shared shingle drops out
    got2 = {
        r["doc_id"]
        for r in decontaminate(train, test, n=3, min_hits=2).collect()
    }
    assert got2 == {1}


def test_redact_pii_patterns(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import redact_pii

    rows = [
        (0, "mail me at jane.doe+x@corp.example.com or call 555-123-4567"),
        (1, "ssn 123-45-6789 from host 192.168.0.1"),
        (2, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_redactions"]) for r in redact_pii(df).collect()}
    assert got[0] == ("mail me at <EMAIL> or call <PHONE>", 2)
    assert got[1] == ("ssn <SSN> from host <IP>", 2)
    assert got[2] == ("no pii here at all", 0)


def test_stratified_sample_deterministic(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import (
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr", f"t{i}") for i in range(400)],
        "doc_id long, lang string, text string",
    )
    frac = {"en": 0.25, "fr": 1.0}
    a = sorted(r["doc_id"] for r in stratified_sample(df, "lang", frac, seed=3).collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(df.repartition(13), "lang", frac, seed=3).collect()
    )
    assert a == b and a  # identical across partitionings
    fr_ids = {i for i in range(400) if i % 2 == 1}
    assert fr_ids <= set(a)  # fraction 1.0 keeps every fr doc
    en_kept = len(set(a) - fr_ids)
    assert 0 < en_kept < 200  # en actually subsampled
    # a stratum missing from fractions is dropped
    only_fr = stratified_sample(df, "lang", {"fr": 1.0}, seed=3)
    assert {r["lang"] for r in only_fr.collect()} == {"fr"}
    # different seed → different sample
    c = sorted(r["doc_id"] for r in stratified_sample(df, "lang", frac, seed=4).collect())
    assert c != a


def test_pack_shards_matches_window_and_partitioning_proof(spark):
    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import pack_shards

    rows = [(i, " ".join(f"w{j}" for j in range(3 + i % 17))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard_id"])
        for r in pack_shards(df, 100, num_partitions=7).collect()
    }
    cum = 0
    for i, text in rows:
        n = len(tokenize_text(text))
        assert got[i] == (n, cum // 100)
        cum += n
    # identical at a different parallelism (the partition-offset pass is
    # what makes this safe)
    got2 = {
        r["doc_id"]: (r["n_tokens"], r["shard_id"])
        for r in pack_shards(df.repartition(11), 100, num_partitions=3).collect()
    }
    assert got2 == got
    # shard ids are non-decreasing in doc order and start where the
    # exclusive prefix sum says they should
    order = [got[i][1] for i, _ in rows]
    assert order == sorted(order)
    assert order[0] == 0 and max(order) > 0


def test_shingles_on_short_and_empty_docs(spark):
    """Docs with < n tokens yield NO shingles (regression: sequence(1, m)
    counts down for m < 1 and used to crash element_at with index 0)."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import (
        jaccard_pairs,
        shingle_df,
    )

    df = spark.createDataFrame(
        [(0, ""), (1, "one"), (2, "one two"), (3, "one two three"), (4, "one two three")],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in shingle_df(df, n=3).collect()}
    assert got == {3, 4}
    pairs = jaccard_pairs(df, threshold=0.5).collect()
    assert [(r["id1"], r["id2"]) for r in pairs] == [(3, 4)]


def test_dup_span_stats_matches_python(docs):
    """dup_span_stats == a pure-Python window recompute: a window is dup
    iff its exact token sequence occurs in another doc; short docs have
    no rows; fractions exact."""
    from collections import Counter

    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import dup_span_stats

    n = 3
    rows = {r["doc_id"]: tokenize_text(r["text"]) for r in docs.collect()}
    owners: dict[str, set[int]] = {}
    wins: dict[int, list[str]] = {}
    for d, t in rows.items():
        ws = [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]
        wins[d] = ws
        for g in set(ws):
            owners.setdefault(g, set()).add(d)
    want = {}
    for d, ws in wins.items():
        if not ws:
            continue
        dup = sum(1 for g in ws if len(owners[g]) >= 2)
        want[d] = (len(ws), dup, round(dup / len(ws), 6))
    got = {
        r["doc_id"]: (r["n_windows"], r["dup_windows"], r["dup_frac"])
        for r in dup_span_stats(docs, n=n).collect()
    }
    assert got == want and got
    # the exact-dup pair (0, 4) must be fully duplicated against each other
    assert got[0][2] == 1.0 and got[4][2] == 1.0
    # a doc shorter than n tokens contributes no row
    import pyspark.sql.functions as F
    tiny = docs.sparkSession.createDataFrame(
        [(9, "just two")], "doc_id long, text string"
    )
    assert dup_span_stats(docs.unionByName(tiny), n=3).filter("doc_id = 9").count() == 0


def test_train_centroids_matches_numpy_reference(spark, emb):
    """Distributed Lloyd's == a sequential NumPy reference step-for-step:
    same deterministic init, same cosine argmax assignment, same
    normalized-sum update, same empty-cluster hold."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import train_centroids

    df, vecs = emb
    k, iters = 4, 5
    m_raw = np.stack(vecs).astype(np.float64)
    m = m_raw / np.maximum(np.linalg.norm(m_raw, axis=1, keepdims=True), 1e-30)
    cent = m_raw[:k] / np.maximum(
        np.linalg.norm(m_raw[:k], axis=1, keepdims=True), 1e-30
    )
    for _ in range(iters):
        cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-30)
        assign = (m @ cn.T).argmax(axis=1)
        new = cent.copy()
        for li in range(k):
            sel = m_raw[assign == li]
            if len(sel):
                s = sel.sum(axis=0)
                n = np.linalg.norm(s)
                if n > 1e-30:
                    new[li] = s / n
        cent = new
    got = train_centroids(df, k, iters=iters)
    assert got.shape == cent.shape
    assert np.allclose(got, cent, atol=1e-9)


def test_dup_clusters_star_contraction_adversarial_diameter(spark):
    """A 64-node path graph (diameter 63 > the 20-round label-prop
    bound): method='auto' must fall back to Kiveris star contraction and
    still label every node with the component min; method='label' raises
    the diameter error; method='star' works directly."""
    import pytest as _pytest

    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import dup_clusters

    n = 64
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(n + 1)], "doc_id long, text string"
    )
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id1 long, id2 long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(docs, path).collect()}
    assert got == {**{i: 0 for i in range(n)}, n: n}  # node n is a singleton
    with _pytest.raises(RuntimeError, match="method='star'"):
        dup_clusters(docs, path, method="label")
    gots = {
        r["doc_id"]: r["cluster_id"]
        for r in dup_clusters(docs, path, method="star").collect()
    }
    assert gots == got


def test_dup_clusters_star_matches_label_on_random_graphs(spark):
    """Property: star contraction ≡ label propagation ≡ brute-force
    union-find on seeded random graphs (multiple components, cycles,
    isolated nodes)."""
    import random

    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import dup_clusters

    for seed in (7, 13, 99):
        rng = random.Random(seed)
        n = 40
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(10, 45))
            }
        )
        # brute-force union-find oracle
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {i: find(i) for i in range(n)}
        # find() returns the min id because unions always root at the min
        docs = spark.createDataFrame(
            [(i, "t") for i in range(n)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame(edges, "id1 long, id2 long")
        for method in ("label", "star"):
            got = {
                r["doc_id"]: r["cluster_id"]
                for r in dup_clusters(docs, pairs, method=method).collect()
            }
            assert got == want, (seed, method)


def test_dedup_keep_one_per_cluster(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import dedup_keep

    docs = spark.createDataFrame(
        [(i, f"t{i}", i * 10) for i in range(6)],
        "doc_id long, text string, n_chars long",
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2), (3, 4)], "id1 long, id2 long")
    kept = dedup_keep(docs, pairs).collect()
    assert {r["doc_id"] for r in kept} == {0, 3, 5}
    assert all(r["n_chars"] == r["doc_id"] * 10 for r in kept)  # full rows survive


def test_semdedup_matches_global_rule(emb):
    """semdedup at a threshold above the corpus's natural cross-pair
    ceiling ≡ the global all-pairs keep-lowest-id rule, for ANY
    clustering: planted exact copies always co-cluster (identical rows
    get identical argmax), and nothing else crosses the threshold."""
    from pyspark.sql import functions as F

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import semdedup

    df, vecs = emb
    mn = vecs.astype(np.float64)
    mn /= np.linalg.norm(mn, axis=1, keepdims=True)
    ceiling = float(np.triu(mn @ mn.T, 1).max())
    tau = max(0.9, (1.0 + ceiling) / 2)  # above every natural pair

    # plant exact copies: two of vec 0..9, a third of vec 0..3
    aug = (
        df.unionByName(
            df.filter("vec_id < 10").select(
                (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
            )
        ).unionByName(
            df.filter("vec_id < 4").select(
                (F.col("vec_id") + 2000).alias("vec_id"), "embedding"
            )
        )
    )
    got = sorted(r["vec_id"] for r in semdedup(aug, tau, n_lists=4, iters=2).collect())
    # global rule: dropped iff ANY lower id is tau-similar — every copy has
    # its original below it, so exactly the 40 originals survive
    assert got == list(range(40))

    # transitivity stays pairwise: with the ORIGINAL removed, the lowest
    # copy becomes the kept representative of its group
    aug2 = aug.filter("vec_id != 0")
    got2 = sorted(r["vec_id"] for r in semdedup(aug2, tau, n_lists=4, iters=2).collect())
    assert got2 == list(range(1, 40)) + [1000]

    # below every pair: nothing is dropped
    n_all = semdedup(aug, 1.0000001, n_lists=4, iters=2).count()
    assert n_all == aug.count()


def test_gopher_rules_values(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import gopher_rules

    good = "the data " * 30  # 60 words, mean len 3.5, both stopwords absent? 'the' yes
    rows = [
        (0, good + "be with that"),          # passes everything
        (1, "the cat"),                       # too few words
        (2, "a " * 60),                       # mean word len 1 < 3, no req stopwords
        (3, ("the of data " * 20) + "### ### ### ### ### ### ### ### ### ###"),  # symbols
        (4, "\n".join(["- the bullet item of data"] * 60)),   # all bullet lines
        (5, ("the data point of it " * 12).strip() + " ..."), # ellipsis line end
        (6, ("12345 " * 60) + "the of"),      # alpha fraction too low
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert got[0]["keep"] is True
    assert got[0]["n_req_stopwords"] == 4  # the, be, with, that
    assert got[1]["keep"] is False and got[1]["n_words"] == 2
    assert got[2]["keep"] is False and got[2]["mean_word_len"] == 1.0
    assert got[3]["keep"] is False and got[3]["symbol_ratio"] > 0.1
    assert got[4]["keep"] is False and got[4]["bullet_frac"] == 1.0
    assert got[5]["keep"] is False and got[5]["ellipsis_frac"] == 1.0
    assert got[6]["keep"] is False and got[6]["alpha_word_frac"] < 0.8


def test_gopher_thresholds_are_knobs(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import gopher_rules

    df = spark.createDataFrame(
        [(0, "the data point " * 10)], "doc_id long, text string"
    )  # 30 words
    assert gopher_rules(df).collect()[0]["keep"] is False  # < 50 words
    assert (
        gopher_rules(df, min_words=10, min_stopwords=1).collect()[0]["keep"] is True
    )


def test_c4_clean_values(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import c4_clean

    doc0 = "\n".join(
        [
            "This is a good first sentence.",      # kept
            "Another proper long sentence here!",  # kept
            'A third quoted line ends well."',     # kept
            "no terminal punctuation on this one", # dropped: no punct
            "Too short.",                          # dropped: < 5 words
            "Please enable javascript to view this.",  # dropped: javascript
        ]
    )
    rows = [
        (0, doc0),
        (1, "One good sentence is not enough."),   # kept line but < 3 lines
        (2, doc0 + "\nthis page has lorem ipsum in it somewhere."),
        (3, doc0 + "\nvar x = {1: 2} is code here."),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_clean(df).collect()}
    assert got[0]["keep"] is True and got[0]["n_lines"] == 6 and got[0]["n_kept"] == 3
    assert got[0]["clean_text"] == "\n".join(doc0.split("\n")[:3])
    assert got[1]["keep"] is False and got[1]["n_kept"] == 1
    assert got[2]["keep"] is False and got[2]["n_kept"] == 4  # lorem page drop
    assert got[3]["keep"] is False  # '{' page drop
    assert got[4]["keep"] is False and got[4]["n_kept"] == 0 and got[4]["clean_text"] == ""


def test_sq8_quantize_properties(emb):
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import sq8_quantize

    df, vecs = emb
    rows = {r["vec_id"]: r for r in sq8_quantize(df).collect()}
    assert len(rows) == 40
    for i in (0, 7, 39):
        r = rows[i]
        codes = np.frombuffer(r["codes"], dtype=np.int8).astype(np.float64)
        v = vecs[i].astype(np.float64)
        assert len(codes) == 16 and np.abs(codes).max() <= 127
        # reconstruction error bounded by half a quantization step
        assert np.abs(codes * r["scale"] - v).max() <= r["scale"] / 2 + 1e-12
        assert abs(r["norm"] - np.linalg.norm(v)) < 1e-9
    # identical vectors -> identical blobs (what makes SQ8 dedup-safe)
    dup = df.union(df.filter("vec_id = 3").select((F.col("vec_id") + 100).alias("vec_id"), "embedding"))
    rows2 = {r["vec_id"]: r for r in sq8_quantize(dup).collect()}
    assert rows2[103]["codes"] == rows2[3]["codes"]


def test_sq8_topk_exact_at_operating_point(emb):
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        cosine_topk,
        sq8_topk,
    )

    df, vecs = emb
    q = [float(x) for x in vecs[5]]
    want = [(r["vec_id"], r["cosine"]) for r in cosine_topk(df, q, 10).collect()]
    got = [(r["vec_id"], r["cosine"]) for r in sq8_topk(df, q, 10, rescore=20).collect()]
    assert got == want  # ids AND scores bit-identical (exact rescore)
    # rescore = corpus size degenerates to brute force regardless of codes
    got_all = [(r["vec_id"], r["cosine"]) for r in sq8_topk(df, q, 10, rescore=40).collect()]
    assert got_all == want


def test_bq_codes_match_numpy_packing(emb, spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        _bq_pack,
        bq_codes,
    )

    df, vecs = emb
    rows = {r["vec_id"]: list(r["code"]) for r in bq_codes(df, 16).collect()}
    assert len(rows) == 40
    for i in (0, 7, 39):
        assert rows[i] == _bq_pack(vecs[i].astype(np.float64))
        # dim 16 -> one word, only bits 0..15 populated
        assert len(rows[i]) == 1 and 0 <= rows[i][0] < (1 << 16)
    # bit 63 set -> the word is the NEGATIVE two's-complement long, and
    # the Column packing agrees with the driver-side twin exactly
    v64 = np.zeros(64)
    v64[63] = 1.0
    v64[0] = 1.0
    df64 = spark.createDataFrame(
        [(0, [float(x) for x in v64])], "vec_id long, embedding array<float>"
    )
    got = list(bq_codes(df64, 64).collect()[0]["code"])
    assert got == _bq_pack(v64) and got[0] < 0  # sign bit makes it negative


def test_bq_topk_exact_at_operating_point(emb):
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        bq_topk,
        cosine_topk,
    )

    df, vecs = emb
    q = [float(x) for x in vecs[5]]
    want = [(r["vec_id"], r["cosine"]) for r in cosine_topk(df, q, 10).collect()]
    # rescore = corpus size degenerates to brute force regardless of codes
    got_all = [(r["vec_id"], r["cosine"]) for r in bq_topk(df, q, 10, rescore=40).collect()]
    assert got_all == want  # ids AND scores bit-identical (exact rescore)


def test_pq_encode_properties(emb):
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        pq_encode,
        pq_train,
    )

    df, vecs = emb
    books = pq_train(df, m=4, k_cent=8, sample_n=40)
    assert books.shape == (4, 8, 4)
    rows = {r["vec_id"]: r["codes"] for r in pq_encode(df, books).collect()}
    assert len(rows) == 40
    for i in (0, 7, 39):
        codes = np.frombuffer(rows[i], dtype=np.uint8)
        assert len(codes) == 4 and codes.max() < 8
        # codes are the true L2 argmin against the trained books
        v = vecs[i].astype(np.float64)
        v = v / np.linalg.norm(v)
        for s in range(4):
            sub = v[s * 4 : (s + 1) * 4]
            d2 = ((books[s] - sub[None, :]) ** 2).sum(axis=1)
            assert codes[s] == int(d2.argmin())
    # identical vectors -> identical blobs
    dup = df.union(
        df.filter("vec_id = 3").select((F.col("vec_id") + 100).alias("vec_id"), "embedding")
    )
    rows2 = {r["vec_id"]: r["codes"] for r in pq_encode(dup, books).collect()}
    assert rows2[103] == rows2[3]


def test_pq_topk_exact_at_operating_point(emb):
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        cosine_topk,
        pq_topk,
    )

    df, vecs = emb
    q = [float(x) for x in vecs[5]]
    want = [(r["vec_id"], r["cosine"]) for r in cosine_topk(df, q, 10).collect()]
    got = [
        (r["vec_id"], r["cosine"])
        for r in pq_topk(df, q, 10, rescore=20, m=4, k_cent=8, sample_n=40).collect()
    ]
    assert got == want  # ids AND scores bit-identical (exact rescore)
    # rescore = corpus size degenerates to brute force regardless of codes
    got_all = [
        (r["vec_id"], r["cosine"])
        for r in pq_topk(df, q, 10, rescore=40, m=4, k_cent=8, sample_n=40).collect()
    ]
    assert got_all == want


def test_ivfpq_topk_exact_at_operating_point(emb):
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        cosine_topk,
        ivfpq_topk,
    )

    df, vecs = emb
    q = [float(x) for x in vecs[5]]
    want = [(r["vec_id"], r["cosine"]) for r in cosine_topk(df, q, 10).collect()]
    got = [
        (r["vec_id"], r["cosine"])
        for r in ivfpq_topk(
            df, q, 10, nprobe=None, rescore=20,
            n_lists=4, m=4, k_cent=8, sample_n=40, coarse_iters=2,
        ).collect()
    ]
    assert got == want  # all-lists probe + rescore covers both error sources
    # pruned probe returns a SUBSET ordering consistent with exact cosine
    pruned = ivfpq_topk(
        df, q, 10, nprobe=1, rescore=20,
        n_lists=4, m=4, k_cent=8, sample_n=40, coarse_iters=2,
    ).collect()
    exact_of = dict(want)
    for r in pruned:
        if r["vec_id"] in exact_of:
            assert abs(r["cosine"] - exact_of[r["vec_id"]]) < 1e-12


def test_opq_rotation_orthogonal_and_exact_at_degenerate_rescore(emb):
    """OPQ: the learned rotation is orthogonal (cosines preserved), the
    trainer is deterministic, and rescore = corpus size degenerates to
    brute force bit-identically (the rescore reads ORIGINAL floats)."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        cosine_topk,
        opq_topk,
        opq_train,
    )

    df, vecs = emb
    r1, b1 = opq_train(df, m=4, k_cent=8, sample_n=40, opq_iters=4)
    r2, b2 = opq_train(df, m=4, k_cent=8, sample_n=40, opq_iters=4)
    assert np.array_equal(r1, r2) and np.array_equal(b1, b2)  # deterministic
    assert np.abs(r1 @ r1.T - np.eye(16)).max() < 1e-9  # orthogonal
    q = [float(x) for x in vecs[5]]
    want = [(r["vec_id"], r["cosine"]) for r in cosine_topk(df, q, 10).collect()]
    got = [
        (r["vec_id"], r["cosine"])
        for r in opq_topk(df, q, 10, rescore=40, m=4, k_cent=8, sample_n=40).collect()
    ]
    assert got == want  # ids AND scores bit-identical (exact rescore)


def test_rrf_fuse_hand_computed(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import rrf_fuse

    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(11, 1), (13, 2)], "doc_id long, rank int")
    got = [(r["doc_id"], r["rrf"]) for r in rrf_fuse([a, b], k=10, k_rrf=60).collect()]
    want = sorted(
        [
            (10, 1 / 61),
            (11, 1 / 62 + 1 / 61),  # in both lists
            (12, 1 / 63),
            (13, 1 / 62),  # dense-only candidate still surfaces
        ],
        key=lambda t: (-t[1], t[0]),
    )
    assert got == want
    assert got[0][0] == 11  # consensus doc wins
    # k truncation + ties (equal rrf) break by doc id ascending
    assert [d for d, _ in rrf_fuse([a, b], k=2).collect()] == [11, 10]
    c = spark.createDataFrame([(20, 1)], "doc_id long, rank int")
    d = spark.createDataFrame([(21, 1)], "doc_id long, rank int")
    tied = [r["doc_id"] for r in rrf_fuse([c, d], k=2).collect()]
    assert tied == [20, 21]


def test_filter_funnel_first_fail_accounting(spark):
    """filter_funnel: docs charge to their FIRST failing stage (order
    matters), NULL predicates drop like a WHERE would, counts telescope
    (n_out of stage i == n_in of stage i+1), a starved stage reports
    NULL drop_rate, and invalid stage lists raise."""
    import pytest

    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import filter_funnel

    rows = [
        (0, 50, "en"),   # fails min_len
        (1, 200, None),  # passes min_len, NULL lang -> drops at lang stage
        (2, 200, "de"),  # drops at lang stage
        (3, 200, "en"),  # survives all
        (4, 60, "de"),   # fails min_len FIRST (never charged to lang)
    ]
    df = spark.createDataFrame(rows, "doc_id long, n long, lang string")
    out = filter_funnel(
        df, [("min_len", "n >= 100"), ("lang_en", "lang = 'en'")]
    ).collect()
    got = [
        (r["stage"], r["n_in"], r["n_dropped"], r["n_out"], r["drop_rate"])
        for r in out
    ]
    assert got == [
        ("min_len", 5, 2, 3, 2 / 5),
        ("lang_en", 3, 2, 1, 2 / 3),
    ]
    # a stage that sees nothing reports NULL rate
    starved = filter_funnel(
        df, [("all_gone", "n < 0"), ("later", "lang = 'en'")]
    ).collect()
    assert starved[0]["n_dropped"] == 5
    assert starved[1]["n_in"] == 0 and starved[1]["drop_rate"] is None
    with pytest.raises(ValueError):
        filter_funnel(df, [])
    with pytest.raises(ValueError):
        filter_funnel(df, [("a", "n > 0"), ("a", "n > 1")])


def test_dedup_incremental_store_and_append(spark, tmp_path):
    """Incremental dedup: a new batch is judged against the PERSISTED
    store (exact copies drop with jaccard 1.0, uniques keep), the
    lower-id rule settles within-batch dups, and append=True makes the
    batch visible as history to the NEXT batch."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import (
        build_dedup_store,
        dedup_incremental,
    )

    t0 = "the quick brown fox jumps over the lazy dog tonight"
    t1 = "pack my box with five dozen liquor jugs right now"
    t2 = "sphinx of black quartz judge my vow completely again today"
    hist = spark.createDataFrame([(0, t0), (1, t1)], "doc_id long, text string")
    store = str(tmp_path / "store")
    build_dedup_store(hist, store)

    batch1 = spark.createDataFrame(
        [(10, t0), (11, t2), (12, t2), (13, "totally unrelated words appear here instead")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["keep"], r["dup_of"], r["dup_j"])
        for r in dedup_incremental(spark, store, batch1, threshold=0.8, append=True).collect()
    }
    assert got[10] == (False, 0, 1.0)  # exact copy of history doc 0
    assert got[11][0] is True  # first occurrence in the batch keeps
    assert got[12] == (False, 11, 1.0)  # within-batch dup -> lower id wins
    assert got[13][0] is True

    # append made batch1 history: a copy of doc 11's text now drops
    batch2 = spark.createDataFrame([(20, t2)], "doc_id long, text string")
    got2 = dedup_incremental(spark, store, batch2, threshold=0.8).collect()[0]
    assert (got2["keep"], got2["dup_of"], got2["dup_j"]) == (False, 11, 1.0)
    # building over an existing store refuses (history is append-only)
    import pytest

    with pytest.raises(Exception):
        build_dedup_store(hist, store)


def test_comb_fuse_hand_computed(spark):
    """CombSUM/CombMNZ (Fox & Shaw 1994): per-list min-max normalization,
    missing-from-a-list contributes 0, MNZ multiplies by the match
    count, a constant list normalizes to all-1.0, and an unknown method
    raises."""
    import pytest

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import comb_fuse

    a = spark.createDataFrame(
        [(10, 4.0), (11, 2.0), (12, 1.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame([(11, 0.9), (13, 0.5)], "doc_id long, score double")
    # normalized: a -> 10:1.0, 11:(2-1)/3, 12:0.0 ; b -> 11:1.0, 13:0.0
    want_sum = {10: 1.0, 11: (2.0 - 1.0) / 3.0 + 1.0, 12: 0.0, 13: 0.0}
    got_sum = {
        r["doc_id"]: r["comb"] for r in comb_fuse([a, b], k=10, method="sum").collect()
    }
    assert got_sum == want_sum
    got_mnz = {
        r["doc_id"]: r["comb"] for r in comb_fuse([a, b], k=10, method="mnz").collect()
    }
    assert got_mnz == {10: 1.0, 11: want_sum[11] * 2.0, 12: 0.0, 13: 0.0}
    # consensus doc wins under both
    assert comb_fuse([a, b], k=1).collect()[0]["doc_id"] == 11
    # ties (both zero) break by id ascending
    order = [r["doc_id"] for r in comb_fuse([a, b], k=10).collect()]
    assert order[-2:] == [12, 13]
    # constant list -> every candidate normalizes to 1.0
    c = spark.createDataFrame([(20, 7.0), (21, 7.0)], "doc_id long, score double")
    const = {r["doc_id"]: r["comb"] for r in comb_fuse([c], k=10).collect()}
    assert const == {20: 1.0, 21: 1.0}
    with pytest.raises(ValueError):
        comb_fuse([a, b], method="median")
    # empty ranked-list input is a caller bug, not an AttributeError crash
    with pytest.raises(ValueError, match="at least one ranked list"):
        comb_fuse([], k=10)
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import rrf_fuse

    with pytest.raises(ValueError, match="at least one ranked list"):
        rrf_fuse([], k=10)


def test_dsir_weights_sign_and_determinism(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import dsir_weights

    rows = (
        [(i, "aa ab ac ad ae") for i in range(0, 6)]      # target-like
        + [(i, "zz zy zx zw zv") for i in range(6, 12)]   # raw-only
        + [(12, "")]                                      # empty doc
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    target = df.filter("doc_id < 6")
    got = {r["doc_id"]: r for r in dsir_weights(df, target, n_buckets=64).collect()}
    assert len(got) == 13
    for i in range(0, 6):
        assert got[i]["selected"] and got[i]["weight"] > 0
    for i in range(6, 12):
        assert not got[i]["selected"] and got[i]["weight"] < 0
    assert got[12]["n_tokens"] == 0 and got[12]["weight"] == 0.0 and not got[12]["selected"]
    # deterministic across partitionings (bucket-count algebra, not a fold)
    got2 = {
        r["doc_id"]: (r["weight"], r["selected"])
        for r in dsir_weights(df.repartition(7), target.repartition(3), n_buckets=64).collect()
    }
    assert got2 == {k: (v["weight"], v["selected"]) for k, v in got.items()}


def test_knn_join_matches_numpy_all_queries(emb):
    """Batched kNN join == the per-query NumPy brute force for every query
    in the batch: same neighbors, same ranks, same (cosine desc, id asc)
    tie order, scores to 1e-9."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import knn_join

    df, vecs = emb
    m = vecs.astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qs = df.filter("vec_id < 6").selectExpr("vec_id as qid", "embedding")
    got = knn_join(df, qs, k=5).collect()
    assert len(got) == 6 * 5
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(r)
    for qid in range(6):
        sims = mn @ mn[qid]
        want = sorted(range(40), key=lambda i: (-sims[i], i))[:5]
        rows = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rows] == want
        for r in rows:
            assert abs(r["cosine"] - sims[r["vec_id"]]) < 1e-9


def test_knn_join_query_cap_raises(emb):
    """The broadcast query matrix is a hard design bound: past max_queries
    the join must refuse loudly instead of OOMing the driver."""
    import pytest as _pytest

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import knn_join

    df, _ = emb
    qs = df.selectExpr("vec_id as qid", "embedding")
    with _pytest.raises(ValueError, match="max_queries"):
        knn_join(df, qs, k=3, max_queries=8)


def test_knn_join_ivf_exact_at_all_lists_and_prunes(emb, tmp_path):
    """nprobe=ALL routed kNN join == the brute batched join (exact by
    construction); nprobe=1 scans a strict subset of lists and keeps
    per-query recall sane (>0 overlap with truth)."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        build_ivf_index,
        knn_join,
        knn_join_ivf,
        train_centroids,
    )

    df, _ = emb
    spark = df.sparkSession
    qs = df.filter("vec_id < 4").selectExpr("vec_id as qid", "embedding")
    cent = train_centroids(df, 4, iters=2)
    wh = str(tmp_path / "ivf")
    build_ivf_index(df, cent, wh)
    brute = {(r["qid"], r["rank"]): (r["vec_id"], round(r["cosine"], 9))
             for r in knn_join(df, qs, k=5).collect()}
    routed = {(r["qid"], r["rank"]): (r["vec_id"], round(r["cosine"], 9))
              for r in knn_join_ivf(spark, wh, qs, k=5, nprobe=None).collect()}
    assert routed == brute
    n1 = knn_join_ivf(spark, wh, qs, k=5, nprobe=1).collect()
    assert len(n1) > 0
    got1 = {(r["qid"], r["vec_id"]) for r in n1}
    truth = {(q, v) for (q, _rk), (v, _c) in brute.items()}
    assert got1 & truth


def test_doc_keyterms_matches_python(docs):
    """TF-IDF top-k per doc == a sequential Python recount (same smoothed
    idf, 4-dp-rounded sort key, term-asc ties)."""
    import math
    from collections import Counter

    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import doc_keyterms

    rows = [(r["doc_id"], tokenize_text(r["text"])) for r in docs.collect()]
    n = len({d for d, _ in rows})
    dfc = Counter()
    for _d, toks in rows:
        for t in set(toks):
            dfc[t] += 1
    want = {}
    for d, toks in rows:
        tf = Counter(toks)
        scored = sorted(
            (
                (t, c, round(c * math.log((n + 1) / (dfc[t] + 1)), 4))
                for t, c in tf.items()
            ),
            key=lambda x: (-x[2], x[0]),
        )[:2]
        for rk, (t, c, s) in enumerate(scored, 1):
            want[(d, rk)] = (t, c, s)
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["score_r"])
        for r in doc_keyterms(docs, k=2).collect()
    }
    assert got == want


def test_pmi_pairs_matches_python(spark):
    """PMI collocations == a sequential reference on a corpus with one
    planted strong collocation ('zz qq' always adjacent) that must rank
    first."""
    import math
    from collections import Counter

    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import pmi_pairs

    texts = [f"zz qq the w{i % 3} the w{(i + 1) % 3} stream" for i in range(12)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    toks = [tokenize_text(t) for t in texts]
    uni = Counter(t for w in toks for t in w)
    prs = Counter(f"{w[i]} {w[i+1]}" for w in toks for i in range(len(w) - 1))
    n = float(sum(uni.values()))
    p = float(sum(max(len(w) - 1, 0) for w in toks))
    want = sorted(
        (
            (pair, c, round(math.log(c * n * n / (p * uni[pair.split()[0]] * uni[pair.split()[1]])), 4))
            for pair, c in prs.items()
            if c >= 3
        ),
        key=lambda x: (-x[2], x[0]),
    )[:5]
    got = [
        (r["pair"], r["n_pair"], r["pmi_r"])
        for r in pmi_pairs(docs, top_n=5, min_count=3).collect()
    ]
    assert got == want
    assert got[0][0] == "zz qq"


def test_ivf_search_where_filter_exact_and_pushed(emb, tmp_path):
    """Metadata-filtered IVF search at nprobe=ALL == brute force over the
    filtered subset; the predicate reaches the parquet scan
    (PushedFilters), never a post-scoring join."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        build_ivf_index,
        ivf_search,
        train_centroids,
    )

    df, vecs = emb
    spark = df.sparkSession
    lab = df.withColumn("label", (df.vec_id % 3).cast("int"))
    cent = train_centroids(lab, 4, iters=2)
    wh = str(tmp_path / "ivff")
    build_ivf_index(lab, cent, wh)
    q = vecs[0].astype(np.float64)
    m = vecs.astype(np.float64)
    sims = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    want = sorted(
        (i for i in range(40) if i % 3 == 0), key=lambda i: (-sims[i], i)
    )[:5]
    out = ivf_search(spark, wh, [float(x) for x in q], 5, nprobe=4, where="label = 0")
    got = [r["vec_id"] for r in out.collect()]
    assert got == want
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    seg = plan[plan.index("PushedFilters") :]
    assert "label" in seg[: seg.index("]") + 1]


def test_bpe_merges_known_answer_and_cap(spark):
    """BPE trainer on a hand-computable corpus: 'aaab'×3 + 'aab'×2 —
    pair counts round 1: (a,a)=3+2=5... wait, 'aaab' has (a,a)x2? No:
    adjacent pairs of aaab = (a,a),(a,a),(a,b) but pair counts per word
    count occurrences: we count per-position occurrences weighted by
    word frequency. See asserts for the exact ground truth."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import bpe_merges

    docs = spark.createDataFrame(
        [(0, "aaab aaab aaab aab aab")], "doc_id long, text string"
    )
    got = bpe_merges(docs, n_merges=3)
    # round 1 pair counts: (a,a): 2*3 + 1*2 = 8; (a,b): 3 + 2 = 5 → merge (a,a)
    assert got[0] == (1, "a", "a", 8)
    # after merge: aaab -> (aa,a,b)? NO — leftmost greedy: a a a b -> aa,a,b?
    # greedy scan merges positions 0-1 then cannot merge pos2 with pos1:
    # 'aaab' -> (aa, a, b); 'aab' -> (aa, b)
    # round 2: (aa,a)=3, (a,b)=3, (aa,b)=2 → tie 3: lexicographic ('a','b') < ('aa','a')
    assert got[1] == (2, "a", "b", 3)
    # after: ('aa','a','b')->('aa','ab')? 'a','b' adjacent -> ab: words:
    # (aa, ab) x3 ; (aa, b) x2
    # round 3: (aa,ab)=3, (aa,b)=2 → merge (aa, ab, 3)
    assert got[2] == (3, "aa", "ab", 3)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_vocab"):
        bpe_merges(docs, n_merges=1, max_vocab=1)


def test_bpe_merges_deterministic_across_partitionings(spark):
    from kafka_elasticsearch_standalone_consumer_spark.corpus import (
        generate_transcripts,
    )
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import bpe_merges

    tr = generate_transcripts(spark, n_convs=8, seed=3, partitions=2)
    a = bpe_merges(tr, n_merges=5)
    b = bpe_merges(tr.repartition(7), n_merges=5)
    assert a == b and len(a) == 5


def test_bpe_pair_counts_agrees_with_trainer_round1(spark):
    """The distributed pair-statistics pass must agree with the driver-side
    merge loop's round-1 counts: top pair == first merge, and every counted
    pair matches a brute-force recount from the word dictionary."""
    from kafka_elasticsearch_standalone_consumer_spark.corpus import (
        generate_transcripts,
    )
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        bpe_merges,
        bpe_pair_counts,
    )

    tr = generate_transcripts(spark, n_convs=6, seed=9, partitions=3)
    got = {(r.l, r.r): r.pair_cnt for r in bpe_pair_counts(tr, top_n=10**6).collect()}
    first = bpe_merges(tr, n_merges=1)[0]
    top = min(got.items(), key=lambda kv: (-kv[1], kv[0]))
    assert (top[0][0], top[0][1], top[1]) == (first[1], first[2], first[3])
    # brute-force recount driver-side
    from collections import Counter

    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col
    from pyspark.sql import functions as F

    wc = Counter()
    for r in tr.select(
        F.explode(tokenize_col(F.col("text"))).alias("w")
    ).collect():
        wc[r.w] += 1
    want = Counter()
    for w, c in wc.items():
        for i in range(len(w) - 1):
            want[(w[i], w[i + 1])] += c
    assert got == dict(want)


def test_bpe_encode_matches_python_greedy_reference(spark):
    """The pure-Column double-delimiter replace chain must equal a plain
    Python greedy BPE encoder (the trainer's own re-segmentation rule:
    per merge in rank order, one leftmost non-overlapping pass)."""
    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col
    from kafka_elasticsearch_standalone_consumer_spark.corpus import (
        generate_transcripts,
    )
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        bpe_encode,
        bpe_merges,
    )
    from pyspark.sql import functions as F

    tr = generate_transcripts(spark, n_convs=6, seed=21, partitions=3)
    docs = tr.withColumn("doc_id", F.monotonically_increasing_id())
    merges = bpe_merges(tr, n_merges=6)

    def py_apply(word):
        sym = list(word)
        for _, lhs, rhs, _c in merges:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == lhs and sym[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return len(sym)

    want = {}
    for r in docs.select(
        "doc_id", tokenize_col(F.col("text")).alias("ws")
    ).collect():
        want[r.doc_id] = (
            len(r.ws),
            sum(py_apply(w) for w in r.ws),
        )
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_encode(docs, merges).collect()
    }
    assert got == want and len(got) > 10


def test_cosine_range_matches_numpy_and_has_no_shuffle(spark):
    import numpy as np

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        cosine_range,
    )

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in vecs[0]]
    tau = 0.25
    got = {r.vec_id: r.cosine for r in cosine_range(emb, q, tau).collect()}

    v64 = vecs.astype(np.float64)
    qn = np.linalg.norm(np.asarray(q))
    cos = (v64 @ np.asarray(q)) / (np.linalg.norm(v64, axis=1) * qn)
    want = {i for i in range(200) if cos[i] >= tau}
    assert set(got) == want and 0 in got
    for i, c in got.items():
        assert abs(c - cos[i]) < 1e-9

    plan = cosine_range(emb, q, tau)._sc is not None and cosine_range(
        emb, q, tau
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Sort" not in plan


def test_mmr_rerank_matches_python_greedy_and_diversifies(spark):
    """MMR vs a plain greedy recompute on clustered vectors: three tight
    clusters near the query — MMR must interleave clusters instead of
    exhausting the nearest one, and an exact duplicate of the anchor
    scores 0 marginal and falls behind every cross-cluster pick."""
    import math

    import numpy as np

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        mmr_rerank,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((3, 8))
    rows = []
    for i in range(30):
        c = centers[i % 3]
        v = c + 0.05 * rng.standard_normal(8)
        rows.append((i, [float(x) for x in v]))
    rows.append((999, list(rows[0][1])))  # exact duplicate of vec 0
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = rows[0][1]
    got = [
        (r.step, r.vec_id, r.mmr)
        for r in mmr_rerank(emb, q, k=8, n_candidates=15, lam=0.5).collect()
    ]

    # plain greedy recompute with sequential folds (float32-cast inputs)
    def f32(v):
        return [float(np.float32(x)) for x in v]

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    # stored vectors round-trip through float32; the query stays raw float64
    cand = sorted(
        (
            (
                dot(f32(v), q)
                / (math.sqrt(dot(f32(v), f32(v))) * math.sqrt(dot(q, q))),
                -i,
            ),
            i,
            f32(v),
        )
        for i, v in rows
    )[::-1][:15]
    ids = [i for _, i, _ in cand]
    rel = {i: key[0] for key, i, _ in cand}
    vec = {i: v for _, i, v in cand}
    sims = {
        (a, b): dot(vec[a], vec[b])
        / (math.sqrt(dot(vec[a], vec[a])) * math.sqrt(dot(vec[b], vec[b])))
        for a in ids
        for b in ids
        if a != b
    }
    sel = [max(ids, key=lambda i: (rel[i], -i))]
    want = [(1, sel[0], rel[sel[0]])]
    while len(sel) < 8:
        best = max(
            (i for i in ids if i not in sel),
            key=lambda i: (
                0.5 * rel[i] - 0.5 * max(sims[(i, j)] for j in sel),
                -i,
            ),
        )
        want.append(
            (
                len(sel) + 1,
                best,
                0.5 * rel[best] - 0.5 * max(sims[(best, j)] for j in sel),
            )
        )
        sel.append(best)
    assert [(s, v) for s, v, _ in got] == [(s, v) for s, v, _ in want]
    for (_, _, gm), (_, _, wm) in zip(got, want):
        assert abs(gm - wm) < 1e-12
    # diversification: the duplicate never precedes a cross-cluster pick
    order = [v for _, v, _ in got]
    assert order[0] == 0 and (999 not in order[:4])
    # clusters interleave: the first three non-anchor picks span >1 cluster
    assert len({v % 3 for v in order[1:4] if v != 999}) > 1


def test_hard_negatives_excludes_labels_and_self(spark):
    import numpy as np

    from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
        hard_negatives,
        knn_join,
    )

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((80, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(80)],
        "vec_id long, embedding array<float>",
    )
    qs = emb.filter("vec_id < 3").selectExpr("vec_id as qid", "embedding")
    pos = spark.createDataFrame(
        [(q, q + 10) for q in range(3)] + [(q, q + 11) for q in range(3)],
        "qid long, pos_id long",
    )
    k = 5
    got = hard_negatives(emb, qs, pos, k=k).collect()
    excl = {(q, q + d) for q in range(3) for d in (0, 10, 11)}
    assert all((r.qid, r.vec_id) not in excl for r in got)
    assert sorted((r.qid, r.rank) for r in got) == [
        (q, r) for q in range(3) for r in range(1, k + 1)
    ]
    # equals the full knn ranking with exclusions dropped and re-ranked
    full = knn_join(emb, qs, 80).collect()
    want = {}
    for q in range(3):
        rows = [
            (r.vec_id, r.cosine)
            for r in sorted(full, key=lambda r: (r.qid, r.rank))
            if r.qid == q and (q, r.vec_id) not in excl
        ][:k]
        want[q] = rows
    for q in range(3):
        mine = [(r.vec_id, r.cosine) for r in sorted(got, key=lambda r: r.rank) if r.qid == q]
        assert mine == want[q]


def test_winnow_fingerprints_matches_python_and_guarantee(spark):
    """Winnowing vs a pure-Python reimplementation (same md5-prefix
    hashes, min per window, distinct values), plus the paper's
    guarantee: docs sharing a >= k+w-1-token substring share >= 1
    fingerprint; docs shorter than k yield none."""
    import hashlib

    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        winnow_fingerprints,
    )

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "xx yy alpha beta gamma delta epsilon zeta qq rr ss tt"),
        (2, "one two"),
        (3, "solo words entirely different from anything else written here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    k, w = 3, 3
    got = {}
    for r in winnow_fingerprints(docs, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)

    def py_winnow(text):
        ts = tokenize_text(text)
        hs = [
            int(hashlib.md5(" ".join(ts[i : i + k]).encode()).hexdigest()[:15], 16)
            for i in range(len(ts) - k + 1)
        ]
        return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}

    for i, text in rows:
        assert got.get(i, set()) == py_winnow(text), i
    assert got[0] & got[1]  # shared 6-token substring >= k+w-1 = 5
    assert 2 not in got and not (got[0] & got[3])

    import pytest as _pt

    with _pt.raises(ValueError, match="winnow"):
        winnow_fingerprints(docs, k=0)


def test_corpus_drift_jsd_properties(spark):
    """JSD: 0 for identical corpora, symmetric, bounded by ln 2 on
    disjoint vocabularies, and equal to a hand-computed value."""
    import math

    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        corpus_drift,
    )

    a = spark.createDataFrame([(0, "x x y")], "doc_id long, text string")
    b = spark.createDataFrame([(0, "x y y")], "doc_id long, text string")
    c = spark.createDataFrame([(0, "p q r")], "doc_id long, text string")
    same = corpus_drift(a, a).collect()[0]
    assert same["jsd_r"] == 0.0 and same["vocab_shared"] == 2
    ab = corpus_drift(a, b).collect()[0]
    ba = corpus_drift(b, a).collect()[0]
    assert ab["jsd_r"] == ba["jsd_r"]
    want = 0.5 * (2 / 3 * math.log((2 / 3) / 0.5) + 1 / 3 * math.log((1 / 3) / 0.5)) \
        + 0.5 * (1 / 3 * math.log((1 / 3) / 0.5) + 2 / 3 * math.log((2 / 3) / 0.5))
    assert abs(ab["jsd_r"] - round(want, 6)) < 1e-9
    disj = corpus_drift(a, c).collect()[0]
    assert abs(disj["jsd_r"] - round(math.log(2.0), 6)) < 1e-9
    assert disj["vocab_shared"] == 0


def test_lm_ref_mode_and_importance(spark):
    """ref_docs mode: the LM trains on the target slice and Laplace
    prices grams the slice never saw — hand-computable on a 2-doc
    target. Importance = nll_bg − nll_target, positive for docs that
    read target-like."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        lm_doc_quality,
        lm_importance_scores,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "x y x y"), (3, "a b")],
        "doc_id long, text string",
    )
    target = docs.filter("doc_id IN (1, 3)")  # the {a,b} domain
    out = {
        r["doc_id"]: r["nll"]
        for r in lm_doc_quality(docs, ref_docs=target).collect()
    }
    # target LM: vocab {a,b}, uni(a)=3, uni(b)=3; big(a,b)=3, big(b,a)=1
    V = 2.0
    p_ab = (3 + 0.5) / (3 + 0.5 * V)
    p_ba = (1 + 0.5) / (3 + 0.5 * V)
    p_unseen = (0 + 0.5) / (0 + 0.5 * V)  # x/y never seen: P = 1/V
    assert abs(out[1] - (-(math.log(p_ab) * 2 + math.log(p_ba)) / 3)) < 1e-12
    assert abs(out[2] - (-math.log(p_unseen))) < 1e-12
    assert abs(out[3] - (-math.log(p_ab))) < 1e-12

    imp = {
        r["doc_id"]: r["score"]
        for r in lm_importance_scores(docs, target).collect()
    }
    assert imp[1] > 0 and imp[3] > 0  # target-domain docs gain
    assert imp[2] < 0  # the x/y doc reads background-like only
    # self-mode regression: ref=docs equals the default path to fp noise
    a = {r["doc_id"]: r["nll"] for r in lm_doc_quality(docs).collect()}
    b = {r["doc_id"]: r["nll"] for r in lm_doc_quality(docs, ref_docs=docs).collect()}
    assert a.keys() == b.keys() and all(abs(a[k] - b[k]) < 1e-12 for k in a)


def test_temperature_mix_flattens_toward_c_alpha(spark):
    """alpha=0.5: the smallest domain binds (rate exactly 1.0, every row
    kept), larger domains downsample so expected output sizes are
    proportional to sqrt(c); the selection is the stratified_sample hash
    with the symbolically-cancelled rates — asserted by recomputing them
    by hand."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import (
        stratified_sample,
        temperature_mix,
    )

    rows = []
    sizes = {"en": 360, "fr": 90, "zz": 10}
    i = 0
    for d, n in sizes.items():
        for _ in range(n):
            rows.append((i, d, f"t{i}"))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    got = sorted(
        (r["doc_id"], r["lang"])
        for r in temperature_mix(df, "lang", alpha=0.5, seed=9).collect()
    )
    # hand-recomputed rates: w=sqrt(c), T=min(c/w)=sqrt(10)
    import math

    t = math.sqrt(10)
    rates = {d: min(math.sqrt(c) * t / c, 1.0) for d, c in sizes.items()}
    assert rates["zz"] == 1.0
    want = sorted(
        (r["doc_id"], r["lang"])
        for r in stratified_sample(df, "lang", rates, seed=9).collect()
    )
    assert got == want and got
    # the binding domain keeps EVERY row
    zz_ids = {i for i, d in [(r[0], r[1]) for r in rows] if d == "zz"}
    assert zz_ids <= {i for i, _ in got}
    # larger domains flatten: en kept fraction ≈ sqrt(10*360)/360 ≈ 0.167
    n_en = sum(1 for _, d in got if d == "en")
    assert 0 < n_en < 180  # strictly subsampled
    # NULL domains drop
    df2 = df.union(spark.createDataFrame([(999, None, "x")], df.schema))
    got2 = {r["doc_id"] for r in temperature_mix(df2, "lang", seed=9).collect()}
    assert 999 not in got2


def test_classifier_score_exact_logits_and_bias_path(spark):
    """Dyadic weights ⇒ the logit sum is float-exact at ANY partitioning
    (keep decisions can't flap); empty docs score at the bare bias; the
    sigmoid is monotone in the logit."""
    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import (
        _hash_bucket,  # noqa: F401 (documented shared hash)
        classifier_score,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"w{i % 13:05d} w{(i * 7) % 13:05d} common") for i in range(60)]
        + [(99, ""), (100, None)],
        "doc_id long, text string",
    )
    weights = spark.range(64).select(
        F.col("id").alias("bucket"),
        (((F.col("id") % 5) - 2).cast("double") * F.lit(0.25)).alias("weight"),
    )
    a = classifier_score(docs, weights, n_buckets=64, bias=0.25).collect()
    b = classifier_score(
        docs.repartition(13), weights, n_buckets=64, bias=0.25
    ).collect()
    ra = {r["doc_id"]: (r["n_tokens"], r["logit"], r["keep"]) for r in a}
    rb = {r["doc_id"]: (r["n_tokens"], r["logit"], r["keep"]) for r in b}
    assert ra == rb  # bit-exact across partitionings
    assert ra[99] == (0, 0.25, True) and ra[100] == (0, 0.25, True)
    # recompute one doc by hand through the same portable hash
    import hashlib

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64

    toks = tokenize_text("w00001 w00007 common")
    want = 0.25 + sum(((bucket(t) % 5) - 2) * 0.25 for t in toks)
    got = next(r for r in a if r["doc_id"] == 1)
    assert got["logit"] == want and got["n_tokens"] == len(toks)
    # sigmoid is monotone display: score order == logit order
    import math

    for r in a:
        assert abs(r["score"] - 1.0 / (1.0 + math.exp(-r["logit"]))) < 1e-12


def test_ngram_diversity_hand_values(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        ngram_diversity,
    )

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a"), (3, "")], "doc_id long, text string"
    )
    got = {r["n"]: (r["total_ngrams"], r["distinct_ngrams"], r["ratio"]) for r in ngram_diversity(df).collect()}
    # unigrams: a b a b a -> 5 total, 2 distinct
    assert got[1] == (5, 2, 2.0 / 5.0)
    # bigrams (doc1 only): ab ba ab -> 3 total, 2 distinct; doc2 too short
    assert got[2] == (3, 2, 2.0 / 3.0)
    # trigrams: aba bab -> 2 total, 2 distinct
    assert got[3] == (2, 2, 1.0)


def test_dedup_lines_removes_corpus_boilerplate(spark):
    """Line-level corpus dedup: lines repeating above max_count vanish
    from every doc, unique lines and blank separators survive in order,
    and an all-boilerplate doc comes back empty."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import dedup_lines

    footer = "(c) example corp all rights reserved"
    rows = [
        (0, f"alpha body zero\n{footer}\nunique zero"),
        (1, f"beta body one\n\nmiddle blank kept\n{footer}"),
        (2, f"{footer}"),
        (3, "gamma body three"),
        (4, None),
        (5, f"{footer}\n{footer}\ndelta body five"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup_lines(df, max_count=2).collect()}

    # footer occurs 5x (> 2) -> removed everywhere
    assert got[0]["text_dedup"] == "alpha body zero\nunique zero"
    assert got[0]["n_lines"] == 3 and got[0]["n_removed"] == 1
    # blank separator lines are structure: kept, never counted
    assert got[1]["text_dedup"] == "beta body one\n\nmiddle blank kept"
    # all-boilerplate doc -> empty
    assert got[2]["text_dedup"] == "" and got[2]["n_removed"] == 1
    # untouched docs round-trip byte-identically
    assert got[3]["text_dedup"] == "gamma body three" and got[3]["n_removed"] == 0
    # NULL text behaves as one empty (kept) line
    assert got[4]["text_dedup"] == "" and got[4]["n_removed"] == 0
    # within-doc repeats count toward the corpus total and both go
    assert got[5]["text_dedup"] == "delta body five" and got[5]["n_removed"] == 2
    assert len(got) == len(rows)

    # max_count high enough: nothing removed
    loose = {r["doc_id"]: r["n_removed"] for r in dedup_lines(df, max_count=10).collect()}
    assert all(v == 0 for v in loose.values())


def test_heaps_fit_matches_python(spark):
    """Heaps'-law fit vs an independent pure-Python recompute of the same
    definition (bigram vocab at 8 evenly spaced doc_id prefixes, OLS of
    ln V on ln N); growing-vocabulary corpus lands at beta in (0, 1]."""
    import math

    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import heaps_fit

    rows = [
        (i, " ".join(f"w{(i * 7 + j) % (10 + 3 * i)}" for j in range(12)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = heaps_fit(df, n=2, n_checkpoints=8).collect()[0]

    # python recompute
    def grams(text):
        t = text.split()
        return [f"{a} {b}" for a, b in zip(t, t[1:])]

    mx = max(d for d, _ in rows)
    ts = sorted({(i * mx) // 8 for i in range(1, 9)} - {0})
    first, per_doc = {}, {}
    for d, text in rows:
        gs = grams(text)
        per_doc[d] = len(gs)
        for g in gs:
            first[g] = min(first.get(g, d), d)
    pts = []
    for t in ts:
        v = sum(1 for fid in first.values() if fid <= t)
        nn = sum(m for d, m in per_doc.items() if d <= t)
        if v > 0 and nn > 0:
            pts.append((math.log(nn), math.log(v)))
    np_ = float(len(pts))
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    beta = (np_ * sxy - sx * sy) / (np_ * sxx - sx * sx)

    assert r["n_points"] == len(pts)
    assert abs(r["beta"] - beta) < 1e-9
    assert 0.0 < r["beta"] <= 1.0
    assert r["vocab_total"] == len(first)
    assert r["grams_total"] == sum(per_doc.values())

    # degenerate inputs
    empty = heaps_fit(df.filter("doc_id < 0")).collect()[0]
    assert empty["n_points"] == 0 and empty["beta"] is None
