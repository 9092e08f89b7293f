"""ES 1.x similarity modules (classic TF-IDF / LMDirichlet /
LMJelinekMercer): hand-recomputed scores on a tiny corpus, ES-semantics
sanity (coord, Dirichlet length prior), and the 4-dp rank-determinism
contract."""

from __future__ import annotations

import math

import pytest

from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text
from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

DOCS = [
    (0, "hash join hash join spill"),
    (1, "hash scan"),
    (2, "join filter join"),
    (3, "sort merge shuffle"),
    (4, "hash join filter"),
]
Q = "hash join"


@pytest.fixture(scope="module")
def sim_idx(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return Index.ephemeral(df, docs_per_shard=2, n_buckets=4)


def _tf_dl():
    tf, dl = {}, {}
    for d, text in DOCS:
        toks = tokenize_text(text)
        dl[d] = len(toks)
        for t in toks:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    return tf, dl


def _python_scores(similarity, mu=2000.0, lam=0.1):
    tf, dl = _tf_dl()
    terms = sorted(set(tokenize_text(Q)))
    n = len(DOCS)
    total = float(sum(dl.values()))
    df = {t: sum(1 for d, _ in DOCS if (d, t) in tf) for t in terms}
    cf = {t: float(sum(v for (d2, t2), v in tf.items() if t2 == t)) for t in terms}
    avgdl = total / n
    out = {}
    for d, _ in DOCS:
        matched = [t for t in terms if (d, t) in tf]
        if not matched:
            continue
        if similarity == "dfr_inl2":
            s = 0.0
            for t in matched:
                tfn = tf[(d, t)] * math.log2(1.0 + avgdl / dl[d])
                s += (tfn / (1.0 + tfn)) * math.log2((n + 1.0) / (df[t] + 0.5))
            out[d] = s
            continue
        if similarity == "ib_ll":
            s = 0.0
            for t in matched:
                tfn = tf[(d, t)] * math.log2(1.0 + avgdl / dl[d])
                lt = (df[t] + 1.0) / (n + 1.0)
                s += -math.log2(lt / (lt + tfn))
            out[d] = s
            continue
        if similarity == "classic":
            s = sum(
                math.sqrt(tf[(d, t)])
                * (1.0 + math.log(n / (df[t] + 1.0))) ** 2
                / math.sqrt(dl[d])
                for t in matched
            )
            out[d] = (len(matched) / float(len(terms))) * s
        elif similarity == "lm_dirichlet":
            s = sum(
                math.log(1.0 + (tf[(d, t)] * total) / (mu * cf[t]))
                for t in matched
            )
            out[d] = s + len(terms) * math.log(mu / (dl[d] + mu))
        else:
            r = (1.0 - lam) / lam
            out[d] = sum(
                math.log(1.0 + r * (tf[(d, t)] * total) / (dl[d] * cf[t]))
                for t in matched
            )
    return out


@pytest.mark.parametrize(
    "sim", ["classic", "lm_dirichlet", "lm_jm", "dfr_inl2", "ib_ll"]
)
def test_similarity_matches_hand_computation(sim_idx, sim):
    got = {
        r["doc_id"]: r["score"]
        for r in sim_idx.search_similarity(Q, 10, similarity=sim).collect()
    }
    want = _python_scores(sim)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9), (sim, d)


def test_classic_coord_penalizes_partial_matches(sim_idx):
    """Doc 1 matches 1 of 2 query terms: coord halves its score relative
    to its raw TF-IDF sum (the ES 1.x coord factor)."""
    want = _python_scores("classic")
    assert want[1] < want[4]  # single-term match under full match
    got = [r["doc_id"] for r in sim_idx.search_similarity(Q, 10).collect()]
    assert got[0] == 0  # highest-tf full match wins under TF-IDF


def test_dirichlet_length_prior_orders_equal_tf(sim_idx):
    """Docs 1 (dl=2) vs 4 (dl=3) both have tf(hash)=1: under Dirichlet
    the shorter doc gets the better length prior on the hash term, but
    doc 4 matches BOTH terms — it must outrank doc 1 overall."""
    want = _python_scores("lm_dirichlet")
    assert want[4] > want[1]
    got = [r["doc_id"] for r in sim_idx.search_similarity(
        Q, 10, similarity="lm_dirichlet").collect()]
    assert got.index(4) < got.index(1)


def test_dfr_rare_term_outweighs_common(sim_idx):
    """Under DFR I(n), the information content log2((N+1)/(df+0.5))
    rewards rarer terms: 'join' (df=3) carries more than 'hash' (df=3)?
    Both df=3 here, so instead check the saturation: doc 0 (tf=2 on both
    terms) must outrank doc 4 (tf=1 each, same dl ordering) because tfn
    grows with tf while the L after-effect only saturates, never
    inverts."""
    want = _python_scores("dfr_inl2")
    assert want[0] > want[4] > want[1]
    got = [
        r["doc_id"]
        for r in sim_idx.search_similarity(Q, 10, similarity="dfr_inl2").collect()
    ]
    assert got[0] == 0


def test_ib_ll_two_term_match_beats_one(sim_idx):
    """IB log-logistic: matching both query terms accumulates two
    positive information terms — doc 4 must outrank single-term doc 1."""
    want = _python_scores("ib_ll")
    assert want[4] > want[1]
    got = [
        r["doc_id"]
        for r in sim_idx.search_similarity(Q, 10, similarity="ib_ll").collect()
    ]
    assert got.index(4) < got.index(1)


def test_search_params_matches_hand_bm25(sim_idx):
    """Tunable k1/b (ES per-field similarity settings): hand-recomputed
    BM25 with k1=1.6, b=0.25 over the tiny corpus; k1→0 must flatten tf
    saturation (scores approach pure idf sums)."""
    tf, dl = _tf_dl()
    terms = sorted(set(tokenize_text(Q)))
    n = len(DOCS)
    avgdl = sum(dl.values()) / n
    df = {t: sum(1 for d, _ in DOCS if (d, t) in tf) for t in terms}
    k1, b = 1.6, 0.25
    want = {}
    for d, _ in DOCS:
        s = 0.0
        for t in terms:
            if (d, t) not in tf:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf[(d, t)] / (
                tf[(d, t)] + k1 * (1.0 - b + b * dl[d] / avgdl)
            )
        if s:
            want[d] = s
    got = {
        r["doc_id"]: r["score"]
        for r in sim_idx.search_params(Q, 10, k1=k1, b=b).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9)
    # k1=0: score degenerates to Σ idf of matched terms, tf-independent
    flat = {
        r["doc_id"]: r["score"]
        for r in sim_idx.search_params(Q, 10, k1=0.0, b=0.25).collect()
    }
    assert flat[0] == pytest.approx(flat[4], abs=1e-12)  # same matched set


def test_similarity_unknown_raises(sim_idx):
    with pytest.raises(ValueError):
        sim_idx.search_similarity(Q, 5, similarity="bm42")
