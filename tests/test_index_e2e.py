"""End-to-end: build index over synthetic transcripts, verify BM25
rank-identity across all execution paths (SURVEY §5.2.2).

Paths compared per query:
  1. block-max WAND kernel (pruned fast path)
  2. exact decode kernel (unpruned fast path)
  3. DataFrame oracle (declarative joins/agg)
  4. independent pure-pandas/NumPy oracle (no Spark index artifacts)
"""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from kafka_elasticsearch_standalone_consumer_spark import B, K1
from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text
from kafka_elasticsearch_standalone_consumer_spark.corpus import reference_queries

K = 10


@pytest.fixture(scope="module")
def numpy_oracle(spark, built_index):
    """Independent scorer built from the docs table with plain pandas."""
    idx, path = built_index
    docs = (
        idx.wh.read(spark, "docs")
        .select("doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    toks = [tokenize_text(t) for t in docs["text"]]
    dl = np.array([len(t) for t in toks], dtype=np.int64)
    n_docs = len(docs)
    avgdl = dl.mean()
    inverted: dict[str, dict[int, int]] = {}
    for did, ts in zip(docs["doc_id"], toks):
        for term, tf in Counter(ts).items():
            inverted.setdefault(term, {})[did] = tf

    def score(query: str, k: int = K):
        weights = Counter(tokenize_text(query))
        acc: dict[int, float] = {}
        for term, w in weights.items():
            postings = inverted.get(term)
            if not postings:
                continue
            df = len(postings)
            idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
            for did, tf in postings.items():
                c = w * idf * tf / (tf + K1 * (1 - B + B * dl[did] / avgdl))
                acc[did] = acc.get(did, 0.0) + c
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return ranked

    return score


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _assert_rank_identical(got, want, label):
    assert [d for d, _ in got] == [d for d, _ in want], label
    for (d1, s1), (d2, s2) in zip(got, want):
        assert abs(s1 - s2) < 1e-6, (label, d1, s1, s2)


QUERIES = [q["query"] for q in reference_queries(24)]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_rank_identity_all_paths(built_index, numpy_oracle, qi):
    idx, _ = built_index
    q = QUERIES[qi]
    want = numpy_oracle(q, K)
    bmw = _rows(idx.search(q, K, mode="bmw"))
    exact = _rows(idx.search(q, K, mode="exact"))
    oracle = _rows(idx.search_oracle(q, K))
    _assert_rank_identical(bmw, want, f"bmw {q}")
    _assert_rank_identical(exact, want, f"exact {q}")
    _assert_rank_identical(oracle, want, f"oracle {q}")


def test_intersect_mode(built_index, numpy_oracle):
    idx, _ = built_index
    q = "w00000 w00003"
    got = _rows(idx.search(q, 50, mode="intersect"))
    # AND = docs that contain both terms; scores equal the OR scores there
    or_all = dict(numpy_oracle(q, 10**9))
    t0 = set(d for d, _ in numpy_oracle("w00000", 10**9))
    t1 = set(d for d, _ in numpy_oracle("w00003", 10**9))
    both = t0 & t1
    want = sorted(((d, or_all[d]) for d in both), key=lambda kv: (-kv[1], kv[0]))[:50]
    _assert_rank_identical(got, want, "intersect")


def test_intersect_absent_term_empty(built_index):
    idx, _ = built_index
    assert idx.search("w00000 zzneverseen", 5, mode="intersect").count() == 0


def test_empty_and_absent_queries(built_index):
    idx, _ = built_index
    assert idx.search("", K).count() == 0
    assert idx.search("zzabsent999", K).count() == 0
    assert idx.search_oracle("zzabsent999", K).count() == 0


def test_postings_roundtrip_against_tokens(spark, built_index):
    """Decoded postings must reproduce the tokens table exactly."""
    from kafka_elasticsearch_standalone_consumer_spark.index import codec

    idx, _ = built_index
    tokens = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in idx.wh.read(spark, "tokens").collect()
    }
    got = {}
    for row in idx.postings.collect():
        d, t = codec.unpack_run(bytes(row["docs"]), bytes(row["tfs"]), row["n_docs"])
        for di, ti in zip(d, t):
            key = (row["term"], int(di))
            assert key not in got, f"duplicate posting {key}"
            got[key] = int(ti)
    assert got == tokens


def test_hot_term_split_across_shards(built_index):
    """Zipfian head terms must appear in multiple shard runs (skew split)."""
    idx, _ = built_index
    import pyspark.sql.functions as F

    n = idx.postings.filter(F.col("term") == "w00000").count()
    assert n > 1, "hot term should span multiple doc-range shards"
