"""Multi-field BM25 (ES multi_match): most_fields sums per-field scores,
best_fields is dis-max (max + tie_breaker × rest); per-field statistics
are independent. Checked against a pure-Python recompute."""

from __future__ import annotations

import math

import pytest

from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text
from kafka_elasticsearch_standalone_consumer_spark.query.multifield import multi_field_bm25

Q = "w00000 w00003"
FIELDS = {"head": 2.0, "text": 1.0}


@pytest.fixture(scope="module")
def fielded_docs(spark, transcripts):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_col

    df = transcripts.select(
        F.row_number().over(Window.orderBy("conv_id", "turn_idx")).alias("doc_id"),
        "text",
        F.array_join(F.slice(tokenize_col(F.col("text")), 1, 4), " ").alias("head"),
    )
    df.persist().count()
    return df


def _python_field_scores(rows, field, boost, terms, k1=1.2, b=0.75):
    toks = {r["doc_id"]: tokenize_text(r[field]) for r in rows}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for q in terms:
        df[q] = sum(1 for t in toks.values() if q in t)
    out = {}
    for d, ts in toks.items():
        s = 0.0
        for q in terms:
            c = ts.count(q)
            if c and df[q]:
                idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
                s += boost * idf * c / (c + k1 * (1 - b + b * len(ts) / (avgdl or 1e-9)))
        if s:
            out[d] = s
    return out


def _want(rows, mode, tie_breaker=0.0):
    terms = tokenize_text(Q)
    per_field = {
        f: _python_field_scores(rows, f, boost, terms) for f, boost in FIELDS.items()
    }
    docs = set().union(*[set(v) for v in per_field.values()])
    combined = {}
    for d in docs:
        fs = [v[d] for v in per_field.values() if d in v]
        if mode == "most_fields":
            combined[d] = sum(fs)
        else:
            combined[d] = max(fs) + tie_breaker * (sum(fs) - max(fs))
    ranked = sorted(combined.items(), key=lambda x: (-x[1], x[0]))[:10]
    return [(d, round(s, 9)) for d, s in ranked]


def test_most_and_best_fields_match_python(spark, fielded_docs):
    rows = fielded_docs.collect()
    got_most = [
        (r["doc_id"], round(r["score"], 9))
        for r in multi_field_bm25(fielded_docs, Q, FIELDS, 10).collect()
    ]
    assert got_most == _want(rows, "most_fields") and got_most

    got_best = [
        (r["doc_id"], round(r["score"], 9))
        for r in multi_field_bm25(
            fielded_docs, Q, FIELDS, 10, mode="best_fields", tie_breaker=0.3
        ).collect()
    ]
    assert got_best == _want(rows, "best_fields", 0.3) and got_best

    # tie_breaker=1.0 degenerates to most_fields; unknown mode rejected
    got_tb1 = [
        (r["doc_id"], round(r["score"], 9))
        for r in multi_field_bm25(
            fielded_docs, Q, FIELDS, 10, mode="best_fields", tie_breaker=1.0
        ).collect()
    ]
    assert got_tb1 == got_most
    with pytest.raises(ValueError, match="mode"):
        multi_field_bm25(fielded_docs, Q, FIELDS, 10, mode="nope")


def test_cross_fields_matches_python(spark, fielded_docs):
    """cross_fields: blended (max) df across fields, per-field length
    norms, per-term dis-max with tie_breaker, summed over terms."""
    rows = fielded_docs.collect()
    terms = tokenize_text(Q)
    toks = {f: {r["doc_id"]: tokenize_text(r[f]) for r in rows} for f in FIELDS}
    n = len(rows)
    avgdl = {f: sum(len(t) for t in toks[f].values()) / n for f in FIELDS}
    dfb = {
        q: max(sum(1 for t in toks[f].values() if q in t) for f in FIELDS)
        for q in terms
    }
    combined = {}
    for d in toks["text"]:
        s = 0.0
        for q in terms:
            if not dfb[q]:
                continue
            idf = math.log(1.0 + (n - dfb[q] + 0.5) / (dfb[q] + 0.5))
            cs = []
            for f, boost in FIELDS.items():
                ts = toks[f][d]
                c = ts.count(q)
                if c:
                    cs.append(
                        boost * idf * c
                        / (c + 1.2 * (1 - 0.75 + 0.75 * len(ts) / (avgdl[f] or 1e-9)))
                    )
            if cs:
                s += max(cs) + 0.3 * (sum(cs) - max(cs))
        if s:
            combined[d] = s
    want = [
        (d, round(v, 9))
        for d, v in sorted(combined.items(), key=lambda x: (-x[1], x[0]))[:10]
    ]
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in multi_field_bm25(
            fielded_docs, Q, FIELDS, 10, mode="cross_fields", tie_breaker=0.3
        ).collect()
    ]
    assert got == want and got
    # a term present in BOTH fields counts once (dis-max), so cross with
    # tie_breaker=0 is bounded above by most_fields everywhere
    cross0 = {
        r["doc_id"]: r["score"]
        for r in multi_field_bm25(
            fielded_docs, Q, FIELDS, 50, mode="cross_fields"
        ).collect()
    }
    most = {
        r["doc_id"]: r["score"]
        for r in multi_field_bm25(fielded_docs, Q, FIELDS, 50).collect()
    }
    for d, v in cross0.items():
        if d in most:
            assert v <= most[d] + 1e-9


def test_more_like_this_field_matches_python(spark, fielded_docs):
    """Field-scoped MLT vs a pure-Python recompute: term selection on the
    head field (tf·idf with floors, ties term-asc), then single-field
    BM25 with the head field's own stats, source doc excluded."""
    from kafka_elasticsearch_standalone_consumer_spark.query.multifield import (
        more_like_this_field,
    )

    rows = fielded_docs.collect()
    src = 1
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in more_like_this_field(
            fielded_docs, src, "head", k=10, max_query_terms=3
        ).collect()
    ]

    toks = {r["doc_id"]: tokenize_text(r["head"]) for r in rows}
    n = len(toks)
    tf = {}
    for t in toks[src]:
        tf[t] = tf.get(t, 0) + 1
    df = {t: sum(1 for ts in toks.values() if t in ts) for t in tf}
    ranked = sorted(
        (-c * math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)), t)
        for t, c in tf.items()
        if df[t] >= 1
    )
    selected = [t for _, t in ranked[:3]]
    scores = _python_field_scores(rows, "head", 1.0, selected)
    scores.pop(src, None)
    want = [
        (d, round(s, 9))
        for d, s in sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:10]
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gd == wd and abs(gs - ws) < 1e-6

    # unknown source doc -> empty, no crash
    assert more_like_this_field(fielded_docs, 10**9, "head").count() == 0


def test_fuzzy_like_this_field_matches_python(spark, fielded_docs):
    """Field-scoped FLT vs a pure-Python recompute: fuzzify against the
    head field's own dictionary (prefix + length-band pruning, restricted
    Damerau ≤ fuzziness), blended idf per source-term group from the
    group's max df, similarity-weighted variants capped by the half-up
    4-dp-rounded weight key, then single-field BM25 with head's stats."""
    import math

    from kafka_elasticsearch_standalone_consumer_spark.query.engine import (
        _damerau_levenshtein,
    )
    from kafka_elasticsearch_standalone_consumer_spark.query.multifield import (
        fuzzy_like_this_field,
    )

    rows = fielded_docs.collect()
    toks = {r["doc_id"]: tokenize_text(r["head"]) for r in rows}
    n = len(toks)
    # one real head term with a typo: take the most common head term and
    # mutate its last character so expansion is non-trivial
    from collections import Counter

    common = Counter(t for ts in toks.values() for t in ts).most_common(1)[0][0]
    like = common[:-1] + ("x" if common[-1] != "x" else "y")
    fz, plen, mqt = 1, 1, 5

    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in fuzzy_like_this_field(
            fielded_docs, like, "head", k=10, fuzziness=fz,
            prefix_length=plen, max_query_terms=mqt,
        ).collect()
    ]

    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    variants = {}
    for v in df:
        if not v.startswith(like[:plen]) or abs(len(v) - len(like)) > fz:
            continue
        d = _damerau_levenshtein(like, v, fz)
        if d <= fz:
            sim = 1.0 - d / min(len(like), len(v))
            if sim > 0:
                variants[v] = sim
    assert variants, "typo produced no expansion — pick a better seed term"
    dmax = max(df[v] for v in variants)
    idf = math.log(1.0 + (n - dmax + 0.5) / (dmax + 0.5))
    sel = sorted(
        (-math.floor(sim * idf * 10000.0 + 0.5), v, like, sim * idf)
        for v, sim in variants.items()
    )[:mqt]
    idfw = {}
    for _k2, v, _t, w in sel:
        idfw[v] = idfw.get(v, 0.0) + w
    scores = {}
    avgdl = sum(len(ts) for ts in toks.values()) / n
    for d_, ts in toks.items():
        s = 0.0
        # sorted-term fold — the repo's bit-identity invariant for every
        # BM25 accumulation path (kernels sort runs by term; the field
        # variant array_sorts its (term, contrib) pairs before folding)
        for v in sorted(idfw):
            w = idfw[v]
            c = ts.count(v)
            if c:
                s += w * c / (c + 1.2 * (1 - 0.75 + 0.75 * len(ts) / avgdl))
        if s:
            scores[d_] = s
    want = [
        (d_, round(s, 9))
        for d_, s in sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:10]
    ]
    assert [d for d, _ in got] == [d for d, _ in want] and got
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gd == wd and gs == ws

    # guards: unpruned expansion refused; no-expansion like_text -> empty
    with pytest.raises(ValueError, match="prefix_length"):
        fuzzy_like_this_field(fielded_docs, "x", "head", prefix_length=0)
    assert fuzzy_like_this_field(fielded_docs, "zzzzqqq", "head").count() == 0
