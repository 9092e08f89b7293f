"""Span queries (span_first / span_near) and the dis_max compound: the
position kernels must match a brute-force pure-Python scan of the corpus,
and the compound identities must hold (ordered span_near slop=0 ==
match_phrase; single-clause dis_max == plain search)."""

from __future__ import annotations

import math

import pytest

from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text
from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

K = 10
K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def pos_index(spark, transcripts, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("spanwh") / "idx")
    build_index(
        spark, transcripts, path, docs_per_shard=256, n_buckets=8, positions=True
    )
    return Index(spark, path)


@pytest.fixture(scope="module")
def corpus_texts(spark, pos_index):
    rows = pos_index._docs_df().select("doc_id", "text", "role").collect()
    return {r["doc_id"]: (tokenize_text(r["text"]), r["role"]) for r in rows}


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def _score_tfp(corpus_texts, tfp, role_filter=None):
    """Synthetic-term scoring shared by the brute references: global df
    over the UNFILTERED match set, candidates optionally role-filtered."""
    dls = {d: len(t) for d, (t, _r) in corpus_texts.items()}
    avgdl = sum(dls.values()) / len(dls)
    if not tfp:
        return []
    n = len(corpus_texts)
    idf = math.log(1.0 + (n - len(tfp) + 0.5) / (len(tfp) + 0.5))
    scored = [
        (d, idf * c / (c + K1 * (1 - B + B * dls[d] / avgdl)))
        for d, c in tfp.items()
        if role_filter is None or corpus_texts[d][1] == role_filter
    ]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return [(d, round(s, 9)) for d, s in scored[:K]]


def _brute_span_first(corpus_texts, term, end, role=None):
    tfp = {}
    for d, (toks, _r) in corpus_texts.items():
        c = sum(1 for i in range(min(end, len(toks))) if toks[i] == term)
        if c:
            tfp[d] = c
    return _score_tfp(corpus_texts, tfp, role)


def _brute_span_near(corpus_texts, terms, slop, in_order, role=None):
    n = len(terms)
    win = n - 1 + slop
    tfp = {}
    for d, (toks, _r) in corpus_texts.items():
        c = 0
        if in_order:
            for i, t in enumerate(toks):
                if t != terms[0]:
                    continue
                q = i
                ok = True
                for nxt in terms[1:]:
                    found = next((j for j in range(q + 1, len(toks)) if toks[j] == nxt), None)
                    if found is None:
                        ok = False
                        break
                    q = found
                if ok and q - i <= win:
                    c += 1
        else:
            for i, t in enumerate(toks):
                if t not in terms:
                    continue
                window = toks[i : i + win + 1]
                if all(x in window for x in terms):
                    c += 1
        if c:
            tfp[d] = c
    return _score_tfp(corpus_texts, tfp, role)


def _pick_terms(corpus_texts):
    """Two terms that co-occur nearby in at least one doc."""
    for _d, (toks, _r) in sorted(corpus_texts.items()):
        if len(toks) >= 6:
            a, b = toks[2], toks[4]
            if a != b:
                return a, b
    raise AssertionError("corpus too small")


def test_span_first_equals_brute(spark, pos_index, corpus_texts):
    term = next(
        t for _d, (toks, _r) in sorted(corpus_texts.items()) for t in toks[:1]
    )
    for end in (1, 3, 8):
        fast = _rows(pos_index.search_span_first(term, end, k=K))
        assert fast == _brute_span_first(corpus_texts, term, end), end


def test_span_near_unordered_equals_brute(spark, pos_index, corpus_texts):
    a, b = _pick_terms(corpus_texts)
    for slop in (0, 1, 3):
        fast = _rows(
            pos_index.search_span_near([a, b], slop=slop, in_order=False, k=K)
        )
        assert fast == _brute_span_near(corpus_texts, [a, b], slop, False), slop


def test_span_near_ordered_equals_brute(spark, pos_index, corpus_texts):
    a, b = _pick_terms(corpus_texts)
    for terms in ([a, b], [b, a]):
        fast = _rows(
            pos_index.search_span_near(terms, slop=2, in_order=True, k=K)
        )
        assert fast == _brute_span_near(corpus_texts, terms, 2, True), terms


def test_span_near_three_terms(spark, pos_index, corpus_texts):
    for _d, (toks, _r) in sorted(corpus_texts.items()):
        if len(toks) >= 8 and len({toks[1], toks[3], toks[5]}) == 3:
            terms = [toks[1], toks[3], toks[5]]
            break
    fast = _rows(pos_index.search_span_near(terms, slop=2, in_order=True, k=K))
    assert fast == _brute_span_near(corpus_texts, terms, 2, True)
    fastu = _rows(pos_index.search_span_near(terms, slop=2, in_order=False, k=K))
    assert fastu == _brute_span_near(corpus_texts, terms, 2, False)


def test_ordered_span_slop0_equals_phrase(spark, pos_index, corpus_texts):
    a, b = _pick_terms(corpus_texts)
    # adjacent bigram from the corpus (standard analyzer: offsets 0,1)
    for _d, (toks, _r) in sorted(corpus_texts.items()):
        if len(toks) >= 2 and toks[0] != toks[1]:
            a, b = toks[0], toks[1]
            break
    phrase = _rows(pos_index.search_phrase(f"{a} {b}", K))
    span = _rows(pos_index.search_span_near([a, b], slop=0, in_order=True, k=K))
    assert phrase == span and phrase


def test_span_where_filters_keep_stats_global(spark, pos_index, corpus_texts):
    a, b = _pick_terms(corpus_texts)
    fast = _rows(
        pos_index.search_span_near(
            [a, b], slop=3, in_order=False, k=K, where="role = 'user'"
        )
    )
    assert fast == _brute_span_near(corpus_texts, [a, b], 3, False, role="user")
    first = _rows(pos_index.search_span_first(a, 4, k=K, where="role = 'user'"))
    assert first == _brute_span_first(corpus_texts, a, 4, role="user")


def _brute_dismax(corpus_texts, clauses, tie_breaker, limit=K):
    dls = {d: len(t) for d, (t, _r) in corpus_texts.items()}
    n = len(corpus_texts)
    avgdl = sum(dls.values()) / len(dls)
    per_doc: dict[int, list[float]] = {}
    for clause in clauses:
        qterms = tokenize_text(clause)
        weights: dict[str, float] = {}
        for t in qterms:
            weights[t] = weights.get(t, 0.0) + 1.0
        cl_scores: dict[int, float] = {}
        for t, w in weights.items():
            df = sum(1 for _d, (toks, _r) in corpus_texts.items() if t in toks)
            if not df:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for d, (toks, _r) in corpus_texts.items():
                tf = toks.count(t)
                if tf:
                    cl_scores[d] = cl_scores.get(d, 0.0) + w * idf * tf / (
                        tf + K1 * (1 - B + B * dls[d] / avgdl)
                    )
        for d, s in cl_scores.items():
            per_doc.setdefault(d, []).append(s)
    scored = [
        (d, max(ss) + tie_breaker * (sum(ss) - max(ss))) for d, ss in per_doc.items()
    ]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return [(d, round(s, 9)) for d, s in scored[:limit]]


def test_dismax_single_clause_equals_search(spark, pos_index, corpus_texts):
    a, b = _pick_terms(corpus_texts)
    q = f"{a} {b}"
    dm = _rows(pos_index.search_dis_max([q], tie_breaker=0.5, k=K))
    ex = _rows(pos_index.search(q, K, mode="exact"))
    assert dm == ex and dm


def test_dismax_equals_brute(spark, pos_index, corpus_texts):
    a, b = _pick_terms(corpus_texts)
    clauses = [f"{a} {b}", b]
    for tb in (0.0, 0.3, 1.0):
        dm = _rows(pos_index.search_dis_max(clauses, tie_breaker=tb, k=K))
        assert dm == _brute_dismax(corpus_texts, clauses, tb), tb


def test_dismax_where_filters(spark, pos_index, corpus_texts):
    a, b = _pick_terms(corpus_texts)
    clauses = [f"{a} {b}", b]
    dm = _rows(
        pos_index.search_dis_max(clauses, tie_breaker=0.3, k=K, where="role = 'user'")
    )
    # brute restricted to user turns AFTER scoring (stats stay global)
    full = _brute_dismax(corpus_texts, clauses, 0.3, limit=len(corpus_texts))
    allowed = {d for d, (_t, r) in corpus_texts.items() if r == "user"}
    expect = [(d, s) for d, s in full if d in allowed][:K]
    assert dm == expect and dm


def test_span_near_unordered_repeated_terms_rejected(spark, pos_index):
    with pytest.raises(ValueError, match="repeated terms"):
        pos_index.search_span_near(["hash", "hash"], slop=2, in_order=False)
    with pytest.raises(ValueError, match="repeated terms"):
        pos_index.search_span_near([["hash", "join"], "join"], slop=2, in_order=False)


def _brute_span_or(corpus_texts, terms, role=None):
    tset = set(terms)
    tfp = {}
    for d, (toks, _r) in corpus_texts.items():
        c = sum(1 for t in toks if t in tset)
        if c:
            tfp[d] = c
    return _score_tfp(corpus_texts, tfp, role)


def _brute_span_near_sets(corpus_texts, slots, slop, in_order, role=None):
    """span_near where each clause is a SET of alternatives (span_or)."""
    n = len(slots)
    win = n - 1 + slop
    anyset = {t for s in slots for t in s}
    tfp = {}
    for d, (toks, _r) in corpus_texts.items():
        c = 0
        if in_order:
            for i, t in enumerate(toks):
                if t not in slots[0]:
                    continue
                q, ok = i, True
                for nxt in slots[1:]:
                    found = next(
                        (j for j in range(q + 1, len(toks)) if toks[j] in nxt), None
                    )
                    if found is None:
                        ok = False
                        break
                    q = found
                if ok and q - i <= win:
                    c += 1
        else:
            for i, t in enumerate(toks):
                if t not in anyset:
                    continue
                window = toks[i : i + win + 1]
                if all(any(x in window for x in s) for s in slots):
                    c += 1
        if c:
            tfp[d] = c
    return _score_tfp(corpus_texts, tfp, role)


def _brute_span_not(corpus_texts, include, exclude, pre, post, role=None):
    inc, exc = set(include), set(exclude)
    tfp = {}
    for d, (toks, _r) in corpus_texts.items():
        c = 0
        for i, t in enumerate(toks):
            if t not in inc:
                continue
            lo, hi = max(i - pre, 0), min(i + post, len(toks) - 1)
            if not any(toks[j] in exc for j in range(lo, hi + 1)):
                c += 1
        if c:
            tfp[d] = c
    return _score_tfp(corpus_texts, tfp, role)


def test_span_or_equals_brute(spark, pos_index, corpus_texts):
    a, b = _pick_terms(corpus_texts)
    fast = _rows(pos_index.search_span_or([a, b], k=K))
    assert fast == _brute_span_or(corpus_texts, [a, b]) and fast


def test_span_or_single_term_equals_search(spark, pos_index, corpus_texts):
    a, _b = _pick_terms(corpus_texts)
    so = _rows(pos_index.search_span_or([a], k=K))
    ex = _rows(pos_index.search(a, K, mode="exact"))
    assert so == ex and so


def test_span_near_with_or_clause_equals_brute(spark, pos_index, corpus_texts):
    a, b = _pick_terms(corpus_texts)
    # a third term distinct from both, guaranteed present
    c = next(
        t
        for _d, (toks, _r) in sorted(corpus_texts.items())
        for t in toks
        if t not in (a, b)
    )
    slots = [{a, c}, {b}]
    for in_order in (False, True):
        fast = _rows(
            pos_index.search_span_near([[a, c], b], slop=2, in_order=in_order, k=K)
        )
        assert fast == _brute_span_near_sets(corpus_texts, slots, 2, in_order), in_order


def test_span_not_equals_brute(spark, pos_index, corpus_texts):
    a, b = _pick_terms(corpus_texts)
    for pre, post in ((0, 0), (1, 1), (0, 2)):
        fast = _rows(pos_index.search_span_not(a, b, pre=pre, post=post, k=K))
        assert fast == _brute_span_not(corpus_texts, [a], [b], pre, post), (pre, post)


def test_span_not_absent_exclude_equals_span_or(spark, pos_index, corpus_texts):
    a, _b = _pick_terms(corpus_texts)
    sn = _rows(pos_index.search_span_not(a, "zzqqxxnotaterm", pre=3, post=3, k=K))
    so = _rows(pos_index.search_span_or([a], k=K))
    assert sn == so and sn


def test_span_not_where_filters_keep_stats_global(spark, pos_index, corpus_texts):
    a, b = _pick_terms(corpus_texts)
    fast = _rows(
        pos_index.search_span_not(a, b, pre=1, post=1, k=K, where="role = 'user'")
    )
    assert fast == _brute_span_not(corpus_texts, [a], [b], 1, 1, role="user")


def test_span_multi_prefix_clause(spark, pos_index, corpus_texts):
    """span_multi({"prefix": p}) == span_or over the dictionary
    expansions of p — the dict clause is pure rewrite, no new kernel."""
    a, _b = _pick_terms(corpus_texts)
    exp = pos_index._expand_prefix("w0001", 50)
    assert len(exp) > 1  # a genuinely multi-term rewrite
    want = _rows(pos_index.search_span_near([exp, a], slop=2, k=K))
    got = _rows(pos_index.search_span_near([{"prefix": "w0001"}, a], slop=2, k=K))
    assert got == want and got
    # max_expansions caps the rewrite in term order, like ES
    got1 = _rows(
        pos_index.search_span_near(
            [{"prefix": "w0001", "max_expansions": 1}, a], slop=2, k=K
        )
    )
    want1 = _rows(pos_index.search_span_near([[exp[0]], a], slop=2, k=K))
    assert got1 == want1
    # a prefix matching no dictionary term -> empty result, no crash
    assert pos_index.search_span_near([{"prefix": "zzqq"}, a], k=K).count() == 0


def _brute_big_intervals(toks, terms, slop, in_order):
    """span_near match intervals (start, end) under the engine's pinned
    deterministic definition (kernels._span_near_intervals docstring)."""
    n = len(terms)
    win = n - 1 + slop
    spans = []
    if in_order:
        for i, t in enumerate(toks):
            if t != terms[0]:
                continue
            q = i
            ok = True
            for nxt in terms[1:]:
                found = next(
                    (j for j in range(q + 1, len(toks)) if toks[j] == nxt), None
                )
                if found is None:
                    ok = False
                    break
                q = found
            if ok and q - i <= win:
                spans.append((i, q))
    else:
        for i, t in enumerate(toks):
            if t not in terms:
                continue
            ends = []
            for c in terms:
                found = next(
                    (j for j in range(i, min(i + win + 1, len(toks))) if toks[j] == c),
                    None,
                )
                if found is None:
                    ends = None
                    break
                ends.append(found)
            if ends is not None:
                spans.append((i, max(ends)))
    return spans


def _brute_span_contain(corpus_texts, little, big, slop, in_order, mode, role=None):
    tfp = {}
    for d, (toks, _r) in corpus_texts.items():
        spans = _brute_big_intervals(toks, big, slop, in_order)
        lpos = [i for i, t in enumerate(toks) if t == little]
        if mode == "within":
            c = sum(1 for p in lpos if any(s <= p <= e for s, e in spans))
        else:
            c = sum(1 for s, e in spans if any(s <= p <= e for p in lpos))
        if c:
            tfp[d] = c
    return _score_tfp(corpus_texts, tfp, role)


def _pick_contain_terms(corpus_texts):
    """(little, [big0, big1]) with little sitting strictly between the big
    terms in some doc, so every slop >= 1 configuration has a match."""
    for _d, (toks, _r) in sorted(corpus_texts.items()):
        for i in range(len(toks) - 2):
            a, m, b = toks[i], toks[i + 1], toks[i + 2]
            if len({a, m, b}) == 3:
                return m, [a, b]
    raise AssertionError("corpus too small")


def test_span_within_equals_brute(spark, pos_index, corpus_texts):
    little, big = _pick_contain_terms(corpus_texts)
    for slop, in_order in ((1, False), (3, False), (2, True), (4, True)):
        fast = _rows(
            pos_index.search_span_within(
                little, big, slop=slop, in_order=in_order, k=K
            )
        )
        brute = _brute_span_contain(
            corpus_texts, little, big, slop, in_order, "within"
        )
        assert fast == brute and fast, (slop, in_order)


def test_span_containing_equals_brute(spark, pos_index, corpus_texts):
    little, big = _pick_contain_terms(corpus_texts)
    for slop, in_order in ((1, False), (3, False), (2, True), (4, True)):
        fast = _rows(
            pos_index.search_span_containing(
                little, big, slop=slop, in_order=in_order, k=K
            )
        )
        brute = _brute_span_contain(
            corpus_texts, little, big, slop, in_order, "containing"
        )
        assert fast == brute and fast, (slop, in_order)


def test_span_contain_where_filters_keep_stats_global(
    spark, pos_index, corpus_texts
):
    little, big = _pick_contain_terms(corpus_texts)
    fast = _rows(
        pos_index.search_span_within(
            little, big, slop=2, k=K, where="role = 'user'"
        )
    )
    assert fast == _brute_span_contain(
        corpus_texts, little, big, 2, False, "within", role="user"
    )
    fastc = _rows(
        pos_index.search_span_containing(
            little, big, slop=2, k=K, where="role = 'user'"
        )
    )
    assert fastc == _brute_span_contain(
        corpus_texts, little, big, 2, False, "containing", role="user"
    )


def test_span_contain_edge_cases(spark, pos_index, corpus_texts):
    little, big = _pick_contain_terms(corpus_texts)
    # absent little / absent big clause -> empty, no crash
    assert pos_index.search_span_within("zzqqmissing", big, slop=2).count() == 0
    assert (
        pos_index.search_span_containing(
            little, ["zzqqmissing", big[0]], slop=2
        ).count()
        == 0
    )
    # unordered big with repeated terms refuses like span_near
    with pytest.raises(ValueError, match="repeated terms"):
        pos_index.search_span_containing(little, [big[0], big[0]], slop=2)
