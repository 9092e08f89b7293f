"""ES aggregation surfaces (histogram / range / stats / date_histogram):
each checked against a pure-Python recomputation over the fetched match
set, and scoping must respect filters, min_should_match, and tombstones
(they share facets' _agg_scope)."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text

Q = "w00000 w00003"


def _matched_rows(idx, q, msm=1, where=None):
    terms = set(tokenize_text(q))
    rows = idx._docs_df().collect()
    out = []
    for r in rows:
        toks = set(tokenize_text(r["text"]))
        if len(terms & toks) >= msm and (where is None or where(r)):
            out.append(r)
    return out


def test_histogram_matches_python(spark, built_index):
    idx, _ = built_index
    got = {r["bucket"]: r["n"] for r in idx.histogram(Q, "turn_idx", 5.0).collect()}
    want = Counter(math.floor(r["turn_idx"] / 5.0) * 5.0 for r in _matched_rows(idx, Q))
    assert got == dict(want) and got


def test_range_agg_matches_python(spark, built_index):
    idx, _ = built_index
    got = {r["range_label"]: r["n"] for r in idx.range_agg(Q, "turn_idx", [3, 8]).collect()}

    def label(v):
        return "*-3" if v < 3 else ("3-8" if v < 8 else "8-*")

    want = Counter(label(r["turn_idx"]) for r in _matched_rows(idx, Q))
    assert got == dict(want) and got


def test_stats_agg_matches_python(spark, built_index):
    idx, _ = built_index
    row = idx.stats_agg(Q, "turn_idx").collect()[0]
    vals = [r["turn_idx"] for r in _matched_rows(idx, Q)]
    assert row["n"] == len(vals)
    assert row["min_v"] == min(vals) and row["max_v"] == max(vals)
    assert row["sum_v"] == round(float(sum(vals)), 6)
    assert abs(row["avg_v"] - sum(vals) / len(vals)) < 1e-6


def test_extended_stats_matches_python(spark, built_index):
    idx, _ = built_index
    row = idx.extended_stats_agg(Q, "turn_idx").collect()[0]
    vals = [float(r["turn_idx"]) for r in _matched_rows(idx, Q)]
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / n  # population (ES semantics)
    assert row["n"] == n
    assert row["min_v"] == min(vals) and row["max_v"] == max(vals)
    assert row["sum_sq"] == round(sum(v * v for v in vals), 6)
    assert abs(row["variance"] - var) < 1e-3
    assert abs(row["std_dev"] - math.sqrt(var)) < 1e-3
    assert abs(row["std_upper"] - (mean + 2 * math.sqrt(var))) < 1e-3
    assert abs(row["std_lower"] - (mean - 2 * math.sqrt(var))) < 1e-3


def test_percentile_ranks_matches_python(spark, built_index):
    idx, _ = built_index
    probes = [2.0, 5.0, 9.0]
    got = {
        r["value"]: r["pct"]
        for r in idx.percentile_ranks_agg(Q, "turn_idx", probes).collect()
    }
    vals = [r["turn_idx"] for r in _matched_rows(idx, Q)]
    for v in probes:
        want = 100.0 * sum(1 for x in vals if x <= v) / len(vals)
        assert abs(got[v] - want) < 1e-6
    # empirical CDF is monotone
    assert got[2.0] <= got[5.0] <= got[9.0]


def test_date_range_matches_python(spark, built_index):
    idx, _ = built_index
    bounds = ["2026-01-02", "2026-01-04"]
    rows = idx.date_range_agg(Q, "ts", bounds).collect()
    got = {r["range_label"]: r["n"] for r in rows}

    def label(ts):
        s = ts.strftime("%Y-%m-%d %H:%M:%S")
        if s < "2026-01-02 00:00:00":
            return "*-2026-01-02"
        if s < "2026-01-04 00:00:00":
            return "2026-01-02-2026-01-04"
        return "2026-01-04-*"

    want = Counter(label(r["ts"]) for r in _matched_rows(idx, Q))
    assert got == dict(want) and got
    # rows come back in bucket order, not lexicographic
    labels = [r["range_label"] for r in rows]
    order = ["*-2026-01-02", "2026-01-02-2026-01-04", "2026-01-04-*"]
    assert labels == [l for l in order if l in got]


def test_scripted_metric_matches_python(spark, built_index):
    idx, _ = built_index
    row = idx.scripted_metric_agg(
        Q, "CAST(turn_idx AS DOUBLE) * turn_idx + 1", "sum(mapped)"
    ).collect()[0]
    want = sum(float(r["turn_idx"]) ** 2 + 1 for r in _matched_rows(idx, Q))
    assert row["value"] == want
    # non-sum reduce scripts work too
    row2 = idx.scripted_metric_agg(
        Q, "CAST(turn_idx AS DOUBLE)", "max(mapped) - min(mapped)"
    ).collect()[0]
    vals = [r["turn_idx"] for r in _matched_rows(idx, Q)]
    assert row2["value"] == float(max(vals) - min(vals))


def test_date_histogram_matches_python(spark, built_index):
    idx, _ = built_index
    got = {r["bucket"]: r["n"] for r in idx.date_histogram(Q, "ts", "day").collect()}
    want = Counter(r["ts"].strftime("%Y-%m-%d") for r in _matched_rows(idx, Q))
    assert got == dict(want) and got


def _quantile_cont(vals, p):
    vals = sorted(vals)
    idx = p * (len(vals) - 1)
    lo = math.floor(idx)
    hi = min(lo + 1, len(vals) - 1)
    return vals[lo] + (idx - lo) * (vals[hi] - vals[lo])


def test_percentiles_exact_and_sketch(spark, built_index):
    idx, _ = built_index
    pcts = [0.25, 0.5, 0.9]
    got = {r["pct"]: r["value"] for r in idx.percentiles_agg(Q, "turn_idx", pcts).collect()}
    vals = [r["turn_idx"] for r in _matched_rows(idx, Q)]
    for p in pcts:
        assert abs(got[p] - _quantile_cont(vals, p)) < 1e-6
    # the mergeable sketch path must land on an actual value near the exact
    approx = {
        r["pct"]: r["value"]
        for r in idx.percentiles_agg(Q, "turn_idx", pcts, exact=False).collect()
    }
    spread = max(vals) - min(vals) or 1
    for p in pcts:
        assert abs(approx[p] - got[p]) <= 0.1 * spread


def test_cardinality_exact_and_hll(spark, built_index):
    idx, _ = built_index
    exact = idx.cardinality_agg(Q, "conv_id", exact=True).collect()[0]["n_distinct"]
    want = len({r["conv_id"] for r in _matched_rows(idx, Q)})
    assert exact == want
    approx = idx.cardinality_agg(Q, "conv_id").collect()[0]["n_distinct"]
    assert abs(approx - exact) <= max(2, 0.15 * exact)


def test_top_hits_matches_python(spark, built_index):
    idx, _ = built_index
    got = idx.top_hits_agg(Q, "role", "turn_idx", k=2).collect()
    by_role: dict = {}
    for r in _matched_rows(idx, Q):
        by_role.setdefault(r["role"], []).append((-r["turn_idx"], r["doc_id"]))
    want = []
    for role in sorted(by_role):
        for rank, (neg, did) in enumerate(sorted(by_role[role])[:2], start=1):
            want.append((role, did, float(-neg), rank))
    assert [(r["role"], r["doc_id"], r["sort_value"], r["rank_in_bucket"]) for r in got] == want


def test_significant_terms_matches_python(spark, built_index):
    idx, _ = built_index
    got = idx.significant_terms(Q, size=5).collect()
    fg_rows = _matched_rows(idx, Q)
    all_rows = idx._docs_df().collect()
    fg_n, bg_n = Counter(), Counter()
    for r in all_rows:
        for t in set(tokenize_text(r["text"])):
            bg_n[t] += 1
    for r in fg_rows:
        for t in set(tokenize_text(r["text"])):
            fg_n[t] += 1
    fs, bs = float(len(fg_rows)), float(len(all_rows))
    scored = []
    for t, n in fg_n.items():
        fp, bp = n / fs, bg_n[t] / bs
        if fp > bp:
            scored.append((-round((fp - bp) * (fp / bp), 6), t, n, bg_n[t]))
    want = [(t, n, b, -s) for s, t, n, b in sorted(scored)[:5]]
    assert [(r["term"], r["fg_n"], r["bg_n"], r["score_r"]) for r in got] == want
    # the query's own terms are foreground-dominant by construction
    assert {r["term"] for r in got} & set(tokenize_text(Q))


def test_significant_terms_heuristics_match_python(spark, built_index):
    """ES 1.4 heuristics (mutual_information / chi_square / gnd) vs an
    independent Python fold over the same 2x2 contingency table."""
    import math

    idx, _ = built_index
    fg_rows = _matched_rows(idx, Q)
    all_rows = idx._docs_df().collect()
    fg_n, bg_n = Counter(), Counter()
    for r in all_rows:
        for t in set(tokenize_text(r["text"])):
            bg_n[t] += 1
    for r in fg_rows:
        for t in set(tokenize_text(r["text"])):
            fg_n[t] += 1
    fs, bs = float(len(fg_rows)), float(len(all_rows))

    def table(t):
        n11 = float(fg_n[t])
        n1_, n_1, n = fs, float(bg_n[t]), bs
        n10, n01 = n1_ - n11, n_1 - n11
        n00 = n - n1_ - n_1 + n11
        return n, n11, n1_, n_1, n10, n01, n00, n - n1_, n - n_1

    def mi(t):
        n, n11, n1_, n_1, n10, n01, n00, n0_, n_0 = table(t)

        def term(nij, ni, nj):
            return (nij / n) * math.log2(n * nij / (ni * nj)) if nij > 0 else 0.0

        return term(n11, n1_, n_1) + term(n10, n1_, n_0) + term(n01, n0_, n_1) + term(n00, n0_, n_0)

    def chi2(t):
        n, n11, n1_, n_1, n10, n01, n00, n0_, n_0 = table(t)
        d = n11 * n00 - n10 * n01
        return n * (d * d) / (n1_ * n_1 * n0_ * n_0)

    def gnd(t):
        n, n11, n1_, n_1, *_ = table(t)
        g = (max(math.log(n1_), math.log(n_1)) - math.log(n11)) / (
            math.log(n) - min(math.log(n1_), math.log(n_1))
        )
        return math.exp(-g)

    def pct(t):
        _, n11, _, n_1, *_ = table(t)
        return n11 / n_1

    for name, fn in [
        ("mutual_information", mi),
        ("chi_square", chi2),
        ("gnd", gnd),
        ("percentage", pct),
    ]:
        got = idx.significant_terms(Q, size=5, heuristic=name).collect()
        scored = []
        for t, nf in fg_n.items():
            if nf / fs > bg_n[t] / bs:
                scored.append((-round(fn(t), 6), t, nf, bg_n[t]))
        want = [(t, nf, b, -s) for s, t, nf, b in sorted(scored)[:5]]
        assert [(r["term"], r["fg_n"], r["bg_n"], r["score_r"]) for r in got] == want, name
    import pytest

    with pytest.raises(ValueError):
        idx.significant_terms(Q, heuristic="nope").collect()


def test_facets_include_exclude_are_anchored(spark, built_index):
    """include/exclude are FULL-value regexes (Lucene RegExp semantics):
    'user' must not be matched by include='use', and exclude applies
    after include."""
    idx, _ = built_index
    base = {r["role"]: r["n"] for r in idx.facets(Q, by="role").collect()}
    inc = {r["role"]: r["n"] for r in idx.facets(Q, by="role", include="user|tool").collect()}
    assert set(inc) == {"user", "tool"} & set(base)
    assert all(inc[k] == base[k] for k in inc)  # counts unchanged
    assert idx.facets(Q, by="role", include="use").count() == 0  # anchored
    exc = {r["role"]: r["n"] for r in idx.facets(Q, by="role", exclude="user").collect()}
    assert "user" not in exc and set(exc) == set(base) - {"user"}
    both = {r["role"] for r in idx.facets(Q, by="role", include="user|tool", exclude="user").collect()}
    assert both == {"tool"} & set(base)


def test_facets_stats_matches_python(spark, built_index):
    """ES 1.x terms_stats facet: per-key count/total/min/max/mean of the
    value field over the match set, recomputed by hand; NULL keys and
    NULL values contribute nothing; order knobs and the size cap hold;
    an unknown order raises."""
    import pytest

    idx, _ = built_index
    rows = [
        r
        for r in _matched_rows(idx, Q)
        if r["role"] is not None and r["turn_idx"] is not None
    ]
    want: dict[str, list[int]] = {}
    for r in rows:
        want.setdefault(r["role"], []).append(r["turn_idx"])
    exp = {
        k: (len(v), float(sum(v)), float(min(v)), float(max(v)), sum(v) / len(v))
        for k, v in want.items()
    }
    got = idx.facets_stats(Q, "role", "turn_idx", size=100).collect()
    assert {
        r["role"]: (r["n"], r["total"], r["min_v"], r["max_v"], r["mean_v"])
        for r in got
    } == exp
    # empty-match frame must carry the key column's REAL type (a numeric
    # key_field used to come back string-typed from the empty branch)
    empty = idx.facets_stats("zzzznosuchterm", "turn_idx", "turn_idx")
    assert empty.count() == 0
    assert dict(empty.dtypes)["turn_idx"] == dict(idx._docs_df().dtypes)["turn_idx"]
    # count desc, ties role asc
    assert [r["role"] for r in got] == sorted(exp, key=lambda k: (-exp[k][0], k))
    # order knobs
    by_term = [r["role"] for r in idx.facets_stats(Q, "role", "turn_idx", order="term").collect()]
    assert by_term == sorted(exp)
    by_total = [r["role"] for r in idx.facets_stats(Q, "role", "turn_idx", order="total").collect()]
    assert by_total == sorted(exp, key=lambda k: (-exp[k][1], k))
    # size cap bites
    assert idx.facets_stats(Q, "role", "turn_idx", size=1).count() == 1
    with pytest.raises(ValueError):
        idx.facets_stats(Q, "role", "turn_idx", order="sideways")
    # empty query -> empty frame with the declared schema
    empty = idx.facets_stats("", "role", "turn_idx")
    assert empty.count() == 0 and empty.columns == [
        "role", "n", "total", "min_v", "max_v", "mean_v",
    ]


def test_significant_terms_field_matches_python(spark, built_index):
    """Field-variant significant_terms (metadata values, not tokens):
    JLH recomputed by hand over the role column; NULLs skipped."""
    idx, _ = built_index
    fg_ids = {r["doc_id"] for r in _matched_rows(idx, Q)}
    rows = idx._docs_df().select("doc_id", "role").collect()
    live = [(r["doc_id"], r["role"]) for r in rows if r["role"] is not None]
    fg = [v for d, v in live if d in fg_ids]
    fs, bs = float(len(fg)), float(len(live))
    fg_n, bg_n = Counter(fg), Counter(v for _, v in live)
    scored = []
    for v, nf in fg_n.items():
        fp, bp = nf / fs, bg_n[v] / bs
        if fp > bp:
            scored.append((-round((fp - bp) * (fp / bp), 6), v, nf, bg_n[v]))
    want = [(v, nf, b, -s) for s, v, nf, b in sorted(scored)[:5]]
    got = idx.significant_terms_field(Q, "role", size=5).collect()
    assert [(r["term"], r["fg_n"], r["bg_n"], r["score_r"]) for r in got] == want


def test_corpus_summary_matches_raw_corpus(spark, built_index, transcripts):
    """ES _stats scalars vs direct recomputation over the raw transcripts:
    exact counts, vocabulary size, and avgdl as the exact-integer
    division (NOT the stored meta product)."""
    idx, _ = built_index
    r = idx.corpus_summary().collect()[0]
    rows = transcripts.select("text").collect()
    tok_lists = [tokenize_text(x["text"]) for x in rows]
    n_docs = len(rows)
    total = sum(len(t) for t in tok_lists)
    vocab = len({t for toks in tok_lists for t in toks})
    assert r["n_docs"] == n_docs
    assert r["total_tokens"] == total
    assert r["n_terms"] == vocab
    assert r["avgdl"] == float(total) / float(n_docs)  # bit-exact division


def test_terms_agg_sharded_matches_python(spark, built_index):
    """ES 1.4 shard-approximate terms agg vs a pure-Python simulation of
    the per-shard top-shard_size collection, plus ES's certificate
    df_est <= df_true <= df_est + err_bound and the exact-collapse case."""
    idx, _ = built_index
    dps = int(idx.meta["docs_per_shard"])
    per: dict[int, Counter] = {}
    true = Counter()
    for r in idx._docs_df().collect():
        c = per.setdefault(r["doc_id"] // dps, Counter())
        for t in set(tokenize_text(r["text"])):
            c[t] += 1
            true[t] += 1
    assert len(per) > 1, "fixture must span multiple shards"
    shard_size = 5
    returned, last = {}, {}
    for s, c in per.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        returned[s] = dict(ranked[:shard_size])
        last[s] = 0 if len(ranked) <= shard_size else ranked[shard_size - 1][1]
    est = Counter()
    for c in returned.values():
        for t, n in c.items():
            est[t] += n
    want = []
    for t, e in sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))[:7]:
        err = sum(last[s] for s in per if t not in returned[s])
        want.append((t, e, true[t], err))
    got = [
        (r["term"], r["df_est"], r["df_true"], r["err_bound"])
        for r in idx.terms_agg_sharded(size=7, shard_size=shard_size).collect()
    ]
    assert got == want
    assert all(e <= tr <= e + err for _, e, tr, err in got)
    # shard_size >= every shard's vocabulary: estimate exact, bound 0
    exact = idx.terms_agg_sharded(size=5, shard_size=10**6).collect()
    assert exact and all(
        r["df_est"] == r["df_true"] and r["err_bound"] == 0 for r in exact
    )
    import pytest

    with pytest.raises(ValueError):
        idx.terms_agg_sharded(shard_size=0)


def test_terms_metric_matches_python(spark, built_index):
    idx, _ = built_index
    got = idx.terms_agg(Q, "role", "turn_idx", ("avg", "max"), size=10).collect()
    by_role: dict = {}
    for r in _matched_rows(idx, Q):
        by_role.setdefault(r["role"], []).append(r["turn_idx"])
    want = sorted(
        (
            (role, len(vs), round(sum(vs) / len(vs), 6), float(max(vs)))
            for role, vs in by_role.items()
        ),
        key=lambda x: (-x[1], x[0]),
    )
    assert [(r["role"], r["n"], r["avg_v"], r["max_v"]) for r in got] == want and got


def test_agg_scope_respects_filter_and_msm(spark, built_index):
    idx, _ = built_index
    got = {
        r["bucket"]: r["n"]
        for r in idx.histogram(
            Q, "turn_idx", 5.0, where="role = 'user'", min_should_match=2
        ).collect()
    }
    want = Counter(
        math.floor(r["turn_idx"] / 5.0) * 5.0
        for r in _matched_rows(idx, Q, msm=2, where=lambda r: r["role"] == "user")
    )
    assert got == dict(want)
    # empty query -> empty result, stable schema
    assert idx.histogram("", "turn_idx", 5.0).count() == 0


def test_nested_terms_matches_python(spark, built_index):
    """Two-level terms agg (parent=role, child=expression) vs a pure-
    Python recomputation, including ES bucket ordering and the
    parent_n window total."""
    idx, _ = built_index
    got = idx.nested_terms_agg(
        Q, "role", "cast(turn_idx % 3 as string)", "turn_idx", ("avg",),
        size=2, child_size=2,
    ).collect()

    leaves: dict = {}
    for r in _matched_rows(idx, Q):
        leaves.setdefault((r["role"], str(r["turn_idx"] % 3)), []).append(r["turn_idx"])
    parent_n = Counter()
    for (p, _c), vs in leaves.items():
        parent_n[p] += len(vs)
    # top-2 parents by total desc (name asc ties), top-2 children by n desc
    parents = sorted(parent_n, key=lambda p: (-parent_n[p], p))[:2]
    want = []
    for p in parents:
        kids = sorted(
            ((c, vs) for (pp, c), vs in leaves.items() if pp == p),
            key=lambda x: (-len(x[1]), x[0]),
        )[:2]
        for c, vs in kids:
            want.append((p, c, len(vs), round(sum(vs) / len(vs), 6), parent_n[p]))
    assert [
        (r["parent"], r["child"], r["n"], r["avg_v"], r["parent_n"]) for r in got
    ] == want and got


def test_filters_agg_matches_python(spark, built_index):
    """Named predicate buckets + _other_ over the match scope; buckets
    may overlap (each predicate independent, ES semantics)."""
    idx, _ = built_index
    got = {
        r["bucket"]: r["n"]
        for r in idx.filters_agg(
            Q, {"early": "turn_idx < 3", "assistant": "role = 'assistant'"}
        ).collect()
    }
    rows = _matched_rows(idx, Q)
    want = {
        "early": sum(1 for r in rows if r["turn_idx"] < 3),
        "assistant": sum(1 for r in rows if r["role"] == "assistant"),
        "_other_": sum(
            1 for r in rows if not (r["turn_idx"] < 3) and r["role"] != "assistant"
        ),
    }
    assert got == want and got["early"] > 0
    # overlap is allowed: bucket sums may exceed the scope size
    assert sum(want.values()) >= len(rows) or sum(want.values()) <= 3 * len(rows)


def test_global_agg_escapes_query_scope(spark, built_index):
    idx, _ = built_index
    row = idx.global_agg("turn_idx").collect()[0]
    vals = [r["turn_idx"] for r in idx._docs_df().collect()]
    assert row["n"] == len(vals) and row["min_v"] == min(vals)
    assert row["max_v"] == max(vals)
    # and it is WIDER than any query scope
    assert row["n"] >= len(_matched_rows(idx, Q))


def test_missing_agg_counts_nulls(spark):
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    docs = spark.createDataFrame(
        [(0, "alpha beta", "x"), (1, "alpha gamma", None), (2, "alpha beta", None)],
        "doc_id long, text string, tag string",
    )
    idx = Index.ephemeral(docs, docs_per_shard=8, n_buckets=4)
    assert idx.missing_agg("alpha", "tag").collect()[0]["n_missing"] == 2
    assert idx.missing_agg("beta", "tag").collect()[0]["n_missing"] == 1


def test_composite_agg_pages_reconstruct_all_buckets(spark, built_index):
    """ES composite agg: walking pages via after-keys must reconstruct
    EVERY (role, turn_idx%4) bucket exactly once, in key order, with
    counts matching a Python recomputation."""
    idx, _ = built_index
    sources = [("role", "role"), ("bucket4", "cast(turn_idx % 4 as string)")]
    pages, after = [], None
    while True:
        page = idx.composite_agg(Q, sources, size=3, after=after).collect()
        if not page:
            break
        pages.extend(page)
        after = (page[-1]["role"], page[-1]["bucket4"])
        assert len(page) <= 3
    got = [(r["role"], r["bucket4"], r["n"]) for r in pages]
    want = Counter((r["role"], str(r["turn_idx"] % 4)) for r in _matched_rows(idx, Q))
    want_rows = sorted((ro, b, n) for (ro, b), n in want.items())
    assert got == want_rows and got
    # resuming mid-stream skips everything <= the after key
    mid = got[2][:2]
    resumed = idx.composite_agg(Q, sources, size=100, after=mid).collect()
    assert [(r["role"], r["bucket4"], r["n"]) for r in resumed] == got[3:]


def test_pipeline_metrics_matches_python(spark, built_index):
    """cumulative_sum / derivative / moving_avg over the date_histogram
    series vs a pure-Python recomputation (first derivative NULL, window
    includes current bucket)."""
    from kafka_elasticsearch_standalone_consumer_spark.query.aggs import (
        date_histogram,
        pipeline_metrics,
    )

    idx, _ = built_index
    base = date_histogram(idx._docs_df(), "ts", "day")
    got = pipeline_metrics(base, moving_window=3).collect()
    series = sorted((r["bucket"], r["n"]) for r in base.collect())
    cum, out = 0.0, []
    for i, (b, n) in enumerate(series):
        cum += n
        prev = float(series[i - 1][1]) if i else None
        window = [float(x) for _, x in series[max(0, i - 2) : i + 1]]
        out.append((b, n, cum, None if prev is None else n - prev,
                    round(sum(window) / len(window), 6)))
    assert [
        (r["bucket"], r["n"], r["cum_sum"], r["derivative"], r["moving_avg"])
        for r in got
    ] == out and out


def test_range_agg_excludes_nulls_and_orders_numerically(spark):
    """ADVICE r2: ES's range agg ignores docs missing the field (NULL must
    not land in the top open bucket), and buckets come back in numeric
    lower-bound order — '5-10' before '10-*', not lexicographic."""
    from kafka_elasticsearch_standalone_consumer_spark.query.aggs import range_counts

    df = spark.createDataFrame(
        [(1, 2.0), (2, 7.0), (3, 12.0), (4, None), (5, 8.0)],
        "doc_id long, v double",
    )
    rows = range_counts(df, "v", [5, 10]).collect()
    assert [r["range_label"] for r in rows] == ["*-5", "5-10", "10-*"]
    assert {r["range_label"]: r["n"] for r in rows} == {"*-5": 1, "5-10": 2, "10-*": 1}


def test_filters_agg_quoted_bucket_name(spark):
    """ADVICE r2: a bucket name containing a single quote must not break
    (or inject into) the stack() unpivot expression."""
    from kafka_elasticsearch_standalone_consumer_spark.query.aggs import filters_counts

    df = spark.createDataFrame([(1,), (2,), (3,)], "v long")
    rows = {r["bucket"]: r["n"] for r in filters_counts(df, {"it's big": "v >= 2"}).collect()}
    assert rows == {"it's big": 2, "_other_": 1}


def test_geo_distance_filter_and_agg_match_python(spark):
    """Geo family vs a pure-Python haversine recomputation: distance
    filter membership, bbox membership, ring-bucket counts, ES ordering."""
    import math

    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    pts = [(i, "alpha beta", -80.0 + i * 7.9, -170.0 + i * 17.3) for i in range(21)]
    df = spark.createDataFrame(pts, "doc_id long, text string, lat double, lon double")
    idx = Index.ephemeral(df, docs_per_shard=8, n_buckets=4)
    origin = (37.77, -122.42)

    def hav(la, lo):
        r = 6371.0088
        p1 = math.radians(origin[0])
        return 2 * r * math.asin(math.sqrt(
            math.sin(math.radians(la - origin[0]) / 2) ** 2
            + math.cos(math.radians(la)) * math.cos(p1)
            * math.sin(math.radians(lo - origin[1]) / 2) ** 2
        ))

    got = {
        r["doc_id"]
        for r in idx.search_geo_distance(
            "alpha", 50, origin=origin, radius_km=8000.0
        ).collect()
    }
    want = {i for i, _t, la, lo in pts if hav(la, lo) <= 8000.0}
    assert got == want and got and len(want) < len(pts)

    got_ring = {
        r["doc_id"]
        for r in idx.search_geo_distance_range(
            "alpha", 50, origin=origin, from_km=3000.0, to_km=9000.0
        ).collect()
    }
    want_ring = {i for i, _t, la, lo in pts if 3000.0 <= hav(la, lo) <= 9000.0}
    assert got_ring == want_ring and got_ring
    got_open = {
        r["doc_id"]
        for r in idx.search_geo_distance_range(
            "alpha", 50, origin=origin, from_km=9000.0
        ).collect()
    }
    assert got_open == {i for i, _t, la, lo in pts if hav(la, lo) >= 9000.0}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="from_km and/or to_km"):
        idx.search_geo_distance_range("alpha", 5, origin=origin)

    got_box = {
        r["doc_id"]
        for r in idx.search_geo_bbox(
            "alpha", 50, top_left=(60.0, -130.0), bottom_right=(0.0, -60.0)
        ).collect()
    }
    want_box = {i for i, _t, la, lo in pts if 0 <= la <= 60 and -130 <= lo <= -60}
    assert got_box == want_box

    import pytest as _pytest

    with _pytest.raises(ValueError, match="antimeridian"):
        idx.search_geo_bbox("alpha", 5, top_left=(10.0, 170.0), bottom_right=(-10.0, -170.0))

    rings = idx.geo_distance_agg(
        "alpha", origin=origin, bounds_km=[3000.0, 9000.0]
    ).collect()
    from collections import Counter

    want_rings = Counter(
        "*-3000.0" if hav(la, lo) < 3000 else
        "3000.0-9000.0" if hav(la, lo) < 9000 else "9000.0-*"
        for _i, _t, la, lo in pts
    )
    assert {r["range_label"]: r["n"] for r in rings} == dict(want_rings)
    assert [r["range_label"] for r in rings] == sorted(
        want_rings, key=lambda s: float(s.split("-")[0].replace("*", "-1"))
    )


def test_geohash_grid_matches_reference_encoder(spark):
    """Column-algebra geohash vs the textbook bisection encoder at
    several precisions (incl. the max, 12), plus grid-agg counts and ES
    ordering."""
    import random

    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    def py_geohash(lat, lon, p):
        alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
        lat_i, lon_i = (-90.0, 90.0), (-180.0, 180.0)
        bits, even = [], True
        while len(bits) < 5 * p:
            if even:
                mid = sum(lon_i) / 2
                bits.append(1 if lon >= mid else 0)
                lon_i = (mid, lon_i[1]) if lon >= mid else (lon_i[0], mid)
            else:
                mid = sum(lat_i) / 2
                bits.append(1 if lat >= mid else 0)
                lat_i = (mid, lat_i[1]) if lat >= mid else (lat_i[0], mid)
            even = not even
        return "".join(
            alpha[int("".join(map(str, bits[i * 5:(i + 1) * 5])), 2)]
            for i in range(p)
        )

    rng = random.Random(5)
    pts = [(i, rng.uniform(-89.9, 89.9), rng.uniform(-179.9, 179.9)) for i in range(60)]
    pts += [(60, 37.7749, -122.4194), (61, 0.0, 0.0), (62, -90.0, -180.0)]
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    for p in (1, 5, 12):
        got = {
            r["doc_id"]: r["gh"]
            for r in df.select(
                "doc_id", Index.geohash_col("lat", "lon", p).alias("gh")
            ).collect()
        }
        assert got == {i: py_geohash(la, lo, p) for i, la, lo in pts}, p
    assert py_geohash(37.7749, -122.4194, 5) == "9q8yy"  # known value

    idx = Index.ephemeral(
        df.withColumn("text", F.lit("alpha")), docs_per_shard=32, n_buckets=4
    )
    grid = idx.geohash_grid_agg("alpha", precision=1).collect()
    from collections import Counter

    want = Counter(py_geohash(la, lo, 1) for _i, la, lo in pts)
    assert {r["geohash"]: r["n"] for r in grid} == dict(want)
    assert [r["geohash"] for r in grid] == sorted(want, key=lambda g: (-want[g], g))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        Index.geohash_col("lat", "lon", 13)


def test_geo_polygon_matches_python_raycast(spark):
    """geo_polygon filter vs an independent pure-Python ray-cast
    (classic px < x-intersection form, NOT the engine's divisionless
    rearrangement) — same inside set on a global point grid."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    pts = [(i, "alpha", -85.0 + i * 6.1, -175.0 + i * 12.7) for i in range(28)]
    df = spark.createDataFrame(pts, "doc_id long, text string, lat double, lon double")
    idx = Index.ephemeral(df, docs_per_shard=8, n_buckets=4)
    poly = [(70.0, -170.0), (75.0, -40.0), (0.0, -30.0), (-60.0, -70.0), (-20.0, -160.0)]

    def inside(la, lo):
        n, c = len(poly), False
        for k in range(n):
            y1, x1 = poly[k]
            y2, x2 = poly[(k + 1) % n]
            if (y1 > la) != (y2 > la) and lo < x1 + (la - y1) * (x2 - x1) / (y2 - y1):
                c = not c
        return c

    got = {
        r["doc_id"]
        for r in idx.search_geo_polygon("alpha", 50, polygon=poly).collect()
    }
    want = {i for i, _t, la, lo in pts if inside(la, lo)}
    assert got == want and got and len(want) < len(pts)

    import pytest as _pytest

    with _pytest.raises(ValueError, match=">= 3"):
        Index._point_in_polygon_sql("lat", "lon", [(0.0, 0.0), (1.0, 1.0)])
    with _pytest.raises(ValueError, match="horizontal"):
        Index._point_in_polygon_sql("lat", "lon", [(5.0, 0.0), (5.0, 10.0), (5.0, 20.0)])


def test_geo_shape_indexed_matches_python_raycast(spark):
    """geo_shape over INDEXED (per-document) polygons vs an independent
    pure-Python ray-cast (classic quotient form, NOT the engine's
    runtime-sign divisionless rearrangement): each doc stores its own
    translated pentagon; the query is a point; same inside set."""
    from pyspark.sql import functions as F

    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    offs = [(0.0, 2.0), (2.0, 0.5), (1.25, -1.75), (-1.25, -1.75), (-2.0, 0.5)]
    rows = []
    for i in range(40):
        clon, clat = -20.0 + (i % 8) * 2.5, -9.0 + (i // 8) * 2.25
        rows.append((i, "alpha", [(clon + dx, clat + dy) for dx, dy in offs]))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, shape array<struct<lon:double,lat:double>>"
    )
    idx = Index.ephemeral(df, docs_per_shard=8, n_buckets=4)
    ring = [(f"shape[{j}].lon", f"shape[{j}].lat") for j in range(5)]
    qlon, qlat = -12.3, -3.4

    def inside(poly):
        n, c = len(poly), False
        for k in range(n):
            x1, y1 = poly[k]
            x2, y2 = poly[(k + 1) % n]
            if (y1 > qlat) != (y2 > qlat) and qlon < x1 + (qlat - y1) * (x2 - x1) / (y2 - y1):
                c = not c
        return c

    got = {
        r["doc_id"]
        for r in idx.search_geo_shape_indexed(
            "alpha", 50, ring_sql=ring, point=(qlon, qlat)
        ).collect()
    }
    want = {i for i, _t, poly in rows if inside(poly)}
    assert got == want and got and len(want) < len(rows)

    dis = {
        r["doc_id"]
        for r in idx.search_geo_shape_indexed(
            "alpha", 50, ring_sql=ring, point=(qlon, qlat), relation="disjoint"
        ).collect()
    }
    assert dis == {i for i, _t, _p in rows} - want

    import pytest as _pytest

    with _pytest.raises(ValueError, match="relation"):
        idx.geo_shape_indexed_where(ring, (qlon, qlat), relation="within")
    with _pytest.raises(ValueError, match=">= 3"):
        Index.shape_ring_contains_point_sql(ring[:2], qlon, qlat)


def test_geohash_codec_roundtrip_and_neighbors():
    """Driver-side geohash codec: known value, decode-box roundtrip,
    neighbor structure (8 interior / edge-adjacent boxes / pole clamp),
    and the interleaved-int form."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    assert Index.geohash_encode(37.7749, -122.4194, 5) == "9q8yy"
    for cell in ("9q8yy", "u4pru", "s0", "7zzzz"):
        lat_lo, lat_hi, lon_lo, lon_hi = Index.geohash_decode_box(cell)
        clat, clon = (lat_lo + lat_hi) / 2, (lon_lo + lon_hi) / 2
        assert Index.geohash_encode(clat, clon, len(cell)) == cell

    nb = Index.geohash_neighbors("9q8yy")
    assert len(nb) == 8 and "9q8yy" not in nb
    box = Index.geohash_decode_box("9q8yy")
    for c in nb:
        b = Index.geohash_decode_box(c)
        # every neighbor box touches the origin box (shared edge/corner)
        assert b[0] <= box[1] and b[1] >= box[0]
        assert b[2] <= box[3] and b[3] >= box[2]
    # at the pole: no cells beyond it, so fewer than 8
    assert len(Index.geohash_neighbors(Index.geohash_encode(89.99, 0.0, 2))) < 8

    assert Index.geohash_cell_int("0") == 0
    assert Index.geohash_cell_int("zz") == (1 << 10) - 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        Index.geohash_encode(0.0, 0.0, 13)


def test_geohash_cell_filter_membership(spark):
    """search_geohash_cell ≡ {docs whose encoded cell is the query cell
    (+ neighbors)} via the reference bisection encoder."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    pts = [(i, "alpha", -85.0 + i * 6.1, -175.0 + i * 12.7) for i in range(28)]
    df = spark.createDataFrame(pts, "doc_id long, text string, lat double, lon double")
    idx = Index.ephemeral(df, docs_per_shard=8, n_buckets=4)
    point, p = (10.0, -50.0), 1

    cell = Index.geohash_encode(*point, p)
    for neighbors in (False, True):
        cells = {cell} | (set(Index.geohash_neighbors(cell)) if neighbors else set())
        got = {
            r["doc_id"]
            for r in idx.search_geohash_cell(
                "alpha", 50, point=point, precision=p, neighbors=neighbors
            ).collect()
        }
        want = {
            i for i, _t, la, lo in pts if Index.geohash_encode(la, lo, p) in cells
        }
        assert got == want, (neighbors, cells)
    assert got  # the neighbors=True variant catches at least one doc


def test_geo_bounds_and_distance_sort(spark):
    """geo_bounds_agg vs python min/max box; _geo_distance sort order vs
    python haversine rounded to 4 dp with doc_id ties."""
    import math

    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    pts = [(i, "alpha beta", -80.0 + i * 7.9, -170.0 + i * 17.3) for i in range(21)]
    df = spark.createDataFrame(pts, "doc_id long, text string, lat double, lon double")
    idx = Index.ephemeral(df, docs_per_shard=8, n_buckets=4)
    origin = (37.77, -122.42)

    row = idx.geo_bounds_agg("alpha").collect()[0]
    lats = [la for _i, _t, la, _lo in pts]
    lons = [lo for _i, _t, _la, lo in pts]
    assert (
        row["top_left_lat"], row["top_left_lon"],
        row["bottom_right_lat"], row["bottom_right_lon"],
    ) == (
        round(max(lats), 6), round(min(lons), 6),
        round(min(lats), 6), round(max(lons), 6),
    )
    assert idx.geo_bounds_agg("zzzznomatch").count() == 0

    def hav(la, lo):
        r = 6371.0088
        p1 = math.radians(origin[0])
        return 2 * r * math.asin(math.sqrt(
            math.sin(math.radians(la - origin[0]) / 2) ** 2
            + math.cos(math.radians(la)) * math.cos(p1)
            * math.sin(math.radians(lo - origin[1]) / 2) ** 2
        ))

    got = [
        (r["doc_id"], r["dist_km"])
        for r in idx.search_geo_distance_sort("alpha", 7, origin=origin).collect()
    ]
    want = sorted(
        ((i, round(hav(la, lo), 4)) for i, _t, la, lo in pts),
        key=lambda t: (t[1], t[0]),
    )[:7]
    assert got == want
    far = [
        r["doc_id"]
        for r in idx.search_geo_distance_sort(
            "alpha", 3, origin=origin, ascending=False
        ).collect()
    ]
    assert far == [i for i, _d in sorted(
        ((i, round(hav(la, lo), 4)) for i, _t, la, lo in pts),
        key=lambda t: (-t[1], t[0]),
    )[:3]]


def test_value_count_and_filter_agg(spark):
    """value_count is the non-NULL dual of missing; filter_agg narrows the
    match set before the stats metric (and an all-false filter yields the
    empty-stats row, n=0)."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    docs = spark.createDataFrame(
        [
            (0, "alpha beta", "x", 10),
            (1, "alpha gamma", None, 20),
            (2, "alpha beta", "y", 30),
        ],
        "doc_id long, text string, tag string, n long",
    )
    idx = Index.ephemeral(docs, docs_per_shard=8, n_buckets=4)
    assert idx.value_count_agg("alpha", "tag").collect()[0]["n_values"] == 2
    assert idx.value_count_agg("beta", "tag").collect()[0]["n_values"] == 2
    row = idx.filter_agg("alpha", "tag IS NOT NULL", "n").collect()[0]
    assert (row["n"], row["min_v"], row["max_v"], row["sum_v"]) == (2, 10.0, 30.0, 40.0)
    empty = idx.filter_agg("alpha", "tag = 'zz'", "n").collect()[0]
    assert empty["n"] == 0 and empty["min_v"] is None


def test_geo_shape_relations_match_primitive_filters(spark):
    """geo_shape must reduce exactly to the primitive geo filters it
    dispatches to: envelope ≡ bbox, circle ≡ distance, polygon ≡
    geo_polygon (GeoJSON ring closed, lon-first), point-equality, and
    disjoint as the exact complement partition of the match set."""
    import pytest

    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    pts = [(i, "alpha beta", -80.0 + i * 7.9, -170.0 + i * 17.3) for i in range(21)]
    df = spark.createDataFrame(pts, "doc_id long, text string, lat double, lon double")
    idx = Index.ephemeral(df, docs_per_shard=8, n_buckets=4)

    def ids(res):
        return {r["doc_id"] for r in res.collect()}

    env = {"type": "envelope", "coordinates": [[-130.0, 60.0], [-60.0, 0.0]]}
    want = ids(idx.search_geo_bbox("alpha", 50, top_left=(60.0, -130.0),
                                   bottom_right=(0.0, -60.0)))
    assert ids(idx.search_geo_shape("alpha", 50, shape=env)) == want
    assert ids(idx.search_geo_shape("alpha", 50, shape=env, relation="within")) == want

    circ = {"type": "circle", "coordinates": [-122.42, 37.77], "radius": "6000km"}
    want_c = ids(idx.search_geo_distance("alpha", 50, origin=(37.77, -122.42),
                                         radius_km=6000.0))
    assert ids(idx.search_geo_shape("alpha", 50, shape=circ)) == want_c
    # metre string and bare-metre number parse to the same circle
    circ_m = dict(circ, radius="6000000m")
    assert ids(idx.search_geo_shape("alpha", 50, shape=circ_m)) == want_c
    assert ids(idx.search_geo_shape("alpha", 50, shape=dict(circ, radius=6000000))) == want_c

    ring = [(70.0, -170.0), (75.0, -40.0), (0.0, -30.0), (-60.0, -70.0), (-20.0, -160.0)]
    poly = {"type": "polygon",
            "coordinates": [[[lo, la] for la, lo in ring] + [[ring[0][1], ring[0][0]]]]}
    want_p = ids(idx.search_geo_polygon("alpha", 50, polygon=ring))
    assert ids(idx.search_geo_shape("alpha", 50, shape=poly)) == want_p

    # disjoint = exact complement within the text match set (no null geo here)
    all_ids = ids(idx.search("alpha", 50))
    dis = ids(idx.search_geo_shape("alpha", 50, shape=env, relation="disjoint"))
    assert dis == all_ids - want and dis | want == all_ids

    pt = {"type": "point", "coordinates": [pts[3][3], pts[3][2]]}
    assert ids(idx.search_geo_shape("alpha", 50, shape=pt)) == {3}

    with pytest.raises(ValueError, match="contains"):
        idx.search_geo_shape("alpha", 5, shape=env, relation="contains")
    with pytest.raises(ValueError, match="holes"):
        idx.search_geo_shape("alpha", 5, shape={"type": "polygon",
                                                "coordinates": [[[0, 0]], [[1, 1]]]})
    with pytest.raises(ValueError, match="antimeridian"):
        idx.search_geo_shape("alpha", 5, shape={"type": "envelope",
                                                "coordinates": [[170.0, 10.0], [-170.0, -10.0]]})
    with pytest.raises(ValueError, match="type"):
        idx.search_geo_shape("alpha", 5, shape={"type": "multipolygon", "coordinates": []})


def test_significant_terms_background_filter(spark, built_index):
    """background_where narrows ONLY the background stats: a tautological
    filter reproduces the plain agg exactly; a real one changes bg_n and
    the JLH ordering recomputes from the narrowed scope (pure Python
    recount)."""
    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text

    idx, _ = built_index
    q = "w00000 w00003"
    plain = [tuple(r) for r in idx.significant_terms(q, size=10).collect()]
    taut = [
        tuple(r)
        for r in idx.significant_terms(
            q, size=10, background_where="turn_idx >= 0"
        ).collect()
    ]
    assert plain == taut

    rows = idx._docs_df().select("doc_id", "turn_idx", "text").collect()
    toks = {r["doc_id"]: set(tokenize_text(r["text"])) for r in rows}
    bg_ids = {r["doc_id"] for r in rows if r["turn_idx"] % 2 == 0}
    qt = set(tokenize_text(q))
    fg_ids = {d for d, ts in toks.items() if ts & qt}
    fg_size, bg_size = float(len(fg_ids)), float(len(bg_ids))
    fgc, bgc = {}, {}
    for d, ts in toks.items():
        for t in ts:
            if d in fg_ids:
                fgc[t] = fgc.get(t, 0) + 1
            if d in bg_ids:
                bgc[t] = bgc.get(t, 0) + 1
    scored = []
    for t, fn in fgc.items():
        bn = bgc.get(t)
        if bn is None:
            continue
        fp, bp = fn / fg_size, bn / bg_size
        if fp > bp:
            scored.append((round((fp - bp) * (fp / bp), 6), t, fn, bn))
    want = [
        (t, fn, bn, s)
        for s, t, fn, bn in sorted(scored, key=lambda x: (-x[0], x[1]))[:10]
    ]
    got = [
        (r["term"], r["fg_n"], r["bg_n"], r["score_r"])
        for r in idx.significant_terms(
            q, size=10, background_where="turn_idx % 2 = 0"
        ).collect()
    ]
    assert got == want and got != plain


def test_terms_agg_order_by_subagg(spark, built_index):
    """order_by ranks buckets by the reported (rounded) metric instead of
    doc count; ascending flips; unknown metric names are refused."""
    import pytest

    idx, _ = built_index
    base = idx.terms_agg(Q, "role", "turn_idx", ("avg", "max")).collect()
    by_avg = idx.terms_agg(Q, "role", "turn_idx", ("avg", "max"), order_by="avg").collect()
    assert {tuple(r) for r in by_avg} == {tuple(r) for r in base}  # same buckets
    keys = [r["avg_v"] for r in by_avg]
    assert keys == sorted(keys, reverse=True)
    asc = idx.terms_agg(Q, "role", "turn_idx", ("avg",), order_by="avg", ascending=True).collect()
    assert [r["avg_v"] for r in asc] == sorted(r["avg_v"] for r in asc)
    with pytest.raises(ValueError, match="order_by"):
        idx.terms_agg(Q, "role", "turn_idx", ("avg",), order_by="sum").collect()


def test_geo_shape_indexed_local_twin_identity(spark, tmp_path):
    """The zero-job indexed-shape twin returns bit-identical (doc_id,
    score) pairs to the distributed path over a persisted warehouse."""
    from pyspark.sql import functions as F

    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    offs = [(0.0, 2.0), (2.0, 0.5), (1.25, -1.75), (-1.25, -1.75), (-2.0, 0.5)]
    rows = []
    for i in range(40):
        clon, clat = -20.0 + (i % 8) * 2.5, -9.0 + (i // 8) * 2.25
        rows.append(
            (f"c{i:010d}", 0, f"alpha beta{i % 3}",
             [(clon + dx, clat + dy) for dx, dy in offs])
        )
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, text string, "
        "shape array<struct<lon:double,lat:double>>",
    )
    wh = str(tmp_path / "shapewh")
    build_index(spark, df, wh, docs_per_shard=8, n_buckets=4)
    idx = Index(spark, wh)
    ring = [(f"shape[{j}].lon", f"shape[{j}].lat") for j in range(5)]
    pt = (-12.3, -3.4)
    dist = [
        (r["doc_id"], r["score"])
        for r in idx.search_geo_shape_indexed(
            "alpha", 50, ring_sql=ring, point=pt
        ).collect()
    ]
    loc = idx.search_geo_shape_indexed_local("alpha", 50, point=pt)
    assert loc == dist and loc

    dis = idx.search_geo_shape_indexed_local("alpha", 50, point=pt, relation="disjoint")
    dd = [
        (r["doc_id"], r["score"])
        for r in idx.search_geo_shape_indexed(
            "alpha", 50, ring_sql=ring, point=pt, relation="disjoint"
        ).collect()
    ]
    assert dis == dd and dis
