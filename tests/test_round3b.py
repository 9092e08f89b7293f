"""Round-3b surfaces: post_filter / named queries / min_score /
script_fields / search templates / boost_mode enum / ip_range agg /
Gopher repetition features.

Each checked against a pure-Python recomputation (the test_aggs.py
pattern) or a hand-computed micro-corpus."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.query.querystring import render_template

Q = "w00000 w00003"


def _oracle_scores(idx, q, where=None):
    return {
        r["doc_id"]: r["score"] for r in idx.search_oracle(q, None, where=where).collect()
    }


# ------------------------------------------------------------- min_score --


def test_min_score_drops_below_threshold(spark, built_index):
    idx, _ = built_index
    full = idx.search(Q, 10, mode="bmw").collect()
    assert len(full) == 10
    cut = full[4]["score"]  # keep ranks 1-5 (ties at the cut stay in)
    got = idx.search(Q, 10, mode="bmw", min_score=cut).collect()
    want = [(r["doc_id"], r["score"]) for r in full if r["score"] >= cut]
    assert [(r["doc_id"], r["score"]) for r in got] == want
    assert all(r["score"] >= cut for r in got) and 0 < len(got) < 10


# ----------------------------------------------------------- post_filter --


def test_post_filter_page_and_prefilter_total(spark, built_index):
    idx, _ = built_index
    scores = _oracle_scores(idx, Q)
    roles = {r["doc_id"]: r["role"] for r in idx._docs_df().collect()}
    out = idx.search_post_filter(Q, "role = 'user'", 5).collect()
    want = sorted(
        ((d, s) for d, s in scores.items() if roles[d] == "user"),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [(r["doc_id"], r["score"]) for r in out] == [
        (d, pytest.approx(s)) for d, s in want
    ]
    # the total is the UNFILTERED match count — post_filter's defining trait
    assert all(r["total_prefilter"] == len(scores) for r in out)
    assert len(scores) > len([1 for d in scores if roles[d] == "user"])


# --------------------------------------------------------- named queries --


def test_search_named_matches_clause_composition(spark, built_index):
    idx, _ = built_index
    clauses = {"first": "w00000", "third": "w00003 w00007"}
    per = {name: _oracle_scores(idx, q) for name, q in clauses.items()}
    want: dict[int, tuple[float, str]] = {}
    for name in sorted(per):
        for d, s in per[name].items():
            old_s, old_m = want.get(d, (0.0, ""))
            want[d] = (old_s + s, f"{old_m},{name}".lstrip(","))
    top = sorted(want.items(), key=lambda t: (-t[1][0], t[0]))[:10]
    got = idx.search_named(clauses, 10).collect()
    assert [(r["doc_id"], r["matched_queries"]) for r in got] == [
        (d, m) for d, (_, m) in top
    ]
    for r, (_, (s, _)) in zip(got, top):
        assert r["score"] == pytest.approx(s)
    # at least one hit must have matched both clauses for this to mean much
    assert any("," in r["matched_queries"] for r in got)


def test_search_named_respects_where(spark, built_index):
    idx, _ = built_index
    got = idx.search_named({"a": Q}, 10, where="role = 'user'").collect()
    roles = {r["doc_id"]: r["role"] for r in idx._docs_df().collect()}
    assert got and all(roles[r["doc_id"]] == "user" for r in got)


# --------------------------------------------------------- script_fields --


def test_script_fields_computes_expressions(spark, built_index):
    idx, _ = built_index
    hits = idx.search(Q, 5, mode="bmw")
    out = idx.script_fields(hits, {"ti2": "turn_idx * 2", "r_up": "upper(role)"})
    rows = {r["doc_id"]: r for r in out.collect()}
    docs = {r["doc_id"]: r for r in idx._docs_df().collect()}
    assert set(rows) == {r["doc_id"] for r in hits.collect()}
    for d, r in rows.items():
        assert r["ti2"] == docs[d]["turn_idx"] * 2
        assert r["r_up"] == docs[d]["role"].upper()
        assert r["score"] is not None  # hit columns ride along


# ------------------------------------------------------- search template --


def test_render_template():
    assert render_template("{{a}} AND {{ b }}", {"a": "x", "b": "y"}) == "x AND y"
    assert render_template("no params", {"unused": 1}) == "no params"
    assert render_template("n:[{{lo}} TO {{hi}}]", {"lo": 1, "hi": 9}) == "n:[1 TO 9]"
    with pytest.raises(KeyError):
        render_template("{{missing}}", {})


def test_search_template_equals_rendered_query_string(spark, built_index):
    idx, _ = built_index
    got = idx.search_template(
        "{{t1}} role:{{r}}", {"t1": "w00003", "r": "user"}, 10
    ).collect()
    want = idx.query_string("w00003 role:user", 10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
    assert got


# ------------------------------------------------------------ boost_mode --


def test_function_score_boost_modes(spark, built_index):
    idx, _ = built_index
    scores = _oracle_scores(idx, Q)
    tidx = {r["doc_id"]: r["turn_idx"] for r in idx._docs_df().collect()}

    def fv(d):
        return float(tidx[d]) * 0.1  # modifier=none, factor=0.1, missing never hit

    combine = {
        "multiply": lambda s, f: s * f,
        "sum": lambda s, f: s + f,
        "min": min,
        "max": max,
        "avg": lambda s, f: (s + f) / 2.0,
        "replace": lambda s, f: f,
    }
    for mode, fn in combine.items():
        got = idx.function_score(Q, "turn_idx", 10, factor=0.1, boost_mode=mode).collect()
        want = sorted(
            ((d, fn(s, fv(d))) for d, s in scores.items()), key=lambda t: (-t[1], t[0])
        )[:10]
        assert [r["doc_id"] for r in got] == [d for d, _ in want], mode
        for r, (_, s) in zip(got, want):
            assert r["score"] == pytest.approx(s), mode
    with pytest.raises(ValueError):
        idx.function_score(Q, "turn_idx", 10, boost_mode="bogus")


def test_function_score_multi_score_modes(spark, built_index):
    """Every score_mode against a pure-Python recomputation, including
    the filtered-function and no-function-matches (factor=1.0) paths."""
    idx, _ = built_index
    scores = _oracle_scores(idx, Q)
    docs = {r["doc_id"]: r for r in idx._docs_df().collect()}
    fns = [
        {"script_score": "turn_idx * 0.1", "filter": "role = 'user'", "weight": 2.0},
        {"linear": {"field": "turn_idx", "origin": 5.0, "scale": 4.0}},
        {"weight": 0.25, "filter": "role = 'tool'"},
    ]

    def vals(d):
        out = []
        r = docs[d]
        out.append(2.0 * r["turn_idx"] * 0.1 if r["role"] == "user" else None)
        s = 4.0 / 0.5
        out.append(max(0.0, (s - abs(r["turn_idx"] - 5.0)) / s))
        out.append(0.25 if r["role"] == "tool" else None)
        return [v for v in out if v is not None]

    import math

    combine = {
        "sum": sum,
        "avg": lambda v: sum(v) / len(v),
        "max": max,
        "min": min,
        "first": lambda v: v[0],
        "multiply": math.prod,
    }
    for mode, fn in combine.items():
        got = idx.function_score_multi(Q, fns, 10, score_mode=mode).collect()
        want = sorted(
            (
                (d, s * (fn(vals(d)) if vals(d) else 1.0))
                for d, s in scores.items()
            ),
            key=lambda t: (-t[1], t[0]),
        )[:10]
        assert [r["doc_id"] for r in got] == [d for d, _ in want], mode
        for r, (_, s) in zip(got, want):
            assert r["score"] == pytest.approx(s), mode
    # boost_mode threads through (replace: score = the combined factor)
    rep = idx.function_score_multi(Q, fns, 10, boost_mode="replace").collect()
    for r in rep:
        v = vals(r["doc_id"])
        assert r["score"] == pytest.approx(sum(v) if v else 1.0)
    with pytest.raises(ValueError):
        idx.function_score_multi(Q, fns, 10, score_mode="bogus")
    with pytest.raises(ValueError):
        idx.function_score_multi(Q, [], 10)


# ---------------------------------------------------------- ip_range agg --


def test_ip_range_counts_buckets_order_and_nulls(spark):
    from kafka_elasticsearch_standalone_consumer_spark.query.aggs import ip_range_counts

    df = spark.createDataFrame(
        [
            ("10.0.0.1",),
            ("10.0.63.255",),
            ("10.0.64.0",),  # boundary: belongs to the middle bucket
            ("10.0.100.7",),
            ("10.0.192.0",),  # boundary: belongs to the top bucket
            ("10.0.255.9",),
            (None,),
            ("not-an-ip",),  # non-parseable: excluded, not top-bucketed
        ],
        "ip string",
    )
    got = [(r["range_label"], r["n"]) for r in
           ip_range_counts(df, "ip", ["10.0.64.0", "10.0.192.0"]).collect()]
    assert got == [
        ("*-10.0.64.0", 2),
        ("10.0.64.0-10.0.192.0", 2),
        ("10.0.192.0-*", 2),
    ]


# --------------------------------------------------------- indices query --


@pytest.fixture(scope="module")
def parity_indexes(spark, transcripts):
    from kafka_elasticsearch_standalone_consumer_spark.ids import assign_dense_ids
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    docs = assign_dense_ids(transcripts).select("doc_id", "text", "role")
    even = Index.ephemeral(docs.filter("doc_id % 2 = 0"), docs_per_shard=256, n_buckets=8)
    odd = Index.ephemeral(docs.filter("doc_id % 2 = 1"), docs_per_shard=256, n_buckets=8)
    return even, odd


def test_indices_query_modes(spark, parity_indexes):
    from kafka_elasticsearch_standalone_consumer_spark.query.multisearch import MultiIndex

    even, odd = parity_indexes
    mi = MultiIndex([even, odd])
    q, nmq = "w00000 w00003", "w00007"

    def merged(parts):
        rows = [(i, d, s) for i, part in parts for d, s in part.items()]
        return sorted(rows, key=lambda t: (-t[2], t[0], t[1]))[:10]

    # text no_match_query: other index scored with ITS stats on nmq
    got = mi.indices_query([0], q, no_match_query=nmq, k=10).collect()
    want = merged([(0, _oracle_scores(even, q)), (1, _oracle_scores(odd, nmq))])
    assert [(r["idx"], r["doc_id"]) for r in got] == [(i, d) for i, d, _ in want]
    for r, (_, _, s) in zip(got, want):
        assert r["score"] == pytest.approx(s)

    # "none": the other index contributes nothing
    got_none = mi.indices_query([0], q, no_match_query="none", k=10).collect()
    assert got_none and all(r["idx"] == 0 for r in got_none)

    # "all" (ES default): other index's docs all match at constant 1.0
    got_all = mi.indices_query([0], q, no_match_query="all", k=10_000).collect()
    odd_rows = [r for r in got_all if r["idx"] == 1]
    assert len(odd_rows) == odd.meta["n_docs"]
    assert all(r["score"] == 1.0 for r in odd_rows)


# ------------------------------------------------------- _source filter --


def test_fetch_source_includes_excludes(spark, built_index):
    idx, _ = built_index
    hits = idx.search(Q, 3, mode="bmw")
    assert set(idx.fetch(hits, includes=["t*"]).columns) == {
        "doc_id", "score", "turn_idx", "text", "tool", "ts"
    }
    assert set(idx.fetch(hits, excludes=["text", "t*"]).columns) == {
        "doc_id", "score", "conv_id", "role"
    }
    got = idx.fetch(hits, includes=["role", "conv_*"], excludes=["conv_id"])
    assert set(got.columns) == {"doc_id", "score", "role"}
    assert got.count() == 3


# ----------------------------------------------- simple_query_string -----


def test_parse_simple_query_string():
    from kafka_elasticsearch_standalone_consumer_spark.query.querystring import (
        parse_simple_query_string as p,
    )

    q = p('alpha | beta -gamma "a b"~2 tab*')
    assert q.should == ["alpha", "beta"] and q.must == []
    assert q.must_not == ["gamma"]
    assert q.phrases == [("a b", 2)] and q.prefixes == ["tab"]
    q2 = p("alpha + beta")
    assert q2.must == ["alpha", "beta"] and q2.should == []
    assert p("alpha beta", default_operator="and").must == ["alpha", "beta"]
    assert p("alpha beta").should == ["alpha", "beta"]
    # lenient: never raises — parens stripped, lone operators ignored
    assert p("(alpha) |").should == ["alpha"]
    assert p("").should == []
    # '-' on a starred token negates its terms leniently
    assert p("-tab* x").must_not == ["tab"]


def test_simple_query_string_execution(spark, built_index):
    idx, _ = built_index
    # pure OR == plain search
    want = [(r["doc_id"], r["score"]) for r in idx.search(Q, 10, mode="bmw").collect()]
    got = [
        (r["doc_id"], r["score"])
        for r in idx.simple_query_string(Q.replace(" ", " | "), 10).collect()
    ]
    assert got == want and got
    # '+' == conjunctive bool must
    want_and = [
        (r["doc_id"], r["score"])
        for r in idx.search_bool(must=["w00000 w00003"], k=10).collect()
    ]
    got_and = [
        (r["doc_id"], r["score"])
        for r in idx.simple_query_string("w00000 + w00003", 10).collect()
    ]
    assert got_and == want_and and got_and
    # negation excludes
    toks = {r["doc_id"]: set() for r in idx._docs_df().collect()}
    for r in idx._docs_df().collect():
        from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text

        toks[r["doc_id"]] = set(tokenize_text(r["text"]))
    got_not = idx.simple_query_string("w00000 -w00003", 10_000).collect()
    assert got_not and all("w00003" not in toks[r["doc_id"]] for r in got_not)
    # prefix clause: +1.0 constant for matching docs, summed with BM25
    scores = _oracle_scores(idx, "w00000")
    pref_docs = {d for d, ts in toks.items() if any(t.startswith("w0001") for t in ts)}
    want_p: dict[int, float] = {}
    for d, s in scores.items():
        want_p[d] = s
    for d in pref_docs:
        want_p[d] = want_p.get(d, 0.0) + 1.0
    top = sorted(want_p.items(), key=lambda t: (-t[1], t[0]))[:10]
    got_p = idx.simple_query_string("w00000 w0001*", 10).collect()
    assert [r["doc_id"] for r in got_p] == [d for d, _ in top]
    for r, (_, s) in zip(got_p, top):
        assert r["score"] == pytest.approx(s)
    # conjunctive + prefix: the prefix clause RESTRICTS too
    got_cp = idx.simple_query_string("w00000 + w0001*", 10_000).collect()
    assert got_cp and all(r["doc_id"] in pref_docs for r in got_cp)


# ----------------------------------------------- termvectors / MLT text --


def test_term_vectors_positions_match_token_stream(spark, built_index):
    idx, _ = built_index
    doc = idx._docs_df().filter(F.col("doc_id") == 7).select("text").first()
    stream = {}  # term -> positions from the index's own analysis chain
    slots, offsets = idx._analyze_phrase(doc["text"])
    for t, p in zip(slots, offsets):
        stream.setdefault(t, []).append(p)
    rows = idx.term_vectors(7, positions=True).collect()
    assert rows and [r["term"] for r in rows] == sorted(r["term"] for r in rows)
    for r in rows:
        assert r["positions"] == sorted(stream[r["term"]])
        assert r["tf"] == len(r["positions"])  # standard analyzer: tf == #positions
    # the plain surface is unchanged (no positions column)
    assert "positions" not in idx.term_vectors(7).columns


def test_more_like_this_text_matches_selection(spark, built_index):
    import math
    from collections import Counter

    idx, _ = built_index
    like = "w00000 w00003 w00000 zzneverseen"
    tf = Counter(idx._analyze(like))
    n = float(idx.meta["n_docs"])
    dfs = {t: df for t, df, _b in idx._lookup_terms_arrow(sorted(tf))}
    sel = sorted(
        (t for t in tf if t in dfs),
        key=lambda t: (-tf[t] * math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)), t),
    )[:2]
    want = [(r["doc_id"], r["score"]) for r in idx.search(" ".join(sel), 10).collect()]
    got = [(r["doc_id"], r["score"]) for r in idx.more_like_this_text(like, 10, max_query_terms=2).collect()]
    assert got == want and got
    assert idx.more_like_this_text("zzneverseen", 10).count() == 0


# ------------------------------------------------------ plan assertions --


def _plan(df, mode="formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_named_queries_single_scan_and_broadcast(spark, built_index):
    """N named clauses must cost ONE tokens pass (the clause map rides a
    broadcast join), not one scan per clause."""
    idx, _ = built_index
    plan = _plan(idx.search_named({"a": "w00000 w00412", "b": "w00007"}, 10))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the fused tokenizer pass appears once, not once per clause
    assert plan.count("FlatMapsInPandas") + plan.count("MapInPandas") <= 1
    assert "Window" not in plan


def test_repetition_features_plan_no_udf_no_window(spark, built_index):
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        repetition_features,
    )

    idx, _ = built_index
    plan = _plan(repetition_features(idx._docs_df()))
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert "Window" not in plan
    assert "partial_max" in plan or "partial_count" in plan  # map-side combine


# ----------------------------------------------------------- repetition --


def test_repetition_features_hand_computed(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        repetition_features,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),           # top2 'a b'x3 -> 1.0; dup5: 2 distinct of 2
            (2, "x y z w v"),             # all grams unique
            (3, "c c c c c c c c c c"),   # self-overlap: capped at 1.0
            (4, "p q r s t p q r s t p q r s t"),  # 11 5-grams, 5 distinct
            (5, ""),                      # empty doc -> all zeros
            (6, "one"),                   # shorter than every n
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_features(docs).collect()}
    assert got[1]["n_tokens"] == 6
    assert got[1]["top2_frac"] == 1.0          # 3*2/6
    assert got[1]["top3_frac"] == 1.0          # 'a b a'x2 -> 2*3/6
    assert got[1]["dup5_frac"] == 0.0          # 'a b a b a','b a b a b' distinct
    assert got[2]["top2_frac"] == pytest.approx(0.4)   # 1*2/5
    assert got[2]["top3_frac"] == pytest.approx(0.6)   # 1*3/5
    assert got[2]["dup5_frac"] == 0.0
    assert got[3]["top2_frac"] == 1.0          # capped (9*2/10 would exceed 1)
    assert got[3]["dup5_frac"] == pytest.approx(5 / 6)  # 6 occurrences, 1 distinct
    assert got[4]["dup5_frac"] == pytest.approx(6 / 11)
    assert got[5]["n_tokens"] == 0
    assert (got[5]["top2_frac"], got[5]["top3_frac"], got[5]["dup5_frac"]) == (0, 0, 0)
    assert (got[6]["top2_frac"], got[6]["top3_frac"], got[6]["dup5_frac"]) == (0, 0, 0)


def test_repetition_features_flags_loops_over_prose(spark, transcripts):
    from kafka_elasticsearch_standalone_consumer_spark.ops.textstats import (
        repetition_features,
    )

    docs = transcripts.select(
        F.monotonically_increasing_id().alias("doc_id"), "text"
    ).limit(50)
    loop = spark.createDataFrame(
        [(10_000, "the same line " * 40)], "doc_id long, text string"
    )
    feats = repetition_features(docs.unionByName(loop)).collect()
    by_id = {r["doc_id"]: r for r in feats}
    corpus_max = max(r["dup5_frac"] for r in feats if r["doc_id"] != 10_000)
    assert by_id[10_000]["dup5_frac"] > 0.9 > corpus_max
