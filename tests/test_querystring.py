"""query_string DSL: parsing, and execution equivalence against the
explicitly-composed search / search_phrase calls it routes to."""

from __future__ import annotations

from kafka_elasticsearch_standalone_consumer_spark.query.querystring import (
    parse_query_string,
)


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def test_parse_components():
    p = parse_query_string('w00000 +w00001 -w00002 lang:en "w00003 w00004"~2 a AND b')
    assert p.should == ["w00000", "a", "b"] or "w00000" in p.should
    assert "w00001" in p.must
    assert p.must_not == ["w00002"]
    assert p.filters == [("lang", "en")]
    assert p.phrases == [("w00003 w00004", 2)]
    # AND promotes both operands to must
    assert "a" in p.must and "b" in p.must


def test_bare_terms_equal_search(spark, built_index):
    idx, _ = built_index
    assert _rows(idx.query_string("w00000 w00003", 10)) == _rows(
        idx.search("w00000 w00003", 10)
    )


def test_must_not_excludes_and_keeps_scores(spark, built_index):
    idx, _ = built_index
    base = dict(_rows(idx.search("w00000 w00003", 200)))
    got = _rows(idx.query_string("w00000 w00003 -w00001", 10))
    assert got
    texts = {
        r["doc_id"]: r["text"]
        for r in idx.fetch(idx.query_string("w00000 w00003 -w00001", 10)).collect()
    }
    for doc_id, score in got:
        assert "w00001" not in texts[doc_id].lower().split()
        assert base[doc_id] == score  # survivors keep global-stats scores


def test_must_requires_term(spark, built_index):
    idx, _ = built_index
    got = idx.fetch(idx.query_string("w00003 +w00000", 10)).collect()
    assert got
    for r in got:
        assert "w00000" in r["text"].lower().split()


def test_field_filter_routes_to_where(spark, built_index):
    idx, _ = built_index
    assert _rows(idx.query_string("w00000 w00003 role:user", 10)) == _rows(
        idx.search("w00000 w00003", 10, where="role = 'user'")
    )


def test_quoted_phrase_routes_to_search_phrase(spark, transcripts, tmp_path):
    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    path = str(tmp_path / "qs")
    build_index(spark, transcripts, path, docs_per_shard=256, n_buckets=8, positions=True)
    idx = Index(spark, path)
    toks = tokenize_text(transcripts.first()["text"])
    phrase = " ".join(toks[2:4])
    assert _rows(idx.query_string(f'"{phrase}"', 10)) == _rows(idx.search_phrase(phrase, 10))
    assert _rows(idx.query_string(f'"{phrase}"~1', 10)) == _rows(
        idx.search_phrase(phrase, 10, slop=1)
    )


def test_mixed_terms_and_phrase_sum_scores(spark, transcripts, tmp_path):
    """ES bool should composition: a query mixing terms and a phrase sums
    the clauses' scores per doc over the UNION of matching docs."""
    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    path = str(tmp_path / "mixed")
    build_index(spark, transcripts, path, docs_per_shard=256, n_buckets=8, positions=True)
    idx = Index(spark, path)
    toks = tokenize_text(transcripts.first()["text"])
    phrase = " ".join(toks[2:4])
    q = f'w00000 "{phrase}"'
    got = dict(_rows(idx.query_string(q, 10000)))
    t_scores = {r["doc_id"]: r["score"] for r in idx.search_oracle("w00000", k=None).collect()}
    p_scores = {r["doc_id"]: r["score"] for r in idx.search_phrase_oracle(phrase, k=None).collect()}
    want = {
        d: round(t_scores.get(d, 0.0) + p_scores.get(d, 0.0), 9)
        for d in set(t_scores) | set(p_scores)
    }
    assert got == want and got
    # union semantics: docs matching ONLY the phrase clause still appear
    only_phrase = set(p_scores) - set(t_scores)
    if only_phrase:
        assert only_phrase <= set(got)


def test_search_bool_structured_equals_dsl(spark, transcripts, tmp_path):
    """The structured bool API and the query_string DSL are two views of
    the same executor: equivalent inputs give identical results, across
    the pure-term, pure-phrase, and mixed paths."""
    from kafka_elasticsearch_standalone_consumer_spark.analysis import tokenize_text
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    path = str(tmp_path / "boolidx")
    build_index(spark, transcripts, path, docs_per_shard=256, n_buckets=8, positions=True)
    idx = Index(spark, path)
    toks = tokenize_text(transcripts.first()["text"])
    phrase = " ".join(toks[2:4])

    pairs = [
        (
            idx.search_bool(should=["w00000 w00003"], k=50),
            idx.query_string("w00000 w00003", 50),
        ),
        (
            idx.search_bool(phrases=[(phrase, 0)], k=50),
            idx.query_string(f'"{phrase}"', 50),
        ),
        (
            idx.search_bool(
                should=["w00000"],
                must=["w00003"],
                must_not=["w00250"],
                phrases=[(phrase, 0)],
                k=50,
            ),
            idx.query_string(f'w00000 +w00003 -w00250 "{phrase}"', 50),
        ),
        (
            idx.search_bool(should=["w00000"], filters=[("role", "user")], k=50),
            idx.query_string("w00000 role:user", 50),
        ),
    ]
    for got_df, want_df in pairs:
        assert _rows(got_df) == _rows(want_df)
        assert _rows(got_df)


def test_validate_query_explain(spark, built_index):
    """_validate/query: the clause rewrite matches the parser, invalid
    (clause-free) input reports valid=false, and a valid explanation's
    query actually executes."""
    idx, _ = built_index
    r = idx.validate_query("+w00000 -w00001 role:user \"w00000 w00003\"~1").collect()[0]
    assert r["valid"]
    assert r["explanation"] == (
        '+text:w00000 -text:w00001 text:"w00000 w00003"~1 #role:user'
    )
    bad = idx.validate_query("??? !!!").collect()[0]
    assert not bad["valid"] and bad["explanation"] is None
    # a validated query runs
    assert idx.query_string("+w00000 -w00001 role:user", 5).count() >= 0


def test_query_string_uses_index_analyzer_for_must(spark, transcripts, tmp_path):
    """ADVICE r2: on a stop-analyzer index, '+the' must analyze to nothing
    (ES drops the stopword at query analysis) instead of compiling into a
    filter requiring a literal stopword — so '+the w00000' ≡ 'w00000'."""
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    path = str(tmp_path / "qs_stop_idx")
    build_index(
        spark, transcripts, path, docs_per_shard=256, n_buckets=8, analyzer="stop"
    )
    idx = Index(spark, path)
    with_stop = [(r["doc_id"], round(r["score"], 9)) for r in idx.query_string("+the w00000", 10).collect()]
    plain = [(r["doc_id"], round(r["score"], 9)) for r in idx.query_string("w00000", 10).collect()]
    assert with_stop == plain and plain


def test_parse_range_exists_missing():
    from kafka_elasticsearch_standalone_consumer_spark.query.querystring import (
        compile_field_filter,
    )

    p = parse_query_string(
        "hash n_chars:[100 TO 300] ts:{2026-01-01 TO *} _exists_:tool _missing_:lang"
    )
    assert p.ranges == [
        ("n_chars", "100", "300", True, True),
        ("ts", "2026-01-01", None, False, False),
    ]
    assert p.exists == ["tool"] and p.missing == ["lang"]
    assert p.should == ["hash"]
    sql = compile_field_filter(p)
    assert "n_chars >= 100" in sql and "n_chars <= 300" in sql
    assert "ts > '2026-01-01'" in sql          # exclusive bound, quoted string
    assert "tool IS NOT NULL" in sql and "lang IS NULL" in sql


def test_range_and_exists_execute_like_where(spark, built_index):
    idx, _ = built_index
    got = _rows(idx.query_string("w00000 w00003 turn_idx:[1 TO 3] _exists_:tool", 10))
    want = _rows(
        idx.search(
            "w00000 w00003", 10,
            where="turn_idx >= 1 AND turn_idx <= 3 AND tool IS NOT NULL",
        )
    )
    assert got == want and got
    # _missing_ is the complement filter
    got_m = _rows(idx.query_string("w00000 w00003 _missing_:tool", 10))
    want_m = _rows(idx.search("w00000 w00003", 10, where="tool IS NULL"))
    assert got_m == want_m and got_m
    # survivors keep their unfiltered scores (corpus stats stay global)
    base = dict(_rows(idx.search("w00000 w00003", 500)))
    assert all(base[d] == s for d, s in got)


def test_validate_query_renders_range_and_exists(spark, built_index):
    idx, _ = built_index
    row = idx.validate_query("hash n_chars:[100 TO *} _exists_:tool").collect()[0]
    assert row["valid"]
    assert "#n_chars:[100 TO *}" in row["explanation"]
    assert "#_exists_:tool" in row["explanation"]


def test_parse_min_should_match_full_spec():
    """The ES minimum_should_match spec table, including the asymmetric
    percentage rounding and conditional combinations."""
    import pytest

    from kafka_elasticsearch_standalone_consumer_spark.query.querystring import (
        parse_min_should_match as msm,
    )

    assert msm(3, 5) == 3
    assert msm("3", 5) == 3
    assert msm("-2", 5) == 3
    assert msm("75%", 5) == 3          # floor(3.75)
    assert msm("-25%", 9) == 7         # floor(2.25)=2 may be missing
    assert msm("100%", 4) == 4
    assert msm("3<90%", 3) == 3        # n not > 3 → all required
    assert msm("3<90%", 10) == 9
    assert msm("2<-25% 9<3", 11) == 3  # largest I below n wins
    assert msm("2<-25% 9<3", 6) == 5   # 2 wins: floor(25%·6)=1 missing
    assert msm("2<-25% 9<3", 2) == 2   # none applicable → all
    assert msm("0", 4) == 1            # no constraint collapses to 1
    assert msm("-100%", 4) == 1        # everything may be missing
    assert msm("200%", 3) == 6         # NOT clamped: matches nothing
    with pytest.raises(ValueError):
        msm("90% 2<3", 5)              # plain value in a multi-part spec
    with pytest.raises(ValueError):
        msm("  ", 5)


def test_search_accepts_msm_spec_strings(spark, built_index):
    """String specs resolve against the distinct analyzed term count and
    rank-match the equivalent integer msm on every path."""
    idx, _ = built_index
    q = "w00000 w00003 w00412"
    want = [tuple(r) for r in idx.search(q, 10, min_should_match=2).collect()]
    got = [tuple(r) for r in idx.search(q, 10, min_should_match="1<-34%").collect()]
    assert got == want and got
    got_o = [
        (r["doc_id"], round(r["score"], 9))
        for r in idx.search_oracle(q, 10, min_should_match="67%").collect()
    ]
    want_o = [
        (r["doc_id"], round(r["score"], 9))
        for r in idx.search_oracle(q, 10, min_should_match=2).collect()
    ]
    assert got_o == want_o and got_o
    assert (
        idx.count(q, min_should_match="67%").collect()[0]["total"]
        == idx.count(q, min_should_match=2).collect()[0]["total"]
    )


def test_query_string_term_boost(spark, built_index):
    """term^boost: the boosted term's idf weight multiplies; scores equal
    the hand-weighted oracle sum, and boost changes the ranking exactly
    like a duplicated query term of the same total weight."""
    idx, _ = built_index
    q2 = idx.query_string("w00000^2 w00003", 20).collect()
    dup = idx.search("w00000 w00000 w00003", 20).collect()  # weight 2 via multiplicity
    assert [(r["doc_id"], r["score"]) for r in q2] == [
        (r["doc_id"], r["score"]) for r in dup
    ]
    # fractional boost parses; boost + bare occurrence sum (1.5 + 1 = 2.5)
    b25 = idx.query_string("w00000^1.5 w00000 w00003", 20).collect()
    assert b25
    base = {r["doc_id"]: r["score"] for r in idx.search("w00003", 200).collect()}
    # must/filter compose with boost
    comp = idx.query_string("w00000^2 w00003 -w00412", 20).collect()
    assert comp and all(r["score"] > 0 for r in comp)
    import pytest

    with pytest.raises(ValueError, match="term\\^boost"):
        idx.query_string('w00000^2 "w00003 w00004"', 5)


def test_query_string_fuzzy_clause(spark, built_index):
    """term~n: constant 1.0 for docs with a dictionary term within the
    edit budget, summed bool-should style with scored clauses; bare ~
    defaults to one edit."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import (
        _damerau_levenshtein,
    )

    idx, _ = built_index
    got = {r["doc_id"]: r["score"] for r in idx.query_string("w00000 w0041x~1", 5000).collect()}
    base = {r["doc_id"]: r["score"] for r in idx.search("w00000", 5000).collect()}
    # recompute the expansion with the same rule
    cand = idx._expand_prefix("w", 1 << 20, length_band=(5, 7))
    near = sorted(
        t for t in cand
        if abs(len(t) - 6) <= 1 and _damerau_levenshtein("w0041x", t, 1) <= 1
    )[:50]
    fuzzy_docs = {r["doc_id"] for r in idx._match_set(near, 1).collect()}
    assert fuzzy_docs  # the clause actually matched something
    for d, s in got.items():
        want = base.get(d, 0.0) + (1.0 if d in fuzzy_docs else 0.0)
        assert abs(s - want) < 1e-9, d
    assert set(got) == set(base) | fuzzy_docs
    # bare ~ defaults to one edit
    bare = {r["doc_id"]: r["score"] for r in idx.query_string("w00000 w0041x~", 5000).collect()}
    assert bare == got
