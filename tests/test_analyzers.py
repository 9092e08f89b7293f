"""The ES ``stop`` analyzer: tokenization parity across all three
implementations, Lucene-style field norms (dl counts surviving tokens)
and position increments (gaps preserved), query/index analysis symmetry
on every query surface, and analyzer persistence through build → append
→ compact."""

from __future__ import annotations

import pytest

from kafka_elasticsearch_standalone_consumer_spark.analysis import (
    STOP_WORDS,
    doc_term_freqs,
    tokenize_col,
    tokenize_text,
    tokens_from,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick movement of the enemy"),
    (2, "quick the fox"),          # gap INSIDE the phrase
    (3, "brown fox quick fox"),
    (4, "the of and to in"),       # all stopwords → empty after analysis
    (5, "quick brown fox"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_tokenizers_rank_identical_with_stop(spark, docs_df):
    """fused ≡ sql ≡ pandas token streams under analyzer='stop'."""
    base = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in tokens_from(docs_df, method="sql", analyzer="stop").collect()
    }
    for method in ("pandas", "fused"):
        got = {
            (r["doc_id"], r["term"]): r["tf"]
            for r in tokens_from(docs_df, method=method, analyzer="stop").collect()
        }
        assert got == base, method
    assert base and all(t not in STOP_WORDS for _, t in base)
    # python tokenizer agrees too
    py = {}
    for d, text in DOCS:
        for t in tokenize_text(text, "stop"):
            py[(d, t)] = py.get((d, t), 0) + 1
    assert py == base


def test_stop_dl_and_positions_are_lucene_style(spark, docs_df):
    """dl counts surviving tokens only; positions keep ORIGINAL offsets
    (increments preserved across removed stopwords)."""
    rows = doc_term_freqs(docs_df, positions=True, analyzer="stop").collect()
    by = {(r["doc_id"], r["term"]): r for r in rows}
    # doc 0: "the quick brown fox jumps over the lazy dog" → 7 kept
    assert by[(0, "quick")]["dl"] == 7
    assert list(by[(0, "quick")]["positions"]) == [1]  # original offset
    assert list(by[(0, "dog")]["positions"]) == [8]
    # doc 2: "quick the fox" → quick@0, fox@2 (gap preserved)
    assert list(by[(2, "fox")]["positions"]) == [2]
    assert by[(2, "fox")]["dl"] == 2
    # doc 4 is all stopwords → no rows at all
    assert not any(d == 4 for d, _ in by)


def test_stop_index_query_surfaces(spark, docs_df):
    """End-to-end on a stop-analyzer index: queries carrying stopwords
    analyze them away (search ≡ oracle, msm counts analyzed terms), and
    _analyze/_count surfaces agree."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    idx = Index.ephemeral(docs_df, docs_per_shard=4, n_buckets=4, analyzer="stop")
    assert idx.meta["analyzer"] == "stop"
    a = [(r["doc_id"], round(r["score"], 9)) for r in idx.search("the quick fox", 10).collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in idx.search_oracle("the quick fox", 10).collect()]
    c = [(r["doc_id"], round(r["score"], 9)) for r in idx.search("quick fox", 10).collect()]
    assert a == b == c and a
    # msm counts ANALYZED terms: "the quick fox" has 2 effective terms
    m = idx.search("the quick fox", 10, min_should_match=2).collect()
    assert {r["doc_id"] for r in m} == {0, 2, 3, 5}  # docs with quick AND fox
    # intersect mode agrees
    i = idx.search("the quick fox", 10, mode="intersect").collect()
    assert {r["doc_id"] for r in i} == {0, 2, 3, 5}
    # _analyze shows the gap
    an = idx.analyze("quick the fox").collect()
    assert [(r["position"], r["token"]) for r in an] == [(0, "quick"), (2, "fox")]
    # count over analyzed scope
    assert idx.count_matches("the of quick").collect()[0]["n"] == 5  # docs w/ quick? 0,1,2,3,5
    # percolate analyzes registered queries the same way
    p = idx.percolate([(1, "the quick")], operator="and").collect()
    assert {r["doc_id"] for r in p} == {0, 1, 2, 3, 5}


def test_stop_index_phrase_gaps(spark, docs_df):
    """match_phrase with Lucene position increments: stopwords inside the
    phrase become gaps that must be respected, fast path ≡ oracle."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    idx = Index.ephemeral(
        docs_df, docs_per_shard=4, n_buckets=4, positions=True, analyzer="stop"
    )

    def both(phrase, slop=0):
        f = [(r["doc_id"], round(r["score"], 9)) for r in idx.search_phrase(phrase, 10, slop=slop).collect()]
        o = [(r["doc_id"], round(r["score"], 9)) for r in idx.search_phrase_oracle(phrase, 10, slop=slop).collect()]
        assert f == o, phrase
        return [d for d, _ in f]

    # adjacent phrase
    assert set(both("quick brown")) == {0, 5}
    # phrase WITH a stopword: "quick the fox" → quick@0, fox@2 — the gap
    # matches ANY filler token (Lucene position increments), so every
    # "quick ? fox" doc qualifies: 0 (quick brown fox…), 2, 5
    assert set(both("quick the fox")) == {0, 2, 5}
    # "the quick brown fox" → offsets [1,2,3] relative → docs 0, 5
    assert set(both("the quick brown fox")) == {0, 5}
    # slop bridges the gap: "quick fox" slop=1 also matches doc 2's gap
    assert set(both("quick fox", slop=1)) >= {2, 5}


def test_analyzer_survives_append_and_compact(spark, docs_df, tmp_path):
    """meta['analyzer'] threads through segment append and compaction —
    a compacted stop index stays query-identical."""
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.builder import build_index
    from kafka_elasticsearch_standalone_consumer_spark.pipeline.incremental import (
        append_segment,
        compact,
    )
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    wh = str(tmp_path / "stopidx")
    base = docs_df.filter("doc_id <= 3").select("text")
    base = base.withColumn("conv_id", base["text"].substr(1, 4)).withColumn(
        "turn_idx", (base["text"].substr(1, 1) == "x").cast("int")
    )
    build_index(spark, base, wh, docs_per_shard=4, n_buckets=4, analyzer="stop")
    more = docs_df.filter("doc_id > 3").select("text")
    more = more.withColumn("conv_id", more["text"].substr(1, 4)).withColumn(
        "turn_idx", (more["text"].substr(1, 1) == "x").cast("int")
    )
    assert append_segment(spark, more, wh, idempotency_key="b1") is not None
    before = [(r["doc_id"], round(r["score"], 9)) for r in Index(spark, wh).search("the quick fox", 10).collect()]
    assert before
    compact(spark, wh)
    idx2 = Index(spark, wh)
    assert idx2.meta["analyzer"] == "stop"
    after = [(r["doc_id"], round(r["score"], 9)) for r in idx2.search("the quick fox", 10).collect()]
    assert {d for d, _ in after} == {d for d, _ in before}


def test_unknown_analyzer_rejected(spark, docs_df):
    with pytest.raises(ValueError, match="analyzer"):
        tokenize_text("x", "snowball_klingon")
    with pytest.raises(ValueError, match="analyzer"):
        tokens_from(docs_df, analyzer="nope").collect()


# -- Porter analyzer --------------------------------------------------------

PDOCS = [
    (0, "merging tables quickly while values agreed"),
    (1, "the merge of a table with another table value"),
    (2, "queries against keyed columns"),
    (3, "nothing relevant here at all"),
    (4, "hopping hoped hopeful hopefulness"),  # shared stem family
]


@pytest.fixture(scope="module")
def pdocs_df(spark):
    return spark.createDataFrame(PDOCS, "doc_id long, text string")


def test_porter_stem_full_algorithm_vectors():
    """Full-algorithm (all steps chained) outputs for the classic Porter
    examples — the published 1980 algorithm, longest-suffix-wins."""
    from kafka_elasticsearch_standalone_consumer_spark.analysis import porter_stem

    vec = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss", "failing": "fail",
        "filing": "file", "denied": "deni", "mules": "mule", "happy": "happi",
        "sky": "sky", "electricity": "electr", "controlling": "control",
        "generalization": "gener", "oscillators": "oscil", "rational": "ration",
        "roll": "roll", "rate": "rate", "cease": "ceas", "relational": "relat",
        "conditional": "condit", "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "replacement": "replac", "triplicate": "triplic",
        "formative": "form", "communism": "commun", "effective": "effect",
        "hopefulness": "hope", "goodness": "good", "allowance": "allow",
        "inference": "infer", "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "meetings": "meet", "feudalism": "feudal",
        "enjoy": "enjoi", "a": "a",
    }
    for w, want in vec.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_tokenizers_identical_with_porter(spark, pdocs_df):
    """fused ≡ sql ≡ pandas token streams under analyzer='porter'."""
    want = sorted(
        (r["doc_id"], r["term"], r["tf"])
        for r in tokens_from(pdocs_df, method="sql", analyzer="porter").collect()
    )
    for method in ("fused", "pandas"):
        got = sorted(
            (r["doc_id"], r["term"], r["tf"])
            for r in tokens_from(pdocs_df, method=method, analyzer="porter").collect()
        )
        assert got == want, method
    # driver-side symmetry
    assert tokenize_text("merging tables values", "porter") == ["merg", "tabl", "valu"]


def test_porter_merges_surface_forms_and_keeps_dl(spark, pdocs_df):
    """Two surface forms sharing a stem merge into one (doc, term) row
    with summed tf and unioned ascending positions; dl counts ALL tokens
    (stemming is 1:1, unlike the stop filter)."""
    rows = {
        (r["doc_id"], r["term"]): r
        for r in doc_term_freqs(pdocs_df, positions=True, analyzer="porter").collect()
    }
    # doc 1: 'table' twice → tabl tf=2; dl = all 9 tokens (stemming is 1:1)
    r = rows[(1, "tabl")]
    assert r["tf"] == 2 and r["dl"] == 9
    assert r["positions"] == sorted(r["positions"])
    # doc 4: hopping→hop, hoped→hope, hopeful→hope, hopefulness→hope
    assert rows[(4, "hope")]["tf"] == 3 and rows[(4, "hop")]["tf"] == 1
    assert rows[(4, "hope")]["positions"] == [1, 2, 3]


def test_porter_index_query_surfaces(spark, pdocs_df):
    """End-to-end on a porter index: a morphologically different query
    matches ('merging tables' finds 'merge...table'), bmw ≡ exact ≡
    oracle, phrase matching works on stems, and query_string must/
    must_not clauses are analyzer-consistent."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    idx = Index.ephemeral(
        pdocs_df, docs_per_shard=4, n_buckets=4, positions=True, analyzer="porter"
    )
    assert idx.meta["analyzer"] == "porter"
    got = {}
    for mode in ("bmw", "exact"):
        got[mode] = [
            (r["doc_id"], round(r["score"], 9))
            for r in idx.search("merging tables", 10, mode=mode).collect()
        ]
    oracle = [
        (r["doc_id"], round(r["score"], 9))
        for r in idx.search_oracle("merging tables", 10).collect()
    ]
    assert got["bmw"] == got["exact"] == oracle
    assert {d for d, _ in oracle} == {0, 1}  # both docs match via stems
    # phrase: "merging tables" → slots (merg, tabl): doc 0 adjacency only
    ph = idx.search_phrase("merging tables", 10).collect()
    assert [r["doc_id"] for r in ph] == [0]
    ph_o = idx.search_phrase_oracle("merging tables", 10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in ph] == [
        (r["doc_id"], round(r["score"], 9)) for r in ph_o
    ]
    # query_string: +value must match doc 0 (values) and doc 1 (value)
    qs = idx.query_string("+value merge", 10).collect()
    assert {r["doc_id"] for r in qs} == {0, 1}
    # must_not excludes by stem family too
    qs2 = idx.query_string("merge -queried", 10).collect()
    assert {r["doc_id"] for r in qs2} <= {0, 1, 4}


# -- whitespace + keyword analyzers -----------------------------------------

WDOCS = [
    (0, "Quick Brown-Fox  jumps"),
    (1, "quick brown-fox JUMPS"),
    (2, "Quick\tBrown-Fox"),
    (3, ""),                      # empty → no tokens under either analyzer
    (4, "Quick"),
]


@pytest.fixture(scope="module")
def wdocs_df(spark):
    return spark.createDataFrame(WDOCS, "doc_id long, text string")


@pytest.mark.parametrize("analyzer", ["whitespace", "keyword"])
def test_tokenizers_identical_case_preserving(spark, wdocs_df, analyzer):
    """fused ≡ sql ≡ pandas ≡ python token streams for the two
    case-preserving analyzers."""
    base = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in tokens_from(wdocs_df, method="sql", analyzer=analyzer).collect()
    }
    for method in ("pandas", "fused"):
        got = {
            (r["doc_id"], r["term"]): r["tf"]
            for r in tokens_from(wdocs_df, method=method, analyzer=analyzer).collect()
        }
        assert got == base, method
    py = {}
    for d, text in WDOCS:
        for t in tokenize_text(text, analyzer):
            py[(d, t)] = py.get((d, t), 0) + 1
    assert py == base and base


def test_whitespace_semantics(spark, wdocs_df):
    rows = doc_term_freqs(wdocs_df, analyzer="whitespace").collect()
    by = {(r["doc_id"], r["term"]): r for r in rows}
    # case preserved, hyphenated token NOT split, tab is a separator
    assert ("Quick" in {t for _, t in by} and "Brown-Fox" in {t for _, t in by})
    assert (0, "quick") not in by and (1, "quick") in by
    assert by[(2, "Brown-Fox")]["dl"] == 2
    assert not any(d == 3 for d, _ in by)  # empty doc → no rows


def test_keyword_semantics(spark, wdocs_df):
    rows = doc_term_freqs(wdocs_df, positions=True, analyzer="keyword").collect()
    by = {r["doc_id"]: r for r in rows}
    assert set(by) == {0, 1, 2, 4}
    for d, text in WDOCS:
        if text:
            assert by[d]["term"] == text           # verbatim whole field
            assert by[d]["tf"] == 1 and by[d]["dl"] == 1
            assert list(by[d]["positions"]) == [0]


def test_whitespace_index_end_to_end(spark, wdocs_df):
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    idx = Index.ephemeral(wdocs_df, docs_per_shard=4, n_buckets=4, analyzer="whitespace")
    assert idx.meta["analyzer"] == "whitespace"
    up = [r["doc_id"] for r in idx.search("Quick", 10).collect()]
    lo = [r["doc_id"] for r in idx.search("quick", 10).collect()]
    assert set(up) == {0, 2, 4} and set(lo) == {1}  # case-sensitive terms
    bmw = [
        (r["doc_id"], round(r["score"], 9))
        for r in idx.search("Quick Brown-Fox", 10, mode="bmw").collect()
    ]
    oracle = [
        (r["doc_id"], round(r["score"], 9))
        for r in idx.search_oracle("Quick Brown-Fox", 10).collect()
    ]
    assert bmw == oracle and bmw


def test_keyword_index_end_to_end(spark, wdocs_df):
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    idx = Index.ephemeral(wdocs_df, docs_per_shard=4, n_buckets=4, analyzer="keyword")
    hit = [r["doc_id"] for r in idx.search("Quick Brown-Fox  jumps", 10).collect()]
    assert hit == [0]  # exact field match only
    assert idx.search("Quick Brown-Fox", 10).collect() == [] or [
        r["doc_id"] for r in idx.search("Quick Brown-Fox", 10).collect()
    ] == []  # a prefix of the field is a DIFFERENT keyword term
    assert [r["doc_id"] for r in idx.search("Quick", 10).collect()] == [4]


# -- english analyzer (stop filter THEN Porter stemming) --------------------


def test_tokenizers_identical_with_english(spark, pdocs_df):
    base = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in tokens_from(pdocs_df, method="sql", analyzer="english").collect()
    }
    for method in ("pandas", "fused"):
        got = {
            (r["doc_id"], r["term"]): r["tf"]
            for r in tokens_from(pdocs_df, method=method, analyzer="english").collect()
        }
        assert got == base, method
    py = {}
    for r in pdocs_df.collect():
        for t in tokenize_text(r["text"], "english"):
            py[(r["doc_id"], t)] = py.get((r["doc_id"], t), 0) + 1
    assert py == base and base
    assert all(t not in STOP_WORDS for _, t in base)
    assert ("merg" in {t for _, t in base}) and ("the" not in {t for _, t in base})


def test_english_index_end_to_end(spark, pdocs_df):
    """Stop + stem composed: morphological match AND stopword-robust
    queries; dl counts post-stop survivors; phrase gaps span stopwords
    with stemmed slots."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    idx = Index.ephemeral(
        pdocs_df, docs_per_shard=4, n_buckets=4, positions=True, analyzer="english"
    )
    assert idx.meta["analyzer"] == "english"
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in idx.search("the merging tables", 10).collect()
    ]
    oracle = [
        (r["doc_id"], round(r["score"], 9))
        for r in idx.search_oracle("the merging tables", 10).collect()
    ]
    assert got == oracle and {d for d, _ in got} == {0, 1}
    # doc 1 "the merge of a table...": english dl drops the stopwords
    rows = doc_term_freqs(pdocs_df, analyzer="english").collect()
    d1 = [r for r in rows if r["doc_id"] == 1]
    assert d1 and d1[0]["dl"] == 5  # merge table another table value kept (the/of/a/with stopped)
    # phrase across a stop gap with stemmed slots: "merge of a table"
    # → (merg@0, tabl@3); doc 1 has merg@1, tabl@4
    ph = idx.search_phrase("merge of a table", 10).collect()
    assert [r["doc_id"] for r in ph] == [1]
    ph_o = idx.search_phrase_oracle("merge of a table", 10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in ph] == [
        (r["doc_id"], round(r["score"], 9)) for r in ph_o
    ]


def test_whitespace_phrase_offsets_own_token_stream(spark):
    """_analyze_phrase offsets must come from the INDEX analyzer's own
    token stream: a pure-punctuation phrase has ZERO standard tokens but
    two whitespace tokens (regression: offsets=[] crashed the kernel)."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    df = spark.createDataFrame(
        [(0, "--- !!! end"), (1, "!!! --- end")], "doc_id long, text string"
    )
    idx = Index.ephemeral(df, docs_per_shard=4, n_buckets=4, positions=True,
                          analyzer="whitespace")
    assert [r["doc_id"] for r in idx.search_phrase("--- !!!", 10).collect()] == [0]


def test_analyze_api_analyzer_override(spark, wdocs_df):
    """ES _analyze?analyzer= — introspect any chain regardless of the
    index's own analyzer, with position increments preserved."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    idx = Index.ephemeral(wdocs_df, docs_per_shard=4, n_buckets=4, analyzer="whitespace")
    # index chain: case-preserving whitespace tokens
    own = [(r["position"], r["token"]) for r in idx.analyze("Quick the Fox").collect()]
    assert own == [(0, "Quick"), (1, "the"), (2, "Fox")]
    # override: stop chain drops 'the' and leaves the gap
    stop = [(r["position"], r["token"]) for r in idx.analyze("Quick the Fox", analyzer="stop").collect()]
    assert stop == [(0, "quick"), (2, "fox")]
    # override: english stems with gaps
    eng = [(r["position"], r["token"]) for r in idx.analyze("the merging of tables", analyzer="english").collect()]
    assert eng == [(1, "merg"), (3, "tabl")]


SDOCS = [
    (0, "Hello2World build 42 rc1"),   # digit-fused + pure-digit tokens
    (1, "hello world build rc"),
    (2, "123 456"),                    # only digits → no tokens under simple
    (3, ""),
    (4, "v2 engine v3 engine"),
]


@pytest.fixture(scope="module")
def sdocs_df(spark):
    return spark.createDataFrame(SDOCS, "doc_id long, text string")


def test_tokenizers_identical_with_simple(spark, sdocs_df):
    """fused ≡ sql ≡ pandas ≡ python token streams for the simple
    (letter-runs + lowercase) analyzer."""
    base = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in tokens_from(sdocs_df, method="sql", analyzer="simple").collect()
    }
    for method in ("pandas", "fused"):
        got = {
            (r["doc_id"], r["term"]): r["tf"]
            for r in tokens_from(sdocs_df, method=method, analyzer="simple").collect()
        }
        assert got == base, method
    py = {}
    for d, text in SDOCS:
        for t in tokenize_text(text, "simple"):
            py[(d, t)] = py.get((d, t), 0) + 1
    assert py == base and base


def test_simple_semantics(spark, sdocs_df):
    rows = doc_term_freqs(sdocs_df, analyzer="simple").collect()
    by = {(r["doc_id"], r["term"]): r for r in rows}
    # digit-fused forms split into letter runs, lowercased
    assert (0, "hello") in by and (0, "world") in by
    assert (0, "rc") in by and (0, "hello2world") not in by
    # pure-digit tokens vanish entirely — and dl counts only survivors
    assert not any(d == 2 for d, _ in by)
    assert by[(0, "hello")]["dl"] == 4  # hello world build rc (42 dropped)
    # standard keeps them — the distinguishing probe
    std = {(r["doc_id"], r["term"]) for r in doc_term_freqs(sdocs_df).collect()}
    assert (0, "hello2world") in std and (2, "123") in std


def test_simple_index_end_to_end(spark, sdocs_df):
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    idx = Index.ephemeral(sdocs_df, docs_per_shard=4, n_buckets=4, analyzer="simple")
    assert idx.meta["analyzer"] == "simple"
    # a digit-fused QUERY term analyzes to its letter runs and matches
    hits = {r["doc_id"] for r in idx.search("Hello2World", 10).collect()}
    assert hits == {0, 1}
    # pure-digit query → no terms → no hits
    assert idx.search("42 123", 10).count() == 0
    # oracle path agrees (rank identity through the shared analyzer)
    bmw = [(r["doc_id"], round(r["score"], 10)) for r in idx.search("hello world", 10).collect()]
    orc = [(r["doc_id"], round(r["score"], 10)) for r in idx.search_oracle("hello world", 10).collect()]
    assert bmw == orc and bmw


# ---- pattern analyzer (ES 1.x: lowercase + configurable regex SPLIT) ----

PDOCS_PAT = [
    (0, "Tool_Call ran 3.14 times"),     # underscore-fused + dotted number
    (1, "tool_call failed once"),
    (2, "tool call succeeded"),          # the split probe vs doc 0/1
    (3, ""),
    (4, "csv,line;a_b|c"),               # punctuation-only separators
]


@pytest.fixture(scope="module")
def patdocs_df(spark):
    return spark.createDataFrame(PDOCS_PAT, "doc_id long, text string")


def test_tokenizers_identical_with_pattern(spark, patdocs_df):
    """fused ≡ sql ≡ pandas ≡ python token streams for the pattern
    analyzer (default \\W+ split), and for a custom split regex."""
    for an in ("pattern", "pattern:[^a-z0-9]+"):
        base = {
            (r["doc_id"], r["term"]): r["tf"]
            for r in tokens_from(patdocs_df, method="sql", analyzer=an).collect()
        }
        for method in ("pandas", "fused"):
            got = {
                (r["doc_id"], r["term"]): r["tf"]
                for r in tokens_from(patdocs_df, method=method, analyzer=an).collect()
            }
            assert got == base, (an, method)
        py = {}
        for d, text in PDOCS_PAT:
            for t in tokenize_text(text, an):
                py[(d, t)] = py.get((d, t), 0) + 1
        assert py == base and base


def test_pattern_semantics(spark, patdocs_df):
    rows = doc_term_freqs(patdocs_df, analyzer="pattern").collect()
    by = {(r["doc_id"], r["term"]): r for r in rows}
    # \W keeps underscores: tool_call survives whole; standard splits it
    assert (0, "tool_call") in by and (1, "tool_call") in by
    assert (2, "tool") in by and (2, "tool_call") not in by
    # the dotted number splits on '.', each run kept
    assert (0, "3") in by and (0, "14") in by
    assert by[(0, "tool_call")]["dl"] == 5
    std = {(r["doc_id"], r["term"]) for r in doc_term_freqs(patdocs_df).collect()}
    assert (0, "tool_call") not in std and (0, "tool") in std
    # custom split regex: underscores become separators again
    cus = {
        (r["doc_id"], r["term"])
        for r in doc_term_freqs(patdocs_df, analyzer="pattern:[^a-z0-9]+").collect()
    }
    assert (0, "tool") in cus and (0, "tool_call") not in cus


def test_pattern_index_end_to_end(spark, patdocs_df):
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    idx = Index.ephemeral(patdocs_df, docs_per_shard=4, n_buckets=4, analyzer="pattern")
    assert idx.meta["analyzer"] == "pattern"
    # the underscore-fused QUERY term stays whole and matches only docs 0/1
    hits = {r["doc_id"] for r in idx.search("Tool_Call", 10).collect()}
    assert hits == {0, 1}
    # oracle path agrees (rank identity through the shared analyzer)
    bmw = [(r["doc_id"], round(r["score"], 10)) for r in idx.search("tool_call ran", 10).collect()]
    orc = [(r["doc_id"], round(r["score"], 10)) for r in idx.search_oracle("tool_call ran", 10).collect()]
    assert bmw == orc and bmw


# ---- html_strip char filter (composed prefix "html_strip|<analyzer>") ----

HDOCS = [
    (0, '<p>alpha beta</p><div class="block">&lt;critical&gt;</div>'),
    (1, "alpha <br> gamma"),
    (2, "&amp;lt; literal"),          # &amp;lt; -> "&lt;" text, NOT re-stripped
    (3, "<only><tags></tags></only>"),
    (4, None),
]


@pytest.fixture(scope="module")
def hdocs_df(spark):
    return spark.createDataFrame(HDOCS, "doc_id long, text string")


def test_tokenizers_identical_with_html_strip(spark, hdocs_df):
    """fused ≡ sql ≡ pandas ≡ python token streams for the html_strip
    char filter composed over standard AND over stop."""
    for an in ("html_strip|standard", "html_strip|stop"):
        base = {
            (r["doc_id"], r["term"]): r["tf"]
            for r in tokens_from(hdocs_df, method="sql", analyzer=an).collect()
        }
        for method in ("pandas", "fused"):
            got = {
                (r["doc_id"], r["term"]): r["tf"]
                for r in tokens_from(hdocs_df, method=method, analyzer=an).collect()
            }
            assert got == base, (an, method)
        py = {}
        for d, text in HDOCS:
            for t in tokenize_text(text, an):
                py[(d, t)] = py.get((d, t), 0) + 1
        assert py == base and base


def test_html_strip_semantics(spark, hdocs_df):
    from kafka_elasticsearch_standalone_consumer_spark.analysis import strip_html

    rows = doc_term_freqs(hdocs_df, analyzer="html_strip|standard").collect()
    by = {(r["doc_id"], r["term"]) for r in rows}
    # tags stripped: div/class/block/p never become tokens
    assert not any(t in ("div", "class", "block", "p", "br") for _d, t in by)
    # entities decode AFTER the strip: &lt;critical&gt; -> <critical> -> token
    assert (0, "critical") in by and (0, "lt") not in by
    # one-pass rule: &amp;lt; -> the literal text "&lt;" (tokens lt + literal),
    # NOT double-decoded into a tag
    assert (2, "lt") in by and (2, "literal") in by
    # tag-only and NULL docs vanish
    assert not any(d in (3, 4) for d, _t in by)
    # tags separate tokens (replaced by a space, never fused)
    assert (1, "alpha") in by and (1, "gamma") in by
    # unfiltered standard keeps the markup tokens — the distinguishing probe
    std = {(r["doc_id"], r["term"]) for r in doc_term_freqs(hdocs_df).collect()}
    assert (0, "div") in std and (0, "lt") in std
    # driver twin agrees on the raw string
    assert strip_html("<p>a</p>&amp;") == " a &"


def test_html_strip_index_end_to_end(spark, hdocs_df):
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    idx = Index.ephemeral(
        hdocs_df, docs_per_shard=4, n_buckets=4, analyzer="html_strip|standard"
    )
    assert idx.meta["analyzer"] == "html_strip|standard"
    hits = {r["doc_id"] for r in idx.search("critical", 10).collect()}
    assert hits == {0}
    assert idx.search("div class", 10).count() == 0
    bmw = [(r["doc_id"], round(r["score"], 10)) for r in idx.search("alpha critical", 10).collect()]
    orc = [(r["doc_id"], round(r["score"], 10)) for r in idx.search_oracle("alpha critical", 10).collect()]
    assert bmw == orc and bmw


def test_snowball_alias_equals_english(spark, pdocs_df):
    """ES snowball analyzer == the english chain here (stop filter THEN
    stemming): identical token streams and identical end-to-end ranking;
    highlight still takes the stem-prefix branch through the alias."""
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    sn = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in doc_term_freqs(pdocs_df, analyzer="snowball").collect()
    }
    en = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in doc_term_freqs(pdocs_df, analyzer="english").collect()
    }
    assert sn == en and sn
    assert tokenize_text("the merging of tables", "snowball") == ["merg", "tabl"]

    idx = Index.ephemeral(pdocs_df, docs_per_shard=4, n_buckets=4, analyzer="snowball")
    assert idx.meta["analyzer"] == "snowball"
    bmw = [(r["doc_id"], round(r["score"], 10)) for r in idx.search("merging tables", 10).collect()]
    orc = [(r["doc_id"], round(r["score"], 10)) for r in idx.search_oracle("merging tables", 10).collect()]
    assert bmw == orc and bmw


def test_custom_stopwords_analyzer(spark):
    """ES 1.x configurable stopwords via the 'stop:<csv>' string knob:
    the custom list filters instead of the fixed Lucene set, dl counts
    survivors, positions keep their gaps, and the four tokenizer paths
    agree; empty custom lists are rejected."""
    from kafka_elasticsearch_standalone_consumer_spark.analysis import (
        analyze_positions,
    )
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    an = "stop:foo,bar"
    rows = [(0, "foo alpha bar beta the foo"), (1, "the bar gamma")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    base = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in tokens_from(df, method="sql", analyzer=an).collect()
    }
    for method in ("pandas", "fused"):
        got = {
            (r["doc_id"], r["term"]): r["tf"]
            for r in tokens_from(df, method=method, analyzer=an).collect()
        }
        assert got == base, method
    py = {}
    for d, text in rows:
        for t in tokenize_text(text, an):
            py[(d, t)] = py.get((d, t), 0) + 1
    assert py == base
    # custom words filtered, fixed-set words ('the') KEPT
    assert (0, "foo") not in base and (0, "the") in base and (1, "the") in base
    # position gaps follow the custom list
    assert analyze_positions("foo alpha bar beta", an) == (["alpha", "beta"], [1, 3])
    # dl counts survivors only
    dls = {r["doc_id"]: r["dl"] for r in doc_term_freqs(df, analyzer=an).collect()}
    assert dls[0] == 3 and dls[1] == 2

    idx = Index.ephemeral(df, docs_per_shard=4, n_buckets=4, analyzer=an)
    assert idx.meta["analyzer"] == an
    # a stopped query term analyzes away; the surviving term still matches
    hits = {r["doc_id"] for r in idx.search("foo alpha", 10).collect()}
    assert hits == {0}
    bmw = [(r["doc_id"], round(r["score"], 10)) for r in idx.search("the gamma", 10).collect()]
    orc = [(r["doc_id"], round(r["score"], 10)) for r in idx.search_oracle("the gamma", 10).collect()]
    assert bmw == orc and bmw

    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        tokenize_text("x", "stop:")


def test_pattern_rejects_capturing_groups_and_empty(spark):
    """Capturing groups would make Python re.split keep delimiters while
    Java/RE2 split drops them — rejected loudly; bare 'pattern:' is a
    typo, not a silent default; non-capturing groups stay legal."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="capturing"):
        tokenize_text("a b", "pattern:([^a-z]+)")
    with _pytest.raises(ValueError, match="non-empty"):
        tokenize_text("a b", "pattern:")
    # non-capturing and escaped parens are fine, and all paths agree
    assert tokenize_text("a(b)c d", r"pattern:(?:[^a-z]+)") == ["a", "b", "c", "d"]
    assert tokenize_text("a(b", r"pattern:\(") == ["a", "b"]
