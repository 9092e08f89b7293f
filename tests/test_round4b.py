"""Round-4b surfaces: passage-level dedup, _mtermvectors, scan+scroll.

Reference parity targets: ES 1.x `_mtermvectors` and the scan search
type's `_scroll` cursor sit behind the same delegated client boundary as
the rest of the DSL (ref: MessageHandler.java:135-139); dedup_passages is
the C4/RefinedWeb passage-dedup curation step.
"""

from __future__ import annotations

import pytest

SF001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sf_docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet")


@pytest.fixture(scope="module")
def sf_idx(spark, sf_docs):
    from kafka_elasticsearch_standalone_consumer_spark.query.engine import Index

    return Index.ephemeral(
        sf_docs.select("doc_id", "text", "lang", "n_chars"),
        docs_per_shard=128,
        n_buckets=8,
    )


# ------------------------------------------------------------ dedup_passages


def test_dedup_passages_keep_first(spark):
    """Crafted corpus: the repeated passage survives only at its first
    (doc, position); unique passages all survive; reconstruction joins
    surviving passages in original order."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import dedup_passages

    dup = "a b c"  # one 3-token window
    df = spark.createDataFrame(
        [
            (0, f"{dup} x y z"),           # windows: 'a b c', 'x y z'
            (1, f"p q r {dup}"),           # 'p q r' kept, dup dropped
            (2, f"{dup} {dup}"),           # both windows are the dup
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_passages(df, chunk=3).collect()}
    assert out[0]["n_passages"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["text_dedup"] == "a b c x y z"
    assert out[1]["n_passages"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["text_dedup"] == "p q r"
    assert out[2]["n_passages"] == 2 and out[2]["n_kept"] == 0
    assert out[2]["text_dedup"] == ""


def test_dedup_passages_tail_window_and_invariants(sf_docs):
    """Real corpus: n_kept <= n_passages everywhere, total kept ==
    number of distinct passages, and the tail (shorter) window is
    included — token counts reconcile exactly."""
    from pyspark.sql import functions as F

    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import dedup_passages

    out = dedup_passages(sf_docs, chunk=12).persist()
    rows = out.collect()
    assert all(r["n_kept"] <= r["n_passages"] for r in rows)
    n_distinct = (
        sf_docs.select(
            F.posexplode(
                F.expr(
                    "transform(sequence(0, int(ceil(size(split(text,' '))/12.0)) - 1),"
                    " i -> array_join(slice(split(text,' '), i*12+1, 12), ' '))"
                )
            )
        )
        .select("col")
        .distinct()
        .count()
    )
    assert sum(r["n_kept"] for r in rows) == n_distinct
    # window count = ceil(tokens/12) per doc
    exp = {
        r["doc_id"]: -(-r["n"] // 12)
        for r in sf_docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    assert all(exp[r["doc_id"]] == r["n_passages"] for r in rows)
    out.unpersist()


def test_dedup_passages_delimiter_mode(spark):
    """Paragraph mode: split on blank lines, rejoin with the caller's
    separator, empties dropped."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.dedup import dedup_passages

    df = spark.createDataFrame(
        [(0, "alpha beta\n\ngamma"), (1, "gamma\n\n\n\ndelta")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_passages(df, delimiter=r"\n\n+", join_sep="\n\n").collect()
    }
    assert out[0]["text_dedup"] == "alpha beta\n\ngamma"
    assert out[1]["n_passages"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["text_dedup"] == "delta"


# -------------------------------------------------------------- mtermvectors


def test_mterm_vectors_matches_per_doc(sf_idx):
    """_mtermvectors == union of per-doc _termvectors, doc_id/term asc."""
    ids = [1, 3, 7]
    batch = [
        (r["doc_id"], r["term"], r["tf"], r["df"])
        for r in sf_idx.mterm_vectors(ids).collect()
    ]
    single = []
    for d in ids:
        single += [
            (d, r["term"], r["tf"], r["df"]) for r in sf_idx.term_vectors(d).collect()
        ]
    assert batch == sorted(single)
    assert batch == sorted(batch)


def test_mterm_vectors_positions(sf_idx):
    """positions=True carries the same positions as the per-doc API."""
    ids = [1, 3]
    batch = {
        (r["doc_id"], r["term"]): list(r["positions"])
        for r in sf_idx.mterm_vectors(ids, positions=True).collect()
    }
    for d in ids:
        for r in sf_idx.term_vectors(d, positions=True).collect():
            assert batch[(d, r["term"])] == list(r["positions"])


def test_mterm_vectors_empty(sf_idx):
    assert sf_idx.mterm_vectors([]).count() == 0


# --------------------------------------------------------------- scan_scroll


def test_scan_scroll_pages_partition_scan(sf_idx):
    """Keyset pages are disjoint, doc_id-ascending, and their union is
    exactly scan_all's match set."""
    q, msm, size = "join hash filter", 2, 7
    full = sorted(
        r["doc_id"] for r in sf_idx.scan_all(q, min_should_match=msm).collect()
    )
    pages, after = [], None
    while True:
        page = [
            r["doc_id"]
            for r in sf_idx.scan_scroll(q, size, after_doc_id=after, min_should_match=msm)
            .select("doc_id")
            .collect()
        ]
        if not page:
            break
        assert page == sorted(page)
        assert len(page) <= size
        pages += page
        after = page[-1]
        assert len(pages) <= len(full) + size  # no runaway cursor
    assert pages == full


def test_scan_scroll_where_and_empty(sf_idx):
    out = sf_idx.scan_scroll("join hash filter", 5, where="lang = 'en'")
    rows = out.collect()
    assert all(r["lang"] == "en" for r in rows)
    assert sf_idx.scan_scroll("zzznope", 5).count() == 0


# ------------------------------------------------------------- chunk_windows


def test_chunk_windows_coverage_and_overlap(spark):
    """Every token covered, consecutive chunks share exactly `overlap`
    tokens, short docs give one chunk, empty docs none."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import chunk_windows

    toks = [f"t{i}" for i in range(23)]
    df = spark.createDataFrame(
        [(0, " ".join(toks)), (1, "a b c"), (2, "")],
        "doc_id long, text string",
    )
    out = chunk_windows(df, max_len=10, overlap=3)
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in out.collect()
    )
    d0 = [r for r in rows if r[0] == 0]
    # stride 7: chunks at 0..9, 7..16, 14..22 → ceil((23-10)/7)+1 = 3
    assert [r[1] for r in d0] == [0, 1, 2]
    assert d0[0][2].split(" ") == toks[0:10]
    assert d0[1][2].split(" ") == toks[7:17]
    assert d0[2][2].split(" ") == toks[14:23]
    assert d0[2][3] == 9  # tail chunk shorter
    covered = set()
    for _, _, txt, _ in d0:
        covered |= set(txt.split(" "))
    assert covered == set(toks)
    d1 = [r for r in rows if r[0] == 1]
    assert len(d1) == 1 and d1[0][2] == "a b c" and d1[0][3] == 3
    assert not [r for r in rows if r[0] == 2]


def test_chunk_windows_rejects_bad_overlap(spark):
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import chunk_windows

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_windows(df, max_len=4, overlap=4)


# ------------------------------------------------------- terms lookup filter


def test_terms_lookup_matches_explicit_terms(sf_idx, sf_docs):
    """The lookup form must equal search_terms called with the looked-up
    values (ES defines it as sugar for exactly that)."""
    row = sf_docs.filter("doc_id = 7").collect()[0]
    vals = []
    for v in row["text"].split()[:5]:
        if v not in vals:
            vals.append(v)
    want = [(r["doc_id"], r["score"]) for r in sf_idx.search_terms(vals, 10).collect()]
    got = [
        (r["doc_id"], r["score"])
        for r in sf_idx.search_terms_lookup(7, 10, max_terms=5).collect()
    ]
    assert got == want and got  # non-empty: doc 7 matches itself


def test_terms_lookup_missing_doc_is_empty(sf_idx):
    assert sf_idx.search_terms_lookup(10**9, 10).count() == 0


def test_terms_lookup_respects_where(sf_idx):
    all_hits = sf_idx.search_terms_lookup(7, 1000, max_terms=5).collect()
    filtered = sf_idx.search_terms_lookup(
        7, 1000, max_terms=5, where="n_chars >= 200"
    ).collect()
    assert 0 < len(filtered) < len(all_hits)


# ------------------------------------------------------------ domain_mix


def test_domain_mix_proportions_and_determinism(sf_docs):
    """The output mixture must hit the target proportions exactly in
    expectation-free terms: the binding domain keeps EVERYTHING (rate
    1.0), each kept set is a subset of its domain, and the keep decision
    is a pure function of (doc_id, seed) — rerun-identical."""
    from pyspark.sql import functions as F

    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import domain_mix

    targets = {"en": 0.5, "zh": 0.3, "de": 0.2}
    out = domain_mix(sf_docs, "lang", targets, seed=42)
    rows = out.select("doc_id", "lang").collect()
    got = {}
    for r in rows:
        got.setdefault(r["lang"], set()).add(r["doc_id"])
    assert set(got) <= set(targets)  # es/fr dropped
    counts = {
        r["lang"]: r["c"]
        for r in sf_docs.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    # binding domain = argmin(c_d / t_d) keeps everything
    binding = min(targets, key=lambda d: counts[d] / targets[d])
    full = {
        r["doc_id"] for r in sf_docs.filter(F.col("lang") == binding).collect()
    }
    assert got[binding] == full
    # each domain's kept count is within integer rounding of t_d * T
    total = counts[binding] / targets[binding]
    for d, t in targets.items():
        # the hash is uniform but finite — allow a generous band
        assert abs(len(got.get(d, set())) - t * total) <= 0.25 * t * total, d
    # determinism: a second run returns the identical set
    again = {(r["doc_id"], r["lang"]) for r in domain_mix(
        sf_docs, "lang", targets, seed=42).select("doc_id", "lang").collect()}
    assert again == {(r["doc_id"], r["lang"]) for r in rows}
    # different seed -> different sample (overwhelmingly)
    other = {(r["doc_id"], r["lang"]) for r in domain_mix(
        sf_docs, "lang", targets, seed=43).select("doc_id", "lang").collect()}
    assert other != again


def test_domain_mix_missing_domain_empty(sf_docs):
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import domain_mix

    out = domain_mix(sf_docs, "lang", {"en": 0.5, "xx": 0.5}, seed=42)
    # a demanded-but-absent domain binds at T=0: nothing survives
    assert out.count() == 0


# ------------------------------------------------------------ normalize_unicode


def test_normalize_unicode_nfc(spark):
    import unicodedata

    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import (
        normalize_unicode,
    )

    rows = [
        (0, "plain ascii"),
        (1, "café"),            # e + combining acute -> é
        (2, "cafȩ́ mix"),  # stacked combining marks
        (3, "é already nfc"),    # precomposed stays put
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text_nfc"], r["changed"])
           for r in normalize_unicode(df).collect()}
    for d, t in rows:
        if t is None:
            assert got[d] == (None, False)
        else:
            want = unicodedata.normalize("NFC", t)
            assert got[d] == (want, want != t), d
    assert got[1][0] == "café" and got[1][1] is True
    assert got[3][1] is False


def test_keep_rate_threshold_exact_order_statistic(spark):
    """Two-pass selection == the naive k-th largest: threshold is an
    exact multiset element, n_kept honors value-ties, edge rates and
    constant scores behave."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import (
        keep_rate_threshold,
    )

    scores = [float(v) for v in [5, 3, 9, 1, 7, 7, 2, 8, 7, 4, 6, 0]]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(scores)], "id long, s double")

    for rate in (0.25, 0.5, 0.75, 1.0):
        r = keep_rate_threshold(df, "s", rate, buckets=4).collect()[0]
        k = max(1, int(rate * len(scores)))
        want = sorted(scores, reverse=True)[k - 1]
        assert r["k_target"] == k and r["threshold"] == want, rate
        assert r["n_kept"] == sum(1 for s in scores if s >= want)

    # ties at the cutoff keep MORE than k (rate 0.25 -> k=3, 3rd largest
    # is 7 which appears three times -> 5 kept)
    r = keep_rate_threshold(df, "s", 0.25, buckets=4).collect()[0]
    assert r["threshold"] == 7.0 and r["n_kept"] == 5 and r["k_target"] == 3

    # constant score: threshold is that value, everything kept
    const = spark.createDataFrame([(i, 2.5) for i in range(6)], "id long, s double")
    r = keep_rate_threshold(const, "s", 0.5).collect()[0]
    assert r["threshold"] == 2.5 and r["n_kept"] == 6

    # empty input
    r = keep_rate_threshold(df.filter("s > 100"), "s", 0.5).collect()[0]
    assert r["n_docs"] == 0 and r["threshold"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError):
        keep_rate_threshold(df, "s", 0.0)


def test_keep_rate_threshold_ignores_nan(spark):
    """NaN scores (not NULL!) would poison min/max/width and silently
    return (NaN, 0) — they are dropped like NULL."""
    from kafka_elasticsearch_standalone_consumer_spark.ops.curation import (
        keep_rate_threshold,
    )

    rows = [(i, float(v)) for i, v in enumerate([5, 3, 9, 1, 7])]
    rows += [(90, float("nan")), (91, float("nan"))]
    df = spark.createDataFrame(rows, "id long, s double")
    r = keep_rate_threshold(df, "s", 0.4, buckets=4).collect()[0]
    # 5 real scores -> k = 2, 2nd largest = 7
    assert r["n_docs"] == 5 and r["k_target"] == 2
    assert r["threshold"] == 7.0 and r["n_kept"] == 2
