"""Tokenizer: golden outputs + pandas-UDF / SQL-expression equivalence."""

from pyspark.sql import functions as F

from kafka_elasticsearch_standalone_consumer_spark.analysis import (
    tokenize_col,
    tokenize_text,
    tokenize_udf,
    tokens_from,
)

GOLDEN = [
    ("Hello, World 42!", ["hello", "world", "42"]),
    ("", []),
    (None, []),
    ("   ", []),
    ("a-b_c", ["a", "b", "c"]),
    ("naïve Résumé 東京", ["na", "ve", "r", "sum"]),
    ("UPPER lower 007bond", ["upper", "lower", "007bond"]),
    ("dup dup DUP", ["dup", "dup", "dup"]),
]


def test_tokenize_text_golden():
    for text, want in GOLDEN:
        assert tokenize_text(text) == want, text


def test_udf_and_sql_paths_agree(spark):
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(GOLDEN)], "id int, text string")
    out = df.select(
        "id",
        tokenize_udf("text").alias("p"),
        tokenize_col(F.col("text")).alias("s"),
    ).collect()
    for r in sorted(out, key=lambda r: r["id"]):
        assert r["p"] == r["s"] == GOLDEN[r["id"]][1]


def test_tokens_from_counts(spark):
    df = spark.createDataFrame([(1, "a b a a c"), (2, ""), (3, "b B b")], "doc_id long, text string")
    for method in ("sql", "pandas"):
        rows = {
            (r["doc_id"], r["term"]): r["tf"]
            for r in tokens_from(df, method=method).collect()
        }
        assert rows == {(1, "a"): 3, (1, "b"): 1, (1, "c"): 1, (3, "b"): 3}


def test_corpus_tokens_identical_between_paths(spark, transcripts):
    a = tokens_from(transcripts, id_cols=("conv_id", "turn_idx"), method="sql")
    b = tokens_from(transcripts, id_cols=("conv_id", "turn_idx"), method="pandas")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
