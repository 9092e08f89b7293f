"""Deterministic synthetic ``transcripts`` corpus (FIXTURES.md §1).

Schema is the authoritative input shape from BASELINE.json input_hint:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``.

Generation is a pure function of (seed, conversation index) — per-row
counter-based hashing (splitmix64), no RNG state — so the corpus is
identical regardless of partitioning or cluster size, and generation
parallelizes embarrassingly via ``spark.range(n_convs)`` + mapInPandas.
Vocabulary is Zipfian (s≈1.1, ~10k terms) so hot-term skew is present
even at test scale, exercising the salted/sharded merge paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

VOCAB_SIZE = 10_000
ZIPF_S = 1.1
BASE_EPOCH = 1_767_225_600  # 2026-01-01T00:00:00Z
MIN_TURNS, MAX_TURNS = 2, 20
MIN_TOKENS, MAX_TOKENS = 5, 120

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based hash: uint64 in → well-mixed uint64 out (vectorized)."""
    z = x.astype(_U64) + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _uniform(counters: np.ndarray, seed: int, stream: int) -> np.ndarray:
    """U[0,1) from (seed, stream, counter) — pure, order-independent."""
    h = _splitmix64(counters.astype(_U64) ^ _splitmix64(np.array([seed * 1315423911 + stream], dtype=_U64)))
    return (h >> _U64(11)).astype(np.float64) * (1.0 / (1 << 53))


def _vocab_cdf() -> tuple[np.ndarray, np.ndarray]:
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    w = 1.0 / ranks**ZIPF_S
    cdf = np.cumsum(w / w.sum())
    vocab = np.array([f"w{i:05d}" for i in range(VOCAB_SIZE)], dtype=object)
    return cdf, vocab


def generate_conversations(conv_indices: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Generate all turns for the given conversation indices (vectorized)."""
    cdf, vocab = _vocab_cdf()
    ci = conv_indices.astype(np.int64)
    n_turns = MIN_TURNS + (_splitmix64(ci.astype(_U64) * _U64(3) + _U64(seed)) % _U64(MAX_TURNS - MIN_TURNS + 1)).astype(np.int64)

    conv_rep = np.repeat(ci, n_turns)
    turn_idx = np.concatenate([np.arange(k, dtype=np.int64) for k in n_turns]) if ci.size else np.empty(0, np.int64)
    row_key = conv_rep * 64 + turn_idx  # unique per turn (MAX_TURNS < 64)

    # token counts per turn; ~1.5% of turns are empty-text edge cases
    u_len = _uniform(row_key, seed, 1)
    n_tok = (MIN_TOKENS + (u_len * (MAX_TOKENS - MIN_TOKENS + 1)).astype(np.int64)).astype(np.int64)
    empty = _uniform(row_key, seed, 2) < 0.015
    n_tok[empty] = 0

    # draw all tokens flat: counter = row_key * 128 + position (MAX_TOKENS < 128)
    tok_starts = np.concatenate([[0], np.cumsum(n_tok)])
    total = int(tok_starts[-1])
    pos_in_row = np.arange(total, dtype=np.int64) - np.repeat(tok_starts[:-1], n_tok)
    tok_counter = np.repeat(row_key, n_tok) * 128 + pos_in_row
    u_tok = _uniform(tok_counter, seed, 3)
    term_ids = np.searchsorted(cdf, u_tok, side="right")
    words = vocab[np.minimum(term_ids, VOCAB_SIZE - 1)]

    # assemble text per row; sprinkle punctuation/unicode edge cases
    texts = np.empty(row_key.size, dtype=object)
    u_punct = _uniform(row_key, seed, 4)
    for i in range(row_key.size):
        s, e = tok_starts[i], tok_starts[i + 1]
        if s == e:
            texts[i] = ""
            continue
        joined = " ".join(words[s:e])
        if u_punct[i] < 0.02:
            joined = joined.replace(" ", ", ", 3) + "!"
        elif u_punct[i] < 0.03:
            joined = joined + " naïve Résumé 東京"
        texts[i] = joined

    h_role = _splitmix64(row_key.astype(_U64) ^ _U64(seed + 7))
    is_tool = (h_role % _U64(7)) == 0
    role = np.where(is_tool, "tool", np.where(turn_idx % 2 == 0, "user", "assistant"))
    tool = np.where(is_tool, np.char.add("tool_", (h_role % _U64(5)).astype(np.int64).astype(str)), None)

    ts = pd.to_datetime(BASE_EPOCH + conv_rep * 3600 + turn_idx * 7, unit="s")
    return pd.DataFrame(
        {
            "conv_id": np.char.add("conv", np.char.zfill(conv_rep.astype(str), 10)),
            "turn_idx": turn_idx.astype(np.int32),
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": ts,
        }
    )


def generate_transcripts(
    spark: SparkSession, n_convs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic transcripts DataFrame (~10.5 turns/conv)."""
    partitions = partitions or max(spark.sparkContext.defaultParallelism, 1)

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield generate_conversations(pdf["id"].to_numpy(), seed)

    return (
        spark.range(0, n_convs, numPartitions=partitions)
        .mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
    )


def reference_queries(n: int = 50, seed: int = 42) -> list[dict]:
    """Seeded query set (FIXTURES.md §2): 1–5 terms, hot + rare + absent."""
    _, vocab = _vocab_cdf()
    out = []
    for i in range(n):
        c = np.arange(6, dtype=np.int64) + i * 101
        u = _uniform(c, seed, 11)
        n_terms = 1 + int(u[0] * 5)
        terms = []
        for j in range(n_terms):
            r = u[j + 1]
            if r < 0.35:  # hot head terms
                terms.append(str(vocab[int(r / 0.35 * 50)]))
            elif r < 0.9:  # body/tail
                terms.append(str(vocab[int((r - 0.35) / 0.55 * (VOCAB_SIZE - 1))]))
            else:  # absent from corpus
                terms.append(f"zzabsent{i}")
        if i % 7 == 0 and len(terms) > 1:
            terms[-1] = terms[0]  # duplicate query term edge case
        out.append({"qid": i, "query": " ".join(terms)})
    return out
