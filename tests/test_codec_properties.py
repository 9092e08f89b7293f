"""Property-based codec tests (hypothesis): the varint/delta/positions
streams must round-trip for ANY valid input, not just the fixtures —
arbitrary magnitudes (full uint64 range for varint), block-boundary
alignments, single-element and empty runs."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_elasticsearch_standalone_consumer_spark.index import codec

uints = st.integers(min_value=0, max_value=(1 << 64) - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(uints, max_size=300))
def test_varint_roundtrip_any_magnitude(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(codec.varint_decode(codec.varint_encode(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=400, unique=True),
    st.lists(st.integers(min_value=1, max_value=1000), min_size=1, max_size=400),
    st.sampled_from([1, 2, 7, 128]),
)
def test_pack_run_roundtrip(doc_ids, tfs, block_size):
    docs = np.sort(np.array(doc_ids, dtype=np.int64))
    n = docs.size
    tfs = np.resize(np.array(tfs, dtype=np.int64), n)
    dls = tfs * 3 + 1
    run = codec.pack_run(docs, tfs, dls, avgdl=50.0, block_size=block_size)
    d, t, l = codec.unpack_run(run["docs"], run["tfs"], n, run["dls"], block_size=block_size)
    assert np.array_equal(d, docs) and np.array_equal(t, tfs) and np.array_equal(l, dls)
    # per-block decode agrees with the full decode
    n_blocks = (n + block_size - 1) // block_size
    got_docs = codec.decode_doc_blocks(
        run["docs"], np.array(run["block_offs_docs"]), range(n_blocks)
    )
    assert np.array_equal(np.concatenate(got_docs), docs)
    # block-max metadata is truly the max
    for i in range(n_blocks):
        s, e = i * block_size, min((i + 1) * block_size, n)
        assert run["block_max_doc"][i] == int(docs[s:e].max())
        assert run["block_max_tf"][i] == int(tfs[s:e].max())


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=150),
    st.sampled_from([1, 3, 16, 128]),
)
def test_positions_roundtrip(tf_list, block_size):
    rng = np.random.default_rng(sum(tf_list) + block_size)
    tfs = np.array(tf_list, dtype=np.int64)
    pos_lists = [np.sort(rng.choice(1 << 16, tf, replace=False)) for tf in tfs]
    flat = np.concatenate(pos_lists)
    buf, offs = codec.pack_positions(flat, tfs, block_size=block_size)
    n_blocks = (tfs.size + block_size - 1) // block_size
    tfs_blocks = [tfs[i * block_size : (i + 1) * block_size] for i in range(n_blocks)]
    got = codec.decode_position_blocks(buf, np.array(offs), list(range(n_blocks)), tfs_blocks)
    bounds = np.concatenate([[0], np.cumsum(tfs)])
    for i in range(n_blocks):
        s = bounds[i * block_size]
        e = bounds[min((i + 1) * block_size, tfs.size)]
        assert np.array_equal(got[i], flat[s:e]), i


# --- BPE encoder equivalence: the double-delimiter replace chain (what the
# Spark Column expression and the DuckDB oracle both run) must equal the
# trainer's greedy re-segmentation loop for ANY word and ANY merge list ---

def _bpe_chain_tokens(word: str, merges) -> int:
    s = "|" + "||".join(word) + "|"
    for l, r in merges:
        s = s.replace(f"|{l}||{r}|", f"|{l}{r}|")
    return (len(s) - len(s.replace("|", ""))) // 2


def _bpe_loop_tokens(word: str, merges) -> int:
    sym = list(word)
    for l, r in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return len(sym)


_sym = st.text(alphabet="ab01", min_size=1, max_size=3)


@settings(max_examples=500, deadline=None)
@given(
    st.text(alphabet="ab01", min_size=1, max_size=14),
    st.lists(st.tuples(_sym, _sym), max_size=6),
)
def test_bpe_replace_chain_equals_greedy_loop(word, merges):
    assert _bpe_chain_tokens(word, merges) == _bpe_loop_tokens(word, merges)
