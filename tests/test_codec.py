"""Codec unit tests: varint + delta + blocks round-trips (SURVEY §5.2.1)."""

import numpy as np
import pytest

from kafka_elasticsearch_standalone_consumer_spark.index import codec


@pytest.mark.parametrize("seed", range(5))
def test_varint_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(0, 3000))
    vals = rng.integers(0, 2**62, size=n).astype(np.uint64)
    assert np.array_equal(codec.varint_decode(codec.varint_encode(vals)), vals)


def test_varint_boundaries():
    vals = np.array(
        [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**35, 2**63 - 1],
        dtype=np.uint64,
    )
    assert np.array_equal(codec.varint_decode(codec.varint_encode(vals)), vals)
    assert codec.varint_encode(np.empty(0, np.uint64)) == b""
    assert codec.varint_decode(b"").size == 0


@pytest.mark.parametrize("n", [0, 1, 127, 128, 129, 1000, 5000])
def test_pack_run_roundtrip(n):
    rng = np.random.default_rng(n)
    docs = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 500, size=n).astype(np.int64)
    dls = rng.integers(0, 300, size=n).astype(np.int64)
    run = codec.pack_run(docs, tfs, dls, avgdl=55.5)
    d, t, l = codec.unpack_run(run["docs"], run["tfs"], run["n_docs"], run["dls"])
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    assert np.array_equal(l, dls)


def test_block_max_metadata():
    docs = np.arange(0, 1000, 3, dtype=np.int64)  # 334 docs → 3 blocks
    tfs = (docs % 7 + 1).astype(np.int64)
    dls = np.full(docs.size, 50, dtype=np.int64)
    run = codec.pack_run(docs, tfs, dls, avgdl=50.0)
    nb = (docs.size + 127) // 128
    assert len(run["block_max_doc"]) == nb
    assert run["block_max_doc"][-1] == docs[-1]
    assert run["block_max_doc"][0] == docs[127]
    assert run["block_max_tf"][0] == max(tfs[:128])
    # exact impact bound: max tf/(tf + k1*(1-b+b*dl/avgdl)) over the block
    k1, b = 1.2, 0.75
    imp = tfs[:128] / (tfs[:128] + k1 * (1 - b + b * 50 / 50.0))
    assert abs(run["block_max_impact"][0] - imp.max()) < 1e-6


def test_selective_block_decode():
    rng = np.random.default_rng(7)
    docs = np.sort(rng.choice(10**6, size=1000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, size=1000).astype(np.int64)
    run = codec.pack_run(docs, tfs)
    d, t = codec.unpack_blocks(
        run["docs"], run["tfs"], run["block_offs_docs"], run["block_offs_tfs"],
        [2, 5], 1000,
    )
    expect = np.concatenate([docs[256:384], docs[640:768]])
    assert np.array_equal(d, expect)
    assert np.array_equal(t, np.concatenate([tfs[256:384], tfs[640:768]]))


def test_pack_positions_rejects_overflowing_positions():
    """Positions ≥ 2^20 would corrupt the doc<<POS_BITS|pos phrase keys —
    pack time must reject them (documented max doc length)."""
    import numpy as np
    import pytest

    from kafka_elasticsearch_standalone_consumer_spark.index import codec

    flat = np.array([0, 5, codec.MAX_POSITION], dtype=np.int64)
    tfs = np.array([2, 1], dtype=np.int64)
    with pytest.raises(ValueError, match="position"):
        codec.pack_positions(flat, tfs)
    ok_flat = np.array([0, 5, codec.MAX_POSITION - 1], dtype=np.int64)
    buf, offs = codec.pack_positions(ok_flat, tfs)
    assert len(buf) > 0 and offs == [0]
