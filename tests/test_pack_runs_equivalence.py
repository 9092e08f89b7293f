"""Round-6 optimization guard: the batched :func:`codec.pack_runs` must
stay BYTE-identical, run for run, to the per-run :func:`codec.pack_run` /
:func:`codec.pack_positions` pair it replaced inside the postings pack
kernel — buffers, offsets, block maxima, and the float32 impact casts.
No Spark session needed."""

from __future__ import annotations

import numpy as np
import pytest

from kafka_elasticsearch_standalone_consumer_spark.index import codec


@pytest.mark.parametrize("seed,block_size", [(7, 128), (11, 128), (3, 4)])
def test_pack_runs_matches_pack_run_per_run(seed, block_size):
    rng = np.random.default_rng(seed)
    # Zipf-tail shape: many tiny runs + multi-block runs straddling
    # every boundary case (block_size-1, block_size, block_size+1, 4×+1)
    lens = list(rng.integers(1, 6, 400)) + [
        block_size - 1, block_size, block_size + 1, 4 * block_size + 1, 1
    ]
    docs_l, tfs_l, dls_l, row_pos = [], [], [], []
    starts, ends, acc = [], [], 0
    for L in lens:
        docs_l.append(np.sort(rng.choice(100000, size=L, replace=False)).astype(np.int64))
        t = rng.integers(1, 7, L).astype(np.int64)
        tfs_l.append(t)
        dls_l.append(rng.integers(1, 80, L).astype(np.int64))
        row_pos.extend(
            np.sort(rng.choice(500, size=int(x), replace=False)).astype(np.int64)
            for x in t
        )
        starts.append(acc)
        acc += L
        ends.append(acc)
    docs = np.concatenate(docs_l)
    tfs = np.concatenate(tfs_l)
    dls = np.concatenate(dls_l)
    flat_pos = np.concatenate(row_pos)
    starts = np.array(starts)
    ends = np.array(ends)

    batch = codec.pack_runs(
        docs, tfs, dls, starts, ends, avgdl=33.3, k1=1.2, b=0.75,
        block_size=block_size, flat_pos=flat_pos, pos_row_tf=tfs,
    )
    pos_bounds = np.append(np.cumsum(tfs) - tfs, flat_pos.size)
    for i, (s, e) in enumerate(zip(starts, ends)):
        ref = codec.pack_run(
            docs[s:e], tfs[s:e], dls[s:e], avgdl=33.3, k1=1.2, b=0.75,
            block_size=block_size,
        )
        assert batch["docs"][i] == ref["docs"]
        assert batch["tfs"][i] == ref["tfs"]
        assert batch["dls"][i] == ref["dls"]
        assert int(batch["n_docs"][i]) == ref["n_docs"]
        assert list(batch["block_offs_docs"][i]) == ref["block_offs_docs"]
        assert list(batch["block_offs_tfs"][i]) == ref["block_offs_tfs"]
        assert list(batch["block_offs_dls"][i]) == ref["block_offs_dls"]
        assert list(batch["block_max_doc"][i]) == ref["block_max_doc"]
        assert list(batch["block_max_tf"][i]) == ref["block_max_tf"]
        assert list(batch["block_max_impact"][i]) == ref["block_max_impact"]
        run_flat = flat_pos[pos_bounds[s]:pos_bounds[e]]
        pbuf, poffs = codec.pack_positions(run_flat, tfs[s:e], block_size)
        assert batch["pos"][i] == pbuf
        assert list(batch["block_offs_pos"][i]) == poffs


def test_pack_runs_rejects_overflowing_positions():
    docs = np.array([1, 2], dtype=np.int64)
    tfs = np.array([1, 1], dtype=np.int64)
    dls = np.array([3, 3], dtype=np.int64)
    bad = np.array([0, codec.MAX_POSITION], dtype=np.int64)
    with pytest.raises(ValueError, match="positions-index"):
        codec.pack_runs(
            docs, tfs, dls, np.array([0]), np.array([2]), avgdl=3.0,
            flat_pos=bad, pos_row_tf=tfs,
        )
