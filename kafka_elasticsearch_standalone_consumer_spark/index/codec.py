"""Posting-list compression: delta + varint + fixed-size blocks.

This owns the storage format the reference delegated to Lucene segments
(implied by ES 1.5.1 at reference ``pom.xml:22`` and the bulk-index calls
at ``MessageHandler.java:135-139``): sorted doc_ids are delta-encoded and
varint-packed in blocks of ``BLOCK_SIZE`` docs; term frequencies are
varint-packed per block. Delta encoding RESTARTS at each block boundary
(first doc of a block is stored raw) so a block can be decoded without
decoding its predecessors — that is what makes block-max skipping
(Ding & Suel, "Faster top-k document retrieval using block-max indexes",
SIGIR'11) possible at query time.

All encode/decode paths are vectorized NumPy — no per-element Python
loops — because they run inside Arrow-batched pandas UDF kernels on
executors.
"""

from __future__ import annotations

import numpy as np

from kafka_elasticsearch_standalone_consumer_spark import BLOCK_SIZE

# thresholds for exact varint byte-length computation (no float log2)
_VARINT_THRESHOLDS = [np.uint64(1) << np.uint64(7 * i) for i in range(1, 10)]


def _varint_parts(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(encoded uint8 array, per-element byte lengths) — the vectorized
    LEB128 core. Encoding is element-independent, so any concatenation
    of element ranges encodes to the concatenation of their encodings —
    what lets :func:`pack_runs` encode a whole Arrow batch in one call
    and slice per-run/per-block buffers out of it byte-identically."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _VARINT_THRESHOLDS:
        nbytes += v >= t
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    seven = np.uint64(7)
    for j in range(10):
        mask = nbytes > j
        if not mask.any():
            break
        chunk = (v[mask] >> (seven * np.uint64(j))) & np.uint64(0x7F)
        cont = np.where(nbytes[mask] - 1 > j, 0x80, 0).astype(np.uint8)
        out[starts[mask] + j] = chunk.astype(np.uint8) | cont
    return out, nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-style varint pack of a non-negative int array (vectorized)."""
    return _varint_parts(values)[0].tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Inverse of :func:`varint_encode`; returns uint64 array (vectorized).

    Fast path: a buffer with no continuation bit set is one byte per
    value — just widen it (2 numpy ops instead of ~10). That is the
    overwhelmingly common case for the per-BLOCK decodes the WAND
    kernel's skipping loop issues (tf/dl/delta values < 128), whose
    ~25 µs fixed overhead per 128-value block dominated the serving
    path's profile."""
    data = np.frombuffer(buf, dtype=np.uint8)
    if data.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (data & 0x80) == 0
    if is_last.all():
        return data.astype(np.uint64)
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    pos = np.arange(data.size, dtype=np.int64) - np.repeat(starts, lengths)
    contrib = (data & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


def pack_run(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray | None = None,
    avgdl: float | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Pack one (term, shard) posting run.

    ``doc_ids`` must be sorted ascending and unique; ``tfs`` aligned.
    ``dls`` (per-posting document length) is packed alongside so the query
    path never joins doc_stats — the per-doc norm travels with the posting,
    the same trick as Lucene norms/impacts. When ``avgdl`` is given, the
    exact per-block max BM25 impact ``max tf/(tf+k1*(1-b+b*dl/avgdl))`` is
    precomputed (tight block-max bound for WAND); otherwise the dl→0 upper
    bound from block_max_tf is used at query time.

    Returns the columns of one ``postings`` row:
      docs/tfs/dls: bytes  delta+varint doc ids (delta restarts per block),
                           varint tfs, varint dls
      n_docs: int
      block_offs_docs / block_offs_tfs / block_offs_dls: int32 byte offsets
      block_max_doc: int64 last (max) doc id per block
      block_max_tf:  int32 max tf per block
      block_max_impact: float32 exact max BM25 tf-impact per block
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    n = doc_ids.size
    n_blocks = (n + block_size - 1) // block_size
    block_starts = np.arange(n_blocks, dtype=np.int64) * block_size
    block_ends = np.minimum(block_starts + block_size, n)

    # delta encode with restart at block boundaries: element at a block
    # start keeps its raw value, others store (doc - prev_doc)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[1:] = (doc_ids[1:] - doc_ids[:-1]).astype(np.uint64)
    if n:
        deltas[0] = np.uint64(doc_ids[0])
        deltas[block_starts[1:]] = doc_ids[block_starts[1:]].astype(np.uint64)

    dls = None if dls is None else np.ascontiguousarray(dls, dtype=np.int64)
    doc_bufs, tf_bufs, dl_bufs = [], [], []
    offs_d = np.zeros(n_blocks, dtype=np.int32)
    offs_t = np.zeros(n_blocks, dtype=np.int32)
    offs_l = np.zeros(n_blocks, dtype=np.int32)
    pos_d = pos_t = pos_l = 0
    for i in range(n_blocks):
        s, e = int(block_starts[i]), int(block_ends[i])
        offs_d[i], offs_t[i], offs_l[i] = pos_d, pos_t, pos_l
        db = varint_encode(deltas[s:e])
        tb = varint_encode(tfs[s:e].astype(np.uint64))
        doc_bufs.append(db)
        tf_bufs.append(tb)
        pos_d += len(db)
        pos_t += len(tb)
        if dls is not None:
            lb = varint_encode(dls[s:e].astype(np.uint64))
            dl_bufs.append(lb)
            pos_l += len(lb)

    block_max_doc = doc_ids[block_ends - 1] if n else np.empty(0, dtype=np.int64)
    block_max_tf = (
        np.maximum.reduceat(tfs, block_starts) if n else np.empty(0, dtype=np.int64)
    )
    if dls is not None and avgdl is not None and n:
        tf_f = tfs.astype(np.float64)
        impact = tf_f / (tf_f + k1 * (1.0 - b + b * dls.astype(np.float64) / max(avgdl, 1e-9)))
        block_max_impact = np.maximum.reduceat(impact, block_starts)
    else:
        block_max_impact = np.zeros(n_blocks, dtype=np.float64)
    return {
        "docs": b"".join(doc_bufs),
        "tfs": b"".join(tf_bufs),
        "dls": b"".join(dl_bufs) if dls is not None else b"",
        "n_docs": int(n),
        "block_offs_docs": offs_d.tolist(),
        "block_offs_tfs": offs_t.tolist(),
        "block_offs_dls": offs_l.tolist(),
        "block_max_doc": block_max_doc.astype(np.int64).tolist(),
        "block_max_tf": block_max_tf.astype(np.int32).tolist(),
        "block_max_impact": np.asarray(block_max_impact, dtype=np.float32).tolist(),
    }


# In-doc position ceiling: phrase kernels pack (doc, pos) into one int64
# as doc << POS_BITS | pos (query/kernels.py POS_BITS), so a position at
# or above 2^20 would corrupt the doc bits. Enforced at pack time: an
# index build rejects documents longer than ~1M tokens outright rather
# than silently mis-matching phrases later.
MAX_POSITION = 1 << 20


def pack_positions(
    flat_pos: np.ndarray,
    tfs: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> tuple[bytes, list[int]]:
    """Pack per-posting position lists (the Lucene positions stream).

    ``flat_pos`` is every posting's ascending in-doc offsets concatenated
    in doc order; ``tfs`` gives each posting's count (=segment lengths).
    Deltas RESTART at each document (first position raw) and blocks align
    with the doc blocks of :func:`pack_run`, so a block's positions decode
    without touching its neighbours. Returns (bytes, per-block offsets).
    Raises ``ValueError`` for any position ≥ :data:`MAX_POSITION`.
    """
    flat_pos = np.ascontiguousarray(flat_pos, dtype=np.int64)
    if flat_pos.size and int(flat_pos.max()) >= MAX_POSITION:
        raise ValueError(
            f"token position {int(flat_pos.max())} exceeds the positions-index "
            f"limit of {MAX_POSITION - 1} tokens per document (POS_BITS key packing)"
        )
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    n = tfs.size
    if n == 0:
        return b"", []
    doc_starts = np.cumsum(tfs) - tfs  # flat index of each doc's first position
    deltas = np.empty(flat_pos.size, dtype=np.uint64)
    if flat_pos.size:
        deltas[1:] = (flat_pos[1:] - flat_pos[:-1]).astype(np.uint64)
        deltas[doc_starts[tfs > 0]] = flat_pos[doc_starts[tfs > 0]].astype(np.uint64)
    n_blocks = (n + block_size - 1) // block_size
    block_doc_starts = np.arange(n_blocks, dtype=np.int64) * block_size
    block_doc_ends = np.minimum(block_doc_starts + block_size, n)
    pos_bounds = np.concatenate([doc_starts, [flat_pos.size]])
    bufs, offs, pos = [], [], 0
    for i in range(n_blocks):
        s = int(pos_bounds[block_doc_starts[i]])
        e = int(pos_bounds[block_doc_ends[i]])
        offs.append(pos)
        b = varint_encode(deltas[s:e])
        bufs.append(b)
        pos += len(b)
    return b"".join(bufs), offs


def decode_position_blocks(
    buf: bytes, offs: np.ndarray, block_idx, tfs_blocks: list[np.ndarray]
) -> list[np.ndarray]:
    """Decode selected position blocks → flat ascending positions per block
    (doc boundaries given by the block's tfs, decoded separately)."""
    out = []
    for flat, tfs in zip(decode_value_blocks(buf, offs, block_idx), tfs_blocks):
        out.append(_undelta_segments(flat, np.asarray(tfs, dtype=np.int64)))
    return out


def _undelta_segments(deltas: np.ndarray, seg_lengths: np.ndarray) -> np.ndarray:
    """Prefix-sum deltas where each variable-length segment restarts raw."""
    deltas = deltas.astype(np.int64)
    if deltas.size == 0:
        return deltas
    out = np.cumsum(deltas)
    seg_lengths = seg_lengths[seg_lengths > 0]
    starts = np.cumsum(seg_lengths) - seg_lengths
    corr = np.zeros(seg_lengths.size, dtype=np.int64)
    corr[1:] = out[starts[1:] - 1]
    return out - np.repeat(corr, seg_lengths)


def unpack_run(
    docs_buf: bytes,
    tfs_buf: bytes,
    n_docs: int,
    dls_buf: bytes | None = None,
    block_size: int = BLOCK_SIZE,
):
    """Decode a full run → (doc_ids, tfs[, dls]) int64 arrays."""
    deltas = varint_decode(docs_buf).astype(np.int64)
    tfs = varint_decode(tfs_buf).astype(np.int64)
    doc_ids = _undelta_blocked(deltas, block_size)
    assert doc_ids.size == n_docs
    if dls_buf is None:
        return doc_ids, tfs
    return doc_ids, tfs, varint_decode(dls_buf).astype(np.int64)


def decode_value_blocks(buf: bytes, offs: np.ndarray, block_idx) -> list[np.ndarray]:
    """Decode selected blocks of a varint value stream (tfs or dls)."""
    offs = np.asarray(offs, dtype=np.int64)
    ends = np.empty_like(offs)
    ends[:-1] = offs[1:]
    ends[-1] = len(buf)
    return [varint_decode(buf[offs[i] : ends[i]]).astype(np.int64) for i in block_idx]


def decode_doc_blocks(buf: bytes, offs: np.ndarray, block_idx) -> list[np.ndarray]:
    """Decode selected doc-id blocks (delta restarts per block → cumsum)."""
    out = []
    for d in decode_value_blocks(buf, offs, block_idx):
        np.cumsum(d, out=d)
        out.append(d)
    return out


def _undelta_blocked(deltas: np.ndarray, block_size: int) -> np.ndarray:
    """Prefix-sum deltas where each block of ``block_size`` restarts raw."""
    n = deltas.size
    if n == 0:
        return deltas
    out = np.cumsum(deltas.astype(np.int64))
    n_blocks = (n + block_size - 1) // block_size
    if n_blocks > 1:
        starts = np.arange(1, n_blocks, dtype=np.int64) * block_size
        # block b's start holds a RAW doc id, so every element of block b
        # carries the spurious prefix sum accumulated before the block —
        # subtract that prefix (out[start-1]) from the whole block segment
        correction = np.concatenate([[np.int64(0)], out[starts - 1]])
        seg_lengths = np.diff(np.concatenate([[np.int64(0)], starts, [np.int64(n)]]))
        out = out - np.repeat(correction, seg_lengths)
    return out


def unpack_blocks(
    docs_buf: bytes,
    tfs_buf: bytes,
    offs_d: np.ndarray,
    offs_t: np.ndarray,
    block_idx: np.ndarray,
    n_docs: int,
    block_size: int = BLOCK_SIZE,
):
    """Decode only the selected blocks (for block-max skipping).

    Returns (doc_ids, tfs) concatenated over ``block_idx`` in ascending
    block order.
    """
    block_idx = sorted(set(int(i) for i in block_idx))
    if not block_idx:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    docs_out = decode_doc_blocks(docs_buf, offs_d, block_idx)
    tfs_out = decode_value_blocks(tfs_buf, offs_t, block_idx)
    return np.concatenate(docs_out), np.concatenate(tfs_out)


def pack_runs(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = BLOCK_SIZE,
    flat_pos: np.ndarray | None = None,
    pos_row_tf: np.ndarray | None = None,
) -> dict:
    """Vectorized :func:`pack_run` over MANY runs at once.

    ``doc_ids``/``tfs``/``dls`` are a batch's rows sorted by run
    (``starts[i]:ends[i]`` is run i); the per-run outputs are
    BYTE-IDENTICAL to calling :func:`pack_run` per run (varint encoding
    is element-independent — one global encode, per-run slices; block
    maxima are ``reduceat`` at global block starts, which never span
    runs; impacts use the same elementwise float64 formula then a
    float32 cast). Motivation: :func:`pack_run`'s per-call overhead is
    ~130 µs regardless of run length, and a Zipf-tail batch holds tens
    of thousands of 1–5-posting runs — the postings pack stage of the
    8× bench build spent most of its wall in that overhead.

    With ``flat_pos``/``pos_row_tf`` (all rows' concatenated in-doc
    positions + per-row counts) the positions stream is packed the same
    way, byte-identical to :func:`pack_positions` per run. Returns a
    dict of per-run column lists/arrays, keyed like ``pack_run`` plus
    ``term``-less metadata the caller attaches."""
    core = pack_runs_core(
        doc_ids, tfs, dls, starts, ends, avgdl, k1, b, block_size,
        flat_pos=flat_pos, pos_row_tf=pos_row_tf,
    )
    r = core["n_docs"].size
    splits = core["list_offs"][1:-1]

    def _slices(enc: np.ndarray, bounds: np.ndarray) -> list[bytes]:
        buf = enc.tobytes()
        out, prev = [], 0
        for e in bounds:
            out.append(buf[prev:e])
            prev = e
        return out

    out = {
        "n_docs": core["n_docs"],
        "docs": _slices(core["enc_docs"], core["bounds_docs"]),
        "tfs": _slices(core["enc_tfs"], core["bounds_tfs"]),
        "dls": _slices(core["enc_dls"], core["bounds_dls"]),
        "block_offs_docs": np.split(core["offs_docs"], splits),
        "block_offs_tfs": np.split(core["offs_tfs"], splits),
        "block_offs_dls": np.split(core["offs_dls"], splits),
        "block_max_doc": np.split(core["block_max_doc"], splits),
        "block_max_tf": np.split(core["block_max_tf"], splits),
        "block_max_impact": np.split(core["block_max_impact"], splits),
    }
    if flat_pos is not None:
        out["pos"] = _slices(core["enc_pos"], core["bounds_pos"])
        out["block_offs_pos"] = np.split(core["offs_pos"], splits)
    return out


def pack_runs_core(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = BLOCK_SIZE,
    flat_pos: np.ndarray | None = None,
    pos_row_tf: np.ndarray | None = None,
) -> dict:
    """The buffer-level core of :func:`pack_runs`: raw encode buffers +
    per-run byte bounds + flat per-block arrays + list offsets — exactly
    the buffers an Arrow BinaryArray/ListArray is built from, so the pack
    kernel can assemble its output batch ZERO-COPY (run i's bytes are
    ``enc[bounds[i-1]:bounds[i]]``; runs tile the batch, so the bounds
    ARE the binary array's offsets)."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    n = doc_ids.size
    r = starts.size
    lens = ends - starts

    pos_in_run = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
    is_restart = (pos_in_run % block_size) == 0
    deltas = np.empty(n, dtype=np.uint64)
    if n:
        deltas[1:] = (doc_ids[1:] - doc_ids[:-1]).astype(np.uint64)
        deltas[is_restart] = doc_ids[is_restart].astype(np.uint64)

    enc_d, nb_d = _varint_parts(deltas)
    enc_t, nb_t = _varint_parts(tfs.astype(np.uint64))
    enc_l, nb_l = _varint_parts(dls.astype(np.uint64))
    cs_d = np.zeros(n + 1, dtype=np.int64); np.cumsum(nb_d, out=cs_d[1:])
    cs_t = np.zeros(n + 1, dtype=np.int64); np.cumsum(nb_t, out=cs_t[1:])
    cs_l = np.zeros(n + 1, dtype=np.int64); np.cumsum(nb_l, out=cs_l[1:])

    bpos = np.flatnonzero(is_restart)                    # global block starts
    nblocks = (lens + block_size - 1) // block_size      # per run
    block_run = np.repeat(np.arange(r, dtype=np.int64), nblocks)
    run_start_of_block = starts[block_run]
    list_offs = np.zeros(r + 1, dtype=np.int64)
    np.cumsum(nblocks, out=list_offs[1:])

    block_end_pos = np.append(bpos[1:], n) - 1
    tf_f = tfs.astype(np.float64)
    impact = tf_f / (tf_f + k1 * (1.0 - b + b * dls.astype(np.float64) / max(avgdl, 1e-9)))
    core = {
        "n_docs": lens,
        "enc_docs": enc_d, "bounds_docs": cs_d[ends],
        "enc_tfs": enc_t, "bounds_tfs": cs_t[ends],
        "enc_dls": enc_l, "bounds_dls": cs_l[ends],
        "offs_docs": (cs_d[bpos] - cs_d[run_start_of_block]).astype(np.int32),
        "offs_tfs": (cs_t[bpos] - cs_t[run_start_of_block]).astype(np.int32),
        "offs_dls": (cs_l[bpos] - cs_l[run_start_of_block]).astype(np.int32),
        "block_max_doc": doc_ids[block_end_pos].astype(np.int64),
        "block_max_tf": (np.maximum.reduceat(tfs, bpos) if n else np.empty(0, np.int64)).astype(np.int32),
        "block_max_impact": (np.maximum.reduceat(impact, bpos) if n else np.empty(0)).astype(np.float32),
        "list_offs": list_offs,
    }

    if flat_pos is not None:
        flat_pos = np.ascontiguousarray(flat_pos, dtype=np.int64)
        if flat_pos.size and int(flat_pos.max()) >= MAX_POSITION:
            raise ValueError(
                f"token position {int(flat_pos.max())} exceeds the positions-index "
                f"limit of {MAX_POSITION - 1} tokens per document (POS_BITS key packing)"
            )
        row_tf = np.ascontiguousarray(pos_row_tf, dtype=np.int64)
        doc_starts = np.cumsum(row_tf) - row_tf          # per row, in flat space
        pdeltas = np.empty(flat_pos.size, dtype=np.uint64)
        if flat_pos.size:
            pdeltas[1:] = (flat_pos[1:] - flat_pos[:-1]).astype(np.uint64)
            nz = row_tf > 0
            pdeltas[doc_starts[nz]] = flat_pos[doc_starts[nz]].astype(np.uint64)
        enc_p, nb_p = _varint_parts(pdeltas)
        cs_p = np.zeros(flat_pos.size + 1, dtype=np.int64)
        np.cumsum(nb_p, out=cs_p[1:])
        pos_bounds = np.append(doc_starts, flat_pos.size)  # row index -> flat start
        core["enc_pos"] = enc_p
        core["bounds_pos"] = cs_p[pos_bounds[ends]]
        core["offs_pos"] = (
            cs_p[pos_bounds[bpos]] - cs_p[pos_bounds[starts]][block_run]
        ).astype(np.int32)
    return core
