"""Property-based tests (hypothesis) for the pure driver-side ANN
kernels: binary-quantization packing must round-trip for ANY vector
(including the int64 sign-bit seam), and the OPQ alternation must keep
its contract — an orthogonal rotation and a rotated-space quantization
error no worse than plain PQ's on the same sample — for arbitrary
Gaussian samples, not just the fixtures. No Spark session needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_elasticsearch_standalone_consumer_spark.ops.similarity import (
    _bq_pack,
    _opq_fit,
    _pq_lloyd,
    _pq_reconstruct,
)


def _bq_unpack(words: list[int], dim: int) -> np.ndarray:
    out = np.zeros(dim, dtype=bool)
    for w, word in enumerate(words):
        if word < 0:
            word += 1 << 64
        for i in range(64 * w, min(64 * w + 64, dim)):
            out[i] = bool((word >> (i - 64 * w)) & 1)
    return out


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False),
        min_size=1,
        max_size=200,
    )
)
def test_bq_pack_roundtrip_any_dim(vals):
    v = np.array(vals, dtype=np.float64)
    words = _bq_pack(v)
    assert len(words) == (len(v) + 63) // 64
    assert all(-(1 << 63) <= w < (1 << 63) for w in words)  # valid int64
    assert np.array_equal(_bq_unpack(words, len(v)), v > 0)


def test_bq_pack_sign_bit_exact():
    v = np.zeros(64)
    v[63] = 1.0
    assert _bq_pack(v) == [-(1 << 63)]  # bit 63 alone = long.MIN_VALUE
    v[0] = 1.0
    assert _bq_pack(v) == [-(1 << 63) + 1]


@settings(max_examples=12, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1), st.sampled_from([2, 4, 8]))
def test_opq_fit_orthogonal_and_no_worse_than_pq(seed, m):
    rng = np.random.default_rng(seed)
    # correlated dims (random covariance) — the regime OPQ exists for
    a = rng.standard_normal((16, 16))
    x = rng.standard_normal((60, 16)) @ a
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    r_mat, books = _opq_fit(x, m=m, k_cent=8, iters=4, opq_iters=4)
    # R orthogonal -> rotated cosines are original cosines
    assert np.abs(r_mat @ r_mat.T - np.eye(16)).max() < 1e-8
    # rotated-space quantization error <= plain PQ's on the same sample
    # (identity init means iteration can only improve the objective)
    books_pq = _pq_lloyd(x, m=m, k_cent=8, iters=4)
    err_pq = ((x - _pq_reconstruct(x, books_pq)) ** 2).sum()
    xr = x @ r_mat
    err_opq = ((xr - _pq_reconstruct(xr, books)) ** 2).sum()
    assert err_opq <= err_pq + 1e-9
