"""Property-based tests (hypothesis) for the round-3b pure kernels — no
Spark session: the fuzzy edit-distance vs a reference OSA DP, the IPv4
conversion vs the stdlib, template rendering, and doc-mask application.
"""

from __future__ import annotations

import ipaddress

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_elasticsearch_standalone_consumer_spark.query.engine import (
    _damerau_levenshtein,
)
from kafka_elasticsearch_standalone_consumer_spark.query.kernels import _apply_doc_masks
from kafka_elasticsearch_standalone_consumer_spark.query.aggs import _ip4_to_int
from kafka_elasticsearch_standalone_consumer_spark.query.querystring import (
    render_template,
)

words = st.text(alphabet="abcdef", max_size=8)


def _osa_reference(a: str, b: str) -> int:
    """Textbook optimal-string-alignment distance (adjacent transposition
    = one edit, no substring may be edited twice) — the ES fuzziness
    metric, written independently of the engine's early-exit version."""
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[la][lb]


@settings(max_examples=300, deadline=None)
@given(words, words, st.integers(min_value=0, max_value=4))
def test_damerau_levenshtein_matches_reference(a, b, cap):
    ref = _osa_reference(a, b)
    got = _damerau_levenshtein(a, b, cap)
    if ref <= cap:
        assert got == ref
    else:
        assert got > cap  # early exit reports "past cap", exact value free


@settings(max_examples=200, deadline=None)
@given(st.tuples(*[st.integers(min_value=0, max_value=255)] * 4))
def test_ip4_to_int_matches_stdlib(octets):
    s = ".".join(str(o) for o in octets)
    assert _ip4_to_int(s) == int(ipaddress.IPv4Address(s))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=500), unique=True),
    st.lists(st.integers(min_value=0, max_value=500), unique=True),
    st.booleans(),
)
def test_apply_doc_masks_matches_isin(uniq_vals, mask_vals, as_allowed):
    uniq = np.sort(np.array(uniq_vals, dtype=np.int64))
    mask = np.sort(np.array(mask_vals, dtype=np.int64))
    keep = _apply_doc_masks(
        uniq, mask if as_allowed else None, None if as_allowed else mask
    )
    member = np.isin(uniq, mask)
    want = member if as_allowed else ~member
    if keep is None:
        assert bool(want.all())
    else:
        assert np.array_equal(uniq[keep], uniq[want])


@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(
        st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,6}", fullmatch=True),
        st.integers() | st.text(alphabet="xyz :-", max_size=6),
        max_size=4,
    )
)
def test_render_template_substitutes_every_param(params):
    tpl = " ".join("{{" + k + "}}" for k in params)
    out = render_template(tpl, params)
    assert out == " ".join(str(v) for v in params.values())
    assert "{{" not in out


def test_render_template_unbound_raises():
    with pytest.raises(KeyError):
        render_template("{{a}} {{b}}", {"a": 1})
