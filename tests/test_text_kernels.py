"""Unit/property tests for the numpy text kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from deduplication_and_compression_spark.functions.text import (
    lcs_length, suffix_array, winnow_fingerprints,
)


def _naive_lcs(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


@given(st.binary(min_size=0, max_size=60))
@settings(max_examples=60, deadline=None)
def test_suffix_array_sorts_suffixes(data):
    s = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    sa = suffix_array(s)
    suffixes = [bytes(data[i:]) for i in sa]
    assert suffixes == sorted(bytes(data[i:]) for i in range(len(data)))


@given(
    st.text(alphabet="abcd ", min_size=0, max_size=50),
    st.text(alphabet="abcd ", min_size=0, max_size=50),
)
@settings(max_examples=80, deadline=None)
def test_lcs_matches_naive(a, b):
    assert lcs_length(a, b) == _naive_lcs(a, b)


@given(
    st.text(alphabet="abcdefgh ", min_size=40, max_size=120),
    st.integers(min_value=0, max_value=60),
    st.text(alphabet="xyzuvw", min_size=0, max_size=30),
    st.text(alphabet="xyzuvw", min_size=0, max_size=30),
)
@settings(max_examples=60, deadline=None)
def test_winnowing_guarantee(base, start, pre, post):
    """Any shared substring of length >= L yields a shared fingerprint."""
    L = 32
    start = min(start, len(base) - L)
    shared = base[start : start + L]
    a = base
    b = pre + shared + post
    fa = set(winnow_fingerprints(a, L).tolist())
    fb = set(winnow_fingerprints(b, L).tolist())
    assert fa & fb, "winnowing missed a planted shared L-substring"
