"""Text kernels: winnowing fingerprints and suffix-array LCS.

Used by the exact-substring tier (SURVEY.md §7 step 5).  The reference
finds byte-identical 4096-byte chunks via content chunking + SHA
(/root/reference/App/Host.cpp:254-340); the analog here is "caption B
shares a ≥L-char verbatim run with caption A", detected scalably by
winnowing (Schleimer, Wilkerson & Aiken, SIGMOD'03 — public
algorithm): g-gram hashes, min per sliding window of w, guarantee that
any common substring of length ≥ w+g-1 yields a shared selected
fingerprint value — the "suffix-array pass" of the north rule, with
the same exact-substring semantics.  The production verify is the
batch shared-L-gram lexsort (hashing.shared_kgram_batch, LCS ≥ L ⟺
shared L-gram); the suffix-array + Kasai LCP exact-LCS kernel below
(numpy prefix-doubling) is kept as the independent brute-force TEST
oracle that pins that equivalence (tests/test_text_kernels.py,
tests/test_simhash_substring.py).
"""

from __future__ import annotations

import numpy as np

from .hashing import char_kgram_hashes

WINNOW_WINDOW = 8  # w; gram size g = L - w + 1, guarantee t = w + g - 1 = L


def winnow_fingerprints(text: str, min_len: int, window: int = WINNOW_WINDOW) -> np.ndarray:
    """uint64 fingerprint VALUES selected by winnowing.

    Guarantee: two texts sharing a verbatim substring of length
    ≥ min_len share at least one returned value (the shared window's
    minimum hash is selected in both).
    """
    g = min_len - window + 1
    h = char_kgram_hashes(text, g)
    if h.shape[0] == 0:
        return h
    if h.shape[0] <= window:
        return np.unique(h.min(keepdims=True))
    wins = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(wins.min(axis=1))


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence (prefix-doubling, O(n log n)
    with numpy lexsort)."""
    n = s.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.unique(s, return_inverse=True)[1].astype(np.int64)
    k = 1
    order = np.argsort(rank, kind="stable")
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            key2[:-k] = rank[k:]
        order = np.lexsort((key2, rank))
        changed = (rank[order][1:] != rank[order][:-1]) | (
            key2[order][1:] != key2[order][:-1]
        )
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.concatenate(([0], np.cumsum(changed)))
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order
        k *= 2


def _kasai_lcp(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP array: lcp[i] = common prefix of suffixes sa[i-1], sa[i]."""
    n = s.shape[0]
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def lcs_length(a: str, b: str) -> int:
    """Exact longest-common-substring length via suffix array + LCP on
    the sentinel-joined concatenation."""
    ab = a.encode("utf-8")
    bb = b.encode("utf-8")
    if not ab or not bb:
        return 0
    # ints: bytes shifted +2, sentinel 0 between (never matches)
    s = np.concatenate(
        [
            np.frombuffer(ab, dtype=np.uint8).astype(np.int64) + 2,
            np.array([0], dtype=np.int64),
            np.frombuffer(bb, dtype=np.uint8).astype(np.int64) + 2,
        ]
    )
    sa = suffix_array(s)
    lcp = _kasai_lcp(s, sa)
    na = len(ab)
    from_a = sa < na  # suffixes starting in a (sentinel belongs to neither)
    from_b = sa > na
    adjacent_cross = (from_a[1:] & from_b[:-1]) | (from_b[1:] & from_a[:-1])
    if not adjacent_cross.any():
        return 0
    return int(lcp[1:][adjacent_cross].max())
