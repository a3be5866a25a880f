"""Shared brute-force oracles for tests."""

from __future__ import annotations

import numpy as np


def random_seqs(rng, n_seqs, min_len=20, max_len=200, sigma=6):
    """Random rank sequences using symbols 1..sigma-1 (0 is the sentinel)."""
    return [
        rng.integers(1, sigma, rng.integers(min_len, max_len + 1)).astype(np.uint8)
        for _ in range(n_seqs)
    ]


def brute_exact_hits(seqs: list[np.ndarray], query: np.ndarray) -> set[tuple[int, int]]:
    """All (seqId, pos) where query occurs exactly."""
    out = set()
    q = bytes(query)
    for sid, s in enumerate(seqs):
        hay = bytes(np.asarray(s, dtype=np.uint8))
        start = hay.find(q)
        while start != -1:
            out.add((sid, start))
            start = hay.find(q, start + 1)
    return out


def edit_distance_prefix(query: np.ndarray, text: np.ndarray) -> np.ndarray:
    """dp[j] = min edit distance between full query and text[0:j]."""
    m, n = len(query), len(text)
    prev = np.arange(n + 1)
    for i in range(1, m + 1):
        cur = np.empty(n + 1, dtype=np.int64)
        cur[0] = i
        for j in range(1, n + 1):
            cost = 0 if query[i - 1] == text[j - 1] else 1
            cur[j] = min(prev[j - 1] + cost, prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return prev


def brute_edit_hits_minimal(
    seqs: list[np.ndarray], query: np.ndarray, k: int, return_err: bool = False
):
    """All (seqId, pos) where some substring starting at pos is within edit
    distance k of the query under the *minimal-span* rule: the aligned text
    span must not begin or end with a deleted character (query insertions at
    the ends are allowed).  This is the engine's documented hit contract.

    ``return_err=True`` returns {(seqId, pos): minimal distance} instead."""
    errs: dict = {}
    out = set()
    m = len(query)
    inf = 10**9
    for sid, s in enumerate(seqs):
        s = np.asarray(s, dtype=np.uint8)
        for p in range(len(s)):
            w = s[p : p + m + k]
            nw = len(w)
            if nw == 0:
                continue
            # A[i][j]: align query[0:i] to w[0:j]; w[0] consumed by match/sub
            a = np.full((m + 1, nw + 1), inf, dtype=np.int64)
            b = np.full((m + 1, nw + 1), inf, dtype=np.int64)
            for i in range(m + 1):
                a[i][0] = i
            for i in range(1, m + 1):
                sub0 = 0 if query[i - 1] == w[0] else 1
                a[i][1] = min(a[i - 1][0] + sub0, a[i - 1][1] + 1)
                for j in range(2, nw + 1):
                    sub = 0 if query[i - 1] == w[j - 1] else 1
                    a[i][j] = min(a[i - 1][j - 1] + sub, a[i - 1][j] + 1, a[i][j - 1] + 1)
            # B[i][j]: additionally w[j-1] consumed by match/sub
            for i in range(1, m + 1):
                for j in range(1, nw + 1):
                    sub = 0 if query[i - 1] == w[j - 1] else 1
                    b[i][j] = min(a[i - 1][j - 1] + sub, b[i - 1][j] + 1)
            d = int(min(b[m][1:]))
            if d <= k:
                out.add((sid, p))
                errs[(sid, p)] = d
    return errs if return_err else out


def brute_approx_hits(
    seqs: list[np.ndarray], query: np.ndarray, k: int, hamming: bool = False,
    return_err: bool = False,
):
    """All (seqId, pos) where some substring starting at pos is within
    distance k of the query (edit or Hamming).  ``return_err=True`` returns
    {(seqId, pos): minimal distance} instead."""
    errs: dict = {}
    out = set()
    m = len(query)
    for sid, s in enumerate(seqs):
        s = np.asarray(s, dtype=np.uint8)
        for p in range(len(s)):
            if hamming:
                if p + m <= len(s):
                    d = int(np.sum(s[p : p + m] != query))
                    if d <= k:
                        out.add((sid, p))
                        errs[(sid, p)] = d
            else:
                window = s[p : p + m + k]
                dp = edit_distance_prefix(query, window)
                d = int(dp.min())
                if d <= k:
                    out.add((sid, p))
                    errs[(sid, p)] = d
    return errs if return_err else out
