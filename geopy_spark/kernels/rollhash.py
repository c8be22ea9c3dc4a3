"""Shingle hashing shared by every dedup operator — vectorized numpy AND
DuckDB-twin expressible (north rule: vectorized pandas/Arrow UDFs, no
per-row Python; the SQL twin is what makes the near-dup oracles possible).

Design: a document is normalized to ``" ".join(text.lower().split())``;
word n-gram shingles are substrings of that normalized string.  Each
shingle is hashed with TWO independent polynomial rolling hashes over
Unicode codepoints,

    h_B,P(s) = sum_j (cp_j + 1) * B^(n-1-j)  mod P        (acc = acc*B + c)

combined as ``h = h1 * P2 + h2  (< 2^62)`` so collisions are ~1/4.6e18.
The numpy side computes ONE prefix-hash array per document and derives all
shingle hashes O(1) each (no per-shingle loops, no per-byte Python); the
DuckDB side evaluates the identical recurrence with ``list_reduce``.

The modular prefix trick: with Binv = B^-1 mod P,
    pre[i] = hash(norm[:i]) = B^(i-1) * cumsum(val_j * Binv^j)[i]  mod P
    hash(norm[l:r]) = (pre[r] - pre[l] * B^(r-l)) mod P
Every product of two residues < 2^31 fits uint64; the cumsum stays exact
for documents up to 2^33 codepoints (8 G — far beyond any real doc).
"""

from __future__ import annotations

import numpy as np

B1, P1 = 131, 2147483647   # 2^31 - 1
B2, P2 = 137, 2147483629   # prev prime

_POW_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _pows(B: int, P: int, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(B^i mod P, B^-i mod P) for i in [0, n] — grown geometrically and
    cached per process (one-time O(maxlen) cost, amortized across docs)."""
    cached = _POW_CACHE.get((B, P))
    if cached is not None and cached[0].size > n:
        return cached
    size = max(n + 1, 4096)
    if cached is not None:
        size = max(size, cached[0].size * 2)
    binv = pow(B, P - 2, P)
    pw = np.empty(size, dtype=np.uint64)
    ipw = np.empty(size, dtype=np.uint64)
    pw[0] = ipw[0] = 1
    b, bi, p = np.uint64(B), np.uint64(binv), np.uint64(P)
    for i in range(1, size):
        pw[i] = pw[i - 1] * b % p
        ipw[i] = ipw[i - 1] * bi % p
    _POW_CACHE[(B, P)] = (pw, ipw)
    return pw, ipw


def _substr_hashes(cp1: np.ndarray, l: np.ndarray, r: np.ndarray,
                   B: int, P: int) -> np.ndarray:
    """Rolling hashes of norm[l_i:r_i] for all i, via one prefix pass.
    ``cp1`` = codepoints + 1 (uint64); all shingles are non-empty."""
    n = cp1.size
    pw, ipw = _pows(B, P, n)
    p = np.uint64(P)
    g = cp1 % p * ipw[:n] % p
    s = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(g, out=s[1:])          # exact while n * 2^31 < 2^64
    s %= p
    pre = np.zeros(n + 1, dtype=np.uint64)
    pre[1:] = pw[:n] * s[1:] % p     # pre[i] = B^(i-1) * s[i]
    return (pre[r] + p - pre[l] * pw[r - l] % p) % p


_EMPTY_HASH = np.array([0], dtype=np.uint64)  # hash of "" is 0 in both rolls


def shingle_hashes(text, ngram: int = 3) -> np.ndarray:
    """Sorted unique 62-bit combined hashes of word n-gram shingles.
    Semantics: words = text.lower().split(); shingles = n-word joins
    (the whole word list if shorter than n; [""] for empty docs)."""
    words = str(text).lower().split()
    if not words:
        return _EMPTY_HASH
    norm = " ".join(words)
    cp1 = np.frombuffer(norm.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    cp1 += np.uint64(1)
    n = cp1.size
    if len(words) < ngram:
        l = np.zeros(1, dtype=np.int64)
        r = np.full(1, n, dtype=np.int64)
    else:
        spaces = np.flatnonzero(cp1 == np.uint64(33))  # ' ' + 1
        starts = np.concatenate(([0], spaces + 1))
        ends = np.concatenate((spaces, [n]))
        k = len(words) - ngram + 1
        l = starts[:k]
        r = ends[ngram - 1:]
    h1 = _substr_hashes(cp1, l, r, B1, P1)
    h2 = _substr_hashes(cp1, l, r, B2, P2)
    return np.unique(h1 * np.uint64(P2) + h2)


def hash_str62(s: str) -> int:
    """Scalar reference twin of the combined shingle hash (loop form) —
    used by tests to pin the vectorized kernel and the SQL generator."""
    a1 = a2 = 0
    for ch in s:
        c = ord(ch) + 1
        a1 = (a1 * B1 + c) % P1
        a2 = (a2 * B2 + c) % P2
    return a1 * P2 + a2


# ---------------------------------------------------------------------------
# DuckDB twin generators (the oracle side evaluates the same definitions)
# ---------------------------------------------------------------------------

def words_sql(text: str) -> str:
    """DuckDB: list of words == python str.lower().split() (ASCII input)."""
    return f"list_filter(string_split_regex(lower({text}), '\\s+'), w -> w <> '')"


def shingles_sql(words: str, ngram: int) -> str:
    """DuckDB: distinct word n-gram shingle strings from a word list."""
    joined = " || ' ' || ".join(f"{words}[i+{j}]" if j else f"{words}[i]"
                                for j in range(ngram))
    return (f"CASE WHEN len({words}) = 0 THEN ['']"
            f" WHEN len({words}) < {ngram} THEN [array_to_string({words}, ' ')]"
            f" ELSE list_distinct(list_transform("
            f"range(1, len({words}) - {ngram - 2}), i -> {joined})) END")


def shingle_hash_sql(s: str) -> str:
    """DuckDB: the identical 62-bit combined rolling hash of one string
    expression (list_reduce over codepoints; init prepended because
    DuckDB's reduce has no seed argument)."""
    def roll(B: int, P: int) -> str:
        return (f"list_reduce(list_prepend(0::BIGINT, "
                f"list_transform(range(1, length({s}) + 1), "
                f"i -> ascii(substr({s}, i, 1))::BIGINT + 1)), "
                f"(acc, c) -> (acc * {B} + c) % {P})")
    return f"({roll(B1, P1)} * {P2} + {roll(B2, P2)})"
