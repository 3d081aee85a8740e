"""Kernel-side text/vector operators that aren't SQL-expressible:
winnowing fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD 2003) and a NumPy
brute-force ANN over a broadcast matrix (the vectorized-Pandas-UDF path
the SQL higher-order version trades against).
"""

from __future__ import annotations

from typing import List

_MOD = (1 << 61) - 1
_BASE = 257


def kgram_hashes(text: str, k: int = 5) -> List[int]:
    """Polynomial rolling hashes of every k-gram (O(n))."""
    n = len(text)
    if n < k:
        return []
    h = 0
    pow_k = pow(_BASE, k - 1, _MOD)
    out = []
    for i, ch in enumerate(text):
        h = (h * _BASE + ord(ch)) % _MOD
        if i >= k - 1:
            out.append(h)
            h = (h - ord(text[i - k + 1]) * pow_k) % _MOD
    return out


def winnow(text: str, k: int = 5, w: int = 4) -> List[int]:
    """Winnowing: in every window of w consecutive k-gram hashes keep the
    minimum (rightmost on ties), dedup consecutive selections. Guarantees
    any match of length ≥ w+k-1 shares a fingerprint."""
    hs = kgram_hashes(text, k)
    if not hs:
        return []
    if len(hs) <= w:
        return [min(hs)]
    out = []
    last_idx = -1
    for start in range(len(hs) - w + 1):
        window = hs[start : start + w]
        m = min(window)
        # rightmost minimum
        idx = start + max(i for i, v in enumerate(window) if v == m)
        if idx != last_idx:
            out.append(m)
            last_idx = idx
    return out


def quantize_milli(x):
    """FLOOR(x*1000 + 0.5) in float64 — the ONE quantization every
    engine agrees on (pinned policy, CLAUDE.md). ROUND diverges two
    ways: half-even vs half-up on exact ties, and DuckDB evaluates list
    lambdas in the element type (FLOAT32), where e.g. 0.3195f*1000 IS
    exactly 319.5 while float64 gives 319.4999… — so both the SQL sides
    cast to DOUBLE first and use FLOOR(+0.5), and so does this."""
    import numpy as np

    arr = np.asarray(x, dtype=np.float64) * 1000.0
    return np.floor(arr + 0.5)


def round_half_up(x: float, digits: int = 6) -> float:
    """SQL-compatible ROUND (half away from zero); Python's built-in
    round() is half-to-even."""
    import math

    scale = 10 ** digits
    return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale


def cosine_matrix(query_mat, base_mat):
    """Dense pairwise cosine: one (Q, D) @ (D, N) matmul. Inputs are
    integer-quantized (quantize_milli) so scores are exact and ranking
    matches the SQL/DuckDB formulation bit-for-bit. Callers rank/truncate."""
    import numpy as np

    q = query_mat.astype(np.float64)
    b = base_mat.astype(np.float64)
    dots = q @ b.T
    qn = np.sqrt((q * q).sum(axis=1))[:, None]
    bn = np.sqrt((b * b).sum(axis=1))[None, :]
    return dots / (qn * bn)


def minhash_band_sigs(text: str, n_hashes: int = 8, band_width: int = 2):
    """MinHash band signatures, ENGINE-EXACT with the DuckDB oracle SQL:
    shingle = distinct word 3-grams of ``text.split(' ')``; per seed i the
    minhash is MIN over shingles of md5(f"{i}:{shingle}") hex; bands are
    consecutive pairs, signature = sorted hex digests joined by ','.

    Returns [(band_index, sig), ...] — empty when the doc has <3 words.
    One md5 context per seed is pre-hashed and copy()d per shingle (same
    digests, ~35% fewer bytes hashed than re-feeding the prefix)."""
    import hashlib

    words = text.split(" ")
    shingles = {
        f"{a} {b} {c}".encode("utf-8")
        for a, b, c in zip(words, words[1:], words[2:])
    }
    if not shingles:
        return []
    mins = []
    for i in range(n_hashes):
        ctx = hashlib.md5(f"{i}:".encode("ascii"))
        best = None
        for s in shingles:
            c = ctx.copy()
            c.update(s)
            d = c.hexdigest()
            if best is None or d < best:
                best = d
        mins.append(best)
    return [
        (b, ",".join(sorted(mins[b * band_width:(b + 1) * band_width])))
        for b in range(n_hashes // band_width)
    ]


def compression_ratio_bp(text: str) -> int:
    """zlib-compressed size as basis points of the raw utf-8 size — the
    CCNet-style repetition/garbage signal (highly repetitive text
    compresses far below ~4000bp; random noise sits near 10000+)."""
    import math
    import zlib

    raw = text.encode("utf-8")
    if not raw:
        return 10000
    comp = zlib.compress(raw, 6)
    return int(math.floor(len(comp) * 10000.0 / len(raw) + 0.5))
