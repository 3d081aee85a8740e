"""Winnowing fingerprints + NumPy cosine kernel (pdfspark/textops.py)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pdfspark.textops import kgram_hashes, numpy_topk_cosine, winnow


def test_kgram_count():
    assert len(kgram_hashes("abcdef", k=3)) == 4
    assert kgram_hashes("ab", k=3) == []


def test_kgram_rolling_matches_direct():
    text = "the quick brown fox"
    k = 5
    hs = kgram_hashes(text, k)
    # direct recompute of each k-gram
    for i, h in enumerate(hs):
        direct = 0
        for ch in text[i : i + k]:
            direct = (direct * 257 + ord(ch)) % ((1 << 61) - 1)
        assert h == direct


def test_winnow_deterministic_and_guarantee():
    a = "word " * 40 + "UNIQUE MARKER BLOCK " + "tail " * 40
    b = "other prefix " * 10 + "UNIQUE MARKER BLOCK " + "different tail " * 10
    fa, fb = set(winnow(a, 8, 6)), set(winnow(b, 8, 6))
    # the winnowing guarantee: a shared substring of length >= w+k-1
    # must share at least one fingerprint
    assert fa & fb
    assert winnow(a, 8, 6) == winnow(a, 8, 6)


def test_winnow_disjoint_texts_share_little():
    fa = set(winnow("aaaa bbbb cccc dddd " * 10, 8, 6))
    fb = set(winnow("wxyz qrst uvop mnkl " * 10, 8, 6))
    assert len(fa & fb) == 0


@settings(max_examples=50, deadline=None)
@given(st.text(min_size=0, max_size=200))
def test_winnow_never_raises_and_subsets_kgrams(text):
    fps = winnow(text, k=5, w=4)
    assert set(fps) <= set(kgram_hashes(text, 5)) or fps == []


def test_numpy_cosine_matches_scalar():
    rng = np.random.RandomState(42)
    q = np.rint(rng.randn(3, 16) * 1000)
    b = np.rint(rng.randn(20, 16) * 1000)
    cos = numpy_topk_cosine(q, b)
    for i in range(3):
        for j in range(20):
            expect = float(q[i] @ b[j]) / (
                np.sqrt(q[i] @ q[i]) * np.sqrt(b[j] @ b[j])
            )
            assert abs(cos[i, j] - expect) < 1e-12
