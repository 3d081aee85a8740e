"""Winnowing fingerprints + NumPy cosine kernel (pdfspark/textops.py)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pdfspark.textops import cosine_matrix, kgram_hashes, quantize_milli, round_half_up, winnow


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
    q = quantize_milli(rng.randn(3, 16))
    b = quantize_milli(rng.randn(20, 16))
    cos = cosine_matrix(q, b)
    for i in range(3):
        for j in range(20):
            expect = float(q[i] @ b[j]) / (
                np.sqrt(q[i] @ q[i]) * np.sqrt(b[j] @ b[j])
            )
            assert abs(cos[i, j] - expect) < 1e-12


def test_quantize_milli_floor_plus_half():
    # pinned scheme FLOOR(x*1000 + 0.5): half rounds toward +inf in BOTH
    # engines (the SQL sides use the same expression after the FLOAT32
    # lambda divergence found at sf0.1 — see quantize_milli docstring)
    assert quantize_milli([0.0005])[0] == 1.0
    assert quantize_milli([-0.0005])[0] == 0.0  # floor(-0.5 + 0.5) = 0
    assert quantize_milli([-0.0006])[0] == -1.0
    assert quantize_milli([0.0015])[0] == 2.0
    assert quantize_milli([0.6]).dtype == np.float64
    # the f32 landmine itself: 0.3195 stored as float32 widens to
    # 319.4999…e-3 in float64 — must quantize to 319, not 320
    assert quantize_milli([float(np.float32(0.3195))])[0] == 319.0


def test_round_half_up():
    assert round_half_up(0.1234565, 6) == 0.123457
    assert round_half_up(-0.1234565, 6) == -0.123457
    assert round_half_up(1.5, 0) == 2.0


def test_compression_ratio_signal_orders_text_quality():
    from pdfspark.textops import compression_ratio_bp

    repetitive = "spam ham " * 500
    import random
    rng = random.Random(7)
    noise = "".join(chr(rng.randint(33, 126)) for _ in range(4000))
    natural = ("the quick brown fox jumps over the lazy dog and then "
               "discusses compression behavior at length ") * 40
    r_rep = compression_ratio_bp(repetitive)
    r_nat = compression_ratio_bp(natural)
    r_noise = compression_ratio_bp(noise)
    assert r_rep < r_nat < r_noise
    assert compression_ratio_bp("") == 10000
    assert compression_ratio_bp(repetitive) == r_rep  # deterministic
