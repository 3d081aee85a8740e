"""normalize_for_pdf is the fused roundtrip's hottest synth-side block;
its C-level form (latin-1 encode(replace) + translate) must stay
byte-identical to the pinned per-char rule: '?' iff ord in _UNSAFE or
ord > 0xFF, everything else unchanged. A divergence here would silently
re-pin every PDF golden, so the equivalence is pinned exhaustively."""

import random

from pdfspark.docgen import _UNSAFE, normalize_for_pdf


def _reference_rule(text: str) -> str:
    return "".join(
        "?" if (ord(c) in _UNSAFE or ord(c) > 0xFF) else c for c in text
    )


_SWEEP_CPS = (
    list(range(0x300))
    + [0xFFF, 0xFFFF, 0x10000, 0x1F600, 0x10FFFF]
)


def test_normalize_matches_reference_rule_per_codepoint():
    for cp in _SWEEP_CPS:
        c = chr(cp)
        assert normalize_for_pdf(c) == _reference_rule(c), hex(cp)


def test_normalize_matches_reference_rule_on_mixed_strings():
    rng = random.Random(7)
    for _ in range(500):
        s = "".join(
            chr(rng.choice(_SWEEP_CPS))
            for _ in range(rng.randrange(0, 120))
        )
        assert normalize_for_pdf(s) == _reference_rule(s)


def test_normalize_never_raises_on_lone_surrogates():
    # errors="replace" maps unencodable surrogates to '?', same as the
    # reference rule's ord>0xFF arm — one bad document never kills the
    # job (kernel invariant).
    assert normalize_for_pdf("a\ud800b\udfffc") == "a?b?c"


def test_normalize_identity_on_printable_ascii():
    s = "The quick brown fox (1.5) [2] {3} jumps!"
    assert normalize_for_pdf(s) == s
