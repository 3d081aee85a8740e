"""Affine matrices, graphics state, and text state (SURVEY.md §2A.5 T1-T12,
G1-G3).

Behavioral model: reference `src/render/text_state.rs:6-124` (the 8 text
parameters) and `src/data_structures/matrix.rs:17-41`. NOTE: the
reference's matrix ``Mul`` composes translations nonstandardly (its own
comment flags this, `matrix.rs:35-37`); per SURVEY.md §7 hard-part (2) we
implement the CORRECT affine product — the spec prevails, and our goldens
define the oracle.

A matrix [a b c d e f] maps (x,y) → (a·x + c·y + e, b·x + d·y + f).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

Matrix = Tuple[float, float, float, float, float, float]

IDENTITY: Matrix = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def mat_mul(m: Matrix, n: Matrix) -> Matrix:
    """Correct affine product m∘n: apply m first, then n (row-vector
    convention used throughout PDF: x' = x·M)."""
    a1, b1, c1, d1, e1, f1 = m
    a2, b2, c2, d2, e2, f2 = n
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def translate(tx: float, ty: float) -> Matrix:
    return (1.0, 0.0, 0.0, 1.0, tx, ty)


def apply(m: Matrix, x: float, y: float) -> Tuple[float, float]:
    a, b, c, d, e, f = m
    return (a * x + c * y + e, b * x + d * y + f)


class TextState:
    """Tc/Tw/Tz/TL/Tf/Tr/Ts + Tm/Tlm (reference:
    `src/render/text_state.rs:6-124`)."""

    __slots__ = (
        "char_spacing", "word_spacing", "h_scale", "leading", "font",
        "font_size", "render_mode", "rise", "tm", "tlm",
    )

    def __init__(self) -> None:
        self.char_spacing = 0.0  # Tc
        self.word_spacing = 0.0  # Tw
        self.h_scale = 1.0       # Tz (stored /100)
        self.leading = 0.0       # TL
        self.font = None         # resolved Font object
        self.font_size = 0.0     # Tf size
        self.render_mode = 0     # Tr
        self.rise = 0.0          # Ts
        self.tm: Matrix = IDENTITY
        self.tlm: Matrix = IDENTITY

    def begin_text(self) -> None:
        """BT: Tm = Tlm = I (`src/render/mod.rs:1037-1041`)."""
        self.tm = IDENTITY
        self.tlm = IDENTITY

    def td(self, tx: float, ty: float) -> None:
        """Td: Tlm = translate(tx,ty) · Tlm; Tm = Tlm
        (`src/render/mod.rs:1084-1094`)."""
        self.tlm = mat_mul(translate(tx, ty), self.tlm)
        self.tm = self.tlm

    def next_line(self) -> None:
        """T*: Td(0, -TL) (`src/render/mod.rs:525-533`)."""
        self.td(0.0, -self.leading)

    def set_tm(self, coeffs) -> None:
        """Tm: Tm = Tlm = coeffs (`src/render/mod.rs:1525-1539`)."""
        m = tuple(float(x) for x in coeffs[:6])
        self.tm = m  # type: ignore[assignment]
        self.tlm = m  # type: ignore[assignment]

    def advance(self, tx: float) -> None:
        """Post-glyph advance: Tm = translate(tx, 0) · Tm
        (`src/render/mod.rs:1273-1315`)."""
        self.tm = mat_mul(translate(tx, 0.0), self.tm)

    def advance_v(self, ty: float) -> None:
        """Vertical-mode post-glyph advance (writing mode 1): the
        displacement runs along −y in text space, so Tm = translate(0,
        ty) · Tm with ty normally negative (PDF 32000 9.4.4; the
        reference carries the V CMap variants — `src/font/cjk.rs:1-190`
        — but its renderer never applies vertical displacement)."""
        self.tm = mat_mul(translate(0.0, ty), self.tm)


class GraphicsState:
    """CTM + the text-relevant subset of the full graphics state
    (`src/render/mod.rs:1350-1382`)."""

    __slots__ = ("ctm",)

    def __init__(self, ctm: Matrix = IDENTITY) -> None:
        self.ctm = ctm

    def copy(self) -> "GraphicsState":
        return GraphicsState(self.ctm)
