"""Geometry-aware layout analysis over the opt-in glyph positions
(kernel/extract.py GlyphPos) — the quality lever operator-order
linearization forecloses (VERDICT r2 "missing" #3): multi-column pages
whose content streams are written in VISUAL (row-major) order read as
interleaved garbage unless columns are reconstructed from x/y geometry.

The reference renders glyphs at positions and never linearizes
(`src/render/mod.rs:1273-1315`), so — like the base linearization policy
— the reading-order policy below is PINNED here and by its goldens:

1. Columns are maximal x-clusters: sort every glyph x on a page; a gap
   wider than ``col_gap`` (default 60pt ≈ 5× a 12pt space advance)
   between consecutive x values is a column boundary.
2. Within a column, glyphs group into lines by exact baseline y, lines
   read top-to-bottom (descending y, PDF device space), glyphs within a
   line left-to-right (ascending x, ties by text offset).
3. Kerned word breaks: within a line, a horizontal gap between the end
   of one glyph (x + w) and the start of the next wider than
   ``WORD_GAP_FRACTION`` × the line's median glyph advance reads as a
   word boundary (one space) — the case where writers position words by
   kerning with no space glyphs at all. Ordinary kern adjustments
   (±~0.1 em) sit far below the threshold; explicit space glyphs
   consume their own advance so no double space appears.
4. Lines join with a single space; columns (left-to-right) join with a
   single space; pages join with "\\f" (same separator as spans).

A single-column page degrades to the identity-ish transform (one
cluster, lines re-joined by spaces), so the function is safe to apply
corpus-wide.
"""

from __future__ import annotations

from typing import List

from pdfspark.kernel.extract import ExtractResult

COLUMN_GAP_PT = 60.0
# density mode (opt-in, layout="density"): a column boundary is an
# x-band no glyph on the page covers — the union of [x, x+w) coverage
# intervals leaves a hole — at least DENSITY_GUTTER_FRACTION × the
# page-median advance wide. Narrow/ragged gutters (e.g. 40pt, below the
# fixed 60pt policy) are found because word gaps on DIFFERENT lines sit
# at different x and fill each other's holes; a real gutter stays empty
# on every line. Pages with fewer than DENSITY_MIN_LINES baselines
# never split (a hole can't be evidenced by density there).
DENSITY_GUTTER_FRACTION = 1.5
# ≥2 baselines: a single line's kerned word gaps would read as holes
# (no vertical evidence to fill them); from two lines up, unaligned
# word gaps cover each other and only a true gutter stays empty
DENSITY_MIN_LINES = 2
# density-mode baseline clustering: y values within this fraction of
# the page-median advance merge into one line — super/subscript rises
# (~0.33em ≈ 0.65×median advance) merge, real leading (≥1em) never does
LINE_TOL_FRACTION = 0.8
# word boundary when inter-glyph gap > this fraction of the line's
# median glyph advance: a typographic space is ~0.25-0.33 em while
# median lowercase advances are ~0.5 em, so 0.35×median ≈ 0.18 em sits
# between kern-adjustment noise (≲0.12 em) and real inter-word gaps
WORD_GAP_FRACTION = 0.35


def reading_order_text(r: ExtractResult, col_gap: float = COLUMN_GAP_PT,
                       layout: str = "fixed") -> str:
    """Reconstruct reading order from ``r.glyph_positions`` (extract with
    ``positions=True``). Returns "" for error documents.

    ``layout``: "fixed" (the pinned default — column split at x-value
    gaps > ``col_gap``) or "density" (opt-in — split at x-bands the
    union of glyph coverage leaves empty; finds ragged/narrow gutters
    the fixed threshold misses, with its OWN goldens and oracle query —
    the default's goldens are untouched)."""
    if r.text is None:
        return ""
    if not r.glyph_positions:
        return r.text
    by_page: dict = {}
    for g in r.glyph_positions:
        by_page.setdefault(g.page, []).append(g)
    pages: List[str] = []
    for span in r.spans:
        glyphs = by_page.get(span.page, [])
        if not glyphs:
            pages.append(r.text[span.start:span.end])
            continue
        glyphs.sort(key=lambda g: g.offset)
        # glyph i's contributed text = [offset_i, offset_{i+1}) minus any
        # interpreter-inserted separators ("\n" between baselines, "\f"
        # between pages — geometry replaces both)
        slices = []
        for i, g in enumerate(glyphs):
            end = (glyphs[i + 1].offset if i + 1 < len(glyphs)
                   else span.end)
            slices.append(
                (g, r.text[g.offset:end].replace("\n", "").replace("\f", ""))
            )
        # 1. column boundaries: fixed x-gap policy, or coverage-hole
        # (density) policy under the opt-in flag
        if layout == "density":
            bounds = _density_bounds(glyphs)
        else:
            xs = sorted({round(g.x, 3) for g in glyphs})
            bounds = [
                (xs[i] + xs[i + 1]) / 2.0
                for i in range(len(xs) - 1)
                if xs[i + 1] - xs[i] > col_gap
            ]

        def col_of(x: float) -> int:
            c = 0
            for b in bounds:
                if x > b:
                    c += 1
            return c

        # 2. per column: lines by exact y (fixed) or y-clustered within
        # a baseline tolerance (density — superscripts/subscripts sit a
        # fraction of an em off the line and must not become their own
        # "line" above it), top-down, left-to-right
        columns: dict = {}
        for g, s in slices:
            columns.setdefault(col_of(g.x), {}).setdefault(
                round(g.y, 3), []
            ).append((g.x, g.offset, s, g.w))
        col_texts = []
        for c in sorted(columns):
            lines = columns[c]
            if layout == "density":
                lines = _cluster_lines(lines, glyphs)
            line_texts = [
                _assemble_line(sorted(lines[y]))
                for y in sorted(lines, reverse=True)
            ]
            col_texts.append(" ".join(t for t in line_texts if t))
        pages.append(" ".join(t for t in col_texts if t))
    return "\f".join(pages)


def _cluster_lines(lines: dict, glyphs: List) -> dict:
    """Density-mode baseline clustering: adjacent y values closer than
    LINE_TOL_FRACTION × the page-median advance merge into one line
    (keyed by the cluster's TOP y so ordering is unchanged). Real line
    leading (≥1em) sits far above the tolerance (~0.4em), while
    super/subscript rises (~0.33em) fall under it — so scripts join
    their line instead of becoming a phantom line above/below it."""
    if len(lines) < 2:
        return lines
    advances = sorted(g.w for g in glyphs if g.w > 0)
    if not advances:
        return lines
    tol = LINE_TOL_FRACTION * advances[len(advances) // 2]
    ys = sorted(lines, reverse=True)
    merged: dict = {}
    anchor = ys[0]
    merged[anchor] = list(lines[anchor])
    prev = anchor
    for y in ys[1:]:
        if prev - y <= tol:
            merged[anchor].extend(lines[y])
        else:
            anchor = y
            merged[anchor] = list(lines[y])
        prev = y
    return merged


def _density_bounds(glyphs: List) -> List[float]:
    """Column boundaries for layout="density": merge every glyph's
    [x, x+w) coverage interval; a hole between merged intervals wider
    than DENSITY_GUTTER_FRACTION × the page-median advance is a gutter
    (boundary at the hole's midpoint). Requires ≥ DENSITY_MIN_LINES
    CLUSTERED baselines — a single line's word gaps are
    indistinguishable from gutters without vertical evidence, and a
    super/subscript's raised baseline is part of its line, not a
    second line (it must not unlock splitting by itself)."""
    advances = sorted(g.w for g in glyphs if g.w > 0)
    if not advances:
        return []
    med = advances[len(advances) // 2]
    ys = sorted({round(g.y, 3) for g in glyphs}, reverse=True)
    n_lines, prev = 1, ys[0]
    for y in ys[1:]:
        if prev - y > LINE_TOL_FRACTION * med:
            n_lines += 1
        prev = y
    if n_lines < DENSITY_MIN_LINES:
        return []
    min_gutter = DENSITY_GUTTER_FRACTION * med
    ivals = sorted((g.x, g.x + max(g.w, 0.0)) for g in glyphs)
    merged: List[List[float]] = []
    for s, e in ivals:
        if merged and s <= merged[-1][1] + 1e-6:
            if e > merged[-1][1]:
                merged[-1][1] = e
        else:
            merged.append([s, e])
    return [
        (merged[i][1] + merged[i + 1][0]) / 2.0
        for i in range(len(merged) - 1)
        if merged[i + 1][0] - merged[i][1] > min_gutter
    ]


def _assemble_line(glyphs: List[tuple]) -> str:
    """Join one line's glyphs (sorted by x), inserting a space at kerned
    word boundaries (policy #3): gap = next.x − (cur.x + cur.w) wider
    than WORD_GAP_FRACTION × median advance ⇒ one space, unless a space
    is already there."""
    if not glyphs:
        return ""
    advances = sorted(w for _, _, _, w in glyphs if w > 0)
    median_w = advances[len(advances) // 2] if advances else 0.0
    threshold = WORD_GAP_FRACTION * median_w
    parts = [glyphs[0][2]]
    for i in range(1, len(glyphs)):
        x, _, s, _ = glyphs[i]
        px, _, ps, pw = glyphs[i - 1]
        gap = x - (px + pw)
        if (threshold > 0 and gap > threshold
                and not ps.endswith(" ") and not s.startswith(" ")):
            parts.append(" ")
        parts.append(s)
    return "".join(parts)
