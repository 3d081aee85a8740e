"""Golden end-to-end: every fixture case must produce byte-identical text
(SURVEY.md §5 plan #3; this is the corpus-regression suite the reference
lacks in-tree — the pinned policy in pdfspark/kernel/extract.py defines the
oracle)."""

import pytest

from pdfspark.corpus import all_cases
from pdfspark.kernel.extract import extract_text

CASES = all_cases()


@pytest.mark.parametrize("case", CASES, ids=[c.case_id for c in CASES])
def test_golden(case):
    r = extract_text(case.pdf)
    assert r.text == case.expected_text, f"text mismatch for {case.case_id}"
    if case.expected_error is None:
        assert r.error is None, f"unexpected error {r.error} for {case.case_id}"
    else:
        assert r.error == case.expected_error
    assert r.n_pages == case.expected_pages
    if case.expected_annots is not None:
        assert r.annots == case.expected_annots, case.case_id


def test_determinism():
    """Two generations + two extractions are bit-identical."""
    a = {c.case_id: c.pdf for c in all_cases()}
    b = {c.case_id: c.pdf for c in all_cases()}
    assert a == b
    for cid, pdf in a.items():
        assert extract_text(pdf) == extract_text(pdf)


def test_spans_partition_text():
    giant = next(c for c in CASES if c.case_id == "t25_giant_doc")
    r = extract_text(giant.pdf)
    assert len(r.spans) == r.n_pages == giant.expected_pages
    # spans tile the document text exactly, separated by \f
    for i, sp in enumerate(r.spans):
        assert sp.page == i
        page_text = r.text[sp.start : sp.end]
        assert "\f" not in page_text
        if i + 1 < len(r.spans):
            assert r.text[sp.end] == "\f"
            assert r.spans[i + 1].start == sp.end + 1
    assert r.spans[-1].end == len(r.text)


def test_utf16_title_and_lang_metadata():
    case = next(c for c in CASES if c.case_id == "t36_utf16_title_lang")
    r = extract_text(case.pdf)
    assert r.text == "titled"
    assert r.title == "Grüße 😀"
    assert r.created == "2024-02-15T10:30:00"
    assert r.lang == "de-DE"


def test_glyph_positions_on_kerned_fixture():
    """Opt-in geometry (reference Trm semantics, `src/render/mod.rs:
    1273-1315`) on t12's TJ-kerned show: x advances by Helvetica AFM
    width·size/1000 per glyph, kern numbers shift by −n/1000·size, and
    the default batched path stays position-free AND text-identical."""
    case = next(c for c in CASES if c.case_id == "t12_tj_kerning")
    r = extract_text(case.pdf, positions=True)
    assert r.text == "ABCD"
    gp = r.glyph_positions
    assert [p.offset for p in gp] == [0, 1, 2, 3]
    assert all(p.page == 0 for p in gp)
    assert all(p.y == pytest.approx(720.0) for p in gp)
    # Td 72 720; Helvetica widths A=667 B=667 C=722 at size 12
    xs = [p.x for p in gp]
    assert xs[0] == pytest.approx(72.0)
    assert xs[1] == pytest.approx(72.0 + 667 * 0.012 + 120 * 0.012)  # kern -120
    assert xs[2] == pytest.approx(xs[1] + 667 * 0.012 - 500 * 0.012)  # kern 500
    assert xs[3] == pytest.approx(xs[2] + 722 * 0.012)
    # default path: no positions, identical text
    r0 = extract_text(case.pdf)
    assert r0.glyph_positions is None and r0.text == r.text


def test_glyph_positions_match_text_across_corpus():
    """Every golden with text: the per-glyph path must emit IDENTICAL
    text to the batched path (the geometry option can never change the
    pinned linearization), offsets strictly increasing and in range."""
    for case in CASES:
        r0 = extract_text(case.pdf)
        r1 = extract_text(case.pdf, positions=True)
        assert r1.text == r0.text, case.case_id
        assert r1.spans == r0.spans, case.case_id
        if r1.glyph_positions:
            offs = [p.offset for p in r1.glyph_positions]
            assert offs == sorted(offs), case.case_id
            assert 0 <= offs[0] and offs[-1] < len(r1.text or " "), case.case_id


def test_two_column_reading_order_reconstruction():
    """The layout-analysis policy (kernel/layout.py): a two-column page
    written in visual (row-major) order must reconstruct to reading
    order byte-identically; plain operator-order extraction interleaves
    the columns (which is exactly why the operator exists)."""
    from pdfspark.docgen import text_to_pdf_two_column
    from pdfspark.kernel.layout import reading_order_text

    text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    pdf = text_to_pdf_two_column(text, meta_id=7)
    r = extract_text(pdf, positions=True)
    assert reading_order_text(r) == text
    assert r.text != text  # operator order interleaves the columns
    # column 1 holds the first half in order, column 2 the second
    assert r.text.split("\n")[0].startswith("alpha beta gamma")
    # single-column docs degrade to the same word sequence
    single = extract_text(
        __import__("pdfspark.docgen", fromlist=["text_to_pdf"])
        .text_to_pdf("one two three", meta_id=1),
        positions=True,
    )
    assert reading_order_text(single) == "one two three"
    # error/empty results never raise
    from pdfspark.kernel.extract import ExtractResult

    assert reading_order_text(ExtractResult(None, [], 0, "xref", None)) == ""


def test_vertical_reading_order_reconstruction():
    """Vertical writing mode (VERDICT r5 next #4): an Identity-V page
    stacks glyphs DOWN the page (extract.py policy #7) with columns
    written left-to-right in the stream — the reverse of CJK reading
    order. layout='vertical' (columns right-to-left, baselines
    top-down, no joining whitespace) must restore the transliterated
    source byte-identically; plain linearization provably returns the
    columns back-to-front."""
    from pdfspark.docgen import _ASCII_TO_CJK, text_to_pdf_vertical
    from pdfspark.kernel.layout import reading_order_text

    text = ("the fast key order sort table scan merge part window small "
            "hash scan join order batch value line agg row")
    expected = text.translate(_ASCII_TO_CJK)
    r = extract_text(text_to_pdf_vertical(text, meta_id=9), positions=True)
    assert r.error is None
    assert reading_order_text(r, layout="vertical") == expected
    # operator order is column-reversed — the case layout must solve
    assert r.text != expected
    assert r.text.replace("\n", "") == "".join(
        expected[j * 40:(j + 1) * 40]
        for j in reversed(range((len(expected) + 39) // 40))
    )
    # ≤ one column degrades to identity under both orders
    short = extract_text(text_to_pdf_vertical("abc def", meta_id=1),
                         positions=True)
    exp2 = "abc def".translate(_ASCII_TO_CJK)
    assert reading_order_text(short, layout="vertical") == exp2
    assert short.text == exp2
    # spaces come only from space glyphs: every source space survived
    assert expected.count(" ") == \
        reading_order_text(r, layout="vertical").count(" ")
    # error documents never raise
    from pdfspark.kernel.extract import ExtractResult

    assert reading_order_text(
        ExtractResult(None, [], 0, "xref", None), layout="vertical") == ""


def test_vertical_w2_per_cid_metrics():
    """Per-CID /W2 vertical metrics (r7, VERDICT r6 missing #2): the
    W2 generator gives hanzi-'a' w1y=−2000 (triple form) and 'f'–'h'
    w1y=−1500 (range form) over an explicit /DW2 of −1000. Decoded
    TEXT must match the uniform generator byte-for-byte (W2 moves
    glyphs, never reorders), while the per-glyph GEOMETRY must show
    24pt / 18pt / 12pt baseline drops at 12pt Tf — the divergence a
    uniform-/DW2 kernel provably cannot reproduce."""
    from pdfspark.docgen import (_ASCII_TO_CJK, VERT_W2_OVERRIDES,
                                 text_to_pdf_vertical,
                                 text_to_pdf_vertical_w2)
    from pdfspark.kernel.layout import reading_order_text

    text = "fast half width glyphs advance far"
    expected = text.translate(_ASCII_TO_CJK)
    assert len(expected) <= 40  # single column: stream order = reading
    r = extract_text(text_to_pdf_vertical_w2(text, meta_id=11),
                     positions=True)
    assert r.error is None
    assert r.text == expected
    assert reading_order_text(r, layout="vertical") == expected
    # text identical to the uniform generator...
    ru = extract_text(text_to_pdf_vertical(text, meta_id=11),
                      positions=True)
    assert ru.text == r.text
    # ...geometry not: consecutive y-drops follow the per-CID w1y
    pos = sorted(r.glyph_positions, key=lambda g: g.offset)
    upos = sorted(ru.glyph_positions, key=lambda g: g.offset)
    diverged = 0
    for k in range(len(expected) - 1):
        w1y = VERT_W2_OVERRIDES.get(ord(expected[k]), -1000.0)
        want = -w1y / 1000.0 * 12.0
        got = pos[k].y - pos[k + 1].y
        assert abs(got - want) < 1e-6, (k, expected[k], got, want)
        ugot = upos[k].y - upos[k + 1].y
        assert abs(ugot - 12.0) < 1e-6
        if abs(got - ugot) > 1e-6:
            diverged += 1
    # the fixture genuinely exercises both W2 entry forms
    assert diverged >= 3
    # batched path (positions=False) re-decodes per-glyph for W2 fonts
    # and takes n_glyphs from that SAME decode (ADVICE r7) — text must
    # match the glyph-by-glyph path byte-for-byte
    rb = extract_text(text_to_pdf_vertical_w2(text, meta_id=11))
    assert rb.error is None and rb.text == expected
    assert any(VERT_W2_OVERRIDES.get(ord(c)) == -2000.0 for c in expected)
    assert any(VERT_W2_OVERRIDES.get(ord(c)) == -1500.0 for c in expected)
    # parse-level unit: both entry forms + malformed tails degrade
    from pdfspark.kernel.fonts import _parse_cid_v_metrics

    class _D:
        resolve = staticmethod(lambda x: x)

    assert _parse_cid_v_metrics(_D, [5, [-2000, 0, 880, -900, 0, 880],
                                     10, 12, -1500, 0, 880]) == {
        5: -2000.0, 6: -900.0, 10: -1500.0, 11: -1500.0, 12: -1500.0}
    # trailing partial triple ignored; junk head returns empty
    assert _parse_cid_v_metrics(_D, [5, [-2000, 0]]) == {}
    assert _parse_cid_v_metrics(_D, ["x"]) == {}
    assert _parse_cid_v_metrics(_D, None) == {}
    # range form with a truncated tail stops cleanly
    assert _parse_cid_v_metrics(_D, [10, 12, -1500]) == {}


def test_page_labels_number_tree():
    """/PageLabels (r7; the reference parses the catalog field +
    number tree but renders nothing from it): roman front matter,
    /St-offset prefixed decimals, a bare-prefix range, and a /Kids
    split all resolve to one label per page; docs without the tree
    keep page_labels None; degenerate trees degrade, never raise."""
    from pdfspark.docgen import (PAGE_LABELS_TREE, text_to_pdf,
                                 text_to_pdf_multipage)
    from pdfspark.kernel.extract import _label_number

    tree = PAGE_LABELS_TREE
    text = "six pages of body text here " * 26  # > 5 pages @120 chars
    r = extract_text(text_to_pdf_multipage(
        text, page_chars=120, page_labels=tree))
    assert r.error is None and r.n_pages >= 5
    labels = r.page_labels.split("\n")
    assert len(labels) == r.n_pages
    assert labels[:5] == ["i", "ii", "A-5", "A-6", "cover"]
    assert all(lab == "cover" for lab in labels[4:])
    # no tree → None (labels are implicitly 1-based page numbers)
    assert extract_text(text_to_pdf("hello")).page_labels is None
    # missing index 0: uncovered leading pages label "", not raise
    r2 = extract_text(text_to_pdf_multipage(
        text, page_chars=120,
        page_labels=b"<< /Nums [2 << /S /A >>] >>"))
    assert r2.error is None
    l2 = r2.page_labels.split("\n")
    assert l2[:4] == ["", "", "A", "B"]
    # malformed tree value → whole surface degrades to None
    r3 = extract_text(text_to_pdf_multipage(
        text, page_chars=120, page_labels=b"<< /Nums [(x)] >>"))
    assert r3.error is None and r3.page_labels is None
    # style arithmetic units: roman, double-letter alpha, out-of-domain
    assert _label_number("R", 1999) == "MCMXCIX"
    assert _label_number("r", 4) == "iv"
    assert [_label_number("A", v) for v in (1, 26, 27, 28, 53)] == [
        "A", "Z", "AA", "BB", "AAA"]
    assert _label_number("a", 27) == "aa"
    assert _label_number("D", 7) == "7"
    assert _label_number("R", 0) == "0"          # < 1: decimal
    assert _label_number("r", 200_001) == "200001"  # absurd: decimal
    assert _label_number("Z", 7) == "7"          # unknown style


def test_outline_destination_resolution():
    """Outline destinations resolve to 0-based page indices through
    all three forms — explicit /Dest array, catalog /Dests name, GoTo
    action string through the /Names /Dests tree (r7; the reference
    parses destinations, src/destination.rs, but never resolves
    them); outlines_text itself stays the pinned pre-r7 surface.
    Degenerate destinations yield -1, never raise."""
    from pdfspark.docgen import text_to_pdf, text_to_pdf_multipage

    text = "pages of outline navigation text here " * 20
    r = extract_text(text_to_pdf_multipage(
        text, page_chars=60, outline_dests=[
            ("a", 0), ("b", 3), ("c", 7), ("d", 1), ("e", 5)]))
    assert r.error is None
    assert r.outlines == "a\nb\nc\nd\ne"
    assert r.outline_pages == "0\n3\n7\n1\n5"
    # forms cycle k%3: d (k=3) is explicit again, e (k=4) named
    # out-of-range targets clamp generator-side; resolution still lands
    r2 = extract_text(text_to_pdf_multipage(
        text, page_chars=60, outline_dests=[("z", 999)]))
    assert r2.outline_pages == str(r2.n_pages - 1)
    # titles without dests (the legacy pdf_annot fixture shape) -> -1
    r3 = extract_text(text_to_pdf(
        "hello", outline_titles=["ch1", "ch2"]))
    assert r3.outlines == "ch1\nch2"
    assert r3.outline_pages == "-1\n-1"
    # no outlines at all -> both columns None
    r4 = extract_text(text_to_pdf("hello"))
    assert r4.outlines is None and r4.outline_pages is None
    # degenerate destination resolution units
    from pdfspark.kernel.document import PdfDocument
    from pdfspark.kernel.extract import _dest_page_index
    from pdfspark.kernel.objects import Name

    doc = PdfDocument(text_to_pdf("hello"))
    idx = {3: 0}
    assert _dest_page_index(doc, None, idx, 1) is None
    assert _dest_page_index(doc, [], idx, 1) is None
    assert _dest_page_index(doc, Name("nope"), idx, 1) is None  # dangling
    assert _dest_page_index(doc, [7], idx, 1) is None  # int out of range
    assert _dest_page_index(doc, [0], idx, 1) == 0  # remote-style int
    assert _dest_page_index(doc, {"D": [0, Name("Fit")]}, idx, 1) == 0
    assert _dest_page_index(doc, 42, idx, 1) is None  # junk type
    # bool is an int subclass — /Dest [true] must NOT resolve as page 1
    assert _dest_page_index(doc, [True], idx, 1) is None
    assert _dest_page_index(doc, [False], idx, 1) is None
    # crafted unbounded /D-dict nesting terminates (indirection bound),
    # it must not recurse the doc into an error row
    deep: dict = {"D": [0, Name("Fit")]}
    for _ in range(500):
        deep = {"D": deep}
    assert _dest_page_index(doc, deep, idx, 1) is None


def test_reading_order_never_raises_across_corpus():
    """Layout reconstruction must be total: every golden (including
    error documents, empty pages, multi-page docs) flows through
    reading_order_text without raising, and single-cluster pages keep
    their word sequence."""
    from pdfspark.kernel.layout import reading_order_text

    for case in CASES:
        r = extract_text(case.pdf, positions=True)
        out = reading_order_text(r)
        assert isinstance(out, str), case.case_id
        if r.text is not None and r.glyph_positions:
            # same multiset of non-space characters (separators may
            # lawfully change between \n/space under the layout policy)
            assert sorted(out.replace(" ", "").replace("\f", "")) == \
                sorted((r.text or "").replace(" ", "").replace("\n", "")
                       .replace("\f", "")), case.case_id


def test_kerned_wordbreak_reconstruction():
    """Word-break policy (kernel/layout.py #3): words positioned by TJ
    kerns with no space glyphs glue together under the pinned
    linearization but reconstruct with spaces from glyph gaps; ordinary
    kern adjustments (t12's ±0.12/0.5 em) stay below the threshold so
    'ABCD' is NOT broken apart."""
    from pdfspark.docgen import text_to_pdf_kerned
    from pdfspark.kernel.layout import reading_order_text

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    r = extract_text(text_to_pdf_kerned(text, meta_id=3), positions=True)
    assert " " not in (r.text or " ").replace("\n", "")  # really glued
    assert reading_order_text(r) == text
    # t12 policy guard: kern adjustments must not become spaces
    t12 = next(c for c in CASES if c.case_id == "t12_tj_kerning")
    r12 = extract_text(t12.pdf, positions=True)
    assert reading_order_text(r12) == "ABCD"


def test_two_column_ragged_margins_still_reconstruct():
    """Ragged column edges (variable words per line) shrink the
    inter-column gap; the x-multiset splitter must still find it as long
    as no line crosses the gutter."""
    from pdfspark.docgen import text_to_pdf_two_column
    from pdfspark.kernel.extract import extract_text as _et
    from pdfspark.kernel.layout import reading_order_text

    words = [f"w{i}" for i in range(40)]
    text = " ".join(words)
    # words_per_line 1..3 produces strongly ragged right edges
    for wpl in (1, 2, 3):
        pdf = text_to_pdf_two_column(text, meta_id=wpl, words_per_line=wpl)
        r = _et(pdf, positions=True)
        assert reading_order_text(r) == text, f"wpl={wpl}"


def test_cjk_kerned_wordbreak_requires_embedded_metrics():
    """FN11 upgrade: GBK-EUC-H + TJ-kern-positioned hanzi words with
    /DW 1500 and a FontFile2 carrying non-uniform hmtx advances. With
    embedded metrics, word-break recovery is byte-identical; WITHOUT
    the program (negative path) the /DW fallback inflates the median
    advance past the inter-word kern and no spaces come back — pinning
    that the oracle really exercises the hmtx path."""
    from pdfspark.docgen import _ASCII_TO_CJK, text_to_pdf_cjk_kerned
    from pdfspark.kernel.layout import reading_order_text

    text = "the fast key order sort table scan merge part window"
    expected = text.translate(_ASCII_TO_CJK)
    r = extract_text(text_to_pdf_cjk_kerned(text, meta_id=3),
                     positions=True)
    assert r.error is None
    assert reading_order_text(r) == expected
    assert " " not in r.text  # kerns insert nothing in content order
    neg = extract_text(
        text_to_pdf_cjk_kerned(text, meta_id=3, embed_metrics=False),
        positions=True,
    )
    assert neg.error is None
    neg_out = reading_order_text(neg)
    assert neg_out != expected
    # only LINE-join separators survive (policy #4); the 9 intra-line
    # word breaks are unrecoverable under the uniform /DW fallback
    assert neg_out.count(" ") < expected.count(" ")


def test_density_columns_narrow_gutter():
    """layout='density' (opt-in; VERDICT r3 next #5): a ragged
    two-column page with a 40pt gutter — below the pinned fixed 60pt
    threshold — reconstructs byte-identically under density clustering,
    while the fixed default (goldens untouched) cannot split it.
    Density never splits SINGLE-baseline pages (DENSITY_MIN_LINES = 2
    — one line's word gaps carry no vertical evidence) and behaves as
    a no-op on single-column flow."""
    from pdfspark.docgen import text_to_pdf, text_to_pdf_narrow_gutter
    from pdfspark.kernel.layout import reading_order_text

    text = ("the fast key order sort table scan merge part window "
            "small hash scan join order batch value line agg row")
    r = extract_text(text_to_pdf_narrow_gutter(text, meta_id=2),
                     positions=True)
    assert r.error is None
    assert reading_order_text(r, layout="density") == text
    assert reading_order_text(r) != text  # fixed policy can't see 40pt
    # plain single-column flow: density is a no-op (byte-identical)
    plain = extract_text(text_to_pdf(text, meta_id=2), positions=True)
    assert reading_order_text(plain, layout="density") == text
    # a SINGLE-baseline page never splits under density ("one two" →
    # one ragged line per column, both on row 0)
    short = extract_text(text_to_pdf_narrow_gutter("one two", meta_id=3),
                         positions=True)
    assert len({g.y for g in short.glyph_positions}) == 1
    out = reading_order_text(short, layout="density")
    assert isinstance(out, str) and "one" in out


def test_density_mode_superscript_joins_its_line():
    """Density-mode baseline clustering (LINE_TOL_FRACTION): a
    superscript (Ts rise 4pt at 12pt Helvetica) must read INLINE in
    its line, not as a phantom line above it; real 14pt leading still
    separates lines. Fixed mode keeps the pinned exact-y behavior."""
    from pdfspark.fixtures import BASE14, PdfBuilder
    from pdfspark.kernel.layout import reading_order_text

    b = PdfBuilder()
    f1 = b.add(BASE14)
    content = (
        b"BT /F1 12 Tf 72 720 Td (energy mc) Tj 4 Ts (2) Tj 0 Ts "
        b"( done) Tj 0 -14 Td (next line here) Tj ET"
    )
    c = b.add_stream("<< >>", content)
    pg = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{pg} 0 R] /Count 1 >>", num=90)
    rt = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    r = extract_text(b.build(rt), positions=True)
    assert r.error is None
    dens = reading_order_text(r, layout="density")
    assert dens == "energy mc2 done next line here", repr(dens)
    # fixed mode: the raised glyph is its own exact-y line ABOVE
    fixed = reading_order_text(r)
    assert fixed.startswith("2 "), repr(fixed)


def test_density_single_line_with_superscript_never_splits():
    """A superscript's raised baseline must not count as the 'second
    line' that unlocks density column splitting: one visual line with
    wide kerned gaps + a raised glyph stays ONE column (review r4.2
    finding — the min-lines guard counts CLUSTERED baselines)."""
    from pdfspark.fixtures import BASE14, PdfBuilder
    from pdfspark.kernel.layout import reading_order_text

    b = PdfBuilder()
    f1 = b.add(BASE14)
    # one line, wide kern gaps (could read as coverage holes), one
    # superscript glyph 4pt up — 2 raw baselines, 1 clustered line
    content = (b"BT /F1 12 Tf 72 720 Td "
               b"[(alpha) -800 (beta) -800 (gamma)] TJ "
               b"4 Ts (1) Tj 0 Ts ET")
    c = b.add_stream("<< >>", content)
    pg = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{pg} 0 R] /Count 1 >>", num=90)
    rt = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    r = extract_text(b.build(rt), positions=True)
    assert r.error is None
    out = reading_order_text(r, layout="density")
    # word ORDER preserved (no column split reordering); the kern gaps
    # may lawfully become spaces (word-break policy), never reordering
    assert out.replace(" ", "") == "alphabetagamma1", repr(out)


def test_density_size_aware_line_clustering_mixed_sizes():
    """Size-aware baseline clustering (r5, VERDICT r4 next #5): a
    superscript over a 24pt headline rises 8pt — ABOVE the old global
    0.8×median-advance tolerance on a page dominated by 9pt body text
    (the fallback tol computes ≈4pt here), so the pre-r5 constant
    mis-clustered it into a phantom line. The per-line size rule
    (0.4 em of the larger line) merges it; the 11pt body leading and
    the 16pt headline-to-body gap still separate real lines."""
    from pdfspark.fixtures import BASE14, PdfBuilder
    from pdfspark.kernel.layout import _advance_tol, reading_order_text

    b = PdfBuilder()
    f1 = b.add(BASE14)
    content = (
        b"BT /F1 24 Tf 72 720 Td (Energy mc) Tj 8 Ts (2) Tj 0 Ts "
        b"( done) Tj ET "
        b"BT /F1 9 Tf 72 680 Td (small body line one here) Tj "
        b"0 -11 Td (small body line two here) Tj "
        b"0 -11 Td (small body line three here) Tj ET"
    )
    c = b.add_stream("<< >>", content)
    pg = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{pg} 0 R] /Count 1 >>", num=90)
    rt = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    r = extract_text(b.build(rt), positions=True)
    assert r.error is None
    # the fixture really is the old rule's failure mode: the 8pt rise
    # exceeds the advance-based fallback tolerance
    assert _advance_tol(r.glyph_positions) < 8.0
    # device em sizes reach the geometry layer (24pt and 9pt)
    assert {round(g.size) for g in r.glyph_positions} == {9, 24}
    dens = reading_order_text(r, layout="density")
    assert dens == ("Energy mc2 done small body line one here "
                    "small body line two here "
                    "small body line three here"), repr(dens)


def test_table_cells_grid_readback():
    """Layout tier 3 (VERDICT r4 next #4): a 3-column grid written in
    COLUMN stream order — plain linearization provably interleaves the
    rows — reads back cell-exact through grid-aligned x-stop
    clustering, and layout='table' restores the full row-major text
    byte-identically."""
    from pdfspark.docgen import text_to_pdf_table
    from pdfspark.kernel.layout import reading_order_text, table_cells

    text = ("the fast key order sort table scan merge part window "
            "small hash scan join order batch value line agg row extra")
    r = extract_text(text_to_pdf_table(text, meta_id=4), positions=True)
    assert r.error is None
    # stream order interleaves: linearized text is NOT the source
    assert r.text != text
    # row-major reconstruction is byte-identical
    assert reading_order_text(r, layout="table") == text
    # per-cell: word pairs at (k//3, k%3)
    words = text.split(" ")
    exp = [" ".join(words[2 * k:2 * k + 2])
           for k in range((len(words) + 1) // 2)]
    got = {(row, col): t for _page, row, col, t in table_cells(r)}
    assert len(got) == len(exp)
    for k, cell in enumerate(exp):
        assert got[(k // 3, k % 3)] == cell, (k, cell, got)
    # single-cell degenerate page: one row, one column
    short = extract_text(text_to_pdf_table("one two", meta_id=5),
                         positions=True)
    assert table_cells(short) == [(0, 0, 0, "one two")]
    # error documents yield [] (one-bad-document rule)
    from pdfspark.kernel.extract import extract_text as _ex

    assert table_cells(_ex(b"\x00junk", positions=True)) == []


def test_table_ragged_rowspan_readback():
    """Layout tier 4a (VERDICT r5 next #5): a sparse grid whose every
    11th cell renders as a vertically-centered 2-ROW span — its
    baseline at the midpoint between two grid rows, the cell below it
    covered — reads back cell-exact: anchor-linkage row clustering
    (TABLE_ROW_SPAN_FRACTION × median baseline gap) folds each
    midpoint baseline into the row the span STARTS in, and no phantom
    rows shift the ranks."""
    from pdfspark.docgen import text_to_pdf_table
    from pdfspark.kernel.layout import table_cells

    text = ("the fast key order sort table scan merge part window "
            "small hash scan join order batch value line agg row extra "
            "words more data flow node edge graph tree leaf root branch")
    words = text.split(" ")
    cells = [" ".join(words[2 * k:2 * k + 2])
             for k in range((len(words) + 1) // 2)]
    n = len(cells)

    def skipped(k):
        return k % 5 == 4

    def span_at(k):
        return k % 11 == 10 and not skipped(k) and k + 3 < n

    assert any(span_at(k) for k in range(n))  # fixture really spans
    r = extract_text(
        text_to_pdf_table(text, meta_id=6, skip_every=5, rowspan_every=11),
        positions=True)
    assert r.error is None
    got = sorted(table_cells(r))
    exp = sorted(
        (0, k // 3, k % 3, cells[k]) for k in range(n)
        if not skipped(k) and not (k >= 3 and span_at(k - 3))
    )
    assert got == exp
    # no phantom rows: the top-down row count equals the grid's
    assert max(row for _p, row, _c, _t in got) == (n + 2) // 3 - 1
    # the anchor-linkage hazard is exercised by EVERY span: the row
    # below a span sits 0.5 pitch under the midpoint baseline, so
    # single linkage would chain it into the upper row — the exact
    # match above plus the row-count bound prove it stayed separate.
    # (Adjacent-row spans are structurally impossible at the pinned
    # generator settings: span sources differ by ≥11 > 2·n_cols, and
    # denser spans would flip the page-median gap to the half-pitch —
    # outside the policy's documented precondition.)


def test_table_header_flag():
    """Layout tier 4b (VERDICT r5 next #6): a 15pt header row over a
    12pt body flags is_header on exactly row 0 (ratio 1.25 ≥ the
    pinned 1.2); a uniform-size table flags nothing (the body median
    IS every row); a 2-row table flags nothing (the sorted-median
    index lands on the large row, so no row clears the ratio)."""
    from pdfspark.docgen import text_to_pdf_table
    from pdfspark.kernel.layout import table_cells, table_cells_flagged

    text = ("the fast key order sort table scan merge part window "
            "small hash scan join order batch value line agg row extra")
    r = extract_text(text_to_pdf_table(text, meta_id=8, header_size=15.0),
                     positions=True)
    flagged = table_cells_flagged(r)
    assert {row for _p, row, _c, _t, h in flagged if h} == {0}
    # the flag is an add-on: cells identical to the unflagged surface
    assert [t[:4] for t in flagged] == table_cells(r)
    # uniform size: no headers
    r2 = extract_text(text_to_pdf_table(text, meta_id=9), positions=True)
    assert not any(h for *_rest, h in table_cells_flagged(r2))
    # 2-row table (<= 2 rows): never flags even with a big row 0
    r3 = extract_text(
        text_to_pdf_table("a b c d e f g h i j k l", meta_id=10,
                          header_size=15.0),
        positions=True)
    assert not any(h for *_rest, h in table_cells_flagged(r3))


def test_table_colspan():
    """Layout tier 5 (ROADMAP r6 #2b): every 7th cell renders as a
    continuous run whose char spacing carries it 10pt past the next
    x-stop (covered cell omitted); table_cells_spanned reports
    col_span=2 on exactly those cells with the merged text byte-exact,
    and a uniform grid is provably all-1 AND bit-identical to the
    pinned 4-column surface with the span column dropped."""
    from pdfspark.docgen import text_to_pdf_table
    from pdfspark.kernel.layout import table_cells, table_cells_spanned

    text = ("the fast key order sort table scan merge part window "
            "small hash scan join order batch value line agg row extra "
            "words more data flow node edge graph tree leaf root branch")
    words = text.split(" ")
    cells = [" ".join(words[2 * k:2 * k + 2])
             for k in range((len(words) + 1) // 2)]
    n = len(cells)

    def span_h(k):
        return k % 7 == 6 and k % 3 < 2 and k + 1 < n

    assert any(span_h(k) for k in range(n))  # fixture really spans
    r = extract_text(text_to_pdf_table(text, meta_id=11, colspan_every=7),
                     positions=True)
    assert r.error is None
    got = sorted(table_cells_spanned(r))
    exp = sorted(
        (0, k // 3, k % 3,
         cells[k] + (" " + cells[k + 1] if span_h(k) else ""),
         2 if span_h(k) else 1)
        for k in range(n) if not (k >= 7 and k % 7 == 0 and k % 3 > 0)
    )
    assert got == exp
    # uniform grid: no spans, and the span surface is an add-on
    r2 = extract_text(text_to_pdf_table(text, meta_id=12), positions=True)
    sp2 = table_cells_spanned(r2)
    assert all(s == 1 for *_rest, s in sp2)
    assert [t[:4] for t in sp2] == table_cells(r2)


def test_table_multipage_continuation():
    """Layout tier 5c (ROADMAP r6 #2c): ONE logical table paginated 4
    rows per page (last page shorter, identical x-stops on every page)
    reads back with table_cells_continued — row_idx CONTINUES across
    page boundaries and equals the dense arithmetic k//3 exactly, so
    pagination + continuation is an identity on the logical grid. On a
    single-page document the surface is bit-identical to table_cells
    (offset 0), and error documents yield []."""
    from pdfspark.docgen import text_to_pdf_table
    from pdfspark.kernel.layout import table_cells, table_cells_continued

    text = ("the fast key order sort table scan merge part window "
            "small hash scan join order batch value line agg row extra "
            "words more data flow node edge graph tree leaf root branch")
    words = text.split(" ")
    cells = [" ".join(words[2 * k:2 * k + 2])
             for k in range((len(words) + 1) // 2)]
    n = len(cells)
    n_rows = (n + 2) // 3
    assert n_rows > 4  # fixture really paginates (> 1 page)
    r = extract_text(text_to_pdf_table(text, meta_id=13, rows_per_page=4),
                     positions=True)
    assert r.error is None
    assert len(r.spans) == (n_rows + 3) // 4  # one span per page
    got = sorted((row, col, t)
                 for _p, row, col, t in table_cells_continued(r))
    exp = sorted((k // 3, k % 3, cells[k]) for k in range(n))
    assert got == exp
    # the per-page surface restarts ranks; continuation is the delta
    local = sorted((row, col, t) for _p, row, col, t in table_cells(r))
    assert local != got
    # single page: bit-identical to table_cells
    r1 = extract_text(text_to_pdf_table(text, meta_id=14), positions=True)
    assert table_cells_continued(r1) == table_cells(r1)
    # error documents yield [] (one-bad-document rule)
    assert table_cells_continued(
        extract_text(b"\x00junk", positions=True)) == []


def test_table_combined_skip_rowspan_header():
    """The three table-generator knobs compose: sparse cells (skip),
    vertically-centered 2-row spans (anchor-linkage folding), and a
    15pt header row all in ONE table read back cell-exact with the
    header flag on exactly row 0 — the tiers are orthogonal, not
    mutually exclusive."""
    from pdfspark.docgen import text_to_pdf_table
    from pdfspark.kernel.layout import table_cells_flagged

    text = ("the fast key order sort table scan merge part window small "
            "hash scan join order batch value line agg row extra words "
            "more data flow node edge graph tree leaf root branch alpha "
            "beta gamma delta")
    words = text.split(" ")
    cells = [" ".join(words[2 * k:2 * k + 2])
             for k in range((len(words) + 1) // 2)]
    n = len(cells)

    def skipped(k):
        return k % 5 == 4

    def span_at(k):
        return k % 11 == 10 and not skipped(k) and k + 3 < n

    exp = sorted(
        (0, k // 3, k % 3, cells[k], k < 3)
        for k in range(n)
        if not skipped(k) and not (k >= 3 and span_at(k - 3))
    )
    r = extract_text(
        text_to_pdf_table(text, meta_id=11, skip_every=5,
                          rowspan_every=11, header_size=15.0),
        positions=True)
    assert sorted(table_cells_flagged(r)) == exp


def test_rtl_reading_order_readback():
    """Layout tier 4c (RTL half of VERDICT r5 missing #1): a Hebrew
    page whose every line is stored in VISUAL order (logical reversed)
    reads back byte-identically under layout='rtl' — columns
    right-to-left, lines assembled by descending x via the
    gap-preserving mirror transform — while plain linearization
    provably returns each line character-reversed."""
    from pdfspark.docgen import _ASCII_TO_HEB, text_to_pdf_rtl, wrap_words
    from pdfspark.kernel.layout import reading_order_text

    text = ("right to left scripts read the other way and the mirror "
            "must restore logical order exactly for every line")
    heb = text.translate(_ASCII_TO_HEB)
    r = extract_text(text_to_pdf_rtl(text, meta_id=7), positions=True)
    assert r.error is None
    assert reading_order_text(r, layout="rtl") == heb
    # plain linearization is the visual form: every line reversed
    assert r.text == "\n".join(
        line[::-1] for line in wrap_words(heb, 40))
    assert r.text != heb
    # interior spaces come from space GLYPHS, mirrored into place —
    # the word count survives the round trip
    assert reading_order_text(r, layout="rtl").count(" ") == text.count(" ")
    # wrap invariant the byte-identity depends on: single-space join
    # of the wrapped lines restores the input
    assert " ".join(wrap_words(heb, 40)) == heb
    # review r6.1 #1: empty tokens (leading/double/trailing spaces)
    # survive the wrap AND the full rtl extraction roundtrip
    for tricky in (" alpha beta", "a" * 40 + "  b", "a" * 40 + " ",
                   "x  y   z", " "):
        assert " ".join(wrap_words(tricky, 40)) == tricky
        th = tricky.translate(_ASCII_TO_HEB)
        tr = extract_text(text_to_pdf_rtl(tricky, meta_id=9),
                          positions=True)
        assert reading_order_text(tr, layout="rtl") == th, tricky
    # error/edge paths
    assert reading_order_text(
        extract_text(b"\x00junk", positions=True), layout="rtl") == ""


def test_bidi_mixed_runs_readback():
    """Layout tier 5a: an RTL page with embedded strongly-LTR runs
    (Latin n-z, digits from o→0/s→5) stored in visual order — logical
    line reversed, each maximal [0-9A-Za-z]+ run un-reversed — reads
    back byte-identically ONLY under layout='bidi' (mirror assembly +
    per-line LTR-run reversal); layout='rtl' alone provably leaves
    every LTR run reversed, pinning that bidi is a distinct policy."""
    from pdfspark.docgen import (_ASCII_TO_HEB_BIDI, restore_ltr_runs,
                                 text_to_pdf_bidi, wrap_words)
    from pdfspark.kernel.layout import _reverse_ltr_runs, reading_order_text

    text = ("numbers like 2026 and (3.14) and latin tokens must stay "
            "readable inside right to left paragraph flow for every "
            "line even at 12:30 or [9/11] or 1.2.3 but not 7b.5")
    mixed = text.translate(_ASCII_TO_HEB_BIDI)
    # the fixture genuinely mixes: multi-char LTR runs exist mid-word
    import re as _re

    assert _re.search(r"[0-9A-Za-z]{2,}", mixed)
    assert _re.search(r"[א-ש]", mixed)
    r = extract_text(text_to_pdf_bidi(text, meta_id=7), positions=True)
    assert r.error is None
    assert reading_order_text(r, layout="bidi") == mixed
    # rtl alone is NOT enough: LTR runs come back reversed and (r8)
    # brackets come back mirrored — only bidi's swap+restore fixes both
    from pdfspark.kernel.layout import _BIDI_MIRROR as _MIR

    rtl = reading_order_text(r, layout="rtl")
    assert rtl != mixed
    assert _reverse_ltr_runs(rtl.translate(_MIR)) == mixed
    # hand-pinned semantics (not the shared-helper tautology): the
    # logical line "אב 12 cd" renders visually as "cd 12 בא" — token
    # order reversed, LTR runs intact — and the mirror assembly of
    # that visual string ("אב 21 dc") restores the logical line once
    # its LTR runs re-reverse
    assert restore_ltr_runs("אב 12 cd"[::-1]) == "cd 12 בא"
    assert _reverse_ltr_runs("אב 21 dc") == "אב 12 cd"
    # UAX#9 W4 (r7, VERDICT r6 wrong #2): a separator-joined number is
    # ONE LTR run — "3.14" renders visually intact ("3.14", not
    # "14.3") and the mirror's "41.3" restores it
    assert restore_ltr_runs("אב 3.14 cd"[::-1]) == "cd 3.14 בא"
    assert _reverse_ltr_runs("אב 41.3 dc") == "אב 3.14 cd"
    # the join needs PURE digit blocks on both sides (W4 is EN CS EN,
    # not L CS EN): "7b.5" stays two runs — block "7b" is impure — so
    # each reverses separately and the involution survives
    assert _reverse_ltr_runs("7b.5") == "b7.5"
    assert _reverse_ltr_runs("b7.5") == "7b.5"
    # chained W4 ("1.2.3") and colon/slash separators join too
    assert _reverse_ltr_runs("1.2.3") == "3.2.1"
    assert _reverse_ltr_runs("12:30") == "03:21"
    assert _reverse_ltr_runs("9/11") == "11/9"
    # UAX#9 L4 bracket mirroring (r8, hand-pinned): a visual-order
    # writer stores the MIRRORED glyph for R-level brackets, so the
    # logical "אב (12) cd" renders visually "cd (12) בא" — the swap
    # puts the OPEN shape back on the visually-left side — and the
    # mirror assembly's "אב )21( dc" restores the logical line once
    # brackets swap back and LTR runs re-reverse
    from pdfspark.docgen import _BIDI_MIRROR_GEN
    from pdfspark.kernel.layout import _BIDI_MIRROR

    g = lambda s: _reverse_ltr_runs(s.translate(_BIDI_MIRROR))  # noqa: E731
    f = lambda s: restore_ltr_runs(  # noqa: E731
        s[::-1].translate(_BIDI_MIRROR_GEN))
    assert f("אב (12) cd") == "cd (12) בא"
    assert g("אב )21( dc") == "אב (12) cd"
    # brackets around an RTL word mirror (the visually-left glyph
    # must be the OPEN shape); around one LTR run the double swap is
    # a fixpoint — exactly where simplified N0 equals full N0
    assert f("[אב]") == "[בא]"          # visual form
    assert g("]אב[") == "[אב]"          # g eats the mirror ASSEMBLY
    assert f("[ab]") == "[ab]"
    assert g("]ba[") == "[ab]"
    assert f("see {12:30}") == "{12:30} see"
    assert g("ees }03:21{") == "see {12:30}"
    # both mirror copies are the SAME table (the twin invariant)
    assert _BIDI_MIRROR == _BIDI_MIRROR_GEN
    # involution + round-trip identity hold on the worst-case alphabet
    # (block purity is reversal-invariant — this is the property the
    # char-flanked variant of W4 would fail, e.g. on "1.2a.3");
    # r8: brackets in the alphabet, g' = swap∘g stays an involution
    # because the swap is a non-run-char involution that commutes
    # with both reversals
    import random as _random

    _random.seed(54)
    for _ in range(2000):
        s = "".join(_random.choice("ab12.,:/ ()[]{}<>")
                    for _ in range(_random.randint(0, 14)))
        assert g(g(s)) == s
        assert g(g(s[::-1])[::-1]) == s
        assert f(f(s)) == s
    assert _reverse_ltr_runs(_reverse_ltr_runs("1.2a.3")) == "1.2a.3"
    # plain linearization is the visual form of every wrapped line —
    # and it genuinely contains MIRRORED brackets (the discriminating
    # check a swap-less implementation fails)
    assert r.text == "\n".join(
        restore_ltr_runs(line[::-1].translate(_BIDI_MIRROR_GEN))
        for line in wrap_words(mixed, 40))
    assert r.text != mixed
    assert "(" in mixed and ")" in mixed
    # pure-RTL lines (no ASCII-alnum): bidi degrades to rtl exactly
    pure = "abc def ghi"  # translit → all-Hebrew
    from pdfspark.docgen import text_to_pdf_rtl
    rp = extract_text(text_to_pdf_rtl(pure, meta_id=8), positions=True)
    assert (reading_order_text(rp, layout="bidi")
            == reading_order_text(rp, layout="rtl"))
    # error/edge paths
    assert reading_order_text(
        extract_text(b"\x00junk", positions=True), layout="bidi") == ""


def test_density_per_column_size_clustering():
    """r5.3: baseline-size tolerances are PER COLUMN — two columns
    sharing a rounded y with different body sizes must not pollute
    each other. Col A is 9pt body with MORE glyphs at the shared
    y=720, so a page-keyed median there would be 9pt; col B is a 24pt
    headline whose 7pt superscript rises 8pt — page-keyed tolerance
    0.4×max(7,9)=3.6pt would emit a phantom '2' line, per-column
    0.4×max(7,24)=9.6pt merges it."""
    from pdfspark.fixtures import BASE14, PdfBuilder
    from pdfspark.kernel.layout import reading_order_text

    b = PdfBuilder()
    f1 = b.add(BASE14)
    content = (
        b"BT /F1 9 Tf 72 720 Td (alpha beta words here) Tj "
        b"0 -11 Td (gamma delta words too) Tj "
        b"0 -11 Td (third small line here) Tj ET "
        b"BT /F1 24 Tf 400 720 Td (Energy mc) Tj "
        b"/F1 7 Tf 8 Ts (2) Tj 0 Ts /F1 24 Tf ( done) Tj ET"
    )
    c = b.add_stream("<< >>", content)
    pg = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{pg} 0 R] /Count 1 >>", num=90)
    rt = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    r = extract_text(b.build(rt), positions=True)
    assert r.error is None
    dens = reading_order_text(r, layout="density")
    assert "Energy mc2 done" in dens, repr(dens)
    assert "alpha beta words here" in dens
