"""Property-based tests (hypothesis): roundtrips and invariants the
example-based suites can't sweep (SURVEY.md §5 plan — the reference has
no property tests at all)."""

import zlib

from hypothesis import HealthCheck, given, settings, strategies as st

from pdfspark.docgen import text_to_pdf
from pdfspark.fixtures import lzw_encode, png_predict_encode, runlength_encode
from pdfspark.kernel.extract import extract_text
from pdfspark.kernel.filters import flate_decode, lzw_decode, runlength_decode
from pdfspark.kernel.lexer import Lexer
from pdfspark.kernel.objects import PdfString


# text the WinAnsi generator can represent faithfully: latin-1 minus the
# C1 block (0x7F-0x9F), where cp1252 assigns typographic glyphs — a
# generator precondition, not a kernel limitation
_text = st.text(
    alphabet=st.characters(
        min_codepoint=0x20,
        max_codepoint=0xFF,
        blacklist_categories=("Cc",),
        blacklist_characters="\x85\xa0\xad",
    ),
    max_size=600,
)


@settings(max_examples=150, deadline=None)
@given(_text)
def test_pdf_roundtrip_any_latin1_text(text):
    """text → synthetic PDF → kernel == identity (WinAnsi-encodable
    subset; undefined WinAnsi codes map to their cp1252 fallback)."""
    enc = text.encode("latin-1")
    # WinAnsi has 5 undefined codes; docgen texts never contain them
    if any(b in (0x81, 0x8D, 0x8F, 0x90, 0x9D) for b in enc):
        return
    r = extract_text(text_to_pdf(text))
    assert r.error is None
    assert r.text == text


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=4096))
def test_lzw_roundtrip(data):
    assert lzw_decode(lzw_encode(data), {}) == data


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=4096))
def test_runlength_roundtrip(data):
    assert runlength_decode(runlength_encode(data), {}) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=2048),
       st.integers(min_value=1, max_value=64),
       st.sampled_from([0, 1, 2, 3, 4]))
def test_png_predictor_roundtrip(data, columns, ftype):
    # pad to whole rows: the codec pair is defined on full rows
    if len(data) % columns:
        data = data + bytes(columns - len(data) % columns)
    enc = png_predict_encode(data, columns, ftype=ftype)
    out = flate_decode(zlib.compress(enc),
                       {"Predictor": 12, "Columns": columns})
    assert out == data


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=256))
def test_literal_string_escape_roundtrip(data):
    """Any byte string survives PDF literal-string escaping + lexing."""
    esc = bytearray()
    for b in data:
        if b in b"\\()":
            esc += b"\\" + bytes([b])
        elif b in b"\r\n":
            esc += ("\\%03o" % b).encode()
        else:
            esc.append(b)
    src = b"(" + bytes(esc) + b")"
    assert Lexer(src).lex_object() == PdfString(data)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=256))
def test_hex_string_roundtrip(data):
    src = b"<" + data.hex().encode() + b">"
    assert Lexer(src).lex_object() == PdfString(data)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=512))
def test_kernel_never_raises_on_garbage(data):
    """Crash-tolerance: arbitrary bytes (with or without the magic) must
    produce an ExtractResult, never an exception."""
    r1 = extract_text(data)
    r2 = extract_text(b"%PDF-1.4\n" + data)
    assert r1 == extract_text(data)  # deterministic too
    assert r2.text is None or isinstance(r2.text, str)


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_kernel_survives_mutated_valid_pdfs(data):
    """Crash-tolerance under structured corruption: flip bytes inside a
    VALID fixture PDF — the kernel must always return an ExtractResult
    (web-crawl dirt is mostly near-valid, not random noise)."""
    from pdfspark.corpus import all_cases

    cases = [c for c in all_cases() if c.pdf.startswith(b"%PDF-")]
    case = data.draw(st.sampled_from(cases))
    buf = bytearray(case.pdf)
    n_flips = data.draw(st.integers(min_value=1, max_value=8))
    for _ in range(n_flips):
        pos = data.draw(st.integers(min_value=0, max_value=len(buf) - 1))
        buf[pos] = data.draw(st.integers(min_value=0, max_value=255))
    r = extract_text(bytes(buf))
    assert r.text is None or isinstance(r.text, str)
    assert r == extract_text(bytes(buf))  # and deterministic


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=2048))
def test_type1_width_parser_never_raises(data):
    """kernel/type1.py on arbitrary bytes (with and without an eexec
    marker): dict out, never an exception — one bad font must never kill
    the document, let alone the job."""
    from pdfspark.kernel.type1 import parse_type1_widths

    assert isinstance(parse_type1_widths(data), dict)
    assert isinstance(parse_type1_widths(b"x eexec " + data), dict)


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=2048))
def test_cff_width_parser_never_raises(data):
    from pdfspark.kernel.cff import parse_cff_code_to_name, parse_cff_widths

    assert isinstance(parse_cff_widths(data), dict)
    assert isinstance(parse_cff_code_to_name(data), dict)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=1024))
def test_ttf_cmap_parser_never_raises(data):
    from pdfspark.kernel.fonts import parse_ttf_cmap_subtables

    assert isinstance(parse_ttf_cmap_subtables(data), dict)


def test_large_inputs_bounded_time():
    """ADVICE r2: ≤1KB fuzz inputs could never catch decode-work bombs
    (the format-12 cmap bomb needed ~24KB). Large seeded-random buffers —
    raw, %PDF-prefixed, and wrapped in a valid sfnt cmap directory with
    forged subtable records — must finish in bounded time AND never
    raise: one crafted crawl document must not stall its Spark task.
    Deterministic seeds (not hypothesis: 64KB binaries defeat its
    shrinker and health checks)."""
    import random
    import struct
    import time

    from pdfspark.kernel.fonts import parse_ttf_cmap_subtables

    rng = random.Random(42)
    t0 = time.monotonic()
    for trial in range(25):
        size = rng.randrange(4096, 65536)
        data = rng.randbytes(size)
        extract_text(data)
        extract_text(b"%PDF-1.5\n" + data)
        # sfnt wrapper: 4 subtable records pointing into the payload —
        # whatever format bytes land there exercise that format's path
        hdr = struct.pack(">IHHHH", 0x00010000, 1, 16, 0, 0)
        hdr += struct.pack(">4sIII", b"cmap", 0, 28, size + 36)
        cmap = struct.pack(">HH", 0, 4)
        for k in range(4):
            cmap += struct.pack(">HHI", 3, k, 20 + k * 7)
        assert isinstance(parse_ttf_cmap_subtables(hdr + cmap + data), dict)
        # forged-format variants: plant each real format id at each
        # subtable offset so the parser walks its own structure
        for fmt in (0, 2, 4, 6, 8, 10, 12):
            forged = bytearray(hdr + cmap + data)
            struct.pack_into(">H", forged, len(hdr) + len(cmap), fmt)
            assert isinstance(parse_ttf_cmap_subtables(bytes(forged)), dict)
    assert time.monotonic() - t0 < 60.0, "large-input stall"


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_positions_path_survives_mutated_pdfs(data):
    """The per-glyph geometry path (positions=True) and the layout
    reconstructor must be as crash-tolerant as the batched path: byte
    flips in valid fixtures never raise, and reading_order_text stays
    total over whatever comes back."""
    from pdfspark.corpus import all_cases
    from pdfspark.kernel.layout import reading_order_text

    cases = [c for c in all_cases() if c.pdf.startswith(b"%PDF-")]
    case = data.draw(st.sampled_from(cases))
    buf = bytearray(case.pdf)
    for _ in range(data.draw(st.integers(min_value=1, max_value=6))):
        pos = data.draw(st.integers(min_value=0, max_value=len(buf) - 1))
        buf[pos] = data.draw(st.integers(min_value=0, max_value=255))
    r = extract_text(bytes(buf), positions=True)
    assert isinstance(reading_order_text(r), str)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_structure_path_survives_mutated_pdfs(data):
    """The Tagged-PDF path (structure=True) — MCID tracking plus the
    structure-tree walk — must be as crash-tolerant as the batched
    path: byte flips in valid fixtures (incl. the tagged generator's
    output) never raise, and struct_text is None or a str."""
    from pdfspark.corpus import all_cases
    from pdfspark.docgen import text_to_pdf_tagged

    cases = [c.pdf for c in all_cases() if c.pdf.startswith(b"%PDF-")]
    cases.append(text_to_pdf_tagged(
        "alpha beta gamma delta epsilon zeta eta theta", meta_id=1))
    buf = bytearray(data.draw(st.sampled_from(cases)))
    for _ in range(data.draw(st.integers(min_value=1, max_value=6))):
        pos = data.draw(st.integers(min_value=0, max_value=len(buf) - 1))
        buf[pos] = data.draw(st.integers(min_value=0, max_value=255))
    r = extract_text(bytes(buf), structure=True)
    assert r.struct_text is None or isinstance(r.struct_text, str)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_postscript_extractor_never_raises(data):
    """encoding_from_program is total over arbitrary bytes (the
    interpreter is fuel-bounded and every failure is salvaged or
    swallowed) — crawl-dirt Type1 programs cannot kill a task."""
    from pdfspark.kernel.postscript import encoding_from_program

    enc = encoding_from_program(data)
    assert enc is None or isinstance(enc, dict)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_wav_header_never_raises_on_garbage(data):
    """New binary parse path invariant (CLAUDE.md): arbitrary bytes —
    raw, RIFF-prefixed, or a mutated valid container — must return a
    tuple or None, never raise or loop."""
    from pdfspark.multimodal import parse_wav_header, synth_wav

    for buf in (data, b"RIFF" + data, b"RIFF\x10\x00\x00\x00WAVE" + data):
        r = parse_wav_header(buf)
        assert r is None or (isinstance(r, tuple) and len(r) == 5)


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_wav_header_survives_mutated_valid_containers(data):
    from pdfspark.multimodal import parse_wav_header, synth_wav

    base = synth_wav(data.draw(st.integers(0, 500)))
    pos = data.draw(st.integers(0, len(base) - 1))
    val = data.draw(st.integers(0, 255))
    mutated = base[:pos] + bytes([val]) + base[pos + 1:]
    r = parse_wav_header(mutated)
    assert r is None or (isinstance(r, tuple) and len(r) == 5)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_mp4_header_never_raises_on_garbage(data):
    from pdfspark.multimodal import parse_mp4_header

    for buf in (data, b"\x00\x00\x00\x14ftypisom" + data):
        r = parse_mp4_header(buf)
        assert r is None or (isinstance(r, tuple) and len(r) == 4)


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_mp4_header_survives_mutated_valid_containers(data):
    from pdfspark.multimodal import parse_mp4_header, synth_mp4

    base = synth_mp4(data.draw(st.integers(0, 500)))
    pos = data.draw(st.integers(0, len(base) - 1))
    val = data.draw(st.integers(0, 255))
    mutated = base[:pos] + bytes([val]) + base[pos + 1:]
    r = parse_mp4_header(mutated)
    assert r is None or (isinstance(r, tuple) and len(r) == 4)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_image_header_never_raises_on_garbage(data):
    """Image header parse path (r5): arbitrary bytes — raw or prefixed
    with each format's magic — must return a tuple or None, never
    raise or loop."""
    from pdfspark.multimodal import parse_image_header

    for buf in (data, b"\x89PNG\r\n\x1a\n" + data,
                b"\xff\xd8" + data, b"BM" + data):
        r = parse_image_header(buf)
        assert r is None or (isinstance(r, tuple) and len(r) == 5)


@settings(max_examples=120, deadline=None)
@given(st.data())
def test_image_header_survives_mutated_valid_images(data):
    from pdfspark.multimodal import parse_image_header, synth_image

    base = synth_image(data.draw(st.integers(0, 500)))
    pos = data.draw(st.integers(0, len(base) - 1))
    val = data.draw(st.integers(0, 255))
    mutated = base[:pos] + bytes([val]) + base[pos + 1:]
    r = parse_image_header(mutated)
    assert r is None or (isinstance(r, tuple) and len(r) == 5)


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=2048))
def test_html_extractors_never_raise_on_garbage(data):
    """HTML parse paths (CLAUDE.md new-parse-path invariant): raw
    garbage, html-prefixed garbage, and tag soup must return their
    contract types, never raise."""
    from pdfspark.kernel.html_extract import (
        extract_html,
        extract_html_content_blocks,
        extract_html_list_items,
        extract_html_outline,
        extract_html_sections,
        extract_html_table_cells,
        extract_html_table_grid,
    )

    for buf in (data, b"<html><body>" + data,
                b"<table><tr><td>" + data, b"<ul><li>" + data):
        r = extract_html(buf)
        assert r.text is None or isinstance(r.text, str)
        blocks = extract_html_content_blocks(buf)
        assert all(isinstance(t, str) for _, t in blocks)
        cells = extract_html_table_cells(buf)
        assert all(isinstance(c, tuple) and len(c) == 4 for c in cells)
        grid = extract_html_table_grid(buf)
        assert all(isinstance(c, tuple) and len(c) == 5 for c in grid)
        outline = extract_html_outline(buf)
        assert all(isinstance(c, tuple) and len(c) == 3 for c in outline)
        secs = extract_html_sections(buf)
        assert all(isinstance(c, tuple) and len(c) == 4 for c in secs)
        lis = extract_html_list_items(buf)
        assert all(isinstance(c, tuple) and len(c) == 4 for c in lis)


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_html_table_cells_survive_mutated_valid_pages(data):
    from pdfspark.docgen import text_to_html_table
    from pdfspark.kernel.html_extract import extract_html_table_cells

    base = text_to_html_table("alpha beta gamma delta epsilon zeta",
                              data.draw(st.integers(0, 500)))
    pos = data.draw(st.integers(0, len(base) - 1))
    val = data.draw(st.integers(0, 255))
    mutated = base[:pos] + bytes([val]) + base[pos + 1:]
    cells = extract_html_table_cells(mutated)
    assert all(isinstance(c, tuple) and len(c) == 4 for c in cells)


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_html_list_items_survive_mutated_valid_pages(data):
    """Byte-flipped variants of the list generator's own output keep
    the contract shape (new-parse-path invariant: garbage fuzz covers
    raw soup, this covers near-valid pages the corpus never
    contains)."""
    from pdfspark.docgen import text_to_html_lists
    from pdfspark.kernel.html_extract import extract_html_list_items

    base = text_to_html_lists("alpha beta gamma delta epsilon zeta eta",
                              data.draw(st.integers(0, 500)))
    pos = data.draw(st.integers(0, len(base) - 1))
    val = data.draw(st.integers(0, 255))
    mutated = base[:pos] + bytes([val]) + base[pos + 1:]
    items = extract_html_list_items(mutated)
    assert all(
        isinstance(c, tuple) and len(c) == 4
        and isinstance(c[3], str) for c in items
    )


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_r6_layout_surfaces_survive_mutated_pdfs(data):
    """The r6 layout surfaces (ragged/header tables via
    table_cells_flagged, rtl/vertical reading order) on byte-flipped
    variants of their own generators' output: contract types out,
    never a raise — these generators aren't corpus cases, so the
    corpus-sampling mutation tests never reach them."""
    from pdfspark.docgen import (text_to_pdf_bidi, text_to_pdf_rtl,
                                 text_to_pdf_table, text_to_pdf_vertical)
    from pdfspark.kernel.extract import extract_text
    from pdfspark.kernel.layout import (reading_order_text,
                                        table_cells_continued,
                                        table_cells_flagged,
                                        table_cells_spanned)

    text = "alpha beta gamma delta eps zeta eta theta iota kappa lam mu"
    bases = [
        text_to_pdf_table(text, 1, skip_every=5, rowspan_every=11),
        text_to_pdf_table(text, 2, header_size=15.0),
        text_to_pdf_table(text, 5, colspan_every=7),
        text_to_pdf_table(text, 6, rows_per_page=4),
        text_to_pdf_rtl(text, 3),
        text_to_pdf_vertical(text, 4),
        text_to_pdf_bidi(text, 7),
        # r8: mirrored-bracket shows under mutation (L4 swap path)
        text_to_pdf_bidi("mix (3.14) and [ok] {12:30} <tag> end", 9),
    ]
    buf = bytearray(data.draw(st.sampled_from(bases)))
    for _ in range(data.draw(st.integers(1, 8))):
        pos = data.draw(st.integers(0, len(buf) - 1))
        buf[pos] = data.draw(st.integers(0, 255))
    r = extract_text(bytes(buf), positions=True)
    assert r.text is None or isinstance(r.text, str)
    cells = table_cells_flagged(r)
    assert all(isinstance(c, tuple) and len(c) == 5 for c in cells)
    spans = table_cells_spanned(r)
    assert all(isinstance(c, tuple) and len(c) == 5 for c in spans)
    cont = table_cells_continued(r)
    assert all(isinstance(c, tuple) and len(c) == 4 for c in cont)
    assert isinstance(reading_order_text(r, layout="rtl"), str)
    assert isinstance(reading_order_text(r, layout="bidi"), str)
    assert isinstance(reading_order_text(r, layout="vertical"), str)
