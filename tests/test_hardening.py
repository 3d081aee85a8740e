"""Regression tests for review findings: crash-tolerance and silent-
corruption paths in the kernel (web-crawl dirt shapes)."""

import zlib

import pytest

from pdfspark.fixtures import png_predict_encode
from pdfspark.kernel.encryption import compute_encryption_key
from pdfspark.kernel.extract import extract_text
from pdfspark.kernel.filters import MAX_DECODED, decode_stream, flate_decode
from pdfspark.kernel.fonts import ToUnicodeCMap
from pdfspark.kernel.objects import PdfError, Stream
from pdfspark.kernel.xref import parse_xref_chain


def test_bfrange_destination_overflow_widens():
    """<41> <FF> <FF90>: increments past 0xFFFF must widen, not raise."""
    cm = ToUnicodeCMap.parse(
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"1 beginbfrange <41> <FF> <FF90> endbfrange"
    )
    assert cm.get(1, 0x41) == "ﾐ"
    # 0xFF90 + 0x70 = 0x10000 → 4-byte UTF-16 (lone high surrogate range
    # is decoded with replacement, but it must not throw)
    assert cm.get(1, 0xB1) is not None


def test_decodeparms_list_for_single_filter():
    """DecodeParms [<<...>>] with a scalar Filter must still apply."""
    data = b"predictor payload bytes!"
    cols = 8
    enc = zlib.compress(png_predict_encode(data, cols, ftype=2))
    st = Stream(
        {
            "Filter": "FlateDecode",
            "DecodeParms": [{"Predictor": 12, "Columns": cols}],
            "Length": len(enc),
        },
        enc,
    )
    assert decode_stream(st) == data


def test_decodeparms_short_list_for_cascade():
    """[AHx, Fl] + DecodeParms [null]: the second filter must still run."""
    payload = b"cascade body"
    raw = zlib.compress(payload).hex().encode() + b">"
    st = Stream(
        {
            "Filter": ["ASCIIHexDecode", "FlateDecode"],
            "DecodeParms": [None],
            "Length": len(raw),
        },
        raw,
    )
    assert decode_stream(st) == payload


def test_flate_bomb_rejected_at_cap():
    bomb = zlib.compress(b"\x00" * (MAX_DECODED + (32 << 20)), 9)
    assert len(bomb) < 1 << 22  # it IS a bomb
    with pytest.raises(PdfError) as e:
        flate_decode(bomb, {})
    assert e.value.code == "too-large"


def test_unsigned_p_value_equals_signed():
    k1 = compute_encryption_key(b"O" * 32, -3904, b"id", 3, 16)
    k2 = compute_encryption_key(b"O" * 32, 4294963392, b"id", 3, 16)
    assert k1 == k2


def test_malformed_xref_stream_w_falls_through_to_recovery():
    """/W [1 /A 1] must not abort parsing — recovery scan takes over."""
    from pdfspark.fixtures import BASE14, PdfBuilder, _simple_show

    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("WRecovered").encode())
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    pdf = bytearray(b.build(root, use_xref_stream=True))
    # corrupt the W array in place: [1 4 2] -> [1 /A 2]
    idx = pdf.find(b"/W [1 4 2]")
    assert idx != -1
    pdf[idx : idx + 10] = b"/W [1 /A2]"
    r = extract_text(bytes(pdf))
    assert r.text == "WRecovered"
    assert r.error is None


def test_stale_offset_resolves_newest_definition():
    """Two bodies for the same objnum + a broken offset: the scan must
    pick the LAST (newest-wins, matching recover_xref)."""
    from pdfspark.fixtures import BASE14, PdfBuilder, _simple_show, append_update

    b = PdfBuilder()
    f1 = b.add(BASE14)
    old = _simple_show("Old body").encode()
    c = b.add_stream("<< >>", old)
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    base = b.build(root)
    new = _simple_show("New body").encode()
    upd = append_update(
        base,
        {c: f"<< /Length {len(new)} >>\nstream\n".encode() + new + b"\nendstream"},
        root,
    )
    # break the update xref's offset for the content object → stale-offset
    # scan path; it must find the NEW body, not the old one
    buf = bytearray(upd)
    sx = buf.rfind(b"xref\n")
    entry_start = buf.find(b"\n", buf.find(b"\n", sx) + 1) + 1
    buf[entry_start : entry_start + 10] = b"0000000017"  # bogus offset
    r = extract_text(bytes(buf))
    assert r.text == "New body"


def test_cyclic_acroform_kids_is_bounded():
    """A /Fields graph whose Kids point back at their ancestors (and at
    themselves) must terminate via the cycle guard and still emit the
    reachable widget-less values — never hang or raise."""
    from pdfspark.fixtures import BASE14, PdfBuilder, _simple_show

    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("cyclic form").encode())
    # objects 10/11 point at each other; 12 points at itself
    b.add("<< /T (a) /Kids [11 0 R] >>", num=10)
    b.add("<< /T (b) /Kids [10 0 R 13 0 R] >>", num=11)
    b.add("<< /T (c) /Kids [12 0 R] >>", num=12)
    b.add("<< /FT /Tx /T (leaf) /V (reached) >>", num=13)
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add(
        "<< /Type /Catalog /Pages 90 0 R "
        "/AcroForm << /Fields [10 0 R 12 0 R] >> >>", num=91,
    )
    r = extract_text(b.build(root))
    assert r.text == "cyclic form" and r.error is None
    assert r.annots == "reached"


def test_selfreferential_filespec_and_broken_ef_is_soft():
    """Filespecs whose /EF points at a non-stream, at a dangling ref, or
    at the filespec itself must degrade to name-only entries (or be
    skipped when nameless) — never raise."""
    from pdfspark.fixtures import BASE14, PdfBuilder, _simple_show

    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("broken att").encode())
    fs_self = b.add("<< /Type /Filespec /F (self.bin) /EF << /F 20 0 R >> >>",
                    num=20)  # EF names the filespec itself (a dict)
    fs_dangling = b.add(
        "<< /Type /Filespec /F (gone.bin) /EF << /F 999 0 R >> >>")
    fs_nameless = b.add("<< /Type /Filespec /EF << /F 999 0 R >> >>")
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add(
        "<< /Type /Catalog /Pages 90 0 R /Names << /EmbeddedFiles "
        f"<< /Names [(a) {fs_self} 0 R (b) {fs_dangling} 0 R "
        f"(c) {fs_nameless} 0 R] >> >> >>", num=91,
    )
    r = extract_text(b.build(root))
    assert r.text == "broken att" and r.error is None
    assert r.attachments == "self.bin\ngone.bin"
