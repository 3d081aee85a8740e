"""The fixture case corpus (FIXTURES.md §2): one case per kernel feature,
each a (pdf_bytes, expected_text, expected_error) triple under the pinned
linearization policy (pdfspark/kernel/extract.py docstring).
"""

from __future__ import annotations

import zlib
from typing import List

from pdfspark.fixtures import (
    BASE14,
    Case,
    MACROMAN,
    PdfBuilder,
    WINANSI,
    append_update,
    append_xref_stream_update,
    build_minimal_ttf,
    lzw_encode,
    make_doc,
    png_predict_encode,
    runlength_encode,
    tounicode_stream,
    _simple_show,
)


def _doc_with_filtered_content(content: bytes, filter_src: str,
                               data: bytes) -> bytes:
    """One-page doc whose content stream carries an explicit filter."""
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add(
        f"<< {filter_src} /Length {len(data)} >>\nstream\n".encode("latin-1")
        + data
        + b"\nendstream"
    )
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    return b.build(root)


def _euctw_encode(text: str) -> bytes:
    """EUC-TW encoder for fixtures (Python ships no euc_tw codec):
    reverse lookup of the committed CNS 11643 plane tables — plane 1 as
    bare 0xA1-0xFE pairs, plane 2 via the 0x8E 0xA2 escape."""
    from pdfspark.kernel.cns11643_data import PLANE1, PLANE2

    out = bytearray()
    for ch in text:
        if ord(ch) < 0x80:
            out.append(ord(ch))
            continue
        i = PLANE1.find(ch)
        if i >= 0:
            out += bytes([0xA1 + i // 94, 0xA1 + i % 94])
            continue
        i = PLANE2.find(ch)
        if i < 0:
            raise ValueError(f"not in CNS 11643 planes 1-2: {ch!r}")
        out += bytes([0x8E, 0xA2, 0xA1 + i // 94, 0xA1 + i % 94])
    return bytes(out)


def all_cases() -> List[Case]:
    cases: List[Case] = []
    add = cases.append

    # ---- t01: classic xref, uncompressed, Tj, base-14 Standard encoding
    add(Case("t01_hello_classic_xref",
             make_doc(_simple_show("Hello World"), fonts={"F1": BASE14}),
             "Hello World", None, 1))

    # ---- t02: FlateDecode (predictor Unused)
    content = _simple_show("Hello Flate").encode()
    add(Case("t02_flate",
             _doc_with_filtered_content(content, "/Filter /FlateDecode",
                                        zlib.compress(content)),
             "Hello Flate", None, 1))

    # ---- t03: PNG predictor Up (the one the reference completes)
    content = _simple_show("Predictor Up").encode()
    cols = 16
    pred = png_predict_encode(content, cols, ftype=2)
    add(Case("t03_flate_predictor_up",
             _doc_with_filtered_content(
                 content,
                 "/Filter /FlateDecode /DecodeParms "
                 f"<< /Predictor 12 /Columns {cols} >>",
                 zlib.compress(pred)),
             "Predictor Up", None, 1))

    # ---- t03b: Sub/Average/Paeth rows (ref-todo!(); spec-derived goldens)
    for ftype, name in ((1, "sub"), (3, "avg"), (4, "paeth")):
        content = _simple_show(f"Pred {name}").encode()
        pred = png_predict_encode(content, cols, ftype=ftype)
        add(Case(f"t03b_pred_{name}",
                 _doc_with_filtered_content(
                     content,
                     "/Filter /FlateDecode /DecodeParms "
                     f"<< /Predictor 12 /Columns {cols} >>",
                     zlib.compress(pred)),
                 f"Pred {name}", None, 1))

    # ---- t04: ASCIIHexDecode
    content = _simple_show("Hex!").encode()
    add(Case("t04_asciihex",
             _doc_with_filtered_content(
                 content, "/Filter /ASCIIHexDecode",
                 content.hex().encode() + b">"),
             "Hex!", None, 1))

    # ---- t05: cascade [/ASCII85Decode /FlateDecode]
    import base64

    content = _simple_show("Cascade85").encode()
    a85 = base64.a85encode(zlib.compress(content)) + b"~>"
    add(Case("t05_ascii85_cascade",
             _doc_with_filtered_content(
                 content, "/Filter [/ASCII85Decode /FlateDecode]", a85),
             "Cascade85", None, 1))

    # ---- t06: LZWDecode (ref-todo!())
    content = _simple_show("LZW works").encode()
    add(Case("t06_lzw",
             _doc_with_filtered_content(content, "/Filter /LZWDecode",
                                        lzw_encode(content)),
             "LZW works", None, 1))

    # ---- t06b: RunLengthDecode (ref-todo!())
    content = _simple_show("RLE aaaaaabbb").encode()
    add(Case("t06b_runlength",
             _doc_with_filtered_content(content, "/Filter /RunLengthDecode",
                                        runlength_encode(content)),
             "RLE aaaaaabbb", None, 1))

    # ---- t07: xref stream
    add(Case("t07_xref_stream",
             make_doc(_simple_show("XrefStream"), fonts={"F1": BASE14},
                      use_xref_stream=True),
             "XrefStream", None, 1))

    # ---- t08: object streams (type-2 entries)
    add(Case("t08_objstm",
             make_doc(_simple_show("ObjStm"), fonts={"F1": BASE14},
                      objstm_page_objs=True),
             "ObjStm", None, 1))

    # ---- t09: incremental update shadows the content object
    b = PdfBuilder()
    f1 = b.add(BASE14)
    old = _simple_show("Old text").encode()
    c = b.add_stream("<< >>", old)
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    base = b.build(root)
    new = _simple_show("New text").encode()
    newbody = (f"<< /Length {len(new)} >>\nstream\n".encode() + new
               + b"\nendstream")
    add(Case("t09_incremental_update",
             append_update(base, {c: newbody}, root),
             "New text", None, 1))

    # ---- t09b: TWO generations of updates; the newest wins twice over
    upd1 = append_update(base, {c: newbody}, root)
    newest = _simple_show("Newest text").encode()
    upd2 = append_update(
        upd1,
        {c: (f"<< /Length {len(newest)} >>\nstream\n".encode() + newest
             + b"\nendstream")},
        root,
    )
    add(Case("t09b_two_generations", upd2, "Newest text", None, 1))

    # ---- t10: Contents array; operands/operator split across streams
    add(Case("t10_multi_content_streams",
             make_doc([[b"BT /F1 12 Tf 72 720 Td (Hello multi)",
                        b"Tj ET"]],
                      fonts={"F1": BASE14}, content_is_array=True),
             "Hello multi", None, 1))

    # ---- t11: full text state: Td/TD/Tm/T*/TL/Tc/Tw/Tz/Ts/'/"
    t11 = (
        "BT /F1 12 Tf 14 TL 72 720 Td (Line1) Tj "
        "T* (Line2) Tj "
        "0 -14 Td (Line3) Tj "
        "1 0 0 1 72 600 Tm (Line4) Tj "
        "(Line5) ' "
        '2 1 (Line6) " '
        "100 Tz 0.5 Ts (Line6b) Tj "
        "ET"
    )
    add(Case("t11_text_state",
             make_doc(t11, fonts={"F1": BASE14}),
             "Line1\nLine2\nLine3\nLine4\nLine5\nLine6Line6b", None, 1))

    # ---- t12: TJ kerning inserts NOTHING (pinned policy #3)
    t12 = "BT /F1 12 Tf 72 720 Td [(A) -120 (B) 500 (C) (D)] TJ ET"
    add(Case("t12_tj_kerning",
             make_doc(t12, fonts={"F1": BASE14}),
             "ABCD", None, 1))

    # ---- t13: /Differences → AGL names
    diff_font = (
        "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding "
        "<< /Type /Encoding /Differences [65 /eacute /bullet 97 /Euro] >> >>"
    )
    add(Case("t13_differences_encoding",
             make_doc("BT /F1 12 Tf 72 720 Td (ABa) Tj ET",
                      fonts={"F1": diff_font}),
             "é•€", None, 1))

    # ---- t14: WinAnsi + MacRoman high codes
    t14 = (
        "BT /F1 12 Tf 72 720 Td (\\223\\351) Tj ET "
        "BT /F2 12 Tf 120 720 Td (\\216) Tj ET"
    )
    add(Case("t14_winansi_macroman",
             make_doc(t14, fonts={"F1": WINANSI, "F2": MACROMAN}),
             "“éé", None, 1))

    # ---- t15: ToUnicode bfchar
    tu = tounicode_stream(
        "<00> <FF>",
        "2 beginbfchar\n<41> <0394>\n<42> <05D0>\nendbfchar",
    )
    tu_font = (
        "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        "/ToUnicode 60 0 R >>"
    )
    add(Case("t15_tounicode_bfchar",
             make_doc("BT /F1 12 Tf 72 720 Td (AB) Tj ET",
                      fonts={"F1": tu_font},
                      font_streams={60: ("<< >>", tu)}),
             "Δא", None, 1))

    # ---- t15b: bfrange incl. array form, multi-char + surrogate-pair dst
    tu = tounicode_stream(
        "<00> <FF>",
        "2 beginbfrange\n"
        "<41> <43> <03B1>\n"
        "<44> <45> [<D835DC00> <00660066>]\n"
        "endbfrange",
    )
    add(Case("t15b_tounicode_bfrange",
             make_doc("BT /F1 12 Tf 72 720 Td (ABCDE) Tj ET",
                      fonts={"F1": tu_font},
                      font_streams={60: ("<< >>", tu)}),
             "αβγ\U0001D400ff", None, 1))

    # ---- t16: Type0 Identity-H, 2-byte codes, CID widths
    tu2 = tounicode_stream(
        "<0000> <FFFF>",
        "1 beginbfrange\n<0041> <005A> <0041>\nendbfrange",
    )
    type0 = (
        "<< /Type /Font /Subtype /Type0 /BaseFont /Test-Identity-H "
        "/Encoding /Identity-H /DescendantFonts [62 0 R] /ToUnicode 60 0 R >>"
    )
    cid_font = (
        "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Test "
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        "/Supplement 0 >> /DW 1000 /W [65 [600 600 600]] "
        "/CIDToGIDMap /Identity >>"
    )
    b = PdfBuilder()
    b.add_stream("<< >>", tu2, num=60)
    b.add(cid_font, num=62)
    f1 = b.add(type0)
    c = b.add_stream("<< >>", b"BT /F1 12 Tf 72 720 Td <004100420043> Tj ET")
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t16_type0_identity_h", b.build(root), "ABC", None, 1))

    # ---- t17: embedded TTF cmap fallback (no ToUnicode, no usable Encoding)
    ttf = build_minimal_ttf({0x48: 5, 0x69: 6}, sym_to_gid={0x01: 5, 0x02: 6})
    ttf_font = (
        "<< /Type /Font /Subtype /TrueType /BaseFont /TestTTF "
        "/FontDescriptor 63 0 R >>"
    )
    descr = (
        "<< /Type /FontDescriptor /FontName /TestTTF /Flags 4 "
        "/FontFile2 64 0 R >>"
    )
    b = PdfBuilder()
    b.add(descr, num=63)
    b.add_stream("<< >>", ttf, num=64)
    f1 = b.add(ttf_font)
    c = b.add_stream("<< >>", b"BT /F1 12 Tf 72 720 Td (\x01\x02) Tj ET")
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t17_ttf_cmap_fallback", b.build(root), "Hi", None, 1))

    # ---- t18: Form XObject with own Resources + Matrix (recursion)
    b = PdfBuilder()
    f1 = b.add(BASE14)
    f2 = b.add(WINANSI)
    inner = b"BT /F2 12 Tf 0 0 Td (In) Tj ET"
    xo = b.add_stream(
        "<< /Type /XObject /Subtype /Form /BBox [0 0 200 50] "
        f"/Matrix [1 0 0 1 72 700] /Resources << /Font << /F2 {f2} 0 R >> >> >>",
        inner,
    )
    c = b.add_stream("<< >>", b"BT /F1 12 Tf 72 720 Td (Out) Tj ET /Fx Do")
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] /Resources "
        f"<< /Font << /F1 {f1} 0 R >> /XObject << /Fx {xo} 0 R >> >> "
        f"/Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t18_form_xobject", b.build(root), "Out\nIn", None, 1))

    # ---- t19: marked content incl. /Artifact is KEPT (pinned policy #5)
    t19 = (
        "BT /F1 12 Tf 72 720 Td (A) Tj ET "
        "/Artifact BMC BT /F1 12 Tf 100 720 Td (B) Tj ET EMC "
        "/Span << /ActualText (ignored) >> BDC "
        "BT /F1 12 Tf 120 720 Td (C) Tj ET EMC"
    )
    add(Case("t19_marked_content",
             make_doc(t19, fonts={"F1": BASE14}), "ABC", None, 1))

    # ---- t20: unknown operator inside BX…EX (and outside) ignored
    t20 = (
        "BX /Foo 1 2 newop EX "
        "BT /F1 12 Tf 72 720 Td (Compat) Tj 3 alsounknown ET"
    )
    add(Case("t20_bx_ex_compat",
             make_doc(t20, fonts={"F1": BASE14}), "Compat", None, 1))

    # ---- t21: inline image skipped without desync (binary contains 'EI')
    img = bytes(range(48)) + b"xEIx" + bytes(48)  # embedded fake EI
    t21 = (
        b"BT /F1 12 Tf 72 720 Td (Before) Tj ET "
        b"BI /W 4 /H 8 /BPC 8 /CS /G /L " + str(len(img)).encode() +
        b" ID " + img + b" EI "
        b"BT /F1 12 Tf 150 720 Td (After) Tj ET"
    )
    add(Case("t21_inline_image",
             make_doc(t21, fonts={"F1": BASE14}), "BeforeAfter", None, 1))

    # ---- t21b: inline image without /L (boundary-scan path)
    img2 = bytes(b % 251 for b in range(64))
    t21b = (
        b"BT /F1 12 Tf 72 720 Td (Pre) Tj ET "
        b"BI /W 8 /H 8 /BPC 8 /CS /G ID " + img2 + b" EI "
        b"BT /F1 12 Tf 150 720 Td (Post) Tj ET"
    )
    add(Case("t21b_inline_image_noL",
             make_doc(t21b, fonts={"F1": BASE14}), "PrePost", None, 1))

    # ---- t22: literal string escapes (ports of `src/lex.rs:602-631`)
    t22 = (
        "BT /F1 12 Tf 72 720 Td "
        "(\\110i \\(nested\\) \\\\ oct\\101l \\x) Tj ET"
    )
    add(Case("t22_literal_string_escapes",
             make_doc(t22, fonts={"F1": BASE14}),
             "Hi (nested) \\ octAl x", None, 1))

    # ---- t23: hex-string operands, whitespace + odd length
    t23 = "BT /F1 12 Tf 72 720 Td <48 65 6C6C 6F> Tj <486> Tj ET"
    add(Case("t23_hex_strings",
             make_doc(t23, fonts={"F1": WINANSI}),
             "HelloH`", None, 1))

    # ---- t24: empty page / no text
    add(Case("t24_empty_page", make_doc([None]), "", None, 1))
    add(Case("t24b_no_text",
             make_doc("72 72 m 100 100 l S 0 0 50 50 re f W n",
                      fonts={"F1": BASE14}),
             "", None, 1))

    # ---- t25: multi-page giant-ish doc (skew fixture; also spans)
    npages = 40
    pages = [
        _simple_show(f"Page {i} " + "lorem " * 50) for i in range(npages)
    ]
    add(Case("t25_giant_doc",
             make_doc(pages, fonts={"F1": BASE14}),
             "\f".join(f"Page {i} " + "lorem " * 50 for i in range(npages)),
             None, npages))

    # ---- t26: malformed startxref → recovery scan (ref would panic)
    good = make_doc(_simple_show("Recovered"), fonts={"F1": BASE14})
    broken = good.replace(b"startxref\n", b"startxref\n9999999 %", 1)
    add(Case("t26_malformed_xref", broken, "Recovered", None, 1))

    # ---- t26b: lying /Length → endstream-scan recovery
    good2 = make_doc(_simple_show("BadLength"), fonts={"F1": BASE14})
    import re as _re

    broken2 = _re.sub(rb"/Length (\d+)", b"/Length 999999", good2, count=1)
    # the Length edit changes offsets → also breaks xref → recovery path
    add(Case("t26b_bad_length", broken2, "BadLength", None, 1))

    # ---- t27: real decryption — RC4 (V2/R3) + AESV2 (V4/R4), empty pw
    from pdfspark.crypto_fixtures import (
        build_encrypted_pdf,
        build_unsupported_encrypted_pdf,
    )

    add(Case("t27_encrypted_rc4",
             build_encrypted_pdf("RC4 secret text", cfm="rc4"),
             "RC4 secret text", None, 1))
    add(Case("t27b_encrypted_aesv2",
             build_encrypted_pdf("AES secret text", cfm="aesv2"),
             "AES secret text", None, 1))
    # malformed V5 entries → stable error, no crash
    add(Case("t27c_encrypted_malformed_v5",
             build_unsupported_encrypted_pdf(),
             None, "encrypted", 0))
    # AESV3/R6 (PDF 2.0 SHA-2 handler), empty password → decrypts
    add(Case("t27d_encrypted_aesv3",
             build_encrypted_pdf("AESV3 secret text", cfm="aesv3"),
             "AESV3 secret text", None, 1))
    # password-protected (non-empty user pw) → must REJECT cleanly
    add(Case("t27e_encrypted_password_required",
             build_encrypted_pdf("locked", cfm="aesv3",
                                 user_password=b"hunter2"),
             None, "encrypted", 0))

    # ---- t28: Type3 font via Differences + ToUnicode
    tu3 = tounicode_stream(
        "<00> <FF>", "1 beginbfchar\n<41> <2605>\nendbfchar"
    )
    b = PdfBuilder()
    b.add_stream("<< >>", tu3, num=60)
    glyph = b.add_stream("<< >>", b"0 0 m 10 10 l f")
    t3_font = (
        "<< /Type /Font /Subtype /Type3 /FontBBox [0 0 10 10] "
        "/FontMatrix [0.001 0 0 0.001 0 0] "
        f"/CharProcs << /star {glyph} 0 R >> "
        "/Encoding << /Differences [65 /star] >> "
        "/FirstChar 65 /LastChar 65 /Widths [500] /ToUnicode 60 0 R >>"
    )
    f1 = b.add(t3_font)
    c = b.add_stream("<< >>", b"BT /F1 12 Tf 72 720 Td (A) Tj ET")
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t28_type3_font", b.build(root), "★", None, 1))

    # ---- t29: ExtGState /Font entry (gs operator sets the font)
    b = PdfBuilder()
    f1 = b.add(BASE14)
    gs_dict = b.add(f"<< /Type /ExtGState /Font [{f1} 0 R 12] >>")
    c = b.add_stream(
        "<< >>", b"/GS1 gs BT 72 720 Td (ViaGS) Tj ET"
    )
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] /Resources "
        f"<< /Font << /F1 {f1} 0 R >> /ExtGState << /GS1 {gs_dict} 0 R >> >> "
        f"/Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t29_extgstate_font", b.build(root), "ViaGS", None, 1))

    # ---- t30: TABLE-BOUND predefined CJK CMap without ToUnicode → stable
    # soft error. Re-pinned in r3: the codec-backed families (GBK-EUC,
    # RKSJ, B5pc, KSC-EUC — see t44*) and CNS-EUC (committed CNS 11643
    # table, t44e) now DECODE; GB/T 12345 (GBT-EUC) stays table-bound —
    # no stdlib codec and no public offline table
    b = PdfBuilder()
    cid_font2 = (
        "<< /Type /Font /Subtype /CIDFontType0 /BaseFont /Fake-GBT "
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (GB1) "
        "/Supplement 2 >> >>"
    )
    df_num = b.add(cid_font2)
    f1 = b.add(
        "<< /Type /Font /Subtype /Type0 /BaseFont /Fake-GBT "
        f"/Encoding /GBT-EUC-H /DescendantFonts [{df_num} 0 R] >>"
    )
    c = b.add_stream("<< >>", b"BT /F1 12 Tf 72 720 Td <00410042> Tj ET")
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t30_predefined_cjk_cmap", b.build(root),
             "��", "predefined-cmap", 1))

    # ---- t31: hybrid-reference file (classic xref + /XRefStm pointer)
    # Build: objstm-backed doc (xref stream), then wrap a classic xref
    # that lists nothing but points at the xref stream via /XRefStm.
    inner = make_doc(_simple_show("Hybrid"), fonts={"F1": BASE14},
                     objstm_page_objs=True)
    sx = inner.rfind(b"startxref")
    stream_xref_off = int(inner[sx + 9:].split()[0])
    body = inner[:sx]
    classic = bytearray(body)
    xref_off = len(classic)
    classic += (
        b"xref\n0 1\n0000000000 65535 f \n"
        b"trailer\n<< /Size 95 /Root 91 0 R /XRefStm "
        + str(stream_xref_off).encode()
        + b" >>\nstartxref\n"
        + str(xref_off).encode()
        + b"\n%%EOF\n"
    )
    add(Case("t31_hybrid_xrefstm", bytes(classic), "Hybrid", None, 1))

    # ---- t33: embedded Type1 built-in encoding (cleartext /Encoding)
    t1_program = (
        b"%!PS-AdobeFont-1.0: TestT1\n"
        b"/FontName /TestT1 def\n"
        b"/Encoding 256 array\n"
        b"0 1 255 {1 index exch /.notdef put} for\n"
        b"dup 65 /eacute put\n"
        b"dup 66 /bullet put\n"
        b"readonly def\n"
        b"currentdict end\ncurrentfile eexec\n"
        + bytes(range(64))  # fake encrypted portion
    )
    b = PdfBuilder()
    b.add_stream("<< /Length1 200 /Length2 64 /Length3 0 >>", t1_program,
                 num=64)
    b.add(
        "<< /Type /FontDescriptor /FontName /TestT1 /Flags 4 "
        "/FontFile 64 0 R >>",
        num=63,
    )
    t1_font = (
        "<< /Type /Font /Subtype /Type1 /BaseFont /TestT1 "
        "/FontDescriptor 63 0 R >>"
    )
    f1 = b.add(t1_font)
    c = b.add_stream("<< >>", b"BT /F1 12 Tf 72 720 Td (AB) Tj ET")
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t33_type1_builtin_encoding", b.build(root), "é•", None, 1))

    # ---- t33c: PROGRAMMATIC Type1 encoding — no literal dup/put
    # entries; the array is built by `Encoding <code> /<name> put`
    # statements only the bounded PostScript interpreter
    # (kernel/postscript.py) recovers (reference runs its full VM,
    # `src/postscript/interpreter.rs`)
    t1_prog2 = (
        b"%!PS-AdobeFont-1.0: TestT1P\n"
        b"/FontName /TestT1P def\n"
        b"/Encoding 256 array def\n"
        b"0 1 255 { Encoding exch /.notdef put } for\n"
        b"Encoding 65 /eacute put\n"
        b"Encoding 66 /bullet put\n"
        b"currentfile eexec\n"
        + bytes(range(64))
    )
    b = PdfBuilder()
    b.add_stream(
        f"<< /Length1 {len(t1_prog2) - 64} /Length2 64 /Length3 0 >>",
        t1_prog2, num=64,
    )
    b.add(
        "<< /Type /FontDescriptor /FontName /TestT1P /Flags 4 "
        "/FontFile 64 0 R >>",
        num=63,
    )
    f1 = b.add(
        "<< /Type /Font /Subtype /Type1 /BaseFont /TestT1P "
        "/FontDescriptor 63 0 R >>"
    )
    c = b.add_stream("<< >>", b"BT /F1 12 Tf 72 720 Td (AB) Tj ET")
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t33c_type1_programmatic_encoding", b.build(root), "é•",
             None, 1))

    # ---- t33b: built-in encoding is the base under a Differences-only
    # /Encoding dict (PDF 32000 §9.6.6.1)
    b = PdfBuilder()
    b.add_stream("<< /Length1 200 /Length2 64 /Length3 0 >>", t1_program,
                 num=64)
    b.add(
        "<< /Type /FontDescriptor /FontName /TestT1 /Flags 4 "
        "/FontFile 64 0 R >>",
        num=63,
    )
    f1 = b.add(
        "<< /Type /Font /Subtype /Type1 /BaseFont /TestT1 "
        "/FontDescriptor 63 0 R "
        "/Encoding << /Type /Encoding /Differences [200 /Euro] >> >>"
    )
    c = b.add_stream("<< >>", b"BT /F1 12 Tf 72 720 Td (A\xc8) Tj ET")
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t33b_builtin_plus_differences", b.build(root), "é€", None, 1))

    # ---- t34: CIDToGIDMap stream (ref asserts Identity only)
    ttf2 = build_minimal_ttf({0x48: 5, 0x69: 6})
    # cid 0 → gid 0, cid 1 → gid 5 ('H'), cid 2 → gid 6 ('i')
    c2g = b"\x00\x00\x00\x05\x00\x06"
    b = PdfBuilder()
    b.add_stream("<< >>", ttf2, num=64)
    b.add(
        "<< /Type /FontDescriptor /FontName /TestCID /Flags 4 "
        "/FontFile2 64 0 R >>",
        num=63,
    )
    b.add_stream("<< >>", c2g, num=65)
    b.add(
        "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /TestCID "
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        "/Supplement 0 >> /FontDescriptor 63 0 R /CIDToGIDMap 65 0 R >>",
        num=62,
    )
    f1 = b.add(
        "<< /Type /Font /Subtype /Type0 /BaseFont /TestCID "
        "/Encoding /Identity-H /DescendantFonts [62 0 R] >>"
    )
    c = b.add_stream("<< >>", b"BT /F1 12 Tf 72 720 Td <00010002> Tj ET")
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t34_cid_to_gid_stream", b.build(root), "Hi", None, 1))

    # ---- t35: CFF/Type1C built-in encoding (FontFile3, FN9-lite)
    from pdfspark.fixtures import build_minimal_cff

    cff = build_minimal_cff({65: "eacute", 66: "bullet"})
    b = PdfBuilder()
    b.add_stream("<< /Subtype /Type1C >>", cff, num=64)
    b.add(
        "<< /Type /FontDescriptor /FontName /TestCFF /Flags 4 "
        "/FontFile3 64 0 R >>",
        num=63,
    )
    f1 = b.add(
        "<< /Type /Font /Subtype /Type1 /BaseFont /TestCFF "
        "/FontDescriptor 63 0 R >>"
    )
    c = b.add_stream("<< >>", b"BT /F1 12 Tf 72 720 Td (AB) Tj ET")
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t35_cff_builtin_encoding", b.build(root), "é•", None, 1))

    # ---- t36: UTF-16BE /Title with BOM (text-string decode path)
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("titled").encode())
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R /Lang (de-DE) >>", num=91)
    title_utf16 = "Grüße 😀".encode("utf-16-be")
    info = b.add(
        b"<< /Title <FEFF" + title_utf16.hex().encode() + b"> "
        b"/CreationDate (D:20240215103000+02'00') >>"
    )
    add(Case("t36_utf16_title_lang", b.build(
        root, trailer_extra=f" /Info {info} 0 R"), "titled", None, 1))

    # ---- t37: large object stream (150 objects in one container)
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("BigObjStm").encode())
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    filler = [b.add(f"<< /Filler {i} >>", num=100 + i) for i in range(147)]
    add(Case("t37_large_objstm",
             b.build(root, objstm=[page, 90, root] + filler),
             "BigObjStm", None, 1))

    # ---- t38: Uni*-UCS2 predefined CMap WITHOUT ToUnicode: the 2-byte
    # codes ARE the UCS-2 values, so text decodes with no Adobe tables
    # (reference name inventory: `src/font/cjk.rs:133-142`)
    b = PdfBuilder()
    df_num = b.add(
        "<< /Type /Font /Subtype /CIDFontType0 /BaseFont /FakeMincho "
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (Japan1) "
        "/Supplement 6 >> >>"
    )
    f1 = b.add(
        "<< /Type /Font /Subtype /Type0 /BaseFont /FakeMincho "
        f"/Encoding /UniJIS-UCS2-H /DescendantFonts [{df_num} 0 R] >>"
    )
    jp = "日本語"  # U+65E5 U+672C U+8A9E
    hexcodes = "".join(f"{ord(ch):04X}" for ch in jp)
    c = b.add_stream(
        "<< >>", f"BT /F1 12 Tf 72 720 Td <{hexcodes}> Tj ET".encode()
    )
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t38_unijis_ucs2", b.build(root), jp, None, 1))

    # ---- t38b: Uni*-UTF16 with a surrogate pair (4-byte codespace range)
    b = PdfBuilder()
    df_num = b.add(
        "<< /Type /Font /Subtype /CIDFontType0 /BaseFont /FakeSong "
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (GB1) "
        "/Supplement 5 >> >>"
    )
    f1 = b.add(
        "<< /Type /Font /Subtype /Type0 /BaseFont /FakeSong "
        f"/Encoding /UniGB-UTF16-H /DescendantFonts [{df_num} 0 R] >>"
    )
    mixed = "汉\U00020000"  # BMP char + supplementary-plane CJK ext B
    hexcodes = mixed.encode("utf-16-be").hex().upper()
    c = b.add_stream(
        "<< >>", f"BT /F1 12 Tf 72 720 Td <{hexcodes}> Tj ET".encode()
    )
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t38b_unigb_utf16_surrogates", b.build(root), mixed, None, 1))

    # ---- t39: FreeText + inheriting Widget annotations (VERDICT r1 #8)
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("annotated").encode())
    b.add("<< /Type /Annot /Subtype /FreeText /Rect [10 10 200 40] "
          "/Contents (review me) >>", num=70)
    b.add("<< /FT /Tx /T (fld) /V (typed answer) /Kids [72 0 R] >>", num=71)
    b.add("<< /Type /Annot /Subtype /Widget /Rect [10 50 60 70] "
          "/Parent 71 0 R >>", num=72)
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R "
        f"/Annots [70 0 R 72 0 R] >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add(
        "<< /Type /Catalog /Pages 90 0 R "
        "/AcroForm << /Fields [71 0 R] >> >>", num=91)
    add(Case("t39_annotations", b.build(root), "annotated", None, 1,
             expected_annots="review me\ntyped answer"))

    # ---- t40: embedded TTF whose cmap is format-12 ONLY (3,10): a
    # supplementary-plane char maps via the gid→unicode inversion
    # (reference parses 12 but never looks it up,
    # `src/font/true_type/parse.rs:462-`)
    ttf12 = build_minimal_ttf({}, fmt12_to_gid={0x48: 5, 0x1F600: 7})
    b = PdfBuilder()
    b.add(
        "<< /Type /FontDescriptor /FontName /TestTTF12 /Flags 4 "
        "/FontFile2 64 0 R >>",
        num=63,
    )
    b.add_stream("<< >>", ttf12, num=64)
    df_num = b.add(
        "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /TestTTF12 "
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        "/Supplement 0 >> /DW 1000 /FontDescriptor 63 0 R "
        "/CIDToGIDMap /Identity >>"
    )
    f1 = b.add(
        "<< /Type /Font /Subtype /Type0 /BaseFont /TestTTF12 "
        f"/Encoding /Identity-H /DescendantFonts [{df_num} 0 R] >>"
    )
    c = b.add_stream("<< >>", b"BT /F1 12 Tf 72 720 Td <00050007> Tj ET")
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t40_ttf_cmap_format12", b.build(root), "H😀", None, 1))

    # ---- t41: xref stream with a linked FREE chain (type-0 entries 6→7→0)
    # between live objects; a reference into the chain resolves to Null
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("FreeChain").encode())
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R "
        f"/Dummy 6 0 R >>"  # dangles into the free chain
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t41_xref_stream_free_chain",
             b.build(root, use_xref_stream=True, free=[6, 7]),
             "FreeChain", None, 1))

    # ---- t42: incremental update DELETES the content object (free 'f'
    # entry shadows the live one): the page survives with empty text
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("Doomed").encode())
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t42_incremental_delete",
             append_update(b.build(root), {c: None}, root),
             "", None, 1))

    # ---- t43: TWO incremental updates whose xref sections are XREF
    # STREAMS (PDF 1.5+ writers): Prev chains stream→stream→stream
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("StreamGen0").encode())
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    base = b.build(root, use_xref_stream=True)

    def _content_obj(text: str) -> bytes:
        body = _simple_show(text).encode()
        return (f"<< /Length {len(body)} >>\nstream\n".encode() + body
                + b"\nendstream")

    upd1 = append_xref_stream_update(
        base, {c: _content_obj("StreamGen1")}, root, xref_num=200)
    upd2 = append_xref_stream_update(
        upd1, {c: _content_obj("StreamGen2")}, root, xref_num=201)
    add(Case("t43_xref_stream_updates", upd2, "StreamGen2", None, 1))

    # ---- t44: legacy predefined CJK CMaps WITHOUT ToUnicode — the code
    # bytes are national-standard encodings (GBK / Shift-JIS / Big5 /
    # EUC-KR), decoded via stdlib codecs; only CID-keyed widths need the
    # unshippable Adobe tables (reference inventory `src/font/cjk.rs:1-190`)
    def _legacy_cjk_case(tag: str, cmap_name: str, text: str,
                         codec: str, ordering: str):
        bb = PdfBuilder()
        df = bb.add(
            "<< /Type /Font /Subtype /CIDFontType0 /BaseFont /FakeCJK "
            "/CIDSystemInfo << /Registry (Adobe) "
            f"/Ordering ({ordering}) /Supplement 5 >> >>"
        )
        ff = bb.add(
            "<< /Type /Font /Subtype /Type0 /BaseFont /FakeCJK "
            f"/Encoding /{cmap_name} /DescendantFonts [{df} 0 R] >>"
        )
        hexcodes = (_euctw_encode(text) if codec == "euc_tw"
                    else text.encode(codec)).hex().upper()
        cc = bb.add_stream(
            "<< >>", f"BT /F1 12 Tf 72 720 Td <{hexcodes}> Tj ET".encode()
        )
        pg = bb.add(
            f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {ff} 0 R >> >> /Contents {cc} 0 R >>"
        )
        bb.add(f"<< /Type /Pages /Kids [{pg} 0 R] /Count 1 >>", num=90)
        rt = bb.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
        add(Case(tag, bb.build(rt), text, None, 1))

    _legacy_cjk_case("t44_gbk_euc", "GBK-EUC-H", "中文测试ok", "gbk", "GB1")
    _legacy_cjk_case("t44b_90ms_rksj", "90ms-RKSJ-H", "日本語カナabc",
                     "cp932", "Japan1")
    _legacy_cjk_case("t44c_b5pc", "B5pc-H", "繁體字", "big5", "CNS1")
    _legacy_cjk_case("t44d_ksc_euc", "KSC-EUC-H", "한국어", "euc_kr",
                     "Korea1")
    # plane-1 hanzi (bare pairs) + a plane-2 char (0x8E A2 escape) + ASCII
    _legacy_cjk_case("t44e_cns_euc", "CNS-EUC-H", "臺灣乂a", "euc_tw",
                     "CNS1")

    # ---- t45: Link annotations with URI actions (reference
    # `src/annotation/link.rs` + `src/actions/uri.rs`): /A /S /URI is
    # primary, /PA (web-capture original) is the fallback, Dest-only
    # intra-document links yield nothing
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("linked").encode())
    a1 = b.add(
        "<< /Type /Annot /Subtype /Link /Rect [0 0 10 10] "
        "/A << /Type /Action /S /URI /URI (https://ex.test/a) >> >>"
    )
    a2 = b.add(
        "<< /Type /Annot /Subtype /Link /Rect [0 20 10 30] "
        "/PA << /Type /Action /S /URI /URI (https://ex.test/pa) >> >>"
    )
    a3 = b.add(  # Dest-only: no URI to extract
        "<< /Type /Annot /Subtype /Link /Rect [0 40 10 50] "
        "/Dest [90 0 R /Fit] >>"
    )
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R "
        f"/Annots [{a1} 0 R {a2} 0 R {a3} 0 R] >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    add(Case("t45_link_uris", b.build(root), "linked", None, 1))

    # ---- t46: ENCRYPTED object stream + xref stream (the common
    # PDF 1.5+ shape): catalog/pages/page/Info live in an RC4-encrypted
    # objstm, cross-referenced by an unencrypted xref stream; strings
    # inside the objstm are NOT individually encrypted (§7.5.7)
    from pdfspark.crypto_fixtures import build_encrypted_objstm_pdf

    add(Case("t46_encrypted_objstm",
             build_encrypted_objstm_pdf("objstm secret"),
             "objstm secret", None, 1))

    # ---- t47: AcroForm FIELD TREE (reference `src/acro_form.rs`):
    # a widget-merged field (emitted once, via the page walk), a hidden
    # widget-less field, and a nested Kids field — the tree walk must add
    # exactly the widget-less values after the page annotations
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("form doc").encode())
    wid = b.add(
        "<< /Type /Annot /Subtype /Widget /FT /Tx /Rect [10 10 60 30] "
        "/T (visible1) /V (shown value) >>"
    )
    hidden = b.add("<< /FT /Tx /T (hidden1) /V (hidden value) >>")
    kid = b.add("<< /FT /Tx /T (kid1) /V (nested value) >>")
    parent = b.add(f"<< /T (group1) /Kids [{kid} 0 R] >>")
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R "
        f"/Annots [{wid} 0 R] >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add(
        "<< /Type /Catalog /Pages 90 0 R "
        f"/AcroForm << /Fields [{wid} 0 R {hidden} 0 R {parent} 0 R] >> >>",
        num=91,
    )
    add(Case("t47_acroform_field_tree", b.build(root), "form doc", None, 1))

    # ---- t48: embedded files — catalog /Names /EmbeddedFiles name tree
    # (reference `src/data_structures/name_tree.rs` + catalog Names) AND
    # a /FileAttachment annotation; inventory surfaces as "name:size"
    # lines, tree entries (key order) before page annotations
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("attached doc").encode())
    ef1 = b.add_stream(
        "<< /Type /EmbeddedFile /Params << /Size 11 >> >>", b"hello world"
    )
    fs1 = b.add(
        f"<< /Type /Filespec /F (readme.txt) /EF << /F {ef1} 0 R >> >>"
    )
    ef2 = b.add_stream("<< /Type /EmbeddedFile >>", b"abc")  # size via /Length
    fs2 = b.add(
        "<< /Type /Filespec /F (data8.bin) /UF (uni-data.bin) "
        f"/EF << /F {ef2} 0 R >> >>"
    )
    att = b.add(
        "<< /Type /Annot /Subtype /FileAttachment /Rect [10 10 30 30] "
        f"/FS {fs2} 0 R >>"
    )
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R "
        f"/Annots [{att} 0 R] >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add(
        "<< /Type /Catalog /Pages 90 0 R /Names << /EmbeddedFiles "
        f"<< /Names [(readme.txt) {fs1} 0 R] >> >> >>",
        num=91,
    )
    add(Case("t48_embedded_files", b.build(root), "attached doc", None, 1))

    # ---- t49: XMP-only title — no /Info, /Title comes from the
    # catalog's /Metadata packet (dc:title rdf:Alt; exceeds the
    # reference, which never reads XMP)
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("xmp doc").encode())
    xmp = (b'<?xpacket begin="\xef\xbb\xbf"?><x:xmpmeta xmlns:x="adobe:ns:meta/">'
           b'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
           b'<rdf:Description xmlns:dc="http://purl.org/dc/elements/1.1/">'
           b'<dc:title><rdf:Alt>'
           b'<rdf:li xml:lang="x-default">XMP Title &amp; More</rdf:li>'
           b'</rdf:Alt></dc:title>'
           b'</rdf:Description></rdf:RDF></x:xmpmeta><?xpacket end="w"?>')
    md = b.add_stream("<< /Type /Metadata /Subtype /XML >>", xmp)
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add(
        f"<< /Type /Catalog /Pages 90 0 R /Metadata {md} 0 R >>", num=91
    )
    add(Case("t49_xmp_title", b.build(root), "xmp doc", None, 1))

    # ---- t50: legacy-CJK codec CMap WITH an embedded FontFile2 whose
    # hmtx advances are non-uniform (FN11 upgrade): content-order text is
    # the kern-glued transliteration (kerns insert nothing — pinned);
    # geometry recovery is pinned separately in test_golden. The case's
    # presence here puts the head/hhea/hmtx parse path under the corpus
    # mutation/garbage property tests.
    from pdfspark.docgen import _ASCII_TO_CJK, text_to_pdf_cjk_kerned

    _cjk_text = "big data merge"
    add(Case("t50_cjk_embedded_widths",
             text_to_pdf_cjk_kerned(_cjk_text, meta_id=50),
             _cjk_text.translate(_ASCII_TO_CJK).replace(" ", ""),
             None, 1))

    # ---- t51: 'post'-name-only symbolic TrueType (no cmap subtables,
    # no ToUnicode): text recovers through post-2.0 glyph names →
    # AGL; in-corpus so the post parser sits under the mutation fuzz
    from pdfspark.docgen import text_to_pdf_postfont

    add(Case("t51_post_glyph_names",
             text_to_pdf_postfont("post name route 42", meta_id=51),
             "post name route 42", None, 1))

    # ---- t52: vertical writing mode (Identity-V — extract.py policy
    # #7): per-glyph displacement runs DOWN the page; the content
    # stream writes the two 40-char columns in the REVERSE of reading
    # order, so the pinned linearization yields column 2 then column 1
    # ("\n"-joined by the baseline rule). The reading-order recovery
    # (layout="vertical") is pinned in test_golden; in-corpus so the
    # Identity-V + ToUnicode + vertical-advance path sits under the
    # mutation/garbage property fuzz.
    from pdfspark.docgen import text_to_pdf_vertical

    _v_text = "vertical columns read right to left glyphs stack downward"
    _v_cjk = _v_text.translate(_ASCII_TO_CJK)
    add(Case("t52_vertical_identity_v",
             text_to_pdf_vertical(_v_text, meta_id=52),
             _v_cjk[40:] + "\n" + _v_cjk[:40],
             None, 1))

    # ---- t55 (r7): vertical writing mode with per-CID /W2 metrics
    # (VERDICT r6 missing #2): same column structure as t52, but the
    # descendant font carries /DW2 + /W2 (triple form for hanzi-'a',
    # range form for 'f'-'h'), so those glyphs advance 2 / 1.5 ems.
    # Linearized TEXT is the t52 formula unchanged (W2 moves glyphs,
    # never reorders or corrupts decode — that's the pin); the applied
    # GEOMETRY is asserted in test_golden from positions=True.
    # In-corpus so the W2 parse path sits under the mutation fuzz.
    from pdfspark.docgen import text_to_pdf_vertical_w2

    _w2_text = "falling half width forms and fat ideographs advance far"
    _w2_cjk = _w2_text.translate(_ASCII_TO_CJK)
    add(Case("t55_vertical_w2_metrics",
             text_to_pdf_vertical_w2(_w2_text, meta_id=55),
             _w2_cjk[40:] + "\n" + _w2_cjk[:40],
             None, 1))

    # ---- t53: RTL script (Identity-H Hebrew, layout tier 4c): each
    # line's show op stores the string in VISUAL order (logical
    # reversed), so the pinned linearization yields every line
    # character-reversed, "\n"-joined by the baseline rule. The
    # reading-order recovery (layout="rtl") is pinned in test_golden;
    # in-corpus so the Identity-H + ToUnicode + mirror path sits under
    # the mutation/garbage property fuzz.
    from pdfspark.docgen import _ASCII_TO_HEB, text_to_pdf_rtl, wrap_words

    _r_text = ("mirror lines restore logical order when "
               "read back right to left")
    _r_heb = _r_text.translate(_ASCII_TO_HEB)
    add(Case("t53_rtl_identity_h",
             text_to_pdf_rtl(_r_text, meta_id=53),
             "\n".join(line[::-1] for line in wrap_words(_r_heb, 40)),
             None, 1))

    # ---- t54: bidi mixed-direction runs (layout tier 5a): a-m →
    # Hebrew, n-z stay Latin (o→0, s→5 digits); each line's show
    # stores VISUAL order (logical reversed, then each maximal
    # LTR run un-reversed), so the pinned linearization
    # yields exactly those visual strings "\n"-joined. The
    # reading-order recovery (layout="bidi") is pinned in
    # test_golden; in-corpus so the mixed-script mirror + run
    # reversal path sits under the mutation/garbage property fuzz.
    # Re-pinned r7 (VERDICT r6 wrong #2): the text now carries
    # separator-joined numbers — "3.14" (EN CS EN, one run under
    # UAX#9 W4), "12:30" and "9/11" (CS colon/slash), a chained
    # "1.2.3", and the IMPURE "7b.5" (block "7b" has a letter → W4
    # does NOT join; stays two runs) — so the golden proves the W4
    # purity rule in both directions.
    from pdfspark.docgen import (_ASCII_TO_HEB_BIDI, restore_ltr_runs,
                                 text_to_pdf_bidi)

    _b_text = ("digits 2026 and latin runs stay ltr inside "
               "a right to left paragraph flow pi 3.14 time "
               "12:30 date 9/11 chain 1.2.3 impure 7b.5 end")
    _b_mixed = _b_text.translate(_ASCII_TO_HEB_BIDI)
    add(Case("t54_bidi_mixed_runs",
             text_to_pdf_bidi(_b_text, meta_id=54),
             "\n".join(restore_ltr_runs(line[::-1])
                       for line in wrap_words(_b_mixed, 40)),
             None, 1))

    # ---- t56 (r7): /PageLabels number tree — roman front matter,
    # prefixed decimals with /St, a bare-prefix range, split across a
    # /Kids node (direct dicts: resolve() passes them through, so the
    # tree recursion is exercised without extra objects). Expected
    # TEXT is the plain multipage linearization (labels never alter
    # text — they ride the page_labels column, pinned in test_golden);
    # in-corpus so the number-tree walk sits under the mutation fuzz.
    from pdfspark.docgen import PAGE_LABELS_TREE, text_to_pdf_multipage

    _pl_text = ("front matter pages use roman labels then the body "
                "switches to prefixed decimal numbering starting at "
                "five and the last page is a bare cover label " * 3)
    add(Case("t56_page_labels_tree",
             text_to_pdf_multipage(_pl_text, page_chars=120,
                                   meta_id=56,
                                   page_labels=PAGE_LABELS_TREE),
             "\f".join(_pl_text[i:i + 120]
                       for i in range(0, len(_pl_text), 120)),
             None, (len(_pl_text) + 119) // 120))

    # ---- t57 (r7): outline destinations — three bookmarks whose
    # destination forms cycle explicit /Dest array, catalog /Dests
    # name, and GoTo-action string through the /Names /Dests tree;
    # destination resolution (outline_pages) is pinned in test_golden.
    # In-corpus so all three dest walks sit under the mutation fuzz.
    _od_text = ("outline destinations resolve named and explicit "
                "targets onto physical pages for navigation " * 4)
    add(Case("t57_outline_dests",
             text_to_pdf_multipage(_od_text, page_chars=90, meta_id=57,
                                   outline_dests=[("intro", 0),
                                                  ("middle", 2),
                                                  ("end", 3)]),
             "\f".join(_od_text[i:i + 90]
                       for i in range(0, len(_od_text), 90)),
             None, (len(_od_text) + 89) // 90))

    # ---- non-PDF rows (magic-byte filter + error paths)
    add(Case("h01_html_passthrough",
             b"<!doctype html><html><body>hello web</body></html>",
             None, "not-pdf", 0))
    add(Case("h02_empty", b"", None, "not-pdf", 0))
    add(Case("h03_pdf_prefix_garbage",
             b"%PDF-1.4\n\x00\x01garbage without any objects at all",
             None, "xref", 0))

    return cases
