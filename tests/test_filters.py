"""Filter decoders: the Adobe ASCII85 vector ported from the reference
(`src/filter/ascii.rs:91-114`) + spec-unit tests for everything the
reference stubs (LZW, RunLength, PNG predictors Sub/Avg/Paeth)."""

import zlib

import pytest

from pdfspark.fixtures import lzw_encode, png_predict_encode, runlength_encode
from pdfspark.kernel.filters import (
    ascii85_decode,
    asciihex_decode,
    decode_stream,
    flate_decode,
    lzw_decode,
    runlength_decode,
)
from pdfspark.kernel.objects import Stream

MAN = (
    b"Man is distinguished, not only by his reason, but by this singular "
    b"passion from other animals, which is a lust of the mind, that by a "
    b"perseverance of delight in the continued and indefatigable generation "
    b"of knowledge, exceeds the short vehemence of any carnal pleasure."
)


def test_ascii85_short_vector():
    assert ascii85_decode(b"<~9jqo^F*2M7/c~>", {}) == b"Man sure."


def test_ascii85_adobe_vector():
    enc = (
        b'9jqo^BlbD-BleB1DJ+*+F(f,q/0JhKF<GL>Cj@.4Gp$d7F!,L7@<6@)/0JDEF<G%<+EV:2F!,\n'
        b'O<DJ+*.@<*K0@<6L(Df-\\0Ec5e;DffZ(EZee.Bl.9pF"AGXBPCsi+DGm>@3BB/F*&OCAfu2/AKY\n'
        b'i(DIb:@FD,*)+C]U=@3BN#EcYf8ATD3s@q?d$AftVqCh[NqF<G:8+EV:.+Cf>-FD5W8ARlolDIa\n'
        b'l(DId<j@<?3r@:F%a+D58\'ATD4$Bl@l3De:,-DJs`8ARoFb/0JMK@qB4^F!,R<AKZ&-DfTqBG%G\n'
        b'>uD.RTpAKYo\'+CT/5+Cei#DII?(E,9)oF*2M7/c~>'
    )
    assert ascii85_decode(enc, {}) == MAN


def test_asciihex():
    assert asciihex_decode(b"48 65 6C 6C 6F >", {}) == b"Hello"
    assert asciihex_decode(b"486", {}) == b"\x48\x60"


def test_lzw_roundtrip():
    for data in (b"", b"a", b"TOBEORNOTTOBEORTOBEORNOT", MAN * 5, bytes(range(256)) * 3):
        assert lzw_decode(lzw_encode(data), {}) == data


def test_runlength_roundtrip():
    for data in (b"", b"a", b"aaaaaabbbcdddddd", MAN):
        assert runlength_decode(runlength_encode(data), {}) == data


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_predictors_roundtrip(ftype):
    data = bytes((i * 7 + 13) % 256 for i in range(160))
    cols = 16
    enc = png_predict_encode(data, cols, ftype=ftype)
    out = flate_decode(
        zlib.compress(enc), {"Predictor": 12, "Columns": cols}
    )
    assert out == data


def test_tiff_predictor():
    data = b"\x01\x02\x03\x04\x05\x06\x07\x08"
    # encoder: horizontal diff
    enc = bytearray(data)
    for i in range(len(enc) - 1, 0, -1):
        enc[i] = (enc[i] - enc[i - 1]) & 0xFF
    out = flate_decode(zlib.compress(bytes(enc)), {"Predictor": 2, "Columns": 8})
    assert out == data


def test_cascade():
    import base64

    payload = b"cascade payload"
    raw = base64.a85encode(zlib.compress(payload)) + b"~>"
    st = Stream(
        {"Filter": ["ASCII85Decode", "FlateDecode"], "Length": len(raw)}, raw
    )
    assert decode_stream(st) == payload


def test_image_filter_passthrough():
    st = Stream({"Filter": "DCTDecode", "Length": 4}, b"\xff\xd8\xff\xe0")
    assert decode_stream(st) == b"\xff\xd8\xff\xe0"


def test_external_file_stream_is_stable_soft_error():
    """/F external-file streams (§7.3.8.2): no filesystem neighbor in a
    crawl — decode must fail with the stable 'external-stream' code, and
    a document using one for page content surfaces it as a soft error."""
    import pytest

    from pdfspark.fixtures import BASE14, PdfBuilder
    from pdfspark.kernel.extract import extract_text
    from pdfspark.kernel.filters import decode_stream
    from pdfspark.kernel.objects import PdfError, Stream

    s = Stream({"F": "missing.dat", "Length": 0}, b"")
    with pytest.raises(PdfError) as e:
        decode_stream(s)
    assert e.value.code == "external-stream"

    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< /F (ext.dat) >>", b"ignored")
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    r = extract_text(b.build(root))
    assert r.error == "external-stream"
