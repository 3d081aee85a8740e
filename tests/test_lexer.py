"""Ports of the reference object-lexer unit tests (`src/lex.rs:564-672`)
plus spec-unit cases for paths the reference stubs (SURVEY.md §5 plan #1/#2).
"""

import pytest

from pdfspark.kernel.lexer import Lexer
from pdfspark.kernel.objects import Name, PdfString, Reference, Stream


def lex(src: bytes):
    return Lexer(src).lex_object()


# ---- ports of `src/lex.rs` tests ----------------------------------------

def test_empty_array():
    assert lex(b"[]") == []
    assert lex(b"[   ]") == []


def test_array_single_element_whitespace_forms():
    for src in (b"[1.0]", b"[   1.0   ]", b"[1.0   ]", b"[   1.0]"):
        assert lex(src) == [1.0]


def test_string_with_escapes():
    assert lex(b"(\\n\\ra\\t\\)3\\\\)") == b"\n\ra\t)3\\"


def test_string_with_octal_escapes():
    assert lex(b"(\\0\\0053\\053\\53)") == b"\x00\x053++"


def test_empty_hex_string():
    assert lex(b"<>") == b""


def test_hex_string():
    assert lex(b"<005B>") == b"\x00\x5b"


def test_odd_length_hex_string():
    assert lex(b"<901FA>") == b"\x90\x1f\xa0"


def test_keywords():
    assert lex(b"true") is True
    assert lex(b"false") is False
    assert lex(b"null") is None


def test_floats():
    assert lex(b"1.0") == 1.0
    assert lex(b"+1.0") == 1.0
    assert lex(b".5") == 0.5
    assert lex(b"+.5") == 0.5
    assert lex(b"-1.0") == -1.0
    assert lex(b"-.5") == -0.5
    assert lex(b"05.05") == 5.05


def test_names():
    assert lex(b"/a") == "a"
    assert lex(b"/abcde") == "abcde"
    assert lex(b"/1.4") == "1.4"
    assert lex(b"/$1.4") == "$1.4"
    assert lex(b"/abc[") == "abc"
    assert lex(b"/abc<") == "abc"


def test_comments():
    assert lex(b"%\n(abc)") == b"abc"
    assert lex(b"%%\n(abc)") == b"abc"
    assert lex(b"%%%%%\n(abc)") == b"abc"
    assert lex(b"%(effg)\n(abc)") == b"abc"
    assert lex(b"%(z)\n%(y)\n%(x)\n(abc)%(z)\n%(y)\n%(x)\n") == b"abc"


# ---- our additions --------------------------------------------------------

def test_reference_lookahead():
    assert lex(b"12 0 R") == Reference(12, 0)
    assert lex(b"12 0 RG") == 12  # not a reference
    assert lex(b"12 0") == 12


def test_name_hex_escape():
    assert lex(b"/A#20B") == "A B"


def test_dict_and_nested():
    d = lex(b"<< /A 1 /B [2 (x)] /C << /D /E >> >>")
    assert d == {"A": 1, "B": [2, b"x"], "C": {"D": "E"}}


def test_stream_promotion_and_slice():
    src = b"<< /Length 5 >>\nstream\nhello\nendstream"
    st = lex(src)
    assert isinstance(st, Stream)
    assert bytes(st.data) == b"hello"


def test_stream_bad_length_falls_back_to_endstream_scan():
    src = b"<< /Length 9999 >>\nstream\nhello\nendstream"
    st = lex(src)
    assert bytes(st.data) == b"hello"


def test_string_line_continuation_and_eol_normalization():
    assert lex(b"(a\\\nb)") == b"ab"
    assert lex(b"(a\r\nb)") == b"a\nb"
    assert lex(b"(a\rb)") == b"a\nb"


def test_indirect_object():
    n, g, obj = Lexer(b"7 0 obj\n(hi)\nendobj").lex_indirect_object()
    assert (n, g, obj) == (7, 0, b"hi")


# ---- date parser ports (`src/date.rs:138-178`) ---------------------------

def test_date_full_z():
    from pdfspark.kernel.dates import parse_pdf_date

    d = parse_pdf_date("D:20201125021108Z'")
    assert d["year"] == 2020 and d["month"] == 11 and d["day"] == 25
    assert d["hour"] == 2 and d["minute"] == 11 and d["second"] == 8
    assert d["ut"] == "=" and d["ut_hour"] is None


def test_date_with_offsets():
    from pdfspark.kernel.dates import parse_pdf_date

    d = parse_pdf_date("D:20201203184827-08'00'")
    assert d["ut"] == "-" and d["ut_hour"] == 8 and d["ut_minute"] == 0


def test_date_partial():
    from pdfspark.kernel.dates import parse_pdf_date

    d = parse_pdf_date("D:2020")
    assert d["year"] == 2020 and d["month"] is None


def test_stream_recovery_skips_embedded_endstream_bytes():
    """Missing /Length + binary body containing the literal bytes
    'endstream': recovery must pick the occurrence followed by 'endobj',
    not the first one inside the data."""
    from pdfspark.kernel.lexer import Lexer
    from pdfspark.kernel.objects import Stream

    body = b"BINARY\x00endstream\x01MORE\x02DATA"
    buf = (b"1 0 obj\n<< >>\nstream\n" + body
           + b"\nendstream\nendobj\n2 0 obj\n3\nendobj")
    lx = Lexer(buf, 0)
    num, gen, obj = lx.lex_indirect_object()
    assert num == 1 and isinstance(obj, Stream)
    assert bytes(obj.data) == body


def test_stream_recovery_falls_back_to_first_match():
    """Truncated tail: no qualifying endstream at all — first match wins
    so a damaged document still yields its prefix."""
    from pdfspark.kernel.lexer import Lexer
    from pdfspark.kernel.objects import Stream

    buf = b"1 0 obj\n<< >>\nstream\nDATA\nendstream\x00\xff junk"
    lx = Lexer(buf, 0)
    num, gen, obj = lx.lex_indirect_object()
    assert isinstance(obj, Stream)
    assert bytes(obj.data) == b"DATA"


def test_reference_lookahead_edge_cases():
    """The inlined N G R scan must match the reference's maximal-run
    semantics exactly (`src/content/mod.rs:166` inverse cases)."""
    from pdfspark.kernel.lexer import Lexer
    from pdfspark.kernel.objects import Reference

    def lex(buf):
        return Lexer(buf, 0).lex_object()

    assert lex(b"12 0 R ") == Reference(12, 0)
    assert lex(b"12 0R ") == Reference(12, 0)      # no space before R
    assert lex(b"12 0 R") == Reference(12, 0)      # R at EOF
    assert lex(b"12 0 Rx ") == 12                  # 'Rx' is not R
    assert lex(b"12 0 RG ") == 12                  # operator, not ref
    assert lex(b"12 0.5 R ") == 12                 # non-integer gen
    assert lex(b"12 %c\n 0 %c\n R ") == Reference(12, 0)  # comments
    assert lex(b"12 13 14 ") == 12                 # no R at all
    # after a failed lookahead the cursor must be exactly after the number
    lx = Lexer(b"12 34 56", 0)
    assert lx.lex_object() == 12 and lx.pos == 2
