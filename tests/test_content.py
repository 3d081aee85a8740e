"""Ports of the reference content-lexer tests (`src/content/mod.rs:162-230`)
plus inline-image and operator-splitting cases."""

from pdfspark.kernel.content import tokenize_content


def toks(src: bytes):
    out = []
    for operands, op in tokenize_content(src):
        out.extend(operands)
        out.append(("OP", op))
    return out


def test_rg_operator_is_not_parsed_as_reference():
    assert toks(b"1 1 1 RG") == [1, 1, 1, ("OP", "RG")]


def test_empty_line():
    assert toks(b"\n\n  \n\n") == []


def test_quote_operators():
    assert toks(b"( )'\"") == [b" ", ("OP", "'"), ("OP", '"')]


def test_no_space_after_star_operator():
    assert toks(b"b*RG") == [("OP", "b*"), ("OP", "RG")]


def test_inline_image_skipped_with_length():
    img = bytes(range(32)) + b" EI " + bytes(32)  # fake EI inside data
    src = b"(a) Tj BI /W 4 /L " + str(len(img)).encode() + b" ID " + img + b" EI (b) Tj"
    assert toks(src) == [b"a", ("OP", "Tj"), b"b", ("OP", "Tj")]


def test_inline_image_skipped_without_length():
    src = b"BI /W 4 ID \x01\x02\x03\xff\xfe EI (x) Tj"
    assert toks(src) == [b"x", ("OP", "Tj")]


def test_operand_stack_cleared_after_unknown_operator():
    assert toks(b"1 2 zz (t) Tj") == [1, 2, ("OP", "zz"), b"t", ("OP", "Tj")]


def test_tj_array_operand():
    got = toks(b"[(A) -120 (B)] TJ")
    assert got == [[b"A", -120, b"B"], ("OP", "TJ")]
