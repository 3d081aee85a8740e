"""Content-stream tokenizer (SURVEY.md §2A.5).

Behavioral model: reference `src/content/mod.rs:15-160` (`ContentLexer`
yielding Object | Operator tokens; operands push, operators pop). Its 4
inline tests (``1 1 1 RG`` not mis-lexed as a reference; empty input;
``'``/``"`` operators; ``b*RG`` splitting) are replicated in
tests/test_content.py.

Extras over the reference: inline-image ``BI…ID…EI`` data is skipped
without desync (enum-only in the reference, `src/content/operator.rs:20`),
and ``BX…EX`` compatibility sections are honored by the *interpreter*
(unknown operators are ignored everywhere in our kernel — crash-tolerance
inverts the reference's panic, `src/content/mod.rs:41-54`).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

from pdfspark.kernel.lexer import _IS_NUMSTART, _IS_REGULAR, _IS_WS, Lexer
from pdfspark.kernel.objects import Operator, PdfError

# the full 73-operator set (reference enum: `src/content/operator.rs:3-222`)
KNOWN_OPERATORS = frozenset(
    """b B b* B* BDC BI BMC BT BX c cm cs CS d d0 d1 Do DP EI EMC ET EX f F
    f* g G gs h i ID j J k K l m M MP n q Q re RG rg ri s S sc SC scn SCN sh
    T* Tc Td TD Tf Tj TJ TL Tm Tr Ts Tw Tz v w W W* y ' \"""".split()
)

_NUMBER_START = b"0123456789+-."


def _split_operator_run(run: bytes) -> List[str]:
    """Greedy longest-known-prefix split of a regular-character run.

    Pins the reference's ``b*RG`` → [``b*``, ``RG``] behavior
    (test `src/content/mod.rs:~220`). Unknown leftovers are emitted as-is
    (the interpreter ignores unknown operators)."""
    text = run.decode("latin-1")
    if text in KNOWN_OPERATORS:
        return [text]
    out: List[str] = []
    i, n = 0, len(text)
    while i < n:
        for j in range(min(n, i + 3), i, -1):
            if text[i:j] in KNOWN_OPERATORS:
                out.append(text[i:j])
                i = j
                break
        else:
            out.append(text[i:])
            break
    return out


def tokenize_content(data: bytes) -> Iterator[Tuple[List[object], str]]:
    """Yield (operands, operator) pairs in stream order.

    Operand-stack discipline matches the reference dispatch loop
    (`src/render/mod.rs:216-298`): operands accumulate until an operator
    consumes them; the stack is cleared after every operator.
    """
    lx = Lexer(data)
    operands: List[object] = []
    pending_ops: List[str] = []
    buf, n = data, len(data)
    while True:
        if pending_ops:
            op = pending_ops.pop(0)
            if op == "BI":
                _skip_inline_image(lx)
                operands = []
                continue
            yield operands, op
            operands = []
            continue
        pos = lx.pos  # inline whitespace run (comments take the full skip)
        while pos < n and _IS_WS[buf[pos]]:
            pos += 1
        if pos < n and buf[pos] == 0x25:
            lx.pos = pos
            lx.skip_whitespace()
            pos = lx.pos
        if pos >= n:
            return
        lx.pos = pos
        c = buf[pos]
        if c == 0x2F or c == 0x28 or c == 0x3C or c == 0x5B:
            try:
                operands.append(lx.lex_object(in_content=True))
            except PdfError:
                return  # truncated stream: stop cleanly
            continue
        if _IS_NUMSTART[c]:
            try:
                operands.append(lx.lex_number())
            except PdfError:
                lx.pos += 1
            continue
        if c == 0x27 or c == 0x22:  # ' and " are delimiter-adjacent operators
            lx.pos += 1
            yield operands, chr(c)
            operands = []
            continue
        if not _IS_REGULAR[c]:
            lx.pos += 1  # stray delimiter ({,},]...): skip
            continue
        run = lx._regular_run()
        if not run:
            lx.pos += 1
            continue
        pending_ops = _split_operator_run(run)


def _skip_inline_image(lx: Lexer) -> None:
    """G5: lex key/value pairs until ``ID``, then skip binary data to the
    next whitespace-delimited ``EI`` (honoring /L when present)."""
    buf, n = lx.buf, len(lx.buf)
    params: dict = {}
    while True:
        lx.skip_whitespace()
        if lx.at_end():
            return
        if buf[lx.pos] == 0x2F:
            key = lx.lex_name()
            try:
                params[str(key)] = lx.lex_object(in_content=True)
            except PdfError:
                return
            continue
        run = lx._regular_run()
        if run == b"ID":
            break
        if not run:
            lx.pos += 1
    # one whitespace byte after ID, then raw data
    if lx.pos < n and _IS_WS[buf[lx.pos]]:
        lx.pos += 1
    length = params.get("L", params.get("Length"))
    if isinstance(length, int) and lx.pos + length <= n:
        lx.pos += length
    # scan for EI at a whitespace boundary
    pos = lx.pos
    while True:
        idx = buf.find(b"EI", pos)
        if idx == -1:
            lx.pos = n
            return
        before_ok = idx == 0 or _IS_WS[buf[idx - 1]]
        after = buf[idx + 2 : idx + 3]
        after_ok = after == b"" or _IS_WS[after[0]] or not _IS_REGULAR[after[0]]
        if before_ok and after_ok:
            lx.pos = idx + 2
            return
        pos = idx + 2
