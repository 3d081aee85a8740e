"""Cross-reference table / stream parsing + trailer chain (SURVEY.md §2A.1
S2-S6).

Behavioral model: reference `src/xref/parser.rs` (classic tables, backwards
startxref scan), `src/xref/stream/parser.rs` (binary W-field xref streams),
`src/xref/mod.rs:57-62` (incremental-update newest-wins merge). Written
fresh per PDF 32000 §7.5.4/§7.5.8.

Adds a recovery mode the reference lacks (its failure path is
``todo!("failed to find xref")``, `src/xref/parser.rs:82`): a linear
``N G obj`` rescan for web-crawl dirt.
"""

from __future__ import annotations

import re
from typing import Dict, NamedTuple, Optional, Tuple

from pdfspark.kernel.filters import decode_stream
from pdfspark.kernel.lexer import Lexer
from pdfspark.kernel.objects import PdfError, Reference, Stream


class XrefEntry(NamedTuple):
    """kind: 1 = in-use (pos=byte offset), 2 = compressed (pos=container
    objnum, idx=index within), 0 = free."""

    kind: int
    pos: int
    idx: int = 0


class XrefTable:
    __slots__ = ("entries", "trailer")

    def __init__(self) -> None:
        self.entries: Dict[int, XrefEntry] = {}
        self.trailer: dict = {}

    def merge_older(self, other: "XrefTable") -> None:
        """Newest-wins: we walk the Prev chain newest→oldest, so entries
        already present are kept (reference: `src/xref/mod.rs:57-62`)."""
        for k, v in other.entries.items():
            self.entries.setdefault(k, v)
        for k, v in other.trailer.items():
            self.trailer.setdefault(k, v)


def find_startxref(buf: bytes) -> Optional[int]:
    """S2: backwards scan for the last ``startxref`` + trailing offset
    (reference scans 1 KiB windows, `src/xref/parser.rs:76-105`)."""
    idx = buf.rfind(b"startxref", max(0, len(buf) - 2048))
    if idx == -1:
        idx = buf.rfind(b"startxref")
    if idx == -1:
        return None
    m = re.match(rb"startxref\s+(\d+)", buf[idx : idx + 40])
    if not m:
        return None
    return int(m.group(1))


_CLASSIC_ENTRY = re.compile(rb"(\d{10})\s(\d{5})\s([fn])")


def parse_xref_at(buf: bytes, offset: int) -> Tuple[XrefTable, Optional[int]]:
    """S3/S4: parse one xref section (classic table or xref stream) at
    ``offset``. Returns (table, prev_offset)."""
    if offset < 0 or offset >= len(buf):
        raise PdfError("xref", f"startxref offset {offset} out of range")
    lx = Lexer(buf, offset)
    lx.skip_whitespace()
    if buf[lx.pos : lx.pos + 4] == b"xref":
        return _parse_classic(buf, lx)
    return _parse_stream_section(buf, lx)


def _parse_classic(buf: bytes, lx: Lexer) -> Tuple[XrefTable, Optional[int]]:
    """Classic text table: subsection headers ``first count`` + 20-byte
    entries (reference: `src/xref/parser.rs:169-233`). Entry regex is
    tolerant of 19-byte rows / loose EOLs."""
    lx.pos += 4
    table = XrefTable()
    while True:
        lx.skip_whitespace()
        if buf[lx.pos : lx.pos + 7] == b"trailer":
            lx.pos += 7
            break
        m = re.match(rb"(\d+)\s+(\d+)", buf[lx.pos : lx.pos + 40])
        if not m:
            break
        first, count = int(m.group(1)), int(m.group(2))
        lx.pos += m.end()
        lx.skip_whitespace()
        # fast path: spec-conformant 20-byte fixed-stride entries parsed
        # by slicing; fall back to per-entry regex on any anomaly
        block = buf[lx.pos : lx.pos + 20 * count]
        # one strided slice validates every entry's kind byte at once
        if len(block) == 20 * count and not (
            set(block[17::20]) - {0x6E, 0x66}
        ):
            setdefault = table.entries.setdefault
            for i in range(count):
                o = 20 * i
                if block[o + 17] == 0x6E:  # 'n'
                    setdefault(first + i, XrefEntry(1, int(block[o : o + 10])))
                else:
                    setdefault(first + i, XrefEntry(0, 0))
            lx.pos += 20 * count
            lx.skip_whitespace()
            continue
        for i in range(count):
            em = _CLASSIC_ENTRY.match(buf, lx.pos)
            if not em:
                raise PdfError("xref", f"bad classic entry at {lx.pos}")
            pos10, gen5, kind = em.groups()
            objnum = first + i
            if kind == b"n":
                table.entries.setdefault(objnum, XrefEntry(1, int(pos10)))
            else:
                table.entries.setdefault(objnum, XrefEntry(0, 0))
            lx.pos = em.end()
            lx.skip_whitespace()
    lx.skip_whitespace()
    if buf[lx.pos : lx.pos + 2] == b"<<":
        table.trailer = lx.lex_dict()
    prev = table.trailer.get("Prev")
    # hybrid files: /XRefStm points at an xref *stream* holding objstm refs
    xrefstm = table.trailer.get("XRefStm")
    if isinstance(xrefstm, int):
        try:
            st, _ = parse_xref_at(buf, xrefstm)
            table.merge_older(st)
        except PdfError:
            pass
    return table, prev if isinstance(prev, int) else None


def _parse_stream_section(buf: bytes, lx: Lexer) -> Tuple[XrefTable, Optional[int]]:
    """S4: xref stream — W field widths, Index subsections, types 0/1/2
    (reference: `src/xref/stream/parser.rs:52-145`)."""
    _, _, obj = lx.lex_indirect_object()
    if not isinstance(obj, Stream):
        raise PdfError("xref", "xref offset does not point at table or stream")
    d = obj.dict
    data = decode_stream(obj)
    widths = d.get("W")
    if not (isinstance(widths, list) and len(widths) >= 3):
        raise PdfError("xref", "xref stream missing W")
    w0, w1, w2 = (int(x) for x in widths[:3])
    size = int(d.get("Size", 0))
    index = d.get("Index") or [0, size]
    rowlen = w0 + w1 + w2
    table = XrefTable()
    table.trailer = {k: v for k, v in d.items()
                     if k in ("Size", "Prev", "Root", "Encrypt", "ID", "Info")}
    pos = 0
    pairs = [(int(index[i]), int(index[i + 1])) for i in range(0, len(index) - 1, 2)]
    for first, count in pairs:
        for i in range(count):
            if pos + rowlen > len(data):
                break
            f0 = int.from_bytes(data[pos : pos + w0], "big") if w0 else 1
            f1 = int.from_bytes(data[pos + w0 : pos + w0 + w1], "big")
            f2 = int.from_bytes(data[pos + w0 + w1 : pos + rowlen], "big")
            pos += rowlen
            objnum = first + i
            if f0 == 1:
                table.entries.setdefault(objnum, XrefEntry(1, f1))
            elif f0 == 2:
                table.entries.setdefault(objnum, XrefEntry(2, f1, f2))
            else:
                table.entries.setdefault(objnum, XrefEntry(0, 0))
    prev = d.get("Prev")
    return table, prev if isinstance(prev, int) else None


def parse_xref_chain(buf: bytes, max_sections: int = 64) -> XrefTable:
    """S5: follow the Prev chain newest→oldest, newest wins
    (reference loop: `src/lib.rs:446-461`). Falls back to recovery scan."""
    offset = find_startxref(buf)
    if offset is None:
        return recover_xref(buf)
    table = XrefTable()
    seen = set()
    try:
        while offset is not None and offset not in seen and len(seen) < max_sections:
            seen.add(offset)
            section, prev = parse_xref_at(buf, offset)
            table.merge_older(section)
            offset = prev
    except (PdfError, ValueError, TypeError, OverflowError):
        # malformed W/Index/Prev values must fall through to recovery —
        # dirty input is exactly what the recovery scan exists for
        if not table.entries:
            return recover_xref(buf)
    if not table.entries or "Root" not in table.trailer:
        rec = recover_xref(buf)
        rec.merge_older(table)  # recovered offsets win only where missing
        table.entries, base_trailer = rec.entries, table.trailer
        table.trailer = rec.trailer or base_trailer
    return table


_OBJ_HEADER = re.compile(rb"(?m)^[\x00\t\x0c ]*(\d+)\s+(\d+)\s+obj\b")


def recover_xref(buf: bytes) -> XrefTable:
    """Recovery mode (ours; reference panics instead): linear scan for
    ``N G obj`` headers, last definition wins; trailer recovered from the
    last ``trailer`` dict or by locating a /Type /Catalog object."""
    table = XrefTable()
    for m in _OBJ_HEADER.finditer(buf):
        objnum = int(m.group(1))
        table.entries[objnum] = XrefEntry(1, m.start())  # later defs overwrite
    tidx = buf.rfind(b"trailer")
    if tidx != -1:
        lx = Lexer(buf, tidx + 7)
        try:
            lx.skip_whitespace()
            if buf[lx.pos : lx.pos + 2] == b"<<":
                table.trailer = lx.lex_dict()
        except PdfError:
            pass
    if "Root" not in table.trailer:
        # find a catalog among recovered objects
        for objnum, entry in table.entries.items():
            try:
                lx = Lexer(buf, entry.pos)
                _, gen, obj = lx.lex_indirect_object()
                if isinstance(obj, dict) and str(obj.get("Type")) == "Catalog":
                    table.trailer["Root"] = Reference(objnum, gen)
                    break
                if isinstance(obj, Stream) and "Root" in obj.dict:
                    # xref stream doubles as trailer
                    for k in ("Root", "Info", "Encrypt", "Size", "ID"):
                        if k in obj.dict:
                            table.trailer.setdefault(k, obj.dict[k])
            except PdfError:
                continue
    if not table.entries:
        raise PdfError("xref", "no objects recoverable")
    return table
