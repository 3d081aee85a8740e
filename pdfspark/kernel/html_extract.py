"""HTML main-content extraction (the north rule's second modality:
"HTML boilerplate strip, DOM heuristics").

Pure stdlib (html.parser) — no external deps, fully deterministic.

PINNED POLICY (goldens in tests/test_html.py define the oracle):
1. Dropped subtrees (boilerplate): script, style, noscript, template,
   head, nav, header, footer, aside, iframe, svg, form, button, select,
   option, datalist, canvas, audio, video.
2. Block-level tags start a new block; blocks are joined by "\\n".
3. Inside a block, whitespace runs collapse to a single space and block
   edges are trimmed; empty blocks are dropped.
4. Character/entity references are decoded (convert_charrefs).
5. <title> (inside the dropped <head>) is captured as document title;
   <html lang=…> as language. <br> splits blocks.
6. Malformed markup never raises: html.parser is forgiving by design;
   unclosed drop-tags drop to end of input (documented).

Output reuses the PDF kernel's ExtractResult: text, one page-0 span over
the whole text, n_pages=1, error=None, lang.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Optional

from pdfspark.kernel.extract import ExtractResult, Span

DROP_TAGS = frozenset(
    """script style noscript template head nav header footer aside iframe
    svg form button select option datalist canvas audio video""".split()
)

BLOCK_TAGS = frozenset(
    """p div br li ul ol dl dt dd h1 h2 h3 h4 h5 h6 tr td th table thead
    tbody section article main blockquote pre hr figure figcaption
    address details summary""".split()
)

# void elements never push onto the open-tag stack
_VOID = frozenset("br hr img input meta link area base col embed source track wbr".split())

_WS = re.compile(r"[ \t\r\n\f\v ]+")


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[str] = []
        self._cur: List[str] = []
        self._drop_depth = 0
        self._in_title = False
        self.title: Optional[str] = None
        self._title_parts: List[str] = []
        self.lang: Optional[str] = None

    # ------------------------------------------------------------- helpers

    def _flush_block(self) -> None:
        text = _WS.sub(" ", "".join(self._cur)).strip()
        self._cur = []
        if text:
            self.blocks.append(text)

    # ------------------------------------------------------------ handlers

    def handle_starttag(self, tag, attrs):
        if tag == "html" and self.lang is None:
            for k, v in attrs:
                if k == "lang" and v:
                    self.lang = v
        if tag == "title":
            self._in_title = True
        if tag in DROP_TAGS:
            if tag not in _VOID:
                self._drop_depth += 1
            return
        if tag in BLOCK_TAGS:
            self._flush_block()

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False
            if self.title is None:
                t = _WS.sub(" ", "".join(self._title_parts)).strip()
                self.title = t or None
        if tag in DROP_TAGS and tag not in _VOID:
            if self._drop_depth > 0:
                self._drop_depth -= 1
            return
        if tag in BLOCK_TAGS:
            self._flush_block()

    def handle_startendtag(self, tag, attrs):
        if tag in BLOCK_TAGS:
            self._flush_block()

    def handle_data(self, data):
        if self._in_title:
            self._title_parts.append(data)
        if self._drop_depth == 0:
            self._cur.append(data)

    def close(self):
        super().close()
        self._flush_block()


# link-density boilerplate tier (opt-in, r5): a block whose characters
# are MORE THAN HALF inside <a> subtrees is navigation/boilerplate —
# the jusText/Readability-family heuristic for farms the tag policy
# cannot see (a <div> of links is boilerplate; <nav> already drops).
# Counts are RAW data characters (pre-collapse), integer-exact:
# keep iff 2*link_chars <= total_chars.
LINK_DENSITY_KEEP = (2, 1)  # keep iff link*2 <= total*1


class _DensityExtractor(_Extractor):
    """Per-block link-char accounting on top of the PINNED tag policy
    (which it must not alter — it only adds counters): block_stats[i]
    is (link_raw, total_raw) for blocks[i]."""

    def __init__(self) -> None:
        super().__init__()
        self._a_depth = 0
        self._cur_link = 0
        self._cur_total = 0
        self.block_stats: List[tuple] = []

    def _flush_block(self) -> None:
        before = len(self.blocks)
        super()._flush_block()
        if len(self.blocks) > before:
            self.block_stats.append((self._cur_link, self._cur_total))
        self._cur_link = 0
        self._cur_total = 0

    # PINNED: anchors auto-close at non-void BLOCK-FORMING tags (p,
    # div, li, td, …) but legitimately span void/inline breaks (<br>).
    # Rationale (review r5 #1 + r5.2 #1): html.parser emits no endtag
    # for unclosed <a>, so without a boundary one malformed anchor
    # counts every later block as 100% link text and empties the
    # document; resetting at EVERY flush instead would let nav farms
    # written '<a>home<br>pages<br>archive</a>' read as content. This
    # diverges from the browser adoption-agency model (which
    # reconstructs anchors into following blocks) deliberately — for
    # content extraction, under-linking a malformed page beats
    # emptying it.

    # Anchor state never changes inside dropped subtrees: the
    # increment was always gated on _drop_depth == 0, and the
    # decrement/reset must be symmetric (ADVICE r5 #3) — otherwise a
    # stray </a> or block tag inside a dropped subtree (e.g.
    # '<a>x<form></a></form>farm…</a>') closes an anchor opened
    # OUTSIDE it, undercounting link chars and keeping a farm.
    # DROP_TAGS ∩ BLOCK_TAGS is empty, so checking _drop_depth before
    # super() in starttag (and after super() in endtag, which only
    # mutates drop depth for DROP tags) reads the correct state.

    def handle_starttag(self, tag, attrs):
        if tag in BLOCK_TAGS and tag not in _VOID \
                and self._drop_depth == 0:
            self._a_depth = 0
        super().handle_starttag(tag, attrs)
        if tag == "a" and self._drop_depth == 0:
            self._a_depth += 1

    def handle_endtag(self, tag):
        super().handle_endtag(tag)
        if self._drop_depth > 0:
            return
        if tag == "a" and self._a_depth > 0:
            self._a_depth -= 1
        elif tag in BLOCK_TAGS and tag not in _VOID:
            self._a_depth = 0

    def handle_data(self, data):
        super().handle_data(data)
        if self._drop_depth == 0:
            self._cur_total += len(data)
            if self._a_depth > 0:
                self._cur_link += len(data)


def extract_html_content_blocks(buf: bytes) -> List[tuple]:
    """DOM-heuristic main-content tier: the pinned tag policy plus the
    link-density rule — returns ``[(block_idx, block_text), …]`` for
    the KEPT blocks only, re-indexed densely (a dropped farm consumes
    no index). [] on parse failure (one-bad-document rule)."""
    try:
        parser = _DensityExtractor()
        parser.feed(_decode(buf))
        parser.close()
        lm, tm = LINK_DENSITY_KEEP
        out: List[tuple] = []
        for text, (link, total) in zip(parser.blocks, parser.block_stats):
            if link * lm <= total * tm:
                out.append((len(out), text))
        return out
    except Exception:
        return []


class _TableCellExtractor(HTMLParser):
    """Structured <table> extraction (the HTML twin of the PDF layout
    tier's table_cells): one (table_idx, row_idx, col_idx, text) per
    cell of each OUTERMOST table. Follows the module's pinned policy —
    DROP_TAGS subtrees (script/style/…) never contribute cell text,
    block-level tags (including <br>, <p> and nested tables) inside a
    cell become single word separators, whitespace collapses. A <td>
    directly under <table> gets the implicit row browsers synthesize
    (row 0); each new outermost table resets both counters (review
    r5.4 #2-#4)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.cells: List[tuple] = []
        self._table_depth = 0
        self._drop_depth = 0
        self._table_idx = -1
        self._row_idx = -1
        self._col_idx = -1
        self._in_cell = False
        self._cur: List[str] = []

    def _flush_cell(self) -> None:
        if self._in_cell:
            text = _WS.sub(" ", "".join(self._cur)).strip()
            self.cells.append(
                (self._table_idx, self._row_idx, self._col_idx, text)
            )
        self._cur = []
        self._in_cell = False

    def handle_starttag(self, tag, attrs):
        if tag in DROP_TAGS:
            if tag not in _VOID:
                self._drop_depth += 1
            return
        if self._drop_depth > 0:
            # dropped subtrees contribute neither text NOR structure
            # (ADVICE r5 #2): a <table> inside <nav> must not consume
            # a table_idx or emit empty cells that shift real tables.
            return
        if tag == "table":
            if self._in_cell:
                self._cur.append(" ")  # nested table = inline break
            if self._table_depth == 0:
                self._table_idx += 1
                self._row_idx = -1
                self._col_idx = -1
            self._table_depth += 1
        elif self._table_depth == 1 and tag == "tr":
            self._flush_cell()
            self._row_idx += 1
            self._col_idx = -1
        elif self._table_depth == 1 and tag in ("td", "th"):
            self._flush_cell()
            if self._row_idx < 0:
                self._row_idx = 0  # implicit <tr> for td-under-table
            self._col_idx += 1
            self._in_cell = True
        elif self._in_cell and tag in BLOCK_TAGS:
            self._cur.append(" ")  # block break inside a cell

    def handle_endtag(self, tag):
        if tag in DROP_TAGS and tag not in _VOID:
            if self._drop_depth > 0:
                self._drop_depth -= 1
            return
        if self._drop_depth > 0:
            return  # same gate as starttag: no structure from drops
        if tag == "table":
            if self._table_depth == 1:
                self._flush_cell()
            elif self._in_cell:
                self._cur.append(" ")
            self._table_depth = max(0, self._table_depth - 1)
        elif self._table_depth == 1 and tag in ("td", "th", "tr"):
            self._flush_cell()
        elif self._in_cell and tag in BLOCK_TAGS:
            self._cur.append(" ")

    def handle_startendtag(self, tag, attrs):
        if self._drop_depth > 0:
            return
        if self._in_cell and tag in BLOCK_TAGS:
            self._cur.append(" ")  # XML-style voids, e.g. <br/>

    def handle_data(self, data):
        if self._in_cell and self._drop_depth == 0:
            self._cur.append(data)

    def close(self):
        super().close()
        self._flush_cell()


def extract_html_table_cells(buf: bytes) -> List[tuple]:
    """All table cells of a page as ``[(table_idx, row_idx, col_idx,
    cell_text), …]``; [] on parse failure (one-bad-document rule)."""
    try:
        parser = _TableCellExtractor()
        parser.feed(_decode(buf))
        parser.close()
        return parser.cells
    except Exception:
        return []


# span clamp for the grid surface: the HTML spec clamps colspan to
# 1000 and rowspan to 65534; we clamp both to _SPAN_CLAMP and prune
# the pending-occupancy set to rows the parser can still reach, so a
# crafted <td rowspan=65534 colspan=1000> wall can't allocate
# unbounded memory (bomb guard, one-bad-document rule).
_SPAN_CLAMP = 512
_GRID_OCCUPANCY_CAP = 65536


class _TableGridExtractor(HTMLParser):
    """Grid-resolved <table> extraction (the HTML twin of the PDF
    layout 4a/4b tiers): one (table_idx, row_idx, col_idx, text,
    is_header) per cell of each OUTERMOST table, where col_idx is the
    GRID column after colspan/rowspan resolution — the HTML
    table-grid algorithm: a cell occupies colspan × rowspan slots, a
    new cell takes the smallest free column at or right of the running
    scan position, and covered slots are never re-emitted (matching
    the PDF ragged tier, which emits a span at its origin only).
    ``is_header`` is True exactly for <th> cells.

    Span attributes parse as positive integers; missing, invalid, or
    0 → 1 (colspan=0's span-to-end-of-colgroup semantics are out of
    scope), clamped to ``_SPAN_CLAMP``; the occupancy set is capped at
    ``_GRID_OCCUPANCY_CAP`` live slots (beyond it further rowspan
    marking truncates — a bomb guard, not a layout policy). Text
    policy is identical to the pinned _TableCellExtractor: DROP_TAGS
    subtrees contribute neither text nor structure, block tags inside
    a cell become word separators, whitespace collapses, a <td>
    directly under <table> gets the implicit row 0. The sequential
    surface (_TableCellExtractor) stays pinned and untouched — the
    two differ exactly on span inputs."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.cells: List[tuple] = []
        self._table_depth = 0
        self._drop_depth = 0
        self._table_idx = -1
        self._row_idx = -1
        self._next_col = 0
        self._cell_col = -1
        self._is_header = False
        self._occ: set = set()
        self._in_cell = False
        self._cur: List[str] = []

    @staticmethod
    def _span(attrs, name: str) -> int:
        for k, v in attrs:
            if k == name:
                try:
                    return max(1, min(_SPAN_CLAMP, int(v)))
                except (TypeError, ValueError):
                    return 1
        return 1

    def _flush_cell(self) -> None:
        if self._in_cell:
            text = _WS.sub(" ", "".join(self._cur)).strip()
            self.cells.append(
                (self._table_idx, self._row_idx, self._cell_col, text,
                 self._is_header)
            )
        self._cur = []
        self._in_cell = False

    def handle_starttag(self, tag, attrs):
        if tag in DROP_TAGS:
            if tag not in _VOID:
                self._drop_depth += 1
            return
        if self._drop_depth > 0:
            return  # dropped subtrees: no text, no structure
        if tag == "table":
            if self._in_cell:
                self._cur.append(" ")  # nested table = inline break
            if self._table_depth == 0:
                self._table_idx += 1
                self._row_idx = -1
                self._next_col = 0
                self._occ = set()
            self._table_depth += 1
        elif self._table_depth == 1 and tag == "tr":
            self._flush_cell()
            self._row_idx += 1
            self._next_col = 0
            # spans from finished rows can never occupy again
            self._occ = {e for e in self._occ if e[0] >= self._row_idx}
        elif self._table_depth == 1 and tag in ("td", "th"):
            self._flush_cell()
            if self._row_idx < 0:
                self._row_idx = 0  # implicit <tr> for td-under-table
            c = self._next_col
            while (self._row_idx, c) in self._occ:
                c += 1
            cs = self._span(attrs, "colspan")
            rs = self._span(attrs, "rowspan")
            for rr in range(self._row_idx + 1, self._row_idx + rs):
                for cc in range(c, c + cs):
                    if len(self._occ) >= _GRID_OCCUPANCY_CAP:
                        break
                    self._occ.add((rr, cc))
            self._cell_col = c
            self._next_col = c + cs
            self._is_header = tag == "th"
            self._in_cell = True
        elif self._in_cell and tag in BLOCK_TAGS:
            self._cur.append(" ")  # block break inside a cell

    def handle_endtag(self, tag):
        if tag in DROP_TAGS and tag not in _VOID:
            if self._drop_depth > 0:
                self._drop_depth -= 1
            return
        if self._drop_depth > 0:
            return
        if tag == "table":
            if self._table_depth == 1:
                self._flush_cell()
            elif self._in_cell:
                self._cur.append(" ")
            self._table_depth = max(0, self._table_depth - 1)
        elif self._table_depth == 1 and tag in ("td", "th", "tr"):
            self._flush_cell()
        elif self._in_cell and tag in BLOCK_TAGS:
            self._cur.append(" ")

    def handle_startendtag(self, tag, attrs):
        if self._drop_depth > 0:
            return
        if self._in_cell and tag in BLOCK_TAGS:
            self._cur.append(" ")

    def handle_data(self, data):
        if self._in_cell and self._drop_depth == 0:
            self._cur.append(data)

    def close(self):
        super().close()
        self._flush_cell()


def extract_html_table_grid(buf: bytes) -> List[tuple]:
    """Grid-resolved table cells of a page as ``[(table_idx, row_idx,
    col_idx, cell_text, is_header), …]``; [] on parse failure
    (one-bad-document rule)."""
    try:
        parser = _TableGridExtractor()
        parser.feed(_decode(buf))
        parser.close()
        return parser.cells
    except Exception:
        return []


_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})


class _OutlineExtractor(HTMLParser):
    """Document heading outline: one (ord_idx, level, text) per
    <h1>-<h6> element, in document order. Pinned policy — DROP_TAGS
    subtrees contribute no headings (a nav's section links are
    chrome, not structure), text inside a heading follows the
    module's rules (inline tags flow, block tags become word
    separators, whitespace collapses), a new heading start while one
    is open flushes the previous (HTML forbids nesting them), and a
    heading that collapses to EMPTY text is skipped without consuming
    an ord_idx (anchor-only headings are layout artifacts)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.headings: List[tuple] = []
        self._drop_depth = 0
        self._level = 0
        self._cur: List[str] = []

    def _flush(self) -> None:
        if self._level:
            text = _WS.sub(" ", "".join(self._cur)).strip()
            if text:
                self.headings.append(
                    (len(self.headings), self._level, text)
                )
        self._level = 0
        self._cur = []

    def handle_starttag(self, tag, attrs):
        if tag in DROP_TAGS:
            if tag not in _VOID:
                self._drop_depth += 1
            return
        if self._drop_depth > 0:
            return
        if tag in _HEADING_TAGS:
            self._flush()
            self._level = int(tag[1])
        elif self._level and tag in BLOCK_TAGS:
            self._cur.append(" ")

    def handle_endtag(self, tag):
        if tag in DROP_TAGS and tag not in _VOID:
            if self._drop_depth > 0:
                self._drop_depth -= 1
            return
        if self._drop_depth > 0:
            return
        if tag in _HEADING_TAGS:
            self._flush()
        elif self._level and tag in BLOCK_TAGS:
            self._cur.append(" ")

    def handle_startendtag(self, tag, attrs):
        if self._drop_depth > 0:
            return
        if self._level and tag in BLOCK_TAGS:
            self._cur.append(" ")

    def handle_data(self, data):
        if self._level and self._drop_depth == 0:
            self._cur.append(data)

    def close(self):
        super().close()
        self._flush()


def extract_html_outline(buf: bytes) -> List[tuple]:
    """Heading outline of a page as ``[(ord_idx, level, text), …]``;
    [] on parse failure (one-bad-document rule)."""
    try:
        parser = _OutlineExtractor()
        parser.feed(_decode(buf))
        parser.close()
        return parser.headings
    except Exception:
        return []


class _ListExtractor(HTMLParser):
    """Structured list extraction: one ``(list_idx, item_idx, ordered,
    item_text)`` per rendered <li>, in document order. Pinned policy:

    1. list_idx = document-order rank of the <ul>/<ol> OPEN tag among
       lists outside DROP_TAGS subtrees — a list consumes its index
       even when all its items collapse empty (geometry before data,
       the table-stop stance).
    2. item_idx counts only EMITTED items within its list: an <li>
       whose text collapses to empty is skipped without consuming a
       rank (anchor-only items are layout artifacts — the heading
       policy's stance).
    3. ordered = 1 for <ol>, 0 for <ul> (long, driver scalar rule).
    4. A nested <ul>/<ol> inside an <li> is its OWN list (the next
       list_idx by open position); its content contributes nothing to
       the parent item's text, and the parent item RESUMES after the
       nested list closes (the nest boundary acts as a word
       separator).
    5. DROP_TAGS subtrees contribute neither lists nor items; an <li>
       outside any open list is ignored; a new <li> while one is open
       flushes the previous (HTML auto-closing); </ul>/</ol> flushes
       its open item, as does end-of-input for unclosed lists.
    6. Item text follows the module's rules: inline tags flow, other
       BLOCK_TAGS inside an item become word separators, whitespace
       collapses, edges trim."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.items: List[tuple] = []
        self._drop_depth = 0
        self._n_lists = 0
        self._stack: List[dict] = []

    def _top(self):
        return self._stack[-1] if self._stack else None

    def _flush_item(self) -> None:
        fr = self._top()
        if fr and fr["open"]:
            text = _WS.sub(" ", "".join(fr["cur"])).strip()
            if text:
                self.items.append(
                    (fr["idx"], fr["count"], fr["ordered"], text)
                )
                fr["count"] += 1
            fr["open"] = False
            fr["cur"] = []

    def handle_starttag(self, tag, attrs):
        if tag in DROP_TAGS:
            if tag not in _VOID:
                self._drop_depth += 1
            return
        if self._drop_depth > 0:
            return
        if tag in ("ul", "ol"):
            fr = self._top()
            if fr and fr["open"]:
                fr["cur"].append(" ")  # nest boundary = separator
            self._stack.append(
                {"idx": self._n_lists, "count": 0,
                 "ordered": 1 if tag == "ol" else 0,
                 "open": False, "cur": []}
            )
            self._n_lists += 1
        elif tag == "li":
            if self._stack:
                self._flush_item()
                self._top()["open"] = True
        else:
            fr = self._top()
            if fr and fr["open"] and tag in BLOCK_TAGS:
                fr["cur"].append(" ")

    def handle_endtag(self, tag):
        if tag in DROP_TAGS and tag not in _VOID:
            if self._drop_depth > 0:
                self._drop_depth -= 1
            return
        if self._drop_depth > 0:
            return
        if tag in ("ul", "ol"):
            if self._stack:
                self._flush_item()
                self._stack.pop()
                fr = self._top()
                if fr and fr["open"]:
                    fr["cur"].append(" ")  # parent resumes
        elif tag == "li":
            self._flush_item()
        else:
            fr = self._top()
            if fr and fr["open"] and tag in BLOCK_TAGS:
                fr["cur"].append(" ")

    def handle_startendtag(self, tag, attrs):
        if self._drop_depth > 0 or tag in DROP_TAGS:
            return
        fr = self._top()
        if fr and fr["open"] and tag in BLOCK_TAGS:
            fr["cur"].append(" ")

    def handle_data(self, data):
        if self._drop_depth > 0:
            return
        fr = self._top()
        if fr and fr["open"]:
            fr["cur"].append(data)

    def close(self):
        super().close()
        while self._stack:
            self._flush_item()
            self._stack.pop()


def extract_html_list_items(buf: bytes) -> List[tuple]:
    """List items of a page as ``[(list_idx, item_idx, ordered,
    item_text), …]``; [] on parse failure (one-bad-document rule)."""
    try:
        parser = _ListExtractor()
        parser.feed(_decode(buf))
        parser.close()
        return parser.items
    except Exception:
        return []


class _SectionExtractor(_OutlineExtractor):
    """Section chunking on top of the outline policy: each emitted
    heading additionally carries its SECTION text — all content text
    after the heading's end up to the next heading start (or document
    end), under the module's pinned text rules (DROP_TAGS subtrees
    contribute nothing, block tags become word separators, whitespace
    collapses). Text before the first emitted heading is preamble and
    belongs to no section; a skipped (empty) heading neither starts a
    section nor breaks the current one. This is the training-data
    chunking primitive: one (heading, section) pair per document
    region."""

    def __init__(self) -> None:
        super().__init__()
        self._sections: List[List[str]] = []

    def _flush(self) -> None:
        before = len(self.headings)
        super()._flush()
        if len(self.headings) > before:
            self._sections.append([])

    def handle_starttag(self, tag, attrs):
        super().handle_starttag(tag, attrs)
        if (self._drop_depth == 0 and not self._level
                and tag not in DROP_TAGS
                and tag in BLOCK_TAGS and self._sections):
            self._sections[-1].append(" ")

    def handle_endtag(self, tag):
        super().handle_endtag(tag)
        if (self._drop_depth == 0 and not self._level
                and tag not in DROP_TAGS
                and tag in BLOCK_TAGS and self._sections):
            self._sections[-1].append(" ")

    def handle_startendtag(self, tag, attrs):
        super().handle_startendtag(tag, attrs)
        if (self._drop_depth == 0 and not self._level
                and tag in BLOCK_TAGS and self._sections):
            self._sections[-1].append(" ")

    def handle_data(self, data):
        if self._level:
            super().handle_data(data)
        elif self._drop_depth == 0 and self._sections:
            self._sections[-1].append(data)

    def sections(self) -> List[tuple]:
        out = []
        for (ord_idx, level, text), body in zip(self.headings,
                                                self._sections):
            out.append(
                (ord_idx, level, text,
                 _WS.sub(" ", "".join(body)).strip())
            )
        return out


def extract_html_sections(buf: bytes) -> List[tuple]:
    """Section chunks of a page as ``[(ord_idx, level, heading_text,
    section_text), …]``; [] on parse failure (one-bad-document
    rule)."""
    try:
        parser = _SectionExtractor()
        parser.feed(_decode(buf))
        parser.close()
        return parser.sections()
    except Exception:
        return []


_ENC_RE = re.compile(rb"charset=[\"']?([A-Za-z0-9_\-]+)", re.I)


def _decode(buf: bytes) -> str:
    """utf-8 first (the web default), then a declared charset, then
    latin-1 (never fails)."""
    try:
        return buf.decode("utf-8")
    except UnicodeDecodeError:
        pass
    m = _ENC_RE.search(buf[:2048])
    if m:
        try:
            return buf.decode(m.group(1).decode("ascii"), "replace")
        except (LookupError, UnicodeDecodeError):
            pass
    return buf.decode("latin-1", "replace")


def extract_html(buf: bytes) -> ExtractResult:
    """Extract main-content text from one HTML byte buffer. Never raises."""
    try:
        parser = _Extractor()
        parser.feed(_decode(buf))
        parser.close()
        text = "\n".join(parser.blocks)
        return ExtractResult(
            text, [Span(0, 0, len(text))], 1, None, parser.lang,
            parser.title, None,
        )
    except Exception:
        return ExtractResult(None, [], 0, "html-parse", None)


_HTML_HINT = re.compile(
    rb"^\s*(?:<!doctype\s+html|<html|<head|<body|<\?xml|<!--)", re.I
)


def looks_like_html(buf: bytes) -> bool:
    return bool(_HTML_HINT.match(buf[:256])) or b"<html" in buf[:1024].lower()
