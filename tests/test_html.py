"""HTML main-content extraction goldens (pinned policy in
kernel/html_extract.py) + modality dispatch."""

from pdfspark.docgen import text_to_html, text_to_pdf
from pdfspark.kernel.extract import extract_document
from pdfspark.kernel.html_extract import extract_html, looks_like_html


def test_boilerplate_stripped_roundtrip():
    text = "the quick brown fox jumps over the lazy dog"
    r = extract_html(text_to_html(text, 42, "de"))
    assert r.text == text
    assert r.error is None
    assert r.lang == "de"
    assert r.n_pages == 1
    assert r.spans[0] == (0, 0, len(text))


def test_blocks_join_with_newlines():
    html = b"<body><p>one</p><p>two</p><div>three <b>bold</b></div></body>"
    assert extract_html(html).text == "one\ntwo\nthree bold"


def test_br_splits_blocks():
    assert extract_html(b"<p>a<br>b</p>").text == "a\nb"


def test_whitespace_collapses_within_block():
    assert extract_html(b"<p>  a \n\t b  </p>").text == "a b"


def test_entities_decoded():
    assert extract_html(b"<p>a &amp; b &lt;c&gt; &#8212; d</p>").text == \
        "a & b <c> — d"


def test_script_style_nav_dropped():
    html = (b"<head><title>T</title><style>p{}</style></head>"
            b"<body><script>var x='<p>fake</p>';</script>"
            b"<nav>menu</nav><header>hdr</header>"
            b"<p>real</p><footer>ftr</footer><aside>ads</aside></body>")
    r = extract_html(html)
    assert r.text == "real"


def test_nested_drop_subtrees():
    html = b"<body><nav><div><p>deep menu</p></div></nav><p>kept</p></body>"
    assert extract_html(html).text == "kept"


def test_malformed_never_raises():
    for junk in (b"<p>unclosed", b"<<<>>>", b"<body><div></span></p>",
                 b"\xff\xfe<html>", b"<p>" + b"<div>" * 200 + b"x"):
        r = extract_html(junk)
        assert r.error is None or r.error == "html-parse"


def test_latin1_charset_declared():
    html = ('<html><head><meta charset="iso-8859-1"></head>'
            "<body><p>caf\xe9</p></body></html>").encode("latin-1")
    assert extract_html(html).text == "café"


def test_dispatch_routes_by_magic():
    assert extract_document(text_to_pdf("pdf text")).text == "pdf text"
    assert extract_document(text_to_html("html text", 1)).text == "html text"
    assert extract_document(b"\x00\x01binary junk").error == "unknown-format"
    assert extract_document(b"").error == "unknown-format"
    assert extract_document(None).error == "unknown-format"


def test_looks_like_html_hints():
    assert looks_like_html(b"<!DOCTYPE html><html>")
    assert looks_like_html(b"  \n<html lang='en'>")
    assert looks_like_html(b"<!-- comment --><html>")
    assert not looks_like_html(b"%PDF-1.7")
    assert not looks_like_html(b"plain text file")


def test_title_captured():
    html = b"<head><title> My  Page </title></head><body><p>x</p></body>"
    from pdfspark.kernel.html_extract import _Extractor

    p = _Extractor()
    p.feed(html.decode())
    p.close()
    assert p.title == "My Page"


def test_link_density_blocks_drop_farms_keep_inline_links():
    """The jusText-style density tier (r5): link farms in plain <div>s
    — which the pinned tag policy KEEPS — drop under the >50%
    link-char rule; content paragraphs survive byte-identically, a
    small inline link inside a paragraph survives (density, not tag
    presence), and kept blocks re-index densely."""
    from pdfspark.docgen import text_to_html_linkfarm
    from pdfspark.kernel.html_extract import (
        extract_html,
        extract_html_content_blocks,
    )

    text = ("the fast key order sort table scan merge part window small "
            "hash scan join order batch value line agg row extra words")
    buf = text_to_html_linkfarm(text, 7)
    words = text.split(" ")
    exp = [(k, " ".join(words[k * 12:(k + 1) * 12]))
           for k in range((len(words) + 11) // 12)]
    assert extract_html_content_blocks(buf) == exp
    # the farms really are invisible to the tag policy (the point)
    assert "sitemap" in extract_html(buf).text
    # a block that is MOSTLY one link drops even inside <p>
    mostly_link = (b'<html><body><p><a href="/x">all link text here'
                   b'</a> y</p><p>real content words</p></body></html>')
    assert extract_html_content_blocks(mostly_link) == \
        [(0, "real content words")]
    # malformed input: a concrete deterministic value, not an exception
    # (html.parser tolerates the stray NUL as block text)
    assert extract_html_content_blocks(b"\x00<div><a>") == [(0, "\x00")]
    # unbalanced </a> clamps rather than corrupting counts
    assert extract_html_content_blocks(
        b"<html><body></a><p>plain words here</p></body></html>"
    ) == [(0, "plain words here")]
    # UNCLOSED <a> must not leak link state past its block: one
    # malformed anchor would otherwise count every later block as
    # 100% link text and empty the document (review r5 #1)
    leaked = extract_html_content_blocks(
        b'<html><body><p><a href="/x">click here</p>'
        b"<p>a real content paragraph with many plain words</p>"
        b"</body></html>"
    )
    assert (0, "a real content paragraph with many plain words") in leaked
    # anchors legitimately SPAN <br> (void break): a nav farm written
    # as one anchor with <br> separators is still 100% link text in
    # every block (review r5.2 #1 — the block-boundary reset must not
    # fire on void tags)
    farm_br = extract_html_content_blocks(
        b'<html><body><div><a href="/h">home<br>pages<br>archive</a>'
        b"</div><p>genuine article text here</p></body></html>"
    )
    assert farm_br == [(0, "genuine article text here")]
    # generator guard is CHAR density (review r5 #2): a first word
    # longer than the rest of the block must not get the inline link
    # (it would flip the whole block to boilerplate and diverge from
    # the closed-form oracle)
    tricky = "antidisestablishmentarianism is a war"
    got = extract_html_content_blocks(text_to_html_linkfarm(tricky, 1))
    assert got == [(0, tricky)]


def test_html_table_cell_extractor_scoping():
    """The table-cell extractor scopes to table content (chrome outside
    tables never leaks in), th counts as a cell, nested tables flatten
    into their enclosing cell, and malformed input yields []."""
    from pdfspark.kernel.html_extract import extract_html_table_cells

    page = (b"<html><body><nav>menu</nav>"
            b"<table><tr><th>h1</th><th>h2</th></tr>"
            b"<tr><td>a b</td><td>c</td></tr></table>"
            b"<p>prose</p>"
            b"<table><tr><td>x<table><tr><td>inner</td></tr></table>"
            b"y</td></tr></table>"
            b"</body></html>")
    got = extract_html_table_cells(page)
    assert got == [
        (0, 0, 0, "h1"), (0, 0, 1, "h2"),
        (0, 1, 0, "a b"), (0, 1, 1, "c"),
        (1, 0, 0, "x inner y"),
    ]
    assert extract_html_table_cells(b"<table><tr><td>open") == \
        [(0, 0, 0, "open")]
    assert extract_html_table_cells(b"") == []


def test_html_table_cells_policy_conformance():
    """Review r5.4 #2-#4: DROP_TAGS subtrees never leak into cell
    text, block breaks inside a cell become word separators, a <td>
    directly under <table> gets the implicit browser row, and counters
    reset per outermost table."""
    from pdfspark.kernel.html_extract import extract_html_table_cells

    assert extract_html_table_cells(
        b"<table><tr><td>a<script>var x=1;</script>b</td></tr></table>"
    ) == [(0, 0, 0, "ab")]
    assert extract_html_table_cells(
        b"<table><tr><td>line one<br>line two</td></tr></table>"
    ) == [(0, 0, 0, "line one line two")]
    assert extract_html_table_cells(
        b"<table><tr><td><p>one</p><p>two</p></td></tr></table>"
    ) == [(0, 0, 0, "one two")]
    assert extract_html_table_cells(
        b"<table><tr><td>x<br/>y</td></tr></table>"
    ) == [(0, 0, 0, "x y")]
    # implicit <tr> + per-table counter reset
    assert extract_html_table_cells(
        b"<table><td>a</td></table><table><td>b</td></table>"
    ) == [(0, 0, 0, "a"), (1, 0, 0, "b")]


def test_html_table_inside_dropped_subtree_is_invisible():
    """ADVICE r5 #2: a <table> inside a DROP_TAGS subtree (nav menus
    are the canonical case) contributes neither text NOR structure —
    it must not consume a table_idx, emit empty cells, or shift the
    indices of real tables; a dropped subtree INSIDE a cell likewise
    adds no block-break separators."""
    from pdfspark.kernel.html_extract import extract_html_table_cells

    page = (b"<html><body>"
            b"<nav><table><tr><td>home</td><td>about</td></tr>"
            b"</table></nav>"
            b"<table><tr><td>real</td><td>data</td></tr></table>"
            b"</body></html>")
    assert extract_html_table_cells(page) == \
        [(0, 0, 0, "real"), (0, 0, 1, "data")]
    # nav table nested in a cell: structure AND text invisible, the
    # enclosing cell unharmed (no stray separators from the drop)
    assert extract_html_table_cells(
        b"<table><tr><td>a<nav><table><tr><td>m</td></tr></table>"
        b"</nav>b</td></tr></table>"
    ) == [(0, 0, 0, "ab")]
    # XML-style void block inside a dropped subtree inside a cell:
    # no separator either
    assert extract_html_table_cells(
        b"<table><tr><td>a<form>x<br/>y</form>b</td></tr></table>"
    ) == [(0, 0, 0, "ab")]


def test_html_table_grid_span_resolution():
    """Grid surface (layout 4a/4b, HTML modality): colspan/rowspan
    resolve through the HTML table-grid algorithm — a cell takes the
    smallest free column at/right of the scan position, covered slots
    are never re-emitted — and <th> carries is_header."""
    from pdfspark.kernel.html_extract import extract_html_table_grid

    # colspan shifts the NEXT cell; rowspan occupies the row below
    page = (b"<table>"
            b'<tr><th colspan="2">wide</th><th>c</th></tr>'
            b'<tr><td rowspan="2">tall</td><td>x</td><td>y</td></tr>'
            b"<tr><td>p</td><td>q</td></tr>"
            b"</table>")
    assert extract_html_table_grid(page) == [
        (0, 0, 0, "wide", True), (0, 0, 2, "c", True),
        (0, 1, 0, "tall", False), (0, 1, 1, "x", False),
        (0, 1, 2, "y", False),
        (0, 2, 1, "p", False), (0, 2, 2, "q", False),
    ]
    # a cell spanning BOTH ways blocks a 2x2 block of slots
    assert extract_html_table_grid(
        b'<table><tr><td colspan="2" rowspan="2">big</td><td>r</td></tr>'
        b"<tr><td>s</td></tr></table>"
    ) == [(0, 0, 0, "big", False), (0, 0, 2, "r", False),
          (0, 1, 2, "s", False)]
    # two rowspans from the same row both cover the next row
    assert extract_html_table_grid(
        b'<table><tr><td rowspan="2">a</td><td rowspan="2">b</td>'
        b"<td>c</td></tr><tr><td>d</td></tr></table>"
    ) == [(0, 0, 0, "a", False), (0, 0, 1, "b", False),
          (0, 0, 2, "c", False), (0, 1, 2, "d", False)]


def test_html_table_grid_policy_edges():
    """Span attribute hygiene and pinned-policy conformance: invalid /
    0 / huge spans clamp, dropped subtrees contribute neither text nor
    structure, nested tables flatten inline, the sequential surface is
    untouched by spans, and garbage yields []."""
    from pdfspark.kernel.html_extract import (
        _SPAN_CLAMP, extract_html_table_cells, extract_html_table_grid)

    # colspan=0 / junk -> 1 (span-to-colgroup-end out of scope)
    assert extract_html_table_grid(
        b'<table><tr><td colspan="0">a</td><td colspan="x">b</td>'
        b"</tr></table>"
    ) == [(0, 0, 0, "a", False), (0, 0, 1, "b", False)]
    # huge spans clamp; the NEXT cell lands at the clamped column
    got = extract_html_table_grid(
        b'<table><tr><td colspan="99999">w</td><td>n</td></tr></table>')
    assert got == [(0, 0, 0, "w", False), (0, 0, _SPAN_CLAMP, "n", False)]
    # dropped subtree: no table_idx consumed, no cells
    assert extract_html_table_grid(
        b"<nav><table><tr><td>m</td></tr></table></nav>"
        b'<table><tr><td rowspan="2">r</td><td>s</td></tr>'
        b"<tr><td>t</td></tr></table>"
    ) == [(0, 0, 0, "r", False), (0, 0, 1, "s", False),
          (0, 1, 1, "t", False)]
    # nested table flattens into the cell; spans inside it are ignored
    # for the OUTER grid
    assert extract_html_table_grid(
        b'<table><tr><td>x<table><tr><td colspan="3">inner</td></tr>'
        b"</table>y</td><td>z</td></tr></table>"
    ) == [(0, 0, 0, "x inner y", False), (0, 0, 1, "z", False)]
    # the PINNED sequential surface ignores spans entirely
    assert extract_html_table_cells(
        b'<table><tr><td colspan="2">a</td><td>b</td></tr></table>'
    ) == [(0, 0, 0, "a"), (0, 0, 1, "b")]
    assert extract_html_table_grid(b"\x00\xffgarbage") == []
    assert extract_html_table_grid(b"") == []


def test_html_heading_outline_policy():
    """Outline surface: h1-h6 in document order with level; DROP_TAGS
    headings and empty (anchor-only) headings consume no ord_idx;
    inline tags flow, block tags inside a heading separate words; an
    unclosed heading flushes at the next heading start; garbage
    yields []."""
    from pdfspark.kernel.html_extract import extract_html_outline

    page = (b"<html><body><nav><h1>chrome</h1></nav>"
            b'<h2><a id="t"></a></h2>'
            b"<h1>Main <em>Title</em></h1>"
            b"<p>prose</p>"
            b"<h3>part<br>two</h3>"
            b"<h2>next section"  # unclosed: flushed by the next h tag
            b"<h6>deep</h6>"
            b"</body></html>")
    assert extract_html_outline(page) == [
        (0, 1, "Main Title"),
        (1, 3, "part two"),
        (2, 2, "next section"),
        (3, 6, "deep"),
    ]
    assert extract_html_outline(b"") == []
    assert extract_html_outline(b"\x00\xffgarbage<h1") == []
    # a dropped subtree INSIDE a heading contributes nothing
    assert extract_html_outline(
        b"<h2>a<script>x</script>b</h2>") == [(0, 2, "ab")]


def test_html_section_chunks_policy():
    """Section surface: each emitted heading carries the content text
    up to the next heading; preamble belongs to no section; dropped
    subtrees (nav/footer) contribute nothing; a skipped empty heading
    neither starts nor breaks a section; a trailing heading gets
    ''."""
    from pdfspark.kernel.html_extract import extract_html_sections

    page = (b"<html><body>preamble text<nav><h1>chrome</h1>menu</nav>"
            b'<h2><a id="t"></a></h2>'
            b"<h1>Main</h1><p>alpha beta</p><p>gamma</p>"
            b'<h2><a id="mid"></a></h2>delta'
            b"<h3>Sub</h3>eps<footer>foot</footer>"
            b"<h2>Tail</h2>"
            b"</body></html>")
    assert extract_html_sections(page) == [
        (0, 1, "Main", "alpha beta gamma delta"),
        (1, 3, "Sub", "eps"),
        (2, 2, "Tail", ""),
    ]
    assert extract_html_sections(b"") == []
    assert extract_html_sections(b"\x00\xffgarbage") == []


def test_html_list_items_policy():
    """List surface: every rendered <li> as (list_idx, item_idx,
    ordered, text). Pinned edges: DROP_TAGS lists (nav) contribute
    neither index nor items; empty (anchor-only) items consume no
    item_idx; a nested <ul>/<ol> is its OWN list and the parent item
    resumes after it with a word separator; an unclosed <li>/<ul>
    flushes at end of input; block tags inside an item separate
    words; a stray <li> outside any list is ignored; garbage yields
    []."""
    from pdfspark.kernel.html_extract import extract_html_list_items

    page = (b"<html><body>"
            b"<nav><ul><li>home</li></ul></nav>"
            b"<li>stray</li>"
            b"<ul><li>a</li><li>b<p>c</p>d</li>"
            b"<li>x<ol><li>n1</li><li>n2</li></ol>y</li></ul>"
            b'<ol><li><a href="#t"> </a></li><li>only</li>'
            b"<li>unclosed"
            b"</body></html>")
    # nested-list items flush when THEIR list closes, before the
    # parent item (x ... y) completes — emission order is item
    # completion order; ranks are by list open / item emit position.
    assert extract_html_list_items(page) == [
        (0, 0, 0, "a"),
        (0, 1, 0, "b c d"),
        (1, 0, 1, "n1"),
        (1, 1, 1, "n2"),
        (0, 2, 0, "x y"),
        (2, 0, 1, "only"),
        (2, 1, 1, "unclosed"),
    ]
    # a list whose items all collapse empty still consumes its
    # list_idx (geometry before data — the table-stop stance)
    assert extract_html_list_items(
        b"<ul><li> </li></ul><ol><li>real</li></ol>"
    ) == [(1, 0, 1, "real")]
    # dropped subtree INSIDE an item contributes nothing
    assert extract_html_list_items(
        b"<ul><li>a<script>x</script>b</li></ul>"
    ) == [(0, 0, 0, "ab")]
    assert extract_html_list_items(b"") == []
    assert extract_html_list_items(b"\x00\xffgarbage<ul><li") == []


def test_html_list_items_generator_roundtrip():
    """Closed-form parity with text_to_html_lists on the oracle's own
    arithmetic: item k of the 3-word grouping sits at (k//5, k%5,
    (k//5)%2); the generator's nav list, anchor-only leading items,
    and footer <ol> all vanish."""
    from pdfspark.docgen import text_to_html_lists
    from pdfspark.kernel.html_extract import extract_html_list_items

    text = " ".join("w%d" % i for i in range(23))
    words = text.split(" ")
    expected = [
        (k // 5, k % 5, (k // 5) % 2, " ".join(words[3 * k:3 * k + 3]))
        for k in range((len(words) + 2) // 3)
    ]
    assert extract_html_list_items(text_to_html_lists(text, 7)) == expected


def test_density_anchor_state_symmetric_across_drops():
    """ADVICE r5 #3: a stray </a> (or a block tag) inside a dropped
    subtree must not close/reset an anchor opened OUTSIDE it — the
    farm after the drop is still 100% link text and must drop."""
    from pdfspark.kernel.html_extract import extract_html_content_blocks

    # </a> inside the dropped <form> would otherwise zero _a_depth
    # and keep the farm tail as "content"
    page = (b"<html><body><div><a href=/x>home pages"
            b"<form></a></form>"
            b"archive sitemap contact terms privacy careers</a></div>"
            b"<p>genuine article text here</p></body></html>")
    assert extract_html_content_blocks(page) == \
        [(0, "genuine article text here")]
    # block tag inside a dropped subtree: same symmetry for the reset
    page2 = (b"<html><body><div><a href=/x>home pages"
             b"<form><p>junk</p></form>"
             b"archive sitemap contact terms privacy careers</a></div>"
             b"<p>genuine article text here</p></body></html>")
    assert extract_html_content_blocks(page2) == \
        [(0, "genuine article text here")]
