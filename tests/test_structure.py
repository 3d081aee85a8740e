"""Tagged-PDF structure-order linearization (opt-in struct_text):
marked-content runs regroup by MCID and follow /StructTreeRoot DFS
order — the semantically-correct reading order for tagged files."""

from pdfspark.fixtures import BASE14, PdfBuilder
from pdfspark.kernel.extract import extract_text


def _tagged_pdf(k_order, content_ops, extra_root=""):
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", content_ops.encode())
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    elems = []
    for mcids in k_order:
        kids = (str(mcids[0]) if len(mcids) == 1
                else "[" + " ".join(map(str, mcids)) + "]")
        elems.append(b.add(
            f"<< /Type /StructElem /S /P /Pg {page} 0 R /K {kids} >>"))
    st = b.add(
        "<< /Type /StructTreeRoot /K ["
        + " ".join(f"{e} 0 R" for e in elems) + "] >>"
    )
    root = b.add(
        f"<< /Type /Catalog /Pages 90 0 R /StructTreeRoot {st} 0 R"
        + extra_root + " >>"
    )
    return b.build(root), page


def test_structure_order_overrides_visual_order():
    """Content stream writes the runs in VISUAL order (world before
    hello); the structure tree defines logical order. Content-order
    text is the pinned default; struct_text follows the tree."""
    ops = (
        "BT /F1 12 Tf 72 700 Td "
        "/P << /MCID 1 >> BDC (world) Tj EMC "
        "0 20 Td /P << /MCID 0 >> BDC (hello ) Tj EMC "
        "-0 -40 Td (footer) Tj ET"
    )
    pdf, _ = _tagged_pdf([(0,), (1,)], ops)
    r = extract_text(pdf, structure=True)
    assert r.error is None
    assert r.text == "world\nhello \nfooter"      # content order (pinned)
    assert r.struct_text == "hello world footer"  # structure order


def test_untagged_doc_has_no_struct_text():
    ops = "BT /F1 12 Tf 72 700 Td (plain) Tj ET"
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", ops.encode())
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>")
    r = extract_text(b.build(root), structure=True)
    assert r.text == "plain" and r.struct_text is None
    # structure=False never computes it
    r2 = extract_text(b.build(root))
    assert r2.struct_text is None


def test_nested_bdc_inherits_mcid_and_mcr_kids():
    """Nested BDC without its own MCID inherits the enclosing one; /K
    may also be a nested array; unreferenced marked runs land in the
    trailing leftover group."""
    ops = (
        "BT /F1 12 Tf 72 700 Td "
        "/P << /MCID 2 >> BDC (b1) Tj /Span BMC (b2) Tj EMC EMC "
        "/P << /MCID 7 >> BDC (a) Tj EMC "
        "/Artifact BMC (x) Tj EMC ET"
    )
    pdf, _ = _tagged_pdf([(7, 2)], ops)
    r = extract_text(pdf, structure=True)
    assert r.error is None
    assert r.struct_text == "a b1b2 x"


def test_cyclic_structure_tree_is_bounded():
    """Self-referential /K graphs terminate via the cycle guard and the
    budget; extraction never raises."""
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream(
        "<< >>",
        b"BT /F1 12 Tf 72 700 Td /P << /MCID 0 >> BDC (ok) Tj EMC ET",
    )
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    e1 = b.add(f"<< /Type /StructElem /S /P /Pg {page} 0 R /K [30 0 R 0] >>",
               num=29)
    b.add("<< /Type /StructElem /S /P /K 29 0 R >>", num=30)  # cycle
    st = b.add(f"<< /Type /StructTreeRoot /K {e1} 0 R >>")
    root = b.add(
        f"<< /Type /Catalog /Pages 90 0 R /StructTreeRoot {st} 0 R >>"
    )
    r = extract_text(b.build(root), structure=True)
    assert r.error is None and r.struct_text == "ok"


def test_form_xobject_emc_does_not_leak_into_page_mcids():
    """A stray EMC inside a Form XObject must not pop the page's
    marked-content nesting: text after the Do stays attributed to the
    enclosing MCID (the mc_stack restores like gs/ts)."""
    from pdfspark.fixtures import PdfBuilder

    b = PdfBuilder()
    f1 = b.add(BASE14)
    form = b.add_stream(
        "<< /Type /XObject /Subtype /Form /BBox [0 0 10 10] >>", b"EMC"
    )
    ops = (
        "BT /F1 12 Tf 72 700 Td "
        "/P << /MCID 1 >> BDC (B) Tj EMC "
        "/P << /MCID 0 >> BDC (A) Tj /X1 Do (A2) Tj EMC ET"
    )
    c = b.add_stream("<< >>", ops.encode())
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> "
        f"/XObject << /X1 {form} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    e0 = b.add(f"<< /Type /StructElem /S /P /Pg {page} 0 R /K 0 >>")
    e1 = b.add(f"<< /Type /StructElem /S /P /Pg {page} 0 R /K 1 >>")
    st = b.add(f"<< /Type /StructTreeRoot /K [{e0} 0 R {e1} 0 R] >>")
    root = b.add(
        f"<< /Type /Catalog /Pages 90 0 R /StructTreeRoot {st} 0 R >>"
    )
    r = extract_text(b.build(root), structure=True)
    assert r.error is None
    assert r.struct_text == "AA2 B"


def test_actualtext_replaces_glyphs_in_struct_mode_only():
    """/ActualText (§14.9.4): in STRUCT mode the replacement text stands
    in for the sequence's glyphs (ligature/hyphenation fixes); nested
    ActualText inside a suppressed sequence doesn't double-emit; the
    pinned CONTENT-order text still ignores it (t19 policy)."""
    ops = (
        "BT /F1 12 Tf 72 700 Td "
        "/P << /MCID 0 >> BDC "
        "(e) Tj "
        "/Span << /ActualText (ffi) >> BDC (f_f_i) Tj EMC "
        "(cient) Tj "
        "EMC ET"
    )
    pdf, _ = _tagged_pdf([(0,)], ops)
    r = extract_text(pdf, structure=True)
    assert r.error is None
    assert r.text == "ef_f_icient"       # content order: ActualText ignored
    assert r.struct_text == "efficient"  # struct order: replaced


def test_actualtext_suppression_restores_after_form():
    """A Form XObject invoked inside an /ActualText sequence cannot leak
    the suppression state (mc_suppress restores with the stack)."""
    from pdfspark.fixtures import PdfBuilder

    b = PdfBuilder()
    f1 = b.add(BASE14)
    form = b.add_stream(
        "<< /Type /XObject /Subtype /Form /BBox [0 0 10 10] >>", b"EMC EMC"
    )
    ops = (
        "BT /F1 12 Tf 72 700 Td "
        "/P << /MCID 0 >> BDC "
        "/Span << /ActualText (X) >> BDC (hidden) Tj /F1x Do EMC "
        "(visible) Tj EMC ET"
    )
    c = b.add_stream("<< >>", ops.encode())
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> "
        f"/XObject << /F1x {form} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    e0 = b.add(f"<< /Type /StructElem /S /P /Pg {page} 0 R /K 0 >>")
    st = b.add(f"<< /Type /StructTreeRoot /K {e0} 0 R >>")
    root = b.add(
        f"<< /Type /Catalog /Pages 90 0 R /StructTreeRoot {st} 0 R >>"
    )
    r = extract_text(b.build(root), structure=True)
    assert r.error is None
    assert r.struct_text == "Xvisible"


def test_multipage_structure_attribution():
    """MCIDs repeat per page (each page numbers from 0); the /Pg entry
    routes each structure element to ITS page, and pages join with \f."""
    from pdfspark.fixtures import PdfBuilder

    b = PdfBuilder()
    f1 = b.add(BASE14)

    def page_content(a, bb):
        return (f"BT /F1 12 Tf 72 700 Td "
                f"/P << /MCID 1 >> BDC ({a}) Tj EMC "
                f"0 20 Td /P << /MCID 0 >> BDC ({bb}) Tj EMC ET").encode()

    c1 = b.add_stream("<< >>", page_content("p1-second", "p1-first "))
    c2 = b.add_stream("<< >>", page_content("p2-second", "p2-first "))
    pg1 = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c1} 0 R >>"
    )
    pg2 = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c2} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{pg1} 0 R {pg2} 0 R] /Count 2 >>",
          num=90)
    elems = []
    for pg in (pg1, pg2):
        for mcid in (0, 1):
            elems.append(b.add(
                f"<< /Type /StructElem /S /P /Pg {pg} 0 R /K {mcid} >>"))
    st = b.add("<< /Type /StructTreeRoot /K ["
               + " ".join(f"{e} 0 R" for e in elems) + "] >>")
    root = b.add(
        f"<< /Type /Catalog /Pages 90 0 R /StructTreeRoot {st} 0 R >>"
    )
    r = extract_text(b.build(root), structure=True)
    assert r.error is None and r.n_pages == 2
    assert r.struct_text == "p1-first p1-second\fp2-first p2-second"


def test_multipage_all_missing_pg_is_untagged_equivalent():
    """ADVICE r3 #5: a multi-page tagged PDF whose structure elements
    ALL omit /Pg cannot attribute MCID order to any page — struct_text
    must be None (untagged-equivalent), not a silent content-order
    fallback that reads as structure-verified."""
    from pdfspark.fixtures import PdfBuilder

    b = PdfBuilder()
    f1 = b.add(BASE14)

    def page_content(a, bb):
        return (f"BT /F1 12 Tf 72 700 Td "
                f"/P << /MCID 1 >> BDC ({a}) Tj EMC "
                f"0 20 Td /P << /MCID 0 >> BDC ({bb}) Tj EMC ET").encode()

    c1 = b.add_stream("<< >>", page_content("p1-second", "p1-first "))
    c2 = b.add_stream("<< >>", page_content("p2-second", "p2-first "))
    pg1 = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c1} 0 R >>"
    )
    pg2 = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c2} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{pg1} 0 R {pg2} 0 R] /Count 2 >>",
          num=90)
    elems = [b.add(f"<< /Type /StructElem /S /P /K {mcid} >>")
             for mcid in (0, 1)]  # NO /Pg anywhere
    st = b.add("<< /Type /StructTreeRoot /K ["
               + " ".join(f"{e} 0 R" for e in elems) + "] >>")
    root = b.add(
        f"<< /Type /Catalog /Pages 90 0 R /StructTreeRoot {st} 0 R >>"
    )
    r = extract_text(b.build(root), structure=True)
    assert r.error is None and r.n_pages == 2
    assert r.struct_text is None
    # content-order text is still fully present (baseline moves → \n)
    assert r.text == "p1-second\np1-first \fp2-second\np2-first "
