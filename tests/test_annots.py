"""Annotation text, outline titles, and name trees (reference parity:
`src/annotation/mod.rs:19`, `src/catalog.rs:35-208`,
`src/data_structures/name_tree.rs:15`)."""

from pdfspark.docgen import text_to_pdf
from pdfspark.fixtures import BASE14, PdfBuilder, _simple_show
from pdfspark.kernel.document import PdfDocument
from pdfspark.kernel.extract import extract_text
from pdfspark.kernel.name_tree import (
    flatten_name_tree,
    lookup_name_tree,
    named_destinations,
)


def test_freetext_and_widget_annotations_extracted():
    pdf = text_to_pdf("body", freetext_annot="a sticky note",
                      widget_value="typed value")
    r = extract_text(pdf)
    assert r.error is None and r.text == "body"
    assert r.annots == "a sticky note\ntyped value"


def test_no_annotations_is_null():
    r = extract_text(text_to_pdf("plain"))
    assert r.annots is None and r.outlines is None


def test_outline_titles_preorder():
    pdf = text_to_pdf("body", outline_titles=["Intro", "Methods", "End"])
    r = extract_text(pdf)
    assert r.outlines == "Intro\nMethods\nEnd"


def test_outline_cycle_guard():
    """A sibling chain that loops back must terminate, not hang."""
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("x").encode())
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    b.add("<< /Title (A) /Next 71 0 R >>", num=70)
    b.add("<< /Title (B) /Next 70 0 R >>", num=71)  # cycle 70→71→70
    b.add("<< /Type /Outlines /First 70 0 R >>", num=72)
    root = b.add("<< /Type /Catalog /Pages 90 0 R /Outlines 72 0 R >>",
                 num=91)
    r = extract_text(b.build(root))
    assert r.error is None
    assert r.outlines == "A\nB"


def _doc_with_name_tree():
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("x").encode())
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    # two leaves + one intermediate node with /Limits
    b.add("<< /Limits [(alpha) (beta)] "
          "/Names [(alpha) 11 (beta) 22] >>", num=60)
    b.add("<< /Limits [(delta) (zeta)] "
          "/Names [(delta) 33 (zeta) 44] >>", num=61)
    b.add("<< /Kids [60 0 R 61 0 R] >>", num=62)
    b.add("<< /Dests 62 0 R >>", num=63)
    root = b.add("<< /Type /Catalog /Pages 90 0 R /Names 63 0 R >>", num=91)
    return PdfDocument(b.build(root))


def test_name_tree_flatten_and_lookup():
    doc = _doc_with_name_tree()
    catalog = doc.resolve(doc.trailer.get("Root"))
    tree = doc.get(doc.get(catalog, "Names"), "Dests")
    pairs = flatten_name_tree(doc, tree)
    assert [(k, doc.resolve(v)) for k, v in pairs] == [
        (b"alpha", 11), (b"beta", 22), (b"delta", 33), (b"zeta", 44)
    ]
    assert doc.resolve(lookup_name_tree(doc, tree, b"delta")) == 33
    assert lookup_name_tree(doc, tree, b"gamma") is None  # between limits
    dests = named_destinations(doc)
    assert set(dests) == {b"alpha", b"beta", b"delta", b"zeta"}


def test_widget_inherits_value_from_parent_field():
    """AcroForm /Fields tree: widget kids without /V take the parent
    field's value (§12.7.3.1); radio groups export their /V Name."""
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("form").encode())
    # parent field holds /V; widget kid has none
    b.add("<< /FT /Tx /T (grp) /V (inherited value) /Kids [71 0 R] >>",
          num=70)
    b.add("<< /Type /Annot /Subtype /Widget /Rect [0 0 10 10] "
          "/Parent 70 0 R >>", num=71)
    # radio group: /V is a Name
    b.add("<< /FT /Btn /T (radio) /V /Choice2 /Kids [73 0 R] >>", num=72)
    b.add("<< /Type /Annot /Subtype /Widget /Rect [0 20 10 30] "
          "/Parent 72 0 R >>", num=73)
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R "
        f"/Annots [71 0 R 73 0 R] >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add(
        "<< /Type /Catalog /Pages 90 0 R "
        "/AcroForm << /Fields [70 0 R 72 0 R] >> >>", num=91)
    r = extract_text(b.build(root))
    assert r.error is None
    assert r.annots == "inherited value\nChoice2"


def test_widget_parent_cycle_bounded():
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("x").encode())
    b.add("<< /Type /Annot /Subtype /Widget /Rect [0 0 1 1] "
          "/Parent 71 0 R >>", num=70)
    b.add("<< /Parent 70 0 R >>", num=71)  # cycle, no /V anywhere
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R "
        f"/Annots [70 0 R] >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    r = extract_text(b.build(root))
    assert r.error is None and r.annots is None


def test_utf8_bom_text_string():
    """PDF 2.0 §7.9.2.2: text strings may be UTF-8 with BOM."""
    from pdfspark.kernel.extract import decode_text_string

    assert decode_text_string(b"\xef\xbb\xbfGr\xc3\xbc\xc3\x9fe") == "Grüße"
    assert decode_text_string(b"\xfe\xff\x00A") == "A"
    assert decode_text_string(b"plain") == "plain"


def test_link_uri_extraction():
    """Link annotations (reference `src/annotation/link.rs` +
    `src/actions/uri.rs`): /A /S /URI primary, /PA fallback, Dest-only
    links skipped; links never leak into annots_text."""
    from pdfspark.corpus import all_cases
    from pdfspark.kernel.extract import extract_text

    case = next(c for c in all_cases() if c.case_id == "t45_link_uris")
    r = extract_text(case.pdf)
    assert r.text == "linked" and r.error is None
    assert r.links == "https://ex.test/a\nhttps://ex.test/pa"
    assert r.annots is None


def test_acroform_field_tree_values():
    """Field-tree walk (reference src/acro_form.rs): widget-merged fields
    emit once (page walk owns them); widget-less and nested-kid values
    append after page annotations in /Fields order."""
    from pdfspark.corpus import all_cases
    from pdfspark.kernel.extract import extract_text

    case = next(c for c in all_cases()
                if c.case_id == "t47_acroform_field_tree")
    r = extract_text(case.pdf)
    assert r.text == "form doc" and r.error is None
    assert r.annots == "shown value\nhidden value\nnested value"


def test_embedded_files_inventory():
    """Attachment surface (t48): EmbeddedFiles tree entries first
    (Params /Size), then FileAttachment annotations (/UF over /F, size
    from the raw stream /Length when /Params is absent)."""
    from pdfspark.corpus import all_cases
    from pdfspark.kernel.extract import extract_text

    case = next(c for c in all_cases() if c.case_id == "t48_embedded_files")
    r = extract_text(case.pdf)
    assert r.text == "attached doc" and r.error is None
    assert r.attachments == "readme.txt:11\nuni-data.bin:3"


def test_xmp_title_fallback():
    """t49: no /Info — doc_title falls back to the XMP packet's
    dc:title first rdf:Alt item, XML-unescaped; /Info /Title still
    wins when present (pinned by t34-family metadata goldens)."""
    from pdfspark.corpus import all_cases
    from pdfspark.kernel.extract import extract_text

    case = next(c for c in all_cases() if c.case_id == "t49_xmp_title")
    r = extract_text(case.pdf)
    assert r.text == "xmp doc" and r.error is None
    assert r.title == "XMP Title & More"
    assert r.created is None


def test_acroform_empty_kids_is_terminal_field():
    """A field carrying /Kids [] is terminal (some producers emit it):
    its /V must surface, not vanish into an empty intermediate walk."""
    from pdfspark.fixtures import BASE14, PdfBuilder, _simple_show
    from pdfspark.kernel.extract import extract_text

    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("empty kids").encode())
    fld = b.add("<< /FT /Tx /T (f) /V (kept value) /Kids [] >>")
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add(
        f"<< /Type /Catalog /Pages 90 0 R /AcroForm << /Fields [{fld} 0 R] >> >>"
    )
    r = extract_text(b.build(root))
    assert r.text == "empty kids" and r.annots == "kept value"


def test_attachment_past_512_annots_is_inventoried():
    """ADVICE r3 #3: one shared /Annots bomb-guard (1024) across ALL
    annotation walkers — a FileAttachment at index 550 of a 600-annot
    page must appear in the inventory alongside the page's annot text."""
    b = PdfBuilder()
    f1 = b.add(BASE14)
    c = b.add_stream("<< >>", _simple_show("busy page").encode())
    note = b.add(
        "<< /Type /Annot /Subtype /Text /Rect [0 0 5 5] "
        "/Contents (sticky) >>"
    )
    ef = b.add_stream("<< /Type /EmbeddedFile /Params << /Size 7 >> >>",
                      b"payload")
    fs = b.add(
        f"<< /Type /Filespec /F (late.bin) /EF << /F {ef} 0 R >> >>"
    )
    att = b.add(
        "<< /Type /Annot /Subtype /FileAttachment /Rect [10 10 30 30] "
        f"/FS {fs} 0 R >>"
    )
    refs = [f"{note} 0 R"] * 600
    refs[550] = f"{att} 0 R"
    page = b.add(
        f"<< /Type /Page /Parent 90 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {f1} 0 R >> >> /Contents {c} 0 R "
        f"/Annots [{' '.join(refs)}] >>"
    )
    b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>", num=90)
    root = b.add("<< /Type /Catalog /Pages 90 0 R >>", num=91)
    r = extract_text(b.build(root))
    assert r.error is None and r.text == "busy page"
    assert r.attachments == "late.bin:7"
    assert r.annots is not None and r.annots.count("sticky") == 599
