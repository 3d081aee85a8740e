"""Golden end-to-end: every fixture case must produce byte-identical text
(SURVEY.md §5 plan #3; this is the corpus-regression suite the reference
lacks in-tree — the pinned policy in pdfspark/kernel/extract.py defines the
oracle)."""

import pytest

from pdfspark.corpus import all_cases
from pdfspark.kernel.extract import extract_text

CASES = all_cases()


@pytest.mark.parametrize("case", CASES, ids=[c.case_id for c in CASES])
def test_golden(case):
    r = extract_text(case.pdf)
    assert r.text == case.expected_text, f"text mismatch for {case.case_id}"
    if case.expected_error is None:
        assert r.error is None, f"unexpected error {r.error} for {case.case_id}"
    else:
        assert r.error == case.expected_error
    assert r.n_pages == case.expected_pages
    if case.expected_annots is not None:
        assert r.annots == case.expected_annots, case.case_id


def test_determinism():
    """Two generations + two extractions are bit-identical."""
    a = {c.case_id: c.pdf for c in all_cases()}
    b = {c.case_id: c.pdf for c in all_cases()}
    assert a == b
    for cid, pdf in a.items():
        assert extract_text(pdf) == extract_text(pdf)


def test_spans_partition_text():
    giant = next(c for c in CASES if c.case_id == "t25_giant_doc")
    r = extract_text(giant.pdf)
    assert len(r.spans) == r.n_pages == giant.expected_pages
    # spans tile the document text exactly, separated by \f
    for i, sp in enumerate(r.spans):
        assert sp.page == i
        page_text = r.text[sp.start : sp.end]
        assert "\f" not in page_text
        if i + 1 < len(r.spans):
            assert r.text[sp.end] == "\f"
            assert r.spans[i + 1].start == sp.end + 1
    assert r.spans[-1].end == len(r.text)


def test_utf16_title_and_lang_metadata():
    case = next(c for c in CASES if c.case_id == "t36_utf16_title_lang")
    r = extract_text(case.pdf)
    assert r.text == "titled"
    assert r.title == "Grüße 😀"
    assert r.created == "2024-02-15T10:30:00"
    assert r.lang == "de-DE"
