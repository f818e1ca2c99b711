"""Generation determinism (oracle prerequisite) and Tm decimal-equality parity."""
import hashlib

from pdfray.core.extract import extract_document
from pdfray.sources import fixtures
from pdfray.sources.pdfwriter import PdfBuilder


def test_corpus_generation_is_deterministic():
    """Two independent generations must be byte-identical — the DuckDB oracle
    reads a cached parquet written by a *different* process than the query."""
    rows_a = list(fixtures.generate_rows(60, n_huge=1, n_broken=2))
    rows_b = list(fixtures.generate_rows(60, n_huge=1, n_broken=2))
    assert len(rows_a) == len(rows_b)
    for (ua, ta, ha, ga, la, va, pa_), (ub, tb, hb, gb, lb, vb, pb) in zip(
        rows_a, rows_b
    ):
        assert ua == ub and ta == tb and ga == gb and la == lb
        assert va == vb and pa_ == pb
        assert hashlib.md5(ha).hexdigest() == hashlib.md5(hb).hexdigest()


def _doc_with_content(content: bytes) -> bytes:
    b = PdfBuilder()
    cid = b.add_stream(content)
    pages_id = b.reserve()
    pid = b.add(f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R>>")
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    return b.finish_classic(cat)


def test_tm_line_offset_decimal_equality():
    """The Tm newline decision is *numeric* decimal equality: 700 vs 700.0 vs
    700.00 are the same line offset (C# decimal ==, PdfContent.cs:155-161),
    while 700.5 differs."""
    content = (
        b"BT 1 0 0 1 50 700 Tm (a) Tj "
        b"1 0 0 1 50 700.0 Tm (b) Tj "      # equal -> no newline
        b"1 0 0 1 50 700.00 Tm (c) Tj "     # equal -> no newline
        b"1 0 0 1 50 700.5 Tm (d) Tj "      # different -> newline
        b"1 0 0 1 50 700 Tm (e) Tj ET"      # different again -> newline
    )
    r = extract_document(_doc_with_content(content))
    assert r.pages[0].contents[0].text == "a|b|c|\nd|\ne|"


def test_tm_first_offset_no_leading_newline():
    """First Tm sets lastLineOffset but Text is still None -> no newline."""
    content = b"BT 1 0 0 1 50 700 Tm (x) Tj ET"
    r = extract_document(_doc_with_content(content))
    assert r.pages[0].contents[0].text == "x|"
