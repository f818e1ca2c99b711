"""Browser display-sink assembly (S5): render_page_report parity."""
import random

from pdfray.core.extract import extract_document, render_page_report
from pdfray.sources.fixtures import build_flate
from pdfray.sources.pdfwriter import PdfBuilder


def test_report_with_text_and_separators():
    b = PdfBuilder()
    c1 = b.add_stream(b"BT (one) Tj ET")
    c2 = b.add_stream(b"BT (two) Tj ET")
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents [{c1} 0 R {c2} 0 R]>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    r = extract_document(b.finish_classic(cat))
    report = render_page_report(r.pages[0])
    assert report == "one|\n" + "-" * 80 + "\n" + "two|\n"


def test_report_with_exception_framing():
    b = PdfBuilder()
    cid = b.add_stream(b'BT (ok) Tj 1 2 (broken) " ET')  # '"' op records exception
    pages_id = b.reserve()
    pid = b.add(f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R>>")
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    r = extract_document(b.finish_classic(cat))
    report = render_page_report(r.pages[0])
    assert report.startswith("ok|\n" + "+" * 80)
    assert "should start with" in report


def test_report_no_content_message():
    b = PdfBuilder()
    cid = b.add_stream(b"q 1 0 0 1 0 0 cm Q")  # no BT..ET at all
    pages_id = b.reserve()
    pid = b.add(f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R>>")
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    r = extract_document(b.finish_classic(cat))
    report = render_page_report(r.pages[0])
    assert report == "This pdf page has no text conten. Is it just a scan ?"
