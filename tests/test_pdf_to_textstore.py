"""PdfToTextStore byte-FSM: anchors, links, stream elision, brace doubling."""
import random

from pdfray.core.lexer import PdfLexer
from pdfray.core.pdf_to_textstore import pdf_to_textstore
from pdfray.core.textstore import TextStore
from pdfray.sources.fixtures import build_simple
from pdfray.sources.pdfwriter import PdfBuilder


def convert(data: bytes):
    lexer = PdfLexer(data)
    lexer.verify_file_header()
    lexer.find_pages()
    store = TextStore()
    anchors = {}
    err = pdf_to_textstore(lexer, store, anchors)
    return store, anchors, err


def test_anchors_links_and_stream_elision():
    data, _, _ = build_simple(random.Random(21), "en")
    store, anchors, err = convert(data)
    assert err is None
    text = store.to_string(0, store.lines_count)
    # every object header is anchored, every reference linked
    assert "{a1 0}" in text  # content stream object
    assert "{a2 0}" in text  # font object
    assert "{l2 0}" in text  # font reference from the page dict
    assert "{l1 0}" in text  # contents reference
    # stream body elided with owning-object mark; ops text not shown raw
    assert "stream {s1 0}" in text
    assert " Tf " not in text.split("{s1 0}")[1].split("endstream")[0]
    assert "endstream" in text
    # anchors recorded with line numbers, first wins
    assert anchors["1 0"][0] == "1 0"
    assert anchors["1 0"][1] >= 1
    assert set(anchors) >= {"1 0", "2 0", "3 0", "4 0", "5 0"}


def test_brace_doubling():
    b = PdfBuilder()
    cid = b.add_stream(b"BT (text with {braces}) Tj ET")
    pages_id = b.reserve()
    pid = b.add(f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R>>")
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R/Note (curly {{x}})>>")
    data = b.finish_classic(cat)
    store, anchors, err = convert(data)
    assert err is None
    text = store.to_string(0, store.lines_count)
    assert "{{x}}" in text  # literal braces doubled


def test_stream_missing_from_xref_backscan():
    b = PdfBuilder()
    cid = b.add_stream(b"hidden body bytes")
    pages_id = b.reserve()
    pid = b.add(f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R>>")
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    b.addrs.pop(cid)  # drop the stream object from the xref
    data = b.finish_classic(cat)
    store, anchors, err = convert(data)
    assert err is None
    text = store.to_string(0, store.lines_count)
    assert f"{{s{cid} 0}}" in text
    assert "hidden body bytes" not in text
    assert "endstream" in text
