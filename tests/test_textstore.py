"""TextStore line splitting / search — pins the post-Reset reference semantics.

The reference's own TextStoreTest is stale against its implementation (the
construction-without-Reset path never initialises LineStarts[0] and the find
binary search would loop); these tests replicate its *search matrix* under the
working Reset-state semantics (see pdfray/core/textstore.py docstring).
"""
import pytest

from pdfray.core.textstore import Selection, TextStore


def store_from(text: str) -> TextStore:
    ts = TextStore()
    ts.append(text.encode("latin-1"))
    return ts


def test_line_splitting_cr_lf_crlf():
    ts = TextStore()
    ts.append(b"one\rtwo\nthree\r\nfour\r")
    assert ts.lines_count == 5
    assert [ts[i] for i in range(4)] == ["one", "two", "three", "four"]
    assert ts[4] == ""  # trailing empty line after the final CR


def test_unterminated_last_line_truncates_bug_compat():
    """The reference line indexer unconditionally strips the last char of a
    CR-less final line (TextStore.cs:39-44) — reproduced deliberately."""
    ts = TextStore()
    ts.append(b"one\rfour")
    assert [ts[i] for i in range(ts.lines_count)] == ["one", "fou"]


def test_append_across_calls():
    ts = TextStore()
    ts.append(b"ab")
    ts.append(b"c\rde\r")
    assert ts.lines_count == 3
    assert ts[0] == "abc"
    assert ts[1] == "de"


def test_unmapped_bytes_hex_quoted():
    ts = TextStore()
    ts.append(bytes([0x41, 0x01, 0x42, 0x0D]))  # 0x01 unmapped in PdfEncoding
    assert ts[0] == "A'1'B"


def test_all_pdf_encoding_bytes():
    ts = TextStore()
    ts.append(bytes(range(256)))
    # 0x0A and 0x0D are the only EOLs in 0..255 -> 2 breaks -> 3 lines
    assert ts.lines_count == 3
    ts.append(b"\x0a")
    assert ts.lines_count == 4


@pytest.mark.parametrize("text", ["A", "AB", "ABC", "ABC\xc4", "ABC\xc4\rD", "ABC\xc4\rDE"])
def test_find_matrix(text):
    """Exhaustive substring search matrix (TextStoreTest.cs:276-315 shape)."""
    ts = store_from(text)
    exp_start_line, exp_start_char = 0, -1
    for first in range(len(text)):
        exp_end_line, exp_end_char = exp_start_line, exp_start_char
        exp_start_char += 1
        for last in range(first, len(text)):
            exp_end_char += 1
            needle = text[first : last + 1]
            for forward in (True, False):
                sel = ts.find_string(None, needle, forward, False)
                assert sel == Selection(
                    exp_start_line, exp_start_char, exp_end_line, exp_end_char
                ), (needle, forward)
                sel = ts.find_string(None, needle.lower(), forward, True)
                assert sel == Selection(
                    exp_start_line, exp_start_char, exp_end_line, exp_end_char
                ), (needle, forward, "ignorecase")
            if text[last] == "\r":
                exp_end_line += 1
                exp_end_char = -1
        if text[first] == "\r":
            exp_start_line += 1
            exp_start_char = -1


def test_find_continue_and_wrap():
    ts = store_from("abAB")
    s1 = ts.find_string(None, "ab", True, True)
    assert s1 == Selection(0, 0, 0, 1)
    s2 = ts.find_string(s1, "ab", True, True)
    assert s2 == Selection(0, 2, 0, 3)
    s3 = ts.find_string(s2, "ab", True, True)  # wraps to the start
    assert s3 == Selection(0, 0, 0, 1)
    # case-sensitive: only the lowercase match exists
    assert ts.find_string(None, "ab", True, False) == Selection(0, 0, 0, 1)
    assert ts.find_string(Selection(0, 0, 0, 0), "ab", True, False) == Selection(0, 0, 0, 1)
    # backward with continuation
    b1 = ts.find_string(None, "ab", False, True)
    assert b1 == Selection(0, 2, 0, 3)
    b2 = ts.find_string(b1, "ab", False, True)
    assert b2 == Selection(0, 0, 0, 1)
    b3 = ts.find_string(b2, "ab", False, True)  # wraps to the end
    assert b3 == Selection(0, 2, 0, 3)


def test_find_across_lines():
    ts = store_from("ab\rAB")
    s1 = ts.find_string(None, "ab", True, True)
    assert s1 == Selection(0, 0, 0, 1)
    s2 = ts.find_string(s1, "ab", True, True)
    assert s2 == Selection(1, 0, 1, 1)
    # a needle spanning the line break
    s = ts.find_string(None, "b\ra", True, True)
    assert s == Selection(0, 1, 1, 0)
    assert ts.find_string(None, "zz", True, True) is None


def test_get_string_and_to_string():
    ts = store_from("hello\rworld\r")
    assert ts.get_string(0, 1, 4) == "ell"
    assert ts.get_string(1, 0, 5) == "world"
    assert ts.to_string(0, 2) == "hello\nworld\n"
    assert ts.select_all() == Selection(0, 0, 2, -1)


def test_append_error_block():
    ts = store_from("x")
    ts.append_error("Parse", "line1\r\nline2")
    lines = [ts[i] for i in range(ts.lines_count)]
    assert "{eParse}" in lines
    assert "line1" in lines and "line2" in lines


def test_show_buffer_content_elides_streams():
    from pdfray.core.lexer import PdfLexer
    from pdfray.sources.pdfwriter import PdfBuilder

    b = PdfBuilder()
    cid = b.add_stream(b"\x00\x01secret-binary-body\x02", dict_extra="")
    pages_id = b.reserve()
    pid = b.add(f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R>>")
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    data = b.finish_classic(cat)
    display = PdfLexer(data).show_buffer_content()
    assert "...endstream" in display
    assert "secret-binary-body" not in display
    assert "/Type/Catalog" in display


def test_document_textstore_stage_shape():
    import pyarrow as pa

    from pdfray.stages.textstore_stage import TextStoreStage
    from pdfray.sources.fixtures import build_simple
    import random

    data, _, _ = build_simple(random.Random(3), "en")
    batch = pa.table({"url": ["u1"], "html": [data]})
    out = TextStoreStage()(batch)
    assert out.column("n_lines")[0].as_py() > 3
    assert out.column("error")[0].as_py() is None
    assert "%PDF-1.4" in out.column("preview")[0].as_py()


def test_document_textstore_maps_high_bytes_once():
    """Bytes >= 0x80 must render through the display table exactly once —
    the old path round-tripped the mapped string through latin-1 and turned
    them into '?' (skewing n_chars/preview vs the reference viewer)."""
    import random

    from pdfray.sources.fixtures import build_simple
    from pdfray.stages.textstore_stage import document_textstore

    data, _, _ = build_simple(random.Random(7), "en")
    # splice a high byte into a comment so structure stays valid
    data = data.replace(b"%PDF", b"%\xe9PDF", 1)
    store = document_textstore(data)
    text = store.to_string(0, store.lines_count)
    assert "é" in text  # PDF_DOC[0xE9]
    assert "?" not in text
