"""End-to-end extraction invariant: byte-identical text per url.

Mirrors the reference test strategy (SURVEY.md §5): synthesized documents with
analytically-computed golden text, per operator-class, plus a re-synthesis of
the reference's own fixtures (`H3 Simple Text String Example.pdf` shape and
the in-code document of `PdfParserTest.TestPdfParser`).
"""
import random

import pytest

from pdfray.core.extract import extract_document
from pdfray.sources import fixtures
from pdfray.sources.pdfwriter import PdfBuilder


CLASS_FNS = {name: fn for name, fn, _ in fixtures.CLASS_BUILDERS}


@pytest.mark.parametrize("cls", sorted(CLASS_FNS))
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_class_byte_identical(cls, seed):
    rng = random.Random(seed)
    lang = fixtures.LANGS[seed % 4]
    data, golden, meta = CLASS_FNS[cls](rng, lang)
    result = extract_document(data, working_buffer_size=10_000_000)
    assert result.error is None
    assert result.text == golden
    assert result.n_pages == meta["n_pages"]
    assert result.pdf_version == meta["pdf_version"]


def test_corpus_byte_identical():
    n_ok = 0
    for url, ts, html, golden, lang, version, n_pages in fixtures.generate_rows(
        105, n_huge=2, n_broken=3
    ):
        result = extract_document(html, working_buffer_size=10_000_000)
        assert result.text == golden, url
        assert result.n_pages == n_pages, url
        assert result.pdf_version == version, url
        if "/broken/" in url:
            assert result.error is not None or result.error_summary() is not None, url
        else:
            assert result.error is None, (url, result.error)
        n_ok += 1
    assert n_ok == 110


def test_h3_resynthesis():
    """Reference fixture shape: Helvetica/MacRomanEncoding, one ' Hello World ' Tj.

    With the Td before Tj the reference emits a leading newline
    (PdfContent.cs:144-146: Text += NewLine also when Text is null).
    """
    b = PdfBuilder()
    content = b"BT /F1 24 Tf 100 100 Td ( Hello World ) Tj ET"
    cid = b.add_stream(content)
    fid = b.add("<</Type/Font/Subtype/Type1/BaseFont/Helvetica/Encoding/MacRomanEncoding>>")
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    data = b.finish_classic(cat)
    r = extract_document(data)
    assert r.pdf_version == "1.4"
    assert r.n_pages == 1
    assert r.text == "\n Hello World |"


def test_parser_test_document():
    """PdfParserTest.TestPdfParser equivalent: version + structure walk."""
    b = PdfBuilder()
    cid = b.add_stream(b"Hello World")
    pages_id = b.reserve()
    pid = b.add(f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R>>")
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    data = b.finish_classic(cat)

    from pdfray.core.lexer import PdfLexer

    lx = PdfLexer(data)
    lx.verify_file_header()
    assert lx.pdf_version == "1.4"
    lx.find_pages()
    root = lx.trailer_entries["Root"]
    assert root.type == "Catalog"
    pages = root["Pages"]
    assert pages.type == "Pages"
    kids = pages["Kids"]
    for kid in kids:
        assert kid.type == "Page"
        assert kid["Contents"].is_stream
    assert len(lx.page_tokens) == 1


def test_dquote_records_exception_bug_compat():
    """The reference's '"' operator always fails: SkipStreamArgument leaves the
    cursor on the whitespace before the string and GetStreamString does not
    skip whitespace (Tokeniser.cs:1937-1990, 2367-2369).  The content records
    the exception and keeps the text accumulated so far."""
    b = PdfBuilder()
    content = b"BT /F1 12 Tf (first) Tj 2 3 (second) \" (third) Tj ET"
    cid = b.add_stream(content)
    pages_id = b.reserve()
    pid = b.add(f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R>>")
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    data = b.finish_classic(cat)
    r = extract_document(data)
    content_result = r.pages[0].contents[0]
    assert content_result.text == "first|"
    assert content_result.exception is not None
    assert "should start with" in content_result.exception


def test_document_info_and_id():
    rng = random.Random(5)
    data, _, _ = fixtures.build_simple(rng, "en")
    r = extract_document(data)
    assert r.document_info is not None and "Producer: pdfray fixtures; " in r.document_info
    assert r.document_id is not None and "ab" * 16 in r.document_id.lower()


def test_encrypted_wrong_password_errors():
    rng = random.Random(6)
    data, _, _ = fixtures.build_encrypted(rng, "en")
    r = extract_document(data, password="wrong0")
    assert r.error is not None
    assert r.text == ""


def test_flate_buffer_overflow():
    """Streams larger than the working buffer fail like the reference
    (Tokeniser.cs:1835-1837) — bounded memory per actor."""
    rng = random.Random(7)
    data, _, _ = fixtures.build_flate(rng, "en")
    r = extract_document(data, working_buffer_size=4)
    summary = r.error_summary() or ""
    assert "buffer overflow" in summary


def test_differences_out_of_range_entries_skip_but_advance():
    """Malformed /Differences indices: negative or >255 glyph-name entries
    are skipped (without corrupting other codes via Python negative
    indexing) while the char index advances by TWO per failed entry —
    the reference increments in the try and again in the catch
    (PdfFont.cs:80-90)."""
    b = PdfBuilder()
    fid = b.add(
        "<</Type/Font/Subtype/Type1/BaseFont/Helvetica"
        "/Encoding<</Type/Encoding"
        "/Differences[-5 /quoteright 300 /adieresis 65 /Zcaron]>>>>"
    )
    # codes: 0x41 (65 -> Zcaron via Differences), 0xFB (251: must stay the
    # Standard-encoding char, NOT quoteright from the negative-index write)
    cid = b.add_stream(b"BT /F1 12 Tf 100 700 Td <41FB> Tj ET")
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    data = b.finish_classic(cat)
    r = extract_document(data)
    assert r.error is None
    assert r.text == "\nŽß|"  # Zcaron + Standard 0xFB (germandbls), uncorrupted


def test_differences_double_advance_on_unknown_glyph():
    """An unknown glyph name consumes TWO code slots (C# evaluation order:
    charIndex++ side effect in the try, another in the catch) — the next
    name lands two codes later, leaving the in-between codes untouched."""
    b = PdfBuilder()
    fid = b.add(
        "<</Type/Font/Subtype/Type1/BaseFont/Helvetica"
        "/Encoding<</Type/Encoding"
        "/Differences[65 /notarealglyphname /adieresis]>>>>"
    )
    # 65 consumed by the failed entry (plus 66); adieresis lands on 67.
    # Codes: 0x41 (65: back to Standard 'A' — NOT overwritten), 0x42 (66:
    # Standard 'B'), 0x43 (67 -> ä via Differences)
    cid = b.add_stream(b"BT /F1 12 Tf 100 700 Td <414243> Tj ET")
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    r = extract_document(b.finish_classic(cat))
    assert r.error is None
    assert r.text == "\nABä|"


def test_differences_uni_out_of_range_aborts_font_build():
    """A uniXXXX entry with an out-of-range index rethrows into the font
    ctor's outer catch (PdfFont.cs:122-125): the exception is recorded and
    the REST of the build — later Differences entries AND /ToUnicode — is
    abandoned, so affected codes fall back to the Standard table."""
    b = PdfBuilder()
    fid = b.add(
        "<</Type/Font/Subtype/Type1/BaseFont/Helvetica"
        "/Encoding<</Type/Encoding"
        "/Differences[300 /uni20AC 65 /Zcaron]>>>>"
    )
    # 65 would be Zcaron if the build survived; the abort leaves Standard 'A'
    cid = b.add_stream(b"BT /F1 12 Tf 100 700 Td <41> Tj ET")
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    r = extract_document(b.finish_classic(cat))
    assert r.text == "\nA|"
    # the font carries the recorded abort, reference-style
    font = next(iter(r.pages[0].fonts.values()))
    assert font.exception is not None and "IndexError" in font.exception


def _one_font_doc(font_body: str, content: bytes) -> bytes:
    b = PdfBuilder()
    fid = b.add(font_body)
    pages_id = b.reserve()
    cid = b.add_stream(content)
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    return b.finish_classic(cat)


def test_differences_uni_above_bmp_truncates_to_16_bits():
    """uniXXXXXXX values above 0xFFFF truncate like the reference's
    `(char)Convert.ToInt32(...)` cast (PdfFont.cs) — uni2120AC lands on
    U+20AC, not an astral codepoint (and not a font-build abort)."""
    data = _one_font_doc(
        "<</Type/Font/Subtype/Type1/BaseFont/Helvetica"
        "/Encoding<</Type/Encoding/Differences[65 /uni2120AC]>>>>",
        b"BT /F1 12 Tf 100 700 Td <41> Tj ET",
    )
    r = extract_document(data)
    assert r.error is None
    assert r.text == "\n€|"
    font = next(iter(r.pages[0].fonts.values()))
    assert font.exception is None


def test_differences_uni_non_hex_forms_abort_like_convert_toint32():
    """Convert.ToInt32(s, 16) rejects signs and separators that Python's
    int(s, 16) would happily parse: /uni-0041 (sign) and /uni4_1
    (underscore — legal in a PDF name) must abort the font build exactly
    like bad hex, never map to a character (ADVICE r04)."""
    for bad in ("uni-0041", "uni4_1", "uni+41"):
        data = _one_font_doc(
            "<</Type/Font/Subtype/Type1/BaseFont/Helvetica"
            "<<ENC>>>>".replace(
                "<<ENC>>",
                f"/Encoding<</Type/Encoding/Differences[66 /{bad} 65 /Zcaron]>>",
            ),
            b"BT /F1 12 Tf 100 700 Td <41> Tj ET",
        )
        r = extract_document(data)
        assert r.text == "\nA|", bad  # build aborted before Zcaron
        font = next(iter(r.pages[0].fonts.values()))
        assert font.exception is not None and "ValueError" in font.exception, bad


def test_differences_uni_overflowing_int32_aborts_font_build():
    """More than 8 hex digits overflows the reference's Convert.ToInt32
    (OverflowException -> outer catch, font build abandoned); codes fall
    back to the Standard table, the abort is recorded on the font."""
    data = _one_font_doc(
        "<</Type/Font/Subtype/Type1/BaseFont/Helvetica"
        "/Encoding<</Type/Encoding"
        "/Differences[66 /uni1FFFFFFFF 65 /Zcaron]>>>>",
        b"BT /F1 12 Tf 100 700 Td <41> Tj ET",
    )
    r = extract_document(data)
    assert r.text == "\nA|"  # Zcaron never applied: build aborted first
    font = next(iter(r.pages[0].fonts.values()))
    assert font.exception is not None and "OverflowError" in font.exception
