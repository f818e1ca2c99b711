"""Coverage for recovery paths and engine extensions: brute-force object
fetch (M14), ASCIIHex decoding, fragments, per-row passwords."""
import random

import pyarrow as pa

from pdfray.core.extract import extract_document
from pdfray.core.lexer import PdfLexer
from pdfray.sources import fixtures
from pdfray.sources.pdfwriter import PdfBuilder


def test_get_stream_bruteforce_recovery():
    """An object missing from the xref is recovered by a linear scan for
    'N G obj' (Tokeniser.cs:1735-1775)."""
    b = PdfBuilder()
    cid = b.add_stream(b"BT (hi) Tj ET")
    pages_id = b.reserve()
    pid = b.add(f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R>>")
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    # drop the content stream from the xref table
    addr = b.addrs.pop(cid)
    data = b.finish_classic(cat)

    lx = PdfLexer(data)
    lx.verify_file_header()
    lx.find_pages()
    result = lx.get_stream((cid, 0))
    assert result is not None
    dict_token, stream = result
    assert dict_token is None  # recovered via brute force
    assert bytes(stream) == b"BT (hi) Tj ET"


def test_get_stream_normal_path():
    b = PdfBuilder()
    cid = b.add_stream(b"some stream body", flate=True)
    pages_id = b.reserve()
    pid = b.add(f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R>>")
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    data = b.finish_classic(cat)
    lx = PdfLexer(data)
    lx.verify_file_header()
    lx.find_pages()
    dict_token, stream = lx.get_stream((cid, 0))
    assert dict_token is not None and bytes(stream) == b"some stream body"


def test_asciihex_stream_decoding():
    rng = random.Random(9)
    data, golden, _ = fixtures.build_asciihex(rng, "de")
    r = extract_document(data)
    assert r.error is None
    assert r.text == golden


def test_asciihex_odd_digit_padded():
    b = PdfBuilder()
    # 'ABC' = 414243; drop last digit -> pads with 0 -> 41 42 40 = 'AB@'
    cid = b.add_stream(b"41424>", dict_extra="/Filter/ASCIIHexDecode")
    pages_id = b.reserve()
    pid = b.add(f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R>>")
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    data = b.finish_classic(cat)
    lx = PdfLexer(data)
    lx.verify_file_header()
    lx.find_pages()
    _, stream = lx.get_stream((cid, 0))
    assert bytes(stream) == b"AB@"


def test_linearized_fallback():
    rng = random.Random(10)
    data, golden, _ = fixtures.build_linearized(rng, "fr")
    assert b"%%EOF" not in data  # forces the fallback path
    r = extract_document(data)
    assert r.error is None
    assert r.text == golden


def test_metadata_extraction():
    rng = random.Random(11)
    data, golden, _ = fixtures.build_metadata(rng, "en")
    r = extract_document(data)
    assert r.text == golden
    assert r.metadata is not None and "xmpmeta" in r.metadata


def test_extractor_fragments_column():
    from pdfray.stages.extract_stage import PdfExtractor

    rng = random.Random(12)
    data, _, _ = fixtures.build_simple(rng, "en")
    batch = pa.table({"url": ["u"], "html": [data]})
    out = PdfExtractor(include_fragments=True)(batch)
    frags = out.column("fragments")[0].as_py()
    assert len(frags) == 1
    assert "Tj" in frags[0]  # raw BT..ET source minus the trailing ET


def test_extractor_per_row_password():
    from pdfray.stages.extract_stage import PdfExtractor

    rng = random.Random(13)
    data, golden, _ = fixtures.build_encrypted(rng, "en")
    batch = pa.table(
        {"url": ["good", "bad"], "html": [data, data], "password": ["", "wrong1"]}
    )
    out = PdfExtractor()(batch)
    texts = out.column("text").to_pylist()
    errors = out.column("error").to_pylist()
    assert texts[0] == golden and errors[0] is None
    assert texts[1] == "" and errors[1] is not None


def test_identity_encoding_passthrough():
    """/Encoding /Identity-H sets the identity flag and leaves bytes unmapped
    (PdfFont.cs:100-105): for a non-Type1 font chars pass through raw."""
    b = PdfBuilder()
    fid = b.add("<</Type/Font/Subtype/Type0/BaseFont/Foo/Encoding/Identity-H>>")
    content = b"BT /F1 12 Tf (Ab\xe4) Tj ET"
    cid = b.add_stream(content)
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    r = extract_document(b.finish_classic(cat))
    page = r.pages[0]
    font = page.fonts["F1"]
    assert font.is_identity and font.encoding8 is None
    assert page.contents[0].text == "Ab\xe4|"  # raw latin-1 passthrough


def test_type1_identity_keeps_standard_table():
    """Type1 + Identity: the identity flag is set but the Standard table from
    the Type1 branch still applies (reference quirk: the flag does not clear
    Encoding8Bit, PdfFont.cs:56-58,102-104)."""
    b = PdfBuilder()
    fid = b.add("<</Type/Font/Subtype/Type1/BaseFont/Foo/Encoding/Identity-H>>")
    content = b"BT /F1 12 Tf (a'b) Tj ET"  # Standard maps 0x27 to U+2019
    cid = b.add_stream(content)
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    r = extract_document(b.finish_classic(cat))
    font = r.pages[0].fonts["F1"]
    assert font.is_identity and font.encoding8 is not None
    assert r.pages[0].contents[0].text == "a’b|"


def test_multi_megabyte_document():
    """A genuinely large document (hundreds of pages, MB-scale) extracts
    byte-identically within the default pipeline working buffer."""
    import time

    from pdfray.sources.fixtures import build_huge

    rng = random.Random(99)
    data, golden, _ = build_huge(rng, "en", n_pages=600)
    assert len(data) > 250_000  # flate-compressed; decompressed content is ~3x
    t0 = time.perf_counter()
    r = extract_document(data, working_buffer_size=10_000_000)
    elapsed = time.perf_counter() - t0
    assert r.error is None
    assert r.n_pages == 600
    assert r.text == golden
    assert elapsed < 30  # sanity bound, typically ~2-4s
