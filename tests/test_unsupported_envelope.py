"""Unsupported-feature gates: same envelope as the reference, recorded not raised."""
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from pdfray.core.extract import extract_document
from pdfray.core.lexer import PdfLexer
from pdfray.sources.pdfwriter import Encryption, PdfBuilder


def _doc_with_filter(filter_name: str) -> bytes:
    b = PdfBuilder()
    cid = b.add_stream(b"BT (x) Tj ET", dict_extra=f"/Filter/{filter_name}")
    pages_id = b.reserve()
    pid = b.add(f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R>>")
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    return b.finish_classic(cat)


def test_unsupported_filter_recorded_per_page():
    """LZWDecode etc. -> NotSupported recorded on the page, document survives
    (filter gate: Token.cs:638-645 'is not (yet) supported')."""
    r = extract_document(_doc_with_filter("LZWDecode"))
    assert r.error is None  # document-level parse succeeded
    assert r.n_pages == 1
    summary = r.error_summary() or ""
    assert "LZWDecode is not (yet) supported" in summary
    assert r.text == ""


def test_unsupported_encryption_version_errors():
    """V=4/AES is outside the reference envelope (V in {1,2}, R in {2,3})."""
    enc = Encryption(user_password="")
    b = PdfBuilder(encryption=enc)
    cid = b.add_stream(b"BT (x) Tj ET")
    pages_id = b.reserve()
    pid = b.add(f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R>>")
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    # forge a V=4 encrypt dict
    b.encrypt_obj_num = b.add(
        f"<</Filter/Standard/V 4/R 4/Length 128/P -1852"
        f"/O <{enc.o_entry.hex()}>/U <{enc.u_entry.hex()}>>>"
    )
    data = b.finish_classic(cat)
    r = extract_document(data)
    assert r.error is not None
    assert "Standard encryption" in r.error
    assert r.text == ""


def test_non_standard_security_handler_errors():
    enc = Encryption(user_password="")
    b = PdfBuilder(encryption=enc)
    cid = b.add_stream(b"BT (x) Tj ET")
    pages_id = b.reserve()
    pid = b.add(f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R>>")
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    b.encrypt_obj_num = b.add("<</Filter/CustomHandler/V 1/R 2>>")
    data = b.finish_classic(cat)
    r = extract_document(data)
    assert r.error is not None and r.text == ""


# property: the number lexer agrees with a straightforward Decimal model
from decimal import Decimal


@given(
    sign=st.sampled_from(["", "+", "-"]),
    ipart=st.text("0123456789", max_size=12),
    dot=st.booleans(),
    frac=st.text("0123456789", max_size=8),
)
@settings(max_examples=300, deadline=None)
def test_number_parse_matches_decimal_model(sign, ipart, dot, frac):
    text = sign + ipart + ("." + frac if dot else "")
    if text in ("", "+", "-"):
        return
    lx = PdfLexer((text + " Q").encode())
    tok = lx._parse_number(None)
    # model: C# decimal accumulation semantics
    s = -1 if sign == "-" else 1
    int_value = int(ipart) if ipart else 0
    if dot and frac:
        expect = s * (Decimal(int_value) + Decimal(int(frac)) / (10 ** len(frac)))
        if expect == 0:
            expect = Decimal(0)
        expect_int = None
    else:
        v = s * int_value
        expect = Decimal(v)
        expect_int = v if v < 2**31 - 1 else None
    assert tok.decimal == expect
    assert tok.ivalue == expect_int
    # cursor must be exactly past the numeric text
    assert lx.i == len(text)
