"""Property test: random content-stream op programs round-trip exactly.

Generates arbitrary sequences of text-showing/positioning operators, renders
them to a PDF with the writer, extracts with the engine, and compares against
the analytic interpreter model — far broader coverage of operator
interactions (Tm/Td interleavings, kern arrays, quote ops, multi-fragment
documents) than the fixed fixture classes.
"""
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from pdfray.core.extract import extract_document
from pdfray.sources.fixtures import (
    ENCODING_TABLES,
    encodable,
    expected_text,
    inverse_table,
    render_content,
)
from pdfray.sources.pdfwriter import PdfBuilder

# encodable alphabet for WinAnsi: printable ASCII minus apostrophe/backtick
# plus latin-1 accents (all invertible in the table)
_ALPHA = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " .,:;!?-_()[]{}<>*+=/\\#@&%\"äöüßéèêàçñáíóú"
)

text_strategy = st.text(alphabet=_ALPHA, min_size=0, max_size=40)


@st.composite
def op_strategy(draw):
    kind = draw(st.sampled_from(["Tj", "Tj", "Tj", "TJ", "'", "Td", "TD", "T*", "Tm", "TL"]))
    if kind in ("Tj", "'"):
        return (kind, draw(text_strategy))
    if kind == "TJ":
        parts = draw(
            st.lists(
                st.one_of(text_strategy, st.integers(-500, 500)),
                min_size=1,
                max_size=5,
            )
        )
        return ("TJ", parts)
    if kind in ("Td", "TD"):
        return (kind, draw(st.integers(0, 800)), draw(st.integers(0, 800)))
    if kind == "T*":
        return ("T*",)
    if kind == "TL":
        return ("TL", draw(st.integers(1, 20)))
    # Tm: occasionally repeat an offset to exercise the equality branch
    offset = draw(st.sampled_from([700, 700, 650, 600, 555]))
    return ("Tm", 1, 0, 0, 1, draw(st.integers(0, 600)), offset)


@st.composite
def program_strategy(draw):
    n_frags = draw(st.integers(1, 3))
    frags = []
    for _ in range(n_frags):
        ops = [("Tf", "F1", 12)] + draw(st.lists(op_strategy(), min_size=0, max_size=8))
        frags.append(ops)
    return frags


@given(frags=program_strategy(), enc=st.sampled_from(["WinAnsiEncoding", "MacRomanEncoding"]))
@settings(max_examples=150, deadline=None)
def test_random_program_round_trip(frags, enc):
    # drop ops whose text isn't encodable in the chosen table
    def ok(op):
        if op[0] in ("Tj", "'"):
            return encodable(op[1], enc)
        if op[0] == "TJ":
            return all(not isinstance(p, str) or encodable(p, enc) for p in op[1])
        return True

    frags = [[op for op in frag if ok(op)] for frag in frags]
    b = PdfBuilder()
    content = render_content(frags, enc, b)
    cid = b.add_stream(content)
    fid = b.add(f"<</Type/Font/Subtype/Type1/BaseFont/Helvetica/Encoding/{enc}>>")
    pages_id = b.reserve()
    pid = b.add(
        f"<</Type/Page/Parent {pages_id} 0 R/Contents {cid} 0 R"
        f"/Resources<</Font<</F1 {fid} 0 R>>>>>>"
    )
    b.add(f"<</Type/Pages/Kids[{pid} 0 R]/Count 1>>", obj_num=pages_id)
    cat = b.add(f"<</Type/Catalog/Pages {pages_id} 0 R>>")
    result = extract_document(b.finish_classic(cat))
    assert result.error is None, result.error
    assert result.error_summary() is None, result.error_summary()
    assert result.text == expected_text(frags)
