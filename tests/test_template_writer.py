"""Template-driven PDF writer (XRefUpdater/SampleToPdf capability)."""
from pdfray.core.extract import extract_document
from pdfray.sources.pdfwriter import template_to_pdf

TEMPLATE = """$object Catalog
<< /Type /Catalog /Pages §Pages§ >>
$object Pages
<< /Type /Pages /Kids [§Page1§] /Count 1 >>
$object Page1
<< /Type /Page /Parent §Pages§ /Contents §Page1Content1§ >>
$object Page1Content1
<< /Length # >>
stream
BT /F1 24 Tf 200 600 Td ( Hello World ) Tj ET
endstream
"""


def test_template_translates_to_valid_pdf():
    data = template_to_pdf(TEMPLATE)
    assert data.startswith(b"%PDF-1.7")
    result = extract_document(data)
    assert result.error is None
    assert result.n_pages == 1
    assert result.text == "\n Hello World |"


def test_template_reference_substitution_and_length():
    data = template_to_pdf(TEMPLATE)
    text = data.decode("latin-1")
    assert "/Pages 2 0 R" in text         # §Pages§ -> id 2
    assert "/Contents 4 0 R" in text      # §Page1Content1§ -> id 4
    payload = "BT /F1 24 Tf 200 600 Td ( Hello World ) Tj ET"
    assert f"/Length {len(payload)}" in text
    assert "#" not in text.split("stream")[0]
