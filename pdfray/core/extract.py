"""Document extraction facade — pure function of the document bytes.

Replicates the reference lifecycle (`PdfParser.cs:92-107` ->
`Tokeniser.VerifyFileHeader` -> `FindPages` -> per page `PdfPage.cs:42-82`
-> per content `PdfContent.cs:39-203`):

    extract_document(data) -> ExtractResult

Per-page and per-content errors are captured, never raised; only
document-level structural failures (bad header, broken xref, unsupported
encryption envelope, wrong password) surface as ``ExtractResult.error``.
No Ray imports — this module is the per-row UDF body.
"""
from __future__ import annotations

from typing import Optional

from .content import PdfContentResult
from .fonts import PdfFont
from .lexer import PdfLexer
from .model import ArrayToken, DictionaryToken, PdfError, PdfStreamError


class PageResult:
    """Fonts + ordered contents of one page (PdfPage.cs:28-83)."""

    __slots__ = ("fonts", "contents", "exception")

    def __init__(self, lexer: PdfLexer, page_token: DictionaryToken):
        self.fonts: dict = {}
        self.contents: list = []
        self.exception: Optional[str] = None
        page_token.pdf_object = self
        try:
            resources = page_token.get_dict("Resources")
            if resources is not None:
                fonts_dict = resources.get_dict("Font")
                if fonts_dict is not None:
                    for name, font_token in fonts_dict.items():
                        cached = getattr(font_token, "pdf_object", None)
                        if cached is not None:
                            self.fonts[name] = cached  # memoized across pages (PdfPage.cs:47-53)
                        else:
                            self.fonts[name] = PdfFont(lexer, font_token)

            contents_token = page_token.get("Contents")
            if contents_token is not None:
                if isinstance(contents_token, ArrayToken):
                    for content_token in contents_token:
                        if not isinstance(content_token, DictionaryToken):
                            raise PdfError(
                                f"content token is not a dictionary: "
                                f"{type(content_token).__name__}"
                            )
                        self.contents.append(PdfContentResult(lexer, content_token, self.fonts))
                elif isinstance(contents_token, DictionaryToken):
                    self.contents.append(PdfContentResult(lexer, contents_token, self.fonts))
                else:
                    raise PdfError(
                        f"Contents is neither array nor dictionary: "
                        f"{type(contents_token).__name__}"
                    )
        except Exception as ex:
            detail = f"{type(ex).__name__}: {ex}"
            if isinstance(ex, (PdfError, PdfStreamError)):
                self.exception = detail
            else:
                self.exception = detail + lexer.newline + lexer.show_stream_at()


class ExtractResult:
    __slots__ = (
        "pdf_version",
        "document_info",
        "document_id",
        "metadata",
        "pages",
        "error",
    )

    def __init__(self):
        self.pdf_version: Optional[str] = None
        self.document_info: Optional[str] = None
        self.document_id: Optional[str] = None
        self.metadata: Optional[str] = None
        self.pages: list = []
        self.error: Optional[str] = None

    @property
    def text(self) -> str:
        """Document text: concatenation of all content texts in tree order.

        The byte-identity invariant is defined over this value (per-content
        ``Text`` strings are joined without an extra separator — each content
        already ends with the content delimiter, PdfContent.cs:186).
        """
        parts = []
        for page in self.pages:
            for content in page.contents:
                if content.text is not None:
                    parts.append(content.text)
        return "".join(parts)

    @property
    def page_texts(self) -> list:
        return [
            "".join(c.text for c in page.contents if c.text is not None)
            for page in self.pages
        ]

    @property
    def n_pages(self) -> int:
        return len(self.pages)

    def error_summary(self) -> Optional[str]:
        """Document error plus any page/content exceptions, for the error column."""
        parts = []
        if self.error:
            parts.append(self.error)
        for pi, page in enumerate(self.pages):
            if page.exception:
                parts.append(f"page {pi}: {page.exception}")
            for ci, content in enumerate(page.contents):
                if content.exception:
                    parts.append(f"page {pi} content {ci} exception: {content.exception}")
                if content.error:
                    parts.append(f"page {pi} content {ci} error: {content.error}")
        return "\n".join(parts) if parts else None


def render_page_report(page: PageResult, newline: str = "\n") -> str:
    """Browser-style page text assembly (MainWindow.xaml.cs:659-698):
    contents separated by an 80-dash rule, exceptions/errors framed by
    80-plus rules, page exception appended last; the no-content message when
    nothing rendered."""
    dash = "-" * 80
    plus = "+" * 80
    parts: list = []
    has_content = False
    for idx, content in enumerate(page.contents):
        if idx > 0:
            parts.append(dash + newline)
        if content.text:
            has_content = True
            parts.append(content.text + newline)
        for problem in (content.exception, content.error):
            if problem is not None:
                has_content = True
                parts.append(plus + newline)
                parts.append(problem + newline)
                parts.append(plus + newline)
    if page.exception is not None:
        has_content = True
        parts.append(plus + newline)
        parts.append(page.exception + newline)
        parts.append(plus + newline)
    if not has_content:
        return "This pdf page has no text conten. Is it just a scan ?"
    return "".join(parts)


def extract_document(
    data: bytes,
    password: str = "",
    content_delimiter: str = "|",
    newline: str = "\n",
    working_buffer_size: int = 200_000,
) -> ExtractResult:
    """Parse one PDF document and extract its text (never raises)."""
    result = ExtractResult()
    try:
        lexer = PdfLexer(
            data,
            password=password,
            content_delimiter=content_delimiter,
            working_buffer_size=working_buffer_size,
            newline=newline,
        )
        lexer.verify_file_header()
        result.pdf_version = lexer.pdf_version
        lexer.find_pages()
        result.document_info = lexer.document_info
        result.document_id = lexer.document_id
        result.metadata = lexer.metadata
        for page_token in lexer.page_tokens:
            result.pages.append(PageResult(lexer, page_token))
    except Exception as ex:
        result.error = f"{type(ex).__name__}: {ex}"
    return result
