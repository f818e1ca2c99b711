"""Viewer/debug transform: document bytes -> line-indexed display text.

The browser-side capability of the reference (`PdfFilesTextBrowser` +
`TextStoreLib/PdfToTextStore.cs`) as an optional Ray Data stage: the raw file
is rendered with stream bodies elided (`Tokeniser.ShowBufferContent` FSM) and
loaded into a `TextStore` for line counts / search.  Output stays small
(line counts + a clipped preview), the full store is a per-row debug tool.
"""
from __future__ import annotations

import pyarrow as pa

from ..core.lexer import PdfLexer
from ..core.textstore import TextStore

TEXTSTORE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("n_lines", pa.int32()),
        ("n_chars", pa.int64()),
        ("preview", pa.string()),
        ("error", pa.string()),
    ]
)


def document_textstore(data: bytes) -> TextStore:
    """Build the display TextStore for one document (pure function).

    Feeds the raw stream-elided bytes straight to TextStore.append, which
    applies the PDF_DOC display table exactly once — round-tripping the
    already-mapped display string through latin-1 would turn every byte
    >= 0x80 into '?' and skew n_chars/preview vs the reference viewer."""
    lexer = PdfLexer(data)
    store = TextStore()
    store.append(lexer.buffer_content_bytes())
    return store


class TextStoreStage:
    """Actor-pool callable: per-document display/line-index summary."""

    def __init__(self, preview_lines: int = 5):
        self.preview_lines = preview_lines

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name in TEXTSTORE_SCHEMA.names}
        urls = batch.column("url")
        htmls = batch.column("html")
        for i in range(len(batch)):
            url = urls[i].as_py()
            out["url"].append(url)
            try:
                store = document_textstore(htmls[i].as_py())
                out["n_lines"].append(store.lines_count)
                out["n_chars"].append(store.chars_count)
                out["preview"].append(
                    store.to_string(0, min(self.preview_lines, store.lines_count))
                )
                out["error"].append(None)
            except Exception as ex:
                out["n_lines"].append(0)
                out["n_chars"].append(0)
                out["preview"].append("")
                out["error"].append(f"{type(ex).__name__}: {ex}")
        return pa.table(out, schema=TEXTSTORE_SCHEMA)
