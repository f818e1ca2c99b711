"""Encoding helpers: named 8-bit tables and ToUnicode CMap application.

Mirrors `PdfParser/PdfEncodings.cs:1120-1206`: named encodings resolve to
fresh copies of the generated tables (MacExpert intentionally falls back to
MacRoman, a reference quirk), and `/ToUnicode` CMap streams patch the 8-bit
table in place via beginbfchar / beginbfrange sections (ranges fill with an
incrementing unicode).
"""
from __future__ import annotations

from typing import Optional, Tuple

from .encodings_tables import GLYPH_CHARS, MAC_ROMAN, PDF_DOC, STANDARD, WIN_ANSI
from .model import PdfError


def get_encoding_8bit(encoding_name: str) -> list:
    if encoding_name == "WinAnsiEncoding":
        return list(WIN_ANSI)
    if encoding_name == "MacRomanEncoding":
        return list(MAC_ROMAN)
    if encoding_name == "MacExpertEncoding":
        return list(MAC_ROMAN)  # reference quirk: MacExpert -> MacRoman
    raise PdfError(f"Unknown encoding name '{encoding_name}'.")


def apply_tounicode(lexer, tounicode_stream, encoding: list) -> Tuple[str, dict]:
    """Parse a /ToUnicode CMap stream, patching ``encoding`` in place.

    Returns (header_text, cmap) — header is the raw text between begincmap
    and endcodespacerange (`PdfEncodings.cs:1139-1147`).  cids are limited to
    two hex digits, unicodes to four (with ff/ffi/ffl repacking) exactly like
    the reference scalar readers.
    """
    lexer.fill_stream_from_dict(tounicode_stream)
    if lexer.get_stream_opcode("begincmap") is None:
        raise lexer.stream_error("ToUnicode stream is missing 'begincmap'.")
    lexer.set_stream_mark()
    if lexer.get_stream_opcode("endcodespacerange") is None:
        raise lexer.stream_error("ToUnicode stream is missing 'endcodespacerange'.")
    header = lexer.get_stream_marked_text()
    cmap: dict = {}
    while True:
        opcode = lexer.get_stream_opcode()
        if opcode is None:
            raise lexer.stream_error("ToUnicode stream incomplete.")
        if opcode == b"beginbfchar":
            lexer.start_stream_argument_reading()
            lines = lexer.get_stream_int()
            lexer.end_stream_argument_reading()
            for _ in range(lines):
                cid = lexer.get_stream_cid()
                uni = chr(lexer.get_stream_unicode())
                encoding[cid] = uni
                cmap[cid] = uni
            if lexer.get_stream_opcode() != b"endbfchar":
                raise lexer.stream_error(
                    "ToUnicode stream is missing 'endbfchar' after 'beginbfchar'."
                )
        elif opcode == b"beginbfrange":
            lexer.start_stream_argument_reading()
            lines = lexer.get_stream_int()
            lexer.end_stream_argument_reading()
            for _ in range(lines):
                cid_start = lexer.get_stream_cid()
                cid_end = lexer.get_stream_cid()
                if cid_end < cid_start:
                    raise lexer.stream_error(
                        f"ToUnicode: beginbfrange cid1 '{cid_start} should be smaller "
                        f"than cid2'{cid_end}'."
                    )
                uni = lexer.get_stream_unicode()
                for cid in range(cid_start, cid_end + 1):
                    cmap[cid] = chr(uni)
                    encoding[cid] = chr(uni)
                    uni += 1
            if lexer.get_stream_opcode() != b"endbfrange":
                raise lexer.stream_error(
                    "ToUnicode stream is missing 'endbfrange' after 'beginbfrange'."
                )
        elif opcode == b"endcmap":
            break
    return header, cmap
