"""Content-stream interpreter: BT/ET text extraction.

Mirrors `PdfParser/PdfContent.cs:29-205` exactly:

* outside BT..ET: `BI..ID..EI` inline images skipped, `x y w h re W n`
  clipping regions parsed (and otherwise ignored);
* inside BT..ET: `Tj` string, `TJ` array-string, `'`, `"` (two skipped
  arguments then string), `Tf` font select (missing font -> recorded error,
  font None), `Td`/`TD`/`T*` append a newline to Text (even when Text is
  still empty -> leading newline, reference bug-compat), `Tm` reads 4 ints +
  2 decimals and appends a newline iff the 6th value differs from the last
  line offset AND Text is non-empty;
* each produced string appends ``text + content_delimiter`` to Text;
* `ET` captures the raw BT..ET source slice into ``fragments``;
* every exception is captured on ``exception``; a missing trailing ET is
  recorded on ``error``.

The reference appends `Environment.NewLine`; this engine pins the newline to
the configurable ``lexer.newline`` (default "\\n") as documented in
FIXTURES.md.
"""
from __future__ import annotations

from typing import Optional

from .model import DictionaryToken, PdfError, PdfStreamError


class PdfContentResult:
    __slots__ = ("text", "fragments", "font_name", "exception", "error")

    def __init__(self, lexer, contents_dict: DictionaryToken, fonts: dict):
        self.text: Optional[str] = None
        self.fragments: list = []
        self.font_name: Optional[str] = None
        self.exception: Optional[str] = None
        self.error: Optional[str] = contents_dict.stream_length_problem
        contents_dict.pdf_object = self

        nl = lexer.newline
        delim = lexer.content_delimiter
        # GetStreamBytes runs before the try block in the reference
        # (PdfContent.cs:42) — filter/decode errors propagate to the page.
        lexer.fill_stream_from_dict(contents_dict)
        last_line_offset = None
        new_text: Optional[str] = None
        try:
            while True:
                # find BT (PdfContent.cs:63-92)
                while True:
                    opcode = lexer.get_stream_opcode()
                    if opcode is None:
                        return
                    if opcode == b"BI":
                        lexer.content_stream_skip_inline_image()
                        continue
                    if opcode == b"re":
                        lexer.content_stream_get_clipping_region()
                        continue
                    if opcode == b"BT":
                        break

                # interpret text operations until ET (PdfContent.cs:95-187)
                lexer.mark_stream_text_fragment()
                font = None
                while True:
                    opcode = lexer.get_stream_opcode()
                    if opcode is None:
                        self.error = (self.error or "") + (
                            "Error Content stream: stream end found but 'ET' still missing." + nl
                        )
                        self.error += lexer.show_stream_at()
                        return
                    if len(opcode) == 1:
                        if opcode == b"'":
                            lexer.start_stream_argument_reading()
                            new_text = lexer.get_stream_string(font)
                            lexer.end_stream_argument_reading()
                        elif opcode == b'"':
                            lexer.start_stream_argument_reading()
                            lexer.skip_stream_argument()
                            lexer.skip_stream_argument()
                            new_text = lexer.get_stream_string(font)
                            lexer.end_stream_argument_reading()
                        else:
                            continue
                    elif len(opcode) == 2:
                        if opcode[0] == 0x54:
                            op1 = opcode[1]
                            if op1 == 0x6A:
                                lexer.start_stream_argument_reading()
                                new_text = lexer.get_stream_string(font)
                                lexer.end_stream_argument_reading()
                            elif op1 == 0x4A:
                                lexer.start_stream_argument_reading()
                                new_text = lexer.get_stream_array_string(font)
                                lexer.end_stream_argument_reading()
                            elif op1 == 0x66:
                                lexer.start_stream_argument_reading()
                                self.font_name = lexer.get_stream_name()
                                font = fonts.get(self.font_name)
                                if font is None:
                                    self.error = (self.error or "") + (
                                        f"Could not find font '{self.font_name}'." + nl
                                    )
                                lexer.end_stream_argument_reading()
                                continue
                            elif op1 in (0x64, 0x44, 0x2A):
                                self.text = (self.text or "") + nl
                                continue
                            elif op1 == 0x6D:
                                lexer.start_stream_argument_reading()
                                lexer.get_stream_int()
                                lexer.get_stream_int()
                                lexer.get_stream_int()
                                lexer.get_stream_int()
                                lexer.get_stream_number()
                                line_offset = lexer.get_stream_number()
                                if last_line_offset != line_offset:
                                    last_line_offset = line_offset
                                    if self.text is not None:
                                        self.text += nl
                                lexer.end_stream_argument_reading()
                                continue
                            else:
                                continue  # TL and other T? operators
                        elif opcode == b"ET":
                            self.fragments.append(lexer.get_stream_text_fragment())
                            break
                        else:
                            continue
                    else:
                        continue

                    self.text = (self.text or "") + new_text + delim
        except Exception as ex:
            detail = f"{type(ex).__name__}: {ex}"
            if isinstance(ex, (PdfError, PdfStreamError)):
                self.exception = detail
            else:
                self.exception = detail + nl + lexer.show_stream_at()
