"""Font model: Subtype, 8-bit encoding, /Differences, /ToUnicode CMap.

Mirrors `PdfParser/PdfFont.cs:30-137` and `PdfFontType.cs:25-50`:

* Type1 fonts start from the Standard table; other subtypes start unmapped.
* /Encoding name: WinAnsi / MacRoman / MacExpert(->MacRoman); names containing
  "Identity" set the identity flag without touching the table.
* /Differences arrays: a running code index, `uniXXXX` hex names, glyph-name
  lookups.  A FAILED glyph-name entry (unknown name or out-of-range index)
  consumes TWO code slots — C# evaluates the `charIndex++` side effect
  before the throwing lookup/store and the catch increments again
  (`PdfFont.cs:80-90`); a failed `uniXXXX` entry rethrows into the ctor's
  outer catch, recording the exception and abandoning the rest of the build
  (`PdfFont.cs:122-125`).
* /ToUnicode streams patch the table (starting from Standard if none yet).
* All failures are captured on ``exception`` — a broken font never aborts the
  page (`PdfFont.cs:122-125`).
"""
from __future__ import annotations

from typing import Optional

from .encodings import apply_tounicode, get_encoding_8bit
from .encodings_tables import GLYPH_CHARS, MAC_ROMAN, STANDARD, WIN_ANSI
from .model import ArrayToken, DictionaryToken, NameToken, NumberToken, Token


def _make_trans(table) -> dict:
    return {code: table[code] for code in range(256) if table[code] != chr(code)}


# shared str.translate tables for the unmodified named encodings — rebuilt
# per-document otherwise (every string batch pays for it)
_SHARED_TRANS = {
    id(STANDARD): _make_trans(STANDARD),
    id(MAC_ROMAN): _make_trans(MAC_ROMAN),
    id(WIN_ANSI): _make_trans(WIN_ANSI),
}
_BASE_TRANS = {
    "Standard": _make_trans(STANDARD),
    "MacRomanEncoding": _make_trans(MAC_ROMAN),
    "MacExpertEncoding": _make_trans(MAC_ROMAN),
    "WinAnsiEncoding": _make_trans(WIN_ANSI),
}

FONT_TYPES = (
    "Type0",
    "Type1",
    "MMType1",
    "Type3",
    "TrueType",
    "CIDFontType0",
    "CIDFontType2",
)


class PdfFont:
    __slots__ = (
        "obj_id",
        "font_type",
        "base_font",
        "encoding_name",
        "is_identity",
        "encoding8",
        "tounicode_header",
        "cmap",
        "exception",
        "trans_table",
    )

    def __init__(self, lexer, token: Token):
        self.obj_id = token.obj_id
        self.font_type: Optional[str] = None
        self.base_font: Optional[str] = None
        self.encoding_name: Optional[str] = None
        self.is_identity = False
        self.encoding8: Optional[list] = None
        self.tounicode_header: Optional[str] = None
        self.cmap: Optional[dict] = None
        self.exception: Optional[str] = None
        self.trans_table: Optional[dict] = None  # lazy str.translate cache
        if isinstance(token, DictionaryToken):
            token.pdf_object = self
        try:
            self._build(lexer, token)
        except Exception as ex:
            self.exception = (self.exception or "") + f"{type(ex).__name__}: {ex}" + "\n"

    def _build(self, lexer, token: Token) -> None:
        if not isinstance(token, DictionaryToken):
            raise TypeError(f"font token is not a dictionary: {type(token).__name__}")
        subtype = token.get_name("Subtype")
        if subtype is not None:
            self.font_type = subtype if subtype in FONT_TYPES else "none"
            if self.font_type == "Type1":
                self.encoding8 = list(STANDARD)
                self.trans_table = _BASE_TRANS["Standard"]
        self.base_font = token.get_name("BaseFont")

        encoding_token = token.get("Encoding")
        if encoding_token is not None:
            if isinstance(encoding_token, DictionaryToken):
                differences = encoding_token.get_array("Differences")
                if differences is not None:
                    self.trans_table = None  # table diverges from the shared base
                    char_index = -(1 << 31)
                    for diff in differences:
                        if isinstance(diff, NumberToken):
                            char_index = diff.ivalue
                        elif isinstance(diff, NameToken):
                            char_name = diff.value
                            # C# evaluation order pins these semantics
                            # (PdfFont.cs:71-90): in
                            # `Encoding8Bit[charIndex++] = Chars[charName]`
                            # the index side effect applies BEFORE the RHS
                            # lookup/bounds check can throw, and the glyph
                            # branch's catch runs `charIndex++` AGAIN — so a
                            # failed glyph entry (unknown name OR out-of-
                            # range index) consumes TWO code slots.  The
                            # uniXXXX branch instead RETHROWS, which lands
                            # in the ctor's outer catch (PdfFont.cs:122-125):
                            # exception recorded, rest of the font build
                            # (remaining Differences, ToUnicode) abandoned.
                            # Python negative indexing must also never
                            # silently write near the table end.
                            in_range = 0 <= char_index < 256
                            if char_name[:3].lower() == "uni":
                                hexpart = char_name[3:]
                                # C# parity: Convert.ToInt32(s, 16) rejects
                                # signs and separators that Python's
                                # int(s, 16) would accept (/uni-0041,
                                # /uni4_1 — underscores are legal in PDF
                                # names), so gate on pure hex digits first;
                                # a reject aborts the font build like any
                                # bad-hex ValueError
                                if not hexpart or not all(
                                    c in "0123456789abcdefABCDEF"
                                    for c in hexpart
                                ):
                                    raise ValueError(
                                        f"/Differences uni value {char_name}"
                                        f" is not pure hex"
                                    )
                                v = int(hexpart, 16)  # bad hex aborts
                                # C# parity (PdfFont.cs): Convert.ToInt32
                                # accepts up to 8 hex digits (two's
                                # complement, so 0xFFFFFFFF parses) and
                                # throws OverflowException above that; the
                                # (char) cast then truncates to 16 bits —
                                # chr(v) alone would diverge into astral
                                # codepoints for values > 0xFFFF.
                                if v > 0xFFFFFFFF:
                                    raise OverflowError(
                                        f"/Differences uni value {char_name}"
                                        f" overflows Int32"
                                    )
                                ch = chr(v & 0xFFFF)
                                if not in_range:
                                    raise IndexError(
                                        f"/Differences uni index {char_index} "
                                        f"out of range"
                                    )
                                self.encoding8[char_index] = ch
                                char_index += 1
                            else:
                                ch = GLYPH_CHARS.get(char_name)
                                if ch is not None and in_range:
                                    self.encoding8[char_index] = ch
                                    char_index += 1
                                else:
                                    char_index += 2  # try-increment + catch-increment
            elif isinstance(encoding_token, NameToken):
                name = encoding_token.value
                if "Identity" in name:
                    self.is_identity = True
                else:
                    self.encoding8 = get_encoding_8bit(name)
                    self.trans_table = _BASE_TRANS.get(name)

        tounicode = token.get_dict("ToUnicode")
        if tounicode is not None:
            if self.encoding8 is None:
                self.encoding8 = list(STANDARD)
            self.trans_table = None  # CMap patches diverge from the shared base
            self.tounicode_header, self.cmap = apply_tounicode(lexer, tounicode, self.encoding8)
