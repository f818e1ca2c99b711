"""Byte-level PDF lexer, xref/trailer resolver and stream reader.

From-scratch Python reimplementation of the reference's ``Tokeniser``
(`PdfParser/Tokeniser.cs`) with identical observable semantics:

* header scan with junk-prefix tolerance (`Tokeniser.cs:180-209`)
* %%EOF back-scan + linearized fallback (`Tokeniser.cs:230-326`)
* classic xref tables, first-seen-wins, freed entries (`Tokeniser.cs:337-403`)
* xref streams with W/Index and predictor (`Tokeniser.cs:405-491`)
* /Prev trailer chain + trailer-key merge validation (`Tokeniser.cs:492-617`)
* one-byte-lookahead token dispatch (`Tokeniser.cs:1397-1441`) and
  number/Ref/obj disambiguation with backtracking (`Tokeniser.cs:1444-1498`)
* stream boundary finder with /Length repair (`Tokeniser.cs:1612-1698`)
* FlateDecode via raw inflate after 2-byte zlib header skip, bounded by a
  working-buffer cap (`Tokeniser.cs:1796-1846`)
* PNG predictor 12 "Up" only (`Tokeniser.cs:2192-2215`)
* object streams with per-document cache (`Tokeniser.cs:2161-2189`)
* content-stream opcode scanner with argument skipping
  (`Tokeniser.cs:2218-2288`) and string/number/CID readers incl. the
  ff/ffi/ffl ligature repacking (`Tokeniser.cs:2360-2657`)
* RC4 standard-security decryption envelope V in {1,2}, R in {2,3}
  (`Tokeniser.cs:620-1077`)

Documented deviations from the reference (each is a reference *bug* whose
faithful reproduction would depend on unrelated mutable state):

* '%'-comment skipping inside decoded streams advances the *stream* cursor;
  the reference aliases the file cursor there (`Tokeniser.cs:1917`) which
  corrupts the parse for any stream containing '%'.
* freed xref entries store a None sentinel; the reference stores address -1
  whose later use would read `bytes[-1]` (start-of-file in C#: throw; Python
  would silently wrap) — we return the error NullToken instead.
* nested literal strings in encrypted documents decrypt with the *enclosing
  object's* id (PDF 32000 Algorithm 1 step a); the reference dereferences a
  null ObjectId there and records an exception.
"""
from __future__ import annotations

import re
import zlib
from decimal import Decimal
from typing import Optional, Tuple

from .model import (
    ArrayToken,
    BoolToken,
    DictionaryToken,
    NameToken,
    NullToken,
    NumberToken,
    ObjectId,
    PdfError,
    PdfNotSupportedError,
    PdfStreamError,
    RefToken,
    StringToken,
    Token,
)
from . import crypt
from .encodings_tables import PDF_DOC

CR = 13
LF = 10
WHITE = frozenset((32, 10, 13, 9, 12, 0))
DELIM = frozenset(b"%()<>[]{}/")
WHITE_OR_DELIM = WHITE | DELIM
PCT = ord("%")

FILTER_NONE = 0
FILTER_FLATE = 1
FILTER_ASCIIHEX = 2  # engine extension (north-star scope; reference rejects it)

_INT_MAX = 2147483647

# byte constants for hot loops (avoid ord() calls per iteration)
_LP, _RP, _BS = 0x28, 0x29, 0x5C  # ( ) backslash
_LT, _GT, _LB, _RB = 0x3C, 0x3E, 0x5B, 0x5D  # < > [ ]
_SLASH, _PLUS, _MINUS, _DOT = 0x2F, 0x2B, 0x2D, 0x2E
_D0, _D9 = 0x30, 0x39

# bulk-scan helpers for the hot content-string path
_STR_SPECIAL = re.compile(rb"[()\\]")
_NUMBER_RE = re.compile(rb"[+-]?([0-9]*)(?:\.([0-9]*))?")
_NAME_RE = re.compile(rb"[^\x00\t\n\x0c\r %()<>\[\]{}/]*")
# strict 18-20 byte classic xref row; anything else falls back to the
# tolerant token parser
_XREF_ROW = re.compile(rb"([0-9]{10}) ([0-9]{5}) ([nf])(?: ?\r?\n| \r| )")
_HEX_STRIP = bytes(b for b in (32, 10, 13, 9, 12, 0, PCT))
_ESCAPE_MAP = {
    ord("n"): 0xA,
    ord("r"): 0xD,
    ord("t"): 0x9,
    ord("b"): 0x8,
    ord("f"): 0xC,
    ord("("): ord("("),
    ord(")"): ord(")"),
    ord("\\"): ord("\\"),
}


def is_white(b: int) -> bool:
    return b in WHITE or b == PCT


def is_delim(b: int) -> bool:
    return b in WHITE_OR_DELIM


class XRefTable:
    """ObjectId -> address / parsed-token cache (PdfXRefTable.cs:12-138).

    Address forms: int file offset, ('s', stream_id, index_in_stream) for
    compressed objects, or None for freed entries.  First-seen wins
    (newest xref section is read first — PdfXRefTable.cs:71-82).
    """

    __slots__ = ("addresses", "tokens")

    def __init__(self):
        self.addresses = {}
        self.tokens = {}

    def add_address(self, obj_id: ObjectId, address) -> None:
        if obj_id not in self.addresses:
            self.addresses[obj_id] = address

    def free(self, obj_id: ObjectId) -> None:
        self.addresses[obj_id] = None

    def add_token(self, token: Token) -> None:
        if isinstance(token, RefToken):
            raise PdfError("RefTokens should not get added to the xref table.")
        oid = token.obj_id
        existing = self.tokens.get(oid)
        if existing is not None:
            if isinstance(existing, NullToken):
                del self.tokens[oid]
            else:
                raise PdfError(f"object {oid} already parsed (duplicate add).")
        self.tokens[oid] = token

    def __contains__(self, obj_id: ObjectId) -> bool:
        return obj_id in self.addresses


class PdfLexer:
    """One document's parse state: bytes + cursor + xref + stream scratch."""

    def __init__(
        self,
        data: bytes,
        password: str = "",
        content_delimiter: str = "|",
        working_buffer_size: int = 200_000,
        newline: str = "\n",
    ):
        self.data = data
        self.i = 0
        self.password = password
        self.content_delimiter = content_delimiter
        self.newline = newline
        self.working_buffer_size = working_buffer_size

        self.pdf_version: str = ""
        self.document_info: Optional[str] = None
        self.document_id: Optional[str] = None
        self.metadata: Optional[str] = None
        self.trailer_entries: dict = {}
        self.page_tokens: list = []  # DictionaryTokens in tree order

        self.xref = XRefTable()
        self._trailer_dicts: list = []
        self._object_streams: dict = {}  # stream_id -> (offsets, bytes)

        # encryption state (Tokeniser.cs:623-624)
        self.global_encryption_key: Optional[bytes] = None
        self.is_decryption_error = False
        self.is_string_needs_decryption = False
        self._current_obj_id: Optional[ObjectId] = None

        # stream scratch (Tokeniser.cs:1783-1784)
        self.stream: bytes = b""
        self.sidx = 0
        self._args_start = -(1 << 60)
        self._prev_sidx = 0
        self._mark = -1
        self._frag_start = 0

    # ------------------------------------------------------------------
    # byte cursor helpers (Tokeniser.cs:1353-1379)

    def get_byte(self) -> int:
        return self.data[self.i]

    def next_byte(self) -> int:
        self.i += 1
        return self.data[self.i]

    def lookahead(self) -> int:
        return self.data[self.i + 1]

    def is_end(self) -> bool:
        return self.i + 1 >= len(self.data)

    def skip_ws(self) -> int:
        """Skip whitespace incl. %-comments; return byte at cursor (Tokeniser.cs:1538-1561)."""
        data = self.data
        i = self.i
        b = data[i]
        if b not in WHITE and b != PCT:  # fast path: already at a token
            return b
        while True:
            b = data[i]
            while b == PCT:
                while True:
                    i += 1
                    b = data[i]
                    if b == LF or b == CR:
                        break
                if b == CR and data[i + 1] == LF:
                    i += 1
                i += 1
                b = data[i]
            if b in WHITE:
                i += 1
            else:
                self.i = i
                return b

    def validate_delimiter(self, what: str) -> None:
        b = self.data[self.i]
        if b in WHITE_OR_DELIM:
            return
        raise self.error(
            f"{what} format error: Character after token should be a delimiter but was '{chr(b)}'."
        )

    def verify(self, s: str) -> bool:
        """Advance past s if the bytes match, else restore (Tokeniser.cs:1191-1200)."""
        start = self.i
        for ch in s:
            if self.data[self.i] != ord(ch):
                self.i = start
                return False
            self.i += 1
        return True

    # ------------------------------------------------------------------
    # error context (Tokeniser.cs:1211-1238)

    def show_buffer_at(self, index: Optional[int] = None) -> str:
        if index is None:
            index = self.i
        lo = max(0, index - 100)
        hi = min(len(self.data), index + 100)
        parts = [self._disp(b) for b in self.data[lo:index]]
        parts.append("==>")
        j = index
        if j < len(self.data):
            parts.append(self._disp(self.data[j]))
            j += 1
        parts.append("<==")
        parts.extend(self._disp(b) for b in self.data[j:hi])
        return "".join(parts) + "\n"

    @staticmethod
    def _disp(b: int) -> str:
        if b in (CR, LF) or 0x20 <= b < 0x7F:
            return chr(b)
        ch = PDF_DOC[b]
        if ord(ch) < 0xFFFF:
            return ch
        return "'" + format(b, "x") + "'"

    def error(self, message: str) -> PdfError:
        return PdfError(message, self.show_buffer_at())

    def stream_error(self, message: str) -> PdfStreamError:
        return PdfStreamError(message, self.show_stream_at())

    # ------------------------------------------------------------------
    # header / top-level structure (Tokeniser.cs:180-220)

    def verify_file_header(self) -> None:
        d = self.data
        sig = b"%PDF-1."
        if d[:7] != sig:
            # junk-prefix tolerance: search first 2000 bytes (Tokeniser.cs:189-203)
            idx = d.find(sig, 0, 2000 + len(sig))
            if 0 <= idx < 2000:
                self.pdf_version = "1." + chr(d[idx + 7])
                return
            head = "".join(chr(x) for x in d[:7])
            raise PdfError(
                f"PDF File Header Format error: A pdf file should start with the bytes "
                f"'%PDF-1.', but they are '{head}'."
            )
        self.pdf_version = "1." + chr(d[7])

    def find_pages(self) -> None:
        self._find_xref_table()
        self._read_xref_table()
        self._read_trailers()

    def _find_xref_table(self) -> None:
        """Back-scan for %%EOF + startxref offset; linearized fallback (Tokeniser.cs:230-326)."""
        d = self.data
        i = len(d) - 1
        while True:
            if i < 0:
                raise PdfError("This is not a pdf file.")
            b = d[i]
            i -= 1
            if not (b == CR or b == LF or b == 32 or b == 0):
                break
        ok = b == ord("F")
        for ch in "OE%%":
            if not ok:
                break
            if i < 0:
                ok = False
                break
            ok = d[i] == ord(ch)
            i -= 1
        if ok:
            # read decimal offset backwards
            while True:
                if i < 0:
                    raise PdfError("This is not a pdf file.")
                b = d[i]
                i -= 1
                if not (b == CR or b == LF or b == 32):
                    break
            xref_index = 0
            power = 1
            while True:
                if _D0 <= b <= _D9:
                    xref_index += power * (b - ord("0"))
                    power *= 10
                    if i < 0:
                        raise PdfError("This is not a pdf file.")
                    b = d[i]
                    i -= 1
                elif b == CR or b == LF or b == 32:
                    break
                else:
                    raise self.error("This is not a pdf file.")
            self._xref_index = xref_index
            self.i = xref_index
            return

        # linearized fallback (Tokeniser.cs:266-324): skip the version line and
        # the binary-marker line, parse the first object, look for /Linearized
        self.i = 12
        b = d[self.i]
        self.i += 1
        while b != CR and b != LF:
            b = d[self.i]
            self.i += 1
        token = self.get_next_token()
        if isinstance(token, DictionaryToken) and "Linearized" in token:
            while not (
                d[self.i] == ord("x")
                and d[self.i + 1] == ord("r")
                and d[self.i + 2] == ord("e")
                and d[self.i + 3] == ord("f")
            ):
                self.i += 1
            self._xref_index = self.i
            return
        raise self.error("Pdf file format error: The end of file mark should be '%%EOF'.")

    # ------------------------------------------------------------------
    # xref reading (Tokeniser.cs:337-505)

    def _read_xref_table(self) -> None:
        try:
            self.i = self._xref_index
            d = self.data
            while True:
                if self.verify("xref"):
                    trailer_dict = self._read_classic_xref_section()
                else:
                    trailer_dict = self._read_xref_stream_section()
                self._trailer_dicts.append(trailer_dict)
                prev = trailer_dict.entries.get("Prev")
                if prev is not None and isinstance(prev, NumberToken):
                    self.i = prev.ivalue
                else:
                    return
        except (PdfError, PdfStreamError):
            raise
        except Exception as ex:  # Tokeniser.cs:502-504
            raise PdfError("Error in PdfParser Read Xref Table: " + str(ex)) from ex

    def _read_classic_xref_section(self) -> DictionaryToken:
        d = self.data
        last_pos = -1
        while True:
            if self.i == last_pos:
                # a zero-digit number at a delimiter parses as 0 without
                # advancing; the reference loops forever here
                # (Tokeniser.cs:356-388 with Token.cs:149-168) — fail fast
                # instead of reproducing a denial-of-service hang
                raise self.error("Xref table: parser stalled (malformed subsection).")
            last_pos = self.i
            start_num = self._parse_number(None).ivalue
            count = self._parse_number(None).ivalue
            self.skip_ws()
            k0 = 0
            # bulk fast path over strict-format rows (same results; the
            # tolerant token parser handles any remainder)
            while k0 < count:
                m = _XREF_ROW.match(d, self.i)
                if m is None:
                    break
                obj_num = start_num + k0
                status = m.group(3)
                if status == b"n":
                    self.xref.add_address(
                        (obj_num, int(m.group(2))), int(m.group(1))
                    )
                else:
                    generation = int(m.group(2))
                    if obj_num == 0:
                        if generation < 65535:
                            raise self.error(
                                f"Xref table: entry 0000000000 should have the value "
                                f"65535 but has '{generation}' instead."
                            )
                    else:
                        self.xref.free((obj_num, generation))
                self.i = m.end()
                k0 += 1
            for k in range(k0, count):
                obj_num = start_num + k
                address = self._parse_number(None).ivalue
                generation = self._parse_number(None).ivalue
                self.i += 1
                b = d[self.i]
                self.i += 1
                if b == ord("n"):
                    self.xref.add_address((obj_num, generation), address)
                elif b == ord("f"):
                    if obj_num == 0:
                        if generation < 65535:
                            raise self.error(
                                f"Xref table: entry 0000000000 should have the value 65535 "
                                f"but has '{generation}' instead."
                            )
                    else:
                        self.xref.free((obj_num, generation))
                else:
                    raise self.error(f"'n' or 'f' missing after ref {address} {generation}.")
            self.skip_ws()
            if d[self.i] == ord("t"):
                break
        if not self.verify("trailer"):
            raise self.error("Pdf file format error: trailer was missing after xref table.")
        return self._parse_dict(None)

    def _read_xref_stream_section(self) -> DictionaryToken:
        token = self.get_next_token()
        if not isinstance(token, DictionaryToken):
            raise self.error("Cannot find cross reference table in pdf file.")
        xs = token
        if xs.type != "XRef":
            raise self.error(
                f"readXrefTable(); dictionary type of xrefStream should be 'XRef' "
                f"but was '{xs.type}'."
            )
        size_tok = xs.get_number("Size")
        if size_tok is None:
            raise self.error("readXrefTable(); xrefStream is missing the 'W' entry.")
        index_arr = xs.get_array("Index")
        if index_arr is None:
            index_arr = ArrayToken([NumberToken.from_int(0), size_tok], self)
        w_arr = xs.get_array("W")
        if w_arr is None:
            raise self.error("readXrefTable(); xrefStream is missing the 'W' entry.")
        if len(w_arr) != 3:
            raise self.error(
                f"readXrefTable(); xrefStream should have 3 integers in 'W' entry, "
                f"but there were {len(w_arr)}."
            )
        widths = [w_arr[0].ivalue, w_arr[1].ivalue, w_arr[2].ivalue]

        self.fill_stream_from_dict(xs)
        stream = self.stream
        pos = 0
        obj_count = 0
        obj_num = 0
        idx_i = 0

        def take(width: int) -> int:
            nonlocal pos
            v = 0
            for _ in range(width):
                v = v * 0x100 + stream[pos]
                pos += 1
            return v

        while pos < len(stream):
            if obj_count <= 0:
                obj_num = index_arr[idx_i].ivalue
                obj_count = index_arr[idx_i + 1].ivalue
                idx_i += 2
            else:
                obj_num += 1
            obj_count -= 1
            entry_type = take(widths[0])
            if entry_type == 0:
                take(widths[1])
                take(widths[2])
            elif entry_type == 1:
                offset = take(widths[1])
                gen = take(widths[2])
                self.xref.add_address((obj_num, gen), offset)
            elif entry_type == 2:
                stream_obj_num = take(widths[1])
                stream_obj_idx = take(widths[2])
                self.xref.add_address((obj_num, 0), ("s", stream_obj_num, stream_obj_idx))
            else:
                raise self.stream_error(
                    f"readXrefTable(); xrefStream first column can be 0..2, but "
                    f"{entry_type}was found."
                )
        return xs

    # ------------------------------------------------------------------
    # trailers (Tokeniser.cs:508-617)

    _STRUCTURAL_KEYS = frozenset(
        ("Size", "Prev", "XRefStm", "DecodeParms", "Filter", "Index", "Length", "Type", "W")
    )

    def _read_trailers(self) -> None:
        for trailer_dict in self._trailer_dicts:
            for key in trailer_dict.keys:
                if key in self._STRUCTURAL_KEYS:
                    continue
                child = trailer_dict[key]
                existing = self.trailer_entries.get(key)
                if existing is not None:
                    if type(existing) is not type(child):
                        raise PdfError(
                            f"Trailer: Token '{child.to_repr()}' for key '{key}' in previous "
                            f"trailer table should be the same as the token "
                            f"'{existing.to_repr()}' in the new table."
                        )
                    if key != "ID" and child.to_repr() != existing.to_repr():
                        raise PdfError(
                            f"Trailer: Token '{child.to_repr()}' for key '{key}' in previous "
                            f"trailer table should be the same as the token "
                            f"'{existing.to_repr()}' in the new table."
                        )
                else:
                    self.trailer_entries[key] = child

        # DocumentID (Tokeniser.cs:547-555)
        id_token = self.trailer_entries.get("ID")
        if id_token is not None and isinstance(id_token, ArrayToken):
            self.document_id = ""
            for detail in id_token:
                if isinstance(detail, StringToken):
                    self.document_id += f'"{detail.value}"; '

        # Encryption (Tokeniser.cs:557-576)
        password_error = None
        enc = self.trailer_entries.get("Encrypt")
        if enc is not None:
            password_error = self._setup_encryption(enc)
            if password_error is None:
                self.is_string_needs_decryption = True
                for key, value in list(self.trailer_entries.items()):
                    if key in ("Root", "Encrypt", "ID"):
                        continue
                    if isinstance(value, DictionaryToken):
                        for k2 in value.keys:
                            v2 = value.entries.get(k2)
                            if isinstance(v2, StringToken):
                                v2.value = self.decrypt_string(value.obj_id, v2.value)

        # DocumentInfo (Tokeniser.cs:579-597)
        info = self.trailer_entries.get("Info")
        if info is not None:
            self.document_info = ""
            try:
                items = info if isinstance(info, ArrayToken) else [info]
                for item in items:
                    info_dict = item
                    if not isinstance(info_dict, DictionaryToken):
                        raise PdfError(f"Info entry is not a dictionary: {type(item).__name__}")
                    for k2, v2 in info_dict.items():
                        if isinstance(v2, StringToken):
                            self.document_info += f"{k2}: {v2.value}; "
            except Exception as ex:
                self.document_info += (
                    self.newline
                    + f"Exception while reading info token {info.to_repr()}:"
                    + self.newline
                    + f"{type(ex).__name__}: {ex}"
                    + self.newline
                )
        if password_error is not None:
            self.document_info = (self.document_info or "") + (
                self.newline
                + "Exception while reading decryption information:"
                + self.newline
                + password_error
                + self.newline
            )

        # Root -> Pages / Metadata (Tokeniser.cs:600-611)
        root = self.trailer_entries.get("Root")
        if root is not None:
            if not isinstance(root, DictionaryToken):
                raise PdfError(f"Root is not a dictionary: {type(root).__name__}")
            pages = root.get("Pages")
            if pages is not None:
                self._read_pages(pages)
            metadata = root.get("Metadata")
            if metadata is not None:
                self._read_metadata(metadata)

    def _read_pages(self, pages_token: Token) -> None:
        """Recursive Kids walk; tree order defines page order (Tokeniser.cs:1161-1176)."""
        if self.is_decryption_error:
            return
        if not isinstance(pages_token, DictionaryToken):
            raise PdfError(f"Pages is not a dictionary: {type(pages_token).__name__}")
        kids = pages_token.get("Kids")
        if kids is None:
            return
        if not isinstance(kids, ArrayToken):
            raise PdfError(f"Kids is not an array: {type(kids).__name__}")
        for kid in kids:
            if not isinstance(kid, DictionaryToken):
                raise PdfError(f"page token is not a dictionary: {type(kid).__name__}")
            if kid.type == "Page":
                self.page_tokens.append(kid)
            elif kid.type == "Pages":
                self._read_pages(kid)

    def _read_metadata(self, metadata_token: Token) -> None:
        """Root->Metadata stream, /Subtype /XML only (Tokeniser.cs:1179-1188)."""
        if not isinstance(metadata_token, DictionaryToken):
            return
        subtype = metadata_token.get("Subtype")
        if isinstance(subtype, NameToken) and subtype.value == "XML":
            self.fill_stream_from_dict(metadata_token)
            self.metadata = self.show_stream_content()

    # ------------------------------------------------------------------
    # encryption setup (Tokeniser.cs:627-743, PdfEncrypt.cs:24-46)

    def _setup_encryption(self, enc_token: Token) -> Optional[str]:
        if not isinstance(enc_token, DictionaryToken):
            raise PdfNotSupportedError(
                "PdfParser can only decrypt pdf files using Standard encryption."
            )
        enc = enc_token
        filter_name = enc.get_name("Filter")
        v = enc.get_number("V")
        r = enc.get_number("R")
        p = enc.get_number("P")
        o_bytes = enc.get_hex_bytes("O")
        u_bytes = enc.get_hex_bytes("U")
        id_token = self.trailer_entries.get("ID")
        if (
            filter_name != "Standard"
            or v is None
            or v.ivalue not in (1, 2)
            or r is None
            or r.ivalue not in (2, 3)
            or p is None
            or o_bytes is None
            or u_bytes is None
            or id_token is None
        ):
            raise PdfNotSupportedError(
                "PdfParser can only decrypt pdf files using Standard encryption.\n"
                + enc.to_repr()
            )
        length_tok = enc.get_number("Length")
        length_bits = length_tok.ivalue if length_tok is not None else 40
        length_bytes = length_bits // 8
        first_id = id_token[0]
        trailer_id = first_id.hex_bytes if isinstance(first_id, StringToken) else None
        if trailer_id is None:
            raise PdfNotSupportedError(
                "PdfParser can only decrypt pdf files using Standard encryption."
            )
        permission = int(p.decimal)

        padded = crypt.pad_password(self.password)
        key = crypt.compute_encryption_key(padded, o_bytes, permission, trailer_id, length_bytes)
        if crypt.authenticate_user_password(padded, key, trailer_id, u_bytes):
            # mutable copy so stream decryption can run in place (Tokeniser.cs:1799-1814)
            if not isinstance(self.data, bytearray):
                self.data = bytearray(self.data)
            self.global_encryption_key = key
            return None
        # owner-password authentication is a documented reference gap
        # (Tokeniser.cs:810-840 throws NotImplementedException)
        raise NotImplementedError("owner password authentication is not implemented")

    def decrypt_string(self, obj_id: Optional[ObjectId], value: str) -> str:
        """Per-string RC4 decryption (Tokeniser.cs:1849-1860)."""
        if self.is_decryption_error:
            return "Decryption error"
        if obj_id is None:
            obj_id = self._current_obj_id
        if obj_id is None:
            raise PdfError("string decryption outside an object context")
        data = bytes(ord(c) & 0xFF for c in value)
        out = crypt.rc4(self._object_key(obj_id), data)
        # .NET ASCIIEncoding maps non-ASCII bytes to '?'
        return "".join(chr(b) if b < 0x80 else "?" for b in out)

    def _object_key(self, obj_id: ObjectId) -> bytes:
        return crypt.object_encryption_key(self.global_encryption_key, obj_id[0], obj_id[1])

    # ------------------------------------------------------------------
    # token parsing (Tokeniser.cs:1397-1498, Token.cs constructors)

    def get_next_token(
        self,
        obj_id: Optional[ObjectId] = None,
        throw_on_error: bool = True,
    ) -> Optional[Token]:
        b = self.skip_ws()
        if b == ord("f") or b == ord("t"):
            return self._parse_bool(obj_id)
        if b in b"+-0123456789.":
            return self._process_number(obj_id, throw_on_error)
        if b == _LP:
            return self._parse_string(obj_id)
        if b == _LT:
            if self.data[self.i + 1] == ord("<"):
                return self._parse_dict(obj_id)
            return self._parse_string(obj_id)
        if b == _SLASH:
            return self._parse_name(obj_id)
        if b == _LB:
            return self._parse_array(obj_id)
        if b == ord("n"):
            return self._parse_null(obj_id)
        if throw_on_error:
            raise self.error(f"NextToken(): unexpected character '{chr(b)}'.")
        return None

    def _register(self, token: Token) -> None:
        if token.obj_id is not None and not isinstance(token, RefToken):
            self.xref.add_token(token)

    def _parse_bool(self, obj_id) -> BoolToken:
        b = self.skip_ws()
        if b == ord("t") and self.verify("true"):
            value = True
        elif b == ord("f") and self.verify("false"):
            value = False
        else:
            raise self.error(
                f"Bool not valid, should be 'true' or 'false'. Invalid character: {chr(b)}"
            )
        self.validate_delimiter("Bool")
        token = BoolToken(value, obj_id)
        self._register(token)
        return token

    _DECIMAL_CACHE: dict = {}

    def _parse_number(self, obj_id) -> NumberToken:
        """Digit accumulation with C# decimal semantics (Token.cs:124-174).

        Regex-scanned; a second decimal point simply terminates the match and
        fails delimiter validation (same recorded-failure outcome as the
        reference's explicit second-point error).  Small-int Decimals are
        interned — they recur constantly (object numbers, offsets, operands).
        """
        self.skip_ws()
        m = _NUMBER_RE.match(self.data, self.i)
        ipart, frac = m.group(1), m.group(2)
        sign = -1 if self.data[m.start()] == _MINUS else 1
        self.i = m.end()
        if frac:
            int_value = int(ipart) if ipart else 0
            dec = Decimal(int_value) + Decimal(int(frac)) / (10 ** len(frac))
            dec = sign * dec
            if dec == 0:
                dec = Decimal(0)
            token = NumberToken(dec, None, obj_id)
        else:
            v = sign * (int(ipart) if ipart else 0)
            ivalue = v if v < _INT_MAX else None
            cache = self._DECIMAL_CACHE
            dec = cache.get(v)
            if dec is None:
                dec = Decimal(v)
                if -10000 < v < 10**7:
                    cache[v] = dec
            token = NumberToken(dec, ivalue, obj_id)
        self.validate_delimiter("Number")
        self._register(token)
        return token

    def _process_number(self, obj_id, throw_on_error: bool = True) -> Token:
        """int int R / int int obj disambiguation (Tokeniser.cs:1444-1498)."""
        number1 = self._parse_number(obj_id)
        token2_index = self.i
        if not number1.has_reference_format:
            return number1
        # a reference's second token must be an integer: when the next byte
        # cannot start one, skip the (side-effect-free but wasteful) lookahead
        # parse of the following name/string/dict the reference performs
        b = self.skip_ws()
        if not (_D0 <= b <= _D9 or b == _PLUS):
            self.i = token2_index
            return number1
        self.i = token2_index
        token2 = self.get_next_token(throw_on_error=False)
        if not isinstance(token2, NumberToken) or not token2.has_reference_format:
            self.i = token2_index
            return number1
        b = self.skip_ws()
        ref_id = (number1.ivalue, token2.ivalue)
        if b == ord("R"):
            self.i += 1
            return RefToken(ref_id)
        if self.verify("obj"):
            self.skip_ws()
            prev_obj_id = self._current_obj_id
            self._current_obj_id = ref_id
            try:
                token = self.get_next_token(ref_id, throw_on_error)
            finally:
                self._current_obj_id = prev_obj_id
            b = self.skip_ws()
            if not self.verify("endobj"):
                raise self.error("Indirect object format error, string 'endobj' missing.")
            return token
        self.i = token2_index
        return number1

    def _parse_string(self, obj_id) -> StringToken:
        """Literal/hex string; escapes kept raw (Token.cs:206-276)."""
        d = self.data
        b = self.skip_ws()
        chars: list = []
        hex_bytes = None
        if b == _LP:
            brackets = 1
            i = self.i + 1
            b = d[i]
            while True:
                if b == _BS:
                    chars.append("\\")
                    i += 1
                    b = d[i]
                else:
                    if b == _LP:
                        brackets += 1
                    elif b == _RP:
                        brackets -= 1
                        if brackets == 0:
                            break
                chars.append(chr(b))
                i += 1
                b = d[i]
            self.i = i
        elif b == _LT:
            chars.append("<")
            i = self.i + 1
            b = d[i]
            while b != _GT:
                chars.append(chr(b))
                i += 1
                b = d[i]
            chars.append(">")
            self.i = i
            if len(chars) % 2 == 0:
                try:
                    hex_bytes = bytes.fromhex("".join(chars[1:-1]))
                except ValueError:
                    hex_bytes = None
        else:
            raise self.error(
                f"String format error, '(' or '<' expected as leading character, "
                f"but was '{chr(b)}'."
            )
        value = "".join(chars)
        if self.is_string_needs_decryption:
            value = self.decrypt_string(obj_id, value)
        self.i += 1
        token = StringToken(value, hex_bytes, obj_id)
        self._register(token)
        return token

    def _parse_name(self, obj_id) -> NameToken:
        b = self.skip_ws()
        if b != _SLASH:
            raise self.error(
                f"Name format error: First character should be '/' but was '{chr(b)}'"
            )
        m = _NAME_RE.match(self.data, self.i + 1)
        self.i = m.end()
        token = NameToken(m.group().decode("latin-1"), obj_id)
        self._register(token)
        return token

    def _parse_array(self, obj_id) -> ArrayToken:
        d = self.data
        b = self.skip_ws()
        if b != _LB:
            raise self.error(
                f"illegal array format, leading character '[' expected but was {chr(b)}."
            )
        items: list = []
        token = ArrayToken(items, self, obj_id)
        self._register(token)
        b = self.next_byte()
        while b != ord("]"):
            child = self.get_next_token(throw_on_error=False)
            if child is not None:
                items.append(child)
                b = self.skip_ws()
            else:
                b = self.get_byte()
                if b != ord("]"):
                    raise self.error(f"NextToken(): unexpected character '{chr(b)}'.")
        self.i += 1
        return token

    def _parse_dict(self, obj_id) -> DictionaryToken:
        d = self.data
        b = self.skip_ws()
        if b != _LT or self.next_byte() != ord("<"):
            raise self.error(
                f"illegal dictionary format, leading characters '<<' expected, "
                f"but was'{chr(b)}{chr(self.lookahead())}'."
            )
        entries: dict = {}
        type_name = None
        token = DictionaryToken(entries, self, obj_id)
        self._register(token)
        self.next_byte()
        b = self.skip_ws()
        while not (b == _GT or self.lookahead() == ord(">")):
            if b != _SLASH:
                raise self.error(
                    f"Invalid dictionary format, '/' expected as leading character for "
                    f"dictionary key name, but was {chr(b)}."
                )
            key = self._parse_name(None).value
            value = self.get_next_token()
            if key == "Type" and isinstance(value, NameToken):
                type_name = value.value
            if key in entries:
                existing = entries[key]
                if isinstance(existing, ArrayToken):
                    existing.append(value)
                else:
                    entries[key] = ArrayToken([existing, value], self)
            else:
                entries[key] = value
            b = self.skip_ws()
        token.type = type_name
        self.next_byte()
        if self.is_end():
            token.stream_start = None
            token.stream_length = None
        else:
            self.next_byte()
            start, length = self._get_stream_start(token)
            if start is not None:
                token.stream_start = start
                token.stream_length = length
        return token

    def _parse_null(self, obj_id) -> NullToken:
        b = self.skip_ws()
        if not self.verify("null"):
            raise self.error(f"Null token not valid, should be 'null'. Invalid character: {chr(b)}")
        self.validate_delimiter("Bool")
        token = NullToken(obj_id)
        self._register(token)
        return token

    # ------------------------------------------------------------------
    # stream boundary (Tokeniser.cs:1612-1698)

    def _get_stream_start(self, dict_token: DictionaryToken) -> Tuple[Optional[int], Optional[int]]:
        d = self.data
        start_index = self.i
        try:
            self.skip_ws()
            has_stream = self.verify("stream")
        except IndexError:
            # dictionary followed only by trailing whitespace at buffer end —
            # common for the last object in a pdfTeX object stream.  The
            # reference indexes past the end here (its parse of such files
            # fails wholesale); treat as no-stream instead.
            self.i = start_index
            return None, None
        if not has_stream:
            self.i = start_index
            return None, None
        # last char before stream content should be lf; tolerate bare cr
        while True:
            c = d[self.i]
            self.i += 1
            if c == LF:
                break
            if c == CR:
                if d[self.i] == LF:
                    self.i += 1
                break
        stream_start = self.i
        if "Length" not in dict_token.entries:
            raise self.error("stream dictionary is missing the 'Length' entry.")
        length_token = dict_token["Length"]
        if isinstance(length_token, NumberToken):
            length = length_token.ivalue
            endstream_index = self.i + length
            if endstream_index > len(d) - 20:
                dict_token.stream_length_problem = (
                    (dict_token.stream_length_problem or "")
                    + f"Pdf content stream: Length {length} points after last byte "
                    f"{len(d)} in pdf file." + self.newline + self.show_buffer_at()
                )
            else:
                self.i += length
                self.skip_ws()
                endstream_index = self.i
                if self.verify("endstream"):
                    return stream_start, length
                self.i = endstream_index
                dict_token.stream_length_problem = (
                    (dict_token.stream_length_problem or "")
                    + f"Pdf content stream: Length {length} does not point to endstream."
                    + self.newline
                    + self.show_buffer_at()
                )
                self.i = stream_start
        # repair: scan for 'endstream' (Tokeniser.cs:1678-1695)
        idx = d.find(b"endstream", self.i)
        if idx < 0:
            raise PdfError("'endstream' could not be found after the stream bytes.")
        self.i = idx + len(b"endstream")
        length = idx - stream_start - 1
        if d[idx - 2] == CR:
            length -= 1
        return stream_start, length

    # ------------------------------------------------------------------
    # object resolution (PdfXRefTable.cs:29-48, Tokeniser.cs:1382-1388, 2161-2189)

    def get_object(self, obj_id: ObjectId) -> Token:
        cached = self.xref.tokens.get(obj_id)
        if cached is not None:
            return cached
        address = self.xref.addresses.get(obj_id)
        if address is None:  # unknown or freed
            return NullToken(obj_id, is_error=True)
        if isinstance(address, int):
            return self._get_token_at(obj_id, address)
        return self._get_token_from_objstream(obj_id, address[1], address[2])

    def _get_token_at(self, obj_id: ObjectId, address: int) -> Token:
        prev = self.i
        prev_obj = self._current_obj_id
        self.i = address
        self._current_obj_id = obj_id
        try:
            token = self.get_next_token()
        finally:
            self.i = prev
            self._current_obj_id = prev_obj
        return token

    def _get_token_from_objstream(self, obj_id: ObjectId, stream_id: int, index: int) -> Token:
        entry = self._object_streams.get(stream_id)
        if entry is None:
            objstream_dict = self.get_object((stream_id, 0))
            if not isinstance(objstream_dict, DictionaryToken):
                raise PdfError(f"Pdf object stream {stream_id} not found.")
            first = objstream_dict.get_number("First")
            if first is None:
                raise PdfError("Pdf object stream: 'First' entry is missing.")
            n = objstream_dict.get_number("N")
            if n is None:
                raise PdfError("Pdf object stream: 'N' entry is missing.")
            self.fill_stream_from_dict(objstream_dict)
            offsets = []
            for _ in range(n.ivalue):
                offsets.append((self.get_stream_int(), self.get_stream_int() + first.ivalue))
            entry = (offsets, bytes(self.stream))
            self._object_streams[stream_id] = entry
        offsets, payload = entry
        stream_obj_num, offset = offsets[index]
        if stream_obj_num != obj_id[0]:
            raise PdfError(
                f"Pdf object stream: stream {stream_id} should contain {obj_id[0]} at "
                f"{index}, but was {stream_obj_num}."
            )
        saved_data, saved_i = self.data, self.i
        prev_obj = self._current_obj_id
        self.data = payload
        self.i = offset
        self._current_obj_id = obj_id
        try:
            token = self.get_next_token(obj_id)
        finally:
            self.data = saved_data
            self.i = saved_i
            self._current_obj_id = prev_obj
        return token

    def get_stream(self, obj_id: ObjectId):
        """Fetch an object's decoded stream with brute-force recovery
        (Tokeniser.cs:1735-1775): if the xref misses the object, linear-scan
        the file for the literal ``N G obj``, parse the dictionary there and
        decode its stream.  Returns (dict_token_or_None, stream_bytes_or_None)
        or None when the object cannot be found / is not a stream."""
        token = self.get_object(obj_id)
        if isinstance(token, NullToken):
            marker = f"{obj_id[0]} {obj_id[1]} obj".encode("latin-1")
            idx = bytes(self.data).find(marker)
            if idx < 0:
                return None
            prev = self.i
            self.i = idx + len(marker)
            try:
                self.xref.tokens.pop(obj_id, None)  # drop the error NullToken
                dict_token = self._parse_dict(obj_id)
                self.fill_stream_from_dict(dict_token)
                return (None, self.stream)
            finally:
                self.i = prev
        if isinstance(token, DictionaryToken):
            if token.stream_length_problem is not None:
                return (token, None)
            self.fill_stream_from_dict(token)
            return (token, self.stream)
        return None

    # ------------------------------------------------------------------
    # stream filling / decoding (Token.cs:627-669, Tokeniser.cs:1796-1846, 2192-2215)

    def fill_stream_from_dict(self, dict_token: DictionaryToken) -> None:
        """GetStreamBytes: filter dispatch + fill + optional predictor (Token.cs:627-669)."""
        if not dict_token.is_stream:
            raise PdfError(f"'{dict_token.to_repr()}' is not a stream.")
        filter_token = dict_token.entries.get("Filter")  # raw: no deref (Token.cs:631)
        if filter_token is not None:
            if isinstance(filter_token, ArrayToken):
                filter_token = filter_token[0]
            if not isinstance(filter_token, NameToken):
                raise PdfError("stream Filter entry is not a name.")
            filter_string = filter_token.value
            if filter_string == "":
                filt = FILTER_NONE
            elif filter_string == "FlateDecode":
                filt = FILTER_FLATE
            elif filter_string == "ASCIIHexDecode":
                filt = FILTER_ASCIIHEX
            else:
                raise PdfNotSupportedError(
                    f"Stream filter {filter_string} is not (yet) supported."
                )
        else:
            filt = FILTER_NONE
        self.fill_stream_bytes(dict_token, filt)

        decode_parms = dict_token.get_dict("DecodeParms")
        if decode_parms is not None:
            columns = decode_parms.get_number("Columns")
            if columns is None:
                raise self.error("Stream DecodeParms are missing Columns parameter.")
            predictor = decode_parms.get_number("Predictor")
            if predictor is None:
                raise self.error("Stream DecodeParms are missing Predictor parameter.")
            if predictor.ivalue != 12:
                raise self.error("Stream DecodeParms Predictor parameter should be 12.")
            self.apply_predictor_up(columns.ivalue)

    def fill_stream_bytes(self, dict_token: DictionaryToken, filt: int) -> None:
        self.i = dict_token.stream_start
        self._args_start = -(1 << 60)
        start = dict_token.stream_start
        length = dict_token.stream_length
        if self.global_encryption_key is not None and not dict_token.is_decrypted:
            # in-place RC4 over the stream range (Tokeniser.cs:1799-1814)
            dict_token.is_decrypted = True
            if dict_token.obj_id is None:
                raise PdfError("encrypted stream without object id")
            crypt.rc4_inplace(self._object_key(dict_token.obj_id), self.data, start, length)

        if filt == FILTER_NONE:
            self.stream = bytes(self.data[start : start + length])
            self.sidx = 0
            return
        if filt == FILTER_ASCIIHEX:
            # ASCIIHexDecode (engine extension beyond the reference's filter
            # set, required by the target scope): hex pairs, whitespace
            # ignored, '>' is EOD, odd trailing digit is padded with 0
            raw = bytes(self.data[start : start + length])
            end = raw.find(b">")
            if end >= 0:
                raw = raw[:end]
            digits = raw.translate(None, _HEX_STRIP)
            if len(digits) % 2 == 1:
                digits += b"0"
            try:
                self.stream = bytes.fromhex(digits.decode("ascii"))
            except (ValueError, UnicodeDecodeError) as ex:
                raise self.stream_error(f"ASCIIHexDecode failed: {ex}") from None
            self.sidx = 0
            return
        # FlateDecode: drop the 2-byte zlib header, raw inflate, capped at the
        # working-buffer size (Tokeniser.cs:1822-1841)
        decomp = zlib.decompressobj(-15)
        try:
            out = decomp.decompress(
                bytes(self.data[start + 2 : start + length]), self.working_buffer_size
            )
        except zlib.error as ex:
            raise self.stream_error(f"FlateDecode failed: {ex}") from ex
        if len(out) >= self.working_buffer_size:
            raise self.stream_error(
                f"Reading stream, internal {len(out)} bytes buffer overflow."
            )
        self.stream = out
        self.sidx = 0

    def apply_predictor_up(self, bytes_per_row: int) -> None:
        """PNG predictor 12 'Up' only (Tokeniser.cs:2192-2215)."""
        import numpy as np

        stream = self.stream
        row_count = len(stream) // (bytes_per_row + 1)
        arr = np.frombuffer(bytes(stream[: row_count * (bytes_per_row + 1)]), dtype=np.uint8)
        arr = arr.reshape(row_count, bytes_per_row + 1)
        if not (arr[:, 0] == 2).all():
            bad = int(arr[arr[:, 0] != 2][0, 0])
            raise self.stream_error(
                f"Pdf stream, ApplyPredictorUp(): Filter type 2: Up expected, but was {bad}."
            )
        out = np.cumsum(arr[:, 1:], axis=0, dtype=np.uint8)  # uint8 accumulate wraps mod 256
        self.stream = out.tobytes()
        self.sidx = 0

    # ------------------------------------------------------------------
    # stream cursor ops (Tokeniser.cs:1903-2357)

    def skip_stream_ws(self) -> bool:
        s = self.stream
        i = self.sidx
        n = len(s)
        if i < n:
            b = s[i]
            if b not in WHITE and b != PCT:  # fast path: already at a token
                return True
        while True:
            if i >= n:
                self.sidx = i
                return False
            b = s[i]
            while b == PCT:  # stream-cursor comment skip (see module docstring)
                while True:
                    i += 1
                    b = s[i]
                    if b == LF or b == CR:
                        break
                if b == CR and s[i + 1] == LF:
                    i += 1
                i += 1
                b = s[i]
            if b in WHITE:
                i += 1
            else:
                self.sidx = i
                return True

    _NUM_RUN = re.compile(rb"[0-9.]*")
    _NAME_RUN = re.compile(rb"[^\x00\t\n\x0c\r %()<>\[\]{}/]*")

    def _skip_number(self) -> None:
        m = self._NUM_RUN.match(self.stream, self.sidx)
        self.sidx = m.end()
        if self.sidx >= len(self.stream):
            raise IndexError("index out of range")

    def _skip_name(self) -> None:
        m = self._NAME_RUN.match(self.stream, self.sidx)
        self.sidx = m.end()
        if self.sidx >= len(self.stream):
            raise IndexError("index out of range")

    def _skip_hex_string(self) -> None:
        idx = self.stream.find(b">", self.sidx)
        if idx < 0:
            raise IndexError("unterminated hex string")
        self.sidx = idx + 1

    def _skip_string(self) -> None:
        s = self.stream
        i = self.sidx
        brackets = 1
        n = len(s)
        if i >= n:
            return
        while True:
            m = _STR_SPECIAL.search(s, i)
            if m is None:
                self.sidx = n
                return
            b = s[m.start()]
            i = m.start() + 1
            if b == _BS:
                i += 1
            elif b == _LP:
                brackets += 1
            else:
                brackets -= 1
                if brackets == 0:
                    break
            if i >= n:
                self.sidx = i if i <= n else n
                return
        self.sidx = i

    def _skip_array(self) -> None:
        s = self.stream
        while True:
            b = s[self.sidx]
            self.sidx += 1
            if b == _RB:
                return
            if b == _LT:
                b = s[self.sidx]
                self.sidx += 1
                if b == _LT:
                    self._skip_dict()
                else:
                    self.sidx -= 1
                    self._skip_hex_string()
            elif b == _LB:
                self._skip_array()
            elif b == _LP:
                self._skip_string()

    def _skip_dict(self) -> None:
        s = self.stream
        while True:
            b = s[self.sidx]
            self.sidx += 1
            if b == _LT:
                b = s[self.sidx]
                self.sidx += 1
                if b == _LT:
                    self._skip_dict()
                else:
                    self.sidx -= 1
                    self._skip_hex_string()
            elif b == _GT:
                b = s[self.sidx]
                self.sidx += 1
                if b == _GT:
                    return
                raise self.stream_error("Stream: expected '>>'.")
            elif b == _LB:
                self._skip_array()
            elif b == _LP:
                self._skip_string()

    def get_stream_opcode(self, search_code: Optional[str] = None) -> Optional[bytes]:
        """Skip arguments, return the next operator (Tokeniser.cs:2218-2288).

        Records the argument start position for StartStreamArgumentReading.
        """
        s = self.stream
        skip_ws = self.skip_stream_ws
        name_run = self._NAME_RUN
        num_run = self._NUM_RUN
        while True:
            if not skip_ws():
                return None
            if self._args_start == self.sidx:
                raise self.stream_error("Endless loop: Trying to process the same op code again.")
            self._args_start = self.sidx
            while True:
                b = s[self.sidx]
                self.sidx += 1
                if (_D0 <= b <= _D9) or b == _MINUS or b == _DOT or b == _PLUS:
                    self.sidx = num_run.match(s, self.sidx).end()
                    if self.sidx >= len(s):
                        raise IndexError("index out of range")
                elif b == _SLASH:
                    self.sidx = name_run.match(s, self.sidx).end()
                    if self.sidx >= len(s):
                        raise IndexError("index out of range")
                elif b == _LT:
                    if s[self.sidx] == _LT:
                        self.sidx += 1
                        self._skip_dict()
                    else:
                        self._skip_hex_string()
                elif b == _LP:
                    self._skip_string()
                elif b == _LB:
                    self._skip_array()
                elif b == 0x74 and s[self.sidx : self.sidx + 3] == b"rue":
                    self.sidx += 3
                elif b == 0x66 and s[self.sidx : self.sidx + 4] == b"alse":
                    self.sidx += 4
                else:
                    break
                if not skip_ws():
                    return None

            self.sidx -= 1
            start = self.sidx
            # operator = run of non-delimiter bytes
            self.sidx = name_run.match(s, start).end()

            if search_code is None:
                break
            if self.sidx - start == len(search_code):
                if s[start : self.sidx] == search_code.encode("latin-1"):
                    break
        return s[start : self.sidx]

    def start_stream_argument_reading(self) -> None:
        self._prev_sidx = self.sidx
        self.sidx = self._args_start

    def end_stream_argument_reading(self) -> None:
        self.sidx = self._prev_sidx

    def set_stream_mark(self) -> None:
        self._mark = self.sidx

    def get_stream_marked_text(self) -> str:
        if self._mark < 0 or self._mark > self.sidx:
            raise PdfError("invalid stream mark")
        return self.stream[self._mark : self.sidx].decode("latin-1")

    def mark_stream_text_fragment(self) -> None:
        self._frag_start = self.sidx

    def get_stream_text_fragment(self) -> str:
        end = self.sidx - 2  # strip trailing 'ET' (Tokeniser.cs:2350-2357)
        return self.stream[self._frag_start : end].decode("latin-1")

    def skip_stream_argument(self) -> None:
        """Skip one argument before ' / " operators (Tokeniser.cs:1937-1990)."""
        s = self.stream
        self.skip_stream_ws()
        b = s[self.sidx]
        self.sidx += 1
        if b == _LP:
            while True:
                self.sidx += 1
                brackets = 1
                b = s[self.sidx]
                while True:
                    if b == _BS:
                        self.sidx += 1
                        b = s[self.sidx]
                    else:
                        if b == _LP:
                            brackets += 1
                        elif b == _RP:
                            brackets -= 1
                            if brackets == 0:
                                break
                    self.sidx += 1
                    b = s[self.sidx]
                if is_white(s[self.sidx]):
                    break
            self.sidx += 1
            return
        if b == _LT:
            while s[self.sidx] != ord(">"):
                self.sidx += 1
            self.sidx += 1
            return
        while not is_white(s[self.sidx]):
            self.sidx += 1

    def content_stream_skip_inline_image(self) -> None:
        """BI .. ID <binary> EI (Tokeniser.cs:2106-2138)."""
        op = self.get_stream_opcode()
        if op is None or op != b"ID":
            raise self.stream_error(
                "Content Stream: Inline image operator 'BI' should be followed by 'ID'."
            )
        s = self.stream
        while True:
            b = s[self.sidx]
            self.sidx += 1
            if (
                b == ord("E")
                and s[self.sidx] == ord("I")
                and is_delim(s[self.sidx + 1])
            ):
                self.sidx += 1
                return

    def content_stream_get_clipping_region(self):
        """'x y w h re W n' (Tokeniser.cs:2141-2158); None unless exact ' W n' follows."""
        s = self.stream
        try:
            if (
                self.sidx + 3 >= len(s)
                or s[self.sidx + 1] != ord("W")
                or s[self.sidx + 3] != ord("n")
            ):
                return None
            self.start_stream_argument_reading()
            x = self.get_stream_number()
            y = self.get_stream_number()
            w = self.get_stream_number()
            h = self.get_stream_number()
            self.end_stream_argument_reading()
            return (x, y, w, h)
        except Exception:
            return None

    def get_stream_name(self) -> str:
        s = self.stream
        b = s[self.sidx]
        self.sidx += 1
        if b != _SLASH:
            raise self.stream_error("Stream: Name should have a leading '/'.")
        start = self.sidx
        while not is_delim(s[self.sidx]):
            self.sidx += 1
        return s[start : self.sidx].decode("latin-1")

    def get_stream_string(self, font) -> str:
        out: list = []
        self._get_stream_string(out, font)
        return "".join(out)

    @staticmethod
    def _font_tables(font):
        """(per-code list, str.translate table) for a font, built once per font."""
        if font is None or font.encoding8 is None:
            return None, None
        trans = font.trans_table
        if trans is None:
            enc = font.encoding8
            trans = {code: enc[code] for code in range(256) if enc[code] != chr(code)}
            font.trans_table = trans
        return font.encoding8, trans

    def _get_stream_string(self, out: list, font) -> None:
        """Literal/hex string with escapes + octal (Tokeniser.cs:2367-2461).

        Bulk-optimized: plain character runs are located with a regex scan and
        mapped through the font encoding via str.translate; escapes and hex
        pairs keep the reference's exact per-character semantics (3-digit
        octal cap with the 4th digit reprocessed, \\LF and \\CR single-char
        line continuations, '%' treated as whitespace inside hex strings,
        odd-digit hex -> error).
        """
        s = self.stream
        enc, trans = self._font_tables(font)
        b = s[self.sidx]
        self.sidx += 1
        if b == _LT:
            end = s.find(b">", self.sidx)
            if end < 0:
                raise IndexError("index out of range")
            span = s[self.sidx : end]
            self.sidx = end + 1
            digits = span.translate(None, _HEX_STRIP)
            if len(digits) == 0:
                if len(span) != 0:
                    raise self.stream_error(
                        "Stream content: Invalid character in Hex string."
                    )
                return
            if len(digits) % 2 != 0:
                raise self.stream_error("Stream content: Invalid character in Hex string.")
            try:
                decoded = bytes.fromhex(digits.decode("ascii"))
            except (ValueError, UnicodeDecodeError):
                raise self.stream_error(
                    "Stream content: Invalid character in Hex string."
                ) from None
            text = decoded.decode("latin-1")
            out.append(text.translate(trans) if trans else text)
        elif b == _LP:
            brackets = 1
            pos = self.sidx
            while True:
                m = _STR_SPECIAL.search(s, pos)
                if m is None:
                    raise IndexError("index out of range")
                cut = m.start()
                if cut > pos:
                    text = s[pos:cut].decode("latin-1")
                    out.append(text.translate(trans) if trans else text)
                b = s[cut]
                pos = cut + 1
                if b == _LP:
                    brackets += 1
                    out.append(enc[ord("(")] if enc else "(")
                elif b == _RP:
                    brackets -= 1
                    if brackets == 0:
                        self.sidx = pos
                        return
                    out.append(enc[ord(")")] if enc else ")")
                else:  # backslash escape
                    e = s[pos]
                    pos += 1
                    if 0x30 <= e <= 0x37:
                        # up to 3 octal digits; a 4th octal digit is left
                        # unconsumed and reprocessed (reference loop shape)
                        ch_number = 0
                        ndigits = 0
                        while True:
                            ch_number += e - ord("0")
                            e = s[pos]
                            if e < 0x30 or e > 0x37:
                                break
                            if ndigits == 2:
                                break
                            ndigits += 1
                            ch_number *= 8
                            pos += 1
                        # e (at pos) stays unconsumed for the outer loop
                        out.append(enc[ch_number] if enc else chr(ch_number))
                    elif e == 0xA or e == 0xD:
                        pass  # line continuation: skip the escaped EOL char
                    else:
                        mapped = _ESCAPE_MAP.get(e)
                        if mapped is None:
                            raise self.stream_error(
                                "Illegal character after '/' in stream string."
                            )
                        out.append(enc[mapped] if enc else chr(mapped))
        else:
            raise self.stream_error("A string in a stream should start with '<' or '('.")

    def get_stream_array_string(self, font) -> str:
        """[ (txt) -kern (txt) ] TJ -> concatenated strings (Tokeniser.cs:2475-2490)."""
        s = self.stream
        out: list = []
        b = s[self.sidx]
        self.sidx += 1
        if b != _LB:
            raise self.stream_error("Read string array in stream, '[' expected.")
        while True:
            b = s[self.sidx]
            self.sidx += 1
            if b == _LP or b == _LT:
                self.sidx -= 1
                self._get_stream_string(out, font)
                b = s[self.sidx]
                self.sidx += 1
            if b == _RB:
                break
        return "".join(out)

    def get_stream_int(self) -> int:
        s = self.stream
        self.skip_stream_ws()
        sign = 1
        b = s[self.sidx]
        self.sidx += 1
        if b == _PLUS:
            b = s[self.sidx]
            self.sidx += 1
        elif b == _MINUS:
            sign = -1
            b = s[self.sidx]
            self.sidx += 1
        value = 0
        while _D0 <= b <= _D9:
            value = 10 * value + (b - ord("0"))
            b = s[self.sidx]
            self.sidx += 1
        return sign * value

    def get_stream_number(self) -> Decimal:
        """Decimal with the same accumulation as the file lexer (Tokeniser.cs:2517-2551)."""
        s = self.stream
        self.skip_stream_ws()
        sign = 1
        b = s[self.sidx]
        self.sidx += 1
        if b == _PLUS:
            b = s[self.sidx]
            self.sidx += 1
        elif b == _MINUS:
            sign = -1
            b = s[self.sidx]
            self.sidx += 1
        int_value = 0
        frac_digits = None
        while True:
            if _D0 <= b <= _D9:
                if frac_digits is None:
                    int_value = 10 * int_value + (b - ord("0"))
                else:
                    frac_digits += chr(b)
            elif b == _DOT:
                if frac_digits is not None:
                    raise self.stream_error("Reading number error: Second decimal point found.")
                frac_digits = ""
            else:
                break
            b = s[self.sidx]
            self.sidx += 1
        if frac_digits:
            dec = Decimal(int_value) + Decimal(int(frac_digits)) / (10 ** len(frac_digits))
            dec = sign * dec
            if dec == 0:
                dec = Decimal(0)
            return dec
        return Decimal(sign * int_value)

    def get_stream_cid(self) -> int:
        """<1A> -> 0x1A, max 2 hex digits (Tokeniser.cs:2557-2587)."""
        s = self.stream
        self.skip_stream_ws()
        b = s[self.sidx]
        self.sidx += 1
        if b != _LT:
            raise self.stream_error(
                "Hexadecimal integer expected in the form of '<1A>', but leading '<' was missing."
            )
        value = 0
        b = s[self.sidx]
        self.sidx += 1
        while True:
            if _D0 <= b <= _D9:
                value = 16 * value + b - ord("0")
            elif 0x41 <= b <= 0x46:
                value = 16 * value + b - ord("A") + 10
            elif 0x61 <= b <= 0x66:
                value = 16 * value + b - ord("a") + 10
            else:
                break
            b = s[self.sidx]
            self.sidx += 1
        if b != _GT:
            raise self.stream_error(
                "Character IDentifier CID expected in the form of '<1A>', but leading "
                "'<' was missing."
            )
        if value < 0 or value > 0xFF:
            raise self.stream_error(
                "Reading Character IDentifier CID from stream, should have only 2 hex digits."
            )
        return value

    def get_stream_unicode(self) -> int:
        """<89AB> -> 0x89AB with ff/ffi/ffl ligature repacking (Tokeniser.cs:2593-2657)."""
        s = self.stream
        self.skip_stream_ws()
        b = s[self.sidx]
        self.sidx += 1
        if b != _LT:
            raise self.stream_error(
                "Hexadecimal integer expected in the form of '<89AB>', but leading "
                "'<' was missing."
            )
        value = 0
        b = s[self.sidx]
        self.sidx += 1
        digits = 0
        while True:
            if _D0 <= b <= _D9:
                value = 16 * value + b - ord("0")
            elif 0x41 <= b <= 0x46:
                value = 16 * value + b - ord("A") + 10
            elif 0x61 <= b <= 0x66:
                value = 16 * value + b - ord("a") + 10
            else:
                break
            b = s[self.sidx]
            self.sidx += 1
            digits += 1
            if digits > 3 and b != _GT:
                # multi-codepoint CIDs repack to single ligature chars
                if value == ord("f") and s[self.sidx - 1 : self.sidx + 3] == b"0066":
                    tail = s[self.sidx + 3 : self.sidx + 8]
                    if tail[:1] == b">":
                        value = ord("ﬀ")  # ff
                        self.sidx += 3
                        b = s[self.sidx]
                        self.sidx += 1
                        break
                    if tail == b"0069>":
                        value = ord("ﬃ")  # ffi
                        self.sidx += 7
                        b = s[self.sidx]
                        self.sidx += 1
                        break
                    if tail == b"006C>":
                        value = ord("ﬄ")  # ffl
                        self.sidx += 7
                        b = s[self.sidx]
                        self.sidx += 1
                        break
                raise self.stream_error(
                    "Reading Unicode for Character IDentifier CID from stream, should "
                    "have only 4 hex digits."
                )
        if b != _GT:
            raise self.stream_error(
                "Hexadecimal integer expected in the form of '<89AB>', but leading "
                "'<' was missing."
            )
        if value < 0 or value > 0xFFFF:
            raise self.stream_error(f"Illegal hexadecimal integer value '{value:X}'.")
        return value

    def show_stream_content(self) -> str:
        return "".join(self._disp(b) for b in self.stream)

    def buffer_content_bytes(self) -> bytes:
        """Raw stream-elided file bytes (the scan of Tokeniser.cs:1265-1316
        WITHOUT the display mapping) — feed these to TextStore.append so the
        PDF_DOC table is applied exactly once, like the reference viewer.

        After a 'stream' keyword + EOL the body is elided as '...endstream';
        scanning resumes at the next line that starts with 'endstream'.
        """
        out = bytearray()
        d = self.data
        i = 0
        n = len(d)
        while i < n:
            # find the next 'stream' keyword followed by CR/LF
            idx = bytes(d).find(b"stream", i)
            if idx < 0:
                out += d[i:n]
                break
            seg_end = idx + 6
            if seg_end < n and (d[seg_end] == CR or d[seg_end] == LF):
                out += d[i:seg_end]
                out += b"...endstream"
                # skip until a line starting with 'endstream'
                j = seg_end
                while True:
                    if j >= n:
                        i = n
                        break
                    if (d[j] == CR or d[j] == LF) and bytes(d[j + 1 : j + 10]) == b"endstream":
                        i = j + 10  # resume after 'endstream'
                        break
                    j += 1
            else:
                out += d[i:seg_end]
                i = seg_end
        return bytes(out)

    def show_buffer_content(self) -> str:
        """Whole-file display text, skipping stream bodies (Tokeniser.cs:1265-1316):
        the elided raw bytes mapped through the display table."""
        return "".join(self._disp(b) for b in self.buffer_content_bytes())

    def show_stream_at(self) -> str:
        s = self.stream
        idx = min(len(s), max(0, self.sidx))
        lo = max(0, idx - 100)
        hi = min(len(s), idx + 100)
        parts = [self._disp(b) for b in s[lo:idx]]
        parts.append("==>")
        j = idx
        if j < len(s):
            parts.append(self._disp(s[j]))
            j += 1
        parts.append("<==")
        parts.extend(self._disp(b) for b in s[j:hi])
        return "".join(parts) + "\n"
