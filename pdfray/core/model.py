"""Token model for PDF objects.

Reproduces the semantics of the reference token tree
(`PdfParser/Token.cs:13-748`, `PdfParser/ObjectId.cs:33-41`): a tagged-union
tree of Bool / Number / String / Name / Array / Dictionary / Null / Ref nodes,
where Array and Dictionary indexers lazily dereference `RefToken` placeholders
through the xref table and memoize the result in place
(`Token.cs:375-391, 499-508`).

Numbers carry C#-decimal-compatible values (`Token.cs:118-174`): ``ivalue`` is
set only when no more than one fractional digit pattern was seen
(divider <= 10) and the value fits; ``decimal`` is the exact decimal value
built by the same digit-accumulation the reference uses, so equality decisions
(e.g. the Tm line-offset comparison, `PdfContent.cs:155-161`) match exactly.
"""
from __future__ import annotations

from decimal import Decimal
from typing import Iterator, Optional


class PdfError(Exception):
    """Parse error carrying a +-100-byte context window (PdfException.cs:29-74)."""

    def __init__(self, message: str, context: str = ""):
        super().__init__(message)
        self.message = message
        self.context = context

    def detail(self) -> str:
        if self.context:
            return f"{self.message}\n{self.context}"
        return self.message


class PdfStreamError(PdfError):
    """Error while reading a decoded stream (PdfException.cs PdfStreamException)."""


class PdfNotSupportedError(PdfError):
    """Unsupported filter / encryption envelope (NotSupportedException parity)."""


# ObjectId: (object_number, generation) — ObjectId.cs:33-41
ObjectId = tuple


class Token:
    __slots__ = ("obj_id",)

    def __init__(self, obj_id: Optional[ObjectId] = None):
        self.obj_id = obj_id

    def to_repr(self) -> str:
        raise NotImplementedError

    def _ref_suffix(self) -> str:
        if self.obj_id is not None:
            return f" obj {self.obj_id[0]} {self.obj_id[1]}"
        return ""

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return self.to_repr()


def _repr_of(token: "Token") -> str:
    """Inline repr of a child: objects referenced by id print as 'ref N G'."""
    if token.obj_id is not None:
        return f"ref {token.obj_id[0]} {token.obj_id[1]}"
    return token.to_repr()


class BoolToken(Token):
    __slots__ = ("value",)

    def __init__(self, value: bool, obj_id=None):
        super().__init__(obj_id)
        self.value = value

    def to_repr(self) -> str:
        return ("true" if self.value else "false") + self._ref_suffix()


class NumberToken(Token):
    """Number with C#-decimal semantics (Token.cs:118-196).

    ``ivalue`` is not None iff the source had at most a bare trailing '.'
    (divider<=10) and the value is below 2**31-1; it is the truncated int.
    ``decimal`` is the exact Decimal.  ``has_reference_format`` mirrors
    `Token.cs:122` (non-negative integer form).
    """

    __slots__ = ("ivalue", "decimal")

    def __init__(self, decimal_value: Decimal, ivalue: Optional[int], obj_id=None):
        super().__init__(obj_id)
        self.decimal = decimal_value
        self.ivalue = ivalue

    @classmethod
    def from_int(cls, n: int) -> "NumberToken":
        return cls(Decimal(n), n)

    @property
    def has_reference_format(self) -> bool:
        return (self.ivalue if self.ivalue is not None else -1) >= 0

    def to_repr(self) -> str:
        if self.ivalue is not None:
            return f"{self.ivalue}" + self._ref_suffix()
        return f"{self.decimal}" + self._ref_suffix()


class StringToken(Token):
    """Literal or hex string (Token.cs:199-302).

    ``value`` keeps escape sequences *raw* (backslashes preserved — the token
    lexer does not interpret escapes; only the content-stream reader does).
    Hex strings keep their angle brackets in ``value`` and carry parsed
    ``hex_bytes`` when the digit count is even and all digits valid.
    """

    __slots__ = ("value", "hex_bytes")

    def __init__(self, value: str, hex_bytes: Optional[bytes] = None, obj_id=None):
        super().__init__(obj_id)
        self.value = value
        self.hex_bytes = hex_bytes

    def to_repr(self) -> str:
        return f'"{self.value}"' + self._ref_suffix()


class NameToken(Token):
    __slots__ = ("value",)

    def __init__(self, value: str, obj_id=None):
        super().__init__(obj_id)
        self.value = value

    def to_repr(self) -> str:
        return f"/{self.value}" + self._ref_suffix()


class NullToken(Token):
    __slots__ = ("is_error",)

    def __init__(self, obj_id=None, is_error: bool = False):
        super().__init__(obj_id)
        self.is_error = is_error

    def to_repr(self) -> str:
        return "null" + self._ref_suffix()


class RefToken(Token):
    """Lazy placeholder for an indirect object (Token.cs:731-746)."""

    __slots__ = ()

    def to_repr(self) -> str:
        return "Ref" + self._ref_suffix()


class ArrayToken(Token):
    """Heterogeneous array with memoizing lazy deref indexer (Token.cs:332-429)."""

    __slots__ = ("items", "lexer")

    def __init__(self, items: list, lexer, obj_id=None):
        super().__init__(obj_id)
        self.items = items
        self.lexer = lexer

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, index: int) -> Token:
        token = self.items[index]
        if isinstance(token, RefToken):
            token = self.lexer.get_object(token.obj_id)
            self.items[index] = token
        return token

    def __iter__(self) -> Iterator[Token]:
        for i in range(len(self.items)):
            yield self[i]

    def append(self, token: Token) -> None:
        self.items.append(token)

    def to_repr(self) -> str:
        inner = " ".join(_repr_of(t) for t in self.items)
        return f"[{inner}]" + self._ref_suffix()


class DictionaryToken(Token):
    """String-keyed dictionary, optionally heading a stream (Token.cs:432-693).

    Duplicate keys merge into an ArrayToken (`Token.cs:473-480` bug-compat).
    ``stream_start``/``stream_length`` are byte offsets into the document when
    the dictionary heads a stream, else None.  ``pdf_object`` is the memoized
    higher-level object built from this token (font/page/content), mirroring
    `Token.cs:22`.
    """

    __slots__ = (
        "entries",
        "type",
        "stream_start",
        "stream_length",
        "is_decrypted",
        "stream_length_problem",
        "pdf_object",
        "lexer",
    )

    def __init__(self, entries: dict, lexer, obj_id=None, type_name=None):
        super().__init__(obj_id)
        self.entries = entries
        self.type = type_name
        self.lexer = lexer
        self.stream_start = None
        self.stream_length = None
        self.is_decrypted = False
        self.stream_length_problem = None
        self.pdf_object = None

    @property
    def is_stream(self) -> bool:
        return self.stream_start is not None and self.stream_start >= 0

    @property
    def keys(self):
        return list(self.entries.keys())

    def __contains__(self, key: str) -> bool:
        return key in self.entries

    def __getitem__(self, key: str) -> Token:
        token = self.entries[key]
        if isinstance(token, RefToken):
            token = self.lexer.get_object(token.obj_id)
            self.entries[key] = token
        return token

    def get(self, key: str) -> Optional[Token]:
        if key not in self.entries:
            return None
        return self[key]

    def get_name(self, key: str) -> Optional[str]:
        t = self.get(key)
        return t.value if isinstance(t, NameToken) else None

    def get_number(self, key: str) -> Optional[NumberToken]:
        t = self.get(key)
        return t if isinstance(t, NumberToken) else None

    def get_array(self, key: str) -> Optional[ArrayToken]:
        t = self.get(key)
        return t if isinstance(t, ArrayToken) else None

    def get_dict(self, key: str) -> Optional["DictionaryToken"]:
        t = self.get(key)
        return t if isinstance(t, DictionaryToken) else None

    def get_string(self, key: str) -> Optional[str]:
        t = self.get(key)
        return t.value if isinstance(t, StringToken) else None

    def get_hex_bytes(self, key: str) -> Optional[bytes]:
        t = self.get(key)
        return t.hex_bytes if isinstance(t, StringToken) else None

    def items(self):
        for key in list(self.entries.keys()):
            yield key, self[key]

    def to_repr(self) -> str:
        parts = ["<<"]
        for key, val in self.entries.items():
            parts.append(f" /{key} {_repr_of(val)}")
        parts.append(">>")
        s = "\n".join(parts)
        if self.is_stream:
            s += f"\nstream {self.stream_start}, {self.stream_length} endstream"
        return s + self._ref_suffix()
