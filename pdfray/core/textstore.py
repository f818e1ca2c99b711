"""TextStore: line-indexed display text with wrap-around search.

Reimplements `TextStoreLib/TextStore.cs:17-445`: an append-only char store
where every CR / LF / CRLF end-of-line is stored as a single '\\r', with a
line-start index (plus per-line source byte offsets), span-per-line access,
`GetString`/`ToString(start,end)` slicing, and `FindString` — forward /
backward, case-folding, continuing from a previous selection with wrap-around.

Note: the reference's usable state is the post-``Reset()`` state
(`TextStore.cs:68-74`); its construction-without-Reset path is broken (the
``isNewLine`` rework left `LineStarts[0]` unset, sending `FindString`'s
binary search into an infinite loop) and its own unit tests are stale against
the current code.  This implementation auto-resets on construction and pins
the post-Reset semantics, which is what the browser path exercises.

Bytes map through the PdfEncoding display table; unmapped bytes render as
'xx' hex quoted with apostrophes (`TextStore.cs:126-135`).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

from .encodings_tables import PDF_DOC

CR = 0x0D
LF = 0x0A


class Selection(NamedTuple):
    """(start_line, start_char, end_line, end_char), all inclusive positions."""

    start_line: int
    start_char: int
    end_line: int
    end_char: int


class TextStore:
    def __init__(self):
        self.chars: list = []
        self.line_starts: list = [0]
        self.line_byte_offsets: list = [0]
        self.lines_count = 1
        self._text_cache: Optional[str] = None

    def reset(self) -> None:
        self.chars = []
        self.line_starts = [0]
        self.line_byte_offsets = [0]
        self.lines_count = 1
        self._text_cache = None

    @property
    def chars_count(self) -> int:
        return len(self.chars)

    def _text(self) -> str:
        if self._text_cache is None:
            self._text_cache = "".join(self.chars)
        return self._text_cache

    def append(self, pdf_bytes: bytes, byte_offset_start: int = 0) -> None:
        """Append raw pdf bytes; CR / LF / CRLF all become one '\\r'."""
        self._text_cache = None
        chars = self.chars
        is_cr = False
        # trim the trailing sentinel entries; re-added after the loop
        del self.line_starts[self.lines_count :]
        del self.line_byte_offsets[self.lines_count :]
        for i, b in enumerate(pdf_bytes):
            if is_cr and b == LF:
                is_cr = False
                self.line_byte_offsets[self.lines_count - 1] += 1
                continue
            is_cr = b == CR
            if is_cr or b == LF:
                chars.append("\r")
                self.line_starts.append(len(chars))
                self.line_byte_offsets.append(byte_offset_start + i + 1)
                self.lines_count += 1
                continue
            c = PDF_DOC[b]
            if c == "￿":
                chars.append("'")
                chars.extend(format(b, "x"))
                chars.append("'")
            else:
                chars.append(c)
        # sentinel entry: line_starts[lines_count] is always valid
        self.line_starts.append(len(chars))
        self.line_byte_offsets.append(byte_offset_start + len(pdf_bytes))

    def append_error(self, title: str, message: str) -> None:
        """Error block: blank lines, '{e<title>}' header, CR-split message."""
        self._text_cache = None
        chars = self.chars
        del self.line_starts[self.lines_count :]
        del self.line_byte_offsets[self.lines_count :]
        for _ in range(2):
            chars.append("\r")
            self.line_starts.append(len(chars))
            self.line_byte_offsets.append(0)
            self.lines_count += 1
        chars.append("{")
        chars.append("e")
        chars.extend(title)
        chars.append("}")
        chars.append("\r")
        self.line_starts.append(len(chars))
        self.line_byte_offsets.append(0)
        self.lines_count += 1
        for c in message:
            if c == "\n":
                continue
            chars.append(c)
            if c == "\r":
                self.line_starts.append(len(chars))
                self.line_byte_offsets.append(0)
                self.lines_count += 1
        chars.append("\r")
        self.line_starts.append(len(chars))
        self.line_byte_offsets.append(0)

    def line(self, index: int) -> str:
        """Line content without its trailing CR (TextStore.cs:32-46)."""
        if index < 0:
            raise IndexError(f"Index '{index}' must be greater equal 0.")
        if index >= self.lines_count:
            raise IndexError(
                f"Index '{index}' must be smaller than LinesCount {self.lines_count}."
            )
        start = self.line_starts[index]
        end = self.line_starts[index + 1]
        if start == end:
            return ""
        return self._text()[start : end - 1]

    def __getitem__(self, index: int) -> str:
        return self.line(index)

    def select_all(self) -> Selection:
        last_line = self.lines_count - 1
        return Selection(
            0, 0, last_line, len(self.chars) - self.line_starts[last_line] - 1
        )

    def get_string(self, start_line: int, start_char: int, end_char: int) -> str:
        if start_line < 0 or start_line >= self.lines_count:
            return ""
        start = self.line_starts[start_line] + start_char
        end = self.line_starts[start_line] + end_char
        end = min(end, self.line_starts[start_line + 1] - 1)
        if start >= end or end >= len(self.chars):
            return ""
        return self._text()[start:end]

    def to_string(self, start_line: int, end_line: int) -> str:
        if start_line < 0 or start_line > end_line or end_line > self.lines_count:
            raise ValueError("invalid line range")
        out = []
        text = self._text()
        for li in range(start_line, end_line):
            start = self.line_starts[li]
            end = self.line_starts[li + 1]
            out.append(text[start : end - 1])
            out.append("\n")
        return "".join(out)

    # ------------------------------------------------------------------
    def find_string(
        self,
        previous: Optional[Selection],
        search: str,
        forward: bool = True,
        ignore_case: bool = False,
    ) -> Optional[Selection]:
        """Wrap-around continuing search (TextStore.cs:220-316)."""
        n = len(search)
        chars_count = len(self.chars)
        if n == 0 or n > chars_count:
            return None
        text = self._text()
        if ignore_case:
            # length-preserving fold (invariant-culture IgnoreCase equivalent
            # for the latin range this engine emits)
            haystack, needle = text.lower(), search.lower()
        else:
            haystack, needle = text, search

        if forward:
            if previous is None:
                start = 0
            else:
                start = self.line_starts[previous.start_line] + previous.start_char + 1
                if start >= chars_count - n + 1:
                    start = 0
            if start > 0:
                found = haystack.find(needle, start)
                if found < 0:
                    # wrap: the match must fit inside the first start+1 chars
                    found = haystack[: start + 1].find(needle)
            else:
                found = haystack.find(needle)
            if found < 0:
                return None
        else:
            if previous is None:
                start = chars_count
            else:
                start = self.line_starts[previous.start_line] + previous.start_char
                if start < n:
                    start = chars_count
            if start < chars_count:
                found = haystack[:start].rfind(needle)
                if found < 0:
                    found = haystack[start:].rfind(needle)
                    if found < 0:
                        return None
                    found += start
            else:
                found = haystack.rfind(needle)
                if found < 0:
                    return None

        # bisect the start line (TextStore.cs:291-305)
        import bisect

        start_line = bisect.bisect_right(self.line_starts, found, hi=self.lines_count) - 1
        start_char = found - self.line_starts[start_line]
        last = found + n - 1
        end_line = bisect.bisect_right(self.line_starts, last, hi=self.lines_count) - 1
        end_char = last - self.line_starts[end_line]
        return Selection(start_line, start_char, end_line, end_char)
