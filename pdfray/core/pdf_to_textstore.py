"""Byte-FSM conversion of a whole PDF file into annotated display text.

Reimplements `TextStoreLib/PdfToTextStore.cs:53-405`: a single forward scan
over the raw bytes that

* doubles literal '{' / '}' so they can't be confused with format marks;
* wraps every ``N G obj`` header's id in an anchor mark ``{aN G}`` and
  records (id -> line number) in the anchors dictionary (first id wins);
* wraps every ``N G R`` reference in a link mark ``{lN G}``;
* elides stream bodies: after a ``stream`` keyword it emits `` {sN G} `` with
  the owning object id and skips to the end of the stream — via the xref
  /Length when the object resolves, else by scanning for ``endstream`` and
  backing up over the preceding EOL (including the reference's off-by-one
  CR check before a LF, reproduced deliberately);
* a run of three numbers shifts the (number1, number2) window (``1 2 3 R``
  links ``2 3``).

Returns None on success or the error string (the reference returns the
exception; extraction-grade tolerance).
"""
from __future__ import annotations

from typing import Optional

from .model import DictionaryToken
from .textstore import TextStore

NO_EOL = -(1 << 31)  # byteOffsetStart marker for format-mark appends

_DIGIT0, _DIGIT9 = 0x30, 0x39

(
    S_PARSE,
    S_SPACE,
    S_D1,
    S_D1SP,
    S_D2,
    S_D2SP,
    S_OBJ_O,
    S_OBJ_B,
    S_STR_S,
    S_STR_T,
    S_STR_R,
    S_STR_E,
    S_STR_A,
    S_END_E,
    S_END_N,
    S_END_D,
    S_ENDOBJ_O,
    S_ENDOBJ_B,
) = range(18)


def pdf_to_textstore(lexer, store: TextStore, anchors: dict) -> Optional[str]:
    """Convert ``lexer``'s document bytes into ``store`` with anchors/links."""
    try:
        data = bytes(lexer.data)
        n = len(data)
        state = S_PARSE
        number1 = number2 = NO_EOL
        number1_pos = number2_pos = last_number2_pos = 0
        stream_id_start = stream_id_end = 0
        start = 0
        i = 0
        while i < n:
            b = data[i]
            i += 1

            if b == 0x7B:  # '{' doubled
                store.append(data[start:i], start)
                start = i
                store.append(b"{", NO_EOL)
            elif b == 0x7D:  # '}'
                store.append(data[start:i], start)
                start = i
                store.append(b"}", NO_EOL)

            if state == S_PARSE:
                if b == 0x20:
                    state = S_SPACE
                elif _DIGIT0 <= b <= _DIGIT9:
                    number1 = b - _DIGIT0
                    number1_pos = i - 1
                    state = S_D1
                elif b == 0x65:  # e
                    state = S_END_E
                elif b == 0x73:  # s
                    state = S_STR_S
            elif state == S_SPACE:
                if _DIGIT0 <= b <= _DIGIT9:
                    state = S_D1
                    number1 = b - _DIGIT0
                    number1_pos = i - 1
                elif b == 0x65:
                    state = S_END_E
                elif b == 0x73:
                    state = S_STR_S
                else:
                    state = S_PARSE
            elif state == S_D1:
                if _DIGIT0 <= b <= _DIGIT9:
                    number1 = number1 * 10 + b - _DIGIT0
                elif b == 0x20:
                    state = S_D1SP
                else:
                    state = S_PARSE
            elif state == S_D1SP:
                if _DIGIT0 <= b <= _DIGIT9:
                    state = S_D2
                    number2 = b - _DIGIT0
                    number2_pos = i - 1
                elif b == 0x65:
                    state = S_END_E
                elif b == 0x73:
                    state = S_STR_S
                else:
                    state = S_PARSE
            elif state == S_D2:
                if _DIGIT0 <= b <= _DIGIT9:
                    number2 = number2 * 10 + b - _DIGIT0
                elif b == 0x20:
                    state = S_D2SP
                    last_number2_pos = i - 1
                else:
                    state = S_PARSE
            elif state == S_D2SP:
                if b == 0x52:  # R -> link
                    store.append(data[start:number1_pos], start)
                    store.append(b"{l", NO_EOL)
                    store.append(data[number1_pos:last_number2_pos], number1_pos)
                    store.append(b"}", NO_EOL)
                    start = last_number2_pos
                    state = S_PARSE
                elif b == 0x6F:  # o
                    state = S_OBJ_O
                elif _DIGIT0 <= b <= _DIGIT9:
                    # three numbers in a row: discard the first
                    state = S_D2
                    number1 = number2
                    number2 = b - _DIGIT0
                    number1_pos = number2_pos
                    number2_pos = i - 1
                else:
                    state = S_PARSE
            elif state == S_OBJ_O:
                state = S_OBJ_B if b == 0x62 else S_PARSE
            elif state == S_OBJ_B:
                if b == 0x6A:  # 'obj' complete -> anchor
                    store.append(data[start:number1_pos], start)
                    store.append(b"{a", NO_EOL)
                    obj_id_bytes = data[number1_pos:last_number2_pos]
                    store.append(obj_id_bytes, NO_EOL)
                    store.append(b"}", NO_EOL)
                    obj_id_string = obj_id_bytes.decode("latin-1")
                    anchors.setdefault(obj_id_string, (obj_id_string, store.lines_count))
                    start = last_number2_pos
                    stream_id_start = number1_pos
                    stream_id_end = last_number2_pos
                state = S_PARSE
            elif state == S_STR_S:
                state = S_STR_T if b == 0x74 else S_PARSE
            elif state == S_STR_T:
                state = S_STR_R if b == 0x72 else S_PARSE
            elif state == S_STR_R:
                state = S_STR_E if b == 0x65 else S_PARSE
            elif state == S_STR_E:
                state = S_STR_A if b == 0x61 else S_PARSE
            elif state == S_STR_A:
                if b == 0x6D:  # 'stream' complete -> elide the body
                    store.append(data[start:i], start)
                    store.append(b" {s", NO_EOL)
                    obj_id_bytes = data[stream_id_start:stream_id_end]
                    store.append(obj_id_bytes, NO_EOL)
                    store.append(b"} ", NO_EOL)
                    parts = obj_id_bytes.split()
                    obj_id = (int(parts[0]), int(parts[1])) if len(parts) == 2 else (0, 0)
                    token = lexer.get_object(obj_id)
                    if isinstance(token, DictionaryToken) and token.is_stream:
                        i = start = token.stream_start + token.stream_length
                    else:
                        # not in the xref: scan for 'endstream', back up over EOL
                        idx = data.find(b"endstream", i)
                        if idx < 0:
                            raise ValueError(
                                f"Could not find ObjectId {obj_id_bytes.decode('latin-1')} "
                                "in xref table nor 'endstream' in the pdf file."
                            )
                        i = idx - 1
                        eol = data[i]
                        if eol == 0x0A:
                            i -= 1
                            if data[i - 1] == 0x0D:  # reference's off-by-one CR probe
                                i -= 1
                        elif eol == 0x0D:
                            i -= 1
                        else:
                            raise ValueError(
                                f"Stream with ObjectId {obj_id_bytes.decode('latin-1')} "
                                "is missing in xref table. 'endstream' is not preceedet "
                                "carriage return or line feed."
                            )
                        start = i
                state = S_PARSE
            elif state == S_END_E:
                state = S_END_N if b == 0x6E else S_PARSE
            elif state == S_END_N:
                state = S_END_D if b == 0x64 else S_PARSE
            elif state == S_END_D:
                state = S_ENDOBJ_O if b == 0x6F else S_PARSE
            elif state == S_ENDOBJ_O:
                state = S_ENDOBJ_B if b == 0x62 else S_PARSE
            elif state == S_ENDOBJ_B:
                state = S_PARSE
        store.append(data[start:i], start)
        return None
    except Exception as ex:
        return f"{type(ex).__name__}: {ex}"
