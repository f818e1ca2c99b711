"""XRefUpdater parity: rebuild a PDF's xref table from actual object offsets.

Reimplements the reference tool's `update()` FSM
(`XRefUpdater/MainWindow.xaml.cs:86-210`) byte-for-byte:

* objects are recognized ONLY as ``N 0 obj`` at the start of a CRLF line
  (LF-only documents are passed through unchanged — reference quirk);
* a non-zero generation raises (``:145`` throws);
* stream bodies are skipped so payload bytes can't fake object headers;
* everything between the ``xref`` keyword and ``trailer`` is dropped and
  replaced by a single rewritten subsection ``0 count+1`` listing the
  collected offsets in object-id order (assumes ids are contiguous from 1 —
  reference quirk, reproduced);
* the ``startxref`` value is rewritten to the offset of the ``xref`` keyword;
* C# ``AppendLine`` emits CRLF — reproduced exactly, which is why the
  reference's own shipped output pair is a byte-identity oracle for this
  function.

Exposed both as a pure function and as a Ray map stage (`RepairXref`) so a
corpus of offset-corrupted PDFs can be repaired in-pipeline before
extraction.
"""
from __future__ import annotations

import pyarrow as pa

CRLF = b"\r\n"


def _has_at(data: bytes, i: int, word: bytes) -> bool:
    return data[i : i + len(word)] == word


def update_xref(data: bytes) -> bytes:
    """Rewrite the classic xref table from discovered object offsets.

    Returns the repaired bytes; raises ValueError on a non-zero object
    generation or a duplicate object number (the reference throws in both
    cases: the explicit generation check and SortedList.Add's
    duplicate-key ArgumentException).  If the CRLF-delimited ``xref`` +
    ``trailer`` + ``startxref`` chain is not completed, the input is
    returned unchanged — including when the scan dies mid-rewrite (a
    truncated tail must not yield a half-rewritten document)."""
    S_PARSE, S_NEWLINE, S_NUM1, S_NUM2, S_STREAM, S_XREF, S_TRAILER = range(7)
    out = bytearray()
    addresses: dict = {}
    state = S_PARSE
    number1 = number2 = 0
    number1_index = 0
    xref_index = -1
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        if state < S_XREF:
            out.append(c)

        if state == S_PARSE:
            if c == 0x0D and i + 1 < n and data[i + 1] == 0x0A:
                i += 1
                out.append(data[i])
                state = S_NEWLINE
        elif state == S_NEWLINE:
            if 0x30 <= c <= 0x39:
                number1 = c - 0x30
                number1_index = i
                state = S_NUM1
            elif _has_at(data, i, b"stream"):
                out += data[i + 1 : i + 6]
                i += 5
                state = S_STREAM
            elif _has_at(data, i, b"xref"):
                xref_index = i
                out += data[i + 1 : i + 4]
                i += 3
                state = S_XREF
            # NOTE: no else — the reference's newLine state PERSISTS until a
            # digit/stream/xref hit (MainWindow.xaml.cs:107-124 has no
            # fallthrough assignment), so mid-line digits after a newline
            # still start number parsing.  Reproduced exactly.
        elif state == S_NUM1:
            if 0x30 <= c <= 0x39:
                number1 = number1 * 10 + c - 0x30
            else:
                c1 = data[i + 1] if i + 1 < n else 0
                if c == 0x20 and 0x30 <= c1 <= 0x39:
                    number2 = c1 - 0x30
                    i += 1
                    out.append(data[i])
                    state = S_NUM2
                else:
                    state = S_PARSE
        elif state == S_NUM2:
            if 0x30 <= c <= 0x39:
                number2 = number2 * 10 + c - 0x30
            elif c == 0x20 and _has_at(data, i + 1, b"obj"):
                if number2 != 0:
                    raise ValueError(
                        f"Generation of object {number1} should be 0, "
                        f"but was {number2}."
                    )
                if number1 in addresses:
                    # SortedList.Add duplicate-key throw (reference parity)
                    raise ValueError(
                        f"An entry with the same key already exists: "
                        f"object {number1}."
                    )
                addresses[number1] = number1_index
                out += data[i + 1 : i + 4]
                i += 3
                state = S_PARSE
            else:
                state = S_PARSE
        elif state == S_STREAM:
            if _has_at(data, i, b"endstream"):
                out += data[i + 1 : i + 9]
                i += 8
                state = S_PARSE
        elif state == S_XREF:
            if _has_at(data, i, b"trailer"):
                out += CRLF
                out += f"0 {len(addresses) + 1}".encode() + CRLF
                out += b"0000000000 65535 f" + CRLF
                for obj_id in sorted(addresses):
                    out += f"{addresses[obj_id]:010d} 00000 n".encode() + CRLF
                out += CRLF
                out += b"t"
                state = S_TRAILER
        elif state == S_TRAILER:
            out.append(c)
            if _has_at(data, i, b"startxref"):
                out += b"tartxref" + CRLF
                out += str(xref_index).encode() + CRLF
                out += b"%%EOF"
                return bytes(out)
        i += 1
    # fell off the end without completing startxref: never return a
    # half-rewritten document
    return data


def repair_document(data: bytes) -> bytes:
    """Normalize line endings the way the reference tool's WPF TextBox did
    (every newline becomes CRLF) and rebuild the xref table.

    Like the reference tool, this is a TEXT-MODE repair: binary stream
    bodies containing 0x0A bytes get mangled by the normalization, so it is
    only safe for uncompressed/ASCII PDFs — exactly the class the tool's own
    fixtures are (both of the reference's shipped broken-startxref samples
    extract cleanly after this repair)."""
    norm = data.replace(b"\r\n", b"\n").replace(b"\n", CRLF)
    return update_xref(norm)


class RepairXref:
    """Ray map stage: repair each document's xref table in place.

    Use ahead of the extraction stage for corpora with known-corrupt
    startxref offsets; repair failures pass the original bytes through with
    the error recorded so extraction can still attempt them.

    Inherits `repair_document`'s reference-parity TEXT-MODE limitation: the
    CRLF normalization can change stream payload byte counts, and /Length
    values are NOT rewritten — on LF-authored inputs with uncompressed
    streams the output carries stale /Length values (the extraction side's
    stream-boundary repair tolerates this, other consumers may not).  Safe
    on the reference tool's own CRLF-authored input class."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("html")
        repaired, errors = [], []
        for i in range(len(batch)):
            data = payloads[i].as_py() or b""
            try:
                repaired.append(repair_document(data))
                errors.append(None)
            except Exception as ex:
                repaired.append(data)
                errors.append(f"{type(ex).__name__}: {ex}")
        cols = {name: batch.column(name) for name in batch.column_names}
        cols["html"] = pa.array(repaired, pa.binary())
        cols["repair_error"] = pa.array(errors, pa.string())
        return pa.table(cols)
