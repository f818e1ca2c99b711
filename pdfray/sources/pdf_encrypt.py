"""Re-encrypt an existing (classic-xref, unencrypted) PDF with RC4 standard
security — so REAL third-party documents exercise the decrypt path (C1-C8,
`pdfray/core/crypt.py` / `lexer.py:657-721`) outside fixture-authored bytes.

Byte-level transform, spec rules only (PDF 1.7 §7.6.2 / Algorithm 1):

* every stream payload is RC4-encrypted with its object key IN PLACE —
  a stream cipher preserves length, so /Length entries (direct or
  indirect) stay valid;
* every string OUTSIDE stream payloads is taken at its RAW observable
  value (the reference keeps escapes raw through decryption,
  Token.cs:206-276 — hex strings are observable WITH their brackets),
  RC4-encrypted, and re-emitted as an escaped literal.  When ciphertext
  contains escape-needing bytes the reference-semantics parser garbles
  that one string deterministically — exactly as it does on real
  Acrobat-encrypted files, which is the parity being exercised;
* offsets shift (hex re-emission), so the classic xref table and trailer
  are rebuilt; /Root /Info and the original /ID are preserved and the
  /Encrypt dictionary (O/U/P from the shared writer-side `Encryption`)
  is appended as a new object.

Scope (asserted): single-revision classic-xref input, generation-0 objects.
That covers the realistic third-party class this sandbox has (LibreOffice /
dvips outputs); xref-stream inputs would additionally need the /XRef
stream's OWN payload left unencrypted per spec.
"""
from __future__ import annotations

import re

from ..core import crypt

_WS = b"\x00\t\n\x0c\r "


def _scan_strings(body: bytes, stop_keywords=()):
    """Yield ("str", start, end, raw_value) for every string in a non-stream
    byte region, where raw_value is the string's OBSERVABLE value under the
    reference's escapes-kept-raw parse (Token.cs:206-276): literal content
    between the parens verbatim, hex strings INCLUDING their brackets.
    When a top-level keyword from ``stop_keywords`` is reached, yields
    ("kw", keyword, position) and stops — so the caller never scans into a
    binary stream payload."""
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c == 0x25:  # % comment to EOL
            while i < n and body[i] not in (10, 13):
                i += 1
        elif c == 0x28:  # literal string
            depth = 1
            j = i + 1
            while j < n and depth:
                cj = body[j]
                if cj == 0x5C:
                    j += 2
                    continue
                if cj == 0x28:
                    depth += 1
                elif cj == 0x29:
                    depth -= 1
                j += 1
            yield ("str", i, j, body[i + 1 : j - 1])
            i = j - 1
        elif c == 0x3C:
            if i + 1 < n and body[i + 1] == 0x3C:  # '<<' dict open: skip both
                i += 1
            else:  # hex string
                j = body.index(b">", i)
                yield ("str", i, j + 1, body[i : j + 1])
                i = j
        elif stop_keywords and (0x61 <= c <= 0x7A):
            for kw in stop_keywords:
                if body[i : i + len(kw)] == kw and (
                    i == 0 or body[i - 1 : i] in (b"", *[bytes([w]) for w in _WS + b">]"])
                ):
                    yield ("kw", kw, i)
                    return
            while i < n and 0x61 <= body[i] <= 0x7A:
                i += 1
            continue
        i += 1


def _encrypt_strings(body: bytes, key: bytes) -> bytes:
    out = []
    last = 0
    for ev in _scan_strings(body):
        if ev[0] != "str":
            continue
        _, start, end, raw = ev
        cipher = crypt.rc4(key, raw)
        lit = bytearray(b"(")
        for b in cipher:
            if b in (0x28, 0x29, 0x5C):
                lit += b"\\" + bytes([b])
            elif b == 0x0D:
                lit += b"\\r"
            elif b == 0x0A:
                lit += b"\\n"
            else:
                lit.append(b)
        lit += b")"
        out.append(body[last:start])
        out.append(bytes(lit))
        last = end
    out.append(body[last:])
    return b"".join(out)


def _xref_offsets(data: bytes) -> dict:
    m = re.search(rb"startxref\s+(\d+)\s*%%EOF\s*$", data)
    if not m:
        raise ValueError("no trailing startxref")
    pos = int(m.group(1))
    if not data[pos:].lstrip(_WS).startswith(b"xref"):
        raise ValueError("not a classic xref table")
    cur = data.index(b"xref", pos) + 4
    offsets = {}
    while True:
        m = re.match(rb"\s*(\d+)\s+(\d+)\s*[\r\n]+", data[cur : cur + 64])
        if not m:
            break
        start, count = int(m.group(1)), int(m.group(2))
        cur += m.end()
        for k in range(count):
            row = data[cur : cur + 20]
            if row[17:18] == b"n":
                offsets[start + k] = int(row[:10])
            cur += 20
    if re.search(rb"/Prev\b", data[cur : cur + 400]):
        raise ValueError("multi-revision PDFs not supported")
    return offsets


def encrypt_pdf(
    data: bytes, user_password: str = "", owner_password: str = "owner"
) -> bytes:
    """Return ``data`` re-encrypted with RC4 standard security (V2/R3/128).

    Reuses the original trailer /ID (the key input), /Root and /Info; the
    extracted text of the result, opened with ``user_password``, must be
    byte-identical to extracting the original."""
    from .pdfwriter import Encryption

    offsets = _xref_offsets(data)
    trailer_m = re.search(rb"trailer\s*<<(.*?)>>\s*startxref", data, re.S)
    if not trailer_m:
        raise ValueError("no classic trailer")
    trailer = trailer_m.group(1)
    root_m = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", trailer)
    info_m = re.search(rb"/Info\s+(\d+)\s+\d+\s+R", trailer)
    id_m = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\]", trailer)
    file_id = bytes.fromhex(id_m.group(1).decode()) if id_m else b"\x5c" * 16
    enc = Encryption(
        user_password=user_password,
        owner_password=owner_password,
        v=2,
        r=3,
        length_bits=128,
        file_id=file_id,
    )

    ordered = sorted(offsets.items(), key=lambda kv: kv[1])
    first_off = ordered[0][1]
    out = bytearray(data[:first_off])  # header + binary comment line
    new_offsets = {}
    bounds = [off for _, off in ordered] + [data.index(b"xref", int(
        re.search(rb"startxref\s+(\d+)", data).group(1)))]
    for idx, (num, off) in enumerate(ordered):
        span = data[off : bounds[idx + 1]]
        head = re.match(rb"(\d+)\s+(\d+)\s+obj\b", span)
        if not head or int(head.group(1)) != num:
            raise ValueError(f"object {num} not at xref offset {off}")
        if int(head.group(2)) != 0:
            raise ValueError("non-zero generations not supported")
        key = enc.object_key(num, 0)
        # walk up to the first TOP-LEVEL stream/endobj keyword — the walk
        # skips strings and comments, so binary payload bytes are never
        # scanned as syntax
        stop = None
        for ev in _scan_strings(span, stop_keywords=(b"stream", b"endobj")):
            if ev[0] == "kw":
                stop = ev
                break
        if stop is None:
            raise ValueError(f"object {num}: no stream/endobj keyword found")
        if stop[1] == b"endobj":
            endobj = stop[2]
            body = _encrypt_strings(span[:endobj], key)
            new = body + span[endobj:]
        else:
            sm = re.compile(rb"stream(\r\n|\n|\r)").match(span, stop[2])
            if sm is None:
                raise ValueError(f"object {num}: malformed stream keyword")
            pre = span[: sm.end()]
            lm = re.search(rb"/Length\s+(\d+)(\s+\d+\s+R)?", pre)
            if lm is None:
                raise ValueError(f"stream object {num} without /Length")
            if lm.group(2):
                target = int(lm.group(1))
                tspan = data[offsets[target] : offsets[target] + 64]
                length = int(re.search(rb"obj\s+(\d+)", tspan).group(1))
            else:
                length = int(lm.group(1))
            payload = span[sm.end() : sm.end() + length]
            post = span[sm.end() + length :]
            new = (
                _encrypt_strings(span[: sm.start()], key)
                + span[sm.start() : sm.end()]
                + crypt.rc4(key, payload)
                + post
            )
        new_offsets[num] = len(out)
        out.extend(new)

    enc_num = max(offsets) + 1
    new_offsets[enc_num] = len(out)
    out.extend(f"{enc_num} 0 obj\n{enc.dict_body()}\nendobj\n".encode("ascii"))

    xref_pos = len(out)
    size = enc_num + 1
    out.extend(f"xref\n0 {size}\n0000000000 65535 f \n".encode("ascii"))
    for num in range(1, size):
        if num in new_offsets:
            out.extend(f"{new_offsets[num]:010d} 00000 n \n".encode("ascii"))
        else:
            out.extend(b"0000000000 65535 f \n")
    t = f"trailer\n<</Size {size}"
    if root_m:
        t += f"/Root {int(root_m.group(1))} 0 R"
    if info_m:
        t += f"/Info {int(info_m.group(1))} 0 R"
    t += f"/Encrypt {enc_num} 0 R"
    fid = file_id.hex().upper()
    t += f"/ID [<{fid}> <{fid}>]"
    t += f">>\nstartxref\n{xref_pos}\n%%EOF\n"
    out.extend(t.encode("ascii"))
    return bytes(out)
