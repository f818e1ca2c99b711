"""Deterministic PDF writer used to synthesize test/bench corpora.

Independent implementation of the synthesis technique the reference uses for
its own tests (`PdfParserTest/PdfParserTest.cs:68-89` builds objects textually
and records byte offsets; `XRefUpdater/SampleToPdf.cs:23-59` adds the xref
table / trailer / startxref): objects are appended as text with recorded
addresses, then a classic xref table (or a PDF-1.5 xref stream) and trailer
are emitted with correct offsets.  Also supports FlateDecode streams, object
streams, incremental updates (/Prev chains) and RC4 standard encryption
(writer-side Algorithms 2/3/5 so the reader can authenticate the empty user
password).
"""
from __future__ import annotations

import hashlib
import zlib
from typing import Optional

from ..core import crypt


def _alg3_owner_entry(owner_password: str, user_password: str, length_bytes: int, r: int) -> bytes:
    """Algorithm 3: the encryption dictionary's O value (writer side)."""
    padded_owner = crypt.pad_password(owner_password or user_password)
    h = hashlib.md5(padded_owner).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:length_bytes]).digest()
    rc4_key = h[:length_bytes]
    data = crypt.pad_password(user_password)
    data = crypt.rc4(rc4_key, data)
    if r >= 3:
        for i in range(1, 20):
            k = bytes(b ^ i for b in rc4_key)
            data = crypt.rc4(k, data)
    return data


class Encryption:
    """RC4 standard-security parameters for the writer."""

    def __init__(
        self,
        user_password: str = "",
        owner_password: str = "owner",
        v: int = 2,
        r: int = 3,
        length_bits: int = 128,
        permission: int = -1852,
        file_id: bytes = b"\x01" * 16,
    ):
        self.v = v
        self.r = r
        self.length_bits = length_bits if v == 2 else 40
        self.permission = permission
        self.file_id = file_id
        n = self.length_bits // 8
        self.o_entry = _alg3_owner_entry(owner_password, user_password, n, r)
        padded_user = crypt.pad_password(user_password)
        self.key = crypt.compute_encryption_key(
            padded_user, self.o_entry, permission, file_id, n
        )
        self.u_entry = crypt.compute_encrypt_u(padded_user, self.key, file_id)

    def object_key(self, obj_num: int, gen: int) -> bytes:
        return crypt.object_encryption_key(self.key, obj_num, gen)

    def dict_body(self) -> str:
        return (
            f"<</Filter/Standard/V {self.v}/R {self.r}/Length {self.length_bits}"
            f"/P {self.permission}/O <{self.o_entry.hex().upper()}>"
            f"/U <{self.u_entry.hex().upper()}>>>"
        )


def template_to_pdf(template: str) -> bytes:
    """Template text -> valid PDF (the XRefUpdater capability).

    Template language (`XRefUpdater/SampleToPdf.cs:23-145`): objects are
    separated by ``$object <Name>`` lines; ``§Name§`` inside a body becomes
    ``<id> 0 R`` of the named object; a ``#`` placeholder in a stream
    object's dictionary becomes the computed stream /Length.  The first
    object is the document /Root.  Deviation: the reference computes the
    length with a template-specific magic offset (``endStreamIndex - 28``,
    SampleToPdf.cs:111) that only fits its bundled sample; this version
    measures the actual payload between the EOL after ``stream`` and the
    EOL before ``endstream``.
    """
    import re as _re

    chunks = [c for c in template.split("$object ") if c.strip()]
    names = []
    bodies = []
    for chunk in chunks:
        name, _, body = chunk.partition("\n")
        names.append(name.strip().rstrip("\r"))
        bodies.append(body.rstrip("\r\n"))
    ids = {name: i + 1 for i, name in enumerate(names)}

    out = []
    addrs = []
    buf = "%PDF-1.7\n%\xf5\xe4\xf6\xfc\n\n"
    for i, body in enumerate(bodies):
        # substitute §Name§ references
        parts = body.split("§")
        body = "".join(
            part if k % 2 == 0 else f"{ids[part]} 0 R" for k, part in enumerate(parts)
        )
        # computed stream /Length for the '#' placeholder
        if "#" in body and "stream" in body:
            m = _re.search(r"stream\r?\n(.*?)\r?\nendstream", body, _re.S)
            if m:
                body = body.replace("#", str(len(m.group(1))), 1)
        addrs.append(len(buf))
        buf += f"{i + 1} 0 obj\n{body}\nendobj\n\n"
    xref_pos = len(buf)
    buf += f"xref\n0 {len(bodies) + 1}\n0000000000 65535 f \n"
    for a in addrs:
        buf += f"{a:010d} 00000 n \n"
    buf += (
        f"trailer\n  << /Size {len(bodies) + 1}\n    /Root 1 0 R\n  >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    )
    return buf.encode("latin-1")


class PdfBuilder:
    """Append-objects-then-xref builder for one document revision."""

    def __init__(
        self,
        version: str = "1.4",
        junk_prefix: bytes = b"",
        encryption: Optional[Encryption] = None,
    ):
        self.buf = bytearray()
        self.buf += junk_prefix
        self.buf += f"%PDF-{version}\n".encode("latin-1")
        self.buf += b"%\xe2\xe3\xcf\xd3\n"
        self.addrs: dict = {}  # obj_num -> byte offset
        self._next = 1
        self.encryption = encryption
        self.encrypt_obj_num: Optional[int] = None

    # ------------------------------------------------------------------
    def reserve(self) -> int:
        n = self._next
        self._next += 1
        return n

    def add(self, body: str, obj_num: Optional[int] = None) -> int:
        """Append `N 0 obj <body> endobj`; returns the object number."""
        if obj_num is None:
            obj_num = self.reserve()
        self.addrs[obj_num] = len(self.buf)
        self.buf += f"{obj_num} 0 obj\n".encode("latin-1")
        self.buf += body.encode("latin-1")
        self.buf += b"\nendobj\n"
        return obj_num

    def add_stream(
        self,
        payload: bytes,
        dict_extra: str = "",
        obj_num: Optional[int] = None,
        flate: bool = False,
        length_override: Optional[int] = None,
        eol: bytes = b"\n",
        encrypt: bool = True,
    ) -> int:
        if obj_num is None:
            obj_num = self.reserve()
        if flate:
            payload = zlib.compress(payload)
            dict_extra = "/Filter/FlateDecode" + dict_extra
        if self.encryption is not None and encrypt:
            payload = crypt.rc4(self.encryption.object_key(obj_num, 0), payload)
        length = len(payload) if length_override is None else length_override
        self.addrs[obj_num] = len(self.buf)
        self.buf += f"{obj_num} 0 obj\n".encode("latin-1")
        # 'stream' on its own line: the common real-PDF layout (and the only
        # one the reference's XRefUpdater FSM recognizes — it matches the
        # keyword at line starts; inline it would latch onto endSTREAM)
        self.buf += f"<</Length {length}{dict_extra}>>\nstream".encode("latin-1")
        self.buf += eol
        self.buf += payload
        self.buf += b"\nendstream\nendobj\n"
        return obj_num

    def literal_string(self, text_bytes: bytes, obj_num_for_encryption: Optional[int] = None) -> str:
        """Render bytes as a ( ) literal with escaping (and RC4 when encrypted)."""
        if self.encryption is not None and obj_num_for_encryption is not None:
            text_bytes = crypt.rc4(
                self.encryption.object_key(obj_num_for_encryption, 0), text_bytes
            )
        out = []
        for b in text_bytes:
            if b in (0x28, 0x29, 0x5C):  # ( ) backslash
                out.append("\\" + chr(b))
            elif b == 0x0D:
                out.append("\\r")
            elif b == 0x0A:
                out.append("\\n")
            else:
                out.append(chr(b))
        return "(" + "".join(out) + ")"

    # ------------------------------------------------------------------
    def finish_classic(
        self,
        root: int,
        info: Optional[int] = None,
        prev: Optional[int] = None,
        file_id_hex: Optional[str] = None,
        free_entry_quirk: bool = False,
    ) -> bytes:
        """Classic `xref` table + trailer + startxref + %%EOF."""
        xref_addr = len(self.buf)
        nums = sorted(self.addrs)
        size = (nums[-1] + 1) if nums else 1
        lines = ["xref"]
        # contiguous subsections
        sections = []
        current = [0]
        entries = {0: None}
        entries.update(self.addrs)
        all_nums = sorted(entries)
        for n in all_nums[1:]:
            if n == current[-1] + 1:
                current.append(n)
            else:
                sections.append(current)
                current = [n]
        sections.append(current)
        for section in sections:
            lines.append(f"{section[0]} {len(section)}")
            for n in section:
                if n == 0:
                    gen = 65536 if free_entry_quirk else 65535
                    lines.append(f"0000000000 {gen:05d} f ")
                else:
                    lines.append(f"{entries[n]:010d} 00000 n ")
        trailer = f"<</Size {size}/Root {root} 0 R"
        if info is not None:
            trailer += f"/Info {info} 0 R"
        if self.encryption is not None and self.encrypt_obj_num is not None:
            trailer += f"/Encrypt {self.encrypt_obj_num} 0 R"
            fid = self.encryption.file_id.hex().upper()
            trailer += f"/ID[<{fid}><{fid}>]"
        elif file_id_hex is not None:
            trailer += f"/ID[<{file_id_hex}><{file_id_hex}>]"
        if prev is not None:
            trailer += f"/Prev {prev}"
        trailer += ">>"
        lines.append("trailer" + trailer)
        lines.append("startxref")
        lines.append(str(xref_addr))
        lines.append("%%EOF")
        self.buf += ("\n".join(lines) + "\n").encode("latin-1")
        return bytes(self.buf)

    def finish_xref_stream(self, root: int, compressed: Optional[dict] = None) -> bytes:
        """PDF-1.5 xref *stream* with /W [1 3 1], predictor 12 DecodeParms.

        ``compressed`` maps obj_num -> (objstm_num, index) for type-2 entries.
        """
        compressed = compressed or {}
        xref_obj = self.reserve()
        xref_addr = len(self.buf)
        size = xref_obj + 1
        rows = []
        for n in range(size):
            if n == 0:
                rows.append((0, 0, 65535))
            elif n in compressed:
                stm, idx = compressed[n]
                rows.append((2, stm, idx))
            elif n == xref_obj:
                rows.append((1, xref_addr, 0))
            elif n in self.addrs:
                rows.append((1, self.addrs[n], 0))
            else:
                rows.append((0, 0, 0))
        # encode rows, apply predictor-Up inverse (delta rows, filter byte 2)
        width = 1 + 3 + 1
        raw = bytearray()
        prev_row = bytes(width)
        for t, a, b in rows:
            row = bytes((t,)) + a.to_bytes(3, "big") + bytes((b & 0xFF,))
            raw.append(2)
            raw += bytes((row[i] - prev_row[i]) & 0xFF for i in range(width))
            prev_row = row
        payload = zlib.compress(bytes(raw))
        dict_body = (
            f"<</Type/XRef/Size {size}/W[1 3 1]/Root {root} 0 R"
            f"/Filter/FlateDecode/DecodeParms<</Columns {width}/Predictor 12>>"
            f"/Length {len(payload)}>>stream"
        )
        self.addrs[xref_obj] = xref_addr
        self.buf += f"{xref_obj} 0 obj\n".encode("latin-1")
        self.buf += dict_body.encode("latin-1")
        self.buf += b"\n"
        self.buf += payload
        self.buf += b"\nendstream\nendobj\n"
        self.buf += f"startxref\n{xref_addr}\n%%EOF\n".encode("latin-1")
        return bytes(self.buf)

    def add_object_stream(self, members: list) -> tuple:
        """Create a /Type/ObjStm holding ``members`` = [(obj_num, body_str), ...].

        Returns (objstm_num, {obj_num: (objstm_num, index)}).
        """
        objstm_num = self.reserve()
        header = []
        bodies = []
        offset = 0
        for num, body in members:
            header.append(f"{num} {offset}")
            bodies.append(body)
            offset += len(body) + 1
        header_str = " ".join(header) + "\n"
        payload = (header_str + " ".join(bodies)).encode("latin-1")
        # recompute offsets: bodies joined with single spaces after header
        # (offsets are relative to /First)
        offset = 0
        header = []
        for num, body in members:
            header.append(f"{num} {offset}")
            offset += len(body) + 1
        header_str = " ".join(header) + "\n"
        payload = (header_str + " ".join(bodies)).encode("latin-1")
        first = len(header_str)
        self.add_stream(
            payload,
            dict_extra=f"/Type/ObjStm/N {len(members)}/First {first}",
            obj_num=objstm_num,
            flate=True,
            encrypt=False,
        )
        mapping = {num: (objstm_num, i) for i, (num, _) in enumerate(members)}
        return objstm_num, mapping

    def add_encrypt_dict(self) -> None:
        assert self.encryption is not None
        self.encrypt_obj_num = self.add(self.encryption.dict_body())
