"""WARC source: the Common-Crawl-native container format.

Pure-Python WARC/1.0 record parsing (ISO 28500 framing: header block,
``Content-Length``-framed payload, CRLF CRLF record separator) feeding the
standard corpus (url, html) schema — ``response`` records contribute their
HTTP message BODY keyed by ``WARC-Target-URI``; ``resource`` records
contribute their raw payload.  Real-crawl envelope handling (round 5,
ADVICE r04): WARC header values decode as UTF-8 (latin-1 fallback — the
pre-1.0 convention), HTTP bodies are de-chunked (Transfer-Encoding:
chunked) and inflated (Content-Encoding: gzip/deflate), and .warc.gz
members stream one at a time so peak memory is one record, never the
multi-GB inflated segment.

Scale shape: one Ray read task per WARC file (`read_binary_files`), each
parsing its file independently inside `map_batches` — the same
partitioning as the parquet ingest (file = partition), so a crawl of
100k WARC segments parallelizes per segment with no coordination.  The
compressed file bytes are one object-store block (Common Crawl caps
segments ~1 GB); only the inflation is incremental.
"""
from __future__ import annotations

import zlib

import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


def _iter_gzip_members(data: bytes):
    """Yield each gzip member of a concatenated-member stream inflated
    one at a time (the .warc.gz convention is one member per record, so
    peak memory is a record, not the whole segment)."""
    while data:
        d = zlib.decompressobj(wbits=31)
        member = d.decompress(data) + d.flush()
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        rest = d.unused_data
        if rest == data:  # zero progress: corrupt framing
            raise ValueError("corrupt gzip member in WARC stream")
        yield member
        data = rest


def _decode_header(v: bytes) -> str:
    """WARC/1.0 header values are UTF-8; fall back to latin-1 so a stray
    legacy byte sequence degrades readably instead of raising (non-ASCII
    WARC-Target-URIs in real Common-Crawl segments must round-trip)."""
    try:
        return v.decode("utf-8")
    except UnicodeDecodeError:
        return v.decode("latin-1")


def _parse_headers(block: bytes) -> dict:
    headers = {}
    for line in block.split(b"\r\n")[1:]:  # line 0 is the WARC/1.0 version
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = v.strip()
    return headers


def _iter_records_plain(data: bytes):
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate leading separators/padding between records
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC record header at offset {pos}")
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            raise ValueError("unterminated WARC header block")
        headers = _parse_headers(data[pos:head_end])
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise ValueError("WARC record without Content-Length") from None
        body_start = head_end + len(_CRLF2)
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        yield headers, payload
        pos = body_start + length


def iter_warc_records(data: bytes):
    """Yield (headers: dict, payload: bytes) per WARC record; gzipped
    streams inflate member-by-member (bounded memory)."""
    if data[:2] == b"\x1f\x8b":
        for member in _iter_gzip_members(data):
            yield from _iter_records_plain(member)
    else:
        yield from _iter_records_plain(data)


def _dechunk(body: bytes) -> bytes:
    """Reassemble a Transfer-Encoding: chunked HTTP body (RFC 9112 §7.1:
    hex size line [; extensions] CRLF, chunk data CRLF, ... 0-size chunk,
    optional trailers)."""
    out = []
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            raise ValueError("unterminated chunk-size line")
        size_tok = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise ValueError(f"bad chunk size {size_tok!r}") from None
        start = nl + 2
        if size == 0:
            return b"".join(out)  # trailers (if any) are discarded
        chunk = body[start : start + size]
        if len(chunk) != size:
            raise ValueError("truncated chunk data")
        out.append(chunk)
        pos = start + size + 2  # skip the chunk's trailing CRLF


def _http_body(payload: bytes) -> bytes:
    """Body of an HTTP message payload (response records wrap the document
    in status line + headers): strips the header block, reassembles
    Transfer-Encoding: chunked framing, and inflates Content-Encoding
    gzip/deflate — real Common-Crawl response records carry all three.
    Payloads without an HTTP preamble pass through whole."""
    if not (payload.startswith(b"HTTP/1.") or payload.startswith(b"HTTP/2")):
        return payload
    sep = payload.find(_CRLF2)
    if sep < 0:
        return payload
    head, body = payload[:sep], payload[sep + len(_CRLF2) :]
    http = _parse_headers(head)  # same k: v framing as the WARC block
    if b"chunked" in http.get("transfer-encoding", b"").lower():
        body = _dechunk(body)
    enc = http.get("content-encoding", b"").strip().lower()
    if enc in (b"gzip", b"x-gzip"):
        body = zlib.decompress(body, wbits=31)
    elif enc == b"deflate":
        try:
            body = zlib.decompress(body)  # zlib-wrapped (the spec form)
        except zlib.error:
            body = zlib.decompress(body, wbits=-15)  # raw-deflate servers
    return body


def warc_to_rows(data: bytes):
    """(url, html) rows from one WARC file's bytes: response records yield
    their HTTP body, resource records their raw payload; other record
    types (warcinfo, request, metadata) are skipped."""
    rows = []
    for headers, payload in iter_warc_records(data):
        rtype = headers.get("warc-type", b"").decode("latin-1")
        uri = _decode_header(headers.get("warc-target-uri", b""))
        if rtype == "response":
            rows.append((uri, _http_body(payload)))
        elif rtype == "resource":
            rows.append((uri, payload))
    return rows


def read_warc(path, file_extensions=("warc", "warc.gz")):
    """WARC crawl -> Dataset with the corpus (url, html) schema — one read
    task per file, records parsed inside the map stage.  Extension match
    is suffix-based, so ``warc.gz`` catches gzipped segments WITHOUT
    claiming every stray ``.gz`` file in the crawl directory."""
    import ray.data as rd

    ds = rd.read_binary_files(
        path, include_paths=True, file_extensions=list(file_extensions)
    )

    def explode(t: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for blob in t.column("bytes").to_pylist():
            for url, html in warc_to_rows(blob):
                urls.append(url)
                htmls.append(html)
        return pa.table(
            {"url": pa.array(urls, pa.string()), "html": pa.array(htmls, pa.binary())}
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def build_warc(records, gzip_members: bool = False) -> bytes:
    """Serialize (url, payload, warc_type) records to WARC/1.0 bytes —
    the test/fixture writer twin of `iter_warc_records`.  ``response``
    records are wrapped in a minimal HTTP/1.1 200 message, matching how
    Common Crawl stores fetched documents."""
    import gzip as _gzip

    out = []
    for url, payload, rtype in records:
        if rtype == "response":
            body = (
                b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n"
                + b"Content-Length: "
                + str(len(payload)).encode()
                + _CRLF2
                + payload
            )
        else:
            body = payload
        head = (
            b"WARC/1.0\r\n"
            + b"WARC-Type: "
            + rtype.encode()
            + b"\r\n"
            + b"WARC-Target-URI: "
            + url.encode()
            + b"\r\n"
            + b"WARC-Record-ID: <urn:uuid:test>\r\n"
            + b"Content-Length: "
            + str(len(body)).encode()
            + b"\r\n"
        )
        rec = head + b"\r\n" + body + _CRLF2
        out.append(_gzip.compress(rec) if gzip_members else rec)
    return b"".join(out)
