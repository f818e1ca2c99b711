"""Pure-Python Apache Avro Object Container File codec (flat records).

The Avro leg of the format matrix (parquet / ORC / Arrow IPC / CSV / JSONL
/ WARC / WebDataset tar): Avro is THE row-oriented interchange format of
streaming pipelines (Kafka, log shippers), so a corpus engine needs to
ingest and emit it.  No Avro library ships in this environment; the spec
(https://avro.apache.org/docs/1.11.1/specification/) is small for what we
need and is implemented here from scratch:

- binary encoding: zigzag-varint longs, IEEE little-endian doubles,
  length-prefixed utf-8 strings / bytes, 1-byte booleans, unions as
  varint branch index + value, records as field-order concatenation;
- container framing: 'Obj\\x01' magic, file-metadata map carrying
  avro.schema (JSON) + avro.codec, a 16-byte sync marker, then blocks of
  (row count, byte size, payload, sync);
- codecs: null and deflate (raw zlib, wbits=-15 — the spec's "deflate").

Determinism: the sync marker is derived from the md5 of the encoded block
payloads, so identical tables encode to identical BYTES — which is what
lets the distributed sink content-address files and stay idempotent under
retries.

Every field is written as the union ['null', T] (the universal Avro
nullable convention), so Arrow nulls round-trip.  Supported Arrow types:
int64/int32 (long/int), float64 (double), bool, string, binary,
timestamp[us] (long + logicalType timestamp-micros).  Nested types raise
loudly — flat records only, like the CSV leg.
"""
from __future__ import annotations

import hashlib
import json
import struct
import zlib

import numpy as np
import pyarrow as pa

MAGIC = b"Obj\x01"

_ARROW_TO_AVRO = {
    pa.int64(): "long",
    pa.int32(): "int",
    pa.float64(): "double",
    pa.bool_(): "boolean",
    pa.string(): "string",
    pa.binary(): "bytes",
    pa.timestamp("us"): {"type": "long", "logicalType": "timestamp-micros"},
}


def arrow_to_avro_schema(schema: pa.Schema, name: str = "Row") -> dict:
    fields = []
    for f in schema:
        if f.type not in _ARROW_TO_AVRO:
            raise ValueError(f"avro: unsupported Arrow type {f.type} ({f.name})")
        fields.append(
            {"name": f.name, "type": ["null", _ARROW_TO_AVRO[f.type]]}
        )
    return {"type": "record", "name": name, "fields": fields}


def _avro_to_arrow_type(t) -> pa.DataType:
    if isinstance(t, list):  # union ['null', T]
        others = [x for x in t if x != "null"]
        if len(others) != 1:
            raise ValueError(f"avro: unsupported union {t}")
        return _avro_to_arrow_type(others[0])
    if isinstance(t, dict):
        if t.get("logicalType") == "timestamp-micros" and t.get("type") == "long":
            return pa.timestamp("us")
        raise ValueError(f"avro: unsupported schema node {t}")
    return {
        "long": pa.int64(),
        "int": pa.int32(),
        "double": pa.float64(),
        "boolean": pa.bool_(),
        "string": pa.string(),
        "bytes": pa.binary(),
    }[t]


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _write_long(out: bytearray, v: int) -> None:
    z = _zigzag(int(v))
    while z > 0x7F:
        out.append((z & 0x7F) | 0x80)
        z >>= 7
    out.append(z)


def _encode_column(kind, values, valid):
    """Per-row encoded bytes for one column (list of bytes objects)."""
    enc = []
    if kind == "string":
        for ok, v in zip(valid, values):
            if not ok:
                enc.append(b"\x00")
            else:
                b = v.encode("utf-8")
                head = bytearray(b"\x02")
                _write_long(head, len(b))
                enc.append(bytes(head) + b)
    elif kind == "bytes":
        for ok, v in zip(valid, values):
            if not ok:
                enc.append(b"\x00")
            else:
                head = bytearray(b"\x02")
                _write_long(head, len(v))
                enc.append(bytes(head) + v)
    elif kind == "double":
        for ok, v in zip(valid, values):
            enc.append(
                b"\x00" if not ok else b"\x02" + struct.pack("<d", v)
            )
    elif kind == "boolean":
        for ok, v in zip(valid, values):
            enc.append(
                b"\x00" if not ok else (b"\x02\x01" if v else b"\x02\x00")
            )
    else:  # long / int / timestamp-micros
        for ok, v in zip(valid, values):
            if not ok:
                enc.append(b"\x00")
            else:
                head = bytearray(b"\x02")
                _write_long(head, int(v))
                enc.append(bytes(head))
    return enc


def _field_kind(t) -> str:
    if isinstance(t, dict):
        return "long"
    return t


def encode_container(
    table: pa.Table, codec: str = "deflate", block_rows: int = 4096
) -> bytes:
    """Encode an Arrow table as one Avro Object Container File (bytes).

    Deterministic: same table -> same bytes (sync marker derived from the
    payload md5)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec}")
    schema = arrow_to_avro_schema(table.schema)
    kinds = [_field_kind(f["type"][1]) for f in schema["fields"]]
    cols = []
    for i, f in enumerate(table.schema):
        col = table.column(i)
        if f.type == pa.timestamp("us"):
            col = col.cast(pa.int64())
        valid = ~np.asarray(col.is_null())
        cols.append(
            _encode_column(kinds[i], col.to_pylist(), valid.tolist())
        )
    blocks = []
    for start in range(0, len(table), block_rows):
        n = min(block_rows, len(table) - start)
        payload = bytearray()
        for r in range(start, start + n):
            for c in cols:
                payload += c[r]
        raw = bytes(payload)
        if codec == "deflate":
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            raw = comp.compress(raw) + comp.flush()
        blocks.append((n, raw))
    sync = hashlib.md5(
        b"".join(b for _, b in blocks) + json.dumps(schema).encode()
    ).digest()

    out = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, sort_keys=True).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k in sorted(meta):
        kb = k.encode()
        _write_long(out, len(kb))
        out += kb
        _write_long(out, len(meta[k]))
        out += meta[k]
    _write_long(out, 0)  # end of metadata map
    out += sync
    for n, raw in blocks:
        _write_long(out, n)
        _write_long(out, len(raw))
        out += raw
        out += sync
    return bytes(out)


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.p = 0

    def long(self) -> int:
        z, shift = 0, 0
        while True:
            b = self.d[self.p]
            self.p += 1
            z |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (z >> 1) ^ -(z & 1)

    def raw(self, n: int) -> bytes:
        b = self.d[self.p : self.p + n]
        self.p += n
        return b


def decode_container(data: bytes, columns=None) -> pa.Table:
    """Decode an Avro Object Container File to an Arrow table.

    ``columns`` prunes at DECODE time: unwanted fields are still walked
    (Avro is not seekable within a record) but their values are never
    materialized into Python objects or arrays."""
    r = _Reader(data)
    if r.raw(4) != MAGIC:
        raise ValueError("avro: bad container magic")
    meta = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:  # spec: negative count precedes a byte size
            n = -n
            r.long()
        for _ in range(n):
            k = r.raw(r.long()).decode()
            meta[k] = r.raw(r.long())
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec}")
    sync = r.raw(16)
    fields = schema["fields"]
    names = [f["name"] for f in fields]
    kinds = [_field_kind(f["type"][1]) for f in fields]
    keep = [columns is None or nm in columns for nm in names]
    out = {nm: [] for nm, k in zip(names, keep) if k}
    while r.p < len(r.d):
        n_rows = r.long()
        size = r.long()
        payload = r.raw(size)
        if r.raw(16) != sync:
            raise ValueError("avro: sync marker mismatch (torn block)")
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        br = _Reader(payload)
        for _ in range(n_rows):
            for nm, kind, kp in zip(names, kinds, keep):
                branch = br.long()
                if branch == 0:
                    v = None
                elif kind == "string":
                    v = br.raw(br.long())
                    v = v.decode("utf-8") if kp else None
                elif kind == "bytes":
                    v = bytes(br.raw(br.long()))
                elif kind == "double":
                    v = struct.unpack("<d", br.raw(8))[0]
                elif kind == "boolean":
                    v = br.raw(1) != b"\x00"
                else:
                    v = br.long()
                if kp:
                    out[nm].append(v)
    arrays, fields_out = [], []
    for f, nm, kp in zip(fields, names, keep):
        if not kp:
            continue
        at = _avro_to_arrow_type(f["type"])
        vals = out[nm]
        if at == pa.timestamp("us"):
            arrays.append(pa.array(vals, pa.int64()).cast(at))
        else:
            arrays.append(pa.array(vals, at))
        fields_out.append(pa.field(nm, at))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields_out))
