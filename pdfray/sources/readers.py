"""Corpus sources beyond parquet: loose-file directory crawl.

The reference's directory crawl (`PdfFileTest.processDir`,
`PdfFileTest.cs:33-47`) maps to `ray.data.read_binary_files` with partition
discovery — parallelism comes from block splitting, not a loop.
"""
from __future__ import annotations

import pyarrow as pa


def read_pdf_files(path: str, file_extensions=("pdf",)):
    """Recursive *.pdf crawl -> Dataset with the corpus (url, html) schema."""
    import ray.data as rd

    ds = rd.read_binary_files(
        path, include_paths=True, file_extensions=list(file_extensions)
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"url": t.column("path"), "html": t.column("bytes")})

    return ds.map_batches(rename, batch_format="pyarrow")


def read_corpus_jsonl(path: str):
    """JSONL corpus -> (url, html) Dataset: one record per line with
    ``url`` and base64-encoded ``html_b64`` fields (JSON cannot carry raw
    bytes).  One read task per file, base64 decoded vectorized in the map
    stage — the common interchange layout for webtext dumps when parquet
    isn't available."""
    import base64

    import ray.data as rd

    ds = rd.read_json(path)

    def decode(t: pa.Table) -> pa.Table:
        htmls = [
            base64.b64decode(s) for s in t.column("html_b64").to_pylist()
        ]
        return pa.table(
            {
                "url": t.column("url"),
                "html": pa.array(htmls, pa.binary()),
            }
        )

    return ds.map_batches(decode, batch_format="pyarrow")


def write_corpus_jsonl(rows, path: str) -> str:
    """Writer twin of `read_corpus_jsonl` for tests/fixtures: rows are
    (url, html_bytes) pairs."""
    import base64
    import json

    with open(path, "w", encoding="utf-8") as fh:
        for url, html in rows:
            fh.write(
                json.dumps(
                    {"url": url, "html_b64": base64.b64encode(html).decode()}
                )
                + "\n"
            )
    return path


def read_webdataset(path: str):
    """WebDataset tar-shard source — the loader twin of
    `pdfray.pipelines.textops.t_webdataset_shards`.  One read task per
    shard archive (`read_binary_files` over *.tar), each tar parsed in
    the worker with stdlib tarfile; emits (doc_id, text).  Shards are
    independent, so read parallelism = shard count — exactly the
    property the sink's data-proportional shard count provides; a shard
    is parsed entirely inside its worker (bounded by the sink's
    docs-per-shard knob), nothing corpus-sized ever concentrates."""
    import io
    import tarfile

    import ray.data as rd

    ds = rd.read_binary_files(path, file_extensions=["tar"])

    def parse(t: pa.Table) -> pa.Table:
        ids, texts = [], []
        for blob in t.column("bytes").to_pylist():
            with tarfile.open(fileobj=io.BytesIO(blob)) as tar:
                for m in tar.getmembers():
                    if not (m.isfile() and m.name.endswith(".txt")):
                        continue
                    ids.append(int(m.name[: -len(".txt")]))
                    texts.append(tar.extractfile(m).read().decode("utf-8"))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")


def read_csv_table(path: str, schema: pa.Schema):
    """Lossless CSV table source (one read task per file).  CSV is only
    deterministic with an EXPLICIT schema and pinned conversion rules, so
    this wraps `ray.data.read_csv` with the exact options that make the
    Arrow writer→reader loop bit-identical (pinned by q_csv_roundtrip's
    oracle and the roundtrip test):
      - ``column_types=schema``: no type inference drift;
      - ``null_values=[""]`` + ``strings_can_be_null=True`` +
        ``quoted_strings_can_be_null=False``: a BARE empty field is NULL,
        a QUOTED empty field is the empty string — the writer emits
        exactly that distinction — and "nan"/"inf" stay doubles instead
        of being swallowed by Arrow's default null-token list;
      - ``newlines_in_values=True``: quoted embedded newlines parse.
    Doubles round-trip exactly (Arrow writes shortest-roundtrip reprs),
    including NaN and ±inf."""
    import pyarrow.csv as pac
    import ray.data as rd

    return rd.read_csv(
        path,
        parse_options=pac.ParseOptions(newlines_in_values=True),
        convert_options=pac.ConvertOptions(
            column_types=schema,
            null_values=[""],
            strings_can_be_null=True,
            quoted_strings_can_be_null=False,
        ),
    )


def read_parquet_evolved(paths):
    """Union-by-name parquet read across EVOLVED file schemas — the
    schema-evolution read every long-lived table needs once a column has
    been added or dropped between ingest generations.

    Ray's native `read_parquet` over mixed-schema files emits blocks with
    whichever schema their file had and WARNS "may lead to unexpected
    behavior" — the first downstream Arrow kernel that touches a column
    missing from some block then crashes or silently drops it.  Here the
    union schema is discovered from FOOTERS only (no data read: one
    `pq.read_schema` per file, column order = first appearance), and one
    normalization map casts every block to it, NULL-filling absent
    columns — so the whole downstream pipeline sees ONE schema.  A column
    whose TYPE changed between generations raises ValueError: this reader
    models add/drop evolution; type migrations need an explicit cast
    policy, not a guess.

    ``paths``: a directory, a file, or a list of either (directories are
    scanned recursively for ``*.parquet``)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    files = []
    for p in paths:
        p = str(p)
        if os.path.isdir(p):
            for root, _dirs, names in os.walk(p):
                files.extend(
                    os.path.join(root, n)
                    for n in sorted(names)
                    if n.endswith(".parquet")
                )
        else:
            files.append(p)
    files = sorted(files)
    if not files:
        raise ValueError(f"read_parquet_evolved: no parquet files under {paths!r}")

    union: dict[str, pa.DataType] = {}
    for f in files:
        for fld in pq.read_schema(f):
            prev = union.get(fld.name)
            if prev is None:
                union[fld.name] = fld.type
            elif prev != fld.type:
                raise ValueError(
                    f"read_parquet_evolved: column {fld.name!r} changed type "
                    f"across generations ({prev} vs {fld.type} in {f}); "
                    "add/drop evolution only — migrate types explicitly"
                )
    target = pa.schema(list(union.items()))

    def normalize(t: pa.Table) -> pa.Table:
        cols = {}
        for fld in target:
            if fld.name in t.column_names:
                cols[fld.name] = t.column(fld.name)
            else:
                cols[fld.name] = pa.nulls(len(t), fld.type)
        return pa.table(cols, schema=target)

    return rd.read_parquet(files).map_batches(normalize, batch_format="pyarrow")


def write_ipc_table(ds, out_dir: str) -> None:
    """Distributed Arrow IPC (Feather v2) sink: every block writes ONE
    ``.arrow`` file — the zero-copy interchange format for handing a
    table to another Arrow-native process without a parse step.

    Files are CONTENT-ADDRESSED (md5 of the encoded bytes), so the sink
    is idempotent: a retried or resumed task rewrites the same name with
    the same bytes, and a crashed run never leaves a torn file visible
    (write-to-temp + os.replace, the t_webdataset_shards discipline)."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"path": pa.array([], pa.string())})
        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, t.schema) as w:
            w.write_table(t)
        buf = sink.getvalue().to_pybytes()
        name = hashlib.md5(buf).hexdigest() + ".arrow"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path])})

    # consume the write plan; the manifest rows are tiny (one per block)
    ds.map_batches(write_block, batch_format="pyarrow").count()


def read_ipc_table(path: str):
    """Distributed Arrow IPC source: one read task per ``.arrow`` file
    (`read_binary_files` parallelism), decoded zero-parse inside the
    worker with `pa.ipc.open_file`."""
    import ray.data as rd

    ds = rd.read_binary_files(path, file_extensions=["arrow"])

    def decode(t: pa.Table) -> pa.Table:
        tables = [
            pa.ipc.open_file(pa.BufferReader(b)).read_all()
            for b in t.column("bytes").to_pylist()
        ]
        return pa.concat_tables(tables) if tables else pa.table({})

    return ds.map_batches(decode, batch_format="pyarrow")


def write_orc_table(ds, out_dir: str) -> None:
    """Distributed Apache ORC sink: every block writes ONE ``.orc`` file —
    the columnar interchange leg for Hive/Trino/Spark-side consumers
    (the warehouse half of the format matrix, next to the Arrow-native
    IPC sink).

    Same durability discipline as `write_ipc_table`: files are
    CONTENT-ADDRESSED (md5 of the encoded bytes) so retries are
    idempotent, and write-to-temp + os.replace means a crashed run never
    leaves a torn file visible.  ORC's one lossy edge vs Arrow:
    timestamps widen to nanosecond precision on disk (values preserved);
    `read_orc_table` casts them back to the declared schema."""
    import hashlib
    import os

    import pyarrow.orc as orc

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"path": pa.array([], pa.string())})
        sink = pa.BufferOutputStream()
        orc.write_table(t, sink)
        buf = sink.getvalue().to_pybytes()
        name = hashlib.md5(buf).hexdigest() + ".orc"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path])})

    ds.map_batches(write_block, batch_format="pyarrow").count()


def read_orc_table(path: str, columns=None, schema: pa.Schema = None):
    """Distributed ORC source: one read task per ``.orc`` file
    (`read_binary_files` parallelism), decoded inside the worker with
    `pyarrow.orc.ORCFile`.  ``columns`` prunes at the decode (ORC is
    columnar — unread columns are never materialized); ``schema`` casts
    the decoded blocks back to the writer's Arrow types (ORC widens
    timestamps to ns on disk)."""
    import ray.data as rd

    import pyarrow.orc as orc

    ds = rd.read_binary_files(path, file_extensions=["orc"])

    def decode(t: pa.Table) -> pa.Table:
        tables = []
        for b in t.column("bytes").to_pylist():
            tbl = orc.ORCFile(pa.BufferReader(b)).read(columns=columns)
            if schema is not None:
                tbl = tbl.cast(schema)
            tables.append(tbl)
        return pa.concat_tables(tables) if tables else pa.table({})

    return ds.map_batches(decode, batch_format="pyarrow")


def write_avro_table(ds, out_dir: str) -> None:
    """Distributed Apache Avro sink: every block writes ONE ``.avro``
    Object Container File (deflate codec) — the row-oriented streaming-
    pipeline interchange leg (Kafka/log shippers) of the format matrix,
    encoded by the from-scratch codec in `pdfray.core.avro` (no Avro
    library ships here).

    Same durability discipline as the IPC/ORC sinks: the codec is
    deterministic (sync marker derived from the payload md5), so files
    are CONTENT-ADDRESSED and retries idempotent; tmp + os.replace means
    a crashed run never leaves a torn file visible."""
    import hashlib
    import os

    from ..core.avro import encode_container

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"path": pa.array([], pa.string())})
        buf = encode_container(t, codec="deflate")
        name = hashlib.md5(buf).hexdigest() + ".avro"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path])})

    ds.map_batches(write_block, batch_format="pyarrow").count()


def read_avro_table(path: str, columns=None):
    """Distributed Avro source: one decode task per ``.avro`` container
    (`read_binary_files` parallelism).  ``columns`` prunes at DECODE
    time — Avro rows are not seekable, so pruned fields are walked but
    never materialized (`core.avro.decode_container`)."""
    import ray.data as rd

    from ..core.avro import decode_container

    ds = rd.read_binary_files(path, file_extensions=["avro"])

    def decode(t: pa.Table) -> pa.Table:
        tables = [
            decode_container(b, columns=columns)
            for b in t.column("bytes").to_pylist()
        ]
        return pa.concat_tables(tables) if tables else pa.table({})

    return ds.map_batches(decode, batch_format="pyarrow")


def write_fwf_table(ds, out_dir: str, layout) -> None:
    """Distributed FIXED-WIDTH text sink — the legacy/mainframe ingest leg
    of the format matrix (COBOL copybook exports, bank clearing files,
    many regulatory feeds are still FWF).  ``layout`` is the copybook:
    a list of (column, width, kind) with kind 'int' or 'str'; ints are
    right-aligned, strings left-aligned, both space-padded, widths in
    CHARACTERS (the whole line is one UTF-8 encode, so multi-byte text
    keeps its columns).  A value wider than its field raises — classic
    FWF has no escape hatch, and silent truncation would corrupt data.

    Trailing spaces in string VALUES are indistinguishable from padding
    on read: `read_fwf_table` rstrips, which is the classic-FWF contract
    (callers needing trailing-space fidelity want the CSV leg).  Same
    durability discipline as the IPC/ORC/Avro sinks: content-addressed
    file names, tmp + os.replace."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"path": pa.array([], pa.string())})
        cols = {}
        for name, width, kind in layout:
            vals = t.column(name).to_pylist()
            out = []
            for v in vals:
                s = "" if v is None else str(v)
                if len(s) > width:
                    raise ValueError(
                        f"fwf field {name!r}: {s!r} exceeds width {width}"
                    )
                out.append(s.rjust(width) if kind == "int" else s.ljust(width))
            cols[name] = out
        lines = [
            "".join(cols[name][i] for name, _w, _k in layout)
            for i in range(len(t))
        ]
        buf = ("\n".join(lines) + "\n").encode("utf-8")
        name = hashlib.md5(buf).hexdigest() + ".fwf"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path])})

    ds.map_batches(write_block, batch_format="pyarrow").count()


def read_fwf_table(path: str, layout):
    """Distributed fixed-width source: one read task per ``.fwf`` file,
    sliced by the CHARACTER offsets of ``layout`` inside the worker.
    Strings are rstripped (padding is indistinguishable from trailing
    spaces — the classic FWF contract), ints parsed from their stripped
    field; blank int fields (all-space) parse to NULL."""
    import ray.data as rd

    ds = rd.read_binary_files(path, file_extensions=["fwf"])
    offs = []
    pos = 0
    for name, width, kind in layout:
        offs.append((name, pos, pos + width, kind))
        pos += width

    def decode(t: pa.Table) -> pa.Table:
        cols = {name: [] for name, *_ in offs}
        for b in t.column("bytes").to_pylist():
            for line in b.decode("utf-8").splitlines():
                for name, lo, hi, kind in offs:
                    field = line[lo:hi]
                    if kind == "int":
                        s = field.strip()
                        cols[name].append(int(s) if s else None)
                    else:
                        cols[name].append(field.rstrip(" "))
        arrays = {}
        for name, _lo, _hi, kind in offs:
            typ = pa.int64() if kind == "int" else pa.string()
            arrays[name] = pa.array(cols[name], typ)
        return pa.table(arrays)

    return ds.map_batches(decode, batch_format="pyarrow")
