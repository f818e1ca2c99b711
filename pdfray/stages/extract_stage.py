"""PDF extraction as a Ray Data actor-pool stage.

The whole reference lifecycle (SURVEY.md §3.1) is the body of one stateful
``map_batches`` callable: documents arrive as a zero-copy Arrow binary column,
each row runs through the pure `pdfray.core` extractor, and the stage emits a
flat Arrow table.  Mirrors the reference's warm-state design
(`Tokeniser.cs:141-170`: shared working buffer / StringBuilder across files
-> actor-pool member state; per-document caches dropped after each row).

Per-row failures land in the ``error`` column — the stage never raises
(reference catch-and-record, `PdfPage.cs:70-81`, `PdfContent.cs:191-202`).
"""
from __future__ import annotations

import time

import pyarrow as pa

from ..core.extract import extract_document

EXTRACT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("partition_id", pa.int32()),
        ("pdf_version", pa.string()),
        ("document_id", pa.string()),
        ("document_info", pa.string()),
        ("metadata", pa.string()),
        ("n_pages", pa.int32()),
        ("page_texts", pa.list_(pa.string())),
        ("text", pa.string()),
        ("error", pa.string()),
        ("n_bytes", pa.int64()),
        ("parse_ms", pa.float64()),
    ]
)

# optional raw BT..ET source fragments per document (M22), off by default —
# large and rarely needed downstream
FRAGMENTS_FIELD = ("fragments", pa.list_(pa.string()))


class PdfExtractor:
    """Callable class for ``ds.map_batches(PdfExtractor, batch_format="pyarrow",
    concurrency=N)``.  Configuration is captured once per actor in __init__;
    __call__ handles one Arrow batch of documents."""

    def __init__(
        self,
        content_delimiter: str = "|",
        newline: str = "\n",
        password: str = "",
        working_buffer_size: int = 10_000_000,
        include_page_texts: bool = True,
        include_metadata: bool = True,
        include_fragments: bool = False,
        defer_over_bytes: int = 0,
        finish_deferred: bool = False,
        passthrough: tuple = (),
    ):
        self.content_delimiter = content_delimiter
        self.newline = newline
        self.password = password
        self.working_buffer_size = working_buffer_size
        self.include_page_texts = include_page_texts
        self.include_metadata = include_metadata
        self.include_fragments = include_fragments
        # skew routing, chained-passthrough form: stage A (defer_over_bytes>0)
        # extracts small documents and passes huge payloads through in a
        # `deferred_html` column; stage B (finish_deferred) extracts those.
        # One input read, two pools, no union re-scan.
        self.defer_over_bytes = defer_over_bytes
        self.finish_deferred = finish_deferred
        # input metadata columns (lang, warc_ts, ...) copied row-aligned onto
        # the output — at corpus scale the input-side metadata cannot be
        # re-joined later (10^12-row join), so it rides the extraction pass
        self.passthrough = tuple(passthrough)

    def _schema(self, with_deferred: bool) -> pa.Schema:
        schema = EXTRACT_SCHEMA
        if self.include_fragments:
            schema = schema.append(pa.field(*FRAGMENTS_FIELD))
        if with_deferred:
            schema = schema.append(pa.field("deferred_html", pa.binary()))
            schema = schema.append(pa.field("deferred_password", pa.string()))
        return schema

    def _extract_rows(self, urls, htmls, partition_ids, passwords, defer: bool) -> pa.Table:
        out = {name: [] for name in self._schema(defer).names}
        deferred = out.get("deferred_html")
        deferred_pw = out.get("deferred_password")
        for i in range(len(urls)):
            html = htmls[i].as_py()  # one copy of the document bytes (parse needs random access)
            n_bytes = len(html) if html is not None else 0
            out["url"].append(urls[i].as_py())
            out["partition_id"].append(partition_ids[i])
            out["n_bytes"].append(n_bytes)
            if defer and n_bytes > self.defer_over_bytes:
                # huge document: pass the payload through to the dedicated pool
                out["pdf_version"].append(None)
                out["document_id"].append(None)
                out["document_info"].append(None)
                out["metadata"].append(None)
                out["n_pages"].append(0)
                out["page_texts"].append([])
                out["text"].append(None)
                out["error"].append(None)
                out["parse_ms"].append(0.0)
                if self.include_fragments:
                    out["fragments"].append([])
                deferred.append(html)
                # resolve the effective password HERE so a per-row password
                # column survives the handoff to the huge-document pool
                deferred_pw.append(
                    (passwords[i] if passwords is not None else self.password) or ""
                )
                continue
            t0 = time.perf_counter()
            result = extract_document(
                html,
                password=(passwords[i] if passwords is not None else self.password) or "",
                content_delimiter=self.content_delimiter,
                newline=self.newline,
                working_buffer_size=self.working_buffer_size,
            )
            parse_ms = (time.perf_counter() - t0) * 1000.0
            out["pdf_version"].append(result.pdf_version)
            out["document_id"].append(result.document_id)
            out["document_info"].append(result.document_info)
            out["metadata"].append(result.metadata if self.include_metadata else None)
            out["n_pages"].append(result.n_pages)
            out["page_texts"].append(result.page_texts if self.include_page_texts else [])
            out["text"].append(result.text)
            out["error"].append(result.error_summary())
            out["parse_ms"].append(parse_ms)
            if self.include_fragments:
                out["fragments"].append(
                    [f for page in result.pages for c in page.contents for f in c.fragments]
                )
            if defer:
                deferred.append(None)
                deferred_pw.append(None)
        return pa.table(out, schema=self._schema(defer))

    def _finish(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        drop = [c for c in ("deferred_html", "deferred_password") if c in batch.column_names]
        mask = pc.is_valid(batch.column("deferred_html"))
        done = batch.filter(pc.invert(mask)).drop_columns(drop)
        todo = batch.filter(mask)
        if len(todo) == 0:
            return done
        passwords = (
            todo.column("deferred_password").to_pylist()
            if "deferred_password" in todo.column_names
            else None
        )
        extracted = self._extract_rows(
            todo.column("url"),
            todo.column("deferred_html"),
            todo.column("partition_id").to_pylist(),
            passwords,
            defer=False,
        )
        # passthrough metadata rode stage A's output; re-attach row-aligned
        for name in self.passthrough:
            if name in todo.column_names:
                extracted = extracted.append_column(name, todo.column(name))
        extracted = extracted.select(done.column_names)
        return pa.concat_tables([done, extracted])

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.finish_deferred:
            return self._finish(batch)
        urls = batch.column("url")
        htmls = batch.column("html")
        if "partition_id" in batch.column_names:
            partition_ids = batch.column("partition_id").to_pylist()
        else:
            partition_ids = [0] * len(batch)
        # per-document password column overrides the stage-wide constant
        # (user-extension surface: PdfParser.cs:82,94 ctor arg per document)
        passwords = (
            batch.column("password").to_pylist()
            if "password" in batch.column_names
            else None
        )
        out = self._extract_rows(
            urls, htmls, partition_ids, passwords, defer=self.defer_over_bytes > 0
        )
        for name in self.passthrough:
            if name in batch.column_names:
                out = out.append_column(name, batch.column(name))
        return out
