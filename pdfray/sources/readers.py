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
