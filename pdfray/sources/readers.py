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
