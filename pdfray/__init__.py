"""pdfray — Ray-Data-native PDF text-extraction and corpus-processing engine.

A from-scratch reimplementation of the extraction capabilities of
PeterHuberSg/PdfParser (reference at /root/reference, read-only) expressed as
Ray Data pipelines: `ray.data.Dataset.map_batches` over zero-copy Arrow binary
columns with actor pools holding warm parser state.  The pure-Python document
core lives in `pdfray.core` (no Ray imports); Ray wiring lives in
`pdfray.stages` / `pdfray.pipelines`.
"""

__version__ = "0.1.0"
