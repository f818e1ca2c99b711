"""Pure-Python PDF extraction core (no Ray imports).

Semantics reproduce the reference extraction library (PdfParser/*.cs) —
byte lexer, xref/trailer resolution, stream decoding, RC4 decryption,
content-stream interpretation, font/ToUnicode mapping — re-written from
scratch in Python.  See each module's docstring for file:line citations.
"""
