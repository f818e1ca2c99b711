"""Schema-safe collection of possibly-empty Datasets.

Ray drops all-empty blocks from a collect: ``ds.to_pandas()`` on a stream
whose every block is empty returns a ZERO-COLUMN frame — even when the
dataset was built from a typed empty Arrow table — and the first column
access downstream dies with KeyError.  This single failure class broke 40+
queries on the empty-input contract (a 0-row table is a legitimate input:
an empty delta in an incremental run, a filter that matched nothing, one
empty partition of a 256-node job).  ``typed_collect`` is the one place
the schema is recovered: from the dataset's own plan schema when Ray still
knows it, else from the caller's declared fallback.
"""
from __future__ import annotations

import pandas as pd
import pyarrow as pa


def typed_collect(ds, fallback: pa.Schema = None) -> pd.DataFrame:
    """``ds.to_pandas()`` that survives an all-empty stream (see module
    docstring).  ``fallback`` is the output schema to rebuild when the
    plan schema is unknown (map stages whose UDF defines the columns)."""
    df = ds.to_pandas()
    if len(df.columns):
        return df
    s = ds.schema()
    arrow = getattr(s, "base_schema", None) if s is not None else None
    if not isinstance(arrow, pa.Schema):
        # pandas-block streams report a PandasBlockSchema here (hostile
        # harness find: an all-empty map_groups output); convert it, else
        # use the caller's declared fallback
        if arrow is not None and fallback is None:
            try:
                arrow = pa.schema(
                    [
                        (n, pa.from_numpy_dtype(t))
                        for n, t in zip(arrow.names, arrow.types)
                    ]
                )
            except (pa.ArrowNotImplementedError, TypeError):
                arrow = None
        else:
            arrow = fallback
    if arrow is None:
        raise ValueError(
            "typed_collect over a fully-empty unschema'd stream: "
            "pass a fallback schema"
        )
    return arrow.empty_table().to_pandas()
