"""Empty-input contract: every table query survives a fully-EMPTY corpus.

A 0-row table is a legitimate input at production scale — an empty delta in
an incremental run, a filter that matched nothing upstream, one empty
partition of a 256-node job.  Before this contract landed, 13 queries
crashed on it and dozens more returned a zero-COLUMN frame (Ray drops
all-empty blocks from a collect and loses the schema — see
pdfray/pipelines/frames.py).

This is the real driver comparison (engine vs its registered DuckDB oracle
SQL, dtype-class-strict) over a corpus where every one of the ten tables
has zero rows.  Scale-generic queries must match their oracle EXACTLY on
the empty input (typically a typed 0-row frame, sometimes a non-empty
degenerate aggregate the oracle also produces).  The literal-pinned
queries (goldens embedded as sf0.01 VALUES — see CLAUDE.md) legitimately
mismatch the oracle's literal rows; for those the contract is only
"no crash + typed 0-row engine output".
"""
from __future__ import annotations

import glob
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# oracle embeds sf0.01-pinned golden literals: engine's typed empty output
# cannot (and must not) match the literal rows
LITERAL_PINNED = {"t_bpe_train", "t_bpe_apply"}

# fixture families read the generated PDF/media corpora, not the tables —
# out of scope for the table contract
_SKIP_PREFIX = ("extract_", "m_", "pipeline_")

QUERY_NAMES = [
    n for n in entrymod.queries() if not n.startswith(_SKIP_PREFIX)
]


@pytest.fixture(scope="module")
def empty_sf(ray_session, tmp_path_factory):
    """All ten tables, zero rows, real schemas (taken from sf0.001)."""
    src = os.environ.get("GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(os.path.join(src, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


def _to_pandas(obj):
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _assert_driver_equal(name, mine, oracle):
    """Mirror tools/check_oracles.py::compare (the driver's strictness:
    column names, row count, float-vs-not-float dtype class, values)."""
    mine = mine.reindex(sorted(mine.columns), axis=1)
    oracle = oracle.reindex(sorted(oracle.columns), axis=1)
    assert list(mine.columns) == list(oracle.columns), name
    mine = mine.sort_values(list(mine.columns)).reset_index(drop=True)
    oracle = oracle.sort_values(list(oracle.columns)).reset_index(drop=True)
    assert len(mine) == len(oracle), f"{name}: {len(mine)} vs {len(oracle)} rows"
    for col in mine.columns:
        a, b = mine[col], oracle[col]
        af = pd.api.types.is_float_dtype(a)
        assert af == pd.api.types.is_float_dtype(b), (
            f"{name}.{col}: dtype class {a.dtype} vs {b.dtype}"
        )
        if af:
            assert np.allclose(
                a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True
            ), f"{name}.{col}"
        else:
            assert (
                a.astype(str).fillna("") == b.astype(str).fillna("")
            ).all(), f"{name}.{col}"


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_empty_corpus_contract(empty_sf, name):
    import duckdb

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()

    got = _to_pandas(qs[name](empty_sf))
    assert isinstance(got, pd.DataFrame), name
    assert len(got.columns) > 0, f"{name}: schema lost on empty input"

    if name in LITERAL_PINNED:
        assert len(got) == 0, f"{name}: empty corpus must yield 0 rows"
        return
    sql = osql.get(name)
    if sql is None:  # rows-only query (s_kmeans): no-crash + typed empty
        assert len(got) == 0, name
        return

    con = duckdb.connect()
    for t in TABLES:
        f = os.path.join(empty_sf, f"{t}.parquet")
        pattern = f if os.path.isfile(f) else f"{f}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')"
        )
    want = con.execute(sql).df()
    con.close()
    _assert_driver_equal(name, got, want)
