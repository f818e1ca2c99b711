"""Corpus-level relational operators over the star-schema tables.

The reference's dataflow shapes mapped to real Dataset operators
(SURVEY.md §2.6): projection/parse -> map_batches, filter -> vectorized
predicate, lookup join -> broadcast dict (ray.put once, read per actor),
ordered aggregation -> groupby().aggregate, dedup-by-key ->
groupby().map_groups(first), sort/top-k -> sort().limit.

Every function takes ``sf_dir`` and returns a Dataset (or small pandas
frame); each has a DuckDB oracle in ``__ray_entry__.oracle_sql`` with
matching column names.  Aggregates over doubles are rounded on both sides
so order-of-summation float noise cannot flip the value hash.

Scale notes: all reads are column-pruned; joins where one side is small
(customer, part, nation, region at any sf) broadcast via ``ray.put`` instead
of shuffling the big side; the only all-to-all exchanges are the final
groupbys over already-reduced rows.
"""
from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .frames import typed_collect
from .textops import warm_factory, warm_stage


def _read(sf_dir: str, table: str, columns=None, rows_per_block: int = None):
    import ray.data as rd

    kwargs = {}
    if rows_per_block:
        # size blocks by DATA VOLUME, not CPU count: Ray's default splits a
        # small table into ~2xCPU slivers, and a downstream sort-shuffle
        # then pays an O(blocks^2) task grid for no reduction gain.  Row
        # count from the parquet footer — no data read.  At 1000x the data
        # this yields 1000x the blocks: the combiner stage keeps reducing
        # per block and the shuffle grid grows with data, as it should.
        import pyarrow.parquet as pq

        n_rows = pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows
        kwargs["override_num_blocks"] = max(1, -(-n_rows // rows_per_block))
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns, **kwargs)


def round_half_away(x, nd: int):
    """DuckDB-ROUND-parity rounding: ties go AWAY from zero, like the
    std::round DuckDB applies to the scaled double — numpy/pandas round
    is banker's (ties to even), and the two diverge EXACTLY on .xx5 ties,
    which clean decimal/binary-grid data does hit (found by the
    hostile-events harness: a 1/64-grid value sum of 33.125 rounded to
    33.12 here and 33.13 in the oracle).  Identical to np.round
    everywhere except exact ties on the scaled double, where the
    away-from-zero branch replays DuckDB; near-ties (inexact products
    like 1.005 * 100 = 100.4999…) take np.round's correctly-rounded
    path, which is also what std::round returns there."""
    import numpy as np

    p = 10.0 ** nd
    t = np.asarray(x, dtype=np.float64) * p
    fl = np.floor(t)
    tie = (t - fl) == 0.5
    return np.where(tie, np.where(t >= 0.0, fl + 1.0, fl), np.round(t)) / p


def _round_cols(df, spec: dict):
    for col, nd in spec.items():
        df[col] = round_half_away(df[col].to_numpy(), nd)
    return df



# warm-task-pool forms of the broadcast-lookup stages (module-level so
# `textops.warm_stage` can key them; actor-pool startup measured dominant
# for these sub-second lookups)
class _SegmentRollup:
    def __init__(self, lookup_ref):
        import ray

        keys, values = ray.get(lookup_ref)
        self.keys = pa.array(keys)
        self.values = pa.array(values, pa.string())

    def __call__(self, t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("o_custkey"), value_set=self.keys)
        # INNER-join semantics: a dangling foreign key misses the lookup
        # (null index) and must be DROPPED, not grouped under a null
        # segment (crashed the groupby sort — hostile-star harness find)
        keep = pc.is_valid(idx)
        t, idx = t.filter(keep), idx.filter(keep)
        # combiner: reduce the batch to one row per segment BEFORE the
        # shuffle — the groupby then exchanges a handful of partial rows
        # per block instead of every order
        tt = pa.table(
            {
                "c_mktsegment": pc.take(self.values, idx),
                "revenue": t.column("o_totalprice"),
                "n_orders": pa.array([1] * len(t), pa.int64()),
            }
        )
        g = tt.group_by("c_mktsegment").aggregate(
            [("revenue", "sum"), ("n_orders", "sum")]
        )
        return g.rename_columns(["c_mktsegment", "revenue", "n_orders"])


class _ValueLookup:
    """Generic broadcast (key -> value) projection: index_in + take."""

    def __init__(self, lookup_ref, key_col, value_name, keep_cols=()):
        import ray

        keys, values = ray.get(lookup_ref)
        self.keys = pa.array(keys)
        self.values = pa.array(values, pa.string())
        self.key_col = key_col
        self.value_name = value_name
        self.keep_cols = keep_cols

    def __call__(self, t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column(self.key_col), value_set=self.keys)
        # INNER-join semantics: drop dangling keys (see _SegmentRollup)
        keep = pc.is_valid(idx)
        t, idx = t.filter(keep), idx.filter(keep)
        cols = {self.value_name: pc.take(self.values, idx)}
        for c in self.keep_cols:
            cols[c] = t.column(c)
        return pa.table(cols)


class _Membership:
    """Broadcast semi-join filter: keep rows whose key is in the set."""

    def __init__(self, keys_ref, key_col):
        import ray

        self.keys = pa.array(ray.get(keys_ref))
        self.key_col = key_col

    def __call__(self, t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(self.key_col), value_set=self.keys))


def _user_bucket(users, n_buckets: int):
    """Hash-bucket int64 user ids.  The uint64 cast is load-bearing: an
    int64 array times a uint64 SCALAR silently promotes to float64 in
    numpy, rounding every product onto coarse multiples and collapsing all
    users into bucket 0 (one worker got the whole table) — pinned by
    tests/test_textops_ray.py::test_user_bucketize_actually_distributes."""
    import numpy as np

    return (
        users.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    ) % n_buckets


def _topk(ds, k: int, keys, descending, empty_schema=None) -> pd.DataFrame:
    """Distributed top-k WITHOUT a global sort.

    `sort().limit(k)` in Ray Data is a full range shuffle of the input even
    when k is tiny — the limit is not pushed below the sort.  Here every
    batch keeps only its local top k (one vectorized Arrow sort over an
    in-memory batch), so at most k rows per block reach the driver, which
    merges the survivors.  `keys` must be a TOTAL order (include tiebreak
    columns) for the result to be deterministic; this is the same
    local-top-k + driver-merge shape s_knn_bruteforce uses."""
    order = [
        (c, "descending" if d else "ascending") for c, d in zip(keys, descending)
    ]

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        return t.take(pc.sort_indices(t, sort_keys=order)[:k])

    mapped = ds.map_batches(local_topk, batch_format="pyarrow")
    small = mapped.to_pandas()
    if len(small.columns) == 0:
        # a predicate that matches NOTHING leaves only empty blocks, which
        # Ray drops from the collect (and may lose the schema entirely) —
        # rebuild the typed empty frame instead of KeyError'ing in the
        # sort (found by the hostile-lineitem harness)
        sch = mapped.schema()
        arrow = sch.base_schema if sch is not None else empty_schema
        if arrow is None:
            raise ValueError(
                "_topk over a fully-empty unschema'd stream: pass empty_schema"
            )
        small = arrow.empty_table().to_pandas()
    asc = [not d for d in descending]
    return (
        small.sort_values(list(keys), ascending=asc)
        .head(k)
        .reset_index(drop=True)
    )


# ----------------------------------------------------------------------
def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: grouped pricing summary over lineitem."""
    ds = _read(
        sf_dir,
        "lineitem",
        [
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        ],
    )

    def partial(t: pa.Table) -> pa.Table:
        # combiner: reduce the batch to one row per (flag, status) BEFORE the
        # shuffle — the groupby then exchanges a handful of partial rows per
        # block instead of every lineitem
        disc = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
        )
        charge = pc.multiply(disc, pc.add(pa.scalar(1.0), t.column("l_tax")))
        tt = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": t.column("l_quantity"),
                "sum_base_price": t.column("l_extendedprice"),
                "sum_disc_price": disc,
                "sum_charge": charge,
                "sum_disc": t.column("l_discount"),
                "count_order": pa.array([1] * len(t), pa.int64()),
            }
        )
        g = tt.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("sum_qty", "sum"),
                ("sum_base_price", "sum"),
                ("sum_disc_price", "sum"),
                ("sum_charge", "sum"),
                ("sum_disc", "sum"),
                ("count_order", "sum"),
            ]
        )
        return g.rename_columns(
            [
                "l_returnflag",
                "l_linestatus",
                "sum_qty",
                "sum_base_price",
                "sum_disc_price",
                "sum_charge",
                "sum_disc",
                "count_order",
            ]
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("sum_charge", alias_name="sum_charge"),
            Sum("sum_disc", alias_name="sum_disc"),
            Sum("count_order", alias_name="count_order"),
        )
    )
    df = typed_collect(
        out,
        pa.schema(
            [
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("sum_qty", pa.float64()),
                ("sum_base_price", pa.float64()),
                ("sum_disc_price", pa.float64()),
                ("sum_charge", pa.float64()),
                ("sum_disc", pa.float64()),
                ("count_order", pa.int64()),
            ]
        ),
    )
    df["avg_qty"] = df["sum_qty"] / df["count_order"]
    df["avg_disc"] = df["sum_disc"] / df["count_order"]
    df = df.drop(columns=["sum_disc"])
    return _round_cols(
        df,
        {
            "sum_qty": 2,
            "sum_base_price": 2,
            "sum_disc_price": 2,
            "sum_charge": 2,
            "avg_qty": 4,
            "avg_disc": 4,
        },
    ).sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q_filter_topk(sf_dir: str):
    """Filter + computed column + deterministic top-k (sort is the shuffle)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def project(t: pa.Table) -> pa.Table:
        mask = pc.less(t.column("l_shipdate"), pa.scalar(pa.compute.strptime(
            "1996-07-01", format="%Y-%m-%d", unit="us").as_py()))
        t = t.filter(mask)
        revenue = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
        )
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": t.column("l_linenumber"),
                "revenue": pc.round(revenue, 2, round_mode="half_towards_infinity"),
            }
        )

    return _topk(
        ds.map_batches(project, batch_format="pyarrow"),
        100,
        ["revenue", "l_orderkey", "l_linenumber"],
        [True, False, False],
        empty_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("revenue", pa.float64()),
            ]
        ),
    )


def q_broadcast_join_segment(sf_dir: str):
    """orders x customer via broadcast lookup (no shuffle join): revenue by segment."""
    import ray

    cust = typed_collect(_read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]))
    lookup_ref = ray.put((cust["c_custkey"].to_numpy(), cust["c_mktsegment"].tolist()))

    from ray.data.aggregate import Sum

    out = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(
            warm_stage(_SegmentRollup, lookup_ref=lookup_ref),
            batch_format="pyarrow",
        )
        .groupby("c_mktsegment")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n_orders", alias_name="n_orders"))
    )
    df = typed_collect(
        out,
        pa.schema(
            [
                ("c_mktsegment", pa.string()),
                ("revenue", pa.float64()),
                ("n_orders", pa.int64()),
            ]
        ),
    )
    return _round_cols(df, {"revenue": 2}).sort_values("c_mktsegment").reset_index(drop=True)


def q_hash_join_brand(sf_dir: str):
    """lineitem x part with Dataset.join (hash shuffle): quantity by brand."""
    # 100k rows/block: the join's ingest cost tracks block COUNT (per-block
    # hash/partition passes), so data-sized blocks beat CPU-count slivers
    # (measured ~25% at sf0.1); the partition count derives from the SAME
    # footer row count — data-proportional with a cluster-derived slot
    # floor, not a node-tuned constant (sizing.shuffle_partitions)
    import pyarrow.parquet as pq

    from .sizing import shuffle_partitions

    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    li = _join_pad(
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"], rows_per_block=100_000),
        pa.schema([("l_partkey", pa.int64()), ("l_quantity", pa.float64())]),
    )
    part = _join_pad(
        _read(sf_dir, "part", ["p_partkey", "p_brand"]),
        pa.schema([("p_partkey", pa.int64()), ("p_brand", pa.string())]),
    )
    joined = li.join(
        part,
        join_type="inner",
        num_partitions=shuffle_partitions(n_li),
        on=("l_partkey",),
        right_on=("p_partkey",),
    )
    from ray.data.aggregate import Sum

    def combine(t: pa.Table) -> pa.Table:
        # combiner: collapse each joined block to one row per brand before
        # the final shuffle
        tt = pa.table(
            {
                "p_brand": t.column("p_brand"),
                "sum_qty": t.column("l_quantity"),
                "n_rows": pa.array([1] * len(t), pa.int64()),
            }
        )
        g = tt.group_by("p_brand").aggregate([("sum_qty", "sum"), ("n_rows", "sum")])
        return g.rename_columns(["p_brand", "sum_qty", "n_rows"])

    out = joined.map_batches(combine, batch_format="pyarrow").groupby("p_brand").aggregate(
        Sum("sum_qty", alias_name="sum_qty"), Sum("n_rows", alias_name="n_rows")
    )
    df = typed_collect(
        out,
        pa.schema(
            [("p_brand", pa.string()), ("sum_qty", pa.float64()), ("n_rows", pa.int64())]
        ),
    )
    return _round_cols(df, {"sum_qty": 2}).sort_values("p_brand").reset_index(drop=True)


def q_nation_region(sf_dir: str):
    """Small-side chain join nation -> region, counting nations per region."""
    import ray

    region = typed_collect(_read(sf_dir, "region", ["r_regionkey", "r_name"]))
    lookup_ref = ray.put((region["r_regionkey"].to_numpy(), region["r_name"].tolist()))

    from ray.data.aggregate import Count

    out = (
        _read(sf_dir, "nation", ["n_regionkey"])
        .map_batches(
            warm_stage(_ValueLookup, lookup_ref=lookup_ref, key_col="n_regionkey", value_name="r_name"),
            batch_format="pyarrow",
        )
        .groupby("r_name")
        .aggregate(Count(alias_name="n_nations"))
    )
    return (
        typed_collect(
            out, pa.schema([("r_name", pa.string()), ("n_nations", pa.int64())])
        )
        .sort_values("r_name")
        .reset_index(drop=True)
    )


def q_events_rollup(sf_dir: str):
    """events by type: count, rounded mean value, distinct users.

    ONE input pass: the per-batch combiner reduces to one row per
    (event_type, user_id), the first shuffle merges those partials (so no
    task ever holds a per-key user set — a skewed event_type would put the
    whole user universe in one combiner's memory otherwise), and the second
    shuffle over the distinct pairs yields events/value/user counts per
    type simultaneously."""
    from ray.data.aggregate import Sum

    # 12.5k rows/block: each combiner block still reduces (more rows than
    # distinct (type,user) keys) and the two-shuffle grid stays proportional
    # to data volume (measured 3-4s -> ~1.3s at sf0.1 vs CPU-count splits)
    ds = _read(
        sf_dir, "events", ["event_type", "user_id", "value"], rows_per_block=12_500
    )

    def partial(t: pa.Table) -> pa.Table:
        # combiner: one row per (event_type, user_id) per batch.  Row count
        # and non-null value count are carried SEPARATELY so NULL values
        # reproduce SQL semantics exactly (COUNT(*) counts rows, AVG skips
        # nulls in numerator AND denominator)
        t = t.append_column("one", pa.array([1] * len(t), pa.int64()))
        g = t.group_by(["event_type", "user_id"]).aggregate(
            [("value", "sum"), ("value", "count"), ("one", "sum")]
        )
        return g.rename_columns(
            ["event_type", "user_id", "sum_value", "n_vals", "n_rows"]
        )

    def per_type(t: pa.Table) -> pa.Table:
        # rows here are globally-distinct (event_type, user_id) partials
        g = (
            t.append_column("one", pa.array([1] * len(t), pa.int64()))
            .group_by("event_type")
            .aggregate(
                [("sum_value", "sum"), ("n_vals", "sum"), ("n_rows", "sum"), ("one", "sum")]
            )
        )
        return g.rename_columns(
            ["event_type", "sum_value", "n_vals", "n_events", "n_users"]
        )

    df = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(
            Sum("sum_value", alias_name="sum_value"),
            Sum("n_vals", alias_name="n_vals"),
            Sum("n_rows", alias_name="n_rows"),
        )
        .map_batches(per_type, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("sum_value", alias_name="sum_value"),
            Sum("n_vals", alias_name="n_vals"),
            Sum("n_events", alias_name="n_events"),
            Sum("n_users", alias_name="n_users"),
        )
    )
    df = typed_collect(
        df,
        pa.schema(
            [
                ("event_type", pa.string()),
                ("sum_value", pa.float64()),
                ("n_vals", pa.int64()),
                ("n_events", pa.int64()),
                ("n_users", pa.int64()),
            ]
        ),
    )
    df["avg_value"] = round_half_away((df["sum_value"] / df["n_vals"]).to_numpy(), 4)
    df = df[["event_type", "n_events", "avg_value", "n_users"]]
    return df.sort_values("event_type").reset_index(drop=True)


def q_distinct_flags(sf_dir: str):
    """Distinct (returnflag, linestatus) pairs — pre-dedup per batch, then global."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])

    def local_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate([])

    from ray.data.aggregate import Count

    # native aggregate instead of map_groups(head): the count column exists
    # only to drive the grouped reduction and is dropped
    out = (
        ds.map_batches(local_distinct, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(alias_name="_n"))
    )
    return (
        typed_collect(
            out,
            pa.schema(
                [
                    ("l_returnflag", pa.string()),
                    ("l_linestatus", pa.string()),
                    ("_n", pa.int64()),
                ]
            ),
        )
        .drop(columns=["_n"])
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )


def q_orders_topk(sf_dir: str):
    """Top 10 orders by totalprice — per-block local top-k, no global sort."""
    return _topk(
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderpriority"]),
        10,
        ["o_totalprice", "o_orderkey"],
        [True, False],
        empty_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_totalprice", pa.float64()),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )


def q_supplier_nation(sf_dir: str):
    """supplier -> nation broadcast join: account balance rollup per nation."""
    import ray

    nation = typed_collect(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    lookup_ref = ray.put((nation["n_nationkey"].to_numpy(), nation["n_name"].tolist()))

    from ray.data.aggregate import Count, Sum

    out = (
        _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
        .map_batches(
            warm_stage(_ValueLookup, lookup_ref=lookup_ref, key_col="s_nationkey", value_name="n_name", keep_cols=("s_acctbal",)),
            batch_format="pyarrow",
        )
        .groupby("n_name")
        .aggregate(Count(alias_name="n_suppliers"), Sum("s_acctbal", alias_name="total_acctbal"))
    )
    df = typed_collect(
        out,
        pa.schema(
            [
                ("n_name", pa.string()),
                ("n_suppliers", pa.int64()),
                ("total_acctbal", pa.float64()),
            ]
        ),
    )
    return _round_cols(df, {"total_acctbal": 2}).sort_values("n_name").reset_index(drop=True)


def q_events_json(sf_dir: str):
    """Semi-structured projection: parse the props JSON column, bucket its
    'k' value, roll up per (event_type, bucket)."""
    ds = _read(sf_dir, "events", ["event_type", "props", "value"])

    def project(t: pa.Table) -> pa.Table:
        # vectorized field extract (Arrow RE2) for the overwhelmingly-common
        # flat encoding; rows the pattern misses (nested/escaped forms) fall
        # back to an exact per-row json.loads — no Arrow JSON kernel exists
        import numpy as np

        props = t.column("props")
        m = pc.extract_regex(props, r'"k"\s*:\s*(?P<k>-?\d+)')
        ks = pc.cast(pc.struct_field(m, "k"), pa.int64())
        if ks.null_count:
            import json

            vals = ks.combine_chunks().to_numpy(zero_copy_only=False)
            raw = props.to_pylist()
            ks = pa.array(
                [
                    int(json.loads(raw[i])["k"]) if v is None else int(v)
                    for i, v in enumerate(vals)
                ],
                pa.int64(),
            )
        buckets = np.floor_divide(
            ks.combine_chunks().to_numpy() if isinstance(ks, pa.ChunkedArray) else ks.to_numpy(),
            10,
        )
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "k_bucket": pa.array(buckets, pa.int64()),
                "value": t.column("value"),
            }
        )

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(["event_type", "k_bucket"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    df = typed_collect(
        out,
        pa.schema(
            [
                ("event_type", pa.string()),
                ("k_bucket", pa.int64()),
                ("n_events", pa.int64()),
                ("sum_value", pa.float64()),
            ]
        ),
    )
    return (
        _round_cols(df, {"sum_value": 2})
        .sort_values(["event_type", "k_bucket"])
        .reset_index(drop=True)
    )


def q_semi_join_big_customers(sf_dir: str):
    """Semi-join via broadcast key set: customers with any order above 400k.

    The qualifying key set is reduced first (small side), broadcast with
    ray.put, and applied as a vectorized membership filter — no shuffle of
    the filtered side (the guide's semi/anti-join pattern)."""
    import ray

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def big_keys(t: pa.Table) -> pa.Table:
        mask = pc.greater(t.column("o_totalprice"), pa.scalar(400_000.0))
        return pa.table({"o_custkey": t.filter(mask).column("o_custkey")})

    keys = (
        typed_collect(
            orders.map_batches(big_keys, batch_format="pyarrow"),
            pa.schema([("o_custkey", pa.int64())]),
        )["o_custkey"]
        .unique()
    )
    keys_ref = ray.put(keys)

    out = (
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
        .map_batches(
            warm_stage(_Membership, keys_ref=keys_ref, key_col="c_custkey"),
            batch_format="pyarrow",
        )
    )
    df = typed_collect(
        out,
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_acctbal", pa.float64()),
            ]
        ),
    )
    return _round_cols(df, {"c_acctbal": 2}).sort_values("c_custkey").reset_index(drop=True)


class _NonMembership:
    """Broadcast ANTI-join filter: keep rows whose key is NOT in the set."""

    def __init__(self, keys_ref, key_col):
        import ray

        self.keys = pa.array(ray.get(keys_ref))
        self.key_col = key_col

    def __call__(self, t: pa.Table) -> pa.Table:
        return t.filter(
            pc.invert(pc.is_in(t.column(self.key_col), value_set=self.keys))
        )


def q_anti_join_quiet_customers(sf_dir: str):
    """ANTI-join via broadcast key set: customers with NO order in 1997 —
    the semi-join's complement, same zero-shuffle shape (the key set is
    combiner-reduced, broadcast once, applied as a vectorized NOT-IN
    filter; the probe side streams)."""
    import ray

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    lo = pa.scalar(
        pc.strptime("1997-01-01", format="%Y-%m-%d", unit="us").as_py()
    )
    hi = pa.scalar(
        pc.strptime("1998-01-01", format="%Y-%m-%d", unit="us").as_py()
    )

    def keys_1997(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        mask = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        return pa.table({"o_custkey": t.filter(mask).column("o_custkey")})

    keys = (
        typed_collect(
            orders.map_batches(keys_1997, batch_format="pyarrow"),
            pa.schema([("o_custkey", pa.int64())]),
        )["o_custkey"]
        .unique()
    )
    keys_ref = ray.put(keys)

    out = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"]).map_batches(
        warm_stage(_NonMembership, keys_ref=keys_ref, key_col="c_custkey"),
        batch_format="pyarrow",
    )
    df = typed_collect(
        out,
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_acctbal", pa.float64()),
            ]
        ),
    )
    return (
        _round_cols(df, {"c_acctbal": 2})
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )


def q_events_window(sf_dir: str):
    """Tumbling 1-hour event-time windows per event type (custom windowed
    aggregate: Ray Data has no native windows — expressed as a projection to
    the window key + grouped aggregate, the documented partitioning pattern)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def project(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t.column("ts"), pa.int64())  # microseconds
        hour = pc.divide(epoch, 3_600_000_000)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "window_hour": pc.cast(hour, pa.int64()),
                "value": t.column("value"),
            }
        )

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(["event_type", "window_hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    df = typed_collect(
        out,
        pa.schema(
            [
                ("event_type", pa.string()),
                ("window_hour", pa.int64()),
                ("n_events", pa.int64()),
                ("sum_value", pa.float64()),
            ]
        ),
    )
    return (
        _round_cols(df, {"sum_value": 2})
        .sort_values(["event_type", "window_hour"])
        .reset_index(drop=True)
    )


def q_top_order_per_customer(sf_dir: str):
    """Per-group top-1 (argmax): each customer's most expensive order.

    Order-preserving packing turns the argmax into a NATIVE Max aggregate:
    (price desc, orderkey asc) maps to one int64
    ``price_cents * 10^7 + (10^7 - 1 - orderkey)`` — the batch combiner reduces
    each block to one packed row per customer, the single shuffle carries
    those partials, and no per-group Python ever runs (the previous
    groupby().map_groups cost ~1 ms of pandas per group).  The packing is
    validated per batch: prices must be exact cents and orderkeys in range,
    else the batch falls back is not needed for TPC-H-shaped data — it
    raises loudly instead of silently mis-ranking."""
    import numpy as np

    # data-sized blocks: with ~10 orders/customer the per-block combiner
    # only reduces when blocks hold many customers; CPU-count slivers would
    # barely reduce and pay a 2xCPU-wide sort-shuffle grid
    ds = _read(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"],
        rows_per_block=50_000,
    )
    M = 10_000_000  # > max orderkey at any supported sf

    def partial(t: pa.Table) -> pa.Table:
        price = t.column("o_totalprice").to_numpy()
        okey = t.column("o_orderkey").to_numpy()
        cents = np.rint(price * 100).astype(np.int64)
        if not np.allclose(cents / 100.0, price, rtol=0, atol=0):
            raise ValueError("o_totalprice is not exact cents; packing invalid")
        if okey.max(initial=0) >= M or okey.min(initial=0) < 0:
            raise ValueError("o_orderkey outside the packing modulus")
        # M - 1 - okey stays strictly inside [0, M): `M - okey` would wrap
        # orderkey 0 into the cents slot, corrupting BOTH decoded columns
        # (caught by the hostile-star harness's order 0 becoming a
        # customer's top order)
        packed = cents * M + (M - 1 - okey)
        tt = pa.table(
            {"o_custkey": t.column("o_custkey"), "packed": pa.array(packed, pa.int64())}
        )
        g = tt.group_by("o_custkey").aggregate([("packed", "max")])
        return g.rename_columns(["o_custkey", "packed"])

    from ray.data.aggregate import Max

    out = typed_collect(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Max("packed", alias_name="packed")),
        pa.schema([("o_custkey", pa.int64()), ("packed", pa.int64())]),
    )
    out["o_orderkey"] = (M - 1 - (out["packed"] % M)).astype("int64")
    out["o_totalprice"] = (out["packed"] // M) / 100.0
    out = out.drop(columns=["packed"])
    return out.sort_values("o_custkey").reset_index(drop=True)


def q_asof_attribution(sf_dir: str):
    """As-of join (custom operator — Ray Data has no native as-of): attribute
    each purchase event to the user's most recent prior click.

    Expressed as filter -> bucketize by hash(user) -> groupby(bucket) with
    ONE vectorized pandas.merge_asof per bucket (C-speed over many users at
    once — per-USER map_groups paid ~1 ms of Python per group).  Sorting
    clicks by (ts, event_id) makes merge_asof's last-qualifying-row pick
    the greatest (ts, event_id), the engine's pinned tie-break.
    Partitioning assumption (documented): the stream is co-partitioned by
    the join key — the same assumption any distributed as-of join makes;
    the shuffle carries only the two filtered event types.  Oracle: a
    tie-pinned window recomputation in DuckDB."""
    import numpy as np
    import pandas as pd

    ds = _read(
        sf_dir, "events", ["event_id", "ts", "user_id", "event_type"],
        rows_per_block=12_500,
    )
    N_BUCKETS = 64  # groups-per-shuffle-partition dial; users per bucket
    # shrink as the corpus grows only if this is raised with it

    def keep_types(t: pa.Table) -> pa.Table:
        mask = pc.is_in(
            t.column("event_type"), value_set=pa.array(["click", "purchase"])
        )
        t = t.filter(mask)
        bucket = pc.cast(
            pc.bit_wise_and(t.column("user_id"), pa.scalar(N_BUCKETS - 1)),
            pa.int32(),
        )
        return t.append_column("bucket", bucket)

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "purchase_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "click_id": pd.Series(dtype="int64"),
                "gap_us": pd.Series(dtype="int64"),
            }
        )
        clicks = g[g["event_type"] == "click"].sort_values(["ts", "event_id"])
        purch = g[g["event_type"] == "purchase"].sort_values(["ts", "event_id"])
        if len(clicks) == 0 or len(purch) == 0:
            return empty
        merged = pd.merge_asof(
            purch[["event_id", "ts", "user_id"]],
            clicks[["event_id", "ts", "user_id"]].rename(
                columns={"event_id": "click_id", "ts": "click_ts"}
            ),
            left_on="ts",
            right_on="click_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        merged = merged[merged["click_id"].notna()]
        if len(merged) == 0:
            return empty
        gap = (
            merged["ts"].values.astype("datetime64[us]").astype("int64")
            - merged["click_ts"].values.astype("datetime64[us]").astype("int64")
        )
        return pd.DataFrame(
            {
                "purchase_id": merged["event_id"].values,
                "user_id": merged["user_id"].values,
                "click_id": merged["click_id"].values.astype(np.int64),
                "gap_us": gap,
            }
        )

    out = (
        ds.map_batches(keep_types, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(attribute, batch_format="pandas")
    )
    # reachable from REAL data: an events stream with no purchases (or no
    # clicks) leaves every group empty — found by the empty-side probe
    df = typed_collect(
        out,
        pa.schema(
            [
                ("purchase_id", pa.int64()),
                ("user_id", pa.int64()),
                ("click_id", pa.int64()),
                ("gap_us", pa.int64()),
            ]
        ),
    )
    return df.sort_values("purchase_id").reset_index(drop=True)


def q_orders_by_month(sf_dir: str):
    """Temporal rollup: orders per month (strftime projection + groupby)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def project(t: pa.Table) -> pa.Table:
        month = pc.strftime(t.column("o_orderdate"), format="%Y-%m")
        return pa.table({"month": month, "o_totalprice": t.column("o_totalprice")})

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="revenue"))
    )
    df = typed_collect(
        out,
        pa.schema(
            [("month", pa.string()), ("n_orders", pa.int64()), ("revenue", pa.float64())]
        ),
    )
    return _round_cols(df, {"revenue": 2}).sort_values("month").reset_index(drop=True)


SESSION_GAP_HOURS = 4


SESSION_CHUNK_DAYS = 1  # time-range pre-split width (must only be > 0;
# boundary merging is decided on actual boundary timestamps, not width)


def _session_keys(users, ts_us, n_buckets: int, chunk_us: int):
    """(chunk, bucket) shuffle keys for sessionization: hashing (user_id,
    time chunk) instead of user_id alone splits a hot user across chunks —
    uint64 arithmetic throughout (see _user_bucket for the float64 trap)."""
    import numpy as np

    chunk = ts_us // np.int64(chunk_us)
    mixed = users.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + chunk.astype(
        np.uint64
    ) * np.uint64(0xC2B2AE3D27D4EB4F)
    return chunk, (mixed % np.uint64(n_buckets)).astype(np.int64)


def q_sessionize(sf_dir: str, stage_dir: str = None):
    """Gap-based sessionization: events within SESSION_GAP_HOURS of the
    user's previous event share a session; a longer silence starts the
    next one (session ids are 0-based per user).

    Hot-key-safe shuffle key: (user_id, time chunk) — a pathological user
    owning half the corpus is split across per-chunk groups instead of
    landing whole in one worker (the straggler/OOM the plain user-hash
    bucketing had).  Each group sessionizes its (user, chunk) slices with
    ONE vectorized pandas pass; per-(user, chunk) boundary summaries
    (first/last ts, session count — combinable partials, so block splits
    are safe) reduce to the driver, which stitches chunks: the FIRST
    session of a chunk merges with the previous chunk's LAST session iff
    the boundary gap is within SESSION_GAP_HOURS (later sessions of the
    chunk cannot reach back past an in-chunk break, so only the boundary
    pair matters — correct for ANY chunk width).

    Scale shape (round 5): the sessionized event table — O(corpus) rows,
    consumed twice (boundary summaries + id rewrite) — is a PARQUET STAGE
    CHECKPOINT (`staging.stage_checkpoint`), not an object-store
    materialize; with an explicit ``stage_dir`` a crashed run resumes at
    the boundary (default: throwaway /tmp dir removed on exit).  The
    per-(user, chunk) session-id offsets ride a second keyed-shuffle JOIN
    on (user_id, chunk) — narrow rows only, local_sid + offset — instead
    of a driver broadcast, so the offset table never has to fit on one
    node."""
    import os
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from .sizing import shuffle_partitions
    from .staging import stage_checkpoint

    ds = _read(
        sf_dir, "events", ["event_id", "ts", "user_id"], rows_per_block=12_500
    )
    N_BUCKETS = 64
    chunk_us = np.int64(SESSION_CHUNK_DAYS) * 86_400_000_000

    def bucketize(t: pa.Table) -> pa.Table:
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        chunk, bucket = _session_keys(users, ts_us, N_BUCKETS, chunk_us)
        t = t.append_column("chunk", pa.array(chunk, pa.int64()))
        return t.append_column("bucket", pa.array(bucket))

    def sessionize_chunk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "chunk", "ts", "event_id"]).reset_index(
            drop=True
        )
        gap = g["ts"].diff() > np.timedelta64(SESSION_GAP_HOURS, "h")
        same = g["user_id"].eq(g["user_id"].shift()) & g["chunk"].eq(
            g["chunk"].shift()
        )
        brk = (gap & same).astype("int64")
        # rows are sorted, so each (user, chunk) slice is one contiguous run
        run_id = (~same).cumsum()
        g["local_sid"] = brk.groupby(run_id.to_numpy()).cumsum()
        return g[["event_id", "user_id", "chunk", "ts", "local_sid"]]

    own_stage = stage_dir is None
    root = tempfile.mkdtemp(prefix="pdfray_sessionize_") if own_stage else stage_dir
    try:
        sess = stage_checkpoint(
            lambda: ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(sessionize_chunk, batch_format="pandas"),
            os.path.join(root, "sessions"),
            resume=not own_stage,
            allow_empty=True,
        )
        if sess is None:  # empty events table: zero sessions, typed empty
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "session_id": pd.Series([], dtype="int64"),
                }
            )
        return _sessionize_finish(sess, rd, np, pd, shuffle_partitions)
    finally:
        if own_stage:
            shutil.rmtree(root, ignore_errors=True)


def _sessionize_finish(sess, rd, np, pd, shuffle_partitions):
    def summaries(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "chunk"], sort=False)
        out = g.agg(
            first_ts=("ts", "min"),
            last_ts=("ts", "max"),
            n_max=("local_sid", "max"),
        ).reset_index()
        return out

    part = sess.map_batches(summaries, batch_format="pandas").to_pandas()
    s = (
        part.groupby(["user_id", "chunk"], sort=False)
        .agg(
            first_ts=("first_ts", "min"),
            last_ts=("last_ts", "max"),
            n_max=("n_max", "max"),
        )
        .reset_index()
        .sort_values(["user_id", "chunk"])
        .reset_index(drop=True)
    )
    n_sessions = s["n_max"].astype("int64") + 1
    prev_n = (
        n_sessions.groupby(s["user_id"].to_numpy()).shift(1).fillna(0).astype("int64")
    )
    prev_last = s.groupby("user_id")["last_ts"].shift(1)
    merged = (
        (s["first_ts"] - prev_last) <= np.timedelta64(SESSION_GAP_HOURS, "h")
    ).fillna(False)
    s["offset"] = (
        (prev_n - merged.astype("int64")).groupby(s["user_id"].to_numpy()).cumsum()
    )
    # offsets ride a keyed shuffle, not a driver broadcast: join the
    # (user, chunk, offset) table back on the SAME (user_id, chunk) key
    # the sessionize pass shuffled on; the probe side carries only narrow
    # rows (event_id, user_id, chunk, local_sid) — ts never re-shuffles
    off_ds = rd.from_pandas(s[["user_id", "chunk", "offset"]])
    n_parts = shuffle_partitions(sess.count())  # parquet-footer count

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        df["session_id"] = df["local_sid"] + df["offset"].astype("int64")
        return df[["event_id", "user_id", "session_id"]]

    out = (
        sess.select_columns(["event_id", "user_id", "chunk", "local_sid"])
        .join(off_ds, join_type="inner", num_partitions=n_parts, on=("user_id", "chunk"))
        .map_batches(rewrite, batch_format="pandas")
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def q_retention_cohorts(sf_dir: str):
    """Weekly retention cohorts: users grouped by the week of their first
    event; one row per (cohort_week, activity_week) with the distinct-user
    count — the standard growth-analytics rollup.

    Scale shape: ONE shuffle.  Each batch collapses to (user_id, week,
    min-ts-in-batch) partials — at most one row per (user, week) per block,
    never events — and a single groupby(user_id) derives both the cohort
    (the minimum week: week truncation is monotone in ts) and the user's
    distinct activity weeks, emitting (cohort_week, activity_week) pair
    rows.  The final count runs on the driver over those reduced rows
    (|users| x |weeks| at most — the same collect-only-grouped-rows
    pattern as t_length_quantiles).  A first draft used two groupbys plus
    a user join; measured 3x slower for identical output — each extra
    Ray sort-shuffle costs seconds of fixed machinery even on tiny partial
    tables, so shuffle COUNT, not shuffle bytes, dominated.  Weeks are
    Monday-truncated dates (matches DuckDB date_trunc('week'))."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "ts"], rows_per_block=12_500)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].dt.normalize()
        wk = d - pd.to_timedelta(df["ts"].dt.dayofweek, unit="D")
        g = pd.DataFrame({"user_id": df["user_id"], "wk": wk})
        # distinct (user, week) is all downstream needs — the cohort is the
        # MIN week, so no timestamp has to ride the shuffle
        return g.drop_duplicates()

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        weeks = g["wk"].drop_duplicates().sort_values()
        cohort = weeks.iloc[0].strftime("%Y-%m-%d")
        return pd.DataFrame(
            {
                "cohort_week": cohort,
                "activity_week": weeks.dt.strftime("%Y-%m-%d"),
            }
        )

    pairs = typed_collect(
        ds.map_batches(partials, batch_format="pandas")
        .groupby("user_id")
        .map_groups(emit_pairs, batch_format="pandas"),
        pa.schema([("cohort_week", pa.string()), ("activity_week", pa.string())]),
    )  # reduced: one row per (user, active week)
    out = (
        pairs.groupby(["cohort_week", "activity_week"], as_index=False)
        .size()
        .rename(columns={"size": "n_users"})
    )
    out["n_users"] = out["n_users"].astype("int64")
    return (
        out.sort_values(["cohort_week", "activity_week"]).reset_index(drop=True)
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def q_funnel(sf_dir: str):
    """Ordered conversion funnel (view -> click -> purchase): a user
    completes step i+1 with their first step-(i+1) event STRICTLY after
    their first qualifying step-i event (the deterministic greedy
    earliest-path definition).  Output: one row per step with the number
    of users reaching it.

    Same single-shuffle bucketize shape as q_sessionize: the exchange
    carries (user_id, event_type, ts) for the three funnel types only, and
    each bucket resolves all its users with VECTORIZED pandas merges
    (per-user min, filter-later-than, min again) — no per-user Python.
    The driver adds up one row per (bucket, step)."""
    import numpy as np
    import pandas as pd

    ds = _read(
        sf_dir, "events", ["user_id", "ts", "event_type"], rows_per_block=12_500
    )
    N_BUCKETS = 64

    def keep_and_bucket(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t.column("event_type"), value_set=pa.array(FUNNEL_STEPS))
        t = t.filter(mask)
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        bucket = _user_bucket(users, N_BUCKETS)
        return t.append_column("bucket", pa.array(bucket.astype(np.int64)))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # earliest qualifying ts per user, step by step — all vectorized
        frontier = (
            g[g["event_type"] == FUNNEL_STEPS[0]]
            .groupby("user_id")["ts"]
            .min()
        )
        counts = [len(frontier)]
        for step in FUNNEL_STEPS[1:]:
            ev = g[g["event_type"] == step][["user_id", "ts"]]
            # plain column merge: a named-index merge propagates the index
            # name and makes 'user_id' ambiguous in the next groupby
            prev = frontier.rename("prev").reset_index()
            ev = ev.merge(prev, on="user_id")
            frontier = ev[ev["ts"] > ev["prev"]].groupby("user_id")["ts"].min()
            counts.append(len(frontier))
        return pd.DataFrame(
            {
                "step_idx": pd.array(range(1, len(FUNNEL_STEPS) + 1), "int64"),
                "step": list(FUNNEL_STEPS),
                "n_users": pd.array(counts, "int64"),
            }
        )

    per_bucket = (
        ds.map_batches(keep_and_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
        .to_pandas()  # one row per (bucket, step): reduced
    )
    if len(per_bucket) == 0:  # no funnel-type events at all: zero rows per
        # step, matching the oracle's always-3-row output
        return pd.DataFrame(
            {
                "step_idx": pd.array(range(1, len(FUNNEL_STEPS) + 1), "int64"),
                "step": list(FUNNEL_STEPS),
                "n_users": pd.array([0] * len(FUNNEL_STEPS), "int64"),
            }
        )
    out = (
        per_bucket.groupby(["step_idx", "step"], as_index=False)["n_users"]
        .sum()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("step_idx").reset_index(drop=True)


ROLLING_DAYS = 7


def q_rolling_revenue(sf_dir: str):
    """Daily purchase revenue with a 7-day trailing-window sum (current day
    + 6 preceding calendar days) — the rolling-metric dashboard primitive.

    Scale shape: the corpus collapses to one (day, revenue, n) row per
    block inside map_batches, one combiner groupby reduces to |days| rows,
    and the driver computes the rolling window over that tiny frame (a
    window function over grouped output, not over events).  Revenue is
    rounded to 2 decimals on both sides."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "events", ["ts", "event_type", "value"], rows_per_block=12_500
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == "purchase"]
        day = df["ts"].dt.normalize()
        g = pd.DataFrame({"day": day, "revenue": df["value"]}).groupby(
            "day", as_index=False
        )
        out = g.sum()
        out["n_purchases"] = g.size()["size"].astype("int64")
        out["day"] = out["day"].dt.strftime("%Y-%m-%d")
        return out

    daily = (
        typed_collect(
            ds.map_batches(partial, batch_format="pandas")
            .groupby("day")
            .aggregate(
                Sum("revenue", alias_name="revenue"),
                Sum("n_purchases", alias_name="n_purchases"),
            ),
            pa.schema(
                [
                    ("day", pa.string()),
                    ("revenue", pa.float64()),
                    ("n_purchases", pa.int64()),
                ]
            ),
        )
        .sort_values("day")
        .reset_index(drop=True)
    )
    dt = pd.to_datetime(daily["day"])
    rev = daily["revenue"].to_numpy(np.float64)
    rolling = np.empty(len(daily))
    for i in range(len(daily)):  # |days| rows: driver-side window is fine
        lo = dt[i] - pd.Timedelta(days=ROLLING_DAYS - 1)
        mask = (dt >= lo) & (dt <= dt[i])
        rolling[i] = rev[mask.to_numpy()].sum()
    daily["revenue"] = round_half_away(daily["revenue"].to_numpy(), 2)
    daily["rolling_7d"] = round_half_away(rolling, 2)
    daily["n_purchases"] = daily["n_purchases"].astype("int64")
    return daily


# ----------------------------------------------------------------------
# distributed RANGE JOIN with an equi prefix — the one custom-join shape
# (after the as-of join) a Dataset API has no native operator for.
# Engine-added; no reference analog (the reference's joins are doc-local
# dictionary lookups, Tokeniser.cs object resolution).

RANGE_JOIN_WINDOW_MIN = 60  # purchase must follow the view within this


def q_range_join_view_purchase(sf_dir: str):
    """All (view, purchase) event pairs of the SAME user where the
    purchase strictly follows the view within RANGE_JOIN_WINDOW_MIN
    minutes: an equi-prefix (user_id) + band-predicate (0 < dt <= W)
    range join — the attribution-pair shape every funnel/uplift pipeline
    needs and no Dataset join type expresses.

    Distributed shape: band replication.  Events shuffle on hot-key-safe
    (user_id, time-chunk) keys with chunk width == the join window, so a
    matching pair can span at most one chunk boundary; PURCHASES are
    replicated into their own chunk and the previous one (2x the narrow
    purchase rows — event_id/user/ts/side only, never a wide row), views
    ship once.  Each (user, chunk) group then holds every purchase its
    views can reach, each candidate pair exists in EXACTLY one group (the
    view's own chunk), and the in-group match is one vectorized
    searchsorted over composite (group, chunk-relative ts) keys — no
    per-pair Python, no per-user blowup (a hot user splits across chunks,
    the same guarantee q_sessionize's keys give).  The chunk-RELATIVE
    offset keeps every composite < n_groups * 3W, so the int64 key cannot
    overflow at any corpus size; bucket count derives from the footer row
    count (`sizing.shuffle_partitions`), not a node-tuned constant.  A
    general window W replicates ceil(W/chunk_width) + 1 copies; width ==
    W pins that at 2.

    The driver-facing result is the full pair table (small: pairs are
    conversion events); at production scale the same plan ends in a
    `write_parquet` or feeds the next stage as a Dataset."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from .sizing import shuffle_partitions

    w_us = np.int64(RANGE_JOIN_WINDOW_MIN) * 60_000_000
    n_rows = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    n_buckets = shuffle_partitions(n_rows)

    def emit(t: pa.Table) -> pa.Table:
        ety = t.column("event_type")
        t = t.filter(pc.is_in(ety, value_set=pa.array(["view", "purchase"])))
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        side = pc.equal(t.column("event_type"), pa.scalar("purchase")).to_numpy(
            zero_copy_only=False
        )
        chunk = ts_us // w_us
        # purchases additionally land in the PREVIOUS chunk so a view late
        # in chunk c reaches purchases early in chunk c+1
        out_ids = np.concatenate([ids, ids[side]])
        out_users = np.concatenate([users, users[side]])
        out_ts = np.concatenate([ts_us, ts_us[side]])
        out_side = np.concatenate([side, side[side]])
        out_chunk = np.concatenate([chunk, chunk[side] - 1])
        mixed = out_users.astype(np.uint64) * np.uint64(
            0x9E3779B97F4A7C15
        ) + out_chunk.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
        bucket = (mixed % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "event_id": pa.array(out_ids, pa.int64()),
                "user_id": pa.array(out_users, pa.int64()),
                "ts_us": pa.array(out_ts, pa.int64()),
                "side": pa.array(out_side, pa.bool_()),
                "chunk": pa.array(out_chunk, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    empty = pd.DataFrame(
        {
            "view_id": pd.Series(dtype="int64"),
            "purchase_id": pd.Series(dtype="int64"),
        }
    )

    def match(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "chunk", "ts_us", "event_id"])
        users = g["user_id"].to_numpy()
        chunk = g["chunk"].to_numpy()
        ts = g["ts_us"].to_numpy()
        side = g["side"].to_numpy()
        ids = g["event_id"].to_numpy()
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = (users[1:] != users[:-1]) | (chunk[1:] != chunk[:-1])
        gid = np.cumsum(new) - 1
        # chunk-relative offset: primary rows in [0, W), replicas in
        # [W, 2W) — composite stays < n_groups * 3W, overflow-proof
        ts_rel = ts - chunk * w_us
        big = 3 * w_us + 2
        comp = gid * big + ts_rel
        comp_p = comp[side]  # sorted: gid asc, ts asc within gid
        p_ids = ids[side]
        v_mask = ~side
        lo = np.searchsorted(comp_p, comp[v_mask], side="right")  # ts_p > ts_v
        hi = np.searchsorted(comp_p, comp[v_mask] + w_us, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty
        starts = np.repeat(lo, counts)
        offsets = np.arange(total) - np.repeat(counts.cumsum() - counts, counts)
        return pd.DataFrame(
            {
                "view_id": np.repeat(ids[v_mask], counts),
                "purchase_id": p_ids[starts + offsets],
            }
        )

    pairs = (
        _read(
            sf_dir,
            "events",
            ["event_id", "ts", "user_id", "event_type"],
            rows_per_block=12_500,
        )
        .map_batches(emit, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(match, batch_format="pandas")
        .to_pandas()
    )
    if len(pairs) == 0:
        # every group returned empty: Ray drops all-empty blocks and the
        # collected frame loses the output schema — restate the contract
        return empty
    return pairs.sort_values(["view_id", "purchase_id"]).reset_index(drop=True)


# pivot: fixed event-type vocabulary -> one count column per type.  The
# per-batch combiner collapses each block to <= |users in block| rows
# before the ONE small groupby, so the shuffle carries user-count rows of
# five ints regardless of corpus size.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


PIVOT_DRIVER_MAX_ROWS = 2_000_000  # below this the partial table is driver-sized


def q_pivot_event_matrix(sf_dir: str):
    """Per-user event-type count matrix (PIVOT): one row per user, one
    int64 column per event type.  The long->wide pivot is a combiner
    aggregation, not a shuffle of the long table: each batch pre-reduces
    to per-user partial counts (vectorized crosstab), so what leaves the
    map stage is O(users x blocks) narrow rows, never O(events).

    Final merge is two-regime (the q_retention_cohorts lesson: Ray's
    sort-shuffle Aggregate pays seconds of fixed machinery PER AGGREGATE
    COLUMN even on a 12k-row input — measured 3 s for one Sum, 7 s for
    five, vs 15 ms to collect the partials): a driver-sized partial table
    (< PIVOT_DRIVER_MAX_ROWS) merges with one vectorized pandas groupby
    on the driver; above the bound — a genuinely huge user universe — the
    same partials flow through the distributed groupby instead.  The
    materialize in between holds only the combiner-reduced table, never
    corpus-order rows."""
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "event_type"], rows_per_block=12_500)
    cols = [f"n_{t}" for t in EVENT_TYPES]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.crosstab(df["user_id"], df["event_type"])
        out = out.reindex(columns=list(EVENT_TYPES), fill_value=0).astype("int64")
        out.columns = cols
        return out.reset_index()

    parts = ds.map_batches(partial, batch_format="pandas").materialize()
    if parts.count() <= PIVOT_DRIVER_MAX_ROWS:
        wide = typed_collect(
            parts,
            pa.schema(
                [("user_id", pa.int64())] + [(c, pa.int64()) for c in cols]
            ),
        ).groupby("user_id", as_index=False)[cols].sum()
    else:
        wide = (
            parts.groupby("user_id")
            .aggregate(*[Sum(c, alias_name=c) for c in cols])
            .to_pandas()
        )
    for c in cols:
        wide[c] = wide[c].astype("int64")
    return wide.sort_values("user_id").reset_index(drop=True)


# ----------------------------------------------------------------------
# sketch / scale-pattern operators (engine-added; no reference analog —
# the reference's dataflow never needs cardinality estimation or a
# bloom-pruned join, but a 100 TB corpus job does).

HLL_P = 12  # 2^12 = 4096 registers (~1.6% relative error)
HLL_M = 1 << HLL_P
# rho window width: classic 32-bit HLL tail taken from the bits above the
# bucket index, so bucket and window never overlap
HLL_WBITS = 32


def _hll_partial(df, key, group_col):
    """Per-batch HLL register partial: one row per (group, bucket) with the
    max rho seen in the batch — at most |groups| x 4096 rows leave the map
    stage per block, independent of row count.  The hash is md5-lower-64
    (little-endian low 8 digest bytes == DuckDB ``md5_number_lower``), so
    the oracle replays the EXACT register contents in SQL."""
    import hashlib

    import numpy as np

    hv = np.fromiter(
        (
            int.from_bytes(hashlib.md5(k.encode()).digest()[8:], "little")
            for k in key
        ),
        np.uint64,
        len(key),
    )
    bucket = (hv & np.uint64(HLL_M - 1)).astype(np.int64)
    w = (hv >> np.uint64(HLL_P)) & np.uint64((1 << HLL_WBITS) - 1)
    # rho = leading-zero count in the 32-bit window + 1 = 33 - bit_length(w).
    # frexp's exponent IS bit_length for exact integer doubles (every w
    # < 2^32 is exact in float64) — no log2 rounding risk at powers of two.
    _, exp = np.frexp(w.astype(np.float64))
    rho = np.where(w != 0, HLL_WBITS + 1 - exp, HLL_WBITS + 1).astype(np.int64)
    g = pd.DataFrame(
        {group_col: df[group_col].to_numpy(), "bucket": bucket, "rho": rho}
    )
    return g.groupby([group_col, "bucket"], as_index=False)["rho"].max()


def _hll_finalize(v_zero: int, t_scaled: int):
    """Estimate from integer-exact register state.  S = sum over all m
    registers of 2^-reg is carried as the INTEGER t_scaled = S * 2^33
    (empty registers contribute 2^33 each), so the only float ops are one
    division and (in the small range) one ln — bit-identical between numpy
    here and DuckDB's CASE expression, which uses the same parenthesization."""
    import math

    alpha_mm = (0.7213 / (1.0 + 1.079 / 4096.0)) * 16777216.0
    est = alpha_mm * 8589934592.0 / t_scaled
    if est <= 2.5 * HLL_M and v_zero > 0:
        est = 4096.0 * math.log(4096.0 / v_zero)
    return float(round_half_away(est, 4))


def q_hll_user_days(sf_dir: str):
    """Approximate COUNT(DISTINCT user-day) per event type via a
    HyperLogLog sketch (Flajolet et al. 2007, incl. the linear-counting
    small-range correction — exercised at sf<=0.01, while sf0.1 crosses
    into the raw-estimator regime).

    Scale shape: the ONLY state that ever moves is (group, bucket,
    max-rho) partials — bounded by |groups| x 4096 per block whatever the
    row count — merged with the same two-regime plan as
    q_pivot_event_matrix (driver pandas max below PIVOT_DRIVER_MAX_ROWS
    partial rows, distributed groupby above).  Exact distinct would
    shuffle every key; the sketch shuffles kilobytes.  Output carries the
    integer register digests (v_zero, t_scaled) alongside the estimate so
    the oracle compare is integer-exact, not float-luck."""
    import numpy as np
    from ray.data.aggregate import Max

    ds = _read(
        sf_dir, "events", ["user_id", "ts", "event_type"], rows_per_block=12_500
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        key = df["user_id"].astype(str) + "@" + df["ts"].dt.strftime("%Y-%m-%d")
        return _hll_partial(df, key, "event_type")

    parts = ds.map_batches(partial, batch_format="pandas").materialize()
    if parts.count() <= PIVOT_DRIVER_MAX_ROWS:
        regs = (
            typed_collect(
                parts,
                pa.schema(
                    [
                        ("event_type", pa.string()),
                        ("bucket", pa.int64()),
                        ("rho", pa.int64()),
                    ]
                ),
            )
            .groupby(["event_type", "bucket"], as_index=False)["rho"]
            .max()
        )
    else:
        regs = (
            parts.groupby(["event_type", "bucket"])
            .aggregate(Max("rho", alias_name="rho"))
            .to_pandas()
        )
    rows = []
    for et, g in regs.groupby("event_type"):
        v_zero = HLL_M - len(g)
        t_scaled = int(
            (np.int64(1) << (33 - g["rho"].to_numpy(np.int64))).sum()
        ) + v_zero * (1 << 33)
        rows.append(
            {
                "event_type": et,
                "v_zero": v_zero,
                "t_scaled": t_scaled,
                "est": _hll_finalize(v_zero, t_scaled),
            }
        )
    out = pd.DataFrame(rows, columns=["event_type", "v_zero", "t_scaled", "est"])
    out["v_zero"] = out["v_zero"].astype("int64")
    out["t_scaled"] = out["t_scaled"].astype("int64")
    out["est"] = out["est"].astype("float64")  # empty frame: pin the dtype
    return out.sort_values("event_type").reset_index(drop=True)


def q_group_quantiles(sf_dir: str):
    """EXACT interpolated quantiles (median + p90 of l_quantity per return
    flag) via the bounded-domain histogram: blocks pre-reduce to
    (flag, value) -> count, the two-regime merge sums the tiny histogram,
    and the driver replays DuckDB's quantile_cont interpolation
    (h = (n-1)p; x[floor(h)] + frac * (x[floor(h)+1] - x[floor(h)]),
    verified formula-identical empirically) over cumulative counts.  No
    distributed sort, no sampling error; the shuffle carries one row per
    distinct (flag, value) — |flags| x 50 here — independent of corpus
    size.  The companion t_length_quantiles covers the quantile_disc
    (nearest-rank) variant; for unbounded domains quantize first."""
    import numpy as np
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity"], rows_per_block=100_000
    )

    def hist(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_quantity"]).aggregate(
            [("l_quantity", "count")]
        )
        return g.rename_columns(["l_returnflag", "l_quantity", "cnt"])

    parts = ds.map_batches(hist, batch_format="pyarrow").materialize()
    if parts.count() <= PIVOT_DRIVER_MAX_ROWS:
        hist_df = (
            typed_collect(
                parts,
                pa.schema(
                    [
                        ("l_returnflag", pa.string()),
                        ("l_quantity", pa.float64()),
                        ("cnt", pa.int64()),
                    ]
                ),
            )
            .groupby(["l_returnflag", "l_quantity"], as_index=False)["cnt"]
            .sum()
        )
    else:
        hist_df = (
            parts.groupby(["l_returnflag", "l_quantity"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
        )
    rows = []
    for flag, g in hist_df.groupby("l_returnflag"):
        g = g.sort_values("l_quantity")
        vals = g["l_quantity"].to_numpy(np.float64)
        cum = g["cnt"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        row = {"l_returnflag": flag, "n_lines": n}
        for name, p in (("med_qty", 0.5), ("p90_qty", 0.9)):
            h = (n - 1) * p
            lo = int(np.floor(h))
            xlo = vals[np.searchsorted(cum, lo + 1)]
            xhi = vals[np.searchsorted(cum, lo + 2)] if lo + 1 < n else xlo
            row[name] = float(round_half_away(xlo + (h - lo) * (xhi - xlo), 6))
        rows.append(row)
    out = pd.DataFrame(
        rows, columns=["l_returnflag", "n_lines", "med_qty", "p90_qty"]
    )
    out["n_lines"] = out["n_lines"].astype("int64")
    for c in ("med_qty", "p90_qty"):
        out[c] = out[c].astype("float64")  # empty frame: pin the dtype
    return out.sort_values("l_returnflag").reset_index(drop=True)


# bloom join: bits sized for the build side (127 keys at sf0.01, ~13k at
# the part table's TPC-H growth rate x sf100) — at production scale derive
# BLOOM_BITS from the build-side footer row count (~10 bits/key).
BLOOM_BITS = 1 << 17
BLOOM_K = 4
BLOOM_P_SIZE_MIN = 48


def _bloom_probe_idx(keys):
    """(k, n) probe positions via double hashing over the splitmix64
    finalizer — sequential int keys avalanche to uniform positions.  All
    arithmetic stays uint64 (the int64-x-uint64 float64 promotion trap,
    see _user_bucket) and wraps mod 2^64 by construction."""
    import numpy as np

    z = keys.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    h1 = z & np.uint64(BLOOM_BITS - 1)
    h2 = ((z >> np.uint64(17)) | np.uint64(1)) & np.uint64(BLOOM_BITS - 1)
    i = np.arange(BLOOM_K, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(BLOOM_BITS)


class _BloomProbe:
    """Broadcast bloom prefilter: keep rows whose key MIGHT be in the build
    set (no false negatives by construction; false positives are removed
    by the exact join downstream)."""

    def __init__(self, bits_ref, key_col):
        import ray

        self.bits = ray.get(bits_ref)
        self.key_col = key_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        keys = t.column(self.key_col).to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return t
        idx = _bloom_probe_idx(keys)
        byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
        bit = (np.uint64(1) << (idx & np.uint64(7))).astype(np.uint8)
        keep = ((byte & bit) != 0).all(axis=0)
        return t.filter(pa.array(keep))


def q_bloom_semi_join_parts(sf_dir: str):
    """Quantity rollup per brand for lineitems whose part has
    p_size >= 48 — executed as a BLOOM-PRUNED join, the 100 TB pattern for
    a join whose build side is selective but too big to broadcast as an
    exact key set: 16 KiB of bloom bits ship to every probe task instead
    of the key set, the probe side shrinks to matches + ~1% false
    positives BEFORE the shuffle, and the exact hash join (candidate-sized
    partitions, sizing.shuffle_partitions) removes the false positives.
    The additive rollup is ALSO pushed below the join: blocks collapse
    their survivors to per-key (count, sum) partials first, so the join
    exchange carries distinct-keys-per-block rows and a hot partkey
    cannot skew a join partition.  The bits build distributedly:
    per-block bitmap partials OR-merged on the driver (fixed-size state;
    tree-reduce at extreme block counts).  Output is count + quantity
    sums only — integer-valued doubles, so the sums are IEEE-exact in
    any order."""
    import numpy as np
    import ray

    from .sizing import shuffle_partitions

    part = _read(sf_dir, "part", ["p_partkey", "p_size", "p_brand"])

    def build_bits(t: pa.Table) -> pa.Table:
        keys = (
            t.filter(pc.greater_equal(t.column("p_size"), BLOOM_P_SIZE_MIN))
            .column("p_partkey")
            .to_numpy(zero_copy_only=False)
        )
        bits = np.zeros(BLOOM_BITS // 8, np.uint8)
        if len(keys):
            idx = _bloom_probe_idx(keys).ravel()
            np.bitwise_or.at(
                bits,
                (idx >> np.uint64(3)).astype(np.int64),
                (np.uint64(1) << (idx & np.uint64(7))).astype(np.uint8),
            )
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    bits = np.zeros(BLOOM_BITS // 8, np.uint8)
    for r in part.map_batches(build_bits, batch_format="pyarrow").take_all():
        bits |= np.frombuffer(r["bits"], np.uint8)
    bits_ref = ray.put(bits)

    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity"], rows_per_block=100_000
    )
    probe = warm_stage(_BloomProbe, bits_ref=bits_ref, key_col="l_partkey")

    def probe_reduce(t: pa.Table) -> pa.Table:
        # aggregation pushdown BELOW the join: the rollup is additive, so
        # each block collapses its bloom survivors to per-key partials —
        # the join input is distinct-keys-per-block, immune to hot-key
        # skew, and the sums are integer-valued doubles (exact any order)
        f = probe(t)
        tt = pa.table(
            {
                "l_partkey": f.column("l_partkey"),
                "n_lines": pa.array(np.ones(len(f), np.int64)),
                "sum_qty": f.column("l_quantity"),
            }
        )
        g = tt.group_by("l_partkey").aggregate(
            [("n_lines", "sum"), ("sum_qty", "sum")]
        )
        return g.rename_columns(["l_partkey", "n_lines", "sum_qty"])

    cand = li.map_batches(probe_reduce, batch_format="pyarrow").materialize()
    n_cand = cand.count()
    cols = ["p_brand", "n_lines", "sum_qty"]
    if n_cand == 0:
        return pd.DataFrame(
            {"p_brand": pd.array([], "string"),
             "n_lines": pd.array([], "int64"),
             "sum_qty": pd.array([], "float64")}
        )[cols]
    build = part.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t.column("p_size"), BLOOM_P_SIZE_MIN)
        ).select(["p_partkey", "p_brand"]),
        batch_format="pyarrow",
    )
    n_parts = shuffle_partitions(n_cand)
    # compact candidate-sized inputs (also dodges the empty-first-block
    # schema loss, see CLAUDE.md)
    joined = cand.repartition(n_parts).join(
        build.repartition(n_parts),
        join_type="inner",
        num_partitions=n_parts,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def combine(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "p_brand": t.column("p_brand"),
                "n_lines": t.column("n_lines"),
                "sum_qty": t.column("sum_qty"),
            }
        )
        g = tt.group_by("p_brand").aggregate(
            [("n_lines", "sum"), ("sum_qty", "sum")]
        )
        return g.rename_columns(["p_brand", "n_lines", "sum_qty"])

    df = (
        joined.map_batches(combine, batch_format="pyarrow")
        .to_pandas()  # bounded: |brands| x blocks rows
        .groupby("p_brand", as_index=False)[["n_lines", "sum_qty"]]
        .sum()
    )
    df["n_lines"] = df["n_lines"].astype("int64")
    df["sum_qty"] = round_half_away(df["sum_qty"].to_numpy(), 2)
    return df[cols].sort_values("p_brand").reset_index(drop=True)


GAP_BUCKETS = 64
GAP_CHUNK_DAYS = 7  # hot-key split width; stitch is correct for ANY width


def _gap_merge_chunks(p: pd.DataFrame) -> pd.DataFrame:
    """Combine per-(user, chunk) gap partials into per-user stats.  The
    rows sort by (user, chunk) = time order (chunk = ts // width is
    monotone in ts), so each adjacent same-user pair contributes exactly
    one BOUNDARY gap (next chunk's first event minus this chunk's last) —
    the only lag the per-chunk pass cannot see.  All sums stay exact
    integers, so the final mean is one float division."""
    import numpy as np

    p = p.sort_values(["user_id", "chunk"])
    same = p["user_id"].eq(p["user_id"].shift())
    bgap = (p["first_ts"] - p["last_ts"].shift()).where(same)
    agg = (
        pd.DataFrame(
            {
                "user_id": p["user_id"],
                "n_int": p["n_gaps"],
                "s_int": p["gap_sum"],
                "mn_int": p["gap_min"],
                "mx_int": p["gap_max"],
                "bgap": bgap,
            }
        )
        .groupby("user_id")
        .agg(
            n_int=("n_int", "sum"),
            s_int=("s_int", "sum"),
            mn_int=("mn_int", "min"),
            mx_int=("mx_int", "max"),
            n_b=("bgap", "count"),
            s_b=("bgap", "sum"),
            mn_b=("bgap", "min"),
            mx_b=("bgap", "max"),
        )
        .reset_index()
    )
    n = agg["n_int"] + agg["n_b"]
    keep = n > 0
    agg, n = agg[keep], n[keep]
    s = agg["s_int"] + agg["s_b"].fillna(0)  # integer-valued, exact
    return pd.DataFrame(
        {
            "user_id": agg["user_id"].astype("int64"),
            "n_gaps": n.astype("int64"),
            "min_gap_us": agg[["mn_int", "mn_b"]].min(axis=1).astype("int64"),
            "max_gap_us": agg[["mx_int", "mx_b"]].max(axis=1).astype("int64"),
            "mean_gap_us": s.astype("float64") / n.to_numpy(np.float64),
        }
    )


def q_interevent_gap_stats(sf_dir: str):
    """Per-user inter-event gap statistics (count / min / max / mean of
    consecutive-event deltas in microseconds) — the windowed-lag shape.

    Hot-key-safe: the ONE event-sized shuffle keys on (user_id, time
    chunk) via _session_keys — a pathological user owning half the corpus
    splits across chunks instead of landing whole on one worker (the
    q_sessionize lesson).  Each bucket takes vectorized diffs inside its
    (user, chunk) slices and reduces to ONE partial row per (user, chunk)
    — count/min/max/sum of internal gaps plus first/last event ts — and
    the merge stitches the single boundary gap per adjacent chunk pair
    (_gap_merge_chunks; correct for any chunk width).  The merge is
    two-regime like q_pivot_event_matrix: driver pandas below
    PIVOT_DRIVER_MAX_ROWS partial rows, a distributed groupby(user)
    above.  Gap sums stay exact integers throughout, so the mean is ONE
    float division — bit-identical to the oracle's
    CAST(SUM AS DOUBLE)/COUNT.  Single-event users have no gap and are
    absent, matching the oracle's WHERE gap IS NOT NULL."""
    import numpy as np

    ds = _read(
        sf_dir, "events", ["event_id", "ts", "user_id"], rows_per_block=12_500
    )
    chunk_us = np.int64(GAP_CHUNK_DAYS) * 86_400_000_000

    def bucketize(t: pa.Table) -> pa.Table:
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        chunk, bucket = _session_keys(users, ts_us, GAP_BUCKETS, chunk_us)
        t = t.append_column("chunk", pa.array(chunk, pa.int64()))
        return t.append_column("bucket", pa.array(bucket))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "chunk", "ts", "event_id"])
        ts_us = g["ts"].astype("int64")
        same = g["user_id"].eq(g["user_id"].shift()) & g["chunk"].eq(
            g["chunk"].shift()
        )
        gap = ts_us.diff().where(same)
        d = pd.DataFrame(
            {
                "user_id": g["user_id"],
                "chunk": g["chunk"],
                "ts_us": ts_us,
                "gap": gap,
            }
        )
        part = (
            d.groupby(["user_id", "chunk"], sort=False)
            .agg(
                n_gaps=("gap", "count"),
                gap_sum=("gap", "sum"),
                gap_min=("gap", "min"),
                gap_max=("gap", "max"),
                first_ts=("ts_us", "min"),
                last_ts=("ts_us", "max"),
            )
            .reset_index()
        )
        part["n_gaps"] = part["n_gaps"].astype("int64")
        part["gap_sum"] = part["gap_sum"].astype("int64")  # NaN-free: sum skips
        return part

    parts = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
        .materialize()  # one narrow row per (user, chunk), never events
    )
    if parts.count() <= PIVOT_DRIVER_MAX_ROWS:
        out = _gap_merge_chunks(
            typed_collect(
                parts,
                pa.schema(
                    [
                        ("user_id", pa.int64()),
                        ("chunk", pa.int64()),
                        ("first_ts", pa.int64()),
                        ("last_ts", pa.int64()),
                        ("n_gaps", pa.int64()),
                        ("gap_sum", pa.int64()),
                        ("gap_min", pa.float64()),
                        ("gap_max", pa.float64()),
                    ]
                ),
            )
        )
    else:
        out = (
            parts.groupby("user_id")
            .map_groups(_gap_merge_chunks, batch_format="pandas")
            .to_pandas()
        )
    return out.sort_values("user_id").reset_index(drop=True)


def q_rollup_pricing(sf_dir: str):
    """GROUP BY ROLLUP (l_returnflag, l_linestatus) — the OLAP cube trick:
    ONE combiner pass computes the finest-grain cells, and every coarser
    level (per-flag subtotals, the grand total) is an ADDITIVE driver fold
    of those cells — never a rescan, never a second shuffle.  Rolled
    columns carry the literal 'ALL' (COALESCE'd identically in the
    oracle) so no NULL-ordering convention crosses the engine/SQL
    boundary.  Counts are exact ints; quantity sums are integer-valued
    doubles (exact in any order).  The cells pass is shared with
    q_cube_pricing (_pricing_cells)."""
    base = _pricing_cells(sf_dir)
    lvl1 = base.groupby("l_returnflag", as_index=False)[
        ["n_lines", "sum_qty"]
    ].sum()
    lvl1["l_linestatus"] = "ALL"
    lvl0 = pd.DataFrame(
        {
            "l_returnflag": ["ALL"],
            "l_linestatus": ["ALL"],
            "n_lines": [base["n_lines"].sum()],
            "sum_qty": [base["sum_qty"].sum()],
        }
    )
    out = pd.concat([base, lvl1, lvl0], ignore_index=True)
    out["n_lines"] = out["n_lines"].astype("int64")
    out["sum_qty"] = round_half_away(out["sum_qty"].to_numpy(), 2)
    # SQL SUM over zero rows is NULL, not 0: the grand-total fold of an
    # empty input must carry NaN like the oracle's ROLLUP/CUBE row
    out.loc[out["n_lines"] == 0, "sum_qty"] = float("nan")
    return (
        out[["l_returnflag", "l_linestatus", "n_lines", "sum_qty"]]
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )


def _ohlc_merge(p: pd.DataFrame) -> pd.DataFrame:
    """Combine per-block OHLC partials per (event_type, day).  Open/close
    are order-sensitive but MERGEABLE: each partial carries the value AND
    its (ts, event_id) key, so the merge just keeps the lexicographically
    smallest/largest key per group — associativity restored by carrying
    the ordering key with the value."""
    lo = p.sort_values(["event_type", "day", "open_ts", "open_id"]).groupby(
        ["event_type", "day"], sort=False, as_index=False
    )
    hi = p.sort_values(
        ["event_type", "day", "close_ts", "close_id"], ascending=[True, True, False, False]
    ).groupby(["event_type", "day"], sort=False, as_index=False)
    agg = p.groupby(["event_type", "day"], as_index=False).agg(
        n_events=("n", "sum"), low=("vmin", "min"), high=("vmax", "max")
    )
    out = (
        agg.merge(lo.first()[["event_type", "day", "open_v"]], on=["event_type", "day"])
        .merge(hi.first()[["event_type", "day", "close_v"]], on=["event_type", "day"])
    )
    out["n_events"] = out["n_events"].astype("int64")
    return out[
        ["event_type", "day", "n_events", "low", "high", "open_v", "close_v"]
    ]


def q_ohlc_daily(sf_dir: str):
    """Daily OHLC bars per event type (open/high/low/close of `value`) —
    the order-sensitive-but-mergeable aggregate shape: blocks reduce to
    one partial row per (type, day) carrying min/max plus the open/close
    VALUES WITH their (ts, event_id) ordering keys, so partial merge is
    associative and the exchange never carries events.  Two-regime merge
    (driver / distributed groupby) like q_pivot_event_matrix.  Values
    pass through untouched (no arithmetic), so the compare needs no
    rounding at all; ties on ts resolve by event_id, pinned on both
    sides."""
    import numpy as np

    ds = _read(
        sf_dir,
        "events",
        ["event_id", "ts", "event_type", "value"],
        rows_per_block=12_500,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        day = df["ts"].dt.strftime("%Y-%m-%d")
        ts_us = df["ts"].astype("int64")
        d = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "day": day,
                "value": df["value"],
                "ts_us": ts_us,
                "event_id": df["event_id"],
            }
        )
        g = d.groupby(["event_type", "day"], sort=False)
        out = g.agg(
            n=("value", "size"),
            vmin=("value", "min"),
            vmax=("value", "max"),
            open_v=("value", "first"),
            close_v=("value", "last"),
            open_ts=("ts_us", "first"),
            close_ts=("ts_us", "last"),
            open_id=("event_id", "first"),
            close_id=("event_id", "last"),
        ).reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    parts = ds.map_batches(partial, batch_format="pandas").materialize()
    if parts.count() <= PIVOT_DRIVER_MAX_ROWS:
        out = _ohlc_merge(
            typed_collect(
                parts,
                pa.schema(
                    [
                        ("event_type", pa.string()),
                        ("day", pa.string()),
                        ("n", pa.int64()),
                        ("vmin", pa.float64()),
                        ("vmax", pa.float64()),
                        ("open_v", pa.float64()),
                        ("close_v", pa.float64()),
                        ("open_ts", pa.int64()),
                        ("close_ts", pa.int64()),
                        ("open_id", pa.int64()),
                        ("close_id", pa.int64()),
                    ]
                ),
            )
        )
    else:
        out = (
            parts.groupby(["event_type", "day"])
            .map_groups(_ohlc_merge, batch_format="pandas")
            .to_pandas()
        )
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def q_left_join_order_counts(sf_dir: str):
    """Every customer with their order count and total spend — zero-order
    customers INCLUDED with (0, 0.00): the LEFT OUTER join shape (the one
    join type the registry didn't exercise; Ray's native left_outer).

    Scale shape: the orders side is REDUCED before the join — per-block
    (custkey, n, s) combiner partials, merged two-regime like
    q_pivot_event_matrix — so the exchange joins |customers| rows against
    at-most-|customers| reduced rows, never against raw orders.  The
    null-filled fringe (customers with no orders) is exactly the rows a
    dangling-FK drop would lose in the inner join; COALESCE semantics are
    pinned on both sides.  Partition count derives from the footer row
    count (sizing.shuffle_partitions)."""
    import numpy as np
    import pyarrow.parquet as pq

    from .sizing import shuffle_partitions

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "n": pa.array(np.ones(len(t), np.int64)),
                "s": t.column("o_totalprice"),
            }
        )
        g = tt.group_by("o_custkey").aggregate([("n", "sum"), ("s", "sum")])
        return g.rename_columns(["o_custkey", "n", "s"])

    reduced, _ = _two_regime_sum(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey"],
        ["n", "s"],
        empty_types={"s": pa.float64()},
    )

    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    if n_cust == 0:
        # an all-empty LEFT side kills Ray's join (schema loss); the
        # answer is trivially empty, known from the footer alone
        return pd.DataFrame(
            {
                "c_custkey": pd.Series([], dtype="int64"),
                "c_name": pd.Series([], dtype=object),
                "n_orders": pd.Series([], dtype="int64"),
                "total_price": pd.Series([], dtype="float64"),
            }
        )
    n_parts = shuffle_partitions(n_cust)
    # pad the RIGHT side only: safe under left_outer (an unmatched RIGHT
    # row never appears in the output), and an all-empty reduced side —
    # a zero-row orders table — would otherwise crash the join
    reduced = _join_pad(
        reduced,
        pa.schema(
            [("o_custkey", pa.int64()), ("n", pa.int64()), ("s", pa.float64())]
        ),
    )
    joined = cust.repartition(n_parts).join(
        reduced,
        join_type="left_outer",
        num_partitions=n_parts,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_name": t.column("c_name"),
                "n_orders": pc.fill_null(t.column("n"), 0),
                "total_price": pc.fill_null(t.column("s"), 0.0),
            }
        )

    df = joined.map_batches(finish, batch_format="pyarrow").to_pandas()
    df["n_orders"] = df["n_orders"].astype("int64")
    df["total_price"] = round_half_away(df["total_price"].to_numpy(), 2)
    return df.sort_values("c_custkey").reset_index(drop=True)


def _two_regime_agg(parts, keys, agg_cols, how, empty_types=None):
    """Merge per-block grouped partials (any decomposable aggregate whose
    merge is itself: sum-of-sums, min-of-mins, max-of-maxes) through the
    two-regime plan (the q_retention_cohorts lesson: Ray's sort-shuffle
    Aggregate pays seconds of fixed machinery PER AGGREGATE COLUMN even
    on tiny inputs — a driver-sized partial table merges orders of
    magnitude faster with one pandas groupby).  Returns
    ``(dataset, n_reduced_rows)``; the row count feeds
    `sizing.shuffle_partitions` for any downstream exchange.

    ``empty_types`` (pyarrow types, keyed by column) pins the schema when
    the partial table is EMPTY — Ray drops all-empty blocks from a
    collect and `from_pandas` of an untyped empty frame would poison a
    downstream join with a schemaless side (the q_filter_topk /
    group-sample empty-block lesson)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    agg_cls = {"sum": Sum, "min": Min, "max": Max}[how]
    keys, agg_cols = list(keys), list(agg_cols)
    parts = parts.materialize()
    n = parts.count()
    if n > PIVOT_DRIVER_MAX_ROWS:
        out = parts.groupby(keys).aggregate(
            *[agg_cls(c, alias_name=c) for c in agg_cols]
        )
        return out, n
    df = parts.to_pandas()
    if len(df.columns) == 0 or len(df) == 0:
        types = dict(empty_types or {})
        tbl = pa.table(
            {c: pa.array([], types.get(c, pa.int64())) for c in keys + agg_cols}
        )
        return rd.from_arrow(tbl), 0
    red = df.groupby(keys, as_index=False)[agg_cols].agg(how)
    # Arrow-backed blocks: downstream rename/join stages assume Arrow
    # (Ray's rename_columns Project crashes on pandas blocks)
    return rd.from_arrow(pa.Table.from_pandas(red, preserve_index=False)), len(red)


def _two_regime_sum(parts, keys, sum_cols, empty_types=None):
    """Sum form of `_two_regime_agg` (the original; see its docstring)."""
    return _two_regime_agg(parts, keys, sum_cols, "sum", empty_types=empty_types)


def q_full_outer_user_activity(sf_dir: str):
    """Per-user view count vs purchase count with BOTH fringes kept: users
    who only view carry n_purchases = 0, users who only purchase carry
    n_views = 0 — the FULL OUTER join shape (Ray's native full_outer),
    completing the registry's join-type family (inner hash / broadcast /
    left outer / semi / anti / range / as-of / bloom-pruned).

    The two sides here derive from one table so a crosstab could serve
    this particular query; the operator under test is the two-input
    full_outer exchange itself, where the sides stand in for
    independently-owned inputs (impressions vs conversions feeds).  Scale
    shape: each side is combiner-reduced to per-user partials BEFORE the
    join (two-regime merge), so the exchange joins at-most-|users| narrow
    rows per side, never raw events; both sides are compacted to the same
    partition count first (empty/sliver first blocks lose the join schema
    — the q_hash_join_brand lesson) and the count derives from the reduced
    row counts (sizing.shuffle_partitions)."""
    import numpy as np

    from .sizing import shuffle_partitions

    ds = _read(sf_dir, "events", ["user_id", "event_type"], rows_per_block=12_500)

    def side_partial(col, ev_type):
        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("event_type"), ev_type))
            tt = pa.table(
                {
                    "user_id": t.column("user_id"),
                    col: pa.array(np.ones(len(t), np.int64)),
                }
            )
            g = tt.group_by("user_id").aggregate([(col, "sum")])
            return g.rename_columns(["user_id", col])

        return partial

    views, n_v = _two_regime_sum(
        ds.map_batches(side_partial("n_views", "view"), batch_format="pyarrow"),
        ["user_id"],
        ["n_views"],
    )
    purchases, n_p = _two_regime_sum(
        ds.map_batches(
            side_partial("n_purchases", "purchase"), batch_format="pyarrow"
        ),
        ["user_id"],
        ["n_purchases"],
    )
    # an all-empty side kills Ray's join outright (schema loss — measured
    # for full_outer too), and _join_pad's null-key sentinel is WRONG for
    # outer joins (the unmatched sentinel would surface as an all-null
    # output row).  The counts _two_regime_sum already returned make the
    # degenerate cases free: an empty side means the full-outer IS the
    # other side with zeros filled in — no join needed.
    if n_v == 0 or n_p == 0:
        if n_v == 0 and n_p == 0:
            df = pd.DataFrame(columns=["user_id", "n_views", "n_purchases"])
        elif n_v == 0:
            df = purchases.to_pandas()
            df["n_views"] = 0
        else:
            df = views.to_pandas()
            df["n_purchases"] = 0
        for c in ("user_id", "n_views", "n_purchases"):
            df[c] = df.get(c, pd.Series(dtype="int64")).astype("int64")
        return (
            df[["user_id", "n_views", "n_purchases"]]
            .sort_values("user_id")
            .reset_index(drop=True)
        )
    n_parts = shuffle_partitions(max(n_v, n_p, 1))
    joined = views.repartition(n_parts).join(
        purchases.repartition(n_parts),
        join_type="full_outer",
        num_partitions=n_parts,
        on=("user_id",),
    )

    def finish(t: pa.Table) -> pa.Table:
        # Ray's full_outer already coalesces the key column; the fringe
        # rows carry nulls only in the other side's value columns
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "n_views": pc.fill_null(t.column("n_views"), 0),
                "n_purchases": pc.fill_null(t.column("n_purchases"), 0),
            }
        )

    df = joined.map_batches(finish, batch_format="pyarrow").to_pandas()
    if len(df.columns) == 0:  # both sides empty: typed empty result
        df = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "n_views": pd.Series([], dtype="int64"),
                "n_purchases": pd.Series([], dtype="int64"),
            }
        )
    for c in ("user_id", "n_views", "n_purchases"):
        df[c] = df[c].astype("int64")
    return df.sort_values("user_id").reset_index(drop=True)


def _skew_threshold(n_probe: int, n_parts: int) -> int:
    """A probe key is HOT when its row count alone would overflow one join
    partition's fair share.  By pigeonhole at most ``n_parts`` keys can
    exceed n_probe/n_parts, so the detected hot set is always
    driver-sized — no cap or sampling needed for the bound to hold."""
    import math

    return max(2, math.ceil(n_probe / max(1, n_parts)))


def q_skew_join_purchase_clicks(sf_dir: str):
    """Each purchase event enriched with its user's total click count —
    a per-row join whose PROBE side can be arbitrarily key-skewed (one
    bot user owning half the purchases lands whole in one hash-join
    partition) executed as a SALTED JOIN, the production skew-join
    pattern: detect hot probe keys exactly from combiner-reduced counts,
    replicate the build row of each hot key across all ``n_parts`` salts,
    and spread that key's probe rows over the salts by event_id.  Cold
    keys pay nothing (salt 0, build row kept once).

    Unlike the registry's other joins this one cannot push the aggregate
    below the exchange — the output is per-probe-row — so salting is the
    only skew defense.  Detection is exact here (one narrow shuffle over
    per-block (user, n) partials; the hot set is provably ≤ n_parts keys,
    see _skew_threshold); a production variant could sample instead, as
    detection affects only placement, never values.  The pre-join
    repartition compacts filter-sparse blocks (empty-first-block schema
    loss, see CLAUDE.md) and moves only (event_id, user_id, salt)
    rows."""
    import numpy as np

    from .sizing import shuffle_partitions

    ds = _read(
        sf_dir,
        "events",
        ["event_id", "user_id", "event_type"],
        rows_per_block=12_500,
    )

    def purchase_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        return t.select(["event_id", "user_id"])

    purchases = ds.map_batches(purchase_rows, batch_format="pyarrow")

    def count_partial(col):
        def partial(t: pa.Table) -> pa.Table:
            tt = pa.table(
                {
                    "user_id": t.column("user_id"),
                    col: pa.array(np.ones(len(t), np.int64)),
                }
            )
            g = tt.group_by("user_id").aggregate([(col, "sum")])
            return g.rename_columns(["user_id", col])

        return partial

    # build side: per-user click counts, combiner-reduced before anything
    # moves (the build side is |users|-scale — too big to broadcast at
    # 100 TB, which is why this is a shuffle join at all)
    def click_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("event_type"), "click"))

    clicks, n_click_users = _two_regime_sum(
        ds.map_batches(click_rows, batch_format="pyarrow").map_batches(
            count_partial("n_clicks"), batch_format="pyarrow"
        ),
        ["user_id"],
        ["n_clicks"],
    )

    # exact hot-key detection from the same combiner-reduced shape
    pcounts, _ = _two_regime_sum(
        purchases.map_batches(count_partial("n_probe"), batch_format="pyarrow"),
        ["user_id"],
        ["n_probe"],
    )
    n_purchases = int(pcounts.sum(on="n_probe") or 0)
    if n_purchases == 0:
        return pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "n_clicks": pd.Series([], dtype="int64"),
            }
        )
    n_parts = shuffle_partitions(n_purchases)
    threshold = _skew_threshold(n_purchases, n_parts)
    hot_df = pcounts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n_probe"), threshold)),
        batch_format="pyarrow",
    ).to_pandas()
    hot = (
        hot_df["user_id"].to_numpy(np.int64)
        if len(hot_df.columns)
        else np.array([], np.int64)
    )
    n_salts = n_parts  # spread each hot key over every join partition

    def salt_build(t: pa.Table) -> pa.Table:
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        n_clicks = t.column("n_clicks").to_numpy(zero_copy_only=False)
        is_hot = np.isin(users, hot)
        u = np.concatenate([users[~is_hot], np.repeat(users[is_hot], n_salts)])
        c = np.concatenate(
            [n_clicks[~is_hot], np.repeat(n_clicks[is_hot], n_salts)]
        )
        s = np.concatenate(
            [
                np.zeros((~is_hot).sum(), np.int64),
                np.tile(np.arange(n_salts, dtype=np.int64), int(is_hot.sum())),
            ]
        )
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "salt": pa.array(s),
                "n_clicks": pa.array(c, pa.int64()),
            }
        )

    def salt_probe(t: pa.Table) -> pa.Table:
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        salt = np.where(np.isin(users, hot), ids % n_salts, 0)
        return t.append_column("salt", pa.array(salt.astype(np.int64)))

    joined = (
        purchases.map_batches(salt_probe, batch_format="pyarrow")
        .repartition(n_parts)
        .join(
            clicks.map_batches(salt_build, batch_format="pyarrow").repartition(
                n_parts
            ),
            join_type="inner",
            num_partitions=n_parts,
            on=("user_id", "salt"),
        )
    )
    df = joined.map_batches(
        lambda t: t.select(["event_id", "user_id", "n_clicks"]),
        batch_format="pyarrow",
    ).to_pandas()
    if len(df.columns) == 0:  # no purchase has a clicking user
        df = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "n_clicks": pd.Series([], dtype="int64"),
            }
        )
    for c in ("event_id", "user_id", "n_clicks"):
        df[c] = df[c].astype("int64")
    return df.sort_values("event_id").reset_index(drop=True)


RUNNING_CHUNK_DAYS = 7  # hot-key split width; the stitch is exact for ANY width


def _purchase_cents_chunks(t: pa.Table, chunk_us, n_buckets: int) -> pa.Table:
    """Shared bucketize step of the per-user window queries: filter to
    purchases, derive the hot-key-safe (chunk, bucket) shuffle keys
    (_session_keys) and the exact int64 cents (value*100 ties-away, ==
    DuckDB ROUND)."""
    import numpy as np

    t = t.filter(pc.equal(t.column("event_type"), "purchase"))
    users = t.column("user_id").to_numpy(zero_copy_only=False)
    ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    chunk, bucket = _session_keys(users, ts_us, n_buckets, chunk_us)
    cents = round_half_away(
        pc.fill_null(t.column("value"), 0.0).to_numpy(zero_copy_only=False)
        * 100.0,
        0,
    ).astype(np.int64)
    return pa.table(
        {
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "chunk": pa.array(chunk, pa.int64()),
            "bucket": pa.array(bucket),
            "cents": pa.array(cents),
        }
    )


def q_running_user_spend(sf_dir: str, stage_dir: str = None):
    """Per-purchase RUNNING TOTAL of the user's spend in integer cents —
    the prefix-scan window shape (SUM OVER (PARTITION BY user ORDER BY
    ts)), complementing the registry's lag (q_interevent_gap_stats) and
    first/last (q_ohlc_daily) window forms.

    Hot-key-safe like q_sessionize: events shuffle on (user_id, time
    chunk) keys (_session_keys), each group computes its chunk-local
    cumulative sum in ONE vectorized pandas pass, per-(user, chunk)
    chunk totals (combinable under block splits) reduce to the driver,
    which folds them into exclusive per-user prefix offsets; offsets ride
    a keyed-shuffle JOIN back on the same (user_id, chunk) key — never a
    driver broadcast.  The scanned event table, consumed twice (totals +
    offset join), is a parquet stage checkpoint with crash-resume via
    ``stage_dir``.

    Cents are int64 on BOTH sides — value*100 rounded ties-away
    (round_half_away == DuckDB ROUND) — so every prefix sum is exact in
    any association and the value hash cannot float-drift."""
    import os
    import shutil
    import tempfile

    import numpy as np
    import ray.data as rd

    from .sizing import shuffle_partitions
    from .staging import stage_checkpoint

    ds = _read(
        sf_dir,
        "events",
        ["event_id", "ts", "user_id", "event_type", "value"],
        rows_per_block=12_500,
    )
    N_BUCKETS = 64
    chunk_us = np.int64(RUNNING_CHUNK_DAYS) * 86_400_000_000

    def bucketize(t: pa.Table) -> pa.Table:
        return _purchase_cents_chunks(t, chunk_us, N_BUCKETS)

    def scan_chunk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "chunk", "ts", "event_id"]).reset_index(
            drop=True
        )
        same = g["user_id"].eq(g["user_id"].shift()) & g["chunk"].eq(
            g["chunk"].shift()
        )
        run_id = (~same).cumsum()
        g["run_cents"] = g["cents"].groupby(run_id.to_numpy()).cumsum()
        return g[["event_id", "user_id", "chunk", "cents", "run_cents"]]

    own_stage = stage_dir is None
    root = tempfile.mkdtemp(prefix="pdfray_running_") if own_stage else stage_dir
    try:
        scanned = stage_checkpoint(
            lambda: ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(scan_chunk, batch_format="pandas"),
            os.path.join(root, "scanned"),
            resume=not own_stage,
            allow_empty=True,
        )
        if scanned is None:  # zero purchases anywhere
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "running_cents": pd.Series([], dtype="int64"),
                }
            )
        n_rows = scanned.count()
        # chunk totals are additive, so block splits of map_groups output
        # are safe; the reduced table is one row per (user, active chunk)
        totals = (
            scanned.map_batches(
                lambda df: df.groupby(["user_id", "chunk"], sort=False)
                .agg(total=("cents", "sum"))
                .reset_index(),
                batch_format="pandas",
            )
            .to_pandas()
            .groupby(["user_id", "chunk"], as_index=False)["total"]
            .sum()
            .sort_values(["user_id", "chunk"])
            .reset_index(drop=True)
        )
        # exclusive prefix: what the user spent in all EARLIER chunks
        csum = totals.groupby("user_id")["total"].cumsum()
        totals["offset"] = (csum - totals["total"]).astype("int64")
        off_ds = rd.from_pandas(totals[["user_id", "chunk", "offset"]])
        n_parts = shuffle_partitions(n_rows)

        def rewrite(df: pd.DataFrame) -> pd.DataFrame:
            df["running_cents"] = (
                df["run_cents"].astype("int64") + df["offset"].astype("int64")
            )
            return df[["event_id", "user_id", "running_cents"]]

        out = (
            scanned.select_columns(["event_id", "user_id", "chunk", "run_cents"])
            .join(
                off_ds,
                join_type="inner",
                num_partitions=n_parts,
                on=("user_id", "chunk"),
            )
            .map_batches(rewrite, batch_format="pandas")
        )
        return out.to_pandas().sort_values("event_id").reset_index(drop=True)
    finally:
        if own_stage:
            shutil.rmtree(root, ignore_errors=True)


def q_user_days_exact(sf_dir: str):
    """Per-user EXACT distinct active-day count — the exact companion to
    q_hll_user_days' sketch, completing the sketch-vs-exact pairing the
    heavy-hitters family already has (t_heavy_hitters verifies its sketch
    against exact counts; here the two sides are separate queries so the
    cost asymmetry stays visible in the bench).

    Scale shape — the classic two-level distinct: each block first dedups
    to its local (user, day) pairs (one Arrow group_by, no values), so the
    exchange carries at most |users| x |active days| pair rows — bounded
    by the calendar, not the event count.  Above PIVOT_DRIVER_MAX_ROWS
    pair rows the dedup is a distributed groupby and the per-user count
    rides the shared _two_regime_sum combiner; below, one driver pandas
    drop_duplicates.  Day = floor(epoch_us / day_us), identical to SQL's
    CAST(ts AS DATE) for pre-epoch timestamps too (both are floor, not
    truncation — the q_events_json // lesson)."""
    import numpy as np

    ds = _read(sf_dir, "events", ["user_id", "ts"], rows_per_block=12_500)
    DAY_US = 86_400_000_000

    def pairs(t: pa.Table) -> pa.Table:
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = np.floor_divide(ts_us, DAY_US)
        tt = pa.table(
            {"user_id": t.column("user_id"), "day": pa.array(day, pa.int64())}
        )
        return tt.group_by(["user_id", "day"]).aggregate([])

    parts = ds.map_batches(pairs, batch_format="pyarrow").materialize()
    if parts.count() <= PIVOT_DRIVER_MAX_ROWS:
        df = parts.to_pandas()
        if len(df.columns) == 0 or len(df) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_days": pd.Series([], dtype="int64"),
                }
            )
        out = (
            df.drop_duplicates()
            .groupby("user_id", as_index=False)
            .size()
            .rename(columns={"size": "n_days"})
        )
    else:
        from ray.data.aggregate import Count

        dedup = parts.groupby(["user_id", "day"]).aggregate(
            Count(alias_name="_n")
        )

        def cnt(t: pa.Table) -> pa.Table:
            tt = pa.table(
                {
                    "user_id": t.column("user_id"),
                    "n_days": pa.array(np.ones(len(t), np.int64)),
                }
            )
            g = tt.group_by("user_id").aggregate([("n_days", "sum")])
            return g.rename_columns(["user_id", "n_days"])

        red, _ = _two_regime_sum(
            dedup.map_batches(cnt, batch_format="pyarrow"),
            ["user_id"],
            ["n_days"],
        )
        out = red.to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n_days"] = out["n_days"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


TOPK_PER_GROUP_K = 3  # per-customer order count to keep


def q_topk_per_group(sf_dir: str):
    """Each customer's top-3 orders by price with an explicit rank column
    — the per-group top-k window (ROW_NUMBER() <= k), generalizing
    q_top_order_per_customer's argmax (k=1, packable into one native Max)
    to k>1, where the partial IS a small table and packing no longer
    applies.

    Scale shape: every block keeps only its LOCAL top-k per group (one
    vectorized sort + groupby head — the grouped analogue of _topk's
    global local-top-k), so at most k rows per (group, block) move.  The
    merge is two-regime: driver pandas below PIVOT_DRIVER_MAX_ROWS
    partial rows, a per-group map_groups top-k above.  (o_totalprice
    DESC, o_orderkey ASC) is a TOTAL order, so ranks are deterministic
    under ties — the hostile-star harness plants same-customer price
    ties."""

    ds = _read(
        sf_dir,
        "orders",
        ["o_custkey", "o_orderkey", "o_totalprice"],
        rows_per_block=50_000,
    )
    k = TOPK_PER_GROUP_K
    BY = ["o_custkey", "o_totalprice", "o_orderkey"]
    ASC = [True, False, True]

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(BY, ascending=ASC)
        return df.groupby("o_custkey", sort=False).head(k)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = (
            df.sort_values(BY, ascending=ASC)
            .groupby("o_custkey", sort=False)
            .head(k)
            .copy()
        )
        df["rnk"] = df.groupby("o_custkey", sort=False).cumcount() + 1
        return df[["o_custkey", "rnk", "o_orderkey", "o_totalprice"]]

    parts = ds.map_batches(local_topk, batch_format="pandas").materialize()
    if parts.count() <= PIVOT_DRIVER_MAX_ROWS:
        df = parts.to_pandas()
        if len(df.columns) == 0:
            df = pd.DataFrame(
                {
                    "o_custkey": pd.Series([], dtype="int64"),
                    "o_orderkey": pd.Series([], dtype="int64"),
                    "o_totalprice": pd.Series([], dtype="float64"),
                }
            )
        out = finish(df)
    else:
        out = (
            parts.groupby("o_custkey")
            .map_groups(finish, batch_format="pandas")
            .to_pandas()
        )
    for c in ("o_custkey", "rnk", "o_orderkey"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["o_custkey", "rnk"]).reset_index(drop=True)


def q_group_moments(sf_dir: str):
    """Per-(returnflag, linestatus) count / mean / POPULATION VARIANCE of
    quantity — the mergeable second-moment digest: E[X^2]-E[X]^2 turns
    variance into a sum-shaped aggregate (one combiner pass; no second
    scan after the mean like the textbook two-pass algorithm), which is
    what makes it distributable at all.

    Exactness: quantities ride a 1/64 integer grid (covers TPC-H integers
    and binary-grid fractional data; the batch guard raises loudly if a
    value is off-grid), so the shuffled digests (n, sum_q64, sumsq_q4096)
    are association-free exact int64 — Sigma qi^2 stays under 2^63 to
    ~9e11 rows per group at TPC-H magnitudes — and the float mean/var are
    the SAME IEEE expression on the same integers in engine and oracle,
    hence bit-identical with no rounding step."""
    import numpy as np

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity"],
        rows_per_block=100_000,
    )

    def partial(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)
        qi = np.rint(q * 64.0).astype(np.int64)
        if not np.array_equal(qi / 64.0, q):
            raise ValueError("l_quantity off the 1/64 grid; digests inexact")
        tt = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "n_lines": pa.array(np.ones(len(t), np.int64)),
                "sum_q64": pa.array(qi),
                "sumsq_q4096": pa.array(qi * qi),
            }
        )
        g = tt.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("n_lines", "sum"), ("sum_q64", "sum"), ("sumsq_q4096", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "n_lines", "sum_q64", "sumsq_q4096"]
        )

    red, _ = _two_regime_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        ["n_lines", "sum_q64", "sumsq_q4096"],
    )
    df = red.to_pandas()
    if len(df) == 0:
        return pd.DataFrame(
            {
                "l_returnflag": pd.Series([], dtype=object),
                "l_linestatus": pd.Series([], dtype=object),
                "n_lines": pd.Series([], dtype="int64"),
                "sum_q64": pd.Series([], dtype="int64"),
                "sumsq_q4096": pd.Series([], dtype="int64"),
                "mean_qty": pd.Series([], dtype="float64"),
                "var_qty": pd.Series([], dtype="float64"),
            }
        )
    n = df["n_lines"].to_numpy(np.int64).astype(np.float64)
    s = df["sum_q64"].to_numpy(np.int64).astype(np.float64)
    ss = df["sumsq_q4096"].to_numpy(np.int64).astype(np.float64)
    # expression shape pinned to the oracle SQL: identical IEEE ops on
    # identical integers -> bit-identical doubles, no rounding either side
    df["mean_qty"] = s / n / 64.0
    df["var_qty"] = (ss - s * s / n) / n / 4096.0
    for c in ("n_lines", "sum_q64", "sumsq_q4096"):
        df[c] = df[c].astype("int64")
    return (
        df[
            [
                "l_returnflag",
                "l_linestatus",
                "n_lines",
                "sum_q64",
                "sumsq_q4096",
                "mean_qty",
                "var_qty",
            ]
        ]
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )


def _pricing_cells(sf_dir: str) -> pd.DataFrame:
    """The finest-grain (returnflag, linestatus) cells both OLAP rollup
    and cube fold from: ONE combiner pass over lineitem, driver-sized by
    construction (|flags| x |statuses| x blocks partial rows)."""
    import numpy as np

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity"],
        rows_per_block=100_000,
    )

    def cells(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "n_lines": pa.array(np.ones(len(t), np.int64)),
                "sum_qty": t.column("l_quantity"),
            }
        )
        g = tt.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("n_lines", "sum"), ("sum_qty", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "n_lines", "sum_qty"]
        )

    return (
        typed_collect(
            ds.map_batches(cells, batch_format="pyarrow"),
            pa.schema(
                [
                    ("l_returnflag", pa.string()),
                    ("l_linestatus", pa.string()),
                    ("n_lines", pa.int64()),
                    ("sum_qty", pa.float64()),
                ]
            ),
        )
        .groupby(["l_returnflag", "l_linestatus"], as_index=False)[
            ["n_lines", "sum_qty"]
        ]
        .sum()
    )


def q_cube_pricing(sf_dir: str):
    """GROUP BY CUBE (l_returnflag, l_linestatus) — all four grouping
    sets: finest cells, per-flag, per-status, grand total.  Same additive
    trick as q_rollup_pricing (which computes the ROLLUP subset): ONE
    combiner pass yields the finest cells and every other set is a driver
    fold of those cells — the per-status fold is the one the rollup
    lattice omits.  Rolled columns carry the literal 'ALL' (COALESCE'd
    identically in the oracle) so no NULL-ordering convention crosses the
    engine/SQL boundary."""
    base = _pricing_cells(sf_dir)
    by_flag = base.groupby("l_returnflag", as_index=False)[
        ["n_lines", "sum_qty"]
    ].sum()
    by_flag["l_linestatus"] = "ALL"
    by_status = base.groupby("l_linestatus", as_index=False)[
        ["n_lines", "sum_qty"]
    ].sum()
    by_status["l_returnflag"] = "ALL"
    grand = pd.DataFrame(
        {
            "l_returnflag": ["ALL"],
            "l_linestatus": ["ALL"],
            "n_lines": [base["n_lines"].sum()],
            "sum_qty": [base["sum_qty"].sum()],
        }
    )
    out = pd.concat([base, by_flag, by_status, grand], ignore_index=True)
    out["n_lines"] = out["n_lines"].astype("int64")
    out["sum_qty"] = round_half_away(out["sum_qty"].to_numpy(), 2)
    # SQL SUM over zero rows is NULL, not 0: the grand-total fold of an
    # empty input must carry NaN like the oracle's ROLLUP/CUBE row
    out.loc[out["n_lines"] == 0, "sum_qty"] = float("nan")
    return (
        out[["l_returnflag", "l_linestatus", "n_lines", "sum_qty"]]
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )


MOVING_CHUNK_DAYS = 7  # hot-key split width; the tail carry is exact for ANY width


def q_moving_avg_user_spend(sf_dir: str, stage_dir: str = None):
    """Per-purchase 3-row MOVING SUM/AVG of the user's spend — the
    bounded ROWS-frame window (SUM/COUNT OVER (PARTITION BY user ORDER BY
    ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)), completing
    the window family: lag (q_interevent_gap_stats), first/last
    (q_ohlc_daily), unbounded prefix (q_running_user_spend), RANGE frame
    (q_rolling_revenue), rank (q_topk_per_group).

    The distributed trick differs from the prefix scan: a bounded frame
    needs only the K-1 rows IMMEDIATELY BEFORE each chunk, not a running
    offset.  Events shuffle on hot-key-safe (user, time-chunk) keys
    (_session_keys); each group computes its chunk-LOCAL frame sums in
    one vectorized pass; per-(user, chunk) TAIL DIGESTS — the last K-1
    (pos, cents) rows, mergeable under block splits by keeping the
    max-pos candidates (the q_ohlc_daily carry-the-key trick) — reduce to
    the driver, which folds them into per-chunk carry corrections
    (concatenating tails per user in chunk order and taking the last K-1
    before each chunk, across any run of sparse chunks); corrections ride
    a keyed-shuffle JOIN back and fix only each chunk's first K-1 rows.
    The scanned table, consumed twice (digests + fix-up join), is a
    parquet stage checkpoint with crash-resume via ``stage_dir``.

    Cents are int64 both sides, so frame sums are association-free exact;
    moving_avg = sum/n is the same IEEE division on the same integers in
    engine and oracle — bit-identical, no rounding."""
    import os
    import shutil
    import tempfile

    import numpy as np
    import ray.data as rd

    from .sizing import shuffle_partitions
    from .staging import stage_checkpoint

    K = 3  # frame width: current row + 2 preceding
    ds = _read(
        sf_dir,
        "events",
        ["event_id", "ts", "user_id", "event_type", "value"],
        rows_per_block=12_500,
    )
    N_BUCKETS = 64
    chunk_us = np.int64(MOVING_CHUNK_DAYS) * 86_400_000_000

    def bucketize(t: pa.Table) -> pa.Table:
        return _purchase_cents_chunks(t, chunk_us, N_BUCKETS)

    def scan_chunk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "chunk", "ts", "event_id"]).reset_index(
            drop=True
        )
        same = g["user_id"].eq(g["user_id"].shift()) & g["chunk"].eq(
            g["chunk"].shift()
        )
        run = (~same).cumsum().to_numpy()
        grp = g.groupby(run, sort=False)
        g["pos"] = grp.cumcount()
        sh1 = grp["cents"].shift(1).fillna(0).astype("int64")
        sh2 = grp["cents"].shift(2).fillna(0).astype("int64")
        g["local_sum"] = g["cents"] + sh1 + sh2  # frame sum within the chunk
        return g[["event_id", "user_id", "chunk", "pos", "cents", "local_sum"]]

    own_stage = stage_dir is None
    root = tempfile.mkdtemp(prefix="pdfray_moving_") if own_stage else stage_dir
    empty = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "n_window": pd.Series([], dtype="int64"),
            "moving_sum_cents": pd.Series([], dtype="int64"),
            "moving_avg": pd.Series([], dtype="float64"),
        }
    )
    try:
        scanned = stage_checkpoint(
            lambda: ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(scan_chunk, batch_format="pandas"),
            os.path.join(root, "scanned"),
            resume=not own_stage,
            allow_empty=True,
        )
        if scanned is None:  # zero purchases anywhere
            return empty
        n_rows = scanned.count()

        # per-(user, chunk) digests: row count (additive) + the K-1
        # max-pos (pos, cents) tail candidates — block splits only add
        # candidates, the driver merge keeps the true max-pos rows
        def digest(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["user_id", "chunk", "pos"])
            tail = df.groupby(["user_id", "chunk"], sort=False).tail(K - 1)
            return tail[["user_id", "chunk", "pos", "cents"]]

        parts = scanned.map_batches(digest, batch_format="pandas").to_pandas()
        # true last K-1 rows per (user, chunk): the global-max-pos rows are
        # each in SOME block's tail, so merging block tails and re-tailing
        # is exact; pos also yields the chunk row count (max pos + 1)
        t2 = (
            parts.drop_duplicates(["user_id", "chunk", "pos"])
            .sort_values(["user_id", "chunk", "pos"])
            .groupby(["user_id", "chunk"], sort=False)
            .tail(K - 1)
            .reset_index(drop=True)
        )
        # vectorized fold: each tail keeps K-1 rows, so per-user
        # concatenated tails are a faithful suffix — the last two tail
        # rows BEFORE a chunk's first row are the true last two cents,
        # across any run of sparse chunks
        same1 = t2["user_id"].eq(t2["user_id"].shift(1)).to_numpy()
        same2 = t2["user_id"].eq(t2["user_id"].shift(2)).to_numpy()
        c_sh1 = t2["cents"].shift(1).fillna(0).to_numpy(np.int64)
        c_sh2 = t2["cents"].shift(2).fillna(0).to_numpy(np.int64)
        is_first = ~(
            t2["user_id"].eq(t2["user_id"].shift())
            & t2["chunk"].eq(t2["chunk"].shift())
        ).to_numpy()
        fix = t2.loc[is_first, ["user_id", "chunk"]].copy()
        fix["a"] = np.where(same1, c_sh1, 0)[is_first]
        fix["b"] = np.where(same2, c_sh2, 0)[is_first]
        cnts = (
            parts.groupby(["user_id", "chunk"], as_index=False)["pos"]
            .max()
            .rename(columns={"pos": "maxpos"})
            .sort_values(["user_id", "chunk"])
        )
        cnts["cnt"] = cnts["maxpos"] + 1
        cs = cnts.groupby("user_id")["cnt"].cumsum()
        cnts["prior"] = (cs - cnts["cnt"]).clip(upper=K - 1).astype("int64")
        fix = fix.merge(
            cnts[["user_id", "chunk", "prior"]], on=["user_id", "chunk"]
        )
        p = fix["prior"].to_numpy(np.int64)
        a = fix["a"].to_numpy(np.int64)
        b = fix["b"].to_numpy(np.int64)
        fix["add0"] = np.where(p >= 1, a, 0) + np.where(p >= 2, b, 0)
        fix["add1"] = np.where(p >= 1, a, 0)
        fix["n0"] = np.minimum(p, 2) + 1
        fix["n1"] = np.minimum(p, 1) + 2
        fix = fix[["user_id", "chunk", "add0", "add1", "n0", "n1"]].astype(
            "int64"
        )
        off_ds = rd.from_arrow(pa.Table.from_pandas(fix, preserve_index=False))
        n_parts = shuffle_partitions(n_rows)

        def rewrite(df: pd.DataFrame) -> pd.DataFrame:
            pos = df["pos"].to_numpy(np.int64)
            s = df["local_sum"].to_numpy(np.int64).copy()
            s[pos == 0] += df["add0"].to_numpy(np.int64)[pos == 0]
            s[pos == 1] += df["add1"].to_numpy(np.int64)[pos == 1]
            n = np.full(len(df), K, np.int64)
            n[pos == 0] = df["n0"].to_numpy(np.int64)[pos == 0]
            n[pos == 1] = df["n1"].to_numpy(np.int64)[pos == 1]
            out = df[["event_id", "user_id"]].copy()
            out["n_window"] = n
            out["moving_sum_cents"] = s
            return out

        out = (
            scanned.join(
                off_ds,
                join_type="inner",
                num_partitions=n_parts,
                on=("user_id", "chunk"),
            )
            .map_batches(rewrite, batch_format="pandas")
            .to_pandas()
        )
        for c in ("event_id", "user_id", "n_window", "moving_sum_cents"):
            out[c] = out[c].astype("int64")
        # pinned to the oracle's expression: same IEEE division on the
        # same integers -> bit-identical, no rounding either side
        out["moving_avg"] = out["moving_sum_cents"].to_numpy(
            np.int64
        ).astype(np.float64) / out["n_window"].to_numpy(np.int64).astype(
            np.float64
        )
        return out.sort_values("event_id").reset_index(drop=True)
    finally:
        if own_stage:
            shutil.rmtree(root, ignore_errors=True)


# ----------------------------------------------------------------------
def _join_pad(ds, schema: pa.Schema):
    """Make a Dataset safe as an INNER-join side by appending one all-NULL
    row: SQL join semantics drop NULL keys (NULL = NULL is not true), so
    the sentinel can never match — but the side is now guaranteed
    nonempty, and Ray 2.49's hash join cannot hit its all-empty-side
    failure (the side's schema is lost and the Acero probe dies with
    "No match ... FieldRef"; measured: ANY fully-empty side — a filter
    that matched nothing, or an upstream join that produced zero rows —
    kills the join).  Zero materialization, O(1) extra rows — strictly
    better than the count-and-short-circuit guard, which would have to
    execute (and for a mid-chain join output, materialize) the side.

    Valid for INNER sides and the RIGHT side of a left_outer (unmatched
    right rows never surface); NOT for outer fringes that would emit the
    sentinel as an all-null output row."""
    import ray.data as rd

    t = pa.table({f.name: pa.array([None], f.type) for f in schema})
    return ds.union(rd.from_arrow(t))


Q5_REGION = "ASIA"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1997-01-01"


def q5_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape — the registry's first WIDE multiway join: revenue
    per nation from lineitems whose customer AND supplier share a nation
    inside one region, within a one-year order window.

    Plan (the textbook distributed Q5, not a driver loop):
      - region/nation are driver-tiny: the region's nation-key set is
        resolved once and broadcast; customer and supplier are filtered
        AT THE SCAN by that membership set (semi-join pushdown), so every
        exchange below carries region-local rows only;
      - three keyed hash exchanges, each data-proportionally partitioned
        from parquet-footer row counts (sizing.shuffle_partitions):
        orders(date window) JOIN customer ON custkey,
        lineitem JOIN that ON orderkey, JOIN supplier ON suppkey;
      - the local-supplier predicate (c_nationkey = s_nationkey) is a
        post-join vectorized filter, then a per-block combiner collapses
        to one row per nation BEFORE the final tiny groupby
        (_two_regime_sum) — the last exchange moves O(nations x blocks).

    Every join side rides `_join_pad`: Ray 2.49's hash join dies when a
    side is fully empty (a window that matches nothing, a region with no
    customers, or an upstream join producing zero rows) — the null-key
    sentinel keeps each side schema-carrying at zero cost.

    Revenue rides the exact integer grid: cents(l_extendedprice) x
    (100 - d100(l_discount)) is int64-exact (money on the cents grid,
    discount on the 1/100 grid; ties in the x100 scaling round away from
    zero on BOTH sides), safe to ~8e9 rows per nation at TPC-H
    magnitudes; the float revenue is the SAME IEEE division in engine
    and oracle."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from .sizing import shuffle_partitions

    nation = typed_collect(
        _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    )
    region = typed_collect(_read(sf_dir, "region", ["r_regionkey", "r_name"]))
    rkeys = set(region.loc[region["r_name"] == Q5_REGION, "r_regionkey"].tolist())
    nat = nation[nation["n_regionkey"].isin(rkeys)]
    name_map = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    nkeys_ref = ray.put(nat["n_nationkey"].to_numpy(np.int32))

    lo = pc.strptime(Q5_DATE_LO, format="%Y-%m-%d", unit="us").as_py()
    hi = pc.strptime(Q5_DATE_HI, format="%Y-%m-%d", unit="us").as_py()

    n_ord = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows

    cust = _join_pad(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"], rows_per_block=100_000)
        .map_batches(
            warm_stage(_Membership, keys_ref=nkeys_ref, key_col="c_nationkey"),
            batch_format="pyarrow",
        ),
        pa.schema([("c_custkey", pa.int64()), ("c_nationkey", pa.int32())]),
    )

    def ord_project(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        t = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        return t.select(["o_orderkey", "o_custkey"])

    ords = _join_pad(
        _read(
            sf_dir,
            "orders",
            ["o_orderkey", "o_custkey", "o_orderdate"],
            rows_per_block=100_000,
        ).map_batches(ord_project, batch_format="pyarrow"),
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
    )

    ord_cust = ords.join(
        cust,
        join_type="inner",
        num_partitions=shuffle_partitions(n_ord),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def li_project(t: pa.Table) -> pa.Table:
        cents = round_half_away(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        d100 = round_half_away(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "rev": pa.array(cents * (100 - d100)),
            }
        )

    li_schema = pa.schema(
        [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()), ("rev", pa.int64())]
    )
    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        rows_per_block=100_000,
    ).map_batches(li_project, batch_format="pyarrow")

    li_ord = _join_pad(li, li_schema).join(
        _join_pad(
            ord_cust,
            pa.schema(
                [
                    ("o_orderkey", pa.int64()),
                    ("o_custkey", pa.int64()),
                    ("c_nationkey", pa.int32()),
                ]
            ),
        ),
        join_type="inner",
        num_partitions=shuffle_partitions(n_li),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    supp = _join_pad(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
            warm_stage(_Membership, keys_ref=nkeys_ref, key_col="s_nationkey"),
            batch_format="pyarrow",
        ),
        pa.schema([("s_suppkey", pa.int64()), ("s_nationkey", pa.int32())]),
    )

    joined = _join_pad(
        li_ord,
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("rev", pa.int64()),
                ("o_custkey", pa.int64()),
                ("c_nationkey", pa.int32()),
            ]
        ),
    ).join(
        supp,
        join_type="inner",
        num_partitions=shuffle_partitions(n_li),
        on=("l_suppkey",),
        right_on=("s_suppkey",),
    )

    def combine(t: pa.Table) -> pa.Table:
        # local-supplier predicate + per-block combiner to one row/nation
        t = t.filter(
            pc.equal(
                t.column("c_nationkey").cast(pa.int64()),
                t.column("s_nationkey").cast(pa.int64()),
            )
        )
        tt = pa.table(
            {
                "s_nationkey": t.column("s_nationkey").cast(pa.int64()),
                "revenue_x10000": t.column("rev"),
                "n_lineitems": pa.array(np.ones(len(t), np.int64)),
            }
        )
        g = tt.group_by("s_nationkey").aggregate(
            [("revenue_x10000", "sum"), ("n_lineitems", "sum")]
        )
        return g.rename_columns(["s_nationkey", "revenue_x10000", "n_lineitems"])

    red, _ = _two_regime_sum(
        joined.map_batches(combine, batch_format="pyarrow"),
        ["s_nationkey"],
        ["revenue_x10000", "n_lineitems"],
    )
    df = red.to_pandas()
    if len(df) == 0:
        return pd.DataFrame(
            {
                "n_name": pd.Series([], dtype=object),
                "revenue_x10000": pd.Series([], dtype="int64"),
                "revenue": pd.Series([], dtype="float64"),
                "n_lineitems": pd.Series([], dtype="int64"),
            }
        )
    df["n_name"] = df["s_nationkey"].map(name_map)
    # same IEEE division as the oracle on the same exact integers
    df["revenue"] = df["revenue_x10000"].to_numpy(np.int64).astype(np.float64) / 10000.0
    for c in ("revenue_x10000", "n_lineitems"):
        df[c] = df[c].astype("int64")
    return (
        df[["n_name", "revenue_x10000", "revenue", "n_lineitems"]]
        .sort_values("n_name")
        .reset_index(drop=True)
    )


def q_percent_rank_acctbal(sf_dir: str):
    """RANK / DENSE_RANK / PERCENT_RANK of supplier account balances
    within each nation — the rank-window family, computed WITHOUT a
    global sort: ranks over a value are fully determined by the
    per-(group, value) COUNTS, so the pipeline reduces supplier to the
    distinct (s_nationkey, s_acctbal, n_rows) table (one combiner pass +
    _two_regime_sum; the shuffle moves distinct values, not rows), then
    a per-group cumulative pass assigns
        rnk        = 1 + #rows with a smaller value   (ties share it)
        dense_rnk  = #distinct smaller values + 1
        pct_rank   = (rnk - 1) / (n_group - 1)        (0 when n == 1)
    exactly the SQL window definitions.  Output is one row per DISTINCT
    (nation, value) — tie rows project identically, so the oracle's
    SELECT DISTINCT over the windowed table is lossless.

    Scale shape: the cumulative pass is two-regime — driver pandas below
    PIVOT_DRIVER_MAX_ROWS distinct values, per-nation map_groups above
    (a group = one nation's distinct balances, domain-bounded).  The
    float division is the same IEEE expression both sides."""
    import numpy as np

    ds = _read(
        sf_dir, "supplier", ["s_nationkey", "s_acctbal"], rows_per_block=100_000
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.append_column("n_rows", pa.array(np.ones(len(t), np.int64)))
        g = t.group_by(["s_nationkey", "s_acctbal"]).aggregate([("n_rows", "sum")])
        return g.rename_columns(["s_nationkey", "s_acctbal", "n_rows"])

    red, n_red = _two_regime_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["s_nationkey", "s_acctbal"],
        ["n_rows"],
        empty_types={"s_nationkey": pa.int64(), "s_acctbal": pa.float64()},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["s_nationkey", "s_acctbal"]).reset_index(drop=True)
        out = []
        for _, g in df.groupby("s_nationkey", sort=False):
            c = g["n_rows"].to_numpy(np.int64)
            n = int(c.sum())
            rnk = np.concatenate(([0], np.cumsum(c)[:-1])) + 1
            dense = np.arange(1, len(g) + 1, dtype=np.int64)
            if n > 1:
                pct = (rnk - 1).astype(np.float64) / np.float64(n - 1)
            else:
                pct = np.zeros(len(g), np.float64)
            gg = g.copy()
            gg["rnk"] = rnk
            gg["dense_rnk"] = dense
            gg["pct_rank"] = pct
            out.append(gg)
        if not out:
            return pd.DataFrame(
                {
                    "s_nationkey": pd.Series([], dtype="int64"),
                    "s_acctbal": pd.Series([], dtype="float64"),
                    "n_rows": pd.Series([], dtype="int64"),
                    "rnk": pd.Series([], dtype="int64"),
                    "dense_rnk": pd.Series([], dtype="int64"),
                    "pct_rank": pd.Series([], dtype="float64"),
                }
            )
        return pd.concat(out)[
            ["s_nationkey", "s_acctbal", "n_rows", "rnk", "dense_rnk", "pct_rank"]
        ]

    if n_red <= PIVOT_DRIVER_MAX_ROWS:
        df = finish(typed_collect(red))
    else:
        df = (
            red.groupby("s_nationkey")
            .map_groups(finish, batch_format="pandas")
            .to_pandas()
        )
    for c in ("s_nationkey", "n_rows", "rnk", "dense_rnk"):
        df[c] = df[c].astype("int64")
    return df.sort_values(["s_nationkey", "s_acctbal"]).reset_index(drop=True)


def q_corr_qty_discount(sf_dir: str):
    """Pearson correlation of quantity vs discount per returnflag — the
    mergeable BIVARIATE-moment digest: corr is a pure function of
    (n, Sx, Sy, Sxx, Syy, Sxy), each a sum, so ONE combiner pass reduces
    every block to a 6-integer row per group and the exchange moves
    O(groups x blocks) rows.

    Exactness: quantity rides the 1/64 grid (x64 -> int) and discount
    the 1/100 grid (x100 -> int); both scalings are grid-guarded (loud
    raise off-grid), so the digests are association-free exact int64 —
    Sxx <= (3200^2)n keeps every digest under 2^63 to ~9e11 rows per
    group — and the float corr is the SAME IEEE expression on the same
    integers in engine and oracle (cov / sqrt(vx) / sqrt(vy) on the
    n-scaled central sums), hence bit-identical with no rounding.
    Zero variance on either side yields NULL, matching SQL CORR."""
    import numpy as np

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_quantity", "l_discount"],
        rows_per_block=100_000,
    )

    def partial(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)
        d = t.column("l_discount").to_numpy(zero_copy_only=False)
        qi = np.rint(q * 64.0).astype(np.int64)
        di = np.rint(d * 100.0).astype(np.int64)
        if not np.array_equal(qi / 64.0, q):
            raise ValueError("l_quantity off the 1/64 grid; digests inexact")
        if not np.array_equal(di / 100.0, d):
            raise ValueError("l_discount off the 1/100 grid; digests inexact")
        tt = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "n_lines": pa.array(np.ones(len(t), np.int64)),
                "s_q64": pa.array(qi),
                "s_d100": pa.array(di),
                "s_qq": pa.array(qi * qi),
                "s_dd": pa.array(di * di),
                "s_qd": pa.array(qi * di),
            }
        )
        g = tt.group_by("l_returnflag").aggregate(
            [(c, "sum") for c in ("n_lines", "s_q64", "s_d100", "s_qq", "s_dd", "s_qd")]
        )
        return g.rename_columns(
            ["l_returnflag", "n_lines", "s_q64", "s_d100", "s_qq", "s_dd", "s_qd"]
        )

    red, _ = _two_regime_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag"],
        ["n_lines", "s_q64", "s_d100", "s_qq", "s_dd", "s_qd"],
    )
    df = red.to_pandas()
    if len(df) == 0:
        return pd.DataFrame(
            {
                "l_returnflag": pd.Series([], dtype=object),
                "n_lines": pd.Series([], dtype="int64"),
                "corr_qty_disc": pd.Series([], dtype="float64"),
            }
        )
    n = df["n_lines"].to_numpy(np.int64).astype(np.float64)
    sx = df["s_q64"].to_numpy(np.int64).astype(np.float64)
    sy = df["s_d100"].to_numpy(np.int64).astype(np.float64)
    sxx = df["s_qq"].to_numpy(np.int64).astype(np.float64)
    syy = df["s_dd"].to_numpy(np.int64).astype(np.float64)
    sxy = df["s_qd"].to_numpy(np.int64).astype(np.float64)
    # expression shape pinned to the oracle SQL (identical IEEE op order)
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    with np.errstate(divide="ignore", invalid="ignore"):
        corr = cov / np.sqrt(vx) / np.sqrt(vy)
    corr = np.where((vx == 0.0) | (vy == 0.0), np.nan, corr)
    df["corr_qty_disc"] = corr
    df["n_lines"] = df["n_lines"].astype("int64")
    return (
        df[["l_returnflag", "n_lines", "corr_qty_disc"]]
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )


def q_linreg_price_qty(sf_dir: str):
    """Closed-form distributed OLS per returnflag — slope / intercept /
    r² of l_extendedprice ~ l_quantity, the q_corr_qty_discount digest
    pattern extended to the full regression normal equations: OLS over N
    rows is a pure function of (n, Σx, Σy, Σx², Σxy, Σy²), each a sum,
    so ONE combiner pass reduces every block to a digest row per group
    and NOTHING wider than O(groups × blocks) ever moves.

    Exactness: x rides the 1/64 grid (×64 → int) and y the 1/6400 grid
    (×6400 — the lcm of the cents and 1/64 money grids; loud raise
    off-grid), so all six digests are exact integers.  Σy² per 6400-grid
    row reaches ~4.5e17, which overflows int64 within one 100k-row
    block — it is carried as an exact (hi, lo) = (Σ c²>>32, Σ c²&0xffffffff)
    int64 pair and reassembled as a Python int on the driver; the other
    digests stay int64 per block and the driver folds them all as exact
    Python ints (the q_gini fold — at extreme block counts an
    intermediate keyed combine slots in unchanged, the partials are
    additive).  The float slope/intercept/r² are then the SAME IEEE
    expression on the same integers in engine and oracle — bit-identical
    doubles, no rounding either side.  Zero x-variance → NULL slope /
    intercept; zero variance on either axis → NULL r² (matching the SQL
    NULLIF guards)."""
    import numpy as np

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_quantity", "l_extendedprice"],
        rows_per_block=100_000,
    )

    def partial(t: pa.Table) -> pa.Table:
        x = t.column("l_quantity").to_numpy(zero_copy_only=False)
        y = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        xi = np.rint(x * 64.0).astype(np.int64)
        yi = np.rint(y * 6400.0).astype(np.int64)
        if not np.array_equal(xi / 64.0, x):
            raise ValueError("l_quantity off the 1/64 grid; digests inexact")
        if not np.array_equal(yi / 6400.0, y):
            raise ValueError(
                "l_extendedprice off the 1/6400 grid; digests inexact"
            )
        yy = yi * yi  # per-row ≤ ~4.5e17: element-safe, sum-unsafe
        tt = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "n_lines": pa.array(np.ones(len(t), np.int64)),
                "sx": pa.array(xi),
                "sy": pa.array(yi),
                "sxx": pa.array(xi * xi),
                "sxy": pa.array(xi * yi),
                "syy_hi": pa.array(yy >> np.int64(32)),
                "syy_lo": pa.array(yy & np.int64(0xFFFFFFFF)),
            }
        )
        cols = ["n_lines", "sx", "sy", "sxx", "sxy", "syy_hi", "syy_lo"]
        g = tt.group_by("l_returnflag").aggregate([(c, "sum") for c in cols])
        return g.rename_columns(["l_returnflag"] + cols)

    parts = typed_collect(
        ds.map_batches(partial, batch_format="pyarrow"),
        pa.schema(
            [("l_returnflag", pa.string())]
            + [
                (c, pa.int64())
                for c in ("n_lines", "sx", "sy", "sxx", "sxy", "syy_hi", "syy_lo")
            ]
        ),
    )
    rows = []
    for flag, grp in parts.groupby("l_returnflag", sort=True):
        n = sum(int(v) for v in grp["n_lines"])
        sx = sum(int(v) for v in grp["sx"])
        sy = sum(int(v) for v in grp["sy"])
        sxx = sum(int(v) for v in grp["sxx"])
        sxy = sum(int(v) for v in grp["sxy"])
        syy = (sum(int(v) for v in grp["syy_hi"]) << 32) + sum(
            int(v) for v in grp["syy_lo"]
        )
        nf, dsx, dsy = float(n), float(sx), float(sy)
        cov = nf * float(sxy) - dsx * dsy
        vx = nf * float(sxx) - dsx * dsx
        vy = nf * float(syy) - dsy * dsy
        # grid units: y/6400 dollars per x/64 unit → ratio × 64/6400 = 0.01
        slope = cov / vx * 0.01 if vx != 0.0 else np.nan
        intercept = (
            (dsy / 6400.0 - slope * (dsx / 64.0)) / nf if vx != 0.0 else np.nan
        )
        r2 = cov * cov / (vx * vy) if vx * vy != 0.0 else np.nan
        rows.append((flag, n, slope, intercept, r2))
    return pd.DataFrame(
        rows, columns=["l_returnflag", "n_lines", "slope", "intercept", "r2"]
    ).astype(
        {
            "l_returnflag": object,
            "n_lines": "int64",
            "slope": "float64",
            "intercept": "float64",
            "r2": "float64",
        }
    )


def q_mode_event_type(sf_dir: str):
    """Per-user MODE of event_type (most frequent value; ties break to
    the lexicographically-smallest type — a total order, so the result
    is deterministic and layout-invariant).

    Scale shape: mode is not a native mergeable aggregate, but the
    (user, type) COUNT table is — one combiner pass + _two_regime_sum
    reduces the corpus to distinct pairs (bounded by users x event-type
    domain), then a per-user argmax picks the winner: driver pandas when
    the pair table is driver-sized, per-user map_groups above (a group
    is at most |event-type domain| rows)."""
    import numpy as np

    ds = _read(sf_dir, "events", ["user_id", "event_type"], rows_per_block=100_000)

    def partial(t: pa.Table) -> pa.Table:
        t = t.append_column("n_mode", pa.array(np.ones(len(t), np.int64)))
        g = t.group_by(["user_id", "event_type"]).aggregate([("n_mode", "sum")])
        return g.rename_columns(["user_id", "event_type", "n_mode"])

    red, n_red = _two_regime_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id", "event_type"],
        ["n_mode"],
        empty_types={"user_id": pa.int64(), "event_type": pa.string()},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "n_mode", "event_type"], ascending=[True, False, True]
        )
        return df.groupby("user_id", sort=False).head(1)

    if n_red <= PIVOT_DRIVER_MAX_ROWS:
        out = finish(typed_collect(red))
    else:
        out = (
            red.groupby("user_id")
            .map_groups(finish, batch_format="pandas")
            .to_pandas()
        )
    out = out.rename(columns={"event_type": "mode_type"})
    for c in ("user_id", "n_mode"):
        out[c] = out[c].astype("int64")
    return (
        out[["user_id", "mode_type", "n_mode"]]
        .sort_values("user_id")
        .reset_index(drop=True)
    )


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-06-01"
Q3_TOP_N = 10


def q3_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape — the unshipped-orders revenue ranking: for orders
    from one market segment placed before a date, sum the revenue of
    lineitems shipped after it, and keep the top 10 orders.

    Plan (the second wide multiway join after Q5, one exchange fewer):
      - customer is filtered to the segment AT THE SCAN and projected to
        the key column only, then hash-joined with the date-filtered
        orders on custkey (partition count data-proportional via
        sizing.shuffle_partitions);
      - lineitem is filtered on shipdate at the scan, reduced per block
        to (l_orderkey, rev) rows, and joined on orderkey;
      - a per-block combiner collapses to one row per order BEFORE the
        final groupby (`_two_regime_sum` on the (orderkey, orderdate,
        orderpriority) key — orderdate/orderpriority are functionally
        dependent on the orderkey so they ride the key for free);
      - the top 10 is per-block local top-k + driver merge (`_topk`),
        ranked on the INTEGER revenue grid (revenue_x10000 desc,
        l_orderkey asc) so float ties cannot exist, never a global sort.

    Revenue rides the exact integer grid exactly as Q5:
    cents(l_extendedprice) x (100 - d100(l_discount)) is int64-exact and
    the float revenue is the same IEEE division both sides.  Every inner
    side rides `_join_pad` (Ray 2.49's hash join dies on any fully-empty
    side — a segment with no customers or a date window matching
    nothing)."""
    import numpy as np
    import pyarrow.parquet as pq

    from .sizing import shuffle_partitions

    cut = pc.strptime(Q3_DATE, format="%Y-%m-%d", unit="us").as_py()
    n_ord = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows

    def cust_project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("c_mktsegment"), Q3_SEGMENT))
        return t.select(["c_custkey"])

    cust = _join_pad(
        _read(
            sf_dir, "customer", ["c_custkey", "c_mktsegment"], rows_per_block=100_000
        ).map_batches(cust_project, batch_format="pyarrow"),
        pa.schema([("c_custkey", pa.int64())]),
    )

    def ord_project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("o_orderdate"), cut))
        return t.select(["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])

    ords = _join_pad(
        _read(
            sf_dir,
            "orders",
            ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
            rows_per_block=100_000,
        ).map_batches(ord_project, batch_format="pyarrow"),
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )

    ord_cust = ords.join(
        cust,
        join_type="inner",
        num_partitions=shuffle_partitions(n_ord),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def li_project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"), cut))
        cents = round_half_away(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        d100 = round_half_away(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "rev": pa.array(cents * (100 - d100)),
            }
        )

    li = _join_pad(
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
            rows_per_block=100_000,
        ).map_batches(li_project, batch_format="pyarrow"),
        pa.schema([("l_orderkey", pa.int64()), ("rev", pa.int64())]),
    )

    joined = li.join(
        _join_pad(
            ord_cust,
            pa.schema(
                [
                    ("o_orderkey", pa.int64()),
                    ("o_custkey", pa.int64()),
                    ("o_orderdate", pa.timestamp("us")),
                    ("o_orderpriority", pa.string()),
                ]
            ),
        ),
        join_type="inner",
        num_partitions=shuffle_partitions(n_li),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def combine(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "o_orderdate": t.column("o_orderdate"),
                "o_orderpriority": t.column("o_orderpriority"),
                "revenue_x10000": t.column("rev"),
            }
        )
        g = tt.group_by(["l_orderkey", "o_orderdate", "o_orderpriority"]).aggregate(
            [("revenue_x10000", "sum")]
        )
        return g.rename_columns(
            ["l_orderkey", "o_orderdate", "o_orderpriority", "revenue_x10000"]
        )

    red, _ = _two_regime_sum(
        joined.map_batches(combine, batch_format="pyarrow"),
        ["l_orderkey", "o_orderdate", "o_orderpriority"],
        ["revenue_x10000"],
        empty_types={
            "o_orderdate": pa.timestamp("us"),
            "o_orderpriority": pa.string(),
        },
    )
    top = _topk(
        red,
        Q3_TOP_N,
        keys=("revenue_x10000", "l_orderkey"),
        descending=(True, False),
        empty_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
                ("revenue_x10000", pa.int64()),
            ]
        ),
    )
    top = top.copy()
    top["revenue"] = top["revenue_x10000"].to_numpy(np.int64).astype(np.float64) / 10000.0
    top["revenue_x10000"] = top["revenue_x10000"].astype("int64")
    top["l_orderkey"] = top["l_orderkey"].astype("int64")
    return (
        top[["l_orderkey", "o_orderdate", "o_orderpriority", "revenue_x10000", "revenue"]]
        .sort_values(["revenue_x10000", "l_orderkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


NTILE_BUCKETS = 4


def q_ntile_acctbal(sf_dir: str):
    """Global ROW_NUMBER + NTILE over suppliers ordered by
    (s_acctbal, s_suppkey) — the distributed-quartile window, computed
    WITHOUT a global sort: a global row number decomposes into
        rn(row) = (#rows with a smaller s_acctbal)            [prefix]
                + (rank of s_suppkey within its value group)  [local]
    so the plan is (1) one combiner pass reducing supplier to the
    distinct (s_acctbal, n_rows) table (`_two_regime_sum` — the exchange
    moves distinct grid values, not rows), whose driver cumsum yields the
    prefix offsets and the total n; (2) one keyed exchange grouping rows
    by s_acctbal, each group assigning its local suppkey ranks
    vectorized (a group = one grid value's tie set, small on a 1/100
    money grid; the same per-value-group shape q_percent_rank uses).
    NTILE(b) is then a pure function of (rn, n): the first n % b buckets
    hold ceil(n/b) rows, the rest floor(n/b) — integer math, no floats
    anywhere, so the oracle comparison is exact by construction."""
    import numpy as np
    import ray

    ds = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"], rows_per_block=100_000)

    def partial(t: pa.Table) -> pa.Table:
        t = t.append_column("n_rows", pa.array(np.ones(len(t), np.int64)))
        g = t.group_by(["s_acctbal"]).aggregate([("n_rows", "sum")])
        return g.rename_columns(["s_acctbal", "n_rows"])

    red, _ = _two_regime_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["s_acctbal"],
        ["n_rows"],
        empty_types={"s_acctbal": pa.float64()},
    )
    counts = typed_collect(
        red, pa.schema([("s_acctbal", pa.float64()), ("n_rows", pa.int64())])
    ).sort_values("s_acctbal")
    n = int(counts["n_rows"].sum())
    if n == 0:
        return pd.DataFrame(
            {
                "s_suppkey": pd.Series([], dtype="int64"),
                "s_acctbal": pd.Series([], dtype="float64"),
                "rn": pd.Series([], dtype="int64"),
                "tile": pd.Series([], dtype="int64"),
            }
        )
    vals = counts["s_acctbal"].to_numpy(np.float64)
    offs = np.concatenate(([0], np.cumsum(counts["n_rows"].to_numpy(np.int64))[:-1]))
    b = NTILE_BUCKETS
    q, r = divmod(n, b)
    bref = ray.put((vals, offs, n, q, r))

    class Assign:
        def __init__(self):
            self.vals, self.offs, self.n, self.q, self.r = ray.get(bref)

        def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("s_suppkey").reset_index(drop=True)
            v = float(g["s_acctbal"].iloc[0])
            i = int(np.searchsorted(self.vals, v))
            rn = self.offs[i] + 1 + np.arange(len(g), dtype=np.int64)
            head = self.r * (self.q + 1)  # rows in the ceil-sized buckets
            if self.q == 0:
                tile = rn  # n < b: one row per bucket
            else:
                tile = np.where(
                    rn <= head,
                    (rn - 1) // (self.q + 1) + 1,
                    self.r + (rn - 1 - head) // self.q + 1,
                )
            g = g.copy()
            g["rn"] = rn
            g["tile"] = tile.astype(np.int64)
            return g

    from .textops import warm_factory

    out = (
        ds.groupby("s_acctbal")
        .map_groups(warm_factory(("ntile", bref.hex()), Assign), batch_format="pandas")
        .to_pandas()
    )
    for c in ("s_suppkey", "rn", "tile"):
        out[c] = out[c].astype("int64")
    return (
        out[["s_suppkey", "s_acctbal", "rn", "tile"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


Q4_DATE_LO = "1997-01-01"
Q4_DATE_HI = "1997-04-01"
Q4_LATE_DAYS = 60


def q4_order_priority(sf_dir: str):
    """TPC-H Q4 shape (reference has no SQL layer; dataflow parity target
    is the EXISTS-semi-join family) — priority distribution of orders with
    at least one LATE lineitem (shipped more than 60 days after the order
    date) inside one quarter.

    Plan: the EXISTS collapses to a per-order MAX — "any lineitem shipped
    after the cutoff" == "the latest shipment is after the cutoff" — so
    each lineitem block reduces to (l_orderkey, max ship_us) partials
    BEFORE the exchange (hot-key immune: a million-line order still emits
    one partial row per block).  The partials hash-join the
    window-filtered orders (both sides `_join_pad`ed against the
    empty-side Acero failure), lateness is a vectorized int64 compare,
    and the per-order OR rides `_two_regime_sum` (sum of late flags per
    order >= 1 — partials of the same order from different blocks merge
    additively).  The final priority histogram is a per-block combiner +
    driver sum: O(priorities x blocks) rows move.  Counting is pure
    int64 end to end — no float can flip the value hash."""
    import numpy as np
    import pyarrow.parquet as pq

    from .sizing import shuffle_partitions

    lo = pc.strptime(Q4_DATE_LO, format="%Y-%m-%d", unit="us").as_py()
    hi = pc.strptime(Q4_DATE_HI, format="%Y-%m-%d", unit="us").as_py()
    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows

    def ord_window(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        t = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_priority": t.column("o_orderpriority"),
                "date_us": t.column("o_orderdate").cast(pa.int64()),
            }
        )

    ords = _join_pad(
        _read(
            sf_dir,
            "orders",
            ["o_orderkey", "o_orderdate", "o_orderpriority"],
            rows_per_block=100_000,
        ).map_batches(ord_window, batch_format="pyarrow"),
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_priority", pa.string()),
                ("date_us", pa.int64()),
            ]
        ),
    )

    def li_partial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "ship_us": t.column("l_shipdate").cast(pa.int64()),
            }
        )
        g = tt.group_by("l_orderkey").aggregate([("ship_us", "max")])
        return g.rename_columns(["l_orderkey", "ship_us"])

    li = _join_pad(
        _read(
            sf_dir, "lineitem", ["l_orderkey", "l_shipdate"], rows_per_block=100_000
        ).map_batches(li_partial, batch_format="pyarrow"),
        pa.schema([("l_orderkey", pa.int64()), ("ship_us", pa.int64())]),
    )

    joined = li.join(
        ords,
        join_type="inner",
        num_partitions=shuffle_partitions(n_li),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    late_us = Q4_LATE_DAYS * 86_400_000_000

    def flag(t: pa.Table) -> pa.Table:
        late = pc.cast(
            pc.greater(
                t.column("ship_us"),
                pc.add(t.column("date_us"), pa.scalar(late_us, pa.int64())),
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "o_priority": t.column("o_priority"),
                "late": late,
            }
        )

    red, _ = _two_regime_sum(
        joined.map_batches(flag, batch_format="pyarrow"),
        ["l_orderkey", "o_priority"],
        ["late"],
        empty_types={"o_priority": pa.string()},
    )

    def prio_counts(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("late"), pa.scalar(1, pa.int64())))
        g = (
            pa.table(
                {
                    "o_orderpriority": t.column("o_priority"),
                    "order_count": pa.array(np.ones(len(t), np.int64)),
                }
            )
            .group_by("o_orderpriority")
            .aggregate([("order_count", "sum")])
        )
        return g.rename_columns(["o_orderpriority", "order_count"])

    parts = typed_collect(
        red.map_batches(prio_counts, batch_format="pyarrow"),
        pa.schema([("o_orderpriority", pa.string()), ("order_count", pa.int64())]),
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "o_orderpriority": pd.Series([], dtype=object),
                "order_count": pd.Series([], dtype="int64"),
            }
        )
    out = parts.groupby("o_orderpriority", as_index=False)["order_count"].sum()
    out["order_count"] = out["order_count"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


Q17_BRAND = "Brand#3"


def q17_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape — revenue from small-quantity lineitems (quantity
    below 20% of the part's own average order quantity) over one brand:
    the correlated-scalar-subquery family (a per-group mean feeding a
    per-row predicate in the same table).

    Plan: the brand's part keys broadcast as a membership filter at the
    scan (part is a dimension table); the surviving lineitems make ONE
    keyed exchange (groupby l_partkey) and each group resolves its own
    threshold locally — average and predicate inside map_groups, emitting
    one (n_small, cents) partial row per part.  The driver sums the tiny
    per-part partials.  The threshold rides the exact integer grid:
    qty < 0.2 * (sum/cnt)  <=>  5*q100*cnt < sum(q100)  with q100 the
    HALF-AWAY-rounded qty*100 (same ROUND in the oracle; truncation via
    astype would diverge from DuckDB's CAST rounding on fractional
    quantities) — no float division decides membership, so an
    avg-boundary row can never flip (the t_gopher_rules
    cross-multiplication trick).  The one float emitted (avg_yearly) is
    the SAME IEEE division chain on both sides."""
    import numpy as np
    import ray

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])

    def brand_keys(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("p_brand"), pa.scalar(Q17_BRAND))
        return pa.table({"p_partkey": t.filter(m).column("p_partkey")})

    keys = typed_collect(
        part.map_batches(brand_keys, batch_format="pyarrow"),
        pa.schema([("p_partkey", pa.int64())]),
    )["p_partkey"].unique()
    keys_ref = ray.put(keys)

    li = _read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice"],
        rows_per_block=100_000,
    ).map_batches(
        warm_stage(_Membership, keys_ref=keys_ref, key_col="l_partkey"),
        batch_format="pyarrow",
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        q100 = round_half_away(
            g["l_quantity"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        cents = round_half_away(
            g["l_extendedprice"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        small = q100 * 5 * len(g) < q100.sum()
        return pd.DataFrame(
            {"n_small": [int(small.sum())], "cents": [int(cents[small].sum())]}
        )

    parts = typed_collect(
        li.groupby("l_partkey").map_groups(per_part, batch_format="pandas"),
        pa.schema([("n_small", pa.int64()), ("cents", pa.int64())]),
    )
    n_small = int(parts["n_small"].sum()) if len(parts) else 0
    cents = int(parts["cents"].sum()) if len(parts) else 0
    avg_yearly = float(round_half_away(cents / 100.0 / 7.0, 2))
    return pd.DataFrame(
        {
            "n_small": pd.Series([n_small], dtype="int64"),
            "cents_total": pd.Series([cents], dtype="int64"),
            "avg_yearly": pd.Series([avg_yearly], dtype="float64"),
        }
    )


Q16_EXCL_BRAND = "Brand#5"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 4, 9, 16, 25, 36, 49)


def q16_supplier_variety(sf_dir: str):
    """TPC-H Q16 shape — how many distinct suppliers ship each qualifying
    (brand, type, size) part class, excluding one brand, one type and the
    negative-balance suppliers (the complaints stand-in): COUNT(DISTINCT)
    per group composed with a broadcast anti-join.

    Plan: part attributes and the bad-supplier set are dimension tables —
    `ray.put` once, applied as vectorized lookup / NOT-IN at the scan.
    Each lineitem block then reduces to its LOCAL distinct
    (brand, type, size, suppkey) rows (the combiner — template-heavy
    blocks collapse hard), and one exchange keyed on the full 4-tuple
    dedups globally (`_two_regime_sum`: driver pandas below 2M reduced
    rows, Ray groupby above).  The class histogram is then a per-block
    count + driver sum — correct because the global dedup leaves each
    (class, supplier) pair in exactly one row.  The distinct table is
    bounded by |classes| x |suppliers|, never by lineitem row count."""
    import numpy as np
    import ray

    from .textops import warm_factory

    part = typed_collect(
        _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
    )
    if len(part):
        keep = (
            (part["p_brand"] != Q16_EXCL_BRAND)
            & (part["p_type"] != Q16_EXCL_TYPE)
            & part["p_size"].isin(Q16_SIZES)
        )
        part = part[keep]
    attr_ref = ray.put(
        (
            part["p_partkey"].to_numpy(np.int64),
            part["p_brand"].to_numpy(object),
            part["p_type"].to_numpy(object),
            part["p_size"].to_numpy(np.int64),
        )
    )
    supp = typed_collect(_read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]))
    bad = (
        supp.loc[supp["s_acctbal"] < 0, "s_suppkey"].to_numpy(np.int64)
        if len(supp)
        else np.array([], np.int64)
    )
    bad_ref = ray.put(bad)

    class Classes:
        def __init__(self):
            pk, br, ty, sz = ray.get(attr_ref)
            self.pk = pa.array(pk)
            self.br = pa.array(br, pa.string())
            self.ty = pa.array(ty, pa.string())
            self.sz = pa.array(sz, pa.int64())
            self.bad = pa.array(ray.get(bad_ref))

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(
                pc.invert(pc.is_in(t.column("l_suppkey"), value_set=self.bad))
            )
            idx = pc.index_in(t.column("l_partkey"), value_set=self.pk)
            ok = pc.is_valid(idx)  # dangling/excluded part keys drop (inner)
            t, idx = t.filter(ok), idx.filter(ok)
            tt = pa.table(
                {
                    "p_brand": pc.take(self.br, idx),
                    "p_type": pc.take(self.ty, idx),
                    "p_size": pc.take(self.sz, idx),
                    "l_suppkey": t.column("l_suppkey"),
                    "n": pa.array(np.ones(len(t), np.int64)),
                }
            )
            g = tt.group_by(["p_brand", "p_type", "p_size", "l_suppkey"]).aggregate(
                [("n", "sum")]
            )
            return g.rename_columns(
                ["p_brand", "p_type", "p_size", "l_suppkey", "n"]
            )

    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_suppkey"], rows_per_block=100_000
    ).map_batches(
        warm_factory(("q16", attr_ref.hex()), Classes), batch_format="pyarrow"
    )

    red, _ = _two_regime_sum(
        li,
        ["p_brand", "p_type", "p_size", "l_suppkey"],
        ["n"],
        empty_types={"p_brand": pa.string(), "p_type": pa.string()},
    )

    def cls_counts(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "p_brand": t.column("p_brand"),
                "p_type": t.column("p_type"),
                "p_size": t.column("p_size"),
                "supplier_cnt": pa.array(np.ones(len(t), np.int64)),
            }
        )
        g = tt.group_by(["p_brand", "p_type", "p_size"]).aggregate(
            [("supplier_cnt", "sum")]
        )
        return g.rename_columns(["p_brand", "p_type", "p_size", "supplier_cnt"])

    parts = typed_collect(
        red.map_batches(cls_counts, batch_format="pyarrow"),
        pa.schema(
            [
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int64()),
                ("supplier_cnt", pa.int64()),
            ]
        ),
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "p_brand": pd.Series([], dtype=object),
                "p_type": pd.Series([], dtype=object),
                "p_size": pd.Series([], dtype="int64"),
                "supplier_cnt": pd.Series([], dtype="int64"),
            }
        )
    out = parts.groupby(["p_brand", "p_type", "p_size"], as_index=False)[
        "supplier_cnt"
    ].sum()
    for c in ("p_size", "supplier_cnt"):
        out[c] = out[c].astype("int64")
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
    ).reset_index(drop=True)


def q_user_set_ops(sf_dir: str):
    """Distinct-user set algebra between two event types — INTERSECT /
    EXCEPT cardinalities (purchasers vs clickers: both, purchase-only,
    click-only).  ONE exchange total: each block reduces to per-user max
    flags (the combiner), `_two_regime_sum` merges the flags per user,
    and the five set cardinalities are a per-block histogram + driver
    sum.  Nothing user-count-sized ever lands on the driver."""
    import numpy as np

    ev = _read(sf_dir, "events", ["user_id", "event_type"], rows_per_block=500_000)

    def flags(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        is_p = pc.cast(pc.equal(et, pa.scalar("purchase")), pa.int64())
        is_c = pc.cast(pc.equal(et, pa.scalar("click")), pa.int64())
        keep = pc.or_(pc.equal(is_p, 1), pc.equal(is_c, 1))
        tt = pa.table(
            {"user_id": t.column("user_id"), "p": is_p, "c": is_c}
        ).filter(keep)
        g = tt.group_by("user_id").aggregate([("p", "max"), ("c", "max")])
        return g.rename_columns(["user_id", "p", "c"])

    red, _ = _two_regime_sum(
        ev.map_batches(flags, batch_format="pyarrow"), ["user_id"], ["p", "c"]
    )

    cols = (
        "n_purchase_users",
        "n_click_users",
        "n_both",
        "n_purchase_only",
        "n_click_only",
    )

    def counts(t: pa.Table) -> pa.Table:
        p = t.column("p").to_numpy(zero_copy_only=False) > 0
        c = t.column("c").to_numpy(zero_copy_only=False) > 0
        vals = (p.sum(), c.sum(), (p & c).sum(), (p & ~c).sum(), (c & ~p).sum())
        return pa.table(
            {k: pa.array([int(v)], pa.int64()) for k, v in zip(cols, vals)}
        )

    parts = typed_collect(
        red.map_batches(counts, batch_format="pyarrow"),
        pa.schema([(k, pa.int64()) for k in cols]),
    )
    return pd.DataFrame(
        {
            k: pd.Series([int(parts[k].sum()) if len(parts) else 0], dtype="int64")
            for k in cols
        }
    )


PR_ITERS = 3
PR_SCALE = 1_000_000_000


def _shipment_edge_list(sf_dir: str):
    """The bipartite part<->supplier shipment graph as a globally-deduped
    directed edge Dataset (node ids: part = 2k, supplier = 2k+1 —
    disjoint id spaces; both directions emitted), shared by
    q_pagerank_bipartite and q_bfs_reach.  lineitem reduces per block to
    LOCAL-distinct pairs, then ONE pair-keyed exchange dedups globally
    (`_two_regime_sum`)."""
    import numpy as np

    def pair_combiner(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy(zero_copy_only=False)
        s = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        u = np.concatenate([2 * p, 2 * s + 1])
        v = np.concatenate([2 * s + 1, 2 * p])
        tt = pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "n": pa.array(np.ones(len(u), np.int64)),
            }
        )
        g = tt.group_by(["u", "v"]).aggregate([("n", "sum")])
        return g.rename_columns(["u", "v", "n"])

    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_suppkey"], rows_per_block=100_000
    ).map_batches(pair_combiner, batch_format="pyarrow")
    edges_red, _ = _two_regime_sum(li, ["u", "v"], ["n"])
    return edges_red


def q_pagerank_bipartite(sf_dir: str, stage_dir: str = None):
    """Distributed PageRank (3 fixed iterations, damping 0.85) over the
    bipartite supplier<->part shipment graph — the iterative-graph family
    beyond connected components — in FIXED-POINT integer arithmetic so
    the oracle is EXACT: ranks are scaled by 1e9, each contribution is
    floor(r/outdeg) and damping is (85*sum)//100, all int64, so the
    result is independent of summation order and replayable verbatim by
    three unrolled SQL CTEs (a float PageRank could never hash-match: its
    per-node sums depend on reduction order).

    Plan: lineitem reduces per block to LOCAL-distinct directed node
    pairs (part = 2k, supplier = 2k+1 — disjoint id spaces), ONE
    pair-keyed exchange dedups globally, and the edge list lands in a
    parquet stage checkpoint (it is read once per iteration: streaming
    re-reads of files, never an object-store pin; crash-resume free).
    Degrees are one more combiner + `_two_regime_sum`.  Each iteration
    joins r(u)/deg(u) onto the edges: below PIVOT_DRIVER_MAX_ROWS nodes
    the contribution array broadcasts (`ray.put`) and one map_batches
    over the edge files emits per-block Arrow-grouped int64 partial sums
    per destination; above it the same step is an edges-by-ranks hash
    join + `_two_regime_sum` keyed on the destination (pinned equal to
    the broadcast path by a monkeypatch test).  Overflow headroom:
    damped sums stay under 2^63 to ~1e8 graph nodes at this scale
    constant; shrink PR_SCALE for larger graphs.
    """
    import shutil
    import tempfile

    import numpy as np
    import ray

    from .staging import stage_checkpoint

    empty = pd.DataFrame(
        {
            "node_type": pd.Series([], dtype=object),
            "key": pd.Series([], dtype="int64"),
            "pr_x1e9": pd.Series([], dtype="int64"),
        }
    )

    edges_red = _shipment_edge_list(sf_dir)

    tmp = None
    if stage_dir is None:
        tmp = stage_dir = tempfile.mkdtemp(prefix="pdfray_pr_")
    try:
        edges = stage_checkpoint(
            lambda: edges_red.select_columns(["u", "v"]),
            os.path.join(stage_dir, "edges"),
            allow_empty=True,
        )
        if edges is None:  # empty corpus: empty graph
            return empty

        def deg_combiner(t: pa.Table) -> pa.Table:
            tt = pa.table(
                {
                    "u": t.column("u"),
                    "deg": pa.array(np.ones(len(t), np.int64)),
                }
            )
            g = tt.group_by("u").aggregate([("deg", "sum")])
            return g.rename_columns(["u", "deg"])

        deg_red, n_nodes = _two_regime_sum(
            edges.map_batches(deg_combiner, batch_format="pyarrow"), ["u"], ["deg"]
        )
        base = 15 * PR_SCALE // 100

        if 0 < n_nodes <= PIVOT_DRIVER_MAX_ROWS:
            # broadcast regime: contribution array ships once per
            # iteration; edge files stream; partials are per-block
            # Arrow-grouped int64 sums (exact, order-free)
            degf = deg_red.to_pandas().sort_values("u").reset_index(drop=True)
            nodes = degf["u"].to_numpy(np.int64)
            degs = degf["deg"].to_numpy(np.int64)
            r = np.full(len(nodes), PR_SCALE, np.int64)
            for _ in range(PR_ITERS):
                contrib = r // degs
                ref = ray.put((nodes, contrib))

                class Push:
                    def __init__(self):
                        self.nodes, self.contrib = ray.get(ref)

                    def __call__(self, t: pa.Table) -> pa.Table:
                        iu = np.searchsorted(
                            self.nodes,
                            t.column("u").to_numpy(zero_copy_only=False),
                        )
                        tt = pa.table(
                            {
                                "v": t.column("v"),
                                "c": pa.array(self.contrib[iu], pa.int64()),
                            }
                        )
                        g = tt.group_by("v").aggregate([("c", "sum")])
                        return g.rename_columns(["v", "c"])

                from .textops import warm_factory

                parts = typed_collect(
                    edges.map_batches(
                        warm_factory(("pr_push", ref.hex()), Push),
                        batch_format="pyarrow",
                    ),
                    pa.schema([("v", pa.int64()), ("c", pa.int64())]),
                )
                sums = parts.groupby("v", as_index=False)["c"].sum()
                acc = np.zeros(len(nodes), np.int64)
                iv = np.searchsorted(nodes, sums["v"].to_numpy(np.int64))
                acc[iv] = sums["c"].to_numpy(np.int64)
                r = base + (85 * acc) // 100
            out = pd.DataFrame(
                {
                    "node_type": np.where(nodes % 2 == 0, "part", "supplier"),
                    "key": nodes // 2,
                    "pr_x1e9": r,
                }
            )
        else:
            # join regime (nodes exceed the driver bound): the SAME
            # integer recurrence as two hash exchanges per iteration
            from .sizing import shuffle_partitions

            deg_schema = pa.schema([("u", pa.int64()), ("deg", pa.int64())])
            ranks = deg_red.map_batches(
                lambda t: pa.table(
                    {
                        "u": t.column("u"),
                        "deg": t.column("deg"),
                        "r": pa.array(
                            np.full(len(t), PR_SCALE, np.int64), pa.int64()
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            rk_schema = pa.schema(
                [("u", pa.int64()), ("deg", pa.int64()), ("r", pa.int64())]
            )
            edge_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])
            n_edges = edges.count()
            for _ in range(PR_ITERS):
                joined = _join_pad(edges, edge_schema).join(
                    _join_pad(ranks.rename_columns({"u": "ru"}), 
                              pa.schema([("ru", pa.int64()), ("deg", pa.int64()), ("r", pa.int64())])),
                    join_type="inner",
                    num_partitions=shuffle_partitions(n_edges),
                    on=("u",),
                    right_on=("ru",),
                )

                def contrib(t: pa.Table) -> pa.Table:
                    c = t.column("r").to_numpy(zero_copy_only=False) // t.column(
                        "deg"
                    ).to_numpy(zero_copy_only=False)
                    tt = pa.table(
                        {"v": t.column("v"), "c": pa.array(c, pa.int64())}
                    )
                    g = tt.group_by("v").aggregate([("c", "sum")])
                    return g.rename_columns(["v", "c"])

                sums, _n = _two_regime_sum(
                    joined.map_batches(contrib, batch_format="pyarrow"),
                    ["v"],
                    ["c"],
                )
                new_ranks = sums.map_batches(
                    lambda t: pa.table(
                        {
                            "u": t.column("v"),
                            "r": pa.array(
                                base
                                + (
                                    85
                                    * t.column("c").to_numpy(zero_copy_only=False)
                                )
                                // 100,
                                pa.int64(),
                            ),
                        }
                    ),
                    batch_format="pyarrow",
                )
                ranks = _join_pad(
                    new_ranks, pa.schema([("u", pa.int64()), ("r", pa.int64())])
                ).join(
                    _join_pad(
                        deg_red.rename_columns({"u": "du"}),
                        pa.schema([("du", pa.int64()), ("deg", pa.int64())]),
                    ),
                    join_type="inner",
                    num_partitions=shuffle_partitions(max(n_nodes, 1)),
                    on=("u",),
                    right_on=("du",),
                ).select_columns(["u", "deg", "r"])
            rf = typed_collect(ranks, rk_schema)
            nodes = rf["u"].to_numpy(np.int64)
            out = pd.DataFrame(
                {
                    "node_type": np.where(nodes % 2 == 0, "part", "supplier"),
                    "key": nodes // 2,
                    "pr_x1e9": rf["r"].to_numpy(np.int64),
                }
            )
        for c in ("key", "pr_x1e9"):
            out[c] = out[c].astype("int64")
        return (
            out.sort_values(["node_type", "key"]).reset_index(drop=True)
        )
    finally:
        if tmp is not None:
            shutil.rmtree(tmp, ignore_errors=True)


INC_CUTOFF = "2024-01-20"


BFS_SEED_MOD = 10  # suppliers with s_suppkey % MOD == 0 are the seed set
BFS_MAX_HOP = 3


def q_bfs_reach(sf_dir: str, stage_dir: str = None):
    """Multi-source BFS reachability — MIN hop distance (0..BFS_MAX_HOP)
    from the seed suppliers over the bipartite shipment graph — the
    TRAVERSAL member of the graph family (components, PageRank, motif
    counting exist; this is frontier expansion).  Seeds are a catalog
    subset (s_suppkey % 10 == 0) and report hop 0 even when isolated —
    the seed list is dimension-sized, the same broadcast assumption as
    every catalog lookup.

    Plan: the shared `_shipment_edge_list` (one pair-keyed dedup
    exchange) lands in a parquet stage checkpoint read once per hop.
    Each hop expands the frontier in one of two regimes, exactly the
    q_pagerank_bipartite split: a driver-bounded frontier broadcasts
    (`ray.put` sorted array; edge files stream through one map that
    emits per-block-distinct neighbors), a larger one rides an
    edges⋈frontier hash join + distinct reduce (pinned equal to the
    broadcast path by a monkeypatch test).  Visited-set subtraction is
    exact on the driver — node ids are catalog-order (parts +
    suppliers), never corpus-order.  BFS level sets are
    deterministic regardless of expansion order, so the oracle is the
    recurrence unrolled as chained CTEs (the PageRank-unroll pattern)."""
    import shutil
    import tempfile

    import numpy as np
    import ray
    import ray.data as rd

    from .staging import stage_checkpoint

    empty = pd.DataFrame(
        {
            "node_type": pd.Series([], dtype=object),
            "key": pd.Series([], dtype="int64"),
            "hop": pd.Series([], dtype="int64"),
        }
    )
    supp = typed_collect(_read(sf_dir, "supplier", ["s_suppkey"]))
    if len(supp) == 0:
        return empty
    sk = supp["s_suppkey"].to_numpy(np.int64)
    seeds = np.sort(2 * sk[sk % BFS_SEED_MOD == 0] + 1)
    if len(seeds) == 0:
        return empty

    tmp = None
    if stage_dir is None:
        tmp = stage_dir = tempfile.mkdtemp(prefix="pdfray_bfs_")
    try:
        edges = stage_checkpoint(
            lambda: _shipment_edge_list(sf_dir).select_columns(["u", "v"]),
            os.path.join(stage_dir, "edges"),
            allow_empty=True,
        )
        visited = set(int(x) for x in seeds)
        levels = {0: sorted(visited)}
        frontier = seeds
        for hop in range(1, BFS_MAX_HOP + 1):
            if edges is None or len(frontier) == 0:
                break
            if len(frontier) <= PIVOT_DRIVER_MAX_ROWS:
                ref = ray.put(np.sort(frontier))

                class Expand:
                    def __init__(self):
                        self.f = ray.get(ref)

                    def __call__(self, t: pa.Table) -> pa.Table:
                        u = t.column("u").to_numpy(zero_copy_only=False)
                        v = t.column("v").to_numpy(zero_copy_only=False)
                        hit = np.unique(v[np.isin(u, self.f)])
                        return pa.table({"v": pa.array(hit, pa.int64())})

                from .textops import warm_factory

                nb = typed_collect(
                    edges.map_batches(
                        warm_factory(("bfs_expand", ref.hex()), Expand),
                        batch_format="pyarrow",
                    ),
                    pa.schema([("v", pa.int64())]),
                )["v"].to_numpy(np.int64)
            else:
                # join regime: frontier exceeds the driver bound — one
                # edges-by-frontier hash exchange + distinct reduce
                from .sizing import shuffle_partitions

                fr = rd.from_arrow(
                    pa.table({"fu": pa.array(np.sort(frontier), pa.int64())})
                )
                edge_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])
                joined = _join_pad(edges, edge_schema).join(
                    _join_pad(fr, pa.schema([("fu", pa.int64())])),
                    join_type="inner",
                    num_partitions=shuffle_partitions(edges.count()),
                    on=("u",),
                    right_on=("fu",),
                )

                def distinct_v(t: pa.Table) -> pa.Table:
                    v = np.unique(t.column("v").to_numpy(zero_copy_only=False))
                    return pa.table({"v": pa.array(v, pa.int64())})

                nb = typed_collect(
                    joined.map_batches(distinct_v, batch_format="pyarrow"),
                    pa.schema([("v", pa.int64())]),
                )["v"].to_numpy(np.int64)
            new = sorted(set(int(x) for x in nb) - visited)
            if not new:
                break
            levels[hop] = new
            visited.update(new)
            frontier = np.array(new, np.int64)
        rows_node, rows_hop = [], []
        for hop, nodes in levels.items():
            rows_node.extend(nodes)
            rows_hop.extend([hop] * len(nodes))
        nodes = np.array(rows_node, np.int64)
        out = pd.DataFrame(
            {
                "node_type": np.where(nodes % 2 == 0, "part", "supplier").astype(
                    object
                ),
                "key": pd.Series(nodes // 2, dtype="int64"),
                "hop": pd.Series(rows_hop, dtype="int64"),
            }
        )
        return out.sort_values(["hop", "node_type", "key"]).reset_index(
            drop=True
        )
    finally:
        if tmp is not None:
            shutil.rmtree(tmp, ignore_errors=True)


def q_incremental_rollup(sf_dir: str, stage_dir: str = None):
    """Incremental materialized-view maintenance: a per-(event_type, day)
    COUNT/SUM rollup whose BASE partition (ts < cutoff) is aggregated
    ONCE and persisted as a parquet state checkpoint; each run then scans
    only the DELTA (ts >= cutoff) and merges additively — the production
    shape for daily ingest, where re-scanning the full history every run
    is the scale-killer.  Value sums ride the exact integer grid (per-row
    half-away x100, additive merge), so incremental == full-recompute
    bit-for-bit — exactly what the oracle asserts by recomputing the
    whole view from scratch in SQL.  Crash-resume: a rerun with the same
    stage_dir skips the base scan entirely (`stage_checkpoint`'s _DONE
    discipline); the checkpoint holds REDUCED partials, never raw events."""
    import shutil
    import tempfile

    import numpy as np

    from .staging import stage_checkpoint

    cut = pc.strptime(INC_CUTOFF, format="%Y-%m-%d", unit="us").as_py()
    day_us = 86_400_000_000

    def partials(base_side: bool):
        def combiner(t: pa.Table) -> pa.Table:
            ts = t.column("ts")
            mask = pc.less(ts, cut) if base_side else pc.greater_equal(ts, cut)
            t = t.filter(mask)
            ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            day = np.floor_divide(ts_us, day_us)  # floor: pre-epoch safe
            cents = round_half_away(
                t.column("value").to_numpy(zero_copy_only=False) * 100.0, 0
            ).astype(np.int64)
            tt = pa.table(
                {
                    "event_type": t.column("event_type"),
                    "day_code": pa.array(day, pa.int64()),
                    "n_events": pa.array(np.ones(len(t), np.int64)),
                    "cents": pa.array(cents, pa.int64()),
                }
            )
            g = tt.group_by(["event_type", "day_code"]).aggregate(
                [("n_events", "sum"), ("cents", "sum")]
            )
            return g.rename_columns(["event_type", "day_code", "n_events", "cents"])

        return _read(
            sf_dir, "events", ["ts", "event_type", "value"], rows_per_block=500_000
        ).map_batches(combiner, batch_format="pyarrow")

    schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("day_code", pa.int64()),
            ("n_events", pa.int64()),
            ("cents", pa.int64()),
        ]
    )
    tmp = None
    if stage_dir is None:
        tmp = stage_dir = tempfile.mkdtemp(prefix="pdfray_incroll_")
    try:
        base = stage_checkpoint(
            lambda: partials(True),
            os.path.join(stage_dir, "base_rollup"),
            allow_empty=True,
        )
        delta = partials(False)
        merged = delta if base is None else delta.union(base)
        red, _ = _two_regime_sum(
            merged,
            ["event_type", "day_code"],
            ["n_events", "cents"],
            empty_types={"event_type": pa.string()},
        )
        df = typed_collect(red, schema)
    finally:
        if tmp is not None:
            shutil.rmtree(tmp, ignore_errors=True)
    if len(df) == 0:
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "day": pd.Series([], dtype=object),
                "n_events": pd.Series([], dtype="int64"),
                "sum_cents": pd.Series([], dtype="int64"),
                "sum_value": pd.Series([], dtype="float64"),
            }
        )
    df["day"] = pd.to_datetime(
        df["day_code"].to_numpy(np.int64) * day_us, unit="us"
    ).strftime("%Y-%m-%d")
    df = df.rename(columns={"cents": "sum_cents"})
    # same IEEE division as the oracle on the same exact integers
    df["sum_value"] = df["sum_cents"].to_numpy(np.int64).astype(np.float64) / 100.0
    for c in ("n_events", "sum_cents"):
        df[c] = df[c].astype("int64")
    return (
        df[["event_type", "day", "n_events", "sum_cents", "sum_value"]]
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )


Q10_DATE_LO = "1996-07-01"
Q10_DATE_HI = "1996-10-01"
Q10_TOP_N = 20


def q10_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape — top customers by revenue lost to returned items:
    for orders placed in one quarter, sum the revenue of their RETURNED
    lineitems per customer, enrich with the customer's nation, and keep
    the top 20.

    Plan (Q3's join spine plus a customer-sized dimension join):
      - lineitem is filtered to l_returnflag = 'R' at the scan and
        reduced per block to (l_orderkey, rev) integer rows; orders is
        window-filtered and projected to (o_orderkey, o_custkey); one
        keyed hash exchange joins them (partition count from
        parquet-footer row counts via sizing.shuffle_partitions);
      - a per-block combiner collapses to one row per customer before
        `_two_regime_sum` on o_custkey — the wide exchange moves
        O(customers x blocks) partials, never lineitems;
      - customer is nation-filtered AT THE SCAN by the broadcast nation
        key set (nation is driver-tiny by schema design — the inner
        nation join becomes a membership test, dropping dangling
        c_nationkey rows exactly like SQL) and hash-joined with the
        reduced revenue table — both sides are customer-sized;
      - the top 20 is per-block local top-k + driver merge (`_topk`) on
        the total order (revenue_x10000 desc, c_custkey asc); nation
        NAMES are mapped on the <= 20 survivors in the driver.

    The top-k runs AFTER the customer join on purpose: an order whose
    o_custkey dangles (no customer row) must not occupy a top-20 slot —
    SQL's inner join drops it before LIMIT (pinned by the hostile-star
    harness).  Revenue rides the exact integer grid as Q3/Q5; every
    inner-join side rides `_join_pad`."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from .sizing import shuffle_partitions

    nation = typed_collect(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    name_map = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    nkeys_ref = ray.put(nation["n_nationkey"].to_numpy(np.int32))

    lo = pc.strptime(Q10_DATE_LO, format="%Y-%m-%d", unit="us").as_py()
    hi = pc.strptime(Q10_DATE_HI, format="%Y-%m-%d", unit="us").as_py()
    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows

    def ord_project(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        t = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        return t.select(["o_orderkey", "o_custkey"])

    ords = _join_pad(
        _read(
            sf_dir,
            "orders",
            ["o_orderkey", "o_custkey", "o_orderdate"],
            rows_per_block=100_000,
        ).map_batches(ord_project, batch_format="pyarrow"),
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
    )

    def li_project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), "R"))
        cents = round_half_away(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        d100 = round_half_away(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "rev": pa.array(cents * (100 - d100)),
            }
        )

    li = _join_pad(
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
            rows_per_block=100_000,
        ).map_batches(li_project, batch_format="pyarrow"),
        pa.schema([("l_orderkey", pa.int64()), ("rev", pa.int64())]),
    )

    joined = li.join(
        ords,
        join_type="inner",
        num_partitions=shuffle_partitions(n_li),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def combine(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {"o_custkey": t.column("o_custkey"), "revenue_x10000": t.column("rev")}
        )
        g = tt.group_by("o_custkey").aggregate([("revenue_x10000", "sum")])
        return g.rename_columns(["o_custkey", "revenue_x10000"])

    red, n_red = _two_regime_sum(
        joined.map_batches(combine, batch_format="pyarrow"),
        ["o_custkey"],
        ["revenue_x10000"],
    )

    cust = _join_pad(
        _read(
            sf_dir,
            "customer",
            ["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
            rows_per_block=100_000,
        ).map_batches(
            warm_stage(_Membership, keys_ref=nkeys_ref, key_col="c_nationkey"),
            batch_format="pyarrow",
        ),
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_acctbal", pa.float64()),
                ("c_nationkey", pa.int32()),
            ]
        ),
    )

    j = _join_pad(
        red,
        pa.schema([("o_custkey", pa.int64()), ("revenue_x10000", pa.int64())]),
    ).join(
        cust,
        join_type="inner",
        num_partitions=shuffle_partitions(max(n_red, n_cust)),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    # Ray's hash join emits the LEFT key column only (right_on merges
    # into it): the surviving key is o_custkey == c_custkey
    top = _topk(
        j,
        Q10_TOP_N,
        keys=("revenue_x10000", "o_custkey"),
        descending=(True, False),
        empty_schema=pa.schema(
            [
                ("o_custkey", pa.int64()),
                ("revenue_x10000", pa.int64()),
                ("c_name", pa.string()),
                ("c_acctbal", pa.float64()),
                ("c_nationkey", pa.int32()),
            ]
        ),
    )
    top = top.copy().rename(columns={"o_custkey": "c_custkey"})
    top["n_name"] = top["c_nationkey"].map(name_map)
    # same IEEE division as the oracle on the same exact integers
    top["revenue"] = (
        top["revenue_x10000"].to_numpy(np.int64).astype(np.float64) / 10000.0
    )
    for c in ("c_custkey", "revenue_x10000"):
        top[c] = top[c].astype("int64")
    top["c_name"] = top["c_name"].astype(object)
    top["n_name"] = top["n_name"].astype(object)
    top["c_acctbal"] = top["c_acctbal"].astype("float64")
    return (
        top[["c_custkey", "c_name", "revenue_x10000", "revenue", "c_acctbal", "n_name"]]
        .sort_values(["revenue_x10000", "c_custkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


Q18_QTY_THRESHOLD = 300  # strict >, on the 1/64 quantity grid
Q18_TOP_N = 100


def q18_large_volume_customers(sf_dir: str):
    """TPC-H Q18 shape — large-volume customers: orders whose TOTAL
    lineitem quantity exceeds a threshold (the HAVING-subquery class),
    joined back to orders and customer, top 100 by order value.

    Plan:
      - one combiner pass reduces lineitem to per-order quantity partials
        on the exact x64 integer grid (grid-guarded: a loud raise if
        l_quantity ever leaves the 1/64 lattice), merged by
        `_two_regime_sum` keyed on l_orderkey — the one wide exchange,
        O(orders x blocks) partial rows;
      - the threshold filter runs vectorized ON the reduced table, so the
        surviving "large" orders are the skew tail (tiny fraction at any
        scale) but still a DATASET — no driver collect, no broadcast
        assumption;
      - two keyed hash joins recover order and customer attributes
        (winners JOIN orders ON orderkey, then JOIN customer ON custkey),
        each partition count data-proportional; every side rides
        `_join_pad` (a threshold matching nothing must not kill the
        join);
      - the top 100 is `_topk` on the total order (o_totalprice on the
        exact cents grid desc, o_orderkey asc) — never a global sort.

    sum_qty is emitted both as the exact x64 integer and as the IEEE
    division by 64.0, identical on both sides."""
    import numpy as np
    import pyarrow.parquet as pq

    from .sizing import shuffle_partitions

    n_ord = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows

    def li_partial(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)
        q64 = np.rint(q * 64.0).astype(np.int64)
        if not np.array_equal(q64 / 64.0, q):
            raise ValueError("l_quantity off the 1/64 grid; sums inexact")
        tt = pa.table(
            {"l_orderkey": t.column("l_orderkey"), "sum_qty_x64": pa.array(q64)}
        )
        g = tt.group_by("l_orderkey").aggregate([("sum_qty_x64", "sum")])
        return g.rename_columns(["l_orderkey", "sum_qty_x64"])

    red, _ = _two_regime_sum(
        _read(
            sf_dir, "lineitem", ["l_orderkey", "l_quantity"], rows_per_block=100_000
        ).map_batches(li_partial, batch_format="pyarrow"),
        ["l_orderkey"],
        ["sum_qty_x64"],
    )

    bound = Q18_QTY_THRESHOLD * 64

    def keep_large(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("sum_qty_x64"), bound))

    win = _join_pad(
        red.map_batches(keep_large, batch_format="pyarrow"),
        pa.schema([("l_orderkey", pa.int64()), ("sum_qty_x64", pa.int64())]),
    )

    ords = _join_pad(
        _read(
            sf_dir,
            "orders",
            ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
            rows_per_block=100_000,
        ),
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_totalprice", pa.float64()),
            ]
        ),
    )

    j1 = win.join(
        ords,
        join_type="inner",
        num_partitions=shuffle_partitions(n_ord),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    cust = _join_pad(
        _read(sf_dir, "customer", ["c_custkey", "c_name"], rows_per_block=100_000),
        pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())]),
    )

    j2 = _join_pad(
        j1,
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("sum_qty_x64", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_totalprice", pa.float64()),
            ]
        ),
    ).join(
        cust,
        join_type="inner",
        num_partitions=shuffle_partitions(n_cust),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def add_price_grid(t: pa.Table) -> pa.Table:
        p100 = round_half_away(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return t.append_column("totalprice_x100", pa.array(p100))

    top = _topk(
        j2.map_batches(add_price_grid, batch_format="pyarrow"),
        Q18_TOP_N,
        keys=("totalprice_x100", "l_orderkey"),
        descending=(True, False),
        empty_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("sum_qty_x64", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_totalprice", pa.float64()),
                ("c_name", pa.string()),
                ("totalprice_x100", pa.int64()),
            ]
        ),
    )
    # Ray's hash join keeps the LEFT key column only: o_custkey == c_custkey
    top = top.copy().rename(columns={"o_custkey": "c_custkey"})
    # same IEEE division as the oracle on the same exact integers
    top["sum_qty"] = top["sum_qty_x64"].to_numpy(np.int64).astype(np.float64) / 64.0
    for c in ("c_custkey", "l_orderkey", "sum_qty_x64"):
        top[c] = top[c].astype("int64")
    top["c_name"] = top["c_name"].astype(object)
    top["o_totalprice"] = top["o_totalprice"].astype("float64")
    top = top.rename(columns={"l_orderkey": "o_orderkey"})
    return (
        top[
            [
                "c_name",
                "c_custkey",
                "o_orderkey",
                "o_orderdate",
                "o_totalprice",
                "sum_qty_x64",
                "sum_qty",
            ]
        ]
        .sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


# ----------------------------------------------------------------------
# TPC-H completion batch (adapted to this star schema: no partsupp /
# shipmode / comment / container / phone columns — each query keeps the
# reference TPC-H dataflow SHAPE and swaps the absent column for the
# in-schema analogue, like Q16/Q17 before it).

Q6_DATE_LO = "1996-01-01"
Q6_DATE_HI = "1997-01-01"
Q6_D100_LO, Q6_D100_HI = 5, 7  # discount on the exact 1/100 grid
Q6_QTY_BOUND = 24.0


def _grid_rev(t: pa.Table) -> "tuple":
    """(cents, d100) int64 arrays from the exact money/discount grids —
    the q5 lesson factored: l_extendedprice lives on the cents grid and
    l_discount on the 1/100 grid, so cents x (100 - d100) sums are
    int64-exact and the value hash cannot flip on summation order."""
    import numpy as np

    cents = round_half_away(
        t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0, 0
    ).astype(np.int64)
    d100 = round_half_away(
        t.column("l_discount").to_numpy(zero_copy_only=False) * 100.0, 0
    ).astype(np.int64)
    return cents, d100


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape — forecasting revenue change: one filtered global
    aggregate, revenue = sum(extendedprice * discount) over a one-year
    ship window, a discount band, and a quantity cap.

    The cheapest possible distributed plan and the registry's pushdown
    showcase: a column-pruned scan (4 of 11 lineitem columns leave
    storage), a vectorized per-block filter, and ONE partial row per
    block to the driver — no exchange at all, O(blocks) rows move.
    Revenue rides the exact integer grid (cents x d100, see `_grid_rev`);
    the empty/none-matched case pins COALESCE(,0) semantics on both
    sides (SUM over nothing is NULL in SQL — the oracle coalesces, so a
    fully-empty corpus still compares exactly)."""
    import numpy as np

    lo = pc.strptime(Q6_DATE_LO, format="%Y-%m-%d", unit="us").as_py()
    hi = pc.strptime(Q6_DATE_HI, format="%Y-%m-%d", unit="us").as_py()

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate")
        t = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        cents, d100 = _grid_rev(t)
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        m = (d100 >= Q6_D100_LO) & (d100 <= Q6_D100_HI) & (qty < Q6_QTY_BOUND)
        return pa.table(
            {
                "revenue_x10000": pa.array([int((cents[m] * d100[m]).sum())]),
                "n_lines": pa.array([int(m.sum())]),
            }
        )

    parts = typed_collect(
        _read(
            sf_dir,
            "lineitem",
            ["l_shipdate", "l_extendedprice", "l_discount", "l_quantity"],
            rows_per_block=200_000,
        ).map_batches(partial, batch_format="pyarrow"),
        pa.schema([("revenue_x10000", pa.int64()), ("n_lines", pa.int64())]),
    )
    rev = int(parts["revenue_x10000"].sum())
    return pd.DataFrame(
        {
            "revenue_x10000": pd.Series([rev], dtype="int64"),
            "revenue": pd.Series([np.float64(rev) / 10000.0], dtype="float64"),
            "n_lines": pd.Series([int(parts["n_lines"].sum())], dtype="int64"),
        }
    )


Q14_DATE_LO = "1996-09-01"
Q14_DATE_HI = "1996-10-01"
Q14_PROMO_TYPE = "PROMO"


class _PromoRevPartial:
    """Per-block Q14 combiner: broadcast (p_partkey -> is-promo) flags,
    inner-join semantics on the part lookup (dangling l_partkey rows
    DROP, the hostile-star lesson), one partial row per block."""

    def __init__(self, lookup_ref, lo, hi):
        import ray

        keys, flags = ray.get(lookup_ref)
        self.keys = pa.array(keys)
        self.flags = flags  # numpy bool, indexed by lookup position
        self.lo, self.hi = lo, hi

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        d = t.column("l_shipdate")
        t = t.filter(pc.and_(pc.greater_equal(d, self.lo), pc.less(d, self.hi)))
        idx = pc.index_in(t.column("l_partkey"), value_set=self.keys)
        keep = pc.is_valid(idx)
        t, idx = t.filter(keep), idx.filter(keep)
        cents, d100 = _grid_rev(t)
        rev = cents * (100 - d100)
        promo = (
            self.flags[idx.to_numpy(zero_copy_only=False)]
            if len(t)
            else np.zeros(0, bool)
        )
        return pa.table(
            {
                "promo_x10000": pa.array([int(rev[promo].sum())]),
                "total_x10000": pa.array([int(rev.sum())]),
            }
        )


def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape — promotion effect: the share of one month's
    revenue from PROMO-type parts (p_type stands in for the reference's
    'PROMO%' prefix; this schema's types are single words).

    Plan: part is the classic broadcast side (~0.2% of lineitem rows at
    any TPC-H-proportioned scale) — ONE (p_partkey, is-promo) pair of
    arrays rides `ray.put`, each block filters the ship-month, drops
    dangling part keys (inner-join semantics), and reduces to one
    (promo, total) integer-grid partial row; the driver folds O(blocks)
    rows.  No exchange.  The percentage is the same IEEE expression on
    both sides (100.0 * promo / total on the exact int64 sums), with the
    CASE total=0 -> 0.0 guard pinned in both engine and oracle."""
    import numpy as np
    import ray

    part = typed_collect(_read(sf_dir, "part", ["p_partkey", "p_type"]))
    lookup_ref = ray.put(
        (
            part["p_partkey"].to_numpy(np.int64),
            (part["p_type"] == Q14_PROMO_TYPE).to_numpy(bool),
        )
    )
    lo = pc.strptime(Q14_DATE_LO, format="%Y-%m-%d", unit="us").as_py()
    hi = pc.strptime(Q14_DATE_HI, format="%Y-%m-%d", unit="us").as_py()

    parts = typed_collect(
        _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
            rows_per_block=200_000,
        ).map_batches(
            warm_stage(_PromoRevPartial, lookup_ref=lookup_ref, lo=lo, hi=hi),
            batch_format="pyarrow",
        ),
        pa.schema([("promo_x10000", pa.int64()), ("total_x10000", pa.int64())]),
    )
    promo = int(parts["promo_x10000"].sum())
    total = int(parts["total_x10000"].sum())
    pct = 0.0 if total == 0 else 100.0 * np.float64(promo) / np.float64(total)
    return pd.DataFrame(
        {
            "promo_x10000": pd.Series([promo], dtype="int64"),
            "total_x10000": pd.Series([total], dtype="int64"),
            "promo_pct": pd.Series([pct], dtype="float64"),
        }
    )


Q15_DATE_LO = "1996-01-01"
Q15_DATE_HI = "1996-04-01"


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape — top supplier(s): revenue per supplier over one
    quarter, return every supplier tied at the maximum (the reference's
    revenue VIEW + MAX subquery, as a dataflow).

    Plan: one combiner pass reduces lineitem to per-supplier integer-grid
    partials merged by `_two_regime_sum` (the only exchange, and only
    above the driver bound — the reduced table is O(suppliers));
    the global max is a Ray scalar aggregate over the REDUCED table;
    the winners (ties only — a handful of rows at any scale) filter
    vectorized, collect, and take names from a footer-pruned supplier
    read filtered by winner-key membership.  No sort anywhere."""
    import numpy as np

    lo = pc.strptime(Q15_DATE_LO, format="%Y-%m-%d", unit="us").as_py()
    hi = pc.strptime(Q15_DATE_HI, format="%Y-%m-%d", unit="us").as_py()

    def li_partial(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate")
        t = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        cents, d100 = _grid_rev(t)
        tt = pa.table(
            {
                "l_suppkey": t.column("l_suppkey"),
                "total_x10000": pa.array(cents * (100 - d100)),
            }
        )
        g = tt.group_by("l_suppkey").aggregate([("total_x10000", "sum")])
        return g.rename_columns(["l_suppkey", "total_x10000"])

    red, n_red = _two_regime_sum(
        _read(
            sf_dir,
            "lineitem",
            ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
            rows_per_block=200_000,
        ).map_batches(li_partial, batch_format="pyarrow"),
        ["l_suppkey"],
        ["total_x10000"],
    )
    empty = pd.DataFrame(
        {
            "s_suppkey": pd.Series([], dtype="int64"),
            "s_name": pd.Series([], dtype=object),
            "total_revenue_x10000": pd.Series([], dtype="int64"),
            "total_revenue": pd.Series([], dtype="float64"),
        }
    )
    if n_red == 0:
        return empty
    # the reduced table feeds TWO consumers (scalar max + winner filter):
    # pin it so the distributed-regime groupby doesn't re-shuffle twice
    red = red.materialize()
    best = int(red.max("total_x10000"))

    def keep_best(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("total_x10000"), pa.scalar(best, pa.int64())))

    winners = typed_collect(
        red.map_batches(keep_best, batch_format="pyarrow"),
        pa.schema([("l_suppkey", pa.int64()), ("total_x10000", pa.int64())]),
    )
    import ray

    keys_ref = ray.put(winners["l_suppkey"].to_numpy(np.int64))
    names = typed_collect(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
            warm_stage(_Membership, keys_ref=keys_ref, key_col="s_suppkey"),
            batch_format="pyarrow",
        ),
        pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string())]),
    )
    out = names.merge(
        winners.rename(columns={"l_suppkey": "s_suppkey"}), on="s_suppkey"
    )
    if len(out) == 0:  # winner keys all dangling: inner-join-empty result
        return empty
    out = out.rename(columns={"total_x10000": "total_revenue_x10000"})
    out["total_revenue"] = (
        out["total_revenue_x10000"].to_numpy(np.int64).astype(np.float64) / 10000.0
    )
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["total_revenue_x10000"] = out["total_revenue_x10000"].astype("int64")
    return (
        out[["s_suppkey", "s_name", "total_revenue_x10000", "total_revenue"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


Q13_EXCLUDED_PRIORITY = "4-NOT SPECIFIED"


def q13_customer_distribution(sf_dir: str):
    """TPC-H Q13 shape — customer order-count distribution: how many
    customers placed exactly k qualifying orders, INCLUDING k = 0 (the
    o_orderpriority exclusion stands in for the reference's o_comment
    NOT LIKE filter; this schema has no comment column).

    Plan (the q_left_join_order_counts shape + a histogram-of-counts
    tail):
      - orders reduce to per-customer count partials BEFORE any join
        (per-block combiner, `_two_regime_sum` keyed on o_custkey) — the
        one O(customers)-keyed exchange;
      - customer LEFT OUTER joins the reduced counts (right side
        `_join_pad`ed; dangling order custkeys drop as unmatched right
        rows, exactly the LEFT-join semantics), nulls fill to 0;
      - the c_count -> custdist histogram is a per-block combiner + a
        driver fold over O(distinct counts x blocks) rows — integer
        counting end to end."""
    import numpy as np
    import pyarrow.parquet as pq

    from .sizing import shuffle_partitions

    def ord_partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.not_equal(t.column("o_orderpriority"), Q13_EXCLUDED_PRIORITY)
        )
        tt = pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "n": pa.array(np.ones(len(t), np.int64)),
            }
        )
        g = tt.group_by("o_custkey").aggregate([("n", "sum")])
        return g.rename_columns(["o_custkey", "n"])

    red, _ = _two_regime_sum(
        _read(
            sf_dir, "orders", ["o_custkey", "o_orderpriority"], rows_per_block=200_000
        ).map_batches(ord_partial, batch_format="pyarrow"),
        ["o_custkey"],
        ["n"],
    )

    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    if n_cust == 0:
        # an all-empty LEFT side kills Ray's join; the footer already
        # proves the answer is empty
        return pd.DataFrame(
            {
                "c_count": pd.Series([], dtype="int64"),
                "custdist": pd.Series([], dtype="int64"),
            }
        )
    n_parts = shuffle_partitions(n_cust)
    joined = (
        _read(sf_dir, "customer", ["c_custkey"])
        .repartition(n_parts)
        .join(
            _join_pad(
                red, pa.schema([("o_custkey", pa.int64()), ("n", pa.int64())])
            ),
            join_type="left_outer",
            num_partitions=n_parts,
            on=("c_custkey",),
            right_on=("o_custkey",),
        )
    )

    def hist(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "c_count": pc.fill_null(t.column("n"), 0).cast(pa.int64()),
                "custdist": pa.array(np.ones(len(t), np.int64)),
            }
        )
        g = tt.group_by("c_count").aggregate([("custdist", "sum")])
        return g.rename_columns(["c_count", "custdist"])

    parts = typed_collect(
        joined.map_batches(hist, batch_format="pyarrow"),
        pa.schema([("c_count", pa.int64()), ("custdist", pa.int64())]),
    )
    out = parts.groupby("c_count", as_index=False)["custdist"].sum()
    for c in ("c_count", "custdist"):
        out[c] = out[c].astype("int64")
    return out.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)


# (brand, size_lo, size_hi, qty_lo, qty_hi) — the three OR'd branches
Q19_BRANCHES = (
    ("Brand#1", 1, 5, 1.0, 11.0),
    ("Brand#2", 1, 10, 10.0, 20.0),
    ("Brand#3", 1, 15, 20.0, 30.0),
)


class _DisjunctiveRevPartial:
    """Per-block Q19 combiner: broadcast (p_partkey -> brand, size),
    vectorized 3-branch disjunction, one integer-grid partial row."""

    def __init__(self, lookup_ref):
        import ray

        keys, brands, sizes = ray.get(lookup_ref)
        self.keys = pa.array(keys)
        self.brands = brands  # numpy object array
        self.sizes = sizes  # numpy int64

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        idx = pc.index_in(t.column("l_partkey"), value_set=self.keys)
        keep = pc.is_valid(idx)
        t, idx = t.filter(keep), idx.filter(keep)
        if len(t) == 0:
            return pa.table(
                {
                    "revenue_x10000": pa.array([0], pa.int64()),
                    "n_lines": pa.array([0], pa.int64()),
                }
            )
        pos = idx.to_numpy(zero_copy_only=False)
        brand, size = self.brands[pos], self.sizes[pos]
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        m = np.zeros(len(t), bool)
        for b, s_lo, s_hi, q_lo, q_hi in Q19_BRANCHES:
            m |= (
                (brand == b)
                & (size >= s_lo)
                & (size <= s_hi)
                & (qty >= q_lo)
                & (qty <= q_hi)
            )
        cents, d100 = _grid_rev(t)
        rev = cents * (100 - d100)
        return pa.table(
            {
                "revenue_x10000": pa.array([int(rev[m].sum())]),
                "n_lines": pa.array([int(m.sum())]),
            }
        )


def q19_discounted_revenue(sf_dir: str):
    """TPC-H Q19 shape — discounted revenue under a DISJUNCTION of
    (brand, size-range, quantity-range) branches (p_size stands in for
    the reference's container list; this schema has no container).

    The disjunctive-predicate class: no single filter pushes down, so
    the plan broadcasts part's two probe columns once (`ray.put`,
    ~0.2% of lineitem at TPC-H proportions), evaluates all three
    branches as ONE vectorized boolean pass per block, and reduces each
    block to one integer-grid partial row — O(blocks) rows to the
    driver, no exchange.  Dangling part keys drop (inner-join
    semantics); COALESCE(,0) is pinned on both sides."""
    import numpy as np
    import ray

    part = typed_collect(_read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]))
    lookup_ref = ray.put(
        (
            part["p_partkey"].to_numpy(np.int64),
            part["p_brand"].to_numpy(object),
            part["p_size"].to_numpy(np.int64),
        )
    )
    parts = typed_collect(
        _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
            rows_per_block=200_000,
        ).map_batches(
            warm_stage(_DisjunctiveRevPartial, lookup_ref=lookup_ref),
            batch_format="pyarrow",
        ),
        pa.schema([("revenue_x10000", pa.int64()), ("n_lines", pa.int64())]),
    )
    rev = int(parts["revenue_x10000"].sum())
    return pd.DataFrame(
        {
            "revenue_x10000": pd.Series([rev], dtype="int64"),
            "revenue": pd.Series([np.float64(rev) / 10000.0], dtype="float64"),
            "n_lines": pd.Series([int(parts["n_lines"].sum())], dtype="int64"),
        }
    )


class _IntLookup:
    """Generic broadcast (key -> int64 value) projection with INNER-join
    semantics (dangling keys DROP — the hostile-star lesson): the int
    sibling of `_ValueLookup`, for foreign-key -> nationkey style hops
    where the small side is the classic broadcast relation."""

    def __init__(self, lookup_ref, key_col, value_name, keep_cols=()):
        import ray

        keys, values = ray.get(lookup_ref)
        self.keys = pa.array(keys)
        self.values = pa.array(values, pa.int64())
        self.key_col = key_col
        self.value_name = value_name
        self.keep_cols = keep_cols

    def __call__(self, t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column(self.key_col), value_set=self.keys)
        keep = pc.is_valid(idx)
        t, idx = t.filter(keep), idx.filter(keep)
        cols = {self.value_name: pc.take(self.values, idx)}
        for c in self.keep_cols:
            cols[c] = t.column(c)
        return pa.table(cols)


Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_DATE_LO = "1995-01-01"
Q7_DATE_HI = "1997-01-01"


def q7_volume_shipping(sf_dir: str):
    """TPC-H Q7 shape — volume shipping between two nations: revenue by
    (supplier nation, customer nation, ship year) for lineitems where the
    supplier sits in one of the pair and the customer in the OTHER,
    within a two-year ship window.

    Plan: supplier is the classic broadcast side (~1e-5 of lineitem at
    TPC-H proportions) — a (suppkey -> nationkey) lookup PRE-filtered to
    the pair rides `ray.put`, so lineitem blocks drop out-of-pair rows
    before anything moves; two keyed hash exchanges recover the customer
    side (lineitem JOIN orders ON orderkey, JOIN pair-filtered customer
    ON custkey), each `_join_pad`ed and data-proportionally partitioned;
    the cross-nation predicate (supp != cust) is a vectorized post-join
    filter and the final exchange is a `_two_regime_sum` over per-block
    (supp, cust, year) combiner partials — O(2 x years x blocks) rows.
    Revenue on the exact cents x (100-d100) grid; the ship YEAR is the
    same calendar extraction both sides."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from .sizing import shuffle_partitions

    nation = typed_collect(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    pair = nation[nation["n_name"].isin([Q7_NATION_A, Q7_NATION_B])]
    name_map = dict(zip(pair["n_nationkey"].astype(int), pair["n_name"]))
    pair_keys = pair["n_nationkey"].to_numpy(np.int32)

    supp = typed_collect(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))
    supp = supp[supp["s_nationkey"].isin(set(pair_keys.tolist()))]
    supp_ref = ray.put(
        (supp["s_suppkey"].to_numpy(np.int64), supp["s_nationkey"].to_numpy(np.int64))
    )
    ckeys_ref = ray.put(pair_keys)

    lo = pc.strptime(Q7_DATE_LO, format="%Y-%m-%d", unit="us").as_py()
    hi = pc.strptime(Q7_DATE_HI, format="%Y-%m-%d", unit="us").as_py()
    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows

    class _LiProject:
        def __init__(self):
            keys, nats = ray.get(supp_ref)
            self.keys, self.nats = pa.array(keys), nats

        def __call__(self, t: pa.Table) -> pa.Table:
            d = t.column("l_shipdate")
            t = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
            idx = pc.index_in(t.column("l_suppkey"), value_set=self.keys)
            keep = pc.is_valid(idx)
            t, idx = t.filter(keep), idx.filter(keep)
            cents, d100 = _grid_rev(t)
            pos = (
                idx.to_numpy(zero_copy_only=False)
                if len(t)
                else np.zeros(0, np.int64)
            )
            return pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "supp_nat": pa.array(self.nats[pos], pa.int64()),
                    "l_year": pc.cast(pc.year(t.column("l_shipdate")), pa.int64()),
                    "rev": pa.array(cents * (100 - d100)),
                }
            )

    li_schema = pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("supp_nat", pa.int64()),
            ("l_year", pa.int64()),
            ("rev", pa.int64()),
        ]
    )
    li = _join_pad(
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
            rows_per_block=200_000,
        ).map_batches(
            warm_factory(("q7_li", supp_ref.hex()), _LiProject),
            batch_format="pyarrow",
        ),
        li_schema,
    )

    ords = _join_pad(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"], rows_per_block=200_000),
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
    )
    li_ord = li.join(
        ords,
        join_type="inner",
        num_partitions=shuffle_partitions(n_li),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    cust = _join_pad(
        _read(
            sf_dir, "customer", ["c_custkey", "c_nationkey"], rows_per_block=200_000
        ).map_batches(
            warm_stage(_Membership, keys_ref=ckeys_ref, key_col="c_nationkey"),
            batch_format="pyarrow",
        ),
        pa.schema([("c_custkey", pa.int64()), ("c_nationkey", pa.int32())]),
    )
    joined = _join_pad(
        li_ord,
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("supp_nat", pa.int64()),
                ("l_year", pa.int64()),
                ("rev", pa.int64()),
                ("o_custkey", pa.int64()),
            ]
        ),
    ).join(
        cust,
        join_type="inner",
        num_partitions=shuffle_partitions(n_li),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def combine(t: pa.Table) -> pa.Table:
        cn = t.column("c_nationkey").cast(pa.int64())
        t = t.append_column("cust_nat", cn)
        t = t.filter(pc.not_equal(t.column("supp_nat"), t.column("cust_nat")))
        g = (
            t.select(["supp_nat", "cust_nat", "l_year", "rev"])
            .group_by(["supp_nat", "cust_nat", "l_year"])
            .aggregate([("rev", "sum")])
        )
        return g.rename_columns(["supp_nat", "cust_nat", "l_year", "rev"])

    red, _ = _two_regime_sum(
        joined.map_batches(combine, batch_format="pyarrow"),
        ["supp_nat", "cust_nat", "l_year"],
        ["rev"],
    )
    df = typed_collect(
        red,
        pa.schema(
            [
                ("supp_nat", pa.int64()),
                ("cust_nat", pa.int64()),
                ("l_year", pa.int64()),
                ("rev", pa.int64()),
            ]
        ),
    )
    # astype(object): .map over an EMPTY int series infers float64 and
    # the dtype-class compare trips on the 0-row corpus
    df["supp_nation"] = df["supp_nat"].map(name_map).astype(object)
    df["cust_nation"] = df["cust_nat"].map(name_map).astype(object)
    df = df[df["supp_nation"].notna() & df["cust_nation"].notna()]
    df = df.rename(columns={"rev": "revenue_x10000"})
    import numpy as np

    df["revenue"] = (
        df["revenue_x10000"].to_numpy(np.int64).astype(np.float64) / 10000.0
    )
    for c in ("l_year", "revenue_x10000"):
        df[c] = df[c].astype("int64")
    return (
        df[["supp_nation", "cust_nation", "l_year", "revenue_x10000", "revenue"]]
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )


Q8_REGION = "EUROPE"
Q8_PART_TYPE = "ECONOMY"
Q8_TARGET_NATION = "NATION_3"
Q8_DATE_LO = "1996-01-01"
Q8_DATE_HI = "1998-01-01"


def q8_market_share(sf_dir: str):
    """TPC-H Q8 shape — national market share: the fraction of one
    region's customers' revenue in one part type supplied by the target
    nation, per order year.

    Plan: part (type-filtered) and supplier are broadcast probe sides —
    lineitem blocks drop non-qualifying parts at the scan and tag each
    surviving row with an is-target flag from the supplier lookup
    (dangling part/supp keys drop, inner semantics); the order year and
    the region membership arrive through two keyed hash exchanges
    (lineitem JOIN window-filtered orders ON orderkey, then JOIN
    region-filtered customer ON custkey — the customer SEMI side carries
    only c_custkey); per-block combiners reduce to (year, target, total)
    integer partials before the final tiny `_two_regime_sum`.  The share
    is the same IEEE expression on the same exact int64 sums, CASE
    total=0 -> 0.0 pinned on both sides."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from .sizing import shuffle_partitions

    nation = typed_collect(
        _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    )
    region = typed_collect(_read(sf_dir, "region", ["r_regionkey", "r_name"]))
    rkeys = set(region.loc[region["r_name"] == Q8_REGION, "r_regionkey"].tolist())
    region_nkeys = nation.loc[
        nation["n_regionkey"].isin(rkeys), "n_nationkey"
    ].to_numpy(np.int32)
    target_keys = set(
        nation.loc[nation["n_name"] == Q8_TARGET_NATION, "n_nationkey"]
        .astype(int)
        .tolist()
    )

    part = typed_collect(_read(sf_dir, "part", ["p_partkey", "p_type"]))
    pkeys_ref = ray.put(
        part.loc[part["p_type"] == Q8_PART_TYPE, "p_partkey"].to_numpy(np.int64)
    )
    supp = typed_collect(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))
    supp_ref = ray.put(
        (
            supp["s_suppkey"].to_numpy(np.int64),
            supp["s_nationkey"].astype(int).isin(target_keys).to_numpy(bool),
        )
    )
    cust_keys_ref = ray.put(region_nkeys)

    lo = pc.strptime(Q8_DATE_LO, format="%Y-%m-%d", unit="us").as_py()
    hi = pc.strptime(Q8_DATE_HI, format="%Y-%m-%d", unit="us").as_py()
    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows

    class _LiProject:
        def __init__(self):
            self.pkeys = pa.array(ray.get(pkeys_ref))
            skeys, flags = ray.get(supp_ref)
            self.skeys, self.flags = pa.array(skeys), flags

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t.column("l_partkey"), value_set=self.pkeys))
            idx = pc.index_in(t.column("l_suppkey"), value_set=self.skeys)
            keep = pc.is_valid(idx)
            t, idx = t.filter(keep), idx.filter(keep)
            cents, d100 = _grid_rev(t)
            rev = cents * (100 - d100)
            pos = (
                idx.to_numpy(zero_copy_only=False)
                if len(t)
                else np.zeros(0, np.int64)
            )
            tgt = self.flags[pos] if len(t) else np.zeros(0, bool)
            return pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "rev": pa.array(rev),
                    "target_rev": pa.array(np.where(tgt, rev, 0)),
                }
            )

    li = _join_pad(
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
            rows_per_block=200_000,
        ).map_batches(
            warm_factory(("q8_li", pkeys_ref.hex(), supp_ref.hex()), _LiProject),
            batch_format="pyarrow",
        ),
        pa.schema(
            [("l_orderkey", pa.int64()), ("rev", pa.int64()), ("target_rev", pa.int64())]
        ),
    )

    def ord_project(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        t = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
            }
        )

    ords = _join_pad(
        _read(
            sf_dir,
            "orders",
            ["o_orderkey", "o_custkey", "o_orderdate"],
            rows_per_block=200_000,
        ).map_batches(ord_project, batch_format="pyarrow"),
        pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()), ("o_year", pa.int64())]
        ),
    )
    li_ord = li.join(
        ords,
        join_type="inner",
        num_partitions=shuffle_partitions(n_li),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    cust = _join_pad(
        _read(
            sf_dir, "customer", ["c_custkey", "c_nationkey"], rows_per_block=200_000
        )
        .map_batches(
            warm_stage(_Membership, keys_ref=cust_keys_ref, key_col="c_nationkey"),
            batch_format="pyarrow",
        )
        .map_batches(
            lambda t: t.select(["c_custkey"]), batch_format="pyarrow"
        ),
        pa.schema([("c_custkey", pa.int64())]),
    )
    joined = _join_pad(
        li_ord,
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("rev", pa.int64()),
                ("target_rev", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_year", pa.int64()),
            ]
        ),
    ).join(
        cust,
        join_type="inner",
        num_partitions=shuffle_partitions(n_li),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def combine(t: pa.Table) -> pa.Table:
        g = (
            t.select(["o_year", "target_rev", "rev"])
            .group_by("o_year")
            .aggregate([("target_rev", "sum"), ("rev", "sum")])
        )
        return g.rename_columns(["o_year", "target_x10000", "total_x10000"])

    red, _ = _two_regime_sum(
        joined.map_batches(combine, batch_format="pyarrow"),
        ["o_year"],
        ["target_x10000", "total_x10000"],
    )
    df = typed_collect(
        red,
        pa.schema(
            [
                ("o_year", pa.int64()),
                ("target_x10000", pa.int64()),
                ("total_x10000", pa.int64()),
            ]
        ),
    )
    tot = df["total_x10000"].to_numpy(np.int64).astype(np.float64)
    tgt = df["target_x10000"].to_numpy(np.int64).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        share = np.where(tot == 0.0, 0.0, tgt / tot)
    df["mkt_share"] = share.astype(np.float64)
    for c in ("o_year", "target_x10000", "total_x10000"):
        df[c] = df[c].astype("int64")
    return (
        df[["o_year", "target_x10000", "total_x10000", "mkt_share"]]
        .sort_values("o_year")
        .reset_index(drop=True)
    )


Q9_NAME_SUBSTR = "widget"


def q9_product_profit(sf_dir: str):
    """TPC-H Q9 shape — product-type profit by supplier nation and order
    year, for parts whose name contains a substring (profit = revenue on
    the exact grid; this schema has no partsupp, so the supplycost term
    is absent — the dataflow is the point: two broadcast probes + one
    keyed exchange + a tiny rollup).

    Plan: the part-name predicate resolves ONCE into a broadcast partkey
    membership set; supplier broadcasts (suppkey -> nationkey); lineitem
    blocks filter + tag vectorized, the single hash exchange joins orders
    for the year, and per-block (nation, year) combiners feed
    `_two_regime_sum` — O(nations x years x blocks) partial rows."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from .sizing import shuffle_partitions

    nation = typed_collect(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    name_map = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))

    part = typed_collect(_read(sf_dir, "part", ["p_partkey", "p_name"]))
    pkeys_ref = ray.put(
        part.loc[
            part["p_name"].str.contains(Q9_NAME_SUBSTR, regex=False), "p_partkey"
        ].to_numpy(np.int64)
    )
    supp = typed_collect(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))
    supp_ref = ray.put(
        (supp["s_suppkey"].to_numpy(np.int64), supp["s_nationkey"].to_numpy(np.int64))
    )
    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows

    class _LiProject:
        def __init__(self):
            self.pkeys = pa.array(ray.get(pkeys_ref))
            skeys, nats = ray.get(supp_ref)
            self.skeys, self.nats = pa.array(skeys), nats

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t.column("l_partkey"), value_set=self.pkeys))
            idx = pc.index_in(t.column("l_suppkey"), value_set=self.skeys)
            keep = pc.is_valid(idx)
            t, idx = t.filter(keep), idx.filter(keep)
            cents, d100 = _grid_rev(t)
            pos = (
                idx.to_numpy(zero_copy_only=False)
                if len(t)
                else np.zeros(0, np.int64)
            )
            return pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "s_nat": pa.array(self.nats[pos], pa.int64()),
                    "profit": pa.array(cents * (100 - d100)),
                }
            )

    li = _join_pad(
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
            rows_per_block=200_000,
        ).map_batches(
            warm_factory(("q9_li", pkeys_ref.hex(), supp_ref.hex()), _LiProject),
            batch_format="pyarrow",
        ),
        pa.schema(
            [("l_orderkey", pa.int64()), ("s_nat", pa.int64()), ("profit", pa.int64())]
        ),
    )

    def ord_project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
            }
        )

    ords = _join_pad(
        _read(
            sf_dir, "orders", ["o_orderkey", "o_orderdate"], rows_per_block=200_000
        ).map_batches(ord_project, batch_format="pyarrow"),
        pa.schema([("o_orderkey", pa.int64()), ("o_year", pa.int64())]),
    )
    joined = li.join(
        ords,
        join_type="inner",
        num_partitions=shuffle_partitions(n_li),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def combine(t: pa.Table) -> pa.Table:
        g = (
            t.select(["s_nat", "o_year", "profit"])
            .group_by(["s_nat", "o_year"])
            .aggregate([("profit", "sum")])
        )
        return g.rename_columns(["s_nat", "o_year", "profit"])

    red, _ = _two_regime_sum(
        joined.map_batches(combine, batch_format="pyarrow"),
        ["s_nat", "o_year"],
        ["profit"],
    )
    df = typed_collect(
        red,
        pa.schema(
            [("s_nat", pa.int64()), ("o_year", pa.int64()), ("profit", pa.int64())]
        ),
    )
    df["nation"] = df["s_nat"].map(name_map).astype(object)
    df = df[df["nation"].notna()]  # dangling s_nationkey: inner-join drop
    df = df.rename(columns={"profit": "profit_x10000"})
    df["profit"] = (
        df["profit_x10000"].to_numpy(np.int64).astype(np.float64) / 10000.0
    )
    for c in ("o_year", "profit_x10000"):
        df[c] = df[c].astype("int64")
    return (
        df[["nation", "o_year", "profit_x10000", "profit"]]
        .sort_values(["nation", "o_year"], ascending=[True, False])
        .reset_index(drop=True)
    )


Q22_NATIONS = (
    "NATION_1",
    "NATION_3",
    "NATION_5",
    "NATION_7",
    "NATION_9",
    "NATION_11",
    "NATION_13",
)


def q22_sales_opportunity(sf_dir: str):
    """TPC-H Q22 shape — global sales opportunity: rich-but-inactive
    customers per nation — above the subset's average positive account
    balance AND holding NO orders (n_name stands in for the reference's
    phone country code; this schema has no phone).

    Plan:
      - pass 1, no exchange: one combiner reduces subset-member
        positive-balance customers to (sum cents, count) — the average
        threshold as two exact integers;
      - the threshold compare is INTEGER CROSS-MULTIPLICATION
        (cents x count > sum_cents — the t_gopher_rules trick), so no
        division ever happens and the boundary customer cannot flip
        between engine and oracle (AVG() itself is never evaluated in
        SQL either: its accumulation order is implementation-defined);
      - orders reduce to distinct-custkey partials (`_two_regime_sum`
        keyed on o_custkey — the one wide exchange, hot-customer
        immune), then candidates LEFT OUTER join that reduced set and
        keep the null fringe = customers with no orders.  BOTH sides
        ride `_join_pad` — the left sentinel surfaces as a left-outer
        fringe row by design and is dropped by a vectorized
        is_valid(c_custkey) filter right after the join (a filter that
        matched no customers must not kill the join);
      - a per-nation combiner + driver fold finishes: O(nations) rows.
    """
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from .sizing import shuffle_partitions

    nation = typed_collect(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    sub = nation[nation["n_name"].isin(Q22_NATIONS)]
    name_map = dict(zip(sub["n_nationkey"].astype(int), sub["n_name"]))
    nkeys_ref = ray.put(sub["n_nationkey"].to_numpy(np.int32))

    empty = pd.DataFrame(
        {
            "cntry": pd.Series([], dtype=object),
            "numcust": pd.Series([], dtype="int64"),
            "totacctbal_x100": pd.Series([], dtype="int64"),
            "totacctbal": pd.Series([], dtype="float64"),
        }
    )

    class _SubsetCents:
        """Subset-member customers with exact-cents balances."""

        def __init__(self):
            self.keys = pa.array(ray.get(nkeys_ref))

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t.column("c_nationkey"), value_set=self.keys))
            cents = round_half_away(
                t.column("c_acctbal").to_numpy(zero_copy_only=False) * 100.0, 0
            ).astype(np.int64)
            return pa.table(
                {
                    "c_custkey": t.column("c_custkey"),
                    "c_nationkey": t.column("c_nationkey").cast(pa.int64()),
                    "cents": pa.array(cents),
                }
            )

    members = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"],
        rows_per_block=200_000,
    ).map_batches(
        warm_factory(("q22_members", nkeys_ref.hex()), _SubsetCents),
        batch_format="pyarrow",
    )

    def avg_partial(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t.column("cents"), pa.scalar(0, pa.int64())))
        c = pos.column("cents")
        return pa.table(
            {
                "s": pa.array([pc.sum(c).as_py() or 0], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
            }
        )

    # pass 1: the threshold digests (tiny; O(blocks) rows to the driver)
    digests = typed_collect(
        members.map_batches(avg_partial, batch_format="pyarrow"),
        pa.schema([("s", pa.int64()), ("n", pa.int64())]),
    )
    s_cents, n_pos = int(digests["s"].sum()), int(digests["n"].sum())
    if n_pos == 0:
        # AVG over an empty set is NULL in SQL: the comparison selects
        # nothing, so the whole result is empty
        return empty

    def above_avg(t: pa.Table) -> pa.Table:
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(cents * n_pos > s_cents))

    cand = members.map_batches(above_avg, batch_format="pyarrow")

    def ord_partial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "n": pa.array(np.ones(len(t), np.int64)),
            }
        )
        g = tt.group_by("o_custkey").aggregate([("n", "sum")])
        return g.rename_columns(["o_custkey", "n"])

    active, _ = _two_regime_sum(
        _read(sf_dir, "orders", ["o_custkey"], rows_per_block=200_000).map_batches(
            ord_partial, batch_format="pyarrow"
        ),
        ["o_custkey"],
        ["n"],
    )

    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    n_parts = shuffle_partitions(max(n_cust, 1))
    cand_schema = pa.schema(
        [("c_custkey", pa.int64()), ("c_nationkey", pa.int64()), ("cents", pa.int64())]
    )
    joined = _join_pad(cand, cand_schema).join(
        _join_pad(active, pa.schema([("o_custkey", pa.int64()), ("n", pa.int64())])),
        join_type="left_outer",
        num_partitions=n_parts,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def nation_partial(t: pa.Table) -> pa.Table:
        # keep the no-order fringe; drop the left-pad sentinel (null key)
        t = t.filter(
            pc.and_(pc.is_null(t.column("n")), pc.is_valid(t.column("c_custkey")))
        )
        tt = pa.table(
            {
                "c_nationkey": t.column("c_nationkey"),
                "numcust": pa.array(np.ones(len(t), np.int64)),
                "totacctbal_x100": t.column("cents"),
            }
        )
        g = tt.group_by("c_nationkey").aggregate(
            [("numcust", "sum"), ("totacctbal_x100", "sum")]
        )
        return g.rename_columns(["c_nationkey", "numcust", "totacctbal_x100"])

    parts = typed_collect(
        joined.map_batches(nation_partial, batch_format="pyarrow"),
        pa.schema(
            [
                ("c_nationkey", pa.int64()),
                ("numcust", pa.int64()),
                ("totacctbal_x100", pa.int64()),
            ]
        ),
    )
    if len(parts) == 0:
        return empty
    out = parts.groupby("c_nationkey", as_index=False)[
        ["numcust", "totacctbal_x100"]
    ].sum()
    out["cntry"] = out["c_nationkey"].map(name_map)
    out = out[out["cntry"].notna()]
    if len(out) == 0:
        return empty
    out["totacctbal"] = (
        out["totacctbal_x100"].to_numpy(np.int64).astype(np.float64) / 100.0
    )
    for c in ("numcust", "totacctbal_x100"):
        out[c] = out[c].astype("int64")
    return (
        out[["cntry", "numcust", "totacctbal_x100", "totacctbal"]]
        .sort_values("cntry")
        .reset_index(drop=True)
    )


Q2_REGION = "ASIA"
Q2_P_TYPE = "STANDARD"
Q2_P_SIZE_MIN = 40


def q2_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape — minimum-cost supplier: for every qualifying part
    (one type, a size band) find the region's supplier(s) offering it at
    the lowest cost, ALL ties returned (the reference query's correlated
    MIN subquery).  No partsupp in this schema: supply cost is the
    MINIMUM extended price at which the supplier ever shipped the part —
    exact on the cents grid, so the correlated min cannot flip.

    Plan: part (type+size filtered) and region-supplier membership are
    broadcast probe sides — lineitem blocks drop non-qualifying rows at
    the scan; a per-block Arrow group_by("min") combiner reduces to
    (partkey, suppkey, min-cents) partials; `_two_regime_agg(min)` merges
    (min-of-mins is the same decomposable shape as sum-of-sums); the
    correlated per-part MIN and the tie filter run over the REDUCED
    table, bounded by |qualifying parts| x |region suppliers| — catalog
    order, not corpus order; supplier/nation names arrive from driver
    dimension lookups.  Zero corpus-order exchanges."""
    import numpy as np

    nation = typed_collect(
        _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    )
    region = typed_collect(_read(sf_dir, "region", ["r_regionkey", "r_name"]))
    rkeys = set(region.loc[region["r_name"] == Q2_REGION, "r_regionkey"].tolist())
    nkeys = nation.loc[nation["n_regionkey"].isin(rkeys)]
    nat_name = dict(zip(nkeys["n_nationkey"].astype(int), nkeys["n_name"]))

    supp = typed_collect(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    )
    supp = supp[supp["s_nationkey"].astype(int).isin(set(nat_name))]
    supp_name = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))
    supp_nat = dict(
        zip(supp["s_suppkey"].astype(int), supp["s_nationkey"].astype(int))
    )

    part = typed_collect(_read(sf_dir, "part", ["p_partkey", "p_type", "p_size"]))
    pkeys = part.loc[
        (part["p_type"] == Q2_P_TYPE) & (part["p_size"] >= Q2_P_SIZE_MIN),
        "p_partkey",
    ].to_numpy(np.int64)

    import ray

    keys_ref = ray.put(
        (pkeys, supp["s_suppkey"].to_numpy(np.int64))
    )

    class _CostPartial:
        def __init__(self):
            pk, sk = ray.get(keys_ref)
            self.pk, self.sk = pa.array(pk), pa.array(sk)

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(
                pc.and_(
                    pc.is_in(t.column("l_partkey"), value_set=self.pk),
                    pc.is_in(t.column("l_suppkey"), value_set=self.sk),
                )
            )
            cents = round_half_away(
                t.column("l_extendedprice").to_numpy(zero_copy_only=False)
                * 100.0,
                0,
            ).astype(np.int64)
            tt = pa.table(
                {
                    "p_partkey": t.column("l_partkey").cast(pa.int64()),
                    "s_suppkey": t.column("l_suppkey").cast(pa.int64()),
                    "cost_x100": pa.array(cents),
                }
            )
            g = tt.group_by(["p_partkey", "s_suppkey"]).aggregate(
                [("cost_x100", "min")]
            )
            return g.rename_columns(["p_partkey", "s_suppkey", "cost_x100"])

    parts = _read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_suppkey", "l_extendedprice"],
        rows_per_block=200_000,
    ).map_batches(
        warm_factory(("q2_cost", keys_ref.hex()), _CostPartial),
        batch_format="pyarrow",
    )
    red, _ = _two_regime_agg(
        parts, ["p_partkey", "s_suppkey"], ["cost_x100"], "min"
    )
    df = typed_collect(
        red,
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("s_suppkey", pa.int64()),
                ("cost_x100", pa.int64()),
            ]
        ),
    )
    if len(df):
        pmin = df.groupby("p_partkey")["cost_x100"].transform("min")
        df = df[df["cost_x100"] == pmin].copy()
    # astype(object): .map over an EMPTY int series infers float64 and the
    # dtype-class compare trips on the 0-row corpus (the q7 lesson)
    df["s_name"] = df["s_suppkey"].map(supp_name).astype(object)
    df["nation"] = (
        df["s_suppkey"].map(supp_nat).map(nat_name).astype(object)
    )
    df["cost"] = df["cost_x100"].to_numpy(np.int64).astype(np.float64) / 100.0
    for c in ("p_partkey", "s_suppkey", "cost_x100"):
        df[c] = df[c].astype("int64")
    return (
        df[["p_partkey", "s_suppkey", "s_name", "nation", "cost_x100", "cost"]]
        .sort_values(["p_partkey", "s_suppkey"])
        .reset_index(drop=True)
    )


Q11_NATION = "NATION_2"
Q11_FRAC_NUM = 2
Q11_FRAC_DEN = 1000


def q11_important_parts(sf_dir: str):
    """TPC-H Q11 shape — important stock identification: parts whose
    total shipped value from one nation's suppliers exceeds a FRACTION of
    that nation's grand total (no partsupp in this schema: value =
    sum of extended price on the cents grid).

    Plan: the nation's supplier keys broadcast (`_Membership`); one
    per-block combiner reduces lineitem to (partkey, sum-cents) partials;
    `_two_regime_sum` merges; the global threshold is TWO exact integers
    (grand total x NUM vs value x DEN — integer cross-multiplication, the
    q22 trick, so the boundary part cannot flip and the fraction is never
    a float).  The grand total is a driver fold over the REDUCED
    per-part table (catalog order); zero corpus-order exchanges."""
    import numpy as np
    import ray

    nation = typed_collect(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    nkeys = set(
        nation.loc[nation["n_name"] == Q11_NATION, "n_nationkey"]
        .astype(int)
        .tolist()
    )
    supp = typed_collect(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))
    skeys_ref = ray.put(
        supp.loc[
            supp["s_nationkey"].astype(int).isin(nkeys), "s_suppkey"
        ].to_numpy(np.int64)
    )

    class _ValuePartial:
        def __init__(self):
            self.sk = pa.array(ray.get(skeys_ref))

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t.column("l_suppkey"), value_set=self.sk))
            cents = round_half_away(
                t.column("l_extendedprice").to_numpy(zero_copy_only=False)
                * 100.0,
                0,
            ).astype(np.int64)
            tt = pa.table(
                {
                    "p_partkey": t.column("l_partkey").cast(pa.int64()),
                    "value_x100": pa.array(cents),
                }
            )
            g = tt.group_by("p_partkey").aggregate([("value_x100", "sum")])
            return g.rename_columns(["p_partkey", "value_x100"])

    parts = _read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_suppkey", "l_extendedprice"],
        rows_per_block=200_000,
    ).map_batches(
        warm_factory(("q11_value", skeys_ref.hex()), _ValuePartial),
        batch_format="pyarrow",
    )
    red, _ = _two_regime_sum(parts, ["p_partkey"], ["value_x100"])
    df = typed_collect(
        red,
        pa.schema([("p_partkey", pa.int64()), ("value_x100", pa.int64())]),
    )
    total = int(df["value_x100"].sum()) if len(df) else 0
    df = df[
        df["value_x100"].to_numpy(np.int64) * Q11_FRAC_DEN
        > total * Q11_FRAC_NUM
    ].copy()
    df["value"] = df["value_x100"].to_numpy(np.int64).astype(np.float64) / 100.0
    for c in ("p_partkey", "value_x100"):
        df[c] = df[c].astype("int64")
    return (
        df[["p_partkey", "value_x100", "value"]]
        .sort_values(["value_x100", "p_partkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


Q12_DATE_LO = "1997-01-01"
Q12_DATE_HI = "1998-01-01"
Q12_LATE_DAYS = 90
Q12_HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def q12_late_lines_by_class(sf_dir: str):
    """TPC-H Q12 shape — shipping-delay priority split: for lineitems
    shipped in a one-year window AND shipped LATE (more than N days after
    the order date — this schema has no commit/receipt dates, the
    ship-vs-order lag stands in), count high- vs low-priority order lines
    per return-flag class (standing in for the reference's ship modes).

    Plan: lineitem pre-filters the ship window at the scan (3 of 11
    columns leave storage) and meets orders through ONE keyed hash
    exchange on orderkey (both sides `_join_pad`ed, partition count
    data-proportional); the late predicate is vectorized int64 timestamp
    arithmetic post-join; a per-block combiner reduces to
    (returnflag, high, low) partials — O(flags x blocks) rows to the
    final tiny `_two_regime_sum`.  Integer counts, exact by
    construction."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from .sizing import shuffle_partitions

    lo = pc.strptime(Q12_DATE_LO, format="%Y-%m-%d", unit="us").as_py()
    hi = pc.strptime(Q12_DATE_HI, format="%Y-%m-%d", unit="us").as_py()
    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows

    def li_project(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate")
        t = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        return t.select(["l_orderkey", "l_returnflag", "l_shipdate"])

    li = _join_pad(
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_returnflag", "l_shipdate"],
            rows_per_block=200_000,
        ).map_batches(li_project, batch_format="pyarrow"),
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_returnflag", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
    )
    ords = _join_pad(
        _read(
            sf_dir,
            "orders",
            ["o_orderkey", "o_orderdate", "o_orderpriority"],
            rows_per_block=200_000,
        ),
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )
    joined = li.join(
        ords,
        join_type="inner",
        num_partitions=shuffle_partitions(n_li),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    late_us = Q12_LATE_DAYS * 86_400 * 1_000_000

    def combine(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        od = t.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        t = t.filter(pa.array(ship - od > late_us))
        high = pc.is_in(
            t.column("o_orderpriority"),
            value_set=pa.array(list(Q12_HIGH_PRIORITIES)),
        ).to_numpy(zero_copy_only=False)
        tt = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "high_line_count": pa.array(high.astype(np.int64)),
                "low_line_count": pa.array((~high).astype(np.int64)),
            }
        )
        g = tt.group_by("l_returnflag").aggregate(
            [("high_line_count", "sum"), ("low_line_count", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "high_line_count", "low_line_count"]
        )

    red, _ = _two_regime_sum(
        joined.map_batches(combine, batch_format="pyarrow"),
        ["l_returnflag"],
        ["high_line_count", "low_line_count"],
        empty_types={"l_returnflag": pa.string()},
    )
    df = typed_collect(
        red,
        pa.schema(
            [
                ("l_returnflag", pa.string()),
                ("high_line_count", pa.int64()),
                ("low_line_count", pa.int64()),
            ]
        ),
    )
    # the _join_pad sentinel carries a null returnflag; it never matches
    # the inner join so it cannot reach here, but a null-group guard keeps
    # the empty-corpus contract airtight
    df = df[df["l_returnflag"].notna()]
    for c in ("high_line_count", "low_line_count"):
        df[c] = df[c].astype("int64")
    return df.sort_values("l_returnflag").reset_index(drop=True)


Q20_NAME_SUBSTR = "bolt"
Q20_DATE_LO = "1997-01-01"
Q20_DATE_HI = "1998-01-01"


def q20_majority_suppliers(sf_dir: str):
    """TPC-H Q20 shape — potential part promotion: suppliers who shipped
    MORE THAN HALF of a qualifying part's total quantity in a one-year
    window (no partsupp/availqty in this schema: the majority-share
    predicate per (part, supplier) stands in for availqty > 0.5 x qty;
    the name-substring part filter is the reference's 'forest%' LIKE).
    Output: each majority supplier with how many parts they dominate.

    Plan: qualifying part keys broadcast; one per-block combiner reduces
    the window's lineitems to (partkey, suppkey, sum-q100) partials on
    the x100 quantity grid; `_two_regime_sum` merges; the per-part total
    and the strict-majority compare (2 x supplier qty > part total —
    integer cross-multiplication, never a float share) run over the
    REDUCED catalog-order table; names from driver dimension lookups.
    One corpus-order combiner pass, zero corpus-order exchanges."""
    import numpy as np
    import ray

    part = typed_collect(_read(sf_dir, "part", ["p_partkey", "p_name"]))
    pkeys_ref = ray.put(
        part.loc[
            part["p_name"].str.contains(Q20_NAME_SUBSTR, regex=False),
            "p_partkey",
        ].to_numpy(np.int64)
    )
    lo = pc.strptime(Q20_DATE_LO, format="%Y-%m-%d", unit="us").as_py()
    hi = pc.strptime(Q20_DATE_HI, format="%Y-%m-%d", unit="us").as_py()

    class _QtyPartial:
        def __init__(self):
            self.pk = pa.array(ray.get(pkeys_ref))

        def __call__(self, t: pa.Table) -> pa.Table:
            d = t.column("l_shipdate")
            t = t.filter(
                pc.and_(
                    pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)),
                    pc.is_in(t.column("l_partkey"), value_set=self.pk),
                )
            )
            q100 = round_half_away(
                t.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0,
                0,
            ).astype(np.int64)
            tt = pa.table(
                {
                    "p_partkey": t.column("l_partkey").cast(pa.int64()),
                    "s_suppkey": t.column("l_suppkey").cast(pa.int64()),
                    "q100": pa.array(q100),
                }
            )
            g = tt.group_by(["p_partkey", "s_suppkey"]).aggregate(
                [("q100", "sum")]
            )
            return g.rename_columns(["p_partkey", "s_suppkey", "q100"])

    parts = _read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        rows_per_block=200_000,
    ).map_batches(
        warm_factory(("q20_qty", pkeys_ref.hex()), _QtyPartial),
        batch_format="pyarrow",
    )
    red, _ = _two_regime_sum(parts, ["p_partkey", "s_suppkey"], ["q100"])
    df = typed_collect(
        red,
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("s_suppkey", pa.int64()),
                ("q100", pa.int64()),
            ]
        ),
    )
    if len(df):
        tot = df.groupby("p_partkey")["q100"].transform("sum")
        df = df[2 * df["q100"].to_numpy(np.int64) > tot.to_numpy(np.int64)]
    win = (
        df.groupby("s_suppkey", as_index=False)
        .size()
        .rename(columns={"size": "n_parts_major"})
        if len(df)
        else pd.DataFrame({"s_suppkey": [], "n_parts_major": []})
    )

    supp = typed_collect(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    )
    nation = typed_collect(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    nat_name = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    supp_name = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))
    supp_nat = dict(
        zip(supp["s_suppkey"].astype(int), supp["s_nationkey"].astype(int))
    )
    win["s_name"] = win["s_suppkey"].map(supp_name).astype(object)
    win["nation"] = win["s_suppkey"].map(supp_nat).map(nat_name).astype(object)
    # inner-join semantics: a dangling winner suppkey (no supplier row)
    # drops, exactly as the oracle's JOIN supplier does
    win = win[win["s_name"].notna() & win["nation"].notna()]
    for c in ("s_suppkey", "n_parts_major"):
        win[c] = win[c].astype("int64")
    return (
        win[["s_suppkey", "s_name", "nation", "n_parts_major"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


Q21_LATE_DAYS = 60


def q21_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape — suppliers who kept orders waiting: on finished
    ('F') multi-supplier orders, the supplier who was the ONLY late one
    (this schema has no commit/receipt dates: late = shipped more than N
    days after the order date), counted per supplier (the reference's
    EXISTS / NOT EXISTS pair).

    Plan: one corpus-order keyed hash exchange (window lineitem JOIN
    status-filtered orders ON orderkey, `_join_pad`ed both sides,
    data-proportional partitions); everything after rides combiner
    algebra instead of per-order EXISTS probes:
      - per-block Arrow group_by reduces to (orderkey, suppkey,
        max-late) DISTINCT-pair partials; `_two_regime_sum` merges (sum
        of partial maxes > 0 == any-late — the flag never exceeds one
        block's max semantics);
      - per-order facts are SUMS over the pair table: n_supps = count,
        n_late = sum(late), and sum(late x suppkey) — which IS the late
        suppkey exactly when n_late == 1 (the EXISTS/NOT-EXISTS pair as
        integer algebra, no correlated probe);
      - the winners (n_late = 1 AND n_supps >= 2) reduce to per-supplier
        wait counts in one more tiny keyed merge; names from driver
        dimension lookups."""
    import numpy as np
    import pyarrow.parquet as pq

    from .sizing import shuffle_partitions

    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    late_us = Q21_LATE_DAYS * 86_400 * 1_000_000

    li = _join_pad(
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_suppkey", "l_shipdate"],
            rows_per_block=200_000,
        ),
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
    )

    def ord_project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("o_orderstatus"), "F"))
        return t.select(["o_orderkey", "o_orderdate"])

    ords = _join_pad(
        _read(
            sf_dir,
            "orders",
            ["o_orderkey", "o_orderstatus", "o_orderdate"],
            rows_per_block=200_000,
        ).map_batches(ord_project, batch_format="pyarrow"),
        pa.schema(
            [("o_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us"))]
        ),
    )
    joined = li.join(
        ords,
        join_type="inner",
        num_partitions=shuffle_partitions(n_li),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        od = t.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        tt = pa.table(
            {
                "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
                "l_suppkey": t.column("l_suppkey").cast(pa.int64()),
                "late": pa.array((ship - od > late_us).astype(np.int64)),
            }
        )
        g = tt.group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [("late", "max")]
        )
        return g.rename_columns(["l_orderkey", "l_suppkey", "late"])

    pairs, n_pairs = _two_regime_sum(
        joined.map_batches(pair_partial, batch_format="pyarrow"),
        ["l_orderkey", "l_suppkey"],
        ["late"],
    )

    def order_partial(t: pa.Table) -> pa.Table:
        late = (
            t.column("late").to_numpy(zero_copy_only=False) > 0
        ).astype(np.int64)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        tt = pa.table(
            {
                "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
                "n_supps": pa.array(np.ones(len(t), np.int64)),
                "n_late": pa.array(late),
                "lsupp": pa.array(late * sk),
            }
        )
        g = tt.group_by("l_orderkey").aggregate(
            [("n_supps", "sum"), ("n_late", "sum"), ("lsupp", "sum")]
        )
        return g.rename_columns(["l_orderkey", "n_supps", "n_late", "lsupp"])

    orders_red, _ = _two_regime_sum(
        pairs.map_batches(order_partial, batch_format="pyarrow"),
        ["l_orderkey"],
        ["n_supps", "n_late", "lsupp"],
    )

    def winner_partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.equal(t.column("n_late"), 1),
                pc.greater_equal(t.column("n_supps"), 2),
            )
        )
        tt = pa.table(
            {
                "s_suppkey": t.column("lsupp").cast(pa.int64()),
                "numwait": pa.array(np.ones(len(t), np.int64)),
            }
        )
        g = tt.group_by("s_suppkey").aggregate([("numwait", "sum")])
        return g.rename_columns(["s_suppkey", "numwait"])

    red, _ = _two_regime_sum(
        orders_red.map_batches(winner_partial, batch_format="pyarrow"),
        ["s_suppkey"],
        ["numwait"],
    )
    df = typed_collect(
        red,
        pa.schema([("s_suppkey", pa.int64()), ("numwait", pa.int64())]),
    )

    supp = typed_collect(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    )
    nation = typed_collect(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    nat_name = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    supp_name = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))
    supp_nat = dict(
        zip(supp["s_suppkey"].astype(int), supp["s_nationkey"].astype(int))
    )
    df["s_name"] = df["s_suppkey"].map(supp_name).astype(object)
    df["nation"] = df["s_suppkey"].map(supp_nat).map(nat_name).astype(object)
    # inner-join semantics: dangling winner suppkeys drop (they still
    # counted toward n_supps/n_late above — exactly as in the oracle,
    # which only joins supplier AFTER the per-order algebra)
    df = df[df["s_name"].notna() & df["nation"].notna()]
    for c in ("s_suppkey", "numwait"):
        df[c] = df[c].astype("int64")
    return (
        df[["s_suppkey", "s_name", "nation", "numwait"]]
        .sort_values(["numwait", "s_suppkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


def _range_plan(ds, n, id_col: str, key_col: str, tag: str, negate=False):
    """The terasort range-partition plan, shared by q_global_rank_orders
    and q_gini_revenue:
      - pass 1 (sample): a deterministic splitmix64 id-hash sample
        (layout-invariant, no RNG) collects ~128 x P sort keys; the
        driver picks P-1 range boundaries at even sample quantiles.
        Boundary choice affects BALANCE only, never correctness;
      - pass 2 (histogram): per-block `np.bincount` of the broadcast
        searchsorted partition id — O(P x blocks) ints to the driver,
        which prefix-sums partition offsets.
    Returns ``(assign, offsets)``: `assign` is a warm stage appending an
    int64 `part` column (searchsorted on the broadcast boundaries — rows
    with EQUAL keys co-locate by construction, so in-partition tiebreaks
    never cross partitions); ``offsets[p]`` is the exact global count of
    rows in parts < p.  Skew caveat: a pathologically hot single key
    value lands one partition with all its ties (a two-level composite-
    key split is the fix if a real corpus ever needs it)."""
    import numpy as np
    import ray

    from .sizing import shuffle_partitions

    n_parts = shuffle_partitions(n)

    def _splitmix(keys):
        z = keys.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    # pass 1: deterministic sample of sort keys (hash threshold ~= the
    # target rate; exact count does not matter, only spread)
    target = 128 * n_parts
    thresh = np.uint64(min(2**64 - 1, int(2**64 * min(1.0, target / n))))

    def sample(t: pa.Table) -> pa.Table:
        keys = t.column(id_col).to_numpy(zero_copy_only=False)
        k = t.column(key_col).to_numpy(zero_copy_only=False)[
            _splitmix(keys) <= thresh
        ]
        return pa.table({"k": pa.array(-k if negate else k)})

    samp = np.sort(
        np.concatenate(
            [
                b["k"]
                for b in ds.map_batches(
                    sample, batch_format="pyarrow"
                ).iter_batches(batch_format="numpy")
            ]
            or [np.zeros(0)]
        )
    )
    if len(samp) == 0:
        samp = np.zeros(1)
    bnds = np.unique(
        samp[
            np.minimum(
                (np.arange(1, n_parts) * len(samp)) // n_parts, len(samp) - 1
            )
        ]
    )
    bnds_ref = ray.put(bnds)

    class _PartId:
        def __init__(self):
            self.bnds = ray.get(bnds_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t.column(key_col).to_numpy(zero_copy_only=False)
            if negate:
                k = -k
            part = np.searchsorted(self.bnds, k, side="right").astype(
                np.int64
            )
            return t.append_column("part", pa.array(part))

    def hist(t: pa.Table) -> pa.Table:
        counts = np.bincount(
            t.column("part").to_numpy(zero_copy_only=False),
            minlength=len(bnds) + 1,
        ).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(np.arange(len(counts), dtype=np.int64)),
                "cnt": pa.array(counts),
            }
        )

    assign = warm_factory((tag, bnds_ref.hex()), _PartId)
    counts = np.zeros(len(bnds) + 1, np.int64)
    for b in (
        ds.map_batches(assign, batch_format="pyarrow")
        .map_batches(hist, batch_format="pyarrow")
        .iter_batches(batch_format="numpy")
    ):
        np.add.at(counts, b["part"], b["cnt"])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return assign, offsets


def q_global_rank_orders(sf_dir: str):
    """Global total-order rank export — ROW_NUMBER() OVER (ORDER BY
    o_totalprice DESC, o_orderkey) for EVERY order — the terasort shape:
    the one operator whose output is a corpus-order globally-sorted
    stream, and the reason range partitioning exists.

    Plan (never `ds.sort()` — Ray's global sort materializes a full
    range exchange of its own; this plan is the same exchange but with
    the rank arithmetic fused and the boundaries under our control): the
    shared `_range_plan` sample/histogram passes, then pass 3 (the one
    range exchange): `groupby(part).map_groups` sorts each range
    vectorized and emits rank = offset + local index.  Rows with EQUAL
    sort keys co-locate by construction, so the orderkey tiebreak never
    crosses a partition.
    The sort key is the RAW float64 price (negated for DESC) — never the
    rounded cents grid, whose coarser ties could reorder near-equal
    prices vs the oracle's double compare."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    n = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    if n == 0:
        # typed pandas, not an empty Dataset: Ray drops all-empty blocks
        # from a collect and the schema would be lost downstream
        return pd.DataFrame(
            {
                "o_orderkey": pd.Series([], dtype="int64"),
                "global_rank": pd.Series([], dtype="int64"),
            }
        )
    ds = _read(
        sf_dir, "orders", ["o_orderkey", "o_totalprice"], rows_per_block=200_000
    )
    assign, offsets = _range_plan(
        ds, n, "o_orderkey", "o_totalprice", "grank_part", negate=True
    )
    off_ref = ray.put(offsets)

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)[int(g["part"].iloc[0])]
        g = g.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        )
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
                "global_rank": off + np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("part")
        .map_groups(rank_group, batch_format="pandas")
    )


def q_gini_revenue(sf_dir: str):
    """Gini coefficient of per-customer revenue — the Lorenz/inequality
    audit a corpus-curation pipeline runs on source-contribution skew
    (who contributes how much).  Exact integers end to end: per-customer
    revenue lives on the cents grid, and with revenues sorted ASCENDING,
    S = Σ rank·v decomposes over range partitions as
    offset_p·T_p + S_local_p — so the terasort machinery (`_range_plan`,
    shared with q_global_rank_orders) reduces each partition to a
    CONSTANT-SIZE (n_p, T_p, S_local_p) partial (the global-rank
    exchange collapsed to P rows) and
    gini_x1e9 = ⌊1e9·(2S − (n+1)·T) / (n·T)⌋ is one integer
    cross-multiplication on the driver (HUGEINT in the oracle, Python
    int here; 2S − (n+1)T ≥ 0 by the Chebyshev sum inequality, so floor
    and truncate agree).  Rank ties (equal revenues) are S-invariant, so
    the arbitrary tie order inside a partition can never diverge from
    the oracle's ROW_NUMBER.

    Exchanges: ONE custkey reduce (per-block Arrow combiner →
    `_two_regime_sum`) + ONE range exchange of the already-reduced
    (custkey, rev) table.  Partials are folded as exact Python ints —
    int64 products are chunk-summed so no intermediate can overflow
    (per-part rank·v products are guarded; more partitions shrink them).
    total_cents is reported modulo nothing: past ~9×10¹⁶ total cents the
    int64 report column itself saturates — scale the grid down a decade
    there (the q_benford_audit note)."""
    import numpy as np
    import pyarrow.parquet as pq

    empty = pd.DataFrame(
        {
            "n_customers": pd.Series([], dtype="int64"),
            "total_cents": pd.Series([], dtype="int64"),
            "gini_x1e9": pd.Series([], dtype="int64"),
        }
    )
    if pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows == 0:
        return empty

    ds = _read(
        sf_dir, "orders", ["o_custkey", "o_totalprice"], rows_per_block=200_000
    )

    def combine(t: pa.Table) -> pa.Table:
        cents = round_half_away(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        tt = pa.table(
            {"o_custkey": t.column("o_custkey"), "rev": pa.array(cents)}
        )
        g = tt.group_by("o_custkey").aggregate([("rev", "sum")])
        return g.rename_columns(["o_custkey", "rev"])

    rev, n_cust = _two_regime_sum(
        ds.map_batches(combine, batch_format="pyarrow"),
        ["o_custkey"],
        ["rev"],
    )
    if n_cust == 0:
        return empty
    assign, offsets = _range_plan(
        rev, n_cust, "o_custkey", "rev", "gini_part"
    )

    def _exact_sum(arr) -> int:
        """Exact Python-int sum of an int64 array: chunk so no partial
        int64 sum can overflow, then fold the few chunk sums as ints."""
        if len(arr) == 0:
            return 0
        amax = int(np.abs(arr).max())
        if amax == 0:
            return 0
        csize = max(1, (2**62) // amax)
        return sum(
            int(arr[i : i + csize].sum()) for i in range(0, len(arr), csize)
        )

    def part_partial(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["rev"].to_numpy(np.int64))
        m = len(v)
        # rank·v products must fit int64 before chunk-summing; a trip
        # here means shuffle_partitions needs to grow faster than rows
        assert m == 0 or m * max(abs(int(v[0])), abs(int(v[-1]))) < 2**63
        s_local = _exact_sum(np.arange(1, m + 1, dtype=np.int64) * v)
        return pd.DataFrame(
            {
                "part": [int(g["part"].iloc[0])],
                "n": [m],
                "t_str": [str(_exact_sum(v))],
                "s_str": [str(s_local)],
            }
        )

    parts = (
        rev.map_batches(assign, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_partial, batch_format="pandas")
        .to_pandas()
    )
    n = int(parts["n"].sum())
    total = sum(int(x) for x in parts["t_str"])
    s = sum(
        int(offsets[int(p)]) * int(t) + int(sl)
        for p, t, sl in zip(parts["part"], parts["t_str"], parts["s_str"])
    )
    if n == 0 or total <= 0:
        return empty
    gini = (10**9 * (2 * s - (n + 1) * total)) // (n * total)
    return pd.DataFrame(
        {
            "n_customers": pd.Series([n], dtype="int64"),
            "total_cents": pd.Series([total], dtype="int64"),
            "gini_x1e9": pd.Series([gini], dtype="int64"),
        }
    )


def q_csv_roundtrip(sf_dir: str):
    """Sink→source identity for the CSV format: write the events table
    through Ray's distributed CSV sink (one file per block), stream it
    BACK through `sources.readers.read_csv_table` (explicit schema +
    the pinned lossless conversion rules — see its docstring for the
    null-vs-empty-string and nan/inf conventions), and emit the per-event
    row with ts as epoch-microseconds.  The oracle computes the same
    projection from the ORIGINAL parquet, so a match certifies the whole
    text-container path — quoting, embedded commas/quotes/newlines,
    unicode, null round-trip, and EXACT double round-trip (Arrow writes
    shortest-roundtrip float reprs; the driver hash would flip on a
    single ulp).  Both legs are distributed; the digest projection runs
    per block."""
    import pyarrow.parquet as pq
    import shutil
    import tempfile

    from ..sources.readers import read_csv_table

    if pq.read_metadata(f"{sf_dir}/events.parquet").num_rows == 0:
        return pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "ts_us": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "event_type": pd.Series([], dtype="object"),
                "value": pd.Series([], dtype="float64"),
                "props": pd.Series([], dtype="object"),
            }
        )
    schema = pq.read_schema(f"{sf_dir}/events.parquet")
    out_dir = tempfile.mkdtemp(prefix="pdfray_csv_")
    try:
        _read(sf_dir, "events").write_csv(out_dir)

        def digest(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "event_id": t.column("event_id"),
                    "ts_us": t.column("ts").cast(pa.int64()),
                    "user_id": t.column("user_id"),
                    "event_type": t.column("event_type"),
                    "value": t.column("value"),
                    "props": t.column("props"),
                }
            )

        return (
            read_csv_table(out_dir, schema)
            .map_batches(digest, batch_format="pyarrow")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


FK_AUDIT_CHECKS = (
    "discount_out_of_range",
    "fk_order",
    "fk_part",
    "fk_supp",
    "qty_nonpositive",
    "tax_negative",
)


def q_fk_audit(sf_dir: str, stage_dir: str = None):
    """Data-quality audit over the fact table — the constraint-validation
    pass every production ingest runs: exact violation counts for three
    foreign keys and three value-domain rules.

    Plan: ONE streaming pass computes all six checks per block.  The
    catalog-order dimensions (part, supplier) audit against broadcast
    exact key sets; the CORPUS-order dimension (orders) audits exactly
    without ever broadcasting its key set: a fixed-size bloom bitmap
    (distributed OR-merge build) splits each block's orderkeys into
    definite-violations (bloom says absent — counted immediately, no
    false negatives by construction) and maybe-present keys, which reduce
    to per-block DISTINCT (orderkey, line-count) partials and settle
    through one candidate-sized hash anti-join (`_join_pad`ed) — the
    surviving false positives are the remaining violations.  Value
    checks are vectorized compares.  Totals are O(checks) integers.

    The per-block partial stream (6 fixed rows + distinct-maybe keys per
    block) feeds TWO consumers (driver fold + anti-join), so it rides a
    parquet stage checkpoint, never an object-store materialize (it is of
    distinct-orders order at scale); an explicit ``stage_dir`` gives a
    crashed run resume at the boundary."""
    import shutil
    import tempfile

    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from .sizing import shuffle_partitions
    from .staging import stage_checkpoint

    part = typed_collect(_read(sf_dir, "part", ["p_partkey"]))
    supp = typed_collect(_read(sf_dir, "supplier", ["s_suppkey"]))
    pk_ref = ray.put(part["p_partkey"].to_numpy(np.int64))
    sk_ref = ray.put(supp["s_suppkey"].to_numpy(np.int64))

    orders = _read(sf_dir, "orders", ["o_orderkey"], rows_per_block=500_000)

    def build_bits(t: pa.Table) -> pa.Table:
        keys = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        bits = np.zeros(BLOOM_BITS // 8, np.uint8)
        if len(keys):
            idx = _bloom_probe_idx(keys).ravel()
            np.bitwise_or.at(
                bits,
                (idx >> np.uint64(3)).astype(np.int64),
                (np.uint64(1) << (idx & np.uint64(7))).astype(np.uint8),
            )
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    bits = np.zeros(BLOOM_BITS // 8, np.uint8)
    for r in orders.map_batches(build_bits, batch_format="pyarrow").take_all():
        bits |= np.frombuffer(r["bits"], np.uint8)
    bits_ref = ray.put(bits)

    class _Audit:
        def __init__(self):
            self.pk = pa.array(ray.get(pk_ref))
            self.sk = pa.array(ray.get(sk_ref))
            self.bits = ray.get(bits_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
            disc = t.column("l_discount").to_numpy(zero_copy_only=False)
            tax = t.column("l_tax").to_numpy(zero_copy_only=False)
            fk_part = int(
                pc.sum(
                    pc.is_null(
                        pc.index_in(t.column("l_partkey"), value_set=self.pk)
                    )
                ).as_py()
                or 0
            )
            fk_supp = int(
                pc.sum(
                    pc.is_null(
                        pc.index_in(t.column("l_suppkey"), value_set=self.sk)
                    )
                ).as_py()
                or 0
            )
            okeys = t.column("l_orderkey").to_numpy(zero_copy_only=False)
            if len(okeys):
                idx = _bloom_probe_idx(okeys)
                byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
                bit = (np.uint64(1) << (idx & np.uint64(7))).astype(np.uint8)
                maybe = ((byte & bit) != 0).all(axis=0)
            else:
                maybe = np.zeros(0, bool)
            definite_viol = int((~maybe).sum())
            mkeys, mcnt = np.unique(okeys[maybe], return_counts=True)
            fixed = pa.table(
                {
                    "l_orderkey": pa.array(
                        np.full(6, -1, np.int64)
                    ),  # sentinel: fixed-check rows carry no key
                    "n_lines": pa.array(
                        np.array(
                            [
                                int(((disc < 0.0) | (disc > 1.0)).sum()),
                                definite_viol,
                                fk_part,
                                fk_supp,
                                int((qty <= 0.0).sum()),
                                int((tax < 0.0).sum()),
                            ],
                            np.int64,
                        )
                    ),
                    "check_id": pa.array(np.arange(6, dtype=np.int64)),
                }
            )
            maybe_rows = pa.table(
                {
                    "l_orderkey": pa.array(mkeys.astype(np.int64)),
                    "n_lines": pa.array(mcnt.astype(np.int64)),
                    "check_id": pa.array(np.full(len(mkeys), -1, np.int64)),
                }
            )
            return pa.concat_tables([fixed, maybe_rows])

    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    scanned = _read(
        sf_dir,
        "lineitem",
        [
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_discount",
            "l_tax",
        ],
        rows_per_block=200_000,
    ).map_batches(
        warm_factory(("fk_audit", bits_ref.hex()), _Audit),
        batch_format="pyarrow",
    )

    # split the stream: fixed-check partials fold on the driver
    # (O(checks x blocks) ints); maybe-keys settle via ONE candidate-sized
    # anti-join against distinct orderkeys.  Both consumers stream the
    # parquet checkpoint — the partial table never pins the object store.
    own_stage = stage_dir is None
    root = tempfile.mkdtemp(prefix="pdfray_fkaudit_") if own_stage else stage_dir
    try:
        parts_ds = stage_checkpoint(
            lambda: scanned,
            os.path.join(root, "partials"),
            resume=not own_stage,
            allow_empty=True,
        )
        totals = np.zeros(6, np.int64)
        if parts_ds is None:  # zero lineitem blocks: zero violations
            return _fk_audit_frame(totals)
        for b in parts_ds.filter(expr="check_id >= 0").iter_batches(
            batch_format="numpy"
        ):
            np.add.at(totals, b["check_id"], b["n_lines"])

        maybe_ds, n_maybe = _two_regime_sum(
            parts_ds.filter(expr="check_id < 0").drop_columns(["check_id"]),
            ["l_orderkey"],
            ["n_lines"],
        )
        totals[1] += _fk_audit_fp(maybe_ds, n_maybe, orders)
        return _fk_audit_frame(totals)
    finally:
        if own_stage:
            shutil.rmtree(root, ignore_errors=True)


def _fk_audit_frame(totals) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "check_name": pd.array(list(FK_AUDIT_CHECKS), "object"),
            "n_violations": pd.array(totals, "int64"),
        }
    ).astype({"check_name": object, "n_violations": "int64"})


def _fk_audit_fp(maybe_ds, n_maybe: int, orders) -> int:
    """Exact count of bloom FALSE POSITIVES that are real violations: the
    left fringe of one candidate-sized hash join of the distinct maybe
    keys against distinct orderkeys."""
    import numpy as np

    from .sizing import shuffle_partitions

    if n_maybe:
        n_parts = shuffle_partitions(n_maybe)
        dist_orders = orders.map_batches(
            lambda t: pa.table(
                {"o_orderkey": t.column("o_orderkey").cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        # left_outer with an explicit int marker column on the right side
        # (a key-only right side would leave no column to test for
        # match/miss); the left fringe = surviving false positives
        marked = _join_pad(
            maybe_ds.repartition(n_parts),
            pa.schema([("l_orderkey", pa.int64()), ("n_lines", pa.int64())]),
        ).join(
            _join_pad(
                dist_orders.map_batches(
                    lambda t: t.append_column(
                        "present", pa.array(np.ones(len(t), np.int64))
                    ),
                    batch_format="pyarrow",
                ).repartition(n_parts),
                pa.schema(
                    [("o_orderkey", pa.int64()), ("present", pa.int64())]
                ),
            ),
            join_type="left_outer",
            num_partitions=n_parts,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        fp = 0
        for b in marked.iter_batches(batch_format="pandas"):
            # the LEFT pad sentinel surfaces as a null-key fringe row in a
            # left_outer join (the q_full_outer lesson) — drop it here
            m = b["l_orderkey"].notna() & b["present"].isna()
            fp += int(b.loc[m, "n_lines"].sum())
        return fp
    return 0


# ---------------------------------------------------------------------------
# time-decayed features, hopping windows, KMV distinct, bipartite motifs
# ---------------------------------------------------------------------------

DECAY_REF_DAY = 19754  # 2024-02-01 UTC in epoch days: the feature "as-of" date
DECAY_MAX_AGE_DAYS = 30  # clamp keeps every weight on the 2^-30 dyadic grid


def q_decay_user_engagement(sf_dir: str):
    """Exponentially time-decayed per-user engagement score — the
    feature-pipeline freshness shape (recency-weighted counts feeding
    ranking / training-data sampling): score = sum of 2^(-age_days) over a
    user's events, age_days = clamp(REF_DAY - floor(epoch_us/day), 0, 30).

    Exact by construction, no rounding either side: every weight is a
    dyadic rational on the 2^-30 grid and a user holds far fewer than 2^23
    events per partial, so every float64 addition is EXACT and therefore
    order-independent — Ray's block order vs DuckDB's scan order cannot
    differ by a bit.  The clamp is the exactness contract, not a shortcut
    (an unclamped 2^0 + 2^-1000 mix makes addition inexact and
    order-dependent; 30 half-lives is weight < 1e-9 anyway).  Future
    events (age < 0) clamp to weight 1 rather than exploding the grid.
    Day uses floor division, not truncation — pre-epoch timestamps land in
    the correct day (the q_events_json // lesson).

    Scale shape: one streaming pass; per-block Arrow group_by partials of
    (user, score, n) merge through the shared _two_regime_sum, so the
    exchange carries at-most-|users| rows whatever the event count."""
    import numpy as np

    ds = _read(sf_dir, "events", ["user_id", "ts"], rows_per_block=12_500)
    DAY_US = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        age = DECAY_REF_DAY - np.floor_divide(ts_us, DAY_US)
        age = np.clip(age, 0, DECAY_MAX_AGE_DAYS)
        w = np.ldexp(np.ones(len(age)), -age.astype(np.int32))  # exact 2^-age
        tt = pa.table(
            {
                "user_id": t.column("user_id"),
                "n_events": pa.array(np.ones(len(t), np.int64)),
                "score": pa.array(w, pa.float64()),
            }
        )
        g = tt.group_by("user_id").aggregate(
            [("n_events", "sum"), ("score", "sum")]
        )
        return g.rename_columns(["user_id", "n_events", "score"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    red, _ = _two_regime_sum(
        parts,
        ["user_id"],
        ["n_events", "score"],
        empty_types={"score": pa.float64()},
    )
    out = typed_collect(
        red,
        pa.schema(
            [
                ("user_id", pa.int64()),
                ("n_events", pa.int64()),
                ("score", pa.float64()),
            ]
        ),
    )
    out["user_id"] = out["user_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    out["score"] = out["score"].astype("float64")
    return out.sort_values("user_id").reset_index(drop=True)


SLIDE_HOP_US = 3_600_000_000  # hop = 1 hour
SLIDE_WIN_HOPS = 6  # window = 6 hops (6 hours)


def q_sliding_window_counts(sf_dir: str):
    """Hopping (sliding) window aggregate over the event stream — the
    streaming-window shape q_ohlc_daily's tumbling windows cannot express:
    every event belongs to WIN_HOPS overlapping windows (width 6 h, hop
    1 h), so traffic in any hour is visible in six trailing-window rows.

    Scale shape: window replication happens INSIDE the per-block kernel
    (np.repeat of the hop bucket minus an offset tile — six rows per
    event, immediately re-reduced by an Arrow group_by to per-window
    partials), so the exchange carries at-most-|nonempty windows| rows per
    block, bounded by the calendar, never 6x the event count.  The merge
    is the shared _two_regime_sum.  Window starts use floor division so
    pre-epoch events land in the correct (negative-start) window; the
    window id rides as the exact int64 start-of-window epoch-us."""
    import numpy as np

    ds = _read(
        sf_dir, "events", ["ts", "value"], rows_per_block=12_500
    )

    def partial(t: pa.Table) -> pa.Table:
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor_divide(ts_us, SLIDE_HOP_US)
        off = np.tile(np.arange(SLIDE_WIN_HOPS, dtype=np.int64), len(b))
        wb = np.repeat(b, SLIDE_WIN_HOPS) - off
        tt = pa.table(
            {
                "win_start_us": pa.array(wb * SLIDE_HOP_US),
                "n_events": pa.array(
                    np.ones(len(wb), np.int64)
                ),
                "sum_value": pa.array(np.repeat(val, SLIDE_WIN_HOPS)),
            }
        )
        g = tt.group_by("win_start_us").aggregate(
            [("n_events", "sum"), ("sum_value", "sum")]
        )
        return g.rename_columns(["win_start_us", "n_events", "sum_value"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    red, _ = _two_regime_sum(
        parts,
        ["win_start_us"],
        ["n_events", "sum_value"],
        empty_types={"sum_value": pa.float64()},
    )
    out = typed_collect(
        red,
        pa.schema(
            [
                ("win_start_us", pa.int64()),
                ("n_events", pa.int64()),
                ("sum_value", pa.float64()),
            ]
        ),
    )
    out["win_start_us"] = out["win_start_us"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = round_half_away(
        out["sum_value"].astype("float64"), 2
    )
    return out.sort_values("win_start_us").reset_index(drop=True)


KMV_K = 64  # bottom-k sketch size
KMV_SALT = ":kmv9"


def q_kmv_distinct_users(sf_dir: str):
    """KMV (k-minimum-values / bottom-k) distinct-count sketch of users
    per event type — the third mergeable sketch alongside q_hll_user_days
    (HyperLogLog) and t_cms_wordcounts (count-min), with the exact
    companion q_user_days_exact pattern: below k distinct values the
    sketch IS exact, above it the estimate is (k-1)/u_k (Bar-Yossef et
    al. 2002), u_k = the k-th smallest hash on the same exact 2^53
    md5-uniform grid as t_weighted_sample, so engine and oracle compute
    bit-identical doubles.

    Scale shape: per-block partials keep the k smallest DISTINCT hashes
    per group (at most groups x k rows per block — fixed-size mergeable
    state, like the HLL registers); the global k smallest are a subset of
    the union of per-block bottom-ks, so the merge is lossless.  Below
    PIVOT_DRIVER_MAX_ROWS partial rows the union reduces on the driver;
    above, one groupby(event_type).map_groups pass.  Output carries the
    integer digests (n_kept, kth_hash) so the compare is integer-exact."""
    import hashlib

    import numpy as np

    from .textops import _TWO53

    ds = _read(
        sf_dir, "events", ["event_type", "user_id"], rows_per_block=12_500
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["event_type", "user_id"]].drop_duplicates()
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5((str(u) + KMV_SALT).encode()).digest()[8:],
                    "little",
                )
                % _TWO53
                for u in d["user_id"]
            ),
            np.int64,
            len(d),
        )
        d = pd.DataFrame(
            {"event_type": d["event_type"].to_numpy(), "hv": h}
        ).drop_duplicates()
        d = d.sort_values(["event_type", "hv"])
        return d.groupby("event_type", as_index=False).head(KMV_K)

    parts = ds.map_batches(partial, batch_format="pandas").materialize()
    if parts.count() <= PIVOT_DRIVER_MAX_ROWS:
        df = typed_collect(
            parts,
            pa.schema([("event_type", pa.string()), ("hv", pa.int64())]),
        )
        top = (
            df.drop_duplicates()
            .sort_values(["event_type", "hv"])
            .groupby("event_type", as_index=False)
            .head(KMV_K)
        )
    else:

        def grp(g: pd.DataFrame) -> pd.DataFrame:
            u = np.unique(g["hv"].to_numpy(np.int64))[:KMV_K]
            return pd.DataFrame(
                {"event_type": [g["event_type"].iloc[0]] * len(u), "hv": u}
            )

        top = parts.groupby("event_type").map_groups(
            grp, batch_format="pandas"
        ).to_pandas()

    rows = []
    for et, g in top.groupby("event_type"):
        hs = np.sort(g["hv"].to_numpy(np.int64))
        n_kept = int(min(len(hs), KMV_K))
        kth = int(hs[n_kept - 1])
        if len(hs) >= KMV_K:
            est = round_half_away(
                (KMV_K - 1.0) * float(_TWO53) / (kth + 1.0), 4
            )
        else:
            est = float(n_kept)  # fewer than k values: the sketch is exact
        rows.append(
            {"event_type": et, "n_kept": n_kept, "kth_hash": kth, "est": est}
        )
    out = pd.DataFrame(
        rows, columns=["event_type", "n_kept", "kth_hash", "est"]
    )
    out["n_kept"] = out["n_kept"].astype("int64")
    out["kth_hash"] = out["kth_hash"].astype("int64")
    out["est"] = out["est"].astype("float64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_kmv_set_ops(sf_dir: str):
    """KMV sketch SET ALGEBRA — estimated |A∪B|, |A∩B| for the view-user
    vs purchase-user sets from two mergeable bottom-k sketches (Beyer et
    al. 2007): union = bottom-k of the merged sketches with the usual
    (k−1)/u_k estimate; intersection = (matched-in-bottom-k / k) ×
    union-estimate, where matched counts union bottom-k hashes present
    in BOTH side sketches.  Completes the sketch family's set ops next
    to the exact q_user_set_ops companion.

    Exactness contract: all state is integer digests on the exact 2^53
    md5 grid (the q_kmv_distinct_users convention), the estimate doubles
    are the same left-associated IEEE expressions in SQL, and when the
    merged union holds fewer than k hashes BOTH sketches are complete —
    the 'estimates' are then the exact counts (driver-checked at
    sf0.001).  Integer digests (kept counts, union k-th hash, matched)
    ride the compare.

    Scale shape: per-block partials keep ≤ 2k distinct-hash rows (k per
    side) — fixed-size mergeable state; the driver-or-groupby two-regime
    merge mirrors q_kmv_distinct_users; everything after is O(k) on the
    driver."""
    import hashlib

    import numpy as np

    from .textops import _TWO53

    sides = ("view", "purchase")
    ds = _read(
        sf_dir, "events", ["event_type", "user_id"], rows_per_block=12_500
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["event_type"].isin(sides)][
            ["event_type", "user_id"]
        ].drop_duplicates()
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5((str(u) + KMV_SALT).encode()).digest()[8:],
                    "little",
                )
                % _TWO53
                for u in d["user_id"]
            ),
            np.int64,
            len(d),
        )
        d = pd.DataFrame(
            {"s": d["event_type"].to_numpy(), "hv": h}
        ).drop_duplicates()
        d = d.sort_values(["s", "hv"])
        return d.groupby("s", as_index=False).head(KMV_K)

    parts = ds.map_batches(partial, batch_format="pandas").materialize()
    if parts.count() <= PIVOT_DRIVER_MAX_ROWS:
        df = typed_collect(
            parts, pa.schema([("s", pa.string()), ("hv", pa.int64())])
        )
        top = (
            df.drop_duplicates()
            .sort_values(["s", "hv"])
            .groupby("s", as_index=False)
            .head(KMV_K)
        )
    else:

        def grp(g: pd.DataFrame) -> pd.DataFrame:
            u = np.unique(g["hv"].to_numpy(np.int64))[:KMV_K]
            return pd.DataFrame({"s": [g["s"].iloc[0]] * len(u), "hv": u})

        top = parts.groupby("s").map_groups(grp, batch_format="pandas").to_pandas()

    a = np.sort(top.loc[top["s"] == sides[0], "hv"].to_numpy(np.int64))
    b = np.sort(top.loc[top["s"] == sides[1], "hv"].to_numpy(np.int64))
    union = np.unique(np.concatenate([a, b]))
    if len(union) == 0:
        return pd.DataFrame(
            {
                "n_a_kept": pd.Series([], dtype="int64"),
                "n_b_kept": pd.Series([], dtype="int64"),
                "n_union_kept": pd.Series([], dtype="int64"),
                "matched": pd.Series([], dtype="int64"),
                "union_kth": pd.Series([], dtype="int64"),
                "est_union": pd.Series([], dtype="float64"),
                "est_inter": pd.Series([], dtype="float64"),
            }
        )
    n_u = int(min(len(union), KMV_K))
    bott = union[:n_u]
    kth = int(bott[-1])
    matched = int((np.isin(bott, a) & np.isin(bott, b)).sum())
    if len(union) >= KMV_K:
        raw = (KMV_K - 1.0) * float(_TWO53) / (kth + 1.0)
        est_union = float(round_half_away(raw, 4))
        est_inter = float(round_half_away(matched * raw / KMV_K, 4))
    else:  # both sketches complete: the estimates ARE the exact counts
        est_union = float(n_u)
        est_inter = float(matched)
    return pd.DataFrame(
        {
            "n_a_kept": pd.Series([len(a)], dtype="int64"),
            "n_b_kept": pd.Series([len(b)], dtype="int64"),
            "n_union_kept": pd.Series([n_u], dtype="int64"),
            "matched": pd.Series([matched], dtype="int64"),
            "union_kth": pd.Series([kth], dtype="int64"),
            "est_union": pd.Series([est_union], dtype="float64"),
            "est_inter": pd.Series([est_inter], dtype="float64"),
        }
    )


def q_butterfly_count(sf_dir: str):
    """Bipartite graph motif counting over the customer-part purchase
    graph (edges = distinct (o_custkey, l_partkey) via lineitem JOIN
    orders): edge count, per-side wedge counts (sum of C(degree, 2)), and
    the butterfly count (4-cycles — the bipartite clustering primitive,
    Wang et al. / Shi & Shun's parallel butterfly counting).

    Plan: one keyed hash exchange joins lineitem to orders (both sides
    _join_pad-ed, partitions from sizing.shuffle_partitions), a
    distributed groupby dedups to the edge set, degree tables reduce via
    per-block Arrow partials (+ _two_regime_sum) — C(d,2) folds on the
    reduced rows.  Butterflies need one wedge enumeration; the side
    matters enormously (sum of d^2 differs by orders of magnitude between
    sides), so the engine picks the CHEAPER side from the exact per-side
    wedge counts it just computed — the two enumerations count the same
    butterflies, so the choice is invisible in the output (the oracle
    always enumerates from the part side).  Wedges are emitted per-group
    (np triu pair expansion, vectorized), re-reduced per block, and the
    final C(c,2) fold streams over the reduced pair table in batches —
    the full pair table never lands on the driver.

    Scale notes: exact butterfly counting is inherently sum-of-d^2 work;
    the side pick bounds it by min over sides, and a single hot vertex
    (one task's group) is the known straggler — the literature splits a
    hot vertex's pair enumeration into index stripes, the natural next
    step if a corpus shows one."""
    import numpy as np
    import pyarrow.parquet as pq

    from .sizing import shuffle_partitions

    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_partkey"], rows_per_block=100_000
    ).map_batches(
        lambda t: t.group_by(["l_orderkey", "l_partkey"]).aggregate([]),
        batch_format="pyarrow",
    )
    od = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey"], rows_per_block=100_000
    )

    joined = _join_pad(
        li,
        pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64())]),
    ).join(
        _join_pad(
            od,
            pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        ),
        join_type="inner",
        num_partitions=shuffle_partitions(n_li),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def edge_partial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {"u": t.column("o_custkey"), "p": t.column("l_partkey")}
        )
        return tt.group_by(["u", "p"]).aggregate([])

    # global edge dedup: bucket-hash co-location + one vectorized
    # drop_duplicates per bucket (the per-(u, p)-key Ray Aggregate spent
    # ~16 s at sf0.1 on a 600k-row stream; same lesson as the wedge
    # count below)
    n_ebuckets = shuffle_partitions(n_li)

    def edge_bucket(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        p = t.column("p").to_numpy(zero_copy_only=False).astype(np.uint64)
        z = u * np.uint64(0x9E3779B97F4A7C15) ^ (p + np.uint64(0x85EBCA77C2B2AE63))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = z ^ (z >> np.uint64(31))
        return t.append_column(
            "eb", pa.array((z % np.uint64(n_ebuckets)).astype(np.int64))
        )

    def edge_dedup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(["u", "p"])[["u", "p"]]
        return out.astype({"u": "int64", "p": "int64"})

    edges = (
        joined.map_batches(edge_partial, batch_format="pyarrow")
        .map_batches(edge_bucket, batch_format="pyarrow")
        .groupby("eb")
        .map_groups(edge_dedup, batch_format="pandas")
        .materialize()
    )
    n_edges = edges.count()

    def deg_partial(col):
        def f(t: pa.Table) -> pa.Table:
            tt = pa.table(
                {
                    col: t.column(col),
                    "d": pa.array(np.ones(len(t), np.int64)),
                }
            )
            g = tt.group_by(col).aggregate([("d", "sum")])
            return g.rename_columns([col, "d"])

        return f

    def wedge_total(col):
        red, _ = _two_regime_sum(
            edges.map_batches(deg_partial(col), batch_format="pyarrow"),
            [col],
            ["d"],
        )
        total = 0
        for b in red.iter_batches(batch_format="pandas"):
            d = b["d"].to_numpy(np.int64)
            total += int((d * (d - 1) // 2).sum())
        return total

    n_wedges_user = wedge_total("u")
    n_wedges_part = wedge_total("p")

    # enumerate wedges from the cheaper side; both count the same butterflies
    side, other = (
        ("p", "u") if n_wedges_part <= n_wedges_user else ("u", "p")
    )

    def vbucket(t: pa.Table) -> pa.Table:
        # vertex-hash buckets for the wedge expansion: ~cluster-CPU groups
        # instead of one map_groups group per vertex (Ray pays ~1 ms of
        # per-group machinery — 25k part-vertices cost ~25 s that way)
        z = (
            t.column(side).to_numpy(zero_copy_only=False).astype(np.uint64)
            + np.uint64(0x9E3779B97F4A7C15)
        )
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        return t.append_column(
            "vb", pa.array((z % np.uint64(n_vbuckets)).astype(np.int64))
        )

    def expand_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # all of this bucket's vertices expand in ONE task: sort once,
        # per-vertex triu over contiguous runs, concatenate
        g = g.sort_values([side, other], kind="mergesort")
        keys = g[side].to_numpy(np.int64)
        vals = g[other].to_numpy(np.int64)
        _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
        outs_a, outs_b = [], []
        for s, n in zip(starts, counts):
            if n < 2:
                continue
            v = vals[s : s + n]
            i, j = np.triu_indices(n, k=1)
            outs_a.append(v[i])
            outs_b.append(v[j])
        if not outs_a:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype="int64"),
                    "b": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {"a": np.concatenate(outs_a), "b": np.concatenate(outs_b)}
        )

    if n_edges:
        # One BUCKETED exchange counts the pairs: hash each wedge pair to
        # a data-proportional bucket (splitmix64 of the mixed pair key),
        # co-locating every copy of a pair in one bucket, where a single
        # vectorized pandas groupby yields the exact global counts and
        # folds C(c, 2) to ONE row per bucket — the driver sums B ints.
        # The previous per-(a, b)-key Ray Aggregate ground ~9M wedge rows
        # through one reduce task for 400+ s at sf0.1; bucketing makes
        # the reduce balanced and the per-key machinery a pandas kernel
        # (measured ~25x faster, identical output).
        n_buckets = shuffle_partitions(min(n_wedges_user, n_wedges_part))
        n_vbuckets = shuffle_partitions(n_edges)

        def bucketize(t: pa.Table) -> pa.Table:
            # block-local pre-count, then the pair-key hash bucket
            g = (
                t.group_by(["a", "b"])
                .aggregate([("a", "count")])
                .rename_columns(["a", "b", "c"])
            )
            a = g.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
            b = g.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
            z = a * np.uint64(0x9E3779B97F4A7C15) ^ (b + np.uint64(0x85EBCA77C2B2AE63))
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z = z ^ (z >> np.uint64(31))
            return g.append_column(
                "bucket", pa.array((z % np.uint64(n_buckets)).astype(np.int64))
            )

        def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
            c = g.groupby(["a", "b"], sort=False)["c"].sum().to_numpy(np.int64)
            return pd.DataFrame(
                {
                    "bucket": pd.Series([int(g["bucket"].iloc[0])], dtype="int64"),
                    "bf": pd.Series([int((c * (c - 1) // 2).sum())], dtype="int64"),
                }
            )

        folds = typed_collect(
            edges.map_batches(vbucket, batch_format="pyarrow")
            .groupby("vb")
            .map_groups(expand_bucket, batch_format="pandas")
            .map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_fold, batch_format="pandas"),
            pa.schema([("bucket", pa.int64()), ("bf", pa.int64())]),
        )
        n_butterflies = int(folds["bf"].sum())
    else:
        n_butterflies = 0

    return pd.DataFrame(
        {
            "n_edges": pd.array([n_edges], "int64"),
            "n_wedges_user": pd.array([n_wedges_user], "int64"),
            "n_wedges_part": pd.array([n_wedges_part], "int64"),
            "n_butterflies": pd.array([n_butterflies], "int64"),
        }
    )


FREQ_PAIR_MINSUP = 2  # minimum co-purchase support for a frequent pair


def _basket_pair_partials(sf_dir: str, with_singles: bool = False):
    """Shared basket machinery for q_frequent_pairs and q_triangle_count:
    one order-keyed bucket exchange co-locates each basket (never one
    Python group per order), fully-vectorized per-bucket pair expansion
    (lexsort + run-length offsets + a constant lag loop — basket sizes
    are catalog-bounded), per-bucket pre-reduce, then `_two_regime_sum`
    to the exact global unordered-pair counts.  Returns ``(red, n_li)``:
    `red` streams one (a, b, c) row per DISTINCT co-purchased part pair
    (a < b by construction — parts sort ascending within a basket).

    ``with_singles=True`` (q_assoc_rules) rides two extra row kinds
    through the SAME exchange and reduce — single-item supports as
    (part, -1, n_orders_with_part) and the basket count as (-2, -2,
    n_orders) — legal because buckets partition ORDERS (per-bucket
    distinct is globally distinct) and real partkeys are positive, so
    the sentinel keys cannot collide with pair rows."""
    import numpy as np
    import pyarrow.parquet as pq

    from .sizing import shuffle_partitions

    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    nb = shuffle_partitions(n_li)

    def bucketize(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        # uint64 mix (int64*uint64 silently promotes to float64 — the
        # bucket-hash collapse lesson, CLAUDE.md)
        mixed = o.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        t = t.append_column(
            "bucket", pa.array((mixed % np.uint64(nb)).astype(np.int64))
        )
        return t

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        o = g["l_orderkey"].to_numpy(np.int64)
        p = g["l_partkey"].to_numpy(np.int64)
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        if len(o):
            keep = np.ones(len(o), bool)
            keep[1:] = (o[1:] != o[:-1]) | (p[1:] != p[:-1])
            o, p = o[keep], p[keep]
        starts = np.flatnonzero(np.r_[True, o[1:] != o[:-1]]) if len(o) else []
        sizes = np.diff(np.r_[starts, len(o)]) if len(o) else np.empty(0, np.int64)
        pos = np.arange(len(o)) - np.repeat(starts, sizes) if len(o) else None
        size_rep = np.repeat(sizes, sizes) if len(o) else None
        out_a, out_b = [], []
        for lag in range(1, int(sizes.max()) if sizes.size else 0):
            idx = np.flatnonzero(pos + lag < size_rep)
            out_a.append(p[idx])
            out_b.append(p[idx + lag])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        part = (
            pd.DataFrame({"a": a, "b": b})
            .groupby(["a", "b"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )
        part["c"] = part["c"].astype("int64")
        if with_singles:
            sp, sc = (
                np.unique(p, return_counts=True)
                if len(o)
                else (np.empty(0, np.int64), np.empty(0, np.int64))
            )
            singles = pd.DataFrame(
                {"a": sp, "b": np.full(len(sp), -1, np.int64), "c": sc}
            )
            n_orders = int(len(starts)) if len(o) else 0
            nb_row = pd.DataFrame({"a": [-2], "b": [-2], "c": [n_orders]})
            part = pd.concat([part, singles, nb_row], ignore_index=True)
            for col in ("a", "b", "c"):
                part[col] = part[col].astype("int64")
        return part

    pair_parts = (
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_partkey"],
            rows_per_block=100_000,
        )
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
    red, _ = _two_regime_sum(pair_parts, ["a", "b"], ["c"])
    return red, n_li


def q_frequent_pairs(sf_dir: str):
    """Market-basket frequent-pair mining over order baskets (the
    A-Priori / SON family, Agrawal & Srikant 1994): every unordered pair
    of distinct parts co-purchased in >= FREQ_PAIR_MINSUP orders, with
    its exact order count.

    Plan: `_basket_pair_partials` (shared with q_triangle_count) — one
    order-keyed bucket exchange, vectorized basket pair expansion,
    per-bucket pre-reduce, `_two_regime_sum` global reduction.  The
    minsup cut happens on the reduced rows.  Counts are integers end to
    end; no float enters the compare.

    SON note: the classic two-pass SON plan (locally-frequent candidate
    broadcast, then an exact counting pass) only pays when baskets are
    huge and the pair universe dwarfs memory; with bounded baskets the
    direct bucketed count moves strictly fewer bytes in one fewer pass.
    """
    red, _ = _basket_pair_partials(sf_dir)
    out = red.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("c"), FREQ_PAIR_MINSUP)),
        batch_format="pyarrow",
    )
    df = typed_collect(
        out,
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("c", pa.int64())]),
    )
    df = df.rename(columns={"a": "part_a", "b": "part_b", "c": "n_orders"})
    return df.sort_values(["part_a", "part_b"]).reset_index(drop=True)


def q_assoc_rules(sf_dir: str):
    """Association rules over the frequent co-purchase pairs (the
    confidence/lift half of Agrawal & Srikant's A-Priori — q_frequent_
    pairs mines the itemsets, this derives the rules): for every frequent
    pair {a, b} both directed rules a=>b and b=>a with exact support
    counts, floor-percent confidence and a lift on the 1e-4 integer grid.

    Plan: `_basket_pair_partials(with_singles=True)` — the SAME single
    order-keyed bucket exchange that counts pairs also emits single-item
    supports (part, -1, n) and the basket count (-2, -2, n) as sentinel
    rows, so rules cost ZERO additional shuffles over the pair mining.
    The reduced stream is cut to frequent pairs + the catalog-BOUNDED
    singles table (parts, never lineitems) and folds on the driver.

    Exactness: everything is integer — conf_pct = (100*n_ab) // n_a and
    lift_x1e4 = (10000*n_ab*n_baskets) // (n_a*n_b), both all-positive so
    Python floor == DuckDB // truncation; products stay far under 2^63
    at any TPC-H scale (n_* are order counts)."""
    red, _ = _basket_pair_partials(sf_dir, with_singles=True)

    def cut(t: pa.Table) -> pa.Table:
        keep = pc.or_(
            pc.less(t.column("b"), 0),  # singles + basket-count sentinels
            pc.greater_equal(t.column("c"), FREQ_PAIR_MINSUP),
        )
        return t.filter(keep)

    df = typed_collect(
        red.map_batches(cut, batch_format="pyarrow"),
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("c", pa.int64())]),
    )
    cols = [
        "antecedent",
        "consequent",
        "n_ab",
        "n_a",
        "n_b",
        "n_baskets",
        "conf_pct",
        "lift_x1e4",
    ]
    if len(df) == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    n_baskets = int(df.loc[df["a"] == -2, "c"].sum())
    singles = df[(df["b"] == -1) & (df["a"] >= 0)].set_index("a")["c"]
    pairs = df[df["b"] >= 0]
    if len(pairs) == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    # both rule directions, vectorized (result-sized frames only)
    fwd = pd.DataFrame(
        {
            "antecedent": pairs["a"].to_numpy(),
            "consequent": pairs["b"].to_numpy(),
            "n_ab": pairs["c"].to_numpy(),
        }
    )
    rev = fwd.rename(
        columns={"antecedent": "consequent", "consequent": "antecedent"}
    )
    out = pd.concat([fwd, rev], ignore_index=True)
    out["n_a"] = out["antecedent"].map(singles).astype("int64")
    out["n_b"] = out["consequent"].map(singles).astype("int64")
    out["n_baskets"] = n_baskets
    out["conf_pct"] = (100 * out["n_ab"]) // out["n_a"]
    # exact Python-int products (the lift numerator can pass 2^63 at
    # extreme scale; the frame is rule-sized, so object ints are free)
    out["lift_x1e4"] = (
        (10000 * out["n_ab"].astype(object) * int(n_baskets))
        // (out["n_a"].astype(object) * out["n_b"].astype(object))
    ).astype("int64")
    for c in cols:
        out[c] = out[c].astype("int64")
    return (
        out[cols]
        .sort_values(["antecedent", "consequent"])
        .reset_index(drop=True)
    )


MARKOV_BUCKETS = 64
MARKOV_CHUNK_DAYS = 7  # hot-key split width; stitch is correct for ANY width


def q_markov_transitions(sf_dir: str):
    """Global event-type transition matrix (first-order Markov counts):
    for every consecutive event pair in a user's timeline — ordered by
    (ts, event_id), the deterministic tiebreak — count (prev_type,
    next_type).  The sequence-modeling bigram shape: session-intent
    mining, next-event prediction priors, UI-flow analysis all reduce to
    this matrix.

    Hot-key-safe like q_interevent_gap_stats: the ONE event-sized
    exchange keys on (user_id, time chunk) via _session_keys, so a user
    owning half the corpus splits across chunk groups.  Each bucket group
    counts its in-chunk transitions vectorized (shift-compare, never a
    row loop) and emits one narrow BOUNDARY row per (user, chunk) —
    first/last event type — because the cross-chunk pair (last event of a
    chunk, first event of the user's NEXT populated chunk) is the only
    lag the in-chunk pass cannot see.  Chunk order is time order (chunk =
    ts // width is monotone, and a ts tie always lands in one chunk), so
    the stitch sorts boundary rows by (user, chunk) and takes adjacent
    same-user pairs — two-regime: driver pandas below
    PIVOT_DRIVER_MAX_ROWS boundary rows, a user-hash-bucketed groupby
    above.  Transition cells reduce via `_two_regime_sum`; everything
    that moves is (type, type, int64) — the event text never reshuffles.
    """
    import numpy as np
    import ray.data as rd

    ds = _read(
        sf_dir,
        "events",
        ["event_id", "ts", "user_id", "event_type"],
        rows_per_block=12_500,
    )
    chunk_us = np.int64(MARKOV_CHUNK_DAYS) * 86_400_000_000

    def bucketize(t: pa.Table) -> pa.Table:
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        chunk, bucket = _session_keys(users, ts_us, MARKOV_BUCKETS, chunk_us)
        t = t.append_column("chunk", pa.array(chunk, pa.int64()))
        return t.append_column("bucket", pa.array(bucket))

    _PART_COLS = {
        "kind": "int64",
        "prev_type": "object",
        "next_type": "object",
        "n": "int64",
        "user_id": "int64",
        "chunk": "int64",
        "first_type": "object",
        "last_type": "object",
    }

    def _empty_part() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=d) for c, d in _PART_COLS.items()})

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "chunk", "ts", "event_id"])
        same = g["user_id"].eq(g["user_id"].shift()) & g["chunk"].eq(
            g["chunk"].shift()
        )
        ic = (
            pd.DataFrame(
                {
                    "prev_type": g["event_type"].shift()[same],
                    "next_type": g["event_type"][same],
                }
            )
            .groupby(["prev_type", "next_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        bnd = (
            g.groupby(["user_id", "chunk"], sort=False)
            .agg(first_type=("event_type", "first"), last_type=("event_type", "last"))
            .reset_index()
        )
        a = _empty_part()
        parts = []
        if len(ic):
            t = a.copy()
            t = pd.DataFrame(
                {
                    "kind": np.zeros(len(ic), np.int64),
                    "prev_type": ic["prev_type"].to_numpy(),
                    "next_type": ic["next_type"].to_numpy(),
                    "n": ic["n"].to_numpy(np.int64),
                    "user_id": np.full(len(ic), -1, np.int64),
                    "chunk": np.full(len(ic), -1, np.int64),
                    "first_type": np.full(len(ic), "", object),
                    "last_type": np.full(len(ic), "", object),
                }
            )
            parts.append(t)
        if len(bnd):
            parts.append(
                pd.DataFrame(
                    {
                        "kind": np.ones(len(bnd), np.int64),
                        "prev_type": np.full(len(bnd), "", object),
                        "next_type": np.full(len(bnd), "", object),
                        "n": np.zeros(len(bnd), np.int64),
                        "user_id": bnd["user_id"].to_numpy(np.int64),
                        "chunk": bnd["chunk"].to_numpy(np.int64),
                        "first_type": bnd["first_type"].to_numpy(object),
                        "last_type": bnd["last_type"].to_numpy(object),
                    }
                )
            )
        return pd.concat(parts, ignore_index=True) if parts else a

    _part_schema = pa.schema(
        [
            ("kind", pa.int64()),
            ("prev_type", pa.string()),
            ("next_type", pa.string()),
            ("n", pa.int64()),
            ("user_id", pa.int64()),
            ("chunk", pa.int64()),
            ("first_type", pa.string()),
            ("last_type", pa.string()),
        ]
    )

    parts = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
        .materialize()  # narrow: transition cells + one row per (user, chunk)
    )

    internal = parts.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 0)).select(
            ["prev_type", "next_type", "n"]
        ),
        batch_format="pyarrow",
    )

    bnd_ds = parts.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 1)).select(
            ["user_id", "chunk", "first_type", "last_type"]
        ),
        batch_format="pyarrow",
    ).materialize()

    def stitch(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["user_id", "chunk"])
        same = b["user_id"].eq(b["user_id"].shift())
        out = (
            pd.DataFrame(
                {
                    "prev_type": b["last_type"].shift()[same],
                    "next_type": b["first_type"][same],
                }
            )
            .groupby(["prev_type", "next_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        out["n"] = out["n"].astype("int64")
        if not len(out):
            return pd.DataFrame(
                {
                    "prev_type": pd.Series(dtype="object"),
                    "next_type": pd.Series(dtype="object"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        return out

    n_bnd = bnd_ds.count()
    _bnd_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("chunk", pa.int64()),
            ("first_type", pa.string()),
            ("last_type", pa.string()),
        ]
    )
    if n_bnd <= PIVOT_DRIVER_MAX_ROWS:
        stitched_df = stitch(typed_collect(bnd_ds, _bnd_schema))
        stitched = rd.from_arrow(
            pa.Table.from_pandas(stitched_df, preserve_index=False).cast(
                pa.schema(
                    [
                        ("prev_type", pa.string()),
                        ("next_type", pa.string()),
                        ("n", pa.int64()),
                    ]
                )
            )
        )
    else:

        def ubucket(t: pa.Table) -> pa.Table:
            u = t.column("user_id").to_numpy(zero_copy_only=False)
            mixed = u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            return t.append_column(
                "ub", pa.array((mixed % np.uint64(MARKOV_BUCKETS)).astype(np.int64))
            )

        stitched = (
            bnd_ds.map_batches(ubucket, batch_format="pyarrow")
            .groupby("ub")
            .map_groups(
                lambda b: stitch(b.drop(columns=["ub"])), batch_format="pandas"
            )
        )

    red, _ = _two_regime_sum(
        internal.union(stitched),
        ["prev_type", "next_type"],
        ["n"],
        empty_types={"prev_type": pa.string(), "next_type": pa.string()},
    )
    df = typed_collect(
        red,
        pa.schema(
            [
                ("prev_type", pa.string()),
                ("next_type", pa.string()),
                ("n", pa.int64()),
            ]
        ),
    )
    return df.sort_values(["prev_type", "next_type"]).reset_index(drop=True)


def _skyline_sweep(price, size, key):
    """Indices of the 2D skyline (min price, max size) with standard
    dominance: a row is dominated iff some other row is <= on price, >=
    on size, and strict on at least one — ties on BOTH axes survive
    together.  One sort + two reduceat passes, no pairwise grid."""
    import numpy as np

    n = len(price)
    if n == 0:
        return np.empty(0, np.int64)
    order = np.argsort(price, kind="stable")
    pr, sz = price[order], size[order]
    starts = np.flatnonzero(np.r_[True, pr[1:] != pr[:-1]])
    gsizes = np.diff(np.r_[starts, n])
    # max size within each equal-price group, and the running max of all
    # strictly-cheaper groups
    geq_max = np.maximum.reduceat(sz, starts)
    strict_max = np.r_[np.iinfo(np.int64).min, np.maximum.accumulate(geq_max)[:-1]]
    gid = np.repeat(np.arange(len(starts)), gsizes)
    keep = (sz > strict_max[gid]) & (sz == geq_max[gid])
    return order[keep]


def q_skyline_parts(sf_dir: str):
    """Pareto-skyline of the part catalog: parts for which no other part
    is both cheaper-or-equal AND larger-or-equal with at least one strict
    — the classic skyline operator (Borzsony/Kossmann/Stocker 2001) over
    (minimize p_retailprice, maximize p_size).

    Distributed shape: the skyline of a union is contained in the union
    of per-block skylines (a globally-undominated row is undominated in
    its own block), so each block reduces to its local skyline with one
    sort + prefix-max sweep (`_skyline_sweep`, O(n log n), no pairwise
    grid) and the driver runs the SAME sweep over the concatenated block
    skylines — for 2D data the block skyline is O(distinct prices) at
    worst and tiny in practice, so the merge input is driver-sized by
    construction while the scan stays a zero-shuffle streaming pass.
    Prices compare as exact 1/100-grid doubles straight from the parquet;
    no arithmetic touches them, so no rounding is needed either side."""
    import numpy as np

    def block_skyline(t: pa.Table) -> pa.Table:
        price = t.column("p_retailprice").to_numpy(zero_copy_only=False)
        size = t.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)
        key = t.column("p_partkey").to_numpy(zero_copy_only=False)
        idx = _skyline_sweep(price, size, key)
        return pa.table(
            {
                "p_partkey": pa.array(key[idx], pa.int64()),
                "p_size": pa.array(size[idx], pa.int64()),
                "p_retailprice": pa.array(price[idx], pa.float64()),
            }
        )

    ds = _read(
        sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"]
    ).map_batches(block_skyline, batch_format="pyarrow")
    cand = typed_collect(
        ds,
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_size", pa.int64()),
                ("p_retailprice", pa.float64()),
            ]
        ),
    )
    price = cand["p_retailprice"].to_numpy(np.float64)
    size = cand["p_size"].to_numpy(np.int64)
    key = cand["p_partkey"].to_numpy(np.int64)
    idx = _skyline_sweep(price, size, key)
    out = cand.iloc[np.sort(idx)]
    return out.sort_values("p_partkey").reset_index(drop=True)


def q_user_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type mix (bits) — the
    behavioral-diversity feature: H = log2(n) - sum(c_i*log2(c_i))/n over
    the user's per-type counts.

    Emitted as half-up-rounded integer milli-bits with a two-sided safety
    argument: non-dyadic entropies are irrational (ulp noise cannot reach
    a .0005 boundary), and DYADIC entropies — the exact-arithmetic cases,
    e.g. a 50/50 two-type user with power-of-two counts — are dyadic
    rationals, which can never equal the non-dyadic boundary value
    (2k+1)/2000; both engines also evaluate the SAME expression shape
    (log2(tot) - s/tot), so even the single-type H=0 case lands within an
    ulp of 0 on both sides and floors identically.

    Plan: per-block (user, type) count combiner, `_two_regime_sum` for
    the global reduction (the only exchange), then per-user entropy over
    the reduced rows — driver pandas below PIVOT_DRIVER_MAX_ROWS, a
    user-keyed map_groups above.  Only (int64, string, int64) rows ever
    move."""
    import numpy as np

    def count_partial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
            }
        )
        g = tt.group_by(["user_id", "event_type"]).aggregate([("user_id", "count")])
        return g.rename_columns(["user_id", "event_type", "n"])

    parts = _read(
        sf_dir, "events", ["user_id", "event_type"], rows_per_block=100_000
    ).map_batches(count_partial, batch_format="pyarrow")
    red, n_red = _two_regime_sum(
        parts,
        ["user_id", "event_type"],
        ["n"],
        empty_types={"user_id": pa.int64(), "event_type": pa.string()},
    )

    def entropy_frame(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_events": pd.Series(dtype="int64"),
                    "entropy_x1e3": pd.Series(dtype="int64"),
                }
            )
        n = df["n"].to_numpy(np.int64)
        term = n * np.log2(n.astype(np.float64))
        g = (
            pd.DataFrame({"user_id": df["user_id"].to_numpy(), "n": n, "s": term})
            .groupby("user_id", as_index=False)
            .agg(tot=("n", "sum"), s=("s", "sum"))
        )
        tot = g["tot"].to_numpy(np.int64)
        h = np.log2(tot.astype(np.float64)) - g["s"].to_numpy() / tot
        return pd.DataFrame(
            {
                "user_id": g["user_id"].astype("int64"),
                "n_events": g["tot"].astype("int64"),
                "entropy_x1e3": np.floor(h * 1000.0 + 0.5).astype(np.int64),
            }
        )

    if n_red <= PIVOT_DRIVER_MAX_ROWS:
        out = entropy_frame(
            typed_collect(
                red,
                pa.schema(
                    [
                        ("user_id", pa.int64()),
                        ("event_type", pa.string()),
                        ("n", pa.int64()),
                    ]
                ),
            )
        )
    else:
        out = (
            red.groupby("user_id")
            .map_groups(entropy_frame, batch_format="pandas")
            .to_pandas()
        )
    return out.sort_values("user_id").reset_index(drop=True)


LATE_ID_CHUNK = 50_000  # arrival-order split width; stitch correct for ANY width
_I64_MIN = -(2**63)


def q_late_events_audit(sf_dir: str, stage_dir: str = None):
    """Out-of-order-arrival audit (the streaming watermark shape): taking
    event_id as ingest/arrival order, an event is LATE iff its event time
    ts is below the user's running max ts over all earlier-arriving
    events — per user: event count, late count, and the worst lateness in
    microseconds.  This is the audit every event-time pipeline runs
    before choosing its watermark delay.

    Hot-key-safe two-pass plan (the q_running_user_spend shape, but the
    prefix is a running MAX over ARRIVAL order instead of a sum over
    time): events shuffle once on (user_id, arrival-id chunk) keys; each
    group computes its chunk-LOCAL exclusive prefix max vectorized; the
    per-(user, chunk) chunk-max table (max is combinable, so block splits
    of the group output are safe) reduces to the driver, which folds the
    EXCLUSIVE incoming watermark per chunk; watermarks ride a keyed
    shuffle JOIN back on (user_id, chunk) — an event is late against
    max(incoming, local prefix), which equals the global arrival prefix
    exactly, for any chunk width.  The scanned table, consumed twice, is
    a parquet stage checkpoint with crash-resume via ``stage_dir``.  All
    comparisons are int64 microseconds; nothing floats."""
    import os
    import shutil
    import tempfile

    import numpy as np
    import ray.data as rd

    from .sizing import shuffle_partitions
    from .staging import stage_checkpoint

    ds = _read(
        sf_dir, "events", ["event_id", "ts", "user_id"], rows_per_block=12_500
    )
    N_BUCKETS = 64

    def bucketize(t: pa.Table) -> pa.Table:
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        chunk, bucket = _session_keys(users, eid, N_BUCKETS, LATE_ID_CHUNK)
        ts_us = t.column("ts").cast(pa.int64())
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": ts_us,
                "chunk": pa.array(chunk, pa.int64()),
                "bucket": pa.array(bucket),
            }
        )

    def scan_chunk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "chunk", "event_id"]).reset_index(drop=True)
        same = g["user_id"].eq(g["user_id"].shift()) & g["chunk"].eq(
            g["chunk"].shift()
        )
        run_id = (~same).cumsum()
        ts = g["ts_us"].astype("int64")
        # exclusive prefix max within the (user, chunk) run
        inc = ts.groupby(run_id.to_numpy()).cummax().shift()
        wm_local = inc.where(same, other=float("nan"))
        g["wm_local"] = (
            wm_local.fillna(float(_I64_MIN)).astype("int64")
            if len(g)
            else pd.Series([], dtype="int64")
        )
        return g[["user_id", "chunk", "ts_us", "wm_local"]]

    own_stage = stage_dir is None
    root = tempfile.mkdtemp(prefix="pdfray_late_") if own_stage else stage_dir
    try:
        scanned = stage_checkpoint(
            lambda: ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(scan_chunk, batch_format="pandas"),
            os.path.join(root, "scanned"),
            resume=not own_stage,
            allow_empty=True,
        )
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "n_late": pd.Series([], dtype="int64"),
                "max_delay_us": pd.Series([], dtype="int64"),
            }
        )
        if scanned is None:
            return empty
        n_rows = scanned.count()
        # per-(user, chunk) arrival-chunk max ts; max is block-split-safe
        totals = (
            scanned.map_batches(
                lambda df: df.groupby(["user_id", "chunk"], sort=False)
                .agg(cmax=("ts_us", "max"))
                .reset_index(),
                batch_format="pandas",
            )
            .to_pandas()
            .groupby(["user_id", "chunk"], as_index=False)["cmax"]
            .max()
            .sort_values(["user_id", "chunk"])
            .reset_index(drop=True)
        )
        # exclusive incoming watermark: max over the user's EARLIER chunks
        inc = totals.groupby("user_id")["cmax"].cummax().shift()
        first = ~totals["user_id"].eq(totals["user_id"].shift())
        totals["wm_in"] = (
            inc.where(~first, other=float("nan"))
            .fillna(float(_I64_MIN))
            .astype("int64")
        )
        off_ds = rd.from_pandas(totals[["user_id", "chunk", "wm_in"]])
        n_parts = shuffle_partitions(n_rows)

        def audit(df: pd.DataFrame) -> pd.DataFrame:
            wm = np.maximum(
                df["wm_local"].to_numpy(np.int64), df["wm_in"].to_numpy(np.int64)
            )
            ts = df["ts_us"].to_numpy(np.int64)
            late = (wm > _I64_MIN) & (ts < wm)
            delay = np.where(late, wm - ts, 0)
            part = (
                pd.DataFrame(
                    {
                        "user_id": df["user_id"].to_numpy(np.int64),
                        "n_events": np.ones(len(df), np.int64),
                        "n_late": late.astype(np.int64),
                        "max_delay_us": delay.astype(np.int64),
                    }
                )
                .groupby("user_id", as_index=False)
                .agg(
                    n_events=("n_events", "sum"),
                    n_late=("n_late", "sum"),
                    max_delay_us=("max_delay_us", "max"),
                )
            )
            return part

        partials = (
            scanned.join(
                off_ds,
                join_type="inner",
                num_partitions=n_parts,
                on=("user_id", "chunk"),
            )
            .map_batches(audit, batch_format="pandas")
            .materialize()
        )
        sums, _ = _two_regime_sum(partials, ["user_id"], ["n_events", "n_late"])
        maxes, _ = _two_regime_agg(partials, ["user_id"], ["max_delay_us"], "max")
        s = typed_collect(
            sums,
            pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("n_events", pa.int64()),
                    ("n_late", pa.int64()),
                ]
            ),
        )
        m = typed_collect(
            maxes,
            pa.schema([("user_id", pa.int64()), ("max_delay_us", pa.int64())]),
        )
        if not len(s):
            return empty
        out = s.merge(m, on="user_id", how="inner")
        out = out.astype(
            {
                "user_id": "int64",
                "n_events": "int64",
                "n_late": "int64",
                "max_delay_us": "int64",
            }
        )
        return out.sort_values("user_id").reset_index(drop=True)
    finally:
        if own_stage:
            shutil.rmtree(root, ignore_errors=True)


# ----------------------------------------------------------------------
# CUSUM changepoint detection — the distributed PREFIX-SCAN shape on a
# hot key: a per-TYPE running statistic over the full time-ordered series,
# computed without ever sorting the corpus globally or landing a whole
# type on one worker

CUSUM_CHUNK_DAYS = 2
CUSUM_BUCKETS = 64


def _type_chunk_keys(types: pd.Series, ts_us: np.ndarray, chunk_us: int):
    """(type_hash, chunk, bucket) shuffle keys for per-type scans — the
    _session_keys idea with a string key: md5 per UNIQUE type (few), then
    the same uint64 mix so a hot type spreads across time chunks."""
    codes, uniques = pd.factorize(types, sort=False)
    th = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(u).encode()).digest()[:8], "little")
            for u in uniques
        ),
        np.uint64,
        len(uniques),
    )
    chunk = ts_us // np.int64(chunk_us)
    mixed = th[codes] * np.uint64(0x9E3779B97F4A7C15) + chunk.astype(
        np.uint64
    ) * np.uint64(0xC2B2AE3D27D4EB4F)
    return chunk, (mixed % np.uint64(CUSUM_BUCKETS)).astype(np.int64)


def q_cusum_changepoint(sf_dir: str):
    """Per-event-type CUSUM changepoint: the position k (1-based, ordered
    by ts then event_id) maximizing |n·prefix_k − k·total| over the cents
    grid — the classic mean-shift scan statistic cleared of division
    (S_k/n ≡ prefix_k − k·mean), so every quantity is an EXACT integer.

    This is the distributed prefix-scan shape: event types are HOT keys
    (a handful of giant groups), so the scan cannot be a per-type
    map_groups.  Pass 1 reduces each (type, time-chunk) to (count, sum)
    partials — one narrow exchange; the driver folds them into per-chunk
    global offsets (k_before, prefix_before) and per-type totals (n, T),
    a types×chunks table that is tiny BECAUSE the key is hot (few types).
    Pass 2 re-scans events keyed on (type-hash, chunk) buckets
    (_type_chunk_keys): within a chunk, S_k = C_chunk + (n·local_prefix_j
    − j·T) with C_chunk constant, so the chunk's |S| maximum is at the
    chunk's max OR min of S — each chunk emits just TWO candidate rows
    (np.argmax/argmin pick the FIRST index on ties, matching the min-k
    rule), and the driver merge picks per type by (stat DESC, k ASC),
    exactly the oracle's QUALIFY.  int64 throughout with an explicit
    overflow guard (|S| <= 2·n·Σ|cents| must clear 2^62; beyond that a
    production run rescales the grid), HUGEINT on the oracle side."""
    import ray

    ds = _read(
        sf_dir,
        "events",
        ["event_id", "ts", "event_type", "value"],
        rows_per_block=12_500,
    )
    chunk_us = np.int64(CUSUM_CHUNK_DAYS) * 86_400_000_000
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "n_events": pd.Series([], dtype="int64"),
            "cp_k": pd.Series([], dtype="int64"),
            "cp_event_id": pd.Series([], dtype="int64"),
            "cusum_stat": pd.Series([], dtype="int64"),
        }
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].astype("int64").to_numpy()
        cents = round_half_away(df["value"].to_numpy() * 100.0, 0).astype(np.int64)
        d = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "chunk": ts_us // chunk_us,
                "cents": cents,
                "acents": np.abs(cents),
            }
        )
        out = (
            d.groupby(["event_type", "chunk"], as_index=False)
            .agg(cnt=("cents", "size"), s=("cents", "sum"), sa=("acents", "sum"))
        )
        for c in ("cnt", "s", "sa"):
            out[c] = out[c].astype("int64")
        return out

    from .frames import typed_collect

    parts = typed_collect(
        ds.map_batches(partial, batch_format="pandas"),
        pa.schema(
            [
                ("event_type", pa.string()),
                ("chunk", pa.int64()),
                ("cnt", pa.int64()),
                ("s", pa.int64()),
                ("sa", pa.int64()),
            ]
        ),
    )
    if len(parts) == 0:
        return empty
    parts = (
        parts.groupby(["event_type", "chunk"], as_index=False)[["cnt", "s", "sa"]]
        .sum()
        .sort_values(["event_type", "chunk"])
    )
    totals = parts.groupby("event_type")[["cnt", "s", "sa"]].sum()
    g = parts.groupby("event_type", sort=False)
    parts["k_before"] = g["cnt"].cumsum() - parts["cnt"]
    parts["p_before"] = g["s"].cumsum() - parts["s"]
    worst = int((2 * totals["cnt"].astype("int64") * totals["sa"]).max())
    if worst >= (1 << 62):
        raise RuntimeError(
            "q_cusum_changepoint: |S| bound exceeds int64 — rescale the "
            f"value grid for this corpus (bound {worst})"
        )
    offsets = {
        (r.event_type, int(r.chunk)): (int(r.k_before), int(r.p_before))
        for r in parts.itertuples()
    }
    tot = {
        t: (int(row["cnt"]), int(row["s"])) for t, row in totals.iterrows()
    }
    bref = ray.put((offsets, tot))

    def bucketize(t: pa.Table) -> pa.Table:
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = pd.Series(t.column("event_type").to_pylist())
        chunk, bucket = _type_chunk_keys(types, ts_us, chunk_us)
        t = t.append_column("chunk", pa.array(chunk, pa.int64()))
        return t.append_column("bucket", pa.array(bucket))

    def resolve(gdf: pd.DataFrame) -> pd.DataFrame:
        offs, tots = ray.get(bref)
        gdf = gdf.sort_values(["event_type", "chunk", "ts", "event_id"])
        out = {"event_type": [], "k": [], "event_id": [], "stat": []}
        for (etype, chunk), sl in gdf.groupby(["event_type", "chunk"], sort=False):
            cents = round_half_away(sl["value"].to_numpy() * 100.0, 0).astype(
                np.int64
            )
            n, T = tots[etype]
            k_before, p_before = offs[(etype, int(chunk))]
            j = np.arange(1, len(sl) + 1, dtype=np.int64)
            S = n * (p_before + np.cumsum(cents)) - (k_before + j) * T
            eids = sl["event_id"].to_numpy()
            for i in (int(np.argmax(S)), int(np.argmin(S))):
                out["event_type"].append(etype)
                out["k"].append(int(k_before + j[i]))
                out["event_id"].append(int(eids[i]))
                out["stat"].append(abs(int(S[i])))
        o = pd.DataFrame(out)
        for c in ("k", "event_id", "stat"):
            o[c] = o[c].astype("int64")
        return o

    cands = typed_collect(
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas"),
        pa.schema(
            [
                ("event_type", pa.string()),
                ("k", pa.int64()),
                ("event_id", pa.int64()),
                ("stat", pa.int64()),
            ]
        ),
    )
    best = (
        cands.sort_values(["event_type", "stat", "k"], ascending=[True, False, True])
        .groupby("event_type", as_index=False)
        .first()
    )
    best["n_events"] = best["event_type"].map(lambda t: tot[t][0]).astype("int64")
    out = best.rename(
        columns={"k": "cp_k", "event_id": "cp_event_id", "stat": "cusum_stat"}
    )[["event_type", "n_events", "cp_k", "cp_event_id", "cusum_stat"]]
    return out.sort_values("event_type").reset_index(drop=True)


def q_date_spine_fill(sf_dir: str):
    """Per-user DAILY activity with gap days GENERATED (calendar spine
    fill between each user's first and last active day, zero-filled) —
    the row-GENERATION direction no aggregate covers: the result contains
    rows the input never had, the feature-engineering prerequisite for
    any fixed-step time-series model.

    One narrow exchange: blocks pre-reduce to (user, day) counts (day as
    exact days-since-epoch int — midnight timestamps are exact multiples
    of 86 400 s, pre-epoch included), `_two_regime_sum`-style merge, then
    the expansion is vectorized np.arange/searchsorted per user — output
    rows scale with Σ user spans, never with events.  Two-regime like
    q_pivot_event_matrix: driver expansion below PIVOT_DRIVER_MAX_ROWS
    distinct (user, day) rows, a distributed groupby(user).map_groups
    above."""
    from ray.data.aggregate import Sum

    day_us = np.int64(86_400_000_000)
    ds = _read(sf_dir, "events", ["user_id", "ts"], rows_per_block=100_000)
    empty = pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "day": pd.Series([], dtype=object),
            "n_events": pd.Series([], dtype="int64"),
        }
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].astype("int64").to_numpy()
        # floor division IS calendar-day truncation for epoch-relative us
        # (negative timestamps floor toward earlier days, like date_trunc)
        d = pd.DataFrame(
            {"user_id": df["user_id"], "day_idx": ts_us // day_us}
        )
        out = d.groupby(["user_id", "day_idx"], as_index=False).agg(
            n=("day_idx", "size")
        )
        out["n"] = out["n"].astype("int64")
        return out

    parts = ds.map_batches(partial, batch_format="pandas").materialize()

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day_idx"])
        frames = []
        for uid, sl in g.groupby("user_id", sort=False):
            days = np.arange(
                sl["day_idx"].iloc[0], sl["day_idx"].iloc[-1] + 1, dtype=np.int64
            )
            n = np.zeros(len(days), np.int64)
            n[np.searchsorted(days, sl["day_idx"].to_numpy())] = sl[
                "n"
            ].to_numpy()
            frames.append(
                pd.DataFrame(
                    {"user_id": np.full(len(days), uid, np.int64), "day_idx": days, "n_events": n}
                )
            )
        return (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "day_idx": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                }
            )
        )

    if parts.count() <= PIVOT_DRIVER_MAX_ROWS:
        pdf = typed_collect(
            parts,
            pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("day_idx", pa.int64()),
                    ("n", pa.int64()),
                ]
            ),
        )
        if len(pdf) == 0:
            return empty
        pdf = pdf.groupby(["user_id", "day_idx"], as_index=False)["n"].sum()
        out = expand(pdf)
    else:
        from ray.data.aggregate import Sum as _Sum

        merged = parts.groupby(["user_id", "day_idx"]).aggregate(
            Sum("n", alias_name="n")
        )
        out = (
            merged.groupby("user_id")
            .map_groups(expand, batch_format="pandas")
            .to_pandas()
        )
        if len(out.columns) == 0:
            return empty
    out["day"] = pd.to_datetime(out["day_idx"], unit="D").dt.strftime("%Y-%m-%d")
    out["n_events"] = out["n_events"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return (
        out[["user_id", "day", "n_events"]]
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )


def _quantile_cont_replay(vals: np.ndarray, cum: np.ndarray, p: float) -> float:
    """DuckDB quantile_cont over a (sorted distinct values, cumulative
    counts) histogram: h = (n-1)p; x[floor(h)] + frac*(x[floor(h)+1] -
    x[floor(h)]) — the q_group_quantiles formula, shared by the robust-
    stats family."""
    n = int(cum[-1])
    h = (n - 1) * p
    lo = int(np.floor(h))
    xlo = vals[np.searchsorted(cum, lo + 1)]
    xhi = vals[np.searchsorted(cum, lo + 2)] if lo + 1 < n else xlo
    return float(xlo + (h - lo) * (xhi - xlo))


def q_mad_outliers(sf_dir: str):
    """Robust per-type outlier report: median, MAD (median absolute
    deviation, interpolated like DuckDB's mad()), and the count of events
    beyond the 3-MAD fence — the robust-statistics family member (mean/
    variance live in q_group_moments; quantiles in q_group_quantiles).

    ONE narrow exchange: blocks pre-reduce to a distinct-(type, value)
    histogram over the RAW doubles (the q_group_quantiles trick — keeping
    the stored float64 keys means every downstream double op replays
    DuckDB bit-for-bit), two-regime merged; the driver then replays
    median → |x−med| deviation histogram → MAD → fence count, all from
    counts — the corpus is never rescanned and nothing about the fence
    compare is rounded (only the two REPORT columns round, half-away,
    6 dp both sides).  Bounded-domain assumption (same as
    q_group_quantiles): `value` lives on a fixed decimal grid, so the
    histogram size is bounded by the grid, not the corpus — for a
    genuinely continuous column, quantize first or switch to a sketch
    (the exact-replay property is what the grid buys)."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "events", ["event_type", "value"], rows_per_block=100_000
    )

    def hist(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "value"]).aggregate([("value", "count")])
        return g.rename_columns(["event_type", "value", "cnt"])

    parts = ds.map_batches(hist, batch_format="pyarrow").materialize()
    if parts.count() <= PIVOT_DRIVER_MAX_ROWS:
        hist_df = (
            typed_collect(
                parts,
                pa.schema(
                    [
                        ("event_type", pa.string()),
                        ("value", pa.float64()),
                        ("cnt", pa.int64()),
                    ]
                ),
            )
            .groupby(["event_type", "value"], as_index=False)["cnt"]
            .sum()
        )
    else:
        hist_df = (
            parts.groupby(["event_type", "value"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
        )
    rows = []
    for etype, g in hist_df.groupby("event_type"):
        g = g.sort_values("value")
        vals = g["value"].to_numpy(np.float64)
        cnts = g["cnt"].to_numpy(np.int64)
        med = _quantile_cont_replay(vals, cnts.cumsum(), 0.5)
        dev = pd.DataFrame({"d": np.abs(vals - med), "cnt": cnts})
        dev = dev.groupby("d", as_index=False)["cnt"].sum().sort_values("d")
        dvals = dev["d"].to_numpy(np.float64)
        dcnts = dev["cnt"].to_numpy(np.int64)
        mad = _quantile_cont_replay(dvals, dcnts.cumsum(), 0.5)
        n_out = int(dcnts[dvals > 3.0 * mad].sum())
        rows.append(
            {
                "event_type": etype,
                "n_events": int(cnts.sum()),
                "med_value": float(round_half_away(np.float64(med), 6)),
                "mad_value": float(round_half_away(np.float64(mad), 6)),
                "n_outliers": n_out,
            }
        )
    out = pd.DataFrame(
        rows,
        columns=["event_type", "n_events", "med_value", "mad_value", "n_outliers"],
    )
    for c in ("n_events", "n_outliers"):
        out[c] = out[c].astype("int64")
    for c in ("med_value", "mad_value"):
        out[c] = out[c].astype("float64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_max_drawdown(sf_dir: str):
    """Per-type maximum drawdown (running-max minus current value, cents
    grid) with its position — the RUNNING-MAX prefix scan, completing the
    associative-scan family q_cusum_changepoint opened with a sum carry:
    here the carry is a MAX, so pass 1's per-(type, chunk) partials fold
    into prior-chunk running maxima on the driver and pass 2 computes
    runmax = max(carry, local cummax) vectorized inside each chunk.
    Unlike CUSUM the statistic needs no constant-shift disambiguation:
    dd_j = runmax_j − cents_j is final, so each chunk emits exactly ONE
    candidate (np.argmax = first index on ties, matching the min-k rule)
    and the merge is (dd DESC, k ASC) — the oracle's QUALIFY.  All
    integers; no overflow (dd <= max−min cents)."""
    import ray

    ds = _read(
        sf_dir,
        "events",
        ["event_id", "ts", "event_type", "value"],
        rows_per_block=12_500,
    )
    chunk_us = np.int64(CUSUM_CHUNK_DAYS) * 86_400_000_000
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "n_events": pd.Series([], dtype="int64"),
            "dd_cents": pd.Series([], dtype="int64"),
            "dd_k": pd.Series([], dtype="int64"),
            "dd_event_id": pd.Series([], dtype="int64"),
        }
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].astype("int64").to_numpy()
        cents = round_half_away(df["value"].to_numpy() * 100.0, 0).astype(np.int64)
        d = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "chunk": ts_us // chunk_us,
                "cents": cents,
            }
        )
        out = d.groupby(["event_type", "chunk"], as_index=False).agg(
            cnt=("cents", "size"), mx=("cents", "max")
        )
        out["cnt"] = out["cnt"].astype("int64")
        out["mx"] = out["mx"].astype("int64")
        return out

    parts = typed_collect(
        ds.map_batches(partial, batch_format="pandas"),
        pa.schema(
            [
                ("event_type", pa.string()),
                ("chunk", pa.int64()),
                ("cnt", pa.int64()),
                ("mx", pa.int64()),
            ]
        ),
    )
    if len(parts) == 0:
        return empty
    parts = (
        parts.groupby(["event_type", "chunk"], as_index=False)
        .agg(cnt=("cnt", "sum"), mx=("mx", "max"))
        .sort_values(["event_type", "chunk"])
    )
    g = parts.groupby("event_type", sort=False)
    parts["k_before"] = g["cnt"].cumsum() - parts["cnt"]
    # carry = running max of PRIOR chunks; sentinel for the first chunk
    SENT = np.int64(-(1 << 62))
    shifted = g["mx"].cummax().shift(1)
    first = g.cumcount() == 0
    parts["carry"] = shifted.fillna(0).astype("int64").where(~first, SENT)
    n_by_type = dict(zip(g["cnt"].sum().index, g["cnt"].sum().astype(int)))
    offs = {
        (r.event_type, int(r.chunk)): (int(r.k_before), int(r.carry))
        for r in parts.itertuples()
    }
    bref = ray.put((offs, SENT))

    def bucketize(t: pa.Table) -> pa.Table:
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = pd.Series(t.column("event_type").to_pylist())
        chunk, bucket = _type_chunk_keys(types, ts_us, chunk_us)
        t = t.append_column("chunk", pa.array(chunk, pa.int64()))
        return t.append_column("bucket", pa.array(bucket))

    def resolve(gdf: pd.DataFrame) -> pd.DataFrame:
        offs_l, sent = ray.get(bref)
        gdf = gdf.sort_values(["event_type", "chunk", "ts", "event_id"])
        out = {"event_type": [], "k": [], "event_id": [], "dd": []}
        for (etype, chunk), sl in gdf.groupby(["event_type", "chunk"], sort=False):
            cents = round_half_away(sl["value"].to_numpy() * 100.0, 0).astype(
                np.int64
            )
            k_before, carry = offs_l[(etype, int(chunk))]
            runmax = np.maximum(np.maximum.accumulate(cents), carry)
            dd = runmax - cents
            i = int(np.argmax(dd))
            out["event_type"].append(etype)
            out["k"].append(int(k_before + i + 1))
            out["event_id"].append(int(sl["event_id"].to_numpy()[i]))
            out["dd"].append(int(dd[i]))
        o = pd.DataFrame(out)
        for c in ("k", "event_id", "dd"):
            o[c] = o[c].astype("int64")
        return o

    cands = typed_collect(
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas"),
        pa.schema(
            [
                ("event_type", pa.string()),
                ("k", pa.int64()),
                ("event_id", pa.int64()),
                ("dd", pa.int64()),
            ]
        ),
    )
    best = (
        cands.sort_values(["event_type", "dd", "k"], ascending=[True, False, True])
        .groupby("event_type", as_index=False)
        .first()
    )
    best["n_events"] = best["event_type"].map(n_by_type).astype("int64")
    out = best.rename(
        columns={"dd": "dd_cents", "k": "dd_k", "event_id": "dd_event_id"}
    )[["event_type", "n_events", "dd_cents", "dd_k", "dd_event_id"]]
    return out.sort_values("event_type").reset_index(drop=True)


# ----------------------------------------------------------------------
# Benford first-significant-digit audit — the forensic data-quality scan
# (Benford 1938; fraud/synthetic-data detection on money columns).
# Engine-added brief.

# floor(1e6*log10(1+1/d)+0.5) for d=1..9 — literal on BOTH sides so the
# transcendental never computes at runtime; the nine sum to exactly 1e6.
BENFORD_P_X1E6 = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757)


def q_benford_audit(sf_dir: str):
    """First-significant-digit distribution of l_extendedprice vs
    Benford's law — observed counts against expected counts on the
    literal micro-probability grid (`BENFORD_P_X1E6`), all integer-exact:
    expected_x1e6 = n·P_d and delta_x1e6 = observed·1e6 − n·P_d are BIGINT
    products, so the audit report never touches a float (int64 is safe to
    n ≈ 9×10¹² rows; past that scale the grid down a decade).

    The digit comes from pure integer divides on the exact cents
    (ROUND(value·100) half-away both sides, the money-grid convention) —
    a float log10 would misbin exact powers of ten by an ulp.  Non-
    positive cents are excluded on both sides (digit undefined).

    Scale shape: each block reduces to a 9-row (digit, observed) partial
    (bincount — the corpus never leaves the worker), `_two_regime_sum`
    merges them, and the driver joins the 9-row spine.  Zero wide
    exchanges; the only moving state is 9 integers per block."""
    import numpy as np

    from .frames import typed_collect

    def digit_partials(t: pa.Table) -> pa.Table:
        v = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        cents = round_half_away(v * 100.0, 0).astype(np.int64)
        cents = cents[cents > 0]
        d = cents
        for _ in range(18):  # int64 has at most 19 digits
            d = np.where(d >= 10, d // 10, d)
        counts = np.bincount(d, minlength=10)[1:10]
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                "observed": pa.array(counts.astype(np.int64)),
            }
        )

    parts = _read(
        sf_dir, "lineitem", ["l_extendedprice"], rows_per_block=100_000
    ).map_batches(digit_partials, batch_format="pyarrow")
    red, _ = _two_regime_sum(
        parts, ["digit"], ["observed"], empty_types={"digit": pa.int64()}
    )
    df = typed_collect(
        red, pa.schema([("digit", pa.int64()), ("observed", pa.int64())])
    )
    spine = pd.DataFrame({"digit": np.arange(1, 10, dtype=np.int64)})
    out = spine.merge(df, on="digit", how="left")
    out["observed"] = out["observed"].fillna(0).astype("int64")
    n = int(out["observed"].sum())
    p = np.array(BENFORD_P_X1E6, dtype=np.int64)
    out["expected_x1e6"] = (n * p).astype("int64")
    out["delta_x1e6"] = (
        out["observed"].to_numpy(np.int64) * 1_000_000 - n * p
    ).astype("int64")
    return out.sort_values("digit").reset_index(drop=True)


# ----------------------------------------------------------------------
# AMS tug-of-war F2 sketch — Alon, Matias & Szegedy 1996 (STOC).  The
# second-frequency-moment / self-join-size estimator every distributed
# planner wants before committing to a join strategy.  Engine-added brief.

AMS_J = 64  # independent tug-of-war estimators (8 groups of 8)
AMS_G = 8  # median-of-means groups


def q_ams_f2(sf_dir: str):
    """Self-join-size estimation for events⋈events on user_id: the exact
    F2 = Σ_u c_u² next to an AMS tug-of-war sketch estimate — the number a
    planner needs to pick hash-vs-broadcast (and to see key skew) BEFORE
    paying the exchange.

    Sketch: AMS_J=64 estimators; estimator j keeps the single integer
    S_j = Σ_u s_j(u)·c_u where s_j(u) = ±1 from bit j of
    md5_number_lower(user_id) (DuckDB-replayable; the 64 md5 bits stand
    in for the paper's 4-wise family).  E[S_j²] = F2 exactly.  The
    estimate is the classic median-of-means cleared of division: 8
    groups of 8, group sums GS_g = Σ S_j² (exact Python ints — S_j ~ n
    so S² overflows int64 at ~3e9 rows), est_f2_x16 = GS_(4) + GS_(5) of
    the sorted group sums (median of 8 means = (GS_(4)+GS_(5))/16), so
    NO float exists anywhere and the oracle replays the sketch verbatim
    (measured 2.9–11.9%% error across the sf corpora vs 24–72%% at
    J=16).

    Scale shape: the sketch is 16 integers per block — per-block partials
    collapse each block to 16 (j, s) rows whatever the row count, merged
    by `_two_regime_sum`; this is the entire sketch data plane.  The
    exact branch (the verification baseline, same role as
    q_user_days_exact next to the HLL) pays the one per-user exchange the
    sketch exists to avoid: per-block (user, c) partials, two-regime
    merged, then a streaming Σc² fold.  err_ppm = ⌊|est_x16 − 16·F2|·1e6
    / (16·F2)⌋ is an integer both sides (// truncation == floor on the
    non-negative operands).  Hash cost is per DISTINCT user per block,
    not per row (blocks pre-reduce to (user, c) before hashing)."""
    ds = _read(sf_dir, "events", ["user_id"], rows_per_block=12_500)

    def sketch_partial(t: pa.Table) -> pa.Table:
        # pa group_by output column order varies by Arrow version — pin
        # the aggregate by NAME (user_id_count), never by position
        g = t.group_by("user_id").aggregate([("user_id", "count")])
        users = g.column("user_id").to_pylist()
        cnt = g.column("user_id_count").to_numpy().astype(np.int64)
        if len(users) == 0:
            return pa.table(
                {
                    "j": pa.array(np.arange(AMS_J, dtype=np.int64)),
                    "s": pa.array(np.zeros(AMS_J, np.int64)),
                    "cnt": pa.array(np.zeros(AMS_J, np.int64)),
                }
            )
        hv = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(str(u).encode()).digest()[8:], "little"
                )
                for u in users
            ),
            np.uint64,
            len(users),
        )
        signs = (
            ((hv[:, None] >> np.arange(AMS_J, dtype=np.uint64)[None, :]) & 1)
            .astype(np.int64)
            * 2
            - 1
        )
        s = (signs * cnt[:, None]).sum(axis=0)
        n = int(cnt.sum())
        return pa.table(
            {
                "j": pa.array(np.arange(AMS_J, dtype=np.int64)),
                "s": pa.array(s, pa.int64()),
                "cnt": pa.array(np.full(AMS_J, n, np.int64)),
            }
        )

    red, _ = _two_regime_sum(
        ds.map_batches(sketch_partial, batch_format="pyarrow"),
        ["j"],
        ["s", "cnt"],
        empty_types={"j": pa.int64()},
    )
    sk = typed_collect(
        red,
        pa.schema([("j", pa.int64()), ("s", pa.int64()), ("cnt", pa.int64())]),
    )
    s_by_j = {int(r.j): int(r.s) for r in sk.itertuples()}
    n_events = int(sk["cnt"].max()) if len(sk) else 0
    x = [s_by_j.get(j, 0) ** 2 for j in range(AMS_J)]  # exact Python ints
    gsz = AMS_J // AMS_G
    gs = sorted(sum(x[g * gsz : (g + 1) * gsz]) for g in range(AMS_G))
    est_x16 = gs[AMS_G // 2 - 1] + gs[AMS_G // 2]

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([("user_id", "count")])
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "c": g.column("user_id_count").cast(pa.int64()),
            }
        )

    per_user, _ = _two_regime_sum(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        ["user_id"],
        ["c"],
        empty_types={"user_id": pa.int64()},
    )

    def sq_fold(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy().astype(object)  # Python ints: no overflow
        return pa.table({"f2": pa.array([int((c * c).sum()) if len(c) else 0])})

    exact_f2 = sum(
        typed_collect(
            per_user.map_batches(sq_fold, batch_format="pyarrow"),
            pa.schema([("f2", pa.int64())]),
        )["f2"]
        .astype("int64")
        .tolist()
    )
    err_ppm = (
        0
        if exact_f2 == 0
        else abs(est_x16 - 16 * exact_f2) * 1_000_000 // (16 * exact_f2)
    )
    return pd.DataFrame(
        {
            "n_events": pd.Series([n_events], dtype="int64"),
            "exact_f2": pd.Series([exact_f2], dtype="int64"),
            "est_f2_x16": pd.Series([est_x16], dtype="int64"),
            "err_ppm": pd.Series([err_ppm], dtype="int64"),
        }
    )


# ----------------------------------------------------------------------
# Table profiler — the ANALYZE / column-statistics pass every engine
# runs before planning a big job.  Engine-added brief.

PROFILE_COLS = [
    ("l_orderkey", "int"),
    ("l_partkey", "int"),
    ("l_suppkey", "int"),
    ("l_linenumber", "int"),
    ("l_quantity", "double"),
    ("l_extendedprice", "double"),
    ("l_discount", "double"),
    ("l_tax", "double"),
    ("l_returnflag", "string"),
    ("l_linestatus", "string"),
    ("l_shipdate", "timestamp"),
]


def _profile_canon(arr: pa.ChunkedArray, kind: str) -> list:
    """Distinct non-null values of one block column as CANONICAL strings.

    The encoding only needs to be INJECTIVE (distinct-on-string ==
    distinct-on-value); it never has to match any DuckDB repr because the
    oracle counts DISTINCT on the raw values.  Doubles normalize -0.0 to
    0.0 first (SQL DISTINCT compares them equal; repr() does not) and NaN
    canonicalizes to the single string 'nan'."""
    vals = pc.unique(pc.drop_null(arr))
    if kind == "int":
        return [str(v) for v in vals.to_pylist()]
    if kind == "double":
        out = set()
        for v in vals.to_pylist():
            out.add("nan" if v != v else repr(0.0 if v == 0 else v))
        return sorted(out)
    if kind == "timestamp":
        return [str(v) for v in vals.cast(pa.int64()).to_pylist()]
    return vals.to_pylist()


def q_column_profile(sf_dir: str):
    """Per-column statistics of the lineitem table in one streaming pass:
    row/null counts, min/max, and the EXACT distinct cardinality — the
    ANALYZE primitive a planner consults before choosing join order,
    broadcast thresholds, and partition counts (q_ams_f2 and
    q_hll_user_days are the sketch versions of the same decision).

    Scale shape: counts and min/max reduce per block to ONE row per
    column (blocks × 11 partial rows reach the driver — no exchange at
    all for those); exact distinct is the only exchange, and it is
    two-level: each block first dedups each column locally and ships
    (col, canonical-value) pairs — the per-block distinct sets, not the
    rows — then the two-regime plan dedups globally (driver
    drop_duplicates below PIVOT_DRIVER_MAX_ROWS pair rows, a distributed
    (col, v) groupby above; high-cardinality columns are where the
    exchange cost lives, which is exactly what the HLL/KMV sketches are
    for when approximate suffices).  Numeric min/max are reported as
    DOUBLE on both sides (the oracle CASTs — identical rounding above
    2^53); timestamps ride as epoch-microseconds; string order is
    Arrow memcmp == DuckDB binary collation == code-point order on
    UTF-8.  NaN replays DuckDB's total order (NaN sorts GREATER than
    everything: any NaN makes max NaN; min is NaN only when every
    non-null value is — Arrow's min_max IGNORES NaN, so the partials
    carry an n_nan count and the driver fold reapplies the rule).  An
    EMPTY table still reports one row per column (aggregates without
    GROUP BY), with NULL min/max and zero counts."""
    ds = _read(
        sf_dir,
        "lineitem",
        [c for c, _ in PROFILE_COLS],
        rows_per_block=100_000,
    )

    def stats_partial(t: pa.Table) -> pa.Table:
        rows = {
            "col": [],
            "n_rows": [],
            "n_null": [],
            "n_nan": [],
            "min_num": [],
            "max_num": [],
            "min_str": [],
            "max_str": [],
        }
        for c, kind in PROFILE_COLS:
            arr = t.column(c)
            rows["col"].append(c)
            rows["n_rows"].append(len(arr))
            rows["n_null"].append(arr.null_count)
            n_nan = (
                pc.sum(pc.is_nan(pc.drop_null(arr))).as_py() or 0
                if kind == "double" and len(arr) > arr.null_count
                else 0
            )
            rows["n_nan"].append(int(n_nan))
            mn = mx = None
            if len(arr) > arr.null_count:
                if kind == "timestamp":
                    mm = pc.min_max(arr.cast(pa.int64()))
                else:
                    mm = pc.min_max(arr)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
            if kind == "string":
                rows["min_num"].append(None)
                rows["max_num"].append(None)
                rows["min_str"].append(mn)
                rows["max_str"].append(mx)
            else:
                rows["min_num"].append(None if mn is None else float(mn))
                rows["max_num"].append(None if mx is None else float(mx))
                rows["min_str"].append(None)
                rows["max_str"].append(None)
        return pa.table(
            {
                "col": pa.array(rows["col"], pa.string()),
                "n_rows": pa.array(rows["n_rows"], pa.int64()),
                "n_null": pa.array(rows["n_null"], pa.int64()),
                "n_nan": pa.array(rows["n_nan"], pa.int64()),
                "min_num": pa.array(rows["min_num"], pa.float64()),
                "max_num": pa.array(rows["max_num"], pa.float64()),
                "min_str": pa.array(rows["min_str"], pa.string()),
                "max_str": pa.array(rows["max_str"], pa.string()),
            }
        )

    stats = typed_collect(
        ds.map_batches(stats_partial, batch_format="pyarrow"),
        pa.schema(
            [
                ("col", pa.string()),
                ("n_rows", pa.int64()),
                ("n_null", pa.int64()),
                ("n_nan", pa.int64()),
                ("min_num", pa.float64()),
                ("max_num", pa.float64()),
                ("min_str", pa.string()),
                ("max_str", pa.string()),
            ]
        ),
    )

    def distinct_partial(t: pa.Table) -> pa.Table:
        cols, vals = [], []
        for c, kind in PROFILE_COLS:
            vs = _profile_canon(t.column(c), kind)
            cols.extend([c] * len(vs))
            vals.extend(vs)
        return pa.table(
            {"col": pa.array(cols, pa.string()), "v": pa.array(vals, pa.string())}
        )

    pairs = ds.map_batches(distinct_partial, batch_format="pyarrow").materialize()
    if pairs.count() <= PIVOT_DRIVER_MAX_ROWS:
        pdf = pairs.to_pandas()
        if len(pdf.columns) == 0 or len(pdf) == 0:
            nd = pd.DataFrame(
                {
                    "col": pd.Series([], dtype=object),
                    "n_distinct": pd.Series([], dtype="int64"),
                }
            )
        else:
            nd = (
                pdf.drop_duplicates()
                .groupby("col", as_index=False)
                .size()
                .rename(columns={"size": "n_distinct"})
            )
    else:
        from ray.data.aggregate import Count

        dedup = pairs.groupby(["col", "v"]).aggregate(Count(alias_name="_n"))

        def cnt(t: pa.Table) -> pa.Table:
            g = t.select(["col"]).group_by("col").aggregate([([], "count_all")])
            return g.rename_columns(["col", "n_distinct"])

        nd = (
            typed_collect(
                dedup.map_batches(cnt, batch_format="pyarrow"),
                pa.schema([("col", pa.string()), ("n_distinct", pa.int64())]),
            )
            .groupby("col", as_index=False)["n_distinct"]
            .sum()
        )

    kind_of = dict(PROFILE_COLS)
    if len(stats):
        agg = stats.groupby("col", as_index=False).agg(
            n_rows=("n_rows", "sum"),
            n_null=("n_null", "sum"),
            n_nan=("n_nan", "sum"),
            min_num=("min_num", "min"),
            max_num=("max_num", "max"),
            min_str=("min_str", "min"),
            max_str=("max_str", "max"),
        )
        # DuckDB's NaN-greatest total order: any NaN wins the max; min is
        # NaN only when NaN is the ONLY non-null value
        has_nan = agg["n_nan"] > 0
        agg.loc[has_nan, "max_num"] = np.nan
        only_nan = has_nan & (
            agg["n_rows"] - agg["n_null"] - agg["n_nan"] == 0
        )
        agg.loc[only_nan, "min_num"] = np.nan
    else:
        agg = pd.DataFrame(
            columns=[
                "col",
                "n_rows",
                "n_null",
                "n_nan",
                "min_num",
                "max_num",
                "min_str",
                "max_str",
            ]
        )
    spine = pd.DataFrame({"col": [c for c, _ in PROFILE_COLS]})
    out = spine.merge(agg, on="col", how="left").merge(nd, on="col", how="left")
    out["kind"] = out["col"].map(kind_of)
    for c in ("n_rows", "n_null", "n_distinct"):
        out[c] = out[c].fillna(0).astype("int64")
    out["min_num"] = out["min_num"].astype("float64")
    out["max_num"] = out["max_num"].astype("float64")
    out["min_str"] = out["min_str"].astype(object).where(out["min_str"].notna(), None)
    out["max_str"] = out["max_str"].astype(object).where(out["max_str"].notna(), None)
    out = out[
        [
            "col",
            "kind",
            "n_rows",
            "n_null",
            "n_distinct",
            "min_num",
            "max_num",
            "min_str",
            "max_str",
        ]
    ]
    return out.sort_values("col").reset_index(drop=True)


# ----------------------------------------------------------------------
# Ordered string aggregation — the user-journey / clickstream-path report
# (string_agg ORDER BY at corpus scale).  Engine-added brief.

PATH_K = 16  # journey prefix length: bounds output row width at any scale


def q_user_event_paths(sf_dir: str):
    """Per-user event journey: the first PATH_K event types in
    (ts, event_id) order joined with '>', plus the exact total event
    count — the ORDER-SENSITIVE string aggregate (SQL's
    string_agg(... ORDER BY)) the funnel/Markov family reads paths from.

    Mergeability: like q_ohlc_daily, associativity is restored by
    CARRYING THE ORDERING KEY — each block reduces every user to its
    block-local first-PATH_K events WITH their (ts, event_id) keys (≤
    PATH_K rows per user per block, text never wider than the type
    enum), because first-K-of-a-union is computable from first-K-of-each
    -part; the exact total rides the same rows (block count on the
    user's first partial row).  The merge is two-regime: one driver
    pandas pass below PIVOT_DRIVER_MAX_ROWS partial rows, a per-user
    map_groups exchange above.  PATH_K bounds the report row width —
    the full-path variant would make output rows O(events-per-user)
    wide, which no report consumer wants and no driver hash needs.
    Ties are impossible under the composite (ts, event_id) key
    (event_id unique), so the path is deterministic on both sides."""
    ds = _read(
        sf_dir,
        "events",
        ["user_id", "ts", "event_id", "event_type"],
        rows_per_block=12_500,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "ts_us": pd.Series([], dtype="int64"),
                    "event_id": pd.Series([], dtype="int64"),
                    "event_type": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)
        counts = g.size()
        head = g.head(PATH_K).copy()
        head["ts_us"] = head["ts"].astype("int64")
        first = ~head["user_id"].duplicated()
        head["n"] = 0
        head.loc[first, "n"] = (
            head.loc[first, "user_id"].map(counts).astype("int64")
        )
        out = head[["user_id", "ts_us", "event_id", "event_type", "n"]].copy()
        out["n"] = out["n"].astype("int64")
        return out.reset_index(drop=True)

    def merge_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        return pd.DataFrame(
            {
                "user_id": pd.Series([int(g["user_id"].iloc[0])], dtype="int64"),
                "n_events": pd.Series([int(g["n"].sum())], dtype="int64"),
                "path": pd.Series(
                    [">".join(g["event_type"].head(PATH_K))], dtype=object
                ),
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").materialize()
    empty = pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "path": pd.Series([], dtype=object),
        }
    )
    if parts.count() == 0:
        return empty
    if parts.count() <= PIVOT_DRIVER_MAX_ROWS:
        pdf = parts.to_pandas()
        if len(pdf.columns) == 0 or len(pdf) == 0:
            return empty
        out = (
            pdf.groupby("user_id", sort=True, group_keys=False)
            .apply(merge_user)
            .reset_index(drop=True)
        )
    else:
        out = typed_collect(
            parts.groupby("user_id").map_groups(merge_user, batch_format="pandas"),
            pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("n_events", pa.int64()),
                    ("path", pa.string()),
                ]
            ),
        )
    return out.sort_values("user_id").reset_index(drop=True)


# ----------------------------------------------------------------------
# Z-order layout + zone maps — the lakehouse Z-ORDER / file-skipping
# feature (Delta OPTIMIZE ZORDER, Iceberg sort orders).  Engine-added.

ZORDER_BITS = 16  # bits quantized per dimension
ZORDER_SHIFT = 22  # bucket = zkey >> SHIFT: the layout's file-size knob
# the demo box query the zone maps are graded against (day, cents)
ZORDER_BOX = (19730, 19739, 1000, 9999)


def _zorder_key(d1: np.ndarray, d2: np.ndarray) -> np.ndarray:
    """Bit-interleave two 16-bit dimensions (d1 even positions, d2 odd).
    Plain shift/mask arithmetic — identical in numpy int64 and DuckDB
    BIGINT (both two's-complement & and arithmetic >>), so the oracle
    replays the key with the same 32-term expression."""
    z = np.zeros(len(d1), np.int64)
    for i in range(ZORDER_BITS):
        z |= ((d1 >> i) & 1) << (2 * i)
        z |= ((d2 >> i) & 1) << (2 * i + 1)
    return z


def q_zorder_zonemap(sf_dir: str):
    """Z-order layout report over events: every row maps to a Z-curve
    bucket (bit-interleaved (day, cents) key >> ZORDER_SHIFT), and each
    bucket reports its zone map (n_rows, min/max of both dimensions) plus
    whether the demo box query would have to READ it — the
    multi-dimensional file-skipping layout a 100 TB table wants when
    queries filter on two columns at once (a single-key sort prunes one
    dimension and scans the other).

    Scale shape: ZERO exchanges — the Z-key and bucket are pure per-row
    arithmetic, each block reduces to per-bucket (count, min, max)
    partial rows, and the bucket space is BOUNDED by construction
    (zkey is 2·ZORDER_BITS bits, so ≤ 2^(32-SHIFT) = 1024 buckets
    whatever the corpus), making the partial table driver-sized always;
    the driver folds it.  In production the buckets are the write
    partition keys (write_parquet(partition_cols=['zbucket'])) and
    SHIFT tunes file size; `touched` is the zone-map overlap test a
    reader runs against its predicate before opening a file.
    Quantization: day = epoch-days & 0xFFFF, cents = half-away
    ROUND(value·100) & 0xFFFF — two's-complement masks, identical in
    numpy and DuckDB on negative values too (hostile pre-epoch days)."""
    DAY_US = 86_400_000_000
    lo_d, hi_d, lo_c, hi_c = ZORDER_BOX

    ds = _read(sf_dir, "events", ["ts", "value"], rows_per_block=100_000)

    def partial(t: pa.Table) -> pa.Table:
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = np.floor_divide(ts_us, DAY_US)
        cents = np.rint(
            round_half_away(t.column("value").to_numpy(zero_copy_only=False), 2)
            * 100.0
        ).astype(np.int64)
        z = _zorder_key(day & 0xFFFF, cents & 0xFFFF)
        bucket = z >> ZORDER_SHIFT
        tt = pa.table(
            {
                "zbucket": pa.array(bucket, pa.int64()),
                "day": pa.array(day, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )
        g = tt.group_by("zbucket").aggregate(
            [("day", "count"), ("day", "min"), ("day", "max"),
             ("cents", "min"), ("cents", "max")]
        )
        return g.rename_columns(
            ["zbucket", "n_rows", "min_day", "max_day", "min_cents", "max_cents"]
        )

    parts = typed_collect(
        ds.map_batches(partial, batch_format="pyarrow"),
        pa.schema(
            [
                ("zbucket", pa.int64()),
                ("n_rows", pa.int64()),
                ("min_day", pa.int64()),
                ("max_day", pa.int64()),
                ("min_cents", pa.int64()),
                ("max_cents", pa.int64()),
            ]
        ),
    )
    if len(parts) == 0:
        out = pd.DataFrame(
            {
                "zbucket": pd.Series([], dtype="int64"),
                "n_rows": pd.Series([], dtype="int64"),
                "min_day": pd.Series([], dtype="int64"),
                "max_day": pd.Series([], dtype="int64"),
                "min_cents": pd.Series([], dtype="int64"),
                "max_cents": pd.Series([], dtype="int64"),
                "touched": pd.Series([], dtype="int64"),
            }
        )
        return out
    agg = parts.groupby("zbucket", as_index=False).agg(
        n_rows=("n_rows", "sum"),
        min_day=("min_day", "min"),
        max_day=("max_day", "max"),
        min_cents=("min_cents", "min"),
        max_cents=("max_cents", "max"),
    )
    touched = ~(
        (agg["max_day"] < lo_d)
        | (agg["min_day"] > hi_d)
        | (agg["max_cents"] < lo_c)
        | (agg["min_cents"] > hi_c)
    )
    agg["touched"] = touched.astype("int64")
    for c in agg.columns:
        if c != "touched":
            agg[c] = agg[c].astype("int64")
    return agg.sort_values("zbucket").reset_index(drop=True)


# ----------------------------------------------------------------------
# MERGE INTO (CDC upsert/delete apply) — the lakehouse mutation operator
# (Delta/Iceberg MERGE): base table + change feed → next table version.
# Engine-added brief.


def q_cdc_upsert(sf_dir: str):
    """MERGE the events change-feed into the customer base table: per
    user the delta is (Σ purchase cents, any-error flag); WHEN MATCHED
    AND the user errored → DELETE the customer; WHEN MATCHED → UPDATE
    acctbal += purchase cents ('updated' if anything changed, else
    'kept'); WHEN NOT MATCHED AND clean → INSERT ('inserted').  Output
    is the next table version (custkey, acctbal_cents, status), deleted
    rows absent — the MERGE INTO semantics every incremental ingest run
    applies (q_incremental_rollup is the additive-only little sibling;
    this one has all three WHEN branches).

    Scale shape: the change feed combiner-reduces per block to
    (custkey, p_cents, n_err) partials (`_two_regime_sum` — the only
    event-side reduction), the base streams as narrow (custkey, cents)
    rows, and ONE full_outer exchange aligns them (both sides compacted
    to the same shuffle_partitions count — the empty-first-block join
    lesson).  Side-presence flags ride as explicit in_c/in_d constants:
    inferring absence from a value column would misread a legitimate
    NULL.  An empty side skips the join outright (the measured
    all-empty-side schema loss; `_join_pad`'s sentinel is wrong for
    OUTER joins — its unmatched row would surface in the output).  All
    mutation arithmetic is integer cents; only the status CASE decides
    anything."""
    import pyarrow.parquet as pq_meta

    from .sizing import shuffle_partitions

    ds = _read(
        sf_dir, "events", ["user_id", "event_type", "value"], rows_per_block=12_500
    )

    def delta_partial(t: pa.Table) -> pa.Table:
        cents = np.rint(
            round_half_away(t.column("value").to_numpy(zero_copy_only=False), 2)
            * 100.0
        ).astype(np.int64)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        tt = pa.table(
            {
                "custkey": t.column("user_id"),
                "p_cents": pa.array(np.where(et == "purchase", cents, 0)),
                "n_err": pa.array((et == "error").astype(np.int64)),
            }
        )
        g = tt.group_by("custkey").aggregate([("p_cents", "sum"), ("n_err", "sum")])
        return g.rename_columns(["custkey", "p_cents", "n_err"])

    delta, n_d = _two_regime_sum(
        ds.map_batches(delta_partial, batch_format="pyarrow"),
        ["custkey"],
        ["p_cents", "n_err"],
        empty_types={"custkey": pa.int64()},
    )

    def base_rows(t: pa.Table) -> pa.Table:
        cents = np.rint(
            round_half_away(
                t.column("c_acctbal").to_numpy(zero_copy_only=False), 2
            )
            * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "custkey": t.column("c_custkey").cast(pa.int64()),
                "cents": pa.array(cents),
                "in_c": pa.array(np.ones(len(t), np.int64)),
            }
        )

    n_c = pq_meta.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    base = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        base_rows, batch_format="pyarrow"
    )

    empty = pd.DataFrame(
        {
            "custkey": pd.Series([], dtype="int64"),
            "acctbal_cents": pd.Series([], dtype="int64"),
            "status": pd.Series([], dtype=object),
        }
    )

    def finish_frame(df: pd.DataFrame) -> pd.DataFrame:
        for c in ("in_c", "in_d", "cents", "p_cents", "n_err"):
            df[c] = df[c].fillna(0).astype("int64")
        df = df[df["n_err"] == 0].copy()
        df["acctbal_cents"] = (df["cents"] + df["p_cents"]).astype("int64")
        df["status"] = np.where(
            df["in_c"] == 0,
            "inserted",
            np.where(df["p_cents"] > 0, "updated", "kept"),
        )
        df["custkey"] = df["custkey"].astype("int64")
        out = df[["custkey", "acctbal_cents", "status"]]
        return out.sort_values("custkey").reset_index(drop=True)

    if n_c == 0 and n_d == 0:
        return empty
    if n_d == 0:  # no change feed: every base row survives as 'kept'
        df = typed_collect(
            base,
            pa.schema(
                [("custkey", pa.int64()), ("cents", pa.int64()), ("in_c", pa.int64())]
            ),
        )
        df["in_d"] = 0
        df["p_cents"] = 0
        df["n_err"] = 0
        return finish_frame(df)

    def delta_rows(t: pa.Table) -> pa.Table:
        return t.append_column("in_d", pa.array(np.ones(len(t), np.int64)))

    delta = delta.map_batches(delta_rows, batch_format="pyarrow")
    if n_c == 0:  # no base: clean delta users insert
        df = typed_collect(
            delta,
            pa.schema(
                [
                    ("custkey", pa.int64()),
                    ("p_cents", pa.int64()),
                    ("n_err", pa.int64()),
                    ("in_d", pa.int64()),
                ]
            ),
        )
        df["in_c"] = 0
        df["cents"] = 0
        return finish_frame(df)

    n_parts = shuffle_partitions(max(n_c, n_d, 1))
    joined = base.repartition(n_parts).join(
        delta.repartition(n_parts),
        join_type="full_outer",
        num_partitions=n_parts,
        on=("custkey",),
    )
    df = joined.to_pandas()
    if len(df.columns) == 0:
        return empty
    return finish_frame(df)


# ----------------------------------------------------------------------
# Schema evolution — union-by-name read across ingest generations (the
# add-a-column migration every long-lived table survives).  Engine-added.


def q_schema_evolution(sf_dir: str, stage_dir: str = None):
    """Schema-evolution round trip: events is re-written as two ingest
    GENERATIONS — gen-0 (even event_id) with the base columns only,
    gen-1 (odd) with an ADDED ``tier`` column (cents >= 1000 → 'hi',
    else 'lo') — then read back through
    `sources.readers.read_parquet_evolved`, which discovers the union
    schema from footers and normalizes every block to it (gen-0 rows
    carry tier = NULL).  A match against the oracle (which recomputes
    tier from the ORIGINAL table under the same generation rule)
    certifies the union-by-name semantics row by row: nothing dropped,
    nothing misaligned, NULL fill exactly where the old generation is.

    Scale shape: both generation writes are distributed
    (`stage_checkpoint` — durable, crash-resumable via ``stage_dir``),
    the evolved read is one task per file with a per-block
    normalization map, and the projection is zero-copy column picks.
    The result is row-per-event by contract (the round-trip identity
    class, like q_csv_roundtrip)."""
    import shutil
    import tempfile

    from ..sources.readers import read_parquet_evolved
    from .staging import stage_checkpoint

    empty = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "cents": pd.Series([], dtype="int64"),
            "tier": pd.Series([], dtype=object),
        }
    )
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def gen(parity: int):
        def write_gen(t: pa.Table) -> pa.Table:
            eid = t.column("event_id").to_numpy(zero_copy_only=False)
            t = t.filter(pa.array((eid % 2) == parity))
            cents = np.rint(
                round_half_away(
                    t.column("value").to_numpy(zero_copy_only=False), 2
                )
                * 100.0
            ).astype(np.int64)
            cols = {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "cents": pa.array(cents),
            }
            if parity == 1:  # the evolved generation adds a column
                cols["tier"] = pa.array(
                    np.where(cents >= 1000, "hi", "lo"), pa.string()
                )
            return pa.table(cols)

        return write_gen

    own_stage = stage_dir is None
    root = tempfile.mkdtemp(prefix="pdfray_evolve_") if own_stage else stage_dir
    try:
        dirs = []
        for parity in (0, 1):
            got = stage_checkpoint(
                lambda parity=parity: ds.map_batches(
                    gen(parity), batch_format="pyarrow"
                ),
                os.path.join(root, f"gen{parity}"),
                resume=not own_stage,
                allow_empty=True,
            )
            if got is not None:
                dirs.append(os.path.join(root, f"gen{parity}"))
        if not dirs:
            return empty
        out = (
            read_parquet_evolved(dirs)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        for c in ("event_id", "user_id", "cents"):
            out[c] = out[c].astype("int64")
        if "tier" not in out.columns:  # only gen-0 rows existed
            out["tier"] = None
        out["tier"] = out["tier"].astype(object).where(out["tier"].notna(), None)
        return out[["event_id", "user_id", "cents", "tier"]]
    finally:
        if own_stage:
            shutil.rmtree(root, ignore_errors=True)


def q_ipc_roundtrip(sf_dir: str):
    """LOSSLESS Arrow IPC round trip: events streams through the
    distributed IPC sink (`sources.readers.write_ipc_table` — one
    content-addressed ``.arrow`` file per block, idempotent
    tmp+os.replace writes) and back through the one-task-per-file IPC
    source; the per-event projection must match the original parquet
    bit-for-bit — IPC is the zero-copy interchange leg of the format
    matrix (parquet / CSV / JSONL / WARC / WebDataset tar / IPC), and
    unlike CSV it carries doubles and timestamps natively, so the
    identity needs no conversion pinning at all."""
    import shutil
    import tempfile

    from ..sources.readers import read_ipc_table, write_ipc_table

    empty = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "ts_us": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype=object),
            "value": pd.Series([], dtype="float64"),
            "props": pd.Series([], dtype=object),
        }
    )
    out_dir = tempfile.mkdtemp(prefix="pdfray_ipc_")
    try:
        write_ipc_table(_read(sf_dir, "events"), out_dir)
        if not any(n.endswith(".arrow") for n in os.listdir(out_dir)):
            return empty  # empty corpus wrote no files

        def digest(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "event_id": t.column("event_id"),
                    "ts_us": t.column("ts").cast(pa.int64()),
                    "user_id": t.column("user_id"),
                    "event_type": t.column("event_type"),
                    "value": t.column("value"),
                    "props": t.column("props"),
                }
            )

        return (
            read_ipc_table(out_dir)
            .map_batches(digest, batch_format="pyarrow")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def q_time_travel(sf_dir: str, store_dir: str = None):
    """Snapshot-isolation TIME TRAVEL over the versioned snapshot store
    (`pipelines.snapshots` — the Iceberg/Delta commit shape): snapshot 0
    is the customer base (custkey, cents), snapshots 1 and 2 are two
    additive purchase-delta commits carved deterministically from events
    (floor-mod event_id parity: even → delta 1, odd → delta 2), and the
    query reads AS OF snapshot 1 — the base plus delta 1 with delta 2
    COMMITTED IN THE SAME STORE yet invisible, because readers resolve
    files from the manifest, never from directory listings.  Crash
    durability is the commit protocol itself: a torn snapshot write
    never reaches the manifest, an orphan file never existed
    (isolation/orphan/poison tests in test_corpus_shaping).

    Scale shape: each delta combiner-reduces per block then
    `_two_regime_sum`s to per-user rows BEFORE its snapshot write (a
    snapshot carries distinct keys, not raw events); zero-delta users
    are dropped on both sides (HAVING <> 0); the as-of read unions the
    manifest files and ONE exchange folds (custkey, cents).  All
    arithmetic on the integer cents grid (the q_cdc_upsert pair:
    round_half_away ×100 engine-side, ROUND(v*100, 0) in SQL)."""
    import shutil
    import tempfile

    from .snapshots import commit_snapshot, read_as_of

    out_schema = pa.schema([("custkey", pa.int64()), ("acctbal_cents", pa.int64())])
    owns_store = store_dir is None
    store = store_dir or tempfile.mkdtemp(prefix="pdfray_tt_")
    try:

        def base_factory():
            def base_rows(t: pa.Table) -> pa.Table:
                cents = np.rint(
                    round_half_away(
                        t.column("c_acctbal").to_numpy(zero_copy_only=False), 2
                    )
                    * 100.0
                ).astype(np.int64)
                return pa.table(
                    {
                        "custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                        "cents": pa.array(cents),
                    }
                )

            return _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
                base_rows, batch_format="pyarrow"
            )

        def delta_factory(parity: int):
            def make():
                ds = _read(
                    sf_dir,
                    "events",
                    ["event_id", "user_id", "event_type", "value"],
                    rows_per_block=12_500,
                )

                def partial(t: pa.Table) -> pa.Table:
                    eid = t.column("event_id").to_numpy(zero_copy_only=False)
                    # floor mod (numpy), == ((event_id % 2) + 2) % 2 in SQL
                    t = t.filter(pa.array(np.mod(eid, 2) == parity))
                    cents = np.rint(
                        round_half_away(
                            t.column("value").to_numpy(zero_copy_only=False), 2
                        )
                        * 100.0
                    ).astype(np.int64)
                    et = t.column("event_type").to_numpy(zero_copy_only=False)
                    tt = pa.table(
                        {
                            "custkey": t.column("user_id"),
                            "cents": pa.array(np.where(et == "purchase", cents, 0)),
                        }
                    )
                    g = tt.group_by("custkey").aggregate([("cents", "sum")])
                    return g.rename_columns(["custkey", "cents"])

                red, _ = _two_regime_sum(
                    ds.map_batches(partial, batch_format="pyarrow"),
                    ["custkey"],
                    ["cents"],
                    empty_types={"custkey": pa.int64()},
                )

                def drop_zero(t: pa.Table) -> pa.Table:
                    return t.filter(pc.not_equal(t.column("cents"), 0))

                return red.map_batches(drop_zero, batch_format="pyarrow")

            return make

        commit_snapshot(store, 0, base_factory)
        commit_snapshot(store, 1, delta_factory(0))
        commit_snapshot(store, 2, delta_factory(1))

        ds = read_as_of(store, 1)
        if ds is None:  # empty base AND empty delta: nothing committed files
            return out_schema.empty_table().to_pandas()

        def fold(t: pa.Table) -> pa.Table:
            g = t.group_by("custkey").aggregate([("cents", "sum")])
            return g.rename_columns(["custkey", "cents"])

        red, _ = _two_regime_sum(
            ds.map_batches(fold, batch_format="pyarrow"),
            ["custkey"],
            ["cents"],
            empty_types={"custkey": pa.int64()},
        )
        df = typed_collect(
            red, pa.schema([("custkey", pa.int64()), ("cents", pa.int64())])
        )
        df = df.rename(columns={"cents": "acctbal_cents"}).astype(
            {"custkey": "int64", "acctbal_cents": "int64"}
        )
        return df.sort_values("custkey").reset_index(drop=True)
    finally:
        if owns_store:
            shutil.rmtree(store, ignore_errors=True)


K_ANON = 5  # minimum safe quasi-identifier group size (literal in the oracle)


def q_k_anonymity(sf_dir: str):
    """k-anonymity audit over the customer quasi-identifier triple
    (nation, market segment, $100 balance bucket): a row whose QI group
    has fewer than K_ANON members is re-identifiable by linking those
    three public-ish attributes — the governance gate every dataset
    release runs next to q_fk_audit / q_column_profile.  Reports total
    rows, QI group count, violating-group count, rows at risk, and the
    smallest group size.

    Exactness: the bucket is floor(acctbal / 100.0) on the RAW double —
    the identical IEEE divide-then-floor on both sides (never an integer
    `//`, whose truncation diverges from floor on negatives — the
    q_events_json lesson; negative balances are real).  Scale shape: a
    per-block combiner reduces to distinct-QI partial counts,
    `_two_regime_sum` merges over the QI key-space, and a second
    combiner collapses each block of the sizes table to ONE 5-int
    summary row — the driver folds O(blocks) ints; no QI row list ever
    collects."""
    import numpy as np

    ds = _read(
        sf_dir,
        "customer",
        ["c_nationkey", "c_mktsegment", "c_acctbal"],
        rows_per_block=100_000,
    )

    def qi_partial(t: pa.Table) -> pa.Table:
        bal = t.column("c_acctbal").to_numpy(zero_copy_only=False)
        bucket = np.floor(bal / 100.0).astype(np.int64)
        tt = pa.table(
            {
                "nat": pc.cast(t.column("c_nationkey"), pa.int64()),
                "seg": t.column("c_mktsegment"),
                "bucket": pa.array(bucket),
                "sz": pa.array(np.ones(len(t), np.int64)),
            }
        )
        g = tt.group_by(["nat", "seg", "bucket"]).aggregate([("sz", "sum")])
        return g.rename_columns(["nat", "seg", "bucket", "sz"])

    reduced, _ = _two_regime_sum(
        ds.map_batches(qi_partial, batch_format="pyarrow"),
        ["nat", "seg", "bucket"],
        ["sz"],
    )

    def summary_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    c: pa.array([], pa.int64())
                    for c in (
                        "n_rows",
                        "n_groups",
                        "n_violating_groups",
                        "n_rows_at_risk",
                        "min_group_size",
                    )
                }
            )
        sz = t.column("sz").to_numpy(zero_copy_only=False)
        viol = sz < K_ANON
        return pa.table(
            {
                "n_rows": pa.array([int(sz.sum())], pa.int64()),
                "n_groups": pa.array([len(sz)], pa.int64()),
                "n_violating_groups": pa.array([int(viol.sum())], pa.int64()),
                "n_rows_at_risk": pa.array([int(sz[viol].sum())], pa.int64()),
                "min_group_size": pa.array([int(sz.min())], pa.int64()),
            }
        )

    parts = typed_collect(
        reduced.map_batches(summary_partial, batch_format="pyarrow"),
        pa.schema(
            [
                (c, pa.int64())
                for c in (
                    "n_rows",
                    "n_groups",
                    "n_violating_groups",
                    "n_rows_at_risk",
                    "min_group_size",
                )
            ]
        ),
    )
    if len(parts) == 0:
        vals = (0, 0, 0, 0, 0)
    else:
        vals = (
            int(parts["n_rows"].sum()),
            int(parts["n_groups"].sum()),
            int(parts["n_violating_groups"].sum()),
            int(parts["n_rows_at_risk"].sum()),
            int(parts["min_group_size"].min()),
        )
    return pd.DataFrame(
        [vals],
        columns=[
            "n_rows",
            "n_groups",
            "n_violating_groups",
            "n_rows_at_risk",
            "min_group_size",
        ],
    ).astype("int64")


def q_temporal_dim_join(sf_dir: str):
    """Fact-to-SCD2 TEMPORAL dimension join — the warehouse join every
    star schema runs after building its Type-2 dimension: each purchase
    event is matched to the order-status validity interval of its user
    that CONTAINS the event time (valid_from <= ts < valid_to, open last
    interval), and revenue rolls up by the dimension attribute as it was
    AT EVENT TIME, not as it is now.  Events before the user's first
    interval, and events of users with no dimension rows at all (the
    dangling-FK class), report 'unmatched'.

    Plan: because SCD2 intervals per key are non-overlapping and extend
    to the next interval's start, interval membership IS an as-of
    backward match on valid_from — so the join needs no band replication
    (contrast q_range_join_view_purchase's fixed-width windows): ONE
    co-shuffle of orders and purchases onto the same splitmix(custkey)
    buckets (union with a side tag), then per bucket a vectorized
    islands fold (the q_scd2_order_status shifted-compare kernel) and a
    single `pd.merge_asof(by=custkey)` — C-vectorized per bucket, no
    per-customer Python.  A hot customer lands whole in one bucket with
    vectorized work.  Each bucket reduces to per-status integer partials
    (cents grid); the driver folds O(buckets × statuses) rows."""
    import numpy as np
    import pyarrow.parquet as pq_meta

    from .sizing import shuffle_partitions

    empty = pd.DataFrame(
        {
            "status": pd.Series([], dtype=object),
            "n_events": pd.Series([], dtype="int64"),
            "sum_cents": pd.Series([], dtype="int64"),
        }
    )
    n_ord = pq_meta.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    n_ev = pq_meta.read_metadata(f"{sf_dir}/events.parquet").num_rows
    if n_ev == 0:
        return empty
    n_buckets = shuffle_partitions(max(1, n_ord + n_ev))

    side_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("side", pa.string()),
            ("cust", pa.int64()),
            ("ts_us", pa.int64()),
            ("status", pa.string()),
            ("okey", pa.int64()),
            ("cents", pa.int64()),
        ]
    )

    def dim_rows(t: pa.Table) -> pa.Table:
        cust = t.column("o_custkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(
                    _user_bucket(cust, n_buckets).astype(np.int64)
                ),
                "side": pa.array(np.repeat("d", len(t)), pa.string()),
                "cust": pa.array(cust.astype(np.int64)),
                "ts_us": t.column("o_orderdate").cast(pa.int64()),
                "status": t.column("o_orderstatus"),
                "okey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "cents": pa.array(np.zeros(len(t), np.int64)),
            },
            schema=side_schema,
        )

    def fact_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        cust = t.column("user_id").to_numpy(zero_copy_only=False)
        cents = np.rint(
            round_half_away(t.column("value").to_numpy(zero_copy_only=False), 2)
            * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    _user_bucket(cust, n_buckets).astype(np.int64)
                ),
                "side": pa.array(np.repeat("e", len(t)), pa.string()),
                "cust": pa.array(cust.astype(np.int64)),
                "ts_us": t.column("ts").cast(pa.int64()),
                "status": pa.array([None] * len(t), pa.string()),
                "okey": pa.array(np.zeros(len(t), np.int64)),
                "cents": pa.array(cents),
            },
            schema=side_schema,
        )

    dim = _read(
        sf_dir,
        "orders",
        ["o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate"],
        rows_per_block=200_000,
    ).map_batches(dim_rows, batch_format="pyarrow")
    fact = _read(
        sf_dir,
        "events",
        ["user_id", "ts", "event_type", "value"],
        rows_per_block=200_000,
    ).map_batches(fact_rows, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["side"] == "e"]
        if len(ev) == 0:
            return pd.DataFrame(
                {
                    "status": pd.Series([], dtype=object),
                    "n_events": pd.Series([], dtype="int64"),
                    "sum_cents": pd.Series([], dtype="int64"),
                }
            )
        dm = g[g["side"] == "d"]
        if len(dm) == 0:
            matched = pd.Series([None] * len(ev), dtype=object)
        else:
            # islands: the q_scd2 shifted-compare kernel on (cust, date, okey)
            dm = dm.sort_values(["cust", "ts_us", "okey"], kind="mergesort")
            c = dm["cust"].to_numpy(np.int64)
            s = dm["status"].to_numpy(object).copy()
            s[pd.isna(s)] = None
            m = len(dm)
            new_cust = np.ones(m, bool)
            new_cust[1:] = c[1:] != c[:-1]
            chg = new_cust.copy()
            if m > 1:
                chg[1:] |= s[1:] != s[:-1]
            starts = np.flatnonzero(chg)
            isl = pd.DataFrame(
                {
                    "cust": c[starts],
                    "ts_us": dm["ts_us"].to_numpy(np.int64)[starts],
                    "isl_status": pd.Series(s[starts], dtype=object),
                }
            )
            evs = ev.sort_values("ts_us", kind="mergesort")
            isl = isl.sort_values("ts_us", kind="mergesort")
            j = pd.merge_asof(
                evs[["cust", "ts_us", "cents"]],
                isl,
                on="ts_us",
                by="cust",
                direction="backward",
            )
            matched = j["isl_status"]
            ev = evs
        # COALESCE(status, 'unmatched'): a no-match NaN and a NULL-status
        # island both report 'unmatched' (identical rule in the oracle)
        lab = np.where(pd.isna(matched), "unmatched", matched.astype(object))
        out = pd.DataFrame(
            {"status": lab, "cents": ev["cents"].to_numpy(np.int64)}
        )
        agg = out.groupby("status", sort=False).agg(
            n_events=("cents", "size"), sum_cents=("cents", "sum")
        )
        agg = agg.reset_index()
        return pd.DataFrame(
            {
                "status": agg["status"].astype(object),
                "n_events": agg["n_events"].astype("int64"),
                "sum_cents": agg["sum_cents"].astype("int64"),
            }
        )

    parts = typed_collect(
        dim.union(fact)
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas"),
        pa.schema(
            [
                ("status", pa.string()),
                ("n_events", pa.int64()),
                ("sum_cents", pa.int64()),
            ]
        ),
    )
    if len(parts) == 0:
        return empty
    out = (
        parts.groupby("status", sort=True)[["n_events", "sum_cents"]]
        .sum()
        .reset_index()
    )
    return out.astype({"n_events": "int64", "sum_cents": "int64"})


def _key_freq_hist(ds, key_col: str, n_buckets: int) -> pd.DataFrame:
    """Exact count-of-counts histogram of an int64 join/shuffle key: per
    block counts per key -> splitmix64 bucket exchange (each key's
    partials co-locate whole) -> per-bucket pandas fold to key totals ->
    value_counts of totals.  Returns the merged (f, nk) frame — the
    freq-of-freq table is BOUNDED (distinct frequency values), so the
    driver holds stats for a corpus of any key cardinality."""
    import numpy as np

    from .frames import typed_collect

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "key": pc.cast(t.column(key_col), pa.int64()),
                "f": pa.array(np.ones(len(t), np.int64)),
            }
        )
        g = tt.group_by("key").aggregate([("f", "sum")])
        g = g.rename_columns(["key", "f"])
        k = g.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
        z = (k + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        return g.append_column(
            "bucket", pa.array((z % np.uint64(n_buckets)).astype(np.int64))
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        totals = g.groupby("key", sort=False)["f"].sum()
        hist = totals.value_counts()
        return pd.DataFrame(
            {
                "f": hist.index.to_numpy(np.int64),
                "nk": hist.to_numpy(np.int64),
            }
        )

    parts = typed_collect(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas"),
        pa.schema([("f", pa.int64()), ("nk", pa.int64())]),
    )
    if len(parts) == 0:
        return parts
    return parts.groupby("f", sort=True)["nk"].sum().reset_index()


def q_skew_report(sf_dir: str):
    """Shuffle-key SKEW diagnostics — the report every exchange tuner
    reads before picking a join strategy (salt? broadcast? bucket?):
    for each hot join key column (lineitem.l_partkey, orders.o_custkey),
    exact key cardinality, the hottest key's row count and its
    parts-per-million share, and the median / p99 per-key frequency.

    Exactness at any scale rides the count-of-counts trick: per-key
    totals reduce to the freq-of-freq histogram (BOUNDED: distinct
    frequency values), and every published number is an integer order
    statistic or cross-multiplication over that histogram — position
    ceil(q·n_keys) computed as (q_num·n_keys + q_num) // q_den in pure
    ints (never CEIL(0.99 * n), whose double product misrounds at
    n = 100k classes), top-share as max_freq·1e6 // n_rows."""
    import pyarrow.parquet as pq_meta

    from .sizing import shuffle_partitions

    cols = [("lineitem", "l_partkey"), ("orders", "o_custkey")]
    rows = []
    for table, key_col in cols:
        n = pq_meta.read_metadata(f"{sf_dir}/{table}.parquet").num_rows
        if n == 0:
            continue
        hist = _key_freq_hist(
            _read(sf_dir, table, [key_col], rows_per_block=200_000),
            key_col,
            shuffle_partitions(n),
        )
        if len(hist) == 0:
            continue
        f = hist["f"].to_numpy(np.int64)
        nk = hist["nk"].to_numpy(np.int64)
        n_rows = int((f * nk).sum())
        n_keys = int(nk.sum())
        cum = np.cumsum(nk)
        pos50 = (n_keys + 1) // 2  # ceil(n/2)
        pos99 = (99 * n_keys + 99) // 100  # ceil(0.99 n), pure ints
        p50 = int(f[np.searchsorted(cum, pos50, side="left")])
        p99 = int(f[np.searchsorted(cum, pos99, side="left")])
        max_f = int(f[-1])
        rows.append(
            (
                key_col,
                n_rows,
                n_keys,
                max_f,
                p50,
                p99,
                max_f * 1_000_000 // n_rows,
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "key_col",
            "n_rows",
            "n_keys",
            "max_freq",
            "p50_freq",
            "p99_freq",
            "top1_share_ppm",
        ],
    ).astype(
        {
            "key_col": object,
            "n_rows": "int64",
            "n_keys": "int64",
            "max_freq": "int64",
            "p50_freq": "int64",
            "p99_freq": "int64",
            "top1_share_ppm": "int64",
        }
    )


def _json_type_tag(v) -> str:
    """DuckDB json_type()'s tag for a Python-parsed JSON value.  The tags
    are SYNTAX-derived in yyjson — probed and pinned in tests: unsigned
    integer literals (incl. [2^63, 2^64)) are UBIGINT, negative in-range
    integers BIGINT, out-of-range integers and anything with a '.' or
    exponent DOUBLE (Python's json parses those to float, preserving the
    distinction), NaN/Infinity DOUBLE on both sides."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # bool is an int subclass: check first
        return "BOOLEAN"
    if isinstance(v, int):
        if 0 <= v < 2**64:
            return "UBIGINT"
        if -(2**63) <= v < 0:
            return "BIGINT"
        return "DOUBLE"
    if isinstance(v, float):
        return "DOUBLE"
    if isinstance(v, str):
        return "VARCHAR"
    if isinstance(v, list):
        return "ARRAY"
    return "OBJECT"


def q_json_profile(sf_dir: str):
    """Semi-structured SCHEMA INFERENCE over the events.props JSON
    column: per (top-level key, value type) the number of events
    carrying it — the profile that decides which JSON paths deserve
    extraction into real columns (and exposes type drift: the same key
    arriving as UBIGINT in one feed and VARCHAR in another).  Type tags
    are DuckDB's json_type() vocabulary so the oracle compares verbatim
    (`_json_type_tag`); malformed / NULL / non-object props contribute
    nothing on either side.  Out of contract (documented): duplicate
    keys within one object — Python keeps the last pair, yyjson lists
    both; keys containing '"' or '\\\\' break the ORACLE's quoted-path
    lookup only, never the engine.

    Scale shape: parsing is a streaming per-block pass (the only
    text-touching stage); the exchange carries (key, type, n) partials
    merged by `_two_regime_sum` over the bounded (key × type) domain."""
    import json

    ds = _read(sf_dir, "events", ["props"], rows_per_block=100_000)

    def partial(t: pa.Table) -> pa.Table:
        counts: dict = {}
        for s in t.column("props").to_pylist():
            if s is None:
                continue
            try:
                obj = json.loads(s)
            except ValueError:
                continue
            if not isinstance(obj, dict):
                continue
            for k, v in obj.items():
                kk = (k, _json_type_tag(v))
                counts[kk] = counts.get(kk, 0) + 1
        if not counts:
            return pa.table(
                {
                    "key": pa.array([], pa.string()),
                    "jtype": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        keys, jtypes, ns = zip(*((k, j, n) for (k, j), n in counts.items()))
        return pa.table(
            {
                "key": pa.array(list(keys), pa.string()),
                "jtype": pa.array(list(jtypes), pa.string()),
                "n": pa.array(list(ns), pa.int64()),
            }
        )

    reduced, _ = _two_regime_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["key", "jtype"],
        ["n"],
        empty_types={"key": pa.string(), "jtype": pa.string()},
    )
    df = typed_collect(
        reduced,
        pa.schema([("key", pa.string()), ("jtype", pa.string()), ("n", pa.int64())]),
    )
    return (
        df.astype({"key": object, "jtype": object, "n": "int64"})
        .sort_values(["key", "jtype"])
        .reset_index(drop=True)
    )


def q_table_checksum(sf_dir: str):
    """Order-free per-partition table CHECKSUMS — the anti-entropy /
    replication-repair primitive: two replicas (or a table and its
    migrated copy) compare one digest row per partition and re-sync only
    partitions whose digests differ, never the data.  Per order month:
    row count + the XOR of each row's md5-lower-64 (masked to 63 bits)
    over a CANONICAL row serialization.  XOR is commutative, associative
    and self-inverse — the digest is independent of row order, block
    layout, and merge shape, and cannot overflow, which is exactly what
    a distributed checksum needs (a SUM digest would need modular
    arithmetic; a concatenation hash would need a sort).

    Canonical row string: 'okey|ckey|status|prio|cents|epoch_us' — typed
    values rendered as integers/raw strings so both sides serialize
    identically (cents via the q_cdc_upsert ROUND pair).  Scale shape:
    one streaming pass; each block reduces to (month, n, xor) partials —
    months are bounded, the driver folds O(blocks × months) rows with a
    vectorized XOR."""
    import hashlib

    import numpy as np

    ds = _read(
        sf_dir,
        "orders",
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_orderpriority",
            "o_totalprice",
            "o_orderdate",
        ],
        rows_per_block=200_000,
    )
    MASK = np.uint64((1 << 63) - 1)

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "month": pa.array([], pa.string()),
                    "n_rows": pa.array([], pa.int64()),
                    "xor_digest": pa.array([], pa.int64()),
                }
            )
        month = pc.strftime(t.column("o_orderdate"), format="%Y-%m").to_pylist()
        cents = np.rint(
            round_half_away(
                t.column("o_totalprice").to_numpy(zero_copy_only=False), 2
            )
            * 100.0
        ).astype(np.int64)
        ts = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        st = t.column("o_orderstatus").to_pylist()
        pr = t.column("o_orderpriority").to_pylist()
        hv = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(
                        f"{ok[i]}|{ck[i]}|{st[i]}|{pr[i]}|{cents[i]}|{ts[i]}".encode(
                            "utf-8"
                        )
                    ).digest()[8:],
                    "little",
                )
                for i in range(len(t))
            ),
            np.uint64,
            len(t),
        ) & MASK
        df = pd.DataFrame({"month": month, "h": hv.astype(np.int64)})
        agg = df.groupby("month", sort=False)["h"].agg(
            [("n_rows", "size"), ("xor_digest", lambda s: int(np.bitwise_xor.reduce(s.to_numpy(np.int64))))]
        )
        agg = agg.reset_index()
        return pa.table(
            {
                "month": pa.array(agg["month"].astype(object), pa.string()),
                "n_rows": pa.array(agg["n_rows"].to_numpy(np.int64)),
                "xor_digest": pa.array(agg["xor_digest"].to_numpy(np.int64)),
            }
        )

    parts = typed_collect(
        ds.map_batches(partial, batch_format="pyarrow"),
        pa.schema(
            [
                ("month", pa.string()),
                ("n_rows", pa.int64()),
                ("xor_digest", pa.int64()),
            ]
        ),
    )
    if len(parts) == 0:
        return parts
    out = parts.groupby("month", sort=True).agg(
        n_rows=("n_rows", "sum"),
        xor_digest=(
            "xor_digest",
            lambda s: int(np.bitwise_xor.reduce(s.to_numpy(np.int64))),
        ),
    )
    return (
        out.reset_index()
        .astype({"month": object, "n_rows": "int64", "xor_digest": "int64"})
        .sort_values("month")
        .reset_index(drop=True)
    )


def q_equidepth_histogram(sf_dir: str):
    """EXACT equi-depth (quartile) histogram of order totals — the
    optimizer statistic q_column_profile doesn't carry: interpolated
    q25/q50/q75 boundaries plus the exact row count of each quartile
    bucket, over a column whose value domain is ~distinct-per-row (so
    the bounded-domain histogram trick of q_group_quantiles does NOT
    apply — this is the order-statistic-at-scale member of the family).

    Plan: the terasort machinery (`_range_plan`) range-partitions by the
    raw double once; partition offsets locate which partitions hold the
    six needed order statistics (positions ⌊(n-1)p⌋+1, +2 for the three
    p's), and ONLY those partitions' key arrays are collected — each is
    ~target_rows (bounded by sizing, ~2M rows / 16 MB at any corpus
    size), everything else never moves.  The driver interpolates with
    the quantile_cont formula (pinned formula-identical in
    q_group_quantiles), rounds to 6 both sides, and a second streaming
    combiner counts the four strict-boundary buckets with the SAME
    rounded doubles — so boundary ties resolve identically by
    construction."""
    import numpy as np
    import pyarrow.parquet as pq_meta
    import ray

    cols = [
        "n_rows",
        "q25",
        "q50",
        "q75",
        "n_b1",
        "n_b2",
        "n_b3",
        "n_b4",
    ]
    n = pq_meta.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    if n == 0:
        return pd.DataFrame(
            [(0, np.nan, np.nan, np.nan, 0, 0, 0, 0)], columns=cols
        ).astype({c: "int64" for c in ("n_rows", "n_b1", "n_b2", "n_b3", "n_b4")})
    ds = _read(
        sf_dir, "orders", ["o_orderkey", "o_totalprice"], rows_per_block=200_000
    )
    assign, offsets = _range_plan(ds, n, "o_orderkey", "o_totalprice", "eqd_part")

    # six global 1-indexed positions (lo+1, lo+2 per quantile), clamped to n
    ps = (0.25, 0.5, 0.75)
    need = sorted(
        {
            min(n, int(np.floor((n - 1) * p)) + 1 + d)
            for p in ps
            for d in (0, 1)
        }
    )
    offs = np.asarray(offsets, np.int64)
    part_of = {k: int(np.searchsorted(offs, k, side="left") - 1) for k in need}
    wanted = sorted(set(part_of.values()))
    wanted_ref = ray.put(np.asarray(wanted, np.int64))

    def pick(t: pa.Table) -> pa.Table:
        import ray as _ray

        w = _ray.get(wanted_ref)
        m = np.isin(t.column("part").to_numpy(zero_copy_only=False), w)
        t = t.filter(pa.array(m))
        return t.select(["part", "o_totalprice"])

    picked = typed_collect(
        ds.map_batches(assign, batch_format="pyarrow").map_batches(
            pick, batch_format="pyarrow"
        ),
        pa.schema([("part", pa.int64()), ("o_totalprice", pa.float64())]),
    )
    by_part = {
        int(p): np.sort(g["o_totalprice"].to_numpy(np.float64))
        for p, g in picked.groupby("part")
    }
    stat = {
        k: float(by_part[part_of[k]][k - int(offs[part_of[k]]) - 1]) for k in need
    }
    bounds = []
    for p in ps:
        h = (n - 1) * p
        lo = int(np.floor(h))
        xlo = stat[lo + 1]
        xhi = stat[lo + 2] if lo + 1 < n else xlo
        bounds.append(float(round_half_away(xlo + (h - lo) * (xhi - xlo), 6)))
    b25, b50, b75 = bounds

    def bucket_counts(t: pa.Table) -> pa.Table:
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_b1": pa.array([int((v < b25).sum())], pa.int64()),
                "n_b2": pa.array([int(((v >= b25) & (v < b50)).sum())], pa.int64()),
                "n_b3": pa.array([int(((v >= b50) & (v < b75)).sum())], pa.int64()),
                "n_b4": pa.array([int((v >= b75).sum())], pa.int64()),
            }
        )

    parts = typed_collect(
        ds.map_batches(bucket_counts, batch_format="pyarrow"),
        pa.schema([(c, pa.int64()) for c in ("n_b1", "n_b2", "n_b3", "n_b4")]),
    )
    return pd.DataFrame(
        [
            (
                n,
                b25,
                b50,
                b75,
                int(parts["n_b1"].sum()),
                int(parts["n_b2"].sum()),
                int(parts["n_b3"].sum()),
                int(parts["n_b4"].sum()),
            )
        ],
        columns=cols,
    ).astype({c: "int64" for c in ("n_rows", "n_b1", "n_b2", "n_b3", "n_b4")})


L_DIVERSITY = 3  # minimum distinct sensitive values per QI group (oracle literal)


def q_l_diversity(sf_dir: str):
    """l-diversity audit, k-anonymity's sharper sibling: a QI group can
    be large yet still leak if everyone in it shares the sensitive value
    (the homogeneity attack k-anonymity misses).  QI pair =
    (nation, market segment); sensitive attribute = the exact account
    balance; a group is low-diversity when it holds fewer than
    L_DIVERSITY distinct sensitive values.  Reports group count,
    low-diversity group count, rows at risk, and the minimum diversity.

    Scale shape: distinct-per-group decomposes into two mergeable
    levels — a per-block combiner reduces to (QI, sensitive) pair counts,
    `_two_regime_sum` merges them over the pair key-space (the only
    corpus-proportional exchange), then each block of the pair table
    collapses to (QI, l=1, rows=n) partials and a second two-regime
    merge over the SMALL QI domain yields per-group (l, rows); the
    driver folds O(QI) ints.  -0.0 balances fold to +0.0 (`v + 0.0`)
    so the distinct grouping matches SQL equality."""
    import numpy as np

    ds = _read(
        sf_dir,
        "customer",
        ["c_nationkey", "c_mktsegment", "c_acctbal"],
        rows_per_block=100_000,
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        bal = t.column("c_acctbal").to_numpy(zero_copy_only=False) + 0.0
        tt = pa.table(
            {
                "nat": pc.cast(t.column("c_nationkey"), pa.int64()),
                "seg": t.column("c_mktsegment"),
                "sv": pa.array(bal),
                "n": pa.array(np.ones(len(t), np.int64)),
            }
        )
        g = tt.group_by(["nat", "seg", "sv"]).aggregate([("n", "sum")])
        return g.rename_columns(["nat", "seg", "sv", "n"])

    pairs, _ = _two_regime_sum(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["nat", "seg", "sv"],
        ["n"],
        empty_types={"nat": pa.int64(), "seg": pa.string(), "sv": pa.float64()},
    )

    def group_partial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "nat": t.column("nat"),
                "seg": t.column("seg"),
                "l": pa.array(np.ones(len(t), np.int64)),
                "rows_": t.column("n"),
            }
        )
        g = tt.group_by(["nat", "seg"]).aggregate([("l", "sum"), ("rows_", "sum")])
        return g.rename_columns(["nat", "seg", "l", "rows_"])

    groups, _ = _two_regime_sum(
        pairs.map_batches(group_partial, batch_format="pyarrow"),
        ["nat", "seg"],
        ["l", "rows_"],
        empty_types={"nat": pa.int64(), "seg": pa.string()},
    )
    df = typed_collect(
        groups,
        pa.schema(
            [
                ("nat", pa.int64()),
                ("seg", pa.string()),
                ("l", pa.int64()),
                ("rows_", pa.int64()),
            ]
        ),
    )
    if len(df) == 0:
        vals = (0, 0, 0, 0)
    else:
        low = df["l"] < L_DIVERSITY
        vals = (
            int(len(df)),
            int(low.sum()),
            int(df.loc[low, "rows_"].sum()),
            int(df["l"].min()),
        )
    return pd.DataFrame(
        [vals],
        columns=["n_groups", "n_low_diversity_groups", "n_rows_at_risk", "min_l"],
    ).astype("int64")


def q_orc_roundtrip(sf_dir: str):
    """LOSSLESS Apache ORC round trip with column pruning: events streams
    through the distributed ORC sink (`sources.readers.write_orc_table` —
    one content-addressed ``.orc`` file per block, idempotent
    tmp+os.replace writes) and back through the one-task-per-file ORC
    source READING ONLY the projected columns (props never leaves disk —
    ORC is columnar, so pruning is a decode-time property this identity
    actually exercises, unlike the IPC leg).  ORC's one declared edge is
    timestamp widening to ns on disk; the source casts back to the
    written Arrow schema, and the per-event projection must then match
    the original parquet bit-for-bit — the warehouse-interchange leg of
    the format matrix (parquet / CSV / JSONL / WARC / WebDataset tar /
    IPC / ORC)."""
    import shutil
    import tempfile

    from ..sources.readers import read_orc_table, write_orc_table

    empty = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "ts_us": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype=object),
            "value": pd.Series([], dtype="float64"),
        }
    )
    out_dir = tempfile.mkdtemp(prefix="pdfray_orc_")
    try:
        write_orc_table(_read(sf_dir, "events"), out_dir)
        if not any(n.endswith(".orc") for n in os.listdir(out_dir)):
            return empty  # empty corpus wrote no files

        cols = ["event_id", "ts", "user_id", "event_type", "value"]
        back_schema = pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
            ]
        )

        def digest(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "event_id": t.column("event_id"),
                    "ts_us": t.column("ts").cast(pa.int64()),
                    "user_id": t.column("user_id"),
                    "event_type": t.column("event_type"),
                    "value": t.column("value"),
                }
            )

        return (
            read_orc_table(out_dir, columns=cols, schema=back_schema)
            .map_batches(digest, batch_format="pyarrow")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def q_auc_purchase_value(sf_dir: str):
    """Exact distributed AUC (Mann-Whitney U with tie correction) — does
    `value` separate purchase events from the rest?  The model-eval rank
    statistic every training-data pipeline computes for its quality /
    filter scores, done EXACTLY at corpus scale without a global sort:

      2U = Σ_s n_pos(s) · (2·cumneg_lt(s) + n_neg(s))   over distinct
      scores s ascending — an integer (ties contribute the ½ as the
      un-divided n_neg(s) term), and AUC = 2U / (2·n_pos·n_neg).

    Plan: the terasort machinery (`_range_plan`, shared with
    q_global_rank_orders / q_gini_revenue) range-partitions on the RAW
    double score, equal keys co-locating by construction — so ties never
    straddle partitions and the cross-partition pair count collapses to
    2·n_pos_p·cumneg_before_p per partition.  ONE range exchange; each
    partition reduces to a constant-size (part, n_pos, n_neg, u2_local)
    partial folded as exact Python ints on the driver (the q_gini fold).
    NULL / NaN scores are excluded on both sides; -0.0 is normalized to
    +0.0 (`v + 0.0`) so the distinct-score grouping matches DuckDB's.
    u2 is reported as int64 — past ~3×10⁹ usable rows per class the
    report column itself would saturate; the internal fold is unbounded.
    """
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    empty = pd.DataFrame(
        {
            "n_pos": pd.Series([], dtype="int64"),
            "n_neg": pd.Series([], dtype="int64"),
            "u2": pd.Series([], dtype="int64"),
            "auc": pd.Series([], dtype="float64"),
        }
    )
    n = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    if n == 0:
        return empty
    ds = _read(
        sf_dir,
        "events",
        ["event_id", "event_type", "value"],
        rows_per_block=500_000,
    )

    def prep(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        keep = pc.is_valid(t.column("value")).to_numpy(
            zero_copy_only=False
        ) & ~np.isnan(v)
        pos = (
            pc.fill_null(pc.equal(t.column("event_type"), "purchase"), False)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "event_id": t.column("event_id").filter(pa.array(keep)),
                "value": pa.array(v[keep] + 0.0),
                "pos": pa.array(pos[keep]),
            }
        )

    prepared = ds.map_batches(prep, batch_format="pyarrow")
    assign, offsets = _range_plan(prepared, n, "event_id", "value", "auc_part")

    def part_partial(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(np.float64)
        p = g["pos"].to_numpy(np.int64)
        order = np.argsort(v, kind="stable")
        v, p = v[order], p[order]
        _, inv, cnt = np.unique(v, return_inverse=True, return_counts=True)
        npos = np.bincount(inv, weights=p).astype(np.int64)
        nneg = cnt.astype(np.int64) - npos
        cumneg = np.concatenate([[0], np.cumsum(nneg)[:-1]])
        # npos(s)·(2·cumneg+nneg) ≤ n_p² per term — int64-safe while the
        # partition stays under ~2^31 rows (shuffle_partitions grows with
        # data, so a trip here means partition sizing broke, not math)
        assert len(g) == 0 or len(g) * len(g) < 2**62
        terms = npos * (2 * cumneg + nneg)
        u2_local = int(terms.sum(dtype=object)) if len(terms) else 0
        return pd.DataFrame(
            {
                "part": [int(g["part"].iloc[0])],
                "n_pos": [int(p.sum())],
                "n_neg": [int(len(p) - p.sum())],
                "u2_str": [str(u2_local)],
            }
        )

    parts = (
        prepared.map_batches(assign, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_partial, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return empty
    parts = parts.sort_values("part").reset_index(drop=True)
    cumneg_before = 0
    u2 = 0
    for _, row in parts.iterrows():
        u2 += int(row["u2_str"]) + 2 * int(row["n_pos"]) * cumneg_before
        cumneg_before += int(row["n_neg"])
    n_pos = int(parts["n_pos"].sum())
    n_neg = int(parts["n_neg"].sum())
    if n_pos + n_neg == 0:
        return empty
    auc = (
        round_half_away(u2 / (2.0 * n_pos * n_neg), 6).item()
        if n_pos > 0 and n_neg > 0
        else np.nan
    )
    return pd.DataFrame(
        {
            "n_pos": pd.Series([n_pos], dtype="int64"),
            "n_neg": pd.Series([n_neg], dtype="int64"),
            "u2": pd.Series([u2], dtype="int64"),
            "auc": pd.Series([auc], dtype="float64"),
        }
    )


def q_scd2_order_status(sf_dir: str):
    """SCD Type-2 dimension build (gaps-and-islands): per customer,
    collapse the order history ordered by (o_orderdate, o_orderkey) into
    validity intervals over which o_orderstatus is constant — the
    slowly-changing-dimension table every warehouse maintains, and the
    canonical islands problem (LAG + running change count in SQL).

    Plan: ONE hash exchange on splitmix(o_custkey) buckets
    (`_user_bucket`, shuffle_partitions-sized), then one VECTORIZED
    pandas fold per bucket — island boundaries from shifted array
    compares (no per-row loop), per-island first-date / count / next-
    island lookahead as numpy gathers.  All rows of a customer co-locate
    by construction, so no cross-partition stitch is needed (contrast
    q_sessionize, whose time-chunk split exists because single-user
    streams can exceed a worker); a pathologically hot customer lands
    one bucket with vectorized work, never a Python loop.

    NULL-status rows follow IS DISTINCT FROM semantics (missing equals
    missing → no new island); NULL order dates are undefined order and
    excluded from scope (the corpus never produces them).  Dates are
    reported as '%Y-%m-%d' strings: midnight-exact on this corpus, and
    a string NULL (open interval) survives the driver's dtype-strict
    compare where a NaT column would not."""
    import numpy as np
    import pyarrow.parquet as pq

    from .sizing import shuffle_partitions

    empty = pd.DataFrame(
        {
            "o_custkey": pd.Series([], dtype="int64"),
            "island_seq": pd.Series([], dtype="int64"),
            "o_orderstatus": pd.Series([], dtype=object),
            "valid_from": pd.Series([], dtype=object),
            "valid_to": pd.Series([], dtype=object),
            "n_orders": pd.Series([], dtype="int64"),
        }
    )
    n = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    if n == 0:
        return empty
    n_buckets = shuffle_partitions(n)
    ds = _read(
        sf_dir,
        "orders",
        ["o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate"],
        rows_per_block=200_000,
    )

    def bucket(t: pa.Table) -> pa.Table:
        users = t.column("o_custkey").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket",
            pa.array(_user_bucket(users, n_buckets).astype(np.int64)),
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort"
        )
        c = g["o_custkey"].to_numpy(np.int64)
        s = g["o_orderstatus"].to_numpy(object).copy()
        s[pd.isna(s)] = None  # normalize NaN→None for exact == compare
        d = pd.to_datetime(g["o_orderdate"]).dt.strftime("%Y-%m-%d").to_numpy(object)
        m = len(g)
        new_cust = np.ones(m, bool)
        new_cust[1:] = c[1:] != c[:-1]
        chg = new_cust.copy()
        if m > 1:
            chg[1:] |= s[1:] != s[:-1]
        starts = np.flatnonzero(chg)
        counts = np.diff(np.append(starts, m)).astype(np.int64)
        nc = new_cust[starts]
        idx = np.arange(len(starts), dtype=np.int64)
        seq = idx - np.maximum.accumulate(np.where(nc, idx, -1)) + 1
        vf = d[starts]
        vt = np.empty(len(starts), object)
        vt[:] = None
        if len(starts) > 1:
            cont = ~nc[1:]  # next island belongs to the same customer
            vt[:-1][cont] = vf[1:][cont]
        return pd.DataFrame(
            {
                "o_custkey": c[starts],
                "island_seq": seq,
                "o_orderstatus": pd.Series(s[starts], dtype=object),
                "valid_from": pd.Series(vf, dtype=object),
                "valid_to": pd.Series(vt, dtype=object),
                "n_orders": counts,
            }
        )

    out = typed_collect(
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas"),
        pa.schema(
            [
                ("o_custkey", pa.int64()),
                ("island_seq", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("valid_from", pa.string()),
                ("valid_to", pa.string()),
                ("n_orders", pa.int64()),
            ]
        ),
    )
    if len(out) == 0:
        return empty
    return out.sort_values(["o_custkey", "island_seq"]).reset_index(drop=True)


def q_median_impute(sf_dir: str):
    """Median IMPUTATION of a meaningless measure — the feature-repair
    primitive of a training-data pipeline: 'error' events carry a
    diagnostic `value` that must not leak into per-user spend features,
    so each error row is imputed with the PER-USER median of that user's
    non-error values, falling back to the GLOBAL non-error median for
    users who only ever errored (NULL when the corpus has no non-error
    rows at all).

    EXACT across engines: medians ride the bounded-domain histogram over
    the RAW doubles (the q_group_quantiles trick) and replay DuckDB's
    quantile_cont interpolation (formula pinned identical there); the
    imputed value and the per-row sums are expressed in HALF-CENTS via
    round_half_away (x200 lands on .5 ties on binary-grid data, where
    banker's rounding would diverge from DuckDB ROUND), integer-exact as
    doubles far below 2^53.  med/total ride as DOUBLE so the no-ok-rows
    case degenerates to NULL/NaN without flipping the dtype class.

    Scale shape: ONE streaming pass emits (user, kind, value) -> count
    histogram partials; the GLOBAL fallback histogram rides the same
    pass as kind=2 sentinel rows under the impossible user_id -1
    (bounded by the value-domain cardinality, never corpus size), so a
    single exchange serves both the per-user medians and the fallback.
    Resolution is the two-regime split: driver pandas fold below
    PIVOT_DRIVER_MAX_ROWS, a user-keyed map_groups above (the bounded
    global rows collect to the driver either way and broadcast as one
    scalar in the closure)."""
    import numpy as np

    ds = _read(
        sf_dir, "events", ["user_id", "event_type", "value"], rows_per_block=100_000
    )

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "kind": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        is_err = pc.equal(t.column("event_type"), "error")
        ok = t.filter(pc.invert(is_err))
        err = t.filter(is_err)
        frames = []
        if len(ok):
            g = (
                pa.table({"user_id": ok.column("user_id"), "value": ok.column("value")})
                .group_by(["user_id", "value"])
                .aggregate([("value", "count")])
                .rename_columns(["user_id", "value", "cnt"])
            )
            u = g.column("user_id").to_numpy(zero_copy_only=False)
            v = g.column("value").to_numpy(zero_copy_only=False)
            c = g.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
            frames.append(
                pd.DataFrame(
                    {"user_id": u, "kind": np.int64(0), "value": v, "cnt": c}
                )
            )
            # global fallback histogram: same rows re-keyed under the
            # impossible sentinel user (ids are non-negative); re-reduced
            # locally so the sentinel rows stay value-domain-bounded
            gg = (
                pd.DataFrame({"value": v, "cnt": c})
                .groupby("value", as_index=False)["cnt"]
                .sum()
            )
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": np.int64(-1),
                        "kind": np.int64(2),
                        "value": gg["value"].to_numpy(np.float64),
                        "cnt": gg["cnt"].to_numpy(np.int64),
                    }
                )
            )
        if len(err):
            eu = (
                pa.table({"user_id": err.column("user_id")})
                .group_by("user_id")
                .aggregate([("user_id", "count")])
                .rename_columns(["user_id", "cnt"])
            )
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": eu.column("user_id").to_numpy(zero_copy_only=False),
                        "kind": np.int64(1),
                        "value": np.float64(0.0),
                        "cnt": eu.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64),
                    }
                )
            )
        if not frames:
            return empty
        df = pd.concat(frames, ignore_index=True)
        return pa.table(
            {
                "user_id": pa.array(df["user_id"].to_numpy(np.int64)),
                "kind": pa.array(df["kind"].to_numpy(np.int64)),
                "value": pa.array(df["value"].to_numpy(np.float64)),
                "cnt": pa.array(df["cnt"].to_numpy(np.int64)),
            }
        )

    red, n_red = _two_regime_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id", "kind", "value"],
        ["cnt"],
        empty_types={"user_id": pa.int64(), "kind": pa.int64(), "value": pa.float64()},
    )

    out_cols = ["user_id", "n_ok", "n_err", "med_halfcents", "total_halfcents"]

    def _empty_out():
        return pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "n_ok": pd.Series(dtype="int64"),
                "n_err": pd.Series(dtype="int64"),
                "med_halfcents": pd.Series(dtype="float64"),
                "total_halfcents": pd.Series(dtype="float64"),
            }
        )

    def _median_hc(vals: "np.ndarray", cnts: "np.ndarray") -> float:
        order = np.argsort(vals, kind="stable")
        v = vals[order]
        c = cnts[order]
        med = _quantile_cont_replay(v, c.cumsum(), 0.5)
        return float(round_half_away(med * 200.0, 0))

    def user_frame(df: pd.DataFrame, gmed_hc: float) -> pd.DataFrame:
        if not len(df):
            return _empty_out()
        rows = []
        for uid, g in df.groupby("user_id", sort=False):
            ok = g[g["kind"] == 0]
            n_ok = int(ok["cnt"].sum())
            n_err = int(g.loc[g["kind"] == 1, "cnt"].sum())
            if n_ok:
                vals = ok["value"].to_numpy(np.float64)
                cnts = ok["cnt"].to_numpy(np.int64)
                med_hc = _median_hc(vals, cnts)
                ok_sum = int(
                    (
                        round_half_away(vals * 200.0, 0).astype(np.int64)
                        * cnts
                    ).sum()
                )
            else:
                med_hc = gmed_hc
                ok_sum = 0
            total = float(ok_sum) + n_err * med_hc if med_hc == med_hc else float("nan")
            rows.append((int(uid), n_ok, n_err, med_hc, total))
        out = pd.DataFrame(rows, columns=out_cols)
        return out.astype(
            {
                "user_id": "int64",
                "n_ok": "int64",
                "n_err": "int64",
                "med_halfcents": "float64",
                "total_halfcents": "float64",
            }
        )

    red_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("kind", pa.int64()),
            ("value", pa.float64()),
            ("cnt", pa.int64()),
        ]
    )
    if n_red == 0:
        return _empty_out()
    if n_red <= PIVOT_DRIVER_MAX_ROWS:
        df = typed_collect(red, red_schema)
        gl = df[df["kind"] == 2]
        gmed_hc = (
            _median_hc(
                gl["value"].to_numpy(np.float64), gl["cnt"].to_numpy(np.int64)
            )
            if len(gl)
            else float("nan")
        )
        out = user_frame(df[df["kind"] != 2], gmed_hc)
    else:
        import numpy as np  # noqa: F811 — worker closure import

        gl = typed_collect(
            red.filter(lambda r: r["kind"] == 2), red_schema
        )  # value-domain-bounded rows only
        gmed_hc = (
            _median_hc(
                gl["value"].to_numpy(np.float64), gl["cnt"].to_numpy(np.int64)
            )
            if len(gl)
            else float("nan")
        )

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            return user_frame(g, gmed_hc)

        out = typed_collect(
            red.filter(lambda r: r["kind"] != 2)
            .groupby("user_id")
            .map_groups(fold, batch_format="pandas"),
            pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("n_ok", pa.int64()),
                    ("n_err", pa.int64()),
                    ("med_halfcents", pa.float64()),
                    ("total_halfcents", pa.float64()),
                ]
            ),
        )
    if len(out) == 0:
        return _empty_out()
    return out.sort_values("user_id").reset_index(drop=True)


# ----------------------------------------------------------------------
# DDSketch — Masson, Rim & Lee 2019 (VLDB), "DDSketch: a fast and
# fully-mergeable quantile sketch with relative-error guarantees".
# Engine-added brief: the missing member of the sketch family (HLL =
# distinct, CMS = point frequency, KMV = set ops, AMS = F2) — mergeable
# QUANTILES with a bounded relative error, the summary a 100 TB profiler
# ships per partition instead of the raw column.

DDSKETCH_QS_PERMILLE = (500, 900, 950, 990)
# |cents| above this would overflow the bucket-bound arithmetic's int64
# reconstruction in the SQL replay (lo/hi ~ 2.25 * 2^(L-1)); 2^56 cents
# is ~$7e14 per order — far past any real price.  A corpus beyond it
# rescales the grid a decade like the CUSUM/Benford guards.
DDSKETCH_MAX_ABS_CENTS = 1 << 56


def _dd_bucket_keys(cents: np.ndarray) -> np.ndarray:
    """Deterministic base-2 DDSketch bucket key per value, NO logarithms:
    key = sign * (4*L + j) where L = bit_length(|c|) and j = the two
    mantissa bits after the leading 1 (zero-padded when L < 3).  Every
    op is integer, so engine and SQL replay (length(bin(x)), >>, &)
    agree bit-for-bit — a float log2 would misbucket exact powers of two
    by an ulp.  Bucket [lo, hi] spans a value ratio <= 1.25, hence the
    sketch's guaranteed relative error (hi-lo)/(hi+lo) <= 1/9."""
    a = np.abs(cents)
    if a.size and int(a.max()) > DDSKETCH_MAX_ABS_CENTS:
        raise RuntimeError(
            "q_ddsketch_quantiles: |cents| exceeds the bucket-bound "
            "guard — rescale the money grid a decade for this corpus"
        )
    # bit_length via float64 frexp is UNSAFE (ulp); do it with a shift
    # cascade like the Benford digit loop: int64 has at most 63 bits
    L = np.zeros(len(a), dtype=np.int64)
    rem = a.copy()
    for step in (32, 16, 8, 4, 2, 1):
        big = rem >= (np.int64(1) << np.int64(step))
        L += np.where(big, step, 0)
        rem = np.where(big, rem >> np.int64(step), rem)
    L += (a > 0).astype(np.int64)  # L = bit_length; 0 for a == 0
    sh = L - 3
    j = np.where(
        sh >= 0,
        (a >> np.maximum(sh, 0)) & 3,
        (a << np.maximum(-sh, 0)) & 3,
    )
    return np.sign(cents) * (4 * L + j) * (a > 0)


def _dd_bucket_bounds(bkey: int) -> tuple:
    """Exact integer [lo, hi] cents covered by a bucket key (Python ints,
    overflow-free; mirrors the oracle's HUGEINT reconstruction)."""
    if bkey == 0:
        return 0, 0
    s = 1 if bkey > 0 else -1
    k = abs(bkey)
    L, j = k // 4, k % 4
    plo = ((1 << (L - 1)) * (4 + j) + 3) // 4
    phi = ((1 << (L - 1)) * (5 + j) + 3) // 4 - 1
    return (plo, phi) if s > 0 else (-phi, -plo)


def q_ddsketch_quantiles(sf_dir: str):
    """Mergeable relative-error quantile sketch over o_totalprice — the
    DDSketch shape: each block collapses to <= ~240 (bucket, count)
    integers whatever its row count, `_two_regime_sum` merges the
    partials (the ONLY moving state), and the driver reads off
    q50/q90/q95/q99 from the cumulative bucket histogram.  Zero wide
    exchanges; the sketch for a 100 TB column is a few KB.

    Report per quantile: the 1-based rank r = (qm*n + 999) // 1000 (pure
    integer ceil — CEIL(q*n) on doubles misrounds, the q_skew_report
    lesson), the covering bucket, its EXACT integer cent bounds (the
    certificate: the true order statistic provably lies in [lo, hi]),
    the midpoint estimate and the per-bucket relative-error bound — the
    last two the SAME single IEEE expression on exact ints both sides.
    Empty input => zero rows (oracle's WHERE n > 0 branch agrees)."""

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = round_half_away(v * 100.0, 0).astype(np.int64)
        keys, cnts = np.unique(_dd_bucket_keys(cents), return_counts=True)
        return pa.table(
            {
                "bkey": pa.array(keys.astype(np.int64)),
                "cnt": pa.array(cnts.astype(np.int64)),
            }
        )

    parts = _read(
        sf_dir, "orders", ["o_totalprice"], rows_per_block=100_000
    ).map_batches(partial, batch_format="pyarrow")
    red, _ = _two_regime_sum(
        parts, ["bkey"], ["cnt"], empty_types={"bkey": pa.int64()}
    )
    hist = typed_collect(
        red, pa.schema([("bkey", pa.int64()), ("cnt", pa.int64())])
    )
    empty = pd.DataFrame(
        {
            "q_permille": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "rank": pd.Series([], dtype="int64"),
            "bucket_key": pd.Series([], dtype="int64"),
            "lo_cents": pd.Series([], dtype="int64"),
            "hi_cents": pd.Series([], dtype="int64"),
            "est_price": pd.Series([], dtype="float64"),
            "rel_err_bound": pd.Series([], dtype="float64"),
        }
    )
    if len(hist) == 0:
        return empty
    hist = hist.sort_values("bkey").reset_index(drop=True)
    cum = hist["cnt"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    rows = []
    for qm in DDSKETCH_QS_PERMILLE:
        r = (qm * n + 999) // 1000
        i = int(np.searchsorted(cum, r, side="left"))
        bkey = int(hist["bkey"].iloc[i])
        lo, hi = _dd_bucket_bounds(bkey)
        rows.append(
            {
                "q_permille": qm,
                "n": n,
                "rank": r,
                "bucket_key": bkey,
                "lo_cents": lo,
                "hi_cents": hi,
                "est_price": (lo + hi) / 200.0,
                "rel_err_bound": 0.0 if hi == lo else (hi - lo) / abs(hi + lo),
            }
        )
    out = pd.DataFrame(rows)
    for c in ("q_permille", "n", "rank", "bucket_key", "lo_cents", "hi_cents"):
        out[c] = out[c].astype("int64")
    return out


def q_ks_test(sf_dir: str):
    """Exact two-sample Kolmogorov–Smirnov — does the `value`
    distribution of purchase events differ from clicks?  The
    distribution-drift gate a training-data pipeline runs between two
    corpus snapshots before mixing them.  D = sup_v |F_A(v) − F_B(v)|
    cleared of division: d_num = max over distinct pooled values of
    |n_b·cumA(v) − n_a·cumB(v)| is an EXACT integer; the sup location is
    reported as the smallest value achieving it.

    Plan: the q_auc_purchase_value machinery — `_range_plan`
    range-partitions on the RAW double (equal keys co-locate, so the
    right-continuous CDF step at a tied value never splits), ONE range
    exchange.  The sup needs per-partition CDF offsets, which is the
    CUSUM constant-shift trick: inside a partition D(v) = [n_b·ca(v) −
    n_a·cb(v)] + (n_b·offA_p − n_a·offB_p) with the bracket local and
    the shift partition-constant, so each partition emits TWO candidate
    rows (argmax/argmin of the bracket — first index on ties == smallest
    value, matching the oracle's ORDER BY dn DESC, v ASC) and the driver
    folds partition totals into the exact shifts.  Totals (n_a, n_b)
    ride one prior driver-summed partial scan (no exchange).

    NULL/NaN scores excluded and -0.0 folded to +0.0 on both sides (the
    AUC conventions).  Bracket magnitude ≤ n² — int64-exact to n ≈ 2³¹
    rows per class; past that the fold switches to object ints like
    q_auc's u2 (guarded loudly, not silently wrong)."""
    import ray

    empty = pd.DataFrame(
        {
            "n_a": pd.Series([], dtype="int64"),
            "n_b": pd.Series([], dtype="int64"),
            "d_num": pd.Series([], dtype="int64"),
            "ks_d": pd.Series([], dtype="float64"),
            "at_value": pd.Series([], dtype="float64"),
        }
    )
    import pyarrow.parquet as pq

    n_file = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    if n_file == 0:
        return empty
    ds = _read(
        sf_dir,
        "events",
        ["event_id", "event_type", "value"],
        rows_per_block=500_000,
    )

    def prep(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        et = t.column("event_type")
        is_a = pc.fill_null(pc.equal(et, "purchase"), False).to_numpy(
            zero_copy_only=False
        )
        is_b = pc.fill_null(pc.equal(et, "click"), False).to_numpy(
            zero_copy_only=False
        )
        keep = (
            (is_a | is_b)
            & pc.is_valid(t.column("value")).to_numpy(zero_copy_only=False)
            & ~np.isnan(v)
        )
        return pa.table(
            {
                "event_id": t.column("event_id").filter(pa.array(keep)),
                "value": pa.array(v[keep] + 0.0),
                "a": pa.array(is_a[keep].astype(np.int64)),
            }
        )

    prepared = ds.map_batches(prep, batch_format="pyarrow")
    tots = np.zeros(2, dtype=np.int64)  # (n_a, n_b)
    for b in prepared.map_batches(
        lambda t: pa.table(
            {
                "na": pa.array(
                    [int(pc.sum(t.column("a")).as_py() or 0)], pa.int64()
                ),
                "nb": pa.array(
                    [len(t) - int(pc.sum(t.column("a")).as_py() or 0)],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).iter_batches(batch_format="numpy"):
        tots[0] += int(b["na"].sum())
        tots[1] += int(b["nb"].sum())
    n_a, n_b = int(tots[0]), int(tots[1])
    if n_a == 0 or n_b == 0:
        return empty
    if (n_a + n_b) ** 2 >= 2**62:
        raise RuntimeError(
            "q_ks_test: bracket bound exceeds int64 — switch the "
            "candidate fold to object ints for this corpus"
        )
    assign, _ = _range_plan(
        prepared, n_a + n_b, "event_id", "value", "ks_part"
    )

    def part_cands(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(np.float64)
        a = g["a"].to_numpy(np.int64)
        order = np.argsort(v, kind="stable")
        v, a = v[order], a[order]
        uv, inv, cnt = np.unique(v, return_inverse=True, return_counts=True)
        da = np.bincount(inv, weights=a).astype(np.int64)
        db = cnt.astype(np.int64) - da
        ca, cb = np.cumsum(da), np.cumsum(db)
        bracket = n_b * ca - n_a * cb
        rows = []
        for i in {int(np.argmax(bracket)), int(np.argmin(bracket))}:
            rows.append(
                {
                    "part": int(g["part"].iloc[0]),
                    "v": float(uv[i]),
                    "bracket": int(bracket[i]),
                }
            )
        out = pd.DataFrame(rows)
        out["na_p"] = np.int64(int(da.sum()))
        out["nb_p"] = np.int64(int(db.sum()))
        for c in ("part", "bracket", "na_p", "nb_p"):
            out[c] = out[c].astype("int64")
        return out

    parts = typed_collect(
        prepared.map_batches(assign, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_cands, batch_format="pandas"),
        pa.schema(
            [
                ("part", pa.int64()),
                ("v", pa.float64()),
                ("bracket", pa.int64()),
                ("na_p", pa.int64()),
                ("nb_p", pa.int64()),
            ]
        ),
    )
    if len(parts) == 0:
        return empty
    parts = parts.sort_values(["part", "v"]).reset_index(drop=True)
    off = (
        parts.groupby("part", as_index=False)[["na_p", "nb_p"]]
        .first()
        .sort_values("part")
    )
    off["offa"] = off["na_p"].cumsum() - off["na_p"]
    off["offb"] = off["nb_p"].cumsum() - off["nb_p"]
    shift = {
        int(r.part): n_b * int(r.offa) - n_a * int(r.offb)
        for r in off.itertuples()
    }
    best_dn, best_v = -1, None
    for r in parts.itertuples():
        dn = abs(int(r.bracket) + shift[int(r.part)])
        if dn > best_dn or (dn == best_dn and r.v < best_v):
            best_dn, best_v = dn, float(r.v)
    return pd.DataFrame(
        {
            "n_a": pd.Series([n_a], dtype="int64"),
            "n_b": pd.Series([n_b], dtype="int64"),
            "d_num": pd.Series([best_dn], dtype="int64"),
            "ks_d": pd.Series(
                [float(best_dn) / float(n_a * n_b)], dtype="float64"
            ),
            "at_value": pd.Series([best_v], dtype="float64"),
        }
    )


def q_welch_ab(sf_dir: str):
    """Welch's unequal-variance t-test — purchase vs click `value` — the
    A/B-test readout computed from MERGEABLE moment digests, never a
    collect of the samples: each block reduces to (n, Σc, Σc²) per group
    on the exact cents grid (ROUND half-away ×100, the money
    convention), the driver folds the per-block rows as Python ints
    (3 ints per block of driver traffic, ZERO exchanges — the
    q_group_moments digest plan with the q_auc object-int fold so Σc²
    cannot overflow at any corpus size).

    The reported t / Welch–Satterthwaite df are the SAME IEEE expression
    chain on the same exact integers in engine and oracle (squares as
    x·x, sqrt is correctly rounded in both) — bit-identical, no rounding
    step.  Zero pooled variance ⇒ t/df NULL on both sides.  NULL/NaN
    values are excluded like q_ks_test; groups need n ≥ 2 (sample
    variance) or the result is the typed empty frame.  The reported
    digest columns saturate int64 at ~9×10¹¹ rows × TPC-H magnitudes
    (the internal fold is unbounded; the oracle CASTs through HUGEINT)."""
    empty = pd.DataFrame(
        {
            "n_a": pd.Series([], dtype="int64"),
            "n_b": pd.Series([], dtype="int64"),
            "sum_a_cents": pd.Series([], dtype="int64"),
            "sum_b_cents": pd.Series([], dtype="int64"),
            "ss_a_cents2": pd.Series([], dtype="int64"),
            "ss_b_cents2": pd.Series([], dtype="int64"),
            "mean_a": pd.Series([], dtype="float64"),
            "mean_b": pd.Series([], dtype="float64"),
            "t_stat": pd.Series([], dtype="float64"),
            "df_welch": pd.Series([], dtype="float64"),
        }
    )
    ds = _read(
        sf_dir, "events", ["event_type", "value"], rows_per_block=500_000
    )

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        et = t.column("event_type")
        ok = pc.is_valid(t.column("value")).to_numpy(zero_copy_only=False) & ~np.isnan(v)
        rows = {"grp": [], "n": [], "s": [], "ss": []}
        for grp, tname in (("a", "purchase"), ("b", "click")):
            m = ok & pc.fill_null(pc.equal(et, tname), False).to_numpy(
                zero_copy_only=False
            )
            c = round_half_away(v[m] * 100.0, 0).astype(np.int64)
            if len(c) and int(np.abs(c).max()) > 3_000_000_000:
                raise RuntimeError(
                    "q_welch_ab: |cents| > 3e9 — c² leaves int64; rescale "
                    "the grid a decade for this corpus"
                )
            rows["grp"].append(grp)
            rows["n"].append(len(c))
            rows["s"].append(int(c.sum()))
            # per-element c*c is int64-safe under the guard; the SUM is
            # folded exactly (object ints) like q_auc's u2
            rows["ss"].append(str(int((c * c).astype(object).sum()) if len(c) else 0))
        return pa.table(
            {
                "grp": pa.array(rows["grp"], pa.string()),
                "n": pa.array(rows["n"], pa.int64()),
                "s": pa.array(rows["s"], pa.int64()),
                "ss": pa.array(rows["ss"], pa.string()),
            }
        )

    agg = {"a": [0, 0, 0], "b": [0, 0, 0]}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pandas"
    ):
        for r in b.itertuples():
            agg[r.grp][0] += int(r.n)
            agg[r.grp][1] += int(r.s)
            agg[r.grp][2] += int(r.ss)
    (na, sa, ssa), (nb, sb, ssb) = agg["a"], agg["b"]
    if na < 2 or nb < 2:
        return empty
    fna, fnb = float(na), float(nb)
    va = (float(ssa) - float(sa) * float(sa) / fna) / float(na - 1)
    vb = (float(ssb) - float(sb) * float(sb) / fnb) / float(nb - 1)
    ua, ub = va / fna, vb / fnb
    if ua + ub == 0.0:
        t_stat, dfw = np.nan, np.nan
    else:
        t_stat = (float(sa) / fna - float(sb) / fnb) / np.sqrt(ua + ub)
        dfw = ((ua + ub) * (ua + ub)) / (
            ua * ua / float(na - 1) + ub * ub / float(nb - 1)
        )
    return pd.DataFrame(
        {
            "n_a": pd.Series([na], dtype="int64"),
            "n_b": pd.Series([nb], dtype="int64"),
            "sum_a_cents": pd.Series([sa], dtype="int64"),
            "sum_b_cents": pd.Series([sb], dtype="int64"),
            "ss_a_cents2": pd.Series([ssa], dtype="int64"),
            "ss_b_cents2": pd.Series([ssb], dtype="int64"),
            "mean_a": pd.Series([float(sa) / fna / 100.0], dtype="float64"),
            "mean_b": pd.Series([float(sb) / fnb / 100.0], dtype="float64"),
            "t_stat": pd.Series([t_stat], dtype="float64"),
            "df_welch": pd.Series([dfw], dtype="float64"),
        }
    )


# above this many forward edges the composite-array broadcast regime in
# _triangle_finish yields to the pair-hash exchange regime
TRI_BROADCAST_MAX_EDGES = 8_000_000


def q_triangle_count(sf_dir: str, stage_dir: str = None):
    """Exact triangle counting over the UNIPARTITE part co-purchase graph
    (edges = distinct part pairs sharing an order) — the closed-wedge
    companion to q_butterfly_count's bipartite 4-cycles, and the
    standard graph-density primitive (global clustering coefficient).

    Plan — degree orientation (the classic O(m^1.5) bound, Chiba &
    Nishizeki 1985 / Suri & Vassilvitskii's MR-triangles):
      1. `_basket_pair_partials` reduces baskets to the exact distinct
         edge stream (a < b) — one bucketed exchange;
      2. degrees reduce per-block (+`_two_regime_sum`); the degree table
         is CATALOG-order (one row per part ever co-purchased), so it
         drives n_vertices / Σ C(d,2) on the driver and broadcasts as
         the orientation rank — the same dimension-table broadcast as
         the butterfly side pick (a web-scale general graph would rank
         via two hash joins instead; parts are a dimension);
      3. each edge orients low-rank → high-rank (rank = (deg, id)), so
         forward out-degrees are ~√(2m)-bounded and the wedge expansion
         (source-hash buckets, vectorized triu per source over RANK-
         sorted neighbors) emits candidate closing pairs already in
         forward orientation;
      4. candidates pre-reduce per block, then ONE pair-hash bucketed
         exchange co-locates candidate counts with the forward edge set
         (kind-tagged union — membership by exact pandas merge, never a
         hash set: a 64-bit mix collision would miscount) and each
         bucket folds to a single triangle-count integer.
    All counts exact ints; clustering = double(3T)/double(W), the single
    IEEE division, NULL when the graph has no wedge (both sides)."""
    import tempfile

    import ray

    from .sizing import shuffle_partitions
    from .staging import stage_checkpoint

    zero = pd.DataFrame(
        {
            "n_vertices": pd.Series([0], dtype="int64"),
            "n_edges": pd.Series([0], dtype="int64"),
            "n_wedges": pd.Series([0], dtype="int64"),
            "n_triangles": pd.Series([0], dtype="int64"),
            "clustering": pd.Series([np.nan], dtype="float64"),
        }
    )
    red, n_li = _basket_pair_partials(sf_dir)
    tmp = None
    if stage_dir is None:
        tmp = stage_dir = tempfile.mkdtemp(prefix="pdfray_tri_")
    try:
        # the edge table is of PAIR order (corpus-proportional): parquet
        # stage checkpoint, never an object-store materialize — its three
        # consumers (degrees, orientation, edge membership) each stream a
        # fresh read; a crashed run resumes at the boundary
        edges = stage_checkpoint(
            lambda: red.map_batches(
                lambda t: t.select(["a", "b"]), batch_format="pyarrow"
            ),
            os.path.join(stage_dir, "edges"),
            allow_empty=True,
        )
        if edges is None:
            return zero
        return _triangle_finish(edges)
    finally:
        if tmp is not None:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)


def _triangle_finish(edges):
    import ray

    from .sizing import shuffle_partitions

    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate(
            [
                t.column("a").to_numpy(zero_copy_only=False),
                t.column("b").to_numpy(zero_copy_only=False),
            ]
        )
        uv, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {
                "v": pa.array(uv.astype(np.int64)),
                "d": pa.array(cnt.astype(np.int64)),
            }
        )

    dred, _ = _two_regime_sum(
        edges.map_batches(deg_partial, batch_format="pyarrow"),
        ["v"],
        ["d"],
        empty_types={"v": pa.int64()},
    )
    deg = typed_collect(
        dred, pa.schema([("v", pa.int64()), ("d", pa.int64())])
    ).sort_values("v")
    n_vertices = len(deg)
    dvals = deg["d"].to_numpy(np.int64)
    n_wedges = int((dvals * (dvals - 1) // 2).sum()) if n_vertices else 0
    n_edges = int(dvals.sum()) // 2 if n_vertices else 0
    if n_edges == 0:
        return pd.DataFrame(
            {
                "n_vertices": pd.Series([0], dtype="int64"),
                "n_edges": pd.Series([0], dtype="int64"),
                "n_wedges": pd.Series([0], dtype="int64"),
                "n_triangles": pd.Series([0], dtype="int64"),
                "clustering": pd.Series([np.nan], dtype="float64"),
            }
        )
    vref = ray.put(
        (deg["v"].to_numpy(np.int64), dvals)
    )  # rank lookup: searchsorted on the sorted vertex ids

    n_buckets = shuffle_partitions(n_edges)

    class _Orient:
        def __init__(self):
            self.v, self.d = ray.get(vref)

        def rank(self, x):
            # total order (deg, id) as positions in the lexsorted table
            i = np.searchsorted(self.v, x)
            return self.d[i], x

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            da, _ = self.rank(a)
            db, _ = self.rank(b)
            a_first = (da < db) | ((da == db) & (a < b))
            s = np.where(a_first, a, b).astype(np.int64)
            tt = np.where(a_first, b, a).astype(np.int64)
            mixed = s.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            return pa.table(
                {
                    "s": pa.array(s),
                    "t": pa.array(tt),
                    "sb": pa.array(
                        (mixed % np.uint64(n_buckets)).astype(np.int64)
                    ),
                }
            )

    # fwd is consumed twice (wedge expansion + edge membership); the
    # orient map is cheap per batch, so each consumer re-runs it over a
    # fresh checkpoint read instead of pinning an object-store copy
    fwd = edges.map_batches(
        warm_factory(("tri_orient", vref.hex()), _Orient),
        batch_format="pyarrow",
    )

    def _wedge_pairs(g: pd.DataFrame, v_sorted, d_sorted):
        """Vectorized forward-wedge expansion for one source-hash bucket:
        neighbors sorted by RANK (deg, id) within each source so triu
        pairs come out already forward-oriented.  Returns (x, y) arrays."""
        s = g["s"].to_numpy(np.int64)
        t = g["t"].to_numpy(np.int64)
        dt = d_sorted[np.searchsorted(v_sorted, t)]
        order = np.lexsort((t, dt, s))
        s, t = s[order], t[order]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]]) if len(s) else []
        sizes = (
            np.diff(np.r_[starts, len(s)]) if len(s) else np.empty(0, np.int64)
        )
        outs_x, outs_y = [], []
        for st, n in zip(starts, sizes):
            if n < 2:
                continue
            nbrs = t[st : st + n]
            i, j = np.triu_indices(n, k=1)
            outs_x.append(nbrs[i])
            outs_y.append(nbrs[j])
        if not outs_x:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(outs_x), np.concatenate(outs_y)

    if n_edges <= TRI_BROADCAST_MAX_EDGES:
        # broadcast regime: the forward edge set rides ray.put ONCE as a
        # sorted COMPOSITE array (vertex ids compressed to [0, nv) by
        # searchsorted — exact, collision-free, ix*nv+iy < nv² < 2^63)
        # and every expansion task counts its closing pairs inline with
        # one np.searchsorted — candidates never leave the worker and
        # the second exchange disappears.  The co-purchase graph of a
        # catalog dimension is bounded-degree, so the edge set is
        # dimension-order; a web-scale general graph crosses the bound
        # and takes the exchange regime below.
        assert n_vertices < 3_000_000_000, "composite key would overflow"
        fdf = typed_collect(
            fwd.map_batches(
                lambda t: t.select(["s", "t"]), batch_format="pyarrow"
            ),
            pa.schema([("s", pa.int64()), ("t", pa.int64())]),
        )
        vs = deg["v"].to_numpy(np.int64)
        comp = np.sort(
            np.searchsorted(vs, fdf["s"].to_numpy(np.int64)) * np.int64(n_vertices)
            + np.searchsorted(vs, fdf["t"].to_numpy(np.int64))
        )
        eref = ray.put(comp)

        class _ExpandCount:
            def __init__(self):
                self.v, self.d = ray.get(vref)
                self.e = ray.get(eref)

            def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
                x, y = _wedge_pairs(g, self.v, self.d)
                if len(x) == 0:
                    return pd.DataFrame({"tri": pd.Series([0], dtype="int64")})
                cand = np.searchsorted(self.v, x) * np.int64(
                    len(self.v)
                ) + np.searchsorted(self.v, y)
                pos = np.searchsorted(self.e, cand)
                pos = np.minimum(pos, len(self.e) - 1)
                hits = int((self.e[pos] == cand).sum())
                return pd.DataFrame({"tri": pd.Series([hits], dtype="int64")})

        folds = typed_collect(
            fwd.groupby("sb").map_groups(
                warm_factory(("tri_expcnt", vref.hex()), _ExpandCount),
                batch_format="pandas",
            ),
            pa.schema([("tri", pa.int64())]),
        )
        n_tri = int(folds["tri"].sum())
        return _triangle_frame(n_vertices, n_edges, n_wedges, n_tri)

    class _Expand:
        def __init__(self):
            self.v, self.d = ray.get(vref)

        def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
            x, y = _wedge_pairs(g, self.v, self.d)
            if len(x) == 0:
                return pd.DataFrame(
                    {
                        "x": pd.Series([], dtype="int64"),
                        "y": pd.Series([], dtype="int64"),
                        "c": pd.Series([], dtype="int64"),
                    }
                )
            out = (
                pd.DataFrame({"x": x, "y": y})
                .groupby(["x", "y"], as_index=False)
                .size()
                .rename(columns={"size": "c"})
            )
            return out.astype({"x": "int64", "y": "int64", "c": "int64"})

    def pair_bucket(t: pa.Table, kind: int) -> pa.Table:
        x = t.column("x" if kind else "s").to_numpy(zero_copy_only=False)
        y = t.column("y" if kind else "t").to_numpy(zero_copy_only=False)
        z = x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) ^ (
            y.astype(np.uint64) + np.uint64(0x85EBCA77C2B2AE63)
        )
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = z ^ (z >> np.uint64(31))
        return pa.table(
            {
                "x": pa.array(x.astype(np.int64)),
                "y": pa.array(y.astype(np.int64)),
                "c": (
                    t.column("c")
                    if kind
                    else pa.array(np.zeros(len(t), np.int64))
                ),
                "kind": pa.array(np.full(len(t), kind, np.int64)),
                "pb": pa.array((z % np.uint64(n_buckets)).astype(np.int64)),
            }
        )

    cands = (
        fwd.groupby("sb")
        .map_groups(
            warm_factory(("tri_expand", vref.hex()), _Expand),
            batch_format="pandas",
        )
        .map_batches(lambda t: pair_bucket(t, 1), batch_format="pyarrow")
    )
    edge_rows = fwd.map_batches(
        lambda t: pair_bucket(t, 0), batch_format="pyarrow"
    )

    def close_fold(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["kind"] == 0][["x", "y"]].drop_duplicates()
        c = g[g["kind"] == 1].groupby(["x", "y"], as_index=False)["c"].sum()
        m = c.merge(e, on=["x", "y"], how="inner")
        return pd.DataFrame(
            {"tri": pd.Series([int(m["c"].sum())], dtype="int64")}
        )

    folds = typed_collect(
        cands.union(edge_rows).groupby("pb").map_groups(
            close_fold, batch_format="pandas"
        ),
        pa.schema([("tri", pa.int64())]),
    )
    n_tri = int(folds["tri"].sum())
    return _triangle_frame(n_vertices, n_edges, n_wedges, n_tri)


def _triangle_frame(n_vertices, n_edges, n_wedges, n_tri) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "n_vertices": pd.Series([n_vertices], dtype="int64"),
            "n_edges": pd.Series([n_edges], dtype="int64"),
            "n_wedges": pd.Series([n_wedges], dtype="int64"),
            "n_triangles": pd.Series([n_tri], dtype="int64"),
            "clustering": pd.Series(
                [
                    float(3 * n_tri) / float(n_wedges)
                    if n_wedges > 0
                    else np.nan
                ],
                dtype="float64",
            ),
        }
    )


def q_chi2_independence(sf_dir: str):
    """Chi-square test of independence between event_type and the SIGN of
    `value` (neg / zero / pos — the one bucketing no float boundary can
    blur) — the column-dependence audit a profiler runs before assuming
    two features are unrelated.

    Exactness: observed counts and both margins are integers from one
    combiner-reduced exchange; expected values and per-cell terms are
    reported on the ×1e6 integer micro-grid (ROUND half-away of the same
    IEEE expression both sides — the Benford convention), so the
    chi2 TOTAL is an ORDER-FREE integer sum of the per-cell terms.
    DuckDB's list_sum/SUM over doubles is NOT a plain left-to-right fold
    (probe-measured: pairwise — a float total would be
    implementation-defined), which is exactly why the grid exists.

    The grid is the FULL cross product of observed row types × observed
    sign buckets (absent combinations count 0), so every expected value
    is > 0 by construction.  NULL/NaN values are excluded on both sides.
    Scale shape: per-block (type, bucket) bincount partials →
    `_two_regime_sum` → a driver fold over the tiny types×3 table."""
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "bucket": pd.Series([], dtype=object),
            "observed": pd.Series([], dtype="int64"),
            "row_total": pd.Series([], dtype="int64"),
            "col_total": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "expected_x1e6": pd.Series([], dtype="int64"),
            "term_x1e6": pd.Series([], dtype="int64"),
            "chi2_total_x1e6": pd.Series([], dtype="int64"),
        }
    )
    ds = _read(
        sf_dir, "events", ["event_type", "value"], rows_per_block=500_000
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        ok = df["value"].notna().to_numpy() & ~np.isnan(v)
        b = np.where(v < 0, "neg", np.where(v > 0, "pos", "zero"))
        out = (
            pd.DataFrame({"t": df["event_type"].to_numpy()[ok], "b": b[ok]})
            .groupby(["t", "b"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )
        out["c"] = out["c"].astype("int64")
        return out

    red, _ = _two_regime_sum(
        ds.map_batches(partial, batch_format="pandas"), ["t", "b"], ["c"]
    )
    o = typed_collect(
        red,
        pa.schema([("t", pa.string()), ("b", pa.string()), ("c", pa.int64())]),
    )
    if len(o) == 0:
        return empty
    o = o.groupby(["t", "b"], as_index=False)["c"].sum()
    rows_ = o.groupby("t")["c"].sum()
    cols_ = o.groupby("b")["c"].sum()
    n = int(o["c"].sum())
    omap = {(r.t, r.b): int(r.c) for r in o.itertuples()}
    recs = []
    for t in sorted(rows_.index):
        for b in sorted(cols_.index):
            obs = omap.get((t, b), 0)
            r, cc = int(rows_[t]), int(cols_[b])
            e = float(r) * float(cc) / float(n)
            od = float(obs)
            recs.append(
                {
                    "event_type": t,
                    "bucket": b,
                    "observed": obs,
                    "row_total": r,
                    "col_total": cc,
                    "n": n,
                    "expected_x1e6": int(
                        round_half_away(np.array([e * 1000000]), 0)[0]
                    ),
                    "term_x1e6": int(
                        round_half_away(
                            np.array([(od - e) * (od - e) / e * 1000000]), 0
                        )[0]
                    ),
                }
            )
    out = pd.DataFrame(recs)
    out["chi2_total_x1e6"] = int(out["term_x1e6"].sum())
    for c in (
        "observed",
        "row_total",
        "col_total",
        "n",
        "expected_x1e6",
        "term_x1e6",
        "chi2_total_x1e6",
    ):
        out[c] = out[c].astype("int64")
    return out.sort_values(["event_type", "bucket"]).reset_index(drop=True)


def q_mor_deletes(sf_dir: str, store_dir: str = None):
    """Merge-on-read positional deletes — the Iceberg-v2 delete-file
    protocol (pipelines/snapshots.py): snapshot 1 commits the orders
    table as immutable data files; snapshot 2 resolves a GDPR-style
    erasure (customers with o_custkey % 97 == 0 — remainder-ZERO is
    convention-independent, so numpy floor-mod and SQL trunc-mod agree
    for any sign) to PER-DATA-FILE positional delete files; the read
    then applies deletes by position only (one task per data file, each
    touching exactly its companion delete file — no broadcast, no join,
    no predicate re-evaluation).  The rollup over the merged view is the
    driver-checked result; the resume test pins that a committed store
    ignores later source mutations (reads come from files + positions,
    never the predicate).

    Exactness: counts and cents sums are integers end to end
    (`_two_regime_sum` over per-block partials)."""
    import tempfile

    from .snapshots import (
        commit_position_deletes,
        commit_snapshot,
        read_merged,
    )

    empty = pd.DataFrame(
        {
            "o_orderpriority": pd.Series([], dtype=object),
            "n_orders": pd.Series([], dtype="int64"),
            "sum_cents": pd.Series([], dtype="int64"),
        }
    )
    tmp = None
    if store_dir is None:
        tmp = store_dir = tempfile.mkdtemp(prefix="pdfray_mor_")
    try:
        commit_snapshot(
            store_dir,
            1,
            lambda: _read(
                sf_dir,
                "orders",
                [
                    "o_orderkey",
                    "o_custkey",
                    "o_orderstatus",
                    "o_totalprice",
                    "o_orderpriority",
                ],
                rows_per_block=100_000,
            ),
        )

        def erase_mask(t: pa.Table):
            c = t.column("o_custkey").to_numpy(zero_copy_only=False)
            return np.mod(c, 97) == 0

        commit_position_deletes(store_dir, 2, 1, erase_mask)
        merged = read_merged(store_dir, 2)
        return _mor_rollup(merged, empty)
    finally:
        if tmp is not None:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)


def q_mor_compaction(sf_dir: str, store_dir: str = None):
    """Compaction + vacuum of the merge-on-read store
    (snapshots.compact/vacuum): snapshot 3 REWRITES the merged view
    (deletes applied) into fresh data files shadowing snapshots 1-2;
    vacuum then reclaims the shadowed directories (manifest entry first,
    directory second — a crash between the two leaves only orphans,
    which readers never see).  The rollup over the compacted store must
    equal q_mor_deletes' merge-on-read answer — compaction is
    read-equivalence by definition, so the two queries share one oracle
    (the t_delta_dedup_bloom aliasing precedent)."""
    import tempfile

    from .snapshots import (
        commit_position_deletes,
        commit_snapshot,
        compact,
        read_merged,
        vacuum,
    )

    empty = pd.DataFrame(
        {
            "o_orderpriority": pd.Series([], dtype=object),
            "n_orders": pd.Series([], dtype="int64"),
            "sum_cents": pd.Series([], dtype="int64"),
        }
    )
    tmp = None
    if store_dir is None:
        tmp = store_dir = tempfile.mkdtemp(prefix="pdfray_morc_")
    try:
        commit_snapshot(
            store_dir,
            1,
            lambda: _read(
                sf_dir,
                "orders",
                [
                    "o_orderkey",
                    "o_custkey",
                    "o_orderstatus",
                    "o_totalprice",
                    "o_orderpriority",
                ],
                rows_per_block=100_000,
            ),
        )

        def erase_mask(t: pa.Table):
            c = t.column("o_custkey").to_numpy(zero_copy_only=False)
            return np.mod(c, 97) == 0

        commit_position_deletes(store_dir, 2, 1, erase_mask)
        compact(store_dir, 3, 2)
        vacuum(store_dir)
        return _mor_rollup(read_merged(store_dir, 3), empty)
    finally:
        if tmp is not None:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)


def _mor_rollup(merged, empty: pd.DataFrame) -> pd.DataFrame:
    if merged is None:
        return empty

    def partial(t: pa.Table) -> pa.Table:
        cents = round_half_away(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0,
            0,
        ).astype(np.int64)
        tt = pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "n_orders": pa.array(np.ones(len(t), np.int64)),
                "sum_cents": pa.array(cents),
            }
        )
        g = tt.group_by("o_orderpriority").aggregate(
            [("n_orders", "sum"), ("sum_cents", "sum")]
        )
        return g.rename_columns(["o_orderpriority", "n_orders", "sum_cents"])

    red, _ = _two_regime_sum(
        merged.map_batches(partial, batch_format="pyarrow"),
        ["o_orderpriority"],
        ["n_orders", "sum_cents"],
    )
    out = typed_collect(
        red,
        pa.schema(
            [
                ("o_orderpriority", pa.string()),
                ("n_orders", pa.int64()),
                ("sum_cents", pa.int64()),
            ]
        ),
    )
    if len(out) == 0:
        return empty
    out = out.groupby("o_orderpriority", as_index=False)[
        ["n_orders", "sum_cents"]
    ].sum()
    for c in ("n_orders", "sum_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


BITMAP_CHUNK_KEYS = 4096  # orderkeys per bitmap chunk (fixed, SQL-derivable)


def q_bitmap_index(sf_dir: str):
    """Chunked BITMAP INDEX over low-cardinality lineitem columns — the
    warehouse access-path primitive: one packed bit per row per (column,
    value), predicates evaluated as machine-word AND/OR + popcount
    instead of row scans.

    Chunking is the SQL-derivable fixed grid l_orderkey // 4096 (a
    sampled range plan would balance better but its boundaries are not
    oracle-replayable; chunks here are block-sized by key density —
    TPC-H orderkeys are dense — and a hot chunk only means a longer
    bitmap, never wrong bits).  Within a chunk, bit i = the i-th row in
    (l_orderkey, l_linenumber) order — layout-invariant.  Each chunk
    group REALLY builds the packed uint64 bitmaps (np.packbits) for
    returnflag='R' and linestatus='F', then answers the conjunctive /
    disjunctive predicates by bitwise AND/OR + popcount; the reported
    counts must therefore equal the oracle's logical counts row-for-row
    — any packing, ordering, or padding bug shows up as count drift.
    bitmap_bytes pins the (n+63)//64*8 word-padding arithmetic.

    Scale shape: ONE chunk-keyed exchange; every chunk reduces to a
    7-integer row; the bitmaps live only inside their task (a persisted
    index would write them per chunk, the natural extension)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"],
        rows_per_block=100_000,
    )

    def add_chunk(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        return t.append_column(
            "chunk", pa.array((o // BITMAP_CHUNK_KEYS).astype(np.int64))
        )

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["l_orderkey", "l_linenumber"], kind="mergesort")
        n = len(g)
        r_bits = (g["l_returnflag"].to_numpy() == "R")
        f_bits = (g["l_linestatus"].to_numpy() == "F")
        # real packed bitmaps: np.packbits -> pad to whole uint64 words
        words = (n + 63) // 64
        def pack(bits):
            raw = np.packbits(bits, bitorder="little")
            buf = np.zeros(words * 8, dtype=np.uint8)
            buf[: len(raw)] = raw
            return buf.view(np.uint64)
        bm_r, bm_f = pack(r_bits), pack(f_bits)
        pop = (
            lambda w: int(np.bitwise_count(w).sum())
            if hasattr(np, "bitwise_count")
            else int(np.unpackbits(w.view(np.uint8)).sum())
        )
        return pd.DataFrame(
            {
                "chunk": pd.Series([int(g["chunk"].iloc[0])], dtype="int64"),
                "n_rows": pd.Series([n], dtype="int64"),
                "bitmap_bytes": pd.Series([words * 8], dtype="int64"),
                "n_flag_r": pd.Series([pop(bm_r)], dtype="int64"),
                "n_status_f": pd.Series([pop(bm_f)], dtype="int64"),
                "n_and": pd.Series([pop(bm_r & bm_f)], dtype="int64"),
                "n_or": pd.Series([pop(bm_r | bm_f)], dtype="int64"),
            }
        )

    out = typed_collect(
        ds.map_batches(add_chunk, batch_format="pyarrow")
        .groupby("chunk")
        .map_groups(build, batch_format="pandas"),
        pa.schema(
            [
                ("chunk", pa.int64()),
                ("n_rows", pa.int64()),
                ("bitmap_bytes", pa.int64()),
                ("n_flag_r", pa.int64()),
                ("n_status_f", pa.int64()),
                ("n_and", pa.int64()),
                ("n_or", pa.int64()),
            ]
        ),
    )
    return out.sort_values("chunk").reset_index(drop=True)


OVL_WINDOW_US = 3_600_000_000  # incident half-window (1h each side)
OVL_CHUNK_US = 6 * 3_600_000_000  # band-replication chunk width


def q_interval_overlap_join(sf_dir: str):
    """INTERVAL × INTERVAL overlap join — per-(user, day) activity spans
    [min ts, max ts] against global incident windows (every 'error'
    event ± 1h): how many incident windows touch each user-day — the
    missing member of the join family (range join = point-in-window,
    SCD2 = non-overlapping as-of; genuine overlap needs both endpoints
    on both sides).

    Plan — band replication with OWNER-CHUNK counting (no global dedup):
    both interval sets replicate to every OVL_CHUNK_US time chunk they
    touch (windows span ≤ 2 chunks, spans ≤ ~5); a pair is counted
    exactly once, in the chunk holding max(s1, s2) — the intersection
    start, which both sides provably touch.  Inside a chunk the count is
    two vectorized searchsorted differences, split by who starts first:
      s2 ≤ s1 (counted in s1's owner chunk): #(s2 ≤ s1) − #(e2 < s1)
      s1 < s2 ≤ e1 (counted in s2's own chunk): prefix-rank difference
        over the chunk-local window starts (no e2 test needed — a window
        starting inside the span overlaps it by definition).
    The owner chunk emits every span's row (count 0 included), partials
    merge by `_two_regime_sum` keyed on the whole span tuple.  A hot
    chunk is one task's O((n_s+n_w)·log n_w) searchsorted, never a pair
    loop.  All endpoints closed, all arithmetic int64 microseconds."""
    day_us = np.int64(86_400_000_000)
    W = np.int64(OVL_CHUNK_US)
    ds = _read(
        sf_dir, "events", ["user_id", "ts", "event_type"], rows_per_block=500_000
    )

    def span_partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].astype("int64").to_numpy()
        out = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(), "day": ts // day_us, "ts": ts}
        )
        g = out.groupby(["user_id", "day"], as_index=False).agg(
            ns1=("ts", lambda x: -x.min()), e1=("ts", "max")
        )
        # mixed min/max through ONE max-merge: s1 rides negated
        for c in ("user_id", "day", "ns1", "e1"):
            g[c] = g[c].astype("int64")
        return g

    sred, _ = _two_regime_agg(
        ds.map_batches(span_partial, batch_format="pandas"),
        ["user_id", "day"],
        ["ns1", "e1"],
        "max",
        empty_types={"user_id": pa.int64(), "day": pa.int64()},
    )

    def span_replicate(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "chunk": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "day": pa.array([], pa.int64()),
                    "s1": pa.array([], pa.int64()),
                    "e1": pa.array([], pa.int64()),
                }
            )
        s1 = -t.column("ns1").to_numpy(zero_copy_only=False)
        e1 = t.column("e1").to_numpy(zero_copy_only=False)
        c0, c1 = s1 // W, e1 // W
        reps = (c1 - c0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s1)), reps)
        chunk = np.repeat(c0, reps) + (
            np.arange(len(idx)) - np.repeat(np.cumsum(reps) - reps, reps)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "chunk": pa.array(chunk.astype(np.int64)),
                "kind": pa.array(np.zeros(len(idx), np.int64)),
                "user_id": pa.array(u[idx].astype(np.int64)),
                "day": pa.array(d[idx].astype(np.int64)),
                "s1": pa.array(s1[idx].astype(np.int64)),
                "e1": pa.array(e1[idx].astype(np.int64)),
            }
        )

    def win_replicate(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        m = pc.fill_null(pc.equal(et, "error"), False).to_numpy(
            zero_copy_only=False
        )
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)[m]
        s2, e2 = ts - OVL_WINDOW_US, ts + OVL_WINDOW_US
        c0, c1 = s2 // W, e2 // W
        reps = (c1 - c0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s2)), reps)
        chunk = np.repeat(c0, reps) + (
            np.arange(len(idx)) - np.repeat(np.cumsum(reps) - reps, reps)
        )
        return pa.table(
            {
                "chunk": pa.array(chunk.astype(np.int64)),
                "kind": pa.array(np.ones(len(idx), np.int64)),
                "user_id": pa.array(np.zeros(len(idx), np.int64)),
                "day": pa.array(np.zeros(len(idx), np.int64)),
                "s1": pa.array(s2[idx].astype(np.int64)),
                "e1": pa.array(e2[idx].astype(np.int64)),
            }
        )

    def chunk_count(g: pd.DataFrame) -> pd.DataFrame:
        k = int(g["chunk"].iloc[0])
        sp = g[g["kind"] == 0]
        wn = g[g["kind"] == 1]
        if len(sp) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "day": pd.Series([], dtype="int64"),
                    "s1": pd.Series([], dtype="int64"),
                    "e1": pd.Series([], dtype="int64"),
                    "cnt": pd.Series([], dtype="int64"),
                }
            )
        s1 = sp["s1"].to_numpy(np.int64)
        e1 = sp["e1"].to_numpy(np.int64)
        sw_all = np.sort(wn["s1"].to_numpy(np.int64))
        ew_all = np.sort(wn["e1"].to_numpy(np.int64))
        own_w = wn[(wn["s1"].to_numpy(np.int64) // W) == k]
        sw_own = np.sort(own_w["s1"].to_numpy(np.int64))
        is_owner = (s1 // W) == k
        base = np.where(
            is_owner,
            np.searchsorted(sw_all, s1, side="right")
            - np.searchsorted(ew_all, s1, side="left"),
            0,
        )
        rng = np.searchsorted(sw_own, e1, side="right") - np.searchsorted(
            sw_own, s1, side="right"
        )
        cnt = (base + rng).astype(np.int64)
        keep = is_owner | (cnt > 0)
        out = pd.DataFrame(
            {
                "user_id": sp["user_id"].to_numpy(np.int64)[keep],
                "day": sp["day"].to_numpy(np.int64)[keep],
                "s1": s1[keep],
                "e1": e1[keep],
                "cnt": cnt[keep],
            }
        )
        return out

    parts = (
        sred.map_batches(span_replicate, batch_format="pyarrow")
        .union(ds.map_batches(win_replicate, batch_format="pyarrow"))
        .groupby("chunk")
        .map_groups(chunk_count, batch_format="pandas")
    )
    red, _ = _two_regime_sum(
        parts,
        ["user_id", "day", "s1", "e1"],
        ["cnt"],
        empty_types={
            "user_id": pa.int64(),
            "day": pa.int64(),
            "s1": pa.int64(),
            "e1": pa.int64(),
        },
    )
    out = typed_collect(
        red,
        pa.schema(
            [
                ("user_id", pa.int64()),
                ("day", pa.int64()),
                ("s1", pa.int64()),
                ("e1", pa.int64()),
                ("cnt", pa.int64()),
            ]
        ),
    )
    out = out.rename(columns={"s1": "span_start_us", "e1": "span_end_us", "cnt": "n_incidents"})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["user_id", "day"]).reset_index(drop=True)


def q_avro_roundtrip(sf_dir: str):
    """LOSSLESS Apache Avro round trip with decode-time column pruning:
    events streams through the distributed Avro sink
    (`sources.readers.write_avro_table` — one content-addressed
    deflate-codec ``.avro`` container per block, idempotent
    tmp+os.replace writes, encoded by the from-scratch codec in
    `core/avro.py`) and back through the one-task-per-container source
    pruning `props` at decode time (Avro rows are not seekable — the
    field is walked but never materialized).  Every value must then
    match the original parquet bit-for-bit (NaN/±inf/-0.0 doubles,
    unicode, negative timestamps all ride the fixture tests) — the
    row-oriented streaming-interchange leg of the format matrix
    (parquet / CSV / JSONL / WARC / WebDataset tar / IPC / ORC /
    Avro)."""
    import shutil
    import tempfile

    from ..sources.readers import read_avro_table, write_avro_table

    empty = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "ts_us": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype=object),
            "value": pd.Series([], dtype="float64"),
        }
    )
    out_dir = tempfile.mkdtemp(prefix="pdfray_avro_")
    try:
        write_avro_table(_read(sf_dir, "events"), out_dir)
        if not any(n.endswith(".avro") for n in os.listdir(out_dir)):
            return empty  # empty corpus wrote no files

        def digest(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "event_id": t.column("event_id"),
                    "ts_us": t.column("ts").cast(pa.int64()),
                    "user_id": t.column("user_id"),
                    "event_type": t.column("event_type"),
                    "value": t.column("value"),
                }
            )

        return (
            read_avro_table(
                out_dir,
                columns=["event_id", "ts", "user_id", "event_type", "value"],
            )
            .map_batches(digest, batch_format="pyarrow")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


STREAM_WM_DELAY_US = 2 * 3_600_000_000  # watermark lag behind max event time
STREAM_WIN_US = 3_600_000_000  # tumbling window width
STREAM_ARRIVAL_CHUNK = 8192  # event_ids per scan chunk (internal only)


def q_stream_tumbling_agg(sf_dir: str):
    """Tumbling-window streaming aggregation under a GLOBAL watermark —
    the out-of-order stream-processing semantics (Flink/Beam event-time
    windows) replayed deterministically over the stored stream: arrival
    order = event_id; before each arrival the watermark is
    max(earlier-arriving ts) − 2h; an event lands in its 1h event-time
    window iff that window is not yet FINALIZED (watermark < window
    end), else it is dropped late.  Per window: accepted and dropped
    counts — the at-most-once accounting a backfill must reproduce
    exactly to validate a streaming job.

    Plan — the associative-scan shape (q_max_drawdown / q_cusum family)
    on a GLOBAL sequence: pass 1 reduces (arrival-chunk → max ts)
    partials; the driver folds EXCLUSIVE incoming watermarks per chunk
    (chunks ordered by event_id — arrival order IS id order); pass 2
    re-scans with the tiny chunk→watermark map broadcast, computes each
    chunk's exclusive local prefix max vectorized, flags accept/drop,
    and emits per-(window) count partials merged by `_two_regime_sum`.
    All comparisons int64 microseconds; the chunk grid is internal (no
    SQL exposure, so floor-vs-truncate never arises for it)."""
    import ray

    chunk_w = np.int64(STREAM_ARRIVAL_CHUNK)
    win_w = np.int64(STREAM_WIN_US)
    empty = pd.DataFrame(
        {
            "window_start_us": pd.Series([], dtype="int64"),
            "n_accepted": pd.Series([], dtype="int64"),
            "n_dropped": pd.Series([], dtype="int64"),
        }
    )
    ds = _read(sf_dir, "events", ["event_id", "ts"], rows_per_block=500_000)

    def chunk_max(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ck = eid // chunk_w
        uv, inv = np.unique(ck, return_inverse=True)
        mx = np.full(len(uv), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, ts)
        return pa.table(
            {"chunk": pa.array(uv.astype(np.int64)), "mx": pa.array(mx)}
        )

    cm, _ = _two_regime_agg(
        ds.map_batches(chunk_max, batch_format="pyarrow"),
        ["chunk"],
        ["mx"],
        "max",
        empty_types={"chunk": pa.int64()},
    )
    cmdf = typed_collect(
        cm, pa.schema([("chunk", pa.int64()), ("mx", pa.int64())])
    ).sort_values("chunk")
    if len(cmdf) == 0:
        return empty
    # exclusive incoming max per chunk (arrival order == id order)
    run = np.iinfo(np.int64).min
    incoming = {}
    for r in cmdf.itertuples():
        incoming[int(r.chunk)] = run
        run = max(run, int(r.mx))
    inc_ref = ray.put(incoming)

    class _Flag:
        def __init__(self):
            self.inc = ray.get(inc_ref)

        def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("event_id", kind="mergesort")
            ts = g["ts"].astype("int64").to_numpy()
            n = len(ts)
            # exclusive local prefix max
            lpm = np.empty(n, np.int64)
            lpm[0] = np.iinfo(np.int64).min
            if n > 1:
                np.maximum.accumulate(ts[:-1], out=lpm[1:])
            inc = self.inc[int(g["chunk"].iloc[0])]
            wm_src = np.maximum(lpm, inc)
            win = np.floor_divide(ts, win_w)
            win_end = (win + 1) * win_w
            # watermark = prefix max − delay; window open iff wm < end
            # (sentinel rows masked BEFORE the subtraction so int64 min
            # cannot wrap)
            has_wm = wm_src != np.iinfo(np.int64).min
            safe = np.where(has_wm, wm_src, 0)
            dropped = has_wm & (safe - STREAM_WM_DELAY_US >= win_end)
            out = pd.DataFrame(
                {
                    "window_start_us": win * win_w,
                    "acc": (~dropped).astype(np.int64),
                    "drp": dropped.astype(np.int64),
                }
            )
            red = out.groupby("window_start_us", as_index=False)[
                ["acc", "drp"]
            ].sum()
            for c in ("window_start_us", "acc", "drp"):
                red[c] = red[c].astype("int64")
            return red

    def add_chunk(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "chunk", pa.array((eid // chunk_w).astype(np.int64))
        )

    parts = (
        ds.map_batches(add_chunk, batch_format="pyarrow")
        .groupby("chunk")
        .map_groups(
            warm_factory(("stream_wm", inc_ref.hex()), _Flag),
            batch_format="pandas",
        )
    )
    red, _ = _two_regime_sum(
        parts,
        ["window_start_us"],
        ["acc", "drp"],
        empty_types={"window_start_us": pa.int64()},
    )
    out = typed_collect(
        red,
        pa.schema(
            [
                ("window_start_us", pa.int64()),
                ("acc", pa.int64()),
                ("drp", pa.int64()),
            ]
        ),
    )
    out = out.groupby("window_start_us", as_index=False)[["acc", "drp"]].sum()
    out = out.rename(columns={"acc": "n_accepted", "drp": "n_dropped"})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("window_start_us").reset_index(drop=True)


T_CLOSENESS_DEN = 5  # breach threshold t = 1/5 = 0.2, as an exact rational


def q_t_closeness(sf_dir: str):
    """t-closeness audit — the third rung of the privacy ladder after
    q_k_anonymity and q_l_diversity: a QI group can be large AND diverse
    yet still leak if its sensitive-value DISTRIBUTION differs from the
    global one.  QI = (nation, market segment); sensitive = the account
    balance on the exact cents grid; distance = the ordered-domain Earth
    Mover's Distance t-closeness prescribes for numeric attributes:
    EMD = Σ_i |cumP_i − cumQ_i| / (m−1) over the m global support values.

    Exactness: every quantity is cleared of division — cumdiff_i =
    cum_g_i·n − cum_G_i·n_g is an exact integer (probabilities never
    materialize), emd_scaled = Σ|cumdiff| with denom = n_g·n·(m−1), the
    reported t is the single double division, and the breach flag is the
    integer cross-multiplication 5·emd_scaled > denom (t > 0.2) — no
    float ever enters a comparison.  Zero-count support values the group
    lacks still contribute (the grid is the GLOBAL support).  m == 1
    degenerates to t = 0 on both sides.  int64 bound: m·n_g·n must clear
    2^62 (guarded loudly; the oracle rides HUGEINT).

    Scale shape: one (QI, cents) combiner exchange; the global support
    is catalog-order (distinct balances) and folds on the driver; the
    per-group EMD is one vectorized pass per QI group (the QI domain is
    tiny) with the support broadcast."""
    import ray

    empty = pd.DataFrame(
        {
            "c_nationkey": pd.Series([], dtype="int64"),
            "c_mktsegment": pd.Series([], dtype=object),
            "n_rows": pd.Series([], dtype="int64"),
            "emd_scaled": pd.Series([], dtype="int64"),
            "denom": pd.Series([], dtype="int64"),
            "t_value": pd.Series([], dtype="float64"),
            "breach": pd.Series([], dtype="int64"),
        }
    )
    ds = _read(
        sf_dir,
        "customer",
        ["c_nationkey", "c_mktsegment", "c_acctbal"],
        rows_per_block=100_000,
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        cents = round_half_away(
            t.column("c_acctbal").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        tt = pa.table(
            {
                "nat": pc.cast(t.column("c_nationkey"), pa.int64()),
                "seg": t.column("c_mktsegment"),
                "sv": pa.array(cents),
                "n": pa.array(np.ones(len(t), np.int64)),
            }
        )
        g = tt.group_by(["nat", "seg", "sv"]).aggregate([("n", "sum")])
        return g.rename_columns(["nat", "seg", "sv", "n"])

    pairs, _ = _two_regime_sum(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["nat", "seg", "sv"],
        ["n"],
        empty_types={"nat": pa.int64(), "seg": pa.string(), "sv": pa.int64()},
    )

    def glob_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"sv": t.column("sv"), "gn": t.column("n")})
            .group_by("sv")
            .aggregate([("gn", "sum")])
        )
        return g.rename_columns(["sv", "gn"])

    gred, _ = _two_regime_sum(
        pairs.map_batches(glob_partial, batch_format="pyarrow"),
        ["sv"],
        ["gn"],
        empty_types={"sv": pa.int64()},
    )
    glob = typed_collect(
        gred, pa.schema([("sv", pa.int64()), ("gn", pa.int64())])
    )
    if len(glob) == 0:
        return empty
    glob = glob.groupby("sv", as_index=False)["gn"].sum().sort_values("sv")
    sv = glob["sv"].to_numpy(np.int64)
    gn = glob["gn"].to_numpy(np.int64)
    cG = np.cumsum(gn)
    n_total = int(cG[-1])
    m = len(sv)
    worst = m * n_total * n_total
    if worst >= (1 << 62):
        raise RuntimeError(
            "q_t_closeness: EMD bound exceeds int64 — move the fold to "
            "object ints for this corpus"
        )
    sref = ray.put((sv, cG))

    class _Emd:
        def __init__(self):
            self.sv, self.cG = ray.get(sref)

        def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
            cnt = np.zeros(len(self.sv), np.int64)
            idx = np.searchsorted(self.sv, g["sv"].to_numpy(np.int64))
            np.add.at(cnt, idx, g["n"].to_numpy(np.int64))
            ng = int(cnt.sum())
            cg = np.cumsum(cnt)
            emd = int(np.abs(cg * n_total - self.cG * ng).sum())
            denom = ng * n_total * (m - 1)
            t_val = float(emd) / float(denom) if m > 1 else 0.0
            breach = 1 if (m > 1 and T_CLOSENESS_DEN * emd > denom) else 0
            return pd.DataFrame(
                {
                    "c_nationkey": pd.Series(
                        [int(g["nat"].iloc[0])], dtype="int64"
                    ),
                    "c_mktsegment": pd.Series([g["seg"].iloc[0]]),
                    "n_rows": pd.Series([ng], dtype="int64"),
                    "emd_scaled": pd.Series(
                        [emd if m > 1 else 0], dtype="int64"
                    ),
                    "denom": pd.Series([denom], dtype="int64"),
                    "t_value": pd.Series([t_val], dtype="float64"),
                    "breach": pd.Series([breach], dtype="int64"),
                }
            )

    out = typed_collect(
        pairs.groupby(["nat", "seg"]).map_groups(
            warm_factory(("t_close", sref.hex()), _Emd),
            batch_format="pandas",
        ),
        pa.schema(
            [
                ("c_nationkey", pa.int64()),
                ("c_mktsegment", pa.string()),
                ("n_rows", pa.int64()),
                ("emd_scaled", pa.int64()),
                ("denom", pa.int64()),
                ("t_value", pa.float64()),
                ("breach", pa.int64()),
            ]
        ),
    )
    return out.sort_values(["c_nationkey", "c_mktsegment"]).reset_index(
        drop=True
    )


LINKPRED_TOP_K = 20


def q_link_prediction(sf_dir: str, stage_dir: str = None):
    """Common-neighbor / Jaccard link prediction over the FREQUENT
    co-purchase graph (edges = part pairs with support >=
    FREQ_PAIR_MINSUP, the q_frequent_pairs graph): for every NON-edge
    pair sharing at least one neighbor, score jaccard =
    common / (deg_a + deg_b − common) and report the global top-20 —
    the recommender primitive ("parts bought with the same things are
    substitutes").

    Plan: the frequent-edge stream parquet-checkpoints once (three
    consumers: degrees, adjacency expansion, edge membership);
    degrees broadcast (catalog-order, the q_triangle_count argument);
    FULL-adjacency wedge expansion in center-hash buckets (common
    neighbors need both directions — the oriented trick undercounts)
    pre-reduces per bucket; ONE pair-hash exchange co-locates wedge
    counts with the kind-tagged edge set, each bucket drops existing
    edges, scores its pairs, and emits only its LOCAL top-20 under the
    exact order (jd DESC, a, b) — the driver merges bucket top-20s.
    jd is the single double division on exact ints both sides; ties
    break on the pair, so the cut is deterministic at any layout."""
    import tempfile

    import ray

    from .sizing import shuffle_partitions
    from .staging import stage_checkpoint

    empty = pd.DataFrame(
        {
            "rank": pd.Series([], dtype="int64"),
            "part_a": pd.Series([], dtype="int64"),
            "part_b": pd.Series([], dtype="int64"),
            "common": pd.Series([], dtype="int64"),
            "deg_a": pd.Series([], dtype="int64"),
            "deg_b": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64"),
        }
    )
    red, n_li = _basket_pair_partials(sf_dir)
    tmp = None
    if stage_dir is None:
        tmp = stage_dir = tempfile.mkdtemp(prefix="pdfray_lp_")
    try:
        edges = stage_checkpoint(
            lambda: red.map_batches(
                lambda t: t.filter(
                    pc.greater_equal(t.column("c"), FREQ_PAIR_MINSUP)
                ).select(["a", "b"]),
                batch_format="pyarrow",
            ),
            os.path.join(stage_dir, "edges"),
            allow_empty=True,
        )
        if edges is None:
            return empty

        def deg_partial(t: pa.Table) -> pa.Table:
            v = np.concatenate(
                [
                    t.column("a").to_numpy(zero_copy_only=False),
                    t.column("b").to_numpy(zero_copy_only=False),
                ]
            )
            uv, cnt = np.unique(v, return_counts=True)
            return pa.table(
                {
                    "v": pa.array(uv.astype(np.int64)),
                    "d": pa.array(cnt.astype(np.int64)),
                }
            )

        dred, _ = _two_regime_sum(
            edges.map_batches(deg_partial, batch_format="pyarrow"),
            ["v"],
            ["d"],
            empty_types={"v": pa.int64()},
        )
        deg = typed_collect(
            dred, pa.schema([("v", pa.int64()), ("d", pa.int64())])
        ).sort_values("v")
        n_edges = int(deg["d"].sum()) // 2
        if n_edges == 0:
            return empty
        vref = ray.put(
            (deg["v"].to_numpy(np.int64), deg["d"].to_numpy(np.int64))
        )
        n_buckets = shuffle_partitions(n_edges)

        def adjacency(t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            ctr = np.concatenate([a, b]).astype(np.int64)
            leaf = np.concatenate([b, a]).astype(np.int64)
            mixed = ctr.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            return pa.table(
                {
                    "ctr": pa.array(ctr),
                    "leaf": pa.array(leaf),
                    "cb": pa.array(
                        (mixed % np.uint64(n_buckets)).astype(np.int64)
                    ),
                }
            )

        def expand(g: pd.DataFrame) -> pd.DataFrame:
            ctr = g["ctr"].to_numpy(np.int64)
            leaf = g["leaf"].to_numpy(np.int64)
            order = np.lexsort((leaf, ctr))
            ctr, leaf = ctr[order], leaf[order]
            starts = (
                np.flatnonzero(np.r_[True, ctr[1:] != ctr[:-1]])
                if len(ctr)
                else []
            )
            sizes = (
                np.diff(np.r_[starts, len(ctr)])
                if len(ctr)
                else np.empty(0, np.int64)
            )
            xs, ys = [], []
            for st, n in zip(starts, sizes):
                if n < 2:
                    continue
                nb = leaf[st : st + n]
                i, j = np.triu_indices(n, k=1)
                xs.append(nb[i])
                ys.append(nb[j])
            if not xs:
                return pd.DataFrame(
                    {
                        "x": pd.Series([], dtype="int64"),
                        "y": pd.Series([], dtype="int64"),
                        "c": pd.Series([], dtype="int64"),
                    }
                )
            out = (
                pd.DataFrame({"x": np.concatenate(xs), "y": np.concatenate(ys)})
                .groupby(["x", "y"], as_index=False)
                .size()
                .rename(columns={"size": "c"})
            )
            return out.astype({"x": "int64", "y": "int64", "c": "int64"})

        def pair_bucket(t: pa.Table, kind: int) -> pa.Table:
            x = t.column("x" if kind else "a").to_numpy(zero_copy_only=False)
            y = t.column("y" if kind else "b").to_numpy(zero_copy_only=False)
            z = x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) ^ (
                y.astype(np.uint64) + np.uint64(0x85EBCA77C2B2AE63)
            )
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = z ^ (z >> np.uint64(31))
            return pa.table(
                {
                    "x": pa.array(x.astype(np.int64)),
                    "y": pa.array(y.astype(np.int64)),
                    "c": (
                        t.column("c")
                        if kind
                        else pa.array(np.zeros(len(t), np.int64))
                    ),
                    "kind": pa.array(np.full(len(t), kind, np.int64)),
                    "pb": pa.array((z % np.uint64(n_buckets)).astype(np.int64)),
                }
            )

        class _Score:
            def __init__(self):
                self.v, self.d = ray.get(vref)

            def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
                e = g[g["kind"] == 0][["x", "y"]]
                c = (
                    g[g["kind"] == 1]
                    .groupby(["x", "y"], as_index=False)["c"]
                    .sum()
                )
                if len(e):
                    c = c.merge(e, on=["x", "y"], how="left", indicator=True)
                    c = c[c["_merge"] == "left_only"][["x", "y", "c"]]
                if len(c) == 0:
                    return pd.DataFrame(
                        {
                            "part_a": pd.Series([], dtype="int64"),
                            "part_b": pd.Series([], dtype="int64"),
                            "common": pd.Series([], dtype="int64"),
                            "deg_a": pd.Series([], dtype="int64"),
                            "deg_b": pd.Series([], dtype="int64"),
                            "jaccard": pd.Series([], dtype="float64"),
                        }
                    )
                x = c["x"].to_numpy(np.int64)
                y = c["y"].to_numpy(np.int64)
                cc = c["c"].to_numpy(np.int64)
                da = self.d[np.searchsorted(self.v, x)]
                db = self.d[np.searchsorted(self.v, y)]
                jd = cc.astype(np.float64) / (da + db - cc).astype(np.float64)
                order = np.lexsort((y, x, -jd))[:LINKPRED_TOP_K]
                return pd.DataFrame(
                    {
                        "part_a": x[order],
                        "part_b": y[order],
                        "common": cc[order],
                        "deg_a": da[order],
                        "deg_b": db[order],
                        "jaccard": jd[order],
                    }
                ).astype(
                    {
                        "part_a": "int64",
                        "part_b": "int64",
                        "common": "int64",
                        "deg_a": "int64",
                        "deg_b": "int64",
                        "jaccard": "float64",
                    }
                )

        cands = (
            edges.map_batches(adjacency, batch_format="pyarrow")
            .groupby("cb")
            .map_groups(expand, batch_format="pandas")
            .map_batches(lambda t: pair_bucket(t, 1), batch_format="pyarrow")
        )
        edge_rows = edges.map_batches(
            lambda t: pair_bucket(t, 0), batch_format="pyarrow"
        )
        local = typed_collect(
            cands.union(edge_rows)
            .groupby("pb")
            .map_groups(
                warm_factory(("lp_score", vref.hex()), _Score),
                batch_format="pandas",
            ),
            pa.schema(
                [
                    ("part_a", pa.int64()),
                    ("part_b", pa.int64()),
                    ("common", pa.int64()),
                    ("deg_a", pa.int64()),
                    ("deg_b", pa.int64()),
                    ("jaccard", pa.float64()),
                ]
            ),
        )
        if len(local) == 0:
            return empty
        local = local.sort_values(
            ["jaccard", "part_a", "part_b"], ascending=[False, True, True]
        ).head(LINKPRED_TOP_K)
        local = local.reset_index(drop=True)
        local.insert(
            0, "rank", np.arange(1, len(local) + 1, dtype=np.int64)
        )
        local["rank"] = local["rank"].astype("int64")
        return local
    finally:
        if tmp is not None:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)


def q_psi_drift(sf_dir: str):
    """Population Stability Index between alternating calendar weeks —
    the ML-ops drift gate: how far has the event-type mix moved between
    the even-week and odd-week halves of the stream?
    PSI = Σ_buckets (p_i − q_i)·ln(p_i/q_i) with add-1 smoothing over
    the union type vocabulary (so an absent bucket never produces
    ln(0)).

    Exactness: counts are integers from one tiny combiner exchange;
    per-bucket terms ride the ×1e9 half-away integer grid with the
    q_user_entropy two-sided safety argument — p ≠ q makes the term
    irrational (ln of a rational ≠ 1), so ulp noise cannot reach a grid
    boundary, and p == q is EXACTLY 0.0 on both sides; the expression
    shape is identical (smoothed ratios then one ln), and the PSI total
    is an ORDER-FREE integer sum of the per-bucket terms (the chi2
    lesson: a float SUM's accumulation order is implementation-defined).
    Week parity uses floor-mod on both sides (negative pre-epoch weeks
    included).

    Scale shape: per-block (type, parity) bincount partials →
    `_two_regime_sum` → a driver fold over the tiny 2×types table."""
    week_us = np.int64(7 * 86_400_000_000)
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "n_even": pd.Series([], dtype="int64"),
            "n_odd": pd.Series([], dtype="int64"),
            "psi_x1e9": pd.Series([], dtype="int64"),
            "psi_total_x1e9": pd.Series([], dtype="int64"),
        }
    )
    ds = _read(sf_dir, "events", ["ts", "event_type"], rows_per_block=500_000)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].astype("int64").to_numpy()
        par = np.mod(ts // week_us, 2)  # floor-mod: 0/1 for any sign
        out = (
            pd.DataFrame({"t": df["event_type"].to_numpy(), "p": par})
            .groupby(["t", "p"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        out["p"] = out["p"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    red, _ = _two_regime_sum(
        ds.map_batches(partial, batch_format="pandas"),
        ["t", "p"],
        ["n"],
        empty_types={"t": pa.string(), "p": pa.int64()},
    )
    df = typed_collect(
        red,
        pa.schema([("t", pa.string()), ("p", pa.int64()), ("n", pa.int64())]),
    )
    if len(df) == 0:
        return empty
    df = df.groupby(["t", "p"], as_index=False)["n"].sum()
    types = sorted(df["t"].unique())
    m = len(types)
    a = {t: 0 for t in types}
    b = {t: 0 for t in types}
    for r in df.itertuples():
        (a if int(r.p) == 0 else b)[r.t] = int(r.n)
    na, nb = sum(a.values()), sum(b.values())
    recs = []
    for t in types:
        pa_ = float(a[t] + 1) / float(na + m)
        pb_ = float(b[t] + 1) / float(nb + m)
        term = 0.0 if pa_ == pb_ else (pa_ - pb_) * np.log(pa_ / pb_)
        recs.append(
            {
                "event_type": t,
                "n_even": a[t],
                "n_odd": b[t],
                "psi_x1e9": int(
                    round_half_away(np.array([term * 1e9]), 0)[0]
                ),
            }
        )
    out = pd.DataFrame(recs)
    out["psi_total_x1e9"] = int(out["psi_x1e9"].sum())
    for c in ("n_even", "n_odd", "psi_x1e9", "psi_total_x1e9"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


PARETO_THRESHOLDS = (50, 80, 90)  # revenue coverage targets, percent


def q_pareto_coverage(sf_dir: str):
    """Pareto / concentration analysis: the MINIMAL number of top
    customers whose order revenue covers >= 50 / 80 / 90 % of the total
    — "how head-heavy is this business" — without ever sorting the
    customer table globally.

    Plan: per-customer cent sums reduce through `_two_regime_sum` (one
    exchange); `_range_plan` range-partitions on the NEGATED revenue
    (descending ranges, revenue ties co-locate); each partition then
    reduces to (rows, cents) — and for each threshold the driver folds
    partition prefixes to find the CROSSING partition, collects ONLY
    that partition's revenue array (bounded ~target rows by sizing, the
    q_equidepth trick), and finds the exact in-partition index.  The
    threshold compare is the integer cross-multiplication 100·cum >=
    q·total; the answer is tie-ORDER-independent (equal revenues
    contribute equally), so no float and no tiebreak sensitivity exists
    anywhere.  Non-positive totals degenerate to the typed empty frame
    on both sides; 100·total is guarded against int64."""
    import ray

    empty = pd.DataFrame(
        {
            "pct": pd.Series([], dtype="int64"),
            "n_customers": pd.Series([], dtype="int64"),
            "covered_cents": pd.Series([], dtype="int64"),
            "total_cents": pd.Series([], dtype="int64"),
            "n_customers_total": pd.Series([], dtype="int64"),
        }
    )
    ds = _read(
        sf_dir, "orders", ["o_custkey", "o_totalprice"], rows_per_block=100_000
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = round_half_away(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        tt = pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "r": pa.array(cents),
            }
        )
        g = tt.group_by("o_custkey").aggregate([("r", "sum")])
        return g.rename_columns(["o_custkey", "r"])

    red, n_red = _two_regime_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey"],
        ["r"],
        empty_types={"o_custkey": pa.int64()},
    )
    red = red.map_batches(
        lambda t: t.append_column(
            "neg_r",
            pa.array(-t.column("r").to_numpy(zero_copy_only=False)),
        ),
        batch_format="pyarrow",
    ).materialize()  # customer-sized (dimension-order) reduced table
    n_cust = red.count()
    if n_cust == 0:
        return empty
    # the head search runs over POSITIVE revenues only: non-positive
    # customers sort last under the descending order and can never be
    # needed for coverage (Σ positives >= total), and excluding them
    # keeps every in-partition prefix strictly increasing — the
    # crossing scans below rely on that monotonicity
    pos = red.filter(lambda row: row["r"] > 0).materialize()
    n_pos = pos.count()
    if n_pos == 0:
        return empty
    assign, _ = _range_plan(pos, n_pos, "o_custkey", "neg_r", "pareto")
    assigned = pos.map_batches(assign, batch_format="pyarrow").materialize()

    def part_sum(t: pa.Table) -> pa.Table:
        part = t.column("part").to_numpy(zero_copy_only=False)
        r = t.column("r").to_numpy(zero_copy_only=False)
        uv, inv = np.unique(part, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(uv), np.int64)
        np.add.at(s, inv, r)
        return pa.table(
            {
                "part": pa.array(uv.astype(np.int64)),
                "cnt": pa.array(cnt),
                "s": pa.array(s),
            }
        )

    psum, _ = _two_regime_sum(
        assigned.map_batches(part_sum, batch_format="pyarrow"),
        ["part"],
        ["cnt", "s"],
        empty_types={"part": pa.int64()},
    )
    pdf = typed_collect(
        psum,
        pa.schema([("part", pa.int64()), ("cnt", pa.int64()), ("s", pa.int64())]),
    )
    pdf = pdf.groupby("part", as_index=False)[["cnt", "s"]].sum().sort_values(
        "part"
    )
    total = 0  # over ALL customers, negatives included
    for b in red.map_batches(
        lambda t: pa.table(
            {
                "s": pa.array(
                    [int(t.column("r").to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    ).iter_batches(batch_format="numpy"):
        total += int(b["s"].sum())
    if total <= 0:
        return empty
    if 100 * total >= (1 << 63):
        raise RuntimeError(
            "q_pareto_coverage: 100·total exceeds int64 — rescale the "
            "money grid for this corpus"
        )
    cum_rows = pdf["cnt"].cumsum() - pdf["cnt"]
    cum_cents = pdf["s"].cumsum() - pdf["s"]
    rows = []
    part_cache: dict = {}
    for q in PARETO_THRESHOLDS:
        # crossing partition: first with 100*(cum_before + s) >= q*total
        target = q * total
        pick = None
        for i, r in enumerate(pdf.itertuples()):
            if 100 * (int(cum_cents.iloc[i]) + int(r.s)) >= target:
                pick = (i, int(r.part))
                break
        i, p = pick
        if p not in part_cache:
            arr = (
                assigned.filter(lambda row: row["part"] == p)
                .to_pandas()
                .sort_values(["neg_r", "o_custkey"])["r"]
                .to_numpy(np.int64)
            )
            part_cache[p] = arr
        arr = part_cache[p]
        local = np.cumsum(arr) + int(cum_cents.iloc[i])
        k = int(np.argmax(100 * local >= target))
        rows.append(
            {
                "pct": q,
                "n_customers": int(cum_rows.iloc[i]) + k + 1,
                "covered_cents": int(local[k]),
                "total_cents": total,
                "n_customers_total": n_cust,
            }
        )
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


SSSP_ROUNDS = 3  # bounded Bellman-Ford relaxation rounds


def q_weighted_sssp(sf_dir: str):
    """Bounded-hop WEIGHTED single-source-set shortest paths
    (Bellman-Ford, 3 relaxation rounds) over the bipartite shipment
    graph — q_bfs_reach's weighted sibling: edge weight = the MINIMUM
    extended-price cents ever shipped for that (part, supplier) pair,
    sources = suppliers with s_suppkey % 10 == 0, and the answer is the
    exact min-cost reach within <= 3 hops.  The delta-stepping shape
    reduced to its dense-round core: each round is one edge-stream map +
    one min-combiner exchange.

    Exactness: weights and distances are int64 cents end to end; min is
    order-free, so rounds are deterministic at any layout.  The distance
    table is NODE-order (parts + suppliers — catalog dimensions), so it
    rides the driver/broadcast like q_triangle_count's degree rank; a
    general web-scale graph would swap the broadcast for the
    q_pagerank_bipartite edges⋈dists join regime, unchanged math.
    Overflow: dist <= rounds · max_cents << 2^63."""
    import ray

    empty = pd.DataFrame(
        {
            "node_type": pd.Series([], dtype=object),
            "key": pd.Series([], dtype="int64"),
            "dist_cents": pd.Series([], dtype="int64"),
        }
    )

    def wedge_combiner(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy(zero_copy_only=False)
        s = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        wc = round_half_away(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0,
            0,
        ).astype(np.int64)
        u = np.concatenate([2 * p, 2 * s + 1])
        v = np.concatenate([2 * s + 1, 2 * p])
        tt = pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "w": pa.array(np.concatenate([wc, wc])),
            }
        )
        g = tt.group_by(["u", "v"]).aggregate([("w", "min")])
        return g.rename_columns(["u", "v", "w"])

    li = _read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_suppkey", "l_extendedprice"],
        rows_per_block=100_000,
    ).map_batches(wedge_combiner, batch_format="pyarrow")
    edges, _ = _two_regime_agg(
        li,
        ["u", "v"],
        ["w"],
        "min",
        empty_types={"u": pa.int64(), "v": pa.int64()},
    )
    edges = edges.materialize()  # deduped min-weight edges, reused per round

    sup = typed_collect(
        _read(sf_dir, "supplier", ["s_suppkey"]),
        pa.schema([("s_suppkey", pa.int64())]),
    )
    sources = sorted(
        {2 * int(k) + 1 for k in sup["s_suppkey"] if int(k) % 10 == 0}
    )
    if not sources:
        return empty
    dist = {int(s): 0 for s in sources}
    for _round in range(SSSP_ROUNDS):
        dk = np.array(sorted(dist), dtype=np.int64)
        dv = np.array([dist[int(k)] for k in dk], dtype=np.int64)
        dref = ray.put((dk, dv))

        class _Relax:
            def __init__(self):
                self.dk, self.dv = ray.get(dref)

            def __call__(self, t: pa.Table) -> pa.Table:
                u = t.column("u").to_numpy(zero_copy_only=False)
                v = t.column("v").to_numpy(zero_copy_only=False)
                w = t.column("w").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(self.dk, u)
                pos = np.minimum(pos, len(self.dk) - 1)
                m = self.dk[pos] == u
                du = self.dv[pos]
                if not m.any():
                    return pa.table(
                        {
                            "v": pa.array([], pa.int64()),
                            "nd": pa.array([], pa.int64()),
                        }
                    )
                return pa.table(
                    {
                        "v": pa.array(v[m].astype(np.int64)),
                        "nd": pa.array((du[m] + w[m]).astype(np.int64)),
                    }
                )

        rel, _ = _two_regime_agg(
            edges.map_batches(
                warm_factory(("sssp_relax", dref.hex()), _Relax),
                batch_format="pyarrow",
            ),
            ["v"],
            ["nd"],
            "min",
            empty_types={"v": pa.int64()},
        )
        cand = typed_collect(
            rel, pa.schema([("v", pa.int64()), ("nd", pa.int64())])
        )
        nd = dict(dist)
        for r in cand.itertuples():
            k, d = int(r.v), int(r.nd)
            if k not in nd or d < nd[k]:
                nd[k] = d
        dist = nd
    out = pd.DataFrame(
        {
            "node_type": [
                "part" if k % 2 == 0 else "supplier" for k in dist
            ],
            "key": pd.Series([k // 2 for k in dist], dtype="int64"),
            "dist_cents": pd.Series(list(dist.values()), dtype="int64"),
        }
    )
    return out.sort_values(["node_type", "key"]).reset_index(drop=True)


QUARANTINE_CLASSES = ("ok", "null_user", "null_ts", "bad_value", "bad_props")


def _strict_json_ok(s) -> bool:
    """yyjson-aligned validity: Python's json with the NaN/Infinity
    constants REJECTED (json.loads accepts bare NaN by default; DuckDB's
    json_valid does not).  The remaining divergence surface (exotic
    control characters) is out of contract, as documented for
    q_json_profile."""
    import json

    if s is None:
        return False

    def _reject(_c):
        raise ValueError("constant")

    try:
        json.loads(s, parse_constant=_reject)
        return True
    except ValueError:
        return False


def t_ingest_quarantine(sf_dir: str, out_dir: str = None):
    """Ingest validation with DEAD-LETTER routing — the quarantine stage
    every production feed runs before a corpus accepts new rows: each
    event lands in the FIRST failing class of a fixed priority chain
    (null_user → null_ts → bad_value (NULL/NaN) → bad_props (not valid
    JSON) → ok), bad rows route to a per-class quarantine parquet sink
    (content-addressed, idempotent — the IPC/Avro sink discipline) and
    the report carries per-class counts + event_id ranges.

    One streaming pass; per-block partials are ≤ 5 rows (class, n, min,
    max) folded on the driver — no exchange at all.  JSON validity is
    `_strict_json_ok` (yyjson-aligned, NaN constants rejected) so the
    oracle's json_valid() agrees."""
    import hashlib

    ds = _read(
        sf_dir,
        "events",
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
        rows_per_block=100_000,
    )

    def classify(t: pa.Table):
        n = len(t)
        uid_null = pc.is_null(t.column("user_id")).to_numpy(
            zero_copy_only=False
        )
        ts_null = pc.is_null(t.column("ts")).to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        v_bad = pc.is_null(t.column("value")).to_numpy(
            zero_copy_only=False
        ) | np.isnan(v)
        p_bad = np.array(
            [not _strict_json_ok(s) for s in t.column("props").to_pylist()],
            dtype=bool,
        )
        cls = np.full(n, 0, dtype=np.int64)  # ok
        cls[p_bad] = 4
        cls[v_bad] = 3
        cls[ts_null] = 2
        cls[uid_null] = 1
        return cls

    def partial(t: pa.Table) -> pa.Table:
        cls = classify(t)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        rows = {"cls": [], "n": [], "mn": [], "mx": []}
        for c in np.unique(cls):
            m = cls == c
            rows["cls"].append(int(c))
            rows["n"].append(int(m.sum()))
            rows["mn"].append(int(eid[m].min()))
            rows["mx"].append(int(eid[m].max()))
        if out_dir is not None and (cls != 0).any():
            bad = t.filter(pa.array(cls != 0)).append_column(
                "violation",
                pa.array(
                    [QUARANTINE_CLASSES[c] for c in cls[cls != 0]],
                    pa.string(),
                ),
            )
            sink = pa.BufferOutputStream()
            import pyarrow.parquet as pq

            pq.write_table(bad, sink)
            buf = sink.getvalue().to_pybytes()
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(
                out_dir, hashlib.md5(buf).hexdigest() + ".parquet"
            )
            tmp_p = path + ".tmp"
            with open(tmp_p, "wb") as f:
                f.write(buf)
            os.replace(tmp_p, path)
        return pa.table(
            {
                "cls": pa.array(rows["cls"], pa.int64()),
                "n": pa.array(rows["n"], pa.int64()),
                "mn": pa.array(rows["mn"], pa.int64()),
                "mx": pa.array(rows["mx"], pa.int64()),
            }
        )

    agg: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pandas"
    ):
        for r in b.itertuples():
            c = int(r.cls)
            if c not in agg:
                agg[c] = [0, int(r.mn), int(r.mx)]
            agg[c][0] += int(r.n)
            agg[c][1] = min(agg[c][1], int(r.mn))
            agg[c][2] = max(agg[c][2], int(r.mx))
    out = pd.DataFrame(
        {
            "violation": [QUARANTINE_CLASSES[c] for c in sorted(agg)],
            "n_rows": pd.Series(
                [agg[c][0] for c in sorted(agg)], dtype="int64"
            ),
            "min_event_id": pd.Series(
                [agg[c][1] for c in sorted(agg)], dtype="int64"
            ),
            "max_event_id": pd.Series(
                [agg[c][2] for c in sorted(agg)], dtype="int64"
            ),
        }
    )
    if len(out) == 0:
        out = pd.DataFrame(
            {
                "violation": pd.Series([], dtype=object),
                "n_rows": pd.Series([], dtype="int64"),
                "min_event_id": pd.Series([], dtype="int64"),
                "max_event_id": pd.Series([], dtype="int64"),
            }
        )
    return out.sort_values("violation").reset_index(drop=True)


GROUP_DD_QS = (500, 900)


def q_group_quantile_sketch(sf_dir: str):
    """The DDSketch as a GROUPED aggregate — per event_type q50/q90 over
    `value` cents: the form a 100 TB profiler actually runs (one
    mergeable sketch per group key, constant bytes per group whatever
    the row count).  Same bucket machinery as q_ddsketch_quantiles
    (`_dd_bucket_keys` / `_dd_bucket_bounds` — pure integer, oracle-
    replayable), partials are (type, bucket, count) rows merged by
    `_two_regime_sum`, and the driver reads each group's cumulative
    histogram off independently.  NULL/NaN values are excluded on both
    sides (the q_ks_test convention)."""
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "q_permille": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "rank": pd.Series([], dtype="int64"),
            "bucket_key": pd.Series([], dtype="int64"),
            "lo_cents": pd.Series([], dtype="int64"),
            "hi_cents": pd.Series([], dtype="int64"),
            "est_value": pd.Series([], dtype="float64"),
            "rel_err_bound": pd.Series([], dtype="float64"),
        }
    )
    ds = _read(
        sf_dir, "events", ["event_type", "value"], rows_per_block=500_000
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        ok = df["value"].notna().to_numpy() & ~np.isnan(v)
        cents = round_half_away(v[ok] * 100.0, 0).astype(np.int64)
        out = pd.DataFrame(
            {
                "t": df["event_type"].to_numpy()[ok],
                "bkey": _dd_bucket_keys(cents),
            }
        )
        g = out.groupby(["t", "bkey"], as_index=False).size().rename(
            columns={"size": "cnt"}
        )
        g["bkey"] = g["bkey"].astype("int64")
        g["cnt"] = g["cnt"].astype("int64")
        return g

    red, _ = _two_regime_sum(
        ds.map_batches(partial, batch_format="pandas"),
        ["t", "bkey"],
        ["cnt"],
        empty_types={"t": pa.string(), "bkey": pa.int64()},
    )
    hist = typed_collect(
        red,
        pa.schema(
            [("t", pa.string()), ("bkey", pa.int64()), ("cnt", pa.int64())]
        ),
    )
    if len(hist) == 0:
        return empty
    hist = hist.groupby(["t", "bkey"], as_index=False)["cnt"].sum()
    rows = []
    for t, g in hist.groupby("t"):
        g = g.sort_values("bkey")
        cum = g["cnt"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        for qm in GROUP_DD_QS:
            r = (qm * n + 999) // 1000
            i = int(np.searchsorted(cum, r, side="left"))
            bkey = int(g["bkey"].iloc[i])
            lo, hi = _dd_bucket_bounds(bkey)
            rows.append(
                {
                    "event_type": t,
                    "q_permille": qm,
                    "n": n,
                    "rank": r,
                    "bucket_key": bkey,
                    "lo_cents": lo,
                    "hi_cents": hi,
                    "est_value": (lo + hi) / 200.0,
                    "rel_err_bound": 0.0
                    if hi == lo
                    else (hi - lo) / abs(hi + lo),
                }
            )
    out = pd.DataFrame(rows)
    for c in ("q_permille", "n", "rank", "bucket_key", "lo_cents", "hi_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["event_type", "q_permille"]).reset_index(drop=True)


def q_time_to_convert(sf_dir: str):
    """Funnel LATENCY — time from a user's first view to their first
    purchase at-or-after it: converting-user count, conversion ppm
    (integer floor division both sides), and EXACT int64 order
    statistics of the delta distribution (median as the lo/hi rank pair
    — no interpolation, no floats — and p90 at rank (9n+9)//10).

    Plan: ONE user-hash bucket exchange; each bucket computes first-view
    / first-purchase-after vectorized per user (hot users are one
    bucket's pandas kernel).  The delta quantiles use the
    range-partition order-statistic locate (the q_pareto_coverage /
    q_equidepth shape): `_range_plan` over deltas, per-partition count
    partials, and ONLY the partitions holding the three needed ranks
    collect their arrays (each bounded ~target rows by sizing).  Zero
    converting users degenerates to the typed empty frame (oracle's
    WHERE nc > 0)."""
    import ray

    from .sizing import shuffle_partitions

    empty = pd.DataFrame(
        {
            "n_viewing": pd.Series([], dtype="int64"),
            "n_converting": pd.Series([], dtype="int64"),
            "conv_ppm": pd.Series([], dtype="int64"),
            "delta_med_lo_us": pd.Series([], dtype="int64"),
            "delta_med_hi_us": pd.Series([], dtype="int64"),
            "delta_p90_us": pd.Series([], dtype="int64"),
        }
    )
    import pyarrow.parquet as pq

    n_ev = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    if n_ev == 0:
        return empty
    ds = _read(
        sf_dir, "events", ["user_id", "ts", "event_type"], rows_per_block=500_000
    )
    nb = shuffle_partitions(n_ev)

    def bucketize(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        keep = pc.fill_null(
            pc.or_(pc.equal(et, "view"), pc.equal(et, "purchase")), False
        )
        t = t.filter(keep)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket",
            pa.array(
                _user_bucket(u, nb).astype(np.int64)
            ),
        )

    def first_pair(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].astype("int64").to_numpy()
        u = g["user_id"].to_numpy(np.int64)
        is_v = (g["event_type"] == "view").to_numpy()
        d = pd.DataFrame({"u": u, "ts": ts, "v": is_v})
        fv = (
            d[d["v"]]
            .groupby("u", as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "fv"})
        )
        pu = d[~d["v"]].merge(fv, on="u", how="inner")
        pu = pu[pu["ts"] >= pu["fv"]]
        fp = (
            pu.groupby("u", as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "fp"})
        )
        out = fv.merge(fp, on="u", how="left")
        res = pd.DataFrame(
            {
                "u": out["u"].astype("int64"),
                "delta": (out["fp"] - out["fv"]).astype("float64"),
            }
        )
        # delta NaN = viewing, non-converting (kept for the nv count)
        return res

    pairs = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(first_pair, batch_format="pandas")
        .materialize()  # one row per VIEWING user (user-dimension order)
    )
    n_viewing = pairs.count()
    if n_viewing == 0:
        return empty
    deltas = pairs.filter(lambda r: r["delta"] == r["delta"]).map_batches(
        lambda t: pa.table(
            {
                "u": t.column("u"),
                "delta": pc.cast(t.column("delta"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    n_conv = deltas.count()
    if n_conv == 0:
        return empty
    ranks = {
        "delta_med_lo_us": (n_conv + 1) // 2,
        "delta_med_hi_us": n_conv // 2 + 1,
        "delta_p90_us": (9 * n_conv + 9) // 10,
    }
    # shared range-locate (defined next to q_rfm_segments, its other user)
    located = _rank_located_values(
        deltas, n_conv, "u", "delta", "ttc", sorted(set(ranks.values()))
    )
    stats = {name: located[rk] for name, rk in ranks.items()}
    return pd.DataFrame(
        {
            "n_viewing": pd.Series([n_viewing], dtype="int64"),
            "n_converting": pd.Series([n_conv], dtype="int64"),
            "conv_ppm": pd.Series(
                [(1_000_000 * n_conv) // n_viewing], dtype="int64"
            ),
            "delta_med_lo_us": pd.Series(
                [stats["delta_med_lo_us"]], dtype="int64"
            ),
            "delta_med_hi_us": pd.Series(
                [stats["delta_med_hi_us"]], dtype="int64"
            ),
            "delta_p90_us": pd.Series([stats["delta_p90_us"]], dtype="int64"),
        }
    )


WALLET_CHUNK_DAYS = 7


def q_wallet_balance(sf_dir: str, stage_dir: str = None):
    """Per-user CLAMPED running balance over signed purchase cents —
    b_i = max(b_{i-1} + d_i, 0) ordered by (ts, event_id) — the
    non-negative-inventory / wallet recurrence, which looks
    non-associative but folds exactly: composing the per-step
    f_i(x) = max(x + d_i, 0) gives the affine-max transfer function
    F_chunk(x) = max(x + S, T) with S = Σd and T = max suffix-clamp
    (reverse-cummax of suffix sums, 0 included) — O(1) state per chunk.

    Two passes on (user, time-chunk) keys (the q_running_user_spend
    shape): pass 1 reduces each chunk to (S, T); the driver folds the
    user-chunk table (one row per ACTIVE chunk, the running-spend
    precedent) into exact incoming balances; pass 2 joins the incoming
    balance back on the same keys (keyed shuffle, never a broadcast)
    and replays each chunk vectorized via the prefix identity
    b_i = q_i − min(0, runmin(q)) with q = x + prefix — clamp events
    are the strictly-new minima below that floor.  Per user: final
    balance, max balance, clamp count — all exact int64.

    The scanned stream, consumed twice, is a parquet stage checkpoint
    with crash-resume via ``stage_dir``."""
    import shutil
    import tempfile

    import ray.data as rd

    from .sizing import shuffle_partitions
    from .staging import stage_checkpoint

    empty = pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "final_cents": pd.Series([], dtype="int64"),
            "max_cents": pd.Series([], dtype="int64"),
            "n_clamps": pd.Series([], dtype="int64"),
        }
    )
    N_BUCKETS = 64
    chunk_us = np.int64(WALLET_CHUNK_DAYS) * 86_400_000_000
    ds = _read(
        sf_dir,
        "events",
        ["event_id", "ts", "user_id", "event_type", "value"],
        rows_per_block=500_000,
    )

    own_stage = stage_dir is None
    root = tempfile.mkdtemp(prefix="pdfray_wallet_") if own_stage else stage_dir
    try:
        scanned = stage_checkpoint(
            lambda: ds.map_batches(
                lambda t: _purchase_cents_chunks(t, chunk_us, N_BUCKETS),
                batch_format="pyarrow",
            ),
            os.path.join(root, "scanned"),
            resume=not own_stage,
            allow_empty=True,
        )
        if scanned is None:
            return empty

        def chunk_summary(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(
                ["user_id", "chunk", "ts", "event_id"]
            ).reset_index(drop=True)
            outs = {"user_id": [], "chunk": [], "s": [], "t": []}
            for (u, c), sl in g.groupby(["user_id", "chunk"], sort=False):
                d = sl["cents"].to_numpy(np.int64)
                pfx = d.cumsum()
                s = int(pfx[-1])
                # F(x) = max(x + S, T) with T = S − min_prefix (the
                # prefix identity applied at the chunk end)
                outs["user_id"].append(int(u))
                outs["chunk"].append(int(c))
                outs["s"].append(s)
                outs["t"].append(s - int(pfx.min()))
            out = pd.DataFrame(outs)
            for c in out.columns:
                out[c] = out[c].astype("int64")
            return out

        summaries = (
            scanned.groupby("bucket")
            .map_groups(chunk_summary, batch_format="pandas")
            .to_pandas()
        )
        if len(summaries) == 0 or "user_id" not in summaries.columns:
            return empty
        summaries = summaries.sort_values(["user_id", "chunk"]).reset_index(
            drop=True
        )
        # driver fold: exact incoming balance per (user, chunk)
        incoming = np.zeros(len(summaries), np.int64)
        final = {}
        prev_u, x = None, 0
        for i, r in enumerate(summaries.itertuples()):
            if r.user_id != prev_u:
                prev_u, x = r.user_id, 0
            incoming[i] = x
            x = max(x + int(r.s), int(r.t))
            final[int(r.user_id)] = x
        summaries["incoming"] = incoming
        off_ds = rd.from_pandas(
            summaries[["user_id", "chunk", "incoming"]]
        )
        n_rows = scanned.count()

        def replay(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(
                ["user_id", "chunk", "ts", "event_id"]
            ).reset_index(drop=True)
            outs = {"user_id": [], "maxb": [], "clamps": []}
            for (u, _c), sl in df.groupby(["user_id", "chunk"], sort=False):
                x = int(sl["incoming"].iloc[0])
                q = x + sl["cents"].to_numpy(np.int64).cumsum()
                runmin = np.minimum.accumulate(q)
                floor = np.minimum(runmin, 0)
                b = q - floor
                prev_floor = np.concatenate([[0], floor[:-1]])
                clamps = int((q < prev_floor).sum())
                outs["user_id"].append(int(u))
                outs["maxb"].append(int(max(x, b.max())) if len(b) else x)
                outs["clamps"].append(clamps)
            out = pd.DataFrame(outs)
            for c in out.columns:
                out[c] = out[c].astype("int64")
            return out

        per_chunk = (
            scanned.join(
                off_ds,
                join_type="inner",
                num_partitions=shuffle_partitions(n_rows),
                on=("user_id", "chunk"),
            )
            .map_batches(replay, batch_format="pandas")
            .to_pandas()
        )
        agg = per_chunk.groupby("user_id", as_index=False).agg(
            max_cents=("maxb", "max"), n_clamps=("clamps", "sum")
        )
        agg["final_cents"] = agg["user_id"].map(final)
        out = agg[["user_id", "final_cents", "max_cents", "n_clamps"]]
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out.sort_values("user_id").reset_index(drop=True)
    finally:
        if own_stage:
            shutil.rmtree(root, ignore_errors=True)


def _rank_located_values(ds, n, id_col, key_col, tag, ranks):
    """Exact order statistics at the given 1-based ranks over ``key_col``
    (ascending) — the shared range-locate: `_range_plan` partitions,
    per-partition count partials, and ONLY the partitions holding a
    requested rank collect their key arrays (each bounded ~target rows
    by sizing).  Returns {rank: value} as Python ints."""
    assign, _ = _range_plan(ds, n, id_col, key_col, tag)
    assigned = ds.map_batches(assign, batch_format="pyarrow").materialize()

    def pcount(t: pa.Table) -> pa.Table:
        part = t.column("part").to_numpy(zero_copy_only=False)
        uv, cnt = np.unique(part, return_counts=True)
        return pa.table(
            {
                "part": pa.array(uv.astype(np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    red, _ = _two_regime_sum(
        assigned.map_batches(pcount, batch_format="pyarrow"),
        ["part"],
        ["cnt"],
        empty_types={"part": pa.int64()},
    )
    pdf = (
        typed_collect(
            red, pa.schema([("part", pa.int64()), ("cnt", pa.int64())])
        )
        .groupby("part", as_index=False)["cnt"]
        .sum()
        .sort_values("part")
    )
    before = (pdf["cnt"].cumsum() - pdf["cnt"]).to_numpy()
    ends = before + pdf["cnt"].to_numpy()
    cache: dict = {}
    out = {}
    for rk in ranks:
        i = int(np.searchsorted(ends, rk))
        p = int(pdf["part"].iloc[i])
        if p not in cache:
            cache[p] = np.sort(
                assigned.filter(lambda r: r["part"] == p)
                .to_pandas()[key_col]
                .to_numpy(np.int64)
            )
        out[rk] = int(cache[p][rk - int(before[i]) - 1])
    return out


def q_rfm_segments(sf_dir: str):
    """RFM customer segmentation — the marketing-analytics staple: per
    user Recency (last purchase ts), Frequency (purchase count),
    Monetary (total cents), each scored 1-5 against EXACT quintile
    boundaries (order statistics at ranks (k·n+4)//5, located by the
    shared `_rank_located_values` — only the partitions holding a
    boundary rank ever collect), then the (r, f, m) cell census.

    Determinism: score(v) = 1 + #(boundaries strictly below v) — a pure
    VALUE function, so ties at a boundary cannot depend on layout or
    rank assignment; boundaries themselves are exact int64 order stats.
    One user-hash bucket exchange builds the RFM table; scoring is a
    broadcast of 12 ints; the cell census is a ≤125-key combiner."""
    from .sizing import shuffle_partitions

    empty = pd.DataFrame(
        {
            "r_score": pd.Series([], dtype="int64"),
            "f_score": pd.Series([], dtype="int64"),
            "m_score": pd.Series([], dtype="int64"),
            "n_users": pd.Series([], dtype="int64"),
            "sum_cents": pd.Series([], dtype="int64"),
        }
    )
    import pyarrow.parquet as pq

    n_ev = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    if n_ev == 0:
        return empty
    ds = _read(
        sf_dir,
        "events",
        ["user_id", "ts", "event_type", "value"],
        rows_per_block=500_000,
    )
    nb = shuffle_partitions(n_ev)

    def bucketize(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.fill_null(pc.equal(t.column("event_type"), "purchase"), False)
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(_user_bucket(u, nb).astype(np.int64))
        )

    def rfm_fold(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].astype("int64")
        cents = round_half_away(
            g["value"].fillna(0.0).to_numpy() * 100.0, 0
        ).astype(np.int64)
        d = pd.DataFrame(
            {"u": g["user_id"].to_numpy(np.int64), "ts": ts, "c": cents}
        )
        out = d.groupby("u", as_index=False).agg(
            r=("ts", "max"), f=("c", "size"), m=("c", "sum")
        )
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    rfm = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rfm_fold, batch_format="pandas")
        .materialize()  # one row per purchasing user
    )
    n_users = rfm.count()
    if n_users == 0:
        return empty
    ranks = [(k * n_users + 4) // 5 for k in (1, 2, 3, 4)]
    bounds = {}
    for col in ("r", "f", "m"):
        vals = _rank_located_values(rfm, n_users, "u", col, f"rfm_{col}", ranks)
        bounds[col] = np.array([vals[rk] for rk in ranks], dtype=np.int64)

    def score(t: pa.Table) -> pa.Table:
        out = {"n_users": pa.array(np.ones(len(t), np.int64))}
        for col in ("r", "f", "m"):
            v = t.column(col).to_numpy(zero_copy_only=False)
            sc = 1 + (v[:, None] > bounds[col][None, :]).sum(axis=1)
            out[f"{col}_score"] = pa.array(sc.astype(np.int64))
        out["sum_cents"] = t.column("m")
        tt = pa.table(out)
        g = tt.group_by(["r_score", "f_score", "m_score"]).aggregate(
            [("n_users", "sum"), ("sum_cents", "sum")]
        )
        return g.rename_columns(
            ["r_score", "f_score", "m_score", "n_users", "sum_cents"]
        )

    red, _ = _two_regime_sum(
        rfm.map_batches(score, batch_format="pyarrow"),
        ["r_score", "f_score", "m_score"],
        ["n_users", "sum_cents"],
    )
    out = typed_collect(
        red,
        pa.schema(
            [
                ("r_score", pa.int64()),
                ("f_score", pa.int64()),
                ("m_score", pa.int64()),
                ("n_users", pa.int64()),
                ("sum_cents", pa.int64()),
            ]
        ),
    )
    out = out.groupby(
        ["r_score", "f_score", "m_score"], as_index=False
    )[["n_users", "sum_cents"]].sum()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["r_score", "f_score", "m_score"]).reset_index(
        drop=True
    )


# ----------------------------------------------------------------------
# k-core decomposition (graph degeneracy / peeling family)
KCORE_K = 3
KCORE_ROUNDS = 8  # peel rounds; converges well inside this on every sf


def q_kcore(sf_dir: str, stage_dir: str = None):
    """Bounded-round k-core peel (k=3) of the bipartite part<->supplier
    shipment graph — the graph-DEGENERACY member of the iterative family
    (PageRank = value propagation, BFS/SSSP = frontier expansion, CC =
    label convergence; peeling is the fourth classic shape: repeatedly
    delete nodes of degree < k and report the surviving core).  Dense-
    subgraph mining, spam-cluster detection and community seeding all
    reduce to this loop.

    Exactly KCORE_ROUNDS peel rounds run on BOTH sides (extra rounds
    after the fixed point are no-ops — the alive set is stable — so the
    bounded unroll equals convergence whenever the data converges inside
    the bound; the sf fixtures do, pinned by test).  Output: one row per
    round r = 0..KCORE_ROUNDS with the alive-node count and the
    undirected edge count of the surviving subgraph — round 0 is the
    input graph, so the whole peel trajectory is pinned, not just the
    terminal core.

    Plan: the globally-deduped edge list (`_shipment_edge_list`, shared
    with PageRank/BFS) lands in a parquet stage checkpoint read once per
    round.  Each round broadcasts the alive bitmap once via `ray.put`
    (nodes here are DIMENSION-sized — parts + suppliers — so the bitmap
    is catalog-bounded by construction; a corpus-sized node space would
    use the edges-by-alive semi-join regime instead, as
    q_pagerank_bipartite's join branch does) and one map over the edge
    files emits per-block sparse (node, deg) partials plus an edge-count
    sentinel; the driver folds partials and peels.  All counts are
    integers — nothing to round — and the SQL oracle is the identical
    recurrence unrolled as chained CTEs."""
    import shutil
    import tempfile

    import ray

    from .staging import stage_checkpoint

    def _rows_df(rows):
        out = pd.DataFrame(rows, columns=["round", "n_alive", "n_core_edges"])
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    tmp = None
    if stage_dir is None:
        tmp = stage_dir = tempfile.mkdtemp(prefix="pdfray_kcore_")
    try:
        edges = stage_checkpoint(
            lambda: _shipment_edge_list(sf_dir).select_columns(["u", "v"]),
            os.path.join(stage_dir, "edges"),
            allow_empty=True,
        )
        if edges is None:  # empty corpus: the peel of the empty graph
            return _rows_df(
                [(r, 0, 0) for r in range(KCORE_ROUNDS + 1)]
            )

        # node universe = sorted distinct sources (every node appears as a
        # source because the edge list carries both directions)
        deg0 = typed_collect(
            edges.map_batches(
                lambda t: pa.table(
                    {"u": t.column("u").unique()}
                ),
                batch_format="pyarrow",
            ),
            pa.schema([("u", pa.int64())]),
        )
        nodes = np.unique(deg0["u"].to_numpy(np.int64))
        alive = np.ones(len(nodes), bool)
        rows = []
        part_schema = pa.schema([("u", pa.int64()), ("deg", pa.int64())])
        for r in range(KCORE_ROUNDS + 1):
            ref = ray.put((nodes, alive.copy()))

            class DegPass:
                def __init__(self):
                    self.nodes, self.alive = ray.get(ref)

                def __call__(self, t: pa.Table) -> pa.Table:
                    u = t.column("u").to_numpy(zero_copy_only=False)
                    v = t.column("v").to_numpy(zero_copy_only=False)
                    iu = np.searchsorted(self.nodes, u)
                    iv = np.searchsorted(self.nodes, v)
                    keep = self.alive[iu] & self.alive[iv]
                    uk = u[keep]
                    su, sd = (
                        np.unique(uk, return_counts=True)
                        if uk.size
                        else (np.empty(0, np.int64), np.empty(0, np.int64))
                    )
                    return pa.table(
                        {
                            "u": pa.array(
                                np.concatenate([su, [-1]]), pa.int64()
                            ),
                            "deg": pa.array(
                                np.concatenate(
                                    [sd, [int(keep.sum())]]
                                ).astype(np.int64),
                                pa.int64(),
                            ),
                        }
                    )

            parts = typed_collect(
                edges.map_batches(
                    warm_factory(("kcore_deg", ref.hex()), DegPass),
                    batch_format="pyarrow",
                ),
                part_schema,
            )
            folded = parts.groupby("u", as_index=False)["deg"].sum()
            sent = int(folded.loc[folded["u"] == -1, "deg"].sum())
            deg = np.zeros(len(nodes), np.int64)
            real = folded[folded["u"] >= 0]
            pos = np.searchsorted(nodes, real["u"].to_numpy(np.int64))
            deg[pos] = real["deg"].to_numpy(np.int64)
            rows.append((r, int(alive.sum()), sent // 2))
            alive = alive & (deg >= KCORE_K)
        return _rows_df(rows)
    finally:
        if tmp is not None:
            shutil.rmtree(tmp, ignore_errors=True)


# ----------------------------------------------------------------------
# Sequential-pattern mining: contiguous event-type trigram support
SEQ3_BUCKETS = 64
SEQ3_CHUNK_DAYS = 7  # hot-key split width; stitch is correct for ANY width
SEQ3_MINSUP = 2


def q_seq_trigrams(sf_dir: str):
    """Contiguous sequential-pattern mining (the length-3 episode class of
    GSP/PrefixSpan): for every event-type trigram (t1, t2, t3) the number
    of DISTINCT users whose (ts, event_id)-ordered timeline contains the
    three types consecutively, cut at support >= SEQ3_MINSUP.  Next-action
    mining, funnel discovery and UI-flow audits all start here.

    Hot-key-safe like q_markov_transitions, but a trigram can cross chunk
    boundaries through up to THREE chunks (a singleton middle chunk), so
    the boundary state per (user, chunk) is the chunk's first-two/last-two
    events WITH their in-chunk positions and the chunk size: stitching
    sorts a user's boundary rows by (chunk, pos) and enumerates windows
    whose consecutive elements are TRUE-adjacent — same chunk and pos+1,
    or last-of-chunk to first-of-next-populated-chunk — and that cross a
    boundary (fully-in-chunk windows were counted by the in-chunk pass;
    positions make false adjacency across an elided chunk middle
    impossible).  Boundary rows are <= 4 per populated (user, chunk);
    two-regime driver/bucketed stitch.

    Distinct-user support: trigram rows carry user_id and dedup on a
    user-splitmix bucket exchange (all of a user's rows co-locate, so
    per-bucket drop_duplicates is globally exact — the q_butterfly_count
    bucket-fold lesson; never a per-key Ray Aggregate), then per-bucket
    value_counts partials sum via `_two_regime_sum`.  Everything that
    shuffles is (user, 3 short types) or narrower; counts are integers
    end to end."""
    import ray.data as rd

    ds = _read(
        sf_dir,
        "events",
        ["event_id", "ts", "user_id", "event_type"],
        rows_per_block=12_500,
    )
    chunk_us = np.int64(SEQ3_CHUNK_DAYS) * 86_400_000_000

    def bucketize(t: pa.Table) -> pa.Table:
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        chunk, bucket = _session_keys(users, ts_us, SEQ3_BUCKETS, chunk_us)
        t = t.append_column("chunk", pa.array(chunk, pa.int64()))
        return t.append_column("bucket", pa.array(bucket))

    _PART_COLS = {
        "kind": "int64",
        "user_id": "int64",
        "t1": "object",
        "t2": "object",
        "t3": "object",
        "chunk": "int64",
        "pos": "int64",
        "typ": "object",
        "n": "int64",
    }

    def _empty_part() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=d) for c, d in _PART_COLS.items()})

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "chunk", "ts", "event_id"])
        u = g["user_id"].to_numpy(np.int64)
        ch = g["chunk"].to_numpy(np.int64)
        ty = g["event_type"].to_numpy(object)
        parts = []
        if len(g) >= 3:
            same2 = (u[2:] == u[:-2]) & (ch[2:] == ch[:-2])
            tri = pd.DataFrame(
                {
                    "user_id": u[2:][same2],
                    "t1": ty[:-2][same2],
                    "t2": ty[1:-1][same2],
                    "t3": ty[2:][same2],
                }
            ).drop_duplicates()
            if len(tri):
                parts.append(
                    pd.DataFrame(
                        {
                            "kind": np.zeros(len(tri), np.int64),
                            "user_id": tri["user_id"].to_numpy(np.int64),
                            "t1": tri["t1"].to_numpy(object),
                            "t2": tri["t2"].to_numpy(object),
                            "t3": tri["t3"].to_numpy(object),
                            "chunk": np.full(len(tri), -1, np.int64),
                            "pos": np.full(len(tri), -1, np.int64),
                            "typ": np.full(len(tri), "", object),
                            "n": np.zeros(len(tri), np.int64),
                        }
                    )
                )
        if len(g):
            brk = np.r_[True, (u[1:] != u[:-1]) | (ch[1:] != ch[:-1])]
            starts = np.flatnonzero(brk)
            sizes = np.diff(np.r_[starts, len(u)])
            # boundary positions {0, 1, n-2, n-1} ∩ [0, n), deduped
            segs = [
                (starts, np.zeros(len(starts), np.int64), sizes >= 1),
                (starts + 1, np.ones(len(starts), np.int64), sizes >= 2),
                (starts + sizes - 2, sizes - 2, sizes >= 4),
                (starts + sizes - 1, sizes - 1, sizes >= 3),
            ]
            idxs, poss, ns_ = [], [], []
            for idx, pos, mask in segs:
                idxs.append(idx[mask])
                poss.append(pos[mask] if isinstance(pos, np.ndarray) else pos)
                ns_.append(sizes[mask])
            idx = np.concatenate(idxs)
            pos = np.concatenate(poss)
            nn = np.concatenate(ns_)
            parts.append(
                pd.DataFrame(
                    {
                        "kind": np.ones(len(idx), np.int64),
                        "user_id": u[idx],
                        "t1": np.full(len(idx), "", object),
                        "t2": np.full(len(idx), "", object),
                        "t3": np.full(len(idx), "", object),
                        "chunk": ch[idx],
                        "pos": pos.astype(np.int64),
                        "typ": ty[idx],
                        "n": nn.astype(np.int64),
                    }
                )
            )
        return pd.concat(parts, ignore_index=True) if parts else _empty_part()

    _part_schema = pa.schema(
        [
            ("kind", pa.int64()),
            ("user_id", pa.int64()),
            ("t1", pa.string()),
            ("t2", pa.string()),
            ("t3", pa.string()),
            ("chunk", pa.int64()),
            ("pos", pa.int64()),
            ("typ", pa.string()),
            ("n", pa.int64()),
        ]
    )
    parts = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
        .materialize()  # narrow: per-chunk distinct trigrams + <=4 boundary rows
    )

    inchunk = parts.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 0)).select(
            ["user_id", "t1", "t2", "t3"]
        ),
        batch_format="pyarrow",
    )
    bnd_ds = parts.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 1)).select(
            ["user_id", "chunk", "pos", "typ", "n"]
        ),
        batch_format="pyarrow",
    ).materialize()

    tri_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("t1", pa.string()),
            ("t2", pa.string()),
            ("t3", pa.string()),
        ]
    )

    def stitch(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["user_id", "chunk", "pos"])
        u = b["user_id"].to_numpy(np.int64)
        ch = b["chunk"].to_numpy(np.int64)
        pos = b["pos"].to_numpy(np.int64)
        nn = b["n"].to_numpy(np.int64)
        ty = b["typ"].to_numpy(object)
        out = pd.DataFrame(
            {c: pd.Series(dtype=d) for c, d in
             [("user_id", "int64"), ("t1", "object"), ("t2", "object"), ("t3", "object")]}
        )
        if len(b) < 3:
            return out
        su = u[1:] == u[:-1]
        samechunk = su & (ch[1:] == ch[:-1]) & (pos[1:] == pos[:-1] + 1)
        crosschunk = su & (ch[1:] != ch[:-1]) & (pos[:-1] == nn[:-1] - 1) & (
            pos[1:] == 0
        )
        adj = samechunk | crosschunk
        win = adj[:-1] & adj[1:] & (ch[2:] != ch[:-2])
        tri = pd.DataFrame(
            {
                "user_id": u[2:][win],
                "t1": ty[:-2][win],
                "t2": ty[1:-1][win],
                "t3": ty[2:][win],
            }
        ).drop_duplicates()
        return tri if len(tri) else out

    _bnd_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("chunk", pa.int64()),
            ("pos", pa.int64()),
            ("typ", pa.string()),
            ("n", pa.int64()),
        ]
    )
    n_bnd = bnd_ds.count()
    if n_bnd <= PIVOT_DRIVER_MAX_ROWS:
        stitched_df = stitch(typed_collect(bnd_ds, _bnd_schema))
        stitched = rd.from_arrow(
            pa.Table.from_pandas(stitched_df, preserve_index=False).cast(tri_schema)
        )
    else:  # bucketed stitch: a user's boundary rows co-locate by hash
        def add_ubucket(t: pa.Table) -> pa.Table:
            uu = t.column("user_id").to_numpy(zero_copy_only=False)
            mixed = uu.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            return t.append_column(
                "ubucket",
                pa.array((mixed % np.uint64(SEQ3_BUCKETS)).astype(np.int64)),
            )

        stitched = (
            bnd_ds.map_batches(add_ubucket, batch_format="pyarrow")
            .groupby("ubucket")
            .map_groups(
                lambda g: stitch(g.drop(columns=["ubucket"])),
                batch_format="pandas",
            )
        )

    tri_all = inchunk.union(stitched)

    def dedup_bucketize(t: pa.Table) -> pa.Table:
        uu = t.column("user_id").to_numpy(zero_copy_only=False)
        mixed = uu.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column(
            "dbucket",
            pa.array((mixed % np.uint64(SEQ3_BUCKETS)).astype(np.int64)),
        )

    def dedup_fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "t1", "t2", "t3"])
        c = (
            d.groupby(["t1", "t2", "t3"], as_index=False)
            .size()
            .rename(columns={"size": "support"})
        )
        c["support"] = c["support"].astype("int64")
        return c[["t1", "t2", "t3", "support"]]

    red, _ = _two_regime_sum(
        tri_all.map_batches(dedup_bucketize, batch_format="pyarrow")
        .groupby("dbucket")
        .map_groups(dedup_fold, batch_format="pandas"),
        ["t1", "t2", "t3"],
        ["support"],
    )
    out = typed_collect(
        red,
        pa.schema(
            [
                ("t1", pa.string()),
                ("t2", pa.string()),
                ("t3", pa.string()),
                ("support", pa.int64()),
            ]
        ),
    )
    out = out[out["support"] >= SEQ3_MINSUP]
    out["support"] = out["support"].astype("int64")
    return (
        out.sort_values(
            ["support", "t1", "t2", "t3"], ascending=[False, True, True, True]
        ).reset_index(drop=True)
    )


# ----------------------------------------------------------------------
# Row-level table diff (replica reconciliation / snapshot drift report)
DIFF_ADD_OFFSET = 1_000_000_000  # synthetic-B new-key space, disjoint from custkeys


def q_snapshot_diff(sf_dir: str):
    """Row-level DATA DIFF between two table states (the reconciliation
    operator behind replica anti-entropy repair, snapshot drift reports
    and CDC backfills): every key classified added / removed / changed
    with its old and new value.  q_table_checksum detects THAT replicas
    diverge; this reports WHERE.

    The two states here are the customer balance table (side A) and a
    deterministically perturbed replica (side B — in production the two
    inputs are independent tables): B drops keys ≡ 0 (mod 97), bumps
    cents by 1 on keys ≡ 0 (mod 13), and inserts new keys k + 1e9 (far
    above any real custkey) for k ≡ 0 (mod 101) — integer rules replayed
    verbatim in SQL.

    Plan: both sides stream as (key, cents, side) rows into ONE
    key-hash bucket exchange (the sides are per-key reduced already —
    custkey is unique — so the exchange carries one narrow row per key
    per side, and a per-bucket vectorized merge classifies); only the
    DIFFERENCE rows — rule-bounded, never the table — leave the
    buckets.  Absent values carry 0 with the class column
    disambiguating (added rows have no old, removed rows no new), so
    the frame stays pure int64."""
    from .sizing import shuffle_partitions

    def side_a(t: pa.Table) -> pa.Table:
        cents = np.rint(
            round_half_away(
                t.column("c_acctbal").to_numpy(zero_copy_only=False), 2
            )
            * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "k": pc.cast(t.column("c_custkey"), pa.int64()),
                "cents": pa.array(cents),
                "side": pa.array(np.zeros(len(t), np.int64)),
            }
        )

    def side_b(t: pa.Table) -> pa.Table:
        a = side_a(t)
        k = a.column("k").to_numpy(zero_copy_only=False)
        cents = a.column("cents").to_numpy(zero_copy_only=False)
        keep = k % 97 != 0
        kk, cc = k[keep], cents[keep].copy()
        cc[kk % 13 == 0] += 1
        addm = k % 101 == 0
        nk = np.concatenate([kk, k[addm] + DIFF_ADD_OFFSET])
        nc = np.concatenate([cc, k[addm]])
        return pa.table(
            {
                "k": pa.array(nk, pa.int64()),
                "cents": pa.array(nc, pa.int64()),
                "side": pa.array(np.ones(len(nk), np.int64)),
            }
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    import pyarrow.parquet as _pq

    n_cust = _pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    nb = shuffle_partitions(max(n_cust, 1))
    both = cust.map_batches(side_a, batch_format="pyarrow").union(
        cust.map_batches(side_b, batch_format="pyarrow")
    )

    def bucketize(t: pa.Table) -> pa.Table:
        kk = t.column("k").to_numpy(zero_copy_only=False)
        mixed = kk.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column(
            "bucket", pa.array((mixed % np.uint64(nb)).astype(np.int64))
        )

    out_cols = [
        ("diff_class", "object"),
        ("custkey", "int64"),
        ("old_cents", "int64"),
        ("new_cents", "int64"),
    ]

    def diff_fold(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0][["k", "cents"]]
        b = g[g["side"] == 1][["k", "cents"]]
        m = a.merge(b, on="k", how="outer", suffixes=("_a", "_b"), indicator=True)
        removed = m[m["_merge"] == "left_only"]
        added = m[m["_merge"] == "right_only"]
        changed = m[(m["_merge"] == "both") & (m["cents_a"] != m["cents_b"])]
        frames = []
        for cls, src, oc, nc in (
            ("added", added, 0, "cents_b"),
            ("changed", changed, "cents_a", "cents_b"),
            ("removed", removed, "cents_a", 0),
        ):
            if not len(src):
                continue
            frames.append(
                pd.DataFrame(
                    {
                        "diff_class": np.full(len(src), cls, object),
                        "custkey": src["k"].to_numpy(np.int64),
                        "old_cents": (
                            src[oc].to_numpy(np.float64).astype(np.int64)
                            if isinstance(oc, str)
                            else np.zeros(len(src), np.int64)
                        ),
                        "new_cents": (
                            src[nc].to_numpy(np.float64).astype(np.int64)
                            if isinstance(nc, str)
                            else np.zeros(len(src), np.int64)
                        ),
                    }
                )
            )
        if not frames:
            return pd.DataFrame({c: pd.Series(dtype=d) for c, d in out_cols})
        return pd.concat(frames, ignore_index=True)

    out = typed_collect(
        both.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(diff_fold, batch_format="pandas"),
        pa.schema(
            [
                ("diff_class", pa.string()),
                ("custkey", pa.int64()),
                ("old_cents", pa.int64()),
                ("new_cents", pa.int64()),
            ]
        ),
    )
    for c, d in out_cols:
        out[c] = out[c].astype(d)
    return out.sort_values(["diff_class", "custkey"]).reset_index(drop=True)


# ----------------------------------------------------------------------
# Multi-touch (linear) attribution
ATTR_WINDOW_US = 6 * 3_600_000_000  # lookback window; also the chunk width
ATTR_CREDIT_SCALE = 1_000_000  # microcredits per conversion


def q_multitouch_attribution(sf_dir: str):
    """LINEAR multi-touch attribution: every purchase distributes
    ATTR_CREDIT_SCALE microcredits equally over the user's non-purchase
    touch events in the 6h window strictly before it (floor division —
    deterministic integers, no rational arithmetic crosses the compare);
    touchless purchases credit the '__direct__' channel in full.  Output
    per channel: conversions reached, touches counted, microcredits won —
    the marketing-mix report behind budget allocation.

    Distributed shape: the q_range_join_view_purchase band-replication
    plan inverted — chunk width == window, TOUCHES replicate into the
    next chunk (2x narrow rows), purchases stay in their own chunk, so
    each conversion's ENTIRE window is present in exactly one (user,
    chunk) group and its touch total is computed once, never merged.
    Composite chunk-relative keys (+W offset so replica offsets stay
    non-negative) make the in-group window count one searchsorted pair
    per channel — channel vocabulary is small, purchases vectorize.
    Partials are (channel, conv, touches, credit) int rows;
    `_two_regime_sum` folds them."""
    import pyarrow.parquet as _pq

    from .sizing import shuffle_partitions

    w_us = np.int64(ATTR_WINDOW_US)
    n_rows = _pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    n_buckets = shuffle_partitions(max(n_rows, 1))

    def emit(t: pa.Table) -> pa.Table:
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ety = np.asarray(t.column("event_type").to_pylist(), object)
        is_p = ety == "purchase"
        chunk = ts_us // w_us
        tmask = ~is_p
        # touches additionally land in the NEXT chunk so a touch late in
        # chunk c reaches purchases early in chunk c+1
        out_users = np.concatenate([users, users[tmask]])
        out_ts = np.concatenate([ts_us, ts_us[tmask]])
        out_p = np.concatenate([is_p, np.zeros(int(tmask.sum()), bool)])
        out_ch = np.concatenate([chunk, chunk[tmask] + 1])
        out_ety = np.concatenate([ety, ety[tmask]])
        mixed = out_users.astype(np.uint64) * np.uint64(
            0x9E3779B97F4A7C15
        ) + out_ch.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
        bucket = (mixed % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(out_users, pa.int64()),
                "ts_us": pa.array(out_ts, pa.int64()),
                "is_p": pa.array(out_p, pa.bool_()),
                "chunk": pa.array(out_ch, pa.int64()),
                "etype": pa.array(out_ety, pa.string()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    part_cols = [
        ("channel", "object"),
        ("n_conversions", "int64"),
        ("n_touches", "int64"),
        ("credit_micro", "int64"),
    ]

    def _empty_part() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=d) for c, d in part_cols})

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return _empty_part()
        g = g.sort_values(["user_id", "chunk", "ts_us"])
        users = g["user_id"].to_numpy()
        chunk = g["chunk"].to_numpy()
        ts = g["ts_us"].to_numpy()
        isp = g["is_p"].to_numpy()
        ety = g["etype"].to_numpy(object)
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = (users[1:] != users[:-1]) | (chunk[1:] != chunk[:-1])
        gid = np.cumsum(new) - 1
        # chunk-relative + W: replicas (from the previous chunk) sit in
        # [0, W), natives in [W, 2W); big > 3W keeps groups disjoint
        big = 3 * w_us + 2
        comp = gid * big + (ts - chunk * w_us) + w_us
        comp_p = comp[isp]
        if len(comp_p) == 0:
            return _empty_part()
        channels = sorted(set(ety[~isp]))
        counts = np.zeros((len(comp_p), len(channels)), np.int64)
        for ci, ch in enumerate(channels):
            m = (~isp) & (ety == ch)
            comp_t = comp[m]  # sorted within gid by construction
            lo = np.searchsorted(comp_t, comp_p - w_us, side="left")
            hi = np.searchsorted(comp_t, comp_p, side="left")
            counts[:, ci] = hi - lo
        n_total = counts.sum(axis=1)
        touched = n_total > 0
        rows = []
        if touched.any():
            cpt = np.zeros(len(comp_p), np.int64)
            cpt[touched] = ATTR_CREDIT_SCALE // n_total[touched]
            credits = counts * cpt[:, None]
            for ci, ch in enumerate(channels):
                col = counts[:, ci]
                reached = col > 0
                if reached.any():
                    rows.append(
                        (
                            ch,
                            int(reached.sum()),
                            int(col.sum()),
                            int(credits[:, ci].sum()),
                        )
                    )
        n_direct = int((~touched).sum())
        if n_direct:
            rows.append(
                ("__direct__", n_direct, 0, n_direct * ATTR_CREDIT_SCALE)
            )
        if not rows:
            return _empty_part()
        out = pd.DataFrame(rows, columns=[c for c, _ in part_cols])
        for c, d in part_cols[1:]:
            out[c] = out[c].astype(d)
        return out

    parts = (
        _read(
            sf_dir,
            "events",
            ["event_id", "ts", "user_id", "event_type"],
            rows_per_block=12_500,
        )
        .map_batches(emit, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(attribute, batch_format="pandas")
    )
    red, _ = _two_regime_sum(
        parts,
        ["channel"],
        ["n_conversions", "n_touches", "credit_micro"],
        empty_types={"channel": pa.string()},
    )
    out = typed_collect(
        red,
        pa.schema(
            [
                ("channel", pa.string()),
                ("n_conversions", pa.int64()),
                ("n_touches", pa.int64()),
                ("credit_micro", pa.int64()),
            ]
        ),
    )
    for c, d in part_cols:
        out[c] = out[c].astype(d)
    return out.sort_values("channel").reset_index(drop=True)


# ----------------------------------------------------------------------
# Interval sweep-line: peak concurrency
PEAK_IV_US = 1_800_000_000  # each event opens a 30-minute interval
PEAK_CHUNK_US = 86_400_000_000  # sweep chunk width (1 day)
PEAK_BUCKETS = 64


def q_peak_concurrency(sf_dir: str):
    """Peak concurrent open intervals per event type — the SWEEP-LINE
    member of the associative-scan family (capacity planning, license
    compliance, peak-load sizing): every event opens a [ts, ts + 30min)
    interval; report each type's maximum simultaneous open count and the
    EARLIEST timestamp attaining it.

    Semantics pinned to half-open intervals: concurrency f(t) = count of
    intervals containing t = running sum after folding ALL boundary
    deltas with time <= t (an interval ending exactly at t no longer
    counts, one starting at t does) — so deltas net PER DISTINCT TIME
    before the scan, and intra-time orderings cannot manufacture phantom
    peaks.

    Distributed shape: the q_cusum_changepoint chunked-prefix plan on
    (event_type, day-chunk) keys — both boundary deltas of an interval
    land by THEIR OWN time (the -1 may fall in the next chunk; chunk
    membership is per-delta, so no replication at all).  Each chunk
    reduces to ONE constant-width partial (net sum S, max running prefix
    M, first time attaining M); the driver folds chunk offsets o_c =
    prefix of S and takes max(o_c + M_c) with the (value DESC, time ASC)
    tie rule — each chunk's first attainment of the global peak is
    exactly its first attainment of its local max, so one candidate per
    chunk suffices (the drawdown argument).  Partial count is
    |types| x |day-chunks|: time-bounded, driver-sized at any corpus
    width (the cusum precedent)."""
    import pyarrow.parquet as _pq

    ds = _read(
        sf_dir, "events", ["ts", "event_type"], rows_per_block=12_500
    )

    def emit(t: pa.Table) -> pa.Table:
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ety = np.asarray(t.column("event_type").to_pylist(), object)
        times = np.concatenate([ts_us, ts_us + PEAK_IV_US])
        dlt = np.concatenate(
            [np.ones(len(ts_us), np.int64), -np.ones(len(ts_us), np.int64)]
        )
        types = np.concatenate([ety, ety])
        chunk = times // PEAK_CHUNK_US
        # pre-net per (type, time) within the block to shrink the exchange
        df = pd.DataFrame(
            {"event_type": types, "chunk": chunk, "t": times, "dlt": dlt}
        )
        g = df.groupby(["event_type", "chunk", "t"], as_index=False)["dlt"].sum()
        # deterministic type hash (md5 per unique value — Python hash() is
        # process-seeded and would split a (type, chunk) across buckets)
        uniq = {
            v: int(hashlib.md5(v.encode()).hexdigest()[:8], 16)
            for v in g["event_type"].unique()
        }
        th = g["event_type"].map(uniq).to_numpy(np.int64).astype(np.uint64)
        mixed = th * np.uint64(0x9E3779B97F4A7C15) + g["chunk"].to_numpy(
            np.int64
        ).astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
        g["bucket"] = (mixed % np.uint64(PEAK_BUCKETS)).astype(np.int64)
        g["dlt"] = g["dlt"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    part_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("chunk", pa.int64()),
            ("s", pa.int64()),
            ("m", pa.int64()),
            ("tm", pa.int64()),
        ]
    )

    def chunk_fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "chunk", "t"])
        rows = []
        for (ety, ch), grp in g.groupby(["event_type", "chunk"], sort=False):
            net = grp.groupby("t", sort=True)["dlt"].sum()
            pref = net.cumsum().to_numpy(np.int64)
            m = int(pref.max())
            tm = int(net.index.to_numpy(np.int64)[int(np.argmax(pref))])
            rows.append((ety, int(ch), int(pref[-1]), m, tm))
        if not rows:
            return part_schema.empty_table().to_pandas()
        out = pd.DataFrame(rows, columns=["event_type", "chunk", "s", "m", "tm"])
        for c in ("chunk", "s", "m", "tm"):
            out[c] = out[c].astype("int64")
        return out

    parts = typed_collect(
        ds.map_batches(emit, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(chunk_fold, batch_format="pandas"),
        part_schema,
    )
    out_cols = [
        ("event_type", "object"),
        ("peak", "int64"),
        ("peak_ts_us", "int64"),
    ]
    if len(parts) == 0:
        return pd.DataFrame({c: pd.Series(dtype=d) for c, d in out_cols})
    # pre-netted (type, chunk, t) rows can still split across blocks when
    # a (type, t) pair straddles block boundaries: refold per (type,
    # chunk) is NOT possible here because partials carry prefixes, so the
    # exchange above co-locates each (type, chunk) wholesale instead.
    parts = parts.sort_values(["event_type", "chunk"])
    rows = []
    for ety, grp in parts.groupby("event_type", sort=True):
        s = grp["s"].to_numpy(np.int64)
        off = np.concatenate([[0], np.cumsum(s)[:-1]])
        vals = off + grp["m"].to_numpy(np.int64)
        peak = int(vals.max())
        first = int(np.argmax(vals))  # chunks sorted by time: earliest wins
        rows.append((ety, peak, int(grp["tm"].to_numpy(np.int64)[first])))
    out = pd.DataFrame(rows, columns=[c for c, _ in out_cols])
    out["peak"] = out["peak"].astype("int64")
    out["peak_ts_us"] = out["peak_ts_us"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


# copybook for the q_fwf_roundtrip leg: widths in characters, generous
# enough for any hostile-harness value (overflow raises by design)
FWF_NATION_LAYOUT = [
    ("n_nationkey", 12, "int"),
    ("n_name", 64, "str"),
    ("n_regionkey", 12, "int"),
]


def q_fwf_roundtrip(sf_dir: str):
    """Fixed-width (COBOL-copybook) round trip over the nation table —
    the legacy/mainframe ingest leg of the format matrix (parquet / CSV /
    JSONL / WARC / tar / IPC / ORC / Avro / FWF): nation streams through
    the distributed FWF sink (content-addressed one-file-per-block,
    character-width columns so unicode names keep alignment) and back
    through the one-task-per-file source.  The declared lossy edge is
    trailing spaces in string values (indistinguishable from padding —
    the classic FWF contract); the oracle applies the SAME rtrim, so the
    comparison certifies the round trip under the format's real
    semantics.  Int fields must survive sign and magnitude exactly."""
    import shutil
    import tempfile

    from ..sources.readers import read_fwf_table, write_fwf_table

    empty = pd.DataFrame(
        {
            "n_nationkey": pd.Series([], dtype="int64"),
            "n_name": pd.Series([], dtype=object),
            "n_regionkey": pd.Series([], dtype="int64"),
        }
    )
    out_dir = tempfile.mkdtemp(prefix="pdfray_fwf_")
    try:
        write_fwf_table(
            _read(sf_dir, "nation"), out_dir, FWF_NATION_LAYOUT
        )
        if not any(n.endswith(".fwf") for n in os.listdir(out_dir)):
            return empty  # empty corpus wrote no files
        out = (
            read_fwf_table(out_dir, FWF_NATION_LAYOUT)
            .to_pandas()
            .sort_values("n_nationkey")
            .reset_index(drop=True)
        )
        for c in ("n_nationkey", "n_regionkey"):
            out[c] = out[c].astype("int64")
        return out
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


# ----------------------------------------------------------------------
# Deterministic random walks (DeepWalk/node2vec corpus generation)
WALK_SALT = "walk:"
WALK_STEPS = 3  # part -> supplier -> part -> supplier


def q_graph_random_walks(sf_dir: str):
    """Graph-embedding TRAINING-CORPUS generation (DeepWalk/node2vec):
    one fixed-length walk per part node over the bipartite shipment
    graph, the walk's every hop chosen by a salted md5 draw over the
    node's rank-ordered neighbor list — md5_number_lower('walk:node:step')
    mod degree — so the walk corpus is a PURE FUNCTION of the graph
    (reproducible shards, resumable, and replayable step-by-step in SQL;
    an RNG walk could never be oracle-checked).  Bipartite alternation
    makes the columns typed: (part0, supp1, part2, supp3).

    Plan: the globally-deduped edge list reduces to driver-side sorted
    (u, v) arrays with per-node offsets — the adjacency is
    CATALOG-bounded (distinct part-supplier pairs), the same dimension-
    table broadcast budget as q_weighted_sssp's distance table and
    q_kcore's bitmap; corpus-scale graphs would swap each step for an
    edges-by-frontier hash join (the q_pagerank_bipartite join regime).
    Walk starts stream as a Dataset; one map stage holds the broadcast
    adjacency and gathers all WALK_STEPS hops vectorized except the
    per-(node, step) md5 draw (hash cost ~ 3 md5s per start row)."""
    import ray
    import ray.data as rd

    edges = _shipment_edge_list(sf_dir)
    edf = typed_collect(
        edges.select_columns(["u", "v"]),
        pa.schema([("u", pa.int64()), ("v", pa.int64())]),
    )
    cols = ["part0", "supp1", "part2", "supp3"]
    if len(edf) == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    edf = edf.sort_values(["u", "v"])
    u_arr = edf["u"].to_numpy(np.int64)
    v_arr = edf["v"].to_numpy(np.int64)
    nodes = np.unique(u_arr)
    starts_idx = np.searchsorted(u_arr, nodes)
    degs = np.diff(np.r_[starts_idx, len(u_arr)]).astype(np.int64)
    ref = ray.put((nodes, starts_idx, degs, v_arr))

    part_starts = nodes[nodes % 2 == 0]
    starts_ds = rd.from_arrow(
        pa.table({"n0": pa.array(part_starts, pa.int64())})
    )

    class Walk:
        def __init__(self):
            self.nodes, self.starts, self.degs, self.v = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            cur = t.column("n0").to_numpy(zero_copy_only=False).copy()
            walk = [cur]
            for step in range(WALK_STEPS):
                pos = np.searchsorted(self.nodes, cur)
                d = self.degs[pos]
                draws = np.fromiter(
                    (
                        int.from_bytes(
                            hashlib.md5(
                                f"{WALK_SALT}{n}:{step}".encode()
                            ).digest()[8:],
                            "little",
                        )
                        for n in cur
                    ),
                    np.uint64,
                    len(cur),
                )
                rank = (draws % d.astype(np.uint64)).astype(np.int64)
                cur = self.v[self.starts[pos] + rank]
                walk.append(cur)
            return pa.table(
                {
                    "part0": pa.array(walk[0] // 2, pa.int64()),
                    "supp1": pa.array(walk[1] // 2, pa.int64()),
                    "part2": pa.array(walk[2] // 2, pa.int64()),
                    "supp3": pa.array(walk[3] // 2, pa.int64()),
                }
            )

    out = typed_collect(
        starts_ds.map_batches(
            warm_factory(("q_graph_random_walks", ref.hex()), Walk),
            batch_format="pyarrow",
        ),
        pa.schema([(c, pa.int64()) for c in cols]),
    )
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.sort_values("part0").reset_index(drop=True)


def q_did_uplift(sf_dir: str):
    """Difference-in-differences uplift — the EXPERIMENTATION-analytics
    member beyond q_welch_ab's single-period t-test: treatment = even
    user_ids, periods split at INC_CUTOFF, outcome = purchase cents.
    Output: the four (group_period) cells with exact integer (n,
    sum_cents) digests and a floor-micro mean, plus the 'did' row whose
    stat_micro is the classic (T_post − T_pre) − (C_post − C_pre)
    estimate — emitted only when all four cells are populated (the
    estimand does not exist otherwise; the oracle's guard mirrors that).

    Exactness: cells are order-free integer sums; the mean and the DiD
    ride the compare as FLOOR of the IDENTICAL double expression on both
    sides (token-for-token division/subtraction order), the
    s_calibration_report discipline.  One combiner pass, <= 4 partial
    rows per block, `_two_regime_sum` folds."""
    import math

    cut_us = int(pd.Timestamp(INC_CUTOFF).value // 1000)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        if len(t) == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.rint(
            round_half_away(t.column("value").to_numpy(zero_copy_only=False), 2)
            * 100.0
        ).astype(np.int64)
        grp = np.where(np.mod(uid, 2) == 0, "t", "c")
        per = np.where(ts_us < cut_us, "pre", "post")
        df = pd.DataFrame(
            {"cell": np.char.add(np.char.add(grp.astype(str), "_"), per.astype(str)),
             "cents": cents}
        )
        g = df.groupby("cell", as_index=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum")
        )
        g["n"] = g["n"].astype("int64")
        g["sum_cents"] = g["sum_cents"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = _read(
        sf_dir,
        "events",
        ["user_id", "ts", "event_type", "value"],
        rows_per_block=12_500,
    )
    red, _ = _two_regime_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["cell"],
        ["n", "sum_cents"],
        empty_types={"cell": pa.string()},
    )
    got = typed_collect(
        red,
        pa.schema(
            [("cell", pa.string()), ("n", pa.int64()), ("sum_cents", pa.int64())]
        ),
    ).set_index("cell")
    cells = ["c_post", "c_pre", "t_post", "t_pre"]
    vals = {}
    rows = []
    for cell in cells:
        n = int(got.loc[cell, "n"]) if cell in got.index else 0
        s = int(got.loc[cell, "sum_cents"]) if cell in got.index else 0
        vals[cell] = (n, s)
        mean_micro = (
            int(math.floor(1_000_000 * (float(s) / n))) if n > 0 else 0
        )
        rows.append((cell, n, s, mean_micro))
    if all(vals[c][0] > 0 for c in cells):
        did = 1_000_000 * (
            (
                (float(vals["t_post"][1]) / vals["t_post"][0])
                - (float(vals["t_pre"][1]) / vals["t_pre"][0])
            )
            - (
                (float(vals["c_post"][1]) / vals["c_post"][0])
                - (float(vals["c_pre"][1]) / vals["c_pre"][0])
            )
        )
        rows.append(("did", 0, 0, int(math.floor(did))))
    out = pd.DataFrame(rows, columns=["cell", "n", "sum_cents", "stat_micro"])
    for c in ("n", "sum_cents", "stat_micro"):
        out[c] = out[c].astype("int64")
    return out.sort_values("cell").reset_index(drop=True)


def q_cuped_adjusted(sf_dir: str):
    """CUPED variance-reduced experiment readout (Deng et al. 2013) —
    the industrial companion to q_did_uplift: treatment = even user_ids,
    covariate X = a user's PRE-period purchase cents, outcome Y = their
    POST-period purchase cents (split at INC_CUTOFF), theta estimated
    POOLED over all purchasing users, adjusted group mean =
    Ȳ_g − θ·(X̄_g − X̄).

    Plan: one combiner pass + `_two_regime_sum` reduces events to one
    (user, pre_cents, post_cents) row per purchasing user; a second map
    pass folds those into constant-width per-block digest rows (n, ΣX,
    ΣY, ΣX², ΣXY per group) — ΣX²/ΣXY are carried as exact (hi, lo)
    int64 pairs (the q_linreg_price_qty overflow discipline; the
    arithmetic-shift identity keeps negative XY products exact) — and
    the driver folds Python ints.  theta and the adjusted means are the
    IDENTICAL double chain on the same integers in engine and oracle,
    entering the compare as FLOOR micro-units; the theta row (and the
    adjustment) exists only when the pooled covariate variance is
    nonzero, mirrored by the oracle's guard."""
    import math

    cut_us = int(pd.Timestamp(INC_CUTOFF).value // 1000)

    def user_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        if len(t) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "pre_cents": pa.array([], pa.int64()),
                    "post_cents": pa.array([], pa.int64()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.rint(
            round_half_away(t.column("value").to_numpy(zero_copy_only=False), 2)
            * 100.0
        ).astype(np.int64)
        pre = np.where(ts_us < cut_us, cents, 0)
        post = np.where(ts_us < cut_us, 0, cents)
        tt = pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "pre_cents": pa.array(pre),
                "post_cents": pa.array(post),
            }
        )
        g = tt.group_by("user_id").aggregate(
            [("pre_cents", "sum"), ("post_cents", "sum")]
        )
        return g.rename_columns(["user_id", "pre_cents", "post_cents"])

    ds = _read(
        sf_dir,
        "events",
        ["user_id", "ts", "event_type", "value"],
        rows_per_block=12_500,
    )
    users, _ = _two_regime_sum(
        ds.map_batches(user_partial, batch_format="pyarrow"),
        ["user_id"],
        ["pre_cents", "post_cents"],
        empty_types={"user_id": pa.int64()},
    )

    dig_cols = ["n", "sx", "sy", "sxx_hi", "sxx_lo", "sxy_hi", "sxy_lo"]

    def digest(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        x = t.column("pre_cents").to_numpy(zero_copy_only=False)
        y = t.column("post_cents").to_numpy(zero_copy_only=False)
        grp = np.where(np.mod(uid, 2) == 0, "t", "c")
        xx = x * x
        xy = x * y
        tt = pa.table(
            {
                "grp": pa.array(grp, pa.string()),
                "n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx_hi": pa.array(xx >> np.int64(32)),
                "sxx_lo": pa.array(xx & np.int64(0xFFFFFFFF)),
                "sxy_hi": pa.array(xy >> np.int64(32)),
                "sxy_lo": pa.array(xy & np.int64(0xFFFFFFFF)),
            }
        )
        g = tt.group_by("grp").aggregate([(c, "sum") for c in dig_cols])
        return g.rename_columns(["grp"] + dig_cols)

    parts = typed_collect(
        users.map_batches(digest, batch_format="pyarrow"),
        pa.schema([("grp", pa.string())] + [(c, pa.int64()) for c in dig_cols]),
    )
    agg = {}
    for g in ("c", "t"):
        grp = parts[parts["grp"] == g]
        n = sum(int(v) for v in grp["n"])
        sx = sum(int(v) for v in grp["sx"])
        sy = sum(int(v) for v in grp["sy"])
        sxx = (sum(int(v) for v in grp["sxx_hi"]) << 32) + sum(
            int(v) for v in grp["sxx_lo"]
        )
        sxy = (sum(int(v) for v in grp["sxy_hi"]) << 32) + sum(
            int(v) for v in grp["sxy_lo"]
        )
        agg[g] = (n, sx, sy, sxx, sxy)
    rows = []
    for g in ("c", "t"):
        n, sx, sy, _sxx, _sxy = agg[g]
        mean_micro = int(math.floor(1_000_000 * (float(sy) / n))) if n else 0
        rows.append((g, n, sx, sy, mean_micro, 0))
    n_all = agg["c"][0] + agg["t"][0]
    sx_all = agg["c"][1] + agg["t"][1]
    sy_all = agg["c"][2] + agg["t"][2]
    sxx_all = agg["c"][3] + agg["t"][3]
    sxy_all = agg["c"][4] + agg["t"][4]
    if n_all > 0:
        nf = float(n_all)
        var_num = nf * float(sxx_all) - float(sx_all) * float(sx_all)
        if var_num != 0.0 and agg["c"][0] > 0 and agg["t"][0] > 0:
            theta = (nf * float(sxy_all) - float(sx_all) * float(sy_all)) / var_num
            mu = float(sx_all) / nf
            for i, g in enumerate(("c", "t")):
                n, sx, sy, _sxx, _sxy = agg[g]
                adj = (float(sy) / n) - theta * ((float(sx) / n) - mu)
                rows[i] = rows[i][:5] + (int(math.floor(1_000_000 * adj)),)
            rows.append(
                ("theta", 0, 0, 0, 0, int(math.floor(1_000_000 * theta)))
            )
    out = pd.DataFrame(
        rows,
        columns=["grp", "n_users", "sum_pre_cents", "sum_post_cents",
                 "mean_post_micro", "adj_micro"],
    )
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out.sort_values("grp").reset_index(drop=True)


# ----------------------------------------------------------------------
# Trailing-window distinct actives (the WAU/MAU product metric)
WAU_WINDOW_DAYS = 7
WAU_BUCKETS = 64


def q_rolling_active_users(sf_dir: str):
    """Trailing 7-day ACTIVE USERS per day (the WAU product metric) —
    EXACT rolling distinct, which no mergeable aggregate gives directly:
    the dual form does.  A user is active in window d iff they have an
    event in [d-6, d]; so each user's contribution is a UNION OF DAY
    INTERVALS (an active day a covers windows [a, a+6]; runs of days
    with gaps <= 6 merge into one interval), and WAU(d) = how many user
    intervals cover d — the q_peak_concurrency sweep applied to
    per-user coverage intervals.

    Plan: one exchange dedups (user, day) pairs on user-splitmix buckets
    (per-bucket distinct is globally exact — a user's days co-locate);
    each bucket merges its users' day runs VECTORIZED (sort + gap>6 run
    breaks, no per-user Python) and emits only interval BOUNDARY deltas
    (+1 at start, -1 at end+7).  `_two_regime_sum` nets deltas per day;
    the driver prefix-sums the day-bounded delta table (time-bounded at
    any corpus size — the q_cusum argument).  Integer end to end; the
    oracle recomputes windows via the day-spine COUNT(DISTINCT) join and
    the repo's pinned float-floor day rule (exact for |day| < 1e5 since
    1/86400e6 exceeds the quotient ulp)."""
    ds = _read(
        sf_dir, "events", ["user_id", "ts"], rows_per_block=100_000
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = np.floor_divide(ts_us, 86_400_000_000)
        df = pd.DataFrame({"user_id": uid, "day": day}).drop_duplicates()
        mixed = df["user_id"].to_numpy(np.int64).astype(np.uint64) * np.uint64(
            0x9E3779B97F4A7C15
        )
        df["bucket"] = (mixed % np.uint64(WAU_BUCKETS)).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_deltas(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"]
        )
        u = g["user_id"].to_numpy(np.int64)
        d = g["day"].to_numpy(np.int64)
        if len(g) == 0:
            return pd.DataFrame(
                {"day": pd.Series(dtype="int64"), "delta": pd.Series(dtype="int64")}
            )
        brk = np.r_[
            True, (u[1:] != u[:-1]) | (d[1:] - d[:-1] > WAU_WINDOW_DAYS - 1)
        ]
        starts = d[brk]
        ends = d[np.r_[brk[1:], True]]  # last day of each run
        out = pd.DataFrame(
            {
                "day": np.concatenate([starts, ends + WAU_WINDOW_DAYS]),
                "delta": np.concatenate(
                    [
                        np.ones(len(starts), np.int64),
                        -np.ones(len(ends), np.int64),
                    ]
                ),
            }
        )
        return out.groupby("day", as_index=False)["delta"].sum()

    parts = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: bucket_deltas(g.drop(columns=["bucket"])),
            batch_format="pandas",
        )
    )
    red, _ = _two_regime_sum(parts, ["day"], ["delta"])
    dl = typed_collect(
        red, pa.schema([("day", pa.int64()), ("delta", pa.int64())])
    )
    if len(dl) == 0:
        return pd.DataFrame(
            {"day": pd.Series(dtype="int64"), "wau": pd.Series(dtype="int64")}
        )
    dl = dl.sort_values("day")
    days = dl["day"].to_numpy(np.int64)
    run = np.cumsum(dl["delta"].to_numpy(np.int64))
    # expand to every day with positive coverage: between consecutive
    # boundary days the level is constant
    out_days, out_wau = [], []
    for i in range(len(days)):
        lvl = int(run[i])
        if lvl <= 0:
            continue
        nxt = int(days[i + 1]) if i + 1 < len(days) else int(days[i])
        span = np.arange(days[i], nxt if i + 1 < len(days) else days[i] + 1)
        out_days.append(span)
        out_wau.append(np.full(len(span), lvl, np.int64))
    if not out_days:
        return pd.DataFrame(
            {"day": pd.Series(dtype="int64"), "wau": pd.Series(dtype="int64")}
        )
    out = pd.DataFrame(
        {
            "day": np.concatenate(out_days).astype(np.int64),
            "wau": np.concatenate(out_wau),
        }
    )
    return out.sort_values("day").reset_index(drop=True)


def q_new_vs_returning(sf_dir: str):
    """Daily NEW vs RETURNING active users — the acquisition/retention
    split on every product dashboard: a user is 'new' on their first-ever
    active day, 'returning' on any later active day.

    Plan: the (user, day) distinct pairs dedup on user-splitmix buckets
    (one exchange — a user's days co-locate, so per-bucket distinct AND
    the per-user MIN day are both globally exact in the same fold); each
    bucket emits (day, n_new, n_returning) partials classified against
    its own users' first days; `_two_regime_sum` nets per day.  Integer
    end to end; the repo's pinned float-floor day rule."""
    ds = _read(sf_dir, "events", ["user_id", "ts"], rows_per_block=100_000)

    def pair_partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = np.floor_divide(ts_us, 86_400_000_000)
        df = pd.DataFrame({"user_id": uid, "day": day}).drop_duplicates()
        mixed = df["user_id"].to_numpy(np.int64).astype(np.uint64) * np.uint64(
            0x9E3779B97F4A7C15
        )
        df["bucket"] = (mixed % np.uint64(WAU_BUCKETS)).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "day": pd.Series(dtype="int64"),
                    "n_new": pd.Series(dtype="int64"),
                    "n_returning": pd.Series(dtype="int64"),
                }
            )
        first = g.groupby("user_id")["day"].transform("min")
        g = g.assign(is_new=(g["day"] == first).astype("int64"))
        out = g.groupby("day", as_index=False).agg(
            n_new=("is_new", "sum"), n_active=("is_new", "size")
        )
        out["n_returning"] = (out["n_active"] - out["n_new"]).astype("int64")
        out["n_new"] = out["n_new"].astype("int64")
        return out[["day", "n_new", "n_returning"]]

    parts = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: classify(g.drop(columns=["bucket"])),
            batch_format="pandas",
        )
    )
    red, _ = _two_regime_sum(parts, ["day"], ["n_new", "n_returning"])
    out = typed_collect(
        red,
        pa.schema(
            [("day", pa.int64()), ("n_new", pa.int64()), ("n_returning", pa.int64())]
        ),
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("day").reset_index(drop=True)
