"""Relational operators over the TPC-H-ish tables — joins, aggregates,
set ops, sorts — each the Ray-Data expression of a reference operator class.

Scale notes per op are in the docstrings; the shared conventions (read-time
column pruning, per-batch partial aggregation, broadcast small sides,
rounded float outputs) are in ``ops.common``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .common import keep_extreme, partial_groupby, read, read_arrow, round_cols


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q1-style wide aggregate (A4/A8/A10 analog: grouped SUM/AVG/COUNT
    rollups, ``insert_user_history.sql:92-118``).

    Per-batch Arrow partials → tiny groupby; AVGs derived from SUM/COUNT on
    the driver (exact), floats rounded for cross-engine hash equality.
    """
    ds = read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )

    def derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"))))
        # Per-row quantization to the cent grid BEFORE summation, via the
        # explicit IEEE-deterministic formula floor(x*100 + 0.5)/100 (written
        # identically in the DuckDB oracle): the sums are then exact grid
        # multiples in every engine regardless of summation order — no
        # ULP-at-rounding-boundary flakiness, no round-half-mode mismatch.
        def cents(x):
            return pc.divide(pc.floor(pc.add(pc.multiply(x, pa.scalar(100.0)), pa.scalar(0.5))), pa.scalar(100.0))

        disc = cents(pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])))
        charge = cents(pc.multiply(disc, pc.add(pa.scalar(1.0), t["l_tax"])))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "l_extendedprice": t["l_extendedprice"],
                "l_discount": t["l_discount"],
                "disc_price": disc,
                "charge": charge,
            }
        )

    ds = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    out = partial_groupby(
        ds,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "sum_base_price": ("l_extendedprice", "sum"),
            "sum_disc_price": ("disc_price", "sum"),
            "sum_charge": ("charge", "sum"),
            "sum_disc": ("l_discount", "sum"),
        },
        count_col="count_order",
    )
    df = out.to_pandas()
    df["avg_qty"] = df["sum_qty"] / df["count_order"]
    df["avg_price"] = df["sum_base_price"] / df["count_order"]
    df["avg_disc"] = df["sum_disc"] / df["count_order"]
    df = df.drop(columns=["sum_disc"])
    df = round_cols(
        df,
        {
            "sum_qty": 2,
            "sum_base_price": 2,
            "sum_disc_price": 2,
            "sum_charge": 2,
            "avg_qty": 6,
            "avg_price": 6,
            "avg_disc": 6,
        },
    )
    return df.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


class _DimJoiner:
    """Broadcast dim join (J3 analog: ``insert_user_history.sql:102-108``).

    The dimension (custkey → nation/region names) is built ONCE on the
    driver, ``ray.put`` once, and materialized per actor in ``__init__`` as a
    dense numpy lookup (custkeys are dense ints) — no shuffle, no per-batch
    re-ship.
    """

    def __init__(self, ref):
        cust_key, nation_arr, region_arr = ray.get(ref)
        self.size = cust_key.max() + 1
        self.nation = np.full(self.size, "", dtype=object)
        self.region = np.full(self.size, "", dtype=object)
        self.nation[cust_key] = nation_arr
        self.region[cust_key] = region_arr

    def __call__(self, t: pa.Table) -> pa.Table:
        keys = t["o_custkey"].to_numpy()
        return pa.table(
            {
                "region": pa.array(self.region[keys], pa.string()),
                "nation": pa.array(self.nation[keys], pa.string()),
                "o_totalprice": t["o_totalprice"],
            }
        )


def revenue_by_region(sf_dir: str) -> pd.DataFrame:
    """Orders → customer → nation → region broadcast join + grouped rollup."""
    cust = read_arrow(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = read_arrow(sf_dir, "nation").to_pandas()
    region = read_arrow(sf_dir, "region").to_pandas()
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey").merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )
    ref = ray.put(
        (
            dim["c_custkey"].to_numpy(),
            dim["n_name"].to_numpy(),
            dim["r_name"].to_numpy(),
        )
    )
    ds = read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    ds = ds.map_batches(
        _DimJoiner, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=(1, 4)
    )
    out = partial_groupby(
        ds,
        ["region", "nation"],
        {"revenue": ("o_totalprice", "sum")},
        count_col="orders",
    )
    df = out.to_pandas()
    df = round_cols(df, {"revenue": 2})
    return df.sort_values(["region", "nation"]).reset_index(drop=True)


def customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti-join via broadcast key set (J5 analog:
    ``insert_user_history.sql:307-311``): customers with no high-value
    (>450k) order. At 100 TB the broadcast set becomes a Bloom filter +
    verify pass; here the distinct key set is small."""
    okeys = read_arrow(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    okeys = okeys.filter(pc.greater(okeys["o_totalprice"], 450_000.0))
    key_set = ray.put(set(pc.unique(okeys["o_custkey"]).to_pylist()))

    class AntiFilter:
        def __init__(self):
            self.keys = pa.array(sorted(ray.get(key_set)), pa.int64())

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(pc.is_in(t["c_custkey"], value_set=self.keys)))

    ds = read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    ds = ds.map_batches(AntiFilter, batch_format="pyarrow", concurrency=(1, 2))
    df = ds.to_pandas()
    if df.empty:
        df = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"), "c_name": pd.Series(dtype=object)})
    return df.sort_values("c_custkey").reset_index(drop=True)


def top_orders(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Global top-k (§2.6: the engine adds what the reference delegates to
    SQL ORDER BY) — shuffle-free: per-batch partial top-k (≤k rows per batch
    leave each task), tiny driver merge. A global ``ds.sort`` would be an
    all-to-all for k=10."""
    ds = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "ascending")],
        )[:k]
        return t.take(idx)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    df = parts.to_pandas()  # ≤ k rows per input batch
    df = (
        df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return round_cols(df, {"o_totalprice": 2})


def part_brand_union(sf_dir: str) -> pd.DataFrame:
    """UNION ALL of two filtered projections + grouped count (D7 analog:
    ``update_user_map.sql:31-141`` 5-way union)."""
    a = read(sf_dir, "part", columns=["p_brand", "p_size"]).map_batches(
        lambda t: t.filter(pc.greater(t["p_size"], 25)).select(["p_brand"]),
        batch_format="pyarrow",
    )
    b = read(sf_dir, "part", columns=["p_brand", "p_retailprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["p_retailprice"], 1500.0)).select(["p_brand"]),
        batch_format="pyarrow",
    )
    out = partial_groupby(a.union(b), ["p_brand"], {}, count_col="n")
    return out.to_pandas().sort_values("p_brand").reset_index(drop=True)


def monthly_order_totals(sf_dir: str) -> pd.DataFrame:
    """Month-truncated rollup (M9 analog:
    ``insert_user_history_derivates.sql:26-45`` DATE_TRUNC views)."""
    ds = read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def derive(t: pa.Table) -> pa.Table:
        month = pc.strftime(t["o_orderdate"], format="%Y-%m-01")
        return pa.table({"month": month, "o_totalprice": t["o_totalprice"]})

    ds = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    out = partial_groupby(ds, ["month"], {"revenue": ("o_totalprice", "sum")}, count_col="orders")
    df = round_cols(out.to_pandas(), {"revenue": 2})
    return df.sort_values("month").reset_index(drop=True)


def latest_order_per_customer(sf_dir: str) -> pd.DataFrame:
    """Latest-batch-winner dedup (D5 analog: ``spark_job_cost_etl.py:357-370``
    ROW_NUMBER desc = 1): one row per customer, max (o_orderdate, o_orderkey)."""
    ds = read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
    out = keep_extreme(ds, ["o_custkey"], ["o_orderdate", "o_orderkey"], keep="last")
    df = out.to_pandas()
    df["o_orderdate"] = df["o_orderdate"].dt.strftime("%Y-%m-%d")
    df = round_cols(df, {"o_totalprice": 2})
    return df.sort_values("o_custkey").reset_index(drop=True)[
        ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    ]


def orders_asof_last_event(sf_dir: str, n_buckets: int = 8) -> pd.DataFrame:
    """As-of join (D6/J6 analog — latest version with ``updated_at <= date``,
    ``insert_user_history.sql:71-89``): for each event, the most recent order
    of the same key with o_orderdate <= ts.

    Ray expression: tagged-union bucket shuffle of BOTH sides by hash(key) —
    the same co-partitioning pattern as ``order_lineitem_join`` — then
    ``pd.merge_asof`` per bucket. Neither side is materialized on the driver
    or broadcast whole; both stream through the one groupby shuffle. Orders
    are deduped to one per (custkey, orderdate) inside the bucket so the
    as-of winner is deterministic in both engines.
    """
    events = read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def tag_events(t: pa.Table) -> pa.Table:
        key = pc.cast(t["user_id"], pa.int64())
        return pa.table(
            {
                "bucket": pc.cast(pc.bit_wise_and(key, n_buckets - 1), pa.int32()),
                "side": pa.array(["e"] * t.num_rows, pa.string()),
                "key": key,
                "t": pc.cast(t["ts"], pa.timestamp("us")),
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        key = pc.cast(t["o_custkey"], pa.int64())
        return pa.table(
            {
                "bucket": pc.cast(pc.bit_wise_and(key, n_buckets - 1), pa.int32()),
                "side": pa.array(["o"] * t.num_rows, pa.string()),
                "key": key,
                "t": pc.cast(t["o_orderdate"], pa.timestamp("us")),
                "event_id": pa.nulls(t.num_rows, pa.int64()),
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            }
        )

    tagged = events.map_batches(tag_events, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == "e"][["key", "t", "event_id"]].sort_values(
            "t", kind="mergesort"
        )
        o = g[g["side"] == "o"][["key", "t", "o_orderkey"]]
        if len(e) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "t": pd.Series(dtype="datetime64[us]"),
                    "o_orderkey": pd.Series(dtype="Int64"),
                }
            )
        if len(o) == 0:
            m = e.copy()
            m["o_orderkey"] = pd.array([None] * len(m), dtype="Int64")
        else:
            # one order per (key, date): max o_orderkey wins (deterministic)
            o = (
                o.sort_values(["key", "t", "o_orderkey"])
                .drop_duplicates(["key", "t"], keep="last")
                .sort_values("t", kind="mergesort")
            )
            m = pd.merge_asof(e, o, on="t", by="key", direction="backward")
        m["o_orderkey"] = m["o_orderkey"].astype("Int64")
        # events-side rows are never null here, but the tagged union's
        # orders-side nulls promoted the column to float64 on conversion —
        # restore int64 so the result matches the oracle exactly.
        m["event_id"] = m["event_id"].astype("int64")
        m = m.rename(columns={"key": "user_id"})
        return m[["event_id", "user_id", "t", "o_orderkey"]]

    out = tagged.groupby("bucket").map_groups(asof_bucket, batch_format="pandas")
    df = out.to_pandas()
    from .common import epoch_us

    df["ts_us"] = epoch_us(df["t"])
    return (
        df[["event_id", "user_id", "ts_us", "o_orderkey"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def order_lineitem_join(sf_dir: str, n_buckets: int = 16) -> pd.DataFrame:
    """Large⋈large partitioned hash join (J1/J4 analog — both sides big, no
    broadcast): bucket BOTH sides by hash(join key) % B, co-locate buckets
    via one groupby shuffle over the tagged union, then join each bucket
    pairwise in ``map_groups`` (guide §"Joins and lookups" portable
    pattern). Emits per-order revenue vs header total.

    Scale notes: ONE shuffle over both inputs; B chosen ≈ cluster CPUs;
    skewed keys would be salted into sub-buckets then re-merged (same
    associativity argument as the engine's LWW salt cells)."""
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    lines = read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def tag_orders(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t["o_orderkey"],
                "bucket": pc.cast(
                    pc.bit_wise_and(t["o_orderkey"], n_buckets - 1), pa.int32()
                ),
                "side": pa.array(["o"] * t.num_rows, pa.string()),
                "a": t["o_totalprice"],
                "b": pa.nulls(t.num_rows, pa.float64()),
            }
        )

    def tag_lines(t: pa.Table) -> pa.Table:
        def cents(x):
            return pc.divide(
                pc.floor(pc.add(pc.multiply(x, pa.scalar(100.0)), pa.scalar(0.5))),
                pa.scalar(100.0),
            )

        rev = cents(
            pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        )
        return pa.table(
            {
                "key": t["l_orderkey"],
                "bucket": pc.cast(
                    pc.bit_wise_and(t["l_orderkey"], n_buckets - 1), pa.int32()
                ),
                "side": pa.array(["l"] * t.num_rows, pa.string()),
                "a": pa.nulls(t.num_rows, pa.float64()),
                "b": rev,
            }
        )

    tagged = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        lines.map_batches(tag_lines, batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == "o"][["key", "a"]].rename(columns={"a": "o_totalprice"})
        l = (
            g[g["side"] == "l"]
            .groupby("key", as_index=False)
            .agg(line_revenue=("b", "sum"), n_lines=("b", "size"))
        )
        m = o.merge(l, on="key", how="inner")
        m["line_revenue"] = m["line_revenue"].round(2)
        m["o_totalprice"] = m["o_totalprice"].round(2)
        m["n_lines"] = m["n_lines"].astype("int64")
        return m.rename(columns={"key": "o_orderkey"})

    out = tagged.groupby("bucket").map_groups(join_bucket, batch_format="pandas")
    return out.to_pandas().sort_values("o_orderkey").reset_index(drop=True)[
        ["o_orderkey", "o_totalprice", "line_revenue", "n_lines"]
    ]


def events_csv_roundtrip(sf_dir: str) -> pd.DataFrame:
    """CSV source (S4 analog: ``spark_job_data_locker.py:413-421``
    schema-on-read CSV ingest): export events to CSV once (driver-side
    fixture), read back via ``ray.data.read_csv``, cast types (M4 declarative
    cast-map), aggregate — proves the non-parquet source path end-to-end."""
    import os

    import pyarrow.csv as pacsv

    # cache keyed by the SOURCE file identity (path+mtime+size), not just the
    # directory basename — two datasets named sf0.01, or a regenerated
    # parquet, must not reuse a stale export
    import hashlib as _hashlib

    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    fp = _hashlib.md5(f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}".encode()).hexdigest()[:12]
    csv_dir = os.path.join("/tmp/etl_ray", f"csv-{fp}")
    os.makedirs(csv_dir, exist_ok=True)
    csv_path = os.path.join(csv_dir, "events.csv")
    if not os.path.exists(csv_path):
        t = read_arrow(sf_dir, "events", ["event_id", "user_id", "event_type", "value"])
        pacsv.write_csv(t, csv_path + ".tmp")
        os.replace(csv_path + ".tmp", csv_path)

    ds = ray.data.read_csv(csv_path)

    def cast(t: pa.Table) -> pa.Table:
        # declarative cast map (CSV schema-on-read may infer differently)
        return pa.table(
            {
                "event_type": pc.cast(t["event_type"], pa.string()),
                "value": pc.cast(t["value"], pa.float64()),
            }
        )

    ds = ds.map_batches(cast, batch_format="pyarrow")
    out = partial_groupby(ds, ["event_type"], {"total_value": ("value", "sum")}, count_col="n")
    df = out.to_pandas()
    df = round_cols(df, {"total_value": 6})
    return df.sort_values("event_type").reset_index(drop=True)[["event_type", "n", "total_value"]]


def entity_union_by_name(sf_dir: str) -> pd.DataFrame:
    """Schema-evolving UNION (the §1.3 additive-evolution util applied at
    the ops layer): customer and supplier share some columns; the union is
    promoted to the unified schema with null backfill for the columns a
    side lacks (``align_to`` — same kernel the engine uses for old lake
    partitions)."""
    import pyarrow as pa

    from ..engine.schema_evo import align_to

    target = pa.schema(
        [
            ("kind", pa.string()),
            ("name", pa.string()),
            ("nationkey", pa.int32()),
            ("acctbal", pa.float64()),
            ("mktsegment", pa.string()),
        ]
    )

    def cust(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "kind": pa.array(["customer"] * t.num_rows, pa.string()),
                "name": t["c_name"],
                "nationkey": t["c_nationkey"],
                "acctbal": pc.round(t["c_acctbal"], ndigits=2),
                "mktsegment": t["c_mktsegment"],
            }
        )
        return align_to(out, target)

    def supp(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "kind": pa.array(["supplier"] * t.num_rows, pa.string()),
                "name": t["s_name"],
                "nationkey": t["s_nationkey"],
                "acctbal": pc.round(t["s_acctbal"], ndigits=2),
            }
        )
        return align_to(out, target)  # mktsegment backfilled null

    a = read(
        sf_dir, "customer", columns=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    ).map_batches(cust, batch_format="pyarrow")
    b = read(
        sf_dir, "supplier", columns=["s_name", "s_nationkey", "s_acctbal"]
    ).map_batches(supp, batch_format="pyarrow")
    return (
        a.union(b)
        .to_pandas()
        .sort_values(["kind", "name"])
        .reset_index(drop=True)
    )
