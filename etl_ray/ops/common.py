"""Shared op utilities: reads, partial aggregation, keyed extremes, rounding.

Scale conventions used across the ops:

- read with ``columns=[...]`` so only needed columns leave storage;
- aggregations pre-reduce per batch (Arrow ``group_by``) before the global
  ``groupby`` shuffle — the combiner pattern (guide §"Aggregation at scale");
- keyed first/last selection pre-reduces per batch too (associative), so hot
  keys send one row per batch through the shuffle;
- float outputs are rounded (2 or 6 dp) at the END so Ray and DuckDB results
  hash identically despite summation-order ULP differences;
- day/month keys are formatted as strings (``YYYY-MM-DD``) to avoid
  timestamp-unit mismatches between Arrow and DuckDB.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    ds = ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)
    # strip the file's pandas schema metadata: metadata dicts make block
    # schemas unhashable, so every downstream unify (shuffle reduce,
    # multi-block batch formation) logs a warning per merge. Zero-copy,
    # metadata-only, fused with the next map stage.
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def read_arrow(sf_dir: str, table: str, columns: list[str] | None = None) -> pa.Table:
    """Driver-side read for small dimension tables (broadcast sides)."""
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def round_cols(df: pd.DataFrame, spec: dict[str, int]) -> pd.DataFrame:
    for c, nd in spec.items():
        df[c] = df[c].round(nd)
    return df


_AGGS = {"sum": Sum, "min": Min, "max": Max}


def partial_groupby(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    count_col: str | None = None,
) -> ray.data.Dataset:
    """Two-stage grouped aggregate: vectorized per-batch partials (Arrow
    ``group_by``) then a small global ``groupby`` over partial rows.

    ``aggs``: out_name → (in_col, 'sum'|'min'|'max'). ``count_col`` adds an
    exact COUNT(*) (sum of partial counts). Only partial rows — one per key
    per batch — go through the shuffle.
    """
    arrow_aggs = []
    renames = {}
    for out, (col, how) in aggs.items():
        arrow_aggs.append((col, how))
        renames[f"{col}_{how}"] = f"__p_{out}"
    if count_col:
        arrow_aggs.append(([], "count_all"))

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(arrow_aggs)
        names = []
        for nm in g.schema.names:
            if nm == "count_all":
                names.append(f"__p_{count_col}")
            else:
                names.append(renames.get(nm, nm))
        return g.rename_columns(names)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    final_aggs = []
    for out, (col, how) in aggs.items():
        fn = Sum if how == "sum" else _AGGS[how]  # partial sums re-sum; min/max idempotent
        final_aggs.append(fn(f"__p_{out}", alias_name=out))
    if count_col:
        final_aggs.append(Sum(f"__p_{count_col}", alias_name=count_col))
    return partials.groupby(keys).aggregate(*final_aggs)


def keep_extreme(
    ds: ray.data.Dataset,
    keys: list[str],
    order: list[str],
    *,
    keep: str = "first",
) -> ray.data.Dataset:
    """One row per key: min (``keep='first'``) or max (``'last'``) by the
    ``order`` column tuple. Associative → per-batch pre-reduction before the
    shuffle (hot keys contribute ≤1 row per batch), then per-group selection.

    Reference analog: rank-1 window dedup (``mod_load_data_get_data.sql:16``,
    ``insert_registration.sql:18-41``, ``spark_job_cost_etl.py:357-370``).
    """
    asc = keep == "first"

    def reduce_batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order, ascending=asc, kind="mergesort")
        return df.drop_duplicates(keys, keep="first")

    pre = ds.map_batches(reduce_batch, batch_format="pandas")
    return pre.groupby(keys).map_groups(reduce_batch, batch_format="pandas")


def epoch_us(ts: pd.Series) -> pd.Series:
    """Timestamps → int64 epoch microseconds (hash-stable across engines)."""
    return pd.Series(ts.to_numpy().astype("datetime64[us]").astype("int64"), index=ts.index)
