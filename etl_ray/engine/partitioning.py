"""Stable hash partitioning of the CDC key space.

The shuffle key for the whole engine is ``hash(repo, path) % num_buckets``
(SURVEY.md §4: one partitioning key, reused by every stage so state is never
re-shuffled between ticks). The hash must be stable across processes and
Python versions — we use pandas' vectorized siphash
(``pd.util.hash_pandas_object``) with its fixed default key, not Python's
salted ``hash()``.

Skew note: hot repos (Zipf head) are handled *before* this shuffle by the
per-batch last-writer pre-reduction in ``dedup.reduce_batch`` — a hot key
contributes at most one row per input batch to the shuffle, which is the
moral equivalent of salted sub-keys (each batch is a salt cell) followed by a
salt-merge in the bucket applier. An explicit (bucket, salt) two-stage path
is available via ``salt_of`` for pipelines whose reduction is not
batch-associative.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

BUCKET_COL = "__bucket"


def stable_hash64(*string_arrays: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized stable uint64 hash of the element-wise concatenation of
    one or more Arrow string columns (0x1f-separated)."""
    joined = (
        string_arrays[0]
        if len(string_arrays) == 1
        else pc.binary_join_element_wise(*string_arrays, "\x1f")
    )
    ser = joined.to_pandas()
    return pd.util.hash_pandas_object(ser, index=False).to_numpy()


def bucket_of(repo: pa.ChunkedArray, path: pa.ChunkedArray, num_buckets: int) -> pa.Array:
    h = stable_hash64(repo, path)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32))


def with_bucket(table: pa.Table, num_buckets: int) -> pa.Table:
    return table.append_column(
        BUCKET_COL, bucket_of(table["repo"], table["path"], num_buckets)
    )


def write_bucket_rgs(data: pa.Table, codes, path: str) -> tuple[list, list, list]:
    """Indexed shuffle file: one parquet, one ROW GROUP per bucket run
    (input must be sorted by bucket). Readers fetch only their row group —
    no per-(task, bucket) tiny-file explosion. Returns (buckets, rgs, rows).

    ``row_group_size`` covers each whole run: pyarrow splits at ~1M rows by
    default, which would strand a big run's tail in an unindexed group.
    """
    import numpy as np
    import pyarrow.parquet as pq

    bounds = np.flatnonzero(np.diff(codes)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(codes)]])
    buckets_out, rgs_out, rows_out = [], [], []
    writer = pq.ParquetWriter(path + ".tmp", data.schema, compression="snappy")
    try:
        for rg, (s, e) in enumerate(zip(starts, ends)):
            writer.write_table(data.slice(s, e - s), row_group_size=e - s)
            buckets_out.append(int(codes[s]))
            rgs_out.append(rg)
            rows_out.append(int(e - s))
    finally:
        writer.close()
    import os

    os.replace(path + ".tmp", path)
    return buckets_out, rgs_out, rows_out


def salt_of(lsn: pa.ChunkedArray, n_salts: int, window: int = 1 << 16) -> pa.Array:
    """Optional explicit salt for hot-key splitting: events of one key land in
    ``n_salts`` sub-cells by LSN window; sub-cells are reduced independently
    then merged (max-LSN wins) — correct because LWW is associative."""
    v = lsn.to_numpy() if hasattr(lsn, "to_numpy") else np.asarray(lsn)
    return pa.array(((v // window) % n_salts).astype(np.int32))
