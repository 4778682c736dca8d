"""Last-writer-wins reduction kernels (pure Arrow, no content copies).

The reference's core dedup keeps rank-1 of ``ROW_NUMBER() OVER (PARTITION BY
unique_id, event_fingerprint ORDER BY collector_tstamp, enricher_tstamp,
load_tstamp)`` (``mod_load_data_get_data.sql:16,21-32``). Here the per-key
total order is the commit LSN and we keep the *last* writer; replay
duplicates (same LSN, identical payload) collapse to one row, making
re-applies no-ops (``mod_data_insert.sql:5-6`` semantics).

``last_writer`` is associative over row subsets, so it can be applied
per-batch (pre-reduction before the shuffle — the skew/salt story, see
``partitioning``), then again per-bucket, then against held state, always
yielding the same winners.

Implementation: two hash-join passes (group-max LSN join, then group-max
row-index join to break exact-LSN duplicate ties deterministically) —
``pyarrow.Table.join`` moves only key columns through the hash table and
``take``s winning rows, so large ``content`` values are never copied per-row
in Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KEYS = ["repo", "path"]
ORDER = "lsn"
_IDX = "__rowi"


def last_writer(
    t: pa.Table, keys: list[str] | None = None, order: str = ORDER
) -> pa.Table:
    """One row per key: max ``order``; ties (replay dups) broken by last
    physical row. Output column order == input column order."""
    keys = list(keys or KEYS)
    if t.num_rows == 0:
        return t
    names = t.schema.names
    winners = t.group_by(keys).aggregate([(order, "max")])
    winners = winners.select(keys + [f"{order}_max"]).rename_columns(keys + [order])
    # _IDX is stamped on the INPUT (before any join) so the exact-order-key
    # tie-break reflects true input position — Acero join output order is not
    # guaranteed deterministic, so indexing after the join would make "last
    # physical row" depend on join internals.
    t = t.append_column(_IDX, pa.array(np.arange(t.num_rows, dtype=np.int64)))
    cand = t.join(winners, keys=keys + [order], join_type="inner")
    if cand.num_rows > winners.num_rows:
        # exact-order-key duplicates: keep the last input occurrence
        w2 = cand.group_by(keys).aggregate([(_IDX, "max")])
        w2 = w2.select(keys + [f"{_IDX}_max"]).rename_columns(keys + [_IDX])
        cand = cand.join(w2, keys=keys + [_IDX], join_type="inner")
    return cand.select(names)
