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

Implementation: the dedup runs entirely on a NARROW projection
``(keys, order, row-index)`` — group-max join picks the winning order value,
a second group-max join breaks exact-order duplicate ties by last input
position — and the winning row indices then ``take`` from the original
table. Payload columns (``content``, nested ``meta`` structs, …) never enter
the Acero hash join, which both keeps large strings out of the join build
side and side-steps Acero's no-nested-payload restriction.
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
    physical row. Output rows in input order; column order preserved."""
    keys = list(keys or KEYS)
    if t.num_rows == 0:
        return t
    # _IDX is stamped on the INPUT (before any join) so the exact-order-key
    # tie-break reflects true input position — Acero join output order is not
    # guaranteed deterministic, so indexing after the join would make "last
    # physical row" depend on join internals.
    narrow = t.select(keys + [order]).append_column(
        _IDX, pa.array(np.arange(t.num_rows, dtype=np.int64))
    )
    winners = narrow.group_by(keys).aggregate([(order, "max")])
    winners = winners.select(keys + [f"{order}_max"]).rename_columns(keys + [order])
    cand = narrow.join(winners, keys=keys + [order], join_type="inner")
    if cand.num_rows > winners.num_rows:
        # exact-order-key duplicates: keep the last input occurrence
        idx = cand.group_by(keys).aggregate([(_IDX, "max")])[f"{_IDX}_max"]
    else:
        idx = cand[_IDX]
    return t.take(pa.array(np.sort(idx.to_numpy())))
