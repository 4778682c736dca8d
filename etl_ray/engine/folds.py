"""Per-key state-fold metrics applied inside the merge applier.

Reference analog: the semantic layer's ``user_history_formula`` — a metric
defined as ``fold(prev_value, new_value)`` against PRIOR state, applied
during the daily user_history state fold
(``materialized_fields_config.py:28,63``,
``user_history_parser.py:129-167``; the A5 fold formulas
``insert_user_history.sql:227-299`` — days_active, mau_lost/reactivated,
payer transitions — are exactly this shape: non-commutative, order- and
prior-state-dependent).

A :class:`FoldSpec` owns columns on the state row and folds them against
the tick's UNREDUCED per-key delta events. The data path pre-reduces each
batch to per-key winners (the combiner), so fold inputs ship separately as
a NARROW projection — ``(repo, path, lsn, day_num, deleted)``, ~2% of the
content bytes — through the same indexed spill-shuffle files, meaning the
fold sees every distinct event. Events fold strictly LSN-sorted; replay
duplicates are dropped exactly via a bounded-lateness LSN tail persisted
with each bucket's state (see ``apply.apply_folds``).

Ordering caveat (same semantics as the reference's daily partitions):
within one tick the fold order is exact global LSN order; across ticks a
bounded-late event folds after its true successors. ``change_count`` is
order-free; ``days_active`` stays exact for lateness < 1 day (the
``prev_day`` second-counted-day memory); ``reactivations`` can be off by a
boundary case under cross-tick lateness — the reference heals the same
window by recomputing D-2..D0 (``DAG_external_source.py:177-224``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

KEY = ["repo", "path"]

#: columns of the narrow fold-delta projection handed to every fold
DELTA_COLS = ["repo", "path", "lsn", "day_num", "deleted"]


@dataclass(frozen=True)
class FoldSpec:
    """``fold(prev, deltas) -> new`` where ``prev`` is a DataFrame indexed
    by (repo, path) holding this spec's ``state_cols`` for the TOUCHED keys
    (NaN rows for keys new to the lake) and ``deltas`` is the tick's
    deduped, LSN-sorted narrow delta frame (``DELTA_COLS``). Returns a
    DataFrame indexed by (repo, path) with the new ``state_cols`` values
    for exactly the touched keys."""

    name: str
    state_cols: tuple[tuple[str, object], ...]  # (column, pyarrow type)
    fold: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame]

    @property
    def col_names(self) -> list[str]:
        return [c for c, _ in self.state_cols]


def _fold_change_count(prev: pd.DataFrame, deltas: pd.DataFrame) -> pd.DataFrame:
    """prev + number of distinct new events (deletes included) — the
    additive ``_total`` counter class (``insert_user_history.sql:267-268``)."""
    n = deltas.groupby(KEY).size()
    base = pd.to_numeric(prev["change_count"], errors="coerce").fillna(0)
    return base.add(n, fill_value=0).astype("int64").to_frame("change_count")


CHANGE_COUNT = FoldSpec(
    name="change_count",
    state_cols=(("change_count", pa.int64()),),
    fold=_fold_change_count,
)


def activity_fold(gap_days: int = 7) -> FoldSpec:
    """days_active / last_day / reactivations — the DAU/MAU-transition
    class (``insert_user_history.sql:274-287`` days_active and
    mau_lost/mau_reactivated formulas).

    - ``days_active``: distinct event days per key. Exact under lateness
      < 1 day: ``prev_day`` remembers the second-largest counted day so a
      late event on ``last_day − 1`` is not double counted.
    - ``reactivations``: events whose day-gap from the key's previous
      event exceeds ``gap_days``.
    """
    cols = (
        ("days_active", pa.int64()),
        ("last_day", pa.int64()),
        ("prev_day", pa.int64()),
        ("reactivations", pa.int64()),
    )

    def fold(prev: pd.DataFrame, deltas: pd.DataFrame) -> pd.DataFrame:
        d = deltas  # sorted by lsn; day_num nondecreasing per key
        key_idx = pd.MultiIndex.from_frame(d[KEY])
        prev_last = pd.to_numeric(prev["last_day"], errors="coerce")
        prev_prev = pd.to_numeric(prev["prev_day"], errors="coerce")

        # ---- reactivations: per-event day gap vs the previous event ----
        lag = d.groupby(KEY)["day_num"].shift(1)
        lag = lag.where(lag.notna(), pd.Series(key_idx.map(prev_last), index=d.index))
        gap = d["day_num"] - lag
        hits = (gap > gap_days).astype("int64")
        react_new = pd.Series(hits.to_numpy(), index=key_idx).groupby(level=KEY).sum()

        # ---- days_active: count in-tick days not already counted ----
        dd = d.drop_duplicates(KEY + ["day_num"])
        dd_idx = pd.MultiIndex.from_frame(dd[KEY])
        last = pd.Series(dd_idx.map(prev_last), index=dd.index)
        prv = pd.Series(dd_idx.map(prev_prev), index=dd.index)
        day = dd["day_num"]
        counted_before = (day == last) | (day == prv)
        new_days = (
            pd.Series((~counted_before).astype("int64").to_numpy(), index=dd_idx)
            .groupby(level=KEY)
            .sum()
        )

        # ---- new last/prev counted days: top-2 of (in-tick ∪ prev two) ----
        cand = pd.concat(
            [
                dd.assign(_day=day)[KEY + ["_day"]],
                prev.reset_index()[KEY].assign(_day=prev_last.to_numpy()),
                prev.reset_index()[KEY].assign(_day=prev_prev.to_numpy()),
            ],
            ignore_index=True,
        ).dropna(subset=["_day"])
        cand = cand.drop_duplicates(KEY + ["_day"]).sort_values(
            KEY + ["_day"], ascending=[True, True, False], kind="mergesort"
        )
        top2 = cand.groupby(KEY).head(2).copy()
        top2["_rank"] = top2.groupby(KEY).cumcount()
        wide = top2.pivot_table(
            index=KEY, columns="_rank", values="_day", aggfunc="first"
        )
        new_last = wide[0]
        new_prev = wide[1] if 1 in wide.columns else pd.Series(np.nan, index=wide.index)

        out = pd.DataFrame(index=new_last.index)
        out["days_active"] = (
            pd.to_numeric(prev["days_active"], errors="coerce")
            .fillna(0)
            .add(new_days, fill_value=0)
            .astype("int64")
        )
        out["last_day"] = new_last.astype("int64")
        out["prev_day"] = pd.array(new_prev, dtype="Int64")
        out["reactivations"] = (
            pd.to_numeric(prev["reactivations"], errors="coerce")
            .fillna(0)
            .add(react_new, fill_value=0)
            .astype("int64")
        )
        return out

    return FoldSpec(name=f"activity_{gap_days}d", state_cols=cols, fold=fold)


DEFAULT_FOLDS: list[FoldSpec] = [CHANGE_COUNT, activity_fold(7)]


def fold_state_fields(folds: list[FoldSpec]) -> list[pa.Field]:
    return [pa.field(c, t) for f in folds for c, t in f.state_cols]


def fold_delta_projection(batch: pa.Table) -> pa.Table:
    """The narrow unreduced projection the spill stage ships for folds."""
    ts = batch["commit_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    day_num = ts // 86_400_000_000
    import pyarrow.compute as pc

    return pa.table(
        {
            "repo": batch["repo"],
            "path": batch["path"],
            "lsn": batch["lsn"],
            "day_num": pa.array(day_num, pa.int64()),
            "deleted": pc.equal(batch["op"], "delete"),
        }
    )
