"""Additive schema evolution with null backfill.

The reference diffs desired columns against ``INFORMATION_SCHEMA`` and emits
``ALTER TABLE … ADD COLUMN`` for missing nullable columns
(``insert_user_history.sql:15-42``; same pattern in
``spark_job_data_locker.py:283-312``). Arrow-side, evolution is: unify the
observed schemas, then promote every batch/table to the unified schema by
appending all-null columns for missing fields — old rows read back with nulls,
untouched columns byte-identical.
"""

from __future__ import annotations

import pyarrow as pa

# lossless widening lattice: a column observed at two of these types unifies
# to the wider one (old data casts exactly). Deliberately NO int64→float64
# (lossy above 2^53) and no cross-kind promotion — those would break the
# byte-identical-old-rows guarantee the evolution contract promises.
_WIDENING: dict[pa.DataType, int] = {
    pa.int8(): 0,
    pa.int16(): 1,
    pa.int32(): 2,
    pa.int64(): 3,
}
_WIDENING_F: dict[pa.DataType, int] = {pa.float32(): 0, pa.float64(): 1}


def _promote(a: pa.DataType, b: pa.DataType) -> pa.DataType | None:
    """The unified type for one column seen at two types, or None."""
    if a == b:
        return a
    for lattice in (_WIDENING, _WIDENING_F):
        if a in lattice and b in lattice:
            return a if lattice[a] >= lattice[b] else b
    return None


def unify_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Additive union of schemas. New fields append in first-seen order; a
    field seen at two types unifies through the lossless widening lattice
    (int8→…→int64, float32→float64) and raises otherwise (only additive /
    widening evolution is supported, as in the reference)."""
    out_fields: list[pa.Field] = []
    seen: dict[str, pa.DataType] = {}
    order: dict[str, int] = {}
    for s in schemas:
        for f in s:
            if f.name in seen:
                t = _promote(seen[f.name], f.type)
                if t is None:
                    raise TypeError(
                        f"non-additive evolution for column {f.name!r}: "
                        f"{seen[f.name]} vs {f.type}"
                    )
                if t != seen[f.name]:
                    seen[f.name] = t
                    out_fields[order[f.name]] = pa.field(f.name, t, nullable=True)
            else:
                seen[f.name] = f.type
                order[f.name] = len(out_fields)
                out_fields.append(pa.field(f.name, f.type, nullable=True))
    return pa.schema(out_fields)


def align_to(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Promote ``table`` to ``target``: append null columns for missing
    fields, reorder to target order. Extra columns not in ``target`` are kept
    (appended at the end) so engine-internal columns survive."""
    n = table.num_rows
    names = set(table.schema.names)
    cols = []
    for f in target:
        if f.name in names:
            col = table.column(f.name)
            if col.type != f.type:
                col = col.cast(f.type)
            cols.append((f.name, col))
        else:
            cols.append((f.name, pa.nulls(n, f.type)))
    extras = [nm for nm in table.schema.names if nm not in {f.name for f in target}]
    for nm in extras:
        cols.append((nm, table.column(nm)))
    return pa.table(dict(cols))
