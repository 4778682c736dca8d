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


def unify_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Additive union of schemas. New fields append in first-seen order;
    a field present with conflicting types raises (only additive evolution
    is supported, as in the reference)."""
    out_fields: list[pa.Field] = []
    seen: dict[str, pa.DataType] = {}
    for s in schemas:
        for f in s:
            if f.name in seen:
                if seen[f.name] != f.type:
                    raise TypeError(
                        f"non-additive evolution for column {f.name!r}: "
                        f"{seen[f.name]} vs {f.type}"
                    )
            else:
                seen[f.name] = f.type
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
