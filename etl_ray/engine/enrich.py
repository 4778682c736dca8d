"""Incremental enrichment: language tagging from the path extension.

Analog of the reference's broadcast dimension joins (VAT / currency / country
map — ``insert_user_history.sql:102-108``) and GeoIP enrichment (ST6). The
ext→lang dimension here is tiny, so the engine simply ships it inside the
stage closure; for a genuinely large dimension use the ``ray.put``-once /
read-in-``__init__`` broadcast pattern (see
``etl_ray/ops/relational.py::revenue_by_region`` for the worked example) by
passing ``ext_map_ref``.

Deletes carry null payloads in the WAL; enrichment still derives a
deterministic ``lang`` for them from the path so downstream grouping is
total (the engine's aggregates rely on path↔lang being functional).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..wal import EXT_TO_LANG

UNKNOWN_LANG = "unknown"


class LangEnricher:
    """Actor-pool / task stage: recompute ``lang`` from the file extension.

    Vectorized: extension extraction with Arrow string kernels, dictionary
    lookup through a numpy fancy-index over the dictionary-encoded extension
    column (no Python loop over rows).
    """

    def __init__(self, ext_map_ref=None, ext_map: dict | None = None):
        # a ref is resolved LAZILY at first use: the driver-built instance
        # ships only the ObjectRef inside task closures, and every task
        # reads the broadcast dim from its node's object store (ray.put
        # once per dim VERSION — see ReplayEngine._refresh_dim)
        self._ref = ext_map_ref
        if ext_map_ref is not None:
            self.ext_map = None
        elif ext_map is not None:
            self.ext_map = dict(ext_map)
        else:
            self.ext_map = dict(EXT_TO_LANG)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.ext_map is None:
            self.ext_map = ray.get(self._ref)
        path = batch["path"]
        if isinstance(path, pa.ChunkedArray):
            path = path.combine_chunks()
        # extension = text after the last '.'
        ext = pc.replace_substring_regex(path, pattern=r"^.*\.", replacement="")
        dict_arr = pc.dictionary_encode(ext)
        uniq = dict_arr.dictionary.to_pylist()
        lut = np.array([self.ext_map.get(u, UNKNOWN_LANG) for u in uniq], dtype=object)
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        lang = pa.array(lut[codes], type=pa.string())
        i = batch.schema.get_field_index("lang")
        return batch.set_column(i, "lang", lang)


# ---------------------------------------------------------------------------
# Named multi-dim enrichment with as-of version picks.
#
# The reference joins SEVERAL broadcast dims per run, some date-versioned
# with an as-of pick (VAT: latest ``updated_at <= execution_date`` per
# country, ``include/vat/create_country_vat_table.sql:4-15``,
# ``insert_user_history.sql:71-89,102-108``; currency rates keyed by
# (date_, currency), ``store_itunes_process_data.sql:16-20``). Engine form:
# a TableSpec declares N named dims; each is hash-versioned from its file
# and re-broadcast (ray.put once per VERSION) when it changes mid-follow;
# date-versioned dims carry a ``valid_from`` column and join as-of a data
# timestamp column — new ticks tag with the new version while committed
# rows keep the version they were applied with (LWW: a dim change never
# rewrites state).
# ---------------------------------------------------------------------------

from dataclasses import dataclass


@dataclass(frozen=True)
class DimSpec:
    """One named broadcast dimension.

    ``path``: parquet or JSON (list of row objects) file, re-stat'd every
    tick. ``key``: the join column, same name on both sides. ``as_of``: the
    DATA-side event-time column for the as-of pick — required iff the dim
    file carries a ``valid_from`` column (multiple versions per key; the
    row with the latest ``valid_from <= as_of`` wins). Every other dim
    column lands on the data as ``{name}_{column}``."""

    name: str
    path: str
    key: str
    as_of: str | None = None

    @staticmethod
    def from_config(entry: dict) -> "DimSpec":
        unknown = set(entry) - {"name", "path", "key", "as_of"}
        if unknown:
            raise ValueError(f"unknown dim-config keys {sorted(unknown)}")
        for k in ("name", "path", "key"):
            if not entry.get(k):
                raise ValueError(f"dim config needs {k!r}: {entry}")
        return DimSpec(
            name=entry["name"], path=entry["path"], key=entry["key"],
            as_of=entry.get("as_of"),
        )


VALID_FROM = "valid_from"


def load_dim_payload(spec: DimSpec, raw: bytes | None = None) -> dict:
    """Driver-side load + prep of one dim file (small side — the broadcast
    pattern). ``raw`` lets the caller pass the exact bytes it just hashed
    (version/content atomicity under concurrent dim edits). Returns
    {"frame": pandas DF, "value_cols": [...], "types": {col: pa type},
    "versioned": bool}; versioned frames are pre-sorted by valid_from for
    the merge_asof. ``types`` pins each value column's Arrow type from the
    FULL dim frame — per-batch inference would let partial key coverage
    produce float64/null-typed columns that break additive-only schema
    unification downstream."""
    import json

    import pandas as pd

    if raw is None:
        with open(spec.path, "rb") as f:
            raw = f.read()
    if spec.path.endswith(".json"):
        rows = json.loads(raw)
        df = pd.DataFrame(rows)
    else:
        import pyarrow.parquet as pq

        df = pq.read_table(pa.BufferReader(raw)).to_pandas()
    if spec.key not in df.columns:
        raise ValueError(f"dim {spec.name!r}: key column {spec.key!r} not in {spec.path}")
    versioned = VALID_FROM in df.columns
    if versioned:
        if not spec.as_of:
            raise ValueError(
                f"dim {spec.name!r} has {VALID_FROM!r} versions but no as_of "
                "data column configured"
            )
        df[VALID_FROM] = pd.to_datetime(df[VALID_FROM]).astype("datetime64[us]")
        df = df.sort_values(VALID_FROM, kind="mergesort").reset_index(drop=True)
    elif df[spec.key].duplicated().any():
        raise ValueError(
            f"dim {spec.name!r}: duplicate keys without {VALID_FROM!r} versions"
        )
    value_cols = [c for c in df.columns if c not in (spec.key, VALID_FROM)]
    if not value_cols:
        raise ValueError(f"dim {spec.name!r} has no value columns")
    full = pa.Table.from_pandas(df[value_cols], preserve_index=False)
    types = {c: full.schema.field(c).type for c in value_cols}
    return {
        "frame": df,
        "value_cols": value_cols,
        "types": types,
        "versioned": versioned,
    }


def _apply_dim(batch: pa.Table, spec: DimSpec, payload: dict) -> pa.Table:
    """Vectorized left join of one broadcast dim onto a batch. Plain dims:
    lookup over the dictionary-encoded key (one gather per value column).
    Versioned dims: pandas merge_asof on (key, as_of) — backward pick of
    the latest valid_from <= event time."""
    import pandas as pd

    dim = payload["frame"]
    value_cols = payload["value_cols"]
    types = payload["types"]
    key = batch[spec.key]
    if isinstance(key, pa.ChunkedArray):
        key = key.combine_chunks()
    if payload["versioned"]:
        n = batch.num_rows
        ts = pc.cast(batch[spec.as_of], pa.timestamp("us"))
        left = pd.DataFrame(
            {
                spec.key: key.to_pandas(),
                "__t": ts.to_pandas(),
                "__i": np.arange(n, dtype=np.int64),
            }
        )
        ok = left["__t"].notna() & left[spec.key].notna()
        merged = pd.merge_asof(
            left[ok].sort_values("__t", kind="mergesort"),
            dim,
            left_on="__t",
            right_on=VALID_FROM,
            by=spec.key,
            direction="backward",
        )
        out_cols = {}
        for c in value_cols:
            s = pd.Series([None] * n, dtype=object)
            s.iloc[merged["__i"].to_numpy()] = merged[c].to_numpy()
            out_cols[c] = pa.array(s, type=types[c], from_pandas=True)
    else:
        # any-typed join key: dictionary-encode as-is (null keys keep null
        # codes — never conflated with a legitimate ''/0 dim key) and
        # gather once per value column over the uniques
        lookup = dim.set_index(spec.key)[value_cols]
        d = pc.dictionary_encode(key)
        uniq = d.dictionary.to_pandas()
        out_cols = {}
        if len(uniq) == 0:
            # every key in the batch is null (e.g. a delete-only batch):
            # the dictionary is empty, so gathering would index into a
            # 0-row frame — the join result is all-null by definition
            for c in value_cols:
                out_cols[c] = pa.nulls(batch.num_rows, type=types[c])
        else:
            idx = d.indices
            null_mask = pc.is_null(idx).to_numpy(zero_copy_only=False)
            codes = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False)
            sub = lookup.reindex(uniq)
            has_nulls = null_mask.any()
            mask_arr = pa.array(null_mask) if has_nulls else None
            for c in value_cols:
                vals = pd.Series(sub[c].to_numpy()[codes])
                arr = pa.array(vals, type=types[c], from_pandas=True)
                if has_nulls:
                    arr = pc.if_else(mask_arr, pa.scalar(None, types[c]), arr)
                out_cols[c] = arr
    for c, arr in out_cols.items():
        out_name = f"{spec.name}_{c}"
        i = batch.schema.get_field_index(out_name)
        if i >= 0:
            batch = batch.set_column(i, out_name, arr)
        else:
            batch = batch.append_column(out_name, arr)
    return batch


class MultiDimEnricher:
    """Stage-1 composition: the built-in lang enricher followed by every
    configured named dim (resolved lazily from per-version broadcast refs —
    ST6, one object-store read per task per dim version)."""

    def __init__(self, lang: LangEnricher, items: list):
        self._lang = lang
        self._items = items  # [(DimSpec, ObjectRef)]
        self._resolved = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self._lang(batch)
        if self._resolved is None:
            self._resolved = [(s, ray.get(r)) for s, r in self._items]
        for spec, payload in self._resolved:
            batch = _apply_dim(batch, spec, payload)
        return batch
