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


def versioned_broadcast(path: str, current_version: str | None, build):
    """The one copy of the dim hash-version + broadcast-once protocol:
    read the file bytes, version = sha256 prefix; when the version moved,
    ``build(raw)`` → ``ray.put`` (once per version — ST6). Returns
    ``(version, ref)`` with ``ref=None`` when unchanged. ``build`` gets
    the EXACT bytes that were hashed, so a concurrent edit between hash
    and re-read can't broadcast new content under the old tag."""
    import hashlib

    import ray as _ray

    with open(path, "rb") as f:
        raw = f.read()
    ver = hashlib.sha256(raw).hexdigest()[:12]
    if ver == current_version:
        return ver, None
    return ver, _ray.put(build(raw))


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
    if "__pos" in df.columns:
        raise ValueError(f"dim {spec.name!r}: '__pos' is a reserved column name")
    full = pa.Table.from_pandas(df[value_cols], preserve_index=False)
    types = {c: full.schema.field(c).type for c in value_cols}
    # value columns as Arrow arrays in frame row order: the join gathers
    # ROW POSITIONS and takes from these, so values never round-trip
    # through pandas float64 (which silently corrupts int64 above 2^53
    # the moment any row misses the dim)
    arrow_cols = {c: full[c].combine_chunks() for c in value_cols}
    payload = {
        "frame": df,
        "value_cols": value_cols,
        "types": types,
        "arrow_cols": arrow_cols,
        "versioned": versioned,
    }
    if not versioned:
        # prebuilt once on the driver and shipped in the broadcast —
        # batches pay only the O(uniques) indexer probe
        payload["key_index"] = pd.Index(df[spec.key])
    return payload


def _gather_dim_values(payload: dict, pos: "np.ndarray") -> dict:
    """Per-row dim ROW POSITIONS (-1 = no match) → one typed output array
    per value column, gathered straight from the payload's Arrow arrays —
    values keep their exact Arrow type end-to-end (no pandas float64
    NaN-frame round trip)."""
    value_cols = payload["value_cols"]
    types = payload["types"]
    arrow_cols = payload["arrow_cols"]
    valid = pos >= 0
    out_cols = {}
    if not valid.any():
        for c in value_cols:
            out_cols[c] = pa.nulls(len(pos), type=types[c])
        return out_cols
    safe = np.where(valid, pos, 0)
    idx_arr = pa.array(safe, type=pa.int64())
    all_valid = bool(valid.all())
    vmask = None if all_valid else pa.array(valid)
    for c in value_cols:
        taken = pc.take(arrow_cols[c], idx_arr)
        if not all_valid:
            taken = pc.if_else(vmask, taken, pa.scalar(None, types[c]))
        out_cols[c] = taken
    return out_cols


def _apply_dim(batch: pa.Table, spec: DimSpec, payload: dict) -> pa.Table:
    """Vectorized left join of one broadcast dim onto a batch. Plain dims:
    position lookup over the dictionary-encoded key. Versioned dims:
    pandas merge_asof on (key, as_of) — backward pick of the latest
    valid_from <= event time. Both paths resolve ROW POSITIONS first and
    gather values via Arrow take, so value columns never pass through a
    pandas NaN frame (exactness above 2^53 for int64 riders)."""
    import pandas as pd

    dim = payload["frame"]
    value_cols = payload["value_cols"]
    key = batch[spec.key]
    if isinstance(key, pa.ChunkedArray):
        key = key.combine_chunks()
    n = batch.num_rows
    if payload["versioned"]:
        ts = pc.cast(batch[spec.as_of], pa.timestamp("us"))
        left = pd.DataFrame(
            {
                spec.key: key.to_pandas(),
                "__t": ts.to_pandas(),
                "__i": np.arange(n, dtype=np.int64),
            }
        )
        ok = left["__t"].notna() & left[spec.key].notna()
        right = dim[[spec.key, VALID_FROM]].copy()
        right["__pos"] = np.arange(len(dim), dtype=np.int64)
        merged = pd.merge_asof(
            left[ok].sort_values("__t", kind="mergesort"),
            right,
            left_on="__t",
            right_on=VALID_FROM,
            by=spec.key,
            direction="backward",
        )
        # __pos survives the merge as float64+NaN; positions are exact in
        # float64 (dim row counts are small-side), values are NOT — which
        # is why only the position rides the pandas merge
        pos = np.full(n, -1, dtype=np.int64)
        mpos = merged["__pos"].to_numpy(dtype=np.float64, na_value=-1.0)
        mi = merged["__i"].to_numpy()
        pos[mi] = mpos.astype(np.int64)
        out_cols = _gather_dim_values(payload, pos)
    else:
        # any-typed join key: dictionary-encode as-is (null keys keep null
        # codes — never conflated with a legitimate ''/0 dim key), probe
        # the prebuilt key index once per unique, gather per value column
        d = pc.dictionary_encode(key)
        uniq = d.dictionary.to_pandas()
        if len(uniq) == 0:
            # every key in the batch is null (e.g. a delete-only batch):
            # the join result is all-null by definition
            pos = np.full(n, -1, dtype=np.int64)
        else:
            upos = payload["key_index"].get_indexer(uniq)  # -1 = missing
            idx = d.indices
            null_mask = pc.is_null(idx).to_numpy(zero_copy_only=False)
            codes = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False)
            pos = upos[codes]
            pos[null_mask] = -1
        out_cols = _gather_dim_values(payload, pos)
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
        # a dim output name colliding with a REAL upstream column would
        # silently overwrite source data via set_column — refuse instead
        # (checked against the pre-dim batch, so re-applied dim columns
        # from a prior enrichment pass are not false positives)
        incoming = set(batch.schema.names)
        produced = set()
        for spec, payload in self._resolved:
            for c in payload["value_cols"]:
                out_name = f"{spec.name}_{c}"
                if out_name in incoming:
                    raise ValueError(
                        f"dim {spec.name!r}: output column {out_name!r} "
                        "collides with an upstream data column — rename "
                        "the dim or its value column"
                    )
                if out_name in produced:
                    raise ValueError(
                        f"dim {spec.name!r}: output column {out_name!r} "
                        "collides with another dim's output"
                    )
                produced.add(out_name)
        for spec, payload in self._resolved:
            batch = _apply_dim(batch, spec, payload)
        return batch
