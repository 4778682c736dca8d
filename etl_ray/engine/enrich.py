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
