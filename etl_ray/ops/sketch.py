"""Mergeable sketches — approximate distinct counting at shuffle-free cost.

The reference computes every distinct exactly (SURVEY §2.5 note); at 100 TB
an exact global COUNT(DISTINCT key) is an all-to-all. A KMV (k-minimum
values) sketch gives an (1±1/sqrt(k))-ish estimate with ONE tiny row per
batch through the network: each batch emits its k smallest 64-bit key
hashes; sketches merge by taking the k smallest of the union (associative,
commutative — the guide's "emit one serialized sketch per batch and merge"
pattern); estimate = (k-1) * 2^64 / kth_min.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..engine.partitioning import stable_hash64
from .common import read

_U64 = float(2**64)


def _kmv_merge(parts: list[np.ndarray], k: int) -> np.ndarray:
    allv = np.unique(np.concatenate(parts)) if parts else np.array([], dtype=np.uint64)
    return allv[:k]


def kmv_estimate(sketch: np.ndarray, k: int) -> float:
    if len(sketch) < k:  # saw fewer than k distinct values → exact
        return float(len(sketch))
    return (k - 1) * _U64 / float(sketch[k - 1])


def approx_distinct(
    sf_dir: str,
    table: str,
    columns: list[str],
    *,
    k: int = 1024,
) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT columns) via per-batch KMV partials.

    Returns one row: (column, approx_distinct). Network cost: ≤ k uint64
    per batch, regardless of input size."""
    ds = read(sf_dir, table, columns=columns)

    def partial(t: pa.Table) -> pd.DataFrame:
        cols = [t[c].cast(pa.string()) for c in columns]
        h = stable_hash64(*cols)
        h = np.unique(h.astype(np.uint64))[:k]
        return pd.DataFrame({"sketch": [h.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    sketches = [np.frombuffer(b, dtype=np.uint64) for b in parts["sketch"]]
    merged = _kmv_merge(sketches, k)
    return pd.DataFrame(
        {
            "key": ["+".join(columns)],
            "approx_distinct": [round(kmv_estimate(merged, k), 1)],
        }
    )


def events_approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    return approx_distinct(sf_dir, "events", ["user_id"])


def lineitem_approx_distinct_parts(sf_dir: str) -> pd.DataFrame:
    # k=8192 keeps the sketch below capacity (= exact) at the driver's
    # sf≤0.01 (2000 distinct parts) while remaining a true mergeable
    # sketch; above capacity it degrades to the (1±1/sqrt(k)) estimate
    return approx_distinct(sf_dir, "lineitem", ["l_partkey"], k=8192)


def sample_threshold(frac: float) -> int:
    return int(frac * _U64)


def events_sample(sf_dir: str, frac: float = 0.1) -> pd.DataFrame:
    """Deterministic Bernoulli sample (the engine-side sampling the
    reference lacks): keep rows whose sha256(event_id) 8-byte big-endian
    prefix < frac·2^64 — the SAME rows at every parallelism, on every
    rerun, and in every engine (unlike ``ds.random_sample``), so sampled
    pipelines stay reproducible AND DuckDB-oracle-checkable."""
    import hashlib

    ds = read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    threshold = sample_threshold(frac)

    def pick(t: pa.Table) -> pa.Table:
        sha = hashlib.sha256
        keep = [
            int.from_bytes(sha(str(i).encode()).digest()[:8], "big") < threshold
            for i in t["event_id"].to_pylist()
        ]
        return t.filter(pa.array(keep))

    out = ds.map_batches(pick, batch_format="pyarrow")
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)
