"""Small-ingest sources: the REST→table pattern (S7).

Reference analog: the side DAGs that GET a small external payload (currency
rates JSON, iTunes/Google-Play reports, GeoIP db, app-config), normalize
its column names/types, DELETE the day partition and append — e.g.
``DAG_get_currencies_data.py:33-63`` (daily currency JSON → per-day rows),
``store_itunes.py:61-130`` (CSV report → lowercase/underscore headers →
delete-day + insert), ``DAG_fetch_app_config.py:29-38``.

This sandbox is sealed (no network), so the transport is a ``file://``
fetcher with the same interface; everything after the fetch — header
normalization, declarative casts, per-day idempotent delete-then-insert
into a partitioned side table, broadcast enrichment — is the real
production path. At scale these ingests stay driver-side by design: the
payloads are KB-sized dimensions consumed as broadcast sides, never
distributed work.
"""

from __future__ import annotations

import json
import os
import re

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def fetch_json(url: str) -> list[dict]:
    """Transport stub: ``file://`` only in this sandbox; a real deployment
    swaps in an HTTP GET with the same signature."""
    if not url.startswith("file://"):
        raise NotImplementedError("sealed sandbox: only file:// URLs")
    with open(url[len("file://") :]) as f:
        return json.load(f)


def normalize_columns(df: pd.DataFrame) -> pd.DataFrame:
    """Header normalizer (M3): lowercase, non-alnum → underscore —
    ``store_itunes.py:95-117`` semantics."""
    df = df.copy()
    df.columns = [
        re.sub(r"[^a-z0-9]+", "_", c.lower()).strip("_") for c in df.columns
    ]
    return df


def apply_casts(df: pd.DataFrame, casts: dict[str, str]) -> pd.DataFrame:
    """Declarative cast map (M4): column → pandas dtype."""
    df = df.copy()
    for c, dt in casts.items():
        if c in df.columns:
            df[c] = df[c].astype(dt)
    return df


class DayPartitionedTable:
    """A small partitioned side table with per-day idempotent
    delete-then-insert (S3 semantics: ``DELETE … WHERE date_=X; INSERT``,
    here one parquet file per day swapped by atomic rename)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _day_path(self, day: str) -> str:
        if not re.fullmatch(r"\d{4}-\d{2}-\d{2}", day):
            raise ValueError(f"bad day {day!r}")
        return os.path.join(self.root, f"day={day}.parquet")

    def upsert_day(self, day: str, df: pd.DataFrame) -> int:
        p = self._day_path(day)
        t = pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)
        pq.write_table(t, p + ".tmp")
        os.replace(p + ".tmp", p)  # replaces any prior load of the day
        return len(df)

    def read_all(self) -> pd.DataFrame:
        import glob

        files = sorted(glob.glob(os.path.join(self.root, "day=*.parquet")))
        if not files:
            return pd.DataFrame()
        return pa.concat_tables(pq.read_table(f) for f in files).to_pandas()


def ingest_rates(url: str, table_root: str, *, casts: dict[str, str] | None = None) -> dict:
    """The full S7 chain: fetch JSON → normalize headers → cast → per-day
    delete-then-insert. The payload carries its own day key (the reference
    partitions currency rates by quote date)."""
    rows = fetch_json(url)
    df = normalize_columns(pd.DataFrame(rows))
    df = apply_casts(df, casts or {"rate": "float64"})
    table = DayPartitionedTable(table_root)
    out = {}
    for day, g in df.groupby("day"):
        out[str(day)] = table.upsert_day(str(day), g)
    return out
