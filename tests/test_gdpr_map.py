"""Pseudonym-map side table (mod_load_data_gdpr.sql MERGE semantics) —
the reference's gdpr.yaml mandatory invariants: every PII value has exactly
one mapping row; replays don't duplicate rows; erasure removes the
subject's rows."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd

from etl_ray.engine import ReplayEngine
from etl_ray.engine import gdpr


def _wal_distinct_repos(wal) -> pd.DataFrame:
    files = ", ".join(f"'{f}'" for f in wal.segment_files)
    con = duckdb.connect()
    df = con.execute(
        f"""
        SELECT repo AS original, MIN(lsn) AS first_lsn, MAX(lsn) AS last_lsn
        FROM read_parquet([{files}], union_by_name=true)
        WHERE repo IS NOT NULL GROUP BY repo ORDER BY repo
        """
    ).df()
    con.close()
    return df


def test_map_complete_and_merge_exact(ray_session, small_wal, tmp_path):
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(
        small_wal.wal_dir, lake, num_buckets=8, concurrency=2,
        aggregate=False, pseudonym_fields=["repo"],
    )
    eng.replay_all(segments_per_tick=2)  # multiple MERGE rounds

    m = gdpr.read_map(lake).to_pandas().sort_values("original").reset_index(drop=True)
    exp = _wal_distinct_repos(small_wal)
    # completeness: one row per distinct PII value (gdpr.yaml invariant)
    assert len(m) == len(exp)
    assert (m["field"] == "repo").all()
    assert m["original"].is_unique
    pd.testing.assert_series_equal(
        m["original"], exp["original"], check_names=False
    )
    # MERGE lineage: first_lsn from the first sighting, last_lsn extended
    assert (m["first_lsn"].to_numpy() == exp["first_lsn"].to_numpy()).all()
    assert (m["last_lsn"].to_numpy() == exp["last_lsn"].to_numpy()).all()
    # pseudonym = the export pseudonymizer's hash
    assert (
        m["pseudonym"]
        == m["original"].map(lambda v: hashlib.sha256(v.encode()).hexdigest())
    ).all()


def test_map_replay_idempotent(ray_session, small_wal, tmp_path):
    lake = str(tmp_path / "lake")
    kw = dict(num_buckets=8, concurrency=2, aggregate=False, pseudonym_fields=["repo"])
    ReplayEngine(small_wal.wal_dir, lake, **kw).replay_all()
    before = gdpr.read_map(lake).to_pandas().sort_values("original").reset_index(drop=True)
    # watermark no-op replay leaves the map untouched
    assert ReplayEngine(small_wal.wal_dir, lake, **kw).tick() is None
    after = gdpr.read_map(lake).to_pandas().sort_values("original").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)


def test_erase_removes_map_rows(ray_session, small_wal, tmp_path):
    from etl_ray.engine.maintenance import erase_keys

    lake = str(tmp_path / "lake")
    eng = ReplayEngine(
        small_wal.wal_dir, lake, num_buckets=8, concurrency=2,
        aggregate=False, pseudonym_fields=["repo"],
    )
    eng.replay_all()
    from etl_ray.engine.export import final_state

    live = final_state(lake).to_pandas()
    victim_repo = live["repo"].iloc[0]
    victims = [
        (r, p)
        for r, p in zip(live["repo"], live["path"])
        if r == victim_repo
    ]
    res = erase_keys(lake, victims, erase_map_fields=["repo"])
    assert res["map_rows_removed"] == 1
    m = gdpr.read_map(lake).to_pandas()
    assert victim_repo not in set(m["original"])


def test_map_high_cardinality_distributed(ray_session, small_wal, tmp_path):
    """PII fields are near-unique per user — the map MERGE must stay correct
    when map cardinality ≈ event count (the pairs are bucket-shuffled to
    per-bucket merge tasks; the driver sees only counters)."""
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(
        small_wal.wal_dir, lake, num_buckets=8, concurrency=2,
        aggregate=False, pseudonym_fields=["path"],  # ~2.4k distinct values
    )
    eng.replay_all(segments_per_tick=2)

    import duckdb as _duckdb

    files = ", ".join(f"'{f}'" for f in small_wal.segment_files)
    con = _duckdb.connect()
    exp = con.execute(
        f"""SELECT path AS original, MIN(lsn) AS first_lsn, MAX(lsn) AS last_lsn
        FROM read_parquet([{files}], union_by_name=true)
        WHERE path IS NOT NULL GROUP BY path ORDER BY path"""
    ).df()
    con.close()

    m = gdpr.read_map(lake).to_pandas().sort_values("original").reset_index(drop=True)
    assert len(m) == len(exp)
    assert m["original"].is_unique
    assert (m["first_lsn"].to_numpy() == exp["first_lsn"].to_numpy()).all()
    assert (m["last_lsn"].to_numpy() == exp["last_lsn"].to_numpy()).all()
