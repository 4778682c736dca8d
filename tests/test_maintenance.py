"""Targeted erasure (GDPR-delete analog) and derivative snapshots."""

from __future__ import annotations

import pandas as pd

from etl_ray.engine import ReplayEngine
from etl_ray.engine.export import final_state
from etl_ray.engine.maintenance import erase_keys, snapshot_derivatives


def _live_df(lake: str) -> pd.DataFrame:
    return final_state(lake).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)


def test_erase_keys(ray_session, small_wal, tmp_path):
    lake = str(tmp_path / "lake")
    ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2).replay_all()
    before = _live_df(lake)
    victims = [tuple(r) for r in before[["repo", "path"]].head(7).to_numpy()]

    res = erase_keys(lake, victims, num_buckets=8)
    assert res["erased"] == 7

    after = _live_df(lake)
    assert len(after) == len(before) - 7
    gone = set(victims)
    assert not any((r, p) in gone for r, p in zip(after["repo"], after["path"]))
    # untouched rows identical
    keep = before[~before.apply(lambda r: (r["repo"], r["path"]) in gone, axis=1)]
    pd.testing.assert_frame_equal(
        keep.reset_index(drop=True), after, check_dtype=False
    )

    # erasure wins over any replayed late event: re-applying the log is a no-op
    eng = ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2)
    assert eng.tick() is None  # watermark: already applied
    still = _live_df(lake)
    pd.testing.assert_frame_equal(after, still, check_dtype=False)


def test_snapshot_derivatives(ray_session, small_wal, tmp_path):
    lake = str(tmp_path / "lake")
    ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2).replay_all()
    out = str(tmp_path / "deriv")
    # the small_wal spans 9 days; step_us from the generator's params
    step_us = max(1, int(9 * 86_400_000_000 // 12_000))
    res = snapshot_derivatives(
        lake, out, daily_days=1, monthly_days=5, step_us_per_lsn=step_us
    )
    assert 0 < res["daily"] <= res["monthly"]
    import pyarrow.parquet as pq

    daily = pq.read_table(f"{out}/daily").to_pandas()
    monthly = pq.read_table(f"{out}/monthly").to_pandas()
    assert set(map(tuple, daily[["repo", "path"]].to_numpy())) <= set(
        map(tuple, monthly[["repo", "path"]].to_numpy())
    )


def test_compact_tombstones(ray_session, small_wal, tmp_path):
    from etl_ray.engine.maintenance import compact_tombstones

    lake = str(tmp_path / "lake")
    ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2).replay_all()
    with_tombs = final_state(lake, include_tombstones=True).to_pandas()
    n_dead = int(with_tombs["deleted"].sum())
    assert n_dead > 0
    live_before = _live_df(lake)

    # default lateness bound (2^20) exceeds this small log's LSN range: every
    # tombstone is still within possible-lateness reach, so none is collected
    res = compact_tombstones(lake)
    assert res["tombstones_removed"] == 0

    # WAL fully consumed and closed → lateness 0 collects them all
    res = compact_tombstones(lake, lateness_bound=0)
    assert res["tombstones_removed"] == n_dead

    after_all = final_state(lake, include_tombstones=True).to_pandas()
    assert not after_all["deleted"].any()
    pd.testing.assert_frame_equal(live_before, _live_df(lake), check_dtype=False)


def test_erase_survives_inflight_events(ray_session, small_wal, tmp_path):
    """Erasure must not be resurrected by WAL events already emitted but not
    yet applied (they fall inside the erase-LSN gap)."""
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2)
    eng.tick(max_segments=2)  # partial replay: later segments are in flight

    part = _live_df(lake)
    victims = [tuple(r) for r in part[["repo", "path"]].head(10).to_numpy()]
    erase_keys(lake, victims)  # num_buckets from lineage

    # a fresh engine consumes the remaining (in-flight) segments
    ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2).replay_all()
    after = _live_df(lake)
    gone = set(victims)
    assert not any(
        (r, p) in gone for r, p in zip(after["repo"], after["path"])
    ), "in-flight events resurrected erased keys"


def test_chained_maintenance_ops(ray_session, small_wal, tmp_path):
    """erase → erase → compact → erase must chain: every maintenance tick
    propagates the lake's bucket-count lineage."""
    lake = str(tmp_path / "lake")
    ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2).replay_all()
    ks = [tuple(r) for r in _live_df(lake)[["repo", "path"]].head(3).to_numpy()]
    from etl_ray.engine.maintenance import compact_tombstones

    r1 = erase_keys(lake, [ks[0]])
    r2 = erase_keys(lake, [ks[1]])  # reads num_buckets from the erasure tick
    compact_tombstones(lake)
    r3 = erase_keys(lake, [ks[2]])  # after a compaction tick
    assert r1["erase_lsn"] < r2["erase_lsn"] < r3["erase_lsn"]
    after = _live_df(lake)
    gone = set(ks)
    assert not any((r, p) in gone for r, p in zip(after["repo"], after["path"]))
