"""Bootstrap (snapshot-then-stream attach, ``engine/bootstrap.py``): a lake
initialized from a table snapshot and then WAL-tailed byte-matches a
full-WAL replay; refuses non-empty lakes; flat-LSN mode overrides only on
higher LSNs."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from etl_ray.engine import ReplayEngine
from etl_ray.engine.bootstrap import bootstrap_lake
from etl_ray.engine.export import final_state
from etl_ray.oracle import expected_final_state


def test_snapshot_then_stream_matches_full_replay(ray_session, small_wal, tmp_path):
    # snapshot = the oracle's fold through segment k (per-row lsn preserved)
    k = small_wal.segments[2]["seqno"]
    snap = expected_final_state(small_wal, with_sha=False, through_seqno=k)
    snap_path = str(tmp_path / "snapshot.parquet")
    pq.write_table(snap, snap_path)

    lake = str(tmp_path / "lake")
    res = bootstrap_lake(lake, snap_path, num_buckets=8, through_seqno=k)
    assert res["rows"] == snap.num_rows
    assert not os.path.exists(os.path.join(lake, "_lock.json"))

    # tail the rest of the WAL; final state must equal the full-replay oracle
    eng = ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2)
    ticks = eng.replay_all(segments_per_tick=2)
    assert ticks and ticks[0].tick == 1  # resumed after the bootstrap tick

    got = (
        final_state(lake, with_sha=True)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    exp = expected_final_state(small_wal).to_pandas()
    assert len(got) == len(exp)
    assert (got["content_sha256"].to_numpy() == exp["content_sha256"].to_numpy()).all()
    assert (got["lsn"].to_numpy() == exp["lsn"].to_numpy()).all()


def test_bootstrap_refuses_nonempty_lake(ray_session, small_wal, tmp_path):
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2)
    eng.tick(max_segments=1)
    snap_path = str(tmp_path / "snap.parquet")
    pq.write_table(
        expected_final_state(small_wal, with_sha=False, through_seqno=0), snap_path
    )
    with pytest.raises(RuntimeError, match="empty lake"):
        bootstrap_lake(lake, snap_path, num_buckets=8)


def test_flat_lsn_snapshot_override_semantics(ray_session, small_wal, tmp_path):
    """Without a per-row lsn column, snapshot rows all carry default_lsn:
    WAL events above it override, events at/below it do not."""
    k = small_wal.segments[0]["seqno"]
    snap = expected_final_state(small_wal, with_sha=False, through_seqno=k)
    hi = int(snap["lsn"].to_numpy().max())
    snap_path = str(tmp_path / "snap.parquet")
    pq.write_table(snap.drop_columns(["lsn"]), snap_path)

    lake = str(tmp_path / "lake")
    res = bootstrap_lake(
        lake, snap_path, num_buckets=8, through_seqno=k, default_lsn=hi
    )
    assert res["max_lsn"] == hi
    ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2).replay_all()

    got = final_state(lake).to_pandas()
    # for keys the SNAPSHOT holds, nothing below the flat LSN can win: each
    # is either the un-overridden snapshot row (lsn == hi) or a strictly
    # newer WAL event. (Keys absent from the snapshot may legitimately carry
    # lower LSNs — out-of-order WAL inserts below hi for brand-new keys.)
    snap_keys = set(zip(snap["repo"].to_pylist(), snap["path"].to_pylist()))
    on_snap = got[[tuple(r) in snap_keys for r in got[["repo", "path"]].to_numpy()]]
    assert (on_snap["lsn"] >= hi).all()
    assert (on_snap["lsn"] == hi).any(), "some snapshot rows should survive"
    assert (got["lsn"] > hi).any(), "some WAL events should override/insert"
