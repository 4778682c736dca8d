"""Single-writer lake guard (``engine/lock.py``): a held lock rejects a
second writer; dead-holder and over-TTL locks break automatically; locks
release on success AND on crash (context manager unwind)."""

from __future__ import annotations

import json
import os
import time

import pytest

from etl_ray.engine import ReplayEngine
from etl_ray.engine.lock import WriterLockError, writer_lock


def test_live_lock_rejects_second_writer(ray_session, small_wal, tmp_path):
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2)
    with writer_lock(lake, "other-driver"):
        with pytest.raises(WriterLockError, match="other-driver"):
            eng.tick()
        from etl_ray.engine.maintenance import compact_tombstones

        with pytest.raises(WriterLockError):
            compact_tombstones(lake)
    # lock released → replay proceeds and leaves no lock behind
    assert eng.tick() is not None
    assert not os.path.exists(os.path.join(lake, "_lock.json"))


def test_dead_holder_lock_is_broken(ray_session, small_wal, tmp_path):
    lake = str(tmp_path / "lake")
    os.makedirs(lake, exist_ok=True)
    import socket

    # a crashed writer on THIS host: pid no longer exists
    with open(os.path.join(lake, "_lock.json"), "w") as f:
        json.dump(
            {"pid": 2**22 + 1111, "host": socket.gethostname(), "op": "replay",
             "ts": time.time()},
            f,
        )
    eng = ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2)
    assert eng.tick() is not None  # stale lock broken, tick proceeds


def test_remote_holder_respects_ttl(ray_session, small_wal, tmp_path):
    lake = str(tmp_path / "lake")
    os.makedirs(lake, exist_ok=True)
    lockf = os.path.join(lake, "_lock.json")
    eng = ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2)
    # live-looking lock from another host: cannot pid-probe, honored until TTL
    with open(lockf, "w") as f:
        json.dump(
            {"pid": 1, "host": "some-other-node", "op": "replay", "ts": time.time()},
            f,
        )
    with pytest.raises(WriterLockError):
        eng.tick()
    # ...but an over-TTL one is broken
    with open(lockf, "w") as f:
        json.dump(
            {"pid": 1, "host": "some-other-node", "op": "replay",
             "ts": time.time() - 7200},
            f,
        )
    assert eng.tick() is not None


def test_crash_releases_lock(ray_session, small_wal, tmp_path):
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(
        small_wal.wal_dir, lake, num_buckets=8, concurrency=2, fail_after_buckets=2
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        eng.tick()
    assert not os.path.exists(os.path.join(lake, "_lock.json"))
