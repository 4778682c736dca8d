"""Time travel: as-of-tick reads over retained bucket-state history.

The lake's per-tick state files double as commit snapshots (the Delta/Iceberg
'version as of' idea re-expressed over the bucket layout): with
``retain_ticks > 0`` gc keeps the retention window plus each bucket's
boundary state, so ``final_state(as_of_tick=T)`` is exact for any T in the
window. Maintenance ops (erase/compact/rebucket) purge history — erasure
deliberately, since retained states would keep the erased subject's rows.
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest

from etl_ray.engine import ReplayEngine
from etl_ray.engine.export import final_state


def _df(lake, **kw):
    return (
        final_state(lake, **kw)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def test_as_of_reads_match_recorded_states(ray_session, small_wal, tmp_path):
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(
        small_wal.wal_dir, lake, num_buckets=8, concurrency=2, retain_ticks=10
    )
    recorded = {}
    while True:
        r = eng.tick(max_segments=1)
        if r is None:
            break
        recorded[r.tick] = _df(lake)
    assert len(recorded) >= 3
    for t, exp in recorded.items():
        got = _df(lake, as_of_tick=t)
        pd.testing.assert_frame_equal(got, exp, obj=f"as_of_tick={t}")


def test_retention_window_enforced(ray_session, small_wal, tmp_path):
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(
        small_wal.wal_dir, lake, num_buckets=8, concurrency=2, retain_ticks=1
    )
    live = {}
    while True:
        r = eng.tick(max_segments=1)
        if r is None:
            break
        live[r.tick] = _df(lake)
    last = max(live)
    # inside the window: exact
    pd.testing.assert_frame_equal(_df(lake, as_of_tick=last - 1), live[last - 1])
    # outside: refused, not silently wrong
    with pytest.raises(ValueError, match="retained history"):
        final_state(lake, as_of_tick=0)
    with pytest.raises(ValueError, match="future"):
        final_state(lake, as_of_tick=last + 5)
    # gc actually bounds history: per bucket at most window + boundary + current
    for bdir in glob.glob(os.path.join(lake, "buckets", "b=*")):
        states = [
            f
            for f in glob.glob(os.path.join(bdir, "state-t*.parquet"))
            if not f.endswith(".fold.parquet")
        ]
        assert len(states) <= 3, bdir


def test_no_retention_keeps_single_state(ray_session, small_wal, tmp_path):
    """Default retain_ticks=0 keeps exactly the current state per bucket
    (no storage growth) and refuses any as-of in the past."""
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2)
    eng.replay_all(segments_per_tick=2)
    last = eng.lineage.last_tick()["tick"]
    for bdir in glob.glob(os.path.join(lake, "buckets", "b=*")):
        states = [
            f
            for f in glob.glob(os.path.join(bdir, "state-t*.parquet"))
            if not f.endswith(".fold.parquet")
        ]
        assert len(states) == 1, bdir
    # as-of the current tick still works (it IS the live state)
    pd.testing.assert_frame_equal(_df(lake, as_of_tick=last), _df(lake))
    with pytest.raises(ValueError, match="retained history"):
        final_state(lake, as_of_tick=last - 1)


def test_erasure_purges_history(ray_session, small_wal, tmp_path):
    """GDPR: after erase_keys, no as-of read can resurrect the subject."""
    from etl_ray.engine.export import _as_of_manifests
    from etl_ray.engine.lineage import LakeLineage
    from etl_ray.engine.maintenance import erase_keys

    lake = str(tmp_path / "lake")
    eng = ReplayEngine(
        small_wal.wal_dir, lake, num_buckets=8, concurrency=2, retain_ticks=10
    )
    eng.replay_all(segments_per_tick=2)
    df = _df(lake)
    victim = (df.iloc[0]["repo"], df.iloc[0]["path"])
    before_tick = eng.lineage.last_tick()["tick"]
    erase_keys(lake, [victim])
    # pre-erasure snapshots are no longer servable at all
    with pytest.raises(ValueError, match="retained history"):
        final_state(lake, as_of_tick=before_tick)
    # and only the current (post-erasure) states remain servable
    lineage = LakeLineage(lake)
    last = lineage.last_tick()
    current = {m["data_file"] for m in lineage.all_bucket_manifests()}
    assert {
        m["data_file"] for m in _as_of_manifests(lineage, last["tick"])
    } <= current
    cur = _df(lake)
    assert not ((cur["repo"] == victim[0]) & (cur["path"] == victim[1])).any()


def test_as_of_verify_against_bounded_oracle(ray_session, small_wal, tmp_path):
    """The time-travel oracle: expected_final_state(through_seqno=tick T's
    through_seqno) must equal the as-of-T read, per-row content sha equal."""
    from etl_ray.engine.export import add_content_sha
    from etl_ray.oracle import expected_final_state

    lake = str(tmp_path / "lake")
    eng = ReplayEngine(
        small_wal.wal_dir, lake, num_buckets=8, concurrency=2, retain_ticks=16
    )
    res = eng.replay_all(segments_per_tick=1)
    assert len(res) >= 3
    ticks = {t["tick"]: t for t in eng.lineage.all_ticks()}
    for t in (res[0].tick, res[1].tick, res[-1].tick):
        got = (
            final_state(lake, with_sha=True, as_of_tick=t)
            .to_pandas()
            .sort_values(["repo", "path"])
            .reset_index(drop=True)
        )
        exp = expected_final_state(
            small_wal, through_seqno=ticks[t]["through_seqno"]
        ).to_pandas()
        assert len(got) == len(exp), f"tick {t}"
        assert (
            got["content_sha256"].to_numpy() == exp["content_sha256"].to_numpy()
        ).all(), f"tick {t}"
