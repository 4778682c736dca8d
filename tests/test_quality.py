"""Runtime data-quality framework: mandatory checks gate the tick commit.

Reference semantics under test: ``etl/plugins/operators/test.py:39-64`` —
a check returning rows fails; mandatory failure aborts the run before its
commit point, leaving the previous state authoritative; optional failures
are recorded but do not block."""

from __future__ import annotations

import pandas as pd
import pytest

from etl_ray.engine import ReplayEngine
from etl_ray.engine.export import final_state
from etl_ray.engine.quality import (
    DEFAULT_CHECKS,
    CheckSpec,
    DataQualityError,
)


def _live_df(lake: str) -> pd.DataFrame:
    return (
        final_state(lake)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def test_default_checks_pass_and_recorded(ray_session, small_wal, tmp_path):
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2)
    eng.replay_all()
    last = eng.lineage.last_tick()
    assert last["quality"] == {"checks_failed": [], "violations": {}}


def test_failing_mandatory_check_leaves_previous_tick_authoritative(
    ray_session, small_wal, tmp_path
):
    lake = str(tmp_path / "lake")
    good = ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2)
    assert good.tick(max_segments=2) is not None  # tick 0 committed
    before = _live_df(lake)
    tick_before = good.lineage.last_tick()

    bad_check = CheckSpec(
        "always_fails", lambda ctx: [{"reason": "injected"}], mandatory=True
    )
    bad = ReplayEngine(
        small_wal.wal_dir,
        lake,
        num_buckets=8,
        concurrency=2,
        checks=[*DEFAULT_CHECKS, bad_check],
    )
    with pytest.raises(DataQualityError):
        bad.tick()

    # nothing committed: tick manifest unchanged, live state byte-identical
    assert good.lineage.last_tick() == tick_before
    pd.testing.assert_frame_equal(_live_df(lake), before)

    # the tick re-runs cleanly once the failing check is removed and the
    # final state matches a straight full replay (idempotent heal)
    heal = ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2)
    heal.replay_all()
    ref_lake = str(tmp_path / "ref")
    ReplayEngine(small_wal.wal_dir, ref_lake, num_buckets=8, concurrency=2).replay_all()
    pd.testing.assert_frame_equal(_live_df(lake), _live_df(ref_lake))


def test_optional_check_failure_does_not_block(ray_session, small_wal, tmp_path):
    lake = str(tmp_path / "lake")
    warn_check = CheckSpec(
        "always_warns", lambda ctx: [{"reason": "heads-up"}], mandatory=False
    )
    eng = ReplayEngine(
        small_wal.wal_dir,
        lake,
        num_buckets=8,
        concurrency=2,
        checks=[*DEFAULT_CHECKS, warn_check],
    )
    results = eng.replay_all()
    assert results  # committed despite the optional failure
    last = eng.lineage.last_tick()
    assert last["quality"]["checks_failed"] == ["always_warns"]
    assert last["quality"]["violations"] == {"always_warns": 1}


def test_audit_checks_pass_full_replay(ray_session, small_wal, tmp_path):
    """AUDIT_CHECKS adds the per-bucket key-uniqueness scan (mandatory):
    a full replay must pass it on every tick."""
    from etl_ray.engine.quality import AUDIT_CHECKS

    lake = str(tmp_path / "lake")
    eng = ReplayEngine(
        small_wal.wal_dir, lake, num_buckets=8, concurrency=2, checks=AUDIT_CHECKS
    )
    results = eng.replay_all(segments_per_tick=2)
    assert results
    assert eng.lineage.last_tick()["quality"] == {
        "checks_failed": [],
        "violations": {},
    }
