"""Rolling daily aggregates vs the DuckDB oracle, incl. incremental
per-changed-day recomputation across ticks (the D-2/D-1/D0 heal analog)."""

from __future__ import annotations

import pandas as pd

from etl_ray.engine import ReplayEngine
from etl_ray.engine.aggregates import read_agg
from etl_ray.engine.lineage import LakeLineage
from etl_ray.oracle import expected_lang_daily, expected_repo_daily


def _check_aggs(lake: str, wal):
    lineage = LakeLineage(lake)
    got_l = (
        read_agg(lineage, "lang_daily_agg")
        .to_pandas()
        .sort_values(["day", "lang"])
        .reset_index(drop=True)
    )
    exp_l = expected_lang_daily(wal).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_l[["day", "lang", "files_changed", "bytes", "distinct_repos"]],
        exp_l,
        check_dtype=False,
    )
    assert (got_l["max_file_bytes"] > 0).all()  # MetricSpec plugin column

    got_r = (
        read_agg(lineage, "repo_daily_agg")
        .to_pandas()
        .sort_values(["day", "repo"])
        .reset_index(drop=True)
    )
    exp_r = expected_repo_daily(wal).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_r[["day", "repo", "events", "upserts", "deletes", "distinct_paths"]],
        exp_r,
        check_dtype=False,
    )


def test_aggregates_single_tick(ray_session, small_wal, tmp_path):
    lake = str(tmp_path / "lake")
    ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2).replay_all()
    _check_aggs(lake, small_wal)


def test_aggregates_incremental_multi_tick(ray_session, small_wal, tmp_path):
    """Per-tick recomputation of only the touched days must converge to the
    same result as a single-shot aggregation (late data heals)."""
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2)
    res = eng.replay_all(segments_per_tick=2)
    assert len(res) >= 2
    _check_aggs(lake, small_wal)


def test_aggregates_wal_fallback_path(ray_session, small_wal, tmp_path):
    """Non-spill shuffles have no agg log; the WAL-rescan recompute path
    must produce the same aggregates."""
    lake = str(tmp_path / "lake")
    ReplayEngine(
        small_wal.wal_dir, lake, num_buckets=8, concurrency=2, shuffle="sort"
    ).replay_all()
    _check_aggs(lake, small_wal)
