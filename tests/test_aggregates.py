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


def test_aggregates_local_day_boundary(ray_session, small_wal, tmp_path):
    """Engine-side local-day aggregation (reference closes partitions on the
    app's LOCAL midnight, lib/utils.py:59-62): a +330-minute table offset
    must match the DuckDB oracle's `+ INTERVAL 330 MINUTE` day derivation —
    on BOTH the agg-log fast path (multi-tick spill) and the WAL-rescan
    fallback, and the two day sets must actually differ from UTC."""
    off = 330  # IST-like: guaranteed to move events across midnight
    exp = expected_lang_daily(small_wal, tz_offset_minutes=off).to_pandas()
    assert set(exp["day"]) != set(
        expected_lang_daily(small_wal).to_pandas()["day"]
    ) or len(exp) != len(expected_lang_daily(small_wal).to_pandas())

    for tag, kw in (
        ("agglog", dict(segments_per_tick=2)),  # spill shuffle, agg-log path
        ("rescan", dict()),
    ):
        lake = str(tmp_path / f"lake-{tag}")
        eng = ReplayEngine(
            small_wal.wal_dir, lake, num_buckets=8, concurrency=2,
            tz_offset_minutes=off,
            shuffle="spill" if tag == "agglog" else "sort",
        )
        eng.replay_all(**kw)
        got = (
            read_agg(LakeLineage(lake), "lang_daily_agg")
            .to_pandas()
            .sort_values(["day", "lang"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["day", "lang", "files_changed", "bytes", "distinct_repos"]],
            exp.reset_index(drop=True),
            check_dtype=False,
            obj=tag,
        )


def test_day_closer_local_midnight():
    """DayPartitionCloser with a tz offset keys days on LOCAL midnight: an
    event at 23:30 local lands in the local day that started 23.5h earlier,
    and the closable deadline is local midnight end + lateness."""
    from etl_ray.engine.watermark import US_PER_DAY, US_PER_HOUR, DayPartitionCloser

    off_min = 330
    off_us = off_min * 60_000_000
    c = DayPartitionCloser(close_after_us=US_PER_HOUR, tz_offset_minutes=off_min)
    # UTC instant whose LOCAL time is day 10, 23:30
    ts = 10 * US_PER_DAY + 23 * US_PER_HOUR + 30 * 60_000_000 - off_us
    c.observe(ts, now_us=ts)
    [day] = c.open_days
    assert day == 10 * US_PER_DAY - off_us  # UTC instant of local day start
    # watermark 30min past local midnight: not closable (lateness 1h)
    late1 = ts + 60 * 60_000_000
    c.observe(late1, now_us=late1)
    assert c.closable(late1) == []
    # an arrival 2.5h past local midnight: the trailing-window min (the
    # watermark) passes deadline = local midnight + 1h → closable
    late2 = ts + 3 * US_PER_HOUR
    c.observe(late2, now_us=late2)
    assert c.closable(late2) == [day]
