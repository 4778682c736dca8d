"""Skew handling, reference-ported invariants, and property-based LWW tests.

Invariants are ports of the reference's YAML assertion corpus
(SURVEY.md §5): conservation (no key disappears), uniqueness (one row per
key), monotonicity (per-bucket applied-LSN watermarks), counters.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_ray.engine import ReplayEngine
from etl_ray.engine.dedup import last_writer
from etl_ray.engine.export import final_state
from etl_ray.engine.lineage import LakeLineage
from etl_ray.oracle import expected_final_state
from etl_ray.wal import generate_wal


def test_hot_key_skew_replay(ray_session, tmp_path):
    """Extreme per-key skew: 9 keys, 30k events (Zipf-hot repos). The
    per-batch pre-reduction must keep the shuffle tiny and the result
    exact."""
    wal = generate_wal(
        str(tmp_path / "wal"),
        seed=13,
        n_events=30_000,
        n_repos=3,
        paths_per_repo=3,
        zipf_s=2.0,
        dup_rate=0.05,
        delete_rate=0.02,
        ooo_window=300,
        evolve_at_frac=0.5,
        segment_rows=10_000,
        content_min=32,
        content_max=256,
        days_span=3,
    )
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(wal.wal_dir, lake, num_buckets=8, concurrency=2, aggregate=False)
    eng.replay_all()

    exp = expected_final_state(wal).to_pandas()
    got = (
        final_state(lake, with_sha=True)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) <= 9
    assert (got["content_sha256"].to_numpy() == exp["content_sha256"].to_numpy()).all()

    # pre-reduction bound: each shuffled delta row is a per-batch winner, so
    # total state rows per bucket ≤ number of distinct keys in that bucket
    for m in LakeLineage(lake).all_bucket_manifests():
        assert m["rows"] <= 9


def test_invariants_across_ticks(ray_session, small_wal, tmp_path):
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(small_wal.wal_dir, lake, num_buckets=8, concurrency=2)
    lineage = LakeLineage(lake)

    seen_keys: set[tuple] = set()
    prev_applied: dict[int, int] = {}
    ticks = 0
    while True:
        res = eng.tick(max_segments=2)
        if res is None:
            break
        ticks += 1
        # counters: tick event count == rows of its segments
        tick_man = lineage.last_tick()
        assert tick_man["events"] == res.events

        full = (
            final_state(lake, include_tombstones=True)
            .to_pandas()[["repo", "path", "lsn", "deleted"]]
        )
        keys = set(zip(full["repo"], full["path"]))
        # uniqueness: one row (live or tombstone) per key
        assert len(keys) == len(full)
        # conservation: no key ever disappears from the keyed state
        assert seen_keys <= keys
        seen_keys = keys
        # per-bucket applied-LSN watermark is monotone
        for m in lineage.all_bucket_manifests():
            b = m["bucket"]
            assert m["applied_lsn"] >= prev_applied.get(b, 0)
            prev_applied[b] = m["applied_lsn"]
    assert ticks >= 2


# ---- property-based: LWW fold == python-dict oracle ------------------------

_keys = st.sampled_from([("r0", "a"), ("r0", "b"), ("r1", "a"), ("r1", "b"), ("r2", "c")])
_events = st.lists(
    st.tuples(_keys, st.sampled_from(["upsert", "delete"])), min_size=1, max_size=120
)


@settings(max_examples=60, deadline=None)
@given(_events)
def test_lww_fold_matches_dict_oracle(events):
    rows = {
        "repo": [k[0] for k, _ in events],
        "path": [k[1] for k, _ in events],
        "lsn": list(range(1, len(events) + 1)),
        "deleted": [op == "delete" for _, op in events],
        "payload": [f"v{i}" for i in range(len(events))],
    }
    t = pa.table(rows)
    out = last_writer(t).to_pandas()

    oracle: dict[tuple, tuple] = {}
    for i, (k, op) in enumerate(events):
        oracle[k] = (i + 1, op == "delete", f"v{i}")

    got = {
        (r["repo"], r["path"]): (r["lsn"], r["deleted"], r["payload"])
        for _, r in out.iterrows()
    }
    assert got == oracle


@settings(max_examples=30, deadline=None)
@given(_events, st.integers(min_value=1, max_value=5))
def test_lww_fold_split_invariance(events, splits):
    """Applying the fold over any partition of the stream then re-folding
    equals folding the whole stream (the associativity the per-batch
    pre-reduction and salt cells rely on)."""
    rows = pa.table(
        {
            "repo": [k[0] for k, _ in events],
            "path": [k[1] for k, _ in events],
            "lsn": list(range(1, len(events) + 1)),
            "deleted": [op == "delete" for _, op in events],
        }
    )
    whole = (
        last_writer(rows).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    n = rows.num_rows
    step = max(1, n // splits)
    parts = [last_writer(rows.slice(i, step)) for i in range(0, n, step)]
    refold = (
        last_writer(pa.concat_tables(parts))
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(whole, refold)


# ---- property-based: changelog delta kernel --------------------------------


@settings(max_examples=60, deadline=None)
@given(_events, st.integers(min_value=0, max_value=119))
def test_changelog_delta_properties(events, split):
    """For any split of an event stream into (history, tick):
    1. completeness — prev ∪ delta folds to exactly merged (a consumer
       applying the feed reproduces the state);
    2. minimality — delta contains only keys whose winning LSN changed;
    3. op labels — delete iff tombstone; insert iff the key was absent or
       tombstoned in prev; update otherwise."""
    from etl_ray.engine.changelog import changelog_delta

    rows = pa.table(
        {
            "repo": [k[0] for k, _ in events],
            "path": [k[1] for k, _ in events],
            "lsn": list(range(1, len(events) + 1)),
            "deleted": [op == "delete" for _, op in events],
            "payload": [f"v{i}" for i in range(len(events))],
        }
    )
    split = min(split, rows.num_rows)
    prev = last_writer(rows.slice(0, split)) if split else None
    merged = last_writer(rows)
    delta = changelog_delta(prev, merged)

    def key_map(t):
        if t is None:
            return {}
        d = t.to_pandas()
        return {
            (r["repo"], r["path"]): (r["lsn"], r["deleted"]) for _, r in d.iterrows()
        }

    pm, mm, dm = key_map(prev), key_map(merged), key_map(delta)

    # 2. minimality + 1. completeness: delta == keys whose lsn changed
    changed = {k for k, v in mm.items() if pm.get(k, (None,))[0] != v[0]}
    assert set(dm) == changed
    folded = dict(pm)
    folded.update(dm)
    assert folded == mm

    # 3. op labels
    ops = {
        (r["repo"], r["path"]): r["change_op"] for _, r in delta.to_pandas().iterrows()
    }
    for k, op in ops.items():
        if mm[k][1]:
            assert op == "delete", k
        elif k not in pm or pm[k][1]:
            assert op == "insert", k
        else:
            assert op == "update", k


def test_degenerate_single_key_log(ray_session, tmp_path):
    """The worst skew possible: EVERY event updates one (repo, path). The
    per-batch pre-reduction (each stage-1 batch = a salt cell) must bound
    what reaches the shuffle to <= 1 row per stage-1 task, and the final
    state is the single last-writer row."""
    from etl_ray.engine import ReplayEngine
    from etl_ray.engine.export import final_state
    from etl_ray.oracle import expected_final_state
    from etl_ray.wal import generate_wal

    wal = generate_wal(
        str(tmp_path / "wal"),
        seed=3,
        n_events=60_000,
        n_repos=1,
        paths_per_repo=1,
        delete_rate=0.0,
        dup_rate=0.05,
        ooo_window=1_000,
        segment_rows=15_000,
        days_span=2,
    )
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(wal.wal_dir, lake, num_buckets=8, concurrency=2)
    eng.replay_all()

    mans = eng.lineage.all_bucket_manifests()
    touched = [m for m in mans if m["delta_rows"] > 0]
    assert len(touched) == 1  # one key → one bucket
    # the combiner bound: <= (1 or 2 live keys) x stage-1 tasks rows shuffled,
    # not 60k (paths_per_repo=1 still yields <=2 distinct paths in the
    # generator's key space; bound generously vs the event count)
    assert touched[0]["delta_rows"] <= 4 * eng.last_stage1_tasks, (
        touched[0]["delta_rows"],
        eng.last_stage1_tasks,
    )
    got = final_state(lake, with_sha=True).to_pandas()
    exp = expected_final_state(wal).to_pandas()
    assert len(got) == len(exp)
    assert (got["content_sha256"].to_numpy() == exp["content_sha256"].to_numpy()).all()
