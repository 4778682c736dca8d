"""WAL generator determinism + shape invariants."""

from __future__ import annotations

import pyarrow.parquet as pq

from etl_ray.oracle import expected_final_state
from etl_ray.wal import EXT_TO_LANG, WalInfo, generate_wal


def test_determinism(tmp_path):
    a = generate_wal(str(tmp_path / "a"), seed=3, n_events=5_000, segment_rows=1_000)
    b = generate_wal(str(tmp_path / "b"), seed=3, n_events=5_000, segment_rows=1_000)
    ta = pq.read_table(a.segment_files[2])
    tb = pq.read_table(b.segment_files[2])
    assert ta.equals(tb)
    assert a.n_events == b.n_events


def test_reload_is_cached(tmp_path):
    d = str(tmp_path / "w")
    a = generate_wal(d, seed=3, n_events=3_000)
    b = generate_wal(d, seed=3, n_events=3_000)  # second call loads manifest
    assert a.segments == b.segments
    assert WalInfo.load(d).n_base_events == 3_000


def test_envelope_invariants(small_wal):
    seen_lsns = set()
    dup_count = 0
    max_ts = -1
    for seg in small_wal.segments:
        t = pq.read_table(seg["file"])
        lsns = t["lsn"].to_pylist()
        assert seg["rows"] == len(lsns)
        assert seg["min_lsn"] == min(lsns) and seg["max_lsn"] == max(lsns)
        for x in lsns:
            if x in seen_lsns:
                dup_count += 1
            seen_lsns.add(x)
        ops = set(t["op"].to_pylist())
        assert ops <= {"insert", "update", "delete"}
        # commit_ts monotone with lsn (same permutation ordering)
        ts = t["commit_ts"].to_pylist()
        pairs = sorted(zip(lsns, ts))
        assert all(pairs[i][1] <= pairs[i + 1][1] for i in range(len(pairs) - 1))
        max_ts = max(max_ts, seg["max_ts_us"])
    assert len(seen_lsns) == small_wal.n_base_events
    assert dup_count == small_wal.n_events - small_wal.n_base_events
    assert dup_count > 0


def test_schema_evolution_split(small_wal):
    has = [s["has_size_bytes"] for s in small_wal.segments]
    assert not has[0] and has[-1]  # early segments lack the column, late have it
    late = pq.read_table(small_wal.segments[-1]["file"])
    assert "size_bytes" in late.schema.names
    early = pq.read_table(small_wal.segments[0]["file"])
    assert "size_bytes" not in early.schema.names


def test_delete_payload_null(small_wal):
    t = pq.read_table(small_wal.segments[0]["file"]).to_pandas()
    dels = t[t["op"] == "delete"]
    assert len(dels) > 0
    assert dels["content"].isna().all() and dels["commit"].isna().all()
    live = t[t["op"] != "delete"]
    assert live["content"].notna().all()
    # lang derived from extension
    ext = live["path"].str.rsplit(".", n=1).str[-1]
    assert (live["lang"] == ext.map(EXT_TO_LANG)).all()


def test_oracle_final_state(small_wal):
    exp = expected_final_state(small_wal)
    assert exp.num_rows > 0
    df = exp.to_pandas()
    assert not df.duplicated(["repo", "path"]).any()
    assert df["content"].notna().all()
    # skew: hottest repo should dominate
    counts = df["repo"].value_counts()
    assert counts.iloc[0] >= counts.iloc[-1]
