"""Named multi-dim enrichment with as-of version picks (engine/enrich.py
DimSpec surface): N broadcast dims per TableSpec, hash-versioned +
re-broadcast on change, date-versioned dims joined as-of the event time.

Reference semantics: VAT picks the latest ``updated_at <= execution_date``
per country (``include/vat/create_country_vat_table.sql:4-15``,
``insert_user_history.sql:71-89``); currency rates join on (date_, currency)
(``store_itunes_process_data.sql:16-20``)."""

from __future__ import annotations

import json
import os
import threading
import time

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_ray.engine import ReplayEngine
from etl_ray.engine.enrich import DimSpec, load_dim_payload
from etl_ray.engine.export import final_state
from etl_ray.wal import EXT_TO_LANG, WalInfo

# every lang the generator can emit (plus the unknown fallback) — a dim
# covering the full key universe keeps the oracle's LEFT JOIN total
_ALL_LANGS = sorted(set(EXT_TO_LANG.values()) | {"unknown"})


def _wal_ts_range(wal):
    files = ", ".join(f"'{f}'" for f in wal.segment_files)
    lo, hi = duckdb.sql(
        f"SELECT MIN(commit_ts), MAX(commit_ts) "
        f"FROM read_parquet([{files}], union_by_name=true)"
    ).fetchone()
    return lo, hi


def _write_dims(tmp_path, wal):
    """A plain dim (lang → ecosystem) and a date-versioned dim (lang →
    rate, two versions: v1 from the epoch, v2 from the WAL's midpoint)."""
    lo, hi = _wal_ts_range(wal)
    mid = lo + (hi - lo) / 2
    langs = _ALL_LANGS
    eco_path = str(tmp_path / "eco.json")
    with open(eco_path, "w") as f:
        json.dump([{"lang": l, "eco": f"eco-{l[:2]}"} for l in langs], f)
    rate_path = str(tmp_path / "rates.parquet")
    rows = []
    for l in langs:
        rows.append({"lang": l, "valid_from": pd.Timestamp("1970-01-01"),
                     "rate": 1.0})
        rows.append({"lang": l, "valid_from": pd.Timestamp(mid), "rate": 2.0})
    df = pd.DataFrame(rows)
    df["valid_from"] = df["valid_from"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), rate_path)
    return eco_path, rate_path, mid


def test_multi_dim_asof_join_matches_oracle(ray_session, small_wal, tmp_path):
    """Final state carries each winner row's enrichment evaluated at ITS
    commit time: plain dim by lookup, versioned dim by as-of pick — both
    vs a DuckDB join over the WAL winners."""
    eco_path, rate_path, _ = _write_dims(tmp_path, small_wal)
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(
        small_wal.wal_dir, lake, num_buckets=8, concurrency=2, aggregate=False,
        dims=[
            {"name": "eco", "path": eco_path, "key": "lang"},
            {"name": "fx", "path": rate_path, "key": "lang", "as_of": "commit_ts"},
        ],
    )
    eng.replay_all(segments_per_tick=2)
    df = (
        final_state(lake)
        .to_pandas()[["repo", "path", "lang", "eco_eco", "fx_rate"]]
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    files = ", ".join(f"'{f}'" for f in small_wal.segment_files)
    exp = duckdb.sql(f"""
        WITH winners AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY repo, path
                                             ORDER BY lsn DESC) AS rn
                FROM read_parquet([{files}], union_by_name=true)
            ) WHERE rn = 1 AND op <> 'delete'
        ),
        eco AS (SELECT * FROM read_json_auto('{eco_path}')),
        pick AS (
            SELECT w.repo, w.path, w.lang, e.eco AS eco_eco, r.rate AS fx_rate,
                   row_number() OVER (PARTITION BY w.repo, w.path
                                      ORDER BY r.valid_from DESC) AS rn2
            FROM winners w
            LEFT JOIN eco e ON e.lang = w.lang
            LEFT JOIN read_parquet('{rate_path}') r
              ON r.lang = w.lang AND r.valid_from <= w.commit_ts
        )
        SELECT repo, path, lang, eco_eco, fx_rate FROM pick
        WHERE rn2 = 1 ORDER BY repo, path
    """).df()
    pd.testing.assert_frame_equal(df, exp, check_dtype=False)
    # lineage: every tick manifest records all dim versions
    from etl_ray.engine.lineage import LakeLineage

    for tk in LakeLineage(lake).all_ticks():
        assert set(tk["dim_versions"]) == {"eco", "fx"}


def test_dim_update_mid_follow(ray_session, small_wal, tmp_path):
    """A currency-like dim updated MID-FOLLOW: new ticks join the new
    version while rows committed earlier keep the version they were applied
    with (LWW — a dim change never rewrites state)."""
    langs = _ALL_LANGS
    dim_path = str(tmp_path / "eco.json")
    with open(dim_path, "w") as f:
        json.dump([{"lang": l, "eco": "v1"} for l in langs], f)

    view_dir = str(tmp_path / "walview")
    os.makedirs(view_dir, exist_ok=True)

    def manifest_through(k: int) -> None:
        WalInfo(
            wal_dir=view_dir,
            n_events=sum(s["rows"] for s in small_wal.segments[:k]),
            n_base_events=small_wal.n_base_events,
            evolve_lsn=small_wal.evolve_lsn,
            segments=small_wal.segments[:k],
            params=None,
        ).save()

    total = len(small_wal.segments)
    half = total // 2
    manifest_through(half)
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(
        view_dir, lake, num_buckets=8, concurrency=2, aggregate=False,
        dims=[{"name": "eco", "path": dim_path, "key": "lang"}],
    )
    results: list = []

    def run():
        results.extend(
            eng.follow(poll_interval_s=0.2, idle_timeout_s=6.0)
        )

    t = threading.Thread(target=run)
    t.start()
    from etl_ray.engine.lineage import LakeLineage

    deadline = time.monotonic() + 60
    lin = LakeLineage(lake)
    while time.monotonic() < deadline and lin.last_tick() is None:
        time.sleep(0.2)
    assert lin.last_tick() is not None
    with open(dim_path, "w") as f:
        json.dump([{"lang": l, "eco": "v2"} for l in langs], f)
    for k in range(half + 1, total + 1):
        time.sleep(0.7)
        manifest_through(k)
    t.join(timeout=120)
    assert not t.is_alive()
    assert sum(r.segments for r in results) == total

    vers = {
        tk["dim_versions"]["eco"] for tk in LakeLineage(lake).all_ticks()
    }
    assert len(vers) == 2, f"expected both dim versions in lineage: {vers}"
    df = final_state(lake).to_pandas()
    assert set(df["eco_eco"]) == {"v1", "v2"}, (
        "post-update ticks must join the new dim version while earlier "
        "committed rows keep the old one"
    )


def test_dim_spec_validation(tmp_path):
    with pytest.raises(ValueError, match="unknown dim-config keys"):
        DimSpec.from_config({"name": "x", "path": "p", "key": "k", "typo": 1})
    with pytest.raises(ValueError, match="needs 'key'"):
        DimSpec.from_config({"name": "x", "path": "p"})
    # duplicate keys without valid_from versions refuse to load
    p = str(tmp_path / "dup.json")
    with open(p, "w") as f:
        json.dump([{"lang": "py", "v": 1}, {"lang": "py", "v": 2}], f)
    with pytest.raises(ValueError, match="duplicate keys"):
        load_dim_payload(DimSpec(name="d", path=p, key="lang"))
    # versioned dim without a configured as_of column refuses to load
    p2 = str(tmp_path / "ver.json")
    with open(p2, "w") as f:
        json.dump([{"lang": "py", "valid_from": "2024-01-01", "v": 1}], f)
    with pytest.raises(ValueError, match="no as_of"):
        load_dim_payload(DimSpec(name="d", path=p2, key="lang"))
    with pytest.raises(ValueError, match="duplicate dim names"):
        ReplayEngine(
            "/tmp/nowal", "/tmp/nolake",
            dims=[{"name": "a", "path": p, "key": "k"},
                  {"name": "a", "path": p, "key": "k"}],
        )


def test_dims_via_table_config(tmp_path):
    from etl_ray.engine.tables import TableSpec, spec_from_config

    s = spec_from_config(
        {
            "name": "t", "wal": "/w",
            "dims": [{"name": "eco", "path": "/d.json", "key": "lang"}],
        }
    )
    assert s.dims == [{"name": "eco", "path": "/d.json", "key": "lang"}]
    with pytest.raises(ValueError, match="unknown dim-config keys"):
        spec_from_config(
            {"name": "t", "wal": "/w", "dims": [{"name": "e", "pathh": "x"}]}
        )
    with pytest.raises(ValueError, match="cannot have enrichment dims"):
        TableSpec(
            name="v", view="repo_stats", source="t",
            dims=[{"name": "e", "path": "p", "key": "k"}],
        ).validate()


def test_dim_partial_coverage_keeps_types_stable(ray_session, small_wal, tmp_path):
    """Review regression: a dim covering only SOME keys must not let the
    value column's type drift per batch (int64 stays int64 with nulls for
    missed keys — float64/null-typed drift breaks additive-only schema
    unification at the applier)."""
    dim_path = str(tmp_path / "partial.json")
    with open(dim_path, "w") as f:
        json.dump([{"lang": "python", "tier": 1}, {"lang": "go", "tier": 2}], f)
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(
        small_wal.wal_dir, lake, num_buckets=4, concurrency=2, aggregate=False,
        dims=[{"name": "d", "path": dim_path, "key": "lang"}],
    )
    eng.replay_all(segments_per_tick=1)  # many ticks → many chances to drift
    import pyarrow as pa

    ds = final_state(lake)
    assert ds.schema().base_schema.field("d_tier").type == pa.int64()
    df = ds.to_pandas()
    got = df[df["lang"] == "python"]["d_tier"]
    assert (got == 1).all()
    assert df[~df["lang"].isin(["python", "go"])]["d_tier"].isna().all()


def test_dim_numeric_join_key(ray_session, small_wal, tmp_path):
    """Review regression: non-string join keys work (the null-key path
    must not try to fill a numeric column with '')."""
    import pyarrow.compute as pc

    files = ", ".join(f"'{f}'" for f in small_wal.segment_files)
    # key the dim on lsns that are guaranteed to SURVIVE to final state
    # (LWW winners, not deletes) so the positive assertion below cannot
    # pass vacuously on an empty tagged set
    some_lsns = duckdb.sql(
        f"""
        SELECT lsn FROM (
            SELECT *, row_number() OVER (
                PARTITION BY repo, path ORDER BY lsn DESC) AS rn
            FROM read_parquet([{files}], union_by_name=true)
        ) WHERE rn = 1 AND op <> 'delete' ORDER BY lsn LIMIT 3
        """
    ).df()["lsn"].tolist()
    assert len(some_lsns) == 3
    dim_path = str(tmp_path / "bylsn.json")
    with open(dim_path, "w") as f:
        json.dump([{"lsn": int(x), "tag": f"t{i}"} for i, x in enumerate(some_lsns)], f)
    lake = str(tmp_path / "lake")
    ReplayEngine(
        small_wal.wal_dir, lake, num_buckets=4, concurrency=2, aggregate=False,
        dims=[{"name": "m", "path": dim_path, "key": "lsn"}],
    ).replay_all()
    df = final_state(lake).to_pandas()
    tagged = df[df["m_tag"].notna()]
    assert set(tagged["lsn"]) <= set(some_lsns)
    # every keyed winner row actually got its tag (the join really ran)
    expect = {int(x): f"t{i}" for i, x in enumerate(some_lsns)}
    got = {int(r.lsn): r.m_tag for r in df[df["lsn"].isin(some_lsns)].itertuples()}
    assert got == expect


def test_dim_all_null_key_batch(tmp_path):
    """Review regression: a batch whose join-key column is ENTIRELY null
    (e.g. a delete-only batch with a dim keyed on a payload column) must
    join to all-null values, not crash — dictionary_encode yields an
    EMPTY dictionary there and the unique-gather would index a 0-row
    frame."""
    from etl_ray.engine.enrich import _apply_dim

    dim_path = str(tmp_path / "d.json")
    with open(dim_path, "w") as f:
        json.dump([{"lang": "python", "tier": 1}], f)
    spec = DimSpec(name="d", path=dim_path, key="lang")
    payload = load_dim_payload(spec)
    batch = pa.table(
        {"lang": pa.nulls(3, pa.string()), "lsn": pa.array([1, 2, 3])}
    )
    out = _apply_dim(batch, spec, payload)
    assert out.num_rows == 3
    assert out["d_tier"].null_count == 3
    assert out["d_tier"].type == payload["types"]["tier"]
    # mixed null/non-null still joins the non-null keys
    batch2 = pa.table(
        {"lang": pa.array([None, "python", None]), "lsn": pa.array([1, 2, 3])}
    )
    out2 = _apply_dim(batch2, spec, payload)
    assert out2["d_tier"].to_pylist() == [None, 1, None]


def test_dim_int64_values_above_2_53_stay_exact(tmp_path):
    """Review regression: int64 rider values above 2^53 must survive the
    join EXACTLY even when some batch keys miss the dim (the old pandas
    reindex/merge path converted values to float64 and silently rounded
    them to the nearest representable double)."""
    from etl_ray.engine.enrich import _apply_dim

    big = (1 << 53) + 1  # not representable in float64
    dim_path = str(tmp_path / "big.json")
    with open(dim_path, "w") as f:
        json.dump([{"lang": "python", "big_id": big}], f)
    spec = DimSpec(name="d", path=dim_path, key="lang")
    payload = load_dim_payload(spec)
    assert payload["types"]["big_id"] == pa.int64()
    # one key hits, one misses the dim — the miss used to poison the
    # whole column through a float64 NaN frame
    batch = pa.table({"lang": pa.array(["python", "go"])})
    out = _apply_dim(batch, spec, payload)
    assert out["d_big_id"].to_pylist() == [big, None]

    # versioned (as-of) path: same guarantee
    dim2_path = str(tmp_path / "big_versioned.json")
    with open(dim2_path, "w") as f:
        json.dump(
            [
                {"lang": "python", "valid_from": "2024-01-01", "big_id": big},
                {"lang": "python", "valid_from": "2024-06-01", "big_id": big + 2},
            ],
            f,
        )
    spec2 = DimSpec(name="v", path=dim2_path, key="lang", as_of="ts")
    payload2 = load_dim_payload(spec2)
    batch2 = pa.table(
        {
            "lang": pa.array(["python", "python", "go"]),
            "ts": pa.array(
                [
                    pd.Timestamp("2024-03-01"),
                    pd.Timestamp("2024-07-01"),
                    pd.Timestamp("2024-07-01"),
                ],
                type=pa.timestamp("us"),
            ),
        }
    )
    out2 = _apply_dim(batch2, spec2, payload2)
    assert out2["v_big_id"].to_pylist() == [big, big + 2, None]


def test_dim_output_collision_with_upstream_column_rejected(tmp_path):
    """Review regression: a dim whose output name {name}_{col} equals a
    real upstream column would silently overwrite source data — the
    enricher must refuse instead."""
    import ray

    from etl_ray.engine.enrich import LangEnricher, MultiDimEnricher

    dim_path = str(tmp_path / "c.json")
    # dim named 'commit' with value column 'x' -> output 'commit_x'
    with open(dim_path, "w") as f:
        json.dump([{"lang": "python", "x": 1}], f)
    spec = DimSpec(name="commit", path=dim_path, key="lang")
    payload = load_dim_payload(spec)
    enricher = MultiDimEnricher(
        LangEnricher(ext_map={}), [(spec, ray.put(payload))]
    )
    batch = pa.table(
        {
            "path": pa.array(["a.py"]),
            "lang": pa.array(["python"]),
            "commit_x": pa.array([99]),
        }
    )
    with pytest.raises(ValueError, match="collides with an upstream"):
        enricher(batch)
