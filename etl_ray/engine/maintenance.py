"""Lake maintenance operations: targeted erasure and derivative snapshots.

- :func:`erase_keys` — the GDPR delete-request analog
  (``gdpr_delete_request.sql:8,62-68``: transactional removal of a user's
  rows): injects synthetic delete tombstones through the SAME merge/commit
  path as normal CDC events (a maintenance mini-tick), so exactly-once,
  lineage and resume semantics all hold. The erasure LSN is taken above the
  current high watermark so no late in-flight event can resurrect the rows.

- :func:`snapshot_derivatives` — the daily/monthly derivative-table analog
  (``insert_user_history_derivates.sql:6-23``: filter the state snapshot by
  recency into ``_daily`` / ``_monthly``): filters the live lake state by
  last-modified day into recency-bounded derivative Parquet tables.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .apply import DELETED_COL, MergeApplier
from .lineage import LakeLineage, _atomic_write_json
from .partitioning import bucket_of
from .replay import target_schema_ser


ERASE_LSN_GAP = 1 << 20  # tombstone headroom over in-flight (bounded-late) events


def erase_keys(
    lake_dir: str,
    keys: list[tuple[str, str]],
    *,
    num_buckets: int | None = None,
    lsn_gap: int = ERASE_LSN_GAP,
    erase_map_fields: list[str] | None = None,
) -> dict:
    from .lock import writer_lock

    with writer_lock(lake_dir, "erase"):
        return _erase_keys_locked(
            lake_dir,
            keys,
            num_buckets=num_buckets,
            lsn_gap=lsn_gap,
            erase_map_fields=erase_map_fields,
        )


def _erase_keys_locked(
    lake_dir: str,
    keys: list[tuple[str, str]],
    *,
    num_buckets: int | None = None,
    lsn_gap: int = ERASE_LSN_GAP,
    erase_map_fields: list[str] | None = None,
) -> dict:
    """Remove the given (repo, path) keys from the live state by applying
    delete tombstones (driver-side mini-tick: the key list is small by
    definition of a deletion request). Returns per-bucket apply stats.

    The tombstone LSN is placed ``lsn_gap`` ABOVE the applied watermark so
    WAL events already emitted but not yet applied (bounded lateness —
    within the gap) cannot out-rank it and resurrect the erased rows;
    genuinely NEW events beyond the gap legitimately re-create the key.
    ``num_buckets`` defaults to the lake's own committed bucket count.

    NOTE: out-of-band maintenance changes each touched bucket's data_file,
    which automatically invalidates any WarmApplierActor caches (they
    validate against the committed manifest per apply)."""
    lineage = LakeLineage(lake_dir)
    lineage.recover()
    last = lineage.last_tick()
    if last is None:
        raise RuntimeError("cannot erase from an empty lake (no committed tick)")
    if num_buckets is None:
        num_buckets = last.get("num_buckets")
        if num_buckets is None:
            raise ValueError("lake predates bucket-count lineage; pass num_buckets")
    tick_id = last["tick"] + 1
    # anchor the tombstone gap on the TRUE WAL high-LSN, not the (possibly
    # already erase-inflated) applied watermark — otherwise repeated erasures
    # stack gaps (k·lsn_gap after k erasures) and later compaction loses its
    # lateness protection entirely. Successive erasures step by +1 above the
    # applied watermark so later delete-requests still out-rank earlier ones.
    wal_hi = LakeLineage.wal_watermark(last)
    erase_lsn = max(last["applied_through_lsn"] + 1, wal_hi + lsn_gap)

    repos = pa.array([k[0] for k in keys], pa.string())
    paths = pa.array([k[1] for k in keys], pa.string())
    n = len(keys)
    # state-shaped tombstone rows (schema of the current lake — delta files
    # included: the newest columns may exist only in appended deltas)
    from .apply import bucket_files
    from .schema_evo import unify_schemas

    files = [f for m in lineage.all_bucket_manifests() for f in bucket_files(m)]
    target = unify_schemas([pq.read_schema(f) for f in files])
    cols = {}
    for f in target:
        if f.name == "repo":
            cols[f.name] = repos
        elif f.name == "path":
            cols[f.name] = paths
        elif f.name == "lsn":
            cols[f.name] = pa.array([erase_lsn] * n, pa.int64())
        elif f.name == DELETED_COL:
            cols[f.name] = pa.array([True] * n, pa.bool_())
        else:
            cols[f.name] = pa.nulls(n, f.type)
    deltas = pa.table(cols)
    buckets = bucket_of(deltas["repo"], deltas["path"], num_buckets)

    applier = MergeApplier(
        lake_dir, tick_id, target_schema_ser(deltas.schema)
    )
    applied = 0
    for b in pc.unique(buckets).to_pylist():
        prev_man = lineage.bucket_manifest(int(b))
        part = deltas.filter(pc.equal(buckets, b))
        man = applier._apply_one(int(b), part, pre_aligned=True)
        d = {k: man[k][0].as_py() for k in man.schema.names}
        if not d.get("fold_file") and prev_man is not None:
            # the erase mini-tick runs without folds configured; carry the
            # bucket's fold LSN-tail sidecar reference AND fold watermark so
            # fold dedup state survives the erasure (the tail file itself is
            # GC-kept via this ref)
            d["fold_file"] = prev_man.get("fold_file")
            d["fold_through_lsn"] = prev_man.get("fold_through_lsn")
        lineage.publish_bucket(d)
        applied += part.num_rows
    # change data feed: forget the subject in retained history, then tell
    # downstream consumers to forget too (key-only erase records — the feed
    # must not republish the data it is erasing). A crash between the purge
    # and the tick publish loses the erase records for consumers (the redo
    # wipes the uncommitted dir): like any failed delete-request, erase_keys
    # MUST be re-run to completion — it is idempotent, and the re-run
    # re-appends the records under its own committed tick.
    feed_purged = 0
    if os.path.isdir(os.path.join(lake_dir, "_changelog")):
        from .changelog import append_erase_records, purge_keys_from_changelog

        feed_purged = purge_keys_from_changelog(lake_dir, keys)
        append_erase_records(lake_dir, tick_id, keys, erase_lsn, target)
    lineage.publish_tick(
        {
            "tick": tick_id,
            "through_seqno": last["through_seqno"],
            "applied_through_lsn": erase_lsn,
            "wal_through_lsn": wal_hi,  # erasure does NOT advance the WAL
            "segments": [],
            "events": n,
            "buckets_touched": len(pc.unique(buckets)),
            "state_rows": sum(m["rows"] for m in lineage.all_bucket_manifests()),
            "live_rows": sum(m["live_rows"] for m in lineage.all_bucket_manifests()),
            "num_buckets": num_buckets,  # propagate lake config lineage
            "kind": "erasure",
            # maintenance rewrites state in place: time-travel history ends here
            "retained_through_tick": tick_id,
        }
    )
    map_removed = 0
    if erase_map_fields:
        # the GDPR delete-request also removes the subject's pseudonym-map
        # rows (gdpr_delete_request.sql:62-68) — the stored hashes become
        # irreversible
        from . import gdpr

        for f in erase_map_fields:
            # a bare field name is only unambiguous for the key columns; any
            # other pseudonymized column needs an explicit "field=value" so
            # the delete-request can never silently remove zero mapping rows
            # (the gdpr_delete_request.sql completeness invariant)
            if "=" in f:
                fname, _, fval = f.partition("=")
                map_removed += gdpr.erase_from_map(lake_dir, fname, [fval])
            elif f == "repo":
                map_removed += gdpr.erase_from_map(lake_dir, f, [k[0] for k in keys])
            elif f == "path":
                map_removed += gdpr.erase_from_map(lake_dir, f, [k[1] for k in keys])
            else:
                raise ValueError(
                    f"--map-field {f!r}: subject values are only derivable "
                    "from the erase keys for 'repo'/'path'; pass an explicit "
                    f"'{f}=<value>' pair for other pseudonymized fields"
                )
    lineage.gc()
    return {
        "erased": applied,
        "tick": tick_id,
        "erase_lsn": erase_lsn,
        "map_rows_removed": map_removed,
        "changelog_rows_purged": feed_purged,
    }


def snapshot_derivatives(
    lake_dir: str,
    out_dir: str,
    *,
    daily_days: int = 1,
    monthly_days: int = 30,
    step_us_per_lsn: int,
) -> dict:
    """Write ``daily/`` and ``monthly/`` derivative tables: live rows whose
    last modification falls within the trailing window, measured against the
    lake's high watermark. Recency is derived from each row's applied LSN
    via the log's time step (``step_us_per_lsn`` — commit_ts is monotone
    with LSN, so lsn distance × step = event-time distance)."""
    from .export import final_state

    lineage = LakeLineage(lake_dir)
    last = lineage.last_tick()
    if last is None:
        raise RuntimeError("empty lake")
    # erasure ticks inflate applied_through_lsn by lsn_gap; recency windows
    # must anchor on the true WAL position
    hi_lsn = LakeLineage.wal_watermark(last)
    us_day = 86_400_000_000

    os.makedirs(out_dir, exist_ok=True)
    out = {}
    for name, window_days in (("daily", daily_days), ("monthly", monthly_days)):
        # streaming: distributed filter + partitioned parquet write — the
        # live table never materializes on the driver (it is the full lake)
        lo_lsn = hi_lsn - (window_days * us_day) // step_us_per_lsn
        ds = final_state(lake_dir).map_batches(
            lambda t, lo=lo_lsn: t.filter(pc.greater_equal(t["lsn"], lo)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        d = os.path.join(out_dir, name)
        tmp = d + ".tmp"
        import glob as _glob
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(d + ".old", ignore_errors=True)
        ds.write_parquet(tmp)
        # row count from parquet footers (metadata-only read, no data decode)
        out[name] = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in _glob.glob(os.path.join(tmp, "*.parquet"))
        )
        # the live snapshot stays readable until the replacement is fully
        # written: move it aside only now, swap in, then drop the old copy —
        # a mid-write crash leaves the previous snapshot published
        if os.path.exists(d):
            os.replace(d, d + ".old")
        os.replace(tmp, d)
        shutil.rmtree(d + ".old", ignore_errors=True)
    return out


def rebucket(
    lake_dir: str,
    new_num_buckets: int,
    *,
    fail_after_publish: int | None = None,  # crash injection for tests
    drop_columns: list[str] | None = None,  # explicit state-column repair
) -> dict:
    from .lock import writer_lock

    with writer_lock(lake_dir, "rebucket"):
        return _rebucket_locked(
            lake_dir,
            new_num_buckets,
            fail_after_publish=fail_after_publish,
            drop_columns=drop_columns,
        )


def _rebucket_locked(
    lake_dir: str,
    new_num_buckets: int,
    *,
    fail_after_publish: int | None = None,
    drop_columns: list[str] | None = None,
) -> dict:
    """Change the lake's bucket count — the partition-evolution operation a
    growing lake needs (bucket count is otherwise fixed at creation; at
    100× data growth the original count under-parallelizes every stage).

    Distributed re-partition using the engine's own indexed-spill shape:
    one map pass over the committed state writes per-NEW-bucket parquet row
    groups, then one task per new bucket concatenates + key-sorts its
    state file. Fold-tail sidecars are UNIONed into every new bucket (an
    LSN tail hit always means 'this exact event already folded', so the
    union stays exact while keys move buckets).

    Crash-safe via a rollback marker: the old manifest snapshot is
    persisted BEFORE any manifest changes; ``LakeLineage.recover()`` (run
    at every tick start and rebucket start) rolls a half-published attempt
    back to the old layout. The tick manifest is the commit point, as
    everywhere else."""
    import uuid

    import numpy as np
    import ray

    from .schema_evo import align_to, unify_schemas

    lineage = LakeLineage(lake_dir)
    lineage.recover()
    last = lineage.last_tick()
    if last is None:
        raise RuntimeError("empty lake")
    tick_id = last["tick"] + 1
    old_manifests = lineage.all_bucket_manifests()
    from .apply import bucket_files as _bucket_files

    files = [f for m in old_manifests for f in _bucket_files(m)]
    target = unify_schemas([pq.read_schema(f) for f in files])
    if drop_columns:
        # explicit column repair while the whole lake rewrites anyway —
        # e.g. shedding the phantom `b` a pre-fix rebucket baked into state
        # files (an operator decision, never a heuristic: a drop is data loss
        # if the column was real)
        # literal "deleted": the function-local `from .apply import
        # DELETED_COL` further down makes the module-level name unusable here
        core = {"repo", "path", "lsn", "deleted"}
        bad = core & set(drop_columns)
        if bad:
            raise ValueError(f"cannot drop engine-core columns: {sorted(bad)}")
        target = pa.schema([f for f in target if f.name not in set(drop_columns)])
    nb = new_num_buckets

    spill_dir = os.path.join(lake_dir, "_shuffle", f"rebucket-{tick_id:06d}")
    import shutil

    shutil.rmtree(spill_dir, ignore_errors=True)
    os.makedirs(spill_dir, exist_ok=True)

    drop_set = set(drop_columns or [])

    def spill(batch: pa.Table) -> pa.Table:
        from .partitioning import BUCKET_COL, with_bucket

        if drop_set:
            present = [c for c in batch.schema.names if c in drop_set]
            if present:
                batch = batch.drop_columns(present)
        # align_to keeps extra columns by design, so the repair drop above
        # must happen BEFORE it
        batch = with_bucket(align_to(batch, target), nb)
        order = pc.sort_indices(batch, sort_keys=[(BUCKET_COL, "ascending")])
        batch = batch.take(order)
        codes = batch[BUCKET_COL].to_numpy()
        data = batch.drop_columns([BUCKET_COL])
        from .partitioning import write_bucket_rgs

        f = os.path.join(spill_dir, f"part-{uuid.uuid4().hex}.parquet")
        out_b, out_rg, _ = write_bucket_rgs(data, codes, f)
        return pa.table(
            {
                "bucket": pa.array(out_b, pa.int32()),
                "file": pa.array([f] * len(out_b), pa.string()),
                "rg": pa.array(out_rg, pa.int32()),
            }
        )

    import ray.data

    # partitioning=None: without it the buckets/b=00017/ layout is
    # hive-inferred into a phantom string column `b` (the OLD bucket id)
    # that would be baked into every rewritten state file
    ds = ray.data.read_parquet(
        files, override_num_blocks=max(len(files), 1), partitioning=None
    )
    shards = ds.map_batches(
        spill, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).take_all()
    by_bucket: dict[int, tuple[list[str], list[int]]] = {}
    for r in shards:
        fs, rgs = by_bucket.setdefault(int(r["bucket"]), ([], []))
        fs.append(r["file"])
        rgs.append(int(r["rg"]))

    # fold-tail union (exact: LSNs are globally unique per event); the new
    # fold watermark is the MIN over old buckets — a lower horizon only
    # keeps more tail entries, never over-prunes
    fold_hi = min(
        (m.get("fold_through_lsn") or 0 for m in old_manifests), default=0
    )
    tail_union = None
    old_tails = [m["fold_file"] for m in old_manifests if m.get("fold_file")]
    if old_tails:
        t = pa.concat_tables(pq.read_table(f) for f in old_tails)
        tail_union = pa.table(
            {"lsn": pa.array(np.unique(t["lsn"].to_numpy()), pa.int64())}
        )

    from .apply import DELETED_COL, fold_tail_path

    @ray.remote(num_cpus=1)
    def write_bucket(bucket: int, fs: list[str], rgs: list[int]) -> dict:
        from .dedup import last_writer

        parts = [pq.ParquetFile(f).read_row_group(rg) for f, rg in zip(fs, rgs)]
        # fold before writing: a delta-mode source repeats touched keys
        # across base+delta files (no-op on an already-folded rewrite lake)
        t = last_writer(pa.concat_tables(parts)).sort_by(
            [("repo", "ascending"), ("path", "ascending")]
        )
        out_path = LakeLineage(lake_dir).bucket_state_path(bucket, tick_id)
        tmp = out_path + f".{os.getpid()}.tmp"
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, out_path)
        fold_file = None
        if tail_union is not None:
            fold_file = fold_tail_path(out_path)
            pq.write_table(tail_union, fold_file + ".tmp", compression="snappy")
            os.replace(fold_file + ".tmp", fold_file)
        live = t.num_rows - (pc.sum(t[DELETED_COL]).as_py() or 0)
        return {
            "bucket": bucket,
            "tick": tick_id,
            "applied_lsn": int(pc.max(t["lsn"]).as_py()),
            "rows": int(t.num_rows),
            "live_rows": int(live),
            "delta_rows": 0,
            "data_file": out_path,
            "fold_file": fold_file,
            "fold_through_lsn": fold_hi,
        }

    new_manifests = ray.get(
        [write_bucket.remote(b, fr[0], fr[1]) for b, fr in sorted(by_bucket.items())]
    )

    # rollback marker BEFORE any manifest mutation (the recovery anchor)
    _atomic_write_json(
        lineage.rebucket_marker_path,
        {"tick": tick_id, "old_manifests": old_manifests},
    )
    for i, m in enumerate(new_manifests):
        if fail_after_publish is not None and i >= fail_after_publish:
            raise RuntimeError("injected crash mid-rebucket (test only)")
        lineage.publish_bucket(m)
    new_ids = {m["bucket"] for m in new_manifests}
    for m in old_manifests:
        if m["bucket"] not in new_ids:
            lineage.remove_bucket_manifest(m["bucket"])
    lineage.publish_tick(
        {
            "tick": tick_id,
            "through_seqno": last["through_seqno"],
            "applied_through_lsn": last["applied_through_lsn"],
            "wal_through_lsn": LakeLineage.wal_watermark(last),
            "num_buckets": nb,
            "segments": [],
            "events": 0,
            "buckets_touched": len(new_manifests),
            "state_rows": sum(m["rows"] for m in new_manifests),
            "live_rows": sum(m["live_rows"] for m in new_manifests),
            "kind": "rebucket",
            # maintenance rewrites state in place: time-travel history ends here
            "retained_through_tick": tick_id,
        }
    )
    os.remove(lineage.rebucket_marker_path)
    lineage.gc()
    shutil.rmtree(spill_dir, ignore_errors=True)
    return {
        "tick": tick_id,
        "num_buckets": nb,
        "buckets": len(new_manifests),
        "state_rows": sum(m["rows"] for m in new_manifests),
    }


def compact_agglog(lake_dir: str) -> dict:
    from .lock import writer_lock

    with writer_lock(lake_dir, "compact-agglog"):
        return _compact_agglog_locked(lake_dir)


def _compact_agglog_locked(lake_dir: str) -> dict:
    """Consolidate the day-indexed agg log to one file per day.

    The spill stage writes one agg-log file per (tick, stage-1 task), so a
    long-running lake accumulates O(ticks × tasks) files and every per-day
    recompute re-opens all of their footers. Compaction rewrites the log to
    one file per day — O(days) metadata, one footer per day read — through
    the SAME ``t*.json`` index layout the readers already use, and migrates
    legacy ``day=*/`` directories (pre-round-2 lakes) into it. Replayed
    duplicate LSNs are dropped while rewriting (safe: the per-day recompute
    dedups by LSN anyway — ``aggregates.day_reduce``).

    Crash-safe by construction, no marker needed: new files publish
    parquet-first-index-last, old files are removed only afterwards
    (index-first), and a transient old+new double-reference is harmless
    because of the same LSN dedup — re-running compaction after a crash at
    any point just finishes the job. New files are named under the last
    COMMITTED tick id: the crashed-tick redo gc (``gc_agglog_tick``) only
    ever wipes an *uncommitted* tick's files, so it can never eat them.

    Offline admin op (like :func:`rebucket`): run it between ticks, not
    concurrently with a replay. Each day is an independent Ray task; at
    cluster scale a hot day would be sharded into several row groups by key
    hash — the index layout already supports many (file, rg) per day.
    """
    import glob
    import json
    import uuid

    import pandas as pd
    import ray.data

    lineage = LakeLineage(lake_dir)
    last = lineage.last_tick()
    if last is None:
        return {"days": 0, "files_removed": 0}
    tick_id = last["tick"]
    agdir = lineage.agglog_dir()

    old_indexes = sorted(glob.glob(os.path.join(agdir, "t*.json")))
    legacy_dirs = sorted(glob.glob(os.path.join(agdir, "day=*")))
    days: set[str] = set()
    for idx in old_indexes:
        with open(idx) as f:
            days.update(json.load(f).keys())
    for d in legacy_dirs:
        days.add(os.path.basename(d)[len("day="):])

    items = []
    keep_parquets: set[str] = set()
    all_rgs = lineage.agglog_days_rgs(days)  # one index pass for all days
    for d in sorted(days):
        rgs = all_rgs.get(d, [])
        if len(rgs) == 1 and rgs[0][1] == 0:
            # already one single-day file — skip iff its index holds only
            # this day (otherwise the file still interleaves other days)
            with open(rgs[0][0][: -len(".parquet")] + ".json") as f:
                if list(json.load(f).keys()) == [d]:
                    keep_parquets.add(rgs[0][0])
                    continue
        items.append(
            {
                "day": d,
                "files": [f for f, _ in rgs],
                "rgs": [r for _, r in rgs],
                "out": os.path.join(
                    agdir, f"t{tick_id:06d}-c{uuid.uuid4().hex[:8]}-{d}.parquet"
                ),
            }
        )
    if not items:
        return {"days": 0, "files_removed": 0}
    keep_parquets.update(it["out"] for it in items)

    def write_day(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        outs = []
        for _, row in batch.iterrows():
            t = pa.concat_tables(
                pq.read_table(f) if rg < 0 else pq.ParquetFile(f).read_row_group(rg)
                for f, rg in zip(row["files"], row["rgs"])
            )
            lsns = t["lsn"].to_numpy()
            _, first = np.unique(lsns, return_index=True)
            if len(first) < len(lsns):
                t = t.take(pa.array(np.sort(first)))
            tmp = row["out"] + f".{os.getpid()}.tmp"
            # one row group covering the whole file: the index records
            # {day: 0} and readers fetch only read_row_group(0), so the
            # default ~1M-row split would silently drop the tail
            pq.write_table(
                t, tmp, compression="zstd", row_group_size=max(t.num_rows, 1)
            )
            os.replace(tmp, row["out"])
            # index json LAST — readers discover the file through it
            _atomic_write_json(
                row["out"][: -len(".parquet")] + ".json", {row["day"]: 0}
            )
            outs.append({"day": row["day"], "rows": t.num_rows})
        return pd.DataFrame(outs)

    res = (
        ray.data.from_items(items, override_num_blocks=len(items))
        .map_batches(write_day, batch_format="pandas", batch_size=None)
        .to_pandas()
    )

    # cleanup: every day was rewritten, so every snapshot source file is now
    # redundant. Index json first (unreferences the parquet), parquet after.
    removed = 0
    for idx in old_indexes:
        pqf = idx[: -len(".json")] + ".parquet"
        if pqf in keep_parquets:
            continue
        os.remove(idx)
        if os.path.exists(pqf):
            os.remove(pqf)
        removed += 1
    import shutil as _shutil

    for d in legacy_dirs:
        _shutil.rmtree(d, ignore_errors=True)
        removed += 1
    return {
        "days": len(items),
        "rows": int(res["rows"].sum()),
        "files_removed": removed,
    }


def compact_tombstones(
    lake_dir: str,
    *,
    keep_after_lsn: int | None = None,
    lateness_bound: int = ERASE_LSN_GAP,
) -> dict:
    from .lock import writer_lock

    with writer_lock(lake_dir, "compact"):
        return _compact_tombstones_locked(
            lake_dir, keep_after_lsn=keep_after_lsn, lateness_bound=lateness_bound
        )


def _compact_tombstones_locked(
    lake_dir: str,
    *,
    keep_after_lsn: int | None = None,
    lateness_bound: int = ERASE_LSN_GAP,
) -> dict:
    """Drop tombstones whose delete-LSN is at or below the safe watermark
    (the documented GC policy: a tombstone only needs to outlive the maximum
    possible lateness of the log; below the low watermark no event can
    arrive that it would still need to shadow).

    The default watermark is ``applied_through_lsn − lateness_bound``: the
    WAL delivers bounded-out-of-order events across segment boundaries, so a
    tombstone within the lateness bound of the high watermark may still need
    to shadow a late lower-LSN update arriving in a later tick — collecting
    it would resurrect the erased key. Pass ``lateness_bound=0`` (or an
    explicit ``keep_after_lsn``) only when the WAL source is fully consumed
    and closed. Rewrites only buckets that actually shrink.
    """
    lineage = LakeLineage(lake_dir)
    lineage.recover()
    last = lineage.last_tick()
    if last is None:
        raise RuntimeError("empty lake")
    if keep_after_lsn is None:
        # derive from the TRUE WAL high-LSN: applied_through_lsn is inflated
        # by lsn_gap per erasure tick, which would silently zero (then turn
        # negative) the lateness protection and let late lower-LSN updates
        # resurrect erased keys
        watermark = LakeLineage.wal_watermark(last) - lateness_bound
    else:
        watermark = keep_after_lsn
    tick_id = last["tick"] + 1

    from .apply import read_bucket_state

    removed = rewritten = 0
    for man in lineage.all_bucket_manifests():
        t = read_bucket_state(man)  # folded view in delta mode
        dead = pc.and_(t[DELETED_COL], pc.less_equal(t["lsn"], watermark))
        n_dead = pc.sum(dead).as_py() or 0
        if n_dead == 0 and not man.get("delta_files"):
            continue
        kept = t.filter(pc.invert(dead))
        out_path = lineage.bucket_state_path(man["bucket"], tick_id)
        pq.write_table(kept, out_path + ".tmp", compression="zstd")
        os.replace(out_path + ".tmp", out_path)
        # compaction always lands as a fresh BASE: the delta chain resets
        lineage.publish_bucket(
            dict(
                man,
                tick=tick_id,
                rows=kept.num_rows,
                data_file=out_path,
                delta_files=[],
            )
        )
        removed += n_dead
        rewritten += 1
    # explicit tick record: a compaction tick must not inherit the previous
    # tick's segments/agglog/buckets_touched fields (it would masquerade as a
    # segment-processing tick in lineage and replay's agg-log completeness scan)
    manifests = lineage.all_bucket_manifests()
    lineage.publish_tick(
        {
            "tick": tick_id,
            "through_seqno": last["through_seqno"],
            "applied_through_lsn": last["applied_through_lsn"],
            "wal_through_lsn": LakeLineage.wal_watermark(last),
            "num_buckets": last.get("num_buckets"),
            "segments": [],
            "events": 0,
            "buckets_touched": rewritten,
            "state_rows": sum(m["rows"] for m in manifests),
            "live_rows": sum(m["live_rows"] for m in manifests),
            "kind": "compaction",
            # maintenance rewrites state in place: time-travel history ends here
            "retained_through_tick": tick_id,
        }
    )
    lineage.gc()
    return {"tombstones_removed": removed, "buckets_rewritten": rewritten, "tick": tick_id}
