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
from .lineage import LakeLineage
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
    last = lineage.last_tick()
    if last is None:
        raise RuntimeError("cannot erase from an empty lake (no committed tick)")
    if num_buckets is None:
        num_buckets = last.get("num_buckets")
        if num_buckets is None:
            raise ValueError("lake predates bucket-count lineage; pass num_buckets")
    tick_id = last["tick"] + 1
    erase_lsn = last["applied_through_lsn"] + lsn_gap

    repos = pa.array([k[0] for k in keys], pa.string())
    paths = pa.array([k[1] for k in keys], pa.string())
    n = len(keys)
    # state-shaped tombstone rows (schema of the current lake)
    files = [m["data_file"] for m in lineage.all_bucket_manifests()]
    from .schema_evo import unify_schemas

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
        part = deltas.filter(pc.equal(buckets, b))
        man = applier._apply_one(int(b), part, pre_aligned=True)
        lineage.publish_bucket({k: man[k][0].as_py() for k in man.schema.names})
        applied += part.num_rows
    lineage.publish_tick(
        {
            "tick": tick_id,
            "through_seqno": last["through_seqno"],
            "applied_through_lsn": erase_lsn,
            "segments": [],
            "events": n,
            "buckets_touched": len(pc.unique(buckets)),
            "state_rows": sum(m["rows"] for m in lineage.all_bucket_manifests()),
            "live_rows": sum(m["live_rows"] for m in lineage.all_bucket_manifests()),
            "num_buckets": num_buckets,  # propagate lake config lineage
            "kind": "erasure",
        }
    )
    map_removed = 0
    if erase_map_fields:
        # the GDPR delete-request also removes the subject's pseudonym-map
        # rows (gdpr_delete_request.sql:62-68) — the stored hashes become
        # irreversible
        from . import gdpr

        for f in erase_map_fields:
            vals = [k[0] if f == "repo" else k[1] for k in keys]
            map_removed += gdpr.erase_from_map(lake_dir, f, vals)
    lineage.gc()
    return {
        "erased": applied,
        "tick": tick_id,
        "erase_lsn": erase_lsn,
        "map_rows_removed": map_removed,
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
    hi_lsn = last["applied_through_lsn"]
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
        shutil.rmtree(d, ignore_errors=True)
        ds.write_parquet(tmp)
        # row count from parquet footers (metadata-only read, no data decode)
        out[name] = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in _glob.glob(os.path.join(tmp, "*.parquet"))
        )
        os.replace(tmp, d)  # atomic publish of the snapshot directory
    return out


def compact_tombstones(
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
    last = lineage.last_tick()
    if last is None:
        raise RuntimeError("empty lake")
    if keep_after_lsn is None:
        watermark = last["applied_through_lsn"] - lateness_bound
    else:
        watermark = keep_after_lsn
    tick_id = last["tick"] + 1

    removed = rewritten = 0
    for man in lineage.all_bucket_manifests():
        t = pq.read_table(man["data_file"])
        dead = pc.and_(t[DELETED_COL], pc.less_equal(t["lsn"], watermark))
        n_dead = pc.sum(dead).as_py() or 0
        if n_dead == 0:
            continue
        kept = t.filter(pc.invert(dead))
        out_path = lineage.bucket_state_path(man["bucket"], tick_id)
        pq.write_table(kept, out_path + ".tmp", compression="zstd")
        os.replace(out_path + ".tmp", out_path)
        lineage.publish_bucket(
            dict(
                man,
                tick=tick_id,
                rows=kept.num_rows,
                data_file=out_path,
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
            "num_buckets": last.get("num_buckets"),
            "segments": [],
            "events": 0,
            "buckets_touched": rewritten,
            "state_rows": sum(m["rows"] for m in manifests),
            "live_rows": sum(m["live_rows"] for m in manifests),
            "kind": "compaction",
        }
    )
    lineage.gc()
    return {"tombstones_removed": removed, "buckets_rewritten": rewritten, "tick": tick_id}
