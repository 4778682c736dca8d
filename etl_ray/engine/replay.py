"""The replay loop: WAL segments → deduped deltas → merge appliers → commit.

One *tick* = the reference's one Airflow DAG run (``DAG_user_history.py``'s
daily chain, SURVEY.md §3.1), compressed into a single lazy Ray Data
pipeline with exactly ONE shuffle:

  discover pending segments (lineage watermark)                    [sensor/ST4]
  → read_parquet per schema group, align (schema evolution)        [S1/§1.3]
  → fused task stage: lang enrich → per-batch last-writer          [M5/D1 partial,
      pre-reduction (the combiner: a hot key sends ≤1 row per       skew/salt]
      batch to the shuffle) → op→tombstone shaping → bucket id
  → the ONE shuffle: shared-FS spill (indexed shuffle files, one
      parquet row group per bucket) | hash repartition | sort       [S2 shape]
  → MergeApplier actor pool: stateful LWW upsert/delete/evolve      [A5/J4/J5]
  → driver: publish bucket manifests, re-aggregate touched days,
    publish tick manifest (the commit point), GC                   [S2/S3/ST4]

Crash anywhere before the tick manifest → previous tick stays authoritative
and the re-run is a no-op-idempotent re-apply (exactly-once by idempotence).
Ticks are strictly serial, like ``depends_on_past=True`` day runs.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..wal import WalInfo
from . import aggregates
from .apply import MergeApplier, SpilledMergeApplier, deltas_to_state_shape
from .dedup import last_writer
from .enrich import LangEnricher
from .lineage import LakeLineage
from .partitioning import BUCKET_COL, with_bucket
from .source import pending_segments, read_segments_indexed, target_schema_for


class DeadlineExceededError(RuntimeError):
    """The run's wall-clock budget ran out (checked BETWEEN ticks, so the
    lake is always at a committed tick when this raises). Reference analog:
    the DAG-level deadline sensor that fails the run after 8 h
    (``etl/plugins/operators/deadline.py:29-38``, wired at
    ``DAG_user_history.py:98-105``)."""


@dataclass
class TickResult:
    tick: int
    segments: int
    events: int
    buckets_touched: int
    state_rows: int
    live_rows: int
    seconds: float


class ReplayEngine:
    """Drives serial ticks over a WAL directory into a lake directory.

    ``num_buckets`` is the fixed partition count of the lake (choose ≈ 2–4×
    total cluster CPUs at scale); ``concurrency`` sizes the applier actor
    pool for one tick.
    """

    def __init__(
        self,
        wal_dir: str,
        lake_dir: str,
        *,
        num_buckets: int = 32,
        concurrency: int | tuple[int, int] | None = None,
        aggregate: bool = True,
        shuffle: str = "spill",  # "spill" (shared-FS) | "hash" | "sort"
        warm_state: bool = True,  # persistent applier actors across ticks
        fail_after_buckets: int | None = None,  # crash injection for tests
        checks: list | None = None,  # quality.CheckSpec list; None = defaults
        folds: list | None = None,  # folds.FoldSpec list; default: none
        pseudonym_fields: list[str] | None = None,  # gdpr map fields
        tz_offset_minutes: int = 0,  # per-table local-day boundary for aggs
        retain_ticks: int = 0,  # >0: keep state history for as-of reads
        emit_changelog: bool = False,  # CDC-out feed (engine/changelog.py)
        changelog_retain: int | None = None,  # feed retention in ticks
        deadline_minutes: float | None = None,  # per-run wall-clock budget
        on_event=None,  # alert callback(s): see engine/alerts.py
        ext_map_path: str | None = None,  # versioned enrichment dim (JSON)
        dims: list | None = None,  # named broadcast dims (enrich.DimSpec)
        state_mode: str = "rewrite",  # "rewrite" | "delta" (base+delta buckets)
        delta_threshold: int = 8,  # delta files per bucket before a base fold
    ):
        if state_mode not in ("rewrite", "delta"):
            raise ValueError(f"state_mode must be rewrite|delta, got {state_mode!r}")
        # retain_ticks works in BOTH modes: rewrite keeps whole per-tick
        # state images; delta reconstructs an as-of point by folding the
        # newest base <= T plus the deltas in (base, T] (GC keeps
        # dereferenced chain segments inside the window — lineage.gc)
        self.state_mode = state_mode
        self.delta_threshold = int(delta_threshold)
        # Versioned broadcast dimension (the reference refreshes its
        # currency/GeoIP dims on side-DAGs — DAG_get_currencies_data.py:33-63,
        # DAG_update_geoip_db.py:32-51): a JSON overlay of the built-in
        # ext→lang map, re-read at every tick start. On content change the
        # map is re-broadcast (ray.put once per VERSION, read per actor) so
        # a long-running follow() tags subsequent ticks with the new dim.
        # Warm appliers need no invalidation: they cache committed STATE,
        # which a dim change never rewrites (LWW — only new events carry
        # the new tags).
        self.ext_map_path = ext_map_path
        self._dim_version: str | None = None
        self._dim_ref = None
        # named multi-dim enrichment (VAT/currency-style, as-of capable):
        # same versioning contract as the ext map, one ref per dim VERSION
        from .enrich import DimSpec

        self.dims = [
            d if isinstance(d, DimSpec) else DimSpec.from_config(d)
            for d in (dims or [])
        ]
        if len({d.name for d in self.dims}) != len(self.dims):
            raise ValueError("duplicate dim names")
        self._dims_versions: dict[str, str] = {}
        self._dims_refs: dict[str, object] = {}
        self.deadline_s = (
            deadline_minutes * 60.0 if deadline_minutes is not None else None
        )
        if on_event is None:
            self.event_callbacks: tuple = ()
        elif callable(on_event):
            self.event_callbacks = (on_event,)
        else:
            self.event_callbacks = tuple(on_event)
        self.pseudonym_fields = pseudonym_fields or []
        self.tz_offset_minutes = int(tz_offset_minutes)
        self.retain_ticks = int(retain_ticks)
        self.emit_changelog = bool(emit_changelog)
        self.changelog_retain = changelog_retain
        from .quality import DEFAULT_CHECKS

        self.checks = DEFAULT_CHECKS if checks is None else checks
        self.folds = folds or []
        if self.folds and shuffle != "spill":
            raise ValueError(
                "state-fold metrics need the unreduced fold-row stream of "
                "the spill shuffle (sort/hash paths pre-reduce in place)"
            )
        self.shuffle = shuffle
        self.wal = WalInfo.load(wal_dir)
        self.lake_dir = lake_dir
        self.lineage = LakeLineage(lake_dir)
        self.num_buckets = num_buckets
        self.concurrency = concurrency
        self.aggregate = aggregate
        self.warm_state = warm_state and shuffle == "spill"
        self._warm_actors: list | None = None
        self.fail_after_buckets = fail_after_buckets
        # exact-once fold dedup window: the log's declared out-of-order
        # bound (duplicates re-emit within it), with margin
        p = self.wal.params or {}
        self.fold_lateness = 2 * int(p.get("ooo_window", 1 << 14)) + 16

    def _refresh_dim(self) -> str | None:
        """Reload the enrichment dim if its content changed; returns the
        current version tag (sha256 prefix of the file bytes, recorded in
        the tick manifest for lineage)."""
        if not self.ext_map_path:
            return None
        import json as _json

        from ..wal import EXT_TO_LANG
        from .enrich import versioned_broadcast

        ver, ref = versioned_broadcast(
            self.ext_map_path,
            self._dim_version,
            lambda raw: {**EXT_TO_LANG, **_json.loads(raw)},
        )
        if ref is not None:
            self._dim_ref = ref
            self._dim_version = ver
        return ver

    def _refresh_dims(self) -> dict[str, str]:
        """Hash-version every named dim file; re-broadcast (ray.put once
        per version) the ones whose content changed since the last tick.
        Returns {dim name: version} for the tick manifest."""
        if not self.dims:
            return {}
        from .enrich import load_dim_payload, versioned_broadcast

        versions = {}
        for spec in self.dims:
            ver, ref = versioned_broadcast(
                spec.path,
                self._dims_versions.get(spec.name),
                lambda raw, spec=spec: load_dim_payload(spec, raw=raw),
            )
            if ref is not None:
                self._dims_refs[spec.name] = ref
                self._dims_versions[spec.name] = ver
            versions[spec.name] = ver
        return versions

    def _make_enricher(self):
        if self._dim_ref is not None:
            lang = LangEnricher(ext_map_ref=self._dim_ref)
        else:
            lang = LangEnricher()
        if self.dims:
            from .enrich import MultiDimEnricher

            return MultiDimEnricher(
                lang, [(s, self._dims_refs[s.name]) for s in self.dims]
            )
        return lang

    def _warm_pool(self):
        """Lazily created persistent applier actors (see WarmApplierActor).
        num_cpus=0: they are idle while the stage-1 Dataset runs and must
        not reserve cores from it; stage 2 runs after a barrier, so the
        pool effectively has the machine to itself. Handles are held on the
        engine — dropping the engine terminates the actors."""
        if self._warm_actors is None:
            from .apply import WarmApplierActor

            _, hi = self._applier_pool_size()
            k = max(1, min(hi, self.num_buckets))
            self._warm_actors = [
                WarmApplierActor.options(num_cpus=0).remote(
                    self.lake_dir, 256, self.folds, self.fold_lateness,
                    self.emit_changelog, self.state_mode, self.delta_threshold,
                )
                for _ in range(k)
            ]
        return self._warm_actors

    def invalidate_warm_state(self) -> None:
        """Drop the warm pool (e.g. after out-of-band lake maintenance such
        as ``maintenance.erase_keys`` — cached state would be stale)."""
        self._warm_actors = None

    def _applier_pool_size(self) -> tuple[int, int]:
        """Autoscaling applier pool capped BELOW the CPU count: a fixed pool
        that reserves every core starves the read/reduce stages and the
        pipeline deadlocks (guide §actor pools). Leave ≥2 cores for the
        upstream tasks."""
        if isinstance(self.concurrency, tuple):
            return self.concurrency
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
        else:
            # Library callers may size the pool before (or without) a live
            # Ray session — fail soft to the host CPU count rather than
            # raising RaySystemError from a background warm-pool thread.
            cpus = int(os.cpu_count() or 8)
        hi = max(2, cpus - 2)
        if isinstance(self.concurrency, int):
            hi = min(self.concurrency, hi)
        return (1, max(1, hi))

    # ------------------------------------------------------------------

    def _spill_apply(self, ds, tick_id: int, schema_ser: bytes):
        """Shared-FS shuffle (the default, and the shape a multi-node lake
        engine actually wants): stage 1 tasks append each pre-reduced batch's
        rows to per-bucket delta files under ``lake/_shuffle/tick-N/`` (the
        lake directory IS the shared storage on a real cluster — this is an
        external shuffle, like Spark's, with parquet+zstd as the wire
        format); stage 2 is an applier actor pool over (bucket, files)
        descriptors — content bytes never transit the object store, and
        stage-2 parallelism is min(buckets, pool) regardless of input block
        sizing. Crash-safe: the spill dir is wiped and rebuilt on tick redo.
        """
        import shutil
        import uuid

        import ray.data

        spill_dir = os.path.join(self.lake_dir, "_shuffle", f"tick-{tick_id:06d}")
        shutil.rmtree(spill_dir, ignore_errors=True)
        os.makedirs(spill_dir, exist_ok=True)

        nb = self.num_buckets
        enrich = self._make_enricher()
        # capture plain values, NOT self: the closure ships to every task and
        # self would drag along warm-actor handles and the WAL manifest
        do_aggregate = self.aggregate
        lineage = self.lineage
        folds_active = bool(self.folds)
        tz_off = self.tz_offset_minutes
        qdir = os.path.join(self.lake_dir, "_quarantine", f"tick-{tick_id:06d}")

        from .partitioning import write_bucket_rgs as _write_bucket_rgs

        def spill(batch: pa.Table) -> pa.Table:
            """Fused stage-1 task: enrich → (a) append the narrow per-day
            agg-log projection (pre-reduction — aggregates need every
            distinct LSN) → (b) per-batch last-writer pre-reduction →
            tombstone shape → ONE shuffle file with one parquet ROW GROUP
            per bucket (an indexed shuffle file): bucket readers fetch only
            their row group — no per-(task,bucket) tiny-file explosion."""
            import numpy as np

            from .aggregates import _project

            empty_desc = pa.table(
                {
                    "bucket": pa.array([], pa.int32()),
                    "file": pa.array([], pa.string()),
                    "rg": pa.array([], pa.int32()),
                    "rows": pa.array([], pa.int64()),
                    "ffile": pa.array([], pa.string()),
                    "frg": pa.array([], pa.int32()),
                }
            )
            if batch.num_rows == 0:
                return empty_desc
            from .quality import split_valid

            batch, bad = split_valid(batch)
            if bad.num_rows:
                # bad rows are ROUTED, not dropped (event_quality semantics):
                # per-tick quarantine side table, redone atomically with the
                # tick (the whole dir is wiped on a crash-redo)
                os.makedirs(qdir, exist_ok=True)
                qf = os.path.join(qdir, f"part-{uuid.uuid4().hex}.parquet")
                pq.write_table(bad, qf + ".tmp", compression="zstd")
                os.replace(qf + ".tmp", qf)
            if batch.num_rows == 0:
                return empty_desc
            batch = enrich(batch)
            if do_aggregate:
                # ONE agg-log file per task, one row group per day run,
                # sidecar day→rg index (indexed spill-file shape) — a
                # wide-day backfill tick writes tasks files, not tasks×days
                import json as _json

                proj = _project(batch, tz_off)
                order = pc.sort_indices(proj, sort_keys=[("day", "ascending")])
                proj = proj.take(order)
                fp = lineage.agglog_part_path(tick_id, uuid.uuid4().hex)
                days_np = proj["day"].to_pylist()
                import numpy as _np

                arr = _np.array(days_np, dtype=object)
                bounds = _np.flatnonzero(arr[1:] != arr[:-1]) + 1
                starts = _np.concatenate([[0], bounds])
                ends = _np.concatenate([bounds, [len(arr)]])
                index = {}
                writer = pq.ParquetWriter(fp + ".tmp", proj.schema, compression="snappy")
                try:
                    for rg, (s, e) in enumerate(zip(starts, ends)):
                        # one row group per day run — see _write_bucket_rgs
                        writer.write_table(proj.slice(s, e - s), row_group_size=e - s)
                        index[arr[s]] = rg
                finally:
                    writer.close()
                os.replace(fp + ".tmp", fp)
                idx_path = fp[: -len(".parquet")] + ".json"
                with open(idx_path + ".tmp", "w") as f:
                    _json.dump(index, f)
                os.replace(idx_path + ".tmp", idx_path)
            fold_lookup: dict[int, int] = {}
            ffile = ""
            if folds_active:
                # second stream: the UNREDUCED narrow fold projection (the
                # data stream below is pre-reduced to per-key winners, but
                # folds need every distinct event) — same bucket layout,
                # own file, ~2% of the content bytes
                from .folds import fold_delta_projection

                fp = with_bucket(fold_delta_projection(batch), nb)
                forder = pc.sort_indices(fp, sort_keys=[(BUCKET_COL, "ascending")])
                fp = fp.take(forder)
                fcodes = fp[BUCKET_COL].to_numpy()
                fdata = fp.drop_columns([BUCKET_COL])
                ffile = os.path.join(spill_dir, f"fold-{uuid.uuid4().hex}.parquet")
                fbuckets, frgs_list, _ = _write_bucket_rgs(fdata, fcodes, ffile)
                fold_lookup = dict(zip(fbuckets, frgs_list))

            batch = with_bucket(deltas_to_state_shape(last_writer(batch)), nb)
            order = pc.sort_indices(batch, sort_keys=[(BUCKET_COL, "ascending")])
            batch = batch.take(order)
            codes = batch[BUCKET_COL].to_numpy()
            data = batch.drop_columns([BUCKET_COL])
            f = os.path.join(spill_dir, f"part-{uuid.uuid4().hex}.parquet")
            # transient shuffle data: cheap codec (snappy)
            buckets_out, rgs_out, rows_out = _write_bucket_rgs(data, codes, f)
            return pa.table(
                {
                    "bucket": pa.array(buckets_out, pa.int32()),
                    "file": pa.array([f] * len(buckets_out), pa.string()),
                    "rg": pa.array(rgs_out, pa.int32()),
                    "rows": pa.array(rows_out, pa.int64()),
                    "ffile": pa.array(
                        [ffile if b in fold_lookup else "" for b in buckets_out],
                        pa.string(),
                    ),
                    "frg": pa.array(
                        [fold_lookup.get(b, -1) for b in buckets_out], pa.int32()
                    ),
                }
            )

        spill_ds = ds.map_batches(
            spill, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
        t_sp = time.perf_counter()
        shards = spill_ds.take_all()
        self.spill_stats = spill_ds.stats()
        if os.environ.get("ETL_RAY_DEBUG"):
            print(f"[etl-ray] stage1 spill: {time.perf_counter() - t_sp:.2f}s", flush=True)

        # orchestration evidence for the scaling bench: how many independent
        # tasks each stage actually ran (stage 1 = one spill file per task
        # batch; stage 2 = one work item per touched bucket)
        self.last_stage1_tasks = len({r["file"] for r in shards})

        by_bucket: dict[int, tuple[list[str], list[int], list[str], list[int]]] = {}
        for r in shards:
            files, rgs, ffiles, frgs = by_bucket.setdefault(
                int(r["bucket"]), ([], [], [], [])
            )
            files.append(r["file"])
            rgs.append(int(r["rg"]))
            if r.get("ffile"):
                ffiles.append(r["ffile"])
                frgs.append(int(r["frg"]))
        items = [
            {"bucket": b, "files": fr[0], "rgs": fr[1], "ffiles": fr[2], "frgs": fr[3]}
            for b, fr in sorted(by_bucket.items())
        ]
        self.last_stage2_items = len(items)
        if not items:
            return None
        if self.warm_state:
            import ray as _r

            t_wa = time.perf_counter()
            pool = self._warm_pool()
            futures = [
                pool[it["bucket"] % len(pool)].apply.remote(
                    it["bucket"], it["files"], it["rgs"], tick_id, schema_ser,
                    it["ffiles"], it["frgs"],
                )
                for it in items
            ]
            out = _r.get(futures)  # list of manifest dicts
            if os.environ.get("ETL_RAY_DEBUG"):
                print(
                    f"[etl-ray] warm apply ({len(items)} buckets): "
                    f"{time.perf_counter() - t_wa:.2f}s",
                    flush=True,
                )
            return out
        lo, hi = self._applier_pool_size()
        apply_ds = ray.data.from_items(items, override_num_blocks=len(items))
        return apply_ds.map_batches(
            SpilledMergeApplier,
            fn_constructor_args=(
                self.lake_dir, tick_id, schema_ser, self.folds,
                self.fold_lateness, self.emit_changelog,
                self.state_mode, self.delta_threshold,
            ),
            batch_format="pyarrow",
            batch_size=None,
            concurrency=(lo, min(hi, max(1, len(items)))),
            num_cpus=1,
        )

    def _shuffle_apply(self, ds, tick_id: int, schema_ser: bytes):
        """The one all-to-all: co-locate rows by bucket, then the stateful
        applier pool. ``shuffle='spill'`` (default) is the shared-FS
        external shuffle (see ``_spill_apply``); ``'hash'`` is Ray's
        HASH_SHUFFLE repartition by key; ``'sort'`` the sort-based
        ``groupby().map_groups`` path."""
        if self.shuffle == "spill":
            return self._spill_apply(ds, tick_id, schema_ser)
        if self.shuffle == "sort":
            return ds.groupby("__bucket").map_groups(
                MergeApplier,
                fn_constructor_args=(
                    self.lake_dir, tick_id, schema_ser, None, 0,
                    self.emit_changelog, self.state_mode, self.delta_threshold,
                ),
                batch_format="pyarrow",
                concurrency=self._applier_pool_size(),
                num_cpus=1,
            )
        parts = ds.repartition(self.num_buckets, keys=["__bucket"])
        return parts.map_batches(
            MergeApplier,
            fn_constructor_args=(
                self.lake_dir, tick_id, schema_ser, None, 0,
                self.emit_changelog, self.state_mode, self.delta_threshold,
            ),
            batch_format="pyarrow",
            batch_size=None,  # one batch per hash partition (whole buckets)
            concurrency=self._applier_pool_size(),
            num_cpus=1,
        )

    def tick(self, max_segments: int | None = None) -> TickResult | None:
        # single-writer guard: held per tick (re-acquired each tick, which
        # refreshes the TTL for long replays); the pending-segment check
        # below needs no lock (it only reads the WAL manifest)
        from .alerts import emit_event
        from .lock import WriterLockError, writer_lock
        from .quality import DataQualityError

        try:
            with writer_lock(self.lake_dir, "replay"):
                return self._tick_locked(max_segments)
        except WriterLockError:
            raise  # interleaving with maintenance, not a failure — no alert
        except DataQualityError as e:
            emit_event(
                self.lake_dir, "quality_failure", {"error": str(e)},
                self.event_callbacks,
            )
            raise
        except Exception as e:
            emit_event(
                self.lake_dir, "tick_failure",
                {"error": f"{type(e).__name__}: {e}"},
                self.event_callbacks,
            )
            raise

    def _check_deadline(self, started: float, ticks_done: int) -> None:
        """Raise between ticks once the run's budget is spent. The lake is
        at a committed tick at every call site, so an abort never loses or
        tears work — the next run resumes from the watermark."""
        if self.deadline_s is None:
            return
        elapsed = time.monotonic() - started
        if elapsed > self.deadline_s:
            from .alerts import emit_event

            emit_event(
                self.lake_dir,
                "deadline_exceeded",
                {
                    "deadline_s": self.deadline_s,
                    "elapsed_s": round(elapsed, 3),
                    "ticks_completed": ticks_done,
                },
                self.event_callbacks,
            )
            raise DeadlineExceededError(
                f"run budget {self.deadline_s:.0f}s exceeded after "
                f"{elapsed:.1f}s ({ticks_done} ticks committed); lake is at "
                "its last committed tick — rerun to resume"
            )

    def _tick_locked(self, max_segments: int | None = None) -> TickResult | None:
        t0 = time.perf_counter()
        last = self.lineage.last_tick()
        through = last["through_seqno"] if last else -1
        tick_id = (last["tick"] + 1) if last else 0
        # the bucket count is a property of the LAKE, not the run: resuming
        # with a different value would scatter a key's updates away from its
        # committed state row (duplicate live keys). Adopt the lake's value.
        if last is not None and last.get("num_buckets") not in (None, self.num_buckets):
            self.num_buckets = last["num_buckets"]
            self._warm_actors = None
        segs = pending_segments(self.wal, through, max_segments)
        if not segs:
            return None

        dim_version = self._refresh_dim()  # re-broadcast the dim if it changed
        dim_versions = self._refresh_dims()  # named multi-dim refresh
        self.lineage.recover()  # roll back any crashed rebucket attempt
        self.lineage.gc(self.retain_ticks)  # drop uncommitted staging from any crashed run

        if self.warm_state:
            # kick actor CREATION now (async, num_cpus=0): startup overlaps
            # the stage-1 dataset instead of serializing after it
            self._warm_pool()

        # Ray Data snapshots DataContext at dataset CREATION: the hash
        # strategy must be active while the apply pipeline is being built.
        from ray.data.context import DataContext, ShuffleStrategy

        dctx = DataContext.get_current()
        prev_strategy = dctx.shuffle_strategy
        if self.shuffle == "hash":
            dctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE

        self.lineage.gc_agglog_tick(tick_id)  # crashed-attempt agg-log files
        import shutil as _shutil

        # crashed-attempt quarantine files: the dir is rebuilt with the tick
        _shutil.rmtree(
            os.path.join(self.lake_dir, "_quarantine", f"tick-{tick_id:06d}"),
            ignore_errors=True,
        )
        # crashed-attempt changelog parts: keep them iff this redo is the
        # same attempt (a crash between bucket-manifest publications leaves
        # some buckets' feed rows ONLY in those parts — see prepare_tick_dir)
        from .changelog import prepare_tick_dir

        prepare_tick_dir(
            self.lake_dir,
            tick_id,
            segments=[s["seqno"] for s in segs],
            num_buckets=self.num_buckets,
            enabled=self.emit_changelog,
        )

        target = target_schema_for(segs)
        # one block per segment by default; split WITHIN segments (the WAL
        # writes 32k-row groups) only in the degenerate few-large-segments
        # case — finer than ~256k-row blocks multiplies spill-file row-group
        # fragments per bucket and slows the appliers more than the extra
        # read parallelism gains
        import ray as _ray_mod

        cpus = int(_ray_mod.cluster_resources().get("CPU", 8))
        total_rows = sum(s["rows"] for s in segs)
        nb = max(len(segs), min(cpus, total_rows // 262_144))
        if nb >= cpus and nb % cpus:
            # round up to whole scheduling waves: 17 tasks on 8 CPUs is 3
            # waves with a 1-task straggler tail; 24 evenly-sized tasks is 3
            # full waves at ideal utilization. Only when blocks stay coarse —
            # finer than ~200k rows multiplies per-bucket spill row-group
            # fragments and slows the appliers more than it gains.
            cand = ((nb + cpus - 1) // cpus) * cpus
            if total_rows // cand >= 200_000:
                nb = cand
        if os.environ.get("ETL_RAY_STAGE1_BLOCKS"):
            nb = int(os.environ["ETL_RAY_STAGE1_BLOCKS"])  # ops/tuning override
        ds = read_segments_indexed(segs, target, num_blocks=nb)

        if self.shuffle != "spill":
            # spill fuses enrich/reduce/bucket into its stage-1 task
            nb = self.num_buckets
            enrich = self._make_enricher()  # task pool, no actor spin-up
            qdir = os.path.join(self.lake_dir, "_quarantine", f"tick-{tick_id:06d}")

            def enrich_reduce_bucket(batch: pa.Table) -> pa.Table:
                import uuid as _uuid

                from .quality import split_valid

                batch, bad = split_valid(batch)
                if bad.num_rows:
                    os.makedirs(qdir, exist_ok=True)
                    qf = os.path.join(qdir, f"part-{_uuid.uuid4().hex}.parquet")
                    pq.write_table(bad, qf + ".tmp", compression="zstd")
                    os.replace(qf + ".tmp", qf)
                batch = enrich(batch)
                batch = last_writer(batch)  # per-batch combiner (salt cell)
                batch = deltas_to_state_shape(batch)
                return with_bucket(batch, nb)

            ds = ds.map_batches(
                enrich_reduce_bucket, batch_format="pyarrow", zero_copy_batch=True
            )

        schema_ser = target_schema_ser(deltas_schema(target))
        if os.environ.get("ETL_RAY_DEBUG"):
            print(f"[etl-ray] tick setup: {time.perf_counter() - t0:.2f}s", flush=True)
        try:
            applied = self._shuffle_apply(ds, tick_id, schema_ser)
            t_ap = time.perf_counter()
            if applied is None:
                manifests = []
            elif isinstance(applied, list):  # warm-state path: manifest dicts
                manifests = applied
            else:
                manifests = applied.take_all()
                self.last_stats = applied.stats()  # per-stage breakdown
            if os.environ.get("ETL_RAY_DEBUG"):
                print(f"[etl-ray] stage2 apply: {time.perf_counter() - t_ap:.2f}s", flush=True)
        finally:
            dctx.shuffle_strategy = prev_strategy

        # quarantined-row count for the tick manifest (footer metadata only)
        import glob as _glob

        quarantined = 0
        for qf in _glob.glob(
            os.path.join(self.lake_dir, "_quarantine", f"tick-{tick_id:06d}", "*.parquet")
        ):
            quarantined += pq.ParquetFile(qf).metadata.num_rows

        changelog_rows = 0
        if self.emit_changelog:
            from .changelog import changelog_tick_dir

            for cf in _glob.glob(
                os.path.join(changelog_tick_dir(self.lake_dir, tick_id), "*.parquet")
            ):
                changelog_rows += pq.ParquetFile(cf).metadata.num_rows

        # ---- data-quality gate: runs BEFORE anything is published, so a
        # failing mandatory check leaves the previous tick fully
        # authoritative (test.py:39-64 / test_framework.py semantics) ----
        events = sum(s["rows"] for s in segs)
        quality_summary = None
        if self.checks:
            from .quality import DataQualityError, TickContext, run_checks

            ctx = TickContext(
                lineage=self.lineage,
                tick=tick_id,
                events=events,
                segments=segs,
                new_manifests=[dict(m) for m in manifests],
                prev_manifests={
                    m["bucket"]: m for m in self.lineage.all_bucket_manifests()
                },
                prev_tick=last,
                quarantined=quarantined,
            )
            t_q = time.perf_counter()
            qrep = run_checks(self.checks, ctx)
            if qrep.failed_mandatory:
                raise DataQualityError(
                    f"tick {tick_id} aborted before commit; mandatory "
                    f"data-quality checks failed: {qrep.summary()}"
                )
            quality_summary = qrep.summary()
            if os.environ.get("ETL_RAY_DEBUG"):
                print(f"[etl-ray] quality gate: {time.perf_counter() - t_q:.2f}s", flush=True)

        # ---- two-phase commit: publish bucket manifests, then the tick ----
        state_rows = live_rows = 0
        for i, m in enumerate(manifests):
            if self.fail_after_buckets is not None and i >= self.fail_after_buckets:
                raise RuntimeError("injected crash mid-commit (test only)")
            self.lineage.publish_bucket(dict(m))
        for m in self.lineage.all_bucket_manifests():
            state_rows += m["rows"]
            live_rows += m["live_rows"]

        agglog_this_tick = self.aggregate and self.shuffle == "spill"
        if self.aggregate:
            t_ag = time.perf_counter()
            days = aggregates.days_of_segments(segs, self.tz_offset_minutes)
            # the agg log is only complete if EVERY segment-processing tick
            # so far maintained it AND under the same local-day boundary;
            # after a mode switch (sort/hash shuffle, aggregate=False ticks,
            # or a tz-offset change) fall back to the WAL rescan
            log_complete = agglog_this_tick and all(
                t.get("agglog", False)
                and t.get("tz_offset_minutes", 0) == self.tz_offset_minutes
                for t in self.lineage.all_ticks()
                if t.get("segments")
            )
            if log_complete:
                aggregates.recompute_days_from_agglog(self.lineage, days)
            else:
                aggregates.recompute_days(
                    self.wal, self.lineage, days, segs[-1]["seqno"],
                    tz_offset_minutes=self.tz_offset_minutes,
                )
            if os.environ.get("ETL_RAY_DEBUG"):
                print(
                    f"[etl-ray] aggregates ({len(days)} days): "
                    f"{time.perf_counter() - t_ag:.2f}s",
                    flush=True,
                )

        if self.pseudonym_fields:
            # MERGE the tick's distinct PII values into the pseudonym map
            # (mod_load_data_gdpr.sql semantics); idempotent, so a crash
            # between here and the tick publish re-merges harmlessly
            from . import gdpr

            gdpr.update_map_from_segments(
                self.lake_dir, segs, target, self.pseudonym_fields
            )

        prev_hi = last["applied_through_lsn"] if last else 0
        prev_wal = LakeLineage.wal_watermark(last) if last else 0
        self.lineage.publish_tick(
            {
                "tick": tick_id,
                "through_seqno": segs[-1]["seqno"],
                # never regress the watermark (an erasure tick may sit above
                # the log's own max LSN)
                "applied_through_lsn": max(prev_hi, max(s["max_lsn"] for s in segs)),
                # true WAL high-LSN, unaffected by erasure inflation — the
                # compaction/lateness watermark derives from THIS
                "wal_through_lsn": max(prev_wal, max(s["max_lsn"] for s in segs)),
                "segments": [s["seqno"] for s in segs],
                "events": events,
                "buckets_touched": len(manifests),
                "state_rows": state_rows,
                "live_rows": live_rows,
                "num_buckets": self.num_buckets,
                "agglog": agglog_this_tick,
                "quarantined_rows": quarantined,
                "tz_offset_minutes": self.tz_offset_minutes,
                # earliest tick an as-of read can still serve exactly: gc
                # keeps [tick - retain_ticks, tick] plus per-bucket boundary
                # states; monotone (history once dropped never comes back)
                "retained_through_tick": (
                    max(
                        (last or {}).get("retained_through_tick", (last or {}).get("tick", 0)),
                        tick_id - self.retain_ticks,
                    )
                    if self.retain_ticks > 0
                    else tick_id
                ),
                "quality": quality_summary,
                "changelog": self.emit_changelog,
                "changelog_rows": changelog_rows,
                # state bytes written by this tick's appliers (base rewrites
                # + appended deltas + fold tails) — the base+delta win shows
                # up here as bytes/tick dropping from O(bucket) to O(touched)
                "state_bytes_written": int(
                    sum(m.get("bytes_written") or 0 for m in manifests)
                ),
                "state_mode": self.state_mode,
                # enrichment-dim lineage: which dim version(s) tagged this tick
                "dim_version": dim_version,
                "dim_versions": dim_versions or None,
            }
        )
        self.lineage.gc(self.retain_ticks)
        if self.changelog_retain is not None:
            from .changelog import gc_changelog as _gc_cl

            _gc_cl(self.lake_dir, drop_below_tick=tick_id - self.changelog_retain)
        if os.environ.get("ETL_RAY_DEBUG"):
            print(f"[etl-ray] tick total: {time.perf_counter() - t0:.2f}s", flush=True)
        import shutil

        shutil.rmtree(os.path.join(self.lake_dir, "_shuffle"), ignore_errors=True)
        return TickResult(
            tick=tick_id,
            segments=len(segs),
            events=events,
            buckets_touched=len(manifests),
            state_rows=state_rows,
            live_rows=live_rows,
            seconds=time.perf_counter() - t0,
        )

    def replay_all(self, *, segments_per_tick: int | None = None) -> list[TickResult]:
        out = []
        started = time.monotonic()
        while True:
            r = self.tick(segments_per_tick)
            if r is None:
                break
            out.append(r)
            # budget checked BETWEEN ticks: the first tick always runs (a
            # run does at least one unit of work, like the reference's
            # deadline sensor failing an in-flight run, deadline.py:29-38)
            self._check_deadline(started, len(out))
        return out

    def follow(
        self,
        *,
        poll_interval_s: float = 1.0,
        idle_timeout_s: float = 10.0,
        max_ticks: int | None = None,
        segments_per_tick: int | None = None,
    ) -> list[TickResult]:
        """Live-tail mode: keep ticking as the WAL's segment manifest grows
        (the reference's sensor-poll loop, ``event_partition.py:41-66`` —
        here the WAL manifest is the sealer, see ``watermark`` for the
        sealing policy itself). Reloads the manifest each poll; returns
        once no new sealed segment arrives within ``idle_timeout_s`` (the
        force-close analog) or after ``max_ticks``."""
        from .lock import WriterLockError

        results: list[TickResult] = []
        started = time.monotonic()
        idle_since = started
        while True:
            self.wal = WalInfo.load(self.wal.wal_dir)  # new sealed segments?
            try:
                r = self.tick(segments_per_tick)
            except WriterLockError:
                # a maintenance op (erase/compact/rebucket) holds the lake —
                # that's interleaving, not failure: retry next poll. The
                # idle clock keeps running so a PERMANENTLY held lock still
                # ends the tail at idle_timeout instead of spinning forever.
                if time.monotonic() - idle_since >= idle_timeout_s:
                    break
                time.sleep(poll_interval_s)
                continue
            if r is not None:
                results.append(r)
                idle_since = time.monotonic()
                if max_ticks is not None and len(results) >= max_ticks:
                    break
                # budget checked between ticks (first tick always runs) —
                # a pathological backlog can't tail past the run's SLA
                self._check_deadline(started, len(results))
            else:
                if time.monotonic() - idle_since >= idle_timeout_s:
                    break
                time.sleep(poll_interval_s)
        return results


def deltas_schema(envelope: pa.Schema) -> pa.Schema:
    """Schema of delta rows after op→tombstone shaping (what appliers see)."""
    fields = [f for f in envelope if f.name != "op"]
    fields.append(pa.field("deleted", pa.bool_()))
    return pa.schema(fields)


def target_schema_ser(schema: pa.Schema) -> bytes:
    return schema.serialize().to_pybytes()
