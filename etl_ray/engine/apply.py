"""The merge applier: per-bucket stateful last-writer-wins upsert.

This is the engine's heart — the analog of the reference's daily state fold
(yesterday's ``user_history`` LEFT JOIN today's deltas, then delete+insert of
the partition, ``insert_user_history.sql:227-311``) and the keyed MERGE
upsert (``update_user_map.sql:208-269``) — re-expressed as a callable class
run by ``groupby(bucket).map_groups(MergeApplier, concurrency=N)``:

- one *group* = all (already batch-pre-reduced) delta rows of one hash
  bucket; state for the bucket is hydrated from the lake partition named by
  the bucket's lineage manifest (never shuffled — state stays partitioned on
  the same key across ticks, SURVEY.md §4);
- merge = Arrow concat(state, deltas) → ``last_writer`` per (repo, path) by
  LSN — replay duplicates and already-applied events are no-ops by
  monotonicity (``mod_data_insert.sql:5-6`` semantics);
- deletes become tombstones (``deleted=true``, payload null) so a late
  out-of-order update with a lower LSN than an applied delete cannot
  resurrect the row; tombstones are filtered at export and can be GC'd below
  the global low-watermark minus allowed lateness;
- additive schema evolution: state and deltas are both promoted to the
  unified schema with null backfill before the merge
  (``insert_user_history.sql:15-42`` semantics);
- output: the new full bucket state written via tmp + atomic rename
  (two-phase commit step 1), and a 1-row manifest table returned to the
  driver for the commit step.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .dedup import KEYS, last_writer
from .lineage import LakeLineage
from .partitioning import BUCKET_COL
from .schema_evo import align_to, unify_schemas

DELETED_COL = "deleted"

MANIFEST_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("tick", pa.int32()),
        ("applied_lsn", pa.int64()),
        ("rows", pa.int64()),
        ("live_rows", pa.int64()),
        ("delta_rows", pa.int64()),
        ("data_file", pa.string()),
        ("delta_files", pa.list_(pa.string())),  # base+delta layout (delta mode)
        ("bytes_written", pa.int64()),  # state+delta+fold bytes this apply
        ("fold_file", pa.string()),  # LSN-tail sidecar when folds are active
        ("fold_through_lsn", pa.int64()),  # max WAL lsn folded (fold horizon)
        # unified bucket schema (base64 IPC): downstream driver sweeps
        # (view refresh, export schema discovery) read it from the manifest
        # instead of one parquet footer per chain file per refresh
        ("schema_b64", pa.string()),
    ]
)


def schema_b64(schema: pa.Schema) -> str:
    import base64

    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def schema_from_b64(payload: str) -> pa.Schema:
    import base64

    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(payload)))


def bucket_schemas(manifests: list[dict]) -> list[pa.Schema]:
    """Inputs for a unified-schema sweep over bucket manifests: the schema
    each applier embedded in its manifest when present (no file IO), else
    one parquet footer read per chain file (bootstrap/rebucket/as-of/legacy
    manifests)."""
    out: list[pa.Schema] = []
    for m in manifests:
        if m.get("schema_b64"):
            out.append(schema_from_b64(m["schema_b64"]))
        else:
            out.extend(pq.read_schema(f) for f in bucket_files(m))
    return out


def fold_tail_path(state_path: str) -> str:
    return state_path[: -len(".parquet")] + ".fold.parquet"


def bucket_files(man: dict) -> list[str]:
    """A bucket's content files in fold order: base, then deltas oldest
    first (delta-mode lakes; a rewrite-mode manifest has just the base)."""
    return [man["data_file"], *(man.get("delta_files") or [])]


def chain_cache_path(files: list[str]) -> str:
    """The fold-cache file for one exact delta chain: keyed by the chain's
    file list + sizes, so ANY chain change (appended delta, compaction,
    erase rewrite) keys a different path and the stale cache is simply
    never read again (``LakeLineage.gc`` sweeps it)."""
    import hashlib

    h = hashlib.sha256()
    for f in files:
        h.update(f.encode())
        h.update(b"\0")
        h.update(str(os.path.getsize(f)).encode())
        h.update(b"\0")
    return os.path.join(
        os.path.dirname(files[0]), f"foldcache-{h.hexdigest()[:16]}.parquet"
    )


def _current_chain(man: dict) -> tuple | None:
    """The bucket's chain per its CURRENT committed manifest, re-read from
    disk (cache-publish revalidation). None if unreadable/absent.

    The manifest path/read goes through ``LakeLineage`` (the one owner of
    the lake layout) so a layout change cannot silently desync this
    revalidation from the publisher; only the lake root is derived from
    ``data_file`` (``<lake>/buckets/b=NNNNN/<file>``), the manifest's sole
    path fact."""
    bucket_dir = os.path.dirname(man["data_file"])
    lake_dir = os.path.dirname(os.path.dirname(bucket_dir))
    try:
        cur = LakeLineage(lake_dir).bucket_manifest(int(man["bucket"]))
    except (OSError, ValueError):
        return None
    if cur is None:
        return None
    return tuple(bucket_files(cur))


def read_bucket_state(
    man: dict, columns: list[str] | None = None, *, publish_cache: bool = False
) -> pa.Table:
    """Merge-on-read of one bucket: base state + appended tick deltas,
    folded with the engine's own LWW kernel (later delta files win ties by
    physical order — the list is tick-ordered). The single-file fast path
    costs exactly what the old direct read did.

    Bounded read amplification: with ``publish_cache`` (the export path —
    NOT applier hydration, whose chain advances the same tick and would
    make the cache instant garbage), a full fold of a multi-file chain is
    cached next to the base, keyed by the exact chain tuple — export pays
    the fold once and every later reader of the SAME chain (verify, audit,
    view refresh) reads one file. Any reader consumes a present cache;
    regenerating is always safe (pure function of immutable chain files).
    After writing, the cache is re-validated against the bucket's CURRENT
    committed manifest and self-deleted on mismatch — a reader racing a
    maintenance rewrite (GDPR erase!) must not republish rows the
    maintenance op just scrubbed.

    ``columns``: projection applied AFTER the fold (keys + lsn are read
    regardless — the fold needs them); missing columns come back null."""
    files = bucket_files(man)
    need = None
    if columns is not None:
        need = list(dict.fromkeys([*KEYS, "lsn", *columns]))
    if len(files) == 1:
        pf = pq.ParquetFile(files[0])
        cols = [c for c in need if c in pf.schema_arrow.names] if need else None
        t = pf.read(columns=cols)
        pf.close()
    else:
        cpath = chain_cache_path(files)
        t = None
        if os.path.exists(cpath):
            try:
                pf = pq.ParquetFile(cpath)
                cols = (
                    [c for c in need if c in pf.schema_arrow.names]
                    if need
                    else None
                )
                t = pf.read(columns=cols)
                pf.close()
            except (OSError, pa.ArrowInvalid):
                t = None  # raced a GC / torn file: fold from the chain
        if t is None:
            tabs = []
            for f in files:
                pf = pq.ParquetFile(f)
                cols = [c for c in need if c in pf.schema_arrow.names] if need else None
                tabs.append(pf.read(columns=cols))
                pf.close()
            uni = unify_schemas([t.schema for t in tabs])
            t = pa.concat_tables([align_to(x, uni).select(uni.names) for x in tabs])
            t = last_writer(t, keys=KEYS).sort_by([(k, "ascending") for k in KEYS])
            if publish_cache and columns is None:
                # full fold: publish the cache (atomic; idempotent — the
                # fold is deterministic, concurrent writers agree), then
                # re-check the COMMITTED manifest: if the chain moved while
                # we folded (erase/compact/next tick), delete our write —
                # either our check sees the new manifest, or the op's
                # trailing gc runs after its manifest publish and sweeps us
                tmp = cpath + f".{os.getpid()}.tmp"
                try:
                    pq.write_table(t, tmp, compression="zstd")
                    os.replace(tmp, cpath)
                    if _current_chain(man) != tuple(files):
                        os.remove(cpath)
                except OSError:
                    pass  # cache is an optimization, never a failure
    if columns is not None:
        out = {}
        for c in columns:
            out[c] = (
                t[c] if c in t.schema.names else pa.nulls(t.num_rows, pa.int64())
            )
        t = pa.table(out)
    return t


def apply_folds(
    folds: list,
    prev_state: pa.Table | None,
    merged: pa.Table,
    fold_rows: pa.Table,
    prev_tail: pa.Table | None,
    prune_horizon: int,
    lateness: int,
) -> tuple[pa.Table, pa.Table]:
    """Fold the tick's narrow delta events into per-key metric columns on
    the merged state (see ``folds.FoldSpec``). Exact-once folding: replay
    duplicates dedupe by LSN within the tick, and across ticks via the
    bucket's persisted tail of recently-folded LSNs — an incoming LSN
    either hits the tail (already folded) or is genuinely new.

    ``prune_horizon`` MUST be the bucket's previous COMMITTED watermark
    (minus nothing — lateness is subtracted here): every LSN this tick can
    legitimately receive is above ``committed_hi − lateness`` (bounded
    out-of-order), and a crashed-tick RE-RUN re-delivers exactly this
    tick's LSNs — all above that horizon too — so keeping the tail down to
    it makes re-application a fold no-op (the crash-idempotence the data
    path gets from LWW monotonicity). Pruning against the tick's own new
    high watermark instead would drop this tick's lower LSNs and
    double-count them on a mid-commit crash re-run.

    Returns (merged with fold columns, new tail table)."""
    import pandas as pd

    from .folds import KEY

    raw = fold_rows.to_pandas()
    fr = raw.drop_duplicates("lsn")
    if prev_tail is not None and prev_tail.num_rows:
        tail_set = prev_tail["lsn"].to_numpy()
        fr = fr[~fr["lsn"].isin(tail_set)]
    fr = fr.sort_values("lsn", kind="mergesort").reset_index(drop=True)

    all_cols = [(c, t) for f in folds for c, t in f.state_cols]
    col_names = [c for c, _ in all_cols]

    touched = pd.MultiIndex.from_frame(fr[KEY].drop_duplicates())
    # keys whose ONLY delta rows were tail-dropped duplicates still had a
    # delta applied on the data path (an LWW no-op whose winner row carries
    # null fold columns) — they must be restored from prev state below
    touched_all = pd.MultiIndex.from_frame(raw[KEY].drop_duplicates())
    if prev_state is not None and all(
        c in prev_state.schema.names for c in col_names
    ):
        prev_all = (
            prev_state.select(KEY + col_names).to_pandas().set_index(KEY)
        )
    else:
        prev_all = pd.DataFrame(columns=col_names)
        prev_all.index = pd.MultiIndex.from_arrays([[], []], names=KEY)
    prev_touched = prev_all.reindex(touched)

    new_frames = []
    if len(fr):
        for spec in folds:
            new_frames.append(spec.fold(prev_touched[spec.col_names], fr))
    new_vals = (
        pd.concat(new_frames, axis=1)
        if new_frames
        else pd.DataFrame(columns=col_names)
    )
    new_vals = new_vals.reindex(touched_all)
    prev_for_all = prev_all.reindex(touched_all)
    new_vals = new_vals.where(new_vals.notna(), prev_for_all)

    # attach: touched keys get the new values, untouched keep their state
    # values (already riding the winner rows); new keys with no fold rows
    # cannot exist (every delta row has a fold row)
    mkeys = pd.MultiIndex.from_arrays(
        [merged[k].to_pandas() for k in KEY], names=KEY
    )
    for cname, ctype in all_cols:
        upd = new_vals[cname].reindex(mkeys) if len(new_vals) else pd.Series(
            np.nan, index=mkeys
        )
        if cname in merged.schema.names:
            cur = merged[cname].to_pandas()
            cur.index = upd.index
            out = upd.where(upd.notna(), cur)
            merged = merged.set_column(
                merged.schema.get_field_index(cname),
                cname,
                pa.Array.from_pandas(out, type=ctype),
            )
        else:
            merged = merged.append_column(
                cname, pa.Array.from_pandas(upd, type=ctype)
            )

    # new tail: every folded LSN still deliverable (or re-deliverable by a
    # crashed-tick re-run) — see the prune_horizon contract above
    lo = prune_horizon - lateness
    lsns = fr["lsn"].to_numpy()
    keep = lsns[lsns > lo]
    if prev_tail is not None and prev_tail.num_rows:
        old = prev_tail["lsn"].to_numpy()
        keep = np.concatenate([keep, old[old > lo]])
    tail = pa.table({"lsn": pa.array(np.unique(keep), pa.int64())})
    return merged, tail


def plan_state_write(
    lineage, bucket: int, tick: int, man: dict | None,
    state_mode: str, delta_threshold: int,
) -> tuple[bool, str, str, list[str]]:
    """Decide base-vs-delta for one bucket write, crash-redo aware.

    Returns ``(write_delta, out_path, data_file, delta_files)``. A redo of
    an ALREADY-PUBLISHED bucket (manifest tick == this tick — the crash
    landed between this bucket's manifest publish and the tick manifest)
    reproduces its prior outcome in place instead of growing the chain:
    re-appending would fold the same delta twice on every read and count
    double against the threshold."""
    prev_deltas = list((man or {}).get("delta_files") or [])
    delta_path = lineage.bucket_delta_path(bucket, tick)
    if man is not None and man.get("tick") == tick:
        if delta_path in prev_deltas:
            return True, delta_path, man["data_file"], prev_deltas
        base = lineage.bucket_state_path(bucket, tick)
        return False, base, base, []
    if (
        state_mode == "delta"
        and man is not None
        and len(prev_deltas) < delta_threshold
    ):
        return True, delta_path, man["data_file"], prev_deltas + [delta_path]
    base = lineage.bucket_state_path(bucket, tick)
    return False, base, base, []


def touched_key_rows(merged: pa.Table, deltas: pa.Table) -> pa.Table:
    """This tick's winner rows for TOUCHED keys only (fold columns riding
    along) — the point of a delta write: O(touched), not O(bucket). A late
    already-applied key re-emits its (identical) current winner, which
    merge-on-read resolves by tie-break."""
    dk = pc.unique(
        pc.binary_join_element_wise(deltas["repo"], deltas["path"], "\x1f")
    )
    mk = pc.binary_join_element_wise(merged["repo"], merged["path"], "\x1f")
    return merged.filter(pc.is_in(mk, value_set=dk))


def deltas_to_state_shape(deltas: pa.Table) -> pa.Table:
    """CDC envelope → state-row shape: op → deleted flag, drop op."""
    deleted = pc.equal(deltas["op"], "delete")
    out = deltas.drop_columns(["op"])
    return out.append_column(DELETED_COL, deleted)


class MergeApplier:
    def __init__(
        self,
        lake_dir: str,
        tick: int,
        schema_ser: bytes,
        folds: list | None = None,
        fold_lateness: int = 0,
        changelog: bool = False,
        state_mode: str = "rewrite",  # "rewrite" | "delta" (base+delta)
        delta_threshold: int = 8,  # deltas folded into a new base beyond this
    ):
        # once per actor: lineage handles + deserialized target schema
        self.lineage = LakeLineage(lake_dir)
        self.tick = tick
        self.target = pa.ipc.read_schema(pa.BufferReader(schema_ser))
        self.folds = folds or []
        self.fold_lateness = fold_lateness
        self.changelog = changelog
        self.state_mode = state_mode
        self.delta_threshold = delta_threshold

    def _read_rgs(self, files, rgs) -> pa.Table | None:
        if not hasattr(self, "_pf_cache"):
            self._pf_cache: dict[str, pq.ParquetFile] = {}
        parts = []
        for f, rg in zip(files, rgs):
            pf = self._pf_cache.get(f)
            if pf is None:
                pf = self._pf_cache[f] = pq.ParquetFile(f)
            parts.append(pf.read_row_group(rg))
        return pa.concat_tables(parts) if parts else None

    def apply_spilled(self, batch: pa.Table) -> pa.Table:
        """Spill-shuffle mode: input rows are (bucket, files, rgs[, ffiles,
        frgs]) descriptors; each bucket's pre-reduced deltas (and, when
        folds are active, its unreduced narrow fold rows) are read as
        parquet ROW GROUPS out of the shared shuffle files (content bytes
        never enter the object store). File handles are cached on the
        actor."""
        outs = [MANIFEST_SCHEMA.empty_table()]
        has_folds = "ffiles" in batch.schema.names and self.folds
        for i, bucket in enumerate(batch["bucket"].to_pylist()):
            files = batch["files"][i].as_py()
            rgs = batch["rgs"][i].as_py()
            deltas = self._read_rgs(files, rgs)
            deltas = align_to(deltas, self.target)
            fold_rows = None
            if has_folds:
                fold_rows = self._read_rgs(
                    batch["ffiles"][i].as_py(), batch["frgs"][i].as_py()
                )
            outs.append(
                self._apply_one(
                    int(bucket), deltas, pre_aligned=True, fold_rows=fold_rows
                )
            )
        return pa.concat_tables(outs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Accepts a batch holding one or more COMPLETE buckets (a sort-based
        groupby group, or a hash-shuffle partition block): splits by bucket
        and merges each independently."""
        if batch.num_rows == 0:
            return MANIFEST_SCHEMA.empty_table()
        buckets = pc.unique(batch[BUCKET_COL])
        if len(buckets) == 1:
            return self._apply_one(buckets[0].as_py(), batch)
        outs = []
        for b in sorted(buckets.to_pylist()):
            part = batch.filter(pc.equal(batch[BUCKET_COL], b))
            outs.append(self._apply_one(b, part))
        return pa.concat_tables(outs)

    def _apply_one(
        self,
        bucket: int,
        group: pa.Table,
        pre_aligned: bool = False,
        fold_rows: pa.Table | None = None,
    ) -> pa.Table:
        if pre_aligned:
            deltas = group
        else:
            deltas = align_to(group.drop_columns([BUCKET_COL]), self.target)

        man = self.lineage.bucket_manifest(bucket)
        state = None
        if man is not None:
            state = read_bucket_state(man)  # merge-on-read in delta mode
            merged_schema = unify_schemas([state.schema, deltas.schema])
            state_al = align_to(state, merged_schema)
            deltas = align_to(deltas, merged_schema)
            # state first, deltas after → exact-LSN replay ties resolve to the
            # (identical) delta row; deterministic either way.
            merged = pa.concat_tables([state_al, deltas])
        else:
            merged = deltas
        merged = last_writer(merged, keys=KEYS)
        merged = merged.sort_by([(k, "ascending") for k in KEYS])

        if self.changelog:
            # CDC-out: the rows whose winning LSN changed this tick, vs the
            # previous COMMITTED state (deterministic on crash redo)
            from .changelog import changelog_delta, write_changelog_part

            write_changelog_part(
                self.lineage.lake_dir,
                self.tick,
                bucket,
                changelog_delta(state, merged),
            )

        # base+delta (S3 semantics kept, write amplification dropped): an
        # existing bucket appends ONE file of this tick's touched-key winner
        # rows; readers fold base+deltas with the same LWW kernel. Past the
        # threshold (or in rewrite mode / first write) the fold lands as a
        # fresh base and the delta chain resets.
        write_delta, out_path, data_file, delta_files = plan_state_write(
            self.lineage, bucket, self.tick, man,
            self.state_mode, self.delta_threshold,
        )

        fold_file = None
        fold_hi = (man or {}).get("fold_through_lsn") or 0
        if self.folds and fold_rows is not None:
            prev_tail = None
            if man is not None and man.get("fold_file"):
                prev_tail = pq.read_table(man["fold_file"])
            # the prune horizon is the FOLD stream's own committed watermark
            # (max WAL lsn folded) — NOT applied_lsn, which an erasure tick
            # inflates far past the WAL and would over-prune the tail
            merged, tail = apply_folds(
                self.folds, state, merged, fold_rows, prev_tail,
                fold_hi, self.fold_lateness,
            )
            if fold_rows.num_rows:
                fold_hi = max(fold_hi, pc.max(fold_rows["lsn"]).as_py())
            fold_file = fold_tail_path(out_path)
            ftmp = fold_file + f".{os.getpid()}.tmp"
            pq.write_table(tail, ftmp, compression="snappy")
            os.replace(ftmp, fold_file)

        out_tab = touched_key_rows(merged, deltas) if write_delta else merged

        tmp = out_path + f".{os.getpid()}.tmp"
        pq.write_table(out_tab, tmp, compression="zstd")
        os.replace(tmp, out_path)
        bytes_written = os.path.getsize(out_path)
        if fold_file:
            bytes_written += os.path.getsize(fold_file)

        live = merged.num_rows - pc.sum(merged[DELETED_COL]).as_py()
        return pa.table(
            {
                "bucket": pa.array([bucket], pa.int32()),
                "tick": pa.array([self.tick], pa.int32()),
                "applied_lsn": pa.array([pc.max(merged["lsn"]).as_py()], pa.int64()),
                "rows": pa.array([merged.num_rows], pa.int64()),
                "live_rows": pa.array([live], pa.int64()),
                "delta_rows": pa.array([group.num_rows], pa.int64()),
                "data_file": pa.array([data_file], pa.string()),
                "delta_files": pa.array([delta_files], pa.list_(pa.string())),
                "bytes_written": pa.array([bytes_written], pa.int64()),
                "fold_file": pa.array([fold_file], pa.string()),
                "fold_through_lsn": pa.array([fold_hi], pa.int64()),
                "schema_b64": pa.array([schema_b64(merged.schema)], pa.string()),
            }
        )

class SpilledMergeApplier(MergeApplier):
    """map_batches entry point for the spill-shuffle path: input rows are
    (bucket, files) descriptors, not data rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        return self.apply_spilled(batch)


import ray as _ray


@_ray.remote(num_cpus=1)
class WarmApplierActor:
    """Persistent merge applier holding its buckets' state ACROSS ticks.

    Ray Data actor pools die with their pipeline, so cross-tick warm state —
    the reference's "state table stays put, deltas come to it" shape
    (``insert_user_history.sql:293-299``; SURVEY §7.4 hard part "state
    hydration cost vs streaming") — is the one place this engine drops to a
    raw Ray actor. Buckets are assigned statically (bucket % pool) so a
    bucket always lands on the same actor; on a cache miss (first tick,
    actor restart, eviction) state is lazily hydrated from the bucket's
    committed manifest file, which also makes the actor crash-safe.

    Durability is unchanged: every apply still writes the bucket state file
    and the driver still publishes manifests — the cache only removes the
    per-tick parquet read+decode of unchanged state.
    """

    def __init__(
        self,
        lake_dir: str,
        max_cached: int = 256,
        folds: list | None = None,
        fold_lateness: int = 0,
        changelog: bool = False,
        state_mode: str = "rewrite",
        delta_threshold: int = 8,
    ):
        self.changelog = changelog
        self.lineage = LakeLineage(lake_dir)
        # bucket → (content-file tuple the cache corresponds to, state table)
        self.cache: dict[int, tuple[tuple, pa.Table]] = {}
        self.max_cached = max_cached
        self._pf_cache: dict[str, pq.ParquetFile] = {}
        self._pf_tick = -1
        self.folds = folds or []
        self.fold_lateness = fold_lateness
        self.state_mode = state_mode
        self.delta_threshold = delta_threshold

    def _read_rgs(self, files, rgs) -> pa.Table | None:
        parts = []
        for f, rg in zip(files, rgs):
            pf = self._pf_cache.get(f)
            if pf is None:
                pf = self._pf_cache[f] = pq.ParquetFile(f)
            parts.append(pf.read_row_group(rg))
        return pa.concat_tables(parts) if parts else None

    def apply(self, bucket: int, files: list[str], rgs: list[int], tick: int,
              schema_ser: bytes, ffiles: list[str] | None = None,
              frgs: list[int] | None = None) -> dict:
        target = pa.ipc.read_schema(pa.BufferReader(schema_ser))
        if tick != self._pf_tick:  # shuffle files are per tick
            self._pf_cache = {}
            self._pf_tick = tick
        deltas = align_to(self._read_rgs(files, rgs), target)
        fold_rows = None
        if self.folds and ffiles:
            fold_rows = self._read_rgs(ffiles, frgs)

        # validate the cache against the COMMITTED manifest: out-of-band
        # maintenance (erase_keys, compact_tombstones) or another writer
        # changes data_file, which invalidates us automatically
        man = self.lineage.bucket_manifest(bucket)
        state = None
        cached = self.cache.get(bucket)
        if man is not None:
            if cached is not None and cached[0] == tuple(bucket_files(man)):
                state = cached[1]
            else:
                state = read_bucket_state(man)
        if state is not None:
            merged_schema = unify_schemas([state.schema, deltas.schema])
            merged = pa.concat_tables(
                [align_to(state, merged_schema), align_to(deltas, merged_schema)]
            )
        else:
            merged = deltas
        merged = last_writer(merged, keys=KEYS)
        merged = merged.sort_by([(k, "ascending") for k in KEYS])

        if self.changelog:
            from .changelog import changelog_delta, write_changelog_part

            write_changelog_part(
                self.lineage.lake_dir, tick, bucket, changelog_delta(state, merged)
            )

        write_delta, out_path, data_file, delta_files = plan_state_write(
            self.lineage, bucket, tick, man,
            self.state_mode, self.delta_threshold,
        )

        fold_file = None
        fold_hi = (man or {}).get("fold_through_lsn") or 0
        if self.folds and fold_rows is not None:
            prev_tail = None
            if man is not None and man.get("fold_file"):
                prev_tail = pq.read_table(man["fold_file"])
            # fold-stream watermark, not applied_lsn (see MergeApplier)
            merged, tail = apply_folds(
                self.folds, state, merged, fold_rows, prev_tail,
                fold_hi, self.fold_lateness,
            )
            if fold_rows.num_rows:
                fold_hi = max(fold_hi, pc.max(fold_rows["lsn"]).as_py())
            fold_file = fold_tail_path(out_path)
            ftmp = fold_file + f".{os.getpid()}.tmp"
            pq.write_table(tail, ftmp, compression="snappy")
            os.replace(ftmp, fold_file)

        out_tab = touched_key_rows(merged, deltas) if write_delta else merged

        tmp = out_path + f".{os.getpid()}.tmp"
        pq.write_table(out_tab, tmp, compression="zstd")
        os.replace(tmp, out_path)
        bytes_written = os.path.getsize(out_path)
        if fold_file:
            bytes_written += os.path.getsize(fold_file)

        if len(self.cache) >= self.max_cached and bucket not in self.cache:
            self.cache.pop(next(iter(self.cache)))  # FIFO evict
        self.cache[bucket] = (tuple([data_file, *delta_files]), merged)

        live = merged.num_rows - pc.sum(merged[DELETED_COL]).as_py()
        return {
            "bucket": int(bucket),
            "tick": int(tick),
            "applied_lsn": int(pc.max(merged["lsn"]).as_py()),
            "rows": int(merged.num_rows),
            "live_rows": int(live),
            "delta_rows": int(deltas.num_rows),
            "data_file": data_file,
            "delta_files": delta_files,
            "bytes_written": int(bytes_written),
            "fold_file": fold_file,
            "fold_through_lsn": int(fold_hi),
            "schema_b64": schema_b64(merged.schema),
        }
