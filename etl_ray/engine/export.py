"""Final-state export: the live lake table as a Dataset, plus content sha256.

The per-row ``content`` sha256 is the correctness invariant (BASELINE.json);
the hashing stage is the direct descendant of the reference's pseudonymizer
(``mod_load_data_gdpr.sql:39,52``: ``TO_BASE64(SHA256(CAST(col AS STRING)))``
per configured column) — a stateless ``map_batches`` over Arrow batches.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .apply import DELETED_COL
from .lineage import LakeLineage
from .schema_evo import align_to, unify_schemas


def sha256_column(col: pa.ChunkedArray | pa.Array, *, out_name: str = "content_sha256") -> pa.Array:
    """Hex sha256 per row; null in → null out. Tight loop over Arrow buffers
    (no vectorized sha exists in numpy/pyarrow; hashlib's C core per row)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out: list[str | None] = []
    sha = hashlib.sha256
    for v in col:
        buf = v.as_buffer() if v.is_valid else None
        out.append(sha(buf).hexdigest() if buf is not None else None)
    return pa.array(out, pa.string())


def add_content_sha(batch: pa.Table) -> pa.Table:
    return batch.append_column("content_sha256", sha256_column(batch["content"]))


def _as_of_manifests(lineage: LakeLineage, as_of_tick: int) -> list[dict]:
    """Per bucket, a pseudo-manifest describing its exact content as of
    ``as_of_tick``: the newest committed BASE state with tick <= as_of_tick
    plus, in a delta-mode lake, the delta files in (base_tick, as_of_tick]
    (folded by the same merge-on-read LWW as live reads). Requires the lake
    to have been replayed with ``retain_ticks`` covering the point (see
    ``LakeLineage.gc``). Buckets whose first write postdates ``as_of_tick``
    are (correctly) absent. A ``rebucket`` rewrites the whole key space
    under new bucket ids and resets time-travel history — as-of reads are
    valid only back to the latest rebucket."""
    import glob
    import re

    last = lineage.last_tick()
    if last is None:
        raise FileNotFoundError(f"no committed ticks under {lineage.lake_dir}")
    if as_of_tick > last["tick"]:
        raise ValueError(f"as_of_tick {as_of_tick} is in the future (last: {last['tick']})")
    retained = last.get("retained_through_tick", last["tick"])
    if as_of_tick < retained:
        raise ValueError(
            f"as_of_tick {as_of_tick} predates retained history "
            f"(earliest exact point: {retained}; replay with retain_ticks, "
            "and note that maintenance ops — erase/compact/rebucket — purge "
            "history, erasure deliberately so: retained states would keep "
            "the erased subject's rows)"
        )
    out = []
    for bdir in sorted(glob.glob(os.path.join(lineage.buckets_dir, "b=*"))):
        bases, deltas = [], []
        for f in glob.glob(os.path.join(bdir, "state-t*.parquet")):
            if f.endswith(".fold.parquet"):
                continue
            if f.endswith(".delta.parquet"):
                m = re.search(r"state-t(\d+)\.delta\.parquet$", f)
                if m:
                    deltas.append((int(m.group(1)), f))
            else:
                m = re.search(r"state-t(\d+)\.parquet$", f)
                if m and int(m.group(1)) <= as_of_tick:
                    bases.append((int(m.group(1)), f))
        if not bases:
            continue
        base_tick, base = max(bases)
        chain = [
            f for t, f in sorted(deltas) if base_tick < t <= as_of_tick
        ]
        out.append({"data_file": base, "delta_files": chain})
    return out


def final_state(
    lake_dir: str,
    *,
    with_sha: bool = False,
    include_tombstones: bool = False,
    as_of_tick: int | None = None,
) -> ray.data.Dataset:
    """Dataset over the current committed lake state (manifest-listed files
    only — uncommitted staging files are invisible, per the 2-phase commit).
    ``as_of_tick`` time-travels to a past commit point (requires the lake to
    have been replayed with ``retain_ticks`` covering it)."""
    lineage = LakeLineage(lake_dir)
    manifests = lineage.all_bucket_manifests()
    if as_of_tick is not None:
        manifests = _as_of_manifests(lineage, as_of_tick)
    files = [m["data_file"] for m in manifests]
    delta_mode = any(m.get("delta_files") for m in manifests)
    if not files:
        raise FileNotFoundError(f"no committed bucket manifests under {lake_dir}")

    # schema evolution: old buckets may predate new columns — unify + align.
    # Schemas come from the bucket manifests (embedded by the appliers) when
    # available; legacy/maintenance manifests fall back to footer reads.
    from .apply import bucket_schemas

    target = unify_schemas(bucket_schemas(manifests))
    if delta_mode:
        # base+delta lake: one task per bucket does the merge-on-read fold
        # (same parallelism as the appliers — the engine's own shuffle grain)
        from .apply import read_bucket_state

        # live exports publish the per-chain fold cache (later readers of
        # the same chain reuse it); as-of chains differ from the live
        # manifest and would be self-invalidated immediately — skip
        publish = as_of_tick is None

        def fold_bucket(batch: pa.Table) -> pa.Table:
            outs = [
                align_to(read_bucket_state(m, publish_cache=publish), target)
                for m in batch.to_pylist()
            ]
            return pa.concat_tables(o.select(target.names) for o in outs)

        ds = ray.data.from_items(
            manifests, override_num_blocks=len(manifests)
        ).map_batches(fold_bucket, batch_format="pyarrow", batch_size=None)
    else:
        # partitioning=None: the bucket layout (buckets/b=00017/...) must NOT
        # be hive-inferred into a phantom `b` partition column on every export
        ds = ray.data.read_parquet(files, partitioning=None)
        ds = ds.map_batches(
            lambda t: align_to(t, target), batch_format="pyarrow", zero_copy_batch=True
        )
    if not include_tombstones:
        ds = ds.map_batches(
            lambda t: t.filter(pc.equal(t[DELETED_COL], False)).drop_columns([DELETED_COL]),
            batch_format="pyarrow",
        )
    if with_sha:
        ds = ds.map_batches(add_content_sha, batch_format="pyarrow", zero_copy_batch=True)
    return ds
