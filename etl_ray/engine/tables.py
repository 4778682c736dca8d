"""Multi-table lakes: a TableSpec registry driving N logical tables.

The reference's unit of deployment is N apps × M event types generated from
config — per-app DAGs are stamped out of ``app_config`` entries
(``etl/dags/user_history/user_history/dag.py:41-48``,
``lib/app_config/app_config.py:95-103,209-221``, per-app wiring at
``DAG_user_history.py:151-154``). The engine-side equivalent: one lake holds
N co-resident logical tables under ``lake/tables/<name>/``, each a full
single-table lake (own buckets, manifests, ticks, aggregates, feed) with its
own :class:`TableSpec` (WAL source, bucket count, tz offset, folds, checks,
pseudonym fields), all driven through ONE replay loop. Ticks commit
per-table: a crash that lands table A's tick but not table B's leaves A
committed and B at its previous tick, and the re-run no-ops A (watermark)
while completing B — cross-table exactly-once by per-table idempotence.

Derived VIEW tables are maintained incrementally from an upstream table's
bucket-level lineage (the reference's aggregation-table cascade,
``DAG_external_source.py:132-224``, re-expressed at bucket grain): a
two-level aggregate where per-bucket partials are recomputed ONLY for
buckets whose manifest tick advanced since the view's last refresh, and the
final rows are a small reduce over partial rows at read time. Partial grain
is (bucket × repo) — bounded by aggregate grain, not event count — so a
refresh touches O(changed buckets) state files and the read shuffles only
aggregate-grain rows.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field

VIEW_KINDS = ("repo_stats",)


@dataclass
class TableSpec:
    """One logical table of a multi-table lake.

    Base tables (``wal_dir`` set) replay their own WAL through a full
    :class:`~etl_ray.engine.replay.ReplayEngine`. View tables (``view`` +
    ``source`` set) are derived incrementally from another table's state.
    """

    name: str
    wal_dir: str | None = None
    num_buckets: int = 32
    concurrency: int | tuple[int, int] | None = None
    tz_offset_minutes: int = 0
    aggregate: bool = True
    folds: list = field(default_factory=list)
    checks: list | None = None
    pseudonym_fields: list[str] = field(default_factory=list)
    emit_changelog: bool = False
    retain_ticks: int = 0
    shuffle: str = "spill"
    view: str | None = None  # derived-view kind, see VIEW_KINDS
    source: str | None = None  # upstream table name (views only)

    @property
    def is_view(self) -> bool:
        return self.view is not None

    def validate(self) -> None:
        if not self.name or "/" in self.name or self.name.startswith("_"):
            raise ValueError(f"bad table name {self.name!r}")
        if self.is_view:
            if self.view not in VIEW_KINDS:
                raise ValueError(
                    f"table {self.name!r}: unknown view kind {self.view!r} "
                    f"(have: {', '.join(VIEW_KINDS)})"
                )
            if not self.source:
                raise ValueError(f"view table {self.name!r} needs a source table")
            if self.wal_dir:
                raise ValueError(f"view table {self.name!r} cannot also have a WAL")
        elif not self.wal_dir:
            raise ValueError(f"base table {self.name!r} needs wal_dir")


def spec_from_config(entry: dict) -> TableSpec:
    """One config-file entry → TableSpec. Accepted keys mirror the replay
    CLI flags; ``"folds": true`` resolves to the default fold set."""
    folds = entry.get("folds", [])
    if folds is True or folds == "default":
        from .folds import DEFAULT_FOLDS

        folds = list(DEFAULT_FOLDS)
    spec = TableSpec(
        name=entry["name"],
        wal_dir=entry.get("wal"),
        num_buckets=int(entry.get("buckets", 32)),
        tz_offset_minutes=int(entry.get("tz_offset_minutes", 0)),
        aggregate=bool(entry.get("aggregate", True)),
        folds=folds,
        pseudonym_fields=list(entry.get("pseudonym_fields", [])),
        emit_changelog=bool(entry.get("changelog", False)),
        retain_ticks=int(entry.get("retain_ticks", 0)),
        shuffle=entry.get("shuffle", "spill"),
        view=entry.get("view"),
        source=entry.get("source"),
    )
    spec.validate()
    return spec


def load_config(path: str) -> list[TableSpec]:
    with open(path) as f:
        cfg = json.load(f)
    return [spec_from_config(e) for e in cfg["tables"]]


class MultiTableLake:
    """N logical tables under one lake directory, one replay loop.

    ``tick()`` advances every table once, in spec order (base tables first
    is the caller's responsibility when a view depends on a base — specs
    are processed in the given order). Each table commits independently
    under its own writer lock, so per-table crash/resume semantics are
    exactly the single-table engine's.
    """

    def __init__(self, lake_dir: str, specs: list[TableSpec]):
        names = [s.name for s in specs]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate table names in {names}")
        by_name = {s.name: s for s in specs}
        for s in specs:
            s.validate()
            if s.is_view:
                if s.source not in by_name:
                    raise ValueError(
                        f"view {s.name!r} sources unknown table {s.source!r}"
                    )
                if by_name[s.source].is_view:
                    raise ValueError(
                        f"view {s.name!r} cannot source another view ({s.source!r})"
                    )
        self.lake_dir = lake_dir
        self.specs = specs
        self._engines: dict[str, object] = {}
        os.makedirs(os.path.join(lake_dir, "tables"), exist_ok=True)
        # the registry is ops metadata (status CLI), not the source of truth
        # — the specs passed in are. Overwritten on every construction.
        reg = {
            "tables": [
                {
                    "name": s.name,
                    "wal": s.wal_dir,
                    "buckets": s.num_buckets,
                    "view": s.view,
                    "source": s.source,
                    "tz_offset_minutes": s.tz_offset_minutes,
                    "changelog": s.emit_changelog,
                }
                for s in specs
            ]
        }
        tmp = os.path.join(lake_dir, "_tables.json.tmp")
        with open(tmp, "w") as f:
            json.dump(reg, f, indent=1)
        os.replace(tmp, os.path.join(lake_dir, "_tables.json"))

    def table_dir(self, name: str) -> str:
        return os.path.join(self.lake_dir, "tables", name)

    def spec(self, name: str) -> TableSpec:
        for s in self.specs:
            if s.name == name:
                return s
        raise KeyError(name)

    def engine(self, name: str):
        """The (lazily created, cached) ReplayEngine of a base table."""
        if name not in self._engines:
            from .replay import ReplayEngine

            s = self.spec(name)
            if s.is_view:
                raise ValueError(f"{name!r} is a view, not a base table")
            self._engines[name] = ReplayEngine(
                s.wal_dir,
                self.table_dir(name),
                num_buckets=s.num_buckets,
                concurrency=s.concurrency,
                aggregate=s.aggregate,
                shuffle=s.shuffle,
                checks=s.checks,
                folds=s.folds,
                pseudonym_fields=s.pseudonym_fields,
                tz_offset_minutes=s.tz_offset_minutes,
                retain_ticks=s.retain_ticks,
                emit_changelog=s.emit_changelog,
            )
        return self._engines[name]

    def tick(self, max_segments: int | None = None) -> dict:
        """One pass over all tables: base tables tick, views refresh.
        Returns {name: TickResult | refresh-dict | None}."""
        out = {}
        for s in self.specs:
            if s.is_view:
                out[s.name] = refresh_view(
                    s.view, self.table_dir(s.source), self.table_dir(s.name)
                )
            else:
                out[s.name] = self.engine(s.name).tick(max_segments)
        return out

    def replay_all(self, *, segments_per_tick: int | None = None) -> list[dict]:
        rounds = []
        while True:
            r = self.tick(segments_per_tick)
            if all(v is None for v in r.values()):
                break
            rounds.append(r)
        return rounds

    def read_view(self, name: str):
        s = self.spec(name)
        if not s.is_view:
            raise ValueError(f"{name!r} is not a view")
        return read_repo_stats(self.table_dir(name))

    def status(self) -> dict:
        from .lineage import LakeLineage

        out = {}
        for s in self.specs:
            d = self.table_dir(s.name)
            if s.is_view:
                m = _view_manifest(d)
                out[s.name] = {
                    "view": s.view,
                    "source": s.source,
                    "upstream_tick": m.get("upstream_tick"),
                    "partial_files": len(
                        glob.glob(os.path.join(d, "partials", "b=*.parquet"))
                    ),
                }
            else:
                last = LakeLineage(d).last_tick() if os.path.isdir(d) else None
                out[s.name] = {
                    "tick": last["tick"] if last else None,
                    "through_seqno": last["through_seqno"] if last else None,
                    "live_rows": last["live_rows"] if last else 0,
                }
        return out


# ---------------------------------------------------------------------------
# Derived view: repo_stats (incrementally maintained two-level aggregate)
# ---------------------------------------------------------------------------

_PARTIAL_COLS = ["repo", "live_files", "total_bytes", "last_lsn"]


def _view_manifest(view_dir: str) -> dict:
    p = os.path.join(view_dir, "_view.json")
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def _publish_view_manifest(view_dir: str, obj: dict) -> None:
    p = os.path.join(view_dir, "_view.json")
    with open(p + ".tmp", "w") as f:
        json.dump(obj, f)
    os.replace(p + ".tmp", p)


def _repo_partial_of_state(man: dict, out_path: str) -> int:
    """Recompute one bucket's per-repo partial from its committed state
    (merge-on-read in delta mode). Idempotent; atomic publish."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .apply import read_bucket_state

    t = read_bucket_state(man, columns=["repo", "size_bytes", "lsn", "deleted"])
    live = t.filter(pc.invert(pc.coalesce(t["deleted"], pa.scalar(False))))
    g = live.group_by("repo").aggregate(
        [("lsn", "max"), ("size_bytes", "sum"), ([], "count_all")]
    )
    g = g.rename_columns(
        ["repo"]
        + [
            {"lsn_max": "last_lsn", "size_bytes_sum": "total_bytes",
             "count_all": "live_files"}[n]
            for n in g.schema.names[1:]
        ]
    )
    # SUM over an all-null column is null; the view contract is 0
    g = g.set_column(
        g.schema.get_field_index("total_bytes"),
        "total_bytes",
        pc.coalesce(g["total_bytes"], pa.scalar(0, pa.int64())),
    )
    g = g.select(_PARTIAL_COLS).sort_by("repo")
    tmp = out_path + f".{os.getpid()}.tmp"
    pq.write_table(g, tmp, compression="zstd")
    os.replace(tmp, out_path)
    return g.num_rows


def refresh_view(kind: str, upstream_dir: str, view_dir: str) -> dict | None:
    if kind == "repo_stats":
        return refresh_repo_stats(upstream_dir, view_dir)
    raise ValueError(f"unknown view kind {kind!r}")


def refresh_repo_stats(upstream_dir: str, view_dir: str) -> dict | None:
    """Advance the view to the upstream table's committed tick.

    Work = one Ray task per bucket whose manifest tick advanced since the
    last refresh (manifest tick is the bucket's last-rewrite tick, so an
    untouched bucket costs nothing). Crash-safe: partials are pure
    functions of committed upstream state and ``_view.json`` publishes
    LAST, so a crashed refresh just redoes its touched buckets.
    """
    import ray

    from .lineage import LakeLineage
    from .lock import writer_lock

    up = LakeLineage(upstream_dir)
    last = up.last_tick()
    if last is None:
        return None
    mf = _view_manifest(view_dir)
    applied = mf.get("upstream_tick", -1)
    if last["tick"] <= applied:
        return None

    with writer_lock(view_dir, "view-refresh"):
        pdir = os.path.join(view_dir, "partials")
        os.makedirs(pdir, exist_ok=True)
        manifests = up.all_bucket_manifests()
        live_buckets = {m["bucket"] for m in manifests}
        # orphans from an upstream rebucket to a smaller bucket count
        for f in glob.glob(os.path.join(pdir, "b=*.parquet")):
            b = int(os.path.basename(f)[2:-8])
            if b not in live_buckets:
                os.remove(f)
        touched = [m for m in manifests if m["tick"] > applied]
        if touched:
            task = ray.remote(num_cpus=1)(_repo_partial_of_state)
            futs = [
                task.remote(
                    dict(m), os.path.join(pdir, f"b={m['bucket']:05d}.parquet")
                )
                for m in touched
            ]
            rows = sum(ray.get(futs))
        else:
            rows = 0
        _publish_view_manifest(
            view_dir, {"upstream_tick": last["tick"], "kind": "repo_stats"}
        )
    return {"upstream_tick": last["tick"], "buckets": len(touched), "partial_rows": rows}


def read_repo_stats(view_dir: str):
    """The view as a Ray Dataset: final reduce over the per-bucket partials
    (aggregate-grain rows only — the combiner half was done at refresh)."""
    import ray.data

    from ..ops.common import partial_groupby

    files = sorted(glob.glob(os.path.join(view_dir, "partials", "b=*.parquet")))
    if not files:
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.table(
                {
                    "repo": pa.array([], pa.string()),
                    "live_files": pa.array([], pa.int64()),
                    "total_bytes": pa.array([], pa.int64()),
                    "last_lsn": pa.array([], pa.int64()),
                }
            )
        )
    ds = ray.data.read_parquet(files, partitioning=None)
    return partial_groupby(
        ds,
        ["repo"],
        {
            "live_files": ("live_files", "sum"),
            "total_bytes": ("total_bytes", "sum"),
            "last_lsn": ("last_lsn", "max"),
        },
    )
