"""The replay loop: WAL segments → deduped deltas → merge appliers → commit.

One *tick* = the reference's one Airflow DAG run (``DAG_user_history.py``'s
daily chain, SURVEY.md §3.1), compressed into a single lazy Ray Data
pipeline with exactly ONE shuffle:

  discover pending segments (lineage watermark)                    [sensor/ST4]
  → read_parquet per schema group, align (schema evolution)        [S1/§1.3]
  → LangEnricher (broadcast dim, stateless tasks)                  [M5/J3/ST6]
  → per-batch last-writer pre-reduction + bucket column            [D1 partial,
      (the combiner: a hot key sends ≤1 row per batch to shuffle)   skew/salt]
  → op→tombstone shaping                                           [A5 prep]
  → groupby(bucket).map_groups(MergeApplier, concurrency=N)        [the shuffle
      + stateful actor-pool apply: LWW upsert/delete/evolve]        A5/J4/J5]
  → driver: publish bucket manifests, re-aggregate touched days,
    publish tick manifest (the commit point), GC                   [S2/S3/ST4]

Crash anywhere before the tick manifest → previous tick stays authoritative
and the re-run is a no-op-idempotent re-apply (exactly-once by idempotence).
Ticks are strictly serial, like ``depends_on_past=True`` day runs.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import pyarrow as pa

from ..wal import WalInfo
from . import aggregates
from .apply import MergeApplier, deltas_to_state_shape
from .dedup import last_writer
from .enrich import LangEnricher
from .lineage import LakeLineage
from .partitioning import with_bucket
from .source import pending_segments, read_segments, target_schema_for


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
        concurrency: int = 4,
        aggregate: bool = True,
        fail_after_buckets: int | None = None,  # crash injection for tests
    ):
        self.wal = WalInfo.load(wal_dir)
        self.lake_dir = lake_dir
        self.lineage = LakeLineage(lake_dir)
        self.num_buckets = num_buckets
        self.concurrency = concurrency
        self.aggregate = aggregate
        self.fail_after_buckets = fail_after_buckets

    # ------------------------------------------------------------------

    def tick(self, max_segments: int | None = None) -> TickResult | None:
        t0 = time.perf_counter()
        last = self.lineage.last_tick()
        through = last["through_seqno"] if last else -1
        tick_id = (last["tick"] + 1) if last else 0
        segs = pending_segments(self.wal, through, max_segments)
        if not segs:
            return None

        self.lineage.gc()  # drop uncommitted staging from any crashed run

        target = target_schema_for(segs)
        ds = read_segments(segs, target)
        ds = ds.map_batches(LangEnricher, batch_format="pyarrow", concurrency=(1, 4))

        nb = self.num_buckets

        def reduce_and_bucket(batch: pa.Table) -> pa.Table:
            batch = last_writer(batch)  # per-batch combiner (salt cell)
            batch = deltas_to_state_shape(batch)
            return with_bucket(batch, nb)

        ds = ds.map_batches(reduce_and_bucket, batch_format="pyarrow", zero_copy_batch=True)

        schema_ser = target_schema_ser(deltas_schema(target))
        applied = ds.groupby("__bucket").map_groups(
            MergeApplier,
            fn_constructor_args=(self.lake_dir, tick_id, schema_ser),
            batch_format="pyarrow",
            concurrency=self.concurrency,
            num_cpus=1,
        )
        manifests = applied.take_all()  # ≤ num_buckets rows

        # ---- two-phase commit: publish bucket manifests, then the tick ----
        events = sum(s["rows"] for s in segs)
        state_rows = live_rows = 0
        for i, m in enumerate(manifests):
            if self.fail_after_buckets is not None and i >= self.fail_after_buckets:
                raise RuntimeError("injected crash mid-commit (test only)")
            self.lineage.publish_bucket(dict(m))
        for m in self.lineage.all_bucket_manifests():
            state_rows += m["rows"]
            live_rows += m["live_rows"]

        if self.aggregate:
            days = aggregates.days_of_segments(segs)
            aggregates.recompute_days(
                self.wal, self.lineage, days, segs[-1]["seqno"]
            )

        self.lineage.publish_tick(
            {
                "tick": tick_id,
                "through_seqno": segs[-1]["seqno"],
                "applied_through_lsn": max(s["max_lsn"] for s in segs),
                "segments": [s["seqno"] for s in segs],
                "events": events,
                "buckets_touched": len(manifests),
                "state_rows": state_rows,
                "live_rows": live_rows,
            }
        )
        self.lineage.gc()
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
        while True:
            r = self.tick(segments_per_tick)
            if r is None:
                break
            out.append(r)
        return out


def deltas_schema(envelope: pa.Schema) -> pa.Schema:
    """Schema of delta rows after op→tombstone shaping (what appliers see)."""
    fields = [f for f in envelope if f.name != "op"]
    fields.append(pa.field("deleted", pa.bool_()))
    return pa.schema(fields)


def target_schema_ser(schema: pa.Schema) -> bytes:
    return schema.serialize().to_pybytes()
