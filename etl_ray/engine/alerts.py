"""Failure/alert event surface: the ops integration point.

The reference alerts Slack on task failure, data-test failure and deadline
breach (``etl/dags/lib/utils.py:65-160``, wired into every DAG's
``on_failure_callback``; the deadline sensor at
``etl/plugins/operators/deadline.py:29-38``). The engine-side equivalent is
(a) a JSON-lines ops event file beside the lake (``_events.jsonl`` — the
durable trail ``status --events`` reads) and (b) pluggable callbacks on the
engine (``on_event=``) where a real deployment hangs its pager/Slack
webhook. A failing callback is swallowed: alerting must never take down the
pipeline it reports on.

Event kinds emitted by the engine:

- ``tick_failure``      — a tick raised before its commit point
- ``quality_failure``   — a MANDATORY data-quality check failed (tick aborted)
- ``deadline_exceeded`` — the run's wall-clock budget ran out between ticks
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

EVENTS_FILE = "_events.jsonl"

EventCallback = Callable[[dict], None]


def emit_event(
    lake_dir: str,
    kind: str,
    payload: dict | None = None,
    callbacks: tuple[EventCallback, ...] | list[EventCallback] = (),
) -> dict:
    """Append one event line to the lake's ops trail and fan it out to the
    callbacks. A single ``write`` of one ``\\n``-terminated line is atomic
    at this grain on POSIX, so concurrent writers interleave whole lines."""
    rec = {"ts": time.time(), "kind": kind, "pid": os.getpid()}
    if payload:
        rec["payload"] = payload
    os.makedirs(lake_dir, exist_ok=True)
    with open(os.path.join(lake_dir, EVENTS_FILE), "a") as f:
        f.write(json.dumps(rec) + "\n")
    for cb in callbacks:
        try:
            cb(dict(rec))
        except Exception:
            pass  # alerting must never take down the pipeline
    return rec


def read_events(lake_dir: str, last: int | None = None) -> list[dict]:
    """The ops event trail, oldest first; ``last`` limits to the tail.
    Torn trailing lines (a crash mid-append) are skipped."""
    p = os.path.join(lake_dir, EVENTS_FILE)
    if not os.path.exists(p):
        return []
    out = []
    with open(p) as f:
        for line in f:
            try:
                out.append(json.loads(line))
            except ValueError:
                continue
    return out[-last:] if last else out
