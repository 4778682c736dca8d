"""Single-writer guard for a lake directory.

The commit protocol (lineage.py) is crash-safe for ONE writer: two live
writers interleaving bucket-manifest publications could commit ticks built
on each other's half-published state. Real deployments serialize writers
out-of-band (one driver owns the lake); this guard enforces it in-band with
an advisory lock file so a second `replay` / maintenance op fails fast
instead of corrupting lineage.

Mechanics: ``_lock.json`` is created with O_EXCL (atomic on POSIX, incl.
the NFS-style shared FS a multi-node lake sits on). A crashed writer's lock
is broken when (a) it was taken on this host and its pid is gone, or (b) it
is older than ``ttl_s`` — the cross-host fallback, so a dead driver on
another node blocks writers for at most the TTL. Long-running writers
re-acquire per tick, which also refreshes the timestamp.

Reference analog: the reference serializes its loads per-app through
Airflow's one-dag-run-at-a-time scheduling (``max_active_runs=1`` on its
DAGs); a lake on shared storage needs the equivalent at the storage layer.
"""

from __future__ import annotations

import contextlib
import json
import os
import socket
import time


class WriterLockError(RuntimeError):
    """Another live writer holds the lake's lock."""


def _lock_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_lock.json")


def _proc_start_ticks(pid: int) -> int | None:
    """Kernel start time (clock ticks) of ``pid``, or None if unreadable.

    Distinguishes a live holder from an unrelated process that recycled its
    pid: same pid + same start ticks == same process. /proc/<pid>/stat field
    22, counted after the parenthesized comm (which may contain spaces).
    """
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            raw = f.read()
        return int(raw[raw.rindex(b")") + 2 :].split()[19])
    except (OSError, ValueError, IndexError):
        return None


def _is_stale(info: dict, ttl_s: float) -> bool:
    if not isinstance(info, dict):
        return True  # unreadable/torn lock: treat as breakable
    if info.get("host") == socket.gethostname():
        pid = info.get("pid")
        if isinstance(pid, int):
            try:
                os.kill(pid, 0)
            except OSError:
                return True  # holder died on this host
            # pid is alive — but pids recycle. Only trust "alive" as
            # "holder alive" when the kernel start time matches the one
            # recorded at acquisition; a mismatch means an unrelated
            # process inherited the pid and the real holder is gone.
            rec = info.get("pid_start")
            cur = _proc_start_ticks(pid)
            if rec is not None and cur is not None:
                if cur != rec:
                    return True  # pid recycled: holder is dead
                # verified SAME live process: never stale — the TTL is
                # only the cross-host fallback (a long single-acquisition
                # op like a big rebucket must not be broken at ttl_s)
                return False
            # Can't prove identity (old-format lock or no /proc): fall
            # through to the TTL so a recycled pid can't pin the lake
            # forever (ADVICE r3: 'alive' pid probe bypassing TTL).
    ts = info.get("ts", 0)
    return (time.time() - ts) > ttl_s


@contextlib.contextmanager
def writer_lock(lake_dir: str, op: str, *, ttl_s: float = 3600.0):
    """Acquire the lake's writer lock for the duration of one operation.
    Raises :class:`WriterLockError` if a live writer holds it."""
    os.makedirs(lake_dir, exist_ok=True)
    path = _lock_path(lake_dir)
    payload = {
        "pid": os.getpid(),
        "pid_start": _proc_start_ticks(os.getpid()),
        "host": socket.gethostname(),
        "op": op,
        "ts": time.time(),
    }
    bad_reads = 0
    for _ in range(8):  # bounded retries around break-and-reacquire races
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                json.dump(payload, f)
            break
        except FileExistsError:
            try:
                with open(path) as f:
                    info = json.load(f)
                bad_reads = 0
            except (OSError, ValueError):
                # holder mid-write/mid-release — retry; but a PERSISTENTLY
                # unreadable file is a torn write from a crashed holder and
                # must be breakable, not a livelock
                bad_reads += 1
                if bad_reads < 3:
                    time.sleep(0.05)
                    continue
                info = None  # falls through to _is_stale → breakable
            if _is_stale(info, ttl_s):
                # FENCED break: rename-to-unique first. Two waiters that
                # both judged the old lock stale race here — exactly ONE
                # rename succeeds; the loser's raises (src gone) and it
                # loops to re-read whatever lock now exists. A plain
                # os.remove would let the slower breaker delete the faster
                # one's freshly ACQUIRED live lock (double-writer hazard).
                import uuid as _uuid

                try:
                    broken = path + f".broken-{_uuid.uuid4().hex}"
                    os.rename(path, broken)
                except OSError:
                    pass  # someone else broke (or released) it first
                else:
                    with contextlib.suppress(OSError):
                        os.remove(broken)
                # the torn-read counter must restart: after a break, the
                # next file is a DIFFERENT (possibly live, mid-write)
                # holder's — carrying the count over would let one torn
                # read mark it stale and remove a live writer's lock
                bad_reads = 0
                continue
            raise WriterLockError(
                f"lake {lake_dir!r} is locked by {info.get('op')!r} "
                f"(pid {info.get('pid')} on {info.get('host')}, "
                f"age {time.time() - info.get('ts', 0):.0f}s); if that "
                "writer is truly gone, remove _lock.json or wait out the TTL"
            )
    else:
        raise WriterLockError(f"could not acquire lock for {lake_dir!r} (livelock)")
    try:
        yield
    finally:
        # Ownership-checked release: if this op outlived ttl_s and a waiter
        # fence-broke + reacquired, the file on disk is the NEW holder's —
        # deleting it would reopen the double-writer window the fenced
        # break closed. Only remove a lock whose payload is ours.
        with contextlib.suppress(OSError, ValueError):
            with open(path) as f:
                cur = json.load(f)
            if (
                isinstance(cur, dict)
                and cur.get("pid") == payload["pid"]
                and cur.get("host") == payload["host"]
                and cur.get("ts") == payload["ts"]
            ):
                os.remove(path)
