"""Open-partition watermark and force-close policy — the live-tailer edge.

Reference: ``/root/reference/etl/dags/user_history/event_partition.py:28-66``
— a sensor polls the MIN(collector_tstamp) of rows that arrived within the
last hour; a day partition closes when that low-watermark passes local
midnight + ``close_event_partition_after_hours``, and force-closes after
12 h of silence (``:38``), so one stuck producer cannot hold the day open
forever. Late rows after close are not dropped; they are *marked*
(``load_data.sql:10`` ``event_quality``) — here: LWW monotonicity makes
them safe no-ops or legitimate updates.

The replay engine itself consumes sealed segments (the WAL manifest is its
sealer); :class:`DayPartitionCloser` is the sealing policy for a LIVE
tail: feed it arrivals, poll it for closable day partitions. The same
object seals LSN-range segments if ``day`` is replaced by an LSN bucket.
"""

from __future__ import annotations

from collections import deque

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000


class DayPartitionCloser:
    """Tracks open event-time day partitions of an arriving stream.

    - ``observe(event_ts_us, now_us)`` registers one arrival (event time +
      wall clock).
    - ``closable(now_us)`` returns (and retires) the day-partition starts
      that are safe to close: the low-watermark — the MINIMUM event time
      among arrivals in the trailing ``recent_window_us`` — has passed the
      day's end plus ``close_after_us`` (allowed lateness), OR the day has
      been silent for ``force_close_us`` (the stuck-producer escape hatch).
    """

    def __init__(
        self,
        *,
        close_after_us: int = 2 * US_PER_HOUR,
        force_close_us: int = 12 * US_PER_HOUR,
        recent_window_us: int = US_PER_HOUR,
        tz_offset_minutes: int = 0,
    ):
        self.close_after_us = close_after_us
        self.force_close_us = force_close_us
        self.recent_window_us = recent_window_us
        # per-table local midnight (reference: lib/utils.py:59-62 — each app
        # closes its day partition on ITS timezone's midnight). Day keys stay
        # UTC instants of the LOCAL day start, so deadlines need no rework.
        self._tz_off_us = tz_offset_minutes * 60_000_000
        self._open: dict[int, int] = {}  # day_start_us -> last arrival now_us
        self._closed: set[int] = set()
        self._recent: deque[tuple[int, int]] = deque()  # (now_us, event_ts_us)
        self.late_after_close = 0  # lateness metric (lineage analog)

    def observe(self, event_ts_us: int, now_us: int) -> None:
        local = event_ts_us + self._tz_off_us
        day = (local // US_PER_DAY) * US_PER_DAY - self._tz_off_us
        if day in self._closed:
            self.late_after_close += 1  # marked, not dropped (event_quality)
        else:
            self._open[day] = now_us
        self._recent.append((now_us, event_ts_us))
        self._prune(now_us)

    def _prune(self, now_us: int) -> None:
        horizon = now_us - self.recent_window_us
        while self._recent and self._recent[0][0] < horizon:
            self._recent.popleft()

    def watermark(self, now_us: int) -> int | None:
        """Low-watermark: min event time of arrivals in the recent window."""
        self._prune(now_us)
        if not self._recent:
            return None
        return min(ts for _, ts in self._recent)

    def closable(self, now_us: int) -> list[int]:
        wm = self.watermark(now_us)
        out = []
        for day, last_seen in sorted(self._open.items()):
            deadline = day + US_PER_DAY + self.close_after_us
            if wm is not None and wm > deadline:
                out.append(day)
            elif now_us - last_seen > self.force_close_us:
                out.append(day)  # force close: silent too long
        for day in out:
            del self._open[day]
            self._closed.add(day)
        return out

    @property
    def open_days(self) -> list[int]:
        return sorted(self._open)
