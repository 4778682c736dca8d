"""Watermark-driven partition close (event_partition.py:28-66 semantics):
low-watermark close with allowed lateness, force-close on silence, and
late-after-close marking."""

from __future__ import annotations

from etl_ray.engine.watermark import US_PER_DAY, US_PER_HOUR, DayPartitionCloser


def test_watermark_close_with_allowed_lateness():
    c = DayPartitionCloser(close_after_us=2 * US_PER_HOUR)
    t0 = 0  # day-0 start, event time == wall clock (in-order stream)
    for h in range(0, 24):
        c.observe(t0 + h * US_PER_HOUR, t0 + h * US_PER_HOUR)
    assert c.closable(t0 + 23 * US_PER_HOUR) == []  # day 0 still open

    # day-1 arrivals push the low-watermark past day0_end + 2h lateness
    for h in range(24, 28):
        now = t0 + h * US_PER_HOUR
        c.observe(now, now)
    # at 27h the watermark (26h) has only REACHED the deadline — still open
    assert c.closable(t0 + 27 * US_PER_HOUR) == []
    # at 28h the recent-window min is 27h > 24h + 2h → closed
    assert c.closable(t0 + 28 * US_PER_HOUR) == [0]
    assert c.open_days == [US_PER_DAY]


def test_late_straggler_holds_partition_open():
    """One producer still emitting yesterday's events keeps the watermark
    (and the day) open — the MIN-of-recent-arrivals rule."""
    c = DayPartitionCloser(close_after_us=2 * US_PER_HOUR)
    now = 26 * US_PER_HOUR  # wall clock: 2h into day 1
    c.observe(25 * US_PER_HOUR, now)  # fresh event
    c.observe(23 * US_PER_HOUR, now)  # straggler: event time inside day 0
    assert c.closable(now) == []  # watermark = 23h < 24h + 2h


def test_force_close_after_silence():
    c = DayPartitionCloser(force_close_us=12 * US_PER_HOUR)
    c.observe(1 * US_PER_HOUR, 1 * US_PER_HOUR)  # one day-0 event, then silence
    assert c.closable(12 * US_PER_HOUR) == []
    assert c.closable(14 * US_PER_HOUR) == [0]  # > 12h silent → force close


def test_late_after_close_marked_not_dropped():
    c = DayPartitionCloser()
    c.observe(1 * US_PER_HOUR, 1 * US_PER_HOUR)
    c.closable(20 * US_PER_HOUR)  # force close day 0
    c.observe(2 * US_PER_HOUR, 30 * US_PER_HOUR)  # late day-0 event
    assert c.late_after_close == 1
    assert c.open_days == []  # closed day did not reopen
