"""Task SCHEDULE interpretation (r11, VERDICT r10 #3).

Snowflake `CREATE TASK ... SCHEDULE = '...'` accepts two forms
(docs: CREATE TASK — beyond-reference Snowflake parity; the reference
package defines no tasks of its own):

* ``'<num> MINUTE'`` (also MINUTES/HOUR/HOURS/SECOND/SECONDS for the
  engine's convenience) — an interval anchored at the task's last
  scheduled fire: due again once the interval has elapsed. A task
  that has never fired is due at the first tick after it is resumed
  (Snowflake starts the interval at resume time; the engine has no
  background clock, so "first run_due() call" is that moment).
* ``'USING CRON <min> <hour> <dom> <mon> <dow> [<tz>]'`` — a classic
  5-field cron spec, each field ``*``, ``*/n``, ``a``, ``a-b``, or a
  comma list of those. Matching is minute-granular in the spec's
  timezone (IANA name via zoneinfo; defaults to UTC). A cron task is
  due when a match time exists in ``(last_fire, now]`` — missed ticks
  collapse into ONE run (Snowflake skips overlapping schedules the
  same way; it never queues a backlog).

Everything here is pure, driver-side, and clock-INJECTED: callers pass
``now`` explicitly (``Engine.run_due(now)``), so tests are fully
deterministic and no query ever reads the wall clock.
"""
from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_INTERVAL_RE = re.compile(
    r"(?is)^\s*(\d+)\s*(second|minute|hour)s?\s*$"
)
_CRON_RE = re.compile(r"(?is)^\s*using\s+cron\s+(.+?)\s*$")

_FIELD_RANGES = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 6)]
_DOW_NAMES = {
    "sun": 0, "mon": 1, "tue": 2, "wed": 3, "thu": 4, "fri": 5, "sat": 6,
}
_MON_NAMES = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}


def _parse_field(text: str, lo: int, hi: int, names: dict) -> set[int]:
    out: set[int] = set()
    for part in text.split(","):
        part = part.strip().lower()
        if not part:
            raise ValueError(f"empty cron field element in {text!r}")
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step < 1:
                raise ValueError(f"cron step must be >= 1: {text!r}")
        if part in ("*", ""):
            start, end = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            start = names.get(a.strip(), None)
            start = int(a) if start is None else start
            end = names.get(b.strip(), None)
            end = int(b) if end is None else end
        else:
            v = names.get(part)
            v = int(part) if v is None else v
            start = end = v
        if not (lo <= start <= hi and lo <= end <= hi and start <= end):
            raise ValueError(
                f"cron field value out of range [{lo},{hi}]: {text!r}"
            )
        out.update(range(start, end + 1, step))
    return out


class Schedule:
    """Parsed SCHEDULE string; ``kind`` is 'interval' or 'cron'."""

    def __init__(self, text: str):
        self.text = text
        m = _INTERVAL_RE.match(text)
        if m:
            self.kind = "interval"
            unit = m.group(2).lower()
            secs = int(m.group(1)) * {
                "second": 1, "minute": 60, "hour": 3600
            }[unit]
            if secs <= 0:
                raise ValueError(f"SCHEDULE interval must be > 0: {text!r}")
            self.interval = timedelta(seconds=secs)
            return
        m = _CRON_RE.match(text)
        if not m:
            raise ValueError(
                "unsupported SCHEDULE (expected '<num> MINUTE' or "
                f"'USING CRON <5 fields> [tz]'): {text!r}"
            )
        self.kind = "cron"
        toks = m.group(1).split()
        if len(toks) == 5:
            tz_name = "UTC"
        elif len(toks) == 6:
            tz_name = toks[5]
        else:
            raise ValueError(
                f"USING CRON needs 5 fields [+ timezone], got: {text!r}"
            )
        if tz_name.upper() == "UTC":
            self.tz = timezone.utc
        else:
            from zoneinfo import ZoneInfo

            self.tz = ZoneInfo(tz_name)
        names = [{}, {}, {}, _MON_NAMES, _DOW_NAMES]
        self.fields = [
            _parse_field(t, lo, hi, nm)
            for t, (lo, hi), nm in zip(toks[:5], _FIELD_RANGES, names)
        ]

    # -- cron matching ------------------------------------------------
    def _matches(self, dt: datetime) -> bool:
        local = dt.astimezone(self.tz)
        mins, hours, doms, mons, dows = self.fields
        if local.minute not in mins or local.hour not in hours:
            return False
        if local.month not in mons:
            return False
        # Vixie-cron day semantics: when BOTH dom and dow are
        # restricted, a date matching EITHER fires; when only one is
        # restricted, that one decides.
        dom_any = doms == set(range(1, 32))
        dow_any = dows == set(range(0, 7))
        dow = (local.weekday() + 1) % 7  # Monday=0 -> Sunday=0 space
        dom_ok = local.day in doms
        dow_ok = dow in dows
        if dom_any and dow_any:
            return True
        if dom_any:
            return dow_ok
        if dow_any:
            return dom_ok
        return dom_ok or dow_ok

    def due(
        self, last_fire: datetime | None, now: datetime
    ) -> datetime | None:
        """The fire timestamp if the schedule is due at ``now`` given
        the previous scheduled fire, else None.

        interval: due when ``now - last_fire >= interval`` (first call
        after resume is immediately due). Fires stamp ``now`` itself,
        so intervals never drift into a backlog.
        cron: due when a minute-granular match exists in
        ``(last_fire, now]``; the MOST RECENT match is the stamp
        (missed ticks collapse). A NEVER-fired cron task fires only
        when ``now``'s own minute matches — it does not catch up on
        ticks from before it was being watched (Snowflake never fires
        a fresh task for a past tick). Backward scans are bounded at
        366 days for sparse (yearly) specs.
        """
        if now.tzinfo is None:
            now = now.replace(tzinfo=timezone.utc)
        if last_fire is not None and last_fire.tzinfo is None:
            last_fire = last_fire.replace(tzinfo=timezone.utc)
        if self.kind == "interval":
            if last_fire is None or now - last_fire >= self.interval:
                return now
            return None
        cur = now.replace(second=0, microsecond=0)
        if last_fire is None:
            return cur if self._matches(cur) else None
        # scan back minute-by-minute from now for the latest match
        # still after last_fire; cap sparse specs at 366 days.
        floor = cur - timedelta(days=366)
        if last_fire > floor:
            floor = last_fire
        while cur > floor:
            if self._matches(cur):
                return cur
            cur -= timedelta(minutes=1)
        return None


def parse_schedule(text: str) -> Schedule:
    return Schedule(text)
