"""Graphite ``from``/``until`` time syntax (the request-parameter half of
the render API).

Real render requests almost never carry epoch integers — Grafana and
the graphite composer send ``from=-24h&until=now``, ``from=midnight``,
``from=17:00_20240115``, ``from=monday`` … parsed by graphite-web's
``attime`` grammar. :func:`parse_at_time` transcribes that grammar so
``Engine.fetch/render/render_many`` accept the same strings a graphite
user sends today.

Transcribed semantics (graphite-web attime):

- normalize: strip, lowercase, drop ``_``, ``,`` and spaces;
- all-digit strings are epoch seconds UNLESS they form a plausible
  ``YYYYMMDD`` date (year > 1900, month < 13, day < 32 — graphite's
  literal disambiguation rule);
- a 13-char form with ``:`` is ``HH:MM YYYYMMDD`` (after normalization
  ``17:0020240115``);
- otherwise split on the FIRST ``+``/``-`` into reference + offset:
  the reference is ``now``/empty, a time-of-day (``HH:MM`` with
  optional am/pm, ``noon``, ``midnight``, ``teatime`` = 16:00)
  optionally followed by a day reference (``today``, ``yesterday``,
  ``tomorrow``, ``YYYYMMDD``, ``MM/DD/YY[YY]``, a month name + day
  like ``january8``, or a weekday name = the most recent such day);
  the offset is a signed run of ``<num><unit>`` terms, every term
  taking the sign (``-1d2h`` = 26 hours ago); units are
  s/min/h/d/w/mon(=30 d)/y(=365 d) by prefix — a bare ``m`` is
  rejected as ambiguous, exactly like graphite.

Deliberate deviations (documented):

- UTC only (graphite localizes to the webapp TZ; this engine's stores
  and oracles are UTC end to end);
- ``now`` must be INJECTED (``now_ts``) — forms that read the clock
  raise without it instead of silently going nondeterministic; fully
  absolute forms (epoch, ``HH:MM YYYYMMDD``, ``MM/DD/YYYY``) never
  need it. Two-digit years follow GRAPHITE's pivot (+1900, <1970 →
  +100: 69→2069, 70→1970 — NOT strptime's %y, which puts 69 in 1969;
  ADVICE r8 fix, pinned in tests/test_attime.py).
"""

from __future__ import annotations

import datetime as dt

UTC = dt.timezone.utc

_MONTHS = (
    "jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec",
)
_WEEKDAYS = ("mon", "tue", "wed", "thu", "fri", "sat", "sun")

#: unit-prefix table, longest prefixes first (``mon`` before a bare
#: ``m`` mis-read; graphite rejects plain ``m`` as ambiguous min/mon)
_UNITS = (
    ("mon", 30 * 86400),
    ("min", 60),
    ("s", 1),
    ("h", 3600),
    ("d", 86400),
    ("w", 7 * 86400),
    ("y", 365 * 86400),
)


def _unit_seconds(unit: str) -> int:
    for prefix, secs in _UNITS:
        if unit.startswith(prefix):
            return secs
    raise ValueError(f"invalid unit {unit!r} (graphite rejects bare 'm')")


def parse_time_offset(offset: str) -> int:
    """Signed offset in seconds: ``-1d2h`` → −93600, ``+30min`` → 1800,
    ``1w`` → 604800 (a leading digit means ``+``). Every term takes the
    one leading sign — exactly graphite's parseTimeOffset."""
    if not offset:
        return 0
    if offset[0].isdigit():
        sign = 1
    elif offset[0] in "+-":
        sign = 1 if offset[0] == "+" else -1
        offset = offset[1:]
    else:
        raise ValueError(f"invalid offset {offset!r}")
    total = 0
    while offset:
        i = 0
        while i < len(offset) and offset[i].isdigit():
            i += 1
        if i == 0:
            raise ValueError(f"invalid offset near {offset!r}")
        num = int(offset[:i])
        offset = offset[i:]
        j = 0
        while j < len(offset) and offset[j].isalpha():
            j += 1
        if j == 0:
            raise ValueError(f"offset {num} missing a unit")
        total += num * _unit_seconds(offset[:j])
        offset = offset[j:]
    return sign * total


def _need_now(now_ts: int | None, form: str) -> dt.datetime:
    if now_ts is None:
        raise ValueError(
            f"time reference {form!r} is relative to 'now' — pass now_ts "
            "(this engine injects the clock instead of reading it, so "
            "queries stay deterministic)"
        )
    return dt.datetime.fromtimestamp(int(now_ts), UTC)


def _parse_reference(ref: str, now_ts: int | None) -> dt.datetime:
    """graphite parseTimeReference over the normalized reference."""
    if not ref or ref == "now":
        return _need_now(now_ts, ref or "now")

    # time-of-day head
    hour = minute = 0
    i = ref.find(":")
    if 0 < i < 3:
        hour = int(ref[:i])
        minute = int(ref[i + 1:i + 3])
        ref = ref[i + 3:]
        if ref[:2] == "am":
            ref = ref[2:]
        elif ref[:2] == "pm":
            hour = (hour + 12) % 24
            ref = ref[2:]
    if ref.startswith("noon"):
        hour, minute = 12, 0
        ref = ref[4:]
    elif ref.startswith("midnight"):
        hour, minute = 0, 0
        ref = ref[8:]
    elif ref.startswith("teatime"):
        hour, minute = 16, 0
        ref = ref[7:]

    # day reference
    if ref.isdigit() and len(ref) == 8:  # YYYYMMDD — fully absolute
        return dt.datetime(
            int(ref[:4]), int(ref[4:6]), int(ref[6:8]), hour, minute,
            tzinfo=UTC,
        )
    if "/" in ref:  # MM/DD/YY or MM/DD/YYYY — absolute
        m, d, y = ref.split("/")
        year = int(y)
        if year < 100:
            # graphite's pivot (attime.py): year += 1900, then
            # year < 1970 → +100 — so 00-69 → 2000s and 70-99 → 1900s.
            # strptime's %y pivot puts 69 in 1969; graphite puts it in
            # 2069 (ADVICE r8 — match graphite exactly).
            year += 1900
            if year < 1970:
                year += 100
        return dt.datetime(year, int(m), int(d), hour, minute, tzinfo=UTC)

    base = _need_now(now_ts, ref or "time-of-day").replace(
        hour=hour, minute=minute, second=0, microsecond=0
    )
    if not ref or ref == "today":
        return base
    if ref == "yesterday":
        return base - dt.timedelta(days=1)
    if ref == "tomorrow":
        return base + dt.timedelta(days=1)
    if ref[:3] in _MONTHS:  # january8 — day of the CURRENT year
        month = _MONTHS.index(ref[:3]) + 1
        day_digits = "".join(ch for ch in ref if ch.isdigit())
        if not day_digits:
            raise ValueError(f"month reference {ref!r} needs a day")
        return base.replace(month=month, day=int(day_digits))
    if ref[:3] in _WEEKDAYS:  # most recent such weekday (today counts)
        target = _WEEKDAYS.index(ref[:3])
        delta = (base.weekday() - target) % 7
        return base - dt.timedelta(days=delta)
    raise ValueError(f"unparseable time reference {ref!r}")


def parse_at_time(s: str | int, now_ts: int | None = None) -> int:
    """Parse one graphite ``from``/``until`` value to epoch seconds.
    Integers pass through; see the module docstring for the grammar and
    the two documented deviations (UTC-only, injected ``now``)."""
    if isinstance(s, int):
        return s
    norm = (
        str(s).strip().lower().replace("_", "").replace(",", "")
        .replace(" ", "")
    )
    if not norm:
        raise ValueError("empty time reference")
    if norm.isdigit():
        if not (
            len(norm) == 8
            and int(norm[:4]) > 1900
            and int(norm[4:6]) < 13
            and int(norm[6:8]) < 32
        ):
            return int(norm)  # epoch seconds
        # else: falls through as a YYYYMMDD reference
    elif ":" in norm and len(norm) == 13:  # HH:MM_YYYYMMDD
        t = dt.datetime.strptime(norm, "%H:%M%Y%m%d")
        return int(t.replace(tzinfo=UTC).timestamp())
    if "+" in norm:
        ref, offset = norm.split("+", 1)
        offset = "+" + offset
    elif "-" in norm:
        ref, offset = norm.split("-", 1)
        offset = "-" + offset
    else:
        ref, offset = norm, ""
    base = _parse_reference(ref, now_ts)
    return int(base.timestamp()) + parse_time_offset(offset)
