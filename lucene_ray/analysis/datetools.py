"""DateTools — date <-> sortable term encoding
(``lucene/core/src/java/org/apache/lucene/document/DateTools.java``,
tests ``TestDateTools.java``): a UTC datetime renders as a
zero-padded digit string truncated to a resolution, so lexicographic
term order == chronological order and date ranges become
TermRangeQuery bounds."""

from __future__ import annotations

from datetime import datetime, timezone

# resolution -> format length (yyyyMMddHHmmssSSS prefixes)
_FORMATS = {
    "year": "%Y",
    "month": "%Y%m",
    "day": "%Y%m%d",
    "hour": "%Y%m%d%H",
    "minute": "%Y%m%d%H%M",
    "second": "%Y%m%d%H%M%S",
    "millisecond": "%Y%m%d%H%M%S",  # + 3 ms digits appended
}

RESOLUTIONS = tuple(_FORMATS)


def date_to_string(dt: datetime, resolution: str = "millisecond") -> str:
    """UTC render truncated to ``resolution`` (DateTools.dateToString).
    Naive datetimes are taken as UTC, like the reference's GMT
    calendar."""
    fmt = _FORMATS[resolution]
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    s = dt.strftime(fmt)
    if resolution == "millisecond":
        s += f"{dt.microsecond // 1000:03d}"
    return s


def string_to_date(s: str) -> datetime:
    """Inverse (DateTools.stringToDate): the resolution is inferred
    from the string length; unspecified fields floor (month/day -> 1,
    time -> 0)."""
    by_len = {4: "%Y", 6: "%Y%m", 8: "%Y%m%d", 10: "%Y%m%d%H",
              12: "%Y%m%d%H%M", 14: "%Y%m%d%H%M%S"}
    n = len(s)
    if n == 17:  # millisecond
        dt = datetime.strptime(s[:14], "%Y%m%d%H%M%S")
        return dt.replace(microsecond=int(s[14:]) * 1000)
    if n not in by_len:
        raise ValueError(f"not a DateTools string: {s!r}")
    return datetime.strptime(s, by_len[n])


def round_floor(dt: datetime, resolution: str) -> datetime:
    """DateTools.round: truncate to the resolution (floor)."""
    return string_to_date(date_to_string(dt, resolution))
