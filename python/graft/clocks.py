"""Clock tables (≙ /root/reference/python/ts/flint/clocks.py).

Bounds accept either long nanos or any pandas-parseable date-time string
(``"2017-01-01"``, ``"20170101 09:30"``), mirroring the reference's
string-typed ``begin_date_time`` / ``end_date_time`` API; naive strings
are localized to ``time_zone`` (default UTC).
"""

from pyspark.sql import DataFrame

from .dataframe import TimeSeriesDataFrame


def _to_nanos(v, time_zone="UTC"):
    if isinstance(v, int):
        return v
    import pandas as pd
    t = pd.Timestamp(v)
    if t.tzinfo is None:
        t = t.tz_localize(time_zone)
    return t.value


def _offset_nanos(offset, frequency):
    """Reference offset semantics (flint Clocks.scala: "specifying an offset
    greater than the frequency is the same as specifying offset %
    frequency"): the first tick is begin + offset % frequency and ticks stay
    bounded by end."""
    if offset in ("0ns", "0s", None):
        return 0
    from .functions import parse_nanos
    return parse_nanos(offset) % parse_nanos(frequency)


def uniform(session, begin, end, frequency, offset="0ns", time_zone="UTC",
            end_inclusive=True):
    """Evenly spaced time-only table with first tick ``begin + offset %
    frequency``, stepping ``frequency`` while <= ``end`` (≙ flint
    clocks.uniform; ``end_inclusive=False`` drops a tick landing exactly
    on ``end``).

    Deliberate leniency vs the reference: flint's ``Clock.firstTick``
    requires ``first < end`` and THROWS when the offset pushes the first
    tick to or past ``end``; here ``first == end`` yields that single tick
    (consistent with ``end_inclusive``) and ``first > end`` yields an empty
    clock — degenerate ranges are data, not errors. Mirrored by the Scala
    ``uniformClock`` and pinned by ``test_uniform_clock_offset``."""
    api = session._jvm.graft.python.PyApi
    b = _to_nanos(begin, time_zone) + _offset_nanos(offset, frequency)
    e = _to_nanos(end, time_zone)
    if b > e:  # offset pushed the first tick past end: empty clock
        return TimeSeriesDataFrame(
            session.range(0).selectExpr("id AS time"))
    jdf = api.uniformClock(session._jsparkSession, b, e, frequency,
                           bool(end_inclusive))
    return TimeSeriesDataFrame(DataFrame(jdf, session))


def random(session, begin, end, frequency, seed=42, time_zone="UTC"):
    """Jittered clock; deterministic for a given seed on any engine."""
    jdf = session._jvm.graft.python.PyApi.randomClock(
        session._jsparkSession, _to_nanos(begin, time_zone),
        _to_nanos(end, time_zone), frequency, seed)
    return TimeSeriesDataFrame(DataFrame(jdf, session))
