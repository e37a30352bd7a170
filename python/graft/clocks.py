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


def uniform(session, begin, end, frequency, offset="0ns", time_zone="UTC"):
    """Evenly spaced time-only table over [begin, end] step ``frequency``,
    shifted forward by ``offset`` (≙ flint clocks.uniform's offset)."""
    api = session._jvm.graft.python.PyApi
    jdf = api.uniformClock(session._jsparkSession,
                           _to_nanos(begin, time_zone),
                           _to_nanos(end, time_zone), frequency)
    if offset not in ("0ns", "0s", None):
        jdf = api.shift(jdf, offset, True)
    return TimeSeriesDataFrame(DataFrame(jdf, session))


def random(session, begin, end, frequency, seed=42, time_zone="UTC"):
    """Jittered clock; deterministic for a given seed on any engine."""
    jdf = session._jvm.graft.python.PyApi.randomClock(
        session._jsparkSession, _to_nanos(begin, time_zone),
        _to_nanos(end, time_zone), frequency, seed)
    return TimeSeriesDataFrame(DataFrame(jdf, session))
