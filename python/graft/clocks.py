"""Clock tables (≙ /root/reference/python/ts/flint/clocks.py)."""

from pyspark.sql import DataFrame

from .dataframe import TimeSeriesDataFrame


def uniform(session, begin_nanos, end_nanos, frequency):
    """Evenly spaced time-only table over [begin, end] step frequency."""
    jdf = session._jvm.graft.python.PyApi.uniformClock(
        session._jsparkSession, begin_nanos, end_nanos, frequency)
    return TimeSeriesDataFrame(DataFrame(jdf, session))


def random(session, begin_nanos, end_nanos, frequency, seed=42):
    """Jittered clock; deterministic for a given seed on any engine."""
    jdf = session._jvm.graft.python.PyApi.randomClock(
        session._jsparkSession, begin_nanos, end_nanos, frequency, seed)
    return TimeSeriesDataFrame(DataFrame(jdf, session))
