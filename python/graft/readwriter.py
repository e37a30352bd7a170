"""Fluent reader (≙ /root/reference/python/ts/flint/readwriter.py's
TSDataFrameReader): ``read(spark).option(...).range(begin, end)
.expand('1d').columns('x').parquet(path)``.

Bounds accept long nanos or pandas-parseable date-time strings (naive
strings localized to the ``timezone`` passed to :meth:`range`); ``expand``
takes duration strings and widens the configured range at read time —
lookback/lookahead slack so an as-of join near the range edges still finds
its matches. Every terminal honors the configured range/expand/columns;
``csv`` additionally honors ``option('header', ...)`` /
``option('delimiter', ...)``.
"""

from pyspark.sql import DataFrame

from .clocks import _to_nanos
from .dataframe import TimeSeriesDataFrame, _jlist
from .functions import parse_nanos


def read(spark):
    """Entry point: a fresh fluent reader bound to ``spark``."""
    return TSDataFrameReader(spark)


class TSDataFrameReader:
    def __init__(self, spark):
        self._spark = spark
        self._opts = {}
        self._begin = None
        self._end = None
        self._expand_begin = 0
        self._expand_end = 0
        self._cols = []
        self._time = "time"
        self._unit = 1

    def option(self, key, value):
        self._opts[key] = str(value)
        return self

    def options(self, **kw):
        for k, v in kw.items():
            self.option(k, v)
        return self

    def range(self, begin=None, end=None, timezone="UTC"):
        """[begin, end) in nanos or date-time strings."""
        if begin is not None:
            self._begin = _to_nanos(begin, timezone)
        if end is not None:
            self._end = _to_nanos(end, timezone)
        return self

    def expand(self, begin=None, end=None):
        """Widen the configured range by durations ('100ms', '1d', ...)."""
        if begin is not None:
            self._expand_begin = parse_nanos(begin)
        if end is not None:
            self._expand_end = parse_nanos(end)
        return self

    def columns(self, *cols):
        self._cols = list(cols)
        return self

    def time(self, col, unit_to_nanos=1):
        """Name and unit of the raw time column (default 'time', nanos)."""
        self._time = col
        self._unit = unit_to_nanos
        return self

    def _bounds(self):
        b = None if self._begin is None else self._begin - self._expand_begin
        e = None if self._end is None else self._end + self._expand_end
        return b, e

    def _api(self):
        return self._spark._jvm.graft.python.PyApi

    def _okv(self, opts):
        return (_jlist(self._spark, list(opts.keys())),
                _jlist(self._spark, list(opts.values())))

    def _ranged(self, ts):
        b, e = self._bounds()
        if b is not None or e is not None:
            ts = ts.between(b if b is not None else -(2**62),
                            e if e is not None else 2**62)
        return ts

    def parquet(self, path):
        b, e = self._bounds()
        ok, ov = self._okv(self._opts)
        jdf = self._api().fromParquet(
            self._spark._jsparkSession, path,
            _jlist(self._spark, self._cols), b, e, self._time, self._unit,
            ok, ov)
        return TimeSeriesDataFrame(DataFrame(jdf, self._spark))

    def time_partitioned(self, path, granularity="1d"):
        """Read a write_time_partitioned store with the configured
        range/expand/columns (directory-level bucket pruning applies)."""
        b, e = self._bounds()
        jdf = self._api().fromTimePartitioned(
            self._spark._jsparkSession, path, granularity,
            _jlist(self._spark, self._cols), b, e)
        return TimeSeriesDataFrame(DataFrame(jdf, self._spark))

    def csv(self, path, header=True, delimiter=","):
        # option('header'/'delimiter') wins over the kwarg defaults — the
        # Scala ReadBuilder honors opts the same way
        h = self._opts.get("header")
        header = (h.strip().lower() == "true") if h is not None else bool(header)
        delimiter = self._opts.get("delimiter", delimiter)
        rest = {k: v for k, v in self._opts.items()
                if k not in ("header", "delimiter")}
        ok, ov = self._okv(rest)
        jdf = self._api().fromCSV(
            self._spark._jsparkSession, path, header, delimiter,
            self._time, self._unit, False, ok, ov)
        out = self._ranged(TimeSeriesDataFrame(DataFrame(jdf, self._spark)))
        if self._cols:
            out = out.keep_columns(*self._cols)
        return out

    def dataframe(self, df, begin=None, end=None, timezone="UTC"):
        """Ingest an existing DataFrame (≙ reader.dataframe): canonize the
        configured time column, then apply the configured range/expand and
        column projection (reader ``option``s don't apply to an in-memory
        frame and are ignored here)."""
        out = TimeSeriesDataFrame.from_df(df, time_column=self._time,
                                          unit_to_nanos=self._unit)
        self.range(begin, end, timezone)
        out = self._ranged(out)
        if self._cols:
            out = out.keep_columns(*self._cols)
        return out

    def clock(self, frequency, begin=None, end=None, offset="0ns", seed=None,
              timezone="UTC"):
        """Uniform (or, with a seed, jittered) clock over the configured (or
        given) [begin, end] bounds; ``offset`` shifts ticks forward."""
        from . import clocks
        self.range(begin, end, timezone)
        b, e = self._bounds()
        if b is None or e is None:
            raise ValueError("clock() needs bounds: pass begin/end or "
                             "configure .range() first")
        if seed is None:
            return clocks.uniform(self._spark, b, e, frequency, offset=offset)
        out = clocks.random(self._spark, b, e, frequency, seed=seed)
        if offset not in ("0ns", "0s", None):
            out = out.shift(offset, forward=True)
        return out
