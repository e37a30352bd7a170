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

    def _bounds(self, begin=None, end=None, timezone="UTC"):
        """Effective [begin, end) after expand. Per-call ``begin``/``end``
        override the configured range WITHOUT mutating the reader (builder
        terminals are side-effect free)."""
        b = _to_nanos(begin, timezone) if begin is not None else self._begin
        e = _to_nanos(end, timezone) if end is not None else self._end
        if b is not None:
            b -= self._expand_begin
        if e is not None:
            e += self._expand_end
        return b, e

    def _api(self):
        return self._spark._jvm.graft.python.PyApi

    def _okv(self, opts):
        return (_jlist(self._spark, list(opts.keys())),
                _jlist(self._spark, list(opts.values())))

    def _ranged(self, ts, b, e):
        # mirrors the Scala rangeFilter: true one-sided filters when only
        # one bound is set (never a +/-2**62 sentinel, which would silently
        # drop far-future/past rows)
        if b is not None and e is not None:
            return ts.between(b, e)
        if b is not None:
            return TimeSeriesDataFrame(ts.where(ts["time"] >= b))
        if e is not None:
            return TimeSeriesDataFrame(ts.where(ts["time"] < e))
        return ts

    def parquet(self, path):
        b, e = self._bounds()
        ok, ov = self._okv(self._opts)
        jdf = self._api().fromParquet(
            self._spark._jsparkSession, path,
            _jlist(self._spark, self._cols), b, e, self._time, self._unit,
            ok, ov)
        return TimeSeriesDataFrame(DataFrame(jdf, self._spark))

    def time_partitioned(self, path, granularity=None):
        """Read a write_time_partitioned store with the configured
        range/expand/columns (directory-level bucket pruning applies).
        ``granularity`` defaults to the store's persisted metadata; an
        explicit mismatch fails loudly."""
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
        b, e = self._bounds()
        out = self._ranged(TimeSeriesDataFrame(DataFrame(jdf, self._spark)),
                           b, e)
        if self._cols:
            out = out.keep_columns(*self._cols)
        return out

    def jsonl(self, path):
        """Read a JSON-lines corpus (one JSON document per line — the
        standard LLM-corpus interchange format). Canonizes and
        time-orders only when the configured time column exists in the
        data; document corpora without one pass through untouched, with
        ``columns(...)`` applied as a plain projection. The range filter
        keys on whether canonization HAPPENED (reported by the JVM side),
        never on a column merely named ``time`` — a raw un-canonized
        column of that name must not be compared against nanos bounds."""
        ok, ov = self._okv(self._opts)
        res = self._api().fromJsonlWithStatus(
            self._spark._jsparkSession, path, self._time, self._unit,
            ok, ov)
        jdf, canonized = res[0], bool(res[1])
        out = TimeSeriesDataFrame(DataFrame(jdf, self._spark))
        if canonized:
            b, e = self._bounds()
            out = self._ranged(out, b, e)
            if self._cols:
                out = out.keep_columns(*self._cols)
        elif self._cols:
            out = TimeSeriesDataFrame(
                DataFrame(jdf, self._spark).select(*self._cols))
        return out

    def dataframe(self, df, begin=None, end=None, timezone="UTC"):
        """Ingest an existing DataFrame (≙ reader.dataframe): canonize the
        configured time column, then apply the configured (or per-call)
        range/expand and column projection without mutating the reader
        (reader ``option``s don't apply to an in-memory frame and are
        ignored here)."""
        out = TimeSeriesDataFrame.from_df(df, time_column=self._time,
                                          unit_to_nanos=self._unit)
        b, e = self._bounds(begin, end, timezone)
        out = self._ranged(out, b, e)
        if self._cols:
            out = out.keep_columns(*self._cols)
        return out

    def clock(self, frequency, begin=None, end=None, offset="0ns", seed=None,
              timezone="UTC"):
        """Uniform (or, with a seed, jittered) clock over the configured (or
        per-call) [begin, end] bounds; ``offset`` shifts the first tick by
        ``offset % frequency`` (reference semantics), ticks stay <= end."""
        from . import clocks
        b, e = self._bounds(begin, end, timezone)
        if b is None or e is None:
            raise ValueError("clock() needs bounds: pass begin/end or "
                             "configure .range() first")
        if seed is None:
            return clocks.uniform(self._spark, b, e, frequency, offset=offset)
        off = clocks._offset_nanos(offset, frequency)
        if b + off > e:
            return TimeSeriesDataFrame(
                self._spark.range(0).selectExpr("id AS time"))
        return clocks.random(self._spark, b + off, e, frequency, seed=seed)
