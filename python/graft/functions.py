"""Columnar (pandas/numpy) user-defined functions for the cycle / interval /
window aggregation modes (mirrors the reference's ``@udf(arg_type='pandas' |
'numpy')`` surface, /root/reference/python/ts/flint/functions.py:35-196 and
udf.py:23-107, re-expressed over Spark's NATIVE Arrow exchange: every
evaluation path below runs through ``GroupedData.applyInPandas``, so batching,
Arrow serialization and schema checks are Spark's own — no custom pickling or
py4j row shipping).

Usage::

    from graft import udf
    from pyspark.sql.types import DoubleType

    @udf(DoubleType())
    def weighted_mean(v, w):          # pandas.Series inputs
        return numpy.average(v, weights=w)

    df.summarize_cycles({'wm': weighted_mean(df['v'], df['w'])})

Input forms (same contract as the reference):

- ``my_udf(df['v'], df['w'])`` — each arg a plain column reference; the
  function receives one ``pandas.Series`` per arg (``numpy.ndarray`` for
  ``arg_type='numpy'``).
- ``my_udf(df[['v', 'w']])`` — a DataFrame arg; the function receives a
  ``pandas.DataFrame`` (an ``OrderedDict`` of name -> ndarray for numpy).

Output forms:

- scalar per group (``summarize_cycles`` / ``summarize_intervals`` /
  ``summarize_windows``), or a ``pandas.Series`` aligned with the cycle
  (``add_columns_for_cycle``);
- a dict key may be a tuple of names paired with a tuple returnType, for
  functions returning one value per name.
"""

import functools
import re
from collections import OrderedDict

from pyspark.sql import Column, DataFrame
from pyspark.sql.types import DataType, DoubleType, LongType, StructField, \
    StructType

__all__ = ["udf"]


class BoundColumnarUdf:
    """A columnar UDF bound to concrete input columns (the value stored in
    the dict passed to summarize_cycles & friends)."""

    def __init__(self, fn, return_types, arg_type, args):
        self.fn = fn
        self.return_types = return_types
        self.arg_type = arg_type
        self.args = args  # list of ("col", name) | ("df", [names])

    def input_args(self, pdf):
        """Materialize this udf's inputs from a cycle/window pandas frame."""
        vals = []
        for kind, spec in self.args:
            if kind == "col":
                s = pdf[spec]
                vals.append(s.to_numpy() if self.arg_type == "numpy" else s)
            elif self.arg_type == "numpy":
                vals.append(OrderedDict(
                    (c, pdf[c].to_numpy()) for c in spec))
            else:
                vals.append(pdf[list(spec)])
        return vals

    def input_columns(self):
        cols = []
        for kind, spec in self.args:
            cols.extend([spec] if kind == "col" else spec)
        return cols


class ColumnarUdf:
    """The unbound result of ``@udf(...)``; calling it with columns returns a
    :class:`BoundColumnarUdf`."""

    def __init__(self, fn, return_types, arg_type):
        if arg_type not in ("pandas", "numpy"):
            raise ValueError("arg_type must be 'pandas' or 'numpy', got %r"
                             % (arg_type,))
        for t in return_types:
            if not isinstance(t, DataType):
                raise TypeError("returnType must be DataType(s), got %r" % (t,))
        self.fn = fn
        self.return_types = return_types
        self.arg_type = arg_type
        functools.update_wrapper(self, fn)

    def __call__(self, *cols):
        return BoundColumnarUdf(self.fn, self.return_types, self.arg_type,
                                [_arg_spec(c) for c in cols])


def udf(f=None, returnType=DoubleType(), arg_type="pandas"):
    """Columnar UDF decorator: ``@udf``, ``@udf(DoubleType())``,
    ``@udf((DoubleType(), LongType()))`` or ``@udf(..., arg_type='numpy')``.

    Unlike ``pyspark.sql.functions.udf`` (row-at-a-time), these evaluate one
    cycle / interval / window per call over Arrow batches."""
    def make(fn, rt, at):
        rts = list(rt) if isinstance(rt, (list, tuple)) else [rt]
        return ColumnarUdf(fn, rts, at)

    if f is None or isinstance(f, (DataType, tuple, list)):
        rt = returnType if f is None else f
        return functools.partial(make, rt=rt, at=arg_type)
    return make(f, returnType, arg_type)


def _arg_spec(col):
    if isinstance(col, str):
        return ("col", col)
    if isinstance(col, DataFrame):
        return ("df", list(col.columns))
    if isinstance(col, Column):
        # Plain attribute references only: derived expressions have no
        # stable name to fetch from the grouped pandas frame. A reference's
        # string form is its (possibly backticked / qualified) name; any
        # operator output renders as e.g. "(v + 1)" and is rejected.
        s = str(col._jc)
        name = s[1:-1] if s.startswith("`") and s.endswith("`") else s
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            return ("col", name)
        raise ValueError(
            "columnar udf inputs must be plain column references like "
            "df['v'] (or df[['v','w']] / a column-name string); got "
            "expression %s" % s)
    raise TypeError("unsupported udf input: %r" % (col,))


_DUR = re.compile(r"^\s*(\d+)\s*(ns|us|ms|s|min|m|h|d)\s*$")
_DUR_NANOS = {"ns": 1, "us": 10**3, "ms": 10**6, "s": 10**9,
              "m": 60 * 10**9, "min": 60 * 10**9,
              "h": 3600 * 10**9, "d": 86400 * 10**9}


def parse_nanos(duration):
    """'30m' / '1d' / '250ns' -> nanos (the Scala parseDuration subset)."""
    m = _DUR.match(duration)
    if not m:
        raise ValueError("cannot parse duration %r" % (duration,))
    return int(m.group(1)) * _DUR_NANOS[m.group(2)]


# ------------------------------------------------------- evaluation plumbing
#
# Everything below is called by TimeSeriesDataFrame; not public API.

def normalize_entries(columns):
    """{name | (names...): BoundColumnarUdf} -> [((names...), bound)...]."""
    entries = []
    for k, bound in columns.items():
        names = (k,) if isinstance(k, str) else tuple(k)
        if not isinstance(bound, BoundColumnarUdf):
            raise TypeError(
                "expected a bound @graft.udf call (e.g. my_udf(df['v'])) for "
                "%r, got %r" % (k, bound))
        if len(names) != len(bound.return_types):
            raise ValueError(
                "output names %r need %d return types, got %d"
                % (names, len(names), len(bound.return_types)))
        entries.append((names, bound))
    return entries


def summarize_schema(df_schema, key, entries):
    """time + key columns + one field per udf output name."""
    fields = [StructField("time", LongType(), False)]
    fields += [df_schema[k] for k in key]
    for names, bound in entries:
        fields += [StructField(n, t, True)
                   for n, t in zip(names, bound.return_types)]
    return StructType(fields)


def appended_schema(df_schema, entries):
    """All input columns + one field per udf output name."""
    fields = list(df_schema.fields)
    for names, bound in entries:
        fields += [StructField(n, t, True)
                   for n, t in zip(names, bound.return_types)]
    return StructType(fields)


def cycle_summarize_fn(key, entries):
    """applyInPandas fn: one cycle in -> one summary row out."""
    import pandas as pd

    def fn(pdf):
        row = {"time": [pdf["time"].iloc[0]]}
        for k in key:
            row[k] = [pdf[k].iloc[0]]
        for names, bound in entries:
            res = bound.fn(*bound.input_args(pdf))
            if len(names) == 1:
                res = (res,)
            for n, v in zip(names, res):
                row[n] = [v]
        return pd.DataFrame(row)
    return fn


def cycle_append_fn(entries):
    """applyInPandas fn: one cycle in -> the cycle + new columns out."""
    def fn(pdf):
        out = pdf.copy()
        for names, bound in entries:
            res = bound.fn(*bound.input_args(pdf))
            if len(names) == 1:
                res = (res,)
            for n, v in zip(names, res):
                out[n] = getattr(v, "values", v)
        return out
    return fn


def window_append_fn(entries, past_nanos=None, future_nanos=None):
    """applyInPandas fn over one KEY GROUP: every row gets the udf values of
    its own absolute-time window [t-past, t] or [t, t+future] (inclusive
    bounds, matching Windows.pastAbsoluteTime / futureAbsoluteTime)."""
    import numpy as np

    def fn(pdf):
        pdf = pdf.sort_values("time", kind="mergesort").reset_index(drop=True)
        t = pdf["time"].to_numpy()
        if past_nanos is not None:
            lo = np.searchsorted(t, t - past_nanos, side="left")
            hi = np.searchsorted(t, t, side="right")
        else:
            lo = np.searchsorted(t, t, side="left")
            hi = np.searchsorted(t, t + future_nanos, side="right")
        cols = {n: [] for names, _ in entries for n in names}
        for i in range(len(pdf)):
            w = pdf.iloc[lo[i]:hi[i]]
            for names, bound in entries:
                res = bound.fn(*bound.input_args(w))
                if len(names) == 1:
                    res = (res,)
                for n, v in zip(names, res):
                    cols[n].append(v)
        out = pdf.copy()
        for n, vs in cols.items():
            out[n] = vs
        return out
    return fn
