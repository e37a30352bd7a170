"""Summarizer factories (≙ /root/reference/python/ts/flint/summarizers.py).

Each factory returns a lazy :class:`Summarizer` spec; the JVM object is
materialized against the active session when the query runs, so specs can
be built before a SparkSession exists and reused across sessions.
"""


class Summarizer:
    def __init__(self, build):
        self._build = build  # session -> jvm graft.ts.Summarizer

    def _jsum(self, session):
        return self._build(session)

    def where(self, sql_predicate):
        """Pre-filter rows entering the aggregate (SQL predicate string)."""
        return Summarizer(lambda s: s._jvm.graft.python.PyApi.where(
            self._build(s), sql_predicate))

    def prefix(self, p):
        """Prefix all output column names."""
        return Summarizer(lambda s: s._jvm.graft.python.PyApi.prefix(
            self._build(s), p))

    def __add__(self, other):
        """Compose two summarizers (multiple aggregates in one pass)."""
        return compose(self, other)


def _factory(name, *args):
    def build(session):
        api = session._jvm.graft.python.PyApi
        return getattr(api, name)(*args)
    return Summarizer(build)


def _jstrings(session, items):
    jl = session._jvm.java.util.ArrayList()
    for x in items:
        jl.add(x)
    return jl


def count(col=None):
    return _factory("countCol", col) if col else _factory("count")


def sum(col): return _factory("sum", col)                      # noqa: A001
def kahan_sum(col): return _factory("kahanSum", col)
def mean(col): return _factory("mean", col)
def variance(col): return _factory("variance", col)
def variance_stable(col): return _factory("varianceStable", col)
def stddev(col): return _factory("stddev", col)
def stddev_stable(col): return _factory("stddevStable", col)
def min(col): return _factory("min", col)                      # noqa: A001
def max(col): return _factory("max", col)                      # noqa: A001
def product(col): return _factory("product", col)
def dot_product(x, y): return _factory("dotProduct", x, y)
def geometric_mean(col): return _factory("geometricMean", col)
def covariance(x, y): return _factory("covariance", x, y)
def covariance_stable(x, y): return _factory("covarianceStable", x, y)
def correlation_stable(x, y): return _factory("correlationStable", x, y)
def weighted_covariance(x, y, w): return _factory("weightedCovariance", x, y, w)
def weighted_correlation(x, y, w): return _factory("weightedCorrelation", x, y, w)
def weighted_mean_test(x, w): return _factory("weightedMeanTest", x, w)
def z_score(col, include_current): return _factory("zScore", col, include_current)
def z_score_stable(col, include_current):
    return _factory("zScoreStable", col, include_current)
def nth_moment(col, n): return _factory("nthMoment", col, n)
def nth_central_moment(col, n): return _factory("nthCentralMoment", col, n)
def skewness(col): return _factory("skewness", col)
def kurtosis(col): return _factory("kurtosis", col)
def moments_state(col): return _factory("momentsState", col)


def state_of(summarizer):
    """Raw algebraic state of ANY summarizer recipe, as state_0..state_k
    (the distinct base aggregates the recipe registers)."""
    return Summarizer(lambda s: s._jvm.graft.python.PyApi.stateOf(
        summarizer._jsum(s)))


def ols_state(y, xs, weight=None):
    """OLS normal-equation buffer (Gram upper triangle + moment vector) as
    plain distributable sums."""
    return Summarizer(lambda s: s._jvm.graft.python.PyApi.olsState(
        y, _jstrings(s, list(xs)), weight or ""))


def correlation(*cols):
    """correlation(x, y) or correlation(c1, c2, c3, ...) for all pairs."""
    if len(cols) == 2:
        return _factory("correlation", cols[0], cols[1])
    return Summarizer(lambda s: s._jvm.graft.python.PyApi.correlationPairs(
        _jstrings(s, list(cols))))


def quantile(col, probabilities):
    def build(session):
        jl = session._jvm.java.util.ArrayList()
        for p in probabilities:
            jl.add(float(p))
        return session._jvm.graft.python.PyApi.quantile(col, jl)
    return Summarizer(build)


def approx_quantile(col, probabilities, accuracy=10000):
    """Bounded-memory approximate quantiles (the scale path; same output
    names as :func:`quantile`, not bit-exact)."""
    def build(session):
        jl = session._jvm.java.util.ArrayList()
        for p in probabilities:
            jl.add(float(p))
        return session._jvm.graft.python.PyApi.approxQuantile(
            col, jl, accuracy)
    return Summarizer(build)


def ols_regression(y, xs, weight=None):
    return Summarizer(lambda s: s._jvm.graft.python.PyApi.olsRegression(
        y, _jstrings(s, list(xs)), weight or ""))


def distinct_count(col):
    """Exact distinct-value count (two-stage distinct aggregate)."""
    return _factory("distinctCount", col)


def approx_distinct_count(col, rsd=0.05):
    """HyperLogLog++ approximate distinct count — the constant-state
    100 TB path for unbounded-cardinality columns."""
    return Summarizer(lambda s: s._jvm.graft.python.PyApi.approxDistinctCount(
        col, float(rsd)))


def rows(cols):
    return Summarizer(lambda s: s._jvm.graft.python.PyApi.rows(
        _jstrings(s, list(cols))))


def arrow(cols):
    """Group rows as one Arrow IPC stream (column ``arrow_bytes``).

    Decode with ``pyarrow.ipc.open_stream(row.arrow_bytes).read_all()``.
    """
    return Summarizer(lambda s: s._jvm.graft.python.PyApi.arrow(
        _jstrings(s, list(cols))))


def compose(*summarizers):
    def build(session):
        jl = session._jvm.java.util.ArrayList()
        for x in summarizers:
            jl.add(x._jsum(session))
        return session._jvm.graft.python.PyApi.compose(jl)
    return Summarizer(build)


def stack(*summarizers):
    """Same-schema summarizers as one array-of-structs column ``stack``."""
    def build(session):
        jl = session._jvm.java.util.ArrayList()
        for x in summarizers:
            jl.add(x._jsum(session))
        return session._jvm.graft.python.PyApi.stack(jl)
    return Summarizer(build)
