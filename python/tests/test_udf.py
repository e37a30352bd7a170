"""Pandas/numpy columnar-UDF surface (graft.udf): results must match the
Scala summarizer path on the same data — the equivalence the reference's
udf suite checks (/root/reference/python/tests/ts/flint/test_udf.py style).

Run from the repo root after `sbt compile`:

    python3 -m pytest python/tests/test_udf.py -q
"""

import pytest
from pyspark.sql.types import DoubleType, LongType

from graft import TimeSeriesDataFrame, summarizers, udf, clocks


DAY = 86400 * 10**9


@pytest.fixture(scope="module")
def frame(spark):
    rows = [(i * DAY // 4, "ab"[i % 2], float(i % 7) + 0.5, float(i))
            for i in range(40)]
    return TimeSeriesDataFrame.from_df(spark.createDataFrame(
        rows, "time long, k string, v double, w double"))


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _approx_eq(a, b, tol=1e-9):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert len(ra) == len(rb)
        for va, vb in zip(ra, rb):
            if isinstance(va, float):
                assert abs(va - vb) <= tol, (ra, rb)
            else:
                assert va == vb, (ra, rb)


# -------------------------------------------------------- summarize_cycles

def test_cycles_udf_matches_scala_mean(frame):
    @udf(DoubleType())
    def mean(v):
        return v.mean()

    got = frame.summarize_cycles({"v_mean": mean(frame["v"])}, key=["k"])
    want = frame.summarize_cycles(summarizers.mean("v"), key=["k"])
    _approx_eq(_rows(got, ["time", "k", "v_mean"]),
               _rows(want, ["time", "k", "v_mean"]))


def test_cycles_udf_weighted_mean_multiarg(frame):
    import numpy

    @udf(DoubleType())
    def weighted_mean(v, w):
        return numpy.average(v, weights=w)

    filtered = TimeSeriesDataFrame(frame.where("w > 0"))
    got = filtered.summarize_cycles(
        {"wm": weighted_mean(frame["v"], frame["w"])}, key=["k"])
    # independent pandas computation
    pdf = filtered.toPandas()
    want = sorted(
        (t, k, numpy.average(g["v"], weights=g["w"]))
        for (t, k), g in pdf.groupby(["time", "k"]))
    _approx_eq(_rows(got, ["time", "k", "wm"]), want)


def test_cycles_udf_dataframe_input_and_tuple_output(frame):
    @udf((DoubleType(), LongType()))
    def span_and_n(sub):
        return float(sub["v"].max() - sub["v"].min()), len(sub)

    got = frame.summarize_cycles(
        {("span", "n"): span_and_n(frame[["v", "w"]])}, key=["k"])
    want = frame.summarize_cycles(
        summarizers.compose(summarizers.max("v"), summarizers.min("v"),
                            summarizers.count()), key=["k"])
    want_rows = sorted(
        (r["time"], r["k"], r["v_max"] - r["v_min"], r["count"])
        for r in want.collect())
    _approx_eq(_rows(got, ["time", "k", "span", "n"]), want_rows)


def test_cycles_numpy_arg_type(frame):
    import numpy

    @udf(DoubleType(), arg_type="numpy")
    def np_mean(v):
        assert isinstance(v, numpy.ndarray)
        return float(v.mean())

    got = frame.summarize_cycles({"v_mean": np_mean(frame["v"])}, key=["k"])
    want = frame.summarize_cycles(summarizers.mean("v"), key=["k"])
    _approx_eq(_rows(got, ["time", "k", "v_mean"]),
               _rows(want, ["time", "k", "v_mean"]))


def test_cycles_udf_keyless(frame):
    @udf(DoubleType())
    def total(v):
        return v.sum()

    got = frame.summarize_cycles({"v_sum": total(frame["v"])})
    want = frame.summarize_cycles(summarizers.sum("v"))
    _approx_eq(_rows(got, ["time", "v_sum"]), _rows(want, ["time", "v_sum"]))


# ----------------------------------------------------- summarize_intervals

def test_intervals_udf_matches_scala(spark, frame):
    clock = clocks.uniform(spark, 0, 10 * DAY, "2d")

    @udf(DoubleType())
    def mean(v):
        return v.mean()

    got = frame.summarize_intervals(clock, {"v_mean": mean(frame["v"])},
                                    key=["k"])
    want = frame.summarize_intervals(clock, summarizers.mean("v"), key=["k"])
    _approx_eq(_rows(got, ["time", "k", "v_mean"]),
               _rows(want, ["time", "k", "v_mean"]))


@pytest.mark.parametrize("inclusion,rounding",
                         [("begin", "begin"), ("end", "end")])
def test_intervals_udf_inclusion_rounding(spark, frame, inclusion, rounding):
    clock = clocks.uniform(spark, 0, 10 * DAY, "3d")

    @udf(DoubleType())
    def vsum(v):
        return v.sum()

    got = frame.summarize_intervals(clock, {"v_sum": vsum(frame["v"])},
                                    key=["k"], inclusion=inclusion,
                                    rounding=rounding)
    want = frame.summarize_intervals(clock, summarizers.sum("v"), key=["k"],
                                     inclusion=inclusion, rounding=rounding)
    _approx_eq(_rows(got, ["time", "k", "v_sum"]),
               _rows(want, ["time", "k", "v_sum"]))


# ------------------------------------------------------- summarize_windows

def test_windows_udf_matches_scala_past(frame):
    @udf(DoubleType())
    def mean(v):
        return v.mean()

    got = frame.summarize_windows({"v_mean": mean(frame["v"])},
                                  past="1d", key=["k"])
    want = frame.summarize_windows(summarizers.mean("v"), past="1d",
                                   key=["k"])
    _approx_eq(_rows(got, ["time", "k", "v", "v_mean"]),
               _rows(want, ["time", "k", "v", "v_mean"]))


def test_windows_udf_matches_scala_future(frame):
    @udf(DoubleType())
    def vsum(v):
        return v.sum()

    got = frame.summarize_windows({"v_sum": vsum(frame["v"])},
                                  future="2d", key=["k"])
    want = frame.summarize_windows(summarizers.sum("v"), future="2d",
                                   key=["k"])
    _approx_eq(_rows(got, ["time", "k", "v", "v_sum"]),
               _rows(want, ["time", "k", "v", "v_sum"]))


def test_windows_numpy_arg_type(frame):
    import numpy

    @udf(DoubleType(), arg_type="numpy")
    def np_sum(v):
        assert isinstance(v, numpy.ndarray)
        return float(v.sum())

    got = frame.summarize_windows({"v_sum": np_sum(frame["v"])},
                                  past="1d", key=["k"])
    want = frame.summarize_windows(summarizers.sum("v"), past="1d",
                                   key=["k"])
    _approx_eq(_rows(got, ["time", "k", "v", "v_sum"]),
               _rows(want, ["time", "k", "v", "v_sum"]))


# --------------------------------------------------- add_columns_for_cycle

def test_add_columns_for_cycle_udf_dict(frame):
    @udf(DoubleType())
    def pct_rank(v):
        return v.rank(pct=True)

    got = frame.add_columns_for_cycle({"rank": pct_rank(frame["v"])},
                                      key=["k"])
    assert got.columns == ["time", "k", "v", "w", "rank"]
    # every cycle's ranks are within (0, 1] and the max is 1.0
    pdf = got.toPandas()
    for _, g in pdf.groupby(["time", "k"]):
        assert (g["rank"] > 0).all() and abs(g["rank"].max() - 1.0) < 1e-12


def test_add_columns_for_cycle_udf_matches_raw_callable(frame):
    @udf(DoubleType())
    def share(v):
        return v / v.sum()

    got = frame.add_columns_for_cycle({"share": share(frame["v"])},
                                      key=["k"])

    def raw(pdf):
        pdf = pdf.copy()
        pdf["share"] = pdf["v"] / pdf["v"].sum()
        return pdf

    want = frame.add_columns_for_cycle(
        raw, "time long, k string, v double, w double, share double",
        key=["k"])
    _approx_eq(_rows(got, ["time", "k", "v", "share"]),
               _rows(want, ["time", "k", "v", "share"]))


# ----------------------------------------------------------------- errors

def test_derived_expression_input_rejected(frame):
    @udf(DoubleType())
    def mean(v):
        return v.mean()

    with pytest.raises(ValueError, match="plain column references"):
        mean(frame["v"] + 1)


def test_tuple_name_return_type_mismatch(frame):
    @udf(DoubleType())
    def mean(v):
        return v.mean()

    with pytest.raises(ValueError, match="return types"):
        frame.summarize_cycles({("a", "b"): mean(frame["v"])}, key=["k"])
