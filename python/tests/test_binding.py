"""Integration test for the Python binding: drives the Scala engine
through graft.python.PyApi and checks results against hand-computed
expectations (mirrors /root/reference/python/tests/ts/flint/
test_dataframe_api.py's style: tiny inline datasets, exact asserts).

Run from the repo root after `sbt compile`:

    python3 python/tests/test_binding.py
"""

import os
import sys

_pkg_dir = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _pkg_dir)
# python workers (mapInPandas) must also resolve the graft package
os.environ["PYTHONPATH"] = _pkg_dir + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import SparkSession  # noqa: E402

import graft  # noqa: E402
from graft import TimeSeriesDataFrame, summarizers, clocks, multimodal  # noqa: E402

CLASSES = os.path.join(os.path.dirname(__file__), "..", "..",
                       "target", "scala-2.13", "classes")

spark = (SparkSession.builder
         .master("local[2]")
         .appName("graft-python-binding-test")
         .config("spark.driver.extraClassPath", os.path.abspath(CLASSES))
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("WARN")

failures = []


def check(name, cond):
    print(("PASS " if cond else "FAIL ") + name)
    if not cond:
        failures.append(name)


# ---------------------------------------------------------- canonize + ops
df = spark.createDataFrame(
    [(10, "a", 1.0), (30, "a", 3.0), (20, "b", 2.0)], "t long, k string, v double")
ts = TimeSeriesDataFrame.from_df(df, time_column="t")
check("canonize renames and fronts time", ts.columns[0] == "time")
check("between is [b, e)",
      ts.between(10, 30).count() == 2)
check("keep_columns retains time",
      ts.keep_columns("v").columns == ["time", "v"])
check("shift moves time",
      ts.shift("5ns").select("time").rdd.map(lambda r: r[0]).min() == 15)
sorted_ts = TimeSeriesDataFrame.from_df(df, time_column="t", is_sorted=False)
check("from_df is_sorted=False range-sorts",
      [r[0] for r in sorted_ts.select("time").collect()] == [10, 20, 30])
trusted = TimeSeriesDataFrame.from_df(
    spark.createDataFrame([(1, 1.0), (2, 2.0)], "t long, v double"),
    time_column="t", is_sorted=True)
check("from_df is_sorted=True trusts order (no shuffle)",
      "Exchange" not in trusted._jdf.queryExecution().executedPlan().toString())

# ------------------------------------------------------------------ joins
left = TimeSeriesDataFrame.from_df(spark.createDataFrame(
    [(10, "a", 1)], "time long, k string, lv int"))
right = TimeSeriesDataFrame.from_df(spark.createDataFrame(
    [(8, "a", 5), (9, "b", 6)], "time long, k string, rv int"))
j = left.left_join(right, tolerance="5ns", key=["k"]).collect()
check("left_join matches within tolerance",
      len(j) == 1 and j[0]["rv"] == 5)
sj = left.symmetric_join(right, tolerance="5ns", key=["k"])
check("symmetric_join emits a row per input row", sj.count() == 3)

# ------------------------------------------------------------- summarize
s = summarizers.sum("v") + summarizers.count()
agg = ts.summarize(s, key=["k"]).orderBy("k").collect()
check("summarize sum+count per key",
      [(r["k"], r["v_sum"], r["count"]) for r in agg] ==
      [("a", 4.0, 2), ("b", 2.0, 1)])

w = ts.summarize_windows(summarizers.sum("v"), past="10ns").orderBy("time")
check("summarize_windows sliding [t-10, t] sums",
      [r["v_sum"] for r in w.collect()] == [1.0, 3.0, 5.0])

q = ts.summarize(summarizers.quantile("v", [0.5]))
check("quantile median", q.collect()[0][1] == 2.0)

stacked = ts.summarize(summarizers.stack(
    summarizers.sum("v").where("v <= 1.0"),
    summarizers.sum("v").where("v > 1.0")))
row = stacked.collect()[0]["stack"]
check("stack evaluates both branches",
      row[0]["v_sum"] == 1.0 and row[1]["v_sum"] == 5.0)

# ------------------------------------------------------------------ EMA
day = 86400 * 10**9
ema_df = TimeSeriesDataFrame.from_df(spark.createDataFrame(
    [(0, "k", 1.0), (day, "k", 2.0), (2 * day, "k", 3.0)],
    "time long, k string, v double"))
ew = ema_df.ewma("v", key=["k"], alpha=0.5, duration_per_period="constant",
                 convention="legacy").collect()
check("ewma legacy recursion", abs(ew[0]["v_ewma"] - 4.25) < 1e-12)
ewr = ema_df.ewma("v", key=["k"], alpha=0.5, duration_per_period="constant",
                  convention="legacy", per_row=True).orderBy("time").collect()
check("per-row ewma running values",
      [r["v_ewma"] for r in ewr] == [1.0, 2.5, 4.25])

# ---------------------------------------------------------------- clocks
ck = clocks.uniform(spark, 0, 10, "2ns")
check("uniform clock ticks", ck.count() == 6)

# ------------------------------------------------------------- LLM ops
docs = TimeSeriesDataFrame.from_df(spark.createDataFrame(
    [(1, 1, "a b c"), (2, 2, "b a c"), (3, 3, "x y z")],
    "time long, doc_id long, text string"), time_column="time")
dd = docs.exact_dedup("doc_id", "text").orderBy("keep_id").collect()
check("exact_dedup groups normalized duplicates",
      [(r["keep_id"], r["n_dupes"]) for r in dd] == [(1, 2), (3, 1)])

# ------------------------------------------------------ cycle pandas UDF
cyc = TimeSeriesDataFrame.from_df(spark.createDataFrame(
    [(1, "a", 1.0), (1, "a", 3.0), (2, "a", 5.0)], "time long, k string, v double"))


def cycle_share(pdf):
    pdf = pdf.copy()
    pdf["share"] = pdf["v"] / pdf["v"].sum()
    return pdf


shares = cyc.add_columns_for_cycle(
    cycle_share, "time long, k string, v double, share double", key=["k"])
check("add_columns_for_cycle pandas transform",
      sorted(r["share"] for r in shares.collect()) == [0.25, 0.75, 1.0])

# ---------------------------------------------------------- similarity
vecs = TimeSeriesDataFrame.from_df(spark.createDataFrame(
    [(0, 0, [1.0, 0.0]), (1, 1, [1.0, 0.001]), (2, 2, [0.0, 1.0])],
    "time long, vec_id long, embedding array<float>"))
cents = [[1.0, 0.0], [0.0, 1.0]]
dups = vecs.cosine_dup_pairs("vec_id", "embedding", cents, 0.99).collect()
check("cosine_dup_pairs finds the near-identical pair",
      [(r["id_a"], r["id_b"]) for r in dups] == [(0, 1)])
ivf = vecs.ivf_topk(vecs.where("vec_id = 0"), "vec_id", "embedding",
                    cents, k=2, nprobe=2).orderBy("rank").collect()
check("ivf_topk ranks probed candidates",
      [r["n_id"] for r in ivf] == [1, 2])

# ---------------------------------------------------------- streaming API
tw = ts.summarize_tumbling(summarizers.sum("v"), "1 minute", key=["k"])
check("summarize_tumbling on a batch frame",
      {(r["window_start"], r["k"]): r["v_sum"] for r in tw.collect()}
      == {(0, "a"): 4.0, (0, "b"): 2.0})

# ------------------------------------------------- multimodal mapInPandas
mm = spark.createDataFrame(
    [(1, bytearray(b"x" * 300)), (2, bytearray(b"y" * 10))],
    "doc_id long, payload binary")
meta = multimodal.decode(mm).orderBy("doc_id").collect()
check("multimodal decode schema + determinism",
      meta[0]["n_bytes"] == 300 and meta[0]["format"] == "jpeg"
      and meta[1]["n_bytes"] == 10)
feats = multimodal.extract_features(mm, dim=8).collect()
check("multimodal feature batch shape",
      all(len(r["feature"]) == 8 for r in feats))
frames = multimodal.sample_frames(mm, every_n_bytes=128).collect()
check("multimodal frame sampling explodes frames",
      sorted(r["frame_idx"] for r in frames if r["doc_id"] == 1) == [0, 1, 2])

# ------------------------------------------------------ arrow summarizer
try:
    import pyarrow.ipc as _ipc
    arr = ts.summarize_cycles(summarizers.arrow(["v"]), key=["k"])
    first = arr.orderBy("time", "k").collect()[0]
    tbl = _ipc.open_stream(bytes(first["arrow_bytes"])).read_all()
    check("arrow summarizer bytes readable by pyarrow",
          tbl.schema.names == ["v"] and tbl.num_rows >= 1)
except ImportError:
    print("SKIP arrow summarizer (pyarrow not installed)")

# ------------------------------------------------- portable simhash pairs
sh_docs = TimeSeriesDataFrame.from_df(spark.createDataFrame(
    [(0, 1, "a b c d e f"), (0, 2, "a b c d e f"), (0, 3, "q r s t u v")],
    "time long, doc_id long, text string"))
sh = sh_docs.simhash_pairs("doc_id", "text", max_hamming=0, portable=True)
check("portable simhash pairs identical docs",
      [(r["id_a"], r["id_b"]) for r in sh.collect()] == [(1, 2)])

spark.stop()
if failures:
    print(f"\n{len(failures)} FAILURES: {failures}")
    sys.exit(1)
print("\nall python binding checks passed")
