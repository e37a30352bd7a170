"""Shared pytest fixtures for the graft Python binding suite.

Run from the repo root after `sbt compile`:

    python3 -m pytest python/tests -q
"""

import os
import sys

import pytest

_pkg_dir = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
if _pkg_dir not in sys.path:
    sys.path.insert(0, _pkg_dir)
# python workers (mapInPandas / applyInPandas) must also resolve the package
os.environ["PYTHONPATH"] = _pkg_dir + os.pathsep + os.environ.get(
    "PYTHONPATH", "")

CLASSES = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "..", "target", "scala-2.13", "classes"))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder
         .master("local[2]")
         .appName("graft-python-binding-test")
         .config("spark.driver.extraClassPath", CLASSES)
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    s.sparkContext.setLogLevel("WARN")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ts(spark):
    """The little 3-row (time, k, v) frame most sections share."""
    from graft import TimeSeriesDataFrame
    df = spark.createDataFrame(
        [(10, "a", 1.0), (30, "a", 3.0), (20, "b", 2.0)],
        "t long, k string, v double")
    return TimeSeriesDataFrame.from_df(df, time_column="t")
