"""graft: Python binding for the graft Spark time-series / training-data
analytics engine (the Scala library in this repository).

Mirrors the surface of the reference Python binding
(/root/reference/python/ts/flint/) over our Scala API: a
``TimeSeriesDataFrame`` wrapper around ``pyspark.sql.DataFrame``, a
``summarizers`` module of aggregate factories, ``clocks``, and
``multimodal`` (mapInPandas plumbing for binary media columns).

All JVM calls go through the single py4j facade
``graft.python.PyApi`` (src/main/scala/graft/python/PyApi.scala); the
Scala classes must be on the driver classpath, e.g.::

    spark = (SparkSession.builder
        .config("spark.driver.extraClassPath", "/path/to/graft/classes")
        .getOrCreate())
"""

from .dataframe import TimeSeriesDataFrame, lsh_planes
from .functions import udf
from .readwriter import read
from . import summarizers, clocks, multimodal, functions, readwriter, \
    text, windows

__all__ = ["TimeSeriesDataFrame", "lsh_planes", "udf", "read",
           "summarizers", "clocks", "multimodal", "functions", "readwriter",
           "text", "windows"]
