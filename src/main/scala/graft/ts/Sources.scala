package graft.ts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.StructType

/**
 * Sources (≙ CSV.from, TimeSeriesRDD.fromParquet, ReadBuilder, Clocks,
 * TimeSeriesGenerator — /root/reference/src/main/scala/com/twosigma/flint/timeseries/
 * {CSV.scala:91-163, TimeSeriesRDD.scala:400-461, Clocks.scala:44-89,
 * TimeSeriesGenerator.scala:68-122}).
 *
 * All readers delegate to Spark's native sources, so column pruning and
 * predicate (incl. time-range) pushdown reach the scan for free — the
 * reference hand-rolled both (TimeSeriesRDD.scala:381-383 notes the 10x
 * column-pruning win; here `.select` + `.filter` does it via Catalyst).
 */
object Sources {
  import TimeSeriesOps.TimeColumn

  /** CSV → canonical time-series frame (≙ CSV.from). */
  def fromCSV(spark: SparkSession, path: String, header: Boolean = true,
              delimiter: String = ",", schema: Option[StructType] = None,
              timeCol: String = TimeColumn, unitToNanos: Long = 1L,
              sorted: Boolean = false): DataFrame = {
    var r = spark.read.option("header", header.toString).option("delimiter", delimiter)
    val df = schema match {
      case Some(s) => r.schema(s).csv(path)
      case None => r.option("inferSchema", "true").csv(path)
    }
    val canon = TimeSeriesOps.canonize(df, timeCol, unitToNanos)
    if (sorted) canon else TimeSeriesOps.orderByTime(canon)
  }

  /** Parquet scan with optional column list and [begin, end) time range
    * (≙ fromParquet). Both the projection and the range filter reach the
    * parquet reader (PushedFilters / ReadSchema) via Catalyst. */
  def fromParquet(spark: SparkSession, path: String, columns: Seq[String] = Seq.empty,
                  beginNanos: Option[Long] = None, endNanos: Option[Long] = None,
                  timeCol: String = TimeColumn, unitToNanos: Long = 1L): DataFrame = {
    var df = spark.read.parquet(path)
    if (columns.nonEmpty) {
      val keep = (timeCol +: columns.filter(_ != timeCol)).distinct
      df = df.select(keep.map(F.col): _*)
    }
    // Filter on the raw column *before* canonizing so the predicate lands on
    // the parquet scan (row-group min/max pruning), then canonize.
    val canon = TimeSeriesOps.canonize(df, timeCol, unitToNanos)
    (beginNanos, endNanos) match {
      case (Some(b), Some(e)) => TimeSeriesOps.between(canon, b, e)
      case (Some(b), None) => canon.filter(F.col(TimeColumn) >= b)
      case (None, Some(e)) => canon.filter(F.col(TimeColumn) < e)
      case _ => canon
    }
  }

  /** Knuth multiplicative constant for the portable jitter/value hash. */
  private val HashMult = 2654435761L

  /** Randomly spaced clock (≙ Clocks.random): uniform ticks jittered by up
    * to one period. The jitter is a seeded multiplicative hash rather than
    * `F.rand(seed)`: rand's sequence is engine-implementation-defined,
    * while `(i*c + seed) mod step` is reproducible anywhere — same
    * determinism contract as the reference's seeded clock. */
  def randomClock(spark: SparkSession, beginNanos: Long, endNanos: Long,
                  frequency: String, seed: Long = 42L): DataFrame = {
    val step = TimeSeriesOps.parseDuration(frequency)
    require(step > 0 && endNanos >= beginNanos, "invalid clock range")
    val n = (endNanos - beginNanos) / step + 1
    val jitter = F.pmod(F.col("id") * HashMult + seed, F.lit(step))
    spark.range(n)
      .select((F.lit(beginNanos) + F.col("id") * step + jitter).as(TimeColumn))
      .filter(F.col(TimeColumn) <= endNanos)
  }

  /** Deterministic pseudo-random test data (≙ TimeSeriesGenerator): `ids`
    * per cycle at `frequency` spacing; value columns in [0, 1) from a
    * seeded multiplicative hash of (cycle, id, column) — portable across
    * engines, bounded operands (no long overflow). */
  def timeSeries(spark: SparkSession, beginNanos: Long, endNanos: Long,
                 frequency: String, ids: Seq[Int], valueColumns: Seq[String],
                 seed: Long = 42L): DataFrame = {
    val step = TimeSeriesOps.parseDuration(frequency)
    val n = (endNanos - beginNanos) / step + 1
    val base = spark.range(n)
      .select(F.col("id").as("__cycle"),
        (F.lit(beginNanos) + F.col("id") * step).as(TimeColumn))
      .crossJoin(spark.createDataFrame(ids.map(Tuple1(_))).toDF("id"))
    valueColumns.zipWithIndex.foldLeft(base) { case (df, (c, j)) =>
      val h = F.pmod((F.col("__cycle") * 131 + F.col("id") * 7 + seed + j),
        F.lit(1000000L))
      df.withColumn(c, F.pmod(h * HashMult, F.lit(1000000L)) / 1000000.0)
    }.drop("__cycle")
  }
}
