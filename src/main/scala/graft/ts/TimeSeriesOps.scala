package graft.ts

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Core time-series surface: a plain `DataFrame` with a canonical `time`
 * column holding `Long` nanoseconds since the epoch, plus the operators the
 * reference exposes on its time-ordered table abstraction
 * (cf. /root/reference/src/main/scala/com/twosigma/flint/timeseries/TimeSeriesRDD.scala:562-1321).
 *
 * Design stance (SURVEY.md §7.1): single representation — no parallel RDD
 * engine, no partition side-metadata. Ordering requirements are expressed
 * declaratively (`repartitionByRange` + `sortWithinPartitions`) so Catalyst
 * sees them and `EnsureRequirements` can elide redundant sorts. All heavy
 * operators are pure DataFrame transformations that scale horizontally:
 * the only shuffles are the declared range/hash partitionings.
 */
object TimeSeriesOps {

  val TimeColumn = "time"

  /** Nanoseconds per unit, for duration strings like "1h", "250ms". */
  def parseDuration(s: String): Long = {
    val d = scala.concurrent.duration.Duration(s)
    require(d.isFinite, s"duration must be finite: $s")
    d.toNanos
  }

  /**
   * Canonize a DataFrame into time-series form: ensure `timeCol` exists,
   * rename it to `time`, convert to Long nanos, move it first.
   * Mirrors the reference's canonizeDF (TimeSeriesRDD.scala:324-356) minus
   * the side-metadata bookkeeping, which Catalyst makes unnecessary.
   *
   * @param unitToNanos multiplier when `timeCol` is already integral
   *                    (e.g. 1L for nanos, 1000000L for millis).
   */
  def canonize(df: DataFrame, timeCol: String = TimeColumn,
               unitToNanos: Long = 1L): DataFrame = {
    val field = df.schema.find(_.name == timeCol)
      .getOrElse(throw new IllegalArgumentException(
        s"no such time column: $timeCol in ${df.schema.fieldNames.mkString(",")}"))
    val timeExpr: Column = field.dataType match {
      case LongType | IntegerType =>
        if (unitToNanos == 1L) col(timeCol).cast(LongType)
        else col(timeCol).cast(LongType) * lit(unitToNanos)
      case TimestampType | TimestampNTZType =>
        // Spark timestamps are micros internally; to nanos.
        unix_micros(col(timeCol).cast(TimestampType)) * lit(1000L)
      case DateType =>
        unix_date(col(timeCol)).cast(LongType) * lit(86400L * 1000000000L)
      case t => throw new IllegalArgumentException(s"unsupported time type: $t")
    }
    val others = df.schema.fieldNames.filter(_ != timeCol).map(col).toSeq
    df.select((timeExpr.as(TimeColumn) +: others): _*)
  }

  /** Long-nanos → TimestampType (micros, truncating), for display/windowing. */
  def nanosToTimestamp(c: Column): Column = timestamp_micros((c / 1000L).cast(LongType))

  /** Inclusive-begin / exclusive-end time-range filter (≙ DFBetween). */
  def between(df: DataFrame, beginNanos: Long, endNanos: Long): DataFrame =
    df.filter(col(TimeColumn) >= beginNanos && col(TimeColumn) < endNanos)

  /**
   * Range-partition by time and sort within partitions — the physical layout
   * every downstream ordered operator wants. One shuffle; Catalyst records
   * the resulting `outputOrdering`/`outputPartitioning` so later sorts fold
   * away. `numPartitions <= 0` uses spark.sql.shuffle.partitions.
   */
  def orderByTime(df: DataFrame, numPartitions: Int = 0): DataFrame = {
    val re = if (numPartitions > 0) df.repartitionByRange(numPartitions, col(TimeColumn))
             else df.repartitionByRange(col(TimeColumn))
    re.sortWithinPartitions(TimeColumn)
  }

  // ---------------------------------------------------------------- columns

  /** Project, always retaining `time` (≙ keepColumns). */
  def keepColumns(df: DataFrame, cols: String*): DataFrame = {
    val keep = TimeColumn +: cols.filter(_ != TimeColumn)
    df.select(keep.map(col): _*)
  }

  /** Drop columns; refuses to drop `time` (≙ deleteColumns). */
  def deleteColumns(df: DataFrame, cols: String*): DataFrame = {
    require(!cols.contains(TimeColumn), "cannot delete the time column")
    df.drop(cols: _*)
  }

  /** Rename columns; refuses `time`; rejects duplicate targets (≙ renameColumns). */
  def renameColumns(df: DataFrame, renames: (String, String)*): DataFrame = {
    require(renames.forall(_._1 != TimeColumn), "cannot rename the time column")
    val target = df.schema.fieldNames.map(n => renames.toMap.getOrElse(n, n))
    require(target.distinct.length == target.length, "duplicate column names after rename")
    df.withColumnsRenamed(renames.toMap)
  }

  /** Per-column cast; refuses `time` (≙ cast). */
  def castColumns(df: DataFrame, casts: (String, DataType)*): DataFrame = {
    require(casts.forall(_._1 != TimeColumn), "cannot cast the time column")
    casts.foldLeft(df) { case (d, (n, t)) => d.withColumn(n, col(n).cast(t)) }
  }

  /** Shift all timestamps by a signed duration; monotone, so ordering is
    * preserved by construction (≙ shift / lookBackwardClock / lookForwardClock). */
  def shift(df: DataFrame, duration: String, forward: Boolean = true): DataFrame = {
    val ns = parseDuration(duration)
    df.withColumn(TimeColumn, col(TimeColumn) + lit(if (forward) ns else -ns))
  }

  /** Recompute the time column from an expression, then restore ordering (≙ setTime). */
  def setTime(df: DataFrame, expr: Column): DataFrame =
    orderByTime(df.withColumn(TimeColumn, expr.cast(LongType)))

  /**
   * Debug assertion that the frame is globally time-sorted under its current
   * layout (≙ validate, TimeSeriesRDD.scala:1872-1893): checks
   * monotonically-nondecreasing time via a lag window over partition ids.
   */
  def validate(df: DataFrame): Unit = {
    val byPart = df
      .withColumn("__pid", spark_partition_id())
      .withColumn("__prev", lag(col(TimeColumn), 1)
        .over(Window.partitionBy(col("__pid")).orderBy(monotonically_increasing_id())))
    val bad = byPart.filter(col("__prev") > col(TimeColumn)).count()
    require(bad == 0, s"$bad rows out of time order within partitions")
  }

  // ---------------------------------------------------------------- clocks

  /** Evenly spaced `time`-only table over [begin, end] step `frequency`
    * (≙ Clocks.uniform, Clocks.scala:44-89). Distributed via spark.range. */
  def uniformClock(spark: SparkSession, beginNanos: Long, endNanos: Long,
                   frequency: String): DataFrame = {
    val step = parseDuration(frequency)
    val n = (endNanos - beginNanos) / step + 1
    spark.range(n).select((lit(beginNanos) + col("id") * step).as(TimeColumn))
  }

  /** Merge two same-schema time-series tables preserving order; ties keep
    * left rows first via a source-rank column (≙ merge, Merge.scala:27-77). */
  def merge(left: DataFrame, right: DataFrame): DataFrame = {
    require(left.schema.fieldNames.sameElements(right.schema.fieldNames),
      "merge requires identical schemas")
    val l = left.withColumn("__src", lit(0))
    val r = right.withColumn("__src", lit(1))
    l.unionAll(r)
      .repartitionByRange(col(TimeColumn))
      .sortWithinPartitions(TimeColumn, "__src")
      .drop("__src")
  }
}
