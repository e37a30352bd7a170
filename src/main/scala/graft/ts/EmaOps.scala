package graft.ts

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/**
 * Exponential moving averages over irregularly-spaced series
 * (≙ Summarizers.exponentialSmoothing/ewma/emaHalfLife,
 * /root/reference/src/main/scala/com/twosigma/flint/timeseries/Summarizers.scala:528,599,643;
 * state machines rdd/.../ExponentialSmoothingSummarizer.scala:22-191 and
 * subtractable/ExponentialWeightedMovingAverageSummarizer.scala; math spec
 * /root/reference/doc/ema.md).
 *
 * These are order-dependent aggregates: Spark's groupBy merges partial
 * buffers in arbitrary order, which breaks the reference's
 * ordered-state-merge contract. Instead each key group is scanned once in
 * time order: `repartition(key)` + `sortWithinPartitions(key, time)` +
 * `mapPartitions` with group-boundary detection — one shuffle, streaming
 * O(1) state per key, parallel across keys (the same layout a 1000-executor
 * run needs; a keyless EMA is inherently a sequential reduction, same as the
 * reference's chained partition merge).
 *
 * Conventions (doc/ema.md): "convolution" = raw primary ES value; "core" =
 * primary / auxiliary (the auxiliary smooths the constant-1 series);
 * "legacy" = convolution with a zero point injected at t = 0.
 * Interpolations: "previous", "linear", "current".
 */
object EmaOps {
  import TimeSeriesOps.TimeColumn

  val NanosPerDay: Double = 24 * 60 * 60 * 1e9

  /** exponentialSmoothing: output one row per key, column `<x>_ema`. */
  def exponentialSmoothing(df: DataFrame, xCol: String, key: Seq[String] = Seq.empty,
                           alpha: Double = 0.05, primingPeriods: Double = 1.0,
                           nanosPerPeriod: Double = NanosPerDay,
                           interpolation: String = "current",
                           convention: String = "core"): DataFrame = {
    require(Seq("previous", "linear", "current").contains(interpolation))
    require(Seq("convolution", "core", "legacy").contains(convention))
    val logDecay = math.log(1.0 - alpha)

    scanGroups(df, xCol, key, s"${xCol}_ema") { rows =>
      var primary = 0.0; var auxiliary = 0.0
      var first: (Long, Double) = null; var prev: (Long, Double) = null
      def interp(startVal: Double, endVal: Double, periods: Double): Double =
        if (periods == 0.0) 0.0
        else {
          val tc = periods * logDecay
          val decay = math.exp(tc)
          interpolation match {
            case "previous" => (1.0 - decay) * startVal
            case "linear" =>
              val interpolateDecay = (decay - 1.0) / tc
              (interpolateDecay - decay) * startVal + (1.0 - interpolateDecay) * endVal
            case "current" => (1.0 - decay) * endVal
          }
        }
      def decayed(v: Double, periods: Double): Double = math.exp(periods * logDecay) * v
      rows.foreach { case (t, x) =>
        if (first == null) first = (t, x)
        else {
          val periods = (t - prev._1) / nanosPerPeriod
          primary = decayed(primary, periods) + interp(prev._2, x, periods)
          auxiliary = decayed(auxiliary, periods) + interp(1.0, 1.0, periods)
        }
        prev = (t, x)
      }
      if (first == null) Double.NaN
      else {
        val actualPriming =
          if (convention == "legacy") (first._1 - 0L) / nanosPerPeriod
          else primingPeriods
        val span = math.max((prev._1 - first._1) / nanosPerPeriod, 0.0)
        val p = decayed(interp(0.0, first._2, actualPriming), span) + primary
        val a = decayed(interp(0.0, 1.0, actualPriming), span) + auxiliary
        if (convention == "core") p / a else p
      }
    }
  }

  /** ewma: pandas-adjust-style weighted average with variable periods
    * (weight (1-α)^periods(t_i, t_n)); `durationPerPeriod = "constant"`
    * counts every row as one period. Output column `<x>_ewma`. */
  def ewma(df: DataFrame, xCol: String, key: Seq[String] = Seq.empty,
           alpha: Double = 0.05, durationPerPeriod: String = "1d",
           convention: String = "legacy"): DataFrame = {
    require(Seq("core", "legacy").contains(convention))
    val constantPeriods = durationPerPeriod.equalsIgnoreCase("constant")
    val perPeriod =
      if (constantPeriods) 1.0
      else TimeSeriesOps.parseDuration(durationPerPeriod).toDouble
    val logDecay = math.log(1.0 - alpha)

    scanGroups(df, xCol, key, s"${xCol}_ewma") { rows =>
      var primary = 0.0; var auxiliary = 0.0
      var lastT = 0L; var n = 0L
      rows.foreach { case (t, x) =>
        if (n == 0L) { primary = x; auxiliary = 1.0 }
        else {
          val periods = if (constantPeriods) 1.0 else (t - lastT) / perPeriod
          val decay = math.exp(periods * logDecay)
          primary = decay * primary + x
          auxiliary = decay * auxiliary + 1.0
        }
        lastT = t; n += 1
      }
      if (n == 0L) Double.NaN
      else if (convention == "core") primary / auxiliary
      else primary
    }
  }

  /** EMA parameterized by half-life: alpha = 0.5 with periods measured in
    * half-lives (≙ Summarizers.emaHalfLife). Output column `<x>_ema`. */
  def emaHalfLife(df: DataFrame, xCol: String, key: Seq[String] = Seq.empty,
                  halfLife: String = "1d", primingPeriods: Double = 0.0,
                  interpolation: String = "previous",
                  convention: String = "legacy"): DataFrame =
    exponentialSmoothing(df, xCol, key, alpha = 0.5, primingPeriods,
      nanosPerPeriod = TimeSeriesOps.parseDuration(halfLife).toDouble,
      interpolation, convention)

  /** One ordered scan per key group: repartition on key, sort within
    * partitions by (key, time), fold each group with `render`. Null x rows
    * are skipped (the reference's FilterNullInput behavior). */
  private def scanGroups(df: DataFrame, xCol: String, key: Seq[String],
                         outName: String)(render: Iterator[(Long, Double)] => Double): DataFrame = {
    val projected = df.select(
      (key.map(F.col) :+ F.col(TimeColumn) :+ F.col(xCol).cast("double")): _*)
    val parted =
      if (key.isEmpty) projected.repartition(1)
      else projected.repartition(key.map(F.col): _*)
    val sorted = parted.sortWithinPartitions((key :+ TimeColumn).map(F.col): _*)

    val keyFields = key.map(k => df.schema(df.schema.fieldIndex(k)))
    val outSchema = StructType(
      StructField(TimeColumn, LongType, nullable = false) +:
        keyFields :+ StructField(outName, DoubleType, nullable = true))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val nKey = key.length

    sorted.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[Row] {
        def hasNext: Boolean = buf.hasNext
        def next(): Row = {
          val head = buf.head
          val keyVals = (0 until nKey).map(head.get)
          def sameGroup: Boolean = buf.hasNext &&
            (0 until nKey).forall(i => buf.head.get(i) == keyVals(i))
          val groupRows = new Iterator[(Long, Double)] {
            def hasNext: Boolean = sameGroup
            def next(): (Long, Double) = {
              val r = buf.next()
              (r.getLong(nKey), if (r.isNullAt(nKey + 1)) Double.NaN else r.getDouble(nKey + 1))
            }
          }.filter(!_._2.isNaN)
          val es = render(groupRows)
          // drain any remaining rows of this group (render may stop early)
          while (sameGroup) buf.next()
          Row.fromSeq(0L +: keyVals :+ (if (es.isNaN) null else es))
        }
      }
    }(enc)
  }
}
