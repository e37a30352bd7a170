package graft.ts

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
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
 * Two evaluation modes, matching the reference's aggregation modes:
 *
 *  - **summarize** ([[exponentialSmoothing]], [[ewma]], [[emaHalfLife]]):
 *    one value per key. The sequential recursion telescopes to a
 *    closed-form weighted sum — Σᵢ termᵢ·e^{k·(tmax−tᵢ)/p} — so it is
 *    evaluated as a *plain distributable aggregate*: per-key extremes are
 *    computed by an ordinary groupBy and broadcast-joined back (tiny: one
 *    row per key), the per-row decay weights are codegen'd arithmetic at
 *    full scan parallelism, and the final sums use normal partial/final
 *    aggregation. `ewma` in duration mode needs no window at all; the
 *    `exponentialSmoothing` interpolations reference the previous row, so
 *    one `lag()` window pass remains (that pass is per-key sequential — the
 *    inherent cost of neighbor-dependent semantics in a declarative plan —
 *    but it does only the lag; all heavy math and sums stay parallel).
 *
 *  - **per-row** ([[exponentialSmoothingRows]], [[ewmaRows]]): the running
 *    EMA appended to every input row (≙ the reference's EMA summarizers
 *    under addSummaryColumns). A running prefix recursion is inherently
 *    ordered, so this is one ordered scan per key group — `repartition(key)`
 *    + `sortWithinPartitions` + `mapPartitions` with O(1) state, parallel
 *    across keys, exactly the reference's execution shape.
 *
 * Conventions (doc/ema.md): "convolution" = raw primary ES value; "core" =
 * primary / auxiliary (the auxiliary smooths the constant-1 series);
 * "legacy" = convolution with a zero point injected at t = 0.
 * Interpolations: "previous", "linear", "current".
 *
 * Null handling (≙ FilterNullInput): null x rows do not update state; in
 * summarize mode a key whose rows are all null produces no output row.
 */
object EmaOps {
  import TimeSeriesOps.TimeColumn

  val NanosPerDay: Double = 24 * 60 * 60 * 1e9

  private val interps = Seq("previous", "linear", "current")

  /** exponentialSmoothing: one row per key, column `<x>_ema`. */
  def exponentialSmoothing(df: DataFrame, xCol: String, key: Seq[String] = Seq.empty,
                           alpha: Double = 0.05, primingPeriods: Double = 1.0,
                           nanosPerPeriod: Double = NanosPerDay,
                           interpolation: String = "current",
                           convention: String = "core"): DataFrame = {
    require(interps.contains(interpolation))
    require(Seq("convolution", "core", "legacy").contains(convention))
    val k = math.log(1.0 - alpha)
    val p = nanosPerPeriod

    // One keyed window pass yields the lag neighbors AND the per-key
    // extremes (whole-partition frames share the sort with the lag), so the
    // input is scanned once — no second scan + broadcast join like ewma's
    // windowless path needs.
    val base = project(df, xCol, key)
    val wp = Window.partitionBy(key.map(F.col): _*)
    val wo = wp.orderBy(F.col("__t"))
    val lagged = base
      .withColumn("__tp", F.lag("__t", 1).over(wo))
      .withColumn("__xp", F.lag("__x", 1).over(wo))
      .withColumn("__tmax", F.max("__t").over(wp))
      .withColumn("__tmin", F.min("__t").over(wp))
      .withColumn("__x0", F.min_by(F.col("__x"), F.col("__t")).over(wp))

    val dt = (F.col("__t") - F.col("__tp")) / p
    val d = F.exp(F.lit(k) * dt)
    val toEnd = F.exp(F.lit(k) * ((F.col("__tmax") - F.col("__t")) / p))
    val term: Column = interpolation match {
      case "previous" => (F.lit(1.0) - d) * F.col("__xp")
      case "current" => (F.lit(1.0) - d) * F.col("__x")
      case "linear" =>
        val nu = (d - F.lit(1.0)) / (F.lit(k) * dt)
        F.when(dt === 0.0, 0.0)
          .otherwise((nu - d) * F.col("__xp") + (F.lit(1.0) - nu) * F.col("__x"))
    }
    val pTerm = F.when(F.col("__tp").isNull, 0.0).otherwise(term * toEnd)
    // all three interpolations give interp(1,1,dt) = 1 - d
    val aTerm = F.when(F.col("__tp").isNull, 0.0).otherwise((F.lit(1.0) - d) * toEnd)

    val grouped = lagged.groupBy(key.map(F.col): _*).agg(
        F.sum(pTerm).as("__ps"), F.sum(aTerm).as("__as"),
        F.max("__tmax").as("__tmax"), F.max("__tmin").as("__tmin"),
        F.max("__x0").as("__x0"))
      // keyless groupBy() emits one global row even for empty input;
      // max over zero rows is null -> drop it (contract: no output row
      // when no non-null x exists)
      .filter(F.col("__tmax").isNotNull)

    // priming mass: interp(0, x0, actualPriming) decayed over the key's span
    val actualPriming: Column =
      if (convention == "legacy") F.col("__tmin") / p else F.lit(primingPeriods)
    val span = (F.col("__tmax") - F.col("__tmin")) / p
    val primingDecay = F.exp(F.lit(k) * span)
    val pd = F.lit(1.0) - F.exp(F.lit(k) * actualPriming)
    val (pp, pa): (Column, Column) = interpolation match {
      case "previous" => (F.lit(0.0), F.lit(0.0))
      case "current" => (pd * F.col("__x0") * primingDecay, pd * primingDecay)
      case "linear" =>
        val nuP = (F.exp(F.lit(k) * actualPriming) - F.lit(1.0)) /
          (F.lit(k) * actualPriming)
        val g = F.when(actualPriming === 0.0, 0.0).otherwise(F.lit(1.0) - nuP)
        (g * F.col("__x0") * primingDecay, g * primingDecay)
    }
    val primary = pp + F.col("__ps")
    val aux = pa + F.col("__as")
    val out = if (convention == "core") primary / aux else primary
    grouped.select((F.lit(0L).as(TimeColumn) +: key.map(F.col)) :+
      out.as(s"${xCol}_ema"): _*)
  }

  /** ewma: pandas-adjust-style weighted average with variable periods
    * (weight (1-α)^periods(t_i, t_n)); `durationPerPeriod = "constant"`
    * counts every row as one period. Output column `<x>_ewma`. */
  def ewma(df: DataFrame, xCol: String, key: Seq[String] = Seq.empty,
           alpha: Double = 0.05, durationPerPeriod: String = "1d",
           convention: String = "legacy"): DataFrame = {
    require(Seq("core", "legacy").contains(convention))
    val k = math.log(1.0 - alpha)
    if (durationPerPeriod.equalsIgnoreCase("constant")) {
      // index-based decay needs a per-row rank: stays on the ordered scan
      val out = s"${xCol}_ewma"
      return scanGroups(df, xCol, key, out) { rows =>
        val st = new EwmaState(k, constant = true, 1.0, convention)
        rows.foreach { case (t, x) => st.update(t, x) }
        st.value
      }
    }
    // Duration mode telescopes to Σ x_i·e^{k(tmax-t_i)/p}: no window, no
    // ordered scan — per-key tmax broadcast-joined, then one aggregation.
    val perPeriod = TimeSeriesOps.parseDuration(durationPerPeriod).toDouble
    val base = withKeyStats(project(df, xCol, key), key)
    val wgt = F.exp(F.lit(k) * ((F.col("__tmax") - F.col("__t")) / perPeriod))
    val grouped = base.groupBy(key.map(F.col): _*).agg(
        F.sum(F.col("__x") * wgt).as("__p"), F.sum(wgt).as("__a"))
      // keyless groupBy() emits one global row even for empty input (§ the
      // exponentialSmoothing note); sum over zero rows is null -> drop
      .filter(F.col("__a").isNotNull)
    val out = if (convention == "core") F.col("__p") / F.col("__a") else F.col("__p")
    grouped.select((F.lit(0L).as(TimeColumn) +: key.map(F.col)) :+
      out.as(s"${xCol}_ewma"): _*)
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

  // -------------------------------------------------------- per-row running

  /** Running exponentialSmoothing appended to every row, column `<x>_ema`
    * (≙ the reference ES summarizer under addSummaryColumns). The value at
    * row i equals `exponentialSmoothing` over rows ≤ i of the same key. */
  def exponentialSmoothingRows(df: DataFrame, xCol: String, key: Seq[String] = Seq.empty,
                               alpha: Double = 0.05, primingPeriods: Double = 1.0,
                               nanosPerPeriod: Double = NanosPerDay,
                               interpolation: String = "current",
                               convention: String = "core"): DataFrame = {
    require(interps.contains(interpolation))
    require(Seq("convolution", "core", "legacy").contains(convention))
    runningScan(df, xCol, key, s"${xCol}_ema")(() =>
      new ESState(math.log(1.0 - alpha), primingPeriods, nanosPerPeriod,
        interpolation, convention))
  }

  /** Running ewma appended to every row, column `<x>_ewma`. */
  def ewmaRows(df: DataFrame, xCol: String, key: Seq[String] = Seq.empty,
               alpha: Double = 0.05, durationPerPeriod: String = "1d",
               convention: String = "legacy"): DataFrame = {
    require(Seq("core", "legacy").contains(convention))
    val constant = durationPerPeriod.equalsIgnoreCase("constant")
    val perPeriod = if (constant) 1.0
      else TimeSeriesOps.parseDuration(durationPerPeriod).toDouble
    runningScan(df, xCol, key, s"${xCol}_ewma")(() =>
      new EwmaState(math.log(1.0 - alpha), constant, perPeriod, convention))
  }

  // ------------------------------------------------------------- internals

  /** (key..., __t, __x) with null x rows dropped (FilterNullInput). */
  private def project(df: DataFrame, xCol: String, key: Seq[String]): DataFrame =
    df.select((key.map(F.col) :+ F.col(TimeColumn).as("__t") :+
      F.col(xCol).cast("double").as("__x")): _*)
      .filter(F.col("__x").isNotNull)

  /** Join per-key (tmax, tmin, x-at-tmin) back onto the rows. The stats
    * side has one row per key; a forced `F.broadcast` would be fastest for
    * few keys but can exceed the broadcast/driver limit when keys are
    * high-cardinality (per-user keys at 100 TB), so the join is left
    * unhinted — AQE converts it to a broadcast join at runtime when the
    * aggregated side is actually small, and falls back to a shuffle join
    * otherwise. Keyless input aggregates to exactly one global row, where
    * the broadcast hint is always safe. */
  private def withKeyStats(base: DataFrame, key: Seq[String]): DataFrame = {
    val aggs = Seq(F.max("__t").as("__tmax"), F.min("__t").as("__tmin"),
      F.min_by(F.col("__x"), F.col("__t")).as("__x0"))
    if (key.isEmpty)
      base.crossJoin(F.broadcast(base.agg(aggs.head, aggs.tail: _*)))
    else
      base.join(base.groupBy(key.map(F.col): _*)
        .agg(aggs.head, aggs.tail: _*), key)
  }

  private trait RunningState {
    def update(t: Long, x: Double): Unit
    /** Current rendered value; NaN when no non-null input seen yet. */
    def value: Double
  }

  /** ES recursion + render (identical math to the reference's state machine,
    * ExponentialSmoothingSummarizer.scala:22-191). */
  private final class ESState(logDecay: Double, primingPeriods: Double,
                              p: Double, interpolation: String,
                              convention: String) extends RunningState {
    private var primary = 0.0
    private var auxiliary = 0.0
    private var has = false
    private var firstT = 0L; private var firstX = 0.0
    private var prevT = 0L; private var prevX = 0.0

    private def interp(startVal: Double, endVal: Double, periods: Double): Double =
      if (periods == 0.0) 0.0
      else {
        val tc = periods * logDecay
        val decay = math.exp(tc)
        interpolation match {
          case "previous" => (1.0 - decay) * startVal
          case "linear" =>
            val nu = (decay - 1.0) / tc
            (nu - decay) * startVal + (1.0 - nu) * endVal
          case "current" => (1.0 - decay) * endVal
        }
      }
    private def decayed(v: Double, periods: Double): Double =
      math.exp(periods * logDecay) * v

    def update(t: Long, x: Double): Unit = {
      if (!has) { has = true; firstT = t; firstX = x }
      else {
        val periods = (t - prevT) / p
        primary = decayed(primary, periods) + interp(prevX, x, periods)
        auxiliary = decayed(auxiliary, periods) + interp(1.0, 1.0, periods)
      }
      prevT = t; prevX = x
    }

    def value: Double =
      if (!has) Double.NaN
      else {
        val actualPriming =
          if (convention == "legacy") (firstT - 0L) / p else primingPeriods
        val span = math.max((prevT - firstT) / p, 0.0)
        val pr = decayed(interp(0.0, firstX, actualPriming), span) + primary
        val au = decayed(interp(0.0, 1.0, actualPriming), span) + auxiliary
        if (convention == "core") pr / au else pr
      }
  }

  private final class EwmaState(logDecay: Double, constant: Boolean,
                                perPeriod: Double, convention: String)
      extends RunningState {
    private var primary = 0.0
    private var auxiliary = 0.0
    private var lastT = 0L
    private var n = 0L
    def update(t: Long, x: Double): Unit = {
      if (n == 0L) { primary = x; auxiliary = 1.0 }
      else {
        val periods = if (constant) 1.0 else (t - lastT) / perPeriod
        val decay = math.exp(periods * logDecay)
        primary = decay * primary + x
        auxiliary = decay * auxiliary + 1.0
      }
      lastT = t; n += 1
    }
    def value: Double =
      if (n == 0L) Double.NaN
      else if (convention == "core") primary / auxiliary
      else primary
  }

  /** One ordered scan per key group emitting one value per GROUP (constant-
    * period ewma only; everything else uses the closed form). Null x rows
    * are skipped (FilterNullInput). */
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

  /** One ordered scan per key group emitting EVERY input row plus the
    * running value: repartition(key) + sortWithinPartitions(key, time) +
    * mapPartitions with O(1) per-key state — the reference's execution
    * shape for running summarizers. */
  private def runningScan(df: DataFrame, xCol: String, key: Seq[String],
                          outName: String)(mk: () => RunningState): DataFrame = {
    val parted =
      if (key.isEmpty) df.repartition(1)
      else df.repartition(key.map(F.col): _*)
    val sorted = parted.sortWithinPartitions((key :+ TimeColumn).map(F.col): _*)
    val tIdx = df.schema.fieldIndex(TimeColumn)
    val xIdx = df.schema.fieldIndex(xCol)
    val kIdx = key.map(df.schema.fieldIndex)
    val outSchema = df.schema.add(outName, DoubleType, nullable = true)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)

    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var st: RunningState = null
      it.map { r =>
        val kv = kIdx.map(r.get)
        if (st == null || kv != curKey) { st = mk(); curKey = kv }
        if (!r.isNullAt(xIdx))
          st.update(r.getLong(tIdx), r.get(xIdx).asInstanceOf[Number].doubleValue())
        val v = st.value
        Row.fromSeq(r.toSeq :+ (if (v.isNaN) null else v))
      }
    }(enc)
  }
}
