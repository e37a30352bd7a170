package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import graft.ts._

/**
 * EMA-family correctness queries. The sequential per-key recursions are
 * mirrored in DuckDB as closed-form weighted sums (the recursion telescopes
 * to Σ xᵢ·e^{k·(tₙ-tᵢ)/p}); sequential exp-products vs one-shot exp differ
 * at ~1e-13 relative, so outputs are rounded to 4 decimals on both sides.
 */
object QueriesEma {
  import QueriesCore.events

  private val Day = "86400000000000.0"

  private def ev(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select("time", "event_id", "event_type", "value")

  private def round4(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, F.round(F.col(c), 4)).orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ema_ewma_legacy" -> ((s, dir) =>
      round4(EmaOps.ewma(ev(s, dir), "value", Seq("event_type"),
        alpha = 0.05, durationPerPeriod = "1d", convention = "legacy"), "value_ewma")),
    "ema_ewma_core" -> ((s, dir) =>
      round4(EmaOps.ewma(ev(s, dir), "value", Seq("event_type"),
        alpha = 0.05, durationPerPeriod = "1d", convention = "core"), "value_ewma")),
    "ema_es_prev_convolution" -> ((s, dir) =>
      round4(EmaOps.exponentialSmoothing(ev(s, dir), "value", Seq("event_type"),
        alpha = 0.05, primingPeriods = 1.0, nanosPerPeriod = EmaOps.NanosPerDay,
        interpolation = "previous", convention = "convolution"), "value_ema")),
    "ema_es_prev_core" -> ((s, dir) =>
      round4(EmaOps.exponentialSmoothing(ev(s, dir), "value", Seq("event_type"),
        alpha = 0.05, primingPeriods = 1.0, nanosPerPeriod = EmaOps.NanosPerDay,
        interpolation = "previous", convention = "core"), "value_ema")),
    "ema_es_current_core" -> ((s, dir) =>
      round4(EmaOps.exponentialSmoothing(ev(s, dir), "value", Seq("event_type"),
        alpha = 0.05, primingPeriods = 1.0, nanosPerPeriod = EmaOps.NanosPerDay,
        interpolation = "current", convention = "core"), "value_ema")),
    "ema_es_linear_convolution" -> ((s, dir) =>
      round4(EmaOps.exponentialSmoothing(ev(s, dir), "value", Seq("event_type"),
        alpha = 0.05, primingPeriods = 1.0, nanosPerPeriod = EmaOps.NanosPerDay,
        interpolation = "linear", convention = "convolution"), "value_ema")),
    "ema_half_life" -> ((s, dir) =>
      round4(EmaOps.emaHalfLife(ev(s, dir), "value", Seq("event_type"),
        halfLife = "12h", primingPeriods = 0.0,
        interpolation = "previous", convention = "legacy"), "value_ema"))
  )

  /** Shared SQL skeleton: per-event_type lag/min/max windows over events. */
  private def lagged =
    s"""SELECT event_type, epoch_ns(ts) AS t, value AS x,
        lag(epoch_ns(ts)) OVER w AS tp, lag(value) OVER w AS xp,
        max(epoch_ns(ts)) OVER (PARTITION BY event_type) AS tmax,
        min(epoch_ns(ts)) OVER (PARTITION BY event_type) AS tmin
        FROM events WINDOW w AS (PARTITION BY event_type ORDER BY epoch_ns(ts))"""

  private def k(alpha: Double) = s"ln(1.0 - $alpha)"

  /** ES sum terms for a given interpolation, decayed to tmax. */
  private def esSql(alpha: Double, interp: String, conv: String,
                    primingPeriods: Double, period: String): String = {
    val kk = k(alpha)
    val dt = s"((t - tp) / $period)"
    val toEnd = s"exp($kk * ((tmax - t) / $period))"
    val d = s"exp($kk * $dt)"
    val term = interp match {
      case "previous" => s"(1.0 - $d) * xp * $toEnd"
      case "current" => s"(1.0 - $d) * x * $toEnd"
      case "linear" =>
        val tc = s"($kk * $dt)"
        val nu = s"(($d - 1.0) / $tc)"
        s"(($nu - $d) * xp + (1.0 - $nu) * x) * $toEnd"
    }
    val primary = s"sum(CASE WHEN tp IS NULL THEN 0.0 ELSE $term END)"
    val auxTerm = s"(1.0 - $d) * $toEnd"
    // priming: interp(0, x0/1, primingPeriods) decayed over the full span;
    // for previous-interp the primary priming is 0 (start value is 0)
    // outside aggregates tmax/tmin need any_value() under GROUP BY
    val primingDecay = s"exp($kk * ((any_value(tmax) - any_value(tmin)) / $period))"
    val pd = s"(1.0 - exp($kk * $primingPeriods))"
    val primingPrimary = interp match {
      case "previous" => "0.0"
      case "linear" =>
        val tcP = s"($kk * $primingPeriods)"
        val nuP = s"((exp($tcP) - 1.0) / $tcP)"
        s"(CASE WHEN $primingPeriods = 0.0 THEN 0.0 ELSE " +
          s"(1.0 - $nuP) * arg_min(x, t) END) * $primingDecay"
      case "current" => s"$pd * arg_min(x, t) * $primingDecay"
    }
    // aux priming = interp(0, 1, priming): previous-point starts at 0 → 0
    val primingAux = interp match {
      case "previous" => "0.0"
      case "linear" =>
        val tcP = s"($kk * $primingPeriods)"
        val nuP = s"((exp($tcP) - 1.0) / $tcP)"
        s"(CASE WHEN $primingPeriods = 0.0 THEN 0.0 ELSE (1.0 - $nuP) END) * $primingDecay"
      case "current" =>
        s"(CASE WHEN $primingPeriods = 0.0 THEN 0.0 ELSE $pd END) * $primingDecay"
    }
    val aux = s"($primingAux + sum(CASE WHEN tp IS NULL THEN 0.0 ELSE $auxTerm END))"
    val out = conv match {
      case "core" => s"(($primingPrimary + $primary) / $aux)"
      case _ => s"($primingPrimary + $primary)"
    }
    s"""WITH e AS ($lagged)
        SELECT CAST(0 AS BIGINT) AS time, event_type, round($out, 4) AS value_ema
        FROM e GROUP BY event_type ORDER BY event_type"""
  }

  private def ewmaSql(alpha: Double, conv: String): String = {
    val kk = k(alpha)
    val w = s"exp($kk * ((tmax - t) / $Day))"
    val out = conv match {
      case "core" => s"(sum(x * $w) / sum($w))"
      case _ => s"sum(x * $w)"
    }
    s"""WITH e AS (SELECT event_type, epoch_ns(ts) AS t, value AS x,
          max(epoch_ns(ts)) OVER (PARTITION BY event_type) AS tmax FROM events)
        SELECT CAST(0 AS BIGINT) AS time, event_type, round($out, 4) AS value_ewma
        FROM e GROUP BY event_type ORDER BY event_type"""
  }

  val oracleSql: Map[String, String] = Map(
    "ema_ewma_legacy" -> ewmaSql(0.05, "legacy"),
    "ema_ewma_core" -> ewmaSql(0.05, "core"),
    "ema_es_prev_convolution" -> esSql(0.05, "previous", "convolution", 1.0, Day),
    "ema_es_prev_core" -> esSql(0.05, "previous", "core", 1.0, Day),
    "ema_es_current_core" -> esSql(0.05, "current", "core", 1.0, Day),
    "ema_es_linear_convolution" -> esSql(0.05, "linear", "convolution", 1.0, Day),
    "ema_half_life" -> esSql(0.5, "previous", "legacy", 0.0, "43200000000000.0")
  )
}
