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
        interpolation = "previous", convention = "legacy"), "value_ema")),
    "ema_rows_es_current_core" -> ((s, dir) =>
      EmaOps.exponentialSmoothingRows(
        ev(s, dir).select("time", "event_id", "event_type", "value"),
        "value", Seq("event_type"),
        alpha = 0.05, primingPeriods = 1.0, nanosPerPeriod = EmaOps.NanosPerDay,
        interpolation = "current", convention = "core")
        .select(F.col("time"), F.col("event_id"), F.col("event_type"),
          F.round(F.col("value_ema"), 4).as("value_ema"))
        .orderBy("time", "event_id")),
    "ema_rows_ewma_legacy" -> ((s, dir) =>
      EmaOps.ewmaRows(
        ev(s, dir).select("time", "event_id", "event_type", "value"),
        "value", Seq("event_type"),
        alpha = 0.05, durationPerPeriod = "1d", convention = "legacy")
        .select(F.col("time"), F.col("event_id"), F.col("event_type"),
          F.round(F.col("value_ewma"), 4).as("value_ewma"))
        .orderBy("time", "event_id")),
    // skew stress: one key (user_id parity) carries ~half the rows — the
    // two-pass prefix scan must stay partition-parallel on the hot key-run
    // instead of funneling it through one task
    "skew_ema_rows_ewma" -> ((s, dir) =>
      EmaOps.ewmaRows(
        events(s, dir).select(F.col("time"), F.col("event_id"),
          F.when(F.col("user_id") % 2 === 0, 0L)
            .otherwise(F.col("user_id") % 50 + 1).as("skew_key"),
          F.col("value")),
        "value", Seq("skew_key"),
        alpha = 0.05, durationPerPeriod = "1d", convention = "legacy")
        .select(F.col("time"), F.col("event_id"), F.col("skew_key"),
          F.round(F.col("value_ewma"), 4).as("value_ewma"))
        .orderBy("time", "event_id"))
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

  /** Per-row ES (current/core): value at row i = the closed-form weighted
    * sum over rows j ≤ i of the same key, via a time-conditioned self-join
    * (O(Σ n_k²) — fine at oracle scale). */
  private def esRowsSql(alpha: Double, primingPeriods: Double, period: String): String = {
    val kk = k(alpha)
    s"""WITH e AS (SELECT event_type, event_id, epoch_ns(ts) AS t, value AS x,
          lag(epoch_ns(ts)) OVER w AS tp,
          min(epoch_ns(ts)) OVER (PARTITION BY event_type) AS tmin,
          arg_min(value, epoch_ns(ts)) OVER (PARTITION BY event_type) AS x0
          FROM events WINDOW w AS (PARTITION BY event_type ORDER BY epoch_ns(ts))),
        b AS (SELECT *,
          CASE WHEN tp IS NULL THEN 0.0
               ELSE (1.0 - exp($kk * ((t - tp) / $period))) * x END AS term,
          CASE WHEN tp IS NULL THEN 0.0
               ELSE (1.0 - exp($kk * ((t - tp) / $period))) END AS aterm
          FROM e),
        s AS (SELECT l.event_type AS event_type, l.event_id AS event_id,
                l.t AS t, l.tmin AS tmin, l.x0 AS x0,
                sum(r.term * exp($kk * ((l.t - r.t) / $period))) AS ps,
                sum(r.aterm * exp($kk * ((l.t - r.t) / $period))) AS asum
              FROM b l JOIN b r ON l.event_type = r.event_type AND r.t <= l.t
              GROUP BY 1, 2, 3, 4, 5)
        SELECT t AS time, event_id, event_type,
          round(((1.0 - exp($kk * $primingPeriods)) * x0 * exp($kk * ((t - tmin) / $period)) + ps)
              / ((1.0 - exp($kk * $primingPeriods)) * exp($kk * ((t - tmin) / $period)) + asum),
            4) AS value_ema
        FROM s ORDER BY time, event_id"""
  }

  private def ewmaRowsSql(alpha: Double, period: String,
                          keyExpr: String = "event_type",
                          keyName: String = "event_type"): String = {
    val kk = k(alpha)
    s"""WITH e AS (SELECT $keyExpr AS $keyName, event_id, epoch_ns(ts) AS t, value AS x FROM events)
        SELECT l.t AS time, l.event_id AS event_id, l.$keyName AS $keyName,
          round(sum(r.x * exp($kk * ((l.t - r.t) / $period))), 4) AS value_ewma
        FROM e l JOIN e r ON l.$keyName = r.$keyName AND r.t <= l.t
        GROUP BY 1, 2, 3 ORDER BY time, event_id"""
  }

  val oracleSql: Map[String, String] = Map(
    "ema_ewma_legacy" -> ewmaSql(0.05, "legacy"),
    "ema_ewma_core" -> ewmaSql(0.05, "core"),
    "ema_es_prev_convolution" -> esSql(0.05, "previous", "convolution", 1.0, Day),
    "ema_es_prev_core" -> esSql(0.05, "previous", "core", 1.0, Day),
    "ema_es_current_core" -> esSql(0.05, "current", "core", 1.0, Day),
    "ema_es_linear_convolution" -> esSql(0.05, "linear", "convolution", 1.0, Day),
    "ema_half_life" -> esSql(0.5, "previous", "legacy", 0.0, "43200000000000.0"),
    "ema_rows_es_current_core" -> esRowsSql(0.05, 1.0, Day),
    "ema_rows_ewma_legacy" -> ewmaRowsSql(0.05, Day),
    "skew_ema_rows_ewma" -> ewmaRowsSql(0.05, Day,
      "CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id % 50 + 1 END", "skew_key")
  )
}
