package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import graft.ts._

/**
 * Cycle / interval / window / running-aggregate correctness queries.
 * Integral `value100` keeps every windowed sum bit-exact; `event_id` breaks
 * row-order ties identically on both engines.
 */
object QueriesWindows {
  import QueriesCore.{events, withValue100, T0, DAY, HOUR}

  private val S = Summarizers

  /** events with value100, time truncated to the hour (cycles need shared
    * timestamps; raw ns stamps are unique). */
  private def evHour(s: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.setTime(
      withValue100(events(s, dir)).select("time", "event_id", "event_type", "user_id", "value100"),
      F.col("time") - F.pmod(F.col("time") - T0, F.lit(HOUR)))

  private val evHourSql =
    s"""SELECT epoch_ns(ts) - (epoch_ns(ts) - $T0) % $HOUR AS time, event_id, event_type,
        user_id, CAST(round(value * 100, 0) AS BIGINT) AS value100 FROM events"""

  private def evV(s: SparkSession, dir: String): DataFrame =
    withValue100(events(s, dir)).select("time", "event_id", "user_id", "value100")

  private val evVSql =
    """SELECT epoch_ns(ts) AS time, event_id, user_id,
       CAST(round(value * 100, 0) AS BIGINT) AS value100 FROM events"""

  private def dailyClock(s: SparkSession): Array[Long] =
    (0 to 31).map(k => T0 + k * DAY).toArray

  private def si(s: SparkSession, dir: String, inclusion: String, rounding: String): DataFrame =
    Intervals.summarizeIntervals(evV(s, dir), dailyClock(s),
      S.count() ++ S.sum("value100"), Seq.empty, inclusion, rounding)
      .orderBy("time")

  /** Interval-bucket arithmetic mirroring Intervalize.roundFn for a uniform
    * daily clock spanning [T0, T0+31d]. */
  private def siSql(inclusion: String, rounding: String): String = {
    val last = T0 + 31 * DAY
    val t = "epoch_ns(ts)"
    val modT = s"(($t - $T0) % $DAY)"
    val floorT = s"($t - $modT)"
    val (where, timeExpr) = (inclusion, rounding) match {
      case ("begin", "begin") => (s"$t >= $T0 AND $t < $last", floorT)
      case ("begin", "end") => (s"$t >= $T0 AND $t < $last", s"($floorT + $DAY)")
      case ("end", "begin") => (s"$t > $T0 AND $t <= $last",
        s"(CASE WHEN $modT = 0 THEN $t - $DAY ELSE $floorT END)")
      case ("end", "end") => (s"$t > $T0 AND $t <= $last",
        s"(CASE WHEN $modT = 0 THEN $t ELSE $floorT + $DAY END)")
    }
    s"""SELECT $timeExpr AS time, count(*) AS count,
        CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value100_sum
        FROM events WHERE $where GROUP BY 1 ORDER BY time"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "summarize_cycles" -> ((s, dir) =>
      Summarize.summarizeCycles(evHour(s, dir),
        S.count() ++ S.sum("value100"), Seq("event_type"))
        .orderBy("time", "event_type")),
    "group_by_cycle_sizes" -> ((s, dir) =>
      Summarize.groupByCycle(evHour(s, dir), Seq("event_type"))
        .select(F.col("time"), F.col("event_type"), F.size(F.col("rows")).as("n_rows"))
        .orderBy("time", "event_type")),
    "summarize_intervals_bb" -> ((s, dir) => si(s, dir, "begin", "begin")),
    "summarize_intervals_be" -> ((s, dir) => si(s, dir, "begin", "end")),
    "summarize_intervals_eb" -> ((s, dir) => si(s, dir, "end", "begin")),
    "summarize_intervals_ee" -> ((s, dir) => si(s, dir, "end", "end")),
    "group_by_interval" -> ((s, dir) =>
      Intervals.groupByInterval(evV(s, dir), dailyClock(s))
        .select(F.col("time"), F.size(F.col("rows")).as("n_rows"))
        .orderBy("time")),
    "summarize_windows_past" -> ((s, dir) =>
      WindowOps.summarizeWindows(evV(s, dir), WindowOps.pastAbsoluteTime("1d"),
        S.count() ++ S.sum("value100"), Seq("user_id"))
        .select("time", "event_id", "user_id", "count", "value100_sum")
        .orderBy("time", "event_id")),
    "summarize_windows_future" -> ((s, dir) =>
      WindowOps.summarizeWindows(evV(s, dir), WindowOps.futureAbsoluteTime("6h"),
        S.count() ++ S.sum("value100"), Seq("user_id"))
        .select("time", "event_id", "user_id", "count", "value100_sum")
        .orderBy("time", "event_id")),
    "add_windows_sizes" -> ((s, dir) =>
      WindowOps.addWindows(evV(s, dir), WindowOps.pastAbsoluteTime("12h"), Seq("user_id"))
        .select(F.col("time"), F.col("event_id"),
          F.size(F.col("window_past_12h")).as("n_window"))
        .orderBy("time", "event_id")),
    // row-count frame (the reference's internal CountWindow, exposed):
    // tie-break on event_id makes the frame deterministic under equal times
    "summarize_windows_rows" -> ((s, dir) =>
      WindowOps.summarizeWindows(evV(s, dir), WindowOps.pastRows(3),
        S.count() ++ S.sum("value100"), Seq("user_id"),
        tieBreak = Seq("event_id"))
        .select("time", "event_id", "user_id", "count", "value100_sum")
        .orderBy("time", "event_id")),
    // forward row-count frame (CountWindow's future direction): current row
    // plus the 2 next rows of the same user, tie-broken on event_id
    "summarize_windows_count" -> ((s, dir) =>
      WindowOps.summarizeWindows(evV(s, dir), WindowOps.futureRows(2),
        S.count() ++ S.sum("value100"), Seq("user_id"),
        tieBreak = Seq("event_id"))
        .select("time", "event_id", "user_id", "count", "value100_sum")
        .orderBy("time", "event_id")),
    "add_summary_columns" -> ((s, dir) =>
      WindowOps.addSummaryColumns(evV(s, dir), S.count() ++ S.sum("value100"),
        Seq("user_id"), tieBreak = Seq("event_id"))
        .select("time", "event_id", "user_id", "count", "value100_sum")
        .orderBy("time", "event_id")),
    // windowed distinctCount (collect_set path — DISTINCT aggregates are
    // not allowed over window frames, so the summarizer switches impl)
    "add_summary_distinct" -> ((s, dir) =>
      WindowOps.addSummaryColumns(evV(s, dir), S.distinctCount("value100"),
        Seq("user_id"), tieBreak = Seq("event_id"))
        .select("time", "event_id", "user_id", "value100_distinctCount")
        .orderBy("time", "event_id")),
    "add_columns_for_cycle" -> ((s, dir) =>
      Summarize.addColumnsForCycle(evHour(s, dir), Seq("event_type"),
        ("v_rel", org.apache.spark.sql.types.LongType, rows => {
          val mn = rows.map(_.getAs[Long]("value100")).min
          rows.map(r => r.getAs[Long]("value100") - mn)
        }))
        .select("time", "event_id", "event_type", "v_rel")
        .orderBy("time", "event_id")),
    // arrow summarizer: every cycle's rows serialized to a real Arrow IPC
    // batch, then decoded back and exploded — the oracle checks the decoded
    // rows are the identity, proving the wire bytes round-trip losslessly.
    "arrow_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val batched = Summarize.summarizeCycles(evHour(s, dir),
        S.arrow(Seq("event_id", "value100")), Seq("event_type"))
      val rowSchema = StructType(Seq(
        StructField("event_id", LongType), StructField("value100", LongType)))
      batched.select(F.col("time"), F.col("event_type"),
          F.explode(org.apache.spark.sql.graft.ArrowColumns
            .fromArrowBatch(F.col("arrow_bytes"), rowSchema)).as("r"))
        .select(F.col("time"), F.col("event_type"),
          F.col("r.event_id").as("event_id"), F.col("r.value100").as("value100"))
        .orderBy("time", "event_id")
    }),
    // overlappable lag-window sum (the reference's private LagSumSummarizer
    // semantics): core [t-1d, t] sum + overlap band [t-1d-12h, t-1d) sum,
    // both range frames in ONE Window exec
    "lag_sum_windows" -> ((s, dir) =>
      WindowOps.addLagSum(evV(s, dir), "value100", window = "1d",
        lag = "12h", key = Seq("user_id"))
        .select("time", "event_id", "user_id", "value100_sum", "value100_lagSum")
        .orderBy("time", "event_id"))
  )

  val oracleSql: Map[String, String] = Map(
    "summarize_cycles" ->
      s"""WITH e AS ($evHourSql)
          SELECT time, event_type, count(*) AS count,
          CAST(sum(value100) AS BIGINT) AS value100_sum
          FROM e GROUP BY time, event_type ORDER BY time, event_type""",
    "group_by_cycle_sizes" ->
      s"""WITH e AS ($evHourSql)
          SELECT time, event_type, CAST(count(*) AS INTEGER) AS n_rows
          FROM e GROUP BY time, event_type ORDER BY time, event_type""",
    "summarize_intervals_bb" -> siSql("begin", "begin"),
    "summarize_intervals_be" -> siSql("begin", "end"),
    "summarize_intervals_eb" -> siSql("end", "begin"),
    "summarize_intervals_ee" -> siSql("end", "end"),
    "group_by_interval" -> {
      val t = "epoch_ns(ts)"
      val modT = s"(($t - $T0) % $DAY)"
      s"""SELECT ($t - $modT + $DAY) AS time, CAST(count(*) AS INTEGER) AS n_rows
          FROM events WHERE $t >= $T0 AND $t < ${T0 + 31 * DAY}
          GROUP BY 1 ORDER BY time"""
    },
    "summarize_windows_past" ->
      s"""WITH e AS ($evVSql)
          SELECT time, event_id, user_id,
          count(*) OVER w AS count, CAST(sum(value100) OVER w AS BIGINT) AS value100_sum
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY time
            RANGE BETWEEN ${1 * DAY} PRECEDING AND CURRENT ROW)
          ORDER BY time, event_id""",
    "summarize_windows_future" ->
      s"""WITH e AS ($evVSql)
          SELECT time, event_id, user_id,
          count(*) OVER w AS count, CAST(sum(value100) OVER w AS BIGINT) AS value100_sum
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY time
            RANGE BETWEEN CURRENT ROW AND ${6 * HOUR} FOLLOWING)
          ORDER BY time, event_id""",
    "add_windows_sizes" ->
      s"""WITH e AS ($evVSql)
          SELECT time, event_id,
          CAST(count(*) OVER (PARTITION BY user_id ORDER BY time
            RANGE BETWEEN ${12 * HOUR} PRECEDING AND CURRENT ROW) AS INTEGER) AS n_window
          FROM e ORDER BY time, event_id""",
    "summarize_windows_rows" ->
      s"""WITH e AS ($evVSql)
          SELECT time, event_id, user_id,
          count(*) OVER w AS count, CAST(sum(value100) OVER w AS BIGINT) AS value100_sum
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY time, event_id
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
          ORDER BY time, event_id""",
    "summarize_windows_count" ->
      s"""WITH e AS ($evVSql)
          SELECT time, event_id, user_id,
          count(*) OVER w AS count, CAST(sum(value100) OVER w AS BIGINT) AS value100_sum
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY time, event_id
            ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING)
          ORDER BY time, event_id""",
    "add_summary_columns" ->
      s"""WITH e AS ($evVSql)
          SELECT time, event_id, user_id,
          count(*) OVER w AS count, CAST(sum(value100) OVER w AS BIGINT) AS value100_sum
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY time, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          ORDER BY time, event_id""",
    "add_summary_distinct" ->
      s"""WITH e AS ($evVSql)
          SELECT time, event_id, user_id,
          CAST(len(list_distinct(list(value100) OVER w)) AS BIGINT)
            AS value100_distinctCount
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY time, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          ORDER BY time, event_id""",
    "add_columns_for_cycle" ->
      s"""WITH e AS ($evHourSql)
          SELECT time, event_id, event_type,
          value100 - min(value100) OVER (PARTITION BY time, event_type) AS v_rel
          FROM e ORDER BY time, event_id""",
    "arrow_roundtrip" ->
      s"""WITH e AS ($evHourSql)
          SELECT time, event_type, event_id, value100
          FROM e ORDER BY time, event_id""",
    "lag_sum_windows" ->
      s"""WITH e AS ($evVSql)
          SELECT time, event_id, user_id,
          COALESCE(sum(CAST(value100 AS DOUBLE)) OVER core, 0.0) AS value100_sum,
          COALESCE(sum(CAST(value100 AS DOUBLE)) OVER band, 0.0) AS value100_lagSum
          FROM e WINDOW
          core AS (PARTITION BY user_id ORDER BY time
            RANGE BETWEEN ${1 * DAY} PRECEDING AND CURRENT ROW),
          band AS (PARTITION BY user_id ORDER BY time
            RANGE BETWEEN ${1 * DAY + 12 * HOUR} PRECEDING AND ${1 * DAY + 1} PRECEDING)
          ORDER BY time, event_id"""
  )
}
