package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.{functions => F}

/**
 * Time-window specs and per-row window aggregation
 * (≙ Windows.pastAbsoluteTime/futureAbsoluteTime, timeseries/Windows.scala:32-50;
 * summarizeWindows/addWindows/addSummaryColumns, TimeSeriesRDD.scala:1148,947,1215).
 *
 * Spark-first: a flint window [t+a, t+b] (both endpoints inclusive,
 * rdd/function/window/SummarizeWindows.scala:178-183) is exactly a Catalyst
 * range frame `rangeBetween(a, b)` over the long-nanos time column. Spark's
 * WindowExec evaluates running frames incrementally and sliding range frames
 * with a moving lower bound — the same O(n)/O(w) behavior the reference gets
 * from its subtractable/flipper iterators, without a custom physical node.
 */
object WindowOps {
  import TimeSeriesOps.TimeColumn

  /** A closed time window [t + fromNs, t + toNs] around each row's time. */
  final case class TimeWindow(fromNs: Long, toNs: Long, name: String)

  /** [t - d, t] (≙ Windows.pastAbsoluteTime). */
  def pastAbsoluteTime(duration: String): TimeWindow = {
    val ns = TimeSeriesOps.parseDuration(duration)
    TimeWindow(-ns, 0L, s"past_$duration")
  }

  /** [t, t + d] (≙ Windows.futureAbsoluteTime). */
  def futureAbsoluteTime(duration: String): TimeWindow = {
    val ns = TimeSeriesOps.parseDuration(duration)
    TimeWindow(0L, ns, s"future_$duration")
  }

  private def spec(w: TimeWindow, key: Seq[String]): WindowSpec =
    Window.partitionBy(key.map(F.col): _*).orderBy(F.col(TimeColumn))
      .rangeBetween(w.fromNs, w.toNs)

  /** For each row, append aggregates over all rows (same key) within its
    * window (≙ summarizeWindows). */
  def summarizeWindows(df: DataFrame, window: TimeWindow, s: Summarizer,
                       key: Seq[String] = Seq.empty): DataFrame = {
    val outs = s.namedOutputs(Some(spec(window, key)))
    df.withColumns(outs.toMap)
  }

  /** For each row, append the window's rows as array<struct> column
    * `window_<name>` (≙ addWindows; README.md:169-188 naming). */
  def addWindows(df: DataFrame, window: TimeWindow,
                 key: Seq[String] = Seq.empty): DataFrame = {
    val rowsCol = F.collect_list(F.struct(df.columns.map(F.col).toSeq: _*))
      .over(spec(window, key))
    df.withColumn(s"window_${window.name}", rowsCol)
  }

  /** Running (cumulative) aggregate appended per row (≙ addSummaryColumns,
    * Summarizations.scala:25-50). Ties on time are resolved by `tieBreak`
    * columns if given (the reference uses physical row order, which a
    * declarative plan cannot reference). */
  def addSummaryColumns(df: DataFrame, s: Summarizer, key: Seq[String] = Seq.empty,
                        tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val ord = (TimeColumn +: tieBreak).map(F.col)
    val w = Window.partitionBy(key.map(F.col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outs = s.namedOutputs(Some(w))
    df.withColumns(outs.toMap)
  }
}
