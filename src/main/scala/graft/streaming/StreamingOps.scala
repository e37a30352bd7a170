package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}
import graft.ts.{Summarizer, TimeSeriesOps}

/**
 * Structured Streaming variants of the aggregation surface. The reference
 * is batch-only (SURVEY §2.8) — this is the post-parity capability the
 * engine adds, expressed purely on Spark's streaming primitives so the
 * SAME code runs on a batch frame or a `readStream` frame:
 *
 *  - [[summarizeTumbling]] / [[summarizeSliding]]: event-time windowed
 *    summarize with a watermark (`F.window` + groupBy — incremental
 *    stateful aggregation, late data dropped past the watermark).
 *  - [[summarizeSessions]]: gap-based session windows (`F.session_window`).
 *  - [[ewmaStateful]]: per-key running EWMA across micro-batches via
 *    `flatMapGroupsWithState` — the custom-state path for semantics the
 *    built-in windowed aggregates cannot express (order-dependent decay).
 *
 * Times: input keeps the canonical long-nanos `time` column; event-time
 * operators need a TimestampType column, derived here as `event_ts`
 * (micro truncation — Spark watermarks are microsecond-grained).
 */
/** Kryo-serialized per-key state of [[StreamingOps.leftJoinStream]]:
  * pending (un-finalized) lefts and the live right-row window, both as
  * (nanos, packed value struct), time-ascending. */
case class AsOfStreamState(lefts: List[(Long, Row)], rights: List[(Long, Row)])

object StreamingOps {
  import TimeSeriesOps.TimeColumn

  private val EventTs = "event_ts"

  /** Add the TimestampType event-time column streaming operators key on. */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn(EventTs, TimeSeriesOps.nanosToTimestamp(F.col(TimeColumn)))

  /** Event-time tumbling-window summarize with a watermark. Output columns:
    * window_start/window_end (long nanos), key..., aggregates. */
  def summarizeTumbling(df: DataFrame, s: Summarizer, windowDuration: String,
                        watermarkDelay: String,
                        key: Seq[String] = Seq.empty): DataFrame =
    windowed(df, s, F.window(F.col(EventTs), windowDuration), watermarkDelay, key)

  /** Sliding-window variant: one result row per (window, key) for every
    * `slideDuration` step. */
  def summarizeSliding(df: DataFrame, s: Summarizer, windowDuration: String,
                       slideDuration: String, watermarkDelay: String,
                       key: Seq[String] = Seq.empty): DataFrame =
    windowed(df, s, F.window(F.col(EventTs), windowDuration, slideDuration),
      watermarkDelay, key)

  /** Session windows: rows closer than `gapDuration` merge into one session. */
  def summarizeSessions(df: DataFrame, s: Summarizer, gapDuration: String,
                        watermarkDelay: String,
                        key: Seq[String] = Seq.empty): DataFrame =
    windowed(df, s, F.session_window(F.col(EventTs), gapDuration),
      watermarkDelay, key)

  private def windowed(df: DataFrame, s: Summarizer, windowCol: org.apache.spark.sql.Column,
                       watermarkDelay: String, key: Seq[String]): DataFrame = {
    val withTs = withEventTime(df).withWatermark(EventTs, watermarkDelay)
    val aggs = s.outputs
    withTs
      .groupBy(windowCol.as("__w") +: key.map(F.col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((F.unix_micros(F.col("__w.start")) * 1000L).as("window_start") +:
        (F.unix_micros(F.col("__w.end")) * 1000L).as("window_end") +:
        (key.map(F.col) ++ s.names.map(n => F.col(s"`$n`"))): _*)
  }

  /**
   * Streaming exact dedup: drops rows whose `keyCols` were already seen,
   * with state bounded by the watermark (`dropDuplicatesWithinWatermark` —
   * two duplicates are guaranteed deduped when they arrive within the
   * watermark delay of each other; state for older keys is evicted). The
   * streaming face of [[graft.llm.Dedup.exactDedup]] for ingest-time
   * filtering; run the batch dedup for exactness over unbounded history.
   */
  def dedupExactStream(df: DataFrame, keyCols: Seq[String],
                       watermarkDelay: String): DataFrame =
    withEventTime(df).withWatermark(EventTs, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)
      .drop(EventTs)

  /**
   * Streaming as-of LEFT join (the batch [[graft.ts.AsOfJoin.leftJoin]]
   * semantics under event-time watermarks): for every left row, the most
   * recent right row of the same key with `rt <= t && rt >= t - tolerance`;
   * unmatched lefts null-pad. SURVEY §2.8 mapped this to "stream-stream
   * join with range condition" — but the built-in range join emits EVERY
   * right row in the window, not the latest, so as-of semantics need
   * custom state: `flatMapGroupsWithState` over the tagged union of both
   * streams.
   *
   * Correctness contract: a left row at time t is FINALIZED (emitted) only
   * once the watermark passes t — at that point Spark has dropped every
   * right row at or before t that could still arrive, so the match is
   * final; the operator is exactly batch-equivalent over in-watermark data.
   * Pending lefts are flushed by event-time timeouts as the watermark
   * advances (no new data needed on that key). State per key = pending
   * lefts (not yet past watermark) + the right-row window
   * `[minPendingLeft - tolerance, now]` — bounded by tolerance, pruned
   * every trigger; idle keys are garbage-collected after `stateTimeout`.
   *
   * Output: (time, key (string), left cols..., right cols... nullable),
   * lefts in per-key time order. Ties among equal right times resolve to
   * the last in (time, arrival) order.
   */
  def leftJoinStream(left: DataFrame, right: DataFrame, tolerance: String,
                     key: String, watermarkDelay: String,
                     stateTimeout: String = "30 days"): DataFrame = {
    val tol = TimeSeriesOps.parseDuration(tolerance)
    val timeoutNs = TimeSeriesOps.parseDuration(stateTimeout)
    val lCols = left.columns.filter(c => c != TimeColumn && c != key).toSeq
    val rCols = right.columns.filter(c => c != TimeColumn && c != key).toSeq
    // a bare (time, key) LEFT is the classic clock-sampling use case and is
    // supported (empty left struct); the RIGHT must carry something to join
    require(rCols.nonEmpty, "the right side needs at least one value column")
    require(lCols.intersect(rCols).isEmpty,
      s"overlapping value columns ${lCols.intersect(rCols).mkString(",")}: rename one side")
    val lStruct = StructType(lCols.map(c => left.schema(left.schema.fieldIndex(c))))
    val rStruct = StructType(rCols.map(c => right.schema(right.schema.fieldIndex(c))))

    def tagged(df: DataFrame, isLeft: Boolean): DataFrame = {
      val self = if (isLeft)
        F.struct(lCols.map(F.col): _*).as("__lv")
      else F.lit(null).cast(lStruct).as("__lv")
      val other = if (isLeft)
        F.lit(null).cast(rStruct).as("__rv")
      else F.struct(rCols.map(F.col): _*).as("__rv")
      withEventTime(df).select(F.col(TimeColumn), F.col(key).cast("string").as("__k"),
        F.lit(isLeft).as("__isL"), self, other, F.col(EventTs))
    }

    val in = tagged(left, isLeft = true).unionByName(tagged(right, isLeft = false))
      .withWatermark(EventTs, watermarkDelay)

    val outSchema = StructType(
      StructField(TimeColumn, LongType) +: StructField(key, StringType) +:
        (lStruct.fields.toSeq ++ rStruct.fields.map(_.copy(nullable = true))))
    implicit val outEnc = RowEncoder.encoderFor(outSchema)
    implicit val stateEnc = org.apache.spark.sql.Encoders.kryo[AsOfStreamState]

    val spark = left.sparkSession
    import spark.implicits._

    in.groupByKey(_.getString(1))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (k: String, rows: Iterator[Row], state: GroupState[AsOfStreamState]) => {
          val st = state.getOption.getOrElse(AsOfStreamState(Nil, Nil))
          val newLefts = scala.collection.mutable.ListBuffer.empty[(Long, Row)]
          val newRights = scala.collection.mutable.ListBuffer.empty[(Long, Row)]
          rows.foreach { r =>
            val t = r.getLong(0)
            if (r.getBoolean(2)) newLefts += ((t, r.getStruct(3)))
            else newRights += ((t, r.getStruct(4)))
          }
          // stable time sort with stored (already time-ascending) state
          // FIRST and this batch's arrivals after, so equal-time ties keep
          // their original arrival order across micro-batch boundaries —
          // the "last in (time, arrival) order" pick never depends on how
          // the stream was sliced into batches
          val ls = (st.lefts ++ newLefts).sortBy(_._1)
          val rs = (st.rights ++ newRights).sortBy(_._1).toIndexedSeq
          val wmNs = state.getCurrentWatermarkMs() * 1000000L
          val (ready, pending) = ls.partition(_._1 <= wmNs)
          val out = ready.map { case (t, lv) =>
            // last right with rt <= t (binary search upper bound)
            var lo = 0; var hi = rs.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (rs(mid)._1 <= t) lo = mid + 1 else hi = mid
            }
            val m = if (lo > 0 && rs(lo - 1)._1 >= t - tol) rs(lo - 1)._2 else null
            Row.fromSeq(t +: k +: (lv.toSeq ++
              (if (m != null) m.toSeq else Seq.fill(rCols.length)(null))))
          }
          // rights below wm - tolerance are dead: every unfinalized or
          // future left has t > wm, so it only needs rights >= t - tol
          val keptRights = rs.dropWhile(_._1 < wmNs - tol).toList
          if (pending.isEmpty && keptRights.isEmpty && state.getCurrentWatermarkMs() > 0) {
            state.remove()
          } else {
            state.update(AsOfStreamState(pending, keptRights))
            if (pending.nonEmpty) {
              // fire when the watermark passes the earliest pending left
              // (+1ms so the timestamp is strictly beyond the watermark)
              state.setTimeoutTimestamp(pending.head._1 / 1000000L + 1)
            } else if (state.getCurrentWatermarkMs() > 0) {
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() +
                timeoutNs / 1000000L)
            }
          }
          out.iterator
        }).toDF(outSchema.fieldNames.toIndexedSeq: _*)
  }

  /**
   * Per-key running EWMA across micro-batches: emits one row per input row
   * with the running value, state = (lastTime, primary, auxiliary) carried
   * in `GroupState` between batches. Rows inside a batch are processed in
   * event-time order; state times out after `stateTimeout` of event-time
   * inactivity (watermark-driven), bounding state size on unbounded key
   * spaces. Output: (time, key, value, <x>_ewma).
   *
   * Late-data caveat: with event-time timeouts Spark drops events at or
   * before the current watermark — this includes an event at exactly the
   * epoch-0 instant against the initial watermark, so streams should carry
   * real (positive) event times.
   *
   * Cross-batch ordering caveat: rows are sorted within each micro-batch,
   * but an in-watermark row may still arrive in a later batch than a newer
   * row of the same key. Such a row is folded in with its decay gap clamped
   * at 0 (treated as simultaneous with the newest row seen), so state never
   * amplifies; its contribution is approximate versus a fully ordered batch
   * replay. Use the batch [[graft.ts.EmaOps.ewmaRows]] when exact
   * order-sensitive values over late data matter.
   */
  def ewmaStateful(df: DataFrame, xCol: String, key: String,
                   alpha: Double = 0.05, durationPerPeriod: String = "1d",
                   convention: String = "legacy",
                   watermarkDelay: String = "0 seconds",
                   stateTimeout: String = "30 days"): DataFrame = {
    require(Seq("core", "legacy").contains(convention))
    val logDecay = math.log(1.0 - alpha)
    val perPeriod = TimeSeriesOps.parseDuration(durationPerPeriod).toDouble
    val spark = df.sparkSession
    import spark.implicits._

    val in = withEventTime(df).withWatermark(EventTs, watermarkDelay)
      .select(F.col(TimeColumn), F.col(key).cast("string").as("__k"),
        F.col(xCol).cast("double").as("__x"), F.col(EventTs))
      // FilterNullInput parity with batch ewma — and the tuple encoder
      // below decodes __x into a primitive, which a null would crash
      .filter(F.col("__x").isNotNull && F.col(TimeColumn).isNotNull)

    val outSchema = StructType(Seq(
      StructField(TimeColumn, LongType),
      StructField(key, StringType),
      StructField(xCol, DoubleType),
      StructField(s"${xCol}_ewma", DoubleType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)

    in.as[(Long, String, Double, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (k: String, rows: Iterator[(Long, String, Double, java.sql.Timestamp)],
         state: GroupState[(Long, Double, Double)]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (lastT, primary, aux) = state.getOption.getOrElse((Long.MinValue, 0.0, 0.0))
            val out = rows.toSeq.sortBy(_._1).map { case (t, _, x, _) =>
              if (lastT == Long.MinValue) { primary = x; aux = 1.0 }
              else {
                // Rows are ordered within a batch, but an in-watermark late
                // row can still be older than the state's lastT from a
                // previous batch. Clamp the gap at 0 (decay = 1, i.e.
                // treated as simultaneous with the newest row seen) —
                // exp(k*dt) with dt < 0 would exceed 1 and amplify state.
                val periods = math.max(0.0, (t - lastT) / perPeriod)
                val decay = math.exp(periods * logDecay)
                primary = decay * primary + x
                aux = decay * aux + 1.0
              }
              // max, not assignment: a clamped late row must not rewind the
              // clock, or the next in-order row would pay its decay twice.
              lastT = math.max(lastT, t)
              Row(t, k, x, if (convention == "core") primary / aux else primary)
            }
            state.update((lastT, primary, aux))
            if (state.getCurrentWatermarkMs() > 0) {
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() +
                TimeSeriesOps.parseDuration(stateTimeout) / 1000000L)
            }
            out.iterator
          }
        }).toDF(TimeColumn, key, xCol, s"${xCol}_ewma")
  }
}
