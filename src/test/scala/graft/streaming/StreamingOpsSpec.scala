package graft.streaming

import graft.SparkTestBase
import graft.ts.Summarizers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/**
 * Structured Streaming operators: event-time windowed summarize (batch
 * parity + incremental micro-batch execution), session windows, and
 * cross-batch stateful EWMA via flatMapGroupsWithState.
 */
class StreamingOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val S = 1000000000L // 1s in nanos

  behavior of "summarizeTumbling"

  it should "bucket event time into tumbling windows on a batch frame" in {
    val df = Seq(
      (0L, "a", 1.0), (30 * S, "a", 2.0), (90 * S, "a", 4.0), (30 * S, "b", 8.0))
      .toDF("time", "k", "v")
    val out = StreamingOps.summarizeTumbling(df, Summarizers.sum("v"),
      "1 minute", "0 seconds", Seq("k"))
      .orderBy("window_start", "k").collect()
    out.map(r => (r.getLong(0), r.getString(2), r.getDouble(3))) shouldBe Array(
      (0L, "a", 3.0), (0L, "b", 8.0), (60L * S, "a", 4.0))
  }

  it should "emit overlapping windows when sliding" in {
    val df = Seq((30 * S, "a", 1.0)).toDF("time", "k", "v")
    val out = StreamingOps.summarizeSliding(df, Summarizers.count(),
      "1 minute", "30 seconds", "0 seconds", Seq("k"))
      .orderBy("window_start").collect()
    // a row at t=30s falls in windows [0,60) and [30,90)
    out.map(_.getLong(0)) shouldBe Array(0L, 30L * S)
  }

  it should "merge rows within the gap into one session" in {
    val df = Seq((0L, "a", 1.0), (5 * S, "a", 2.0), (60 * S, "a", 4.0))
      .toDF("time", "k", "v")
    val out = StreamingOps.summarizeSessions(df, Summarizers.sum("v"),
      "10 seconds", "0 seconds", Seq("k"))
      .orderBy("window_start").collect()
    out.map(r => (r.getLong(0), r.getDouble(3))) shouldBe Array(
      (0L, 3.0), (60L * S, 4.0))
  }

  behavior of "streaming execution"

  it should "aggregate tumbling windows incrementally over micro-batches" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val sdf = mem.toDF().toDF("time", "k", "v")
    val agg = StreamingOps.summarizeTumbling(sdf, Summarizers.sum("v"),
      "1 minute", "0 seconds", Seq("k"))
    val q = agg.writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    try {
      mem.addData((0L, "a", 1.0), (30 * S, "a", 2.0))
      q.processAllAvailable()
      mem.addData((40 * S, "a", 4.0)) // same window, later batch
      q.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .orderBy("window_start").collect()
      rows.map(r => (r.getLong(0), r.getDouble(3))) shouldBe Array((0L, 7.0))
    } finally q.stop()
  }

  it should "carry EWMA state across micro-batches" in {
    implicit val sqlCtx = spark.sqlContext
    val day = 86400L * S
    val mem = MemoryStream[(Long, String, Double)]
    val sdf = mem.toDF().toDF("time", "k", "v")
    val ewma = StreamingOps.ewmaStateful(sdf, "v", Seq("k"),
      alpha = 0.5, durationPerPeriod = "1d", convention = "legacy")
    val q = ewma.writeStream.format("memory").queryName("ewma_test")
      .outputMode("append").start()
    try {
      mem.addData((day, "a", 1.0), (2 * day, "a", 2.0))
      q.processAllAvailable()
      mem.addData((3 * day, "a", 3.0)) // decay must continue from batch 1
      q.processAllAvailable()
      val rows = spark.table("ewma_test").orderBy("time").collect()
      rows.map(_.getDouble(3)) shouldBe Array(1.0, 2.5, 4.25)
    } finally q.stop()
  }

  behavior of "dedupExactStream"

  it should "drop duplicate keys across micro-batches within the watermark" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val sdf = mem.toDF().toDF("time", "k", "v")
    val out = StreamingOps.dedupExactStream(sdf, Seq("k"), "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData((10 * S, "a", 1.0), (20 * S, "a", 2.0), (30 * S, "b", 3.0))
      q.processAllAvailable()
      mem.addData((40 * S, "a", 4.0), (50 * S, "c", 5.0)) // a is a dup
      q.processAllAvailable()
      val rows = spark.table("dedup_stream").orderBy("time").collect()
      rows.map(_.getString(1)) shouldBe Array("a", "b", "c")
      rows.map(_.getDouble(2)) shouldBe Array(1.0, 3.0, 5.0)
    } finally q.stop()
  }

  behavior of "leftJoinStream (streaming as-of join)"

  it should "emit watermark-final as-of matches with null-padding" in {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, String, Int)]
    val rMem = MemoryStream[(Long, String, Int)]
    val l = lMem.toDF().toDF("time", "k", "lv")
    val r = rMem.toDF().toDF("time", "k", "rv")
    val j = StreamingOps.leftJoinStream(l, r, tolerance = "15s", key = Seq("k"),
      watermarkDelay = "0 seconds")
    j.columns.toSeq shouldBe Seq("time", "k", "lv", "rv")
    val q = j.writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      // batch 1: rights and lefts interleaved, out of order
      lMem.addData((12 * S, "a", 1), (5 * S, "a", 2))
      rMem.addData((10 * S, "a", 100))
      q.processAllAvailable()
      // batch 2: watermark is now 12s -> lefts 5 and 12 finalize;
      // left 25 stays pending, right 30 buffers
      lMem.addData((25 * S, "a", 3))
      rMem.addData((30 * S, "a", 200))
      q.processAllAvailable()
      // advance the watermark past 25s (sentinel on an unrelated key);
      // the pending left flushes via event-time timeout, not new "a" data
      rMem.addData((100 * S, "z", 999))
      q.processAllAvailable()
      val rows = spark.table("asof_stream").orderBy("time").collect()
      rows.map(r => (r.getLong(0) / S, r.getInt(2),
        if (r.isNullAt(3)) null else r.getInt(3))) shouldBe Array(
        (5L, 2, null),    // no right at or before t=5
        (12L, 1, 100),    // right@10 within 15s
        (25L, 3, 100))    // right@10 at exactly tolerance; right@30 is future
    } finally q.stop()
  }

  it should "pick the latest right and respect the tolerance lower bound" in {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, String, Int)]
    val rMem = MemoryStream[(Long, String, Int)]
    val l = lMem.toDF().toDF("time", "k", "lv")
    val r = rMem.toDF().toDF("time", "k", "rv")
    val j = StreamingOps.leftJoinStream(l, r, tolerance = "5s", key = Seq("k"),
      watermarkDelay = "0 seconds")
    val q = j.writeStream.format("memory").queryName("asof_stream2")
      .outputMode("append").start()
    try {
      rMem.addData((10 * S, "a", 100), (20 * S, "a", 250))
      lMem.addData((22 * S, "a", 1), (40 * S, "a", 2))
      q.processAllAvailable()
      rMem.addData((100 * S, "z", 0)) // advance watermark past both lefts
      q.processAllAvailable()
      val rows = spark.table("asof_stream2").orderBy("time").collect()
      rows.map(r => (r.getLong(0) / S,
        if (r.isNullAt(3)) null else r.getInt(3))) shouldBe Array(
        (22L, 250),  // latest right (20) wins over the earlier (10)
        (40L, null)) // right@20 is older than 40 - 5s -> outside tolerance
    } finally q.stop()
  }

  it should "support a bare (time, key) left side and keep tie order across batches" in {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, String)]
    val rMem = MemoryStream[(Long, String, Int)]
    val l = lMem.toDF().toDF("time", "k") // clock-sampling shape: no values
    val r = rMem.toDF().toDF("time", "k", "rv")
    val j = StreamingOps.leftJoinStream(l, r, tolerance = "15s", key = Seq("k"),
      watermarkDelay = "0 seconds")
    j.columns.toSeq shouldBe Seq("time", "k", "rv")
    val q = j.writeStream.format("memory").queryName("asof_stream3")
      .outputMode("append").start()
    try {
      // two rights at the SAME timestamp in one batch; the left row
      // finalizes in a LATER batch — the tie must still resolve to the
      // last-arrived right (250), as if everything ran in one batch
      rMem.addData((10 * S, "a", 100), (10 * S, "a", 250))
      lMem.addData((12 * S, "a"))
      q.processAllAvailable()
      rMem.addData((100 * S, "z", 0))
      q.processAllAvailable()
      val rows = spark.table("asof_stream3").collect()
      rows.map(r => (r.getLong(0) / S, r.getInt(2))) shouldBe Array((12L, 250))
    } finally q.stop()
  }

  behavior of "futureLeftJoinStream (streaming forward as-of join)"

  it should "match the earliest future right within tolerance, null-padding misses" in {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, String, Int)]
    val rMem = MemoryStream[(Long, String, Int)]
    val l = lMem.toDF().toDF("time", "k", "lv")
    val r = rMem.toDF().toDF("time", "k", "rv")
    val j = StreamingOps.futureLeftJoinStream(l, r, tolerance = "10s",
      key = Seq("k"), watermarkDelay = "0 seconds")
    j.columns.toSeq shouldBe Seq("time", "k", "lv", "rv")
    val q = j.writeStream.format("memory").queryName("future_stream")
      .outputMode("append").start()
    try {
      lMem.addData((5 * S, "a", 1), (20 * S, "a", 2))
      rMem.addData((8 * S, "a", 100), (12 * S, "a", 150))
      q.processAllAvailable()
      // watermark must pass t + tol before a left finalizes
      rMem.addData((100 * S, "z", 0))
      q.processAllAvailable()
      val rows = spark.table("future_stream").orderBy("time").collect()
      rows.map(r => (r.getLong(0) / S, r.getInt(2),
        if (r.isNullAt(3)) null else r.getInt(3))) shouldBe Array(
        (5L, 1, 100),   // earliest right >= 5 (8 beats 12)
        (20L, 2, null)) // no right in [20, 30]
    } finally q.stop()
  }

  it should "exclude the exact-time right under strict lookahead" in {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, String, Int)]
    val rMem = MemoryStream[(Long, String, Int)]
    val l = lMem.toDF().toDF("time", "k", "lv")
    val r = rMem.toDF().toDF("time", "k", "rv")
    val j = StreamingOps.futureLeftJoinStream(l, r, tolerance = "10s",
      key = Seq("k"), watermarkDelay = "0 seconds", strictLookahead = true)
    val q = j.writeStream.format("memory").queryName("future_strict_stream")
      .outputMode("append").start()
    try {
      lMem.addData((10 * S, "a", 1))
      rMem.addData((10 * S, "a", 100), (15 * S, "a", 150))
      q.processAllAvailable()
      rMem.addData((100 * S, "z", 0))
      q.processAllAvailable()
      val rows = spark.table("future_strict_stream").collect()
      // the right at exactly t=10 is excluded; 15 wins
      rows.map(r => (r.getLong(0) / S, r.getInt(3))) shouldBe Array((10L, 150))
    } finally q.stop()
  }

  it should "finalize a left only after the watermark passes t + tolerance" in {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, String, Int)]
    val rMem = MemoryStream[(Long, String, Int)]
    val l = lMem.toDF().toDF("time", "k", "lv")
    val r = rMem.toDF().toDF("time", "k", "rv")
    val j = StreamingOps.futureLeftJoinStream(l, r, tolerance = "20s",
      key = Seq("k"), watermarkDelay = "0 seconds")
    val q = j.writeStream.format("memory").queryName("future_finalize_stream")
      .outputMode("append").start()
    try {
      lMem.addData((10 * S, "a", 1))
      rMem.addData((12 * S, "z", 0)) // wm -> 12s: 10+20 > 12, left must wait
      q.processAllAvailable()
      spark.table("future_finalize_stream").count() shouldBe 0
      // the matching right arrives LATER than the left, before wm
      // passes t + tol — it must still win
      rMem.addData((25 * S, "a", 500))
      q.processAllAvailable()
      rMem.addData((100 * S, "z", 0))
      q.processAllAvailable()
      val rows = spark.table("future_finalize_stream").collect()
      rows.map(r => (r.getLong(0) / S, r.getInt(3))) shouldBe Array((10L, 500))
    } finally q.stop()
  }

  behavior of "multi-column keys (batch/stream API parity)"

  it should "join and aggregate on a two-column key with original types" in {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, String, Long, Int)]
    val rMem = MemoryStream[(Long, String, Long, Int)]
    val l = lMem.toDF().toDF("time", "k1", "k2", "lv")
    val r = rMem.toDF().toDF("time", "k1", "k2", "rv")
    val j = StreamingOps.leftJoinStream(l, r, tolerance = "15s",
      key = Seq("k1", "k2"), watermarkDelay = "0 seconds")
    j.columns.toSeq shouldBe Seq("time", "k1", "k2", "lv", "rv")
    j.schema("k2").dataType shouldBe org.apache.spark.sql.types.LongType
    val q = j.writeStream.format("memory").queryName("multikey_stream")
      .outputMode("append").start()
    try {
      rMem.addData((10 * S, "a", 1L, 100), (10 * S, "a", 2L, 200))
      lMem.addData((12 * S, "a", 1L, 1), (12 * S, "a", 2L, 2))
      q.processAllAvailable()
      rMem.addData((100 * S, "z", 0L, 0))
      q.processAllAvailable()
      val rows = spark.table("multikey_stream").orderBy("k2").collect()
      rows.map(r => (r.getString(1), r.getLong(2), r.getInt(4))) shouldBe
        Array(("a", 1L, 100), ("a", 2L, 200))
    } finally q.stop()
  }

  it should "not collide composite keys whose values contain separator-like content" in {
    implicit val sqlCtx = spark.sqlContext
    val day = 86400L * S
    val mem = MemoryStream[(Long, String, String, Double)]
    val sdf = mem.toDF().toDF("time", "k1", "k2", "v")
    val ewma = StreamingOps.ewmaStateful(sdf, "v", Seq("k1", "k2"),
      alpha = 0.5, durationPerPeriod = "1d", convention = "legacy")
    val q = ewma.writeStream.format("memory").queryName("inj_key_ewma")
      .outputMode("append").start()
    try {
      // ("a:b", "c") and ("a", "b:c") must be DIFFERENT state groups; a
      // naive delimiter concat would merge them (and their EWMA decay)
      mem.addData((day, "a:b", "c", 1.0), (day, "a", "b:c", 10.0),
        (2 * day, "a:b", "c", 2.0), (2 * day, "a", "b:c", 20.0))
      q.processAllAvailable()
      val rows = spark.table("inj_key_ewma").orderBy("k1", "time").collect()
      rows.map(r => (r.getString(1), r.getDouble(4))) shouldBe Array(
        ("a", 10.0), ("a", 25.0), ("a:b", 1.0), ("a:b", 2.5))
    } finally q.stop()
  }

  it should "carry EWMA state per composite key" in {
    implicit val sqlCtx = spark.sqlContext
    val day = 86400L * S
    val mem = MemoryStream[(Long, String, Long, Double)]
    val sdf = mem.toDF().toDF("time", "k1", "k2", "v")
    val ewma = StreamingOps.ewmaStateful(sdf, "v", Seq("k1", "k2"),
      alpha = 0.5, durationPerPeriod = "1d", convention = "legacy")
    ewma.columns.toSeq shouldBe Seq("time", "k1", "k2", "v", "v_ewma")
    val q = ewma.writeStream.format("memory").queryName("multikey_ewma")
      .outputMode("append").start()
    try {
      mem.addData((day, "a", 1L, 1.0), (day, "a", 2L, 10.0),
        (2 * day, "a", 1L, 2.0), (2 * day, "a", 2L, 20.0))
      q.processAllAvailable()
      val rows = spark.table("multikey_ewma").orderBy("k2", "time").collect()
      rows.map(_.getDouble(4)) shouldBe Array(1.0, 2.5, 10.0, 25.0)
    } finally q.stop()
  }

  it should "clamp in-watermark late rows instead of amplifying state" in {
    implicit val sqlCtx = spark.sqlContext
    val day = 86400L * S
    val mem = MemoryStream[(Long, String, Double)]
    val sdf = mem.toDF().toDF("time", "k", "v")
    // generous watermark so the late row reaches the operator at all
    val ewma = StreamingOps.ewmaStateful(sdf, "v", Seq("k"),
      alpha = 0.5, durationPerPeriod = "1d", convention = "legacy",
      watermarkDelay = "10 days")
    val q = ewma.writeStream.format("memory").queryName("ewma_late_test")
      .outputMode("append").start()
    try {
      mem.addData((1 * day, "a", 1.0), (3 * day, "a", 3.0))
      q.processAllAvailable()
      // t=2d is OLDER than the stored lastT=3d: gap clamps to 0 (decay 1,
      // never > 1), and lastT must NOT rewind to 2d
      mem.addData((2 * day, "a", 2.0))
      q.processAllAvailable()
      mem.addData((4 * day, "a", 0.0)) // one period after lastT=3d
      q.processAllAvailable()
      val rows = spark.table("ewma_late_test").orderBy("time").collect()
      // 1.0; 0.25*1+3 = 3.25; clamped late row 3.25+2 = 5.25; 0.5*5.25 = 2.625
      rows.map(r => (r.getLong(0) / day, r.getDouble(3))) shouldBe
        Array((1L, 1.0), (2L, 5.25), (3L, 3.25), (4L, 2.625))
    } finally q.stop()
  }

  behavior of "writeTimePartitionedStream"

  it should "append micro-batches into the batch store's bucket layout" in {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_tps").toString
    val mem = MemoryStream[(Long, Double)]
    val sdf = mem.toDF().toDF("time", "v")
    val q = StreamingOps.writeTimePartitionedStream(sdf, s"$dir/t",
      granularity = "10ns", checkpoint = s"$dir/ck")
    try {
      mem.addData((5L, 1.0), (15L, 2.0))
      q.processAllAvailable()
      mem.addData((25L, 3.0), (7L, 4.0)) // second batch revisits bucket 0
      q.processAllAvailable()
      new java.io.File(s"$dir/t").list().filter(_.startsWith("time_bucket="))
        .sorted shouldBe Array("time_bucket=0", "time_bucket=1", "time_bucket=2")
      // the BATCH reader prunes and reads the streamed layout identically
      val back = graft.ts.Sources.fromTimePartitioned(spark, s"$dir/t",
        granularity = "10ns", beginNanos = Some(0L), endNanos = Some(20L))
      back.select("time", "v").as[(Long, Double)].collect().sortBy(_._1) shouldBe
        Array((5L, 1.0), (7L, 4.0), (15L, 2.0))
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  it should "refuse to mix batch and streaming writes on one store path" in {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_tps_mix").toString
    try {
      val batch = Seq((5L, 1.0)).toDF("time", "v")
      graft.ts.Sources.writeTimePartitioned(batch, s"$dir/store",
        granularity = "10ns", mode = "overwrite")
      // streaming into the batch store would hide its rows behind the log
      val mem = MemoryStream[(Long, Double)]
      an[IllegalArgumentException] should be thrownBy
        StreamingOps.writeTimePartitionedStream(
          mem.toDF().toDF("time", "v"), s"$dir/store",
          granularity = "10ns", checkpoint = s"$dir/ck")
      // and batch-writing into a streaming store is refused the same way
      val mem2 = MemoryStream[(Long, Double)]
      val q = StreamingOps.writeTimePartitionedStream(
        mem2.toDF().toDF("time", "v"), s"$dir/stream",
        granularity = "10ns", checkpoint = s"$dir/ck2")
      try { mem2.addData((5L, 1.0)); q.processAllAvailable() } finally q.stop()
      an[IllegalArgumentException] should be thrownBy
        graft.ts.Sources.writeTimePartitioned(batch, s"$dir/stream",
          granularity = "10ns", mode = "append")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
