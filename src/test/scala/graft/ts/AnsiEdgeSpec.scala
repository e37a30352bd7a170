package graft.ts

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** ANSI-mode edge inputs that must render null (the reference's Scala
  * doubles yield NaN there), never raise DIVIDE_BY_ZERO. */
class AnsiEdgeSpec extends SparkTestBase {
  import spark.implicits._

  behavior of "ANSI division edges"

  it should "render null for single-point previous/core ES (0/0 auxiliary)" in {
    val df = Seq((0L, "k", 7.5)).toDF("time", "k", "v")
    val out = EmaOps.exponentialSmoothing(df, "v", Seq("k"),
      interpolation = "previous", convention = "core").collect()
    out.length shouldBe 1
    out.head.isNullAt(2) shouldBe true
  }

  it should "render null variance/stddev on singleton groups" in {
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "b", 4.0))
      .toDF("time", "k", "v")
    val r = Summarize.summarize(df,
      Summarizers.variance("v") ++ Summarizers.stddev("v"), Seq("k"))
      .orderBy("k").collect()
    r(0).isNullAt(2) shouldBe true   // n=1 -> null, not an error
    approx(r(1).getDouble(2), 2.0, 1e-12)
  }

  it should "render null correlation on constant series" in {
    val df = Seq((1L, 1.0, 5.0), (2L, 2.0, 5.0), (3L, 3.0, 5.0))
      .toDF("time", "x", "y")
    val r = Summarize.summarize(df, Summarizers.correlation("x", "y"))
      .collect().head
    r.isNullAt(1) shouldBe true
    r.isNullAt(2) shouldBe true
  }

  it should "render null weighted stats when weights sum to zero" in {
    val df = Seq((1L, 1.0, 2.0, 0.0), (2L, 3.0, 4.0, 0.0))
      .toDF("time", "x", "y", "w")
    val r = Summarize.summarize(df,
      Summarizers.weightedCovariance("x", "y", "w")).collect().head
    r.isNullAt(1) shouldBe true
  }

  it should "render null skewness/kurtosis on constant series" in {
    val df = Seq((1L, 3.0), (2L, 3.0), (3L, 3.0)).toDF("time", "v")
    val r = Summarize.summarize(df,
      Summarizers.skewness("v") ++ Summarizers.kurtosis("v")).collect().head
    r.isNullAt(1) shouldBe true
    r.isNullAt(2) shouldBe true
  }

  it should "render null punctuation ratio for empty text" in {
    val df = Seq((1L, ""), (2L, "a.")).toDF("id", "text")
    val r = df.select(graft.llm.TextStats.punctRatio(F.col("text")))
      .collect()
    r(0).isNullAt(0) shouldBe true
    approx(r(1).getDouble(0), 0.5, 1e-12)
  }

  it should "survive empty and null text through pii / hard-filter / spans / chunks" in {
    import graft.llm.{Dedup, Pii, TextStats}
    val df = Seq((1L, ""), (2L, null: String), (3L, "the cat and the hat"))
      .toDF("id", "text")
    // PII: empty -> unchanged empty, null -> null, no errors
    val red = df.select(Pii.redact(F.col("text"))).collect()
    red(0).getString(0) shouldBe ""
    red(1).isNullAt(0) shouldBe true
    // hard filter: flags null out for null text, defined for empty text
    val hf = TextStats.hardFilter(df, "text", minWords = 2).orderBy("id").collect()
    hf(0).getAs[Boolean]("words_ok") shouldBe false  // [''] = 1 token
    hf(1).isNullAt(hf(1).fieldIndex("keep")) shouldBe true
    // spans / chunks: null and too-short docs simply produce no rows
    Dedup.duplicateSpans(df, "id", "text", n = 3).count() shouldBe 0L
    val ch = TextStats.chunkTokens(df, "id", "text", chunkSize = 4, stride = 4)
    ch.filter(F.col("id") === 2L).count() shouldBe 0L
    ch.filter(F.col("id") === 3L).count() shouldBe 2L
  }
}
