package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** Count-min sketch: lane-hash parity with a plain-Scala replay of the
  * portable chain, the over-count guarantee, and degenerate widths. */
class CmsSpec extends SparkTestBase {
  import spark.implicits._

  private def mix32(v0: Long): Long = {
    var x = v0 & 0xFFFFFFFFL
    x = ((x ^ (x >>> 16)) * 0x45d9f3bL) & 0xFFFFFFFFL
    x = ((x ^ (x >>> 16)) * 0x45d9f3bL) & 0xFFFFFFFFL
    x ^ (x >>> 16)
  }
  private def laneCell(tok: String, lane: Int, width: Int): Int = {
    var h = 2166136261L
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      h = (h * 1000003L + cp) & 0xFFFFFFFFL
      i += Character.charCount(cp)
    }
    lane * width + (mix32((h + lane.toLong * 2654435761L) & 0xFFFFFFFFL)
      % width).toInt
  }

  behavior of "cmsSketch"

  it should "equal a plain-Scala rebuild of the cell counts" in {
    val rows = Seq("the cat sat on the mat", "el gato  y", "", "héllo 漢字")
    val (depth, width) = (4, 64)
    val got = TextStats.cmsSketch(rows.toDF("text"), "text", depth, width)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = rows.flatMap(_.split(" ", -1))
      .flatMap(t => (0 until depth).map(laneCell(t, _, width)))
      .groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    got shouldBe want
  }

  it should "agree with tokenBuckets on lane 0" in {
    // lane 0 of the CMS chain IS portableHash32 — the NB bucket function
    val toks = Seq("alpha", "beta", "漢", "")
    val width = 32
    val cms = toks.toDF("t")
      .select(org.apache.spark.sql.graft.GraftColumns
        .cmsTokenCoords(F.col("t"), 1, width).getItem(0))
      .collect().map(_.getInt(0))
    val nb = toks.toDF("t")
      .select(org.apache.spark.sql.graft.GraftColumns
        .tokenBuckets(F.col("t"), width).getItem(0))
      .collect().map(_.getInt(0))
    cms.toList shouldBe nb.toList
  }

  behavior of "cmsHeavyHitters"

  it should "never under-count, and be exact when width is collision-free" in {
    val corpus = (1 to 50).map(i => s"tok${i % 7} filler${i % 13} x$i")
    val out = TextStats.cmsHeavyHitters(corpus.toDF("text"), "text",
      k = 10, depth = 4, width = 4096).collect()
    out.length shouldBe 10
    out.foreach(r => r.getLong(2) should be >= r.getLong(1))
    // 4096 cells for ~70 distinct tokens: all-lane collisions are
    // essentially impossible, so estimates are exact here
    out.foreach(r => r.getLong(2) shouldBe r.getLong(1))
  }

  it should "degrade to the total token count at width 1" in {
    val df = Seq("a b c", "a b").toDF("text")
    val out = TextStats.cmsHeavyHitters(df, "text", k = 3,
      depth = 2, width = 1).collect()
    out.foreach(r => r.getLong(2) shouldBe 5L) // every token shares the cell
  }
}
