package graft.llm

import graft.SparkTestBase

/** Per-line language segmentation: majority vote, the alphabetical
  * tie-break, blank-line exclusion, and the no-content null row. */
class LangSegmentsSpec extends SparkTestBase {
  import spark.implicits._

  private val en = "the cat is on the mat and it"
  private val es = "el gato y el perro en la casa"
  private val de = "der hund und die katze ist von den"

  behavior of "langSegments"

  it should "vote the majority language per doc and flag mixing" in {
    val df = Seq(
      (1L, s"$en\n$en\n$es"),        // 2 en vs 1 es
      (2L, s"$es\n   \n\n$es\n$en"), // blanks excluded; 2 es vs 1 en
      (3L, en),                      // single line
      (4L, "   \n  "),               // nothing non-blank
      (5L, s"$en\n$de")              // 1-1 tie -> 'de' (alphabetical)
    ).toDF("doc_id", "text")
    val got = TextStats.langSegments(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) null else java.lang.Boolean.valueOf(r.getBoolean(4))))
    got.toList shouldBe List(
      (1L, "en", 3L, 2L, java.lang.Boolean.TRUE),
      (2L, "es", 3L, 2L, java.lang.Boolean.TRUE),
      (3L, "en", 1L, 1L, java.lang.Boolean.FALSE),
      (4L, null, -1L, -1L, null),
      (5L, "de", 2L, 2L, java.lang.Boolean.TRUE))
  }

  it should "match a plain-Scala replay on random multi-line pages" in {
    val langs = Map("en" -> en, "es" -> es, "de" -> de,
      "fr" -> "le chat est dans la maison et une", "zh" -> "漢 字 漢 字")
    val rnd = new scala.util.Random(7)
    val rows = (1L to 60L).map { id =>
      val n = 1 + rnd.nextInt(5)
      val lines = (0 until n).map(_ => langs.values.toSeq(rnd.nextInt(5))) ++
        (if (rnd.nextBoolean()) Seq("  ") else Nil)
      (id, rnd.shuffle(lines).mkString("\n"))
    }
    // independent replay: per-line kernel labels via the engine itself on
    // single lines (already oracle-pinned), majority by (count desc, lang)
    val lineLabel: String => String = {
      val cache = scala.collection.mutable.Map[String, String]()
      l => cache.getOrElseUpdate(l, {
        Seq(l).toDF("t")
          .select(TextStats.langId(org.apache.spark.sql.functions.col("t")))
          .head().getString(0)
      })
    }
    val want = rows.map { case (id, page) =>
      val nb = page.split("\n", -1).filter(_.trim.nonEmpty)
      if (nb.isEmpty) (id, null, -1L, -1L)
      else {
        val c = nb.map(lineLabel).groupBy(identity).map { case (k, v) => k -> v.size }
        val major = c.toSeq.minBy { case (l, n) => (-n, l) }._1
        (id, major, nb.length.toLong, c.size.toLong)
      }
    }
    val got = TextStats.langSegments(rows.toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    got.toList shouldBe want.toList
  }
}
