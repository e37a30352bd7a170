package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.{Row, functions => F}

import scala.util.Random

/**
 * Direct merge-algebra laws for the bounded aggregation buffers that five
 * search operators finish through ([[TopKAgg]]) and the √N-cell recipes
 * seed from ([[SeedsAgg]]) — the unit-level analog of the reference's
 * summarizer merge laws (SummarizerSuite.scala:110-357), exercised here on
 * the Aggregator API itself (zero/reduce/merge/finish) rather than only
 * through end-to-end queries:
 *
 *  - reduce-vs-merge equivalence: folding all rows into one buffer equals
 *    reducing random splits independently and merging in random order;
 *  - the zero buffer is a merge identity on both sides;
 *  - tie ordering at the k boundary is exact (score DESC, id ASC);
 *  - NaN scores have a TOTAL deterministic order (below every real score,
 *    id ASC among themselves) so partial-buffer arrival order can never
 *    change the result — the regression fixed in round 11.
 */
class TopKAggLawsSpec extends SparkTestBase {
  import spark.implicits._

  private def topkRun(agg: TopKAgg[Long], rows: Seq[(Long, Double)],
                      splits: Int, seed: Long): Seq[(Long, Double)] = {
    val rnd = new Random(seed)
    val shuffled = rnd.shuffle(rows)
    val parts = shuffled.grouped(math.max(1, (rows.size + splits - 1) / splits))
      .toSeq
    val bufs = parts.map(p =>
      p.foldLeft(agg.zero)((b, r) => agg.reduce(b, Row(r._1, r._2))))
    val merged = rnd.shuffle(bufs.toList)
      .foldLeft(agg.zero)((a, b) => agg.merge(a, b))
    agg.finish(merged).hits.map(h => (h.n_id, h.cosine))
  }

  behavior of "TopKAgg merge algebra"

  it should "satisfy reduce-vs-merge equivalence on random splits" in {
    val rnd = new Random(17L)
    val rows = Seq.tabulate(500)(i => (i.toLong, rnd.nextInt(40) / 10.0))
    val agg = new TopKAgg[Long](7)
    val sequential = topkRun(agg, rows, splits = 1, seed = 1L)
    for (s <- Seq(2, 5, 13, 97); trial <- 1 to 3) {
      topkRun(agg, rows, splits = s, seed = s * 1000L + trial) shouldBe sequential
    }
  }

  it should "treat the zero buffer as a two-sided merge identity" in {
    val agg = new TopKAgg[Long](3)
    val rows = Seq((1L, 0.5), (2L, 0.9), (3L, 0.1), (4L, 0.9))
    val b = rows.foldLeft(agg.zero)((b, r) => agg.reduce(b, Row(r._1, r._2)))
    agg.finish(agg.merge(b, agg.zero)).hits shouldBe agg.finish(b).hits
    val b2 = rows.foldLeft(agg.zero)((b, r) => agg.reduce(b, Row(r._1, r._2)))
    agg.finish(agg.merge(agg.zero, b2)).hits shouldBe agg.finish(b).hits
  }

  it should "break exact-score ties by id ASC at the k boundary" in {
    val agg = new TopKAgg[Long](3)
    // four candidates tied at the floor score; ids 10,20,30,40 — the k=3
    // survivors must be the three smallest ids, in id order after the
    // higher score
    val rows = Seq((40L, 0.5), (10L, 0.5), (99L, 0.9), (30L, 0.5), (20L, 0.5))
    topkRun(agg, rows, 1, 0L) shouldBe
      Seq((99L, 0.9), (10L, 0.5), (20L, 0.5))
    topkRun(agg, rows, 3, 5L) shouldBe
      Seq((99L, 0.9), (10L, 0.5), (20L, 0.5))
  }

  it should "break String-id ties in unsigned UTF-8 byte order" in {
    // UTF-16 code-unit order and UTF-8 byte order diverge exactly where
    // surrogates (supplementary code points, U+10000+) meet U+E000..U+FFFF
    // chars: UTF-16 sorts "𐀀" (U+10000) BEFORE "￿", UTF-8
    // bytes sort it after. The string instantiation must use byte order —
    // the order of a Spark/DuckDB row_number window over the same ties.
    val supp = new String(Character.toChars(0x10000)) // U+10000
    val priv = "" // BMP private-use, above surrogates in UTF-8
    assert(Ordering.String.lt(supp, priv)) // UTF-16 order: supp first
    assert(TopKAgg.Utf8ByteOrdering.lt(priv, supp)) // UTF-8 order: priv first
    val agg = new TopKAgg[String](2)(TopKAgg.Utf8ByteOrdering,
      implicitly, implicitly)
    val rows = Seq((supp, 0.5), (priv, 0.5), ("zz", 0.5))
    val b = rows.foldLeft(agg.zero)((b, r) => agg.reduce(b, Row(r._1, r._2)))
    // k=2 survivors of a three-way tie: the two UTF-8-smallest ids
    agg.finish(b).hits.map(_.n_id) shouldBe Seq("zz", priv)
    // random ASCII/BMP/astral soup: byte order == code-point order
    val rnd = new Random(110812L)
    def randStr() = (0 until rnd.nextInt(6)).map { _ =>
      rnd.nextInt(4) match {
        case 0 => ('a' + rnd.nextInt(26)).toChar.toString
        case 1 => "é"
        case 2 => ""
        case 3 => new String(Character.toChars(0x1F600 + rnd.nextInt(16)))
      }
    }.mkString
    (1 to 300).foreach { _ =>
      val a = randStr(); val c = randStr()
      val byCp = Integer.compare(
        a.codePoints.toArray.zipAll(c.codePoints.toArray, -1, -1)
          .find(p => p._1 != p._2).map(p => p._1 - p._2).getOrElse(0), 0)
      Integer.signum(TopKAgg.Utf8ByteOrdering.compare(a, c)) shouldBe byCp
    }
  }

  it should "rank NaN below every real score with a deterministic id order" in {
    val agg = new TopKAgg[Long](4)
    val rows = Seq((1L, Double.NaN), (2L, Double.NaN), (3L, Double.NaN),
      (4L, Double.NegativeInfinity), (5L, -3.0))
    // NaN loses to -Inf and any finite score; NaN-vs-NaN ties break id ASC
    val want = Seq((5L, -3.0), (4L, Double.NegativeInfinity))
    val got = topkRun(agg, rows, 1, 0L)
    got.take(2) shouldBe want
    got.drop(2).map(_._1) shouldBe Seq(1L, 2L)
    got.drop(2).foreach(h => assert(h._2.isNaN))
  }

  it should "be partition-invariant when >=k NaN scores precede finite ones" in {
    // the r10 regression: a NaN-filled partial buffer rejected every later
    // finite candidate, so results depended on merge order. With the total
    // order, every split/merge layout must agree.
    val rows = Seq.tabulate(20)(i => (i.toLong, Double.NaN)) ++
      Seq((100L, 0.2), (101L, 0.9), (102L, 0.4))
    val agg = new TopKAgg[Long](5)
    val sequential = topkRun(agg, rows, 1, 0L)
    sequential.take(3) shouldBe Seq((101L, 0.9), (102L, 0.4), (100L, 0.2))
    sequential.drop(3).map(_._1) shouldBe Seq(0L, 1L)
    // NaN != NaN under tuple equality; compare through the bit pattern
    def bits(s: Seq[(Long, Double)]) =
      s.map { case (i, d) => (i, java.lang.Double.doubleToLongBits(d)) }
    for (s <- Seq(2, 4, 11, 23); trial <- 1 to 4) {
      bits(topkRun(agg, rows, s, s * 31L + trial)) shouldBe bits(sequential)
    }
  }

  it should "be partition-invariant end-to-end through the udaf with NaN scores" in {
    val rows = Seq.tabulate(30)(i =>
      (i % 3L, i.toLong, if (i < 12) Double.NaN else (i % 7) / 7.0))
    val top = TopKAgg.topKUdaf(4, org.apache.spark.sql.types.LongType)
    def run(parts: Int) =
      rows.toDF("q_id", "n_id", "cosine").repartition(parts)
        .groupBy("q_id").agg(top(F.col("n_id"), F.col("cosine")).as("top"))
        .select(F.col("q_id"), F.posexplode(F.col("top.hits")))
        .collect().map(_.toString).sorted.toSeq
    val one = run(1)
    run(7) shouldBe one
    run(29) shouldBe one
  }

  behavior of "SeedsAgg merge algebra"

  private def seedsRun(agg: SeedsAgg, rows: Seq[(Long, Seq[Float])],
                       splits: Int, seed: Long): Seq[(Long, Seq[Float])] = {
    val rnd = new Random(seed)
    val shuffled = rnd.shuffle(rows)
    val parts = shuffled.grouped(math.max(1, (rows.size + splits - 1) / splits))
      .toSeq
    val bufs = parts.map(p =>
      p.foldLeft(agg.zero)((b, r) => agg.reduce(b, Row(r._1, r._2))))
    val merged = rnd.shuffle(bufs.toList)
      .foldLeft(agg.zero)((a, b) => agg.merge(a, b))
    agg.finish(merged).hits.map(h => (h.id, h.vec))
  }

  it should "satisfy reduce-vs-merge equivalence and keep the cap smallest ids" in {
    val rnd = new Random(23L)
    val rows = rnd.shuffle(Seq.tabulate(300)(i =>
      (i.toLong, Seq(i.toFloat, (i * 2).toFloat))))
    val agg = new SeedsAgg(8)
    val sequential = seedsRun(agg, rows, 1, 0L)
    sequential shouldBe Seq.tabulate(8)(i =>
      (i.toLong, Seq(i.toFloat, (i * 2).toFloat)))
    for (s <- Seq(3, 10, 41); trial <- 1 to 3) {
      seedsRun(agg, rows, s, s * 7L + trial) shouldBe sequential
    }
    agg.finish(agg.merge(agg.zero, agg.zero)).hits shouldBe Seq.empty
  }

  it should "treat the zero buffer as a merge identity and skip null rows" in {
    val agg = new SeedsAgg(3)
    val b = Seq((5L, Seq(1f)), (2L, Seq(2f)))
      .foldLeft(agg.zero)((b, r) => agg.reduce(b, Row(r._1, r._2)))
    val viaZero = agg.merge(agg.zero, b)
    agg.finish(viaZero).hits.map(_.id) shouldBe Seq(2L, 5L)
    val withNull = agg.reduce(b, Row(null, Seq(3f)))
    agg.finish(withNull).hits.map(_.id) shouldBe Seq(2L, 5L)
  }
}
