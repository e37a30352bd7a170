package graft.ts

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** As-of join corner cases (≙ reference LeftJoinSpec/FutureLeftJoinSpec:
  * tolerance=0 exact matching, ties, null-padding, empty sides, aliases,
  * and the deterministic tie-break added in round 4). */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def left(rows: (Long, String)*) = rows.toDF("time", "k")
  private def right(rows: (Long, String, Int)*) = rows.toDF("time", "k", "v")

  private def joined(l: Seq[(Long, String)], r: Seq[(Long, String, Int)],
                     tol: String, future: Boolean = false,
                     strict: Boolean = false) = {
    val lf = left(l: _*)
    val rf = right(r: _*)
    val out =
      if (future) AsOfJoin.futureLeftJoin(lf, rf, tol, Seq("k"), strictLookahead = strict)
      else AsOfJoin.leftJoin(lf, rf, tol, Seq("k"))
    out.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getInt(2)))).sortBy(x => (x._1, x._2))
  }

  behavior of "leftJoin (backward as-of)"

  it should "pick the most recent right row within tolerance" in {
    joined(Seq((10L, "a")), Seq((5L, "a", 1), (8L, "a", 2), (12L, "a", 9)),
      "3ns") shouldBe Array((10L, "a", Some(2)))
  }

  it should "null-pad when the nearest right row is outside tolerance" in {
    joined(Seq((10L, "a")), Seq((6L, "a", 1)), "3ns") shouldBe
      Array((10L, "a", None))
  }

  it should "treat tolerance 0ns as exact-timestamp matching" in {
    joined(Seq((10L, "a"), (11L, "a")), Seq((10L, "a", 7)), "0ns") shouldBe
      Array((10L, "a", Some(7)), (11L, "a", None))
  }

  it should "match only rows sharing the key" in {
    joined(Seq((10L, "a"), (10L, "b")), Seq((9L, "b", 5)), "5ns") shouldBe
      Array((10L, "a", None), (10L, "b", Some(5)))
  }

  it should "see a right row at exactly the left time" in {
    joined(Seq((10L, "a")), Seq((10L, "a", 3)), "5ns") shouldBe
      Array((10L, "a", Some(3)))
  }

  it should "break right-side ties at identical (key, time) deterministically" in {
    // Two right rows at the same instant: winner = greatest value tuple,
    // regardless of input order or partitioning.
    val r1 = Seq((10L, "a", 1), (10L, "a", 2))
    joined(Seq((10L, "a")), r1, "5ns") shouldBe Array((10L, "a", Some(2)))
    joined(Seq((10L, "a")), r1.reverse, "5ns") shouldBe Array((10L, "a", Some(2)))
  }

  it should "handle an empty right side with all-null padding" in {
    joined(Seq((10L, "a")), Seq.empty, "5ns") shouldBe Array((10L, "a", None))
  }

  it should "return no rows for an empty left side" in {
    joined(Seq.empty, Seq((10L, "a", 1)), "5ns") shouldBe Array.empty
  }

  it should "match null keys to null keys like the reference's SK map" in {
    val l = Seq((10L, null.asInstanceOf[String]), (10L, "a")).toDF("time", "k")
    val r = Seq((9L, null.asInstanceOf[String], 7), (8L, "a", 8)).toDF("time", "k", "v")
    AsOfJoin.leftJoin(l, r, "5ns", Seq("k")).collect()
      .map(row => (Option(row.getString(1)), row.getInt(2)))
      .sortBy(_._1) shouldBe Array((None, 7), (Some("a"), 8))
  }

  it should "reject negative tolerance" in {
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.leftJoin(left((1L, "a")), right((1L, "a", 1)), "-1ns", Seq("k"))
  }

  behavior of "futureLeftJoin (forward as-of)"

  it should "pick the nearest future right row within tolerance" in {
    joined(Seq((10L, "a")), Seq((11L, "a", 4), (13L, "a", 5), (9L, "a", 6)),
      "5ns", future = true) shouldBe Array((10L, "a", Some(4)))
  }

  it should "include a right row at exactly t when not strict" in {
    joined(Seq((10L, "a")), Seq((10L, "a", 7), (11L, "a", 8)),
      "5ns", future = true) shouldBe Array((10L, "a", Some(7)))
  }

  it should "exclude a right row at exactly t when strictLookahead" in {
    joined(Seq((10L, "a")), Seq((10L, "a", 7), (11L, "a", 8)),
      "5ns", future = true, strict = true) shouldBe Array((10L, "a", Some(8)))
  }

  it should "null-pad when the nearest future row is beyond tolerance" in {
    joined(Seq((10L, "a")), Seq((16L, "a", 1)), "5ns", future = true) shouldBe
      Array((10L, "a", None))
  }

  behavior of "binned as-of join (scale path)"

  it should "produce identical results to the unbinned plan" in {
    val rnd = new scala.util.Random(42)
    val lrows = Seq.tabulate(300)(i =>
      (rnd.nextInt(1000).toLong, if (rnd.nextBoolean()) "a" else "b", i))
    val rrows = Seq.tabulate(300)(i =>
      (rnd.nextInt(1000).toLong, if (rnd.nextBoolean()) "a" else "b", i + 1000))
    val lf = lrows.toDF("time", "k", "lv")
    val rf = rrows.toDF("time", "k", "rv")
    for (tol <- Seq("7ns", "40ns", "1000ns")) {
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).sortBy(_.toString)
      norm(AsOfJoin.leftJoin(lf, rf, tol, Seq("k"), binned = true)) shouldBe
        norm(AsOfJoin.leftJoin(lf, rf, tol, Seq("k")))
      norm(AsOfJoin.futureLeftJoin(lf, rf, tol, Seq("k"), binned = true)) shouldBe
        norm(AsOfJoin.futureLeftJoin(lf, rf, tol, Seq("k")))
      norm(AsOfJoin.futureLeftJoin(lf, rf, tol, Seq("k"),
        strictLookahead = true, binned = true)) shouldBe
        norm(AsOfJoin.futureLeftJoin(lf, rf, tol, Seq("k"), strictLookahead = true))
      // keyless: the case binning exists for
      norm(AsOfJoin.leftJoin(lf.drop("k"), rf.drop("k"), tol, binned = true)) shouldBe
        norm(AsOfJoin.leftJoin(lf.drop("k"), rf.drop("k"), tol))
    }
  }

  it should "reject binned mode with zero tolerance" in {
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.leftJoin(left((1L, "a")), right((1L, "a", 1)), "0ns", Seq("k"),
        binned = true)
  }

  behavior of "leftJoinMerge (phase-2 range-merge operator)"

  it should "produce identical results to the union-window plan" in {
    val rnd = new scala.util.Random(7)
    // unique (k, time) pairs so tie semantics cannot differ between paths
    val lrows = rnd.shuffle(Seq.tabulate(400)(i =>
      ((i * 5).toLong, if (i % 3 == 0) "a" else "b", i)))
    val rrows = rnd.shuffle(Seq.tabulate(400)(i =>
      ((i * 7 + 1).toLong, if (i % 2 == 0) "a" else "b", i + 1000)))
    val lf = lrows.toDF("time", "k", "lv")
    val rf = rrows.toDF("time", "k", "rv")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString)
    for (tol <- Seq("0ns", "10ns", "500ns", "100000ns")) {
      norm(AsOfJoin.leftJoinMerge(lf, rf, tol, Seq("k"))) shouldBe
        norm(AsOfJoin.leftJoin(lf, rf, tol, Seq("k")))
    }
    // keyless (AllTuples distribution)
    norm(AsOfJoin.leftJoinMerge(lf.drop("k"), rf.drop("k"), "500ns")) shouldBe
      norm(AsOfJoin.leftJoin(lf.drop("k"), rf.drop("k"), "500ns"))
    // forward variants, strict and non-strict
    for (tol <- Seq("0ns", "10ns", "500ns")) {
      norm(AsOfJoin.futureLeftJoinMerge(lf, rf, tol, Seq("k"))) shouldBe
        norm(AsOfJoin.futureLeftJoin(lf, rf, tol, Seq("k")))
      norm(AsOfJoin.futureLeftJoinMerge(lf, rf, tol, Seq("k"),
        strictLookahead = true)) shouldBe
        norm(AsOfJoin.futureLeftJoin(lf, rf, tol, Seq("k"), strictLookahead = true))
    }
  }

  it should "handle a self-derived right side (duplicate exprIds)" in {
    val base = Seq((1L, "a", 1), (2L, "a", 2), (3L, "a", 3)).toDF("time", "k", "v")
    val l = base.filter($"v" =!= 2).select($"time", $"k", $"v".as("lv"))
    val r = base.filter($"v" === 2).select($"time", $"k", $"v".as("rv"))
    val out = AsOfJoin.leftJoinMerge(l, r, "5ns", Seq("k"))
      .orderBy("time").collect()
    out.map(row => (row.getLong(0),
      if (row.isNullAt(3)) None else Some(row.getInt(3)))) shouldBe
      Array((1L, None), (3L, Some(2)))
  }

  it should "match columns and null-padding of the union path" in {
    val l = Seq((10L, "a")).toDF("time", "k")
    val r = Seq((8L, "a", 1, "x")).toDF("time", "k", "v", "s")
    val out = AsOfJoin.leftJoinMerge(l, r, "5ns", Seq("k"))
    out.columns.toSeq shouldBe Seq("time", "k", "v", "s")
    out.collect().head shouldBe Row(10L, "a", 1, "x")
    val miss = AsOfJoin.leftJoinMerge(l, r, "1ns", Seq("k")).collect().head
    miss shouldBe Row(10L, "a", null, null)
  }

  it should "emit UnsafeRows usable by collect and sort on the raw builder" in {
    // Regression: the physical operator must apply a result projection —
    // a raw JoinedRow(GenericInternalRow null side) ClassCastExceptions in
    // executeCollect (casts to UnsafeRow) and in SortExec's row sorter.
    import org.apache.spark.sql.graft.AsOfMergeJoin
    val l = Seq((10L, "a"), (20L, "b")).toDF("time", "k")
    val r = Seq((8L, "a", 1)).toDF("time", "k", "v")
    val direct = AsOfMergeJoin.leftJoinMerge(l, r, 5L, Seq("k"), "time")
    direct.collect().map(_.toSeq).toSet shouldBe
      Set(Seq(10L, "a", 8L, "a", 1), Seq(20L, "b", null, null, null))
    // sort on the right-side value ("time" is ambiguous on the raw output:
    // both sides keep their column) — SortExec consumes the rows directly
    direct.orderBy($"v".desc_nulls_last).collect().head.getLong(0) shouldBe 10L
  }

  behavior of "symmetricJoin (full-outer as-of)"

  private def sym(l: Seq[(Long, String, Int)], r: Seq[(Long, String, Int)],
                  tol: String) = {
    val lf = l.toDF("time", "k", "lv")
    val rf = r.toDF("time", "k", "rv")
    AsOfJoin.symmetricJoin(lf, rf, tol, Seq("k"))
      .collect().map(row => (row.getLong(0), row.getString(4),
        if (row.isNullAt(2)) None else Some(row.getInt(2)),
        if (row.isNullAt(3)) None else Some(row.getInt(3))))
      .sortBy(x => (x._1, x._2))
  }

  it should "emit one row per input row with backward matches both ways" in {
    sym(Seq((10L, "a", 1)), Seq((8L, "a", 5), (12L, "a", 6)), "5ns") shouldBe
      Array(
        (8L, "right", None, Some(5)),      // no left at or before 8
        (10L, "left", Some(1), Some(5)),   // left@10 sees right@8
        (12L, "right", Some(1), Some(6)))  // right@12 sees left@10
  }

  it should "null-pad matches outside tolerance in both directions" in {
    sym(Seq((10L, "a", 1)), Seq((2L, "a", 5)), "3ns") shouldBe
      Array(
        (2L, "right", None, Some(5)),
        (10L, "left", Some(1), None))
  }

  it should "let equal-time rows see each other in both directions" in {
    sym(Seq((10L, "a", 1)), Seq((10L, "a", 5)), "0ns") shouldBe
      Array(
        (10L, "left", Some(1), Some(5)),
        (10L, "right", Some(1), Some(5)))
  }

  it should "respect keys in both directions" in {
    sym(Seq((10L, "a", 1)), Seq((9L, "b", 5)), "5ns") shouldBe
      Array(
        (9L, "right", None, Some(5)),
        (10L, "left", Some(1), None))
  }

  it should "reject inputs that already carry a 'side' column" in {
    val l = Seq((1L, "a", "x")).toDF("time", "k", "side")
    val r = Seq((1L, "a", 2)).toDF("time", "k", "rv")
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.symmetricJoin(l, r, "1ns", Seq("k"))
  }

  it should "produce identical results on the binned scale path (incl. keyless)" in {
    val l = (0 until 40).map(i => (i * 7L + 3, "k" + (i % 2), i))
    val r = (0 until 40).map(i => (i * 11L, "k" + (i % 2), i * 100))
    def run(key: Seq[String], binned: Boolean) = {
      val lf = (if (key.isEmpty) l.map(x => (x._1, x._3)).toDF("time", "lv")
                else l.toDF("time", "k", "lv"))
      val rf = (if (key.isEmpty) r.map(x => (x._1, x._3)).toDF("time", "rv")
                else r.toDF("time", "k", "rv"))
      AsOfJoin.symmetricJoin(lf, rf, "25ns", key, binned = binned)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    }
    run(Seq("k"), binned = true) shouldBe run(Seq("k"), binned = false)
    run(Seq.empty, binned = true) shouldBe run(Seq.empty, binned = false)
  }

  behavior of "aliases and clashes"

  it should "prefix right columns with rightAlias" in {
    val out = AsOfJoin.leftJoin(
      Seq((10L, "a", 1)).toDF("time", "k", "v"),
      Seq((9L, "a", 2)).toDF("time", "k", "v"),
      "5ns", Seq("k"), rightAlias = Some("r"))
    out.columns.toSeq shouldBe Seq("time", "k", "v", "r_v")
    out.select("r_v").as[Int].head() shouldBe 2
  }

  it should "reject colliding value column names without aliases" in {
    an[IllegalArgumentException] should be thrownBy AsOfJoin.leftJoin(
      Seq((10L, "a", 1)).toDF("time", "k", "v"),
      Seq((9L, "a", 2)).toDF("time", "k", "v"),
      "5ns", Seq("k"))
  }

  it should "carry multiple right value columns through one struct" in {
    val l = Seq((10L, "a")).toDF("time", "k")
    val r = Seq((8L, "a", 1, "x"), (9L, "a", 2, "y")).toDF("time", "k", "v", "s")
    val row = AsOfJoin.leftJoin(l, r, "5ns", Seq("k")).collect().head
    row shouldBe Row(10L, "a", 2, "y")
  }

  it should "not leak an older right value when matched row has a null column" in {
    // right@8 has s="x"; right@9 (the match) has s=null — the null must
    // survive (struct bundling prevents per-column last() leakage).
    val l = Seq((10L, "a")).toDF("time", "k")
    val r = Seq((8L, "a", 1, "x"), (9L, "a", 2, null))
      .toDF("time", "k", "v", "s")
    val row = AsOfJoin.leftJoin(l, r, "5ns", Seq("k")).collect().head
    row shouldBe Row(10L, "a", 2, null)
  }
}
