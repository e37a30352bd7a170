package graft

import graft.ts.{Summarize, Summarizers}
import org.apache.spark.sql.{functions => F}

import scala.util.Random

/**
 * Partition-distribution invariance of the custom aggregates: the same
 * input under different physical layouts must produce (numerically) the
 * same result — the DataFrame-level analog of the reference's
 * associativity/identity merge laws (SummarizerSuite.scala:110-357).
 */
class AggLawsSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(20260812L)
  private val rows = Seq.tabulate(200) { i =>
    (i.toLong, rnd.nextDouble() * 100 - 50, rnd.nextDouble() * 10,
      rnd.nextDouble() + 0.1)
  }

  private def df(parts: Int) =
    rows.toDF("time", "x", "y", "w").repartition(parts)

  it should "give partition-invariant OLS results" in {
    val s = Summarizers.OLSRegression("y", Seq("x"), weight = Some("w"))
    val a = Summarize.summarize(df(1), s).collect().head.getStruct(1)
    val b = Summarize.summarize(df(13), s).collect().head.getStruct(1)
    a.getLong(0) shouldBe b.getLong(0)
    approx(a.getSeq[Double](1).head, b.getSeq[Double](1).head, 1e-9)
    approx(a.getDouble(2), b.getDouble(2), 1e-9)
    approx(a.getDouble(3), b.getDouble(3), 1e-9)
    approx(a.getSeq[Double](4).head, b.getSeq[Double](4).head, 1e-9)
  }

  it should "match closed-form weighted OLS on the Gram matrix" in {
    // independent test-side solve of the 2x2 normal equations
    val sw = rows.map(_._4).sum
    val sx = rows.map(r => r._2 * r._4).sum
    val sxx = rows.map(r => r._2 * r._2 * r._4).sum
    val sy = rows.map(r => r._3 * r._4).sum
    val sxy = rows.map(r => r._2 * r._3 * r._4).sum
    val det = sw * sxx - sx * sx
    val beta = (sw * sxy - sx * sy) / det
    val intercept = (sxx * sy - sx * sxy) / det
    val got = Summarize.summarize(df(4),
      Summarizers.OLSRegression("y", Seq("x"), weight = Some("w")))
      .collect().head.getStruct(1)
    approx(got.getSeq[Double](1).head, beta, 1e-8)
    approx(got.getDouble(2), intercept, 1e-8)
  }

  it should "give partition-invariant Kahan sums equal to the exact sum" in {
    val exact = rows.map(r => BigDecimal(r._2)).sum.toDouble
    for (p <- Seq(1, 7, 32)) {
      val got = Summarize.summarize(df(p), Summarizers.kahanSum("x"))
        .collect().head.getDouble(1)
      approx(got, exact, 1e-9)
    }
  }

  it should "give partition-invariant one-pass moment stats" in {
    val s = Summarizers.variance("x") ++ Summarizers.skewness("x") ++
      Summarizers.kurtosis("x")
    val a = Summarize.summarize(df(1), s).collect().head
    val b = Summarize.summarize(df(29), s).collect().head
    approx(a.getDouble(1), b.getDouble(1), 1e-9)
    approx(a.getDouble(2), b.getDouble(2), 1e-9)
    approx(a.getDouble(3), b.getDouble(3), 1e-9)
  }

  // The four estimators re-derived to reference conventions in the golden
  // sweep (population covariance, reliability-weighted covariance, the
  // weightedMeanTest state machine, nthMoment n=0): pin both the numeric
  // VALUE (closed form over the raw rows) and partition invariance across
  // the {1, 2, 7} layout matrix, so a merge-path change can't silently
  // un-fix them.
  it should "keep population covariance exact and partition-invariant" in {
    val n = rows.length
    val mx = rows.map(_._2).sum / n
    val my = rows.map(_._3).sum / n
    val cov = rows.map(r => (r._2 - mx) * (r._3 - my)).sum / n
    for (p <- Seq(1, 2, 7)) {
      val got = Summarize.summarize(df(p), Summarizers.covariance("x", "y"))
        .collect().head.getDouble(1)
      approx(got, cov, 1e-9)
    }
  }

  it should "keep reliability-weighted covariance exact and partition-invariant" in {
    // coMoment / (sumW - sumW2/sumW), weighted means
    val sw = rows.map(_._4).sum
    val sw2 = rows.map(r => r._4 * r._4).sum
    val mx = rows.map(r => r._2 * r._4).sum / sw
    val my = rows.map(r => r._3 * r._4).sum / sw
    val com = rows.map(r => r._4 * (r._2 - mx) * (r._3 - my)).sum
    val wcov = com / (sw - sw2 / sw)
    for (p <- Seq(1, 2, 7)) {
      val got = Summarize.summarize(df(p),
        Summarizers.weightedCovariance("x", "y", "w"))
        .collect().head.getDouble(1)
      approx(got, wcov, 1e-9)
    }
  }

  it should "keep the weightedMeanTest state machine partition-invariant under mixed-sign and zero weights" in {
    // exercise every branch: negative weights fold (v = x*sign(w),
    // w' = |w|), zero weights are skipped entirely
    val mixed = rows.zipWithIndex.map { case ((t, x, y, w), i) =>
      val w2 = if (i % 11 == 0) 0.0 else if (i % 3 == 0) -w else w
      (t, x, w2)
    }
    val mdf = mixed.toDF("time", "x", "w")
    val s = Summarizers.weightedMeanTest("x", "w")
    val base = Summarize.summarize(mdf.repartition(1), s).collect().head
    for (p <- Seq(2, 7)) {
      val got = Summarize.summarize(mdf.repartition(p), s).collect().head
      // (weightedMean, weightedStdDev, weightedTStat) doubles + count
      (1 to 3).foreach { i => approx(got.getDouble(i), base.getDouble(i), 1e-9) }
      got.getLong(4) shouldBe base.getLong(4)
    }
    // value pin: weighted mean of folded values over |w|, zero-w skipped
    val kept = mixed.filter(_._3 != 0.0)
    val folded = kept.map { case (_, x, w) => (x * math.signum(w), math.abs(w)) }
    val mean = folded.map { case (v, w) => v * w }.sum / folded.map(_._2).sum
    approx(base.getDouble(1), mean, 1e-9)
  }

  it should "return nthMoment(x, 0) = 1 under any partition layout" in {
    for (p <- Seq(1, 2, 7)) {
      val r = Summarize.summarize(df(p),
        Summarizers.nthMoment("x", 0) ++ Summarizers.nthCentralMoment("x", 2))
        .collect().head
      r.getDouble(1) shouldBe 1.0
      // and the n=2 central moment is the population variance
      val n = rows.length
      val mx = rows.map(_._2).sum / n
      approx(r.getDouble(2), rows.map(v => math.pow(v._2 - mx, 2)).sum / n, 1e-9)
    }
  }

  it should "ignore nulls in custom aggregates like builtins" in {
    val withNulls = Seq[(Long, Option[Double])](
      (1L, Some(1.0)), (2L, None), (3L, Some(2.0))).toDF("time", "x")
    val r = Summarize.summarize(withNulls,
      Summarizers.kahanSum("x") ++ Summarizers.count("x")).collect().head
    r.getDouble(1) shouldBe 3.0
    r.getLong(2) shouldBe 2L
  }

  it should "return null Kahan sum for an all-null group (like builtin sum)" in {
    val allNull = Seq[(Long, Option[Double])]((1L, None), (2L, None)).toDF("time", "x")
    val r = Summarize.summarize(allNull, Summarizers.kahanSum("x")).collect().head
    r.isNullAt(1) shouldBe true
  }
}
