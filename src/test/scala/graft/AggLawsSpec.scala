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
