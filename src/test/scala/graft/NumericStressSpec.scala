package graft

import graft.ts.{Summarize, Summarizers}

/**
 * Numeric-regime pin for the power-sum estimator family (variance /
 * covariance / correlation / zScore) and its stable central-moment
 * counterparts, against BigDecimal ground truth computed from the EXACT
 * binary values of the inputs.
 *
 * Tolerance statement (mirrored in the [[graft.ts.Summarizers.variance]]
 * scaladoc): power sums lose ~ε·(μ/σ)² relative digits, ε ≈ 2.2e-16.
 *  - Supported power-sum regime: |mean|/stddev ≤ 1e4 → relative error
 *    ≤ ~1e-7 (asserted at 1e-6 for headroom).
 *  - Outside it (μ/σ = 1e12 here) power sums carry no significant digits;
 *    the `*Stable` factories (Spark's shifted central-moment aggregates,
 *    the reference's Kahan+central-update robustness) measure ≤ ~1e-4
 *    relative error even there — asserted at 1e-3.
 */
class NumericStressSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic noise ~ U(-1e-3, 1e-3): sd ≈ 5.8e-4
  private def noise(i: Int, salt: Long): Double = {
    var z = i * 2654435761L + salt + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    ((z ^ (z >>> 31)) % 2000001L) / 1.0e9
  }

  private val n = 4000

  /** (time, x, y) with x, y around `mean`, correlated via shared noise. */
  private def data(mean: Double): Seq[(Long, Double, Double)] =
    Seq.tabulate(n) { i =>
      (i.toLong, mean + noise(i, 1L), mean + 0.5 * noise(i, 1L) + noise(i, 2L))
    }

  private def bd(d: Double): BigDecimal =
    BigDecimal(new java.math.BigDecimal(d)) // exact binary expansion

  private case class Truth(varX: Double, cov: Double, corr: Double,
                           zIn: Double, zOut: Double)

  /** Exact central-moment statistics over the doubles' true values. */
  private def truth(rows: Seq[(Long, Double, Double)]): Truth = {
    val mc = new java.math.MathContext(60)
    val xs = rows.map(r => bd(r._2)); val ys = rows.map(r => bd(r._3))
    val nB = BigDecimal(xs.size)
    val mx = xs.sum(Numeric[BigDecimal]) / nB
    val my = ys.sum(Numeric[BigDecimal]) / nB
    val m2x = xs.map(v => (v - mx) * (v - mx)).sum
    val m2y = ys.map(v => (v - my) * (v - my)).sum
    val m2xy = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val varX = m2x / (nB - 1)
    val cov = m2xy / nB
    val corr = BigDecimal(m2xy.bigDecimal.divide(
      new java.math.BigDecimal(
        math.sqrt((m2x * m2y).doubleValue)), mc))
    val last = xs.last
    val zIn = (last - mx).doubleValue / math.sqrt(varX.doubleValue)
    val mPrev = (xs.sum(Numeric[BigDecimal]) - last) / (nB - 1)
    val m2Prev = xs.init.map(v => (v - mPrev) * (v - mPrev)).sum
    val zOut = (last - mPrev).doubleValue /
      math.sqrt((m2Prev / (nB - 2)).doubleValue)
    Truth(varX.doubleValue, cov.doubleValue, corr.doubleValue, zIn, zOut)
  }

  private def relErr(got: Double, want: Double): Double =
    math.abs(got - want) / math.abs(want)

  private def run(rows: Seq[(Long, Double, Double)],
                  s: graft.ts.Summarizer): org.apache.spark.sql.Row =
    Summarize.summarize(rows.toDF("time", "x", "y").repartition(7), s)
      .collect().head

  it should "keep power-sum estimators accurate in the supported regime (mu/sigma = 1e4)" in {
    val rows = data(mean = 10.0) // sd ~ 5.8e-4 -> mu/sigma ~ 1.7e4
    val t = truth(rows)
    val r = run(rows, Summarizers.compose(
      Summarizers.variance("x"), Summarizers.covariance("x", "y"),
      Summarizers.correlation("x", "y")))
    relErr(r.getAs[Double]("x_variance"), t.varX) should be <= 1e-6
    relErr(r.getAs[Double]("x_y_covariance"), t.cov) should be <= 1e-6
    relErr(r.getAs[Double]("x_y_correlation"), t.corr) should be <= 1e-6
    val zi = run(rows, Summarizers.zScore("x", includeCurrent = true))
    relErr(zi.getAs[Double]("x_zScore"), t.zIn) should be <= 1e-5
    val zo = run(rows, Summarizers.zScore("x", includeCurrent = false))
    relErr(zo.getAs[Double]("x_zScore"), t.zOut) should be <= 1e-5
  }

  it should "document power-sum collapse and stable-variant accuracy at mu/sigma = 1e12" in {
    val rows = data(mean = 1.0e9) // sd ~ 5.8e-4 -> mu/sigma ~ 1.7e12
    val t = truth(rows)
    // the raw power-sum path has NO significant digits here (this is the
    // documented unsupported regime, not a bug being tolerated):
    val raw = run(rows, Summarizers.variance("x")).getAs[Double]("x_variance")
    assert(raw.isNaN || relErr(raw, t.varX) > 1e-2,
      s"power sums unexpectedly accurate at mu/sigma=1e12: got $raw, " +
        s"truth ${t.varX} — tighten the documented regime")
    // the stable family keeps ~4+ significant digits even here (Welford
    // merge error ~ n·ε·(μ/σ), vs power sums' total collapse):
    val r = run(rows, Summarizers.compose(
      Summarizers.varianceStable("x"),
      Summarizers.covarianceStable("x", "y"),
      Summarizers.correlationStable("x", "y")))
    info(f"stable var relErr ${relErr(r.getAs[Double]("x_variance"), t.varX)}%.3g")
    info(f"stable cov relErr ${relErr(r.getAs[Double]("x_y_covariance"), t.cov)}%.3g")
    info(f"stable corr relErr ${relErr(r.getAs[Double]("x_y_correlation"), t.corr)}%.3g")
    relErr(r.getAs[Double]("x_variance"), t.varX) should be <= 1e-3
    relErr(r.getAs[Double]("x_y_covariance"), t.cov) should be <= 1e-3
    relErr(r.getAs[Double]("x_y_correlation"), t.corr) should be <= 1e-3
    val zi = run(rows, Summarizers.zScoreStable("x", includeCurrent = true))
    val zo = run(rows, Summarizers.zScoreStable("x", includeCurrent = false))
    info(f"stable zIn relErr ${relErr(zi.getAs[Double]("x_zScore"), t.zIn)}%.3g")
    info(f"stable zOut relErr ${relErr(zo.getAs[Double]("x_zScore"), t.zOut)}%.3g")
    relErr(zi.getAs[Double]("x_zScore"), t.zIn) should be <= 1e-3
    relErr(zo.getAs[Double]("x_zScore"), t.zOut) should be <= 1e-3
  }

  it should "agree with the power-sum family in the ordinary regime (drop-in check)" in {
    val rows = data(mean = 10.0)
    val a = run(rows, Summarizers.compose(
      Summarizers.variance("x"), Summarizers.covariance("x", "y"),
      Summarizers.correlation("x", "y")))
    val b = run(rows, Summarizers.compose(
      Summarizers.varianceStable("x"),
      Summarizers.covarianceStable("x", "y"),
      Summarizers.correlationStable("x", "y")))
    relErr(b.getAs[Double]("x_variance"),
      a.getAs[Double]("x_variance")) should be <= 1e-6
    relErr(b.getAs[Double]("x_y_covariance"),
      a.getAs[Double]("x_y_covariance")) should be <= 1e-6
    relErr(b.getAs[Double]("x_y_correlation"),
      a.getAs[Double]("x_y_correlation")) should be <= 1e-6
    relErr(b.getAs[Double]("x_y_correlationTStat"),
      a.getAs[Double]("x_y_correlationTStat")) should be <= 1e-6
  }
}
