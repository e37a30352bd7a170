package graft.ts.agg

import org.apache.spark.sql.{Column, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types._

/** Gram-matrix buffer for streaming (weighted) OLS: X'WX upper triangle,
  * X'Wy, y'Wy, per-column Σw·x, Σln(w), Σw, n — a fixed-width mergeable
  * state, so Spark's partial aggregation distributes it like any other
  * aggregate (≙ OLSRegressionSummarizer's state,
  * /root/reference/src/main/scala/com/twosigma/flint/rdd/function/summarize/
  * summarizer/subtractable/OLSRegressionSummarizer.scala:66-366). */
final case class OLSBuf(xtx: Array[Double], xty: Array[Double],
                        xsum: Array[Double], yy: Double, lw: Double,
                        sw: Double, n: Long)

/**
 * Streaming weighted OLS with intercept as a Spark `Aggregator`, registered
 * via `functions.udaf` — usable in summarize / cycles / intervals / windows
 * like every other summarizer. Solves the normal equations by Gaussian
 * elimination WITHOUT pivoting (deterministic op order; the Gram matrix of a
 * well-scaled design is positive definite, the reference relies on the same
 * property).
 *
 * Output struct: samples, beta array<double> (no intercept term), intercept,
 * rSquared, stdErr_beta array<double>, tStat_beta array<double>, plus the
 * reference's extended diagnostics (OLSRegressionSummarizer.scala:180-244):
 * stdErr_intercept, tStat_intercept, logLikelihood
 * (−n/2·(ln(ssr) + 1 + ln(2π/n)) + Σln(w)/2), akaikeIC (−2logL + 2k),
 * bayesIC (−2logL + k·ln n) with k = design width incl. intercept,
 * cond (λmax/λmin of X'WX), and constantsCoordinates — 0-based indices of
 * regressors with ~zero weighted variance (reported, not dropped).
 *
 * Weight semantics: rows with null fields are skipped; rows with w <= 0 are
 * included in all sums and in `samples` (reference parity). For w = 0 the
 * fit is unchanged and only the ln(w) diagnostics (logLikelihood/AIC/BIC)
 * degrade to -Inf/NaN. NEGATIVE weights are passed through to the normal
 * equations exactly as the reference does — they subtract from X'WX and can
 * make it indefinite/singular (NaN or sign-flipped coefficients); supplying
 * a meaningful non-negative weight column is the caller's contract.
 */
object OLSAggregate {

  /** Registered udaf: call with (y, x1..xk, w) columns — a Row input
    * encoder surfaces each field as a separate SQL argument. */
  def olsUdaf(k: Int, hasIntercept: Boolean = true)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val agg = new OLSAgg(k, hasIntercept)
    udaf(agg, agg.inputEncoder)
  }

  private[agg] val outSchema = StructType(Seq(
    StructField("samples", LongType),
    StructField("beta", ArrayType(DoubleType)),
    StructField("intercept", DoubleType),
    StructField("rSquared", DoubleType),
    StructField("stdErr_beta", ArrayType(DoubleType)),
    StructField("tStat_beta", ArrayType(DoubleType)),
    StructField("stdErr_intercept", DoubleType),
    StructField("tStat_intercept", DoubleType),
    StructField("logLikelihood", DoubleType),
    StructField("akaikeIC", DoubleType),
    StructField("bayesIC", DoubleType),
    StructField("cond", DoubleType),
    StructField("constantsCoordinates", ArrayType(IntegerType))))

  /** Eigenvalues of a symmetric d×d matrix (row-major) via cyclic Jacobi
    * rotations — d is the design width (tiny), so O(d³) per sweep is noise.
    * Used for the Gram-matrix condition number. */
  private[agg] def symEigenvalues(a0: Array[Double], d: Int): Array[Double] = {
    val a = a0.clone()
    var sweep = 0
    var rotating = true
    while (rotating && sweep < 64) {
      rotating = false
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p * d + q)
          val scale = math.abs(a(p * d + p)) + math.abs(a(q * d + q))
          if (math.abs(apq) > 1e-15 * scale && apq != 0.0) {
            rotating = true
            val theta = (a(q * d + q) - a(p * d + p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 // theta == 0 -> 45-degree rotation
                case v => v
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i * d + p); val aiq = a(i * d + q)
              a(i * d + p) = c * aip - s * aiq
              a(i * d + q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p * d + i); val aqi = a(q * d + i)
              a(p * d + i) = c * api - s * aqi
              a(q * d + i) = s * api + c * aqi
              i += 1
            }
            a(p * d + q) = 0.0; a(q * d + p) = 0.0
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    Array.tabulate(d)(i => a(i * d + i))
  }

  /** Solve A x = b in place (A (d x d) row-major, no pivoting). */
  private[agg] def solve(a: Array[Double], b: Array[Double], d: Int): Array[Double] = {
    val m = a.clone(); val y = b.clone()
    var i = 0
    while (i < d) {
      var r = i + 1
      while (r < d) {
        val f = m(r * d + i) / m(i * d + i)
        var c2 = i
        while (c2 < d) { m(r * d + c2) -= f * m(i * d + c2); c2 += 1 }
        y(r) -= f * y(i)
        r += 1
      }
      i += 1
    }
    val x = new Array[Double](d)
    i = d - 1
    while (i >= 0) {
      var s = y(i)
      var c2 = i + 1
      while (c2 < d) { s -= m(i * d + c2) * x(c2); c2 += 1 }
      x(i) = s / m(i * d + i)
      i -= 1
    }
    x
  }

  /** Invert A via solves against unit vectors (for stderr diagonal). */
  private[agg] def invDiag(a: Array[Double], d: Int): Array[Double] = {
    val out = new Array[Double](d)
    var j = 0
    while (j < d) {
      val e = new Array[Double](d); e(j) = 1.0
      out(j) = solve(a, e, d)(j)
      j += 1
    }
    out
  }
}

/** Input rows are structs (y, x_1..x_k, w). */
private[agg] class OLSAgg(k: Int, hasIntercept: Boolean)
    extends Aggregator[Row, OLSBuf, Row] {

  private val d = if (hasIntercept) k + 1 else k // design width; col 0 = 1.0

  val inputEncoder: Encoder[Row] = Encoders.row(StructType(
    StructField("y", DoubleType) +:
      (1 to k).map(i => StructField(s"x$i", DoubleType)) :+
      StructField("w", DoubleType)))

  def zero: OLSBuf = OLSBuf(new Array[Double](d * (d + 1) / 2),
    new Array[Double](d), new Array[Double](d), 0.0, 0.0, 0.0, 0L)

  private def design(r: Row): Array[Double] = {
    val x = new Array[Double](d)
    var i = 0
    if (hasIntercept) { x(0) = 1.0; i = 1 }
    var j = 1
    while (j <= k) { x(i) = r.getDouble(j); i += 1; j += 1 }
    x
  }

  def reduce(b: OLSBuf, r: Row): OLSBuf = {
    // Rows with any null field are skipped (FilterNullInput). Rows with
    // w <= 0 are INCLUDED in every sum and in `samples`, matching the
    // reference (OLSRegressionSummarizer.scala:307): a zero weight
    // contributes nothing to the fit but still counts as a sample, and
    // only the ln(w)-based diagnostics (logLikelihood/AIC/BIC) degrade to
    // -Inf/NaN — which is surfaced honestly rather than silently changing
    // `samples` and the degrees of freedom.
    if (r == null || r.isNullAt(0) || (1 to k).exists(r.isNullAt) ||
      r.isNullAt(k + 1)) b
    else {
      val w = r.getDouble(k + 1)
      val y = r.getDouble(0)
      val x = design(r)
      var idx = 0
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) { b.xtx(idx) += w * x(i) * x(j); idx += 1; j += 1 }
        b.xty(i) += w * x(i) * y
        b.xsum(i) += w * x(i)
        i += 1
      }
      OLSBuf(b.xtx, b.xty, b.xsum, b.yy + w * y * y, b.lw + math.log(w),
        b.sw + w, b.n + 1)
    }
  }

  def merge(a: OLSBuf, b: OLSBuf): OLSBuf = {
    val xtx = a.xtx.clone()
    var i = 0
    while (i < xtx.length) { xtx(i) += b.xtx(i); i += 1 }
    val xty = a.xty.clone()
    i = 0
    while (i < xty.length) { xty(i) += b.xty(i); i += 1 }
    val xsum = a.xsum.clone()
    i = 0
    while (i < xsum.length) { xsum(i) += b.xsum(i); i += 1 }
    OLSBuf(xtx, xty, xsum, a.yy + b.yy, a.lw + b.lw, a.sw + b.sw, a.n + b.n)
  }

  def finish(b: OLSBuf): Row = {
    if (b.n < d + 1)
      return Row(b.n, null, null, null, null, null, null, null, null, null,
        null, null, null)
    // unpack upper triangle to full symmetric matrix
    val a = new Array[Double](d * d)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) { a(i * d + j) = b.xtx(idx); a(j * d + i) = b.xtx(idx); idx += 1; j += 1 }
      i += 1
    }
    val beta = OLSAggregate.solve(a, b.xty, d)
    // SSR = y'Wy − β'X'Wy ; SST = y'Wy − (Σwy)²/Σw
    var bty = 0.0
    i = 0
    while (i < d) { bty += beta(i) * b.xty(i); i += 1 }
    val ssr = b.yy - bty
    val meanTerm = if (hasIntercept) (b.xty(0) / b.sw) * b.xty(0) else 0.0
    val sst = b.yy - meanTerm
    val r2 = 1.0 - ssr / sst
    val sigma2 = ssr / (b.n - d)
    val diag = OLSAggregate.invDiag(a, d)
    val off = if (hasIntercept) 1 else 0
    val stdErr = (0 until k).map(j => math.sqrt(sigma2 * diag(j + off))).toArray
    val betas = (0 until k).map(j => beta(j + off)).toArray
    val t = (0 until k).map(j => betas(j) / stdErr(j)).toArray
    val (seI, tI) =
      if (hasIntercept) {
        val se = math.sqrt(sigma2 * diag(0)); (se, beta(0) / se)
      } else (Double.NaN, Double.NaN)
    // extended diagnostics (reference formulas, LinearRegressionModel.scala:473-515)
    val logL = -0.5 * b.n * (math.log(ssr) + 1.0 + math.log(2.0 * math.Pi / b.n)) +
      0.5 * b.lw
    val aic = -2.0 * logL + 2.0 * d
    val bic = -2.0 * logL + d * math.log(b.n.toDouble)
    val eig = OLSAggregate.symEigenvalues(a, d)
    val cond = eig.max / eig.min
    // regressor j is constant when its weighted variance ~ 0
    val consts = (0 until k).filter { j =>
      val jj = j + off
      val m = b.xsum(jj) / b.sw
      math.abs(a(jj * d + jj) / b.sw - m * m) < 1e-12
    }.toArray
    Row(b.n, betas.toSeq, if (hasIntercept) beta(0) else 0.0, r2,
      stdErr.toSeq, t.toSeq, seI, tI, logL, aic, bic, cond, consts.toSeq)
  }

  def bufferEncoder: Encoder[OLSBuf] = Encoders.product[OLSBuf]
  def outputEncoder: Encoder[Row] = Encoders.row(OLSAggregate.outSchema)
}
