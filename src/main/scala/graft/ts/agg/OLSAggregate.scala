package graft.ts.agg

import org.apache.spark.sql.{Column, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types._

/** Gram-matrix buffer for streaming (weighted) OLS: X'WX upper triangle,
  * X'Wy, y'Wy, Σw, n — a fixed-width mergeable state, so Spark's partial
  * aggregation distributes it like any other aggregate
  * (≙ OLSRegressionSummarizer's state,
  * /root/reference/src/main/scala/com/twosigma/flint/rdd/function/summarize/
  * summarizer/subtractable/OLSRegressionSummarizer.scala:66-366). */
final case class OLSBuf(xtx: Array[Double], xty: Array[Double],
                        yy: Double, sw: Double, n: Long)

/**
 * Streaming weighted OLS with intercept as a Spark `Aggregator`, registered
 * via `functions.udaf` — usable in summarize / cycles / intervals / windows
 * like every other summarizer. Solves the normal equations by Gaussian
 * elimination WITHOUT pivoting (deterministic op order; the Gram matrix of a
 * well-scaled design is positive definite, the reference relies on the same
 * property).
 *
 * Output struct: samples, beta array<double> (no intercept term), intercept,
 * rSquared, stdErr_beta array<double>, tStat_beta array<double>.
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
    StructField("tStat_beta", ArrayType(DoubleType))))

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

  def zero: OLSBuf = OLSBuf(new Array[Double](d * (d + 1) / 2), new Array[Double](d), 0.0, 0.0, 0L)

  private def design(r: Row): Array[Double] = {
    val x = new Array[Double](d)
    var i = 0
    if (hasIntercept) { x(0) = 1.0; i = 1 }
    var j = 1
    while (j <= k) { x(i) = r.getDouble(j); i += 1; j += 1 }
    x
  }

  def reduce(b: OLSBuf, r: Row): OLSBuf = {
    if (r == null || r.isNullAt(0) || (1 to k).exists(r.isNullAt) || r.isNullAt(k + 1)) b
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
        i += 1
      }
      OLSBuf(b.xtx, b.xty, b.yy + w * y * y, b.sw + w, b.n + 1)
    }
  }

  def merge(a: OLSBuf, b: OLSBuf): OLSBuf = {
    val xtx = a.xtx.clone()
    var i = 0
    while (i < xtx.length) { xtx(i) += b.xtx(i); i += 1 }
    val xty = a.xty.clone()
    i = 0
    while (i < xty.length) { xty(i) += b.xty(i); i += 1 }
    OLSBuf(xtx, xty, a.yy + b.yy, a.sw + b.sw, a.n + b.n)
  }

  def finish(b: OLSBuf): Row = {
    if (b.n < d + 1) return Row(b.n, null, null, null, null, null)
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
    Row(b.n, betas.toSeq, if (hasIntercept) beta(0) else 0.0, r2, stdErr.toSeq, t.toSeq)
  }

  def bufferEncoder: Encoder[OLSBuf] = Encoders.product[OLSBuf]
  def outputEncoder: Encoder[Row] = Encoders.row(OLSAggregate.outSchema)
}
