package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * Shared local SparkSession for all suites (one forked test JVM; the
 * session is held in a companion object so suites reuse it — ≙ the
 * reference's FlintSuite/LocalSparkContext harness,
 * /root/reference/src/test/scala/com/twosigma/flint/FlintSuite.scala).
 *
 * AQE is disabled here (only here) so plan-shape assertions see the
 * statically planned Exchange/Sort nodes.
 */
trait SparkTestBase extends AnyFlatSpec with Matchers {
  final lazy val spark: SparkSession = SparkTestBase.session

  /** Absolute tolerance double compare. */
  def approx(actual: Double, expected: Double, tol: Double = 1e-9): Unit = {
    assert(math.abs(actual - expected) <= tol,
      s"expected $expected +- $tol, got $actual")
  }
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
