package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** DSIR importance weighting + Gumbel-top-k resampling: model math against
  * a hand-computed reference, kernel-scored weights against a driver-side
  * replay, and the sampling contracts (determinism, partition
  * independence, without-replacement, score monotonicity). */
class SelectionSpec extends SparkTestBase {
  import spark.implicits._

  // raw corpus: 'a' dominates; target corpus: 'b' dominates — so the
  // importance model must up-weight b-heavy documents.
  private lazy val raw = Seq(
    (0L, "a a a b"), (1L, "a a c"), (2L, "a b b"), (3L, "a a a a"))
    .toDF("id", "text")
  private lazy val target = Seq((10L, "b b b a"), (11L, "b b c"))
    .toDF("id", "text")

  behavior of "dsirModel"

  it should "match hand-computed Laplace-smoothed log ratios" in {
    val (model, oov) = Selection.dsirModel(raw, target, "text", topV = 2)
    // raw tokens: a=10, b=3, c=1 (total 14); top-2 vocab = [a, b]
    // target tokens: b=5, a=1, c=1 (total 7); V+1 = 3
    def lam(ct: Long, tt: Long, cr: Long, tr: Long): Long = math.round(
      (math.log((ct + 1).toDouble / (tt + 3).toDouble)
        - math.log((cr + 1).toDouble / (tr + 3).toDouble)) * 1e6)
    model.toMap shouldBe Map(
      "a" -> lam(1, 7, 10, 14), "b" -> lam(5, 7, 3, 14))
    // pooled OOV mass: target 7-6=1, raw 14-13=1
    oov shouldBe lam(1, 7, 1, 14)
    // direction: target-dominant token up, raw-dominant token down
    val mm = model.toMap
    mm("b") should be > 0L
    mm("a") should be < 0L
  }

  it should "pool out-of-vocabulary mass on both sides" in {
    val (model, oov) = Selection.dsirModel(raw, target, "text", topV = 1)
    model.map(_._1) shouldBe Seq("a")
    // OOV pools b+c on each side: target 7-1=6, raw 14-10=4, V+1=2
    oov shouldBe math.round(
      (math.log(7.0 / 9.0) - math.log(5.0 / 16.0)) * 1e6)
  }

  it should "handle an empty target via smoothing" in {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val (model, oov) = Selection.dsirModel(raw, empty, "text", topV = 2)
    // an empty target smooths to a uniform distribution, so the more
    // frequent a raw token the LOWER its ratio (everything stays finite)
    val mm = model.toMap
    mm("a") should be < mm("b")
    noException should be thrownBy oov
  }

  it should "reject an empty raw corpus and topV < 1" in {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    an[IllegalArgumentException] should be thrownBy
      Selection.dsirModel(empty, target, "text", topV = 2)
    an[IllegalArgumentException] should be thrownBy
      Selection.dsirModel(raw, target, "text", topV = 0)
  }

  behavior of "dsirLogWeight"

  it should "sum per-token lambdas with the OOV floor (driver replay)" in {
    val (model, oov) = Selection.dsirModel(raw, target, "text", topV = 2)
    val m = model.toMap
    val got = raw.select(F.col("id"),
        Selection.dsirLogWeight(F.col("text"), model, oov).as("lw"))
      .as[(Long, Long)].collect().toMap
    val want = raw.as[(Long, String)].collect().map { case (id, t) =>
      id -> t.split(" ").map(w => m.getOrElse(w, oov)).sum
    }.toMap
    got shouldBe want
    // b-heavy doc 2 must out-weight a-only doc 3
    got(2L) should be > got(3L)
  }

  behavior of "gumbelTopK"

  it should "be deterministic and independent of partitioning" in {
    val scored = (0L until 500L).map(i => (i, (i % 37) * 100000L))
      .toDF("id", "s")
    val a = Selection.gumbelTopK(scored, "id", "s", k = 50)
      .select("id").as[Long].collect().sorted
    val b = Selection.gumbelTopK(scored.repartition(7), "id", "s", k = 50)
      .select("id").as[Long].collect().sorted
    a shouldBe b
    a.distinct.length shouldBe 50 // without replacement: 50 distinct rows
  }

  it should "favor higher scores and change with the seed" in {
    // two score tiers 20 micro-nats apart: the high tier must dominate
    val scored = (0L until 1000L)
      .map(i => (i, if (i < 500) 20000000L else 0L)).toDF("id", "s")
    val picked = Selection.gumbelTopK(scored, "id", "s", k = 100)
      .select("id").as[Long].collect()
    picked.count(_ < 500L) should be > 90
    val other = Selection.gumbelTopK(scored, "id", "s", k = 100, seed = 7L)
      .select("id").as[Long].collect()
    picked.toSet should not be other.toSet
  }

  it should "reduce to uniform sampling at constant scores" in {
    val scored = (0L until 1000L).map(i => (i, 0L)).toDF("id", "s")
    val picked = Selection.gumbelTopK(scored, "id", "s", k = 200)
      .select("id").as[Long].collect()
    picked.length shouldBe 200
    // roughly uniform over the id range: the mean id is near 500
    (picked.sum.toDouble / picked.length) shouldBe (500.0 +- 120.0)
  }

  it should "reject k < 1 and a pre-existing gumbel_micro column" in {
    val scored = Seq((1L, 0L)).toDF("id", "s")
    an[IllegalArgumentException] should be thrownBy
      Selection.gumbelTopK(scored, "id", "s", k = 0)
    an[IllegalArgumentException] should be thrownBy
      Selection.gumbelTopK(
        scored.withColumn("gumbel_micro", F.lit(1L)), "id", "s", k = 1)
  }
}
