package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** Hashed Naive Bayes: bucket-hash parity with a plain-Scala replay of
  * the portable chain, trainer/scorer parity with an independent
  * driver-side reimplementation, tie-break and smoothing semantics. */
class ClassifySpec extends SparkTestBase {
  import spark.implicits._

  // Plain-Scala replay of the portable lane-1 hash (poly fold + mix32).
  private def mix32(v0: Long): Long = {
    var x = v0 & 0xFFFFFFFFL
    x = ((x ^ (x >>> 16)) * 0x45d9f3bL) & 0xFFFFFFFFL
    x = ((x ^ (x >>> 16)) * 0x45d9f3bL) & 0xFFFFFFFFL
    x ^ (x >>> 16)
  }
  private def bucketOf(tok: String, d: Int): Int = {
    var h = 2166136261L
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      h = (h * 1000003L + cp) & 0xFFFFFFFFL
      i += Character.charCount(cp)
    }
    (mix32(h) % d).toInt
  }

  behavior of "tokenBuckets"

  it should "hash every split(' ') token through the portable chain" in {
    val rows = Seq("the quick brown fox", "", "a  b", " lead", "héllo 漢字 🙂x")
    val got = rows.toDF("text")
      .select(Classify.tokenBuckets(F.col("text"), 64).as("b"))
      .collect().map(_.getSeq[Int](0).toList)
    val want = rows.map(_.split(" ", -1).toList.map(bucketOf(_, 64)))
    got.toList shouldBe want
  }

  behavior of "nbTrain / nbScore"

  // Independent replay of the sufficient statistics: per-(label, bucket)
  // token counts and doc-frequency priors from scratch maps.
  private def replay(docs: Seq[(Long, String, String)], d: Int)
      : (Map[(String, Int), Long], Map[String, Long]) = {
    val labels = docs.map(_._3).distinct.sorted
    val cnt = scala.collection.mutable.Map[(String, Int), Long]().withDefaultValue(0L)
    docs.foreach { case (_, t, l) =>
      t.split(" ", -1).foreach(w => cnt((l, bucketOf(w, d))) += 1) }
    val prior = labels.map(l =>
      l -> math.round(math.log(
        docs.count(_._3 == l).toDouble / docs.size.toDouble) * 1e6)).toMap
    (cnt.toMap, prior)
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat", "en"),
    (2L, "the dog ate the food", "en"),
    (3L, "el gato y el perro", "es"),
    (4L, "la casa de la playa", "es"),
    (5L, "the cat y el dog", "en"),
    (6L, "", "es"))

  it should "match an independent replay of counts, weights, and scores" in {
    val df = corpus.toDF("doc_id", "text", "lang")
    val d = 32
    val m = Classify.nbTrain(df, "text", "lang", d)
    m.labels shouldBe Seq("en", "es")

    val (cnt, prior) = replay(corpus, d)
    m.priors shouldBe m.labels.map(prior)
    val tot = m.labels.map(l =>
      l -> cnt.collect { case ((`l`, _), c) => c }.sum).toMap
    m.labels.zipWithIndex.foreach { case (l, li) =>
      (0 until d).foreach { b =>
        m.weights(li * d + b) shouldBe math.round(
          math.log((cnt.getOrElse((l, b), 0L) + 1.0) / (tot(l) + d)) * 1e6)
      }
    }

    // the scorer agrees with a brute-force argmax over the model arrays
    val sc = Classify.nbScore(F.col("text"), m)
    val got = df.select(F.col("doc_id"), sc.getField("pred"),
        sc.getField("lp_micro")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = corpus.map { case (id, t, _) =>
      val scores = m.labels.zipWithIndex.map { case (l, li) =>
        (l, m.priors(li) + t.split(" ", -1)
          .map(tk => m.weights(li * d + bucketOf(tk, d))).sum)
      }
      val best = scores.reduceLeft((a, b) => if (b._2 > a._2) b else a)
      (id, best._1, best._2)
    }
    got.toList shouldBe want
  }

  it should "recover the language labels on separable text" in {
    val df = corpus.toDF("doc_id", "text", "lang")
    val out = Classify.nbClassify(df, "text", "lang", numBuckets = 256)
      .select("doc_id", "lang", "pred").collect()
    // fully separable vocab except doc 5 (mixed) and doc 6 (empty)
    out.filter(r => r.getLong(0) <= 4L)
      .foreach(r => r.getString(2) shouldBe r.getString(1))
  }

  it should "break score ties by label ascending" in {
    // identical class-conditional text, equal doc counts -> equal scores
    val df = Seq((1L, "same text", "b"), (2L, "same text", "a"))
      .toDF("doc_id", "text", "lang")
    val m = Classify.nbTrain(df, "text", "lang", 16)
    val sc = Classify.nbScore(F.col("text"), m)
    val preds = df.select(sc.getField("pred")).collect().map(_.getString(0))
    preds.foreach(_ shouldBe "a")
  }

  it should "match nbWeights on every present (label, bucket)" in {
    val df = corpus.toDF("doc_id", "text", "lang")
    val d = 32
    val m = Classify.nbTrain(df, "text", "lang", d)
    val li = m.labels.zipWithIndex.toMap
    Classify.nbWeights(df, "text", "lang", d).collect().foreach { r =>
      val (l, b) = (r.getString(0), r.getInt(1))
      r.getLong(3) shouldBe m.weights(li(l) * d + b)
    }
  }

  it should "reject null labels and an empty corpus" in {
    an[IllegalArgumentException] should be thrownBy
      Classify.nbTrain(Seq((1L, "x", null: String)).toDF("doc_id", "text", "lang"),
        "text", "lang", 8)
    an[IllegalArgumentException] should be thrownBy
      Classify.nbTrain(Seq.empty[(Long, String, String)]
        .toDF("doc_id", "text", "lang"), "text", "lang", 8)
  }
}
