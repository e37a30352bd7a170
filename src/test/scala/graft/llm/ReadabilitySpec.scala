package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** Flesch–Kincaid kernel: counter parity with a plain-Scala regex replay,
  * the documented floors, and the pinned grade arithmetic. */
class ReadabilitySpec extends SparkTestBase {
  import spark.implicits._

  private def replay(text: String): (Int, Int, Long) = {
    val words = text.split(" ", -1)
    val sents = math.max(text.count(c => c == '.' || c == '!' || c == '?'), 1)
    val syll = words.map(w =>
      math.max("[aeiouyAEIOUY]+".r.findAllIn(w).size, 1).toLong).sum
    (words.length, sents, syll)
  }

  private def stats(rows: Seq[String]) = {
    val st = TextStats.fkStats(F.col("text"))
    rows.toDF("text").select(
        st.getField("n_words"), st.getField("n_sentences"),
        st.getField("n_syllables"), TextStats.fkGradeMicro(F.col("text")))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
  }

  behavior of "fkStats / fkGradeMicro"

  it should "match hand-computed fixtures including the floors" in {
    val got = stats(Seq(
      "The cat sat. It ran!",
      "",                    // empty: 1 word, floor sentence, floor syllable
      "xxx zzz",             // vowel-less words: floor 1 each, no sentence
      "a  b",                // empty middle token floors to 1 syllable
      "Readability beautiful queueing"))
    got(0) shouldBe ((5, 2, 5L,
      math.round((0.39 * (5.0 / 2.0) + 11.8 * (5.0 / 5.0) - 15.59) * 1e6)))
    got(1)._1 shouldBe 1; got(1)._2 shouldBe 1; got(1)._3 shouldBe 1L
    got(1)._4 shouldBe math.round((0.39 + 11.8 - 15.59) * 1e6)
    (got(2)._1, got(2)._2, got(2)._3) shouldBe ((2, 1, 2L))
    (got(3)._1, got(3)._2, got(3)._3) shouldBe ((3, 1, 3L))
    // Read-a-bil-i-ty: vowel runs ea,a,i,i,y = 5; beau-ti-ful: eau,i,u = 3;
    // queue-ing: ueuei (one run) + no second... 'queueing' runs: ueuei, no
    // -> 1? chars q,u,e,u,e,i,n,g => run u..i = 1 run. total 5+3+1 = 9
    (got(4)._1, got(4)._2, got(4)._3) shouldBe ((3, 1, 9L))
  }

  it should "match the regex replay on randomized text" in {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghij .!?xyzAEIOU"
    val rows = Seq.fill(200)(
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    val got = stats(rows)
    rows.zip(got).foreach { case (t, (w, s, sy, _)) =>
      (w, s, sy) shouldBe replay(t)
    }
  }
}
