package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/**
 * Distributed BPE vocabulary learning (Bpe.scala): driver-side trainer
 * semantics on hand-computed tables (pair counting with overlaps,
 * byte-order tie-breaks, greedy merge application), the bounded
 * word-frequency pass, and the encode kernel. The oracle replay of the
 * same semantics is pinned by the bpe_merges / doc_bpe_count registry
 * rows.
 */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  behavior of "trainMerges"

  it should "learn merges from weighted pair counts" in {
    // pairs: (a,b) = 2*2 + 3 = 7, (b,a) = 2 -> merge 1 = (a,b)
    // then [ab,ab] x2 -> (ab,ab) = 2 -> merge 2 = (ab,ab)
    Bpe.trainMerges(Seq("abab" -> 2L, "ab" -> 3L), 2) shouldBe
      Seq(("a", "b"), ("ab", "ab"))
  }

  it should "count overlapping pair occurrences (published behavior)" in {
    // "aaa": (a,a) counts twice per occurrence -> 2, beats (b,c) = 1
    Bpe.trainMerges(Seq("aaa" -> 1L, "bc" -> 1L), 1) shouldBe
      Seq(("a", "a"))
  }

  it should "break count ties toward the smallest pair" in {
    Bpe.trainMerges(Seq("cd" -> 1L, "ab" -> 1L), 1) shouldBe
      Seq(("a", "b"))
  }

  it should "break ties in UTF-8 byte order, not UTF-16 order" in {
    // U+1F600 (4 UTF-8 bytes F0..) sorts AFTER U+E000 (EE..) in byte
    // order but BEFORE it in Java's UTF-16 code-unit order
    Bpe.compareUtf8("😀", "") should be > 0
    "😀".compareTo("") should be < 0
    Bpe.trainMerges(Seq("😀a" -> 1L, "a" -> 1L), 1) shouldBe
      Seq(("", "a"))
  }

  it should "stop early when no adjacent pairs remain" in {
    Bpe.trainMerges(Seq("a" -> 5L, "b" -> 3L), 4) shouldBe Seq.empty
    Bpe.trainMerges(Seq("ab" -> 1L), 4) shouldBe Seq(("a", "b"))
  }

  it should "segment words by code points" in {
    graft.Kernels.bpeCodePointChars("😀a").toSeq shouldBe
      Seq("😀", "a")
    Bpe.trainMerges(Seq("😀😀" -> 1L), 1) shouldBe
      Seq(("😀", "😀"))
  }

  behavior of "bpeApplyMerge"

  it should "merge left-to-right greedily without overlap" in {
    graft.Kernels.bpeApplyMerge(Array("a", "a", "a"), "a", "a").toSeq shouldBe
      Seq("aa", "a")
    graft.Kernels.bpeApplyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq shouldBe
      Seq("aa", "aa")
    graft.Kernels.bpeApplyMerge(Array("x", "a", "b", "a", "b"), "a", "b").toSeq shouldBe
      Seq("x", "ab", "ab")
  }

  behavior of "wordFreqs"

  it should "cut to the most frequent words with word-ascending ties" in {
    val d = Seq((1L, "b b a a c"), (2L, "c b")).toDF("doc_id", "text")
    // tie between a (2) and c (2): word-ascending cuts to a
    Bpe.wordFreqs(d, "text", 2) shouldBe Seq("b" -> 3L, "a" -> 2L)
    Bpe.wordFreqs(d, "text", 3) shouldBe
      Seq("b" -> 3L, "a" -> 2L, "c" -> 2L)
  }

  it should "skip empty words from repeated spaces" in {
    val d = Seq((1L, "a  a")).toDF("doc_id", "text")
    Bpe.wordFreqs(d, "text", 10) shouldBe Seq("a" -> 2L)
  }

  behavior of "encodeCount / learnMerges"

  it should "count encoded symbols per document under the merges" in {
    val merges = Seq(("a", "b"), ("ab", "ab"))
    val d = Seq((1L, "abab ab zz"), (2L, ""), (3L, "a  b"))
      .toDF("doc_id", "text")
    val out = d.select(F.col("doc_id"),
        Bpe.encodeCount(F.col("text"), merges).as("n"))
      .orderBy("doc_id").as[(Long, Int)].collect().toSeq
    // doc 1: abab -> 1, ab -> 1, zz -> 2; doc 2: empty; doc 3: a + b
    out shouldBe Seq((1L, 4), (2L, 0), (3L, 2))
  }

  it should "produce a rank-ordered merges frame" in {
    val d = Seq((1L, "abab ab"), (2L, "abab")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(d, "text", numMerges = 2, maxWords = 100)
      .orderBy("merge_rank").collect()
    m.map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSeq shouldBe Seq((1, "a", "b", "ab"), (2, "ab", "ab", "abab"))
  }

  it should "never increase the symbol count as merges are added" in {
    val rnd = new scala.util.Random(12L)
    val vocab = "abcde"
    val docs = (1L to 30L).map { id =>
      (id, (0 until (1 + rnd.nextInt(12))).map(_ =>
        (0 until (1 + rnd.nextInt(6)))
          .map(_ => vocab(rnd.nextInt(vocab.length))).mkString)
        .mkString(" "))
    }
    val d = docs.toDF("doc_id", "text")
    val freqs = Bpe.wordFreqs(d, "text", 1000)
    val counts = (1 to 6).map { k =>
      val merges = Bpe.trainMerges(freqs, k)
      d.select(F.sum(Bpe.encodeCount(F.col("text"), merges))).head().getLong(0)
    }
    counts.sliding(2).foreach { case Seq(a, b) => b should be <= a }
  }
}
