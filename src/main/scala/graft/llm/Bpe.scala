package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Distributed BPE (byte-pair-encoding) vocabulary learning — the
 * tokenizer-training step of a training-data pipeline, in the shape that
 * holds at 100 TB: ONE distributed pass aggregates the corpus to a
 * bounded word-frequency table (map-side combinable count + top-K cut),
 * the merge loop runs driver-side over that bounded table (the same
 * model-parameter pattern as the unigram/bigram LMs — the corpus is never
 * touched again during training), and encoding is one codegen'd kernel
 * scan per row. This is how production BPE trainers work (word-frequency
 * preaggregation, then in-memory merges), not a per-merge corpus pass.
 *
 * Semantics (pinned for the DuckDB oracle replay):
 *  - words are whitespace tokens; empty words are skipped;
 *  - symbols start as code-point characters (no end-of-word marker — a
 *    documented deviation from Sennrich 2016's `</w>`, fine here because
 *    words are already whitespace-delimited upstream and the marker adds
 *    nothing to within-word merges);
 *  - each iteration counts ALL adjacent symbol pairs weighted by word
 *    frequency (overlapping occurrences count, the published behavior),
 *    picks the max-count pair — ties break toward the smallest (left,
 *    right) in UTF-8 byte order, the sort order of both engines — and
 *    applies it to every word left-to-right greedily (non-overlapping;
 *    a merged symbol never re-participates as `left` in the same pass);
 *  - training stops early when no adjacent pair remains.
 */
object Bpe {

  /** UTF-8 byte-order comparison — the order Spark's UTF8String sort and
    * DuckDB's VARCHAR ORDER BY use; Java's String.compareTo (UTF-16 code
    * units) diverges for supplementary vs U+E000..U+FFFF chars. */
  private[llm] def compareUtf8(a: String, b: String): Int = {
    val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(ab.length, bb.length)
    var i = 0
    while (i < n) {
      val c = (ab(i) & 0xFF) - (bb(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    ab.length - bb.length
  }

  /**
   * Bounded word-frequency table: one distributed count (map-side
   * combinable) cut to the `maxWords` most frequent words (ties → word
   * ascending, both engines' binary string order), collected to the
   * driver as model parameters. The ONLY corpus pass training makes.
   */
  def wordFreqs(df: DataFrame, textCol: String,
                maxWords: Int): Seq[(String, Long)] = {
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    df.select(F.explode(TextStats.tokens(F.col(textCol))).as("w"))
      .filter(F.length(F.col("w")) > 0)
      .groupBy("w").agg(F.count(F.lit(1)).as("c"))
      .orderBy(F.col("c").desc, F.col("w"))
      .limit(maxWords).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /**
   * Driver-side BPE merge training over a word-frequency table. Pure and
   * deterministic: same table → same merges, in both this trainer and
   * the oracle's unrolled SQL replay. Returns at most `numMerges`
   * (rank-ordered) pairs; fewer when the table runs out of adjacent
   * pairs.
   */
  def trainMerges(freqs: Seq[(String, Long)],
                  numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var words = freqs.map { case (w, c) =>
      (graft.Kernels.bpeCodePointChars(w), c)
    }.toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val counts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (sy, c) =>
        var i = 0
        while (i < sy.length - 1) {
          val key = (sy(i), sy(i + 1))
          counts.update(key, counts.getOrElse(key, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.reduceLeft { (a, b) =>
          if (a._2 != b._2) { if (a._2 > b._2) a else b }
          else {
            val cl = compareUtf8(a._1._1, b._1._1)
            if (cl != 0) { if (cl < 0) a else b }
            else if (compareUtf8(a._1._2, b._1._2) <= 0) a else b
          }
        }._1
        out += best
        words = words.map { case (sy, c) =>
          (graft.Kernels.bpeApplyMerge(sy, best._1, best._2), c)
        }
      }
      k += 1
    }
    out.toSeq
  }

  /** [[wordFreqs]] + [[trainMerges]] as a DataFrame
    * `(merge_rank, lhs, rhs, merged)` — the persistable tokenizer model. */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int,
                  maxWords: Int): DataFrame = {
    val merges = trainMerges(wordFreqs(df, textCol, maxWords), numMerges)
    val s = df.sparkSession
    import s.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i + 1, l, r, l + r) }
      .toDF("merge_rank", "lhs", "rhs", "merged")
  }

  /** BPE-encoded symbol count of `text` under a rank-ordered merge list —
    * one kernel scan per row (the token-budget signal a learned tokenizer
    * gives, vs the regex approximation of `TextStats.bpeTokenCount`). */
  def encodeCount(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.GraftColumns.bpeEncodeCount(text, merges)
}
