package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import graft.llm._

/**
 * Shared small-corpus build of the pipeline_e2e composition for the
 * invariance specs (AQE parity, partition-layout): every stage is
 * hash-of-id or integer arithmetic, so the final (doc_id, md5, pack,
 * position) table must be identical under any adaptive plan and any
 * shuffle-partition layout. 12 docs: a near-dup pair, a shared 4-gram
 * span, a hard-filter reject, and enough survivors for the sampler and
 * the 4-bucket packer to do real work.
 */
object PipelineChainFixture {

  def corpus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val stopRun = "the of and to in that it was he for " // 10 stop words
    def body(tag: String) =
      (stopRun * 5) + (1 to 20).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, body("word")),
      (2L, body("word").replace("word7", "wordX")), // near-dup of 1
      (3L, body("zz") + " word1 word2 word3 word4"), // shares a 4-gram
      (4L, "too short")) ++ // hard-filter reject
      (5L to 12L).map(i => (i, body(s"v${i}t")))
    docs.toDF("doc_id", "text").repartition(5)
  }

  /** The full chain (same stages/params shape as the pipeline_e2e
    * registry row, scaled to the fixture corpus). */
  def run(spark: SparkSession): DataFrame = {
    val d = corpus(spark)
    val kept = TextStats.hardFilter(d, "text").filter(F.col("keep"))
      .select("doc_id", "text")
    val pairs = Dedup.minHashDedupPairs(kept, "doc_id", "text",
      numHashes = 64, bands = 16, shingleSize = 3, threshold = 0.5)
    val uniq = Dedup.dedupByClusters(kept, "doc_id", pairs)
      .select("doc_id", "text")
    val spans = Dedup.duplicateSpans(uniq, "doc_id", "text", n = 4)
    val stripped = Dedup.stripDuplicateSpans(uniq, "doc_id", "text", spans)
    val scrubbed = stripped.withColumn("text", Pii.redact(F.col("text")))
    val weighted = Sampling.sampleByWeight(
      scrubbed.withColumn("q", TextStats.qualityScore(F.col("text"))),
      "doc_id", "q", rate = 0.9)
    val packed = Sampling.packSequences(
      weighted.withColumn("n_tok", TextStats.bpeTokenCount(F.col("text"))),
      "doc_id", "n_tok", budget = 96L, numBuckets = 4)
    Sampling.shufflePositions(packed, "doc_id")
      .select(F.col("doc_id"), F.md5(F.col("text")).as("final_md5"),
        F.col("pack_bucket"), F.col("pack_id"), F.col("pack_offset"),
        F.col("shuffle_pos"))
  }
}
