package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/**
 * Benchmark-contamination measurement for training corpora: for each
 * training document, the fraction of its distinct word n-grams that also
 * appear anywhere in a benchmark/eval set. The standard decontamination
 * signal (GPT-3 appendix C / PaLM §7-style n-gram overlap); a pipeline
 * filters on `contamination >= threshold` before training.
 *
 * Shape at 100 TB: the benchmark side collapses to one row per distinct
 * n-gram — eval suites are tiny next to the corpus, so it is broadcast
 * when its size estimate fits and the corpus-side explode never shuffles
 * for the join; the only shuffle is the per-doc count aggregation
 * (map-side combined). A benchmark side whose optimizer size estimate
 * exceeds `maxBroadcastBytes` falls back to a shuffle join automatically
 * — a forced broadcast of a large side would OOM the DRIVER, the one
 * failure a caller mistake shouldn't be able to cause. Set
 * `broadcastBench = false` to never hint (AQE may still pick broadcast
 * at runtime).
 */
object Contamination {

  /**
   * Per-train-document n-gram overlap with `bench`.
   * Output: (idCol, n_grams, n_matched, contamination) where `n_grams` is
   * the document's distinct n-gram count, `n_matched` of those occur in the
   * benchmark set, and `contamination = n_matched / n_grams` (0.0 for
   * documents shorter than `n` tokens, which have no n-grams). N-grams are
   * compared by 64-bit fingerprint (collision odds ~|grams|²/2⁶⁴ —
   * negligible against the thresholding this feeds).
   */
  def ngramOverlap(train: DataFrame, bench: DataFrame, idCol: String,
                   textCol: String, n: Int,
                   broadcastBench: Boolean = true,
                   maxBroadcastBytes: Long = 256L << 20): DataFrame = {
    // n-grams live as 64-bit fingerprints end-to-end (codegen'd kernel, no
    // gram strings, long-typed shuffle keys); distinct = true gives the
    // sorted set form directly.
    val grams = TextStats.ngramHashes(F.col(textCol), n, distinct = true)
    val benchSet0 = bench.select(F.explode(grams).as("bench_gram")).distinct()
    // hint only when the optimizer's size estimate says the distinct gram
    // set fits; an over-large estimate (or broadcastBench = false) plans a
    // shuffle join instead of trusting the caller with the driver's heap
    val benchFits =
      benchSet0.queryExecution.optimizedPlan.stats.sizeInBytes <=
        BigInt(maxBroadcastBytes)
    val benchSet =
      if (broadcastBench && benchFits) F.broadcast(benchSet0) else benchSet0
    // Single evaluation of the n-gram expression per train row: carry the
    // per-doc total through the explode (explode_outer keeps zero-gram
    // docs as a null-gram row) and count matches with one left join — the
    // n-gram computation is the dominant cost, so never re-derive it.
    val ex = train.select(F.col(idCol), grams.as("gs"))
      .select(F.col(idCol), F.size(F.col("gs")).as("n_grams"),
        F.explode_outer(F.col("gs")).as("gram"))
    ex.join(benchSet, ex("gram") === benchSet("bench_gram"), "left")
      .groupBy(F.col(idCol))
      .agg(F.max("n_grams").as("n_grams"),
        F.count("bench_gram").as("n_matched"))
      .select(F.col(idCol), F.col("n_grams"), F.col("n_matched"),
        F.when(F.col("n_grams") > 0,
          F.col("n_matched").cast("double") / F.col("n_grams").cast("double"))
          .otherwise(F.lit(0.0)).as("contamination"))
  }
}
