package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.graft.GraftColumns

/**
 * Model-based corpus filtering: a hashed-feature multinomial Naive Bayes
 * classifier — the same role the fastText linear classifiers (Joulin et
 * al. 2016) play in CCNet (Wenzek et al. 2020) and the DCLM/FineWeb-class
 * pipelines (language-ID and learned quality filtering over every
 * document). NB rather than logistic regression because its training IS
 * one aggregation: per-(label, feature-bucket) token counts are exactly
 * map-side-combinable partial sums, so the model is learned in a single
 * shuffle-to-L·D-rows pass with no gradient iterations, no merge-order
 * sensitivity, and bit-exact SQL-oracle replay.
 *
 * Portability contract (shared with the rest of the engine): features are
 * the whitespace tokens hashed by the portable lane-1 chain
 * (`Kernels.portableHash32` — the SimHash lane the DuckDB oracle already
 * replays in BIGINT arithmetic) into `numBuckets` buckets (hashing trick,
 * Weinberger et al. 2009); weights and priors are Laplace-smoothed
 * logprobs quantized to integer MICRO-NATS, so document scores are exact
 * integer sums — order-independent across partitions and engines.
 *
 * 100 TB shape: training = one explode+groupBy whose combine output is
 * bounded by |labels|·numBuckets per task (model parameters, not data) +
 * one |labels|-row doc-count agg; scoring = one codegen'd kernel walk per
 * row against the broadcast weight matrix. No windows, no driver-side
 * data, nothing grows with the corpus.
 */
object Classify {

  /** Per-token hashing-trick feature buckets: one Int per whitespace
    * token, `portableHash32(token) mod numBuckets`. One kernel pass. */
  def tokenBuckets(text: Column, numBuckets: Int): Column =
    GraftColumns.tokenBuckets(text, numBuckets)

  /** Trained hashed-NB model: `labels` sorted ascending (the score
    * tie-break order), `priors(l)` = quantized doc-frequency logprob,
    * `weights(l·numBuckets + b)` = quantized Laplace-smoothed token
    * logprob `round(ln((cnt+1)/(tot_l+numBuckets))·1e6)` — all integer
    * micro-nats. */
  final case class NbModel(labels: Seq[String], priors: Seq[Long],
                           weights: Array[Long], numBuckets: Int) {
    require(labels == labels.sorted, "labels must be sorted")
    require(priors.length == labels.length &&
      weights.length == labels.length * numBuckets, "shape mismatch")
  }

  /** Distributed (label, bucket, cnt) token-count table — the NB
    * sufficient statistics. ONE explode+groupBy; the combine side caps
    * each task's output at |labels|·numBuckets rows. Zero-count buckets
    * are absent (they take the smoothed floor downstream). */
  def nbCounts(df: DataFrame, textCol: String, labelCol: String,
               numBuckets: Int): DataFrame =
    df.select(F.col(labelCol).as("label"),
        F.explode(tokenBuckets(F.col(textCol), numBuckets)).as("bucket"))
      .groupBy("label", "bucket")
      .agg(F.count(F.lit(1)).as("cnt"))

  /** [[nbCounts]] plus the quantized smoothed weight per row — the
    * driver-visible model dump (label, bucket, cnt, w_micro). The
    * |labels|-row totals side is broadcast back onto the counts. */
  def nbWeights(df: DataFrame, textCol: String, labelCol: String,
                numBuckets: Int): DataFrame = {
    val c = nbCounts(df, textCol, labelCol, numBuckets)
    val totals = c.groupBy("label").agg(F.sum("cnt").as("__nb_tot"))
    c.join(F.broadcast(totals), "label")
      .withColumn("w_micro",
        F.round(F.ln((F.col("cnt") + F.lit(1.0)) /
          (F.col("__nb_tot") + F.lit(numBuckets.toDouble))) * 1e6)
          .cast("long"))
      .drop("__nb_tot")
  }

  /**
   * Train the model: collect the ≤ |labels|·numBuckets count rows and the
   * |labels| doc counts (model parameters, never data), quantize on the
   * driver. Rows with a null label are rejected — a corpus with unlabeled
   * rows should filter or impute BEFORE training, not silently drop mass.
   */
  /** Half-away-from-zero rounding to long — the SAME primitive as Spark's
    * `F.round` and DuckDB's `round()`, so driver-quantized parameters
    * (here) and engine-quantized ones ([[nbWeights]] / the SQL oracle)
    * agree even on exact .5 boundaries. `java.lang.Math.round` rounds
    * half toward +infinity, which differs for the NEGATIVE micro-nat
    * logprobs this model quantizes. */
  private def microRound(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  def nbTrain(df: DataFrame, textCol: String, labelCol: String,
              numBuckets: Int): NbModel = {
    require(numBuckets >= 1, "numBuckets must be >= 1")
    val docCounts = df.groupBy(F.col(labelCol).as("label"))
      .agg(F.count(F.lit(1)).as("n_docs")).collect()
    require(docCounts.nonEmpty, "nbTrain: empty corpus")
    require(docCounts.forall(!_.isNullAt(0)),
      s"nbTrain: null labels in $labelCol")
    val labels = docCounts.map(_.getString(0)).sorted.toSeq
    val idx = labels.zipWithIndex.toMap
    val nDocs = docCounts.map(_.getLong(1)).sum
    val priors = new Array[Long](labels.length)
    docCounts.foreach { r =>
      priors(idx(r.getString(0))) =
        microRound(math.log(r.getLong(1).toDouble / nDocs.toDouble) * 1e6)
    }
    val counts = nbCounts(df, textCol, labelCol, numBuckets).collect()
    val totals = new Array[Long](labels.length)
    counts.foreach(r => totals(idx(r.getString(0))) += r.getLong(2))
    val weights = new Array[Long](labels.length * numBuckets)
    var l = 0
    while (l < labels.length) {
      val floor =
        microRound(math.log(1.0 / (totals(l) + numBuckets).toDouble) * 1e6)
      java.util.Arrays.fill(weights, l * numBuckets, (l + 1) * numBuckets,
        floor)
      l += 1
    }
    counts.foreach { r =>
      val li = idx(r.getString(0))
      weights(li * numBuckets + r.getInt(1)) = microRound(math.log(
        (r.getLong(2) + 1.0) / (totals(li) + numBuckets).toDouble) * 1e6)
    }
    NbModel(labels, priors.toSeq, weights, numBuckets)
  }

  /** Score a document: struct(pred, lp_micro) = the argmax label (ties →
    * label ascending) and its integer micro-nat log-posterior. One kernel
    * walk per row against the broadcast model. */
  def nbScore(text: Column, model: NbModel): Column =
    GraftColumns.nbScore(text, model.numBuckets, model.labels, model.priors,
      model.weights)

  /** Train-and-score convenience: `df` plus `pred`/`lp_micro` columns. */
  def nbClassify(df: DataFrame, textCol: String, labelCol: String,
                 numBuckets: Int = 256): DataFrame = {
    val m = nbTrain(df, textCol, labelCol, numBuckets)
    val sc = nbScore(F.col(textCol), m)
    df.withColumn("__nb", sc)
      .withColumn("pred", F.col("__nb.pred"))
      .withColumn("lp_micro", F.col("__nb.lp_micro"))
      .drop("__nb")
  }
}
