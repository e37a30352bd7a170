package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Distribution-matching data selection for training-corpus construction:
 * DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
 * Language Models via Importance Resampling") and Gumbel-top-k weighted
 * sampling WITHOUT replacement (Kool et al. 2019) — the "pick the k raw
 * documents that look most like the target domain" step that sits between
 * quality filtering and mixture balancing in a 100 TB pipeline.
 *
 * Design: the published DSIR hashes n-grams into buckets; this engine's
 * variant uses a BOUNDED explicit vocabulary (the raw corpus's top-V
 * tokens + a pooled out-of-vocabulary class) with Laplace smoothing, the
 * same bounded-model contract as [[TextStats.unigramModel]]. Log-ratios
 * are quantized to integer MICRO-NATS, so per-document weights are integer
 * sums — bit-identical on any engine and any summation order (the
 * portability design shared by every model-scoring operator here).
 *
 * Scale shape: two token-count aggregations (map-side combinable), a
 * driver-merged V-entry model (parameters, never data), then ONE codegen'd
 * kernel scan to weight the corpus. Selection is a bounded
 * TakeOrderedAndProject top-k — per-partition heads merged on the driver,
 * no global sort.
 */
object Selection {

  /** Seed salt mixed into [[gumbelTopK]]'s draw so resampling is
    * decorrelated from threshold samples / splits / shuffles taken with
    * the same base seed (the chaining contract on [[Sampling.hashUnit]];
    * same upgrade-boundary note as [[Sampling.SplitSalt]]). */
  val GumbelSalt = 6000101L

  /** Strictly-in-(0,1) divisor for the Gumbel uniform draw: 2^63 + 2048
    * (exactly representable in a double). hash63 ranges over [0, 2^63-1],
    * so (h+1)/this is never 0 or 1 and -ln(-ln(u)) is always finite —
    * [[Sampling.hashUnit]]'s [0,1) range would put ln(0) = -Inf in the
    * key at u = 0. */
  val GumbelUnitDivisor = 9.223372036854778e18

  /**
   * Fit a DSIR importance model of `target` relative to `raw`: for each of
   * the raw corpus's `topV` most-frequent tokens (ties → token asc, the
   * [[TextStats.topKTokens]] order) the quantized log importance ratio
   *
   *   λ(f) = round((ln((c_t(f)+1)/(T_t+V+1)) − ln((c_r(f)+1)/(T_r+V+1)))·1e6)
   *
   * in integer micro-nats, where c_t/c_r are target/raw token counts and
   * T_t/T_r total token counts — Laplace add-1 smoothing over the V+1
   * outcomes (V vocabulary tokens + one pooled OOV class), so a token
   * absent from the target still gets a finite ratio. The OOV λ pools all
   * non-vocabulary mass on each side. A document's log importance weight
   * ln(p_target/p_raw) is then the integer sum of its tokens' λ — computed
   * by [[dsirLogWeight]] in one kernel pass.
   *
   * The vocabulary comes from the RAW side (the proposal distribution —
   * the side every document is scored against); `raw` must have at least
   * one token. Returns (vocab λ, oovλ).
   *
   * Scale shape: one token-count aggregation per side (both map-side
   * combinable; the target side is filtered to the ≤ topV vocabulary via a
   * broadcast semi-join before collecting), a V-entry driver merge — model
   * parameters throughout, never data.
   */
  def dsirModel(raw: DataFrame, target: DataFrame, textCol: String,
                topV: Int): (Seq[(String, Long)], Long) = {
    require(topV >= 1, s"topV must be >= 1, got $topV")
    val spark = raw.sparkSession
    import spark.implicits._

    val rawCounts = raw
      .select(F.explode(TextStats.tokens(F.col(textCol))).as("token"))
      .groupBy("token").agg(F.count(F.lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rawTotalRow = rawCounts.agg(F.sum("cnt")).head()
    require(!rawTotalRow.isNullAt(0) && rawTotalRow.getLong(0) > 0L,
      "dsirModel: raw corpus has no tokens")
    val rawTotal = rawTotalRow.getLong(0)
    val vocab = rawCounts.orderBy(F.col("cnt").desc, F.col("token"))
      .limit(topV).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    rawCounts.unpersist(blocking = false)

    val vocabDf = vocab.map(_._1).toSeq.toDF("token")
    val tgtTok = target
      .select(F.explode(TextStats.tokens(F.col(textCol))).as("token"))
    // one aggregation job: per-vocab-token counts (broadcast semi-join
    // keeps only <= topV groups) ...
    val tgtVocabCounts = tgtTok
      .join(F.broadcast(vocabDf), Seq("token"), "left_semi")
      .groupBy("token").agg(F.count(F.lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ... and one count job for the full target token total (null when
    // the target is empty -> 0; smoothing keeps everything finite).
    val tgtTotalRow = target
      .agg(F.sum(F.size(TextStats.tokens(F.col(textCol))))).head()
    val tgtTotal = if (tgtTotalRow.isNullAt(0)) 0L else tgtTotalRow.getLong(0)

    val v1 = vocab.length + 1 // smoothing outcomes: V vocab + pooled OOV
    def lam(ct: Long, cr: Long): Long = math.round(
      (math.log((ct + 1).toDouble / (tgtTotal + v1).toDouble)
        - math.log((cr + 1).toDouble / (rawTotal + v1).toDouble)) * 1e6)
    val model = vocab.map { case (t, cr) =>
      t -> lam(tgtVocabCounts.getOrElse(t, 0L), cr)
    }
    val inVocabTgt = vocab.iterator
      .map(v => tgtVocabCounts.getOrElse(v._1, 0L)).sum
    val inVocabRaw = vocab.iterator.map(_._2).sum
    (model.toSeq, lam(tgtTotal - inVocabTgt, rawTotal - inVocabRaw))
  }

  /** Per-document DSIR log importance weight in integer micro-nats: the
    * sum of the model's λ over the document's tokens (OOV tokens take the
    * pooled-OOV λ). One codegen'd kernel pass per row — literally the
    * [[TextStats.unigramScore]] walk with log-RATIOS as the table. More
    * positive = more target-like; feed to [[gumbelTopK]] to resample or
    * exp(x/1e6) for the raw importance weight. */
  def dsirLogWeight(text: Column, model: Seq[(String, Long)],
                    oovLw: Long): Column =
    org.apache.spark.sql.graft.GraftColumns.unigramScore(text, model, oovLw)

  /**
   * Gumbel-top-k: sample `k` rows WITHOUT replacement with probability
   * proportional to exp(score/1e6) — take the k largest
   * `score_micro + round(Gumbel(0,1)·1e6)` keys, where the Gumbel noise
   * `-ln(-ln(u))` draws u from the engine's portable seeded hash of the
   * id (Kool et al. 2019's trick; the exact resampling step DSIR
   * prescribes). Appends the integer `gumbel_micro` key column.
   *
   * Same determinism contract as [[Sampling.sampleByHash]]: seeded,
   * order- and partition-independent, reproducible engine-to-engine
   * (integer hash → one IEEE division → two ln calls → micro-quantized;
   * ties broken by id asc). Quantizing noise to micro-nats costs at most
   * 5e-7 nats of fidelity per row and buys order-independent integer
   * comparisons.
   *
   * Scale shape: one scan + TakeOrderedAndProject (per-partition top-k
   * heaps merged on the driver) — no global sort, k rows of driver state.
   */
  def gumbelTopK(df: DataFrame, idCol: String, scoreMicroCol: String,
                 k: Int, seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("gumbel_micro"),
      "gumbelTopK: input already has a gumbel_micro column")
    val h = graft.PortableHash.hash63(F.col(idCol), seed + GumbelSalt)
    val u = (h + F.lit(1L)).cast("double") / F.lit(GumbelUnitDivisor)
    val key = (F.col(scoreMicroCol).cast("long")
      + F.round(-F.log(-F.log(u)) * 1e6).cast("long")).as("gumbel_micro")
    df.withColumn("gumbel_micro", key)
      .orderBy(F.col("gumbel_micro").desc, F.col(idCol).asc)
      .limit(k)
  }
}
