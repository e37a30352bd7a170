package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Deduplication operators for training-data pipelines: exact, MinHash+LSH,
 * SimHash, and n-gram Jaccard verification.
 *
 * Scale design (the part that matters at 100 TB):
 *  - signatures are computed row-locally with higher-order functions
 *    (`transform`/`array_min`) — no explode of shingles, no UDF;
 *  - candidate generation is a `groupBy(band, bucket)` shuffle of
 *    (id, band-bucket) pairs only — never an all-pairs crossJoin;
 *  - buckets are capped (`maxBucketSize`) so a degenerate bucket (e.g.
 *    boilerplate docs) cannot produce a quadratic pair explosion — same
 *    guardrail production LSH dedup pipelines use;
 *  - exact-Jaccard verification joins the (small) candidate-pair set back
 *    to the corpus by id — two hash joins, each broadcastable when pairs
 *    are few.
 */
object Dedup {

  /** Normalized text for exact/near-exact dedup: sorted unique tokens. */
  def normalizedTokens(text: Column): Column =
    F.array_sort(F.array_distinct(F.split(text, " ")))

  /** Exact dedup on a normalized key: keep the smallest id per group.
    * Returns (keep id, group size). One hash-aggregate shuffle on a
    * fixed-width hash key — the canonical 100 TB exact-dedup shape. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String,
                 normalize: Boolean = true): DataFrame = {
    val key = if (normalize)
      F.md5(F.array_join(normalizedTokens(F.col(textCol)), " "))
    else F.md5(F.col(textCol))
    df.groupBy(key.as("dup_key"))
      .agg(F.min(F.col(idCol)).as("keep_id"), F.count(F.lit(1)).as("n_dupes"))
  }

  /** Word k-shingles of the token sequence. */
  def shingles(text: Column, k: Int): Column = {
    val toks = F.split(text, " ")
    F.array_distinct(
      F.transform(F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        i => F.array_join(F.slice(toks, i + 1, F.lit(k)), " ")))
  }

  /**
   * MinHash signature: numHashes independent min-hashes of the shingle set,
   * h_i(S) = min over s in S of xxhash64(i, s). Row-local, codegen'd.
   */
  def minHashSignature(text: Column, numHashes: Int, shingleSize: Int): Column = {
    val sh = shingles(text, shingleSize)
    F.transform(F.sequence(F.lit(0), F.lit(numHashes - 1)),
      seed => F.array_min(F.transform(sh, s => F.xxhash64(seed, s))))
  }

  /** LSH band buckets: signature split into `bands` rows of `rowsPerBand`,
    * each band hashed to one bucket id. */
  def lshBuckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    F.transform(F.sequence(F.lit(0), F.lit(bands - 1)),
      b => F.struct(b.as("band"),
        F.xxhash64(F.slice(sig, b * rowsPerBand + 1, F.lit(rowsPerBand))).as("bucket")))

  /**
   * Candidate near-duplicate pairs via banded MinHash-LSH, verified with
   * exact shingle-set Jaccard. Returns (id_a, id_b, jaccard) with
   * jaccard >= threshold, id_a < id_b.
   */
  def minHashDedupPairs(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 128, bands: Int = 16,
                        shingleSize: Int = 3, threshold: Double = 0.7,
                        maxBucketSize: Int = 64): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSig = df.select(F.col(idCol).as("id"),
      minHashSignature(F.col(textCol), numHashes, shingleSize).as("sig"))
    val buckets = withSig
      .select(F.col("id"), F.explode(lshBuckets(F.col("sig"), bands, rowsPerBand)).as("bk"))
      .select(F.col("id"), F.col("bk.band"), F.col("bk.bucket"))
    // groupBy(band, bucket): one shuffle keyed on the bucket hash; the
    // bucket-size cap bounds the pair fan-out per bucket.
    val pairs = buckets.groupBy("band", "bucket")
      .agg(F.slice(F.array_sort(F.collect_list(F.col("id"))), 1, maxBucketSize).as("ids"))
      .filter(F.size(F.col("ids")) > 1)
      .select(F.explode(pairsOf(F.col("ids"))).as("p"))
      .select(F.col("p.a").as("id_a"), F.col("p.b").as("id_b"))
      .distinct()
    val sh = df.select(F.col(idCol).as("id"),
      shingles(F.col(textCol), shingleSize).as("sh"))
    pairs
      .join(sh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), Seq("id_a"))
      .join(sh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double") /
          F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))).cast("double"))
      .filter(F.col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** All ordered pairs (a<b) of a sorted id array, as array<struct<a,b>>. */
  private def pairsOf(ids: Column): Column =
    F.flatten(F.transform(ids, (a, i) =>
      F.transform(F.slice(ids, i + 2, F.size(ids)), b =>
        F.struct(a.as("a"), b.as("b")))))

  /** 64-bit SimHash over the token multiset: bit i of the sketch is the
    * majority vote of bit i across token hashes. Row-local expressions. */
  def simHash(text: Column): Column = {
    val toks = F.split(text, " ")
    val m = F.size(toks)
    // 64 per-bit majority votes, unrolled at plan-build time (shift amounts
    // must be literals); each is a codegen'd filter over the token array.
    val bits = (0 until 64).map { i =>
      val ones = F.size(F.filter(toks, t =>
        F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1L)) === 1L))
      F.when(ones * 2 > m, F.lit(1L)).otherwise(F.lit(0L))
    }
    // bitwise fold (shift+or): ANSI mode rejects the overflowing acc*2+b
    F.aggregate(F.array(bits: _*), F.lit(0L),
      (acc, b) => F.shiftleft(acc, 1).bitwiseOR(b))
  }

  /** SimHash near-dup candidates: split the 64-bit sketch into 4 16-bit
    * bands; docs sharing any band are candidates (covers Hamming distance
    * <= 3 by pigeonhole). Returns (id_a, id_b, hamming <= maxHamming). */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucketSize: Int = 64): DataFrame = {
    val withSketch = df.select(F.col(idCol).as("id"), simHash(F.col(textCol)).as("sk"))
    val bandStructs = (0 until 4).map(b =>
      F.struct(F.lit(b).as("band"),
        F.shiftright(F.col("sk"), b * 16).bitwiseAND(F.lit(0xFFFFL)).as("bucket")))
    val banded = withSketch.select(F.col("id"), F.col("sk"),
      F.explode(F.array(bandStructs: _*)).as("bk"))
      .select(F.col("id"), F.col("sk"), F.col("bk.band"), F.col("bk.bucket"))
    val pairs = banded.groupBy("band", "bucket")
      .agg(F.slice(F.array_sort(F.collect_list(F.struct(F.col("id"), F.col("sk")))),
        1, maxBucketSize).as("xs"))
      .filter(F.size(F.col("xs")) > 1)
      .select(F.explode(pairsOf2(F.col("xs"))).as("p"))
      .select(F.col("p.a.id").as("id_a"), F.col("p.b.id").as("id_b"),
        F.bit_count(F.col("p.a.sk").bitwiseXOR(F.col("p.b.sk"))).as("hamming"))
      .distinct()
    pairs.filter(F.col("hamming") <= maxHamming)
  }

  private def pairsOf2(xs: Column): Column =
    F.flatten(F.transform(xs, (a, i) =>
      F.transform(F.slice(xs, i + 2, F.size(xs)), b =>
        F.struct(a.as("a"), b.as("b")))))

  /** Exact n-gram (word-set) Jaccard similarity pairs within a blocking key
    * (e.g. source): a grouped self-join — the blocked-comparison shape that
    * scales when block sizes are bounded. */
  def jaccardPairsWithin(df: DataFrame, idCol: String, textCol: String,
                         blockCol: String, threshold: Double): DataFrame = {
    val d = df.select(F.col(blockCol).as("blk"), F.col(idCol).as("id"),
      normalizedTokens(F.col(textCol)).as("ws"))
    val a = d.select(F.col("blk"), F.col("id").as("id_a"), F.col("ws").as("ws_a"))
    val b = d.select(F.col("blk"), F.col("id").as("id_b"), F.col("ws").as("ws_b"))
    a.join(b, Seq("blk"))
      .filter(F.col("id_a") < F.col("id_b"))
      .withColumn("jaccard",
        F.size(F.array_intersect(F.col("ws_a"), F.col("ws_b"))).cast("double") /
          F.size(F.array_union(F.col("ws_a"), F.col("ws_b"))).cast("double"))
      .filter(F.col("jaccard") >= threshold)
      .select(F.col("blk").as("block"), F.col("id_a"), F.col("id_b"), F.col("jaccard"))
  }
}
