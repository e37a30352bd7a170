package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Two paths:
 *  - [[bruteForceTopK]]: exact cosine top-k — the baseline. The (small)
 *    query set is broadcast against the corpus, so the cost is one linear
 *    corpus scan per batch of queries; ranking is a per-query window top-k.
 *  - [[ivfTopK]]: IVF-style cell-probed search — the scale path. The corpus
 *    is assigned once to its nearest centroid cell (a narrow map), queries
 *    probe their `nprobe` nearest cells, and candidate scoring touches only
 *    those cells' vectors: an equi-join on cell id instead of the full scan.
 *    Centroids are caller-provided (k-means or sampled seeds) and broadcast
 *    as a literal — they are model parameters, not data.
 *
 * All vector math is `zip_with`/`aggregate` over the array column in double
 * precision — codegen'd, no UDF, no collect.
 */
object Similarity {

  /** Σ a_i b_i in double precision — a codegen'd kernel expression with the
    * same sequential accumulation order as the `zip_with`+`aggregate` fold
    * it replaced (identical IEEE results, ~10x less per-row dispatch). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftColumns.dotProduct(a, b)

  def l2Norm(a: Column): Column = F.sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftColumns.cosineSim(a, b)

  /**
   * Shared scale-safe top-k finisher for every search operator: ranks a
   * scored candidate frame (q_id, n_id, cosine, ...) down to each query's
   * k best via [[TopKAgg]] — a bounded size-k buffer per q_id, combined
   * map-side, so shuffle volume is k × partitions × |queries| rows rather
   * than every scored candidate, and no task ever sorts a query's full
   * candidate list (for brute-force search that list is the whole corpus —
   * a single-task ~10¹¹-row sort per query at 100 TB under the
   * `row_number` window finisher this replaced). Ordering is identical to
   * that window: cosine DESC, n_id ASC. Output: (q_id, n_id, rank, cosine).
   */
  private def topKRank(scored: DataFrame, k: Int): DataFrame = {
    val top = TopKAgg.topKUdaf(k, scored.schema("n_id").dataType)
    scored.groupBy("q_id")
      .agg(top(F.col("n_id"), F.col("cosine")).as("top"))
      .select(F.col("q_id"), F.posexplode(F.col("top.hits")).as(Seq("pos", "hit")))
      .select(F.col("q_id"), F.col("hit.n_id").as("n_id"),
        (F.col("pos") + 1).as("rank"), F.col("hit.cosine").as("cosine"))
  }

  /**
   * Exact top-k neighbors for each query vector. `queries` must be small
   * (it is broadcast); `corpus` streams. Self-matches (same id) excluded.
   * Output: (q_id, n_id, rank, cosine).
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(F.col(idCol).as("q_id"), F.col(vecCol).as("q_vec"))
    val c = corpus.select(F.col(idCol).as("n_id"), F.col(vecCol).as("n_vec"))
    val scored = c.join(F.broadcast(q), F.col("q_id") =!= F.col("n_id"))
      .withColumn("cosine", cosine(F.col("q_vec"), F.col("n_vec")))
    topKRank(scored, k)
  }

  /**
   * (corpus size, the `cap` smallest-id (id, vector) rows) in ONE
   * aggregation job — the pre-pass for recipes that size their cell count
   * as f(N) and seed centroids from the smallest ids (IVF search, flat-IVF
   * dedup). Stacking `count(*)` and the bounded [[SeedsAgg]] collection in
   * one `agg` halves the pre-pipeline corpus scans (a separate count job
   * plus a filtered seed-collect job each read the corpus once). The
   * seed list is id-ascending; callers slice the k ≤ `cap` seeds they
   * need after deriving k from the count. `cap` bounds every partial
   * buffer (map-side combinable), so the job collects model parameters,
   * never data.
   *
   * Byte trade-off vs the two-job split (metadata-cheap `count()` +
   * id-pruned seed collect): this form reads the (id, vec) projection
   * once. Prefer the split when seed ids are CLUSTERED in storage (the
   * filtered collect then prunes whole row groups and reads almost
   * nothing); prefer this one-job form when ids are scattered (pruning
   * buys nothing and the filtered scan decodes the id column everywhere
   * anyway) or when per-job scheduling overhead dominates, as it does for
   * recipe pre-passes over already-cached or soon-to-be-scanned corpora.
   *
   * The id column must be an integral type (byte/short/int/long) — a
   * string or decimal id would silently become null under the long cast
   * and be skipped by the seed collection, returning a correct count with
   * a partial seed list; that failure mode is rejected up front instead.
   * Seed ids are additionally assumed NON-NEGATIVE by callers that use
   * "all ids < k are among the cap smallest" as a coverage guard
   * (`QueriesLLM.sqrtCells`); negative ids still collect correctly here
   * but break that caller-side fallback reasoning.
   */
  def countAndSeeds(df: DataFrame, idCol: String, vecCol: String,
                    cap: Int = 4096): (Long, Seq[(Long, Seq[Float])]) = {
    import org.apache.spark.sql.types._
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"countAndSeeds id column '$idCol' must be integral " +
          s"(byte/short/int/long); got $other — cast or re-key the id " +
          "column before seeding (a lossy silent cast would yield a " +
          "partial seed list)")
    }
    val seeds = SeedsAgg.seedsUdaf(cap)
    val row = df.select(F.col(idCol).cast("long").as("id"),
        F.col(vecCol).cast("array<float>").as("vec"))
      .agg(F.count(F.lit(1)).as("n"),
        seeds(F.col("id"), F.col("vec")).as("seeds"))
      .head()
    (row.getLong(0),
      row.getStruct(1).getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getSeq[Float](1))))
  }

  private def flat(centroids: Seq[Seq[Float]]): (Array[Double], Int) = {
    val dim = centroids.head.length
    require(centroids.forall(_.length == dim), "centroids must share one dimension")
    (centroids.flatten.map(_.toDouble).toArray, dim)
  }

  /** Nearest-centroid cell id (0-based) for a vector; ties resolve to the
    * lowest cell id. One compiled pass over the centroid matrix per row. */
  def cellOf(vec: Column, centroids: Seq[Seq[Float]]): Column = {
    val (cents, dim) = flat(centroids)
    org.apache.spark.sql.graft.GraftColumns.centroidCell(vec, cents, dim)
  }

  /** Top-`nprobe` nearest cells for a query vector (ties → higher cell
    * first, matching the reverse-sort form this kernel replaced). */
  def probeCells(vec: Column, centroids: Seq[Seq[Float]], nprobe: Int): Column = {
    val (cents, dim) = flat(centroids)
    org.apache.spark.sql.graft.GraftColumns.centroidProbes(vec, cents, dim, nprobe)
  }

  /**
   * Embedding-cosine near-duplicate pairs, cell-bucketed: every vector is
   * duplicated into its `nprobe` nearest centroid cells, candidate pairs
   * share a cell, and the exact cosine filter keeps pairs at or above
   * `threshold`. The pair fan-out is per-cell (never an all-pairs
   * crossJoin), the same candidates→exact-verify shape as MinHash-LSH —
   * the 100 TB path for embedding dedup. Near-identical vectors share a
   * nearest cell with overwhelming probability; recall at low thresholds
   * is bounded by cell granularity (grow `nprobe`/centroids to taste).
   * Output: (id_a, id_b, cosine rounded to 6).
   */
  def cosineDupPairs(df: DataFrame, idCol: String, vecCol: String,
                     centroids: Seq[Seq[Float]], threshold: Double,
                     nprobe: Int = 2): DataFrame = {
    val c = df.select(F.col(idCol).as("id"), F.col(vecCol).as("v"))
      .withColumn("cell", F.explode(probeCells(F.col("v"), centroids, nprobe)))
    val a = c.select(F.col("cell"), F.col("id").as("id_a"), F.col("v").as("v_a"))
    val b = c.select(F.col("cell"), F.col("id").as("id_b"), F.col("v").as("v_b"))
    // full-width probe parallelism under a broadcast build (see PairJoin:
    // without it the whole O(cell²) loop runs in ONE scan task)
    val (aPar, bSide) = PairJoin.sides(a, b, Seq(F.col("cell"), F.col("id_a")))
    aPar.join(bSide, Seq("cell"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select(F.col("id_a"), F.col("id_b"),
        F.round(cosine(F.col("v_a"), F.col("v_b")), 6).as("cosine"))
      // threshold BEFORE the cross-cell collapse (r15, guide §2.3): the
      // cosine is a pure function of the pair, so every cell-copy of a
      // pair carries the identical value and filtering first drops the
      // same rows it would drop after — but now only SURVIVORS (typically
      // a small fraction of candidate pairs) shuffle through the distinct
      // exchange instead of the full per-cell candidate fan-out.
      .filter(F.col("cosine") >= threshold)
      // a pair sharing several probed cells appears once per cell with an
      // identical cosine; collapse the survivors
      .dropDuplicates("id_a", "id_b")
  }

  /**
   * Deterministic ±1 random-hyperplane matrix for [[signLshDupPairs]]:
   * `bands * rowsPerBand` planes of `dim` components each, derived from a
   * splitmix-style integer mix of (seed, plane index, component index) —
   * reproducible on any engine, any partition order, and embeddable as
   * literals in an oracle SQL string.
   */
  def lshPlanes(bands: Int, rowsPerBand: Int, dim: Int,
                seed: Long = 42L): Seq[Seq[Double]] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until bands * rowsPerBand).map { t =>
      (0 until dim).map { j =>
        if ((mix(seed * 0x100000001L + t.toLong * dim + j) & 1L) == 0L) -1.0
        else 1.0
      }
    }
  }

  /**
   * Embedding near-duplicate pairs via banded sign-random-projection LSH —
   * the LINEAR-scale path for the high-threshold regime (cosine ≥ ~0.9,
   * i.e. true duplicates), complementing [[cosineDupPairs]]'s flat-IVF
   * moderate-threshold mining (which is Θ(N^1.5) by nature: moderate
   * similarity can't be bucketed without near-all-pairs work).
   *
   * Each vector gets a `rowsPerBand`-bit signature per band (bit = sign of
   * the dot product with a fixed hyperplane); candidate pairs agree on ALL
   * bits of at least one band; the exact cosine filter then keeps pairs at
   * or above `threshold`. Scaling: signatures are one codegen'd scan
   * (O(N · bands · rowsPerBand · dim)); the band-bucket join is an
   * equi-join; expected random collisions are N²·bands/2^rowsPerBand, so
   * `rowsPerBand` ≈ 2·log2(N) keeps candidate work linear while band count
   * buys back recall (p^R per band, 1-(1-p^R)^B overall, p = 1 − θ/π). At
   * duplicate-level similarity (cos ≥ 0.99 ⇒ p ≥ 0.995) recall stays ≈ 1
   * for R ≤ 24 with B = 8.
   *
   * Output: (id_a, id_b, cosine rounded to 6), id_a < id_b, distinct.
   */
  def signLshDupPairs(df: DataFrame, idCol: String, vecCol: String,
                      planes: Seq[Seq[Double]], rowsPerBand: Int,
                      threshold: Double): DataFrame = {
    require(planes.nonEmpty && planes.size % rowsPerBand == 0,
      "planes.size must be a positive multiple of rowsPerBand")
    val dim = planes.head.length
    require(planes.forall(_.length == dim), "planes must share one dimension")
    val v = F.col("v")
    // All band values in ONE kernel call per row (band value = little-endian
    // integer of the band's sign bits; each plane's dot product is the same
    // left-to-right fold as the oracle's list_dot_product). A per-bit
    // expression tree here fell out of codegen and evaluated ~50× slower.
    val sig = df.select(F.col(idCol).as("id"), F.col(vecCol).as("v"))
      .select(F.col("id"), v,
        F.posexplode(org.apache.spark.sql.graft.GraftColumns.lshBands(
          v, planes.flatten.toArray, dim, rowsPerBand)).as(Seq("band", "bv")))
    val a = sig.select(F.col("band"), F.col("bv"),
      F.col("id").as("id_a"), v.as("v_a"))
    val b = sig.select(F.col("band"), F.col("bv"),
      F.col("id").as("id_b"), v.as("v_b"))
    val (aPar, bSide) = PairJoin.sides(a, b,
      Seq(F.col("band"), F.col("bv"), F.col("id_a")))
    aPar.join(bSide, Seq("band", "bv"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select(F.col("id_a"), F.col("id_b"),
        F.round(cosine(F.col("v_a"), F.col("v_b")), 6).as("cosine"))
      // a pair agreeing in several bands appears once per band with an
      // identical cosine; collapse before the threshold filter
      .dropDuplicates("id_a", "id_b")
      .filter(F.col("cosine") >= threshold)
  }

  /**
   * IVF-PQ top-k — the canonical billion-scale ANN layout: the corpus is
   * routed ONCE to its nearest coarse cell and stored as (id, cell,
   * codes) with m-code PQ compression; each query probes its `nprobe`
   * best cells and ranks only those cells' candidates by the asymmetric
   * reconstruction cosine. This composes the two scale levers: IVF
   * narrows the candidates to ~nprobe/|cells| of the corpus, PQ shrinks
   * every candidate read to m codes — at 1024 cells, nprobe 8, m=8 over
   * 64-dim floats, a full search touches ~0.8% of the rows at ~1/32 of
   * the bytes each. Candidate generation is an equi-join on cell id
   * against broadcast probes; nothing driver-side but the model
   * parameters (centroids + codebooks).
   *
   * Sizing: the coarse cell count must GROW with the corpus — cells ≈
   * 2·√N keeps per-cell candidate lists at ~√N/2 so probed work is
   * Θ(nprobe·√N) per query; a FIXED cell count degrades to scanning
   * nprobe/|cells| of the whole corpus per query. Derive the count from
   * a cheap `count(*)` (the registry recipes and their oracles both do).
   */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, coarse: Seq[Seq[Float]],
                codebooks: Seq[Seq[Seq[Float]]], k: Int,
                nprobe: Int = 2): DataFrame = {
    val enc = corpus.select(F.col(idCol).as("id"),
      cellOf(F.col(vecCol), coarse).as("cell"),
      pqCodes(F.col(vecCol), codebooks).as("codes"))
    ivfPqTopKEncoded(queries, enc, idCol, vecCol, codebooks, k, nprobe,
      coarse)
  }

  /** [[ivfPqTopK]] over the stored index frame — the search path that
    * never reads a raw corpus vector. The index frame's schema is named
    * explicitly: `indexIdCol` (default `id`), `indexCellCol` (default
    * `cell`), `indexCodesCol` (default `codes`) — the (id, cell, codes)
    * layout [[ivfPqTopK]] builds; callers storing the index under their
    * own column names pass them here rather than renaming the frame. */
  def ivfPqTopKEncoded(queries: DataFrame, index: DataFrame, idCol: String,
                       vecCol: String, codebooks: Seq[Seq[Seq[Float]]],
                       k: Int, nprobe: Int,
                       coarse: Seq[Seq[Float]],
                       indexIdCol: String = "id",
                       indexCellCol: String = "cell",
                       indexCodesCol: String = "codes"): DataFrame = {
    // Decode once per index row, then the cell equi-join routes probes.
    // An r15 experiment semi-prefiltered the decode to probed cells only;
    // it measured 1.2× (fixed 10-query set) to 1.56× (1%-of-corpus query
    // set, where the probed-cell set approaches ALL cells and the semi
    // saves nothing) SLOWER at 10× — the extra broadcast stage barrier
    // costs more than the skipped decodes at any scale we can measure,
    // and the decode is barrier-free map work.
    val c = index.select(F.col(indexIdCol).as("n_id"),
      F.col(indexCellCol).as("cell"),
      pqDecode(F.col(indexCodesCol), codebooks).as("n_vec"))
    val q = queries.select(F.col(idCol).as("q_id"),
        F.col(vecCol).cast("array<double>").as("q_vec"))
      .withColumn("cell",
        F.explode(probeCells(F.col("q_vec"), coarse, nprobe)))
    val scored = c.join(F.broadcast(q), Seq("cell"))
      .filter(F.col("q_id") =!= F.col("n_id"))
      .withColumn("cosine", cosine(F.col("q_vec"), F.col("n_vec")))
    topKRank(scored, k)
  }

  /**
   * Deterministic quantized Lloyd k-means — trains the centroids [[ivfTopK]]
   * consumes, with bit-reproducible results on any engine and any partition
   * order. Two design choices buy the determinism:
   *
   *  - vectors are quantized ONCE to integers (`round(x * quantScale)` as
   *    long), so every per-cell sum is exact integer arithmetic — immune to
   *    the float-summation-order nondeterminism that makes ordinary
   *    distributed k-means unreproducible run to run;
   *  - centroid updates are integer round-half-up means,
   *    `floorDiv(2·Σq + n, 2n)` — exact, and mirrorable in SQL as
   *    `floor((2·Σq + n) / (2n))` (quotient magnitudes stay far below
   *    2^53, where IEEE division is exact enough that floor cannot flip).
   *
   * Init = the `k` vectors with the smallest ids (deterministic seeding).
   * Assignment = cosine argmax (ties → lowest cell), the same compiled
   * kernel the IVF query path uses. Per iteration: one narrow assignment
   * scan + one (cell, dim)-keyed aggregation; k·dim partial sums collect to
   * the driver (model parameters, same broadcast design as the reference's
   * clock/centroid handling). Empty cells keep their previous centroid.
   *
   * Returns (assignments (id, cell) under the FINAL centroids, centroids in
   * original embedding scale).
   */
  def kmeansCells(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
                  iters: Int, quantScale: Double = 1e7): (DataFrame, Seq[Seq[Float]]) = {
    require(k >= 1 && iters >= 0, "k and iters must be positive")
    val q = corpus.select(F.col(idCol).as("id"),
      F.transform(F.col(vecCol), x =>
        F.round(x.cast("double") * quantScale).cast("long")).as("q"))
      .persist()
    val init = q.orderBy("id").limit(k).collect()
      .map(_.getSeq[Long](1).toArray)
    require(init.length == k, s"corpus has fewer than $k vectors")
    val cents = lloydIterate(q, init, iters)
    // release the iteration cache: the returned frame re-derives `q` with
    // one narrow scan if executed after eviction — cheap, and no cached
    // blocks leak when callers only keep the centroids
    q.unpersist(blocking = false)
    val out = assignedTo(q, cents).select(F.col("id").as(idCol), F.col("cell"))
    (out, cents.toSeq.map(_.toSeq.map(v => (v / quantScale).toFloat)))
  }

  /** Cosine-argmax assignment of a quantized frame (id, q: array<long>) to
    * integer-centroid cells — the shared inner step of [[kmeansCells]] and
    * [[pqTrain]]. */
  private def assignedTo(q: DataFrame, cents: Array[Array[Long]]): DataFrame = {
    val dim = cents.head.length
    val flatD = cents.flatten.map(_.toDouble)
    q.withColumn("cell", org.apache.spark.sql.graft.GraftColumns.centroidCell(
      F.transform(F.col("q"), _.cast("double")), flatD, dim))
  }

  /** Quantized Lloyd iterations over (id, q: array<long>): integer
    * round-half-up centroid means, empty cells keep their previous
    * centroid. Deterministic on any engine / partition order (see
    * [[kmeansCells]]). Per iteration: one assignment scan + one
    * (cell, pos)-keyed aggregation collecting k·dim model parameters. */
  private def lloydIterate(q: DataFrame, init: Array[Array[Long]],
                           iters: Int): Array[Array[Long]] = {
    var cents = init
    for (_ <- 1 to iters) {
      val sums = assignedTo(q, cents)
        .select(F.col("cell"), F.posexplode(F.col("q")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(F.sum("v").as("s"), F.count(F.lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      sums.foreach { r =>
        val (cell, pos) = (r.getInt(0), r.getInt(1))
        val (s, n) = (r.getLong(2), r.getLong(3))
        next(cell)(pos) = Math.floorDiv(2 * s + n, 2 * n)
      }
      cents = next
    }
    cents
  }

  /**
   * Product-quantization codebooks: the vector space is split into `m`
   * contiguous subspaces of `dim/m` components and each subspace gets its
   * own `k`-cell quantizer, trained by the SAME deterministic quantized
   * Lloyd procedure as [[kmeansCells]] (integer-quantized sums, integer
   * round-half-up means, cosine-argmax assignment — "spherical" PQ, the
   * inner-product-search variant). Init per subspace = the sub-vectors of
   * the `k` smallest ids.
   *
   * Scale shape: training is m short Lloyd runs over ONE cached quantized
   * scan of the corpus; each iteration collects k·(dim/m) integer model
   * parameters — never data. The payoff is downstream: [[pqEncode]]
   * compresses a 4·dim-byte float vector to m small codes (m bytes at
   * k ≤ 256), a 32× storage/scan reduction at dim=64, m=8 — the difference
   * between re-reading 100 TB of raw embeddings per search and 3 TB of
   * codes. Returns codebooks(m)(k)(dim/m) in original embedding scale.
   */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
              iters: Int, quantScale: Double = 1e7): Seq[Seq[Seq[Float]]] = {
    require(m >= 1 && k >= 1 && iters >= 0, "m, k must be >= 1; iters >= 0")
    val q = corpus.select(F.col(idCol).as("id"),
      F.transform(F.col(vecCol), x =>
        F.round(x.cast("double") * quantScale).cast("long")).as("q"))
      .persist()
    val initRows = q.orderBy("id").limit(k).collect()
      .map(_.getSeq[Long](1).toArray)
    require(initRows.length == k, s"corpus has fewer than $k vectors")
    val dim = initRows.head.length
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val sub = dim / m
    // All m subspace trainers FUSED into one job per Lloyd iteration: the
    // r15 shape ran m sequential jobs (one scan + one aggregation each)
    // over the same cached frame; one pass computes every subspace's
    // cosine-argmax assignment and (j, cell, pos)-keyed integer sums at
    // once — identical per-subspace arithmetic (exact integer sums +
    // round-half-up means are order-free), m× fewer scans and shuffles.
    var books: Array[Array[Array[Long]]] =
      (0 until m).map(j => initRows.map(_.slice(j * sub, j * sub + sub))).toArray
    for (_ <- 1 to iters) {
      val cur = books
      val assigned = q.select(F.explode(F.array((0 until m).map { j =>
          val qj = F.slice(F.col("q"), j * sub + 1, sub)
          val flatD = cur(j).flatten.map(_.toDouble)
          F.struct(F.lit(j).as("j"),
            org.apache.spark.sql.graft.GraftColumns.centroidCell(
              F.transform(qj, _.cast("double")), flatD, sub).as("cell"),
            qj.as("qj"))
        }: _*)).as("s"))
        .select(F.col("s.j").as("j"), F.col("s.cell").as("cell"),
          F.posexplode(F.col("s.qj")).as(Seq("pos", "v")))
      val sums = assigned.groupBy("j", "cell", "pos")
        .agg(F.sum("v").as("s"), F.count(F.lit(1)).as("n"))
        .collect()
      val next = books.map(_.map(_.clone()))
      sums.foreach { r =>
        val (j, cell, pos) = (r.getInt(0), r.getInt(1), r.getInt(2))
        val (s, n) = (r.getLong(3), r.getLong(4))
        next(j)(cell)(pos) = Math.floorDiv(2 * s + n, 2 * n)
      }
      books = next
    }
    q.unpersist(blocking = false)
    books.toSeq.map(_.toSeq.map(_.toSeq.map(v => (v / quantScale).toFloat)))
  }

  /** PQ code assignment: `codes(j)` = the cosine-argmax cell of subspace
    * `j`'s sub-vector in `codebooks(j)` — m compiled kernel passes fused
    * into one narrow scan, no shuffle. The (id, codes) frame is the
    * storable compressed form of the corpus. */
  def pqCodes(vec: Column, codebooks: Seq[Seq[Seq[Float]]]): Column = {
    val sub = codebooks.head.head.length
    F.array(codebooks.zipWithIndex.map { case (book, j) =>
      cellOf(F.slice(vec, j * sub + 1, sub), book)
    }: _*)
  }

  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               codebooks: Seq[Seq[Seq[Float]]]): DataFrame =
    df.select(F.col(idCol).as("id"),
      pqCodes(F.col(vecCol), codebooks).as("codes"))

  /** Reconstructed vector from PQ codes: concatenation of each subspace's
    * selected centroid (double precision) — pure `element_at` lookups into
    * the codebook literal, codegen'd. */
  def pqDecode(codes: Column, codebooks: Seq[Seq[Seq[Float]]]): Column =
    F.flatten(F.array(codebooks.zipWithIndex.map { case (book, j) =>
      F.element_at(
        F.typedLit(book.map(_.map(_.toDouble))),
        F.element_at(codes, j + 1) + 1)
    }: _*))

  /**
   * Asymmetric top-k search over the PQ-compressed corpus: each (small,
   * broadcast) query is ranked against `cosine(q_vec, decode(codes))` —
   * the query side stays exact, the corpus side is its reconstruction, the
   * standard ADC estimate. The corpus scan touches only (id, codes): at
   * m=8, k=256 that is ~1/32 of the raw embedding bytes, which is the
   * whole point at 100 TB — the ranking flops are unchanged but the scan
   * is codes-only. Output: (q_id, n_id, rank, cosine-of-reconstruction).
   */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, codebooks: Seq[Seq[Seq[Float]]],
             k: Int): DataFrame =
    pqTopKEncoded(queries, pqEncode(corpus, idCol, vecCol, codebooks),
      idCol, vecCol, codebooks, k)

  /** [[pqTopK]] over an already-encoded corpus (the stored (id, codes)
    * frame from [[pqEncode]]) — the actual 100 TB search path: the scan
    * reads m codes per vector, nothing else. [[pqTopK]] is this plus an
    * on-the-fly encode for callers holding raw vectors. */
  def pqTopKEncoded(queries: DataFrame, encoded: DataFrame, idCol: String,
                    vecCol: String, codebooks: Seq[Seq[Seq[Float]]],
                    k: Int): DataFrame = {
    val c = encoded.select(F.col("id").as("n_id"),
      pqDecode(F.col("codes"), codebooks).as("n_vec"))
    val q = queries.select(F.col(idCol).as("q_id"),
      F.col(vecCol).cast("array<double>").as("q_vec"))
    val scored = c.join(F.broadcast(q), F.col("q_id") =!= F.col("n_id"))
      .withColumn("cosine", cosine(F.col("q_vec"), F.col("n_vec")))
    topKRank(scored, k)
  }

  /**
   * IVF-style ANN: corpus assigned to cells once; each query probes its
   * `nprobe` best cells and ranks only those candidates. Sizing guidance:
   * at corpus size N, cells ≈ 2·√N balances the per-query probe work
   * against cell population (a FIXED cell count makes per-cell candidate
   * lists grow linearly with the corpus — quadratic total search work);
   * derive the count from a cheap `count(*)` as the registry recipes do.
   * Output: (q_id, n_id, rank, cosine).
   */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              centroids: Seq[Seq[Float]], k: Int, nprobe: Int = 2): DataFrame = {
    val c = corpus.select(F.col(idCol).as("n_id"), F.col(vecCol).as("n_vec"))
      .withColumn("cell", cellOf(F.col("n_vec"), centroids))
    val q = queries.select(F.col(idCol).as("q_id"), F.col(vecCol).as("q_vec"))
      .withColumn("cell", F.explode(probeCells(F.col("q_vec"), centroids, nprobe)))
    val scored = c.join(F.broadcast(q), Seq("cell"))
      .filter(F.col("q_id") =!= F.col("n_id"))
      .withColumn("cosine", cosine(F.col("q_vec"), F.col("n_vec")))
    topKRank(scored, k)
  }
}
