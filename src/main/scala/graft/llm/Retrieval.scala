package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/**
 * BM25 top-k retrieval of corpus documents for a small, driver-side query
 * set — the lexical-search shape a training-data pipeline needs for
 * benchmark decontamination ("which corpus docs look like this eval
 * snippet") and targeted corpus audits. The query set is an eval-set-sized
 * model parameter by contract (tens to thousands of strings), never a
 * second corpus: its terms ride the closure into a post-explode filter, so
 * ONLY query-term occurrences ever shuffle — corpus-sized text stays in
 * the scan stage at any scale.
 *
 * 100 TB shape: ONE tokenize+explode corpus pass (plan-asserted): the
 * per-(doc, term) tf aggregation is the only token-level intermediate,
 * and document frequency is a re-aggregation OF that table — its subtree
 * shares the tf exchange, so Spark's ReuseExchange rule materializes the
 * heavy scan once and both consumers read the shuffle files. A second,
 * light corpus scan computes the 1-row (N, Σdl) totals without exploding
 * or shuffling tokens. Then a ≤|query terms| idf table broadcast back,
 * one (doc, term)-keyed aggregation whose volume is bounded by
 * query-term occurrences, and a bounded TopKAgg finisher per query — no
 * windows, no data-sized collects, no cartesians.
 *
 * Scoring is pinned for the DuckDB oracle replay: idf in integer
 * micro-nats (Lucene-shaped, always positive)
 * `round(ln((N - df + 0.5) / (df + 0.5) + 1) * 1e6)`, the classic tf
 * normalization `tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` evaluated in
 * the exact same IEEE expression shape on both engines, and the per-term
 * contribution re-quantized to integer micro-units so the per-(query,
 * doc) sum is order-free. `dl` counts whitespace-split tokens including
 * empties (split semantics, same as TextStats.tokenCount / the
 * doc_token_stats oracle); query terms are the DISTINCT non-empty
 * whitespace tokens of each query (query-side tf is ignored, the standard
 * BM25 form). Ties rank by ascending document id on both engines.
 */
object Retrieval {

  /**
   * Top `k` documents per query by BM25. `queries` is (query id, query
   * text); `k1`/`b` are the standard free parameters. Returns
   * `(q_id, doc_id, rank, score_micro)` — `rank` 1-based by
   * (score desc, doc_id asc), `score_micro` the integer micro-unit score.
   * Queries with no term occurring in the corpus return no rows.
   */
  def bm25TopK(corpus: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Long, String)], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(queries.nonEmpty, "queries must be non-empty")
    val qt: Seq[(Long, String)] = queries.flatMap { case (qid, t) =>
      t.split(" ", -1).filter(_.nonEmpty).distinct.map(qid -> _)
    }
    require(qt.nonEmpty, "query set has no non-empty terms")
    val s = corpus.sparkSession
    import s.implicits._
    val qtDf = qt.toDF("q_id", "term")
    // Term filter as a broadcast LEFT SEMI join, not isInCollection: an
    // In/InSet literal would EMBED every distinct query term in the plan
    // (twice — both scans), so at the contract ceiling (thousands of
    // queries) the plan/codegen bloats with the query set. The semi-join
    // keeps plan size O(1) and execution identical (broadcast hash
    // semi-join probes the same hash set InSet would build).
    val terms = F.broadcast(qtDf.select("term").distinct())

    // THE corpus tokenize+explode pass (r13 ran it twice — once for
    // document frequency, once for tf): per-(doc, query-term) tf + dl.
    val tf = corpus
      .select(F.col(idCol).as("__doc"),
        TextStats.tokenCount(F.col(textCol)).cast("long").as("__dl"),
        F.explode(TextStats.tokens(F.col(textCol))).as("term"))
      .join(terms, Seq("term"), "left_semi")
      .groupBy(F.col("__doc"), F.col("__dl"), F.col("term"))
      .agg(F.count(F.lit(1)).as("__tf"))
    // tf has exactly ONE row per (doc, term) (__dl is functionally
    // dependent on __doc), so counting rows per term IS the document
    // frequency — a bounded ≤|query terms|-row re-aggregation of the tf
    // table. Because this subtree contains the tf exchange verbatim,
    // ReuseExchange materializes the scan+explode once and this branch
    // reads the shuffle files (plan-asserted in RetrievalSpec). The
    // count deliberately REFERENCES __tf through a statically-nullable
    // conditional (always 1 at runtime — a count is >= 1): a plain
    // count(*) would let column pruning drop count(1) from this branch's
    // copy of the tf aggregate, de-canonicalizing the two exchanges and
    // silently re-doubling the corpus scans.
    val dfreq = tf.groupBy("term")
      .agg(F.count(F.when(F.col("__tf") >= 1, 1)).as("__df"))
    // 1-row corpus totals: a second corpus scan, but token-count only —
    // no explode, no token shuffle.
    val totals = corpus.agg(
      F.count(F.lit(1)).as("__n"),
      F.sum(TextStats.tokenCount(F.col(textCol)).cast("long")).as("__sumdl"))
    val idf = dfreq.crossJoin(F.broadcast(totals))
      .select(F.col("term"),
        F.round(F.log((F.col("__n") - F.col("__df") + 0.5) /
          (F.col("__df") + 0.5) + 1.0) * 1e6).cast("long").as("__idf_micro"),
        (F.col("__sumdl").cast("double") / F.col("__n")).as("__avgdl"))

    // Scoring: per-term micro-unit contributions summed per (query, doc),
    // top-k finished. (1.0 - b) and (k1 + 1.0) are single IEEE ops both
    // engines constant-fold identically — the oracle writes the same
    // literals.
    val scored = tf
      .join(F.broadcast(idf), Seq("term"))
      .join(F.broadcast(qtDf), Seq("term"))
      .withColumn("__s_micro",
        F.round(F.col("__idf_micro").cast("double") *
          (F.col("__tf") * F.lit(k1 + 1.0)) /
          (F.col("__tf") + F.lit(k1) *
            (F.lit(1.0 - b) + F.lit(b) * (F.col("__dl") / F.col("__avgdl")))))
          .cast("long"))
      .groupBy(F.col("q_id"), F.col("__doc"))
      .agg(F.sum(F.col("__s_micro")).as("__score"))

    val top = TopKAgg.topKUdaf(k, corpus.schema(idCol).dataType)
    scored.groupBy("q_id")
      .agg(top(F.col("__doc"), F.col("__score").cast("double")).as("__top"))
      .select(F.col("q_id"),
        F.posexplode(F.col("__top.hits")).as(Seq("pos", "hit")))
      .select(F.col("q_id"), F.col("hit.n_id").as("doc_id"),
        (F.col("pos") + 1).as("rank"),
        F.col("hit.cosine").cast("long").as("score_micro"))
  }

  /**
   * Hybrid retrieval: a BM25 lexical shortlist reranked by embedding
   * cosine — the standard two-stage dense/sparse search (recall from the
   * cheap inverted signal, precision from the vectors) used for
   * decontamination and RAG-style corpus lookup. `queries` are (id, text)
   * pairs whose ids also key their query embeddings in `emb`.
   *
   * Scale shape: stage 1 is [[bm25TopK]] (only query-term occurrences
   * shuffle; bounded TopKAgg finisher), producing |queries|·kLex rows —
   * model-sized. Stage 2 joins that shortlist (with the query vectors
   * attached) against the corpus embedding table — BROADCAST when the
   * projected shortlist size (|queries| · kLex · vector bytes, vector
   * width probed from one row) fits `maxBroadcastBytes`, so the big side
   * streams once through one broadcast hash join; beyond that ceiling
   * (thousands of queries × hundreds of kLex × 768-d doubles is
   * multi-GB — a driver OOM, not a slow plan) it falls back to a plain
   * id-keyed shuffle join, still candidate-volume-bounded. Scores one
   * cosine kernel per candidate and finishes with the same bounded top-k
   * heap — never a per-query window. Zero-norm embeddings (cosine 0/0 =
   * NaN) are EXCLUDED from the rerank on both engines — NaN ordering is
   * the one place Spark's comparator and SQL ORDER BY disagree, so the
   * contract pins it by construction. Output:
   * (q_id, doc_id, lex_rank, rank) with rank by cosine desc, doc_id asc.
   */
  def hybridTopK(corpus: DataFrame, emb: DataFrame, idCol: String,
                 textCol: String, vecIdCol: String, vecCol: String,
                 queries: Seq[(Long, String)], kLex: Int, k: Int,
                 maxBroadcastBytes: Long = 256L << 20): DataFrame = {
    require(k >= 1 && kLex >= k, s"need 1 <= k <= kLex, got k=$k kLex=$kLex")
    val qIds = queries.map(_._1)
    val shortlist = bm25TopK(corpus, idCol, textCol, queries, kLex)
      .select(F.col("q_id"), F.col("doc_id").as("n_id"),
        F.col("rank").as("lex_rank"))
    val qv = emb.filter(F.col(vecIdCol).isInCollection(qIds))
      .select(F.col(vecIdCol).as("q_id"), F.col(vecCol).as("__qv"))
    val cand = shortlist.join(qv, "q_id")
    // Size guard with a lazy probe: when even a conservative 8192-dim
    // ceiling keeps the projected shortlist under budget (the common
    // small-query case), skip the probe job entirely — this fast path
    // HARD-ASSUMES vectors are <= 8192-dim; corpora with wider vectors
    // pay the probe. Otherwise one cheap max-width aggregation decides:
    // max (not a first-row peek) so a null or atypically short leading
    // vector can't underestimate the widest row, and an EMPTY embedding
    // table degrades to dim 0 (an empty result downstream) instead of
    // throwing. 8 bytes per element plus struct slack, assuming every
    // query fills its kLex slots.
    val candCount = queries.size.toLong * kLex
    val underAnyDim = candCount * (8192L * 8 + 64) <= maxBroadcastBytes
    val fitsBudget = underAnyDim || {
      val dim = emb.agg(F.max(F.size(F.col(vecCol))).as("d"))
        .take(1).headOption
        .flatMap(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
        .getOrElse(0)
      candCount * (dim.toLong * 8 + 64) <= maxBroadcastBytes
    }
    val candSized = if (fitsBudget) F.broadcast(cand) else cand
    val dv = emb.select(F.col(vecIdCol).as("n_id"), F.col(vecCol).as("__dv"))
    val scored = dv.join(candSized, "n_id")
      .withColumn("__cos", Similarity.cosine(F.col("__qv"), F.col("__dv")))
      .filter(!F.isnan(F.col("__cos")))
    val top = TopKAgg.topKUdaf(k, emb.schema(vecIdCol).dataType)
    scored.groupBy("q_id")
      .agg(top(F.col("n_id"), F.col("__cos")).as("__top"))
      .select(F.col("q_id"),
        F.posexplode(F.col("__top.hits")).as(Seq("pos", "hit")))
      .select(F.col("q_id"), F.col("hit.n_id").as("doc_id"),
        (F.col("pos") + 1).as("rank"))
      .join({
        // Same guard for the vector-less lex-rank re-attach (≈96 B/row).
        val sl = shortlist.withColumnRenamed("n_id", "doc_id")
        if (queries.size.toLong * kLex * 96 <= maxBroadcastBytes)
          F.broadcast(sl)
        else sl
      }, Seq("q_id", "doc_id"))
      .select("q_id", "doc_id", "lex_rank", "rank")
  }
}
