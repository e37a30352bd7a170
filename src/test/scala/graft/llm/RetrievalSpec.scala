package graft.llm

import graft.SparkTestBase

/**
 * BM25 top-k retrieval (Retrieval.scala): the distributed plan against an
 * independent direct-formula replay, rank/tie semantics, query-side term
 * normalization, and plan shape (broadcast small sides, no corpus
 * cartesians). The cross-engine replay is pinned by the bm25_topk
 * registry row's DuckDB oracle.
 */
class RetrievalSpec extends SparkTestBase {

  /** Independent direct-formula BM25 replay on a driver-side corpus —
    * deliberately structured nothing like the distributed plan (per-doc
    * loops; the only shared structure is the pinned quantization
    * points). */
  private def bruteBm25(corpus: Seq[(Long, String)],
                        queries: Seq[(Long, String)], k: Int,
                        k1: Double = 1.2,
                        b: Double = 0.75): Seq[(Long, Long, Int, Long)] = {
    val n = corpus.size.toLong
    val dls = corpus.map { case (id, t) =>
      id -> t.split(" ", -1).length.toLong
    }.toMap
    val avgdl = dls.values.sum.toDouble / n
    def tf(text: String): Map[String, Long] =
      text.split(" ", -1).filter(_.nonEmpty).groupBy(identity)
        .map { case (w, o) => w -> o.length.toLong }
    val tfs = corpus.map { case (id, t) => id -> tf(t) }.toMap
    def df(term: String): Long =
      corpus.count { case (id, _) => tfs(id).contains(term) }.toLong
    def idfMicro(term: String): Long =
      math.round(math.log((n - df(term) + 0.5) / (df(term) + 0.5) + 1.0) * 1e6)
    queries.flatMap { case (qid, qtext) =>
      val terms = qtext.split(" ", -1).filter(_.nonEmpty).distinct
      val scores = corpus.flatMap { case (id, _) =>
        if (!terms.exists(t => tfs(id).contains(t))) None
        else Some(id -> terms.map { t =>
          val f = tfs(id).getOrElse(t, 0L)
          if (f == 0L) 0L
          else math.round(idfMicro(t).toDouble * (f * (k1 + 1.0)) /
            (f + k1 * ((1.0 - b) + b * (dls(id) / avgdl))))
        }.sum)
      }
      scores.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((id, s), i) => (qid, id, i + 1, s) }
    }
  }

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick quick fox",
    3L -> "lazy dog sleeps all day long in the sun",
    4L -> "brown bread and brown butter",
    5L -> "a fox and a dog met a fox",
    6L -> "completely unrelated text about spark plans")

  private def corpusDf = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
  }

  behavior of "bm25TopK"

  it should "match a direct-formula replay, ranks and ties included" in {
    val queries = Seq(10L -> "quick fox", 11L -> "lazy dog", 12L -> "brown")
    val got = Retrieval.bm25TopK(corpusDf, "doc_id", "text", queries, k = 3)
      .orderBy("q_id", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSeq
    got shouldBe bruteBm25(corpus, queries, k = 3)
  }

  it should "retrieve a document first for its own snippet" in {
    val got = Retrieval.bm25TopK(corpusDf, "doc_id", "text",
      Seq(20L -> "lazy dog sleeps all day"), k = 1).collect()
    got should have size 1
    got.head.getLong(1) shouldBe 3L
  }

  it should "ignore query-side term repetition and empty tokens" in {
    val a = Retrieval.bm25TopK(corpusDf, "doc_id", "text",
      Seq(30L -> "fox fox  fox"), k = 6).collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSeq
    val bq = Retrieval.bm25TopK(corpusDf, "doc_id", "text",
      Seq(30L -> "fox"), k = 6).collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSeq
    a shouldBe bq
  }

  it should "return no rows for queries matching nothing" in {
    Retrieval.bm25TopK(corpusDf, "doc_id", "text",
      Seq(40L -> "zzzzz qqqqq"), k = 3).count() shouldBe 0L
  }

  it should "reject empty inputs" in {
    an[IllegalArgumentException] should be thrownBy
      Retrieval.bm25TopK(corpusDf, "doc_id", "text", Seq.empty, k = 3)
    an[IllegalArgumentException] should be thrownBy
      Retrieval.bm25TopK(corpusDf, "doc_id", "text", Seq(1L -> "  "), k = 3)
    an[IllegalArgumentException] should be thrownBy
      Retrieval.bm25TopK(corpusDf, "doc_id", "text", Seq(1L -> "x"), k = 0)
  }

  it should "broadcast the small sides and never shuffle-join the corpus" in {
    val plan = Retrieval.bm25TopK(corpusDf, "doc_id", "text",
      Seq(50L -> "fox"), k = 2).queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    (plan should not).include("CartesianProduct")
    (plan should not).include("SortMergeJoin")
  }

  it should "tokenize and explode the corpus exactly once (df reuses the " +
    "tf exchange)" in {
    // The document-frequency branch is a re-aggregation OF the tf table,
    // so its subtree contains the tf exchange verbatim and ReuseExchange
    // must materialize the heavy scan+explode once: exactly ONE
    // GenerateExec in the whole physical plan (broadcast subtrees
    // included), with the second consumer reading a ReusedExchange.
    val p = Retrieval.bm25TopK(corpusDf, "doc_id", "text",
      Seq(50L -> "fox dog"), k = 2).queryExecution.executedPlan
    // corpus token explodes only — the bounded top-k finisher's
    // posexplode over |q|·k hit arrays is not a corpus scan
    val generates = p.collectWithSubqueries {
      case g: org.apache.spark.sql.execution.GenerateExec
        if g.generator.toString.contains("split") => g
    }
    withClue(p.toString) { generates should have size 1 }
    p.collectWithSubqueries {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
    } should not be empty
  }

  behavior of "hybridTopK"

  it should "rerank the BM25 shortlist by cosine and keep lex_rank" in {
    import spark.implicits._
    // embeddings chosen so cosine order INVERTS the lexical order for
    // query 50 ("fox"): doc 2/5 lead lexically, doc 1 leads by vector
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.6f, 0.8f)), (3L, Seq(0.0f, 1.0f)),
      (4L, Seq(0.8f, 0.6f)), (5L, Seq(0.2f, 0.98f)), (6L, Seq(0.5f, 0.5f)),
      (50L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val queries = Seq(50L -> "fox")
    val lex = Retrieval.bm25TopK(corpusDf, "doc_id", "text", queries, k = 10)
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    lex.keySet shouldBe Set(1L, 2L, 5L) // docs containing "fox"
    val got = Retrieval.hybridTopK(corpusDf, emb, "doc_id", "text",
        "vec_id", "embedding", queries, kLex = 10, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getInt(3))).toList
    // cosine vs (1,0): doc1 = 1.0, doc2 = 0.6, doc5 = 0.2
    got shouldBe List((1L, lex(1L), 1), (2L, lex(2L), 2), (5L, lex(5L), 3))
  }

  it should "stream the embedding table through a broadcast join" in {
    import spark.implicits._
    val emb = (1L to 6L).map(i => (i, Seq(i.toFloat, 1.0f))) :+
      (50L, Seq(1.0f, 1.0f))
    val plan = Retrieval.hybridTopK(corpusDf, emb.toDF("vec_id", "embedding"),
      "doc_id", "text", "vec_id", "embedding", Seq(50L -> "fox"),
      kLex = 5, k = 2).queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    (plan should not).include("CartesianProduct")
  }

  it should "hold the broadcast fast path whenever |queries|*kLex is " +
    "under the dim-free ceiling (scale-independent decision)" in {
    // The r14 100x probe saw hybrid_topk's exponent drift 0.15 -> 0.31;
    // this pins the adjudication: with |queries|*kLex*(8192*8+64) under
    // maxBroadcastBytes the rerank join is ALWAYS broadcast — the guard
    // never consults corpus size, so the fallback cannot be the drift.
    // The growth is the BM25 shortlist stage's contract-linear corpus
    // scan (same alpha class as bm25_topk itself).
    import spark.implicits._
    val emb = (1L to 6L).map(i => (i, Seq(i.toFloat, 1.0f))) :+
      (50L, Seq(1.0f, 1.0f))
    val p = Retrieval.hybridTopK(corpusDf, emb.toDF("vec_id", "embedding"),
      "doc_id", "text", "vec_id", "embedding", Seq(50L -> "fox"),
      kLex = 5, k = 2).queryExecution.executedPlan
    // registry-row shape: 1 query x kLex 5 -> far under any ceiling
    val smjs = p.collectWithSubqueries {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    withClue(p.toString) { smjs shouldBe empty }
  }

  it should "produce identical results on the non-broadcast fallback " +
    "path" in {
    import spark.implicits._
    val emb = ((1L to 6L).map(i => (i, Seq(i.toFloat, 1.0f))) :+
      (50L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    def run(maxBytes: Long) =
      Retrieval.hybridTopK(corpusDf, emb, "doc_id", "text", "vec_id",
          "embedding", Seq(50L -> "fox"), kLex = 5, k = 3,
          maxBroadcastBytes = maxBytes)
        .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    run(256L << 20) shouldBe run(1L) // forced fallback = same rows
  }

  it should "exclude zero-norm embeddings (NaN cosine) from the rerank" in {
    import spark.implicits._
    // doc 2 has a zero vector: cosine vs any query is 0/0 = NaN. The
    // contract EXCLUDES it (both engines), so it must not outrank real
    // candidates — and must not appear at all.
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 0.0f)), (5L, Seq(0.2f, 0.98f)),
      (50L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Retrieval.hybridTopK(corpusDf, emb, "doc_id", "text",
        "vec_id", "embedding", Seq(50L -> "fox"), kLex = 10, k = 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(3))).toList
    got shouldBe List((1L, 1), (5L, 2))
  }

  it should "degrade to an empty result (not throw) on an empty embedding " +
    "table, probe path included" in {
    import spark.implicits._
    val emb = spark.emptyDataset[(Long, Seq[Float])]
      .toDF("vec_id", "embedding")
    // tiny budget forces underAnyDim = false, so the max-width probe runs
    // against the EMPTY table (a first-row head() would throw here)
    Retrieval.hybridTopK(corpusDf, emb, "doc_id", "text",
      "vec_id", "embedding", Seq(50L -> "fox"), kLex = 5, k = 2,
      maxBroadcastBytes = 1024L).count() shouldBe 0L
  }

  it should "probe the WIDEST vector, not the first row, when sizing the " +
    "broadcast" in {
    import spark.implicits._
    // first row is a degenerate 1-dim vector; the widest is 4096-dim. A
    // budget that fits the shortlist only at the first row's width must
    // NOT broadcast: with max-probing, 60 queries x kLex 100 x 4096d x 8B
    // ≈ 197 MB > 64 MB budget -> no broadcast hint on the rerank join.
    val wide = Seq.fill(4096)(1.0f)
    val emb = ((1L to 6L).map(i => (i, Seq(i.toFloat))) ++
      (100L until 160L).map(i => (i, wide))).toDF("vec_id", "embedding")
    val queries = (100L until 160L).map(i => i -> "fox dog").toSeq
    // disable planner auto-broadcast so the only possible broadcast on
    // the rerank join is OUR hint — at real scale the emb side's stats
    // keep the planner honest; at test scale 66 rows would auto-broadcast
    // and mask a wrong hint decision
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = Retrieval.hybridTopK(corpusDf, emb, "doc_id", "text",
        "vec_id", "embedding", queries, kLex = 100, k = 3,
        maxBroadcastBytes = 64L << 20)
      // correctness either way; the guard property is NO driver-side
      // broadcast of the vector-bearing candidate set — with a first-row
      // probe (dim 1) the hint WOULD fire and plan a BroadcastHashJoin
      // on __dv; max-probing sees 4096-d and falls back to sort-merge.
      p.collect()
      val planStr = p.queryExecution.executedPlan.toString
      (planStr should not).include("CartesianProduct")
      planStr should include("SortMergeJoin")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  it should "fall back to a shuffle join past the broadcast budget and " +
    "stay correct at 1e3 queries x 1e2 kLex" in {
    import spark.implicits._
    // The contract ceiling the guard exists for: 1000 queries x kLex=100.
    // With a tiny budget the projected shortlist size trips the guard, so
    // stage 2 must plan WITHOUT the broadcast hint (no multi-GB driver
    // collect at real scale) and return the identical rows.
    val emb = ((1L to 6L).map(i => (i, Seq(i.toFloat, 1.0f))) ++
      (1000L until 2000L).map(i => (i, Seq(1.0f, i.toFloat / 2000f))))
      .toDF("vec_id", "embedding")
    val queries = (1000L until 2000L).map(i =>
      i -> (if (i % 2 == 0) "fox dog" else "quick brown")).toSeq
    val guarded = Retrieval.hybridTopK(corpusDf, emb, "doc_id", "text",
      "vec_id", "embedding", queries, kLex = 100, k = 3,
      maxBroadcastBytes = 1024L)
    val gPlan = guarded.queryExecution.executedPlan.toString
    (gPlan should not).include("CartesianProduct")
    val gRows = guarded.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toList
    gRows should not be empty
    val hinted = Retrieval.hybridTopK(corpusDf, emb, "doc_id", "text",
        "vec_id", "embedding", queries, kLex = 100, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toList
    gRows shouldBe hinted
  }
}
