package graft.llm

import scala.reflect.ClassTag
import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types._

/** One ranked neighbor: (id, score). Field names become the output struct
  * field names, so downstream `.select("hit.n_id", "hit.cosine")` works. */
final case class TopHit[T](n_id: T, cosine: Double)

/** Aggregator OUT wrapper (a Product, so `Encoders.product` applies; the
  * hits land in column `top.hits` as `array<struct<n_id, cosine>>`). */
final case class TopHits[T](hits: Seq[TopHit[T]])

/** Bounded aggregation buffer: parallel arrays of capacity k holding the
  * current best `size` entries, ordered best-first (score DESC, id ASC).
  * The arrays are mutated in place between serializations — only the
  * ≤ k-entry state ever crosses a shuffle boundary. */
final case class TopKBuf[T](size: Int, ids: Array[T], scores: Array[Double])

/**
 * Bounded top-k-by-score aggregation — the scale-safe finisher for every
 * similarity search operator. A `row_number() OVER (PARTITION BY q_id
 * ORDER BY score DESC)` finisher shuffles EVERY scored candidate and sorts
 * each query's full candidate list in one task (for brute-force search the
 * candidate list is the whole corpus — one task sorting ~10¹¹ rows per
 * query at 100 TB). This aggregator instead keeps a size-k ordered buffer
 * per group on the map side (Spark plans `udaf` Aggregators as
 * ObjectHashAggregate with partial merge), so shuffle volume drops from
 * |candidates| rows to k × partitions × |queries| and no single task ever
 * holds more than k entries per query.
 *
 * Ordering matches the window it replaced exactly for non-NaN scores:
 * score DESC, id ASC on ties — a total order (ids are unique), so results
 * are bit-identical to the `row_number` form. Rows with a null id or null
 * score are skipped. NaN scores ARE ranked — strictly below every real
 * score (including -Infinity), NaN-vs-NaN ties broken by id ASC — so the
 * order stays total and the result is partition-invariant even when a
 * zero-norm corpus vector yields a NaN cosine. This is the one deliberate
 * deviation from a sorting window, which would rank NaN FIRST (Spark and
 * DuckDB both treat NaN as the largest double); a NaN cosine means a
 * zero-norm vector, i.e. a caller contract violation, so "worst match"
 * is the useful ranking for it.
 */
object TopKAgg {

  /** Unsigned UTF-8 byte order for String ids — the order a Spark
    * UTF8String sort or a DuckDB VARCHAR window compares by. Scala's
    * default `Ordering[String]` is UTF-16 code-unit order, which
    * diverges for ties between ids containing supplementary code points
    * (surrogates at 0xD800..0xDFFF) and chars in U+E000..U+FFFF; byte
    * comparison keeps the bit-identical-to-row_number contract there
    * too. Only tie-breaks pay the encode (equal scores). */
  private[llm] val Utf8ByteOrdering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int =
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** A two-argument udaf `(id, score) -> struct(hits: array<struct<n_id,
    * cosine>>)` keeping the k best (score DESC, id ASC) entries.
    * Dispatches on the id column's type (integral or string). */
  def topKUdaf(k: Int, idType: DataType): UserDefinedFunction = idType match {
    case LongType    => make[Long](k, idType)
    case IntegerType => make[Int](k, idType)
    case ShortType   => make[Short](k, idType)
    case ByteType    => make[Byte](k, idType)
    case DoubleType  => make[Double](k, idType)
    case FloatType   => make[Float](k, idType)
    case StringType  => make[String](k, idType)(Utf8ByteOrdering,
      implicitly[ClassTag[String]], implicitly[TypeTag[String]])
    case other => throw new IllegalArgumentException(
      s"top-k id column must be an integral, floating or string type; " +
        s"got $other — cast the id column (e.g. decimal/binary ids to " +
        "string) before searching")
  }

  private def make[T: Ordering: ClassTag: TypeTag](
      k: Int, idType: DataType): UserDefinedFunction =
    udaf(new TopKAgg[T](k), Encoders.row(StructType(Seq(
      StructField("n_id", idType), StructField("cosine", DoubleType)))))
}

/** One collected seed row: (id, vector). */
final case class SeedHit(id: Long, vec: Seq[Float])

/** Aggregator OUT wrapper for [[SeedsAgg]]. */
final case class SeedHits(hits: Seq[SeedHit])

/** Bounded buffer of the `cap` smallest-id rows, ascending. */
final case class SeedBuf(size: Int, ids: Array[Long], vecs: Array[Array[Float]])

/**
 * Bounded smallest-id row collection — the seed-gathering half of the
 * "count + seed vectors in ONE corpus scan" pattern used by the √N-cell
 * recipes (IVF cells, flat-IVF dedup cells): stacked beside `count(*)` in
 * a single `agg(...)`, it returns the `cap` smallest-id (id, vector)
 * pairs while the same pass counts the corpus, replacing the separate
 * count job + filtered seed-collect job (two full scans) with one. Same
 * bounded map-side-combinable shape as [[TopKAgg]]: no partial buffer
 * ever exceeds `cap` entries.
 */
object SeedsAgg {
  def seedsUdaf(cap: Int): UserDefinedFunction =
    udaf(new SeedsAgg(cap), Encoders.row(StructType(Seq(
      StructField("id", LongType),
      StructField("vec", ArrayType(FloatType))))))
}

private[llm] class SeedsAgg(cap: Int)
    extends Aggregator[Row, SeedBuf, SeedHits] {
  require(cap >= 1, "cap must be >= 1")

  def zero: SeedBuf = SeedBuf(0, new Array[Long](cap), new Array[Array[Float]](cap))

  private def insert(b: SeedBuf, id: Long, vec: Array[Float]): SeedBuf = {
    if (b.size == cap && id >= b.ids(cap - 1)) b
    else {
      var i = math.min(b.size, cap - 1)
      while (i > 0 && id < b.ids(i - 1)) {
        b.ids(i) = b.ids(i - 1); b.vecs(i) = b.vecs(i - 1); i -= 1
      }
      b.ids(i) = id; b.vecs(i) = vec
      if (b.size == cap) b else b.copy(size = b.size + 1)
    }
  }

  def reduce(b: SeedBuf, r: Row): SeedBuf =
    if (r == null || r.isNullAt(0) || r.isNullAt(1)) b
    else insert(b, r.getLong(0), r.getSeq[Float](1).toArray)

  def merge(a: SeedBuf, b: SeedBuf): SeedBuf = {
    var out = a
    var i = 0
    while (i < b.size) { out = insert(out, b.ids(i), b.vecs(i)); i += 1 }
    out
  }

  def finish(b: SeedBuf): SeedHits =
    SeedHits((0 until b.size).map(i => SeedHit(b.ids(i), b.vecs(i).toSeq)))

  def bufferEncoder: Encoder[SeedBuf] = Encoders.product[SeedBuf]
  def outputEncoder: Encoder[SeedHits] = Encoders.product[SeedHits]
}

private[llm] class TopKAgg[T](k: Int)(
    implicit ord: Ordering[T], ct: ClassTag[T], tt: TypeTag[T])
    extends Aggregator[Row, TopKBuf[T], TopHits[T]] {
  require(k >= 1, "k must be >= 1")

  /** Strict total order: does (s1, i1) outrank (s2, i2)? Primitive `>`/
    * `==` for the non-NaN fast path (bit-identical to the row_number
    * window this replaced), with NaN pinned below every real score —
    * NaN-vs-NaN falls through to the id tiebreak — so the order stays
    * total and merge results cannot depend on partial-buffer arrival
    * order. */
  private def better(s1: Double, i1: T, s2: Double, i2: T): Boolean =
    if (s1.isNaN || s2.isNaN) {
      if (s1.isNaN && s2.isNaN) ord.lt(i1, i2) else s2.isNaN
    } else s1 > s2 || (s1 == s2 && ord.lt(i1, i2))

  def zero: TopKBuf[T] = TopKBuf(0, new Array[T](k), new Array[Double](k))

  /** In-place insertion into the ordered buffer; O(1) reject once the
    * buffer is full and the candidate is below the current floor — the
    * common case on a big scan. */
  private def insert(b: TopKBuf[T], id: T, s: Double): TopKBuf[T] = {
    if (b.size == k && !better(s, id, b.scores(k - 1), b.ids(k - 1))) b
    else {
      var i = math.min(b.size, k - 1)
      while (i > 0 && better(s, id, b.scores(i - 1), b.ids(i - 1))) {
        b.scores(i) = b.scores(i - 1); b.ids(i) = b.ids(i - 1); i -= 1
      }
      b.scores(i) = s; b.ids(i) = id
      if (b.size == k) b else b.copy(size = b.size + 1)
    }
  }

  def reduce(b: TopKBuf[T], r: Row): TopKBuf[T] =
    if (r == null || r.isNullAt(0) || r.isNullAt(1)) b
    else insert(b, r.getAs[T](0), r.getDouble(1))

  def merge(a: TopKBuf[T], b: TopKBuf[T]): TopKBuf[T] = {
    var out = a
    var i = 0
    while (i < b.size) { out = insert(out, b.ids(i), b.scores(i)); i += 1 }
    out
  }

  def finish(b: TopKBuf[T]): TopHits[T] =
    TopHits((0 until b.size).map(i => TopHit(b.ids(i), b.scores(i))))

  def bufferEncoder: Encoder[TopKBuf[T]] = Encoders.product[TopKBuf[T]]
  def outputEncoder: Encoder[TopHits[T]] = Encoders.product[TopHits[T]]
}
