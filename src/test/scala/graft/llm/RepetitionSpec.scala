package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/**
 * The round-12 Gopher repetition additions: line/paragraph duplicate
 * fractions (TextStats.repetitionSignals, one kernel scan per row) and
 * char-weighted n-gram repetition (TextStats.ngramCharRepetition).
 * Fixtures are hand-computed; the fuzz rows pin both operators against an
 * independent collections-based reference (regex split + groupBy) over
 * seeded random corpora with multi-byte and supplementary code points, so
 * "matches the oracle on fixtures" extends to "matches on arbitrary
 * input" (the KernelLaws convention).
 */
class RepetitionSpec extends SparkTestBase {
  import spark.implicits._

  // ---- independent reference implementations -------------------------

  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong

  /** (n, dupFrac, dupCharFrac) over non-empty literal-delimiter splits. */
  private def refUnits(text: String, delim: String): (Long, Double, Double) = {
    val units = text.split(java.util.regex.Pattern.quote(delim), -1)
      .toSeq.filter(_.nonEmpty)
    val n = units.size.toLong
    if (n == 0L) return (0L, 0.0, 0.0)
    val groups = units.groupBy(identity).values.toSeq
    val dup = groups.map(g => (g.size - 1).toLong).sum
    val chars = units.map(cp).sum
    val dupChars = groups.map(g => (g.size - 1).toLong * cp(g.head)).sum
    (n, dup.toDouble / n, dupChars.toDouble / chars)
  }

  /** Option((topCharFrac, dupCharFrac)) — None when fewer than n tokens. */
  private def refNgram(text: String, n: Int): Option[(Double, Double)] = {
    val toks = text.split(" ", -1).toSeq
    if (toks.size < n) return None
    val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
    // .toSeq BEFORE .map: mapping the Map to (count, chars) pairs would
    // collapse distinct grams sharing a count
    val counts = grams.groupBy(identity).toSeq.map { case (_, o) =>
      (o.size.toLong, cp(o.head)) }
    val dl = cp(text)
    if (dl == 0L) return Some((0.0, 0.0))
    val (tc, tch) = counts.maxBy { case (c, ch) => (c, ch) }
    val dup = counts.collect { case (c, ch) if c >= 2 => c * ch }.sum
    Some(((tc * tch).toDouble / dl, dup.toDouble / dl))
  }

  private def signalsOf(text: String): (Long, Double, Double, Long, Double, Double) = {
    val r = TextStats.repetitionSignals(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").head()
    (r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getLong(4), r.getDouble(5), r.getDouble(6))
  }

  behavior of "repetitionSignals"

  it should "count duplicate lines and paragraphs with char weights" in {
    // lines: a(1), b(2 -> 1 dup), a... wait, spell it out:
    //   "aa\nbb\naa\n\ncc" lines = [aa, bb, aa, cc] (the \n\n yields one
    //   empty unit, excluded) -> 4 lines, 1 dup (second aa), chars 8,
    //   dup chars 2; paras = [aa\nbb\naa, cc] -> 2, 0 dups
    val (nl, dlf, dlcf, np, dpf, dpcf) = signalsOf("aa\nbb\naa\n\ncc")
    nl shouldBe 4L
    approx(dlf, 0.25)
    approx(dlcf, 2.0 / 8.0)
    np shouldBe 2L
    approx(dpf, 0.0)
    approx(dpcf, 0.0)
  }

  it should "count duplicate paragraphs" in {
    val text = "p one\n\np two\n\np one"
    val (_, _, _, np, dpf, dpcf) = signalsOf(text)
    np shouldBe 3L
    approx(dpf, 1.0 / 3.0)
    approx(dpcf, 5.0 / 15.0)
  }

  it should "return zeros for empty documents" in {
    signalsOf("") shouldBe ((0L, 0.0, 0.0, 0L, 0.0, 0.0))
  }

  it should "exclude empty units but keep whitespace ones (exact split contract)" in {
    // "\n\n\n" has no non-empty LINES; its paragraph scan consumes the
    // first \n\n and leaves "\n" - a non-empty (whitespace) unit, exactly
    // what string_split semantics + the len>0 rule give in both engines
    signalsOf("\n\n\n") shouldBe ((0L, 0.0, 0.0, 1L, 0.0, 0.0))
  }

  it should "count chars as code points (multi-byte + supplementary)" in {
    // "😀😀" is 2 code points / 4 UTF-16 units; a naive .length count
    // would double it
    val (nl, dlf, dlcf, _, _, _) = signalsOf("😀😀\nxé\n😀😀")
    nl shouldBe 3L
    approx(dlf, 1.0 / 3.0)
    approx(dlcf, 2.0 / 6.0)
  }

  it should "use sequential non-overlapping paragraph splits (string_split semantics)" in {
    // "a\n\n\nb": the scan consumes the first \n\n, leaving "\nb" as one
    // paragraph - NOT two paragraphs "a","b"
    val (_, _, _, np, _, _) = signalsOf("a\n\n\nb")
    np shouldBe 2L
  }

  it should "add no shuffle (one kernel scan per row)" in {
    val df = TextStats.repetitionSignals(
      Seq((1L, "x\ny")).toDF("doc_id", "text"), "doc_id", "text")
    df.queryExecution.executedPlan.toString should not include "Exchange"
  }

  it should "match the independent reference on seeded random corpora" in {
    val rnd = new scala.util.Random(1207L)
    val lexemes = Seq("aa", "bb", "ccc", "é", "日本", "😀x", "tok")
    def randLine() = (0 until (1 + rnd.nextInt(4)))
      .map(_ => lexemes(rnd.nextInt(lexemes.size))).mkString(" ")
    val docs = (1L to 60L).map { id =>
      val nLines = rnd.nextInt(8)
      val sep = () => if (rnd.nextInt(3) == 0) "\n\n" else "\n"
      val text = (0 until nLines).map(_ =>
        if (rnd.nextInt(6) == 0) "" else randLine())
        .mkString("", "\n", "") match {
        case s if rnd.nextInt(4) == 0 => s + sep()
        case s => s
      }
      (id, text)
    }
    val out = TextStats.repetitionSignals(
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
    out.length shouldBe docs.length
    out.zip(docs).foreach { case (r, (_, text)) =>
      val (ln, lf, lcf) = refUnits(text, "\n")
      val (pn, pf, pcf) = refUnits(text, "\n\n")
      withClue(s"text=${text.replace("\n", "\\n")}: ") {
        r.getLong(1) shouldBe ln
        approx(r.getDouble(2), lf)
        approx(r.getDouble(3), lcf)
        r.getLong(4) shouldBe pn
        approx(r.getDouble(5), pf)
        approx(r.getDouble(6), pcf)
      }
    }
  }

  behavior of "ngramCharRepetition"

  it should "weight the top gram and duplicate grams by chars over doc chars" in {
    // tokens: "ab ab ab cd" -> bigrams "ab ab"(x2, len 5), "ab cd"(x1, len 5)
    // doc chars = 11; top = 2*5/11; dup = 2*5/11
    val out = TextStats.ngramCharRepetition(
      Seq((1L, "ab ab ab cd")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .head()
    out.getLong(1) shouldBe 3L // n_grams
    approx(out.getDouble(2), 10.0 / 11.0)
    approx(out.getDouble(3), 10.0 / 11.0)
  }

  it should "break count ties toward the longer gram" in {
    // "aa bb c aa bb c" bigrams: "aa bb"x2 (len 5), "bb c"x2 (len 4),
    // "c aa"x1 -> top must be (2, 5), numerator 10, doc chars 15
    val out = TextStats.ngramCharRepetition(
      Seq((1L, "aa bb c aa bb c")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .head()
    approx(out.getDouble(2), 10.0 / 15.0)
  }

  it should "produce no row for documents shorter than n tokens" in {
    TextStats.ngramCharRepetition(
      Seq((1L, "only four tokens here"), (2L, "tiny"))
        .toDF("doc_id", "text"), "doc_id", "text", 5)
      .count() shouldBe 0L
  }

  it should "match the independent reference on seeded random corpora" in {
    val rnd = new scala.util.Random(4242L)
    val vocab = Seq("a", "bb", "ccc", "é日", "😀", "zz")
    val docs = (1L to 50L).map { id =>
      val text = (0 until rnd.nextInt(30))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (id, text)
    }
    for (n <- Seq(2, 5)) {
      val out = TextStats.ngramCharRepetition(
          docs.toDF("doc_id", "text"), "doc_id", "text", n)
        .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3)))
        .toMap
      docs.foreach { case (id, text) =>
        refNgram(text, n) match {
          case None => out.contains(id) shouldBe false
          case Some((topF, dupF)) =>
            withClue(s"n=$n id=$id text='$text': ") {
              approx(out(id)._1, topF)
              approx(out(id)._2, dupF)
            }
        }
      }
    }
  }
}
