package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.{Column, functions => F}

/** Markup stripping, encoding-quality counters, and the Gopher quality
  * rule bundle: pinned edge cases plus parity of each one-pass kernel
  * against the declarative Column/regex form whose semantics it pins. */
class MarkupQualitySpec extends SparkTestBase {
  import spark.implicits._

  behavior of "stripMarkup"

  /** The regexp/replace chain the kernel doc (and the DuckDB oracle)
    * pins — java.util.regex here, RE2 in the oracle; the pattern set is
    * kept to the common subset both interpret identically. */
  private def regexChain(c: Column): Column = {
    // ONE leftmost-first alternation pass over both block tags — per-tag
    // sequential passes would diverge from the scanner on interleaved
    // script/style input (pinned below)
    val noBlocks = F.regexp_replace(c,
      "(?is)<script\\b[^>]*>.*?</script[ \\t\\n\\r\\f]*>" +
        "|<style\\b[^>]*>.*?</style[ \\t\\n\\r\\f]*>", " ")
    val noTags = F.regexp_replace(noBlocks, "<[^>]*>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (col, (e, r)) => F.replace(col, F.lit(e), F.lit(r)) }
    F.trim(F.regexp_replace(ent, "[ \\t\\n\\r\\f]+", " "))
  }

  private def strip(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextStats.stripMarkup(F.col("t"))).head().getString(0)

  it should "match the pinned regexp/replace chain on varied markup" in {
    // entity choices here avoid chains where scan-order and sequential
    // replace() passes disagree (&amp; decoding last in the chain);
    // scan-order behavior on those is pinned separately below.
    val cases = Seq(
      "<html><body><p>plain text</p></body></html>",
      "<style>p { x: 1; }</style>before<script>if (a < b) { f(); }</script>after",
      "<SCRIPT a=\"1\">alert('x')</SCRIPT >mixed<STYLE\n>s</style\t>case",
      "unterminated <script src=\"x\"> body survives as text",
      "unterminated <style attr> style body too",
      "bare < stays literal and <this is a tag> goes",
      "a <b>bold</b>\tand\n\nspaced   text",
      "ents: &lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;&amp; done",
      "<scripting>not a script block</scripting> kept",
      "< > <123> <a <b> nested-angle tag",
      "", "   ", "<p></p>", "&", "&amp", "&unknown; x",
      "tag at end <br", "<script>never closed",
      // interleaved blocks: leftmost match wins, so the style block eats
      // the script open and the orphan </script> strips as a plain tag
      "<style>A<script>B</style>C</script>D",
      "<script>A<style>B</script>C</style>D",
      "x<script>no close<style>s</style>y", // style inside dead script body
      "<script>a</script><style>b</style><script>c</script>tail")
    val df = cases.toDF("t")
    val r = df.select(
      TextStats.stripMarkup(F.col("t")).as("k"),
      regexChain(F.col("t")).as("r")).collect()
    r.zip(cases).foreach { case (row, in) =>
      assert(row.getString(0) == row.getString(1),
        s"kernel '${row.getString(0)}' != chain '${row.getString(1)}' for input '$in'")
    }
  }

  it should "pin scan-order entity decoding (first match wins)" in {
    strip("&amp;lt;") shouldBe "&lt;" // &amp; decodes first, result is literal
    strip("&amp;amp;") shouldBe "&amp;"
    strip("&lt;b&gt;x&lt;/b&gt;") shouldBe "<b>x</b>" // decoded, never re-parsed
  }

  it should "pin leftmost-first semantics on interleaved blocks" in {
    // the case the single-alternation contract exists for: a per-tag
    // strip-all-script-then-all-style chain would yield "A D" here
    strip("<style>A<script>B</style>C</script>D") shouldBe "C D"
    strip("<script>A<style>B</script>C</style>D") shouldBe "C D"
  }

  it should "stay linear on adversarial input (failed-search memo)" in {
    // each pathological row repeats a pattern whose forward search fails:
    // without the memo every occurrence rescans to end-of-string (O(n^2),
    // ~minutes at 1 MB); with it the whole row is one scan (~ms). The
    // bound is generous (10 s) to stay CI-noise-proof while still failing
    // decisively on quadratic behavior.
    val mb = 1 << 20
    val cases = Seq(
      "<" * mb,                          // bare '<' run, no '>' anywhere
      "<script>x " * (mb / 10),          // unterminated script opens
      "<style a> " * (mb / 10),          // unterminated style opens
      ("<p>" * (mb / 3)) + "<script>" + ("y<style>z " * (mb / 10)))
    val t0 = System.nanoTime()
    val out = cases.toDF("t")
      .select(F.length(TextStats.stripMarkup(F.col("t")))).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 10.0, f"adversarial stripMarkup took $secs%.1f s")
    out(0).getInt(0) shouldBe mb // all-literal '<' run survives unchanged
  }

  it should "drop script/style blocks and collapse whitespace" in {
    strip("<style>a{b}</style>x <script >var i;</script> y") shouldBe "x y"
    strip("  lead <p>mid</p> trail  ") shouldBe "lead mid trail"
    strip("<html>") shouldBe ""
  }

  it should "be null-safe" in {
    val r = Seq((1L, null: String), (2L, "<b>x</b>")).toDF("id", "t")
      .select(TextStats.stripMarkup(F.col("t"))).collect()
    r(0).isNullAt(0) shouldBe true
    r(1).getString(0) shouldBe "x"
  }

  behavior of "encodingStats"

  it should "count code points, replacement chars, and controls" in {
    val r = Seq(Tuple1("abc\uFFFD\u0001\u007F\tz"))
      .toDF("t").select(TextStats.encodingStats(F.col("t")).as("s"))
      .select("s.n_chars", "s.n_replacement", "s.n_control").head()
    r.getInt(0) shouldBe 8
    r.getInt(1) shouldBe 1
    r.getInt(2) shouldBe 2 // U+0001 and DEL; tab is allowed
  }

  it should "count astral code points once and allow tab/newline/CR" in {
    val r = Seq(Tuple1("a😀b\t\n\r"))
      .toDF("t").select(TextStats.encodingStats(F.col("t")).as("s"))
      .select("s.n_chars", "s.n_replacement", "s.n_control").head()
    r.getInt(0) shouldBe 6 // emoji is ONE code point
    r.getInt(1) shouldBe 0
    r.getInt(2) shouldBe 0
  }

  it should "gate encodingKeep on the per-mille budget" in {
    val d = Seq(
      (1L, "x" * 1000 + "�"), // 1 bad / 1001 chars -> keep at 1‰
      (2L, "x" * 500 + "�"), // 1 bad / 501 -> 1000 > 501: drop
      (3L, ""), // empty keeps (0 <= 0)
      (4L, "clean text")).toDF("id", "t")
    val r = d.select(F.col("id"), TextStats.encodingKeep(F.col("t")).as("k"))
      .orderBy("id").as[(Long, Boolean)].collect().toSeq
    r shouldBe Seq((1L, true), (2L, false), (3L, true), (4L, true))
  }

  behavior of "gopherStats"

  /** Declarative reference for the counter kernel. */
  private def colRef(c: Column): Column = {
    val toks = F.split(c, " ", -1)
    val lines = F.split(c, "\n", -1)
    F.struct(
      F.size(toks).as("n_words"),
      F.size(F.filter(toks, t => t.rlike("[A-Za-z]"))).as("n_alpha_words"),
      (F.regexp_count(c, F.lit("#")) + F.regexp_count(c, F.lit("\\.\\.\\.")))
        .as("n_symbols"),
      F.size(lines).as("n_lines"),
      F.size(F.filter(lines, l =>
        l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•")))
        .as("n_bullet_lines"),
      F.size(F.filter(lines, l => l.endsWith("..."))).as("n_ellipsis_lines"))
  }

  it should "match the declarative Column form on varied text" in {
    val cases = Seq(
      "plain words with the and of tokens",
      "- bullet one\n* bullet two\n•tight bullet\nnormal line",
      "trailing ellipsis...\nmid... not at end\nshort\n",
      "#tags # and ## plus .... and ...... runs",
      "", "x", " ", "\n", "a\n", "...", "..", "- ", "-x", "* y z",
      "num3ric w0rds 123 456 mixed",
      "dots.across\nlines...")
    val df = cases.toDF("t")
    val r = df.select(
      TextStats.gopherStats(F.col("t")).as("k"), colRef(F.col("t")).as("r"))
      .collect()
    r.zip(cases).foreach { case (row, in) =>
      assert(row.getStruct(0) == row.getStruct(1),
        s"kernel ${row.getStruct(0)} != ref ${row.getStruct(1)} for '$in'")
    }
  }

  it should "flag the published rule bundle with integer thresholds" in {
    val longGood = (Seq.fill(20)("the quick brown fox jumps") :+ "with that end")
      .mkString(" ") // 103 words, all alpha, stopwords present
    val d = Seq(
      (1L, longGood),
      (2L, "too short to pass the word rule"),
      (3L, ("#" * 30).split("").mkString(" ") + " " + longGood)) // symbols
      .toDF("id", "text")
    val r = TextStats.gopherFilter(d, "text")
      .select("id", "words_ok", "symbol_ok", "alpha_ok", "stop_ok", "keep")
      .orderBy("id").collect()
    r(0).getBoolean(1) shouldBe true
    r(0).getBoolean(4) shouldBe true
    r(0).getBoolean(5) shouldBe true // keeps
    r(1).getBoolean(1) shouldBe false // < 50 words
    r(1).getBoolean(5) shouldBe false
    r(2).getBoolean(2) shouldBe false // symbol ratio over 10%
    r(2).getBoolean(5) shouldBe false
  }

  it should "require two DISTINCT stopwords for stop_ok" in {
    // the published Gopher rule counts distinct list hits, not
    // occurrences: all-"the" text fails, "the ... and" passes
    val d = Seq(
      (1L, Seq.fill(60)("the").mkString(" ")), // 60 hits, 1 distinct
      (2L, (Seq.fill(59)("the") :+ "and").mkString(" ")), // 2 distinct
      (3L, Seq.fill(60)("zebra").mkString(" "))) // 0 hits
      .toDF("id", "text")
    val r = TextStats.gopherFilter(d, "text")
      .select("id", "stop_ok").orderBy("id")
      .as[(Long, Boolean)].collect().toSeq
    r shouldBe Seq((1L, false), (2L, true), (3L, false))
  }

  it should "treat bullet/ellipsis ratios over \\n lines" in {
    val mostlyBullets = (Seq.fill(19)("- item") :+ "prose").mkString("\n")
    val allBullets = Seq.fill(10)("- item").mkString("\n")
    val d = Seq((1L, mostlyBullets), (2L, allBullets)).toDF("id", "text")
    val r = d.select(F.col("id"),
      TextStats.gopherFlags(F.col("text")).toMap.apply("bullet_ok").as("b"))
      .orderBy("id").as[(Long, Boolean)].collect().toSeq
    r shouldBe Seq((1L, false), (2L, false)) // 19/20 > 90%, 10/10 > 90%
  }
}
