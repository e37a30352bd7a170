package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** URL/domain operators: host parsing edges, the registrable-domain
  * heuristic, normalization rules, URL dedup, per-domain caps. */
class UrlSpec extends SparkTestBase {
  import spark.implicits._

  private def hostOf(url: String): Option[String] =
    Seq(Tuple1(url)).toDF("u").select(Urls.host($"u"))
      .collect().headOption.flatMap(r => Option(r.getString(0)))

  behavior of "host"

  it should "extract the lowercased authority without userinfo or port" in {
    hostOf("https://WWW.Example.COM/path?q=1#f") shouldBe Some("www.example.com")
    hostOf("http://user:pw@site.org:8080/x") shouldBe Some("site.org")
    hostOf("ftp://Host.Net") shouldBe Some("host.net")
    hostOf("https://a.co.uk:443") shouldBe Some("a.co.uk")
  }

  it should "yield null for non-URLs" in {
    hostOf("not a url") shouldBe None
    hostOf("/relative/path") shouldBe None
    hostOf("https://") shouldBe None
  }

  behavior of "registrableDomain"

  it should "keep two labels, or three under registry second-level labels" in {
    val rows = Seq("www.example.com", "a.b.example.co.uk", "example.com",
      "deep.sub.site.org", "localhost")
      .map(Tuple1(_)).toDF("h")
      .select(Urls.registrableDomain($"h")).as[String].collect()
    rows shouldBe Array("example.com", "example.co.uk", "example.com",
      "site.org", "localhost")
  }

  it should "honor a caller-supplied public-suffix set, incl. multi-label registries" in {
    val psl = Seq("com", "co.uk", "ne.jp", "gob.mx", "com.au", "org")
    def dom(hosts: String*) = hosts.map(Tuple1(_)).toDF("h")
      .select(Urls.registrableDomain($"h", psl)).as[String].collect()
    // multi-label registries the 7-label heuristic mis-groups
    dom("foo.bar.ne.jp") shouldBe Array("bar.ne.jp")
    dom("servicios.gob.mx") shouldBe Array("servicios.gob.mx") // already eTLD+1
    dom("a.b.servicios.gob.mx") shouldBe Array("servicios.gob.mx")
    dom("shop.example.com.au") shouldBe Array("example.com.au")
    // longest listed suffix wins over its shorter tail ('com' vs 'com.au')
    dom("x.example.com") shouldBe Array("example.com")
    // unlisted TLD: PSL prevailing * rule -> last two labels
    dom("deep.sub.example.dev") shouldBe Array("example.dev")
    // a host that IS a suffix, and single labels, pass through
    dom("ne.jp") shouldBe Array("ne.jp")
    dom("localhost") shouldBe Array("localhost")
    // null host stays null
    Seq(Tuple1("nope")).toDF("u")
      .select(Urls.registrableDomain(Urls.host($"u"), psl))
      .collect().head.isNullAt(0) shouldBe true
    // case-insensitive suffix set
    Seq(Tuple1("A.B.NE.JP")).toDF("h")
      .select(Urls.registrableDomain(F.lower($"h"), psl)).as[String]
      .collect() shouldBe Array("b.ne.jp")
  }

  behavior of "normalize"

  it should "lowercase, strip fragments and one trailing slash" in {
    val out = Seq(
      "https://A.com/Path/",
      "https://a.COM/Path#sec2",
      "https://a.com/Path")
      .map(Tuple1(_)).toDF("u")
      .select(Urls.normalize($"u")).as[String].collect()
    out.toSet shouldBe Set("https://a.com/path")
  }

  behavior of "filterBlockedDomains"

  it should "drop blocked registrable domains and keep URL-less rows" in {
    val d = Seq(
      (1L, "https://www.bad.com/x"),
      (2L, "https://sub.bad.com/y"),      // same registrable domain
      (3L, "https://good.org/z"),
      (4L, "not a url"),                  // null host -> survives
      (5L, "https://evil.ne.jp/w"))
      .toDF("id", "url")
    Urls.filterBlockedDomains(d, "url", Seq("bad.com"))
      .select("id").as[Long].collect().sorted shouldBe Array(3L, 4L, 5L)
    // with a public-suffix set, ne.jp groups at three labels
    Urls.filterBlockedDomains(d, "url", Seq("evil.ne.jp"),
        suffixes = Seq("com", "org", "ne.jp"))
      .select("id").as[Long].collect().sorted shouldBe
      Array(1L, 2L, 3L, 4L)
  }

  behavior of "dedupByUrl"

  it should "keep the smallest id per normalized URL" in {
    val d = Seq(
      (1L, "https://a.com/x#one"),
      (2L, "https://A.COM/x/"),
      (3L, "https://a.com/y"))
      .toDF("id", "url")
    // 1 and 2 normalize alike ("https://a.com/x"); 1 wins
    Urls.dedupByUrl(d, "id", "url")
      .select("id").as[Long].collect().sorted shouldBe Array(1L, 3L)
  }

  behavior of "capPerDomain"

  it should "cap each domain at n deterministic rows" in {
    val d = (0L until 100L)
      .map(i => (i, s"https://site${i % 2}.com/p/$i")).toDF("id", "url")
    val out = Urls.capPerDomain(d, "id", "url", n = 7)
    out.count() shouldBe 14
    out.columns should not contain "url_domain"
    // deterministic winners (same set on re-run / repartition)
    val a = out.select("id").as[Long].collect().sorted
    Urls.capPerDomain(d.repartition(5), "id", "url", n = 7)
      .select("id").as[Long].collect().sorted shouldBe a
  }
}
