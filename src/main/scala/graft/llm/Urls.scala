package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * URL/domain operators for web-corpus pipelines (the C4/RefinedWeb-style
 * preprocessing steps): host extraction, a heuristic registrable domain,
 * URL normalization, normalized-URL dedup, and per-domain quota caps.
 *
 * Everything is pure Catalyst expressions over the URL string (regex +
 * string/array functions shared verbatim by the DuckDB oracles — the
 * patterns stay inside the subset RE2 and java.util.regex interpret
 * identically), so the extraction passes are one codegen'd scan with no
 * shuffle; the dedup/quota steps reuse the engine's standard hash-agg and
 * threshold-selection shapes.
 */
object Urls {

  /** Lowercased host of an absolute URL: the authority between `://` and
    * the first `/`, `?` or `#`, with userinfo and port stripped. Null for
    * strings that don't parse as scheme-qualified URLs (ordinary corpus
    * rows, not errors). */
  def host(url: Column): Column = {
    val auth = F.lower(F.regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val noUser = F.element_at(F.split(auth, "@"), -1)
    val noPort = F.regexp_replace(noUser, ":[0-9]+$", "")
    F.when(noPort =!= "", noPort)
  }

  /** Second-level labels under which registrations commonly live
    * (`example.co.uk` ⇒ `co` is a registry label, the domain keeps three
    * labels). A deliberate, documented heuristic in place of the full
    * public-suffix list — deterministic and SQL-mirrorable. */
  val SecondLevelLabels = Seq("co", "com", "net", "org", "gov", "ac", "edu")

  /** Registrable domain (eTLD+1) under a caller-supplied public-suffix
    * set — e.g. (a subset of) the Mozilla public suffix list: the longest
    * listed label-boundary tail of the host is the suffix and the domain
    * keeps one extra label (`foo.bar.ne.jp` with `ne.jp` listed ⇒
    * `bar.ne.jp`); hosts matching no listed suffix fall back to the PSL
    * prevailing `*` rule (last two labels); a host that IS a suffix, or a
    * single label, passes through. One hashed-set label walk per row
    * (codegen'd kernel) — the suffix set rides the closure as model
    * parameters, so list size doesn't change the plan shape. The
    * zero-argument overload below stays the default for oracle
    * portability. */
  def registrableDomain(hostCol: Column, suffixes: Seq[String]): Column =
    org.apache.spark.sql.graft.GraftColumns.registrableDomainPsl(
      hostCol, suffixes)

  /** Heuristic registrable domain (eTLD+1): the last two labels of the
    * host, or the last three when the penultimate label is a well-known
    * registry label ([[SecondLevelLabels]]). Hosts with fewer labels pass
    * through unchanged. One kernel call per row, so the (regex-heavy)
    * host child is evaluated once even inside filter predicates, where
    * codegen has no subexpression elimination. */
  def registrableDomain(hostCol: Column): Column =
    org.apache.spark.sql.graft.GraftColumns.registrableDomainHeuristic(
      hostCol, SecondLevelLabels)

  /** Canonical URL for exact dedup: lowercase the whole URL (hosts are
    * case-insensitive; lowercasing paths too is the usual dedup-recall
    * trade, documented), drop the `#fragment`, and drop one trailing
    * slash. One scan, no shuffle. */
  def normalize(url: Column): Column =
    F.regexp_replace(
      F.lower(F.regexp_replace(url, "#.*$", "")), "/$", "")

  /** Keep exactly one row (smallest id) per normalized URL — the "same
    * page fetched twice" dedup that runs before any content dedup. Scale
    * shape: a hash aggregation on the normalized-URL key for the keep set
    * (map-side combinable) + a broadcast-or-shuffle left-semi join back;
    * the corpus is scanned, never sorted. */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val keep = df.select(normalize(F.col(urlCol)).as("__u_norm"),
        F.col(idCol).as("__u_id"))
      .groupBy("__u_norm").agg(F.min("__u_id").as("__u_keep"))
    df.join(keep,
        normalize(F.col(urlCol)) <=> F.col("__u_norm") &&
          F.col(idCol) === F.col("__u_keep"),
        "left_semi")
  }

  /** Drop rows whose registrable domain is on a blocklist — the standard
    * web-corpus domain filter. Rows without a parseable URL host (null
    * domain) SURVIVE: a missing URL is not evidence of a blocked source,
    * and silent drops there would eat every non-web document. Pure
    * codegen'd scan; pass `suffixes` to resolve domains against a public
    * suffix set (default = the heuristic [[registrableDomain]]). */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
                           blocked: Seq[String],
                           suffixes: Seq[String] = Seq.empty): DataFrame = {
    require(blocked.nonEmpty, "filterBlockedDomains: empty blocklist")
    require(!blocked.contains(""), "filterBlockedDomains: empty-string entry")
    val dom =
      if (suffixes.isEmpty) registrableDomain(host(F.col(urlCol)))
      else registrableDomain(host(F.col(urlCol)), suffixes)
    // single occurrence of the domain subtree: coalesce folds the
    // null-survives rule into one isin (codegen evaluates a filter
    // predicate's subtrees once per occurrence, with no elimination)
    df.filter(!F.coalesce(dom, F.lit(""))
      .isin(blocked.map(x => x: Any): _*))
  }

  /** Cap each registrable domain's row count at `n` (deterministic
    * smallest-hash winners) — the "no domain dominates the mix" guard.
    * Delegates to [[Sampling.quotaPerStratum]]'s two-pass threshold
    * selection, so hot domains never serialize through one task. */
  def capPerDomain(df: DataFrame, idCol: String, urlCol: String, n: Int,
                   seed: Long = 42L,
                   suffixes: Seq[String] = Seq.empty): DataFrame = {
    require(!df.columns.contains("url_domain"),
      "capPerDomain: input already has a url_domain column")
    val dom =
      if (suffixes.isEmpty) registrableDomain(host(F.col(urlCol)))
      else registrableDomain(host(F.col(urlCol)), suffixes)
    val withD = df.withColumn("url_domain", dom)
    Sampling.quotaPerStratum(withD, Seq("url_domain"), idCol, n, seed)
      .drop("url_domain")
  }
}
