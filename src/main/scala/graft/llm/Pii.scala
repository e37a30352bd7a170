package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/**
 * PII detection and redaction for training corpora — the standard
 * pre-release scrub (emails / IPv4 addresses / international phone
 * numbers), expressed as pure codegen'd regexp expressions: one scan, no
 * UDF, no shuffle, linear in corpus size. That is the only acceptable
 * shape at 100 TB — PII scrubbing touches every byte of every document.
 *
 * Pattern portability: every pattern below is written in the common subset
 * of `java.util.regex` (Spark) and RE2 (DuckDB, used by the oracle) — no
 * backreferences, no lookaround, ASCII `\b` word boundaries only — so the
 * identical pattern string evaluates identically in both engines.
 *
 * Detection is regex-heuristic by design (like the C4 / RefinedWeb scrub
 * steps): it bounds false negatives for the three structured PII classes,
 * it does not attempt named-entity PII (names, addresses), which needs a
 * model pass.
 */
object Pii {

  /** RFC-5322-lite email: local part of the common atom characters, a
    * domain of dot-separated labels, and a ≥2-letter TLD. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)*\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, octets unvalidated (1-3 digits) — boundary-anchored
    * so version strings like "1.2.3.4567" don't half-match. */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** International (E.164-style) phone: '+' then 7-15 digits, allowing
    * single spaces/dashes between digit groups. */
  val PhonePattern = "\\+[0-9]{1,3}([ -]?[0-9]{2,4}){2,4}\\b"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"

  /** Single-pattern match counts on the text as given. NOTE: on raw text
    * these can overlap (a '+digits' run inside an email local part matches
    * the phone pattern too) — for counts that reconcile exactly with
    * [[redact]]'s output, use the staged [[counts]]. */
  def emailCount(text: Column): Column = F.regexp_count(text, F.lit(EmailPattern))
  def ipv4Count(text: Column): Column = F.regexp_count(text, F.lit(Ipv4Pattern))
  def phoneCount(text: Column): Column = F.regexp_count(text, F.lit(PhonePattern))

  private def noEmail(text: Column): Column =
    F.regexp_replace(text, EmailPattern, EmailToken)
  private def noPhone(text: Column): Column =
    F.regexp_replace(noEmail(text), PhonePattern, PhoneToken)

  /** Replace every match of the three PII classes with its redaction
    * token. Email runs first (its local part may contain digits that the
    * phone pattern would otherwise nibble), then phone, then IPv4 (after
    * phone so a '+'-prefixed number is tagged as phone, not split). */
  def redact(text: Column): Column =
    F.regexp_replace(noPhone(text), Ipv4Pattern, IpToken)

  /**
   * Fused scrub: struct `(redacted, n_emails, n_phones, n_ips)` from ONE
   * codegen'd kernel call per row — the staged [[redact]] rewrite and the
   * staged [[counts]] in three anchor-jumping scans instead of six regexp
   * passes. Bit-identical semantics (the kernel validates every candidate
   * anchor with the same `java.util.regex` patterns; `PiiScrubParitySpec`
   * in TextOpsSpec pins kernel == staged-regex on an adversarial corpus).
   * Prefer this in pipelines; the per-class Column forms below remain the
   * portable reference semantics the DuckDB oracle mirrors.
   */
  def scrub(text: Column): Column =
    org.apache.spark.sql.graft.GraftColumns.piiScrub(text)

  /** (n_emails, n_phones, n_ips) counted on the SAME staged text
    * [[redact]] rewrites — each count is the number of tokens of that
    * class in the redacted output, so counts and redaction always
    * reconcile (a phone-looking run inside an email is counted as the
    * email that swallowed it, not double-counted as a phone). */
  def counts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> emailCount(text),
    "n_phones" -> phoneCount(noEmail(text)),
    "n_ips" -> ipv4Count(noPhone(text)))
}
