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

  def emailCount(text: Column): Column = F.regexp_count(text, F.lit(EmailPattern))
  def ipv4Count(text: Column): Column = F.regexp_count(text, F.lit(Ipv4Pattern))
  def phoneCount(text: Column): Column = F.regexp_count(text, F.lit(PhonePattern))

  /** Replace every match of the three PII classes with its redaction
    * token. Email runs first (its local part may contain digits that the
    * phone pattern would otherwise nibble), then phone, then IPv4 (after
    * phone so a '+'-prefixed number is tagged as phone, not split). */
  def redact(text: Column): Column = {
    val noEmail = F.regexp_replace(text, EmailPattern, EmailToken)
    val noPhone = F.regexp_replace(noEmail, PhonePattern, PhoneToken)
    F.regexp_replace(noPhone, Ipv4Pattern, IpToken)
  }
}
