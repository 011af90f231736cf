package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for document pipelines — the scrub step
  * every public-web training corpus runs before anything else sees the
  * text (emails, phone numbers, IP addresses, US SSNs → typed
  * placeholder tokens).
  *
  * All pure `Column` expressions over `regexp_extract_all` /
  * `regexp_replace` — codegen'd, no UDFs, rides the document scan with
  * zero shuffle at any corpus size. The patterns deliberately use only
  * the regex subset shared by Java's engine (Spark) and RE2 (DuckDB,
  * Go tooling): character classes, bounded repetition, `\b`,
  * non-capturing groups — no lookaround, no backrefs — so one pattern
  * set is portable across the whole toolchain and a SQL oracle
  * reproduces the redaction byte-for-byte.
  *
  * Redaction order is email → IPv4 → SSN → phone: the earlier, more
  * specific patterns consume their matches before the looser phone
  * pattern runs (an IPv4 octet run could otherwise read as a phone);
  * the placeholder tokens contain no digits or '@', so a replacement
  * can never re-match a later pattern. Counts are per-pattern matches
  * of the ORIGINAL text, independent of redaction order.
  */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  // `\+?\b`, not `\b\+?`: a '+' after a space has no word boundary
  // before it (both non-word), so the latter could never match "+1 …"
  // and the redaction would strand the '+'. The country code and ITS
  // separator form one optional group — a bare `[ .-]?` slot would
  // otherwise swallow the space BEFORE an uncoded number ("call 555-…"
  // → "call<PHONE>").
  val PhoneRe = "\\+?\\b(?:[0-9]{1,2}[ .-]?)?\\(?[0-9]{3}\\)?[ .-]?[0-9]{3}[ .-]?[0-9]{4}\\b"

  /** (pattern name, regex, placeholder) in redaction order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "<EMAIL>"),
    ("ipv4", Ipv4Re, "<IP>"),
    ("ssn", SsnRe, "<SSN>"),
    ("phone", PhoneRe, "<PHONE>"))

  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** struct<n_email, n_ipv4, n_ssn, n_phone> — match counts on the
    * raw text (detection / reporting without rewriting anything). */
  def piiCounts(text: Column): Column =
    struct(Patterns.map { case (name, re, _) =>
      countMatches(text, re).as(s"n_$name")
    }: _*)

  /** The redacted text: every pattern match replaced by its typed
    * placeholder, applied in [[Patterns]] order. */
  def redact(text: Column): Column =
    Patterns.foldLeft(text) { case (acc, (_, re, token)) =>
      regexp_replace(acc, re, token)
    }
}
