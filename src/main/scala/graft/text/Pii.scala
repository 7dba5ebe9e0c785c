package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-corpus scrubbing.
  *
  * Patterns stay inside the regex subset Java's engine and RE2-family
  * engines (DuckDB, Go, Rust) interpret identically — character
  * classes, bounded quantifiers, word boundaries; no lookaround — so
  * the scrub is reproducible across engines and oracle-checkable.
  * Everything is `regexp_replace`/`regexp_extract_all` column
  * expressions: codegen'd, narrow, no shuffle.
  */
object Pii {

  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val SsnPattern: String = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Number of matches of `pattern` in `text`. */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  def countEmails(text: Column): Column = countMatches(text, EmailPattern)
  def countIpv4(text: Column): Column = countMatches(text, Ipv4Pattern)
  def countSsns(text: Column): Column = countMatches(text, SsnPattern)

  /** Redact emails → `<EMAIL>`, IPv4 → `<IP>`, SSN-shaped ids → `<SSN>`,
    * applied in that fixed order (order matters for overlapping spans
    * and must match any cross-engine reimplementation). */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      SsnPattern, "<SSN>")
}
