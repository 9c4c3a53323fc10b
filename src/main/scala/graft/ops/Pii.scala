package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines.
  *
  * Pure column expressions (regexp_count / regexp_replace — codegen'd,
  * one scan, no UDFs), so the pass runs at full scan speed and composes
  * with the quality/dedup operators in a single stage at 100 TB.
  *
  * Patterns are deliberately engine-portable: no backreferences, no
  * lookaround, no alternation whose leftmost-first (Java) vs
  * leftmost-longest (RE2) semantics could diverge — the same strings
  * run identically under Spark's Java regex and DuckDB/RE2, which is
  * what makes the operator oracle-checkable.
  */
object Pii {

  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** \b on both ends so the pattern never partially matches inside a
    * longer digit/word run ('555-123-45678' is NOT a phone; without
    * the guard it would redact to '<PHONE>8'). The leading anchor sits
    * after the optional '+' — '+' is a non-word char, so a boundary
    * exists between it and the first digit. ASCII \b is portable
    * across Java regex and RE2, as Ipv4Re already demonstrates. */
  val PhoneRe: String = "\\+?\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b"
  val Ipv4Re: String  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-kind match counts, each computed on the text with the
    * EARLIER kinds already redacted (same sequence as [[redact]]), so
    * the counts are exact redaction tallies: a phone/IP-shaped span
    * inside an email local part is counted as part of the email that
    * swallows it, never double-counted as a phone/IP. */
  def counts(text: Column): Seq[(String, Column)] = {
    val afterEmails = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterPhones = regexp_replace(afterEmails, PhoneRe, "<PHONE>")
    Seq(
      "n_emails" -> regexp_count(text, lit(EmailRe)),
      "n_phones" -> regexp_count(afterEmails, lit(PhoneRe)),
      "n_ips"    -> regexp_count(afterPhones, lit(Ipv4Re)))
  }

  /** Redaction, fixed order: emails first (their local parts contain
    * digits and dots that the narrower patterns could chew on), then
    * phones, then IPv4. The replacement tags carry no digits, so later
    * passes cannot re-match earlier redactions. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")
}
