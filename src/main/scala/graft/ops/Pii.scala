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
  val PhoneRe: String = "\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}"
  val Ipv4Re: String  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-kind match counts. */
  def counts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(EmailRe)),
    "n_phones" -> regexp_count(text, lit(PhoneRe)),
    "n_ips"    -> regexp_count(text, lit(Ipv4Re)))

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
