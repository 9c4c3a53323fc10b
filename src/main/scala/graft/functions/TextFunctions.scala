package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives (SURVEY.md U1/U2/F5/K6).
  *
  * The reference counts tokens with the bge-m3 BPE tokenizer
  * (transformers/helpers.py:19,153). A faithful BPE is impractical
  * offline, so the engine ships a deterministic word+punctuation
  * tokenizer with the same ROLE (counting and truncation thresholds),
  * pluggable for a real tokenizer later (SURVEY §2.10 U1). All of it is
  * pure column expressions — regexp/slice/concat stay inside
  * whole-stage codegen; there is no UDF in this file.
  */
object TextFunctions {

  /** Token pattern: runs of word chars (with inner apostrophes) or a
    * single non-space symbol — a BPE-ish superset of whitespace split. */
  val TokenPattern = "[A-Za-z0-9_']+|[^A-Za-z0-9_'\\s]"

  /** U1 — token array. */
  def tokens(text: Column): Column = regexp_extract_all(text, lit(TokenPattern), lit(0))

  /** U1 — token count (0 for empty/null-safe via size semantics). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** F5 — whitespace word count, as len(text.split()) in the reference
    * (helpers.py:162): split on runs of whitespace after trim. */
  def wordCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** U2 — truncate to at most `maxTokens` tokens
    * (helpers.py:90-98,184-187). The reference decodes BPE ids back to
    * text; here tokens re-join with single spaces — a documented
    * deviation (original inter-token whitespace is not preserved). */
  def truncateToTokens(text: Column, maxTokens: Int): Column =
    when(tokenCount(text) <= maxTokens, text)
      .otherwise(concat_ws(" ", slice(tokens(text), 1, maxTokens)))

  /** K6 — minimal XML text escaping for the transcript serializer
    * (helpers.py:348-421). Order matters: '&' first. */
  def xmlEscape(c: Column): Column = {
    val amp = regexp_replace(c, "&", "&amp;")
    val lt = regexp_replace(amp, "<", "&lt;")
    val gt = regexp_replace(lt, ">", "&gt;")
    regexp_replace(gt, "\"", "&quot;")
  }
}
