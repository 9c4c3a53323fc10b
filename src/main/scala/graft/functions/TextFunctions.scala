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

  /** U1 — token count (0 for empty/null-safe via size semantics).
    * Counted natively ([[TokenCount]], one codegen loop) instead of
    * `size(tokens(text))`, which materializes every token just to
    * count it — same values, no per-token allocation. */
  def tokenCount(text: Column): Column = TokenCount.tokenCount(text)

  /** F5 — whitespace word count, as len(text.split()) in the reference
    * (helpers.py:162): split on runs of whitespace after trim. */
  def wordCount(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(wordCountExpr(
      GraftColumnBridge.expression(text.cast("string"))))
  }

  /** Expression-level form of [[wordCount]] — ONE tree shared by the
    * Column API above and the Catalog SQL-surface registration
    * (Column trees cannot cross into registry functions — see
    * GraftColumnBridge.registerExprFunction — but raw expressions go
    * both ways, so the two surfaces cannot drift). */
  private[graft] def wordCountExpr(
      s: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    val t = StringTrim(s)
    If(EqualTo(Length(t), Literal(0)), Literal(0),
      Size(StringSplit(t, Literal("\\s+"), Literal(-1))))
  }

  /** U2 — truncate to at most `maxTokens` tokens
    * (helpers.py:90-98,184-187). The reference decodes BPE ids back to
    * text; here tokens re-join with single spaces — a documented
    * deviation (original inter-token whitespace is not preserved). */
  def truncateToTokens(text: Column, maxTokens: Int): Column =
    when(tokenCount(text) <= maxTokens, text)
      .otherwise(concat_ws(" ", slice(tokens(text), 1, maxTokens)))

  /** K6 — XML TEXT-node escaping matching Python ElementTree's
    * `_escape_cdata` (the reference serializer, helpers.py:367-399,
    * writes via `ET.ElementTree(...).write(..., encoding="unicode")`):
    * only '&', '<', '>' are escaped — quotes stay literal in text, as
    * seen in examples/25650_20250521_194825.xml. Order matters: '&'
    * first. */
  def xmlEscapeText(c: Column): Column = {
    val amp = regexp_replace(c, "&", "&amp;")
    val lt = regexp_replace(amp, "<", "&lt;")
    regexp_replace(lt, ">", "&gt;")
  }

  /** K6 — XML ATTRIBUTE escaping matching ElementTree's
    * `_escape_attrib`: '&', '<', '>', '"' plus literal tab/newline/CR
    * as numeric character references. */
  def xmlEscapeAttr(c: Column): Column = {
    val base = regexp_replace(xmlEscapeText(c), "\"", "&quot;")
    val cr = regexp_replace(base, "\r", "&#13;")
    val nl = regexp_replace(cr, "\n", "&#10;")
    regexp_replace(nl, "\t", "&#09;")
  }
}
