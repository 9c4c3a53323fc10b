package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text canonicalizer: the one-pass automaton for
  *
  * {{{ trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " ")) }}}
  *
  * — the pre-dedup normalization every corpus-scale operator funnels
  * text through (t7 exemplar, the c2 corpus-build dedup key). The regex
  * composition costs TWO java.util.regex passes over every character
  * plus two intermediate copies of the document, and showed up as the
  * dominant term of the corpus build at the 100x point (25.8 s of a
  * 3.3 s-scan stage at sf10, paid twice because the dedup key and the
  * non-empty filter both reference it). This expression emits the
  * result in one generated char loop with a single output buffer:
  *
  *  - a codepoint whose `Character.toLowerCase` lands in `[a-z0-9]` is
  *    kept (lowercased);
  *  - regex whitespace (Java `\s` = `[ \t\n\x0B\f\r]`, ASCII-only — NOT
  *    `Character.isWhitespace`) becomes a pending separator, emitted as
  *    ONE space only when another kept char follows (that is `\s+` →
  *    `" "` plus `trim` in one rule);
  *  - everything else is dropped.
  *
  * Per-codepoint `Character.toLowerCase` matches the `lower()` string
  * mapping on every kept character: the only multi-char lowercase
  * mapping in default-locale Unicode is U+0130 (İ → "i" + combining
  * dot), where the combining dot is dropped by the `[^a-z0-9\s]` rule
  * either way. Iteration is by codepoint so astral-plane symbols drop
  * as one unit, exactly as the regex `.`-class would.
  * NormalizeTextSpec property-checks equivalence against the regex
  * composition (including İ and supplementary codepoints); the t7/c2
  * oracle hashes cross-check it against DuckDB's RE2 on real data.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0; var pendingSpace = false
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(lc.toChar)
      } else if (TokenCount.isRegexSpace(cp)) {
        pendingSpace = true
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Generated lines must never BEGIN with '|' (Spark's Block.toString
    // stripMargins the assembled code again — see TokenCount.doGenCode).
    nullSafeCodeGen(ctx, ev, sVar => {
      val str = ctx.freshName("str")
      val sb = ctx.freshName("sb")
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val cp = ctx.freshName("cp")
      val lc = ctx.freshName("lc")
      val pending = ctx.freshName("pending")
      s"""
         |java.lang.String $str = $sVar.toString();
         |int $len = $str.length();
         |java.lang.StringBuilder $sb = new java.lang.StringBuilder($len);
         |int $i = 0; boolean $pending = false;
         |while ($i < $len) {
         |  int $cp = $str.codePointAt($i);
         |  int $lc = java.lang.Character.toLowerCase($cp);
         |  if (($lc >= 'a' && $lc <= 'z') || ($lc >= '0' && $lc <= '9')) {
         |    if ($pending && $sb.length() > 0) $sb.append(' ');
         |    $pending = false;
         |    $sb.append((char) $lc);
         |  } else if ($cp == ' ' || $cp == '\\t' || $cp == '\\n' || $cp == 0x0B ||
         |      $cp == '\\f' || $cp == '\\r') {
         |    $pending = true;
         |  }
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($sb.toString());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  def normalize(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(NormalizeText(
      GraftColumnBridge.expression(text.cast("string"))))
  }
}
