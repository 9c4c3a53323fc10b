package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native token COUNTER for [[TextFunctions.TokenPattern]]
  * (`[A-Za-z0-9_']+|[^A-Za-z0-9_'\s]`): one generated char loop per
  * row, no allocation.
  *
  * `size(regexp_extract_all(text, pattern))` materializes EVERY token
  * as a UTF8String inside an ArrayData just to take its length —
  * hundreds of short-lived allocations per document, and the dominant
  * cost of any operator that needs token counts for every document
  * (token-budget selection t22, packing t18, corpus build c2). The
  * bench hid it for pure projections: `count()` prunes unreferenced
  * projections, so the cost only surfaces where counts feed a filter,
  * join or aggregate — exactly the hot paths. This expression replaces
  * the regex with the automaton it encodes:
  *
  *  - a maximal run of word chars `[A-Za-z0-9_']` counts ONE token;
  *  - every other codepoint counts one token unless it is regex
  *    whitespace.
  *
  * Semantics match Java-regex matching of the pattern exactly: `\s`
  * is the regex's ASCII class `[ \t\n\x0B\f\r]` (NOT the wider
  * `Character.isWhitespace`), and iteration is by CODEPOINT so an
  * astral-plane symbol counts once, as a regex `.`-class match would,
  * not once per surrogate half. TokenCountSpec property-checks
  * equivalence against the regex formulation; the t3/t22/c2 oracle
  * hashes cross-check it against DuckDB's RE2 on real data.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var n = 0; var i = 0; var inWord = false
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      if (TokenCount.isWordChar(cp)) {
        if (!inWord) n += 1
        inWord = true
      } else {
        inWord = false
        if (!TokenCount.isRegexSpace(cp)) n += 1
      }
      i += Character.charCount(cp)
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Generated lines must never BEGIN with '|': Spark's Block.toString
    // runs stripMargin over the assembled code again, silently eating
    // line-leading "||" and leaving uncompilable Java that falls back to
    // interpreted eval (the exact hot-path tax this expression exists to
    // remove).
    nullSafeCodeGen(ctx, ev, sVar => {
      val str = ctx.freshName("str")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val cp = ctx.freshName("cp")
      val inWord = ctx.freshName("inWord")
      s"""
         |java.lang.String $str = $sVar.toString();
         |int $n = 0; int $i = 0; boolean $inWord = false;
         |int $len = $str.length();
         |while ($i < $len) {
         |  int $cp = $str.codePointAt($i);
         |  if (($cp >= 'A' && $cp <= 'Z') || ($cp >= 'a' && $cp <= 'z') ||
         |      ($cp >= '0' && $cp <= '9') || $cp == '_' || $cp == '\\'') {
         |    if (!$inWord) $n++;
         |    $inWord = true;
         |  } else {
         |    $inWord = false;
         |    if ($cp != ' ' && $cp != '\\t' && $cp != '\\n' && $cp != 0x0B
         |        && $cp != '\\f' && $cp != '\\r') $n++;
         |  }
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCount {
  @inline private[functions] def isWordChar(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
      (cp >= '0' && cp <= '9') || cp == '_' || cp == '\''

  /** Java regex `\s` (default flags): ASCII-only. */
  @inline private[functions] def isRegexSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  def tokenCount(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(TokenCount(
      GraftColumnBridge.expression(text.cast("string"))))
  }
}
