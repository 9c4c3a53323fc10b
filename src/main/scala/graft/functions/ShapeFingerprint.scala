package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash document fingerprint over word SHAPE (word lengths,
  * not contents): fold `acc = (acc*31 + len(word)+1) mod 1e9+7` over
  * the single-space-split words of the text, starting at 0.
  *
  * Semantically identical to the HOF formulation
  * `aggregate(split(text, " "), 0L, (acc, w) -> pmod(acc*31 +
  * length(w) + 1, 1e9+7))` — split on a single space keeps empty words
  * for leading/trailing/consecutive spaces, and word length counts
  * Unicode code points (Spark's `length`) — but runs as ONE tight
  * codegen loop per row instead of materializing the word array and
  * evaluating an interpreted lambda per word (Spark's array HOF
  * lambdas never compile; a corpus-wide interpreted fold is exactly
  * the hot-path pattern PERFORMANCE.md principle #2 forbids). The
  * DuckDB oracle keeps the portable `list_reduce` formulation.
  */
case class ShapeFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    ShapeFingerprint.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val str = ctx.freshName("str")
      val acc = ctx.freshName("acc")
      val len = ctx.freshName("len")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $str = $s.toString();
         |long $acc = 0L; long $len = 0L;
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  $i += java.lang.Character.charCount($cp);
         |  if ($cp == ' ') {
         |    $acc = ($acc * 31L + $len + 1L) % ${ShapeFingerprint.M}L;
         |    $len = 0L;
         |  } else {
         |    $len += 1L;
         |  }
         |}
         |${ev.value} = ($acc * 31L + $len + 1L) % ${ShapeFingerprint.M}L;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShapeFingerprint {
  val M = 1000000007L

  def hash(s: String): Long = {
    var acc = 0L; var len = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (cp == ' ') { acc = (acc * 31L + len + 1L) % M; len = 0L }
      else len += 1L
    }
    (acc * 31L + len + 1L) % M
  }

  /** Column API over the expression; casts the input to string. */
  def fingerprint(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(ShapeFingerprint(
      GraftColumnBridge.expression(c.cast("string"))))
  }
}
