package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine-reproducible 60-bit string hash: two polynomial folds
  * over the string's Unicode code points, packed as `h1 * 2^30 + h2`
  * with
  *
  *   h1 = fold(h * 31 + cp) mod 1073741789
  *   h2 = fold(h * 37 + cp) mod 1073741783
  *
  * (both primes < 2^30, so the packed value stays < 2^60 — safe under
  * ANSI arithmetic in Spark and BIGINT in DuckDB).
  *
  * Why not xxhash64: Spark's xxhash64 has no DuckDB equivalent, so any
  * operator built on it is unverifiable by the SQL oracle. This hash is
  * exactly expressible in portable SQL:
  *
  * {{{
  * list_reduce(list_prepend(CAST(0 AS BIGINT),
  *     list_transform(range(1, len(w)+1),
  *                    i -> CAST(unicode(substr(w, i, 1)) AS BIGINT))),
  *   (h, c) -> (h * 31 + c) % 1073741789)
  * }}}
  *
  * Used by SimHash (graft.ops.Dedup.simHashSignatures): the two
  * independent 30-bit halves give 60 usable signature bit positions.
  * Native codegen (one tight loop per row) keeps it out of the
  * interpreted-HOF trap that the SQL-expressible formulation would hit
  * in Spark.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val str = ctx.freshName("str")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $str = $s.toString();
         |long $h1 = 0L; long $h2 = 0L;
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  $i += java.lang.Character.charCount($cp);
         |  $h1 = ($h1 * 31L + $cp) % ${PolyHash.P1}L;
         |  $h2 = ($h2 * 37L + $cp) % ${PolyHash.P2}L;
         |}
         |${ev.value} = $h1 * ${PolyHash.Pack}L + $h2;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  val P1 = 1073741789L // largest primes < 2^30
  val P2 = 1073741783L
  val Pack = 1L << 30

  def hash(s: String): Long = {
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      h1 = (h1 * 31L + cp) % P1
      h2 = (h2 * 37L + cp) % P2
    }
    h1 * Pack + h2
  }

  /** Column API over the expression; casts the input to string. */
  def polyHash(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PolyHash(
      GraftColumnBridge.expression(c.cast("string"))))
  }
}
