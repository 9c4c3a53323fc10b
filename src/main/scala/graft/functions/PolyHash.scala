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

  /** Column API for the second lane ([[PolyHashB]]). */
  def polyHashB(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PolyHashB(
      GraftColumnBridge.expression(c.cast("string"))))
  }
}

/** Second 60-bit lane for wide (120-bit) SimHash signatures: same
  * polynomial-fold construction as [[PolyHash]] but with independent
  * multipliers (41/43) and moduli (the next two primes below 2^30), so
  * the two lanes' bits are pairwise independent hash families. Packs as
  * `h3 * 2^30 + h4`, < 2^60 — same ANSI/BIGINT safety and the same
  * exact DuckDB replay as lane one. */
case class PolyHashB(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PolyHashB.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val str = ctx.freshName("str")
      val h3 = ctx.freshName("h3")
      val h4 = ctx.freshName("h4")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $str = $s.toString();
         |long $h3 = 0L; long $h4 = 0L;
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  $i += java.lang.Character.charCount($cp);
         |  $h3 = ($h3 * 41L + $cp) % ${PolyHashB.P3}L;
         |  $h4 = ($h4 * 43L + $cp) % ${PolyHashB.P4}L;
         |}
         |${ev.value} = $h3 * ${PolyHash.Pack}L + $h4;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHashB {
  val P3 = 1073741741L // next primes below PolyHash.P1/P2
  val P4 = 1073741723L

  def hash(s: String): Long = {
    var h3 = 0L; var h4 = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      h3 = (h3 * 41L + cp) % P3
      h4 = (h4 * 43L + cp) % P4
    }
    h3 * PolyHash.Pack + h4
  }
}
