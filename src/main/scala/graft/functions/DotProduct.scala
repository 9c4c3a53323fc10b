package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for `array<double>` dot product.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * is semantically identical but its lambdas evaluate INTERPRETED —
  * at ~2M pairs × 64 dims that interpretation dominated the
  * embedding-near-dup runtime. This expression generates a tight Java
  * loop inside whole-stage codegen (and a matching interpreted
  * fallback). Summation order is the same left-to-right fold, so
  * results are bit-identical to the HOF version and to the DuckDB
  * oracle's list_dot_product.
  *
  * Null elements inside the arrays are not expected (embedding columns
  * are containsNull=false); mismatched lengths truncate to the
  * shorter, matching zip_with-then-sum-ignoring-null-products only for
  * equal-length inputs — callers validate dimensions upstream
  * (reference asserts dimension on write, transformers/helpers.py:306).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs are always cast to array<double> by the Column wrapper
  // (VectorFunctions.dot), so no ExpectsInputTypes contract is needed
  // (AbstractDataType is private[sql] in Spark 4).

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
