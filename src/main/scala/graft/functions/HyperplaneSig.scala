package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native random-hyperplane (sign-LSH, Charikar '02) signature over an
  * embedding: band b's value packs `bits` sign bits, bit j set when
  * `v · h_{b·bits+j} >= 0`. Hyperplane components are a fixed integer
  * lattice `h_i[d] = ((1103515245·(i·dim+d) + 12345) mod 2048) − 1024`
  * (glibc LCG step, zero-mean) — derived identically anywhere from the
  * bit index alone, so there is no stored matrix, no RNG state, and a
  * plain-Scala replay is bit-exact (HyperplaneSigSpec).
  *
  * One generated call per row computes all bands·bits dot products in
  * a tight loop. The alternative — bands·bits separate DotProduct
  * expressions against literal arrays — is exactly the wide-plan
  * Janino-compile smell the round-6 purge removed (the 120-column
  * SimHash aggregate cost ~5 s of codegen compile); here the generated
  * code is one static call regardless of signature width.
  *
  * For two vectors at angle θ, P[one bit differs] = θ/π; a near-dup at
  * cosine 1−ε has θ ≈ √(2ε), so banding recall is tunable to
  * near-certainty for genuine near-duplicates while random pairs
  * (θ ≈ π/2) collide on a 16-bit band with probability 2^−16.
  */
case class HyperplaneSig(child: Expression, bands: Int, bits: Int)
  extends UnaryExpression {
  require(bands >= 1 && bits >= 1 && bits <= 63,
    s"bands >= 1 and 1 <= bits <= 63, got bands=$bands bits=$bits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HyperplaneSig.sig(input.asInstanceOf[ArrayData], bands, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vVar => {
      s"${ev.value} = graft.functions.HyperplaneSig$$.MODULE$$.sig($vVar, $bands, $bits);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSig {

  /** Integer lattice component of hyperplane i at dimension d. */
  def coeff(i: Int, d: Int, dim: Int): Long =
    ((1103515245L * (i.toLong * dim + d) + 12345L) % 2048L) - 1024L

  /** All band values for one vector; called from eval and generated
    * code. Dot products accumulate in ascending dimension order —
    * bit-identical to the spec's plain-Scala reference. */
  def sig(v: ArrayData, bands: Int, bits: Int): ArrayData = {
    val dim = v.numElements()
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var value = 0L
      var j = 0
      while (j < bits) {
        val i = b * bits + j
        var dot = 0.0
        var d = 0
        while (d < dim) { dot += v.getDouble(d) * coeff(i, d, dim); d += 1 }
        if (dot >= 0.0) value |= (1L << j)
        j += 1
      }
      out(b) = value
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: array<double> -> array<long> of band values. */
  def bandSigs(c: Column, bands: Int, bits: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(HyperplaneSig(
      GraftColumnBridge.expression(c), bands, bits))
  }
}
