package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native random-hyperplane (sign-LSH, Charikar '02) signature over an
  * embedding: band b's value packs `bits` sign bits, bit j set when
  * `v · h_{b·bits+j} >= 0`. Hyperplane components are
  * `h_i[d] = (splitmix64(i·dim+d) mod 2048) − 1024` — a full-avalanche
  * 64-bit finalizer of the flat index, so components are derived
  * identically anywhere from the bit index alone (no stored matrix, no
  * RNG state, plain-Scala replay bit-exact, HyperplaneSigSpec).
  *
  * The mixer matters: the previous raw-LCG-step lattice
  * `(1103515245·n + 12345) mod 2048` is an arithmetic progression in
  * n mod 2048, so hyperplanes i and j were IDENTICAL whenever
  * dim·(i−j) ≡ 0 (mod 2048) — at dim 1024 only 2 of 64 were distinct,
  * collapsing 16-bit bands to ~2 effective bits and making random-pair
  * band collisions ~1/4 instead of 2^−16 (near-quadratic candidate
  * generation). splitmix64's multiply-xor-shift avalanche has no such
  * lattice; HyperplaneSigSpec asserts pairwise distinctness of all
  * bands·bits hyperplanes at dims 64/128/768/1024.
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

  /** Integer component of hyperplane i at dimension d: splitmix64
    * finalizer of the flat index, reduced to the zero-centred 11-bit
    * range [−1024, 1023]. Stateless and replayable; full avalanche
    * guarantees no hyperplane-duplicating lattice (see class doc). */
  def coeff(i: Int, d: Int, dim: Int): Long = {
    var z = i.toLong * dim + d + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= (z >>> 31)
    (z & 2047L) - 1024L
  }

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
