package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization primitives (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search"): the vector is split
  * into `m` subspaces of `subDim` dims; each subspace is quantized to
  * the nearest of `k` codewords, so a 64-dim float vector compresses
  * to `m` small ints, and query-time distance is computed
  * asymmetrically (ADC) — exact query subvector vs. codeword — without
  * ever decompressing the corpus.
  *
  * At 100 TB this is the difference between scanning 256 GB of codes
  * and 25 TB of raw vectors for an exhaustive ADC pass; IVF (s2)
  * composes on top to prune the scan itself. The codebook here is
  * SEEDED (fixed corpus vectors provide the codewords) rather than
  * k-means-trained: assignment becomes a pure deterministic function
  * the DuckDB oracle replays bit-for-bit, which is the property the
  * correctness gate needs; a production build would run a few Lloyd
  * iterations to place the codewords and keep everything else
  * identical.
  *
  * Both expressions are native codegen (one tight loop per row): the
  * HOF formulation would evaluate an interpreted lambda per
  * (subspace × codeword × dim) — the exact cost class PERFORMANCE.md
  * principle #2 bans from hot paths. The codebook rides along as a
  * reference object (`double[]` of m·k·subDim, codeword-major within
  * subspace), not a literal expression tree.
  *
  * Argmin tie-break: strictly-less comparison scanning codewords in
  * ascending index order keeps the LOWEST index on equal distances —
  * matching the oracle's `row_number() ORDER BY dist, j`. Distances
  * accumulate left-to-right per dim, so both engines fold identically.
  */
object ProductQuantizer {

  /** Flatten a seed-vector codebook: `seeds(j)(i)` = component i of
    * codeword j; layout `cb[(mIdx*k + j)*subDim + d]`. */
  def flatten(seeds: Seq[Array[Double]], m: Int, subDim: Int): Array[Double] = {
    val k = seeds.length
    val cb = new Array[Double](m * k * subDim)
    for (mi <- 0 until m; j <- 0 until k; d <- 0 until subDim)
      cb((mi * k + j) * subDim + d) = seeds(j)(mi * subDim + d)
    cb
  }

  def encode(vec: Column, cb: Array[Double], m: Int, k: Int, subDim: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PqEncode(
      GraftColumnBridge.expression(vec.cast("array<double>")), cb, m, k, subDim))
  }

  def adcDist(query: Column, codes: Column, cb: Array[Double],
              m: Int, k: Int, subDim: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PqAdcDist(
      GraftColumnBridge.expression(query.cast("array<double>")),
      GraftColumnBridge.expression(codes), cb, m, k, subDim))
  }
}

/** `array<double>` (length m·subDim) → `array<int>` (length m): per
  * subspace, the index of the L2-nearest codeword. */
case class PqEncode(child: Expression, cb: Array[Double], m: Int, k: Int, subDim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        var dist = 0.0; var d = 0
        while (d < subDim) {
          val diff = v.getDouble(mi * subDim + d) - cb((mi * k + j) * subDim + d)
          dist += diff * diff; d += 1
        }
        if (dist < bestD) { bestD = dist; best = j }
        j += 1
      }
      codes(mi) = best; mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("pqCb", cb, "double[]")
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int[] $codes = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $dist = 0.0;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      double $diff = $v.getDouble($mi * $subDim + $d)
         |        - $cbRef[($mi * $k + $j) * $subDim + $d];
         |      $dist += $diff * $diff;
         |    }
         |    if ($dist < $bestD) { $bestD = $dist; $best = $j; }
         |  }
         |  $codes[$mi] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (query `array<double>`, codes `array<int>`) → approximate squared
  * L2 distance: Σ_m ||q_m − codeword(codes[m])||². */
case class PqAdcDist(left: Expression, right: Expression,
                     cb: Array[Double], m: Int, k: Int, subDim: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(q: Any, c: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val j = codes.getInt(mi)
      var d = 0
      while (d < subDim) {
        val diff = qv.getDouble(mi * subDim + d) - cb((mi * k + j) * subDim + d)
        s += diff * diff; d += 1
      }
      mi += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val cbRef = ctx.addReferenceObj("pqCb", cb, "double[]")
      val s = ctx.freshName("s")
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      s"""
         |double $s = 0.0;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $j = $c.getInt($mi);
         |  for (int $d = 0; $d < $subDim; $d++) {
         |    double $diff = $q.getDouble($mi * $subDim + $d)
         |      - $cbRef[($mi * $k + $j) * $subDim + $d];
         |    $s += $diff * $diff;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
