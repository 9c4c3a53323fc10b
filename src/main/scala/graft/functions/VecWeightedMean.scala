package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A1 — token-weighted mean embedding (the reference's signature
  * aggregate: `SUM(vector * token_count) / SUM(token_count)` over
  * pgvector, clustering/helpers.py:18-43).
  *
  * Typed `Aggregator` with a mutable (running-sum array, weight-sum)
  * buffer: runs as ObjectHashAggregate with map-side partial
  * aggregation, so a 100 TB chunk table reduces to one small row per
  * case before the shuffle — the shuffle carries only
  * (#groups × dim × 8) bytes. Accumulates in double regardless of the
  * input float width (SURVEY §7.3(a): doubles fixed as the accumulator
  * type; Postgres float4/float8 mixed precision is documented as a
  * tolerance, not reproduced bit-for-bit).
  *
  * Dimension is discovered from the first row; mismatched dimensions
  * within a group throw (the reference asserts dimension on write,
  * transformers/helpers.py:306-307).
  */
object VecWeightedMean
    extends Aggregator[(Seq[Float], Double), (Array[Double], Double), Seq[Double]] {

  override def zero: (Array[Double], Double) = (Array.emptyDoubleArray, 0.0)

  override def reduce(
      b: (Array[Double], Double),
      a: (Seq[Float], Double)): (Array[Double], Double) = {
    val (vec, w) = a
    if (vec == null) return b
    val buf = if (b._1.isEmpty) new Array[Double](vec.length) else b._1
    require(buf.length == vec.length,
      s"embedding dimension mismatch: ${buf.length} vs ${vec.length}")
    var i = 0
    while (i < buf.length) { buf(i) += vec(i) * w; i += 1 }
    (buf, b._2 + w)
  }

  override def merge(
      x: (Array[Double], Double),
      y: (Array[Double], Double)): (Array[Double], Double) = {
    if (x._1.isEmpty) return y
    if (y._1.isEmpty) return x
    require(x._1.length == y._1.length, "embedding dimension mismatch")
    var i = 0
    while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
    (x._1, x._2 + y._2)
  }

  override def finish(b: (Array[Double], Double)): Seq[Double] =
    if (b._2 == 0.0 || b._1.isEmpty) null
    else {
      val out = new Array[Double](b._1.length)
      var i = 0
      while (i < out.length) { out(i) = b._1(i) / b._2; i += 1 }
      out.toSeq
    }

  override def bufferEncoder: Encoder[(Array[Double], Double)] =
    Encoders.tuple(ExpressionEncoder[Array[Double]](), Encoders.scalaDouble)

  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()

  /** Column form: `vecWeightedMean($"embedding", $"token_count")`. */
  lazy val asUdaf =
    udaf(this, ExpressionEncoder[(Seq[Float], Double)]())

  def apply(vec: Column, weight: Column): Column = asUdaf(vec, weight)
}

/** Σ wᵢ·vᵢ with NO division — the matrix-free `Xᵀ(Xv)` building block
  * of [[graft.ops.Svd]]'s power iteration (a weighted MEAN is the
  * wrong primitive there: the weight sum `Σ dot(xᵢ, v)` can be ~0 for
  * centered data, and its sign would flip the direction). Same
  * mutable buffer/partial-aggregation shape as [[VecWeightedMean]] —
  * the shuffle carries dim doubles per partition, never rows. */
object VecWeightedSum
    extends Aggregator[(Seq[Float], Double), (Array[Double], Double), Seq[Double]] {

  override def zero: (Array[Double], Double) = VecWeightedMean.zero
  override def reduce(b: (Array[Double], Double),
                      a: (Seq[Float], Double)): (Array[Double], Double) =
    VecWeightedMean.reduce(b, a)
  override def merge(x: (Array[Double], Double),
                     y: (Array[Double], Double)): (Array[Double], Double) =
    VecWeightedMean.merge(x, y)
  override def finish(b: (Array[Double], Double)): Seq[Double] =
    if (b._1.isEmpty) null else b._1.toSeq

  override def bufferEncoder: Encoder[(Array[Double], Double)] =
    Encoders.tuple(ExpressionEncoder[Array[Double]](), Encoders.scalaDouble)
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()

  lazy val asUdaf =
    udaf(this, ExpressionEncoder[(Seq[Float], Double)]())

  def apply(vec: Column, weight: Column): Column = asUdaf(vec, weight)
}
