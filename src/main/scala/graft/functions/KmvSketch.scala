package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values distinct sketch (Bar-Yossef et al. RANDOM '02;
  * Beyer et al. SIGMOD '07 "distinct-value synopses under multiset
  * operations"): the k smallest DISTINCT hash values seen — the
  * mergeable distinct-count sketch that, unlike HLL registers
  * (ops.Sketches.hllRegisters, q23), also supports SET INTERSECTION:
  * because each sketch is a uniform bottom-k sample of its set's hash
  * space, the k smallest of a union of sketches is a uniform sample of
  * the union, and the fraction of it present in both input sketches
  * estimates the Jaccard similarity — which is how train/eval overlap
  * (contamination) is estimated over 10¹¹ keys without ever joining
  * the corpora (ops.Sketches.kmvIntersect, q26).
  *
  * Mergeability is EXACT, not approximate: minK is idempotent,
  * commutative and associative over set union, so
  * merge(kmv(A), kmv(B)) == kmv(A ∪ B) bit-for-bit — the same
  * lossless-merge law as the HLL max-merge (q23) and the histogram
  * add-merge (q24), giving incremental stores that never drift from a
  * full rebuild and streaming state that equals the batch sketch
  * VERBATIM (st15).
  *
  * Runs as an ObjectHashAggregate with map-side partials: each task's
  * buffer holds ≤ k longs no matter how many rows stream past (the
  * dedup happens INSIDE the buffer, so a hot key can't evict smaller
  * values), and the exchange carries ≤ k values per group per
  * partition — the reference pattern for distinct sketches over
  * 100 TB, where a distinct-before-sketch groupBy would shuffle the
  * full key space.
  *
  * Estimator (Beyer et al.): with U(k) = h_(k) / |hash space|,
  * D̂ = (k−1)/U(k), RSD ≈ 1/√(k−2); when a set has < k distinct
  * values the sketch IS the set's hashes and the count is exact.
  */
class KmvSketch(k: Int) extends Aggregator[java.lang.Long, Seq[Long], Seq[Long]] {
  require(k > 0)

  override def zero: Seq[Long] = Vector.empty

  /** Insert-sorted-dedup, truncated at k. The buffer stays a sorted
    * Vector so merge is a linear zip and finish is free. */
  override def reduce(buf: Seq[Long], x: java.lang.Long): Seq[Long] =
    if (x == null) buf else insert(buf, x.longValue())

  private def insert(buf: Seq[Long], h: Long): Seq[Long] = {
    // full buffer and h beyond the current k-th minimum: no-op (the
    // common case on big data — O(1) after the buffer saturates)
    if (buf.length == k && h >= buf.last) buf
    else {
      val i = buf.indexWhere(_ >= h)
      if (i >= 0 && buf(i) == h) buf // dedup: already present
      else {
        val at = if (i < 0) buf.length else i
        val grown = (buf.take(at) :+ h) ++ buf.drop(at)
        if (grown.length > k) grown.take(k) else grown
      }
    }
  }

  /** Sorted-merge dedup of two sorted buffers, truncated at k —
    * minK(A ∪ B), the exact merge law. */
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val out = Vector.newBuilder[Long]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      // skip duplicates across the two runs
      if (i < a.length && a(i) == v) i += 1
      if (j < b.length && b(j) == v) j += 1
      out += v; n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object KmvSketch {
  /** Column form: `kmv(k)(hashCol)` usable inside groupBy.agg — the
    * hash column must already be the uniform mix (ops.Sketches.kmvHash);
    * the aggregator only keeps minima, it does not hash. */
  def kmv(k: Int): Column => Column = {
    val fn = udaf(new KmvSketch(k), ExpressionEncoder[java.lang.Long]())
    (c: Column) => fn(c)
  }
}
