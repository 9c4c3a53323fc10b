package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy hitters: a MERGEABLE bounded-state frequent-items
  * summary — at most `k` counters per aggregation buffer no matter how
  * many distinct items stream past, which is what makes "top items per
  * group" affordable at 100 TB where an exact per-item count would
  * shuffle the full key space. Runs as an ObjectHashAggregate with
  * map-side partials; the shuffle carries ≤ k entries per group per
  * partition.
  *
  * Guarantees (the classic ones, preserved by the merge rule from
  * Agarwal et al., "Mergeable Summaries"):
  *   - every item with true frequency > n/(k+1) is present;
  *   - each reported estimate understates the true count by at most
  *     n/(k+1) and never overstates it;
  *   - when a group has ≤ k distinct items, no decrement ever fires
  *     and the counts are EXACT — which is what lets an SQL oracle
  *     check the aggregate end-to-end through real shuffled merges.
  *
  * The merge rule: sum counts pairwise; if more than k survive, subtract
  * the (k+1)-th largest count from all and drop the non-positive —
  * the standard mergeable-MG step whose total decrement stays within
  * the one-pass bound.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
    if (x == null) m else bound(m.updated(x, m.getOrElse(x, 0L) + 1L))

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    bound(b.foldLeft(a) { case (acc, (item, c)) =>
      acc.updated(item, acc.getOrElse(item, 0L) + c)
    })

  private def bound(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val dec = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      m.collect { case (item, c) if c - dec > 0 => item -> (c - dec) }
    }

  override def finish(m: Map[String, Long]): Map[String, Long] = m

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {
  /** Column form: `heavyHitters(k)(itemCol)` usable inside groupBy.agg. */
  def heavyHitters(k: Int): Column => Column = {
    val fn = udaf(new MisraGries(k), ExpressionEncoder[String]())
    (c: Column) => fn(c)
  }
}
