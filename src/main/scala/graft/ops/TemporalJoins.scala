package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively.
  *
  * The reference has no as-of join either — this belongs to the
  * beyond-reference training-data toolkit (BASELINE.json north star):
  * joining each training example / event to the latest-known state
  * snapshot (feature value, consent flag, document revision) is the
  * canonical point-in-time-correct enrichment in dataset builds.
  */
object TemporalJoins {

  /** As-of join: for each left row, the single latest right row with
    * `right.time <= left.time` on the same key (DuckDB/kdb ASOF
    * semantics — inclusive on equality; left rows with no prior right
    * row keep nulls).
    *
    * Implemented as union-tag + running `last(ignoreNulls)` window
    * rather than a range join: both sides shuffle ONCE on the key, the
    * per-key merge is a linear scan, and no (left × candidate-right)
    * intermediate ever materializes. At 100 TB a range join between
    * two event-scale tables explodes quadratically within key groups;
    * this stays one exchange + one sort — the cost class of any keyed
    * window — and AQE skew-split applies to hot keys as usual.
    *
    * The right payload travels as ONE nullable struct so a null
    * payload FIELD inside a genuine right row still wins the
    * carry-forward (per-column `last(ignoreNulls)` would leak an older
    * row's value into that column).
    *
    * Right rows SHOULD be unique per (key, time) — duplicate ASOF
    * input is semantically ambiguous — but when duplicates do occur
    * the result is still deterministic: the window order carries the
    * payload struct itself as a final tie-break, so the
    * lexicographically-largest payload at that (key, time) wins on
    * every run and every partitioning (never whichever row the sort
    * happened to emit last). Left duplicates are fine — each left row
    * resolves independently.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
           payload: Seq[String], prefix: String = "prior_"): DataFrame =
    asOfDirectional(left, right, key, time, payload, prefix, forward = false)

  /** Forward as-of join: for each left row, the single EARLIEST right
    * row with `right.time >= left.time` on the same key (inclusive) —
    * "next snapshot after the event". Same single-shuffle union-tag
    * shape as the backward join, scanning the merged timeline in
    * descending time order. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String, time: String,
                  payload: Seq[String], prefix: String = "next_"): DataFrame =
    asOfDirectional(left, right, key, time, payload, prefix, forward = true)

  /** Interval-containment (range) join WITHOUT an equi-key: every point
    * row pairs with every interval row whose `[start, end)` contains
    * its timestamp. Handed this shape directly, Spark plans a
    * BroadcastNestedLoopJoin (or cartesian) — |points| × |intervals|
    * comparisons, the classic range-join blowup.
    *
    * Binning turns it into an equi-join: intervals explode into the
    * fixed-width time bins they cover, points hash into exactly ONE
    * bin, and the bin equi-join meets each qualifying pair exactly
    * once (the point's single bin is covered at most once per
    * interval) — no post-join dedup. Comparisons drop to the pairs
    * that share a bin; shuffle keys are the bins, so time-locality
    * becomes partition-locality. Replication cost is per-INTERVAL
    * (len/binWidth + 1 rows), so pick `binSeconds` near the typical
    * interval length: the interval side stays ~2×, and only genuinely
    * long intervals pay more. Hot bins (a traffic spike) are ordinary
    * equi-join skew — AQE skew-split or `ScalePatterns.saltedJoin`
    * applies unchanged.
    *
    * Returns the inner-join pairs with all columns from both inputs
    * (names must be disjoint). Epoch-nonnegative timestamps assumed
    * (integer `div` truncates toward zero).
    */
  def binnedIntervalJoin(points: DataFrame, timeCol: String,
                         intervals: DataFrame, startCol: String, endCol: String,
                         binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    val w = binSeconds * 1000000L // work in microseconds
    val binned = intervals.withColumn("__bin",
      explode(sequence(expr(s"unix_micros($startCol) div $w"),
                       expr(s"unix_micros($endCol) div $w"))))
    val p = points.withColumn("__bin", expr(s"unix_micros($timeCol) div $w"))
    p.join(binned, Seq("__bin"))
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("__bin")
  }

  private def asOfDirectional(left: DataFrame, right: DataFrame, key: String,
                              time: String, payload: Seq[String],
                              prefix: String, forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val r = right.select(
      col(key), col(time),
      lit(0).as("__side"),
      struct(payload.map(col): _*).as("__p"))
    val l = left.withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(r.schema("__p").dataType))
    // scan order: ascending time for backward, descending for forward —
    // either way left rows sort AFTER the right row at the same
    // timestamp (__side 1 > 0), so equality is inclusive. __p breaks
    // ties among duplicate right rows at the same (key, time); left
    // rows all carry __p = null, so their relative order (irrelevant —
    // each computes the same frame) is unaffected.
    val timeOrd = if (forward) col(time).desc else col(time).asc
    val w = Window.partitionBy(col(key))
      .orderBy(timeOrd, col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__last").getField(p).as(prefix + p)): _*)
  }
}
