package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Tolerance-bounded as-of join (pandas `merge_asof(tolerance=...)`
    * semantics): like [[asOf]], but the matched right row only
    * qualifies when it is at most `toleranceSeconds` older than the
    * left row — a stale snapshot yields nulls, exactly as if no prior
    * row existed. Point-in-time enrichment almost always carries such
    * a freshness contract ("the feature value, unless it's more than
    * an hour stale").
    *
    * Post-filtering the single as-of winner is exact, not an
    * approximation: any earlier right row is older still, so if the
    * latest prior row is out of tolerance, the correct answer IS null.
    * The plan shape is unchanged from [[asOf]] — one shuffle per side
    * on the key, one linear window scan; the matched right timestamp
    * rides inside the payload struct so the age check is a map-side
    * projection. `time` must be a TIMESTAMP column (the age is
    * computed in epoch micros). */
  def asOfWithin(left: DataFrame, right: DataFrame, key: String, time: String,
                 payload: Seq[String], toleranceSeconds: Long,
                 prefix: String = "prior_"): DataFrame =
    asOfDirectional(left, right, key, time, payload, prefix, forward = false,
      toleranceMicros = Some(toleranceSeconds * 1000000L))

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
                              prefix: String, forward: Boolean,
                              toleranceMicros: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // with a tolerance, the matched right timestamp travels inside the
    // payload struct (reserved field __rt) so the age check needs no
    // second join
    val structFields: Seq[Column] =
      payload.map(col) ++ toleranceMicros.map(_ => col(time).as("__rt")).toSeq
    val r = right.select(
      col(key), col(time),
      lit(0).as("__side"),
      struct(structFields: _*).as("__p"))
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
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val pick: String => Column = toleranceMicros match {
      case None => p => col("__last").getField(p)
      case Some(tol) =>
        // age of the matched row; null when no match, so the `when`
        // yields null for both "no prior row" and "prior row too old"
        val age =
          if (forward) unix_micros(col("__last").getField("__rt")) -
            unix_micros(col(time))
          else unix_micros(col(time)) -
            unix_micros(col("__last").getField("__rt"))
        p => when(age <= tol, col("__last").getField(p))
    }
    matched.select(leftCols.map(col) ++
      payload.map(p => pick(p).as(prefix + p)): _*)
  }
}
