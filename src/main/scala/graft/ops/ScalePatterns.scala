package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Skew and co-location patterns for cluster-scale joins (SURVEY §4
  * physical-execution notes; PERFORMANCE.md §5).
  *
  * AQE's skew-join splitting handles most skew at runtime; these are
  * the explicit tools for the cases it can't: a single hot key joined
  * against a non-broadcastable right side (salting), and repeated
  * large-large joins on a stable key (bucketing — shuffle paid once at
  * write).
  */
object ScalePatterns {

  /** Salted equi-join for skewed left keys: the left side gets a random
    * salt in [0, buckets), the right side replicates `buckets` times,
    * and the join key becomes (key, salt) — a hot key spreads over
    * `buckets` tasks instead of one straggler.
    *
    * Use when one side has pathological key skew AND the right side is
    * too big to broadcast but small enough to replicate `buckets`×.
    * The salt uses a deterministic hash of the full left row (via
    * monotonically increasing id would break retries; hashing input
    * columns keeps tasks idempotent). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int = 8, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // right/full outer would emit each unmatched right row once PER SALT
    // (buckets-1 spurious null-extended duplicates) — replication is only
    // sound when unmatched right rows don't surface
    require(joinType == "inner" || joinType.startsWith("left"),
      s"saltedJoin replicates the right side; '$joinType' would duplicate unmatched right rows")
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toSeq: _*), lit(buckets)))
    val saltedRight = right
      .withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Semi-join reduction via a Bloom filter: build an FPP-bounded
    * membership sketch over the small side's join keys in ONE
    * distributed aggregation (Catalyst's BloomFilterAggregate — the
    * same machinery Spark's runtime row-level filtering injects, here
    * made explicit and composable), then prune the big probe side
    * BEFORE its shuffle. At 100 TB this is the difference between
    * shuffling the full fact table and shuffling only the ~selectivity
    * fraction that can possibly match (+fpp false positives, removed
    * by the join itself — never false negatives, so results are
    * byte-identical to the plain join).
    *
    * The merged sketch returns to the driver as one binary row and
    * re-enters the plan as a literal — the broadcast-build pattern,
    * sized by `expectedItems`/`fpp` (1M @ 1% ≈ 1.2 MB) independent of
    * the big side. Both sides address the sketch through xxhash64 of
    * the key, matching BloomFilterAggregate's long-keyed buffer. */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, key: String,
                      expectedItems: Long, fpp: Double = 0.01,
                      joinType: String = "inner"): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val agg = new BloomFilterAggregate(
      GraftColumnBridge.expression(xxhash64(col(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bloomBytes = small.select(GraftColumnBridge.column(agg).as("bf"))
      .head.getAs[Array[Byte]](0)
    val pruned = big.filter(GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      GraftColumnBridge.expression(xxhash64(col(key))))))
    pruned.join(small, Seq(key), joinType)
  }

  /** Write a DataFrame as a bucketed, sorted table: the shuffle happens
    * once at write; later equi-joins between tables bucketed on the
    * same key with the same bucket count need NO exchange (verified in
    * ScalePatternsSpec by asserting the join plan has no shuffle).
    * This is the engine's replacement for the reference's btree
    * indexes on gold tables. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
