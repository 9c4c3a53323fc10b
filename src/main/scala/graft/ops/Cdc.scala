package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff (change-data-capture derivation) between two keyed
  * table versions — the incremental-pipeline primitive behind "what
  * changed since yesterday's crawl/dump": emit one row per inserted,
  * deleted, or value-changed key, so downstream stages (re-embed,
  * re-dedup, re-index) touch only the delta instead of the corpus.
  * (The reference's pipelines re-scan keys to skip already-processed
  * work — `etl/Sinks.scala` S4 — this is the same idea generalized to
  * both directions and to value changes.)
  *
  * Scale shape: each side is reduced to (key, 64-bit value digest)
  * BEFORE the join, so the full-outer equi-join — the only corpus-
  * sized exchange — carries ~16 bytes/row, never the row payload.
  * Both sides shuffle once on the key (co-partitioned by the join);
  * on bucketed tables (etl/Sinks.bucketed) even that exchange
  * disappears. Classification is a map-side CASE over the two
  * digests.
  *
  * Caveats (documented contract): value equality is 64-bit-digest
  * equality (collision odds ~n²/2⁶⁵ — at 10¹² rows ≈ 3%; callers
  * needing certainty re-verify 'U' rows with a payload join, the same
  * verify-after-block discipline as the near-dup family). Digest
  * inputs should be null-normalized by the caller: `xxhash64` skips
  * NULL inputs, so (NULL, "x") and ("x", NULL) digest equal across
  * two compare columns.
  */
object Cdc {

  val OpInsert = "I"
  val OpDelete = "D"
  val OpUpdate = "U"

  /** Diff `newDf` against `oldDf` by `keyCols`, comparing `valueCols`
    * by xxhash64 digest. Returns (keyCols..., op) — unchanged keys are
    * dropped. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "keys and values required")
    def digested(df: DataFrame, h: String): DataFrame =
      df.select(keyCols.map(col) :+
        xxhash64(valueCols.map(col): _*).as(h): _*)
    val o = digested(oldDf, "__old_h")
    val n = digested(newDf, "__new_h")
    val op = when(col("__old_h").isNull, lit(OpInsert))
      .when(col("__new_h").isNull, lit(OpDelete))
      .when(col("__old_h") =!= col("__new_h"), lit(OpUpdate))
    o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) :+ op.as("op"): _*)
      .filter(col("op").isNotNull)
  }
}
