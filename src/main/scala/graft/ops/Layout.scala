package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning.
  *
  * Sorting a table by ONE column gives tight per-file min/max stats on
  * that column only; a predicate on any other column still reads every
  * file. Z-ordering interleaves the bits of two columns so rows close
  * in the curve are close in BOTH dimensions — after a range
  * repartition + sort on the curve value, every parquet file covers a
  * small rectangle of the (x, y) space and min/max footer stats prune
  * files for predicates on EITHER column (or both). This is the
  * standard lakehouse layout technique for 100 TB fact tables queried
  * along two independent dimensions; the curve computation is pure
  * integer shift/mask arithmetic — codegen-friendly in Spark and
  * replayable verbatim in the oracle engine.
  */
object Layout {

  /** Morton (Z-order) code: interleave the low `bits` bits of two
    * non-negative longs, x in the even positions, y in the odd.
    * Values ≥ 2^bits saturate into the top cell (callers pick `bits`
    * to cover their domain; 16 bits/dim = 65k cells/dim is plenty for
    * layout purposes). The bit positions are disjoint, so the sum is
    * an OR — expressible as plain arithmetic in any SQL engine. */
  def mortonCode(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    val cap = (1L << bits) - 1
    val xc = least(x.cast("long"), lit(cap))
    val yc = least(y.cast("long"), lit(cap))
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(xc, i).bitwiseAND(lit(1L)), 2 * i),
          shiftleft(shiftright(yc, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)
  }

  /** Write `df` z-ordered on (x, y): range-partition on the curve
    * value into `numFiles` files, sort within each, drop the helper
    * column. Each output file then covers a compact curve segment —
    * a small (x, y) rectangle — so parquet row-group/file stats prune
    * scans filtered on either dimension. The shuffle is paid once at
    * write time, like bucketing. */
  def writeZOrdered(df: DataFrame, path: String, x: String, y: String,
                    bits: Int = 16, numFiles: Int = 8): Unit =
    df.withColumn("__z", mortonCode(col(x), col(y), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
