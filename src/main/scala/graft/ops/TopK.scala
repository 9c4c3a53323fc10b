package graft.ops

import org.apache.spark.sql.{DataFrame, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending, SortOrder}
import org.apache.spark.sql.types.IntegerType
import graft.plans.{TopKPerGroup, TopKStrategy}

/** DataFrame API over the custom [[graft.plans.TopKPerGroup]] operator:
  * `TopK.perGroup(df, Seq("l_suppkey"), Seq("l_extendedprice" -> true, ...), 3)`
  * ≡ window row_number ≤ k, but with map-side bounded heaps (see the
  * operator's scaladoc for the shuffle-volume argument).
  */
object TopK {

  /** Idempotently add the planner strategy + the AutoTopK optimizer
    * rule (window row_number ≤ k → bounded heaps for k above Spark's
    * windowGroupLimitThreshold) to the session. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cl = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cl.experimental.extraStrategies.contains(TopKStrategy))
      cl.experimental.extraStrategies =
        cl.experimental.extraStrategies :+ TopKStrategy
    if (!cl.experimental.extraOptimizations.contains(graft.plans.AutoTopKRule))
      cl.experimental.extraOptimizations =
        cl.experimental.extraOptimizations :+ graft.plans.AutoTopKRule
  }

  /** Top-k rows per group, ranked 1..k best-first.
    *
    * @param sortCols (column name, descending?) — lexicographic order,
    *                 best row first; include tie-breakers for
    *                 determinism exactly as with a window spec.
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               sortCols: Seq[(String, Boolean)], k: Int,
               rankName: String = "rank"): DataFrame = {
    require(groupCols.nonEmpty && sortCols.nonEmpty && k > 0)
    val spark = df.sparkSession
    install(spark)
    val child = B.analyzedPlan(df)
    def attr(name: String) = child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not in ${child.output.map(_.name)}"))
    val node = TopKPerGroup(
      groupCols.map(attr),
      sortCols.map { case (n, desc) =>
        SortOrder(attr(n), if (desc) Descending else Ascending) },
      k,
      AttributeReference(rankName, IntegerType, nullable = false)(),
      child)
    B.ofRows(spark, node)
  }
}
