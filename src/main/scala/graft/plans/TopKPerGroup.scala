package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.IntegerType

/** Custom whole-operator: top-k rows per group with rank (SURVEY §2.5
  * W5 — per-cluster / per-supplier top-k), as a native Catalyst
  * operator instead of window `row_number() <= k`.
  *
  * Why a custom operator (path (c)): a naive window shuffles EVERY row
  * to its group's partition and sorts entire groups before discarding
  * all but k. This operator runs a bounded heap BEFORE the exchange —
  * each map partition emits at most k rows per group it sees — so the
  * shuffle carries ≤ k·groups·partitions rows regardless of input
  * size, and no full sort ever happens.
  *
  * Honest scope (measured in TopKSpec): since Spark 3.5 the
  * InferWindowGroupLimit rule gives `row_number() <= k` windows the
  * same map-side partial limiting when k <
  * spark.sql.optimizer.windowGroupLimitThreshold (default 1000), so
  * for small k the two forms shuffle the same few rows and bench at
  * parity. The operator's win is the regime the built-in rule
  * declines: large k (top-10k-per-group sampling, k over the
  * threshold), where the window reverts to shuffling every input row
  * while this operator keeps the k·groups·partitions bound — the
  * measured gap at k=2000 over 5 groups is >4× shuffle volume. It also
  * avoids the reduce-side per-group sort (heaps truncate instead).
  *
  * Components: [[TopKPerGroup]] logical node → [[TopKStrategy]] planner
  * strategy → [[PartialTopKExec]] (map-side, no distribution
  * requirement) + [[FinalTopKExec]] (requires clustering on the group
  * keys; Spark inserts the exchange). Register via
  * `spark.experimental.extraStrategies` (TopK.install) or
  * [[GraftExtensions]] for config-based injection.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    sortExprs: Seq[SortOrder], // proper expressions so pruning sees them
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rank originates here, not from the child (else CheckAnalysis flags
  // it as a missing input attribute)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Shared heap logic for both phases. */
private[plans] object TopKHeap {

  /** Best-first comparator over evaluated sort-key arrays — null-aware,
    * honoring each SortOrder's null ordering exactly as a window sort
    * would (asc defaults NullsFirst, desc defaults NullsLast). Exposes
    * [[compareKeys]] so the hot loop can probe without allocating a
    * tuple per row. sortTypes: (dataType, descending?, nullsFirst?). */
  final class Cmp(sortTypes: Seq[(org.apache.spark.sql.types.DataType, Boolean, Boolean)])
      extends java.util.Comparator[(Array[Any], InternalRow)] {
    private val orderings =
      sortTypes.map { case (dt, _, _) => TypeUtils.getInterpretedOrdering(dt) }.toArray
    private val desc = sortTypes.map(_._2).toArray
    private val nullsFirst = sortTypes.map(_._3).toArray
    def compareKeys(a: Array[Any], b: Array[Any]): Int = {
      var i = 0
      while (i < orderings.length) {
        val x = a(i); val y = b(i)
        // null ordering is expressed in OUTPUT order (first = best), so
        // it applies after the direction flip, not before
        val c =
          if (x == null && y == null) 0
          else if (x == null) { if (nullsFirst(i)) -1 else 1 }
          else if (y == null) { if (nullsFirst(i)) 1 else -1 }
          else {
            val c0 = orderings(i).compare(x, y)
            if (desc(i)) -c0 else c0
          }
        if (c != 0) return c
        i += 1
      }
      0
    }
    override def compare(a: (Array[Any], InternalRow),
                         b: (Array[Any], InternalRow)): Int =
      compareKeys(a._1, b._1)
  }

  def comparator(sortExprs: Seq[SortOrder]): Cmp =
    new Cmp(sortExprs.map { so =>
      (so.child.dataType,
        so.direction == org.apache.spark.sql.catalyst.expressions.Descending,
        so.nullOrdering == org.apache.spark.sql.catalyst.expressions.NullsFirst)
    })

  /** Consume rows, retaining the best k per group key. Returns the
    * per-group retained rows ordered best-first. */
  def topKPerGroup(
      rows: Iterator[InternalRow],
      groupProj: UnsafeProjection,
      sortEvals: Array[InternalRow => Any],
      cmp: Cmp,
      k: Int): Iterator[(InternalRow, Seq[(Array[Any], InternalRow)])] = {
    val groups = new java.util.LinkedHashMap[InternalRow,
      java.util.PriorityQueue[(Array[Any], InternalRow)]]()
    // PriorityQueue with REVERSED comparator: head = worst retained row
    val worstFirst = cmp.reversed()
    val n = sortEvals.length
    // keys land in a reused scratch array; copied only when retained
    val scratch = new Array[Any](n)
    rows.foreach { row =>
      var i = 0
      while (i < n) { scratch(i) = sortEvals(i)(row); i += 1 }
      // probe with the projection's reused buffer; copy only on first sight
      val probeKey = groupProj(row)
      var heap = groups.get(probeKey)
      if (heap == null) {
        heap = new java.util.PriorityQueue[(Array[Any], InternalRow)](k + 1, worstFirst)
        groups.put(probeKey.copy(), heap)
      }
      val retain =
        if (heap.size < k) true
        else if (cmp.compareKeys(scratch, heap.peek()._1) < 0) { heap.poll(); true }
        else false
      if (retain) {
        // non-primitive values (UTF8String/Decimal/ArrayData) evaluated off
        // the iterator's reused row alias its buffer — deep-copy on retention
        val keys = new Array[Any](n)
        var j = 0
        while (j < n) { keys(j) = InternalRow.copyValue(scratch(j)); j += 1 }
        heap.add((keys, row.copy()))
      }
    }
    import scala.jdk.CollectionConverters._
    groups.entrySet().iterator().asScala.map { e =>
      val sorted = e.getValue.toArray(
        Array.empty[(Array[Any], InternalRow)]).sorted(
        scala.math.Ordering.comparatorToOrdering(cmp: java.util.Comparator[(Array[Any], InternalRow)]))
      (e.getKey, sorted.toSeq)
    }
  }
}

/** Map-side phase: bounded heaps per group within each partition. */
case class PartialTopKExec(
    groupExprs: Seq[Expression],
    sortExprs: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val g = groupExprs; val s = sortExprs; val kk = k; val childOut = child.output
    child.execute().mapPartitions { it =>
      val groupProj = UnsafeProjection.create(g, childOut)
      val evals: Array[InternalRow => Any] = s.map { so =>
        val bound = org.apache.spark.sql.catalyst.expressions.BindReferences
          .bindReference(so.child, childOut)
        (r: InternalRow) => bound.eval(r)
      }.toArray
      val cmp = TopKHeap.comparator(s)
      TopKHeap.topKPerGroup(it, groupProj, evals, cmp, kk)
        .flatMap(_._2.map(_._2))
    }
  }
  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)
}

/** Reduce-side phase: complete groups (clustered), final heap + rank. */
case class FinalTopKExec(
    groupExprs: Seq[Expression],
    sortExprs: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val g = groupExprs; val s = sortExprs; val kk = k; val childOut = child.output
    child.execute().mapPartitions { it =>
      val groupProj = UnsafeProjection.create(g, childOut)
      val evals: Array[InternalRow => Any] = s.map { so =>
        val bound = org.apache.spark.sql.catalyst.expressions.BindReferences
          .bindReference(so.child, childOut)
        (r: InternalRow) => bound.eval(r)
      }.toArray
      val cmp = TopKHeap.comparator(s)
      val joined = new JoinedRow()
      // downstream operators may expect UnsafeRow — project explicitly
      val toUnsafe = UnsafeProjection.create(
        (childOut :+ rankAttr).map(_.dataType).toArray)
      TopKHeap.topKPerGroup(it, groupProj, evals, cmp, kk).flatMap {
        case (_, rows) =>
          rows.iterator.zipWithIndex.map { case ((_, row), i) =>
            val rankRow = new GenericInternalRow(Array[Any](i + 1))
            toUnsafe(joined(row, rankRow)).asInstanceOf[InternalRow]
          }
      }
    }
  }
  override protected def withNewChildInternal(newChild: SparkPlan): FinalTopKExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, s, k, rank, child) =>
      FinalTopKExec(g, s, k, rank,
        PartialTopKExec(g, s, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** The engine's SQL-function surface: the native codegen expressions
  * exposed by name, so `spark.sql("SELECT polyhash(w) ...")` works on
  * any session that loads [[GraftExtensions]] (or calls
  * [[GraftFunctions.register]] on an existing session). */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
  import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}
  import graft.functions.{DotProduct, PolyHash, ShapeFingerprint}

  type Description =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "", "", "", "", "", "", "built-in")

  val descriptions: Seq[Description] = Seq(
    (FunctionIdentifier("polyhash"),
      info(classOf[PolyHash], "polyhash",
        "polyhash(str) - portable 60-bit polynomial string hash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "polyhash(str) takes one argument")
        PolyHash(Cast(args.head, StringType))
      }),
    (FunctionIdentifier("shape_fingerprint"),
      info(classOf[ShapeFingerprint], "shape_fingerprint",
        "shape_fingerprint(str) - rolling hash over word lengths"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "shape_fingerprint(str) takes one argument")
        ShapeFingerprint(Cast(args.head, StringType))
      }),
    (FunctionIdentifier("dot_product"),
      info(classOf[DotProduct], "dot_product",
        "dot_product(a, b) - native array<double> dot product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b) takes two arguments")
        DotProduct(Cast(args(0), ArrayType(DoubleType)),
          Cast(args(1), ArrayType(DoubleType)))
      }))

  /** Register on an already-built session (the non-extensions path). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptions.foreach { case (ident, _, builder) =>
      org.apache.spark.sql.GraftColumnBridge
        .registerExprFunction(spark, ident.funcName, builder)
    }
}

/** Config-based injection:
  * spark.sql.extensions=graft.plans.GraftExtensions */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectOptimizerRule(_ => AutoTopKRule)
    GraftFunctions.descriptions.foreach(e.injectFunction)
  }
}
