package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Pins ops.Dedup.mergeComponentLabels: root-contraction incremental
  * connected components — merge cases, min-id canonicality, and the
  * incremental ≡ rebuild law d6b gates on. */
class IncrementalCcSpec extends SparkSpec {
  import spark.implicits._

  private def edges(ps: (Long, Long)*) = ps.toDF("id_a", "id_b")

  private def labelsOf(ps: (Long, Long)*) =
    Dedup.connectedComponents(edges(ps: _*), "id_a", "id_b")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long)].collect().toMap

  test("delta edge merges two existing components to the global min id") {
    val store = labelsOf((1L, 2L), (3L, 4L))
    val merged = asMap(Dedup.mergeComponentLabels(
      store, edges((2L, 3L)), "id_a", "id_b"))
    assert(merged == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("brand-new chain enters at its own min; store untouched") {
    val store = labelsOf((1L, 2L))
    val merged = asMap(Dedup.mergeComponentLabels(
      store, edges((10L, 11L), (11L, 12L)), "id_a", "id_b"))
    assert(merged == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("already-connected delta edge is a no-op") {
    val store = labelsOf((1L, 2L), (2L, 3L))
    val merged = asMap(Dedup.mergeComponentLabels(
      store, edges((1L, 3L)), "id_a", "id_b"))
    assert(merged == asMap(store))
  }

  test("new node attaching to a non-root member re-roots at the component min") {
    val store = labelsOf((1L, 2L), (2L, 3L))
    val merged = asMap(Dedup.mergeComponentLabels(
      store, edges((3L, 99L)), "id_a", "id_b"))
    assert(merged == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 99L -> 1L))
  }

  test("new bridge node merging three components via two delta edges") {
    val store = labelsOf((1L, 2L), (5L, 6L))
    val merged = asMap(Dedup.mergeComponentLabels(
      store, edges((2L, 9L), (9L, 6L)), "id_a", "id_b"))
    assert(merged.values.toSet == Set(1L) && merged.keySet ==
      Set(1L, 2L, 5L, 6L, 9L))
  }

  test("incremental ≡ rebuild under a random split of a random graph") {
    val rnd = new scala.util.Random(42)
    val all = (0 until 300).map(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct
    val (base, delta) = all.partition(p => (p._1 + p._2) % 3 != 0)
    val store = Dedup.connectedComponents(
      base.toDF("id_a", "id_b"), "id_a", "id_b")
    val inc = asMap(Dedup.mergeComponentLabels(
      store, delta.toDF("id_a", "id_b"), "id_a", "id_b"))
    val full = asMap(Dedup.connectedComponents(
      all.toDF("id_a", "id_b"), "id_a", "id_b"))
    assert(inc == full)
  }

  test("d6b rehearsal: incremental components equal the batch d6 rebuild") {
    val d6b = SparkEntry.queries("d6b_incremental_components")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val d6 = SparkEntry.queries("d6_neardup_components")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(d6b == d6)
    assert(d6b.nonEmpty)
  }
}
