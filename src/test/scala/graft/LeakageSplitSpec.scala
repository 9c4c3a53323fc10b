package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

class LeakageSplitSpec extends SparkSpec {
  import spark.implicits._

  private val fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  // 30 docs; components: {1,2,3}, {10,11}, rest singletons
  private def docs = (0L until 30L).toDF("doc_id")
  private def comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
    .toDF("node", "component")

  test("no duplicate group straddles splits") {
    val out = Sampling.leakageFreeSplit(docs, "doc_id", comps, fractions)
    val perGroup = out.where($"in_dup_group")
      .groupBy($"split_root").agg(countDistinct($"split").as("n"))
      .as[(Long, Long)].collect()
    assert(perGroup.nonEmpty && perGroup.forall(_._2 == 1L), perGroup.toSeq)
  }

  test("singletons match plain splitLabel on their own id") {
    val out = Sampling.leakageFreeSplit(docs, "doc_id", comps, fractions)
      .where(!$"in_dup_group")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val plain = docs
      .withColumn("split", Sampling.splitLabel($"doc_id", fractions))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(out.nonEmpty && out.forall { case (id, s) => plain(id) == s })
  }

  test("group members inherit the ROOT's split") {
    val out = Sampling.leakageFreeSplit(docs, "doc_id", comps, fractions)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val rootSplit = docs
      .withColumn("split", Sampling.splitLabel($"doc_id", fractions))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(out(2L) == rootSplit(1L) && out(3L) == rootSplit(1L) &&
      out(11L) == rootSplit(10L))
  }

  test("deterministic across partitionings; salt changes the split") {
    val a = Sampling.leakageFreeSplit(docs, "doc_id", comps, fractions)
      .select($"doc_id", $"split").as[(Long, String)].collect().toSet
    val b = Sampling.leakageFreeSplit(docs.repartition(7), "doc_id",
        comps.repartition(3), fractions)
      .select($"doc_id", $"split").as[(Long, String)].collect().toSet
    assert(a == b)
    val c = Sampling.leakageFreeSplit(docs, "doc_id", comps, fractions,
        salt = "v2")
      .select($"doc_id", $"split").as[(Long, String)].collect().toSet
    assert(a != c)
  }
}
