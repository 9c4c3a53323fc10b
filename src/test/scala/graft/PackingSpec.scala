package graft

import org.apache.spark.sql.functions._
import graft.ops.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)
    .select($"doc_id", $"n_chars")

  test("slices of each doc sum to its length; packs fill to capacity") {
    val slices = Packing.packSlices(docs, "doc_id", "n_chars", capacity = 2048)
    val perDoc = slices.groupBy($"doc_id").agg(sum($"slice_len").as("s"))
      .join(docs, Seq("doc_id"))
      .filter($"s" =!= $"n_chars").count()
    assert(perDoc == 0)
    // every pack except each bucket's LAST is exactly full
    val packs = slices.groupBy($"bucket", $"pack_id")
      .agg(sum($"slice_len").as("fill"))
    val lastPack = packs.groupBy($"bucket").agg(max($"pack_id").as("last"))
    val partial = packs.join(lastPack, Seq("bucket"))
      .filter($"pack_id" < $"last" && $"fill" =!= 2048L).count()
    assert(partial == 0)
    assert(packs.count() > 8, "expected multiple packs per bucket")
  }

  test("deterministic under repartitioning") {
    val a = Packing.packSlices(docs, "doc_id", "n_chars", 2048)
      .select($"bucket", $"pack_id", $"doc_id", $"slice_start", $"slice_len")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val b = Packing.packSlices(docs.repartition(13), "doc_id", "n_chars", 2048)
      .select($"bucket", $"pack_id", $"doc_id", $"slice_start", $"slice_len")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("one shuffle: the per-bucket window exchange") {
    val plan = Packing.packSlices(docs, "doc_id", "n_chars", 2048)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan.take(1500))
  }

  test("zero-length docs keep one zero-length slice") {
    val d = Seq((1L, 100L), (2L, 0L), (3L, 50L)).toDF("doc_id", "n_chars")
    val slices = Packing.packSlices(d, "doc_id", "n_chars", capacity = 64,
      buckets = 1)
    val z = slices.filter($"doc_id" === 2L)
      .select($"slice_len").as[Long].collect().toSeq
    assert(z == Seq(0L))
    assert(slices.groupBy($"doc_id").count().count() == 3)
  }
}
