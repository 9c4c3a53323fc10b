package graft

import org.apache.spark.sql.functions._
import graft.ops.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)
    .select($"doc_id", $"n_chars")

  test("slices of each doc sum to its length; packs fill to capacity") {
    val slices = Packing.packSlices(docs, "doc_id", "n_chars", capacity = 2048,
      buckets = Packing.sizedBuckets(docs, 64))
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
    val a = Packing.packSlices(docs, "doc_id", "n_chars", 2048,
        Packing.sizedBuckets(docs, 64))
      .select($"bucket", $"pack_id", $"doc_id", $"slice_start", $"slice_len")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val b = Packing.packSlices(docs.repartition(13), "doc_id", "n_chars", 2048,
        Packing.sizedBuckets(docs, 64))
      .select($"bucket", $"pack_id", $"doc_id", $"slice_start", $"slice_len")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("one shuffle: the per-bucket window exchange") {
    val plan = Packing.packSlices(docs, "doc_id", "n_chars", 2048,
      Packing.sizedBuckets(docs, 64))
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

  test("shard count is data-sized: grows with input, never below 1") {
    val d100 = spark.range(100).select($"id".as("doc_id"), lit(10L).as("n_chars"))
    val d1000 = spark.range(1000).select($"id".as("doc_id"), lit(10L).as("n_chars"))
    assert(Packing.sizedBuckets(d100, 64) == 2)   // ceil(100/64)
    assert(Packing.sizedBuckets(d1000, 64) == 16) // ceil(1000/64)
    assert(Packing.sizedBuckets(d100.limit(1), 64) == 1)
    // the derived count feeds through: 10x docs => ~10x shards, so the
    // per-shard window sort stays bounded as the corpus grows
    val s1000 = Packing.packSlices(d1000, "doc_id", "n_chars", 64,
      Packing.sizedBuckets(d1000, 64))
    assert(s1000.select($"bucket").distinct().count() == 16)
  }
}
