package graft

import graft.ops.Retrieval

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // probe at [1,0]; docs 1 and 2 form a tight cluster +45 degrees off
  // the probe, doc 3 sits -45 degrees off (same relevance as 1,
  // orthogonal to the cluster)
  private val embs = Seq(
    0L -> Seq(1.0f, 0.0f),
    1L -> Seq(1.0f, 1.0f),
    2L -> Seq(0.99f, 1.01f),
    3L -> Seq(1.0f, -1.0f)).toDF("vec_id", "embedding")

  test("greedy diversifies: the near-duplicate of pick 1 is deferred") {
    val out = Retrieval.mmrRerank(embs, "vec_id", "embedding",
        probeId = 0L, laneK = 10, m = 3)
      .select("sel_rank", "doc_id").as[(Int, Long)].collect().toList
    // pick 1: rel tie between 1 and 3 -> smaller id; pick 2: doc 3
    // (doc 2 is ~parallel to pick 1 and pays the redundancy penalty);
    // pick 3: the deferred duplicate
    assert(out == List(1 -> 1L, 2 -> 3L, 3 -> 2L))
  }

  test("m caps the selection; scores are monotone non-increasing") {
    val out = Retrieval.mmrRerank(embs, "vec_id", "embedding",
        probeId = 0L, laneK = 10, m = 2)
      .select("sel_rank", "mmr").as[(Int, Double)].collect().sortBy(_._1)
    assert(out.length == 2)
    // the first greedy pick always scores at least the second
    assert(out(0)._2 >= out(1)._2)
  }

  test("rel and mmr sit on the 1e-6 grid") {
    Retrieval.mmrRerank(embs, "vec_id", "embedding", 0L, 10, 3)
      .select("rel", "mmr").as[(Double, Double)].collect().foreach {
        case (a, b) =>
          assert(a == math.floor(a * 1e6 + 0.5) / 1e6)
          assert(b == math.floor(b * 1e6 + 0.5) / 1e6)
      }
  }
}
