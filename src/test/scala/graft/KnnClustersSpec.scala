package graft

import org.apache.spark.sql.functions._
import graft.analytics.VectorQueries

/** knn2 — semantic clustering over the k-NN graph: partition
  * properties plus agreement with an independent driver-side
  * union-find over the same thresholded edge set. */
class KnnClustersSpec extends SparkSpec {
  import spark.implicits._

  test("knn2 clusters partition the corpus with min-id survivors") {
    val n = Tables.embeddings(spark, sfDir).count()
    val rows = VectorQueries.knnClusters(spark, sfDir)
      .select($"cluster", $"n_members", $"keep_id")
      .as[(Long, Long, Long)].collect()
    assert(rows.map(_._2).sum === n, "clusters partition the corpus")
    assert(rows.forall(r => r._3 == r._1),
      "keep-min-id survivor == the min-label component id")
    assert(rows.exists(_._2 > 1), "a real multi-member cluster exists")
    assert(rows.exists(_._2 == 1), "singletons survive as their own clusters")
  }

  test("knn2 equals a plain-Scala union-find over the same cut") {
    val edges = graft.ops.Similarity.knnGraphIvfSeeded(
        Tables.embeddings(spark, sfDir),
        VectorQueries.IvfSeedIds, k = 5, nProbe = 3)
      .select($"vec_id", $"nbr_id",
        (floor(col("cosine") * 10000 + 0.5) / 10000).as("h"))
      .as[(Long, Long, Double)].collect()
    val topK = math.ceil(0.1 * edges.length).toInt
    val thr = edges.map(_._3).sorted(Ordering[Double].reverse)
      .take(topK).last
    val strong = edges.filter(_._3 >= thr)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    strong.foreach { case (a, b, _) => union(a, b) }
    val ids = Tables.embeddings(spark, sfDir)
      .select($"vec_id").as[Long].collect()
    val expected = ids.groupBy(find).map { case (root, members) =>
      (root, members.length.toLong, members.min)
    }.toSet
    val got = VectorQueries.knnClusters(spark, sfDir)
      .select($"cluster", $"n_members", $"keep_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected)
  }
}
