package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.analytics.VectorQueries.IvfSeedIds

/** knn1b — the persisted k-NN graph store: append must (a) never
  * touch stored files, (b) sign ONLY the delta (the stored members
  * arrive pre-assigned from parquet — the plan carries exactly one
  * quantizer expression, on the probe side), and (c) leave the edge
  * table equal to its two-generation rebuild: base anchors against
  * the base corpus, delta anchors against the corpus-so-far. */
class KnnGraphStoreSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, sfDir)
  private def base = corpus.filter(col("vec_id") % 10 =!= 3)
  private def delta = corpus.filter(col("vec_id") % 10 === 3)

  private lazy val store: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_knnstore_spec").toString
    Similarity.writeKnnGraphStore(base, p, IvfSeedIds, k = 5, nProbe = 3)
    p
  }

  private def listParts(p: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
    try s.iterator().asScala
      .filter(f => java.nio.file.Files.isRegularFile(f) &&
        f.getFileName.toString.endsWith(".parquet"))
      .map(f => f.toString -> java.nio.file.Files.getLastModifiedTime(f).toMillis)
      .toMap
    finally s.close()
  }

  test("append adds files without touching stored members or edges") {
    val before = listParts(s"$store/members") ++ listParts(s"$store/edges")
    Similarity.appendKnnGraph(delta, store, k = 5, nProbe = 3)
    val after = listParts(s"$store/members") ++ listParts(s"$store/edges")
    assert(before.keySet.subsetOf(after.keySet), "append must not delete")
    assert(before.forall { case (f, t) => after(f) == t },
      "append must not rewrite stored files")
    assert(after.size > before.size, "the delta must add files")
  }

  test("appended store equals the two-generation rebuild") {
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("nbr_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val got = norm(spark.read.parquet(s"$store/edges"))
    val baseEdges = norm(
      Similarity.knnGraphIvfSeeded(base, IvfSeedIds, k = 5, nProbe = 3))
    // delta anchors see the full corpus: the append ran after the
    // delta's member rows landed, exactly like a rebuild would
    val deltaEdges = norm(
      Similarity.knnGraphIvfSeeded(corpus, IvfSeedIds, k = 5, nProbe = 3)
        .filter(col("vec_id") % 10 === 3))
    assert(got === (baseEdges ++ deltaEdges))
    // every delta anchor acquired neighbors (its own list is probed
    // and holds at least the base members near it)
    val deltaIds = delta.select($"vec_id").as[Long].collect().toSet
    assert(deltaIds.subsetOf(got.map(_._1)))
  }

  test("delta append signs only the delta — members come pre-assigned") {
    val de = Similarity.deltaKnnEdges(delta, store, k = 5, nProbe = 3,
      idCol = "vec_id", vecCol = "embedding")
    val quantizerExprs = de.queryExecution.analyzed.collect { case n =>
      n.expressions.flatMap(_.collect {
        case x: graft.functions.NearestCentroid => x
        case y: graft.functions.NearestCentroidsTopN => y
      })
    }.flatten
    assert(quantizerExprs.count(
      _.isInstanceOf[graft.functions.NearestCentroidsTopN]) == 1,
      "exactly one probe-side quantizer (the delta's nearestN)")
    assert(!quantizerExprs.exists(
      _.isInstanceOf[graft.functions.NearestCentroid]),
      "stored members must never be re-signed on append")
  }
}
