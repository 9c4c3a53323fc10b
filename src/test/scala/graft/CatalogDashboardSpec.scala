package graft

import org.apache.spark.sql.functions._
import graft.analytics.Dashboard

class CatalogDashboardSpec extends SparkSpec {
  import spark.implicits._

  test("catalog: SQL runs over registered testdata views") {
    Catalog.registerTestdata(spark, sfDir)
    val n = spark.sql(
      """SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""")
      .head.getLong(0)
    assert(n == Tables.lineitem(spark, sfDir).count())
    // events view carries the normalized timestamp type
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema.head.dataType.typeName == "timestamp")
  }

  test("catalog: SQL runs over pipeline-output warehouse views") {
    val out = java.nio.file.Files.createTempDirectory("cat").toString
    // run the pipeline pieces inline (main spawns its own session)
    val raw = graft.etl.Transcripts.readRaw(spark,
      getClass.getResource("/transcripts").getPath + "/*.json")
    val utterances = graft.etl.Transcripts.flatten(graft.etl.Transcripts.valid(raw))
    utterances.write.mode("overwrite").parquet(s"$out/oa_text")
    val chunks = new graft.etl.HashingEmbedder(32)
      .embed(graft.etl.Transcripts.sectionChunks(utterances), "chunk_text", "vector")
    chunks.write.mode("overwrite").parquet(s"$out/document_chunk_embeddings")
    chunks.limit(1).write.mode("overwrite").parquet(s"$out/transcript_embeddings")
    utterances.limit(1).write.mode("overwrite").parquet(s"$out/gold_speaker_analytics")
    utterances.limit(1).write.mode("overwrite").parquet(s"$out/gold_oral_arguments_analytics")

    Catalog.registerPipelineOutputs(spark, out)
    val counts = spark.sql(
      """SELECT case_id, count(*) AS n FROM oa_text GROUP BY case_id ORDER BY case_id""")
      .as[(String, Long)].collect().toMap
    assert(counts("1981_plyler-v-doe") == 4)
    assert(spark.sql("SELECT size(vector) FROM document_chunk_embeddings LIMIT 1")
      .head.getInt(0) == 32)
  }

  test("catalog: registered SQL functions work over views") {
    Catalog.registerTestdata(spark, sfDir)
    Catalog.registerFunctions(spark)
    val sims = spark.sql(
      """SELECT a.vec_id, vec_cosine(a.embedding, b.embedding) AS sim,
        |  vec_norm(a.embedding) AS n
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id
        |LIMIT 5""".stripMargin).collect()
    sims.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9) // self-cosine = 1
      assert(r.getDouble(2) > 0)
    }
    val wm = spark.sql(
      """SELECT label, vec_weighted_mean(embedding, CAST(1.0 AS DOUBLE)) AS m
        |FROM embeddings GROUP BY label""".stripMargin)
    assert(wm.count() == 10)
    assert(spark.sql("SELECT token_count('hello, world!')").head.getInt(0) == 4)
    assert(spark.sql("SELECT word_count('hello, world!')").head.getInt(0) == 2)
  }

  test("dashboard: histogram, term comparison, default terms") {
    val results = Seq(
      ("1981", "c1", 0, 100L), ("1981", "c2", 0, 200L), ("1981", "c3", -1, 50L),
      ("1990", "c4", 1, 300L), ("1990", "c5", 2, 400L)
    ).toDF("term_year", "case_id", "cluster", "total_tokens")

    val hist = Dashboard.clusterSizeHistogram(results)
      .as[(Int, Long, Boolean)].collect().toList
    assert(hist.contains((-1, 1L, true)) && hist.contains((0, 2L, false)))

    val tc = Dashboard.termComparison(results).collect()
    val r1981 = tc.find(_.getString(0) == "1981").get
    assert(r1981.getAs[Long]("n_cases") == 3)
    assert(r1981.getAs[Long]("n_clusters") == 1)
    assert(math.abs(r1981.getAs[Double]("noise_pct") - 33.33) < 0.01)
    assert(tc.head.getString(0) == "1990") // desc order

    assert(Dashboard.defaultTerms(results, 1).as[String].head() == "1990")
  }
}
