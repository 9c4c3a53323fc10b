package graft

import org.apache.spark.sql.functions._
import graft.ops.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark join spark hash x y z"),
    (2L, "hash hash hash a b"),
    (3L, "nothing relevant here at all"),
    (4L, "join")
  )

  test("bm25 matches a hand-rolled reference on a tiny corpus") {
    val terms = Seq("spark", "hash", "join")
    val got = Retrieval.bm25(corpus.toDF("doc_id", "text"), "doc_id", "text", terms)
      .as[(Long, Int, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // reference: same formula, plain Scala
    val docs = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = docs.size
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    def df(t: String) = docs.values.count(_.contains(t))
    def idf(t: String) = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1)
    def score(id: Long): Double = {
      val ws = docs(id); val dl = ws.size
      terms.map { t =>
        val tf = ws.count(_ == t)
        if (tf == 0) 0.0
        else idf(t) * (tf * (Retrieval.K1 + 1.0)) /
          (tf + Retrieval.K1 * ((1.0 - Retrieval.B) + Retrieval.B * dl / avgdl))
      }.reduceLeft(_ + _)
    }

    assert(got.keySet == Set(1L, 2L, 4L)) // doc 3 matches no term
    for ((id, (dl, s)) <- got) {
      assert(dl == docs(id).size)
      assert(math.abs(s - score(id)) < 1e-12, s"doc $id: $s vs ${score(id)}")
    }
  }

  test("r1 query: 20 rows, non-increasing rounded scores, all docs match a term") {
    val rows = graft.analytics.TextQueries.bm25Search(spark, sfDir)
      .as[(Long, Int, Double)].collect()
    assert(rows.length == 20)
    assert(rows.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(rows.forall(_._3 > 0))
  }

  test("r1 top-k plan is TakeOrdered, not a global window") {
    val df = graft.analytics.TextQueries.bm25Search(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Window"))
  }

  test("index store scores equal the in-flight scan bit-for-bit (r1b ≡ r1)") {
    val terms = Seq("spark", "hash", "join")
    val df = corpus.toDF("doc_id", "text")
    val p = java.nio.file.Files.createTempDirectory("graft_bm25_spec").toString
    // two appends + one REPLAY of the second (must index nothing new)
    assert(Retrieval.appendBm25Index(df.filter($"doc_id" <= 2), "doc_id", "text", p) === 2L)
    assert(Retrieval.appendBm25Index(df.filter($"doc_id" > 2), "doc_id", "text", p) === 2L)
    assert(Retrieval.appendBm25Index(df.filter($"doc_id" > 2), "doc_id", "text", p) === 0L,
      "a replayed batch must index nothing")
    def rows(r: org.apache.spark.sql.DataFrame) =
      r.as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    assert(rows(Retrieval.bm25FromIndex(spark, p, terms)) ===
      rows(Retrieval.bm25(df, "doc_id", "text", terms)))
  }

  test("the index's bucket modulus is pinned by _graft_meta: a foreign N is honored, a missing sidecar fails fast") {
    val terms = Seq("spark", "hash", "join")
    val df = corpus.toDF("doc_id", "text")
    val reference = {
      val p = java.nio.file.Files.createTempDirectory("graft_bm25_meta").toString
      Retrieval.appendBm25Index(df, "doc_id", "text", p)
      Retrieval.bm25FromIndex(spark, p, terms)
        .collect().map(_.toString).sorted.toSeq
    }
    // a store PRE-pinned to a different modulus: both the append and
    // the query must resolve N from the sidecar, not the constant —
    // scores identical, layout under the foreign N
    val p64 = java.nio.file.Files.createTempDirectory("graft_bm25_meta").toString
    graft.etl.StoreMeta.write(spark, s"$p64/postings", 64)
    Retrieval.appendBm25Index(df, "doc_id", "text", p64)
    val buckets = Option(new java.io.File(s"$p64/postings").listFiles())
      .toSeq.flatten.filter(_.getName.startsWith("tb="))
      .map(_.getName.stripPrefix("tb=").toLong)
    assert(buckets.nonEmpty && buckets.forall(_ < 64),
      s"postings must bucket under the pinned N=64, got $buckets")
    assert(Retrieval.bm25FromIndex(spark, p64, terms)
      .collect().map(_.toString).sorted.toSeq === reference)
    // a store with postings but NO sidecar (predates the guard):
    // reading with a guessed modulus would silently mis-prune — fail
    val pRaw = java.nio.file.Files.createTempDirectory("graft_bm25_meta").toString
    Retrieval.appendBm25Index(df, "doc_id", "text", pRaw)
    new java.io.File(s"$pRaw/postings/_graft_meta").delete()
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25FromIndex(spark, pRaw, terms).collect()
    }
    assert(e.getMessage.contains("_graft_meta"))
  }

  test("index query prunes the postings scan to the terms' bucket partitions") {
    val df = corpus.toDF("doc_id", "text")
    val p = java.nio.file.Files.createTempDirectory("graft_bm25_spec").toString
    Retrieval.appendBm25Index(df, "doc_id", "text", p)
    val q = Retrieval.bm25FromIndex(spark, p, Seq("spark"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tb#"),
      "the term-bucket partition filter must reach the scan:\n" + plan.take(1200))
  }

  test("r1b query equals r1 on real data") {
    val r1 = graft.analytics.TextQueries.bm25Search(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val r1b = graft.analytics.TextQueries.bm25FromStore(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(r1b === r1)
    assert(r1.nonEmpty)
  }

  test("st20 streamed index equals r1 through 4 real micro-batches") {
    val r1 = graft.analytics.TextQueries.bm25Search(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val st20 = graft.analytics.StreamQueries.streamBm25Index(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(st20 === r1)
  }

  test("hybrid RRF fuses lane ranks; single-lane docs carry null ranks") {
    val terms = Seq("spark", "hash", "join")
    val docs = corpus.toDF("doc_id", "text")
    val embs = Seq(
      0L -> Seq(1.0f, 0.0f), // probe
      1L -> Seq(1.0f, 0.0f),
      2L -> Seq(0.5f, 0.5f),
      3L -> Seq(0.0f, 1.0f),
      4L -> Seq(0.9f, 0.1f)).toDF("vec_id", "embedding")

    val out = Retrieval.hybridRrf(docs, embs, "doc_id", "text",
        "vec_id", "embedding", terms, probeId = 0L)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Int]),
        Option(r.get(2)).map(_.asInstanceOf[Int]),
        r.getDouble(3), r.getInt(4))).toList

    // expected lexical ranks from the (independently verified) bm25,
    // on the same 4dp grid the operator ranks on
    val lexRanks = Retrieval.bm25(docs, "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0),
        math.floor(r.getDouble(2) * 1e4 + 0.5) / 1e4))
      .sortBy { case (id, s) => (-s, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    // dense ranks by hand: cos vs [1,0] -> 1:1.0, 4:~0.9939,
    // 2:~0.7071, 3:0.0 (probe 0 excluded)
    val denseRanks = Map(1L -> 1, 4L -> 2, 2L -> 3, 3L -> 4)
    def rrf(id: Long) =
      lexRanks.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
      denseRanks.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
    val expected = (lexRanks.keySet ++ denseRanks.keySet).toSeq
      .sortBy(id => (-rrf(id), id)).zipWithIndex
      .map { case (id, i) => (id, lexRanks.get(id), denseRanks.get(id),
        math.floor(rrf(id) * 1e6 + 0.5) / 1e6, i + 1) }.toList

    assert(lexRanks.keySet == Set(1L, 2L, 4L)) // doc 3 is dense-only
    assert(out === expected)
  }

  test("r2 plan: no window anywhere — bounded ranks come from the comparison join") {
    val df = graft.analytics.TextQueries.hybridRrf(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1500))
    assert(df.count() == 20)
  }
}
