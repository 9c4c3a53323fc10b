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
}
