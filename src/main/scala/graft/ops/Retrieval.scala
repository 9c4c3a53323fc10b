package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword ranked retrieval (TF-IDF / BM25) over a document corpus —
  * the inverted-index workload of a training-data pipeline (e.g.
  * targeted corpus slicing: "pull the top-k docs per seed query").
  *
  * Scale shape: the token explode is filtered to the query terms
  * BEFORE the aggregation, so the big shuffle carries only query-term
  * hits (a tiny fraction of token volume); document frequencies are a
  * |terms|-row aggregate joined back by broadcast; corpus stats (N,
  * total length) are one scalar row cross-joined by broadcast; the
  * final top-k is orderBy+limit = TakeOrderedAndProject (per-partition
  * partial top-k, NO single-partition window). Everything is codegen'd
  * column arithmetic — no UDFs.
  */
object Retrieval {

  val K1: Double = 1.2
  val B: Double  = 0.75

  /** BM25 scores for a fixed query-term set; returns one row per doc
    * matching ≥1 term: (doc_id, dl, score), score summed over terms in
    * the FIXED order of `terms` (float addition is not associative;
    * the pivot-then-fixed-sum keeps the result engine-portable). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = K1, b: Double = B): DataFrame = {
    val base = docs.select(
      col(idCol).as("doc_id"),
      split(col(textCol), " ").as("ws"))
      .withColumn("dl", size(col("ws")))
    val stats = base.agg(
      count(lit(1)).as("n"),
      sum(col("dl")).as("sumdl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("ws")).as("w"))
      .filter(col("w").isin(terms: _*))   // prune before the shuffle
      .groupBy(col("doc_id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val avgdl = col("sumdl").cast("double") / col("n")
    // idf = ln((N - df + 0.5) / (df + 0.5) + 1)  [the standard
    // "+1" BM25 idf, always positive]
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1)
    val sco = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    val perTerm = tf
      .join(broadcast(df), Seq("w"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"), col("w"), sco.as("sco"))
    val score = terms.map(t => coalesce(col(s"`$t`"), lit(0.0)))
      .reduceLeft(_ + _) // fixed association order
    perTerm
      .groupBy(col("doc_id"), col("dl"))
      .pivot(col("w"), terms)
      .agg(sum(col("sco")))
      .withColumn("score", score)
      .select(col("doc_id"), col("dl"), col("score"))
  }
}
