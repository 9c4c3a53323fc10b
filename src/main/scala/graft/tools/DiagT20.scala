package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: stage-by-stage timing of t20's boilerplate
  * gram detection at a given sf dir. Dev tooling, not a registered
  * query. */
object DiagT20 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Sessions.local("graft-diag-t20", cpusDefault = "32")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = 3

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"DIAG $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$r")
    }

    val ws = split(col("text"), " ")
    time("scan_split_size")(docs.filter(size(ws) >= n).count())
    time("grams_no_distinct")(docs.filter(size(ws) >= n)
      .select(col("source"),
        explode(transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", slice(ws, i + lit(1), lit(n))))).as("gram"))
      .count())
    time("grams_distinct")(docs.filter(size(ws) >= n)
      .select(col("source"),
        explode(array_distinct(transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", slice(ws, i + lit(1), lit(n)))))).as("gram"))
      .count())
    time("grams_distinct_groupby")(docs.filter(size(ws) >= n)
      .select(col("source"),
        explode(array_distinct(transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", slice(ws, i + lit(1), lit(n)))))).as("gram"))
      .groupBy(col("source"), col("gram")).agg(count(lit(1)).as("df"))
      .count())
    // hash-lane variant: rolling PolyHash over per-word hashes, no gram
    // strings materialized at all
    val wh = transform(ws, w => xxhash64(w))
    time("gramhash_distinct")(docs.filter(size(ws) >= n)
      .select(col("source"),
        explode(array_distinct(transform(sequence(lit(0), size(ws) - n),
          i => aggregate(slice(wh, i + lit(1), lit(n)), lit(1125899906842597L),
            (acc, h) => acc * lit(31L) + h)))).as("gh"))
      .count())
    time("gramhash_groupby")(docs.filter(size(ws) >= n)
      .select(col("source"),
        explode(array_distinct(transform(sequence(lit(0), size(ws) - n),
          i => aggregate(slice(wh, i + lit(1), lit(n)), lit(1125899906842597L),
            (acc, h) => acc * lit(31L) + h)))).as("gh"))
      .groupBy(col("source"), col("gh")).agg(count(lit(1)).as("df"))
      .count())
    time("t20_full")(graft.ops.TextAnalysis.boilerplateGrams(
      docs, "doc_id", "source", "text", n, 0.5).count())
    spark.stop()
  }
}
