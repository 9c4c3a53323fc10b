package graft.tools

import org.apache.spark.sql.functions._

/** Stage-by-stage timing of j11's prefix-filter join (dev tool):
  * which stage carries the 100×-point cost. */
object DiagJ11 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("diag-j11")
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val threshold = 0.7
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, dir)
    val toks = t("toks materialize") {
      val x = docs.select(col("doc_id").as("__id"),
          graft.ops.Dedup.shingles(col("text"), 3).as("__sh"))
        .filter(size(col("__sh")) > 0)
        .select(col("__id"), size(col("__sh")).as("__sz"), explode(col("__sh")).as("__s"))
        .select(col("__id"), col("__sz"), xxhash64(col("__s")).as("__tok"))
        .localCheckpoint()
      println("[diag] tok rows = " + x.count()); x
    }
    val freq = t("freq agg (materialize)") {
      val f = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__df")).localCheckpoint()
      println("[diag] vocab = " + f.count()); f
    }
    val prefix = t("rank window + prefix") {
      val r = toks.join(freq, "__tok")
        .withColumn("__rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("__id")).orderBy(col("__df"), col("__tok"))))
        .withColumn("__p", col("__sz") - ceil(col("__sz") * lit(threshold)) + lit(1))
        .filter(col("__rk") <= col("__p"))
        .select(col("__tok"), col("__id"), col("__sz"))
        .localCheckpoint()
      println("[diag] prefix rows = " + r.count()); r
    }
    val cand = t("candidate join + distinct") {
      val a = prefix.select(col("__tok"), col("__id").as("id_a"), col("__sz").as("sz_a"))
      val b = prefix.select(col("__tok"), col("__id").as("id_b"), col("__sz").as("sz_b"))
      val c = a.join(b, "__tok")
        .filter(col("id_a") < col("id_b") &&
          col("sz_b") * lit(threshold) <= col("sz_a") &&
          col("sz_a") * lit(threshold) <= col("sz_b"))
        .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
        .distinct().localCheckpoint()
      println("[diag] candidates = " + c.count()); c
    }
    t("verify") {
      val ta = toks.select(col("__id").as("id_a"), col("__tok"))
      val tb = toks.select(col("__id").as("id_b"), col("__tok"))
      val n = cand.join(ta, "id_a").join(tb, Seq("id_b", "__tok"))
        .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
        .agg(count(lit(1)).as("__int"))
        .withColumn("jaccard", col("__int").cast("double") /
          (col("sz_a") + col("sz_b") - col("__int")))
        .filter(col("jaccard") >= threshold).count()
      println("[diag] verified pairs = " + n)
    }
    spark.stop()
  }
}
