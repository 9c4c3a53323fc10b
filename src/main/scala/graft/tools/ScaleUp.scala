package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-curve data generator: writes an N× upscaled copy of an
  * sf-dir so the bench can be run at two scales and per-query scaling
  * factors measured (PERFORMANCE.md "Scaling curve"). Local dev/bench
  * tooling — not part of any registered query plan.
  *
  * Replication is key-shifted per replica so the workload SHAPE is
  * preserved, not degenerated:
  *  - fact keys shift by `replica * STRIDE` (FK edges orders↔lineitem,
  *    customer↔orders, part/supplier↔lineitem stay consistent within a
  *    replica; dims region/nation are NOT replicated, like real dims);
  *  - document text gets a per-replica suffix appended to EVERY token,
  *    so no shingle survives across replicas: near-dup structure within
  *    a replica is preserved exactly, and no spurious cross-replica
  *    near-dup pairs appear (those would make dedup candidate counts
  *    quadratic in N for data reasons, not engine reasons);
  *  - embeddings get a deterministic per-replica epsilon on one
  *    component — distinct vectors, near-identical geometry;
  *  - event ids/user ids shift, timestamps keep their distribution.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <outDir> <factor>
  */
object ScaleUp {
  private val Stride = 100000000L

  private def replicate(df: DataFrame, n: Int)(per: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until n).map(r => per(df, r)).reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val n = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // dims: copied once
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    def shift(c: String, r: Int) = col(c) + lit(r.toLong * Stride)

    wr(replicate(rd("customer"), n) { (df, r) =>
      df.withColumn("c_custkey", shift("c_custkey", r))
    }, "customer")
    wr(replicate(rd("supplier"), n) { (df, r) =>
      df.withColumn("s_suppkey", shift("s_suppkey", r))
    }, "supplier")
    wr(replicate(rd("part"), n) { (df, r) =>
      df.withColumn("p_partkey", shift("p_partkey", r))
    }, "part")
    wr(replicate(rd("orders"), n) { (df, r) =>
      df.withColumn("o_orderkey", shift("o_orderkey", r))
        .withColumn("o_custkey", shift("o_custkey", r))
    }, "orders")
    wr(replicate(rd("lineitem"), n) { (df, r) =>
      df.withColumn("l_orderkey", shift("l_orderkey", r))
        .withColumn("l_partkey", shift("l_partkey", r))
        .withColumn("l_suppkey", shift("l_suppkey", r))
    }, "lineitem")
    wr(replicate(rd("events"), n) { (df, r) =>
      df.withColumn("event_id", shift("event_id", r))
        .withColumn("user_id", shift("user_id", r))
    }, "events")
    // every token suffixed per replica → zero shared shingles across
    // replicas, identical shingle structure within one
    wr(replicate(rd("documents"), n) { (df, r) =>
      val t = if (r == 0) df else df.withColumn("text",
        regexp_replace(col("text"), "(\\S+)", "$1" + s"~$r"))
      t.withColumn("doc_id", shift("doc_id", r))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")
    wr(replicate(rd("embeddings"), n) { (df, r) =>
      val e = if (r == 0) df else df.withColumn("embedding",
        concat(
          array((element_at(col("embedding"), 1) + lit(r * 1e-3f)).cast("float")),
          slice(col("embedding"), 2, 100000)))
      e.withColumn("vec_id", shift("vec_id", r))
    }, "embeddings")

    println(s"""{"scaled":"$out","factor":$n}""")
    spark.stop()
  }
}
