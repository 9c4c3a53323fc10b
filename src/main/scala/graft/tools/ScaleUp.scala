package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Replication strategy scales with the factor: small N builds an
  * N-branch union (one scan per replica — matches the layout of the
  * earlier sf1/sf10 studies); large N (≥ [[ExplodeThreshold]], e.g.
  * the sf100 third-decade run at N=1000) explodes a 0..N-1 replica
  * sequence per source row instead, because a 1000-branch union plan
  * costs more in Catalyst analysis than the whole generation. The
  * explode path repartitions the (tiny) source first so output files
  * stay balanced.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <outDir> <factor> [tables-csv]
  *   tables-csv (optional): subset to scale, e.g. "documents,embeddings"
  *   — the third-decade study only needs the text/vector tables, and
  *   skipping a 1000× lineitem saves most of the generation time.
  */
object ScaleUp {
  private val Stride = 100000000L
  private val ExplodeThreshold = 32

  /** Per-replica transform, parameterized by the replica id as a
    * Column so one definition serves both replication strategies. */
  private def scaleTable(spark: SparkSession, src: String, t: String, n: Int,
                         cpus: Int): DataFrame = {
    val df = spark.read.parquet(s"$src/$t.parquet")
    def shifted(r: Column)(base: DataFrame): DataFrame = t match {
      case "customer" => base.withColumn("c_custkey", col("c_custkey") + r * Stride)
      case "supplier" => base.withColumn("s_suppkey", col("s_suppkey") + r * Stride)
      case "part"     => base.withColumn("p_partkey", col("p_partkey") + r * Stride)
      case "orders" => base
        .withColumn("o_orderkey", col("o_orderkey") + r * Stride)
        .withColumn("o_custkey", col("o_custkey") + r * Stride)
      case "lineitem" => base
        .withColumn("l_orderkey", col("l_orderkey") + r * Stride)
        .withColumn("l_partkey", col("l_partkey") + r * Stride)
        .withColumn("l_suppkey", col("l_suppkey") + r * Stride)
      case "events" => base
        .withColumn("event_id", col("event_id") + r * Stride)
        .withColumn("user_id", col("user_id") + r * Stride)
      case "documents" => base
        // every token suffixed per replica → zero shared shingles
        // across replicas, identical shingle structure within one
        .withColumn("text", when(r === 0, col("text")).otherwise(
          regexp_replace(col("text"), lit("(\\S+)"), concat(lit("$1~"), r.cast("string")))))
        .withColumn("doc_id", col("doc_id") + r * Stride)
        .withColumn("n_chars", length(col("text")).cast("long"))
      case "embeddings" => base
        .withColumn("embedding", when(r === 0, col("embedding")).otherwise(
          concat(
            array((element_at(col("embedding"), 1) + r.cast("float") * lit(1e-3f)).cast("float")),
            slice(col("embedding"), 2, 100000))))
        .withColumn("vec_id", col("vec_id") + r * Stride)
      case _ => base
    }
    if (n < ExplodeThreshold) {
      (0 until n).map(rep => shifted(lit(rep.toLong))(df)).reduce(_ unionAll _)
    } else {
      // one exploded replica column instead of an n-branch union; the
      // source is tiny, so the pre-explode repartition is free and
      // keeps every output file ~1/(8·cpus) of the scaled table
      val withR = df.repartition(cpus * 8)
        .withColumn("__r", explode(sequence(lit(0L), lit(n - 1L))))
      shifted(col("__r"))(withR).drop("__r")
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val n = args(2).toInt
    val defaultTables = Seq("customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
    val tables =
      if (args.length > 3) args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else defaultTables
    val spark = graft.Sessions.local("graft-scale-up", cpusDefault = "32")

    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // dims: copied once, never replicated (like real dims)
    if (args.length <= 3) {
      wr(spark.read.parquet(s"$src/region.parquet"), "region")
      wr(spark.read.parquet(s"$src/nation.parquet"), "nation")
    }
    tables.foreach { t =>
      wr(scaleTable(spark, src, t, n, graft.Sessions.cpus("32").toInt), t)
    }
    println(s"""{"scaled":"$out","factor":$n,"tables":"${tables.mkString(",")}"}""")
    spark.stop()
  }
}
