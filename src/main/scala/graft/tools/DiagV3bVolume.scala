package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Candidate-VOLUME audit of the mining face: the Θ(n^1.5) wall-clock
  * model assumes BALANCED inverted lists (mean list size √n, probes
  * spread evenly), but the true join output is
  * Σ over (anchor, probed list) of |list| — if the corpus geometry
  * concentrates Voronoi mass (ScaleUp's epsilon-replica families are
  * 100 near-copies per original vector), probes concentrate on the
  * big lists and the REAL pair count can sit far above n·nProbe·√n.
  * This tool computes the exact pair volume and the list-size/probe
  * histograms without running the join, so a decade ratio can be
  * split into (volume growth) × (per-pair throughput) — the first is
  * the data's property, the second the engine's. */
object DiagV3bVolume {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("diag-v3b-volume")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nProbe = sys.env.getOrElse("SPARK_GRAFT_NPROBE", "5").toInt
    val e = Tables.embeddings(spark, dir)
    val n = e.count()
    val seedIds = DiagV3b.presentSeedIds(e, n)
    val c0 = e.select(col("vec_id").as("cand_id"),
      col("embedding").cast("array<double>").as("__cv"))
    val cents = graft.ops.Similarity.collectCents(
      c0.filter(col("cand_id").isin(seedIds: _*))
        .select(col("cand_id").as("list_id"), col("__cv").as("__sv")))
    val members = graft.ops.Similarity.assignWithLists(c0, cents)
      .groupBy(col("list_id")).agg(count(lit(1)).as("m"))
    val probes = graft.ops.Similarity.probesFor(
        e.select(col("vec_id").as("anchor_id"), col("embedding")),
        cents, nProbe, "embedding", "anchor_id")
      .groupBy(col("list_id")).agg(count(lit(1)).as("p"))
    val joined = members.join(probes, Seq("list_id"), "full_outer")
      .select(col("list_id"), coalesce(col("m"), lit(0L)).as("m"),
        coalesce(col("p"), lit(0L)).as("p"))
      .localCheckpoint()
    // coalesce like the m/p columns above: sum/max return NULL on an
    // empty joined frame (e.g. an empty embeddings table) and getLong
    // would crash the audit instead of reporting zero volume
    val stats = joined.agg(
      coalesce(sum(col("m") * col("p")), lit(0L)).as("pairs"),
      coalesce(sum(col("m")), lit(0L)).as("members"),
      coalesce(sum(col("p")), lit(0L)).as("probes"),
      coalesce(max(col("m")), lit(0L)).as("max_list"),
      expr("percentile(m, 0.5)").as("med_list"),
      coalesce(max(col("m") * col("p")), lit(0L)).as("max_list_pairs")).collect()(0)
    val model = n.toDouble * nProbe * math.sqrt(n.toDouble)
    println(s"[vol] dir=$dir n=$n nLists=${seedIds.size} nProbe=$nProbe")
    println(f"[vol] pairs=${stats.getLong(0)}%d model=${model.toLong}%d " +
      f"ratio=${stats.getLong(0) / model}%.2f")
    println(s"[vol] max_list=${stats.getLong(3)} med_list=${stats.get(4)} " +
      s"max_single_list_pairs=${stats.getLong(5)}")
    // top-10 lists by pair contribution — the straggler candidates
    joined.withColumn("lp", col("m") * col("p"))
      .orderBy(col("lp").desc).limit(10).collect()
      .foreach(r => println(s"[vol] list=${r.getLong(0)} m=${r.getLong(1)} " +
        s"p=${r.getLong(2)} pairs=${r.getLong(3)}"))
    spark.stop()
  }
}
