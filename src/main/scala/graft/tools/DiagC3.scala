package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-level timing of the c3 training-mix composition and the tc2
  * triangle-store merge at a given SF dir (r16 optimization round).
  * Each stage materializes via noop-style count on its own frame, so
  * the increments attribute plan regions, not overlapping lineage.
  * Dev tool. */
object DiagC3 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("diag-c3")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    // ---- c3 stages ----
    val docs = graft.Tables.documents(spark, dir)
    val keepIds = t("gopher gate") {
      graft.ops.TextAnalysis.gopherRules(docs, "doc_id", "text")
        .filter(col("keep")).select(col("doc_id")).localCheckpoint()
    }
    val pool0 = t("pool join") {
      docs.join(keepIds, "doc_id").localCheckpoint()
    }
    val pairs = t("minhash pairs") {
      graft.ops.Dedup.minHashNearDups(pool0, "doc_id", "text", 0.8)
        .localCheckpoint()
    }
    val comp = t("cc") {
      graft.ops.Dedup.connectedComponents(pairs, "id_a", "id_b")
        .localCheckpoint()
    }
    val dropIds = t("survivor window") {
      pool0.select(col("doc_id").as("node"), col("n_chars"))
        .join(comp, "node")
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("component"))
            .orderBy(col("n_chars").desc, col("node"))))
        .filter(col("__rn") > 1)
        .select(col("node").as("doc_id")).localCheckpoint()
    }
    val pool = t("pool anti-join + count") {
      val p = pool0.join(dropIds, Seq("doc_id"), "left_anti").localCheckpoint()
      p.count(); p
    }
    val alloc = t("temperature alloc") {
      graft.ops.Sampling.temperatureAllocation(
        pool, "source", pool.count() * 6L / 10L, 0.7).localCheckpoint()
    }
    t("selection + readout") {
      val sel = pool.select(col("doc_id"), col("source"),
          graft.functions.PolyHash.polyHash(
            concat(col("doc_id").cast("string"), lit("c3"))).as("__h"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("__h"), col("doc_id"))))
        .join(alloc.select(col("source"), col("alloc").as("__a")), "source")
        .filter(col("__rn") <= col("__a"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_selected"), sum(col("doc_id")).as("sum_sel_ids"))
      alloc.join(sel, Seq("source"), "left").collect()
    }
    // ---- tc2 stages ----
    val edges = t("tc2: co-edges graph") {
      graft.analytics.CoreQueries.supplierCoEdges(spark, dir).localCheckpoint()
    }
    println("[diag] edges=" + edges.count())
    val isDelta = pmod(col("u") * 31 + col("v"), lit(10L)) === 3
    val tmp = java.nio.file.Files.createTempDirectory("graft_diag_tri").toString
    t("tc2: store build (one-time)") {
      val base = edges.filter(!isDelta).localCheckpoint()
      graft.ops.Triangles.writeEdgeStore(base, "u", "v", s"$tmp/edges")
      graft.ops.Triangles.perNode(base, "u", "v", assumeDistinct = true)
        .write.parquet(s"$tmp/tri")
    }
    t("tc2: merge (steady state)") {
      graft.ops.Triangles.mergeTriangleCountsBucketed(
          spark.read.parquet(s"$tmp/tri"), s"$tmp/edges",
          edges.filter(isDelta), "u", "v")
        .orderBy(col("n_tri").desc, col("node"))
        .limit(20).collect()
    }
    t("tc1: perNode (compare)") {
      graft.ops.Triangles.perNode(edges, "u", "v", assumeDistinct = true)
        .orderBy(col("n_tri").desc, col("node")).limit(20).collect()
    }
    spark.stop()
  }
}
