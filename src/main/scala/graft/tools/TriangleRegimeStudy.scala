package graft.tools

import org.apache.spark.sql.functions._

/** r14 measurement harness for the regime-adaptive triangle adjacency
  * read ([[graft.ops.Triangles.readAdjForDeltaAdaptive]]): prices the
  * two read sources against each other across touched-bucket
  * fractions (the crossover that calibrates DenseBucketFraction), and
  * drives the edge store end-to-end through sparse steady state → a
  * dense backfill batch → back to sparse, reporting which source the
  * adaptive read picked and what each phase cost.
  *
  * Usage: scripts/run-tool.sh graft.tools.TriangleRegimeStudy <sfDir> [iters]
  *
  * Output: one human-readable line per measurement (crossover table +
  * phase table) — transcribed into PERFORMANCE.md's round-14 section.
  */
object TriangleRegimeStudy {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.local("graft-tri-regime")
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Triangles

    val edges = graft.analytics.CoreQueries.supplierCoEdges(spark, sfDir)
      .localCheckpoint()
    val nEdges = edges.count()
    println(s"[regime] corpus edges: $nEdges")

    // ---- crossover study: pruned read vs a<b-half read, 256-bucket
    // store, materialization forced by localCheckpoint + count ----
    val root = java.nio.file.Files.createTempDirectory("graft_regime").toString
    val n = 256
    Triangles.writeEdgeStore(edges, "u", "v", s"$root/edges256", nBuckets = n)
    def prunedSecs(frac: Double): Double = {
      val buckets = (0L until (n * frac).toLong)
      (1 to iters).map { _ =>
        val (_, s) = time {
          spark.read.parquet(s"$root/edges256")
            .filter(col("eb").isin(buckets: _*))
            .select(col("a"), col("b"))
            .localCheckpoint().count()
        }
        s
      }.min
    }
    // the half path AS THE ADAPTIVE READ PERFORMS IT: the o = 0
    // partition-directory prune (opens half the files, decodes E
    // rows). The r14 version of this harness measured a row-level
    // a < b filter instead — a full both-orientations scan — which
    // overstated the half path's cost and left f* = 0.5 confirmed
    // only analytically (the r14 ADVICE finding); this is the honest
    // measurement.
    def halfSecs(): Double =
      (1 to iters).map { _ =>
        val (_, s) = time {
          spark.read.parquet(s"$root/edges256")
            .filter(col("o") === 0)
            .select(col("a"), col("b"))
            .localCheckpoint().count()
        }
        s
      }.min
    val half = halfSecs()
    println(f"[regime] half-read (E rows, o=0 partition prune): $half%.3f s")
    for (f <- Seq(0.125, 0.25, 0.3125, 0.375, 0.4375, 0.5, 0.625, 0.75, 1.0)) {
      val p = prunedSecs(f)
      println(f"[regime] pruned f=$f%.3f: $p%.3f s (vs half $half%.3f -> " +
        s"${if (p < half) "pruned" else "half"} wins)")
    }

    // ---- end-to-end phases: sparse steady state -> dense backfill ->
    // back to sparse, on a 256-bucket store (the bucket count a
    // ~100x-larger corpus would size itself to — at THIS sf the
    // data-sized floor is 8 and every delta reads dense, which is
    // exactly what the adaptive read detects; 256 buckets is the
    // regime where both sources genuinely engage) ----
    val storeP = s"$root/edges_phased"
    val nb = 256
    // phase 0: seed with ~75% of edges (the base corpus)
    val mod = pmod(col("u") * 31 + col("v"), lit(4L))
    val base = edges.filter(mod =!= 3).localCheckpoint()
    val counts0 = Triangles.perNode(base, "u", "v", assumeDistinct = true)
      .localCheckpoint()
    Triangles.writeEdgeStore(base, "u", "v", storeP, nBuckets = nb)
    println(s"[regime] phased store buckets: $nb")

    // phase 1 (sparse steady state): a localized 64-edge delta — the
    // per-entity update shape. Report which source the adaptive read
    // picks and the merge time.
    val sparseDelta = edges.filter(mod === 3).orderBy(col("u"), col("v"))
      .limit(64).localCheckpoint()
    def touched(d: org.apache.spark.sql.DataFrame): Long = d
      .select(explode(array(col("u"), col("v"))).as("x"))
      .select(pmod(xxhash64(col("x")), lit(nb.toLong)).as("eb"))
      .distinct().count()
    println(s"[regime] sparse delta touches ${touched(sparseDelta)} of $nb buckets")
    val sparseT = (1 to iters).map { _ =>
      time(Triangles.mergeTriangleCountsBucketed(counts0, storeP,
        sparseDelta, "u", "v").count())._2
    }.min
    println(f"[regime] phase 1 sparse merge (64-edge delta): $sparseT%.3f s")

    // phase 2 (dense backfill): the full 26% slice in one batch
    val denseDelta = edges.filter(mod === 3).localCheckpoint()
    println(s"[regime] dense delta: ${denseDelta.count()} edges, touches " +
      s"${touched(denseDelta)} of $nb buckets")
    val denseT = (1 to iters).map { _ =>
      time(Triangles.mergeTriangleCountsBucketed(counts0, storeP,
        denseDelta, "u", "v").count())._2
    }.min
    println(f"[regime] phase 2 dense backfill merge: $denseT%.3f s")

    // phase 3 (back to sparse, store now holds everything): append the
    // backfill, then a genuinely-novel localized delta (a fresh-node
    // chain — novelty, degree and closure probes all run for real)
    Triangles.appendEdgeStore(
      Triangles.novelAgainst(Triangles.readAdjForDeltaAdaptive(
        spark, storeP, denseDelta), denseDelta), storeP)
    val counts1 = Triangles.perNode(edges, "u", "v", assumeDistinct = true)
      .localCheckpoint()
    val novelDelta = spark.range(64)
      .selectExpr("id + 1000000000 AS u", "id + 1000000001 AS v")
      .localCheckpoint()
    println(s"[regime] phase-3 delta touches ${touched(novelDelta)} of $nb buckets")
    val sparseT2 = (1 to iters).map { _ =>
      time(Triangles.mergeTriangleCountsBucketed(counts1, storeP,
        novelDelta, "u", "v").count())._2
    }.min
    println(f"[regime] phase 3 sparse merge post-backfill: $sparseT2%.3f s")

    // one-shot rebuild reference
    val rebuildT = (1 to iters).map { _ =>
      time(Triangles.perNode(edges, "u", "v", assumeDistinct = true).count())._2
    }.min
    println(f"[regime] one-shot rebuild reference: $rebuildT%.3f s")
    spark.stop()
  }
}
