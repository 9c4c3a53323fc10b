package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-skew measurement (PERFORMANCE.md "Skew"): plant a HOT
  * LSH band bucket — a boilerplate-heavy corpus where a large clique
  * of documents shares one template — and measure the per-task time
  * spread of the near-dup band join with and without the explicit
  * salt (ops.Dedup.bandCandidates saltBuckets) and with/without AQE's
  * runtime skew-join split. The salted and unsalted paths return
  * IDENTICAL pair sets (asserted per run); only the task distribution
  * differs. Local dev/bench tooling — not part of any registered query
  * plan.
  *
  * Usage: runMain graft.tools.SkewStudy <sfDir> [hotCliqueSize]
  */
object SkewStudy {

  /** Collects task wall-times; reports (tasks, median, max, total). */
  private final class TaskTimes extends SparkListener {
    val times = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null && t.taskInfo.successful)
        times.add(t.taskInfo.duration)
    def snapshot(): Seq[Long] = {
      import scala.jdk.CollectionConverters._
      times.asScala.toSeq
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val hot = if (args.length > 1) args(1).toInt else 1000
    val spark = graft.Sessions.local("graft-skew-study")

    // corpus + a planted template clique: `hot` docs share one long
    // boilerplate text with a per-doc unique tail token, so every
    // member lands in the SAME MinHash band buckets (the adversarial
    // hot key) while remaining distinct documents.
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val template = (1 to 60).map(i => s"boiler$i").mkString(" ")
    val clique = spark.range(hot.toLong)
      .select((col("id") + 10000000L).as("doc_id"),
        concat(lit(template), lit(" tail"), col("id").cast("string")).as("text"))
    val corpus = docs.unionByName(clique).localCheckpoint()
    println(s"corpus=${corpus.count()} rows, planted clique=$hot " +
      s"(pair output ~${hot.toLong * (hot - 1) / 2 / 1000000}M from the clique)")

    def run(name: String, salt: Int, aqe: Boolean): Set[(Long, Long)] = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe.toString)
      val listener = new TaskTimes
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      // count the candidate PAIRS (id pairs only) — the stage the hot
      // bucket concentrates; full verify would add jaccard cost on top
      val pairs = graft.ops.Dedup.minHashNearDups(
        corpus, "doc_id", "text", 0.8, saltBuckets = salt)
      import spark.implicits._
      val got = pairs.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      val ts = listener.snapshot().sorted
      val med = if (ts.nonEmpty) ts(ts.size / 2) else 0L
      val mx = if (ts.nonEmpty) ts.last else 0L
      println(f"| $name | $sec%.1f s | ${ts.size} tasks | med ${med} ms | " +
        f"max ${mx} ms | max/med ${if (med > 0) mx.toDouble / med else 0.0}%.1f |")
      got
    }

    println()
    println("| run | wall | tasks | median task | max task | skew ratio |")
    println("|---|---|---|---|---|---|")
    val base = run("unsalted, AQE off", 1, aqe = false)
    val salted = run("salt=8, AQE off", 8, aqe = false)
    val aqeRun = run("unsalted, AQE on", 1, aqe = true)
    val both = run("salt=8, AQE on", 8, aqe = true)
    require(base == salted && base == aqeRun && base == both,
      "salt/AQE must not change results")
    println(s"\nresult sets identical across runs: ${base.size} pairs")
    spark.stop()
  }
}
