package graft.tools

import org.apache.spark.sql.functions._

/** r16 profiling harness for j10 (verdict #6): j10_fuzzy_join has been
  * the suite's most expensive query since r13 (~5.6 s cross-window
  * minimum, 1.3× the runner-up). This splits editDistanceJoin's
  * pipeline into timed stages over the SAME customer-name fixture, so
  * PERFORMANCE.md can say where the floor is — distinct-collapse /
  * hood explode / candidate join / levenshtein verify / id expansion —
  * or document that it IS the fixture's floor.
  *
  * Methodology: each stage is forced by a count() from a cold plan
  * (stages re-run their predecessors — subtracting successive
  * wall-times isolates each increment; the fixture is localCheckpointed
  * once so the source scan is excluded from every stage). ITERS
  * repetitions, per-stage minimum reported (the bench protocol's
  * contention defense).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> scripts/run-tool.sh graft.tools.DiagJ10
  */
object DiagJ10 {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("ITERS", "3").toInt
    val spark = graft.Sessions.local("graft-diag-j10")
    spark.sparkContext.setLogLevel("WARN")

    val strs = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("__id"), col("c_name").cast("string").as("__s"))
      .localCheckpoint()
    println(s"[j10] rows=${strs.count()} distinct=" +
      s"${strs.select(col("__s")).distinct().count()} dir=$sfDir")

    import graft.functions.DeletionHoods
    def groups = strs.groupBy(col("__s")).agg(count(lit(1)).as("__cnt"))
    def keyed = groups
      .select(col("__s"), explode(DeletionHoods.hoods(col("__s"), 1)).as("__k"))
    def cand = keyed.join(
      keyed.select(col("__s").as("__s_b"), col("__k").as("__k_b")),
      col("__k") === col("__k_b") && col("__s") < col("__s_b"))
    def verified = cand
      .select(col("__s"), col("__s_b"),
        levenshtein(col("__s"), col("__s_b"), 1).as("dist"))
      .where(col("dist") >= 0)
      .distinct()
    def full = graft.ops.FuzzyJoin.editDistanceJoin(
      graft.Tables.customer(spark, sfDir), "c_custkey", "c_name", 1)

    // variant: dedupe candidate PAIRS before the levenshtein, so each
    // unique (s, s_b) pair is verified once instead of once per shared
    // hood key — trades one short-row exchange for fewer DP calls
    def dedupFirst = cand.select(col("__s"), col("__s_b")).distinct()
      .select(col("__s"), col("__s_b"),
        levenshtein(col("__s"), col("__s_b"), 1).as("dist"))
      .where(col("dist") >= 0)

    val stages: Seq[(String, () => Long)] = Seq(
      "A_distinct_collapse" -> (() => groups.count()),
      "B_hood_explode"      -> (() => keyed.count()),
      "C_candidate_join"    -> (() => cand.count()),
      "C2_distinct_cands"   -> (() => cand.select(col("__s"), col("__s_b")).distinct().count()),
      "D_verify_distinct"   -> (() => verified.count()),
      "D2_dedup_then_verify" -> (() => dedupFirst.count()),
      "E_full_with_expand"  -> (() => full.count()))

    val best = scala.collection.mutable.LinkedHashMap[String, (Double, Long)]()
    for (_ <- 1 to iters; (name, run) <- stages) {
      val t0 = System.nanoTime()
      val n = run()
      val s = (System.nanoTime() - t0) / 1e9
      val cur = best.get(name)
      if (cur.forall(_._1 > s)) best(name) = (s, n)
    }
    var prev = 0.0
    best.foreach { case (name, (s, n)) =>
      println(f"[j10] $name%-20s ${s}%7.2f s  (+${s - prev}%6.2f s incr)  rows=$n")
      prev = s
    }
    spark.stop()
  }
}
