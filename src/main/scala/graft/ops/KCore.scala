package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling — the graph-quality
  * filter of the family (pr1 centrality, lp1 communities, tc1
  * triangles): repeatedly delete nodes of degree < k until the
  * remainder (the k-core) is stable. In pipeline terms: link-farm /
  * long-tail pruning — a page or entity that cannot keep k
  * connections once its weak neighbors vanish is itself weak
  * (Seidman '83; the standard crawl-graph cleanup).
  *
  * Shape per round — the whole round is TWO corpus exchanges, both
  * carrying (long, long) rows:
  *  - degree = explode both endpoints + one count aggregate;
  *  - survival = two LEFT ANTI joins of the edge list against the
  *    (node-sized) sub-k table.
  * The edge table is localCheckpointed each round, so round r+1's
  * lineage starts at the peeled edges, not the original graph; the
  * one driver-held value per round is the dropped-node COUNT (the
  * Bpe.train argmax pattern) used for the fixpoint stop. Rounds to
  * converge is data-bounded, not fixed: peeling cascades (removing a
  * layer exposes the next), and the early stop makes extra budget
  * free — a `maxRounds` ≥ the data's cascade depth returns the TRUE
  * k-core (spec-asserted via `stable`).
  *
  * Returns (node, core_degree) for nodes alive after peeling —
  * degrees measured in the surviving subgraph.
  */
object KCore {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** @param assumeDistinct input is already id-ordered, distinct and
    *   loop-free (e.g. the tc1 co-occurrence edges) — skips one
    *   normalization exchange. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxRounds: Int = 8, assumeDistinct: Boolean = false): DataFrame =
    kCoreWithStatus(edges, srcCol, dstCol, k, maxRounds, assumeDistinct)._1

  /** [[kCore]] plus a CONVERGED flag: when the round budget runs out
    * before peeling reaches fixpoint the result is a strict SUPERGRAPH
    * of the true k-core — previously indistinguishable from a
    * converged one. Callers that round-budget deliberately (gc1's
    * oracle unrolls the same budget) read the flag; [[kCore]] itself
    * logs a warning so the silent-supergraph case is at least
    * detectable in any caller. The extra cost on the unconverged path
    * is one degree aggregate (the converged path already knows). */
  def kCoreWithStatus(edges: DataFrame, srcCol: String, dstCol: String,
                      k: Int, maxRounds: Int = 8,
                      assumeDistinct: Boolean = false): (DataFrame, Boolean) = {
    require(k >= 1 && maxRounds >= 1)
    val e0 = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    var e = (if (assumeDistinct) e0
             else e0.filter(col("u") =!= col("v"))
               .select(least(col("u"), col("v")).as("u"),
                 greatest(col("u"), col("v")).as("v"))
               .distinct())
      .localCheckpoint()
    var round = 0
    var stable = false
    while (round < maxRounds && !stable) {
      val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      val sub = deg.filter(col("d") < k).select(col("n")).localCheckpoint()
      if (sub.isEmpty) stable = true
      else {
        val prev = e
        e = e.join(sub, col("u") === col("n"), "left_anti")
          .join(sub, col("v") === col("n"), "left_anti")
          .localCheckpoint()
        prev.unpersist()
      }
      round += 1
    }
    // stable=true proves fixpoint; a budget exit must re-check (the
    // final peel may have landed on the fixpoint exactly at budget)
    val converged = stable || e
      .select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .filter(col("d") < k).isEmpty
    if (!converged)
      log.warn(s"kCore: round budget $maxRounds exhausted before " +
        s"fixpoint — result is a SUPERGRAPH of the true $k-core")
    (e.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("core_degree")),
      converged)
  }
}
