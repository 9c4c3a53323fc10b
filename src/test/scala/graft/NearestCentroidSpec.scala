package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{NearestCentroid, VectorFunctions => VF}

/** The native [[graft.functions.NearestCentroid]] argmax must agree
  * with the crossJoin + row_number formulation it replaces — including
  * the tie rule (smallest cluster_id) and the zero-norm NULL-sim
  * fallbacks the oracle's `sim DESC NULLS LAST, cluster_id ASC`
  * ordering implies. */
class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private val seeds: Seq[(Long, Array[Double])] = Seq(
    5L -> Array(1.0, 0.0, 0.0),
    2L -> Array(0.0, 1.0, 0.0),
    9L -> Array(0.0, 0.0, 1.0),
    7L -> Array(0.0, 0.0, 0.0)) // zero-norm centroid: its sim is NULL

  private def viaWindow(vecs: Seq[(Long, Seq[Double])]) = {
    val c0 = vecs.toDF("id", "v")
    val sd = seeds.map { case (i, a) => (i, a.toSeq) }.toDF("cid", "sv")
      .withColumn("sn", VF.norm(col("sv")))
    c0.withColumn("n", VF.norm(col("v")))
      .crossJoin(broadcast(sd))
      .withColumn("sim", VF.dot(col("v"), col("sv"))
        / nullif(col("n") * col("sn"), lit(0.0)))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("sim").desc, col("cid"))))
      .filter(col("r") === 1)
      .select(col("id"), col("cid"), col("sim"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
  }

  private def viaNative(vecs: Seq[(Long, Seq[Double])]) =
    vecs.toDF("id", "v")
      .select(col("id"), NearestCentroid.nearest(col("v"), seeds).as("b"))
      .select(col("id"), col("b.cluster_id"), col("b.sim"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

  test("agrees with the window formulation on ties, zero norms, and obliques") {
    val vecs: Seq[(Long, Seq[Double])] = Seq(
      1L -> Seq(1.0, 0.0, 0.0),          // exact match of centroid 5
      2L -> Seq(0.6, 0.8, 0.0),          // closer to centroid 2
      3L -> Seq(1.0, 1.0, 0.0),          // EXACT TIE between 5 and 2 -> 2
      4L -> Seq(0.0, 0.0, 0.0),          // zero-norm vector: all sims NULL
                                         //   -> smallest cluster_id (2), NULL sim
      5L -> Seq(-1.0, 0.0, 0.0),         // negative sims everywhere real
      6L -> Seq(1.0, 1.0, 1.0))          // three-way tie -> 2
    val w = viaWindow(vecs); val nv = viaNative(vecs)
    assert(w == nv, s"window=$w native=$nv")
    assert(nv(3L)._1 == 2L && nv(6L)._1 == 2L, "ties must pick min cluster_id")
    assert(nv(4L) == (2L, None), "all-null row falls back to min cluster_id")
  }

  test("top-n agrees with the window formulation's first n rows, every n") {
    val vecs: Seq[(Long, Seq[Double])] = Seq(
      1L -> Seq(1.0, 0.0, 0.0),
      2L -> Seq(0.6, 0.8, 0.0),
      3L -> Seq(1.0, 1.0, 0.0),          // tie between 5 and 2 -> 2 first
      4L -> Seq(0.0, 0.0, 0.0),          // all sims NULL -> pure id order
      5L -> Seq(-1.0, 0.0, 0.0),
      6L -> Seq(1.0, 1.0, 1.0))
    val c0 = vecs.toDF("id", "v")
    val sd = seeds.map { case (i, a) => (i, a.toSeq) }.toDF("cid", "sv")
      .withColumn("sn", VF.norm(col("sv")))
    for (n <- 1 to 5) {                  // n=5 > k=4: returns all k
      val viaWin = c0.withColumn("nn", VF.norm(col("v")))
        .crossJoin(broadcast(sd))
        .withColumn("sim", VF.dot(col("v"), col("sv"))
          / nullif(col("nn") * col("sn"), lit(0.0)))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("sim").desc, col("cid"))))
        .filter(col("r") <= n)
        .orderBy(col("id"), col("r"))
        .select(col("id"), col("cid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val viaTopN = c0
        .select(col("id"),
          NearestCentroid.nearestN(col("v"), seeds, n).as("ls"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(viaTopN == viaWin, s"n=$n: window=$viaWin topN=$viaTopN")
    }
  }

  test("eval path matches codegen path") {
    val vecs: Seq[(Long, Seq[Double])] =
      Seq(1L -> Seq(0.3, 0.4, 0.5), 2L -> Seq(0.0, 0.0, 0.0))
    val sorted = seeds.sortBy(_._1)
    import org.apache.spark.sql.catalyst.util.ArrayData
    vecs.foreach { case (_, v) =>
      val direct = NearestCentroid.assign(
        ArrayData.toArrayData(v.toArray), sorted.map(_._1).toArray,
        sorted.map(_._2).toArray, sorted.map(s => NearestCentroid.selfNorm(s._2)).toArray)
      val viaDf = Seq(Tuple1(v)).toDF("v")
        .select(NearestCentroid.nearest(col("v"), seeds).as("b"))
        .select(col("b.cluster_id"), col("b.sim")).head
      assert(direct.getLong(0) == viaDf.getLong(0))
      assert(direct.isNullAt(1) == viaDf.isNullAt(1))
      if (!direct.isNullAt(1)) assert(direct.getDouble(1) == viaDf.getDouble(1))
    }
  }
}
