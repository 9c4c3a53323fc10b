package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions

/** Measurement: the SimHash band-width saturation regime (the "fourth
  * decade") on a scaled model.
  *
  * The two-lane 120-bit signature (d3b) caps its band width at 30
  * bits, so its collision slack `w - log2(n)` hits 0 near n = 2^30
  * and goes NEGATIVE beyond — every band bucket then holds many
  * unrelated docs and candidate volume turns quadratic. The four-lane
  * 240-bit signature (d3d) lets a band grow to a whole 60-bit lane,
  * holding slack +5 to n ≈ 2^55.
  *
  * 2^30+ rows don't fit a local bench, so this scales the MODEL
  * rather than the data: n = 2^20 random signatures, case A banded at
  * w = 16 (slack −4 — the saturated layout's shape at n ≈ 2^34) vs
  * case B at the data-sized w = log2(n)+5 = 25 (what d3d would pick).
  * Random uniform signatures are the WORST case for band collisions
  * (real near-dup corpora only add true positives on top). Prints one
  * JSON line: candidate-pair counts and band-join wall seconds for
  * both cases.
  */
object FourthDecadeStudy {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else (1L << 20)
    val spark = Sessions.local("graft-fourth-decade")
    import spark.implicits._

    val mask60 = (1L << 60) - 1
    // four independent pseudo-random 60-bit lanes per id
    val sigs = spark.range(n).select(col("id") +: (0 to 3).map(l =>
        xxhash64(col("id"), lit(l)).bitwiseAND(lit(mask60)).as(s"s$l")): _*)
      .localCheckpoint()

    def bandJoinCount(width: Int): (Long, Double) = {
      val mask = lit((1L << width) - 1)
      val banded = sigs.select(col("id"), explode(array((0 to 3).map(l =>
          struct(lit(l).as("band"),
            col(s"s$l").bitwiseAND(mask).as("bv"))): _*)).as("b"))
        .select(col("id"), col("b.band").as("band"), col("b.bv").as("bv"))
      val a = banded.select(col("band"), col("bv"), col("id").as("id_a"))
      val b = banded.select(col("band"), col("bv"), col("id").as("id_b"))
      val t0 = System.nanoTime()
      val c = a.join(b, Seq("band", "bv"))
        .filter(col("id_a") < col("id_b")).count()
      (c, (System.nanoTime() - t0) / 1e9)
    }

    val wSat = 16 // saturated-cap model: slack = 16 - log2(n)
    val wFit = math.min(60,
      graft.ops.Dedup.simHashBandWidthFor(n)) // data-sized: slack +5
    val (cSat, tSat) = bandJoinCount(wSat)
    val (cFit, tFit) = bandJoinCount(wFit)
    println(s"""{"n":$n,"w_saturated":$wSat,"cand_saturated":$cSat,""" +
      s""""secs_saturated":${f"$tSat%.2f"},"w_fitted":$wFit,""" +
      s""""cand_fitted":$cFit,"secs_fitted":${f"$tFit%.2f"}}""")
    spark.stop()
  }
}
