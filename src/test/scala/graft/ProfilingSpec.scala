package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Profiling

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("binnedDrift: identical distributions give ks=0 and psi=0") {
    // A and B each hold 100 rows in every bin 0..9 → shares and cdfs
    // identical, the eps clamp never fires
    val df = spark.range(2000).select(
      ((col("id") % 10) * 10 + 5).cast("double").as("v"),
      (col("id") < 1000).as("a"))
    val r = Profiling.binnedDrift(df, "v", col("a"), binWidth = 10.0,
      nBins = 20).collect()(0)
    assert(r.getAs[Long]("n_a") === 1000L)
    assert(r.getAs[Long]("n_b") === 1000L)
    assert(math.abs(r.getAs[Double]("ks_stat")) < 1e-12)
    assert(math.abs(r.getAs[Double]("psi")) < 1e-12)
  }

  test("binnedDrift: one-bin shift has the closed-form KS and PSI") {
    // A occupies bins 0..9 (100 each), B bins 1..10 → every boundary's
    // |cdfA - cdfB| is exactly 0.1; PSI = two mismatched end bins, each
    // (0.1 - eps) * ln(0.1 / eps)
    val eps = 1e-6
    val df = spark.range(2000).select(
      when(col("id") < 1000, (col("id") % 10) * 10 + 5)
        .otherwise((col("id") % 10) * 10 + 15).cast("double").as("v"),
      (col("id") < 1000).as("a"))
    val r = Profiling.binnedDrift(df, "v", col("a"), binWidth = 10.0,
      nBins = 20, eps = eps).collect()(0)
    assert(math.abs(r.getAs[Double]("ks_stat") - 0.1) < 1e-12)
    val expectedPsi = 2.0 * (0.1 - eps) * math.log(0.1 / eps)
    assert(math.abs(r.getAs[Double]("psi") - expectedPsi) < 1e-9)
  }

  test("binnedDrift: NULL values are counted explicitly, never binned") {
    // 3 NULLs in A, 2 in B; the non-null rows are the identical-
    // distribution fixture — ks/psi must stay 0 and n_a/n_b must not
    // include the nulls (a null bin key entering tot but dropping out
    // of the CDF join was the advisory's silent-bias mode)
    val df = spark.range(2005).select(
      when(col("id") >= 2000, lit(null).cast("double"))
        .otherwise(((col("id") % 10) * 10 + 5).cast("double")).as("v"),
      (col("id") < 1000 || col("id").isin(2000L, 2001L, 2002L)).as("a"))
    val r = Profiling.binnedDrift(df, "v", col("a"), binWidth = 10.0,
      nBins = 20).collect()(0)
    assert(r.getAs[Long]("n_a") === 1000L)
    assert(r.getAs[Long]("n_b") === 1000L)
    assert(r.getAs[Long]("n_null_a") === 3L)
    assert(r.getAs[Long]("n_null_b") === 2L)
    assert(math.abs(r.getAs[Double]("ks_stat")) < 1e-12)
    assert(math.abs(r.getAs[Double]("psi")) < 1e-12)
  }

  test("binnedDrift: negative values clamp into bin 0, not a negative id") {
    // A holds values in bin 0, B holds NEGATIVE values: with the
    // two-sided clamp both slices land in bin 0 → identical CDFs,
    // ks = 0. Without the clamp B's rows sat in bin -1, joined into
    // the CDF frame asymmetrically, and ks was biased.
    val df = spark.range(200).select(
      when(col("id") < 100, lit(5.0)).otherwise(lit(-37.0)).as("v"),
      (col("id") < 100).as("a"))
    val r = Profiling.binnedDrift(df, "v", col("a"), binWidth = 10.0,
      nBins = 20).collect()(0)
    assert(r.getAs[Long]("n_a") === 100L)
    assert(r.getAs[Long]("n_b") === 100L)
    assert(math.abs(r.getAs[Double]("ks_stat")) < 1e-12)
    assert(r.getAs[Long]("n_null_a") === 0L)
  }

  test("keySkewProfile: planted counts give exact summary") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val r = Profiling.keySkewProfile(df, "k", topN = 2).collect()(0)
    assert(r.getAs[Long]("n_keys") === 3L)
    assert(r.getAs[Long]("n_rows") === 10L)
    assert(r.getAs[String]("hot_key") === "a")
    assert(math.abs(r.getAs[Double]("hot_share") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("topn_share") - 0.8) < 1e-12)
    val h = -(0.5 * math.log(0.5) + 0.3 * math.log(0.3) +
      0.2 * math.log(0.2))
    assert(math.abs(r.getAs[Double]("norm_entropy") - h / math.log(3)) < 1e-12)
  }

  test("keySkewProfile: uniform keys have normalized entropy 1") {
    val df = spark.range(900).select((col("id") % 30).as("k"))
    val r = Profiling.keySkewProfile(df, "k").collect()(0)
    assert(math.abs(r.getAs[Double]("norm_entropy") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("hot_share") - 1.0 / 30) < 1e-12)
  }

  test("compactionPlan: greedy prefix bins, order kept, size bound") {
    val files = Seq(("p", 1, 100L), ("p", 2, 250L), ("p", 3, 100L),
      ("p", 4, 400L), ("p", 5, 200L), ("q", 1, 50L), ("q", 2, 50L))
      .toDF("part", "file", "size")
    val plan = Profiling.compactionPlan(files, "part", "file", "size",
        target = 300L)
      .orderBy(col("part"), col("file"))
      .select(col("part"), col("file"), col("bin"))
      .as[(String, Int, Long)].collect().toSeq
    assert(plan === Seq(("p", 1, 0L), ("p", 2, 0L), ("p", 3, 1L),
      ("p", 4, 1L), ("p", 5, 2L), ("q", 1, 0L), ("q", 2, 0L)))
    // every bin's total stays under target + the partition's max file
    val sized = Profiling.compactionPlan(files, "part", "file", "size",
        target = 300L)
      .groupBy(col("part"), col("bin")).agg(sum(col("size")).as("tot"))
      .as[(String, Long, Long)].collect()
    assert(sized.forall(_._3 < 300L + 400L))
  }

  test("corrMoments: store + delta add-merge equals full rebuild bit-for-bit") {
    import graft.ops.Profiling
    val cols = graft.analytics.ProfileQueries.CorrCols
    val li = Tables.lineitem(spark, sfDir)
    val merged = Profiling.cmAddMoments(
        Profiling.corrMoments(li.filter(col("l_orderkey") % 10 =!= 3), cols),
        Profiling.corrMoments(li.filter(col("l_orderkey") % 10 === 3), cols))
      .collect().head
    val rebuild = Profiling.corrMoments(li, cols).collect().head
    assert(merged.toSeq === rebuild.toSeq,
      "decimal moment sums must merge losslessly")
  }

  test("corrFromMoments matches plain-Scala Pearson on a planted frame") {
    import graft.ops.Profiling
    import spark.implicits._
    val xs = Seq((1.0, 2.0, 10.0), (2.0, 4.5, 9.0), (3.0, 5.5, 7.0),
      (4.0, 8.0, 4.0), (5.0, 10.5, 2.0))
    val df = xs.toDF("a", "b", "c")
    val got = Profiling.corrFromMoments(
        Profiling.corrMoments(df, Seq("a", "b", "c")), Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    def pearson(u: Seq[Double], v: Seq[Double]): Double = {
      val n = u.size
      val (mu, mv) = (u.sum / n, v.sum / n)
      val cov = u.zip(v).map { case (x, y) => (x - mu) * (y - mv) }.sum
      val su = math.sqrt(u.map(x => (x - mu) * (x - mu)).sum)
      val sv = math.sqrt(v.map(y => (y - mv) * (y - mv)).sum)
      cov / (su * sv)
    }
    val (a, b, c) = (xs.map(_._1), xs.map(_._2), xs.map(_._3))
    assert(math.abs(got(("a", "b")) - pearson(a, b)) < 1e-9)
    assert(math.abs(got(("a", "c")) - pearson(a, c)) < 1e-9)
    assert(math.abs(got(("b", "c")) - pearson(b, c)) < 1e-9)
    assert(got(("a", "c")) < 0, "anti-correlated pair must be negative")
  }

  test("cm1b and st22 agree with each other (shared moment oracle)") {
    val cm1b = SparkEntry.queries("cm1b_corr_store")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val st22 = SparkEntry.queries("st22_stream_corr_moments")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(st22 === cm1b)
    assert(cm1b.size === 6)
  }

  test("sequencePatternsOf: planted histories match hand counts") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    // user 1: V C P C P  → matched, 2 CP bigrams
    // user 2: P C V      → no match (order wrong), 0 bigrams
    // user 3: V X C X P  → matched (gaps allowed), 0 CP bigrams
    val ev = Seq(
      (1L, 1L, t(0), "view"), (1L, 2L, t(1), "click"),
      (1L, 3L, t(2), "purchase"), (1L, 4L, t(3), "click"),
      (1L, 5L, t(4), "purchase"),
      (2L, 6L, t(0), "purchase"), (2L, 7L, t(1), "click"),
      (2L, 8L, t(2), "view"),
      (3L, 9L, t(0), "view"), (3L, 10L, t(1), "error"),
      (3L, 11L, t(2), "click"), (3L, 12L, t(3), "error"),
      (3L, 13L, t(4), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val r = graft.analytics.ProfileQueries.sequencePatternsOf(ev)
      .select(col("user_id"), col("matched_vcp"), col("n_cp_bigrams"))
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    assert(r === Seq((1L, 1, 2L), (2L, 0, 0L), (3L, 1, 0L)))
  }

  test("knnGraphIvfSeeded with nProbe = nLists equals brute-force top-k") {
    // probing every list makes the IVF candidate set the whole corpus,
    // so the approximate graph must equal the exact one
    val e = Tables.embeddings(spark, sfDir)
    val seeds = graft.analytics.VectorQueries.IvfSeedIds
    val approx = graft.ops.Similarity
      .knnGraphIvfSeeded(e, seeds, k = 5, nProbe = seeds.size)
      .select(col("vec_id"), col("nbr_id"), col("rank"))
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    val v = col("embedding").cast("array<double>")
    val a = e.select(col("vec_id"), v.as("va"))
    val b = e.select(col("vec_id").as("nbr_id"), v.as("vb"))
    val dot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
      graft.functions.VectorFunctions.dot(x, y)
    val norm = (x: org.apache.spark.sql.Column) =>
      graft.functions.VectorFunctions.norm(x)
    val brute = a.crossJoin(b).filter(col("vec_id") =!= col("nbr_id"))
      .withColumn("cosine", dot(col("va"), col("vb")) /
        nullif(norm(col("va")) * norm(col("vb")), lit(0.0)))
      .withColumn("rank", row_number().over(Window.partitionBy(col("vec_id"))
        .orderBy(col("cosine").desc, col("nbr_id"))))
      .filter(col("rank") <= 5)
      .select(col("vec_id"), col("nbr_id"), col("rank"))
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(approx === brute)
    assert(approx.nonEmpty)
  }
}
