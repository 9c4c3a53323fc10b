package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Sampling

class ExactNtileSpec extends SparkSpec {
  import spark.implicits._

  /** (score, id) fixtures with heavy ties, singleton scores, and
    * n both divisible and non-divisible by k. */
  private def fixture(n: Int, distinctScores: Int) = {
    val rnd = new scala.util.Random(11)
    (0 until n).map(i => (rnd.nextInt(distinctScores).toDouble / 7.0, i.toLong))
  }

  private def check(rows: Seq[(Double, Long)], k: Int): Unit = {
    val df = rows.toDF("score", "id").repartition(5)
    val got = Sampling.exactNtile(df, "score", "id", k)
      .select($"id", $"bucket".cast("long")).as[(Long, Long)]
      .collect().toMap
    val want = rows.toDF("score", "id")
      .withColumn("bucket",
        ntile(k).over(Window.orderBy($"score", $"id")).cast("long"))
      .select($"id", $"bucket").as[(Long, Long)].collect().toMap
    assert(got == want, s"k=$k n=${rows.size}")
  }

  test("matches the ntile window across n, k, and tie shapes") {
    for {
      (n, d) <- Seq((90, 7), (91, 7), (1, 1), (5, 1), (200, 200), (64, 3))
      k <- Seq(1, 2, 3, 7, 10)
    } check(fixture(n, d), k)
  }

  test("n < k: first n buckets take one row each") {
    check(fixture(4, 3), 10)
  }

  test("boundary ties split by id exactly as the window's total order") {
    // all rows same score: buckets are pure id-rank ranges
    val rows = (0L until 10L).map(id => (1.0, id))
    check(rows, 3)
  }

  test("no corpus-sized unpartitioned window: the global sort is histogram-sized") {
    val df = fixture(1000, 5).toDF("score", "id")
    val plan = Sampling.exactNtile(df, "score", "id", 3)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windows.size == 2, plan)
    // the corpus-wide window (row_number) must be PARTITIONED (by
    // score): its spec carries a partition list before the order list
    val rn = windows.filter(_.contains("row_number"))
    // (the partition key may appear wrapped in float-normalization)
    assert(rn.size == 1 && rn.head.matches(""".*\], \[[^\]]*score#\d+[^\]]*\], \[id#\d+.*"""), rn.mkString)
    // the only unpartitioned window runs over the histogram lane
    // (its function references the count column, not corpus rows)
    val hist = windows.filterNot(_.contains("row_number"))
    assert(hist.head.contains("__cnt"), hist.mkString)
  }

  test("winsorize clamps to the exact tail edges of 1..100") {
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "s")
    val w = Sampling.winsorize(df, "s", "id", 20, "w")
      .select($"id", $"w").as[(Long, Double)].collect().toMap
    // buckets of 5: bucket 1 = 1..5 (lo = 5), bucket 20 = 96..100 (hi = 96)
    assert(w(1L) === 5.0 && w(4L) === 5.0 && w(5L) === 5.0)
    assert(w(100L) === 96.0 && w(96L) === 96.0)
    assert(w(50L) === 50.0 && w(6L) === 6.0 && w(95L) === 95.0)
    assert(w.size === 100)
  }

  test("winsorize: interior values pass through, row count preserved") {
    val rnd = new scala.util.Random(3)
    val df = (1L to 500L).map(i => (i, rnd.nextGaussian() * 10)).toDF("id", "s")
    val out = Sampling.winsorize(df, "s", "id", 20, "w")
      .select($"s", $"w").as[(Double, Double)].collect()
    assert(out.length === 500)
    val lo = out.map(_._2).min
    val hi = out.map(_._2).max
    // every clamped value sits inside [lo, hi]; unclamped rows unchanged
    assert(out.forall { case (s, w) => (w == s) || (w == lo && s <= lo) || (w == hi && s >= hi) })
    // tails really were clamped on gaussian data
    assert(out.exists { case (s, w) => w != s })
  }
}
