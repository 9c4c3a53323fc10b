package graft

import org.apache.spark.sql.functions._
import graft.ops.Recency

class RecencySpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: the classic recurrence over the last k,
    * oldest to newest, seeded at the window's first value. */
  private def ewmaRef(xsOldestFirst: Seq[Double], alpha: Double): Double =
    xsOldestFirst.tail.foldLeft(xsOldestFirst.head) { (e, x) =>
      alpha * x + (1 - alpha) * e
    }

  private def run(rows: Seq[(Long, Long, Long, Double)], k: Int = 20) =
    Recency.ewmaLastK(
      rows.toDF("user_id", "ts", "event_id", "value"),
      "user_id", "ts", "event_id", "value", alpha = 0.25, k = k)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap

  test("closed form equals the sequential recurrence") {
    val rnd = new scala.util.Random(5)
    val rows = for (u <- 1L to 6L; i <- 1L to 15L)
      yield (u, i * 100L, i, rnd.nextDouble() * 50)
    val got = run(rows)
    for (u <- 1L to 6L) {
      val xs = rows.filter(_._1 == u).sortBy(_._2).map(_._4)
      val (m, e) = got(u)
      assert(m === 15L)
      assert(math.abs(e - ewmaRef(xs, 0.25)) < 1e-9, s"user $u")
    }
  }

  test("history beyond k contributes nothing (truncation is exact)") {
    val longHist = (1L to 100L).map(i => (1L, i, i, i.toDouble))
    val last20 = longHist.takeRight(20).map { case (u, t, id, v) => (u, t, id, v) }
    val a = run(longHist)
    val b = run(last20)
    assert(a(1L)._1 === 20L)
    assert(a(1L)._2 === b(1L)._2)
  }

  test("single event: ewma is that value") {
    val got = run(Seq((7L, 10L, 1L, 42.5)))
    assert(got(7L) === ((1L, 42.5)))
  }

  test("partitioning-invariant") {
    val rows = for (u <- 1L to 20L; i <- 1L to 30L)
      yield (u, (i * 7) % 97, u * 1000 + i, (i * 13 % 29).toDouble)
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val one = Recency.ewmaLastK(df.repartition(1), "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val many = Recency.ewmaLastK(df.repartition(17), "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(one.keySet === many.keySet)
    // the ≤20-term sum may associate differently across partitionings;
    // anything beyond last-ulp noise is a real bug (the 6dp oracle grid
    // absorbs this)
    for ((u, e) <- one) assert(math.abs(e - many(u)) < 1e-11, s"user $u")
  }
}
