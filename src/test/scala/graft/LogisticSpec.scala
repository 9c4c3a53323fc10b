package graft

import org.apache.spark.sql.functions._
import graft.ops.Logistic

class LogisticSpec extends SparkSpec {
  import spark.implicits._

  // linearly separable 1-d toy: y = 1 iff x > 0
  private def toy = Seq(
    (1.0, 1.0, 2.0), (1.0, 1.0, 1.5), (1.0, 1.0, 0.5),
    (0.0, 1.0, -0.5), (0.0, 1.0, -1.5), (0.0, 1.0, -2.0))
    .toDF("y", "x0", "x1")

  test("gradient descent moves the separator the right way and loss falls") {
    val (w1, loss1) = Logistic.fit(toy, "y", Seq("x0", "x1"), steps = 1)
    val (w5, loss5) = Logistic.fit(toy, "y", Seq("x0", "x1"), steps = 5)
    assert(w5(1) > 0, s"positive-x class needs positive slope: ${w5.toSeq}")
    assert(loss5 < loss1, s"loss must fall with more steps: $loss1 -> $loss5")
    assert(loss5 < math.log(2.0)) // better than the w=0 start
  }

  test("weights sit exactly on the 1e-6 grid after every step count") {
    for (s <- 1 to 3) {
      val (w, loss) = Logistic.fit(toy, "y", Seq("x0", "x1"), steps = s)
      (w :+ loss).foreach { x =>
        assert(x == math.floor(x * 1e6 + 0.5) / 1e6, s"off-grid at steps=$s: $x")
      }
    }
  }

  test("training is deterministic across repartitionings") {
    val a = Logistic.fit(toy, "y", Seq("x0", "x1"), steps = 3)
    val b = Logistic.fit(toy.repartition(7), "y", Seq("x0", "x1"), steps = 3)
    assert(a._1.toSeq == b._1.toSeq && a._2 == b._2)
  }

  test("balanced start: first-step gradient at w=0 uses sigma=1/2") {
    // with w=0, sigma=0.5 for every row, so the bias gradient is
    // (0.5 - mean(y)) and one step moves w0 by -(0.5 - mean(y))
    val (w, _) = Logistic.fit(toy, "y", Seq("x0", "x1"), steps = 1)
    val expected = math.floor((0.0 - (0.5 - 0.5)) * 1e6 + 0.5) / 1e6
    assert(w(0) == expected)
  }
}
