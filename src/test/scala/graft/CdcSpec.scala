package graft

import graft.ops.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def diff(oldRows: Seq[(Long, String, Double)],
                   newRows: Seq[(Long, String, Double)]): Map[Long, String] =
    Cdc.snapshotDiff(
        oldRows.toDF("k", "name", "bal"), newRows.toDF("k", "name", "bal"),
        keyCols = Seq("k"), valueCols = Seq("name", "bal"))
      .as[(Long, String)].collect().toMap

  test("insert / update / delete classified; unchanged keys dropped") {
    val old = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
    val nw  = Seq((1L, "a", 1.0),            // unchanged -> dropped
                  (2L, "b", 9.0),            // value change -> U
                  (4L, "d", 4.0))            // new key -> I; 3 gone -> D
    assert(diff(old, nw) === Map(2L -> "U", 3L -> "D", 4L -> "I"))
  }

  test("swapping which value column holds the value still reads as U") {
    // the digest covers the column VECTOR, so moving a value between
    // columns changes the row
    val old = Seq((1L, "x", 0.0))
    val nw  = Seq((1L, "y", 0.0))
    assert(diff(old, nw) === Map(1L -> "U"))
  }

  test("identical snapshots diff to empty") {
    val rows = Seq((1L, "a", 1.0), (2L, "b", 2.0))
    assert(diff(rows, rows).isEmpty)
  }

  test("empty old snapshot -> all inserts; empty new -> all deletes") {
    val rows = Seq((1L, "a", 1.0), (2L, "b", 2.0))
    assert(diff(Nil, rows) === Map(1L -> "I", 2L -> "I"))
    assert(diff(rows, Nil) === Map(1L -> "D", 2L -> "D"))
  }
}
