package graft

import org.apache.spark.sql.functions._
import graft.ops.{Packing, Retrieval}

/** r3 phrase search and t34 overlapping chunker invariants. */
class ChunkPhraseSpec extends SparkSpec {
  import spark.implicits._

  test("phrase search equals the substring reference on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val got = Retrieval.phraseSearch(docs, "doc_id", "text",
        Seq("key", "scan", "query"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // reference: pad + substring containment gives the match SET; the
    // positional index must find exactly those docs
    val ref = docs.filter(
        concat(lit(" "), col("text"), lit(" ")).contains(" key scan query "))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got.keySet === ref)
    assert(got.nonEmpty, "fixture phrase must occur at sf0.001")
    // first_pos really is the phrase start token
    val texts = docs.filter(col("doc_id").isin(got.keySet.toSeq: _*))
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    got.foreach { case (id, (_, pos)) =>
      val ws = texts(id).split(" ")
      assert(ws.slice(pos.toInt, pos.toInt + 3).toSeq ===
        Seq("key", "scan", "query"), s"doc $id pos $pos")
    }
  }

  test("phrase search counts overlapping occurrences") {
    val df = Seq((1L, "a a a a"), (2L, "a b a a"), (3L, "b b")).toDF("id", "t")
    val got = Retrieval.phraseSearch(df, "id", "t", Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(1L -> (3L, 0L), 2L -> (1L, 2L)))
  }

  test("chunker: coverage, overlap, reconstruction, boundary cases") {
    val df = Seq(
      (1L, "x" * 500),                 // multi-chunk
      (2L, "y" * 180),                 // exactly one chunk
      (3L, "z" * 181),                 // one char over -> second chunk
      (4L, "w")).toDF("doc_id", "text") // tiny
    val out = Packing.overlappingChunks(df, "doc_id", "text", 180, 120)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(2L).length === 1 && byDoc(4L).length === 1)
    assert(byDoc(3L).length === 2)
    assert(byDoc(1L).length === math.ceil((500 - 180) / 120.0).toInt + 1)
    // every char of every doc is covered by some chunk, and consecutive
    // chunks overlap by chunk - stride
    for ((id, chunks) <- byDoc) {
      val n = df.filter(col("doc_id") === id).select(length(col("text")))
        .as[Int].head()
      val sorted = chunks.sortBy(_._2)
      assert(sorted.head._3 === 0L)
      assert(sorted.last._3 + sorted.last._4 === n.toLong, s"doc $id tail")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 === a._3 + 120, s"doc $id stride")
          assert(a._3 + a._4 > b._3, s"doc $id must overlap")
        case _ =>
      }
      // chunk text matches the offsets
      sorted.foreach { case (_, _, start, len, text) =>
        assert(text.length === len.toInt)
      }
    }
  }
}
