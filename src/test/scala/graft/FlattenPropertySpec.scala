package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, rng}
import graft.etl.Transcripts

/** Property test for the G1/W1/W2 core: random nested transcript
  * documents → flatten invariants hold for ANY shape (SURVEY §5:
  * index/offset consistency, contiguity, filter correctness). */
class FlattenPropertySpec extends SparkSpec {
  import spark.implicits._

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "x")
  private val blockGen = for {
    n <- Gen.chooseNum(0, 6)
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")

  private case class DocShape(sections: List[List[List[String]]])

  private val docGen = for {
    nSec <- Gen.chooseNum(0, 4)
    secs <- Gen.listOfN(nSec, for {
      nTurn <- Gen.chooseNum(0, 3)
      turns <- Gen.listOfN(nTurn, for {
        nBlock <- Gen.chooseNum(0, 4)
        blocks <- Gen.listOfN(nBlock, blockGen)
      } yield blocks)
    } yield turns)
  } yield DocShape(secs)

  private def docRow(docIdx: Int, shape: DocShape): Row = {
    val sections = shape.sections.map { turns =>
      Row(0.0, 1.0, 0L, 1L, turns.map { blocks =>
        Row(0.0, 1.0, 0L, 1L,
          Row(1L, s"Speaker $docIdx", "S", "h", s"sp_$docIdx", 0L, 0L, null, null),
          blocks.zipWithIndex.map { case (text, bi) =>
            Row(bi.toDouble, bi + 1.0, 0L, 1L, text)
          })
      })
    }
    Row(docIdx.toLong, s"t$docIdx", null,
      Row("title", 1.0, sections),
      null, null, null, null, s"19$docIdx", s"c$docIdx", s"d$docIdx", "s",
      "2025-01-01", s"e$docIdx", null)
  }

  test("flatten invariants hold for 40 random document shapes") {
    val shapes = (0 until 40).map { i =>
      i -> docGen.apply(Gen.Parameters.default, rng.Seed(i.toLong)).get
    }
    val rows = shapes.map { case (i, s) => docRow(i, s) }
    val raw = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 4),
        graft.model.Transcript.schema)
      .withColumn("source_key",
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("mem://"),
          org.apache.spark.sql.functions.col("term"),
          org.apache.spark.sql.functions.lit("_case"),
          org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.lit(".json")))
    val flat = Transcripts.flatten(raw).cache()

    // expected kept-utterance count per doc: blocks with > 3 words
    val expected = shapes.map { case (i, s) =>
      s"19${i}_case$i" -> s.sections.flatten.flatten
        .count(_.trim.split("\\s+").count(_.nonEmpty) > 3)
    }.toMap

    val got = flat.groupBy($"case_id").count()
      .as[(String, Long)].collect().toMap
    expected.filter(_._2 > 0).foreach { case (cid, n) =>
      assert(got.getOrElse(cid, 0L) == n, s"$cid expected $n got ${got.get(cid)}")
    }
    assert(got.keySet.subsetOf(expected.filter(_._2 > 0).keySet))

    // contiguity + offsets for every case
    val perCase = flat
      .select($"case_id", $"utterance_index", $"char_start_offset",
        $"char_end_offset", $"text")
      .as[(String, Int, Long, Long, String)].collect()
      .groupBy(_._1)
    perCase.foreach { case (cid, rowsC) =>
      val sorted = rowsC.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq, s"$cid index gap")
      sorted.foreach { case (_, _, s, e, t) => assert(e - s == t.length, cid) }
      sorted.foldLeft(0L) { case (expStart, (_, _, s, e, t)) =>
        assert(s == expStart, s"$cid offset discontinuity"); e + 1
      }
    }

    // G2 property: chunk assembly reconstructs the ordered speaker-
    // prefixed lines for every (case, section), and W3 bounds hold
    val chunks = graft.etl.Transcripts.sectionChunks(flat, maxTokens = 100000)
    val expectedChunks = flat
      .select($"case_id", $"section_id", $"utterance_index",
        org.apache.spark.sql.functions.concat_ws(": ", $"speaker_name", $"text").as("line"))
      .as[(String, Int, Int, String)].collect()
      .groupBy(r => (r._1, r._2))
      .map { case (k, rs: Array[(String, Int, Int, String)]) =>
        k -> rs.sortBy(_._3).map(_._4).mkString("\n") }
    val gotChunks = chunks
      .select($"case_id", $"section_id", $"chunk_text",
        $"start_utterance_index", $"end_utterance_index", $"utterance_count")
      .as[(String, Int, String, Long, Long, Long)].collect()
    assert(gotChunks.length == expectedChunks.size)
    gotChunks.foreach { case (cid, sid, text, lo, hi, span) =>
      assert(text == expectedChunks((cid, sid)), s"chunk text $cid/$sid")
      assert(hi - lo + 1 == span)
    }
  }
}
