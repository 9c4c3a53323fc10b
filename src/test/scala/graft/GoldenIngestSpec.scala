package graft

import org.apache.spark.sql.functions._
import graft.etl.Transcripts

/** Golden INGESTION spec: drive the production scan → flatten → chunk →
  * XML path on the reference's own published raw transcript
  * (`/root/reference/examples/17970_20250802_023426.json`, a real Oyez
  * oral argument with 5 sections / 829 text blocks) rather than a
  * hand-built fixture. This pins `Transcript.schema` and the whole G1
  * pipeline against the actual upstream shape — if the schema drifts
  * from what Oyez serves, this fails before any synthetic spec does.
  */
class GoldenIngestSpec extends SparkSpec {
  import spark.implicits._

  private val examplePath = "/root/reference/examples/17970_20250802_023426.json"

  private lazy val raw = Transcripts.readRaw(spark, examplePath)
  private lazy val utterances = Transcripts.flatten(Transcripts.valid(raw))

  test("the real example parses as valid with the declared schema") {
    assume(new java.io.File(examplePath).exists, "reference example not present")
    assert(raw.count() == 1)
    assert(Transcripts.valid(raw).count() == 1)
    assert(Transcripts.junk(raw).count() == 0)
  }

  test("flatten: real document yields contiguous indices and offsets") {
    assume(new java.io.File(examplePath).exists)
    val rows = utterances
      .orderBy($"utterance_index")
      .select($"utterance_index", $"char_start_offset", $"char_end_offset",
        $"text", $"section_id", $"speaker_name")
      .as[(Int, Long, Long, String, Int, String)].collect()
    assert(rows.nonEmpty && rows.length <= 829) // minWords filter only drops
    assert(rows.map(_._1).toSeq == rows.indices.toSeq)
    rows.foreach { case (_, s, e, t, _, _) => assert(e - s == t.length) }
    rows.sliding(2).foreach {
      case Array((_, _, e1, _, _, _), (_, s2, _, _, _, _)) => assert(s2 == e1 + 1)
      case _ =>
    }
    // all 5 sections of the real argument survive the word filter
    assert(rows.map(_._5).distinct.sorted.toSeq == Seq(0, 1, 2, 3, 4))
    // every kept block has a speaker from the parent turn
    assert(rows.forall(_._6 != null))
  }

  test("chunks + XML serialize the real document end to end") {
    assume(new java.io.File(examplePath).exists)
    val chunks = Transcripts.sectionChunks(utterances)
    assert(chunks.count() == 5)
    val caps = chunks.select(max($"token_count")).as[Long].head()
    assert(caps <= 8000) // the reference's chunk token cap
    val xml = Transcripts.toXml(utterances).select($"xml").as[String].head()
    assert(xml.startsWith("<transcript><utterance speaker=\""))
    assert(xml.endsWith("</utterance></transcript>"))
    assert(!xml.contains("\n"))
  }
}
