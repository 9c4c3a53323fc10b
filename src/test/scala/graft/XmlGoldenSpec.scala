package graft

import graft.etl.Transcripts

/** K6 golden-file round trip (VERDICT r3 ask #8): parse the reference's
  * own published XML output (`/root/reference/examples/
  * 25650_20250521_194825.xml`, produced by the ElementTree serializer in
  * `services/transformers/helpers.py:367-399`) into utterance rows with
  * the JDK DOM parser, re-serialize with `Transcripts.toXml`, and assert
  * BYTE equality with the original file. This pins the full surface of
  * the writer — single-line layout, attribute order, `speaker_id`
  * attribute, no declaration/trailing newline, ET escaping — against the
  * reference's real output rather than a hand-written expectation.
  */
class XmlGoldenSpec extends SparkSpec {
  import spark.implicits._

  private val goldenPath =
    java.nio.file.Paths.get("/root/reference/examples/25650_20250521_194825.xml")

  test("toXml reproduces the reference example byte-for-byte") {
    assume(java.nio.file.Files.exists(goldenPath), "reference example not present")
    val goldenBytes = java.nio.file.Files.readAllBytes(goldenPath)
    val golden = new String(goldenBytes, java.nio.charset.StandardCharsets.UTF_8)

    val db = javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
    val doc = db.parse(goldenPath.toFile)
    val nodes = doc.getDocumentElement.getElementsByTagName("utterance")
    val rows = (0 until nodes.getLength).map { i =>
      val el = nodes.item(i).asInstanceOf[org.w3c.dom.Element]
      ("25650", "25650_20250521_194825", i,
        el.getAttribute("speaker"), el.getAttribute("speaker_id"),
        el.getTextContent)
    }
    assert(rows.nonEmpty)

    val utterances = rows.toDF(
      "case_id", "oa_id", "utterance_index", "speaker_name", "speaker_id", "text")
    val out = Transcripts.toXml(utterances).select("xml").as[String].head()

    // pinpointed diff message on failure instead of a 127KB assert dump
    if (out != golden) {
      val i = out.zip(golden).indexWhere { case (a, b) => a != b }
      val at = if (i >= 0) i else math.min(out.length, golden.length)
      val ctx = 60
      fail(s"XML diverges at byte $at (out len ${out.length}, golden len ${golden.length}):\n" +
        s"  out:    …${out.slice(math.max(0, at - ctx), at + ctx)}…\n" +
        s"  golden: …${golden.slice(math.max(0, at - ctx), at + ctx)}…")
    }
  }

  test("attribute vs text escaping follows ElementTree rules") {
    val utterances = Seq(
      ("c", "o", 0, "A \"Q\" <B> & Co", "id&1", "He said \"x < y & z > w\".")
    ).toDF("case_id", "oa_id", "utterance_index", "speaker_name", "speaker_id", "text")
    val xml = Transcripts.toXml(utterances).select("xml").as[String].head()
    // attributes escape the quote; text nodes keep quotes literal
    assert(xml.contains("speaker=\"A &quot;Q&quot; &lt;B&gt; &amp; Co\""))
    assert(xml.contains("speaker_id=\"id&amp;1\""))
    assert(xml.contains(">He said \"x &lt; y &amp; z &gt; w\".</utterance>"))
  }

  test("null/empty text serializes self-closing (ElementTree form), never dropped") {
    val utterances = Seq(
      ("c", "o", 0, "A", "a1", "first"),
      ("c", "o", 1, "B", "b1", null.asInstanceOf[String]),
      ("c", "o", 2, "C", "c1", ""),
      ("c", "o", 3, "D", "d1", "last")
    ).toDF("case_id", "oa_id", "utterance_index", "speaker_name", "speaker_id", "text")
    val xml = Transcripts.toXml(utterances).select("xml").as[String].head()
    // all four utterances present, in order — the null/empty ones as
    // self-closing elements exactly as ElementTree writes empty text
    assert(xml.contains("<utterance speaker=\"A\" speaker_id=\"a1\">first</utterance>"))
    assert(xml.contains("<utterance speaker=\"B\" speaker_id=\"b1\" />"))
    assert(xml.contains("<utterance speaker=\"C\" speaker_id=\"c1\" />"))
    assert(xml.contains("<utterance speaker=\"D\" speaker_id=\"d1\">last</utterance>"))
    assert(xml.indexOf("speaker=\"B\"") < xml.indexOf("speaker=\"C\""))
  }
}
