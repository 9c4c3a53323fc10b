package graft.model

import org.apache.spark.sql.types._

/** Explicit schema for the raw Oyez oral-argument document
  * (FIXTURES.md §1; reference examples/17970_20250802_023426.json with
  * ingest-added metadata per services/ingest/main.py:148-157).
  *
  * Declared explicitly — never inferred — so a 100 TB read needs no
  * sampling pass and schema drift surfaces as `_corrupt_record` rows
  * (PERMISSIVE mode) routed to the junk sink, mirroring the reference's
  * junk/ dead-letter behavior (transformers/helpers.py:238-246).
  */
object Transcript {

  val mediaFile: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("mime", StringType),
    StructField("size", LongType),
    StructField("href", StringType)))

  val role: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("type", StringType),
    // epoch seconds; may be negative for pre-1970 appointments
    StructField("date_start", LongType),
    StructField("date_end", LongType),
    StructField("appointing_president", StringType),
    StructField("role_title", StringType),
    StructField("institution_name", StringType),
    StructField("href", StringType)))

  val speaker: StructType = StructType(Seq(
    StructField("ID", LongType),
    StructField("name", StringType),
    StructField("last_name", StringType),
    StructField("href", StringType),
    StructField("identifier", StringType),
    StructField("view_count", LongType),
    StructField("length_of_service", LongType),
    StructField("roles", ArrayType(role)),
    StructField("thumbnail", mediaFile)))

  val textBlock: StructType = StructType(Seq(
    StructField("start", DoubleType),
    StructField("stop", DoubleType),
    StructField("byte_start", LongType),
    StructField("byte_stop", LongType),
    StructField("text", StringType)))

  val turn: StructType = StructType(Seq(
    StructField("start", DoubleType),
    StructField("stop", DoubleType),
    StructField("byte_start", LongType),
    StructField("byte_stop", LongType),
    StructField("speaker", speaker),
    StructField("text_blocks", ArrayType(textBlock))))

  val section: StructType = StructType(Seq(
    StructField("start", DoubleType),
    StructField("stop", DoubleType),
    StructField("byte_start", LongType),
    StructField("byte_stop", LongType),
    StructField("turns", ArrayType(turn))))

  val transcriptBody: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("duration", DoubleType),
    StructField("sections", ArrayType(section))))

  /** Full document schema incl. ingest metadata + corrupt-record slot. */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("media_file", ArrayType(mediaFile)),
    StructField("transcript", transcriptBody),
    StructField("public_note", StringType),
    StructField("unavailable", BooleanType),
    StructField("damaged", StringType),
    StructField("display_title", StringType),
    StructField("term", StringType),
    StructField("case_id", StringType),
    StructField("docket_number", StringType),
    StructField("session", StringType),
    StructField("extracted_at", StringType),
    StructField("extraction_id", StringType),
    StructField("_corrupt_record", StringType)))
}
