package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Generator / ordered-aggregation / indexing exemplars (SURVEY.md §2.8
  * G1/G2 and §2.5 W1/W3) expressed over the synthetic tables — the same
  * primitives Transcripts.flatten/sectionChunks are built from, in an
  * oracle-checkable form. */
object NestedQueries {

  /** G1 — positional explode (the transcript triple-unnest primitive):
    * documents → (doc_id, 1-based pos, word). */
  def wordExplode(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).as("word_pos"), col("col").as("word"))
      .orderBy(col("doc_id"), col("word_pos"))

  /** G2 — deterministic ordered re-assembly via
    * sort_array(collect_list(struct(...))) (the sectionChunks primitive):
    * explode then rebuild; rebuilt text must equal the original. Also
    * covers W3 (per-group min/max of the position index). */
  def orderedReassembly(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text"), posexplode(split(col("text"), " ")))
    words
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(" ",
          transform(sort_array(collect_list(struct(col("pos").as("p"), col("col").as("w")))),
            x => x.getField("w"))).as("rebuilt"),
        count(lit(1)).as("n_words"),
        min(col("pos")).as("min_pos"),
        max(col("pos")).as("max_pos"),
        first(col("text")).as("original"))
      .select(col("doc_id"), col("n_words"), col("min_pos"), col("max_pos"),
        (col("rebuilt") === col("original")).as("roundtrip_ok"))
      .orderBy(col("doc_id"))
  }

  /** Speaker pool for the g3 nested fixture (one speaker per turn,
    * cycled by global turn index — shared with the generated oracle). */
  private val TurnSpeakers = Seq("JUSTICE ALPHA", "MR. BETA", "MS. GAMMA",
    "GENERAL DELTA")

  /** g3 — the REAL G1 shape, driver-verified: a 3-level
    * sections→turns→text_blocks nested document is built
    * deterministically from the documents table (4 words per
    * text_block, 3 blocks per turn, 2 turns per section — so the last
    * partial block exercises the P1 word filter), then flattened with
    * the production operator [[graft.etl.Transcripts.flatten]] —
    * chained posexplode with positional ids, parent-struct speaker
    * pulls, the P1 filter, W1 document-order index and W2 running char
    * offsets, exactly the reference's signature generator
    * (transformers/helpers.py:137-176). The oracle computes the
    * expected utterance table directly from the same word positions,
    * so every positional id, offset and timing the nesting round-trip
    * produces is checked relationally. */
  def transcriptFlatten(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .filter(col("doc_id") < 40)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumn("blk", floor(col("pos") / 4).cast("long"))
    val blocks = words.groupBy(col("doc_id"), col("blk"))
      .agg(concat_ws(" ",
        transform(sort_array(collect_list(struct(col("pos").as("p"), col("col").as("w")))),
          x => x.getField("w"))).as("btext"))
      .withColumn("start", col("blk").cast("double") * 1.5)
      .withColumn("stop", col("start") + 1.25)
      .withColumn("turn_g", floor(col("blk") / 3).cast("long"))
    val turns = blocks.groupBy(col("doc_id"), col("turn_g"))
      .agg(transform(sort_array(collect_list(struct(col("blk").as("k"),
          struct(col("btext").as("text"), col("start"), col("stop")).as("b")))),
        x => x.getField("b")).as("text_blocks"))
      .withColumn("speaker", struct(
        concat(lit("spk"), col("turn_g") % 4).as("identifier"),
        element_at(array(TurnSpeakers.map(lit): _*),
          (col("turn_g") % 4 + 1).cast("int")).as("name")))
      .withColumn("section_g", floor(col("turn_g") / 2).cast("long"))
    val sections = turns.groupBy(col("doc_id"), col("section_g"))
      .agg(transform(sort_array(collect_list(struct(col("turn_g").as("k"),
          struct(col("speaker"), col("text_blocks")).as("t")))),
        x => x.getField("t")).as("turns"))
    val nested = sections.groupBy(col("doc_id"))
      .agg(transform(sort_array(collect_list(struct(col("section_g").as("k"),
          struct(col("turns")).as("s")))),
        x => x.getField("s")).as("sections"))
      .withColumn("transcript", struct(col("sections")))
      .withColumn("source_key", concat(lit("fixtures/"),
        lit(2000) + col("doc_id") % 10, lit("_doc-"), col("doc_id"), lit(".json")))
      .select(col("transcript"), col("source_key"))
    graft.etl.Transcripts.flatten(nested)
      .select(col("case_id"), col("oa_id"), col("section_id"), col("turn_idx"),
        col("block_idx"), col("speaker_id"), col("speaker_name"), col("text"),
        col("start_time_ms"), col("end_time_ms"), col("utterance_index"),
        col("char_start_offset"), col("char_end_offset"),
        col("word_count"), col("token_count"), col("id"))
      .orderBy(col("case_id"), col("utterance_index"))
  }

  /** W1 — per-partition sequence index (the global_utterance_idx
    * primitive, transformers/helpers.py:132-176): event order per user.
    * Ordering uses the µs-truncated timestamp on both engines (events
    * ts is stored at ns; Spark reads µs). */
  def eventIndex(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
        (row_number().over(w) - 1).as("event_idx"))
      .orderBy(col("user_id"), col("event_idx"))
  }
}
