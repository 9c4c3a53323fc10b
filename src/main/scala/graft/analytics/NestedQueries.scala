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
