package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions
import graft.functions.Rounding.exactRound

/** End-to-end oracle exemplars for the reference's OWN medallion models
  * — silver_case_summaries, gold_speaker_analytics and
  * gold_oral_arguments_analytics (the weekly dbt workload,
  * database/dbt/models/silver/silver_case_summaries.sql:7-69,
  * gold/gold_speaker_analytics.sql:12-68,
  * gold/gold_oral_arguments_analytics.sql:18-52) — replayed WHOLE
  * against DuckDB, joins + conditional pivots + ratio metrics + the P4
  * precedence quirk in one plan per model.
  *
  * The Oyez corpus isn't available offline, so the oa_text /
  * transcript_embeddings inputs are transcript-SHAPED fixtures derived
  * deterministically from the synthetic documents table: every derived
  * column is a pure function of doc_id/text that the oracle rebuilds
  * with identical SQL, and every float-bearing column is designed
  * IEEE-exact (durations are multiples of 125 ms, so sums/averages of
  * seconds are dyadic and order-independent — see PERFORMANCE.md §4).
  *
  * The fixture exercises the models' edge semantics on purpose:
  *  - 'CHIEF JUSTICE ROBERTS' hits the P4 precedence quirk ('%JUSTICE%'
  *    wins, so the Chief classifies as 'Justice'); 'Chief Scalia' is
  *    the only way to reach the 'Chief Justice' arm.
  *  - NULL speaker_name rows (doc_id % 17 == 0) fall through the role
  *    CASE to 'Attorney' (NULL ILIKE → NULL) and are excluded from
  *    gold_speaker_analytics by its IS NOT NULL filter.
  *  - NULL end_time_ms rows (doc_id % 11 == 0) exercise the P5 duration
  *    null-guard; AVG/SUM skip them on both engines.
  *  - NULL speaker_list rows (doc_id % 5 == 0) exercise the
  *    COALESCE(json_array_length(...), 0) F10 semantics.
  */
object MedallionQueries {

  /** Speaker pool — order matters (it drives the role distribution). */
  private val Speakers = Seq("JUSTICE BARRETT", "CHIEF JUSTICE ROBERTS",
    "Chief Scalia", "General Prelogar", "Mr. Olson")

  /** oa_text-shaped fixture (schema.sql:28-45) from the documents
    * table: one utterance per document, 20 cases × 2 oral arguments. */
  def oaTextFixture(spark: SparkSession, dir: String): DataFrame = {
    val caseId = concat(lit("case_"), col("doc_id") % 20)
    val w = Window.partitionBy(col("case_id"), col("oa_id")).orderBy(col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("case_id", caseId)
      .withColumn("oa_id", concat(caseId, lit("_oa"), col("doc_id") % 2))
      .withColumn("id", col("doc_id").cast("string"))
      .withColumn("speaker_id", concat(lit("spk"), col("doc_id") % 5))
      .withColumn("speaker_name",
        when(col("doc_id") % 17 === 0, lit(null).cast("string"))
          .otherwise(element_at(
            array(Speakers.map(lit): _*), (col("doc_id") % 5 + 1).cast("int"))))
      .withColumn("word_count", TextFunctions.wordCount(col("text")))
      .withColumn("token_count", TextFunctions.tokenCount(col("text")))
      .withColumn("start_time_ms", col("doc_id") * 4000)
      .withColumn("end_time_ms",
        when(col("doc_id") % 11 === 0, lit(null).cast("long"))
          .otherwise(col("doc_id") * 4000 + (col("doc_id") % 40) * 125))
      .withColumn("utterance_index", row_number().over(w) - 1)
      .withColumn("char_start_offset", lit(0L))
      .withColumn("char_end_offset", length(col("text")).cast("long"))
      .withColumn("source_key", concat(lit("fixtures/"), caseId, lit(".json")))
      .select("id", "case_id", "oa_id", "utterance_index", "speaker_id",
        "speaker_name", "text", "word_count", "token_count",
        "start_time_ms", "end_time_ms", "char_start_offset",
        "char_end_offset", "source_key")
  }

  /** transcript_embeddings-shaped fixture (schema.sql:12-26): the case
    * dimension + speaker_list JSONB column, one row per document. */
  def transcriptEmbeddingsFixture(spark: SparkSession, dir: String): DataFrame = {
    val caseNo = col("doc_id") % 20
    Tables.documents(spark, dir)
      .withColumn("id", col("doc_id"))
      .withColumn("case_id", concat(lit("case_"), caseNo))
      .withColumn("oa_id", concat(lit("case_"), caseNo, lit("_oa"), col("doc_id") % 2))
      .withColumn("case_name", concat(lit("Case No. "), caseNo))
      .withColumn("term", (lit(2000) + caseNo).cast("string"))
      .withColumn("vector", lit(null).cast("array<float>"))
      .withColumn("speaker_list",
        when(col("doc_id") % 5 === 0, lit(null).cast("string"))
          .otherwise(element_at(
            array(lit("[]"), lit("""["a"]"""), lit("""["a","b"]"""),
              lit("""["a","b","c"]""")),
            (col("doc_id") % 4 + 1).cast("int"))))
      .withColumn("source_key", concat(lit("fixtures/"), col("case_id"), lit(".json")))
      .select("id", "text", "vector", "case_name", "term", "case_id",
        "oa_id", "source_key", "speaker_list")
  }

  /** md1 — silver_case_summaries replayed end-to-end: bronze renames +
    * P4/P5, A2 utterance stats, A3 conditional-count pivot, A4
    * embedding stats, J1/J2 left joins, in ONE plan. Float outputs are
    * exact-rounded for the hash gate (inputs are IEEE-exact by fixture
    * design, so both engines round identical bits). */
  def silverCaseSummariesQuery(spark: SparkSession, dir: String): DataFrame =
    Medallion.silverCaseSummaries(
      Medallion.bronzeOaText(oaTextFixture(spark, dir)),
      Medallion.bronzeTranscriptEmbeddings(transcriptEmbeddingsFixture(spark, dir)))
      .select(
        col("case_id"), col("oa_id"),
        col("total_utterances"), col("unique_speakers"),
        col("total_words"), col("total_tokens"),
        exactRound(col("avg_utterance_duration"), 4).as("avg_utterance_duration"),
        exactRound(col("total_duration_seconds"), 4).as("total_duration_seconds"),
        exactRound(col("total_duration_minutes"), 4).as("total_duration_minutes"),
        col("justice_utterances"), col("chief_justice_utterances"),
        col("attorney_utterances"), col("solicitor_general_utterances"),
        col("total_embeddings"),
        exactRound(col("avg_embedding_text_length"), 4).as("avg_embedding_text_length"),
        col("max_speakers_in_embedding"))
      .orderBy(col("case_id"), col("oa_id"))

  /** md2 — gold_speaker_analytics replayed end-to-end: A5 per-speaker
    * stats, J3 broadcast dimension join, A6 ratio metrics with the
    * NULLIF/CASE guards, W6 sort (tie-broken to a total order so the
    * row hash is stable). */
  def goldSpeakerAnalyticsQuery(spark: SparkSession, dir: String): DataFrame =
    Medallion.goldSpeakerAnalytics(
      Medallion.bronzeOaText(oaTextFixture(spark, dir)),
      Medallion.bronzeTranscriptEmbeddings(transcriptEmbeddingsFixture(spark, dir)),
      roundFn = exactRound)
      .select(
        col("speaker_name"), col("speaker_role"), col("case_id"),
        col("case_name"), col("term"), col("oa_id"),
        col("total_utterances"), col("total_words"), col("total_tokens"),
        exactRound(col("avg_words_per_utterance"), 4).as("avg_words_per_utterance"),
        col("total_speaking_minutes"),
        exactRound(col("avg_utterance_duration"), 4).as("avg_utterance_duration"),
        col("utterance_span"), col("avg_utterance_gap"), col("words_per_minute"))
      .orderBy(col("total_utterances").desc, col("speaker_name"),
        col("case_id"), col("oa_id"))

  /** md3 — gold_oral_arguments_analytics replayed end-to-end: the case
    * dimension inner-joined to the WHOLE silver model (so this plan
    * contains silver's plan as a subtree, like dbt's ref() inlining),
    * plus the participation/engagement ratios. */
  def goldOralArgumentsQuery(spark: SparkSession, dir: String): DataFrame = {
    val te = Medallion.bronzeTranscriptEmbeddings(
      transcriptEmbeddingsFixture(spark, dir))
    val silver = Medallion.silverCaseSummaries(
      Medallion.bronzeOaText(oaTextFixture(spark, dir)), te)
    Medallion.goldOralArgumentsAnalytics(silver, te, roundFn = exactRound)
      .select(
        col("case_id"), col("case_name"), col("term"), col("oa_id"),
        col("total_utterances"), col("unique_speakers"),
        col("total_words"), col("total_tokens"),
        exactRound(col("total_duration_minutes"), 4).as("total_duration_minutes"),
        exactRound(col("avg_utterance_duration"), 4).as("avg_utterance_duration"),
        col("justice_participation_pct"), col("attorney_participation_pct"),
        col("utterances_per_minute"), col("words_per_minute"),
        col("total_embeddings"),
        exactRound(col("avg_embedding_text_length"), 4).as("avg_embedding_text_length"))
      .orderBy(col("term").desc, col("case_name"), col("oa_id"))
  }

  /** k6 — the XML transcript serializer (K6, helpers.py:367-399) over
    * the oa_text fixture, driver-verified relationally: the oracle
    * rebuilds the exact single-line ElementTree document (escaping
    * rules included) with string_agg. The writer's byte format is
    * additionally golden-file pinned against the reference's own
    * published output in XmlGoldenSpec. */
  def xmlSerializationQuery(spark: SparkSession, dir: String): DataFrame =
    graft.etl.Transcripts.toXml(oaTextFixture(spark, dir))
      .orderBy(col("case_id"), col("oa_id"))
}
