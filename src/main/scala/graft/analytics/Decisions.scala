package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** J7 — decision/vote enrichment (SURVEY §2.3 J7: the reference
  * DECLARES case_decisions and justice_votes, schema.sql:81-106, with
  * "predicting justice votes" as the stated goal README.md:7, but ships
  * no writer). This engine implements the declared surface: schemas,
  * the enrichment join, and per-justice agreement analytics.
  */
object Decisions {

  /** schema.sql:81-95 case_decisions. */
  val caseDecisionSchema: StructType = StructType(Seq(
    StructField("case_id", StringType, nullable = false),
    StructField("decision_date", DateType),
    StructField("majority_author", StringType),
    StructField("vote_count", StringType), // e.g. "5-4"
    StructField("disposition", StringType),
    StructField("raw_json", StringType)))

  /** schema.sql:97-106 justice_votes; UNIQUE(case_id, justice_name). */
  val justiceVoteSchema: StructType = StructType(Seq(
    StructField("case_id", StringType, nullable = false),
    StructField("justice_name", StringType, nullable = false),
    StructField("vote", StringType), // majority | dissent | concur
    StructField("opinion_type", StringType)))

  /** Enrich oral-argument analytics with the decision outcome (the
    * future equi-join the reference's schema anticipates). */
  def enrichWithDecisions(goldOa: DataFrame, decisions: DataFrame): DataFrame =
    goldOa.join(decisions.select(
        col("case_id"), col("decision_date"), col("majority_author"),
        col("vote_count"), col("disposition")),
      Seq("case_id"), "left")

  /** Per-justice participation × outcome: for each justice, cases
    * spoken in (from speaker analytics) joined to their vote —
    * the feature table the reference's vote-prediction goal implies. */
  def justiceEngagementVotes(goldSpeaker: DataFrame, votes: DataFrame): DataFrame =
    goldSpeaker
      .filter(col("speaker_role").isin("Justice", "Chief Justice"))
      .join(votes,
        goldSpeaker("case_id") === votes("case_id") &&
          upper(goldSpeaker("speaker_name")).contains(upper(votes("justice_name"))),
        "inner")
      .select(votes("case_id"), votes("justice_name"), col("vote"),
        col("total_utterances"), col("total_words"),
        col("avg_words_per_utterance"))

  /** Vote-split histogram per disposition. */
  def voteSplitStats(decisions: DataFrame): DataFrame =
    decisions.groupBy(col("vote_count"), col("disposition"))
      .agg(count(lit(1)).as("n_cases"))
      .orderBy(col("vote_count"), col("disposition"))
}
