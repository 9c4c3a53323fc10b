package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.analytics.{Decisions, Medallion}
import graft.etl.Transcripts
import java.sql.Date

class DecisionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val utterances = Transcripts.flatten(Transcripts.valid(
    Transcripts.readRaw(spark, getClass.getResource("/transcripts").getPath + "/*.json")))

  private lazy val decisions = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("1981_plyler-v-doe", Date.valueOf("1982-06-15"), "Brennan", "5-4",
        "affirmed", """{"cite":"457 U.S. 202"}"""),
      Row("1990_united-states_v_nixon", Date.valueOf("1990-07-24"), "Burger", "8-0",
        "affirmed", null))),
    Decisions.caseDecisionSchema)

  private lazy val votes = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("1981_plyler-v-doe", "Thurgood Marshall", "majority", "join"),
      Row("1981_plyler-v-doe", "Warren E. Burger", "dissent", "write"))),
    Decisions.justiceVoteSchema)

  test("decision enrichment joins outcomes onto case analytics") {
    // build gold tables from the fixture pipeline
    val chunks = new graft.etl.HashingEmbedder(32)
      .embed(Transcripts.sectionChunks(utterances), "chunk_text", "vector")
    val te = chunks.groupBy($"case_id", $"oa_id", $"source_key")
      .agg(first($"chunk_text").as("text"), first($"vector").as("vector"))
      .select(concat($"case_id", lit("_te")).as("id"), $"text", $"vector",
        expr("substring(case_id, instr(case_id, '_') + 1)").as("case_name"),
        substring_index($"case_id", "_", 1).as("term"),
        $"case_id", $"oa_id", $"source_key",
        lit(null).cast("string").as("xml_uri"),
        lit("""["a"]""").as("speaker_list"))
    val silver = Medallion.silverCaseSummaries(
      Medallion.bronzeOaText(utterances), Medallion.bronzeTranscriptEmbeddings(te))
    val gold = Medallion.goldOralArgumentsAnalytics(
      silver, Medallion.bronzeTranscriptEmbeddings(te))

    val enriched = Decisions.enrichWithDecisions(gold, decisions)
    val plyler = enriched.filter($"case_id" === "1981_plyler-v-doe").head()
    assert(plyler.getAs[String]("vote_count") == "5-4")
    assert(plyler.getAs[String]("majority_author") == "Brennan")
    // left join keeps rows without decisions
    assert(enriched.count() == gold.count())
  }

  test("justice engagement-vote feature table matches by name containment") {
    val goldSpeaker = Medallion.goldSpeakerAnalytics(
      // force Justice roles by renaming one speaker
      Medallion.bronzeOaText(utterances).withColumn("speaker_role",
        when($"speaker_name" === "Thurgood Marshall", "Justice")
          .otherwise($"speaker_role")),
      spark.emptyDataFrame
        .sparkSession.createDataFrame(spark.sparkContext.emptyRDD[Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("case_id", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("case_name", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("term", org.apache.spark.sql.types.StringType)))))
    val features = Decisions.justiceEngagementVotes(goldSpeaker, votes)
    val rows = features.as[(String, String, String, Long, Long, Double)].collect()
    assert(rows.length == 1)
    assert(rows.head._2 == "Thurgood Marshall" && rows.head._3 == "majority")
  }

  test("vote split stats") {
    val stats = Decisions.voteSplitStats(decisions)
      .as[(String, String, Long)].collect().toSet
    assert(stats == Set(("5-4", "affirmed", 1L), ("8-0", "affirmed", 1L)))
  }
}
