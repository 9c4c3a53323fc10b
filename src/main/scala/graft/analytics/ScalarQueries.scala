package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.Rounding.exactRound

/** Scalar-function and filter/projection exemplars (SURVEY.md §2.2 P1–P11
  * and §2.7 F1–F12) over the synthetic tables.
  *
  * All of these are pure column expressions — whole-stage-codegen
  * friendly, no UDFs — so at 100 TB they cost one scan with the filter
  * pushed into the parquet reader.
  */
object ScalarQueries {

  /** P1 short-utterance filter (transformers/helpers.py:147-149: keep
    * blocks with more than 3 words). */
  def wordFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_words"))
      .filter(col("n_words") > 3)
      .orderBy(col("doc_id"))

  /** P3 term-range predicate (clustering/helpers.py:57-68) — faithful to
    * the reference's STRING comparison on the prefix (so 'src20' sorts
    * before 'src5', exactly like its year-prefix quirk). */
  def sourceRangeFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("source").between("src2", "src5"))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  /** P4 ILIKE classifier chain (bronze_oa_text.sql:34-39) — reproduces
    * the reference's precedence quirk: the 'RED WIDGET' arm is
    * unreachable because '%WIDGET%' matches first (as 'CHIEF JUSTICE'
    * is swallowed by '%JUSTICE%' in the original). */
  def typeClassifier(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        when(upper(col("p_name")).contains("WIDGET"), "Widget")
          .when(upper(col("p_name")).contains("RED WIDGET"), "RedWidget")
          .when(upper(col("p_name")).contains("BOLT"), "Bolt")
          .otherwise("Other").as("part_class"))
      .groupBy(col("part_class"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(col("part_class"))

  /** P5 null-guarded arithmetic + F12 CASE guards + A6 NULLIF ratio
    * (bronze_oa_text.sql:29-33, gold_speaker_analytics.sql:54-64). */
  def nullGuardedMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        when(col("value").isNotNull && col("value") > 100,
          exactRound((col("value") - lit(100.0)) / lit(1000.0), 6)).as("duration_s"),
        exactRound(col("value") / nullif(col("user_id").cast("double"), lit(0.0)), 4)
          .as("value_per_user"))
      .orderBy(col("event_id"))

  /** F1 SPLIT_PART + F2 substring-after-first-delimiter with character
    * replacement (clustering/helpers.py:23-27 term/docket extraction). */
  def priorityParse(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        substring_index(col("o_orderpriority"), "-", 1).as("priority_code"),
        regexp_replace(
          expr("substring(o_orderpriority, instr(o_orderpriority, '-') + 1)"),
          " ", "_").as("priority_name"))
      .groupBy(col("priority_code"), col("priority_name"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("priority_code"))

  /** F3 regex numeric extraction + F7 key parsing
    * (dbt get_term_year.sql, transformers/helpers.py:21-37). */
  def customerKeyParse(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "#(\\d+)", 1).cast("long").as("name_key"))
      .withColumn("key_matches", col("name_key") === col("c_custkey"))
      .orderBy(col("c_custkey"))

  /** F5 length/word counts + F6 string concat (helpers.py:162-173). */
  def textProjections(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("text_len"),
        concat_ws(":", col("lang"), col("source")).as("label"),
        substring_index(col("text"), " ", 1).as("first_word"))
      .orderBy(col("doc_id"))

  /** F8 math built-ins (sqrt/pow/round — clustering/helpers.py:178-181
    * Euclidean pieces). sqrt and multiply are exact IEEE ops, so both
    * engines agree bit-for-bit. */
  def mathProjections(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        exactRound(sqrt(col("p_retailprice")), 6).as("sqrt_price"),
        exactRound(col("p_retailprice") * col("p_retailprice"), 4).as("price_sq"),
        floor(col("p_retailprice")).cast("long").as("price_floor"),
        pmod(col("p_partkey"), lit(7L)).as("key_mod7"))
      .orderBy(col("p_partkey"))

  /** z1 — Morton (Z-order) curve values (ops.Layout.mortonCode): the
    * bit-interleave that drives the 2-d pruning layout, registered so
    * the oracle proves the curve arithmetic portable bit-for-bit
    * (LayoutSpec proves the file-skipping it buys). */
  def zorderCode(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.ops.Layout.mortonCode(col("l_partkey"), col("l_suppkey")).as("z"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** F10 JSON-in-column extraction with COALESCE-to-0 null semantics
    * (bronze_transcript_embeddings.sql:27 jsonb_array_length). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        coalesce(get_json_object(col("props"), "$.k").cast("long"), lit(0L))
          .as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** F11 timestamp formatting (ingest/main.py:105-108 run-id stamps) +
    * per-day rollup with exact money sum. */
  def dailyEventRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast(DecimalType(18, 2))), 2).cast("double")
          .as("sum_value"))
      .orderBy(col("day"))
}
