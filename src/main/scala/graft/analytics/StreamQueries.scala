package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.streaming.EventStreams

/** Batch equivalents of the streaming transforms, oracle-checked — the
  * same code paths EventStreams runs under readStream. */
object StreamQueries {

  /** st1 — tumbling hourly window aggregate (epoch-aligned, so DuckDB
    * date_trunc('hour') is the exact oracle). `value` is pre-cast to
    * DECIMAL so the transform's sum is order-independent; the
    * streaming path sums doubles, semantics unchanged. */
  def hourlyWindow(spark: SparkSession, dir: String): DataFrame =
    EventStreams.hourlyTypeCounts(
      Tables.events(spark, dir)
        .withColumn("value", col("value").cast(DecimalType(18, 2))))
      .select(col("hour_start"), col("event_type"), col("n_events"),
        round(col("sum_value"), 2).cast("double").as("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** st3 — stream-stream interval join (EventStreams.clickViewJoin,
    * batch face): clicks × same-user views in the trailing 10 minutes.
    * StreamingSpec runs the identical transform as a genuine two-file-
    * stream join and asserts pair-set equality with this result. */
  def clickViewPairs(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    EventStreams.clickViewJoin(clicks, views)
      .select(col("click_id"), col("view_id"))
      .orderBy(col("click_id"), col("view_id"))
  }

  /** st2 — session windows (2h gap) per user; DuckDB oracle uses
    * gaps-and-islands with the same boundary semantics (a gap of
    * exactly 2h starts a new session — session_window ends are
    * exclusive). */
  def userSessions(spark: SparkSession, dir: String): DataFrame =
    EventStreams.userSessions(Tables.events(spark, dir), "2 hours")
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
}
